"""Stage C — blocking-key emission + within-block candidate-pair generation.

Replaces the reference's global all-distinct-pairs cross product
(Clusterer.scala:89-93, MentionPairFeatures.scala:103-108) and its
context-containment pair filter (MentionPairTrainingData.scala:57-70)
with explicit blocking keys mirroring the candidate-finder composition
(exact match + Crosswikis alias statistics + fuzzy,
RunKBPEntityLinkerSystem.scala:45-49):

  n:  normalized-alias exact key
  p:  token-prefix key (first token, 6 chars)
  ph: phonetic key (Soundex of last token, disambiguated by first letter)

Scale design (10^12 turns):
- pairs are generated ONLY within a block key (groupby shuffle on
  block_key), never globally;
- within a block we first collapse mentions to DISTINCT normalized
  aliases (exact-equality is handled linearly by alias-group nodes in
  the union-find stage, mirroring clusterNils' alias groupby,
  RunKBPEntityLinkerSystem.scala:162-170), so the quadratic pair
  generation runs over distinct aliases only;
- hot keys (common surnames — the reference's own acknowledgment is
  common-surnames.txt, MentionPairFeatures.scala:49-54 — and very
  frequent aliases) are salted: blocks with more than
  ``max_aliases_per_block`` distinct aliases are split deterministically
  by alias hash into sub-blocks, and the dropped cross-sub-block pair
  count is logged in the output counters (no silent truncation).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pyarrow as pa

from .sim import soundex
from .text import normalize_name

MAX_ALIASES_PER_BLOCK = 200  # salt threshold: 200 aliases -> <=19.9k pairs/block


def block_keys(alias_norm: str) -> list[str]:
    """Blocking keys for one normalized alias."""
    if not alias_norm:
        return []
    toks = alias_norm.split()
    keys = [f"n:{alias_norm}"]
    first, last = toks[0], toks[-1]
    if len(first) >= 3:
        keys.append(f"p:{first[:6]}")
    keys.append(f"ph:{soundex(last)}:{last[0]}")
    return keys


def surface_block_keys(surface: str) -> list[str]:
    """Keys computed from a raw surface (used for the labeled gold_pairs
    fixture, FIXTURES.md §4)."""
    return block_keys(normalize_name(surface))


def _salt(alias_norm: str, n_salts: int) -> int:
    h = hashlib.md5(alias_norm.encode("utf-8")).digest()
    return int.from_bytes(h[:4], "little") % n_salts


def emit_keys_batch(batch: pa.Table) -> pa.Table:
    """flat_map-style batch fn: mentions -> (block_key, alias-group rows).

    Input columns: mention_id, alias, alias_norm, surface, ner_type.
    Output: one row per (mention, key).
    """
    alias_norm = batch.column("alias_norm").to_pylist()
    out_idx: list[int] = []
    out_key: list[str] = []
    for i, an in enumerate(alias_norm):
        for k in block_keys(an):
            out_idx.append(i)
            out_key.append(k)
    idx = pa.array(out_idx, type=pa.int64())
    taken = batch.take(idx)
    return taken.append_column("block_key", pa.array(out_key, type=pa.string()))


PAIR_COLUMNS = ["a1", "a2", "alias1", "alias2", "surface1", "surface2",
                "ner1", "ner2", "block_key", "n1", "n2", "s1n", "s2n",
                "ctx1", "ctx2"]


def pairs_for_block(
    key: str,
    aliases: Iterable[tuple],
    max_aliases_per_block: int = MAX_ALIASES_PER_BLOCK,
) -> tuple[list[tuple], int]:
    """Generate distinct-alias candidate pairs for one block.

    ``aliases``: iterable of tuples, canonical 7-shape
    (group_key, alias_norm, alias, surface, ner_type, surface_norm,
    ctx_vec) — one representative per distinct contraction node in the
    block. Compat shapes: 4-tuples (alias_norm, alias, surface, ner)
    and 6-tuples (alias_norm, alias, surface, ner, surface_norm,
    ctx_vec) get group_key = alias_norm.
    Returns (pair rows, dropped_pair_count). Pair rows follow
    PAIR_COLUMNS with a1 < a2 (contraction-node ids "A:<group_key>").

    Salting: if the block exceeds the alias cap, aliases are split into
    ceil(n/cap) deterministic hash sub-blocks; pairs across sub-blocks
    are dropped and counted.
    """
    from .text import normalize_name

    full = []
    for a in aliases:
        a = tuple(a)
        if len(a) == 4:
            a = (a[0],) + a[:4] + (normalize_name(a[2]), "")
        elif len(a) == 6:
            a = (a[0],) + a
        full.append(a[:7])
    uniq = sorted({a[0]: a for a in full}.values())
    n = len(uniq)
    if n < 2:
        return [], 0
    if n <= max_aliases_per_block:
        groups = [uniq]
        dropped = 0
    else:
        n_salts = -(-n // max_aliases_per_block)
        buckets: dict[int, list] = {}
        for a in uniq:
            buckets.setdefault(_salt(a[0], n_salts), []).append(a)
        groups = list(buckets.values())
        total_pairs = n * (n - 1) // 2
        kept = sum(len(g) * (len(g) - 1) // 2 for g in groups)
        dropped = total_pairs - kept
    rows = []
    for g in groups:
        for i in range(len(g)):
            ai = g[i]
            for j in range(i + 1, len(g)):
                aj = g[j]
                a, b = (ai, aj) if ai[0] < aj[0] else (aj, ai)
                rows.append(
                    (f"A:{a[0]}", f"A:{b[0]}", a[2], b[2], a[3], b[3],
                     a[4], b[4], key, a[1], b[1], a[5], b[5], a[6], b[6])
                )
    return rows, dropped


class BlockPairGenerator:
    """map_groups fn over groupby("block_key"): distinct-alias pair gen.

    Emits candidate pairs; exact-duplicate pairs arising from overlapping
    blocking keys are removed downstream by a (a1, a2) groupby
    (the reference's pair cache analog, Clusterer.scala:27, 77-83).
    """

    def __init__(self, max_aliases_per_block: int = MAX_ALIASES_PER_BLOCK):
        self.cap = max_aliases_per_block

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            t = pa.table({n: pa.array([], pa.string()) for n in PAIR_COLUMNS})
            return t.append_column("dropped_pairs", pa.array([], pa.int64()))
        key = group.column("block_key")[0].as_py()
        names = group.column_names
        if "surface_norm" in names and "ctx_vec" in names:
            gk = (group.column("group_key").to_pylist()
                  if "group_key" in names
                  else group.column("alias_norm").to_pylist())
            aliases = zip(
                gk,
                group.column("alias_norm").to_pylist(),
                group.column("alias").to_pylist(),
                group.column("surface").to_pylist(),
                group.column("ner_type").to_pylist(),
                group.column("surface_norm").to_pylist(),
                group.column("ctx_vec").to_pylist(),
            )
        else:
            aliases = zip(
                group.column("alias_norm").to_pylist(),
                group.column("alias").to_pylist(),
                group.column("surface").to_pylist(),
                group.column("ner_type").to_pylist(),
            )
        rows, dropped = pairs_for_block(key, aliases, self.cap)
        cols = list(zip(*rows)) if rows else [[]] * len(PAIR_COLUMNS)
        tbl = pa.table({n: pa.array(c, type=pa.string())
                        for n, c in zip(PAIR_COLUMNS, cols)})
        return tbl.append_column(
            "dropped_pairs", pa.array([dropped] * len(tbl), type=pa.int64())
            if len(tbl)
            else pa.array([], type=pa.int64()),
        )


def block_pair_groups(group: pa.Table) -> pa.Table:
    """Named map_groups fn (Ray's map_groups requires __name__)."""
    return BlockPairGenerator()(group)


def alias_group_rows(batch: pa.Table) -> pa.Table:
    """mentions -> (mention_id, alias node id) edges for union-find:
    every mention connects to its alias-group node ``A:<alias_norm>``
    (linear exact-equality clustering, the clusterNils analog)."""
    an = batch.column("alias_norm").to_pylist()
    return pa.table(
        {
            "src": batch.column("mention_id"),
            "dst": pa.array([f"A:{a}" for a in an], type=pa.string()),
        }
    )


def dedup_pairs(tbl: pa.Table) -> pa.Table:
    """Within-batch exact pair dedup on (a1, a2) — cheap combiner before
    the global groupby dedup."""
    if len(tbl) == 0:
        return tbl
    key = pa.compute.binary_join_element_wise(tbl["a1"], tbl["a2"], "\x00")
    mask = np.zeros(len(tbl), dtype=bool)
    seen: set[str] = set()
    for i, k in enumerate(key.to_pylist()):
        if k not in seen:
            seen.add(k)
            mask[i] = True
    return tbl.filter(pa.array(mask))
