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

# Pluggable key strategies (§2.10 extension surface; the reference's
# candidate-finder composition, RunKBPEntityLinkerSystem.scala:45-49,
# is an ordered list of finders — ours is an ordered tuple of key
# emitters). "norm"/"prefix"/"phonetic" are the original production
# scheme; "rare_token" adds the term-frequency key of
# el/ops/er.py::rare_token_keys (rarest token by (df asc, token asc));
# "snb" adds sorted-neighborhood tile keys (profile_key_map /
# snb_tile_keys — rank-windowed over the sorted distinct-alias order).
DEFAULT_KEY_STRATEGIES = ("norm", "prefix", "phonetic")
DEFAULT_SNB_WINDOW = 16


def block_keys(alias_norm: str,
               strategies: tuple = DEFAULT_KEY_STRATEGIES,
               token_df: dict | None = None) -> list[str]:
    """Blocking keys for one normalized alias, in strategy order.
    ``token_df`` (token -> document frequency over the blocking
    universe) feeds the "rare_token" strategy; unseen tokens count as
    df=1 (maximally rare). "snb" is rank-based, not per-alias — it is
    emitted by profile_key_map / snb key rows, never here."""
    if not alias_norm:
        return []
    toks = alias_norm.split()
    keys = []
    for s in strategies:
        if s == "norm":
            keys.append(f"n:{alias_norm}")
        elif s == "prefix":
            if len(toks[0]) >= 3:
                keys.append(f"p:{toks[0][:6]}")
        elif s == "phonetic":
            last = toks[-1]
            keys.append(f"ph:{soundex(last)}:{last[0]}")
        elif s == "rare_token":
            df = token_df or {}
            best = min(toks, key=lambda t: (df.get(t, 1), t))
            keys.append(f"r:{best}")
        elif s != "snb":
            raise ValueError(f"unknown blocking key strategy {s!r}")
    return keys


def alias_token_dfs(alias_norms: Iterable[str]) -> dict[str, int]:
    """Token -> document frequency over a distinct-alias universe (one
    count per alias containing the token) — the "rare_token" strategy's
    side table. Alias-vocabulary-bounded (the er.py rare_token_keys /
    pmi broadcast precedent)."""
    df: dict[str, int] = {}
    for an in alias_norms:
        if not an:
            continue
        for t in set(an.split()):
            df[t] = df.get(t, 0) + 1
    return df


def snb_tile_keys(rank: int, window: int = DEFAULT_SNB_WINDOW
                  ) -> list[str]:
    """Sorted-neighborhood as overlapping rank tiles: an alias at sort
    rank r joins tiles r//window and r//window + 1, so every pair
    within rank distance < ``window`` of the global (alias_norm,
    group_key) order shares at least one key (a superset of the
    window-``window`` SNB pair set, bounded by distance < 2*window) —
    the standard blocking-key form of sorted-neighborhood, which
    composes with the existing per-block salting/cap machinery instead
    of needing its own sliding-window pass."""
    t = rank // window
    return [f"sn:{t}", f"sn:{t + 1}"]


def profile_key_map(gkeys: list, norms: list,
                    strategies: tuple = DEFAULT_KEY_STRATEGIES,
                    token_df: dict | None = None,
                    snb_window: int = DEFAULT_SNB_WINDOW
                    ) -> dict[str, list[int]]:
    """key -> row-index list over a distinct-alias profile (the shared
    driver-plan blocking step): per-alias keys from ``block_keys`` plus
    rank-tile keys when "snb" is enabled. Indices appear in group_key
    order within every key (the order the pair generators rely on for
    deterministic output). ``token_df`` defaults to dfs over this
    profile's own aliases."""
    order = sorted(range(len(gkeys)), key=lambda i: gkeys[i])
    if "rare_token" in strategies and token_df is None:
        token_df = alias_token_dfs(norms)
    key_map: dict[str, list[int]] = {}
    for i in order:
        for k in block_keys(norms[i], strategies, token_df):
            key_map.setdefault(k, []).append(i)
    if "snb" in strategies:
        # rank over the sorted (alias_norm, group_key) order; empty
        # norms carry no blocking signal
        snb_order = sorted((i for i in range(len(gkeys)) if norms[i]),
                           key=lambda i: (norms[i], gkeys[i]))
        tiles: dict[str, list[int]] = {}
        for r, i in enumerate(snb_order):
            for k in snb_tile_keys(r, snb_window):
                tiles.setdefault(k, []).append(i)
        for k, idxs in tiles.items():
            key_map.setdefault(k, []).extend(
                sorted(idxs, key=lambda i: gkeys[i]))
    return key_map


def surface_block_keys(surface: str) -> list[str]:
    """Keys computed from a raw surface (used for the labeled gold_pairs
    fixture, FIXTURES.md §4)."""
    return block_keys(normalize_name(surface))


def _salt(alias_norm: str, n_salts: int) -> int:
    h = hashlib.md5(alias_norm.encode("utf-8")).digest()
    return int.from_bytes(h[:4], "little") % n_salts


def emit_keys_batch(batch: pa.Table,
                    strategies: tuple = DEFAULT_KEY_STRATEGIES,
                    token_df: dict | None = None) -> pa.Table:
    """flat_map-style batch fn: mentions -> (block_key, alias-group rows).

    Input columns: mention_id, alias, alias_norm, surface, ner_type.
    Output: one row per (mention, key). Per-alias strategies only —
    the rank-based "snb" strategy is handled by the plan-level key-row
    emitters (profile_key_map / the pipeline's snb key pass)."""
    alias_norm = batch.column("alias_norm").to_pylist()
    per_alias = tuple(s for s in strategies if s != "snb")
    out_idx: list[int] = []
    out_key: list[str] = []
    for i, an in enumerate(alias_norm):
        for k in block_keys(an, per_alias, token_df):
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
