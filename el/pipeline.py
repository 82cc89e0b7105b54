"""The end-to-end entity-linking pipeline (stage graph + CLI).

Ray shape (SURVEY.md §3.1): read_parquet(transcripts)
  -> [A+B fused: extraction + per-conversation alias canonicalization in
      ONE stateless map over conv-sorted read blocks; block-straddling
      conversations patched via a tiny broadcast map (the conv_id hash
      exchange remains for unordered input, conv_partitioned=False)]
  -> [B2: per-document context overrides — doc-sim ambiguity resolution,
      NE overlap, sports sense — contracted as group-key subkeys]
  -> [alias profile: per-batch partials (combiner) -> group-aligned
      parallel merge -> ctx-vector finalize (df filter)]
  -> [E: per-distinct-node KB link decision (DuckDB-vectorized fuzzy)]
  -> [C: blocking keys + within-block distinct-node pairs (salted)]
  -> [D: pair scoring, DuckDB kernels + context cosine/veto]
  -> [F: KB-constrained components over the CONTRACTED graph]
  -> [G: answers attach + (conv_id, turn_idx) sink order + write_parquet]

Scale design. Every mention-scale operation is a stateless map or a
single hash exchange; the clustering runs on the *contracted node
graph* (distinct group_keys), orders of magnitude smaller than the
mention table. When the contracted graph fits the driver
(< driver_cc_max_nodes) the alias-scale steps run driver-side with
chunked Ray-task fan-out for the parallel parts; above the threshold
every stage runs distributed (hash-partitioned profile, linker actor
pool, min-label propagation over the KB-constrained transformed graph,
hash join back) — same semantics, pytest-equivalent. Every stage can
checkpoint per-partition Parquet with a lineage manifest
(el.checkpoint) so a killed job resumes mid-pipeline.

Fixed-overhead discipline (the scaling criterion): each Ray Data
execution costs ~1s of executor startup and each exchange ~3s of
aggregator startup, so the default plan runs ONE Ray Data execution
(the fused extract+canonicalize read, materialized) and expresses
every later stage as plain Ray tasks over those block refs — override
scans, profile partials/merge/finalize, link fan-out, pair scoring,
final attach. The patched/group-keyed view is computed inside each
consuming task (vectorized, rare-row-only), so the raw mention table
is the only full object-store pin, and the sink ordering reorders
internally-sorted blocks by key range instead of paying a sort
exchange (checked invariant; loud Dataset.sort fallback).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .alias import canonicalize
from .blocking import (DEFAULT_KEY_STRATEGIES, DEFAULT_SNB_WINDOW,
                       block_pair_groups, emit_keys_batch)
from .checkpoint import CheckpointManager
from .cluster import label_propagation
from .kb import broadcast_kb
from .linkdecide import CandidateLinker
from .mentions import extract_mentions
from .scorer import MERGE_CUTOFF, PairScorer, score_pairs_batch
from .shuffle import arrowize, group_blocks, group_map

import logging

logger = logging.getLogger(__name__)

DRIVER_CC_MAX_NODES = 5_000_000  # contracted-graph size guard


_BCAST_CACHE: dict[bytes, object] = {}


def _maybe_get(x):
    """ray.get that tolerates already-resolved values: plain-task call
    sites auto-dereference top-level ObjectRef args, map_batches
    fn_kwargs don't — the shared per-block functions accept both.

    Resolved PYTHON-OBJECT values are CACHED per worker process:
    unlike Arrow tables / numpy arrays (zero-copy from the object
    store — never cached here, so no plasma buffer is pinned past the
    task), a broadcast Python dict is re-PICKLE-DESERIALIZED on every
    ray.get — measured 0.5-2.9 s per answers-attach task at bench32
    for the 122k-entry overrides dict, dominating the stage. LRU
    evict-one keeps a long-lived worker's cache bounded without
    dropping hot entries mid-run.

    READ-ONLY CONTRACT: the cache hands the SAME deserialized object
    to every task on the worker (that sharing is the whole point).
    Consumers must never mutate a value obtained through here — an
    in-place edit would silently corrupt concurrent and subsequent
    tasks on the worker. All current consumers (boundary-patch dict,
    overrides dict, KB index) are lookup-only."""
    import numpy as np
    import ray

    if not isinstance(x, ray.ObjectRef):
        return x
    key = x.binary()
    if key in _BCAST_CACHE:
        _BCAST_CACHE[key] = _BCAST_CACHE.pop(key)  # refresh LRU order
        return _BCAST_CACHE[key]
    val = ray.get(x)
    if isinstance(val, (pa.Table, pa.ChunkedArray, np.ndarray)):
        return val  # zero-copy fetch: caching would only pin plasma
    while len(_BCAST_CACHE) >= 8:
        _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
    _BCAST_CACHE[key] = val
    return val


def _alias_profile_block(df):
    """Vectorized block fn over hash-partitioned group_key (the
    contraction node: alias_norm, or alias_norm + override suffix): one
    representative row per distinct node + min(mention_id) + count + a
    deterministic context sample (K smallest mention_ids, associative
    across partial blocks — el.ctxvec). Representative = lexicographic
    min of (alias, surface, ner_type)."""
    import pandas as pd

    from .ctxvec import CTX_SAMPLE_K, sample_contexts

    if len(df) == 0:
        return pd.DataFrame({
            "group_key": pd.Series(dtype=str),
            "alias_norm": pd.Series(dtype=str),
            "alias": pd.Series(dtype=str),
            "surface": pd.Series(dtype=str),
            "ner_type": pd.Series(dtype=str),
            "min_mention": pd.Series(dtype=str),
            "n_mentions": pd.Series(dtype="int64"),
            "ctx_sample": pd.Series(dtype=str),
        })
    import numpy as np

    if "group_key" not in df.columns:
        df = df.assign(group_key=df["alias_norm"])
    # run-boundary indexing replaces groupby.agg + groupby.head (each
    # measured ~1s of pure pandas machinery per bundle at bench scale);
    # both sorts produce the SAME group sequence (lexicographic by
    # group_key, stable), so run starts/lengths align across them
    df = df.sort_values(["group_key", "alias", "surface", "ner_type"],
                        ignore_index=True)
    gk = df["group_key"].to_numpy()
    n = len(gk)
    bounds = np.flatnonzero(gk[1:] != gk[:-1]) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n]))
    rep = df.iloc[starts]
    s = df.sort_values(["group_key", "mention_id"], ignore_index=True)
    out = pd.DataFrame({
        "group_key": rep["group_key"].to_numpy(),
        "alias_norm": rep["alias_norm"].to_numpy(),
        "alias": rep["alias"].to_numpy(),
        "surface": rep["surface"].to_numpy(),
        "ner_type": rep["ner_type"].to_numpy(),
        "min_mention": s["mention_id"].to_numpy()[starts],
        "n_mentions": (ends - starts).astype("int64"),
    })
    if "context" in df.columns:
        # K smallest mention_ids per run, straight from the second sort
        lens = np.minimum(ends - starts, CTX_SAMPLE_K)
        offs = np.cumsum(lens) - lens
        idx = np.repeat(starts, lens) + (np.arange(int(lens.sum()))
                                         - np.repeat(offs, lens))
        mids = s["mention_id"].to_numpy()[idx].tolist()
        ctxs = s["context"].to_numpy()[idx].tolist()
        cb = np.concatenate(([0], np.cumsum(lens)))
        out["ctx_sample"] = [
            sample_contexts(list(zip(mids[a:b], ctxs[a:b])))
            for a, b in zip(cb[:-1], cb[1:])
        ]
    else:  # context-free callers (isolated benches) degrade gracefully
        out["ctx_sample"] = ""
    return out


def _fragment_specs(tr_path: str, target_tasks: int):
    """(file, row_group_lo, row_group_hi) fragments covering the
    transcript parquet, ~target_tasks of them: each file's row groups
    are split into contiguous ranges proportional to its share of the
    corpus. A file with one giant row group yields one fragment (row
    groups are the finest readable unit); fixtures and real corpora
    write bounded row groups precisely so this wave can go wide."""
    import pyarrow.parquet as pq

    files = (sorted(
        os.path.join(tr_path, f) for f in os.listdir(tr_path)
        if f.endswith(".parquet"))
        if os.path.isdir(tr_path) else [tr_path])
    metas = [(f, pq.ParquetFile(f).metadata.num_row_groups)
             for f in files]
    total = sum(n for _, n in metas) or 1
    specs = []
    for f, n in metas:
        if n == 0:
            continue
        chunks = max(1, min(n, round(target_tasks * n / total)))
        bounds = np.linspace(0, n, chunks + 1).astype(int)
        specs.extend((f, int(lo), int(hi))
                     for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo)
    return specs


def _read_extract_fragment(path: str, rg_lo: int, rg_hi: int) -> pa.Table:
    """One fragment of the fused read+extract wave: read a contiguous
    row-group range (columns pruned at the read) and run the fused
    extract+canonicalize kernel on it."""
    import pyarrow.parquet as pq

    t = pq.ParquetFile(path).read_row_groups(
        list(range(rg_lo, rg_hi)),
        columns=["conv_id", "turn_idx", "text"])
    return _extract_canonicalize_fused(t)


def _extract_canonicalize_fused(batch: pa.Table) -> pa.Table:
    """Fused stage A+B for CONV-SORTED input: extraction and the
    per-conversation alias rules run in ONE stateless pass over each
    read block — no conv_id hash exchange. A block sees contiguous
    conversations, but Ray may split a file mid-conversation for read
    parallelism, so the block's FIRST and LAST conversations are emitted
    UNRESOLVED (boundary=True, empty alias) and patched on the driver —
    O(2 x blocks) conversations regardless of scale. Interior
    conversations (everything else) resolve locally.
    Equivalence with the exchange-based plan is a pytest."""
    import pandas as pd

    from .alias import resolve_block
    from .mentions import extract_mentions_batch

    m = extract_mentions_batch(batch)
    df = m.to_pandas()
    convs = batch.column("conv_id")
    if batch.num_rows:
        # contract check: conv-sorted input means each conversation is
        # ONE contiguous run per block — interleaved runs would be
        # silently mis-resolved, so fail loudly instead. Arrow-native
        # (run starts = offset-by-one inequality, distinct via
        # count_distinct): no per-turn Python materialization in the
        # corpus-dominant stage.
        flat = convs.combine_chunks()
        runs = 1 + pc.sum(pc.cast(pc.not_equal(
            flat.slice(1), flat.slice(0, len(flat) - 1)),
            pa.int64())).as_py() if len(flat) > 1 else 1
        if runs != pc.count_distinct(flat).as_py():
            raise ValueError(
                "transcripts are not sorted by conv_id within a read "
                "block; rerun with conv_partitioned=False (the conv_id "
                "exchange plan) for unordered input"
            )
    edge = ({convs[0].as_py(), convs[-1].as_py()}
            if batch.num_rows else set())
    bmask = df["conv_id"].isin(edge)
    interior = resolve_block(df[~bmask])
    interior = interior.assign(boundary=False)
    boundary = df[bmask].assign(alias="", alias_norm="", boundary=True)
    out = pd.concat([interior, boundary[interior.columns]],
                    ignore_index=True)
    # emit SORTED blocks: with conv-sorted input, map order preservation
    # then makes the global (conv_id, turn_idx) order hold end-to-end,
    # so the answers stage can skip the final sort exchange
    out = out.sort_values(["conv_id", "turn_idx", "beg"], kind="mergesort")
    return pa.Table.from_pandas(out, preserve_index=False)


def _patch_and_group(t: pa.Table, patch_ref=None,
                     ov_ref=None) -> pa.Table:
    """Shared finishing map over extracted+canonicalized mention blocks:
    (a) write back the boundary-conversation alias patch (broadcast
    mention_id map), (b) attach the contraction group_key from the
    override choices — one pass, so the mention table is never pinned
    for an intermediate step."""
    import ray

    if "boundary" in t.column_names:
        if patch_ref is not None:
            p = _maybe_get(patch_ref)
            bmask = t.column("boundary").combine_chunks()
            n_bound = pc.sum(bmask).as_py() or 0
            if p and n_bound:
                # touch ONLY the boundary rows (rare: O(2 x blocks)
                # conversations corpus-wide)
                idx = pc.indices_nonzero(bmask)
                mids = t.column("mention_id").take(idx).to_pylist()
                rep_alias = pa.array([p[m][0] for m in mids], pa.string())
                rep_norm = pa.array([p[m][1] for m in mids], pa.string())
                names = t.column_names
                t = t.set_column(
                    names.index("alias"), "alias",
                    pc.replace_with_mask(
                        t.column("alias").combine_chunks(), bmask, rep_alias))
                t = t.set_column(
                    names.index("alias_norm"), "alias_norm",
                    pc.replace_with_mask(
                        t.column("alias_norm").combine_chunks(), bmask,
                        rep_norm))
        t = t.drop_columns(["boundary"])
    if ov_ref is not None:
        t = _attach_group_keys(t, _maybe_get(ov_ref))
    return t


_OV_SEP = "\x1f"  # joins (alias_norm, conv_id) into one lookup key;
# absent from normalized aliases and conv ids by construction


def _ov_table(ov: dict) -> pa.Table:
    """Broadcast form of the override-choice dict — a zero-copy Arrow
    table (ovkey = alias+SEP+conv, group_key precomputed): a broadcast
    Python dict re-pickle-deserializes on EVERY worker and the decode
    grows with the choice count (O(s) per worker at 122k entries),
    whereas Arrow fetches zero-copy at any size."""
    from .overrides import group_key_of

    keys, aliases, gks = [], [], []
    for (a, c), (kind, kb) in ov.items():
        keys.append(a + _OV_SEP + c)
        aliases.append(a)
        gks.append(group_key_of(a, kind, kb))
    return pa.table({"ovkey": pa.array(keys, pa.string()),
                     "alias_norm": pa.array(aliases, pa.string()),
                     "group_key": pa.array(gks, pa.string())})


def _ov_table_from_choices(ot: pa.Table) -> pa.Table:
    """Vectorized ``_ov_table`` from a choice TABLE (alias_norm,
    conv_id, kind, kb_id) — pure Arrow kernels, no per-choice Python
    (the checkpoint-resume path feeds the broadcast straight from the
    persisted choices). Duplicate (alias_norm, conv_id) keys — possible
    only if the persisted choices table carries doubled rows — resolve
    to the LAST row, matching the fresh path's dict-insertion
    semantics (``find_context_overrides`` overwrites on re-insert)."""
    import numpy as np

    from .overrides import SEP

    alias = ot.column("alias_norm").combine_chunks().cast(pa.string())
    conv = ot.column("conv_id").combine_chunks().cast(pa.string())
    key = pc.binary_join_element_wise(alias, conv, _OV_SEP)
    uniq = pc.unique(key)
    if len(uniq) < len(key):
        # last occurrence per key: index_in against the reversed keys
        n = len(key)
        rev = pa.array(np.arange(n - 1, -1, -1, dtype=np.int64))
        pos_rev = pc.index_in(uniq, value_set=key.take(rev))
        last = pc.subtract(pa.scalar(n - 1, pa.int64()),
                           pos_rev.cast(pa.int64()))
        ot = ot.take(last)
        alias = ot.column("alias_norm").combine_chunks().cast(pa.string())
        conv = ot.column("conv_id").combine_chunks().cast(pa.string())
    tag = pc.binary_join_element_wise(
        ot.column("kind").combine_chunks().cast(pa.string()),
        ot.column("kb_id").combine_chunks().cast(pa.string()), ":")
    return pa.table({
        "ovkey": pc.binary_join_element_wise(alias, conv, _OV_SEP),
        "alias_norm": alias,
        "group_key": pc.binary_join_element_wise(alias, tag, SEP),
    })


def _attach_group_keys(t: pa.Table, ov) -> pa.Table:
    """Append the contraction group_key column: alias_norm, overridden
    per (alias_norm, conv_id) by the choices — ``ov`` is either the
    driver-side dict or the broadcast Arrow table (``_ov_table``).
    Vectorized; only mentions of an overridden alias pay the probe,
    and the Arrow path is pure kernels (is_in/index_in/take)."""
    from .overrides import group_key_of

    alias_arr = t.column("alias_norm").combine_chunks()
    gk_arr = alias_arr
    if isinstance(ov, pa.Table):
        if ov.num_rows:
            cand = pc.unique(ov.column("alias_norm").combine_chunks())
            mask = pc.is_in(alias_arr, value_set=cand)
            if pc.sum(mask).as_py():
                idx = pc.indices_nonzero(mask)
                a_hit = alias_arr.take(idx)
                c_hit = t.column("conv_id").combine_chunks().take(idx)
                hk = pc.binary_join_element_wise(a_hit, c_hit, _OV_SEP)
                pos = pc.index_in(
                    hk, value_set=ov.column("ovkey").combine_chunks())
                rep = pc.coalesce(
                    ov.column("group_key").combine_chunks().take(pos),
                    a_hit)
                gk_arr = pc.replace_with_mask(alias_arr, mask, rep)
        return t.append_column("group_key", gk_arr)
    if ov:
        cand = pa.array(sorted({a for a, _ in ov}), pa.string())
        mask = pc.is_in(alias_arr, value_set=cand)
        if pc.sum(mask).as_py():
            idx = pc.indices_nonzero(mask)
            a_hit = alias_arr.take(idx).to_pylist()
            c_hit = t.column("conv_id").take(idx).to_pylist()
            rep = pa.array(
                [group_key_of(a, *ov[(a, c)]) if (a, c) in ov else a
                 for a, c in zip(a_hit, c_hit)],
                pa.string(),
            )
            gk_arr = pc.replace_with_mask(alias_arr, mask, rep)
    return t.append_column("group_key", gk_arr)


def _attach_group_key_join(aliased_ds, ov_rows, num_partitions: int):
    """Fallback-plan group-key attach: one conv_id hash exchange joining
    mentions with the override choice rows (group_blocks union idiom) —
    no corpus-proportional choices dict ever lives on the driver."""
    import numpy as np
    import pandas as pd

    from .overrides import SEP
    from .shuffle import group_blocks

    if ov_rows is None:
        return aliased_ds.map_batches(
            lambda t: t.append_column("group_key", t.column("alias_norm")),
            batch_format="pyarrow",
        )

    def m_rows(t: pa.Table) -> pa.Table:
        return (
            t.append_column("okind", pa.array([""] * len(t), pa.string()))
            .append_column("okb", pa.array([""] * len(t), pa.string()))
        )

    mention_defaults = {
        "mention_id": ("", pa.string()), "turn_idx": (0, pa.int32()),
        "beg": (0, pa.int32()), "end": (0, pa.int32()),
        "surface": ("", pa.string()), "ner_type": ("", pa.string()),
        "context": ("", pa.string()), "alias": ("", pa.string()),
    }

    def c_rows(t: pa.Table) -> pa.Table:
        cols = {"conv_id": t.column("conv_id"),
                "alias_norm": t.column("alias_norm"),
                "okind": t.column("kind"), "okb": t.column("kb_id")}
        for name, (default, typ) in mention_defaults.items():
            cols[name] = pa.array([default] * len(t), typ)
        return pa.table(cols)

    left = aliased_ds.map_batches(m_rows, batch_format="pyarrow")
    right = ov_rows.map_batches(c_rows, batch_format="pyarrow")
    cols_order = left.schema().names

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = [c for c in df.columns if c not in ("okind", "okb")]
        if len(df) == 0:
            return df[out_cols].assign(group_key=pd.Series(dtype=str))
        c = df[df["mention_id"] == ""]
        m = df[df["mention_id"] != ""].drop(columns=["okind", "okb"])
        if len(c):
            lut = c[["conv_id", "alias_norm", "okind", "okb"]] \
                .drop_duplicates(["conv_id", "alias_norm"])
            m = m.merge(lut, on=["conv_id", "alias_norm"], how="left")
            hit = m["okind"].notna() & (m["okind"] != "")
            m["group_key"] = np.where(
                hit,
                m["alias_norm"] + SEP + m["okind"].fillna("") + ":"
                + m["okb"].fillna(""),
                m["alias_norm"],
            )
            m = m.drop(columns=["okind", "okb"])
        else:
            m = m.assign(group_key=m["alias_norm"])
        return m

    sel = [c for c in cols_order if c not in ("okind", "okb")]
    out = group_blocks(left.union(right.map_batches(
        lambda t: t.select(cols_order), batch_format="pyarrow")),
        ["conv_id"], attach, batch_format="pandas",
        num_partitions=num_partitions)
    return out.map_batches(
        lambda t: t.select(sel + ["group_key"]), batch_format="pyarrow")


def _chunk_table(tbl: pa.Table, rows_per_chunk: int) -> list[pa.Table]:
    """Slice a table into block-sized chunks (map_batches parallelism is
    per block)."""
    if tbl.num_rows == 0:
        return [tbl]
    return [tbl.slice(i, rows_per_chunk)
            for i in range(0, tbl.num_rows, rows_per_chunk)]


def _merge_chunk(tbl: pa.Table) -> pa.Table:
    """Merge one GROUP-ALIGNED chunk of partial profiles (all rows of
    any group_key in exactly one chunk): the associative reduce plus the
    summed raw context vector (pre-df-filter)."""
    import numpy as np
    import pandas as pd

    from .ctxvec import merge_samples, sum_sample

    df = tbl.to_pandas()
    if len(df) == 0:
        return pa.table({})
    df = df.sort_values(["group_key", "alias", "surface", "ner_type"])
    g = df.groupby("group_key", sort=True)
    out = g.agg(
        alias_norm=("alias_norm", "first"),
        alias=("alias", "first"),
        surface=("surface", "first"),
        ner_type=("ner_type", "first"),
        min_mention=("min_mention", "min"),
        n_mentions=("n_mentions", "sum"),
    ).reset_index()
    out["n_mentions"] = out["n_mentions"].astype("int64")
    s = df.sort_values("group_key", kind="mergesort")
    gk = s["group_key"].to_numpy()
    samples_col = s["ctx_sample"].tolist()
    bounds = np.flatnonzero(gk[1:] != gk[:-1]) + 1
    starts = np.concatenate(([0], bounds, [len(gk)]))
    import json

    raws: dict[str, str] = {}
    for a, b in zip(starts[:-1], starts[1:]):
        merged = (samples_col[a] if b - a == 1
                  else merge_samples(samples_col[a:b]))
        raws[gk[a]] = json.dumps(sum_sample(merged), sort_keys=True)
    out["ctx_raw"] = out["group_key"].map(raws)
    return pa.Table.from_pandas(out, preserve_index=False)


def _merge_partials_block(df):
    """Merge PARTIAL profile rows whose groups are co-located by a
    group_key hash exchange (the probed-fallback profile path: the
    exchange moves ~bundles x distinct-aliases partial rows instead of
    the full mention table). Emits the same schema as
    _alias_profile_block over complete groups — ctx_sample is the
    merged full-group sample (merge_samples is associative), so
    _finalize_profile_distributed consumes it unchanged."""
    import numpy as np
    import pandas as pd

    from .ctxvec import merge_samples

    if len(df) == 0:
        return pd.DataFrame({
            "group_key": pd.Series(dtype=str),
            "alias_norm": pd.Series(dtype=str),
            "alias": pd.Series(dtype=str),
            "surface": pd.Series(dtype=str),
            "ner_type": pd.Series(dtype=str),
            "min_mention": pd.Series(dtype=str),
            "n_mentions": pd.Series(dtype="int64"),
            "ctx_sample": pd.Series(dtype=str),
        })
    df = df.sort_values(["group_key", "alias", "surface", "ner_type"])
    out = df.groupby("group_key", sort=True).agg(
        alias_norm=("alias_norm", "first"),
        alias=("alias", "first"),
        surface=("surface", "first"),
        ner_type=("ner_type", "first"),
        min_mention=("min_mention", "min"),
        n_mentions=("n_mentions", "sum"),
    ).reset_index()
    out["n_mentions"] = out["n_mentions"].astype("int64")
    s = df.sort_values("group_key", kind="mergesort")
    gk = s["group_key"].to_numpy()
    samples_col = s["ctx_sample"].tolist()
    bounds = np.flatnonzero(gk[1:] != gk[:-1]) + 1
    starts = np.concatenate(([0], bounds, [len(gk)]))
    merged: dict[str, str] = {}
    for a, b in zip(starts[:-1], starts[1:]):
        merged[gk[a]] = (samples_col[a] if b - a == 1
                         else merge_samples(samples_col[a:b]))
    out["ctx_sample"] = out["group_key"].map(merged)
    return out


def _group_aligned_chunks(tbl: pa.Table, key: str, target: int) -> list:
    """Sort by ``key`` and slice into chunks of ~target rows whose
    boundaries fall on key changes (all rows of a key in one chunk)."""
    import numpy as np

    if tbl.num_rows == 0:
        return [tbl]
    idx = pc.sort_indices(tbl, sort_keys=[(key, "ascending")])
    tbl = tbl.take(idx)
    col = tbl.column(key).combine_chunks()
    n = len(col)
    neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
    starts = np.concatenate(
        ([0],
         np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1,
         [n])
    )
    chunks, lo = [], 0
    for b in starts[1:]:
        if b - lo >= target or b == n:
            if b > lo:
                chunks.append(tbl.slice(lo, b - lo))
            lo = b
    return chunks


def _merge_chunk_with_dfreq(tbl: pa.Table):
    """_merge_chunk plus this chunk's partial document frequency
    (term -> number of aliases carrying it) — additive across
    group-aligned chunks, so the driver only merges small dicts."""
    import json

    merged = _merge_chunk(tbl)
    dfreq: dict[str, int] = {}
    if merged.num_rows:
        for x in merged.column("ctx_raw").to_pylist():
            if x:
                for term in json.loads(x):
                    dfreq[term] = dfreq.get(term, 0) + 1
    return merged, {"dfreq": dfreq, "rows": merged.num_rows}


def _finalize_profile_part(tbl: pa.Table, common_ref) -> pa.Table:
    """Per-part context finalize: strip common terms (global df filter)
    + cap, and attach surface_norm."""
    import json

    import ray

    from .ctxvec import own_name_terms, strip_and_cap
    from .text import normalize_name

    if tbl.num_rows == 0:
        return tbl
    common = _maybe_get(common_ref)
    sn = [normalize_name(x) for x in tbl.column("surface").to_pylist()]
    an = tbl.column("alias_norm").to_pylist()
    vecs = [strip_and_cap(json.loads(x) if x else {}, common,
                          own_name_terms(a, s))
            for x, a, s in zip(tbl.column("ctx_raw").to_pylist(), an, sn)]
    tbl = tbl.drop_columns(["ctx_raw"])
    return tbl.append_column(
        "ctx_vec", pa.array(vecs, pa.string())
    ).append_column("surface_norm", pa.array(sn, pa.string()))


def _merge_profiles_fast(cat: pa.Table) -> pa.Table:
    """Merge collected partial profiles: group-aligned chunks fan out
    as plain Ray tasks (the JSON sample merging measured ~7s serial at
    9.6M turns — parallel with no exchange and no Ray Data executor
    startup), each returning (merged part, partial dfreq). The driver
    only merges the small per-chunk dfreq dicts and broadcasts the
    common-term set; the global finalize (df strip + cap, el.ctxvec)
    fans back out over the SAME part refs — merged parts never land on
    the driver until the final contracted concat."""
    import ray

    from .ctxvec import df_threshold

    if cat.num_rows == 0:
        return cat
    chunks = _group_aligned_chunks(cat, "group_key", 20_000)
    merge_rem = ray.remote(num_returns=2)(_merge_chunk_with_dfreq)
    out = [merge_rem.remote(c) for c in chunks]
    metas = ray.get([m for _, m in out])
    dfreq: dict[str, int] = {}
    for m in metas:
        for term, c in m["dfreq"].items():
            dfreq[term] = dfreq.get(term, 0) + c
    # total distinct aliases = sum of part sizes (chunks are
    # group-aligned, so no group spans two parts)
    n_aliases = sum(m["rows"] for m in metas)
    thr = df_threshold(n_aliases)
    common = {term for term, c in dfreq.items() if c > thr}
    common_ref = ray.put(common)
    fin_rem = ray.remote(_finalize_profile_part)
    parts = [t for t in ray.get(
        [fin_rem.remote(tref, common_ref) for tref, _ in out]
    ) if t.num_rows]
    if not parts:
        return pa.table({})
    cols = parts[0].column_names
    return pa.concat_tables([t.select(cols) for t in parts])


def _merge_partition_with_dfreq(*tbls):
    """One hash partition's slices -> (merged part, partial dfreq)."""
    tbls = [t for t in tbls if t is not None and t.num_rows]
    if not tbls:
        return pa.table({}), {"dfreq": {}, "rows": 0}
    cols = tbls[0].column_names
    cat = pa.concat_tables([t.select(cols) for t in tbls],
                           promote_options="default")
    return _merge_chunk_with_dfreq(cat)


def _merge_profiles_refs(partial_refs) -> pa.Table:
    """Task-shuffle flavor of _merge_profiles_fast over combiner-partial
    REFS: hash-exchange on group_key in plain tasks, per-partition merge
    + partial dfreq, then the same global-df finalize fan-out. The
    bundles x distinct-aliases duplicate rows never land on the driver —
    only the contracted (1x aliases) profile does, cutting the fixed
    driver cost of the alias_profile stage (~1.5 s at bench32)."""
    import ray

    from .ctxvec import df_threshold
    from .shuffle import _partition_one, default_partitions

    P = default_partitions()
    part = ray.remote(_partition_one).options(num_returns=P)
    cols = [part.remote(r, ["group_key"], P) for r in partial_refs]
    cols = [[c] if P == 1 else list(c) for c in cols]
    red = ray.remote(num_returns=2)(_merge_partition_with_dfreq)
    out = [red.remote(*[cols[i][p] for i in range(len(cols))])
           for p in range(P)]
    metas = ray.get([m for _, m in out])
    dfreq: dict[str, int] = {}
    for m in metas:
        for term, c in m["dfreq"].items():
            dfreq[term] = dfreq.get(term, 0) + c
    n_aliases = sum(m["rows"] for m in metas)
    if n_aliases == 0:
        return pa.table({})
    thr = df_threshold(n_aliases)
    common = {term for term, c in dfreq.items() if c > thr}
    common_ref = ray.put(common)
    fin_rem = ray.remote(_finalize_profile_part)
    parts = [t for t in ray.get(
        [fin_rem.remote(tref, common_ref) for tref, _ in out]
    ) if t.num_rows]
    if not parts:
        return pa.table({})
    cols = parts[0].column_names
    return pa.concat_tables([t.select(cols) for t in parts])


def _finalize_profile_distributed(profile_ds_or_refs, num_partitions: int):
    """Distributed analog of _merge_profiles' context finalization: the
    profile blocks already hold complete per-alias ctx samples (group
    co-location), so this adds the global document-frequency filter —
    one small term-count TASK shuffle, collect ONLY the common terms
    (the few above the df threshold), broadcast, strip + cap per alias.
    Accepts a Dataset or a list of table refs; returns a Dataset."""
    import ray
    import ray.data

    import pandas as pd

    from .ctxvec import df_threshold, strip_and_cap, sum_sample
    from .shuffle import map_refs, task_group_blocks
    from .text import normalize_name

    if isinstance(profile_ds_or_refs, list):
        refs = profile_ds_or_refs
    else:
        refs = profile_ds_or_refs.materialize().to_arrow_refs()
    nrows_rem = ray.remote(lambda t: t.num_rows)
    n_aliases = sum(ray.get([nrows_rem.remote(r) for r in refs]))
    thr = df_threshold(n_aliases)

    def term_rows(t: pa.Table) -> pa.Table:
        out = []
        for s in t.column("ctx_sample").to_pylist():
            out.extend(sum_sample(s).keys())
        return pa.table({"term": pa.array(out, pa.string())})

    def block_count(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"term": pd.Series(dtype=str),
                                 "df": pd.Series(dtype="int64")})
        out = df.groupby("term", as_index=False).size().rename(
            columns={"size": "df"})
        return out[out["df"] > thr]  # only common terms leave the block

    common_refs = task_group_blocks(
        map_refs(refs, term_rows), ["term"], block_count,
        batch_format="pandas", num_partitions=num_partitions,
    )
    common: set = set()
    for t in ray.get(common_refs):  # small by the df cut
        if t.num_rows:
            common.update(t.column("term").to_pylist())
    ref = ray.put(common)

    def attach(t: pa.Table) -> pa.Table:
        from .ctxvec import own_name_terms

        com = ray.get(ref)
        sn = [normalize_name(s) for s in t.column("surface").to_pylist()]
        an = t.column("alias_norm").to_pylist()
        vecs = [strip_and_cap(sum_sample(s), com, own_name_terms(a, s2))
                for s, a, s2 in zip(t.column("ctx_sample").to_pylist(),
                                    an, sn)]
        t = t.drop_columns(["ctx_sample"])
        return t.append_column("ctx_vec", pa.array(vecs, pa.string())) \
                .append_column("surface_norm", pa.array(sn, pa.string()))

    return ray.data.from_arrow_refs(map_refs(refs, attach))


def _pair_indices_from_profile(profile_tbl: pa.Table, with_keys: bool = True,
                               key_strategies: tuple | None = None,
                               snb_window: int | None = None):
    """Blocking + pair-index generation over the distinct-alias profile
    (alias-scale python + pair-scale numpy — cheap on the driver): same
    key functions and per-block salting/caps as the distributed path,
    plus cross-block dedup. Returns (i1, i2, keys, dropped): row-index
    pairs into the profile, per-pair block key, dropped-pair count.
    ``with_keys=False`` skips the per-pair block-key array (the scoring
    path never reads it; the object-dtype repeat + first-occurrence
    dedup it forces is ~half the cost at 800k pairs) and dedups by
    sorted pair id instead."""
    import numpy as np

    from .blocking import (DEFAULT_KEY_STRATEGIES, DEFAULT_SNB_WINDOW,
                           MAX_ALIASES_PER_BLOCK, _salt, profile_key_map)

    gkeys = profile_tbl.column("group_key").to_pylist()
    norms = profile_tbl.column("alias_norm").to_pylist()
    key_map = profile_key_map(
        gkeys, norms, key_strategies or DEFAULT_KEY_STRATEGIES,
        snb_window=snb_window or DEFAULT_SNB_WINDOW)
    i1_parts: list[np.ndarray] = []
    i2_parts: list[np.ndarray] = []
    key_parts: list[str] = []
    key_counts: list[int] = []
    dropped = 0
    for k in sorted(key_map):
        idxs = key_map[k]
        n = len(idxs)
        if n < 2:
            continue
        if n <= MAX_ALIASES_PER_BLOCK:
            groups = [idxs]
        else:
            n_salts = -(-n // MAX_ALIASES_PER_BLOCK)
            buckets: dict[int, list[int]] = {}
            for i in idxs:
                buckets.setdefault(_salt(gkeys[i], n_salts), []).append(i)
            groups = list(buckets.values())
            total = n * (n - 1) // 2
            dropped += total - sum(len(g) * (len(g) - 1) // 2 for g in groups)
        for g in groups:
            if len(g) < 2:
                continue
            arr = np.asarray(g, dtype=np.int64)
            r, c = np.triu_indices(len(arr), k=1)
            i1_parts.append(arr[r])
            i2_parts.append(arr[c])
            key_parts.append(k)
            key_counts.append(len(r))
    if not i1_parts:
        empty = np.array([], dtype=np.int64)
        return empty, empty, np.array([], dtype=object), dropped
    i1 = np.concatenate(i1_parts)
    i2 = np.concatenate(i2_parts)
    # cross-block dedup on (i1, i2) — indices are group_key-sorted so
    # i1 < i2 in node order
    pair_ids = i1.astype(np.int64) * len(gkeys) + i2
    if not with_keys:
        ids = np.unique(pair_ids)  # sorted distinct pair ids
        return ids // len(gkeys), ids % len(gkeys), None, dropped
    keys = np.repeat(np.array(key_parts, dtype=object), key_counts)
    _, first = np.unique(pair_ids, return_index=True)
    first.sort()
    return i1[first], i2[first], keys[first], dropped


def _pairs_from_profile(profile_tbl: pa.Table,
                        key_strategies: tuple | None = None,
                        snb_window: int | None = None) -> pa.Table:
    """Driver-side pair TABLE build over the profile (checkpoint-plan
    form; the fast plan ships index slices to tasks instead —
    _score_edges_idx_slice). Vectorized: per-pair columns are pure
    take()s over per-alias arrays — measured 5.6s -> <1s at 800k
    pairs."""
    import numpy as np

    i1, i2, keys, dropped = _pair_indices_from_profile(
        profile_tbl, key_strategies=key_strategies, snb_window=snb_window)
    gkeys = profile_tbl.column("group_key").to_pylist()
    norms = profile_tbl.column("alias_norm").to_pylist()
    if len(i1) == 0:
        names = ["a1", "a2", "alias1", "alias2", "surface1", "surface2",
                 "ner1", "ner2", "block_key", "n1", "n2", "s1n", "s2n",
                 "ctx1", "ctx2"]
        tbl = pa.table({n: pa.array([], pa.string()) for n in names})
        return tbl.append_column("dropped_pairs", pa.array([], pa.int64()))
    node_arr = pa.array([f"A:{g}" for g in gkeys], pa.string())
    norms_arr = pa.array(norms, pa.string())
    ia1, ia2 = pa.array(i1), pa.array(i2)

    def take(col: str, idx: pa.Array) -> pa.Array:
        return profile_tbl.column(col).take(idx)

    tbl = pa.table(
        {
            "a1": node_arr.take(ia1),
            "a2": node_arr.take(ia2),
            "alias1": take("alias", ia1),
            "alias2": take("alias", ia2),
            "surface1": take("surface", ia1),
            "surface2": take("surface", ia2),
            "ner1": take("ner_type", ia1),
            "ner2": take("ner_type", ia2),
            "block_key": pa.array(keys, pa.string()),
            # pre-normalized + context columns: the scorer consumes these
            # directly (no per-pair re-normalization in the hot stage)
            "n1": norms_arr.take(ia1),
            "n2": norms_arr.take(ia2),
            "s1n": take("surface_norm", ia1),
            "s2n": take("surface_norm", ia2),
            "ctx1": take("ctx_vec", ia1),
            "ctx2": take("ctx_vec", ia2),
        }
    )
    return tbl.append_column(
        "dropped_pairs", pa.array([dropped] * len(tbl), pa.int64())
    )


def _score_edges_idx_slice(profile_ref, i1, i2) -> pa.Table:
    """Build ONE pair slice in-task from the shared profile (take()s
    over alias-scale arrays — the per-pair work never touches the
    driver), score it, and return only the merge edges. Emits just the
    columns the scorer consumes (prenorm + context + node ids)."""
    prof = _maybe_get(profile_ref)
    ia1, ia2 = pa.array(i1), pa.array(i2)
    gk = prof.column("group_key")
    node1 = pc.binary_join_element_wise(
        pa.array(["A:"] * len(i1)), gk.take(ia1).combine_chunks(), "")
    node2 = pc.binary_join_element_wise(
        pa.array(["A:"] * len(i2)), gk.take(ia2).combine_chunks(), "")
    t = pa.table({
        "a1": node1,
        "a2": node2,
        "n1": prof.column("alias_norm").take(ia1),
        "n2": prof.column("alias_norm").take(ia2),
        "s1n": prof.column("surface_norm").take(ia1),
        "s2n": prof.column("surface_norm").take(ia2),
        "ctx1": prof.column("ctx_vec").take(ia1),
        "ctx2": prof.column("ctx_vec").take(ia2),
    })
    s = score_pairs_batch(t)
    return s.filter(
        pc.greater_equal(s.column("score"), MERGE_CUTOFF)
    ).select(["a1", "a2"])


def _pair_group_shards(profile_tbl: pa.Table, target_pairs: int,
                       max_shards: int,
                       key_strategies: tuple | None = None,
                       snb_window: int | None = None):
    """Blocking over the distinct-alias profile, stopping at GROUPS:
    returns (shards, n_pairs, dropped) where each shard is a list of
    np.int64 row-index arrays (one per within-block group) packed
    greedily to ~equal pair counts. The pair-scale work (triu, dedup,
    table build, scoring) happens INSIDE the scoring tasks — the driver
    only does alias-scale blocking, so this stage's driver cost no
    longer grows with the pair count. Cross-block duplicate pairs may
    be scored twice in different shards (each shard dedups locally);
    duplicate merge edges are harmless to the downstream union-find /
    label propagation (verified semantics: min-adoption + idempotent
    union)."""
    import numpy as np

    from .blocking import (DEFAULT_KEY_STRATEGIES, DEFAULT_SNB_WINDOW,
                           MAX_ALIASES_PER_BLOCK, _salt, profile_key_map)

    gkeys = profile_tbl.column("group_key").to_pylist()
    norms = profile_tbl.column("alias_norm").to_pylist()
    key_map = profile_key_map(
        gkeys, norms, key_strategies or DEFAULT_KEY_STRATEGIES,
        snb_window=snb_window or DEFAULT_SNB_WINDOW)
    groups: list = []
    counts: list[int] = []
    dropped = 0
    for k in sorted(key_map):
        idxs = key_map[k]
        n = len(idxs)
        if n < 2:
            continue
        if n <= MAX_ALIASES_PER_BLOCK:
            gs = [idxs]
        else:
            n_salts = -(-n // MAX_ALIASES_PER_BLOCK)
            buckets: dict[int, list[int]] = {}
            for i in idxs:
                buckets.setdefault(_salt(gkeys[i], n_salts), []).append(i)
            gs = list(buckets.values())
            total = n * (n - 1) // 2
            dropped += total - sum(len(g) * (len(g) - 1) // 2 for g in gs)
        for g in gs:
            if len(g) >= 2:
                groups.append(np.asarray(g, dtype=np.int64))
                counts.append(len(g) * (len(g) - 1) // 2)
    n_pairs = sum(counts)
    if not groups:
        return [], 0, dropped
    n_shards = max(1, min(max_shards, -(-n_pairs // target_pairs)))
    shards: list[list] = [[] for _ in range(n_shards)]
    loads = [0] * n_shards
    for cnt, g in sorted(zip(counts, groups),
                         key=lambda x: -x[0]):
        j = loads.index(min(loads))
        shards[j].append(g)
        loads[j] += cnt
    return [s for s in shards if s], n_pairs, dropped


def _score_edges_groups(profile_ref, groups) -> pa.Table:
    """Scoring task over one shard of blocking groups: pair indices are
    generated HERE (triu per group + local dedup), then scored via the
    shared profile — the driver never touches pair-scale arrays."""
    import numpy as np

    prof = _maybe_get(profile_ref)
    i1p, i2p = [], []
    for g in groups:
        arr = np.asarray(g, dtype=np.int64)
        r, c = np.triu_indices(len(arr), k=1)
        i1p.append(arr[r])
        i2p.append(arr[c])
    if not i1p:
        return pa.table({"a1": pa.array([], pa.string()),
                         "a2": pa.array([], pa.string())})
    i1 = np.concatenate(i1p)
    i2 = np.concatenate(i2p)
    n = prof.num_rows
    ids = np.unique(i1 * np.int64(n) + i2)
    return _score_edges_idx_slice(prof, ids // n, ids % n)


def _link_batch(t: pa.Table, kb_ref) -> pa.Table:
    """Task-based link decision over distinct contraction nodes: the KB
    index ref resolves from shared memory per task (actor-pool form:
    el.linkdecide.CandidateLinker, for heavyweight per-actor state)."""
    import ray

    from .linkdecide import link_group_keys_batch

    kb = _maybe_get(kb_ref)
    keys = t.column("group_key").to_pylist()
    rows = link_group_keys_batch(keys, kb)
    return pa.table({
        "group_key": pa.array(keys, pa.string()),
        "kb_id": pa.array([r[0] for r in rows], pa.string()),
        "link_score": pa.array([r[1] for r in rows], pa.float64()),
        "link_conf": pa.array([r[2] for r in rows], pa.float64()),
    })


def _finish_batch(t: pa.Table, map_ref) -> pa.Table:
    """Final mention-scale map: attach cluster / kb_link / confidence
    from the broadcast group-key answer TABLE (zero-copy from the
    object store; a table broadcast serializes ~20x faster than the
    former per-alias dict). One hash-join via pc.index_in + three
    take()s — no per-key Python."""
    import ray

    amap = _maybe_get(map_ref)  # pa.Table keyed by group_key
    pos = pc.index_in(t.column("group_key").combine_chunks(),
                      value_set=amap.column("group_key").combine_chunks())
    keep = t.select(["mention_id", "conv_id", "turn_idx", "surface", "alias"])
    return (
        keep.append_column(
            "cluster_id", amap.column("cluster_id").take(pos))
        .append_column("kb_link", amap.column("kb_link").take(pos))
        .append_column("confidence", amap.column("confidence").take(pos))
    )


class _Finisher:
    """Actor-pool form of _finish_batch (for callers that prefer a pool
    when the alias map is very large and worth pinning per actor)."""

    def __init__(self, map_ref):
        import ray

        self.alias_map = ray.get(map_ref)  # pa.Table broadcast
        self._ref = map_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        return _finish_batch(t, self._ref)


def _boundary_rows_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:  # empty read splits yield schemaless blocks
        return pa.table({})
    return t.filter(pc.equal(t.column("boundary"), True))


# --------- plan-level blocking-key emitters (fallback plan, §2.10)
def _tbl_count(t: pa.Table) -> int:
    return t.num_rows


def _token_df_partial(t: pa.Table) -> dict:
    """Per-block token-df partial over the distinct-alias profile (the
    'rare_token' strategy's side table; alias-vocabulary-bounded — the
    er.py rare_token_keys broadcast precedent)."""
    from .blocking import alias_token_dfs

    return alias_token_dfs(t.column("alias_norm").to_pylist())


def _snb_tile_rows(t: pa.Table, offset: int, window: int) -> pa.Table:
    """Task: emit the 'snb' rank-tile key rows for one SORTED profile
    block whose first row has global rank ``offset`` — each alias joins
    tiles r//window and r//window + 1 (blocking.snb_tile_keys), so the
    downstream per-block pair generator covers every pair within rank
    distance < window of the global sorted order."""
    import numpy as np

    if t.num_rows == 0:
        return t.append_column("block_key", pa.array([], pa.string()))
    r = np.arange(offset, offset + t.num_rows, dtype=np.int64)
    tile = r // np.int64(window)
    idx = pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64), 2))
    keys = np.empty(2 * t.num_rows, dtype=object)
    keys[0::2] = [f"sn:{v}" for v in tile]
    keys[1::2] = [f"sn:{v + 1}" for v in tile]
    return t.take(idx).append_column("block_key",
                                     pa.array(keys, pa.string()))


EMPTY_CHOICES = {
    "alias_norm": pa.string(), "conv_id": pa.string(),
    "kind": pa.string(), "kb_id": pa.string(),
}


def _empty_choices() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in EMPTY_CHOICES.items()})


def _choice_dict(tbls) -> dict:
    out: dict = {}
    for p in tbls:
        for r in p.to_pylist():
            out[(r["alias_norm"], r["conv_id"])] = (r["kind"], r["kb_id"])
    return out


def _scan_partials_task(kb_ref, sports: bool, *tbls: pa.Table):
    """ONE wave per bundle of materialized mention blocks doing both the
    override scan AND the combiner: returns (partial alias profile,
    boundary rows, resolved override-choice rows). Flagging, subset and
    per-conversation override resolution all run here, in-task — the
    flagged rows never leave their bundle, so no driver-side subset
    materialization exists at any scale, and the combiner needs no
    prior wave at all.

    Correct without the boundary patch because conversations are
    contiguous within a bundle under the fused conv-sorted plan
    (bundles are consecutive blocks of the conv-sorted corpus):
    - edge (block-straddling) conversations carry boundary=True on
      EVERY row, so the non-boundary remainder consists only of whole
      interior conversations, whose aliases the patch never touches —
      flags, choices and the partial profile computed here are exactly
      the post-patch values, and the local choices ARE the global
      choices for these conversations;
    - edge conversations are excluded from the local partial profile
      entirely; the DRIVER resolves, flags and profiles them from the
      returned boundary tables (complete by construction), emitting one
      extra partial — so nothing is double-counted or missed.

    Per-bundle cost grows with the bundle's flagged-conversation rows;
    a corpus whose overrides concentrate in one key range skews this
    wave (acceptable: the same skew would hit any conv-partitioned
    resolve)."""
    from .overrides import SUBSET_COLUMNS, conv_overrides_block, flag_convs
    from .scorer import _duck

    _duck()  # pre-warm this worker's DuckDB connection: the scoring
    # tasks later land on the same worker pool, and a cold connection
    # there costs ~50ms x workers on the critical path
    kb = _maybe_get(kb_ref)
    tbls = [t for t in tbls if t.num_rows]
    if not tbls:
        return pa.table({}), pa.table({}), _empty_choices()
    cat = pa.concat_tables([t.select(tbls[0].column_names) for t in tbls])
    bmask = cat.column("boundary").combine_chunks()
    boundary = cat.filter(bmask)
    nb = cat.filter(pc.invert(bmask))
    if nb.num_rows == 0:
        return pa.table({}), boundary, _empty_choices()
    flags = flag_convs(nb, sorted(kb.ambiguous_aliases), sports)
    convs = sorted(set(flags.column("conv_id").to_pylist()))
    choices = _empty_choices()
    ov: dict = {}
    if convs:
        sub = nb.filter(
            pc.is_in(nb.column("conv_id").combine_chunks(),
                     value_set=pa.array(convs, pa.string()))
        ).select(SUBSET_COLUMNS)
        choices = conv_overrides_block(sub, kb, sports)
        ov = _choice_dict([choices])
    nb = _attach_group_keys(nb.drop_columns(["boundary"]), ov)
    out = _alias_profile_block(
        nb.select(PARTIAL_PROFILE_COLUMNS).to_pandas())
    return (pa.Table.from_pandas(out, preserve_index=False),
            boundary, choices)


def _scan_partials_driver(btbls, ctbls, kb, sports: bool):
    """Driver side of the merged wave: (a) resolve the boundary
    conversations whole (O(2 x blocks) conversations), (b) flag +
    resolve overrides for them (the only rows the in-task pass could
    not judge), (c) union the choice dicts, (d) profile the patched
    boundary rows as ONE extra partial. Returns
    (patch dict, override choice dict, boundary partial table | None).
    The override dict is the ONLY corpus-derived driver structure,
    bounded by the override-CHOICE count (the rare-override
    assumption), not by flagged-row count."""
    from .alias import resolve_block
    from .overrides import SUBSET_COLUMNS, conv_overrides_block, flag_convs

    choice_tbls = [c for c in ctbls if c.num_rows]
    btbls = [b for b in btbls if b.num_rows]
    patch: dict = {}
    bpart = None
    if btbls:
        btbl = pa.concat_tables(
            [t.select(btbls[0].column_names) for t in btbls])
        resolved = resolve_block(
            btbl.drop_columns(["alias", "alias_norm", "boundary"])
            .to_pandas())
        patch = dict(zip(resolved["mention_id"],
                         zip(resolved["alias"], resolved["alias_norm"])))
        rtbl = pa.Table.from_pandas(resolved, preserve_index=False)
        bflags = flag_convs(rtbl, sorted(kb.ambiguous_aliases), sports)
        bconvs = set(bflags.column("conv_id").to_pylist())
        if bconvs:
            bsub = rtbl.filter(pc.is_in(
                rtbl.column("conv_id").combine_chunks(),
                value_set=pa.array(sorted(bconvs), pa.string()),
            )).select(SUBSET_COLUMNS)
            bchoices = conv_overrides_block(bsub, kb, sports)
            if bchoices.num_rows:
                choice_tbls.append(bchoices)
        ov_all = _choice_dict(choice_tbls)
        bprof = _alias_profile_block(
            _attach_group_keys(rtbl, ov_all)
            .select(PARTIAL_PROFILE_COLUMNS).to_pandas())
        if len(bprof):
            bpart = pa.Table.from_pandas(bprof, preserve_index=False)
        return patch, ov_all, bpart
    return patch, _choice_dict(choice_tbls), bpart


PARTIAL_PROFILE_COLUMNS = ["mention_id", "alias", "alias_norm", "surface",
                           "ner_type", "context", "group_key"]


def _finish_with_meta(t: pa.Table, map_ref, ctx_refs=None):
    """_finish_batch plus this block's (first, last) sink-order keys —
    blocks under the fused conv-sorted plan are internally sorted, so
    first/last rows ARE the key range. ``ctx_refs`` (patch_ref, ov_ref)
    applies the boundary patch + group-key attach in-task (the fast
    plan never materializes a patched copy of the mention table)."""
    if t.num_rows == 0:
        return pa.table({}), None
    dbg = os.environ.get("EL_DEBUG_ANSWERS")
    if dbg:
        import time as _t
        _t0 = _t.time()
    if ctx_refs is not None:
        t = _patch_and_group(t, patch_ref=ctx_refs[0], ov_ref=ctx_refs[1])
    if dbg:
        _t1 = _t.time()
    out = _finish_batch(t, map_ref)
    if dbg:
        print(f"[finish] rows={t.num_rows} patch_s={_t1 - _t0:.3f} "
              f"finish_s={_t.time() - _t1:.3f}", flush=True)
    if out.num_rows == 0:
        meta = None
    else:
        meta = (
            out.column("conv_id")[0].as_py(),
            out.column("turn_idx")[0].as_py(),
            out.column("conv_id")[-1].as_py(),
            out.column("turn_idx")[-1].as_py(),
        )
    return out, meta


def _assemble_answers_refs(mention_refs, map_ref, ctx_refs=None) -> list:
    """Fast-plan answers assembly core -> ORDERED block refs: the final
    attach runs as plain tasks over the materialized mention blocks,
    and the sink ordering comes from reordering BLOCKS by their
    (conv_id, turn_idx) ranges instead of a sort exchange — valid
    because fused-plan blocks are internally sorted with
    non-overlapping ranges (read blocks partition the conv-sorted
    file). The range invariant is CHECKED; any violation (e.g. the
    conv_id-exchange plan, whose blocks interleave) falls back to
    Dataset.sort over the already-finished block refs, so nothing is
    recomputed. Returning refs (not a Dataset) lets the checkpoint
    layer persist one part per block, which preserves this order
    through a resume (write_parquet+read_parquet does not)."""
    import ray
    import ray.data

    if os.environ.get("EL_DEBUG_ANSWERS"):
        import time as _t
        _d0 = _t.time()
        amap = ray.get(map_ref)
        print(f"[answers] blocks={len(mention_refs)} "
              f"amap_rows={amap.num_rows} "
              f"amap_get_s={_t.time() - _d0:.3f}", flush=True)
    fin_rem = ray.remote(num_returns=2)(_finish_with_meta)
    out = [fin_rem.remote(r, map_ref, ctx_refs)
           for r in mention_refs]
    metas = ray.get([m for _, m in out])
    blocks = [(m, tref) for (tref, _), m in zip(out, metas)
              if m is not None]
    blocks.sort(key=lambda x: (x[0][0], x[0][1]))
    ordered = True
    for (pm, _), (nm, _) in zip(blocks, blocks[1:]):
        if (pm[2], pm[3]) > (nm[0], nm[1]):
            ordered = False
            break
    refs = [tref for _, tref in blocks]
    if not refs:
        empty = pa.table({
            "mention_id": pa.array([], pa.string()),
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "surface": pa.array([], pa.string()),
            "alias": pa.array([], pa.string()),
            "cluster_id": pa.array([], pa.string()),
            "kb_link": pa.array([], pa.string()),
            "confidence": pa.array([], pa.float64()),
        })
        return [ray.put(empty)]
    if ordered:
        return refs
    # loud fallback: unexpected under the fused plan — keep correctness
    print("[el.pipeline] block ranges overlap; falling back to sort "
          "for the sink ordering")
    ds = arrowize(ray.data.from_arrow_refs(refs)).sort(
        ["conv_id", "turn_idx"])
    return list(ds.materialize().to_arrow_refs())


def _assemble_answers_tasks(mention_refs, map_ref, ctx_refs=None):
    """Dataset-form wrapper over :func:`_assemble_answers_refs`."""
    import ray.data

    return ray.data.from_arrow_refs(
        _assemble_answers_refs(mention_refs, map_ref, ctx_refs))


def _cluster_aliases_driver(profile_tbl: pa.Table, links_tbl: pa.Table,
                            edges_tbl: pa.Table) -> dict[str, tuple[str, str, float]]:
    """Driver-side contracted-graph clustering.

    Returns alias_norm -> (cluster_id, kb_link, confidence). The cluster
    semantics (el.cluster.kb_constrained_components) mirror the
    reference at COMPONENT level: a merge always has a NIL side and two
    distinct KB entities never fuse, even transitively through NIL
    bridges (Clusterer.scala:40, 56-62); a NIL subcomponent adjacent to
    several KB entities adopts the min kb_id (the deterministic analog
    of the reference's order-dependent greedy merge); pure-NIL
    components get NIL:<min mention_id> (deterministic, replacing the
    AtomicInteger counter, RunKBPEntityLinkerSystem.scala:31-34).
    """
    from .cluster import kb_constrained_components_idx

    import numpy as np

    gkeys_arr = profile_tbl.column("group_key").combine_chunks()
    gkeys = gkeys_arr.to_pylist()
    min_mentions = profile_tbl.column("min_mention").to_pylist()
    n = len(gkeys)
    # links are generated from profile chunks in profile order; verify
    # and take the zero-copy alignment, falling back to an index-map
    # rebuild for reordered inputs (the checkpoint path)
    lk = links_tbl.column("group_key").combine_chunks()
    if n == len(lk) and lk.equals(gkeys_arr):
        kb_list = links_tbl.column("kb_id").to_pylist()
        conf = links_tbl.column("link_conf").to_numpy(zero_copy_only=False)
    else:
        idx = {g: i for i, g in enumerate(gkeys)}
        kb_list = [""] * n
        conf = np.full(n, 0.55)
        for gk, kb, cf in zip(lk.to_pylist(),
                              links_tbl.column("kb_id").to_pylist(),
                              links_tbl.column("link_conf").to_pylist()):
            i = idx[gk]
            kb_list[i] = kb
            conf[i] = cf
    # edge endpoints -> row indices, vectorized (merge edges are sparse)
    if edges_tbl.num_rows:
        e1 = pc.index_in(
            pc.utf8_slice_codeunits(
                edges_tbl.column("a1").combine_chunks(), 2),
            value_set=gkeys_arr).to_numpy(zero_copy_only=False)
        e2 = pc.index_in(
            pc.utf8_slice_codeunits(
                edges_tbl.column("a2").combine_chunks(), 2),
            value_set=gkeys_arr).to_numpy(zero_copy_only=False)
    else:
        e1 = e2 = np.array([], dtype=np.int64)
    comp_kb, label, size = kb_constrained_components_idx(
        kb_list, min_mentions, e1, e2)

    # vectorized alias_answer (el.cluster.alias_answer semantics)
    own = np.asarray(kb_list, dtype=object)
    conf = np.asarray(conf, dtype=np.float64)
    kbm = comp_kb != ""
    conf_out = np.where(
        kbm,
        np.where(own == comp_kb, conf, 0.7),
        np.where(size > 1, 0.6, np.clip(conf, 0.10, 0.6)),
    )
    cluster = np.where(kbm, comp_kb, label)
    kb_link = comp_kb.copy()
    nil_idx = np.flatnonzero(~kbm)
    if len(nil_idx):
        kb_link[nil_idx] = [f"NIL:{label[i]}" for i in nil_idx.tolist()]
    return pa.table({
        "group_key": gkeys_arr,
        "cluster_id": pa.array(cluster, pa.string()),
        "kb_link": pa.array(kb_link, pa.string()),
        "confidence": pa.array(conf_out, pa.float64()),
    })


def _cluster_aliases_distributed(profile_ds, links_ds, edges_ds, num_partitions: int):
    """Fallback for contracted graphs too large for the driver: the SAME
    KB-constrained clustering semantics as the driver path
    (el.cluster.kb_constrained_components), expressed as plain min-label
    propagation over a TRANSFORMED graph:

    - fuzzy edges are rewritten under the merge constraint (two small
      hash exchanges attach each endpoint's kb id, then NIL-NIL edges
      are kept, NIL-KB edges become K-tagged seed labels on the NIL
      side, and KB-KB edges are dropped) — so propagation can never
      fuse two KB entities, even transitively through NIL bridges;
    - aliases linked to the same kb share a hub node C:<kb>;
    - labels are explicitly tagged ("K:<kb>" < "M:<mention>" < SENTINEL),
      so KB-vs-NIL discrimination never depends on raw id ordering.

    Returns a Dataset (group_key, cluster_id, kb_link, confidence) with
    confidences identical to the driver path (el.cluster.alias_answer).
    """
    import numpy as np
    import pandas as pd
    import ray
    import ray.data

    from .cluster import label_propagation_tasks
    from .shuffle import map_refs, task_group_blocks

    links_refs = links_ds.map_batches(
        lambda t: t.select(["group_key", "kb_id", "link_conf"]),
        batch_format="pyarrow",
    ).materialize().to_arrow_refs()
    prof_refs = profile_ds.materialize().to_arrow_refs()
    edge_refs = edges_ds.materialize().to_arrow_refs()

    # ---- edge transform: attach each endpoint's kb, then rewrite
    SEP = "\x01"

    def edge_sides(t: pa.Table) -> pa.Table:
        a1 = t.column("a1").to_pylist()
        a2 = t.column("a2").to_pylist()
        key, eid, side = [], [], []
        for x, y in zip(a1, a2):
            e = f"{x}{SEP}{y}"
            key.append(x[2:])  # strip "A:"
            eid.append(e)
            side.append(1)
            key.append(y[2:])
            eid.append(e)
            side.append(2)
        return pa.table({"key": pa.array(key, pa.string()),
                         "eid": pa.array(eid, pa.string()),
                         "side": pa.array(side, pa.int32()),
                         "kb": pa.array([""] * len(key), pa.string())})

    def link_rows(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t.column("kb_id"), ""))
        n = len(f)
        return pa.table({"key": f.column("group_key"),
                         "eid": pa.array([""] * n, pa.string()),
                         "side": pa.array([0] * n, pa.int32()),
                         "kb": f.column("kb_id")})

    def attach_kb(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"eid": pd.Series(dtype=str),
                                 "side": pd.Series(dtype="int32"),
                                 "kb": pd.Series(dtype=str)})
        kb_of = df[df["side"] == 0].set_index("key")["kb"]
        e = df[df["side"] != 0]
        return pd.DataFrame({
            "eid": e["eid"],
            "side": e["side"],
            "kb": e["key"].map(kb_of).fillna(""),
        })

    sides_refs = task_group_blocks(
        map_refs(edge_refs, edge_sides) + map_refs(links_refs, link_rows),
        ["key"], attach_kb, batch_format="pandas",
        num_partitions=num_partitions,
    )

    def rewrite_edges(df: pd.DataFrame) -> pd.DataFrame:
        """per-eid: (kb1, kb2) -> kept edge / seed label / drop. Output
        rows (src, dst, node, label, kind): kind 'e' = edge, 's' = seed."""
        if len(df) == 0:
            return pd.DataFrame({"src": pd.Series(dtype=str),
                                 "dst": pd.Series(dtype=str),
                                 "node": pd.Series(dtype=str),
                                 "label": pd.Series(dtype=str),
                                 "kind": pd.Series(dtype=str)})
        w = df.pivot_table(index="eid", columns="side", values="kb",
                           aggfunc="first").reindex(columns=[1, 2]).fillna("")
        eids = w.index.to_numpy()
        kb1 = w[1].to_numpy()
        kb2 = w[2].to_numpy()
        parts = np.char.partition(eids.astype(str), SEP)
        src, dst = parts[:, 0], parts[:, 2]
        out = []
        for s, d, k1, k2 in zip(src, dst, kb1, kb2):
            if k1 and k2:
                continue
            if k1:
                out.append(("", "", d, f"K:{k1}", "s"))
            elif k2:
                out.append(("", "", s, f"K:{k2}", "s"))
            else:
                out.append((s, d, "", "", "e"))
        return pd.DataFrame(out, columns=["src", "dst", "node", "label",
                                          "kind"])

    rewritten_refs = task_group_blocks(sides_refs, ["eid"], rewrite_edges,
                                       batch_format="pandas",
                                       num_partitions=num_partitions)

    def keep_edges_fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("kind"), "e")).select(
            ["src", "dst"])

    def seed_labels_fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("kind"), "s")).select(
            ["node", "label"])

    kept_edge_refs = map_refs(rewritten_refs, keep_edges_fn)
    seed_label_refs = map_refs(rewritten_refs, seed_labels_fn)

    # ---- initial labels + anchor edges
    def alias_nodes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.binary_join_element_wise(
                    pa.array(["A:"] * len(t), pa.string()), t.column("group_key"), ""
                ),
                "label": pc.binary_join_element_wise(
                    pa.array(["M:"] * len(t), pa.string()), t.column("min_mention"), ""
                ),
            }
        )

    def linked_labels(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t.column("kb_id"), ""))
        return pa.table(
            {
                "node": pc.binary_join_element_wise(
                    pa.array(["A:"] * len(f), pa.string()), f.column("group_key"), ""
                ),
                "label": pc.binary_join_element_wise(
                    pa.array(["K:"] * len(f), pa.string()), f.column("kb_id"), ""
                ),
            }
        )

    def hub_nodes(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t.column("kb_id"), ""))
        return pa.table(
            {
                "node": pc.binary_join_element_wise(
                    pa.array(["C:"] * len(f), pa.string()), f.column("kb_id"), ""
                ),
                "label": pc.binary_join_element_wise(
                    pa.array(["K:"] * len(f), pa.string()), f.column("kb_id"), ""
                ),
            }
        )

    def anchor_edges(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t.column("kb_id"), ""))
        return pa.table(
            {
                "src": pc.binary_join_element_wise(
                    pa.array(["A:"] * len(f), pa.string()), f.column("group_key"), ""
                ),
                "dst": pc.binary_join_element_wise(
                    pa.array(["C:"] * len(f), pa.string()), f.column("kb_id"), ""
                ),
            }
        )

    all_edge_refs = kept_edge_refs + map_refs(links_refs, anchor_edges)

    def node_min(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=str),
                                 "label": pd.Series(dtype=str)})
        return df.groupby("node", as_index=False)["label"].min()

    init_refs = task_group_blocks(
        map_refs(prof_refs, alias_nodes)
        + map_refs(links_refs, linked_labels)
        + map_refs(links_refs, hub_nodes)
        + seed_label_refs,
        ["node"], node_min, batch_format="pandas",
        num_partitions=num_partitions,
    )
    label_refs = label_propagation_tasks(all_edge_refs, init_refs,
                                         num_partitions=num_partitions)

    def alias_labels_fn(t: pa.Table) -> pa.Table:
        f = t.filter(pc.starts_with(t.column("node"), "A:"))
        return pa.table({
            "group_key": pc.utf8_slice_codeunits(f.column("node"), 2),
            "label": f.column("label"),
        })

    alias_label_refs = map_refs(label_refs, alias_labels_fn)

    # ---- per-alias answers (cluster_id, kb_link, confidence)
    def merge_links(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"group_key": pd.Series(dtype=str),
                                 "label": pd.Series(dtype=str),
                                 "kb_id": pd.Series(dtype=str),
                                 "link_conf": pd.Series(dtype="float64")})
        lab = df[df["kind"] == "L"]
        lnk = df[df["kind"] == "K"].set_index("group_key")
        return pd.DataFrame({
            "group_key": lab["group_key"],
            "label": lab["label"],
            "kb_id": lab["group_key"].map(lnk["kb_id"]).fillna(""),
            "link_conf": lab["group_key"].map(
                lnk["link_conf"].astype("float64")).fillna(0.55),
        })

    def tag_label_fn(t: pa.Table) -> pa.Table:
        return t.append_column(
            "kind", pa.array(["L"] * len(t), pa.string())).append_column(
            "kb_id", pa.array([""] * len(t), pa.string())).append_column(
            "link_conf", pa.array([0.0] * len(t), pa.float64()))

    def tag_link_fn(t: pa.Table) -> pa.Table:
        return pa.table({"group_key": t.column("group_key"),
                         "label": pa.array([""] * len(t), pa.string()),
                         "kind": pa.array(["K"] * len(t), pa.string()),
                         "kb_id": t.column("kb_id"),
                         "link_conf": t.column("link_conf")})

    merged_refs = task_group_blocks(
        map_refs(alias_label_refs, tag_label_fn)
        + map_refs(links_refs, tag_link_fn),
        ["group_key"], merge_links, batch_format="pandas",
        num_partitions=num_partitions,
    )

    def finish_block(df: pd.DataFrame) -> pd.DataFrame:
        """per-label block: component size + the shared answer rule
        (el.cluster.alias_answer, vectorized)."""
        if len(df) == 0:
            return pd.DataFrame({"group_key": pd.Series(dtype=str),
                                 "cluster_id": pd.Series(dtype=str),
                                 "kb_link": pd.Series(dtype=str),
                                 "confidence": pd.Series(dtype="float64")})
        size = df.groupby("label")["group_key"].transform("size")
        is_kb = df["label"].str.startswith("K:")
        cluster = df["label"].str.slice(2)
        kb_link = np.where(is_kb, cluster, "NIL:" + cluster)
        conf = np.where(
            is_kb,
            np.where(df["kb_id"] == cluster, df["link_conf"], 0.7),
            np.where(size > 1, 0.6,
                     np.minimum(np.maximum(df["link_conf"], 0.10), 0.6)),
        )
        return pd.DataFrame({
            "group_key": df["group_key"],
            "cluster_id": cluster,
            "kb_link": kb_link,
            "confidence": conf,
        })

    answer_refs = task_group_blocks(merged_refs, ["label"], finish_block,
                                    batch_format="pandas",
                                    num_partitions=num_partitions)

    # clean Arrow schema (pandas object dtypes confuse Dataset.join)
    def clean_fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "group_key": t.column("group_key").cast(pa.string()),
            "cluster_id": t.column("cluster_id").cast(pa.string()),
            "kb_link": t.column("kb_link").cast(pa.string()),
            "confidence": t.column("confidence").cast(pa.float64()),
        })

    return ray.data.from_arrow_refs(map_refs(answer_refs, clean_fn))


def run_linkage(
    fixture_dir: str,
    checkpoint_dir: str | None = None,
    from_scratch: bool = False,
    concurrency: int | None = None,
    batch_size: int = 8192,
    num_partitions: int = 8,
    driver_cc_max_nodes: int = DRIVER_CC_MAX_NODES,
    timings: dict | None = None,
    sports_classify: bool = True,
    conv_partitioned: bool = True,
    broadcast_answers_max: int = 2_000_000,
    key_strategies: tuple | None = None,
    snb_window: int | None = None,
):
    """Full pipeline. Returns the answers Dataset with columns
    (mention_id, conv_id, turn_idx, surface, alias, cluster_id, kb_link,
    confidence), sorted by (conv_id, turn_idx) — the north-rule stable
    ordering.

    Two physical plans, same semantics (equivalence is a pytest):

    - DEFAULT (mention count <= driver_cc_max_nodes): mention-scale work
      is distributed (extract+canonicalize fused into one conv_id
      exchange; the final attach + sort); the alias-scale work —
      profile merge, KB linking, pair generation, union-find — runs on
      the driver over the collected partial profiles. The contracted
      alias set is orders of magnitude smaller than the mention table,
      and every avoided hash exchange saves ~3s of aggregator-actor
      startup, so this minimizes fixed overhead per run.
    - FALLBACK (beyond the driver guard): every alias-scale stage runs
      distributed too (hash-partitioned profile, linker actor pool,
      blocked pair generation, min-label propagation, hash join back).

    ``key_strategies`` picks the blocking-key emitters (default
    ("norm", "prefix", "phonetic"); add "rare_token" and/or "snb" —
    el/blocking.py::block_keys / profile_key_map, mirroring the
    reference's candidate-finder composition,
    RunKBPEntityLinkerSystem.scala:45-49). Extra strategies only ADD
    candidate pairs (recall can't drop); all run behind the same
    per-block salting/cap machinery. ``snb_window`` sets the
    sorted-neighborhood rank-tile width. On the distributed fallback
    plan the per-alias strategies apply; "snb" additionally sorts the
    profile once and unions rank-tile key rows into the key exchange.
    """
    import ray
    import ray.data

    cpus = int(ray.cluster_resources().get("CPU", 4))
    if concurrency is None:
        # light actor pools (fallback-plan linker): a quarter of the
        # CPUs, capped — oversized pools pay startup without speedup
        concurrency = max(2, min(8, cpus // 4))

    import time as _time

    ckpt = CheckpointManager(checkpoint_dir, from_scratch)
    tr_path = os.path.join(fixture_dir, "transcripts.parquet")
    kb_path = os.path.join(fixture_dir, "kb.parquet")

    def _timed(name, fn):
        t0 = _time.time()
        r = fn()
        if timings is not None:
            timings[name] = round(_time.time() - t0, 3)
        return r

    def collect(ds) -> pa.Table:
        tbls = [ray.get(r) for r in ds.to_arrow_refs()]
        tbls = [t for t in tbls if t.num_rows]
        if not tbls:
            return pa.table({})
        cols = tbls[0].column_names  # blocks may order columns differently
        return pa.concat_tables([t.select(cols) for t in tbls])

    # [A+B] extraction + per-conversation alias canonicalization.
    # DEFAULT (conv_partitioned=True): the input contract says
    # transcripts are sorted by (conv_id, turn_idx); both stages FUSE
    # into one stateless map over the read (no conv_id hash exchange);
    # block-straddling conversations are patched via a tiny broadcast
    # map (O(2 x blocks) rows). The boundary patch and the group_key
    # column are applied INSIDE each consuming task (vectorized,
    # rare-row-only), so the raw mention table is the ONLY full
    # object-store pin in the fast plan.
    # FALLBACK (conv_partitioned=False): arbitrarily-ordered input pays
    # the one conv_id exchange; equivalence is a pytest.
    from .kb import KBIndex
    from .overrides import find_context_overrides

    kb_index = KBIndex.from_parquet(kb_path)
    kb_ref = ray.put(kb_index)

    def compute_patch(raw) -> dict:
        """Boundary-conversation re-resolution: plain tasks filter each
        materialized block to its boundary rows (tiny), the driver
        resolves them whole (O(2 x blocks) conversations)."""
        from .alias import resolve_block

        rem = ray.remote(_boundary_rows_block)
        tbls = [t for t in ray.get(
            [rem.remote(r) for r in raw.to_arrow_refs()]) if t.num_rows]
        if not tbls:
            return {}
        btbl = pa.concat_tables(
            [t.select(tbls[0].column_names) for t in tbls])
        resolved = resolve_block(
            btbl.drop_columns(["alias", "alias_norm", "boundary"]).to_pandas()
        )
        return dict(zip(resolved["mention_id"],
                        zip(resolved["alias"], resolved["alias_norm"])))

    fast_fused = conv_partitioned
    profile_tbl_ckpt = None
    if fast_fused:
        # Plain-task fragment read+extract: Ray Data's parquet reader
        # creates ONE read task per file (SplitBlocks only splits the
        # OUTPUT), so a corpus delivered as few coarse files caps the
        # fused read+extract wave at n_files tasks (straggler-bound
        # 1.45x at 64 files / 32 CPUs, measured), and the earlier fix —
        # materialize the narrow read first (~2.5s) — was pure fixed
        # overhead the 8-CPU arm never paid. Instead, split each file
        # into contiguous ROW-GROUP ranges (fragments) and run
        # read+extract as one plain-task wave at ~4 tasks/CPU: no
        # materialized read, no Dataset machinery, and fragment blocks
        # stay intra-sorted (the boundary patch re-resolves
        # conversations straddling any cut, as it already did for
        # re-block cuts). With a checkpoint dir the wave persists one
        # parquet part PER BLOCK (in-task, parallel) so a resume
        # relaunches read tasks instead of re-extracting — block
        # identity (internal sort, non-overlapping conv ranges) is
        # what the sort-free sink relies on, so blocks round-trip 1:1.
        fm_spec = {"input": tr_path, "plan": "fast-fused"}

        def build_frag_refs():
            frag_specs = _fragment_specs(tr_path, target_tasks=4 * cpus)
            fx_rem = ray.remote(_read_extract_fragment)
            refs = [fx_rem.remote(path, lo, hi)
                    for path, lo, hi in frag_specs]
            ray.wait(refs, num_returns=len(refs), fetch_local=False)
            return refs

        frag_refs = _timed("aliased", lambda: ckpt.stage_block_refs(
            "fused_mentions", fm_spec, build_frag_refs))
        raw = ray.data.from_arrow_refs(frag_refs)
        # ONE merged wave over the blocks does the override scan,
        # per-conversation resolution AND the combiner (partial alias
        # profiles) per bundle — flagged rows never leave their bundle,
        # boundary rows come back for the driver patch, and no earlier
        # wave exists between extraction and the contracted profile.
        import numpy as np

        mention_refs = frag_refs
        # resumable meta stage: patch/override dicts + the contracted
        # profile (all alias-scale) persist together after the profile
        # merge; a valid manifest skips the scan wave AND the merge
        meta_spec = {"input": tr_path, "kb": kb_path,
                     "sports": sports_classify, "plan": "fast-fused"}
        fast_meta = ckpt.load_tables("fast_profile", meta_spec)
        if fast_meta is not None:
            pt = fast_meta["patch"]
            patch = dict(zip(
                pt.column("mention_id").to_pylist(),
                zip(pt.column("alias").to_pylist(),
                    pt.column("alias_norm").to_pylist())))
            patch_ref = ray.put(patch)
            ov_ref = ray.put(_ov_table_from_choices(
                fast_meta["overrides"]))
            partial_refs = None
            profile_tbl_ckpt = fast_meta["profile"]
            aliased = raw.map_batches(
                _patch_and_group, fn_kwargs={"patch_ref": patch_ref},
                batch_format="pyarrow",
            )
            n_mentions = raw.count()
        else:
            # 2 tasks/CPU gives the wave straggler slack (measured ~1s
            # at bench32/32cpu vs 1 task/CPU); the 64 ceiling bounds
            # the hot-alias duplicate factor in the combiner partials
            try:
                ncpu = int(ray.cluster_resources().get("CPU", 8))
            except Exception:  # noqa: BLE001 — before init
                ncpu = 8
            nb_cap = int(os.environ.get("EL_SCAN_BUNDLES_CAP",
                                        str(min(64, max(32, 2 * ncpu)))))
            nb_bundles = max(1, min(nb_cap, len(mention_refs)))
            sp_rem = ray.remote(num_returns=3)(_scan_partials_task)
            triples = [
                sp_rem.remote(kb_ref, sports_classify,
                              *(mention_refs[i] for i in b))
                for b in np.array_split(np.arange(len(mention_refs)),
                                        nb_bundles)
                if len(b)
            ]
            def _finish_scan():
                btbls = ray.get([b for _, b, _ in triples])
                ctbls = ray.get([c for _, _, c in triples])
                return _scan_partials_driver(btbls, ctbls, kb_index,
                                             sports_classify)

            patch, overrides, bpart = _timed("scan", _finish_scan)
            if os.environ.get("EL_DEBUG_ANSWERS"):
                print(f"[bcast] patch={len(patch)} "
                      f"overrides={len(overrides)}", flush=True)
            patch_ref = ray.put(patch)
            ov_ref = ray.put(_ov_table(overrides))
            partial_refs = [p for p, _, _ in triples]
            if bpart is not None and bpart.num_rows:
                partial_refs.append(ray.put(bpart))
            # lazy patched view for any Dataset-form consumer
            aliased = raw.map_batches(
                _patch_and_group, fn_kwargs={"patch_ref": patch_ref},
                batch_format="pyarrow",
            )
            n_mentions = raw.count()
    else:
        def build_aliased():
            src = ray.data.read_parquet(
                tr_path, columns=["conv_id", "turn_idx", "text"])
            if conv_partitioned:
                raw = src.map_batches(_extract_canonicalize_fused,
                                      batch_format="pyarrow",
                                      batch_size=None).materialize()
                pref = ray.put(compute_patch(raw))
                return raw.map_batches(
                    _patch_and_group, fn_kwargs={"patch_ref": pref},
                    batch_format="pyarrow",
                )
            return canonicalize(
                _timed("extract", lambda: extract_mentions(src)
                       .select_columns(
                           ["mention_id", "conv_id", "turn_idx", "beg",
                            "end", "surface", "ner_type", "context"])
                       .materialize())
            )

        aliased = _timed("aliased", lambda: ckpt.stage(
            "aliased",
            {"input": tr_path, "conv_partitioned": conv_partitioned},
            build_aliased,
        ))
        n_mentions = aliased.count()
    # Tier-1 guard: mention count (cheap, conservative). Tier-2 (fast
    # plan only): the driver plan never materializes the mention table —
    # it collects the CONTRACTED alias profile — so when tier 1 trips,
    # probe the real quantity: launch the combiner tasks (needed by the
    # driver plan anyway), sum their row counts without pulling a byte
    # to the driver, and reclaim the fast plan when the contraction is
    # strong. Only a corpus whose contracted profile itself exceeds the
    # guard pays the distributed fallback.
    # a resumed fast_profile checkpoint implies a driver-path run (the
    # stage is only saved on that path), so the guard is pre-decided
    driver_path = (profile_tbl_ckpt is not None
                   or n_mentions <= driver_cc_max_nodes)
    if fast_fused and not driver_path:
        nrows_rem = ray.remote(lambda t: t.num_rows)
        n_partial_rows = _timed("profile_probe", lambda: sum(ray.get(
            [nrows_rem.remote(r) for r in partial_refs])))
        if n_partial_rows <= driver_cc_max_nodes:
            driver_path = True
        else:
            # the probe's combiner output is NOT discarded: the fallback
            # merges the partials per group (an exchange over
            # ~bundles x distinct-aliases rows) instead of re-shuffling
            # the full mention table, and the override dict the probe
            # already paid for attaches group keys without a join
            logger.info(
                "driver-guard probe: %d partial profile rows > %d — "
                "using the distributed fallback plan over the partials",
                n_partial_rows, driver_cc_max_nodes)

    # [B2] per-document context overrides (doc-sim ambiguity resolution,
    # NE overlap, sports sense — el.overrides) -> contraction group_key.
    # With no ambiguous aliases and no sports candidates this is one
    # stateless scan and a passthrough column. The driver plan collects
    # the (rare-by-assumption) choices into a broadcast dict; the
    # fallback plan attaches them via a conv_id hash join instead, so
    # no corpus-proportional structure ever lives on the driver.
    fallback_partial_refs = None
    if driver_path:
        if fast_fused:
            # no second mention-table copy: the patch + group-key map
            # runs INSIDE the profile and answers tasks (vectorized,
            # rare-row-only) — the raw table is the only full pin;
            # overrides already resolved concurrently with the combiner
            ctx_refs = (patch_ref, ov_ref)
        else:
            overrides = _timed("overrides", lambda: find_context_overrides(
                aliased, kb_ref, sports=sports_classify,
                num_partitions=num_partitions))
            ov_ref = ray.put(_ov_table(overrides))
            grouped = aliased.map_batches(
                _patch_and_group, fn_kwargs={"ov_ref": ov_ref},
                batch_format="pyarrow",
            )
            if overrides:
                grouped = grouped.materialize()
    elif fast_fused:
        # probed fallback (fast plan, contraction too big for the
        # driver): group keys attach in-task from the override dict —
        # bounded by the override-CHOICE count — so no mention-table
        # join exchange; the combiner partials already carry final
        # group keys and feed the merge shuffle directly
        grouped = raw.map_batches(
            _patch_and_group,
            fn_kwargs={"patch_ref": patch_ref, "ov_ref": ov_ref},
            batch_format="pyarrow",
        )
        fallback_partial_refs = partial_refs
    else:
        from .overrides import context_override_rows

        ov_rows = _timed("overrides", lambda: context_override_rows(
            aliased, kb_ref, sports=sports_classify,
            num_partitions=num_partitions))
        grouped = _timed("group_attach", lambda: _attach_group_key_join(
            aliased, ov_rows, num_partitions).materialize())

    if driver_path:
        # per-READ-BLOCK partial profiles (combiner, parallel) -> ONE
        # collect -> task-parallel merge + context finalize (no
        # exchange: the contracted profile is driver-scale by contract)
        def build_profile_tasks() -> pa.Table:
            # bundle count trades combiner effectiveness against task
            # parallelism: hot aliases appear in EVERY bundle, so the
            # partial-row count is ~bundles x distinct-aliases. The
            # combiner launched right after the fused scan with final
            # group keys; the merge is a plain-task hash shuffle over
            # the partial refs — only the contracted profile lands on
            # the driver.
            return _merge_profiles_refs(partial_refs)

        def build_profile():
            bs = max(32768, -(-n_mentions // 32))
            partials = grouped.select_columns(
                PARTIAL_PROFILE_COLUMNS
            ).map_batches(_alias_profile_block, batch_format="pandas",
                          batch_size=bs)
            return ray.data.from_arrow(_merge_profiles_fast(collect(partials)))

        if fast_fused:
            if profile_tbl_ckpt is not None:
                profile_tbl = profile_tbl_ckpt
            else:
                profile_tbl = _timed("alias_profile", build_profile_tasks)
                # persist the alias-scale meta together (no-op without
                # a checkpoint root): resume skips scan + merge
                ckpt.save_tables("fast_profile", meta_spec, {
                    "profile": profile_tbl,
                    "patch": pa.table({
                        "mention_id": pa.array(list(patch), pa.string()),
                        "alias": pa.array(
                            [v[0] for v in patch.values()], pa.string()),
                        "alias_norm": pa.array(
                            [v[1] for v in patch.values()], pa.string()),
                    }),
                    "overrides": pa.table({
                        "alias_norm": pa.array(
                            [k[0] for k in overrides], pa.string()),
                        "conv_id": pa.array(
                            [k[1] for k in overrides], pa.string()),
                        "kind": pa.array(
                            [v[0] for v in overrides.values()],
                            pa.string()),
                        "kb_id": pa.array(
                            [v[1] for v in overrides.values()],
                            pa.string()),
                    }),
                })
        else:
            profile = _timed("alias_profile", lambda: ckpt.stage(
                "alias_profile", {"input": tr_path}, build_profile))
            profile_tbl = collect(profile)

        # resumable link/edge tables (fast plan, alias-scale): a valid
        # manifest skips BOTH the link fan-out and pair scoring
        led_spec = {"input": tr_path, "kb": kb_path, "plan": "fast-fused"}
        led = (ckpt.load_tables("fast_links_edges", led_spec)
               if fast_fused else None)

        # link decision: task fan-out over group_key chunks, LAUNCHED
        # before pair scoring and collected after it — the two stages
        # depend only on the profile, so the link scan rides along with
        # the scoring wave instead of serializing in front of it
        link_refs = None
        if led is not None:
            pass  # both tables resumed below
        elif ckpt.root is None or fast_fused:
            link_chunks = _chunk_table(profile_tbl.select(["group_key"]),
                                       1024)
            link_rem = ray.remote(_link_batch)
            link_refs = [link_rem.remote(c, kb_ref) for c in link_chunks]
        else:
            def build_links():
                src = profile_tbl.select(["group_key"])
                chunks = _chunk_table(src, 1024)
                return ray.data.from_arrow(chunks).map_batches(
                    _link_batch,
                    fn_kwargs={"kb_ref": kb_ref},
                    batch_format="pyarrow",
                    batch_size=1024,
                )

            links = _timed("links", lambda: ckpt.stage(
                "links", {"input": tr_path, "kb": kb_path}, build_links))
            links_tbl = collect(links)

        def build_scored():
            pairs_tbl = _pairs_from_profile(profile_tbl, key_strategies,
                                            snb_window)
            # split into many blocks: map_batches parallelism is per
            # BLOCK, and from_arrow of one table yields a single block
            chunks = _chunk_table(pairs_tbl, 4096)
            return ray.data.from_arrow(chunks).map_batches(
                score_pairs_batch,
                batch_format="pyarrow",
                batch_size=batch_size,
            )

        def edge_filter(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.greater_equal(t.column("score"), MERGE_CUTOFF)
            ).select(["a1", "a2"])

        if led is not None:
            links_tbl, edges_tbl = led["links"], led["edges"]
        elif ckpt.root is None or fast_fused:
            # task-based scoring over SHARDS of blocking groups: pair
            # generation (triu + dedup), table build, scoring and
            # thresholding all run in-task; the driver does only
            # alias-scale blocking and shard packing, so its cost no
            # longer grows with the pair count
            def scored_edges_tasks() -> pa.Table:
                shards, _n_pairs, _dropped = _timed(
                    "pair_gen",
                    lambda: _pair_group_shards(
                        profile_tbl, batch_size, max_shards=16 * cpus,
                        key_strategies=key_strategies,
                        snb_window=snb_window))
                if not shards:
                    return pa.table({"a1": pa.array([], pa.string()),
                                     "a2": pa.array([], pa.string())})
                prof_ref = ray.put(profile_tbl.select(
                    ["group_key", "alias_norm", "surface_norm", "ctx_vec"]))
                rem = ray.remote(_score_edges_groups)
                outs = ray.get([rem.remote(prof_ref, s) for s in shards])
                ne = [t for t in outs if t.num_rows]
                if not ne:
                    return pa.table({"a1": pa.array([], pa.string()),
                                     "a2": pa.array([], pa.string())})
                return pa.concat_tables(
                    [t.select(["a1", "a2"]) for t in ne])

            edges_tbl = _timed("scored_pairs", scored_edges_tasks)
            def links_collect() -> pa.Table:
                parts = ray.get(link_refs)
                if not parts:
                    return pa.table({
                        "group_key": pa.array([], pa.string()),
                        "kb_id": pa.array([], pa.string()),
                        "link_score": pa.array([], pa.float64()),
                        "link_conf": pa.array([], pa.float64()),
                    })
                cols = parts[0].column_names
                return pa.concat_tables([t.select(cols) for t in parts])

            links_tbl = _timed("links", links_collect)
            if fast_fused:  # no-op without a checkpoint root
                ckpt.save_tables("fast_links_edges", led_spec,
                                 {"links": links_tbl, "edges": edges_tbl})
        else:
            scored = _timed("scored_pairs", lambda: ckpt.stage(
                "scored_pairs", {"input": tr_path}, build_scored))
            edges_tbl = collect(scored.map_batches(edge_filter,
                                                   batch_format="pyarrow"))

        if fast_fused:
            def build_answers_fast():
                alias_map = _timed(
                    "answers_cluster",
                    lambda: _cluster_aliases_driver(profile_tbl,
                                                    links_tbl, edges_tbl))
                map_ref = ray.put(alias_map)
                return _timed(
                    "answers_attach",
                    lambda: _assemble_answers_tasks(mention_refs, map_ref,
                                                    ctx_refs))

            if ckpt.root is None:
                return _timed("answers", build_answers_fast)

            # checkpoint the answers as ORDERED BLOCK REFS (one part
            # per block): the Dataset write_parquet/read_parquet round
            # trip does not preserve block order, and the fast plan's
            # sink order is block-range-based, not re-sorted
            def build_answer_refs():
                alias_map = _cluster_aliases_driver(
                    profile_tbl, links_tbl, edges_tbl)
                map_ref = ray.put(alias_map)
                return _assemble_answers_refs(mention_refs, map_ref,
                                              ctx_refs)

            return _timed("answers", lambda: ray.data.from_arrow_refs(
                ckpt.stage_block_refs(
                    "answers",
                    {"input": tr_path, "kb": kb_path,
                     "plan": "fast-fused"},
                    build_answer_refs)))

        def build_answers():
            alias_map = _cluster_aliases_driver(profile_tbl, links_tbl,
                                                edges_tbl)
            map_ref = ray.put(alias_map)
            finished = grouped.map_batches(
                _finish_batch,
                fn_kwargs={"map_ref": map_ref},
                batch_format="pyarrow",
                # batch_size=None keeps whole blocks -> block order +
                # in-block order survive the map
                batch_size=None,
            )
            # the sink sort is NOT skippable even though fused blocks
            # are emitted pre-sorted: the streaming executor reorders
            # completed blocks (preserve_order defaults off, and turning
            # it on taxes every stage) — measured as a rare ordering
            # flake. Pre-sorted blocks still make the range sort cheap.
            return arrowize(finished).sort(["conv_id", "turn_idx"])

        return _timed("answers", lambda: ckpt.stage(
            "answers", {"input": tr_path, "kb": kb_path}, build_answers))

    # ----------------------------------------------- distributed fallback
    def build_profile_distributed():
        if fallback_partial_refs is not None:
            # probed fallback: the shuffle moves partial PROFILE rows
            # (~bundles x aliases), not the mention table — and runs as
            # a plain-task shuffle (no aggregator fleet)
            from .shuffle import task_group_blocks

            merged_refs = task_group_blocks(
                fallback_partial_refs, ["group_key"],
                _merge_partials_block,
                batch_format="pandas", num_partitions=num_partitions)
            return _finalize_profile_distributed(merged_refs,
                                                 num_partitions)
        src = group_blocks(
            grouped.select_columns(
                ["mention_id", "alias", "alias_norm", "surface",
                 "ner_type", "context", "group_key"]
            ),
            ["group_key"], _alias_profile_block, batch_format="pandas",
        )
        return _finalize_profile_distributed(src, num_partitions)

    profile = _timed("alias_profile", lambda: ckpt.stage(
        "alias_profile", {"input": tr_path},
        build_profile_distributed).materialize())

    def build_links_distributed():
        if ckpt.root is None:
            # plain-task fan-out (no actor-pool startup); the KB index
            # resolves from shared memory inside each task
            from .shuffle import map_refs

            def link_fn(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return _link_batch(
                        pa.table({"group_key": pa.array([], pa.string())}),
                        kb_ref)
                return _link_batch(t.select(["group_key"]), kb_ref)

            return ray.data.from_arrow_refs(
                map_refs(profile.to_arrow_refs(), link_fn))
        return profile.map_batches(
            CandidateLinker,
            fn_constructor_args=(kb_ref,),
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=concurrency,
            num_cpus=0.5,
        ).select_columns(["group_key", "kb_id", "link_score", "link_conf"])

    links = _timed("links", lambda: ckpt.stage(
        "links", {"input": tr_path, "kb": kb_path},
        build_links_distributed).materialize())

    _pkey_cols = ["group_key", "alias_norm", "alias", "surface",
                  "ner_type", "surface_norm", "ctx_vec"]
    _strats = tuple(key_strategies) if key_strategies \
        else DEFAULT_KEY_STRATEGIES

    def _make_keys_fn(token_df_ref):
        def _keys_fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            df = (_maybe_get(token_df_ref)
                  if token_df_ref is not None else None)
            return emit_keys_batch(t.select(_pkey_cols), _strats, df)
        return _keys_fn

    def _pairs_block(t: pa.Table) -> pa.Table:
        from .shuffle import split_groups

        outs = [block_pair_groups(g) for g in split_groups(t, "block_key")]
        outs = [o for o in outs if o is not None]
        if not outs:
            return block_pair_groups(t)  # empty block emits its schema
        return pa.concat_tables(outs, promote_options="default")

    def _token_df_ref():
        """'rare_token' side table over the distinct-alias profile:
        per-block partials merged on the driver, broadcast ONCE
        (alias-vocabulary-bounded, the er.py precedent)."""
        if "rare_token" not in _strats:
            return None
        rem = ray.remote(_token_df_partial)
        merged: dict[str, int] = {}
        for part in ray.get([rem.remote(r)
                             for r in profile.to_arrow_refs()]):
            for tok, c in part.items():
                merged[tok] = merged.get(tok, 0) + c
        return ray.put(merged)

    def _snb_key_refs():
        """Plan-level 'snb' emitter: one profile sort (alias-scale) ->
        per-block rank-tile key rows with exact global offsets."""
        w = snb_window or DEFAULT_SNB_WINDOW
        nonempty = profile.map_batches(
            lambda t: t.select(_pkey_cols).filter(
                pc.not_equal(t.column("alias_norm"), "")),
            batch_format="pyarrow")
        refs = nonempty.sort(["alias_norm", "group_key"]).to_arrow_refs()
        counts = ray.get([ray.remote(_tbl_count).remote(r) for r in refs])
        offsets, acc = [], 0
        for c in counts:
            offsets.append(acc)
            acc += c
        rem = ray.remote(_snb_tile_rows)
        return [rem.remote(r, o, w) for r, o in zip(refs, offsets)]

    def build_scored():
        token_ref = _token_df_ref()
        keys_fn = _make_keys_fn(token_ref)
        if ckpt.root is None:
            # same key-only exchange, as a plain-task shuffle + task
            # scoring — mirrors the other fallback stages (the Ray Data
            # hash repartition + actor-pool form pays ~3-8s aggregator
            # startup per exchange and dominated the forced-fallback
            # scoring wall time)
            from .shuffle import map_refs, task_group_blocks

            key_refs = map_refs(profile.to_arrow_refs(), keys_fn)
            if "snb" in _strats:
                key_refs = key_refs + _snb_key_refs()
            pair_refs = task_group_blocks(
                key_refs, ["block_key"], _pairs_block,
                batch_format="pyarrow", num_partitions=num_partitions)
            return ray.data.from_arrow_refs(
                map_refs(pair_refs, score_pairs_batch))
        keys = profile.map_batches(keys_fn, batch_format="pyarrow")
        if "snb" in _strats:
            keys = keys.union(ray.data.from_arrow_refs(_snb_key_refs()))
        pairs = group_map(keys, "block_key", block_pair_groups)
        return pairs.map_batches(
            PairScorer,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=0.5,
        )

    scored = _timed("scored_pairs", lambda: ckpt.stage(
        "scored_pairs", {"input": tr_path}, build_scored).materialize())

    def build_answers():
        edges = scored.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("score"), MERGE_CUTOFF)
            ).select(["a1", "a2"]),
            batch_format="pyarrow",
        )
        answers = _timed("answers_cluster",
                         lambda: _cluster_aliases_distributed(
                             profile, links, edges, num_partitions))
        # size-adaptive attach: the answer side is ALIAS-scale. Below
        # the bound, broadcast it and attach in-task (classic
        # broadcast-join cutover — skips the full mention-table
        # exchange, which dominated the forced-fallback wall time);
        # beyond it, the group_key hash join below is the scale shape.
        if broadcast_answers_max > 0:
            ans_mat = answers.materialize()
            if ans_mat.count() <= broadcast_answers_max:
                cols = ["group_key", "cluster_id", "kb_link",
                        "confidence"]
                parts = [tt for tt in ray.get(ans_mat.to_arrow_refs())
                         if tt.num_rows]
                amap = pa.concat_tables([tt.select(cols) for tt in parts])
                map_ref = ray.put(amap)
                if fast_fused:
                    return _assemble_answers_tasks(
                        raw.to_arrow_refs(), map_ref,
                        (patch_ref, ov_ref))
                finished = grouped.map_batches(
                    _finish_batch, fn_kwargs={"map_ref": map_ref},
                    batch_format="pyarrow", batch_size=None)
                return arrowize(finished).sort(["conv_id", "turn_idx"])
            answers = ans_mat
        # hash-join mentions x alias answers on group_key via the
        # repo's group_blocks idiom (Dataset.join's aggregator rejects
        # empty-schema partitions, and this is one exchange either way)
        import pandas as pd

        from .shuffle import group_blocks

        m_rows = grouped.map_batches(
            lambda t: t.select(
                ["mention_id", "conv_id", "turn_idx", "surface", "alias",
                 "group_key"]
            )
            .append_column("cluster_id", pa.array([""] * len(t), pa.string()))
            .append_column("kb_link", pa.array([""] * len(t), pa.string()))
            .append_column("confidence",
                           pa.array([0.0] * len(t), pa.float64()))
            .append_column("kind", pa.array(["m"] * len(t), pa.string())),
            batch_format="pyarrow",
        )
        a_rows = answers.map_batches(
            lambda t: pa.table({
                "mention_id": pa.array([""] * len(t), pa.string()),
                "conv_id": pa.array([""] * len(t), pa.string()),
                "turn_idx": pa.array([0] * len(t), pa.int32()),
                "surface": pa.array([""] * len(t), pa.string()),
                "alias": pa.array([""] * len(t), pa.string()),
                "group_key": t.column("group_key"),
                "cluster_id": t.column("cluster_id"),
                "kb_link": t.column("kb_link"),
                "confidence": t.column("confidence"),
                "kind": pa.array(["a"] * len(t), pa.string()),
            }),
            batch_format="pyarrow",
        )

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            cols = ["mention_id", "conv_id", "turn_idx", "surface", "alias",
                    "cluster_id", "kb_link", "confidence"]
            if len(df) == 0:
                return pd.DataFrame({
                    "mention_id": pd.Series(dtype=str),
                    "conv_id": pd.Series(dtype=str),
                    "turn_idx": pd.Series(dtype="int32"),
                    "surface": pd.Series(dtype=str),
                    "alias": pd.Series(dtype=str),
                    "cluster_id": pd.Series(dtype=str),
                    "kb_link": pd.Series(dtype=str),
                    "confidence": pd.Series(dtype="float64"),
                })
            lut = df[df["kind"] == "a"].set_index("group_key")
            m = df[df["kind"] == "m"].copy()
            m["cluster_id"] = m["group_key"].map(lut["cluster_id"])
            m["kb_link"] = m["group_key"].map(lut["kb_link"])
            m["confidence"] = m["group_key"].map(lut["confidence"])
            return m[cols]

        finished = group_blocks(m_rows.union(a_rows), ["group_key"], attach,
                                batch_format="pandas",
                                num_partitions=num_partitions)
        return arrowize(finished).sort(["conv_id", "turn_idx"])

    return _timed("answers", lambda: ckpt.stage(
        "answers", {"input": tr_path, "kb": kb_path}, build_answers))


def _fresh_output_dir(path: str) -> None:
    """Ray's write_parquet APPENDS uuid-named part files to an existing
    directory, so re-running into a stale --output silently doubles the
    result. Clear a previous run's output (all-parquet dir) before
    writing; refuse to touch a directory holding anything else."""
    import shutil

    if os.path.isdir(path) and os.listdir(path):
        if all(f.endswith(".parquet") for f in os.listdir(path)):
            shutil.rmtree(path)
        else:
            raise SystemExit(
                f"--output {path} exists and contains non-parquet files; "
                "refusing to overwrite")


def main(argv=None):
    import argparse
    import ray

    # CLI parity with the reference's scopt options (baseDir/outputFile/
    # humanReadable/sportsClassify/fromScratch,
    # RunKBPEntityLinkerSystem.scala:207-216)
    ap = argparse.ArgumentParser(description="Ray-Data entity-linking pipeline")
    ap.add_argument("--input", required=True, help="fixture dir (transcripts+kb)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--from-scratch", action="store_true")
    ap.add_argument("--human-readable", action="store_true",
                    help="also write the answers x KB join next to --output")
    ap.add_argument("--entity-strings", action="store_true",
                    help="also write the per-mention canonicalization "
                         "dump (surface -> best entity string; "
                         "EntityStringFinder analog)")
    ap.add_argument("--jsonl", action="store_true",
                    help="also write the full answer rows as sorted "
                         "JSONL next to --output")
    ap.add_argument("--no-sports-classify", action="store_true",
                    help="disable the sports-sense override (linkQuery "
                         "steps 1+8)")
    ap.add_argument("--conv-unordered", action="store_true",
                    help="input is NOT conv-sorted: use the conv_id "
                         "exchange plan instead of the fused read")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--key-strategies", default=None,
                    help="comma list of blocking-key strategies "
                         "(norm,prefix,phonetic,rare_token,snb); "
                         "default norm,prefix,phonetic")
    ap.add_argument("--snb-window", type=int, default=None,
                    help="sorted-neighborhood rank-tile width "
                         "(with --key-strategies ...,snb)")
    args = ap.parse_args(argv)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True)
    try:
        answers = run_linkage(
            args.input, args.checkpoint_dir, args.from_scratch,
            sports_classify=not args.no_sports_classify,
            conv_partitioned=not args.conv_unordered,
            key_strategies=(tuple(args.key_strategies.split(","))
                            if args.key_strategies else None),
            snb_window=args.snb_window,
        )
        if args.human_readable or args.entity_strings or args.jsonl:
            answers = answers.materialize()  # several consumers -> pin
        _fresh_output_dir(args.output)
        answers.write_parquet(args.output)
        if args.human_readable:
            from .kb import broadcast_kb
            from .outputs import human_readable

            kb_ref = broadcast_kb(os.path.join(args.input, "kb.parquet"))
            hr_out = args.output.rstrip("/") + "_human_readable"
            _fresh_output_dir(hr_out)
            human_readable(answers, kb_ref).write_parquet(hr_out)
        if args.entity_strings:
            from .outputs import write_entity_strings

            es_out = args.output.rstrip("/") + "_entity_strings"
            _fresh_output_dir(es_out)
            write_entity_strings(answers, es_out)
        if args.jsonl:
            from .outputs import write_answers_jsonl

            jl_out = args.output.rstrip("/") + "_jsonl"
            _fresh_output_dir(jl_out)
            write_answers_jsonl(answers, jl_out)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
