"""Relational reshape operators: pivot, per-group running totals, and
rollup-style multi-level aggregates — the wide-table shapes a
training-data pipeline reaches for when flattening event streams into
per-entity feature rows.

Scale shapes (all one exchange, combiner-first):

- :func:`pivot_counts` — SQL PIVOT with a DECLARED category list (the
  IN-list contract: a pivot's output schema must be declared up front,
  not discovered — discovery would itself be a distinct pass). Per-batch
  crosstab partials (one tiny row per key per batch) meet in a single
  key hash exchange; undeclared category values count toward no column
  (dropped, like SQL PIVOT's IN list).
- :func:`running_total` — windowed cumulative sum per key: one hash
  exchange on the key co-locates each key's rows, then a block-local
  lexsort + offset-corrected cumsum (pure numpy, no per-row Python).
  Output has the SAME row count as the input — it streams out, never
  collecting. The 100-TB caveat is a single hot key whose rows exceed
  one block; that needs a two-pass carry (token_pack's distributed
  prefix-sum pattern, el/ops/prep.py) and is documented, not silent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import group_blocks


def pivot_counts(ds, key: str, col: str, categories: tuple[str, ...],
                 *, num_partitions: int | None = None):
    """One row per ``key``, one ``n_<category>`` int64 count column per
    declared category value of ``col``.

    Combiner: per-batch (key x category) counts — bounded by distinct
    keys per batch, not rows. Merge: one hash exchange on ``key``,
    block-local sum."""
    cats = list(categories)
    ncols = [f"n_{c}" for c in cats]

    def empty() -> pd.DataFrame:
        return pd.DataFrame({key: pd.Series(dtype="int64"),
                             **{n: pd.Series(dtype="int64")
                                for n in ncols}})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty()
        flags = {n: (df[col].to_numpy() == c).astype("int64")
                 for n, c in zip(ncols, cats)}
        return (df[[key]].assign(**flags)
                .groupby(key, as_index=False)[ncols].sum())

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty()
        out = df.groupby(key, as_index=False)[ncols].sum()
        for n in ncols:
            out[n] = out[n].astype("int64")
        return out

    return group_blocks(partials, [key], merge, batch_format="pandas",
                        num_partitions=num_partitions)


def zscore_normalize(ds, group: str = "event_type", val: str = "value",
                     id_col: str = "event_id", round_dp: int = 6, *,
                     num_partitions: int | None = None):
    """Per-group z-score feature normalization: z = (x - mean) / std
    (population std), the standard ML feature-scaling pass. Moments
    are accumulated as EXACT integer cents (sum and sum-of-squares per
    batch -> one tiny group exchange), so mean/std replay bit-for-bit
    in any engine; rows then stream through a broadcast moments map —
    the same row count out as in, no corpus-scale exchange anywhere.
    Zero-variance groups emit z = 0."""
    import ray

    from ..shuffle import group_blocks

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({group: pd.Series(dtype=str),
                                 "n": pd.Series(dtype="int64"),
                                 "s1": pd.Series(dtype="int64"),
                                 "s2": pd.Series(dtype="int64")})
        c = np.floor(df[val].to_numpy(dtype="float64") * 100
                     + 0.5).astype("int64")
        return (df[[group]].assign(n=1, s1=c, s2=c * c)
                .groupby(group, as_index=False)
                .agg(n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum")))

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({group: pd.Series(dtype=str),
                                 "n": pd.Series(dtype="int64"),
                                 "s1": pd.Series(dtype="int64"),
                                 "s2": pd.Series(dtype="int64")})
        return df.groupby(group, as_index=False).agg(
            n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))

    moments = group_blocks(partials, [group], merge,
                           batch_format="pandas",
                           num_partitions=num_partitions).to_pandas()
    # derive floats in ONE canonical expression order (the oracle uses
    # the identical expression, so IEEE determinism carries the hash)
    stats = {}
    for g, n, s1, s2 in zip(moments[group], moments["n"],
                            moments["s1"], moments["s2"]):
        mean_c = s1 / n
        var_c = s2 / n - mean_c * mean_c
        stats[g] = (mean_c, float(np.sqrt(var_c)))
    stats_ref = ray.put(stats)

    from .textstats import round_half_away

    def apply(df: pd.DataFrame, ref=stats_ref) -> pd.DataFrame:
        st = ray.get(ref)
        if len(df) == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 group: pd.Series(dtype=str),
                                 "z": pd.Series(dtype="float64")})
        sf = pd.DataFrame({group: list(st),
                           "mean_c": [st[g][0] for g in st],
                           "std_c": [st[g][1] for g in st]})
        j = df[[id_col, group, val]].merge(sf, on=group, how="left")
        c = np.floor(j[val].to_numpy(dtype="float64") * 100
                     + 0.5).astype("int64")
        mean_c = j["mean_c"].to_numpy()
        std_c = j["std_c"].to_numpy()
        z = np.where(std_c > 0, (c - mean_c) / np.where(std_c > 0,
                                                        std_c, 1.0), 0.0)
        return pd.DataFrame({id_col: j[id_col].to_numpy(),
                             group: j[group].to_numpy(),
                             "z": round_half_away(z, round_dp)})

    return ds.map_batches(apply, batch_format="pandas")


def group_topk(ds, group: str = "event_type", key: str = "user_id",
               val: str = "value", k: int = 3, *,
               num_partitions: int | None = None):
    """Top-k ``key`` per ``group`` by total ``val`` (exact integer
    cents; ties break to the smaller key). Shape: per-batch partial
    sums -> ONE exchange on (group, key) for exact totals ->
    per-partition per-group local top-k (each partition emits at most
    groups x k rows) -> one tiny single-partition merge. No partition
    ever holds a whole group's raw rows — only its (group, key)
    totals — so a hot group cannot overload a task.

    Out: (group, key, rk 1..k, total_value[2dp])."""
    from ..shuffle import group_blocks

    def empty() -> pd.DataFrame:
        return pd.DataFrame({group: pd.Series(dtype=str),
                             key: pd.Series(dtype="int64"),
                             "cents": pd.Series(dtype="int64")})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty()
        c = np.floor(df[val].to_numpy(dtype="float64") * 100
                     + 0.5).astype("int64")
        return (df[[group, key]].assign(cents=c)
                .groupby([group, key], as_index=False)["cents"].sum())

    partials = ds.map_batches(partial, batch_format="pandas")

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty()
        t = df.groupby([group, key], as_index=False)["cents"].sum()
        t = t.sort_values(["cents", key], ascending=[False, True],
                          kind="mergesort")
        return t.groupby(group, as_index=False, sort=False).head(k) \
            .reset_index(drop=True)

    heads = group_blocks(partials, [group, key], local_topk,
                         batch_format="pandas",
                         num_partitions=num_partitions)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        from .textstats import round_half_away

        if len(df) == 0:
            return pd.DataFrame({group: pd.Series(dtype=str),
                                 key: pd.Series(dtype="int64"),
                                 "rk": pd.Series(dtype="int64"),
                                 "total_value": pd.Series(dtype="float64")})
        t = df.sort_values(["cents", key], ascending=[False, True],
                           kind="mergesort")
        t = t.groupby(group, as_index=False, sort=False).head(k)
        t["rk"] = t.groupby(group).cumcount().astype("int64") + 1
        t["total_value"] = round_half_away(
            t["cents"].to_numpy() / 100.0, 2)
        return t[[group, key, "rk", "total_value"]].reset_index(drop=True)

    return heads.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def running_total(ds, key: str = "user_id",
                  order: tuple[str, str] = ("ts", "event_id"),
                  val: str = "value", out_col: str = "running_value",
                  int_scale: int | None = 100, *,
                  num_partitions: int | None = None):
    """Per-key cumulative sum of ``val`` in strict ``order`` — the
    ``SUM() OVER (PARTITION BY key ORDER BY ...)`` window. One hash
    exchange on ``key``; block-local lexsort + one cumsum with
    per-key offsets subtracted (vectorized; no per-row Python).

    ``int_scale``: fixed-decimal data (the default, 2dp -> 100) is
    accumulated as EXACT scaled int64, making the result independent
    of addition order — a SQL engine's segment-tree window sum then
    replays it bit-for-bit. ``None`` falls back to float64 cumsum
    (sequential order; only comparable to engines that also sum
    sequentially).

    Assumes one key's rows fit in a block (the group_blocks
    co-location contract); a pathological single hot key needs the
    two-pass carry of el/ops/prep.py's token_pack instead."""
    o1, o2 = order

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: pd.Series(dtype="int64"),
                o2: pd.Series(dtype="int64"),
                o1: pd.Series(dtype="datetime64[us]"),
                out_col: pd.Series(dtype="float64")})
        df = df.sort_values([key, o1, o2], kind="mergesort")
        k = df[key].to_numpy()
        v = df[val].to_numpy(dtype="float64")
        if int_scale is not None:
            v = np.floor(v * int_scale + 0.5).astype("int64")
        cs = np.cumsum(v)
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        counts = np.diff(np.concatenate((starts, [len(k)])))
        base = np.where(starts > 0, cs[starts - 1], 0)
        run = cs - np.repeat(base, counts)
        if int_scale is not None:
            run = run.astype("float64") / int_scale
        out = df[[key, o2, o1]].copy()
        out[out_col] = run
        return out.reset_index(drop=True)

    return group_blocks(ds, [key], block, batch_format="pandas",
                        num_partitions=num_partitions)


def assoc_rules(ds, key: str = "user_id", col: str = "event_type", *,
                num_partitions: int | None = None):
    """Market-basket association rules over per-``key`` DISTINCT
    ``col`` itemsets — support / confidence / lift for every directed
    type pair (the Agrawal-Srikant A-priori statistics at itemset size
    2, the feature-cooccurrence screen a training-data pipeline runs
    before one-hot crossing).

    Scale shape: per-batch (key, item) dedup partials -> ONE key hash
    exchange -> in-fold per-key distinct itemsets, emitting aggregated
    (item, item) pair / single / basket-count partial rows per block —
    each block's output is bounded by |item vocabulary|^2 + |vocab| +
    1 rows, INDEPENDENT of row count, so the driver-side final merge
    is over num_blocks x that bound, never data-scale (the
    pivot_counts IN-list argument: the item vocabulary is feature
    cardinality, not corpus cardinality). Metrics are single-division
    float64 written identically to the SQL oracle: support =
    n_both/n_baskets, confidence = n_both/n_ante, lift = n_both *
    n_baskets / (n_ante * n_cons), 6dp half-up.

    Out: one row per DIRECTED rule (antecedent -> consequent) with
    n_both >= 1: (antecedent, consequent, n_both, n_ante, n_cons,
    n_baskets, support, confidence, lift)."""

    def dedup_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series(dtype="int64"),
                                 col: pd.Series(dtype=str)})
        return df[[key, col]].drop_duplicates().reset_index(drop=True)

    partials = ds.map_batches(dedup_partial, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": str, "b": str}
        if len(df) == 0:
            return pd.DataFrame({**{c: pd.Series(dtype=t)
                                    for c, t in cols.items()},
                                 "c": pd.Series(dtype="int64"),
                                 "kind": pd.Series(dtype=str)})
        ut = df.drop_duplicates([key, col])
        # singles: item -> #baskets containing it (within this block's
        # key range; keys are co-located so counts are exact)
        singles = ut.groupby(col, as_index=False).size() \
            .rename(columns={col: "a", "size": "c"})
        singles["b"] = ""
        singles["kind"] = "s"
        # pairs: within-basket unordered item pairs, merged across
        # baskets via a self-join on the key (vocabulary-bounded)
        j = ut.merge(ut, on=key)
        j = j[j[f"{col}_x"] < j[f"{col}_y"]]
        pairs = j.groupby([f"{col}_x", f"{col}_y"], as_index=False) \
            .size().rename(columns={f"{col}_x": "a", f"{col}_y": "b",
                                    "size": "c"})
        pairs["kind"] = "p"
        baskets = pd.DataFrame({"a": [""], "b": [""],
                                "c": [ut[key].nunique()],
                                "kind": ["u"]})
        out = pd.concat([singles, pairs, baskets], ignore_index=True)
        out["c"] = out["c"].astype("int64")
        return out[["a", "b", "c", "kind"]]

    parts = group_blocks(partials, [key], fold, batch_format="pandas",
                         num_partitions=num_partitions).to_pandas()

    cols = {"antecedent": str, "consequent": str}
    icols = ("n_both", "n_ante", "n_cons", "n_baskets")
    fcols = ("support", "confidence", "lift")
    if len(parts) == 0:
        return pd.DataFrame({
            **{c: pd.Series(dtype=t) for c, t in cols.items()},
            **{c: pd.Series(dtype="int64") for c in icols},
            **{c: pd.Series(dtype="float64") for c in fcols}})
    agg = parts.groupby(["kind", "a", "b"], as_index=False)["c"].sum()
    nu = int(agg.loc[agg["kind"] == "u", "c"].sum())
    sing = dict(zip(agg.loc[agg["kind"] == "s", "a"],
                    agg.loc[agg["kind"] == "s", "c"].astype("int64")))
    p = agg[agg["kind"] == "p"]
    rules = pd.concat([
        p.rename(columns={"a": "antecedent", "b": "consequent"}),
        p.rename(columns={"b": "antecedent", "a": "consequent"}),
    ], ignore_index=True)[["antecedent", "consequent", "c"]]
    rules = rules.rename(columns={"c": "n_both"})
    rules["n_ante"] = rules["antecedent"].map(sing).astype("int64")
    rules["n_cons"] = rules["consequent"].map(sing).astype("int64")
    rules["n_both"] = rules["n_both"].astype("int64")
    rules["n_baskets"] = np.int64(nu)
    nb = rules["n_both"].to_numpy("float64")
    na = rules["n_ante"].to_numpy("float64")
    nc = rules["n_cons"].to_numpy("float64")
    r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    rules["support"] = r6(nb / float(nu))
    rules["confidence"] = r6(nb / na)
    rules["lift"] = r6(nb * float(nu) / (na * nc))
    return rules.sort_values(["antecedent", "consequent"]) \
        .reset_index(drop=True)


BLOOM_BITS = 65536  # 2^16 — positions are 16-bit slices of md5_u64


def bloom_semijoin(probe_ds, build_ds, *, probe_key: str,
                   build_key: str, bits: int = BLOOM_BITS,
                   num_partitions: int | None = None):
    """Bloom-filter semi-join: keep probe rows whose key PROBABLY
    appears in the build side — the compact-bitset membership pass a
    distributed engine runs before (or instead of) an exact semi-join
    exchange when the build side is too large to broadcast as a hash
    set but its BITSET is constant-size.

    Bloom contract (deterministic, SQL-replayable INCLUDING false
    positives): k=3 positions per key are the low/mid/high 16-bit
    slices of the shared engine/oracle hash ``md5_u64(str(key))``
    (el/scorer.py — the md5_number_lower contract), m = 65536 bits. A
    probe row passes iff all three bits are set. The oracle replays
    the exact same positions with DuckDB's md5_number_lower, so
    engine and oracle agree on every false positive.

    Scale shape: build side emits per-batch DISTINCT position partials
    (<= 3 x batch keys, capped by m); ONE position exchange dedupes to
    <= m rows — a CONSTANT-size frame collected once and broadcast as
    a numpy bitset via ray.put; the probe side filters per batch with
    one vectorized md5 pass + three bitset gathers. No corpus-scale
    exchange, no corpus-scale driver structure."""
    import ray

    from ..scorer import md5_u64
    from ..shuffle import group_blocks

    assert bits & (bits - 1) == 0, "bits must be a power of two"

    def positions(vals) -> np.ndarray:
        h = md5_u64([str(v) for v in vals])
        m = np.uint64(bits - 1)
        return np.stack([(h & m),
                         ((h >> np.uint64(16)) & m),
                         ((h >> np.uint64(32)) & m)]).astype(np.int64)

    def build_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"p": pd.Series(dtype="int64")})
        p = np.unique(positions(df[build_key]).ravel())
        return pd.DataFrame({"p": p})

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"p": pd.Series(dtype="int64")})
        return pd.DataFrame({"p": np.unique(df["p"].to_numpy("int64"))})

    pos = group_blocks(
        build_ds.map_batches(build_partial, batch_format="pandas"),
        ["p"], dedup, batch_format="pandas",
        num_partitions=num_partitions).to_pandas()
    bitset = np.zeros(bits, dtype=bool)
    bitset[pos["p"].to_numpy("int64")] = True
    bits_ref = ray.put(bitset)

    class _Probe:
        def __init__(self, ref):
            self.bits = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            p = positions(df[probe_key])
            keep = (self.bits[p[0]] & self.bits[p[1]]
                    & self.bits[p[2]])
            return df[keep].reset_index(drop=True)

    return probe_ds.map_batches(_Probe, fn_constructor_args=(bits_ref,),
                                batch_format="pandas", batch_size=4096,
                                concurrency=2, num_cpus=0.5)


def _ntile_count(t: pa.Table) -> int:
    return t.num_rows


def _ntile_assign(t: pa.Table, offset: int, n: int, k: int,
                  out_col: str) -> pa.Table:
    """Tile ids for one sorted block given its exact global offset —
    standard SQL NTILE: the first n % k tiles get ceil(n/k) rows."""
    if t.num_rows == 0:
        return t.append_column(out_col, pa.array([], pa.int64()))
    sz, big = n // k, n % k
    r = np.arange(offset, offset + t.num_rows, dtype=np.int64)
    cut = big * (sz + 1)
    tile = np.where(r < cut,
                    r // (sz + 1) + 1 if sz + 1 > 0 else 1,
                    big + (np.maximum(r - cut, 0) // max(sz, 1)) + 1)
    return t.append_column(out_col, pa.array(tile.astype("int64")))


def global_ntile(ds, *, order_by: list, k: int = 10,
                 out_col: str = "tile"):
    """Distributed NTILE(k) OVER (ORDER BY ...) — equal-frequency
    bucketing of the WHOLE dataset in global sort order (the
    equi-depth binning / decile-scoring pass; SQL NTILE semantics: the
    first n % k tiles get one extra row).

    Scale shape: one distributed sort on ``order_by``; per-block row
    counts -> exact global offsets (an O(num_blocks) driver list, the
    sorted_neighborhood boundary discipline el/ops/er.py:110); each
    block then assigns tiles independently from its offset — no
    second exchange, no row-scale driver structure."""
    import ray
    import ray.data

    sorted_ds = ds.sort(order_by)
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds
    count_rem = ray.remote(_ntile_count)
    counts = ray.get([count_rem.remote(r) for r in refs])
    n = int(sum(counts))
    assign_rem = ray.remote(_ntile_assign)
    outs, off = [], 0
    for r, c in zip(refs, counts):
        outs.append(assign_rem.remote(r, off, n, k, out_col))
        off += c
    return ray.data.from_arrow_refs(outs)


def _skyline_frame(df: pd.DataFrame, group: str, maxcol: str,
                   mincol: str) -> pd.DataFrame:
    """Exact 2-D skyline per group: keep rows not dominated by any row
    with (maxcol >=, mincol <=) and at least one strict. One
    sort+sweep per group — O(n log n), fully vectorized: after
    sorting by (maxcol desc, mincol asc), a row survives iff its
    mincol is the minimum of its maxcol-level AND strictly below the
    running minimum over all strictly-better levels (ties on both
    axes are mutually non-dominating and all survive)."""
    outs = []
    for _, sub in df.groupby(group, sort=False):
        sub = sub.sort_values([maxcol, mincol],
                              ascending=[False, True], kind="mergesort")
        lvlmin = sub.groupby(maxcol)[mincol].transform("min")
        # running min of level minima over strictly-higher levels
        lvl_first = ~sub[maxcol].duplicated()
        lvl_idx = lvl_first.cumsum().to_numpy() - 1
        # cummin shifted one level back; +inf before the first level
        prev = np.concatenate((
            [np.inf], np.minimum.accumulate(
                np.asarray(lvlmin[lvl_first], dtype=np.float64))))[lvl_idx]
        keep = (sub[mincol].to_numpy() == lvlmin.to_numpy()) \
            & (sub[mincol].to_numpy(np.float64) < prev)
        outs.append(sub[keep])
    return pd.concat(outs, ignore_index=True) if outs else df.iloc[:0]


def skyline(ds, *, group: str, maxcol: str, mincol: str):
    """Distributed exact skyline (Pareto frontier) per group —
    maximize ``maxcol`` while minimizing ``mincol`` (Borzsony,
    Kossmann, Stocker, ICDE 2001). Scale shape: the local skyline is
    a sound filter (any globally non-dominated row is non-dominated
    in its batch), so each batch prunes to its own frontier first and
    the per-group exchange moves only frontier candidates; the fold
    recomputes the exact skyline over the union. Output rows keep the
    input schema."""
    from ..shuffle import group_blocks

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return _skyline_frame(df, group, maxcol, mincol)

    parts = ds.map_batches(local, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return _skyline_frame(df, group, maxcol, mincol)

    return group_blocks(parts, [group], fold, batch_format="pandas")
