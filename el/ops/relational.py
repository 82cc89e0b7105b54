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
