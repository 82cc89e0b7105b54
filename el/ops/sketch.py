"""Distinct-count sketching: KMV (k-minimum-values) estimator.

The distributed-sketch member of the training-data op set (think "how
many distinct users/tokens per slice" over 100 TB without a
full-distinct shuffle): per-batch partials keep only each group's k
smallest 64-bit value hashes, so the exchange moves O(groups x k) rows
no matter the corpus size; a tiny per-group merge takes the union's k
smallest and estimates distinct = (k-1) / v_k with v_k the k-th
smallest hash normalized to (0, 1)  (Bar-Yossef et al. 2002; the KMV
form of Beyer et al., SIGMOD 2007). Hashing is md5-lower-8-bytes —
bit-equal to DuckDB's ``md5_number_lower`` — so the SQL oracle replays
the sketch EXACTLY, not just its expectation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TWO64 = 2.0 ** 64


def _value_hashes(vals) -> np.ndarray:
    """uint64 hash per value = md5_u64(str(v)) — str() stays bit-equal
    to the oracle's CAST(v AS VARCHAR) for integer ids."""
    from ..scorer import md5_u64

    return md5_u64([str(v) for v in vals])


def kmv_distinct(ds, group_col: str, value_col: str, k: int = 64):
    """Approximate distinct ``value_col`` per ``group_col`` via a KMV
    sketch. Returns (group_col, k_used, est_distinct[4dp]); groups with
    fewer than k distinct hashes fall back to the exact count (the
    standard KMV small regime)."""
    from ..shuffle import group_blocks

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({group_col: pd.Series(dtype=object),
                                 "h": pd.Series(dtype="uint64")})
        outs = []
        for g, sub in df.groupby(group_col, sort=False):
            hs = np.unique(_value_hashes(sub[value_col].to_numpy()))[:k]
            outs.append(pd.DataFrame({group_col: g, "h": hs}))
        return pd.concat(outs, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=4096)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        from .textstats import round_half_away

        empty = pd.DataFrame({group_col: pd.Series(dtype=object),
                              "k_used": pd.Series(dtype="int64"),
                              "est_distinct": pd.Series(dtype="float64")})
        if len(df) == 0:
            return empty
        rows = []
        for g, sub in df.groupby(group_col, sort=True):
            hs = np.unique(sub["h"].to_numpy())
            if len(hs) < k:
                est = float(len(hs))
            else:
                est = (k - 1) / (float(hs[k - 1]) / TWO64)
            rows.append((g, k, est))
        out = pd.DataFrame(rows,
                           columns=[group_col, "k_used", "est_distinct"])
        out["k_used"] = out["k_used"].astype("int64")
        out["est_distinct"] = round_half_away(out["est_distinct"], 4)
        return out

    return group_blocks(partials, [group_col], merge,
                        batch_format="pandas")


CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_heavy_hitters(docs_ds, k: int = 20,
                      num_partitions: int | None = None):
    """Count-min-sketch frequency estimates for the corpus's exact
    top-k tokens — the frequency-sketch companion to the KMV distinct
    sketch, with the estimate checked against the exact count in the
    same output row.

    Sketch: depth x width = 4 x 1024 int64 counters; bucket_r(t) =
    md5_u64(f"{r}:{t}") % width (the shared engine/oracle hash
    contract), estimate = min over rows — the classic CMS overestimate
    bound (never under). Shape: one batch combiner emits BOTH the
    per-token exact partials and the nonzero sketch cells; ONE (r, b)
    exchange merges the sketch to its fixed 4096 cells (broadcast
    zero-copy); the exact top-k reuses the vocab_topk local-top-k +
    tiny-merge shape; the final scan looks each top token up in the
    broadcast sketch. The oracle replays the sketch itself — hashes,
    cell sums, min — so the ESTIMATE is hash-checked, not just the
    exact counts. Out: (token, exact_count, est_count)."""
    import ray

    from .prep import _token_counts_partial
    from ..shuffle import group_blocks

    counts = docs_ds.map_batches(_token_counts_partial,
                                 batch_format="pandas").materialize()

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"r": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64")})
        toks = df["token"].to_numpy(dtype=object)
        c = df["cnt"].to_numpy(np.int64)
        outs = []
        for r in range(CMS_DEPTH):
            h = _value_hashes([f"{r}:{t}" for t in toks]) % CMS_WIDTH
            part = pd.DataFrame({"b": h.astype(np.int64), "s": c}) \
                .groupby("b", as_index=False)["s"].sum()
            part["r"] = np.int64(r)
            outs.append(part)
        out = pd.concat(outs, ignore_index=True)
        out["s"] = out["s"].astype("int64")
        return out[["r", "b", "s"]]

    def cell_sum(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"r": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64")})
        out = df.groupby(["r", "b"], as_index=False)["s"].sum()
        out["s"] = out["s"].astype("int64")
        return out

    cms = group_blocks(counts.map_batches(cells, batch_format="pandas"),
                       ["r", "b"], cell_sum, batch_format="pandas",
                       num_partitions=num_partitions).materialize()
    parts = [t for t in ray.get(list(cms.to_arrow_refs()))
             if t.num_rows]
    import pyarrow as pa

    cms_tbl = (pa.concat_tables(parts) if parts
               else pa.table({"r": pa.array([], pa.int64()),
                              "b": pa.array([], pa.int64()),
                              "s": pa.array([], pa.int64())}))
    cms_ref = ray.put(cms_tbl)

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"token": pd.Series(dtype=str),
                                 "cnt": pd.Series(dtype="int64")})
        out = df.groupby("token", as_index=False)["cnt"].sum()
        out = out.sort_values(["cnt", "token"],
                              ascending=[False, True]).head(k)
        out["cnt"] = out["cnt"].astype("int64")
        return out.reset_index(drop=True)

    heads = group_blocks(counts, ["token"], merge_topk,
                         batch_format="pandas",
                         num_partitions=num_partitions)

    class _Estimate:
        def __init__(self, ref):
            t = ray.get(ref)
            M = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
            M[t.column("r").to_numpy(zero_copy_only=False),
              t.column("b").to_numpy(zero_copy_only=False)] = \
                t.column("s").to_numpy(zero_copy_only=False)
            self.M = M

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = merge_topk(df)
            if len(out) == 0:
                return pd.DataFrame({
                    "token": pd.Series(dtype=str),
                    "exact_count": pd.Series(dtype="int64"),
                    "est_count": pd.Series(dtype="int64")})
            toks = out["token"].to_numpy(dtype=object)
            est = np.full(len(toks), np.iinfo(np.int64).max,
                          dtype=np.int64)
            for r in range(CMS_DEPTH):
                h = _value_hashes([f"{r}:{t}" for t in toks]) % CMS_WIDTH
                est = np.minimum(est, self.M[r, h.astype(np.int64)])
            return pd.DataFrame({
                "token": toks,
                "exact_count": out["cnt"].to_numpy(np.int64),
                "est_count": est})

    return heads.repartition(1).map_batches(
        _Estimate, fn_constructor_args=(cms_ref,),
        batch_format="pandas", batch_size=None, concurrency=1)


# ------------------------------------------------------------ HyperLogLog
HLL_P = 10
HLL_M = 1 << HLL_P            # 1024 registers
HLL_MAXRHO = 64 - HLL_P + 1   # 55: rho when the 54 payload bits are all 0
HLL_POW = 1 << HLL_MAXRHO     # 2^55 — the integer scale for Z
HLL_LC_LIMIT = 2.5 * HLL_M    # linear-counting switchover (Flajolet 2007)


def hll_distinct(ds, group_col: str, value_col: str):
    """HyperLogLog distinct-count estimate per group (Flajolet, Fusy,
    Gandouet, Meunier 2007) — the fixed-memory companion to KMV: the
    exchange moves at most ``groups x m`` register partials no matter
    the corpus size.

    The SQL oracle replays the sketch EXACTLY, not just its
    expectation: hash = md5-lower-8-bytes (the md5_number_lower
    contract), register j = h % m, and rho uses the trailing-zeros
    form popcount(w XOR (w-1)) over the remaining 54 payload bits —
    chosen over the textbook leading-zeros form because it is exact
    integer bit math on BOTH sides (DuckDB bit_count; no float log2).
    The indicator sum Z is scaled by 2^55 so every register term
    2^(55-rho) is an exact integer (HUGEINT / Python int — no
    float-sum order sensitivity). Small-range linear counting
    m*ln(m/V) applies below 2.5m with V empty registers; results land
    on the shared 4dp grid. Out: (group, v_zero, est_distinct)."""
    import math

    from ..shuffle import group_blocks
    from .ann import _popcount64
    from .textstats import round_half_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: object, "j": "int64", "rho": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        outs = []
        for g, sub in df.groupby(group_col, sort=False):
            h = np.unique(_value_hashes(
                pd.unique(sub[value_col].to_numpy())))
            j = (h % np.uint64(HLL_M)).astype(np.int64)
            w = h >> np.uint64(HLL_P)
            w_safe = np.where(w == 0, np.uint64(1), w)
            x = w_safe ^ (w_safe - np.uint64(1))
            rho = np.where(w == 0, np.int64(HLL_MAXRHO),
                           _popcount64(x).astype(np.int64))
            part = pd.DataFrame({"j": j, "rho": rho}) \
                .groupby("j", as_index=False)["rho"].max()
            part.insert(0, group_col, g)
            outs.append(part)
        return pd.concat(outs, ignore_index=True).astype(cols)

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=4096)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: object, "v_zero": "int64",
                "est_distinct": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        rows = []
        for g, sub in df.groupby(group_col, sort=True):
            regs = sub.groupby("j")["rho"].max().to_numpy(np.int64)
            v_zero = HLL_M - len(regs)
            # exact integer register sum (Python ints: the max possible
            # total 1024*2^55 = 2^65 overflows int64 by design)
            s = sum(1 << (HLL_MAXRHO - int(r)) for r in regs) \
                + v_zero * HLL_POW
            raw = (0.7213 / (1.0 + 1.079 / float(HLL_M))) \
                * float(HLL_M) * float(HLL_M) * float(HLL_POW) / float(s)
            if raw <= HLL_LC_LIMIT and v_zero > 0:
                est = float(HLL_M) * math.log(float(HLL_M) / v_zero)
            else:
                est = raw
            rows.append((g, v_zero, est))
        out = pd.DataFrame(rows, columns=list(cols))
        out["est_distinct"] = round_half_away(out["est_distinct"], 4)
        return out.astype(cols)

    return group_blocks(partials, [group_col], merge,
                        batch_format="pandas")
