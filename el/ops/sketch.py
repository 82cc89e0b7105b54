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
