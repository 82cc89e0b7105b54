"""Iterative graph computation on Ray Data: integer PageRank.

The Pregel-shaped member of the op set — the same per-iteration
topology a 100-TB link/citation/co-mention graph needs: the edge list
is exchanged ONCE (adjacency blocks with out-degrees, then
materialized and reused), and each iteration is two plain-task hash
exchanges — ranks meet adjacency on ``src`` (tagged union), partial
contributions meet on ``dst`` — with the node-scale rank table
materialized between iterations. No Dataset.join (its per-call
actor-pool overhead is fatal in loops) and no driver-side node state.

All arithmetic is INTEGER (ranks in 1e-12 units, floor divisions), so
the result is bit-deterministic regardless of summation order and a
SQL oracle can replay the full iteration unrolled — the usual
float-PageRank would make engine-vs-oracle equality a rounding
lottery. With damping d = 85/100 and uniform teleport 0.15·SCALE, a
node's rank is r(v) = 0.15·SCALE + 0.85·Σ_u→v floor(r(u)/deg(u)),
floored at each step exactly alike on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import group_blocks

SCALE = 10 ** 12


def pagerank_int(edges_ds, *, iters: int = 5, damp_num: int = 85,
                 damp_den: int = 100, num_partitions: int | None = None):
    """Integer PageRank over a DIRECTED edge list (src, dst) — pass
    both directions for an undirected graph. Every node must have at
    least one out-edge (true for undirected graphs). Returns
    (node, rank_units) with rank in 1e-12 units (int64).

    int64 headroom: sum of all ranks stays ~N·SCALE, so the damped
    partial ``damp_num · Σ`` needs N ≲ 1e5 per DST's in-neighborhood
    total — ample for real degree distributions; shard hot dsts (salt
    + second-level sum) past that."""
    base = (damp_den - damp_num) * SCALE // damp_den

    def add_deg(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"src": pd.Series(dtype=str),
                                 "dst": pd.Series(dtype=str),
                                 "deg": pd.Series(dtype="int64")})
        deg = df.groupby("src")["dst"].transform("size")
        return pd.DataFrame({"src": df["src"], "dst": df["dst"],
                             "deg": deg.astype("int64")})

    # one edge exchange, reused every iteration
    adj = group_blocks(edges_ds, ["src"], add_deg,
                       batch_format="pandas",
                       num_partitions=num_partitions).materialize()

    def init_ranks(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src"].drop_duplicates()
        return pd.DataFrame({"node": src,
                             "r": np.full(len(src), SCALE,
                                          dtype=np.int64)})

    # adj blocks are src-partitioned, so per-block distinct is global
    ranks = adj.map_batches(init_ranks, batch_format="pandas",
                            batch_size=None).materialize()

    def tag_adj(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "src": t.column("src"),
            "dst": t.column("dst"),
            "deg": t.column("deg").cast(pa.int64()),
            "r": pa.nulls(n, pa.int64()),
            "is_rank": pa.array([0] * n, pa.int64()),
        })

    def tag_rank(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "src": t.column("node"),
            "dst": pa.nulls(n, pa.string()),
            "deg": pa.nulls(n, pa.int64()),
            "r": t.column("r").cast(pa.int64()),
            "is_rank": pa.array([1] * n, pa.int64()),
        })

    def contribs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"dst": pd.Series(dtype=str),
                              "c": pd.Series(dtype="int64")})
        if len(df) == 0:
            return empty
        e = df[df["is_rank"] == 0]
        r = df[df["is_rank"] == 1]
        j = e[["src", "dst", "deg"]].merge(
            r[["src", "r"]], on="src")
        if len(j) == 0:
            return empty
        c = j["r"].to_numpy(np.int64) // j["deg"].to_numpy(np.int64)
        # per-batch partial sum per dst: the dst exchange moves one row
        # per (block, dst), not one per edge
        out = pd.DataFrame({"dst": j["dst"], "c": c}).groupby(
            "dst", as_index=False)["c"].sum()
        out["c"] = out["c"].astype("int64")
        return out

    def new_ranks(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=str),
                                 "r": pd.Series(dtype="int64")})
        s = df.groupby("dst", as_index=False)["c"].sum()
        r = base + damp_num * s["c"].to_numpy(np.int64) // damp_den
        return pd.DataFrame({"node": s["dst"], "r": r.astype(np.int64)})

    tagged_adj = adj.map_batches(tag_adj, batch_format="pyarrow")
    for _ in range(iters):
        tagged = tagged_adj.union(
            ranks.map_batches(tag_rank, batch_format="pyarrow"))
        part = group_blocks(tagged, ["src"], contribs,
                            batch_format="pandas",
                            num_partitions=num_partitions)
        ranks = group_blocks(part, ["dst"], new_ranks,
                             batch_format="pandas",
                             num_partitions=num_partitions).materialize()
    return ranks.map_batches(
        lambda df: df.rename(columns={"r": "rank_units"}),
        batch_format="pandas")
