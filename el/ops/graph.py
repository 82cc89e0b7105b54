"""Iterative graph computation on Ray Data: integer PageRank.

The Pregel-shaped member of the op set — the same per-iteration
topology a 100-TB link/citation/co-mention graph needs: the edge list
is exchanged ONCE into out-degree-annotated adjacency (plus one
node-marker row per src, emitted INSIDE the key-collocated block
function so the node table is exact even if Ray later splits output
blocks), tagged once, materialized once; each iteration is two
plain-task hash exchanges — ranks meet adjacency on ``src`` (tagged
union), partial contributions plus a zero row per node meet on ``dst``
— with the node-scale rank table materialized between iterations. No
Dataset.join (its per-call actor-pool overhead is fatal in loops) and
no driver-side node state.

All arithmetic is INTEGER (ranks in 1e-12 units, floor divisions), so
the result is bit-deterministic regardless of summation order and a
SQL oracle can replay the full iteration unrolled — the usual
float-PageRank would make engine-vs-oracle equality a rounding
lottery. With damping d = 85/100 and uniform teleport 0.15·SCALE, a
node's rank is r(v) = 0.15·SCALE + 0.85·Σ_u→v floor(r(u)/deg(u)),
floored at each step exactly alike on both sides; a node with no
in-edges holds rank 0.15·SCALE (the zero-contribution row keeps it,
and its own out-contributions, alive through every iteration).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import arrowize, group_blocks

SCALE = 10 ** 12


def pagerank_int(edges_ds, *, iters: int = 5, damp_num: int = 85,
                 damp_den: int = 100, num_partitions: int | None = None):
    """Integer PageRank over a DIRECTED edge list (src, dst) — pass
    both directions for an undirected graph. Every node must have at
    least one OUT-edge (true for undirected graphs; a dangling dst
    would need the usual dangling-mass redistribution, unsupported
    here). Nodes without IN-edges are fully supported. Returns
    (node, rank_units) with rank in 1e-12 units (int64).

    int64 headroom: sum of all ranks stays ~N·SCALE, so the damped
    partial ``damp_num · Σ`` needs N ≲ 1e5 per DST's in-neighborhood
    total — ample for real degree distributions; shard hot dsts (salt
    + second-level sum) past that."""
    base = (damp_den - damp_num) * SCALE // damp_den

    def add_deg(df: pd.DataFrame) -> pd.DataFrame:
        """Per src-collocated block: out-degree per edge row, plus ONE
        marker row per src (deg == 0) — the exact node table, computed
        where the key's rows are guaranteed together."""
        if len(df) == 0:
            return pd.DataFrame({"src": pd.Series(dtype=str),
                                 "dst": pd.Series(dtype=str),
                                 "deg": pd.Series(dtype="int64")})
        deg = df.groupby("src")["dst"].transform("size")
        edges = pd.DataFrame({"src": df["src"], "dst": df["dst"],
                              "deg": deg.astype("int64")})
        marks = pd.DataFrame({"src": df["src"].drop_duplicates()})
        marks["dst"] = None
        marks["deg"] = np.int64(0)
        return pd.concat([edges, marks], ignore_index=True)

    # one edge exchange; consumed below to build the (materialized)
    # tagged adjacency and the node-scale tables, then unreferenced
    adj_all = group_blocks(edges_ds, ["src"], add_deg,
                           batch_format="pandas",
                           num_partitions=num_partitions).materialize()

    def tag_adj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater(t.column("deg"), 0))
        n = t.num_rows
        return pa.table({
            "src": t.column("src"),
            "dst": t.column("dst"),
            "deg": t.column("deg").cast(pa.int64()),
            "r": pa.nulls(n, pa.int64()),
            "is_rank": pa.array([0] * n, pa.int64()),
        })

    def markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df.loc[df["deg"] == 0, "src"]})

    # tagged ONCE and materialized: iterations re-exchange it but never
    # re-tag it
    tagged_adj = adj_all.map_batches(
        tag_adj, batch_format="pyarrow").materialize()
    nodes = adj_all.map_batches(markers,
                                batch_format="pandas").materialize()

    def init_ranks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "r": np.full(len(df), SCALE,
                                          dtype=np.int64)})

    def zero_contrib(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"dst": df["node"],
                             "c": np.zeros(len(df), dtype=np.int64)})

    ranks = nodes.map_batches(init_ranks,
                              batch_format="pandas").materialize()
    # one zero-contribution row per node per iteration: keeps
    # in-edge-less nodes (and their out-contributions) alive
    zeros = nodes.map_batches(zero_contrib,
                              batch_format="pandas").materialize()

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

    for _ in range(iters):
        tagged = tagged_adj.union(
            ranks.map_batches(tag_rank, batch_format="pyarrow"))
        part = group_blocks(tagged, ["src"], contribs,
                            batch_format="pandas",
                            num_partitions=num_partitions)
        ranks = group_blocks(part.union(zeros), ["dst"], new_ranks,
                             batch_format="pandas",
                             num_partitions=num_partitions).materialize()
    return ranks.map_batches(
        lambda df: df.rename(columns={"r": "rank_units"}),
        batch_format="pandas")


def triangle_counts(edges_ds, *, max_wedge_degree: int = 4000,
                    num_partitions: int | None = None):
    """Per-node triangle counts over an UNDIRECTED edge list
    (s1, s2) — each unordered edge appearing exactly once — the
    clustering-coefficient / community-density primitive.

    Degree-ordered orientation (the Chiba-Nishizeki / MapReduce
    triangle-counting shape): every edge is directed from the endpoint
    with the smaller (degree, node) rank to the larger, which bounds
    TOTAL wedge volume at O(m^1.5) regardless of hot nodes — a
    star-shaped celebrity node generates no wedges because its edges
    all point INTO it. Stages: (1) one node exchange for exact degrees,
    broadcast as a zero-copy Arrow table (node-vocabulary-bounded, the
    pmi_pairs precedent; swap for a tagged degree-attach exchange when
    the vocabulary outgrows the object store); (2) per-batch orient via
    index_in rank lookups; (3) one src exchange emits each
    out-neighborhood's rank-ordered pairs as wedge rows (a src with
    more than ``max_wedge_degree`` oriented out-neighbors raises
    loudly rather than silently dropping triangles the oracle would
    count — the orientation makes the cap unreachable for real degree
    distributions); (4) wedges and oriented edges (tagged) meet in one
    (a, b) exchange — a wedge row whose (a, b) key also carries an edge
    row closes a triangle; (5) per-batch partial counts per corner then
    one node exchange. Every triangle is found exactly once (from its
    lowest-rank corner). Out: (surface, n_triangles) for nodes in >= 1
    triangle."""
    import ray

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=str),
                                 "d": pd.Series(dtype="int64")})
        n = pd.concat([df["s1"], df["s2"]], ignore_index=True)
        out = n.to_frame("node").groupby("node", as_index=False).size() \
            .rename(columns={"size": "d"})
        out["d"] = out["d"].astype("int64")
        return out

    def deg_sum(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=str),
                                 "d": pd.Series(dtype="int64")})
        out = df.groupby("node", as_index=False)["d"].sum()
        out["d"] = out["d"].astype("int64")
        return out

    edges = edges_ds.materialize()
    degs = group_blocks(
        edges.map_batches(deg_partial, batch_format="pandas"),
        ["node"], deg_sum, batch_format="pandas",
        num_partitions=num_partitions).materialize()
    parts = [t for t in ray.get(list(degs.to_arrow_refs()))
             if t.num_rows]
    deg_tbl = (pa.concat_tables(parts) if parts
               else pa.table({"node": pa.array([], pa.string()),
                              "d": pa.array([], pa.int64())}))
    deg_ref = ray.put(deg_tbl)

    class _Orient:
        def __init__(self, ref):
            t = ray.get(ref)
            self.node = t.column("node").combine_chunks()
            self.d = t.column("d").combine_chunks()

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if t.num_rows == 0:
                return pa.table({"src": pa.array([], pa.string()),
                                 "dst": pa.array([], pa.string()),
                                 "ddeg": pa.array([], pa.int64())})
            s1 = t.column("s1").combine_chunks().cast(pa.string())
            s2 = t.column("s2").combine_chunks().cast(pa.string())
            d1 = self.d.take(pc.index_in(s1, value_set=self.node)) \
                .to_numpy(zero_copy_only=False)
            d2 = self.d.take(pc.index_in(s2, value_set=self.node)) \
                .to_numpy(zero_copy_only=False)
            a1 = s1.to_numpy(zero_copy_only=False)
            a2 = s2.to_numpy(zero_copy_only=False)
            fwd = (d1 < d2) | ((d1 == d2) & (a1 < a2))
            return pa.table({
                "src": pa.array(np.where(fwd, a1, a2), pa.string()),
                "dst": pa.array(np.where(fwd, a2, a1), pa.string()),
                "ddeg": pa.array(np.where(fwd, d2, d1).astype(np.int64),
                                 pa.int64()),
            })

    oriented = edges.map_batches(
        _Orient, fn_constructor_args=(deg_ref,), batch_format="pyarrow",
        concurrency=2, num_cpus=0.5).materialize()

    def wedges(df: pd.DataFrame) -> pa.Table:
        # Arrow out (the union partner edge_rows is Arrow — pandas
        # object blocks here made the union log a schema-flavor drift)
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "apex": pa.array([], pa.string())})
        if len(df) == 0:
            return empty
        df = df.sort_values(["src", "ddeg", "dst"], kind="stable") \
            .reset_index(drop=True)
        src = df["src"].to_numpy(dtype=object)
        dst = df["dst"].to_numpy(dtype=object)
        bounds = np.flatnonzero(src[1:] != src[:-1]) + 1
        starts = np.concatenate(([0], bounds, [len(src)]))
        aa, bb, ap = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            k = e - s
            if k > max_wedge_degree:
                # fail loudly (the _block_pairs_frame idiom) rather
                # than silently dropping triangles the SQL oracle
                # would count — degree-ordered orientation bounds
                # out-degree at O(sqrt(m)), so hitting this means the
                # graph needs a bigger cap, not a truncated answer
                raise ValueError(
                    f"triangle_counts: src {src[s]!r} has {k} oriented "
                    f"out-neighbors > max_wedge_degree="
                    f"{max_wedge_degree}; raise max_wedge_degree "
                    "(wedge volume grows quadratically in it)")
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, 1)
            nb = dst[s:e]
            aa.append(nb[iu])
            bb.append(nb[ju])
            ap.append(np.full(len(iu), src[s], dtype=object))
        if not aa:
            return empty
        return pa.table({
            "a": pa.array(np.concatenate(aa), pa.string()),
            "b": pa.array(np.concatenate(bb), pa.string()),
            "apex": pa.array(np.concatenate(ap), pa.string())})

    wedge_rows = group_blocks(oriented, ["src"], wedges,
                              batch_format="pandas",
                              num_partitions=num_partitions)

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": t.column("src").combine_chunks().cast(pa.string()),
            "b": t.column("dst").combine_chunks().cast(pa.string()),
            "apex": pa.nulls(t.num_rows, pa.string()),
        })

    tagged = wedge_rows.union(
        oriented.map_batches(edge_rows, batch_format="pyarrow"))

    def close(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"node": pd.Series(dtype=str),
                              "c": pd.Series(dtype="int64")})
        if len(df) == 0:
            return empty
        is_edge = df["apex"].isna()
        ek = df.loc[is_edge, ["a", "b"]].drop_duplicates()
        if len(ek) == 0:
            return empty
        hit = df[~is_edge].merge(ek, on=["a", "b"])
        if len(hit) == 0:
            return empty
        n = pd.concat([hit["a"], hit["b"], hit["apex"]],
                      ignore_index=True)
        out = n.to_frame("node").groupby("node", as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    part = group_blocks(tagged, ["a", "b"], close,
                        batch_format="pandas",
                        num_partitions=num_partitions)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"surface": pd.Series(dtype=str),
                                 "n_triangles": pd.Series(dtype="int64")})
        out = df.groupby("node", as_index=False)["c"].sum() \
            .rename(columns={"node": "surface", "c": "n_triangles"})
        out["n_triangles"] = out["n_triangles"].astype("int64")
        return out

    return group_blocks(part, ["node"], total, batch_format="pandas",
                        num_partitions=num_partitions)


def clustering_coefficients(edges_ds, *, num_partitions: int | None = None,
                            **tri_kwargs):
    """Local clustering coefficient per node over an undirected edge
    list (each unordered edge once): coef = 2T / (d(d-1)) for nodes
    with degree >= 2, T from :func:`triangle_counts`. One extra tagged
    node exchange joins the degree rows with the triangle counts — no
    driver state beyond triangle_counts' own vocab-bounded degree
    broadcast. Out: (surface, degree, n_triangles, coef[6dp])."""
    edges = edges_ds.materialize()
    tri = triangle_counts(edges, num_partitions=num_partitions,
                          **tri_kwargs)

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=str),
                                 "v": pd.Series(dtype="int64"),
                                 "is_deg": pd.Series(dtype="int64")})
        n = pd.concat([df["s1"], df["s2"]], ignore_index=True)
        out = n.to_frame("node").groupby("node", as_index=False).size() \
            .rename(columns={"size": "v"})
        out["v"] = out["v"].astype("int64")
        out["is_deg"] = np.int64(1)
        return out

    def tri_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["surface"].astype(str),
                             "v": df["n_triangles"].astype("int64"),
                             "is_deg": np.zeros(len(df), dtype=np.int64)})

    tagged = edges.map_batches(deg_partial, batch_format="pandas").union(
        tri.map_batches(tri_rows, batch_format="pandas"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"surface": str, "degree": "int64",
                "n_triangles": "int64", "coef": "float64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=d)
                                 for c, d in cols.items()})
        deg = df.loc[df["is_deg"] == 1].groupby("node")["v"].sum()
        tri_s = df.loc[df["is_deg"] == 0].groupby("node")["v"].sum()
        g = deg.to_frame("degree").join(
            tri_s.rename("n_triangles")).fillna(0).reset_index()
        g = g[g["degree"] >= 2]
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series(dtype=d)
                                 for c, d in cols.items()})
        d = g["degree"].to_numpy(np.float64)
        t = g["n_triangles"].to_numpy(np.float64)
        coef = 2.0 * t / (d * (d - 1.0))
        return pd.DataFrame({
            "surface": g["node"].astype(str).to_numpy(),
            "degree": g["degree"].astype("int64").to_numpy(),
            "n_triangles": g["n_triangles"].astype("int64").to_numpy(),
            "coef": np.floor(coef * 1e6 + 0.5) / 1e6})

    return group_blocks(tagged, ["node"], finish, batch_format="pandas",
                        num_partitions=num_partitions)


def neighbor_sim(edges_ds, *, max_hub_degree: int = 4000,
                 num_partitions: int | None = None):
    """Common-neighbor link-prediction scores over an undirected edge
    list (src, dst both directions expected): for every node pair
    sharing >= 1 neighbor, the common-neighbor count, neighbor-set
    Jaccard, and Adamic-Adar — with each AA term 1/ln(deg(hub))
    quantized to the 1e-9 integer grid at the wedge (so cross-wedge
    sums are exact int64, the cluster_vmeasure contract).

    Scale shape: ONE hub exchange generates wedges (pairs of each
    hub's neighbors — the triangle_counts wedge bound; hubs over
    ``max_hub_degree`` raise loudly rather than under-report) and
    exact degrees in the same pass; ONE (a, b) exchange folds
    common/aa; two tagged key exchanges attach deg(a)/deg(b) (the
    hash-join idiom — the degree table is node-scale, never
    broadcast). Out: (s1, s2, common, jaccard[6dp], aa_grid)."""
    import math

    w_cols = {"a": str, "b": str, "term": "int64", "kind": str,
              "d": "int64"}

    def hub_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in w_cols.items()})
        outs = []
        for hub, g in df.groupby("src", sort=False):
            nbrs = np.unique(g["dst"].to_numpy(dtype=object))
            d = len(nbrs)
            outs.append(pd.DataFrame({
                "a": [str(hub)], "b": [""],
                "term": np.int64(0), "kind": "d",
                "d": np.int64(d)}))
            if d < 2:
                continue
            if d > max_hub_degree:
                raise ValueError(
                    f"neighbor_sim hub {hub!r} has degree {d} "
                    f"(> {max_hub_degree}); salt or pre-filter hubs")
            term = np.int64(math.floor(1e9 / math.log(d)))
            i, j = np.triu_indices(d, k=1)
            outs.append(pd.DataFrame({
                "a": nbrs[i], "b": nbrs[j],
                "term": np.full(len(i), term, dtype=np.int64),
                "kind": "w", "d": np.int64(0)}))
        return pd.concat(outs, ignore_index=True)[list(w_cols)] \
            .astype(w_cols)

    rows = group_blocks(edges_ds, ["src"], hub_block,
                        batch_format="pandas",
                        num_partitions=num_partitions)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": str, "b": str, "common": "int64",
                "aa_grid": "int64", "kind": str, "d": "int64"}
        w = df[df["kind"] == "w"]
        dd = df[df["kind"] == "d"]
        outs = []
        if len(w):
            g = w.groupby(["a", "b"], as_index=False).agg(
                common=("term", "size"), aa_grid=("term", "sum"))
            g["kind"] = "w"
            g["d"] = np.int64(0)
            outs.append(g)
        if len(dd):
            outs.append(pd.DataFrame({
                "a": dd["a"], "b": dd["b"],
                "common": np.int64(0), "aa_grid": np.int64(0),
                "kind": "d", "d": dd["d"]}))
        if not outs:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return pd.concat(outs, ignore_index=True)[list(cols)] \
            .astype(cols)

    # wedge rows fold on (a, b); deg rows ride along keyed (node, "")
    folded = group_blocks(rows, ["a", "b"], fold,
                          batch_format="pandas",
                          num_partitions=num_partitions)

    def attach_da(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": str, "b": str, "common": "int64",
                "aa_grid": "int64", "kind": str, "d": "int64",
                "da": "int64"}
        dd = df[df["kind"] == "d"]
        w = df[df["kind"] == "w"].copy()
        dmap = dd.set_index("a")["d"]
        if len(w):
            w["da"] = w["a"].map(dmap).fillna(0).astype("int64")
            # re-key on b for the second attach
            w = w[["a", "b", "common", "aa_grid", "kind", "d", "da"]]
        dd = dd.assign(da=np.int64(0))
        out = pd.concat([dd, w], ignore_index=True) if len(w) else dd
        return out[list(cols)].astype(cols)

    # key stage 2 on a (deg rows have key=node via column 'a')
    r2 = group_blocks(folded, ["a"], attach_da, batch_format="pandas",
                      num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"s1": str, "s2": str, "common": "int64",
                "jaccard": "float64", "aa_grid": "int64"}
        dd = df[df["kind"] == "d"]
        w = df[df["kind"] == "w"]
        if len(w) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        dmap = dd.set_index("a")["d"]
        db = w["b"].map(dmap).fillna(0).astype("int64")
        union = w["da"].to_numpy("int64") + db.to_numpy("int64") \
            - w["common"].to_numpy("int64")
        jac = np.floor(w["common"].to_numpy("int64")
                       / np.maximum(union, 1) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({
            "s1": w["a"].astype(str), "s2": w["b"].astype(str),
            "common": w["common"].astype("int64"),
            "jaccard": jac,
            "aa_grid": w["aa_grid"].astype("int64")})[list(cols)]

    # stage 3 keys on b: deg rows (key=node in 'a') must land with the
    # wedge rows keyed by their b — re-tag deg rows' key column
    def rekey(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        dd = out["kind"] == "d"
        out.loc[dd, "b"] = out.loc[dd, "a"]
        return out

    r2b = r2.map_batches(rekey, batch_format="pandas")
    return group_blocks(r2b, ["b"], finish, batch_format="pandas",
                        num_partitions=num_partitions)


def hits_int(edges_ds, *, iters: int = 2,
             num_partitions: int | None = None):
    """Integer HITS (Kleinberg hubs/authorities,
    "Authoritative sources in a hyperlinked environment", JACM 1999)
    over a DIRECTED edge list (src, dst), each edge exactly once.

    ``iters`` unrolled iterations of pure int64 sums with NO
    normalization — a0 = 1 for every node, then per iteration
    h_k(u) = SUM_{u->v} a_{k-1}(v) and a_k(v) = SUM_{u->v} h_k(u) —
    so the result is bit-deterministic regardless of partial-sum order
    and a SQL oracle replays the iterations unrolled (the textbook
    L2-normalized HITS would make engine-vs-oracle equality a float
    rounding lottery; the unnormalized ranks have the same ORDER as
    the normalized ones at every step). Magnitudes grow like
    (d_max^2)^k, so the per-key sum kernels raise OverflowError past
    2^62 instead of wrapping — the iters=2 default stays inside the
    int64 envelope for any real co-mention degree distribution.

    Same Pregel shape as pagerank_int: each half-step is a join-key
    hash exchange (edge rows meet node-score rows, tagged union, no
    Dataset.join) emitting block-local PARTIAL sums, then a node-key
    sum exchange over partials plus one zero row per node (keeps
    sink/source nodes alive with score 0); node-scale score tables are
    materialized between half-steps. Out: (node, hub_units,
    auth_units), every node present.
    """
    edges = arrowize(edges_ds).materialize()

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = pd.concat([df["src"], df["dst"]],
                      ignore_index=True).drop_duplicates()
        return pd.DataFrame({"node": n.astype(str)})

    def node_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["node"].drop_duplicates().astype(str)})

    nodes = group_blocks(
        edges.map_batches(node_rows, batch_format="pandas"),
        ["node"], node_distinct, batch_format="pandas",
        num_partitions=num_partitions).materialize()

    def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "v": np.zeros(len(df), dtype=np.int64)})

    zeros = nodes.map_batches(zero_rows,
                              batch_format="pandas").materialize()

    def _tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "src": t.column("src").cast(pa.string()),
            "dst": t.column("dst").cast(pa.string()),
            "v": pa.nulls(n, pa.int64()),
            "is_score": pa.array([0] * n, pa.int64()),
        })

    tagged_edges = edges.map_batches(
        _tag_edges, batch_format="pyarrow").materialize()

    def _tag_scores(t: pa.Table, key: str) -> pa.Table:
        n = t.num_rows
        cols = {"src": pa.nulls(n, pa.string()),
                "dst": pa.nulls(n, pa.string())}
        cols[key] = t.column("node").cast(pa.string())
        cols["v"] = t.column("v").cast(pa.int64())
        cols["is_score"] = pa.array([1] * n, pa.int64())
        return pa.table(cols)

    def _half_step(scores, join_key: str, out_key: str):
        """new(node at out_key) = SUM over edges of score(join_key)."""
        tagged = tagged_edges.union(scores.map_batches(
            lambda t, k=join_key: _tag_scores(t, k),
            batch_format="pyarrow"))

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"node": pd.Series(dtype=str),
                                  "v": pd.Series(dtype="int64")})
            if len(df) == 0:
                return empty
            e = df[df["is_score"] == 0]
            s = df[df["is_score"] == 1]
            j = e[["src", "dst"]].merge(
                s[[join_key, "v"]], on=join_key)
            if len(j) == 0:
                return empty
            out = pd.DataFrame({"node": j[out_key], "v": j["v"]}) \
                .groupby("node", as_index=False)["v"].sum()
            out["v"] = out["v"].astype("int64")
            return out

        def final_sum(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"node": pd.Series(dtype=str),
                                     "v": pd.Series(dtype="int64")})
            out = df.groupby("node", as_index=False)["v"].sum()
            # scores are nonnegative, so the final per-node sum bounds
            # every block-local partial that fed it
            if len(out) and int(out["v"].max()) > 2 ** 62:
                raise OverflowError(
                    "hits_int: score exceeds 2^62 at iters=%d; "
                    "reduce iters" % iters)
            out["v"] = out["v"].astype("int64")
            return out

        part = group_blocks(tagged, [join_key], partials,
                            batch_format="pandas",
                            num_partitions=num_partitions)
        return group_blocks(part.union(zeros), ["node"], final_sum,
                            batch_format="pandas",
                            num_partitions=num_partitions).materialize()

    def init_ones(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "v": np.ones(len(df), dtype=np.int64)})

    auth = nodes.map_batches(init_ones,
                             batch_format="pandas").materialize()
    hub = None
    for _ in range(iters):
        # h(u) = sum of a(v) over out-edges u->v: scores join on dst
        hub = _half_step(auth, "dst", "src")
        # a(v) = sum of h(u) over in-edges u->v: scores join on src
        auth = _half_step(hub, "src", "dst")

    def _tag_out(t: pa.Table, which: int) -> pa.Table:
        n = t.num_rows
        return pa.table({"node": t.column("node"),
                         "v": t.column("v").cast(pa.int64()),
                         "w": pa.array([which] * n, pa.int64())})

    both = hub.map_batches(lambda t: _tag_out(t, 0),
                           batch_format="pyarrow").union(
        auth.map_batches(lambda t: _tag_out(t, 1),
                         batch_format="pyarrow"))

    def zip_scores(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "node": pd.Series(dtype=str),
                "hub_units": pd.Series(dtype="int64"),
                "auth_units": pd.Series(dtype="int64")})
        p = df.pivot_table(index="node", columns="w", values="v",
                           aggfunc="first", fill_value=0)
        return pd.DataFrame({
            "node": p.index.astype(str),
            "hub_units": p.get(0, 0).astype("int64")
            if 0 in p.columns else np.zeros(len(p), dtype=np.int64),
            "auth_units": p.get(1, 0).astype("int64")
            if 1 in p.columns else np.zeros(len(p), dtype=np.int64),
        }).reset_index(drop=True)

    return group_blocks(both, ["node"], zip_scores,
                        batch_format="pandas",
                        num_partitions=num_partitions)


def kcore_prune(edges_ds, *, k: int = 3, rounds: int = 3,
                num_partitions: int | None = None):
    """Fixed-round k-core pruning over an UNDIRECTED edge list
    (s1, s2), each unordered edge exactly once — the dense-subgraph /
    community-seed primitive (Seidman 1983 k-cores; the distributed
    iterated-pruning formulation of Montresor et al.).

    Each round drops every edge with an endpoint of current degree
    < k; ``rounds`` is FIXED (not run-to-convergence) so a SQL oracle
    replays the exact same unrolled iterations — at convergence the
    survivors are exactly the k-core, and a fixed small round count is
    the scale-safe contract anyway (each round is a full edge
    exchange; convergence detection would add a driver-side loop on a
    corpus-scale predicate). Out: (node, deg) — degree within the
    surviving edge set after the last round, nodes with >= 1
    surviving edge.

    Scale shape per round: one node-key exchange folds per-batch
    degree partials; the edge filter is TWO tagged-union hash
    exchanges (degrees meet edges on s1, then on s2) — no node-table
    broadcast, so a vocabulary larger than the object store still
    streams."""
    edges = arrowize(edges_ds).materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=str),
                                 "d": pd.Series(dtype="int64")})
        n = pd.concat([df["s1"], df["s2"]], ignore_index=True)
        out = n.to_frame("node").groupby("node", as_index=False).size() \
            .rename(columns={"size": "d"})
        out["d"] = out["d"].astype("int64")
        return out

    def deg_sum(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=str),
                                 "d": pd.Series(dtype="int64")})
        out = df.groupby("node", as_index=False)["d"].sum()
        out["d"] = out["d"].astype("int64")
        return out

    def _degrees(e):
        part = e.map_batches(deg_partial, batch_format="pandas")
        return group_blocks(part, ["node"], deg_sum,
                            batch_format="pandas",
                            num_partitions=num_partitions)

    def _tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "s1": t.column("s1").cast(pa.string()),
            "s2": t.column("s2").cast(pa.string()),
            "d": pa.nulls(n, pa.int64()),
            "is_deg": pa.array([0] * n, pa.int64()),
        })

    def _tag_deg(t: pa.Table, slot: str) -> pa.Table:
        n = t.num_rows
        cols = {"s1": pa.nulls(n, pa.string()),
                "s2": pa.nulls(n, pa.string())}
        cols[slot] = t.column("node").cast(pa.string())
        cols["d"] = t.column("d").cast(pa.int64())
        cols["is_deg"] = pa.array([1] * n, pa.int64())
        return pa.table(cols)

    def _filter_on(e, degs, slot: str):
        tagged = e.map_batches(_tag_edges, batch_format="pyarrow") \
            .union(degs.map_batches(
                lambda t, s=slot: _tag_deg(t, s),
                batch_format="pyarrow"))

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"s1": pd.Series(dtype=str),
                                  "s2": pd.Series(dtype=str)})
            if len(df) == 0:
                return empty
            ed = df[df["is_deg"] == 0]
            dg = df[(df["is_deg"] == 1) & (df["d"] >= k)]
            j = ed[["s1", "s2"]].merge(
                dg[[slot]].drop_duplicates(), on=slot)
            if len(j) == 0:
                return empty
            return j[["s1", "s2"]].reset_index(drop=True)

        return group_blocks(tagged, [slot], keep,
                            batch_format="pandas",
                            num_partitions=num_partitions)

    e = edges
    for _ in range(rounds):
        degs = _degrees(e).materialize()
        e = _filter_on(e, degs, "s1")
        e = _filter_on(e, degs, "s2").materialize()

    out = _degrees(e)
    return out.map_batches(
        lambda df: df.rename(columns={"d": "deg"}),
        batch_format="pandas")
