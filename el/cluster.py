"""Stage F — transitive clustering (distributed union-find).

Replaces the reference's greedy best-first agglomerative merge with an
O(n^2) cluster-pair loop and a global mutable NIL counter
(Clusterer.scala:30-93, RunKBPEntityLinkerSystem.scala:31-34, 160-192)
with threshold-edges + transitive closure:

- every mention connects to its alias-group node ``A:<alias_norm>``
  (linear exact-alias clustering == clusterNils' groupBy(entityString));
- scored alias pairs with score >= MERGE_CUTOFF become alias-alias edges
  (the extreme reference cutoff 0.9999821007 makes its merges
  near-duplicate-only, so closure over thresholded edges matches its
  clusters at the judged pairwise-F1 level, SURVEY.md §7.5);
- components are computed by iterated min-label propagation
  (hash-to-min): each round is one hash join (edges x labels) plus one
  ``groupby(node).min(label)`` shuffle; rounds = component diameter
  (tiny here: mention—alias—alias—mention paths), detected by a
  checksum fixpoint;
- cluster ids are ``min(mention_id)`` per component — deterministic,
  order-independent, resume-safe (no global counter).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

SENTINEL = "~"  # sorts after every mention id / kb id (ASCII 0x7E)


# ---------------------------------------------------------------- local
def union_find_local(edges, nodes=()) -> dict[str, str]:
    """Driver-side union-find: node -> min-element component label.
    Used by tests and the pure-Python conformance oracle."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    for n in nodes:
        find(n)
    comp_min: dict[str, str] = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return {n: comp_min[find(n)] for n in parent}


# ---------------------------------------------------------- distributed
def _checksum(labels_ds) -> int:
    def chk(t: pa.Table) -> pa.Table:
        tot = 0
        for n, l in zip(t.column("node").to_pylist(), t.column("label").to_pylist()):
            h = hashlib.md5(f"{n}|{l}".encode()).digest()
            # mod 2^40 so per-batch sums aggregate inside int64 range
            tot = (tot + int.from_bytes(h[:8], "little")) % (1 << 40)
        return pa.table({"h": pa.array([tot], pa.int64())})

    return labels_ds.map_batches(chk, batch_format="pyarrow").sum("h")


def _scatter_block(df):
    """Vectorized block fn: rows for many keys, each key having >=1
    label row (label != "") and its edge rows (dst != ""). Emits
    min(label) of each key to the key itself and every neighbor."""
    import pandas as pd

    if len(df) == 0:
        return pd.DataFrame({"node": pd.Series(dtype=str),
                             "label": pd.Series(dtype=str)})
    lab_rows = df[df["label"] != ""]
    per_key = lab_rows.groupby("key")["label"].min()
    keymin = df["key"].map(per_key).fillna(SENTINEL)
    edge_rows = df["dst"] != ""
    out_nodes = pd.concat(
        [df.loc[edge_rows, "dst"], df.loc[~edge_rows, "key"]],
        ignore_index=True,
    )
    out_labels = pd.concat(
        [keymin[edge_rows], keymin[~edge_rows]], ignore_index=True
    )
    return pd.DataFrame({"node": out_nodes, "label": out_labels})


def gather_min(ds, key: str, value: str, num_partitions: int | None = None):
    """groupby(key).min(value) via hash partition + block-local pandas
    (Ray's sort/hash aggregate paths are 10-20x slower at high key
    cardinality — see el.shuffle)."""
    import pandas as pd

    from .shuffle import group_blocks

    def block_min(df):
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series(dtype=str),
                                 value: pd.Series(dtype=str)})
        return df.groupby(key, as_index=False)[value].min()

    return group_blocks(ds, [key], block_min, batch_format="pandas",
                        num_partitions=num_partitions)


def label_propagation(edges_ds, labels_ds, num_partitions: int = 8,
                      max_iters: int = 20):
    """Iterated hash-to-min over (src, dst) edges — join-free.

    ``labels_ds``: (node, label) initial labels — a mention labels
    itself, an alias-group node starts at the SENTINEL. Returns the
    converged (node, label) Dataset.

    Each round is two hash exchanges and no joins (Dataset.join spawns
    an aggregator actor pool per call — prone to deadlock on small CPU
    budgets and expensive inside a loop): (1) scatter — union the tagged
    edge rows with the current labels, hash-partition by the source key,
    and emit each key's min label to itself and all its neighbors
    (vectorized block fn); (2) gather — block-local min per node. The
    tagged edge set is materialized once (the reused iterative working
    set); convergence is a label-checksum fixpoint, bounded by the
    component diameter.
    """
    from .shuffle import group_blocks

    def tag_edges(t: pa.Table) -> pa.Table:
        n = len(t)
        empty = pa.array([""] * (2 * n), pa.string())
        return pa.table(
            {
                "key": pa.concat_arrays(
                    [t.column("src").combine_chunks().cast(pa.string()),
                     t.column("dst").combine_chunks().cast(pa.string())]
                ),
                "dst": pa.concat_arrays(
                    [t.column("dst").combine_chunks().cast(pa.string()),
                     t.column("src").combine_chunks().cast(pa.string())]
                ),
                "label": empty,
            }
        )

    und = edges_ds.map_batches(tag_edges, batch_format="pyarrow").materialize()
    labels = labels_ds.materialize()
    prev = _checksum(labels)
    for _ in range(max_iters):
        tagged_labels = labels.map_batches(
            lambda t: pa.table(
                {
                    "key": t.column("node"),
                    "dst": pa.array([""] * len(t), pa.string()),
                    "label": t.column("label"),
                }
            ),
            batch_format="pyarrow",
        )
        msgs = group_blocks(
            und.union(tagged_labels), ["key"], _scatter_block,
            batch_format="pandas", num_partitions=num_partitions,
        )
        new = gather_min(msgs, "node", "label",
                         num_partitions=num_partitions).materialize()
        cur = _checksum(new)
        labels = new
        if cur == prev:
            break
        prev = cur
    return labels
