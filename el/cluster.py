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
            tot = (tot + int.from_bytes(h[:8], "little")) % (1 << 62)
        return pa.table({"h": pa.array([tot], pa.int64())})

    return labels_ds.map_batches(chk, batch_format="pyarrow").sum("h")


def label_propagation(edges_ds, labels_ds, num_partitions: int = 16,
                      max_iters: int = 20):
    """Iterated hash-to-min over (src, dst) edges.

    ``labels_ds``: (node, label) initial labels — a mention labels
    itself, an alias-group node starts at the SENTINEL. Returns the
    converged (node, label) Dataset. Each iteration: one inner hash join
    + one groupby-min; the edge set is materialized once (it is the
    reused iterative working set), labels re-materialize per round.
    """
    from ray.data.aggregate import Min

    rev = edges_ds.map_batches(
        lambda t: pa.table({"src": t.column("dst"), "dst": t.column("src")}),
        batch_format="pyarrow",
    )
    und = edges_ds.union(rev).materialize()
    labels = labels_ds.materialize()
    prev = _checksum(labels)
    for _ in range(max_iters):
        msgs = und.join(
            labels, "inner", num_partitions, on=("src",), right_on=("node",)
        )
        msgs = msgs.map_batches(
            lambda t: pa.table({"node": t.column("dst"), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        new = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = _checksum(new)
        labels = new
        if cur == prev:
            break
        prev = cur
    return labels
