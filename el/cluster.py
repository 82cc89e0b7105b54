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

SENTINEL = "~"  # sorts after every tagged label (ASCII 0x7E)

# Component labels are explicitly TAGGED so KB-vs-NIL discrimination never
# depends on the lexicographic relation between raw conv_ids and KB ids
# ("K:" < "M:" < SENTINEL in ASCII): a component containing any KB id is
# labeled "K:<kb_id>" (min kb_id), a pure-NIL component "M:<min mention_id>".
KB_TAG = "K:"
MENTION_TAG = "M:"


def kb_constrained_transform(
    edges, kb_of: dict[str, str]
) -> tuple[list[tuple[str, str]], dict[str, str]]:
    """Rewrite fuzzy merge edges under the reference's merge constraint
    (a merge always has a NIL side and two distinct KB entities never
    fuse, Clusterer.scala:40, 56-62):

    - NIL-NIL edges are kept (NIL merges are unconditional);
    - an edge between a NIL alias and a KB-linked alias becomes a SEED:
      the NIL side records the KB id as an adoption candidate (min kb_id
      wins — the deterministic, order-free analog of the reference's
      order-dependent greedy merge);
    - KB-KB edges are dropped (same id: already one component via KB
      anchoring; distinct ids: the rejected union).

    Returns (kept NIL-NIL edges, nil alias -> min seed kb_id).
    """
    kept: list[tuple[str, str]] = []
    seeds: dict[str, str] = {}
    for x, y in edges:
        kx, ky = kb_of.get(x, ""), kb_of.get(y, "")
        if kx and ky:
            continue
        if kx:
            s = seeds.get(y)
            if s is None or kx < s:
                seeds[y] = kx
        elif ky:
            s = seeds.get(x)
            if s is None or ky < s:
                seeds[x] = ky
        else:
            kept.append((x, y))
    return kept, seeds


def kb_constrained_components(
    aliases,
    kb_of: dict[str, str],
    min_mention: dict[str, str],
    edges,
) -> dict[str, tuple[str, str, int]]:
    """Driver-side KB-constrained clustering over the contracted alias
    graph. Returns alias -> (comp_kb, cluster_label, comp_size) where
    comp_kb is "" for pure-NIL components and cluster_label is the kb_id
    (KB components) or the min mention_id (NIL components).

    Semantics (shared bit-for-bit with the distributed path, which runs
    plain min-label propagation over the transformed edge set):
    - aliases linked to the same KB id are one component;
    - connected NIL aliases form NIL-subcomponents; a subcomponent
      adjacent to >=1 KB-linked alias adopts the MIN adjacent kb_id and
      joins that KB component; the other adjacencies are the unions the
      reference rejects (never merging two distinct KB entities).
    """
    kept, seeds = kb_constrained_transform(edges, kb_of)
    comp_of = union_find_local(kept, nodes=aliases)
    # min seed per NIL-subcomponent
    comp_seed: dict[str, str] = {}
    for a, k in seeds.items():
        c = comp_of[a]
        s = comp_seed.get(c)
        if s is None or k < s:
            comp_seed[c] = k
    # final component key per alias: the kb id, else the NIL-subcomp root
    final_kb: dict[str, str] = {}
    for a in comp_of:
        own = kb_of.get(a, "")
        final_kb[a] = own if own else comp_seed.get(comp_of[a], "")
    group_key = {
        a: (final_kb[a] if final_kb[a] else f"~{comp_of[a]}") for a in comp_of
    }
    sizes: dict[str, int] = {}
    nil_label: dict[str, str] = {}
    for a, g in group_key.items():
        sizes[g] = sizes.get(g, 0) + 1
        if not final_kb[a]:
            m = min_mention[a]
            cur = nil_label.get(g)
            if cur is None or m < cur:
                nil_label[g] = m
    out: dict[str, tuple[str, str, int]] = {}
    for a, g in group_key.items():
        kb = final_kb[a]
        label = kb if kb else nil_label[g]
        out[a] = (kb, label, sizes[g])
    return out


def alias_answer(
    alias_kb: str, alias_conf: float, comp_kb: str, cluster_label: str,
    comp_size: int,
) -> tuple[str, str, float]:
    """-> (cluster_id, kb_link, confidence) for one alias, shared by the
    driver and distributed physical plans. Confidence: a directly-linked
    alias keeps its calibrated link confidence; an alias adopted into a
    KB component by a merge gets 0.7 (the reference's backoff-link
    confidence, RunKBPEntityLinkerSystem.scala:83-108); NIL members of a
    multi-alias cluster get 0.6 (clusterNils rewrite confidence,
    RunKBPEntityLinkerSystem.scala:160-192); NIL singletons keep their
    link-stage confidence clamped to [0.10, 0.6] — so the poison-row
    0.10 (linkQuery's catch-all, :152-157) and the sports-NIL 0.5
    (:131-147) survive to the output, default 0.55."""
    if comp_kb:
        conf = alias_conf if alias_kb == comp_kb else 0.7
        return comp_kb, comp_kb, conf
    if comp_size > 1:
        conf = 0.6
    else:
        a = alias_conf if alias_conf is not None else 0.55
        conf = min(max(a, 0.10), 0.6)
    return cluster_label, f"NIL:{cluster_label}", conf


def _min_per_code(codes, values):
    """values: object ndarray; codes: int ndarray >= 0. Returns
    (unique_codes, min_value_per_code) via one value-sort + one
    first-occurrence pass — no pandas object-dtype groupby (which falls
    back to a pure-Python per-group loop)."""
    import numpy as np

    order = np.argsort(values, kind="stable")
    cs = codes[order]
    uniq, first = np.unique(cs, return_index=True)
    return uniq, values[order][first]


def kb_constrained_components_idx(
    kb_list: list[str],
    min_mention_list: list[str],
    e1, e2,
) -> list[tuple[str, str, int]]:
    """Integer-indexed, vectorized form of kb_constrained_components
    for the driver fast plan: aliases are row positions 0..n-1
    (``kb_list`` / ``min_mention_list`` aligned), edges are index
    arrays. Returns per-alias (comp_kb, cluster_label, comp_size)
    arrays in row order.

    Same semantics as the string form (equivalence is a pytest);
    internal component representatives are min INDEX instead of min
    NAME — never observable, because pure-NIL cluster labels come from
    min(min_mention) and KB labels from the adopted kb_id."""
    import numpy as np

    n = len(kb_list)
    kb_arr = np.asarray(kb_list, dtype=object)
    parent = np.arange(n, dtype=np.int64)
    has1 = has2 = k1 = k2 = None

    if len(e1):
        e1 = np.asarray(e1, dtype=np.int64)
        e2 = np.asarray(e2, dtype=np.int64)
        k1 = kb_arr[e1]
        k2 = kb_arr[e2]
        has1 = k1 != ""
        has2 = k2 != ""
        # NIL-NIL edges union; KB-NIL edges seed; KB-KB edges drop
        # (kb_constrained_transform semantics, Clusterer.scala:40,56-62)
        nil_nil = ~has1 & ~has2
        plist = parent  # local alias; scalar ops on ndarray are fine
        for a, b in zip(e1[nil_nil].tolist(), e2[nil_nil].tolist()):
            ra = a
            while plist[ra] != ra:
                ra = plist[ra]
            rb = b
            while plist[rb] != rb:
                rb = plist[rb]
            if ra != rb:
                if ra < rb:
                    plist[rb] = ra
                else:
                    plist[ra] = rb
    # vectorized pointer jumping: O(log depth) full-array hops
    while True:
        nxt = parent[parent]
        if np.array_equal(nxt, parent):
            break
        parent = nxt
    roots = parent

    # min adoption seed per NIL-subcomponent root
    final_kb = kb_arr.copy()
    nil_mask = final_kb == ""
    if len(e1):
        s1 = has1 & ~has2   # x linked, y NIL -> seed y's component
        s2 = has2 & ~has1
        seed_roots = np.concatenate([roots[e2[s1]], roots[e1[s2]]])
        seed_kbs = np.concatenate([k1[s1], k2[s2]])
        if len(seed_roots):
            uniq_roots, seed_min = _min_per_code(seed_roots, seed_kbs)
            seed_of_root = np.full(n, "", dtype=object)
            seed_of_root[uniq_roots] = seed_min
            final_kb[nil_mask] = seed_of_root[roots[nil_mask]]
    still_nil = final_kb == ""

    # group token: factorize (kb id | NIL-root) into dense codes; the
    # two key spaces are kept disjoint by offsetting NIL roots past any
    # possible kb code
    import pandas as pd

    kb_codes, _ = pd.factorize(final_kb)  # nil rows share the "" code
    group_codes = np.where(still_nil, roots + (kb_codes.max() + 1),
                           kb_codes).astype(np.int64)
    dense, _ = pd.factorize(group_codes)
    sizes = np.bincount(dense)[dense]

    labels = final_kb.copy()
    if still_nil.any():
        mm = np.asarray(min_mention_list, dtype=object)
        nil_codes = dense[still_nil]
        uniq, mins = _min_per_code(nil_codes, mm[still_nil])
        label_of = np.empty(int(dense.max()) + 1, dtype=object)
        label_of[uniq] = mins
        labels[still_nil] = label_of[nil_codes]
    return final_kb, labels, sizes


# ---------------------------------------------------------------- local# ---------------------------------------------------------------- local
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


def _tag_edges(t: pa.Table) -> pa.Table:
    """Undirected (key, dst, label='') rows — both directions of each
    edge, so min-label messages flow both ways."""
    n = len(t)
    if n == 0:
        return pa.table({"key": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string()),
                         "label": pa.array([], pa.string())})
    empty = pa.array([""] * (2 * n), pa.string())
    return pa.table({
        "key": pa.concat_arrays(
            [t.column("src").combine_chunks().cast(pa.string()),
             t.column("dst").combine_chunks().cast(pa.string())]),
        "dst": pa.concat_arrays(
            [t.column("dst").combine_chunks().cast(pa.string()),
             t.column("src").combine_chunks().cast(pa.string())]),
        "label": empty,
    })


def _scatter_task(und: pa.Table, lab: pa.Table, n: int):
    """One partition's scatter round: min label per key -> messages to
    self + neighbors, split by destination partition (num_returns=n)."""
    import pandas as pd

    from .shuffle import _partition_one

    lab_rows = pa.table({
        "key": lab.column("node"),
        "dst": pa.array([""] * len(lab), pa.string()),
        "label": lab.column("label"),
    }) if lab.num_rows else None
    parts = [t for t in (und, lab_rows) if t is not None and t.num_rows]
    if not parts:
        empty = pa.table({"node": pa.array([], pa.string()),
                          "label": pa.array([], pa.string())})
        return tuple(empty for _ in range(n)) if n > 1 else empty
    df = pa.concat_tables(parts, promote_options="default").to_pandas()
    out = _scatter_block(df)
    tbl = pa.Table.from_pandas(out, preserve_index=False)
    return _partition_one(tbl, ["node"], n)


def _gather_task(old_lab: pa.Table, *msg_tbls):
    """One partition's gather round: min label per node + changed flag
    vs the previous labels (same partitioning, so comparable
    locally)."""
    import pandas as pd

    tbls = [t for t in msg_tbls if t is not None and t.num_rows]
    if not tbls:
        return old_lab, False
    cat = pa.concat_tables(
        [t.select(["node", "label"]) for t in tbls]).to_pandas()
    new = cat.groupby("node", as_index=False)["label"].min() \
             .sort_values("node").reset_index(drop=True)
    # an empty partition may arrive schema-less through the identity
    # partitioning fn — normalize before comparing
    old = (old_lab.to_pandas().sort_values("node").reset_index(drop=True)
           if old_lab.num_rows else
           pd.DataFrame({"node": pd.Series(dtype=str),
                         "label": pd.Series(dtype=str)}))
    changed = not (len(old) == len(new)
                   and old["node"].equals(new["node"])
                   and old["label"].equals(new["label"]))
    return pa.Table.from_pandas(new, preserve_index=False), changed


def label_propagation_tasks(edge_refs, label_refs,
                            num_partitions: int = 8,
                            max_iters: int = 128):
    """Min-label propagation as a PLAIN-TASK shuffle loop: the
    undirected edge set is hash-partitioned ONCE; each round is P
    scatter tasks (messages split by destination partition in-task) +
    P gather tasks, converging when no partition's labels move. Zero
    Ray Data executions inside the loop — the Dataset form
    (label_propagation) pays two aggregator-fleet exchanges PER
    ITERATION, which dominates the fallback plan's wall time at bench
    scale. Same semantics, equivalence-tested against the driver
    union-find. Returns per-partition (node, label) table refs."""
    import ray

    from .shuffle import map_refs, task_group_blocks

    P = max(2, num_partitions)
    und_parts = task_group_blocks(
        map_refs(edge_refs, _tag_edges), ["key"], lambda t: t,
        num_partitions=P, batch_format="pyarrow")
    lab_parts = task_group_blocks(
        label_refs, ["node"], lambda t: t,
        num_partitions=P, batch_format="pyarrow")
    scat = ray.remote(_scatter_task).options(num_returns=P)
    gath = ray.remote(_gather_task).options(num_returns=2)
    converged = False
    for _ in range(max_iters):
        msgs = [scat.remote(und_parts[p], lab_parts[p], P)
                for p in range(P)]
        msgs = [[m] if P == 1 else list(m) for m in msgs]
        outs = [gath.remote(lab_parts[p], *[msgs[q][p] for q in range(P)])
                for p in range(P)]
        new_parts = [o[0] for o in outs]
        changed = ray.get([o[1] for o in outs])
        lab_parts = new_parts
        if not any(changed):
            converged = True
            break
    if not converged:
        # convergence is bounded by component diameter; a truncated
        # result silently under-merges, so be LOUD about it
        import logging

        logging.getLogger(__name__).warning(
            "label_propagation_tasks: not converged after %d rounds — "
            "raise max_iters (component diameter exceeds the cap)",
            max_iters)
    return lab_parts


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
