import numpy as np
import pyarrow as pa

from el.cluster import label_propagation, union_find_local


def test_union_find_basic():
    lab = union_find_local([("a", "b"), ("b", "c"), ("x", "y")], nodes=["z"])
    assert lab["a"] == lab["b"] == lab["c"] == "a"
    assert lab["x"] == lab["y"] == "x"
    assert lab["z"] == "z"


def test_union_find_is_partition():
    rng = np.random.default_rng(7)
    nodes = [f"n{i:03d}" for i in range(200)]
    edges = [
        (nodes[int(rng.integers(0, 200))], nodes[int(rng.integers(0, 200))])
        for _ in range(150)
    ]
    lab = union_find_local(edges, nodes=nodes)
    # symmetric + transitive: same label iff connected; label is a member
    for n in nodes:
        assert lab[lab[n]] == lab[n]
    # label is the min of its component
    comp = {}
    for n in nodes:
        comp.setdefault(lab[n], []).append(n)
    for label, members in comp.items():
        assert label == min(members)


def test_label_propagation_matches_union_find(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = sorted(
        {
            (nodes[int(rng.integers(0, 120))], nodes[int(rng.integers(0, 120))])
            for _ in range(90)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    expected = union_find_local(edges, nodes=nodes)

    edges_ds = ray.data.from_arrow(
        pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    )
    labels_ds = ray.data.from_arrow(pa.table({"node": nodes, "label": nodes}))
    out = label_propagation(edges_ds, labels_ds, num_partitions=4)
    got = {
        r["node"]: r["label"] for r in out.take_all()
    }
    assert got == expected


def test_label_propagation_tasks_matches_dataset_form(ray_session):
    """The plain-task shuffle loop must converge to the same labels as
    the Dataset-exchange form on a random graph (multiple components,
    chains, isolated nodes)."""
    import ray
    import ray.data

    from el.cluster import label_propagation_tasks

    rng = np.random.default_rng(23)
    nodes = [f"n{i:03d}" for i in range(150)]
    edges = sorted(
        {
            (nodes[int(rng.integers(0, 150))], nodes[int(rng.integers(0, 150))])
            for _ in range(110)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    expected = union_find_local(edges, nodes=nodes)

    edge_refs = ray.data.from_arrow(
        pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    ).to_arrow_refs()
    label_refs = ray.data.from_arrow(
        pa.table({"node": nodes, "label": nodes})
    ).to_arrow_refs()
    parts = ray.get(label_propagation_tasks(edge_refs, label_refs,
                                            num_partitions=4))
    got = {}
    for t in parts:
        for n, l in zip(t.column("node").to_pylist(),
                        t.column("label").to_pylist()):
            got[n] = l
    assert got == expected


def test_task_group_blocks_matches_group_blocks(ray_session):
    """task_group_blocks co-locates keys exactly like the Dataset
    exchange: per-key aggregates agree with a local pandas groupby,
    including empty partitions and multi-column keys."""
    import pandas as pd
    import ray
    import ray.data

    from el.shuffle import task_group_blocks

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "k1": [f"k{int(x):02d}" for x in rng.integers(0, 40, n)],
        "k2": rng.integers(0, 3, n).astype("int64"),
        "v": rng.integers(0, 1000, n).astype("int64"),
    })
    expected = df.groupby(["k1", "k2"], as_index=False)["v"].sum() \
                 .sort_values(["k1", "k2"]).reset_index(drop=True)

    def block_sum(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"k1": pd.Series(dtype=str),
                                 "k2": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        return b.groupby(["k1", "k2"], as_index=False)["v"].sum()

    refs = ray.data.from_pandas(df).repartition(7).to_arrow_refs()
    outs = ray.get(task_group_blocks(refs, ["k1", "k2"], block_sum,
                                     num_partitions=64))  # > #keys: empties
    got = pd.concat([t.to_pandas() for t in outs if t.num_rows],
                    ignore_index=True) \
            .sort_values(["k1", "k2"]).reset_index(drop=True)
    assert got.equals(expected)


def test_kb_constrained_components_idx_matches_string_form():
    """The integer-indexed driver form must produce identical
    (comp_kb, cluster_label, comp_size) as the string form on random
    graphs mixing NIL-NIL unions, KB-NIL adoption seeds, KB-KB rejected
    edges, multi-seed components and singletons."""
    from el.cluster import (kb_constrained_components,
                            kb_constrained_components_idx)

    rng = np.random.default_rng(5)
    for trial in range(8):
        n = int(rng.integers(5, 120))
        aliases = [f"al{i:03d}" for i in range(n)]
        kb_list = ["" if rng.random() < 0.6
                   else f"E{int(rng.integers(0, max(2, n // 4))):03d}"
                   for _ in range(n)]
        mm = [f"c{int(rng.integers(0, 9)):02d}:{i:03d}" for i in range(n)]
        m = int(rng.integers(0, 3 * n))
        e1 = rng.integers(0, n, m).tolist()
        e2 = rng.integers(0, n, m).tolist()
        pairs = [(a, b) for a, b in zip(e1, e2) if a != b]
        kb_of = {aliases[i]: kb_list[i] for i in range(n) if kb_list[i]}
        min_mention = {aliases[i]: mm[i] for i in range(n)}
        want = kb_constrained_components(
            aliases, kb_of, min_mention,
            [(aliases[a], aliases[b]) for a, b in pairs])
        comp_kb, label, size = kb_constrained_components_idx(
            kb_list, mm,
            [a for a, _ in pairs], [b for _, b in pairs])
        for i, a in enumerate(aliases):
            got = (comp_kb[i], label[i], int(size[i]))
            assert got == want[a], (trial, a, got, want[a])
