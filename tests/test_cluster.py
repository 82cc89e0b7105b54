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
