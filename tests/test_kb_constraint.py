"""KB-constraint clustering semantics (ADVICE r01): two distinct KB
entities must never fuse — not via a direct high-similarity edge and not
transitively through a NIL bridge — and the distributed fallback must
produce byte-identical (cluster_id, kb_link, confidence) to the driver
path, including per-alias confidences."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from el.cluster import alias_answer, kb_constrained_components
from el.pipeline import run_linkage


def test_components_nil_bridge_adopts_min_kb():
    kb_of = {"a": "E2", "b": "E1", "x": ""}
    min_mention = {"a": "m1", "b": "m2", "x": "m3"}
    comps = kb_constrained_components(
        ["a", "b", "x"], kb_of, min_mention,
        [("x", "a"), ("x", "b"), ("a", "b")],
    )
    # a stays E2, b stays E1, the NIL bridge x adopts min(E1, E2) = E1
    assert comps["a"] == ("E2", "E2", 1)
    assert comps["b"][0:2] == ("E1", "E1")
    assert comps["x"][0:2] == ("E1", "E1")
    assert comps["b"][2] == comps["x"][2] == 2


def test_components_nil_chain_stays_together():
    # NIL-NIL merges are unconditional: a chain x-y where x touches E1
    # pulls the WHOLE chain into E1 (reference: NIL-side merges allowed)
    kb_of = {"a": "E1", "x": "", "y": ""}
    min_mention = {"a": "m1", "x": "m3", "y": "m2"}
    comps = kb_constrained_components(
        ["a", "x", "y"], kb_of, min_mention, [("x", "y"), ("x", "a")]
    )
    assert comps["x"][0] == comps["y"][0] == "E1"


def test_components_pure_nil_label_is_min_mention():
    comps = kb_constrained_components(
        ["x", "y"], {}, {"x": "m9", "y": "m2"}, [("x", "y")]
    )
    assert comps["x"] == ("", "m2", 2)
    assert comps["y"] == ("", "m2", 2)


def test_kb_constraint_properties():
    """Property check over random graphs: the clustering (a) labels
    every node, (b) NEVER puts two distinct KB ids in one cluster,
    (c) honors every NIL-NIL merge edge, and (d) is invariant under
    edge-order permutation — the order-freeness that replaces the
    reference's order-dependent greedy merge."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    nodes_st = st.integers(3, 12)

    @settings(max_examples=80, deadline=None)
    @given(
        nodes_st,
        st.data(),
    )
    def check(n, data):
        names = [f"a{i}" for i in range(n)]
        kb_of = {
            a: data.draw(st.sampled_from(["", "", "E1", "E2", "E3"]),
                         label=f"kb_{a}")
            for a in names
        }
        min_mention = {a: f"m{i:02d}" for i, a in enumerate(names)}
        n_edges = data.draw(st.integers(0, 2 * n), label="n_edges")
        edges = [
            tuple(sorted(data.draw(
                st.lists(st.sampled_from(names), min_size=2, max_size=2,
                         unique=True), label=f"e{j}")))
            for j in range(n_edges)
        ]
        out = kb_constrained_components(names, kb_of, min_mention, edges)
        # (a) total partition
        assert set(out) == set(names)
        # (b) two distinct KB ids never share a cluster
        label_kb: dict = {}
        for a in names:
            kb, label, _size = out[a]
            if kb_of[a]:
                assert kb == kb_of[a]  # own link always kept
            prev = label_kb.setdefault(label, kb)
            assert prev == kb
        # (c) every NIL-NIL edge merged
        for x, y in edges:
            if not kb_of[x] and not kb_of[y]:
                assert out[x][1] == out[y][1], (x, y)
        # (d) edge-order invariance
        out2 = kb_constrained_components(
            names, kb_of, min_mention, list(reversed(edges)))
        assert out == out2

    check()


def test_alias_answer_confidences():
    assert alias_answer("E1", 0.95, "E1", "E1", 3) == ("E1", "E1", 0.95)
    assert alias_answer("", 0.55, "E1", "E1", 3) == ("E1", "E1", 0.7)
    assert alias_answer("", 0.55, "", "m2", 2) == ("m2", "NIL:m2", 0.6)
    assert alias_answer("", 0.55, "", "m2", 1) == ("m2", "NIL:m2", 0.55)


FILLER = "the meeting moved on to discuss quarterly revenue today"


@pytest.fixture(scope="module")
def bridge_fixture(tmp_path_factory):
    """Two KB entities reachable only via curated aliases, plus a NIL
    alias that word-prefixes both (BOOL_FLOOR edges to each side)."""
    d = str(tmp_path_factory.mktemp("bridge"))
    rows = [
        ("c01", 0, f"{FILLER} NRG Austin One {FILLER}"),
        ("c01", 1, FILLER),
        ("c02", 0, f"{FILLER} NRG Austin Two {FILLER}"),
        ("c02", 1, FILLER),
        ("c03", 0, f"{FILLER} NRG Austin {FILLER}"),
        ("c03", 1, FILLER),
    ]
    tr = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array(["user"] * len(rows)),
        "text": pa.array([r[2] for r in rows]),
        "tool": pa.array([""] * len(rows)),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
    })
    pq.write_table(tr, os.path.join(d, "transcripts.parquet"))
    kb = pa.table({
        "kb_id": pa.array(["E0000001", "E0000002"]),
        "title": pa.array(["Northern Rail Group", "Western Rail Group"]),
        "type": pa.array(["ORG", "ORG"]),
        "wiki_type": pa.array(["organization", "organization"]),
        "intro_text": pa.array(["Northern Rail Group intro",
                                "Western Rail Group intro"]),
        "aliases": pa.array([["Northern Rail Group", "NRG Austin One"],
                             ["Western Rail Group", "NRG Austin Two"]],
                            pa.list_(pa.string())),
        "named_entities": pa.array([[], []], pa.list_(pa.string())),
        "ambiguity": pa.array([1, 1], pa.int32()),
    })
    pq.write_table(kb, os.path.join(d, "kb.parquet"))
    return d


def _by_alias(df):
    return {
        a: (r_kb, round(float(c), 6))
        for a, r_kb, c in zip(df["alias"], df["kb_link"], df["confidence"])
    }


def test_bridge_never_fuses_kb_entities_driver(ray_session, bridge_fixture):
    df = run_linkage(bridge_fixture).to_pandas()
    got = _by_alias(df)
    assert got["NRG Austin One"][0] == "E0000001"
    assert got["NRG Austin Two"][0] == "E0000002"  # NOT fused into E1
    # the NIL bridge adopts the min kb with merge confidence 0.7
    assert got["NRG Austin"] == ("E0000001", 0.7)
    # directly-linked aliases keep their calibrated link confidence
    assert got["NRG Austin One"][1] > 0.9


def test_bridge_distributed_matches_driver(ray_session, bridge_fixture):
    a = run_linkage(bridge_fixture).to_pandas()
    b = run_linkage(bridge_fixture, driver_cc_max_nodes=0).to_pandas()
    cols = ["mention_id", "cluster_id", "kb_link", "confidence"]
    a = a[cols].sort_values("mention_id").reset_index(drop=True)
    b = b[cols].sort_values("mention_id").reset_index(drop=True)
    assert a.equals(b)
