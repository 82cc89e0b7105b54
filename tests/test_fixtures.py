import pyarrow.parquet as pq

from el.fixtures import generate


def test_fixture_deterministic(tmp_path):
    """Same (seed, scale) -> byte-identical tables."""
    d1, d2 = tmp_path / "a", tmp_path / "b"
    m1 = generate(str(d1), "t1", 42)
    m2 = generate(str(d2), "t1", 42)
    assert m1 == m2
    for name in ("transcripts", "kb", "gold_mentions", "gold_pairs"):
        t1 = pq.read_table(str(d1 / f"{name}.parquet"))
        t2 = pq.read_table(str(d2 / f"{name}.parquet"))
        assert t1.equals(t2), name


def test_fixture_invariants(t1_fixture):
    tr = pq.read_table(f"{t1_fixture}/transcripts.parquet")
    gm = pq.read_table(f"{t1_fixture}/gold_mentions.parquet")
    text_of = {
        (c, t): x
        for c, t, x in zip(
            tr["conv_id"].to_pylist(),
            tr["turn_idx"].to_pylist(),
            tr["text"].to_pylist(),
        )
    }
    for r in gm.to_pylist():
        assert text_of[(r["conv_id"], r["turn_idx"])][r["beg"]:r["end"]] == r["surface"]
    # input_hint schema shape
    assert tr.schema.field("turn_idx").type == "int32"
    assert str(tr.schema.field("ts").type) == "timestamp[us]"


def test_gold_pairs_well_formed(t1_fixture):
    gp = pq.read_table(f"{t1_fixture}/gold_pairs.parquet").to_pylist()
    assert len(gp) > 1000
    seen = set()
    for r in gp:
        assert r["m1_id"] < r["m2_id"]
        assert (r["m1_id"], r["m2_id"]) not in seen
        seen.add((r["m1_id"], r["m2_id"]))
    # both labels present (the reference requires both classes too,
    # MentionPairClassifier.scala:37-38)
    labels = {r["same_entity"] for r in gp}
    assert labels == {True, False}
