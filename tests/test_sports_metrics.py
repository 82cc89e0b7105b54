import pyarrow as pa

from el.kb import KBIndex
from el.metrics import nil_statistics, over_clustering
from el.sports import is_sports_candidate, sports_sense, team_rerank


def make_kb():
    return KBIndex.from_table(
        pa.table(
            {
                "kb_id": ["E0000001", "E0000002"],
                "title": ["Austin, Texas", "Austin Rail Authority"],
                "type": ["GPE", "ORG"],
                "wiki_type": ["settlement", "team"],
                "intro_text": ["a", "b"],
                "aliases": [["Austin"], []],
                "named_entities": [[], []],
                "ambiguity": pa.array([2, 2], pa.int32()),
            }
        )
    )


def test_sports_candidate_gate():
    assert is_sports_candidate("Austin", "GPE")
    assert not is_sports_candidate("Austin", "PER")  # NER gate
    assert not is_sports_candidate("Janet", "GPE")  # not a location


def test_sports_sense_threshold():
    assert sports_sense("the team won the playoff game".split())
    assert not sports_sense("the quarterly revenue numbers were flat".split())
    assert not sports_sense([])


def test_team_rerank():
    kb = make_kb()
    got = team_rerank("austin", kb)
    assert got == ("E0000002", 0.7)
    assert team_rerank("zzz nowhere", kb) is None


def test_location_variance_ratios():
    from el.sports import location_variance, org_location_ratio

    assert location_variance([]) == 0.0
    assert location_variance(["A", "A", "A", "B"]) == 0.5
    assert location_variance(["A", "B"]) == 1.0
    assert org_location_ratio([], []) == 0.0
    assert org_location_ratio(["O"], ["L", "L", "L"]) == 0.25


def test_over_clustering():
    gold = {"a": "g1", "b": "g2", "c": "g1"}
    assert over_clustering({"a": "x", "b": "x", "c": "y"}, gold) == 1
    assert over_clustering({"a": "x", "b": "y", "c": "x"}, gold) == 0


def test_nil_statistics():
    s = nil_statistics({"a": "E1", "b": "NIL:x", "c": "NIL:x", "d": "NIL:y"})
    assert s["linked"] == 1
    assert s["nil"] == 3
    assert s["nil_clusters"] == 2
    assert s["nil_cluster_size_hist"] == {1: 1, 2: 1}


def test_pr_curve():
    from el.metrics import pr_curve

    pts = pr_curve([0.9, 0.8, 0.7, 0.6], [True, False, True, False], n_points=4)
    assert pts[-1]["recall"] == 1.0
    assert pts[0]["precision"] == 1.0  # top-ranked is a positive
    assert all(0 <= p["precision"] <= 1 for p in pts)


def test_comention_counts(ray_session, t1_fixture):
    import duckdb
    import ray.data

    from el.ops.cooccur import comention_counts

    gm = ray.data.read_parquet(
        f"{t1_fixture}/gold_mentions.parquet", columns=["conv_id", "surface"]
    )
    got = comention_counts(gm).to_pandas().sort_values(["s1", "s2"]).reset_index(drop=True)
    want = duckdb.sql(
        f"""
        WITH m AS (SELECT DISTINCT conv_id, surface
                   FROM read_parquet('{t1_fixture}/gold_mentions.parquet'))
        SELECT a.surface AS s1, b.surface AS s2, count(*) AS n_convs
        FROM m a JOIN m b ON a.conv_id = b.conv_id AND a.surface < b.surface
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert got.s1.tolist() == want.s1.tolist()
    assert got.n_convs.tolist() == want.n_convs.tolist()
