import duckdb
import pandas as pd
import pyarrow as pa

from el.contexts import _ctx_block, build_turn_contexts
from el.sources import kb_table_from_tsv, parse_kbp_queries
from el.training import build_pair_training_set


def test_ctx_block_matches_window_sql():
    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "b"],
            "turn_idx": pd.array([0, 1, 2, 0], dtype="int32"),
            "text": ["t0", "t1", "t2", "u0"],
        }
    )
    got = _ctx_block(df).reset_index(drop=True)
    want = duckdb.sql(
        """
        SELECT conv_id, turn_idx, text AS context,
               concat_ws(' ', lag(text) OVER w, text, lead(text) OVER w)
                   AS wide_context
        FROM df WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        ORDER BY conv_id, turn_idx
        """
    ).df()
    assert got.wide_context.tolist() == want.wide_context.tolist()
    assert got.wide_context.tolist() == ["t0 t1", "t0 t1 t2", "t1 t2", "u0"]


def test_build_turn_contexts_e2e(ray_session, t1_fixture):
    import ray.data

    tr = ray.data.read_parquet(
        f"{t1_fixture}/transcripts.parquet",
        columns=["conv_id", "turn_idx", "text"],
    )
    out = build_turn_contexts(tr).to_pandas()
    assert len(out) == tr.count()
    one = out[out.conv_id == "conv42-00000000"].sort_values("turn_idx")
    texts = one.context.tolist()
    assert one.wide_context.iloc[0] == f"{texts[0]} {texts[1]}"
    assert one.wide_context.iloc[1] == f"{texts[0]} {texts[1]} {texts[2]}"


def test_parse_kbp_queries_xml():
    xml = """<kbpentlink>
      <query id="EL_00001"><name>Janet Harper</name><docid>conv-1</docid>
        <beg>10</beg><end>22</end></query>
      <query id="EL_00002"><name>UWCC</name><docid>conv-2</docid></query>
    </kbpentlink>"""
    t = parse_kbp_queries(xml)
    assert t.num_rows == 2
    assert t.column("surface").to_pylist() == ["Janet Harper", "UWCC"]
    assert t.column("beg").to_pylist() == [10, -1]  # 2011 offset-less variant
    assert t.schema.field("beg").type == "int32"


def test_kb_table_from_tsv(tmp_path):
    p = tmp_path / "wikimap.tsv"
    p.write_text("E0000001\tJanet Harper\tPER\nE0000002\tUWCC\n")
    t = kb_table_from_tsv(str(p))
    assert t.column("kb_id").to_pylist() == ["E0000001", "E0000002"]
    assert t.column("type").to_pylist() == ["PER", ""]
    from el.kb import KBIndex

    idx = KBIndex.from_table(t)
    assert idx.id_of_title_norm["janet harper"] == "E0000001"


def test_training_set_sampling(ray_session, t1_fixture):
    import ray.data

    gp = ray.data.read_parquet(f"{t1_fixture}/gold_pairs.parquet")
    ts = build_pair_training_set(gp).to_pandas()
    n_pos = int(ts.same_entity.sum())
    n_neg = len(ts) - n_pos
    assert n_pos > 0 and n_neg > 0
    assert n_neg <= 10 * n_pos
    assert len(ts) <= 3000 + 10  # cap honored (pos + 10x neg)
    # hash-ranked -> reproducible (no RNG, no order dependence)
    ts2 = build_pair_training_set(gp).to_pandas()
    a = ts.sort_values(["m1_id", "m2_id"]).reset_index(drop=True)
    b = ts2.sort_values(["m1_id", "m2_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_human_readable_and_submission(ray_session, t1_fixture, tmp_path):
    import pyarrow.parquet as pq

    from el.kb import broadcast_kb
    from el.outputs import human_readable, write_submission
    from el.pipeline import run_linkage

    answers = run_linkage(t1_fixture)
    kb_ref = broadcast_kb(f"{t1_fixture}/kb.parquet")
    hr = human_readable(answers, kb_ref).to_pandas()
    linked = hr[hr.kb_link.str.startswith("E")]
    assert (linked.kb_title != "").all()
    nil = hr[~hr.kb_link.str.startswith("E")]
    assert (nil.kb_type == "NIL").all()

    out = write_submission(answers, str(tmp_path / "sub"))
    sub = pq.read_table(out).to_pandas()
    assert list(sub.columns) == ["mention_id", "kb_link", "confidence"]
    assert sub.mention_id.is_monotonic_increasing


def test_write_entity_strings(ray_session, t1_fixture, tmp_path):
    """EntityStringFinder analog: per mention the raw surface and its
    rule-identified best entity string (the canonicalized alias)."""
    import pyarrow.parquet as pq

    from el.outputs import write_entity_strings
    from el.pipeline import run_linkage

    answers = run_linkage(t1_fixture)
    out = write_entity_strings(answers, str(tmp_path / "es"))
    es = pq.read_table(out).to_pandas()
    assert list(es.columns) == ["mention_id", "conv_id", "surface",
                                "alias"]
    assert es.mention_id.is_monotonic_increasing
    assert (es.alias != "").all()
    # canonicalization is doing work: some surfaces expand
    assert (es.alias != es.surface).any()


def test_write_answers_jsonl_roundtrip(ray_session, tmp_path):
    import json
    import glob

    import ray

    from el.outputs import write_answers_jsonl

    df = pd.DataFrame({
        "mention_id": ["m2", "m1", "m3"],
        "conv_id": ["c2", "c1", "c1"],
        "turn_idx": [0, 1, 0],
        "kb_link": ["E1", "NIL:m1", "E2"],
        "confidence": [0.9, 0.6, 0.8],
    })
    out = str(tmp_path / "ans_jsonl")
    write_answers_jsonl(ray.data.from_pandas(df), out)
    rows = []
    for f in sorted(glob.glob(out + "/*.json")):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [
        ("c1", 0), ("c1", 1), ("c2", 0)]
    assert rows[0]["kb_link"] == "E2"
    assert rows[2]["confidence"] == 0.9
