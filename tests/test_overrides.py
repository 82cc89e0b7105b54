"""Context-override semantics (fixture v9): doc-sim ambiguity
resolution, NE-overlap disambiguation, and the sports-sense re-link —
unit level plus end-to-end against the generator's gold."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from el.fixtures import build_entities
from el.kb import KBIndex
from el.overrides import parse_group_key, resolve_ambiguous


def make_kb():
    return KBIndex.from_table(pa.table({
        "kb_id": ["E0000001", "E0000002"],
        "title": ["Harbor Grain Council", "Summit Grain Council"],
        "type": ["ORG", "ORG"],
        "wiki_type": ["organization", "organization"],
        "intro_text": ["Harbor Grain Council zta0 zta1 the meeting",
                       "Summit Grain Council ztb0 ztb1 the meeting"],
        "aliases": [["Harbor Grain Council", "QXA"],
                    ["Summit Grain Council", "QXA"]],
        "named_entities": [["Janet Harper"], ["Robert Vance"]],
        "ambiguity": pa.array([1, 1], pa.int32()),
    }))


def test_ambiguous_aliases_index():
    kb = make_kb()
    assert set(kb.ambiguous_aliases) == {"qxa"}
    assert kb.ambiguous_aliases["qxa"] == ["E0000001", "E0000002"]


def test_resolve_ambiguous_by_topic_cosine():
    kb = make_kb()
    ctx = ["please review zta0 and zta1 before the call"]
    assert resolve_ambiguous("qxa", ctx, {"qxa"}, kb) == "E0000001"
    ctx = ["please review ztb0 and ztb1 before the call"]
    assert resolve_ambiguous("qxa", ctx, {"qxa"}, kb) == "E0000002"


def test_resolve_ambiguous_by_ne_overlap():
    kb = make_kb()
    # neutral context; the co-mentioned entity decides (J7 named_entities)
    ctx = ["the meeting moved on"]
    assert resolve_ambiguous("qxa", ctx, {"qxa", "robert vance"}, kb) == \
        "E0000002"
    assert resolve_ambiguous("qxa", ctx, {"qxa", "janet harper"}, kb) == \
        "E0000001"


def test_parse_group_key():
    assert parse_group_key("foo") == ("foo", "", "")
    assert parse_group_key("foo#A:E1") == ("foo", "A", "E1")
    assert parse_group_key("foo#S:") == ("foo", "S", "")


@pytest.fixture(scope="module")
def v9_gold(t1_fixture, t1_answers):
    gm = pq.read_table(f"{t1_fixture}/gold_mentions.parquet").to_pandas()
    rng = np.random.Generator(np.random.PCG64(42))
    ents = build_entities(60, rng)
    merged = gm.merge(
        t1_answers[["mention_id", "kb_link", "confidence", "cluster_id"]],
        on="mention_id",
    )
    return ents, merged


def test_ambiguous_mentions_link_to_gold(ray_session, v9_gold):
    """Every mention made through a shared (ambiguous) alias must link
    to ITS conversation's entity — doc-sim for the QX pairs, NE overlap
    for the QY pairs."""
    ents, m = v9_gold
    shared = [e for e in ents if e.shared_alias]
    assert len(shared) >= 4
    checked = 0
    for e in shared:
        rows = m[(m.gold_kb_id == e.kb_id) & (m.surface == e.shared_alias)]
        checked += len(rows)
        assert (rows.kb_link == e.kb_id).all(), (e.shared_alias, e.kb_id)
    assert checked > 0  # the planner produced shared-mode conversations


def test_sports_flag_is_load_bearing(ray_session, t1_fixture, t1_answers):
    """Disabling the sports override must measurably hurt: city surfaces
    in sports conversations fall back to the location entity, breaking
    gold pairs — i.e. the wired path, not the fixture, earns the F1."""
    import pyarrow.parquet as pq

    from el.metrics import pairwise_f1
    from el.pipeline import run_linkage

    off = run_linkage(t1_fixture, sports_classify=False).to_pandas()
    gp = pq.read_table(f"{t1_fixture}/gold_pairs.parquet")
    f1_on = pairwise_f1(
        dict(zip(t1_answers.mention_id, t1_answers.cluster_id)), gp)["f1"]
    f1_off = pairwise_f1(
        dict(zip(off.mention_id, off.cluster_id)), gp)["f1"]
    assert f1_on > f1_off, (f1_on, f1_off)


def test_sports_mentions_link_to_team(ray_session, v9_gold):
    ents, m = v9_gold
    teams = [e for e in ents if e.is_team]
    assert teams
    checked = 0
    for team in teams:
        rows = m[m.gold_kb_id == team.kb_id]
        checked += len(rows)
        assert (rows.surface == team.sports_city).all()
        assert (rows.kb_link == team.kb_id).all()
        assert (rows.confidence == 0.7).all()
        # the location mentions of the same city stay on the GPE entity
        gpe = next(e for e in ents
                   if e.conflict_key == team.conflict_key and not e.is_team)
        grows = m[m.gold_kb_id == gpe.kb_id]
        if len(grows):
            assert (grows.kb_link == gpe.kb_id).all()
    assert checked > 0
