import pyarrow as pa


def test_poison_row_degrades_to_nil():
    """linkQuery's catch-all (RunKBPEntityLinkerSystem.scala:152-157):
    a row whose lookup explodes yields NIL confidence 0.10, never a
    task failure."""
    from el.linkdecide import CONF_ERROR, link_alias

    class ExplodingKB:
        @property
        def id_of_title_norm(self):
            raise RuntimeError("poison")

    assert link_alias("anything", ExplodingKB()) == ("", 0.0, CONF_ERROR)


def test_batch_link_matches_scalar(ray_session=None):
    """link_group_keys_batch (DuckDB fuzzy pass) must be bit-equal to
    the scalar link_group_key over every node kind."""
    from el.kb import KBIndex
    from el.linkdecide import link_group_key, link_group_keys_batch

    kb = KBIndex.from_table(pa.table({
        "kb_id": ["E0000001", "E0000002", "E0000003"],
        "title": ["Janet Harper", "Harbor Grain Council", "Austin, Texas"],
        "type": ["PER", "ORG", "GPE"],
        "wiki_type": ["person", "organization", "settlement"],
        "intro_text": ["a", "b", "c"],
        "aliases": [["Janet Harper"], ["Harbor Grain Council", "HGC"],
                    ["Austin"]],
        "named_entities": [[], [], []],
        "ambiguity": pa.array([1, 1, 1], pa.int32()),
    }))
    keys = [
        "janet harper", "janet harpre", "hgc", "harbor grain council",
        "austin texas", "harbor grain council of texas", "nobody here",
        "x#A:E0000002", "austin texas#S:E0000001", "austin texas#S:", "",
    ]
    batch = link_group_keys_batch(keys, kb)
    for k, got in zip(keys, batch):
        assert got == link_group_key(k, kb), k

from el.kb import KBIndex
from el.linkdecide import (
    CandidateLinker,
    calibrate_confidence,
    candidates_for,
    link_alias,
)


def make_kb():
    return KBIndex.from_table(
        pa.table(
            {
                "kb_id": ["E0000001", "E0000002", "E0000003"],
                "title": [
                    "United Western Commerce Council",
                    "United Western Commerce Council Fund",  # distractor
                    "Janet Harper",
                ],
                "type": ["ORG", "ORG", "PER"],
                "wiki_type": ["organization", "organization", "person"],
                "intro_text": ["a", "b", "c"],
                "aliases": [["UWCC Council"], [], ["J Harper"]],
                "named_entities": [[], [], []],
                "ambiguity": pa.array([2, 2, 1], pa.int32()),
            }
        )
    )


def test_exact_title_links():
    kb = make_kb()
    kb_id, score, conf = link_alias("united western commerce council", kb)
    assert kb_id == "E0000001"
    assert score == 1.0
    assert conf == 1.0


def test_distractor_not_preferred():
    kb = make_kb()
    cands = candidates_for("united western commerce council", kb)
    assert cands[0][0] == "E0000001"


def test_fuzzy_misspelling_links():
    kb = make_kb()
    kb_id, score, conf = link_alias("janet harpr", kb)
    assert kb_id == "E0000003"
    assert 0.93 < score < 1.0
    assert 0.8 <= conf <= 1.0


def test_unknown_is_nil():
    kb = make_kb()
    kb_id, score, conf = link_alias("zoltan quimby", kb)
    assert kb_id == ""
    assert conf == 0.55


def test_alias_lookup_links():
    kb = make_kb()
    kb_id, _, _ = link_alias("uwcc council", kb)
    assert kb_id == "E0000001"


def test_backoff_ngram():
    kb = make_kb()
    # alias with extra words around a KB title: backoff n-gram relink
    kb_id, score, conf = link_alias("dr janet harper phd", kb)
    assert kb_id == ""  # 2/4 tokens -> 0.45 < 0.6: stays NIL (conservative)
    kb_id, score, conf = link_alias("the united western commerce council", kb)
    assert kb_id == "E0000001"
    assert conf == 0.7


def test_calibration():
    assert calibrate_confidence(1.0) == 1.0
    assert calibrate_confidence(0.93) == 0.55
    assert 0.8 < calibrate_confidence(0.965) < 0.9


def test_linker_batch_runs_without_ray():
    kb = make_kb()
    linker = CandidateLinker(kb_index=kb)
    t = pa.table({"alias_norm": ["janet harper", "nobody here"]})
    out = linker(t)
    assert out["kb_id"].to_pylist() == ["E0000003", ""]
