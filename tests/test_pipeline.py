import glob
import os

import pyarrow.parquet as pq
import pytest

from el.metrics import b_cubed, pairwise_f1
from el.pipeline import run_linkage


def test_e2e_pairwise_f1(t1_answers, t1_fixture):
    gp = pq.read_table(f"{t1_fixture}/gold_pairs.parquet")
    cluster_of = dict(zip(t1_answers.mention_id, t1_answers.cluster_id))
    res = pairwise_f1(cluster_of, gp)
    assert res["f1"] >= 0.99, res  # BASELINE.json north rule


def test_e2e_b_cubed(t1_answers, t1_fixture):
    gm = pq.read_table(f"{t1_fixture}/gold_mentions.parquet")
    gold_of = dict(zip(gm["mention_id"].to_pylist(), gm["gold_kb_id"].to_pylist()))
    cluster_of = dict(zip(t1_answers.mention_id, t1_answers.cluster_id))
    assert b_cubed(cluster_of, gold_of)["f1"] >= 0.99


def test_e2e_output_ordering(t1_answers):
    ordered = t1_answers.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert ordered[["conv_id", "turn_idx"]].equals(
        t1_answers[["conv_id", "turn_idx"]].reset_index(drop=True)
    )


def test_e2e_kb_links_well_formed(t1_answers):
    for link in t1_answers.kb_link:
        assert link.startswith("E") or link.startswith("NIL:")
    assert t1_answers.confidence.between(0.1, 1.0).all()


def test_deterministic_across_runs(ray_session, t1_fixture, t1_answers):
    """Cluster ids must be identical across executions (no global
    counters, no order dependence)."""
    df2 = run_linkage(t1_fixture).to_pandas()
    a = t1_answers.sort_values("mention_id").reset_index(drop=True)
    b = df2.sort_values("mention_id").reset_index(drop=True)
    assert a.equals(b)


def test_fused_matches_exchange_plan(ray_session, t1_fixture, t1_answers):
    """The fused extract+canonicalize plan (conv-partitioned input, no
    conv_id exchange) must equal the exchange-based plan on every
    column."""
    df2 = run_linkage(t1_fixture, conv_partitioned=False).to_pandas()
    a = t1_answers.sort_values("mention_id").reset_index(drop=True)
    b = df2.sort_values("mention_id").reset_index(drop=True)
    assert a.equals(b)


def test_distributed_cc_path_matches_driver(ray_session, t1_fixture, t1_answers):
    """Force the distributed label-propagation fallback (probed form:
    profile merged from the combiner partials) and compare cluster
    assignments with the driver union-find path."""
    df2 = run_linkage(t1_fixture, driver_cc_max_nodes=0).to_pandas()
    a = dict(zip(t1_answers.mention_id, t1_answers.cluster_id))
    b = dict(zip(df2.mention_id, df2.cluster_id))
    assert a == b


def test_distributed_exchange_fallback_matches_driver(ray_session,
                                                      t1_fixture,
                                                      t1_answers):
    """The NON-probed fallback (unordered input: conv_id exchange +
    mention-table profile shuffle + join-based group-key attach) must
    also match the driver path on every mention. broadcast_answers_max=0
    forces the join-based attach so that path stays covered."""
    df2 = run_linkage(t1_fixture, driver_cc_max_nodes=0,
                      conv_partitioned=False,
                      broadcast_answers_max=0).to_pandas()
    a = dict(zip(t1_answers.mention_id, t1_answers.cluster_id))
    b = dict(zip(df2.mention_id, df2.cluster_id))
    assert a == b


def test_tier2_probe_reclaims_driver_plan(ray_session, t1_fixture,
                                          t1_answers):
    """When the mention count trips the guard but the CONTRACTED
    profile (what the driver plan actually materializes) fits, the
    tier-2 combiner probe must reclaim the fast driver plan — same
    answers, and no fallback-only stage in the timings."""
    import pyarrow.parquet as pq
    import os

    n_mentions = len(t1_answers)
    timings: dict = {}
    df2 = run_linkage(t1_fixture, driver_cc_max_nodes=n_mentions - 1,
                      timings=timings).to_pandas()
    assert "group_attach" not in timings  # fallback marker absent
    a = t1_answers.sort_values("mention_id").reset_index(drop=True)
    b = df2.sort_values("mention_id").reset_index(drop=True)
    assert a.equals(b)


def test_twins_split_only_by_context(t1_answers, t1_fixture):
    """Fixture v9 plants twin entities whose canonical names sit ABOVE
    the string-only merge region (jw >= 0.95) — they must still come out
    in different clusters (the context veto is the only separator)."""
    import numpy as np

    from el.fixtures import build_entities
    from el.sim import jaro_winkler
    from el.text import normalize_name

    rng = np.random.Generator(np.random.PCG64(42))
    ents = build_entities(60, rng)
    twins = [e for e in ents if e.no_kb]
    assert len(twins) >= 4
    gm = pq.read_table(f"{t1_fixture}/gold_mentions.parquet").to_pandas()
    cluster_of = dict(zip(t1_answers.mention_id, t1_answers.cluster_id))
    for a, b in zip(twins[0::2], twins[1::2]):
        na, nb = normalize_name(a.canonical), normalize_name(b.canonical)
        assert jaro_winkler(na, nb) >= 0.95  # adversarially close
        ca = {cluster_of[m] for m in gm[gm.gold_kb_id == a.gold_id].mention_id}
        cb = {cluster_of[m] for m in gm[gm.gold_kb_id == b.gold_id].mention_id}
        assert len(ca) == 1 and len(cb) == 1
        assert ca != cb, (a.canonical, b.canonical)


def test_fused_rejects_unsorted_input(ray_session, tmp_path):
    """conv_partitioned=True on input violating the conv-sorted contract
    must fail loudly, not mis-resolve silently."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    src = "/tmp/el_fixtures/t1"
    d = str(tmp_path / "unsorted")
    shutil.copytree(src, d)
    tdir = os.path.join(d, "transcripts.parquet")
    tbl = pq.read_table(tdir)
    # fully interleave conversations: all turn-0 rows, then all turn-1
    # rows, ... — every block sees each conversation in many runs
    import pyarrow.compute as pc2

    order = pc2.sort_indices(
        tbl, sort_keys=[("turn_idx", "ascending"), ("conv_id", "ascending")]
    )
    shutil.rmtree(tdir)
    pq.write_table(tbl.take(order),
                   os.path.join(d) + "/transcripts.parquet")
    with pytest.raises(ray.exceptions.RayTaskError):
        run_linkage(d).to_pandas()


def test_checkpoint_resume_identical(ray_session, t1_fixture, tmp_path):
    ck = str(tmp_path / "ckpt")
    out1 = run_linkage(t1_fixture, checkpoint_dir=ck).to_pandas()
    # simulate kill-after-stage-k: remove the final stage, keep earlier ones
    import shutil

    shutil.rmtree(os.path.join(ck, "stage-answers"))
    out2 = run_linkage(t1_fixture, checkpoint_dir=ck).to_pandas()
    a = out1.sort_values("mention_id").reset_index(drop=True)
    b = out2.sort_values("mention_id").reset_index(drop=True)
    assert a.equals(b)
    # fast-plan manifests with row counters (fused_mentions blocks,
    # fast_profile tables, fast_links_edges tables, answers dataset)
    mans = glob.glob(os.path.join(ck, "stage-*", "manifest.json"))
    assert len(mans) == 4
    names = {os.path.basename(os.path.dirname(m)) for m in mans}
    assert names == {"stage-fused_mentions", "stage-fast_profile",
                     "stage-fast_links_edges", "stage-answers"}


def test_checkpoint_resume_skips_recompute(ray_session, t1_fixture,
                                           tmp_path):
    """A full resume must SKIP the extract/scan/profile/scoring work
    (manifest-valid stages resume; only read tasks run) and reproduce
    the answers byte-for-byte — the fast plan no longer trades
    checkpointing for the slower exchange plan."""
    from el.checkpoint import CheckpointManager

    ck = str(tmp_path / "ckpt")
    out1 = run_linkage(t1_fixture, checkpoint_dir=ck).to_pandas()
    timings: dict = {}
    out2 = run_linkage(t1_fixture, checkpoint_dir=ck,
                       timings=timings).to_pandas()
    a = out1.sort_values("mention_id").reset_index(drop=True)
    b = out2.sort_values("mention_id").reset_index(drop=True)
    assert a.equals(b)
    # no scan / profile-merge / pair-scoring timings on a full resume
    assert "scan" not in timings and "scored_pairs" not in timings, timings


def test_e2e_quality_at_t2_scale(ray_session):
    """The t1-only gate missed a real regression: at t2 the df filter
    stripped every topical term, each alias's context vector collapsed
    to its own name tokens, and the twin-entity veto split TYPO
    VARIANTS of one entity (F1 0.988 < the 0.99 bar). Gate the larger
    scale too — both the own-name exclusion (el/ctxvec.py) and the
    intro-vector df filter (el/kb.py) are load-bearing only here."""
    import pyarrow.parquet as pq

    from el.fixtures import ensure_fixture
    from el.metrics import b_cubed, pairwise_f1

    fd = ensure_fixture("t2")
    a = run_linkage(fd).to_pandas()
    cluster_of = dict(zip(a["mention_id"], a["cluster_id"]))
    gp = pq.read_table(f"{fd}/gold_pairs.parquet")
    assert pairwise_f1(cluster_of, gp)["f1"] >= 0.99
    gm = pq.read_table(f"{fd}/gold_mentions.parquet")
    gold_of = dict(zip(gm["mention_id"].to_pylist(),
                       gm["gold_kb_id"].to_pylist()))
    assert b_cubed(cluster_of, gold_of)["f1"] >= 0.99


def test_attach_group_keys_table_matches_dict(ray_session):
    """The Arrow broadcast path (_ov_table) must reproduce the dict
    path exactly, including misses inside the candidate-alias mask
    ((alias in cand) but (alias, conv) not overridden -> plain alias)."""
    import pyarrow as pa

    from el.pipeline import _attach_group_keys, _ov_table

    ov = {("acme corp", "c1"): ("amb", "E7"),
          ("acme corp", "c3"): ("amb", "E9"),
          ("rivertown", "c2"): ("city", "E2")}
    t = pa.table({
        "alias_norm": pa.array(["acme corp", "acme corp", "rivertown",
                                "acme corp", "plain co", "rivertown"]),
        "conv_id": pa.array(["c1", "c2", "c2", "c3", "c1", "c9"]),
    })
    a = _attach_group_keys(t, ov).column("group_key").to_pylist()
    b = _attach_group_keys(t, _ov_table(ov)).column("group_key") \
        .to_pylist()
    assert a == b
    # miss-inside-mask: acme@c2 and rivertown@c9 stay plain aliases
    assert a[1] == "acme corp" and a[5] == "rivertown"
    assert a[0] != "acme corp" and "E7" in a[0]
    # empty choices: both forms pass alias through
    assert (_attach_group_keys(t, {}).column("group_key").to_pylist()
            == _attach_group_keys(t, _ov_table({}))
            .column("group_key").to_pylist()
            == t.column("alias_norm").to_pylist())
    # the vectorized from-choice-table builder (checkpoint-resume
    # path) matches the dict-built broadcast row for row
    from el.pipeline import _ov_table_from_choices

    ot = pa.table({
        "alias_norm": pa.array([a for a, _ in ov]),
        "conv_id": pa.array([c for _, c in ov]),
        "kind": pa.array([k for k, _ in ov.values()]),
        "kb_id": pa.array([e for _, e in ov.values()]),
    })
    t1 = _ov_table(ov)
    t2 = _ov_table_from_choices(ot)
    assert (sorted(tuple(r.values()) for r in t1.to_pylist())
            == sorted(tuple(r.values()) for r in t2.to_pylist()))
    # duplicate (alias, conv) keys in a persisted choices table resolve
    # to the LAST row — the fresh path's dict-insertion semantics
    dup = pa.table({
        "alias_norm": pa.array(["acme corp", "rivertown", "acme corp"]),
        "conv_id": pa.array(["c1", "c2", "c1"]),
        "kind": pa.array(["amb", "city", "amb"]),
        "kb_id": pa.array(["E7", "E2", "E99"]),
    })
    t3 = _ov_table_from_choices(dup)
    assert t3.num_rows == 2
    gk = dict(zip(t3.column("alias_norm").to_pylist(),
                  t3.column("group_key").to_pylist()))
    assert "E99" in gk["acme corp"]  # last wins, matching dict overwrite


def test_override_semijoin_path_matches_driver(ray_session, t1_fixture,
                                               t1_answers, monkeypatch):
    """Force the over-guard override path (OVERRIDE_BCAST_CONV_MAX=0):
    the flagged-conv list is never collected/broadcast — marker rows
    union into one conv_id exchange and the semi-join block resolves in
    place. Answers must match the driver plan exactly."""
    import el.overrides as ov

    monkeypatch.setattr(ov, "OVERRIDE_BCAST_CONV_MAX", 0)
    df2 = run_linkage(t1_fixture, driver_cc_max_nodes=0,
                      conv_partitioned=False,
                      broadcast_answers_max=0).to_pandas()
    a = dict(zip(t1_answers.mention_id, t1_answers.cluster_id))
    b = dict(zip(df2.mention_id, df2.cluster_id))
    assert a == b


def test_linkage_path_has_no_driver_collect():
    """Regression guard for VERDICT r03 finding 1: no take_all() (or
    full-dataset to_pandas) may appear in any module reachable from
    run_linkage — the only permitted driver materializations are the
    guarded block-ref collects. Bounded take_all sites live only in
    documented oracle/vocab-cap contexts (el/ops/ann.py sample fit,
    el/ops/textstats.py vocab top-k)."""
    import os

    import el

    root = os.path.dirname(el.__file__)
    for mod in ["pipeline", "overrides", "cluster", "alias", "mentions",
                "linkdecide", "blocking", "scorer", "contexts", "kb",
                "checkpoint", "outputs"]:
        src = open(os.path.join(root, f"{mod}.py")).read()
        assert "take_all" not in src, f"take_all reappeared in el/{mod}.py"


def test_dedupe_e2e_has_no_driver_collect():
    """Regression guard for VERDICT r04 finding 1: q_el_dedupe_e2e must
    not materialize the mention->surface map on the driver
    (read_table(...).to_pylist() -> dict -> ray.put) nor score pairs
    with a per-pair Python loop — the surface rides through the
    exchanges and JW goes through the vectorized DuckDB kernel."""
    import inspect

    from el.queries import q_el_dedupe_e2e

    src = inspect.getsource(q_el_dedupe_e2e)
    for banned in ("to_pylist", "ray.put", "read_table", "take_all"):
        assert banned not in src, \
            f"driver-side collect pattern {banned!r} in q_el_dedupe_e2e"
    assert "jaro_winkler_similarity" in src  # the vectorized kernel


def test_key_strategies_preserve_e2e_quality(ray_session, t1_fixture,
                                             t1_answers):
    """run_linkage with the full strategy menu (rare_token + snb on
    top of the default n/p/ph keys) must keep the e2e gates: extra
    strategies only ADD candidate pairs, and the scorer threshold —
    not the blocking — decides merges, so pairwise F1 stays 1.0 on
    the labeled fixture. Exercised on BOTH physical plans."""
    from el.metrics import pairwise_f1

    strategies = ("norm", "prefix", "phonetic", "rare_token", "snb")
    gp = pq.read_table(os.path.join(t1_fixture, "gold_pairs.parquet"))

    df = run_linkage(t1_fixture, key_strategies=strategies,
                     snb_window=8).to_pandas()
    f1 = pairwise_f1(dict(zip(df.mention_id, df.cluster_id)), gp)
    assert f1["f1"] == 1.0, f1

    # distributed fallback plan (forced), same strategies
    df2 = run_linkage(t1_fixture, driver_cc_max_nodes=0,
                      conv_partitioned=False,
                      key_strategies=strategies,
                      snb_window=8).to_pandas()
    f2 = pairwise_f1(dict(zip(df2.mention_id, df2.cluster_id)), gp)
    assert f2["f1"] == 1.0, f2
    # and both plans agree with each other and the default-strategy run
    a = dict(zip(df.mention_id, df.cluster_id))
    b = dict(zip(df2.mention_id, df2.cluster_id))
    assert a == b
    base = dict(zip(t1_answers.mention_id, t1_answers.cluster_id))
    assert a == base
