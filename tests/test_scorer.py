import pyarrow as pa

from el.scorer import MERGE_CUTOFF, PairScorer, pair_features, pair_score


def s(a1, a2, s1=None, s2=None):
    return pair_score(pair_features(a1, a2, s1 or a1, s2 or a2))


def test_misspelling_merges():
    assert s("Janet Harper", "Janet Harpr") >= MERGE_CUTOFF
    assert s("Meridian Northern Fisheries Institute",
             "Meridian Northern Fisheries Institte") >= MERGE_CUTOFF


def test_distinct_entities_do_not_merge():
    assert s("Janet Smith", "Robert Smith") < MERGE_CUTOFF
    assert s("Janet Smith", "Janet Vance") < MERGE_CUTOFF
    assert s("Global Timber Group", "Global Grain Group") < MERGE_CUTOFF
    assert s("Austin, Texas", "Dallas, Texas") < MERGE_CUTOFF


def test_prefix_backup_merges():
    # unexpanded org prefix still merges via the prefix feature
    assert s("United Western", "United Western Commerce Council") >= MERGE_CUTOFF


def test_abbr_backup_merges():
    assert s("UWCC", "United Western Commerce Council") >= MERGE_CUTOFF


def test_features():
    f = pair_features("Janet Smith", "Robert Smith", "Smith", "Smith")
    assert f["common_surname"] is True
    assert f["jw_surface"] == 1.0
    f2 = pair_features("United Western", "United Western Commerce Council",
                       "United Western", "UWCC")
    assert f2["prefix2"] is True


def test_vectorized_matches_scalar():
    """The DuckDB-vectorized batch path must be bit-equal to the scalar
    reference implementation on every feature and the final score."""
    from el.scorer import compute_pair_features, score_pairs_batch

    cases = [
        ("Janet Harper", "Janet Harpr"), ("Janet Smith", "Robert Smith"),
        ("United Western", "United Western Commerce Council"),
        ("UWCC", "United Western Commerce Council"),
        ("Austin, Texas", "Dallas, Texas"),
        ("Global Timber Group", "Global Grain Group"),
        ("X", "X Y"), ("A B C", "A B"), ("Smith", "Smith"),
        ("nrg austin", "nrg austin one"),
        ("Meridian Northern Fisheries Institute",
         "Meridian Northern Fisheries Institte"),
    ]
    a1 = [c[0] for c in cases]
    a2 = [c[1] for c in cases]
    t = pa.table({"alias1": a1, "alias2": a2, "surface1": a1, "surface2": a2})
    f = compute_pair_features(t)
    out = score_pairs_batch(t)
    for i, (x, y) in enumerate(cases):
        ref = pair_features(x, y, x, y)
        for k, r in ref.items():
            v = f[k][i]
            if isinstance(r, bool):
                assert bool(v) == r, (x, y, k, v, r)
            else:
                assert abs(float(v) - r) < 1e-12, (x, y, k, v, r)
        assert abs(out.column("score")[i].as_py() - pair_score(ref)) < 1e-12


def test_feature_registry_extension():
    """§2.10 extension surface: a registered feature shifts the score
    and unregistering restores the built-in behavior exactly."""
    import numpy as np

    from el.scorer import (register_feature, score_pairs_batch,
                           unregister_feature)

    t = pa.table({"alias1": ["Janet Harper"], "alias2": ["Janet Harpr"],
                  "surface1": ["Janet Harper"], "surface2": ["Janet Harpr"]})
    base = score_pairs_batch(t).column("score")[0].as_py()
    register_feature("always_against", -100.0,
                     lambda b: np.ones(b.num_rows))
    try:
        vetoed = score_pairs_batch(t).column("score")[0].as_py()
        assert vetoed < 0.01 < base
    finally:
        unregister_feature("always_against")
    assert score_pairs_batch(t).column("score")[0].as_py() == base


def test_ctx_veto_splits_twins():
    """Adversarial-twin semantics (fixture v9): a pair above the
    string-similarity merge region MUST be vetoed when both aliases
    carry substantial but disjoint topic vectors, and must stay merged
    when the vectors agree or are absent."""
    import json

    from el.scorer import MERGE_CUTOFF, score_pairs_batch

    def batch(ctx1, ctx2):
        return pa.table({
            "alias1": ["Rosa Thornbury"], "alias2": ["Rosa Thornbry"],
            "surface1": ["Rosa Thornbury"], "surface2": ["Rosa Thornbry"],
            "n1": ["rosa thornbury"], "n2": ["rosa thornbry"],
            "s1n": ["rosa thornbury"], "s2n": ["rosa thornbry"],
            "ctx1": [ctx1], "ctx2": [ctx2],
        })

    va = json.dumps({"zt4x0": 6, "zt4x1": 6, "zt4x2": 6})
    vb = json.dumps({"zt5x0": 6, "zt5x1": 6, "zt5x2": 6})
    # disjoint topics -> veto
    s = score_pairs_batch(batch(va, vb)).column("score")[0].as_py()
    assert s < MERGE_CUTOFF
    # agreeing topics -> merge
    s = score_pairs_batch(batch(va, va)).column("score")[0].as_py()
    assert s >= MERGE_CUTOFF
    # no context on either side -> string similarity decides (merge)
    s = score_pairs_batch(batch("", vb)).column("score")[0].as_py()
    assert s >= MERGE_CUTOFF


def test_ctx_adjustment_matches_per_pair_reference():
    """The distinct-decode cached form must be bit-identical to the
    straightforward per-pair ctx_cosine reference on every branch:
    empty strings, empty dicts, disjoint, overlapping, asymmetric
    sizes (the small-side swap), repeated strings (the cache path)."""
    import json

    import numpy as np

    from el.ctxvec import CTX_MIN_MASS, CTX_VETO_COS, ctx_cosine
    from el.scorer import W_CTX, W_CTX_VETO, ctx_adjustment

    va = json.dumps({"a": 3, "b": 2})
    vb = json.dumps({"a": 1, "c": 5, "d": 1})
    vc = json.dumps({"x": 9, "y": 9, "z": 9})
    vd = json.dumps({})
    c1 = ["", va, va, vb, vc, vd, va, vc, va]
    c2 = [va, "", vb, va, va, va, vd, vc, va]
    got = ctx_adjustment(c1, c2)
    want = np.zeros(len(c1))
    for i, (j1, j2) in enumerate(zip(c1, c2)):
        if not j1 or not j2:
            continue
        cos, mass = ctx_cosine(j1, j2)
        want[i] = W_CTX * (cos - 0.5)
        if mass >= CTX_MIN_MASS and cos < CTX_VETO_COS:
            want[i] -= W_CTX_VETO
    assert got.tolist() == want.tolist()


def test_ctx_sample_merge_associative():
    """The per-alias context sample must be independent of how mentions
    were split across partial blocks — the invariant that makes the
    driver and distributed physical plans produce identical vectors."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from el.ctxvec import merge_samples, sample_contexts

    pairs_st = st.lists(
        st.tuples(st.text("abc", min_size=1, max_size=6),
                  st.text("xyz ", max_size=20)),
        min_size=0, max_size=20, unique_by=lambda p: p[0],
    )

    @settings(max_examples=60, deadline=None)
    @given(pairs_st, st.integers(0, 20))
    def check(pairs, split):
        whole = sample_contexts(pairs)
        split = min(split, len(pairs))
        merged = merge_samples([sample_contexts(pairs[:split]),
                                sample_contexts(pairs[split:])])
        assert merged == whole

    check()


def test_scorer_batch():
    t = pa.table(
        {
            "a1": ["A:janet harper"],
            "a2": ["A:janet harpr"],
            "alias1": ["Janet Harper"],
            "alias2": ["Janet Harpr"],
            "surface1": ["Janet Harper"],
            "surface2": ["Janet Harpr"],
            "ner1": ["PER"],
            "ner2": ["PER"],
            "block_key": ["p:janet"],
        }
    )
    out = PairScorer()(t)
    assert out["score"][0].as_py() >= MERGE_CUTOFF
