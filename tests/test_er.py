"""Unit tests for the classic ER blocking/eval operators (el/ops/er.py):
brute-force equivalence on small random inputs + invariants."""

import numpy as np
import pandas as pd
import pytest

from el.ops.er import (
    _norm_series,
    _sql_block_keys,
    blocking_quality,
    fellegi_sunter,
    metablocking_pairs,
    sorted_neighborhood,
)
from el.text import normalize_name

RNG = np.random.default_rng(7)
SURFACES = ["Janet Smith", "janet  smith", "J. Smith", "Janet Vance",
            "Bob Iger", "BOB IGER", "Acme Corp.", "Acme Corporation",
            "Li", "Li Wei", "Wei Li", "  ", "x-1 beta"]


def _mentions(n=60):
    return pd.DataFrame({
        "mention_id": [f"m{i:04d}" for i in range(n)],
        "surface": [SURFACES[i] for i in RNG.integers(0, len(SURFACES), n)],
        "gold_kb_id": [f"E{i}" for i in RNG.integers(0, 6, n)],
    })


def test_norm_series_matches_normalize_name():
    s = pd.Series(SURFACES + ["--", "A&B  C!"])
    assert list(_norm_series(s)) == [normalize_name(x) for x in s]


def test_sorted_neighborhood_matches_bruteforce(ray_session):
    import ray.data

    df = _mentions(60)
    w = 4
    out = sorted_neighborhood(
        ray.data.from_pandas(df), window=w).to_pandas()

    ref = df.assign(norm=_norm_series(df["surface"]))
    ref = ref[ref["norm"] != ""].sort_values(
        ["norm", "mention_id"]).reset_index(drop=True)
    want = set()
    for i in range(len(ref)):
        for j in range(i + 1, min(i + w, len(ref))):
            want.add((ref["mention_id"][i], ref["mention_id"][j], j - i))
    got = set(zip(out["m1_id"], out["m2_id"], out["dist"]))
    assert got == want and len(out) == len(want)


def test_sorted_neighborhood_boundary_spill(ray_session):
    """Tiny blocks force the boundary head to span >1 following block."""
    import ray.data

    df = _mentions(24)
    ds = ray.data.from_pandas(df).repartition(12)  # ~2 rows per block
    out = sorted_neighborhood(ds, window=4).to_pandas()
    base = sorted_neighborhood(
        ray.data.from_pandas(df), window=4).to_pandas()
    key = lambda d: sorted(map(tuple, d.to_numpy()))  # noqa: E731
    assert key(out) == key(base)


def test_metablocking_matches_bruteforce(ray_session):
    import ray.data

    df = _mentions(60)
    out = metablocking_pairs(ray.data.from_pandas(df)).to_pandas()

    keys = _sql_block_keys(df)
    merged = keys.merge(keys, on="block_key")
    merged = merged[merged["mention_id_x"] < merged["mention_id_y"]]
    cbs = merged.groupby(["mention_id_x", "mention_id_y"]).size()
    want = {(a, b, c) for (a, b), c in cbs.items() if c >= 2}
    got = set(zip(out["m1_id"], out["m2_id"], out["cbs"]))
    assert got == want


def test_blocking_quality_bruteforce(ray_session):
    import ray.data

    df = _mentions(80)
    out = blocking_quality(ray.data.from_pandas(df))
    assert len(out) == 1
    row = out.iloc[0]

    keys = _sql_block_keys(df, extra=["gold_kb_id"])
    merged = keys.merge(keys, on="block_key")
    merged = merged[merged["mention_id_x"] < merged["mention_id_y"]]
    cand = merged.drop_duplicates(["mention_id_x", "mention_id_y"])
    tp = int((cand["gold_kb_id_x"] == cand["gold_kb_id_y"]).sum())
    sizes = df.groupby("gold_kb_id").size().to_numpy()
    matching = int((sizes * (sizes - 1) // 2).sum())
    n = len(df)
    assert row["n_mentions"] == n
    assert row["candidate_pairs"] == len(cand)
    assert row["matching_pairs"] == matching
    assert row["tp_pairs"] == tp
    assert row["pairs_completeness"] == pytest.approx(tp / matching, abs=1e-6)
    assert row["reduction_ratio"] == pytest.approx(
        1 - len(cand) / (n * (n - 1) / 2), abs=1e-6)
    assert row["pairs_quality"] == pytest.approx(tp / len(cand), abs=1e-6)


def test_fellegi_sunter_counts_and_weights(ray_session):
    import ray
    import ray.data

    df = _mentions(40)
    surf = dict(zip(df["mention_id"], df["surface"]))
    # labeled pairs: every pair of the first 20 mentions
    rows = []
    for i in range(20):
        for j in range(i + 1, 20):
            a, b = df["mention_id"][i], df["mention_id"][j]
            rows.append((a, b, df["gold_kb_id"][i] == df["gold_kb_id"][j]))
    pairs = pd.DataFrame(rows, columns=["m1_id", "m2_id", "same_entity"])

    out = fellegi_sunter(ray.data.from_pandas(pairs),
                         ray.put(surf)).to_pandas()
    assert sorted(out["feature"]) == ["exact", "first_token", "jw92",
                                      "last_token", "token_count"]
    nm = int(pairs["same_entity"].sum())
    nn = len(pairs) - nm
    assert (out["n_match"] == nm).all() and (out["n_nonmatch"] == nn).all()

    # exact-feature agreement recomputed brute force
    n1 = pairs["m1_id"].map(lambda m: normalize_name(surf[m]))
    n2 = pairs["m2_id"].map(lambda m: normalize_name(surf[m]))
    agree = (n1 == n2)
    r = out.set_index("feature").loc["exact"]
    assert r["agree_match"] == int((agree & pairs["same_entity"]).sum())
    assert r["agree_nonmatch"] == int((agree & ~pairs["same_entity"]).sum())
    m = (r["agree_match"] + 1) / (nm + 2)
    u = (r["agree_nonmatch"] + 1) / (nn + 2)
    assert r["m_prob"] == pytest.approx(m, abs=1e-6)
    assert r["u_prob"] == pytest.approx(u, abs=1e-6)
    assert r["weight"] == pytest.approx(
        np.log2(r["m_prob"] / r["u_prob"]), abs=1e-6)


def test_token_pair_sims_known_values(ray_session):
    import ray
    import ray.data

    from el.ops.er import token_pair_sims
    from el.sim import jaro_winkler

    surf = {"a": "Janet Smith", "b": "Smith, Janet", "c": "Bob Iger",
            "d": "Janet Smith Smith"}
    pairs = pd.DataFrame({"m1_id": ["a", "a", "a"],
                          "m2_id": ["b", "c", "d"]})
    out = token_pair_sims(ray.data.from_pandas(pairs),
                          ray.put(surf)).to_pandas().set_index("m2_id")
    # a vs b: same token set in different order
    assert out.loc["b", "jaccard"] == 1.0
    assert out.loc["b", "dice"] == 1.0
    assert out.loc["b", "overlap"] == 1.0
    assert out.loc["b", "monge_elkan"] == 1.0
    # a vs c: disjoint
    assert out.loc["c", "jaccard"] == 0.0
    me = np.mean([max(np.floor(jaro_winkler(x, y) * 1e5 + 0.5) / 1e5
                      for y in ["bob", "iger"])
                  for x in ["janet", "smith"]])
    assert out.loc["c", "monge_elkan"] == pytest.approx(me, abs=1e-6)
    # a vs d: duplicate token on one side — distinct sets equal
    assert out.loc["d", "jaccard"] == 1.0
    assert out.loc["d", "dice"] == 1.0


def test_incremental_assign_semantics(ray_session):
    import hashlib

    import ray.data

    from el.ops.er import incremental_assign

    df = _mentions(80)
    df["conv_id"] = [f"conv{i % 17}" for i in range(len(df))]
    out = incremental_assign(
        ray.data.from_pandas(df), split_hex="8").to_pandas()

    ref = df.assign(norm=_norm_series(df["surface"]))
    ref = ref[ref["norm"] != ""]
    is_base = ref["conv_id"].map(
        lambda c: hashlib.md5(c.encode()).hexdigest()[0] < "8")
    base = ref[is_base]
    delta = ref[~is_base]
    base_min = base.groupby("norm")["mention_id"].min()
    new_min = delta.groupby("norm")["mention_id"].min()
    assert len(out) == len(delta)
    got = out.set_index("mention_id")
    for _, r in delta.iterrows():
        exp = base_min.get(r["norm"])
        if exp is None:
            assert got.loc[r["mention_id"], "cluster_id"] == \
                new_min[r["norm"]]
            assert bool(got.loc[r["mention_id"], "is_new"])
        else:
            assert got.loc[r["mention_id"], "cluster_id"] == exp
            assert not bool(got.loc[r["mention_id"], "is_new"])


def test_block_skew_bruteforce(ray_session):
    import ray.data

    from el.ops.er import block_skew

    df = _mentions(100)
    out = block_skew(ray.data.from_pandas(df), k=5)

    keys = _sql_block_keys(df)
    c = keys.groupby("block_key").size()
    pc = (c * (c - 1) // 2)
    total = int(pc.sum())
    ref = (pd.DataFrame({"block_key": c.index, "n_mentions": c.to_numpy(),
                         "pair_count": pc.to_numpy()})
           .sort_values(["pair_count", "block_key"],
                        ascending=[False, True]).head(5)
           .reset_index(drop=True))
    assert list(out["block_key"]) == list(ref["block_key"])
    assert list(out["pair_count"]) == list(ref["pair_count"])
    assert out["pair_share"].iloc[0] == pytest.approx(
        ref["pair_count"].iloc[0] / total, abs=1e-6)


def test_fs_em_matches_bruteforce_and_separates(ray_session):
    import ray
    import ray.data

    from el.ops.er import (EM_GRID, EM_INIT_LAMBDA, EM_INIT_M, EM_INIT_U,
                           FS_FEATURES, _agreement_flags, fs_em)
    from el.sim import jaro_winkler
    from el.text import normalize_name

    df = _mentions(40)
    surf = dict(zip(df["mention_id"], df["surface"]))
    rows = [(df["mention_id"][i], df["mention_id"][j])
            for i in range(30) for j in range(i + 1, 30)]
    pairs = pd.DataFrame(rows, columns=["m1_id", "m2_id"])

    out = fs_em(ray.data.from_pandas(pairs), ray.put(surf), iters=3)
    out = out.set_index("feature")

    # brute-force replica of the quantized EM
    agree = _agreement_flags(pairs["m1_id"], pairs["m2_id"], surf,
                             normalize_name, jaro_winkler)
    lam = EM_INIT_LAMBDA
    m = {f: EM_INIT_M for f in FS_FEATURES}
    u = {f: EM_INIT_U for f in FS_FEATURES}
    r6 = lambda x: np.floor(np.asarray(x) * 1e6 + 0.5) / 1e6  # noqa: E731
    n = len(pairs)
    for _ in range(3):
        w = np.full(n, lam)
        v = np.full(n, 1.0 - lam)
        for f in FS_FEATURES:
            w *= np.where(agree[f], m[f], 1 - m[f])
            v *= np.where(agree[f], u[f], 1 - u[f])
        g = np.floor(w / (w + v) * EM_GRID + 0.5).astype(np.int64)
        s = int(g.sum())
        lam = float(r6(s / (n * EM_GRID)))
        m = {f: float(r6(int(g[agree[f]].sum()) / s)) for f in FS_FEATURES}
        u = {f: float(r6((int(agree[f].sum()) * EM_GRID
                          - int(g[agree[f]].sum()))
                         / (n * EM_GRID - s))) for f in FS_FEATURES}
    for f in FS_FEATURES:
        assert out.loc[f, "m_prob"] == m[f]
        assert out.loc[f, "u_prob"] == u[f]
        assert out.loc[f, "lam"] == lam
    # the exact-match feature must be discriminative on this data
    assert out.loc["exact", "m_prob"] > out.loc["exact", "u_prob"]


def test_fs_em_scores_consistent_with_params(ray_session):
    import ray
    import ray.data

    from el.ops.er import (EM_GRID, FS_FEATURES, _agreement_flags, fs_em,
                           fs_em_scores)
    from el.sim import jaro_winkler
    from el.text import normalize_name

    df = _mentions(40)
    surf = dict(zip(df["mention_id"], df["surface"]))
    rows = [(df["mention_id"][i], df["mention_id"][j])
            for i in range(30) for j in range(i + 1, 30)]
    pairs = pd.DataFrame(rows, columns=["m1_id", "m2_id"])

    est = fs_em(ray.data.from_pandas(pairs), ray.put(surf), iters=3)
    out = fs_em_scores(ray.data.from_pandas(pairs), ray.put(surf),
                       iters=3).to_pandas()
    assert len(out) == len(pairs)
    assert out["match_prob"].between(0, 1).all()

    # recompute one pair's gamma from the estimated params
    p = {"lam": est["lam"].iloc[0],
         "m": dict(zip(est["feature"], est["m_prob"])),
         "u": dict(zip(est["feature"], est["u_prob"]))}
    r = out.iloc[0]
    a = _agreement_flags([r["m1_id"]], [r["m2_id"]], surf,
                         normalize_name, jaro_winkler)
    w, v = p["lam"], 1 - p["lam"]
    for f in FS_FEATURES:
        w *= p["m"][f] if a[f][0] else 1 - p["m"][f]
        v *= p["u"][f] if a[f][0] else 1 - p["u"][f]
    assert r["match_prob"] == np.floor(w / (w + v) * EM_GRID + 0.5) / EM_GRID


def test_block_pairs_cap_fails_loudly(ray_session):
    import ray.data

    from el.ops.er import _block_pairs_frame

    df = pd.DataFrame({
        "mention_id": [f"m{i}" for i in range(12)],
        "block_key": ["n:hot"] * 12,
    })
    with pytest.raises(ValueError, match="cap"):
        _block_pairs_frame(df, cap=10)


def test_mutual_best_small_graph(ray_session):
    """Hand-checked mutual-best semantics: b is a's argmax and vice
    versa; one-sided bests drop; ties break to the smaller dst."""
    import ray
    import ray.data

    from el.ops.er import mutual_best
    from el.sim import jaro_winkler
    from el.text import normalize_name

    surf = {"a": "Janet Smith", "b": "Janet  Smith", "c": "Janet Vance",
            "d": "Bob Iger", "e": "bob iger"}
    pairs = pd.DataFrame({
        "m1_id": ["a", "a", "b", "d"],
        "m2_id": ["b", "c", "c", "e"],
    })
    out = mutual_best(ray.data.from_pandas(pairs),
                      ray.put(surf)).to_pandas()

    # brute force
    import collections
    jw = {}
    for r in pairs.itertuples(index=False):
        v = np.floor(jaro_winkler(normalize_name(surf[r.m1_id]),
                                  normalize_name(surf[r.m2_id]))
                     * 1e5 + 0.5) / 1e5
        jw[(r.m1_id, r.m2_id)] = v
        jw[(r.m2_id, r.m1_id)] = v
    best = {}
    by_src = collections.defaultdict(list)
    for (s, d), v in jw.items():
        by_src[s].append((-v, d))
    for s, lst in by_src.items():
        best[s] = sorted(lst)[0][1]
    want = {(min(s, d), max(s, d), jw[(s, d)])
            for s, d in best.items() if best.get(d) == s}
    got = set(zip(out["m1_id"], out["m2_id"], out["jw"]))
    assert got == want
    # a<->b (identical norms) must be mutual; the one-sided a-c is not
    assert ("a", "b") in {(x, y) for x, y, _ in got}
    assert all(x < y for x, y, _ in got)


def test_mutual_best_partition_invariance(ray_session):
    import ray
    import ray.data

    from el.ops.er import mutual_best

    df = _mentions(40)
    surf = dict(zip(df["mention_id"], df["surface"]))
    ids = df["mention_id"].tolist()
    pairs = pd.DataFrame({
        "m1_id": [ids[i] for i in range(0, 30)],
        "m2_id": [ids[i + 5] for i in range(0, 30)],
    })
    pairs = pairs[pairs["m1_id"] != pairs["m2_id"]]
    a = mutual_best(ray.data.from_pandas(pairs),
                    ray.put(surf)).to_pandas()
    b = mutual_best(ray.data.from_pandas(pairs).repartition(7),
                    ray.put(surf)).to_pandas()
    key = ["m1_id", "m2_id", "jw"]
    assert (a.sort_values(key).reset_index(drop=True)[key]
            .equals(b.sort_values(key).reset_index(drop=True)[key]))


def test_golden_record_bruteforce(ray_session):
    import ray.data

    from el.ops.er import golden_record

    df = _mentions(80)
    df["conv_id"] = [f"c{i % 9}" for i in range(len(df))]
    out = golden_record(ray.data.from_pandas(df).repartition(6)) \
        .to_pandas().sort_values("cluster_id").reset_index(drop=True)

    ref = df.assign(norm=_norm_series(df["surface"]))
    ref = ref[ref["norm"] != ""]
    rows = []
    for nrm, g in ref.groupby("norm"):
        g = g.assign(slen=g["surface"].str.len()).sort_values(
            ["slen", "mention_id"], ascending=[False, True])
        rows.append({
            "cluster_id": g["mention_id"].min(),
            "canonical_mention": g["mention_id"].iloc[0],
            "canonical_surface": g["surface"].iloc[0],
            "n_members": len(g),
            "n_convs": g["conv_id"].nunique(),
        })
    want = pd.DataFrame(rows).sort_values("cluster_id") \
        .reset_index(drop=True)
    assert out[want.columns.tolist()].equals(want.astype(
        {"n_members": "int64", "n_convs": "int64"}))


def test_edit_pair_sims_matches_duckdb(ray_session):
    import duckdb
    import ray
    import ray.data

    from el.ops.er import edit_pair_sims

    df = _mentions(40)
    surf = dict(zip(df["mention_id"], df["surface"]))
    ids = df["mention_id"].tolist()
    pairs = pd.DataFrame({"m1_id": ids[:30], "m2_id": ids[5:35]})
    pairs = pairs[pairs["m1_id"] != pairs["m2_id"]]
    out = edit_pair_sims(ray.data.from_pandas(pairs),
                         ray.put(surf)).to_pandas()
    m = df.assign(norm=_norm_series(df["surface"]))[
        ["mention_id", "norm"]]
    want = duckdb.sql("""
        SELECT p.m1_id, p.m2_id,
               CAST(levenshtein(a.norm, b.norm) AS BIGINT) AS lev
        FROM pairs p
        JOIN m a ON a.mention_id = p.m1_id
        JOIN m b ON b.mention_id = p.m2_id
    """).df()
    key = ["m1_id", "m2_id"]
    got = out.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got["lev"].tolist() == want["lev"].tolist()
    # lev_sim bounds + exact-dup rows are 1.0
    assert ((got["lev_sim"] >= 0) & (got["lev_sim"] <= 1)).all()


def test_rare_token_keys_bruteforce(ray_session):
    import collections

    import ray.data

    from el.ops.er import rare_token_keys

    df = _mentions(60)
    out = rare_token_keys(
        ray.data.from_pandas(df).repartition(5)).to_pandas()

    ref = df.assign(norm=_norm_series(df["surface"]))
    ref = ref[ref["norm"] != ""]
    dfreq = collections.Counter()
    toks = {}
    for r in ref.itertuples(index=False):
        ts = set(r.norm.split(" "))
        toks[r.mention_id] = ts
        dfreq.update(ts)
    want = {m: "r:" + min(ts, key=lambda t: (dfreq[t], t))
            for m, ts in toks.items()}
    got = dict(zip(out["mention_id"], out["block_key"]))
    assert got == want


def test_tfidf_pair_sims_bruteforce(ray_session):
    import ray
    import ray.data

    from el.ops.er import tfidf_pair_sims

    df = _mentions(50)
    surf = dict(zip(df["mention_id"], df["surface"]))
    ids = df["mention_id"].tolist()
    pairs = pd.DataFrame({"m1_id": ids[:35], "m2_id": ids[10:45]})
    pairs = pairs[pairs["m1_id"] != pairs["m2_id"]]
    out = tfidf_pair_sims(ray.data.from_pandas(pairs).repartition(3),
                          ray.data.from_pandas(df),
                          ray.put(surf)).to_pandas()

    ref = df.assign(norm=_norm_series(df["surface"]))
    ref = ref[ref["norm"] != ""]
    toks = {m: set(n.split(" ")) for m, n in zip(ref["mention_id"],
                                                 ref["norm"])}
    import collections
    dfreq = collections.Counter(t for ts in toks.values() for t in ts)
    n1 = len(toks) + 1.0
    w2 = {t: int(np.floor(np.log(n1 / (d + 1.0)) * 1e6 + 0.5)) ** 2
          for t, d in dfreq.items()}
    want = {}
    for r in pairs.itertuples(index=False):
        ta, tb = toks.get(r.m1_id, set()), toks.get(r.m2_id, set())
        na = sum(w2[t] for t in ta)
        nb = sum(w2[t] for t in tb)
        sh = sum(w2[t] for t in ta & tb)
        s = sh / (np.sqrt(na) * np.sqrt(nb)) if na and nb else 0.0
        want[(r.m1_id, r.m2_id)] = np.floor(s * 1e6 + 0.5) / 1e6
    got = {(a, b): s for a, b, s in
           zip(out["m1_id"], out["m2_id"], out["tfidf_cos"])}
    assert got == want
    # identical surfaces must score 1.0 when both non-empty
    same = [(a, b) for (a, b) in want
            if toks.get(a) and toks.get(a) == toks.get(b)]
    assert all(got[k] == 1.0 for k in same)


def test_cluster_ari_matches_sklearn_formula(ray_session):
    import ray.data

    from el.ops.er import cluster_ari

    df = _mentions(100)
    df["conv_id"] = "c0"
    out = cluster_ari(
        ray.data.from_pandas(df).repartition(6)).to_pandas()
    assert len(out) == 1

    ref = df.assign(norm=_norm_series(df["surface"]))
    ref = ref[ref["norm"] != ""]
    from collections import Counter
    ng = Counter(zip(ref["norm"], ref["gold_kb_id"]))
    na = Counter(ref["norm"])
    nb = Counter(ref["gold_kb_id"])
    c2 = lambda x: x * (x - 1) // 2  # noqa: E731
    s = sum(c2(v) for v in ng.values())
    a = sum(c2(v) for v in na.values())
    b = sum(c2(v) for v in nb.values())
    n = len(ref)
    n2 = c2(n)
    exp = float(a * b) / float(n2)
    den = 0.5 * float(a + b) - exp
    ari = 1.0 if den == 0 else (float(s) - exp) / den
    r = out.iloc[0]
    assert (r["n_mentions"], r["pairs_both"], r["pairs_pred"],
            r["pairs_gold"]) == (n, s, a, b)
    assert r["ari"] == np.floor(ari * 1e6 + 0.5) / 1e6

    # perfect clustering => ARI 1.0
    perfect = pd.DataFrame({
        "mention_id": [f"m{i}" for i in range(12)],
        "surface": [f"name{i % 3}" for i in range(12)],
        "gold_kb_id": [f"E{i % 3}" for i in range(12)],
    })
    out2 = cluster_ari(ray.data.from_pandas(perfect)).to_pandas()
    assert out2.iloc[0]["ari"] == 1.0


def test_soft_tfidf_bruteforce(ray_session):
    import collections

    import ray
    import ray.data

    from el.ops.er import SOFT_TFIDF_THETA, soft_tfidf_pair_sims
    from el.sim import jaro_winkler

    df = _mentions(50)
    surf = dict(zip(df["mention_id"], df["surface"]))
    ids = df["mention_id"].tolist()
    pairs = pd.DataFrame({"m1_id": ids[:35], "m2_id": ids[10:45]})
    pairs = pairs[pairs["m1_id"] != pairs["m2_id"]]
    out = soft_tfidf_pair_sims(
        ray.data.from_pandas(pairs).repartition(3),
        ray.data.from_pandas(df), ray.put(surf)).to_pandas()

    ref = df.assign(norm=_norm_series(df["surface"]))
    ref = ref[ref["norm"] != ""]
    toks = {m: sorted(set(n.split(" "))) for m, n in
            zip(ref["mention_id"], ref["norm"])}
    dfreq = collections.Counter(t for ts in toks.values() for t in ts)
    n1 = len(toks) + 1.0
    w = {t: int(np.floor(np.log(n1 / (d + 1.0)) * 1e6 + 0.5))
         for t, d in dfreq.items()}
    jw5 = lambda a, b: np.floor(  # noqa: E731
        jaro_winkler(a, b) * 1e5 + 0.5) / 1e5
    want = {}
    for r in pairs.itertuples(index=False):
        t1, t2 = toks.get(r.m1_id, []), toks.get(r.m2_id, [])
        rn1 = np.sqrt(float(sum(w[t] ** 2 for t in t1)))
        rn2 = np.sqrt(float(sum(w[t] ** 2 for t in t2)))
        s = 0.0
        if t1 and t2 and rn1 and rn2:
            for a in t1:
                js = [(jw5(a, b), b) for b in t2]
                bj = max(j for j, _ in js)
                bt = min(b for j, b in js if j == bj)
                if bj >= SOFT_TFIDF_THETA:
                    s += (w[a] / rn1) * (w[bt] / rn2) * bj
        want[(r.m1_id, r.m2_id)] = np.floor(s * 1e6 + 0.5) / 1e6
    got = {(a, b): s for a, b, s in
           zip(out["m1_id"], out["m2_id"], out["soft_tfidf"])}
    assert got == want


def test_dedupe_e2e_invariants(ray_session):
    """The composite pipeline on the t1 fixture: every non-empty-norm
    mention appears exactly once; entity_id is a member and the min of
    its entity; the canonical surface is the entity's longest (tie ->
    min mention_id); exact-duplicate normalized surfaces always share
    an entity (they share the n: block and JW == 1)."""
    from el.fixtures import ensure_fixture
    from el.queries import q_el_dedupe_e2e

    fd = ensure_fixture("t1")
    out = q_el_dedupe_e2e(fd if fd.startswith("/") else "t1")
    # q_el_dedupe_e2e takes sf_dir; ensure_fixture idempotently maps
    df = out.to_pandas()
    assert df["mention_id"].is_unique
    g = df.groupby("entity_id")["mention_id"].agg(["min", "count"])
    assert (g.index == g["min"]).all()

    import pyarrow.parquet as pq

    gm = pq.read_table(f"{fd}/gold_mentions.parquet",
                       columns=["mention_id", "surface"]).to_pandas()
    gm["norm"] = _norm_series(gm["surface"])
    gm = gm[gm["norm"] != ""]
    assert len(df) == len(gm)
    j = df.merge(gm, on="mention_id")
    ent_of = dict(zip(j["mention_id"], j["entity_id"]))
    by_norm = j.groupby("norm")["mention_id"].agg(list)
    for ms in by_norm:
        assert len({ent_of[m] for m in ms}) == 1
    # canonical = longest surface in entity, tie min mention_id
    for ent, grp in j.groupby("entity_id"):
        grp = grp.assign(slen=grp["surface"].str.len()).sort_values(
            ["slen", "mention_id"], ascending=[False, True])
        assert (grp["canonical_surface"]
                == grp["surface"].iloc[0]).all()


def test_cluster_vmeasure_bounds_and_perfect(ray_session):
    import ray.data

    from el.ops.er import cluster_vmeasure

    perfect = pd.DataFrame({
        "mention_id": [f"m{i}" for i in range(12)],
        "surface": [f"name{i % 3}" for i in range(12)],
        "gold_kb_id": [f"E{i % 3}" for i in range(12)],
    })
    out = cluster_vmeasure(ray.data.from_pandas(perfect)).to_pandas()
    r = out.iloc[0]
    assert (r["homogeneity"], r["completeness"], r["v_measure"]) \
        == (1.0, 1.0, 1.0)

    df = _mentions(80)
    out2 = cluster_vmeasure(
        ray.data.from_pandas(df).repartition(5)).to_pandas()
    r2 = out2.iloc[0]
    for c in ("homogeneity", "completeness", "v_measure"):
        assert 0.0 <= r2[c] <= 1.0
    # Rosenberg-Hirschberg reference computed inline from the
    # contingency table (always runs — unlike the old optional sklearn
    # import, which silently no-op'd in envs without sklearn and let a
    # homogeneity/completeness swap go unnoticed). Convention: classes
    # = gold_kb_id (true), clusters = norm (predicted).
    ref = df.assign(norm=_norm_series(df["surface"]))
    ref = ref[ref["norm"] != ""]
    n = len(ref)

    def _entropy(labels):
        c = labels.value_counts().to_numpy(float)
        p = c / n
        return float(-(p * np.log(p)).sum())

    def _cond_entropy(of, given):
        # H(of | given) = -sum_ij n_ij/N ln(n_ij / n_given_j)
        ct = ref.groupby([given, of]).size().rename("nij").reset_index()
        marg = ct.groupby(given)["nij"].transform("sum").to_numpy(float)
        nij = ct["nij"].to_numpy(float)
        return float(-((nij / n) * np.log(nij / marg)).sum())

    h_gold = _entropy(ref["gold_kb_id"])
    h_norm = _entropy(ref["norm"])
    h = 1.0 if h_gold == 0 else 1.0 - _cond_entropy(
        "gold_kb_id", "norm") / h_gold
    c = 1.0 if h_norm == 0 else 1.0 - _cond_entropy(
        "norm", "gold_kb_id") / h_norm
    v = 0.0 if h + c == 0 else 2.0 * h * c / (h + c)
    assert abs(r2["homogeneity"] - h) < 1e-4
    assert abs(r2["completeness"] - c) < 1e-4
    assert abs(r2["v_measure"] - v) < 1e-4
    # optional sklearn confirmation when available
    try:
        from sklearn.metrics import homogeneity_completeness_v_measure
    except ImportError:
        return
    sh, sc, sv = homogeneity_completeness_v_measure(
        ref["gold_kb_id"], ref["norm"])
    assert abs(r2["homogeneity"] - sh) < 1e-4
    assert abs(r2["completeness"] - sc) < 1e-4
    assert abs(r2["v_measure"] - sv) < 1e-4


def test_snb_quality_matches_bruteforce(ray_session):
    import itertools

    import ray.data

    from el.ops.er import snb_quality

    df = _mentions(60)
    out = snb_quality(ray.data.from_pandas(df).repartition(4), window=4)
    r = out.iloc[0]

    ref = df.assign(norm=_norm_series(df["surface"]))
    nz = ref[ref["norm"] != ""].sort_values(["norm", "mention_id"]) \
        .reset_index(drop=True)
    cand = tp = 0
    for i in range(len(nz)):
        for j in range(i + 1, min(i + 4, len(nz))):
            cand += 1
            tp += int(nz["gold_kb_id"][i] == nz["gold_kb_id"][j])
    c = ref.groupby("gold_kb_id").size().to_numpy()
    matching = int((c * (c - 1) // 2).sum())
    n = len(df)
    assert int(r["n_mentions"]) == n
    assert int(r["candidate_pairs"]) == cand
    assert int(r["tp_pairs"]) == tp
    assert int(r["matching_pairs"]) == matching
    assert abs(r["pairs_completeness"] - tp / matching) < 1e-6
    assert abs(r["reduction_ratio"]
               - (1 - cand / (n * (n - 1) / 2))) < 1e-6
    assert abs(r["pairs_quality"] - tp / cand) < 1e-6


def test_rare_token_quality_matches_bruteforce(ray_session):
    import ray.data

    from el.ops.er import rare_token_quality

    df = _mentions(60)
    r = rare_token_quality(
        ray.data.from_pandas(df).repartition(4)).iloc[0]

    ref = df.assign(norm=_norm_series(df["surface"]))
    nz = ref[ref["norm"] != ""].reset_index(drop=True)
    toks = nz.assign(t=nz["norm"].str.split()) \
        .explode("t").drop_duplicates(["mention_id", "t"])
    dfreq = toks.groupby("t")["mention_id"].nunique()
    toks = toks.assign(n=toks["t"].map(dfreq))
    key = toks.sort_values(["n", "t"]).groupby("mention_id").head(1)
    keyed = nz.merge(key[["mention_id", "t"]], on="mention_id")
    cand = tp = 0
    for _, grp in keyed.groupby("t"):
        k = len(grp)
        cand += k * (k - 1) // 2
        g = grp.groupby("gold_kb_id").size().to_numpy()
        tp += int((g * (g - 1) // 2).sum())
    c = ref.groupby("gold_kb_id").size().to_numpy()
    matching = int((c * (c - 1) // 2).sum())
    n = len(df)
    assert int(r["n_mentions"]) == n
    assert int(r["candidate_pairs"]) == cand
    assert int(r["tp_pairs"]) == tp
    assert int(r["matching_pairs"]) == matching
    assert abs(r["pairs_completeness"] - tp / matching) < 1e-6
    assert abs(r["reduction_ratio"]
               - (1 - cand / (n * (n - 1) / 2))) < 1e-6
    assert abs(r["pairs_quality"] - tp / cand) < 1e-6


def test_cluster_fm_perfect_and_bruteforce(ray_session):
    import ray.data

    from el.ops.er import cluster_fm

    perfect = pd.DataFrame({
        "mention_id": [f"m{i}" for i in range(12)],
        "surface": [f"name{i % 3}" for i in range(12)],
        "gold_kb_id": [f"E{i % 3}" for i in range(12)],
    })
    r = cluster_fm(ray.data.from_pandas(perfect)).to_pandas().iloc[0]
    assert (r["pair_precision"], r["pair_recall"], r["fm"]) \
        == (1.0, 1.0, 1.0)

    df = _mentions(80)
    r2 = cluster_fm(
        ray.data.from_pandas(df).repartition(5)).to_pandas().iloc[0]
    ref = df.assign(norm=_norm_series(df["surface"]))
    ref = ref[ref["norm"] != ""]
    ct = ref.groupby(["norm", "gold_kb_id"]).size().to_numpy()
    s = int((ct * (ct - 1) // 2).sum())
    ca = ref.groupby("norm").size().to_numpy()
    a = int((ca * (ca - 1) // 2).sum())
    cb = ref.groupby("gold_kb_id").size().to_numpy()
    b = int((cb * (cb - 1) // 2).sum())
    assert int(r2["tp_pairs"]) == s
    assert int(r2["pred_pairs"]) == a
    assert int(r2["gold_pairs"]) == b
    assert r2["fm"] == pytest.approx(s / np.sqrt(a * b), abs=1e-6)
    assert r2["pair_precision"] == pytest.approx(s / a, abs=1e-6)
    assert r2["pair_recall"] == pytest.approx(s / b, abs=1e-6)


def test_trigram_pair_sims_bruteforce(ray_session):
    import collections
    import math

    import ray
    import ray.data

    from el.ops.er import trigram_pair_sims

    df = _mentions(40)
    surf = dict(zip(df["mention_id"], df["surface"]))
    rows = [(df["mention_id"][i], df["mention_id"][i + 1])
            for i in range(0, 38, 2)]
    pairs = pd.DataFrame(rows, columns=["m1_id", "m2_id"])
    out = trigram_pair_sims(
        ray.data.from_pandas(pairs).repartition(3),
        ray.put(surf)).to_pandas().set_index(["m1_id", "m2_id"])

    def grams(s):
        s = _norm_series(pd.Series([s], dtype=str)).iloc[0]
        if len(s) < 3:
            return collections.Counter([s])
        return collections.Counter(s[i:i + 3]
                                   for i in range(len(s) - 2))

    for a, b in rows:
        ga, gb = grams(surf[a]), grams(surf[b])
        dot = sum(ga[g] * gb[g] for g in ga)
        na = sum(c * c for c in ga.values())
        nb = sum(c * c for c in gb.values())
        sim = 0.0 if dot == 0 else dot / (math.sqrt(na) * math.sqrt(nb))
        r = out.loc[(a, b)]
        assert int(r["dot"]) == dot
        assert abs(r["trigram_cosine"] - sim) < 1e-6


def test_cluster_purity_bruteforce_and_perfect(ray_session):
    import ray.data

    from el.ops.er import cluster_purity

    perfect = pd.DataFrame({
        "mention_id": [f"m{i}" for i in range(12)],
        "surface": [f"name{i % 3}" for i in range(12)],
        "gold_kb_id": [f"E{i % 3}" for i in range(12)],
    })
    r = cluster_purity(ray.data.from_pandas(perfect)).to_pandas().iloc[0]
    assert (r["purity"], r["inverse_purity"], r["purity_f1"]) \
        == (1.0, 1.0, 1.0)
    assert r["purity_correct"] == r["n_mentions"] == 12

    df = _mentions(80)
    r2 = cluster_purity(
        ray.data.from_pandas(df).repartition(5)).to_pandas().iloc[0]
    # brute-force reference from the contingency table
    ref = df.assign(norm=_norm_series(df["surface"]))
    ref = ref[ref["norm"] != ""]
    ct = ref.groupby(["norm", "gold_kb_id"]).size()
    n = len(ref)
    pc = int(ct.groupby("norm").max().sum())
    ic = int(ct.groupby("gold_kb_id").max().sum())
    assert r2["n_mentions"] == n
    assert r2["purity_correct"] == pc
    assert r2["inverse_correct"] == ic
    p, i = pc / n, ic / n
    assert abs(r2["purity"] - p) < 1e-6
    assert abs(r2["inverse_purity"] - i) < 1e-6
    assert abs(r2["purity_f1"] - 2 * p * i / (p + i)) < 1e-6
    # the random many-cluster labeling must be properly asymmetric
    assert r2["purity"] != r2["inverse_purity"]


def test_monge_elkan_bruteforce(ray_session):
    import duckdb
    import ray
    import ray.data

    from el.ops.er import monge_elkan_pair_sims

    surf = {"m1": "John A Smith", "m2": "Jon Smith",
            "m3": "Acme Corp", "m4": "Acme Corporation Inc",
            "m5": "xyz", "m6": "xyz"}
    pairs = pd.DataFrame({"m1_id": ["m1", "m3", "m5"],
                          "m2_id": ["m2", "m4", "m6"]})
    out = monge_elkan_pair_sims(
        ray.data.from_pandas(pairs), ray.put(surf)).to_pandas() \
        .set_index(["m1_id", "m2_id"])

    con = duckdb.connect()

    def jw(a, b):
        return con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]

    def me(a_toks, b_toks):
        return float(np.mean([max(jw(t, u) for u in b_toks)
                              for t in a_toks]))

    for (a_id, b_id) in [("m1", "m2"), ("m3", "m4"), ("m5", "m6")]:
        ta = _norm_series(pd.Series([surf[a_id]]))[0].split(" ")
        tb = _norm_series(pd.Series([surf[b_id]]))[0].split(" ")
        ab, ba = me(ta, tb), me(tb, ta)
        assert abs(out.loc[(a_id, b_id), "me_ab"] - ab) < 1e-6
        assert abs(out.loc[(a_id, b_id), "me_ba"] - ba) < 1e-6
        assert abs(out.loc[(a_id, b_id), "me_sym"]
                   - (ab + ba) / 2) < 1e-6
    # identical strings are a perfect match; asymmetric pair is not
    assert out.loc[("m5", "m6"), "me_sym"] == 1.0
    assert out.loc[("m1", "m2"), "me_ab"] \
        != out.loc[("m1", "m2"), "me_ba"]


def test_damerau_pair_sims_transposition(ray_session):
    import ray
    import ray.data

    from el.ops.er import damerau_pair_sims

    surf = {"m1": "teh", "m2": "the", "m3": "abcd", "m4": "acbd",
            "m5": ""}
    pairs = pd.DataFrame({"m1_id": ["m1", "m3", "m5"],
                          "m2_id": ["m2", "m4", "m5"]})
    out = damerau_pair_sims(ray.data.from_pandas(pairs),
                            ray.put(surf)).to_pandas() \
        .set_index("m1_id").sort_index()
    # adjacent transpositions cost 1 (Levenshtein would say 2)
    assert out.loc["m1", "dl"] == 1
    assert out.loc["m3", "dl"] == 1
    assert abs(out.loc["m1", "dl_sim"] - (1 - 1 / 3)) < 1e-6
    # empty-vs-empty normalizes to similarity 1.0
    assert out.loc["m5", "dl"] == 0
    assert out.loc["m5", "dl_sim"] == 1.0


def test_acronym_candidates_bruteforce(ray_session):
    import ray.data

    from el.ops.er import acronym_candidates

    df = pd.DataFrame({"surface": [
        "Acme Banking Corp", "acme banking corp", "ABC", "abc", "A.B.C.",
        "United Nations", "UN", "xyz", "a", "Acme Corp",
    ]})
    out = acronym_candidates(
        ray.data.from_pandas(df).repartition(4)).to_pandas() \
        .sort_values(["acronym", "expansion"]).reset_index(drop=True)
    # 'abc' appears 3x single-token (ABC, abc, A.B.C. -> norm 'abc'? no:
    # 'a.b.c.' normalizes to 'a b c' (3 tokens) -> an EXPANSION of itself)
    want = {
        ("abc", "a b c"): (2, 1),
        ("abc", "acme banking corp"): (2, 2),
        ("un", "united nations"): (1, 1),
    }
    got = {(r.acronym, r.expansion): (r.n_acr_mentions, r.n_exp_mentions)
           for r in out.itertuples()}
    assert got == want


def test_turn_latency_bruteforce(ray_session):
    import ray.data

    from el.ops.dialogue import turn_latency

    ts0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # conv A: user -> assistant (2s), assistant -> user (3s),
    #         user -> assistant (5s)
    for i, (role, dt) in enumerate([("user", 0), ("assistant", 2),
                                    ("user", 5), ("assistant", 10)]):
        rows.append(("A", i, role, ts0 + pd.Timedelta(seconds=dt)))
    # conv B: single turn -> no transitions
    rows.append(("B", 0, "user", ts0))
    # conv C: user -> user (1.5s)
    rows.append(("C", 0, "user", ts0))
    rows.append(("C", 1, "user", ts0 + pd.Timedelta(seconds=1.5)))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "ts"])
    out = turn_latency(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().set_index(["role_from", "role_to"]).sort_index()
    assert out.loc[("user", "assistant"), "n"] == 2
    assert out.loc[("user", "assistant"), "max_latency_us"] == 5_000_000
    assert abs(out.loc[("user", "assistant"), "mean_latency_s"]
               - 3.5) < 1e-9
    assert out.loc[("assistant", "user"), "n"] == 1
    assert out.loc[("user", "user"), "n"] == 1
    assert abs(out.loc[("user", "user"), "mean_latency_s"] - 1.5) < 1e-9
    assert len(out) == 3


def test_rule_coverage_bruteforce(ray_session):
    import ray.data

    from el.ops.er import _norm_series, rule_coverage
    from el.sim import soundex

    df = _mentions(50)
    df = df.assign(gold_kb_id=df["mention_id"].str[:4])
    out = rule_coverage(ray.data.from_pandas(df).repartition(5)) \
        .to_pandas().set_index("rule")

    # brute-force the four rule pair sets
    norm = _norm_series(df["surface"].astype(str))
    keep = norm != ""
    base = pd.DataFrame({"mid": df["mention_id"][keep],
                         "gold": df["gold_kb_id"][keep],
                         "norm": norm[keep]})
    keysets = {}
    keysets["n"] = dict(zip(base["mid"], "n:" + base["norm"]))
    first = base["norm"].str.split(" ").str[0]
    pm = first.str.len() >= 3
    keysets["p"] = dict(zip(base["mid"][pm], "p:" + first[pm].str[:6]))
    last = base["norm"].str.split(" ").str[-1]
    keysets["ph"] = dict(zip(
        base["mid"], last.map(lambda t: f"ph:{soundex(t)}:{t[0]}")))
    tokdf = {}
    for n in base["norm"]:
        for t in set(n.split()):
            tokdf[t] = tokdf.get(t, 0) + 0  # placeholder
    # mention-level token df (distinct per mention)
    cnt = {}
    for n in base["norm"]:
        for t in set(n.split()):
            cnt[t] = cnt.get(t, 0) + 1
    keysets["r"] = {
        mid: "r:" + min(n.split(), key=lambda t: (cnt[t], t))
        for mid, n in zip(base["mid"], base["norm"])}

    gold = dict(zip(base["mid"], base["gold"]))
    pair_rules = {}
    for rule, km in keysets.items():
        bykey = {}
        for mid, k in km.items():
            bykey.setdefault(k, []).append(mid)
        for mids in bykey.values():
            mids = sorted(set(mids))
            for i in range(len(mids)):
                for j in range(i + 1, len(mids)):
                    pair_rules.setdefault((mids[i], mids[j]),
                                          set()).add(rule)
    for rule in ("n", "p", "ph", "r"):
        pairs = [pr for pr, rs in pair_rules.items() if rule in rs]
        assert out.loc[rule, "n_pairs"] == len(pairs), rule
        assert out.loc[rule, "n_marginal"] == sum(
            1 for pr in pairs if pair_rules[pr] == {rule}), rule
        assert out.loc[rule, "tp_pairs"] == sum(
            1 for a, b in pairs if gold[a] == gold[b]), rule
    assert out.loc["all", "n_pairs"] == len(pair_rules)
    assert out.loc["all", "tp_pairs"] == sum(
        1 for (a, b) in pair_rules if gold[a] == gold[b])


def test_candidate_topk_bruteforce(ray_session):
    import ray.data

    from el.ops.er import _norm_series, candidate_topk
    from el.sim import jaro_winkler

    df = _mentions(40)
    out = candidate_topk(ray.data.from_pandas(df).repartition(4), k=3) \
        .to_pandas()

    base = df.assign(norm=_norm_series(df["surface"]))
    base = base[base["norm"] != ""]
    keys = []
    for _, r in base.iterrows():
        keys.append((r["mention_id"], r["norm"], "n:" + r["norm"]))
        first = r["norm"].split(" ")[0]
        if len(first) >= 3:
            keys.append((r["mention_id"], r["norm"], "p:" + first[:6]))
    kdf = pd.DataFrame(keys, columns=["mid", "norm", "bk"])
    j = kdf.merge(kdf, on="bk")
    j = j[j["mid_x"] != j["mid_y"]].drop_duplicates(["mid_x", "mid_y"])
    j["jw"] = [np.floor(jaro_winkler(a, b) * 1e5 + 0.5) / 1e5
               for a, b in zip(j["norm_x"], j["norm_y"])]
    j = j.sort_values(["mid_x", "jw", "mid_y"],
                      ascending=[True, False, True], kind="stable")
    j["rank"] = j.groupby("mid_x", sort=False).cumcount() + 1
    want = j[j["rank"] <= 3]
    got = set(zip(out["mention_id"], out["candidate_id"], out["rank"]))
    exp = set(zip(want["mid_x"], want["mid_y"], want["rank"]))
    assert got == exp
