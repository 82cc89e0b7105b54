"""Cross-validation and threshold-search utilities — the evaluation
harnesses a user re-fitting the classifiers on new data would run.

Two reference analogs, both driver-side (the labeled sets are capped at
training-sample scale by construction, MentionPairTrainingData caps —
this is model selection, not a corpus pass):

- :func:`crossval_pair_pr` re-expresses MentionPairClassifierTest
  (MentionPairClassifier.scala:31-113): an 8-fold cross-validation of a
  logistic regression over the engine's pair-feature vector, pooling
  every fold's held-out scores into ONE ranked list and reporting the
  reference's interpolated precision/recall curve (``precRecall``'s
  tail-max = precision monotonified from the right).
  Fold assignment is md5-rank based (order-free, partition-free) rather
  than ``iterator.grouped`` — same uniform split, deterministic across
  runs and engines.

- :func:`find_link_threshold` re-expresses LinkClassifierTest
  (LinkClassifier.scala:36-86): 10 seeded random 90/10 splits; each
  iteration ranks the held-out link examples by score and takes the
  score at the best-F cut; the average is the suggested threshold. The
  labeled link examples come from the fixture gold: alias -> top KB
  candidate score, label = the top candidate IS the gold entity. Our
  link scorer is deterministic rules (no per-split re-train), so the
  split isolates the threshold-selection variance the reference's loop
  was measuring.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def fit_logistic(X: np.ndarray, y: np.ndarray, iters: int = 300,
                 lr: float = 0.5, l2: float = 1e-3) -> np.ndarray:
    """Deterministic full-batch gradient-descent logistic regression
    (the BreezeLogisticRegressionTrainer analog): zero init, fixed
    iteration count, L2 on non-bias weights. Returns weights with the
    bias LAST."""
    n, d = X.shape
    Xb = np.hstack([X, np.ones((n, 1))])
    w = np.zeros(d + 1)
    reg = np.ones(d + 1) * l2
    reg[-1] = 0.0  # no penalty on the bias
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        g = Xb.T @ (p - y) / n + reg * w
        w -= lr * g
    return w


def predict_logistic(X: np.ndarray, w: np.ndarray) -> np.ndarray:
    Xb = np.hstack([X, np.ones((len(X), 1))])
    return 1.0 / (1.0 + np.exp(-(Xb @ w)))


_FEATURE_ORDER = ["jw_alias", "jw_surface", "prefix2", "contains",
                  "abbr", "tok_overlap", "common_surname"]


def pair_feature_matrix(s1: list[str], s2: list[str]) -> np.ndarray:
    """Surface pairs -> the engine's pair-feature matrix (the same
    vectorized DuckDB kernel the production scorer uses,
    el/scorer.py compute_pair_features)."""
    from .scorer import compute_pair_features

    batch = pa.table({
        "alias1": pa.array(s1, pa.string()),
        "alias2": pa.array(s2, pa.string()),
        "surface1": pa.array(s1, pa.string()),
        "surface2": pa.array(s2, pa.string()),
    })
    f = compute_pair_features(batch)
    return np.column_stack([np.asarray(f[k], dtype=np.float64)
                            for k in _FEATURE_ORDER])


def labeled_pairs_with_surfaces(fixture_dir: str) -> "object":
    """The downsampled training-pair sample (el.training — the
    MentionPairTrainingData analog) joined with gold_mentions surfaces
    -> pandas (m1_id, m2_id, s1, s2, label)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from .training import build_pair_training_set

    gp = ray.data.read_parquet(os.path.join(fixture_dir,
                                            "gold_pairs.parquet"))
    pairs = build_pair_training_set(gp).to_pandas()
    gm = pq.read_table(os.path.join(fixture_dir, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"]).to_pandas()
    surf = dict(zip(gm["mention_id"], gm["surface"]))
    pairs["s1"] = pairs["m1_id"].map(surf)
    pairs["s2"] = pairs["m2_id"].map(surf)
    pairs["label"] = pairs["same_entity"].astype(bool)
    return pairs[["m1_id", "m2_id", "s1", "s2", "label"]]


def _interp_precision(labels_ranked: np.ndarray) -> np.ndarray:
    """Reference precRecall semantics: precision at each POSITIVE in
    score-descending order, monotonified from the right (each entry is
    the max precision at any deeper cut — ``tails.map(_.max)``)."""
    total = np.arange(1, len(labels_ranked) + 1)
    correct = np.cumsum(labels_ranked)
    prec_at_pos = (correct / total)[labels_ranked.astype(bool)]
    return np.maximum.accumulate(prec_at_pos[::-1])[::-1]


def crossval_pair_pr(pairs, n_folds: int = 8) -> "object":
    """8-fold x-val of the pair classifier -> pooled interpolated P/R
    table (recall, precision, score), reference
    MentionPairClassifier.scala:31-113. ``pairs`` is the frame from
    :func:`labeled_pairs_with_surfaces`."""
    import pandas as pd

    fold = np.array([
        int(hashlib.md5(f"{a}:{b}".encode()).hexdigest(), 16) % n_folds
        for a, b in zip(pairs["m1_id"], pairs["m2_id"])
    ])
    X = pair_feature_matrix(list(pairs["s1"]), list(pairs["s2"]))
    y = pairs["label"].to_numpy(dtype=np.float64)
    scores = np.zeros(len(pairs))
    for k in range(n_folds):
        te = fold == k
        if not te.any():
            continue
        w = fit_logistic(X[~te], y[~te])
        scores[te] = predict_logistic(X[te], w)
    # pooled ranked list; ties broken by pair id for determinism
    order = np.lexsort((pairs["m1_id"].to_numpy(),
                        pairs["m2_id"].to_numpy(), -scores))
    ranked_labels = y[order].astype(bool)
    ranked_scores = scores[order]
    prec = _interp_precision(ranked_labels)
    n_pos = int(ranked_labels.sum())
    recall = np.arange(1, n_pos + 1) / n_pos
    return pd.DataFrame({
        "recall": recall,
        "precision": prec,
        "score": ranked_scores[ranked_labels],
    })


def labeled_link_examples(fixture_dir: str, answers=None) -> "object":
    """Gold-derived link examples over the CANONICALIZED aliases — the
    strings the step-2 threshold decision actually sees — one per
    distinct alias_norm: (alias_norm, score = top KB-candidate score,
    label = the top candidate is the gold entity). The LinkTrainingData
    analog, built from the fixture instead of TAC annotation files.
    ``answers`` (the pipeline output frame) can be passed to reuse a
    cached run; otherwise the linkage pipeline runs at fixture scale.
    Aliases whose norm maps to several gold entities get the majority
    gold (deterministic: ties to the min id) — an ambiguous curated
    alias therefore shows up as a HIGH-scoring negative, exactly the
    case the engine resolves by doc-sim override rather than by the
    threshold."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from .kb import KBIndex
    from .linkdecide import candidates_for
    from .text import normalize_name

    if answers is None:
        from .pipeline import run_linkage

        answers = run_linkage(fixture_dir).to_pandas()
    gm = pq.read_table(
        os.path.join(fixture_dir, "gold_mentions.parquet"),
        columns=["mention_id", "gold_kb_id"]).to_pandas()
    df = answers.merge(gm, on="mention_id")
    kb = KBIndex.from_parquet(os.path.join(fixture_dir, "kb.parquet"))
    df["alias_norm"] = [normalize_name(a) for a in df["alias"]]
    top_gold = (df.groupby(["alias_norm", "gold_kb_id"]).size()
                .reset_index(name="n")
                .sort_values(["alias_norm", "n", "gold_kb_id"],
                             ascending=[True, False, True])
                .drop_duplicates("alias_norm"))
    rows = []
    for an, gold in zip(top_gold["alias_norm"], top_gold["gold_kb_id"]):
        cands = candidates_for(an, kb)
        score = cands[0][1] if cands else 0.0
        top_id = cands[0][0] if cands else ""
        label = bool(top_id) and top_id == gold
        rows.append((an, score, label))
    return pd.DataFrame(rows, columns=["alias_norm", "score", "label"])


def find_link_threshold(examples, iters: int = 10, test_frac: float = 0.1,
                        seed: int = 0) -> dict:
    """10x random-split threshold search
    (LinkClassifier.scala:36-86): each iteration ranks a held-out
    split by score, computes F at every cut, and keeps the score at
    the best-F cut; returns per-iteration thresholds + their mean."""
    rng = np.random.Generator(np.random.PCG64(seed))
    s = examples["score"].to_numpy(dtype=np.float64)
    y = examples["label"].to_numpy(dtype=bool)
    n = len(s)
    n_test = max(1, int(np.ceil(n * test_frac)))
    cut_scores = []
    thresholds = []
    for _ in range(iters):
        idx = rng.permutation(n)[:n_test]
        st, yt = s[idx], y[idx]
        order = np.argsort(-st, kind="stable")
        st, yt = st[order], yt[order]
        total_pos = max(1, int(yt.sum()))
        correct = np.cumsum(yt)
        total = np.arange(1, len(yt) + 1)
        recall = correct / total_pos
        precision = correct / total
        denom = np.where(recall + precision == 0, 1.0,
                         recall + precision)
        f = 2 * recall * precision / denom
        k = int(np.argmax(f))
        cut_scores.append(float(st[k]))  # reference-faithful: the
        # score AT the best-F rank (LinkClassifier.scala:77)
        # decision boundary: the engine links on STRICT score > t, so
        # the boundary the cut implies is anywhere in the open gap
        # below the last included score — take the midpoint to the
        # first excluded score (or just below the cut when the split
        # includes everything)
        below = st[k + 1] if k + 1 < len(st) else max(0.0, st[k] - 0.1)
        thresholds.append(float((st[k] + below) / 2.0))
    return {"cut_scores": cut_scores,
            "thresholds": thresholds,
            "mean": float(np.mean(thresholds))}


# ------------------------------------------------------- sports refit
def sports_instances(fixture_dir: str) -> "object":
    """Labeled sports-sense instances (SportsSenseTrainingData analog)
    from the fixture gold: one row per sports-CANDIDATE gold mention —
    gazetteer-location surface with non-PER type
    (SportsSenseLabeller.scala:38-49) — with label = the gold entity is
    team-typed. Context = the mention's own turn text (the unit the
    production marker gate sees); the conversation-level feature inputs
    (location variance, org/loc ratio —
    SportsSenseFeatures.scala:128-201) come from the conversation's
    gold mentions. Driver-side: the labeled set is gold-annotation
    scale by construction, not a corpus pass."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from .sports import (SPORTS_MARKERS, is_sports_candidate,
                         location_variance, org_location_ratio)
    from .text import tokenize

    gm = pq.read_table(os.path.join(fixture_dir, "gold_mentions.parquet"),
                       columns=["mention_id", "conv_id", "turn_idx",
                                "surface", "gold_kb_id",
                                "gold_type"]).to_pandas()
    tr = pq.read_table(os.path.join(fixture_dir, "transcripts.parquet"),
                       columns=["conv_id", "turn_idx",
                                "text"]).to_pandas()
    kb = pq.read_table(os.path.join(fixture_dir, "kb.parquet"),
                       columns=["kb_id", "wiki_type"]).to_pandas()
    team_ids = set(kb.loc[kb["wiki_type"] == "team", "kb_id"])

    cand_mask = [is_sports_candidate(s, t)
                 for s, t in zip(gm["surface"], gm["gold_type"])]
    cand = gm[pd.Series(cand_mask, index=gm.index)].copy()
    cand = cand.merge(tr, on=["conv_id", "turn_idx"], how="left")
    cand["text"] = cand["text"].fillna("")

    # conversation-level aggregates over ALL gold mentions
    locs = (gm[gm["gold_type"] == "GPE"].groupby("conv_id")["surface"]
            .agg(list))
    orgs = (gm[gm["gold_type"] == "ORG"].groupby("conv_id")["surface"]
            .agg(list))

    toks = [tokenize(t) for t in cand["text"]]
    marker_ratio = [
        (sum(1 for w in ts if w in SPORTS_MARKERS) / len(ts)) if ts else 0.0
        for ts in toks
    ]
    loc_var = [location_variance(locs.get(c, []))
               for c in cand["conv_id"]]
    olr = [org_location_ratio(orgs.get(c, []), locs.get(c, []))
           for c in cand["conv_id"]]
    return pd.DataFrame({
        "mention_id": cand["mention_id"].to_numpy(),
        "conv_id": cand["conv_id"].to_numpy(),
        "surface": cand["surface"].to_numpy(),
        "tokens": toks,
        "marker_ratio": marker_ratio,
        "loc_variance": loc_var,
        "org_loc_ratio": olr,
        "label": cand["gold_kb_id"].isin(team_ids).to_numpy(),
    }).sort_values("mention_id").reset_index(drop=True)


class TokenNB:
    """Laplace-smoothed multinomial naive Bayes over context tokens —
    the breeze ``NaiveBayes`` analog whose class-true score feeds the
    sports LR as a feature (SportsClassifier.scala:84-96). Fit is a
    pure count pass; score returns P(sports | tokens) via the two-class
    log-odds (unknown tokens fall back to the smoothing mass)."""

    def __init__(self, token_lists, labels, alpha: float = 1.0):
        pos: dict[str, int] = {}
        neg: dict[str, int] = {}
        n_pos = n_neg = 0
        t_pos = t_neg = 0
        for ts, y in zip(token_lists, labels):
            if y:
                n_pos += 1
                for w in ts:
                    pos[w] = pos.get(w, 0) + 1
                t_pos += len(ts)
            else:
                n_neg += 1
                for w in ts:
                    neg[w] = neg.get(w, 0) + 1
                t_neg += len(ts)
        self.vocab = sorted(set(pos) | set(neg))
        v = len(self.vocab) + 1  # +1: one shared unknown-token bucket
        self.alpha = alpha
        self._lp = {w: np.log((pos.get(w, 0) + alpha)
                              / (t_pos + alpha * v)) for w in self.vocab}
        self._ln = {w: np.log((neg.get(w, 0) + alpha)
                              / (t_neg + alpha * v)) for w in self.vocab}
        self._lp_unk = np.log(alpha / (t_pos + alpha * v))
        self._ln_unk = np.log(alpha / (t_neg + alpha * v))
        tot = max(1, n_pos + n_neg)
        self._prior = (np.log((n_pos + alpha) / (tot + 2 * alpha))
                       - np.log((n_neg + alpha) / (tot + 2 * alpha)))

    def score(self, tokens) -> float:
        logit = self._prior
        for w in tokens:
            logit += self._lp.get(w, self._lp_unk) \
                - self._ln.get(w, self._ln_unk)
        return float(1.0 / (1.0 + np.exp(-logit)))


_SPORTS_FEATURES = ["marker_ratio", "loc_variance", "org_loc_ratio",
                    "nb_score"]


def sports_refit_report(inst, seed: int = 0) -> dict:
    """80/20 refit + eval of the sports classifier — the
    ``SportsClassifier.testClassifier`` harness
    (SportsClassifier.scala:60-139): deterministic md5-rank shuffle
    (the ``Random.shuffle`` analog, seeded and order-free), test =
    first ceil(20%), train = the remaining 80%, NB fit on the LAST 50%
    (the reference's overlapping nbModel split), then an LR over
    [marker_ratio, loc_variance, org_loc_ratio, nb_score]. Returns
    test accuracy, the interpolated P/R rows the reference prints, the
    LR intercept, a best-F suggested threshold (midpoint into the
    decision gap, the find_link_threshold convention), and the refit
    model's agreement with the production marker-ratio gate
    (el.sports.sports_sense) on the test split."""
    import hashlib as _h

    import pandas as pd

    from .sports import sports_sense

    rank = np.argsort([
        _h.md5(f"{seed}:{m}".encode()).hexdigest()
        for m in inst["mention_id"]
    ], kind="stable")
    inst = inst.iloc[rank].reset_index(drop=True)
    n = len(inst)
    n_test = int(np.ceil(n * 0.2))
    test = inst.iloc[:n_test]
    train = inst.iloc[n_test:]
    nb_data = inst.iloc[int(np.ceil(n * 0.5)):]

    nb = TokenNB(list(nb_data["tokens"]), list(nb_data["label"]))
    inst = inst.assign(nb_score=[nb.score(t) for t in inst["tokens"]])
    test = inst.iloc[:n_test]
    train = inst.iloc[n_test:]

    def xmat(df):
        return np.column_stack([df[c].to_numpy(dtype=np.float64)
                                for c in _SPORTS_FEATURES])

    w = fit_logistic(xmat(train), train["label"].to_numpy(np.float64))
    p = predict_logistic(xmat(test), w)
    y = test["label"].to_numpy(dtype=bool)
    acc = float(((p >= 0.5) == y).mean()) if n_test else 0.0

    order = np.lexsort((test["mention_id"].to_numpy(), -p))
    ranked = y[order]
    prec = _interp_precision(ranked)
    n_pos = int(ranked.sum())
    pr = pd.DataFrame({
        "recall": (np.arange(1, n_pos + 1) / n_pos) if n_pos else [],
        "precision": prec,
        "score": p[order][ranked] if n_pos else [],
    })

    # best-F cut over the ranked test scores -> midpoint threshold
    if n_test and n_pos:
        sp = p[order]
        correct = np.cumsum(ranked)
        total = np.arange(1, n_test + 1)
        rec = correct / n_pos
        prc = correct / total
        denom = np.where(rec + prc == 0, 1.0, rec + prc)
        f = 2 * rec * prc / denom
        k = int(np.argmax(f))
        below = sp[k + 1] if k + 1 < n_test else max(0.0, sp[k] - 0.1)
        suggested = float((sp[k] + below) / 2.0)
    else:
        suggested = 0.5

    gate = np.array([sports_sense(t) for t in test["tokens"]], dtype=bool)
    agree = float(((p >= 0.5) == gate).mean()) if n_test else 0.0
    return {
        "n": n, "n_train": len(train), "n_test": n_test,
        "accuracy": acc,
        "intercept": float(w[-1]),
        "weights": {c: float(v) for c, v in
                    zip(_SPORTS_FEATURES, w[:-1])},
        "pr": pr,
        "suggested_threshold": suggested,
        "gate_agreement": agree,
    }


def main(argv=None):
    """CLI: P/R curve + suggested link threshold over a fixture dir."""
    import argparse

    import ray

    from .fixtures import ensure_fixture

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="t1",
                    help="fixture scale or sf dir")
    ap.add_argument("--folds", type=int, default=8)
    args = ap.parse_args(argv)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        fd = ensure_fixture(args.input)
        pairs = labeled_pairs_with_surfaces(fd)
        pr = crossval_pair_pr(pairs, n_folds=args.folds)
        print(pr.to_string(index=False, max_rows=40))
        th = find_link_threshold(labeled_link_examples(fd))
        print(f"suggested link threshold: {th['mean']:.4f} "
              f"(per-iter: {['%.3f' % t for t in th['thresholds']]})")
        rep = sports_refit_report(sports_instances(fd))
        print(f"sports refit: n={rep['n']} acc={rep['accuracy']:.3f} "
              f"thr={rep['suggested_threshold']:.3f} "
              f"gate_agreement={rep['gate_agreement']:.3f}")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
