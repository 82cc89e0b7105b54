"""Evaluation metrics: pairwise F1 (the judged north-rule metric), B³,
and the per-query category report.

Mirrors Benchmarker.scala: B³ precision/recall/F1 (:39-77, 130-135),
category counts CORRECT / WRONG KB ID / EXP KB ID / EXP NIL /
WRONG NIL ID / NIL OK (:94-128), over-clustering counter (:30-34).
All driver-side over small collected tables (the eval sets are tiny
relative to the corpus).
"""

from __future__ import annotations

from collections import defaultdict


def pairwise_f1(cluster_of: dict[str, str], gold_pairs) -> dict:
    """Pairwise precision/recall/F1 on labeled same-block pairs
    (BASELINE.json "metric"). ``gold_pairs``: pyarrow Table or pandas
    with m1_id, m2_id, same_entity. A pair is predicted-same iff both
    mentions carry the same final cluster id."""
    m1 = gold_pairs["m1_id"].to_pylist() if hasattr(gold_pairs["m1_id"], "to_pylist") else list(gold_pairs["m1_id"])
    m2 = gold_pairs["m2_id"].to_pylist() if hasattr(gold_pairs["m2_id"], "to_pylist") else list(gold_pairs["m2_id"])
    same = gold_pairs["same_entity"].to_pylist() if hasattr(gold_pairs["same_entity"], "to_pylist") else list(gold_pairs["same_entity"])
    tp = fp = fn = tn = 0
    for a, b, s in zip(m1, m2, same):
        ca, cb = cluster_of.get(a), cluster_of.get(b)
        pred = ca is not None and ca == cb
        if pred and s:
            tp += 1
        elif pred and not s:
            fp += 1
        elif not pred and s:
            fn += 1
        else:
            tn += 1
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn, "tn": tn}


def b_cubed(cluster_of: dict[str, str], gold_of: dict[str, str]) -> dict:
    """B³ P/R/F1 (Benchmarker.scala:39-77): per mention, the fraction of
    its predicted-cluster partners sharing its gold cluster (precision)
    and of its gold-cluster partners sharing its predicted cluster
    (recall), averaged."""
    by_pred: dict[str, list[str]] = defaultdict(list)
    by_gold: dict[str, list[str]] = defaultdict(list)
    for m in gold_of:
        if m in cluster_of:
            by_pred[cluster_of[m]].append(m)
            by_gold[gold_of[m]].append(m)
    ps, rs = [], []
    for m, g in gold_of.items():
        c = cluster_of.get(m)
        if c is None:
            continue
        pred_members = by_pred[c]
        gold_members = by_gold[g]
        ps.append(sum(1 for x in pred_members if gold_of.get(x) == g) / len(pred_members))
        rs.append(sum(1 for x in gold_members if cluster_of.get(x) == c) / len(gold_members))
    p = sum(ps) / len(ps) if ps else 0.0
    r = sum(rs) / len(rs) if rs else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "n": len(ps)}


def pr_curve(scores: list[float], labels: list[bool], n_points: int = 20) -> list[dict]:
    """Ranked precision/recall points over descending score (the eval
    harness pattern of LinkClassifierTest.scala:51, 131 /
    MentionPairClassifierTest.scala:89). Driver-side, small eval sets."""
    order = sorted(range(len(scores)), key=lambda i: (-scores[i], i))
    total_pos = sum(labels) or 1
    out = []
    tp = 0
    step = max(1, len(order) // n_points)
    for rank, i in enumerate(order, 1):
        tp += bool(labels[i])
        if rank % step == 0 or rank == len(order):
            out.append({
                "threshold": scores[i],
                "precision": tp / rank,
                "recall": tp / total_pos,
                "rank": rank,
            })
    return out


def over_clustering(cluster_of: dict[str, str], gold_of: dict[str, str]) -> int:
    """Number of system clusters containing mentions of more than one
    gold entity (Benchmarker.scala:30-34)."""
    gold_sets: dict[str, set[str]] = defaultdict(set)
    for m, c in cluster_of.items():
        g = gold_of.get(m)
        if g is not None:
            gold_sets[c].add(g)
    return sum(1 for s in gold_sets.values() if len(s) > 1)


def nil_statistics(kb_link_of: dict[str, str]) -> dict:
    """NIL-side summary (ExpNilStatistics.scala:8-59 analog): counts of
    linked vs NIL answers and NIL cluster sizes."""
    sizes: dict[str, int] = defaultdict(int)
    linked = 0
    for link in kb_link_of.values():
        if link.startswith("E"):
            linked += 1
        else:
            sizes[link] += 1
    dist = defaultdict(int)
    for n in sizes.values():
        dist[n] += 1
    return {
        "linked": linked,
        "nil": sum(sizes.values()),
        "nil_clusters": len(sizes),
        "nil_cluster_size_hist": dict(sorted(dist.items())),
    }


def category_of(sys_link: str, gold: str) -> str:
    """Single-mention benchmark category (Benchmarker.scala:94-128):
    CORRECT / WRONG KB ID when both sides link; EXP KB ID when the
    system said NIL but gold had a KB entry; EXP NIL when the system
    linked a gold-NIL query; NIL OK on NIL agreement."""
    sys_nil = not sys_link.startswith("E")
    gold_nil = not gold.startswith("E")
    if not sys_nil and not gold_nil:
        return "CORRECT" if sys_link == gold else "WRONG KB ID"
    if sys_nil and not gold_nil:
        return "EXP KB ID"
    if not sys_nil and gold_nil:
        return "EXP NIL"
    return "NIL OK"  # cluster ids judged by B3, not here


def category_report(kb_link_of: dict[str, str], gold_of: dict[str, str]) -> dict:
    """Per-query category counts (Benchmarker.scala:94-128)."""
    counts = defaultdict(int)
    for m, gold in gold_of.items():
        counts[category_of(kb_link_of.get(m, ""), gold)] += 1
    return dict(counts)


def sliced_category_report(kb_link_of: dict[str, str],
                           gold_of: dict[str, str],
                           slice_of: dict[str, str]) -> dict:
    """Category counts per SLICE value — the Benchmarker's per-genre /
    per-web analysis axis (the reference gold carries genre and web
    columns next to each query id; Benchmarker.scala's output is
    grepped per slice). Keys ``{slice}:{category}``; zero cells
    omitted (defaultdict semantics, like :func:`category_report`)."""
    counts = defaultdict(int)
    for m, gold in gold_of.items():
        s = slice_of.get(m, "")
        counts[f"{s}:{category_of(kb_link_of.get(m, ''), gold)}"] += 1
    return dict(counts)


def shared_ne_crosstab(items) -> dict:
    """ExpNilStatistics.scala:8-59 analog: per KB-linked answer
    category, how many answers' linked entity shares a named entity
    with the query conversation. ``items``: iterable of
    (category, shares_ne: bool) — assembled by the caller, which owns
    the KB named-entity index and the per-conversation name sets
    (only "interesting" answers, link title != query name, are fed
    in, matching the reference's filter). Returns
    {category: {"total": n, "shared": k}}."""
    out: dict[str, dict[str, int]] = {}
    for cat, shares in items:
        d = out.setdefault(cat, {"total": 0, "shared": 0})
        d["total"] += 1
        if shares:
            d["shared"] += 1
    return out
