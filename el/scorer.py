"""Stage D — pairwise scoring actor pool.

The reference scores mention pairs with a logistic regression over
string-similarity + context features (MentionPairClassifier.scala:11-29;
feature set MentionPairFeatures.scala:111-193) and merges clusters above
an extreme cutoff 0.9999821007 (Clusterer.scala:24). We compute the same
feature family over *distinct normalized aliases* (exact-equal aliases
were already collapsed to one alias-group node by the blocking stage)
and apply fixed, repo-checked-in weights (the reference trains its LR at
startup from bundled CSVs, LinkClassifier.scala:12-26 — equally
deterministic). A pair becomes a merge edge iff score >= MERGE_CUTOFF.

Runs as ``pairs.map_batches(PairScorer, concurrency=N, batch_size=B)``:
weights, the common-surname set, and compiled helpers are actor state
(built once in __init__), per-batch work is the feature loop.
"""

from __future__ import annotations

import math

import pyarrow as pa

from .sim import is_abbreviation, jaro_winkler, name_contains, name_prefix, token_overlap
from .text import normalize_name

# Common surnames (reference resource classifier/common-surnames.txt,
# MentionPairFeatures.scala:49-54): pairs that look alike only through a
# frequent surname are down-weighted.
COMMON_SURNAMES = frozenset(
    "smith jones johnson williams brown taylor miller davis wilson moore".split()
)

# Fixed weights (deterministic; calibrated on the t2 fixture offline).
# The Jaro-Winkler margin is the dominant signal; the boolean
# prefix/abbreviation features act as score FLOORS (the reference's
# boolean pair features are near-decisive under its extreme merge
# cutoff): base = max(W_JW*(jw - JW_PIVOT), 6 if prefix2, 6 if abbr),
# then small context corrections and the common-surname penalty.
W_JW = 60.0
JW_PIVOT = 0.935
BOOL_FLOOR = 6.0
W_JWS = 1.0
W_OVL = 0.5
W_COMMON = 2.0

MERGE_CUTOFF = 0.5  # on the sigmoid score (our analog of Clusterer.scala:24)


def _jaro_upper_bound(len1: int, len2: int) -> float:
    """max possible Jaro for these lengths (all of the shorter string
    matches, zero transpositions) — a cheap skip filter before the
    O(n*m) kernel."""
    if len1 == 0 or len2 == 0:
        return 0.0
    m = min(len1, len2)
    return (m / len1 + m / len2 + 1.0) / 3.0


def pair_features(alias1: str, alias2: str, surface1: str, surface2: str) -> dict:
    n1, n2 = normalize_name(alias1), normalize_name(alias2)
    s1, s2 = normalize_name(surface1), normalize_name(surface2)
    t1, t2 = n1.split(), n2.split()
    prefix2 = bool(name_prefix(n1, n2) and min(len(t1), len(t2)) >= 2)
    contains = name_contains(n1, n2)
    abbr = is_abbreviation(n1.replace(" ", ""), n2) or is_abbreviation(
        n2.replace(" ", ""), n1
    )
    # length-bound prefilter: when even a perfect character alignment
    # cannot clear the merge region and no boolean floor applies, skip
    # the quadratic kernel (the bound itself is the upper estimate)
    bound = _jaro_upper_bound(len(n1), len(n2))
    if bound < 0.82 and not (prefix2 or abbr):
        jw = bound
    else:
        jw = jaro_winkler(n1, n2)
    # surfaces usually equal the aliases after canonicalization: reuse
    if s1 == n1 and s2 == n2:
        jws = jw
    elif _jaro_upper_bound(len(s1), len(s2)) < 0.82:
        jws = _jaro_upper_bound(len(s1), len(s2))
    else:
        jws = jaro_winkler(s1, s2)
    ovl = token_overlap(n1, n2)
    common = bool(
        t1 and t2 and t1[-1] == t2[-1] and t1[-1] in COMMON_SURNAMES
    )
    return {
        "jw_alias": jw,
        "jw_surface": jws,
        "prefix2": prefix2,
        "contains": contains,
        "abbr": abbr,
        "tok_overlap": ovl,
        "common_surname": common,
    }


def pair_score(f: dict) -> float:
    base = W_JW * (f["jw_alias"] - JW_PIVOT)
    if f["prefix2"] or f["abbr"]:
        base = max(base, BOOL_FLOOR)
    z = (
        base
        + W_JWS * (f["jw_surface"] - f["jw_alias"])
        + W_OVL * (f["tok_overlap"] - 0.5)
        - W_COMMON * f["common_surname"]
    )
    return 1.0 / (1.0 + math.exp(-z))


def score_pairs_batch(batch: pa.Table) -> pa.Table:
    a1 = batch.column("alias1").to_pylist()
    a2 = batch.column("alias2").to_pylist()
    s1 = batch.column("surface1").to_pylist()
    s2 = batch.column("surface2").to_pylist()
    scores = []
    jw_col = []
    for x1, x2, y1, y2 in zip(a1, a2, s1, s2):
        f = pair_features(x1, x2, y1, y2)
        scores.append(pair_score(f))
        jw_col.append(f["jw_alias"])
    out = batch.append_column("jw_alias", pa.array(jw_col, pa.float64()))
    return out.append_column("score", pa.array(scores, pa.float64()))


class PairScorer:
    """Actor-pool callable (map_batches(PairScorer, concurrency=N)).

    State held per actor: weights + surname set (module constants here,
    mirroring the reference's once-per-process classifier singletons,
    MentionPairClassifier.scala:28).
    """

    def __init__(self) -> None:
        self.cutoff = MERGE_CUTOFF

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_pairs_batch(batch)


def score_pairs(pairs_ds, concurrency: int = 4, batch_size: int = 8192):
    return pairs_ds.map_batches(
        PairScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
