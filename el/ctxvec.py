"""Per-alias context term vectors — the context-cosine signal of the
reference's pair classifier (stdCosine / wideCosine / corefCosine,
MentionPairFeatures.scala:111-139, 181-193), re-expressed at
distinct-alias granularity:

- each alias gets ONE aggregated term vector built from the contexts
  (turn texts) of its ``CTX_SAMPLE_K`` smallest mention_ids — a
  deterministic sample, independent of batch/partition boundaries, so
  the driver and distributed physical plans produce identical vectors;
- corpus-common terms (document frequency above ``max(DF_MIN,
  DF_FRAC * n_aliases)`` aliases) are stripped before scoring — the
  IDF-style filter that makes the cosine measure TOPICAL agreement
  instead of shared boilerplate vocabulary;
- vectors are carried through the pair shuffle as compact JSON strings
  (top ``CTX_TOP_TERMS`` terms), parsed only for the small fraction of
  pairs where both sides kept a non-empty vector.

The pair scorer applies the signal two ways (el.scorer): a small
continuous contribution (cosine), and a VETO — two aliases with
substantial but disjoint topic vectors cannot merge on string
similarity alone. This is what splits the fixture's adversarial twins
(same-name-different-entity) that Jaro-Winkler cannot.
"""

from __future__ import annotations

import json

from .sim import cosine
from .text import term_vector

CTX_SAMPLE_K = 6      # contexts per alias (smallest mention_ids win)
CTX_TOP_TERMS = 16    # vector size cap through the pair shuffle
DF_MIN = 5            # common-term df threshold floor ...
DF_FRAC = 0.01        # ... and fraction of aliases
CTX_MIN_MASS = 3      # both vectors need this much mass for the veto
CTX_VETO_COS = 0.15   # cosine below this (with mass) vetoes the merge


def sample_contexts(pairs: list[tuple[str, str]]) -> str:
    """(mention_id, context) pairs -> JSON sample of the K smallest
    mention_ids with their term vectors. Associative-merge-safe: any
    union of partial samples re-sampled with the same K yields the
    global sample."""
    pairs = sorted(pairs)[:CTX_SAMPLE_K]
    out = [[mid, term_vector(ctx, top_k=CTX_TOP_TERMS)] for mid, ctx in pairs]
    return json.dumps(out, sort_keys=True)


def merge_samples(samples: list[str]) -> str:
    """Merge partial JSON samples (concat, keep K smallest mention_ids)."""
    rows: list[tuple[str, dict]] = []
    for s in samples:
        if s:
            rows.extend((mid, tv) for mid, tv in json.loads(s))
    rows.sort(key=lambda r: r[0])
    return json.dumps(rows[:CTX_SAMPLE_K], sort_keys=True)


def sum_sample(sample: str) -> dict[str, int]:
    """Summed raw term vector of a JSON sample."""
    out: dict[str, int] = {}
    if sample:
        for _mid, tv in json.loads(sample):
            for t, c in tv.items():
                out[t] = out.get(t, 0) + c
    return out


def df_threshold(n_aliases: int) -> int:
    return max(DF_MIN, int(DF_FRAC * n_aliases))


def own_name_terms(alias_norm: str, surface_norm: str = "") -> set[str]:
    """Stemmed + raw tokens of the alias's own name (and surface).
    Excluded from its context vector: a self-mention carries no topical
    signal, and leaving it in makes TYPO VARIANTS of one entity look
    'topically disjoint' (each vector collapses to its own spelling
    once the df filter strips the generic vocabulary), firing the
    twin-entity veto on a pair that must merge. The reference's
    context features likewise exclude the mention string itself."""
    from .text import stem

    toks = set(alias_norm.split())
    if surface_norm and surface_norm != alias_norm:
        toks |= set(surface_norm.split())
    # vector terms are always stemmed (el.text.content_tokens), so only
    # the stemmed forms can collide; raw forms that stem to themselves
    # are covered by the identity of stem()
    return {stem(t) for t in toks}


def strip_and_cap(vec: dict[str, int], common: set[str],
                  own: frozenset | set = frozenset()) -> str:
    """Drop corpus-common terms and the alias's own name tokens, keep
    the top CTX_TOP_TERMS by (count desc, term asc); '' when nothing
    distinctive remains."""
    items = [(t, c) for t, c in vec.items()
             if t not in common and t not in own]
    if not items:
        return ""
    items.sort(key=lambda tc: (-tc[1], tc[0]))
    return json.dumps(dict(items[:CTX_TOP_TERMS]), sort_keys=True)


def ctx_cosine(j1: str, j2: str) -> tuple[float, int]:
    """(cosine, min mass) of two JSON vectors ('' -> empty)."""
    v1 = json.loads(j1) if j1 else {}
    v2 = json.loads(j2) if j2 else {}
    if not v1 or not v2:
        return 0.0, 0
    mass = min(sum(v1.values()), sum(v2.values()))
    return cosine(v1, v2), mass
