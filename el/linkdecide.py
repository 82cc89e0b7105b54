"""Stage E — per-alias KB link decision (the linkQuery decision tree).

Re-expresses RunKBPEntityLinkerSystem.linkQuery
(RunKBPEntityLinkerSystem.scala:56-158) as a pure function over one
normalized alias against the broadcast KB index:

 1. best candidate from exact-title / exact-alias / fuzzy first-token
    lookup (the EntityLinker analog, RunKBPEntityLinkerSystem.scala:44-49);
 2. accept if the combined score > LINK_THRESHOLD = 0.93
    (RunKBPEntityLinkerSystem.scala:29, 69), confidence via the
    piecewise-linear calibration (ConfidenceHelper.scala:6-16);
 3. else exact KB-title lookup fallback, confidence 0.8
    (RunKBPEntityLinkerSystem.scala:74-79);
 4. else back-off word n-grams of the alias re-linked exactly, keep the
    max-scoring backoff (RunKBPEntityLinkerSystem.scala:83-108;
    n-gram generator GeneralHelperMethods.scala:13-29);
 5. else NIL, confidence 0.55 (RunKBPEntityLinkerSystem.scala:109-113);
    any per-row exception degrades to NIL confidence 0.10
    (RunKBPEntityLinkerSystem.scala:152-157).

The decision is context-free given the canonicalized alias, so it runs
per DISTINCT alias (not per mention) — mentions inherit their alias's
decision. This collapses the dominant cost at transcript scale.

Runs as an actor pool: ``aliases.map_batches(CandidateLinker,
fn_constructor_args=(kb_ref,), concurrency=N)``; the KB index is
fetched from the object store once per actor.
"""

from __future__ import annotations

import pyarrow as pa

from .kb import KBIndex
from .sim import jaro_winkler

LINK_THRESHOLD = 0.93  # RunKBPEntityLinkerSystem.scala:29
CONF_FLOOR = 0.55
CONF_ERROR = 0.10
AMB_CONF = 0.8        # doc-sim-resolved ambiguous alias (exact-lookup parity)
SPORTS_CONF = 0.7     # team override, RunKBPEntityLinkerSystem.scala:131-147
SPORTS_NIL_CONF = 0.5  # sports sense but no team entry (same span)


def calibrate_confidence(score: float, threshold: float = LINK_THRESHOLD) -> float:
    """Piecewise-linear calibration (ConfidenceHelper.scala:6-16):
    score > threshold maps linearly into [0.8, 1.0], else 0.55."""
    if score > threshold:
        return 0.8 + 0.2 * (score - threshold) / (1.0 - threshold)
    return CONF_FLOOR


def candidates_for(alias_norm: str, kb: KBIndex) -> list[tuple[str, float]]:
    """(kb_id, candidate score) list — exact title 1.0, exact curated
    alias 0.99 (a KB-recorded variant must outrank any fuzzy similarity
    to a different entry), fuzzy Jaro-Winkler among titles sharing the
    first token (each candidate keeps the max over its sources)."""
    out: dict[str, float] = {}
    kb_id = kb.id_of_title_norm.get(alias_norm)
    if kb_id:
        out[kb_id] = 1.0
    for cid in kb.ids_of_alias_norm.get(alias_norm, []):
        out[cid] = max(out.get(cid, 0.0), 0.99)
    toks = alias_norm.split()
    if toks:
        for norm, cid in kb.by_first_token.get(toks[0], []):
            jw = jaro_winkler(alias_norm, norm)
            if jw >= 0.90:
                out[cid] = max(out.get(cid, 0.0), jw)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


def _ngrams(tokens: list[str], min_len: int = 2) -> list[str]:
    """Word n-grams, longest first (GeneralHelperMethods.scala:13-29)."""
    out = []
    n = len(tokens)
    for ln in range(n - 1, min_len - 1, -1):
        for i in range(n - ln + 1):
            out.append(" ".join(tokens[i : i + ln]))
    return out


def _decide(alias_norm: str, kb: KBIndex,
            cands: list[tuple[str, float]]) -> tuple[str, float, float]:
    """Decision-tree steps 2-7 and 9 given the scored candidate list
    (shared by the scalar and the vectorized batch paths)."""
    try:
        if cands:
            kb_id, score = cands[0]
            if score > LINK_THRESHOLD:
                return kb_id, score, calibrate_confidence(score)
        # exact-title fallback (subsumed by candidates but kept for parity)
        kb_id = kb.id_of_title_norm.get(alias_norm)
        if kb_id:
            return kb_id, 1.0, 0.8
        # back-off n-gram exact re-linking
        toks = alias_norm.split()
        if len(toks) > 2:
            best: tuple[str, float] | None = None
            for ng in _ngrams(toks):
                cid = kb.id_of_title_norm.get(ng)
                if cid:
                    s = 0.9 * len(ng.split()) / len(toks)
                    if best is None or s > best[1]:
                        best = (cid, s)
            if best and best[1] > 0.6:
                return best[0], best[1], 0.7
        return "", 0.0, CONF_FLOOR
    except Exception:
        return "", 0.0, CONF_ERROR  # poison row degrades, never fails


def link_alias(alias_norm: str, kb: KBIndex) -> tuple[str, float, float]:
    """-> (kb_id or "", link score, confidence)."""
    try:
        return _decide(alias_norm, kb, candidates_for(alias_norm, kb))
    except Exception:
        return "", 0.0, CONF_ERROR


def _fuzzy_scores(aliases: list[str], kb: KBIndex) -> dict:
    """alias -> [(kb_id, jw)] over first-token bucket candidates with
    jw >= 0.90, computed as ONE DuckDB kernel pass (the per-alias Python
    jw scan measured ~1ms/alias — the whole link stage's cost)."""
    import numpy as np

    la, ln, lid = [], [], []
    for a in aliases:
        toks = a.split()
        if not toks:
            continue
        for norm, cid in kb.by_first_token.get(toks[0], []):
            la.append(a)
            ln.append(norm)
            lid.append(cid)
    if not la:
        return {}
    from .scorer import _duck

    con = _duck()
    t = pa.table({"a": pa.array(la, pa.string()),
                  "n": pa.array(ln, pa.string()),
                  "i": pa.array(np.arange(len(la), dtype=np.int64))})
    con.register("fz", t)
    jw = con.execute(
        "SELECT jaro_winkler_similarity(a, n) AS s FROM fz ORDER BY i"
    ).arrow().column("s").to_pylist()
    con.unregister("fz")
    out: dict = {}
    for a, cid, s in zip(la, lid, jw):
        if s >= 0.90:
            out.setdefault(a, []).append((cid, s))
    return out


def _candidates_prefuzzed(alias_norm: str, kb: KBIndex,
                          fuzzy: dict) -> list[tuple[str, float]]:
    """candidates_for with the fuzzy scores precomputed (bit-equal)."""
    out: dict[str, float] = {}
    kb_id = kb.id_of_title_norm.get(alias_norm)
    if kb_id:
        out[kb_id] = 1.0
    for cid in kb.ids_of_alias_norm.get(alias_norm, []):
        out[cid] = max(out.get(cid, 0.0), 0.99)
    for cid, s in fuzzy.get(alias_norm, []):
        out[cid] = max(out.get(cid, 0.0), s)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


def link_group_keys_batch(keys: list[str], kb: KBIndex) -> list[tuple]:
    """Vectorized link decisions for a batch of contraction nodes —
    the fuzzy jw scan is one DuckDB pass; everything else is dict
    lookups. Parity with link_group_key is a pytest."""
    from .overrides import KIND_AMBIGUOUS, KIND_SPORTS, parse_group_key

    parsed = [parse_group_key(k) for k in keys]
    plain = sorted({a for a, kind, _ in parsed if not kind})
    fuzzy = _fuzzy_scores(plain, kb)
    out = []
    for alias, kind, kb_id in parsed:
        if kind == KIND_AMBIGUOUS:
            out.append((kb_id, 0.99, AMB_CONF))
        elif kind == KIND_SPORTS:
            out.append((kb_id, 0.95, SPORTS_CONF) if kb_id
                       else ("", 0.0, SPORTS_NIL_CONF))
        else:
            try:
                out.append(_decide(alias, kb,
                                   _candidates_prefuzzed(alias, kb, fuzzy)))
            except Exception:
                out.append(("", 0.0, CONF_ERROR))
    return out


def link_group_key(group_key: str, kb: KBIndex) -> tuple[str, float, float]:
    """Link decision for one contraction node: a plain alias goes
    through the decision tree; an override subkey (el.overrides) carries
    its context-resolved choice — ambiguous alias (doc-sim, conf 0.8),
    sports team (conf 0.7), sports NIL (conf 0.5)."""
    from .overrides import KIND_AMBIGUOUS, KIND_SPORTS, parse_group_key

    alias, kind, kb_id = parse_group_key(group_key)
    if kind == KIND_AMBIGUOUS:
        return kb_id, 0.99, AMB_CONF
    if kind == KIND_SPORTS:
        if kb_id:
            return kb_id, 0.95, SPORTS_CONF
        return "", 0.0, SPORTS_NIL_CONF
    return link_alias(alias, kb)


class CandidateLinker:
    """Actor-pool callable over DISTINCT contraction nodes.

    Input batch columns: group_key (falls back to alias_norm) plus
    pass-through. Output adds kb_id, link_score, link_conf.
    """

    def __init__(self, kb_ref=None, kb_index: KBIndex | None = None):
        if kb_index is not None:
            self.kb = kb_index
        else:
            import ray

            self.kb = ray.get(kb_ref)  # once per actor, from object store

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = ("group_key" if "group_key" in batch.column_names
               else "alias_norm")
        keys = batch.column(col).to_pylist()
        rows = link_group_keys_batch(keys, self.kb)
        return (
            batch.append_column(
                "kb_id", pa.array([r[0] for r in rows], pa.string()))
            .append_column(
                "link_score", pa.array([r[1] for r in rows], pa.float64()))
            .append_column(
                "link_conf", pa.array([r[2] for r in rows], pa.float64()))
        )


def link_aliases(alias_ds, kb_ref, concurrency: int = 4, batch_size: int = 4096):
    return alias_ds.map_batches(
        CandidateLinker,
        fn_constructor_args=(kb_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
