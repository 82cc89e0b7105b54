"""Stage B — rule-based alias canonicalization (per conversation).

Re-expresses the reference's ``identifyBestEntityStringByRules``
dispatch and its org/location/person expansions
(CorefHelperMethods.scala:194-361, 426-535) over per-conversation
named-entity lists that are built from the conversation's own extracted
mentions (replacing the Stanford-NER side files,
CorefHelperMethods.scala:66-110, with a deterministic equivalent):

- ORG acronym  -> the document org whose initials match
  (acronym expansion, CorefHelperMethods.scala:262-310);
- multi-token name that word-prefixes a document org -> that org
  (leftmost-word containment expansion, CorefHelperMethods.scala:311-361);
- PER surname  -> the document person ending in that surname
  (prefix/suffix person expansion, CorefHelperMethods.scala:510-535);
- GPE city     -> "City, State" via the gazetteer; "City, ST" ->
  "City, Fullstate" (CorefHelperMethods.scala:363-425,
  TipsterData.expandStateAbbreviation:93-108).

Runs as ``mentions.groupby("conv_id").map_groups(resolve_conv)`` — the
only shuffle key is conv_id and groups are tiny (a conversation's
mentions), so this scales linearly. Candidate NE lists are ordered by
(turn_idx, beg); the first match wins (the deterministic analog of the
reference's proximity sort, CorefHelperMethods.scala:243-260).
"""

from __future__ import annotations

import pyarrow as pa

from .gazetteer import (CITY_STATE, COUNTRIES, STATE_NAMES, STATES,
                        expand_state_abbreviation)
from .text import initials, is_acronym, normalize_name


from functools import lru_cache as _lru


@_lru(maxsize=1 << 14)
def _container_pattern_cached(surface: str):
    """Compiled 'Surface, Container' / 'Surface in Container' scanner
    (cached per worker: the unresolved-city set is tiny)."""
    import re

    esc = re.escape(surface)
    return re.compile(
        esc + r"(?:,\s*|\s+in\s+)([A-Z][A-Za-z.\-]+(?:\s[A-Z][A-Za-z.\-]+)?)")


def expand_location_from_texts(surface: str, texts) -> str:
    """M7 final location fallbacks, the raw-text analog of
    CorefHelperMethods.scala:426-509: when a bare city resolves through
    neither the gazetteer nor the document's own "City, State" location
    mentions, scan the conversation's turn texts for
    ``Surface, Container`` / ``Surface in Container`` patterns (the
    reference's n-gram candidate walk + its raw-doc regex fallback,
    collapsed into one scan over our plain-text turns), keep only
    gazetteer-valid containers, and pick the most frequent one
    (tie -> earliest occurrence, the proximity analog). Returns "" when
    nothing validates."""
    pat = _container_pattern_cached(surface)
    counts: dict[str, int] = {}
    first: dict[str, int] = {}
    k = 0
    for txt in texts:
        if surface not in txt:
            continue
        for m in pat.finditer(txt):
            cont = m.group(1).rstrip(".,")
            if len(cont) == 2 and cont.isupper():
                full = STATES.get(cont)
            elif cont in STATE_NAMES or cont in COUNTRIES:
                full = cont
            else:
                full = None
            if not full:
                continue
            counts[full] = counts.get(full, 0) + 1
            if full not in first:
                first[full] = k
            k += 1
    if not counts:
        return ""
    best = min(counts, key=lambda c: (-counts[c], first[c]))
    return f"{surface}, {best}"


def _location_fallback_candidates(surface: str, ner: str, alias: str) -> bool:
    """True when the text-scan fallback applies: a bare GPE city that
    neither the gazetteer nor the document locs expanded."""
    return (ner == "GPE" and alias == surface and ", " not in surface
            and surface not in CITY_STATE)


def _doc_lists(rows: list[dict]) -> tuple[list[str], list[str], list[str]]:
    """(pers, orgs, locs) full-form NE lists from a conversation's
    mentions, ordered by (turn_idx, beg), deduplicated keeping first."""
    ordered = sorted(rows, key=lambda r: (r["turn_idx"], r["beg"]))
    pers, orgs, locs, _ = _doc_lists_ordered(
        [(r["surface"], r["ner_type"]) for r in ordered]
    )
    return pers, orgs, locs


def _nearest(cands: list[str], positions: dict | None,
             mention_pos: int | None) -> str:
    """M10 proximity sort (CorefHelperMethods.scala:243-260): among
    matching candidates, the one closest to the mention's own position
    wins (tie -> earlier in document); without position info, document
    order (the deterministic r01 behavior) is the fallback."""
    if not cands:
        return ""
    if positions is None or mention_pos is None:
        return cands[0]
    return min(cands,
               key=lambda c: (abs(positions.get(c, 0) - mention_pos),
                              positions.get(c, 0)))


def resolve_mention(surface: str, ner_type: str, pers: list[str],
                    orgs: list[str], locs: list[str],
                    positions: dict | None = None,
                    mention_pos: int | None = None) -> tuple[str, str]:
    """-> (alias, refined ner_type) for one mention. ``positions`` maps
    candidate surface -> first document position; with ``mention_pos``
    it enables the proximity sort (M10)."""
    toks = surface.split()
    if ner_type == "ORG" and is_acronym(surface):
        target = surface.lower()
        matches = [o for o in orgs if initials(o).lower() == target]
        if matches:
            return _nearest(matches, positions, mention_pos), "ORG"
        return surface, "ORG"
    if ner_type == "GPE":
        if ", " in surface:
            return expand_state_abbreviation(surface), "GPE"
        state = CITY_STATE.get(surface)
        if state:
            return f"{surface}, {state}", "GPE"
        # M7 best-location fallback (CorefHelperMethods.scala:426-509):
        # a bare city unknown to the gazetteer expands from the
        # document's own "City, State" location mentions
        for loc in locs:
            if loc.split(",")[0].strip() == surface:
                return loc, "GPE"
        return surface, "GPE"
    if ner_type == "PER" and len(toks) == 1:
        target = surface.lower()
        matches = [
            p for p in pers
            if len(p.split()) >= 2 and p.split()[-1].lower() == target
        ]
        if matches:
            return _nearest(matches, positions, mention_pos), "PER"
        return surface, "PER"
    # multi-token PER/ORG: leftmost-word containment expansion against orgs
    if len(toks) >= 2:
        prefix = normalize_name(surface) + " "
        matches = [o for o in orgs if normalize_name(o).startswith(prefix)]
        if matches:
            return _nearest(matches, positions, mention_pos), "ORG"
    return surface, ner_type


def resolve_conv(group: pa.Table) -> pa.Table:
    """map_groups fn over groupby("conv_id"): mentions -> ALIASED rows."""
    rows = group.to_pylist()
    order = sorted(range(len(rows)),
                   key=lambda i: (rows[i]["turn_idx"], rows[i]["beg"]))
    pers, orgs, locs, positions = _doc_lists_ordered(
        [(rows[i]["surface"], rows[i]["ner_type"]) for i in order]
    )
    pos_of = {ri: j for j, ri in enumerate(order)}
    conv_texts = None
    aliases: list[str] = []
    norms: list[str] = []
    types: list[str] = []
    for i, r in enumerate(rows):
        alias, ner = resolve_mention(r["surface"], r["ner_type"], pers, orgs,
                                     locs, positions, pos_of[i])
        if (_location_fallback_candidates(r["surface"], ner, alias)
                and "context" in r):
            if conv_texts is None:
                seen_t: set[str] = set()
                conv_texts = []
                for ri in order:
                    tx = rows[ri].get("context", "")
                    if tx and tx not in seen_t:
                        seen_t.add(tx)
                        conv_texts.append(tx)
            exp = expand_location_from_texts(alias, conv_texts)
            if exp:
                alias = exp
        aliases.append(alias)
        norms.append(normalize_name(alias))
        types.append(ner)
    # keep the original column types (rebuilding from pylist would
    # re-infer e.g. int32 turn_idx as int64)
    ner_idx = group.column_names.index("ner_type")
    out = group.set_column(ner_idx, "ner_type", pa.array(types, pa.string()))
    out = out.append_column("alias", pa.array(aliases, pa.string()))
    out = out.append_column("alias_norm", pa.array(norms, pa.string()))
    return out


def doc_entities_group(group: pa.Table) -> pa.Table:
    """map_groups fn: per-conversation NE lists (DOC_ENTITIES schema) —
    the analog of the reference's namedEntities.txt prep job
    (SerializeNamedEntities.scala:51-108)."""
    rows = group.to_pylist()
    if not rows:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "pers": pa.array([], pa.list_(pa.string())),
                "orgs": pa.array([], pa.list_(pa.string())),
                "locs": pa.array([], pa.list_(pa.string())),
            }
        )
    pers, orgs, locs = _doc_lists(rows)
    return pa.table(
        {
            "conv_id": pa.array([rows[0]["conv_id"]], pa.string()),
            "pers": pa.array([pers], pa.list_(pa.string())),
            "orgs": pa.array([orgs], pa.list_(pa.string())),
            "locs": pa.array([locs], pa.list_(pa.string())),
        }
    )


def build_doc_entities(mentions_ds, **kwargs):
    """mentions -> per-conversation NE lists (DOC_ENTITIES) — the
    one-time doc_annotate prep pipeline (SURVEY.md §3.3)."""
    from .shuffle import group_map

    return group_map(mentions_ds, "conv_id", doc_entities_group, **kwargs)


def resolve_block(df):
    """Vectorized block fn over hash-partitioned conv_id: the same
    per-conversation rules as resolve_conv, but one pandas block pass
    (sorted arrays + conversation boundary slicing) instead of one Arrow
    table per group — ~100x less per-group overhead at millions of
    mentions."""
    import numpy as np
    import pandas as pd

    if len(df) == 0:
        out = df.copy()
        out["alias"] = pd.Series(dtype=str)
        out["alias_norm"] = pd.Series(dtype=str)
        return out
    df = df.sort_values(["conv_id", "turn_idx", "beg"], kind="mergesort")
    conv = df["conv_id"].to_numpy()
    surfaces = df["surface"].tolist()
    ners = df["ner_type"].tolist()
    contexts = df["context"].tolist() if "context" in df.columns else None
    bounds = np.flatnonzero(conv[1:] != conv[:-1]) + 1
    starts = np.concatenate(([0], bounds, [len(conv)]))
    out_alias: list[str] = []
    out_norm: list[str] = []
    out_ner: list[str] = []
    for s, e in zip(starts[:-1], starts[1:]):
        # rows are already in (turn_idx, beg) document order
        pers, orgs, locs, positions = _doc_lists_ordered(
            [(surfaces[i], ners[i]) for i in range(s, e)]
        )
        conv_texts = None
        for i in range(s, e):
            alias, ner = resolve_mention(surfaces[i], ners[i], pers, orgs,
                                         locs, positions, i - s)
            if (contexts is not None
                    and _location_fallback_candidates(surfaces[i], ner,
                                                      alias)):
                if conv_texts is None:
                    seen_t: set[str] = set()
                    conv_texts = []
                    for j in range(s, e):
                        tx = contexts[j]
                        if tx and tx not in seen_t:
                            seen_t.add(tx)
                            conv_texts.append(tx)
                exp = expand_location_from_texts(alias, conv_texts)
                if exp:
                    alias = exp
            out_alias.append(alias)
            out_norm.append(normalize_name(alias))
            out_ner.append(ner)
    out = df.copy()
    out["ner_type"] = out_ner
    out["alias"] = out_alias
    out["alias_norm"] = out_norm
    return out


def _doc_lists_ordered(
    pairs: list[tuple[str, str]]
) -> tuple[list[str], list[str], list[str], dict]:
    """(pers, orgs, locs, positions) from (surface, ner) pairs already
    in document order — the fast-path core of _doc_lists. ``positions``
    maps each candidate surface to its first document position (the
    proximity-sort input, M10)."""
    pers: list[str] = []
    orgs: list[str] = []
    locs: list[str] = []
    positions: dict = {}
    seen: set[str] = set()
    for j, (s, t) in enumerate(pairs):
        if s in seen:
            continue
        seen.add(s)
        positions[s] = j
        if t == "PER" and " " in s:
            pers.append(s)
        elif t == "ORG" and not is_acronym(s) and " " in s:
            orgs.append(s)
        elif t == "GPE" and ", " in s:
            loc = expand_state_abbreviation(s)
            locs.append(loc)
            positions.setdefault(loc, j)
    return pers, orgs, locs, positions


def canonicalize(mentions_ds, **kwargs):
    """Dataset wrapper: mentions -> aliased mentions. One hash exchange
    on conv_id, vectorized per-conversation resolution inside co-located
    blocks."""
    from .shuffle import group_blocks

    return group_blocks(mentions_ds, ["conv_id"], resolve_block,
                        batch_format="pandas", **kwargs)
