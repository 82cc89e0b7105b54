"""Sports-sense disambiguation (optional, flag-gated like the
reference's --sportsClassify).

Re-expresses the reference's sports path without its trained NB/LR
models (SportsSenseLabeller.scala:15-49, threshold 0.15;
SportsHelperMethods.scala:8-56; the linkQuery override
RunKBPEntityLinkerSystem.scala:131-147) as deterministic rules:

- a mention is a sports CANDIDATE iff its name is a gazetteer location
  and its NER type is not PERSON (SportsSenseLabeller.scala:38-49);
- sports SENSE holds iff the mention's context hits sports marker terms
  (the lexical analog of the NB over context tokens);
- when a sports-sense mention resolved to a location entity, re-rank its
  KB candidates for a team-typed entry (wiki_type == "team") whose title
  contains the location name; confidence 0.7 on success, NIL 0.5
  otherwise (RunKBPEntityLinkerSystem.scala:131-147).
"""

from __future__ import annotations

from .gazetteer import CITIES, STATE_NAMES
from .kb import KBIndex
from .linkdecide import candidates_for
from .text import normalize_name

SPORTS_MARKERS = frozenset(
    """team coach season league game match playoff playoffs win loss score
    stadium roster franchise draft trade tournament championship""".split()
)
SPORTS_THRESHOLD = 0.15  # fraction of context tokens (SportsSenseLabeller.scala:17)


def is_sports_candidate(surface: str, ner_type: str) -> bool:
    """name in gazetteer AND NER != PERSON (SportsSenseLabeller.scala:38-49)."""
    toks = surface.split()
    loc = surface in CITIES or surface in STATE_NAMES or (
        toks and toks[0] in CITIES
    )
    return loc and ner_type != "PER"


def sports_sense(context_tokens: list[str]) -> bool:
    """Marker-ratio gate (NB-score analog, threshold 0.15)."""
    if not context_tokens:
        return False
    hits = sum(1 for t in context_tokens if t in SPORTS_MARKERS)
    return hits / len(context_tokens) >= SPORTS_THRESHOLD


def location_variance(locs: list[str]) -> float:
    """Unique/total ratio over a document's location mentions — the A5
    location-variance feature (SportsSenseFeatures.scala:128-201):
    sports coverage repeats few venues (low variance), travelogues many
    (high). Exposed in the sports feature set; 0.0 for no locations."""
    if not locs:
        return 0.0
    return len(set(locs)) / len(locs)


def org_location_ratio(orgs: list[str], locs: list[str]) -> float:
    """orgs-with-location share of a document's ORG+LOC mentions (the
    companion A5 ratio, SportsSenseFeatures.scala:128-201)."""
    total = len(orgs) + len(locs)
    return len(orgs) / total if total else 0.0


def team_rerank(alias_norm: str, kb: KBIndex) -> tuple[str, float] | None:
    """Re-rank candidates for a team-typed KB entry carrying the
    location name; -> (kb_id, confidence 0.7) or None (-> NIL 0.5).
    The location alias arrives gazetteer-expanded ("austin texas"), so
    the city is its first token; the reference's substring scan over
    wikiMap (SportsHelperMethods.scala:8-34) becomes a lookup in the
    first-token title index (deterministic: min kb_id wins)."""
    for kb_id, _score in candidates_for(alias_norm, kb) or []:
        if kb.wiki_type_of_id.get(kb_id) == "team":
            return kb_id, 0.7
    toks = normalize_name(alias_norm).split(",")[0].strip().split()
    if not toks:
        return None
    city = toks[0]
    best = None
    for norm, kb_id in kb.by_first_token.get(city, []):
        if kb.wiki_type_of_id.get(kb_id) == "team" and norm.startswith(city):
            if best is None or kb_id < best:
                best = kb_id
    return (best, 0.7) if best else None
