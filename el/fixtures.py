"""Deterministic synthetic fixture generator (FIXTURES.md).

Produces, for a (seed, scale), byte-stable Parquet tables under an
output directory:

  transcripts.parquet   — the primary input, exactly the input_hint shape
                          (conv_id, turn_idx, role, text, tool, ts)
  kb.parquet            — knowledge-base side table (el.schemas.KB)
  gold_mentions.parquet — labeled mentions; invariant
                          transcripts.text[beg:end] == surface
  gold_pairs.parquet    — labeled same-block mention pairs (the judged
                          pairwise-F1 metric, BASELINE.json "metric")

Design guarantees the generator enforces (so the pipeline's rule-based
stages are well-posed, mirroring the reference's assumptions):
- turn text is all-lowercase filler except injected mention surfaces,
  so capitalized-span extraction is exact (the reference receives gold
  mention spans from query XML, KBPQuery.scala:91-142; we extract);
- within one conversation, an entity's FIRST mention uses its canonical
  name, so surname/acronym/prefix aliases are expandable from document
  context (the reference's coref-based alias expansion assumption,
  CorefHelperMethods.scala:194-361);
- no two entities in the same conversation share a conflict key
  (surname / org 2-word prefix / city), so expansion is unambiguous;
- org 2-word prefixes are globally unique; canonical names are
  pairwise separated by Jaro-Winkler < 0.92 while misspelling aliases
  stay >= 0.95 from their canonical (so one global merge threshold
  separates them);
- one hot alias (entities[0]) appears in >~6% of conversations and >=3
  PER entities share the surname "Smith" (hot-key stressors; the
  reference's own hot-key acknowledgment is common-surnames.txt,
  MentionPairFeatures.scala:49-54).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import gazetteer
from .blocking import surface_block_keys
from .sim import jaro_winkler
from .text import initials, normalize_name

FIXTURE_VERSION = 11  # v11: bounded 65k-row parquet row groups (layout
# only — row content identical to v10)

# (n_conversations, n_entities, min_turns, max_turns, max_gold_pairs_per_key)
SCALES: dict[str, tuple[int, int, int, int, int]] = {
    "t1": (200, 60, 8, 20, 5000),
    "t2": (2000, 300, 8, 40, 5000),
    "bench": (50000, 2000, 8, 40, 2000),
    # compute-dominant scale for the two-parallelism scaling runs
    "bench8": (400000, 5000, 8, 40, 1000),
    # 4x bench8 corpus over the SAME entity set (the contracted graph —
    # and so the driver-side fixed cost — stays constant while the
    # parallel mention work quadruples): the strong-scaling arm where
    # per-run overhead amortizes (one-time generation, cached)
    "bench32": (1600000, 5000, 8, 40, 1000),
}
SCALE_OF_SF = {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench"}

FIRST_NAMES = """Janet Robert Maria Elena Viktor Tomas Ingrid Marcus Felipe
Amara Kenji Lucia Piotr Salma Derek Yusuf Greta Haruto Bianca Omar Celine
Dmitri Farah Gustav Imani Jorge Katya Liam Noor Priya Quentin Rosa Stefan
Talia Umar Vera Wendell Ximena Yara Zoltan Astrid Bruno Carmen Dario
Esme Flavio Gwen Hector Isla Jasper Keira Lorenzo Mireille Nadia Otto
Paloma Quinn Renata Soren Thea""".split()

SURNAMES = """Smith Harper Vance Okafor Lindqvist Moreau Castellano Bergstrom
Whitfield Nakamura Oyelaran Petrov Delacroix Hargrove Winterbourne Ashford
Caldwell Redmond Sinclair Thackeray Vasquez Holloway Mercer Pemberton
Kowalski Lindgren Moretti Navarro Okonkwo Prescott Quimby Rutherford
Stanfield Torvalds Underhill Villanueva Wexford Yamamoto Zielinski Abernathy
Blackwood Carmichael Dunmore Ellsworth Fairbanks Galloway Hathaway Ironside
Jennings Kensington Lockhart Middleton Northgate Oakhurst Pennington
Quicksilver Ravenwood Southwick Thornbury Westerfield""".split()

ORG_ADJS = """United Western Northern Global Pacific Atlantic Central Royal
Summit Pioneer Sterling Harbor Cascade Meridian Liberty Granite Beacon
Crescent Vanguard Frontier Keystone Horizon Evergreen Redwood Silverline
Ironbridge Bluewater Stonegate Brightfield Clearview Eastwood Southport
Northfield Westbrook Highland Lakeside Riverton Oakmont Pinecrest Maplewood
Cedarburg Ashgrove Birchwood Elmhurst Foxglove Greenfield Hollybrook""".split()

ORG_NOUNS = """Commerce Rail Energy Timber Shipping Textile Mining Grain
Telecom Finance Logistics Science Medical Housing Transit Water Steel
Agriculture Fisheries Broadcasting Insurance Robotics Aviation Publishing
Ceramics Forestry Optics Dairy Salvage Cartography Plastics Chemicals
Electronics Software Biotech Minerals Paper Glassworks Furniture Printing
Recycling Storage Freight Harvest""".split()

ORG_SUFFIXES = """Council Group Institute Authority Commission Alliance
Consortium Federation""".split()
ORG_SUFFIX_SET = frozenset(s.lower() for s in ORG_SUFFIXES)

FILLER = """the meeting moved on to discuss quarterly revenue and the open
items from last week we agreed that the draft needs another pass before
review please update the tracking sheet with current numbers and send a
summary when done there was a long discussion about timelines budget and
staffing for the next phase nothing was decided yet so we will revisit after
the holidays can you pull the latest figures from the report and check the
assumptions again the vendor call went well and the contract language is
almost final just two clauses remain""".split()

DISTRACTOR_WORDS = ["Fund", "North", "Center", "Review"]

# lowercase sports markers injected into sports-mode turns (subset of
# el.sports.SPORTS_MARKERS; enough for a marker ratio >= 0.15)
SPORTS_FILLER = ["team", "coach", "season", "playoff", "stadium"]


@dataclass
class Entity:
    idx: int
    etype: str  # PER | ORG | GPE
    canonical: str
    aliases: list[str] = field(default_factory=list)
    conflict_key: str = ""
    in_kb: bool = False
    kb_id: str = ""
    # v9 adversarial knobs: per-entity context topic words (lowercase
    # synthetic tokens injected into every turn that mentions the
    # entity); no_kb forces NIL (twins must be split by CONTEXT, not by
    # the KB constraint); force_kb guarantees KB membership (ambiguity /
    # sports cases need both candidates in the KB)
    topics: list[str] = field(default_factory=list)
    no_kb: bool = False
    force_kb: bool = False
    # ambiguity: a curated alias shared with ANOTHER KB entity — convs
    # may mention the entity ONLY via this alias (doc-sim must resolve)
    shared_alias: str = ""
    # NE-overlap: idx of a companion entity co-mentioned in shared-alias
    # convs and listed in this entity's KB named_entities
    ne_companion: int = -1
    # sports: team entity mentioned via its bare city name in
    # sports-marker contexts
    is_team: bool = False
    sports_city: str = ""
    wiki: str = ""  # explicit wiki_type override ("team")

    @property
    def gold_id(self) -> str:
        return self.kb_id if self.in_kb else f"NIL{self.idx:05d}"


def topic_words(idx: int, k: int = 3) -> list[str]:
    """Deterministic lowercase topic tokens unique to one entity (never
    capitalized, so extraction offsets are unaffected; no trailing 's',
    so stemming leaves them alone)."""
    return [f"zt{idx}x{j}" for j in range(k)]


def _misspell(name: str, rng: np.random.Generator) -> str | None:
    words = name.split()
    cands = [i for i, w in enumerate(words)
             if len(w) >= 6 and w[0].isupper() and w.isalpha()]
    if not cands:
        return None
    wi = cands[int(rng.integers(0, len(cands)))]
    w = words[wi]
    pos = int(rng.integers(2, len(w) - 1))
    words[wi] = w[:pos] + w[pos + 1:]
    m = " ".join(words)
    if jaro_winkler(normalize_name(m), normalize_name(name)) >= 0.95:
        return m
    return None


def _separated(norm: str, by_token: dict[str, list[str]]) -> bool:
    """JW-separation check bucketed by first AND last token: the only
    realistic >=0.92 pairs share the (Winkler-boosted) first token or a
    long common surname; full first-letter buckets made entity
    generation quadratic at bench8 scale."""
    toks = norm.split()
    seen: set[str] = set()
    for key in (f"F:{toks[0]}", f"L:{toks[-1]}"):
        for other in by_token.get(key, []):
            if other in seen:
                continue
            seen.add(other)
            if abs(len(other) - len(norm)) <= 4 and jaro_winkler(norm, other) >= 0.92:
                return False
    return True


def _register(norm: str, by_token: dict[str, list[str]]) -> None:
    toks = norm.split()
    by_token.setdefault(f"F:{toks[0]}", []).append(norm)
    by_token.setdefault(f"L:{toks[-1]}", []).append(norm)


def build_entities(n: int, rng: np.random.Generator) -> list[Entity]:
    entities: list[Entity] = []
    by_letter: dict[str, list[str]] = {}
    used_pers: set[tuple[str, str]] = set()
    used_org_prefix2: set[tuple[str, str]] = set()
    used_cities: set[str] = set()

    def make_per(idx: int, surname: str | None = None) -> Entity | None:
        for _ in range(50):
            first = FIRST_NAMES[int(rng.integers(0, len(FIRST_NAMES)))]
            last = surname or SURNAMES[int(rng.integers(0, len(SURNAMES)))]
            if (first, last) in used_pers:
                continue
            canonical = f"{first} {last}"
            norm = normalize_name(canonical)
            if not _separated(norm, by_letter):
                continue
            used_pers.add((first, last))
            _register(norm, by_letter)
            e = Entity(idx, "PER", canonical, conflict_key=f"sur:{last.lower()}")
            e.aliases = [canonical, last]
            m = _misspell(canonical, rng)
            if m:
                e.aliases.append(m)
            return e
        return None

    def make_org(idx: int) -> Entity | None:
        for _ in range(50):
            w1 = ORG_ADJS[int(rng.integers(0, len(ORG_ADJS)))]
            w2 = ORG_NOUNS[int(rng.integers(0, len(ORG_NOUNS)))]
            if int(rng.integers(0, 2)):
                w2b = ORG_ADJS[int(rng.integers(0, len(ORG_ADJS)))]
                if w2b == w1:
                    continue
                words = [w1, w2b, w2, ORG_SUFFIXES[int(rng.integers(0, len(ORG_SUFFIXES)))]]
            else:
                words = [w1, w2, ORG_SUFFIXES[int(rng.integers(0, len(ORG_SUFFIXES)))]]
            if (words[0], words[1]) in used_org_prefix2:
                continue
            canonical = " ".join(words)
            norm = normalize_name(canonical)
            if not _separated(norm, by_letter):
                continue
            used_org_prefix2.add((words[0], words[1]))
            _register(norm, by_letter)
            e = Entity(idx, "ORG", canonical, conflict_key=f"org:{words[0].lower()} {words[1].lower()}")
            e.aliases = [canonical, initials(canonical), f"{words[0]} {words[1]}"]
            m = _misspell(canonical, rng)
            if m:
                e.aliases.append(m)
            return e
        return None

    def make_gpe(idx: int) -> Entity | None:
        free = [c for c in sorted(gazetteer.CITY_STATE) if c not in used_cities]
        if not free:
            return None
        city = free[int(rng.integers(0, len(free)))]
        used_cities.add(city)
        state = gazetteer.CITY_STATE[city]
        canonical = f"{city}, {state}"
        _register(normalize_name(canonical), by_letter)
        e = Entity(idx, "GPE", canonical, conflict_key=f"city:{city.lower()}")
        e.aliases = [canonical, city, f"{city}, {gazetteer.ABBR_OF_STATE[state]}"]
        return e

    def make_twin_pair(idx1: int, idx2: int) -> tuple[Entity, Entity] | None:
        """Adversarial twins (VERDICT r01 fixture-v9 ask): two DISTINCT
        entities whose canonical names sit at Jaro-Winkler >= 0.95 —
        above the string-only merge region — separable ONLY by their
        context topics. Both forced NIL so the KB constraint cannot
        rescue a context-free scorer."""
        for _ in range(80):
            first = FIRST_NAMES[int(rng.integers(0, len(FIRST_NAMES)))]
            last = SURNAMES[int(rng.integers(0, len(SURNAMES)))]
            if len(last) < 7 or (first, last) in used_pers:
                continue
            pos = int(rng.integers(2, len(last) - 1))
            last2 = last[:pos] + last[pos + 1:]
            c1, c2 = f"{first} {last}", f"{first} {last2}"
            n1, n2 = normalize_name(c1), normalize_name(c2)
            if jaro_winkler(n1, n2) < 0.95:
                continue
            if not (_separated(n1, by_letter) and _separated(n2, by_letter)):
                continue
            used_pers.add((first, last))
            used_pers.add((first, last2))
            _register(n1, by_letter)
            _register(n2, by_letter)
            key = f"sur:{last.lower()}"
            e1 = Entity(idx1, "PER", c1, conflict_key=key, no_kb=True,
                        topics=topic_words(idx1))
            e1.aliases = [c1, last]
            e2 = Entity(idx2, "PER", c2, conflict_key=key, no_kb=True,
                        topics=topic_words(idx2))
            e2.aliases = [c2, last2]
            return e1, e2
        return None

    # entity 0: the hot ORG; entities 1-3: the Smith trio.
    e = make_org(0)
    assert e is not None
    entities.append(e)
    for i in (1, 2, 3):
        e = make_per(i, surname="Smith")
        assert e is not None
        entities.append(e)
    # adversarial twin pairs (entities 4 .. 4+2*n_twins-1)
    n_twins = max(2, n // 40)
    for _ in range(n_twins):
        pair = make_twin_pair(len(entities), len(entities) + 1)
        if pair is None:
            break
        entities.extend(pair)

    def _letters(i: int) -> str:
        s = ""
        i += 1
        while i:
            s = chr(ord("A") + (i - 1) % 26) + s
            i = (i - 1) // 26
        return s

    # ambiguous curated-alias pairs resolved by doc-sim (topics in both
    # the contexts and the KB intro text)
    n_amb = max(1, n // 60)
    for p in range(n_amb):
        e1 = make_org(len(entities))
        e2 = make_org(len(entities) + 1) if e1 else None
        if e1 is None or e2 is None:
            break
        shared = "QX" + _letters(p)
        for e in (e1, e2):
            e.shared_alias = shared
            e.force_kb = True
            e.topics = topic_words(e.idx)
            e.conflict_key = f"amb:{p}"
        entities.extend([e1, e2])

    # ambiguous pairs resolved ONLY by NE overlap (no topics anywhere;
    # the co-mentioned companion entity appears in the winner's KB
    # named_entities)
    n_ne = max(1, n // 80)
    for p in range(n_ne):
        e1 = make_org(len(entities))
        e2 = make_org(len(entities) + 1) if e1 else None
        c1 = make_per(len(entities) + 2) if e2 else None
        c2 = make_per(len(entities) + 3) if c1 else None
        if c2 is None:
            break
        shared = "QY" + _letters(p)
        for e in (e1, e2):
            e.shared_alias = shared
            e.force_kb = True
            e.conflict_key = f"ne:{p}"
        e1.ne_companion = c1.idx
        e2.ne_companion = c2.idx
        entities.extend([e1, e2, c1, c2])

    # sports city/team cases: the bare city name in sports-marker
    # contexts must re-link to the team entity, not the location
    SPORT_NOUNS = ["Rovers", "Dynamo", "Wanderers", "Athletic"]
    n_sports = max(1, n // 80)
    for s in range(n_sports):
        gpe = make_gpe(len(entities))
        if gpe is None:
            break
        gpe.force_kb = True
        city = gpe.canonical.split(",")[0]
        team = Entity(
            len(entities) + 1, "ORG", f"{city} {SPORT_NOUNS[s % 4]}",
            conflict_key=gpe.conflict_key, force_kb=True, is_team=True,
            sports_city=city, wiki="team",
        )
        team.aliases = [team.canonical]
        _register(normalize_name(team.canonical), by_letter)
        entities.extend([gpe, team])

    while len(entities) < n:
        idx = len(entities)
        r = rng.random()
        if r < 0.50:
            e = make_per(idx)
        elif r < 0.85:
            e = make_org(idx)
        else:
            e = make_gpe(idx) or make_per(idx)
        if e is None:
            e = make_org(idx) or make_per(idx)
        if e is None:
            raise RuntimeError(
                f"entity pools exhausted at {idx} entities - grow the "
                "name pools before raising the scale"
            )
        entities.append(e)

    # KB membership ~55% (2012 gold ratio 1177/2226, FIXTURES.md §1)
    next_kb = 1
    for e in entities:
        if e.no_kb:
            continue
        if e.force_kb or rng.random() < 0.55:
            e.in_kb = True
            e.kb_id = f"E{next_kb:07d}"
            next_kb += 1
    return entities


def _pick_conv_entities(entities: list[Entity], rng: np.random.Generator) -> list[Entity]:
    chosen: list[Entity] = []
    keys: set[str] = set()
    if rng.random() < 0.06:
        chosen.append(entities[0])
        keys.add(entities[0].conflict_key)
    n_extra = 1 + int(rng.integers(0, 3))
    for _ in range(n_extra):
        e = entities[int(rng.integers(0, len(entities)))]
        if e.conflict_key in keys:
            continue
        chosen.append(e)
        keys.add(e.conflict_key)
    if not chosen:
        chosen.append(entities[int(rng.integers(0, len(entities)))])
    return chosen


def generate(outdir: str, scale: str = "t1", seed: int = 42) -> dict:
    """Generate all fixture tables under ``outdir``. Returns the manifest."""
    n_convs, n_entities, tmin, tmax, max_pairs_per_key = SCALES[scale]
    rng = np.random.Generator(np.random.PCG64(seed))
    entities = build_entities(n_entities, rng)

    os.makedirs(outdir, exist_ok=True)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    ts_us: list[int] = []

    g_mid: list[str] = []
    g_conv: list[str] = []
    g_turn: list[int] = []
    g_beg: list[int] = []
    g_end: list[int] = []
    g_surface: list[str] = []
    g_gold: list[str] = []
    g_type: list[str] = []
    g_ent: list[int] = []

    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    n_filler = len(FILLER)
    role_cycle = ("user", "assistant", "user", "assistant", "tool")

    for c in range(n_convs):
        conv_id = f"conv{seed}-{c:08d}"
        n_turns = int(rng.integers(tmin, tmax + 1))
        ents = _pick_conv_entities(entities, rng)
        # per-conversation surface MODE (v9): a team entity always
        # appears as its bare city name inside sports-marker contexts;
        # a shared-alias entity uses ONLY the shared (ambiguous) alias
        # in half its conversations — forcing the link decision through
        # doc-sim / NE overlap; everything else follows the
        # first-mention-canonical rule
        modes: list[str] = []
        extra: list[Entity] = []
        keys = {e.conflict_key for e in ents}
        for e in ents:
            if e.is_team:
                modes.append("sports")
            elif e.shared_alias and rng.random() < 0.5:
                modes.append("shared")
                if e.ne_companion >= 0:
                    comp = entities[e.ne_companion]
                    if comp.conflict_key not in keys:
                        extra.append(comp)
                        keys.add(comp.conflict_key)
            else:
                modes.append("normal")
        ents = ents + extra
        modes = modes + ["normal"] * len(extra)
        # plan: turn -> (entity, surface, mode)
        plan: dict[int, tuple[Entity, str, str]] = {}
        avail = list(range(n_turns))
        for e, mode in zip(ents, modes):
            k = min(1 + int(rng.integers(0, 3)), len(avail))
            if k == 0:
                break
            pick_idx = sorted(
                rng.choice(len(avail), size=k, replace=False).tolist()
            )
            chosen = [avail[i] for i in pick_idx]
            for i in reversed(pick_idx):
                avail.pop(i)
            chosen.sort()
            for j, t in enumerate(chosen):
                if mode == "shared":
                    surface = e.shared_alias
                elif mode == "sports":
                    surface = e.sports_city
                elif j == 0:
                    surface = e.canonical
                else:
                    surface = e.aliases[int(rng.integers(0, len(e.aliases)))]
                plan[t] = (e, surface, mode)

        for t in range(n_turns):
            nw = int(rng.integers(6, 16))
            widx = rng.integers(0, n_filler, size=nw)
            words = [FILLER[int(i)] for i in widx]
            if t in plan:
                if plan[t][2] == "sports":
                    # sports-sense signal (marker-ratio >= 0.15)
                    words = words + SPORTS_FILLER
                elif plan[t][0].topics:
                    # topic injection: every turn mentioning a topic'd
                    # entity carries its topic tokens (context signal)
                    words = words + plan[t][0].topics
                nw = len(words)
            if t in plan:
                e, surface, _mode = plan[t]
                ins = int(rng.integers(0, nw + 1))
                prefix = " ".join(words[:ins])
                suffix = " ".join(words[ins:])
                if prefix:
                    beg = len(prefix) + 1
                    text = f"{prefix} {surface} {suffix}" if suffix else f"{prefix} {surface}"
                else:
                    beg = 0
                    text = f"{surface} {suffix}" if suffix else surface
                end = beg + len(surface)
                mid = f"{conv_id}:{t:05d}:{beg:05d}"
                g_mid.append(mid)
                g_conv.append(conv_id)
                g_turn.append(t)
                g_beg.append(beg)
                g_end.append(end)
                g_surface.append(surface)
                g_gold.append(e.gold_id)
                g_type.append(e.etype)
                g_ent.append(e.idx)
            else:
                text = " ".join(words)
            role = role_cycle[t % len(role_cycle)]
            conv_ids.append(conv_id)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append("search" if role == "tool" else "")
            ts_us.append(base_us + c * 3_600_000_000 + t * 1_000_000)

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )
    # a DIRECTORY of part files: a single parquet file is read by ONE
    # Ray task (measured: 14s serial read at bench8), and partitioned
    # output is also what the resumable-layout contract expects.
    # Part boundaries are CONVERSATION-ALIGNED with one row group per
    # file, so a read task always sees whole conversations — the input
    # contract of the fused extract+canonicalize path
    # (el.pipeline run_linkage(conv_partitioned=True)).
    tdir = os.path.join(outdir, "transcripts.parquet")
    if os.path.isfile(tdir):
        os.remove(tdir)
    os.makedirs(tdir, exist_ok=True)
    n_rows = transcripts.num_rows
    n_parts = max(4, min(64, n_rows // 150_000 + 1))
    step = -(-n_rows // n_parts)
    conv_arr = np.asarray(conv_ids, dtype=object)
    starts = np.concatenate(
        ([0], np.flatnonzero(conv_arr[1:] != conv_arr[:-1]) + 1)
    )
    bounds = [0]
    for i in range(1, n_parts):
        j = int(np.searchsorted(starts, i * step))
        b = int(starts[j]) if j < len(starts) else n_rows
        if bounds[-1] < b < n_rows:
            bounds.append(b)
    bounds.append(n_rows)
    for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        part = transcripts.slice(s, e - s)
        if part.num_rows:
            # bounded row groups so parquet readers can split a part
            # into multiple read fragments (a 100-TB corpus never ships
            # monolithic row groups); cuts need NOT respect conversation
            # boundaries — the fused plan's boundary patch handles
            # block-straddling conversations at any granularity
            pq.write_table(part, os.path.join(tdir, f"part-{i:05d}.parquet"),
                           row_group_size=65536)

    gold_mentions = pa.table(
        {
            "mention_id": pa.array(g_mid, pa.string()),
            "conv_id": pa.array(g_conv, pa.string()),
            "turn_idx": pa.array(g_turn, pa.int32()),
            "beg": pa.array(g_beg, pa.int32()),
            "end": pa.array(g_end, pa.int32()),
            "surface": pa.array(g_surface, pa.string()),
            "gold_kb_id": pa.array(g_gold, pa.string()),
            "gold_type": pa.array(g_type, pa.string()),
        }
    )
    pq.write_table(gold_mentions, os.path.join(outdir, "gold_mentions.parquet"),
                   row_group_size=65536)

    # ---- gold_pairs: same-surface-block labeled pairs (FIXTURES.md §4)
    key_map: dict[str, list[int]] = {}
    for i, surface in enumerate(g_surface):
        for k in surface_block_keys(surface):
            key_map.setdefault(k, []).append(i)
    seen_pairs: set[tuple[int, int]] = set()
    p_m1: list[str] = []
    p_m2: list[str] = []
    p_key: list[str] = []
    p_same: list[bool] = []
    for key in sorted(key_map):
        ms = key_map[key]
        n = len(ms)
        if n < 2:
            continue
        total = n * (n - 1) // 2
        if total <= max_pairs_per_key:
            idx_pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
        else:
            a = rng.integers(0, n, size=4 * max_pairs_per_key)
            b = rng.integers(0, n, size=4 * max_pairs_per_key)
            cand = {(min(x, y), max(x, y)) for x, y in zip(a.tolist(), b.tolist()) if x != y}
            idx_pairs = sorted(cand)[:max_pairs_per_key]
        for i, j in idx_pairs:
            mi, mj = ms[i], ms[j]
            lo, hi = (mi, mj) if g_mid[mi] < g_mid[mj] else (mj, mi)
            if (lo, hi) in seen_pairs:
                continue
            seen_pairs.add((lo, hi))
            p_m1.append(g_mid[lo])
            p_m2.append(g_mid[hi])
            p_key.append(key)
            p_same.append(g_ent[lo] == g_ent[hi])
    gold_pairs = pa.table(
        {
            "m1_id": pa.array(p_m1, pa.string()),
            "m2_id": pa.array(p_m2, pa.string()),
            "block_key": pa.array(p_key, pa.string()),
            "same_entity": pa.array(p_same, pa.bool_()),
        }
    )
    pq.write_table(gold_pairs, os.path.join(outdir, "gold_pairs.parquet"),
                   row_group_size=65536)

    # ---- KB table
    kb_rows = [e for e in entities if e.in_kb]
    titles = [e.canonical for e in kb_rows]
    k_id = [e.kb_id for e in kb_rows]
    k_type = [e.etype for e in kb_rows]
    k_wiki = []
    for e in kb_rows:
        if e.wiki:
            k_wiki.append(e.wiki)
        elif e.etype == "PER":
            k_wiki.append("person")
        elif e.etype == "GPE":
            k_wiki.append("settlement")
        else:
            k_wiki.append("organization")
    k_intro = []
    k_alias = []
    k_ne = []
    n_kb = len(kb_rows)
    for e in kb_rows:
        nw = int(rng.integers(10, 25))
        widx = rng.integers(0, n_filler, size=nw)
        words = [FILLER[int(i)] for i in widx]
        # intro carries the entity's topic words — the doc-sim signal
        # (intro_text is the docSimScore side, LinkFeatures.scala:175-178)
        k_intro.append(
            f"{e.canonical} " + " ".join(e.topics + words)
        )
        k_alias.append(
            list(e.aliases) + ([e.shared_alias] if e.shared_alias else [])
        )
        if e.shared_alias:
            # ambiguous entities: named_entities = the companion only
            # (the NE-overlap signal must be clean)
            k_ne.append(
                [entities[e.ne_companion].canonical]
                if e.ne_companion >= 0 else []
            )
        else:
            others = [kb_rows[int(x)].canonical
                      for x in rng.integers(0, n_kb, size=3)]
            k_ne.append(sorted(set(others) - {e.canonical}))
    # distractor near-miss titles (must NOT be linked)
    n_distr = max(2, n_kb // 10)
    next_id = n_kb + 1
    for d in range(n_distr):
        src = kb_rows[int(rng.integers(0, n_kb))]
        extra = DISTRACTOR_WORDS[int(rng.integers(0, len(DISTRACTOR_WORDS)))]
        title = f"{src.canonical} {extra}"
        if title in titles:
            continue
        titles.append(title)
        k_id.append(f"E{next_id:07d}")
        next_id += 1
        k_type.append(src.etype)
        k_wiki.append("organization")
        k_intro.append(title)
        k_alias.append([title])
        k_ne.append([])
    # ambiguity: count of titles containing this title's last token
    token_count: dict[str, int] = {}
    for t in titles:
        for tok in set(normalize_name(t).split()):
            token_count[tok] = token_count.get(tok, 0) + 1
    k_amb = [token_count.get(normalize_name(t).split()[-1], 0) for t in titles]
    kb = pa.table(
        {
            "kb_id": pa.array(k_id, pa.string()),
            "title": pa.array(titles, pa.string()),
            "type": pa.array(k_type, pa.string()),
            "wiki_type": pa.array(k_wiki, pa.string()),
            "intro_text": pa.array(k_intro, pa.string()),
            "aliases": pa.array(k_alias, pa.list_(pa.string())),
            "named_entities": pa.array(k_ne, pa.list_(pa.string())),
            "ambiguity": pa.array(k_amb, pa.int32()),
        }
    )
    pq.write_table(kb, os.path.join(outdir, "kb.parquet"))

    manifest = {
        "version": FIXTURE_VERSION,
        "seed": seed,
        "scale": scale,
        "n_conversations": n_convs,
        "n_turns": len(conv_ids),
        "n_entities": n_entities,
        "n_mentions": len(g_mid),
        "n_gold_pairs": len(p_m1),
        "n_kb": len(k_id),
    }
    with open(os.path.join(outdir, "fixture_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def ensure_fixture(sf_dir_or_scale: str, root: str = "/tmp/el_fixtures",
                   seed: int = 42) -> str:
    """Map an sf dir (or scale name) to a generated fixture dir, generating
    it if missing or stale. Deterministic for (seed, scale, version)."""
    name = os.path.basename(str(sf_dir_or_scale).rstrip("/"))
    scale = SCALE_OF_SF.get(name, name if name in SCALES else "t1")
    out = os.path.join(root, scale)
    man_path = os.path.join(out, "fixture_manifest.json")
    if os.path.exists(man_path):
        try:
            with open(man_path) as f:
                m = json.load(f)
            if (m.get("seed"), m.get("scale"), m.get("version")) == (seed, scale, FIXTURE_VERSION):
                return out
        except (json.JSONDecodeError, OSError):
            pass
    generate(out, scale, seed)
    return out
