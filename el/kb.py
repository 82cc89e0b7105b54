"""KB side table: load, index, broadcast.

The reference loads the TAC KB into in-process HashMaps once per run
(wikiMap / kbIdToTitleMap / kbTitleToIdMap / intro-text / type maps,
WikiMappingHelper.scala:102-204, KBPQuery.scala:144-175) and scans all
titles online for substring ambiguity (LinkFeatures.scala:160-167). We
read the KB Parquet table once on the driver, build the lookup indexes,
and broadcast them with a single ``ray.put`` — every linker actor reads
the same object-store copy in ``__init__`` (no per-batch reshipping, no
online scans: ambiguity is a precomputed column).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow.parquet as pq

from .text import normalize_name


@dataclass
class KBIndex:
    """Broadcastable lookup state for the candidate finder / linker."""

    title_of_id: dict[str, str] = field(default_factory=dict)
    type_of_id: dict[str, str] = field(default_factory=dict)
    wiki_type_of_id: dict[str, str] = field(default_factory=dict)
    ambiguity_of_id: dict[str, int] = field(default_factory=dict)
    # exact lookups (J2/J3 analogs, RunKBPEntityLinkerSystem.scala:74-79, 104)
    id_of_title_norm: dict[str, str] = field(default_factory=dict)
    ids_of_alias_norm: dict[str, list[str]] = field(default_factory=dict)
    # fuzzy candidate index: first token of normalized title -> [(norm, id)]
    by_first_token: dict[str, list[tuple[str, str]]] = field(default_factory=dict)
    # doc-sim side (LinkFeatures.scala:175-178 docSimScore): intro-text
    # term vectors, precomputed once at broadcast time
    intro_vec: dict[str, dict[str, int]] = field(default_factory=dict)
    # J7: kbId -> normalized named-entity strings
    # (LinkFeatures.scala:118-158; file scan replaced by a KB column)
    ne_of: dict[str, frozenset] = field(default_factory=dict)

    _ambiguous_cache: dict[str, list[str]] | None = field(
        default=None, repr=False, compare=False)

    @property
    def ambiguous_aliases(self) -> dict[str, list[str]]:
        """Curated aliases carried by >= 2 KB entries — the aliases whose
        link decision NEEDS the per-document context (doc-sim + NE
        overlap) instead of a global lookup. Cached: callers hit this
        once per flagged conversation, and the dictcomp over every
        alias was half a scan-bundle task's time (profiled)."""
        if self._ambiguous_cache is None:
            self._ambiguous_cache = {
                a: ids for a, ids in self.ids_of_alias_norm.items()
                if len(ids) >= 2}
        return self._ambiguous_cache

    @classmethod
    def from_table(cls, kb) -> "KBIndex":
        from .text import term_vector

        idx = cls()
        ids = kb.column("kb_id").to_pylist()
        titles = kb.column("title").to_pylist()
        types = kb.column("type").to_pylist()
        wiki = kb.column("wiki_type").to_pylist()
        amb = kb.column("ambiguity").to_pylist()
        aliases = kb.column("aliases").to_pylist()
        intros = kb.column("intro_text").to_pylist()
        nes = kb.column("named_entities").to_pylist()
        for kb_id, title, t, w, a, al, intro, ne in zip(
            ids, titles, types, wiki, amb, aliases, intros, nes
        ):
            norm = normalize_name(title)
            idx.title_of_id[kb_id] = title
            idx.type_of_id[kb_id] = t
            idx.wiki_type_of_id[kb_id] = w
            idx.ambiguity_of_id[kb_id] = a
            idx.id_of_title_norm.setdefault(norm, kb_id)
            for alias in al or []:
                an = normalize_name(alias)
                idx.ids_of_alias_norm.setdefault(an, [])
                if kb_id not in idx.ids_of_alias_norm[an]:
                    idx.ids_of_alias_norm[an].append(kb_id)
            first = norm.split()[0] if norm else ""
            idx.by_first_token.setdefault(first, []).append((norm, kb_id))
            idx.intro_vec[kb_id] = term_vector(intro or "", top_k=24)
            idx.ne_of[kb_id] = frozenset(
                normalize_name(x) for x in (ne or [])
            )
        # df-filter the intro vectors: a term carried by many intros
        # (generic corpus vocabulary) is no evidence FOR any one entity
        # — leaving it in lets shared filler words tie or outweigh an
        # entity's own distinctive terms in the doc-sim cosine (a
        # measured mis-resolution of a curated-ambiguous alias). The
        # same corpus-common discipline el.ctxvec applies to mention
        # context vectors, applied to the KB side once at index time.
        n_intro = sum(1 for v in idx.intro_vec.values() if v)
        if n_intro >= 20:
            dfreq: dict[str, int] = {}
            for v in idx.intro_vec.values():
                for term in v:
                    dfreq[term] = dfreq.get(term, 0) + 1
            thr = max(3, int(0.02 * n_intro))
            common = {t for t, c in dfreq.items() if c > thr}
            idx.intro_vec = {
                k: {t: c for t, c in v.items() if t not in common}
                for k, v in idx.intro_vec.items()
            }
        return idx

    @classmethod
    def from_parquet(cls, path: str) -> "KBIndex":
        return cls.from_table(pq.read_table(path))


def broadcast_kb(path: str):
    """Driver-side: read + index + ray.put once. Returns the object ref
    that linker actors resolve in __init__."""
    import ray

    return ray.put(KBIndex.from_parquet(path))
