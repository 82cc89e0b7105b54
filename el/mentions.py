"""Stage A — mention extraction from turn text.

The reference receives mention spans from the query XML
(KBPQuery.parseKBPQueries, KBPQuery.scala:91-142) and fetches per-doc
context from Solr (SolrHelper.scala:24-38, 43-174). Our corpus IS the
transcript table, so mentions are *extracted* from turn text by a
stateless ``map_batches`` stage over zero-copy Arrow batches: maximal
capitalized spans (including ALL-CAPS acronyms and ``City, ST`` forms)
with deterministic positional ids ``{conv_id}:{turn_idx:05d}:{beg:05d}``
— order-free and resume-safe (replaces the reference's mutable
AtomicInteger id state, RunKBPEntityLinkerSystem.scala:31-34).

Context-free NER typing mirrors the reference's type dispatch
(CorefHelperMethods.identifyBestEntityStringByRules:194-241): acronym ->
ORG, comma/city forms -> GPE, org-suffix -> ORG, else PER; the alias
stage refines multi-token PER -> ORG via document org lists.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .gazetteer import CITIES, STATES
from .text import is_acronym

# Maximal run of capitalized tokens, joined by a space or ", "
# (the latter captures "Austin, TX" / "Austin, Texas" location forms).
MENTION_RE = re.compile(r"\b[A-Z][A-Za-z'.\-]*(?:(?: |, )[A-Z][A-Za-z'.\-]*)*")

ORG_SUFFIXES = frozenset(
    s.lower()
    for s in (
        "Council Group Institute Authority Commission Alliance Consortium "
        "Federation Corp Inc Company Bureau Agency Association".split()
    )
)


def mention_id(conv_id: str, turn_idx: int, beg: int) -> str:
    return f"{conv_id}:{turn_idx:05d}:{beg:05d}"


def type_surface(surface: str) -> str:
    """Context-free NER type (PER | ORG | GPE)."""
    if is_acronym(surface):
        return "ORG"
    if ", " in surface:
        tail = surface.rsplit(", ", 1)[1]
        if tail.upper() in STATES or tail in STATES.values():
            return "GPE"
        return "ORG"
    toks = surface.split()
    if len(toks) == 1:
        return "GPE" if surface in CITIES else "PER"
    if toks[-1].lower() in ORG_SUFFIXES:
        return "ORG"
    return "PER" if len(toks) == 2 else "ORG"


def extract_mentions_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn (batch_format="pyarrow"): transcripts -> mentions.

    Emits one row per capitalized span; ``context`` is the mention's own
    turn text (the per-turn analog of the reference's context sentence,
    SolrHelper.scala:43-102).
    """
    conv = batch.column("conv_id").to_pylist()
    turn = batch.column("turn_idx").to_pylist()
    texts = batch.column("text").to_pylist()
    o_mid: list[str] = []
    o_conv: list[str] = []
    o_turn: list[int] = []
    o_beg: list[int] = []
    o_end: list[int] = []
    o_surface: list[str] = []
    o_type: list[str] = []
    o_ctx: list[str] = []
    finditer = MENTION_RE.finditer
    for c, t, text in zip(conv, turn, texts):
        for m in finditer(text):
            s = m.group(0)
            beg = m.start()
            o_mid.append(mention_id(c, t, beg))
            o_conv.append(c)
            o_turn.append(t)
            o_beg.append(beg)
            o_end.append(m.end())
            o_surface.append(s)
            o_type.append(type_surface(s))
            o_ctx.append(text)
    return pa.table(
        {
            "mention_id": pa.array(o_mid, pa.string()),
            "conv_id": pa.array(o_conv, pa.string()),
            "turn_idx": pa.array(o_turn, pa.int32()),
            "beg": pa.array(o_beg, pa.int32()),
            "end": pa.array(o_end, pa.int32()),
            "surface": pa.array(o_surface, pa.string()),
            "ner_type": pa.array(o_type, pa.string()),
            "context": pa.array(o_ctx, pa.string()),
        }
    )


def extract_mentions(transcripts, **kwargs):
    """Dataset-level wrapper: transcripts Dataset -> mentions Dataset."""
    return transcripts.map_batches(
        extract_mentions_batch, batch_format="pyarrow", **kwargs
    )
