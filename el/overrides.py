"""Per-document context overrides of the link decision — the two spots
where the reference's linkQuery is CONTEXT-dependent rather than a
global function of the alias string:

- **ambiguous aliases** (doc-sim, LinkFeatures.scala:175-178's
  docSimScore + the NE-overlap features LinkFeatures.scala:118-158): a
  curated alias carried by >= 2 KB entries is disambiguated per
  conversation by cosine(conversation context of the alias's mentions,
  candidate intro text) + 0.5 * overlap(co-mentioned entities,
  candidate named_entities); the context union over the alias's
  repeat mentions is the coref-context analog (KBPQuery.scala:34-57);
- **sports sense** (linkQuery steps 1 and 8,
  RunKBPEntityLinkerSystem.scala:59-61, 131-147): a gazetteer-location
  mention whose conversation context clears the sports-marker ratio is
  re-linked to a team-typed KB entry (conf .7) or a fresh NIL (.5).

Both produce a per-(alias_norm, conv_id) choice that downstream stages
consume as a GROUP-KEY suffix: mentions of alias a in conversation c
contract to the node ``a#<kind>:<kb_id>`` instead of ``a``, so the
override-affected mentions cluster separately without giving up the
distinct-alias contraction for the (vastly dominant) unaffected rest.

Scale note: the choice table is proportional to the number of
(ambiguous-alias | sports-candidate, conversation) pairs — rare by the
curated-ambiguity assumption. The DRIVER plan (contracted graph within
the size guard) collects it into one ray.put broadcast; the FALLBACK
plan keeps it as a Dataset and attaches group keys via a conv_id hash
join (el.pipeline._attach_group_key_join), so nothing
corpus-proportional ever lives on the driver. The scan that finds
candidates is a stateless map over the mention stream; the
per-conversation resolution runs over ONLY the flagged conversations'
mentions (conversation-aligned task chunks below a size bound, a
conv_id hash exchange above it).
"""

from __future__ import annotations

import pyarrow as pa

from .sports import is_sports_candidate, sports_sense, team_rerank
from .text import term_vector, tokenize

# group-key suffix kinds
KIND_AMBIGUOUS = "A"
KIND_SPORTS = "S"
# separator: printable, impossible in a normalized alias ([a-z0-9 ]),
# and NOT "\x00" — pandas' object-array groupby hashes C-strings and
# silently merges keys at the first NUL
SEP = "#"

NE_OVERLAP_WEIGHT = 0.5


def group_key_of(alias_norm: str, kind: str, kb_id: str) -> str:
    return f"{alias_norm}{SEP}{kind}:{kb_id}"


def parse_group_key(group_key: str) -> tuple[str, str, str]:
    """-> (alias_norm, kind, kb_id); kind '' for plain aliases."""
    if SEP not in group_key:
        return group_key, "", ""
    alias, tag = group_key.split(SEP, 1)
    kind, _, kb_id = tag.partition(":")
    return alias, kind, kb_id


def resolve_ambiguous(alias_norm: str, contexts: list[str],
                      conv_surfaces: set[str], kb) -> str:
    """Doc-sim + NE-overlap argmax over the alias's KB candidates
    (deterministic: ties break to the min kb_id)."""
    cands = kb.ambiguous_aliases.get(alias_norm) or []
    if not cands:
        return ""
    from .sim import cosine

    ctx_vec = term_vector(" ".join(contexts), top_k=48)
    others = conv_surfaces - {alias_norm}
    best_id, best_score = "", float("-inf")
    for kb_id in sorted(cands):
        sim = cosine(ctx_vec, kb.intro_vec.get(kb_id, {}))
        nes = kb.ne_of.get(kb_id) or frozenset()
        overlap = (len(others & nes) / len(nes)) if nes else 0.0
        score = sim + NE_OVERLAP_WEIGHT * overlap
        if score > best_score:
            best_id, best_score = kb_id, score
    return best_id


def conv_overrides_block(t: pa.Table, kb, sports: bool = True) -> pa.Table:
    """Block fn over conv_id-partitioned flagged-conversation mentions:
    emits (alias_norm, conv_id, kind, kb_id) choice rows."""
    import numpy as np

    out_alias: list[str] = []
    out_conv: list[str] = []
    out_kind: list[str] = []
    out_kb: list[str] = []
    if t.num_rows == 0:
        return pa.table({
            "alias_norm": pa.array(out_alias, pa.string()),
            "conv_id": pa.array(out_conv, pa.string()),
            "kind": pa.array(out_kind, pa.string()),
            "kb_id": pa.array(out_kb, pa.string()),
        })
    idx = pa.compute.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("mention_id", "ascending")]
    )
    t = t.take(idx)
    conv = np.asarray(t.column("conv_id").to_pylist())
    bounds = np.flatnonzero(conv[1:] != conv[:-1]) + 1
    starts = np.concatenate(([0], bounds, [len(conv)]))
    alias = t.column("alias_norm").to_pylist()
    surface = t.column("surface").to_pylist()
    ner = t.column("ner_type").to_pylist()
    context = t.column("context").to_pylist()
    amb = kb.ambiguous_aliases
    for s, e in zip(starts[:-1], starts[1:]):
        conv_id = conv[s]
        conv_surfaces = {alias[i] for i in range(s, e)}
        by_alias: dict[str, list[int]] = {}
        for i in range(s, e):
            by_alias.setdefault(alias[i], []).append(i)
        for a, rows in sorted(by_alias.items()):
            ctxs = [context[i] for i in rows[:8]]
            # sports first: linkQuery's step-8 override beats the plain
            # link (RunKBPEntityLinkerSystem.scala:131-147)
            if sports and is_sports_candidate(surface[rows[0]], ner[rows[0]]):
                toks: list[str] = []
                for c in ctxs:
                    toks.extend(tokenize(c))
                if sports_sense(toks):
                    hit = team_rerank(a, kb)
                    out_alias.append(a)
                    out_conv.append(conv_id)
                    out_kind.append(KIND_SPORTS)
                    out_kb.append(hit[0] if hit else "")
                    continue
            if a in amb:
                choice = resolve_ambiguous(a, ctxs, conv_surfaces, kb)
                if choice:
                    out_alias.append(a)
                    out_conv.append(conv_id)
                    out_kind.append(KIND_AMBIGUOUS)
                    out_kb.append(choice)
    return pa.table({
        "alias_norm": pa.array(out_alias, pa.string()),
        "conv_id": pa.array(out_conv, pa.string()),
        "kind": pa.array(out_kind, pa.string()),
        "kb_id": pa.array(out_kb, pa.string()),
    })


def flag_convs(t: pa.Table, amb_aliases, sports: bool = True) -> pa.Table:
    """One (conv_id) row per mention that makes its conversation an
    override candidate: an ambiguous-alias mention, or a
    gazetteer-location mention whose OWN turn shows >= 1 sports marker
    (the cheap marker prefilter keeps the flagged set proportional to
    actual sports/ambiguous usage, not to every location mention).
    ``amb_aliases``: the KB's ambiguous-alias names (a small list — the
    full index never ships to this scan)."""
    import pyarrow.compute as pc

    from .gazetteer import CITIES, STATE_NAMES
    from .sports import SPORTS_MARKERS

    amb = sorted(amb_aliases)
    amb_arr = pa.array(amb, pa.string()) if amb else None
    out = []
    if amb_arr is not None:
        out.append(t.filter(
            pc.is_in(t.column("alias_norm"), value_set=amb_arr)
        ).select(["conv_id"]))
    if sports:
        loc_arr = pa.array(sorted(CITIES | STATE_NAMES), pa.string())
        # two-step: cut to gazetteer-surface non-PER rows FIRST (rare),
        # then run the marker regex only over that subset — the
        # alternation regex over every context was the scan's hot spot
        cand = t.filter(pc.and_kleene(
            pc.is_in(t.column("surface"), value_set=loc_arr),
            pc.not_equal(t.column("ner_type"), "PER"),
        ))
        if cand.num_rows:
            marker_re = r"\b(" + "|".join(sorted(SPORTS_MARKERS)) + r")\b"
            out.append(cand.filter(pc.match_substring_regex(
                cand.column("context"), marker_re)).select(["conv_id"]))
    if not out:
        return pa.table({"conv_id": pa.array([], pa.string())})
    return pa.concat_tables(out)


SUBSET_COLUMNS = ["mention_id", "conv_id", "alias_norm", "surface",
                  "ner_type", "context"]


def subset_flagged(t: pa.Table, convs: pa.Array) -> pa.Table:
    """Mentions belonging to a flagged conversation (resolution input)."""
    import pyarrow.compute as pc

    return t.filter(
        pc.is_in(t.column("conv_id"), value_set=convs)
    ).select(SUBSET_COLUMNS)


def conv_aligned_chunks(tbl: pa.Table, target: int = 20_000) -> list:
    """Sort by (conv_id, mention_id) and slice into ~target-row chunks
    whose boundaries fall on conversation changes."""
    import numpy as np
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        tbl, sort_keys=[("conv_id", "ascending"),
                        ("mention_id", "ascending")]
    )
    tbl = tbl.take(idx)
    conv = tbl.column("conv_id").combine_chunks()
    n = len(conv)
    neq = pc.not_equal(conv.slice(1), conv.slice(0, n - 1))
    starts = np.concatenate(
        ([0],
         np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1,
         [n])
    )
    chunks, lo = [], 0
    for b in starts[1:]:
        if b - lo >= target or b == n:
            if b > lo:
                chunks.append(tbl.slice(lo, b - lo))
            lo = b
    return chunks


# flagged-conversation broadcast guard: above this many per-batch-distinct
# flagged conv_ids the distinct list is NOT collected/broadcast — the
# semi-join exchange path below runs instead, so nothing
# corpus-proportional ever lands on the driver on either plan
OVERRIDE_BCAST_CONV_MAX = 2_000_000

# marker mention_id for the semi-join union (real mention_ids are
# "{conv}:{turn:05d}:{beg:05d}" — never empty)
_MARKER_MID = ""


def _override_rows_semijoin(aliased_ds, flagged, kb_ref, sports,
                            num_partitions):
    """Over-guard choice computation with ZERO driver-side structure:
    marker rows (one per per-batch-distinct flagged conv) union with the
    full mention stream into a single conv_id hash exchange; the block
    fn semi-joins (keeps only conversations that carry a marker) and
    resolves the overrides in place. Costs one full mention-stream
    exchange — the price of exceeding the broadcast guard — instead of
    the pruned flagged-subset exchange the bounded path pays."""
    import ray

    from .shuffle import group_blocks

    def m_rows(t: pa.Table) -> pa.Table:
        return t.select(SUBSET_COLUMNS)

    def marker_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.array([""] * n, pa.string())
        return pa.table({
            "mention_id": pa.array([_MARKER_MID] * n, pa.string()),
            "conv_id": t.column("conv_id").combine_chunks().cast(
                pa.string()),
            "alias_norm": empty,
            "surface": empty,
            "ner_type": empty,
            "context": empty,
        })

    tagged = aliased_ds.map_batches(
        m_rows, batch_format="pyarrow"
    ).union(flagged.map_batches(marker_rows, batch_format="pyarrow"))

    def semi_block(t: pa.Table, kb_ref=kb_ref, sports=sports) -> pa.Table:
        import pyarrow.compute as pc

        mk = pc.equal(t.column("mention_id").combine_chunks(), _MARKER_MID)
        convs = pc.unique(
            t.filter(mk).column("conv_id").combine_chunks())
        mentions = t.filter(pc.invert(mk))
        sub = mentions.filter(pc.is_in(
            mentions.column("conv_id").combine_chunks(), value_set=convs))
        return conv_overrides_block(sub, ray.get(kb_ref), sports)

    return group_blocks(tagged, ["conv_id"], semi_block,
                        batch_format="pyarrow",
                        num_partitions=num_partitions)


def context_override_rows(aliased_ds, kb_ref, sports: bool = True,
                          num_partitions: int | None = None):
    """Choice rows (alias_norm, conv_id, kind, kb_id) as a DATASET —
    the scale form consumed by the fallback plan's join-based group-key
    attach; None when the corpus has no candidates.

    Scale shape: the flag scan emits per-batch-DISTINCT flagged conv_ids
    only; their total count (an upper bound on the distinct flagged-
    conversation count, checked without collecting a row) gates two
    strategies. Under ``OVERRIDE_BCAST_CONV_MAX`` the bounded conv list
    is collected once, broadcast as an Arrow array (zero-copy per
    worker), and the mention stream is is_in-pruned BEFORE any exchange
    — only flagged conversations' mentions move. Above the guard,
    ``_override_rows_semijoin`` runs: no driver structure at all, one
    marker-union conv_id exchange."""
    import pyarrow.compute as pc
    import ray

    from .shuffle import group_blocks

    kb = ray.get(kb_ref)
    amb_aliases = sorted(kb.ambiguous_aliases)

    def flag(t: pa.Table) -> pa.Table:
        f = flag_convs(t, amb_aliases, sports)
        return pa.table({"conv_id": pc.unique(
            f.column("conv_id").combine_chunks())})

    flagged = aliased_ds.map_batches(
        flag, batch_format="pyarrow").materialize()
    n_flagged_upper = flagged.count()
    if n_flagged_upper == 0:
        return None
    if n_flagged_upper > OVERRIDE_BCAST_CONV_MAX:
        return _override_rows_semijoin(aliased_ds, flagged, kb_ref,
                                       sports, num_partitions)

    conv_arr = pc.unique(pa.concat_tables(
        [t for t in (ray.get(r) for r in flagged.to_arrow_refs())
         if t.num_rows]
    ).column("conv_id").combine_chunks())
    conv_arr = conv_arr.take(pc.sort_indices(conv_arr))
    convs_ref = ray.put(conv_arr)  # Arrow array: zero-copy per worker

    def in_flagged(t: pa.Table, ref=convs_ref) -> pa.Table:
        return subset_flagged(t, ray.get(ref))

    subset = aliased_ds.map_batches(in_flagged, batch_format="pyarrow")

    # driver-chunked path: collect the flagged subset once, slice it
    # into CONVERSATION-ALIGNED chunks on the driver, and fan the
    # per-conversation resolution out as plain tasks — parallel without
    # paying a hash exchange (~3s of aggregator startup). Beyond the
    # driver bound, the exchange path keeps it fully distributed.
    DRIVER_SUBSET_MAX = 2_000_000

    def block(t: pa.Table, kb_ref=kb_ref, sports=sports) -> pa.Table:
        return conv_overrides_block(t, ray.get(kb_ref), sports)

    subset = subset.materialize()

    if subset.count() <= DRIVER_SUBSET_MAX:
        tbl = pa.concat_tables(
            [t for t in (ray.get(r) for r in subset.to_arrow_refs())
             if t.num_rows],
            promote_options="default",
        )
        chunks = conv_aligned_chunks(tbl)
        import ray.data

        return ray.data.from_arrow(chunks).map_batches(
            block, batch_format="pyarrow", batch_size=None
        )
    return group_blocks(subset, ["conv_id"], block,
                        batch_format="pyarrow",
                        num_partitions=num_partitions)


def find_context_overrides(aliased_ds, kb_ref, sports: bool = True,
                           num_partitions: int | None = None) -> dict:
    """-> {(alias_norm, conv_id): (kind, kb_id)} — the broadcast form
    the driver plan consumes (bounded by the contracted-graph guard);
    the fallback plan uses context_override_rows + a conv_id hash join
    instead, so no corpus-proportional dict ever lives on the driver.
    Empty when the corpus has no candidates (one stateless scan)."""
    import ray

    rows = context_override_rows(aliased_ds, kb_ref, sports,
                                 num_partitions)
    if rows is None:
        return {}
    out: dict = {}
    # block-refs collect (bounded: the caller is the driver plan, which
    # only runs under the driver guard; choices <= mentions <= guard)
    for ref in rows.to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows:
            continue
        for a, c, k, kid in zip(t.column("alias_norm").to_pylist(),
                                t.column("conv_id").to_pylist(),
                                t.column("kind").to_pylist(),
                                t.column("kb_id").to_pylist()):
            out[(a, c)] = (k, kid)
    return out
