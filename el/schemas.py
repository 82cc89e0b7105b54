"""Arrow schemas for every table flowing through the engine.

Fixed-by-code schemas, mirroring the reference's case-class data model
(KBPQuery.scala:12-77, FormattedOutput.scala:3-8,
MentionPairFeatures.scala:18-90) re-expressed over the mandated
transcript input shape (BASELINE.json "input_hint").
"""

from __future__ import annotations

import pyarrow as pa

# Primary input (input_hint shape, exactly).
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Stage A output: one row per extracted mention (reference KBPQuery,
# KBPQuery.scala:12-77; contexts SolrHelper.scala:43-188).
MENTIONS = pa.schema(
    [
        ("mention_id", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("beg", pa.int32()),
        ("end", pa.int32()),
        ("surface", pa.string()),
        ("ner_type", pa.string()),  # PER | ORG | GPE
        ("context", pa.string()),  # mention turn text
        ("wide_context", pa.string()),  # +- neighbor turns
    ]
)

# Stage B output: MENTIONS + canonicalized alias
# (entityString, CorefHelperMethods.scala:194-241).
ALIASED = pa.schema(
    list(MENTIONS)
    + [
        ("alias", pa.string()),
        ("alias_norm", pa.string()),
    ]
)

# Stage B2 output: ALIASED + contraction node key (alias_norm, or
# alias_norm + '#<kind>:<kb_id>' for override-affected mentions —
# el.overrides: doc-sim ambiguity, sports sense).
GROUPED = pa.schema(list(ALIASED) + [("group_key", pa.string())])

# Alias profile: one row per distinct contraction node.
PROFILE = pa.schema(
    [
        ("group_key", pa.string()),
        ("alias_norm", pa.string()),
        ("alias", pa.string()),
        ("surface", pa.string()),
        ("ner_type", pa.string()),
        ("min_mention", pa.string()),
        ("n_mentions", pa.int64()),
        ("ctx_vec", pa.string()),  # JSON term->count (df-filtered topics)
        ("surface_norm", pa.string()),
    ]
)

# KB side table (wikimap + title/type/intro maps,
# WikiMappingHelper.scala:102-204, KBPQuery.scala:144-175).
KB = pa.schema(
    [
        ("kb_id", pa.string()),
        ("title", pa.string()),
        ("type", pa.string()),  # PER | ORG | GPE
        ("wiki_type", pa.string()),
        ("intro_text", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("named_entities", pa.list_(pa.string())),
        ("ambiguity", pa.int32()),
    ]
)

# Stage C output: candidate pairs of distinct contraction nodes within
# a block (replaces global all-pairs, Clusterer.scala:89-93); n1/s1n/
# ctx1 are the pre-normalized / context columns the scorer consumes
# without per-pair re-derivation (el/blocking.py PAIR_COLUMNS).
PAIRS = pa.schema(
    [
        ("a1", pa.string()),  # contraction node id "A:<group_key>"
        ("a2", pa.string()),
        ("alias1", pa.string()),
        ("alias2", pa.string()),
        ("surface1", pa.string()),
        ("surface2", pa.string()),
        ("ner1", pa.string()),
        ("ner2", pa.string()),
        ("block_key", pa.string()),
        ("n1", pa.string()),
        ("n2", pa.string()),
        ("s1n", pa.string()),
        ("s2n", pa.string()),
        ("ctx1", pa.string()),
        ("ctx2", pa.string()),
    ]
)

SCORED_PAIRS = pa.schema(list(PAIRS) + [("score", pa.float64())])

# Stage E output (reference FormattedOutput, FormattedOutput.scala:3-8).
ANSWERS = pa.schema(
    [
        ("mention_id", pa.string()),
        ("kb_link", pa.string()),  # E... | NIL...
        ("confidence", pa.float64()),
        ("alias", pa.string()),
    ]
)

# Per-conversation named-entity lists (analog of namedEntities.txt,
# CorefHelperMethods.scala:66-110).
DOC_ENTITIES = pa.schema(
    [
        ("conv_id", pa.string()),
        ("pers", pa.list_(pa.string())),
        ("orgs", pa.list_(pa.string())),
        ("locs", pa.list_(pa.string())),
    ]
)

GOLD_MENTIONS = pa.schema(
    [
        ("mention_id", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("beg", pa.int32()),
        ("end", pa.int32()),
        ("surface", pa.string()),
        ("gold_kb_id", pa.string()),
        ("gold_type", pa.string()),
    ]
)

GOLD_PAIRS = pa.schema(
    [
        ("m1_id", pa.string()),
        ("m2_id", pa.string()),
        ("block_key", pa.string()),
        ("same_entity", pa.bool_()),
    ]
)
