"""el — Ray-Data-native entity-linking / record-linkage engine.

A from-scratch re-expression of the query and data-processing
capabilities of knowitall/Tac2013EntityLinking (reference read-only at
/root/reference/) as ray.data.Dataset pipelines: mention extraction,
alias canonicalization, blocking, pairwise scoring, KB linking, and
transitive NIL clustering over Parquet transcript tables
(conv_id, turn_idx, role, text, tool, ts).

Blueprint: SURVEY.md. Targets: BASELINE.md / BASELINE.json.
"""

__version__ = "0.1.0"
