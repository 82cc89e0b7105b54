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


def _set_shuffle_strategy() -> None:
    # The engine's grouping idiom is repartition(keys=...) + block-local
    # aggregation (el.shuffle), which requires the hash-shuffle strategy.
    # Datasets snapshot the DataContext at creation, so this must be set
    # before any read_parquet — do it at package import.
    try:
        import ray.data
        from ray.data.context import ShuffleStrategy

        ray.data.DataContext.get_current().shuffle_strategy = (
            ShuffleStrategy.HASH_SHUFFLE
        )
    except Exception:  # noqa: BLE001 — never block import on context setup
        pass


_set_shuffle_strategy()
