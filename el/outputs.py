"""Output writers: submission table and human-readable report.

- ``write_submission``: the analog of the reference's TSV emitter
  (queryId, kbLink, confidence — RunKBPEntityLinkerSystem.scala:233-244):
  deterministic sort, Parquet directory (+ optional CSV) so a rerun is
  reproducible byte-for-byte.
- ``human_readable``: the 8-column join of answer x mention x KB title
  and intro (FormattedOutputToHumanReadableOutputConverter.scala:11-89)
  as a broadcast join (KB is the small side — one ray.put, no shuffle).
"""

from __future__ import annotations

import pyarrow as pa


def write_submission(answers_ds, out_dir: str, also_csv: bool = False):
    """answers -> sorted (mention_id, kb_link, confidence) files."""
    from .shuffle import arrowize

    sub = answers_ds.select_columns(["mention_id", "kb_link", "confidence"])
    sub = arrowize(sub).sort("mention_id")
    sub.write_parquet(out_dir)
    if also_csv:
        sub.write_csv(out_dir + "_csv")
    return out_dir


def write_entity_strings(answers_ds, out_dir: str):
    """EntityStringFinder analog (EntityStringFinder.scala:12-23: per
    query, the doc, the raw name and the rule-identified best entity
    string): per mention, the conversation, the raw surface and the
    canonicalized alias — sorted, as a Parquet directory."""
    from .shuffle import arrowize

    sub = answers_ds.select_columns(
        ["mention_id", "conv_id", "surface", "alias"])
    arrowize(sub).sort("mention_id").write_parquet(out_dir)
    return out_dir


class _HumanReadable:
    def __init__(self, kb_ref):
        import ray

        kb = ray.get(kb_ref)
        self.title = kb.title_of_id
        self.type = kb.type_of_id

    def __call__(self, t: pa.Table) -> pa.Table:
        links = t.column("kb_link").to_pylist()
        titles = [self.title.get(l, "") for l in links]
        types = [self.type.get(l, "NIL") for l in links]
        return (
            t.append_column("kb_title", pa.array(titles, pa.string()))
            .append_column("kb_type", pa.array(types, pa.string()))
        )


def human_readable(answers_ds, kb_ref, concurrency: int = 2):
    """answers + broadcast KB -> readable rows with title/type attached
    (mention_id, conv_id, turn_idx, surface, alias, kb_link, confidence,
    kb_title, kb_type)."""
    return answers_ds.map_batches(
        _HumanReadable,
        fn_constructor_args=(kb_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )


def write_answers_jsonl(answers_ds, out_dir: str):
    """Streaming JSONL sink for the full answer rows (the
    interchange-format sibling of :func:`write_submission`): sorted by
    (conv_id, turn_idx) then written one JSON object per line, one
    file per block — downstream line-oriented consumers (dataset
    loaders, spot-check tooling) read it without a Parquet stack.
    Timestamp-free schema, so the lines are plain scalars."""
    from .shuffle import arrowize

    ds = arrowize(answers_ds).sort(["conv_id", "turn_idx"])
    ds.write_json(out_dir)
    return out_dir
