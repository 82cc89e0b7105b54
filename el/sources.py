"""Compatibility sources: the reference's file formats re-expressed as
Ray Data reads.

- ``read_kbp_queries_xml``: the KBP query XML (<query id><name><docid>
  <beg><end>) reader (KBPQuery.parseKBPQueries, KBPQuery.scala:91-142;
  XMLHelper.scala:7-35), including the offset-less 2011 variant. Parsed
  with a stateless flat-map over whole-file text (query files are small
  control inputs, not corpus data).
- ``kb_from_tsv``: the wikimap-style tab-separated KB loader family
  (id\\ttitle\\ttype — WikiMappingHelper.loadNameToNodeIdMap:125-135 and
  siblings) -> the engine's KB Arrow table.
"""

from __future__ import annotations

import re

import pyarrow as pa

_QUERY_RE = re.compile(
    r"<query\s+id=\"([^\"]+)\">(.*?)</query>", re.DOTALL
)
_FIELD_RE = re.compile(r"<(name|docid|beg|end)>\s*(.*?)\s*</\1>", re.DOTALL)


def parse_kbp_queries(xml_text: str) -> pa.Table:
    """XML text -> (mention_id, surface, conv_id, beg, end); beg/end are
    -1 for the 2011 offset-less variant (KBPQuery.scala:115-133)."""
    ids, names, docs, begs, ends = [], [], [], [], []
    for m in _QUERY_RE.finditer(xml_text):
        fields = dict(_FIELD_RE.findall(m.group(2)))
        ids.append(m.group(1))
        names.append(fields.get("name", ""))
        docs.append(fields.get("docid", ""))
        begs.append(int(fields["beg"]) if "beg" in fields else -1)
        ends.append(int(fields["end"]) if "end" in fields else -1)
    return pa.table(
        {
            "mention_id": pa.array(ids, pa.string()),
            "surface": pa.array(names, pa.string()),
            "conv_id": pa.array(docs, pa.string()),
            "beg": pa.array(begs, pa.int32()),
            "end": pa.array(ends, pa.int32()),
        }
    )


def read_kbp_queries_xml(path: str):
    """One-file XML -> Dataset of labeled mentions."""
    import ray.data

    with open(path, encoding="utf-8") as f:
        tbl = parse_kbp_queries(f.read())
    return ray.data.from_arrow(tbl)


def kb_table_from_tsv(path: str, encoding: str = "utf-8") -> pa.Table:
    """``id\\ttitle\\ttype`` lines -> minimal KB table (missing columns
    defaulted) compatible with el.kb.KBIndex.from_table."""
    ids, titles, types = [], [], []
    with open(path, encoding=encoding) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            ids.append(parts[0])
            titles.append(parts[1] if len(parts) > 1 else "")
            types.append(parts[2] if len(parts) > 2 else "")
    n = len(ids)
    return pa.table(
        {
            "kb_id": pa.array(ids, pa.string()),
            "title": pa.array(titles, pa.string()),
            "type": pa.array(types, pa.string()),
            "wiki_type": pa.array([""] * n, pa.string()),
            "intro_text": pa.array([""] * n, pa.string()),
            "aliases": pa.array([[]] * n, pa.list_(pa.string())),
            "named_entities": pa.array([[]] * n, pa.list_(pa.string())),
            "ambiguity": pa.array([0] * n, pa.int32()),
        }
    )


def read_transcripts_jsonl(path: str):
    """Transcript corpus from JSON-lines shards (one turn per line,
    keys conv_id/turn_idx/role/text[/tool]) -> the engine's transcript
    schema with turn_idx pinned to int32. A thin, schema-normalizing
    wrapper over ``ray.data.read_json`` so pipelines written against
    the parquet source run unchanged on JSONL drops."""
    import pyarrow.compute as pc
    import ray.data

    def normalize(t: pa.Table) -> pa.Table:
        cols = {
            "conv_id": pc.cast(t.column("conv_id"), pa.string()),
            "turn_idx": pc.cast(t.column("turn_idx"), pa.int32()),
            "text": pc.cast(t.column("text"), pa.string()),
        }
        for opt in ("role", "tool"):
            if opt in t.column_names:
                cols[opt] = pc.cast(t.column(opt), pa.string())
        return pa.table(cols)

    return ray.data.read_json(path).map_batches(
        normalize, batch_format="pyarrow")
