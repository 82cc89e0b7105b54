"""Context assembly: per-turn narrow/wide contexts from neighboring
turns of the same conversation.

The reference fetches the whole document per mention and extracts an
enclosing sentence/paragraph plus a wide span (SolrHelper.scala:43-188,
M1-M4); our document is the conversation, so the analog is the mention
turn ± a window of neighboring turns. One hash exchange on conv_id,
then a vectorized in-block shift-join (no per-row Python):

  wide_context(turn i) = concat_ws(' ', text[i-1], text[i], text[i+1])

which is exactly DuckDB's
  concat_ws(' ', lag(text) OVER w, text, lead(text) OVER w)
— the oracle for this stage.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .shuffle import group_blocks


def _ctx_block(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return pd.DataFrame({"conv_id": pd.Series(dtype=str),
                             "turn_idx": pd.Series(dtype="int32"),
                             "context": pd.Series(dtype=str),
                             "wide_context": pd.Series(dtype=str),
                             "headline": pd.Series(dtype=str)})
    df = df.sort_values(["conv_id", "turn_idx"])
    g = df.groupby("conv_id")["text"]
    prev = g.shift(1)
    nxt = g.shift(-1)
    wide = (
        prev.fillna("").str.cat(df["text"], sep=" ").str.cat(
            nxt.fillna(""), sep=" "
        ).str.strip()
    )
    out = df[["conv_id", "turn_idx"]].copy()
    out["context"] = df["text"]
    out["wide_context"] = wide
    # M3 headline analog (SolrHelper.scala:190-205): the conversation's
    # FIRST turn stands in for <HEADLINE>/first <P>
    out["headline"] = g.transform("first")
    return out


def build_turn_contexts(transcripts_ds, num_partitions: int | None = None):
    """transcripts -> (conv_id, turn_idx, context, wide_context)."""
    narrow = transcripts_ds.select_columns(["conv_id", "turn_idx", "text"])
    return group_blocks(narrow, ["conv_id"], _ctx_block,
                        batch_format="pandas", num_partitions=num_partitions)


def _coref_block(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return pd.DataFrame({"mention_id": pd.Series(dtype=str),
                             "coref_context": pd.Series(dtype=str)})
    t = df[df["kind"] == "t"]
    m = df[df["kind"] == "m"]
    if len(m) == 0:
        return pd.DataFrame({"mention_id": pd.Series(dtype=str),
                             "coref_context": pd.Series(dtype=str)})
    withtext = m.merge(t[["conv_id", "turn_idx", "text"]],
                       on=["conv_id", "turn_idx"], suffixes=("", "_turn"))
    st = withtext[["conv_id", "surface", "turn_idx", "text_turn"]] \
        .drop_duplicates(["conv_id", "surface", "turn_idx"]) \
        .sort_values(["conv_id", "surface", "turn_idx"])
    agg = st.groupby(["conv_id", "surface"], sort=False)["text_turn"] \
        .agg(" ".join).reset_index().rename(
            columns={"text_turn": "coref_context"})
    out = m[["mention_id", "conv_id", "surface"]].merge(
        agg, on=["conv_id", "surface"])
    return out[["mention_id", "coref_context"]]


def build_coref_contexts(transcripts_ds, mentions_ds,
                         num_partitions: int | None = None):
    """Repeat-mention coref-context analog (M4/M9): for each mention,
    the space-joined texts of the DISTINCT turns of its conversation
    where the SAME surface occurs, in turn order — the deterministic
    stand-in for the reference's coref-offsets context union
    (KBPQuery.scala:34-57, CorefHelperMethods.scala:139-164). One
    conv_id hash exchange co-locating turn rows with mention rows, then
    a vectorized in-block merge+groupby; oracle: join + string_agg OVER
    (PARTITION BY conv, surface ORDER BY turn_idx)."""
    t_rows = transcripts_ds.select_columns(["conv_id", "turn_idx", "text"]) \
        .map_batches(
            lambda t: t.append_column(
                "mention_id", pa.array([""] * len(t))
            ).append_column(
                "surface", pa.array([""] * len(t))
            ).append_column("kind", pa.array(["t"] * len(t))),
            batch_format="pyarrow",
        )
    m_rows = mentions_ds.select_columns(
        ["mention_id", "conv_id", "turn_idx", "surface"]
    ).map_batches(
        lambda t: t.append_column(
            "text", pa.array([""] * len(t))
        ).append_column(
            "kind", pa.array(["m"] * len(t))
        ).select(["conv_id", "turn_idx", "text", "mention_id", "surface",
                  "kind"]),
        batch_format="pyarrow",
    )
    return group_blocks(t_rows.union(m_rows), ["conv_id"], _coref_block,
                        batch_format="pandas", num_partitions=num_partitions)
