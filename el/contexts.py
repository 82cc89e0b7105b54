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

from .shuffle import group_blocks


def _ctx_block(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return pd.DataFrame({"conv_id": pd.Series(dtype=str),
                             "turn_idx": pd.Series(dtype="int32"),
                             "context": pd.Series(dtype=str),
                             "wide_context": pd.Series(dtype=str)})
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
    return out


def build_turn_contexts(transcripts_ds, num_partitions: int | None = None):
    """transcripts -> (conv_id, turn_idx, context, wide_context)."""
    narrow = transcripts_ds.select_columns(["conv_id", "turn_idx", "text"])
    return group_blocks(narrow, ["conv_id"], _ctx_block,
                        batch_format="pandas", num_partitions=num_partitions)
