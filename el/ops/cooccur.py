"""Conversation-level co-mention statistics.

The analog of the reference's per-document extraction-vector join
(linkVec/argVec from the OpenIE store grouped by doc,
ExtrSolrHelper.scala:17-45, MentionPairFeatures.scala:34-36): which
surfaces co-occur in the same conversation, and how often, across the
corpus. One conv_id hash exchange for the per-conversation distinct
pairs, one pair-key exchange for the corpus counts.
"""

from __future__ import annotations

import pandas as pd

from ..shuffle import group_blocks


def comention_counts(mentions_ds, num_partitions: int | None = None):
    """mentions (conv_id, surface) -> (s1, s2, n_convs): number of
    conversations in which both surfaces appear (s1 < s2)."""

    def conv_pairs(df: pd.DataFrame) -> pd.DataFrame:
        import logging

        if len(df) == 0:
            return pd.DataFrame({"s1": pd.Series(dtype=str),
                                 "s2": pd.Series(dtype=str)})
        cap = 1000  # quadratic guard for degenerate conversations
        rows = []
        for conv_id, g in df.groupby("conv_id", sort=True):
            surfaces = sorted(set(g["surface"]))
            if len(surfaces) > cap:
                dropped = (len(surfaces) * (len(surfaces) - 1)
                           - cap * (cap - 1)) // 2
                logging.getLogger(__name__).warning(
                    "comention_counts: conversation %s has %d distinct "
                    "surfaces; capped at %d (%d pairs dropped)",
                    conv_id, len(surfaces), cap, dropped)
                surfaces = surfaces[:cap]
            for i in range(len(surfaces)):
                for j in range(i + 1, len(surfaces)):
                    rows.append((surfaces[i], surfaces[j]))
        return pd.DataFrame(rows, columns=["s1", "s2"])

    pairs = group_blocks(mentions_ds.select_columns(["conv_id", "surface"]),
                         ["conv_id"], conv_pairs, batch_format="pandas",
                         num_partitions=num_partitions)

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"s1": pd.Series(dtype=str),
                                 "s2": pd.Series(dtype=str),
                                 "n_convs": pd.Series(dtype="int64")})
        out = df.groupby(["s1", "s2"], as_index=False).size().rename(
            columns={"size": "n_convs"}
        )
        out["n_convs"] = out["n_convs"].astype("int64")
        return out

    return group_blocks(pairs, ["s1"], count_pairs, batch_format="pandas",
                        num_partitions=num_partitions)
