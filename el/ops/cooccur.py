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


def pmi_pairs(mentions_ds, num_partitions: int | None = None):
    """Pointwise mutual information per co-mention pair (collocation
    mining): PMI(a,b) = ln(c_ab * N / (c_a * c_b)) over conversation
    counts. Three exchanges total — the two inside
    :func:`comention_counts` plus one surface-count combiner — with the
    per-surface counts broadcast as a zero-copy Arrow table (surface-
    bounded) and looked up via index_in per batch; N is a scalar
    aggregate. Inherits :func:`comention_counts`' 1000-distinct-
    surfaces-per-conversation pair cap (loudly logged there; like that
    operator's oracle, the SQL models no cap — exactness holds for
    corpora below it). Out: (s1, s2, n_convs, pmi[5dp])."""
    import numpy as np
    import pyarrow as pa

    from .textstats import round_half_away

    m = mentions_ds.select_columns(["conv_id", "surface"])

    def conv_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    distinct = group_blocks(m.map_batches(conv_partial,
                                          batch_format="pandas"),
                            ["conv_id", "surface"], conv_partial,
                            batch_format="pandas",
                            num_partitions=num_partitions).materialize()

    def conv_heads(df: pd.DataFrame) -> pd.DataFrame:
        return df[["conv_id"]].drop_duplicates()

    # exact distinct-conversation count, fully distributed: one conv_id
    # exchange emitting one row per conversation, then a streaming count
    n_convs_total = float(
        group_blocks(distinct.map_batches(conv_heads,
                                          batch_format="pandas"),
                     ["conv_id"], conv_heads, batch_format="pandas",
                     num_partitions=num_partitions).count())
    import ray

    def surf_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("surface", as_index=False).size().rename(
            columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    cs = group_blocks(distinct, ["surface"], surf_counts,
                      batch_format="pandas",
                      num_partitions=num_partitions).materialize()
    cs_parts = [t for t in ray.get(list(cs.to_arrow_refs()))
                if t.num_rows]
    cs_tbl = (pa.concat_tables(cs_parts) if cs_parts
              else pa.table({"surface": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())}))
    cs_ref = ray.put(cs_tbl)

    pairs = comention_counts(distinct, num_partitions=num_partitions)

    class _Pmi:
        def __init__(self, cs_ref, n_total: float):
            import ray as _r

            t = _r.get(cs_ref)
            self.surf = t.column("surface").combine_chunks()
            self.c = t.column("c").combine_chunks()
            self.n = n_total

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if t.num_rows == 0:
                return pa.table({"s1": pa.array([], pa.string()),
                                 "s2": pa.array([], pa.string()),
                                 "n_convs": pa.array([], pa.int64()),
                                 "pmi": pa.array([], pa.float64())})
            ca = self.c.take(pc.index_in(
                t.column("s1").combine_chunks(), value_set=self.surf)) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            cb = self.c.take(pc.index_in(
                t.column("s2").combine_chunks(), value_set=self.surf)) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            cab = t.column("n_convs").to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            # operand order mirrors the SQL: (c_ab * N) / (c_a * c_b)
            pmi = np.log(cab * self.n / (ca * cb))
            return pa.table({
                "s1": t.column("s1"),
                "s2": t.column("s2"),
                "n_convs": t.column("n_convs").cast(pa.int64()),
                "pmi": pa.array(round_half_away(pmi, 5), pa.float64()),
            })

    return pairs.map_batches(_Pmi, fn_constructor_args=(cs_ref,
                                                        n_convs_total),
                             batch_format="pyarrow", concurrency=4,
                             num_cpus=0.5)
