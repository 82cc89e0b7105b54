"""Training-corpus curation: the per-document gate composite a
large-scale data pipeline runs before training — language filter,
token-count quality floor, exact-duplicate collapse and near-duplicate
drop — in one streaming plan, emitting EVERY document with its
retention decision and the first gate that failed it.

Built entirely on the other ops in this package (textstats batch fns,
the exact-dedup fingerprint exchange, the MinHash+LSH pair path and
pair-graph resolution in dedup.py); the reference repo has no such
surface — this is a "beyond the reference" training-data operator.

Scale shape: one stateless stats pass over the corpus, the exact-dup
exchange keyed on the md5 fingerprint, the shuffle-native minhash
near-dup path (dedup.py), pair-graph components on the PAIR set only,
then ONE hash join uniting the three per-doc flag tables (group_blocks
union idiom). No corpus-scale driver structure anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

GATES = ("lang", "quality", "exact_dup", "near_dup")

_OUT_EMPTY = {
    "doc_id": "int64", "lang_guess": "str",
    "n_tokens": "int64", "reason": "str",
}


def curate_corpus(docs_ds, *, keep_lang: str = "en", min_tokens: int = 5,
                  near_threshold: float = 0.8,
                  num_partitions: int | None = None):
    """(doc_id, lang_guess, n_tokens, reason) for every document —
    reason is '' (retained) or the FIRST failed gate in GATES order:
    'lang' (lang_guess != keep_lang), 'quality'
    (n_tokens < min_tokens), 'exact_dup' (an identical-text doc with a
    smaller doc_id exists), 'near_dup' (dropped by the minhash
    pair-graph resolution, min-doc_id canonical wins). The dedup gates
    run over the FULL corpus, independent of the scalar gates, so the
    decision for one document never depends on another's language or
    quality verdict.
    """
    from ..shuffle import group_blocks
    from .dedup import minhash_dedup_pairs, resolve_near_dups
    from .textstats import (fingerprint_batch, lang_id_batch,
                            token_count_batch)

    docs_ds = docs_ds.materialize()  # consumed by three passes

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        out = lang_id_batch(df)
        out["n_tokens"] = token_count_batch(df)["n_tokens"].values
        out["fp"] = fingerprint_batch(df)["fp"].values
        return out

    st = docs_ds.map_batches(stats, batch_format="pandas")

    def exact_min(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "exact_keep": pd.Series(dtype="int64")})
        m = df.groupby("fp")["doc_id"].transform("min")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "exact_keep": (df["doc_id"] == m).astype("int64"),
        })

    exact = group_blocks(st, ["fp"], exact_min, batch_format="pandas",
                         num_partitions=num_partitions)
    near = resolve_near_dups(
        docs_ds, minhash_dedup_pairs(docs_ds, threshold=near_threshold),
        num_partitions=num_partitions)

    def s_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["doc_id"].astype("int64"), "kind": "s",
            "lang_guess": df["lang_guess"],
            "n_tokens": df["n_tokens"].astype("int64"),
            "flag": np.zeros(len(df), dtype=np.int64),
        })

    def flag_rows(kind: str, col: str):
        def rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "key": df["doc_id"].astype("int64"), "kind": kind,
                "lang_guess": "", "n_tokens": np.int64(0),
                "flag": df[col].astype("int64"),
            })

        rows.__name__ = f"{kind}_rows"
        return rows

    u = st.map_batches(s_rows, batch_format="pandas").union(
        exact.map_batches(flag_rows("e", "exact_keep"),
                          batch_format="pandas"),
        near.map_batches(flag_rows("n", "keep"), batch_format="pandas"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in _OUT_EMPTY.items()})
        s = df[df["kind"] == "s"].set_index("key")
        e_ok = df[df["kind"] == "e"].set_index("key")["flag"] \
            .reindex(s.index).fillna(1).astype(bool)
        n_ok = df[df["kind"] == "n"].set_index("key")["flag"] \
            .reindex(s.index).fillna(1).astype(bool)
        lang_ok = (s["lang_guess"] == keep_lang).to_numpy()
        qual_ok = (s["n_tokens"] >= min_tokens).to_numpy()
        reason = np.where(
            ~lang_ok, "lang", np.where(
                ~qual_ok, "quality", np.where(
                    ~e_ok.to_numpy(), "exact_dup", np.where(
                        ~n_ok.to_numpy(), "near_dup", ""))))
        return pd.DataFrame({
            "doc_id": s.index.to_numpy(dtype=np.int64),
            "lang_guess": s["lang_guess"].to_numpy(),
            "n_tokens": s["n_tokens"].to_numpy(dtype=np.int64),
            "reason": reason,
        })

    return group_blocks(u, ["key"], finish, batch_format="pandas",
                        num_partitions=num_partitions)
