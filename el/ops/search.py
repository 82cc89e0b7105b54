"""Full-text retrieval: BM25 top-k over the documents table — the
lexical companion to the ANN family (el/ops/ann.py) in a training-data
pipeline (near-dup mining, targeted corpus slicing, eval-set retrieval).

Scale shape (two streaming corpus passes, no corpus-proportional driver
state):
1. **stats pass** (combiner): each batch emits ONE tiny partial row —
   doc count, summed doc length, and per-QUERY-TERM document
   frequencies (the query vocabulary is the only term set that ever
   leaves a worker; corpus df for the full vocabulary is never built).
   The driver folds the partials (O(batches x |terms|)) and broadcasts
   (idf per term, avgdl) once.
2. **score pass**: each batch scores its docs against every query
   (vectorized token counts), keeps a local top-k per query, and a
   per-q_id exchange merges the tiny candidate sets.

The BM25 form is the Lucene/Okapi one: idf = ln(1 + (N - df + .5) /
(df + .5)), tf-saturation k1 = 1.2, length normalization b = 0.75.
Duplicate query tokens contribute once per occurrence (query term
frequency as a multiplier via repetition), mirrored exactly in the SQL
oracle's unnest.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

BM25_K1 = 1.2
BM25_B = 0.75
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    """Lowercase alnum tokens — the same token rule as the textstats
    ops and their `regexp_extract_all(lower(text), '[a-z0-9]+')` SQL."""
    return _TOKEN_RE.findall(text.lower())


def _term_counts(texts: pd.Series, terms: list[str]) -> np.ndarray:
    """(n_docs, n_terms) exact-token tf matrix + doc lengths.
    Token-list count per term is C-speed list.count — the per-doc
    Python is one findall (shared by all terms), not per (doc, term)
    regex work."""
    toks = [
        _TOKEN_RE.findall(t.lower()) for t in texts
    ]
    dl = np.array([len(t) for t in toks], dtype=np.int64)
    tf = np.empty((len(toks), len(terms)), dtype=np.int64)
    for j, term in enumerate(terms):
        tf[:, j] = [t.count(term) for t in toks]
    return tf, dl


def bm25_topk(docs_ds, queries: list[str], k: int = 10,
              k1: float = BM25_K1, b: float = BM25_B):
    """-> Dataset (q_id, doc_id, score, rank): BM25 top-k docs per
    query string."""
    import functools

    import ray

    from ..shuffle import group_map_pandas
    from .ann import _merge_topk

    q_tokens = [tokenize(q) for q in queries]
    terms = sorted({t for qt in q_tokens for t in qt})

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        tf, dl = _term_counts(df["text"], terms)
        row = {"n_docs": np.int64(len(df)),
               "sum_dl": np.int64(dl.sum())}
        has = (tf > 0).sum(axis=0)
        for j, t in enumerate(terms):
            row[f"df_{j}"] = np.int64(has[j])
        return pd.DataFrame([row])

    def fold_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return pd.DataFrame([df.sum(axis=0).astype(np.int64)])

    # tree fold: one partial row per batch -> a small exchange -> one
    # summed row per fold partition, so the driver fold reads
    # O(partitions) rows, not O(batches) (exact: integer partial sums
    # are associative — same doubles on both sides as before)
    from ..shuffle import default_partitions

    parts = (docs_ds.map_batches(stats_partial, batch_format="pandas")
             .repartition(default_partitions())
             .map_batches(fold_block, batch_format="pandas",
                          batch_size=None)
             .to_pandas())
    n_docs = int(parts["n_docs"].sum())
    if n_docs == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "q_id": pd.Series(dtype="int64"),
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
            "rank": pd.Series(dtype="int64")}))
    # exact integer partial sums -> the same doubles on both sides
    avgdl = float(parts["sum_dl"].sum()) / float(n_docs)
    idf = np.array([
        math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for df in (int(parts[f"df_{j}"].sum()) for j in range(len(terms)))
    ])
    # per-query weight over the shared term axis: a token appearing
    # m times in the query contributes m-fold (Lucene query-tf)
    qw = np.zeros((len(queries), len(terms)))
    t_index = {t: j for j, t in enumerate(terms)}
    for qi, qt in enumerate(q_tokens):
        for t in qt:
            qw[qi, t_index[t]] += 1.0
    bcast = ray.put((terms, idf, qw, avgdl, float(k1), float(b), int(k)))

    def score_local(df: pd.DataFrame) -> pd.DataFrame:
        terms_, idf_, qw_, avgdl_, k1_, b_, k_ = ray.get(bcast)
        if len(df) == 0:
            return pd.DataFrame({"q_id": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        tf, dl = _term_counts(df["text"], terms_)
        norm = k1_ * (1.0 - b_ + b_ * (dl[:, None] / avgdl_))
        contrib = idf_[None, :] * (tf * (k1_ + 1.0)) / (tf + norm)
        scores = contrib @ qw_.T  # (docs, queries)
        outs = []
        ids = df["doc_id"].to_numpy()
        for qi in range(qw_.shape[0]):
            s = scores[:, qi]
            # local top-k (score desc, doc_id asc) — the per-q_id merge
            # only ever sees k candidates per batch
            sel = np.lexsort((ids, -s))[:min(len(s), k_)]
            outs.append(pd.DataFrame({
                "q_id": np.int64(qi), "vec_id": ids[sel],
                "sim": s[sel]}))
        return pd.concat(outs, ignore_index=True)

    local = docs_ds.map_batches(score_local, batch_format="pandas")
    merged = group_map_pandas(local, "q_id",
                              functools.partial(_merge_topk, k=k))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "q_id": df["q_id"].astype("int64"),
            "doc_id": df["vec_id"].astype("int64"),
            "score": df["sim"],
            "rank": df["rank"].astype("int64"),
        })

    return merged.map_batches(finish, batch_format="pandas")
