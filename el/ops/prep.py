"""Training-data preparation operators: PII redaction, corpus
vocabulary, benchmark decontamination, stratified sampling, and
per-document salient-term extraction.

All stages follow the engine's standard shapes — stateless vectorized
``map_batches`` for per-document work, one hash exchange
(`el.shuffle.group_blocks`) per grouping, broadcast (`ray.put`) for
small sides — and every output is reproducible bit-for-bit by a DuckDB
oracle (see `el/queries.py`): integer-exact rankings, md5 sample keys,
RE2-compatible regexes shared verbatim with the SQL side.

Scale notes (100 TB):
- pii_redact / doc_top_terms stage 1 are embarrassingly parallel.
- vocab_topk pre-aggregates per batch (combiner) so the token exchange
  moves one row per (batch, distinct token), then takes per-partition
  top-k (a superset of the global top-k because the exchange
  co-locates each token) and merges the tiny per-partition heads.
- decontaminate broadcasts only the BENCHMARK n-gram set — eval suites
  are millions of n-grams at most, the one side of this join that is
  small by construction; the corpus side streams.
- stratified_sample moves one row per document through a single
  stratum exchange; per-group selection is a vectorized argpartition.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import group_blocks

TOKEN_RE = r"[A-Za-z0-9]+"

# RE2-compatible (no backrefs / lookaround) so DuckDB regexp_replace
# replays them exactly. Order matters: emails first (their local part
# may contain digit runs a phone pattern could clip).
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


# ------------------------------------------------------------------ PII
def pii_redact_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized email/phone redaction with per-document counts."""
    text = df["text"]
    n_emails = text.str.count(EMAIL_RE).astype("int64")
    clean = text.str.replace(EMAIL_RE, "<EMAIL>", regex=True)
    n_phones = clean.str.count(PHONE_RE).astype("int64")
    clean = clean.str.replace(PHONE_RE, "<PHONE>", regex=True)
    out = df[["doc_id"]].copy()
    out["clean_text"] = clean
    out["n_emails"] = n_emails
    out["n_phones"] = n_phones
    return out


def pii_redact(docs_ds):
    return docs_ds.map_batches(pii_redact_batch, batch_format="pandas")


# -------------------------------------------------------- markup strip
TAG_RE = r"<[^>]+>"


def strip_markup_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized XML/HTML tag stripping (the reference's tag-stripper
    family, AnnotatorHelper stripTags analog): remove tags, collapse
    runs of whitespace, trim. RE2-safe patterns shared with the SQL
    oracle."""
    text = df["text"]
    n_tags = text.str.count(TAG_RE).astype("int64")
    clean = (text.str.replace(TAG_RE, "", regex=True)
             .str.replace(r"\s+", " ", regex=True).str.strip())
    out = df[["doc_id"]].copy()
    out["clean_text"] = clean
    out["n_tags"] = n_tags
    return out


def strip_markup(docs_ds):
    return docs_ds.map_batches(strip_markup_batch, batch_format="pandas")


# ----------------------------------------------------------- vocabulary
def _token_counts_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combiner: one row per distinct token in the batch."""
    toks = df["text"].str.lower().str.findall(TOKEN_RE)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks]) \
        if len(toks) else np.array([], dtype=object)
    if len(flat) == 0:
        return pd.DataFrame({"token": pd.Series(dtype=str),
                             "cnt": pd.Series(dtype="int64")})
    uniq, counts = np.unique(flat.astype(str), return_counts=True)
    return pd.DataFrame({"token": uniq, "cnt": counts.astype("int64")})


def vocab_topk(docs_ds, k: int = 100):
    """Corpus-wide top-k token frequencies (vocabulary building).

    Combiner -> one token-hash exchange -> per-partition top-k (each
    token lives wholly in one partition, so the global top-k is a
    subset of the union of partition top-ks) -> tiny final merge."""

    partials = docs_ds.map_batches(_token_counts_partial,
                                   batch_format="pandas")

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"token": pd.Series(dtype=str),
                                 "cnt": pd.Series(dtype="int64")})
        out = df.groupby("token", as_index=False)["cnt"].sum()
        out = out.sort_values(["cnt", "token"],
                              ascending=[False, True]).head(k)
        out["cnt"] = out["cnt"].astype("int64")
        return out.reset_index(drop=True)

    heads = group_blocks(partials, ["token"], merge_topk,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return merge_topk(df)

    # per-partition heads are <= n_partitions * k rows — trivially small
    return heads.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


# ------------------------------------------------------ decontamination
def _doc_ngrams(texts: pd.Series, n: int) -> pd.Series:
    """Per-document DISTINCT word n-gram sets (lowercased tokens)."""
    toks = texts.str.lower().str.findall(TOKEN_RE)

    def grams(ws) -> set:
        if len(ws) < n:
            return set()
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    return toks.map(grams)


def decontaminate(docs_ds, *, n: int = 8, bench_mod: int = 97):
    """Flag training documents sharing any word n-gram with a held-out
    benchmark set (train/eval decontamination).

    The benchmark side (``doc_id % bench_mod == 0``) is aggregated to a
    distinct n-gram set and broadcast once with ``ray.put`` — eval
    suites are small by construction, so this is the canonical
    broadcast-small-side join, not a shuffle. The corpus side streams:
    one stateless pass computing per-document hit counts."""
    import ray

    def bench_grams_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df[df["doc_id"] % bench_mod == 0]
        out: set = set()
        for g in _doc_ngrams(b["text"], n):
            out |= g
        # typed even when empty: a bare [] infers float64 and trips the
        # executor's schema-drift warning against non-empty str blocks
        return pd.DataFrame({"g": pd.Series(sorted(out), dtype=str)})

    bench_tbl = (
        docs_ds.map_batches(bench_grams_partial, batch_format="pandas")
        .to_pandas()  # distinct benchmark n-grams: small by construction
    )
    bench_set = set(bench_tbl["g"].tolist())
    bench_ref = ray.put(bench_set)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bset = ray.get(bench_ref)
        train = df[df["doc_id"] % bench_mod != 0]
        hits = _doc_ngrams(train["text"], n).map(
            lambda gs: len(gs & bset))
        out = train[["doc_id"]].copy()
        out["n_hits"] = hits.astype("int64")
        out["contaminated"] = hits > 0
        return out

    return docs_ds.map_batches(score, batch_format="pandas")


# -------------------------------------------------------------- sampling
def _md5_key(ids: pd.Series) -> pd.Series:
    return ids.map(lambda i: hashlib.md5(str(i).encode()).hexdigest())


def stratified_sample(docs_ds, *, stratum: str = "lang",
                      per_stratum: int = 20):
    """Deterministic per-stratum sample: the ``per_stratum`` documents
    with the lowest md5(doc_id) rank inside each stratum (hash-ranked
    sampling — seedless, engine-independent, SQL-replayable).

    One stratum-hash exchange; rows carry only (doc_id, stratum, key)."""

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id", stratum]].copy()
        out["smp_key"] = _md5_key(df["doc_id"])
        return out

    slim = docs_ds.map_batches(keyed, batch_format="pandas")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 stratum: pd.Series(dtype=str)})
        df = df.sort_values(["smp_key", "doc_id"])
        out = df.groupby(stratum, as_index=False, sort=False).head(
            per_stratum)
        return out[["doc_id", stratum]].reset_index(drop=True)

    return group_blocks(slim, [stratum], pick, batch_format="pandas")


def weighted_sample(docs_ds, *, k: int = 200):
    """Weight-proportional sample WITHOUT replacement (Efraimidis &
    Spirakis 2006, the A-ES one-pass reservoir): each document draws a
    deterministic uniform u from md5(doc_id) and gets priority
    ln(u)/w — the global top-k priorities are a sample where inclusion
    probability is proportional to the weight w (here the token
    count: longer docs weigh more, the training-mix sampling shape).
    Zero-token documents are excluded (w = 0 has no valid priority).

    Determinism/replayability: u = ((md5_u64 >> 11) + 1) / 2^53 — a
    53-bit hash, so u is an EXACT double and the only float ops are
    one libm ln and one divide, identical in numpy and DuckDB.

    Scale shape: per-batch local top-k (O(k) rows leave each batch)
    -> one tiny single-partition merge — the orders_topk pattern; no
    exchange touches corpus-scale data."""
    from ..scorer import md5_u64

    def local(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "n_tokens": pd.Series(dtype="int64"),
                              "priority": pd.Series(dtype="float64")})
        if len(df) == 0:
            return empty
        w = df["text"].str.count(TOKEN_RE).astype("int64").to_numpy()
        keep = w > 0
        if not keep.any():
            return empty
        ids = df["doc_id"].to_numpy()[keep]
        w = w[keep]
        h = md5_u64([str(i) for i in ids])
        u = ((h >> np.uint64(11)).astype("float64") + 1.0) / 2.0**53
        pri = np.log(u) / w
        out = pd.DataFrame({"doc_id": ids, "n_tokens": w,
                            "priority": pri})
        out = out.sort_values(["priority", "doc_id"],
                              ascending=[False, True]).head(k)
        return out.reset_index(drop=True)

    heads = docs_ds.map_batches(local, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        from .textstats import round_half_away

        df = df.sort_values(["priority", "doc_id"],
                            ascending=[False, True]).head(k)
        df = df.copy()
        df["priority"] = round_half_away(df["priority"].to_numpy(), 10)
        return df.reset_index(drop=True)

    return heads.repartition(1).map_batches(merge, batch_format="pandas",
                                            batch_size=None)


# ----------------------------------------------------- group quantiles
def group_quantiles(docs_ds, *, group: str = "lang",
                    qs: tuple = (0.5, 0.9)):
    """Exact per-group order-statistic quantiles of the token count
    (corpus length profiling). Discrete quantile rule is DuckDB's
    ``quantile_disc``: sorted[ceil(n*q) - 1], computed in float64 on
    both sides so the index math is bit-identical.

    One slim exchange (group, n_tokens); block-local numpy sort."""

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group]].copy()
        out["n_tokens"] = df["text"].str.count(TOKEN_RE).astype("int64")
        return out

    rows = docs_ds.map_batches(slim, batch_format="pandas")

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            cols = {group: pd.Series(dtype=str),
                    "n_docs": pd.Series(dtype="int64")}
            for q in qs:
                cols[f"q{int(q * 100)}_tokens"] = pd.Series(dtype="int64")
            return pd.DataFrame(cols)
        recs = []
        for g, sub in df.groupby(group, sort=False):
            v = np.sort(sub["n_tokens"].to_numpy())
            rec = {group: g, "n_docs": len(v)}
            for q in qs:
                idx = int(np.ceil(len(v) * q)) - 1  # quantile_disc rule
                rec[f"q{int(q * 100)}_tokens"] = int(v[idx])
            recs.append(rec)
        out = pd.DataFrame(recs)
        out["n_docs"] = out["n_docs"].astype("int64")
        for q in qs:
            c = f"q{int(q * 100)}_tokens"
            out[c] = out[c].astype("int64")
        return out

    return group_blocks(rows, [group], stats, batch_format="pandas")


# ------------------------------------------------------ inverted index
def inverted_index(docs_ds):
    """Term -> posting list (sorted distinct doc_ids, comma-joined) +
    document frequency. One term-hash exchange over distinct
    (term, doc_id) rows; postings serialize as strings so the output
    is flat-schema (a production index would shard hot terms'
    postings — at this granularity the term hash exchange IS the
    shard)."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE).map(set)
        n = toks.map(len)
        if n.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype=str),
                                 "doc_id": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "term": np.concatenate(
                [np.asarray(sorted(s), dtype=object) for s in toks]
            ).astype(str),
            "doc_id": df["doc_id"].repeat(n).to_numpy(),
        })

    tp = docs_ds.map_batches(pairs, batch_format="pandas")

    def posting(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"term": pd.Series(dtype=str),
                                 "df": pd.Series(dtype="int64"),
                                 "postings": pd.Series(dtype=str)})
        df = df.sort_values(["term", "doc_id"])
        g = df.groupby("term", sort=False)["doc_id"]
        out = pd.DataFrame({
            "term": g.size().index,
            "df": g.size().to_numpy().astype("int64"),
            "postings": g.apply(
                lambda s: ",".join(str(i) for i in s)).to_numpy(),
        })
        return out.reset_index(drop=True)

    return group_blocks(tp, ["term"], posting, batch_format="pandas")


# -------------------------------------------------------- bigram counts
def _bigram_counts_partial(df: pd.DataFrame) -> pd.DataFrame:
    toks = df["text"].str.lower().str.findall(TOKEN_RE)
    grams: list = []
    for ws in toks:
        grams.extend(ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1))
    if not grams:
        return pd.DataFrame({"token": pd.Series(dtype=str),
                             "cnt": pd.Series(dtype="int64")})
    uniq, counts = np.unique(np.asarray(grams, dtype=object).astype(str),
                             return_counts=True)
    return pd.DataFrame({"token": uniq, "cnt": counts.astype("int64")})


def bigram_topk(docs_ds, k: int = 100):
    """Corpus-wide top-k token-bigram counts (LM n-gram statistics).
    Same shape as vocab_topk: combiner -> one exchange -> per-partition
    top-k -> tiny merge."""

    partials = docs_ds.map_batches(_bigram_counts_partial,
                                   batch_format="pandas")

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"token": pd.Series(dtype=str),
                                 "cnt": pd.Series(dtype="int64")})
        out = df.groupby("token", as_index=False)["cnt"].sum()
        out = out.sort_values(["cnt", "token"],
                              ascending=[False, True]).head(k)
        out["cnt"] = out["cnt"].astype("int64")
        return out.reset_index(drop=True)

    heads = group_blocks(partials, ["token"], merge_topk,
                         batch_format="pandas")
    return heads.repartition(1).map_batches(merge_topk,
                                            batch_format="pandas",
                                            batch_size=None)


# ------------------------------------------------------- salient terms
def _tf_explode(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, term, tf) rows — each document is one input row, so tf
    is complete per batch."""
    toks = df["text"].str.lower().str.findall(TOKEN_RE)
    ex = pd.DataFrame({
        "doc_id": df["doc_id"].repeat(toks.map(len)).to_numpy(),
        "term": np.concatenate(
            [np.asarray(t, dtype=object) for t in toks]
        ).astype(str) if toks.map(len).sum() else np.array([], dtype=str),
    })
    if len(ex) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "term": pd.Series(dtype=str),
                             "tf": pd.Series(dtype="int64")})
    out = ex.groupby(["doc_id", "term"], as_index=False).size()
    out = out.rename(columns={"size": "tf"})
    out["tf"] = out["tf"].astype("int64")
    return out


def doc_top_terms(docs_ds, *, k: int = 3):
    """Per-document top-k salient terms, TF-IDF-style but integer-exact:
    rank by (tf DESC, document-frequency ASC, term ASC) so rare terms
    win ties and the ordering is bit-reproducible in SQL.

    Two hash exchanges: term (attach global df) then doc_id (rank)."""

    tf = docs_ds.map_batches(_tf_explode, batch_format="pandas")

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "term": pd.Series(dtype=str),
                                 "tf": pd.Series(dtype="int64"),
                                 "df": pd.Series(dtype="int64")})
        # (doc_id, term) rows are unique, and the exchange co-located
        # every row of each term: df = rows per term in this block.
        out = df.copy()
        out["df"] = df.groupby("term")["term"].transform("size") \
            .astype("int64")
        return out

    with_df = group_blocks(tf, ["term"], attach_df, batch_format="pandas")

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "term": pd.Series(dtype=str),
                                 "tf": pd.Series(dtype="int64"),
                                 "df": pd.Series(dtype="int64")})
        df = df.sort_values(["doc_id", "tf", "df", "term"],
                            ascending=[True, False, True, True])
        out = df.groupby("doc_id", as_index=False, sort=False).head(k)
        return out[["doc_id", "term", "tf", "df"]].reset_index(drop=True)

    return group_blocks(with_df, ["doc_id"], rank, batch_format="pandas")


# ------------------------------------------------- repetition scoring
def repetition_batch(df: pd.DataFrame, *, n: int = 2) -> pd.DataFrame:
    """Per-document repeated word-n-gram statistics (boilerplate /
    degenerate-text detection, the n-gram analog of repeated-line
    filters in web-corpus curation): total grams, distinct grams, the
    duplicated fraction, and the hottest gram's count.

    Vectorized: one explode to a flat token array, shifted-concat
    bigram construction in numpy, a single pandas groupby. Integers
    plus one half-away-rounded float, so the DuckDB oracle replays it
    bit-for-bit."""
    from .textstats import round_half_away

    doc_ids = df["doc_id"].to_numpy()
    toks = df["text"].str.lower().str.findall(TOKEN_RE)
    lens = toks.map(len).to_numpy()
    zero = pd.DataFrame({
        "doc_id": doc_ids.astype("int64"),
        "n_grams": np.zeros(len(df), dtype="int64"),
        "n_uniq_grams": np.zeros(len(df), dtype="int64"),
        "dup_ratio": np.zeros(len(df), dtype="float64"),
        "top_gram_count": np.zeros(len(df), dtype="int64"),
    })
    if len(df) == 0 or lens.sum() == 0:
        return zero
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    docs = np.repeat(doc_ids, lens)
    # gram i spans tokens [i, i+n) — valid iff all n tokens share a doc
    valid = np.ones(max(len(flat) - (n - 1), 0), dtype=bool)
    for k in range(1, n):
        valid &= docs[: len(valid)] == docs[k: k + len(valid)]
    if not valid.any():
        return zero
    parts = [pd.Series(flat[k: k + len(valid)][valid]) for k in range(n)]
    grams = parts[0].str.cat(parts[1:], sep=" ")
    gdf = pd.DataFrame({"doc_id": docs[: len(valid)][valid],
                        "gram": grams.to_numpy()})
    per_gram = gdf.groupby(["doc_id", "gram"], sort=False).size()
    agg = per_gram.groupby(level=0).agg(["sum", "size", "max"])
    agg.columns = ["n_grams", "n_uniq_grams", "top_gram_count"]
    out = zero.set_index("doc_id")
    out.loc[agg.index, ["n_grams", "n_uniq_grams", "top_gram_count"]] = \
        agg.astype("int64")
    out["dup_ratio"] = np.where(
        out["n_grams"] > 0,
        round_half_away(
            1.0 - out["n_uniq_grams"] / np.maximum(out["n_grams"], 1), 6),
        0.0)
    out = out.reset_index()
    for c in ("n_grams", "n_uniq_grams", "top_gram_count"):
        out[c] = out[c].astype("int64")
    return out


def repetition_score(docs_ds, *, n: int = 2):
    """Stateless vectorized scan — embarrassingly parallel at 100 TB."""
    return docs_ds.map_batches(repetition_batch, fn_kwargs={"n": n},
                               batch_format="pandas")


# --------------------------------------------------- sequence packing
def _pack_count_block(tbl, token_re: str):
    """Wave-1 task: per-doc token counts for one ordered block, plus
    the block's token total (the only value the driver collects)."""
    import re as _re

    pat = _re.compile(token_re)
    texts = tbl.column("text").to_pylist()
    n = np.fromiter((len(pat.findall(t or "")) for t in texts),
                    dtype=np.int64, count=len(texts))
    counts = pa.table({"doc_id": tbl.column("doc_id").cast(pa.int64()),
                       "n_tokens": pa.array(n, pa.int64())})
    return counts, int(n.sum())


def _pack_emit_block(counts: pa.Table, offset: int, seq_len: int):
    """Wave-2 task: given this block's global token offset, emit one
    row per (doc, crossed sequence) with in-doc token spans."""
    n = counts.column("n_tokens").to_numpy()
    doc = counts.column("doc_id").to_numpy()
    g0 = offset + np.concatenate(([0], np.cumsum(n)[:-1]))
    keep = n > 0
    n, doc, g0 = n[keep], doc[keep], g0[keep]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "seq_id": pa.array([], pa.int64()),
                      "tok_start": pa.array([], pa.int64()),
                      "tok_end": pa.array([], pa.int64())})
    if len(n) == 0:
        return empty
    first = g0 // seq_len
    last = (g0 + n - 1) // seq_len
    n_seqs = (last - first + 1).astype(np.int64)
    doc_r = np.repeat(doc, n_seqs)
    g0_r = np.repeat(g0, n_seqs)
    n_r = np.repeat(n, n_seqs)
    # seq_id = first[doc] + within-doc arange
    starts = np.repeat(first, n_seqs)
    csum = np.concatenate(([0], np.cumsum(n_seqs)[:-1]))
    within = np.arange(n_seqs.sum(), dtype=np.int64) - np.repeat(csum, n_seqs)
    seq = starts + within
    tok_start = np.maximum(seq * seq_len - g0_r, 0)
    tok_end = np.minimum((seq + 1) * seq_len - g0_r, n_r)
    return pa.table({"doc_id": pa.array(doc_r, pa.int64()),
                     "seq_id": pa.array(seq, pa.int64()),
                     "tok_start": pa.array(tok_start, pa.int64()),
                     "tok_end": pa.array(tok_end, pa.int64())})


def token_pack(docs_ds, *, seq_len: int = 128, token_re: str = TOKEN_RE):
    """GPT-style sequence packing: concatenate every document's tokens
    in doc_id order and cut fixed-length training sequences of exactly
    ``seq_len`` tokens; emit one row per (document, sequence) span —
    a document crossing a cut yields one row per crossed sequence.

    This is a DISTRIBUTED PREFIX SUM, the one aggregation shape the
    engine didn't have: wave 1 computes per-doc token counts per
    ordered block and returns each block's token TOTAL (one integer per
    block — the only thing the driver sees); the driver computes
    exclusive block offsets; wave 2 turns per-block cumsums + the
    offset into global token positions and emits spans, all numpy.
    No shuffle beyond the defining doc_id sort; at 100 TB the driver
    holds one int per block."""
    import ray
    import ray.data

    ds = docs_ds.select_columns(["doc_id", "text"]).sort("doc_id")
    refs = ds.to_arrow_refs()
    count_rem = ray.remote(num_returns=2)(_pack_count_block)
    pairs = [count_rem.remote(r, token_re) for r in refs]
    totals = ray.get([t for _, t in pairs])
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1])).astype(np.int64)
    emit_rem = ray.remote(_pack_emit_block)
    out = [emit_rem.remote(c, int(off), seq_len)
           for (c, _), off in zip(pairs, offsets)]
    return ray.data.from_arrow_refs(out)


# ------------------------------------------------------ source mixing
def _hex8_threshold(rate: float) -> str:
    """8-hex-digit lowercase threshold: a doc is kept iff the first 8
    hex chars of md5(doc_id) compare BELOW it. Fixed-width lowercase
    hex strings order exactly like their numeric values, so both sides
    (pandas and SQL) compare STRINGS — no float or integer parsing
    anywhere."""
    n = int(rate * (16 ** 8))
    return format(min(max(n, 0), 16 ** 8 - 1), "08x")


def source_mix(docs_ds, rates: dict[str, float], *,
               default_rate: float = 0.1):
    """Weighted corpus mixing: keep each document with its source's
    configured sampling rate, decided by hash rank (md5(doc_id), the
    same seedless key as stratified_sample) — the mixing step that
    up/down-weights sources when assembling a training corpus.

    Fully streaming: one stateless vectorized scan, NO exchange (the
    decision is per-row), embarrassingly parallel at 100 TB. Exact and
    engine-independent: rate r keeps exactly the documents whose hash
    prefix is below floor(r * 16^8), so DuckDB replays it with string
    comparisons."""
    thresholds = {s: _hex8_threshold(r) for s, r in rates.items()}
    keep_all = {s for s, r in rates.items() if r >= 1.0}
    default_thr = _hex8_threshold(default_rate)
    default_all = default_rate >= 1.0

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "source": pd.Series(dtype=str)})
        key = _md5_key(df["doc_id"]).str[:8]
        thr = df["source"].map(thresholds).fillna(default_thr)
        keep = (key < thr) | df["source"].isin(keep_all)
        if default_all:
            keep |= ~df["source"].isin(thresholds)
        out = df.loc[keep, ["doc_id", "source"]].copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        return out.reset_index(drop=True)

    return docs_ds.map_batches(pick, batch_format="pandas")


# ---------------------------------------------------- RAG chunking
def doc_chunk(docs_ds, size: int = 64, stride: int = 48):
    """Split documents into overlapping token-window chunks (the RAG /
    context-window prep stage): windows of ``size`` tokens every
    ``stride`` tokens; a tail window is emitted only if it contributes
    at least one token beyond the previous window (start == 0 or
    start + size - stride < n). Stateless vectorized map_batches —
    chunk starts are computed with repeat/arange arithmetic, only the
    final string join is per-chunk. Out: (doc_id, chunk_idx, n_tokens,
    chunk_text); token rule is the module-standard lowercased
    ``TOKEN_RE``, so the DuckDB oracle replays chunking with
    generate_series + list_slice."""
    if stride <= 0 or size < stride:
        raise ValueError("need 0 < stride <= size")
    overlap = size - stride

    def block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "chunk_idx": pd.Series(dtype="int64"),
                              "n_tokens": pd.Series(dtype="int64"),
                              "chunk_text": pd.Series(dtype=str)})
        if len(df) == 0:
            return empty
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        n = toks.str.len().to_numpy(dtype=np.int64)
        # chunks per doc: start 0 (if n>0) + every k>=1 with
        # k*stride + overlap < n
        extra = np.ceil(np.maximum(n - overlap, 0) / stride).astype(
            np.int64)
        c = np.where(n > 0, np.maximum(extra, 1), 0)
        if c.sum() == 0:
            return empty
        doc_pos = np.repeat(np.arange(len(df)), c)
        k = np.arange(c.sum()) - np.repeat(np.cumsum(c) - c, c)
        starts = k * stride
        tok_lists = toks.to_numpy()
        ids = df["doc_id"].to_numpy()
        texts = [" ".join(tok_lists[d][s:s + size])
                 for d, s in zip(doc_pos, starts)]
        n_tok = np.minimum(starts + size, n[doc_pos]) - starts
        return pd.DataFrame({"doc_id": ids[doc_pos].astype("int64"),
                             "chunk_idx": k,
                             "n_tokens": n_tok,
                             "chunk_text": texts})

    return docs_ds.map_batches(block, batch_format="pandas")


def bigram_pmi(docs_ds, *, k: int = 100, min_count: int = 5,
               num_partitions: int | None = None):
    """Top-k collocations: token bigrams ranked by pointwise mutual
    information pmi = ln((c12/NB) / ((c1/NU) * (c2/NU))) with a
    min-count floor — the classic collocation-extraction pass
    (Church-Hanks) a corpus-analysis pipeline runs beside raw
    bigram_topk counts.

    Exactness: ranking uses pmi quantized to the 1e-9 integer grid
    (ties then (w1, w2) asc), so engine and SQL agree on the exact
    top-k set; the published pmi is the same quantity at 6dp, formula
    written identically on both sides (the ratio form keeps every
    intermediate under the float64 envelope — no integer product of
    corpus-scale counts).

    Scale shape: bigram cells and unigram counts each merge in ONE
    token exchange; two tagged-union attach exchanges (on w1, then
    w2) bring the marginals to each surviving cell (min_count prunes
    BEFORE the attaches); NB/NU are streaming scalar sums; top-k is
    per-partition head + tiny merge."""
    import ray  # noqa: F401

    from ..shuffle import group_blocks

    # ---- bigram cells (one exchange), unigram counts (one exchange)
    bi = docs_ds.map_batches(_bigram_counts_partial,
                             batch_format="pandas")

    def merge_counts(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"token": pd.Series(dtype=str),
                                 "cnt": pd.Series(dtype="int64")})
        out = df.groupby("token", as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype("int64")
        return out

    bi_cells = group_blocks(bi, ["token"], merge_counts,
                            batch_format="pandas",
                            num_partitions=num_partitions).materialize()
    uni = group_blocks(
        docs_ds.map_batches(_token_counts_partial,
                            batch_format="pandas"),
        ["token"], merge_counts, batch_format="pandas",
        num_partitions=num_partitions).materialize()
    nb = float(int(bi_cells.sum("cnt") or 0))
    nu = float(int(uni.sum("cnt") or 0))

    def split(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["cnt"] >= min_count]
        if len(df) == 0:
            return pd.DataFrame({"w1": pd.Series(dtype=str),
                                 "w2": pd.Series(dtype=str),
                                 "c12": pd.Series(dtype="int64")})
        parts = df["token"].str.split(" ", n=1, expand=True)
        return pd.DataFrame({"w1": parts[0].astype(str),
                             "w2": parts[1].astype(str),
                             "c12": df["cnt"].astype("int64").to_numpy()})

    cells = bi_cells.map_batches(split, batch_format="pandas")

    # ---- attach marginal counts via tagged-union exchanges
    def attach(keyed, uni_ds, key_col: str, out_col: str, carry: list):
        def cell_rows(df: pd.DataFrame) -> pd.DataFrame:
            out = df.rename(columns={key_col: "k"})
            out["uc"] = np.int64(-1)
            out["is_uni"] = np.int64(0)
            return out[["k", *carry, "uc", "is_uni"]]

        def uni_rows(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"k": df["token"].astype(str)})
            for c in carry:
                out[c] = np.int64(0) if c not in ("w1", "w2") else ""
            out["uc"] = df["cnt"].astype("int64").to_numpy()
            out["is_uni"] = np.int64(1)
            return out[["k", *carry, "uc", "is_uni"]]

        tagged = keyed.map_batches(cell_rows, batch_format="pandas") \
            .union(uni_ds.map_batches(uni_rows, batch_format="pandas"))

        def join(df: pd.DataFrame) -> pd.DataFrame:
            c = df[df["is_uni"] == 0]
            u = df[df["is_uni"] == 1]
            j = c[["k", *carry]].merge(
                u[["k", "uc"]].rename(columns={"uc": out_col}), on="k")
            j = j.rename(columns={"k": key_col})
            cols = [key_col, *carry, out_col]
            if len(j) == 0:
                types = {key_col: str, out_col: "int64"}
                return pd.DataFrame({
                    col: pd.Series(dtype=types.get(
                        col, str if col in ("w1", "w2") else "int64"))
                    for col in cols})
            return j[cols].reset_index(drop=True)

        return group_blocks(tagged, ["k"], join, batch_format="pandas",
                            num_partitions=num_partitions)

    with_c1 = attach(cells, uni, "w1", "c1", ["w2", "c12"])
    with_c2 = attach(with_c1, uni, "w2", "c2", ["w1", "c12", "c1"])

    # ---- pmi + quantized rank, per-partition head, tiny merge
    def score(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"w1": str, "w2": str, "c12": "int64", "c1": "int64",
                "c2": "int64", "pmi": "float64", "q": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in cols.items()})
        c12 = df["c12"].to_numpy("float64")
        c1 = df["c1"].to_numpy("float64")
        c2 = df["c2"].to_numpy("float64")
        pmi = np.log((c12 / nb) / ((c1 / nu) * (c2 / nu)))
        q = np.floor(pmi * 1e9 + 0.5).astype("int64")
        out = df[["w1", "w2"]].copy()
        out["c12"] = df["c12"].astype("int64").to_numpy()
        out["c1"] = df["c1"].astype("int64").to_numpy()
        out["c2"] = df["c2"].astype("int64").to_numpy()
        out["pmi"] = np.floor(pmi * 1e6 + 0.5) / 1e6
        out["q"] = q
        return out.sort_values(["q", "w1", "w2"],
                               ascending=[False, True, True]).head(k) \
            .reset_index(drop=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = score(df)
        return out.drop(columns=["q"])

    heads = with_c2.map_batches(score, batch_format="pandas")
    return heads.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def split_assign(docs_ds, *, train_pct: int = 90, val_pct: int = 5):
    """Deterministic hash-based train/val/test assignment: split =
    md5(doc_id) mod 100 against the (train, val) thresholds — the
    seedless, shardable split every training-data pipeline needs
    (stable under re-runs, re-partitioning and corpus growth; no
    global state, no exchange — embarrassingly parallel).
    Out: (doc_id, source, split)."""
    from ..scorer import md5_u64

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": "int64", "source": str, "split": str}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        h = md5_u64([str(int(d)) for d in df["doc_id"]]) % np.uint64(100)
        h = h.astype(np.int64)
        split = np.where(h < train_pct, "train",
                         np.where(h < train_pct + val_pct, "val",
                                  "test"))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64").to_numpy(),
            "source": df["source"].astype(str).to_numpy(),
            "split": split})

    return docs_ds.map_batches(assign, batch_format="pandas")
