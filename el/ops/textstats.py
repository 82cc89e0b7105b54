"""Text-analysis operators for large-scale training-data pipelines:
token counting, document fingerprinting, quality scoring, language-ID.

All are stateless vectorized ``map_batches`` stages over the
``documents`` table (doc_id, text, ...). Outputs are designed to be
reproducible bit-for-bit by a DuckDB oracle (md5, regexp token counts,
integer-ratio quality signals rounded to 6 places).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def round_half_away(series, k: int):
    """floor(x*10^k + 0.5)/10^k — engine-independent half-away rounding
    (pandas .round is half-even, DuckDB ROUND is half-away; this formula
    is identical on both sides given the same float input)."""
    scale = 10 ** k
    return np.floor(np.asarray(series, dtype=np.float64) * scale + 0.5) / scale

TOKEN_RE = r"[A-Za-z0-9]+"

# small per-language function-word marker sets (n-gram/stopword
# heuristic language-ID; deterministic, dependency-free)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "was", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "pour", "que"),
    "es": ("el", "los", "las", "y", "es", "una", "con", "para", "por"),
    "zh": ("de", "shi", "bu", "le", "zai", "wo", "you", "he", "ren"),
}


def token_count_batch(df: pd.DataFrame) -> pd.DataFrame:
    out = df[["doc_id"]].copy()
    out["n_tokens"] = df["text"].str.count(TOKEN_RE).astype("int64")
    return out


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    """md5 content fingerprint — the exact-dedup key and the analog of a
    rolling-hash document fingerprint (stable across engines)."""
    out = df[["doc_id"]].copy()
    out["fp"] = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]]
    return out


def quality_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Length / vocabulary / stopword-ratio quality signals
    (length-punct-stopword scoring family)."""
    toks = df["text"].str.lower().str.findall(TOKEN_RE)
    n_tokens = toks.map(len)
    stop = set(LANG_MARKERS["en"])
    n_stop = toks.map(lambda ws: sum(1 for w in ws if w in stop))
    n_uniq = toks.map(lambda ws: len(set(ws)))
    out = df[["doc_id"]].copy()
    out["n_chars"] = df["text"].str.len().astype("int64")
    out["n_tokens"] = n_tokens.astype("int64")
    out["n_uniq_tokens"] = n_uniq.astype("int64")
    out["stop_ratio"] = round_half_away(n_stop / n_tokens.clip(lower=1), 6)
    out["uniq_ratio"] = round_half_away(n_uniq / n_tokens.clip(lower=1), 6)
    return out


def lang_id_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Marker-word vote language-ID; deterministic argmax with
    lexicographic tie-break, 'und' when no marker hits."""
    toks = df["text"].str.lower().str.findall(TOKEN_RE)

    def guess(ws) -> str:
        wset = {}
        for w in ws:
            wset[w] = wset.get(w, 0) + 1
        best_lang, best_score = "und", 0
        for lang in sorted(LANG_MARKERS):
            score = sum(wset.get(m, 0) for m in LANG_MARKERS[lang])
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang

    out = df[["doc_id"]].copy()
    out["lang_guess"] = toks.map(guess)
    return out


# Gopher-rule thresholds (Rae et al. 2021 §A1.1.1, scaled to the
# fixture's short documents): every signal and bound is shared
# verbatim with the SQL oracle.
GOPHER_MIN_TOKENS = 10
GOPHER_MAX_TOKENS = 5000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MAX_SYMBOL_RATIO = 0.3
GOPHER_MIN_STOPWORDS = 2
_SYMBOL_RE = r"[^A-Za-z0-9\s]"


def gopher_rules_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style rule-based quality filter (the classic web-corpus
    curation gate): per-document token-count bounds, mean-token-length
    band, alphabetic-token ratio, symbol-to-token ratio, and a minimum
    stop-word count — each signal emitted alongside the composite
    pass flag so downstream mixing can re-threshold without a second
    scan. All ratios are exact int/int divisions (one float divide,
    identical in numpy and DuckDB); mean length is an exact integer
    sum over token lengths divided once."""
    toks = df["text"].str.lower().str.findall(TOKEN_RE)
    n_tokens = toks.map(len).astype("int64")
    tok_chars = toks.map(lambda ws: sum(len(w) for w in ws)) \
        .astype("int64")
    n_alpha = toks.map(
        lambda ws: sum(1 for w in ws if not w.isdigit())).astype("int64")
    stop = set(LANG_MARKERS["en"])
    n_stop = toks.map(
        lambda ws: sum(1 for w in ws if w in stop)).astype("int64")
    n_sym = df["text"].str.count(_SYMBOL_RE).astype("int64")
    denom = n_tokens.clip(lower=1)
    mean_len = round_half_away(tok_chars / denom, 6)
    alpha_ratio = round_half_away(n_alpha / denom, 6)
    symbol_ratio = round_half_away(n_sym / denom, 6)
    passes = ((n_tokens >= GOPHER_MIN_TOKENS)
              & (n_tokens <= GOPHER_MAX_TOKENS)
              & (mean_len >= GOPHER_MIN_MEAN_LEN)
              & (mean_len <= GOPHER_MAX_MEAN_LEN)
              & (alpha_ratio >= GOPHER_MIN_ALPHA_RATIO)
              & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
              & (n_stop >= GOPHER_MIN_STOPWORDS))
    return pd.DataFrame({
        "doc_id": df["doc_id"].astype("int64"),
        "n_tokens": n_tokens,
        "mean_token_len": mean_len,
        "alpha_ratio": alpha_ratio,
        "symbol_ratio": symbol_ratio,
        "n_stopwords": n_stop,
        "passes": passes.astype(bool),
    })


def gopher_rules(docs_ds):
    """Stateless vectorized scan — embarrassingly parallel at 100 TB."""
    return docs_ds.map_batches(gopher_rules_batch, batch_format="pandas")


def token_count(docs_ds):
    return docs_ds.map_batches(token_count_batch, batch_format="pandas")


def fingerprint(docs_ds):
    return docs_ds.map_batches(fingerprint_batch, batch_format="pandas")


def quality(docs_ds):
    return docs_ds.map_batches(quality_batch, batch_format="pandas")


def lang_id(docs_ds):
    return docs_ds.map_batches(lang_id_batch, batch_format="pandas")


# GPT-2-style pretokenizer, simplified to RE2-compatible alternation
# (no lookarounds) so the DuckDB oracle shares the pattern verbatim:
# optional leading space + a letter run / digit run / punct run.
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
WS_RE = r"\S+"


def bpe_token_count_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Whitespace and BPE-ish pretokenizer token counts per document —
    the two cheap context-window estimators a packing/budgeting stage
    uses before a real tokenizer exists in the cluster."""
    out = df[["doc_id"]].copy()
    out["n_ws_tokens"] = df["text"].str.count(WS_RE).astype("int64")
    out["n_bpe_tokens"] = df["text"].str.count(BPE_RE).astype("int64")
    return out


def bpe_token_count(docs_ds):
    return docs_ds.map_batches(bpe_token_count_batch,
                               batch_format="pandas")


# ------------------------------------------------- unigram LM quality
class _UnigramScorer:
    """Broadcast-model scoring stage: the (vocab-capped) unigram
    log-prob table ships once per actor via ``ray.put``; each batch is
    one findall + C-speed dict map + ``np.add.reduceat`` segment mean
    — no per-token Python."""

    def __init__(self, lp_ref, oov_lp: float):
        import ray

        self.lp = ray.get(lp_ref)  # dict token -> ln(cnt / T)
        self.oov = oov_lp

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        out = df[["doc_id"]].copy()
        out["n_tokens"] = lens
        score = np.full(len(df), np.nan)
        if lens.sum():
            flat = pd.Series(np.concatenate(
                [np.asarray(t, dtype=object) for t in toks]))
            vals = flat.map(self.lp).fillna(self.oov).to_numpy(np.float64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            nz = lens > 0
            # reduceat over nonzero-doc starts: zero-length docs sit
            # between identical offsets and contribute no segment
            sums = np.add.reduceat(vals, starts[nz])
            score[nz] = sums / lens[nz]
        out["logprob_per_token"] = round_half_away(score, 5)
        return out


def unigram_logprob(docs_ds, vocab_cap: int = 65536, oov_count: float = 0.5,
                    concurrency: int = 4):
    """Unigram LM quality score (the CCNet/KenLM-style perplexity-proxy
    filter signal): fit a corpus unigram model — per-batch token-count
    combiner, ONE token-hash exchange, vocabulary capped at the top
    ``vocab_cap`` tokens by (count desc, token asc) with out-of-vocab
    tokens backing off to ``oov_count`` pseudo-counts — broadcast the
    log-prob table once, then score every document with its mean token
    log-prob in a second vectorized pass.

    Scale shape: the merged count table is VOCAB-bounded, not
    corpus-bounded; it is materialized once and consumed twice (total
    mass via a streaming sum, top-V via per-partition heads -> tiny
    merge — each token lives wholly in one partition, so the global
    top-V is a subset of the partition top-Vs). Driver materialization
    is O(vocab_cap). Returns (doc_id, n_tokens, logprob_per_token)."""
    import math

    import ray

    from ..shuffle import group_blocks
    from .prep import _token_counts_partial

    partials = docs_ds.map_batches(_token_counts_partial,
                                   batch_format="pandas")

    def merge_counts(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"token": pd.Series(dtype=str),
                                 "cnt": pd.Series(dtype="int64")})
        out = df.groupby("token", as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype("int64")
        return out

    merged = group_blocks(partials, ["token"], merge_counts,
                          batch_format="pandas").materialize()
    # Dataset.sum returns None on an empty corpus; the scoring pass
    # still runs (over nothing), so any finite placeholder works
    total = float(merged.sum("cnt") or 1.0)

    def top_v(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "token"],
                              ascending=[False, True]).head(vocab_cap)

    vocab_rows = (merged.map_batches(top_v, batch_format="pandas")
                  .repartition(1)
                  .map_batches(top_v, batch_format="pandas",
                               batch_size=None)
                  .take_all())
    lp = {r["token"]: math.log(r["cnt"] / total) for r in vocab_rows}
    oov_lp = math.log(oov_count / total)
    return docs_ds.map_batches(
        _UnigramScorer,
        fn_constructor_args=(ray.put(lp), oov_lp),
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def source_kl(docs_ds, *, num_partitions: int | None = None):
    """Per-source unigram KL divergence from the corpus distribution —
    D_KL(P_source || P_corpus) = sum_t p_s(t) ln(p_s(t)/p(t)) — the
    domain-shift screen a curation pipeline runs per provenance slice
    (a source whose token distribution diverges from the mix is over-
    or under-weighted; CCNet-style slice diagnostics).

    Exactness contract: every per-(source, token) term
    (c_st/n_s) * ln((c_st * n) / (n_s * c_t)) is quantized PER CELL to
    the integer 1e-9 grid, so cross-cell sums are exact int64 with no
    float-sum order sensitivity (the cluster_vmeasure precedent); the
    only engine/oracle float contract is ln() on identical double
    ratios.

    Scale shape: per-batch (source, token) combiner partials -> ONE
    token hash exchange (attaches the exact corpus count c_t to each
    cell in-block) -> one streaming scalar sum for n -> ONE source
    hash exchange folding quantized terms per source. Cell volume is
    bounded by sources x vocabulary, never corpus rows. Out: one row
    per source (source, n_tokens, vocab, kl[6dp])."""
    from ..shuffle import group_blocks
    from .prep import TOKEN_RE

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": str, "token": str}
        if len(df) == 0:
            return pd.DataFrame({**{c: pd.Series(dtype=t)
                                    for c, t in cols.items()},
                                 "c": pd.Series(dtype="int64")})
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        out = pd.DataFrame({
            "source": df["source"].astype(str).repeat(toks.str.len()),
            "token": np.concatenate(
                [np.asarray(t, dtype=object) for t in toks]).astype(str)
            if toks.str.len().sum() else pd.Series(dtype=str)})
        out = out.groupby(["source", "token"], as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    partials = docs_ds.map_batches(cell_partial, batch_format="pandas")

    def token_fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": str, "c": "int64", "ct": "int64"}
        if len(df) == 0:
            return pd.DataFrame({"source": pd.Series(dtype=str),
                                 "c": pd.Series(dtype="int64"),
                                 "ct": pd.Series(dtype="int64")})
        cells = df.groupby(["token", "source"], as_index=False)["c"] \
            .sum()
        cells["ct"] = cells.groupby("token")["c"].transform("sum")
        out = cells[["source", "c", "ct"]]
        out = out.astype({"c": "int64", "ct": "int64"})
        return out.reset_index(drop=True)

    cells = group_blocks(partials, ["token"], token_fold,
                         batch_format="pandas",
                         num_partitions=num_partitions).materialize()
    n_total = int(cells.sum("c") or 0)

    def source_fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": str, "n_tokens": "int64", "vocab": "int64",
                "kl": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        rows = []
        for src, g in df.groupby("source"):
            c = g["c"].to_numpy("float64")
            ct = g["ct"].to_numpy("float64")
            ns = float(int(g["c"].sum()))
            term = (c / ns) * np.log((c * float(n_total)) / (ns * ct))
            q = int(np.floor(term * 1e9 + 0.5).astype("int64").sum())
            kl = np.floor((q / 1e9) * 1e6 + 0.5) / 1e6
            rows.append((str(src), int(ns), len(g), float(kl)))
        out = pd.DataFrame(rows, columns=list(cols))
        return out.astype({"n_tokens": "int64", "vocab": "int64"})

    return group_blocks(cells, ["source"], source_fold,
                        batch_format="pandas",
                        num_partitions=num_partitions)


def ttr_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-document lexical-diversity stats: token/type/hapax counts,
    type-token ratio and hapax ratio (Gopher-style repetition /
    diversity companion; a curation filter keys on low TTR). Purely
    per-row — explode to (doc, term), one in-batch groupby, no
    exchange. Ratios are int/int divisions rounded on the 1e-6 grid
    (0.0 for empty docs on both engine and oracle)."""
    cols = {"doc_id": "int64", "n_tokens": "int64",
            "n_types": "int64", "n_hapax": "int64",
            "ttr": "float64", "hapax_ratio": "float64"}
    if len(df) == 0:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in cols.items()})
    toks = df["text"].str.lower().str.findall(TOKEN_RE)
    ex = pd.DataFrame({
        "doc_id": df["doc_id"].repeat(toks.str.len()).to_numpy(),
        "term": np.concatenate([np.array(t, dtype=object)
                                for t in toks])
        if toks.str.len().sum() else np.array([], dtype=object)})
    tf = ex.groupby(["doc_id", "term"], as_index=False).size()
    per = tf.groupby("doc_id").agg(
        n_tokens=("size", "sum"), n_types=("size", "size"),
        n_hapax=("size", lambda s: int((s == 1).sum())))
    per = per.reindex(df["doc_id"].to_numpy(), fill_value=0)
    nt = per["n_tokens"].to_numpy(np.float64)
    safe = np.where(nt == 0, 1.0, nt)
    ttr = np.where(nt == 0, 0.0,
                   per["n_types"].to_numpy(np.float64) / safe)
    hap = np.where(nt == 0, 0.0,
                   per["n_hapax"].to_numpy(np.float64) / safe)
    return pd.DataFrame({
        "doc_id": per.index.to_numpy().astype("int64"),
        "n_tokens": per["n_tokens"].astype("int64").to_numpy(),
        "n_types": per["n_types"].astype("int64").to_numpy(),
        "n_hapax": per["n_hapax"].astype("int64").to_numpy(),
        "ttr": round_half_away(ttr, 6),
        "hapax_ratio": round_half_away(hap, 6)})


def doc_ttr(docs_ds):
    return docs_ds.map_batches(ttr_batch, batch_format="pandas")


def readability_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-document Flesch-style reading-ease estimate from regex
    proxies: sentences = runs of [.!?], words = TOKEN_RE matches,
    syllables = vowel-group runs (the classic hyphenation-free proxy).
    FRE = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words),
    computed from exact integer counts with one identical float
    expression per doc (engine == oracle); degenerate docs (no words
    or no sentences) report 0.0. A curation gate pairs this with
    gopher_rules / doc_quality."""
    cols = {"doc_id": "int64", "n_sentences": "int64",
            "n_words": "int64", "n_syllables": "int64",
            "flesch": "float64"}
    if len(df) == 0:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in cols.items()})
    n_sent = df["text"].str.count(r"[.!?]+").astype("int64")
    n_words = df["text"].str.count(TOKEN_RE).astype("int64")
    n_syl = df["text"].str.lower().str.count(r"[aeiouy]+") \
        .astype("int64")
    w = n_words.to_numpy(np.float64)
    s = n_sent.to_numpy(np.float64)
    y = n_syl.to_numpy(np.float64)
    ok = (w > 0) & (s > 0)
    fre = np.where(
        ok,
        206.835
        - 1.015 * (w / np.where(s == 0, 1.0, s))
        - 84.6 * (y / np.where(w == 0, 1.0, w)),
        0.0)
    return pd.DataFrame({
        "doc_id": df["doc_id"].astype("int64").to_numpy(),
        "n_sentences": n_sent.to_numpy(),
        "n_words": n_words.to_numpy(),
        "n_syllables": n_syl.to_numpy(),
        "flesch": round_half_away(fre, 4)})


def readability(docs_ds):
    return docs_ds.map_batches(readability_batch, batch_format="pandas")


def _canon_series(texts: pd.Series) -> pd.Series:
    """Canonical LM string: lowercase tokens joined by single spaces —
    the shared engine/oracle surface for character-level models
    (array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'),
    ' ') on the SQL side)."""
    return texts.str.lower().str.findall(r"[a-z0-9]+").str.join(" ")


_TRI_RE = r"(?=(.{3}))"


def _trigram_counts_partial(df: pd.DataFrame) -> pd.DataFrame:
    cols = {"token": str, "cnt": "int64"}
    if len(df) == 0:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in cols.items()})
    tris = _canon_series(df["text"].astype(str)).str.findall(_TRI_RE)
    flat = [t for ts in tris for t in ts]
    if not flat:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in cols.items()})
    out = pd.Series(flat, dtype=str).value_counts().rename_axis("token") \
        .reset_index(name="cnt")
    out["cnt"] = out["cnt"].astype("int64")
    return out[list(cols)]


class _TrigramScorer:
    """Broadcast-model scoring stage for the character-trigram LM:
    overlapping trigrams via one zero-width-lookahead findall (C
    regex), dict map, reduceat segment mean — the _UnigramScorer
    idiom one level down (the KenLM-style char-LM quality proxy that
    survives unseen words better than the word-level model)."""

    def __init__(self, lp_ref, oov_lp: float):
        import ray

        self.lp = ray.get(lp_ref)
        self.oov = oov_lp

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        tris = _canon_series(df["text"].astype(str)).str.findall(_TRI_RE)
        lens = tris.str.len().to_numpy(dtype=np.int64)
        out = df[["doc_id"]].copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_trigrams"] = lens
        score = np.full(len(df), np.nan)
        if lens.sum():
            flat = pd.Series(np.concatenate(
                [np.asarray(t, dtype=object) for t in tris]))
            vals = flat.map(self.lp).fillna(self.oov).to_numpy(np.float64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            nz = lens > 0
            sums = np.add.reduceat(vals, starts[nz])
            score[nz] = sums / lens[nz]
        out["logprob_per_trigram"] = round_half_away(score, 5)
        return out


def char_trigram_logprob(docs_ds, vocab_cap: int = 65536,
                         oov_count: float = 0.5, concurrency: int = 4):
    """Character-trigram LM quality score — the char-level twin of
    unigram_logprob (same fit/broadcast/score shape; the trigram
    vocabulary is alphabet^3-bounded, far under the cap, so the
    'vocab' is effectively exact). Returns (doc_id, n_trigrams,
    logprob_per_trigram)."""
    import math

    import ray

    from ..shuffle import group_blocks

    partials = docs_ds.map_batches(_trigram_counts_partial,
                                   batch_format="pandas")

    def merge_counts(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"token": pd.Series(dtype=str),
                                 "cnt": pd.Series(dtype="int64")})
        out = df.groupby("token", as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype("int64")
        return out

    merged = group_blocks(partials, ["token"], merge_counts,
                          batch_format="pandas").materialize()
    total = float(merged.sum("cnt") or 1.0)

    def top_v(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "token"],
                              ascending=[False, True]).head(vocab_cap)

    vocab_rows = (merged.map_batches(top_v, batch_format="pandas")
                  .repartition(1)
                  .map_batches(top_v, batch_format="pandas",
                               batch_size=None)
                  .take_all())
    lp = {r["token"]: math.log(r["cnt"] / total) for r in vocab_rows}
    oov_lp = math.log(oov_count / total)
    return docs_ds.map_batches(
        _TrigramScorer,
        fn_constructor_args=(ray.put(lp), oov_lp),
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=0.5,
    )
