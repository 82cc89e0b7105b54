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
