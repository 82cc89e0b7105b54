"""Tokenization, normalization, stemming-lite, term vectors, stopwords.

Re-expresses the reference's text utilities without the heavyweight NLP
stack (reference uses ClearPostagger + MorphaStemmer + OpenNLP,
MentionPairFeatures.scala:197-210; stopword list
MentionPairFeatures.scala:200-204): deterministic, dependency-free,
vectorizable per batch.
"""

from __future__ import annotations

import re
from collections import Counter

# Mirrors the reference's comma-separated stopword resource
# (MentionPairFeatures.scala:200-204, duplicated CorefHelperMethods.scala:26-30)
# -- a compact English function-word list.
STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by could did do does doing down
    during each few for from further had has have having he her here hers
    herself him himself his how i if in into is it its itself just me more
    most my myself no nor not now of off on once only or other our ours
    ourselves out over own s same she should so some such t than that the
    their theirs them themselves then there these they this those through to
    too under until up very was we were what when where which while who whom
    why will with you your yours yourself yourselves""".split()
)

WORD_RE = re.compile(r"[a-z0-9]+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]+")
_WS_RE = re.compile(r"\s+")

# Porter-lite suffix rules, applied in order, longest-first within a rule.
_STEM_RULES = (
    ("sses", "ss"),
    ("ies", "i"),
    ("ational", "ate"),
    ("tional", "tion"),
    ("ization", "ize"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("ment", ""),
    ("ness", ""),
    ("ing", ""),
    ("ed", ""),
)


def tokenize(text: str) -> list[str]:
    """Lowercase alnum tokens (reference: PTB tokenize + lowercase filter,
    SportsSenseTrainingData.scala:153-163)."""
    return WORD_RE.findall(text.lower())


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=1 << 17)
def stem(word: str) -> str:
    """Deterministic Porter-lite stemmer (reference: MorphaStemmer,
    MentionPairFeatures.scala:198). Keeps stems >= 3 chars. Memoized
    per worker (pure function over Zipfian token streams: the profile
    combiner stems every content token of every sampled context)."""
    for suf, rep in _STEM_RULES:
        if word.endswith(suf) and len(word) - len(suf) + len(rep) >= 3:
            return word[: len(word) - len(suf)] + rep
    if len(word) > 3 and word.endswith("s") and not word.endswith("ss"):
        return word[:-1]
    return word


def content_tokens(text: str) -> list[str]:
    """Tokenize, drop stopwords, stem (reference term-vector prep,
    MentionPairFeatures.scala:206-210)."""
    return [stem(t) for t in tokenize(text) if t not in STOPWORDS]


def term_vector(text: str, top_k: int | None = None) -> dict[str, int]:
    """Token -> count map (reference groupBy(identity).map(size),
    MentionPairFeatures.scala:209). ``top_k`` bounds the payload carried
    through shuffles (most-common, ties broken lexicographically)."""
    c = Counter(content_tokens(text))
    if top_k is not None and len(c) > top_k:
        items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        return dict(items)
    return dict(c)


from functools import lru_cache


@lru_cache(maxsize=1 << 18)
def normalize_name(name: str) -> str:
    """Canonical blocking-side normalization: lowercase, strip
    punctuation, collapse whitespace. The exact-alias grouping key of the
    reference's clusterNils (RunKBPEntityLinkerSystem.scala:162-170) uses
    raw entityString equality; we normalize so case/punct variants of the
    same alias collide.

    Memoized per worker process (pure function, Zipfian surfaces: the
    extract stage calls this ~0.5x per mention-token with heavy
    repeats; the cache removes most of the two regex passes)."""
    s = _NON_ALNUM_RE.sub(" ", name.lower())
    return _WS_RE.sub(" ", s).strip()


def name_tokens(name: str) -> list[str]:
    return normalize_name(name).split()


def initials(name: str) -> str:
    """Abbreviation generator: initial letters, uppercased
    (MentionPairFeatures.scala:26-27)."""
    return "".join(w[0] for w in name.split() if w).upper()


def is_acronym(surface: str) -> bool:
    """All-caps token of length >= 2 (acronym detection,
    CorefHelperMethods.scala:262-290)."""
    return len(surface) >= 2 and surface.isupper() and surface.isalpha()


def collapse_ws(text: str) -> str:
    """Whitespace-collapse (SolrHelper.scala:173)."""
    return _WS_RE.sub(" ", text).strip()
