"""String-similarity kernels used by the pair scorer and candidate finder.

Re-implements (from the standard published algorithms, not the reference
code) the similarity functions the reference gets from external libs:
Jaro-Winkler over aliases and names (MentionPairFeatures.scala:125-139),
cosine over term vectors (MentionPairFeatures.scala:212-224),
prefix/contains/abbreviation predicates
(MentionPairFeatures.scala:141-178), plus Levenshtein and American
Soundex for the phonetic blocking key.

jaro_winkler matches DuckDB's ``jaro_winkler_similarity`` (standard
parameters: scaling 0.1, boost threshold 0.7, prefix cap 4) so oracle
SQL can validate it bit-for-bit after rounding.
"""

from __future__ import annotations

import math


def jaro(s1: str, s2: str) -> float:
    len1, len2 = len(s1), len(s2)
    # empty-before-equality ordering matches DuckDB: jaro("","") == 0
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    match_dist = max(len1, len2) // 2 - 1
    if match_dist < 0:
        match_dist = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Standard Jaro-Winkler (boost threshold 0.7, prefix cap 4)."""
    j = jaro(s1, s2)
    if j > 0.7:
        prefix = 0
        for a, b in zip(s1, s2):
            if a != b or prefix == 4:
                break
            prefix += 1
        j += prefix * prefix_weight * (1.0 - j)
    return j


def levenshtein(s1: str, s2: str) -> int:
    if s1 == s2:
        return 0
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def cosine(v1: dict[str, int], v2: dict[str, int]) -> float:
    """Cosine over sparse count vectors (MentionPairFeatures.scala:212-224)."""
    if not v1 or not v2:
        return 0.0
    if len(v2) < len(v1):
        v1, v2 = v2, v1
    dot = sum(c * v2[t] for t, c in v1.items() if t in v2)
    if dot == 0:
        return 0.0
    n1 = math.sqrt(sum(c * c for c in v1.values()))
    n2 = math.sqrt(sum(c * c for c in v2.values()))
    return dot / (n1 * n2)


_SOUNDEX_MAP = str.maketrans(
    {
        "b": "1", "f": "1", "p": "1", "v": "1",
        "c": "2", "g": "2", "j": "2", "k": "2", "q": "2", "s": "2",
        "x": "2", "z": "2",
        "d": "3", "t": "3",
        "l": "4",
        "m": "5", "n": "5",
        "r": "6",
    }
)


def soundex(word: str) -> str:
    """American Soundex; phonetic blocking key (our analog of the
    reference's fuzzy candidate finder, RunKBPEntityLinkerSystem.scala:45-49)."""
    w = "".join(c for c in word.lower() if c.isalpha())
    if not w:
        return "0000"
    first = w[0].upper()
    digits = w.translate(_SOUNDEX_MAP)
    out = []
    prev = digits[0] if digits[0] in "123456" else ""
    for ch, d in zip(w[1:], digits[1:]):
        if d in "123456":
            if d != prev:
                out.append(d)
            prev = d
        elif ch in "hw":
            pass  # h/w do not reset the previous code
        else:
            prev = ""
    return (first + "".join(out) + "000")[:4]


def is_abbreviation(short: str, full: str) -> bool:
    """short == initials of full, case-insensitive
    (MentionPairFeatures.scala:26-27, 170-178)."""
    words = [w for w in full.split() if w]
    if len(words) < 2:
        return False
    return short.lower() == "".join(w[0] for w in words).lower()


def name_prefix(n1: str, n2: str) -> bool:
    """One normalized name is a word-boundary prefix of the other
    (MentionPairFeatures.scala:148-156)."""
    a, b = (n1, n2) if len(n1) <= len(n2) else (n2, n1)
    return a != b and (b.startswith(a + " ") or b == a)


def name_contains(n1: str, n2: str) -> bool:
    """One normalized name contains the other as a token subsequence
    (MentionPairFeatures.scala:158-168)."""
    a, b = (n1, n2) if len(n1) <= len(n2) else (n2, n1)
    return a != b and (f" {a} " in f" {b} ")


def token_overlap(n1: str, n2: str) -> float:
    """Jaccard of name token sets (surface-name overlap feature,
    MentionPairFeatures.scala:141-146)."""
    t1, t2 = set(n1.split()), set(n2.split())
    if not t1 or not t2:
        return 0.0
    return len(t1 & t2) / len(t1 | t2)
