"""Stage D — pairwise scoring actor pool.

The reference scores mention pairs with a logistic regression over
string-similarity + context features (MentionPairClassifier.scala:11-29;
feature set MentionPairFeatures.scala:111-193) and merges clusters above
an extreme cutoff 0.9999821007 (Clusterer.scala:24). We compute the same
feature family over *distinct normalized aliases* (exact-equal aliases
were already collapsed to one alias-group node by the blocking stage)
and apply fixed, repo-checked-in weights (the reference trains its LR at
startup from bundled CSVs, LinkClassifier.scala:12-26 — equally
deterministic). A pair becomes a merge edge iff score >= MERGE_CUTOFF.

Runs as ``pairs.map_batches(PairScorer, concurrency=N, batch_size=B)``:
weights and the common-surname set are actor state (built once in
__init__); per-batch work is ONE vectorized pass — the feature columns
are computed by DuckDB C kernels over the zero-copy Arrow batch
(``jaro_winkler_similarity`` is bit-equal to el.sim.jaro_winkler, proven
by the el_pair_jw oracle), then the score is numpy arithmetic. The
scalar ``pair_features``/``pair_score`` pair is the parity-tested
reference implementation.
"""

from __future__ import annotations

import math

import pyarrow as pa

from .sim import is_abbreviation, jaro_winkler, name_contains, name_prefix, token_overlap
from .text import normalize_name

# Common surnames (reference resource classifier/common-surnames.txt,
# MentionPairFeatures.scala:49-54): pairs that look alike only through a
# frequent surname are down-weighted.
COMMON_SURNAMES = frozenset(
    "smith jones johnson williams brown taylor miller davis wilson moore".split()
)

# Fixed weights (deterministic; calibrated on the t2 fixture offline).
# The Jaro-Winkler margin is the dominant signal; the boolean
# prefix/abbreviation features act as score FLOORS (the reference's
# boolean pair features are near-decisive under its extreme merge
# cutoff): base = max(W_JW*(jw - JW_PIVOT), 6 if prefix2, 6 if abbr),
# then small context corrections and the common-surname penalty.
W_JW = 60.0
JW_PIVOT = 0.935
BOOL_FLOOR = 6.0
W_JWS = 1.0
W_OVL = 0.5
W_COMMON = 2.0
# context-cosine feature over the per-alias topic vectors (el.ctxvec;
# the stdCosine/wideCosine analog, MentionPairFeatures.scala:111-139):
# a small continuous contribution, plus a VETO that outweighs every
# string floor when both sides carry substantial but DISJOINT topics
W_CTX = 2.0
W_CTX_VETO = 12.0

MERGE_CUTOFF = 0.5  # on the sigmoid score (our analog of Clusterer.scala:24)


def pair_features(alias1: str, alias2: str, surface1: str, surface2: str) -> dict:
    """Scalar reference implementation of the pair feature set
    (MentionPairFeatures.scala:111-193 analog) — the vectorized batch
    path (score_pairs_batch, DuckDB kernels) is parity-tested against
    this in tests/test_scorer.py."""
    n1, n2 = normalize_name(alias1), normalize_name(alias2)
    s1, s2 = normalize_name(surface1), normalize_name(surface2)
    t1, t2 = n1.split(), n2.split()
    prefix2 = bool(name_prefix(n1, n2) and min(len(t1), len(t2)) >= 2)
    contains = name_contains(n1, n2)
    abbr = is_abbreviation(n1.replace(" ", ""), n2) or is_abbreviation(
        n2.replace(" ", ""), n1
    )
    jw = jaro_winkler(n1, n2)
    jws = jw if (s1 == n1 and s2 == n2) else jaro_winkler(s1, s2)
    ovl = token_overlap(n1, n2)
    common = bool(
        t1 and t2 and t1[-1] == t2[-1] and t1[-1] in COMMON_SURNAMES
    )
    return {
        "jw_alias": jw,
        "jw_surface": jws,
        "prefix2": prefix2,
        "contains": contains,
        "abbr": abbr,
        "tok_overlap": ovl,
        "common_surname": common,
    }


def pair_score(f: dict) -> float:
    base = W_JW * (f["jw_alias"] - JW_PIVOT)
    if f["prefix2"] or f["abbr"]:
        base = max(base, BOOL_FLOOR)
    z = (
        base
        + W_JWS * (f["jw_surface"] - f["jw_alias"])
        + W_OVL * (f["tok_overlap"] - 0.5)
        - W_COMMON * f["common_surname"]
    )
    return 1.0 / (1.0 + math.exp(-z))


_NORM = "trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' ', 'g'))"

# two source CTEs: pairs from the pipeline carry pre-normalized columns
# (n1/n2/s1n/s2n, computed once per DISTINCT alias in the profile); bare
# callers fall back to normalizing in SQL
_SRC_PRENORM = "SELECT i, n1, n2, s1n AS s1, s2n AS s2 FROM batch"
_SRC_RAW = f"""SELECT i,
    {_NORM.format(c='alias1')} AS n1,
    {_NORM.format(c='alias2')} AS n2,
    {_NORM.format(c='surface1')} AS s1,
    {_NORM.format(c='surface2')} AS s2
  FROM batch"""

_FEATURE_SQL = """
WITH n AS (
  {src}
), t AS (
  SELECT i, n1, n2, s1, s2,
         string_split(n1, ' ') AS t1, string_split(n2, ' ') AS t2
  FROM n
)
SELECT
  jaro_winkler_similarity(n1, n2) AS jw_alias,
  CASE WHEN s1 = n1 AND s2 = n2
       THEN jaro_winkler_similarity(n1, n2)
       ELSE jaro_winkler_similarity(s1, s2) END AS jw_surface,
  (n1 != n2 AND len(t1) >= 2 AND len(t2) >= 2
   AND (starts_with(n2, n1 || ' ') OR starts_with(n1, n2 || ' ')))
      AS prefix2,
  (n1 != n2 AND (position(' ' || n1 || ' ' IN ' ' || n2 || ' ') > 0
                 OR position(' ' || n2 || ' ' IN ' ' || n1 || ' ') > 0))
      AS contains,
  ((len(t2) >= 2 AND replace(n1, ' ', '') =
        array_to_string(list_transform(t2, w -> substr(w, 1, 1)), ''))
   OR (len(t1) >= 2 AND replace(n2, ' ', '') =
        array_to_string(list_transform(t1, w -> substr(w, 1, 1)), '')))
      AS abbr,
  CASE WHEN n1 = '' OR n2 = '' THEN 0.0
       ELSE len(list_intersect(list_distinct(t1), list_distinct(t2)))
            / CAST(len(list_distinct(t1 || t2)) AS DOUBLE) END
      AS tok_overlap,
  (t1[len(t1)] = t2[len(t2)] AND t1[len(t1)] IN ({surnames}))
      AS common_surname
FROM t
ORDER BY i
"""


def _duck():
    """Per-process DuckDB connection (a vectorized C kernel library
    here, not a storage engine); single-threaded so Ray's num_cpus
    accounting stays honest."""
    global _DUCK_CON
    try:
        return _DUCK_CON
    except NameError:
        import duckdb

        _DUCK_CON = duckdb.connect()
        _DUCK_CON.execute("SET threads TO 1")
        return _DUCK_CON


def md5_u64(strings) -> "np.ndarray":
    """uint64 hash per string = last 8 md5 bytes, little-endian — ONE
    vectorized DuckDB ``md5_number_lower`` pass, bit-equal to the SQL
    oracles' ``md5_number_lower(x)`` (the single definition of the
    engine/oracle hash contract; MinHash signatures, SimHash token
    hashes and the KMV sketch all route through here)."""
    import numpy as np
    import pyarrow as _pa

    if len(strings) == 0:
        return np.zeros(0, dtype=np.uint64)
    tbl = _pa.table({"s": _pa.array(list(strings), _pa.string())})  # noqa: F841
    h = _duck().execute(
        "SELECT md5_number_lower(s) FROM tbl").fetchnumpy()
    return next(iter(h.values())).astype(np.uint64)


def compute_pair_features(batch: pa.Table) -> dict:
    """Vectorized feature columns (numpy arrays) for a pair batch —
    DuckDB's jaro_winkler_similarity (bit-equal to el.sim.jaro_winkler,
    proven by the el_pair_jw oracle) plus list-kernel booleans, one SQL
    pass over the zero-copy Arrow batch."""
    import numpy as np

    con = _duck()
    surnames = ", ".join(f"'{s}'" for s in sorted(COMMON_SURNAMES))
    prenorm = "n1" in batch.column_names
    cols = (["n1", "n2", "s1n", "s2n"] if prenorm
            else ["alias1", "alias2", "surface1", "surface2"])
    batch_view = batch.select(cols).append_column(
        "i", pa.array(np.arange(batch.num_rows, dtype=np.int64))
    )
    con.register("batch", batch_view)
    sql = _FEATURE_SQL.format(src=_SRC_PRENORM if prenorm else _SRC_RAW,
                              surnames=surnames)
    out = con.execute(sql).arrow()
    con.unregister("batch")
    return {
        "jw_alias": out.column("jw_alias").to_numpy(zero_copy_only=False),
        "jw_surface": out.column("jw_surface").to_numpy(zero_copy_only=False),
        "prefix2": out.column("prefix2").to_numpy(zero_copy_only=False)
        .astype(bool),
        "contains": out.column("contains").to_numpy(zero_copy_only=False)
        .astype(bool),
        "abbr": out.column("abbr").to_numpy(zero_copy_only=False)
        .astype(bool),
        "tok_overlap": np.nan_to_num(
            out.column("tok_overlap").to_numpy(zero_copy_only=False)
        ),
        "common_surname": out.column("common_surname")
        .to_numpy(zero_copy_only=False).astype(bool),
    }


# ---------------------------------------------------------------------
# Extension surface (§2.10): the reference composes named Feature
# objects into a FeatureSet (MentionPairFeatures.scala:181-193,
# LinkFeatures.scala:22-178). Ours is a registry of
# name -> (weight, fn(batch: pa.Table) -> ndarray of z-contributions)
# applied additively after the built-in features — register_feature()
# plugs a new signal into every scoring path without touching the
# engine.
EXTRA_FEATURES: dict = {}


def register_feature(name: str, weight: float, fn) -> None:
    """Register an extra pair feature: ``fn(batch)`` returns a float
    array (len == batch rows) added to the logit as ``weight * value``.
    Deterministic fns only (scores feed the clustering)."""
    EXTRA_FEATURES[name] = (weight, fn)


def unregister_feature(name: str) -> None:
    EXTRA_FEATURES.pop(name, None)


def ctx_adjustment(ctx1_col, ctx2_col) -> "object":
    """Vector of z-adjustments from the per-alias context vectors: only
    pairs where BOTH sides kept a non-empty topic vector (a small
    fraction after the df filter) are touched — cosine contribution plus
    the disjoint-topics veto.

    The JSON vectors are PER-ALIAS data arriving on per-PAIR rows, so
    each distinct string is decoded (and its mass/norm computed) ONCE
    per batch and the per-pair work is just the intersection dot
    product — bit-identical to el.sim.cosine (same small-side swap,
    same norm product order; parity pytest-pinned)."""
    import json
    import math

    import numpy as np

    from .ctxvec import CTX_MIN_MASS, CTX_VETO_COS

    n = len(ctx1_col)
    adj = np.zeros(n, dtype=np.float64)
    cache: dict = {}

    def dec(s):
        r = cache.get(s)
        if r is None:
            v = json.loads(s)
            r = (v, sum(v.values()),
                 math.sqrt(sum(c * c for c in v.values())))
            cache[s] = r
        return r

    for i in range(n):
        j1, j2 = ctx1_col[i], ctx2_col[i]
        if not j1 or not j2:
            continue
        v1, m1, nn1 = dec(j1)
        v2, m2, nn2 = dec(j2)
        if not v1 or not v2:
            cos, mass = 0.0, 0
        else:
            mass = min(m1, m2)
            if len(v2) < len(v1):
                v1, nn1, v2, nn2 = v2, nn2, v1, nn1
            dot = sum(c * v2[t] for t, c in v1.items() if t in v2)
            cos = 0.0 if dot == 0 else dot / (nn1 * nn2)
        adj[i] = W_CTX * (cos - 0.5)
        if mass >= CTX_MIN_MASS and cos < CTX_VETO_COS:
            adj[i] -= W_CTX_VETO
    return adj


def score_pairs_batch(batch: pa.Table) -> pa.Table:
    import numpy as np

    if batch.num_rows == 0:
        out = batch.append_column("jw_alias", pa.array([], pa.float64()))
        return out.append_column("score", pa.array([], pa.float64()))
    f = compute_pair_features(batch)
    base = W_JW * (f["jw_alias"] - JW_PIVOT)
    floor = f["prefix2"] | f["abbr"]
    base = np.where(floor, np.maximum(base, BOOL_FLOOR), base)
    z = (
        base
        + W_JWS * (f["jw_surface"] - f["jw_alias"])
        + W_OVL * (f["tok_overlap"] - 0.5)
        - W_COMMON * f["common_surname"].astype(np.float64)
    )
    if "ctx1" in batch.column_names:
        z = z + ctx_adjustment(batch.column("ctx1").to_pylist(),
                               batch.column("ctx2").to_pylist())
    for _name, (weight, fn) in sorted(EXTRA_FEATURES.items()):
        z = z + weight * np.asarray(fn(batch), dtype=np.float64)
    scores = 1.0 / (1.0 + np.exp(-z))
    out = batch.append_column("jw_alias", pa.array(f["jw_alias"], pa.float64()))
    return out.append_column("score", pa.array(scores, pa.float64()))


class PairScorer:
    """Actor-pool callable (map_batches(PairScorer, concurrency=N)).

    State held per actor: weights + surname set (module constants here,
    mirroring the reference's once-per-process classifier singletons,
    MentionPairClassifier.scala:28).
    """

    def __init__(self) -> None:
        self.cutoff = MERGE_CUTOFF

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_pairs_batch(batch)


def score_pairs(pairs_ds, concurrency: int = 4, batch_size: int = 8192):
    return pairs_ds.map_batches(
        PairScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
