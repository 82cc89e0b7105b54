"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (the guide's sketch patterns):
- exact: md5 fingerprint per batch -> ``groupby(fp).min(doc_id)`` —
  one shuffle keyed on the hash, perfectly balanced.
- n-gram Jaccard (exact): inverted shingle index
  (explode -> groupby(shingle) -> within-group pairs with a hot-shingle
  cap) -> co-occurrence counts via groupby((d1,d2)) -> jaccard from
  per-doc shingle counts. No verification pass needed; the only skew
  risk is hot shingles, which are capped with logged drops.
- MinHash+LSH (approximate): vectorized per-batch signatures
  (numpy universal hashing) -> band buckets -> groupby(band) candidate
  pairs -> exact-Jaccard verify.
- SimHash: 64-bit signature per doc; near-dups bucket on the top bits
  and verify Hamming distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .textstats import fingerprint

_MERSENNE = (1 << 61) - 1
_HASH_RANGE = 1 << 32


def exact_dedup(docs_ds):
    """Kept representatives after exact-content dedup:
    (fp, doc_id=min over duplicates). One hash exchange on the
    fingerprint + block-local min."""
    from ..shuffle import group_blocks

    fps = fingerprint(docs_ds)

    def block_min(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"fp": pd.Series(dtype=str),
                                 "doc_id": pd.Series(dtype="int64")})
        return df.groupby("fp", as_index=False)["doc_id"].min()

    return group_blocks(fps, ["fp"], block_min, batch_format="pandas")


def word_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit shingle hashes = last 8 md5 bytes, little-endian — chosen
    because it is bit-equal to DuckDB's ``md5_number_lower``, which lets
    the SQL oracle replay the exact MinHash signatures."""
    import hashlib

    sh = word_shingles(text, k)
    if not sh:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
         for s in sh],
        dtype=np.uint64,
    ))


class MinHasher:
    """Actor-pool stage: seeded universal-hash MinHash signatures +
    LSH band keys. Hash parameters are built once per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3,
                 seed: int = 7):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k)
        if len(h) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # (num_perm, n_shingles) universal hashes, min over shingles
        vals = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def signatures_batch(self, texts) -> np.ndarray:
        """(n_docs, num_perm) signature matrix, vectorized batch-wide:
        ONE DuckDB ``md5_number_lower`` pass hashes every shingle of
        every doc (bit-equal to :func:`_shingle_hashes`, same oracle
        anchor), then the universal-hash min runs as a segmented
        ``minimum.reduceat`` — no per-shingle Python. Duplicate
        shingles within a doc are left in (min is idempotent).
        Memory-bounded by slicing at ~500k shingles per reduceat."""
        from ..scorer import md5_u64

        per_doc = [word_shingles(t, self.k) for t in texts]  # set order
        # is irrelevant: each shingle hashes independently and min() is
        # order-free
        lens = np.array([len(s) for s in per_doc], dtype=np.int64)
        flat = [s for doc in per_doc for s in doc]
        n_docs = len(texts)
        sigs = np.full((n_docs, self.num_perm), _MERSENNE, dtype=np.uint64)
        if not flat:
            return sigs
        h_all = md5_u64(flat)
        nonempty = np.flatnonzero(lens)
        ends = np.cumsum(lens[nonempty])
        starts = ends - lens[nonempty]
        # slice into runs of whole docs, <= ~500k shingles each
        budget = 500_000
        i = 0
        while i < len(nonempty):
            j = i
            while j < len(nonempty) and ends[j] - starts[i] <= budget:
                j += 1
            j = max(j, i + 1)
            seg = h_all[starts[i]:ends[j - 1]]
            vals = (self.a[:, None] * seg[None, :] + self.b[:, None]) \
                % _MERSENNE
            mins = np.minimum.reduceat(
                vals, starts[i:j] - starts[i], axis=1)
            sigs[nonempty[i:j]] = mins.T
            i = j
        return sigs

    def band_buckets_batch(self, sigs: np.ndarray) -> np.ndarray:
        """(n_docs, bands) int64 bucket keys, fully vectorized: a
        polynomial rolling hash over each band's signature rows (seeded
        by the band index so bands never share buckets) finalized with
        splitmix64 mixing. Candidate generation only needs
        bucket-equality to COINCIDE with band-chunk equality — the SQL
        oracle buckets on the raw band values (string_agg), so any
        deterministic injective-up-to-2^-63-collisions key replays
        identically; this replaces the r02 per-doc × per-band
        hashlib.md5 loop (the last per-doc Python in the op)."""
        n = sigs.shape[0]
        chunks = sigs.reshape(n, self.bands, self.rows)
        C = np.uint64(0x9E3779B97F4A7C15)
        acc = np.broadcast_to(
            np.arange(1, self.bands + 1, dtype=np.uint64), (n, self.bands)
        ).copy()
        for r in range(self.rows):  # rows=4: four vectorized passes
            acc = acc * C + chunks[:, :, r]
        # splitmix64 finalization
        z = (acc + C)
        z ^= z >> np.uint64(30); z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27); z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        return (z & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures_batch(list(df["text"]))
        bk = self.band_buckets_batch(sigs)
        return pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), self.bands),
            "bucket": bk.ravel(),
        })


from functools import lru_cache


@lru_cache(maxsize=4)
def _cached_minhasher(num_perm: int, bands: int, k: int) -> "MinHasher":
    return MinHasher(num_perm=num_perm, bands=bands, k=k)


def _minhash_batch(df: pd.DataFrame, *, num_perm: int, bands: int,
                   k: int) -> pd.DataFrame:
    return _cached_minhasher(num_perm, bands, k)(df)


def _bucket_pairs_group(group: pa.Table) -> pa.Table:
    ids = sorted(set(group.column("doc_id").to_pylist()))
    n = len(ids)
    out1, out2 = [], []
    cap = 200  # hot-bucket cap; beyond it the bucket is near-degenerate
    ids = ids[:cap]
    # no silent truncation: the dropped-pair count rides on every row
    # of the bucket (el.blocking's logged-counter discipline)
    dropped = n * (n - 1) // 2 - len(ids) * (len(ids) - 1) // 2
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            out1.append(ids[i])
            out2.append(ids[j])
    return pa.table({"d1": pa.array(out1, pa.int64()),
                     "d2": pa.array(out2, pa.int64()),
                     "dropped_pairs": pa.array([dropped] * len(out1),
                                               pa.int64())})


def distinct_pairs(pairs_ds):
    """Distinct (d1, d2) rows: hash-partition on d1 co-locates every
    duplicate (both columns equal), block-local drop_duplicates."""
    from ..shuffle import group_blocks

    def block_distinct(df: pd.DataFrame) -> pd.DataFrame:
        keep = [c for c in ("d1", "d2", "dropped_pairs") if c in df.columns]
        return df.drop_duplicates(["d1", "d2"])[keep]

    return group_blocks(pairs_ds, ["d1"], block_distinct, batch_format="pandas")


def minhash_candidates(docs_ds, num_perm: int = 64, bands: int = 16,
                       k: int = 3, concurrency: int = 2,
                       distinct: bool = True):
    """LSH candidate pairs (d1 < d2). ``distinct=False`` skips the
    cross-band dedup exchange — callers that hash-join the pairs on d1
    anyway (verify_jaccard) dedup in that join's block for free."""
    from ..shuffle import group_map

    # task pool, not an actor pool: MinHasher's per-actor "state" is two
    # seeded integer arrays (microseconds to build) — an actor fleet
    # pays ~2s startup for nothing; the lru-cached instance persists in
    # each reused Ray worker process anyway
    sigs = docs_ds.map_batches(
        _minhash_batch,
        fn_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pandas",
    )
    pairs = group_map(sigs, "bucket", _bucket_pairs_group)
    return distinct_pairs(pairs) if distinct else pairs


def _vj_doc_rows(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "key": df["doc_id"].astype("int64"), "kind": "d",
        "text": df["text"],
        "d1": np.int64(0), "d2": np.int64(0), "text1": "",
        "dp": np.int64(0),
    })


def _vj_pair_rows(df: pd.DataFrame) -> pd.DataFrame:
    dp = (df["dropped_pairs"].astype("int64")
          if "dropped_pairs" in df.columns else np.int64(0))
    return pd.DataFrame({
        "key": df["d1"].astype("int64"), "kind": "p", "text": "",
        "d1": df["d1"].astype("int64"), "d2": df["d2"].astype("int64"),
        "text1": "", "dp": dp,
    })


def _vj_attach_first(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return df
    dmap = df[df["kind"] == "d"].set_index("key")["text"]
    # all duplicates of a (d1, d2) pair are co-located (keyed d1):
    # dedup here, saving the dedicated distinct exchange
    p = df[df["kind"] == "p"].drop_duplicates(["d1", "d2"]).copy()
    p["text1"] = p["key"].map(dmap).fillna("")
    p["key"] = p["d2"].astype("int64")
    return pd.concat([df[df["kind"] == "d"], p], ignore_index=True)


def _make_vj_finish(threshold: float, k: int):
    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"d1": pd.Series(dtype="int64"),
                                 "d2": pd.Series(dtype="int64"),
                                 "jaccard": pd.Series(dtype="float64"),
                                 "dropped_pairs": pd.Series(dtype="int64")})
        dmap = df[df["kind"] == "d"].set_index("key")["text"]
        p = df[df["kind"] == "p"]
        out = []
        for d1, d2, t1, key, dp in zip(p["d1"], p["d2"], p["text1"],
                                       p["key"], p["dp"]):
            s1 = word_shingles(t1, k)
            s2 = word_shingles(dmap.get(key, ""), k)
            u = len(s1 | s2)
            j = len(s1 & s2) / u if u else 0.0
            # half-away rounding (matches the DuckDB oracle's
            # floor(x*1e6+.5)); threshold applies to the rounded value
            j = float(np.floor(j * 1e6 + 0.5) / 1e6)
            if j >= threshold:
                out.append((int(d1), int(d2), j, int(dp)))
        return pd.DataFrame(out, columns=["d1", "d2", "jaccard",
                                          "dropped_pairs"])

    return finish


def verify_jaccard(pairs_ds, docs_ds, threshold: float, k: int = 3):
    """Exact-Jaccard verification of candidate pairs, SHUFFLE-NATIVE:
    two hash exchanges implement pairs ⋈ docs on d1 and then d2 (the
    group_blocks union idiom), so no corpus-wide structure ever lives on
    one node — the only payload shipped is each candidate pair's two
    document texts. This is the 100-TB-safe path that replaces the r01
    broadcast shingle map."""
    from ..shuffle import group_blocks

    u1 = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _vj_doc_rows, batch_format="pandas"
    ).union(pairs_ds.map_batches(_vj_pair_rows, batch_format="pandas"))

    r1 = group_blocks(u1, ["key"], _vj_attach_first, batch_format="pandas")
    return group_blocks(r1, ["key"], _make_vj_finish(threshold, k),
                        batch_format="pandas")


def _empty_pairs_table() -> pa.Table:
    return pa.table({"d1": pa.array([], pa.int64()),
                     "d2": pa.array([], pa.int64()),
                     "dropped_pairs": pa.array([], pa.int64())})


def _bucket_pairs_block(t: pa.Table) -> pa.Table:
    from ..shuffle import split_groups

    outs = [_bucket_pairs_group(g) for g in split_groups(t, "bucket")]
    return pa.concat_tables(outs) if outs else _empty_pairs_table()


def minhash_dedup_pairs(docs_ds, threshold: float = 0.8, **kw):
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification,
    run as a PLAIN-TASK shuffle end to end: signature map, bucket
    exchange, and the two verify joins are ray tasks over materialized
    block refs. Semantics identical to minhash_candidates +
    verify_jaccard (shared kernels, same SQL oracle); the Dataset
    hash-exchange form paid ~3-8s of aggregator-fleet startup PER
    EXCHANGE x 3 exchanges at bench scale while moving kilobytes — the
    task shuffle's fixed cost is ~0. Candidate dedup still rides the
    first verify join (keyed d1)."""
    import ray
    import ray.data

    from ..shuffle import bundle_refs, map_refs, task_group_blocks

    num_perm = kw.get("num_perm", 64)
    bands = kw.get("bands", 16)
    k = kw.get("k", 3)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — before init
        ncpu = 8
    # bound the task-shuffle's n_refs x n_partitions object count when
    # the read hands us thousands of tiny blocks
    doc_refs = bundle_refs(docs_ds.materialize().to_arrow_refs(),
                           max_bundles=2 * ncpu)

    def sigs_fn(t: pa.Table) -> pd.DataFrame:
        return _cached_minhasher(num_perm, bands, k)(t.to_pandas())

    pair_refs = task_group_blocks(
        map_refs(doc_refs, sigs_fn), ["bucket"], _bucket_pairs_block,
        batch_format="pyarrow")

    def doc_rows_fn(t: pa.Table) -> pd.DataFrame:
        return _vj_doc_rows(t.select(["doc_id", "text"]).to_pandas())

    def pair_rows_fn(t: pa.Table) -> pd.DataFrame:
        return _vj_pair_rows(t.to_pandas())

    u_refs = (map_refs(doc_refs, doc_rows_fn)
              + map_refs(pair_refs, pair_rows_fn))
    r1_refs = task_group_blocks(u_refs, ["key"], _vj_attach_first,
                                batch_format="pandas")
    out_refs = task_group_blocks(r1_refs, ["key"],
                                 _make_vj_finish(threshold, k),
                                 batch_format="pandas")
    return ray.data.from_arrow_refs(out_refs)


# ---------------------------------------------------------------- exact
def _shingle_rows(df: pd.DataFrame, k: int) -> pd.DataFrame:
    doc_ids, shingles = [], []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        for s in word_shingles(text, k):
            doc_ids.append(doc_id)
            shingles.append(s)
    return pd.DataFrame({"doc_id": doc_ids, "shingle": shingles})


def _ngram_pair_stat_refs(docs_ds, k: int, hot_shingle_cap: int):
    """Shared inverted-shingle-index pair statistics (the exchange
    chain behind ngram_jaccard_pairs AND ngram_containment_pairs):

      explode (doc, shingle) -> groupby(shingle) pairs (hot cap)
      -> groupby(d1, d2).count co-occurrence
      -> per-doc shingle counts attached by two hash joins on d1/d2.

    Returns block refs of frames where kind='p' rows carry
    (d1, d2, co, n1) keyed by d2 and kind='s' rows carry the size map
    for the final attach — the caller's finish computes its metric.
    All exchanges run as a plain-task shuffle over block refs (no
    aggregator fleets; see minhash_dedup_pairs for the rationale).
    """
    import ray

    from ..shuffle import (bundle_refs, map_refs, split_groups,
                           task_group_blocks)

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — before init
        ncpu = 8
    doc_refs = bundle_refs(docs_ds.materialize().to_arrow_refs(),
                           max_bundles=2 * ncpu)
    # reused by the pair stage AND the size stage
    rows_refs = map_refs(
        doc_refs, lambda t: _shingle_rows(t.to_pandas(), k))

    def group_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))[:hot_shingle_cap]
        o1, o2 = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                o1.append(ids[i])
                o2.append(ids[j])
        return pa.table({"d1": pa.array(o1, pa.int64()),
                         "d2": pa.array(o2, pa.int64())})

    def pairs_block(t: pa.Table) -> pa.Table:
        outs = [group_pairs(g) for g in split_groups(t, "shingle")]
        return pa.concat_tables(outs) if outs else pa.table(
            {"d1": pa.array([], pa.int64()),
             "d2": pa.array([], pa.int64())})

    pair_refs = task_group_blocks(rows_refs, ["shingle"], pairs_block,
                                  batch_format="pyarrow")

    def block_co(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"d1": pd.Series(dtype="int64"),
                                 "d2": pd.Series(dtype="int64"),
                                 "co": pd.Series(dtype="int64")})
        return df.groupby(["d1", "d2"], as_index=False).size().rename(
            columns={"size": "co"}
        )

    co_refs = task_group_blocks(pair_refs, ["d1"], block_co,
                                batch_format="pandas")

    def block_sizes(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        return df.groupby("doc_id", as_index=False).size().rename(
            columns={"size": "n"}
        )

    size_refs = task_group_blocks(rows_refs, ["doc_id"], block_sizes,
                                  batch_format="pandas")

    # attach |A| and |B| by two hash joins on d1/d2 (group_blocks union
    # idiom) — replaces the r01 driver-side take_all() size broadcast
    def size_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["doc_id"].astype("int64"), "kind": "s",
            "n": df["n"].astype("int64"),
            "d1": np.int64(0), "d2": np.int64(0), "co": np.int64(0),
            "n1": np.int64(0),
        })

    def co_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["d1"].astype("int64"), "kind": "p", "n": np.int64(0),
            "d1": df["d1"].astype("int64"), "d2": df["d2"].astype("int64"),
            "co": df["co"].astype("int64"), "n1": np.int64(0),
        })

    u_refs = (map_refs(size_refs, lambda t: size_rows(t.to_pandas()))
              + map_refs(co_refs, lambda t: co_rows(t.to_pandas())))

    def attach_first(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        smap = df[df["kind"] == "s"].set_index("key")["n"]
        p = df[df["kind"] == "p"].copy()
        p["n1"] = p["key"].map(smap).fillna(0).astype("int64")
        p["key"] = p["d2"].astype("int64")
        return pd.concat([df[df["kind"] == "s"], p], ignore_index=True)

    return task_group_blocks(u_refs, ["key"], attach_first,
                             batch_format="pandas")


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.5, k: int = 3,
                        hot_shingle_cap: int = 100):
    """EXACT n-gram Jaccard similar pairs over the shared inverted
    shingle index (_ngram_pair_stat_refs): jaccard =
    co / (|A| + |B| - co), threshold-filtered. Out: (d1, d2,
    jaccard)."""
    import ray
    import ray.data

    from ..shuffle import task_group_blocks

    r1_refs = _ngram_pair_stat_refs(docs_ds, k, hot_shingle_cap)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"d1": pd.Series(dtype="int64"),
                                 "d2": pd.Series(dtype="int64"),
                                 "jaccard": pd.Series(dtype="float64")})
        smap = df[df["kind"] == "s"].set_index("key")["n"]
        p = df[df["kind"] == "p"].copy()
        n2 = p["key"].map(smap).fillna(0).astype("int64")
        denom = (p["n1"] + n2 - p["co"]).clip(lower=1)
        # half-away rounding (matches the DuckDB oracle's floor(x*1e6+.5))
        jac = np.floor((p["co"] / denom) * 1e6 + 0.5) / 1e6
        out = pd.DataFrame({"d1": p["d1"], "d2": p["d2"], "jaccard": jac})
        return out[out["jaccard"] >= threshold]

    out_refs = task_group_blocks(r1_refs, ["key"], finish,
                                 batch_format="pandas")
    return ray.data.from_arrow_refs(out_refs)


def ngram_containment_pairs(docs_ds, threshold: float = 0.6, k: int = 3,
                            hot_shingle_cap: int = 100):
    """EXACT n-gram CONTAINMENT pairs over the same inverted shingle
    index: c1 = co/|A|, c2 = co/|B| — the asymmetric near-dup metric
    that catches sub-document duplication (a doc pasted inside a
    bigger one scores low Jaccard but containment ~1 on the small
    side). Pairs kept where max(c1, c2) >= threshold.
    Out: (d1, d2, co, c1, c2)."""
    import ray
    import ray.data

    from ..shuffle import task_group_blocks

    r1_refs = _ngram_pair_stat_refs(docs_ds, k, hot_shingle_cap)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"d1": "int64", "d2": "int64", "co": "int64",
                "c1": "float64", "c2": "float64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in cols.items()})
        smap = df[df["kind"] == "s"].set_index("key")["n"]
        p = df[df["kind"] == "p"].copy()
        n2 = p["key"].map(smap).fillna(0).astype("int64")
        n1 = p["n1"].clip(lower=1)
        n2c = n2.clip(lower=1)
        c1 = np.floor((p["co"] / n1) * 1e6 + 0.5) / 1e6
        c2 = np.floor((p["co"] / n2c) * 1e6 + 0.5) / 1e6
        out = pd.DataFrame({"d1": p["d1"].astype("int64"),
                            "d2": p["d2"].astype("int64"),
                            "co": p["co"].astype("int64"),
                            "c1": c1, "c2": c2})
        return out[np.maximum(c1, c2) >= threshold][list(cols)]

    out_refs = task_group_blocks(r1_refs, ["key"], finish,
                                 batch_format="pandas")
    return ray.data.from_arrow_refs(out_refs)


# --------------------------------------------------------------- simhash
def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (weighted bit-vote, token
    multiplicity counts). Token hash = last 8 md5 bytes little-endian,
    bit-equal to DuckDB's ``md5_number_lower`` so the SQL oracle can
    replay signatures exactly."""
    import hashlib

    v = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in text.split():
        h = np.uint64(int.from_bytes(
            hashlib.md5(tok.encode()).digest()[8:16], "little"))
        bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
        v += 2 * bits - 1
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized SimHash signatures, bit-equal to :func:`simhash64`
    (pytest-pinned): one DuckDB ``md5_number_lower`` pass over every
    token of every doc, bit votes as one (tokens, 64) matrix, per-doc
    sums via segmented ``add.reduceat``. Token multiplicity counts
    (duplicates stay in). Sliced at ~1M tokens to bound the matrix."""
    from ..scorer import md5_u64

    per_doc = [t.split() for t in texts]
    lens = np.array([len(p) for p in per_doc], dtype=np.int64)
    flat = [tok for doc in per_doc for tok in doc]
    sigs = np.zeros(len(texts), dtype=np.uint64)
    if not flat:
        return sigs
    h_all = md5_u64(flat)
    shifts = np.arange(64, dtype=np.uint64)
    nonempty = np.flatnonzero(lens)
    ends = np.cumsum(lens[nonempty])
    starts = ends - lens[nonempty]
    budget = 1_000_000
    i = 0
    while i < len(nonempty):
        j = i
        while j < len(nonempty) and ends[j] - starts[i] <= budget:
            j += 1
        j = max(j, i + 1)
        seg = h_all[starts[i]:ends[j - 1]]
        votes = (2 * ((seg[:, None] >> shifts[None, :])
                      & np.uint64(1)).astype(np.int32) - 1)
        # segmented sums as cumsum differences (add.reduceat along
        # axis=0 measured 4s for what this does in ~20ms)
        cs = np.cumsum(votes, axis=0)
        seg_starts = starts[i:j] - starts[i]
        seg_ends = ends[i:j] - starts[i]
        v = cs[seg_ends - 1].copy()
        nz = seg_starts > 0
        v[nz] -= cs[seg_starts[nz] - 1]
        bits = (v > 0).astype(np.uint64)
        sigs[nonempty[i:j]] = (bits << shifts[None, :]).sum(
            axis=1, dtype=np.uint64)
        i = j
    return sigs


def simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    """One row per (doc, 16-bit block): pigeonhole LSH — a pair within
    Hamming distance 3 of a 64-bit SimHash must agree exactly on at
    least one of the 4 blocks, so blocking on every block guarantees
    100% recall at the verify threshold."""
    doc_ids, sims, buckets = [], [], []
    hs = simhash64_batch(list(df["text"]))
    for doc_id, h in zip(df["doc_id"], hs):
        h = int(h)
        for blk in range(4):
            bits = (h >> (16 * blk)) & 0xFFFF
            doc_ids.append(doc_id)
            sims.append(h)
            buckets.append((blk << 16) | bits)
    # simhash is a full 64-bit value: pin the dtype to uint64 so Arrow
    # never infers int64 from a lucky all-below-2^63 batch and then
    # overflows on an unlucky one (pandas would otherwise pick int64 or
    # object depending on the batch's values)
    return pd.DataFrame({
        "doc_id": doc_ids,
        "simhash": np.array(sims, dtype=np.uint64),
        "bucket": np.array(buckets, dtype=np.int64),
    })


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """Near-dup pairs within ``max_hamming`` SimHash bits: 4-block
    pigeonhole bucketing + in-bucket Hamming verification + cross-bucket
    pair dedup — as a plain-task shuffle (2 exchanges, no aggregator
    fleets; see minhash_dedup_pairs for the rationale)."""
    import ray
    import ray.data

    from ..shuffle import (bundle_refs, map_refs, split_groups,
                           task_group_blocks)

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — before init
        ncpu = 8
    doc_refs = bundle_refs(docs_ds.materialize().to_arrow_refs(),
                           max_bundles=2 * ncpu)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        all_rows = sorted(
            set(zip(group.column("doc_id").to_pylist(),
                    group.column("simhash").to_pylist()))
        )
        rows = all_rows[:200]
        n = len(all_rows)
        dropped = n * (n - 1) // 2 - len(rows) * (len(rows) - 1) // 2
        o1, o2, hd = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin(rows[i][1] ^ rows[j][1]).count("1")
                if d <= max_hamming:
                    o1.append(rows[i][0])
                    o2.append(rows[j][0])
                    hd.append(d)
        return pa.table({"d1": pa.array(o1, pa.int64()),
                         "d2": pa.array(o2, pa.int64()),
                         "hamming": pa.array(hd, pa.int64()),
                         "dropped_pairs": pa.array([dropped] * len(o1),
                                                   pa.int64())})

    def sigs_fn(t: pa.Table) -> pd.DataFrame:
        return simhash_batch(t.to_pandas())

    def bucket_block(t: pa.Table) -> pa.Table:
        outs = [bucket_pairs(g) for g in split_groups(t, "bucket")]
        return pa.concat_tables(outs) if outs else pa.table(
            {"d1": pa.array([], pa.int64()),
             "d2": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64()),
             "dropped_pairs": pa.array([], pa.int64())})

    pair_refs = task_group_blocks(map_refs(doc_refs, sigs_fn),
                                  ["bucket"], bucket_block,
                                  batch_format="pyarrow")

    def block_distinct(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"d1": pd.Series(dtype="int64"),
                                 "d2": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64"),
                                 "dropped_pairs": pd.Series(dtype="int64")})
        return df.drop_duplicates(["d1", "d2"])

    out_refs = task_group_blocks(pair_refs, ["d1"], block_distinct,
                                 batch_format="pandas")
    return ray.data.from_arrow_refs(out_refs)


# ---------------------------------------------------------- resolution
_LABEL_PAD = 20  # zero-padded doc-id labels: lexicographic min (what the
# string-keyed label propagation computes) == numeric min doc_id


def _pad_ids(col) -> pa.Array:
    import pyarrow.compute as pc

    return pc.utf8_lpad(pc.cast(col, pa.string()), _LABEL_PAD, "0")


def _edge_rows(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or "d1" not in t.column_names:
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string())})
    return pa.table({"src": _pad_ids(t.column("d1")),
                     "dst": _pad_ids(t.column("d2"))})


def _label_rows(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "label": pa.array([], pa.string())})
    both = pa.concat_arrays([t.column("src").combine_chunks(),
                             t.column("dst").combine_chunks()])
    u = pc.unique(both)
    return pa.table({"node": u, "label": u})


def _num_rows(t: pa.Table) -> int:
    return t.num_rows


def resolve_near_dups(docs_ds, pairs_ds, *, num_partitions: int | None = None,
                      broadcast_max: int = 2_000_000):
    """Near-dup PAIRS -> per-document keep/drop RESOLUTION:
    (doc_id, canonical_id, keep) for every corpus document, where
    canonical_id is the min doc_id of the pair-graph component (the
    representative a dedup pass retains) and keep = 1 iff the document
    IS its component's canonical (isolated documents keep themselves).

    This is the last step a production dedup pipeline needs after any
    of the pair generators in this module (the reference repo stops at
    clusters; the keep-list analog of its NIL-cluster min-id labeling,
    Clusterer.scala:22-47's representative selection).

    Scale shape: connected components run on the PAIR set only (bounded
    by duplicate density, not corpus size) via the same plain-task label
    propagation the linkage fallback uses (el/cluster.py); the
    corpus-scale attach broadcasts the canonical map when the labeled
    node count fits ``broadcast_max`` and otherwise hash-joins labels
    onto docs (group_blocks union idiom) — no corpus-wide driver
    structure on either path.
    """
    import ray

    from ..cluster import label_propagation_tasks
    from ..shuffle import default_partitions, group_blocks, map_refs

    P = num_partitions or default_partitions()
    edge_refs = map_refs(pairs_ds.to_arrow_refs(), _edge_rows)
    lab_parts = label_propagation_tasks(
        edge_refs, map_refs(edge_refs, _label_rows), num_partitions=P)

    nrows = ray.remote(_num_rows)
    total = sum(ray.get([nrows.remote(r) for r in lab_parts]))

    if total <= broadcast_max:
        canon: dict[int, int] = {}
        for t in ray.get(lab_parts):
            if t.num_rows == 0:  # empty partitions arrive schema-less
                continue
            for n, l in zip(t.column("node").to_pylist(),
                            t.column("label").to_pylist()):
                canon[int(n)] = int(l)
        canon_ref = ray.put(canon)

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(canon_ref)
            ids = df["doc_id"].astype("int64")
            canonical = ids.map(m).fillna(ids).astype("int64")
            return pd.DataFrame({
                "doc_id": ids.values,
                "canonical_id": canonical.values,
                "keep": (canonical.values == ids.values).astype("int64"),
            })

        return docs_ds.select_columns(["doc_id"]).map_batches(
            attach, batch_format="pandas")

    import ray.data

    def lab_u(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "node" not in df.columns:  # schema-less empty
            return pd.DataFrame({"key": pd.Series(dtype="int64"),
                                 "kind": pd.Series(dtype=str),
                                 "canon": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "key": df["node"].astype("int64"),
            "kind": "l",
            "canon": df["label"].astype("int64"),
        })

    def doc_u(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["doc_id"].astype("int64"),
            "kind": "d",
            "canon": np.zeros(len(df), dtype=np.int64),
        })

    u = docs_ds.select_columns(["doc_id"]).map_batches(
        doc_u, batch_format="pandas"
    ).union(ray.data.from_arrow_refs(lab_parts).map_batches(
        lab_u, batch_format="pandas"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "canonical_id": pd.Series(dtype="int64"),
                                 "keep": pd.Series(dtype="int64")})
        lmap = (df[df["kind"] == "l"].drop_duplicates("key")
                .set_index("key")["canon"])
        ids = df.loc[df["kind"] == "d", "key"].astype("int64")
        canonical = ids.map(lmap).fillna(ids).astype("int64")
        return pd.DataFrame({
            "doc_id": ids.values,
            "canonical_id": canonical.values,
            "keep": (canonical.values == ids.values).astype("int64"),
        })

    return group_blocks(u, ["key"], finish, batch_format="pandas",
                        num_partitions=P)
