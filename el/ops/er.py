"""Classic entity-resolution blocking / evaluation operators.

The standard record-linkage toolbox the reference implies but never
names (its blocking is the candidate-finder composition,
RunKBPEntityLinkerSystem.scala:45-49; its pair filter is
MentionPairTrainingData.scala:57-70; its eval is Benchmarker.scala).
Blocking: sorted_neighborhood, metablocking_pairs, rare_token_keys
(+ block purging/skew reports in el/queries.py). Pair similarity:
token_pair_sims (Jaccard/Dice/overlap/Monge-Elkan), edit_pair_sims
(Levenshtein), tfidf_pair_sims, soft_tfidf_pair_sims. Decision models:
fellegi_sunter (supervised m/u weights), fs_em (unsupervised EM),
fs_em_scores (per-pair match probabilities). Matching/merging:
mutual_best (one-to-one), incremental_assign (base/delta CDC),
golden_record (survivorship). Evaluation: blocking_quality,
cluster_ari. The original four, in detail:

- sorted_neighborhood: Hernandez-Stolfo sorted-neighborhood blocking —
  sort mentions by a key, emit candidate pairs within a sliding window.
  Distributed shape: ONE sort (the defining exchange), then a
  distributed prefix-sum count wave (one int per block on the driver)
  and block-local vectorized pair emission with an O(window) boundary
  patch from the following blocks — the token_pack prefix-sum idiom
  (el/ops/prep.py:558), no extra shuffle.
- metablocking_pairs: graph meta-blocking (Papadakis et al.) — prune
  candidate pairs by Common-Blocks (CBS) weighting: keep pairs that
  co-occur in >= min_cbs blocking keys. One key exchange for pair
  generation + one pair exchange for the CBS count.
- blocking_quality: the standard blocking-scheme eval triple — pairs
  completeness (recall of true matching pairs), reduction ratio
  (1 - |candidates| / C(n,2)) and pairs quality (precision) of the
  n:/p: blocking scheme against gold entity labels. Two exchanges
  (pair dedup, per-entity sizes); the driver sees one row.
- fellegi_sunter: Fellegi-Sunter match/unmatch weights — per-feature
  agreement probabilities m = P(agree|match), u = P(agree|non-match)
  with add-one smoothing and weight = log2(m/u), estimated from the
  labeled candidate-pair set. Per-batch vectorized agreement partials
  -> one tiny feature exchange (5 keys); the driver sees 5 rows.

Scale notes (10^12 turns): sorted_neighborhood moves each row through
exactly one sort; within-key pair generation in metablocking_pairs /
blocking_quality is quadratic per block — production callers go through
el/blocking.py's salted/capped generator (MAX_ALIASES_PER_BLOCK); these
eval surfaces document the cap rather than silently dropping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import group_blocks

_ROUND6 = 10 ** 6


def _round6(x: np.ndarray | float) -> np.ndarray | float:
    return np.floor(np.asarray(x, dtype=np.float64) * _ROUND6 + 0.5) / _ROUND6


def _norm_series(s: pd.Series) -> pd.Series:
    """Vectorized normalize_name (el/text.py:95): lowercase, non-alnum
    runs -> single space, trim. Must stay bit-identical to NORM_SQL
    (el/queries.py:38)."""
    return (s.str.lower()
            .str.replace(r"[^a-z0-9]+", " ", regex=True)
            .str.strip())


# ------------------------------------------------- sorted neighborhood
def _snb_count(t: pa.Table) -> int:
    return t.num_rows


def _snb_head(w: int, *tbls: pa.Table) -> pa.Table:
    """First w rows of the concatenation of the following blocks."""
    tbls = [t for t in tbls if t.num_rows]
    if not tbls:
        return pa.table({"mention_id": pa.array([], pa.string())})
    cat = pa.concat_tables([t.select(["mention_id"]) for t in tbls])
    return cat.slice(0, w)


def _snb_pairs(window: int, block: pa.Table, head: pa.Table) -> pa.Table:
    """Pairs (i, j), 0 < j - i < window, owned by i's block; j may
    spill into the boundary head. Pure numpy slicing per distance."""
    ids = block.column("mention_id").to_pandas().to_numpy(dtype=object)
    ext = np.concatenate(
        [ids, head.column("mention_id").to_pandas().to_numpy(dtype=object)])
    n = len(ids)
    m1, m2, dist = [], [], []
    for d in range(1, window):
        k = min(n, len(ext) - d)
        if k <= 0:
            continue
        m1.append(ids[:k])
        m2.append(ext[d:d + k])
        dist.append(np.full(k, d, dtype=np.int64))
    if not m1:
        return pa.table({"m1_id": pa.array([], pa.string()),
                         "m2_id": pa.array([], pa.string()),
                         "dist": pa.array([], pa.int64())})
    return pa.table({
        "m1_id": pa.array(np.concatenate(m1), pa.string()),
        "m2_id": pa.array(np.concatenate(m2), pa.string()),
        "dist": pa.array(np.concatenate(dist), pa.int64()),
    })


def sorted_neighborhood(mentions_ds, *, window: int = 4):
    """Sorted-neighborhood candidate pairs over (norm(surface),
    mention_id) order: every pair of mentions within ``window``
    positions of each other, with their rank distance.

    Out: (m1_id, m2_id, dist) — m1 earlier in the sort order,
    1 <= dist < window. Mentions with empty normalized surface are
    excluded (they carry no blocking signal)."""
    import ray
    import ray.data

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"mention_id": df["mention_id"].astype(str),
                            "norm": _norm_series(df["surface"].astype(str))})
        return out[out["norm"] != ""].reset_index(drop=True)

    ds = (mentions_ds.map_batches(keyed, batch_format="pandas")
          .sort(["norm", "mention_id"]))
    refs = ds.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(_snb_pairs(window, _snb_head(0), _snb_head(0)))
    count_rem = ray.remote(_snb_count)
    counts = ray.get([count_rem.remote(r) for r in refs])
    head_rem = ray.remote(_snb_head)
    pair_rem = ray.remote(_snb_pairs)
    outs = []
    for b, r in enumerate(refs):
        # following blocks contributing to this block's boundary head
        need, feed = window - 1, []
        for nb in range(b + 1, len(refs)):
            if need <= 0:
                break
            feed.append(refs[nb])
            need -= counts[nb]
        head = head_rem.remote(window - 1, *feed) if feed \
            else head_rem.remote(window - 1)
        outs.append(pair_rem.remote(window, r, head))
    return ray.data.from_arrow_refs(outs)


# ------------------------------------------------------- meta-blocking
def _sql_block_keys(df: pd.DataFrame, extra: list[str] | None = None
                    ) -> pd.DataFrame:
    """(mention, key) rows for the SQL-replayable scheme: n:<norm> +
    p:<first-token prefix 6> (el_block_keys semantics,
    el/queries.py:148). ``extra`` names pass-through columns."""
    extra = extra or []
    norm = _norm_series(df["surface"].astype(str))
    first = norm.str.split(" ").str[0].fillna("")
    base = pd.DataFrame({"mention_id": df["mention_id"].astype(str),
                         "norm": norm})
    for c in extra:
        base[c] = df[c].astype(str)
    n_rows = base[base["norm"] != ""].copy()
    n_rows["block_key"] = "n:" + n_rows["norm"]
    p_rows = base[first.str.len() >= 3].copy()
    p_rows["block_key"] = "p:" + first[first.str.len() >= 3].str[:6]
    out = pd.concat([n_rows, p_rows], ignore_index=True)
    return out[["mention_id", "block_key", *extra]]


def _block_pairs_frame(df: pd.DataFrame, carry: list[str] | None = None,
                       cap: int = 10_000) -> pd.DataFrame:
    """Within-key pair generation over one co-located block (may hold
    many keys): distinct mentions per key, triangular index pairs.
    ``cap`` bounds the per-key quadratic (production pair-gen salts at
    MAX_ALIASES_PER_BLOCK, el/blocking.py:41; here we fail loudly
    instead of dropping so the eval never under-reports)."""
    carry = carry or []
    cols = {"m1_id": [], "m2_id": [],
            **{f"{c}1": [] for c in carry}, **{f"{c}2": [] for c in carry}}
    if len(df) == 0:
        return pd.DataFrame({k: pd.Series(dtype=str) for k in cols})
    for _, g in df.groupby("block_key", sort=False):
        g = g.drop_duplicates("mention_id").sort_values("mention_id")
        n = len(g)
        if n < 2:
            continue
        if n > cap:
            raise ValueError(
                f"block {g['block_key'].iloc[0]!r} holds {n} mentions "
                f"(> cap {cap}); route through the salted generator")
        i, j = np.triu_indices(n, k=1)
        ids = g["mention_id"].to_numpy(dtype=object)
        cols["m1_id"].append(ids[i])
        cols["m2_id"].append(ids[j])
        for c in carry:
            vals = g[c].to_numpy(dtype=object)
            cols[f"{c}1"].append(vals[i])
            cols[f"{c}2"].append(vals[j])
    if not cols["m1_id"]:
        return pd.DataFrame({k: pd.Series(dtype=str) for k in cols})
    return pd.DataFrame({k: np.concatenate(v) for k, v in cols.items()})


def metablocking_pairs(mentions_ds, *, min_cbs: int = 2):
    """CBS-weighted meta-blocking: candidate pairs sharing >= min_cbs
    blocking keys of the n:/p: scheme. Out: (m1_id, m2_id, cbs)."""
    keys = mentions_ds.map_batches(_sql_block_keys, batch_format="pandas")
    pairs = group_blocks(keys, ["block_key"], _block_pairs_frame,
                         batch_format="pandas")

    def cbs_count(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"m1_id": pd.Series(dtype=str),
                                 "m2_id": pd.Series(dtype=str),
                                 "cbs": pd.Series(dtype="int64")})
        out = (df.groupby(["m1_id", "m2_id"], sort=False)
               .size().rename("cbs").reset_index())
        return out[out["cbs"] >= min_cbs].reset_index(drop=True)

    return group_blocks(pairs, ["m1_id", "m2_id"], cbs_count,
                        batch_format="pandas")


# ---------------------------------------------------- blocking quality
def blocking_quality(mentions_ds):
    """Blocking-scheme evaluation against gold entity labels: one row
    (n_mentions, candidate_pairs, matching_pairs, tp_pairs,
    pairs_completeness, reduction_ratio, pairs_quality), floats rounded
    half-away at 6.

    candidate = distinct within-key pairs of the n:/p: scheme; matching
    = all same-entity pairs (sum over entities of C(size, 2)); tp =
    candidates whose gold ids agree. The gold label travels WITH the
    key rows, so the match flag is computed inside the pair generator —
    no mention-table join afterwards."""
    import ray

    n_mentions = mentions_ds.count()

    keys = mentions_ds.map_batches(
        lambda df: _sql_block_keys(df, extra=["gold_kb_id"]),
        batch_format="pandas")
    pairs = group_blocks(
        keys, ["block_key"],
        lambda df: _block_pairs_frame(df, carry=["gold_kb_id"]),
        batch_format="pandas")

    def dedup_count(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"cand": pd.Series(dtype="int64"),
                                 "tp": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["m1_id", "m2_id"])
        return pd.DataFrame({
            "cand": [np.int64(len(d))],
            "tp": [np.int64((d["gold_kb_id1"] == d["gold_kb_id2"]).sum())],
        })

    cand_parts = group_blocks(pairs, ["m1_id", "m2_id"], dedup_count,
                              batch_format="pandas").to_pandas()
    cand = int(cand_parts["cand"].sum())
    tp = int(cand_parts["tp"].sum())

    def entity_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"mp": pd.Series(dtype="int64")})
        c = df.groupby("gold_kb_id", sort=False).size().to_numpy()
        return pd.DataFrame({"mp": [np.int64((c * (c - 1) // 2).sum())]})

    ent = mentions_ds.map_batches(
        lambda df: df[["mention_id", "gold_kb_id"]], batch_format="pandas")
    mp_parts = group_blocks(ent, ["gold_kb_id"], entity_pairs,
                            batch_format="pandas").to_pandas()
    matching = int(mp_parts["mp"].sum())

    total = n_mentions * (n_mentions - 1) // 2
    pc = _round6(tp / matching) if matching else 0.0
    rr = _round6(1.0 - cand / total) if total else 0.0
    pq = _round6(tp / cand) if cand else 0.0
    return pd.DataFrame({
        "n_mentions": pd.Series([n_mentions], dtype="int64"),
        "candidate_pairs": pd.Series([cand], dtype="int64"),
        "matching_pairs": pd.Series([matching], dtype="int64"),
        "tp_pairs": pd.Series([tp], dtype="int64"),
        "pairs_completeness": [float(pc)],
        "reduction_ratio": [float(rr)],
        "pairs_quality": [float(pq)],
    })


def _snbq_head(w: int, *tbls: pa.Table) -> pa.Table:
    """First w (mention_id, gold) rows of the following blocks."""
    tbls = [t for t in tbls if t.num_rows]
    if not tbls:
        return pa.table({"mention_id": pa.array([], pa.string()),
                         "gold": pa.array([], pa.string())})
    cat = pa.concat_tables([t.select(["mention_id", "gold"])
                            for t in tbls])
    return cat.slice(0, w)


def _snbq_counts(window: int, block: pa.Table, head: pa.Table) -> pa.Table:
    """(cand, tp) partial for one sorted block + boundary head: SNB
    emits each pair exactly once, so counting is pure shifted-slice
    numpy — no pair rows materialize."""
    ids = block.column("mention_id").to_pandas().to_numpy(dtype=object)
    gold = block.column("gold").to_pandas().to_numpy(dtype=object)
    ext_g = np.concatenate(
        [gold, head.column("gold").to_pandas().to_numpy(dtype=object)])
    n = len(ids)
    cand = tp = 0
    for d in range(1, window):
        k = min(n, len(ext_g) - d)
        if k <= 0:
            continue
        cand += k
        tp += int((gold[:k] == ext_g[d:d + k]).sum())
    return pa.table({"cand": pa.array([cand], pa.int64()),
                     "tp": pa.array([tp], pa.int64())})


def snb_quality(mentions_ds, *, window: int = 4):
    """blocking_quality's report applied to the SORTED-NEIGHBORHOOD
    scheme (the "snb" pluggable strategy, el/blocking.py): candidate =
    every pair within ``window`` positions of the (norm(surface),
    mention_id) sort order. Same one-row contract: (n_mentions,
    candidate_pairs, matching_pairs, tp_pairs, pairs_completeness,
    reduction_ratio, pairs_quality), floats rounded half-away at 6.

    Shape: one alias-scale sort; per-block (cand, tp) partials via
    shifted slices against the boundary head (the sorted_neighborhood
    task pattern — SNB emits each pair exactly once, so no dedup
    exchange); matching pairs via one gold exchange. The pair set
    never materializes."""
    import ray
    import ray.data

    n_mentions = mentions_ds.count()

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "mention_id": df["mention_id"].astype(str),
            "gold": df["gold_kb_id"].astype(str),
            "norm": _norm_series(df["surface"].astype(str))})
        return out[out["norm"] != ""].reset_index(drop=True)

    ds = (mentions_ds.map_batches(keyed, batch_format="pandas")
          .sort(["norm", "mention_id"]))
    refs = ds.to_arrow_refs()
    cand = tp = 0
    if refs:
        count_rem = ray.remote(_snb_count)
        counts = ray.get([count_rem.remote(r) for r in refs])
        head_rem = ray.remote(_snbq_head)
        cnt_rem = ray.remote(_snbq_counts)
        outs = []
        for b, r in enumerate(refs):
            need, feed = window - 1, []
            for nb in range(b + 1, len(refs)):
                if need <= 0:
                    break
                feed.append(refs[nb])
                need -= counts[nb]
            head = head_rem.remote(window - 1, *feed) if feed \
                else head_rem.remote(window - 1)
            outs.append(cnt_rem.remote(window, r, head))
        for t in ray.get(outs):
            cand += int(t.column("cand")[0].as_py())
            tp += int(t.column("tp")[0].as_py())

    def entity_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"mp": pd.Series(dtype="int64")})
        c = df.groupby("gold_kb_id", sort=False).size().to_numpy()
        return pd.DataFrame({"mp": [np.int64((c * (c - 1) // 2).sum())]})

    ent = mentions_ds.map_batches(
        lambda df: df[["mention_id", "gold_kb_id"]], batch_format="pandas")
    mp_parts = group_blocks(ent, ["gold_kb_id"], entity_pairs,
                            batch_format="pandas").to_pandas()
    matching = int(mp_parts["mp"].sum())

    total = n_mentions * (n_mentions - 1) // 2
    pc = _round6(tp / matching) if matching else 0.0
    rr = _round6(1.0 - cand / total) if total else 0.0
    pq = _round6(tp / cand) if cand else 0.0
    return pd.DataFrame({
        "n_mentions": pd.Series([n_mentions], dtype="int64"),
        "candidate_pairs": pd.Series([cand], dtype="int64"),
        "matching_pairs": pd.Series([matching], dtype="int64"),
        "tp_pairs": pd.Series([tp], dtype="int64"),
        "pairs_completeness": [float(pc)],
        "reduction_ratio": [float(rr)],
        "pairs_quality": [float(pq)],
    })


# ------------------------------------------------- blocking skew report
def block_skew(mentions_ds, *, k: int = 20):
    """Hot-key diagnostics for the n:/p: blocking scheme: the ``k``
    blocks contributing the most candidate pairs, with each block's
    mention count, pair count C(c, 2) and share of the scheme's total
    pair volume (rounded half-away at 6). The operator behind the
    salting decision (el/blocking.py:41): its output IS the list of
    keys that need salt at scale.

    Shape: per-batch partial key counts (combiner) -> one key exchange
    -> per-partition local top-k -> tiny global sort+limit; the total
    pair volume is a scalar aggregate over the per-key table. Ties at
    the cut break by block_key ascending — fully deterministic."""
    import ray.data  # noqa: F401

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = _sql_block_keys(df)
        if len(keys) == 0:
            return pd.DataFrame({"block_key": pd.Series(dtype=str),
                                 "c": pd.Series(dtype="int64")})
        return (keys.groupby("block_key", sort=False).size()
                .rename("c").reset_index())

    parts = mentions_ds.map_batches(partial, batch_format="pandas")

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"block_key": str, "n_mentions": "int64",
                "pair_count": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=d)
                                 for c, d in cols.items()})
        g = df.groupby("block_key", sort=False)["c"].sum()
        out = pd.DataFrame({"block_key": g.index.astype(str),
                            "n_mentions": g.to_numpy(dtype="int64")})
        c = out["n_mentions"].to_numpy()
        out["pair_count"] = (c * (c - 1) // 2).astype("int64")
        # local top-k combiner: only k rows per partition reach the sort
        return (out.sort_values(["pair_count", "block_key"],
                                ascending=[False, True])
                .head(k).reset_index(drop=True))

    keyed = group_blocks(parts, ["block_key"], per_key,
                         batch_format="pandas")
    # total pair volume needs every key, not just local top-k: recompute
    # from the partials with a second tiny fold (sum of C(c,2) partials
    # per partition -> driver sums one row per partition)
    def total_fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"t": pd.Series(dtype="int64")})
        c = (df.groupby("block_key", sort=False)["c"].sum()
             .to_numpy(dtype="int64"))
        return pd.DataFrame({"t": [np.int64((c * (c - 1) // 2).sum())]})

    total_parts = group_blocks(parts, ["block_key"], total_fold,
                               batch_format="pandas").to_pandas()
    total = int(total_parts["t"].sum())

    top = (keyed.sort(["pair_count", "block_key"],
                      descending=[True, False]).limit(k).to_pandas())
    top["pair_share"] = _round6(top["pair_count"].to_numpy() / total) \
        if total else 0.0
    return top


# --------------------------------------------- hybrid token similarity
class _TokenSims:
    """Actor-pool scorer: token-set similarities per labeled pair —
    Jaccard / Dice / overlap coefficient over DISTINCT tokens, plus
    Monge-Elkan (mean over s1's tokens, in order and with duplicates,
    of the max Jaro-Winkler against s2's tokens; inner JW rounded at 5
    so the SQL comprehension replays the same doubles). All outputs
    rounded half-away at 6."""

    def __init__(self, surf_ref):
        import ray

        from ..sim import jaro_winkler
        from ..text import normalize_name
        self.surf = ray.get(surf_ref)
        self.norm = normalize_name
        self.jw = jaro_winkler

    def __call__(self, t: pa.Table) -> pa.Table:
        m1 = t.column("m1_id").to_pylist()
        m2 = t.column("m2_id").to_pylist()
        jac, dice, ov, me = [], [], [], []
        for a, b in zip(m1, m2):
            t1 = self.norm(self.surf[a]).split(" ")
            t2 = self.norm(self.surf[b]).split(" ")
            u1, u2 = set(t1), set(t2)
            inter = len(u1 & u2)
            union = len(u1 | u2)
            jac.append(inter / union if union else 0.0)
            dice.append(2 * inter / (len(u1) + len(u2)))
            ov.append(inter / min(len(u1), len(u2)))
            maxima = [
                max(np.floor(self.jw(x, y) * 1e5 + 0.5) / 1e5 for y in t2)
                for x in t1
            ]
            me.append(float(np.mean(maxima)))
        return pa.table({
            "m1_id": pa.array(m1, pa.string()),
            "m2_id": pa.array(m2, pa.string()),
            "jaccard": pa.array(_round6(jac), pa.float64()),
            "dice": pa.array(_round6(dice), pa.float64()),
            "overlap": pa.array(_round6(ov), pa.float64()),
            "monge_elkan": pa.array(_round6(me), pa.float64()),
        })


def token_pair_sims(pairs_ds, surf_ref):
    """Hybrid token-level similarities for candidate pairs (the
    string-similarity menu beyond whole-string JW/Levenshtein):
    out (m1_id, m2_id, jaccard, dice, overlap, monge_elkan)."""
    return pairs_ds.map_batches(_TokenSims, fn_constructor_args=(surf_ref,),
                                batch_format="pyarrow", concurrency=2,
                                num_cpus=0.5)


# ------------------------------------------------ incremental assign
def incremental_assign(mentions_ds, *, split_hex: str = "8"):
    """Incremental entity resolution: mentions whose md5(conv_id) first
    hex digit is below ``split_hex`` form the EXISTING base corpus
    (exact-alias clusters, representative = min mention_id); the rest
    arrive as the NEW batch and are assigned to an existing cluster when
    their normalized surface matches a base alias, else to a fresh NIL
    cluster (min mention_id per new alias). Out, for the new batch
    only: (mention_id, cluster_id, is_new).

    Shape: ONE hash exchange on the alias norm (tagged base/delta rows
    meet in the same block) — no broadcast of the base cluster map, so
    the base side can be arbitrarily large. Mentions with empty norm
    carry no alias signal and are excluded. Mirrors clusterNils'
    exact-alias grouping (RunKBPEntityLinkerSystem.scala:162-170)
    applied across a base/delta split — the CDC shape of ER."""
    import hashlib

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "mention_id": df["mention_id"].astype(str),
            "norm": _norm_series(df["surface"].astype(str)),
            "is_base": df["conv_id"].astype(str).map(
                lambda c: hashlib.md5(c.encode()).hexdigest()[0] < split_hex),
        })
        return out[out["norm"] != ""].reset_index(drop=True)

    tagged = mentions_ds.map_batches(tag, batch_format="pandas")

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"mention_id": str, "cluster_id": str, "is_new": bool}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=d)
                                 for c, d in cols.items()})
        base_min = (df[df["is_base"]].groupby("norm")["mention_id"].min())
        delta = df[~df["is_base"]]
        if len(delta) == 0:
            return pd.DataFrame({c: pd.Series(dtype=d)
                                 for c, d in cols.items()})
        new_min = delta.groupby("norm")["mention_id"].min()
        existing = delta["norm"].map(base_min)
        return pd.DataFrame({
            "mention_id": delta["mention_id"].to_numpy(),
            "cluster_id": existing.fillna(
                delta["norm"].map(new_min)).to_numpy(),
            "is_new": existing.isna().to_numpy(),
        })

    return group_blocks(tagged, ["norm"], assign, batch_format="pandas")


# ---------------------------------------------------- Fellegi-Sunter
FS_FEATURES = ("exact", "first_token", "jw92", "last_token", "token_count")


def _agreement_flags(m1, m2, surf, norm_fn, jw_fn) -> dict[str, np.ndarray]:
    """Per-pair boolean agreement vectors for the 5 FS features (all
    SQL-replayable; JW rounded at 5 to match DuckDB bit-for-bit)."""
    n1 = [norm_fn(surf[a]) for a in m1]
    n2 = [norm_fn(surf[b]) for b in m2]
    t1 = [s.split(" ") for s in n1]
    t2 = [s.split(" ") for s in n2]
    jw = np.floor(np.array([jw_fn(a, b)
                            for a, b in zip(n1, n2)]) * 1e5 + 0.5) / 1e5
    return {
        "exact": np.array([a == b for a, b in zip(n1, n2)]),
        "first_token": np.array([a[0] == b[0] for a, b in zip(t1, t2)]),
        "jw92": jw >= 0.92,
        "last_token": np.array([a[-1] == b[-1] for a, b in zip(t1, t2)]),
        "token_count": np.array([len(a) == len(b)
                                 for a, b in zip(t1, t2)]),
    }


class _FSPartials:
    """Actor-pool batch fn over labeled pairs: per-feature agreement
    partial counts (5 rows out per batch). Surfaces resolve through a
    broadcast mention->surface map (zero-copy ray.get per actor,
    q_el_pair_jw pattern); JW uses the engine kernel rounded at 5 —
    bit-identical to DuckDB's jaro_winkler_similarity (el_pair_jw)."""

    def __init__(self, surf_ref):
        import ray

        from ..text import normalize_name
        self.surf = ray.get(surf_ref)
        self.norm = normalize_name

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..sim import jaro_winkler

        m1 = t.column("m1_id").to_pylist()
        m2 = t.column("m2_id").to_pylist()
        lab = np.asarray(t.column("same_entity").to_pylist(), dtype=bool)
        agree = _agreement_flags(m1, m2, self.surf, self.norm, jaro_winkler)
        nm, nn = int(lab.sum()), int((~lab).sum())
        return pa.table({
            "feature": pa.array(list(FS_FEATURES), pa.string()),
            "agree_match": pa.array(
                [int((agree[f] & lab).sum()) for f in FS_FEATURES],
                pa.int64()),
            "agree_nonmatch": pa.array(
                [int((agree[f] & ~lab).sum()) for f in FS_FEATURES],
                pa.int64()),
            "n_match": pa.array([nm] * len(FS_FEATURES), pa.int64()),
            "n_nonmatch": pa.array([nn] * len(FS_FEATURES), pa.int64()),
        })


def fellegi_sunter(pairs_ds, surf_ref):
    """Fellegi-Sunter weights from the labeled candidate-pair set:
    per feature, m = (agree|match + 1) / (matches + 2), u likewise over
    non-matches (add-one smoothing), weight = log2(m / u) — m/u/weight
    computed from the 6-rounded probabilities so the oracle replays
    log2 of the SAME doubles. Out: one row per feature.

    ``pairs_ds``: (m1_id, m2_id, same_entity); ``surf_ref``: ray.put
    broadcast of {mention_id: surface}."""
    parts = pairs_ds.map_batches(_FSPartials, fn_constructor_args=(surf_ref,),
                                 batch_format="pyarrow", concurrency=2,
                                 num_cpus=0.5)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["feature", "n_match", "n_nonmatch", "agree_match",
                "agree_nonmatch", "m_prob", "u_prob", "weight"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(
                dtype=(str if c == "feature" else
                       "float64" if c in ("m_prob", "u_prob", "weight")
                       else "int64")) for c in cols})
        g = df.groupby("feature", sort=True).sum(numeric_only=True)
        m = _round6((g["agree_match"] + 1) / (g["n_match"] + 2))
        u = _round6((g["agree_nonmatch"] + 1) / (g["n_nonmatch"] + 2))
        w = _round6(np.log2(m / u))
        return pd.DataFrame({
            "feature": g.index.astype(str),
            "n_match": g["n_match"].astype("int64"),
            "n_nonmatch": g["n_nonmatch"].astype("int64"),
            "agree_match": g["agree_match"].astype("int64"),
            "agree_nonmatch": g["agree_nonmatch"].astype("int64"),
            "m_prob": m, "u_prob": u, "weight": w,
        }).reset_index(drop=True)

    return group_blocks(parts, ["feature"], fold, batch_format="pandas",
                        num_partitions=4)


# ------------------------------------------- unsupervised EM (Splink)
EM_INIT_LAMBDA = 0.5
EM_INIT_M = 0.9
EM_INIT_U = 0.1
EM_GRID = 10 ** 9  # gamma quantization grid: integer sums -> bit-exact


class _AgreeFlags:
    """Actor-pool batch fn: pair ids -> the 5 boolean agreement columns
    (computed once, materialized, then re-scanned per EM iteration)."""

    def __init__(self, surf_ref):
        import ray

        from ..text import normalize_name
        self.surf = ray.get(surf_ref)
        self.norm = normalize_name

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..sim import jaro_winkler

        m1 = t.column("m1_id").to_pylist()
        m2 = t.column("m2_id").to_pylist()
        agree = _agreement_flags(m1, m2, self.surf, self.norm, jaro_winkler)
        return pa.table({f"a_{f}": pa.array(agree[f])
                         for f in FS_FEATURES})


def _em_partials(t: pa.Table, params: dict) -> pa.Table:
    """One E-step over a block: quantized-gamma integer partial sums.

    gamma is computed in IEEE double from the previous iteration's
    6-rounded parameters (identical literals on the SQL side, so the
    doubles match bit-for-bit), then quantized to the 1e9 integer grid;
    every cross-block reduction is over int64 — no float sum order
    anywhere."""
    n = t.num_rows
    if n == 0:
        cols = {"n": [], "s": []}
        cols.update({f"sa_{f}": [] for f in FS_FEATURES})
        cols.update({f"na_{f}": [] for f in FS_FEATURES})
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in cols.items()})
    lam = params["lam"]
    w = np.full(n, lam, dtype=np.float64)
    v = np.full(n, 1.0 - lam, dtype=np.float64)
    flags = {}
    for f in FS_FEATURES:
        a = np.asarray(t.column(f"a_{f}").to_pylist(), dtype=bool)
        flags[f] = a
        m_i, u_i = params["m"][f], params["u"][f]
        w *= np.where(a, m_i, 1.0 - m_i)
        v *= np.where(a, u_i, 1.0 - u_i)
    gamma = w / (w + v)
    g = np.floor(gamma * EM_GRID + 0.5).astype(np.int64)
    out = {"n": [np.int64(n)], "s": [np.int64(g.sum())]}
    for f in FS_FEATURES:
        out[f"sa_{f}"] = [np.int64(g[flags[f]].sum())]
        out[f"na_{f}"] = [np.int64(flags[f].sum())]
    return pa.table({k: pa.array(val, pa.int64())
                     for k, val in out.items()})


def fs_em(pairs_ds, surf_ref, *, iters: int = 3):
    """UNSUPERVISED Fellegi-Sunter parameter estimation by EM (the
    Splink/fastLink core loop) over UNLABELED candidate pairs: estimate
    lambda = P(match) and per-feature m/u agreement probabilities from
    the agreement patterns alone. Fixed ``iters`` E/M rounds from fixed
    literals (lambda 0.5, m 0.9, u 0.1).

    Bit-exactness (the integer-PageRank trick, el/ops/graph.py): each
    pair's responsibility gamma is an IEEE-double expression of the
    previous iteration's 6-ROUNDED parameters, quantized onto a 1e9
    integer grid before any cross-pair reduction — all sums are int64
    (exact at <= 9.2e18: 1e9 x up to ~9e9 pairs), all derived
    parameters are ratios of exactly-representable ints (< 2^53)
    rounded half-away at 6. The SQL oracle replays the SAME unrolled
    iterations (el/queries.py::_fs_em_sql).

    Shape per iteration: one streamed scan of the materialized
    agreement table (5 bool cols, computed once by an actor pool) ->
    one int64 row per block -> single-partition fold; the driver holds
    13 integers. Out: one row per feature (feature, m_prob, u_prob,
    lam) — lam repeated, like n_match in fellegi_sunter."""
    flags = pairs_ds.map_batches(
        _AgreeFlags, fn_constructor_args=(surf_ref,),
        batch_format="pyarrow", concurrency=2, num_cpus=0.5).materialize()

    params = {"lam": EM_INIT_LAMBDA,
              "m": {f: EM_INIT_M for f in FS_FEATURES},
              "u": {f: EM_INIT_U for f in FS_FEATURES}}
    for _ in range(iters):
        p = dict(params)  # bind current values for the closure
        parts = flags.map_batches(
            lambda t, _p=p: _em_partials(t, _p),
            batch_format="pyarrow", batch_size=None)

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame(
                    {c: pd.Series(dtype="int64")
                     for c in ["n", "s",
                               *[f"sa_{f}" for f in FS_FEATURES],
                               *[f"na_{f}" for f in FS_FEATURES]]})
            return df.sum(numeric_only=True).astype("int64").to_frame().T

        tot = group_blocks(
            parts.map_batches(
                lambda t: t.append_column("k", pa.array([0] * t.num_rows,
                                                        pa.int64())),
                batch_format="pyarrow", batch_size=None),
            ["k"], lambda df: fold(df.drop(columns=["k"])),
            batch_format="pandas", num_partitions=1).to_pandas().iloc[0]
        n, s = int(tot["n"]), int(tot["s"])
        denom_u = n * EM_GRID - s
        params = {
            "lam": float(_round6(s / (n * EM_GRID))) if n else 0.0,
            "m": {f: float(_round6(int(tot[f"sa_{f}"]) / s)) if s else 0.0
                  for f in FS_FEATURES},
            "u": {f: float(_round6(
                (int(tot[f"na_{f}"]) * EM_GRID - int(tot[f"sa_{f}"]))
                / denom_u)) if denom_u else 0.0
                for f in FS_FEATURES},
        }
    return pd.DataFrame({
        "feature": list(FS_FEATURES),
        "m_prob": [params["m"][f] for f in FS_FEATURES],
        "u_prob": [params["u"][f] for f in FS_FEATURES],
        "lam": [params["lam"]] * len(FS_FEATURES),
    })


class _EMScores:
    """Batch fn: agreement flags + final EM params -> per-pair match
    probability (gamma on the 1e9 grid, re-expressed at 9 decimals)."""

    def __init__(self, params: dict):
        self.params = params

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        p = self.params
        w = np.full(n, p["lam"], dtype=np.float64)
        v = np.full(n, 1.0 - p["lam"], dtype=np.float64)
        for f in FS_FEATURES:
            a = np.asarray(t.column(f"a_{f}").to_pylist(), dtype=bool)
            w *= np.where(a, p["m"][f], 1.0 - p["m"][f])
            v *= np.where(a, p["u"][f], 1.0 - p["u"][f])
        gamma = np.floor(w / (w + v) * EM_GRID + 0.5) / EM_GRID
        return pa.table({
            "m1_id": t.column("m1_id"),
            "m2_id": t.column("m2_id"),
            "match_prob": pa.array(gamma, pa.float64()),
        })


def fs_em_scores(pairs_ds, surf_ref, *, iters: int = 3):
    """Per-pair match probabilities under the UNSUPERVISED EM-estimated
    Fellegi-Sunter model (fs_em): the pair-level output a Splink-style
    linker hands downstream. Two phases: fs_em's bounded parameter
    estimation (driver holds 13 ints), then ONE streamed scoring scan
    re-deriving the agreement flags and emitting gamma quantized on the
    1e9 grid. Out: (m1_id, m2_id, match_prob)."""
    est = fs_em(pairs_ds, surf_ref, iters=iters)
    params = {
        "lam": float(est["lam"].iloc[0]),
        "m": dict(zip(est["feature"], est["m_prob"])),
        "u": dict(zip(est["feature"], est["u_prob"])),
    }

    def flags_and_ids(surf_ref_inner):
        class _F(_AgreeFlags):
            def __call__(self, t: pa.Table) -> pa.Table:
                out = super().__call__(t)
                return out.add_column(0, "m1_id", t.column("m1_id")) \
                          .add_column(1, "m2_id", t.column("m2_id"))
        return _F

    flagged = pairs_ds.map_batches(
        flags_and_ids(surf_ref), fn_constructor_args=(surf_ref,),
        batch_format="pyarrow", concurrency=2, num_cpus=0.5)
    return flagged.map_batches(_EMScores, fn_constructor_args=(params,),
                               batch_format="pyarrow", concurrency=2,
                               num_cpus=0.5)


# --------------------------------------------------- mutual best match
class _JwDirected:
    """Actor-pool scorer: JW per labeled pair (rounded at 5 like
    el_pair_jw), emitted as BOTH directed rows (src->dst and dst->src)
    so one src hash exchange finds each record's best counterpart."""

    def __init__(self, surf_ref):
        import ray

        from ..sim import jaro_winkler
        from ..text import normalize_name
        self.surf = ray.get(surf_ref)
        self.norm = normalize_name
        self.jw = jaro_winkler

    def __call__(self, t: pa.Table) -> pa.Table:
        m1 = t.column("m1_id").to_pylist()
        m2 = t.column("m2_id").to_pylist()
        jw = [np.floor(self.jw(self.norm(self.surf[a]),
                               self.norm(self.surf[b])) * 1e5 + 0.5) / 1e5
              for a, b in zip(m1, m2)]
        return pa.table({
            "src": pa.array(m1 + m2, pa.string()),
            "dst": pa.array(m2 + m1, pa.string()),
            "jw": pa.array(jw + jw, pa.float64()),
        })


def mutual_best(pairs_ds, surf_ref):
    """Symmetric best match — the classic one-to-one matching step
    (each record pairs with its single best counterpart, kept only
    when the choice is MUTUAL; the greedy-free deterministic core of
    one-to-one record linkage). Shape: score once, explode to directed
    rows, ONE src hash exchange for the per-record argmax (ties break
    to the lexicographically smaller dst), then ONE unordered-pair-key
    exchange where the two directions of a mutual pair meet. Every
    exchange moves O(pairs) then O(records) rows — no driver state.
    Out: (m1_id, m2_id, jw) with m1_id < m2_id."""
    directed = pairs_ds.map_batches(
        _JwDirected, fn_constructor_args=(surf_ref,),
        batch_format="pyarrow", concurrency=2, num_cpus=0.5)

    def best(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"src": pd.Series(dtype=str),
                                 "dst": pd.Series(dtype=str),
                                 "jw": pd.Series(dtype="float64")})
        df = df.sort_values(["src", "jw", "dst"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("src", as_index=False).first()

    bests = group_blocks(directed, ["src"], best, batch_format="pandas")

    def pair_key(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"m1_id": pd.Series(dtype=str),
                                 "m2_id": pd.Series(dtype=str),
                                 "jw": pd.Series(dtype="float64")})
        s = df["src"].to_numpy(dtype=object)
        d = df["dst"].to_numpy(dtype=object)
        return pd.DataFrame({"m1_id": np.minimum(s, d),
                             "m2_id": np.maximum(s, d),
                             "jw": df["jw"].to_numpy()})

    keyed = bests.map_batches(pair_key, batch_format="pandas")

    def mutual(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"m1_id": pd.Series(dtype=str),
                                 "m2_id": pd.Series(dtype=str),
                                 "jw": pd.Series(dtype="float64")})
        g = df.groupby(["m1_id", "m2_id"], as_index=False).agg(
            n=("jw", "size"), jw=("jw", "min"))
        # exactly one best row per src exists, so a mutual pair
        # contributes exactly two rows to its unordered key
        return g.loc[g["n"] == 2, ["m1_id", "m2_id", "jw"]] \
                .reset_index(drop=True)

    return group_blocks(keyed, ["m1_id"], mutual, batch_format="pandas")


# --------------------------------------------------------- survivorship
def golden_record(mentions_ds):
    """Survivorship: one canonical ('golden') record per exact-alias
    cluster — the master-data step after matching. Canonical surface =
    the longest raw surface in the cluster (tie: smallest mention_id);
    plus member and distinct-conversation counts. Shape: a per-batch
    (norm, conv_id) combiner collapses repeat mentions BEFORE the
    exchange (the profile-combiner idiom), then ONE alias hash exchange
    finalizes — exchange volume is O(distinct (alias, conv)), not
    O(mentions). Out: (cluster_id, canonical_mention,
    canonical_surface, n_members, n_convs)."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"norm": str, "conv_id": str, "n": "int64",
                "best_mention": str, "best_surface": str,
                "min_mention": str}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=d)
                                 for c, d in cols.items()})
        out = pd.DataFrame({
            "norm": _norm_series(df["surface"].astype(str)),
            "conv_id": df["conv_id"].astype(str),
            "mention_id": df["mention_id"].astype(str),
            "surface": df["surface"].astype(str),
        })
        out = out[out["norm"] != ""]
        if len(out) == 0:
            return pd.DataFrame({c: pd.Series(dtype=d)
                                 for c, d in cols.items()})
        out["slen"] = out["surface"].str.len()
        out = out.sort_values(["norm", "conv_id", "slen", "mention_id"],
                              ascending=[True, True, False, True],
                              kind="stable")
        g = out.groupby(["norm", "conv_id"], as_index=False).agg(
            n=("mention_id", "size"),
            best_mention=("mention_id", "first"),
            best_surface=("surface", "first"),
            min_mention=("mention_id", "min"))
        g["n"] = g["n"].astype("int64")
        return g

    partials = mentions_ds.map_batches(combine, batch_format="pandas")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"cluster_id": str, "canonical_mention": str,
                "canonical_surface": str, "n_members": "int64",
                "n_convs": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=d)
                                 for c, d in cols.items()})
        df = df.assign(slen=df["best_surface"].str.len())
        df = df.sort_values(["norm", "slen", "best_mention"],
                            ascending=[True, False, True], kind="stable")
        g = df.groupby("norm", as_index=False).agg(
            n_members=("n", "sum"),
            n_convs=("conv_id", "nunique"),
            canonical_mention=("best_mention", "first"),
            canonical_surface=("best_surface", "first"),
            cluster_id=("min_mention", "min"))
        g["n_members"] = g["n_members"].astype("int64")
        g["n_convs"] = g["n_convs"].astype("int64")
        return g[["cluster_id", "canonical_mention", "canonical_surface",
                  "n_members", "n_convs"]]

    return group_blocks(partials, ["norm"], finalize,
                        batch_format="pandas")


# ----------------------------------------------------- edit distance
def _levenshtein(a: str, b: str) -> int:
    """Classic two-row DP; numpy row updates keep the inner loop
    vectorized over ``b``."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bn = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(bn) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i, ch in enumerate(a):
        cur[0] = i + 1
        cost = (bn != ord(ch)).astype(np.int64)
        np.minimum(prev[1:] + 1, prev[:-1] + cost, out=cur[1:])
        # the deletion chain cur[j] = min(cur[j], cur[j-1]+1) is an
        # inherently sequential prefix-min recurrence
        for j in range(1, len(cur)):
            if cur[j] > cur[j - 1] + 1:
                cur[j] = cur[j - 1] + 1
        prev, cur = cur, prev
    return int(prev[-1])


class _EditSims:
    """Actor-pool scorer: Levenshtein distance + normalized similarity
    (1 - lev / max(len)) on normalized surfaces per labeled pair —
    ONE vectorized DuckDB ``levenshtein()`` pass per batch (the
    el/scorer.py JW-kernel idiom; bit-equal to the _levenshtein DP,
    which stays as the property-test reference)."""

    def __init__(self, surf_ref):
        import ray

        self.surf = ray.get(surf_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..scorer import _duck

        m1 = t.column("m1_id").to_pylist()
        m2 = t.column("m2_id").to_pylist()
        if not m1:
            return pa.table({"m1_id": pa.array([], pa.string()),
                             "m2_id": pa.array([], pa.string()),
                             "lev": pa.array([], pa.int64()),
                             "lev_sim": pa.array([], pa.float64())})
        na = _norm_series(pd.Series([self.surf[a] for a in m1],
                                    dtype=str))
        nb = _norm_series(pd.Series([self.surf[b] for b in m2],
                                    dtype=str))
        con = _duck()
        view = pa.table({  # noqa: F841
            "a": pa.array(na, pa.string()),
            "b": pa.array(nb, pa.string()),
            "i": pa.array(np.arange(len(m1), dtype=np.int64))})
        con.register("edit_pairs", view)
        out = con.execute(
            "SELECT CAST(levenshtein(a, b) AS BIGINT) AS lev,"
            " CASE WHEN greatest(length(a), length(b)) = 0 THEN 1.0"
            " ELSE 1.0 - CAST(levenshtein(a, b) AS DOUBLE)"
            " / greatest(length(a), length(b)) END AS sim"
            " FROM edit_pairs ORDER BY i").arrow()
        con.unregister("edit_pairs")
        return pa.table({
            "m1_id": pa.array(m1, pa.string()),
            "m2_id": pa.array(m2, pa.string()),
            "lev": out.column("lev").combine_chunks(),
            "lev_sim": pa.array(_round6(
                out.column("sim").to_numpy(zero_copy_only=False)),
                pa.float64()),
        })


def edit_pair_sims(pairs_ds, surf_ref):
    """Levenshtein distance / normalized similarity for candidate
    pairs — the edit-distance member of the similarity menu
    (DuckDB's levenshtein() replays it exactly).
    Out: (m1_id, m2_id, lev, lev_sim)."""
    return pairs_ds.map_batches(_EditSims, fn_constructor_args=(surf_ref,),
                                batch_format="pyarrow", concurrency=2,
                                num_cpus=0.5)


# ------------------------------------------------- rare-token blocking
def rare_token_keys(mentions_ds, *, num_partitions: int | None = None):
    """Term-frequency blocking (the dedupe/Splink rare-token predicate):
    each mention's blocking key is its RAREST normalized token —
    minimum document frequency, ties to the lexicographically smaller
    token — so common tokens ('john', 'corp') never define a block and
    hot keys shrink by construction. Shape: per-batch distinct
    (mention, token) explode -> token-count combiner -> ONE token
    exchange for exact dfs -> df table broadcast zero-copy
    (vocabulary-bounded, the pmi precedent) -> one streamed argmin scan.
    Out: (mention_id, block_key='r:<token>'); empty-norm mentions carry
    no signal and are excluded."""
    import ray

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "mention_id": df["mention_id"].astype(str),
            "norm": _norm_series(df["surface"].astype(str))})
        out = out[out["norm"] != ""]
        if len(out) == 0:
            return pd.DataFrame({"mention_id": pd.Series(dtype=str),
                                 "t": pd.Series(dtype=str)})
        e = out.assign(t=out["norm"].str.split(" ")).explode("t")
        return e[["mention_id", "t"]].drop_duplicates() \
            .reset_index(drop=True)

    toks = mentions_ds.map_batches(explode, batch_format="pandas") \
        .materialize()

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"t": pd.Series(dtype=str),
                                 "n": pd.Series(dtype="int64")})
        out = df.groupby("t", as_index=False).size().rename(
            columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    def df_sum(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"t": pd.Series(dtype=str),
                                 "n": pd.Series(dtype="int64")})
        out = df.groupby("t", as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    dfs = group_blocks(
        toks.map_batches(df_partial, batch_format="pandas"),
        ["t"], df_sum, batch_format="pandas",
        num_partitions=num_partitions).materialize()
    parts = [t for t in ray.get(list(dfs.to_arrow_refs())) if t.num_rows]
    df_tbl = (pa.concat_tables(parts) if parts
              else pa.table({"t": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())}))
    df_ref = ray.put(df_tbl)

    class _ArgMin:
        def __init__(self, ref):
            t = ray.get(ref)
            self.tok = t.column("t").combine_chunks()
            self.n = t.column("n").combine_chunks()

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if t.num_rows == 0:
                return pa.table({"mention_id": pa.array([], pa.string()),
                                 "block_key": pa.array([], pa.string())})
            mid = t.column("mention_id").to_pandas() \
                .to_numpy(dtype=object)
            tk = t.column("t").combine_chunks().cast(pa.string())
            n = self.n.take(pc.index_in(tk, value_set=self.tok)) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            tka = tk.to_numpy(zero_copy_only=False)
            # vectorized per-mention argmin of (df, token): lexsort by
            # (mention, df, token) then take each mention's first row
            order = np.lexsort((tka, n, mid))
            mid_s, tk_s = mid[order], tka[order]
            first = np.ones(len(mid_s), dtype=bool)
            first[1:] = mid_s[1:] != mid_s[:-1]
            return pa.table({
                "mention_id": pa.array(mid_s[first], pa.string()),
                "block_key": pa.array(
                    ["r:" + x for x in tk_s[first]], pa.string()),
            })

    return toks.map_batches(_ArgMin, fn_constructor_args=(df_ref,),
                            batch_format="pyarrow", concurrency=2,
                            num_cpus=0.5)


def rare_token_quality(mentions_ds, *, num_partitions: int | None = None):
    """blocking_quality's report for the RARE-TOKEN scheme (the
    "rare_token" pluggable strategy, el/blocking.py): candidate = all
    within-key pairs of rare_token_keys' single key per mention. One
    key per mention means NO cross-key pair dedup, so both masses come
    straight from (key, gold) contingency counts — cand = sum_k
    C(n_k, 2), tp = sum_{k,g} C(c_{kg}, 2) — and no pair row ever
    materializes. Same one-row contract as blocking_quality /
    snb_quality.

    Shape: rare_token_keys' exchange+broadcast+argmin; ONE tagged
    mention exchange attaches gold; one key exchange folds the
    contingency; matching via one gold exchange."""
    import ray  # noqa: F401 — parity with siblings

    n_mentions = mentions_ds.count()
    keys = rare_token_keys(mentions_ds, num_partitions=num_partitions)

    def key_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "mid": t.column("mention_id").cast(pa.string()),
            "block_key": t.column("block_key").cast(pa.string()),
            "gold": pa.nulls(n, pa.string()),
            "is_key": pa.array([1] * n, pa.int64())})

    def gold_rows(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "mid": pa.array(df["mention_id"].astype(str), pa.string()),
            "block_key": pa.nulls(n, pa.string()),
            "gold": pa.array(df["gold_kb_id"].astype(str), pa.string()),
            "is_key": pa.array([0] * n, pa.int64())})

    tagged = keys.map_batches(key_rows, batch_format="pyarrow").union(
        mentions_ds.map_batches(gold_rows, batch_format="pandas"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"block_key": str, "gold": str}
        k = df[df["is_key"] == 1]
        g = df[df["is_key"] == 0]
        j = k[["mid", "block_key"]].merge(g[["mid", "gold"]], on="mid")
        if len(j) == 0:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in cols.items()})
        return j[list(cols)].reset_index(drop=True)

    kg = group_blocks(tagged, ["mid"], attach, batch_format="pandas",
                      num_partitions=num_partitions)

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"block_key": pd.Series(dtype=str),
                                 "gold": pd.Series(dtype=str),
                                 "c": pd.Series(dtype="int64")})
        out = df.groupby(["block_key", "gold"], as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    def key_fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"cand": pd.Series(dtype="int64"),
                                 "tp": pd.Series(dtype="int64")})
        cells = df.groupby(["block_key", "gold"], as_index=False)["c"] \
            .sum()
        c = cells["c"].to_numpy(np.int64)
        nk = cells.groupby("block_key")["c"].sum().to_numpy(np.int64)
        return pd.DataFrame({
            "cand": [int((nk * (nk - 1) // 2).sum())],
            "tp": [int((c * (c - 1) // 2).sum())]})

    parts = group_blocks(
        kg.map_batches(cell_partial, batch_format="pandas"),
        ["block_key"], key_fold, batch_format="pandas",
        num_partitions=num_partitions).to_pandas()
    cand = int(parts["cand"].sum())
    tp = int(parts["tp"].sum())

    def entity_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"mp": pd.Series(dtype="int64")})
        c = df.groupby("gold_kb_id", sort=False).size().to_numpy()
        return pd.DataFrame({"mp": [np.int64((c * (c - 1) // 2).sum())]})

    ent = mentions_ds.map_batches(
        lambda df: df[["mention_id", "gold_kb_id"]], batch_format="pandas")
    mp_parts = group_blocks(ent, ["gold_kb_id"], entity_pairs,
                            batch_format="pandas").to_pandas()
    matching = int(mp_parts["mp"].sum())

    total = n_mentions * (n_mentions - 1) // 2
    pc = _round6(tp / matching) if matching else 0.0
    rr = _round6(1.0 - cand / total) if total else 0.0
    pq = _round6(tp / cand) if cand else 0.0
    return pd.DataFrame({
        "n_mentions": pd.Series([n_mentions], dtype="int64"),
        "candidate_pairs": pd.Series([cand], dtype="int64"),
        "matching_pairs": pd.Series([matching], dtype="int64"),
        "tp_pairs": pd.Series([tp], dtype="int64"),
        "pairs_completeness": [float(pc)],
        "reduction_ratio": [float(rr)],
        "pairs_quality": [float(pq)],
    })


# --------------------------------------------------- TF-IDF cosine sim
def _token_dfs(mentions_ds, *, num_partitions: int | None = None):
    """Exact distinct-mention document frequencies per normalized token
    + the non-empty mention count: per-batch distinct explode -> one
    token exchange; df table returned as an Arrow table for zero-copy
    broadcast (vocabulary-bounded). -> (df_table, n_mentions)."""
    import ray

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "mention_id": df["mention_id"].astype(str),
            "norm": _norm_series(df["surface"].astype(str))})
        out = out[out["norm"] != ""]
        if len(out) == 0:
            return pd.DataFrame({"mention_id": pd.Series(dtype=str),
                                 "t": pd.Series(dtype=str)})
        e = out.assign(t=out["norm"].str.split(" ")).explode("t")
        return e[["mention_id", "t"]].drop_duplicates() \
            .reset_index(drop=True)

    toks = mentions_ds.map_batches(explode, batch_format="pandas") \
        .materialize()

    def heads(df: pd.DataFrame) -> pd.DataFrame:
        return df[["mention_id"]].drop_duplicates()

    n_mentions = group_blocks(
        toks.map_batches(heads, batch_format="pandas"),
        ["mention_id"], heads, batch_format="pandas",
        num_partitions=num_partitions).count()

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"t": pd.Series(dtype=str),
                                 "n": pd.Series(dtype="int64")})
        out = df.groupby("t", as_index=False).size().rename(
            columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    def df_sum(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"t": pd.Series(dtype=str),
                                 "n": pd.Series(dtype="int64")})
        out = df.groupby("t", as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    dfs = group_blocks(
        toks.map_batches(df_partial, batch_format="pandas"),
        ["t"], df_sum, batch_format="pandas",
        num_partitions=num_partitions).materialize()
    parts = [t for t in ray.get(list(dfs.to_arrow_refs())) if t.num_rows]
    df_tbl = (pa.concat_tables(parts) if parts
              else pa.table({"t": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())}))
    return df_tbl, int(n_mentions)


class _TfidfCos:
    """Actor-pool scorer: TF-IDF cosine per labeled pair over DISTINCT
    normalized tokens. idf is quantized to the integer 1e-6 grid
    (idf_q = floor(ln((N+1)/(df+1)) * 1e6 + 0.5)), weights are idf_q^2
    int64, so the shared mass and the two norms are exact integer sums
    — the final double sim = shared / (sqrt(n1) * sqrt(n2)) is computed
    from identical ints on engine and oracle, no float-order
    sensitivity. Out is rounded at 6."""

    def __init__(self, surf_ref, df_ref, n_mentions: int):
        import ray

        from ..text import normalize_name
        self.surf = ray.get(surf_ref)
        t = ray.get(df_ref)
        self.norm = normalize_name
        toks = t.column("t").to_pylist()
        ns = t.column("n").to_pylist()
        n1 = float(n_mentions + 1)
        self.w2 = {tok: int(np.floor(np.log(n1 / (d + 1.0)) * 1e6
                                     + 0.5)) ** 2
                   for tok, d in zip(toks, ns)}
        self._memo: dict[str, tuple[dict, int]] = {}

    def _vec(self, mid: str) -> tuple[dict, int]:
        v = self._memo.get(mid)
        if v is None:
            ts = set(self.norm(self.surf[mid]).split(" ")) - {""}
            w = {t: self.w2.get(t, 0) for t in ts}
            v = (w, sum(w.values()))
            self._memo[mid] = v
        return v

    def __call__(self, t: pa.Table) -> pa.Table:
        m1 = t.column("m1_id").to_pylist()
        m2 = t.column("m2_id").to_pylist()
        sims = []
        for a, b in zip(m1, m2):
            wa, na = self._vec(a)
            wb, nb = self._vec(b)
            shared = sum(v for k, v in wa.items() if k in wb)
            sims.append(shared / (np.sqrt(na) * np.sqrt(nb))
                        if na and nb else 0.0)
        return pa.table({
            "m1_id": pa.array(m1, pa.string()),
            "m2_id": pa.array(m2, pa.string()),
            "tfidf_cos": pa.array(_round6(sims), pa.float64()),
        })


def tfidf_pair_sims(pairs_ds, mentions_ds, surf_ref):
    """TF-IDF cosine similarity for candidate pairs (Cohen et al.'s
    classic ER string metric): corpus-exact idf from one token
    exchange, broadcast zero-copy; scoring is one streamed actor-pool
    scan. Out: (m1_id, m2_id, tfidf_cos)."""
    import ray

    df_tbl, n_mentions = _token_dfs(mentions_ds)
    df_ref = ray.put(df_tbl)
    return pairs_ds.map_batches(
        _TfidfCos, fn_constructor_args=(surf_ref, df_ref, n_mentions),
        batch_format="pyarrow", concurrency=2, num_cpus=0.5)


# --------------------------------------------------------- cluster ARI
def _pair_mass_tagged(mentions_ds, num_partitions: int | None = None):
    """Shared machinery for the pair-counting external cluster-quality
    scores (ARI, Fowlkes-Mallows): the three integer pair masses —
    sum C(count, 2) over (norm, gold) contingency cells (kind 's'),
    per-norm sizes (kind 'a'), per-gold sizes (kind 'b') — as tagged
    (pairs, n, kind) partial rows from three combiner exchanges over
    tiny count rows."""

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "norm": _norm_series(df["surface"].astype(str)),
            "gold": df["gold_kb_id"].astype(str)})
        return out[out["norm"] != ""].reset_index(drop=True)

    base = mentions_ds.map_batches(prep, batch_format="pandas") \
        .materialize()

    def count_by(cols):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({**{c: pd.Series(dtype=str)
                                        for c in cols},
                                     "c": pd.Series(dtype="int64")})
            out = df.groupby(cols, as_index=False).size().rename(
                columns={"size": "c"})
            out["c"] = out["c"].astype("int64")
            return out

        def total(df: pd.DataFrame) -> pd.DataFrame:
            """-> one (pairs, n) partial row per co-located block."""
            if len(df) == 0:
                return pd.DataFrame({"pairs": pd.Series(dtype="int64"),
                                     "n": pd.Series(dtype="int64")})
            s = df.groupby(cols)["c"].sum()
            c = s.to_numpy(np.int64)
            return pd.DataFrame({
                "pairs": [int((c * (c - 1) // 2).sum())],
                "n": [int(c.sum())]})

        return group_blocks(
            base.map_batches(partial, batch_format="pandas"),
            cols, total, batch_format="pandas",
            num_partitions=num_partitions)

    def tag(kind: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["kind"] = kind
            return df
        return f

    return (count_by(["norm", "gold"])
            .map_batches(tag("s"), batch_format="pandas")
            .union(count_by(["norm"])
                   .map_batches(tag("a"), batch_format="pandas"))
            .union(count_by(["gold"])
                   .map_batches(tag("b"), batch_format="pandas")))


def cluster_ari(mentions_ds, *, num_partitions: int | None = None):
    """Adjusted Rand Index of the exact-alias clustering (cluster =
    normalized surface) against the gold entity labels — the standard
    chance-corrected external cluster-quality score next to B3/pairwise
    F1. All three pair masses are INTEGER combinatorics (sum of
    C(count, 2)) computed from three combiner exchanges over tiny
    count rows — (norm, gold) contingency cells, per-norm sizes,
    per-gold sizes — then one single-row merge; the only floats are the
    final chance-correction divisions, written identically on both
    sides (float(a*b)/float(C(n,2)), a*b stays under 2^53 at any
    workable fixture scale — documented envelope). Out: one row
    (n_mentions, pairs_both, pairs_pred, pairs_gold, ari[6dp]);
    degenerate denominators (all-singleton vs all-one) report 1.0."""

    tagged = _pair_mass_tagged(mentions_ds, num_partitions)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_mentions": "int64", "pairs_both": "int64",
                "pairs_pred": "int64", "pairs_gold": "int64",
                "ari": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=d)
                                 for k, d in cols.items()})
        g = df.groupby("kind")[["pairs", "n"]].sum()
        s = int(g.loc["s", "pairs"]) if "s" in g.index else 0
        a = int(g.loc["a", "pairs"]) if "a" in g.index else 0
        b = int(g.loc["b", "pairs"]) if "b" in g.index else 0
        n = int(g.loc["a", "n"]) if "a" in g.index else 0
        n2 = n * (n - 1) // 2
        if n2 == 0:
            ari = 1.0
        else:
            exp = float(a * b) / float(n2)
            den = 0.5 * float(a + b) - exp
            ari = 1.0 if den == 0.0 else (float(s) - exp) / den
        return pd.DataFrame({
            "n_mentions": pd.array([n], dtype="int64"),
            "pairs_both": pd.array([s], dtype="int64"),
            "pairs_pred": pd.array([a], dtype="int64"),
            "pairs_gold": pd.array([b], dtype="int64"),
            "ari": [float(np.floor(ari * 1e6 + 0.5) / 1e6)]})

    return tagged.repartition(1).map_batches(final, batch_format="pandas",
                                             batch_size=None)


def cluster_fm(mentions_ds, *, num_partitions: int | None = None):
    """Fowlkes-Mallows index of the exact-alias clustering (cluster =
    normalized surface) against gold entity labels — the geometric
    mean of pairwise precision and recall, completing the external
    cluster-quality family next to ARI / V-measure / B3. Same three
    integer pair masses as cluster_ari (_pair_mass_tagged); the only
    floats are the final divisions and one IEEE-exact sqrt, written
    identically on both sides. Out: one row (n_mentions, tp_pairs,
    pred_pairs, gold_pairs, pair_precision, pair_recall, fm[6dp]);
    degenerate all-singleton masses report 1.0 (no pairs to get
    wrong)."""
    tagged = _pair_mass_tagged(mentions_ds, num_partitions)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_mentions": "int64", "tp_pairs": "int64",
                "pred_pairs": "int64", "gold_pairs": "int64",
                "pair_precision": "float64", "pair_recall": "float64",
                "fm": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=d)
                                 for k, d in cols.items()})
        g = df.groupby("kind")[["pairs", "n"]].sum()
        s = int(g.loc["s", "pairs"]) if "s" in g.index else 0
        a = int(g.loc["a", "pairs"]) if "a" in g.index else 0
        b = int(g.loc["b", "pairs"]) if "b" in g.index else 0
        n = int(g.loc["a", "n"]) if "a" in g.index else 0
        prec = 1.0 if a == 0 else float(s) / float(a)
        rec = 1.0 if b == 0 else float(s) / float(b)
        fm = 1.0 if a == 0 or b == 0 \
            else float(s) / np.sqrt(float(a) * float(b))
        r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
        return pd.DataFrame({
            "n_mentions": pd.array([n], dtype="int64"),
            "tp_pairs": pd.array([s], dtype="int64"),
            "pred_pairs": pd.array([a], dtype="int64"),
            "gold_pairs": pd.array([b], dtype="int64"),
            "pair_precision": [r6(prec)],
            "pair_recall": [r6(rec)],
            "fm": [r6(fm)]})

    return tagged.repartition(1).map_batches(final, batch_format="pandas",
                                             batch_size=None)


# --------------------------------------------------------- Soft-TF-IDF
SOFT_TFIDF_THETA = 0.9


class _SoftTfidf:
    """Actor-pool scorer: Soft-TF-IDF (Cohen-Ravikumar-Fienberg) per
    labeled pair over DISTINCT sorted normalized tokens. For each token
    a of side 1 whose best Jaro-Winkler partner in side 2 clears theta
    (jw rounded at 5; argmax ties to the smaller token), add
    (w(a)/||w1||) * (w(b*)/||w2||) * jw(a, b*). Weights are the same
    integer-grid idf as _TfidfCos (norms are exact integer sums of
    idf_q^2), the per-token terms are written in a fixed operation
    order and summed over SORTED side-1 tokens, so the SQL list
    comprehension replays the identical doubles. Out rounded at 6."""

    def __init__(self, surf_ref, df_ref, n_mentions: int):
        import ray

        from ..sim import jaro_winkler
        from ..text import normalize_name
        self.surf = ray.get(surf_ref)
        t = ray.get(df_ref)
        self.norm = normalize_name
        self.jw = jaro_winkler
        n1 = float(n_mentions + 1)
        self.w = {tok: int(np.floor(np.log(n1 / (d + 1.0)) * 1e6 + 0.5))
                  for tok, d in zip(t.column("t").to_pylist(),
                                    t.column("n").to_pylist())}
        self._memo: dict[str, tuple[list, float]] = {}

    def _vec(self, mid: str) -> tuple[list, float]:
        v = self._memo.get(mid)
        if v is None:
            ts = sorted(set(self.norm(self.surf[mid]).split(" ")) - {""})
            ws = [self.w.get(t, 0) for t in ts]
            n2 = sum(x * x for x in ws)
            v = (list(zip(ts, ws)), np.sqrt(float(n2)))
            self._memo[mid] = v
        return v

    def _score(self, v1, rn1, v2, rn2) -> float:
        if not v1 or not v2 or rn1 == 0.0 or rn2 == 0.0:
            return 0.0
        total = 0.0
        for ta, wa in v1:
            bw, ws = -1.0, 0
            for tb, wb in v2:  # v2 sorted: first argmax = smaller token
                j = np.floor(self.jw(ta, tb) * 1e5 + 0.5) / 1e5
                if j > bw:
                    bw, ws = j, wb
            if bw >= SOFT_TFIDF_THETA:
                total += (wa / rn1) * (ws / rn2) * bw
        return total

    def __call__(self, t: pa.Table) -> pa.Table:
        m1 = t.column("m1_id").to_pylist()
        m2 = t.column("m2_id").to_pylist()
        sims = []
        for a, b in zip(m1, m2):
            v1, rn1 = self._vec(a)
            v2, rn2 = self._vec(b)
            sims.append(self._score(v1, rn1, v2, rn2))
        return pa.table({
            "m1_id": pa.array(m1, pa.string()),
            "m2_id": pa.array(m2, pa.string()),
            "soft_tfidf": pa.array(_round6(sims), pa.float64()),
        })


def soft_tfidf_pair_sims(pairs_ds, mentions_ds, surf_ref):
    """Soft-TF-IDF similarity for candidate pairs — the classic hybrid
    token/character metric: TF-IDF mass transported along best
    Jaro-Winkler >= 0.9 token alignments. Same corpus-exact broadcast
    idf as tfidf_pair_sims; one streamed actor-pool scoring scan.
    Out: (m1_id, m2_id, soft_tfidf)."""
    import ray

    df_tbl, n_mentions = _token_dfs(mentions_ds)
    df_ref = ray.put(df_tbl)
    return pairs_ds.map_batches(
        _SoftTfidf, fn_constructor_args=(surf_ref, df_ref, n_mentions),
        batch_format="pyarrow", concurrency=2, num_cpus=0.5)


# --------------------------------------------------- V-measure metrics
def cluster_vmeasure(mentions_ds, *, num_partitions: int | None = None):
    """Homogeneity / completeness / V-measure of the exact-alias
    clustering vs gold labels (Rosenberg-Hirschberg 2007) — the
    entropy-based companion to :func:`cluster_ari`. Each entropy term
    n * ln(n / N) is quantized PER CELL to the integer 1e-9 grid
    (q = floor(n * ln(n/N) * 1e9 + 0.5)), so the cross-cell sums are
    exact int64 and carry no float-sum order sensitivity; the only
    remaining engine/oracle float contract is ln() itself on identical
    double ratios (the pmi precedent). Three combiner exchanges emit
    one quantized partial row per co-located block; a one-row merge
    derives the metrics. Out: (n_mentions, homogeneity, completeness,
    v_measure), 6dp."""

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "norm": _norm_series(df["surface"].astype(str)),
            "gold": df["gold_kb_id"].astype(str)})
        return out[out["norm"] != ""].reset_index(drop=True)

    base = mentions_ds.map_batches(prep, batch_format="pandas") \
        .materialize()
    n_total = base.count()

    def q_terms(counts: np.ndarray, denoms: np.ndarray) -> int:
        t = counts.astype(np.float64) * np.log(
            counts.astype(np.float64) / denoms.astype(np.float64))
        return int(np.floor(t * 1e9 + 0.5).astype(np.int64).sum())

    def count_partial(cols):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({**{c: pd.Series(dtype=str)
                                        for c in cols},
                                     "c": pd.Series(dtype="int64")})
            out = df.groupby(cols, as_index=False).size().rename(
                columns={"size": "c"})
            out["c"] = out["c"].astype("int64")
            return out
        return partial

    # marginal entropies: H(C) over norms, H(K) over golds — each one
    # exchange; cells quantized against N
    def marg_q(col):
        def total(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"q": pd.Series(dtype="int64")})
            s = df.groupby(col)["c"].sum().to_numpy(np.int64)
            return pd.DataFrame({"q": [q_terms(
                s, np.full(len(s), n_total, dtype=np.int64))]})
        return total

    from ..shuffle import group_blocks

    hc = group_blocks(base.map_batches(count_partial(["norm"]),
                                       batch_format="pandas"),
                      ["norm"], marg_q("norm"), batch_format="pandas",
                      num_partitions=num_partitions)
    hk = group_blocks(base.map_batches(count_partial(["gold"]),
                                       batch_format="pandas"),
                      ["gold"], marg_q("gold"), batch_format="pandas",
                      num_partitions=num_partitions)

    # conditional entropies need the joint cells with BOTH marginals:
    # co-locate the contingency on norm for H(C|K)-side terms? No —
    # n_ij ln(n_ij / n_.j) needs gold marginals per cell and
    # n_ij ln(n_ij / n_i.) needs norm marginals; do two exchanges,
    # each keyed by the marginal's key so the denominator is exact
    # in-block
    def cond_q(key):
        def total(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"q": pd.Series(dtype="int64")})
            g = df.groupby(["norm", "gold"], as_index=False)["c"].sum()
            marg = g.groupby(key)["c"].transform("sum") \
                .to_numpy(np.int64)
            return pd.DataFrame({"q": [q_terms(
                g["c"].to_numpy(np.int64), marg)]})
        return total

    joint = base.map_batches(count_partial(["norm", "gold"]),
                             batch_format="pandas")
    hck = group_blocks(joint, ["gold"], cond_q("gold"),
                       batch_format="pandas",
                       num_partitions=num_partitions)
    hkc = group_blocks(joint, ["norm"], cond_q("norm"),
                       batch_format="pandas",
                       num_partitions=num_partitions)

    def tag(kind):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["kind"] = kind
            return df
        return f

    tagged = (hc.map_batches(tag("hc"), batch_format="pandas")
              .union(hk.map_batches(tag("hk"), batch_format="pandas"))
              .union(hck.map_batches(tag("hck"), batch_format="pandas"))
              .union(hkc.map_batches(tag("hkc"), batch_format="pandas")))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_mentions": "int64", "homogeneity": "float64",
                "completeness": "float64", "v_measure": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("kind")["q"].sum()
        qs = {k: int(g.get(k, 0)) for k in ("hc", "hk", "hck", "hkc")}
        n = float(n_total)
        # entropies (nats): H = -(sum q)/1e9/N
        h_c = -(qs["hc"] / 1e9) / n
        h_k = -(qs["hk"] / 1e9) / n
        h_ck = -(qs["hck"] / 1e9) / n
        h_kc = -(qs["hkc"] / 1e9) / n
        # Rosenberg-Hirschberg (sklearn convention): classes = gold,
        # clusters = norm. homogeneity = 1 - H(gold|norm)/H(gold);
        # completeness = 1 - H(norm|gold)/H(norm).
        hom = 1.0 if h_k == 0.0 else 1.0 - h_kc / h_k
        com = 1.0 if h_c == 0.0 else 1.0 - h_ck / h_c
        v = 0.0 if hom + com == 0.0 else 2.0 * hom * com / (hom + com)
        r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
        return pd.DataFrame({
            "n_mentions": pd.array([n_total], dtype="int64"),
            "homogeneity": [r6(hom)],
            "completeness": [r6(com)],
            "v_measure": [r6(v)]})

    return tagged.repartition(1).map_batches(final, batch_format="pandas",
                                             batch_size=None)


_TRIGRAM_SIM_SQL = """
    WITH g AS (
        SELECT i,
               CASE WHEN length(a) < 3 THEN [a]
                    ELSE [substr(a, j, 3)
                          FOR j IN generate_series(1, length(a) - 2)]
               END AS ga,
               CASE WHEN length(b) < 3 THEN [b]
                    ELSE [substr(b, j, 3)
                          FOR j IN generate_series(1, length(b) - 2)]
               END AS gb
        FROM {src}
    ),
    ca AS (SELECT i, gr, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT i, unnest(ga) AS gr FROM g) GROUP BY i, gr),
    cb AS (SELECT i, gr, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT i, unnest(gb) AS gr FROM g) GROUP BY i, gr),
    dots AS (SELECT ca.i, CAST(sum(ca.c * cb.c) AS BIGINT) AS dot
             FROM ca JOIN cb ON ca.i = cb.i AND ca.gr = cb.gr
             GROUP BY ca.i),
    na AS (SELECT i, CAST(sum(c * c) AS BIGINT) AS n
           FROM ca GROUP BY i),
    nb AS (SELECT i, CAST(sum(c * c) AS BIGINT) AS n
           FROM cb GROUP BY i)
    SELECT g.i, CAST(COALESCE(dots.dot, 0) AS BIGINT) AS dot,
           na.n AS na, nb.n AS nb,
           CASE WHEN COALESCE(dots.dot, 0) = 0 THEN 0.0
                ELSE CAST(dots.dot AS DOUBLE)
                     / (sqrt(CAST(na.n AS DOUBLE))
                        * sqrt(CAST(nb.n AS DOUBLE))) END AS sim
    FROM g
    JOIN na ON na.i = g.i
    JOIN nb ON nb.i = g.i
    LEFT JOIN dots ON dots.i = g.i
"""


class _TrigramSims:
    """Actor-pool scorer: character-trigram count-vector cosine per
    labeled pair — one DuckDB pass per batch over the SHARED
    _TRIGRAM_SIM_SQL text, so the oracle replays the identical plan
    (the _EditSims idiom). Strings shorter than 3 chars contribute the
    whole string as their single gram."""

    def __init__(self, surf_ref):
        import ray

        self.surf = ray.get(surf_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..scorer import _duck

        m1 = t.column("m1_id").to_pylist()
        m2 = t.column("m2_id").to_pylist()
        if not m1:
            return pa.table({"m1_id": pa.array([], pa.string()),
                             "m2_id": pa.array([], pa.string()),
                             "dot": pa.array([], pa.int64()),
                             "trigram_cosine": pa.array([], pa.float64())})
        na = _norm_series(pd.Series([self.surf[a] for a in m1],
                                    dtype=str))
        nb = _norm_series(pd.Series([self.surf[b] for b in m2],
                                    dtype=str))
        con = _duck()
        view = pa.table({  # noqa: F841
            "a": pa.array(na, pa.string()),
            "b": pa.array(nb, pa.string()),
            "i": pa.array(np.arange(len(m1), dtype=np.int64))})
        con.register("tri_pairs", view)
        out = con.execute(
            _TRIGRAM_SIM_SQL.format(src="tri_pairs")
            + " ORDER BY g.i").arrow()
        con.unregister("tri_pairs")
        return pa.table({
            "m1_id": pa.array(m1, pa.string()),
            "m2_id": pa.array(m2, pa.string()),
            "dot": out.column("dot").combine_chunks(),
            "trigram_cosine": pa.array(_round6(
                out.column("sim").to_numpy(zero_copy_only=False)),
                pa.float64())})


def trigram_pair_sims(pairs_ds, surf_ref):
    """Character-trigram cosine for candidate pairs — the char-n-gram
    member of the similarity menu next to JW / token-set / TF-IDF /
    soft-TF-IDF / edit distance. Out: (m1_id, m2_id, dot,
    trigram_cosine)."""
    return pairs_ds.map_batches(_TrigramSims,
                                fn_constructor_args=(surf_ref,),
                                batch_format="pyarrow", concurrency=2,
                                num_cpus=0.5)


def cluster_purity(mentions_ds, *, num_partitions: int | None = None):
    """Purity / inverse purity / purity-F1 of the exact-alias
    clustering vs gold labels — the set-matching companion to
    :func:`cluster_vmeasure` (Amigó et al. 2009's purity pair; the
    reference's benchmark groupings, ExpBenchmark.scala). Fully
    INTEGER-exact: purity's numerator is the sum over clusters of the
    cluster's majority-gold cell count, inverse purity's the sum over
    gold classes of the class's majority-cluster cell count — both
    int64 sums of contingency cells, no float until the final
    division. Shape: one per-batch (norm, gold) combiner, then TWO
    cell-scale exchanges (keyed norm, keyed gold) each emitting one
    integer partial per block, and a one-row merge. Out:
    (n_mentions, purity_correct, purity[6dp], inverse_correct,
    inverse_purity[6dp], purity_f1[6dp])."""
    from ..shuffle import group_blocks

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "norm": _norm_series(df["surface"].astype(str)),
            "gold": df["gold_kb_id"].astype(str)})
        return out[out["norm"] != ""].reset_index(drop=True)

    base = mentions_ds.map_batches(prep, batch_format="pandas") \
        .materialize()
    n_total = base.count()

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"norm": pd.Series(dtype=str),
                                 "gold": pd.Series(dtype=str),
                                 "c": pd.Series(dtype="int64")})
        out = df.groupby(["norm", "gold"], as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    joint = base.map_batches(cell_partial, batch_format="pandas")

    def majority_q(key):
        def total(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"q": pd.Series(dtype="int64")})
            g = df.groupby(["norm", "gold"], as_index=False)["c"].sum()
            return pd.DataFrame({"q": pd.array(
                [int(g.groupby(key)["c"].max().sum())], dtype="int64")})
        return total

    pur = group_blocks(joint, ["norm"], majority_q("norm"),
                       batch_format="pandas",
                       num_partitions=num_partitions)
    inv = group_blocks(joint, ["gold"], majority_q("gold"),
                       batch_format="pandas",
                       num_partitions=num_partitions)

    def tag(kind):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["kind"] = kind
            return df
        return f

    tagged = pur.map_batches(tag("p"), batch_format="pandas").union(
        inv.map_batches(tag("i"), batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_mentions": "int64", "purity_correct": "int64",
                "purity": "float64", "inverse_correct": "int64",
                "inverse_purity": "float64", "purity_f1": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("kind")["q"].sum()
        pc, ic = int(g.get("p", 0)), int(g.get("i", 0))
        n = float(n_total)
        p = pc / n if n else 0.0
        i = ic / n if n else 0.0
        f1 = 0.0 if p + i == 0.0 else 2.0 * p * i / (p + i)
        r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
        return pd.DataFrame({
            "n_mentions": pd.array([int(n_total)], dtype="int64"),
            "purity_correct": pd.array([pc], dtype="int64"),
            "purity": [r6(p)],
            "inverse_correct": pd.array([ic], dtype="int64"),
            "inverse_purity": [r6(i)],
            "purity_f1": [r6(f1)]})

    return tagged.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


_MONGE_ELKAN_SQL = """
    WITH s AS (
        SELECT i, str_split(a, ' ') AS ta, str_split(b, ' ') AS tb
        FROM {src}
    ),
    ea AS (SELECT i, unnest(ta) AS t,
                  generate_subscripts(ta, 1) AS j FROM s),
    eb AS (SELECT i, unnest(tb) AS t,
                  generate_subscripts(tb, 1) AS j FROM s),
    ma AS (
        SELECT ea.i, ea.j,
               max(jaro_winkler_similarity(ea.t, eb.t)) AS m
        FROM ea JOIN eb ON ea.i = eb.i
        GROUP BY ea.i, ea.j
    ),
    mb AS (
        SELECT eb.i, eb.j,
               max(jaro_winkler_similarity(eb.t, ea.t)) AS m
        FROM eb JOIN ea ON ea.i = eb.i
        GROUP BY eb.i, eb.j
    ),
    da AS (SELECT i, avg(m) AS me FROM ma GROUP BY i),
    db AS (SELECT i, avg(m) AS me FROM mb GROUP BY i)
    SELECT da.i, da.me AS me_ab, db.me AS me_ba,
           (da.me + db.me) / 2.0 AS me_sym
    FROM da JOIN db ON da.i = db.i
"""


class _MongeElkanSims:
    """Actor-pool scorer: token-level Monge-Elkan similarity (mean of
    per-token best Jaro-Winkler matches, Monge-Elkan 1996) per labeled
    pair — one DuckDB pass per batch over the SHARED _MONGE_ELKAN_SQL
    text, so the oracle replays the identical plan (the _TrigramSims
    idiom). Directional a->b and b->a plus the symmetric mean; token
    multiplicity preserved via subscript indexing."""

    def __init__(self, surf_ref):
        import ray

        self.surf = ray.get(surf_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..scorer import _duck

        m1 = t.column("m1_id").to_pylist()
        m2 = t.column("m2_id").to_pylist()
        if not m1:
            return pa.table({"m1_id": pa.array([], pa.string()),
                             "m2_id": pa.array([], pa.string()),
                             "me_ab": pa.array([], pa.float64()),
                             "me_ba": pa.array([], pa.float64()),
                             "me_sym": pa.array([], pa.float64())})
        na = _norm_series(pd.Series([self.surf[a] for a in m1],
                                    dtype=str))
        nb = _norm_series(pd.Series([self.surf[b] for b in m2],
                                    dtype=str))
        con = _duck()
        view = pa.table({  # noqa: F841
            "a": pa.array(na, pa.string()),
            "b": pa.array(nb, pa.string()),
            "i": pa.array(np.arange(len(m1), dtype=np.int64))})
        con.register("me_pairs", view)
        out = con.execute(
            _MONGE_ELKAN_SQL.format(src="me_pairs")
            + " ORDER BY da.i").arrow()
        con.unregister("me_pairs")
        return pa.table({
            "m1_id": pa.array(m1, pa.string()),
            "m2_id": pa.array(m2, pa.string()),
            "me_ab": pa.array(_round6(
                out.column("me_ab").to_numpy(zero_copy_only=False)),
                pa.float64()),
            "me_ba": pa.array(_round6(
                out.column("me_ba").to_numpy(zero_copy_only=False)),
                pa.float64()),
            "me_sym": pa.array(_round6(
                out.column("me_sym").to_numpy(zero_copy_only=False)),
                pa.float64())})


def monge_elkan_pair_sims(pairs_ds, surf_ref):
    """Token-level Monge-Elkan similarity for candidate pairs — the
    hybrid token/character member of the similarity menu next to
    JW / trigram / TF-IDF / soft-TF-IDF / edit distance (the
    reference's MentionPairClassifier feature family,
    MentionPairFeatures.scala). Out: (m1_id, m2_id, me_ab, me_ba,
    me_sym)."""
    return pairs_ds.map_batches(_MongeElkanSims,
                                fn_constructor_args=(surf_ref,),
                                batch_format="pyarrow", concurrency=2,
                                num_cpus=0.5)


class _DamerauSims:
    """Actor-pool scorer: Damerau-Levenshtein distance (adjacent
    transpositions count 1) + normalized similarity on normalized
    surfaces per labeled pair — ONE vectorized DuckDB
    ``damerau_levenshtein()`` pass per batch (the _EditSims idiom).
    The transposition-tolerant member of the edit-distance family:
    'teh' -> 'the' is distance 1 here, 2 under plain Levenshtein —
    the right metric for typo-heavy mention surfaces."""

    def __init__(self, surf_ref):
        import ray

        self.surf = ray.get(surf_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..scorer import _duck

        m1 = t.column("m1_id").to_pylist()
        m2 = t.column("m2_id").to_pylist()
        if not m1:
            return pa.table({"m1_id": pa.array([], pa.string()),
                             "m2_id": pa.array([], pa.string()),
                             "dl": pa.array([], pa.int64()),
                             "dl_sim": pa.array([], pa.float64())})
        na = _norm_series(pd.Series([self.surf[a] for a in m1],
                                    dtype=str))
        nb = _norm_series(pd.Series([self.surf[b] for b in m2],
                                    dtype=str))
        con = _duck()
        view = pa.table({  # noqa: F841
            "a": pa.array(na, pa.string()),
            "b": pa.array(nb, pa.string()),
            "i": pa.array(np.arange(len(m1), dtype=np.int64))})
        con.register("dl_pairs", view)
        out = con.execute(
            "SELECT CAST(damerau_levenshtein(a, b) AS BIGINT) AS dl,"
            " CASE WHEN greatest(length(a), length(b)) = 0 THEN 1.0"
            " ELSE 1.0 - CAST(damerau_levenshtein(a, b) AS DOUBLE)"
            " / greatest(length(a), length(b)) END AS sim"
            " FROM dl_pairs ORDER BY i").arrow()
        con.unregister("dl_pairs")
        return pa.table({
            "m1_id": pa.array(m1, pa.string()),
            "m2_id": pa.array(m2, pa.string()),
            "dl": out.column("dl").combine_chunks(),
            "dl_sim": pa.array(_round6(
                out.column("sim").to_numpy(zero_copy_only=False)),
                pa.float64()),
        })


def damerau_pair_sims(pairs_ds, surf_ref):
    """Damerau-Levenshtein distance / normalized similarity for
    candidate pairs. Out: (m1_id, m2_id, dl, dl_sim)."""
    return pairs_ds.map_batches(_DamerauSims,
                                fn_constructor_args=(surf_ref,),
                                batch_format="pyarrow", concurrency=2,
                                num_cpus=0.5)


# --------------------------------------------------- acronym matching
_ACR_PARTIAL = {"key": str, "side": str, "norm": str, "c": "int64"}


def _acronym_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch tagged-union partial: multi-token normalized surfaces
    emit (key=first-letter acronym, side='exp', norm, mention count);
    single-token norms of length >= 2 emit (key=norm, side='acr').
    Both streams are vocabulary-bounded after the groupby."""
    empty = pd.DataFrame({k: pd.Series(dtype=v)
                          for k, v in _ACR_PARTIAL.items()})
    if len(df) == 0:
        return empty
    norm = _norm_series(df["surface"].astype(str))
    norm = norm[norm != ""]
    if len(norm) == 0:
        return empty
    toks = norm.str.split(" ")
    ntok = toks.str.len()
    out = []
    multi = norm[ntok >= 2]
    if len(multi):
        acr = toks[ntok >= 2].map(lambda ts: "".join(t[0] for t in ts))
        e = pd.DataFrame({"key": acr.to_numpy(), "norm": multi.to_numpy()}) \
            .groupby(["key", "norm"], as_index=False).size() \
            .rename(columns={"size": "c"})
        e["side"] = "exp"
        out.append(e)
    single = norm[(ntok == 1) & (norm.str.len() >= 2)]
    if len(single):
        a = pd.DataFrame({"key": single.to_numpy()}) \
            .groupby("key", as_index=False).size() \
            .rename(columns={"size": "c"})
        a["norm"] = a["key"]
        a["side"] = "acr"
        out.append(a)
    if not out:
        return empty
    res = pd.concat(out, ignore_index=True)
    res["c"] = res["c"].astype("int64")
    return res[list(_ACR_PARTIAL)]


def acronym_candidates(mentions_ds):
    """Acronym <-> expansion candidate generation (the pair-level
    analog of the reference's abbreviation generator,
    StringUtils.scala extractAbbreviation idiom): a single-token
    surface matches a multi-token surface whose token-initial string
    equals it ('abc' <-> 'acme banking corp'). Out one row per
    distinct (acronym, expansion) with mention counts on both sides.

    Scale shape: per-batch tagged-union partials (both streams
    vocabulary-bounded after the in-batch groupby) -> ONE key
    exchange -> block-local merge + side join. No pair blowup: the
    output is distinct surface pairs, not mention pairs."""
    parts = mentions_ds.select_columns(["surface"]) \
        .map_batches(_acronym_partial, batch_format="pandas")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"acronym": str, "expansion": str,
                "n_acr_mentions": "int64", "n_exp_mentions": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby(["key", "side", "norm"], as_index=False)["c"] \
            .sum()
        acr = g[g["side"] == "acr"][["key", "c"]] \
            .rename(columns={"c": "n_acr_mentions"})
        exp = g[g["side"] == "exp"][["key", "norm", "c"]] \
            .rename(columns={"norm": "expansion",
                             "c": "n_exp_mentions"})
        m = acr.merge(exp, on="key").rename(columns={"key": "acronym"})
        m["n_acr_mentions"] = m["n_acr_mentions"].astype("int64")
        m["n_exp_mentions"] = m["n_exp_mentions"].astype("int64")
        return m[list(cols)]

    return group_blocks(parts, ["key"], finalize, batch_format="pandas")


# ----------------------------------------------------- rule coverage
_RC_RULES = ("n", "p", "ph", "r")


def _rc_np_ph_keys(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch key rows for the stateless rules: n (norm-exact),
    p (first-token prefix-6), ph (Soundex of the last token; the
    el_block_keys_phonetic key format). Each rule emits at most one
    key per mention, so per-rule pair sets are duplicate-free by
    construction."""
    from ..sim import soundex

    cols = {"mention_id": str, "gold": str, "bk": str}
    if len(df) == 0:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in cols.items()})
    norm = _norm_series(df["surface"].astype(str))
    mid = df["mention_id"].astype(str)
    gold = df["gold_kb_id"].astype(str)
    keep = norm != ""
    out = []
    n = pd.DataFrame({"mention_id": mid[keep], "gold": gold[keep],
                      "bk": "n:" + norm[keep]})
    out.append(n)
    first = norm[keep].str.split(" ").str[0]
    pm = first.str.len() >= 3
    if pm.any():
        out.append(pd.DataFrame({
            "mention_id": mid[keep][pm], "gold": gold[keep][pm],
            "bk": "p:" + first[pm].str.slice(0, 6)}))
    last = norm[keep].str.split(" ").str[-1]
    ph = last.map(lambda t: f"ph:{soundex(t)}:{t[0]}")
    out.append(pd.DataFrame({"mention_id": mid[keep],
                             "gold": gold[keep], "bk": ph}))
    res = pd.concat(out, ignore_index=True)
    return res[list(cols)]


def rule_coverage(mentions_ds):
    """Blocking-RULE provenance report (the Papadakis/JedAI
    block-scheme comparison surface): for each key strategy — n
    (norm-exact), p (prefix-6), ph (Soundex), r (rare-token) — how
    many candidate pairs it generates, how many of those NO other
    rule generates (the rule's marginal contribution), and how many
    are gold matches; plus an 'all' union row. The decision input for
    dropping a rule from the production candidate finder
    (RunKBPEntityLinkerSystem.scala:45-49's composition).

    Scale shape: stateless key rules are one vectorized pass; the
    rare-token rule reuses rare_token_keys' bounded df exchange and
    attaches gold through one mention_id exchange; then ONE bk
    exchange generates per-rule pairs (<=1 key per mention per rule —
    no within-rule dups) and ONE (m1, m2) exchange computes per-pair
    rule sets; per-block partials are rule-bounded (<= 10 rows) and a
    single-row-group final merge finishes. Loud cap on degenerate
    blocks (_block_pairs_frame convention). Out: (rule, n_pairs,
    n_marginal, tp_pairs)."""
    ds = mentions_ds.select_columns(["mention_id", "surface",
                                     "gold_kb_id"])
    npph = ds.map_batches(_rc_np_ph_keys, batch_format="pandas")

    # rare-token keys (global-df argmin) + gold attach via one
    # mention_id exchange
    rare = rare_token_keys(ds)

    def rare_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "mention_id": df["mention_id"].astype(str),
            "gold": pd.Series([""] * len(df), dtype=str),
            "bk": df["block_key"].astype(str), "tag": 0})

    def gold_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "mention_id": df["mention_id"].astype(str),
            "gold": df["gold_kb_id"].astype(str),
            "bk": pd.Series([""] * len(df), dtype=str), "tag": 1})

    tagged = rare.map_batches(rare_side, batch_format="pandas").union(
        ds.map_batches(gold_side, batch_format="pandas"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"mention_id": str, "gold": str, "bk": str}
        r = df[df["tag"] == 0]
        g = df[df["tag"] == 1]
        j = r[["mention_id", "bk"]].merge(
            g[["mention_id", "gold"]], on="mention_id")
        if len(j) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return j[list(cols)]

    rare_g = group_blocks(tagged, ["mention_id"], attach,
                          batch_format="pandas")

    keys_all = npph.union(rare_g)

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"m1_id": str, "m2_id": str, "rule": str,
                "match": "int64"}
        rows = {k: [] for k in cols}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        for bk, g in df.groupby("bk", sort=False):
            g = g.drop_duplicates("mention_id").sort_values("mention_id")
            n = len(g)
            if n < 2:
                continue
            if n > 10_000:
                raise ValueError(
                    f"rule_coverage block {bk!r} holds {n} mentions "
                    "(> 10000); route through the salted generator")
            i, j = np.triu_indices(n, k=1)
            ids = g["mention_id"].to_numpy(dtype=object)
            gl = g["gold"].to_numpy(dtype=object)
            rows["m1_id"].append(ids[i])
            rows["m2_id"].append(ids[j])
            rows["rule"].append(np.full(len(i), bk.split(":", 1)[0],
                                        dtype=object))
            rows["match"].append((gl[i] == gl[j]).astype("int64"))
        if not rows["m1_id"]:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return pd.DataFrame({k: np.concatenate(v)
                             for k, v in rows.items()})

    pairs = group_blocks(keys_all, ["bk"], pairs_block,
                         batch_format="pandas")

    p_cols = {"rule": str, "n_pairs": "int64", "n_marginal": "int64",
              "tp_pairs": "int64"}

    def per_pair(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in p_cols.items()})
        nr = df.groupby(["m1_id", "m2_id"])["rule"].transform("nunique")
        df = df.assign(nr=nr, marg=(nr == 1).astype("int64"))
        per_rule = df.groupby("rule", as_index=False).agg(
            n_pairs=("rule", "size"), n_marginal=("marg", "sum"),
            tp_pairs=("match", "sum"))
        u = df.drop_duplicates(["m1_id", "m2_id"])
        union_row = pd.DataFrame({
            "rule": ["all"], "n_pairs": [len(u)],
            "n_marginal": [int((u["nr"] == 1).sum())],
            "tp_pairs": [int(u["match"].sum())]})
        out = pd.concat([per_rule, union_row], ignore_index=True)
        return out.astype(p_cols)[list(p_cols)]

    partials = group_blocks(pairs, ["m1_id", "m2_id"], per_pair,
                            batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in p_cols.items()})
        out = df.groupby("rule", as_index=False).sum()
        return out.astype(p_cols).sort_values("rule") \
            .reset_index(drop=True)[list(p_cols)]

    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


# --------------------------------------------------- candidate ranking
def candidate_topk(mentions_ds, *, k: int = 3, cap: int = 10_000):
    """Ranked candidate list per mention: the top-``k`` other mentions
    sharing an n:/p: blocking key, ordered by Jaro-Winkler similarity
    of normalized surfaces (ties to the smaller candidate id) — the
    reference's proximity-sorted candidate finder as a first-class
    ranked surface (RunKBPEntityLinkerSystem.scala:45-49 composition +
    the M10 proximity sort).

    Scale shape: one bk exchange generates within-block ordered pairs
    with both norms carried (loud cap per key, _block_pairs_frame
    convention); one mention exchange dedupes cross-key pairs, scores
    JW in ONE vectorized DuckDB pass per block (the scorer kernel,
    bit-equal to jaro_winkler_similarity) and keeps the local top-k —
    per-mention output is k-bounded. Out: (mention_id, candidate_id,
    jw, rank)."""
    ds = mentions_ds.select_columns(["mention_id", "surface"])

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"mention_id": str, "norm": str, "bk": str}
        if len(df) == 0:
            return pd.DataFrame({k_: pd.Series(dtype=v)
                                 for k_, v in cols.items()})
        norm = _norm_series(df["surface"].astype(str))
        mid = df["mention_id"].astype(str)
        keep = norm != ""
        out = [pd.DataFrame({"mention_id": mid[keep],
                             "norm": norm[keep],
                             "bk": "n:" + norm[keep]})]
        first = norm[keep].str.split(" ").str[0]
        pm = first.str.len() >= 3
        if pm.any():
            out.append(pd.DataFrame({
                "mention_id": mid[keep][pm], "norm": norm[keep][pm],
                "bk": "p:" + first[pm].str.slice(0, 6)}))
        return pd.concat(out, ignore_index=True)[list(cols)]

    keyed = ds.map_batches(keys, batch_format="pandas")

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"m": str, "c": str, "mn": str, "cn": str}
        rows = {k_: [] for k_ in cols}
        if len(df) == 0:
            return pd.DataFrame({k_: pd.Series(dtype=v)
                                 for k_, v in cols.items()})
        for bk, g in df.groupby("bk", sort=False):
            g = g.drop_duplicates("mention_id")
            n = len(g)
            if n < 2:
                continue
            if n > cap:
                raise ValueError(
                    f"candidate_topk block {bk!r} holds {n} mentions "
                    f"(> cap {cap}); route through the salted generator")
            i, j = np.triu_indices(n, k=1)
            ids = g["mention_id"].to_numpy(dtype=object)
            ns = g["norm"].to_numpy(dtype=object)
            # both directions: each side ranks the other as candidate
            rows["m"].extend((ids[i], ids[j]))
            rows["c"].extend((ids[j], ids[i]))
            rows["mn"].extend((ns[i], ns[j]))
            rows["cn"].extend((ns[j], ns[i]))
        if not rows["m"]:
            return pd.DataFrame({k_: pd.Series(dtype=v)
                                 for k_, v in cols.items()})
        return pd.DataFrame({k_: np.concatenate(v)
                             for k_, v in rows.items()})

    pairs = group_blocks(keyed, ["bk"], pairs_block,
                         batch_format="pandas")

    def rank_block(df: pd.DataFrame, _k: int = k) -> pd.DataFrame:
        from ..scorer import _duck

        cols = {"mention_id": str, "candidate_id": str,
                "jw": "float64", "rank": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k_: pd.Series(dtype=v)
                                 for k_, v in cols.items()})
        d = df.drop_duplicates(["m", "c"]).reset_index(drop=True)
        con = _duck()
        view = pa.table({  # noqa: F841
            "a": pa.array(d["mn"].astype(str), pa.string()),
            "b": pa.array(d["cn"].astype(str), pa.string()),
            "i": pa.array(np.arange(len(d), dtype=np.int64))})
        con.register("ct_pairs", view)
        jw = con.execute(
            "SELECT floor(jaro_winkler_similarity(a, b) * 1e5 + 0.5)"
            " / 1e5 AS jw FROM ct_pairs ORDER BY i").df()["jw"] \
            .to_numpy(np.float64)
        con.unregister("ct_pairs")
        d = d.assign(jw=jw).sort_values(
            ["m", "jw", "c"], ascending=[True, False, True],
            kind="stable")
        d["rank"] = d.groupby("m", sort=False).cumcount() + 1
        d = d[d["rank"] <= _k]
        return pd.DataFrame({
            "mention_id": d["m"].astype(str),
            "candidate_id": d["c"].astype(str),
            "jw": d["jw"].astype("float64"),
            "rank": d["rank"].astype("int64")})[list(cols)]

    return group_blocks(pairs, ["m"], rank_block, batch_format="pandas")


def cluster_nmi(mentions_ds, *, num_partitions: int | None = None):
    """Normalized mutual information of the exact-alias clustering vs
    gold labels — the symmetric companion to :func:`cluster_vmeasure`:
    MI = H(C) + H(K) - H(C,K), NMI = MI / ((H(C) + H(K)) / 2)
    (arithmetic-mean normalization, the sklearn default). Same
    per-cell 1e-9 integer-grid entropy quantization, so cross-cell
    sums are exact int64 on both sides; THREE combiner exchanges (two
    marginals + the joint keyed by norm, which co-locates every
    (norm, gold) cell whole) and a one-row merge.
    Out: (n_mentions, mi, nmi), 6dp."""

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "norm": _norm_series(df["surface"].astype(str)),
            "gold": df["gold_kb_id"].astype(str)})
        return out[out["norm"] != ""].reset_index(drop=True)

    base = mentions_ds.map_batches(prep, batch_format="pandas") \
        .materialize()
    n_total = base.count()

    def q_terms(counts: np.ndarray) -> int:
        t = counts.astype(np.float64) * np.log(
            counts.astype(np.float64) / float(n_total))
        return int(np.floor(t * 1e9 + 0.5).astype(np.int64).sum())

    def count_partial(cols):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({**{c: pd.Series(dtype=str)
                                        for c in cols},
                                     "c": pd.Series(dtype="int64")})
            out = df.groupby(cols, as_index=False).size().rename(
                columns={"size": "c"})
            out["c"] = out["c"].astype("int64")
            return out
        return partial

    def sum_q(cols):
        def total(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"q": pd.Series(dtype="int64")})
            s = df.groupby(cols)["c"].sum().to_numpy(np.int64)
            return pd.DataFrame({"q": [q_terms(s)]})
        return total

    from ..shuffle import group_blocks

    hc = group_blocks(base.map_batches(count_partial(["norm"]),
                                       batch_format="pandas"),
                      ["norm"], sum_q(["norm"]), batch_format="pandas",
                      num_partitions=num_partitions)
    hk = group_blocks(base.map_batches(count_partial(["gold"]),
                                       batch_format="pandas"),
                      ["gold"], sum_q(["gold"]), batch_format="pandas",
                      num_partitions=num_partitions)
    hj = group_blocks(base.map_batches(count_partial(["norm", "gold"]),
                                       batch_format="pandas"),
                      ["norm"], sum_q(["norm", "gold"]),
                      batch_format="pandas",
                      num_partitions=num_partitions)

    def tag(kind):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["kind"] = kind
            return df
        return f

    tagged = (hc.map_batches(tag("hc"), batch_format="pandas")
              .union(hk.map_batches(tag("hk"), batch_format="pandas"))
              .union(hj.map_batches(tag("hj"), batch_format="pandas")))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_mentions": "int64", "mi": "float64",
                "nmi": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("kind")["q"].sum()
        qs = {k: int(g.get(k, 0)) for k in ("hc", "hk", "hj")}
        n = float(n_total)
        h_c = -(qs["hc"] / 1e9) / n
        h_k = -(qs["hk"] / 1e9) / n
        h_j = -(qs["hj"] / 1e9) / n
        mi = h_c + h_k - h_j
        denom = (h_c + h_k) / 2.0
        nmi = 0.0 if denom == 0.0 else mi / denom
        r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
        return pd.DataFrame({
            "n_mentions": pd.array([n_total], dtype="int64"),
            "mi": [r6(mi)],
            "nmi": [r6(nmi)]})

    return tagged.repartition(1).map_batches(final, batch_format="pandas",
                                             batch_size=None)
