"""Driver-contract queries: one callable per implemented operator
(SURVEY.md §2), each taking ``sf_dir`` and returning a Dataset /
pandas DataFrame, plus the matching DuckDB oracle SQL.

Entity-linking queries run over the deterministic transcript fixture
derived from the sf scale (el.fixtures.ensure_fixture); the training-
data-ops queries run directly over the driver's parquet tables
(documents / embeddings / events / orders / customer / lineitem).

Rounding discipline: every float column that must hash-match the SQL
oracle is rounded with floor(x * 10^k + 0.5) / 10^k on BOTH sides —
identical half-away behavior regardless of engine rounding mode.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .fixtures import ensure_fixture
from .mentions import extract_mentions
from .ops.textstats import LANG_MARKERS
from .pipeline import run_linkage
from .sim import jaro_winkler, soundex
from .text import normalize_name

# The driver's correctness pass runs at sf0.01 -> fixture scale t2.
FIXTURE_SQL_DIR = "/tmp/el_fixtures/t2"
# ... and its SQL views read the sf0.01 tables; data-dependent oracle
# literals (the IVF centroids) are fitted on the same table
# (overridable for local check_oracle runs at other scales).
ORACLE_SF_DIR = os.environ.get("EL_ORACLE_SF_DIR", "/root/testdata/sf0.01")

NORM_SQL = "trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"
STOPLIST_SQL = "('the','and','of','to','a','in','is','was','that','for')"

# American-soundex adjacent-duplicate collapse without backreferences
# (DuckDB's RE2 has none): one chained replace per digit
_SOUNDEX_COLLAPSE = "coded"
for _d in "123456":
    _SOUNDEX_COLLAPSE = (
        f"regexp_replace({_SOUNDEX_COLLAPSE}, '{_d}{_d}+', '{_d}', 'g')"
    )


def _round_half_away(series, k: int):
    scale = 10 ** k
    return np.floor(np.asarray(series, dtype=np.float64) * scale + 0.5) / scale


def _roundsql(expr: str, k: int) -> str:
    scale = 10 ** k
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    """Pruned parquet read: pass ``columns`` so only the columns the
    operator consumes leave storage (the read-pruning discipline every
    other read path already follows)."""
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns)


# ===================================================================== EL
def q_el_mentions(sf_dir: str):
    """Stage A conformance: extraction must recover the labeled mention
    set exactly (oracle reads the generator's gold_mentions)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )
    m = extract_mentions(tr)
    return m.select_columns(["mention_id", "conv_id", "turn_idx", "beg", "end",
                             "surface"])


# answers memo: four driver queries (el_answers, el_human_readable,
# el_sports_links, el_benchmark_report) consume the same pipeline run —
# one execution per (session, fixture) instead of four
_ANSWERS_CACHE: dict[str, object] = {}


def _answers(fd: str):
    if fd not in _ANSWERS_CACHE:
        _ANSWERS_CACHE[fd] = run_linkage(fd)
    return _ANSWERS_CACHE[fd]


def q_el_answers(sf_dir: str):
    """FULL-ORACLE answers surface: the pipeline's final row for EVERY
    mention, projected to the gold-replayable columns (mention_id,
    conv_id, turn_idx, surface, cluster_id, kb_link). The oracle
    replays the expected answer set from gold_mentions exactly like
    el_cluster_links (KB rows carry gold_kb_id verbatim, NIL rows the
    deterministic 'NIL:<min mention_id in gold partition>' — exact
    because the e2e B3 gate pins engine clusters == gold partitions).
    The two non-replayable columns stay pytest-gated: alias
    (canonicalization conformance tests) and confidence (calibration
    unit tests + the e2e well-formedness gate); ``entry()`` still
    returns all 8 columns. Reference answer-set semantics:
    RunKBPEntityLinkerSystem.scala:160-192."""
    fd = ensure_fixture(sf_dir)

    def slim(t: pa.Table) -> pa.Table:
        return t.select(["mention_id", "conv_id", "turn_idx", "surface",
                         "cluster_id", "kb_link"])

    return _answers(fd).map_batches(slim, batch_format="pyarrow")


def q_el_cluster_sizes(sf_dir: str):
    """Cluster-size distribution of the exact-alias clustering (one
    row per size: how many clusters have that many mentions) — the
    skew diagnostic read before sizing the pair-generation caps
    (el/blocking.py's cap rationale) and the distribution companion to
    the scalar cluster-quality family (ARI / FM / V-measure).

    Scale shape: per-batch (norm, partial-count) combiner -> ONE norm
    exchange folding exact per-cluster sizes -> per-block size
    histogram partials -> one tiny size exchange. No row-scale
    materialization anywhere."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .shuffle import group_blocks

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["surface"],
    )

    def norm_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"norm": pd.Series(dtype=str),
                                 "c": pd.Series(dtype="int64")})
        norms = pd.Series([normalize_name(s) for s in df["surface"]],
                          dtype=str)
        out = norms[norms != ""].to_frame("norm") \
            .groupby("norm", as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    def size_hist(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"cluster_size": pd.Series(dtype="int64"),
                                 "n_clusters": pd.Series(dtype="int64")})
        sizes = df.groupby("norm")["c"].sum()
        out = sizes.value_counts().rename_axis("cluster_size") \
            .reset_index(name="n_clusters")
        out = out.astype({"cluster_size": "int64",
                          "n_clusters": "int64"})
        return out

    hist_parts = group_blocks(
        gm.map_batches(norm_partial, batch_format="pandas"),
        ["norm"], size_hist, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"cluster_size": "int64", "n_clusters": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby("cluster_size", as_index=False)["n_clusters"] \
            .sum()
        out["n_clusters"] = out["n_clusters"].astype("int64")
        return out.sort_values("cluster_size").reset_index(drop=True)

    return group_blocks(hist_parts, ["cluster_size"], merge,
                        batch_format="pandas")


def q_el_exact_cluster(sf_dir: str):
    """Exact-alias NIL clustering semantics (clusterNils analog,
    RunKBPEntityLinkerSystem.scala:160-192): cluster by normalized
    surface, representative = min mention_id."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"],
    )

    def add_norm(t: pa.Table) -> pa.Table:
        norms = [normalize_name(s) for s in t.column("surface").to_pylist()]
        return pa.table({"mention_id": t.column("mention_id"),
                         "norm": pa.array(norms, pa.string())})

    def group_min(g: pa.Table) -> pa.Table:
        mids = g.column("mention_id").to_pylist()
        if not mids:  # empty partition: emit the schema, don't min([])
            return pa.table({"mention_id": pa.array([], pa.string()),
                             "cluster_id": pa.array([], pa.string())})
        lo = min(mids)
        return pa.table({"mention_id": pa.array(mids, pa.string()),
                         "cluster_id": pa.array([lo] * len(mids), pa.string())})

    from .shuffle import group_map

    return group_map(gm.map_batches(add_norm, batch_format="pyarrow"),
                     "norm", group_min)


def q_el_block_keys(sf_dir: str):
    """Blocking keys (normalized-exact + token-prefix) per mention."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"],
    )

    def keys(t: pa.Table) -> pa.Table:
        mids, out = [], []
        for mid, s in zip(t.column("mention_id").to_pylist(),
                          t.column("surface").to_pylist()):
            norm = normalize_name(s)
            if not norm:
                continue
            mids.append(mid)
            out.append(f"n:{norm}")
            first = norm.split()[0]
            if len(first) >= 3:
                mids.append(mid)
                out.append(f"p:{first[:6]}")
        return pa.table({"mention_id": pa.array(mids, pa.string()),
                         "block_key": pa.array(out, pa.string())})

    return gm.map_batches(keys, batch_format="pyarrow")


def q_el_block_keys_phonetic(sf_dir: str):
    """Phonetic (Soundex) blocking key — no SQL equivalent in DuckDB;
    rows-only driver check, unit-tested against known Soundex values."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"],
    )

    def keys(t: pa.Table) -> pa.Table:
        out = []
        for s in t.column("surface").to_pylist():
            norm = normalize_name(s)
            last = norm.split()[-1]
            out.append(f"ph:{soundex(last)}:{last[0]}")
        return pa.table({"mention_id": t.column("mention_id"),
                         "block_key": pa.array(out, pa.string())})

    return gm.map_batches(keys, batch_format="pyarrow")


def q_el_pair_jw(sf_dir: str):
    """Jaro-Winkler over the labeled pair fixture — validates the scorer
    kernel bit-for-bit against DuckDB's jaro_winkler_similarity."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data

    import pyarrow.parquet as pq

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"),
                               columns=["m1_id", "m2_id"])

    class JW:
        def __init__(self, ref):
            self.surf = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m1 = t.column("m1_id").to_pylist()
            m2 = t.column("m2_id").to_pylist()
            jw = [
                jaro_winkler(normalize_name(self.surf[a]),
                             normalize_name(self.surf[b]))
                for a, b in zip(m1, m2)
            ]
            return t.append_column(
                "jw", pa.array(_round_half_away(jw, 5), pa.float64())
            )

    return gp.map_batches(JW, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=2, num_cpus=0.5)


def q_el_jw_components(sf_dir: str):
    """Connected components over the labeled-pair graph at the
    agglomerative JW cutoff (Clusterer.scala:40-46 merge semantics as
    one CC pass): min-label propagation — the engine's DISTRIBUTED
    clustering path — labeled by min mention_id. First direct SQL
    oracle over the clustering machinery (recursive-CTE companion to
    the pytest equivalence gates)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data

    import pyarrow.parquet as pq

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"),
                               columns=["m1_id", "m2_id"])

    class Edges:
        def __init__(self, ref):
            self.surf = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m1 = t.column("m1_id").to_pylist()
            m2 = t.column("m2_id").to_pylist()
            jw = _round_half_away(
                [jaro_winkler(normalize_name(self.surf[a]),
                              normalize_name(self.surf[b]))
                 for a, b in zip(m1, m2)], 5)
            keep = jw >= 0.92
            return pa.table({
                "src": pa.array([a for a, k in zip(m1, keep) if k],
                                pa.string()),
                "dst": pa.array([b for b, k in zip(m2, keep) if k],
                                pa.string()),
            })

    edges = gp.map_batches(Edges, fn_constructor_args=(ref,),
                           batch_format="pyarrow", concurrency=2,
                           num_cpus=0.5)
    labels = ray.data.from_arrow(
        pa.table({"node": gm.column("mention_id"),
                  "label": gm.column("mention_id")}))

    from .cluster import label_propagation

    out = label_propagation(edges, labels, num_partitions=4)
    return out.map_batches(
        lambda t: pa.table({"mention_id": t.column("node"),
                            "component": t.column("label")}),
        batch_format="pyarrow")


def q_el_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood blocking (Hernandez-Stolfo) over the gold
    mention set: candidate pairs within a window-4 sliding window of
    the (normalized surface, mention_id) sort order. One sort + a
    prefix-sum count wave + block-local pair emission (el/ops/er.py)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import sorted_neighborhood

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"],
    )
    return sorted_neighborhood(gm, window=4)


def q_el_metablocking(sf_dir: str):
    """CBS meta-blocking: candidate pairs sharing >= 2 keys of the
    n:/p: blocking scheme (graph meta-blocking pair pruning)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import metablocking_pairs

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"],
    )
    return metablocking_pairs(gm, min_cbs=2)


def q_el_blocking_quality(sf_dir: str):
    """Blocking-scheme eval vs gold entities: pairs completeness,
    reduction ratio, pairs quality of the n:/p: scheme (one row)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import blocking_quality

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface", "gold_kb_id"],
    )
    return blocking_quality(gm)


def q_el_snb_quality(sf_dir: str):
    """blocking_quality's report for the SORTED-NEIGHBORHOOD scheme
    (the "snb" pluggable strategy): pairs completeness / reduction
    ratio / pairs quality of the window-4 rank-window pair set vs gold
    entities (one row; the Christen blocking-scheme comparison next to
    el_blocking_quality's n:/p: row)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import snb_quality

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface", "gold_kb_id"],
    )
    return snb_quality(gm, window=4)


def q_el_rare_token_quality(sf_dir: str):
    """blocking_quality's report for the RARE-TOKEN scheme (the
    "rare_token" pluggable strategy): pairs completeness / reduction
    ratio / pairs quality of the rarest-token single-key pair set vs
    gold entities (one row; completes the Christen blocking-scheme
    comparison triple next to el_blocking_quality and
    el_snb_quality)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import rare_token_quality

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface", "gold_kb_id"],
    )
    return rare_token_quality(gm)


def q_el_fs_weights(sf_dir: str):
    """Fellegi-Sunter per-feature match weights estimated from the
    labeled candidate-pair fixture (add-one smoothed m/u, log2 ratio)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import fellegi_sunter

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(
        os.path.join(fd, "gold_pairs.parquet"),
        columns=["m1_id", "m2_id", "same_entity"],
    )
    return fellegi_sunter(gp, ref)


def q_el_token_sims(sf_dir: str):
    """Hybrid token-set similarities (Jaccard/Dice/overlap/Monge-Elkan)
    over the labeled candidate pairs — the string-similarity menu
    beyond whole-string JW (el/ops/er.py::token_pair_sims)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import token_pair_sims

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(
        os.path.join(fd, "gold_pairs.parquet"),
        columns=["m1_id", "m2_id"],
    )
    return token_pair_sims(gp, ref)


def q_el_incremental_assign(sf_dir: str):
    """Incremental ER: assign the 'new' half of the corpus (md5 conv
    split) to existing exact-alias clusters or fresh NILs — one tagged
    hash exchange, no base-map broadcast (el/ops/er.py)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import incremental_assign

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "conv_id", "surface"],
    )
    return incremental_assign(gm, split_hex="8")


def q_el_block_skew(sf_dir: str):
    """Hot blocking keys by candidate-pair volume — the skew report
    that drives the salting threshold (el/ops/er.py::block_skew)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import block_skew

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"],
    )
    return block_skew(gm, k=20)


def q_el_fs_em(sf_dir: str):
    """UNSUPERVISED Fellegi-Sunter EM (the Splink core loop) over the
    unlabeled candidate pairs — 3 fixed iterations, bit-exact via
    integer-grid gammas (el/ops/er.py::fs_em); the oracle replays the
    same iterations unrolled (_fs_em_sql)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import fs_em

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(
        os.path.join(fd, "gold_pairs.parquet"),
        columns=["m1_id", "m2_id"],
    )
    return fs_em(gp, ref, iters=3)


def _fs_em_sql(gm: str, gp: str, norm: str, iters: int = 3,
               emit: str = "params") -> str:
    """Textually unroll the EM iterations (pure string construction —
    no data-dependent literals). Mirrors fs_em: left-associated
    likelihood products, gamma quantized to the 1e9 integer grid,
    BIGINT partial sums, parameters re-rounded at 6 per iteration.
    ``emit``: 'params' -> one row per feature; 'scores' -> per-pair
    grid-quantized match probability under the final parameters."""
    from .ops.er import EM_GRID, EM_INIT_LAMBDA, EM_INIT_M, EM_INIT_U, \
        FS_FEATURES

    grid = f"{float(EM_GRID):.1f}"
    feats = list(FS_FEATURES)
    agree_exprs = {
        "exact": "(n1 = n2)",
        "first_token": "split_part(n1, ' ', 1) = split_part(n2, ' ', 1)",
        "jw92": ("floor(jaro_winkler_similarity(n1, n2) * 1e5 + 0.5) / 1e5"
                 " >= 0.92"),
        "last_token": "str_split(n1, ' ')[-1] = str_split(n2, ' ')[-1]",
        "token_count": "len(str_split(n1, ' ')) = len(str_split(n2, ' '))",
    }
    a_cols = ",\n                       ".join(
        f"{agree_exprs[f]} AS a_{f}" for f in feats)
    i0 = ", ".join(
        [f"{EM_INIT_LAMBDA} AS lam"]
        + [f"{EM_INIT_M} AS m_{f}" for f in feats]
        + [f"{EM_INIT_U} AS u_{f}" for f in feats])
    ctes = [
        f"s AS (SELECT mention_id, {norm} AS norm FROM {gm})",
        f"""p0 AS (
                SELECT gp.m1_id, gp.m2_id, s1.norm AS n1, s2.norm AS n2
                FROM {gp} gp
                JOIN s s1 ON gp.m1_id = s1.mention_id
                JOIN s s2 ON gp.m2_id = s2.mention_id
            )""",
        f"""p AS (
                SELECT m1_id, m2_id, {a_cols}
                FROM p0
            )""",
        f"i0 AS (SELECT {i0})",
    ]
    for it in range(1, iters + 1):
        pv = f"i{it - 1}"
        w = f"{pv}.lam"
        v = f"(1 - {pv}.lam)"
        for f in feats:
            w = (f"({w} * CASE WHEN a_{f} THEN {pv}.m_{f} "
                 f"ELSE 1 - {pv}.m_{f} END)")
            v = (f"({v} * CASE WHEN a_{f} THEN {pv}.u_{f} "
                 f"ELSE 1 - {pv}.u_{f} END)")
        ctes.append(
            f"""e{it} AS (
                SELECT p.*,
                       CAST(floor({w} / ({w} + {v}) * {grid} + 0.5)
                            AS BIGINT) AS g
                FROM p, {pv}
            )""")
        sums = ", ".join(
            ["CAST(count(*) AS BIGINT) AS n", "sum(g) AS sg"]
            + [f"sum(CASE WHEN a_{f} THEN g ELSE 0 END) AS sa_{f}"
               for f in feats]
            + [f"CAST(count(*) FILTER (a_{f}) AS BIGINT) AS na_{f}"
               for f in feats])
        ctes.append(f"s{it} AS (SELECT {sums} FROM e{it})")
        params = [
            _roundsql(f"CAST(sg AS DOUBLE) / (CAST(n AS DOUBLE) * {grid})",
                      6) + " AS lam"]
        for f in feats:
            params.append(
                _roundsql(f"CAST(sa_{f} AS DOUBLE) / CAST(sg AS DOUBLE)", 6)
                + f" AS m_{f}")
            params.append(
                _roundsql(
                    f"(CAST(na_{f} AS DOUBLE) * {grid} - "
                    f"CAST(sa_{f} AS DOUBLE)) / "
                    f"(CAST(n AS DOUBLE) * {grid} - CAST(sg AS DOUBLE))", 6)
                + f" AS u_{f}")
        ctes.append(f"i{it} AS (SELECT {', '.join(params)} FROM s{it})")
    last = f"i{iters}"
    if emit == "scores":
        w = f"{last}.lam"
        v = f"(1 - {last}.lam)"
        for f in feats:
            w = (f"({w} * CASE WHEN a_{f} THEN {last}.m_{f} "
                 f"ELSE 1 - {last}.m_{f} END)")
            v = (f"({v} * CASE WHEN a_{f} THEN {last}.u_{f} "
                 f"ELSE 1 - {last}.u_{f} END)")
        selects = (f"SELECT m1_id, m2_id, "
                   f"floor({w} / ({w} + {v}) * {grid} + 0.5) / {grid} "
                   f"AS match_prob FROM p, {last}")
    else:
        selects = "\n            UNION ALL\n            ".join(
            f"SELECT '{f}' AS feature, m_{f} AS m_prob, u_{f} AS u_prob, "
            f"lam FROM {last}" for f in feats)
    return "WITH " + ",\n            ".join(ctes) + "\n            " + selects


def q_el_em_scores(sf_dir: str):
    """Per-pair match probability under the unsupervised EM model —
    the Splink-style pair-level output (el/ops/er.py::fs_em_scores)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import fs_em_scores

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(
        os.path.join(fd, "gold_pairs.parquet"),
        columns=["m1_id", "m2_id"],
    )
    return fs_em_scores(gp, ref, iters=3)


def q_comention_counts(sf_dir: str):
    """Conversation-level co-mention counts (extraction-vector join
    analog, J9): oracle is a distinct self-join + group count."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.cooccur import comention_counts

    gm = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                               columns=["conv_id", "surface"])
    return comention_counts(gm)


def q_comention_pagerank(sf_dir: str):
    """Integer PageRank over the undirected co-mention graph (5
    iterations, damping 85/100, ranks in 1e-12 units). Pregel-shaped:
    adjacency exchanged once and reused, two plain-task exchanges per
    iteration, node-scale rank table materialized between. Oracle =
    five unrolled integer iterations in DuckDB (hash-exact because all
    arithmetic is int64)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.cooccur import comention_counts
    from .ops.graph import pagerank_int

    gm = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                               columns=["conv_id", "surface"])

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": pd.concat([df["s1"], df["s2"]], ignore_index=True),
            "dst": pd.concat([df["s2"], df["s1"]], ignore_index=True)})

    edges = comention_counts(gm).map_batches(both_dirs,
                                             batch_format="pandas")
    return pagerank_int(edges, iters=5)


def q_comention_hits(sf_dir: str):
    """Integer HITS hubs/authorities over the DIRECTED co-mention
    graph (each unordered co-mention pair oriented s1 -> s2 by the
    lexicographic order comention_counts already emits — deterministic
    and asymmetric, so hubs and authorities genuinely differ). Two
    unrolled iterations of pure int64 sums, no normalization (same
    integer-iteration discipline as comention_pagerank); oracle =
    both iterations unrolled in DuckDB. Reference analog: authority
    scoring over the extraction-vector co-occurrence graph
    (ExtrSolrHelper.scala:17-45 builds the vectors this graph joins).
    """
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.cooccur import comention_counts
    from .ops.graph import hits_int

    gm = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                               columns=["conv_id", "surface"])

    def directed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": df["s1"], "dst": df["s2"]})

    edges = comention_counts(gm).map_batches(directed,
                                             batch_format="pandas")
    return hits_int(edges, iters=2)


def q_comention_kcore(sf_dir: str):
    """Fixed-round k-core pruning (k=3, 3 rounds) over the undirected
    co-mention graph — the dense-community-seed view of the same
    extraction-vector co-occurrence structure comention_pagerank
    ranks. Each round = one degree exchange + two tagged edge-filter
    exchanges, no node-table broadcast; oracle = the three rounds
    unrolled in DuckDB (pure integer degree counts, hash-exact)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.cooccur import comention_counts
    from .ops.graph import kcore_prune

    gm = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                               columns=["conv_id", "surface"])

    def undirected(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s1": df["s1"], "s2": df["s2"]})

    edges = comention_counts(gm).map_batches(undirected,
                                             batch_format="pandas")
    return kcore_prune(edges, k=3, rounds=3)


def q_comention_pmi(sf_dir: str):
    """Pointwise mutual information per co-mention pair (collocation
    mining over the conversation corpus): ln(c_ab * N / (c_a * c_b)).
    Surface counts broadcast as a zero-copy Arrow table; operand order
    mirrored exactly by the SQL so the 5dp rounding agrees."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.cooccur import pmi_pairs

    gm = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                               columns=["conv_id", "surface"])
    return pmi_pairs(gm)


def q_transcripts_passthrough(sf_dir: str):
    """North-rule invariant surface: per-turn text equality under stable
    (conv_id, turn_idx) ordering after a map_batches round-trip."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "role", "text", "tool"],
    )
    from .shuffle import arrowize

    passthrough = tr.map_batches(lambda t: t, batch_format="pyarrow")
    return arrowize(passthrough).sort(["conv_id", "turn_idx"])


def q_el_contexts(sf_dir: str):
    """Per-turn narrow/wide context assembly (M1-M4 analog): one conv_id
    hash exchange + vectorized in-block shift-join; the oracle is the
    lag/lead window expression."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .contexts import build_turn_contexts

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )
    return build_turn_contexts(tr)


def q_el_coref_contexts(sf_dir: str):
    """Repeat-mention coref-context union per conversation (M4/M9
    analog, KBPQuery.scala:34-57): oracle is join + ordered string_agg."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .contexts import build_coref_contexts

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )
    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "conv_id", "turn_idx", "surface"],
    )
    return build_coref_contexts(tr, gm)


def q_el_doc_entities(sf_dir: str):
    """Per-conversation NE lists (the doc_annotate prep pipeline,
    SerializeNamedEntities analog), EXPLODED to scalar rows
    (conv_id, kind, rank, surface) so the oracle hash is engine-neutral
    — the SQL replays type_surface + the first-occurrence dedup +
    gazetteer state expansion."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .alias import build_doc_entities
    from .mentions import extract_mentions

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )
    de = build_doc_entities(extract_mentions(tr))

    def explode(t: pa.Table) -> pa.Table:
        conv_o, kind_o, rank_o, surf_o = [], [], [], []
        for conv, pers, orgs, locs in zip(
            t.column("conv_id").to_pylist(), t.column("pers").to_pylist(),
            t.column("orgs").to_pylist(), t.column("locs").to_pylist()
        ):
            for kind, lst in (("pers", pers), ("orgs", orgs),
                              ("locs", locs)):
                for i, s in enumerate(lst or [], 1):
                    conv_o.append(conv)
                    kind_o.append(kind)
                    rank_o.append(i)
                    surf_o.append(s)
        return pa.table({
            "conv_id": pa.array(conv_o, pa.string()),
            "kind": pa.array(kind_o, pa.string()),
            "rank": pa.array(rank_o, pa.int64()),
            "surface": pa.array(surf_o, pa.string()),
        })

    return de.map_batches(explode, batch_format="pyarrow")


def q_el_human_readable(sf_dir: str):
    """FULL-ORACLE human-readable surface (S10 analog,
    FormattedOutputToHumanReadableOutputConverter.scala:11-27): answers
    joined with KB title/type via the broadcast-KB actor pool,
    projected to the gold-replayable columns. The oracle replays
    kb_link from gold (el_cluster_links trick) and joins the fixture's
    kb.parquet for title/type with the engine's NIL defaults
    (title '', type 'NIL') — so the broadcast join itself is under the
    driver's hash check, not just pytest."""
    fd = ensure_fixture(sf_dir)

    from .kb import broadcast_kb
    from .outputs import human_readable

    answers = _answers(fd)
    kb_ref = broadcast_kb(os.path.join(fd, "kb.parquet"))

    def slim(t: pa.Table) -> pa.Table:
        return t.select(["mention_id", "conv_id", "turn_idx", "surface",
                         "kb_link", "kb_title", "kb_type"])

    return human_readable(answers, kb_ref).map_batches(
        slim, batch_format="pyarrow")


def q_el_sports_links(sf_dir: str):
    """FULL-ORACLE sports-override surface (linkQuery steps 1 + 8,
    RunKBPEntityLinkerSystem.scala:59-61, 131-147): every mention the
    engine re-linked to a TEAM-typed KB entry — the rows where the
    sports gate fired — with the step's fixed confidence 0.7. The
    engine derives 'team-typed' from its own KB index (input data, not
    gold); the oracle independently replays the expected set from
    gold_mentions ⋈ kb ON wiki_type='team'. A spurious sports firing
    adds an engine row, a missed one drops one — both hash-mismatch.
    (The broader every-city-mention surface is el_city_links.)"""
    fd = ensure_fixture(sf_dir)

    import ray

    from .kb import broadcast_kb

    answers = _answers(fd)
    kb_ref = broadcast_kb(os.path.join(fd, "kb.parquet"))

    class OnlyTeams:
        def __init__(self):
            kb = ray.get(kb_ref)
            self.team_ids = pa.array(sorted(
                k for k, w in kb.wiki_type_of_id.items() if w == "team"))

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(
                pc.is_in(t.column("kb_link"), value_set=self.team_ids)
            ).select(["mention_id", "surface", "kb_link", "confidence"])

    return answers.map_batches(OnlyTeams, batch_format="pyarrow",
                               concurrency=2, num_cpus=0.5)


def q_el_city_links(sf_dir: str):
    """FULL-ORACLE companion to el_sports_links: the final kb_link of
    every gazetteer-city mention, WITHOUT the confidence column. The
    oracle replays the expected answer from gold: KB-linked mentions
    must carry gold_kb_id verbatim, and NIL mentions must carry the
    engine's deterministic 'NIL:<min mention_id in cluster>' label,
    which SQL reconstructs as the min over the gold cluster (exact
    because the B3 gate pins engine clusters == gold partitions). This
    puts the sports-override path (linkQuery steps 1 + 8) under the
    driver's hash check, not just pytest."""
    fd = ensure_fixture(sf_dir)

    from .gazetteer import CITIES

    answers = _answers(fd)
    cities = pa.array(sorted(CITIES))

    def only_cities(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t.column("surface"), value_set=cities)
        ).select(["mention_id", "surface", "kb_link"])

    return answers.map_batches(only_cities, batch_format="pyarrow")


def q_el_cluster_links(sf_dir: str):
    """FULL-ORACLE core-pipeline surface: (mention_id, cluster_id,
    kb_link) for EVERY mention. Same gold-replay oracle as
    el_city_links, corpus-wide: KB-linked mentions carry gold_kb_id,
    NIL mentions the engine's deterministic 'NIL:<min mention_id in
    cluster>' label reconstructed over the gold partition. This puts
    the end-to-end clustering + linking result under the driver's hash
    check (el_answers stays rows-only because alias canonicalization
    and confidence aren't SQL-replayable)."""
    fd = ensure_fixture(sf_dir)

    answers = _answers(fd)

    def slim(t: pa.Table) -> pa.Table:
        return t.select(["mention_id", "cluster_id", "kb_link"])

    return answers.map_batches(slim, batch_format="pyarrow")


def q_el_pair_features(sf_dir: str):
    """FULL feature-vector surface over the labeled gold pairs — the
    LinkFeatureWriter analog (LinkFeatureWriter.scala:12-95: dump every
    feature + score per judged pair for inspection): all 7 pair
    features plus the logit score, computed by the production scorer
    kernel (el/scorer.py score_pairs_batch). The oracle replays the
    identical DuckDB feature SQL + the sigmoid with the module weight
    constants embedded as literals."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data

    import pyarrow.parquet as pq

    from .scorer import compute_pair_features

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"),
                               columns=["m1_id", "m2_id"])

    class Featurize:
        def __init__(self):
            self.surf = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            import numpy as np

            m1 = t.column("m1_id").to_pylist()
            m2 = t.column("m2_id").to_pylist()
            batch = pa.table({
                "alias1": pa.array([self.surf[a] for a in m1], pa.string()),
                "alias2": pa.array([self.surf[b] for b in m2], pa.string()),
                "surface1": pa.array([self.surf[a] for a in m1],
                                     pa.string()),
                "surface2": pa.array([self.surf[b] for b in m2],
                                     pa.string()),
            })
            f = compute_pair_features(batch)
            from .scorer import (BOOL_FLOOR, JW_PIVOT, W_COMMON, W_JW,
                                 W_JWS, W_OVL)

            jw = np.asarray(f["jw_alias"], dtype=np.float64)
            jws = np.asarray(f["jw_surface"], dtype=np.float64)
            ovl = np.asarray(f["tok_overlap"], dtype=np.float64)
            floor = np.asarray(f["prefix2"]) | np.asarray(f["abbr"])
            base = W_JW * (jw - JW_PIVOT)
            base = np.where(floor, np.maximum(base, BOOL_FLOOR), base)
            z = (base + W_JWS * (jws - jw) + W_OVL * (ovl - 0.5)
                 - W_COMMON * np.asarray(f["common_surname"],
                                         dtype=np.float64))
            score = 1.0 / (1.0 + np.exp(-z))
            out = {"m1_id": t.column("m1_id"), "m2_id": t.column("m2_id")}
            for k in ("jw_alias", "jw_surface", "tok_overlap"):
                out[k] = pa.array(_round_half_away(f[k], 5), pa.float64())
            for k in ("prefix2", "contains", "abbr", "common_surname"):
                out[k] = pa.array(np.asarray(f[k], dtype=bool))
            out["score"] = pa.array(_round_half_away(score, 5),
                                    pa.float64())
            return pa.table(out)

    return gp.map_batches(Featurize, batch_format="pyarrow",
                          concurrency=2, num_cpus=0.5)


def q_el_training_pairs(sf_dir: str):
    """Seeded 10:1 negative-downsampled pair training set
    (MentionPairTrainingData analog; seeded sampling — rows-only)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .training import build_pair_training_set

    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"))
    return build_pair_training_set(gp)


# ============================================================== text ops
def q_doc_fingerprint(sf_dir: str):
    from .ops.textstats import fingerprint

    return fingerprint(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_exact_dedup(sf_dir: str):
    from .ops.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_token_count(sf_dir: str):
    from .ops.textstats import token_count

    return token_count(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_doc_quality(sf_dir: str):
    from .ops.textstats import quality

    return quality(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_lang_id(sf_dir: str):
    from .ops.textstats import lang_id

    return lang_id(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_gopher_rules(sf_dir: str):
    """Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1.1
    scaled to the fixture): per-document token bounds, mean-token-length
    band, alphabetic-token ratio, symbol ratio, stop-word floor — each
    signal + the composite pass flag (el/ops/textstats.py)."""
    from .ops.textstats import gopher_rules

    return gopher_rules(_read(sf_dir, "documents", ["doc_id", "text"]))


# ============================================================== prep ops
# deterministic PII planting (emails on every 4th doc, phones on every
# 6th) — identical string construction on the Ray and SQL sides
_PII_EMAIL_SUFFIX = "@example.com now"
_DECON_SENTINEL = ("alpha bravo charlie delta echo foxtrot golf hotel "
                   "india juliet")


def _pii_corpus(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        m4 = df["doc_id"] % 4 == 0
        df.loc[m4, "text"] = (
            df.loc[m4, "text"] + " contact user"
            + df.loc[m4, "doc_id"].astype(str) + _PII_EMAIL_SUFFIX
        )
        m6 = df["doc_id"] % 6 == 0
        df.loc[m6, "text"] = (
            df.loc[m6, "text"] + " call 415-555-"
            + (df.loc[m6, "doc_id"] % 10000).astype(str).str.zfill(4)
        )
        return df

    return docs.map_batches(plant, batch_format="pandas")


def q_pii_redact(sf_dir: str):
    """Email/phone redaction with per-document counts over the
    planted-PII corpus (RE2 patterns shared verbatim with the oracle)."""
    from .ops.prep import pii_redact

    return pii_redact(_pii_corpus(sf_dir))


def q_strip_markup(sf_dir: str):
    """XML/HTML tag stripping (M17 analog) over a planted-markup
    corpus: every 3rd doc gets wrapped in tags; output is the clean
    text + tag count."""
    from .ops.prep import strip_markup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        m = df["doc_id"] % 3 == 0
        df.loc[m, "text"] = ("<p>" + df.loc[m, "text"]
                             + '</p> <a href="x">link</a>')
        return df

    return strip_markup(docs.map_batches(plant, batch_format="pandas"))


def q_vocab_topk(sf_dir: str):
    """Corpus-wide top-100 token frequencies (vocabulary building):
    per-batch combiner -> one token exchange -> per-partition top-k ->
    tiny merge."""
    from .ops.prep import vocab_topk

    return vocab_topk(_read(sf_dir, "documents", ["text"]), k=100)


def q_doc_chunk(sf_dir: str):
    """Overlapping token-window chunking (RAG / context-window prep):
    64-token windows every 48 tokens, tail windows only when they add
    tokens. Oracle replays with generate_series + list_slice."""
    from .ops.prep import doc_chunk

    return doc_chunk(_read(sf_dir, "documents", ["doc_id", "text"]), size=64, stride=48)


def q_unigram_logprob(sf_dir: str):
    """Unigram LM quality score (perplexity proxy): corpus unigram model
    fitted in one combiner + token exchange (vocab-capped, OOV backoff),
    broadcast once, mean token log-prob per document in a second
    vectorized pass. The 65536 cap never trips at fixture vocab size,
    but the oracle replays it anyway (QUALIFY top-V)."""
    from .ops.textstats import unigram_logprob

    return unigram_logprob(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_lang_source_chi2(sf_dir: str):
    """Pearson chi-square independence statistic over the lang x
    source contingency table — the corpus-composition audit asking
    whether language mix varies by provenance. One (lang, source)
    count exchange (cell volume = langs x sources, never row-scale);
    each (o - e)^2 / e term quantized to the 1e-9 integer grid
    (order-free sum; e computed in identical double ops on both
    sides). Out: one row (n_docs, n_langs, n_sources, dof,
    chi2[6dp])."""
    import ray.data

    from .shuffle import group_blocks

    docs = _read(sf_dir, "documents", ["lang", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"lang": pd.Series(dtype=str),
                                 "source": pd.Series(dtype=str),
                                 "c": pd.Series(dtype="int64")})
        out = df.groupby(["lang", "source"], as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"lang": pd.Series(dtype=str),
                                 "source": pd.Series(dtype=str),
                                 "c": pd.Series(dtype="int64")})
        out = df.groupby(["lang", "source"], as_index=False)["c"].sum()
        out["c"] = out["c"].astype("int64")
        return out

    cells = group_blocks(docs.map_batches(partial, batch_format="pandas"),
                         ["lang", "source"], merge,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_docs": "int64", "n_langs": "int64",
                "n_sources": "int64", "dof": "int64",
                "chi2": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby(["lang", "source"], as_index=False)["c"].sum()
        # densify: chi2 includes absent cells (o = 0, e > 0)
        dense = g.pivot_table(index="lang", columns="source",
                              values="c", fill_value=0,
                              aggfunc="sum").astype("int64")
        o = dense.to_numpy("float64")
        n = float(int(o.sum()))
        rt = o.sum(axis=1, keepdims=True)
        ct = o.sum(axis=0, keepdims=True)
        e = (rt * ct) / n
        term = (o - e) * (o - e) / e
        q = int(np.floor(term * 1e9 + 0.5).astype("int64").sum())
        nl, ns = dense.shape
        return pd.DataFrame({
            "n_docs": pd.array([int(n)], dtype="int64"),
            "n_langs": pd.array([nl], dtype="int64"),
            "n_sources": pd.array([ns], dtype="int64"),
            "dof": pd.array([(nl - 1) * (ns - 1)], dtype="int64"),
            "chi2": [float(np.floor((q / 1e9) * 1e6 + 0.5) / 1e6)]})

    return cells.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_source_kl(sf_dir: str):
    """Per-source unigram KL divergence from the corpus token
    distribution (domain-shift screen per provenance slice). One token
    exchange attaches exact corpus counts to each (source, token)
    cell; per-cell terms quantized to the 1e-9 integer grid; one
    source exchange folds them. Cell volume bounded by sources x
    vocabulary."""
    from .ops.textstats import source_kl

    return source_kl(_read(sf_dir, "documents", ["text", "source"]))


def _decon_corpus(sf_dir: str):
    """documents with a 10-token sentinel appended to benchmark docs
    (doc_id % 97 == 0) and to every 13th doc — guarantees known
    8-gram contamination overlaps."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        m = (df["doc_id"] % 97 == 0) | (df["doc_id"] % 13 == 0)
        df.loc[m, "text"] = df.loc[m, "text"] + " " + _DECON_SENTINEL
        return df

    return docs.map_batches(plant, batch_format="pandas")


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag training docs sharing any 8-gram
    with the held-out benchmark subset (broadcast bench n-gram set)."""
    from .ops.prep import decontaminate

    return decontaminate(_decon_corpus(sf_dir), n=8, bench_mod=97)


def q_stratified_sample(sf_dir: str):
    """Hash-ranked 20-per-language stratified sample (seedless,
    md5-rank — DuckDB replays it exactly)."""
    from .ops.prep import stratified_sample

    return stratified_sample(_read(sf_dir, "documents", ["doc_id", "lang"]),
                             stratum="lang", per_stratum=20)


def q_group_quantiles(sf_dir: str):
    """Exact per-language token-count quantiles (corpus length
    profiling) — DuckDB quantile_disc order-statistic rule on both
    sides."""
    from .ops.prep import group_quantiles

    return group_quantiles(_read(sf_dir, "documents", ["lang", "text"]),
                           group="lang", qs=(0.5, 0.9))


def q_inverted_index(sf_dir: str):
    """Term -> df + sorted posting list (comma-joined) over documents:
    one term exchange over distinct (term, doc_id) rows."""
    from .ops.prep import inverted_index

    return inverted_index(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_bigram_topk(sf_dir: str):
    """Corpus-wide top-100 token bigrams (LM n-gram statistics)."""
    from .ops.prep import bigram_topk

    return bigram_topk(_read(sf_dir, "documents", ["text"]), k=100)


def q_zipf_slope(sf_dir: str):
    """Zipf-law exponent of the corpus vocabulary: least-squares slope
    (and intercept) of ln(freq) on ln(rank) over the top-1000 tokens —
    the corpus-health diagnostic a curation pipeline tracks across
    snapshots (natural text sits near slope -1; template spam skews
    it).

    Shape: vocab_topk's combiner + one token exchange + per-partition
    heads produce the constant-size top-K frame; per-point ln terms
    and products are quantized to the 1e-9 integer grid so the
    regression sums are exact int64 and the closed-form slope is the
    same double expression on both sides. Out: one row (n_points,
    slope[6dp], intercept[6dp])."""
    from .ops.prep import vocab_topk

    top = vocab_topk(_read(sf_dir, "documents", ["text"]), k=1000)

    def fit(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_points": "int64", "slope": "float64",
                "intercept": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        df = df.sort_values(["cnt", "token"],
                            ascending=[False, True]).reset_index(drop=True)
        kn = len(df)
        x = np.log(np.arange(1, kn + 1, dtype="float64"))
        y = np.log(df["cnt"].to_numpy("float64"))
        q = lambda a: np.floor(a * 1e9 + 0.5).astype("int64")  # noqa: E731
        sx = int(q(x).sum())
        sy = int(q(y).sum())
        sxy = int(q(x * y).sum())
        sxx = int(q(x * x).sum())
        fx, fy = sx / 1e9, sy / 1e9
        den = kn * (sxx / 1e9) - fx * fx
        slope = (kn * (sxy / 1e9) - fx * fy) / den
        intercept = (fy - slope * fx) / kn
        r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
        return pd.DataFrame({
            "n_points": pd.array([kn], dtype="int64"),
            "slope": [r6(slope)],
            "intercept": [r6(intercept)]})

    return top.map_batches(fit, batch_format="pandas", batch_size=None)


def q_bigram_pmi(sf_dir: str):
    """Top-100 collocations by pointwise mutual information (Church-
    Hanks) with a min-count-5 floor: bigram and unigram counts each in
    one token exchange, marginals attached via two tagged-union
    exchanges, ranking on the 1e-9 quantized-pmi grid
    (el/ops/prep.py::bigram_pmi)."""
    from .ops.prep import bigram_pmi

    return bigram_pmi(_read(sf_dir, "documents", ["text"]),
                      k=100, min_count=5)


def q_doc_top_terms(sf_dir: str):
    """Per-document top-3 salient terms, TF-IDF-style but integer-exact
    (tf DESC, global df ASC, term ASC)."""
    from .ops.prep import doc_top_terms

    return doc_top_terms(_read(sf_dir, "documents", ["doc_id", "text"]), k=3)


def q_repetition_score(sf_dir: str):
    """Per-document repeated-bigram statistics (boilerplate /
    degenerate-text detection): total grams, distinct grams, duplicated
    fraction, hottest gram count."""
    from .ops.prep import repetition_score

    return repetition_score(_read(sf_dir, "documents", ["doc_id", "text"]), n=2)


def q_token_pack(sf_dir: str):
    """GPT-style sequence packing via a distributed prefix sum:
    concatenate all document tokens in doc_id order, cut 128-token
    training sequences, emit per-(doc, sequence) spans."""
    from .ops.prep import token_pack

    return token_pack(_read(sf_dir, "documents", ["doc_id", "text"]), seq_len=128)


def q_conv_stats(sf_dir: str):
    """Per-conversation dialogue analytics: turn/role/tool counts,
    token totals, wall-clock duration, assistant response latency."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.dialogue import conv_stats

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    return conv_stats(tr)


def q_bpe_token_count(sf_dir: str):
    """Whitespace + BPE-ish pretokenizer token counts (context-window
    estimators for packing/budgeting)."""
    from .ops.textstats import bpe_token_count

    return bpe_token_count(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_conv_dedup(sf_dir: str):
    """Exact conversation-level dedup over transcripts with planted
    duplicate conversations (conv_ids ending '01' are copied under a
    'dup-' prefix): fingerprint each turn sequence, keep the min
    conv_id per fingerprint."""
    fd = ensure_fixture(sf_dir)
    import pyarrow.compute as _pc
    import ray.data

    from .ops.dialogue import conv_dedup

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "role", "text"],
    )

    def plant(t: pa.Table) -> pa.Table:
        cid = t.column("conv_id")
        m = _pc.match_substring_regex(cid, "01$")
        d = t.filter(m)
        dup = d.set_column(0, "conv_id", _pc.binary_join_element_wise(
            pa.array(["dup-"] * d.num_rows, pa.string()),
            d.column("conv_id"), ""))
        return pa.concat_tables([t, dup])

    return conv_dedup(tr.map_batches(plant, batch_format="pyarrow"))


def q_embed_quantize(sf_dir: str):
    """Symmetric per-vector int8 quantization of the embeddings table
    (first 4 quantized dims + full-vector checksum)."""
    from .ops.ann import quantize_embeddings

    return quantize_embeddings(_read(sf_dir, "embeddings", ["vec_id", "embedding"]))


def q_tool_bigrams(sf_dir: str):
    """Tool-call transition counts (agent-trace process mining): how
    often each (prev_tool, tool) pair occurs consecutively within a
    conversation, with each pair's share of all transitions. One
    conv_id exchange -> vocabulary-bounded count partials -> one tiny
    pair exchange."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.dialogue import tool_bigrams

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "tool"],
    )
    return tool_bigrams(tr)


def q_tool_calls(sf_dir: str):
    """Tool-bearing turns with the immediately preceding turn's role
    and text (agent-trace extraction over transcripts)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.dialogue import tool_calls

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "role", "text", "tool"],
    )
    return tool_calls(tr)


def q_conv_ngram_dedup(sf_dir: str):
    """Conversation-level NEAR-dup detection: each conversation's turns
    concatenate into one document (keyed by the conv_id integer tail),
    '01'-suffix conversations plant a near-dup clone (final turn
    dropped, id + 1e8), then the EXACT n-gram Jaccard operator runs
    unchanged over the conversation documents — the transcript analog
    of ngram_jaccard with the same inverted-shingle-index shape."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.dedup import ngram_jaccard_pairs
    from .ops.dialogue import conv_docs

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )
    docs = conv_docs(tr, clone_suffix="01")
    return ngram_jaccard_pairs(docs, threshold=0.5)


_SOURCE_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_SOURCE_MIX_DEFAULT = 0.1


def q_source_mix(sf_dir: str):
    """Weighted corpus mixing: per-source sampling rates decided by
    md5 hash rank — fully streaming, no exchange."""
    from .ops.prep import source_mix

    return source_mix(_read(sf_dir, "documents", ["doc_id", "source"]), _SOURCE_MIX_RATES,
                      default_rate=_SOURCE_MIX_DEFAULT)


def _planted_dups(sf_dir: str):
    """documents plus near-duplicates planted deterministically
    (doc_id + 1_000_000, last two words dropped) — gives the near-dup
    operators a known positive set."""
    import ray.data

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def clones(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["doc_id"] % 5 == 0].copy()  # every 5th doc gets a near-dup
        c["doc_id"] = c["doc_id"] + 1_000_000
        c["text"] = c["text"].str.split().str[:-2].str.join(" ")
        return pd.concat([df, c], ignore_index=True)

    return docs.map_batches(clones, batch_format="pandas")


def q_minhash_dedup(sf_dir: str):
    from .ops.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_planted_dups(sf_dir), threshold=0.8)


def _curation_corpus(sf_dir: str):
    """_planted_dups plus EXACT clones (identical text, doc_id
    + 2,000,000, every 7th doc) so the curation composite exercises
    both dedup gates."""
    def eclones(df: pd.DataFrame) -> pd.DataFrame:
        # originals only — the near-clones (+1,000,000) are not re-cloned
        c = df[(df["doc_id"] < 1_000_000) & (df["doc_id"] % 7 == 0)].copy()
        c["doc_id"] = c["doc_id"] + 2_000_000
        return pd.concat([df, c], ignore_index=True)

    return _planted_dups(sf_dir).map_batches(eclones, batch_format="pandas")


def q_corpus_curation(sf_dir: str):
    """Per-document retention decision over the curation corpus:
    language gate + token floor + exact-dup collapse + near-dup drop,
    first failed gate wins the reason column."""
    from .ops.curate import curate_corpus

    return curate_corpus(_curation_corpus(sf_dir),
                         keep_lang="en", min_tokens=15)


def q_near_dup_resolve(sf_dir: str):
    """Corpus-wide keep/drop resolution over the verified minhash
    pairs: (doc_id, canonical_id, keep) for every planted-dup corpus
    document."""
    from .ops.dedup import minhash_dedup_pairs, resolve_near_dups

    docs = _planted_dups(sf_dir).materialize()
    return resolve_near_dups(docs, minhash_dedup_pairs(docs, threshold=0.8))


def q_simhash_dedup(sf_dir: str):
    from .ops.dedup import simhash_pairs

    return simhash_pairs(_planted_dups(sf_dir), max_hamming=3)


def q_ngram_jaccard(sf_dir: str):
    from .ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_planted_dups(sf_dir), threshold=0.5)


# ====================================================== similarity search
def _query_matrix(sf_dir: str, n: int = 3) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    df = t.to_pandas().sort_values("vec_id").head(n)
    return np.array([np.asarray(v, dtype=np.float64) for v in df["embedding"]])


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining (contrastive-training negatives): exact
    cosine top-10 per query vector among table vectors with a
    DIFFERENT label — query matrix + labels broadcast once, per-batch
    vectorized matmul + label mask, one tiny q_id merge exchange
    (el/ops/ann.py::hard_negatives)."""
    import pyarrow.parquet as pq

    from .ops.ann import hard_negatives

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    head = t.to_pandas().sort_values("vec_id").head(3)
    Q = np.array([np.asarray(v, dtype=np.float64)
                  for v in head["embedding"]])
    labels = head["label"].to_numpy("int64")
    out = hard_negatives(
        _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"]),
        Q, labels, k=10)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["q_id"] = df["q_id"].astype("int64")
        df["sim"] = _round_half_away(df["sim"], 5)
        df["rank"] = df["rank"].astype("int64")
        return df[["q_id", "vec_id", "sim", "rank"]]

    return out.map_batches(finish, batch_format="pandas")


def q_ann_topk(sf_dir: str):
    """Exact brute-force cosine top-10 for the first 3 vectors."""
    from .ops.ann import brute_force_topk

    Q = _query_matrix(sf_dir)
    out = brute_force_topk(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), Q, k=10)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["q_id"] = df["q_id"].astype("int64")  # q index == vec_id 0..2
        df["sim"] = _round_half_away(df["sim"], 5)
        df["rank"] = df["rank"].astype("int64")
        return df[["q_id", "vec_id", "sim", "rank"]]

    return out.map_batches(finish, batch_format="pandas")


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate top-10. Oracle-checked: the seeded
    hyperplanes are embedded as literals in the SQL, which replays the
    signature/probe/top-k logic exactly (bit signs are scale-invariant,
    so the oracle skips the normalization)."""
    from .ops.ann import lsh_topk

    Q = _query_matrix(sf_dir)
    out = lsh_topk(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), Q, k=10)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["q_id"] = df["q_id"].astype("int64")
        df["sim"] = _round_half_away(df["sim"], 5)
        df["rank"] = df["rank"].astype("int64")
        return df[["q_id", "vec_id", "sim", "rank"]]

    return out.map_batches(finish, batch_format="pandas")


def q_ann_ivf(sf_dir: str):
    """IVF-quantized approximate top-10 (the scale path beside LSH).
    Oracle-checked: the spherical-k-means centroids — fitted on a
    bounded md5-ranked sample by ``ivf_fit_sample``, shared verbatim
    with the SQL builder — are embedded as literals in the SQL, which
    replays assignment / probe / top-k exactly. Recall vs brute force
    is additionally pytest-gated."""
    from .ops.ann import ivf_topk

    Q = _query_matrix(sf_dir)
    out = ivf_topk(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), Q, k=10, n_probe=6)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["q_id"] = df["q_id"].astype("int64")
        df["sim"] = _round_half_away(df["sim"], 5)
        df["rank"] = df["rank"].astype("int64")
        return df[["q_id", "vec_id", "sim", "rank"]]

    return out.map_batches(finish, batch_format="pandas")


BM25_QUERIES = ["hash join merge table", "window sort order",
                "batch row scan scan"]  # duplicate token: query-tf path


def q_bm25_topk(sf_dir: str):
    """BM25 top-10 docs per literal query string — the lexical
    retrieval companion to the ANN ops. Two streaming passes: a tiny
    stats combiner (per-query-term df + corpus length; nothing
    corpus-proportional leaves the workers) and a broadcast-idf scoring
    pass with local top-k. Oracle replays tokenization, df/idf, the
    Lucene BM25 form and ranking in DuckDB (same literal queries)."""
    from .ops.search import bm25_topk

    out = bm25_topk(_read(sf_dir, "documents", ["doc_id", "text"]), BM25_QUERIES, k=10)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["score"] = _round_half_away(df["score"], 5)
        return df

    return out.map_batches(finish, batch_format="pandas")


def q_embedding_dups(sf_dir: str):
    """Embedding-cosine near-duplicate pairs over embeddings plus planted
    exact copies (vec_id + 1_000_000)."""
    from .ops.ann import cosine_dup_pairs

    def clones(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["vec_id"] % 7 == 0].copy()
        c["vec_id"] = c["vec_id"] + 1_000_000
        return pd.concat([df, c], ignore_index=True)

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(clones, batch_format="pandas")
    out = cosine_dup_pairs(emb, threshold=0.9999)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sim"] = _round_half_away(df["sim"], 5)
        return df[["d1", "d2", "sim", "dropped_pairs"]]

    return out.map_batches(finish, batch_format="pandas")


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup over embeddings plus planted
    PERTURBED clones (vec_id % 5 == 0 -> +1_000_000, every coordinate
    +0.03 in float64 — cosine ~0.97 to the original, i.e. a semantic
    near-dup that no exact/LSH-on-sign pass at tight thresholds would
    catch). Keep-lowest-id within k-means cluster at cosine >= 0.9;
    the fixture's natural within-cluster sims top out at ~0.51, so the
    threshold sits in a ~[0.51, 0.97] gap on both float paths.
    Centroids are fitted on the BASE table (pre-clone) so the oracle
    reuses the ann_ivf literals builder verbatim."""
    import numpy as np

    from .ops.ann import fit_centroids_bounded, semantic_dedup

    base = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = fit_centroids_bounded(base, 256, 16, 5)

    def clones(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # float32 -> float64 is exact, matching the oracle's
        # CAST(embedding AS DOUBLE[]) before the +0.03 perturbation
        df["embedding"] = df["embedding"].map(
            lambda e: np.asarray(e, dtype=np.float64))
        c = df[df["vec_id"] % 5 == 0].copy()
        c["vec_id"] = c["vec_id"] + 1_000_000
        c["embedding"] = c["embedding"].map(lambda e: e + 0.03)
        return pd.concat([df, c], ignore_index=True)

    emb = base.map_batches(clones, batch_format="pandas")
    return semantic_dedup(emb, threshold=0.9, centroids=C)


def q_embedding_dups_exact(sf_dir: str):
    """Exact (brute-force) embedding-cosine near-duplicate pairs over the
    same planted-clone input as ``embedding_dups`` — the oracle-checkable
    companion to the LSH-bucketed approximate path (DuckDB cross-join
    oracle, same contract as ``ann_topk``)."""
    from .ops.ann import exact_cosine_pairs

    def clones(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["vec_id"] % 7 == 0].copy()
        c["vec_id"] = c["vec_id"] + 1_000_000
        return pd.concat([df, c], ignore_index=True)

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(clones, batch_format="pandas")
    out = exact_cosine_pairs(emb, threshold=0.9999)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sim"] = _round_half_away(df["sim"], 5)
        return df[["d1", "d2", "sim"]]

    return out.map_batches(finish, batch_format="pandas")


def _genre_of(conv_id: str) -> str:
    """Deterministic genre of a conversation — the docType analog
    (LinkFeatures.scala:83-86 derives newswire-vs-web from the doc-id
    prefix; the TAC gold carries a genre column): NW on even
    conversation counters, WB on odd. SQL-replayable from the id."""
    return "NW" if int(conv_id.rsplit("-", 1)[1]) % 2 == 0 else "WB"


def _web_of(conv_id: str) -> str:
    """Web flag analog of the gold's ``web`` column (independent of
    genre: counter mod 4 in the upper half)."""
    return "w1" if int(conv_id.rsplit("-", 1)[1]) % 4 >= 2 else "w0"


def q_el_benchmark_report(sf_dir: str):
    """End-to-end evaluation surface (Benchmarker.scala:94-148 analog):
    per-mention category counts (CORRECT / WRONG KB ID / EXP KB ID /
    EXP NIL / NIL OK), the same counts sliced per GENRE and per WEB
    flag (the reference gold's genre/web analysis axis — genre derives
    from the doc id, LinkFeatures.scala:83-86), the shared-named-entity
    cross-tab per KB-linked category (ExpNilStatistics.scala:8-59),
    pairwise F1, B-cubed, and the over-clustering counter, as one tidy
    (metric, value) table. FULL-ORACLE via gold replay: the e2e gate
    pins the engine's answers == gold on the fixture, so the expected
    report is derivable from gold_mentions + kb alone — any engine
    error shifts a category/slice/ne-share count or an F1 and
    hash-mismatches. Zero-count rows are omitted on both sides
    (defaultdict semantics)."""
    fd = ensure_fixture(sf_dir)
    import pyarrow.parquet as pq

    from .metrics import (b_cubed, category_of, category_report,
                          over_clustering, pairwise_f1, shared_ne_crosstab,
                          sliced_category_report)
    from .text import normalize_name

    answers = _answers(fd).to_pandas()
    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"))
    gp = pq.read_table(os.path.join(fd, "gold_pairs.parquet"))
    gold_of = dict(zip(gm["mention_id"].to_pylist(),
                       gm["gold_kb_id"].to_pylist()))
    cluster_of = dict(zip(answers.mention_id, answers.cluster_id))
    kb_link_of = dict(zip(answers.mention_id, answers.kb_link))
    rows: list[tuple[str, float]] = []
    for k, v in sorted(category_report(kb_link_of, gold_of).items()):
        rows.append((f"category:{k}", float(v)))

    # --- genre / web slices (system categories vs gold, per slice)
    conv_of = dict(zip(answers.mention_id, answers.conv_id))
    genre_slice = {m: f"genre:{_genre_of(c)}" for m, c in conv_of.items()}
    web_slice = {m: f"web:{_web_of(c)}" for m, c in conv_of.items()}
    for sl in (genre_slice, web_slice):
        for k, v in sorted(sliced_category_report(kb_link_of, gold_of,
                                                  sl).items()):
            rows.append((k, float(v)))

    # --- shared-NE cross-tab over the system's KB-linked answers
    # (ExpNilStatistics: of the "interesting" answers — link title !=
    # query name — how many share a named entity with the query doc)
    kbt = pq.read_table(os.path.join(fd, "kb.parquet"),
                        columns=["kb_id", "title", "named_entities"])
    ntitle_of = {k: normalize_name(t)
                 for k, t in zip(kbt.column("kb_id").to_pylist(),
                                 kbt.column("title").to_pylist())}
    nes_of = {k: frozenset(normalize_name(x) for x in nes)
              for k, nes in zip(kbt.column("kb_id").to_pylist(),
                                kbt.column("named_entities").to_pylist())}
    nsurf_of = {m: normalize_name(s)
                for m, s in zip(answers.mention_id, answers.surface)}
    conv_names: dict[str, set[str]] = {}
    for m, c in conv_of.items():
        conv_names.setdefault(c, set()).add(nsurf_of[m])
    items = []
    for m, link in kb_link_of.items():
        if not link.startswith("E"):
            continue
        nsurf = nsurf_of[m]
        if ntitle_of.get(link, "") == nsurf:
            continue  # uninteresting: link title IS the query name
        others = conv_names[conv_of[m]] - {nsurf}
        shares = bool(others & nes_of.get(link, frozenset()))
        items.append((category_of(link, gold_of.get(m, "")), shares))
    for cat, d in sorted(shared_ne_crosstab(items).items()):
        for field in ("total", "shared"):
            if d[field] > 0:
                rows.append((f"ne_share:{cat}:{field}", float(d[field])))

    pf = pairwise_f1(cluster_of, gp)
    b3 = b_cubed(cluster_of, gold_of)
    rows.append(("pairwise_f1", _round_half_away([pf["f1"]], 6)[0]))
    rows.append(("b_cubed_f1", _round_half_away([b3["f1"]], 6)[0]))
    rows.append(("over_clustering", float(over_clustering(cluster_of,
                                                          gold_of))))
    return pd.DataFrame(rows, columns=["metric", "value"])


# ============================================================ multimodal
def q_multimodal_features(sf_dir: str):
    """Binary-column plumbing under the driver contract: assets derived
    from the documents table (payload = utf-8 bytes of text, kind by
    doc_id % 3) -> actor-pool decode/featurize. The decode kernel is
    the honestly-stubbed boundary (el/ops/multimodal.py) whose
    deterministic fake derives dims + a 16-dim feature vector from the
    payload sha256 — which DuckDB replays byte-for-byte, giving this
    surface a FULL SQL oracle."""
    from .ops.multimodal import featurize_assets

    feats = featurize_assets(_doc_assets(sf_dir))

    def flatten(t: pa.Table) -> pa.Table:
        # driver-friendly flat layout: first 4 feature dims as scalars
        feat = t.column("feat").to_pylist()
        out = t.select(["asset_id", "kind", "width", "height", "frames"])
        for i in range(4):
            out = out.append_column(
                f"f{i}",
                pa.array(_round_half_away([f[i] for f in feat], 6),
                         pa.float64()),
            )
        return out

    return feats.map_batches(flatten, batch_format="pyarrow")


def _doc_assets(sf_dir: str):
    """Assets derived from documents (the multimodal_features recipe):
    payload = utf-8 text bytes, kind by doc_id % 3."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    kinds = ["image", "audio", "video"]

    def to_assets(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return pa.table({
            "asset_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in ids], pa.string()),
            "payload": pa.array(
                [s.encode("utf-8") for s in t.column("text").to_pylist()],
                pa.binary()),
            "meta": pa.array(['{"codec":"utf8"}'] * len(ids), pa.string()),
        })

    return docs.map_batches(to_assets, batch_format="pyarrow")


def q_frame_sample(sf_dir: str):
    """Frame sampling over binary assets: up to 8 evenly-strided frames
    per asset, one row per sampled frame with a 4-dim frame feature.
    Frame decode is the stubbed boundary; the deterministic fake
    (sha256(payload:frame_idx)) gives this a full SQL oracle."""
    from .ops.multimodal import sample_frames

    return sample_frames(_doc_assets(sf_dir), max_frames=8)


def q_image_resize(sf_dir: str):
    """Aspect-preserving resize of image assets into a 224x224 box:
    integer-exact geometry + the stubbed resample boundary (md5
    fingerprint of the fake resized payload)."""
    from .ops.multimodal import resize_images

    return resize_images(_doc_assets(sf_dir), target=224)


# ============================================================ relational
def q_events_anomaly(sf_dir: str):
    """Trailing-window z-score anomaly screen over hourly event-type
    counts: for each (event_type, hour) bucket with 6 PRECEDING
    observed hourly buckets, z = (c - mean_prev6) / std_prev6 — the
    streaming burst detector run over operational event feeds.

    Exactness contract: window sums s = sum(prev6 c) and ss =
    sum(prev6 c^2) are exact int64; variance uses the explicit
    integer-numerator sample formula (w*ss - s*s) / (w*(w-1)) and
    z = (c - s/w) / sqrt(var), written IDENTICALLY on both sides (no
    engine-side STDDEV whose summation order could drift). Flat
    windows (var == 0) emit z = 0.

    Scale shape: per-batch (type, hour) count partials -> one tiny
    (type, hour) exchange merge -> ONE type exchange, in-block hour
    sort + vectorized sliding sums (cumsum diffs). Bucket volume is
    types x hours, never row-scale. Out: (event_type, hour, n, z[6dp])
    for full-window buckets, sorted in-block by hour."""
    from .shuffle import group_blocks

    W = 6
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"event_type": pd.Series(dtype=str),
                                 "hour": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        hour = df["ts"].values.astype("datetime64[h]").astype("int64")
        out = df.assign(hour=hour).groupby(
            ["event_type", "hour"], as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    partials = ev.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"event_type": pd.Series(dtype=str),
                                 "hour": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        out = df.groupby(["event_type", "hour"], as_index=False)["c"] \
            .sum()
        out["c"] = out["c"].astype("int64")
        return out

    buckets = group_blocks(partials, ["event_type", "hour"], merge,
                           batch_format="pandas")

    def zscore(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": str, "hour": "datetime64[us]",
                "n": "int64", "z": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        rows = []
        for et, g in df.groupby("event_type"):
            g = g.sort_values("hour")
            c = g["c"].to_numpy("int64")
            if len(c) <= W:
                continue
            cs = np.concatenate(([0], np.cumsum(c)))
            cs2 = np.concatenate(([0], np.cumsum(c * c)))
            # trailing window [i-W, i) for i >= W
            s = cs[W:-1] - cs[:-W - 1]
            ss = cs2[W:-1] - cs2[:-W - 1]
            cur = c[W:]
            num = W * ss - s * s  # exact int64
            var = num.astype("float64") / float(W * (W - 1))
            mean = s.astype("float64") / float(W)
            with np.errstate(divide="ignore", invalid="ignore"):
                z = np.where(var > 0,
                             (cur.astype("float64") - mean)
                             / np.sqrt(var), 0.0)
            z = np.floor(z * 1e6 + 0.5) / 1e6
            h = g["hour"].to_numpy("int64")[W:]
            rows.append(pd.DataFrame({
                "event_type": et,
                "hour": h.astype("datetime64[h]").astype(
                    "datetime64[us]"),
                "n": cur, "z": z}))
        if not rows:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = pd.concat(rows, ignore_index=True)
        return out.astype({"n": "int64"})

    return group_blocks(buckets, ["event_type"], zscore,
                        batch_format="pandas")


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate: per-batch PRE-AGGREGATION (combiner),
    one hash exchange on (user_id, hour-int), block-local final merge.
    Integer epoch-hours through the shuffle (timestamp keys measured
    ~15x slower through Ray's shuffles), converted back at the end."""
    from .shuffle import group_blocks

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hour = df["ts"].values.astype("datetime64[h]").astype("int64")
        df = df.assign(hour=hour)
        return df.groupby(["user_id", "hour"], as_index=False).agg(
            n=("event_id", "size"), sum_value=("value", "sum")
        )

    partials = ev.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "hour": pd.Series(dtype="datetime64[ns]"),
                                 "n": pd.Series(dtype="int64"),
                                 "sum_value": pd.Series(dtype="float64")})
        out = df.groupby(["user_id", "hour"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )
        out["hour"] = pd.to_datetime(out["hour"], unit="h")
        out["n"] = out["n"].astype("int64")
        out["sum_value"] = _round_half_away(out["sum_value"], 2)
        return out

    return group_blocks(partials, ["user_id", "hour"], merge,
                        batch_format="pandas")


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir: str):
    """PIVOT events into one per-user row with an n_<event_type> count
    column per DECLARED type (the SQL PIVOT IN-list contract — the
    output schema is declared, not discovered). Per-batch crosstab
    partials -> one user_id exchange -> sum merge."""
    import ray.data

    from .ops.relational import pivot_counts

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type", EVENT_TYPES)


def q_event_assoc_rules(sf_dir: str):
    """Market-basket association rules over per-user distinct
    event-type baskets: support / confidence / lift per directed type
    pair (Agrawal-Srikant A-priori at itemset size 2). One user
    exchange; per-block partials bounded by the type vocabulary, not
    the row count."""
    import ray.data

    from .ops.relational import assoc_rules

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"])
    return assoc_rules(ev)


def q_bloom_semijoin(sf_dir: str):
    """Bloom-filter semi-join: orders whose custkey hits the 65536-bit
    k=3 bloom built from high-balance customers (c_acctbal >= 9000) —
    constant-size bitset broadcast instead of a corpus-scale hash-set
    or exchange; the oracle replays the exact bloom (same md5 slices),
    so false positives match bit-for-bit."""
    import ray.data

    from .ops.relational import bloom_semijoin

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal"])
    hi = cust.map_batches(
        lambda df: df[df["c_acctbal"] >= 9000][["c_custkey"]],
        batch_format="pandas")
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"])
    return bloom_semijoin(orders, hi, probe_key="o_custkey",
                          build_key="c_custkey")


def q_orders_yoy(sf_dir: str):
    """Year-over-year revenue growth: total order value per order
    year plus the growth ratio vs the prior year (the time-
    intelligence report next to events_hourly's tumbling windows).
    Streaming per-batch integer-cents partials -> one tiny merge; the
    YoY division is one float op at 6dp, NULL-free (first year
    reports 0). Out: (o_year, revenue, yoy_growth)."""
    import ray.data

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"y": pd.Series(dtype="int64"),
                                 "cents": pd.Series(dtype="int64")})
        y = df["o_orderdate"].to_numpy().astype("datetime64[Y]") \
            .astype("int64") + 1970
        cents = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        out = pd.DataFrame({"y": y, "cents": cents}) \
            .groupby("y", as_index=False)["cents"].sum()
        out["cents"] = out["cents"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_year": "int64", "revenue": "float64",
                "yoy_growth": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("y", as_index=False)["cents"].sum() \
            .sort_values("y").reset_index(drop=True)
        cents = g["cents"].to_numpy("int64")
        prev = np.concatenate(([0], cents[:-1]))
        with np.errstate(divide="ignore", invalid="ignore"):
            yoy = np.where(prev > 0,
                           (cents.astype("float64") - prev) / prev, 0.0)
        return pd.DataFrame({
            "o_year": g["y"].astype("int64").to_numpy(),
            "revenue": np.floor(cents / 100.0 * 100 + 0.5) / 100,
            "yoy_growth": np.floor(yoy * 1e6 + 0.5) / 1e6})

    return (orders.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def q_customer_balance_ntile(sf_dir: str):
    """Equal-frequency decile scoring: NTILE(10) over customers by
    (c_acctbal, c_custkey) global order — one distributed sort, exact
    per-block global offsets (O(num_blocks) driver list), independent
    per-block tile assignment (el/ops/relational.py::global_ntile)."""
    import ray.data

    from .ops.relational import global_ntile

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal"])
    return global_ntile(cust, order_by=["c_acctbal", "c_custkey"],
                        k=10, out_col="decile")


def q_customer_order_gaps(sf_dir: str):
    """Per-customer inter-order cadence: number of orders and the
    median day gap between consecutive orders (customers with >= 2
    orders) — the recency-cadence feature an RFM-style segmentation
    adds next to orders_rfm.

    ONE custkey hash exchange; in-block date sort + vectorized diffs;
    the median of integer day gaps is replayed exactly by the SQL
    median (both average the two middles on even counts). Out:
    (o_custkey, n_orders, median_gap_days)."""
    import ray.data

    from .shuffle import group_blocks

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"])

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_custkey": "int64", "n_orders": "int64",
                "median_gap_days": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        df = df.sort_values(["o_custkey", "o_orderdate"],
                            kind="mergesort")
        day = df["o_orderdate"].to_numpy().astype("datetime64[D]") \
            .astype("int64")
        ck = df["o_custkey"].to_numpy("int64")
        rows = []
        starts = np.flatnonzero(
            np.concatenate(([True], ck[1:] != ck[:-1])))
        ends = np.concatenate((starts[1:], [len(ck)]))
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            g = np.diff(day[s:e])
            rows.append((int(ck[s]), int(e - s), float(np.median(g))))
        if not rows:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return pd.DataFrame(rows, columns=list(cols)) \
            .astype({"o_custkey": "int64", "n_orders": "int64"})

    return group_blocks(orders, ["o_custkey"], gaps,
                        batch_format="pandas")


def q_user_decay_score(sf_dir: str):
    """Recency-weighted activity score per user: each event
    contributes 2^(-age_days / 30) relative to the corpus max
    timestamp (half-life 30 days) — the exponential-decay feature a
    feature store keeps next to raw counts.

    Exactness: the global max timestamp is an exact integer
    (streaming max of epoch-us); each per-event weight is quantized
    to the 1e-9 integer grid, so the per-user sums are exact int64
    regardless of addition order; the published score divides once at
    6dp. Scale shape: one streaming max pass + per-batch quantized
    (user, weight) partials -> ONE user exchange merge. Out:
    (user_id, n_events, decay_score)."""
    import ray.data

    from .shuffle import group_blocks

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    tmax_us = int(np.datetime64(ev.max("ts"), "us").astype("int64"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "q": pd.Series(dtype="int64")})
        tus = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype("int64")
        age_days = (tmax_us - tus).astype("float64") / 86400e6
        # np.power(2., x) and DuckDB pow(2., x) share the libm pow
        # path (np.exp2 may differ in the last ulp)
        w = np.power(2.0, -age_days / 30.0)
        q = np.floor(w * 1e9 + 0.5).astype("int64")
        out = df[["user_id"]].assign(n=np.int64(1), q=q) \
            .groupby("user_id", as_index=False).sum()
        return out.astype({"user_id": "int64", "n": "int64",
                           "q": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_events": "int64",
                "decay_score": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("user_id", as_index=False)[["n", "q"]].sum()
        return pd.DataFrame({
            "user_id": g["user_id"].astype("int64").to_numpy(),
            "n_events": g["n"].astype("int64").to_numpy(),
            "decay_score": np.floor(
                (g["q"].to_numpy("int64") / 1e9) * 1e6 + 0.5) / 1e6})

    return group_blocks(ev.map_batches(partial, batch_format="pandas"),
                        ["user_id"], merge, batch_format="pandas")


def q_events_pareto(sf_dir: str):
    """Concentration (Pareto/Lorenz) analysis of event volume: how
    many of the heaviest users cover 80% of all events, and what share
    of events the top-decile users produce — the skew report a
    capacity planner reads before partitioning by user.

    Exactness: the 80% crossing is the INTEGER predicate
    5 * cum_prev < 4 * N (no float threshold); the decile share is
    one float division at 6dp. Scale shape: per-user counts in one
    exchange; one distributed sort by (count desc, user); per-block
    row/event totals -> exact global offsets (O(num_blocks) driver
    lists, the global_ntile discipline); each block counts its
    crossing rows and decile mass locally; one tiny merge. Out: one
    row (n_users, n_events, users_for_80pct, top_decile_share)."""
    import ray
    import ray.data

    from .shuffle import group_blocks

    ev = _read(sf_dir, "events", ["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        out = df.groupby("user_id", as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        out = df.groupby("user_id", as_index=False)["c"].sum()
        out["c"] = out["c"].astype("int64")
        return out

    per_user = group_blocks(ev.map_batches(partial,
                                           batch_format="pandas"),
                            ["user_id"], merge, batch_format="pandas")

    def neg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["nc"] = -df["c"]
        return df

    sorted_ds = per_user.map_batches(neg, batch_format="pandas") \
        .sort(["nc", "user_id"])
    refs = sorted_ds.to_arrow_refs()

    def block_stats(t: pa.Table):
        c = t.column("c").to_numpy() if t.num_rows else np.array([], "int64")
        return int(len(c)), int(c.sum())

    def block_fold(t: pa.Table, off_rows: int, off_sum: int,
                   n_users: int, n_events: int) -> pa.Table:
        m = (n_users + 9) // 10  # ceil(n/10) top-decile row count
        if t.num_rows == 0:
            return pa.table({"k80": pa.array([0], pa.int64()),
                             "dec": pa.array([0], pa.int64())})
        c = t.column("c").to_numpy().astype("int64")
        cum_prev = off_sum + np.concatenate(([0], np.cumsum(c)[:-1]))
        k80 = int((5 * cum_prev < 4 * n_events).sum())
        rn = off_rows + np.arange(1, len(c) + 1)
        dec = int(c[rn <= m].sum())
        return pa.table({"k80": pa.array([k80], pa.int64()),
                         "dec": pa.array([dec], pa.int64())})

    stats_rem = ray.remote(block_stats)
    stats = ray.get([stats_rem.remote(r) for r in refs]) if refs else []
    n_users = sum(s[0] for s in stats)
    n_events = sum(s[1] for s in stats)
    fold_rem = ray.remote(block_fold)
    outs, orow, osum = [], 0, 0
    for r, (nr, sm) in zip(refs, stats):
        outs.append(fold_rem.remote(r, orow, osum, n_users, n_events))
        orow += nr
        osum += sm
    cols = {"n_users": "int64", "n_events": "int64",
            "users_for_80pct": "int64", "top_decile_share": "float64"}
    if not outs:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in cols.items()})
    parts = ray.data.from_arrow_refs(outs).to_pandas()
    k80 = int(parts["k80"].sum())
    dec = int(parts["dec"].sum())
    share = float(np.floor(dec / n_events * 1e6 + 0.5) / 1e6) \
        if n_events else 0.0
    return pd.DataFrame({
        "n_users": pd.array([n_users], dtype="int64"),
        "n_events": pd.array([n_events], dtype="int64"),
        "users_for_80pct": pd.array([k80], dtype="int64"),
        "top_decile_share": [share]})


def q_events_entropy(sf_dir: str):
    """Per-user Shannon entropy (nats) of the event-type distribution —
    the behavioral-diversity feature next to events_pivot's raw
    counts. Per-batch (user, type) count partials -> ONE user hash
    exchange -> in-block entropy via H = ln(n) - (sum_c c*ln(c))/n
    with each c*ln(c) term quantized to the 1e-9 integer grid
    (cluster_vmeasure's order-free exactness contract). Out:
    (user_id, n_events, n_types, entropy[6dp])."""
    import ray.data

    from .shuffle import group_blocks

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "event_type": pd.Series(dtype=str),
                                 "c": pd.Series(dtype="int64")})
        out = df.groupby(["user_id", "event_type"], as_index=False) \
            .size().rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    partials = ev.map_batches(partial, batch_format="pandas")

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_events": "int64",
                "n_types": "int64", "entropy": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        cells = df.groupby(["user_id", "event_type"],
                           as_index=False)["c"].sum()
        c = cells["c"].to_numpy("float64")
        q = np.floor(c * np.log(c) * 1e9 + 0.5).astype("int64")
        agg = cells.assign(q=q).groupby("user_id").agg(
            n=("c", "sum"), k=("c", "size"), qs=("q", "sum"))
        n = agg["n"].to_numpy("float64")
        h = np.log(n) - (agg["qs"].to_numpy("int64") / 1e9) / n
        return pd.DataFrame({
            "user_id": agg.index.to_numpy("int64"),
            "n_events": agg["n"].to_numpy("int64"),
            "n_types": agg["k"].to_numpy("int64"),
            "entropy": np.floor(h * 1e6 + 0.5) / 1e6})

    return group_blocks(partials, ["user_id"], entropy,
                        batch_format="pandas")


def q_events_running_total(sf_dir: str):
    """Windowed running total: per-user cumulative value sum in strict
    (ts, event_id) order — SUM() OVER (PARTITION BY user ORDER BY ...)
    — same row count as the input, streaming out. One user_id
    exchange, block-local lexsort + offset-corrected cumsum; the sum
    runs in EXACT integer cents (2dp data), so the oracle's
    segment-tree window aggregate replays it independent of addition
    order."""
    import ray.data

    from .ops.relational import running_total

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "value"])
    return running_total(ev)


def q_events_zscore(sf_dir: str):
    """Per-event-type z-score normalization of event values — the ML
    feature-scaling pass: integer-cents moments (one tiny group
    exchange), broadcast stats, streamed row transform (row count
    preserved)."""
    import ray.data

    from .ops.relational import zscore_normalize

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"])
    return zscore_normalize(ev)


def q_events_topk_users(sf_dir: str):
    """Top-3 users per event_type by total value (exact integer
    cents): partial sums -> one (type, user) exchange -> per-partition
    per-type local top-k -> tiny merge. No partition holds a whole
    type's raw rows."""
    import ray.data

    from .ops.relational import group_topk

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "value"])
    return group_topk(ev, k=3)


def q_rollup_pricing(sf_dir: str):
    """ROLLUP(l_returnflag, l_linestatus) revenue + line counts at all
    three levels in ONE corpus pass: finest-level integer-cents
    partials per batch (bounded by flag x status cardinality, not
    rows), one tiny final merge where the flag subtotals and the grand
    total DERIVE from the finest partials — no second pass, no second
    exchange. Rolled-up dimensions carry the 'ALL' sentinel (the data
    domain is single letters, so the sentinel is unambiguous) instead
    of SQL's NULLs. Revenue is exact integer cents x discount units
    (the tpch_q5 convention), so the float appears only at the final
    /10000 + round."""
    import ray.data

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_extendedprice",
                 "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "l_returnflag": pd.Series(dtype=str),
                "l_linestatus": pd.Series(dtype=str),
                "n": pd.Series(dtype="int64"),
                "rev": pd.Series(dtype="int64")})
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        rev = (cents * (100 - disc)).astype("int64")
        return (df[["l_returnflag", "l_linestatus"]]
                .assign(n=1, rev=rev)
                .groupby(["l_returnflag", "l_linestatus"],
                         as_index=False)
                .agg(n=("n", "sum"), rev=("rev", "sum")))

    partials = li.map_batches(partial, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "l_returnflag": pd.Series(dtype=str),
                "l_linestatus": pd.Series(dtype=str),
                "n": pd.Series(dtype="int64"),
                "revenue": pd.Series(dtype="float64")})
        fine = df.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False).agg(n=("n", "sum"),
                                              rev=("rev", "sum"))
        mid = fine.groupby("l_returnflag", as_index=False).agg(
            n=("n", "sum"), rev=("rev", "sum"))
        mid["l_linestatus"] = "ALL"
        top = pd.DataFrame({"l_returnflag": ["ALL"],
                            "l_linestatus": ["ALL"],
                            "n": [fine["n"].sum()],
                            "rev": [fine["rev"].sum()]})
        out = pd.concat([fine, mid, top], ignore_index=True)
        out["n"] = out["n"].astype("int64")
        out["revenue"] = _round_half_away(
            out["rev"].to_numpy() / 10000.0, 2)
        return out[["l_returnflag", "l_linestatus", "n", "revenue"]]

    # finest partials are <= |flags x statuses| rows per batch: one
    # tiny merge task holds all of them at any corpus size
    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def q_hopping_window(sf_dir: str):
    """Hopping-window aggregate (1h window / 15min hop) per event_type:
    combiner explode -> one (event_type, window) exchange."""
    from .ops.windows import hopping_window_agg

    return hopping_window_agg(_read(sf_dir, "events", ["ts", "event_type", "value"]))


def q_hopping_distinct(sf_dir: str):
    """Exact distinct users per (event_type, 1h/15min hopping window):
    the two-exchange distributed COUNT(DISTINCT) — triple-hash
    co-location collapses duplicates, count-partials meet in a tiny
    second exchange."""
    import ray.data

    from .ops.windows import hopping_distinct

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "ts"])
    return hopping_distinct(ev)


def q_weighted_sample(sf_dir: str):
    """Weight-proportional document sample (Efraimidis-Spirakis A-ES
    reservoir, weight = token count): deterministic md5-derived
    uniforms, priority ln(u)/w, global top-200 by priority via local
    top-k + one tiny merge."""
    from .ops.prep import weighted_sample

    return weighted_sample(_read(sf_dir, "documents", ["doc_id", "text"]), k=200)


def q_cohort_retention(sf_dir: str):
    """Cohort retention (day-0/1/7 active users per first-seen-day
    cohort): distinct-day partials -> user exchange (cohort = local
    min) -> count combiner + tiny exchange."""
    import ray.data

    from .ops.windows import cohort_retention

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"])
    return cohort_retention(ev)


def q_kmv_distinct(sf_dir: str):
    """Approximate distinct users per event_type via a KMV
    (k-minimum-values) sketch, k=64: partials ship only each group's k
    smallest md5 value-hashes, so the exchange is O(groups x k) at any
    corpus size. The oracle replays the sketch EXACTLY (DuckDB's
    md5_number_lower is the engine's hash), not just its expectation."""
    import ray.data

    from .ops.sketch import kmv_distinct

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"])
    return kmv_distinct(ev, "event_type", "user_id", k=64)


def q_event_funnel(sf_dir: str):
    """Ordered funnel conversion per user (view -> click -> purchase):
    one hash exchange on user_id, vectorized first-reach scan per
    funnel step. The oracle replays the strict (ts, event_id) tuple
    ordering with per-step row_number windows + row-value
    comparisons."""
    import ray.data

    from .ops.windows import funnel

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"])
    return funnel(ev)


def q_interval_join(sf_dir: str):
    """Range (interval-containment) join: every event matched into its
    containing session window — one tagged-union exchange on user_id,
    block-local merge_asof + end-bound filter (valid because session
    intervals are non-overlapping per user). Oracle is the sessionize
    window idiom + a BETWEEN join."""
    import ray.data

    from .ops.windows import interval_join, sessionize

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"])
    sess = sessionize(ev)
    probe = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"])
    return interval_join(probe, sess)


def q_sessionize(sf_dir: str):
    """Gap-based session windows (streaming windowed-aggregate analog):
    30-minute inactivity gap per user; SQL oracle replays it with the
    gaps-and-islands window idiom."""
    import ray.data

    from .ops.windows import sessionize

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"])
    return sessionize(ev)


def q_sessionize_chunked(sf_dir: str):
    """Same result as q_sessionize through the skew-safe two-phase plan
    (event-scale (user, chunk) exchange + session-scale chain) — the
    oracle is identical; the driver proves plan equivalence."""
    import ray.data

    from .ops.windows import sessionize_chunked

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"])
    return sessionize_chunked(ev)


def q_latest_event_state(sf_dir: str):
    """Snapshot compaction (CDC keep-latest / upsert semantics): one
    row per (user_id, event_type) — the latest by strict (ts,
    event_id) tuple order. Per-batch combiner keeps each key's local
    max, so the exchange moves one row per (batch, key); a tiny
    per-key merge finishes. Oracle: row_number() = 1 descending."""
    import ray.data

    from .shuffle import group_blocks

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"])

    def local_latest(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values(["ts", "event_id"]).groupby(
            ["user_id", "event_type"], as_index=False).tail(1)
        return df.reset_index(drop=True)

    partials = ev.map_batches(local_latest, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = local_latest(df)
        if len(out) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "event_type": pd.Series(dtype=str),
                "event_id": pd.Series(dtype="int64"),
                "ts": pd.Series(dtype="datetime64[us]"),
                "value": pd.Series(dtype="float64")})
        out["value"] = _round_half_away(out["value"], 4)
        return out[["user_id", "event_type", "event_id", "ts", "value"]]

    return group_blocks(partials, ["user_id", "event_type"], finish,
                        batch_format="pandas")


def q_orders_no_recent_lineitem(sf_dir: str):
    """Anti-join: 1997 orders none of whose lineitems shipped within 90
    days of the order date (slow-fulfillment audit). The lineitem side
    pre-aggregates per batch to one (orderkey, min_lag) row, the two
    sides meet in one tagged-union hash exchange, and the block fn
    keeps orders whose matching lineitem set is empty-or-late — the
    NOT EXISTS shape without a driver-side set."""
    import ray.data

    from .shuffle import group_blocks

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"])

    def order_side(df: pd.DataFrame) -> pa.Table:
        df = df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
        return pa.table({
            "okey": pa.array(df["o_orderkey"].astype("int64")),
            "o_orderdate": pa.array(df["o_orderdate"],
                                    pa.timestamp("us")),
            "min_ship": pa.nulls(len(df), pa.timestamp("us")),
            "is_order": pa.array([1] * len(df), pa.int64()),
        })

    def li_side(df: pd.DataFrame) -> pa.Table:
        part = df.groupby("l_orderkey", as_index=False)["l_shipdate"] \
                 .min()
        return pa.table({
            "okey": pa.array(part["l_orderkey"].astype("int64")),
            "o_orderdate": pa.nulls(len(part), pa.timestamp("us")),
            "min_ship": pa.array(part["l_shipdate"], pa.timestamp("us")),
            "is_order": pa.array([0] * len(part), pa.int64()),
        })

    tagged = orders.map_batches(order_side, batch_format="pandas").union(
        li.map_batches(li_side, batch_format="pandas"))

    def keep_unfulfilled(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "o_orderdate": pd.Series(dtype="datetime64[us]")})
        o = df[df["is_order"] == 1]
        if len(o) == 0:
            return empty
        l = (df[df["is_order"] == 0]
             .groupby("okey", as_index=False)["min_ship"].min())
        j = o[["okey", "o_orderdate"]].merge(l, on="okey", how="left")
        cut = j["o_orderdate"] + pd.Timedelta(days=90)
        anti = j["min_ship"].isna() | (j["min_ship"] > cut)
        out = j.loc[anti, ["okey", "o_orderdate"]]
        return pd.DataFrame({
            "o_orderkey": out["okey"].astype("int64"),
            "o_orderdate": out["o_orderdate"],
        }).reset_index(drop=True)

    return group_blocks(tagged, ["okey"], keep_unfulfilled,
                        batch_format="pandas")


def q_click_attribution(sf_dir: str):
    """As-of join (temporal attribution): every click picks the latest
    preceding view by the same user (backward inclusive, LEFT) —
    DuckDB's ASOF LEFT JOIN is the oracle."""
    import ray.data

    from .ops.windows import asof_join

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"])

    def pick(kind):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("event_type"), kind)) \
                    .drop_columns(["event_type"])
        return fn

    clicks = ev.map_batches(pick("click"), batch_format="pyarrow")
    views = ev.map_batches(pick("view"), batch_format="pyarrow") \
              .select_columns(["event_id", "ts", "user_id"])
    return asof_join(clicks, views, by="user_id", on="ts",
                     right_cols={"event_id": "view_event_id",
                                 "ts": "view_ts"})


def q_segment_revenue(sf_dir: str):
    """customer x orders broadcast-hash join (small side via ray.put)
    + grouped aggregate."""
    import ray
    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    seg_of = dict(zip(cust.column("c_custkey").to_pylist(),
                      cust.column("c_mktsegment").to_pylist()))
    ref = ray.put(seg_of)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    class Attach:
        def __init__(self, ref):
            self.seg = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["c_mktsegment"] = df["o_custkey"].map(self.seg)
            return df[["c_mktsegment", "o_totalprice"]]

    joined = orders.map_batches(Attach, fn_constructor_args=(ref,),
                                batch_format="pandas", concurrency=2,
                                num_cpus=0.5)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("o_totalprice", "size"),
            total_price=("o_totalprice", "sum"),
        )

    partials = joined.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"c_mktsegment": pd.Series(dtype=str),
                                 "n_orders": pd.Series(dtype="int64"),
                                 "total_price": pd.Series(dtype="float64")})
        out = df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("n_orders", "sum"), total_price=("total_price", "sum")
        )
        out["n_orders"] = out["n_orders"].astype("int64")
        out["total_price"] = _round_half_away(out["total_price"], 2)
        return out

    from .shuffle import group_blocks

    return group_blocks(partials, ["c_mktsegment"], merge,
                        batch_format="pandas")


def q_orders_topk_revenue(sf_dir: str):
    """TPC-H Q3-flavored 3-table join + top-k: BUILDING-segment
    customers' orders placed before 1998-01-01, revenue from lineitems
    shipped after it, top 10 by revenue.

    Scale shape: the customer set is the one genuinely small side
    (broadcast custkey set); orders and lineitem are both corpus-scale,
    so they meet in a TAGGED-UNION hash exchange on the order key —
    lineitem pre-aggregated per batch (combiner) so the exchange moves
    one row per (batch, orderkey), not one per lineitem. Per-partition
    top-10 then a tiny driver merge."""
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .shuffle import group_blocks

    cutoff = pd.Timestamp("1998-01-01")

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    building = {k for k, s in zip(cust.column("c_custkey").to_pylist(),
                                  cust.column("c_mktsegment").to_pylist())
                if s == "BUILDING"}
    bref = ray.put(building)

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def order_side(df: pd.DataFrame):
        bs = ray.get(bref)
        df = df[(df["o_orderdate"] < cutoff) & df["o_custkey"].isin(bs)]
        n = len(df)
        return pa.table({
            "okey": pa.array(df["o_orderkey"].astype("int64")),
            "o_orderdate": pa.array(df["o_orderdate"],
                                    pa.timestamp("us")),
            "rev": pa.array([0.0] * n, pa.float64()),
            "is_order": pa.array([1] * n, pa.int64()),
        })

    def li_side(df: pd.DataFrame):
        df = df[df["l_shipdate"] > cutoff]
        rev = df["l_extendedprice"] * (1.0 - df["l_discount"])
        part = df.assign(rev=rev).groupby(
            "l_orderkey", as_index=False)["rev"].sum()
        # emit a TYPED all-null o_orderdate (pa.nulls with an explicit
        # timestamp type): an all-NaT pandas column round-trips to an
        # Arrow null-typed column, which makes every lineitem block's
        # schema differ from the order side's and trips Ray's
        # union-schema warning (strict unification would reject it)
        return pa.table({
            "okey": pa.array(part["l_orderkey"].astype("int64")),
            "o_orderdate": pa.nulls(len(part), pa.timestamp("us")),
            "rev": pa.array(part["rev"], pa.float64()),
            "is_order": pa.array([0] * len(part), pa.int64()),
        })

    tagged = orders.map_batches(order_side, batch_format="pandas").union(
        li.map_batches(li_side, batch_format="pandas"))

    def join_topk(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "o_orderdate": pd.Series(dtype="datetime64[us]"),
            "revenue": pd.Series(dtype="float64")})
        if len(df) == 0:
            return empty
        o = df[df["is_order"] == 1]
        l = df[df["is_order"] == 0]
        rev = l.groupby("okey", as_index=False)["rev"].sum()
        j = o[["okey", "o_orderdate"]].merge(rev, on="okey")
        if len(j) == 0:
            return empty
        # round BEFORE the partition cut: the oracle ranks by rounded
        # revenue, and a last-ulp float difference between rounded-tied
        # rows must not decide who survives a partition's 10th place
        j = j.assign(revenue=_round_half_away(j["rev"], 4)).sort_values(
            ["revenue", "o_orderdate", "okey"],
            ascending=[False, True, True]).head(10)
        return pd.DataFrame({"o_orderkey": j["okey"].to_numpy(),
                             "o_orderdate": j["o_orderdate"].to_numpy(),
                             "revenue": j["revenue"].to_numpy()})

    heads = group_blocks(tagged, ["okey"], join_topk,
                         batch_format="pandas")

    def final_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["revenue", "o_orderdate", "o_orderkey"],
                            ascending=[False, True, True]).head(10)
        return pa.Table.from_pandas(df, preserve_index=False)

    # per-partition heads are tiny (<= 10 rows each): one final merge
    import pyarrow as _pa

    parts = [ray.get(r) for r in heads.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return ray.data.from_arrow(_pa.table({
            "o_orderkey": _pa.array([], _pa.int64()),
            "o_orderdate": _pa.array([], _pa.timestamp("us")),
            "revenue": _pa.array([], _pa.float64())}))
    cat = _pa.concat_tables([p.select(parts[0].column_names)
                             for p in parts])
    return ray.data.from_arrow(final_topk(cat))


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5-flavored 6-table join: revenue per nation for ASIA
    customers' 1996 orders whose lineitems were also supplied from the
    customer's own nation.

    Scale shape: region/nation/supplier are the genuinely small dims
    (broadcast dicts); customer and orders are both corpus-scale at
    TPC-H proportions, so they meet in tagged-union hash exchange #1
    on custkey -> (orderkey, cust nation); lineitem joins supplier by
    broadcast, pre-aggregates per (orderkey, supp nation) per batch,
    and meets the order side in tagged-union hash exchange #2 on
    orderkey, where cust_nation == supp_nation is a merge key. Revenue
    is summed as EXACT integer (cents x discount units): no
    float-order sensitivity between engine and oracle (int64 is ample
    here; a 100-TB run would widen the accumulator to int128/decimal).
    Output: (n_name, revenue) — 5 rows."""
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .shuffle import group_blocks

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")

    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    rkey = {k for k, n in zip(region.column("r_regionkey").to_pylist(),
                              region.column("r_name").to_pylist())
            if n == "ASIA"}
    nat_name = {}
    asia_nations = set()
    for nk, nn, rk in zip(nation.column("n_nationkey").to_pylist(),
                          nation.column("n_name").to_pylist(),
                          nation.column("n_regionkey").to_pylist()):
        nat_name[nk] = nn
        if rk in rkey:
            asia_nations.add(nk)
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    supp_nat = {k: n for k, n in
                zip(supp.column("s_suppkey").to_pylist(),
                    supp.column("s_nationkey").to_pylist())
                if n in asia_nations}
    asia_ref, supp_ref = ray.put(asia_nations), ray.put(supp_nat)

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def cust_side(df: pd.DataFrame) -> pa.Table:
        asia = ray.get(asia_ref)
        df = df[df["c_nationkey"].isin(asia)]
        n = len(df)
        return pa.table({
            "ckey": pa.array(df["c_custkey"].astype("int64")),
            "okey": pa.nulls(n, pa.int64()),
            "nat": pa.array(df["c_nationkey"].astype("int64")),
            "is_cust": pa.array([1] * n, pa.int64()),
        })

    def order_side(df: pd.DataFrame) -> pa.Table:
        df = df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
        n = len(df)
        return pa.table({
            "ckey": pa.array(df["o_custkey"].astype("int64")),
            "okey": pa.array(df["o_orderkey"].astype("int64")),
            "nat": pa.nulls(n, pa.int64()),
            "is_cust": pa.array([0] * n, pa.int64()),
        })

    tagged1 = cust.map_batches(cust_side, batch_format="pandas").union(
        orders.map_batches(order_side, batch_format="pandas"))

    def join1(df: pd.DataFrame) -> pa.Table:
        c = df[df["is_cust"] == 1]
        o = df[df["is_cust"] == 0]
        j = o[["ckey", "okey"]].merge(c[["ckey", "nat"]], on="ckey")
        return pa.table({
            "okey": pa.array(j["okey"].astype("int64")),
            "nat": pa.array(j["nat"].astype("int64")),
            "rev": pa.array([0] * len(j), pa.int64()),
            "is_order": pa.array([1] * len(j), pa.int64()),
        })

    order_nat = group_blocks(tagged1, ["ckey"], join1,
                             batch_format="pandas")

    def li_side(df: pd.DataFrame) -> pa.Table:
        sn = ray.get(supp_ref)
        nat = df["l_suppkey"].map(sn)
        df = df.assign(nat=nat)[nat.notna()]
        # exact integer revenue: cents x (100 - discount units); both
        # factors are half-away roundings of 2dp-exact doubles, so the
        # product and its sums carry no float-order sensitivity
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        rev_f = cents * (100 - disc)
        # float64 products are integer-exact below 2^53; past that the
        # cents representation itself would be lossy — fail loudly
        # rather than silently rounding (the documented int64 envelope;
        # a 100-TB run widens to int128/decimal)
        if len(rev_f) and np.max(np.abs(rev_f)) >= 2.0**53:
            raise OverflowError(
                "tpch_q5: per-line revenue exceeds the float64 "
                "integer-exact envelope (2^53); widen to decimal")
        rev = rev_f.astype("int64")
        part = (df.assign(rev=rev)
                .groupby(["l_orderkey", "nat"], as_index=False)["rev"]
                .sum())
        return pa.table({
            "okey": pa.array(part["l_orderkey"].astype("int64")),
            "nat": pa.array(part["nat"].astype("int64")),
            "rev": pa.array(part["rev"].astype("int64")),
            "is_order": pa.array([0] * len(part), pa.int64()),
        })

    tagged2 = order_nat.union(li.map_batches(li_side,
                                             batch_format="pandas"))

    def join2(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["is_order"] == 1]
        l = df[df["is_order"] == 0]
        # cust_nation == supp_nation is part of the merge key
        j = o[["okey", "nat"]].merge(l[["okey", "nat", "rev"]],
                                     on=["okey", "nat"])
        part = j.groupby("nat", as_index=False)["rev"].sum()
        # loud int64-envelope guard on the per-group partials (the sum
        # above wraps silently in numpy past 2^63): headroom of 2^62
        # still leaves room for the final cross-partition merge
        if len(part) and part["rev"].abs().max() >= 2**62:
            raise OverflowError(
                "tpch_q5: per-nation partial revenue past the int64 "
                "headroom (2^62); widen the accumulator to decimal")
        return pd.DataFrame({"nat": part["nat"].astype("int64"),
                             "rev": part["rev"].astype("int64")})

    heads = group_blocks(tagged2, ["okey"], join2, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"n_name": pd.Series(dtype=str),
                                 "revenue": pd.Series(dtype="float64")})
        agg = df.groupby("nat", as_index=False)["rev"].sum()
        return pd.DataFrame({
            "n_name": agg["nat"].map(nat_name),
            "revenue": _round_half_away(
                agg["rev"].to_numpy() / 10000.0, 2),
        })

    # per-partition heads are <= 25 rows each: one tiny final merge
    return heads.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-flavored grouped aggregate with column pruning at the
    read and per-batch partial aggregation."""
    import ray.data

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            revenue=df["l_extendedprice"] * (1.0 - df["l_discount"]), one=1
        )
        return df.groupby("l_returnflag", as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base=("l_extendedprice", "sum"),
            revenue=("revenue", "sum"),
            n_rows=("one", "sum"),
        )

    partials = li.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"l_returnflag": pd.Series(dtype=str),
                                 "sum_qty": pd.Series(dtype="float64"),
                                 "sum_base": pd.Series(dtype="float64"),
                                 "revenue": pd.Series(dtype="float64"),
                                 "n_rows": pd.Series(dtype="int64")})
        out = df.groupby("l_returnflag", as_index=False).agg(
            sum_qty=("sum_qty", "sum"), sum_base=("sum_base", "sum"),
            revenue=("revenue", "sum"), n_rows=("n_rows", "sum"),
        )
        out["sum_qty"] = _round_half_away(out["sum_qty"], 2)
        out["sum_base"] = _round_half_away(out["sum_base"], 2)
        out["revenue"] = _round_half_away(out["revenue"], 4)
        out["n_rows"] = out["n_rows"].astype("int64")
        return out

    from .shuffle import group_blocks

    return group_blocks(partials, ["l_returnflag"], merge,
                        batch_format="pandas")


# ================================================================ oracle
def _multimodal_sql() -> str:
    """Oracle for multimodal_features: replays the deterministic fake
    decode (el/ops/multimodal.py::_fake_decode) in SQL — DuckDB's
    sha256(VARCHAR) hashes the utf-8 bytes, exactly the asset payload;
    hex digits parse to byte values via strpos arithmetic."""
    hexd = "0123456789abcdef"

    def byte(i: int) -> str:
        return (f"((strpos('{hexd}', substr(h, {2 * i + 1}, 1)) - 1) * 16"
                f" + strpos('{hexd}', substr(h, {2 * i + 2}, 1)) - 1)")

    feats = ",\n               ".join(
        f"{_roundsql(byte(i) + ' / 255.0', 6)} AS f{i}" for i in range(4))
    return f"""
        WITH a AS (
            SELECT doc_id AS asset_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image'
                        WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   sha256(text) AS h
            FROM documents
        )
        SELECT asset_id, kind,
               CASE WHEN kind = 'audio' THEN 0
                    ELSE 64 + {byte(0)} END AS width,
               CASE WHEN kind = 'audio' THEN 0
                    ELSE 64 + {byte(1)} END AS height,
               CASE kind WHEN 'image' THEN 1
                    WHEN 'audio' THEN 100 + {byte(2)}
                    ELSE 24 + {byte(3)} END AS frames,
               {feats}
        FROM a
    """


def _source_mix_sql() -> str:
    """Oracle for source_mix: the per-source hex thresholds are
    generated by the SAME Python helper the engine uses, and compared
    as fixed-width lowercase hex strings (exactly the engine's rule)."""
    from .ops.prep import _hex8_threshold

    whens = "\n".join(
        f"WHEN '{s}' THEN {'TRUE' if r >= 1.0 else repr(_hex8_threshold(r)) + ' > h'}"
        for s, r in sorted(_SOURCE_MIX_RATES.items()))
    default = (f"'{_hex8_threshold(_SOURCE_MIX_DEFAULT)}' > h"
               if _SOURCE_MIX_DEFAULT < 1.0 else "TRUE")
    return f"""
        WITH k AS (
            SELECT doc_id, source,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
            FROM documents
        )
        SELECT doc_id, source FROM k
        WHERE CASE source
              {whens}
              ELSE {default}
              END
    """


def _cities_sql() -> str:
    """Gazetteer city surfaces as a SQL IN-list (generated from the
    same Python module the engine uses)."""
    from .gazetteer import CITIES

    return ", ".join(repr(c) for c in sorted(CITIES))


def _hexbyte(col: str, i: int) -> str:
    """SQL for byte i of a lowercase hex digest column."""
    hexd = "0123456789abcdef"
    return (f"((strpos('{hexd}', substr({col}, {2 * i + 1}, 1)) - 1) * 16"
            f" + strpos('{hexd}', substr({col}, {2 * i + 2}, 1)) - 1)")


def _frame_sample_sql() -> str:
    """Oracle for frame_sample: replays the fake decode's frame count
    (el/ops/multimodal.py::_fake_decode) and the per-frame feature
    sha256(payload:frame_idx) in SQL."""
    feats = ",\n               ".join(
        f"{_roundsql(_hexbyte('h2', j) + ' / 255.0', 6)} AS f{j}"
        for j in range(4))
    return f"""
        WITH a AS (
            SELECT doc_id AS asset_id, text,
                   CASE doc_id % 3 WHEN 0 THEN 'image'
                        WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   sha256(text) AS h
            FROM documents
        ),
        fr AS (
            SELECT asset_id, text,
                   CASE kind WHEN 'image' THEN 1
                        WHEN 'audio' THEN 100 + {_hexbyte('h', 2)}
                        ELSE 24 + {_hexbyte('h', 3)} END AS frames
            FROM a
        ),
        s AS (
            SELECT asset_id, text,
                   unnest(generate_series(0, frames - 1,
                       greatest(1, (frames + 7) // 8))) AS frame_idx
            FROM fr
        ),
        hashed AS (
            SELECT asset_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                   sha256(text || ':' || CAST(frame_idx AS VARCHAR)) AS h2
            FROM s
        )
        SELECT asset_id, frame_idx,
               {feats}
        FROM hashed
    """


def _image_resize_sql() -> str:
    """Oracle for image_resize: integer-exact aspect-fit geometry + the
    md5 fingerprint of the fake resized payload."""
    return f"""
        WITH a AS (
            SELECT doc_id AS asset_id, text, sha256(text) AS h
            FROM documents WHERE doc_id % 3 = 0
        ),
        d AS (
            SELECT asset_id, text,
                   64 + {_hexbyte('h', 0)} AS w,
                   64 + {_hexbyte('h', 1)} AS h2
            FROM a
        )
        SELECT asset_id,
               CAST(w AS INT) AS width,
               CAST(h2 AS INT) AS height,
               CAST(w * 224 // greatest(w, h2) AS INT) AS out_width,
               CAST(h2 * 224 // greatest(w, h2) AS INT) AS out_height,
               md5(text || ':' || CAST(w * 224 // greatest(w, h2) AS VARCHAR)
                   || 'x' || CAST(h2 * 224 // greatest(w, h2) AS VARCHAR))
                   AS resized_fp
        FROM d
    """


def _doc_entities_sql(gm: str) -> str:
    """Oracle for el_doc_entities: replays el.mentions.type_surface,
    el.alias._doc_lists (global first-occurrence dedup + per-kind
    filters) and gazetteer state expansion in ANSI SQL. The gazetteer /
    suffix constants are generated from the same Python modules the
    engine uses."""
    from . import gazetteer
    from .mentions import ORG_SUFFIXES

    states_vals = ", ".join(
        f"('{a}', '{f}')" for a, f in sorted(gazetteer.STATES.items())
    )
    city_vals = ", ".join(
        f"('{c}', '{s}')" for c, s in sorted(gazetteer.CITY_STATE.items())
    )
    suffixes = ", ".join(f"'{s}'" for s in sorted(ORG_SUFFIXES))
    cities = ", ".join(f"'{c}'" for c in sorted(gazetteer.CITY_STATE))
    return f"""
        WITH states(abbr, fullname) AS (VALUES {states_vals}),
        city_state(city, state_full) AS (VALUES {city_vals}),
        first AS (
            SELECT conv_id, surface, turn_idx, beg FROM {gm}
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, surface ORDER BY turn_idx, beg) = 1
        ),
        typed AS (
            SELECT conv_id, surface, turn_idx, beg,
                   len(string_split(surface, ' ')) AS ntok,
                   (length(surface) >= 2 AND surface = upper(surface)
                    AND regexp_full_match(surface, '[A-Za-z]+')) AS is_acr,
                   position(', ' IN surface) > 0 AS has_comma,
                   list_extract(string_split(surface, ', '),
                       len(string_split(surface, ', '))) AS tail
            FROM first
        ),
        ner AS (
            SELECT *,
                CASE
                  WHEN is_acr THEN 'ORG'
                  WHEN has_comma THEN
                    CASE WHEN upper(tail) IN (SELECT abbr FROM states)
                              OR tail IN (SELECT fullname FROM states)
                         THEN 'GPE' ELSE 'ORG' END
                  WHEN ntok = 1 THEN
                    CASE WHEN surface IN ({cities}) THEN 'GPE' ELSE 'PER' END
                  WHEN lower(list_extract(string_split(surface, ' '), ntok))
                       IN ({suffixes}) THEN 'ORG'
                  WHEN ntok = 2 THEN 'PER'
                  ELSE 'ORG'
                END AS ner_type
            FROM typed
        ),
        cls AS (
            SELECT conv_id, turn_idx, beg,
                CASE
                  WHEN ner_type = 'PER' AND ntok >= 2 THEN 'pers'
                  WHEN ner_type = 'ORG' AND NOT is_acr AND ntok >= 2
                       THEN 'orgs'
                  WHEN ner_type = 'GPE' AND has_comma THEN 'locs'
                END AS kind,
                CASE WHEN ner_type = 'GPE' AND has_comma THEN
                    COALESCE((
                        SELECT array_to_string(list_slice(
                                   string_split(ner.surface, ', '), 1,
                                   len(string_split(ner.surface, ', ')) - 1),
                                   ', ')
                               || ', ' || s.fullname
                        FROM states s JOIN city_state cs
                          ON cs.state_full = s.fullname
                        WHERE s.abbr = upper(ner.tail)
                          AND cs.city = array_to_string(list_slice(
                                  string_split(ner.surface, ', '), 1,
                                  len(string_split(ner.surface, ', ')) - 1),
                                  ', ')
                    ), surface)
                ELSE surface END AS out_surface
            FROM ner
        )
        SELECT conv_id, kind,
               row_number() OVER (PARTITION BY conv_id, kind
                                  ORDER BY turn_idx, beg) AS rank,
               out_surface AS surface
        FROM cls WHERE kind IS NOT NULL
    """


# Planted-near-dup corpus + word-3-gram shingles, shared by the
# ngram_jaccard / minhash_dedup oracles (mirrors _planted_dups +
# el.ops.dedup.word_shingles).
_PLANTED_SHINGLES_CTE = """clones AS (
                SELECT doc_id + 1000000 AS doc_id,
                       array_to_string(list_slice(string_split(text, ' '), 1,
                           greatest(len(string_split(text, ' ')) - 2, 0)),
                           ' ') AS text
                FROM documents WHERE doc_id % 5 = 0
            ),
            docs AS (
                SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id, text FROM clones
            ),
            toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM docs),
            sh AS (
                SELECT DISTINCT doc_id, s FROM (
                    SELECT doc_id,
                           unnest(list_transform(range(len(tk) - 2),
                               i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                           )) AS s
                    FROM toks WHERE len(tk) >= 3
                    UNION ALL
                    SELECT doc_id, array_to_string(tk, ' ') AS s
                    FROM toks
                    WHERE len(tk) < 3 AND array_to_string(tk, ' ') != ''
                )
            )"""


# Curation corpus (_curation_corpus): the planted near-dups PLUS exact
# clones, with the same word-3-gram shingles.
_CURATION_SHINGLES_CTE = """nclones AS (
                SELECT doc_id + 1000000 AS doc_id,
                       array_to_string(list_slice(string_split(text, ' '), 1,
                           greatest(len(string_split(text, ' ')) - 2, 0)),
                           ' ') AS text
                FROM documents WHERE doc_id % 5 = 0
            ),
            eclones AS (
                SELECT doc_id + 2000000 AS doc_id, text
                FROM documents WHERE doc_id % 7 = 0
            ),
            docs AS (
                SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id, text FROM nclones
                UNION ALL SELECT doc_id, text FROM eclones
            ),
            toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM docs),
            sh AS (
                SELECT DISTINCT doc_id, s FROM (
                    SELECT doc_id,
                           unnest(list_transform(range(len(tk) - 2),
                               i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                           )) AS s
                    FROM toks WHERE len(tk) >= 3
                    UNION ALL
                    SELECT doc_id, array_to_string(tk, ' ') AS s
                    FROM toks
                    WHERE len(tk) < 3 AND array_to_string(tk, ' ') != ''
                )
            )"""


def _lsh_planes_values(nbits: int = 12, dim: int = 64, seed: int = 5) -> str:
    """The lsh_topk hyperplanes (seeded PCG64 standard normals) as SQL
    VALUES rows (i, plane-list literal); repr round-trips float64."""
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((nbits, dim))
    return ", ".join(
        "({}, [{}])".format(i, ", ".join(repr(v) for v in row))
        for i, row in enumerate(planes)
    )


def _ivf_centroid_values(n_clusters: int = 16, seed: int = 5,
                         sample_n: int = 256) -> str:
    """The ivf_topk centroids as SQL VALUES rows (c_id, vector
    literal). The fit itself is NOT SQL-expressible (8 Lloyd
    iterations), so — exactly like ``_lsh_planes_values`` — the
    deterministic constants are embedded and the SQL independently
    replays the distributed part (assignment, probing, top-k).
    ``ivf_fit_sample`` is the same function the engine calls, over the
    same md5-ranked sample of the same table, so the literals are
    bit-identical float64 (repr round-trips). Pinned to the driver's
    sf0.01 embeddings table, like FIXTURE_SQL_DIR pins the el_*
    oracles to fixture t2."""
    import pyarrow.parquet as pq

    from .ops.ann import ivf_fit_sample

    df = pq.read_table(
        os.path.join(ORACLE_SF_DIR, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).to_pandas()
    C = ivf_fit_sample(df, sample_n, n_clusters, seed)
    return ", ".join(
        "({}, [{}])".format(i, ", ".join(repr(v) for v in row))
        for i, row in enumerate(C)
    )


def _pagerank_sql() -> str:
    """comention_pagerank oracle: rebuild the undirected co-mention
    graph, then replay FIVE UNROLLED PageRank iterations in pure
    integer arithmetic (ranks in 1e-12 units, floor divisions) — the
    integer formulation is what makes an iterative algorithm
    hash-exact between the engine's partial-sum order and DuckDB's."""
    gm = f"read_parquet('{FIXTURE_SQL_DIR}/gold_mentions.parquet')"
    head = f"""
        WITH m AS (SELECT DISTINCT conv_id, surface FROM {gm}),
        p AS (SELECT DISTINCT a.surface AS s1, b.surface AS s2
              FROM m a JOIN m b
                ON a.conv_id = b.conv_id AND a.surface < b.surface),
        e AS (SELECT s1 AS src, s2 AS dst FROM p
              UNION ALL SELECT s2 AS src, s1 AS dst FROM p),
        d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
              FROM e GROUP BY src),
        nodes AS (SELECT src AS node FROM d),
        r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r
               FROM nodes)"""
    its = []
    for i in range(1, 6):
        its.append(f""",
        c{i} AS (SELECT e.dst AS node, sum(r.r // d.deg) AS s
                 FROM e JOIN d USING (src)
                 JOIN r{i - 1} r ON r.node = e.src
                 GROUP BY e.dst),
        -- LEFT JOIN over the node table: a node with no in-edges
        -- keeps the teleport base (and its own out-contributions)
        -- every iteration; sum(BIGINT) widens to HUGEINT, cast back
        -- so the result column stays int64 like the engine
        r{i} AS (SELECT n.node,
                        CAST(150000000000
                             + 85 * coalesce(c.s, 0) // 100
                             AS BIGINT) AS r
                 FROM nodes n LEFT JOIN c{i} c USING (node))""")
    return (head + "".join(its)
            + "\n        SELECT node, r AS rank_units FROM r5")


def _kcore_sql(k: int = 3, rounds: int = 3) -> str:
    """comention_kcore oracle: the undirected co-mention graph, then
    ``rounds`` UNROLLED prune iterations — drop every edge with an
    endpoint of current degree < k — pure integer counts so the hash
    is exact between the engine's exchanges and DuckDB."""
    gm = f"read_parquet('{FIXTURE_SQL_DIR}/gold_mentions.parquet')"
    head = f"""
        WITH m AS (SELECT DISTINCT conv_id, surface FROM {gm}),
        e0 AS (SELECT DISTINCT a.surface AS s1, b.surface AS s2
               FROM m a JOIN m b
                 ON a.conv_id = b.conv_id AND a.surface < b.surface)"""
    its = []
    for i in range(1, rounds + 1):
        its.append(f""",
        d{i} AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM
                 (SELECT s1 AS node FROM e{i - 1}
                  UNION ALL SELECT s2 AS node FROM e{i - 1})
                 GROUP BY node),
        e{i} AS (SELECT e.s1, e.s2 FROM e{i - 1} e
                 JOIN d{i} x ON x.node = e.s1 AND x.d >= {k}
                 JOIN d{i} y ON y.node = e.s2 AND y.d >= {k})""")
    return (head + "".join(its) + f"""
        SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
        (SELECT s1 AS node FROM e{rounds}
         UNION ALL SELECT s2 AS node FROM e{rounds})
        GROUP BY node""")


def _hits_sql(iters: int = 2) -> str:
    """comention_hits oracle: the DIRECTED co-mention graph (s1 < s2
    orientation), then ``iters`` UNROLLED integer HITS iterations —
    a0 = 1, h_k(u) = sum a_{k-1}(dst), a_k(v) = sum h_k(src) — pure
    int64 sums so the hash is exact between the engine's partial-sum
    exchanges and DuckDB (sum widens to HUGEINT, cast back)."""
    gm = f"read_parquet('{FIXTURE_SQL_DIR}/gold_mentions.parquet')"
    head = f"""
        WITH m AS (SELECT DISTINCT conv_id, surface FROM {gm}),
        e AS (SELECT DISTINCT a.surface AS src, b.surface AS dst
              FROM m a JOIN m b
                ON a.conv_id = b.conv_id AND a.surface < b.surface),
        nodes AS (SELECT src AS node FROM e
                  UNION SELECT dst AS node FROM e),
        a0 AS (SELECT node, CAST(1 AS BIGINT) AS v FROM nodes)"""
    its = []
    for i in range(1, iters + 1):
        its.append(f""",
        h{i} AS (SELECT n.node, CAST(coalesce(s.s, 0) AS BIGINT) AS v
                 FROM nodes n LEFT JOIN (
                     SELECT e.src AS node, sum(a.v) AS s
                     FROM e JOIN a{i - 1} a ON a.node = e.dst
                     GROUP BY e.src) s USING (node)),
        a{i} AS (SELECT n.node, CAST(coalesce(s.s, 0) AS BIGINT) AS v
                 FROM nodes n LEFT JOIN (
                     SELECT e.dst AS node, sum(h.v) AS s
                     FROM e JOIN h{i} h ON h.node = e.src
                     GROUP BY e.dst) s USING (node))""")
    return (head + "".join(its) + f"""
        SELECT n.node, h.v AS hub_units, a.v AS auth_units
        FROM nodes n
        JOIN h{iters} h USING (node)
        JOIN a{iters} a USING (node)""")


def _pair_features_sql() -> str:
    """el_pair_features oracle: the scorer's own DuckDB feature SQL
    (el/scorer.py _FEATURE_SQL — the ENGINE computes features with
    these exact DuckDB expressions, so the oracle is the same kernel
    run independently over the fixture tables) plus the logit/sigmoid
    with the module weight constants embedded as literals, matching
    the engine's numpy evaluation order term for term."""
    from .scorer import (BOOL_FLOOR, COMMON_SURNAMES, JW_PIVOT, W_COMMON,
                         W_JW, W_JWS, W_OVL)

    norm = NORM_SQL.format(col="surface")
    gm = f"read_parquet('{FIXTURE_SQL_DIR}/gold_mentions.parquet')"
    gp = f"read_parquet('{FIXTURE_SQL_DIR}/gold_pairs.parquet')"
    surnames = ", ".join(f"'{s}'" for s in sorted(COMMON_SURNAMES))
    return f"""
        WITH s AS (SELECT mention_id, {norm} AS nm FROM {gm}),
        n AS (
            SELECT p.m1_id, p.m2_id, s1.nm AS n1, s2.nm AS n2
            FROM {gp} p
            JOIN s s1 ON p.m1_id = s1.mention_id
            JOIN s s2 ON p.m2_id = s2.mention_id
        ),
        t AS (SELECT *, string_split(n1, ' ') AS t1,
                     string_split(n2, ' ') AS t2 FROM n),
        f AS (
            SELECT m1_id, m2_id,
                jaro_winkler_similarity(n1, n2) AS jw_alias,
                -- alias == surface in this surface, so the s1=n1
                -- branch of the kernel's CASE always holds
                jaro_winkler_similarity(n1, n2) AS jw_surface,
                (n1 != n2 AND len(t1) >= 2 AND len(t2) >= 2
                 AND (starts_with(n2, n1 || ' ')
                      OR starts_with(n1, n2 || ' '))) AS prefix2,
                (n1 != n2 AND
                 (position(' ' || n1 || ' ' IN ' ' || n2 || ' ') > 0
                  OR position(' ' || n2 || ' ' IN ' ' || n1 || ' ') > 0))
                    AS contains,
                ((len(t2) >= 2 AND replace(n1, ' ', '') =
                    array_to_string(
                        list_transform(t2, w -> substr(w, 1, 1)), ''))
                 OR (len(t1) >= 2 AND replace(n2, ' ', '') =
                    array_to_string(
                        list_transform(t1, w -> substr(w, 1, 1)), '')))
                    AS abbr,
                CASE WHEN n1 = '' OR n2 = '' THEN 0.0
                     ELSE len(list_intersect(list_distinct(t1),
                                             list_distinct(t2)))
                          / CAST(len(list_distinct(t1 || t2)) AS DOUBLE)
                     END AS tok_overlap,
                (t1[len(t1)] = t2[len(t2)]
                 AND t1[len(t1)] IN ({surnames})) AS common_surname
            FROM t
        ),
        z AS (
            SELECT *,
                CASE WHEN prefix2 OR abbr
                     THEN greatest({W_JW!r} * (jw_alias - {JW_PIVOT!r}),
                                   {BOOL_FLOOR!r})
                     ELSE {W_JW!r} * (jw_alias - {JW_PIVOT!r}) END
                + {W_JWS!r} * (jw_surface - jw_alias)
                + {W_OVL!r} * (tok_overlap - 0.5)
                - {W_COMMON!r} * (CASE WHEN common_surname
                                       THEN 1.0 ELSE 0.0 END) AS zz
            FROM f
        )
        SELECT m1_id, m2_id,
               {_roundsql('jw_alias', 5)} AS jw_alias,
               {_roundsql('jw_surface', 5)} AS jw_surface,
               prefix2, contains, abbr,
               {_roundsql('tok_overlap', 5)} AS tok_overlap,
               common_surname,
               {_roundsql('1.0 / (1.0 + exp(-zz))', 5)} AS score
        FROM z
    """


def _minhash_perms_values() -> str:
    """The MinHasher's seeded universal-hash constants as SQL VALUES
    rows (p, a, b) — embedding them as literals lets DuckDB replay the
    exact signatures (the generator itself is not SQL-expressible)."""
    from .ops.dedup import MinHasher

    mh = MinHasher()
    return ", ".join(
        f"({p}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
        for p, (a, b) in enumerate(zip(mh.a, mh.b))
    )


def _minhash_cte_chain() -> str:
    """shingles -> signatures -> LSH candidates -> co-occurrence +
    sizes, shared by the minhash_dedup and near_dup_resolve oracles
    (the caller appends a final SELECT applying the jaccard
    threshold)."""
    return f"""hs AS (
                SELECT DISTINCT doc_id,
                       md5_number_lower(s)::HUGEINT AS h
                FROM sh
            ),
            perms AS (SELECT * FROM (VALUES {_minhash_perms_values()})
                      AS t(p, a, b)),
            -- ((a*h mod 2^64) + b) mod 2^64 mod M: replays numpy's
            -- wrapping uint64 universal hash bit-for-bit (HUGEINT holds
            -- the 125-bit product)
            vals AS (
                SELECT doc_id, p,
                       min((((a * h) % 18446744073709551616 + b)
                            % 18446744073709551616)
                           % 2305843009213693951) AS v
                FROM hs CROSS JOIN perms
                GROUP BY doc_id, p
            ),
            bands AS (
                SELECT doc_id, p // 4 AS band,
                       string_agg(CAST(v AS VARCHAR), ',' ORDER BY p) AS bkey
                FROM vals GROUP BY doc_id, p // 4
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                FROM bands a
                JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                            AND a.doc_id < b.doc_id
            ),
            co AS (
                SELECT c.d1, c.d2, count(*) AS co
                FROM cand c
                JOIN sh s1 ON s1.doc_id = c.d1
                JOIN sh s2 ON s2.doc_id = c.d2 AND s2.s = s1.s
                GROUP BY 1, 2
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""


def _pca_power_sql(iters: int = 6, final: str | None = None) -> str:
    """Unrolled integer power iteration in HUGEINT — replays
    el/ops/ann.py::pca_power bit-for-bit: M = n*S - m m^T on the 1e-6
    grid, v0 = 1e6, each step w = M v; v' = (w * 1e6) // max|w|
    (DuckDB's // truncates toward zero, matching the engine's
    sign-split trunc division)."""
    chain = """
        WITH e AS (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        ),
        q AS (
            SELECT vec_id, CAST(dim AS BIGINT) AS dim,
                   CAST(CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5)
                        AS BIGINT) AS HUGEINT) AS qv
            FROM e
        ),
        g AS (
            SELECT a.dim AS i, b.dim AS j,
                   sum(a.qv * b.qv) AS s,
                   sum(a.qv) AS mi, sum(b.qv) AS mj,
                   CAST(count(*) AS HUGEINT) AS n
            FROM q a JOIN q b ON a.vec_id = b.vec_id
            GROUP BY 1, 2
        ),
        mm AS (SELECT i, j, n * s - mi * mj AS mv FROM g),
        v0 AS (SELECT DISTINCT i AS dim, CAST(1000000 AS HUGEINT) AS v
               FROM mm)"""
    prev = "v0"
    for it in range(1, iters + 1):
        chain += f""",
        w{it} AS (
            SELECT mm.i AS dim, sum(mm.mv * {prev}.v) AS w
            FROM mm JOIN {prev} ON {prev}.dim = mm.j
            GROUP BY mm.i
        ),
        n{it} AS (SELECT max(abs(w)) AS mx FROM w{it}),
        v{it} AS (
            SELECT dim, (w * 1000000) // n{it}.mx AS v
            FROM w{it}, n{it}
        )"""
        prev = f"v{it}"
    if final is None:
        final = f"""
        SELECT CAST(dim AS BIGINT) AS dim, CAST(v AS BIGINT) AS v_grid
        FROM {prev}"""
    chain += final
    return chain


def oracle_sql() -> dict[str, str]:
    from .ops.er import (_MONGE_ELKAN_SQL, _TRIGRAM_SIM_SQL,
                         SOFT_TFIDF_THETA)
    from .ops.ann import KMEANS_B, KMEANS_GRID, KMEANS_ITERS, KMEANS_K
    from .ops.sketch import HLL_LC_LIMIT, HLL_M, HLL_MAXRHO, HLL_POW

    # kmeans_assign: unroll the fixed iteration chain — c0 -> a1 -> c1
    # -> ... -> c{I} -> final assignment a{I+1} (same CTE templates the
    # engine mirrors in exact integer math; see kmeans_assign docstring)
    def _km_assign_cte(name: str, cent: str) -> str:
        return f"""{name} AS (
            SELECT vec_id, c FROM (
                SELECT d.vec_id, d.c,
                       row_number() OVER (PARTITION BY d.vec_id
                                          ORDER BY d.d, d.c) AS rn
                FROM (
                    SELECT x.vec_id, {cent}.c,
                           sum((x.v - {cent}.v) * (x.v - {cent}.v)) AS d
                    FROM x JOIN {cent} ON x.i = {cent}.i
                    GROUP BY x.vec_id, {cent}.c
                ) d
            ) WHERE rn = 1
        )"""

    def _km_update_cte(name: str, asg: str) -> str:
        return f"""{name} AS (
            SELECT {asg}.c, x.i,
                   CAST((2 * sum(x.v) + count(*)
                         + 2 * count(*) * {KMEANS_B})
                        // (2 * count(*)) - {KMEANS_B} AS BIGINT) AS v
            FROM x JOIN {asg} USING (vec_id)
            GROUP BY {asg}.c, x.i
        )"""

    _km_ctes = [f"""x AS (
            SELECT vec_id, i - 1 AS i,
                   CAST(floor(v * {KMEANS_GRID} + 0.5) AS BIGINT) AS v
            FROM (SELECT vec_id,
                         unnest(CAST(embedding AS DOUBLE[])) AS v,
                         generate_subscripts(
                             CAST(embedding AS DOUBLE[]), 1) AS i
                  FROM embeddings)
        )""",
        f"""c0 AS (
            SELECT vec_id AS c, i, v FROM x WHERE vec_id < {KMEANS_K}
        )"""]
    for _it in range(1, KMEANS_ITERS + 1):
        _km_ctes.append(_km_assign_cte(f"a{_it}", f"c{_it - 1}"))
        _km_ctes.append(_km_update_cte(f"c{_it}", f"a{_it}"))
    _km_ctes.append(_km_assign_cte(f"a{KMEANS_ITERS + 1}",
                                   f"c{KMEANS_ITERS}"))
    kmeans_sql = ("WITH " + ",\n".join(_km_ctes)
                  + f"\nSELECT vec_id, c AS cluster "
                    f"FROM a{KMEANS_ITERS + 1}")
    from .ops.textstats import (GOPHER_MAX_MEAN_LEN, GOPHER_MAX_SYMBOL_RATIO,
                                GOPHER_MAX_TOKENS, GOPHER_MIN_ALPHA_RATIO,
                                GOPHER_MIN_MEAN_LEN, GOPHER_MIN_STOPWORDS,
                                GOPHER_MIN_TOKENS)

    norm = NORM_SQL.format(col="surface")
    gm = f"read_parquet('{FIXTURE_SQL_DIR}/gold_mentions.parquet')"
    gp = f"read_parquet('{FIXTURE_SQL_DIR}/gold_pairs.parquet')"
    tr = f"read_parquet('{FIXTURE_SQL_DIR}/transcripts.parquet/*.parquet')"
    kbt = f"read_parquet('{FIXTURE_SQL_DIR}/kb.parquet')"
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    lang_counts = ", ".join(
        f"len(list_filter(toks, x -> x IN ({', '.join(repr(m) for m in ms)}))) AS c_{lang}"
        for lang, ms in sorted(LANG_MARKERS.items())
    )
    # data-dependent literals: the IVF centroid fit reads the oracle
    # scale's embeddings table; if that table is absent in this
    # environment, omit the entry (rows-only fallback) rather than
    # breaking every other oracle
    try:
        ivf_cent = _ivf_centroid_values()
    except (OSError, FileNotFoundError):
        ivf_cent = None
    sqls = {
        "el_mentions": f"""
            SELECT mention_id, conv_id, turn_idx, beg, "end", surface FROM {gm}
        """,
        "el_cluster_sizes": f"""
            WITH m AS (
                SELECT {norm} AS norm FROM {gm} WHERE {norm} != ''
            ),
            s AS (
                SELECT CAST(count(*) AS BIGINT) AS cluster_size
                FROM m GROUP BY norm
            )
            SELECT cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters
            FROM s GROUP BY cluster_size
            ORDER BY cluster_size
        """,
        "el_exact_cluster": f"""
            SELECT mention_id,
                   min(mention_id) OVER (PARTITION BY {norm}) AS cluster_id
            FROM {gm}
        """,
        "el_block_keys": f"""
            WITH m AS (SELECT mention_id, {norm} AS norm FROM {gm})
            SELECT mention_id, 'n:' || norm AS block_key FROM m WHERE norm != ''
            UNION ALL
            SELECT mention_id,
                   'p:' || substr(split_part(norm, ' ', 1), 1, 6) AS block_key
            FROM m WHERE length(split_part(norm, ' ', 1)) >= 3
        """,
        "el_pair_jw": f"""
            WITH s AS (SELECT mention_id, {norm} AS norm FROM {gm})
            SELECT p.m1_id, p.m2_id,
                   {_roundsql('jaro_winkler_similarity(s1.norm, s2.norm)', 5)} AS jw
            FROM {gp} p
            JOIN s s1 ON p.m1_id = s1.mention_id
            JOIN s s2 ON p.m2_id = s2.mention_id
        """,
        "el_pair_features": _pair_features_sql(),
        "el_jw_components": f"""
            WITH RECURSIVE s AS (
                SELECT mention_id, {norm} AS norm FROM {gm}
            ),
            e AS (
                SELECT p.m1_id AS a, p.m2_id AS b
                FROM {gp} p
                JOIN s s1 ON p.m1_id = s1.mention_id
                JOIN s s2 ON p.m2_id = s2.mention_id
                WHERE {_roundsql('jaro_winkler_similarity(s1.norm, s2.norm)', 5)} >= 0.92
            ),
            und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
            reach(node, lab) AS (
                SELECT a, a FROM und
                UNION
                SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
            ),
            canon AS (
                SELECT node, min(lab) AS component FROM reach GROUP BY node
            )
            SELECT m.mention_id,
                   COALESCE(c.component, m.mention_id) AS component
            FROM {gm} m LEFT JOIN canon c ON c.node = m.mention_id
        """,
        "el_sorted_neighborhood": f"""
            WITH s AS (
                SELECT mention_id, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            r AS (
                SELECT mention_id,
                       row_number() OVER (ORDER BY norm, mention_id) AS rn
                FROM s
            )
            SELECT a.mention_id AS m1_id, b.mention_id AS m2_id,
                   b.rn - a.rn AS dist
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn < a.rn + 4
        """,
        "el_metablocking": f"""
            WITH m AS (SELECT mention_id, {norm} AS norm FROM {gm}),
            k AS (
                SELECT mention_id, 'n:' || norm AS bk
                FROM m WHERE norm != ''
                UNION ALL
                SELECT mention_id,
                       'p:' || substr(split_part(norm, ' ', 1), 1, 6) AS bk
                FROM m WHERE length(split_part(norm, ' ', 1)) >= 3
            )
            SELECT a.mention_id AS m1_id, b.mention_id AS m2_id,
                   count(*) AS cbs
            FROM k a JOIN k b ON a.bk = b.bk
                     AND a.mention_id < b.mention_id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "el_blocking_quality": f"""
            WITH m AS (
                SELECT mention_id, gold_kb_id, {norm} AS norm FROM {gm}
            ),
            k AS (
                SELECT mention_id, gold_kb_id, 'n:' || norm AS bk
                FROM m WHERE norm != ''
                UNION ALL
                SELECT mention_id, gold_kb_id,
                       'p:' || substr(split_part(norm, ' ', 1), 1, 6) AS bk
                FROM m WHERE length(split_part(norm, ' ', 1)) >= 3
            ),
            cand AS (
                SELECT DISTINCT a.mention_id AS m1, b.mention_id AS m2,
                       a.gold_kb_id AS g1, b.gold_kb_id AS g2
                FROM k a JOIN k b ON a.bk = b.bk
                         AND a.mention_id < b.mention_id
            ),
            c AS (
                SELECT CAST(count(*) AS BIGINT) AS cand,
                       CAST(count(*) FILTER (g1 = g2) AS BIGINT) AS tp
                FROM cand
            ),
            mm AS (
                SELECT CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS matching
                FROM (SELECT count(*) AS cnt FROM {gm}
                      GROUP BY gold_kb_id)
            ),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {gm})
            SELECT nn.n AS n_mentions, c.cand AS candidate_pairs,
                   mm.matching AS matching_pairs, c.tp AS tp_pairs,
                   {_roundsql('CAST(c.tp AS DOUBLE) / mm.matching', 6)}
                       AS pairs_completeness,
                   {_roundsql('1.0 - CAST(c.cand AS DOUBLE) / (CAST(nn.n AS DOUBLE) * (nn.n - 1) / 2)', 6)}
                       AS reduction_ratio,
                   {_roundsql('CAST(c.tp AS DOUBLE) / c.cand', 6)}
                       AS pairs_quality
            FROM c, mm, nn
        """,
        "el_snb_quality": f"""
            WITH s AS (
                SELECT mention_id, gold_kb_id, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            r AS (
                SELECT mention_id, gold_kb_id,
                       row_number() OVER (ORDER BY norm, mention_id) AS rn
                FROM s
            ),
            c AS (
                SELECT CAST(count(*) AS BIGINT) AS cand,
                       CAST(count(*) FILTER (a.gold_kb_id = b.gold_kb_id)
                            AS BIGINT) AS tp
                FROM r a JOIN r b ON b.rn > a.rn AND b.rn < a.rn + 4
            ),
            mm AS (
                SELECT CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS matching
                FROM (SELECT count(*) AS cnt FROM {gm}
                      GROUP BY gold_kb_id)
            ),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {gm})
            SELECT nn.n AS n_mentions, c.cand AS candidate_pairs,
                   mm.matching AS matching_pairs, c.tp AS tp_pairs,
                   {_roundsql('CAST(c.tp AS DOUBLE) / mm.matching', 6)}
                       AS pairs_completeness,
                   {_roundsql('1.0 - CAST(c.cand AS DOUBLE) / (CAST(nn.n AS DOUBLE) * (nn.n - 1) / 2)', 6)}
                       AS reduction_ratio,
                   {_roundsql('CAST(c.tp AS DOUBLE) / c.cand', 6)}
                       AS pairs_quality
            FROM c, mm, nn
        """,
        "el_rare_token_quality": f"""
            WITH m AS (
                SELECT mention_id, gold_kb_id, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            tok AS (
                SELECT DISTINCT mention_id, t FROM (
                    SELECT mention_id,
                           unnest(str_split(norm, ' ')) AS t
                    FROM m
                )
            ),
            tdf AS (
                SELECT t, CAST(count(*) AS BIGINT) AS n
                FROM tok GROUP BY t
            ),
            r AS (
                SELECT tok.mention_id, tok.t,
                       row_number() OVER (
                           PARTITION BY tok.mention_id
                           ORDER BY tdf.n, tok.t
                       ) AS rn
                FROM tok JOIN tdf ON tdf.t = tok.t
            ),
            k AS (
                SELECT m.mention_id, m.gold_kb_id, 'r:' || r.t AS bk
                FROM r JOIN m ON m.mention_id = r.mention_id
                WHERE r.rn = 1
            ),
            c AS (
                SELECT CAST(COALESCE(sum(nk * (nk - 1) // 2), 0)
                            AS BIGINT) AS cand
                FROM (SELECT count(*) AS nk FROM k GROUP BY bk)
            ),
            tpv AS (
                SELECT CAST(COALESCE(sum(cg * (cg - 1) // 2), 0)
                            AS BIGINT) AS tp
                FROM (SELECT count(*) AS cg FROM k
                      GROUP BY bk, gold_kb_id)
            ),
            mm AS (
                SELECT CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS matching
                FROM (SELECT count(*) AS cnt FROM {gm}
                      GROUP BY gold_kb_id)
            ),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {gm})
            SELECT nn.n AS n_mentions, c.cand AS candidate_pairs,
                   mm.matching AS matching_pairs, tpv.tp AS tp_pairs,
                   {_roundsql('CAST(tpv.tp AS DOUBLE) / mm.matching', 6)}
                       AS pairs_completeness,
                   {_roundsql('1.0 - CAST(c.cand AS DOUBLE) / (CAST(nn.n AS DOUBLE) * (nn.n - 1) / 2)', 6)}
                       AS reduction_ratio,
                   {_roundsql('CAST(tpv.tp AS DOUBLE) / c.cand', 6)}
                       AS pairs_quality
            FROM c, tpv, mm, nn
        """,
        "el_fs_weights": f"""
            WITH s AS (SELECT mention_id, {norm} AS norm FROM {gm}),
            p AS (
                SELECT gp.same_entity, s1.norm AS n1, s2.norm AS n2
                FROM {gp} gp
                JOIN s s1 ON gp.m1_id = s1.mention_id
                JOIN s s2 ON gp.m2_id = s2.mention_id
            ),
            f AS (
                SELECT 'exact' AS feature, (n1 = n2) AS agree,
                       same_entity FROM p
                UNION ALL
                SELECT 'first_token',
                       split_part(n1, ' ', 1) = split_part(n2, ' ', 1),
                       same_entity FROM p
                UNION ALL
                SELECT 'jw92',
                       {_roundsql('jaro_winkler_similarity(n1, n2)', 5)} >= 0.92,
                       same_entity FROM p
                UNION ALL
                SELECT 'last_token',
                       str_split(n1, ' ')[-1] = str_split(n2, ' ')[-1],
                       same_entity FROM p
                UNION ALL
                SELECT 'token_count',
                       len(str_split(n1, ' ')) = len(str_split(n2, ' ')),
                       same_entity FROM p
            ),
            agg AS (
                SELECT feature,
                       CAST(count(*) FILTER (same_entity) AS BIGINT)
                           AS n_match,
                       CAST(count(*) FILTER (NOT same_entity) AS BIGINT)
                           AS n_nonmatch,
                       CAST(count(*) FILTER (agree AND same_entity) AS BIGINT)
                           AS agree_match,
                       CAST(count(*) FILTER (agree AND NOT same_entity)
                            AS BIGINT) AS agree_nonmatch
                FROM f GROUP BY feature
            ),
            probs AS (
                SELECT *,
                       {_roundsql('(agree_match + 1.0) / (n_match + 2)', 6)}
                           AS m_prob,
                       {_roundsql('(agree_nonmatch + 1.0) / (n_nonmatch + 2)', 6)}
                           AS u_prob
                FROM agg
            )
            SELECT feature, n_match, n_nonmatch, agree_match,
                   agree_nonmatch, m_prob, u_prob,
                   {_roundsql('log2(m_prob / u_prob)', 6)} AS weight
            FROM probs
        """,
        "el_fs_em": _fs_em_sql(gm, gp, norm, iters=3),
        "el_em_scores": _fs_em_sql(gm, gp, norm, iters=3, emit="scores"),
        "el_block_purge": f"""
            WITH m AS (SELECT mention_id, {norm} AS norm FROM {gm}),
            k AS (
                SELECT mention_id, 'n:' || norm AS bk
                FROM m WHERE norm != ''
                UNION ALL
                SELECT mention_id,
                       'p:' || substr(split_part(norm, ' ', 1), 1, 6) AS bk
                FROM m WHERE length(split_part(norm, ' ', 1)) >= 3
            )
            SELECT bk AS block_key,
                   CAST(count(*) AS BIGINT) AS n_mentions,
                   CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
                       AS pair_count,
                   count(*) > 24 AS purged
            FROM k GROUP BY bk
        """,
        "el_block_skew": f"""
            WITH m AS (SELECT mention_id, {norm} AS norm FROM {gm}),
            k AS (
                SELECT mention_id, 'n:' || norm AS bk
                FROM m WHERE norm != ''
                UNION ALL
                SELECT mention_id,
                       'p:' || substr(split_part(norm, ' ', 1), 1, 6) AS bk
                FROM m WHERE length(split_part(norm, ' ', 1)) >= 3
            ),
            c AS (
                SELECT bk AS block_key,
                       CAST(count(*) AS BIGINT) AS n_mentions,
                       CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
                           AS pair_count
                FROM k GROUP BY bk
            ),
            tot AS (
                SELECT CAST(sum(pair_count) AS BIGINT) AS t FROM c
            )
            SELECT block_key, n_mentions, pair_count,
                   {_roundsql('CAST(pair_count AS DOUBLE) / tot.t', 6)}
                       AS pair_share
            FROM c, tot
            ORDER BY pair_count DESC, block_key LIMIT 20
        """,
        "el_token_sims": f"""
            WITH s AS (SELECT mention_id, {norm} AS norm FROM {gm}),
            p AS (
                SELECT gp.m1_id, gp.m2_id,
                       str_split(s1.norm, ' ') AS t1,
                       str_split(s2.norm, ' ') AS t2
                FROM {gp} gp
                JOIN s s1 ON gp.m1_id = s1.mention_id
                JOIN s s2 ON gp.m2_id = s2.mention_id
            ),
            u AS (
                SELECT m1_id, m2_id, t1, t2,
                       list_distinct(t1) AS u1, list_distinct(t2) AS u2,
                       len(list_intersect(list_distinct(t1),
                                          list_distinct(t2))) AS inter
                FROM p
            )
            SELECT m1_id, m2_id,
                   {_roundsql("CASE WHEN len(list_distinct(list_concat(u1, u2))) = 0 THEN 0.0 ELSE CAST(inter AS DOUBLE) / len(list_distinct(list_concat(u1, u2))) END", 6)} AS jaccard,
                   {_roundsql('2.0 * inter / (len(u1) + len(u2))', 6)} AS dice,
                   {_roundsql('CAST(inter AS DOUBLE) / least(len(u1), len(u2))', 6)} AS overlap,
                   {_roundsql("list_avg([list_max([floor(jaro_winkler_similarity(a, b) * 1e5 + 0.5) / 1e5 FOR b IN t2]) FOR a IN t1])", 6)} AS monge_elkan
            FROM u
        """,
        "el_incremental_assign": f"""
            WITH m AS (
                SELECT mention_id, conv_id, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            t AS (
                SELECT *, substr(md5(conv_id), 1, 1) < '8' AS is_base
                FROM m
            ),
            b AS (
                SELECT norm, min(mention_id) AS base_cluster
                FROM t WHERE is_base GROUP BY norm
            ),
            d AS (SELECT * FROM t WHERE NOT is_base),
            dn AS (
                SELECT norm, min(mention_id) AS new_cluster
                FROM d GROUP BY norm
            )
            SELECT d.mention_id,
                   COALESCE(b.base_cluster, dn.new_cluster) AS cluster_id,
                   b.base_cluster IS NULL AS is_new
            FROM d
            LEFT JOIN b ON d.norm = b.norm
            JOIN dn ON d.norm = dn.norm
        """,
        "transcripts_passthrough": f"""
            SELECT conv_id, turn_idx, role, text, tool FROM {tr}
            ORDER BY conv_id, turn_idx
        """,
        "el_answers": f"""
            WITH g AS (
                SELECT mention_id, conv_id, turn_idx, surface, gold_kb_id,
                       min(mention_id) OVER (PARTITION BY gold_kb_id)
                           AS nil_min
                FROM {gm}
            )
            SELECT mention_id, conv_id, turn_idx, surface,
                   CASE WHEN gold_kb_id LIKE 'NIL%' THEN nil_min
                        ELSE gold_kb_id END AS cluster_id,
                   CASE WHEN gold_kb_id LIKE 'NIL%'
                        THEN 'NIL:' || nil_min
                        ELSE gold_kb_id END AS kb_link
            FROM g
        """,
        "el_human_readable": f"""
            WITH g AS (
                SELECT mention_id, conv_id, turn_idx, surface, gold_kb_id,
                       min(mention_id) OVER (PARTITION BY gold_kb_id)
                           AS nil_min
                FROM {gm}
            ),
            a AS (
                SELECT mention_id, conv_id, turn_idx, surface,
                       CASE WHEN gold_kb_id LIKE 'NIL%'
                            THEN 'NIL:' || nil_min
                            ELSE gold_kb_id END AS kb_link
                FROM g
            )
            SELECT a.*,
                   coalesce(k.title, '') AS kb_title,
                   coalesce(k.type, 'NIL') AS kb_type
            FROM a LEFT JOIN {kbt} k ON k.kb_id = a.kb_link
        """,
        "el_benchmark_report": f"""
            WITH g AS (
                SELECT mention_id, conv_id, surface, {norm} AS nsurf,
                       gold_kb_id, gold_kb_id NOT LIKE 'NIL%' AS in_kb,
                       CAST(split_part(conv_id, '-', 2) AS INT) AS cc
                FROM {gm}
            ),
            cat AS (
                SELECT 'category:CORRECT' AS metric,
                       CAST(count(*) FILTER (in_kb) AS DOUBLE) AS value
                FROM g
                UNION ALL
                SELECT 'category:NIL OK',
                       CAST(count(*) FILTER (NOT in_kb) AS DOUBLE)
                FROM g
            ),
            slc AS (
                SELECT 'genre:'
                       || CASE WHEN cc % 2 = 0 THEN 'NW' ELSE 'WB' END
                       || ':'
                       || CASE WHEN in_kb THEN 'CORRECT' ELSE 'NIL OK' END
                           AS metric,
                       CAST(count(*) AS DOUBLE) AS value
                FROM g GROUP BY 1
                UNION ALL
                SELECT 'web:'
                       || CASE WHEN cc % 4 >= 2 THEN 'w1' ELSE 'w0' END
                       || ':'
                       || CASE WHEN in_kb THEN 'CORRECT' ELSE 'NIL OK' END,
                       CAST(count(*) AS DOUBLE)
                FROM g GROUP BY 1
            ),
            kbn AS (
                SELECT kb_id,
                       trim(regexp_replace(lower(title),
                            '[^a-z0-9]+', ' ', 'g')) AS ntitle,
                       list_transform(named_entities,
                           x -> trim(regexp_replace(lower(x),
                                '[^a-z0-9]+', ' ', 'g'))) AS nes
                FROM {kbt}
            ),
            interesting AS (
                SELECT g.mention_id, g.conv_id, g.nsurf, k.nes
                FROM g JOIN kbn k ON k.kb_id = g.gold_kb_id
                WHERE g.in_kb AND k.ntitle != g.nsurf
            ),
            sh AS (
                SELECT i.mention_id,
                       EXISTS (SELECT 1 FROM g o
                               WHERE o.conv_id = i.conv_id
                                 AND o.nsurf != i.nsurf
                                 AND list_contains(i.nes, o.nsurf))
                           AS shares
                FROM interesting i
            ),
            ne AS (
                SELECT 'ne_share:CORRECT:total' AS metric,
                       CAST(count(*) AS DOUBLE) AS value FROM sh
                UNION ALL
                SELECT 'ne_share:CORRECT:shared',
                       CAST(count(*) FILTER (shares) AS DOUBLE) FROM sh
            )
            SELECT metric, value FROM cat WHERE value > 0
            UNION ALL SELECT metric, value FROM slc WHERE value > 0
            UNION ALL SELECT metric, value FROM ne WHERE value > 0
            UNION ALL SELECT 'pairwise_f1', 1.0
            UNION ALL SELECT 'b_cubed_f1', 1.0
            UNION ALL SELECT 'over_clustering', 0.0
        """,
        "el_sports_links": f"""
            SELECT g.mention_id, g.surface, g.gold_kb_id AS kb_link,
                   0.7 AS confidence
            FROM {gm} g JOIN {kbt} k
              ON k.kb_id = g.gold_kb_id AND k.wiki_type = 'team'
        """,
        "el_cluster_links": f"""
            WITH g AS (
                SELECT mention_id, gold_kb_id,
                       min(mention_id) OVER (PARTITION BY gold_kb_id)
                           AS nil_min
                FROM {gm}
            )
            SELECT mention_id,
                   CASE WHEN gold_kb_id LIKE 'NIL%' THEN nil_min
                        ELSE gold_kb_id END AS cluster_id,
                   CASE WHEN gold_kb_id LIKE 'NIL%'
                        THEN 'NIL:' || nil_min
                        ELSE gold_kb_id END AS kb_link
            FROM g
        """,
        "el_city_links": f"""
            WITH g AS (
                SELECT mention_id, surface, gold_kb_id,
                       min(mention_id) OVER (PARTITION BY gold_kb_id)
                           AS nil_min
                FROM {gm}
            )
            SELECT mention_id, surface,
                   CASE WHEN gold_kb_id LIKE 'NIL%'
                        THEN 'NIL:' || nil_min
                        ELSE gold_kb_id END AS kb_link
            FROM g
            WHERE surface IN ({_cities_sql()})
        """,
        "conv_stats": f"""
            WITH base AS (
                SELECT conv_id,
                       CAST(count(*) AS BIGINT) AS n_turns,
                       CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_user,
                       CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0
                                END) AS BIGINT) AS n_assistant,
                       CAST(sum(CASE WHEN tool != '' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_tool,
                       CAST(sum(len(regexp_extract_all(text,
                            '[A-Za-z0-9]+'))) AS BIGINT) AS n_tokens,
                       CAST(floor(epoch(max(ts) - min(ts)) + 0.5)
                            AS BIGINT) AS duration_s
                FROM {tr} GROUP BY conv_id
            ),
            lagged AS (
                SELECT conv_id, role,
                       epoch(ts - lag(ts) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx)) AS lat
                FROM {tr}
            ),
            resp AS (
                SELECT conv_id,
                       CAST(count(*) AS BIGINT) AS n_responses,
                       {_roundsql('avg(lat)', 6)} AS mean_latency_s,
                       CAST(floor(max(lat) + 0.5) AS BIGINT)
                           AS max_latency_s
                FROM lagged
                WHERE role = 'assistant' AND lat IS NOT NULL
                GROUP BY conv_id
            )
            SELECT base.*,
                   coalesce(resp.n_responses, 0) AS n_responses,
                   coalesce(resp.mean_latency_s, 0.0) AS mean_latency_s,
                   coalesce(resp.max_latency_s, 0) AS max_latency_s
            FROM base LEFT JOIN resp USING (conv_id)
        """,
        "bpe_token_count": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
                       AS n_bpe_tokens
            FROM documents
        """,
        "conv_dedup": f"""
            WITH planted AS (
                SELECT conv_id, turn_idx, role, text FROM {tr}
                UNION ALL
                SELECT 'dup-' || conv_id, turn_idx, role, text FROM {tr}
                WHERE right(conv_id, 2) = '01'
            ),
            fp AS (
                SELECT conv_id,
                       md5(string_agg(role || ':' || text, chr(10)
                           ORDER BY turn_idx)) AS fp
                FROM planted GROUP BY conv_id
            )
            SELECT fp, min(conv_id) AS keep_conv_id FROM fp GROUP BY fp
        """,
        "embed_label_centroids": f"""
            WITH e AS (
                SELECT label,
                       unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings
            ),
            q AS (
                SELECT CAST(label AS BIGINT) AS label,
                       CAST(dim AS BIGINT) AS dim,
                       CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5)
                            AS BIGINT) AS qv
                FROM e
            ),
            g AS (
                SELECT label, dim, CAST(sum(qv) AS BIGINT) AS s,
                       CAST(count(*) AS BIGINT) AS n
                FROM q GROUP BY label, dim
            )
            SELECT label, dim, n,
                   {_roundsql('CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6', 6)}
                       AS centroid
            FROM g
        """,
        "embed_ncm_accuracy": f"""
            WITH e AS (
                SELECT vec_id, CAST(label AS BIGINT) AS label,
                       unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings
            ),
            q AS (
                SELECT vec_id, label, CAST(dim AS BIGINT) AS dim,
                       CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5)
                            AS BIGINT) AS qv
                FROM e
            ),
            g AS (
                SELECT label AS clab, dim,
                       CAST(sum(qv) AS BIGINT) AS s,
                       CAST(count(*) AS BIGINT) AS n
                FROM q GROUP BY label, dim
            ),
            cent AS (
                SELECT clab, dim,
                       {_roundsql('CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6', 6)}
                           AS c6
                FROM g
            ),
            ci AS (
                SELECT clab, dim,
                       CAST(floor(c6 * 1e6 + 0.5) AS BIGINT) AS c
                FROM cent
            ),
            d AS (
                SELECT q.vec_id, q.label AS tlab, ci.clab,
                       sum((q.qv - ci.c) * (q.qv - ci.c)) AS d2
                FROM q JOIN ci ON ci.dim = q.dim
                GROUP BY q.vec_id, q.label, ci.clab
            ),
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, clab) AS rn
                FROM d
            ),
            p AS (
                SELECT tlab AS label, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN clab = tlab THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_correct
                FROM r WHERE rn = 1 GROUP BY tlab
            )
            SELECT label, n, n_correct,
                   {_roundsql('CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE)', 6)}
                       AS accuracy
            FROM p
        """,
        "embed_quantize": f"""
            WITH s AS (
                SELECT vec_id, embedding,
                       CAST(list_max(list_transform(embedding,
                            x -> abs(x))) AS DOUBLE) AS sc
                FROM embeddings
            ),
            q AS (
                SELECT vec_id, sc,
                       CASE WHEN sc > 0 THEN
                           list_transform(embedding, x -> CAST(floor(
                               CAST(x AS DOUBLE) * 127 / sc + 0.5)
                               AS BIGINT))
                       ELSE list_transform(embedding, x ->
                            CAST(0 AS BIGINT)) END AS ql
                FROM s
            )
            SELECT vec_id,
                   {_roundsql('sc', 6)} AS scale,
                   ql[1] AS q0, ql[2] AS q1, ql[3] AS q2, ql[4] AS q3,
                   CAST(list_sum(ql) AS BIGINT) AS qsum
            FROM q
        """,
        "tool_bigrams": f"""
            WITH t AS (
                SELECT conv_id, turn_idx, tool FROM {tr}
                WHERE tool != ''
            ),
            w AS (
                SELECT tool,
                       lag(tool) OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) AS prev_tool
                FROM t
            ),
            c AS (
                SELECT prev_tool, tool,
                       CAST(count(*) AS BIGINT) AS n_pairs
                FROM w WHERE prev_tool IS NOT NULL
                GROUP BY prev_tool, tool
            ),
            tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS n FROM c)
            SELECT prev_tool, tool, n_pairs,
                   {_roundsql('CAST(n_pairs AS DOUBLE) / tot.n', 6)}
                       AS share
            FROM c, tot
        """,
        "tool_calls": f"""
            WITH w AS (
                SELECT conv_id, turn_idx, tool,
                       coalesce(lag(role) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx), '')
                           AS prev_role,
                       coalesce(lag(text) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx), '')
                           AS prev_text
                FROM {tr}
            )
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, tool,
                   prev_role, prev_text
            FROM w WHERE tool != ''
        """,
        "source_mix": _source_mix_sql(),
        "conv_ngram_dedup": f"""
            WITH convs AS (
                SELECT CAST(right(conv_id, 8) AS BIGINT) AS doc_id,
                       string_agg(text, ' ' ORDER BY turn_idx) AS text
                FROM {tr} GROUP BY conv_id
            ),
            clone_src AS (
                SELECT conv_id, turn_idx, text,
                       max(turn_idx) OVER (PARTITION BY conv_id) AS mx
                FROM {tr} WHERE right(conv_id, 2) = '01'
            ),
            clones AS (
                SELECT CAST(right(conv_id, 8) AS BIGINT) + 100000000
                           AS doc_id,
                       string_agg(text, ' ' ORDER BY turn_idx) AS text
                FROM clone_src WHERE turn_idx < mx GROUP BY conv_id
            ),
            docs AS (
                SELECT doc_id, text FROM convs
                UNION ALL SELECT doc_id, text FROM clones
            ),
            toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                     FROM docs),
            sh AS (
                SELECT DISTINCT doc_id, s FROM (
                    SELECT doc_id,
                           unnest(list_transform(range(len(tk) - 2),
                               i -> tk[i+1] || ' ' || tk[i+2] || ' '
                                    || tk[i+3])) AS s
                    FROM toks WHERE len(tk) >= 3
                    UNION ALL
                    SELECT doc_id, array_to_string(tk, ' ') AS s
                    FROM toks
                    WHERE len(tk) < 3 AND array_to_string(tk, ' ') != ''
                )
            ),
            -- the engine truncates each shingle's posting list to its
            -- 100 smallest doc_ids (deterministic hot-shingle cap);
            -- replicate it for the co-occurrence side, sizes stay full
            sh_cap AS (
                SELECT doc_id, s FROM (
                    SELECT doc_id, s,
                           row_number() OVER (PARTITION BY s
                                              ORDER BY doc_id) AS rn
                    FROM sh
                ) WHERE rn <= 100
            ),
            co AS (
                SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS co
                FROM sh_cap a
                JOIN sh_cap b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh
                      GROUP BY doc_id)
            SELECT co.d1, co.d2,
                   {_roundsql('co.co / (s1.n + s2.n - co.co)', 6)}
                       AS jaccard
            FROM co
            JOIN sizes s1 ON co.d1 = s1.doc_id
            JOIN sizes s2 ON co.d2 = s2.doc_id
            WHERE {_roundsql('co.co / (s1.n + s2.n - co.co)', 6)} >= 0.5
        """,
        "comention_pagerank": _pagerank_sql(),
        "comention_hits": _hits_sql(),
        "comention_kcore": _kcore_sql(),
        "comention_pmi": f"""
            WITH m AS (SELECT DISTINCT conv_id, surface FROM {gm}),
            n AS (SELECT CAST(count(DISTINCT conv_id) AS DOUBLE) AS nn
                  FROM m),
            cs AS (SELECT surface, CAST(count(*) AS BIGINT) AS c
                   FROM m GROUP BY surface),
            cp AS (SELECT a.surface AS s1, b.surface AS s2,
                          count(*) AS n_convs
                   FROM m a JOIN m b
                     ON a.conv_id = b.conv_id AND a.surface < b.surface
                   GROUP BY 1, 2)
            SELECT cp.s1, cp.s2, CAST(cp.n_convs AS BIGINT) AS n_convs,
                   {_roundsql(
                       'ln(cp.n_convs * n.nn / (ca.c * cb.c))', 5)}
                       AS pmi
            FROM cp
            JOIN cs ca ON ca.surface = cp.s1
            JOIN cs cb ON cb.surface = cp.s2
            CROSS JOIN n
        """,
        "comention_counts": f"""
            WITH m AS (SELECT DISTINCT conv_id, surface FROM {gm})
            SELECT a.surface AS s1, b.surface AS s2,
                   count(*) AS n_convs
            FROM m a JOIN m b
              ON a.conv_id = b.conv_id AND a.surface < b.surface
            GROUP BY a.surface, b.surface
        """,
        "el_contexts": f"""
            SELECT conv_id, turn_idx, text AS context,
                   concat_ws(' ',
                       lag(text) OVER w, text, lead(text) OVER w) AS wide_context,
                   first_value(text) OVER w AS headline
            FROM {tr}
            WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        """,
        "el_doc_entities": _doc_entities_sql(gm),
        "el_coref_contexts": f"""
            WITH st AS (
                SELECT DISTINCT m.conv_id, m.surface, m.turn_idx, t.text
                FROM {gm} m JOIN {tr} t
                  ON m.conv_id = t.conv_id AND m.turn_idx = t.turn_idx
            ),
            agg AS (
                SELECT conv_id, surface,
                       string_agg(text, ' ' ORDER BY turn_idx) AS coref_context
                FROM st GROUP BY conv_id, surface
            )
            SELECT m.mention_id, a.coref_context
            FROM {gm} m JOIN agg a
              ON m.conv_id = a.conv_id AND m.surface = a.surface
        """,
        "el_block_keys_phonetic": f"""
            WITH m AS (
                SELECT mention_id,
                       regexp_extract({norm}, '([a-z0-9]+)$', 1) AS last
                FROM {gm}
            ), b AS (
                SELECT mention_id, last,
                       regexp_replace(last, '[^a-z]', '', 'g') AS w
                FROM m
            ), c AS (
                SELECT mention_id, last, w, substr(w, 1, 1) AS head,
                       translate(substr(w, 1, 1) ||
                           replace(replace(substr(w, 2), 'h', ''), 'w', ''),
                           'bfpvcgjkqsxzdtlmnr', '111122222222334556')
                           AS coded
                FROM b
            ), d AS (
                SELECT mention_id, last, w, head, {_SOUNDEX_COLLAPSE}
                           AS collapsed
                FROM c
            )
            SELECT mention_id,
                   'ph:' ||
                   CASE WHEN w = '' THEN '0000'
                        ELSE upper(head) || substr(
                            regexp_replace(substr(collapsed, 2),
                                           '[^1-6]', '', 'g') || '000', 1, 3)
                   END || ':' || substr(last, 1, 1) AS block_key
            FROM d
        """,
        "el_training_pairs": f"""
            WITH g AS (
                SELECT m1_id, m2_id, block_key, same_entity,
                       md5(m1_id || ':' || m2_id) AS h
                FROM {gp}
            ),
            pos AS (
                SELECT m1_id, m2_id, block_key, same_entity FROM g
                WHERE same_entity
                QUALIFY row_number() OVER (ORDER BY h) <= least(
                    (SELECT count(*) FROM g WHERE same_entity), 272)
            ),
            neg AS (
                SELECT m1_id, m2_id, block_key, same_entity FROM g
                WHERE NOT same_entity
                QUALIFY row_number() OVER (ORDER BY h) <= least(
                    (SELECT count(*) FROM g WHERE NOT same_entity),
                    10 * least((SELECT count(*) FROM g WHERE same_entity),
                               272))
            )
            SELECT * FROM pos UNION ALL SELECT * FROM neg
        """,
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "exact_dedup": """
            SELECT md5(text) AS fp, min(doc_id) AS doc_id
            FROM documents GROUP BY md5(text)
        """,
        "token_count": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens
            FROM documents
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(toks) AS n_tokens,
                   len(list_distinct(toks)) AS n_uniq_tokens,
                   {_roundsql('len(list_filter(toks, x -> x IN ' + STOPLIST_SQL + ')) / greatest(len(toks), 1)', 6)} AS stop_ratio,
                   {_roundsql('len(list_distinct(toks)) / greatest(len(toks), 1)', 6)} AS uniq_ratio
            FROM (SELECT doc_id, text, {toks} AS toks FROM documents)
        """,
        "gopher_rules": f"""
            WITH t AS (
                SELECT doc_id, text, {toks} AS toks FROM documents
            ),
            s AS (
                SELECT doc_id,
                       CAST(len(toks) AS BIGINT) AS n_tokens,
                       {_roundsql("CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS DOUBLE) / greatest(len(toks), 1)", 6)}
                           AS mean_token_len,
                       {_roundsql("len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) / greatest(len(toks), 1)", 6)}
                           AS alpha_ratio,
                       {_roundsql("len(regexp_extract_all(text, '[^A-Za-z0-9" + chr(92) + "s]')) / greatest(len(toks), 1)", 6)}
                           AS symbol_ratio,
                       CAST(len(list_filter(toks, x -> x IN {STOPLIST_SQL}))
                            AS BIGINT) AS n_stopwords
                FROM t
            )
            SELECT doc_id, n_tokens, mean_token_len, alpha_ratio,
                   symbol_ratio, n_stopwords,
                   (n_tokens >= {GOPHER_MIN_TOKENS}
                    AND n_tokens <= {GOPHER_MAX_TOKENS}
                    AND mean_token_len >= {GOPHER_MIN_MEAN_LEN}
                    AND mean_token_len <= {GOPHER_MAX_MEAN_LEN}
                    AND alpha_ratio >= {GOPHER_MIN_ALPHA_RATIO}
                    AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
                    AND n_stopwords >= {GOPHER_MIN_STOPWORDS}) AS passes
            FROM s
        """,
        "lang_id": f"""
            WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
            c AS (SELECT doc_id, {lang_counts} FROM t)
            SELECT doc_id,
                   CASE WHEN greatest(c_de, c_en, c_es, c_fr, c_zh) = 0 THEN 'und'
                        WHEN c_de = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'de'
                        WHEN c_en = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'en'
                        WHEN c_es = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'es'
                        WHEN c_fr = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'fr'
                        ELSE 'zh' END AS lang_guess
            FROM c
        """,
        "pii_redact": r"""
            WITH p AS (
                SELECT doc_id,
                    text
                    || CASE WHEN doc_id % 4 = 0
                            THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                 || '@example.com now' ELSE '' END
                    || CASE WHEN doc_id % 6 = 0
                            THEN ' call 415-555-'
                                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            ELSE '' END AS ptext
                FROM documents
            ),
            e AS (
                SELECT doc_id,
                    len(regexp_extract_all(ptext,
                        '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'))
                        AS n_emails,
                    regexp_replace(ptext,
                        '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g') AS t1
                FROM p
            )
            SELECT doc_id,
                   regexp_replace(t1, '[0-9]{3}-[0-9]{3}-[0-9]{4}',
                                  '<PHONE>', 'g') AS clean_text,
                   n_emails,
                   len(regexp_extract_all(t1,
                       '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones
            FROM e
        """,
        "multimodal_features": _multimodal_sql(),
        "frame_sample": _frame_sample_sql(),
        "image_resize": _image_resize_sql(),
        "strip_markup": r"""
            WITH p AS (
                SELECT doc_id,
                    CASE WHEN doc_id % 3 = 0
                         THEN '<p>' || text || '</p> <a href="x">link</a>'
                         ELSE text END AS ptext
                FROM documents
            )
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(ptext, '<[^>]+>', '', 'g'),
                       '\s+', ' ', 'g')) AS clean_text,
                   len(regexp_extract_all(ptext, '<[^>]+>')) AS n_tags
            FROM p
        """,
        "source_quality": f"""
            WITH d AS (
                SELECT source, {toks} AS tk FROM documents
            ),
            p AS (
                SELECT source,
                       CAST(len(tk) AS BIGINT) AS n_tokens,
                       CAST(len(list_filter(tk, x -> x IN (
                           {', '.join(repr(m) for m in sorted(LANG_MARKERS['en']))}
                       ))) AS BIGINT) AS n_stop,
                       CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq
                FROM d
            ),
            g AS (
                SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                       CAST(sum(n_stop) AS BIGINT) AS n_stop,
                       CAST(sum(n_uniq) AS BIGINT) AS n_uniq
                FROM p GROUP BY source
            )
            SELECT source, n_docs, n_tokens,
                   {_roundsql('CAST(n_stop AS DOUBLE) / CASE WHEN n_tokens > 0 THEN n_tokens ELSE 1 END', 6)}
                       AS stop_ratio,
                   {_roundsql('CAST(n_uniq AS DOUBLE) / CASE WHEN n_tokens > 0 THEN n_tokens ELSE 1 END', 6)}
                       AS uniq_ratio
            FROM g
        """,
        "cms_heavy_hitters": f"""
            WITH tok AS (
                SELECT unnest({toks}) AS t FROM documents
            ),
            cnt AS (
                SELECT t, CAST(count(*) AS BIGINT) AS c
                FROM tok GROUP BY t
            ),
            top AS (
                SELECT t, c FROM cnt
                QUALIFY row_number() OVER (ORDER BY c DESC, t) <= 20
            ),
            rws AS (SELECT unnest([0, 1, 2, 3]) AS r),
            buck AS (
                SELECT cnt.t, cnt.c, rws.r,
                       CAST(md5_number_lower(CAST(rws.r AS VARCHAR)
                                             || ':' || cnt.t) % 1024
                            AS BIGINT) AS b
                FROM cnt CROSS JOIN rws
            ),
            cms AS (
                SELECT r, b, CAST(sum(c) AS BIGINT) AS s
                FROM buck GROUP BY r, b
            )
            SELECT top.t AS token, top.c AS exact_count,
                   CAST(min(cms.s) AS BIGINT) AS est_count
            FROM top
            JOIN buck ON buck.t = top.t
            JOIN cms ON cms.r = buck.r AND cms.b = buck.b
            GROUP BY top.t, top.c
        """,
        "vocab_topk": f"""
            WITH tok AS (
                SELECT unnest({toks}) AS token FROM documents
            ),
            c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
            SELECT token, cnt FROM c
            QUALIFY row_number() OVER (ORDER BY cnt DESC, token) <= 100
        """,
        "doc_chunk": f"""
            WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
            s AS (SELECT doc_id, tk, len(tk) AS n,
                         unnest(generate_series(0, len(tk) - 1, 48))
                             AS st
                  FROM t WHERE len(tk) > 0),
            c AS (SELECT doc_id, st, n,
                         list_slice(tk, st + 1, least(st + 64, n)) AS ch
                  FROM s WHERE st = 0 OR st + 16 < n)
            SELECT doc_id, CAST(st // 48 AS BIGINT) AS chunk_idx,
                   CAST(len(ch) AS BIGINT) AS n_tokens,
                   array_to_string(ch, ' ') AS chunk_text
            FROM c
        """,
        "lang_source_chi2": f"""
            WITH cell AS (
                SELECT lang, source, CAST(count(*) AS BIGINT) AS c
                FROM documents GROUP BY lang, source
            ),
            l AS (SELECT DISTINCT lang FROM cell),
            s AS (SELECT DISTINCT source FROM cell),
            d AS (
                SELECT g.lang, g.source,
                       CAST(COALESCE(cell.c, 0) AS BIGINT) AS o
                FROM (SELECT l.lang, s.source
                      FROM l CROSS JOIN s) g
                LEFT JOIN cell ON cell.lang = g.lang
                              AND cell.source = g.source
            ),
            rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r
                   FROM d GROUP BY lang),
            ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS cc
                   FROM d GROUP BY source),
            n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM d),
            terms AS (
                SELECT CAST(floor(
                    ((CAST(d.o AS DOUBLE) - e.e)
                     * (CAST(d.o AS DOUBLE) - e.e) / e.e)
                    * 1000000000 + 0.5) AS BIGINT) AS q
                FROM d
                JOIN rt ON rt.lang = d.lang
                JOIN ct ON ct.source = d.source, n,
                LATERAL (SELECT (CAST(rt.r AS DOUBLE) * ct.cc) / n.n
                         AS e) e
            )
            SELECT n.n AS n_docs,
                   (SELECT CAST(count(*) AS BIGINT) FROM l) AS n_langs,
                   (SELECT CAST(count(*) AS BIGINT) FROM s)
                       AS n_sources,
                   ((SELECT count(*) FROM l) - 1)
                   * ((SELECT count(*) FROM s) - 1) AS dof,
                   {_roundsql(
                       "(SELECT CAST(sum(q) AS DOUBLE) FROM terms)"
                       " / 1000000000", 6)} AS chi2
            FROM n
        """,
        "source_kl": f"""
            WITH tok AS (
                SELECT source, unnest({toks}) AS token FROM documents
            ),
            cell AS (
                SELECT source, token, CAST(count(*) AS BIGINT) AS c
                FROM tok GROUP BY source, token
            ),
            tc AS (
                SELECT token, CAST(sum(c) AS BIGINT) AS ct
                FROM cell GROUP BY token
            ),
            src AS (
                SELECT source, CAST(sum(c) AS BIGINT) AS ns,
                       CAST(count(*) AS BIGINT) AS vocab
                FROM cell GROUP BY source
            ),
            n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
            terms AS (
                SELECT cell.source,
                       CAST(floor(
                           (CAST(cell.c AS DOUBLE) / src.ns)
                           * ln((CAST(cell.c AS DOUBLE) * n.n)
                                / (CAST(src.ns AS DOUBLE) * tc.ct))
                           * 1000000000 + 0.5) AS BIGINT) AS q
                FROM cell
                JOIN tc ON tc.token = cell.token
                JOIN src ON src.source = cell.source, n
            )
            SELECT src.source, src.ns AS n_tokens, src.vocab AS vocab,
                   {_roundsql('CAST(t.qs AS DOUBLE) / 1000000000', 6)}
                       AS kl
            FROM (SELECT source, CAST(sum(q) AS BIGINT) AS qs
                  FROM terms GROUP BY source) t
            JOIN src ON src.source = t.source
        """,
        "unigram_logprob": f"""
            WITH tok AS (
                SELECT doc_id, unnest({toks}) AS token FROM documents
            ),
            c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
            tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM c),
            vocab AS (
                SELECT token, cnt FROM c
                QUALIFY row_number() OVER (ORDER BY cnt DESC, token)
                    <= 65536
            ),
            lp AS (
                SELECT tok.doc_id,
                       CASE WHEN v.cnt IS NULL
                            THEN ln(0.5 / tot.t)
                            ELSE ln(CAST(v.cnt AS DOUBLE) / tot.t)
                       END AS l
                FROM tok LEFT JOIN vocab v USING (token)
                CROSS JOIN tot
            ),
            agg AS (SELECT doc_id, count(*) AS n_tokens, avg(l) AS s
                    FROM lp GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
                   {_roundsql('a.s', 5)} AS logprob_per_token
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "decontaminate": f"""
            WITH p AS (
                SELECT doc_id,
                    text || CASE WHEN doc_id % 97 = 0 OR doc_id % 13 = 0
                                 THEN ' {_DECON_SENTINEL}' ELSE '' END
                        AS ptext
                FROM documents
            ),
            tk AS (
                SELECT doc_id,
                       regexp_extract_all(lower(ptext), '[a-z0-9]+') AS ts
                FROM p
            ),
            grams AS (
                SELECT DISTINCT doc_id,
                       array_to_string(list_slice(ts, i, i + 7), ' ') AS g
                FROM tk, unnest(generate_series(1, len(ts) - 7)) AS u(i)
                WHERE len(ts) >= 8
            ),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
            hits AS (
                SELECT g.doc_id, count(*) AS n_hits
                FROM grams g JOIN bench b USING (g)
                WHERE g.doc_id % 97 <> 0 GROUP BY g.doc_id
            )
            SELECT t.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
                   COALESCE(h.n_hits, 0) > 0 AS contaminated
            FROM tk t LEFT JOIN hits h ON t.doc_id = h.doc_id
            WHERE t.doc_id % 97 <> 0
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY lang
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
        """,
        "group_quantiles": f"""
            SELECT lang,
                   count(*) AS n_docs,
                   quantile_disc(len({toks}), 0.5) AS q50_tokens,
                   quantile_disc(len({toks}), 0.9) AS q90_tokens
            FROM documents GROUP BY lang
        """,
        "inverted_index": f"""
            WITH tp AS (
                SELECT DISTINCT doc_id, unnest({toks}) AS term
                FROM documents
            )
            SELECT term, count(*) AS df,
                   string_agg(doc_id, ',' ORDER BY doc_id) AS postings
            FROM tp GROUP BY term
        """,
        "zipf_slope": f"""
            WITH tok AS (SELECT unnest({toks}) AS t FROM documents),
            c AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt
                  FROM tok GROUP BY t),
            top AS (
                SELECT cnt,
                       row_number() OVER (ORDER BY cnt DESC, t) AS rn
                FROM c
                QUALIFY rn <= 1000
            ),
            q AS (
                SELECT
                    CAST(floor(ln(CAST(rn AS DOUBLE))
                               * 1000000000 + 0.5) AS BIGINT) AS qx,
                    CAST(floor(ln(CAST(cnt AS DOUBLE))
                               * 1000000000 + 0.5) AS BIGINT) AS qy,
                    CAST(floor(ln(CAST(rn AS DOUBLE))
                               * ln(CAST(cnt AS DOUBLE))
                               * 1000000000 + 0.5) AS BIGINT) AS qxy,
                    CAST(floor(ln(CAST(rn AS DOUBLE))
                               * ln(CAST(rn AS DOUBLE))
                               * 1000000000 + 0.5) AS BIGINT) AS qxx
                FROM top
            ),
            s AS (
                SELECT CAST(count(*) AS BIGINT) AS k,
                       CAST(sum(qx) AS BIGINT) AS sx,
                       CAST(sum(qy) AS BIGINT) AS sy,
                       CAST(sum(qxy) AS BIGINT) AS sxy,
                       CAST(sum(qxx) AS BIGINT) AS sxx
                FROM q
            ),
            f AS (
                SELECT k,
                       (k * (CAST(sxy AS DOUBLE) / 1000000000)
                        - (CAST(sx AS DOUBLE) / 1000000000)
                          * (CAST(sy AS DOUBLE) / 1000000000))
                       / (k * (CAST(sxx AS DOUBLE) / 1000000000)
                          - (CAST(sx AS DOUBLE) / 1000000000)
                            * (CAST(sx AS DOUBLE) / 1000000000))
                           AS slope,
                       CAST(sx AS DOUBLE) / 1000000000 AS fx,
                       CAST(sy AS DOUBLE) / 1000000000 AS fy
                FROM s
            )
            SELECT k AS n_points,
                   {_roundsql('slope', 6)} AS slope,
                   {_roundsql('(fy - slope * fx) / k', 6)} AS intercept
            FROM f
        """,
        "bigram_pmi": f"""
            WITH tk AS (SELECT {toks} AS ts FROM documents),
            uni AS (
                SELECT t, CAST(count(*) AS BIGINT) AS c
                FROM (SELECT unnest(ts) AS t FROM tk) GROUP BY t
            ),
            nu AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
            bg AS (
                SELECT ts[i] AS w1, ts[i + 1] AS w2
                FROM tk, unnest(generate_series(1, len(ts) - 1)) AS u(i)
                WHERE len(ts) >= 2
            ),
            cells AS (
                SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                FROM bg GROUP BY w1, w2
            ),
            nb AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM cells),
            j AS (
                SELECT f.w1, f.w2, f.c12, u1.c AS c1, u2.c AS c2,
                       ln((CAST(f.c12 AS DOUBLE) / nb.n)
                          / ((CAST(u1.c AS DOUBLE) / nu.n)
                             * (CAST(u2.c AS DOUBLE) / nu.n))) AS pmi
                FROM (SELECT * FROM cells WHERE c12 >= 5) f
                JOIN uni u1 ON u1.t = f.w1
                JOIN uni u2 ON u2.t = f.w2, nb, nu
            )
            SELECT w1, w2, c12, c1, c2,
                   {_roundsql('pmi', 6)} AS pmi
            FROM j
            QUALIFY row_number() OVER (
                ORDER BY CAST(floor(pmi * 1000000000 + 0.5) AS BIGINT)
                    DESC, w1, w2) <= 100
        """,
        "bigram_topk": f"""
            WITH tk AS (SELECT {toks} AS ts FROM documents),
            bg AS (
                SELECT ts[i] || ' ' || ts[i + 1] AS token
                FROM tk, unnest(generate_series(1, len(ts) - 1)) AS u(i)
                WHERE len(ts) >= 2
            ),
            c AS (SELECT token, count(*) AS cnt FROM bg GROUP BY token)
            SELECT token, cnt FROM c
            QUALIFY row_number() OVER (ORDER BY cnt DESC, token) <= 100
        """,
        "doc_top_terms": f"""
            WITH t AS (
                SELECT doc_id, unnest({toks}) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
            dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
            SELECT tf.doc_id, tf.term, tf.tf, dfx.df
            FROM tf JOIN dfx USING (term)
            QUALIFY row_number() OVER (
                PARTITION BY tf.doc_id
                ORDER BY tf.tf DESC, dfx.df ASC, tf.term) <= 3
        """,
        "repetition_score": f"""
            WITH tk AS (SELECT doc_id, {toks} AS ts FROM documents),
            g AS (
                SELECT doc_id,
                       array_to_string(list_slice(ts, i, i + 1), ' ') AS gram
                FROM tk, unnest(generate_series(1, len(ts) - 1)) AS u(i)
                WHERE len(ts) >= 2
            ),
            c AS (SELECT doc_id, gram, count(*) AS cnt
                  FROM g GROUP BY doc_id, gram),
            a AS (SELECT doc_id,
                         CAST(sum(cnt) AS BIGINT) AS n_grams,
                         CAST(count(*) AS BIGINT) AS n_uniq_grams,
                         CAST(max(cnt) AS BIGINT) AS top_gram_count
                  FROM c GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.n_grams, 0) AS n_grams,
                   coalesce(a.n_uniq_grams, 0) AS n_uniq_grams,
                   coalesce({_roundsql(
                       '1.0 - a.n_uniq_grams / greatest(a.n_grams, 1)', 6)},
                       0.0) AS dup_ratio,
                   coalesce(a.top_gram_count, 0) AS top_gram_count
            FROM documents d LEFT JOIN a USING (doc_id)
        """,
        "token_pack": """
            WITH t AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                            AS BIGINT) AS n
                FROM documents
            ),
            o AS (
                SELECT doc_id, n,
                       CAST(coalesce(sum(n) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS g0
                FROM t
            ),
            s AS (
                SELECT doc_id, n, g0,
                       unnest(generate_series(g0 // 128,
                                              (g0 + n - 1) // 128)) AS seq_id
                FROM o WHERE n > 0
            )
            SELECT doc_id,
                   CAST(seq_id AS BIGINT) AS seq_id,
                   CAST(greatest(seq_id * 128 - g0, 0) AS BIGINT) AS tok_start,
                   CAST(least((seq_id + 1) * 128 - g0, n) AS BIGINT) AS tok_end
            FROM s
        """,
        "ngram_jaccard": f"""
            WITH {_PLANTED_SHINGLES_CTE},
            co AS (
                SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS co
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
            SELECT co.d1, co.d2,
                   {_roundsql('co.co / (s1.n + s2.n - co.co)', 6)} AS jaccard
            FROM co
            JOIN sizes s1 ON co.d1 = s1.doc_id
            JOIN sizes s2 ON co.d2 = s2.doc_id
            WHERE {_roundsql('co.co / (s1.n + s2.n - co.co)', 6)} >= 0.5
        """,
        "events_approx_quantiles": f"""
            WITH b AS (
                SELECT event_type,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cent
                FROM events
            ),
            g AS (
                SELECT event_type, cent, CAST(count(*) AS BIGINT) AS c
                FROM b GROUP BY 1, 2
            ),
            tot AS (
                SELECT event_type, CAST(sum(c) AS BIGINT) AS n
                FROM g GROUP BY 1
            ),
            cum AS (
                SELECT event_type, cent,
                       sum(c) OVER (PARTITION BY event_type
                                    ORDER BY cent) AS cum
                FROM g
            ),
            pv AS (SELECT unnest([{', '.join(str(p) for p in APPROX_Q_PCTS)}]) AS pct),
            need AS (
                SELECT tot.event_type, pv.pct, tot.n,
                       (pv.pct * tot.n + 99) // 100 AS k
                FROM tot CROSS JOIN pv
            ),
            sel AS (
                SELECT need.event_type, need.pct, need.n,
                       min(cum.cent) AS cent
                FROM need JOIN cum ON cum.event_type = need.event_type
                                  AND cum.cum >= need.k
                GROUP BY 1, 2, 3
            )
            SELECT event_type, CAST(pct AS BIGINT) AS pct,
                   cent / 100.0 AS est_value, n
            FROM sel
        """,
        "doc_token_entropy": f"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                              '[a-z0-9]+')) AS t
                FROM documents
            ),
            c AS (
                SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2
            ),
            q AS (
                SELECT doc_id,
                       CAST(floor(c * ln(CAST(c AS DOUBLE)) * 1e9
                                  + 0.5) AS BIGINT) AS term, c
                FROM c
            ),
            a AS (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       CAST(count(*) AS BIGINT) AS n_types,
                       CAST(sum(term) AS BIGINT) AS s
                FROM q GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
                   COALESCE(a.n_types, CAST(0 AS BIGINT)) AS n_types,
                   CASE WHEN a.n_tokens IS NULL THEN 0.0
                        ELSE {_roundsql(
                            'ln(CAST(a.n_tokens AS DOUBLE)) '
                            '- CAST(a.s AS DOUBLE) / 1e9 '
                            '/ CAST(a.n_tokens AS DOUBLE)', 6)}
                   END AS entropy
            FROM documents d LEFT JOIN a USING (doc_id)
        """,
        "el_phonetic_confusables": f"""
            WITH m AS (
                SELECT mention_id, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            phb AS (
                SELECT mention_id, norm,
                       regexp_extract(norm, '([a-z0-9]+)$', 1) AS last
                FROM m
            ),
            phc AS (
                SELECT mention_id, norm, last,
                       regexp_replace(last, '[^a-z]', '', 'g') AS w
                FROM phb
            ),
            phd AS (
                SELECT mention_id, norm, last, w,
                       substr(w, 1, 1) AS head,
                       translate(substr(w, 1, 1) ||
                           replace(replace(substr(w, 2), 'h', ''),
                                   'w', ''),
                           'bfpvcgjkqsxzdtlmnr', '111122222222334556')
                           AS coded
                FROM phc
            ),
            phe AS (
                SELECT mention_id, norm, last, w, head,
                       {_SOUNDEX_COLLAPSE} AS collapsed
                FROM phd
            ),
            k AS (
                SELECT mention_id, norm,
                       'ph:' ||
                       CASE WHEN w = '' THEN '0000'
                            ELSE upper(head) || substr(
                                regexp_replace(substr(collapsed, 2),
                                               '[^1-6]', '', 'g')
                                || '000', 1, 3)
                       END || ':' || substr(last, 1, 1) AS block_key
                FROM phe
            )
            SELECT block_key,
                   CAST(count(DISTINCT norm) AS BIGINT) AS n_norms,
                   CAST(count(*) AS BIGINT) AS n_mentions
            FROM k GROUP BY block_key
            HAVING count(DISTINCT norm) >= 2
        """,
        "tpch_q21": """
            WITH ls AS (
                SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ship
                FROM lineitem GROUP BY 1, 2
            ),
            f AS (
                SELECT ls.l_orderkey, ls.l_suppkey,
                       (ls.ship > o.o_orderdate + INTERVAL 60 DAY)
                           AS late
                FROM ls JOIN orders o ON o.o_orderkey = ls.l_orderkey
            ),
            g AS (
                SELECT l_orderkey, count(*) AS n_supp,
                       sum(CASE WHEN late THEN 1 ELSE 0 END) AS n_late
                FROM f GROUP BY 1
            ),
            w AS (
                SELECT f.l_suppkey
                FROM f JOIN g USING (l_orderkey)
                WHERE g.n_supp >= 2 AND g.n_late = 1 AND f.late
            ),
            c AS (
                SELECT l_suppkey AS s_suppkey,
                       CAST(count(*) AS BIGINT) AS numwait
                FROM w GROUP BY 1
            )
            SELECT s_suppkey, numwait FROM c
            QUALIFY row_number() OVER (ORDER BY numwait DESC,
                                       s_suppkey) <= 20
        """,
        "tpch_q2": f"""
            WITH eur AS (
                SELECT s_suppkey, s_acctbal, s_name, n_name
                FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = '{TPCH_Q2_REGION}'
            ),
            pl AS (
                SELECT l_partkey AS pkey, l_suppkey AS skey,
                       min(CAST(floor(l_extendedprice * 100 + 0.5)
                                AS BIGINT)) AS cents
                FROM lineitem JOIN eur ON l_suppkey = s_suppkey
                GROUP BY 1, 2
            ),
            qp AS (
                SELECT p_partkey, p_brand FROM part
                WHERE p_size <= {TPCH_Q2_MAX_SIZE}
                  AND p_type = '{TPCH_Q2_TYPE}'
            ),
            j AS (
                SELECT pl.pkey, pl.skey, pl.cents, qp.p_brand
                FROM pl JOIN qp ON pl.pkey = qp.p_partkey
            ),
            m AS (SELECT pkey, min(cents) AS mc FROM j GROUP BY 1)
            SELECT e.s_acctbal, e.s_name, e.n_name,
                   j.pkey AS p_partkey, j.p_brand
            FROM j JOIN m ON j.pkey = m.pkey AND j.cents = m.mc
            JOIN eur e ON j.skey = e.s_suppkey
            QUALIFY row_number() OVER (ORDER BY e.s_acctbal DESC,
                                       e.n_name, e.s_name,
                                       j.pkey) <= {TPCH_Q2_LIMIT}
        """,
        "tpch_q11": f"""
            WITH nk AS (SELECT n_nationkey FROM nation
                        WHERE n_name = '{TPCH_Q11_NATION}'),
            v AS (
                SELECT l_partkey AS pkey,
                       sum(CAST(floor(l_extendedprice * 100 + 0.5)
                                AS BIGINT)) AS val
                FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                JOIN nk ON s_nationkey = n_nationkey
                GROUP BY 1
            ),
            t AS (SELECT sum(val) AS tot FROM v)
            SELECT v.pkey AS p_partkey, v.val / 100.0 AS value
            FROM v, t WHERE v.val * {TPCH_Q11_FRAC_DEN} > t.tot
        """,
        "tpch_q16": f"""
            WITH ok_supp AS (SELECT s_suppkey FROM supplier
                             WHERE s_acctbal >= 0),
            pairs AS (
                SELECT DISTINCT l_partkey AS pkey, l_suppkey AS skey
                FROM lineitem JOIN ok_supp ON l_suppkey = s_suppkey
            ),
            qp AS (
                SELECT p_partkey, p_brand, p_type, p_size FROM part
                WHERE p_brand <> '{TPCH_Q16_BRAND_EXCL}'
                  AND p_type <> '{TPCH_Q16_TYPE_EXCL}'
                  AND p_size IN ({', '.join(str(s) for s in TPCH_Q16_SIZES)})
            )
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT skey) AS BIGINT) AS supplier_cnt
            FROM pairs JOIN qp ON pkey = p_partkey
            GROUP BY 1, 2, 3
        """,
        "tpch_q20": f"""
            WITH li AS (
                SELECT l_partkey AS pkey, l_suppkey AS skey,
                       sum(CAST(floor(l_quantity * 100 + 0.5)
                                AS BIGINT)) AS q
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_type = '{TPCH_Q20_TYPE}'
                  AND l_shipdate >= TIMESTAMP '{TPCH_Q20_LO}'
                  AND l_shipdate < TIMESTAMP '{TPCH_Q20_HI}'
                GROUP BY 1, 2
            ),
            tot AS (SELECT pkey, sum(q) AS tq FROM li GROUP BY 1),
            dom AS (
                SELECT DISTINCT li.skey
                FROM li JOIN tot ON li.pkey = tot.pkey
                WHERE 2 * li.q > tot.tq
            )
            SELECT s_suppkey, s_name, n_name
            FROM dom JOIN supplier ON skey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = '{TPCH_Q20_REGION}'
        """,
        "hll_distinct": f"""
            WITH h AS (
                SELECT DISTINCT event_type,
                       md5_number_lower(CAST(user_id AS VARCHAR))::UBIGINT
                           AS h
                FROM events
            ),
            b AS (
                SELECT event_type,
                       CAST(h % {HLL_M} AS BIGINT) AS j,
                       h // {HLL_M} AS w
                FROM h
            ),
            r AS (
                SELECT event_type, j,
                       max(CASE WHEN w = 0 THEN {HLL_MAXRHO}
                           ELSE bit_count(CAST(xor(
                               CASE WHEN w = 0 THEN 1 ELSE w END,
                               CASE WHEN w = 0 THEN 1 ELSE w END - 1)
                               AS BIGINT)) END) AS rho
                FROM b GROUP BY 1, 2
            ),
            agg AS (
                SELECT event_type,
                       CAST({HLL_M} - count(*) AS BIGINT) AS v_zero,
                       sum(1::HUGEINT << ({HLL_MAXRHO} - rho))
                           + ({HLL_M} - count(*))::HUGEINT
                             * (1::HUGEINT << {HLL_MAXRHO}) AS s
                FROM r GROUP BY 1
            ),
            raws AS (
                SELECT event_type, v_zero,
                       (0.7213 / (1.0 + 1.079 / {float(HLL_M)}))
                           * {float(HLL_M)} * {float(HLL_M)}
                           * {float(HLL_POW)}
                           / CAST(s AS DOUBLE) AS raw
                FROM agg
            )
            SELECT event_type, v_zero,
                   {_roundsql(
                       f"CASE WHEN raw <= {HLL_LC_LIMIT} AND v_zero > 0 "
                       f"THEN {float(HLL_M)} * ln({float(HLL_M)} / v_zero) "
                       "ELSE raw END", 4)} AS est_distinct
            FROM raws
        """,
        "part_skyline": """
            SELECT p_type, p_partkey, p_retailprice, p_size
            FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM part q
                WHERE q.p_type = p.p_type
                  AND q.p_retailprice >= p.p_retailprice
                  AND q.p_size <= p.p_size
                  AND (q.p_retailprice > p.p_retailprice
                       OR q.p_size < p.p_size))
        """,
        "kmeans_assign": kmeans_sql,
        "el_cluster_nmi": f"""
            WITH f AS (
                SELECT {norm} AS norm, gold_kb_id AS gold FROM {gm}
                WHERE {norm} != ''
            ),
            nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
            na AS (
                SELECT norm, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY norm
            ),
            nb AS (
                SELECT gold, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY gold
            ),
            ng AS (
                SELECT norm, gold, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY norm, gold
            ),
            qhc AS (
                SELECT CAST(COALESCE(sum(CAST(floor(
                    CAST(na.c AS DOUBLE)
                    * ln(CAST(na.c AS DOUBLE) / CAST(nt.n AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT)), 0) AS BIGINT) AS q
                FROM na, nt
            ),
            qhk AS (
                SELECT CAST(COALESCE(sum(CAST(floor(
                    CAST(nb.c AS DOUBLE)
                    * ln(CAST(nb.c AS DOUBLE) / CAST(nt.n AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT)), 0) AS BIGINT) AS q
                FROM nb, nt
            ),
            qhj AS (
                SELECT CAST(COALESCE(sum(CAST(floor(
                    CAST(ng.c AS DOUBLE)
                    * ln(CAST(ng.c AS DOUBLE) / CAST(nt.n AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT)), 0) AS BIGINT) AS q
                FROM ng, nt
            ),
            h AS (
                SELECT nt.n,
                       -(qhc.q / 1e9) / nt.n AS h_c,
                       -(qhk.q / 1e9) / nt.n AS h_k,
                       -(qhj.q / 1e9) / nt.n AS h_j
                FROM nt, qhc, qhk, qhj
            )
            SELECT n AS n_mentions,
                   {_roundsql('h_c + h_k - h_j', 6)} AS mi,
                   {_roundsql(
                       "CASE WHEN (h_c + h_k) / 2.0 = 0.0 THEN 0.0 "
                       "ELSE (h_c + h_k - h_j) / ((h_c + h_k) / 2.0) "
                       "END", 6)} AS nmi
            FROM h
        """,
        "events_cube": f"""
            WITH e AS (
                SELECT event_type,
                       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
                       CAST(floor(value * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM events
            )
            SELECT COALESCE(event_type, '{CUBE_ALL}') AS event_type,
                   COALESCE(hod, -1) AS hod,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS value_cents
            FROM e GROUP BY CUBE(event_type, hod)
        """,
        "ann_range_search": f"""
            WITH q AS (SELECT vec_id AS q_id,
                              CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id < 3),
            s AS (SELECT q.q_id, e.vec_id,
                         {_roundsql(
                             "list_cosine_similarity(q.qe, "
                             "CAST(e.embedding AS DOUBLE[]))", 5)} AS sim
                  FROM q CROSS JOIN embeddings e)
            SELECT q_id, vec_id, sim FROM s
            WHERE sim >= {ANN_RANGE_THETA}
        """,
        "click_conversion_window": f"""
            WITH c AS (SELECT user_id, ts FROM events
                       WHERE event_type = 'click'),
            p AS (SELECT user_id, ts FROM events
                  WHERE event_type = 'purchase')
            SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_clicks,
                   CAST(sum(CASE WHEN EXISTS (
                       SELECT 1 FROM p
                       WHERE p.user_id = c.user_id
                         AND p.ts >= c.ts
                         AND p.ts < c.ts
                             + INTERVAL {CONV_WINDOW_MIN} MINUTE)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
            FROM c GROUP BY 1
        """,
        "el_fingerprint_cluster": f"""
            WITH k AS (
                SELECT mention_id,
                       array_to_string(list_sort(list_distinct(
                           regexp_extract_all({norm}, '[a-z0-9]+'))),
                           ' ') AS fp_key
                FROM {gm}
            )
            SELECT mention_id, fp_key,
                   min(mention_id) OVER (PARTITION BY fp_key)
                       AS cluster_id
            FROM k
        """,
        "comention_neighbor_sim": f"""
            WITH m AS (SELECT DISTINCT conv_id, surface FROM {gm}),
            e AS (
                SELECT DISTINCT a.surface AS s1, b.surface AS s2
                FROM m a JOIN m b ON a.conv_id = b.conv_id
                         AND a.surface < b.surface
            ),
            und AS (
                SELECT s1 AS s, s2 AS t FROM e
                UNION ALL SELECT s2, s1 FROM e
            ),
            deg AS (
                SELECT s, CAST(count(*) AS BIGINT) AS d
                FROM und GROUP BY s
            ),
            wed AS (
                SELECT x.t AS a, y.t AS b, x.s AS hub
                FROM und x JOIN und y ON x.s = y.s AND x.t < y.t
            ),
            term AS (
                SELECT wed.a, wed.b,
                       CAST(floor(1e9 / ln(CAST(dh.d AS DOUBLE)))
                            AS BIGINT) AS t
                FROM wed JOIN deg dh ON dh.s = wed.hub
            ),
            agg AS (
                SELECT a, b, CAST(count(*) AS BIGINT) AS common,
                       CAST(sum(t) AS BIGINT) AS aa_grid
                FROM term GROUP BY a, b
            )
            SELECT agg.a AS s1, agg.b AS s2, agg.common,
                   {_roundsql('CAST(agg.common AS DOUBLE) / (da.d + db.d - agg.common)', 6)}
                       AS jaccard,
                   agg.aa_grid
            FROM agg
            JOIN deg da ON da.s = agg.a
            JOIN deg db ON db.s = agg.b
        """,
        "part_copurchase": """
            WITH lp AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ),
            p AS (
                SELECT a.l_partkey AS p1, b.l_partkey AS p2
                FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
            ),
            c AS (SELECT p1, p2, count(*) AS n FROM p GROUP BY 1, 2)
            SELECT p1, p2, CAST(n AS BIGINT) AS n_orders FROM c
            QUALIFY row_number() OVER (ORDER BY n DESC, p1, p2) <= 50
        """,
        "users_cumulative": """
            WITH f AS (
                SELECT user_id, min(ts) AS ft FROM events
                GROUP BY user_id
            ),
            c AS (
                SELECT strftime(ft, '%Y-%m-%d') AS day,
                       CAST(count(*) AS BIGINT) AS new_users
                FROM f GROUP BY 1
            )
            SELECT day, new_users,
                   CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
                       AS cum_users
            FROM c
        """,
        "embed_quantize_error": """
            WITH s AS (
                SELECT vec_id, embedding,
                       CAST(list_max(list_transform(embedding,
                            x -> abs(x))) AS DOUBLE) AS sc
                FROM embeddings
            ),
            e AS (SELECT vec_id, sc, unnest(embedding) AS x FROM s),
            q AS (
                SELECT vec_id, sc, CAST(x AS DOUBLE) AS xd,
                       CASE WHEN sc > 0
                            THEN floor(CAST(x AS DOUBLE) * 127 / sc
                                       + 0.5)
                            ELSE 0.0 END AS qv
                FROM e
            ),
            g AS (
                SELECT vec_id,
                       CAST(floor((xd - qv * sc / 127) * 1e9 + 0.5)
                            AS BIGINT) AS ev
                FROM q
            )
            SELECT vec_id,
                   CAST(max(abs(ev)) AS BIGINT) AS max_abs_err_grid,
                   CAST(sum(ev * ev) AS BIGINT) AS sse_grid
            FROM g GROUP BY vec_id
        """,
        "minhash_est_error": f"""
            WITH {_PLANTED_SHINGLES_CTE},
            {_minhash_cte_chain()},
            pr AS (
                SELECT doc_id AS d1, doc_id + 1000000 AS d2
                FROM documents WHERE doc_id % 5 = 0
            ),
            est AS (
                SELECT pr.d1 AS doc_id,
                       count(*) FILTER (a.v = b.v) / 64.0 AS est
                FROM pr
                JOIN vals a ON a.doc_id = pr.d1
                JOIN vals b ON b.doc_id = pr.d2 AND b.p = a.p
                GROUP BY pr.d1
            ),
            co2 AS (
                SELECT pr.d1 AS doc_id, count(*) AS co
                FROM pr
                JOIN sh s1 ON s1.doc_id = pr.d1
                JOIN sh s2 ON s2.doc_id = pr.d2 AND s2.s = s1.s
                GROUP BY pr.d1
            ),
            jac AS (
                SELECT pr.d1 AS doc_id,
                       CASE WHEN x1.n + x2.n - COALESCE(co2.co, 0) = 0
                            THEN 1.0
                            ELSE COALESCE(co2.co, 0)
                                 / (x1.n + x2.n - COALESCE(co2.co, 0))
                       END AS j
                FROM pr
                JOIN sizes x1 ON x1.doc_id = pr.d1
                JOIN sizes x2 ON x2.doc_id = pr.d2
                LEFT JOIN co2 ON co2.doc_id = pr.d1
            )
            SELECT e.doc_id,
                   {_roundsql('e.est', 6)} AS est,
                   {_roundsql('j.j', 6)} AS jaccard,
                   {_roundsql(f"abs({_roundsql('e.est', 6)} - {_roundsql('j.j', 6)})", 6)}
                       AS abs_err
            FROM est e JOIN jac j USING (doc_id)
        """,
        "events_value_ecdf": f"""
            WITH p AS (SELECT unnest([{', '.join(str(p) for p in ECDF_PROBES)}]) AS probe),
            c AS (
                SELECT e.event_type, p.probe,
                       CAST(count(*) FILTER (e.value <= p.probe)
                            AS BIGINT) AS n_le,
                       CAST(count(*) AS BIGINT) AS n
                FROM events e CROSS JOIN p
                GROUP BY e.event_type, p.probe
            )
            SELECT event_type, CAST(probe AS BIGINT) AS probe, n_le, n,
                   {_roundsql('CAST(n_le AS DOUBLE) / CAST(n AS DOUBLE)', 6)}
                       AS frac
            FROM c
        """,
        "doc_length_hist": """
            WITH b AS (
                SELECT n_chars,
                       CASE WHEN n_chars <= 0 THEN -1
                            ELSE CAST(floor(log2(CAST(n_chars AS DOUBLE)))
                                 AS BIGINT)
                       END AS len_bin
                FROM documents
            )
            SELECT len_bin,
                   CAST(CASE WHEN len_bin < 0 THEN 0
                             ELSE 1 << len_bin END AS BIGINT) AS lo_chars,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM b GROUP BY len_bin
        """,
        "windowed_comention": f"""
            WITH md AS (
                SELECT DISTINCT conv_id, surface, turn_idx FROM {gm}
            )
            SELECT a.surface AS s1, b.surface AS s2,
                   CAST(count(*) AS BIGINT) AS n_windows
            FROM md a JOIN md b
              ON a.conv_id = b.conv_id AND a.surface < b.surface
             AND abs(a.turn_idx - b.turn_idx) <= 2
            GROUP BY a.surface, b.surface
        """,
        "el_candidate_topk": f"""
            WITH m AS (
                SELECT mention_id, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            k AS (
                SELECT mention_id, norm, 'n:' || norm AS bk FROM m
                UNION ALL
                SELECT mention_id, norm,
                       'p:' || substr(split_part(norm, ' ', 1), 1, 6)
                FROM m WHERE length(split_part(norm, ' ', 1)) >= 3
            ),
            p AS (
                SELECT DISTINCT a.mention_id AS m1, b.mention_id AS m2,
                       a.norm AS na, b.norm AS nb
                FROM k a JOIN k b ON a.bk = b.bk
                         AND a.mention_id != b.mention_id
            ),
            s AS (
                SELECT m1, m2,
                       floor(jaro_winkler_similarity(na, nb) * 1e5
                             + 0.5) / 1e5 AS jw
                FROM p
            ),
            r AS (
                SELECT m1, m2, jw,
                       row_number() OVER (PARTITION BY m1
                                          ORDER BY jw DESC, m2) AS rk
                FROM s
            )
            SELECT m1 AS mention_id, m2 AS candidate_id, jw,
                   CAST(rk AS BIGINT) AS rank
            FROM r WHERE rk <= 3
        """,
        "data_split_assign": """
            SELECT doc_id, source,
                   CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR))
                             % 100 < 90 THEN 'train'
                        WHEN md5_number_lower(CAST(doc_id AS VARCHAR))
                             % 100 < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "embed_pca_power": _pca_power_sql(),
        "embed_pca_scores": _pca_power_sql(final="""
        SELECT q.vec_id,
               CAST(sum(q.qv * v6.v) AS BIGINT) AS score_grid
        FROM q JOIN v6 ON v6.dim = q.dim
        GROUP BY q.vec_id"""),
        "near_dup_cluster_sizes": f"""
            WITH RECURSIVE {_PLANTED_SHINGLES_CTE},
            {_minhash_cte_chain()},
            dup AS (
                SELECT co.d1, co.d2
                FROM co
                JOIN sizes s1 ON co.d1 = s1.doc_id
                JOIN sizes s2 ON co.d2 = s2.doc_id
                WHERE {_roundsql('co.co / (s1.n + s2.n - co.co)', 6)} >= 0.8
            ),
            und AS (
                SELECT d1 AS a, d2 AS b FROM dup
                UNION SELECT d2, d1 FROM dup
            ),
            reach(node, lab) AS (
                SELECT a, a FROM und
                UNION
                SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
            ),
            canon AS (
                SELECT node, min(lab) AS canonical_id FROM reach
                GROUP BY node
            ),
            res AS (
                SELECT d.doc_id,
                       COALESCE(c.canonical_id, d.doc_id) AS canonical_id
                FROM docs d LEFT JOIN canon c ON c.node = d.doc_id
            ),
            cs AS (
                SELECT canonical_id, CAST(count(*) AS BIGINT) AS sz
                FROM res GROUP BY 1
            )
            SELECT sz AS cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters
            FROM cs GROUP BY sz
        """,
        "cross_source_dups": f"""
            WITH {_PLANTED_SHINGLES_CTE},
            co AS (
                SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS co
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh
                      GROUP BY doc_id),
            jp AS (
                SELECT co.d1, co.d2
                FROM co
                JOIN sizes s1 ON co.d1 = s1.doc_id
                JOIN sizes s2 ON co.d2 = s2.doc_id
                WHERE {_roundsql('co.co / (s1.n + s2.n - co.co)', 6)} >= 0.5
            ),
            src AS (
                SELECT jp.d1, jp.d2,
                       da.source AS sa, db.source AS sb
                FROM jp
                JOIN documents da ON da.doc_id = jp.d1 % 1000000
                JOIN documents db ON db.doc_id = jp.d2 % 1000000
            )
            SELECT least(sa, sb) AS source_1,
                   greatest(sa, sb) AS source_2,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM src GROUP BY 1, 2
        """,
        "conv_vocab_overlap": f"""
            WITH t AS (
                SELECT conv_id, role,
                       unnest(regexp_extract_all(lower(text),
                              '[a-z0-9]+')) AS tok
                FROM {tr} WHERE role IN ('user', 'assistant')
            ),
            d AS (SELECT DISTINCT conv_id, role, tok FROM t),
            s AS (
                SELECT conv_id, tok, count(DISTINCT role) AS nr
                FROM d GROUP BY conv_id, tok
            ),
            agg AS (
                SELECT d.conv_id,
                       CAST(count(*) FILTER (role = 'user') AS BIGINT)
                           AS n_user_vocab,
                       CAST(count(*) FILTER (role = 'assistant')
                            AS BIGINT) AS n_assistant_vocab
                FROM d GROUP BY d.conv_id
            ),
            sh AS (
                SELECT conv_id,
                       CAST(count(*) FILTER (nr = 2) AS BIGINT)
                           AS n_shared
                FROM s GROUP BY conv_id
            )
            SELECT a.conv_id, a.n_user_vocab, a.n_assistant_vocab,
                   sh.n_shared,
                   CASE WHEN a.n_user_vocab + a.n_assistant_vocab
                             - sh.n_shared = 0 THEN 0.0
                        ELSE {_roundsql(
                            'CAST(sh.n_shared AS DOUBLE) '
                            '/ (a.n_user_vocab + a.n_assistant_vocab '
                            '- sh.n_shared)', 6)}
                   END AS jaccard
            FROM agg a JOIN sh USING (conv_id)
        """,
        "tpch_q9": """
            WITH base AS (
                SELECT s_nationkey,
                       CAST(year(o_orderdate) AS BIGINT) AS o_year,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5)
                                     AS BIGINT))
                       - CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                         * CAST(floor(l_quantity + 0.5) AS BIGINT) * 100
                           AS profit
                FROM lineitem
                JOIN part ON p_partkey = l_partkey
                         AND p_name LIKE '%red%'
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON o_orderkey = l_orderkey
            )
            SELECT n_name AS nation, o_year,
                   floor(CAST(sum(profit) AS DOUBLE) / 10000.0 * 100
                         + 0.5) / 100 AS profit
            FROM base JOIN nation ON n_nationkey = s_nationkey
            GROUP BY 1, 2
        """,
        "minhash_band_stats": f"""
            WITH {_PLANTED_SHINGLES_CTE},
            {_minhash_cte_chain()},
            bsz AS (
                SELECT band, bkey, CAST(count(*) AS BIGINT) AS sz
                FROM bands GROUP BY band, bkey
            )
            SELECT sz AS bucket_size,
                   CAST(count(*) AS BIGINT) AS n_buckets,
                   CAST(count(*) * (sz * (sz - 1) // 2) AS BIGINT)
                       AS cand_pairs
            FROM bsz GROUP BY sz
        """,
        "comention_degree_hist": f"""
            WITH m AS (SELECT DISTINCT conv_id, surface FROM {gm}),
            e AS (
                SELECT DISTINCT a.surface AS s1, b.surface AS s2
                FROM m a JOIN m b ON a.conv_id = b.conv_id
                         AND a.surface < b.surface
            ),
            und AS (
                SELECT s1 AS s FROM e UNION ALL SELECT s2 FROM e
            ),
            deg AS (
                SELECT s, CAST(count(*) AS BIGINT) AS degree
                FROM und GROUP BY s
            )
            SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY degree
        """,
        "doc_containment": f"""
            WITH {_PLANTED_SHINGLES_CTE},
            co AS (
                SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS co
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
            SELECT co.d1, co.d2, CAST(co.co AS BIGINT) AS co,
                   {_roundsql('co.co / s1.n', 6)} AS c1,
                   {_roundsql('co.co / s2.n', 6)} AS c2
            FROM co
            JOIN sizes s1 ON co.d1 = s1.doc_id
            JOIN sizes s2 ON co.d2 = s2.doc_id
            WHERE greatest({_roundsql('co.co / s1.n', 6)},
                           {_roundsql('co.co / s2.n', 6)}) >= 0.6
        """,
        "minhash_dedup": f"""
            WITH {_PLANTED_SHINGLES_CTE},
            {_minhash_cte_chain()}
            SELECT co.d1, co.d2,
                   {_roundsql('co.co / (s1.n + s2.n - co.co)', 6)} AS jaccard,
                   CAST(0 AS BIGINT) AS dropped_pairs
            FROM co
            JOIN sizes s1 ON co.d1 = s1.doc_id
            JOIN sizes s2 ON co.d2 = s2.doc_id
            WHERE {_roundsql('co.co / (s1.n + s2.n - co.co)', 6)} >= 0.8
        """,
        # connected components over the verified minhash pairs via a
        # recursive reachability CTE (min reachable doc_id = the
        # canonical representative), attached onto the planted corpus
        "near_dup_resolve": f"""
            WITH RECURSIVE {_PLANTED_SHINGLES_CTE},
            {_minhash_cte_chain()},
            dup AS (
                SELECT co.d1, co.d2
                FROM co
                JOIN sizes s1 ON co.d1 = s1.doc_id
                JOIN sizes s2 ON co.d2 = s2.doc_id
                WHERE {_roundsql('co.co / (s1.n + s2.n - co.co)', 6)} >= 0.8
            ),
            und AS (
                SELECT d1 AS a, d2 AS b FROM dup
                UNION SELECT d2, d1 FROM dup
            ),
            reach(node, lab) AS (
                SELECT a, a FROM und
                UNION
                SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
            ),
            canon AS (
                SELECT node, min(lab) AS canonical_id FROM reach
                GROUP BY node
            )
            SELECT d.doc_id,
                   CAST(COALESCE(c.canonical_id, d.doc_id) AS BIGINT)
                       AS canonical_id,
                   CAST(CASE WHEN COALESCE(c.canonical_id, d.doc_id)
                                  = d.doc_id
                             THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM docs d LEFT JOIN canon c ON c.node = d.doc_id
        """,
        # the curation composite: same minhash chain + recursive CC
        # over the exact+near planted corpus, scalar gates inline,
        # first failed gate (GATES order) wins the reason
        "corpus_curation": f"""
            WITH RECURSIVE {_CURATION_SHINGLES_CTE},
            {_minhash_cte_chain()},
            dup AS (
                SELECT co.d1, co.d2
                FROM co
                JOIN sizes s1 ON co.d1 = s1.doc_id
                JOIN sizes s2 ON co.d2 = s2.doc_id
                WHERE {_roundsql('co.co / (s1.n + s2.n - co.co)', 6)} >= 0.8
            ),
            und AS (
                SELECT d1 AS a, d2 AS b FROM dup
                UNION SELECT d2, d1 FROM dup
            ),
            reach(node, lab) AS (
                SELECT a, a FROM und
                UNION
                SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
            ),
            canon AS (
                SELECT node, min(lab) AS canonical_id FROM reach
                GROUP BY node
            ),
            stc AS (SELECT doc_id, text, {toks} AS toks FROM docs),
            lc AS (SELECT doc_id, {lang_counts} FROM stc),
            lg AS (
                SELECT doc_id,
                   CASE WHEN greatest(c_de, c_en, c_es, c_fr, c_zh) = 0 THEN 'und'
                        WHEN c_de = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'de'
                        WHEN c_en = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'en'
                        WHEN c_es = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'es'
                        WHEN c_fr = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'fr'
                        ELSE 'zh' END AS lang_guess
                FROM lc
            ),
            st AS (
                SELECT d.doc_id, lg.lang_guess,
                       len(regexp_extract_all(d.text, '[A-Za-z0-9]+'))
                           AS n_tokens,
                       min(d.doc_id) OVER (PARTITION BY d.text) AS exact_min
                FROM docs d JOIN lg USING (doc_id)
            )
            SELECT st.doc_id, st.lang_guess,
                   CAST(st.n_tokens AS BIGINT) AS n_tokens,
                   CASE WHEN st.lang_guess != 'en' THEN 'lang'
                        WHEN st.n_tokens < 15 THEN 'quality'
                        WHEN st.doc_id != st.exact_min THEN 'exact_dup'
                        WHEN COALESCE(c.canonical_id, st.doc_id)
                             != st.doc_id THEN 'near_dup'
                        ELSE '' END AS reason
            FROM st LEFT JOIN canon c ON c.node = st.doc_id
        """,
        "simhash_dedup": f"""
            WITH {_PLANTED_SHINGLES_CTE},
            tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM docs),
            th AS (SELECT doc_id, md5_number_lower(tok)::UBIGINT AS h
                   FROM tok WHERE tok != ''),
            -- weighted bit-vote per (doc, bit): token multiplicity counts
            bits AS (
                SELECT doc_id, i,
                       sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM th CROSS JOIN (SELECT unnest(range(64)) AS i) g
                GROUP BY doc_id, i
            ),
            sig0 AS (
                SELECT doc_id,
                       string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, ''
                                  ORDER BY i) AS s
                FROM bits GROUP BY doc_id
            ),
            sig AS (
                SELECT d.doc_id, COALESCE(s0.s, repeat('0', 64)) AS s
                FROM (SELECT DISTINCT doc_id FROM docs) d
                LEFT JOIN sig0 s0 USING (doc_id)
            )
            -- all-pairs hamming: exact, because the Python path's
            -- 4-block pigeonhole bucketing has 100% recall at
            -- max_hamming=3 and the 200-doc bucket cap is never hit at
            -- this scale (dropped_pairs is 0 on every emitted row)
            SELECT a.doc_id AS d1, b.doc_id AS d2,
                   CAST(hamming(a.s, b.s) AS BIGINT) AS hamming,
                   CAST(0 AS BIGINT) AS dropped_pairs
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE hamming(a.s, b.s) <= 3
        """,
        "hard_negatives": f"""
            WITH q AS (SELECT vec_id AS q_id, label AS ql,
                              CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id < 3),
            s AS (SELECT q.q_id, e.vec_id,
                         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
                  FROM q CROSS JOIN embeddings e
                  WHERE e.label != q.ql),
            r AS (SELECT q_id, vec_id, sim,
                         row_number() OVER (PARTITION BY q_id
                                            ORDER BY sim DESC, vec_id) AS rank
                  FROM s)
            SELECT q_id, vec_id, {_roundsql('sim', 5)} AS sim, rank
            FROM r WHERE rank <= 10
        """,
        "ann_topk": f"""
            WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id < 3),
            s AS (SELECT q.q_id, e.vec_id,
                         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
                  FROM q CROSS JOIN embeddings e),
            r AS (SELECT q_id, vec_id, sim,
                         row_number() OVER (PARTITION BY q_id
                                            ORDER BY sim DESC, vec_id) AS rank
                  FROM s)
            SELECT q_id, vec_id, {_roundsql('sim', 5)} AS sim, rank
            FROM r WHERE rank <= 10
        """,
        "ann_lsh": f"""
            WITH planes AS (SELECT * FROM (VALUES {_lsh_planes_values()})
                            AS t(i, p)),
            emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
            sig AS (
                SELECT vec_id,
                       CAST(sum(CASE WHEN list_dot_product(e, p) > 0
                                     THEN 1 << i ELSE 0 END) AS BIGINT) AS s
                FROM emb CROSS JOIN planes GROUP BY vec_id
            ),
            q AS (SELECT vec_id AS q_id, e AS qe FROM emb WHERE vec_id < 3),
            qs AS (SELECT vec_id AS q_id, s AS qsig FROM sig
                   WHERE vec_id < 3),
            cand AS (
                SELECT qs.q_id, xs.vec_id,
                       list_cosine_similarity(q.qe, x.e) AS sim
                FROM qs
                JOIN q ON q.q_id = qs.q_id
                JOIN sig xs ON bit_count(xor(xs.s, qs.qsig)) <= 3
                JOIN emb x ON x.vec_id = xs.vec_id
            ),
            r AS (
                SELECT q_id, vec_id, sim,
                       row_number() OVER (PARTITION BY q_id
                                          ORDER BY sim DESC, vec_id) AS rank
                FROM cand
            )
            SELECT q_id, vec_id, {_roundsql('sim', 5)} AS sim, rank
            FROM r WHERE rank <= 10
        """,
        "ann_ivf": f"""
            WITH cent AS (SELECT * FROM (VALUES {ivf_cent})
                          AS t(c_id, c)),
            emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
            -- argmax over centroids of dot(x, c): scale-invariant in x,
            -- so the raw embedding replays the engine's normalized
            -- assignment; ties (exact float equality) break to the
            -- lowest c_id on both sides (numpy argmax = first index)
            scored AS (SELECT vec_id, c_id, list_dot_product(e, c) AS d
                       FROM emb CROSS JOIN cent),
            assign AS (
                SELECT vec_id, c_id FROM (
                    SELECT vec_id, c_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY d DESC, c_id) AS rn
                    FROM scored) WHERE rn = 1
            ),
            q AS (SELECT vec_id AS q_id, e AS qe FROM emb WHERE vec_id < 3),
            probes AS (
                SELECT q_id, c_id FROM (
                    SELECT q.q_id, s.c_id,
                           row_number() OVER (PARTITION BY q.q_id
                                              ORDER BY s.d DESC, s.c_id) AS rn
                    FROM q JOIN scored s ON s.vec_id = q.q_id
                ) WHERE rn <= 6
            ),
            cand AS (SELECT p.q_id, a.vec_id
                     FROM probes p JOIN assign a ON a.c_id = p.c_id),
            sims AS (
                SELECT c.q_id, c.vec_id,
                       list_cosine_similarity(q.qe, e.e) AS sim
                FROM cand c
                JOIN q ON q.q_id = c.q_id
                JOIN emb e ON e.vec_id = c.vec_id
            ),
            r AS (SELECT q_id, vec_id, sim,
                         row_number() OVER (PARTITION BY q_id
                                            ORDER BY sim DESC, vec_id) AS rank
                  FROM sims)
            SELECT q_id, vec_id, {_roundsql('sim', 5)} AS sim, rank
            FROM r WHERE rank <= 10
        """,
        "bm25_topk": f"""
            WITH q(q_id, qtoks) AS (VALUES {", ".join(
                "({}, [{}])".format(
                    i, ", ".join(repr(t) for t in qs.lower().split()))
                for i, qs in enumerate(BM25_QUERIES))}),
            toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9]+')
                                AS tk
                     FROM documents),
            stats AS (SELECT count(*) AS n,
                             CAST(sum(len(tk)) AS DOUBLE) / count(*)
                                 AS avgdl
                      FROM toks),
            terms AS (SELECT DISTINCT unnest(qtoks) AS term FROM q),
            dfreq AS (
                SELECT term, count(*) AS df
                FROM terms, toks
                WHERE len(list_filter(tk, x -> x = term)) > 0
                GROUP BY term
            ),
            idf AS (
                SELECT t.term,
                       ln(1 + (s.n - coalesce(d.df, 0) + 0.5)
                              / (coalesce(d.df, 0) + 0.5)) AS idf
                FROM terms t LEFT JOIN dfreq d USING (term)
                CROSS JOIN stats s
            ),
            qterm AS (SELECT q_id, unnest(qtoks) AS term FROM q),
            -- one row per (query token occurrence, doc): duplicate
            -- query tokens contribute once per occurrence (query tf)
            contrib AS (
                SELECT qt.q_id, t.doc_id,
                       i.idf
                       * (len(list_filter(t.tk, x -> x = qt.term))
                          * (1.2 + 1.0))
                       / (len(list_filter(t.tk, x -> x = qt.term))
                          + 1.2 * (1.0 - 0.75
                                   + 0.75 * (len(t.tk) / s.avgdl)))
                           AS c
                FROM qterm qt
                JOIN idf i USING (term)
                CROSS JOIN stats s
                CROSS JOIN toks t
            ),
            sc AS (SELECT q_id, doc_id, sum(c) AS score
                   FROM contrib GROUP BY 1, 2),
            r AS (SELECT q_id, doc_id, score,
                         row_number() OVER (PARTITION BY q_id
                                            ORDER BY score DESC, doc_id)
                             AS rank
                  FROM sc)
            SELECT q_id, doc_id, {_roundsql('score', 5)} AS score, rank
            FROM r WHERE rank <= 10
        """,
        "embedding_dups": f"""
            WITH planes AS (SELECT * FROM
                            (VALUES {_lsh_planes_values(10, 64, 5)})
                            AS t(i, p)),
            emb AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id,
                       CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings WHERE vec_id % 7 = 0
            ),
            sig AS (
                SELECT vec_id,
                       CAST(sum(CASE WHEN list_dot_product(e, p) > 0
                                     THEN 1 << i ELSE 0 END) AS BIGINT) AS s
                FROM emb CROSS JOIN planes GROUP BY vec_id
            )
            -- in-bucket exact cosine; the 500-per-bucket cap never
            -- trips at this scale, so dropped_pairs is 0 on every row
            SELECT a.vec_id AS d1, b.vec_id AS d2,
                   {_roundsql('list_cosine_similarity(ea.e, eb.e)', 5)}
                       AS sim,
                   CAST(0 AS BIGINT) AS dropped_pairs
            FROM sig a
            JOIN sig b ON a.s = b.s AND a.vec_id < b.vec_id
            JOIN emb ea ON ea.vec_id = a.vec_id
            JOIN emb eb ON eb.vec_id = b.vec_id
            WHERE list_cosine_similarity(ea.e, eb.e) >= 0.9999
        """,
        "semantic_dedup": f"""
            WITH cent AS (SELECT * FROM (VALUES {ivf_cent})
                          AS t(c_id, c)),
            emb AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id,
                       list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> x + 0.03) AS e
                FROM embeddings WHERE vec_id % 5 = 0
            ),
            -- argmax assignment is scale-invariant in e, ties to the
            -- lowest c_id on both sides (numpy argmax = first index)
            scored AS (SELECT vec_id, c_id, list_dot_product(e, c) AS d
                       FROM emb CROSS JOIN cent),
            assign AS (
                SELECT vec_id, c_id FROM (
                    SELECT vec_id, c_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY d DESC, c_id) AS rn
                    FROM scored) WHERE rn = 1
            ),
            -- keep-lowest-id greedy: dropped iff SOME lower-id row of
            -- the same cluster is cosine >= 0.9 (independent of that
            -- row's own keep status)
            dup AS (
                SELECT DISTINCT a2.vec_id
                FROM assign a1
                JOIN assign a2 ON a1.c_id = a2.c_id
                              AND a1.vec_id < a2.vec_id
                JOIN emb e1 ON e1.vec_id = a1.vec_id
                JOIN emb e2 ON e2.vec_id = a2.vec_id
                WHERE list_cosine_similarity(e1.e, e2.e) >= 0.9
            )
            SELECT a.vec_id, CAST(a.c_id AS BIGINT) AS cluster,
                   (a.vec_id NOT IN (SELECT vec_id FROM dup)) AS keep
            FROM assign a
        """,
        "embedding_dups_exact": f"""
            WITH emb AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id,
                       CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings WHERE vec_id % 7 = 0
            )
            SELECT a.vec_id AS d1, b.vec_id AS d2,
                   {_roundsql('list_cosine_similarity(a.e, b.e)', 5)} AS sim
            FROM emb a JOIN emb b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.9999
        """,
        "events_anomaly": f"""
            WITH b AS (
                SELECT event_type, date_trunc('hour', ts) AS hour,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY 1, 2
            ),
            w AS (
                SELECT event_type, hour, c,
                       CAST(sum(c) OVER tw AS BIGINT) AS s,
                       CAST(sum(c * c) OVER tw AS BIGINT) AS ss,
                       count(*) OVER tw AS nw
                FROM b
                WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                              ROWS BETWEEN 6 PRECEDING
                              AND 1 PRECEDING)
            )
            SELECT event_type, hour, c AS n,
                   {_roundsql(
                       "CASE WHEN 6 * ss - s * s > 0 THEN "
                       "(CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / 6) "
                       "/ sqrt(CAST(6 * ss - s * s AS DOUBLE) / 30.0) "
                       "ELSE 0.0 END", 6)} AS z
            FROM w WHERE nw = 6
        """,
        "events_hourly": f"""
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n,
                   {_roundsql('sum(value)', 2)} AS sum_value
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "hopping_window": f"""
            WITH e AS (
                SELECT event_type, value, epoch_us(ts) AS tu FROM events
            ),
            w AS (
                SELECT event_type, value,
                       (tu // 900000000 - k) * 900000000 AS window_start_us
                FROM e, unnest([0, 1, 2, 3]) AS u(k)
            )
            SELECT event_type, window_start_us,
                   count(*) AS n_events,
                   {_roundsql('sum(value)', 4)} AS sum_value
            FROM w GROUP BY event_type, window_start_us
        """,
        "cohort_retention": f"""
            WITH f AS (SELECT user_id, date_trunc('day', min(ts))
                              AS cohort
                       FROM events GROUP BY user_id),
            a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
                  FROM events)
            SELECT f.cohort AS cohort_day,
                   CAST(date_diff('day', f.cohort, a.d) AS BIGINT)
                       AS day_offset,
                   CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
            FROM f JOIN a USING (user_id)
            WHERE date_diff('day', f.cohort, a.d) IN (0, 1, 7)
            GROUP BY 1, 2
        """,
        "latest_event_state": f"""
            SELECT user_id, event_type, event_id, ts,
                   {_roundsql('value', 4)} AS value
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "orders_no_recent_lineitem": f"""
            SELECT o.o_orderkey, o.o_orderdate
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND NOT EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate <= o.o_orderdate
                                        + INTERVAL 90 DAY)
        """,
        "kmv_distinct": f"""
            WITH h AS (
                SELECT DISTINCT event_type,
                       md5_number_lower(CAST(user_id AS VARCHAR))::UBIGINT
                           AS h
                FROM events
            ),
            r AS (SELECT event_type, h,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY h) AS rn
                  FROM h),
            agg AS (SELECT event_type, count(*) AS m,
                           min(CASE WHEN rn = 64 THEN h END) AS hk
                    FROM r GROUP BY event_type)
            SELECT event_type, CAST(64 AS BIGINT) AS k_used,
                   {_roundsql(
                       "CASE WHEN m < 64 THEN CAST(m AS DOUBLE) "
                       "ELSE 63.0 / (CAST(hk AS DOUBLE) "
                       "/ 18446744073709551616.0) END", 4)}
                       AS est_distinct
            FROM agg
        """,
        "event_funnel": f"""
            WITH e AS (SELECT user_id, ts, event_id, event_type
                       FROM events),
            s1 AS (
                SELECT user_id, ts, event_id FROM (
                    SELECT user_id, ts, event_id,
                           row_number() OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS rn
                    FROM e WHERE event_type = 'view') WHERE rn = 1
            ),
            s2 AS (
                SELECT user_id, ts, event_id FROM (
                    SELECT e.user_id, e.ts, e.event_id,
                           row_number() OVER (PARTITION BY e.user_id
                                              ORDER BY e.ts, e.event_id)
                               AS rn
                    FROM e JOIN s1 USING (user_id)
                    WHERE e.event_type = 'click'
                      AND (e.ts, e.event_id) > (s1.ts, s1.event_id))
                WHERE rn = 1
            ),
            s3 AS (
                SELECT user_id, ts, event_id FROM (
                    SELECT e.user_id, e.ts, e.event_id,
                           row_number() OVER (PARTITION BY e.user_id
                                              ORDER BY e.ts, e.event_id)
                               AS rn
                    FROM e JOIN s2 USING (user_id)
                    WHERE e.event_type = 'purchase'
                      AND (e.ts, e.event_id) > (s2.ts, s2.event_id))
                WHERE rn = 1
            ),
            u AS (SELECT DISTINCT user_id FROM e)
            SELECT u.user_id,
                   CASE WHEN s3.user_id IS NOT NULL THEN 3
                        WHEN s2.user_id IS NOT NULL THEN 2
                        WHEN s1.user_id IS NOT NULL THEN 1
                        ELSE 0 END AS steps_completed,
                   (s3.user_id IS NOT NULL) AS converted
            FROM u
            LEFT JOIN s1 ON s1.user_id = u.user_id
            LEFT JOIN s2 ON s2.user_id = u.user_id
            LEFT JOIN s3 ON s3.user_id = u.user_id
        """,
        "interval_join": f"""
            WITH e AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_start
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT *, SUM(is_start) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS session_no
                FROM e
            ), sess AS (
                SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
                       MIN(ts) AS session_start, MAX(ts) AS session_end
                FROM s GROUP BY user_id, session_no
            )
            SELECT ev.user_id, ev.event_id, ev.ts, sess.session_no
            FROM events ev
            JOIN sess ON sess.user_id = ev.user_id
                     AND ev.ts BETWEEN sess.session_start
                                   AND sess.session_end
        """,
        "sessionize": f"""
            WITH e AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_start
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT *, SUM(is_start) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS session_no
                FROM e
            )
            SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
                   MIN(ts) AS session_start, MAX(ts) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   {_roundsql('SUM(value)', 2)} AS sum_value
            FROM s GROUP BY user_id, session_no
        """,
"sessionize_chunked": f"""
            WITH e AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_start
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT *, SUM(is_start) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS session_no
                FROM e
            )
            SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
                   MIN(ts) AS session_start, MAX(ts) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   {_roundsql('SUM(value)', 2)} AS sum_value
            FROM s GROUP BY user_id, session_no
        """,
        "click_attribution": """
            SELECT c.event_id, c.ts, c.user_id, c.value,
                   v.event_id AS view_event_id, v.ts AS view_ts
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'view') v
              ON c.user_id = v.user_id AND c.ts >= v.ts
        """,
        "segment_revenue": f"""
            SELECT c.c_mktsegment,
                   count(*) AS n_orders,
                   {_roundsql('sum(o.o_totalprice)', 2)} AS total_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "orders_topk_revenue": f"""
            SELECT o.o_orderkey,
                   o.o_orderdate,
                   {_roundsql(
                       "sum(l.l_extendedprice * (1.0 - l.l_discount))", 4)}
                       AS revenue
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY o.o_orderkey, o.o_orderdate
            ORDER BY revenue DESC, o.o_orderdate, o.o_orderkey
            LIMIT 10
        """,
        "el_mutual_best": f"""
            WITH s AS (SELECT mention_id, {norm} AS norm FROM {gm}),
            sc AS (
                SELECT p.m1_id, p.m2_id,
                       {_roundsql('jaro_winkler_similarity(s1.norm, s2.norm)', 5)}
                           AS jw
                FROM {gp} p
                JOIN s s1 ON p.m1_id = s1.mention_id
                JOIN s s2 ON p.m2_id = s2.mention_id
            ),
            d AS (
                SELECT m1_id AS src, m2_id AS dst, jw FROM sc
                UNION ALL
                SELECT m2_id, m1_id, jw FROM sc
            ),
            r AS (
                SELECT src, dst, jw,
                       row_number() OVER (
                           PARTITION BY src ORDER BY jw DESC, dst
                       ) AS rn
                FROM d
            ),
            b AS (SELECT src, dst, jw FROM r WHERE rn = 1)
            SELECT x.src AS m1_id, x.dst AS m2_id, x.jw AS jw
            FROM b x JOIN b y ON x.src = y.dst AND x.dst = y.src
            WHERE x.src < x.dst
        """,
        "el_golden_record": f"""
            WITH f AS (
                SELECT mention_id, conv_id, surface, {norm} AS norm
                FROM {gm} WHERE {norm} != ''
            ),
            r AS (
                SELECT norm, mention_id, surface,
                       row_number() OVER (
                           PARTITION BY norm
                           ORDER BY length(surface) DESC, mention_id
                       ) AS rn
                FROM f
            ),
            a AS (
                SELECT norm, min(mention_id) AS cluster_id,
                       CAST(count(*) AS BIGINT) AS n_members,
                       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
                FROM f GROUP BY norm
            )
            SELECT a.cluster_id, r.mention_id AS canonical_mention,
                   r.surface AS canonical_surface, a.n_members, a.n_convs
            FROM a JOIN r ON r.norm = a.norm AND r.rn = 1
        """,
        "el_block_keys_rare": f"""
            WITH m AS (
                SELECT mention_id, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            tok AS (
                SELECT DISTINCT mention_id, t FROM (
                    SELECT mention_id,
                           unnest(str_split(norm, ' ')) AS t
                    FROM m
                )
            ),
            tdf AS (
                SELECT t, CAST(count(*) AS BIGINT) AS n
                FROM tok GROUP BY t
            ),
            r AS (
                SELECT tok.mention_id, tok.t,
                       row_number() OVER (
                           PARTITION BY tok.mention_id
                           ORDER BY tdf.n, tok.t
                       ) AS rn
                FROM tok JOIN tdf ON tdf.t = tok.t
            )
            SELECT mention_id, 'r:' || t AS block_key
            FROM r WHERE rn = 1
        """,
        "el_dedupe_e2e": f"""
            WITH RECURSIVE f AS (
                SELECT mention_id, surface, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            k AS (
                SELECT mention_id, 'n:' || norm AS bk FROM f
                UNION ALL
                SELECT mention_id,
                       'p:' || substr(split_part(norm, ' ', 1), 1, 6)
                           AS bk
                FROM f WHERE length(split_part(norm, ' ', 1)) >= 3
            ),
            p AS (
                SELECT DISTINCT a.mention_id AS m1, b.mention_id AS m2
                FROM k a JOIN k b ON a.bk = b.bk
                         AND a.mention_id < b.mention_id
            ),
            e AS (
                SELECT p.m1 AS a, p.m2 AS b
                FROM p
                JOIN f s1 ON s1.mention_id = p.m1
                JOIN f s2 ON s2.mention_id = p.m2
                WHERE floor(jaro_winkler_similarity(s1.norm, s2.norm)
                            * 1e5 + 0.5) / 1e5 >= 0.92
            ),
            und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
            reach(node, lab) AS (
                SELECT a, a FROM und
                UNION
                SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
            ),
            canon AS (
                SELECT node, min(lab) AS ent FROM reach GROUP BY node
            ),
            comp AS (
                SELECT f.mention_id,
                       COALESCE(c.ent, f.mention_id) AS entity_id,
                       f.surface
                FROM f LEFT JOIN canon c ON c.node = f.mention_id
            ),
            r AS (
                SELECT entity_id, mention_id, surface,
                       row_number() OVER (
                           PARTITION BY entity_id
                           ORDER BY length(surface) DESC, mention_id
                       ) AS rn
                FROM comp
            )
            SELECT comp.mention_id, comp.entity_id,
                   r.surface AS canonical_surface
            FROM comp JOIN r ON r.entity_id = comp.entity_id
                            AND r.rn = 1
        """,
        "el_pr_curve": f"""
            WITH s AS (SELECT mention_id, {norm} AS norm FROM {gm}),
            sc AS (
                SELECT CAST(floor(jaro_winkler_similarity(
                           s1.norm, s2.norm) * 1e5 + 0.5) AS BIGINT)
                           AS jw5,
                       p.same_entity AS same
                FROM {gp} p
                JOIN s s1 ON p.m1_id = s1.mention_id
                JOIN s s2 ON p.m2_id = s2.mention_id
            ),
            thr AS (SELECT unnest([{', '.join(str(t) for t in PR_CURVE_THRESHOLDS)}]) AS thr_pct),
            conf AS (
                SELECT t.thr_pct,
                       CAST(sum(CASE WHEN sc.jw5 >= t.thr_pct * 1000
                                      AND sc.same THEN 1 ELSE 0 END)
                            AS BIGINT) AS tp,
                       CAST(sum(CASE WHEN sc.jw5 >= t.thr_pct * 1000
                                      AND NOT sc.same THEN 1 ELSE 0 END)
                            AS BIGINT) AS fp,
                       CAST(sum(CASE WHEN sc.jw5 < t.thr_pct * 1000
                                      AND sc.same THEN 1 ELSE 0 END)
                            AS BIGINT) AS fn,
                       CAST(sum(CASE WHEN sc.jw5 < t.thr_pct * 1000
                                      AND NOT sc.same THEN 1 ELSE 0 END)
                            AS BIGINT) AS tn
                FROM thr t CROSS JOIN sc
                GROUP BY t.thr_pct
            )
            SELECT CAST(thr_pct AS BIGINT) AS thr_pct, tp, fp, fn, tn,
                   {_roundsql('CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 1.0 END', 6)} AS precision,
                   {_roundsql('CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 1.0 END', 6)} AS recall,
                   {_roundsql("CASE WHEN (CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 1.0 END) + (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 1.0 END) > 0 THEN 2.0 * (CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 1.0 END) * (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 1.0 END) / ((CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 1.0 END) + (CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 1.0 END)) ELSE 0.0 END", 6)} AS f1
            FROM conf
        """,
        "el_soft_tfidf": f"""
            WITH m AS (
                SELECT mention_id, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            tok AS (
                SELECT DISTINCT mention_id, t FROM (
                    SELECT mention_id,
                           unnest(str_split(norm, ' ')) AS t
                    FROM m
                )
            ),
            nm AS (SELECT count(DISTINCT mention_id) AS n FROM tok),
            tdf AS (SELECT t, count(*) AS d FROM tok GROUP BY t),
            w AS (
                SELECT t,
                       CAST(floor(ln((nm.n + 1.0) / (tdf.d + 1.0)) * 1e6
                                  + 0.5) AS BIGINT) AS q
                FROM tdf, nm
            ),
            vtok AS (
                SELECT tok.mention_id, tok.t, w.q
                FROM tok JOIN w ON w.t = tok.t
            ),
            nrm AS (
                SELECT mention_id,
                       sqrt(CAST(sum(q * q) AS DOUBLE)) AS rn
                FROM vtok GROUP BY mention_id
            ),
            x AS (
                SELECT p.m1_id, p.m2_id, ta.t AS at, ta.q AS aw,
                       tb.t AS bt, tb.q AS bw,
                       floor(jaro_winkler_similarity(ta.t, tb.t) * 1e5
                             + 0.5) / 1e5 AS j
                FROM {gp} p
                JOIN vtok ta ON ta.mention_id = p.m1_id
                JOIN vtok tb ON tb.mention_id = p.m2_id
            ),
            best AS (
                SELECT m1_id, m2_id, at, aw, bw, j,
                       row_number() OVER (
                           PARTITION BY m1_id, m2_id, at
                           ORDER BY j DESC, bt
                       ) AS rnk
                FROM x
            ),
            score AS (
                SELECT b.m1_id, b.m2_id,
                       list_sum(list(
                           (b.aw / n1.rn) * (b.bw / n2.rn) * b.j
                           ORDER BY b.at
                       )) AS s
                FROM best b
                JOIN nrm n1 ON n1.mention_id = b.m1_id
                JOIN nrm n2 ON n2.mention_id = b.m2_id
                WHERE b.rnk = 1 AND b.j >= {SOFT_TFIDF_THETA}
                GROUP BY b.m1_id, b.m2_id
            )
            SELECT p.m1_id, p.m2_id,
                   {_roundsql('COALESCE(sc.s, 0.0)', 6)} AS soft_tfidf
            FROM {gp} p
            LEFT JOIN score sc ON sc.m1_id = p.m1_id
                              AND sc.m2_id = p.m2_id
        """,
        "orders_rfm": """
            SELECT o_custkey,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       / 100.0 AS total_price,
                   min(o_orderdate) AS first_order,
                   max(o_orderdate) AS last_order
            FROM orders GROUP BY o_custkey
        """,
        "el_alias_ambiguity": f"""
            WITH f AS (
                SELECT {norm} AS alias_norm, gold_kb_id AS gold
                FROM {gm} WHERE {norm} != ''
            )
            SELECT alias_norm,
                   CAST(count(*) AS BIGINT) AS n_mentions,
                   CAST(count(DISTINCT gold) AS BIGINT) AS n_entities,
                   count(DISTINCT gold) > 1 AS is_ambiguous
            FROM f GROUP BY alias_norm
        """,
        "el_cluster_vmeasure": f"""
            WITH f AS (
                SELECT {norm} AS norm, gold_kb_id AS gold FROM {gm}
                WHERE {norm} != ''
            ),
            nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
            ng AS (
                SELECT norm, gold, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY norm, gold
            ),
            na AS (
                SELECT norm, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY norm
            ),
            nb AS (
                SELECT gold, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY gold
            ),
            qhc AS (
                SELECT CAST(COALESCE(sum(CAST(floor(
                    CAST(na.c AS DOUBLE)
                    * ln(CAST(na.c AS DOUBLE) / CAST(nt.n AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT)), 0) AS BIGINT) AS q
                FROM na, nt
            ),
            qhk AS (
                SELECT CAST(COALESCE(sum(CAST(floor(
                    CAST(nb.c AS DOUBLE)
                    * ln(CAST(nb.c AS DOUBLE) / CAST(nt.n AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT)), 0) AS BIGINT) AS q
                FROM nb, nt
            ),
            qhck AS (
                SELECT CAST(COALESCE(sum(CAST(floor(
                    CAST(ng.c AS DOUBLE)
                    * ln(CAST(ng.c AS DOUBLE) / CAST(nb.c AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT)), 0) AS BIGINT) AS q
                FROM ng JOIN nb USING (gold)
            ),
            qhkc AS (
                SELECT CAST(COALESCE(sum(CAST(floor(
                    CAST(ng.c AS DOUBLE)
                    * ln(CAST(ng.c AS DOUBLE) / CAST(na.c AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT)), 0) AS BIGINT) AS q
                FROM ng JOIN na USING (norm)
            ),
            h AS (
                SELECT nt.n,
                       -(qhc.q / 1e9) / nt.n AS h_c,
                       -(qhk.q / 1e9) / nt.n AS h_k,
                       -(qhck.q / 1e9) / nt.n AS h_ck,
                       -(qhkc.q / 1e9) / nt.n AS h_kc
                FROM nt, qhc, qhk, qhck, qhkc
            ),
            hv AS (
                -- sklearn convention: classes = gold, clusters = norm;
                -- hom = 1 - H(gold|norm)/H(gold), com = 1 - H(norm|gold)/H(norm)
                SELECT n,
                       CASE WHEN h_k = 0.0 THEN 1.0
                            ELSE 1.0 - h_kc / h_k END AS hom,
                       CASE WHEN h_c = 0.0 THEN 1.0
                            ELSE 1.0 - h_ck / h_c END AS com
                FROM h
            )
            SELECT n AS n_mentions,
                   {_roundsql('hom', 6)} AS homogeneity,
                   {_roundsql('com', 6)} AS completeness,
                   {_roundsql('CASE WHEN hom + com = 0.0 THEN 0.0 ELSE 2.0 * hom * com / (hom + com) END', 6)}
                       AS v_measure
            FROM hv
        """,
        "el_cluster_ari": f"""
            WITH f AS (
                SELECT {norm} AS norm, gold_kb_id AS gold FROM {gm}
                WHERE {norm} != ''
            ),
            ng AS (
                SELECT norm, gold, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY norm, gold
            ),
            na AS (
                SELECT norm, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY norm
            ),
            nb AS (
                SELECT gold, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY gold
            ),
            agg AS (
                SELECT
                    (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0)
                                 AS BIGINT) FROM ng) AS s,
                    (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0)
                                 AS BIGINT) FROM na) AS a,
                    (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0)
                                 AS BIGINT) FROM nb) AS b,
                    (SELECT CAST(count(*) AS BIGINT) FROM f) AS n
            )
            SELECT n AS n_mentions, s AS pairs_both, a AS pairs_pred,
                   b AS pairs_gold,
                   {_roundsql("CASE WHEN n * (n - 1) // 2 = 0 THEN 1.0 WHEN 0.5 * CAST(a + b AS DOUBLE) - CAST(a * b AS DOUBLE) / CAST(n * (n - 1) // 2 AS DOUBLE) = 0.0 THEN 1.0 ELSE (CAST(s AS DOUBLE) - CAST(a * b AS DOUBLE) / CAST(n * (n - 1) // 2 AS DOUBLE)) / (0.5 * CAST(a + b AS DOUBLE) - CAST(a * b AS DOUBLE) / CAST(n * (n - 1) // 2 AS DOUBLE)) END", 6)}
                       AS ari
            FROM agg
        """,
        "el_cluster_fm": f"""
            WITH f AS (
                SELECT {norm} AS norm, gold_kb_id AS gold FROM {gm}
                WHERE {norm} != ''
            ),
            ng AS (
                SELECT norm, gold, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY norm, gold
            ),
            na AS (
                SELECT norm, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY norm
            ),
            nb AS (
                SELECT gold, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY gold
            ),
            agg AS (
                SELECT
                    (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0)
                                 AS BIGINT) FROM ng) AS s,
                    (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0)
                                 AS BIGINT) FROM na) AS a,
                    (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0)
                                 AS BIGINT) FROM nb) AS b,
                    (SELECT CAST(count(*) AS BIGINT) FROM f) AS n
            )
            SELECT n AS n_mentions, s AS tp_pairs, a AS pred_pairs,
                   b AS gold_pairs,
                   {_roundsql("CASE WHEN a = 0 THEN 1.0 ELSE CAST(s AS DOUBLE) / a END", 6)}
                       AS pair_precision,
                   {_roundsql("CASE WHEN b = 0 THEN 1.0 ELSE CAST(s AS DOUBLE) / b END", 6)}
                       AS pair_recall,
                   {_roundsql("CASE WHEN a = 0 OR b = 0 THEN 1.0 ELSE CAST(s AS DOUBLE) / sqrt(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) END", 6)}
                       AS fm
            FROM agg
        """,
        "el_tfidf_sims": f"""
            WITH m AS (
                SELECT mention_id, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            tok AS (
                SELECT DISTINCT mention_id, t FROM (
                    SELECT mention_id,
                           unnest(str_split(norm, ' ')) AS t
                    FROM m
                )
            ),
            nm AS (SELECT count(DISTINCT mention_id) AS n FROM tok),
            tdf AS (SELECT t, count(*) AS d FROM tok GROUP BY t),
            w AS (
                SELECT t,
                       CAST(floor(ln((nm.n + 1.0) / (tdf.d + 1.0)) * 1e6
                                  + 0.5) AS BIGINT) AS q
                FROM tdf, nm
            ),
            vec AS (
                SELECT tok.mention_id, tok.t, w.q * w.q AS w2
                FROM tok JOIN w ON w.t = tok.t
            ),
            nrm AS (
                SELECT mention_id, sum(w2) AS n2 FROM vec
                GROUP BY mention_id
            ),
            sh AS (
                SELECT p.m1_id, p.m2_id, sum(v1.w2) AS shared
                FROM {gp} p
                JOIN vec v1 ON v1.mention_id = p.m1_id
                JOIN vec v2 ON v2.mention_id = p.m2_id
                           AND v2.t = v1.t
                GROUP BY p.m1_id, p.m2_id
            )
            SELECT p.m1_id, p.m2_id,
                   {_roundsql("CASE WHEN n1.n2 IS NULL OR n2.n2 IS NULL OR n1.n2 = 0 OR n2.n2 = 0 THEN 0.0 ELSE COALESCE(sh.shared, 0) / (sqrt(CAST(n1.n2 AS DOUBLE)) * sqrt(CAST(n2.n2 AS DOUBLE))) END", 6)}
                       AS tfidf_cos
            FROM {gp} p
            LEFT JOIN sh ON sh.m1_id = p.m1_id AND sh.m2_id = p.m2_id
            LEFT JOIN nrm n1 ON n1.mention_id = p.m1_id
            LEFT JOIN nrm n2 ON n2.mention_id = p.m2_id
        """,
        "el_pair_trigram": f"""
            WITH s AS (SELECT mention_id, {norm} AS norm FROM {gm}),
            tri_src AS (
                SELECT p.m1_id, p.m2_id, s1.norm AS a, s2.norm AS b,
                       row_number() OVER (ORDER BY p.m1_id, p.m2_id)
                           AS i
                FROM {gp} p
                JOIN s s1 ON p.m1_id = s1.mention_id
                JOIN s s2 ON p.m2_id = s2.mention_id
            ),
            r AS ({_TRIGRAM_SIM_SQL.format(src='tri_src')})
            SELECT t.m1_id, t.m2_id, r.dot,
                   {_roundsql('r.sim', 6)} AS trigram_cosine
            FROM r JOIN tri_src t ON t.i = r.i
        """,
        "el_pair_edit": f"""
            WITH s AS (SELECT mention_id, {norm} AS norm FROM {gm})
            SELECT p.m1_id, p.m2_id,
                   CAST(levenshtein(s1.norm, s2.norm) AS BIGINT) AS lev,
                   {_roundsql("CASE WHEN greatest(length(s1.norm), length(s2.norm)) = 0 THEN 1.0 ELSE 1.0 - CAST(levenshtein(s1.norm, s2.norm) AS DOUBLE) / greatest(length(s1.norm), length(s2.norm)) END", 6)}
                       AS lev_sim
            FROM {gp} p
            JOIN s s1 ON p.m1_id = s1.mention_id
            JOIN s s2 ON p.m2_id = s2.mention_id
        """,
        "comention_clustering": f"""
            WITH md AS (SELECT DISTINCT conv_id, surface FROM {gm}),
            e AS (
                SELECT DISTINCT a.surface AS s1, b.surface AS s2
                FROM md a
                JOIN md b ON a.conv_id = b.conv_id
                         AND a.surface < b.surface
            ),
            tri AS (
                SELECT e1.s1 AS x, e1.s2 AS y, e2.s2 AS z
                FROM e e1
                JOIN e e2 ON e2.s1 = e1.s2
                JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
            ),
            corners AS (
                SELECT x AS s FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            ),
            t AS (
                SELECT s, CAST(count(*) AS BIGINT) AS n_triangles
                FROM corners GROUP BY s
            ),
            und AS (SELECT s1 AS n FROM e UNION ALL SELECT s2 FROM e),
            d AS (
                SELECT n, CAST(count(*) AS BIGINT) AS degree
                FROM und GROUP BY n
            )
            SELECT d.n AS surface, d.degree,
                   CAST(COALESCE(t.n_triangles, 0) AS BIGINT)
                       AS n_triangles,
                   {_roundsql("2.0 * COALESCE(t.n_triangles, 0) / (d.degree * (d.degree - 1))", 6)}
                       AS coef
            FROM d LEFT JOIN t ON t.s = d.n
            WHERE d.degree >= 2
        """,
        "comention_components": f"""
            WITH RECURSIVE md AS (
                SELECT DISTINCT conv_id, surface FROM {gm}
            ),
            e AS (
                SELECT DISTINCT a.surface AS s1, b.surface AS s2
                FROM md a
                JOIN md b ON a.conv_id = b.conv_id
                         AND a.surface < b.surface
            ),
            und AS (SELECT s1 AS a, s2 AS b FROM e
                    UNION SELECT s2, s1 FROM e),
            reach(node, lab) AS (
                SELECT a, a FROM und
                UNION
                SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
            ),
            canon AS (
                SELECT node, min(lab) AS component FROM reach
                GROUP BY node
            ),
            nodes AS (SELECT DISTINCT surface FROM {gm})
            SELECT n.surface,
                   COALESCE(c.component, n.surface) AS component
            FROM nodes n LEFT JOIN canon c ON c.node = n.surface
        """,
        "comention_triangles": f"""
            WITH md AS (SELECT DISTINCT conv_id, surface FROM {gm}),
            e AS (
                SELECT DISTINCT a.surface AS s1, b.surface AS s2
                FROM md a
                JOIN md b ON a.conv_id = b.conv_id
                         AND a.surface < b.surface
            ),
            tri AS (
                SELECT e1.s1 AS x, e1.s2 AS y, e2.s2 AS z
                FROM e e1
                JOIN e e2 ON e2.s1 = e1.s2
                JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
            ),
            n AS (
                SELECT x AS s FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            )
            SELECT s AS surface, CAST(count(*) AS BIGINT) AS n_triangles
            FROM n GROUP BY s
        """,
        "tpch_q3": f"""
            WITH j AS (
                SELECT l.l_orderkey,
                       sum(CAST(floor(l.l_extendedprice * 100 + 0.5)
                                AS BIGINT)
                           * (100 - CAST(floor(l.l_discount * 100 + 0.5)
                                         AS BIGINT))) AS rev,
                       o.o_orderdate, o.o_orderpriority
                FROM customer c
                JOIN orders o ON o.o_custkey = c.c_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                WHERE c.c_mktsegment = 'BUILDING'
                  AND o.o_orderdate < TIMESTAMP '1998-04-25'
                  AND l.l_shipdate > TIMESTAMP '1998-04-25'
                GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
            )
            SELECT l_orderkey, {_roundsql('rev / 10000.0', 2)} AS revenue,
                   o_orderdate, o_orderpriority
            FROM j
            ORDER BY rev DESC, o_orderdate, l_orderkey
            LIMIT 10
        """,
        "tpch_q18": f"""
            WITH big AS (
                SELECT l_orderkey,
                       sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                           AS qu
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                       > 30000
            )
            SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                   {_roundsql('o.o_totalprice', 2)} AS o_totalprice,
                   {_roundsql('b.qu / 100.0', 2)} AS sum_qty
            FROM big b
            JOIN orders o ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                         DESC,
                     o.o_orderdate, o.o_orderkey
            LIMIT 100
        """,
        "events_debounce": """
            WITH x AS (
                SELECT event_id, user_id, event_type, ts,
                       lag(ts) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                       ) AS pts
                FROM events
            )
            SELECT event_id, user_id, event_type, ts
            FROM x
            WHERE pts IS NULL
               OR epoch_us(ts) - epoch_us(pts) >= 3600000000
        """,
        "tpch_q7": """
            WITH f AS (
                SELECT l_orderkey, l_suppkey,
                       CAST(year(l_shipdate) AS BIGINT) AS l_year,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5)
                                     AS BIGINT)) AS rev
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'
            ),
            j AS (
                SELECT ns.n_name AS supp_nation,
                       nc.n_name AS cust_nation,
                       f.l_year, CAST(sum(f.rev) AS BIGINT) AS rev
                FROM f
                JOIN supplier s ON s.s_suppkey = f.l_suppkey
                JOIN nation ns ON ns.n_nationkey = s.s_nationkey
                JOIN orders o ON o.o_orderkey = f.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation nc ON nc.n_nationkey = c.c_nationkey
                WHERE (ns.n_name = 'NATION_9' AND nc.n_name = 'NATION_6')
                   OR (ns.n_name = 'NATION_6' AND nc.n_name = 'NATION_9')
                GROUP BY 1, 2, 3
            )
            SELECT supp_nation, cust_nation, l_year,
                   floor(CAST(rev AS DOUBLE) / 10000 * 100 + 0.5) / 100
                       AS revenue
            FROM j
            ORDER BY supp_nation, cust_nation, l_year
        """,
        "tpch_q10": """
            WITH f AS (
                SELECT l_orderkey,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5)
                                     AS BIGINT)) AS rev
                FROM lineitem WHERE l_returnflag = 'R'
            ),
            j AS (
                SELECT o.o_custkey AS ckey,
                       CAST(sum(f.rev) AS BIGINT) AS rev
                FROM f JOIN orders o ON f.l_orderkey = o.o_orderkey
                WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
                  AND o.o_orderdate < TIMESTAMP '1997-01-01'
                GROUP BY o.o_custkey
            )
            SELECT c.c_custkey, c.c_name,
                   floor(CAST(j.rev AS DOUBLE) / 10000 * 100 + 0.5)
                       / 100 AS revenue,
                   c.c_acctbal, n.n_name
            FROM j
            JOIN customer c ON c.c_custkey = j.ckey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            ORDER BY j.rev DESC, c.c_custkey
            LIMIT 20
        """,
        "tpch_q4": """
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1995-07-01'
              AND o.o_orderdate < TIMESTAMP '1995-10-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "tpch_q12": """
            SELECT l_returnflag,
                   CAST(COALESCE(sum(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END),
                        0) AS BIGINT) AS high_line_count,
                   CAST(COALESCE(sum(CASE WHEN o_orderpriority NOT IN
                            ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END),
                        0) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "tpch_q6": """
            WITH f AS (
                SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           AS cents,
                       CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                           AS disc
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1994-01-01'
                  AND l_shipdate < TIMESTAMP '1995-01-01'
                  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                      BETWEEN 5 AND 7
                  AND l_quantity < 24
            ),
            agg AS (
                SELECT CAST(COALESCE(sum(cents * disc), 0) AS BIGINT)
                           AS rev,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM f
            )
            SELECT floor(CAST(rev AS DOUBLE) / 10000.0 * 100 + 0.5)
                       / 100 AS revenue,
                   cnt AS n_lineitems
            FROM agg
        """,
        "orders_late_lineitem": """
            SELECT o.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate
                                     + INTERVAL 90 DAY
            )
            GROUP BY o.o_orderpriority
        """,
        "tpch_q13": """
            WITH per_c AS (
                SELECT c.c_custkey,
                       CAST(COALESCE(sum(CASE WHEN o.o_custkey IS NULL
                                              THEN 0 ELSE 1 END), 0)
                            AS BIGINT) AS c_count
                FROM customer c
                LEFT JOIN orders o
                  ON o.o_custkey = c.c_custkey
                 AND o.o_orderstatus = 'O'
                GROUP BY c.c_custkey
            )
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM per_c
            GROUP BY c_count
        """,
        "tpch_q15": f"""
            WITH rev AS (
                SELECT l_suppkey,
                       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                                     AS BIGINT)
                                * (100 - CAST(floor(l_discount * 100
                                                    + 0.5) AS BIGINT)))
                            AS BIGINT) AS r
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name,
                   {_roundsql('CAST(r AS DOUBLE) / 10000.0', 2)}
                       AS total_revenue
            FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
            WHERE r = (SELECT max(r) FROM rev)
        """,
        "tpch_q17": f"""
            WITH li AS (
                SELECT l_partkey,
                       CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                           AS qty_c,
                       CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS cents
                FROM lineitem
                JOIN part ON p_partkey = l_partkey
                WHERE p_brand = 'Brand#12'
            ),
            stats AS (
                SELECT l_partkey,
                       CAST(sum(qty_c) AS BIGINT) AS sum_qc,
                       CAST(count(*) AS BIGINT) AS n
                FROM li GROUP BY l_partkey
            ),
            kept AS (
                SELECT li.cents
                FROM li JOIN stats USING (l_partkey)
                WHERE 5 * li.qty_c * stats.n < stats.sum_qc
            )
            SELECT {_roundsql(
                'CAST(COALESCE(sum(cents), 0) AS DOUBLE) / 700.0', 2)}
                       AS avg_yearly,
                   CAST(count(*) AS BIGINT) AS n_lineitems_kept
            FROM kept
        """,
        "tpch_q19": f"""
            WITH j AS (
                SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5)
                                     AS BIGINT)) AS rev
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE (p_brand = 'Brand#12'
                       AND p_size BETWEEN 1 AND 5
                       AND CAST(floor(l_quantity * 100 + 0.5)
                                AS BIGINT) BETWEEN 100 AND 1100)
                   OR (p_brand = 'Brand#23'
                       AND p_size BETWEEN 1 AND 10
                       AND CAST(floor(l_quantity * 100 + 0.5)
                                AS BIGINT) BETWEEN 1000 AND 2000)
                   OR (p_brand = 'Brand#34'
                       AND p_size BETWEEN 1 AND 15
                       AND CAST(floor(l_quantity * 100 + 0.5)
                                AS BIGINT) BETWEEN 2000 AND 3000)
            )
            SELECT {_roundsql(
                'CAST(COALESCE(sum(rev), 0) AS DOUBLE) / 10000.0', 2)}
                       AS revenue,
                   CAST(count(*) AS BIGINT) AS n_lineitems
            FROM j
        """,
        "doc_readability": f"""
            WITH c AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '[.!?]+'))
                            AS BIGINT) AS n_sentences,
                       CAST(len(regexp_extract_all(text,
                            '[A-Za-z0-9]+')) AS BIGINT) AS n_words,
                       CAST(len(regexp_extract_all(lower(text),
                            '[aeiouy]+')) AS BIGINT) AS n_syllables
                FROM documents
            )
            SELECT doc_id, n_sentences, n_words, n_syllables,
                   CASE WHEN n_words = 0 OR n_sentences = 0 THEN 0.0
                        ELSE {_roundsql(
                            '206.835 - 1.015 * (CAST(n_words AS DOUBLE)'
                            ' / CAST(n_sentences AS DOUBLE)) - 84.6 * '
                            '(CAST(n_syllables AS DOUBLE) '
                            '/ CAST(n_words AS DOUBLE))', 4)}
                   END AS flesch
            FROM c
        """,
        "turn_latency": f"""
            WITH t AS (
                SELECT conv_id, turn_idx, role, ts,
                       lag(role) OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) AS role_from,
                       lag(ts) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS prev_ts
                FROM {tr}
            )
            SELECT role_from, role AS role_to,
                   CAST(count(*) AS BIGINT) AS n,
                   {_roundsql(
                       "CAST(sum(date_diff('microsecond', prev_ts, ts))"
                       " AS DOUBLE) / CAST(count(*) AS DOUBLE)"
                       " / 1000000.0", 6)} AS mean_latency_s,
                   CAST(max(date_diff('microsecond', prev_ts, ts))
                        AS BIGINT) AS max_latency_us
            FROM t WHERE role_from IS NOT NULL
            GROUP BY role_from, role
        """,
        "el_pair_damerau": f"""
            WITH s AS (SELECT mention_id, {norm} AS norm FROM {gm})
            SELECT p.m1_id, p.m2_id,
                   CAST(damerau_levenshtein(s1.norm, s2.norm) AS BIGINT)
                       AS dl,
                   {_roundsql("CASE WHEN greatest(length(s1.norm), length(s2.norm)) = 0 THEN 1.0 ELSE 1.0 - CAST(damerau_levenshtein(s1.norm, s2.norm) AS DOUBLE) / greatest(length(s1.norm), length(s2.norm)) END", 6)}
                       AS dl_sim
            FROM {gp} p
            JOIN s s1 ON p.m1_id = s1.mention_id
            JOIN s s2 ON p.m2_id = s2.mention_id
        """,
        "el_acronym_candidates": f"""
            WITH s AS (SELECT {norm} AS norm FROM {gm}),
            tok AS (
                SELECT norm, str_split(norm, ' ') AS ts
                FROM s WHERE norm <> ''
            ),
            exp AS (
                SELECT array_to_string(
                           list_transform(ts, x -> substr(x, 1, 1)), '')
                           AS key,
                       norm AS expansion,
                       CAST(count(*) AS BIGINT) AS n_exp_mentions
                FROM tok WHERE len(ts) >= 2 GROUP BY 1, 2
            ),
            acr AS (
                SELECT norm AS key,
                       CAST(count(*) AS BIGINT) AS n_acr_mentions
                FROM tok WHERE len(ts) = 1 AND length(norm) >= 2
                GROUP BY 1
            )
            SELECT a.key AS acronym, e.expansion,
                   a.n_acr_mentions, e.n_exp_mentions
            FROM acr a JOIN exp e ON e.key = a.key
        """,
        "embed_pair_hist": f"""
            WITH q AS (SELECT vec_id AS q_id,
                              CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id < 16),
            s AS (SELECT list_cosine_similarity(
                             q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
                  FROM q CROSS JOIN embeddings e
                  WHERE e.vec_id != q.q_id),
            b AS (SELECT CAST(floor({_roundsql('sim', 5)} * 20.0)
                              AS BIGINT) AS bin
                  FROM s)
            SELECT bin, bin / 20.0 AS lo,
                   CAST(count(*) AS BIGINT) AS n
            FROM b GROUP BY bin
        """,
        "char_trigram_logprob": f"""
            WITH c AS (
                SELECT doc_id,
                       array_to_string(regexp_extract_all(lower(text),
                                       '[a-z0-9]+'), ' ') AS s
                FROM documents
            ),
            tri AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, length(s) - 1),
                              i -> substr(s, CAST(i AS INT), 3)))
                           AS token
                FROM c WHERE length(s) >= 3
            ),
            cnt AS (SELECT token, count(*) AS cnt FROM tri
                    GROUP BY token),
            tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM cnt),
            vocab AS (
                SELECT token, cnt FROM cnt
                QUALIFY row_number() OVER (ORDER BY cnt DESC, token)
                    <= 65536
            ),
            lp AS (
                SELECT tri.doc_id,
                       CASE WHEN v.cnt IS NULL
                            THEN ln(0.5 / tot.t)
                            ELSE ln(CAST(v.cnt AS DOUBLE) / tot.t)
                       END AS l
                FROM tri LEFT JOIN vocab v USING (token)
                CROSS JOIN tot
            ),
            agg AS (SELECT doc_id, count(*) AS n_trigrams, avg(l) AS s
                    FROM lp GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.n_trigrams, CAST(0 AS BIGINT))
                       AS n_trigrams,
                   {_roundsql('a.s', 5)} AS logprob_per_trigram
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "el_rule_coverage": f"""
            WITH m AS (
                SELECT mention_id, gold_kb_id, {norm} AS norm FROM {gm}
                WHERE {norm} != ''
            ),
            phb AS (
                SELECT mention_id,
                       regexp_extract(norm, '([a-z0-9]+)$', 1) AS last
                FROM m
            ),
            phc AS (
                SELECT mention_id, last,
                       regexp_replace(last, '[^a-z]', '', 'g') AS w
                FROM phb
            ),
            phd AS (
                SELECT mention_id, last, w, substr(w, 1, 1) AS head,
                       translate(substr(w, 1, 1) ||
                           replace(replace(substr(w, 2), 'h', ''),
                                   'w', ''),
                           'bfpvcgjkqsxzdtlmnr', '111122222222334556')
                           AS coded
                FROM phc
            ),
            phe AS (
                SELECT mention_id, last, w, head, {_SOUNDEX_COLLAPSE}
                           AS collapsed
                FROM phd
            ),
            tok AS (
                SELECT DISTINCT mention_id, t FROM (
                    SELECT mention_id,
                           unnest(str_split(norm, ' ')) AS t
                    FROM m
                )
            ),
            tdf AS (
                SELECT t, count(*) AS n FROM tok GROUP BY t
            ),
            rr AS (
                SELECT tok.mention_id, tok.t,
                       row_number() OVER (
                           PARTITION BY tok.mention_id
                           ORDER BY tdf.n, tok.t) AS rn
                FROM tok JOIN tdf ON tdf.t = tok.t
            ),
            k AS (
                SELECT mention_id, gold_kb_id, 'n:' || norm AS bk
                FROM m
                UNION ALL
                SELECT mention_id, gold_kb_id,
                       'p:' || substr(split_part(norm, ' ', 1), 1, 6)
                FROM m WHERE length(split_part(norm, ' ', 1)) >= 3
                UNION ALL
                SELECT ph.mention_id, m.gold_kb_id,
                       'ph:' ||
                       CASE WHEN ph.w = '' THEN '0000'
                            ELSE upper(ph.head) || substr(
                                regexp_replace(substr(ph.collapsed, 2),
                                               '[^1-6]', '', 'g')
                                || '000', 1, 3)
                       END || ':' || substr(ph.last, 1, 1)
                FROM phe ph JOIN m USING (mention_id)
                UNION ALL
                SELECT rr.mention_id, m.gold_kb_id, 'r:' || rr.t
                FROM rr JOIN m USING (mention_id) WHERE rr.rn = 1
            ),
            p AS (
                SELECT DISTINCT split_part(a.bk, ':', 1) AS rule,
                       a.mention_id AS m1, b.mention_id AS m2,
                       CASE WHEN a.gold_kb_id = b.gold_kb_id
                            THEN 1 ELSE 0 END AS match
                FROM k a JOIN k b ON a.bk = b.bk
                         AND a.mention_id < b.mention_id
            ),
            pr AS (
                SELECT m1, m2, count(*) AS nr, max(match) AS match
                FROM p GROUP BY m1, m2
            ),
            per_rule AS (
                SELECT p.rule,
                       CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(sum(CASE WHEN pr.nr = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_marginal,
                       CAST(sum(p.match) AS BIGINT) AS tp_pairs
                FROM p JOIN pr ON pr.m1 = p.m1 AND pr.m2 = p.m2
                GROUP BY p.rule
            ),
            u AS (
                SELECT 'all' AS rule,
                       CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(sum(CASE WHEN nr = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_marginal,
                       CAST(sum(match) AS BIGINT) AS tp_pairs
                FROM pr
            )
            SELECT * FROM per_rule UNION ALL SELECT * FROM u
        """,
        "tpch_q8": f"""
            WITH rn AS (
                SELECT n_nationkey FROM nation
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'AMERICA'
            ),
            base AS (
                SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5)
                                     AS BIGINT)) AS rev,
                       s_nationkey
                FROM lineitem
                JOIN part ON p_partkey = l_partkey
                         AND p_type = 'ECONOMY'
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                  AND o_orderdate < TIMESTAMP '1997-01-01'
                  AND c_nationkey IN (SELECT n_nationkey FROM rn)
            ),
            agg AS (
                SELECT o_year,
                       sum(CASE WHEN s_nationkey =
                                (SELECT n_nationkey FROM nation
                                 WHERE n_name = 'NATION_6')
                                THEN rev ELSE 0 END) AS t,
                       sum(rev) AS a
                FROM base GROUP BY o_year
            )
            SELECT o_year,
                   CASE WHEN a = 0 THEN 0.0
                        ELSE {_roundsql('CAST(t AS DOUBLE) / CAST(a AS DOUBLE)', 6)}
                   END AS mkt_share,
                   floor(CAST(t AS DOUBLE) / 10000.0 * 100 + 0.5) / 100
                       AS nation_volume,
                   floor(CAST(a AS DOUBLE) / 10000.0 * 100 + 0.5) / 100
                       AS total_volume
            FROM agg
        """,
        "events_markov": f"""
            WITH t AS (
                SELECT event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS from_type
                FROM events
            ),
            c AS (
                SELECT from_type, event_type AS to_type,
                       CAST(count(*) AS BIGINT) AS n
                FROM t WHERE from_type IS NOT NULL
                GROUP BY from_type, event_type
            )
            SELECT from_type, to_type, n,
                   {_roundsql('CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)', 6)}
                       AS p
            FROM c
        """,
        "conv_turn_taking": f"""
            WITH t AS (
                SELECT conv_id, turn_idx, role,
                       lag(role) OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) AS prev
                FROM {tr}
            ),
            r AS (
                SELECT conv_id, turn_idx,
                       sum(CASE WHEN prev IS NULL OR role != prev
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY conv_id
                                 ORDER BY turn_idx) AS run_id
                FROM t
            ),
            runs AS (
                SELECT conv_id, run_id, CAST(count(*) AS BIGINT) AS c
                FROM r GROUP BY conv_id, run_id
            ),
            agg AS (
                SELECT conv_id,
                       CAST(count(*) AS BIGINT) AS n_turns,
                       CAST(sum(CASE WHEN prev IS NOT NULL
                                     AND role != prev
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_switches,
                       CAST(count(DISTINCT role) AS BIGINT) AS n_roles
                FROM t GROUP BY conv_id
            ),
            lr AS (
                SELECT conv_id, CAST(max(c) AS BIGINT) AS longest_run
                FROM runs GROUP BY conv_id
            )
            SELECT a.conv_id, a.n_turns, a.n_switches,
                   CASE WHEN a.n_turns <= 1 THEN 0.0
                        ELSE {_roundsql(
                            'CAST(a.n_switches AS DOUBLE) '
                            '/ (CAST(a.n_turns AS DOUBLE) - 1.0)', 6)}
                   END AS switch_rate,
                   lr.longest_run, a.n_roles
            FROM agg a JOIN lr USING (conv_id)
        """,
        "embed_covariance": f"""
            WITH e AS (
                SELECT vec_id, unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings
            ),
            q AS (
                SELECT vec_id, CAST(dim AS BIGINT) AS dim,
                       CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5)
                            AS BIGINT) AS qv
                FROM e
            ),
            p AS (
                SELECT a.dim AS dim_i, b.dim AS dim_j,
                       CAST(sum(a.qv * b.qv) AS BIGINT) AS s,
                       CAST(sum(a.qv) AS BIGINT) AS mi,
                       CAST(sum(b.qv) AS BIGINT) AS mj,
                       CAST(count(*) AS BIGINT) AS n
                FROM q a JOIN q b
                  ON a.vec_id = b.vec_id AND a.dim <= b.dim
                GROUP BY a.dim, b.dim
            )
            SELECT dim_i, dim_j, n,
                   {_roundsql(
                       '(CAST(s AS DOUBLE) - CAST(mi AS DOUBLE) '
                       '* CAST(mj AS DOUBLE) / CAST(n AS DOUBLE)) '
                       '/ CAST(n AS DOUBLE) / 1e12', 9)} AS cov
            FROM p
        """,
        "embed_silhouette": f"""
            WITH e AS (
                SELECT vec_id, CAST(label AS BIGINT) AS label,
                       unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings
            ),
            q AS (
                SELECT vec_id, label, CAST(dim AS BIGINT) AS dim,
                       CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5)
                            AS BIGINT) AS qv
                FROM e
            ),
            g AS (
                SELECT label AS clab, dim,
                       CAST(sum(qv) AS BIGINT) AS s,
                       CAST(count(*) AS BIGINT) AS n
                FROM q GROUP BY label, dim
            ),
            cent AS (
                SELECT clab, dim,
                       {_roundsql('CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6', 6)}
                           AS c6
                FROM g
            ),
            ci AS (
                SELECT clab, dim,
                       CAST(floor(c6 * 1e6 + 0.5) AS BIGINT) AS c
                FROM cent
            ),
            d AS (
                SELECT q.vec_id, q.label AS tlab, ci.clab,
                       sum((q.qv - ci.c) * (q.qv - ci.c)) AS d2
                FROM q JOIN ci ON ci.dim = q.dim
                GROUP BY q.vec_id, q.label, ci.clab
            ),
            ab AS (
                SELECT vec_id, tlab,
                       CAST(max(CASE WHEN clab = tlab THEN d2 END)
                            AS DOUBLE) AS a2,
                       CAST(min(CASE WHEN clab != tlab THEN d2 END)
                            AS DOUBLE) AS b2,
                       CAST(count(DISTINCT clab) AS BIGINT) AS k
                FROM d GROUP BY vec_id, tlab
            ),
            sv AS (
                SELECT tlab,
                       CAST(floor((CASE
                            WHEN k <= 1 THEN 0.0
                            WHEN greatest(a2, b2) = 0 THEN 0.0
                            ELSE (sqrt(b2) - sqrt(a2))
                                 / sqrt(greatest(a2, b2)) END) * 1e9
                            + 0.5) AS BIGINT) AS qs
                FROM ab
            )
            SELECT tlab AS label, CAST(count(*) AS BIGINT) AS n,
                   {_roundsql('CAST(sum(qs) AS DOUBLE) / 1e9 / count(*)', 6)}
                       AS mean_silhouette
            FROM sv GROUP BY tlab
        """,
        "el_pair_monge_elkan": f"""
            WITH s AS (SELECT mention_id, {norm} AS norm FROM {gm}),
            me_src AS (
                SELECT p.m1_id, p.m2_id, s1.norm AS a, s2.norm AS b,
                       row_number() OVER (ORDER BY p.m1_id, p.m2_id)
                           AS i
                FROM {gp} p
                JOIN s s1 ON p.m1_id = s1.mention_id
                JOIN s s2 ON p.m2_id = s2.mention_id
            ),
            r AS ({_MONGE_ELKAN_SQL.format(src='me_src')})
            SELECT t.m1_id, t.m2_id,
                   {_roundsql('r.me_ab', 6)} AS me_ab,
                   {_roundsql('r.me_ba', 6)} AS me_ba,
                   {_roundsql('r.me_sym', 6)} AS me_sym
            FROM r JOIN me_src t ON t.i = r.i
        """,
        "doc_ttr": f"""
            WITH t AS (
                SELECT doc_id, unnest({toks}) AS term FROM documents
            ),
            tf AS (
                SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
                FROM t GROUP BY doc_id, term
            ),
            per AS (
                SELECT doc_id,
                       CAST(sum(c) AS BIGINT) AS n_tokens,
                       CAST(count(*) AS BIGINT) AS n_types,
                       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_hapax
                FROM tf GROUP BY doc_id
            ),
            allk AS (
                SELECT d.doc_id,
                       COALESCE(p.n_tokens, 0) AS n_tokens,
                       COALESCE(p.n_types, 0) AS n_types,
                       COALESCE(p.n_hapax, 0) AS n_hapax
                FROM documents d LEFT JOIN per p USING (doc_id)
            )
            SELECT doc_id, n_tokens, n_types, n_hapax,
                   {_roundsql('CASE WHEN n_tokens = 0 THEN 0.0 ELSE '
                              'CAST(n_types AS DOUBLE) '
                              '/ CAST(n_tokens AS DOUBLE) END', 6)}
                       AS ttr,
                   {_roundsql('CASE WHEN n_tokens = 0 THEN 0.0 ELSE '
                              'CAST(n_hapax AS DOUBLE) '
                              '/ CAST(n_tokens AS DOUBLE) END', 6)}
                       AS hapax_ratio
            FROM allk
        """,
        "el_cluster_purity": f"""
            WITH f AS (
                SELECT {norm} AS norm, gold_kb_id AS gold FROM {gm}
                WHERE {norm} != ''
            ),
            nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
            ng AS (
                SELECT norm, gold, CAST(count(*) AS BIGINT) AS c
                FROM f GROUP BY norm, gold
            ),
            pur AS (
                SELECT CAST(COALESCE(sum(m), 0) AS BIGINT) AS pc
                FROM (SELECT max(c) AS m FROM ng GROUP BY norm)
            ),
            inv AS (
                SELECT CAST(COALESCE(sum(m), 0) AS BIGINT) AS ic
                FROM (SELECT max(c) AS m FROM ng GROUP BY gold)
            )
            SELECT nt.n AS n_mentions,
                   pur.pc AS purity_correct,
                   {_roundsql(
                       'CAST(pur.pc AS DOUBLE) / CAST(nt.n AS DOUBLE)',
                       6)} AS purity,
                   inv.ic AS inverse_correct,
                   {_roundsql(
                       'CAST(inv.ic AS DOUBLE) / CAST(nt.n AS DOUBLE)',
                       6)} AS inverse_purity,
                   {_roundsql(
                       'CASE WHEN pur.pc + inv.ic = 0 THEN 0.0 ELSE '
                       '2.0 * (CAST(pur.pc AS DOUBLE) / nt.n) '
                       '* (CAST(inv.ic AS DOUBLE) / nt.n) '
                       '/ ((CAST(pur.pc AS DOUBLE) / nt.n) '
                       '+ (CAST(inv.ic AS DOUBLE) / nt.n)) END', 6)}
                       AS purity_f1
            FROM nt, pur, inv
        """,
        "embed_norm_stats": f"""
            WITH e AS (
                SELECT vec_id, CAST(label AS BIGINT) AS label,
                       unnest(embedding) AS x
                FROM embeddings
            ),
            v AS (
                SELECT vec_id, label,
                       CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e6
                                           + 0.5) AS BIGINT)
                                * CAST(floor(CAST(x AS DOUBLE) * 1e6
                                             + 0.5) AS BIGINT))
                            AS BIGINT) AS sumsq
                FROM e GROUP BY vec_id, label
            ),
            q AS (
                SELECT label,
                       CAST(floor(sqrt(CAST(sumsq AS DOUBLE)) / 1e6
                                  * 1e6 + 0.5) AS BIGINT) AS qn
                FROM v
            ),
            g AS (
                SELECT label, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(qn) AS BIGINT) AS s1,
                       CAST(sum(qn * qn) AS BIGINT) AS s2
                FROM q GROUP BY label
            )
            SELECT label, n,
                   {_roundsql('CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)'
                              ' / 1e6', 6)} AS mean_norm,
                   {_roundsql(
                       'sqrt(greatest(0.0, CAST(s2 AS DOUBLE) / n '
                       '- (CAST(s1 AS DOUBLE) / n) '
                       '* (CAST(s1 AS DOUBLE) / n))) / 1e6', 6)}
                       AS std_norm
            FROM g
        """,
        "tpch_q22": f"""
            WITH avg_bal AS (
                SELECT CAST(sum(CAST(floor(c_acctbal * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS sum_c,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM customer
                WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > 0
            ),
            eligible AS (
                SELECT c.c_nationkey,
                       CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
                           AS bal_c
                FROM customer c, avg_bal a
                WHERE CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
                      * a.cnt > a.sum_c
                  AND NOT EXISTS (
                      SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
            )
            SELECT n.n_name,
                   CAST(count(*) AS BIGINT) AS numcust,
                   {_roundsql('CAST(sum(bal_c) AS DOUBLE) / 100.0', 2)}
                       AS totacctbal
            FROM eligible e
            JOIN nation n ON n.n_nationkey = e.c_nationkey
            GROUP BY n.n_name
        """,
        "tpch_q14": f"""
            WITH j AS (
                SELECT CAST(floor(l.l_extendedprice * 100 + 0.5)
                            AS BIGINT)
                       * (100 - CAST(floor(l.l_discount * 100 + 0.5)
                                     AS BIGINT)) AS rev,
                       p.p_type = 'PROMO' AS promo
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
                  AND l.l_shipdate < TIMESTAMP '1999-01-01'
            ),
            a AS (
                SELECT CAST(COALESCE(sum(CASE WHEN promo THEN rev
                                              ELSE 0 END), 0)
                            AS BIGINT) AS pr,
                       CAST(COALESCE(sum(rev), 0) AS BIGINT) AS tr
                FROM j
            )
            SELECT {_roundsql('pr / 10000.0', 2)} AS promo_revenue,
                   {_roundsql('tr / 10000.0', 2)} AS total_revenue,
                   {_roundsql('CASE WHEN tr = 0 THEN 0.0 ELSE 100.0 * CAST(pr AS DOUBLE) / CAST(tr AS DOUBLE) END', 6)}
                       AS promo_share
            FROM a
        """,
        "tpch_q5": f"""
            SELECT n.n_name,
                   {_roundsql(
                       "sum(CAST(floor(l.l_extendedprice * 100 + 0.5) "
                       "AS BIGINT) * (100 - CAST(floor(l.l_discount "
                       "* 100 + 0.5) AS BIGINT))) / 10000.0", 2)}
                       AS revenue
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
                         AND s.s_nationkey = n.n_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name
        """,
        "lineitem_pricing": f"""
            SELECT l_returnflag,
                   {_roundsql('sum(l_quantity)', 2)} AS sum_qty,
                   {_roundsql('sum(l_extendedprice)', 2)} AS sum_base,
                   {_roundsql('sum(l_extendedprice * (1.0 - l_discount))', 4)} AS revenue,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        """,
        "hopping_distinct": """
            WITH e AS (
                SELECT event_type, user_id, epoch_us(ts) AS tu
                FROM events
            ),
            w AS (
                SELECT event_type, user_id,
                       (tu // 900000000 - k) * 900000000
                           AS window_start_us
                FROM e, unnest([0, 1, 2, 3]) AS u(k)
            )
            SELECT event_type, window_start_us,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM w GROUP BY event_type, window_start_us
        """,
        "weighted_sample": f"""
            WITH d AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                            AS BIGINT) AS n_tokens,
                       md5_number_lower(CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            ),
            p AS (
                SELECT doc_id, n_tokens,
                       ln((CAST(h >> 11 AS DOUBLE) + 1.0)
                          / 9007199254740992.0) / n_tokens AS pri
                FROM d WHERE n_tokens > 0
            )
            SELECT doc_id, n_tokens,
                   {_roundsql('pri', 10)} AS priority
            FROM p ORDER BY pri DESC, doc_id LIMIT 200
        """,
        "user_decay_score": f"""
            WITH tm AS (
                SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS t FROM events
            ),
            q AS (
                SELECT user_id,
                       CAST(floor(pow(2.0,
                           -(CAST(tm.t - epoch_us(ts) AS DOUBLE)
                             / 86400000000.0) / 30.0)
                           * 1000000000 + 0.5) AS BIGINT) AS qv
                FROM events, tm
            )
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   {_roundsql(
                       "CAST(sum(qv) AS DOUBLE) / 1000000000", 6)}
                       AS decay_score
            FROM q GROUP BY user_id
        """,
        "events_pareto": f"""
            WITH u AS (
                SELECT user_id, CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY user_id
            ),
            w AS (
                SELECT c,
                       CAST(sum(c) OVER (ORDER BY c DESC, user_id
                                         ROWS UNBOUNDED PRECEDING)
                            AS BIGINT) AS cum,
                       row_number() OVER (ORDER BY c DESC, user_id)
                           AS rn
                FROM u
            ),
            n AS (
                SELECT CAST(count(*) AS BIGINT) AS nu,
                       CAST(sum(c) AS BIGINT) AS ne
                FROM u
            )
            SELECT n.nu AS n_users, n.ne AS n_events,
                   (SELECT CAST(count(*) AS BIGINT) FROM w, n
                    WHERE 5 * (w.cum - w.c) < 4 * n.ne)
                       AS users_for_80pct,
                   {_roundsql(
                       "(SELECT CAST(sum(w.c) AS DOUBLE) FROM w, n"
                       " WHERE w.rn <= (n.nu + 9) // 10) / n.ne", 6)}
                       AS top_decile_share
            FROM n
        """,
        "events_entropy": f"""
            WITH cell AS (
                SELECT user_id, event_type,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY user_id, event_type
            ),
            q AS (
                SELECT user_id, c,
                       CAST(floor(CAST(c AS DOUBLE)
                                  * ln(CAST(c AS DOUBLE))
                                  * 1000000000 + 0.5) AS BIGINT) AS qv
                FROM cell
            ),
            a AS (
                SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS k,
                       CAST(sum(qv) AS BIGINT) AS qs
                FROM q GROUP BY user_id
            )
            SELECT user_id, n AS n_events, k AS n_types,
                   {_roundsql(
                       "ln(CAST(n AS DOUBLE)) - (CAST(qs AS DOUBLE)"
                       " / 1000000000) / n", 6)} AS entropy
            FROM a
        """,
        "orders_yoy": f"""
            WITH g AS (
                SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS cents
                FROM orders GROUP BY 1
            ),
            w AS (
                SELECT y, cents,
                       lag(cents) OVER (ORDER BY y) AS prev
                FROM g
            )
            SELECT y AS o_year,
                   floor(CAST(cents AS DOUBLE) / 100.0 * 100 + 0.5)
                       / 100 AS revenue,
                   {_roundsql(
                       "CASE WHEN prev IS NULL OR prev <= 0 THEN 0.0"
                       " ELSE (CAST(cents AS DOUBLE) - prev) / prev"
                       " END", 6)} AS yoy_growth
            FROM w ORDER BY y
        """,
        "customer_balance_ntile": """
            SELECT c_custkey, c_acctbal,
                   CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey)
                        AS BIGINT) AS decile
            FROM customer
        """,
        "customer_order_gaps": """
            WITH d AS (
                SELECT o_custkey,
                       CAST(epoch(o_orderdate) // 86400 AS BIGINT)
                           AS day
                FROM orders
            ),
            g AS (
                SELECT o_custkey,
                       day - lag(day) OVER (PARTITION BY o_custkey
                                            ORDER BY day) AS gap
                FROM d
            )
            SELECT o_custkey,
                   CAST(count(*) + 1 AS BIGINT) AS n_orders,
                   CAST(median(gap) AS DOUBLE) AS median_gap_days
            FROM g WHERE gap IS NOT NULL
            GROUP BY o_custkey
        """,
        "bloom_semijoin": """
            WITH b AS (
                SELECT DISTINCT p FROM (
                    SELECT unnest([
                        CAST(md5_number_lower(CAST(c_custkey AS VARCHAR))
                             & 65535 AS BIGINT),
                        CAST((md5_number_lower(CAST(c_custkey AS VARCHAR))
                              >> 16) & 65535 AS BIGINT),
                        CAST((md5_number_lower(CAST(c_custkey AS VARCHAR))
                              >> 32) & 65535 AS BIGINT)]) AS p
                    FROM customer WHERE c_acctbal >= 9000
                )
            ),
            o AS (
                SELECT o_orderkey, o_custkey,
                       md5_number_lower(CAST(o_custkey AS VARCHAR)) AS h
                FROM orders
            )
            SELECT o_orderkey, o_custkey FROM o
            WHERE CAST(h & 65535 AS BIGINT) IN (SELECT p FROM b)
              AND CAST((h >> 16) & 65535 AS BIGINT) IN (SELECT p FROM b)
              AND CAST((h >> 32) & 65535 AS BIGINT) IN (SELECT p FROM b)
        """,
        "event_assoc_rules": f"""
            WITH ut AS (
                SELECT DISTINCT user_id, event_type FROM events
            ),
            n AS (
                SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
                FROM ut
            ),
            s AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS c
                FROM ut GROUP BY event_type
            ),
            p AS (
                SELECT a.event_type AS ante, b.event_type AS cons,
                       CAST(count(*) AS BIGINT) AS nb
                FROM ut a JOIN ut b ON a.user_id = b.user_id
                          AND a.event_type < b.event_type
                GROUP BY 1, 2
            ),
            d AS (
                SELECT ante, cons, nb FROM p
                UNION ALL
                SELECT cons AS ante, ante AS cons, nb FROM p
            )
            SELECT d.ante AS antecedent, d.cons AS consequent,
                   d.nb AS n_both, sa.c AS n_ante, sc.c AS n_cons,
                   n.nu AS n_baskets,
                   {_roundsql('CAST(d.nb AS DOUBLE) / n.nu', 6)}
                       AS support,
                   {_roundsql('CAST(d.nb AS DOUBLE) / sa.c', 6)}
                       AS confidence,
                   {_roundsql('CAST(d.nb AS DOUBLE) * n.nu / (CAST(sa.c AS DOUBLE) * sc.c)', 6)}
                       AS lift
            FROM d
            JOIN s sa ON sa.event_type = d.ante
            JOIN s sc ON sc.event_type = d.cons, n
        """,
        "events_pivot": """
            SELECT user_id,
                   CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
                       AS n_click,
                   CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
                       AS n_error,
                   CAST(count(*) FILTER (event_type = 'purchase')
                        AS BIGINT) AS n_purchase,
                   CAST(count(*) FILTER (event_type = 'signup')
                        AS BIGINT) AS n_signup,
                   CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
                       AS n_view
            FROM events GROUP BY user_id
        """,
        "events_running_total": """
            SELECT user_id, event_id, ts,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) / 100.0
                       AS running_value
            FROM events
        """,
        "events_zscore": f"""
            WITH c AS (
                SELECT event_id, event_type,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
                FROM events
            ),
            m AS (
                SELECT event_type, count(*) AS n,
                       sum(c) AS s1, sum(c * c) AS s2
                FROM c GROUP BY event_type
            ),
            s AS (
                SELECT event_type, s1 / n AS mean_c,
                       sqrt(s2 / n - (s1 / n) * (s1 / n)) AS std_c
                FROM m
            )
            SELECT c.event_id, c.event_type,
                   {_roundsql("CASE WHEN s.std_c > 0 "
                              "THEN (c.c - s.mean_c) / s.std_c "
                              "ELSE 0.0 END", 6)} AS z
            FROM c JOIN s USING (event_type)
        """,
        "events_topk_users": f"""
            WITH t AS (
                SELECT event_type, user_id,
                       sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                           AS cents
                FROM events GROUP BY event_type, user_id
            ),
            r AS (
                SELECT event_type, user_id, cents,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY cents DESC, user_id)
                           AS rk
                FROM t
            )
            SELECT event_type, user_id, CAST(rk AS BIGINT) AS rk,
                   {_roundsql('cents / 100.0', 2)} AS total_value
            FROM r WHERE rk <= 3
        """,
        "rollup_pricing": """
            WITH base AS (
                SELECT l_returnflag, l_linestatus,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5)
                                     AS BIGINT)) AS rev
                FROM lineitem
            )
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(count(*) AS BIGINT) AS n,
                   floor(sum(rev) / 10000.0 * 100 + 0.5) / 100
                       AS revenue
            FROM base GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
    }
    sqls["ann_lsh_recall"] = f"""
        SELECT bf.q_id,
               CAST(count(ap.vec_id) AS BIGINT) AS n_hit,
               {_roundsql('count(ap.vec_id) / 10.0', 6)} AS recall
        FROM ({sqls['ann_topk']}) bf
        LEFT JOIN ({sqls['ann_lsh']}) ap
               ON ap.q_id = bf.q_id AND ap.vec_id = bf.vec_id
        GROUP BY bf.q_id
    """
    sqls["lang_confusion"] = f"""
        SELECT d.lang, g.lang_guess, CAST(count(*) AS BIGINT) AS n
        FROM documents d
        JOIN ({sqls['lang_id']}) g USING (doc_id)
        GROUP BY d.lang, g.lang_guess
    """
    sqls["events_histogram"] = """
        WITH b AS (
            SELECT event_type,
                   CAST(floor(value / 25) AS BIGINT) AS bin
            FROM events
        )
        SELECT event_type, bin, CAST(bin * 25 AS BIGINT) AS lo,
               CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY event_type, bin
    """
    sqls["minhash_recall"] = f"""
        WITH ex AS (
            SELECT d1, d2 FROM ({sqls['ngram_jaccard']})
            WHERE jaccard >= 0.8
        ),
        mh AS (SELECT DISTINCT d1, d2 FROM ({sqls['minhash_dedup']}))
        SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact,
               CAST((SELECT count(*) FROM ex JOIN mh USING (d1, d2))
                    AS BIGINT) AS n_found,
               {_roundsql("CASE WHEN (SELECT count(*) FROM ex) = 0 THEN 1.0 ELSE CAST((SELECT count(*) FROM ex JOIN mh USING (d1, d2)) AS DOUBLE) / (SELECT count(*) FROM ex) END", 6)}
                   AS recall
    """
    sqls["kmv_error"] = f"""
        WITH ex AS (
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT)
                       AS exact_distinct
            FROM events GROUP BY event_type
        ),
        es AS (SELECT event_type, est_distinct
               FROM ({sqls['kmv_distinct']}))
        SELECT ex.event_type, ex.exact_distinct, es.est_distinct,
               {_roundsql('(es.est_distinct - ex.exact_distinct) / CAST(ex.exact_distinct AS DOUBLE)', 6)}
                   AS rel_err
        FROM ex JOIN es USING (event_type)
    """
    sqls["session_length_hist"] = f"""
        SELECT n_events AS session_events,
               CAST(count(*) AS BIGINT) AS n_sessions
        FROM ({sqls['sessionize']}) GROUP BY n_events
    """
    if ivf_cent is not None:
        sqls["ann_ivf_recall"] = f"""
            SELECT bf.q_id,
                   CAST(count(ap.vec_id) AS BIGINT) AS n_hit,
                   {_roundsql('count(ap.vec_id) / 10.0', 6)} AS recall
            FROM ({sqls['ann_topk']}) bf
            LEFT JOIN ({sqls['ann_ivf']}) ap
                   ON ap.q_id = bf.q_id AND ap.vec_id = bf.vec_id
            GROUP BY bf.q_id
        """
    else:
        sqls.pop("ann_ivf")
        sqls.pop("semantic_dedup")
    return sqls


def queries():
    return {
        "el_mentions": q_el_mentions,
        "el_answers": q_el_answers,
        "el_exact_cluster": q_el_exact_cluster,
        "el_cluster_sizes": q_el_cluster_sizes,
        "el_block_keys": q_el_block_keys,
        "el_block_keys_phonetic": q_el_block_keys_phonetic,
        "el_pair_jw": q_el_pair_jw,
        "el_pair_features": q_el_pair_features,
        "el_jw_components": q_el_jw_components,
        "el_sorted_neighborhood": q_el_sorted_neighborhood,
        "el_metablocking": q_el_metablocking,
        "el_blocking_quality": q_el_blocking_quality,
        "el_snb_quality": q_el_snb_quality,
        "el_rare_token_quality": q_el_rare_token_quality,
        "el_fs_weights": q_el_fs_weights,
        "el_token_sims": q_el_token_sims,
        "el_incremental_assign": q_el_incremental_assign,
        "el_block_skew": q_el_block_skew,
        "el_fs_em": q_el_fs_em,
        "el_em_scores": q_el_em_scores,
        "el_contexts": q_el_contexts,
        "el_coref_contexts": q_el_coref_contexts,
        "el_doc_entities": q_el_doc_entities,
        "el_human_readable": q_el_human_readable,
        "el_training_pairs": q_el_training_pairs,
        "el_sports_links": q_el_sports_links,
        "el_city_links": q_el_city_links,
        "el_cluster_links": q_el_cluster_links,
        "el_benchmark_report": q_el_benchmark_report,
        "comention_counts": q_comention_counts,
        "comention_pagerank": q_comention_pagerank,
        "comention_hits": q_comention_hits,
        "comention_kcore": q_comention_kcore,
        "comention_pmi": q_comention_pmi,
        "transcripts_passthrough": q_transcripts_passthrough,
        "conv_stats": q_conv_stats,
        "conv_dedup": q_conv_dedup,
        "conv_ngram_dedup": q_conv_ngram_dedup,
        "tool_calls": q_tool_calls,
        "tool_bigrams": q_tool_bigrams,
        "embed_quantize": q_embed_quantize,
        "bpe_token_count": q_bpe_token_count,
        "doc_fingerprint": q_doc_fingerprint,
        "exact_dedup": q_exact_dedup,
        "token_count": q_token_count,
        "doc_quality": q_doc_quality,
        "gopher_rules": q_gopher_rules,
        "lang_id": q_lang_id,
        "pii_redact": q_pii_redact,
        "strip_markup": q_strip_markup,
        "vocab_topk": q_vocab_topk,
        "unigram_logprob": q_unigram_logprob,
        "source_kl": q_source_kl,
        "lang_source_chi2": q_lang_source_chi2,
        "doc_chunk": q_doc_chunk,
        "decontaminate": q_decontaminate,
        "stratified_sample": q_stratified_sample,
        "source_mix": q_source_mix,
        "doc_top_terms": q_doc_top_terms,
        "repetition_score": q_repetition_score,
        "token_pack": q_token_pack,
        "group_quantiles": q_group_quantiles,
        "inverted_index": q_inverted_index,
        "bigram_topk": q_bigram_topk,
        "bigram_pmi": q_bigram_pmi,
        "zipf_slope": q_zipf_slope,
        "minhash_dedup": q_minhash_dedup,
        "near_dup_resolve": q_near_dup_resolve,
        "corpus_curation": q_corpus_curation,
        "simhash_dedup": q_simhash_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_topk": q_ann_topk,
        "hard_negatives": q_hard_negatives,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "bm25_topk": q_bm25_topk,
        "embedding_dups": q_embedding_dups,
        "semantic_dedup": q_semantic_dedup,
        "embedding_dups_exact": q_embedding_dups_exact,
        "multimodal_features": q_multimodal_features,
        "frame_sample": q_frame_sample,
        "image_resize": q_image_resize,
        "events_hourly": q_events_hourly,
        "events_anomaly": q_events_anomaly,
        "hopping_distinct": q_hopping_distinct,
        "weighted_sample": q_weighted_sample,
        "event_assoc_rules": q_event_assoc_rules,
        "bloom_semijoin": q_bloom_semijoin,
        "customer_order_gaps": q_customer_order_gaps,
        "customer_balance_ntile": q_customer_balance_ntile,
        "orders_yoy": q_orders_yoy,
        "events_entropy": q_events_entropy,
        "events_pareto": q_events_pareto,
        "user_decay_score": q_user_decay_score,
        "events_pivot": q_events_pivot,
        "events_running_total": q_events_running_total,
        "events_zscore": q_events_zscore,
        "events_topk_users": q_events_topk_users,
        "rollup_pricing": q_rollup_pricing,
        "hopping_window": q_hopping_window,
        "sessionize": q_sessionize,
        "interval_join": q_interval_join,
        "event_funnel": q_event_funnel,
        "kmv_distinct": q_kmv_distinct,
        "latest_event_state": q_latest_event_state,
        "cohort_retention": q_cohort_retention,
        "orders_no_recent_lineitem": q_orders_no_recent_lineitem,
        "sessionize_chunked": q_sessionize_chunked,
        "click_attribution": q_click_attribution,
        "segment_revenue": q_segment_revenue,
        "lineitem_pricing": q_lineitem_pricing,
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "tpch_q12": q_tpch_q12,
        "tpch_q4": q_tpch_q4,
        "tpch_q10": q_tpch_q10,
        "tpch_q7": q_tpch_q7,
        "tpch_q3": q_tpch_q3,
        "orders_topk_revenue": q_orders_topk_revenue,
        "el_mutual_best": q_el_mutual_best,
        "el_golden_record": q_el_golden_record,
        "comention_triangles": q_comention_triangles,
        "el_pair_edit": q_el_pair_edit,
        "el_pair_trigram": q_el_pair_trigram,
        "comention_clustering": q_comention_clustering,
        "tpch_q18": q_tpch_q18,
        "events_debounce": q_events_debounce,
        "el_block_keys_rare": q_el_block_keys_rare,
        "el_tfidf_sims": q_el_tfidf_sims,
        "el_cluster_ari": q_el_cluster_ari,
        "el_cluster_fm": q_el_cluster_fm,
        "el_soft_tfidf": q_el_soft_tfidf,
        "embed_label_centroids": q_embed_label_centroids,
        "embed_ncm_accuracy": q_embed_ncm_accuracy,
        "ann_lsh_recall": q_ann_lsh_recall,
        "el_pr_curve": q_el_pr_curve,
        "el_dedupe_e2e": q_el_dedupe_e2e,
        "comention_components": q_comention_components,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "minhash_recall": q_minhash_recall,
        "kmv_error": q_kmv_error,
        "el_block_purge": q_el_block_purge,
        "el_cluster_vmeasure": q_el_cluster_vmeasure,
        "source_quality": q_source_quality,
        "lang_confusion": q_lang_confusion,
        "events_histogram": q_events_histogram,
        "orders_rfm": q_orders_rfm,
        "el_alias_ambiguity": q_el_alias_ambiguity,
        "tpch_q14": q_tpch_q14,
        "orders_late_lineitem": q_orders_late_lineitem,
        "tpch_q13": q_tpch_q13,
        "tpch_q15": q_tpch_q15,
        "tpch_q17": q_tpch_q17,
        "tpch_q19": q_tpch_q19,
        "tpch_q22": q_tpch_q22,
        "el_cluster_purity": q_el_cluster_purity,
        "embed_norm_stats": q_embed_norm_stats,
        "doc_ttr": q_doc_ttr,
        "el_pair_monge_elkan": q_el_pair_monge_elkan,
        "embed_silhouette": q_embed_silhouette,
        "embed_covariance": q_embed_covariance,
        "conv_turn_taking": q_conv_turn_taking,
        "doc_readability": q_doc_readability,
        "turn_latency": q_turn_latency,
        "el_pair_damerau": q_el_pair_damerau,
        "el_acronym_candidates": q_el_acronym_candidates,
        "ann_ivf_recall": q_ann_ivf_recall,
        "events_markov": q_events_markov,
        "tpch_q8": q_tpch_q8,
        "el_rule_coverage": q_el_rule_coverage,
        "char_trigram_logprob": q_char_trigram_logprob,
        "embed_pair_hist": q_embed_pair_hist,
        "doc_containment": q_doc_containment,
        "comention_degree_hist": q_comention_degree_hist,
        "minhash_band_stats": q_minhash_band_stats,
        "tpch_q9": q_tpch_q9,
        "conv_vocab_overlap": q_conv_vocab_overlap,
        "embed_pca_power": q_embed_pca_power,
        "embed_pca_scores": q_embed_pca_scores,
        "near_dup_cluster_sizes": q_near_dup_cluster_sizes,
        "cross_source_dups": q_cross_source_dups,
        "el_candidate_topk": q_el_candidate_topk,
        "data_split_assign": q_data_split_assign,
        "events_value_ecdf": q_events_value_ecdf,
        "doc_length_hist": q_doc_length_hist,
        "windowed_comention": q_windowed_comention,
        "embed_quantize_error": q_embed_quantize_error,
        "minhash_est_error": q_minhash_est_error,
        "comention_neighbor_sim": q_comention_neighbor_sim,
        "part_copurchase": q_part_copurchase,
        "users_cumulative": q_users_cumulative,
        "session_length_hist": q_session_length_hist,
        "el_phonetic_confusables": q_el_phonetic_confusables,
        "tpch_q21": q_tpch_q21,
        "events_approx_quantiles": q_events_approx_quantiles,
        "doc_token_entropy": q_doc_token_entropy,
        "tpch_q2": q_tpch_q2,
        "tpch_q11": q_tpch_q11,
        "tpch_q16": q_tpch_q16,
        "tpch_q20": q_tpch_q20,
        "hll_distinct": q_hll_distinct,
        "part_skyline": q_part_skyline,
        "el_fingerprint_cluster": q_el_fingerprint_cluster,
        "ann_range_search": q_ann_range_search,
        "click_conversion_window": q_click_conversion_window,
        "kmeans_assign": q_kmeans_assign,
        "el_cluster_nmi": q_el_cluster_nmi,
        "events_cube": q_events_cube,
    }


def q_el_mutual_best(sf_dir: str):
    """Symmetric best match — deterministic one-to-one pairing over the
    labeled candidate pairs: keep (a, b) only when b is a's JW-argmax
    AND a is b's (el/ops/er.py::mutual_best; two hash exchanges)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import mutual_best

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"),
                               columns=["m1_id", "m2_id"])
    return mutual_best(gp, ref)


def q_el_golden_record(sf_dir: str):
    """Survivorship: canonical record per exact-alias cluster (longest
    surface, tie -> min mention_id) + member / distinct-conversation
    counts (el/ops/er.py::golden_record; per-batch (alias, conv)
    combiner then ONE alias exchange)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import golden_record

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "conv_id", "surface"])
    return golden_record(gm)


def q_comention_triangles(sf_dir: str):
    """Per-node triangle counts over the undirected co-mention graph —
    degree-ordered orientation so total wedge volume is O(m^1.5)
    (el/ops/graph.py::triangle_counts). Inherits comention_counts'
    1000-distinct-surfaces-per-conversation cap (logged there; the SQL
    oracle models no cap — exact below it)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.cooccur import comention_counts
    from .ops.graph import triangle_counts

    gm = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                               columns=["conv_id", "surface"])
    edges = comention_counts(gm).map_batches(
        lambda t: t.select(["s1", "s2"]), batch_format="pyarrow")
    return triangle_counts(edges)


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3-flavored shipping priority: top-10 still-shipping
    orders by outstanding revenue for one customer segment.

    Scale shape (the q5 discipline): customer and orders meet in
    tagged-union hash exchange #1 on custkey (no broadcast of either
    corpus-scale side); lineitem is date-filtered and pre-aggregated
    per (orderkey) per batch, then meets the order side in tagged-union
    hash exchange #2 on orderkey — each orderkey is complete in its
    block, so the global top-10 is a per-block top-10 plus one tiny
    merge. Revenue is exact integer cents x discount units (the
    tpch_q5 convention, same overflow guards). Output: (l_orderkey,
    revenue, o_orderdate, o_orderpriority) — 10 rows."""
    import ray.data

    from .shuffle import group_blocks

    cut = pd.Timestamp("1998-04-25")
    seg = "BUILDING"

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def cust_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["c_mktsegment"] == seg]
        n = len(df)
        return pa.table({
            "ckey": pa.array(df["c_custkey"].astype("int64")),
            "okey": pa.nulls(n, pa.int64()),
            "odate": pa.nulls(n, pa.timestamp("us")),
            "oprio": pa.nulls(n, pa.string()),
            "is_cust": pa.array([1] * n, pa.int64()),
        })

    def order_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["o_orderdate"] < cut]
        n = len(df)
        return pa.table({
            "ckey": pa.array(df["o_custkey"].astype("int64")),
            "okey": pa.array(df["o_orderkey"].astype("int64")),
            "odate": pa.array(df["o_orderdate"]),
            "oprio": pa.array(df["o_orderpriority"].astype(str),
                              pa.string()),
            "is_cust": pa.array([0] * n, pa.int64()),
        })

    tagged1 = cust.map_batches(cust_side, batch_format="pandas").union(
        orders.map_batches(order_side, batch_format="pandas"))

    def join1(df: pd.DataFrame) -> pa.Table:
        c = df[df["is_cust"] == 1]
        o = df[df["is_cust"] == 0]
        j = o[["ckey", "okey", "odate", "oprio"]].merge(
            c[["ckey"]], on="ckey")
        n = len(j)
        return pa.table({
            "okey": pa.array(j["okey"].astype("int64")),
            "odate": pa.array(j["odate"]),
            "oprio": pa.array(j["oprio"].astype(str), pa.string()),
            "rev": pa.array([0] * n, pa.int64()),
            "is_order": pa.array([1] * n, pa.int64()),
        })

    order_rows = group_blocks(tagged1, ["ckey"], join1,
                              batch_format="pandas")

    def li_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["l_shipdate"] > cut]
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        rev_f = cents * (100 - disc)
        if len(rev_f) and np.max(np.abs(rev_f)) >= 2.0**53:
            raise OverflowError(
                "tpch_q3: per-line revenue exceeds the float64 "
                "integer-exact envelope (2^53); widen to decimal")
        part = (df.assign(rev=rev_f.astype("int64"))
                .groupby("l_orderkey", as_index=False)["rev"].sum())
        n = len(part)
        return pa.table({
            "okey": pa.array(part["l_orderkey"].astype("int64")),
            "odate": pa.nulls(n, pa.timestamp("us")),
            "oprio": pa.nulls(n, pa.string()),
            "rev": pa.array(part["rev"].astype("int64")),
            "is_order": pa.array([0] * n, pa.int64()),
        })

    tagged2 = order_rows.union(li.map_batches(li_side,
                                              batch_format="pandas"))

    def join2(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"okey": "int64", "rev": "int64",
                "odate": "datetime64[us]", "oprio": str}
        o = df[df["is_order"] == 1]
        l = df[df["is_order"] == 0]
        j = o[["okey", "odate", "oprio"]].merge(
            l[["okey", "rev"]], on="okey")
        if len(j) == 0:
            return pd.DataFrame({c: pd.Series(dtype=d)
                                 for c, d in cols.items()})
        g = j.groupby(["okey", "odate", "oprio"], as_index=False)["rev"] \
            .sum()
        if g["rev"].abs().max() >= 2**62:
            raise OverflowError(
                "tpch_q3: per-order partial revenue past the int64 "
                "headroom (2^62); widen the accumulator to decimal")
        g["rev"] = g["rev"].astype("int64")
        # each orderkey is COMPLETE in this block: local top-10 is safe
        g = g.sort_values(["rev", "odate", "okey"],
                          ascending=[False, True, True],
                          kind="stable").head(10)
        return g[["okey", "rev", "odate", "oprio"]]

    heads = group_blocks(tagged2, ["okey"], join2, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "l_orderkey": pd.Series(dtype="int64"),
                "revenue": pd.Series(dtype="float64"),
                "o_orderdate": pd.Series(dtype="datetime64[us]"),
                "o_orderpriority": pd.Series(dtype=str)})
        df = df.sort_values(["rev", "odate", "okey"],
                            ascending=[False, True, True],
                            kind="stable").head(10)
        return pd.DataFrame({
            "l_orderkey": df["okey"].astype("int64").to_numpy(),
            "revenue": _round_half_away(
                df["rev"].to_numpy() / 10000.0, 2),
            "o_orderdate": df["odate"].to_numpy(),
            "o_orderpriority": df["oprio"].to_numpy()})

    return heads.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_el_pair_trigram(sf_dir: str):
    """Character-trigram count-vector cosine per labeled candidate
    pair — the char-n-gram member of the similarity menu
    (el/ops/er.py::trigram_pair_sims; engine and oracle share the
    same SQL text, so the plan replays identically)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import trigram_pair_sims

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"),
                               columns=["m1_id", "m2_id"])
    return trigram_pair_sims(gp, ref)


def q_el_pair_edit(sf_dir: str):
    """Levenshtein distance + normalized similarity per labeled
    candidate pair (el/ops/er.py::edit_pair_sims; DuckDB levenshtein()
    replays the DP exactly)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import edit_pair_sims

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"),
                               columns=["m1_id", "m2_id"])
    return edit_pair_sims(gp, ref)


def q_comention_clustering(sf_dir: str):
    """Local clustering coefficient per co-mention-graph node
    (el/ops/graph.py::clustering_coefficients): 2T/(d(d-1)) for
    degree >= 2, triangles via degree-ordered orientation. Inherits
    comention_counts' per-conversation cap (logged; oracle models no
    cap — exact below it)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.cooccur import comention_counts
    from .ops.graph import clustering_coefficients

    gm = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                               columns=["conv_id", "surface"])
    edges = comention_counts(gm).map_batches(
        lambda t: t.select(["s1", "s2"]), batch_format="pyarrow")
    return clustering_coefficients(edges)


def q_tpch_q18(sf_dir: str):
    """TPC-H Q18-flavored large-volume customers: top-100 orders whose
    total quantity exceeds the threshold, with their customer.

    Scale shape: lineitem pre-aggregates quantity units per orderkey
    per batch, then meets the orders rows in tagged-union hash exchange
    #1 on orderkey (each orderkey complete in its block: the HAVING
    filter is block-local); survivors meet customer in tagged-union
    hash exchange #2 on custkey; top-100 = per-block local top-100 +
    one tiny merge, ordered by integer total-price cents (no float-tie
    ambiguity). Quantities on the integer 0.01 grid end-to-end.
    Output: (c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
    sum_qty)."""
    import ray.data

    from .shuffle import group_blocks

    qty_min_units = 300 * 100  # HAVING sum(l_quantity) > 300

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"])
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"])

    def li_side(df: pd.DataFrame) -> pa.Table:
        qu = np.floor(df["l_quantity"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        part = (df.assign(qu=qu)
                .groupby("l_orderkey", as_index=False)["qu"].sum())
        n = len(part)
        return pa.table({
            "okey": pa.array(part["l_orderkey"].astype("int64")),
            "ckey": pa.nulls(n, pa.int64()),
            "odate": pa.nulls(n, pa.timestamp("us")),
            "tp_cents": pa.nulls(n, pa.int64()),
            "qu": pa.array(part["qu"].astype("int64")),
            "is_order": pa.array([0] * n, pa.int64()),
        })

    def order_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        tp = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        return pa.table({
            "okey": pa.array(df["o_orderkey"].astype("int64")),
            "ckey": pa.array(df["o_custkey"].astype("int64")),
            "odate": pa.array(df["o_orderdate"]),
            "tp_cents": pa.array(tp),
            "qu": pa.nulls(n, pa.int64()),
            "is_order": pa.array([1] * n, pa.int64()),
        })

    tagged1 = li.map_batches(li_side, batch_format="pandas").union(
        orders.map_batches(order_side, batch_format="pandas"))

    def join1(df: pd.DataFrame) -> pa.Table:
        l = df[df["is_order"] == 0]
        o = df[df["is_order"] == 1]
        qty = l.groupby("okey", as_index=False)["qu"].sum()
        qty = qty[qty["qu"] > qty_min_units]
        j = o[["okey", "ckey", "odate", "tp_cents"]].merge(qty, on="okey")
        n = len(j)
        return pa.table({
            "ckey": pa.array(j["ckey"].astype("int64")),
            "okey": pa.array(j["okey"].astype("int64")),
            "odate": pa.array(j["odate"]),
            "tp_cents": pa.array(j["tp_cents"].astype("int64")),
            "qu": pa.array(j["qu"].astype("int64")),
            "name": pa.nulls(n, pa.string()),
            "is_big": pa.array([1] * n, pa.int64()),
        })

    big = group_blocks(tagged1, ["okey"], join1, batch_format="pandas")

    def cust_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "ckey": pa.array(df["c_custkey"].astype("int64")),
            "okey": pa.nulls(n, pa.int64()),
            "odate": pa.nulls(n, pa.timestamp("us")),
            "tp_cents": pa.nulls(n, pa.int64()),
            "qu": pa.nulls(n, pa.int64()),
            "name": pa.array(df["c_name"].astype(str), pa.string()),
            "is_big": pa.array([0] * n, pa.int64()),
        })

    tagged2 = big.union(cust.map_batches(cust_side,
                                         batch_format="pandas"))

    def join2(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"name": str, "ckey": "int64", "okey": "int64",
                "odate": "datetime64[us]", "tp_cents": "int64",
                "qu": "int64"}
        b = df[df["is_big"] == 1]
        c = df[df["is_big"] == 0]
        j = b[["ckey", "okey", "odate", "tp_cents", "qu"]].merge(
            c[["ckey", "name"]], on="ckey")
        if len(j) == 0:
            return pd.DataFrame({k: pd.Series(dtype=d)
                                 for k, d in cols.items()})
        j = j.sort_values(["tp_cents", "odate", "okey"],
                          ascending=[False, True, True],
                          kind="stable").head(100)
        return j[list(cols)]

    heads = group_blocks(tagged2, ["ckey"], join2, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "c_name": pd.Series(dtype=str),
                "c_custkey": pd.Series(dtype="int64"),
                "o_orderkey": pd.Series(dtype="int64"),
                "o_orderdate": pd.Series(dtype="datetime64[us]"),
                "o_totalprice": pd.Series(dtype="float64"),
                "sum_qty": pd.Series(dtype="float64")})
        df = df.sort_values(["tp_cents", "odate", "okey"],
                            ascending=[False, True, True],
                            kind="stable").head(100)
        return pd.DataFrame({
            "c_name": df["name"].to_numpy(),
            "c_custkey": df["ckey"].astype("int64").to_numpy(),
            "o_orderkey": df["okey"].astype("int64").to_numpy(),
            "o_orderdate": df["odate"].to_numpy(),
            "o_totalprice": df["tp_cents"].to_numpy() / 100.0,
            "sum_qty": df["qu"].to_numpy() / 100.0})

    return heads.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_events_debounce(sf_dir: str):
    """Streaming debounce / burst-leader dedup: keep an event iff it is
    the first of its (user_id, event_type) stream or follows the
    PREVIOUS raw event by >= 1 hour — the keep-first-of-burst CDC
    primitive. ONE (user, type) hash exchange + block-local lexsorted
    shift diff (no per-row loop). Out: the kept rows (event_id,
    user_id, event_type, ts)."""
    import ray.data

    from .shuffle import group_blocks

    gap_us = 3_600_000_000

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "ts"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": "int64", "user_id": "int64",
                "event_type": str, "ts": "datetime64[us]"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=d)
                                 for k, d in cols.items()})
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"],
                            kind="stable").reset_index(drop=True)
        tu = df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy(dtype=object)
        new_grp = np.ones(len(df), dtype=bool)
        new_grp[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        gap_ok = np.ones(len(df), dtype=bool)
        gap_ok[1:] = (tu[1:] - tu[:-1]) >= gap_us
        out = df[new_grp | gap_ok]
        return out[list(cols)].reset_index(drop=True)

    return group_blocks(ev, ["user_id", "event_type"], keep,
                        batch_format="pandas")


def q_el_block_keys_rare(sf_dir: str):
    """Term-frequency blocking key: each mention's RAREST normalized
    token (min document frequency, ties to the smaller token) — the
    dedupe/Splink rare-token predicate
    (el/ops/er.py::rare_token_keys)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import rare_token_keys

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"])
    return rare_token_keys(gm)


def q_el_tfidf_sims(sf_dir: str):
    """TF-IDF cosine per labeled candidate pair (Cohen et al.'s classic
    ER metric), idf on the integer 1e-6 grid so shared mass and norms
    are exact integer sums (el/ops/er.py::tfidf_pair_sims)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import tfidf_pair_sims

    gm_t = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                         columns=["mention_id", "surface"])
    surf = dict(zip(gm_t.column("mention_id").to_pylist(),
                    gm_t.column("surface").to_pylist()))
    ref = ray.put(surf)
    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"])
    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"),
                               columns=["m1_id", "m2_id"])
    return tfidf_pair_sims(gp, gm, ref)


def q_el_cluster_ari(sf_dir: str):
    """Adjusted Rand Index of the exact-alias clustering vs gold labels
    — integer pair combinatorics from three combiner exchanges
    (el/ops/er.py::cluster_ari); one row out."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import cluster_ari

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface", "gold_kb_id"])
    return cluster_ari(gm)


def q_el_cluster_fm(sf_dir: str):
    """Fowlkes-Mallows index of exact-alias clustering vs gold labels —
    geometric mean of pairwise precision/recall from the same three
    integer pair masses as ARI (el/ops/er.py::cluster_fm); one row."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import cluster_fm

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface", "gold_kb_id"])
    return cluster_fm(gm)


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 forecasting-revenue-change: sum(extendedprice *
    discount) over 1994 shipments with discount in [0.05, 0.07] and
    quantity < 24. Fully streaming — per-batch integer-cents x
    integer-discount partial sums (2^53 envelope guard), one-row
    merge; NO exchange touches row-scale data. Out: (revenue[2dp],
    n_lineitems)."""
    import ray.data

    lo, hi = pd.Timestamp("1994-01-01"), pd.Timestamp("1995-01-01")

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        keep = ((df["l_shipdate"].to_numpy() >= lo.to_datetime64())
                & (df["l_shipdate"].to_numpy() < hi.to_datetime64())
                & (disc >= 5) & (disc <= 7)
                & (df["l_quantity"].to_numpy() < 24))
        cents = np.floor(
            df["l_extendedprice"].to_numpy()[keep] * 100 + 0.5)
        rev_f = cents * disc[keep]
        if len(rev_f) and np.max(np.abs(rev_f)) >= 2.0**53:
            raise OverflowError(
                "tpch_q6: per-line revenue exceeds the float64 "
                "integer-exact envelope (2^53); widen to decimal")
        return pd.DataFrame({
            "rev": pd.array([int(rev_f.sum())], dtype="int64"),
            "cnt": pd.array([int(keep.sum())], dtype="int64")})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"revenue": "float64", "n_lineitems": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        rev = int(df["rev"].sum())
        r2 = float(np.floor(rev / 10000.0 * 100 + 0.5) / 100)
        return pd.DataFrame({
            "revenue": [r2],
            "n_lineitems": pd.array([int(df["cnt"].sum())],
                                    dtype="int64")})

    return (li.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12-flavored shipping-priority crosstab, adapted to this
    schema (no l_shipmode/commitdate columns — the grouping key is
    l_returnflag and the date gate is l_shipdate in 1996; the query's
    SHAPE is Q12's: lineitem ⋈ orders with a two-class priority
    CASE crosstab, TPC-H spec Q12 / reference's per-category
    benchmark groupings).

    Scale shape: lineitem is date-filtered and pre-aggregated per
    (orderkey, returnflag) per batch; orders ships only (okey,
    is_high). Both meet in ONE tagged-union hash exchange on orderkey
    (no corpus-scale broadcast); the in-fold join emits one
    (returnflag, high, low) partial row per block, merged in a final
    one-row-per-flag pass. Out: (l_returnflag, high_line_count,
    low_line_count) sorted by flag."""
    import ray.data

    from .shuffle import group_blocks

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    high = ("1-URGENT", "2-HIGH")

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_shipdate"])

    def order_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "okey": pa.array(df["o_orderkey"].astype("int64")),
            "flag": pa.nulls(n, pa.string()),
            "cnt": pa.nulls(n, pa.int64()),
            "is_high": pa.array(
                df["o_orderpriority"].isin(high).astype("int64")),
            "is_order": pa.array([1] * n, pa.int64()),
        })

    def li_side(df: pd.DataFrame) -> pa.Table:
        sd = df["l_shipdate"].to_numpy()
        df = df[(sd >= lo.to_datetime64()) & (sd < hi.to_datetime64())]
        part = (df.groupby(["l_orderkey", "l_returnflag"],
                           as_index=False).size()
                .rename(columns={"size": "cnt"}))
        n = len(part)
        return pa.table({
            "okey": pa.array(part["l_orderkey"].astype("int64")),
            "flag": pa.array(part["l_returnflag"].astype(str),
                             pa.string()),
            "cnt": pa.array(part["cnt"].astype("int64")),
            "is_high": pa.nulls(n, pa.int64()),
            "is_order": pa.array([0] * n, pa.int64()),
        })

    tagged = orders.map_batches(order_side, batch_format="pandas") \
        .union(li.map_batches(li_side, batch_format="pandas"))

    def join_fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"l_returnflag": str}
        o = df[df["is_order"] == 1]
        l = df[df["is_order"] == 0]
        j = l[["okey", "flag", "cnt"]].merge(
            o[["okey", "is_high"]], on="okey")
        if len(j) == 0:
            return pd.DataFrame({
                **{c: pd.Series(dtype=t) for c, t in cols.items()},
                "high": pd.Series(dtype="int64"),
                "low": pd.Series(dtype="int64")})
        j["high"] = j["cnt"] * j["is_high"]
        j["low"] = j["cnt"] * (1 - j["is_high"])
        out = j.groupby("flag", as_index=False)[["high", "low"]].sum()
        out = out.rename(columns={"flag": "l_returnflag"})
        out["high"] = out["high"].astype("int64")
        out["low"] = out["low"].astype("int64")
        return out

    parts = group_blocks(tagged, ["okey"], join_fold,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"l_returnflag": str, "high_line_count": "int64",
                "low_line_count": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in cols.items()})
        out = df.groupby("l_returnflag", as_index=False) \
            [["high", "low"]].sum()
        out = out.rename(columns={"high": "high_line_count",
                                  "low": "low_line_count"})
        out["high_line_count"] = out["high_line_count"].astype("int64")
        out["low_line_count"] = out["low_line_count"].astype("int64")
        return out.sort_values("l_returnflag").reset_index(drop=True)

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4 order-priority checking, adapted to this catalog (no
    commit/receipt dates, so the EXISTS gate is q_tpch_q21's 'late'
    notion: some lineitem shipped > 60 days after the order date):
    orders placed in 1995Q3 with at least one late line, counted per
    priority (TPC-H spec Q4 / reference's per-category benchmark
    groupings).

    Scale shape: orders are date-filtered per batch and ship (okey,
    priority, orderdate); lineitem pre-reduces per batch to ONE
    (okey, max shipdate) partial row; both meet in ONE tagged-union
    hash exchange on orderkey where the EXISTS is a co-located
    group-max compare, emitting per-block priority partials; final
    one-row-per-priority merge. Out: (o_orderpriority, order_count)
    sorted by priority."""
    import ray.data

    from .shuffle import group_blocks

    lo, hi = pd.Timestamp("1995-07-01"), pd.Timestamp("1995-10-01")
    lag = pd.Timedelta(days=60)

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"])

    def order_side(df: pd.DataFrame) -> pa.Table:
        od = df["o_orderdate"].to_numpy()
        df = df[(od >= lo.to_datetime64()) & (od < hi.to_datetime64())]
        n = len(df)
        return pa.table({
            "okey": pa.array(df["o_orderkey"].astype("int64")),
            "prio": pa.array(df["o_orderpriority"].astype(str),
                             pa.string()),
            "odate": pa.Array.from_pandas(df["o_orderdate"]).cast(
                pa.timestamp("us")),
            "ms": pa.nulls(n, pa.timestamp("us")),
            "is_order": pa.array([1] * n, pa.int64()),
        })

    def li_side(df: pd.DataFrame) -> pa.Table:
        part = df.groupby("l_orderkey", as_index=False)["l_shipdate"] \
            .max()
        n = len(part)
        return pa.table({
            "okey": pa.array(part["l_orderkey"].astype("int64")),
            "prio": pa.nulls(n, pa.string()),
            "odate": pa.nulls(n, pa.timestamp("us")),
            "ms": pa.Array.from_pandas(part["l_shipdate"]).cast(
                pa.timestamp("us")),
            "is_order": pa.array([0] * n, pa.int64()),
        })

    tagged = orders.map_batches(order_side, batch_format="pandas") \
        .union(li.map_batches(li_side, batch_format="pandas"))

    def join_fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "o_orderpriority": pd.Series(dtype=str),
            "n": pd.Series(dtype="int64")})
        if len(df) == 0:
            return empty
        o = df[df["is_order"] == 1]
        l = df[df["is_order"] == 0]
        if len(o) == 0 or len(l) == 0:
            return empty
        ms = l.groupby("okey", as_index=False)["ms"].max()
        j = o[["okey", "prio", "odate"]].merge(ms, on="okey")
        j = j[j["ms"] > j["odate"] + lag]
        if len(j) == 0:
            return empty
        out = j.groupby("prio", as_index=False).size().rename(
            columns={"prio": "o_orderpriority", "size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    parts = group_blocks(tagged, ["okey"], join_fold,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "o_orderpriority": pd.Series(dtype=str),
                "order_count": pd.Series(dtype="int64")})
        out = df.groupby("o_orderpriority", as_index=False)["n"].sum() \
            .rename(columns={"n": "order_count"})
        out["order_count"] = out["order_count"].astype("int64")
        return out.sort_values("o_orderpriority").reset_index(drop=True)

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10 returned-item reporting: top-20 customers by revenue
    from l_returnflag='R' lineitems of 1996-Q4 orders, with name /
    account balance / nation attached.

    Scale shape (the q3 discipline): lineitem pre-aggregates R-flag
    revenue per orderkey per batch (exact integer cents x discount
    units, 2^53 guard); date-filtered orders meet it in tagged-union
    hash exchange #1 on orderkey; the joined (custkey, cents) partials
    meet customer in tagged-union hash exchange #2 on custkey — each
    custkey complete in its block, so the global top-20 is per-block
    top-20 + one tiny merge. nation (25 rows) attaches from a
    driver-side dict — the one genuinely constant-size side. Out:
    (c_custkey, c_name, revenue[2dp], c_acctbal, n_name), top-20 by
    (revenue desc, custkey asc)."""
    import pyarrow.parquet as pq
    import ray.data

    from .shuffle import group_blocks

    lo, hi = pd.Timestamp("1996-10-01"), pd.Timestamp("1997-01-01")

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    n_name = dict(zip(nat["n_nationkey"].astype(int),
                      nat["n_name"].astype(str)))

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])

    def li_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["l_returnflag"] == "R"]
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        rev_f = cents * (100 - disc)
        if len(rev_f) and np.max(np.abs(rev_f)) >= 2.0**53:
            raise OverflowError(
                "tpch_q10: per-line revenue exceeds the float64 "
                "integer-exact envelope (2^53); widen to decimal")
        part = (df.assign(rev=rev_f.astype("int64"))
                .groupby("l_orderkey", as_index=False)["rev"].sum())
        n = len(part)
        return pa.table({
            "okey": pa.array(part["l_orderkey"].astype("int64")),
            "ckey": pa.nulls(n, pa.int64()),
            "rev": pa.array(part["rev"].astype("int64")),
            "is_order": pa.array([0] * n, pa.int64())})

    def order_side(df: pd.DataFrame) -> pa.Table:
        od = df["o_orderdate"].to_numpy()
        df = df[(od >= lo.to_datetime64()) & (od < hi.to_datetime64())]
        n = len(df)
        return pa.table({
            "okey": pa.array(df["o_orderkey"].astype("int64")),
            "ckey": pa.array(df["o_custkey"].astype("int64")),
            "rev": pa.nulls(n, pa.int64()),
            "is_order": pa.array([1] * n, pa.int64())})

    tagged1 = li.map_batches(li_side, batch_format="pandas").union(
        orders.map_batches(order_side, batch_format="pandas"))

    def join1(df: pd.DataFrame) -> pa.Table:
        o = df[df["is_order"] == 1]
        l = df[df["is_order"] == 0]
        j = l[["okey", "rev"]].merge(o[["okey", "ckey"]], on="okey")
        part = j.groupby("ckey", as_index=False)["rev"].sum()
        n = len(part)
        return pa.table({
            "ckey": pa.array(part["ckey"].astype("int64")),
            "rev": pa.array(part["rev"].astype("int64")),
            "name": pa.nulls(n, pa.string()),
            "nkey": pa.nulls(n, pa.int64()),
            "bal": pa.nulls(n, pa.float64()),
            "is_cust": pa.array([0] * n, pa.int64())})

    cust_rev = group_blocks(tagged1, ["okey"], join1,
                            batch_format="pandas")

    def cust_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "ckey": pa.array(df["c_custkey"].astype("int64")),
            "rev": pa.nulls(n, pa.int64()),
            "name": pa.array(df["c_name"].astype(str), pa.string()),
            "nkey": pa.array(df["c_nationkey"].astype("int64")),
            "bal": pa.array(df["c_acctbal"].astype("float64")),
            "is_cust": pa.array([1] * n, pa.int64())})

    tagged2 = cust_rev.union(
        cust.map_batches(cust_side, batch_format="pandas"))

    def empty_out() -> pd.DataFrame:
        cols = {"c_custkey": "int64", "c_name": str,
                "revenue": "float64", "c_acctbal": "float64",
                "n_name": str}
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in cols.items()})

    def join2_topk(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["is_cust"] == 1]
        r = df[df["is_cust"] == 0]
        if len(r) == 0 or len(c) == 0:
            return empty_out()
        rev = r.groupby("ckey", as_index=False)["rev"].sum()
        j = rev.merge(c[["ckey", "name", "nkey", "bal"]], on="ckey")
        if len(j) == 0:
            return empty_out()
        j = j.sort_values(["rev", "ckey"],
                          ascending=[False, True]).head(20)
        return pd.DataFrame({
            "c_custkey": j["ckey"].astype("int64").to_numpy(),
            "c_name": j["name"].astype(str).to_numpy(),
            "revenue": np.floor(j["rev"].to_numpy("int64") / 10000.0
                                * 100 + 0.5) / 100,
            "c_acctbal": j["bal"].astype("float64").to_numpy(),
            "n_name": j["nkey"].astype(int).map(n_name).astype(str)
            .to_numpy()})

    parts = group_blocks(tagged2, ["ckey"], join2_topk,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty_out()
        out = df.sort_values(["revenue", "c_custkey"],
                             ascending=[False, True]).head(20)
        return out.reset_index(drop=True)

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 volume shipping between two nations (NATION_9 and
    NATION_6 here; shipdate years 1996-1997): revenue per
    (supp_nation, cust_nation, year) where supplier and customer sit
    in opposite nations of the pair.

    Scale shape — the registry's deepest join chain, THREE chained
    tagged-union hash exchanges with semi-join pushdown: supplier and
    customer are nation-filtered BEFORE their exchanges, so only
    pair-nation rows ride the shuffles; lineitem pre-filters the
    shipdate years and pre-aggregates revenue per (suppkey, orderkey,
    year) cents per batch. Exchange #1 (suppkey) attaches the supplier
    nation and drops non-pair lineitems; #2 (orderkey) attaches
    custkey; #3 (custkey) attaches the customer nation, keeps opposite
    -nation pairs, and folds per-block (s_nat, c_nat, year) partials —
    a tiny final merge finishes. Revenue is exact integer cents x
    discount units (q3 convention + 2^53 guard). Out: (supp_nation,
    cust_nation, l_year, revenue[2dp])."""
    import pyarrow.parquet as pq
    import ray.data

    from .shuffle import group_blocks

    N1, N2 = "NATION_9", "NATION_6"
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int),
                       nat["n_name"].astype(str)))
    pair_keys = {k for k, v in name_of.items() if v in (N1, N2)}

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"])
    supp = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"])
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])

    def li_side(df: pd.DataFrame) -> pa.Table:
        sd = df["l_shipdate"].to_numpy()
        df = df[(sd >= lo.to_datetime64()) & (sd < hi.to_datetime64())]
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        rev_f = cents * (100 - disc)
        if len(rev_f) and np.max(np.abs(rev_f)) >= 2.0**53:
            raise OverflowError(
                "tpch_q7: per-line revenue exceeds the float64 "
                "integer-exact envelope (2^53); widen to decimal")
        year = df["l_shipdate"].to_numpy().astype("datetime64[Y]") \
            .astype("int64") + 1970
        part = (df.assign(rev=rev_f.astype("int64"), year=year)
                .groupby(["l_suppkey", "l_orderkey", "year"],
                         as_index=False)["rev"].sum())
        n = len(part)
        return pa.table({
            "k": pa.array(part["l_suppkey"].astype("int64")),
            "okey": pa.array(part["l_orderkey"].astype("int64")),
            "year": pa.array(part["year"].astype("int64")),
            "rev": pa.array(part["rev"].astype("int64")),
            "nat": pa.nulls(n, pa.int64()),
            "tag": pa.array([0] * n, pa.int64())})

    def supp_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["s_nationkey"].isin(pair_keys)]
        n = len(df)
        return pa.table({
            "k": pa.array(df["s_suppkey"].astype("int64")),
            "okey": pa.nulls(n, pa.int64()),
            "year": pa.nulls(n, pa.int64()),
            "rev": pa.nulls(n, pa.int64()),
            "nat": pa.array(df["s_nationkey"].astype("int64")),
            "tag": pa.array([1] * n, pa.int64())})

    tagged1 = li.map_batches(li_side, batch_format="pandas").union(
        supp.map_batches(supp_side, batch_format="pandas"))

    def join1(df: pd.DataFrame) -> pa.Table:
        s = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l[["k", "okey", "year", "rev"]].merge(
            s[["k", "nat"]], on="k")
        n = len(j)
        return pa.table({
            "k": pa.array(j["okey"].astype("int64")),
            "year": pa.array(j["year"].astype("int64")),
            "rev": pa.array(j["rev"].astype("int64")),
            "snat": pa.array(j["nat"].astype("int64")),
            "ckey": pa.nulls(n, pa.int64()),
            "tag": pa.array([0] * n, pa.int64())})

    def order_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "k": pa.array(df["o_orderkey"].astype("int64")),
            "year": pa.nulls(n, pa.int64()),
            "rev": pa.nulls(n, pa.int64()),
            "snat": pa.nulls(n, pa.int64()),
            "ckey": pa.array(df["o_custkey"].astype("int64")),
            "tag": pa.array([1] * n, pa.int64())})

    tagged2 = group_blocks(tagged1, ["k"], join1,
                           batch_format="pandas").union(
        orders.map_batches(order_side, batch_format="pandas"))

    def join2(df: pd.DataFrame) -> pa.Table:
        o = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l[["k", "year", "rev", "snat"]].merge(
            o[["k", "ckey"]], on="k")
        n = len(j)
        return pa.table({
            "k": pa.array(j["ckey"].astype("int64")),
            "year": pa.array(j["year"].astype("int64")),
            "rev": pa.array(j["rev"].astype("int64")),
            "snat": pa.array(j["snat"].astype("int64")),
            "cnat": pa.nulls(n, pa.int64()),
            "tag": pa.array([0] * n, pa.int64())})

    def cust_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["c_nationkey"].isin(pair_keys)]
        n = len(df)
        return pa.table({
            "k": pa.array(df["c_custkey"].astype("int64")),
            "year": pa.nulls(n, pa.int64()),
            "rev": pa.nulls(n, pa.int64()),
            "snat": pa.nulls(n, pa.int64()),
            "cnat": pa.array(df["c_nationkey"].astype("int64")),
            "tag": pa.array([1] * n, pa.int64())})

    tagged3 = group_blocks(tagged2, ["k"], join2,
                           batch_format="pandas").union(
        cust.map_batches(cust_side, batch_format="pandas"))

    def join3_fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"snat": "int64", "cnat": "int64", "year": "int64",
                "rev": "int64"}
        c = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l[["k", "year", "rev", "snat"]].merge(
            c[["k", "cnat"]], on="k")
        j = j[j["snat"] != j["cnat"]]  # opposite nations of the pair
        if len(j) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = j.groupby(["snat", "cnat", "year"], as_index=False)["rev"] \
            .sum()
        return out.astype({"snat": "int64", "cnat": "int64",
                           "year": "int64", "rev": "int64"})

    parts = group_blocks(tagged3, ["k"], join3_fold,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"supp_nation": str, "cust_nation": str,
                "l_year": "int64", "revenue": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby(["snat", "cnat", "year"], as_index=False)["rev"] \
            .sum()
        return pd.DataFrame({
            "supp_nation": out["snat"].astype(int).map(name_of)
            .astype(str).to_numpy(),
            "cust_nation": out["cnat"].astype(int).map(name_of)
            .astype(str).to_numpy(),
            "l_year": out["year"].astype("int64").to_numpy(),
            "revenue": np.floor(out["rev"].to_numpy("int64") / 10000.0
                                * 100 + 0.5) / 100,
        }).sort_values(["supp_nation", "cust_nation", "l_year"]) \
            .reset_index(drop=True)

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_el_soft_tfidf(sf_dir: str):
    """Soft-TF-IDF (Cohen-Ravikumar-Fienberg) per labeled candidate
    pair: TF-IDF mass along best JW>=0.9 token alignments
    (el/ops/er.py::soft_tfidf_pair_sims)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import soft_tfidf_pair_sims

    gm_t = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                         columns=["mention_id", "surface"])
    surf = dict(zip(gm_t.column("mention_id").to_pylist(),
                    gm_t.column("surface").to_pylist()))
    ref = ray.put(surf)
    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"])
    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"),
                               columns=["m1_id", "m2_id"])
    return soft_tfidf_pair_sims(gp, gm, ref)


def q_embed_label_centroids(sf_dir: str):
    """Per-label embedding centroids on the fixed integer 1e-6 grid —
    exact int64 cross-vector sums, one label exchange of tiny partials
    (el/ops/ann.py::label_centroids)."""
    from .ops.ann import label_centroids

    return label_centroids(_read(sf_dir, "embeddings"))


def q_embed_ncm_accuracy(sf_dir: str):
    """Nearest-class-mean classification accuracy per label over the
    embeddings table — bit-exact integer-grid argmin against the
    rounded label centroids (el/ops/ann.py::ncm_accuracy)."""
    from .ops.ann import ncm_accuracy

    return ncm_accuracy(_read(sf_dir, "embeddings"))


def _ann_recall_ds(bf, ap):
    """Shared recall@10 composition: tag the exact (bf) and approximate
    (ap) top-k result sets, meet in ONE tiny q_id exchange, count
    hits. Used by ann_lsh_recall and ann_ivf_recall."""
    from .shuffle import group_blocks

    def tag(is_bf: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "q_id": df["q_id"].astype("int64"),
                "vec_id": df["vec_id"].astype("int64"),
                "is_bf": np.full(len(df), is_bf, dtype=np.int64)})
        return f

    tagged = bf.map_batches(tag(1), batch_format="pandas").union(
        ap.map_batches(tag(0), batch_format="pandas"))

    def recall(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"q_id": "int64", "n_hit": "int64", "recall": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        b = df[df["is_bf"] == 1]
        a = df[df["is_bf"] == 0]
        hit = b.merge(a[["q_id", "vec_id"]], on=["q_id", "vec_id"])
        n_hit = hit.groupby("q_id").size()
        g = b[["q_id"]].drop_duplicates().set_index("q_id")
        g["n_hit"] = n_hit
        g = g.fillna(0).reset_index()
        return pd.DataFrame({
            "q_id": g["q_id"].astype("int64"),
            "n_hit": g["n_hit"].astype("int64"),
            "recall": np.floor(g["n_hit"].to_numpy(np.float64)
                               / 10.0 * 1e6 + 0.5) / 1e6})

    return group_blocks(tagged, ["q_id"], recall, batch_format="pandas")


def q_ann_lsh_recall(sf_dir: str):
    """Recall@10 of the LSH-bucketed ANN against the exact brute-force
    top-10, per query — the standard ANN quality metric. Composes the
    two existing oracled pipelines: their tagged results meet in one
    tiny q_id exchange (30 rows a side at the fixed query set)."""
    return _ann_recall_ds(q_ann_topk(sf_dir), q_ann_lsh(sf_dir))


def q_ann_ivf_recall(sf_dir: str):
    """Recall@10 of the IVF-probed ANN against the exact brute-force
    top-10, per query — the IVF twin of ann_lsh_recall (same tagged
    q_id exchange; the n_probe=6 setting's quality knob made
    measurable)."""
    return _ann_recall_ds(q_ann_topk(sf_dir), q_ann_ivf(sf_dir))


PR_CURVE_THRESHOLDS = [80, 82, 84, 86, 88, 90, 92, 94, 96, 98]


def q_el_pr_curve(sf_dir: str):
    """Pair-classifier precision/recall/F1 at a fixed JW threshold
    grid against the gold same_entity labels — the threshold-sweep
    eval behind LINK/MERGE cutoff choices. Per-batch vectorized
    confusion partials per threshold (one broadcasting comparison),
    ONE tiny threshold exchange, P/R/F1 doubles derived from exact
    integer counts identically on both sides. Out: (thr_pct, tp, fp,
    fn, tn, precision, recall, f1)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .shuffle import group_blocks

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(
        os.path.join(fd, "gold_pairs.parquet"),
        columns=["m1_id", "m2_id", "same_entity"])
    thr = np.asarray(PR_CURVE_THRESHOLDS, dtype=np.int64)

    class _Conf:
        def __init__(self, ref):
            self.surf = ray.get(ref)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            cols = {"thr_pct": "int64", "tp": "int64", "fp": "int64",
                    "fn": "int64", "tn": "int64"}
            if t.num_rows == 0:
                return pd.DataFrame({k: pd.Series(dtype=v)
                                     for k, v in cols.items()})
            m1 = t.column("m1_id").to_pylist()
            m2 = t.column("m2_id").to_pylist()
            same = t.column("same_entity").to_numpy(
                zero_copy_only=False).astype(bool)
            jw = np.asarray([
                np.floor(jaro_winkler(normalize_name(self.surf[a]),
                                      normalize_name(self.surf[b]))
                         * 1e5 + 0.5) / 1e5
                for a, b in zip(m1, m2)])
            # predicted-same at threshold: jw >= thr/100 on the 1e5
            # grid -> integer compare jw*1e5 >= thr*1000 (exact)
            jw5 = np.floor(jw * 1e5 + 0.5).astype(np.int64)
            pred = jw5[None, :] >= (thr[:, None] * 1000)
            tp = (pred & same[None, :]).sum(axis=1)
            fp = (pred & ~same[None, :]).sum(axis=1)
            fn = ((~pred) & same[None, :]).sum(axis=1)
            tn = ((~pred) & ~same[None, :]).sum(axis=1)
            return pd.DataFrame({
                "thr_pct": thr, "tp": tp.astype("int64"),
                "fp": fp.astype("int64"), "fn": fn.astype("int64"),
                "tn": tn.astype("int64")})

    partials = gp.map_batches(_Conf, fn_constructor_args=(ref,),
                              batch_format="pyarrow", concurrency=2,
                              num_cpus=0.5)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"thr_pct": "int64", "tp": "int64", "fp": "int64",
                "fn": "int64", "tn": "int64", "precision": "float64",
                "recall": "float64", "f1": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("thr_pct", as_index=False)[
            ["tp", "fp", "fn", "tn"]].sum()
        tp = g["tp"].to_numpy(np.float64)
        fp = g["fp"].to_numpy(np.float64)
        fn = g["fn"].to_numpy(np.float64)
        p = np.where(tp + fp > 0, tp / np.where(tp + fp > 0,
                                                tp + fp, 1.0), 1.0)
        r = np.where(tp + fn > 0, tp / np.where(tp + fn > 0,
                                                tp + fn, 1.0), 1.0)
        f1 = np.where(p + r > 0, 2.0 * p * r / np.where(p + r > 0,
                                                        p + r, 1.0), 0.0)
        out = g.astype({c: "int64" for c in ["thr_pct", "tp", "fp",
                                             "fn", "tn"]})
        out["precision"] = np.floor(p * 1e6 + 0.5) / 1e6
        out["recall"] = np.floor(r * 1e6 + 0.5) / 1e6
        out["f1"] = np.floor(f1 * 1e6 + 0.5) / 1e6
        return out

    return group_blocks(partials, ["thr_pct"], merge,
                        batch_format="pandas")


def q_el_dedupe_e2e(sf_dir: str):
    """The full dedupe pipeline as ONE query — the Splink-shaped
    end-to-end: n:/p: blocking -> within-key candidate pairs (distinct
    across keys) -> JW >= 0.92 scoring -> connected components
    (hash-to-min label propagation, the distributed clustering path)
    -> survivorship (longest surface, tie min mention_id) per entity.
    Exchanges: key pair-gen, pair dedup, component propagation, one
    mention attach, one entity finalize — every stage block-local and
    vectorized. The normalized surface rides THROUGH the block-key and
    pair exchanges as a carried column, so pairs arrive at the scorer
    with both sides attached — no driver-side mention→surface dict, no
    corpus-scale broadcast (VERDICT r04 finding 1) — and JW is scored
    by the vectorized DuckDB kernel (the el/scorer.py idiom, bit-equal
    to el.sim.jaro_winkler). Pair generation here is the
    SQL-replayable exact form (_block_pairs_frame fails loudly past
    its 10k-per-key cap); the production linkage path routes the same
    step through el/blocking.py's salted/capped generator instead,
    trading SQL replayability for graceful hot-key handling. Out:
    (mention_id, entity_id, canonical_surface) for every
    non-empty-norm mention."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .cluster import label_propagation
    from .ops.er import _block_pairs_frame, _norm_series, _sql_block_keys
    from .scorer import _duck
    from .shuffle import group_blocks

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(nrm=_norm_series(df["surface"].astype(str)))
        return _sql_block_keys(df, extra=["nrm"])

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return _block_pairs_frame(df, carry=["nrm"])

    keys = gm.map_batches(keyed, batch_format="pandas")
    pairs = group_blocks(keys, ["block_key"], gen_pairs,
                         batch_format="pandas")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["m1_id", "m2_id"]) \
            .reset_index(drop=True)

    pairs = group_blocks(pairs.map_batches(dedup, batch_format="pandas"),
                         ["m1_id", "m2_id"], dedup,
                         batch_format="pandas")

    def edge_score(t: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.string()),
                          "dst": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        con = _duck()
        view = t.select(["nrm1", "nrm2"]).append_column(  # noqa: F841
            "i", pa.array(np.arange(t.num_rows, dtype=np.int64)))
        con.register("dedupe_pairs", view)
        jw = con.execute(
            "SELECT floor(jaro_winkler_similarity(nrm1, nrm2) * 1e5"
            " + 0.5) / 1e5 AS j FROM dedupe_pairs ORDER BY i"
        ).fetchnumpy()["j"]
        con.unregister("dedupe_pairs")
        keep = jw >= 0.92
        if not keep.any():
            return empty
        kept = t.filter(pa.array(keep))
        return pa.table({
            "src": kept.column("m1_id").cast(pa.string()),
            "dst": kept.column("m2_id").cast(pa.string()),
        })

    edges = pairs.map_batches(edge_score, batch_format="pyarrow")

    def nodes(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "node": df["mention_id"].astype(str),
            "norm": _norm_series(df["surface"].astype(str))})
        out = out[out["norm"] != ""]
        return pd.DataFrame({"node": out["node"],
                             "label": out["node"]})

    labels = gm.map_batches(nodes, batch_format="pandas")
    comp = label_propagation(edges, labels, num_partitions=4)

    # attach surfaces: tagged union on mention_id (no driver dict in
    # the attach path; the surf broadcast above feeds only the scorer)
    def comp_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"mid": df["node"].astype(str),
                             "entity": df["label"].astype(str),
                             "surface": pd.Series([""] * len(df),
                                                  dtype=str),
                             "is_comp": np.ones(len(df),
                                                dtype=np.int64)})

    def surf_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"mid": df["mention_id"].astype(str),
                             "entity": pd.Series([""] * len(df),
                                                 dtype=str),
                             "surface": df["surface"].astype(str),
                             "is_comp": np.zeros(len(df),
                                                 dtype=np.int64)})

    tagged = comp.map_batches(comp_rows, batch_format="pandas").union(
        gm.map_batches(surf_rows, batch_format="pandas"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"mid": str, "entity": str, "surface": str}
        c = df[df["is_comp"] == 1]
        s = df[df["is_comp"] == 0]
        j = c[["mid", "entity"]].merge(s[["mid", "surface"]], on="mid")
        if len(j) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return j[list(cols)]

    attached = group_blocks(tagged, ["mid"], attach,
                            batch_format="pandas")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"mention_id": str, "entity_id": str,
                "canonical_surface": str}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        d = df.assign(slen=df["surface"].str.len())
        d = d.sort_values(["entity", "slen", "mid"],
                          ascending=[True, False, True], kind="stable")
        canon = d.groupby("entity", as_index=False).first() \
            .rename(columns={"surface": "canonical_surface"})
        out = df.merge(canon[["entity", "canonical_surface"]],
                       on="entity")
        return pd.DataFrame({
            "mention_id": out["mid"],
            "entity_id": out["entity"],
            "canonical_surface": out["canonical_surface"]})

    return group_blocks(attached, ["entity"], finalize,
                        batch_format="pandas")


def q_comention_components(sf_dir: str):
    """Weakly connected components of the co-mention graph labeled by
    min surface — hash-to-min label propagation (the distributed
    clustering path) over the comention_counts edge list; recursive-CTE
    oracle. Completes the graph suite next to pagerank / triangles /
    clustering coefficients."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .cluster import label_propagation
    from .ops.cooccur import comention_counts
    from .shuffle import group_blocks

    gm = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                               columns=["conv_id", "surface"])
    edges = comention_counts(gm).map_batches(
        lambda t: pa.table({"src": t.column("s1"),
                            "dst": t.column("s2")}),
        batch_format="pyarrow")

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["surface"]].drop_duplicates()
        return pd.DataFrame({"node": out["surface"].astype(str),
                             "label": out["surface"].astype(str)})

    # exact node table: one surface exchange of per-batch-distinct rows
    labels = group_blocks(
        gm.map_batches(node_rows, batch_format="pandas"),
        ["node"], lambda df: df.drop_duplicates(),
        batch_format="pandas")
    comp = label_propagation(edges, labels, num_partitions=4)
    return comp.map_batches(
        lambda t: pa.table({"surface": t.column("node"),
                            "component": t.column("label")}),
        batch_format="pyarrow")


def q_cms_heavy_hitters(sf_dir: str):
    """Count-min-sketch frequency estimates for the exact top-20
    corpus tokens — the oracle replays the 4x1024 sketch itself
    (el/ops/sketch.py::cms_heavy_hitters)."""
    from .ops.sketch import cms_heavy_hitters

    return cms_heavy_hitters(_read(sf_dir, "documents", ["text"]), k=20)


def q_minhash_recall(sf_dir: str):
    """Candidate recall of MinHash-LSH banding against the exact
    n-gram-Jaccard pair set at the same 0.8 threshold (both pipelines
    already oracled; the composition is too, on both sides). MinHash's
    output is exact-verified, so found-pairs are a subset of truth and
    recall = found / exact measures what the 16-band/64-perm banding
    scheme misses. One (d1, d2) tagged exchange + a one-row merge.
    Out: (n_exact, n_found, recall[6dp])."""
    from .shuffle import group_blocks

    mh = q_minhash_dedup(sf_dir)
    ex = q_ngram_jaccard(sf_dir)

    def mh_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"d1": df["d1"].astype("int64"),
                             "d2": df["d2"].astype("int64"),
                             "is_mh": np.ones(len(df), dtype=np.int64)})

    def ex_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["jaccard"] >= 0.8]
        return pd.DataFrame({"d1": df["d1"].astype("int64"),
                             "d2": df["d2"].astype("int64"),
                             "is_mh": np.zeros(len(df), dtype=np.int64)})

    tagged = mh.map_batches(mh_rows, batch_format="pandas").union(
        ex.map_batches(ex_rows, batch_format="pandas"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"n_exact": pd.Series(dtype="int64"),
                                 "n_found": pd.Series(dtype="int64")})
        e = df[df["is_mh"] == 0][["d1", "d2"]].drop_duplicates()
        m = df[df["is_mh"] == 1][["d1", "d2"]].drop_duplicates()
        hit = e.merge(m, on=["d1", "d2"])
        return pd.DataFrame({"n_exact": [np.int64(len(e))],
                             "n_found": [np.int64(len(hit))]})

    parts = group_blocks(tagged, ["d1", "d2"], partial,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_exact": "int64", "n_found": "int64",
                "recall": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        ne = int(df["n_exact"].sum())
        nf = int(df["n_found"].sum())
        rec = 1.0 if ne == 0 else float(nf) / float(ne)
        return pd.DataFrame({
            "n_exact": pd.array([ne], dtype="int64"),
            "n_found": pd.array([nf], dtype="int64"),
            "recall": [float(np.floor(rec * 1e6 + 0.5) / 1e6)]})

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_kmv_error(sf_dir: str):
    """KMV sketch accuracy eval: estimated vs EXACT distinct users per
    event_type, with signed relative error — the sketch-quality
    companion to kmv_distinct (both sides already oracled; the exact
    side is one (event_type, user_id) dedup exchange + count). Out:
    (event_type, exact_distinct, est_distinct, rel_err[6dp])."""
    import ray.data

    from .shuffle import group_blocks

    est = q_kmv_distinct(sf_dir)
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_type", "user_id"]].drop_duplicates() \
            .reset_index(drop=True)

    def exact_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = dedup(df)
        out = d.groupby("event_type", as_index=False).size().rename(
            columns={"size": "exact_distinct"})
        out["exact_distinct"] = out["exact_distinct"].astype("int64")
        return out

    exact = group_blocks(ev.map_batches(dedup, batch_format="pandas"),
                         ["event_type", "user_id"], exact_counts,
                         batch_format="pandas")

    # exact partials may split one event_type across blocks of the
    # (type, user) exchange — re-sum on the type key alongside the
    # estimate rows in ONE tagged exchange
    # typed Arrow on BOTH union sides (the orders_topk_revenue idiom):
    # empty pandas partials otherwise round-trip to null-typed /
    # schema-less blocks and trip the executor's RefBundle schema-drift
    # warning in the union
    def ex_rows(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "event_type": pa.array(df["event_type"].astype(str),
                                   pa.string()),
            "v": pa.array(df["exact_distinct"].astype("float64"),
                          pa.float64()),
            "is_exact": pa.array(np.ones(len(df), dtype=np.int64))})

    def est_rows(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "event_type": pa.array(df["event_type"].astype(str),
                                   pa.string()),
            "v": pa.array(df["est_distinct"].astype("float64"),
                          pa.float64()),
            "is_exact": pa.array(np.zeros(len(df), dtype=np.int64))})

    tagged = exact.map_batches(ex_rows, batch_format="pandas").union(
        est.map_batches(est_rows, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": str, "exact_distinct": "int64",
                "est_distinct": "float64", "rel_err": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        ex = df[df["is_exact"] == 1].groupby("event_type",
                                             as_index=False)["v"].sum()
        es = df[df["is_exact"] == 0][["event_type", "v"]]
        j = ex.rename(columns={"v": "x"}).merge(
            es.rename(columns={"v": "e"}), on="event_type")
        if len(j) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        rel = (j["e"].to_numpy() - j["x"].to_numpy()) / j["x"].to_numpy()
        return pd.DataFrame({
            "event_type": j["event_type"],
            "exact_distinct": j["x"].astype("int64"),
            "est_distinct": j["e"],
            "rel_err": np.floor(rel * 1e6 + 0.5) / 1e6})

    # event_type cardinality is tiny by contract — coalesce + one
    # in-block merge (the tpch final idiom) instead of paying a hash
    # exchange whose mostly-empty partitions only emit ∅ bundles
    return tagged.repartition(1).map_batches(final,
                                             batch_format="pandas",
                                             batch_size=None)


def q_el_block_purge(sf_dir: str):
    """Block purging (Papadakis meta-blocking step 0): per blocking key
    of the n:/p: scheme, keep or purge by a max-size bound (> 24
    mentions = purged — oversized blocks contribute quadratics without
    discriminative power). One key exchange of per-batch count
    partials; out one row per key: (block_key, n_mentions, pair_count,
    purged)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import _sql_block_keys
    from .shuffle import group_blocks

    max_block = 24
    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"])
    keys = gm.map_batches(_sql_block_keys, batch_format="pandas")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"block_key": pd.Series(dtype=str),
                                 "n": pd.Series(dtype="int64")})
        out = df.groupby("block_key", as_index=False).size().rename(
            columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"block_key": str, "n_mentions": "int64",
                "pair_count": "int64", "purged": bool}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("block_key", as_index=False)["n"].sum()
        n = g["n"].to_numpy(np.int64)
        return pd.DataFrame({
            "block_key": g["block_key"],
            "n_mentions": n,
            "pair_count": n * (n - 1) // 2,
            "purged": n > max_block})

    return group_blocks(keys.map_batches(partial, batch_format="pandas"),
                        ["block_key"], finish, batch_format="pandas")


def q_el_cluster_vmeasure(sf_dir: str):
    """Homogeneity / completeness / V-measure of exact-alias clustering
    vs gold — per-cell integer-grid entropy terms so the sums are
    order-free (el/ops/er.py::cluster_vmeasure); one row out."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import cluster_vmeasure

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface", "gold_kb_id"])
    return cluster_vmeasure(gm)


def q_source_quality(sf_dir: str):
    """Per-source corpus quality rollup: doc/token totals and
    corpus-level stopword / unique-token ratios from EXACT integer
    numerators (no mean-of-rounded-ratios float ordering) — the slice
    report a curation pipeline keys filtering decisions on. One
    combiner + one source exchange."""
    import ray.data

    from .ops.textstats import LANG_MARKERS, TOKEN_RE
    from .shuffle import group_blocks

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"])
    stop = frozenset(LANG_MARKERS["en"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": str, "n_docs": "int64", "n_tokens": "int64",
                "n_stop": "int64", "n_uniq": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        toks = df["text"].str.lower().str.findall(TOKEN_RE)
        out = pd.DataFrame({
            "source": df["source"].astype(str),
            "n_docs": np.ones(len(df), dtype=np.int64),
            "n_tokens": toks.map(len).astype("int64"),
            "n_stop": toks.map(
                lambda ws: sum(1 for w in ws if w in stop))
            .astype("int64"),
            "n_uniq": toks.map(lambda ws: len(set(ws))).astype("int64"),
        })
        return out.groupby("source", as_index=False).sum()

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": str, "n_docs": "int64", "n_tokens": "int64",
                "stop_ratio": "float64", "uniq_ratio": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("source", as_index=False)[
            ["n_docs", "n_tokens", "n_stop", "n_uniq"]].sum()
        nt = g["n_tokens"].to_numpy(np.float64)
        safe = np.where(nt > 0, nt, 1.0)
        return pd.DataFrame({
            "source": g["source"],
            "n_docs": g["n_docs"].astype("int64"),
            "n_tokens": g["n_tokens"].astype("int64"),
            "stop_ratio": np.floor(
                g["n_stop"].to_numpy(np.float64) / safe * 1e6 + 0.5)
            / 1e6,
            "uniq_ratio": np.floor(
                g["n_uniq"].to_numpy(np.float64) / safe * 1e6 + 0.5)
            / 1e6})

    return group_blocks(docs.map_batches(partial, batch_format="pandas"),
                        ["source"], merge, batch_format="pandas")


def q_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: the table's labeled ``lang``
    column vs the marker-vote ``lang_guess`` — the eval companion of
    lang_id (which is already oracled; this composes it with the
    labels). Per-batch partial counts, one (lang, guess) exchange.
    Out: (lang, lang_guess, n)."""
    import ray.data

    from .ops.textstats import lang_id_batch
    from .shuffle import group_blocks

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"lang": str, "lang_guess": str, "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = lang_id_batch(df)
        out = pd.DataFrame({"lang": df["lang"].astype(str).to_numpy(),
                            "lang_guess": g["lang_guess"].to_numpy()})
        out = out.groupby(["lang", "lang_guess"], as_index=False) \
            .size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"lang": str, "lang_guess": str, "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby(["lang", "lang_guess"], as_index=False)["n"] \
            .sum()
        out["n"] = out["n"].astype("int64")
        return out

    return group_blocks(docs.map_batches(partial, batch_format="pandas"),
                        ["lang", "lang_guess"], merge,
                        batch_format="pandas")


def q_events_histogram(sf_dir: str):
    """Fixed-bin histogram of event value per event_type (bin width
    25, floor bin index — exact integer binning, no float edges):
    the profiling primitive behind data-drift checks. One combiner +
    one (event_type, bin) exchange. Out: (event_type, bin, lo, n)."""
    import ray.data

    from .shuffle import group_blocks

    width = 25

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": str, "bin": "int64", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        b = np.floor(df["value"].to_numpy(np.float64)
                     / width).astype(np.int64)
        out = pd.DataFrame({"event_type": df["event_type"].astype(str)
                            .to_numpy(), "bin": b})
        out = out.groupby(["event_type", "bin"], as_index=False) \
            .size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": str, "bin": "int64", "lo": "int64",
                "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby(["event_type", "bin"], as_index=False)["n"].sum()
        return pd.DataFrame({
            "event_type": g["event_type"],
            "bin": g["bin"].astype("int64"),
            "lo": (g["bin"] * width).astype("int64"),
            "n": g["n"].astype("int64")})

    return group_blocks(ev.map_batches(partial, batch_format="pandas"),
                        ["event_type", "bin"], merge,
                        batch_format="pandas")


def q_orders_rfm(sf_dir: str):
    """Customer RFM-style rollup: order count, integer-cents monetary
    total, first/last order timestamps per customer — one custkey
    exchange of per-batch partials (min/max/sum/count all
    combiner-safe). Out: (o_custkey, n_orders, total_price,
    first_order, last_order)."""
    import ray.data

    from .shuffle import group_blocks

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice", "o_orderdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_custkey": "int64", "n_orders": "int64",
                "cents": "int64", "first_order": "datetime64[us]",
                "last_order": "datetime64[us]"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        cents = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        g = (df.assign(cents=cents)
             .groupby("o_custkey", as_index=False)
             .agg(n_orders=("cents", "size"), cents=("cents", "sum"),
                  first_order=("o_orderdate", "min"),
                  last_order=("o_orderdate", "max")))
        g["n_orders"] = g["n_orders"].astype("int64")
        g["cents"] = g["cents"].astype("int64")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_custkey": "int64", "n_orders": "int64",
                "total_price": "float64",
                "first_order": "datetime64[us]",
                "last_order": "datetime64[us]"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = (df.groupby("o_custkey", as_index=False)
             .agg(n_orders=("n_orders", "sum"), cents=("cents", "sum"),
                  first_order=("first_order", "min"),
                  last_order=("last_order", "max")))
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].astype("int64"),
            "n_orders": g["n_orders"].astype("int64"),
            "total_price": g["cents"].to_numpy(np.float64) / 100.0,
            "first_order": g["first_order"],
            "last_order": g["last_order"]})

    return group_blocks(orders.map_batches(partial,
                                           batch_format="pandas"),
                        ["o_custkey"], merge, batch_format="pandas")


def q_el_alias_ambiguity(sf_dir: str):
    """Alias ambiguity profile: per normalized surface, mention count
    and DISTINCT gold entity count — the corpus statistic behind the
    curated-ambiguity assumption (aliases with > 1 entity need
    context disambiguation). One alias exchange. Out: (alias_norm,
    n_mentions, n_entities, is_ambiguous)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import _norm_series
    from .shuffle import group_blocks

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["surface", "gold_kb_id"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "alias_norm": _norm_series(df["surface"].astype(str)),
            "gold": df["gold_kb_id"].astype(str)})
        out = out[out["alias_norm"] != ""]
        g = out.groupby(["alias_norm", "gold"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"alias_norm": str, "n_mentions": "int64",
                "n_entities": "int64", "is_ambiguous": bool}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        c = df.groupby(["alias_norm", "gold"], as_index=False)["n"].sum()
        g = c.groupby("alias_norm", as_index=False).agg(
            n_mentions=("n", "sum"), n_entities=("gold", "nunique"))
        return pd.DataFrame({
            "alias_norm": g["alias_norm"],
            "n_mentions": g["n_mentions"].astype("int64"),
            "n_entities": g["n_entities"].astype("int64"),
            "is_ambiguous": (g["n_entities"] > 1).to_numpy()})

    return group_blocks(gm.map_batches(prep, batch_format="pandas"),
                        ["alias_norm"], merge, batch_format="pandas")


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14-flavored promotion effect: share of 1998 shipped
    revenue carried by PROMO-type parts. Scale shape: lineitem
    pre-aggregates integer-cents revenue per partkey per batch, then
    meets the part rows in ONE tagged partkey hash exchange (no
    broadcast of the corpus-scale part dimension — the q5/q3 custkey
    discipline); per-block (promo, total) integer partials merge in a
    one-row final. Out: (promo_revenue, total_revenue,
    promo_share[6dp], all revenue 2dp)."""
    import ray.data

    from .shuffle import group_blocks

    lo, hi = pd.Timestamp("1998-01-01"), pd.Timestamp("1999-01-01")

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type"])

    def li_side(df: pd.DataFrame) -> pa.Table:
        df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        rev_f = cents * (100 - disc)
        if len(rev_f) and np.max(np.abs(rev_f)) >= 2.0**53:
            raise OverflowError(
                "tpch_q14: per-line revenue exceeds the float64 "
                "integer-exact envelope (2^53); widen to decimal")
        rev = rev_f.astype("int64")
        g = (df.assign(rev=rev)
             .groupby("l_partkey", as_index=False)["rev"].sum())
        n = len(g)
        return pa.table({
            "pkey": pa.array(g["l_partkey"].astype("int64")),
            "rev": pa.array(g["rev"].astype("int64")),
            "promo": pa.nulls(n, pa.int64()),
            "is_part": pa.array([0] * n, pa.int64()),
        })

    def part_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "pkey": pa.array(df["p_partkey"].astype("int64")),
            "rev": pa.nulls(n, pa.int64()),
            "promo": pa.array(
                (df["p_type"] == "PROMO").astype("int64")),
            "is_part": pa.array([1] * n, pa.int64()),
        })

    tagged = li.map_batches(li_side, batch_format="pandas").union(
        part.map_batches(part_side, batch_format="pandas"))

    def join_block(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["is_part"] == 0]
        p = df[df["is_part"] == 1]
        j = l[["pkey", "rev"]].merge(p[["pkey", "promo"]], on="pkey")
        if len(j) == 0:
            return pd.DataFrame({"promo_rev": pd.Series(dtype="int64"),
                                 "total_rev": pd.Series(dtype="int64")})
        promo = int(j.loc[j["promo"] == 1, "rev"].sum())
        return pd.DataFrame({"promo_rev": pd.array([promo],
                                                   dtype="int64"),
                             "total_rev": pd.array([int(j["rev"].sum())],
                                                   dtype="int64")})

    parts_df = group_blocks(tagged, ["pkey"], join_block,
                            batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"promo_revenue": "float64", "total_revenue": "float64",
                "promo_share": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        pr = int(df["promo_rev"].sum())
        tr = int(df["total_rev"].sum())
        share = 0.0 if tr == 0 else 100.0 * float(pr) / float(tr)
        r = lambda x, k: float(np.floor(x * 10**k + 0.5) / 10**k)  # noqa: E731
        return pd.DataFrame({
            "promo_revenue": [r(pr / 10000.0, 2)],
            "total_revenue": [r(tr / 10000.0, 2)],
            "promo_share": [r(share, 6)]})

    return parts_df.repartition(1).map_batches(final,
                                               batch_format="pandas",
                                               batch_size=None)


def q_orders_late_lineitem(sf_dir: str):
    """TPC-H Q4-shaped EXISTS semi-join: orders per priority having at
    least one lineitem shipped > 90 days after the order date — the
    positive-existence twin of orders_no_recent_lineitem's anti-join.
    lineitem pre-reduces per batch to per-orderkey max shipdate (the
    only fact EXISTS needs), ONE tagged orderkey exchange, per-block
    priority partials, tiny final merge. Out: (o_orderpriority,
    n_orders)."""
    import ray.data

    from .shuffle import group_blocks

    lag = pd.Timedelta(days=90)

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"])

    def li_side(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("l_orderkey", as_index=False)["l_shipdate"] \
            .max()
        n = len(g)
        return pa.table({
            "okey": pa.array(g["l_orderkey"].astype("int64")),
            "maxship": pa.array(g["l_shipdate"]),
            "odate": pa.nulls(n, pa.timestamp("us")),
            "prio": pa.nulls(n, pa.string()),
            "is_order": pa.array([0] * n, pa.int64()),
        })

    def order_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "okey": pa.array(df["o_orderkey"].astype("int64")),
            "maxship": pa.nulls(n, pa.timestamp("us")),
            "odate": pa.array(df["o_orderdate"]),
            "prio": pa.array(df["o_orderpriority"].astype(str),
                             pa.string()),
            "is_order": pa.array([1] * n, pa.int64()),
        })

    tagged = li.map_batches(li_side, batch_format="pandas").union(
        orders.map_batches(order_side, batch_format="pandas"))

    def exists_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"prio": str, "n": "int64"}
        o = df[df["is_order"] == 1]
        l = (df[df["is_order"] == 0]
             .groupby("okey", as_index=False)["maxship"].max())
        j = o[["okey", "odate", "prio"]].merge(l, on="okey")
        late = j[j["maxship"] > j["odate"] + lag]
        if len(late) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = late.groupby("prio", as_index=False).size().rename(
            columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    parts = group_blocks(tagged, ["okey"], exists_block,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderpriority": str, "n_orders": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("prio", as_index=False)["n"].sum()
        return pd.DataFrame({"o_orderpriority": g["prio"],
                             "n_orders": g["n"].astype("int64")})

    return parts.repartition(1).map_batches(final,
                                            batch_format="pandas",
                                            batch_size=None)


def q_tpch_q13(sf_dir: str):
    """TPC-H Q13 customer-distribution: histogram of per-customer
    order counts, counting only open ('O') orders so the zero bucket
    is populated (the spec's NOT LIKE comment filter adapted to this
    schema's o_orderstatus; TPC-H spec Q13 / the reference's
    per-category benchmark groupings, ExpBenchmark.scala).

    Scale shape: orders is status-filtered and pre-aggregated to
    (custkey, cnt) per batch; customer ships bare keys. Both meet in
    ONE tagged-union hash exchange on custkey — left-join semantics:
    a customer with no qualifying order lands in c_count=0 because
    the customer row itself travels through the exchange. The second
    aggregation groups on c_count (a few dozen distinct values), so
    it is a per-block combine + one-partition merge, never a second
    row-scale exchange. Out: (c_count, custdist)."""
    import ray.data  # noqa: F401

    from .shuffle import group_blocks

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderstatus"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def order_side(df: pd.DataFrame) -> pa.Table:
        keep = df[df["o_orderstatus"] == "O"]
        g = keep.groupby("o_custkey", as_index=False).size()
        return pa.table({
            "ckey": pa.array(g["o_custkey"].astype("int64")),
            "cnt": pa.array(g["size"].astype("int64")),
            "is_cust": pa.array(np.zeros(len(g), dtype="int64")),
        })

    def cust_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "ckey": pa.array(df["c_custkey"].astype("int64")),
            "cnt": pa.array(np.zeros(n, dtype="int64")),
            "is_cust": pa.array(np.ones(n, dtype="int64")),
        })

    tagged = orders.map_batches(order_side, batch_format="pandas").union(
        cust.map_batches(cust_side, batch_format="pandas"))

    def count_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"c_count": "int64", "custdist": "int64"}
        cust_keys = df.loc[df["is_cust"] == 1, "ckey"]
        if len(cust_keys) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        per_c = (df[df["is_cust"] == 0]
                 .groupby("ckey")["cnt"].sum()
                 .reindex(cust_keys.to_numpy(), fill_value=0))
        h = per_c.value_counts()
        return pd.DataFrame({
            "c_count": h.index.astype("int64"),
            "custdist": h.to_numpy().astype("int64")})

    parts = group_blocks(tagged, ["ckey"], count_block,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"c_count": "int64", "custdist": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("c_count", as_index=False)["custdist"].sum()
        return pd.DataFrame({
            "c_count": g["c_count"].astype("int64"),
            "custdist": g["custdist"].astype("int64")})

    return parts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15 top supplier: supplier(s) with the maximum lineitem
    revenue over Q1-1996 shipments (TPC-H spec Q15; the reference's
    argmax idiom, ExpBenchmark.scala top-candidate selection).

    Scale shape: lineitem is date-filtered and pre-aggregated to
    (suppkey, revenue-partial) per batch — integer cents x (100-disc)
    with the 2^53 envelope guard — so the ONE tagged-union hash
    exchange on suppkey moves supplier-scale partials, not lineitems.
    Supplier ships (key, name) through the same exchange (no
    broadcast). The in-fold join emits per-supplier totals
    (dim-scale); the global argmax is a one-partition merge that
    keeps every supplier tied at the max. Out: (s_suppkey, s_name,
    total_revenue[2dp])."""
    import ray.data  # noqa: F401

    from .shuffle import group_blocks

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")

    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])

    def li_side(df: pd.DataFrame) -> pa.Table:
        sd = df["l_shipdate"].to_numpy()
        keep = (sd >= lo.to_datetime64()) & (sd < hi.to_datetime64())
        df = df[keep]
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        rev = cents * (100.0 - disc)
        if len(rev) and np.max(np.abs(rev)) >= 2.0**53:
            raise OverflowError(
                "tpch_q15: per-line revenue exceeds the float64 "
                "integer-exact envelope (2^53); widen to decimal")
        g = (pd.DataFrame({"skey": df["l_suppkey"].astype("int64"),
                           "rev": rev.astype("int64")})
             .groupby("skey", as_index=False)["rev"].sum())
        n = len(g)
        return pa.table({
            "skey": pa.array(g["skey"]),
            "rev": pa.array(g["rev"].astype("int64")),
            "name": pa.nulls(n, pa.string()),
            "is_sup": pa.array(np.zeros(n, dtype="int64")),
        })

    def sup_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "skey": pa.array(df["s_suppkey"].astype("int64")),
            "rev": pa.array(np.zeros(n, dtype="int64")),
            "name": pa.array(df["s_name"].astype(str), pa.string()),
            "is_sup": pa.array(np.ones(n, dtype="int64")),
        })

    tagged = li.map_batches(li_side, batch_format="pandas").union(
        sup.map_batches(sup_side, batch_format="pandas"))

    def total_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"skey": "int64", "name": str, "rev": "int64"}
        s = df[df["is_sup"] == 1]
        if len(s) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        per_s = (df[df["is_sup"] == 0]
                 .groupby("skey")["rev"].sum()
                 .reindex(s["skey"].to_numpy(), fill_value=0))
        out = pd.DataFrame({"skey": s["skey"].to_numpy(),
                            "name": s["name"].to_numpy(),
                            "rev": per_s.to_numpy().astype("int64")})
        return out[out["rev"] > 0]

    totals = group_blocks(tagged, ["skey"], total_block,
                          batch_format="pandas")

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"s_suppkey": "int64", "s_name": str,
                "total_revenue": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        top = df[df["rev"] == df["rev"].max()]
        return pd.DataFrame({
            "s_suppkey": top["skey"].astype("int64"),
            "s_name": top["name"].astype(str),
            "total_revenue": _round_half_away(
                top["rev"].to_numpy() / 10000.0, 2)})

    return totals.repartition(1).map_batches(
        argmax, batch_format="pandas", batch_size=None)


def q_tpch_q17(sf_dir: str):
    """TPC-H Q17 small-quantity-order revenue: average yearly revenue
    lost if orders for Brand#12 parts below 20% of the part's average
    quantity were not taken (TPC-H spec Q17).

    Scale shape: part ships (partkey, brand-flag); lineitem ships
    (partkey, qty_cents, price_cents) rows. ONE tagged-union hash
    exchange on partkey co-locates each part with all its lineitems;
    the in-fold pass computes the per-part quantity stats and applies
    the 20%-of-average gate as the INTEGER predicate
    5*qty_c*n < sum_qc — no float division anywhere — emitting one
    partial (kept_cents, kept_n) per block. Final one-row merge
    divides by 7 on the 2dp grid. Out: (avg_yearly[2dp],
    n_lineitems_kept)."""
    import ray.data  # noqa: F401

    from .shuffle import group_blocks

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def part_side(df: pd.DataFrame) -> pa.Table:
        keep = df[df["p_brand"] == "Brand#12"]
        n = len(keep)
        return pa.table({
            "pkey": pa.array(keep["p_partkey"].astype("int64")),
            "qty_c": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
            "is_part": pa.array(np.ones(n, dtype="int64")),
        })

    def li_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        qty_c = np.floor(df["l_quantity"].to_numpy() * 100 + 0.5)
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        return pa.table({
            "pkey": pa.array(df["l_partkey"].astype("int64")),
            "qty_c": pa.array(qty_c.astype("int64")),
            "cents": pa.array(cents.astype("int64")),
            "is_part": pa.array(np.zeros(n, dtype="int64")),
        })

    tagged = part.map_batches(part_side, batch_format="pandas").union(
        li.map_batches(li_side, batch_format="pandas"))

    def fold_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"kept_cents": "int64", "kept_n": "int64"}
        brand = set(df.loc[df["is_part"] == 1, "pkey"].to_numpy())
        l = df[(df["is_part"] == 0) & df["pkey"].isin(brand)]
        if len(l) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = l.groupby("pkey")["qty_c"].agg(["sum", "count"])
        sum_qc = g["sum"].reindex(l["pkey"].to_numpy()).to_numpy()
        n_li = g["count"].reindex(l["pkey"].to_numpy()).to_numpy()
        lhs = 5.0 * l["qty_c"].to_numpy() * n_li
        if len(lhs) and np.max(np.abs(lhs)) >= 2.0**53:
            raise OverflowError(
                "tpch_q17: 5*qty*n exceeds the float64 integer-exact "
                "envelope (2^53); widen to decimal")
        keep = lhs < sum_qc
        return pd.DataFrame({
            "kept_cents": pd.array(
                [int(l["cents"].to_numpy()[keep].sum())], dtype="int64"),
            "kept_n": pd.array([int(keep.sum())], dtype="int64")})

    parts = group_blocks(tagged, ["pkey"], fold_block,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"avg_yearly": "float64", "n_lineitems_kept": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        cents = int(df["kept_cents"].sum())
        return pd.DataFrame({
            "avg_yearly": [float(np.floor(
                cents / 700.0 * 100 + 0.5) / 100)],
            "n_lineitems_kept": pd.array([int(df["kept_n"].sum())],
                                         dtype="int64")})

    return parts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19 discounted-revenue: three disjunctive
    (brand, size-range, quantity-range) arms summed into one revenue
    figure (TPC-H spec Q19, adapted to this schema's columns — no
    container/shipmode, so the arms gate on p_size and l_quantity).

    Scale shape: part ships (partkey, 3-bit arm mask from brand+size);
    lineitem pre-filters to the covering quantity envelope [1, 30] and
    ships (partkey, qty_cents, revenue-partial). ONE tagged-union hash
    exchange on partkey; the in-fold pass ANDs each arm's quantity
    window against the part's mask bit and sums integer revenue —
    one partial row per block, one-row final merge. Out:
    (revenue[2dp], n_lineitems)."""
    import ray.data  # noqa: F401

    from .shuffle import group_blocks

    ARMS = (("Brand#12", 1, 5, 100, 1100),
            ("Brand#23", 1, 10, 1000, 2000),
            ("Brand#34", 1, 15, 2000, 3000))

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size"])
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def part_side(df: pd.DataFrame) -> pa.Table:
        size = df["p_size"].to_numpy()
        mask = np.zeros(len(df), dtype="int64")
        for bit, (brand, s_lo, s_hi, _, _) in enumerate(ARMS):
            hit = ((df["p_brand"] == brand).to_numpy()
                   & (size >= s_lo) & (size <= s_hi))
            mask |= hit.astype("int64") << bit
        keep = mask > 0
        return pa.table({
            "pkey": pa.array(df["p_partkey"].to_numpy()[keep]
                             .astype("int64")),
            "mask": pa.array(mask[keep]),
            "qty_c": pa.nulls(int(keep.sum()), pa.int64()),
            "rev": pa.nulls(int(keep.sum()), pa.int64()),
        })

    def li_side(df: pd.DataFrame) -> pa.Table:
        qty_c = np.floor(df["l_quantity"].to_numpy() * 100 + 0.5)
        keep = (qty_c >= 100) & (qty_c <= 3000)
        df, qty_c = df[keep], qty_c[keep]
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        rev = cents * (100.0 - disc)
        if len(rev) and np.max(np.abs(rev)) >= 2.0**53:
            raise OverflowError(
                "tpch_q19: per-line revenue exceeds the float64 "
                "integer-exact envelope (2^53); widen to decimal")
        n = len(df)
        return pa.table({
            "pkey": pa.array(df["l_partkey"].astype("int64")),
            "mask": pa.array(np.zeros(n, dtype="int64")),
            "qty_c": pa.array(qty_c.astype("int64")),
            "rev": pa.array(rev.astype("int64")),
        })

    tagged = part.map_batches(part_side, batch_format="pandas").union(
        li.map_batches(li_side, batch_format="pandas"))

    def fold_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"rev": "int64", "n": "int64"}
        pmask = (df[df["mask"] > 0].drop_duplicates("pkey")
                 .set_index("pkey")["mask"])
        l = df[df["mask"] == 0]
        if len(l) == 0 or len(pmask) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        lmask = pmask.reindex(l["pkey"].to_numpy(), fill_value=0)\
            .to_numpy()
        qty_c = l["qty_c"].to_numpy()
        hit = np.zeros(len(l), dtype=bool)
        for bit, (_, _, _, q_lo, q_hi) in enumerate(ARMS):
            hit |= (((lmask >> bit) & 1) > 0) \
                & (qty_c >= q_lo) & (qty_c <= q_hi)
        return pd.DataFrame({
            "rev": pd.array([int(l["rev"].to_numpy()[hit].sum())],
                            dtype="int64"),
            "n": pd.array([int(hit.sum())], dtype="int64")})

    parts = group_blocks(tagged, ["pkey"], fold_block,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"revenue": "float64", "n_lineitems": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        rev = int(df["rev"].sum())
        return pd.DataFrame({
            "revenue": [float(np.floor(rev / 10000.0 * 100 + 0.5)
                              / 100)],
            "n_lineitems": pd.array([int(df["n"].sum())],
                                    dtype="int64")})

    return parts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def q_tpch_q22(sf_dir: str):
    """TPC-H Q22 global-sales-opportunity: per-nation count and total
    balance of above-average-balance customers with no recent orders
    (spec's phone-prefix cntrycode adapted to c_nationkey -> n_name;
    the NOT EXISTS anti-join and the global-average subquery are the
    spec's shape).

    Scale shape: pass 1 folds customer into ONE (sum_cents, count)
    row — per-batch partials, one-partition merge, a bounded take of
    a single aggregate row (never row-scale). Pass 2: customer ships
    (custkey, nationkey, bal_cents); orders date-filters and dedups
    custkeys per batch. ONE tagged-union hash exchange on custkey;
    the in-fold anti-join keeps marker-less customers passing the
    INTEGER predicate bal_c * cnt > sum_c (no float average), then a
    per-block nationkey combine + one-partition merge attaches n_name
    from the constant-size nation table. Out: (n_name, numcust,
    totacctbal[2dp])."""
    import ray
    import ray.data  # noqa: F401
    import pyarrow.parquet as pq

    from .shuffle import group_blocks

    cutoff = pd.Timestamp("2000-01-01")

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        bal_c = np.floor(df["c_acctbal"].to_numpy() * 100 + 0.5)
        pos = bal_c[bal_c > 0]
        return pd.DataFrame({
            "s": pd.array([int(pos.sum())], dtype="int64"),
            "n": pd.array([int(len(pos))], dtype="int64")})

    avg_row = (cust.map_batches(bal_partial, batch_format="pandas")
               .repartition(1)
               .map_batches(
                   lambda df: pd.DataFrame({
                       "s": pd.array([int(df["s"].sum())],
                                     dtype="int64"),
                       "n": pd.array([int(df["n"].sum())],
                                     dtype="int64")}),
                   batch_format="pandas", batch_size=None)
               .take(1))[0]
    sum_c, cnt = int(avg_row["s"]), int(avg_row["n"])

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate"])

    def cust_side(df: pd.DataFrame) -> pa.Table:
        bal_c = np.floor(df["c_acctbal"].to_numpy() * 100 + 0.5)
        return pa.table({
            "ckey": pa.array(df["c_custkey"].astype("int64")),
            "nkey": pa.array(df["c_nationkey"].astype("int64")),
            "bal_c": pa.array(bal_c.astype("int64")),
            "is_cust": pa.array(np.ones(len(df), dtype="int64")),
        })

    def order_side(df: pd.DataFrame) -> pa.Table:
        od = df["o_orderdate"].to_numpy()
        keys = np.unique(
            df["o_custkey"].to_numpy()[od >= cutoff.to_datetime64()])
        n = len(keys)
        return pa.table({
            "ckey": pa.array(keys.astype("int64")),
            "nkey": pa.array(np.zeros(n, dtype="int64")),
            "bal_c": pa.array(np.zeros(n, dtype="int64")),
            "is_cust": pa.array(np.zeros(n, dtype="int64")),
        })

    tagged = cust.map_batches(cust_side, batch_format="pandas").union(
        orders.map_batches(order_side, batch_format="pandas"))

    def anti_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"nkey": "int64", "numcust": "int64",
                "bal_sum": "int64"}
        recent = set(df.loc[df["is_cust"] == 0, "ckey"].to_numpy())
        c = df[df["is_cust"] == 1]
        keep = c[(~c["ckey"].isin(recent))
                 & (c["bal_c"] * cnt > sum_c)]
        if len(keep) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = keep.groupby("nkey", as_index=False).agg(
            numcust=("ckey", "size"), bal_sum=("bal_c", "sum"))
        return pd.DataFrame({
            "nkey": g["nkey"].astype("int64"),
            "numcust": g["numcust"].astype("int64"),
            "bal_sum": g["bal_sum"].astype("int64")})

    parts = group_blocks(tagged, ["ckey"], anti_block,
                         batch_format="pandas")

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"])
    names = dict(zip(nation.column("n_nationkey").to_pylist(),
                     nation.column("n_name").to_pylist()))
    names_ref = ray.put(names)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_name": str, "numcust": "int64",
                "totacctbal": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        nm = ray.get(names_ref)
        g = df.groupby("nkey", as_index=False).agg(
            numcust=("numcust", "sum"), bal_sum=("bal_sum", "sum"))
        return pd.DataFrame({
            "n_name": g["nkey"].map(nm).astype(str),
            "numcust": g["numcust"].astype("int64"),
            "totacctbal": _round_half_away(
                g["bal_sum"].to_numpy() / 100.0, 2)})

    return parts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def q_el_cluster_purity(sf_dir: str):
    """Purity / inverse purity / purity-F1 of the exact-alias
    clustering vs gold — integer-exact majority-cell sums, two
    cell-scale exchanges (el/ops/er.py::cluster_purity)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import cluster_purity

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface", "gold_kb_id"])
    return cluster_purity(gm)


def q_embed_norm_stats(sf_dir: str):
    """Per-label embedding L2-norm count/mean/std on the fixed integer
    1e-6 grid — exact int64 cross-vector sums, one tiny label exchange
    (el/ops/ann.py::norm_stats)."""
    from .ops.ann import norm_stats

    return norm_stats(_read(sf_dir, "embeddings",
                            columns=["embedding", "label"]))


def q_doc_ttr(sf_dir: str):
    """Per-document type-token ratio, hapax ratio and the underlying
    integer counts — lexical-diversity curation signal, one
    embarrassingly-parallel pass (el/ops/textstats.py::doc_ttr)."""
    from .ops.textstats import doc_ttr

    return doc_ttr(_read(sf_dir, "documents",
                         columns=["doc_id", "text"]))


def q_el_pair_monge_elkan(sf_dir: str):
    """Token-level Monge-Elkan similarity per labeled candidate pair
    (el/ops/er.py::monge_elkan_pair_sims; engine and oracle share the
    same SQL text, so the plan replays identically)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import monge_elkan_pair_sims

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"),
                               columns=["m1_id", "m2_id"])
    return monge_elkan_pair_sims(gp, ref)


def q_embed_silhouette(sf_dir: str):
    """Simplified centroid-based silhouette per label — exact
    integer-grid distances, per-vector 1e-9-quantized scores, one tiny
    label exchange (el/ops/ann.py::silhouette)."""
    from .ops.ann import silhouette

    return silhouette(_read(sf_dir, "embeddings",
                            columns=["embedding", "label"]))


def q_embed_covariance(sf_dir: str):
    """Distributed covariance matrix of the embedding table — exact
    int64 Gram partials on the 1e-6 grid, one tiny merge, no row-scale
    exchange (el/ops/ann.py::covariance)."""
    from .ops.ann import covariance

    return covariance(_read(sf_dir, "embeddings",
                            columns=["embedding"]))


def q_conv_turn_taking(sf_dir: str):
    """Per-conversation turn-taking structure: role-switch count/rate,
    longest same-role run, distinct roles — one conv_id exchange
    (el/ops/dialogue.py::turn_taking)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.dialogue import turn_taking

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "role"])
    return turn_taking(tr)


def q_doc_readability(sf_dir: str):
    """Per-document Flesch-style reading ease from exact regex-proxy
    counts — embarrassingly parallel, one pass
    (el/ops/textstats.py::readability)."""
    from .ops.textstats import readability

    return readability(_read(sf_dir, "documents",
                             columns=["doc_id", "text"]))


def q_turn_latency(sf_dir: str):
    """Corpus-level role-transition latency matrix from adjacent-turn
    ts deltas (el/ops/dialogue.py::turn_latency) — one conv exchange
    of integer partials, one roles^2-bounded merge."""
    from .ops.dialogue import turn_latency

    fd = ensure_fixture(sf_dir)
    import ray.data

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "role", "ts"])
    return turn_latency(tr)


def q_el_pair_damerau(sf_dir: str):
    """Damerau-Levenshtein distance + normalized similarity per
    labeled candidate pair (el/ops/er.py::damerau_pair_sims; the
    transposition-tolerant member of the edit family, DuckDB
    damerau_levenshtein() on both sides)."""
    fd = ensure_fixture(sf_dir)
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from .ops.er import damerau_pair_sims

    gm = pq.read_table(os.path.join(fd, "gold_mentions.parquet"),
                       columns=["mention_id", "surface"])
    surf = dict(zip(gm.column("mention_id").to_pylist(),
                    gm.column("surface").to_pylist()))
    ref = ray.put(surf)
    gp = ray.data.read_parquet(os.path.join(fd, "gold_pairs.parquet"),
                               columns=["m1_id", "m2_id"])
    return damerau_pair_sims(gp, ref)


def q_el_acronym_candidates(sf_dir: str):
    """Acronym <-> expansion candidate surfaces with mention counts
    (el/ops/er.py::acronym_candidates; the reference's abbreviation
    generator at candidate-generation level,
    StringUtils.scala extractAbbreviation idiom)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import acronym_candidates

    m = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                              columns=["surface"])
    return acronym_candidates(m)


def q_events_markov(sf_dir: str):
    """First-order Markov transition matrix over per-user event-type
    sequences: one row per (from_type, to_type) with the transition
    count and the row-normalized probability — the behavioral
    process-mining twin of tool_bigrams on the events table.

    Scale shape: ONE user_id hash exchange co-locates each user's
    history; block kernels sort by (ts, event_id) and emit
    types^2-bounded integer count partials; one tiny from_type
    exchange merges and row-normalizes (every from_type's rows are
    co-located, so the probability divides by an in-block exact
    integer sum)."""
    import ray.data

    from .shuffle import group_blocks

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"])

    p_cols = {"from_type": str, "to_type": str, "c": "int64"}

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in p_cols.items()})
        t = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = t.groupby("user_id", sort=False)["event_type"].shift(1)
        m = prev.notna()
        if not m.any():
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in p_cols.items()})
        out = pd.DataFrame({"from_type": prev[m].to_numpy(),
                            "to_type": t.loc[m, "event_type"].to_numpy()}) \
            .groupby(["from_type", "to_type"], as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    parts = group_blocks(ev, ["user_id"], transitions,
                         batch_format="pandas")

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"from_type": str, "to_type": str, "n": "int64",
                "p": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby(["from_type", "to_type"], as_index=False)["c"] \
            .sum().rename(columns={"c": "n"})
        g["n"] = g["n"].astype("int64")
        tot = g.groupby("from_type")["n"].transform("sum") \
            .to_numpy(np.float64)
        g["p"] = _round_half_away(
            g["n"].to_numpy(np.float64) / tot, 6)
        return g[list(cols)]

    return group_blocks(parts, ["from_type"], normalize,
                        batch_format="pandas")


def q_tpch_q8(sf_dir: str):
    """TPC-H Q8 national market share (adapted to the synthetic
    catalog: p_type='ECONOMY', customer region 'AMERICA', target
    supplier nation 'NATION_6', order years 1995-1996): per order
    year, the share of region-customer ECONOMY-part revenue supplied
    by the target nation.

    Scale shape — FOUR chained tagged-union hash exchanges (the q7
    idiom, one deeper): #1 partkey (semi-join against type-filtered
    part — the filtered partkey set is type-proportional, so it rides
    an exchange, not a broadcast); #2 suppkey (attach supplier
    nation); #3 orderkey (orders date-filtered BEFORE the exchange,
    attach custkey + order year, inner join drops out-of-window
    lineitems); #4 custkey (customer pre-filtered to the region's
    nations via the tiny nation/region driver dims, fold per-block
    (year, is_target) integer partials). Revenue is exact integer
    cents x discount units (q3 convention + 2^53 guard); the share
    divides two exact int64 sums once in float64. Out: (o_year,
    mkt_share[6dp], nation_volume[2dp], total_volume[2dp])."""
    import pyarrow.parquet as pq
    import ray.data

    from .shuffle import group_blocks

    PTYPE, REGION, TNAT = "ECONOMY", "AMERICA", "NATION_6"
    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1997-01-01")

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == REGION, "r_regionkey"].iloc[0])
    region_nations = set(
        nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].astype(int))
    tnat_key = int(nat.loc[nat["n_name"] == TNAT, "n_nationkey"].iloc[0])

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type"])
    supp = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])

    def li_side(df: pd.DataFrame) -> pa.Table:
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        rev_f = cents * (100 - disc)
        if len(rev_f) and np.max(np.abs(rev_f)) >= 2.0**53:
            raise OverflowError(
                "tpch_q8: per-line revenue exceeds the float64 "
                "integer-exact envelope (2^53); widen to decimal")
        n = len(df)
        return pa.table({
            "k": pa.array(df["l_partkey"].astype("int64")),
            "okey": pa.array(df["l_orderkey"].astype("int64")),
            "skey": pa.array(df["l_suppkey"].astype("int64")),
            "rev": pa.array(rev_f.astype("int64")),
            "tag": pa.array([0] * n, pa.int64())})

    def part_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["p_type"] == PTYPE]
        n = len(df)
        return pa.table({
            "k": pa.array(df["p_partkey"].astype("int64")),
            "okey": pa.nulls(n, pa.int64()),
            "skey": pa.nulls(n, pa.int64()),
            "rev": pa.nulls(n, pa.int64()),
            "tag": pa.array([1] * n, pa.int64())})

    tagged1 = li.map_batches(li_side, batch_format="pandas").union(
        part.map_batches(part_side, batch_format="pandas"))

    def join1(df: pd.DataFrame) -> pa.Table:
        p = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l.merge(p[["k"]].drop_duplicates(), on="k")
        # pre-aggregate: many lineitems share (suppkey, orderkey)
        j = j.groupby(["skey", "okey"], as_index=False)["rev"].sum()
        n = len(j)
        return pa.table({
            "k": pa.array(j["skey"].astype("int64")),
            "okey": pa.array(j["okey"].astype("int64")),
            "rev": pa.array(j["rev"].astype("int64")),
            "snat": pa.nulls(n, pa.int64()),
            "tag": pa.array([0] * n, pa.int64())})

    def supp_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "k": pa.array(df["s_suppkey"].astype("int64")),
            "okey": pa.nulls(n, pa.int64()),
            "rev": pa.nulls(n, pa.int64()),
            "snat": pa.array(df["s_nationkey"].astype("int64")),
            "tag": pa.array([1] * n, pa.int64())})

    tagged2 = group_blocks(tagged1, ["k"], join1,
                           batch_format="pandas").union(
        supp.map_batches(supp_side, batch_format="pandas"))

    def join2(df: pd.DataFrame) -> pa.Table:
        s = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l[["k", "okey", "rev"]].merge(s[["k", "snat"]], on="k")
        n = len(j)
        return pa.table({
            "k": pa.array(j["okey"].astype("int64")),
            "rev": pa.array(j["rev"].astype("int64")),
            "snat": pa.array(j["snat"].astype("int64")),
            "year": pa.nulls(n, pa.int64()),
            "ckey": pa.nulls(n, pa.int64()),
            "tag": pa.array([0] * n, pa.int64())})

    def order_side(df: pd.DataFrame) -> pa.Table:
        od = df["o_orderdate"].to_numpy()
        df = df[(od >= lo.to_datetime64()) & (od < hi.to_datetime64())]
        year = df["o_orderdate"].to_numpy().astype("datetime64[Y]") \
            .astype("int64") + 1970
        n = len(df)
        return pa.table({
            "k": pa.array(df["o_orderkey"].astype("int64")),
            "rev": pa.nulls(n, pa.int64()),
            "snat": pa.nulls(n, pa.int64()),
            "year": pa.array(year),
            "ckey": pa.array(df["o_custkey"].astype("int64")),
            "tag": pa.array([1] * n, pa.int64())})

    tagged3 = group_blocks(tagged2, ["k"], join2,
                           batch_format="pandas").union(
        orders.map_batches(order_side, batch_format="pandas"))

    def join3(df: pd.DataFrame) -> pa.Table:
        o = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l[["k", "rev", "snat"]].merge(
            o[["k", "year", "ckey"]], on="k")
        n = len(j)
        return pa.table({
            "k": pa.array(j["ckey"].astype("int64")),
            "rev": pa.array(j["rev"].astype("int64")),
            "snat": pa.array(j["snat"].astype("int64")),
            "year": pa.array(j["year"].astype("int64")),
            "cnat": pa.nulls(n, pa.int64()),
            "tag": pa.array([0] * n, pa.int64())})

    def cust_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["c_nationkey"].isin(region_nations)]
        n = len(df)
        return pa.table({
            "k": pa.array(df["c_custkey"].astype("int64")),
            "rev": pa.nulls(n, pa.int64()),
            "snat": pa.nulls(n, pa.int64()),
            "year": pa.nulls(n, pa.int64()),
            "cnat": pa.array(df["c_nationkey"].astype("int64")),
            "tag": pa.array([1] * n, pa.int64())})

    tagged4 = group_blocks(tagged3, ["k"], join3,
                           batch_format="pandas").union(
        cust.map_batches(cust_side, batch_format="pandas"))

    def join4_fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"year": "int64", "t_rev": "int64", "a_rev": "int64"}
        c = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l[["k", "rev", "snat", "year"]].merge(c[["k"]], on="k")
        if len(j) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        j["t_rev"] = np.where(j["snat"].to_numpy("int64") == tnat_key,
                              j["rev"].to_numpy("int64"), 0)
        out = j.groupby("year", as_index=False) \
            .agg(t_rev=("t_rev", "sum"), a_rev=("rev", "sum"))
        return out.astype(cols)

    parts = group_blocks(tagged4, ["k"], join4_fold,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_year": "int64", "mkt_share": "float64",
                "nation_volume": "float64", "total_volume": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby("year", as_index=False) \
            .agg(t_rev=("t_rev", "sum"), a_rev=("a_rev", "sum"))
        t = out["t_rev"].to_numpy("int64").astype(np.float64)
        a = out["a_rev"].to_numpy("int64").astype(np.float64)
        return pd.DataFrame({
            "o_year": out["year"].astype("int64").to_numpy(),
            "mkt_share": np.floor(
                np.where(a == 0, 0.0, t / np.where(a == 0, 1.0, a))
                * 1e6 + 0.5) / 1e6,
            "nation_volume": np.floor(t / 10000.0 * 100 + 0.5) / 100,
            "total_volume": np.floor(a / 10000.0 * 100 + 0.5) / 100,
        }).sort_values("o_year").reset_index(drop=True)

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_el_rule_coverage(sf_dir: str):
    """Per-blocking-rule pair provenance: pairs generated, marginal
    pairs (no other rule finds them), gold matches, plus the 'all'
    union row (el/ops/er.py::rule_coverage) — the decision input for
    composing the production candidate finder
    (RunKBPEntityLinkerSystem.scala:45-49)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import rule_coverage

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface", "gold_kb_id"])
    return rule_coverage(gm)


def q_char_trigram_logprob(sf_dir: str):
    """Character-trigram LM quality score per document — the char-level
    twin of unigram_logprob (el/ops/textstats.py::char_trigram_logprob;
    fit via one alphabet^3-bounded trigram exchange, score via one
    broadcast pass)."""
    from .ops.textstats import char_trigram_logprob

    return char_trigram_logprob(_read(sf_dir, "documents",
                                      columns=["doc_id", "text"]))


def q_embed_pair_hist(sf_dir: str):
    """Cosine histogram of all vectors against the 16-vector probe
    panel (el/ops/ann.py::embed_pair_hist) — the embedding-geometry
    health check before semantic-dedup thresholds."""
    import pyarrow.parquet as pq

    from .ops.ann import embed_pair_hist

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    head = t.to_pandas().sort_values("vec_id").head(16)
    Q = np.array([np.asarray(v, dtype=np.float64)
                  for v in head["embedding"]])
    q_ids = head["vec_id"].to_numpy("int64")
    return embed_pair_hist(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), Q, q_ids)


def q_doc_containment(sf_dir: str):
    """Asymmetric n-gram containment near-dup pairs over the planted
    corpus (el/ops/dedup.py::ngram_containment_pairs): catches
    sub-document duplication the symmetric Jaccard misses."""
    from .ops.dedup import ngram_containment_pairs

    return ngram_containment_pairs(_planted_dups(sf_dir), threshold=0.6)


def q_comention_degree_hist(sf_dir: str):
    """Degree distribution of the undirected co-mention graph: one row
    per degree with the node count — the skew diagnostic read before
    sizing the triangle/pagerank stages (heavy-tail degrees are what
    the 4k wedge cap and hot-key salting exist for).

    Scale shape: distinct co-mention edges (one conv exchange, the
    comention_counts chain) -> both directions -> per-batch src count
    partials -> ONE src exchange for exact degrees -> degree-bounded
    histogram partials -> single-partition merge."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.cooccur import comention_counts
    from .shuffle import group_blocks

    gm = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                               columns=["conv_id", "surface"])

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"s": pd.Series(dtype=str),
                                 "c": pd.Series(dtype="int64")})
        out = pd.DataFrame({
            "s": pd.concat([df["s1"], df["s2"]], ignore_index=True)}) \
            .groupby("s", as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    parts = comention_counts(gm).map_batches(both_dirs,
                                             batch_format="pandas")

    def degrees(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"degree": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        d = df.groupby("s", as_index=False)["c"].sum()
        out = d.groupby("c", as_index=False).size() \
            .rename(columns={"c": "degree", "size": "c"})
        out["degree"] = out["degree"].astype("int64")
        out["c"] = out["c"].astype("int64")
        return out

    hist_parts = group_blocks(parts, ["s"], degrees,
                              batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"degree": "int64", "n_nodes": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby("degree", as_index=False)["c"].sum() \
            .rename(columns={"c": "n_nodes"})
        return out.astype(cols).sort_values("degree") \
            .reset_index(drop=True)[list(cols)]

    return hist_parts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def q_minhash_band_stats(sf_dir: str):
    """LSH bucket-size distribution of the minhash banding (64 perms,
    16 bands — the minhash_dedup setting): one row per bucket size
    with how many buckets have it and the candidate-pair volume those
    buckets imply — THE tuning read before running LSH dedup at scale
    (a heavy bucket is quadratic work; this is where you see it
    before paying for it).

    Scale shape: vectorized signature map (the cached MinHasher),
    ONE bucket exchange for exact bucket sizes, size-bounded histogram
    partials, single-partition merge. The engine buckets on the
    splitmix64 band key and the oracle on the raw band-value
    string_agg — injective up to 2^-63 collisions, so the size
    multiset replays exactly (the minhash_dedup contract).
    Out: (bucket_size, n_buckets, cand_pairs)."""
    from .ops.dedup import _cached_minhasher
    from .shuffle import group_blocks

    docs = _planted_dups(sf_dir)

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        return _cached_minhasher(64, 16, 3)(df)

    rows = docs.map_batches(sigs, batch_format="pandas")

    def bucket_sizes(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"size": "int64", "c": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        s = df.groupby("bucket", as_index=False).size() \
            .rename(columns={"size": "sz"})
        out = s.groupby("sz", as_index=False).size() \
            .rename(columns={"sz": "size", "size": "c"})
        return out.astype(cols)

    parts = group_blocks(rows, ["bucket"], bucket_sizes,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"bucket_size": "int64", "n_buckets": "int64",
                "cand_pairs": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby("size", as_index=False)["c"].sum() \
            .rename(columns={"size": "bucket_size", "c": "n_buckets"})
        sz = out["bucket_size"].to_numpy("int64")
        out["cand_pairs"] = out["n_buckets"].to_numpy("int64") \
            * (sz * (sz - 1) // 2)
        return out.astype(cols).sort_values("bucket_size") \
            .reset_index(drop=True)[list(cols)]

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_tpch_q9(sf_dir: str):
    """TPC-H Q9 product-type profit (adapted: no partsupp table in
    this catalog, so unit cost is p_retailprice; the part filter is
    p_name LIKE '%red%'): profit per (supplier nation, order year)
    where profit = extendedprice*(1-discount) -
    retailprice*quantity, all in exact 1e-4-dollar integer units.

    Scale shape: the q8 skeleton — FOUR chained tagged-union hash
    exchanges (partkey attaches the name-filtered part's retail
    cents; suppkey the supplier nation; orderkey the order year;
    the custless fold groups (nation, year) integer partials) with
    per-batch pre-aggregation after the part join and loud 2^53
    envelope guards. Out: (nation, o_year, profit[2dp])."""
    import pyarrow.parquet as pq
    import ray.data

    from .shuffle import group_blocks

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int),
                       nat["n_name"].astype(str)))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"])
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_retailprice"])
    supp = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"])

    def li_side(df: pd.DataFrame) -> pa.Table:
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5)
        disc = np.floor(df["l_discount"].to_numpy() * 100 + 0.5)
        rev = cents * (100 - disc)  # 1e-4 dollars
        qty = np.floor(df["l_quantity"].to_numpy() + 0.5)
        if len(rev) and np.max(np.abs(rev)) >= 2.0**53:
            raise OverflowError(
                "tpch_q9: per-line revenue exceeds the float64 "
                "integer-exact envelope (2^53); widen to decimal")
        n = len(df)
        return pa.table({
            "k": pa.array(df["l_partkey"].astype("int64")),
            "okey": pa.array(df["l_orderkey"].astype("int64")),
            "skey": pa.array(df["l_suppkey"].astype("int64")),
            "rev": pa.array(rev.astype("int64")),
            "qty": pa.array(qty.astype("int64")),
            "rc": pa.nulls(n, pa.int64()),
            "tag": pa.array([0] * n, pa.int64())})

    def part_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["p_name"].str.contains("red", regex=False)]
        rc = np.floor(df["p_retailprice"].to_numpy() * 100 + 0.5)
        n = len(df)
        return pa.table({
            "k": pa.array(df["p_partkey"].astype("int64")),
            "okey": pa.nulls(n, pa.int64()),
            "skey": pa.nulls(n, pa.int64()),
            "rev": pa.nulls(n, pa.int64()),
            "qty": pa.nulls(n, pa.int64()),
            "rc": pa.array(rc.astype("int64")),
            "tag": pa.array([1] * n, pa.int64())})

    tagged1 = li.map_batches(li_side, batch_format="pandas").union(
        part.map_batches(part_side, batch_format="pandas"))

    def join1(df: pd.DataFrame) -> pa.Table:
        p = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l[["k", "okey", "skey", "rev", "qty"]].merge(
            p[["k", "rc"]], on="k")
        if len(j):
            # profit in 1e-4 dollars: rev - retail_cents * qty * 100
            cost = j["rc"].to_numpy("int64") * j["qty"].to_numpy("int64") \
                * 100
            if np.max(np.abs(cost)) >= 2**53:
                raise OverflowError(
                    "tpch_q9: per-line cost exceeds the integer-exact "
                    "envelope; widen to decimal")
            j = j.assign(profit=j["rev"].to_numpy("int64") - cost)
        else:
            j = j.assign(profit=pd.Series(dtype="int64"))
        j = j.groupby(["skey", "okey"], as_index=False)["profit"].sum()
        n = len(j)
        return pa.table({
            "k": pa.array(j["skey"].astype("int64")),
            "okey": pa.array(j["okey"].astype("int64")),
            "profit": pa.array(j["profit"].astype("int64")),
            "snat": pa.nulls(n, pa.int64()),
            "tag": pa.array([0] * n, pa.int64())})

    def supp_side(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table({
            "k": pa.array(df["s_suppkey"].astype("int64")),
            "okey": pa.nulls(n, pa.int64()),
            "profit": pa.nulls(n, pa.int64()),
            "snat": pa.array(df["s_nationkey"].astype("int64")),
            "tag": pa.array([1] * n, pa.int64())})

    tagged2 = group_blocks(tagged1, ["k"], join1,
                           batch_format="pandas").union(
        supp.map_batches(supp_side, batch_format="pandas"))

    def join2(df: pd.DataFrame) -> pa.Table:
        s = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l[["k", "okey", "profit"]].merge(s[["k", "snat"]], on="k")
        n = len(j)
        return pa.table({
            "k": pa.array(j["okey"].astype("int64")),
            "profit": pa.array(j["profit"].astype("int64")),
            "snat": pa.array(j["snat"].astype("int64")),
            "year": pa.nulls(n, pa.int64()),
            "tag": pa.array([0] * n, pa.int64())})

    def order_side(df: pd.DataFrame) -> pa.Table:
        year = df["o_orderdate"].to_numpy().astype("datetime64[Y]") \
            .astype("int64") + 1970
        n = len(df)
        return pa.table({
            "k": pa.array(df["o_orderkey"].astype("int64")),
            "profit": pa.nulls(n, pa.int64()),
            "snat": pa.nulls(n, pa.int64()),
            "year": pa.array(year),
            "tag": pa.array([1] * n, pa.int64())})

    tagged3 = group_blocks(tagged2, ["k"], join2,
                           batch_format="pandas").union(
        orders.map_batches(order_side, batch_format="pandas"))

    def join3_fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"snat": "int64", "year": "int64", "profit": "int64"}
        o = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l[["k", "profit", "snat"]].merge(o[["k", "year"]], on="k")
        if len(j) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = j.groupby(["snat", "year"], as_index=False)["profit"].sum()
        return out.astype(cols)

    parts = group_blocks(tagged3, ["k"], join3_fold,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"nation": str, "o_year": "int64", "profit": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby(["snat", "year"], as_index=False)["profit"].sum()
        return pd.DataFrame({
            "nation": out["snat"].astype(int).map(name_of).astype(str)
            .to_numpy(),
            "o_year": out["year"].astype("int64").to_numpy(),
            "profit": np.floor(out["profit"].to_numpy("int64") / 10000.0
                               * 100 + 0.5) / 100,
        }).sort_values(["nation", "o_year"]).reset_index(drop=True)

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_conv_vocab_overlap(sf_dir: str):
    """Per-conversation user/assistant vocabulary Jaccard
    (el/ops/dialogue.py::vocab_overlap) — the lexical-alignment
    curation signal."""
    from .ops.dialogue import vocab_overlap

    fd = ensure_fixture(sf_dir)
    import ray.data

    tr = ray.data.read_parquet(
        os.path.join(fd, "transcripts.parquet"),
        columns=["conv_id", "role", "text"])
    return vocab_overlap(tr)


def q_embed_pca_power(sf_dir: str):
    """Top principal direction of the embedding table via integer
    power iteration (el/ops/ann.py::pca_power): one distributed exact
    Gram scan, then a d x d driver iteration the oracle replays
    unrolled in HUGEINT."""
    from .ops.ann import pca_power

    return pca_power(_read(sf_dir, "embeddings",
                           columns=["embedding"]))


def q_near_dup_cluster_sizes(sf_dir: str):
    """Cluster-size histogram of the near-dup resolution: one row per
    cluster size with how many canonical clusters have it — the
    dedup-rate summary a curation report leads with.

    Scale shape: composes near_dup_resolve (task-shuffle LSH + CC),
    then ONE canonical_id exchange for exact cluster sizes and a
    size-bounded histogram merge."""
    from .shuffle import group_blocks

    res = q_near_dup_resolve(sf_dir)

    def sizes(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"size": "int64", "c": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        s = df.groupby("canonical_id", as_index=False).size() \
            .rename(columns={"size": "sz"})
        out = s.groupby("sz", as_index=False).size() \
            .rename(columns={"sz": "size", "size": "c"})
        return out.astype(cols)

    parts = group_blocks(res, ["canonical_id"], sizes,
                         batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"cluster_size": "int64", "n_clusters": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby("size", as_index=False)["c"].sum() \
            .rename(columns={"size": "cluster_size", "c": "n_clusters"})
        return out.astype(cols).sort_values("cluster_size") \
            .reset_index(drop=True)[list(cols)]

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_cross_source_dups(sf_dir: str):
    """Cross-source near-duplication matrix: for every unordered
    source pair, how many near-dup pairs (exact n-gram jaccard >= 0.5
    over the planted corpus) span it — the provenance-leakage report
    (the same article syndicated across crawls shows up here before
    it poisons a held-out split).

    Scale shape: the inverted-index pair chain (ngram_jaccard), then
    planted ids fold back to their base doc (doc_id % 1e6) and TWO
    tagged key exchanges attach each side's source (the hash-join
    idiom — documents is corpus-scale, never broadcast); per-block
    source^2-bounded count partials and a tiny merge."""
    from .ops.dedup import ngram_jaccard_pairs
    from .shuffle import group_blocks

    pairs = ngram_jaccard_pairs(_planted_dups(sf_dir), threshold=0.5)
    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": (df["d1"].astype("int64") % 1_000_000),
            "kind": "p",
            "other": (df["d2"].astype("int64") % 1_000_000),
            "s1": pd.Series([""] * len(df), dtype=str),
            "src": pd.Series([""] * len(df), dtype=str)})

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["doc_id"].astype("int64"),
            "kind": "s",
            "other": np.int64(0),
            "s1": pd.Series([""] * len(df), dtype=str),
            "src": df["source"].astype(str)})

    u1 = pairs.map_batches(pair_rows, batch_format="pandas").union(
        docs.map_batches(doc_rows, batch_format="pandas"))

    def attach1(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"key": "int64", "kind": str, "other": "int64",
                "s1": str, "src": str}
        s = df[df["kind"] == "s"]
        p = df[df["kind"] == "p"].copy()
        if len(p) == 0:
            return s[list(cols)].astype(cols)
        smap = s.set_index("key")["src"]
        p["s1"] = p["key"].map(smap).fillna("").astype(str)
        p["key"] = p["other"]
        return pd.concat([s, p], ignore_index=True)[list(cols)] \
            .astype(cols)

    r1 = group_blocks(u1, ["key"], attach1, batch_format="pandas")

    def attach2(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"source_1": str, "source_2": str, "c": "int64"}
        p = df[df["kind"] == "p"].copy()
        if len(p) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        smap = df[df["kind"] == "s"].set_index("key")["src"]
        s2 = p["key"].map(smap).fillna("").astype(str)
        a = np.minimum(p["s1"].to_numpy(dtype=object),
                       s2.to_numpy(dtype=object))
        b = np.maximum(p["s1"].to_numpy(dtype=object),
                       s2.to_numpy(dtype=object))
        out = pd.DataFrame({"source_1": a, "source_2": b}) \
            .groupby(["source_1", "source_2"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return out.astype(cols)

    parts = group_blocks(r1, ["key"], attach2, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"source_1": str, "source_2": str, "n_pairs": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby(["source_1", "source_2"], as_index=False)["c"] \
            .sum().rename(columns={"c": "n_pairs"})
        return out.astype(cols).sort_values(["source_1", "source_2"]) \
            .reset_index(drop=True)[list(cols)]

    return parts.repartition(1).map_batches(final, batch_format="pandas",
                                            batch_size=None)


def q_embed_pca_scores(sf_dir: str):
    """Per-vector projection onto the top principal direction: exact
    integer dot products of the 1e-6-grid components against
    pca_power's 1e6-grid direction (el/ops/ann.py::pca_power fit +
    one broadcast scoring pass; the oracle recomputes the direction
    with the same unrolled HUGEINT chain and joins). Out: (vec_id,
    score_grid)."""
    import ray

    from .ops.ann import _matrix_from_arrow, pca_power

    v = pca_power(_read(sf_dir, "embeddings", columns=["embedding"]))
    v_ref = ray.put(v["v_grid"].to_numpy("int64"))

    def score(t: pa.Table) -> pd.DataFrame:
        cols = {"vec_id": "int64", "score_grid": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({k: pd.Series(dtype=vv)
                                 for k, vv in cols.items()})
        vv = ray.get(v_ref)
        Q = np.floor(_matrix_from_arrow(t.column("embedding")) * 1e6
                     + 0.5).astype(np.int64)
        s = Q @ vv  # |q| <= 2e6, |v| <= 1e6, d=64 -> < 1.3e14, exact
        return pd.DataFrame({
            "vec_id": t.column("vec_id").to_numpy().astype("int64"),
            "score_grid": s.astype("int64")})

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .map_batches(score, batch_format="pyarrow")


def q_el_candidate_topk(sf_dir: str):
    """Top-3 JW-ranked blocking candidates per mention
    (el/ops/er.py::candidate_topk) — the proximity-sorted candidate
    finder surface (M10)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import candidate_topk

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"])
    return candidate_topk(gm, k=3)


def q_data_split_assign(sf_dir: str):
    """Deterministic md5-mod train/val/test assignment per document
    (el/ops/prep.py::split_assign) — seedless, shardable, exchange-
    free."""
    from .ops.prep import split_assign

    return split_assign(_read(sf_dir, "documents",
                              ["doc_id", "source"]))


ECDF_PROBES = [10, 25, 50, 75, 90]


def q_events_value_ecdf(sf_dir: str):
    """Exact ECDF of event value at fixed probe points, per event
    type: count and fraction of events with value <= p for p in
    ECDF_PROBES — the distribution profile without a quantile
    shuffle (counts are per-batch combiner partials; ONE tiny
    (type, probe) exchange).

    Out: (event_type, probe, n_le, n, frac[6dp])."""
    import ray.data

    from .shuffle import group_blocks

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"])
    probes = np.array(ECDF_PROBES, dtype=np.float64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": str, "probe": "int64", "n_le": "int64",
                "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        outs = []
        for et, g in df.groupby("event_type", sort=False):
            v = g["value"].to_numpy(np.float64)
            outs.append(pd.DataFrame({
                "event_type": et,
                "probe": probes.astype("int64"),
                "n_le": (v[None, :] <= probes[:, None]).sum(axis=1)
                .astype("int64"),
                "n": np.int64(len(v))}))
        return pd.concat(outs, ignore_index=True)[list(cols)]

    parts = ev.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": str, "probe": "int64", "n_le": "int64",
                "n": "int64", "frac": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby(["event_type", "probe"], as_index=False) \
            .agg(n_le=("n_le", "sum"), n=("n", "sum"))
        g["n_le"] = g["n_le"].astype("int64")
        g["n"] = g["n"].astype("int64")
        g["frac"] = _round_half_away(
            g["n_le"].to_numpy(np.float64) / g["n"].to_numpy(np.float64),
            6)
        return g[list(cols)]

    return group_blocks(parts, ["event_type", "probe"], merge,
                        batch_format="pandas")


def q_doc_length_hist(sf_dir: str):
    """Log2 character-length histogram of documents (+ per-bin char
    mass) — the corpus-shape overview a curation report opens with.
    floor(log2(n_chars)) is exact on both sides (log2 of powers of
    two is exactly representable; bins flip only there). One combiner
    + one bin-bounded exchange. Out: (len_bin, lo_chars, n_docs,
    total_chars)."""
    import ray.data

    from .shuffle import group_blocks

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"len_bin": "int64", "n_docs": "int64",
                "total_chars": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        n = df["n_chars"].to_numpy(np.int64)
        b = np.where(n <= 0, -1,
                     np.floor(np.log2(np.maximum(n, 1))).astype(np.int64))
        out = pd.DataFrame({"len_bin": b, "n_chars": n}) \
            .groupby("len_bin", as_index=False) \
            .agg(n_docs=("n_chars", "size"),
                 total_chars=("n_chars", "sum"))
        return out.astype(cols)

    parts = docs.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"len_bin": "int64", "lo_chars": "int64",
                "n_docs": "int64", "total_chars": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("len_bin", as_index=False).sum()
        b = g["len_bin"].to_numpy(np.int64)
        g["lo_chars"] = np.where(b < 0, 0, 2 ** np.maximum(b, 0))
        return g.astype(cols)[list(cols)]

    return group_blocks(parts, ["len_bin"], merge,
                        batch_format="pandas")


def q_windowed_comention(sf_dir: str):
    """Turn-windowed co-mention counts: for each unordered surface
    pair, the number of (conv, turn_a, turn_b) windows where the two
    surfaces appear within +-2 turns — the reference's coref-window
    NE search (M9) as a pair-level signal, sharper than conv-level
    comention_counts.

    Scale shape: ONE conv_id exchange co-locates conversations; the
    in-block self-merge is conv-bounded (quadratic only within one
    conversation's distinct (surface, turn) rows — the same bound the
    reference's window scan has); per-block (s1, s2) count partials,
    one pair exchange merges. Out: (s1, s2, n_windows)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .shuffle import group_blocks

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["conv_id", "surface", "turn_idx"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"s1": str, "s2": str, "c": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        md = df.drop_duplicates(["conv_id", "surface", "turn_idx"])
        j = md.merge(md, on="conv_id")
        j = j[(j["surface_x"] < j["surface_y"])
              & ((j["turn_idx_x"] - j["turn_idx_y"]).abs() <= 2)]
        if len(j) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = j.groupby(["surface_x", "surface_y"], as_index=False) \
            .size().rename(columns={"surface_x": "s1",
                                    "surface_y": "s2", "size": "c"})
        out["c"] = out["c"].astype("int64")
        return out[list(cols)]

    parts = group_blocks(gm, ["conv_id"], pairs, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"s1": str, "s2": str, "n_windows": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby(["s1", "s2"], as_index=False)["c"].sum() \
            .rename(columns={"c": "n_windows"})
        return out.astype(cols)

    return group_blocks(parts, ["s1", "s2"], merge,
                        batch_format="pandas")


def q_embed_quantize_error(sf_dir: str):
    """int8 reconstruction error per vector on the 1e-9 integer grid
    (el/ops/ann.py::quantize_error) — the is-int8-good-enough eval
    beside embed_quantize."""
    from .ops.ann import quantize_error

    return quantize_error(_read(sf_dir, "embeddings",
                                ["vec_id", "embedding"]))


def q_minhash_est_error(sf_dir: str):
    """Sketch-accuracy eval of the 64-perm MinHash: for every planted
    near-dup pair (doc, doc+1e6), the signature-agreement Jaccard
    estimate vs the exact shingle Jaccard and the absolute error —
    the measured answer to 'how many permutations do we need'.

    Scale shape: ONE base-doc exchange co-locates each planted pair
    (clone ids fold back via % 1e6); the in-block kernel runs the
    shared vectorized MinHasher on the two texts and exact set
    Jaccard on their shingles — per-pair bounded work, no pair
    blowup. Out: (doc_id, est, jaccard, abs_err), all on the 1e-6
    grid; the oracle replays signatures through the bit-exact
    HUGEINT permutation chain."""
    from .ops.dedup import _cached_minhasher, word_shingles
    from .shuffle import group_blocks

    docs = _planted_dups(sf_dir)

    def key_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["doc_id"].astype("int64") % 1_000_000,
            "doc_id": df["doc_id"].astype("int64"),
            "text": df["text"].astype(str)})

    keyed = docs.map_batches(key_rows, batch_format="pandas")

    def pair_err(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": "int64", "est": "float64",
                "jaccard": "float64", "abs_err": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        mh = _cached_minhasher(64, 16, 3)
        rows = []
        for key, g in df.groupby("key", sort=False):
            if len(g) != 2:
                continue  # unplanted docs have no clone
            g = g.sort_values("doc_id")
            base, clone = g.iloc[0], g.iloc[1]
            sigs = mh.signatures_batch([base["text"], clone["text"]])
            est = float((sigs[0] == sigs[1]).sum()) / 64.0
            s1 = set(word_shingles(base["text"], 3))
            s2 = set(word_shingles(clone["text"], 3))
            union = len(s1 | s2)
            jac = len(s1 & s2) / union if union else 1.0
            rows.append((int(base["doc_id"]), est, jac))
        if not rows:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = pd.DataFrame(rows, columns=["doc_id", "est", "jaccard"])
        out["est"] = _round_half_away(out["est"], 6)
        out["jaccard"] = _round_half_away(out["jaccard"], 6)
        out["abs_err"] = _round_half_away(
            np.abs(out["est"].to_numpy() - out["jaccard"].to_numpy()), 6)
        return out.astype(cols)[list(cols)]

    return group_blocks(keyed, ["key"], pair_err, batch_format="pandas")


def q_comention_neighbor_sim(sf_dir: str):
    """Common-neighbor / Jaccard / Adamic-Adar link-prediction scores
    over the co-mention graph (el/ops/graph.py::neighbor_sim) — the
    which-entities-will-co-occur-next primitive beside pagerank and
    triangles."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.cooccur import comention_counts
    from .ops.graph import neighbor_sim

    gm = ray.data.read_parquet(os.path.join(fd, "gold_mentions.parquet"),
                               columns=["conv_id", "surface"])

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": pd.concat([df["s1"], df["s2"]], ignore_index=True),
            "dst": pd.concat([df["s2"], df["s1"]], ignore_index=True)})

    edges = comention_counts(gm).map_batches(both_dirs,
                                             batch_format="pandas")
    return neighbor_sim(edges)


def q_part_copurchase(sf_dir: str):
    """Top-50 co-purchased part pairs (market-basket mining on the
    TPC-H side): distinct parts per order, within-order pairs, global
    counts, deterministic top-50.

    Scale shape: ONE orderkey exchange (orders are small baskets, the
    per-order pair set is |basket|^2-bounded); per-batch distinct
    (order, part) pre-dedup; ONE pair exchange for exact counts;
    local top-50 per partition then a tiny final merge (each pair
    lives wholly in one partition, the vocab_topk idiom). Out:
    (p1, p2, n_orders)."""
    import ray.data

    from .shuffle import group_blocks

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["l_orderkey", "l_partkey"])

    lp = li.map_batches(dedup, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"p1": "int64", "p2": "int64", "c": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        outs = []
        for _, g in d.groupby("l_orderkey", sort=False):
            p = np.sort(g["l_partkey"].to_numpy(np.int64))
            if len(p) < 2:
                continue
            i, j = np.triu_indices(len(p), k=1)
            outs.append(pd.DataFrame({"p1": p[i], "p2": p[j]}))
        if not outs:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = pd.concat(outs, ignore_index=True) \
            .groupby(["p1", "p2"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return out.astype(cols)

    pair_parts = group_blocks(lp, ["l_orderkey"], pairs,
                              batch_format="pandas")

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"p1": "int64", "p2": "int64", "n_orders": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby(["p1", "p2"], as_index=False)["c"].sum() \
            .rename(columns={"c": "n_orders"})
        out = out.sort_values(["n_orders", "p1", "p2"],
                              ascending=[False, True, True]).head(50)
        return out.astype(cols)

    merged = group_blocks(pair_parts, ["p1", "p2"], counts,
                          batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"p1": "int64", "p2": "int64", "n_orders": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return df.sort_values(["n_orders", "p1", "p2"],
                              ascending=[False, True, True]).head(50) \
            .reset_index(drop=True)[list(cols)].astype(cols)

    return merged.repartition(1).map_batches(final, batch_format="pandas",
                                             batch_size=None)


def q_users_cumulative(sf_dir: str):
    """User-growth curve: per day, newly seen users (first event that
    day) and the cumulative user count — the acquisition report.

    Scale shape: ONE user exchange for exact first-seen dates,
    day-bounded count partials, one single-partition running total
    (days are few; the exchange never moves event rows twice). Out:
    (day, new_users, cum_users)."""
    import ray.data

    from .shuffle import group_blocks

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"])

    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "first_ts": "datetime64[us]"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby("user_id", as_index=False)["ts"].min() \
            .rename(columns={"ts": "first_ts"})
        out["user_id"] = out["user_id"].astype("int64")
        return out

    parts = ev.map_batches(first_partial, batch_format="pandas")

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"day": str, "c": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        first = df.groupby("user_id", as_index=False)["first_ts"].min()
        day = first["first_ts"].dt.strftime("%Y-%m-%d")
        out = pd.DataFrame({"day": day}).groupby("day", as_index=False) \
            .size().rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        return out

    days = group_blocks(parts, ["user_id"], day_counts,
                        batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"day": str, "new_users": "int64", "cum_users": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby("day", as_index=False)["c"].sum() \
            .rename(columns={"c": "new_users"}).sort_values("day") \
            .reset_index(drop=True)
        out["cum_users"] = out["new_users"].cumsum()
        return out.astype(cols)[list(cols)]

    return days.repartition(1).map_batches(final, batch_format="pandas",
                                           batch_size=None)


def q_session_length_hist(sf_dir: str):
    """Histogram of session sizes (n_events per session) — the
    engagement-shape overview on top of sessionize; composes the
    oracled session op with one size-bounded histogram exchange.
    Out: (session_events, n_sessions)."""
    from .shuffle import group_blocks

    sess = q_sessionize(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"session_events": "int64", "c": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby("n_events", as_index=False).size() \
            .rename(columns={"n_events": "session_events",
                             "size": "c"})
        return out.astype(cols)

    parts = sess.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"session_events": "int64", "n_sessions": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby("session_events", as_index=False)["c"].sum() \
            .rename(columns={"c": "n_sessions"})
        return out.astype(cols)

    return group_blocks(parts, ["session_events"], merge,
                        batch_format="pandas")


def q_el_phonetic_confusables(sf_dir: str):
    """Phonetic-confusable report: Soundex blocks holding >= 2
    DISTINCT normalized surfaces, with the block's mention volume —
    where the phonetic key over-merges and the pair scorer must
    disambiguate (the block-quality lens on el_block_keys_phonetic).
    Out: (block_key, n_norms, n_mentions)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .shuffle import group_blocks
    from .text import normalize_name

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"])

    def keys(t: pa.Table) -> pd.DataFrame:
        mids, bks, norms = [], [], []
        for mid, s in zip(t.column("mention_id").to_pylist(),
                          t.column("surface").to_pylist()):
            norm = normalize_name(s)
            if not norm:
                continue
            last = norm.split()[-1]
            mids.append(mid)
            norms.append(norm)
            bks.append(f"ph:{soundex(last)}:{last[0]}")
        return pd.DataFrame({"mention_id": pd.Series(mids, dtype=str),
                             "norm": pd.Series(norms, dtype=str),
                             "block_key": pd.Series(bks, dtype=str)})

    keyed = gm.map_batches(keys, batch_format="pyarrow")

    def report(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"block_key": str, "n_norms": "int64",
                "n_mentions": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby("block_key", as_index=False).agg(
            n_norms=("norm", "nunique"),
            n_mentions=("mention_id", "size"))
        g = g[g["n_norms"] >= 2]
        return g.astype(cols)[list(cols)]

    return group_blocks(keyed, ["block_key"], report,
                        batch_format="pandas")


def q_tpch_q21(sf_dir: str):
    """TPC-H Q21 suppliers-who-kept-orders-waiting (adapted: no
    commit/receipt dates in this catalog, so 'late' = shipped > 60
    days after the order date): for multi-supplier orders where
    EXACTLY ONE supplier shipped late, count such orders per late
    supplier, top 20.

    Scale shape: lineitem pre-reduces per batch to distinct
    (orderkey, suppkey, shipped-late-max); orders ship (okey,
    orderdate); ONE orderkey exchange computes per-order supplier /
    late-supplier sets in-block (the EXISTS + NOT EXISTS pair as one
    co-located group scan); ONE suppkey-free count exchange; local
    top-20 + tiny merge. Out: (s_suppkey, numwait)."""
    import ray.data

    from .shuffle import group_blocks

    lag = pd.Timedelta(days=60)

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"])

    def li_side(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_orderkey", "l_suppkey"], as_index=False)[
            "l_shipdate"].max()
        return pd.DataFrame({
            "k": g["l_orderkey"].astype("int64"),
            "skey": g["l_suppkey"].astype("int64"),
            "ship": g["l_shipdate"],
            "odate": pd.Series([pd.NaT] * len(g),
                               dtype="datetime64[us]"),
            "tag": np.int64(0)})

    def o_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": df["o_orderkey"].astype("int64"),
            "skey": np.int64(0),
            "ship": pd.Series([pd.NaT] * len(df),
                              dtype="datetime64[us]"),
            "odate": df["o_orderdate"],
            "tag": np.int64(1)})

    tagged = li.map_batches(li_side, batch_format="pandas").union(
        orders.map_batches(o_side, batch_format="pandas"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"skey": "int64", "c": "int64"}
        o = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        if len(l) == 0 or len(o) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        # dedupe partial (okey, skey) rows across batches: keep max ship
        l = l.groupby(["k", "skey"], as_index=False)["ship"].max()
        j = l.merge(o[["k", "odate"]], on="k")
        j["late"] = j["ship"] > (j["odate"] + lag)
        g = j.groupby("k").agg(n_supp=("skey", "size"),
                               n_late=("late", "sum"))
        ok = g[(g["n_supp"] >= 2) & (g["n_late"] == 1)].index
        late_rows = j[j["k"].isin(ok) & j["late"]]
        if len(late_rows) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = late_rows.groupby("skey", as_index=False).size() \
            .rename(columns={"size": "c"})
        return out.astype(cols)

    parts = group_blocks(tagged, ["k"], fold, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"s_suppkey": "int64", "numwait": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.groupby("skey", as_index=False)["c"].sum() \
            .rename(columns={"skey": "s_suppkey", "c": "numwait"})
        out = out.sort_values(["numwait", "s_suppkey"],
                              ascending=[False, True]).head(20)
        return out.astype(cols)

    merged = group_blocks(parts, ["skey"], merge,
                          batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"s_suppkey": "int64", "numwait": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return df.sort_values(["numwait", "s_suppkey"],
                              ascending=[False, True]).head(20) \
            .reset_index(drop=True)[list(cols)].astype(cols)

    return merged.repartition(1).map_batches(final, batch_format="pandas",
                                             batch_size=None)


APPROX_Q_PCTS = [50, 90, 99]


def q_events_approx_quantiles(sf_dir: str):
    """Streaming percentile ESTIMATES per event type from a fixed
    integer-cent histogram (values bin at 1e-2): the scale path
    beside group_quantiles' exact sort — O(bins) partials, no
    order-statistics shuffle, error bounded by the bin width. The
    estimate is the smallest bin whose cumulative count reaches
    ceil(p/100 * n) (lower quantile on the binned grid), identical
    on both sides. Out: (event_type, pct, est_value[2dp], n)."""
    import ray.data

    from .shuffle import group_blocks

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": str, "cent": "int64", "c": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        out = df.assign(cent=np.floor(
            df["value"].to_numpy(np.float64) * 100 + 0.5)
            .astype(np.int64)) \
            .groupby(["event_type", "cent"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return out.astype(cols)

    parts = ev.map_batches(partial, batch_format="pandas")

    def est(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": str, "pct": "int64",
                "est_value": "float64", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            g = g.groupby("cent", as_index=False)["c"].sum() \
                .sort_values("cent")
            n = int(g["c"].sum())
            cum = g["c"].cumsum().to_numpy(np.int64)
            cents = g["cent"].to_numpy(np.int64)
            for p in APPROX_Q_PCTS:
                need = -(-p * n // 100)  # ceil(p*n/100) in ints
                idx = int(np.searchsorted(cum, need))
                rows.append((et, p, cents[min(idx, len(cents) - 1)]
                             / 100.0, n))
        return pd.DataFrame(rows, columns=list(cols)).astype(cols)

    return group_blocks(parts, ["event_type"], est,
                        batch_format="pandas")


def q_doc_token_entropy(sf_dir: str):
    """Per-document Shannon entropy (nats) of the token distribution —
    the repetition/diversity signal beside doc_ttr and
    repetition_score, computed as H = ln(n) - (sum c*ln(c))/n with
    each c*ln(c) term quantized to the 1e-9 integer grid (order-free
    exactness, the events_entropy contract). Embarrassingly parallel.
    Out: (doc_id, n_tokens, n_types, entropy[6dp])."""
    import ray.data

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def ent(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": "int64", "n_tokens": "int64",
                "n_types": "int64", "entropy": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        toks = df["text"].astype(str).str.lower() \
            .str.findall(r"[a-z0-9]+")
        n_tok, n_typ, h = [], [], []
        for ts in toks:
            n = len(ts)
            n_tok.append(n)
            if n == 0:
                n_typ.append(0)
                h.append(0.0)
                continue
            c = pd.Series(ts).value_counts().to_numpy(np.int64)
            n_typ.append(len(c))
            terms = np.floor(c * np.log(c.astype(np.float64)) * 1e9
                             + 0.5).astype(np.int64)
            h.append(np.log(float(n))
                     - float(terms.sum()) / 1e9 / float(n))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64").to_numpy(),
            "n_tokens": np.array(n_tok, dtype=np.int64),
            "n_types": np.array(n_typ, dtype=np.int64),
            "entropy": _round_half_away(np.array(h, np.float64), 6)})

    return docs.map_batches(ent, batch_format="pandas")


# TPC-H Q2/Q11/Q16/Q20 adaptation constants. No partsupp table in this
# catalog, so lineitem serves as the part-supplier bridge in all four;
# every constant is interpolated into the oracle SQL f-string too, so
# engine and oracle can never desynchronize (the el_soft_tfidf lesson).
TPCH_Q2_REGION = "EUROPE"
TPCH_Q2_TYPE = "STANDARD"
TPCH_Q2_MAX_SIZE = 10
TPCH_Q2_LIMIT = 100
TPCH_Q11_NATION = "NATION_7"
TPCH_Q11_FRAC_DEN = 1000  # keep parts with value > total / FRAC_DEN
TPCH_Q16_BRAND_EXCL = "Brand#5"
TPCH_Q16_TYPE_EXCL = "MEDIUM"
TPCH_Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)
TPCH_Q20_TYPE = "PROMO"
TPCH_Q20_LO, TPCH_Q20_HI = "1997-01-01", "1998-01-01"
TPCH_Q20_REGION = "ASIA"


def q_tpch_q2(sf_dir: str):
    """TPC-H Q2 minimum-cost supplier (adapted: 'supply cost' = the
    cheapest extendedprice the supplier ever shipped the part at): for
    every STANDARD part of size <= 10, the EUROPE-region supplier(s)
    whose cheapest line for that part hits the part's minimum among
    EUROPE suppliers; Q2's ORDER BY acctbal DESC / LIMIT 100 tail.

    Scale shape: nation+region are constant-size dims (driver dicts,
    25/5 rows at ANY sf); supplier region-filters BEFORE its exchange.
    Exchange #1 (suppkey) attaches (acctbal, name, nation) to
    per-batch pre-minimized (pkey, skey, min-cents) lineitem partials
    — each (pkey, skey) lands in exactly one block, so the fold's
    re-min is globally exact. Exchange #2 (partkey) joins the
    qualifying-part side, takes the per-part min price, emits the
    suppliers achieving it, and pre-sorts a local top-100; a tiny
    single-block merge finishes. Prices are exact integer cents.
    Out: (s_acctbal, s_name, n_name, p_partkey, p_brand)."""
    import pyarrow.parquet as pq
    import ray.data  # noqa: F401

    from .shuffle import group_blocks

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == TPCH_Q2_REGION,
                       "r_regionkey"].iloc[0])
    eur_keys = set(nat.loc[nat["n_regionkey"] == rkey,
                           "n_nationkey"].astype(int))
    nname = dict(zip(nat["n_nationkey"].astype(int),
                     nat["n_name"].astype(str)))

    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey", "s_name", "s_acctbal"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"])

    def supp_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["s_nationkey"].isin(eur_keys)]
        n = len(df)
        return pa.table({
            "k": pa.array(df["s_suppkey"].astype("int64")),
            "pkey": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
            "acctbal": pa.array(df["s_acctbal"].astype("float64")),
            "sname": pa.array(df["s_name"].astype(str), pa.string()),
            "nname": pa.array([nname[int(x)] for x in df["s_nationkey"]],
                              pa.string()),
            "tag": pa.array(np.ones(n, dtype="int64"))})

    def li_side(df: pd.DataFrame) -> pa.Table:
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        g = (df.assign(cents=cents)
             .groupby(["l_suppkey", "l_partkey"], as_index=False)["cents"]
             .min())
        n = len(g)
        return pa.table({
            "k": pa.array(g["l_suppkey"].astype("int64")),
            "pkey": pa.array(g["l_partkey"].astype("int64")),
            "cents": pa.array(g["cents"].astype("int64")),
            "acctbal": pa.nulls(n, pa.float64()),
            "sname": pa.nulls(n, pa.string()),
            "nname": pa.nulls(n, pa.string()),
            "tag": pa.array(np.zeros(n, dtype="int64"))})

    tagged = supp.map_batches(supp_side, batch_format="pandas").union(
        li.map_batches(li_side, batch_format="pandas"))

    ann_cols = {"pkey": "int64", "skey": "int64", "cents": "int64",
                "acctbal": "float64", "sname": str, "nname": str,
                "brand": str, "tag": "int64"}

    def attach_supp(df: pd.DataFrame) -> pd.DataFrame:
        s = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        if len(s) == 0 or len(l) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in ann_cols.items()})
        l = l.groupby(["k", "pkey"], as_index=False)["cents"].min()
        j = l.merge(s[["k", "acctbal", "sname", "nname"]], on="k")
        return pd.DataFrame({
            "pkey": j["pkey"].astype("int64"),
            "skey": j["k"].astype("int64"),
            "cents": j["cents"].astype("int64"),
            "acctbal": j["acctbal"].astype("float64"),
            "sname": j["sname"].astype(str),
            "nname": j["nname"].astype(str),
            "brand": "",
            "tag": np.int64(0)})

    annotated = group_blocks(tagged, ["k"], attach_supp,
                             batch_format="pandas")

    def part_side(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[(df["p_size"] <= TPCH_Q2_MAX_SIZE)
                  & (df["p_type"] == TPCH_Q2_TYPE)]
        n = len(keep)
        return pd.DataFrame({
            "pkey": keep["p_partkey"].astype("int64"),
            "skey": np.zeros(n, dtype="int64"),
            "cents": np.zeros(n, dtype="int64"),
            "acctbal": np.zeros(n, dtype="float64"),
            "sname": "",
            "nname": "",
            "brand": keep["p_brand"].astype(str),
            "tag": np.int64(1)})

    tagged2 = annotated.union(
        part.map_batches(part_side, batch_format="pandas"))

    out_cols = {"s_acctbal": "float64", "s_name": str, "n_name": str,
                "p_partkey": "int64", "p_brand": str}

    def pick_min(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        j = l.merge(p[["pkey", "brand"]].rename(
            columns={"brand": "p_brand"}), on="pkey") \
            if len(p) and len(l) else pd.DataFrame()
        if len(j) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in out_cols.items()})
        mc = j.groupby("pkey")["cents"].transform("min")
        j = j[j["cents"] == mc]
        out = pd.DataFrame({
            "s_acctbal": j["acctbal"].astype("float64"),
            "s_name": j["sname"].astype(str),
            "n_name": j["nname"].astype(str),
            "p_partkey": j["pkey"].astype("int64"),
            "p_brand": j["p_brand"].astype(str)})
        return out.sort_values(
            ["s_acctbal", "n_name", "s_name", "p_partkey"],
            ascending=[False, True, True, True]).head(TPCH_Q2_LIMIT)

    tops = group_blocks(tagged2, ["pkey"], pick_min,
                        batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in out_cols.items()})
        return df.sort_values(
            ["s_acctbal", "n_name", "s_name", "p_partkey"],
            ascending=[False, True, True, True]) \
            .head(TPCH_Q2_LIMIT).reset_index(drop=True)

    return tops.repartition(1).map_batches(final, batch_format="pandas",
                                           batch_size=None)


def q_tpch_q11(sf_dir: str):
    """TPC-H Q11 important stock (adapted: a part's 'stock value' from
    NATION_7 suppliers = the summed extendedprice cents of their lines
    for it): keep parts whose value exceeds total/1000.

    Scale shape: supplier nation-filters before exchange #1 (suppkey),
    whose fold semi-joins lineitem partials (pre-summed per (skey,
    pkey) per batch) and re-aggregates per pkey; exchange #2 (pkey)
    finishes the per-part sums; the global-fraction gate runs in one
    single-block pass over per-PART aggregates (dimension-scale, not
    corpus-scale — the same final shape as q15/q17). Integer cents
    throughout; the gate is the exact integer predicate
    val*1000 > tot. Out: (p_partkey, value[2dp])."""
    import pyarrow.parquet as pq
    import ray.data  # noqa: F401

    from .shuffle import group_blocks

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    nkey = int(nat.loc[nat["n_name"] == TPCH_Q11_NATION,
                       "n_nationkey"].iloc[0])

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])

    def supp_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["s_nationkey"] == nkey]
        n = len(df)
        return pa.table({
            "k": pa.array(df["s_suppkey"].astype("int64")),
            "pkey": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
            "tag": pa.array(np.ones(n, dtype="int64"))})

    def li_side(df: pd.DataFrame) -> pa.Table:
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        g = (df.assign(cents=cents)
             .groupby(["l_suppkey", "l_partkey"], as_index=False)["cents"]
             .sum())
        n = len(g)
        return pa.table({
            "k": pa.array(g["l_suppkey"].astype("int64")),
            "pkey": pa.array(g["l_partkey"].astype("int64")),
            "cents": pa.array(g["cents"].astype("int64")),
            "tag": pa.array(np.zeros(n, dtype="int64"))})

    tagged = supp.map_batches(supp_side, batch_format="pandas").union(
        li.map_batches(li_side, batch_format="pandas"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"pkey": "int64", "val": "int64"}
        sk = set(df.loc[df["tag"] == 1, "k"].to_numpy())
        l = df[(df["tag"] == 0) & df["k"].isin(sk)]
        if len(l) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return l.groupby("pkey", as_index=False)["cents"].sum() \
            .rename(columns={"cents": "val"}).astype(cols)

    parts = group_blocks(tagged, ["k"], fold, batch_format="pandas")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"pkey": "int64", "val": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return df.groupby("pkey", as_index=False)["val"].sum() \
            .astype(cols)

    vals = group_blocks(parts, ["pkey"], per_part, batch_format="pandas")

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"p_partkey": "int64", "value": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        tot = int(df["val"].sum())
        keep = df[df["val"].to_numpy() * TPCH_Q11_FRAC_DEN > tot]
        return pd.DataFrame({
            "p_partkey": keep["pkey"].astype("int64"),
            "value": keep["val"].to_numpy("int64") / 100.0}) \
            .sort_values("p_partkey").reset_index(drop=True)

    return vals.repartition(1).map_batches(gate, batch_format="pandas",
                                           batch_size=None)


def q_tpch_q16(sf_dir: str):
    """TPC-H Q16 supplier count by part attributes (adapted: the
    'customer complaints' exclusion = suppliers with negative acctbal;
    the bridge is distinct lineitem (partkey, suppkey) pairs): distinct
    supplier count per (brand, type, size) over non-excluded brands /
    types / the 7 square sizes.

    Scale shape: THREE chained hash exchanges, each over pre-deduped
    partials — #1 (suppkey) drops complaint suppliers from per-batch
    distinct (pkey, skey) pairs; #2 (pkey) attaches the qualifying
    part's (brand, type, size); #3 (brand, type, size) counts distinct
    suppkey with every row of a group co-located. No limit; ~|brand x
    type x size| output rows. Out: (p_brand, p_type, p_size,
    supplier_cnt)."""
    import ray.data  # noqa: F401

    from .shuffle import group_blocks

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"])

    def supp_side(df: pd.DataFrame) -> pa.Table:
        df = df[df["s_acctbal"].to_numpy() >= 0]
        n = len(df)
        return pa.table({
            "k": pa.array(df["s_suppkey"].astype("int64")),
            "pkey": pa.nulls(n, pa.int64()),
            "tag": pa.array(np.ones(n, dtype="int64"))})

    def li_side(df: pd.DataFrame) -> pa.Table:
        g = df.drop_duplicates(["l_suppkey", "l_partkey"])
        n = len(g)
        return pa.table({
            "k": pa.array(g["l_suppkey"].astype("int64")),
            "pkey": pa.array(g["l_partkey"].astype("int64")),
            "tag": pa.array(np.zeros(n, dtype="int64"))})

    tagged = supp.map_batches(supp_side, batch_format="pandas").union(
        li.map_batches(li_side, batch_format="pandas"))

    def drop_excluded(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"pkey": "int64", "skey": "int64"}
        sk = set(df.loc[df["tag"] == 1, "k"].to_numpy())
        l = df[(df["tag"] == 0) & df["k"].isin(sk)]
        if len(l) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return l.drop_duplicates(["k", "pkey"]) \
            .rename(columns={"k": "skey"})[["pkey", "skey"]].astype(cols)

    pairs = group_blocks(tagged, ["k"], drop_excluded,
                         batch_format="pandas")

    sizes = set(TPCH_Q16_SIZES)

    def part_side(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[(df["p_brand"] != TPCH_Q16_BRAND_EXCL)
                  & (df["p_type"] != TPCH_Q16_TYPE_EXCL)
                  & df["p_size"].isin(sizes)]
        n = len(keep)
        return pd.DataFrame({
            "pkey": keep["p_partkey"].astype("int64"),
            "skey": np.zeros(n, dtype="int64"),
            "brand": keep["p_brand"].astype(str),
            "ptype": keep["p_type"].astype(str),
            "psize": keep["p_size"].astype("int64"),
            "tag": np.int64(1)})

    def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame({
            "pkey": df["pkey"].astype("int64"),
            "skey": df["skey"].astype("int64"),
            "brand": "",
            "ptype": "",
            "psize": np.zeros(n, dtype="int64"),
            "tag": np.int64(0)})

    tagged2 = pairs.map_batches(pair_rows, batch_format="pandas").union(
        part.map_batches(part_side, batch_format="pandas"))

    def attach_attrs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"brand": str, "ptype": str, "psize": "int64",
                "skey": "int64"}
        p = df[df["tag"] == 1]
        l = df[df["tag"] == 0]
        if len(p) == 0 or len(l) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        j = l[["pkey", "skey"]].merge(
            p[["pkey", "brand", "ptype", "psize"]], on="pkey")
        return j[["brand", "ptype", "psize", "skey"]].astype(cols)

    attrs = group_blocks(tagged2, ["pkey"], attach_attrs,
                         batch_format="pandas")

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"p_brand": str, "p_type": str, "p_size": "int64",
                "supplier_cnt": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby(["brand", "ptype", "psize"], as_index=False)[
            "skey"].nunique().rename(columns={
                "brand": "p_brand", "ptype": "p_type",
                "psize": "p_size", "skey": "supplier_cnt"})
        return g.astype(cols)

    return group_blocks(attrs, ["brand", "ptype", "psize"],
                        count_distinct, batch_format="pandas")


def q_tpch_q20(sf_dir: str):
    """TPC-H Q20 potential part promotion (adapted: no partsupp
    availqty, so a supplier 'has excess stock' of a part when their
    1997 shipped quantity of it exceeds HALF the part's total — the
    dominant supplier): distinct ASIA-region suppliers dominating at
    least one PROMO part.

    Scale shape: exchange #1 (partkey) folds per-batch pre-summed
    (pkey, skey, centi-qty) lineitem partials against the PROMO part
    markers and applies the exact integer gate 2*q > tot in-block
    (every (pkey, skey) co-located); exchange #2 (suppkey) semi-joins
    the region-filtered supplier side; tiny single-block sort ends.
    Out: (s_suppkey, s_name, n_name)."""
    import pyarrow.parquet as pq
    import ray.data  # noqa: F401

    from .shuffle import group_blocks

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == TPCH_Q20_REGION,
                       "r_regionkey"].iloc[0])
    asia_keys = set(nat.loc[nat["n_regionkey"] == rkey,
                            "n_nationkey"].astype(int))
    nname = dict(zip(nat["n_nationkey"].astype(int),
                     nat["n_name"].astype(str)))

    lo = pd.Timestamp(TPCH_Q20_LO)
    hi = pd.Timestamp(TPCH_Q20_HI)

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey", "s_name"])

    def part_side(df: pd.DataFrame) -> pa.Table:
        keep = df[df["p_type"] == TPCH_Q20_TYPE]
        n = len(keep)
        return pa.table({
            "k": pa.array(keep["p_partkey"].astype("int64")),
            "skey": pa.nulls(n, pa.int64()),
            "q": pa.nulls(n, pa.int64()),
            "tag": pa.array(np.ones(n, dtype="int64"))})

    def li_side(df: pd.DataFrame) -> pa.Table:
        sd = df["l_shipdate"].to_numpy()
        df = df[(sd >= lo.to_datetime64()) & (sd < hi.to_datetime64())]
        qc = np.floor(df["l_quantity"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        g = (df.assign(q=qc)
             .groupby(["l_partkey", "l_suppkey"], as_index=False)["q"]
             .sum())
        n = len(g)
        return pa.table({
            "k": pa.array(g["l_partkey"].astype("int64")),
            "skey": pa.array(g["l_suppkey"].astype("int64")),
            "q": pa.array(g["q"].astype("int64")),
            "tag": pa.array(np.zeros(n, dtype="int64"))})

    tagged = part.map_batches(part_side, batch_format="pandas").union(
        li.map_batches(li_side, batch_format="pandas"))

    def dominant(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"k": "int64"}
        pk = set(df.loc[df["tag"] == 1, "k"].to_numpy())
        l = df[(df["tag"] == 0) & df["k"].isin(pk)]
        if len(l) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        l = l.groupby(["k", "skey"], as_index=False)["q"].sum()
        tot = l.groupby("k")["q"].transform("sum")
        dom = l[2 * l["q"].to_numpy() > tot.to_numpy()]
        return pd.DataFrame({"k": dom["skey"].unique().astype("int64")})

    doms = group_blocks(tagged, ["k"], dominant, batch_format="pandas")

    def dom_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame({
            "k": df["k"].astype("int64"),
            "sname": "" if n else pd.Series(dtype=str),
            "nname": "" if n else pd.Series(dtype=str),
            "tag": np.zeros(n, dtype="int64")})

    def supp_side(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["s_nationkey"].isin(asia_keys)]
        n = len(keep)
        return pd.DataFrame({
            "k": keep["s_suppkey"].astype("int64"),
            "sname": keep["s_name"].astype(str),
            "nname": pd.Series(
                [nname[int(x)] for x in keep["s_nationkey"]], dtype=str,
                index=keep.index),
            "tag": np.ones(n, dtype="int64")})

    tagged2 = doms.map_batches(dom_rows, batch_format="pandas").union(
        supp.map_batches(supp_side, batch_format="pandas"))

    out_cols = {"s_suppkey": "int64", "s_name": str, "n_name": str}

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        dk = set(df.loc[df["tag"] == 0, "k"].to_numpy())
        s = df[(df["tag"] == 1) & df["k"].isin(dk)] \
            .drop_duplicates(["k"])
        if len(s) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in out_cols.items()})
        return pd.DataFrame({
            "s_suppkey": s["k"].astype("int64"),
            "s_name": s["sname"].astype(str),
            "n_name": s["nname"].astype(str)})

    hits = group_blocks(tagged2, ["k"], semi, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in out_cols.items()})
        return df.sort_values("s_suppkey").reset_index(drop=True)

    return hits.repartition(1).map_batches(final, batch_format="pandas",
                                           batch_size=None)


def q_hll_distinct(sf_dir: str):
    """HyperLogLog distinct users per event type — the fixed-memory
    sketch beside KMV/CMS/bloom (el/ops/sketch.py::hll_distinct); the
    oracle replays registers, rho and the estimator exactly."""
    from .ops.sketch import hll_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_distinct(ev, "event_type", "user_id")


def q_part_skyline(sf_dir: str):
    """Distributed exact skyline per p_type: the Pareto frontier
    maximizing p_retailprice while minimizing p_size (Borzsony et al.
    2001; el/ops/relational.py::skyline — local frontier prune, one
    group exchange, exact fold). Out: the frontier rows."""
    from .ops.relational import skyline

    part = _read(sf_dir, "part",
                 ["p_type", "p_partkey", "p_retailprice", "p_size"])
    return skyline(part, group="p_type", maxcol="p_retailprice",
                   mincol="p_size")


def q_el_fingerprint_cluster(sf_dir: str):
    """OpenRefine-style fingerprint key-collision clustering: key =
    space-joined sorted UNIQUE tokens of the normalized surface, so
    token order and repetition collapse ('acme corp' == 'corp acme
    corp'); cluster representative = min mention_id — the word-bag
    analog of el_exact_cluster's clusterNils semantics
    (RunKBPEntityLinkerSystem.scala:160-192).
    Out: (mention_id, fp_key, cluster_id)."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .shuffle import group_map
    from .text import normalize_name

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface"])

    def add_fp(t: pa.Table) -> pa.Table:
        fps = []
        for s in t.column("surface").to_pylist():
            toks = sorted(set(re.findall(
                r"[a-z0-9]+", normalize_name(s))))
            fps.append(" ".join(toks))
        return pa.table({"mention_id": t.column("mention_id"),
                         "fp_key": pa.array(fps, pa.string())})

    def group_min(g: pa.Table) -> pa.Table:
        mids = g.column("mention_id").to_pylist()
        if not mids:
            return pa.table({"mention_id": pa.array([], pa.string()),
                             "fp_key": pa.array([], pa.string()),
                             "cluster_id": pa.array([], pa.string())})
        lo = min(mids)
        return pa.table({"mention_id": g.column("mention_id"),
                         "fp_key": g.column("fp_key"),
                         "cluster_id": pa.array([lo] * len(mids),
                                                pa.string())})

    return group_map(gm.map_batches(add_fp, batch_format="pyarrow"),
                     "fp_key", group_min)


ANN_RANGE_THETA = 0.25
CONV_WINDOW_MIN = 10


def q_ann_range_search(sf_dir: str):
    """Cosine RANGE search (radius query): every table vector with
    5dp-rounded sim >= 0.25 of each of the 3 probe vectors — the
    no-exchange sibling of ann_topk (el/ops/ann.py::range_search)."""
    from .ops.ann import range_search

    Q = _query_matrix(sf_dir)
    out = range_search(_read(sf_dir, "embeddings",
                             ["vec_id", "embedding"]),
                       Q, theta=ANN_RANGE_THETA)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["q_id"] = df["q_id"].astype("int64")
        return df[["q_id", "vec_id", "sim"]]

    return out.map_batches(finish, batch_format="pandas")


def q_click_conversion_window(sf_dir: str):
    """Windowed sequential-pattern match: per user, how many clicks
    are followed by a purchase by the SAME user within 10 minutes
    (inclusive start, exclusive end) — the time-bounded sibling of
    event_funnel's unbounded ordering. ONE user exchange; in-fold
    per-user sorted purchase timestamps + searchsorted over the click
    vector (no per-event Python loop).
    Out: (user_id, n_clicks, n_converted)."""
    import ray.data  # noqa: F401

    from .shuffle import group_blocks

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    win = np.timedelta64(CONV_WINDOW_MIN * 60 * 1_000_000, "us")

    def sides(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["event_type"].isin(("click", "purchase"))]
        return pd.DataFrame({
            "k": keep["user_id"].astype("int64"),
            "ts": keep["ts"],
            "is_click": (keep["event_type"] == "click")
            .to_numpy(np.int64)})

    tagged = ev.map_batches(sides, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_clicks": "int64",
                "n_converted": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        rows = []
        for u, sub in df.groupby("k", sort=False):
            clicks = sub.loc[sub["is_click"] == 1, "ts"] \
                .to_numpy("datetime64[us]")
            if len(clicks) == 0:
                continue
            purch = np.sort(sub.loc[sub["is_click"] == 0, "ts"]
                            .to_numpy("datetime64[us]"))
            idx = np.searchsorted(purch, clicks, side="left")
            ok = idx < len(purch)
            conv = np.zeros(len(clicks), dtype=bool)
            conv[ok] = purch[idx[ok]] < clicks[ok] + win
            rows.append((int(u), len(clicks), int(conv.sum())))
        return pd.DataFrame(rows, columns=list(cols)).astype(cols)

    return group_blocks(tagged, ["k"], fold, batch_format="pandas")


def q_kmeans_assign(sf_dir: str):
    """Fixed-iteration Lloyd's k-means over the embeddings table with
    exact integer-grid arithmetic (el/ops/ann.py::kmeans_assign):
    init = the k smallest vec_ids' vectors, 3 iterations, ties to the
    lowest centroid id. The oracle unrolls every iteration —
    assignments are hash-checked bit-for-bit, the embed_pca_power
    contract for iterative algorithms. Out: (vec_id, cluster)."""
    import pyarrow.parquet as pq

    from .ops.ann import KMEANS_GRID, KMEANS_K, kmeans_assign

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    df = t.to_pandas().sort_values("vec_id").head(KMEANS_K)
    c0 = np.floor(np.array(
        [np.asarray(v, np.float64) for v in df["embedding"]])
        * KMEANS_GRID + 0.5).astype(np.int64)
    ids = df["vec_id"].to_numpy(np.int64)
    return kmeans_assign(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), c0, ids)


CUBE_ALL = "(all)"


def q_el_cluster_nmi(sf_dir: str):
    """Normalized mutual information of exact-alias clustering vs gold
    (arithmetic normalization, sklearn default) on the shared 1e-9
    integer entropy grid (el/ops/er.py::cluster_nmi); one row out."""
    fd = ensure_fixture(sf_dir)
    import ray.data

    from .ops.er import cluster_nmi

    gm = ray.data.read_parquet(
        os.path.join(fd, "gold_mentions.parquet"),
        columns=["mention_id", "surface", "gold_kb_id"])
    return cluster_nmi(gm)


def q_events_cube(sf_dir: str):
    """CUBE(event_type, hour-of-day) counts and exact value-cents sums
    — all four grouping sets ('(all)' / -1 sentinels instead of SQL
    NULL keys). The per-batch combiner derives every coarser set from
    the finest LOCALLY, so ONE (event_type, hod) exchange moves at
    most 4 x |types| x 24 pre-aggregated rows per batch regardless of
    corpus size. Out: (event_type, hod, n, value_cents)."""
    import ray.data  # noqa: F401

    from .shuffle import group_blocks

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    cols = {"event_type": str, "hod": "int64", "n": "int64",
            "value_cents": "int64"}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        base = pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "hod": df["ts"].dt.hour.astype("int64"),
            "cents": np.floor(df["value"].to_numpy(np.float64) * 100
                              + 0.5).astype("int64")})
        fine = base.groupby(["event_type", "hod"], as_index=False) \
            .agg(n=("cents", "size"), value_cents=("cents", "sum"))
        outs = [fine]
        t_only = fine.groupby("event_type", as_index=False)[
            ["n", "value_cents"]].sum().assign(hod=np.int64(-1))
        h_only = fine.groupby("hod", as_index=False)[
            ["n", "value_cents"]].sum().assign(event_type=CUBE_ALL)
        total = pd.DataFrame({"event_type": [CUBE_ALL],
                              "hod": pd.array([-1], dtype="int64"),
                              "n": [fine["n"].sum()],
                              "value_cents": [fine["value_cents"].sum()]})
        outs += [t_only, h_only, total]
        return pd.concat(outs, ignore_index=True)[list(cols)] \
            .astype(cols)

    parts = ev.map_batches(partial, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        return df.groupby(["event_type", "hod"], as_index=False)[
            ["n", "value_cents"]].sum().astype(cols)

    return group_blocks(parts, ["event_type", "hod"], fold,
                        batch_format="pandas")
