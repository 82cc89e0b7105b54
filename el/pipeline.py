"""The end-to-end entity-linking pipeline (stage graph + CLI).

Ray shape (SURVEY.md §3.1): read_parquet(transcripts)
  -> [A: mention extraction, stateless map_batches over Arrow]
  -> [B: alias canonicalization, groupby(conv_id).map_groups]
  -> [alias profile: groupby(alias_norm) -> one row per DISTINCT alias
      (min mention_id, count, representative surface)]
  -> [E: per-distinct-alias KB link decision, actor pool w/ broadcast KB]
  -> [C: blocking-key flat_map + groupby(block_key) distinct-alias pairs]
  -> [D: pair-scoring actor pool]
  -> [F: union-find over the CONTRACTED alias graph]
  -> [G: answers map_batches + sort(conv_id, turn_idx) + write_parquet]

Scale design. Every mention-scale operation is a map_batches or a single
groupby (conv_id / alias_norm / block_key); the iterative clustering
runs on the *contracted alias graph* (nodes = distinct normalized
aliases), which is orders of magnitude smaller than the mention table —
its node label is min(mention_id) from the alias profile, so the
component label is identical to mention-level union-find. When the
alias graph fits the driver (< driver_cc_max_nodes) we union-find
locally and broadcast the alias -> (cluster, kb) map into the final
map_batches via ray.put; above the threshold we fall back to the
distributed min-label propagation in el.cluster (same result, tested
both ways). Every stage can checkpoint per-partition Parquet with a
lineage manifest (el.checkpoint) so a killed job resumes mid-pipeline.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from .alias import canonicalize
from .blocking import block_pair_groups, emit_keys_batch
from .checkpoint import CheckpointManager
from .cluster import SENTINEL, label_propagation, union_find_local
from .kb import broadcast_kb
from .linkdecide import CandidateLinker
from .mentions import extract_mentions
from .scorer import MERGE_CUTOFF, PairScorer, score_pairs_batch
from .shuffle import group_blocks, group_map

DRIVER_CC_MAX_NODES = 5_000_000  # contracted-graph size guard


def _alias_profile_block(df):
    """Vectorized block fn over hash-partitioned alias_norm: one
    representative row per distinct alias + min(mention_id) + count.
    Representative = lexicographic min of (alias, surface, ner_type)."""
    import pandas as pd

    if len(df) == 0:
        return pd.DataFrame({
            "alias_norm": pd.Series(dtype=str),
            "alias": pd.Series(dtype=str),
            "surface": pd.Series(dtype=str),
            "ner_type": pd.Series(dtype=str),
            "min_mention": pd.Series(dtype=str),
            "n_mentions": pd.Series(dtype="int64"),
        })
    df = df.sort_values(["alias_norm", "alias", "surface", "ner_type"])
    g = df.groupby("alias_norm", sort=False)
    out = g.agg(
        alias=("alias", "first"),
        surface=("surface", "first"),
        ner_type=("ner_type", "first"),
        min_mention=("mention_id", "min"),
        n_mentions=("mention_id", "size"),
    ).reset_index()
    out["n_mentions"] = out["n_mentions"].astype("int64")
    return out


def _chunk_table(tbl: pa.Table, rows_per_chunk: int) -> list[pa.Table]:
    """Slice a table into block-sized chunks (map_batches parallelism is
    per block)."""
    if tbl.num_rows == 0:
        return [tbl]
    return [tbl.slice(i, rows_per_chunk)
            for i in range(0, tbl.num_rows, rows_per_chunk)]


def _merge_profiles(partials_tbl: pa.Table) -> pa.Table:
    """Driver-side merge of per-batch partial profiles (the partial fn is
    associative: per-key rep = min (alias, surface, ner) tuple,
    min_mention = min, n_mentions = sum)."""
    import pandas as pd

    df = partials_tbl.to_pandas()
    if len(df) == 0:
        return partials_tbl
    df = df.sort_values(["alias_norm", "alias", "surface", "ner_type"])
    out = df.groupby("alias_norm", sort=True).agg(
        alias=("alias", "first"),
        surface=("surface", "first"),
        ner_type=("ner_type", "first"),
        min_mention=("min_mention", "min"),
        n_mentions=("n_mentions", "sum"),
    ).reset_index()
    out["n_mentions"] = out["n_mentions"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def _pairs_from_profile(profile_tbl: pa.Table) -> pa.Table:
    """Driver-side blocking + pair generation over the distinct-alias
    profile (small by contract): same key functions and per-block
    salting/caps as the distributed path, plus cross-block pair dedup.
    Vectorized: index pairs per block via numpy triu, one take() at the
    end instead of building millions of Python tuples."""
    import numpy as np

    from .blocking import MAX_ALIASES_PER_BLOCK, _salt, block_keys

    norms = profile_tbl.column("alias_norm").to_pylist()
    order = sorted(range(len(norms)), key=lambda i: norms[i])
    key_map: dict[str, list[int]] = {}
    for i in order:
        for k in block_keys(norms[i]):
            key_map.setdefault(k, []).append(i)
    i1_parts: list[np.ndarray] = []
    i2_parts: list[np.ndarray] = []
    key_parts: list[str] = []
    key_counts: list[int] = []
    dropped = 0
    for k in sorted(key_map):
        idxs = key_map[k]
        n = len(idxs)
        if n < 2:
            continue
        if n <= MAX_ALIASES_PER_BLOCK:
            groups = [idxs]
        else:
            n_salts = -(-n // MAX_ALIASES_PER_BLOCK)
            buckets: dict[int, list[int]] = {}
            for i in idxs:
                buckets.setdefault(_salt(norms[i], n_salts), []).append(i)
            groups = list(buckets.values())
            total = n * (n - 1) // 2
            dropped += total - sum(len(g) * (len(g) - 1) // 2 for g in groups)
        for g in groups:
            if len(g) < 2:
                continue
            arr = np.asarray(g, dtype=np.int64)
            r, c = np.triu_indices(len(arr), k=1)
            i1_parts.append(arr[r])
            i2_parts.append(arr[c])
            key_parts.append(k)
            key_counts.append(len(r))
    if not i1_parts:
        names = ["a1", "a2", "alias1", "alias2", "surface1", "surface2",
                 "ner1", "ner2", "block_key"]
        tbl = pa.table({n: pa.array([], pa.string()) for n in names})
        return tbl.append_column("dropped_pairs", pa.array([], pa.int64()))
    i1 = np.concatenate(i1_parts)
    i2 = np.concatenate(i2_parts)
    keys = np.repeat(np.array(key_parts, dtype=object), key_counts)
    # cross-block dedup on (i1, i2) — indices are norm-sorted so i1 < i2
    pair_ids = i1.astype(np.int64) * len(norms) + i2
    _, first = np.unique(pair_ids, return_index=True)
    first.sort()
    i1, i2, keys = i1[first], i2[first], keys[first]

    def take(col: str, idx: np.ndarray) -> pa.Array:
        return profile_tbl.column(col).take(pa.array(idx))

    tbl = pa.table(
        {
            "a1": pa.array([f"A:{norms[i]}" for i in i1], pa.string()),
            "a2": pa.array([f"A:{norms[i]}" for i in i2], pa.string()),
            "alias1": take("alias", i1),
            "alias2": take("alias", i2),
            "surface1": take("surface", i1),
            "surface2": take("surface", i2),
            "ner1": take("ner_type", i1),
            "ner2": take("ner_type", i2),
            "block_key": pa.array(keys.tolist(), pa.string()),
        }
    )
    return tbl.append_column(
        "dropped_pairs", pa.array([dropped] * len(tbl), pa.int64())
    )


def _link_batch(t: pa.Table, kb_ref) -> pa.Table:
    """Task-based link decision over distinct aliases: the KB index ref
    resolves from shared memory per task (actor-pool form:
    el.linkdecide.CandidateLinker, for heavyweight per-actor state)."""
    import ray

    from .linkdecide import link_alias

    kb = ray.get(kb_ref)
    aliases = t.column("alias_norm").to_pylist()
    ids, scores, confs = [], [], []
    for a in aliases:
        kb_id, s, c = link_alias(a, kb)
        ids.append(kb_id)
        scores.append(s)
        confs.append(c)
    return pa.table({
        "alias_norm": pa.array(aliases, pa.string()),
        "kb_id": pa.array(ids, pa.string()),
        "link_score": pa.array(scores, pa.float64()),
        "link_conf": pa.array(confs, pa.float64()),
    })


def _finish_batch(t: pa.Table, map_ref) -> pa.Table:
    """Final mention-scale map: attach cluster / kb_link / confidence
    from the broadcast alias map. Task-based: ray.get of the broadcast
    ref is a shared-memory read, so no actor pool is needed."""
    import ray

    alias_map = ray.get(map_ref)
    out_cluster, out_kb, out_conf = [], [], []
    for an in t.column("alias_norm").to_pylist():
        cluster, kb_link, conf = alias_map[an]
        out_cluster.append(cluster)
        out_kb.append(kb_link)
        out_conf.append(conf)
    keep = t.select(["mention_id", "conv_id", "turn_idx", "surface", "alias"])
    return (
        keep.append_column("cluster_id", pa.array(out_cluster, pa.string()))
        .append_column("kb_link", pa.array(out_kb, pa.string()))
        .append_column("confidence", pa.array(out_conf, pa.float64()))
    )


class _Finisher:
    """Actor-pool form of _finish_batch (for callers that prefer a pool
    when the alias map is very large and worth pinning per actor)."""

    def __init__(self, map_ref):
        import ray

        self.alias_map = ray.get(map_ref)
        self._ref = map_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        return _finish_batch(t, self._ref)


def _cluster_aliases_driver(profile_tbl: pa.Table, links_tbl: pa.Table,
                            edges_tbl: pa.Table) -> dict[str, tuple[str, str, float]]:
    """Driver-side contracted-graph clustering.

    Returns alias_norm -> (cluster_id, kb_link, confidence). Mirrors the
    reference's cluster semantics: merge edges above the cutoff unless
    they would fuse two distinct KB entities (Clusterer merges only
    pairs with a NIL side, Clusterer.scala:40); a component containing a
    KB-linked alias adopts the KB id (keep-E-id rule, Clusterer.scala:47-56);
    pure-NIL components get NIL:<min mention_id> (deterministic,
    replacing the AtomicInteger counter, RunKBPEntityLinkerSystem.scala:31-34).
    """
    kb_of: dict[str, str] = {}
    conf_of: dict[str, float] = {}
    for r in links_tbl.to_pylist():
        kb_of[r["alias_norm"]] = r["kb_id"]
        conf_of[r["alias_norm"]] = r["link_conf"]
    min_mention: dict[str, str] = {}
    for r in profile_tbl.to_pylist():
        min_mention[r["alias_norm"]] = r["min_mention"]

    edges = []
    for r in edges_tbl.to_pylist():
        x, y = r["a1"][2:], r["a2"][2:]  # strip "A:"
        kx, ky = kb_of.get(x, ""), kb_of.get(y, "")
        if kx and ky and kx != ky:
            continue  # never merge two distinct KB entities
        edges.append((x, y))
    # KB anchoring: aliases linked to the same KB id share a component
    for an, kb in kb_of.items():
        if kb:
            edges.append((an, f"KB:{kb}"))
    comp_of = union_find_local(edges, nodes=min_mention.keys())

    # component label: min over members of (kb_id | min mention_id);
    # "E..." sorts before "conv..." so a KB id wins deterministically.
    comp_label: dict[str, str] = {}
    for an in min_mention:
        c = comp_of[an]
        lab = min_mention[an]
        kb = kb_of.get(an, "")
        if kb and kb < lab:
            lab = kb
        if c not in comp_label or lab < comp_label[c]:
            comp_label[c] = lab
    comp_sizes: dict[str, int] = {}
    for an in min_mention:
        c = comp_of[an]
        comp_sizes[c] = comp_sizes.get(c, 0) + 1

    out: dict[str, tuple[str, str, float]] = {}
    for an in min_mention:
        c = comp_of[an]
        lab = comp_label[c]
        if lab.startswith("E"):
            kb_link = lab
            conf = conf_of.get(an, 0.7) if kb_of.get(an) == lab else 0.7
        else:
            kb_link = f"NIL:{lab}"
            conf = 0.6 if comp_sizes[c] > 1 else max(0.55, min(conf_of.get(an, 0.55), 0.6))
        out[an] = (lab, kb_link, conf)
    return out


def _cluster_aliases_distributed(profile_ds, links_ds, edges_ds, num_partitions: int):
    """Fallback for contracted graphs too large for the driver: the same
    clustering via distributed min-label propagation (el.cluster).
    Returns a Dataset (alias_norm, cluster_id)."""
    links_kv = links_ds.map_batches(
        lambda t: pa.table({"alias_norm": t.column("alias_norm"),
                            "kb": t.column("kb_id")}),
        batch_format="pyarrow",
    )

    def alias_nodes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.binary_join_element_wise(
                    pa.array(["A:"] * len(t)), t.column("alias_norm"), ""
                ),
                "label": t.column("min_mention"),
            }
        )

    def kb_anchor_edges(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t.column("kb"), ""))
        return pa.table(
            {
                "src": pc.binary_join_element_wise(
                    pa.array(["A:"] * len(f)), f.column("alias_norm"), ""
                ),
                "dst": pc.binary_join_element_wise(
                    pa.array(["KB:"] * len(f)), f.column("kb"), ""
                ),
            }
        )

    def kb_nodes(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t.column("kb"), ""))
        return pa.table(
            {
                "node": pc.binary_join_element_wise(
                    pa.array(["KB:"] * len(f)), f.column("kb"), ""
                ),
                "label": f.column("kb"),
            }
        )

    fuzzy = edges_ds.map_batches(
        lambda t: pa.table({"src": t.column("a1"), "dst": t.column("a2")}),
        batch_format="pyarrow",
    )
    edges = fuzzy.union(links_kv.map_batches(kb_anchor_edges, batch_format="pyarrow"))
    from .cluster import gather_min

    init = gather_min(
        profile_ds.map_batches(alias_nodes, batch_format="pyarrow")
        .union(links_kv.map_batches(kb_nodes, batch_format="pyarrow")),
        "node", "label", num_partitions=num_partitions,
    )
    labels = label_propagation(edges, init, num_partitions=num_partitions)
    return labels.map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "alias_norm": pc.utf8_slice_codeunits(f.column("node"), 2),
                    "cluster_id": f.column("label"),
                }
            )
        )(t.filter(pc.starts_with(t.column("node"), "A:"))),
        batch_format="pyarrow",
    )


def run_linkage(
    fixture_dir: str,
    checkpoint_dir: str | None = None,
    from_scratch: bool = False,
    concurrency: int | None = None,
    batch_size: int = 8192,
    num_partitions: int = 8,
    driver_cc_max_nodes: int = DRIVER_CC_MAX_NODES,
    timings: dict | None = None,
):
    """Full pipeline. Returns the answers Dataset with columns
    (mention_id, conv_id, turn_idx, surface, alias, cluster_id, kb_link,
    confidence), sorted by (conv_id, turn_idx) — the north-rule stable
    ordering.

    Two physical plans, same semantics (equivalence is a pytest):

    - DEFAULT (mention count <= driver_cc_max_nodes): mention-scale work
      is distributed (extract+canonicalize fused into one conv_id
      exchange; the final attach + sort); the alias-scale work —
      profile merge, KB linking, pair generation, union-find — runs on
      the driver over the collected partial profiles. The contracted
      alias set is orders of magnitude smaller than the mention table,
      and every avoided hash exchange saves ~3s of aggregator-actor
      startup, so this minimizes fixed overhead per run.
    - FALLBACK (beyond the driver guard): every alias-scale stage runs
      distributed too (hash-partitioned profile, linker actor pool,
      blocked pair generation, min-label propagation, hash join back).
    """
    import ray
    import ray.data

    cpus = int(ray.cluster_resources().get("CPU", 4))
    if concurrency is None:
        # light actor pools (linker / finisher): a quarter of the CPUs,
        # capped — oversized pools pay startup cost without speedup
        concurrency = max(2, min(8, cpus // 4))
    # the pair scorer is the compute-heavy pool: let it scale with the
    # session so its throughput follows the CPU count
    score_concurrency = max(2, min(16, cpus // 2))

    import time as _time

    ckpt = CheckpointManager(checkpoint_dir, from_scratch)
    tr_path = os.path.join(fixture_dir, "transcripts.parquet")
    kb_path = os.path.join(fixture_dir, "kb.parquet")

    def _timed(name, fn):
        t0 = _time.time()
        r = fn()
        if timings is not None:
            timings[name] = round(_time.time() - t0, 3)
        return r

    def collect(ds) -> pa.Table:
        tbls = [ray.get(r) for r in ds.to_arrow_refs()]
        tbls = [t for t in tbls if t.num_rows]
        if not tbls:
            return pa.table({})
        cols = tbls[0].column_names  # blocks may order columns differently
        return pa.concat_tables([t.select(cols) for t in tbls])

    # [A] extract, then [B] canonicalize over one conv_id hash exchange.
    # The extraction result is pinned first: letting the exchange run
    # concurrently with extraction measured ~2.7x slower than the two
    # phases back-to-back (resource contention between the read/extract
    # tasks and the shuffle aggregators). The clustering path never
    # reads `context`, so the shuffled payload stays narrow.
    aliased = _timed("aliased", lambda: ckpt.stage(
        "aliased", {"input": tr_path},
        lambda: canonicalize(
            _timed("extract", lambda: extract_mentions(
                ray.data.read_parquet(
                    tr_path, columns=["conv_id", "turn_idx", "text"])
            ).select_columns(
                ["mention_id", "conv_id", "turn_idx", "beg", "end",
                 "surface", "ner_type"]).materialize())
        ),
    ))
    n_mentions = aliased.count()
    driver_path = n_mentions <= driver_cc_max_nodes

    if driver_path:
        # per-batch partial profiles -> driver merge (no exchange)
        partials = aliased.select_columns(
            ["mention_id", "alias", "alias_norm", "surface", "ner_type"]
        ).map_batches(_alias_profile_block, batch_format="pandas",
                      batch_size=None)
        profile = _timed("alias_profile", lambda: ckpt.stage(
            "alias_profile", {"input": tr_path},
            lambda: ray.data.from_arrow(
                _merge_profiles(collect(partials))),
        ))
        profile_tbl = collect(profile)

        kb_ref = broadcast_kb(kb_path)

        def build_links():
            src = profile_tbl.select(["alias_norm"])
            chunks = _chunk_table(src, 1024)
            return ray.data.from_arrow(chunks).map_batches(
                _link_batch,
                fn_kwargs={"kb_ref": kb_ref},
                batch_format="pyarrow",
                batch_size=1024,
            )

        links = _timed("links", lambda: ckpt.stage(
            "links", {"input": tr_path, "kb": kb_path}, build_links))
        links_tbl = collect(links)

        def build_scored():
            pairs_tbl = _pairs_from_profile(profile_tbl)
            # split into many blocks: map_batches parallelism is per
            # BLOCK, and from_arrow of one table yields a single block
            chunks = _chunk_table(pairs_tbl, 4096)
            return ray.data.from_arrow(chunks).map_batches(
                score_pairs_batch,
                batch_format="pyarrow",
                batch_size=batch_size,
            )

        scored = _timed("scored_pairs", lambda: ckpt.stage(
            "scored_pairs", {"input": tr_path}, build_scored))

        def build_answers():
            edges_tbl = collect(scored.map_batches(
                lambda t: t.filter(
                    pc.greater_equal(t.column("score"), MERGE_CUTOFF)
                ).select(["a1", "a2"]),
                batch_format="pyarrow",
            ))
            alias_map = _cluster_aliases_driver(profile_tbl, links_tbl,
                                                edges_tbl)
            map_ref = ray.put(alias_map)
            finished = aliased.map_batches(
                _finish_batch,
                fn_kwargs={"map_ref": map_ref},
                batch_format="pyarrow",
                batch_size=batch_size,
            )
            return finished.sort(["conv_id", "turn_idx"])

        return _timed("answers", lambda: ckpt.stage(
            "answers", {"input": tr_path, "kb": kb_path}, build_answers))

    # ----------------------------------------------- distributed fallback
    profile = ckpt.stage(
        "alias_profile", {"input": tr_path},
        lambda: group_blocks(
            aliased.select_columns(
                ["mention_id", "alias", "alias_norm", "surface", "ner_type"]
            ),
            ["alias_norm"], _alias_profile_block, batch_format="pandas",
        ),
    )

    kb_ref = broadcast_kb(kb_path)
    links = ckpt.stage(
        "links", {"input": tr_path, "kb": kb_path},
        lambda: profile.map_batches(
            CandidateLinker,
            fn_constructor_args=(kb_ref,),
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=concurrency,
            num_cpus=0.5,
        ).select_columns(["alias_norm", "kb_id", "link_score", "link_conf"]),
    )

    def build_scored():
        keys = profile.map_batches(
            lambda t: emit_keys_batch(
                t.select(["alias_norm", "alias", "surface", "ner_type"])
            ),
            batch_format="pyarrow",
        )
        pairs = group_map(keys, "block_key", block_pair_groups)
        return pairs.map_batches(
            PairScorer,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=0.5,
        )

    scored = ckpt.stage("scored_pairs", {"input": tr_path}, build_scored)

    def build_answers():
        edges = scored.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("score"), MERGE_CUTOFF)
            ).select(["a1", "a2"]),
            batch_format="pyarrow",
        )
        clusters = _cluster_aliases_distributed(
            profile, links, edges, num_partitions
        )
        withc = aliased.join(
            clusters, "inner", num_partitions, on=("alias_norm",),
            aggregator_ray_remote_args={"num_cpus": 0.25},
        )
        finished = withc.map_batches(
            lambda t: (
                t.select(
                    ["mention_id", "conv_id", "turn_idx", "surface", "alias",
                     "cluster_id"]
                )
                .append_column(
                    "kb_link",
                    pc.if_else(
                        pc.starts_with(t.column("cluster_id"), "E"),
                        t.column("cluster_id"),
                        pc.binary_join_element_wise(
                            pa.array(["NIL:"] * len(t)),
                            t.column("cluster_id"), "",
                        ),
                    ),
                )
                .append_column(
                    "confidence", pa.array([0.6] * len(t), pa.float64())
                )
            ),
            batch_format="pyarrow",
        )
        return finished.sort(["conv_id", "turn_idx"])

    return ckpt.stage("answers", {"input": tr_path, "kb": kb_path},
                      build_answers)


def main(argv=None):
    import argparse
    import ray

    ap = argparse.ArgumentParser(description="Ray-Data entity-linking pipeline")
    ap.add_argument("--input", required=True, help="fixture dir (transcripts+kb)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--from-scratch", action="store_true")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    args = ap.parse_args(argv)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True)
    try:
        answers = run_linkage(args.input, args.checkpoint_dir, args.from_scratch)
        answers.write_parquet(args.output)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
