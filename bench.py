#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:
  {"metric": "el_linkage_sec", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "pairs_scored_per_sec": ...}

--scaling: run the same job in two fresh processes at num_cpus=8 and 32
on the same input and print both throughputs + scaling efficiency
(the sandbox proxy for the N vs 4N node criterion, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# "full" runs EL + ops queries; "el" runs only the EL pipeline (used by
# --scaling, which measures it on a compute-dominant fixture scale)
BENCH_MODE = os.environ.get("BENCH_MODE", "full")
EL_FIXTURE_SCALE = os.environ.get("EL_FIXTURE_SCALE")  # override sf-derived


def run_bench() -> dict:
    import ray

    from el.fixtures import ensure_fixture

    fixture = ensure_fixture(EL_FIXTURE_SCALE or SF_DIR)  # cached on disk

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    # warm the page cache so we measure compute + shuffle, not cold disk
    ray.data.read_parquet(os.path.join(fixture, "transcripts.parquet")).count()

    from el.pipeline import run_linkage

    timings: dict[str, float] = {}

    t0 = time.time()
    stage_timings: dict = {}
    answers = run_linkage(fixture, timings=stage_timings)
    n_answers = answers.count()
    el_sec = time.time() - t0
    timings["el_linkage"] = round(el_sec, 3)

    n_turns = json.load(
        open(os.path.join(fixture, "fixture_manifest.json"))
    )["n_turns"]
    if BENCH_MODE == "el":
        result = {
            "metric": "el_linkage_sec",
            "value": round(el_sec, 3),
            "unit": "sec",
            "queries": timings,
            "sf": EL_FIXTURE_SCALE or SF_DIR,
            "num_cpus": NUM_CPUS,
            "n_turns": n_turns,
            "n_answers": n_answers,
            "turns_per_sec": round(n_turns / el_sec, 1),
            "stages": stage_timings,
        }
        ray.shutdown()
        return result

    # isolated pair-scoring throughput (the BASELINE.json metric)
    from el.blocking import block_pair_groups, emit_keys_batch
    from el.pipeline import _alias_profile_block
    from el.scorer import PairScorer

    tr = ray.data.read_parquet(
        os.path.join(fixture, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )
    from el.alias import canonicalize
    from el.mentions import extract_mentions

    from el.shuffle import group_blocks, group_map

    profile = group_blocks(
        canonicalize(extract_mentions(tr).select_columns(
            ["mention_id", "conv_id", "turn_idx", "beg", "end", "surface",
             "ner_type"]))
        .select_columns(["mention_id", "alias", "alias_norm", "surface",
                         "ner_type"]),
        ["alias_norm"], _alias_profile_block, batch_format="pandas",
    )
    keys = profile.map_batches(
        lambda t: emit_keys_batch(
            t.select(["alias_norm", "alias", "surface", "ner_type"])),
        batch_format="pyarrow",
    )
    pairs = group_map(keys, "block_key", block_pair_groups).materialize()
    n_pairs = pairs.count()
    from el.scorer import score_pairs_batch

    t0 = time.time()
    pairs.map_batches(score_pairs_batch, batch_format="pyarrow",
                      batch_size=4096).count()
    score_sec = time.time() - t0
    timings["pair_scoring"] = round(score_sec, 3)

    # training-data ops over the sf tables
    from el import queries as q

    for name in ("lineitem_pricing", "events_hourly", "exact_dedup",
                 "token_count", "ann_topk", "minhash_dedup"):
        t0 = time.time()
        q.queries()[name](SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    result = {
        "metric": "el_linkage_sec",
        "value": round(el_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "n_answers": n_answers,
        "n_pairs": n_pairs,
        "turns_per_sec": round(n_turns / el_sec, 1),
        "pairs_scored_per_sec": round(n_pairs / score_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Identical EL job in two fresh processes at 8 and 32 CPUs on the
    same input (the sandbox proxy for N vs 4N nodes). Uses the
    compute-dominant bench32 fixture scale (38.4M turns) so the
    measurement reflects parallel work, not per-session fixed costs:
    strong-scaling efficiency is workload-relative, and after the r02
    speedups the smaller bench8 job finishes in ~5s of parallel compute
    at 32 CPUs — below the ~8s of fixed driver/orchestration overhead,
    so it measures the constant, not the scaling. Generated once,
    cached; set EL_SCALING_SCALE to override (BASELINE.md records both
    scales)."""
    scale = os.environ.get("EL_SCALING_SCALE", "bench32")

    from el.fixtures import ensure_fixture

    ensure_fixture(scale)  # generate before timing anything

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_MODE="el",
                   EL_FIXTURE_SCALE=scale)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    trials = int(os.environ.get("EL_SCALING_TRIALS", "2"))
    lo, hi = 8, 32
    # this sandbox shares its host with other tenants (load spikes of
    # 10+ cores appear mid-run); min-of-N per arm isolates OUR cost,
    # and INTERLEAVING the arms (lo,hi,lo,hi) spreads a spike across
    # both instead of sinking one arm's every trial
    runs_lo, runs_hi = [], []
    for _ in range(trials):
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    # two-point decomposition t = OH + C/n: the per-run fixed cost OH
    # (exchange aggregator startup, driver contracted-graph work) and
    # the parallel compute C; projected efficiency shows the same job on
    # a 10x workload, where OH amortizes (labeled extrapolation)
    c_par = (r_lo["value"] - r_hi["value"]) * (lo * hi) / (hi - lo)
    oh = max(0.0, r_lo["value"] - c_par / lo)
    proj = ((oh + 10 * c_par / lo) / ((hi / lo) * (oh + 10 * c_par / hi))
            if c_par > 0 else 0.0)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "turns_per_sec_lo": r_lo["turns_per_sec"],
        "turns_per_sec_hi": r_hi["turns_per_sec"],
        "n_turns": r_lo["n_turns"],
        "fixture_scale": scale,
        "fixed_overhead_sec": round(oh, 1),
        "parallel_compute_cpu_sec": round(c_par, 1),
        "projected_efficiency_10x": round(proj, 3),
        "stages_lo": r_lo.get("stages", {}),
        "stages_hi": r_hi.get("stages", {}),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
