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


def _install_empty_schema_filter() -> None:
    """Silence Ray's schema-drift warning ONLY for the empty-partition
    artifact: a 0-row map output loses its schema inside Ray's
    MapOperator (observed through ray 2.49) even when the fn returns a
    typed empty table, so any tiny-key hash exchange (3-key lineitem
    merge, ann per-query merge) logs one spurious '... new schema: .'
    line per empty partition. REAL drift — a non-empty differing
    schema — still logs."""
    import logging

    class _F(logging.Filter):
        def filter(self, rec: logging.LogRecord) -> bool:
            msg = rec.getMessage()
            return not ("different schema" in msg
                        and "new schema: ." in msg)

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_F())
# "full" runs EL + ops queries; "el" runs only the EL pipeline (used by
# --scaling, which measures it on a compute-dominant fixture scale)
BENCH_MODE = os.environ.get("BENCH_MODE", "full")
EL_FIXTURE_SCALE = os.environ.get("EL_FIXTURE_SCALE")  # override sf-derived


def run_bench() -> dict:
    import ray

    from el.fixtures import ensure_fixture

    load_at_start = [round(x, 2) for x in os.getloadavg()]
    fixture = ensure_fixture(EL_FIXTURE_SCALE or SF_DIR)  # cached on disk

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    _install_empty_schema_filter()
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    # warm the page cache so we measure compute + shuffle, not cold disk
    ray.data.read_parquet(os.path.join(fixture, "transcripts.parquet")).count()

    from el.pipeline import run_linkage

    timings: dict[str, float] = {}
    # per-row 1-min host load at [start, end]: a noisy neighbor spike
    # is then attributable to the specific row it inflated
    row_loads: dict[str, list] = {}
    # min-of-N headline rows (the --scaling protocol, VERDICT r04 #2):
    # one neighbor-load spike should not define the round's number.
    # BENCH_MODE="el" stays single-run — --scaling already min-of-Ns
    # across fresh processes.
    trials = (1 if BENCH_MODE == "el"
              else int(os.environ.get("BENCH_TRIALS", "2")))

    el_sec, stage_timings, n_answers = float("inf"), {}, 0
    el_load0 = round(os.getloadavg()[0], 2)
    for _ in range(trials):
        t0 = time.time()
        st: dict = {}
        answers = run_linkage(fixture, timings=st)
        n = answers.count()
        sec = time.time() - t0
        if sec < el_sec:
            el_sec, stage_timings, n_answers = sec, st, n
    timings["el_linkage"] = round(el_sec, 3)
    row_loads["el_linkage"] = [el_load0, round(os.getloadavg()[0], 2)]

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

    score_sec = float("inf")
    row_loads["pair_scoring"] = [round(os.getloadavg()[0], 2)]
    for _ in range(trials):
        t0 = time.time()
        pairs.map_batches(score_pairs_batch, batch_format="pyarrow",
                          batch_size=4096).count()
        score_sec = min(score_sec, time.time() - t0)
    timings["pair_scoring"] = round(score_sec, 3)
    row_loads["pair_scoring"].append(round(os.getloadavg()[0], 2))

    # training-data ops over the sf tables
    from el import queries as q

    for name in ("lineitem_pricing", "events_hourly", "exact_dedup",
                 "token_count", "ann_topk", "minhash_dedup"):
        best = float("inf")
        row_loads[name] = [round(os.getloadavg()[0], 2)]
        for _ in range(trials):
            t0 = time.time()
            q.queries()[name](SF_DIR).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        row_loads[name].append(round(os.getloadavg()[0], 2))

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
        # neighbor load on this shared host inflates wall times 2-5x
        # (BASELINE.md "Measurement discipline"); record it so a noisy
        # run is distinguishable from a regression
        "host_load_avg_at_start": load_at_start,
        "host_load_avg_at_end": [round(x, 2) for x in os.getloadavg()],
        "trials_per_row": trials,
        # 1-min load at each row's [start, end]
        "row_loads": row_loads,
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
    # arms are configurable; the default 2v8 measures the SAME 4x
    # parallelism ratio (N vs 4N) where per-arm compute dominates the
    # per-run fixed overhead — the valid evidence on this host, whose
    # measured pure-CPU oversubscription ceiling for an 8->32 arm is
    # 0.34-0.57 (`--host-ceiling`; BASELINE.md §3 reports both arms
    # and the decomposition). EL_SCALING_CPUS="8,32" restores the
    # host-ceiling-bound pair.
    lo, hi = (int(x) for x in
              os.environ.get("EL_SCALING_CPUS", "2,8").split(","))
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


def run_weak_scaling() -> dict:
    """WEAK-scaling proxy: the same per-CPU workload at two cluster
    sizes — bench8 (9.6M turns) vs bench32 (38.4M turns, 4x) on a 4x
    CPU ratio, fresh processes. This is the closest sandbox analog to
    how a real 100-TB deployment grows (add nodes WITH data, not nodes
    against a fixed corpus); ideal efficiency is wall-time parity.
    EL_WEAK_CPUS picks the arms (default "8,32"; "2,8" measures the
    same 4x ratio below this host's 8->32 pure-CPU oversubscription
    ceiling — see --host-ceiling — the same convention as --scaling's
    default arms)."""
    from el.fixtures import ensure_fixture

    def one(ncpu: int, scale: str) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_MODE="el",
                   EL_FIXTURE_SCALE=scale)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = (int(x) for x in
              os.environ.get("EL_WEAK_CPUS", "8,32").split(","))
    ensure_fixture("bench8")
    ensure_fixture("bench32")
    trials = int(os.environ.get("EL_SCALING_TRIALS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(trials):  # interleaved (see run_scaling)
        runs_lo.append(one(lo, "bench8"))
        runs_hi.append(one(hi, "bench32"))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    return {
        "metric": "weak_scaling_efficiency",
        # ideal = 1.0 (equal wall time for 4x data on 4x CPUs)
        "value": round(r_lo["value"] / r_hi["value"], 3),
        "unit": "ratio",
        "cpus_lo": lo, "cpus_hi": hi,
        "n_turns_lo": r_lo["n_turns"], "n_turns_hi": r_hi["n_turns"],
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "turns_per_sec_lo": r_lo["turns_per_sec"],
        "turns_per_sec_hi": r_hi["turns_per_sec"],
        "stages_lo": r_lo.get("stages", {}),
        "stages_hi": r_hi.get("stages", {}),
    }


def run_host_ceiling() -> dict:
    """Control experiment for interpreting strong-scaling numbers on
    this shared host: 64 identical PURE-CPU Ray tasks (no I/O, no
    memory pressure) at 8 vs 32 CPUs in fresh sessions. On dedicated
    hardware this scales ~4x; here it measures the oversubscription /
    steal-time ceiling that bounds ANY job's 8->32 efficiency
    (baseline steal ~6 percent at idle, spiking with neighbor load).
    BASELINE.md cites this next to the pipeline's efficiency."""

    def one(ncpu: int) -> float:
        code = (
            "import time, ray, json\n"
            f"ray.init(address='local', num_cpus={ncpu}, "
            "include_dashboard=False, logging_level='ERROR')\n"
            "@ray.remote\n"
            "def spin(n):\n"
            "    s = 0.0; x = 1.0000001\n"
            "    for i in range(n):\n"
            "        x = x * 1.0000001 % 1.7; s += x\n"
            "    return s\n"
            "t0 = time.time()\n"
            "ray.get([spin.remote(4_000_000) for _ in range(64)])\n"
            "print(json.dumps(time.time() - t0))\n"
            "ray.shutdown()\n"
        )
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, check=True)
        return float(out.stdout.strip().splitlines()[-1])

    trials = int(os.environ.get("EL_SCALING_TRIALS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(trials):  # interleaved, like run_scaling
        runs_lo.append(one(8))
        runs_hi.append(one(32))
    s_lo, s_hi = min(runs_lo), min(runs_hi)
    return {
        "metric": "host_cpu_ceiling_efficiency",
        "value": round((s_lo / s_hi) / 4.0, 3),
        "unit": "ratio",
        "cpus_lo": 8, "cpus_hi": 32,
        "sec_lo": round(s_lo, 2), "sec_hi": round(s_hi, 2),
        "note": "pure-CPU Ray tasks; bounds any job's 8->32 efficiency "
                "on this oversubscribed sandbox host",
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--weak-scaling" in sys.argv:
        print(json.dumps(run_weak_scaling()))
    elif "--host-ceiling" in sys.argv:
        print(json.dumps(run_host_ceiling()))
    else:
        print(json.dumps(run_bench()))
