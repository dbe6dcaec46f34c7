"""Benchmark driver. Prints ONE JSON line:

{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

Headline = the input_hint pipeline: deterministic Common-Crawl-style HTML
corpus (fixtures) → full inverted-index build (extract → SPM tokenize →
postings shuffle → compressed block-max segments) → BM25 WAND query set.
Also times every documents/embeddings operator pipeline over $GRAFT_SF_DIR.

--scaling runs the headline build twice in FRESH processes
(num_cpus=8 then num_cpus=32 by default; BENCH_SCALING_CPUS="4,16"
picks another N,4N pair — same input) and reports both throughputs
plus efficiency = (rate_hi / rate_lo) / (hi/lo)  (sandbox proxy for N
vs 4N nodes; BASELINE.json north_rule ≥ 0.8).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CORPUS_DOCS = int(os.environ.get("BENCH_CORPUS_DOCS", "32000"))
# scaling runs need enough work that fixed per-job overhead (~6 s: actor
# spawn, shuffle barriers, driver planning) amortizes at 32 CPUs
SCALING_DOCS = int(os.environ.get("BENCH_SCALING_DOCS", "128000"))
# the two parallelism levels for the N -> 4N criterion; 8,32 default.
# On this VM 32 workers are oversubscribed in contended windows (the
# pure-CPU ceiling itself drops to ~0.68) -- BENCH_SCALING_CPUS="4,16"
# measures the same 4x ratio on a pair the host can actually provision.
SCALING_CPUS = tuple(
    int(x) for x in os.environ.get("BENCH_SCALING_CPUS", "8,32").split(",")
)
CORPUS_FILES = 16


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _fixture_corpus(n_docs: int) -> list[str]:
    from pears_lite_ray.sources.fixtures import corpus_cache_dir

    d = corpus_cache_dir(n_docs)
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def headline_build(n_docs: int = CORPUS_DOCS) -> dict:
    """Fixture-HTML-corpus build + BM25 query evaluation; returns timings."""
    from pears_lite_ray.config import BuildConfig
    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.query.engine import QueryEngine
    from pears_lite_ray.sources.fixtures import generate_queries

    paths = _fixture_corpus(n_docs)
    out = tempfile.mkdtemp(prefix="pears_bench_idx_")
    try:
        t0 = time.perf_counter()
        report = build_index(paths, BuildConfig(out_dir=out))
        build_sec = time.perf_counter() - t0

        eng = QueryEngine(out, mode="bm25")
        queries = generate_queries()
        qs = list(zip(queries["query"].to_pylist(), queries["k"].to_pylist()))

        # cold/warm split: the FIRST query on a fresh engine pays shard
        # footer parses + first row-group reads; report it separately,
        # then hoist the remaining footer cost (warmup) and measure the
        # steady state the p50/p95 numbers should describe
        t0 = time.perf_counter()
        eng.search_scores(qs[0][0], int(qs[0][1]))
        cold_first_ms = 1000 * (time.perf_counter() - t0)
        eng.warmup()
        # warm pass = first full pass after footer warmup (pays the
        # decoded-postings cache fill); steady pass = second pass, the
        # repeated-workload latency the hot-term cache is for
        lat = []
        for q, k in qs:
            t0 = time.perf_counter()
            eng.search_scores(q, int(k))
            lat.append(time.perf_counter() - t0)
        lat.sort()
        steady = []
        for q, k in qs:
            t0 = time.perf_counter()
            eng.search_scores(q, int(k))
            steady.append(time.perf_counter() - t0)
        steady.sort()
        return {
            "build_sec": round(build_sec, 3),
            "n_docs": report["n_docs"],
            "docs_per_sec": round(report["n_docs"] / build_sec, 1),
            "postings_per_sec": round(report["total_postings"] / build_sec, 1),
            "query_cold_first_ms": round(cold_first_ms, 3),
            "query_warm_p50_ms": round(1000 * lat[len(lat) // 2], 3),
            "query_warm_p95_ms": round(1000 * lat[int(len(lat) * 0.95)], 3),
            "query_steady_p50_ms": round(1000 * steady[len(steady) // 2], 3),
            "query_steady_p95_ms": round(1000 * steady[int(len(steady) * 0.95)], 3),
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def run_pipeline_suite(sf_dir: str) -> dict[str, float]:
    """Time every driver-facing operator pipeline at sf_dir."""
    import __ray_entry__ as entrymod

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        res = fn(sf_dir)
        # materialize lazy datasets so the timing covers execution
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            res.count()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def _burn(_):
    import time as _t

    t0 = _t.perf_counter()
    x = 0
    for i in range(30_000_000):
        x += i * i
    return _t.perf_counter() - t0


def _hardware_ceiling(lo: int = 8, hi: int = 32) -> float:
    """This machine's own lo→hi-process scaling for a pure-CPU loop —
    median of 3 (instantaneous host contention on the virtualized cores
    makes single samples swing 0.5-1.0; the builds themselves average over
    minutes and sit near ~0.7). No distributed software can exceed this
    between ``ray.init(num_cpus=8)`` and ``num_cpus=32`` on one box."""
    import multiprocessing as mp

    effs = []
    for _ in range(3):
        rates = {}
        for n in (lo, hi):
            with mp.Pool(n) as p:
                t0 = time.perf_counter()
                p.map(_burn, range(n * 2))
                rates[n] = (n * 2) / (time.perf_counter() - t0)
        effs.append((rates[hi] / rates[lo]) / (hi / lo))
    return round(sorted(effs)[1], 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scale-child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--cpus", type=int, default=NUM_CPUS)
    args = ap.parse_args()

    if args.scale_child:
        _init_ray(args.cpus)
        res = headline_build(SCALING_DOCS)
        print(json.dumps(res | {"num_cpus": args.cpus}))
        return

    if args.scaling:
        lo, hi = SCALING_CPUS
        ceiling = _hardware_ceiling(lo, hi)
        # INTERLEAVED legs (8, 32, 8, 32 — fresh processes): this VM's
        # throughput drifts over minutes, so back-to-back single legs bias
        # the ratio; interleaving cancels linear drift and the per-level
        # median bounds a one-off outlier.
        legs: dict[int, list] = {lo: [], hi: []}
        detail = []
        rounds = int(os.environ.get("BENCH_SCALING_ROUNDS", "2"))
        for _ in range(rounds):
            for cpus in (lo, hi):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--scale-child", "--cpus", str(cpus)],
                    capture_output=True, text=True, check=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                out = json.loads(p.stdout.strip().splitlines()[-1])
                legs[cpus].append(out["docs_per_sec"])
                detail.append(out)
        med = {c: sorted(v)[len(v) // 2] if len(v) % 2 else
               sum(sorted(v)[len(v) // 2 - 1:len(v) // 2 + 1]) / 2
               for c, v in legs.items()}
        eff = (med[hi] / med[lo]) / (hi / lo)
        print(json.dumps({
            "metric": f"index-build scaling efficiency ({lo} → {hi} CPUs, "
                      "fresh clusters, interleaved A/B/A/B legs)",
            "value": round(eff, 3),
            "unit": "efficiency",
            f"rate_{lo}cpu_docs_per_sec": med[lo],
            f"rate_{hi}cpu_docs_per_sec": med[hi],
            f"legs_{lo}cpu": legs[lo],
            f"legs_{hi}cpu": legs[hi],
            # this sandbox VM's own 8→32-process CPU scaling for a pure
            # compute loop — the ceiling any software can reach here
            "hardware_ceiling_efficiency": ceiling,
            "normalized_efficiency": round(eff / ceiling, 3) if ceiling else None,
            "detail": detail,
            "corpus_docs": SCALING_DOCS,
        }))
        return

    _init_ray(args.cpus)
    t_total = time.perf_counter()
    head = headline_build()
    suite = run_pipeline_suite(SF_DIR)
    total = round(time.perf_counter() - t_total, 3)
    queries = {"index_build_and_query": head["build_sec"]} | suite
    # window calibration: this VM's throughput swings ±2-3× between
    # wall-clock windows (hypervisor sharing, invisible to loadavg). A
    # fixed single-process burn stamped into every run lets readers
    # normalize totals across windows: suite seconds scale ~linearly with
    # burn_1p_sec on the same commit (measured r3: 20.9 s vs 39.9 s
    # headline on identical code).
    print(json.dumps({
        "metric": "index-build + BM25 query + operator-suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": args.cpus,
        "headline": head,
        "calibration_burn_1p_sec": round(_burn(0), 3),
        # entries past the driver correctness gate's 50-row window this
        # round (each has a driver-green row from the previous round and a
        # local re-verification; listed so the exemption is visible)
        "driver_window_displaced": _displaced(),
    }))


def _displaced() -> list[str]:
    from pears_lite_ray.pipelines import driver_window_displaced

    return driver_window_displaced()


if __name__ == "__main__":
    main()
    import ray

    if ray.is_initialized():
        ray.shutdown()
