"""Per-stage scaling evidence (round-1 verdict item 8).

Times CUMULATIVE prefixes of the flagship chain (read → extract →
sentences → candidates → LFs → full pipeline) at several num_cpus
levels, each level in a fresh subprocess, on one fixed on-disk corpus.
Per-stage throughput = pages / (t_prefix_k − t_prefix_{k−1}) exposes
WHICH stage stops scaling — the audit trail behind BASELINE.md's
VM-ceiling attribution for the 2-vs-8 protocol choice.

Usage:
    python scripts/stage_scaling.py              # orchestrator: 8,16,32
    python scripts/stage_scaling.py --one 16     # worker (internal)
Env: GRAFT_STAGE_PAGES (default 400000), GRAFT_STAGE_CPUS ("8,16,32").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PAGES = int(os.environ.get("GRAFT_STAGE_PAGES", "400000"))


def run_one(ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow.compute as pc
    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from snorkel_ray.pipelines.kg import run_kg_pipeline
    from snorkel_ray.stages.candidates import extract_candidates
    from snorkel_ray.stages.extract import extract_docs
    from snorkel_ray.stages.labeling import apply_lfs
    from snorkel_ray.stages.linking import build_link_index
    from snorkel_ray.synth import SYNTH_VERSION, alias_table, build_kb, pages_dataset
    from snorkel_ray.stages.sentences import split_docs_to_sentences

    kb = build_kb(42)
    at = alias_table(kb)
    path = f"/tmp/graft_bench/pages_v{SYNTH_VERSION}_{PAGES}"
    if not os.path.exists(path + ".done"):
        os.makedirs(path, exist_ok=True)
        pages_dataset(PAGES, 42).write_parquet(path)
        open(path + ".done", "w").write("ok")
    rd.read_parquet(path).count()  # warm page cache, untimed

    alias_ref = ray.put(at)
    kb_ref = ray.put({"facts": [tuple(f) for f in kb["facts"]],
                      "link_index": build_link_index(at)})
    blocks = max(ncpu * 4, PAGES // 5000)

    def pages():
        return rd.read_parquet(path, override_num_blocks=blocks)

    def lang(ds):
        return ds.map_batches(
            lambda b: b.filter(pc.equal(b.column("lang"), "en")),
            batch_format="pyarrow")

    prefixes = {
        "read": lambda: pages(),
        "+extract": lambda: extract_docs(lang(pages())),
        "+sentences": lambda: split_docs_to_sentences(extract_docs(lang(pages()))),
        "+candidates": lambda: extract_candidates(
            split_docs_to_sentences(extract_docs(lang(pages()))), alias_ref),
        "+lfs": lambda: apply_lfs(extract_candidates(
            split_docs_to_sentences(extract_docs(lang(pages()))), alias_ref), kb_ref),
    }
    out = {"num_cpus": ncpu, "pages": PAGES, "prefix_sec": {}, "stage_sec": {},
           "stage_pages_per_sec": {}}
    prev = 0.0
    for name, build in prefixes.items():
        t0 = time.perf_counter()
        build().count()
        t = time.perf_counter() - t0
        out["prefix_sec"][name] = round(t, 2)
        dt = max(t - prev, 1e-6)
        out["stage_sec"][name] = round(dt, 2)
        out["stage_pages_per_sec"][name] = round(PAGES / dt, 1)
        prev = t

    t0 = time.perf_counter()
    triples, _ = run_kg_pipeline(pages(), at, kb["facts"], fit_sample_rows=20_000)
    triples.count()
    t = time.perf_counter() - t0
    out["prefix_sec"]["full_pipeline"] = round(t, 2)
    out["stage_sec"]["fit+score+link+materialize"] = \
        round(max(t - out["prefix_sec"]["+lfs"], 1e-6), 2)
    out["pipeline_pages_per_sec"] = round(PAGES / t, 1)
    ray.shutdown()
    return out


def main() -> None:
    if "--one" in sys.argv:
        ncpu = int(sys.argv[sys.argv.index("--one") + 1])
        print(json.dumps(run_one(ncpu)))
        return
    cpus = [int(c) for c in os.environ.get("GRAFT_STAGE_CPUS", "8,16,32").split(",")]
    rows = []
    for c in cpus:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), "--one", str(c)],
                           capture_output=True, text=True, check=True)
        rows.append(json.loads(r.stdout.strip().splitlines()[-1]))
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
