"""Production entry point for the KG pipeline — the `ray job submit` target.

On a real cluster:

    ray job submit --working-dir . -- \\
        python scripts/run_pipeline.py \\
            --input  s3://bucket/cc-pages/          \\
            --alias  s3://bucket/alias_dict.parquet \\
            --output /mnt/shared/kg/run1            \\
            --shards 4096

Local (this sandbox): omit --address; ray.init(address="local").
Resumable: rerunning with the same --output skips finished shards
(per-partition manifests; see snorkel_ray/state/sharded.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Ray WORKER processes do not inherit driver-side sys.path edits; the
# repo must be on PYTHONPATH BEFORE ray.init so workers can deserialize
# snorkel_ray closures (on a real cluster, ship it via
# `ray job submit --working-dir .` instead).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet dir/file(s) of pages (url, warc_ts, html, text, lang)")
    ap.add_argument("--alias", required=True, help="alias dict parquet "
                    "(alias, entity_qid, prior)")
    ap.add_argument("--facts", default=None,
                    help="optional KB facts parquet (subj_qid, pred, obj_qid) "
                         "for distant-supervision LFs")
    ap.add_argument("--output", required=True, help="checkpoint + output root")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (ignored on a cluster)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from snorkel_ray.state.sharded import run_kg_pipeline_sharded

    alias = pq.read_table(args.alias)
    facts = None
    if args.facts:
        ft = pq.read_table(args.facts)
        facts = list(zip(ft.column("subj_qid").to_pylist(),
                         ft.column("pred").to_pylist(),
                         ft.column("obj_qid").to_pylist()))

    t0 = time.perf_counter()
    # file-range sharding when the input is a directory of parquet
    # files (each shard reads only its files); hash-shard fallback for
    # a single file
    input_paths = None
    if os.path.isdir(args.input):
        input_paths = [os.path.join(args.input, f)
                       for f in sorted(os.listdir(args.input))
                       if f.endswith(".parquet")] or None
    pages = rd.read_parquet(args.input)
    triples, report = run_kg_pipeline_sharded(
        pages, alias, facts, root=args.output, num_shards=args.shards,
        lang=args.lang, threshold=args.threshold,
        input_fingerprint=str(args.input), input_paths=input_paths)
    n = triples.count()
    wall = time.perf_counter() - t0
    skipped = sum(1 for m in report["shards"] if m["skipped"])
    print(json.dumps({
        "triples": n,
        "wall_sec": round(wall, 1),
        "shards": args.shards,
        "shards_skipped": skipped,
        "output": args.output,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
