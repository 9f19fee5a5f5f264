"""Shard-level resume tests (north rule: per-partition lineage +
counters; FIXTURES.md F7 generalized to the shard dimension)."""

import json
import os
import shutil

import pyarrow as pa

from snorkel_ray.state.sharded import run_kg_pipeline_sharded, shard_pages
from snorkel_ray.synth import alias_table, build_kb, expected_triples, pages_dataset


def test_shard_partition_is_complete_and_disjoint(ray_session):
    pages = pages_dataset(100, 42)
    shards = shard_pages(pages, 4)
    urls = []
    for _, ds in shards:
        urls.extend(ds.to_pandas()["url"].tolist())
    assert len(urls) == 100 and len(set(urls)) == 100


def test_sharded_pipeline_and_resume(ray_session, tmp_path):
    kb = build_kb(42)
    root = str(tmp_path / "sharded")
    args = (pages_dataset(150, 42), alias_table(kb), kb["facts"])

    t1, r1 = run_kg_pipeline_sharded(*args, root=root, num_shards=3)
    df1 = t1.to_pandas()
    assert all(not m["skipped"] for m in r1["shards"])
    # per-shard manifests carry lineage + counters
    for m in r1["shards"]:
        assert m["rows"] > 0 and m["wall_sec"] > 0 and m["rows_per_sec"] > 0
        mp = os.path.join(root, "labeled", f"shard={m['shard']}", "_manifest.json")
        assert json.load(open(mp))["fingerprint"] == m["fingerprint"]

    # full rerun: every shard skips, output identical
    t2, r2 = run_kg_pipeline_sharded(*args, root=root, num_shards=3)
    assert all(m["skipped"] for m in r2["shards"])
    assert t2.to_pandas().equals(df1)

    # kill-mid-run simulation: delete shard 1 and 2 -> only those rerun
    shutil.rmtree(os.path.join(root, "labeled", "shard=1"))
    shutil.rmtree(os.path.join(root, "labeled", "shard=2"))
    t3, r3 = run_kg_pipeline_sharded(*args, root=root, num_shards=3)
    flags = {m["shard"]: m["skipped"] for m in r3["shards"]}
    assert flags == {0: True, 1: False, 2: False}
    assert t3.to_pandas().equals(df1)

    # quality: the sharded path matches the planted goldens too
    got = set(zip(df1["subj_qid"], df1["pred"], df1["obj_qid"]))
    exp_t = expected_triples(150, 42)
    exp = set(zip(*(exp_t.column(c).to_pylist()
                    for c in ("subj_qid", "pred", "obj_qid"))))
    assert len(got & exp) / max(len(exp), 1) >= 0.95
    assert len(got & exp) / max(len(got), 1) >= 0.95
