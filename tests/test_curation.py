"""Curation funnel: first-fail accounting, per-stage folds, dedup."""

import numpy as np
import pyarrow as pa
import ray

from snorkel_ray.pipelines.curation import curate_docs

GOOD = ("the quick brown fox jumps over the lazy dog while the rain "
        "falls on the quiet town and the markets open slowly near the "
        "river and people walk to work in the morning light with the ")


def _docs():
    rows = [
        # 0-3: good english docs (distinct)
        *({"doc_id": i, "text": GOOD + f"unique tail {i} town"}
          for i in range(4)),
        # 4: exact duplicate of 0 -> "duplicate"
        {"doc_id": 4, "text": GOOD + "unique tail 0 town"},
        # 5: german -> "lang"
        {"doc_id": 5, "text": "der Hund und die Katze sind in dem Haus "
                              "und der Mann geht zu der Arbeit mit dem "
                              "Auto und die Kinder spielen in dem Garten "
                              "mit den Freunden und die Frau liest ein "},
        # 6: detectably English (one "the" marker) but terrible
        # quality: punct soup + overlong words -> "quality"
        {"doc_id": 6, "text": "the " + "!!!???***###$$$ " * 30
                              + "supercalifragilistic " * 20},
        # 7: contaminated (contains the planted needle) -> "contaminated"
        {"doc_id": 7, "text": GOOD + " secret eval answer token here"},
        # 8: duplicate of a DROPPED doc's text must NOT be charged as
        # duplicate (its twin never survived) - it is its own survivor
        {"doc_id": 8, "text": GOOD + "unique tail 8 town"},
    ]
    t = pa.table({"doc_id": [r["doc_id"] for r in rows],
                  "text": [r["text"] for r in rows]})
    return ray.data.from_arrow(t).repartition(3)


def test_curation_funnel_first_fail(ray_session):
    kept, report = curate_docs(
        _docs(), lang="en", min_quality=0.3,
        needles=["secret eval answer"], dedup=True)
    assert report["n_input"] == 9
    assert report["lang"] == 1
    assert report["quality"] == 1
    assert report["contaminated"] == 1
    assert report["duplicate"] == 1
    assert report["gopher"] == 0  # stage off
    assert report["n_kept"] == 5
    got = sorted(kept.to_pandas().doc_id)
    assert got == [0, 1, 2, 3, 8]
    # schema restored: no helper columns
    assert set(kept.schema().names) == {"doc_id", "text"}


def test_curation_stages_optional(ray_session):
    # only dedup: nothing else drops
    kept, report = curate_docs(_docs(), dedup=True)
    assert report["duplicate"] == 1
    assert report["n_kept"] == 8
    assert report["lang"] == report["quality"] == 0

    # nothing enabled: identity with a report
    kept, report = curate_docs(_docs(), dedup=False)
    assert report["n_kept"] == report["n_input"] == 9
    assert kept.count() == 9


def test_curation_dedup_with_hash_range_ids(ray_session):
    """doc ids in the flagship are uint64 url hashes >= 2^63; the
    dedup winner aggregate must stay exact there (no float round-trip,
    no objectified shuffle corruption)."""
    big = np.array([2**63 + 11, 2**63 + 7, 2**53 + 1], dtype=np.uint64)
    t = pa.table({"doc_id": pa.array(big, pa.uint64()),
                  "text": ["same text", "same text", "other text"]})
    kept, report = curate_docs(
        ray.data.from_arrow(t).repartition(2), dedup=True)
    ids = sorted(kept.to_pandas().doc_id.astype(np.uint64))
    assert ids == [2**53 + 1, 2**63 + 7]  # exact min wins
    assert report["duplicate"] == 1


def test_curation_sharded_equals_streaming(ray_session, tmp_path):
    """Per-shard annotate + global dedup must yield exactly the
    streaming funnel's kept set and report, and a rerun must skip
    every annotate shard."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from snorkel_ray.state.sharded import run_curation_sharded

    rows = _docs().to_pandas()
    t = pa.Table.from_pandas(rows, preserve_index=False)
    paths = []
    for s in range(2):
        p = str(tmp_path / f"docs{s}.parquet")
        pq.write_table(t.slice(s * 5, 5 if s == 0 else 4), p)
        paths.append(p)
    pages = rd.read_parquet(paths)

    kw = dict(lang="en", min_quality=0.3,
              needles=["secret eval answer"], dedup=True)
    stream_kept, stream_report = curate_docs(pages, **kw)
    stream_report.pop("work_dir")  # streaming-only key (caller-owned dir)
    root = str(tmp_path / "cur")
    kept, report, manifests = run_curation_sharded(
        pages, root, num_shards=2, input_paths=paths, **kw)
    assert report == stream_report
    assert sorted(kept.to_pandas().doc_id) == \
        sorted(stream_kept.to_pandas().doc_id)
    assert all(not m["skipped"] for m in manifests)

    kept2, report2, manifests2 = run_curation_sharded(
        pages, root, num_shards=2, input_paths=paths, **kw)
    assert all(m["skipped"] for m in manifests2)
    assert report2 == stream_report


def test_global_step_never_pins_the_corpus(ray_session, tmp_path, monkeypatch):
    """Round-4 verdict item 3: the funnel's global step must hold no
    whole-corpus dataset in the object store.  Intercept every
    Dataset.materialize() during curate_docs over a persisted
    (pre-annotated) stage: the only permitted pin is apply_mapping's
    tiny winner mapping (columns {_chash, _winner})."""
    import ray.data as rd
    from ray.data import Dataset

    from snorkel_ray.pipelines.curation import annotate_docs, curate_docs

    docs = rd.from_items([
        {"doc_id": i, "text": f"doc body {i % 3}"} for i in range(12)])
    stage_dir = str(tmp_path / "annotated")
    annotate_docs(docs, needles=["body 2"],
                  content_hash="_chash").write_parquet(stage_dir)

    pinned: list[list[str]] = []
    orig = Dataset.materialize

    def spy(self, *a, **kw):
        pinned.append(sorted(self.schema().names))
        return orig(self, *a, **kw)

    monkeypatch.setattr(Dataset, "materialize", spy)
    kept, report = curate_docs(rd.read_parquet(stage_dir),
                               dedup=True, pre_annotated=True)
    got = kept.to_pandas()
    for cols in pinned:
        assert cols == ["_chash", "_winner"], \
            f"global step pinned a non-mapping dataset: {cols}"
    assert report["n_kept"] == len(got)
    assert report["contaminated"] == 4          # text 'doc body 2'
    assert report["duplicate"] == 6             # two distinct texts x 4 copies - winners
    assert sorted(got["doc_id"]) == [0, 1]      # min-id winner per text


def test_streaming_curate_checkpoints_to_parquet(ray_session, tmp_path):
    """Non-pre-annotated curate_docs persists the annotate pass to
    work_dir (parquet), and the result matches the report."""
    import os

    import ray.data as rd

    from snorkel_ray.pipelines.curation import curate_docs

    docs = rd.from_items([
        {"doc_id": i, "text": f"t {i % 4}"} for i in range(8)])
    wd = str(tmp_path / "stage")
    kept, report = curate_docs(docs, dedup=True, work_dir=wd)
    assert os.path.isdir(wd)
    assert any(f.endswith(".parquet") for f in os.listdir(wd))
    got = kept.to_pandas()
    assert report["n_kept"] == len(got) == 4
    assert report["duplicate"] == 4
    assert sorted(got["doc_id"]) == [0, 1, 2, 3]


def test_curate_docs_empty_and_workdir_guards(ray_session, tmp_path):
    """Round-5 review: schema-less empty pre-annotated input returns an
    empty funnel instead of AttributeError; a non-empty work_dir is
    refused (atomic_write_parquet replaces the target wholesale); the
    stage dir is handed to the caller via report['work_dir']."""
    import os

    import pytest
    import ray.data as rd

    from snorkel_ray.pipelines.curation import curate_docs

    kept, report = curate_docs(rd.from_items([]), pre_annotated=True)
    assert report["n_input"] == 0 and report["n_kept"] == 0

    busy = tmp_path / "busy"
    busy.mkdir()
    (busy / "precious.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="not empty"):
        curate_docs(rd.from_items([{"doc_id": 1, "text": "t"}]),
                    work_dir=str(busy))
    assert (busy / "precious.txt").exists()

    kept, report = curate_docs(rd.from_items([{"doc_id": 1, "text": "t"}]))
    assert os.path.isdir(report["work_dir"])
    assert kept.count() == 1
