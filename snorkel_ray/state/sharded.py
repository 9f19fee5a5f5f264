"""Shard-level resumable execution — per-partition lineage + metrics.

North rule: "every stage checkpoints per-partition lineage and counters
so runs resume mid-pipeline" and "write partitioned output (one
directory per input shard) so a failed run can skip finished
partitions".  `state/checkpoint.py` gives stage-level resume; this
module adds the shard dimension: the INPUT is split into deterministic
hash-of-url shards, each shard runs the whole per-shard portion of the
pipeline independently and writes its own output directory atomically
(tmp → rename) with a `_manifest.json` carrying the shard's lineage
fingerprint and counters (rows in/out, wall seconds, rows/s).  A rerun
recomputes only shards whose manifest is missing or whose fingerprint
changed.  Global (cross-shard) steps — label-model fit, final dedup —
run after all shards are present, reading the shard outputs.

This mirrors a 10^12-doc layout: one shard ≈ one input partition
(WARC segment / parquet file range); kill the job at shard k and the
rerun skips 0..k-1.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Callable

import pyarrow as pa

from ..functions.ids import hash64
from .checkpoint import (
    CODE_VERSION,
    fingerprint,
    load_manifest,
    write_manifest,
)


def _stabilize_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` import-stable under threads.

    This env has fsspec without aiohttp, so that module raises
    ModuleNotFoundError at import — which Ray's
    ``_is_http_filesystem`` catches.  But when two driver THREADS race
    the import, the loser sees the winner's partially-initialized
    module in sys.modules and gets a bare ImportError ("cannot import
    name HTTPFileSystem"), which Ray does NOT catch.  Pre-seeding a
    stub module with a sentinel class (nothing is an instance of it →
    the check stays False) removes the race entirely.
    """
    import sys as _sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel — never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = mod


def shard_paths(paths: list[str], num_shards: int) -> list[list[str]]:
    """File-range sharding: split a parquet file list into ``num_shards``
    disjoint groups (round-robin for size balance).  THE scale path —
    each shard reads only its own files.  Hash-sharding a Dataset
    (``shard_pages``) re-scans the full input once per shard (measured
    4x overhead at 8 shards) and exists for inputs that are not
    file-splittable."""
    groups: list[list[str]] = [[] for _ in range(num_shards)]
    for i, p in enumerate(sorted(paths)):
        groups[i % num_shards].append(p)
    return [g for g in groups if g]


def shard_input_token(paths: list[str]) -> str:
    """Lineage token for one shard's file group: sorted paths + size +
    mtime_ns per file.  Folded into the shard fingerprint so manifest
    skip-on-match is keyed to the files actually assigned to the shard."""
    parts = []
    for p in sorted(paths):
        try:
            st = os.stat(p)
            parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{p}:missing")
    return fingerprint(*parts)


def shard_pages(pages, num_shards: int):
    """Deterministic url-hash shards: list of (shard_idx, Dataset).
    Prefer ``shard_paths`` + per-shard ``read_parquet`` when the input
    is a file list — this variant filters the WHOLE input per shard."""

    def _filter(shard: int):
        def _f(b: pa.Table) -> pa.Table:
            urls = b.column("url").to_pylist()
            import numpy as np

            keep = np.fromiter(((hash64(u) % num_shards) == shard for u in urls),
                               dtype=bool, count=len(urls))
            return b.filter(pa.array(keep))

        return _f

    return [(s, pages.map_batches(_filter(s), batch_format="pyarrow"))
            for s in range(num_shards)]


def _file_shards(paths: list[str], num_shards: int, *, columns=None):
    """(idx, per-file-group read, input token) shard triples — the
    scale path shared by every sharded runner (round-5 review: three
    near-identical copies had already drifted on the columns kwarg)."""
    import ray.data as rd

    from pyarrow.fs import LocalFileSystem

    groups = shard_paths(paths, num_shards)
    return [(i, rd.read_parquet(g, filesystem=LocalFileSystem(),
                                columns=columns),
             shard_input_token(g))
            for i, g in enumerate(groups)]


def _hash_shards(pages, id_column: str, num_shards: int):
    """Hash-shard fallback on an explicit id column (full re-scan per
    shard; prefer input_paths at scale).  Row-count token per
    run_sharded_stage's fallback note."""
    tok = f"rows={pages.count()}"

    def _filter(s: int):
        def _f(b: pa.Table) -> pa.Table:
            import numpy as np

            ids = b.column(id_column).to_pylist()
            keep = np.fromiter(
                ((hash64(str(u)) % num_shards) == s for u in ids),
                dtype=bool, count=len(ids))
            return b.filter(pa.array(keep))

        return _f

    return [(s, pages.map_batches(_filter(s), batch_format="pyarrow"), tok)
            for s in range(num_shards)]


def _shard_parquet_files(dirs: list[str]) -> list[str]:
    """All shard part files, SKIPPING zero-column placeholders (an
    all-filtered shard whose schema was unknowable writes a 0-column
    empty.parquet; mixing it into one read_parquet breaks schema
    unification — round-4 review).  Raises when nothing remains."""
    import pyarrow.parquet as pq

    files = []
    for d in dirs:
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(d, f)
            if pq.ParquetFile(p).metadata.num_columns > 0:
                files.append(p)
    if not files:
        raise ValueError("every shard produced an empty, schema-less "
                         "output — nothing to read for the global step")
    return files


def run_sharded_stage(
    pages,
    root: str,
    stage_name: str,
    build: Callable,  # build(shard_dataset) -> Dataset
    *,
    num_shards: int,
    params: dict | None = None,
    input_fingerprint: str = "pages",
    shards=None,
) -> tuple[list[str], list[dict]]:
    """Run ``build`` per shard with skip-on-manifest-match.

    ``shards``: optional pre-built list of (shard_idx, Dataset) — e.g.
    per-file-group reads from ``shard_paths`` (the scale path); when
    None, falls back to hash-sharding ``pages`` (full re-scan per
    shard).  → (list of shard output dirs, per-shard manifest dicts).
    Output layout: ``<root>/<stage_name>/shard=<i>/part-*.parquet`` +
    ``_manifest.json``.
    """
    from concurrent.futures import ThreadPoolExecutor

    _stabilize_fsspec_http()
    os.makedirs(os.path.join(root, stage_name), exist_ok=True)
    if shards is not None:
        shard_list = list(shards)
    else:
        # hash-shard fallback: no file metadata exists to fingerprint,
        # so fold a cheap row-count token into each shard fingerprint —
        # a resized corpus invalidates stale manifests (round-4 review;
        # an equal-count content swap still needs the caller to version
        # input_fingerprint)
        tok = f"rows={pages.count()}"
        shard_list = [(i, d, tok) for i, d in shard_pages(pages, num_shards)]

    def _run_one(item) -> tuple[str, dict]:
        # shards may be (idx, ds) or (idx, ds, input_token); the token
        # (the shard's actual file group + sizes/mtimes, see
        # shard_input_token) folds into the fingerprint so that adding/
        # removing an input file — which shifts the round-robin file
        # assignment — invalidates every shard whose file group changed
        # instead of silently matching a stale manifest (round-1 ADVICE).
        shard, ds = item[0], item[1]
        shard_token = item[2] if len(item) > 2 else None
        fp = fingerprint(input_fingerprint, stage_name, shard, num_shards,
                         sorted((params or {}).items()), CODE_VERSION,
                         shard_token)
        final = os.path.join(root, stage_name, f"shard={shard}")
        mpath = os.path.join(final, "_manifest.json")
        m = load_manifest(mpath)  # corrupt/truncated -> recompute
        if m is not None:
            if m.get("fingerprint") == fp:
                m["skipped"] = True
                return final, m
            shutil.rmtree(final)
        elif os.path.exists(final):
            shutil.rmtree(final)
        from .checkpoint import atomic_stage_write

        t0 = time.perf_counter()
        out = build(ds)
        rows = atomic_stage_write(out, final)
        wall = time.perf_counter() - t0
        m = {
            "fingerprint": fp,
            "stage": stage_name,
            "shard": shard,
            "num_shards": num_shards,
            "rows": rows,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "code_version": CODE_VERSION,
            "skipped": False,
        }
        write_manifest(mpath, m)
        return final, m

    # a few shard pipelines in flight keeps the cluster busy through
    # each shard's serial tail (fit/finalize); each runs in its own
    # driver thread — Ray Datasets execute independently per thread
    with ThreadPoolExecutor(max_workers=min(4, len(shard_list) or 1)) as ex:
        results = list(ex.map(_run_one, shard_list))
    dirs = [d for d, _ in results]
    manifests = [m for _, m in results]
    return dirs, manifests


def run_kg_pipeline_sharded(
    pages,
    alias_table: pa.Table,
    facts=None,
    *,
    root: str,
    num_shards: int = 4,
    lang: str = "en",
    threshold: float = 0.5,
    cooccur_pred: str | None = None,
    cooccur_gap: int = 3,
    input_fingerprint: str = "pages",
    input_paths: list[str] | None = None,
):
    """Shard-resumable flagship pipeline.

    Per shard: lang filter → extract → sentences → candidates → LFs →
    parquet (`labeled/shard=i/`).  Global: pattern counts over all
    shard outputs → EM fit → score+link+materialize (also resumable at
    stage level via the final manifest).  → (triples Dataset, report).
    """
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    from ..stages.candidates import extract_candidates_fused
    from ..stages.extract import extract_docs
    from ..stages.label_model import fit_label_model, pattern_counts, score_marginals
    from ..stages.labeling import apply_lfs
    from ..stages.linking import build_link_index
    from ..stages.materialize import link_candidates, materialize_triples

    from .checkpoint import fingerprint as _fp
    from .resources import broadcast_key

    alias_ref = ray.put(alias_table)
    kb_ref = ray.put({"facts": [tuple(f) for f in (facts or [])],
                      "link_index": build_link_index(alias_table)}) if facts else None
    # content digest of the broadcast KB inputs — they determine the
    # shard outputs (candidates + DS-LF votes), so an edited alias
    # table / fact set must invalidate shard checkpoints exactly as it
    # does the streaming pipeline's stages (pipelines/kg.py kb_fp,
    # round-4 review; the sharded runner missed the same fix —
    # round-5 review)
    kb_fp = _fp(broadcast_key(alias_table),
                sorted(tuple(f) for f in (facts or [])))

    def build(shard_ds):
        filtered = shard_ds.map_batches(
            lambda b: b.filter(pc.equal(b.column("lang"), lang)),
            batch_format="pyarrow")
        return apply_lfs(
            extract_candidates_fused(extract_docs(filtered), alias_ref,
                                     cooccur_pred=cooccur_pred,
                                     cooccur_gap=cooccur_gap),
            kb_ref)

    shards = None
    if input_paths is not None:
        shards = _file_shards(input_paths, num_shards)

    dirs, manifests = run_sharded_stage(
        pages, root, "labeled", build, num_shards=num_shards,
        params={"lang": lang, "lfs": "kg_v1", "cooccur_pred": cooccur_pred,
                "cooccur_gap": cooccur_gap, "kb_fp": kb_fp},
        input_fingerprint=input_fingerprint, shards=shards)

    files = _shard_parquet_files(dirs)
    labeled = rd.read_parquet(files)
    model = fit_label_model(pattern_counts(labeled))
    scored = score_marginals(labeled, model)
    linked = link_candidates(scored, alias_ref)
    # materialize_triples writes out_dir atomically (tmp + os.replace),
    # so a rerun REPLACES the persisted triples instead of appending a
    # duplicate part-file set (round-1 ADVICE, high)
    triples = materialize_triples(linked, threshold=threshold,
                                  out_dir=os.path.join(root, "triples"))
    return triples, {"model": model, "shards": manifests}


def run_minhash_dedup_sharded(
    pages,
    root: str,
    *,
    column: str = "text",
    id_column: str = "doc_id",
    num_shards: int = 4,
    num_perm: int = 64,
    shingle_k: int = 3,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 17,
    input_fingerprint: str = "pages",
    input_paths: list[str] | None = None,
    pin_exploded: bool = True,
):
    """Shard-resumable near-dedup (round-3 verdict item 8 — at 100 TB
    dedup must resume like the flagship already does).

    Per shard (skip-on-manifest-match via :func:`run_sharded_stage`):
    MinHash signatures only → ``minhash_sigs/shard=i/`` parquet of
    ``(id, sig)`` — num_perm × 8 bytes per doc, ≪ the corpus, and the
    expensive shingling never re-runs for finished shards.  Global:
    ONE banding pass over the persisted signatures (band-bucket
    groupby → anchor pairs), Jaccard verification against the
    original corpus, connected components, cluster map — exactly
    :func:`stages.dedup.minhash_dedup` fed with precomputed ``sigs``,
    so sharded == streaming by construction (pinned by
    test_sharded_minhash_equals_streaming).

    → (clusters Dataset ``(id, cluster)``, per-shard manifests)."""
    import ray.data as rd

    from ..stages.dedup import minhash_dedup, minhash_signatures

    def build(shard_ds):
        return minhash_signatures(shard_ds, column, id_column,
                                  num_perm=num_perm, shingle_k=shingle_k,
                                  seed=seed)

    if input_paths is not None:
        shards = _file_shards(input_paths, num_shards,
                              columns=[id_column, column])
    else:
        shards = _hash_shards(pages, id_column, num_shards)

    dirs, manifests = run_sharded_stage(
        pages, root, "minhash_sigs", build, num_shards=num_shards,
        params={"num_perm": num_perm, "shingle_k": shingle_k, "seed": seed,
                "column": column, "id_column": id_column},
        input_fingerprint=input_fingerprint, shards=shards)

    from pyarrow.fs import LocalFileSystem

    files = _shard_parquet_files(dirs)
    sigs = rd.read_parquet(files, filesystem=LocalFileSystem())
    clusters = minhash_dedup(pages, column, id_column, num_perm=num_perm,
                             shingle_k=shingle_k, bands=bands,
                             threshold=threshold, seed=seed,
                             pin_exploded=pin_exploded, sigs=sigs)
    return clusters, manifests


def run_curation_sharded(
    pages,
    root: str,
    *,
    column: str = "text",
    id_column: str = "doc_id",
    num_shards: int = 4,
    lang: str | None = None,
    min_quality: float | None = None,
    gopher: bool = False,
    needles: list[str] | None = None,
    dedup: bool = True,
    gopher_thresholds: dict | None = None,
    input_fingerprint: str = "pages",
    input_paths: list[str] | None = None,
):
    """Shard-resumable curation funnel: the MAP-ONLY annotate phase
    (lang/quality/Gopher/decontamination drop_reason stamping — the
    expensive per-document tokenization/feature work) runs per shard
    with skip-on-manifest-match and persists annotated parquet; the
    global step (exact dedup among survivors + per-reason report) runs
    over the shard outputs via :func:`pipelines.curation.curate_docs`
    with ``pre_annotated=True``, so sharded == streaming by
    construction.  → (kept Dataset, report dict, per-shard manifests).
    """
    import ray.data as rd

    from ..pipelines.curation import annotate_docs, curate_docs

    def build(shard_ds):
        # the dedup hash is computed IN the annotate phase and persisted
        # with the shard parquet, so the global step never re-pins the
        # corpus to compute it (round-4 verdict item 3)
        return annotate_docs(shard_ds, column=column, lang=lang,
                             min_quality=min_quality, gopher=gopher,
                             needles=needles,
                             gopher_thresholds=gopher_thresholds,
                             content_hash="_chash" if dedup else None)

    if input_paths is not None:
        shards = _file_shards(input_paths, num_shards)
    else:
        shards = _hash_shards(pages, id_column, num_shards)

    dirs, manifests = run_sharded_stage(
        pages, root, "curation_annotated", build, num_shards=num_shards,
        params={"lang": lang, "min_quality": min_quality, "gopher": gopher,
                "needles": sorted(needles) if needles else None,
                "gopher_thresholds": sorted((gopher_thresholds or {}).items()),
                "column": column,
                # schema change (persisted _chash) must invalidate
                # pre-round-5 shard checkpoints
                "chash": dedup},
        input_fingerprint=input_fingerprint, shards=shards)

    from pyarrow.fs import LocalFileSystem

    annotated = rd.read_parquet(_shard_parquet_files(dirs),
                                filesystem=LocalFileSystem())
    kept, report = curate_docs(annotated, column=column,
                               id_column=id_column, dedup=dedup,
                               pre_annotated=True)
    return kept, report, manifests
