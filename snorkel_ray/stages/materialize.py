"""Triple materialization: filter → link → dedup → sort → Parquet.

Reference analogs: candidate uniqueness via DB UNIQUE constraints
(``snorkel/models/candidate.py`` ≈L60 — here D1/D2 hash-partition +
per-group max-p witness) and the deterministic ``ORDER BY id`` fetches
(``snorkel/annotations.py`` ≈L100 — here one final sort O5, the only
place output determinism demands ordering).

Dedup is two-phase to survive skew (hot entities own ~30% of mentions):
a per-batch combiner keeps one max-p row per triple key BEFORE the
hash shuffle, so the all-to-all moves at most (distinct triples ×
blocks) rows, not the full candidate stream.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .linking import LinkerActor

TRIPLE_KEY = ["subj_qid", "pred", "obj_qid"]


class _BothLinker(LinkerActor):
    """Links both argument keys per batch (subj_ / obj_ prefixes)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        sq, ss = self.link_keys(batch.column("subj_key").to_pylist())
        oq, os_ = self.link_keys(batch.column("obj_key").to_pylist())
        batch = batch.append_column("subj_qid", pa.array(sq, pa.string()))
        batch = batch.append_column("subj_link_score", pa.array(ss, type=pa.float32()))
        batch = batch.append_column("obj_qid", pa.array(oq, pa.string()))
        batch = batch.append_column("obj_link_score", pa.array(os_, type=pa.float32()))
        return batch


_LINKER_CACHE: dict = {}


def link_candidates(scored, alias_ref, *, concurrency=None, batch_size: int | None = None,
                    as_tasks: bool = True):
    """Append subj_qid/obj_qid (+ link scores) to scored candidates.
    Default: elastic tasks with a per-worker-process linker cache (the
    alias link index is small); ``as_tasks=False`` for an actor pool."""
    if as_tasks:
        from ..state.resources import broadcast_key

        key = broadcast_key(alias_ref)

        def _link(batch: pa.Table) -> pa.Table:
            from ..state.resources import cache_get_or_build

            inst = cache_get_or_build(_LINKER_CACHE, key, lambda: _BothLinker(alias_ref))
            return inst(batch)

        return scored.map_batches(_link, batch_format="pyarrow",
                                  batch_size=batch_size)
    if concurrency is None:
        from ..state.resources import pool_concurrency

        concurrency = pool_concurrency()
    return scored.map_batches(
        _BothLinker,
        fn_constructor_args=(alias_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# dedup identity: the qid when linked, the SURFACE TEXT when not —
# distinct unlinked facts must not collapse under the shared "" qid
# (round-4 review: ('', pred, '') keyed every unlinked triple)
DEDUP_KEY = ["_dk_subj", "pred", "_dk_obj"]
_WITNESS_ORDER = DEDUP_KEY + ["p", "url", "sent_stable_id"]
_WITNESS_ASC = [True, True, True, False, True, True]
# deterministic output order; subj/obj break ties among unlinked rows
_OUT_ORDER = TRIPLE_KEY + ["subj", "obj"]


def _with_dedup_keys(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df.copy()
    df["_dk_subj"] = np.where(df["subj_qid"] != "", df["subj_qid"],
                              "t:" + df["subj"])
    df["_dk_obj"] = np.where(df["obj_qid"] != "", df["obj_qid"],
                             "t:" + df["obj"])
    return df


def _best_witness(df: pd.DataFrame) -> pd.DataFrame:
    """One row per dedup key: max p, ties broken by (url,
    sent_stable_id) — DETERMINISTIC regardless of block arrival order
    (a bare idxmax picks whichever tied witness arrived first and makes
    reruns differ in the witness columns)."""
    df = _with_dedup_keys(df)
    df = df.sort_values(_WITNESS_ORDER, ascending=_WITNESS_ASC, kind="mergesort")
    return (df.groupby(DEDUP_KEY, sort=False).head(1)
            .drop(columns=["_dk_subj", "_dk_obj"]))


def _combine_batch(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: keep the best witness per triple key."""
    if batch.num_rows == 0:
        return batch
    return pa.Table.from_pandas(_best_witness(batch.to_pandas()), preserve_index=False)


def _dedup_distributed(combined, schema: pa.Schema):
    """Vectorized distributed max-p dedup — the same Min-aggregate
    winner plan as ``dedup.exact_dedup`` (this path activates exactly
    when distinct triples number in the millions, i.e. near-singleton
    groups, where a per-group ``map_groups`` pays ~0.1 ms of pandas
    tax EACH — CLAUDE.md perf rule 5; round-4 review):

    1. per row: composite dedup key ``_dk`` + winner string ``_rk`` =
       sortkey(−p) · url · sent · base64(pickle(row)) — the prefix
       orders candidates exactly like ``_best_witness``; the payload
       suffix only decides exact (p, url, sent) ties, deterministically;
    2. ``groupby(_dk).aggregate(Min(_rk))`` — ONE shuffle of the
       combined partials, one surviving value per distinct triple;
    3. winners DECODE their payload back into the output columns.

    The winning row is decoded from the single Min value per key, so
    the plan is deterministic under lineage reconstruction (round-4
    ADVICE medium: the previous plan tagged ``_rk`` with a per-batch
    ``uuid4`` and consumed the keyed stream twice — a block
    reconstructed between the two consumptions regenerated different
    uuids and the ``_rk == _win`` equality filter silently dropped
    every row of the affected triples).  Encoding the payload into the
    aggregate also removes that plan's ``materialize()`` and winners
    map-back entirely — strictly fewer passes."""
    import base64
    import pickle

    import numpy as np

    from ray.data.aggregate import Min

    from .dedup import _sort_key_strings

    def _keys(b: pa.Table) -> pa.Table:
        df = _with_dedup_keys(b.to_pandas())
        dk = (df["_dk_subj"] + "\x1f" + df["pred"] + "\x1f"
              + df["_dk_obj"])
        neg_p = pa.array(-df["p"].to_numpy(dtype=np.float64))
        payload = df.drop(columns=["_dk_subj", "_dk_obj"])
        recs = payload.to_dict("records")
        rk = [f"{pk}\x1f{u}\x1f{s}\x1f"
              + base64.b64encode(pickle.dumps(rec)).decode()
              for pk, u, s, rec in
              zip(_sort_key_strings(neg_p), df["url"],
                  df["sent_stable_id"], recs)]
        return pa.table({"_dk": pa.array(dk.tolist(), pa.string()),
                         "_rk": pa.array(rk, pa.string())})

    keyed = combined.map_batches(_keys, batch_format="pyarrow")
    winners = keyed.groupby("_dk").aggregate(Min("_rk", alias_name="_win"))

    def _decode(b: pa.Table) -> pa.Table:
        rows = [pickle.loads(base64.b64decode(s.rsplit("\x1f", 1)[1]))
                for s in b.column("_win").to_pylist()]
        return pa.Table.from_pylist(rows, schema=schema)

    return winners.map_batches(_decode, batch_format="pyarrow")


def materialize_triples(linked, *, threshold: float = 0.5, out_dir: str | None = None,
                        small_output: bool | None = None,
                        small_output_threshold: int = 5_000_000):
    """scored+linked candidates → deduped, sorted triples Dataset
    (written to ``out_dir`` when given; partitioned parquet).

    Dedup is two-phase either way: a per-batch combiner first (keeps
    one max-p witness per triple key per batch), so at most
    (distinct triples × blocks) rows survive to the final phase.

    ``small_output=None`` (default) AUTO-SWITCHES on the combined
    partials' row count (round-2 verdict item 2: the caller should not
    have to know whether the distinct-triple set fits a driver — a
    10^12-doc KG's does not).  The partials are materialized either
    way (they are consumed in full next), so the ``count()`` is a
    metadata read, not an extra pass.

    ``small_output=True``: the combined partials (≤ distinct triples ×
    blocks rows) stream to the DRIVER for the final dedup+sort in
    pandas.  Right whenever the distinct-triple set fits driver memory
    (≲5M rows).  No AllToAll of any kind — measured on this Ray
    version, even a ``repartition(1)`` appended to a live map chain
    forces bulk materialization of the whole upstream through the
    object store (58s plan → 209s at 4 CPUs).  ``False``: the
    distributed path — hash-partition by triple key (groupby +
    per-group max-p) and range-sort.
    """

    def _project(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch.column("p"), threshold),
                       pc.not_equal(batch.column("pred"), ""))
        t = batch.filter(keep)
        return pa.table(
            {
                "subj": t.column("subj_text"),
                "pred": t.column("pred"),
                "obj": t.column("obj_text"),
                "subj_qid": t.column("subj_qid"),
                "obj_qid": t.column("obj_qid"),
                "p": t.column("p"),
                "url": t.column("url"),
                "sent_stable_id": t.column("sent_stable_id"),
            }
        )

    triples = linked.map_batches(_project, batch_format="pyarrow")
    # batch_size MUST stay None: a fixed batch_size here re-batches the
    # live fused chain (buffer + split between operators) and measured
    # 5x wall time on the 40k-page bench (1.9s -> 10.2s at 32 CPUs) —
    # per-block combining dedups nearly as well with zero rebatching
    # (CLAUDE.md perf rule 3)
    combined = triples.map_batches(_combine_batch, batch_format="pyarrow")
    if small_output is None:
        combined = combined.materialize()
        small_output = combined.count() <= small_output_threshold
    if small_output:
        import ray.data as rd

        df = combined.to_pandas()
        if len(df):
            df = _best_witness(df).sort_values(_OUT_ORDER).reset_index(drop=True)
            out = rd.from_pandas(df)
        else:  # schema-stable empty result
            from ..schemas import TRIPLES

            out = rd.from_arrow(TRIPLES.empty_table())
    else:
        # decode needs exact output types (from_pylist inference is
        # unsafe — CLAUDE.md uint64 pitfall); free when combined was
        # just materialized for the auto-switch count, a one-block
        # probe otherwise.  Schema-less empty input (explicit
        # small_output=False) gets the schema-stable empty result.
        sch = combined.schema(fetch_if_missing=True)
        if sch is None:
            import ray.data as rd

            from ..schemas import TRIPLES

            out = rd.from_arrow(TRIPLES.empty_table())
        else:
            out = _dedup_distributed(
                combined, sch.base_schema).sort(_OUT_ORDER)
    if out_dir is not None:
        from ..state.checkpoint import atomic_write_parquet

        out = atomic_write_parquet(out, out_dir)
    return out


def evaluate_triples(got: pa.Table, golden: pa.Table) -> dict:
    """P/R/F1 on distinct (subj_qid, pred, obj_qid) sets — the
    north-rule gate (reference ``MentionScorer`` /
    ``binary_scores_from_counts``, ``snorkel/learning/utils.py``
    ≈L40–250). Driver-side: triple sets are small after dedup."""

    def keyset(t: pa.Table) -> set:
        return set(zip(*(t.column(c).to_pylist() for c in TRIPLE_KEY)))

    g, e = keyset(got), keyset(golden)
    tp = len(g & e)
    p = tp / len(g) if g else 0.0
    r = tp / len(e) if e else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"tp": tp, "fp": len(g - e), "fn": len(e - g),
            "precision": p, "recall": r, "f1": f1}
