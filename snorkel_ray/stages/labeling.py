"""Labeling-function application (SURVEY.md A1 + §2.10).

Reference: ``LabelAnnotator(lfs=[...])`` (``snorkel/annotations.py``
≈L60–150) runs each LF ``f(candidate) -> {-1,0,+1}`` per candidate row
and materializes a sparse EAV ``Label`` table, pivoted to a
``csr_AnnotationMatrix`` in driver memory.  Here LFs are VECTORIZED
batch functions (numpy over Arrow columns) applied in one stateless
``map_batches``; the matrix is a dense ``list<int8>`` column ``L``
appended to the candidate rows (K is fixed once the LF set is fixed —
the same assumption the reference's matrix builder makes), so no EAV,
no pivot, no driver materialization.

Two UDF surfaces (the reference's primary extension point):
- ``@labeling_function`` — vectorized: ``f(batch_dict) -> np.int8[n]``
  where ``batch_dict`` maps column name -> numpy array / list.
- ``row_lf`` — adapter wrapping a per-row ``f(row_namespace) -> int``
  for users who want reference-style per-candidate LFs (slower; fine
  for small LF sets, documented as the non-hot path).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ..functions.predicates import NEGATION

LFRegistry = dict[str, Callable]
_REGISTRY: LFRegistry = {}


def labeling_function(name: str | None = None, registry: LFRegistry | None = None):
    """Decorator: register a vectorized LF ``f(cols) -> np.int8 array``."""

    def deco(fn):
        (_REGISTRY if registry is None else registry)[name or fn.__name__] = fn
        return fn

    return deco


def row_lf(fn: Callable) -> Callable:
    """Wrap a per-row LF (reference style) into a vectorized one."""

    class _Row:
        __slots__ = ("_cols", "_i")

        def __init__(self, cols, i):
            self._cols, self._i = cols, i

        def __getattr__(self, k):
            return self._cols[k][self._i]

    def vec(cols: dict) -> np.ndarray:
        n = len(next(iter(cols.values())))
        out = np.zeros(n, dtype=np.int8)
        for i in range(n):
            out[i] = fn(_Row(cols, i))
        return out

    vec.__name__ = fn.__name__
    return vec


# ---------------------------------------------------------------------------
# Built-in KG labeling functions (the flagship LF set, K = 8)
# ---------------------------------------------------------------------------

def _contains(strings: list[str], rgx) -> np.ndarray:
    return np.fromiter((rgx.search(s) is not None for s in strings), dtype=bool,
                       count=len(strings))


def make_kg_lfs(facts: set[tuple[str, str, str]] | None,
                link_index: dict[str, tuple[str, float]] | None) -> LFRegistry:
    """The built-in LF set. ``facts``/``link_index`` back the
    distant-supervision LFs (CDR-tutorial pattern: KB dict membership);
    pass None to disable those two (they then always abstain)."""
    lfs: LFRegistry = {}
    reg = labeling_function  # local alias

    @reg("lf_trigger", lfs)
    def lf_trigger(c):
        return np.where(np.asarray([p != "" for p in c["pred"]]), 1, 0).astype(np.int8)

    @reg("lf_negation", lfs)
    def lf_negation(c):
        neg = _contains(c["between_text"], NEGATION) | _contains(c["pre_text"], NEGATION)
        return np.where(neg, -1, 0).astype(np.int8)

    @reg("lf_far_apart", lfs)
    def lf_far_apart(c):
        gap = np.asarray(c["gap"])
        return np.where(gap > 10, -1, 0).astype(np.int8)

    @reg("lf_close_trigger", lfs)
    def lf_close_trigger(c):
        has = np.asarray([p != "" for p in c["pred"]])
        gap = np.asarray(c["gap"])
        return np.where(has & (gap <= 6), 1, 0).astype(np.int8)

    @reg("lf_no_trigger", lfs)
    def lf_no_trigger(c):
        return np.where(np.asarray([p == "" for p in c["pred"]]), -1, 0).astype(np.int8)

    @reg("lf_report_cue", lfs)
    def lf_report_cue(c):
        cue = np.fromiter(("appeared in a report about" in s for s in c["sent_text"]),
                          dtype=bool, count=len(c["sent_text"]))
        return np.where(cue, -1, 0).astype(np.int8)

    @reg("lf_ds_known_pair", lfs)
    def lf_ds_known_pair(c):
        if facts is None or link_index is None:
            return np.zeros(len(c["pred"]), dtype=np.int8)
        out = np.zeros(len(c["pred"]), dtype=np.int8)
        for i, (sk, p, ok) in enumerate(zip(c["subj_key"], c["pred"], c["obj_key"])):
            if not p:
                continue
            s = link_index.get(sk)
            o = link_index.get(ok)
            if s and o and (s[0], p, o[0]) in facts:
                out[i] = 1
        return out

    @reg("lf_ds_unknown_pair", lfs)
    def lf_ds_unknown_pair(c):
        if facts is None or link_index is None:
            return np.zeros(len(c["pred"]), dtype=np.int8)
        out = np.zeros(len(c["pred"]), dtype=np.int8)
        for i, (sk, p, ok) in enumerate(zip(c["subj_key"], c["pred"], c["obj_key"])):
            if not p:
                continue
            s = link_index.get(sk)
            o = link_index.get(ok)
            if s and o and (s[0], p, o[0]) not in facts:
                out[i] = -1
        return out

    return lfs


class LFApplier:
    """Stateless-ish ``map_batches`` callable: compiles the LF set once
    per actor (``__init__``), appends the dense vote column ``L``."""

    def __init__(self, kb_ref=None, extra_lfs: LFRegistry | None = None):
        import ray

        kb = None
        if kb_ref is not None:
            kb = kb_ref if isinstance(kb_ref, dict) else ray.get(kb_ref)
        facts = set(map(tuple, kb["facts"])) if kb else None
        link_index = kb["link_index"] if kb else None
        self.lfs = make_kg_lfs(facts, link_index)
        if extra_lfs:
            self.lfs.update(extra_lfs)
        self.lf_names = list(self.lfs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {name: batch.column(name).to_pylist() for name in
                ("pred", "between_text", "pre_text", "sent_text", "subj_key", "obj_key")}
        cols["gap"] = batch.column("gap").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        votes = np.zeros((n, len(self.lf_names)), dtype=np.int8)
        for j, name in enumerate(self.lf_names):
            v = np.asarray(self.lfs[name](cols), dtype=np.int8)
            if v.shape != (n,):
                raise ValueError(f"LF {name} returned shape {v.shape}, want ({n},)")
            votes[:, j] = v
        K = len(self.lf_names)
        offsets = pa.array(np.arange(0, (n + 1) * K, K, dtype=np.int32), pa.int32())
        L = pa.ListArray.from_arrays(offsets, pa.array(votes.reshape(-1), pa.int8()))
        return batch.append_column("L", L)


_APPLIER_CACHE: dict = {}


def apply_lfs(candidates, kb_ref=None, *, batch_size: int | None = None, concurrency=None,
              as_tasks: bool = True):
    """LF application. Default: elastic tasks with a per-worker-process
    LFApplier cache (light state — compiled LF set + broadcast KB dict);
    pass ``as_tasks=False`` for an explicit actor pool."""
    if as_tasks:
        from ..state.resources import broadcast_key

        key = broadcast_key(kb_ref)

        def _apply(batch: pa.Table) -> pa.Table:
            from ..state.resources import cache_get_or_build

            inst = cache_get_or_build(_APPLIER_CACHE, key, lambda: LFApplier(kb_ref))
            return inst(batch)

        return candidates.map_batches(_apply, batch_format="pyarrow",
                                      batch_size=batch_size)
    if concurrency is None:
        from ..state.resources import pool_concurrency

        concurrency = pool_concurrency()
    return candidates.map_batches(
        LFApplier,
        fn_constructor_args=(kb_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
