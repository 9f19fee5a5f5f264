"""Generative label model as a streaming groupby-aggregate + driver fit.

Reference: ``GenerativeModel`` (``snorkel/learning/gen_learning.py``
≈L40–700) fits per-LF accuracies by SGD over a Gibbs-sampled factor
graph (numbskull) holding the FULL label matrix in driver memory, then
``marginals(L)`` scores each candidate.  That cannot stream at 10^12
candidates.  Recast (BASELINE.json north star): the sufficient
statistics of the independent-LF model are the COUNTS OF DISTINCT VOTE
PATTERNS — with K LFs there are at most 3^K patterns and in practice a
few hundred, so:

1. [map_batches]  per-batch partial counts: pattern bytes -> n
2. [groupby-agg]  global pattern counts (tiny all-to-all: rows ≤
                  patterns × blocks, NOT candidates)
3. [driver]       exact EM over the weighted patterns (numpy) —
                  identical result to EM over all rows
4. [map_batches]  posteriors per candidate with the learned weights
                  captured in the task closure (broadcast once)

P/R ≥ 0.95 tolerance absorbs Gibbs-vs-EM estimator drift (SURVEY.md A4).

Model: y ∈ {-1,+1}, prior π = P(y=+1); per-LF accuracy
α_k = P(λ_k = y | λ_k ≠ 0) with abstain propensity independent of y
(so it cancels in the posterior).  Posterior:
P(y=+1 | λ) ∝ π · Π_{k: λ_k≠0} α_k^{[λ_k=+1]} (1-α_k)^{[λ_k=-1]}.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# 1+2: pattern-count sufficient statistics
# ---------------------------------------------------------------------------

def _pattern_counts_batch(batch: pa.Table) -> pa.Table:
    L = batch.column("L")
    flat = np.asarray(L.combine_chunks().flatten() if isinstance(L, pa.ChunkedArray)
                      else L.flatten(), dtype=np.int8)
    n = batch.num_rows
    if n == 0:
        return pa.table({"pattern": pa.array([], pa.binary()), "n": pa.array([], pa.int64())})
    K = flat.size // n
    mat = (flat.reshape(n, K) + 1).astype(np.uint8)  # {-1,0,1} -> {0,1,2}
    patterns, counts = np.unique(mat, axis=0, return_counts=True)
    return pa.table(
        {
            "pattern": pa.array([p.tobytes() for p in patterns], pa.binary()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def _accumulate_pattern_counts(partial) -> "pa.Table":
    """Stream the per-block partials into an O(#patterns) driver dict —
    NOT ``to_pandas()``: the partial stream is ≤ 3^K × num_blocks rows,
    which at 10^12 docs (millions of blocks) would itself be billions
    of rows; incremental accumulation keeps driver memory bounded by
    the pattern space regardless of block count."""
    acc: dict[bytes, int] = {}
    for b in partial.iter_batches(batch_format="pyarrow"):
        if "pattern" not in b.schema.names:
            continue
        for p, n in zip(b.column("pattern").to_pylist(),
                        b.column("n").to_pylist()):
            acc[p] = acc.get(p, 0) + n
    keys = sorted(acc)
    return pa.table({"pattern": pa.array(keys, pa.binary()),
                     "n": pa.array([acc[k] for k in keys], pa.int64())})


def pattern_counts(labeled) -> "pa.Table":
    """labeled Dataset (with L column) → tiny driver-side table of
    (pattern bytes, count). Pre-aggregated per block, then streamed
    into a bounded driver accumulator (SURVEY.md A2/A3 partial+final;
    no Dataset all-to-all — an AllToAll appended to the live map chain
    costs seconds of fixed shuffle setup for kilobytes of data)."""
    partial = labeled.map_batches(_pattern_counts_batch, batch_format="pyarrow")
    return _accumulate_pattern_counts(partial)


# ---------------------------------------------------------------------------
# 3: driver-side EM over weighted patterns
# ---------------------------------------------------------------------------

def fit_label_model(counts: pa.Table, *, n_iter: int = 200, tol: float = 1e-9,
                    smooth: float = 0.2) -> dict:
    """Exact EM on pattern counts for the class-conditional model
    P(λ_k = v | y), v ∈ {-1, 0, +1} — LF accuracy AND propensity per
    class.  The propensity term is load-bearing (SURVEY.md §7 hard part
    (b)): with accuracy-only parameters the all-one-class solution is a
    global optimum (a "wrong" LF flips sign instead of penalizing), and
    negative-evidence LFs that abstain on positives collapse.  Here an
    LF that fires only on one class is itself evidence.

    Returns {"theta": float64[K, 2, 3] with P(λ=v|y), "pi": float,
    "alpha": float64[K] accuracies for reporting} — a few hundred
    floats; broadcast by closure capture into the scoring stage.
    """
    pats = [np.frombuffer(b, dtype=np.uint8).astype(np.int8) - 1
            for b in counts.column("pattern").to_pylist()]
    if not pats:
        return {"theta": np.zeros((0, 2, 3)), "pi": 0.5, "alpha": np.array([])}
    Lp = np.stack(pats)  # (P, K) in {-1,0,1}
    w = counts.column("n").to_numpy().astype(np.float64)  # (P,)
    P, K = Lp.shape
    # one-hot per vote value: V[v][p,k]; v index 0,1,2 = vote -1,0,+1
    V = [(Lp == v) for v in (-1, 0, 1)]

    # init: signed majority vote as soft labels
    q = 1.0 / (1.0 + np.exp(-1.5 * Lp.sum(axis=1)))  # P(y=+1 | pattern)
    pi = 0.5
    theta = np.full((K, 2, 3), 1 / 3)  # [k, y(0:neg,1:pos), vote(-1,0,+1)]
    ll_old = -np.inf
    for _ in range(n_iter):
        wq = w * q
        wn = w * (1.0 - q)
        for vi in range(3):
            theta[:, 1, vi] = V[vi].T @ wq + smooth
            theta[:, 0, vi] = V[vi].T @ wn + smooth
        theta[:, 1, :] /= theta[:, 1, :].sum(axis=1, keepdims=True)
        theta[:, 0, :] /= theta[:, 0, :].sum(axis=1, keepdims=True)
        pi = float(np.clip((wq.sum() + smooth) / (w.sum() + 2 * smooth), 1e-6, 1 - 1e-6))
        lt = np.log(theta)
        logp_pos = np.log(pi) + sum(V[vi] @ lt[:, 1, vi] for vi in range(3))
        logp_neg = np.log1p(-pi) + sum(V[vi] @ lt[:, 0, vi] for vi in range(3))
        m = np.maximum(logp_pos, logp_neg)
        lse = m + np.log(np.exp(logp_pos - m) + np.exp(logp_neg - m))
        q = np.exp(logp_pos - lse)
        ll = float(w @ lse)
        if abs(ll - ll_old) < tol * max(1.0, abs(ll_old)):
            break
        ll_old = ll

    # Identifiability (label switching): orient so that LFs agree with
    # their own votes better than chance on average — the reference's
    # LF-accuracy-prior convention (gen_learning.py LF_prior).
    fire_pos = theta[:, 1, 2] + theta[:, 1, 0]  # P(fire | y=+1)
    fire_neg = theta[:, 0, 2] + theta[:, 0, 0]
    acc_pos = np.divide(theta[:, 1, 2], fire_pos, out=np.full(K, 0.5), where=fire_pos > 1e-12)
    acc_neg = np.divide(theta[:, 0, 0], fire_neg, out=np.full(K, 0.5), where=fire_neg > 1e-12)
    mean_acc = float(np.mean(0.5 * (acc_pos + acc_neg)))
    if mean_acc < 0.5:
        theta = theta[:, ::-1, :]
        pi = 1.0 - pi
        acc_pos, acc_neg = 1 - acc_neg, 1 - acc_pos
    alpha = 0.5 * (acc_pos + acc_neg)
    return {"theta": theta, "pi": pi, "alpha": alpha}


# ---------------------------------------------------------------------------
# 4: broadcast scoring (marginals)
# ---------------------------------------------------------------------------

def posterior(L: np.ndarray, theta: np.ndarray, pi: float) -> np.ndarray:
    """P(y=+1 | λ) for an (n, K) int8 vote matrix — reference
    ``GenerativeModel.marginals`` ≈L600–700, closed form under the
    class-conditional categorical model."""
    if L.size and L.shape[1] != theta.shape[0]:
        # without this the K-mismatch surfaces as an opaque matmul
        # ValueError inside a Ray task (round-4 review); K=0 means the
        # model was fit on ZERO pattern rows
        raise ValueError(
            f"posterior: vote matrix has K={L.shape[1]} LFs but the "
            f"model was fit with K={theta.shape[0]}"
            + (" — the fit sample selected zero rows (check "
               "fit_sample_rows / fit_sample_fraction)"
               if theta.shape[0] == 0 else ""))
    lt = np.log(np.maximum(theta, 1e-300))
    logp_pos = np.full(L.shape[0], np.log(pi))
    logp_neg = np.full(L.shape[0], np.log1p(-pi))
    for vi, v in enumerate((-1, 0, 1)):
        m = L == v
        logp_pos = logp_pos + m @ lt[:, 1, vi]
        logp_neg = logp_neg + m @ lt[:, 0, vi]
    m = np.maximum(logp_pos, logp_neg)
    return np.exp(logp_pos - m) / (np.exp(logp_pos - m) + np.exp(logp_neg - m))


def score_marginals(labeled, model: dict, *, batch_size: int | None = None):
    """Append float32 ``p`` to every labeled candidate row (stateless
    map; weights ride in the serialized closure once)."""
    theta = np.asarray(model["theta"], dtype=np.float64)
    pi = float(model["pi"])

    def _score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        Lc = batch.column("L")
        flat = np.asarray(Lc.combine_chunks().flatten() if isinstance(Lc, pa.ChunkedArray)
                          else Lc.flatten(), dtype=np.int8)
        K = flat.size // max(n, 1)
        p = posterior(flat.reshape(n, K), theta, pi) if n else np.array([])
        return batch.append_column("p", pa.array(p.astype(np.float32), pa.float32()))

    return labeled.map_batches(_score, batch_format="pyarrow", batch_size=batch_size)


def save_model(model: dict, path: str) -> None:
    """Persist fitted label-model weights (binary or categorical) —
    the reference pickles ``GenerativeModel`` via its save/load
    (``snorkel/learning/gen_learning.py`` ≈L700); here a plain .npz so
    a later run can score without refitting (resume-friendly)."""
    np.savez(path,
             theta=np.asarray(model["theta"]),
             pi=np.asarray(model["pi"]),
             alpha=np.asarray(model.get("alpha", [])),
             cardinality=np.asarray(model.get("cardinality", 2)))


def load_model(path: str) -> dict:
    with np.load(path) as z:
        out = {"theta": z["theta"], "cardinality": int(z["cardinality"])}
        pi = z["pi"]
        out["pi"] = float(pi) if pi.ndim == 0 else pi
        if z["alpha"].size:
            out["alpha"] = z["alpha"]
        return out


# ---------------------------------------------------------------------------
# Categorical (cardinality k > 2) label model — reference
# ``GenerativeModel`` + ``candidate_subclass(..., cardinality=k)``
# support multi-class throughout (snorkel/learning/gen_learning.py
# ≈L40–600, snorkel/models/candidate.py ≈L1–180; the reference test
# suite has a categorical variant, SURVEY.md §5).  Votes follow the
# reference's categorical convention: λ ∈ {0, 1..k}, 0 = abstain.
# Same streaming recast as the binary model: pattern counts → driver EM
# → broadcast scoring.
# ---------------------------------------------------------------------------


def _pattern_counts_batch_cat(batch: pa.Table) -> pa.Table:
    L = batch.column("L")
    flat = np.asarray(L.combine_chunks().flatten() if isinstance(L, pa.ChunkedArray)
                      else L.flatten(), dtype=np.int8)
    n = batch.num_rows
    if n == 0:
        return pa.table({"pattern": pa.array([], pa.binary()),
                         "n": pa.array([], pa.int64())})
    K = flat.size // n
    mat = flat.reshape(n, K).astype(np.uint8)  # votes already ≥ 0
    patterns, counts = np.unique(mat, axis=0, return_counts=True)
    return pa.table({"pattern": pa.array([p.tobytes() for p in patterns], pa.binary()),
                     "n": pa.array(counts.astype(np.int64), pa.int64())})


def pattern_counts_cat(labeled) -> "pa.Table":
    """Categorical-vote twin of ``pattern_counts`` (votes {0..k} pack
    into uint8 bytes directly; ≤ (k+1)^K patterns, bounded per batch;
    same streaming driver accumulator)."""
    partial = labeled.map_batches(_pattern_counts_batch_cat, batch_format="pyarrow")
    return _accumulate_pattern_counts(partial)


def fit_label_model_cat(counts: pa.Table, cardinality: int, *, n_iter: int = 300,
                        tol: float = 1e-9, smooth: float = 0.2) -> dict:
    """Exact EM on pattern counts, y ∈ {1..k}: class prior π_c and
    class-conditional vote table θ[lf, c, v] = P(λ=v | y=c) with
    v ∈ {0..k} — accuracy AND per-class propensity, the same
    degeneracy-free parameterization as the binary model (an LF that
    fires only on one class is itself evidence).

    Label anchoring: q is initialized from the vote-count majority
    (class c anchored to vote value c), and a greedy post-fit
    permutation maximizes Σ_lf θ[lf, c, c] to undo any residual
    label switching.

    Returns {"theta": float64[K, k, k+1], "pi": float64[k],
    "cardinality": k}."""
    C = int(cardinality)
    pats = [np.frombuffer(b, dtype=np.uint8) for b in counts.column("pattern").to_pylist()]
    if not pats:
        return {"theta": np.zeros((0, C, C + 1)), "pi": np.full(C, 1.0 / C),
                "cardinality": C}
    Lp = np.stack(pats).astype(np.int64)  # (P, K) in {0..C}
    w = counts.column("n").to_numpy().astype(np.float64)
    P, K = Lp.shape
    V = [(Lp == v) for v in range(C + 1)]  # V[v][p, k]

    # init: soft majority vote anchored to vote values
    votes_per_class = np.stack([V[c + 1].sum(axis=1) for c in range(C)], axis=1)
    q = np.exp(1.5 * (votes_per_class - votes_per_class.max(axis=1, keepdims=True)))
    q /= q.sum(axis=1, keepdims=True)  # (P, C)

    pi = np.full(C, 1.0 / C)
    theta = np.full((K, C, C + 1), 1.0 / (C + 1))
    ll_old = -np.inf
    for _ in range(n_iter):
        wq = w[:, None] * q  # (P, C)
        for v in range(C + 1):
            theta[:, :, v] = V[v].T @ wq + smooth  # (K, C)
        theta /= theta.sum(axis=2, keepdims=True)
        pi = np.clip((wq.sum(axis=0) + smooth) / (w.sum() + C * smooth), 1e-9, 1.0)
        pi = pi / pi.sum()
        lt = np.log(theta)
        logp = np.log(pi)[None, :] + sum(V[v] @ lt[:, :, v] for v in range(C + 1))
        m = logp.max(axis=1, keepdims=True)
        lse = m[:, 0] + np.log(np.exp(logp - m).sum(axis=1))
        q = np.exp(logp - lse[:, None])
        ll = float(w @ lse)
        if abs(ll - ll_old) < tol * max(1.0, abs(ll_old)):
            break
        ll_old = ll

    # greedy permutation: re-anchor class index c to the vote value it
    # best explains (undoes residual label switching)
    score = theta[:, :, 1:].sum(axis=0)  # (C classes, C vote values)
    perm = np.full(C, -1, dtype=np.int64)
    used_cls, used_vote = set(), set()
    for _ in range(C):
        best, bc, bv = -np.inf, -1, -1
        for c in range(C):
            if c in used_cls:
                continue
            for v in range(C):
                if v in used_vote:
                    continue
                if score[c, v] > best:
                    best, bc, bv = score[c, v], c, v
        perm[bv] = bc
        used_cls.add(bc)
        used_vote.add(bv)
    theta = theta[:, perm, :]
    pi = pi[perm]
    return {"theta": theta, "pi": pi, "cardinality": C}


def posterior_cat(L: np.ndarray, theta: np.ndarray, pi: np.ndarray) -> np.ndarray:
    """(n, K) votes in {0..k} → (n, k) class posteriors (reference
    categorical ``GenerativeModel.marginals``)."""
    C = theta.shape[1]
    lt = np.log(np.maximum(theta, 1e-300))
    logp = np.tile(np.log(np.maximum(pi, 1e-300))[None, :], (L.shape[0], 1))
    for v in range(C + 1):
        logp = logp + (L == v) @ lt[:, :, v]
    m = logp.max(axis=1, keepdims=True)
    e = np.exp(logp - m)
    return e / e.sum(axis=1, keepdims=True)


def score_marginals_cat(labeled, model: dict, *, batch_size: int | None = None):
    """Append ``p_cat`` (list<float32>, per-class posterior) and
    ``y_hat`` (int32 argmax class in 1..k) to every labeled row."""
    theta = np.asarray(model["theta"], dtype=np.float64)
    pi = np.asarray(model["pi"], dtype=np.float64)
    C = int(model["cardinality"])

    def _score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        Lc = batch.column("L")
        flat = np.asarray(Lc.combine_chunks().flatten() if isinstance(Lc, pa.ChunkedArray)
                          else Lc.flatten(), dtype=np.int8)
        K = flat.size // max(n, 1)
        if n:
            post = posterior_cat(flat.reshape(n, K), theta, pi)
            y_hat = post.argmax(axis=1).astype(np.int32) + 1
        else:
            post = np.zeros((0, C))
            y_hat = np.zeros(0, np.int32)
        off = pa.array(np.arange(0, (n + 1) * C, C, dtype=np.int32))
        pcol = pa.ListArray.from_arrays(
            off, pa.array(post.reshape(-1).astype(np.float32), pa.float32()))
        batch = batch.append_column("p_cat", pcol)
        return batch.append_column("y_hat", pa.array(y_hat, pa.int32()))

    return labeled.map_batches(_score, batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# LF diagnostics (SURVEY.md A2: coverage / overlap / conflict)
# ---------------------------------------------------------------------------

def _lf_stats_batch(batch: pa.Table) -> pa.Table:
    Lc = batch.column("L")
    flat = np.asarray(Lc.combine_chunks().flatten() if isinstance(Lc, pa.ChunkedArray)
                      else Lc.flatten(), dtype=np.int8)
    n = batch.num_rows
    K = flat.size // max(n, 1) if n else 0
    M = flat.reshape(n, K) if n else np.zeros((0, 0), np.int8)
    nz = M != 0
    labeled_count = nz.sum(axis=1)
    others = labeled_count[:, None] - nz  # how many OTHER LFs labeled each row
    overlap = (nz & (others > 0)).sum(axis=0)
    pos_any = (M == 1).any(axis=1)
    neg_any = (M == -1).any(axis=1)
    disagree_row = pos_any & neg_any
    conflict = (nz & disagree_row[:, None]).sum(axis=0)
    return pa.table(
        {
            "lf_idx": pa.array(np.arange(K, dtype=np.int32), pa.int32()),
            "n_rows": pa.array(np.full(K, n, dtype=np.int64), pa.int64()),
            "n_labeled": pa.array(nz.sum(axis=0).astype(np.int64), pa.int64()),
            "n_overlap": pa.array(overlap.astype(np.int64), pa.int64()),
            "n_conflict": pa.array(conflict.astype(np.int64), pa.int64()),
        }
    )


def lf_stats(labeled, lf_names: list[str]) -> "pa.Table":
    """Per-LF coverage/overlap/conflict via partial per-batch count
    vectors, K-row partials merged on the driver (reference
    ``lf_stats`` semantics; same no-AllToAll rationale as
    ``pattern_counts``)."""
    partial = labeled.map_batches(_lf_stats_batch, batch_format="pyarrow")
    K = len(lf_names)
    acc = np.zeros((K, 4), dtype=np.int64)  # rows, labeled, overlap, conflict
    for b in partial.iter_batches(batch_format="pyarrow"):
        if "lf_idx" not in b.schema.names or b.num_rows == 0:
            continue
        idx = np.asarray(b.column("lf_idx"))
        for j, col in enumerate(("n_rows", "n_labeled", "n_overlap", "n_conflict")):
            np.add.at(acc[:, j], idx, np.asarray(b.column(col)))
    n = np.maximum(acc[:, 0].astype(np.float64), 1)
    return pa.table(
        {
            "lf_name": pa.array(list(lf_names), pa.string()),
            "coverage": pa.array(acc[:, 1] / n, pa.float64()),
            "overlap": pa.array(acc[:, 2] / n, pa.float64()),
            "conflict": pa.array(acc[:, 3] / n, pa.float64()),
        }
    )
