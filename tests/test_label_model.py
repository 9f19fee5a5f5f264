"""Label-model recovery on synthetic matrices (FIXTURES.md F3 — direct
port of the reference's strongest unit-test idea,
test/learning/test_gen_learning.py)."""

import numpy as np
import pyarrow as pa

from snorkel_ray.stages.label_model import fit_label_model, posterior


def synth_L(n=10000, K=10, seed=3):
    rng = np.random.default_rng(seed)
    alpha = rng.uniform(0.55, 0.95, K)  # true accuracies
    beta = rng.uniform(0.2, 0.6, K)  # propensities (y-independent)
    y = rng.choice([-1, 1], n)
    fires = rng.random((n, K)) < beta
    correct = rng.random((n, K)) < alpha
    L = np.where(fires, np.where(correct, y[:, None], -y[:, None]), 0).astype(np.int8)
    return L, y, alpha, beta


def counts_table(L):
    mat = (L + 1).astype(np.uint8)
    patterns, counts = np.unique(mat, axis=0, return_counts=True)
    return pa.table(
        {
            "pattern": pa.array([p.tobytes() for p in patterns], pa.binary()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def test_recovers_accuracies_and_separates():
    L, y, alpha, beta = synth_L()
    model = fit_label_model(counts_table(L))
    # accuracy recovery within ±0.05 (F3 gate)
    assert np.max(np.abs(model["alpha"] - alpha)) < 0.05, (model["alpha"], alpha)
    # propensity recovery (fire rates)
    theta = model["theta"]
    fire = 0.5 * (theta[:, 0, 0] + theta[:, 0, 2] + theta[:, 1, 0] + theta[:, 1, 2])
    assert np.max(np.abs(fire - beta)) < 0.05
    # marginal quality: AUC > 0.9
    p = posterior(L, theta, model["pi"])
    order = np.argsort(p)
    ranks = np.empty(len(p))
    ranks[order] = np.arange(len(p))
    pos = y == 1
    auc = (ranks[pos].mean() - (pos.sum() - 1) / 2) / (~pos).sum()
    assert auc > 0.9, auc
    # posterior parity with weighted majority vote on high-signal rows
    strong = np.abs(L.sum(axis=1)) >= 3
    agree = np.sign(p[strong] - 0.5) == np.sign(L[strong].sum(axis=1))
    assert agree.mean() > 0.95


def test_empty_and_degenerate():
    empty = pa.table({"pattern": pa.array([], pa.binary()), "n": pa.array([], pa.int64())})
    m = fit_label_model(empty)
    assert m["pi"] == 0.5
    # single all-abstain pattern
    one = pa.table({"pattern": pa.array([bytes([1, 1, 1])], pa.binary()),
                    "n": pa.array([5], pa.int64())})
    m = fit_label_model(one)
    p = posterior(np.zeros((2, 3), np.int8), m["theta"], m["pi"])
    assert np.all(np.isfinite(p))
