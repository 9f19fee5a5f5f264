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


def test_categorical_label_model_recovery(ray_session):
    """k=3 synthetic recovery (the reference's categorical
    GenerativeModel test idea, SURVEY.md §5): known per-LF accuracies
    and propensities must be recovered within ±0.05, and posterior
    argmax must beat the best single LF."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from snorkel_ray.stages.label_model import (fit_label_model_cat,
                                                pattern_counts_cat,
                                                posterior_cat)

    rng = np.random.default_rng(5)
    C, K, n = 3, 5, 20_000
    acc = np.array([0.85, 0.75, 0.7, 0.65, 0.6])
    fire = np.array([0.7, 0.6, 0.8, 0.5, 0.4])
    pi_true = np.array([0.5, 0.3, 0.2])
    y = rng.choice(C, size=n, p=pi_true) + 1
    L = np.zeros((n, K), dtype=np.int8)
    for k in range(K):
        fires = rng.random(n) < fire[k]
        correct = rng.random(n) < acc[k]
        wrong = np.where(y == 1, rng.choice([2, 3], n),
                         np.where(y == 2, rng.choice([1, 3], n), rng.choice([1, 2], n)))
        L[:, k] = np.where(fires, np.where(correct, y, wrong), 0)

    off = pa.array(np.arange(0, (n + 1) * K, K, dtype=np.int32))
    tbl = pa.table({"L": pa.ListArray.from_arrays(
        off, pa.array(L.reshape(-1), pa.int8()))})
    ds = rd.from_arrow(tbl).repartition(8)

    model = fit_label_model_cat(pattern_counts_cat(ds), cardinality=C)
    theta, pi = model["theta"], model["pi"]
    assert np.allclose(np.sort(pi)[::-1], pi_true, atol=0.05)
    for k in range(K):
        fire_hat = 1.0 - theta[k, :, 0]  # P(fire | y=c)
        acc_hat = np.array([theta[k, c, c + 1] for c in range(C)]) / \
            np.maximum(fire_hat, 1e-9)
        assert abs(float((acc_hat * pi).sum() / pi.sum()) - acc[k]) < 0.05, \
            (k, acc_hat, acc[k])
        assert abs(float((fire_hat * pi).sum() / pi.sum()) - fire[k]) < 0.05

    post = posterior_cat(L, theta, pi)
    model_acc = float((post.argmax(axis=1) + 1 == y).mean())
    best_lf = max(float(((L[:, k] == y) | (L[:, k] == 0)).mean()) for k in range(K))
    assert model_acc > 0.8
    # posterior argmax beats every single LF's fire-accuracy
    for k in range(K):
        fired = L[:, k] != 0
        lf_acc = float((L[fired, k] == y[fired]).mean())
        assert model_acc > lf_acc - 0.02


def test_model_save_load_roundtrip(ray_session, tmp_path):
    """Fitted weights persist to .npz and score identically after
    reload (resume a scoring run without refitting)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from snorkel_ray.stages.label_model import (fit_label_model, load_model,
                                                pattern_counts, posterior,
                                                save_model, score_marginals)

    rng = np.random.default_rng(2)
    n, K = 2000, 4
    L = rng.choice([-1, 0, 1], size=(n, K), p=[0.2, 0.5, 0.3]).astype(np.int8)
    off = pa.array(np.arange(0, (n + 1) * K, K, dtype=np.int32))
    ds = rd.from_arrow(pa.table({"L": pa.ListArray.from_arrays(
        off, pa.array(L.reshape(-1), pa.int8()))})).repartition(4).materialize()

    model = fit_label_model(pattern_counts(ds))
    p = str(tmp_path / "model.npz")
    save_model(model, p)
    loaded = load_model(p)
    assert np.allclose(loaded["theta"], model["theta"])
    a = score_marginals(ds, model).to_pandas()["p"]
    b = score_marginals(ds, loaded).to_pandas()["p"]
    assert np.allclose(sorted(a), sorted(b))
