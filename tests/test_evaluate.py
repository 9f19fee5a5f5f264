"""Scorer / splits / marginals / coverage tests (SURVEY.md A7/A8/O3/S9)."""

import numpy as np
import pyarrow as pa


def _scored_ds(ray_session):
    import ray.data as rd

    rows = [
        {"cand_stable_id": f"c{i}", "p": p}
        for i, p in enumerate([0.9, 0.8, 0.2, 0.6, 0.1, 0.95])
    ]
    return rd.from_items(rows)


def test_score_vs_gold(ray_session):
    from snorkel_ray.stages.evaluate import score_vs_gold

    gold = pa.table({"cand_stable_id": [f"c{i}" for i in range(6)],
                     "label": pa.array([1, -1, -1, 1, 1, 1], pa.int8())})
    res = score_vs_gold(_scored_ds(ray_session), gold, threshold=0.5)
    # preds: c0=1,c1=1,c2=-1,c3=1,c4=-1,c5=1 vs gold 1,-1,-1,1,1,1
    assert (res["tp"], res["fp"], res["tn"], res["fn"]) == (3, 1, 1, 1)
    assert sorted(res["fp_ids"]) == ["c1"]
    assert sorted(res["fn_ids"]) == ["c4"]
    assert abs(res["precision"] - 0.75) < 1e-9
    assert abs(res["recall"] - 0.75) < 1e-9


def test_assign_split_deterministic(ray_session):
    import ray.data as rd

    from snorkel_ray.stages.evaluate import assign_split, filter_split

    ds = rd.from_items([{"url": f"u{i}"} for i in range(500)])
    a = assign_split(ds).to_pandas().set_index("url")["split"].sort_index()
    b = assign_split(rd.from_items([{"url": f"u{i}"} for i in range(500)])) \
        .to_pandas().set_index("url")["split"].sort_index()
    assert (a == b).all()  # pure function of key
    frac0 = (a == 0).mean()
    assert 0.7 < frac0 < 0.9
    assert set(a.unique()) <= {0, 1, 2}
    n_test = filter_split(assign_split(ds), 2).count()
    assert n_test == int((a == 2).sum())


def test_marginals_roundtrip(ray_session, tmp_path):
    from snorkel_ray.stages.evaluate import load_marginals, save_marginals

    ds = _scored_ds(ray_session)
    save_marginals(ds, str(tmp_path / "m"))
    back = load_marginals(str(tmp_path / "m")).to_pandas().sort_values("cand_stable_id")
    orig = ds.to_pandas().sort_values("cand_stable_id")
    assert np.allclose(back["p"].to_numpy(), orig["p"].to_numpy())


def test_candidate_coverage(ray_session):
    import ray.data as rd

    from snorkel_ray.stages.evaluate import candidate_coverage

    rows = [{"cand_stable_id": "a", "L": [0, 0, 1]},
            {"cand_stable_id": "b", "L": [0, 0, 0]},
            {"cand_stable_id": "c", "L": [-1, 1, 0]}]
    res = candidate_coverage(rd.from_items(rows))
    assert res["n_candidates"] == 3 and res["n_covered"] == 2
    assert abs(res["coverage"] - 2 / 3) < 1e-9


def test_lf_helpers():
    from snorkel_ray.functions.lf_helpers import (
        contains_token,
        get_between_tokens,
        get_tagged_text,
        get_text_splits,
        tokens_contain,
    )

    class Row:
        sent_text = "Acme Corp was founded by Robert Smith yesterday."
        between_text = "was founded by"
        pre_text = ""
        subj_word_start, subj_word_end = 0, 1
        obj_word_start, obj_word_end = 5, 6

    r = Row()
    assert get_between_tokens(r) == ["was", "founded", "by"]
    assert contains_token(r, "ROBERT")
    assert not contains_token(r, "missing")
    tagged = get_tagged_text(r)
    assert tagged.startswith("{{A}} was founded by {{B}}")
    left, between, right = get_text_splits(r)
    assert left == "" and between == " was founded by " and right == " yesterday."
    assert tokens_contain(["a", "B", "c"], "b c")
    assert not tokens_contain(["a", "b"], "b c")


def test_get_text_splits_reversed_candidate():
    """direction='r' candidates store the object BEFORE the subject;
    the splits must be position-aware (round-4 review)."""
    from snorkel_ray.functions.lf_helpers import get_text_splits

    class Row:
        sent_text = "Acme Corp was founded by Robert Smith yesterday."
        subj_word_start, subj_word_end = 5, 6  # Robert Smith (subject)
        obj_word_start, obj_word_end = 0, 1    # Acme Corp (object)

    left, between, right = get_text_splits(Row())
    assert left == "" and between == " was founded by " \
        and right == " yesterday."
