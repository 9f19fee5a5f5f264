"""ROLLUP-style multi-level aggregation: level contents, one-pass
re-aggregation semantics, op validation."""

import pandas as pd
import pyarrow as pa
import pytest
import ray

from snorkel_ray.stages.rollup import rollup_aggregate


def _ds():
    t = pa.table({
        "a": ["x", "x", "x", "y", "y"],
        "b": ["p", "p", "q", "p", "q"],
        "v": [1.0, 2.0, 4.0, 8.0, 16.0],
    })
    return ray.data.from_arrow(t).repartition(3)


def test_rollup_levels_exact():
    out = (rollup_aggregate(_ds(), ["a", "b"],
                            {"n": ("count", "a"),
                             "s": ("sum", "v"),
                             "mx": ("max", "v")})
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    expect = pd.DataFrame([
        {"a": "ALL", "b": "ALL", "n": 5, "s": 31.0, "mx": 16.0},
        {"a": "x", "b": "ALL", "n": 3, "s": 7.0, "mx": 4.0},
        {"a": "x", "b": "p", "n": 2, "s": 3.0, "mx": 2.0},
        {"a": "x", "b": "q", "n": 1, "s": 4.0, "mx": 4.0},
        {"a": "y", "b": "ALL", "n": 2, "s": 24.0, "mx": 16.0},
        {"a": "y", "b": "p", "n": 1, "s": 8.0, "mx": 8.0},
        {"a": "y", "b": "q", "n": 1, "s": 16.0, "mx": 16.0},
    ])
    pd.testing.assert_frame_equal(
        out[["a", "b", "n", "s", "mx"]].astype({"n": "int64"}), expect)


def test_rollup_single_key_and_min():
    out = (rollup_aggregate(_ds(), ["a"], {"mn": ("min", "v")})
           .to_pandas().sort_values("a").reset_index(drop=True))
    assert out.a.tolist() == ["ALL", "x", "y"]
    assert out.mn.tolist() == [1.0, 1.0, 8.0]


def test_rollup_validates():
    with pytest.raises(ValueError):
        rollup_aggregate(_ds(), [], {"n": ("count", "a")})
    with pytest.raises(ValueError):
        rollup_aggregate(_ds(), ["a"], {"m": ("mean", "v")})


def test_cube_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from snorkel_ray.stages.rollup import cube_aggregate

    df = pd.DataFrame({"a": ["x", "x", "y", "y", "y"],
                       "b": ["p", "q", "p", "p", "q"],
                       "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    ds = rd.from_pandas(df).repartition(3)
    out = (cube_aggregate(ds, ["a", "b"], {"n": ("count", "a"),
                                           "s": ("sum", "v")})
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    # 4 fine rows + 2 a-margins + 2 b-margins + 1 grand total = 9
    assert len(out) == 9
    got = {(r.a, r.b): (r.n, r.s) for r in out.itertuples()}
    assert got[("x", "p")] == (1, 1.0)
    assert got[("x", "ALL")] == (2, 3.0)
    assert got[("ALL", "p")] == (3, 8.0)
    assert got[("ALL", "q")] == (2, 7.0)
    assert got[("ALL", "ALL")] == (5, 15.0)


def test_rollup_empty_input_grand_total():
    """SQL ROLLUP on an empty table still emits the grand-total row
    (count 0, sum NULL) — the empty aggregate used to return None and
    crash (round-4 review)."""
    import ray

    from snorkel_ray.stages.rollup import rollup_aggregate

    empty = ray.data.from_arrow(pa.table({
        "a": pa.array([], pa.string()), "v": pa.array([], pa.float64())}))
    out = (rollup_aggregate(empty, ["a"],
                            {"n": ("count", "a"), "s": ("sum", "v")})
           .to_pandas())
    assert len(out) == 1
    assert out.n.iloc[0] == 0
    assert pd.isna(out.s.iloc[0])
