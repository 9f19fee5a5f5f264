"""Window operators + HLL sketch tests."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(ray_session):
    import ray.data as rd

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # user 1: two sessions (gap > 30min), user 2: one session
    for mins in [0, 10, 20, 90, 95]:
        rows.append({"user_id": 1, "ts": base + pd.Timedelta(minutes=mins),
                     "value": 1.0, "event_id": len(rows)})
    for mins in [5, 15]:
        rows.append({"user_id": 2, "ts": base + pd.Timedelta(minutes=mins),
                     "value": 2.0, "event_id": len(rows)})
    return rd.from_pandas(pd.DataFrame(rows))


def test_session_windows(ray_session):
    from snorkel_ray.stages.windows import session_windows

    out = session_windows(_events(ray_session), gap="30min").to_pandas()
    per_user = out.groupby("user_id").size().to_dict()
    assert per_user == {1: 2, 2: 1}
    u1 = out[out["user_id"] == 1].sort_values("session_start")
    assert u1["n_events"].tolist() == [3, 2]


def test_tumbling_and_sliding(ray_session):
    from snorkel_ray.stages.windows import sliding_window_mean, tumbling_window_counts

    win = tumbling_window_counts(_events(ray_session), width="1h").to_pandas()
    u1 = win[win["user_id"] == 1].sort_values("window_start")
    assert u1["n_events"].tolist() == [3, 2]

    roll = sliding_window_mean(_events(ray_session), window=2).to_pandas()
    u2 = roll[roll["user_id"] == 2].sort_values("ts")
    assert np.allclose(u2["rolling_mean"].tolist(), [2.0, 2.0])


def test_hll_accuracy(ray_session):
    import ray.data as rd

    from snorkel_ray.stages.sketches import HLL, approx_distinct

    n = 20000
    ds = rd.from_items([{"k": f"key-{i % 5000}"} for i in range(n)])
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - 5000) / 5000 < 0.05
    # mergeability == adding everything to one sketch
    a, b = HLL(10), HLL(10)
    a.add_batch(range(0, 1000))
    b.add_batch(range(500, 1500))
    one = HLL(10)
    one.add_batch(range(0, 1500))
    assert np.array_equal(a.merge(b).registers, one.registers)
    # serialize round-trip
    assert np.array_equal(HLL.deserialize(a.serialize()).registers, a.registers)
