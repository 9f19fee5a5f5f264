"""Window operators over event-shaped tables (SURVEY.md §2.9 note).

The reference has NO streaming concepts (strictly batch); these ops
exist because the brief's engine must cover event-log processing at
scale.  Per the Ray Data model (no watermarks/event-time runtime), a
window is a deterministic batch computation over an ordered, keyed log:
``groupby(key).map_groups(fn)`` where ``fn`` sorts the group by ts and
applies tumbling / sliding / session logic in pandas.  The ordering
assumption (all events of one key fit one group and sort in-memory) is
the documented partitioning contract; keys with pathological volume
need pre-splitting by time range first.
"""

from __future__ import annotations

import pandas as pd


def tumbling_window_counts(events, *, key: str = "user_id", ts: str = "ts",
                           value: str = "value", width: str = "1D"):
    """Per-key tumbling windows → (key, window_start, n_events, sum_value)."""
    delta = pd.Timedelta(width)

    def _win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts)
        start = g[ts].dt.floor(delta)
        out = g.groupby(start).agg(n_events=(ts, "size"), sum_value=(value, "sum"))
        out = out.reset_index().rename(columns={ts: "window_start"})
        out[key] = g[key].iloc[0]
        return out[[key, "window_start", "n_events", "sum_value"]]

    return events.groupby(key).map_groups(_win, batch_format="pandas")


def session_windows(events, *, key: str = "user_id", ts: str = "ts",
                    gap: str = "30min"):
    """Sessionize per key: a new session starts when the gap since the
    previous event exceeds ``gap`` → (key, session_start, session_end,
    n_events)."""
    delta = pd.Timedelta(gap)

    def _sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts)
        t = g[ts]
        new = (t.diff() > delta).fillna(True)
        sid = new.cumsum()
        out = g.groupby(sid).agg(session_start=(ts, "min"), session_end=(ts, "max"),
                                 n_events=(ts, "size")).reset_index(drop=True)
        out[key] = g[key].iloc[0]
        return out[[key, "session_start", "session_end", "n_events"]]

    return events.groupby(key).map_groups(_sess, batch_format="pandas")


def sliding_window_mean(events, *, key: str = "user_id", ts: str = "ts",
                        value: str = "value", window: int = 3):
    """Per-key trailing N-event rolling mean (order: ts, then event_id
    if present — deterministic) → original rows + ``rolling_mean``."""

    def _roll(g: pd.DataFrame) -> pd.DataFrame:
        order = [ts] + (["event_id"] if "event_id" in g.columns else [])
        g = g.sort_values(order)
        g["rolling_mean"] = g[value].rolling(window, min_periods=1).mean()
        return g

    return events.groupby(key).map_groups(_roll, batch_format="pandas")
