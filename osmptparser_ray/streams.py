"""Stream-shaped operators over event logs (guide §streaming-shaped).

Ray Data has no event-time watermarks; stream semantics are realized as
key-partitioned, time-sorted group transforms: ``groupby(key)`` co-locates
a key's full history, the group fn sorts by timestamp and applies the
windowing. Ordering assumption: per-key history fits a group (bound the
key space or pre-bucket time ranges at larger scales).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def sessionize(
    events: rd.Dataset,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Session windows: a new session starts when the gap since the
    previous event of the same user exceeds ``gap_seconds``.

    Output: (user_id, session_id [1-based per user], n_events,
    start_us, end_us). Deterministic: events ordered by (ts, event_id)
    within user.
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"], kind="stable")
        micros = g[ts_col].astype("int64").to_numpy()
        gaps = np.diff(micros, prepend=micros[0] - 1)
        is_new = np.ones(len(micros), dtype=np.int64)
        is_new[1:] = (np.diff(micros) > gap_seconds * 1_000_000).astype(np.int64)
        session = np.cumsum(is_new)
        df = pd.DataFrame({"session_id": session, "us": micros})
        out = df.groupby("session_id").agg(
            n_events=("us", "size"), start_us=("us", "min"), end_us=("us", "max")
        )
        out = out.reset_index()
        out.insert(0, user_col, g[user_col].iloc[0])
        return out

    return events.groupby(user_col).map_groups(per_user, batch_format="pandas")


def tumbling_window(
    events: rd.Dataset,
    window_seconds: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> rd.Dataset:
    """Tumbling windows as a pure groupby-aggregate (no per-group UDF):
    window id = epoch // window. Output: (key, window_id, n_events, sum_value)."""
    from ray.data.aggregate import Count, Sum

    w_us = int(window_seconds * 1_000_000)

    def win(batch: pa.Table) -> pa.Table:
        micros = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: batch[key_col],
                "window_id": pa.array(micros // w_us, pa.int64()),
                value_col: batch[value_col],
            }
        )

    return (
        events.map_batches(win, batch_format="pyarrow")
        .groupby([key_col, "window_id"])
        .aggregate(Count(alias_name="n_events"), Sum(value_col, alias_name="sum_value"))
    )
