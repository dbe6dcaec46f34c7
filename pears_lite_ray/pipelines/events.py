"""Windowed aggregation over the ``events`` stream table.

Tumbling 1-hour windows per event_type — the streaming-window custom
operator expressed as composition (SURVEY custom-operator rule (a)):
partial per-batch aggregation inside ``map_batches`` (user-dedup +
count/sum combine), then one ``groupby(window, event_type)`` shuffle whose
groups carry pre-collapsed rows, not raw events. Exact distinct-user
counts survive because partials keep one row per (window, type, user).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .common import round6

WINDOW_US = 3_600_000_000  # 1 hour


def events_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def q_windowed_events(sf_dir: str):
    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        win = (ts // WINDOW_US) * WINDOW_US
        df = pd.DataFrame(
            {
                "window_start": win,
                "event_type": batch["event_type"].to_pylist(),
                "user_id": batch["user_id"].to_numpy(),
                "value": batch["value"].to_numpy(),
            }
        )
        g = (
            df.groupby(["window_start", "event_type", "user_id"], sort=True)
            .agg(cnt=("value", "size"), sv=("value", "sum"))
            .reset_index()
        )
        # strip the b'pandas' schema metadata: pyarrow 16 schemas WITH
        # metadata are unhashable, and Ray's sort-reduce concat then logs
        # "Failed to hash the schemas" on every reduce task
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def finalize(group: pa.Table) -> pa.Table:
        g = group.to_pandas()
        return pa.table(
            {
                "window_start": pa.array(
                    [int(g["window_start"].iloc[0])], pa.timestamp("us")
                ),
                "event_type": pa.array([g["event_type"].iloc[0]], pa.string()),
                "n_events": pa.array([int(g["cnt"].sum())], pa.int64()),
                "n_users": pa.array([g["user_id"].nunique()], pa.int64()),
                "sum_value": pa.array(
                    [float(round6(g["sv"].sum()))], pa.float64()
                ),
            }
        )

    return (
        rd.read_parquet(events_path(sf_dir),
                        columns=["ts", "user_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .map_groups(finalize, batch_format="pyarrow")
    )


def q_user_sessions(sf_dir: str):
    """Sessionization (30-min inactivity gap) per user — the stateful
    streaming-window shape: groupby(user) then a vectorized per-group scan
    ordered by ts. Returns per-user session count + max session length."""
    GAP_US = 1_800_000_000

    def sessions(group: pa.Table) -> pa.Table:
        ts = np.sort(group["ts"].cast(pa.int64()).to_numpy())
        gaps = np.diff(ts)
        n_sessions = 1 + int((gaps > GAP_US).sum())
        # session lengths in events
        breaks = np.r_[0, np.nonzero(gaps > GAP_US)[0] + 1, ts.size]
        max_len = int(np.diff(breaks).max())
        return pa.table(
            {
                "user_id": pa.array([int(group["user_id"][0].as_py())], pa.int64()),
                "n_events": pa.array([ts.size], pa.int64()),
                "n_sessions": pa.array([n_sessions], pa.int64()),
                "max_session_events": pa.array([max_len], pa.int64()),
            }
        )

    from .common import strip_schema_metadata

    return (
        rd.read_parquet(events_path(sf_dir), columns=["ts", "user_id"])
        .map_batches(strip_schema_metadata, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(sessions, batch_format="pyarrow")
    )


QUERIES = {
    "windowed_events": q_windowed_events,
    "user_sessions": q_user_sessions,
}

ORACLE_SQL = {
    "windowed_events": """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2""",
    "user_sessions": """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
per_session AS (
  SELECT user_id, session_id, count(*) AS len FROM sess GROUP BY 1, 2
)
SELECT user_id,
       sum(len)::BIGINT AS n_events,
       count(*)::BIGINT AS n_sessions,
       max(len)::BIGINT AS max_session_events
FROM per_session GROUP BY user_id""",
}
