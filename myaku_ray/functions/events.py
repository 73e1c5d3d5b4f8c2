"""Event-stream-shaped operators: windowed aggregates, sessionization.

Ray Data has no event-time windows (it is a batch engine); the stream
semantics are expressed per the documented pattern: tumbling windows as a
bucket-key groupby, sessionization as per-key ``map_groups`` over the
ts-sorted group (ordering assumption: within one user the (ts, event_id)
order is total — stated here, used identically by the SQL oracle's window
functions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

HOUR_US = 3_600_000_000
SESSION_GAP_US = 30 * 60 * 1_000_000


def _millis(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1000.0 + 0.5).astype(np.int64)


def events_hourly(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + Σ value (millis)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour_bucket": pa.array(ts_us // HOUR_US),
                "value_milli": pa.array(_millis(batch["value"].to_numpy(zero_copy_only=False))),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_milli", alias_name="sum_value_milli"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT event_type,
  epoch_us(ts) // 3600000000 AS hour_bucket,
  count(*) AS n_events,
  CAST(sum(CAST(floor(value*1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events
GROUP BY event_type, hour_bucket
"""


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Per-user session counts with a 30-min inactivity gap."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions_of_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts_us = g["ts"].astype("int64").to_numpy()
        gaps = np.diff(ts_us)
        n_sessions = 1 + int((gaps > gap_us).sum())
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(g)],
                "n_sessions": [n_sessions],
            }
        )

    return ds.groupby("user_id").map_groups(sessions_of_group, batch_format="pandas")


USER_SESSIONS_SQL = """
WITH ordered AS (
  SELECT user_id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) > {gap_us}
         THEN 1 ELSE 0 END AS new_sess
  FROM events)
SELECT user_id,
  count(*) AS n_events,
  CAST(1 + sum(new_sess) AS BIGINT) AS n_sessions
FROM ordered GROUP BY user_id
""".format(gap_us=SESSION_GAP_US)


HOP_WINDOW_HOURS = 3


def events_hopping_3h(sf_dir: str):
    """Hopping windows: 3-hour windows advancing by 1 hour — every event
    lands in the 3 windows covering it.  Expressed as a map-side window
    expansion (each event emits one row per covering window, vectorized
    with np.repeat/tile) followed by the same groupby as the tumbling
    case; at scale the expansion factor is the window/hop ratio, flat and
    predictable, with no ordering requirement."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    w = HOP_WINDOW_HOURS

    def expand(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts_us // HOUR_US
        vm = _millis(batch["value"].to_numpy(zero_copy_only=False))
        offs = np.arange(w, dtype=np.int64)
        # event in hour h belongs to windows starting h-w+1 .. h
        starts = np.repeat(hour, w) - np.tile(offs, len(hour))
        et_idx = np.repeat(np.arange(len(hour)), w)
        return pa.table(
            {
                "event_type": batch["event_type"].take(pa.array(et_idx)),
                "window_start_hour": pa.array(starts),
                "value_milli": pa.array(np.repeat(vm, w)),
            }
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start_hour"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_milli", alias_name="sum_value_milli"),
        )
    )


EVENTS_HOPPING_SQL = f"""
SELECT event_type,
  epoch_us(ts) // 3600000000 - o.off AS window_start_hour,
  count(*) AS n_events,
  CAST(sum(CAST(floor(value*1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events, (SELECT unnest(generate_series(0, {HOP_WINDOW_HOURS - 1})) AS off) o
GROUP BY event_type, window_start_hour
"""


def top_users_by_value(sf_dir: str, k: int = 20):
    """Top-k users by Σ value (millis); deterministic (sum DESC, user) order."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "value_milli": pa.array(_millis(batch["value"].to_numpy(zero_copy_only=False))),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("value_milli", alias_name="total_value_milli"),
            Count(alias_name="n_events"),
        )
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        """Partial top-k per block — the driver reduce sees <= k rows per
        block instead of every user (ann.py-style partial top-k)."""
        tot = batch["total_value_milli"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((uid, -tot))[:k]
        return batch.take(pa.array(np.sort(sel)))

    pdf = (
        agg.map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["total_value_milli", "user_id"], ascending=[False, True])
    )
    return pdf.head(k).reset_index(drop=True)


TOP_USERS_SQL = """
SELECT user_id,
  CAST(sum(CAST(floor(value*1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_value_milli,
  count(*) AS n_events
FROM events GROUP BY user_id
ORDER BY total_value_milli DESC, user_id
LIMIT 20
"""
