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


def events_asof_join(sf_dir: str):
    """As-of join: each ``click`` matched to the user's latest ``purchase``
    with purchase.ts <= click.ts (inner — clicks before any purchase drop).

    Ray Data has no as-of join operator; the scalable composition is ONE
    shuffle on the join key (``groupby(user_id)``) + a sorted merge inside
    ``map_groups``: per user the right side is ts-sorted once and every
    left row resolves by binary search (``np.searchsorted``) — O((L+R)
    log R) per user, no quadratic pairing, and the payload crosses the
    exchange exactly once.  Right-side rows are deduplicated per (user,
    ts) keeping the max event_id, so the match is total-ordered and
    engine-independent (DuckDB's ASOF JOIN picks an arbitrary same-ts row
    otherwise).  Hot-user skew is bounded by the per-user dedup; a 100 TB
    deployment would additionally range-partition time so one user-epoch
    never exceeds a block.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ty = batch["event_type"]
        is_click = pc.equal(ty, "click")
        t = batch.filter(pc.or_(is_click, pc.equal(ty, "purchase")))
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "is_click": pc.equal(t["event_type"], "click"),
                "value_milli": pa.array(
                    _millis(t["value"].to_numpy(zero_copy_only=False))
                ),
            }
        )

    def asof_of_user(g: pd.DataFrame) -> pd.DataFrame:
        right = g[~g["is_click"]]
        left = g[g["is_click"]]
        if right.empty or left.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "click_ts_us": pd.Series([], dtype=np.int64),
                    "purchase_event_id": pd.Series([], dtype=np.int64),
                    "purchase_value_milli": pd.Series([], dtype=np.int64),
                    "lag_us": pd.Series([], dtype=np.int64),
                }
            )
        # dedup right per ts: keep max event_id (deterministic winner)
        right = (
            right.sort_values(["ts_us", "event_id"])
            .groupby("ts_us", as_index=False)
            .last()
        )
        rts = right["ts_us"].to_numpy()
        lts = left["ts_us"].to_numpy()
        idx = np.searchsorted(rts, lts, side="right") - 1
        ok = idx >= 0
        idx = idx[ok]
        lf = left[ok]
        return pd.DataFrame(
            {
                "event_id": lf["event_id"].to_numpy(),
                "user_id": lf["user_id"].to_numpy(),
                "click_ts_us": lf["ts_us"].to_numpy(),
                "purchase_event_id": right["event_id"].to_numpy()[idx],
                "purchase_value_milli": right["value_milli"].to_numpy()[idx],
                "lag_us": lf["ts_us"].to_numpy() - rts[idx],
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(asof_of_user, batch_format="pandas")
    )


EVENTS_ASOF_SQL = """
WITH purchases AS (
  SELECT user_id, ts,
    max(event_id) AS purchase_event_id,
    CAST(arg_max(CAST(floor(value*1000.0 + 0.5) AS BIGINT), event_id) AS BIGINT)
      AS purchase_value_milli
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
), clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id,
  epoch_us(c.ts) AS click_ts_us,
  p.purchase_event_id, p.purchase_value_milli,
  epoch_us(c.ts) - epoch_us(p.ts) AS lag_us
FROM clicks c ASOF JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


RANGE_N_WINDOWS = 12
RANGE_STRIDE_H = 56
RANGE_LEN_H = 36
RANGE_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


def events_range_join(sf_dir: str):
    """Range (interval) join: events against a small table of
    non-overlapping promo windows — count + Σ value per window.

    The interval table is tiny, so the scalable plan is a BROADCAST range
    join: window bounds ship to every map task once (closure/``ray.put``,
    never per batch) and each batch resolves membership with one
    ``np.searchsorted`` against the sorted starts — no all-to-all, no
    per-row Python.  Aggregation is map-side partial (np.bincount per
    batch) + a windows-sized final groupby.  This is the composition Ray
    Data lacks natively (no non-equi joins) and mirrors what a calendar /
    SLA-window join does in a production event pipeline."""
    starts = RANGE_EPOCH_US + np.arange(RANGE_N_WINDOWS, dtype=np.int64) * (
        RANGE_STRIDE_H * HOUR_US
    )
    ends = starts + RANGE_LEN_H * HOUR_US

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = _millis(batch["value"].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(starts, ts_us, side="right") - 1
        ok = (idx >= 0) & (ts_us < ends[np.clip(idx, 0, None)])
        wi = idx[ok]
        n = np.bincount(wi, minlength=RANGE_N_WINDOWS)
        s = np.bincount(wi, weights=v[ok].astype(np.float64), minlength=RANGE_N_WINDOWS)
        keep = n > 0
        return pa.table(
            {
                "window_id": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "n_partial": pa.array(n[keep].astype(np.int64)),
                "sum_partial": pa.array(s[keep].astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("window_id")
        .aggregate(
            Sum("n_partial", alias_name="n_events"),
            Sum("sum_partial", alias_name="sum_value_milli"),
        )
    )
    return agg


EVENTS_RANGE_JOIN_SQL = f"""
WITH w AS (
  SELECT CAST(k AS BIGINT) AS window_id,
    TIMESTAMP '2024-01-01 00:00:00' + k * {RANGE_STRIDE_H} * INTERVAL 1 HOUR AS w_start,
    TIMESTAMP '2024-01-01 00:00:00' + (k * {RANGE_STRIDE_H} + {RANGE_LEN_H}) * INTERVAL 1 HOUR AS w_end
  FROM range({RANGE_N_WINDOWS}) t(k)
)
SELECT w.window_id, count(*) AS n_events,
  CAST(sum(CAST(floor(e.value*1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY w.window_id
"""


HLL_P = 12                      # 4096 registers
HLL_M = 1 << HLL_P
_HLL_REST_BITS = 64 - HLL_P
_HLL_REST_MASK = (1 << _HLL_REST_BITS) - 1


def hll_event_registers(sf_dir: str):
    """HyperLogLog register state for count-distinct(event_id) — the
    streaming cardinality sketch, with a twist that makes the SKETCH
    ITSELF exactly checkable: hashing is md5-derived and the register
    rank uses pure integer ops (``int.bit_length`` == DuckDB
    ``length(bin(x))``), so the DuckDB oracle recomputes the identical
    register state and the driver hash-matches it.

    Distributed shape: each batch folds its rows into a 4096-register
    partial (np.maximum.at), partials merge by elementwise max — the
    classic mergeable-sketch reduction; what crosses the cluster is
    O(m) registers per batch, never rows.  Output = the (rank ->
    register count) histogram, integers only.  The cardinality estimate
    derived from this histogram is pytest-gated within the sketch's
    theoretical error (~1.04/sqrt(m) ~ 1.6%)."""
    import hashlib

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def partial(batch: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, dtype=np.int64)
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        hs = np.fromiter(
            (
                int(hashlib.md5(str(int(i)).encode()).hexdigest()[:16], 16)
                for i in ids
            ),
            dtype=np.uint64,
            count=len(ids),
        )
        reg = (hs >> np.uint64(_HLL_REST_BITS)).astype(np.int64)
        rest = hs & np.uint64(_HLL_REST_MASK)
        # rank = 53 - bit_length(rest); rest==0 -> 53 (all-zero suffix)
        bl = np.zeros(len(rest), dtype=np.int64)
        nz = rest != 0
        bl[nz] = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64) + 1
        # exact fixup: floor(log2) on doubles can be off by one at 2^k
        # boundaries — verify with integer shifts (branch-free, vectorized)
        too_hi = nz & ((rest >> np.clip(bl - 1, 0, None).astype(np.uint64)) == 0)
        bl[too_hi] -= 1
        too_lo = nz & ((rest >> bl.astype(np.uint64)) != 0)
        bl[too_lo] += 1
        rank = np.where(nz, _HLL_REST_BITS + 1 - bl, _HLL_REST_BITS + 1)
        np.maximum.at(regs, reg, rank)
        keep = np.flatnonzero(regs > 0)
        return pa.table(
            {
                "reg": pa.array(keep),
                "rank": pa.array(regs[keep]),
            }
        )

    from ray.data.aggregate import Max as _Max

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(_Max("rank", alias_name="rank"))
    )

    def hist(batch: pa.Table) -> pa.Table:
        r = batch["rank"].to_numpy(zero_copy_only=False)
        ranks, counts = np.unique(r, return_counts=True)
        return pa.table(
            {
                "rank": pa.array(ranks.astype(np.int64)),
                "n_regs": pa.array(counts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        merged.map_batches(hist, batch_format="pyarrow")
        .groupby("rank")
        .aggregate(_Sum("n_regs", alias_name="n_regs"))
    )


HLL_EVENT_REGISTERS_SQL = f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 16))::UBIGINT
    AS hash
  FROM events
), ranked AS (
  SELECT CAST(hash >> {_HLL_REST_BITS} AS BIGINT) AS reg,
    CASE WHEN (hash & {_HLL_REST_MASK}::UBIGINT) = 0 THEN {_HLL_REST_BITS + 1}
         ELSE {_HLL_REST_BITS + 1}
              - length(bin(hash & {_HLL_REST_MASK}::UBIGINT))
    END AS rank
  FROM h
), regs AS (
  SELECT reg, max(rank) AS rank FROM ranked GROUP BY reg
)
SELECT CAST(rank AS BIGINT) AS rank, count(*) AS n_regs
FROM regs GROUP BY rank
"""


def hll_estimate(histogram) -> float:
    """Cardinality estimate from the (rank, n_regs) histogram — raw HLL
    harmonic mean with the standard small-range linear-counting branch."""
    import pandas as _pd

    if not isinstance(histogram, _pd.DataFrame):
        histogram = histogram.to_pandas()
    m = HLL_M
    n_seen = int(histogram["n_regs"].sum())
    n_zero = m - n_seen
    s = float(n_zero)  # 2^-0 for empty registers
    for rank, n in sorted(
        zip(histogram["rank"].astype(int), histogram["n_regs"].astype(int))
    ):
        s += n * 2.0 ** (-rank)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / s
    if est <= 2.5 * m and n_zero > 0:
        import math as _math

        est = m * _math.log(m / n_zero)
    return est
