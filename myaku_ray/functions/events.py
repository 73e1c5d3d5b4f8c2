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

import ray
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


WEEK_US = 7 * 24 * 3_600_000_000


def user_retention_cohorts(sf_dir: str):
    """Weekly retention triangle: users grouped by their first-activity
    week (cohort), counted at every later week they were active —
    (cohort_week, week_offset, n_users) — the standard growth-analytics
    cut of an event stream.

    ONE groupby(user_id) exchange does all the work: the per-batch prep
    dedups to distinct (user, week) rows first (np.unique on a
    structured view, so the shuffle carries user-week rows, never
    event rows), then each user group derives its cohort week (min) and
    offsets in a single pass, emitting one row per (user, active week);
    a second groupby — bounded by cohorts x offsets, a few hundred rows
    — counts users.  Matches USER_RETENTION_COHORTS_SQL row-for-row."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        w = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // WEEK_US
        pairs = np.empty(len(u), dtype=[("u", np.int64), ("w", np.int64)])
        pairs["u"], pairs["w"] = u, w
        uniq = np.unique(pairs)
        return pa.table(
            {
                "user_id": pa.array(uniq["u"]),
                "week": pa.array(uniq["w"]),
            }
        )

    def per_user(g: pa.Table) -> pa.Table:
        weeks = np.unique(g["week"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "cohort_week": pa.array(
                    np.full(len(weeks), weeks[0], dtype=np.int64)
                ),
                "week_offset": pa.array(weeks - weeks[0]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Count(alias_name="n_users"))
    )


USER_RETENTION_COHORTS_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
  FROM events
), cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(uw.week - c.cohort_week AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN cohort c USING (user_id)
GROUP BY c.cohort_week, week_offset
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def event_funnel(sf_dir: str):
    """Ordered-funnel completion counts: how many users performed
    'view', then 'click' strictly after their first qualifying view,
    then 'purchase' strictly after that click — the classic conversion
    funnel, progressive-min-timestamp semantics (each step anchors at
    the EARLIEST event that still satisfies the order, which maximizes
    the chance of completing later steps).

    ONE groupby(user_id) exchange, pre-shrunk map-side: a prep stage
    drops every non-funnel event type and replaces the string type with
    an int8 step code, so the shuffle carries (user, ts, step) rows for
    qualifying events only.  Each user group then walks the step list
    with a vectorized (step-match AND ts > anchor) mask per step —
    3 numpy passes per user, no sort needed since min() is
    order-free — emitting the user's reached-step count; the per-step
    user totals are then a 4-row aggregate.  Matches EVENT_FUNNEL_SQL
    (progressive min-ts self-joins) row-for-row."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    step_names = pa.array(list(FUNNEL_STEPS), pa.string())

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].combine_chunks()
        keep = pc.is_in(et, value_set=step_names)
        kept = batch.filter(keep)
        code = pc.index_in(
            kept["event_type"].combine_chunks(), value_set=step_names
        ).cast(pa.int8())
        return pa.table(
            {
                "user_id": kept["user_id"],
                "ts": kept["ts"].cast(pa.int64()),
                "step": code,
            }
        )

    def per_user(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False)
        code = g["step"].to_numpy(zero_copy_only=False)
        anchor = np.iinfo(np.int64).min
        reached = 0
        for k in range(len(FUNNEL_STEPS)):
            cand = ts[(code == k) & (ts > anchor)]
            if len(cand) == 0:
                break
            anchor = cand.min()
            reached += 1
        return pa.table({"reached": pa.array([reached], pa.int64())})

    per_step = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("reached")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    by_reached = dict(zip(per_step["reached"], per_step["n"]))
    rows = []
    for step, name in enumerate(FUNNEL_STEPS, start=1):
        n = sum(v for k, v in by_reached.items() if k >= step)
        rows.append((step, name, n))
    return pd.DataFrame(rows, columns=["step", "event_type", "n_users"])


EVENT_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT * FROM (VALUES
  (1::BIGINT, 'view', (SELECT CAST(count(*) AS BIGINT) FROM s1)),
  (2::BIGINT, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s2)),
  (3::BIGINT, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3))
) AS funnel(step, event_type, n_users)
"""


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Per-user session counts with a 30-min inactivity gap.

    ONE ``user_id % RUNNING_SHARDS`` exchange, then each shard is
    processed fully vectorized (the ``events_running_value`` pattern,
    round-4 verdict ask #3): sort the shard by (user, ts, event_id),
    mark session breaks with one ``diff > gap`` over the whole shard,
    and reduce per-user with ``np.add.reduceat`` over the contiguous
    user segments.  No per-user Python callable, no per-user DataFrame
    construction — at 1e8-1e9 users the shuffle moves the same rows as
    before but the group processor count drops from |users| to
    RUNNING_SHARDS."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "shard_u": pa.array((uid % RUNNING_SHARDS).astype(np.int32)),
            }
        )

    def sessions_of_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        n = len(g)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        brk = np.zeros(n, dtype=np.int64)
        brk[1:] = ((ts[1:] - ts[:-1] > gap_us) & ~new_user[1:]).astype(
            np.int64
        )
        starts = np.flatnonzero(new_user)
        n_events = np.diff(np.append(starts, n))
        n_breaks = np.add.reduceat(brk, starts)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": n_events.astype(np.int64),
                "n_sessions": (1 + n_breaks).astype(np.int64),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard_u")
        .map_groups(sessions_of_shard, batch_format="pandas")
    )


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


ASOF_EPOCH_HOURS = 24
ASOF_SHARDS = 64  # Ray-level exchange groups per stage (each holds many
# (user, epoch) logical groups, processed vectorized — per-group Python
# frames at billions of groups is the 100-TB killer this avoids)


def _asof_empty() -> pd.DataFrame:
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


def events_asof_join_partitioned(sf_dir: str, epoch_hours: int = ASOF_EPOCH_HOURS):
    """As-of join with the HOT-USER SKEW VALVE implemented for real: the
    logical join key is ``(user_id, epoch)`` (epoch = ts // epoch_hours),
    so a user who is 50% of the corpus still lands in bounded per-epoch
    groups instead of one giant task.

    A click in epoch e may match a purchase from an EARLIER epoch; that
    boundary state rides the same shuffle as the events, never a
    broadcast: (1) per-(user, epoch) purchase maxima are pre-reduced
    map-side (one row per batch per key), (2) a per-USER scan over those
    epoch summaries (one row per epoch — bounded regardless of event
    count) emits a carry-in row per event-bearing epoch holding the
    latest purchase from all earlier epochs, (3) carry rows union with
    the events and each (user, epoch) group resolves clicks against the
    latest at-or-before purchase.

    Each stage shuffles on a SHARD of its logical key (ASOF_SHARDS Ray
    groups) and processes every logical group inside the shard with one
    vectorized pass (sort + segmented cummax — no per-group Python
    frame): a hot user's epochs scatter across shards, and the engine
    pays per-shard, not per-(user, epoch), task overhead.  Output is
    row-identical to ``events_asof_join`` (equality pytest with a
    50%-hot user + the same DuckDB oracle)."""
    epoch_us = epoch_hours * HOUR_US
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ty = batch["event_type"]
        is_click = pc.equal(ty, "click")
        t = batch.filter(pc.or_(is_click, pc.equal(ty, "purchase")))
        ts_us = t["ts"].cast(pa.int64())
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = ts_us.to_numpy(zero_copy_only=False) // epoch_us
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "epoch": pa.array(ep),
                "shard": pa.array((uid * 1_000_003 + ep) % ASOF_SHARDS),
                "ts_us": ts_us,
                "is_click": pc.equal(t["event_type"], "click"),
                "value_milli": pa.array(
                    _millis(t["value"].to_numpy(zero_copy_only=False))
                ),
            }
        )

    events = ds.map_batches(prep, batch_format="pyarrow")

    # (1) map-side partial: latest purchase per (user, epoch) per batch,
    # PLUS a row for every event-bearing (user, epoch) so the carry scan
    # knows which epochs need a carry-in even if purchase-free.
    def epoch_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = batch["epoch"].to_numpy(zero_copy_only=False)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vm = batch["value_milli"].to_numpy(zero_copy_only=False)
        isp = ~batch["is_click"].to_numpy(zero_copy_only=False)
        # purchase-free keys keep a (-1, -1) sentinel
        pts = np.where(isp, ts, -1)
        peid = np.where(isp, eid, -1)
        pvm = np.where(isp, vm, 0)
        order = np.lexsort((peid, pts, ep, uid))
        uid, ep, pts, peid, pvm = (
            uid[order], ep[order], pts[order], peid[order], pvm[order]
        )
        last = np.empty(len(uid), dtype=bool)
        if len(uid):
            last[-1] = True
            last[:-1] = (uid[1:] != uid[:-1]) | (ep[1:] != ep[:-1])
        keep = np.flatnonzero(last)
        return pa.table(
            {
                "user_id": pa.array(uid[keep]),
                "epoch": pa.array(ep[keep]),
                "shard_u": pa.array(uid[keep] % ASOF_SHARDS),
                "ts_us": pa.array(pts[keep]),
                "event_id": pa.array(peid[keep]),
                "value_milli": pa.array(pvm[keep].astype(np.int64)),
            }
        )

    def epoch_merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        # reduce batch partials to one row per (user, epoch): the
        # (ts, event_id)-max row wins (sentinels never beat purchases)
        g = g.sort_values(
            ["user_id", "epoch", "ts_us", "event_id"]
        ).reset_index(drop=True)
        uid = g["user_id"].to_numpy()
        ep = g["epoch"].to_numpy()
        last = np.empty(len(g), dtype=bool)
        last[-1] = True
        last[:-1] = (uid[1:] != uid[:-1]) | (ep[1:] != ep[:-1])
        return g.loc[
            last,
            ["user_id", "epoch", "shard_u", "ts_us", "event_id", "value_milli"],
        ]

    summaries = (
        events.map_batches(epoch_partial, batch_format="pyarrow")
        .groupby("shard_u")
        .map_groups(epoch_merge_shard, batch_format="pandas")
    )

    # (2) per-user prefix scan over epoch summaries -> carry-in rows.
    # Distinct epochs cannot share a ts, so the running max over ts alone
    # identifies the latest earlier purchase; sentinel rows (ts = -1)
    # never win.  Segmented exclusive prefix argmax across ALL users in
    # the shard: two grouped cummax/shift passes (cython), no per-user
    # Python.
    def carry_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "epoch"]).reset_index(drop=True)
        n = len(g)
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        vm = g["value_milli"].to_numpy()
        key = pd.Series(uid)
        cm = pd.Series(ts).groupby(key, sort=False).cummax().to_numpy()
        idx = np.arange(n)
        masked = pd.Series(np.where(ts == cm, idx, -1))
        src_inc = masked.groupby(key, sort=False).cummax()
        src = (
            src_inc.groupby(key, sort=False)
            .shift(1, fill_value=-1)
            .to_numpy()
            .astype(np.int64)
        )
        cm_prev = (
            pd.Series(cm).groupby(key, sort=False)
            .shift(1, fill_value=-1)
            .to_numpy()
        )
        keep = np.flatnonzero((cm_prev >= 0) & (src >= 0))
        ep_k = g["epoch"].to_numpy()[keep].astype(np.int64)
        uid_k = uid[keep].astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": eid[src[keep]].astype(np.int64),
                "user_id": uid_k,
                "epoch": ep_k,
                "shard": (uid_k * 1_000_003 + ep_k) % ASOF_SHARDS,
                "ts_us": ts[src[keep]].astype(np.int64),
                "is_click": np.zeros(len(keep), dtype=bool),
                "value_milli": vm[src[keep]].astype(np.int64),
            }
        )

    carries = summaries.groupby("shard_u").map_groups(
        carry_shard, batch_format="pandas"
    ).map_batches(  # normalize to Arrow blocks so the union is homogeneous
        lambda t: t, batch_format="pyarrow"
    )

    # (3) carry rows union with events; every (user, epoch) group in the
    # shard resolves in ONE vectorized pass.  Sorted by (group, ts,
    # is_click, event_id) — purchases before same-ts clicks, max event_id
    # last among same-ts purchases — a segmented inclusive prefix argmax
    # over purchase row indices IS the as-of match (identical winner to
    # dedup-then-searchsorted: latest ts wins, max event_id on ties).
    def asof_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "epoch", "ts_us", "is_click", "event_id"]
        ).reset_index(drop=True)
        n = len(g)
        uid = g["user_id"].to_numpy()
        ep = g["epoch"].to_numpy()
        isc = g["is_click"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        vm = g["value_milli"].to_numpy()
        if not isc.any() or isc.all():
            return _asof_empty()
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (uid[1:] != uid[:-1]) | (ep[1:] != ep[:-1])
        gid = np.cumsum(new) - 1
        idx_p = np.where(~isc, np.arange(n), -1)
        src = (
            pd.Series(idx_p)
            .groupby(pd.Series(gid), sort=False)
            .cummax()
            .to_numpy()
            .astype(np.int64)
        )
        lsel = np.flatnonzero(isc & (src >= 0))
        if len(lsel) == 0:
            return _asof_empty()
        m = src[lsel]
        return pd.DataFrame(
            {
                "event_id": eid[lsel].astype(np.int64),
                "user_id": uid[lsel].astype(np.int64),
                "click_ts_us": ts[lsel].astype(np.int64),
                "purchase_event_id": eid[m].astype(np.int64),
                "purchase_value_milli": vm[m].astype(np.int64),
                "lag_us": (ts[lsel] - ts[m]).astype(np.int64),
            }
        )

    return (
        events.union(carries)
        .groupby("shard")
        .map_groups(asof_shard, batch_format="pandas")
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
    from myaku_ray.functions.hashkit import md5_u64

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def partial(batch: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, dtype=np.int64)
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        hs = md5_u64(ids)  # vectorized DuckDB kernel, oracle-bit-identical
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


# ---------------------------------------------------------------------------
# Semi-structured property extraction: events carry a JSON ``props``
# string; parse the numeric field and aggregate per event_type.  The
# parse is one vectorized extract_regex kernel per batch (no Python
# JSON loop); the oracle mirrors it with regexp_extract so both engines
# apply the identical grammar.
# ---------------------------------------------------------------------------


def events_props_stats(sf_dir: str):
    """Per event_type: event count plus sum/max of the integer ``k``
    property parsed out of the JSON props column."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            batch["props"].combine_chunks(), r'"k":\s*(?P<k>\d+)'
        )
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table(
            {
                "event_type": batch["event_type"],
                "k": k,
            }
        )

    return (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("k", alias_name="sum_k"),
            Max("k", alias_name="max_k"),
        )
    )


EVENTS_PROPS_STATS_SQL = """
SELECT event_type,
  count(*) AS n_events,
  CAST(sum(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT))
       AS BIGINT) AS sum_k,
  max(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Per-user running (cumulative) aggregate — the window-function shape
# ---------------------------------------------------------------------------

RUNNING_SHARDS = 64


def events_running_value(sf_dir: str):
    """Per-user running sum of ``value`` in (ts, event_id) order — the
    ``SUM() OVER (PARTITION BY user ORDER BY ts)`` window shape.

    Scale plan: ONE exchange on ``user_id % RUNNING_SHARDS`` (not on the
    raw user key — per-user ``map_groups`` would pay one task per user at
    millions of users), then each shard group is processed VECTORIZED:
    one sort by (user, ts, event_id) and one pandas grouped cumsum over
    the whole shard.  The exchange carries (ids, ts, value-millis) only;
    output is event-sized, same as the SQL window.  Within-user order is
    totalized by (ts, event_id) exactly as the oracle's OVER clause.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "value_millis": pa.array(
                    _millis(batch["value"].to_numpy(zero_copy_only=False))
                ),
                "shard_u": pa.array((uid % RUNNING_SHARDS).astype(np.int32)),
            }
        )

    def running_of_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        run = g.groupby("user_id", sort=False)["value_millis"].cumsum()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "running_value_millis": run.to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard_u")
        .map_groups(running_of_shard, batch_format="pandas")
    )


EVENTS_RUNNING_VALUE_SQL = """
SELECT event_id, user_id,
  CAST(sum(CAST(floor(value*1000.0 + 0.5) AS BIGINT))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_value_millis
FROM events
"""


# ---------------------------------------------------------------------------
# Exact distributed percentiles without a sort (quickselect counting passes)
# ---------------------------------------------------------------------------

PCTL_QS = (0.25, 0.5, 0.9, 0.99)
PCTL_SAMPLE_TARGET = 4096
PCTL_CUTS = 256
# max values pulled to the driver per refinement round; buckets above it
# recurse with finer cuts instead of materializing
PCTL_PULL_LIMIT = 5_000_000
# below this many rows the whole float column is pulled once and every
# rank answered with a single multi-kth np.partition — ONE Ray execution
# instead of the counting rounds (the dedup_exact/Q18 driver/distributed
# scale-switch idiom); the distributed path is equality-gated against
# this one in tests/test_r4_session7.py
PCTL_DRIVER_LIMIT = 30_000_000


def events_value_percentiles(
    sf_dir: str, *, driver_limit: int = PCTL_DRIVER_LIMIT
):
    """EXACT order-statistic percentiles of ``events.value`` with NO
    distributed sort.  Row count comes from parquet metadata (exact,
    free).  Below ``driver_limit`` rows the single float column is
    pulled once and all ranks are answered with one multi-kth
    ``np.partition`` (8 bytes/row on the driver — the documented
    driver/distributed scale switch).  Above it, the
    selection-by-counting (quickselect) plan runs:

    1. one streaming deterministic sample (md5(event_id) threshold —
       row-order-independent) that supplies ~PCTL_SAMPLE_TARGET cut
       candidates;
    2. per round, ONE streaming searchsorted-bincount pass counts rows
       per cut bucket for EVERY still-open quantile (the items share
       the scan — a fixed number of Ray executions per round, not per
       quantile);
    3. a single bounded pull of ONLY the target buckets
       (np.partition on the driver); a bucket larger than
       PCTL_PULL_LIMIT recurses with finer cuts inside its bounds —
       ties collapse (lo == hi answers immediately), so the loop
       strictly shrinks.

    Every pass is a map-only scan of one float column; nothing
    corpus-sized ever crosses an exchange or lands on the driver.
    Unlike ``doc_length_band``'s integer bincount this makes no range /
    dtype assumption.  Convention: quantile_disc = ascending order
    statistic at ceil(q*n)-1 (0-based), pinned against DuckDB."""
    import math

    import pyarrow.parquet as _pq

    from myaku_ray.functions.hashkit import md5_u64

    path = f"{sf_dir}/events.parquet"

    def _vals(columns):
        return rd.read_parquet(path, columns=columns)

    n = _pq.read_metadata(path).num_rows
    if n == 0:
        return pd.DataFrame({"q": pd.Series(PCTL_QS, dtype="float64"),
                             "value": pd.Series([None] * len(PCTL_QS), dtype="float64")})
    ranks = {q: max(0, math.ceil(q * n) - 1) for q in PCTL_QS}

    if n <= driver_limit:
        vals = _vals(["value"]).to_pandas()["value"].to_numpy()
        kth = sorted(set(ranks.values()))
        part = np.partition(vals, kth)
        return pd.DataFrame(
            {
                "q": pd.Series(PCTL_QS, dtype="float64"),
                "value": pd.Series(
                    [float(part[ranks[q]]) for q in PCTL_QS], dtype="float64"
                ),
            }
        )

    # ---- distributed counting path ----
    # exact streaming min/max so every bound below is finite (one tiny
    # metadata-or-scan pass)
    mm = _vals(["value"]).aggregate(
        rd.aggregate.Min("value"), rd.aggregate.Max("value")
    )
    vmin, vmax = float(mm["min(value)"]), float(mm["max(value)"])

    # deterministic sample for cut candidates
    p = min(1.0, PCTL_SAMPLE_TARGET / n)
    # float rounding can push int(1.0 * (2**64-1)) to 2**64 — clamp
    thresh = np.uint64(min(int(p * (2**64 - 1)), 2**64 - 1))

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        keep = md5_u64(ids) <= thresh
        return pa.table({"value": batch["value"].filter(pa.array(keep))})

    sampled = np.sort(
        _vals(["event_id", "value"])
        .map_batches(sample, batch_format="pyarrow")
        .to_pandas()["value"]
        .to_numpy()
    )

    out: dict[float, float] = {}
    todo = [(q, ranks[q], vmin - 1.0, vmax) for q in PCTL_QS]

    while todo:
        # fix this round's work items and their cuts; ONE counting scan
        # serves them all (loop over <=len(PCTL_QS) items with vector
        # ops inside — the accepted idiom)
        items = []
        for q, rank, lo, hi in todo:
            inner = sampled[(sampled > lo) & (sampled < hi)]
            if len(inner) == 0:
                inner = np.linspace(lo, hi, PCTL_CUTS + 2)[1:-1]
            u = np.unique(inner)
            cuts = u[:: max(1, len(u) // PCTL_CUTS)]
            items.append((q, rank, lo, hi, cuts))
        todo = []

        def bucket_counts(batch: pa.Table, items=items) -> pa.Table:
            v_all = batch["value"].to_numpy(zero_copy_only=False)
            ids, buckets, ns = [], [], []
            for i, (_q, _rank, lo, hi, cuts) in enumerate(items):
                # bucket b = values in (cuts[b-1], cuts[b]] —
                # searchsorted side="left" counts cuts STRICTLY below
                # v, so v == cuts[b] lands in bucket b
                # (right-inclusive); bucket len(cuts) = values above
                # the last cut
                v = v_all[(v_all > lo) & (v_all <= hi)]
                idx = np.searchsorted(cuts, v, side="left")
                c = np.bincount(idx, minlength=len(cuts) + 1)
                ids.append(np.full(len(c), i, dtype=np.int64))
                buckets.append(np.arange(len(c), dtype=np.int64))
                ns.append(c.astype(np.int64))
            return pa.table({"item": pa.array(np.concatenate(ids)),
                             "bucket": pa.array(np.concatenate(buckets)),
                             "n": pa.array(np.concatenate(ns))})

        cdf = (
            _vals(["value"])
            .map_batches(bucket_counts, batch_format="pyarrow")
            .to_pandas()
            .groupby(["item", "bucket"])["n"]
            .sum()
        )
        pulls = []
        for i, (q, rank, lo, hi, cuts) in enumerate(items):
            counts = (
                cdf.loc[i]
                .reindex(range(len(cuts) + 1), fill_value=0)
                .to_numpy()
            )
            # rank is RELATIVE to values > lo (global rank minus
            # count <= lo)
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, rank + 1))
            in_bucket_rank = rank - (int(cum[b - 1]) if b > 0 else 0)
            blo = lo if b == 0 else float(cuts[b - 1])
            bhi = float(cuts[b]) if b < len(cuts) else hi
            bn = int(counts[b])
            if bn <= PCTL_PULL_LIMIT:
                pulls.append((q, in_bucket_rank, blo, bhi))
            elif blo == bhi or np.nextafter(blo, bhi) == bhi:
                # no representable value strictly between the bounds:
                # every remaining row equals bhi
                out[q] = bhi
            else:
                todo.append((q, in_bucket_rank, blo, bhi))

        if pulls:
            # ONE bounded pull covers every resolved item this round
            def pull(batch: pa.Table, pulls=pulls) -> pa.Table:
                v_all = batch["value"].to_numpy(zero_copy_only=False)
                ids, vs = [], []
                for i, (_q, _r, blo, bhi) in enumerate(pulls):
                    v = v_all[(v_all > blo) & (v_all <= bhi)]
                    ids.append(np.full(len(v), i, dtype=np.int64))
                    vs.append(v)
                return pa.table({"item": pa.array(np.concatenate(ids)),
                                 "value": pa.array(np.concatenate(vs))})

            pdf = (
                _vals(["value"])
                .map_batches(pull, batch_format="pyarrow")
                .to_pandas()
            )
            for i, (q, in_bucket_rank, _blo, _bhi) in enumerate(pulls):
                vals = pdf.loc[pdf["item"] == i, "value"].to_numpy()
                out[q] = float(
                    np.partition(vals, in_bucket_rank)[in_bucket_rank]
                )

    return pd.DataFrame(
        {
            "q": pd.Series(PCTL_QS, dtype="float64"),
            "value": pd.Series([out[q] for q in PCTL_QS], dtype="float64"),
        }
    )


EVENTS_VALUE_PERCENTILES_SQL = """
SELECT q, value FROM (
  SELECT 0.25::DOUBLE AS q, quantile_disc(value, 0.25) AS value FROM events
  UNION ALL
  SELECT 0.5::DOUBLE, quantile_disc(value, 0.5) FROM events
  UNION ALL
  SELECT 0.9::DOUBLE, quantile_disc(value, 0.9) FROM events
  UNION ALL
  SELECT 0.99::DOUBLE, quantile_disc(value, 0.99) FROM events
) ORDER BY q
"""


# ---------------------------------------------------------------------------
# Exact z-score anomaly gate per hour bucket (integer arithmetic only)
# ---------------------------------------------------------------------------

ANOMALY_K = 3


def events_hourly_anomalies(sf_dir: str):
    """Events whose value deviates more than K sigma from their HOUR's
    mean — the telemetry outlier gate — computed EXACTLY: the float
    z-score test ``|v - mean| > K*sigma`` is algebraically squared into
    pure int64 arithmetic on value millis,

        (v*n - s)^2 > K^2 * (n*q - s^2)

    with s = Σv, q = Σv², so there is no float mean/stddev to diverge
    from the oracle by an ulp.  Two streaming passes: per-batch (hour,
    n, s, q) partials -> one hour-cardinality groupby, stats broadcast
    sorted -> a pure map-side filter attaches them by searchsorted.
    Nothing corpus-sized leaves a worker.  Overflow bound asserted
    loudly: max(|v|)*n per hour must stay under ~2^31 so the squares
    fit int64 (at that scale the valve is millis -> centis).
    """
    cols = ["event_id", "ts", "value"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def prep(batch: pa.Table) -> pa.Table:
        # normalize to us explicitly: a ns-unit writer would otherwise
        # shrink the "hour" to 3.6 ms (the testdata is us, but the op
        # must not depend on that)
        ts_us = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = _millis(batch["value"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "hour_bucket": pa.array(ts_us // HOUR_US),
                "n": pa.array(np.ones(len(v), dtype=np.int64)),
                "s": pa.array(v),
                "q": pa.array(v * v),
            }
        )
        return t.group_by("hour_bucket").aggregate(
            [("n", "sum"), ("s", "sum"), ("q", "sum")]
        ).rename_columns(["hour_bucket", "n", "s", "q"])

    stats = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("hour_bucket")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("q", alias_name="q"),
        )
        .to_pandas()
        .sort_values("hour_bucket")
    )
    hours = stats["hour_bucket"].to_numpy()
    n = stats["n"].to_numpy()
    s = stats["s"].to_numpy()
    q = stats["q"].to_numpy()
    # loud int64-overflow guard: dev = v*n - s and n*q - s^2 get squared/
    # multiplied — bound every factor under 2^31 so products fit
    vmax_bound = 2**31
    assert (np.abs(s) < vmax_bound).all() and (
        n * q - s * s >= 0
    ).all(), "hourly anomaly stats exceed the int64-exact envelope"
    stats_ref = ray.put((hours, n, s, q))

    def flag(batch: pa.Table) -> pa.Table:
        hrs, n_l, s_l, q_l = ray.get(stats_ref)
        ts_us = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        hb = ts_us // HOUR_US
        v = _millis(batch["value"].to_numpy(zero_copy_only=False))
        pos = np.searchsorted(hrs, hb)
        dev = v * n_l[pos] - s_l[pos]
        var_n2 = n_l[pos] * q_l[pos] - s_l[pos] * s_l[pos]
        keep = dev * dev > ANOMALY_K * ANOMALY_K * var_n2
        return pa.table(
            {
                "event_id": batch["event_id"].filter(pa.array(keep)),
                "hour_bucket": pa.array(hb[keep]),
                "value_milli": pa.array(v[keep]),
            }
        )

    out = ds.map_batches(flag, batch_format="pyarrow").materialize()
    if out.count() == 0:
        # all-empty datasets lose their schema through to_pandas —
        # return the typed empty frame so the output contract holds
        return pd.DataFrame(
            {
                "event_id": pd.Series(dtype=np.int64),
                "hour_bucket": pd.Series(dtype=np.int64),
                "value_milli": pd.Series(dtype=np.int64),
            }
        )
    return out


EVENTS_HOURLY_ANOMALIES_SQL = f"""
WITH e AS (
  SELECT event_id, epoch_us(ts) // 3600000000 AS hour_bucket,
    CAST(floor(value*1000.0 + 0.5) AS BIGINT) AS value_milli
  FROM events),
st AS (
  SELECT hour_bucket, count(*) AS n, sum(value_milli) AS s,
    sum(value_milli*value_milli) AS q
  FROM e GROUP BY hour_bucket)
SELECT e.event_id, e.hour_bucket, e.value_milli
FROM e JOIN st USING (hour_bucket)
WHERE (e.value_milli*st.n - st.s)*(e.value_milli*st.n - st.s)
      > {ANOMALY_K * ANOMALY_K}*(st.n*st.q - st.s*st.s)
"""


# ---------------------------------------------------------------------------
# Grouped exact percentiles (per event_type) — no distributed sort
# ---------------------------------------------------------------------------


def events_value_percentiles_by_type(
    sf_dir: str, *, driver_limit: int = PCTL_DRIVER_LIMIT
):
    """EXACT order-statistic percentiles of ``events.value`` PER
    event_type — the grouped generalization of
    ``events_value_percentiles``, with the same two paths:

    Below ``driver_limit`` total rows, one scan pulls (event_type,
    value) and each group's ranks are answered with one multi-kth
    ``np.partition``.  Above it, the batched selection-by-counting plan
    runs with (group, quantile) WORK ITEMS: one scan reduces per-group
    (n, min, max); one streaming per-group-thresholded sample supplies
    cut candidates; then per round ONE counting scan and ONE bounded
    pull serve every still-open (group, quantile) — executions stay
    constant in the number of groups AND quantiles.  Group count is
    assumed result-sized (event-type vocabularies are; the per-item
    loop inside the batch fn is groups x quantiles with vector ops
    inside).  Convention: per-group quantile_disc = ascending order
    statistic at ceil(q*n_g)-1, pinned against DuckDB."""
    import math

    import pyarrow.parquet as _pq

    from myaku_ray.functions.hashkit import md5_u64

    path = f"{sf_dir}/events.parquet"

    def _empty():
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype="object"),
                "q": pd.Series([], dtype="float64"),
                "value": pd.Series([], dtype="float64"),
            }
        )

    n = _pq.read_metadata(path).num_rows
    if n == 0:
        return _empty()

    def _scan(columns):
        return rd.read_parquet(path, columns=columns)

    def _finish(rows):
        out = pd.DataFrame(rows, columns=["event_type", "q", "value"])
        out["q"] = out["q"].astype(np.float64)
        out["value"] = out["value"].astype(np.float64)
        return (
            out.sort_values(["event_type", "q"]).reset_index(drop=True)
        )

    if n <= driver_limit:
        df = _scan(["event_type", "value"]).to_pandas()
        rows = []
        for g, sub in df.groupby("event_type", sort=True):
            vals = sub["value"].to_numpy()
            ranks = {
                q: max(0, math.ceil(q * len(vals)) - 1) for q in PCTL_QS
            }
            part = np.partition(vals, sorted(set(ranks.values())))
            rows.extend((g, q, float(part[ranks[q]])) for q in PCTL_QS)
        return _finish(rows)

    # ---- distributed counting path ----
    def gstats(batch: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(
                    zero_copy_only=False
                ),
                "value": batch["value"].to_numpy(zero_copy_only=False),
            }
        )
        g = (
            pdf.groupby("event_type")["value"]
            .agg(n="count", mn="min", mx="max")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = (
        _scan(["event_type", "value"])
        .map_batches(gstats, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type")
        .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        .sort_index()
    )
    groups = list(stats.index)
    g_n = dict(stats["n"])
    # per-group sample thresholds (row-order-independent md5 gate)
    thr = {
        g: np.uint64(
            min(
                int(min(1.0, PCTL_SAMPLE_TARGET / g_n[g]) * (2**64 - 1)),
                2**64 - 1,
            )
        )
        for g in groups
    }
    thr_ref = ray.put(thr)

    def sample(batch: pa.Table) -> pa.Table:
        th = ray.get(thr_ref)
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lim = np.array([th.get(x, np.uint64(0)) for x in t], dtype=np.uint64)
        keep = md5_u64(ids) <= lim
        return pa.table(
            {
                "event_type": batch["event_type"].filter(pa.array(keep)),
                "value": batch["value"].filter(pa.array(keep)),
            }
        )

    sdf = (
        _scan(["event_id", "event_type", "value"])
        .map_batches(sample, batch_format="pyarrow")
        .to_pandas()
    )
    samp = {
        g: np.sort(sub["value"].to_numpy())
        for g, sub in sdf.groupby("event_type")
    }

    out: dict[tuple, float] = {}
    todo = []
    for g in groups:
        ng = int(g_n[g])
        for q in PCTL_QS:
            todo.append(
                (
                    g,
                    q,
                    max(0, math.ceil(q * ng) - 1),
                    float(stats.loc[g, "mn"]) - 1.0,
                    float(stats.loc[g, "mx"]),
                )
            )

    while todo:
        items = []
        for g, q, rank, lo, hi in todo:
            sg = samp.get(g, np.empty(0))
            inner = sg[(sg > lo) & (sg < hi)]
            if len(inner) == 0:
                inner = np.linspace(lo, hi, PCTL_CUTS + 2)[1:-1]
            u = np.unique(inner)
            cuts = u[:: max(1, len(u) // PCTL_CUTS)]
            items.append((g, q, rank, lo, hi, cuts))
        todo = []

        def bucket_counts(batch: pa.Table, items=items) -> pa.Table:
            t = batch["event_type"].to_numpy(zero_copy_only=False)
            v_all = batch["value"].to_numpy(zero_copy_only=False)
            gmask = {g: t == g for g in {it[0] for it in items}}
            ids, buckets, ns = [], [], []
            for i, (g, _q, _rank, lo, hi, cuts) in enumerate(items):
                v = v_all[gmask[g] & (v_all > lo) & (v_all <= hi)]
                idx = np.searchsorted(cuts, v, side="left")
                c = np.bincount(idx, minlength=len(cuts) + 1)
                ids.append(np.full(len(c), i, dtype=np.int64))
                buckets.append(np.arange(len(c), dtype=np.int64))
                ns.append(c.astype(np.int64))
            return pa.table(
                {
                    "item": pa.array(np.concatenate(ids)),
                    "bucket": pa.array(np.concatenate(buckets)),
                    "n": pa.array(np.concatenate(ns)),
                }
            )

        cdf = (
            _scan(["event_type", "value"])
            .map_batches(bucket_counts, batch_format="pyarrow")
            .to_pandas()
            .groupby(["item", "bucket"])["n"]
            .sum()
        )
        pulls = []
        for i, (g, q, rank, lo, hi, cuts) in enumerate(items):
            counts = (
                cdf.loc[i]
                .reindex(range(len(cuts) + 1), fill_value=0)
                .to_numpy()
            )
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, rank + 1))
            in_rank = rank - (int(cum[b - 1]) if b > 0 else 0)
            blo = lo if b == 0 else float(cuts[b - 1])
            bhi = float(cuts[b]) if b < len(cuts) else hi
            bn = int(counts[b])
            if bn <= PCTL_PULL_LIMIT:
                pulls.append((g, q, in_rank, blo, bhi))
            elif blo == bhi or np.nextafter(blo, bhi) == bhi:
                out[(g, q)] = bhi
            else:
                todo.append((g, q, in_rank, blo, bhi))

        if pulls:

            def pull(batch: pa.Table, pulls=pulls) -> pa.Table:
                t = batch["event_type"].to_numpy(zero_copy_only=False)
                v_all = batch["value"].to_numpy(zero_copy_only=False)
                gmask = {g: t == g for g in {p[0] for p in pulls}}
                ids, vs = [], []
                for i, (g, _q, _r, blo, bhi) in enumerate(pulls):
                    v = v_all[gmask[g] & (v_all > blo) & (v_all <= bhi)]
                    ids.append(np.full(len(v), i, dtype=np.int64))
                    vs.append(v)
                return pa.table(
                    {
                        "item": pa.array(np.concatenate(ids)),
                        "value": pa.array(np.concatenate(vs)),
                    }
                )

            pdf = (
                _scan(["event_type", "value"])
                .map_batches(pull, batch_format="pyarrow")
                .to_pandas()
            )
            for i, (g, q, in_rank, _blo, _bhi) in enumerate(pulls):
                vals = pdf.loc[pdf["item"] == i, "value"].to_numpy()
                out[(g, q)] = float(np.partition(vals, in_rank)[in_rank])

    return _finish([(g, q, out[(g, q)]) for g in groups for q in PCTL_QS])


EVENTS_PCTL_BY_TYPE_SQL = """
SELECT event_type, q, value FROM (
  SELECT event_type, 0.25::DOUBLE AS q,
         quantile_disc(value, 0.25) AS value FROM events GROUP BY 1
  UNION ALL
  SELECT event_type, 0.5::DOUBLE, quantile_disc(value, 0.5)
  FROM events GROUP BY 1
  UNION ALL
  SELECT event_type, 0.9::DOUBLE, quantile_disc(value, 0.9)
  FROM events GROUP BY 1
  UNION ALL
  SELECT event_type, 0.99::DOUBLE, quantile_disc(value, 0.99)
  FROM events GROUP BY 1
) ORDER BY event_type, q
"""


# ---------------------------------------------------------------------------
# User lifetime-value deciles (exact rank rule, no NTILE tie lottery)
# ---------------------------------------------------------------------------

LTV_BUCKETS = 10


def user_value_deciles(sf_dir: str, buckets: int = LTV_BUCKETS):
    """Users bucketed into value deciles by total event value — the
    LTV-segmentation report.  The bucket rule is EXACT and
    tie-deterministic: users totally ordered by (total_millis, user_id)
    ascending, 0-based rank r, bucket = floor(r * buckets / n) — NTILE's
    arbitrary tie placement replaced by an explicit total order both
    sides compute identically.

    Plan: per-batch (user, millis) partials feed ONE groupby(user_id)
    exchange (user-sized, 2 ints/row); the rank/bucket finale runs on
    the driver over that user-sized aggregate — the same result-bound
    idiom as top_users_by_value (past ~1e8 users the finale becomes a
    distributed sort + partition-offset prefix sum, the pack_training
    _chunks pattern)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "total_millis": _millis(
                    batch["value"].to_numpy(zero_copy_only=False)
                ),
            }
        )
        g = df.groupby("user_id", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("total_millis", alias_name="total_millis"))
        .to_pandas()
    )
    if len(per_user) == 0:
        return pd.DataFrame(
            {
                "decile": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64"),
                "total_value_millis": pd.Series([], dtype="int64"),
            }
        )
    per_user = per_user.sort_values(
        ["total_millis", "user_id"]
    ).reset_index(drop=True)
    n = len(per_user)
    r = np.arange(n, dtype=np.int64)
    per_user["decile"] = (r * buckets) // n
    out = (
        per_user.groupby("decile", as_index=False)
        .agg(
            n_users=("user_id", "size"),
            total_value_millis=("total_millis", "sum"),
        )
        .sort_values("decile")
        .reset_index(drop=True)
    )
    out["decile"] = out["decile"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    out["total_value_millis"] = out["total_value_millis"].astype(np.int64)
    return out


USER_VALUE_DECILES_SQL = f"""
WITH per AS (
  SELECT user_id,
    sum(CAST(floor(value*1000.0 + 0.5) AS BIGINT))::BIGINT AS total_millis
  FROM events GROUP BY user_id),
ranked AS (
  SELECT total_millis,
    row_number() OVER (ORDER BY total_millis, user_id) - 1 AS r,
    (SELECT count(*) FROM per) AS n
  FROM per)
SELECT CAST((r * {LTV_BUCKETS}) // n AS BIGINT) AS decile,
  count(*)::BIGINT AS n_users,
  sum(total_millis)::BIGINT AS total_value_millis
FROM ranked GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Event-type affinity: distinct type pairs co-occurring per user
# ---------------------------------------------------------------------------


def event_type_affinity(sf_dir: str):
    """How often two event types co-occur in the SAME user's history —
    the affinity matrix behind 'users who do A also do B'.  Counts
    DISTINCT users per unordered type pair (a < b).

    Plan: map-side dedup to distinct (user_id, event_type) rows (a
    per-batch groupby — users x types bounded), ONE exchange keyed by
    user_id co-locates each user's type set, pairs are emitted inside
    ``map_groups`` (type vocabularies are tiny; pairs per user <=
    C(|types|, 2)), and the final pair count is an exchange over
    pair-vocabulary-sized rows."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def dedup(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "event_type": batch["event_type"].to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        return pa.Table.from_pandas(
            df.drop_duplicates(), preserve_index=False
        )

    def pairs_of_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = sorted(set(g["event_type"]))
        rows = [
            (a, b) for i, a in enumerate(ts) for b in ts[i + 1:]
        ]
        if not rows:
            return pd.DataFrame({"type_a": [], "type_b": []}).astype(
                {"type_a": "object", "type_b": "object"}
            )
        return pd.DataFrame(rows, columns=["type_a", "type_b"])

    pairs = (
        ds.map_batches(dedup, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(pairs_of_user)
    )
    out = (
        pairs.groupby(["type_a", "type_b"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "type_a": pd.Series([], dtype="object"),
                "type_b": pd.Series([], dtype="object"),
                "n_users": pd.Series([], dtype="int64"),
            }
        )
    out["n_users"] = out["n_users"].astype(np.int64)
    return (
        out.sort_values(["type_a", "type_b"]).reset_index(drop=True)
    )


EVENT_TYPE_AFFINITY_SQL = """
WITH dt AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*)::BIGINT AS n_users
FROM dt a JOIN dt b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Per-user inter-arrival gaps (the LAG window shape) with exact medians
# ---------------------------------------------------------------------------


def user_interarrival_stats(sf_dir: str):
    """Per-user inter-event gap statistics: number of gaps, exact
    median gap (ascending order statistic at ceil(n/2)-1 — the pinned
    quantile_disc convention), and max gap, all in integer
    microseconds.  The LAG-window shape: each user's events must be
    ordered (ts, event_id) before adjacent differences exist.

    Plan: ONE exchange keyed by user_id co-locates each user's rows
    (the user_sessions idiom); gaps, the order statistic and the max
    are computed vectorized inside ``map_groups``.  Users with fewer
    than two events have no gap and are absent — matching the SQL's
    NULL-dropping aggregate."""
    import math

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def gaps_of_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(ts) < 2:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_gaps": pd.Series([], dtype="int64"),
                    "median_gap_us": pd.Series([], dtype="int64"),
                    "max_gap_us": pd.Series([], dtype="int64"),
                }
            )
        d = np.sort(np.diff(ts))
        n = len(d)
        med = int(d[max(0, math.ceil(0.5 * n) - 1)])
        return pd.DataFrame(
            {
                "user_id": pd.Series([int(g["user_id"].iloc[0])], dtype="int64"),
                "n_gaps": pd.Series([n], dtype="int64"),
                "median_gap_us": pd.Series([med], dtype="int64"),
                "max_gap_us": pd.Series([int(d[-1])], dtype="int64"),
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(gaps_of_user)
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_gaps": pd.Series([], dtype="int64"),
                "median_gap_us": pd.Series([], dtype="int64"),
                "max_gap_us": pd.Series([], dtype="int64"),
            }
        )
    return out.sort_values("user_id").reset_index(drop=True)


USER_INTERARRIVAL_SQL = """
WITH g AS (
  SELECT user_id,
    epoch_us(ts) - lag(epoch_us(ts))
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events)
SELECT user_id, count(gap)::BIGINT AS n_gaps,
  quantile_disc(gap, 0.5)::BIGINT AS median_gap_us,
  max(gap)::BIGINT AS max_gap_us
FROM g WHERE gap IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Week-over-week user value delta: FULL OUTER JOIN of two filtered
# aggregates, collapsed into ONE conditional aggregate
# ---------------------------------------------------------------------------

WOW_A_START, WOW_A_END = "2024-01-01", "2024-01-08"
WOW_B_START, WOW_B_END = "2024-01-15", "2024-01-22"


def user_value_week_delta(sf_dir: str):
    """Per-user event count + value for two week windows and the
    value delta — the week-over-week cohort report.  Logically a FULL
    OUTER JOIN of two filtered aggregates (users active in EITHER
    window appear, absent sides zero-filled); physically ONE scan with
    per-batch CONDITIONAL partials and one groupby(user) exchange —
    the join never exists as a join, which is the point of the shape:
    a self-FULL-OUTER over one fact table is always a conditional
    aggregate.  Presence semantics ride the integer event counts
    (a user with events summing to 0 millis still appears), exact
    int64 end to end."""
    a0, a1 = np.datetime64(WOW_A_START), np.datetime64(WOW_A_END)
    b0, b1 = np.datetime64(WOW_B_START), np.datetime64(WOW_B_END)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        in_a = (ts >= a0) & (ts < a1)
        in_b = (ts >= b0) & (ts < b1)
        keep = in_a | in_b
        users = batch["user_id"].to_numpy(zero_copy_only=False)[keep]
        mil = _millis(batch["value"].to_numpy(zero_copy_only=False)[keep])
        ia, ib = in_a[keep], in_b[keep]
        df = pd.DataFrame(
            {
                "user_id": users,
                "a_n": ia.astype(np.int64),
                "a_millis": np.where(ia, mil, 0),
                "b_n": ib.astype(np.int64),
                "b_millis": np.where(ib, mil, 0),
            }
        )
        g = df.groupby("user_id", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("a_n", alias_name="a_n"),
            Sum("a_millis", alias_name="a_millis"),
            Sum("b_n", alias_name="b_n"),
            Sum("b_millis", alias_name="b_millis"),
        )
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "a_n": pd.Series([], dtype="int64"),
                "a_millis": pd.Series([], dtype="int64"),
                "b_n": pd.Series([], dtype="int64"),
                "b_millis": pd.Series([], dtype="int64"),
                "delta_millis": pd.Series([], dtype="int64"),
            }
        )
    for c in ["a_n", "a_millis", "b_n", "b_millis"]:
        out[c] = out[c].astype(np.int64)
    out["delta_millis"] = out["b_millis"] - out["a_millis"]
    return (
        out[["user_id", "a_n", "a_millis", "b_n", "b_millis", "delta_millis"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


USER_VALUE_WOW_SQL = f"""
WITH a AS (
  SELECT user_id, count(*)::BIGINT AS n,
    sum(CAST(floor(value*1000.0 + 0.5) AS BIGINT))::BIGINT AS m
  FROM events
  WHERE ts >= TIMESTAMP '{WOW_A_START}' AND ts < TIMESTAMP '{WOW_A_END}'
  GROUP BY user_id),
b AS (
  SELECT user_id, count(*)::BIGINT AS n,
    sum(CAST(floor(value*1000.0 + 0.5) AS BIGINT))::BIGINT AS m
  FROM events
  WHERE ts >= TIMESTAMP '{WOW_B_START}' AND ts < TIMESTAMP '{WOW_B_END}'
  GROUP BY user_id)
SELECT user_id,
  coalesce(a.n, 0)::BIGINT AS a_n, coalesce(a.m, 0)::BIGINT AS a_millis,
  coalesce(b.n, 0)::BIGINT AS b_n, coalesce(b.m, 0)::BIGINT AS b_millis,
  (coalesce(b.m, 0) - coalesce(a.m, 0))::BIGINT AS delta_millis
FROM a FULL OUTER JOIN b USING (user_id)
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Markov transition counts between consecutive event types (LAG shape)
# ---------------------------------------------------------------------------


def event_transition_counts(sf_dir: str):
    """Global (prev_type -> next_type) transition counts over each
    user's time-ordered event stream — the categorical LAG-window shape
    (the numeric one is ``user_interarrival_stats``).

    Plan: ONE exchange keyed by user_id co-locates each user's rows;
    adjacent pairs are formed vectorized inside ``map_groups`` and
    collapsed to per-user (prev, next, n) partials (<= |types|^2 rows
    per user), so the second groupby shuffles type-pair partials, not
    event rows.  Users with one event emit nothing — matching the
    SQL's NULL-dropping LAG.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def pairs_of_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        t = g["event_type"].to_numpy()
        if len(t) < 2:
            return pd.DataFrame(
                {
                    "prev_type": pd.Series([], dtype="object"),
                    "next_type": pd.Series([], dtype="object"),
                    "pair_count": pd.Series([], dtype="int64"),
                }
            )
        df = pd.DataFrame({"prev_type": t[:-1], "next_type": t[1:]})
        out = df.groupby(["prev_type", "next_type"], as_index=False).size()
        return out.rename(columns={"size": "pair_count"}).astype(
            {"pair_count": "int64"}
        )

    out = (
        ds.groupby("user_id")
        .map_groups(pairs_of_user)
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("pair_count", alias_name="pair_count"))
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "prev_type": pd.Series([], dtype="object"),
                "next_type": pd.Series([], dtype="object"),
                "pair_count": pd.Series([], dtype="int64"),
            }
        )
    out["pair_count"] = out["pair_count"].astype(np.int64)
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


EVENT_TRANSITION_SQL = """
WITH o AS (
  SELECT event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS pair_count
FROM o WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
"""


# ---------------------------------------------------------------------------
# Weekly active users split new vs returning (growth accounting)
# ---------------------------------------------------------------------------


def weekly_active_breakdown(sf_dir: str):
    """Per epoch-aligned week: active users split into NEW (first-ever
    active week) vs RETURNING — the growth-accounting shape behind
    every DAU/WAU dashboard.

    Plan: map-side (user, week) dedup shrinks each batch to distinct
    pairs before the ONE user-keyed exchange; inside ``map_groups``
    the user's first week is a vectorized min and each active week
    emits a 1-row (week, is_new) partial, so the final week groupby
    sums user-count partials (weeks-sized, tiny).  Week buckets are
    integer ``epoch_us // WEEK_US`` like ``user_retention_cohorts`` —
    no timestamp arithmetic in the compare.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def dedup_batch(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "week_bucket": pa.array(ts_us // WEEK_US),
            }
        )
        return t.group_by(["user_id", "week_bucket"]).aggregate([])

    def weeks_of_user(g: pd.DataFrame) -> pd.DataFrame:
        w = np.unique(g["week_bucket"].to_numpy())
        if len(w) == 0:
            return pd.DataFrame(
                {
                    "week_bucket": pd.Series([], dtype="int64"),
                    "new_users": pd.Series([], dtype="int64"),
                    "returning_users": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "week_bucket": w,
                "new_users": (w == w[0]).astype(np.int64),
                "returning_users": (w > w[0]).astype(np.int64),
            }
        )

    out = (
        ds.map_batches(dedup_batch, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(weeks_of_user)
        .groupby("week_bucket")
        .aggregate(
            Sum("new_users", alias_name="new_users"),
            Sum("returning_users", alias_name="returning_users"),
        )
        .to_pandas()
    )
    for c in ("week_bucket", "new_users", "returning_users"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("week_bucket").reset_index(drop=True)


WEEKLY_ACTIVE_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week_bucket
  FROM events),
fw AS (
  SELECT user_id, min(week_bucket) AS first_week FROM uw GROUP BY user_id)
SELECT week_bucket,
  count(*) FILTER (WHERE uw.week_bucket = fw.first_week)::BIGINT AS new_users,
  count(*) FILTER (WHERE uw.week_bucket > fw.first_week)::BIGINT
    AS returning_users
FROM uw JOIN fw USING (user_id)
GROUP BY week_bucket ORDER BY week_bucket
"""


# ---------------------------------------------------------------------------
# Trailing 7-day rolling distinct active users (window-expansion trick)
# ---------------------------------------------------------------------------

DAY_US = 24 * 3_600_000_000


def rolling_7d_active_users(sf_dir: str):
    """For every day bucket, the count of distinct users active in the
    trailing 7-day window [d-6, d] — rolling COUNT(DISTINCT), which no
    window aggregate expresses cheaply at scale.

    Plan: the window-expansion trick.  A user active on day d is
    active-in-window for exactly the 7 buckets d..d+6, so map-side
    (user, day) dedup + a per-user expansion to distinct contributed
    buckets turns rolling-distinct into a plain day-bucket count.
    ONE user-keyed exchange; the day groupby sums per-user 0/1
    partials.  Day buckets are integer ``epoch_us // DAY_US``; buckets
    past the last activity day are kept (the window is still defined
    there), matching the SQL expansion exactly.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def dedup_batch(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "day_bucket": pa.array(ts_us // DAY_US),
            }
        )
        return t.group_by(["user_id", "day_bucket"]).aggregate([])

    def windows_of_user(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["day_bucket"].to_numpy())
        exp = (
            np.unique((d[:, None] + np.arange(7, dtype=np.int64)).ravel())
            if len(d)
            else np.array([], dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "day_bucket": exp,
                "n": np.ones(len(exp), dtype=np.int64),
            }
        )

    out = (
        ds.map_batches(dedup_batch, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(windows_of_user)
        .groupby("day_bucket")
        .aggregate(Sum("n", alias_name="active_7d"))
        .to_pandas()
    )
    for c in ("day_bucket", "active_7d"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("day_bucket").reset_index(drop=True)


ROLLING_7D_ACTIVE_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day_bucket
  FROM events),
ex AS (
  SELECT DISTINCT user_id, day_bucket + i AS day_bucket
  FROM ud, generate_series(0, 6) AS t(i))
SELECT day_bucket, count(*)::BIGINT AS active_7d
FROM ex GROUP BY day_bucket ORDER BY day_bucket
"""


# ---------------------------------------------------------------------------
# Windowed funnel conversion: first-touch stage chain within a window
# (event_funnel above is the UNBOUNDED strict-after variant with a
# groupby(user) exchange; this one adds the conversion-window constraint
# and a shuffle-free broadcast-gate plan)
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_WINDOW_HOURS = 24
_FUNNEL_WINDOW_US = FUNNEL_WINDOW_HOURS * HOUR_US
# past this many stage-partial rows the driver-side merge SWITCHES to a
# Ray groupby(user_id).min (wired in event_funnel_windowed; the partial
# rows are (user, min_ts) pairs, user x batch-sized, NOT event-sized)
FUNNEL_DRIVER_MERGE_LIMIT = 20_000_000


def event_funnel_windowed(
    sf_dir: str, *, driver_merge_limit: int = FUNNEL_DRIVER_MERGE_LIMIT
):
    """First-touch funnel conversion over ``FUNNEL_STAGES``: stage 1 is a
    user's FIRST stage-1 event; stage k is the first stage-k event in
    ``[t_{k-1}, t_{k-1} + window)``.  Output: one row per stage with the
    user count that reached it — the classic product-analytics funnel,
    deterministic because every step takes a min.

    Plan: K pruned scans of events (one per stage), each a 3-column
    map-side filter + per-batch min-per-user partial; between stages the
    finalized (user -> stage time) map is broadcast as sorted arrays and
    the next scan attaches it by searchsorted, masking events outside
    the window BEFORE the partial min.  Nothing event-count-sized ever
    enters an exchange — each stage's partials are user-sized (the
    driver merge has the documented FUNNEL_DRIVER_MERGE_LIMIT valve).
    """
    prev: tuple[np.ndarray, np.ndarray] | None = None  # (users, t_us) sorted
    out_rows = []
    for k, stage in enumerate(FUNNEL_STAGES, start=1):
        prev_ref = ray.put(prev)

        def partial(batch: pa.Table, _stage=stage) -> pa.Table:
            et = batch["event_type"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(et == _stage))
            uid = batch["user_id"].to_numpy(zero_copy_only=False)
            ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            gate = ray.get(prev_ref)
            if gate is not None:
                gu, gt = gate
                if len(gu) == 0:
                    uid = uid[:0]
                    ts = ts[:0]
                else:
                    pos = np.searchsorted(gu, uid)
                    pos[pos == len(gu)] = 0
                    hit = gu[pos] == uid
                    t0 = gt[pos]
                    keep = hit & (ts >= t0) & (ts < t0 + _FUNNEL_WINDOW_US)
                    uid, ts = uid[keep], ts[keep]
            df = pd.DataFrame({"user_id": uid, "t_us": ts})
            g = df.groupby("user_id", as_index=False)["t_us"].min()
            return pa.Table.from_pandas(g, preserve_index=False)

        # Partials are materialized ONCE in the object store (user x
        # batch-sized, spillable) so the merge valve can count them
        # before deciding: at or under the limit the driver merges the
        # pandas frame; above it ONE Ray groupby(user_id).min finishes
        # the reduction distributed and only the user-sized result
        # lands on the driver (round-4 verdict ask #4 — the valve now
        # switches plans instead of raising; equality-gated at a
        # forced-low limit in tests/test_plan_switches.py).
        partials_ds = rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts"],
        ).map_batches(partial, batch_format="pyarrow").materialize()
        if partials_ds.count() > driver_merge_limit:
            from ray.data.aggregate import Min as _Min

            g = (
                partials_ds.groupby("user_id")
                .aggregate(_Min("t_us", alias_name="t_us"))
                .to_pandas()
            )
        else:
            g = partials_ds.to_pandas().groupby("user_id", as_index=False)[
                "t_us"
            ].min()
        g = g.sort_values("user_id")
        prev = (g["user_id"].to_numpy(), g["t_us"].to_numpy())
        out_rows.append((k, stage, np.int64(len(g))))

    return pd.DataFrame(
        out_rows, columns=["stage", "event_type", "n_users"]
    ).astype({"stage": np.int64, "n_users": np.int64})


EVENT_FUNNEL_WINDOWED_SQL = f"""
WITH s1 AS (
  SELECT user_id, min(ts) t FROM events
  WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(e.ts) t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts >= s1.t
    AND e.ts < s1.t + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(e.ts) t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts >= s2.t
    AND e.ts < s2.t + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR GROUP BY 1
)
SELECT 1::BIGINT AS stage, '{FUNNEL_STAGES[0]}' AS event_type,
       (SELECT count(*) FROM s1)::BIGINT AS n_users
UNION ALL
SELECT 2::BIGINT, '{FUNNEL_STAGES[1]}', (SELECT count(*) FROM s2)::BIGINT
UNION ALL
SELECT 3::BIGINT, '{FUNNEL_STAGES[2]}', (SELECT count(*) FROM s3)::BIGINT
ORDER BY stage
"""


# ---------------------------------------------------------------------------
# Cohort LTV curve: cumulative value by (first-active week, week offset)
# ---------------------------------------------------------------------------


def cohort_ltv(sf_dir: str):
    """Cumulative lifetime value per weekly cohort: users grouped by
    first-active week; for every week offset, the cohort's CUMULATIVE
    event value through that week (exact millis ints) — the revenue
    counterpart of ``user_retention_cohorts``'s count triangle.

    Same single-exchange plan: per-batch prep pre-aggregates to
    (user, week, value_millis) partials (the shuffle carries user-week
    rows, never events), each user group derives cohort + offsets in
    one pass, and the (cohort, offset) groupby is cohorts x offsets
    sized; the running sum over offsets happens driver-side on that
    tiny frame — the only ordered step, never distributed.  Matches
    COHORT_LTV_SQL's window cumsum row-for-row."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        w = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // WEEK_US
        )
        v = _millis(batch["value"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"user_id": u, "week": w, "value_millis": v})
        g = df.groupby(["user_id", "week"], as_index=False)[
            "value_millis"
        ].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("week", as_index=False)["value_millis"].sum()
        weeks = gg["week"].to_numpy()
        cohort = weeks.min()
        return pd.DataFrame(
            {
                "cohort_week": np.full(len(weeks), cohort, dtype=np.int64),
                "week_offset": weeks - cohort,
                "value_millis": gg["value_millis"].to_numpy(),
            }
        )

    flat = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user)
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("value_millis", alias_name="value_millis"))
        .to_pandas()
    )
    flat = flat.sort_values(["cohort_week", "week_offset"]).reset_index(
        drop=True
    )
    flat["cum_value_millis"] = (
        flat.groupby("cohort_week")["value_millis"].cumsum()
    )
    for c in flat.columns:
        flat[c] = flat[c].astype(np.int64)
    return flat[["cohort_week", "week_offset", "cum_value_millis"]]


COHORT_LTV_SQL = f"""
WITH uv AS (
  SELECT user_id, epoch_us(ts) // {WEEK_US} AS week,
         sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), c AS (
  SELECT user_id, min(week) AS cohort_week FROM uv GROUP BY 1
), per AS (
  SELECT c.cohort_week, uv.week - c.cohort_week AS week_offset,
         sum(uv.v) AS v
  FROM uv JOIN c USING (user_id) GROUP BY 1, 2
)
SELECT cohort_week::BIGINT AS cohort_week,
       week_offset::BIGINT AS week_offset,
       sum(v) OVER (PARTITION BY cohort_week ORDER BY week_offset
                    ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_value_millis
FROM per
ORDER BY cohort_week, week_offset
"""
