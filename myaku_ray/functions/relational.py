"""Relational pipelines over the TPC-H-ish tables (Ray-Data-first).

Join strategy notes (SURVEY.md §2.4): dimension sides (region, nation,
customer at these scales) are broadcast via ``ray.put`` and looked up
map-side inside ``map_batches`` — no shuffle.  The only shuffles are the
final small ``groupby`` aggregates over pre-aggregated partials.  At
production scale the orders⋈lineitem side would switch to the documented
hash-bucket partitioned join; the pre-aggregation (combine per batch,
then groupby over partials) is the piece that holds at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

Q1_CUTOFF = "1998-09-01"


def _cents(x: np.ndarray) -> np.ndarray:
    """floor(x*100 + 0.5) as int64 — matches SQL CAST(floor(x*100.0+0.5) AS BIGINT)."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _millis(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1000.0 + 0.5).astype(np.int64)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 analog: pricing summary by (returnflag, linestatus)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )

    cutoff = np.datetime64(Q1_CUTOFF)

    def prep(batch: pa.Table) -> pa.Table:
        # Map-side combiner: collapse the batch to <=|groups| partial rows
        # (6 here) BEFORE the exchange, so the groupby shuffles partials,
        # not the 600k filtered lineitem rows.  Arrow's hash aggregate
        # keeps the cent sums exact int64.
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ship <= cutoff))
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rows = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pa.array(qty.astype(np.int64)),
                "price_cents": pa.array(_cents(price)),
                "disc_price_cents": pa.array(_cents(price * (1.0 - disc))),
                "cnt": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        part = rows.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_cents", "sum"),
             ("disc_price_cents", "sum"), ("cnt", "sum")]
        )
        return part.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "price_cents",
             "disc_price_cents", "cnt"]
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_base_price_cents"),
            Sum("disc_price_cents", alias_name="sum_disc_price_cents"),
            Sum("cnt", alias_name="count_order"),
        )
    )
    return out


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
  CAST(sum(CAST(floor(l_extendedprice*(1.0::DOUBLE - l_discount)*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def top_orders_by_revenue(sf_dir: str, k: int = 10):
    """Top-k orders by discounted revenue, hydrated with customer info.

    lineitem is pre-aggregated per batch (combiner) before the groupby;
    orders/customer are read filtered to the k winners (bounded)."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        key = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = _cents(price * (1.0 - disc))
        df = pd.DataFrame({"l_orderkey": key, "revenue_cents": cents})
        g = df.groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    # materialized: the aggregate is consumed twice below (top-k window,
    # then the tie filter) — without this the lineitem scan + shuffle
    # would re-execute for the second pass.  Result is order-cardinality
    # (2 ints/order), bounded.
    rev = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .materialize()
    )
    # Tie-safe top-k: find the k-th revenue value, then pull EVERY order at or
    # above it (the tie group is bounded by key cardinality at one revenue
    # value, not by k), and only then apply the (revenue desc, orderkey asc)
    # total order.  A fixed limit(k*c) could miss tied keys past the window.
    head = rev.sort("revenue_cents", descending=True).limit(k).to_pandas()
    if len(head) < k:
        top = head.sort_values(
            ["revenue_cents", "l_orderkey"], ascending=[False, True]
        )
    else:
        kth = int(head["revenue_cents"].iloc[-1])
        top = (
            rev.map_batches(
                lambda b: b.filter(
                    pa.compute.greater_equal(b["revenue_cents"], kth)
                ),
                batch_format="pyarrow",
            )
            .to_pandas()
            .sort_values(["revenue_cents", "l_orderkey"], ascending=[False, True])
            .head(k)
        )

    import pyarrow.dataset as pads

    orders = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        filter=pads.field("o_orderkey").isin(top["l_orderkey"].tolist()),
    ).to_pandas()
    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
        columns=["c_custkey", "c_name", "c_mktsegment"],
        filter=pads.field("c_custkey").isin(orders["o_custkey"].tolist()),
    ).to_pandas()
    out = top.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    out = out.sort_values(["revenue_cents", "l_orderkey"], ascending=[False, True])
    return out[["l_orderkey", "revenue_cents", "c_name", "c_mktsegment"]].reset_index(
        drop=True
    )


TOP_ORDERS_SQL = """
SELECT l.l_orderkey, l.revenue_cents, c.c_name, c.c_mktsegment
FROM (
  SELECT l_orderkey,
    CAST(sum(CAST(floor(l_extendedprice*(1.0::DOUBLE - l_discount)*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem GROUP BY l_orderkey
) l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY l.revenue_cents DESC, l.l_orderkey
LIMIT 10
"""


def customers_per_region(sf_dir: str):
    """customer ⋈ nation ⋈ region via broadcast map-side lookup."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    # Dense nationkey -> region-name array so the map stage is one
    # vectorized take instead of a per-row dict chain.
    name_by_nation = np.array(
        [r2name[n2r[k]] if k in n2r else "" for k in range(max(n2r) + 1)],
        dtype=object,
    )
    lookup_ref = ray.put(name_by_nation)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        lut = ray.get(lookup_ref)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = lut[nk]
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "r_name": pa.array(names, pa.string()),
                "acctbal_cents": pa.array(_cents(bal)),
            }
        )

    return (
        cust.map_batches(tag, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Count(alias_name="n_customers"),
            Sum("acctbal_cents", alias_name="sum_acctbal_cents"),
        )
    )


CUSTOMERS_PER_REGION_SQL = """
SELECT r.r_name,
  count(*) AS n_customers,
  CAST(sum(CAST(floor(c.c_acctbal*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
"""


# ---------------------------------------------------------------------------
# Fact x fact hash-bucket co-partitioned join (the 100-TB join plan)
# ---------------------------------------------------------------------------

JOIN_BUCKETS = 16


def revenue_by_priority_bucketed(sf_dir: str):
    """lineitem ⋈ orders where NEITHER side is broadcastable — the
    documented scale plan implemented for real: both tables are written
    ONCE hive-partitioned by ``orderkey % B`` (the write IS the
    exchange, exactly like the postings layout), then one Ray task per
    bucket joins its two co-located slices and pre-aggregates; the
    driver merges B vocabulary-sized partials.  No row ever moves
    through a groupby/sort all-to-all, and the bucketed layouts are
    reusable/resumable artifacts.

    Output: revenue + line counts per o_orderpriority (DuckDB-oracled).
    """
    import glob
    import os
    import shutil

    key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    root = f"/tmp/myaku_ray_join/{key}_{JOIN_BUCKETS}"
    li_dir, od_dir = f"{root}/lineitem", f"{root}/orders"
    marker = f"{root}/_SUCCESS"
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)

        def li_prep(batch: pa.Table) -> pa.Table:
            keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_orderkey": batch["l_orderkey"],
                    "revenue_cents": pa.array(_cents(price * (1.0 - disc))),
                    "bucket": pa.array((keys % JOIN_BUCKETS).astype(np.int32)),
                }
            )

        def od_prep(batch: pa.Table) -> pa.Table:
            keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": batch["o_orderkey"],
                    "o_orderpriority": batch["o_orderpriority"],
                    "bucket": pa.array((keys % JOIN_BUCKETS).astype(np.int32)),
                }
            )

        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        ).map_batches(li_prep, batch_format="pyarrow").write_parquet(
            li_dir, partition_cols=["bucket"]
        )
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"],
        ).map_batches(od_prep, batch_format="pyarrow").write_parquet(
            od_dir, partition_cols=["bucket"]
        )
        with open(marker, "w") as f:
            f.write("ok")

    @ray.remote
    def join_bucket(li_files: list, od_files: list) -> pa.Table:
        import pyarrow.parquet as pq

        li_t = pa.concat_tables([pq.read_table(f) for f in li_files]).to_pandas()
        od_t = pa.concat_tables([pq.read_table(f) for f in od_files]).to_pandas()
        j = li_t.merge(od_t, left_on="l_orderkey", right_on="o_orderkey")
        g = j.groupby("o_orderpriority", as_index=False).agg(
            sum_revenue_cents=("revenue_cents", "sum"),
            n_lineitems=("revenue_cents", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def files_of(d: str) -> dict[int, list]:
        out: dict[int, list] = {}
        for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
            for part in f.split(os.sep):
                if part.startswith("bucket="):
                    out.setdefault(int(part.split("=")[1]), []).append(f)
        return out

    li_map, od_map = files_of(li_dir), files_of(od_dir)
    parts = ray.get(
        [
            join_bucket.remote(li_map[b], od_map.get(b, []))
            for b in sorted(li_map)
            if od_map.get(b)
        ]
    )
    merged = pa.concat_tables(parts).to_pandas()
    out = merged.groupby("o_orderpriority", as_index=False).agg(
        sum_revenue_cents=("sum_revenue_cents", "sum"),
        n_lineitems=("n_lineitems", "sum"),
    )
    out["sum_revenue_cents"] = out["sum_revenue_cents"].astype(np.int64)
    out["n_lineitems"] = out["n_lineitems"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


REVENUE_BY_PRIORITY_SQL = """
SELECT o.o_orderpriority,
  CAST(sum(CAST(floor(l.l_extendedprice*(1.0::DOUBLE - l.l_discount)*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_revenue_cents,
  count(*) AS n_lineitems
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


# ---------------------------------------------------------------------------
# Selective 3-table join (TPC-H Q3 shape): customer ⋈ orders ⋈ lineitem
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01"
# Above this many filtered orders the broadcast semi-join side must
# switch to the hive-bucketed co-partition plan (revenue_by_priority_
# bucketed's layout, with the segment/date filters applied at layout
# write).  At TPC-H selectivity (~1/5 segment x ~1/2 date) that is
# ~3% of orders rows as (key, date, priority) triples — broadcastable
# to ~1e8 orders, switched past it.
Q3_BROADCAST_LIMIT = 5_000_000


def shipping_priority_q3(
    sf_dir: str, k: int = 10, *, broadcast_limit: int = Q3_BROADCAST_LIMIT
):
    """TPC-H Q3 analog: top-k undelivered orders by revenue for one
    market segment.

    Plan (the 100-TB shape): the selective dimensions flow INTO the
    fact scan as broadcasts, never the other way.  customer is filtered
    to the segment and only its custkeys are broadcast (sorted int64
    array, searchsorted membership — no dict, no hash build per batch);
    orders is scanned once with column pruning, date-filtered map-side,
    semi-joined against the custkey broadcast, and the surviving
    (orderkey, orderdate, priority) triples — the selective side —
    are broadcast into the lineitem scan, which pre-aggregates revenue
    per orderkey inside each batch before the single result-sized
    groupby.  Tie-safe top-k via the kth-value threshold (the
    top_orders_by_revenue pattern).
    """
    import pyarrow.dataset as pads

    cutoff = np.datetime64(Q3_DATE)

    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
        columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == Q3_SEGMENT,
    )
    custkeys = np.sort(cust["c_custkey"].to_numpy(zero_copy_only=False))
    cust_ref = ray.put(custkeys)

    def orders_filter(batch: pa.Table) -> pa.Table:
        keys = ray.get(cust_ref)
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(od < cutoff))
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            hit = np.zeros(len(ck), dtype=bool)
        else:
            pos = np.searchsorted(keys, ck)
            pos[pos == len(keys)] = 0
            hit = keys[pos] == ck
        return batch.filter(pa.array(hit)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )

    # The segment+date semi-join output — (key, date, priority) triples
    # at ~3% selectivity — is materialized ONCE in the object store
    # (spillable, never a driver pull) so the scale switch can count it
    # before deciding: at or under the broadcast limit the triples pull
    # to the driver and broadcast into the lineitem scan (below);
    # above it the co-partition fallback joins bucketed layouts with no
    # driver materialization at all (round-4 verdict ask #4 — the valve
    # now switches plans instead of raising).
    surviving_ds = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        )
        .map_batches(orders_filter, batch_format="pyarrow")
        .materialize()
    )
    if surviving_ds.count() > broadcast_limit:
        return _q3_bucketed(sf_dir, surviving_ds, k, cutoff)
    surviving = (
        surviving_ds.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    )
    okeys = surviving["o_orderkey"].to_numpy()
    okeys_ref = ray.put(okeys)

    def li_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(okeys_ref)
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ship > cutoff))
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            hit = np.zeros(len(ok), dtype=bool)
        else:
            pos = np.searchsorted(keys, ok)
            pos[pos == len(keys)] = 0
            hit = keys[pos] == ok
        batch = batch.filter(pa.array(hit))
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"l_orderkey": ok, "revenue_cents": _cents(price * (1.0 - disc))}
        )
        g = df.groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .materialize()
    )
    head = rev.sort("revenue_cents", descending=True).limit(k).to_pandas()
    if len(head) >= k:
        kth = int(head["revenue_cents"].iloc[-1])
        head = (
            rev.map_batches(
                lambda b: b.filter(pa.compute.greater_equal(b["revenue_cents"], kth)),
                batch_format="pyarrow",
            ).to_pandas()
        )
    top = head.sort_values(
        ["revenue_cents", "l_orderkey"], ascending=[False, True]
    ).head(k)
    out = top.merge(surviving, left_on="l_orderkey", right_on="o_orderkey")
    out = out.sort_values(["revenue_cents", "l_orderkey"], ascending=[False, True])
    return out[
        ["l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority"]
    ].reset_index(drop=True)


def _bucket_files(d: str) -> dict[int, list]:
    """bucket id -> parquet files of one hive ``bucket=`` layout."""
    import glob
    import os

    out: dict[int, list] = {}
    for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
        for part in f.split(os.sep):
            if part.startswith("bucket="):
                out.setdefault(int(part.split("=")[1]), []).append(f)
    return out


def _q3_bucketed(sf_dir: str, surviving_ds, k: int, cutoff) -> pd.DataFrame:
    """Q3 co-partition fallback past the broadcast valve: the filtered
    orders triples and per-batch lineitem revenue partials are hive-
    written bucketed by ``orderkey % JOIN_BUCKETS`` (the write IS the
    exchange — ``revenue_by_priority_bucketed``'s layout); one task per
    bucket joins its co-located slices, finishes the revenue aggregate
    (complete within the bucket) and keeps its tie-safe local top-k
    under the global total order (revenue DESC, orderkey ASC); the
    driver merges B x k candidate rows — every global top-k row is in
    its bucket's top-k, so the merge is exact.  Equality-gated vs the
    broadcast plan at a forced-low limit (tests/test_plan_switches.py)."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="myaku_q3_")
    od_dir, li_dir = f"{root}/orders", f"{root}/lineitem"
    try:

        def od_bucket(batch: pa.Table) -> pa.Table:
            keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "bucket", pa.array((keys % JOIN_BUCKETS).astype(np.int32))
            )

        surviving_ds.map_batches(
            od_bucket, batch_format="pyarrow"
        ).write_parquet(od_dir, partition_cols=["bucket"])

        def li_partial_bucketed(batch: pa.Table) -> pa.Table:
            ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(ship > cutoff))
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            df = pd.DataFrame(
                {"l_orderkey": ok, "revenue_cents": _cents(price * (1.0 - disc))}
            )
            g = df.groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
            g["bucket"] = (g["l_orderkey"].to_numpy() % JOIN_BUCKETS).astype(
                np.int32
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ).map_batches(li_partial_bucketed, batch_format="pyarrow").write_parquet(
            li_dir, partition_cols=["bucket"]
        )

        @ray.remote
        def join_bucket(li_files: list, od_files: list, k: int) -> pa.Table:
            import pyarrow.parquet as pq

            li_t = pa.concat_tables(
                [pq.read_table(f) for f in li_files]
            ).to_pandas()
            od_t = pa.concat_tables(
                [pq.read_table(f) for f in od_files]
            ).to_pandas()
            g = li_t.groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
            j = g.merge(od_t, left_on="l_orderkey", right_on="o_orderkey")
            j = j.sort_values(
                ["revenue_cents", "l_orderkey"], ascending=[False, True]
            ).head(k)
            return pa.Table.from_pandas(
                j[["l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority"]],
                preserve_index=False,
            )

        li_map, od_map = _bucket_files(li_dir), _bucket_files(od_dir)
        parts = ray.get(
            [
                join_bucket.remote(li_map[b], od_map[b], k)
                for b in sorted(li_map)
                if od_map.get(b)
            ]
        )
        if not parts:
            return pd.DataFrame(
                {
                    "l_orderkey": pd.Series(dtype=np.int64),
                    "revenue_cents": pd.Series(dtype=np.int64),
                    "o_orderdate": pd.Series(dtype="datetime64[us]"),
                    "o_orderpriority": pd.Series(dtype=object),
                }
            )
        merged = pa.concat_tables(parts).to_pandas()
        out = merged.sort_values(
            ["revenue_cents", "l_orderkey"], ascending=[False, True]
        ).head(k)
        return out.reset_index(drop=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SHIPPING_PRIORITY_Q3_SQL = f"""
SELECT l.l_orderkey,
  CAST(sum(CAST(floor(l.l_extendedprice*(1.0::DOUBLE - l.l_discount)*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
  o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l.l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, l.l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Dim-chain + fact x fact join (TPC-H Q5 shape): region→nation→
# (customer, supplier)→orders⋈lineitem with the nation-equality predicate
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_YEAR_START = "1996-01-01"
Q5_YEAR_END = "1997-01-01"


def local_supplier_revenue_q5(sf_dir: str):
    """TPC-H Q5 analog: revenue per nation where the customer's and the
    supplier's nation coincide inside one region, for one order year.

    Plan: region/nation/supplier/customer are dimension-side — their
    key→nation maps are broadcast once (``ray.put``; supplier and
    customer are 1/10 and 1/15 of orders in TPC-H, int32 maps — at a
    scale where customer itself stops being broadcastable the custkey→
    nation attach moves into its own bucketed layout, same plan as
    below).  The two FACT tables never broadcast: both are written once
    hive-partitioned by ``orderkey % B`` with the region/date filters
    and the nation attach applied map-side AT LAYOUT WRITE (lineitem
    rows come out as per-(orderkey, s_nation) revenue partials), then
    one task per bucket joins co-located slices on orderkey +
    nation-equality and emits nation-sized partials; the driver merges
    B tiny tables.  The write IS the exchange — no groupby all-to-all.
    """
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(region.loc[region["r_name"] == Q5_REGION, "r_regionkey"].iloc[0])
    in_region = nation[nation["n_regionkey"] == rkey]
    region_nations = np.sort(in_region["n_nationkey"].to_numpy().astype(np.int32))
    nation_names = dict(zip(in_region["n_nationkey"], in_region["n_name"]))

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas().sort_values("s_suppkey")
    s_keys = supp["s_suppkey"].to_numpy()
    s_nat = supp["s_nationkey"].to_numpy().astype(np.int32)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas().sort_values("c_custkey")
    c_keys = cust["c_custkey"].to_numpy()
    c_nat = cust["c_nationkey"].to_numpy().astype(np.int32)
    s_ref = ray.put((s_keys, s_nat))
    c_ref = ray.put((c_keys, c_nat))
    rn_ref = ray.put(region_nations)

    d0 = np.datetime64(Q5_YEAR_START)
    d1 = np.datetime64(Q5_YEAR_END)

    key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    root = f"/tmp/myaku_ray_join_q5/{key}_{JOIN_BUCKETS}"
    li_dir, od_dir = f"{root}/lineitem", f"{root}/orders"
    marker = f"{root}/_SUCCESS"
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)

        def li_prep(batch: pa.Table) -> pa.Table:
            skeys, snat = ray.get(s_ref)
            rn = ray.get(rn_ref)
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            nat = snat[np.searchsorted(skeys, sk)]
            keep = np.isin(nat, rn)
            batch = batch.filter(pa.array(keep))
            nat = nat[keep]
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            df = pd.DataFrame(
                {
                    "l_orderkey": ok,
                    "s_nation": nat,
                    "revenue_cents": _cents(price * (1.0 - disc)),
                }
            )
            g = df.groupby(["l_orderkey", "s_nation"], as_index=False)[
                "revenue_cents"
            ].sum()
            g["bucket"] = (g["l_orderkey"] % JOIN_BUCKETS).astype(np.int32)
            return pa.Table.from_pandas(g, preserve_index=False)

        def od_prep(batch: pa.Table) -> pa.Table:
            ckeys, cnat = ray.get(c_ref)
            rn = ray.get(rn_ref)
            od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array((od >= d0) & (od < d1)))
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
            nat = cnat[np.searchsorted(ckeys, ck)]
            keep = np.isin(nat, rn)
            batch = batch.filter(pa.array(keep))
            keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": batch["o_orderkey"],
                    "c_nation": pa.array(nat[keep]),
                    "bucket": pa.array((keys % JOIN_BUCKETS).astype(np.int32)),
                }
            )

        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(li_prep, batch_format="pyarrow").write_parquet(
            li_dir, partition_cols=["bucket"]
        )
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(od_prep, batch_format="pyarrow").write_parquet(
            od_dir, partition_cols=["bucket"]
        )
        with open(marker, "w") as f:
            f.write("ok")

    @ray.remote
    def join_bucket(li_files: list, od_files: list) -> pa.Table:
        import pyarrow.parquet as pqq

        li_t = pa.concat_tables([pqq.read_table(f) for f in li_files]).to_pandas()
        od_t = pa.concat_tables([pqq.read_table(f) for f in od_files]).to_pandas()
        j = li_t.merge(od_t, left_on="l_orderkey", right_on="o_orderkey")
        j = j[j["s_nation"] == j["c_nation"]]
        g = j.groupby("s_nation", as_index=False)["revenue_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def files_of(d: str) -> dict[int, list]:
        out: dict[int, list] = {}
        for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
            for part in f.split(os.sep):
                if part.startswith("bucket="):
                    out.setdefault(int(part.split("=")[1]), []).append(f)
        return out

    li_map, od_map = files_of(li_dir), files_of(od_dir)
    parts = ray.get(
        [
            join_bucket.remote(li_map[b], od_map.get(b, []))
            for b in sorted(li_map)
            if od_map.get(b)
        ]
    )
    merged = pa.concat_tables(parts).to_pandas()
    out = merged.groupby("s_nation", as_index=False)["revenue_cents"].sum()
    out["n_name"] = out["s_nation"].map(nation_names)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    out = out.sort_values(
        ["revenue_cents", "n_name"], ascending=[False, True]
    ).reset_index(drop=True)
    return out[["n_name", "revenue_cents"]]


LOCAL_SUPPLIER_REVENUE_Q5_SQL = f"""
SELECT n.n_name,
  CAST(sum(CAST(floor(l.l_extendedprice*(1.0::DOUBLE - l.l_discount)*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_YEAR_START} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q5_YEAR_END} 00:00:00'
GROUP BY n.n_name
ORDER BY revenue_cents DESC, n.n_name
"""


# ---------------------------------------------------------------------------
# Part-filtered profit rollup (TPC-H Q9 shape): lineitem ⋈ part ⋈
# supplier ⋈ orders, grouped by (nation, order-year)
# ---------------------------------------------------------------------------

Q9_PART_TYPE = "ECONOMY"


def part_type_profit_q9(sf_dir: str):
    """TPC-H Q9 analog: profit per (supplier nation, order year) for
    parts of one type.

    Same physical plan family as Q5: the part filter and the
    supplier→nation attach are dimension-side broadcasts applied inside
    the lineitem scan (the filtered-partkey set is ~1/6 of part — the
    documented broadcast-limit switch applies past ~1e8 keys); the
    orderkey→year attach is fact-sided, so both fact tables are written
    once hive-partitioned by ``orderkey % B`` (lineitem leaves the scan
    as per-(orderkey, nation) profit partials, orders as (orderkey,
    year) pairs) and one task per bucket joins co-located slices.  No
    groupby all-to-all ever sees a raw lineitem row.
    """
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nation_names = dict(zip(nation["n_nationkey"], nation["n_name"]))

    import pyarrow.dataset as pads

    pk = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey"], filter=pads.field("p_type") == Q9_PART_TYPE
    )
    partkeys = np.sort(pk["p_partkey"].to_numpy(zero_copy_only=False))

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas().sort_values("s_suppkey")
    s_keys = supp["s_suppkey"].to_numpy()
    s_nat = supp["s_nationkey"].to_numpy().astype(np.int32)
    pk_ref = ray.put(partkeys)
    s_ref = ray.put((s_keys, s_nat))

    key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    root = f"/tmp/myaku_ray_join_q9/{key}_{JOIN_BUCKETS}"
    li_dir, od_dir = f"{root}/lineitem", f"{root}/orders"
    marker = f"{root}/_SUCCESS"
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)

        def li_prep(batch: pa.Table) -> pa.Table:
            pks = ray.get(pk_ref)
            skeys, snat = ray.get(s_ref)
            lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            if len(pks) == 0:
                keep = np.zeros(len(lpk), dtype=bool)
            else:
                pos = np.searchsorted(pks, lpk)
                pos[pos == len(pks)] = 0
                keep = pks[pos] == lpk
            batch = batch.filter(pa.array(keep))
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            nat = snat[np.searchsorted(skeys, sk)]
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            df = pd.DataFrame(
                {
                    "l_orderkey": ok,
                    "nation": nat,
                    "profit_cents": _cents(price * (1.0 - disc)),
                }
            )
            g = df.groupby(["l_orderkey", "nation"], as_index=False)[
                "profit_cents"
            ].sum()
            g["bucket"] = (g["l_orderkey"] % JOIN_BUCKETS).astype(np.int32)
            return pa.Table.from_pandas(g, preserve_index=False)

        def od_prep(batch: pa.Table) -> pa.Table:
            od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
            year = od.astype("datetime64[Y]").astype(np.int64) + 1970
            keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": batch["o_orderkey"],
                    "o_year": pa.array(year.astype(np.int32)),
                    "bucket": pa.array((keys % JOIN_BUCKETS).astype(np.int32)),
                }
            )

        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount",
            ],
        ).map_batches(li_prep, batch_format="pyarrow").write_parquet(
            li_dir, partition_cols=["bucket"]
        )
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"],
        ).map_batches(od_prep, batch_format="pyarrow").write_parquet(
            od_dir, partition_cols=["bucket"]
        )
        with open(marker, "w") as f:
            f.write("ok")

    @ray.remote
    def join_bucket(li_files: list, od_files: list) -> pa.Table:
        import pyarrow.parquet as pqq

        li_t = pa.concat_tables([pqq.read_table(f) for f in li_files]).to_pandas()
        od_t = pa.concat_tables([pqq.read_table(f) for f in od_files]).to_pandas()
        j = li_t.merge(od_t, left_on="l_orderkey", right_on="o_orderkey")
        g = j.groupby(["nation", "o_year"], as_index=False)["profit_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def files_of(d: str) -> dict[int, list]:
        out: dict[int, list] = {}
        for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
            for part in f.split(os.sep):
                if part.startswith("bucket="):
                    out.setdefault(int(part.split("=")[1]), []).append(f)
        return out

    li_map, od_map = files_of(li_dir), files_of(od_dir)
    parts = ray.get(
        [
            join_bucket.remote(li_map[b], od_map.get(b, []))
            for b in sorted(li_map)
            if od_map.get(b)
        ]
    )
    merged = pa.concat_tables(parts).to_pandas()
    out = merged.groupby(["nation", "o_year"], as_index=False)[
        "profit_cents"
    ].sum()
    out["n_name"] = out["nation"].map(nation_names)
    out["o_year"] = out["o_year"].astype(np.int32)
    out["profit_cents"] = out["profit_cents"].astype(np.int64)
    out = out.sort_values(["n_name", "o_year"]).reset_index(drop=True)
    return out[["n_name", "o_year", "profit_cents"]]


PART_TYPE_PROFIT_Q9_SQL = f"""
SELECT n.n_name,
  CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
  CAST(sum(CAST(floor(l.l_extendedprice*(1.0::DOUBLE - l.l_discount)*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_type = '{Q9_PART_TYPE}'
GROUP BY n.n_name, o_year
ORDER BY n.n_name, o_year
"""


# ---------------------------------------------------------------------------
# Aggregate-then-semi-join (TPC-H Q18 shape): large-volume orders
# ---------------------------------------------------------------------------

Q18_QTY_THRESHOLD = 300
# The HAVING filter is extremely selective (sum(l_quantity) > 300 keeps
# ~0.08% of orders at TPC-H distributions), so the winner set is pulled
# to the driver and its keys drive FILTERED parquet point-reads of
# orders/customer.  Past this many winners the hydration side must
# switch to the hive-bucketed co-partition join instead.
Q18_WINNER_LIMIT = 2_000_000
# Below this many ORDERS the per-batch partials (2 ints per distinct
# orderkey per batch — near-final when lineitem is clustered by order)
# are merged on the driver with one pandas groupby instead of paying
# Ray's all-to-all aggregate: same driver/distributed scale switch as
# dedup_exact, equality-gated in tests/test_r4_session6.py.  Orders
# cardinality comes from parquet metadata (exact, free).
Q18_DRIVER_AGG_LIMIT = 20_000_000


def large_volume_customers_q18(
    sf_dir: str, limit: int = 100, *, winner_limit: int = Q18_WINNER_LIMIT
):
    """TPC-H Q18 analog: orders whose total quantity exceeds a threshold,
    hydrated with the buying customer.

    Plan (the 100-TB shape): the ONLY corpus-sized work is one scan of
    lineitem's two relevant columns with a per-batch combiner, so the
    exchange carries (orderkey, qty) partials, not raw rows — and below
    ``Q18_DRIVER_AGG_LIMIT`` orders there is NO exchange at all: the
    partials stream to the driver and one pandas groupby finishes them
    (order-cardinality, 2 ints/row).  The HAVING gate then shrinks the
    aggregate to a winner set tiny enough to broadcast; orders and
    customer are never scanned — they are read with pushed-down key
    filters (row-group pruning does the pointy work), exactly how a
    fact->dim hydration should look when the driving side is
    result-sized.
    """
    import pyarrow.parquet as _pq

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        key = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"l_orderkey": key, "sum_qty": qty})
        g = df.groupby("l_orderkey", as_index=False)["sum_qty"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = li.map_batches(partial, batch_format="pyarrow")
    n_orders = _pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    winners_ds = None
    if n_orders <= Q18_DRIVER_AGG_LIMIT:
        merged = partials.to_pandas()
        sums = merged.groupby("l_orderkey", as_index=False)["sum_qty"].sum()
        winners = sums[sums["sum_qty"] > Q18_QTY_THRESHOLD].reset_index(
            drop=True
        )
    else:
        # winners stay a materialized Dataset until the switch decides:
        # a set small enough to broadcast pulls to the driver; a bigger
        # one goes straight to the co-partition hydration without ever
        # landing driver-side (round-4 verdict ask #4; forced-low-limit
        # equality gate in tests/test_plan_switches.py)
        winners_ds = (
            partials.groupby("l_orderkey")
            .aggregate(Sum("sum_qty", alias_name="sum_qty"))
            .map_batches(
                lambda b: b.filter(
                    pa.compute.greater(b["sum_qty"], Q18_QTY_THRESHOLD)
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        winners = (
            winners_ds.to_pandas()
            if winners_ds.count() <= winner_limit
            else None
        )

    if winners is not None and len(winners) <= winner_limit:
        # broadcast arm: orders/customer are point-read with pushed-down
        # key filters — never scanned
        import pyarrow.dataset as pads

        orders = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
            filter=pads.field("o_orderkey").isin(
                winners["l_orderkey"].tolist()
            ),
        ).to_pandas()
        top = winners.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        top["totalprice_cents"] = _cents(top["o_totalprice"].to_numpy())
        top = top.sort_values(
            ["totalprice_cents", "l_orderkey"], ascending=[False, True]
        ).head(limit)
    else:
        if winners_ds is None:
            winners_ds = rd.from_pandas(winners)
        top = _q18_bucketed_top(sf_dir, winners_ds, limit)

    import pyarrow.dataset as pads

    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
        columns=["c_custkey", "c_name"],
        filter=pads.field("c_custkey").isin(top["o_custkey"].tolist()),
    ).to_pandas()
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["sum_qty"] = out["sum_qty"].astype(np.int64)
    out = out.sort_values(
        ["totalprice_cents", "l_orderkey"], ascending=[False, True]
    )
    return out[
        ["c_name", "c_custkey", "l_orderkey", "o_orderdate",
         "totalprice_cents", "sum_qty"]
    ].reset_index(drop=True)


def _q18_bucketed_top(sf_dir: str, winners_ds, limit: int) -> pd.DataFrame:
    """Q18 co-partition hydration past the winner-broadcast valve: the
    winner (orderkey, sum_qty) rows and a full orders scan are hive-
    written bucketed by ``orderkey % JOIN_BUCKETS``; one task per
    bucket joins its slices and keeps its local top-``limit`` under the
    global total order (totalprice_cents DESC, orderkey ASC) — every
    global winner is in its bucket's top-limit, so the driver merge of
    B x limit rows is exact."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="myaku_q18_")
    w_dir, o_dir = f"{root}/winners", f"{root}/orders"
    try:

        def w_bucket(batch: pa.Table) -> pa.Table:
            keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "bucket", pa.array((keys % JOIN_BUCKETS).astype(np.int32))
            )

        winners_ds.map_batches(w_bucket, batch_format="pyarrow").write_parquet(
            w_dir, partition_cols=["bucket"]
        )

        def o_bucket(batch: pa.Table) -> pa.Table:
            keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "bucket", pa.array((keys % JOIN_BUCKETS).astype(np.int32))
            )

        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        ).map_batches(o_bucket, batch_format="pyarrow").write_parquet(
            o_dir, partition_cols=["bucket"]
        )

        @ray.remote
        def join_bucket(w_files: list, o_files: list, limit: int) -> pa.Table:
            import pyarrow.parquet as pq

            w_t = pa.concat_tables(
                [pq.read_table(f) for f in w_files]
            ).to_pandas()
            o_t = pa.concat_tables(
                [pq.read_table(f) for f in o_files]
            ).to_pandas()
            j = w_t.merge(o_t, left_on="l_orderkey", right_on="o_orderkey")
            j["totalprice_cents"] = _cents(j["o_totalprice"].to_numpy())
            j = j.sort_values(
                ["totalprice_cents", "l_orderkey"], ascending=[False, True]
            ).head(limit)
            return pa.Table.from_pandas(
                j[
                    [
                        "l_orderkey", "sum_qty", "o_orderkey", "o_custkey",
                        "o_orderdate", "totalprice_cents",
                    ]
                ],
                preserve_index=False,
            )

        w_map, o_map = _bucket_files(w_dir), _bucket_files(o_dir)
        parts = ray.get(
            [
                join_bucket.remote(w_map[b], o_map[b], limit)
                for b in sorted(w_map)
                if o_map.get(b)
            ]
        )
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return pd.DataFrame(
                {
                    "l_orderkey": pd.Series(dtype=np.int64),
                    "sum_qty": pd.Series(dtype=np.int64),
                    "o_orderkey": pd.Series(dtype=np.int64),
                    "o_custkey": pd.Series(dtype=np.int64),
                    "o_orderdate": pd.Series(dtype="datetime64[us]"),
                    "totalprice_cents": pd.Series(dtype=np.int64),
                }
            )
        merged = pa.concat_tables(parts).to_pandas()
        return (
            merged.sort_values(
                ["totalprice_cents", "l_orderkey"], ascending=[False, True]
            )
            .head(limit)
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


LARGE_VOLUME_Q18_SQL = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey AS l_orderkey, o.o_orderdate,
  CAST(floor(o.o_totalprice*100.0 + 0.5) AS BIGINT) AS totalprice_cents,
  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > {Q18_QTY_THRESHOLD})
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice_cents DESC, l_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Returned-item revenue (TPC-H Q10 shape): top customers by returned
# revenue in one quarter
# ---------------------------------------------------------------------------

Q10_DATE_START = "1996-01-01"
Q10_DATE_END = "1996-04-01"
Q10_TOPK = 20
# One quarter keeps ~1/26 of orders (TPC-H date range spans ~6.5y); the
# surviving (orderkey, custkey) pairs broadcast into the lineitem scan.
# Past this many survivors the plan switches to the bucketed
# co-partition join, same switch as Q3.
Q10_BROADCAST_LIMIT = 5_000_000


def _q10_bucketed_partials(sf_dir: str, surviving_ds):
    """Q10 co-partition fallback past the broadcast valve: the quarter's
    (orderkey, custkey) pairs and the R-filtered lineitem revenue
    partials are hive-written bucketed by ``orderkey % JOIN_BUCKETS``;
    one task per bucket joins its co-located slices and aggregates to
    per-custkey partials (custkeys span buckets, so the caller's single
    groupby(c_custkey) exchange finishes them — the same downstream as
    the broadcast arm).  Returns a Dataset of (c_custkey,
    revenue_cents) partial rows via from_arrow_refs (never pulled to
    the driver)."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="myaku_q10_")
    od_dir, li_dir = f"{root}/orders", f"{root}/lineitem"
    try:

        def od_bucket(batch: pa.Table) -> pa.Table:
            keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "bucket", pa.array((keys % JOIN_BUCKETS).astype(np.int32))
            )

        surviving_ds.map_batches(
            od_bucket, batch_format="pyarrow"
        ).write_parquet(od_dir, partition_cols=["bucket"])

        def li_bucket(batch: pa.Table) -> pa.Table:
            flag = batch["l_returnflag"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(flag == "R"))
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            df = pd.DataFrame(
                {"l_orderkey": ok, "revenue_cents": _cents(price * (1.0 - disc))}
            )
            g = df.groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
            g["bucket"] = (g["l_orderkey"].to_numpy() % JOIN_BUCKETS).astype(
                np.int32
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount",
            ],
        ).map_batches(li_bucket, batch_format="pyarrow").write_parquet(
            li_dir, partition_cols=["bucket"]
        )

        @ray.remote
        def join_bucket(li_files: list, od_files: list) -> pa.Table:
            import pyarrow.parquet as pq

            li_t = pa.concat_tables(
                [pq.read_table(f) for f in li_files]
            ).to_pandas()
            od_t = pa.concat_tables(
                [pq.read_table(f, columns=["o_orderkey", "o_custkey"])
                 for f in od_files]
            ).to_pandas()
            j = li_t.merge(od_t, left_on="l_orderkey", right_on="o_orderkey")
            g = j.groupby("o_custkey", as_index=False)["revenue_cents"].sum()
            g = g.rename(columns={"o_custkey": "c_custkey"})
            return pa.Table.from_pandas(g, preserve_index=False)

        li_map, od_map = _bucket_files(li_dir), _bucket_files(od_dir)
        refs = [
            join_bucket.remote(li_map[b], od_map[b])
            for b in sorted(li_map)
            if od_map.get(b)
        ]
        ray.wait(refs, num_returns=len(refs))  # before the tmp dir dies
        if not refs:
            return rd.from_arrow(
                pa.table(
                    {
                        "c_custkey": pa.array([], pa.int64()),
                        "revenue_cents": pa.array([], pa.int64()),
                    }
                )
            )
        return rd.from_arrow_refs(refs)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def returned_item_revenue_q10(
    sf_dir: str, k: int = Q10_TOPK, *, broadcast_limit: int = Q10_BROADCAST_LIMIT
):
    """TPC-H Q10 analog: top-k customers by revenue lost to returned
    items in one quarter.

    Plan: orders is scanned once (column-pruned, date-filtered map-side)
    and its surviving (orderkey -> custkey) pairs — the selective side —
    broadcast as sorted int64 arrays into the lineitem scan; lineitem
    filters l_returnflag = 'R' map-side, attaches custkey by
    searchsorted, and pre-aggregates revenue per custkey inside each
    batch, so the single groupby exchange carries customer-sized
    partials.  Tie-safe top-k via the kth-value threshold, then the k
    winners hydrate customer + nation via filtered point-reads.
    """
    d0, d1 = np.datetime64(Q10_DATE_START), np.datetime64(Q10_DATE_END)

    def orders_filter(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((od >= d0) & (od < d1))).select(
            ["o_orderkey", "o_custkey"]
        )

    # Materialize the quarter's (orderkey, custkey) pairs ONCE in the
    # object store so the switch can count before pulling: at or under
    # the limit they broadcast into the lineitem scan; above it the
    # co-partition arm joins bucketed layouts and feeds the SAME
    # downstream aggregate as customer-sized partials (round-4 verdict
    # ask #4 — the valve switches plans instead of raising; forced-low-
    # limit equality gate in tests/test_plan_switches.py).
    surviving_ds = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )
        .map_batches(orders_filter, batch_format="pyarrow")
        .materialize()
    )
    if surviving_ds.count() > broadcast_limit:
        cust_partials = _q10_bucketed_partials(sf_dir, surviving_ds)
    else:
        surviving = surviving_ds.to_pandas().sort_values("o_orderkey")
        okeys = surviving["o_orderkey"].to_numpy()
        ocust = surviving["o_custkey"].to_numpy()
        ok_ref = ray.put((okeys, ocust))

        def li_partial(batch: pa.Table) -> pa.Table:
            keys, custs = ray.get(ok_ref)
            flag = batch["l_returnflag"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(flag == "R"))
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                hit = np.zeros(len(ok), dtype=bool)
                pos = np.zeros(len(ok), dtype=np.int64)
            else:
                pos = np.searchsorted(keys, ok)
                pos[pos == len(keys)] = 0
                hit = keys[pos] == ok
            price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)[hit]
            ck = custs[pos[hit]]
            df = pd.DataFrame(
                {"c_custkey": ck, "revenue_cents": _cents(price * (1.0 - disc))}
            )
            g = df.groupby("c_custkey", as_index=False)["revenue_cents"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        cust_partials = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount",
            ],
        ).map_batches(li_partial, batch_format="pyarrow")

    rev = (
        cust_partials.groupby("c_custkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .materialize()
    )
    head = rev.sort("revenue_cents", descending=True).limit(k).to_pandas()
    if len(head) >= k:
        kth = int(head["revenue_cents"].iloc[-1])
        head = rev.map_batches(
            lambda b: b.filter(pa.compute.greater_equal(b["revenue_cents"], kth)),
            batch_format="pyarrow",
        ).to_pandas()
    top = head.sort_values(
        ["revenue_cents", "c_custkey"], ascending=[False, True]
    ).head(k)

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filter=pads.field("c_custkey").isin(top["c_custkey"].tolist()),
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = top.merge(cust, on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    out["acctbal_cents"] = _cents(out["c_acctbal"].to_numpy())
    out = out.sort_values(
        ["revenue_cents", "c_custkey"], ascending=[False, True]
    )
    return out[
        ["c_custkey", "c_name", "revenue_cents", "acctbal_cents", "n_name"]
    ].reset_index(drop=True)


RETURNED_REVENUE_Q10_SQL = f"""
SELECT c.c_custkey, c.c_name,
  CAST(sum(CAST(floor(l.l_extendedprice*(1.0::DOUBLE - l.l_discount)*100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
  CAST(floor(c.c_acctbal*100.0 + 0.5) AS BIGINT) AS acctbal_cents,
  n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{Q10_DATE_START} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q10_DATE_END} 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue_cents DESC, c.c_custkey
LIMIT {Q10_TOPK}
"""


# ---------------------------------------------------------------------------
# Left-join count distribution (TPC-H Q13 shape): customers by order count
# ---------------------------------------------------------------------------


def customer_order_distribution_q13(sf_dir: str):
    """TPC-H Q13 analog: distribution of customers by how many orders
    they placed, INCLUDING the zero-order bucket (the left-join
    semantics that a plain inner groupby cannot express).

    Plan: one scan of orders' custkey column with a per-batch combiner
    feeds a groupby(custkey) count — customer-sized, 2 ints/row.  The
    count-of-counts is a second exchange over THAT aggregate, so it is
    distribution-sized (max orders per customer).  The zero bucket needs
    only two scalars: |customer| (a count(*) over one column) and the
    number of distinct ordering customers, already the first aggregate's
    cardinality — no row of customer ever joins anything.
    """
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"c_custkey": key})
        g = df.groupby("c_custkey", as_index=False).size()
        g = g.rename(columns={"size": "n_orders"})
        g["n_orders"] = g["n_orders"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .materialize()
    )
    dist = (
        per_cust.groupby("n_orders")
        .aggregate(Count(alias_name="n_customers"))
        .to_pandas()
    )
    n_customers_total = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    n_with_orders = int(dist["n_customers"].sum())
    zero = n_customers_total - n_with_orders
    if zero > 0:
        dist = pd.concat(
            [dist, pd.DataFrame({"n_orders": [0], "n_customers": [zero]})],
            ignore_index=True,
        )
    dist["n_orders"] = dist["n_orders"].astype(np.int64)
    dist["n_customers"] = dist["n_customers"].astype(np.int64)
    return dist.sort_values("n_orders").reset_index(drop=True)


CUSTOMER_ORDER_DIST_Q13_SQL = """
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
GROUP BY n_orders
ORDER BY n_orders
"""


# ---------------------------------------------------------------------------
# EXISTS semi-join with inequality (TPC-H Q4 shape): late-shipment orders
# ---------------------------------------------------------------------------

Q4_LATE_DAYS = 60
Q4_LATE_US = Q4_LATE_DAYS * 86_400_000_000
# Same driver/distributed switch as Q18: below this many orders the
# per-batch (orderkey, max_shipdate) partials merge driver-side; above
# it a Ray groupby(orderkey).max finishes them.
Q4_DRIVER_AGG_LIMIT = 20_000_000


def late_shipment_orders_q4(sf_dir: str):
    """TPC-H Q4 analog: orders per priority having AT LEAST ONE lineitem
    shipped more than ``Q4_LATE_DAYS`` after the order date — the
    EXISTS-with-inequality semi-join shape.

    The EXISTS collapses exactly: ``EXISTS(l.shipdate > o.date + T)``
    ⇔ ``max(l.shipdate) > o.date + T``, so the corpus-sized work is one
    2-column lineitem scan with a per-batch max combiner (the exchange
    carries (orderkey, max_ship) partials — or nothing at all below the
    driver-merge limit), and the orders scan consumes the result as a
    broadcast sorted array: searchsorted attach, vectorized date
    compare, per-batch priority-count partials, 5-row driver merge.
    Neither fact table ever enters an all-to-all.
    """
    import pyarrow.parquet as _pq

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        key = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ship = (
            batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        df = pd.DataFrame({"l_orderkey": key, "max_ship_us": ship})
        g = df.groupby("l_orderkey", as_index=False)["max_ship_us"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = li.map_batches(li_partial, batch_format="pyarrow")
    n_orders = _pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    if n_orders <= Q4_DRIVER_AGG_LIMIT:
        merged = partials.to_pandas()
        ship = merged.groupby("l_orderkey", as_index=False)["max_ship_us"].max()
    else:
        ship = (
            partials.groupby("l_orderkey")
            .aggregate(Max("max_ship_us", alias_name="max_ship_us"))
            .to_pandas()
        )
    ship = ship.sort_values("l_orderkey")
    okeys = ship["l_orderkey"].to_numpy()
    maxship = ship["max_ship_us"].to_numpy()
    ship_ref = ray.put((okeys, maxship))

    def od_partial(batch: pa.Table) -> pa.Table:
        keys, ms = ray.get(ship_ref)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        od = (
            batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        if len(keys) == 0:
            late = np.zeros(len(ok), dtype=bool)
        else:
            pos = np.searchsorted(keys, ok)
            pos[pos == len(keys)] = 0
            hit = keys[pos] == ok
            late = hit & (ms[pos] > od + Q4_LATE_US)
        pr = batch["o_orderpriority"].to_numpy(zero_copy_only=False)[late]
        df = pd.DataFrame({"o_orderpriority": pr})
        g = df.groupby("o_orderpriority", as_index=False).size()
        g = g.rename(columns={"size": "n_late"})
        g["n_late"] = g["n_late"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )
        .map_batches(od_partial, batch_format="pyarrow")
        .to_pandas()
    )
    out = parts.groupby("o_orderpriority", as_index=False)["n_late"].sum()
    out["n_late"] = out["n_late"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


LATE_SHIPMENT_Q4_SQL = f"""
SELECT o.o_orderpriority, count(*) AS n_late
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


# ---------------------------------------------------------------------------
# Conditional aggregate over a broadcast dimension (TPC-H Q14 shape):
# promotion revenue share per ship month
# ---------------------------------------------------------------------------

Q14_START = "1996-01-01"
Q14_END = "1997-01-01"
Q14_PROMO_TYPE = "PROMO"


def promo_revenue_q14(sf_dir: str):
    """TPC-H Q14 analog: per ship month of one year, the revenue from
    promo-type parts vs all parts (the CASE-WHEN conditional aggregate).

    Plan: the promo partkey set (one part-type slice of a dimension
    table) broadcasts once as a sorted int64 array; ONE column-pruned
    lineitem scan filters the ship window map-side, marks promo
    membership by searchsorted, and pre-aggregates (promo, total)
    revenue per month inside each batch — so the only exchange is
    <=12-row partials merged on the driver.  Revenue rides exact int64
    millis; the share is the one float, computed once per output row
    from exact sums and rounded to 6 decimals.
    """
    import pyarrow.dataset as pads

    pk = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey"],
        filter=pads.field("p_type") == Q14_PROMO_TYPE,
    )
    promo = np.sort(pk["p_partkey"].to_numpy(zero_copy_only=False))
    p_ref = ray.put(promo)
    d0, d1 = np.datetime64(Q14_START), np.datetime64(Q14_END)

    def partial(batch: pa.Table) -> pa.Table:
        pks = ray.get(p_ref)
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array((sd >= d0) & (sd < d1)))
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        month = (sd.astype("datetime64[M]").astype(np.int64) % 12) + 1
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        if len(pks):
            pos = np.searchsorted(pks, lpk)
            pos[pos == len(pks)] = 0
            is_promo = pks[pos] == lpk
        else:
            is_promo = np.zeros(len(lpk), dtype=bool)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = _millis(price * (1.0 - disc))
        df = pd.DataFrame(
            {
                "month": month,
                "promo_millis": np.where(is_promo, rev, 0),
                "total_millis": rev,
            }
        )
        g = df.groupby("month", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    out = (
        parts.groupby("month", as_index=False)[["promo_millis", "total_millis"]]
        .sum()
        .sort_values("month")
        .reset_index(drop=True)
    )
    out["month"] = out["month"].astype(np.int64)
    out["promo_millis"] = out["promo_millis"].astype(np.int64)
    out["total_millis"] = out["total_millis"].astype(np.int64)
    out["promo_share_r"] = np.round(
        out["promo_millis"].to_numpy() / out["total_millis"].to_numpy(), 6
    )
    return out


PROMO_REVENUE_Q14_SQL = f"""
WITH w AS (
  SELECT CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS month,
    CAST(floor(l_extendedprice*(1.0-l_discount)*1000.0 + 0.5) AS BIGINT)
      AS rev,
    (p_type = '{Q14_PROMO_TYPE}') AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= DATE '{Q14_START}' AND l_shipdate < DATE '{Q14_END}')
SELECT month,
  sum(CASE WHEN is_promo THEN rev ELSE 0 END)::BIGINT AS promo_millis,
  sum(rev)::BIGINT AS total_millis,
  round(sum(CASE WHEN is_promo THEN rev ELSE 0 END)::DOUBLE
        / sum(rev)::DOUBLE, 6) AS promo_share_r
FROM w GROUP BY month ORDER BY month
"""


# ---------------------------------------------------------------------------
# Aggregate -> broadcast -> re-scan (TPC-H Q17 shape): revenue from
# small-quantity orders of one brand
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#23"
# per-part (count, sum) stats for one brand are brand-slice-sized
# (~|part|/|brands| rows); past this many parts the stats side must move
# to a partkey-bucketed co-partition join instead of a broadcast
Q17_BROADCAST_LIMIT = 5_000_000


def _q17_bucketed(sf_dir: str, bk_ref, _member) -> pd.DataFrame:
    """Q17 co-partition fallback past the broadcast valve: brand-filtered
    lineitem rows are hive-written bucketed by ``partkey % JOIN_BUCKETS``
    — each bucket holds every row of its parts, so one task per bucket
    computes the per-part (n, sum qty) stats AND the exact-integer
    ``qty * 5 * n < sum`` predicate locally and returns a single
    (n_rows, revenue_cents) partial; the driver sums B scalars.  ONE
    lineitem scan instead of the broadcast arm's two."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="myaku_q17_")
    li_dir = f"{root}/lineitem"
    try:

        def li_bucket(batch: pa.Table) -> pa.Table:
            keys = ray.get(bk_ref)
            lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(_member(lpk, keys)))
            lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "bucket", pa.array((lpk % JOIN_BUCKETS).astype(np.int32))
            )

        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        ).map_batches(li_bucket, batch_format="pyarrow").write_parquet(
            li_dir, partition_cols=["bucket"]
        )

        @ray.remote
        def bucket_partial(files: list) -> pa.Table:
            import pyarrow.parquet as pq

            t = pa.concat_tables([pq.read_table(f) for f in files])
            lpk = t["l_partkey"].to_numpy(zero_copy_only=False)
            qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            df = pd.DataFrame({"k": lpk, "n": 1, "sq": qty})
            st = df.groupby("k").sum()
            n = st["n"].reindex(lpk).to_numpy()
            sq = st["sq"].reindex(lpk).to_numpy()
            keep = qty * 5 * n < sq
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            return pa.table(
                {
                    "n_rows": pa.array([np.int64(keep.sum())]),
                    "revenue_cents": pa.array([_cents(price).sum()]),
                }
            )

        li_map = _bucket_files(li_dir)
        parts = ray.get(
            [bucket_partial.remote(li_map[b]) for b in sorted(li_map)]
        )
        n_rows = sum(int(p["n_rows"][0].as_py()) for p in parts)
        rev = sum(int(p["revenue_cents"][0].as_py()) for p in parts)
        return pd.DataFrame(
            {
                "n_rows": pd.Series([n_rows], dtype="int64"),
                "revenue_cents": pd.Series([rev], dtype="int64"),
            }
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def small_quantity_revenue_q17(
    sf_dir: str, *, broadcast_limit: int = Q17_BROADCAST_LIMIT
):
    """TPC-H Q17 analog: total revenue from lineitems of one brand
    whose quantity is below 20% of that part's average quantity —
    the aggregate -> broadcast -> re-scan shape (the inner aggregate
    must complete before any row can be judged).

    The 20%-of-average predicate is evaluated in EXACT integer
    arithmetic: quantities are integral, so ``qty < 0.2 * (sum/n)``
    is ``qty * 5 * n < sum`` — no float division anywhere (integer
    thresholds beat float ones).  Scan 1 computes per-part (n, sum)
    restricted to the broadcast brand partkeys with per-batch
    combiners; the brand-slice-sized stats broadcast back; scan 2
    re-filters and sums revenue cents.  Nothing corpus-sized crosses
    an exchange — both scans emit bounded partials.
    """
    import pyarrow.dataset as pads

    pk = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey"], filter=pads.field("p_brand") == Q17_BRAND
    )
    brand_keys = np.sort(pk["p_partkey"].to_numpy(zero_copy_only=False))
    bk_ref = ray.put(brand_keys)

    def _member(lpk: np.ndarray, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(len(lpk), dtype=bool)
        pos = np.searchsorted(keys, lpk)
        pos[pos == len(keys)] = 0
        return keys[pos] == lpk

    def stats_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(bk_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(_member(lpk, keys)))
        df = pd.DataFrame(
            {
                "l_partkey": batch["l_partkey"].to_numpy(zero_copy_only=False),
                "n": np.ones(batch.num_rows, dtype=np.int64),
                "sq": batch["l_quantity"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = df.groupby("l_partkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    # Stats partials are materialized ONCE so the switch can count
    # before pulling: at or under the limit the per-part (n, sum)
    # stats broadcast back into a second lineitem scan; above it the
    # partkey-bucketed co-partition arm runs — ONE layout write where
    # each bucket holds a part's COMPLETE rows, so its task computes
    # the per-part stats AND applies the predicate locally, returning
    # one scalar partial per bucket (round-4 verdict ask #4; forced-
    # low-limit equality gate in tests/test_plan_switches.py).
    stats_ds = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
        )
        .map_batches(stats_partial, batch_format="pyarrow")
        .materialize()
    )
    # partial rows upper-bound the distinct-part count; conservative
    if stats_ds.count() > broadcast_limit:
        return _q17_bucketed(sf_dir, bk_ref, _member)
    stats = (
        stats_ds.to_pandas()
        .groupby("l_partkey", as_index=False)
        .sum()
        .sort_values("l_partkey")
    )
    st_ref = ray.put(
        (
            stats["l_partkey"].to_numpy(),
            stats["n"].to_numpy(),
            stats["sq"].to_numpy(),
        )
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        keys, n, sq = ray.get(st_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        m = _member(lpk, keys)
        batch = batch.filter(pa.array(m))
        lpk = lpk[m]
        pos = np.searchsorted(keys, lpk)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = qty * 5 * n[pos] < sq[pos]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "n_rows": pa.array([np.int64(keep.sum())]),
                "revenue_cents": pa.array([_cents(price).sum()]),
            }
        )

    parts = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(rev_partial, batch_format="pyarrow")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_rows": pd.Series([parts["n_rows"].sum()], dtype="int64"),
            "revenue_cents": pd.Series(
                [parts["revenue_cents"].sum()], dtype="int64"
            ),
        }
    )


SMALL_QUANTITY_Q17_SQL = f"""
WITH pb AS (SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}'),
s AS (
  SELECT l_partkey, count(*)::BIGINT AS n,
         sum(CAST(l_quantity AS BIGINT)) AS sq
  FROM lineitem JOIN pb ON l_partkey = p_partkey
  GROUP BY l_partkey)
SELECT count(*)::BIGINT AS n_rows,
  coalesce(sum(CAST(floor(l.l_extendedprice*100.0 + 0.5) AS BIGINT)),
           0)::BIGINT AS revenue_cents
FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey
WHERE CAST(l.l_quantity AS BIGINT) * 5 * s.n < s.sq
"""


# ---------------------------------------------------------------------------
# Scalar subquery + anti-join (TPC-H Q22 shape): high-balance customers
# with no recent orders
# ---------------------------------------------------------------------------

Q22_CUTOFF = "1998-01-01"
# the anti-join side (distinct custkeys with a recent order) is
# customer-bounded; past this many keys it must become a custkey-bucketed
# co-partition anti-join instead of a broadcast set
Q22_BROADCAST_LIMIT = 20_000_000


def _q22_bucketed(sf_dir: str, active_ds, n_pos: int, s_pos: int) -> pd.DataFrame:
    """Q22 co-partition fallback past the broadcast valve: the active
    custkeys and the balance-filtered customers are hive-written
    bucketed by ``custkey % JOIN_BUCKETS``; one task per bucket runs
    the anti-join on its co-located slices (np.isin against the
    bucket's active keys) and returns <=|segments| partial rows; the
    driver merges B x segments rows.  The exact-integer balance
    predicate (``cents * n > s``) is applied map-side at the layout
    write, so only above-mean customers ever enter the exchange."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="myaku_q22_")
    a_dir, c_dir = f"{root}/active", f"{root}/customer"
    try:

        def a_bucket(batch: pa.Table) -> pa.Table:
            keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "bucket", pa.array((keys % JOIN_BUCKETS).astype(np.int32))
            )

        active_ds.map_batches(a_bucket, batch_format="pyarrow").write_parquet(
            a_dir, partition_cols=["bucket"]
        )

        def c_bucket(batch: pa.Table) -> pa.Table:
            cents = _cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
            keep = cents * n_pos > s_pos
            keys = batch["c_custkey"].to_numpy(zero_copy_only=False)[keep]
            return pa.table(
                {
                    "c_custkey": pa.array(keys),
                    "c_mktsegment": batch["c_mktsegment"].filter(
                        pa.array(keep)
                    ),
                    "acctbal_cents": pa.array(cents[keep]),
                    "bucket": pa.array(
                        (keys % JOIN_BUCKETS).astype(np.int32)
                    ),
                }
            )

        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment", "c_acctbal"],
        ).map_batches(c_bucket, batch_format="pyarrow").write_parquet(
            c_dir, partition_cols=["bucket"]
        )

        @ray.remote
        def anti_join_bucket(c_files: list, a_files: list) -> pa.Table:
            import pyarrow.parquet as pq

            c_t = pa.concat_tables(
                [pq.read_table(f) for f in c_files]
            ).to_pandas()
            if a_files:
                act = np.unique(
                    pa.concat_tables(
                        [pq.read_table(f, columns=["o_custkey"])
                         for f in a_files]
                    )["o_custkey"].to_numpy(zero_copy_only=False)
                )
                c_t = c_t[~np.isin(c_t["c_custkey"].to_numpy(), act)]
            g = c_t.assign(n_custs=np.int64(1)).groupby(
                "c_mktsegment", as_index=False
            )[["n_custs", "acctbal_cents"]].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        c_map, a_map = _bucket_files(c_dir), _bucket_files(a_dir)
        parts = ray.get(
            [
                anti_join_bucket.remote(c_map[b], a_map.get(b, []))
                for b in sorted(c_map)
            ]
        )
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return pd.DataFrame(
                {
                    "c_mktsegment": pd.Series([], dtype="object"),
                    "n_custs": pd.Series([], dtype="int64"),
                    "acctbal_cents": pd.Series([], dtype="int64"),
                }
            )
        merged = pa.concat_tables(parts).to_pandas()
        out = (
            merged.groupby("c_mktsegment", as_index=False)[
                ["n_custs", "acctbal_cents"]
            ]
            .sum()
            .sort_values("c_mktsegment")
            .reset_index(drop=True)
        )
        out["n_custs"] = out["n_custs"].astype(np.int64)
        out["acctbal_cents"] = out["acctbal_cents"].astype(np.int64)
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def idle_customer_balance_q22(
    sf_dir: str, *, broadcast_limit: int = Q22_BROADCAST_LIMIT
):
    """TPC-H Q22 analog: count + total balance, per market segment, of
    customers whose account balance is above the mean positive balance
    AND who placed no order since ``Q22_CUTOFF`` — the scalar-subquery +
    anti-join shape.

    The above-average predicate is exact integer arithmetic:
    ``acctbal > sum/n`` over positive balances is
    ``acctbal_cents * n > sum_cents`` — no float mean to diverge by an
    ulp.  Plan: (1) one customer scan reduces (count, sum) of positive
    balances to two scalars; (2) one date-filtered orders scan emits
    per-batch DISTINCT custkeys, unioned on the driver (customer-
    bounded, with the documented broadcast-limit switch); (3) the
    second customer scan applies both predicates map-side (searchsorted
    membership for the anti-join) and pre-aggregates per segment, so
    the final exchange is <=|segments| partial rows.
    """
    cust_cols = ["c_custkey", "c_mktsegment", "c_acctbal"]

    def pos_partial(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = bal[bal > 0.0]
        return pa.table(
            {
                "n": pa.array([np.int64(len(pos))]),
                "s": pa.array([_cents(pos).sum()]),
            }
        )

    tot = (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_acctbal"])
        .map_batches(pos_partial, batch_format="pyarrow")
        .to_pandas()
    )
    n_pos, s_pos = int(tot["n"].sum()), int(tot["s"].sum())

    cutoff = np.datetime64(Q22_CUTOFF)

    def active_partial(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False)[od >= cutoff]
        return pa.table({"o_custkey": pa.array(np.unique(keys))})

    # Active-custkey partials are materialized ONCE so the switch can
    # count before pulling (partial rows upper-bound the distinct set —
    # conservative): at or under the limit the sorted key array
    # broadcasts into the customer scan; above it the custkey-bucketed
    # co-partition anti-join runs (round-4 verdict ask #4; forced-low-
    # limit equality gate in tests/test_plan_switches.py).
    active_ds = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )
        .map_batches(active_partial, batch_format="pyarrow")
        .materialize()
    )
    if active_ds.count() > broadcast_limit:
        return _q22_bucketed(sf_dir, active_ds, n_pos, s_pos)
    active = np.unique(active_ds.to_pandas()["o_custkey"].to_numpy())
    a_ref = ray.put(active)

    def seg_partial(batch: pa.Table) -> pa.Table:
        act = ray.get(a_ref)
        cents = _cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
        if len(act):
            pos = np.searchsorted(act, keys)
            pos[pos == len(act)] = 0
            idle = act[pos] != keys
        else:
            idle = np.ones(len(keys), dtype=bool)
        keep = idle & (cents * n_pos > s_pos)
        df = pd.DataFrame(
            {
                "c_mktsegment": batch["c_mktsegment"]
                .to_numpy(zero_copy_only=False)[keep],
                "n_custs": np.ones(int(keep.sum()), dtype=np.int64),
                "acctbal_cents": cents[keep],
            }
        )
        g = df.groupby("c_mktsegment", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=cust_cols)
        .map_batches(seg_partial, batch_format="pyarrow")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "c_mktsegment": pd.Series([], dtype="object"),
                "n_custs": pd.Series([], dtype="int64"),
                "acctbal_cents": pd.Series([], dtype="int64"),
            }
        )
    out = (
        parts.groupby("c_mktsegment", as_index=False)[["n_custs", "acctbal_cents"]]
        .sum()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    out["n_custs"] = out["n_custs"].astype(np.int64)
    out["acctbal_cents"] = out["acctbal_cents"].astype(np.int64)
    return out


IDLE_CUSTOMER_Q22_SQL = f"""
WITH tot AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(floor(c_acctbal*100.0 + 0.5) AS BIGINT)) AS s
  FROM customer WHERE c_acctbal > 0),
active AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= DATE '{Q22_CUTOFF}')
SELECT c_mktsegment, count(*)::BIGINT AS n_custs,
  sum(CAST(floor(c_acctbal*100.0 + 0.5) AS BIGINT))::BIGINT AS acctbal_cents
FROM customer, tot
WHERE CAST(floor(c_acctbal*100.0 + 0.5) AS BIGINT) * tot.n > tot.s
  AND c_custkey NOT IN (SELECT o_custkey FROM active)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Two-sided dimension attach (TPC-H Q7 shape): bilateral trade volume
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_START = "1996-01-01"
Q7_END = "1998-01-01"
# the orders side carries only custkeys of the two nations (~2/25 of
# orders); past this many surviving orders the attach must switch to the
# orderkey-bucketed co-partition join (part_type_profit_q9)
Q7_BROADCAST_LIMIT = 5_000_000


def _q7_bucketed_parts(
    sf_dir: str, surviving_ds, s_ref, _attach, d0, d1
) -> pd.DataFrame:
    """Q7 co-partition fallback past the broadcast valve: the surviving
    (orderkey, cust_nat) pairs and the ship-window + supplier-nation
    filtered lineitem rows (already carrying supp_nat and year) are
    hive-written bucketed by ``orderkey % JOIN_BUCKETS``; one task per
    bucket joins its co-located slices, applies the cross-nation filter
    and aggregates to <=8 (supp_nat, cust_nat, year) partial rows; the
    driver merges B x 8 rows."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="myaku_q7_")
    od_dir, li_dir = f"{root}/orders", f"{root}/lineitem"
    try:

        def od_bucket(batch: pa.Table) -> pa.Table:
            keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "bucket", pa.array((keys % JOIN_BUCKETS).astype(np.int32))
            )

        surviving_ds.map_batches(
            od_bucket, batch_format="pyarrow"
        ).write_parquet(od_dir, partition_cols=["bucket"])

        def li_bucket(batch: pa.Table) -> pa.Table:
            sk, sn = ray.get(s_ref)
            sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array((sd >= d0) & (sd < d1)))
            lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            ms, supp_nat = _attach(lsk, sk, sn)
            batch = batch.filter(pa.array(ms))
            lok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
            price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_orderkey": pa.array(lok),
                    "supp_nat": pa.array(supp_nat.astype(np.int64)),
                    "l_year": pa.array(
                        sd.astype("datetime64[Y]").astype(np.int64) + 1970
                    ),
                    "revenue_millis": pa.array(_millis(price * (1.0 - disc))),
                    "bucket": pa.array(
                        (lok % JOIN_BUCKETS).astype(np.int32)
                    ),
                }
            )

        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate",
            ],
        ).map_batches(li_bucket, batch_format="pyarrow").write_parquet(
            li_dir, partition_cols=["bucket"]
        )

        @ray.remote
        def join_bucket(li_files: list, od_files: list) -> pa.Table:
            import pyarrow.parquet as pq

            li_t = pa.concat_tables(
                [pq.read_table(f) for f in li_files]
            ).to_pandas()
            od_t = pa.concat_tables(
                [pq.read_table(f, columns=["o_orderkey", "cust_nat"])
                 for f in od_files]
            ).to_pandas()
            j = li_t.merge(od_t, left_on="l_orderkey", right_on="o_orderkey")
            j = j[j["supp_nat"] != j["cust_nat"].astype(np.int64)]
            g = j.groupby(
                ["supp_nat", "cust_nat", "l_year"], as_index=False
            )["revenue_millis"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        li_map, od_map = _bucket_files(li_dir), _bucket_files(od_dir)
        parts = ray.get(
            [
                join_bucket.remote(li_map[b], od_map[b])
                for b in sorted(li_map)
                if od_map.get(b)
            ]
        )
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return pd.DataFrame(
                {
                    "supp_nat": pd.Series([], dtype="int64"),
                    "cust_nat": pd.Series([], dtype="int64"),
                    "l_year": pd.Series([], dtype="int64"),
                    "revenue_millis": pd.Series([], dtype="int64"),
                }
            )
        return pa.concat_tables(parts).to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def nation_trade_volume_q7(
    sf_dir: str, *, broadcast_limit: int = Q7_BROADCAST_LIMIT
):
    """TPC-H Q7 analog: shipped revenue between two nations per
    (supplier nation, customer nation, ship year) — the two-sided
    dimension attach: every lineitem needs BOTH its supplier's nation
    and (through orders) its customer's nation before the pair filter
    can run.

    Plan: supplier->nation and customer->nation (filtered to the two
    nations) broadcast as sorted arrays; ONE orders scan attaches the
    customer nation and emits only surviving (orderkey -> cust_nation)
    pairs — the selective side, broadcast with the documented limit
    switch; ONE lineitem scan filters the ship window map-side,
    attaches both nations by searchsorted, keeps cross pairs, and
    pre-aggregates revenue per (supp_nation, cust_nation, year) inside
    each batch, so the exchange is <=8 partial rows per batch merged on
    the driver.  Revenue rides exact int64 millis.
    """
    import pyarrow.parquet as _pq

    nation = _pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    keys_ab = nation.loc[
        nation["n_name"].isin([Q7_NATION_A, Q7_NATION_B]), "n_nationkey"
    ]
    nk_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ab = set(keys_ab.tolist())

    supp = (
        _pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        .to_pandas()
        .sort_values("s_suppkey")
    )
    supp = supp[supp["s_nationkey"].isin(ab)]
    s_ref = ray.put(
        (supp["s_suppkey"].to_numpy(), supp["s_nationkey"].to_numpy())
    )
    cust = (
        _pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        .to_pandas()
        .sort_values("c_custkey")
    )
    cust = cust[cust["c_nationkey"].isin(ab)]
    c_ref = ray.put(
        (cust["c_custkey"].to_numpy(), cust["c_nationkey"].to_numpy())
    )

    def _attach(keys: np.ndarray, table_keys: np.ndarray,
                table_vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(member_mask, value_for_members) by searchsorted."""
        if len(table_keys) == 0:
            return np.zeros(len(keys), dtype=bool), np.empty(0, np.int64)
        pos = np.searchsorted(table_keys, keys)
        pos[pos == len(table_keys)] = 0
        m = table_keys[pos] == keys
        return m, table_vals[pos[m]]

    def orders_pairs(batch: pa.Table) -> pa.Table:
        ck, cn = ray.get(c_ref)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        m, nat = _attach(keys, ck, cn)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(m)),
                "cust_nat": pa.array(nat.astype(np.int32)),
            }
        )

    # Materialize the surviving (orderkey -> cust_nation) pairs ONCE so
    # the switch can count before pulling: at or under the limit they
    # broadcast into the lineitem scan; above it the orderkey-bucketed
    # co-partition arm joins hive layouts (round-4 verdict ask #4;
    # forced-low-limit equality gate in tests/test_plan_switches.py).
    surviving_ds = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        .map_batches(orders_pairs, batch_format="pyarrow")
        .materialize()
    )
    d0, d1 = np.datetime64(Q7_START), np.datetime64(Q7_END)
    if surviving_ds.count() > broadcast_limit:
        parts = _q7_bucketed_parts(sf_dir, surviving_ds, s_ref, _attach, d0, d1)
    else:
        surviving = surviving_ds.to_pandas().sort_values("o_orderkey")
        o_ref = ray.put(
            (
                surviving["o_orderkey"].to_numpy(),
                surviving["cust_nat"].to_numpy().astype(np.int64),
            )
        )

        def li_partial(batch: pa.Table) -> pa.Table:
            sk, sn = ray.get(s_ref)
            ok, on = ray.get(o_ref)
            sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array((sd >= d0) & (sd < d1)))
            lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            ms, supp_nat = _attach(lsk, sk, sn)
            batch = batch.filter(pa.array(ms))
            lok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            mo, cust_nat = _attach(lok, ok, on)
            batch = batch.filter(pa.array(mo))
            supp_nat = supp_nat[mo]
            cross = supp_nat != cust_nat
            sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)[cross]
            price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[cross]
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)[cross]
            year = sd.astype("datetime64[Y]").astype(np.int64) + 1970
            df = pd.DataFrame(
                {
                    "supp_nat": supp_nat[cross],
                    "cust_nat": cust_nat[cross],
                    "l_year": year,
                    "revenue_millis": _millis(price * (1.0 - disc)),
                }
            )
            g = df.groupby(
                ["supp_nat", "cust_nat", "l_year"], as_index=False
            ).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = (
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=[
                    "l_orderkey", "l_suppkey", "l_extendedprice",
                    "l_discount", "l_shipdate",
                ],
            )
            .map_batches(li_partial, batch_format="pyarrow")
            .to_pandas()
        )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "supp_nation": pd.Series([], dtype="object"),
                "cust_nation": pd.Series([], dtype="object"),
                "l_year": pd.Series([], dtype="int64"),
                "revenue_millis": pd.Series([], dtype="int64"),
            }
        )
    out = (
        parts.groupby(["supp_nat", "cust_nat", "l_year"], as_index=False)[
            "revenue_millis"
        ]
        .sum()
        .reset_index(drop=True)
    )
    out["supp_nation"] = out["supp_nat"].map(nk_name)
    out["cust_nation"] = out["cust_nat"].map(nk_name)
    out["l_year"] = out["l_year"].astype(np.int64)
    out["revenue_millis"] = out["revenue_millis"].astype(np.int64)
    return (
        out[["supp_nation", "cust_nation", "l_year", "revenue_millis"]]
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )


NATION_TRADE_Q7_SQL = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
  sum(CAST(floor(l_extendedprice*(1.0-l_discount)*1000.0 + 0.5)
      AS BIGINT))::BIGINT AS revenue_millis
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ns ON ns.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation nc ON nc.n_nationkey = c_nationkey
WHERE ns.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND nc.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND ns.n_name <> nc.n_name
  AND l_shipdate >= DATE '{Q7_START}' AND l_shipdate < DATE '{Q7_END}'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Aggregate -> global max -> tie-keeping filter (TPC-H Q15 shape):
# top supplier(s) by shipped revenue in a quarter
# ---------------------------------------------------------------------------

Q15_START = "1996-01-01"
Q15_END = "1996-04-01"


def top_supplier_revenue_q15(sf_dir: str):
    """TPC-H Q15 analog: the supplier(s) with the highest shipped
    revenue in one quarter — ALL of them on a tie (the view + max
    subquery semantics, which a plain top-1 truncation would break).

    Plan: one column-pruned lineitem scan filters the window map-side
    and pre-aggregates revenue per suppkey inside each batch, so the
    one exchange carries supplier-sized partials; the global max and
    the tie-keeping filter run on the driver over that supplier-sized
    aggregate, then the winners hydrate supplier by filtered point-read.
    Revenue rides exact int64 millis — ties are exact, not
    float-approximate.
    """
    d0, d1 = np.datetime64(Q15_START), np.datetime64(Q15_END)

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array((sd >= d0) & (sd < d1)))
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "s_suppkey": batch["l_suppkey"].to_numpy(
                    zero_copy_only=False
                ),
                "total_revenue_millis": _millis(price * (1.0 - disc)),
            }
        )
        g = df.groupby("s_suppkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("total_revenue_millis", alias_name="total_revenue_millis"))
        .to_pandas()
    )
    if len(rev) == 0:
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "s_name": pd.Series([], dtype="object"),
                "total_revenue_millis": pd.Series([], dtype="int64"),
            }
        )
    best = int(rev["total_revenue_millis"].max())
    win = rev[rev["total_revenue_millis"] == best].copy()
    import pyarrow.dataset as pads

    sup = (
        pads.dataset(f"{sf_dir}/supplier.parquet")
        .to_table(
            columns=["s_suppkey", "s_name"],
            filter=pads.field("s_suppkey").isin(
                win["s_suppkey"].tolist()
            ),
        )
        .to_pandas()
    )
    out = win.merge(sup, on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["total_revenue_millis"] = out["total_revenue_millis"].astype(np.int64)
    return (
        out[["s_suppkey", "s_name", "total_revenue_millis"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


TOP_SUPPLIER_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
    sum(CAST(floor(l_extendedprice*(1.0-l_discount)*1000.0 + 0.5)
        AS BIGINT))::BIGINT AS total_revenue_millis
  FROM lineitem
  WHERE l_shipdate >= DATE '{Q15_START}' AND l_shipdate < DATE '{Q15_END}'
  GROUP BY 1)
SELECT rev.s_suppkey, s.s_name, rev.total_revenue_millis
FROM rev JOIN supplier s USING (s_suppkey)
WHERE rev.total_revenue_millis = (SELECT max(total_revenue_millis) FROM rev)
ORDER BY rev.s_suppkey
"""


# ---------------------------------------------------------------------------
# Pushdown-only conditional aggregate (TPC-H Q6 shape): forecast revenue
# ---------------------------------------------------------------------------

Q6_START = "1996-01-01"
Q6_END = "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 5, 7  # discount band in exact integer percent
Q6_QTY_CAP = 24


def forecast_revenue_q6(sf_dir: str):
    """TPC-H Q6 analog: revenue delta from lifting discounts in a band —
    the pure predicate-pushdown shape: one column-pruned scan, three
    vectorized row predicates, a scalar sum.  ZERO shuffles; each batch
    collapses to a 2-int partial and the driver adds ~|blocks| rows.

    The discount-band predicate is exact integer percent
    (``floor(d*100+0.5) BETWEEN 5 AND 7``) and quantities are integral,
    so no float boundary can flake the hash compare; revenue rides
    int64 millis of ``price * discount``.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    d0, d1 = np.datetime64(Q6_START), np.datetime64(Q6_END)

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        dpct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        keep = (
            (sd >= d0) & (sd < d1)
            & (dpct >= Q6_DISC_LO) & (dpct <= Q6_DISC_HI)
            & (qty < Q6_QTY_CAP)
        )
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        rev = _millis(price * disc[keep])
        return pa.table(
            {
                "revenue_millis": pa.array([int(rev.sum())], type=pa.int64()),
                "n_rows": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "revenue_millis": pd.Series(
                [int(parts["revenue_millis"].sum())], dtype="int64"
            ),
            "n_rows": pd.Series([int(parts["n_rows"].sum())], dtype="int64"),
        }
    )


FORECAST_REVENUE_Q6_SQL = f"""
SELECT
  coalesce(sum(CAST(floor(l_extendedprice*l_discount*1000.0 + 0.5)
               AS BIGINT)), 0)::BIGINT AS revenue_millis,
  count(*)::BIGINT AS n_rows
FROM lineitem
WHERE l_shipdate >= DATE '{Q6_START}' AND l_shipdate < DATE '{Q6_END}'
  AND CAST(floor(l_discount*100.0 + 0.5) AS BIGINT)
        BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY_CAP}
"""


# ---------------------------------------------------------------------------
# National market share (TPC-H Q8 shape): conditional ratio per year
# ---------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_PART_TYPE = "STANDARD"
Q8_NATION = "NATION_2"


def nation_market_share_q8(sf_dir: str):
    """TPC-H Q8 analog: within the market "customers of one region
    buying one part type", the per-order-year revenue share supplied by
    one nation — the conditional-ratio-over-a-join-tree shape.

    Plan: every dimension side (type-filtered partkeys, supplier→
    nationkey, region-filtered custkeys) broadcasts once and applies
    INSIDE the two fact scans (documented broadcast-limit switch past
    ~1e8 keys).  Lineitem leaves its scan as per-(orderkey) partials
    carrying (nation_millis, total_millis); orders leaves as
    region-filtered (orderkey, year) pairs; both are written once
    hive-partitioned by ``orderkey % JOIN_BUCKETS`` and one task per
    bucket inner-joins co-located slices (the Q9 plan).  The share is
    the one float, computed per output year from exact int64 sums and
    rounded to 6 decimals.
    """
    import glob
    import os
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(region.loc[region["r_name"] == Q8_REGION, "r_regionkey"].iloc[0])
    nkey = int(nation.loc[nation["n_name"] == Q8_NATION, "n_nationkey"].iloc[0])
    region_nations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )

    pk = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey"], filter=pads.field("p_type") == Q8_PART_TYPE
    )
    partkeys = np.sort(pk["p_partkey"].to_numpy(zero_copy_only=False))

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas().sort_values("s_suppkey")
    s_keys = supp["s_suppkey"].to_numpy()
    s_is_nation = (supp["s_nationkey"].to_numpy().astype(int) == nkey)

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    region_custkeys = np.sort(
        cust.loc[
            cust["c_nationkey"].astype(int).isin(region_nations), "c_custkey"
        ].to_numpy()
    )

    pk_ref = ray.put(partkeys)
    s_ref = ray.put((s_keys, s_is_nation))
    c_ref = ray.put(region_custkeys)

    key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    root = f"/tmp/myaku_ray_join_q8/{key}_{JOIN_BUCKETS}"
    li_dir, od_dir = f"{root}/lineitem", f"{root}/orders"
    marker = f"{root}/_SUCCESS"
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)

        def li_prep(batch: pa.Table) -> pa.Table:
            pks = ray.get(pk_ref)
            skeys, snat = ray.get(s_ref)
            lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            if len(pks) == 0:
                keep = np.zeros(len(lpk), dtype=bool)
            else:
                pos = np.searchsorted(pks, lpk)
                pos[pos == len(pks)] = 0
                keep = pks[pos] == lpk
            batch = batch.filter(pa.array(keep))
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            is_nat = snat[np.searchsorted(skeys, sk)]
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            rev = _millis(price * (1.0 - disc))
            df = pd.DataFrame(
                {
                    "l_orderkey": ok,
                    "nation_millis": np.where(is_nat, rev, 0),
                    "total_millis": rev,
                }
            )
            g = df.groupby("l_orderkey", as_index=False).sum()
            g["bucket"] = (g["l_orderkey"] % JOIN_BUCKETS).astype(np.int32)
            return pa.Table.from_pandas(g, preserve_index=False)

        def od_prep(batch: pa.Table) -> pa.Table:
            cks = ray.get(c_ref)
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
            if len(cks) == 0:
                keep = np.zeros(len(ck), dtype=bool)
            else:
                pos = np.searchsorted(cks, ck)
                pos[pos == len(cks)] = 0
                keep = cks[pos] == ck
            batch = batch.filter(pa.array(keep))
            od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
            year = od.astype("datetime64[Y]").astype(np.int64) + 1970
            keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": batch["o_orderkey"],
                    "o_year": pa.array(year.astype(np.int32)),
                    "bucket": pa.array((keys % JOIN_BUCKETS).astype(np.int32)),
                }
            )

        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount",
            ],
        ).map_batches(li_prep, batch_format="pyarrow").write_parquet(
            li_dir, partition_cols=["bucket"]
        )
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(od_prep, batch_format="pyarrow").write_parquet(
            od_dir, partition_cols=["bucket"]
        )
        with open(marker, "w") as f:
            f.write("ok")

    @ray.remote
    def join_bucket(li_files: list, od_files: list) -> pa.Table:
        import pyarrow.parquet as pqq

        li_t = pa.concat_tables([pqq.read_table(f) for f in li_files]).to_pandas()
        od_t = pa.concat_tables([pqq.read_table(f) for f in od_files]).to_pandas()
        j = li_t.merge(od_t, left_on="l_orderkey", right_on="o_orderkey")
        g = j.groupby("o_year", as_index=False)[
            ["nation_millis", "total_millis"]
        ].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def files_of(d: str) -> dict[int, list]:
        out: dict[int, list] = {}
        for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
            for part in f.split(os.sep):
                if part.startswith("bucket="):
                    out.setdefault(int(part.split("=")[1]), []).append(f)
        return out

    li_map, od_map = files_of(li_dir), files_of(od_dir)
    parts = ray.get(
        [
            join_bucket.remote(li_map[b], od_map.get(b, []))
            for b in sorted(li_map)
            if od_map.get(b)
        ]
    )
    if not parts:
        return pd.DataFrame(
            {
                "o_year": pd.Series([], dtype="int32"),
                "nation_millis": pd.Series([], dtype="int64"),
                "total_millis": pd.Series([], dtype="int64"),
                "share_r": pd.Series([], dtype="float64"),
            }
        )
    merged = pa.concat_tables(parts).to_pandas()
    out = merged.groupby("o_year", as_index=False)[
        ["nation_millis", "total_millis"]
    ].sum()
    out["o_year"] = out["o_year"].astype(np.int32)
    out["nation_millis"] = out["nation_millis"].astype(np.int64)
    out["total_millis"] = out["total_millis"].astype(np.int64)
    out["share_r"] = np.round(
        out["nation_millis"].to_numpy() / out["total_millis"].to_numpy(), 6
    )
    return out.sort_values("o_year").reset_index(drop=True)


NATION_MARKET_SHARE_Q8_SQL = f"""
WITH w AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
    CAST(floor(l.l_extendedprice*(1.0::DOUBLE - l.l_discount)*1000.0 + 0.5)
         AS BIGINT) AS rev,
    (ns.n_name = '{Q8_NATION}') AS is_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey
  WHERE p.p_type = '{Q8_PART_TYPE}' AND r.r_name = '{Q8_REGION}')
SELECT o_year,
  sum(CASE WHEN is_nation THEN rev ELSE 0 END)::BIGINT AS nation_millis,
  sum(rev)::BIGINT AS total_millis,
  round(sum(CASE WHEN is_nation THEN rev ELSE 0 END)::DOUBLE
        / sum(rev)::DOUBLE, 6) AS share_r
FROM w GROUP BY o_year ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Disjunctive multi-predicate join (TPC-H Q19 shape): discounted revenue
# from three brand/size/quantity bands
# ---------------------------------------------------------------------------

# (brand, size_lo, size_hi, qty_lo, qty_hi) — OR-of-ANDs bands.  The
# reference Q19 keys the bands on container classes the synthetic part
# table doesn't carry; size bands stand in for them (same plan shape).
Q19_BANDS = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#3", 1, 15, 20, 30),
)


def brand_band_revenue_q19(sf_dir: str):
    """TPC-H Q19 analog: revenue per brand from lineitems matching ANY of
    three (brand, part-size band, quantity band) conjunctions — the
    disjunctive-predicate join shape.

    The entire OR-of-ANDs collapses dimension-side: each band's
    qualifying partkeys are one filtered 1-column part read, broadcast
    as a sorted array (documented broadcast-limit: part is ~1/30 of
    lineitem; past ~1e8 surviving keys per band the attach flips to the
    hive-bucketed join).  The lineitem scan then evaluates the three
    bands as vectorized (membership AND quantity-range) masks — integer
    quantity bounds over integral quantities, no float boundaries — and
    each batch collapses to <=3 per-brand partial rows.  ZERO shuffles;
    neither fact row set ever leaves its scan task.
    """
    import pyarrow.dataset as pads

    part_ds = pads.dataset(f"{sf_dir}/part.parquet")
    band_keys = []
    for brand, slo, shi, _qlo, _qhi in Q19_BANDS:
        t = part_ds.to_table(
            columns=["p_partkey"],
            filter=(
                (pads.field("p_brand") == brand)
                & (pads.field("p_size") >= slo)
                & (pads.field("p_size") <= shi)
            ),
        )
        band_keys.append(
            np.sort(t["p_partkey"].to_numpy(zero_copy_only=False))
        )
    bands_ref = ray.put(band_keys)

    def partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(bands_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        brands, revs, ns = [], [], []
        for (brand, _slo, _shi, qlo, qhi), pks in zip(Q19_BANDS, keys):
            if len(pks) == 0:
                continue
            pos = np.searchsorted(pks, lpk)
            pos[pos == len(pks)] = 0
            hit = (pks[pos] == lpk) & (qty >= qlo) & (qty <= qhi)
            if not hit.any():
                continue
            brands.append(brand)
            revs.append(int(_cents(price[hit] * (1.0 - disc[hit])).sum()))
            ns.append(int(hit.sum()))
        return pa.table(
            {
                "p_brand": pa.array(brands, type=pa.string()),
                "revenue_cents": pa.array(revs, type=pa.int64()),
                "n_items": pa.array(ns, type=pa.int64()),
            }
        )

    parts = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey", "l_quantity", "l_extendedprice", "l_discount",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "p_brand": pd.Series([], dtype=object),
                "revenue_cents": pd.Series([], dtype="int64"),
                "n_items": pd.Series([], dtype="int64"),
            }
        )
    out = parts.groupby("p_brand", as_index=False)[
        ["revenue_cents", "n_items"]
    ].sum()
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    out["n_items"] = out["n_items"].astype(np.int64)
    return out.sort_values("p_brand").reset_index(drop=True)


def _q19_where() -> str:
    return " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
        f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in Q19_BANDS
    )


BRAND_BAND_REVENUE_Q19_SQL = f"""
SELECT p.p_brand,
  sum(CAST(floor(l.l_extendedprice*(1.0::DOUBLE - l.l_discount)*100.0 + 0.5)
      AS BIGINT))::BIGINT AS revenue_cents,
  count(*)::BIGINT AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE {_q19_where()}
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


# ---------------------------------------------------------------------------
# Semi + anti self-join (TPC-H Q21 shape): suppliers who kept orders waiting
# ---------------------------------------------------------------------------

Q21_LATE_DAYS = 60
Q21_LATE_US = Q21_LATE_DAYS * 86_400 * 10**6
Q21_TOPK = 20


def waiting_suppliers_q21(sf_dir: str):
    """TPC-H Q21 analog: for finalized (status 'F') multi-supplier
    orders, the suppliers who were the ONLY late supplier on the order —
    the EXISTS(other supplier) + NOT EXISTS(other late supplier) double
    self-join shape.  Lateness stands in as shipdate > orderdate +
    Q21_LATE_DAYS (the synthetic lineitem carries no receipt/commit
    dates), and the reference's nation filter is dropped: the synthetic
    supplier table is 100 rows, so it would be a trivial mask on the
    final supplier-sized aggregate, not a plan change.

    Both EXISTS collapse to one per-(orderkey, suppkey) max-shipdate
    aggregate: "some other supplier" == distinct-supplier count >= 2,
    "no other late supplier" == late-supplier count == 1 with the
    candidate the unique late one.  Plan: the lineitem scan emits
    (orderkey, suppkey, max_ship) per-batch partials and the F-filtered
    orders scan emits (orderkey, orderdate); both are written ONCE
    hive-partitioned by ``orderkey % JOIN_BUCKETS`` (the Q9 co-partition
    idiom) and one task per bucket finishes the per-order verdicts and
    collapses to supplier-count partials.  The driver merges
    supplier-sized rows only; no raw fact row crosses an all-to-all.
    """
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    root = f"/tmp/myaku_ray_join_q21/{key}_{JOIN_BUCKETS}"
    li_dir, od_dir = f"{root}/lineitem", f"{root}/orders"
    marker = f"{root}/_SUCCESS"
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)

        def li_prep(batch: pa.Table) -> pa.Table:
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            ship = (
                batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            df = pd.DataFrame(
                {"l_orderkey": ok, "l_suppkey": sk, "max_ship_us": ship}
            )
            g = df.groupby(["l_orderkey", "l_suppkey"], as_index=False)[
                "max_ship_us"
            ].max()
            g["bucket"] = (g["l_orderkey"] % JOIN_BUCKETS).astype(np.int32)
            return pa.Table.from_pandas(g, preserve_index=False)

        def od_prep(batch: pa.Table) -> pa.Table:
            keep = pc.equal(batch["o_orderstatus"], pa.scalar("F"))
            batch = batch.filter(keep)
            keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            od = (
                batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            return pa.table(
                {
                    "o_orderkey": pa.array(keys, type=pa.int64()),
                    "o_date_us": pa.array(od, type=pa.int64()),
                    "bucket": pa.array(
                        (keys % JOIN_BUCKETS).astype(np.int32)
                    ),
                }
            )

        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        ).map_batches(li_prep, batch_format="pyarrow").write_parquet(
            li_dir, partition_cols=["bucket"]
        )
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
        ).map_batches(od_prep, batch_format="pyarrow").write_parquet(
            od_dir, partition_cols=["bucket"]
        )
        with open(marker, "w") as f:
            f.write("ok")

    @ray.remote
    def join_bucket(li_files: list, od_files: list) -> pa.Table:
        import pyarrow.parquet as pqq

        li_t = pa.concat_tables(
            [pqq.read_table(f) for f in li_files]
        ).to_pandas()
        od_t = pa.concat_tables(
            [pqq.read_table(f) for f in od_files]
        ).to_pandas()
        # merge cross-batch partials to true per-(order, supplier) maxima
        li_t = li_t.groupby(["l_orderkey", "l_suppkey"], as_index=False)[
            "max_ship_us"
        ].max()
        j = li_t.merge(od_t, left_on="l_orderkey", right_on="o_orderkey")
        if len(j) == 0:
            return pa.table(
                {
                    "l_suppkey": pa.array([], type=pa.int64()),
                    "numwait": pa.array([], type=pa.int64()),
                }
            )
        j["late"] = j["max_ship_us"] > j["o_date_us"] + Q21_LATE_US
        agg = j.groupby("l_orderkey", as_index=False).agg(
            n_supp=("l_suppkey", "size"), n_late=("late", "sum")
        )
        wins = agg[(agg["n_supp"] >= 2) & (agg["n_late"] == 1)][
            ["l_orderkey"]
        ]
        winners = j[j["late"]].merge(wins, on="l_orderkey")
        cnt = winners.groupby("l_suppkey", as_index=False).size()
        return pa.table(
            {
                "l_suppkey": pa.array(
                    cnt["l_suppkey"].to_numpy(), type=pa.int64()
                ),
                "numwait": pa.array(
                    cnt["size"].to_numpy().astype(np.int64), type=pa.int64()
                ),
            }
        )

    def files_of(d: str) -> dict[int, list]:
        out: dict[int, list] = {}
        for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
            for part in f.split(os.sep):
                if part.startswith("bucket="):
                    out.setdefault(int(part.split("=")[1]), []).append(f)
        return out

    li_map, od_map = files_of(li_dir), files_of(od_dir)
    parts = ray.get(
        [
            join_bucket.remote(li_map[b], od_map.get(b, []))
            for b in sorted(li_map)
            if od_map.get(b)
        ]
    )
    empty = pd.DataFrame(
        {
            "s_name": pd.Series([], dtype=object),
            "numwait": pd.Series([], dtype="int64"),
        }
    )
    if not parts:
        return empty
    merged = pa.concat_tables(parts).to_pandas()
    if len(merged) == 0:
        return empty
    cnt = merged.groupby("l_suppkey", as_index=False)["numwait"].sum()
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = cnt.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out = out.sort_values(
        ["numwait", "s_name"], ascending=[False, True]
    ).head(Q21_TOPK)
    out["numwait"] = out["numwait"].astype(np.int64)
    return out[["s_name", "numwait"]].reset_index(drop=True)


WAITING_SUPPLIERS_Q21_SQL = f"""
WITH lat AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS max_ship
  FROM lineitem GROUP BY 1, 2
), flags AS (
  SELECT lat.l_orderkey, lat.l_suppkey,
         (lat.max_ship > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY)
           AS late
  FROM lat JOIN orders o ON o.o_orderkey = lat.l_orderkey
  WHERE o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey, count(*) AS n_supp,
         sum(CASE WHEN late THEN 1 ELSE 0 END) AS n_late,
         max(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM flags GROUP BY 1
)
SELECT s.s_name, count(*)::BIGINT AS numwait
FROM per_order p
JOIN supplier s ON s.s_suppkey = p.late_supp
WHERE p.n_supp >= 2 AND p.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT {Q21_TOPK}
"""


# ---------------------------------------------------------------------------
# Join + derived-category conditional counts (TPC-H Q12 shape): line counts
# by ship-delay bucket split into high/low order priority
# ---------------------------------------------------------------------------

Q12_START = "1996-01-01"
Q12_END = "1997-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")
# lexicographically ordered so pandas sort_values == SQL ORDER BY
Q12_LABELS = ("01-30d", "31-60d", "61-90d", "90d+", "early")
_Q12_DIGITIZE = (1, 31, 61, 91)  # delay<=0 -> early, 1-30, 31-60, 61-90, >90
_Q12_LABEL_BY_BIN = ("early", "01-30d", "31-60d", "61-90d", "90d+")


def ship_delay_priority_q12(sf_dir: str):
    """TPC-H Q12 analog: lineitem line counts per ship-delay bucket
    (days from order date to ship date), split into high-priority
    (1-URGENT/2-HIGH) vs low-priority order counts — the shape where
    the GROUP BY key is DERIVED FROM BOTH SIDES of a fact x fact join
    (reference Q12 groups by l_shipmode with o_orderpriority CASE
    counts; this corpus has no shipmode column, so the bucket is the
    two-sided delay — a strictly harder join since neither side can
    precompute the key alone).

    Plan (part_type_profit_q9 family): no broadcast is possible —
    orders is fact-sized and every surviving lineitem needs its order's
    date AND priority — so both scans write one hive-partitioned pass
    bucketed by ``orderkey % JOIN_BUCKETS`` (the write IS the
    exchange): lineitem filtered to the ship-year window map-side and
    pre-aggregated to (orderkey, ship_day, n_lines) partials; orders
    reduced to (orderkey, order_day, is_high int8).  One task per
    bucket joins co-located slices, digitizes the delay, and emits
    <=5 (bucket-label, high, low) partial rows; the driver merges
    5-row partials.  No groupby all-to-all ever sees a raw fact row.
    """
    import glob
    import os
    import shutil

    @ray.remote
    def join_bucket(li_files: list, od_files: list) -> pa.Table:
        import pyarrow.parquet as pqq

        li_t = pa.concat_tables(
            [pqq.read_table(f) for f in li_files]
        ).to_pandas()
        od_t = pa.concat_tables(
            [pqq.read_table(f) for f in od_files]
        ).to_pandas()
        j = li_t.merge(od_t, left_on="l_orderkey", right_on="o_orderkey")
        delay = j["ship_day"].to_numpy() - j["order_day"].to_numpy()
        bins = np.digitize(delay, _Q12_DIGITIZE)
        lab = np.array(_Q12_LABEL_BY_BIN, dtype=object)[bins]
        n = j["n_lines"].to_numpy()
        hi = j["is_high"].to_numpy().astype(bool)
        df = pd.DataFrame(
            {
                "delay_bucket": lab,
                "high_line_count": np.where(hi, n, 0),
                "low_line_count": np.where(hi, 0, n),
            }
        )
        g = df.groupby("delay_bucket", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    d0, d1 = np.datetime64(Q12_START), np.datetime64(Q12_END)

    def li_prep(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = (sd >= d0) & (sd < d1)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
        day = (
            sd[keep].astype("datetime64[D]").astype(np.int64).astype(np.int32)
        )
        df = pd.DataFrame({"l_orderkey": ok, "ship_day": day})
        g = df.groupby(["l_orderkey", "ship_day"], as_index=False).size()
        g = g.rename(columns={"size": "n_lines"})
        g["n_lines"] = g["n_lines"].astype(np.int64)
        g["bucket"] = (g["l_orderkey"] % JOIN_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def od_prep(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        day = od.astype("datetime64[D]").astype(np.int64).astype(np.int32)
        pr = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        hi = np.isin(pr, Q12_HIGH)
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "order_day": pa.array(day),
                "is_high": pa.array(hi.astype(np.int8)),
                "bucket": pa.array((keys % JOIN_BUCKETS).astype(np.int32)),
            }
        )

    key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    root = f"/tmp/myaku_ray_join_q12/{key}_{JOIN_BUCKETS}"
    li_dir, od_dir = f"{root}/lineitem", f"{root}/orders"
    marker = f"{root}/_SUCCESS"
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_shipdate"],
        ).map_batches(li_prep, batch_format="pyarrow").write_parquet(
            li_dir, partition_cols=["bucket"]
        )
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        ).map_batches(od_prep, batch_format="pyarrow").write_parquet(
            od_dir, partition_cols=["bucket"]
        )
        with open(marker, "w") as f:
            f.write("ok")

    def files_of(d: str) -> dict[int, list]:
        out: dict[int, list] = {}
        for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
            for part in f.split(os.sep):
                if part.startswith("bucket="):
                    out.setdefault(int(part.split("=")[1]), []).append(f)
        return out

    li_map, od_map = files_of(li_dir), files_of(od_dir)
    parts = ray.get(
        [
            join_bucket.remote(li_map[b], od_map.get(b, []))
            for b in sorted(li_map)
            if od_map.get(b)
        ]
    )
    merged = pa.concat_tables(parts).to_pandas()
    out = merged.groupby("delay_bucket", as_index=False)[
        ["high_line_count", "low_line_count"]
    ].sum()
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return out.sort_values("delay_bucket").reset_index(drop=True)


SHIP_DELAY_PRIORITY_Q12_SQL = f"""
WITH j AS (
  SELECT date_diff('day', o.o_orderdate, l.l_shipdate) AS delay,
         o.o_orderpriority AS pr
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate >= DATE '{Q12_START}'
    AND l.l_shipdate <  DATE '{Q12_END}')
SELECT CASE WHEN delay <= 0 THEN 'early'
            WHEN delay <= 30 THEN '01-30d'
            WHEN delay <= 60 THEN '31-60d'
            WHEN delay <= 90 THEN '61-90d'
            ELSE '90d+' END AS delay_bucket,
  sum(CASE WHEN pr IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
    AS high_line_count,
  sum(CASE WHEN pr NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
    AS low_line_count
FROM j
GROUP BY delay_bucket
ORDER BY delay_bucket
"""


# ---------------------------------------------------------------------------
# Group share-of-total filter (TPC-H Q11 shape): parts whose revenue from
# one nation's suppliers exceeds a fraction of that nation's total
# ---------------------------------------------------------------------------

Q11_NATION = "NATION_3"
# share threshold as an exact integer ratio: keep parts with
# value_cents * Q11_FRACTION_DEN > total_cents (no float boundary)
Q11_FRACTION_DEN = 1000


def important_parts_q11(sf_dir: str):
    """TPC-H Q11 analog: revenue per part from ONE nation's suppliers,
    keeping parts whose share exceeds 1/``Q11_FRACTION_DEN`` of that
    nation's total — the group-then-global-scalar-filter shape (the
    HAVING compares each group against an aggregate over ALL groups).
    Reference Q11 prices partsupp stock; this corpus has no partsupp,
    so shipped revenue plays the value role — the plan shape is
    identical.

    Plan: supplier->nation filter broadcasts as a sorted suppkey array
    (dimension-sized, Q9's documented valve); ONE lineitem scan filters
    map-side and pre-aggregates (partkey, value_cents) per batch, ONE
    part-keyed groupby finishes the sums (partials are
    distinct-part-sized, never line-sized); the grand total is the sum
    of the group sums (driver-side, part-count rows) and the share
    filter is an exact integer cross-multiply.
    """
    import pyarrow.parquet as _pq

    nation = _pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk = nation.loc[nation["n_name"] == Q11_NATION, "n_nationkey"]
    nset = set(nk.tolist())
    supp = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    skeys = np.sort(
        supp.loc[supp["s_nationkey"].isin(nset), "s_suppkey"].to_numpy()
    )
    s_ref = ray.put(skeys)

    def li_partial(batch: pa.Table) -> pa.Table:
        sk = ray.get(s_ref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(sk) == 0:
            keep = np.zeros(len(lsk), dtype=bool)
        else:
            pos = np.searchsorted(sk, lsk)
            pos[pos == len(sk)] = 0
            keep = sk[pos] == lsk
        batch = batch.filter(pa.array(keep))
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"l_partkey": pk, "value_cents": _cents(price * (1.0 - disc))}
        )
        g = df.groupby("l_partkey", as_index=False)["value_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_part = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
            ],
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("value_cents", alias_name="value_cents"))
        .to_pandas()
    )
    total = int(per_part["value_cents"].sum())
    keep = per_part["value_cents"].to_numpy() * Q11_FRACTION_DEN > total
    out = per_part[keep].copy()
    out["value_cents"] = out["value_cents"].astype(np.int64)
    out["l_partkey"] = out["l_partkey"].astype(np.int64)
    return out.sort_values(
        ["value_cents", "l_partkey"], ascending=[False, True]
    ).reset_index(drop=True)[["l_partkey", "value_cents"]]


IMPORTANT_PARTS_Q11_SQL = f"""
WITH pv AS (
  SELECT l.l_partkey,
    sum(CAST(floor(l.l_extendedprice * (1.0::DOUBLE - l.l_discount)
        * 100.0 + 0.5) AS BIGINT)) AS value_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{Q11_NATION}'
  GROUP BY l.l_partkey
)
SELECT l_partkey, value_cents::BIGINT AS value_cents
FROM pv
WHERE value_cents * {Q11_FRACTION_DEN} > (SELECT sum(value_cents) FROM pv)
ORDER BY value_cents DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# Distinct-pair dedup + anti-join + grouped COUNT DISTINCT (TPC-H Q16
# shape): supplier counts by part attributes, bad-standing suppliers out
# ---------------------------------------------------------------------------

Q16_EXCL_BRAND = "Brand#1"
Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)
# distinct (attr-group, suppkey) rows above this merge on a Ray groupby
# instead of the driver (rows are bounded by groups x suppliers, never
# line-count) — same valve family as FUNNEL_DRIVER_MERGE_LIMIT
Q16_DRIVER_MERGE_LIMIT = 20_000_000


def supplier_count_by_part_q16(
    sf_dir: str, *, driver_merge_limit: int = Q16_DRIVER_MERGE_LIMIT
):
    """TPC-H Q16 analog: how many DISTINCT suppliers ship each
    (brand, type, size) combination — brand ``Q16_EXCL_BRAND`` and
    PROMO-typed parts excluded, sizes restricted, suppliers with
    negative account balance excluded (the reference's
    complaint-comment exclusion; this corpus has no s_comment).  The
    supply relation is the reference's partsupp; with no partsupp table
    the distinct (l_partkey, l_suppkey) pairs OBSERVED in lineitem play
    that role.

    Plan: the part-attribute filter and the bad-supplier set broadcast
    (dimension-sized); ONE lineitem scan attaches attrs map-side and
    dedups each batch to distinct (brand, type, size, suppkey) rows via
    one composite np.unique — the exchange carries those rows only,
    bounded by groups x suppliers; the final dedup + COUNT DISTINCT is
    a drop_duplicates + value_counts on that bounded frame (driver
    merge under ``Q16_DRIVER_MERGE_LIMIT``).
    """
    import pyarrow.parquet as _pq

    part = _pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).to_pandas()
    part = part[
        (part["p_brand"] != Q16_EXCL_BRAND)
        & (part["p_type"] != "PROMO")
        & (part["p_size"].isin(Q16_SIZES))
    ].sort_values("p_partkey")
    # attrs as small int codes for the composite-key dedup; decode at end
    attr = (
        part[["p_brand", "p_type", "p_size"]]
        .drop_duplicates()
        .sort_values(["p_brand", "p_type", "p_size"])
        .reset_index(drop=True)
    )
    attr_of_part = pd.MultiIndex.from_frame(
        part[["p_brand", "p_type", "p_size"]]
    )
    attr_idx = pd.MultiIndex.from_frame(attr)
    part_attr_code = attr_idx.get_indexer(attr_of_part).astype(np.int64)

    supp = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    ).to_pandas()
    bad = np.sort(
        supp.loc[supp["s_acctbal"] < 0.0, "s_suppkey"].to_numpy()
    )
    bcast = ray.put(
        (part["p_partkey"].to_numpy(), part_attr_code, bad)
    )

    def li_pairs(batch: pa.Table) -> pa.Table:
        pkeys, pattr, badk = ray.get(bcast)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(pkeys) == 0:
            keep = np.zeros(len(lpk), dtype=bool)
            code = np.empty(0, np.int64)
        else:
            pos = np.searchsorted(pkeys, lpk)
            pos[pos == len(pkeys)] = 0
            keep = pkeys[pos] == lpk
            code = pattr[pos[keep]]
        sk = lsk[keep]
        if len(badk):
            bpos = np.searchsorted(badk, sk)
            bpos[bpos == len(badk)] = 0
            ok = badk[bpos] != sk
            sk, code = sk[ok], code[ok]
        pairs = np.empty(len(sk), dtype=[("a", np.int64), ("s", np.int64)])
        pairs["a"], pairs["s"] = code, sk
        uniq = np.unique(pairs)
        return pa.table(
            {
                "attr_code": pa.array(uniq["a"]),
                "s_suppkey": pa.array(uniq["s"]),
            }
        )

    # Materialize the per-batch distinct (attr, supplier) rows ONCE so
    # the merge valve can count before pulling: at or under the limit
    # one driver drop_duplicates + value_counts finishes; above it the
    # named Ray plan runs — groupby(attr_code, s_suppkey) dedups
    # distributed, then groupby(attr_code) counts, and only the
    # attr-sized result lands driver-side (round-4 verdict ask #4;
    # forced-low-limit equality gate in tests/test_plan_switches.py).
    rows_ds = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
        )
        .map_batches(li_pairs, batch_format="pyarrow")
        .materialize()
    )
    if rows_ds.count() > driver_merge_limit:
        cnt = (
            rows_ds.groupby(["attr_code", "s_suppkey"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["attr_code"])
            .groupby("attr_code")
            .aggregate(Count(alias_name="supplier_cnt"))
            .to_pandas()
            .sort_values("attr_code")
            .reset_index(drop=True)
        )
    else:
        rows = rows_ds.to_pandas()
        cnt = (
            rows.drop_duplicates()
            .groupby("attr_code")
            .size()
            .rename("supplier_cnt")
            .reset_index()
        )
    out = attr.iloc[cnt["attr_code"].to_numpy()].reset_index(drop=True)
    out["supplier_cnt"] = cnt["supplier_cnt"].astype(np.int64)
    out["p_size"] = out["p_size"].astype(np.int64)
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)


SUPPLIER_COUNT_BY_PART_Q16_SQL = f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN {Q16_SIZES}
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
"""
