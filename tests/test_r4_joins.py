"""Round-4 fifth-session ops: Q3/Q5-shape joins + running-value window.

Each op is DuckDB-parity-tested at sf0.001 plus one adversarial case
(planted revenue ties straddling the top-k boundary for Q3; layout-cache
idempotency for Q5; per-user total invariant for the running sum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "orders", "lineitem", "events",
]


def _con(sf: str, tables=TABLES):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def _match(got, sql: str, sf: str, sort_key: list[str], tables=TABLES):
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = _con(sf, tables)
    want = con.sql(sql).df()
    got = got[sorted(got.columns)].sort_values(sort_key).reset_index(drop=True)
    want = (
        want[sorted(want.columns)]
        .sort_values(sort_key)
        .reset_index(drop=True)
        .astype(got.dtypes.to_dict())
    )
    pd.testing.assert_frame_equal(got, want)
    return got


def test_shipping_priority_q3_matches_duckdb(ray_session):
    from myaku_ray.functions.relational import (
        SHIPPING_PRIORITY_Q3_SQL,
        shipping_priority_q3,
    )

    got = _match(
        shipping_priority_q3(SF), SHIPPING_PRIORITY_Q3_SQL, SF, ["l_orderkey"]
    )
    assert len(got) == 10
    # the returned rows follow the (revenue desc, orderkey asc) total order
    r = got.sort_values(
        ["revenue_cents", "l_orderkey"], ascending=[False, True]
    )["revenue_cents"].to_numpy()
    assert (np.diff(r) <= 0).all()


def test_shipping_priority_q3_tie_window(ray_session, tmp_path):
    """Many orders tied exactly at the k-th revenue: the kth-threshold
    pull must pick the lexicographically smallest orderkeys (DuckDB's
    ORDER BY revenue DESC, orderkey LIMIT 10)."""
    import duckdb

    from myaku_ray.functions.relational import (
        Q3_DATE,
        Q3_SEGMENT,
        SHIPPING_PRIORITY_Q3_SQL,
        shipping_priority_q3,
    )

    n_tied, n_top = 600, 4
    okeys = np.arange(1, n_tied + n_top + 1, dtype=np.int64)
    price = np.concatenate(
        [1000.0 + 10.0 * np.arange(n_top, 0, -1), np.full(n_tied, 50.0)]
    )
    before = np.datetime64(Q3_DATE) - np.timedelta64(1, "D")
    after = np.datetime64(Q3_DATE) + np.timedelta64(1, "D")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys),
                "l_extendedprice": pa.array(price),
                "l_discount": pa.array(np.zeros(len(okeys))),
                "l_shipdate": pa.array(
                    np.full(len(okeys), after).astype("datetime64[us]")
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(np.ones(len(okeys), dtype=np.int64)),
                "o_orderdate": pa.array(
                    np.full(len(okeys), before).astype("datetime64[us]")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(okeys)),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1], pa.int64()),
                "c_mktsegment": pa.array([Q3_SEGMENT], pa.string()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    got = shipping_priority_q3(str(tmp_path))
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    want = con.sql(SHIPPING_PRIORITY_Q3_SQL).df()
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    # winners: the 4 clear tops, then tied orderkeys 5..10 in key order
    assert got["l_orderkey"].tolist()[:4] == [1, 2, 3, 4]
    assert got["l_orderkey"].tolist()[4:] == [5, 6, 7, 8, 9, 10]


def test_local_supplier_revenue_q5_matches_duckdb_and_cache(ray_session):
    import os
    import shutil

    from myaku_ray.functions.relational import (
        JOIN_BUCKETS,
        LOCAL_SUPPLIER_REVENUE_Q5_SQL,
        local_supplier_revenue_q5,
    )

    key = os.path.abspath(SF).strip("/").replace("/", "_")
    root = f"/tmp/myaku_ray_join_q5/{key}_{JOIN_BUCKETS}"
    shutil.rmtree(root, ignore_errors=True)

    got = _match(
        local_supplier_revenue_q5(SF),
        LOCAL_SUPPLIER_REVENUE_Q5_SQL,
        SF,
        ["n_name"],
    )
    assert len(got) > 0
    assert os.path.exists(f"{root}/_SUCCESS")
    # second call reuses the bucketed layout (marker untouched) and is
    # value-identical
    mtime = os.path.getmtime(f"{root}/_SUCCESS")
    again = _match(
        local_supplier_revenue_q5(SF),
        LOCAL_SUPPLIER_REVENUE_Q5_SQL,
        SF,
        ["n_name"],
    )
    assert os.path.getmtime(f"{root}/_SUCCESS") == mtime
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), again.reset_index(drop=True)
    )


def test_events_running_value_matches_duckdb(ray_session):
    from myaku_ray.functions.events import (
        EVENTS_RUNNING_VALUE_SQL,
        events_running_value,
    )

    got = _match(
        events_running_value(SF), EVENTS_RUNNING_VALUE_SQL, SF, ["event_id"]
    )
    # row per event; each user's max running value equals their total
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert len(got) == len(ev)
    ev["millis"] = np.floor(ev["value"].to_numpy() * 1000.0 + 0.5).astype(
        np.int64
    )
    totals = ev.groupby("user_id")["millis"].sum()
    finals = got.groupby("user_id")["running_value_millis"].max()
    pd.testing.assert_series_equal(
        finals.sort_index(), totals.sort_index(), check_names=False
    )


def test_part_type_profit_q9_matches_duckdb(ray_session):
    import os
    import shutil

    from myaku_ray.functions.relational import (
        JOIN_BUCKETS,
        PART_TYPE_PROFIT_Q9_SQL,
        part_type_profit_q9,
    )

    key = os.path.abspath(SF).strip("/").replace("/", "_")
    shutil.rmtree(f"/tmp/myaku_ray_join_q9/{key}_{JOIN_BUCKETS}", ignore_errors=True)
    got = _match(
        part_type_profit_q9(SF),
        PART_TYPE_PROFIT_Q9_SQL,
        SF,
        ["n_name", "o_year"],
        tables=TABLES + ["part"],
    )
    assert len(got) > 0
    assert (got["profit_cents"] > 0).all()


def test_events_value_percentiles_matches_duckdb(ray_session):
    from myaku_ray.functions.events import (
        EVENTS_VALUE_PERCENTILES_SQL,
        events_value_percentiles,
    )

    got = _match(
        events_value_percentiles(SF), EVENTS_VALUE_PERCENTILES_SQL, SF, ["q"]
    )
    assert len(got) == 4
    assert got.sort_values("q")["value"].is_monotonic_increasing


def test_events_value_percentiles_recursion_and_ties(
    ray_session, tmp_path, monkeypatch
):
    """Tiny pull limit forces the recursion path on a heavy-tie column;
    the nextafter tie-collapse must answer exactly."""
    import duckdb

    import myaku_ray.functions.events as ev

    rng = np.random.default_rng(11)
    n = 20_000
    # one huge tie run around the median + long tails
    vals = np.concatenate(
        [
            np.full(n // 2, 7.77),
            rng.random(n // 4) * 5,
            5 + rng.random(n - n // 2 - n // 4) * 500,
        ]
    )
    ids = np.arange(n, dtype=np.int64)
    pq.write_table(
        pa.table({"event_id": pa.array(ids), "value": pa.array(vals)}),
        str(tmp_path / "events.parquet"),
    )
    monkeypatch.setattr(ev, "PCTL_PULL_LIMIT", 500)
    monkeypatch.setattr(ev, "PCTL_SAMPLE_TARGET", 128)
    got = ev.events_value_percentiles(str(tmp_path)).sort_values("q")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.sql(ev.EVENTS_VALUE_PERCENTILES_SQL).df().sort_values("q")
    assert got["value"].tolist() == want["value"].tolist()


def test_dsir_importance_weights_match_duckdb_and_separate(ray_session):
    from myaku_ray.functions.textops import (
        DSIR_IMPORTANCE_SQL,
        DSIR_TARGET_LANG,
        dsir_importance_weights,
    )

    got = _match(
        dsir_importance_weights(SF),
        DSIR_IMPORTANCE_SQL,
        SF,
        ["doc_id"],
        tables=TABLES + ["documents"],
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    assert len(got) == len(docs)
    j = got.merge(docs, on="doc_id")
    # the selection signal works: target-domain docs score higher on
    # average than out-of-domain docs
    tgt = j.loc[j["lang"] == DSIR_TARGET_LANG, "logw_r"].mean()
    rest = j.loc[j["lang"] != DSIR_TARGET_LANG, "logw_r"].mean()
    assert tgt > rest
