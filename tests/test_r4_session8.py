"""Round-4 eighth-session work: the new operators' scale paths.

``knn_graph``'s tile-pair exchange must be output-identical whatever
the tile width (the nt=1 case degenerates to one block; small tiles
force real multi-block partial-merge); the DuckDB parity check in
check_oracle pins the shared answer.  The rolling/weekly event ops'
window-expansion identities are pinned against a direct pandas
recomputation here (their DuckDB parity lives in the oracle sweep).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_knn_graph_tile_invariance(ray_session):
    from myaku_ray.functions.ann import knn_graph

    a = knn_graph(SF)  # nt = 1 at this scale: single block
    b = knn_graph(SF, tile=64)  # forces a real multi-tile exchange
    pd.testing.assert_frame_equal(a, b)


def test_knn_graph_basic_invariants(ray_session):
    from myaku_ray.functions.ann import KNN_GRAPH_K, knn_graph

    g = knn_graph(SF)
    n = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
    assert len(g) == n * KNN_GRAPH_K
    assert (g["query_vec_id"] != g["neighbor_vec_id"]).all()
    # ranks are 1..k per query and sims non-increasing within a query
    for _, grp in g.groupby("query_vec_id"):
        assert list(grp["rank"]) == list(range(1, KNN_GRAPH_K + 1))
        assert (np.diff(grp["sim_r"].to_numpy()) <= 0).all()


def test_rolling_7d_matches_direct_window(ray_session):
    from myaku_ray.functions.events import DAY_US, rolling_7d_active_users

    got = rolling_7d_active_users(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    day = (
        ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // DAY_US
    )
    ud = pd.DataFrame({"u": ev["user_id"], "d": day}).drop_duplicates()
    lo, hi = int(ud["d"].min()), int(ud["d"].max()) + 6
    expect = {
        dd: ud[(ud["d"] >= dd - 6) & (ud["d"] <= dd)]["u"].nunique()
        for dd in range(lo, hi + 1)
    }
    expect = {d: c for d, c in expect.items() if c > 0}
    got_map = dict(zip(got["day_bucket"], got["active_7d"]))
    assert got_map == expect


def test_q21_bucketed_join_matches_serial_reference(ray_session):
    """The hive-bucketed co-partition plan must reproduce a single-process
    pandas evaluation of the same semantics (orders split across buckets
    cannot change any per-order verdict)."""
    import shutil

    from myaku_ray.functions.relational import (
        Q21_LATE_US, Q21_TOPK, waiting_suppliers_q21,
    )

    sf = "/root/testdata/sf0.001"
    shutil.rmtree("/tmp/myaku_ray_join_q21", ignore_errors=True)
    got = waiting_suppliers_q21(sf)

    li = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).to_pandas()
    od = pq.read_table(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    ).to_pandas()
    li["ship_us"] = li["l_shipdate"].astype("datetime64[us]").astype("int64")
    lat = li.groupby(["l_orderkey", "l_suppkey"], as_index=False)[
        "ship_us"
    ].max()
    od = od[od["o_orderstatus"] == "F"].copy()
    od["date_us"] = od["o_orderdate"].astype("datetime64[us]").astype("int64")
    j = lat.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["late"] = j["ship_us"] > j["date_us"] + Q21_LATE_US
    agg = j.groupby("l_orderkey", as_index=False).agg(
        n_supp=("l_suppkey", "size"), n_late=("late", "sum")
    )
    wins = agg[(agg["n_supp"] >= 2) & (agg["n_late"] == 1)][["l_orderkey"]]
    winners = j[j["late"]].merge(wins, on="l_orderkey")
    cnt = winners.groupby("l_suppkey", as_index=False).size()
    supp = pq.read_table(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    want = (
        cnt.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .sort_values(["size", "s_name"], ascending=[False, True])
        .head(Q21_TOPK)
    )
    assert list(got["s_name"]) == list(want["s_name"])
    assert list(got["numwait"]) == [int(x) for x in want["size"]]


def test_q19_band_masks_match_pandas(ray_session):
    """Disjunctive-band revenue: the broadcast-membership plan equals a
    direct pandas join+mask evaluation (exact integer cents)."""
    from myaku_ray.functions.relational import (
        Q19_BANDS, brand_band_revenue_q19,
    )

    sf = "/root/testdata/sf0.001"
    got = brand_band_revenue_q19(sf)

    li = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).to_pandas()
    part = pq.read_table(
        f"{sf}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    keep = np.zeros(len(j), dtype=bool)
    for brand, slo, shi, qlo, qhi in Q19_BANDS:
        keep |= (
            (j["p_brand"] == brand).to_numpy()
            & (j["p_size"] >= slo).to_numpy()
            & (j["p_size"] <= shi).to_numpy()
            & (j["l_quantity"] >= qlo).to_numpy()
            & (j["l_quantity"] <= qhi).to_numpy()
        )
    k = j[keep].copy()
    k["cents"] = np.floor(
        k["l_extendedprice"] * (1.0 - k["l_discount"]) * 100.0 + 0.5
    ).astype(np.int64)
    want = (
        k.groupby("p_brand", as_index=False)
        .agg(revenue_cents=("cents", "sum"), n_items=("cents", "size"))
        .sort_values("p_brand")
        .reset_index(drop=True)
    )
    assert list(got["p_brand"]) == list(want["p_brand"])
    assert list(got["revenue_cents"]) == list(want["revenue_cents"])
    assert list(got["n_items"]) == list(want["n_items"])
