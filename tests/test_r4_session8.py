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
