"""Round-4 sixth-session ops: Q18/Q10/Q13 join shapes, RAG chunking,
MMR diverse re-ranking.

Each SQL-expressible op is DuckDB-parity-tested at sf0.001 plus one
adversarial case (planted threshold-boundary orders for Q18, planted
revenue ties straddling the top-k cut for Q10, a planted zero-order
customer for Q13, a multibyte-codepoint doc for the chunker).  The MMR
kernel gets property tests (lambda=1 degenerates to pure relevance;
a planted near-duplicate is demoted) and a serial-replica parity run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "orders", "lineitem",
    "events", "documents", "embeddings",
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


# ---------------------------------------------------------------------------
# Q18: aggregate-then-semi-join
# ---------------------------------------------------------------------------


def test_large_volume_q18_matches_duckdb(ray_session):
    from myaku_ray.functions.relational import (
        LARGE_VOLUME_Q18_SQL,
        Q18_QTY_THRESHOLD,
        large_volume_customers_q18,
    )

    got = _match(
        large_volume_customers_q18(SF), LARGE_VOLUME_Q18_SQL, SF, ["l_orderkey"]
    )
    assert len(got) > 0
    assert (got["sum_qty"] > Q18_QTY_THRESHOLD).all()


def test_large_volume_q18_threshold_boundary(ray_session, tmp_path):
    """Planted orders at sum_qty == threshold (excluded) and
    threshold+1 (included): the HAVING gate must be strict."""
    from myaku_ray.functions.relational import (
        Q18_QTY_THRESHOLD as T,
        large_volume_customers_q18,
    )

    sf = str(tmp_path)
    # order 1: three lines summing to exactly T; order 2: T+1; order 3: tiny
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 3],
            "l_quantity": [100.0, 100.0, float(T - 200), 300.0, float(T - 299), 5.0],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [10, 20, 30],
            "o_orderdate": pd.to_datetime(["1996-01-01"] * 3),
            "o_totalprice": [111.11, 222.22, 333.33],
        }
    )
    cust = pd.DataFrame(
        {"c_custkey": [10, 20, 30], "c_name": ["a", "b", "c"]}
    )
    pq.write_table(pa.Table.from_pandas(li), f"{sf}/lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(orders), f"{sf}/orders.parquet")
    pq.write_table(pa.Table.from_pandas(cust), f"{sf}/customer.parquet")

    got = large_volume_customers_q18(sf)
    assert got["l_orderkey"].tolist() == [2]
    assert got["sum_qty"].tolist() == [T + 1]
    assert got["c_name"].tolist() == ["b"]


def test_large_volume_q18_driver_vs_distributed_parity(
    ray_session, monkeypatch
):
    """The driver-merge fast path and the Ray groupby path must return
    identical rows (the documented Q18_DRIVER_AGG_LIMIT scale switch)."""
    from myaku_ray.functions import relational

    fast = relational.large_volume_customers_q18(SF)
    monkeypatch.setattr(relational, "Q18_DRIVER_AGG_LIMIT", 0)
    slow = relational.large_volume_customers_q18(SF)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Q10: returned-item revenue top-k
# ---------------------------------------------------------------------------


def test_returned_revenue_q10_matches_duckdb(ray_session):
    from myaku_ray.functions.relational import (
        Q10_TOPK,
        RETURNED_REVENUE_Q10_SQL,
        returned_item_revenue_q10,
    )

    got = _match(
        returned_item_revenue_q10(SF), RETURNED_REVENUE_Q10_SQL, SF,
        ["c_custkey"],
    )
    assert len(got) == Q10_TOPK
    # total order holds: revenue desc, custkey asc
    r = got.sort_values(
        ["revenue_cents", "c_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values(["c_custkey"]).reset_index(drop=True),
        r.sort_values(["c_custkey"]).reset_index(drop=True),
    )


def test_returned_revenue_q10_tie_window(ray_session, tmp_path):
    """Planted revenue ties straddling the k boundary: the kth-value
    threshold pull must keep the smallest custkeys among the tied."""
    from myaku_ray.functions.relational import returned_item_revenue_q10

    sf = str(tmp_path)
    n = 30
    # 30 customers, one order + one returned line each, all IDENTICAL
    # revenue -> top-20 must be custkeys 1..20 by the tie-break
    orders = pd.DataFrame(
        {
            "o_orderkey": range(1, n + 1),
            "o_custkey": range(1, n + 1),
            "o_orderdate": pd.to_datetime(["1996-02-01"] * n),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": range(1, n + 1),
            "l_returnflag": ["R"] * n,
            "l_extendedprice": [100.0] * n,
            "l_discount": [0.0] * n,
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": range(1, n + 1),
            "c_name": [f"c{i}" for i in range(1, n + 1)],
            "c_acctbal": [1.0] * n,
            "c_nationkey": [0] * n,
        }
    )
    nation = pd.DataFrame({"n_nationkey": [0], "n_name": ["Z"]})
    pq.write_table(pa.Table.from_pandas(orders), f"{sf}/orders.parquet")
    pq.write_table(pa.Table.from_pandas(li), f"{sf}/lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(cust), f"{sf}/customer.parquet")
    pq.write_table(pa.Table.from_pandas(nation), f"{sf}/nation.parquet")

    got = returned_item_revenue_q10(sf)
    assert got["c_custkey"].tolist() == list(range(1, 21))
    assert (got["revenue_cents"] == 10000).all()


# ---------------------------------------------------------------------------
# Q13: left-join count distribution
# ---------------------------------------------------------------------------


def test_customer_order_dist_q13_matches_duckdb(ray_session):
    from myaku_ray.functions.relational import (
        CUSTOMER_ORDER_DIST_Q13_SQL,
        customer_order_distribution_q13,
    )

    got = _match(
        customer_order_distribution_q13(SF), CUSTOMER_ORDER_DIST_Q13_SQL, SF,
        ["n_orders"],
    )
    # conservation: the distribution accounts for every customer
    n_cust = len(pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]))
    assert int(got["n_customers"].sum()) == n_cust


def test_customer_order_dist_q13_zero_bucket(ray_session, tmp_path):
    """A customer with no orders must appear in the n_orders=0 bucket
    (the left-join semantics an inner groupby cannot express)."""
    from myaku_ray.functions.relational import customer_order_distribution_q13

    sf = str(tmp_path)
    cust = pd.DataFrame({"c_custkey": [1, 2, 3, 4]})
    orders = pd.DataFrame({"o_orderkey": [10, 11, 12], "o_custkey": [1, 1, 2]})
    pq.write_table(pa.Table.from_pandas(cust), f"{sf}/customer.parquet")
    pq.write_table(pa.Table.from_pandas(orders), f"{sf}/orders.parquet")

    got = customer_order_distribution_q13(sf)
    want = {0: 2, 1: 1, 2: 1}
    assert dict(zip(got["n_orders"], got["n_customers"])) == want


# ---------------------------------------------------------------------------
# RAG chunking
# ---------------------------------------------------------------------------


def test_doc_chunk_overlap_matches_duckdb(ray_session):
    from myaku_ray.functions.textops import (
        CHUNK_STRIDE,
        CHUNK_WIDTH,
        DOC_CHUNK_OVERLAP_SQL,
        doc_chunk_overlap,
    )

    got = _match(
        doc_chunk_overlap(SF), DOC_CHUNK_OVERLAP_SQL, SF,
        ["doc_id", "chunk_idx"],
    )
    # shape invariants: chunk count per doc == ceil(len / stride) and
    # every chunk is exactly min(width, len - start) long
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    lens = dict(zip(docs["doc_id"], docs["text"].str.len()))
    per_doc = got.groupby("doc_id")["chunk_idx"].max()
    for doc_id, max_idx in per_doc.items():
        assert max_idx == (lens[doc_id] - 1) // CHUNK_STRIDE
    L = got["doc_id"].map(lens).to_numpy()
    want_len = np.minimum(
        CHUNK_WIDTH, L - got["chunk_idx"].to_numpy() * CHUNK_STRIDE
    )
    assert (got["chunk_len"].to_numpy() == want_len).all()


def test_doc_chunk_overlap_multibyte(ray_session, tmp_path):
    """Codepoint (not byte) slicing: a doc of multibyte chars must chunk
    identically to DuckDB substr/length semantics."""
    from myaku_ray.functions.textops import (
        CHUNK_STRIDE,
        DOC_CHUNK_OVERLAP_SQL,
        doc_chunk_overlap,
    )
    import duckdb

    sf = str(tmp_path)
    text = ("日本語テキスト、" * 40)[:250]  # 250 codepoints, 3-byte chars
    # the empty-text doc must produce ZERO chunks on both sides (DuckDB's
    # truncating // would otherwise emit one empty chunk — SQL gated)
    docs = pd.DataFrame({"doc_id": [7, 8], "text": [text, ""]})
    pq.write_table(pa.Table.from_pandas(docs), f"{sf}/documents.parquet")

    got = doc_chunk_overlap(sf).to_pandas().sort_values("chunk_idx")
    assert (got["doc_id"] == 7).all()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.sql(DOC_CHUNK_OVERLAP_SQL).df().sort_values("chunk_idx")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype(got.dtypes.to_dict()).reset_index(drop=True),
    )
    assert got["chunk_idx"].tolist() == list(range((250 - 1) // CHUNK_STRIDE + 1))


# ---------------------------------------------------------------------------
# MMR re-ranking
# ---------------------------------------------------------------------------


def test_mmr_select_pure_relevance_at_lambda_one():
    from myaku_ray.functions.ann import _mmr_select

    rng = np.random.default_rng(7)
    n = 20
    qsims = np.round(rng.uniform(-1, 1, n), 6)
    S = np.round(rng.uniform(-1, 1, (n, n)), 6)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    picks, scores = _mmr_select(qsims, S, ids, 8, 1.0)
    # lambda=1: diversity term vanishes -> picks are sim-desc order
    want = np.lexsort((ids, -np.round(qsims, 6)))[:8]
    assert picks.tolist() == want.tolist()
    assert np.allclose(scores, np.round(qsims, 6)[want])


def test_mmr_select_demotes_near_duplicate():
    from myaku_ray.functions.ann import _mmr_select

    # candidate 1 is relevance-#2 but a near-clone of #1: with a
    # diversity-heavy lambda it must lose rank 2 to the dissimilar #3
    qsims = np.array([0.99, 0.98, 0.90])
    S = np.array(
        [
            [1.0, 0.99, 0.0],
            [0.99, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    ids = np.array([1, 2, 3], dtype=np.int64)
    picks, _ = _mmr_select(qsims, S, ids, 3, 0.5)
    assert ids[picks].tolist() == [1, 3, 2]
    # sanity: pure relevance would keep the clone at rank 2
    picks_rel, _ = _mmr_select(qsims, S, ids, 3, 1.0)
    assert ids[picks_rel].tolist() == [1, 2, 3]


def test_mmr_rerank_matches_serial_replica(ray_session):
    """Distributed candidate pool + shared selection kernel == a pure
    numpy full-matrix replica (the golden generator's path) at sf0.001."""
    from myaku_ray.functions.ann import (
        MMR_LAMBDA,
        MMR_N_CAND,
        MMR_TOPK,
        _load_query_matrix,
        _matrix,
        _mmr_select,
        mmr_diverse_rerank,
    )

    got = mmr_diverse_rerank(SF).sort_values(
        ["query_vec_id", "rank"]
    ).reset_index(drop=True)

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    X = _matrix(t["embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    xnorm = np.sqrt((X * X).sum(axis=1))
    Xu = X / xnorm[:, None]
    qids, Q, qnorm = _load_query_matrix(SF)
    sims = np.round((Q @ X.T) / (qnorm[:, None] * xnorm[None, :]), 6)
    rows = []
    for qi, qid in enumerate(qids):
        mask = ids != qid
        cand_ids = ids[mask]
        cand = sims[qi][mask]
        order = np.lexsort((cand_ids, -cand))[:MMR_N_CAND]
        S = np.round(Xu[mask][order] @ Xu[mask][order].T, 6)
        picks, scores = _mmr_select(
            cand[order], S, cand_ids[order], MMR_TOPK, MMR_LAMBDA
        )
        for rank, (j, sc) in enumerate(zip(picks, scores), start=1):
            rows.append((int(qid), rank, int(cand_ids[order][j]), float(sc)))
    want = pd.DataFrame(
        rows, columns=["query_vec_id", "rank", "neighbor_vec_id", "mmr_r"]
    ).sort_values(["query_vec_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


# ---------------------------------------------------------------------------
# Hard-negative mining / weighted sampling / more-like-this
# ---------------------------------------------------------------------------


def test_hard_negative_mining_matches_duckdb_and_excludes_label(ray_session):
    from myaku_ray.functions.ann import (
        HARD_NEGATIVE_MINING_SQL,
        N_QUERIES,
        hard_negative_mining,
    )

    got = _match(
        hard_negative_mining(SF), HARD_NEGATIVE_MINING_SQL, SF,
        ["query_vec_id", "rank"],
    )
    # no neighbor shares its query's label
    emb = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_pandas()
    labels = dict(zip(emb["vec_id"], emb["label"]))
    for _, r in got.iterrows():
        assert labels[r["query_vec_id"]] != labels[r["neighbor_vec_id"]]
    assert got["query_vec_id"].nunique() == N_QUERIES


def test_weighted_sample_docs_matches_duckdb_and_weight_bias(ray_session):
    from myaku_ray.functions.textops import (
        WEIGHTED_SAMPLE_K,
        WEIGHTED_SAMPLE_SQL,
        weighted_sample_docs,
    )

    got = _match(
        weighted_sample_docs(SF), WEIGHTED_SAMPLE_SQL, SF, ["rank"]
    )
    assert len(got) == WEIGHTED_SAMPLE_K
    # A-Res with w = n_chars: the sample must skew long — its mean
    # length exceeds the corpus mean
    corpus = pq.read_table(
        f"{SF}/documents.parquet", columns=["n_chars"]
    ).to_pandas()
    assert got["n_chars"].mean() > corpus["n_chars"].mean()


def test_ares_key_kernel_bit_identity():
    """hashkit.ares_key must equal DuckDB's ln-expression bitwise (the
    oracle-identity contract the op's hash compare rests on)."""
    import duckdb
    import pyarrow as pa

    from myaku_ray.functions.hashkit import ares_key

    rng = np.random.default_rng(3)
    h = rng.integers(0, 2**63, 1000).astype(np.uint64)
    w = rng.uniform(1, 1000, 1000)
    got = ares_key(h, w)
    t = pa.table({"h": pa.array(h, pa.uint64()), "w": pa.array(w)})
    want = (
        duckdb.sql(
            "SELECT ln((CAST(h AS DOUBLE)+0.5)/18446744073709551616.0)/w"
            " AS k FROM t"
        )
        .arrow()["k"]
        .to_numpy(zero_copy_only=False)
    )
    assert np.array_equal(got, want)


def test_more_like_this_engine_matches_serial_oracle(ray_session):
    """Rank identity (docIDs AND scores) engine vs serial oracle on the
    fixed pages corpus, plus seed exclusion."""
    from myaku_ray.functions.fulltext import _pages_dir, _pages_searcher
    from myaku_ray.oracle import (
        build_oracle_index, mlt_seed_set, oracle_more_like_this,
    )
    from myaku_ray.corpus import gen_blogs_table

    s = _pages_searcher()
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    oi = build_oracle_index(_pages_dir(), blog_ratings=ratings)
    seeds = mlt_seed_set(_pages_dir())
    assert seeds
    for seed in seeds:
        got = [(r.doc_id, round(r.score, 5)) for r in s.more_like_this(seed)]
        want = [
            (d, round(sc, 5))
            for (d, sc, _w) in oracle_more_like_this(oi, seed)
        ]
        assert got == want
        assert seed not in [d for d, _ in got]


def test_more_like_this_unknown_seed_empty(ray_session):
    from myaku_ray.functions.fulltext import _pages_searcher

    s = _pages_searcher()
    assert s.more_like_this(123456789123) == []


def test_events_hourly_anomalies_matches_duckdb(ray_session):
    from myaku_ray.functions.events import (
        EVENTS_HOURLY_ANOMALIES_SQL,
        events_hourly_anomalies,
    )

    got = _match(
        events_hourly_anomalies(SF), EVENTS_HOURLY_ANOMALIES_SQL, SF,
        ["event_id"],
    )
    assert len(got) >= 0


def test_events_hourly_anomalies_planted_outlier(ray_session, tmp_path):
    """One wild value inside an otherwise-flat hour must be flagged;
    the flat events and a flat neighboring hour must not."""
    from myaku_ray.functions.events import events_hourly_anomalies

    sf = str(tmp_path)
    base = pd.Timestamp("2024-01-01")
    n = 50
    ev = pd.DataFrame(
        {
            "event_id": range(n + 1),
            "ts": [base + pd.Timedelta(seconds=30 * i) for i in range(n)]
            + [base + pd.Timedelta(hours=2)],
            "value": [10.0 + (i % 2) * 0.02 for i in range(n)] + [10.01],
        }
    )
    ev.loc[7, "value"] = 500.0  # the outlier, inside hour 0
    pq.write_table(pa.Table.from_pandas(ev), f"{sf}/events.parquet")

    got = events_hourly_anomalies(sf).to_pandas()
    assert got["event_id"].tolist() == [7]


def test_late_shipment_q4_matches_duckdb(ray_session):
    from myaku_ray.functions.relational import (
        LATE_SHIPMENT_Q4_SQL,
        late_shipment_orders_q4,
    )

    got = _match(
        late_shipment_orders_q4(SF), LATE_SHIPMENT_Q4_SQL, SF,
        ["o_orderpriority"],
    )
    assert len(got) > 0


def test_late_shipment_q4_exists_boundary(ray_session, tmp_path):
    """EXISTS must be strict: one lineitem shipped EXACTLY at the
    threshold does not qualify; one microsecond past it does; an order
    with several on-time lines and one late line counts once."""
    from myaku_ray.functions.relational import (
        Q4_LATE_DAYS,
        late_shipment_orders_q4,
    )

    sf = str(tmp_path)
    base = pd.Timestamp("1996-01-01")
    t = pd.Timedelta(days=Q4_LATE_DAYS)
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_orderdate": [base] * 3,
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3, 3, 3],
            "l_shipdate": [
                base + t,                                # exactly at: NOT late
                base + t + pd.Timedelta(microseconds=1),  # just past: late
                base,                                    # on time
                base + pd.Timedelta(days=1),             # on time
                base + t + pd.Timedelta(days=5),         # late -> order 3 once
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), f"{sf}/orders.parquet")
    pq.write_table(pa.Table.from_pandas(li), f"{sf}/lineitem.parquet")

    got = late_shipment_orders_q4(sf)
    assert dict(zip(got["o_orderpriority"], got["n_late"])) == {
        "1-URGENT": 1,
        "2-HIGH": 1,
    }


def test_late_shipment_q4_driver_vs_distributed_parity(
    ray_session, monkeypatch
):
    from myaku_ray.functions import relational

    fast = relational.late_shipment_orders_q4(SF)
    monkeypatch.setattr(relational, "Q4_DRIVER_AGG_LIMIT", 0)
    slow = relational.late_shipment_orders_q4(SF)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True)
    )


def test_embedding_outliers_matches_serial_replica(ray_session):
    """Distributed fit + two-pass gate == the serial numpy replica (the
    golden generator's path) at sf0.001, plus tail-fraction sanity."""
    from myaku_ray.functions.ann import (
        EMB_OUTLIER_FACTOR,
        KMEANS_FP_SCALE,
        KMEANS_ITERS,
        KMEANS_K,
        _matrix,
        embedding_outliers,
        kmeans_fit,
    )

    res = embedding_outliers(SF)
    got = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    got = got.sort_values("vec_id").reset_index(drop=True)

    C, _ = kmeans_fit(SF, k=KMEANS_K, iters=KMEANS_ITERS)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    X = _matrix(t["embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    scores = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
    assign = scores.argmax(axis=1)
    d2 = (X * X).sum(axis=1) - 2.0 * scores[np.arange(len(X)), assign]
    d2q = np.round(d2 * KMEANS_FP_SCALE).astype(np.int64)
    thr = {}
    for c in np.unique(assign):
        m = assign == c
        mean_r = round(d2q[m].sum() / KMEANS_FP_SCALE / m.sum(), 6)
        thr[c] = round(EMB_OUTLIER_FACTOR * mean_r, 6)
    d2_r = np.round(d2, 6)
    mask = d2_r > np.vectorize(thr.get)(assign)
    want = pd.DataFrame(
        {
            "vec_id": ids[mask],
            "cluster_id": assign[mask].astype(np.int64),
            "d2_r": d2_r[mask],
        }
    ).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # the gate keeps a strict tail, never everything
    n_total = len(ids)
    assert 0 < len(got) < n_total * 0.5


def test_distinctive_terms_matches_duckdb(ray_session):
    from myaku_ray.functions.textops import (
        DISTINCTIVE_TERMS_SQL,
        DISTINCTIVE_TOPK,
        distinctive_terms_per_source,
    )

    got = _match(
        distinctive_terms_per_source(SF), DISTINCTIVE_TERMS_SQL, SF,
        ["source", "rank"],
    )
    assert (got.groupby("source")["rank"].max() <= DISTINCTIVE_TOPK).all()


def test_distinctive_terms_planted_marker(ray_session, tmp_path):
    """A term appearing in every doc of one source and nowhere else must
    rank first for that source."""
    from myaku_ray.functions.textops import distinctive_terms_per_source

    sf = str(tmp_path)
    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "source": ["srcA"] * 4 + ["srcB"] * 4,
            "text": ["zebra common word"] * 4 + ["common word other"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), f"{sf}/documents.parquet")
    got = distinctive_terms_per_source(sf)
    top_a = got[(got["source"] == "srcA") & (got["rank"] == 1)]
    assert top_a["term"].tolist() == ["zebra"]
    # a*d - b*c = 4*4 - 0*0 = 16 for the exclusive marker
    assert top_a["score"].tolist() == [16]
