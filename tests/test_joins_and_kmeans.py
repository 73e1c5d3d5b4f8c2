"""As-of join, range join, BPE token counts (DuckDB parity) and
distributed k-means (determinism / convergence / cluster recovery)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _duckdb_con(sf: str):
    import duckdb

    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def _assert_matches_sql(ray_result, sql: str, sf: str, sort_key: list[str]):
    got = ray_result
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = _duckdb_con(sf)
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


def test_asof_join_matches_duckdb(ray_session):
    from myaku_ray.functions.events import EVENTS_ASOF_SQL, events_asof_join

    got = _assert_matches_sql(
        events_asof_join(SF), EVENTS_ASOF_SQL, SF, ["event_id"]
    )
    assert len(got) > 0
    assert (got["lag_us"] >= 0).all()


def test_range_join_matches_duckdb(ray_session):
    from myaku_ray.functions.events import (
        EVENTS_RANGE_JOIN_SQL,
        events_range_join,
    )

    got = _assert_matches_sql(
        events_range_join(SF), EVENTS_RANGE_JOIN_SQL, SF, ["window_id"]
    )
    assert len(got) > 0


def test_bpe_tokens_match_duckdb_and_diverge_from_ws(ray_session):
    from myaku_ray.functions.textops import DOC_BPE_TOKENS_SQL, doc_bpe_tokens

    got = _assert_matches_sql(
        doc_bpe_tokens(SF), DOC_BPE_TOKENS_SQL, SF, ["doc_id"]
    )
    # the headered text makes the regex tokenizer genuinely finer than
    # whitespace — a degenerate (always-equal) check would prove nothing
    assert (got["n_bpe_tokens"] > got["n_ws_tokens"]).all()


def test_pack_training_chunks_matches_duckdb(ray_session):
    from myaku_ray.functions.textops import (
        PACK_BUDGET,
        PACK_TRAINING_CHUNKS_SQL,
        pack_training_chunks,
    )

    got = _assert_matches_sql(
        pack_training_chunks(SF), PACK_TRAINING_CHUNKS_SQL, SF, ["doc_id"]
    )
    assert len(got) > 0
    # scan invariants: chunk ids are non-decreasing in doc_id order, every
    # offset is inside the budget, and offsets advance by exactly n_tokens
    # within a chunk (the packing is gapless)
    g = got.sort_values("doc_id").reset_index(drop=True)
    assert (g["chunk_id"].diff().fillna(0) >= 0).all()
    assert g["chunk_offset"].between(0, PACK_BUDGET - 1).all()
    start = g["chunk_id"] * PACK_BUDGET + g["chunk_offset"]
    assert (start.diff().dropna() == g["n_tokens"][:-1].to_numpy()).all()
    assert g["chunk_id"].nunique() > 1  # corpus actually spans chunks


def test_decontaminate_docs_matches_duckdb(ray_session):
    import duckdb

    from myaku_ray.functions.textops import (
        DECONTAMINATE_DOCS_SQL,
        decontaminate_docs,
    )

    con = duckdb.connect()
    for t in ("documents", "part"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = con.sql(DECONTAMINATE_DOCS_SQL).df()
    got = decontaminate_docs(SF).to_pandas()
    got = got[sorted(got.columns)].sort_values("doc_id").reset_index(drop=True)
    want = (
        want[sorted(want.columns)]
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(got.dtypes.to_dict())
    )
    pd.testing.assert_frame_equal(got, want)
    # the gate must actually fire on this corpus, and not on everything
    assert 0 < got["contaminated"].sum() < len(got)


def test_bloom_doc_filter_matches_duckdb_and_has_no_false_negatives(
    ray_session,
):
    import duckdb
    import pyarrow.parquet as pq

    from myaku_ray.functions.textops import (
        BLOOM_DOC_FILTER_SQL,
        BLOOM_K,
        BLOOM_M,
        bloom_contains,
        bloom_doc_filter,
    )

    got = bloom_doc_filter(SF)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.sql(BLOOM_DOC_FILTER_SQL).df()
    assert got["bit"].tolist() == want["bit"].tolist()  # state bit-identical

    bits = got["bit"].to_numpy()
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    assert all(bloom_contains(bits, i) for i in ids)  # no false negatives
    # false-positive rate near theory for absent keys
    absent = [max(ids) + 1 + j for j in range(2000)]
    fp = sum(bloom_contains(bits, j) for j in absent) / len(absent)
    n = len(set(ids))
    theory = (1 - np.exp(-BLOOM_K * n / BLOOM_M)) ** BLOOM_K
    assert fp < 3 * theory + 0.02


def test_pack_training_chunks_bucket_scan_is_order_preserving(ray_session):
    """The range-bucket assignment must respect global doc_id order:
    every doc in bucket i precedes every doc in bucket i+1 (the scan's
    correctness precondition)."""
    from myaku_ray.functions.textops import pack_training_chunks

    got = pack_training_chunks(SF).to_pandas().sort_values("doc_id")
    # recompute global starts serially and compare
    start = got["chunk_id"].to_numpy() * 2048 + got["chunk_offset"].to_numpy()
    serial = np.cumsum(got["n_tokens"].to_numpy()) - got["n_tokens"].to_numpy()
    assert (start == serial).all()


def test_kmeans_deterministic_and_monotone(ray_session):
    from myaku_ray.functions.ann import kmeans_fit

    C1, h1 = kmeans_fit(SF, k=4, iters=5)
    C2, h2 = kmeans_fit(SF, k=4, iters=5)
    assert np.array_equal(C1, C2)
    assert h1 == h2
    assert all(h1[i + 1] <= h1[i] + 1e-9 for i in range(len(h1) - 1))


def test_kmeans_recovers_planted_clusters(ray_session, tmp_path):
    """10 tight planted clusters -> k=10 Lloyd's should recover them:
    every k-means cluster is label-pure and inertia collapses far below
    the 1-cluster baseline."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from myaku_ray.functions.ann import kmeans_embeddings, kmeans_fit

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 32)) * 4.0
    X = np.concatenate(
        [centers[i] + 0.05 * rng.standard_normal((50, 32)) for i in range(10)]
    )
    labels = np.repeat(np.arange(10), 50)
    # label-ordered layout: the deterministic strided seeding lands one
    # seed per blob, so recovery tests the distributed Lloyd machinery
    # rather than seeding luck (strided seeds on shuffled data can merge
    # blobs — a documented property of RNG-free init, not a bug)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(X)), pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in X], pa.list_(pa.float32())
                ),
                "label": pa.array(labels.astype(np.int32)),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    sf = str(tmp_path)

    C, hist = kmeans_fit(sf, k=10, iters=10)
    # assignment by the trained centroids
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    df = pd.DataFrame({"label": labels, "cluster": assign})
    purity = (
        df.groupby("cluster")["label"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s))
        .min()
    )
    assert purity == 1.0  # 0.05-sigma blobs at 4-sigma spacing: exact recovery
    baseline = ((X - X.mean(axis=0)) ** 2).sum()
    assert hist[-1] < 0.05 * baseline

    out = kmeans_embeddings(sf, k=10, iters=10)
    assert sorted(out["cluster_id"]) == list(range(10))
    assert out["size"].sum() == len(X)


def test_tfidf_top_terms_match_duckdb(ray_session):
    from myaku_ray.functions.textops import TFIDF_TOP_TERMS_SQL, tfidf_top_terms

    got = _assert_matches_sql(
        tfidf_top_terms(SF), TFIDF_TOP_TERMS_SQL, SF, ["doc_id", "rank"]
    )
    # within one doc, scores are non-increasing with rank
    assert (
        got.sort_values(["doc_id", "rank"])
        .groupby("doc_id")["tfidf_r"]
        .apply(lambda s: (s.diff().dropna() <= 1e-12).all())
        .all()
    )


def test_sample_documents_deterministic_and_matches_duckdb(ray_session):
    from myaku_ray.functions.textops import SAMPLE_DOCUMENTS_SQL, sample_documents

    got = _assert_matches_sql(
        sample_documents(SF), SAMPLE_DOCUMENTS_SQL, SF, ["doc_id"]
    )
    again = sample_documents(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.sort_index(axis=1)["doc_id"]) == list(again["doc_id"])
    assert 0 < len(got)


def test_kmeans_representatives_pure_and_central(ray_session, tmp_path):
    """Representatives of planted clusters carry the cluster's label and
    are ranked by ascending (rounded) squared distance."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from myaku_ray.functions.ann import kmeans_representatives

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((5, 16)) * 4.0
    X = np.concatenate(
        [centers[i] + 0.05 * rng.standard_normal((40, 16)) for i in range(5)]
    )
    labels = np.repeat(np.arange(5), 40)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(X)), pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in X], pa.list_(pa.float32())
                ),
                "label": pa.array(labels.astype(np.int32)),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    reps = (
        kmeans_representatives(str(tmp_path), k=5, iters=5, r=3)
        .to_pandas()
        .sort_values(["cluster_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(reps) == 15
    # label purity: all representatives of one cluster share a label
    lab = dict(zip(range(len(X)), labels))
    assert (
        reps.groupby("cluster_id")["vec_id"]
        .agg(lambda s: len({lab[v] for v in s}))
        .eq(1)
        .all()
    )
    # rank order is ascending distance within each cluster
    assert (
        reps.groupby("cluster_id")["d2_r"]
        .apply(lambda s: (s.diff().dropna() >= -1e-12).all())
        .all()
    )


def test_heavy_hitters_matches_duckdb_all_paths(ray_session):
    """Certified path, no-candidate fallback (cap=2) and failed-certificate
    fallback (cap=40) must all return the exact DuckDB top-k."""
    from myaku_ray.functions.textops import (
        TOP_TERMS_HH_SQL,
        top_terms_heavy_hitters,
    )

    con = _duckdb_con(SF)
    want = con.sql(TOP_TERMS_HH_SQL).df()
    for cap in (4096, 40, 2):
        got = top_terms_heavy_hitters(SF, cap=cap)
        got = got[sorted(got.columns)].reset_index(drop=True)
        w = want[sorted(want.columns)].reset_index(drop=True).astype(
            got.dtypes.to_dict()
        )
        pd.testing.assert_frame_equal(got, w)


def test_asof_join_hot_key_skew(ray_session, tmp_path):
    """One user owning every event (worst-case join-key skew) still
    produces the exact DuckDB ASOF JOIN result."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from myaku_ray.functions.events import EVENTS_ASOF_SQL, events_asof_join

    rng = np.random.default_rng(3)
    n = 4000
    ts = np.sort(rng.integers(0, 10**9, n)) + 1_700_000_000_000_000
    types = np.where(rng.random(n) < 0.3, "purchase", "click")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, dtype=np.int64)),
                "event_type": pa.array(types.tolist(), pa.string()),
                "value": pa.array(rng.random(n) * 100),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = events_asof_join(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.sql(EVENTS_ASOF_SQL).df()
    got = got[sorted(got.columns)].sort_values("event_id").reset_index(drop=True)
    want = (
        want[sorted(want.columns)]
        .sort_values("event_id")
        .reset_index(drop=True)
        .astype(got.dtypes.to_dict())
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 1000


def test_curate_export_writes_partitioned_and_is_idempotent(
    ray_session, tmp_path
):
    import os

    from myaku_ray.functions.textops import CURATE_EXPORT_SQL, curate_export

    out = str(tmp_path / "curated")
    got = _assert_matches_sql(
        curate_export(SF, out_dir=out), CURATE_EXPORT_SQL, SF, ["source"]
    )
    assert got["n_docs"].sum() > 0
    parts = [d for d in os.listdir(out) if d.startswith("source=")]
    assert len(parts) == len(got)
    t1 = os.path.getmtime(os.path.join(out, "_SUCCESS"))
    curate_export(SF, out_dir=out)
    assert os.path.getmtime(os.path.join(out, "_SUCCESS")) == t1


def test_hll_registers_match_duckdb_and_estimate_is_tight(ray_session):
    from myaku_ray.functions.events import (
        HLL_EVENT_REGISTERS_SQL,
        hll_estimate,
        hll_event_registers,
    )

    got = _assert_matches_sql(
        hll_event_registers(SF), HLL_EVENT_REGISTERS_SQL, SF, ["rank"]
    )
    con = _duckdb_con(SF)
    exact = con.sql("SELECT count(DISTINCT event_id) FROM events").fetchone()[0]
    est = hll_estimate(got.rename(columns=str))
    assert abs(est - exact) / exact < 0.05  # ~3x the 1.6% sketch sigma


def test_cms_matrix_matches_duckdb_and_bounds_hold(ray_session):
    from myaku_ray.functions.textops import (
        CMS_TERM_COUNTS_SQL,
        CMS_WIDTH,
        cms_point_query,
        cms_term_counts,
    )

    got = _assert_matches_sql(
        cms_term_counts(SF), CMS_TERM_COUNTS_SQL, SF, ["row_id", "col_id"]
    )
    con = _duckdb_con(SF)
    exact = con.sql(
        "SELECT term, count(*) c FROM (SELECT unnest(string_split(text,' ')) "
        "term FROM documents) GROUP BY term"
    ).df()
    N = int(exact["c"].sum())
    for t, c in zip(exact["term"], exact["c"]):
        est = cms_point_query(got, t)
        assert est >= c                       # CMS never underestimates
        assert est <= c + 2.718 * N / CMS_WIDTH  # eps*N w.h.p.


def test_unigram_logppl_matches_duckdb(ray_session):
    from myaku_ray.functions.textops import (
        DOC_UNIGRAM_LOGPPL_SQL,
        doc_unigram_logppl,
    )

    got = _assert_matches_sql(
        doc_unigram_logppl(SF), DOC_UNIGRAM_LOGPPL_SQL, SF, ["doc_id"]
    )
    assert (got["logppl_r"] > 0).all()


def test_asof_join_partitioned_equals_unpartitioned_hot_user(
    ray_session, tmp_path
):
    """The skew valve (time-epoch partitioned as-of join) is row-identical
    to the single-group-per-user path on a corpus where one user owns 50%
    of all events, including cross-epoch carry matches."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from myaku_ray.functions.events import (
        EVENTS_ASOF_SQL,
        events_asof_join,
        events_asof_join_partitioned,
    )

    rng = np.random.default_rng(11)
    n = 6000
    # one week of microsecond timestamps so the 24h epochs split for real
    ts = np.sort(rng.integers(0, 7 * 86_400_000_000, n)) + 1_700_000_000_000_000
    user = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 40, n))
    types = np.where(rng.random(n) < 0.25, "purchase", "click")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(user.astype(np.int64)),
                "event_type": pa.array(types.tolist(), pa.string()),
                "value": pa.array(rng.random(n) * 100),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    base = (
        events_asof_join(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    part = (
        events_asof_join_partitioned(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        part[sorted(part.columns)], base[sorted(base.columns)]
    )
    # carry-in must actually fire: some match crosses an epoch boundary
    assert (part["lag_us"] > 24 * 3_600_000_000).any()
    # and the DuckDB oracle agrees end to end
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.sql(EVENTS_ASOF_SQL).df()
    want = (
        want[sorted(want.columns)]
        .sort_values("event_id")
        .reset_index(drop=True)
        .astype(part[sorted(part.columns)].dtypes.to_dict())
    )
    pd.testing.assert_frame_equal(part[sorted(part.columns)], want)


def test_top_orders_tie_window(ray_session, tmp_path):
    """>=3k orders tied exactly at the k-th revenue value: the kth-value
    threshold + filter path must pick the lexicographically smallest
    orderkeys, matching DuckDB."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from myaku_ray.functions.relational import (
        TOP_ORDERS_SQL,
        top_orders_by_revenue,
    )

    n_tied, n_top = 3500, 5
    okeys = np.arange(1, n_tied + n_top + 1, dtype=np.int64)
    # 5 clear winners, then 3500 orders all at exactly 50.00
    price = np.concatenate(
        [1000.0 + 10.0 * np.arange(n_top, 0, -1), np.full(n_tied, 50.0)]
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys),
                "l_extendedprice": pa.array(price),
                "l_discount": pa.array(np.zeros(len(okeys))),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_custkey": pa.array(np.ones(len(okeys), dtype=np.int64)),
                "o_totalprice": pa.array(price),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1], pa.int64()),
                "c_name": pa.array(["c1"], pa.string()),
                "c_mktsegment": pa.array(["SEG"], pa.string()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    got = top_orders_by_revenue(str(tmp_path))
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    want = con.sql(TOP_ORDERS_SQL).df()
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True).astype(
        got.dtypes.to_dict()
    )
    pd.testing.assert_frame_equal(got, want)
    # the boundary winners are the smallest keys of the tie group
    assert got["l_orderkey"].tolist()[n_top:] == list(
        range(n_top + 1, 11)
    )


def test_bloom_63bit_ids_no_false_negatives():
    """Regression (review finding): integer-arithmetic bloom keys wrapped
    in int64 for 63-bit url-hash doc ids; string keys must not.  The
    filter state must also stay bit-identical to the DuckDB oracle."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from myaku_ray.functions.hashkit import md5_u64_str
    from myaku_ray.functions.textops import BLOOM_K, BLOOM_M, bloom_contains

    ids = np.array([2**62 + 5, 2**61 + 1, (1 << 63) - 1, 12345], np.int64)
    id_str = pc.cast(pa.array(ids), pa.string())
    bits = np.zeros(BLOOM_M, dtype=bool)
    for i in range(BLOOM_K):
        keys = pc.binary_join_element_wise(id_str, str(i), ":")
        bits[md5_u64_str(keys) % BLOOM_M] = True
    bitpos = np.flatnonzero(bits).astype(np.int64)
    assert all(bloom_contains(bitpos, int(x)) for x in ids)
    con = duckdb.connect()
    con.register("documents", pa.table({"doc_id": pa.array(ids)}))
    from myaku_ray.functions.textops import BLOOM_DOC_FILTER_SQL

    want = con.execute(BLOOM_DOC_FILTER_SQL).df()["bit"].to_numpy()
    assert (np.sort(bitpos) == np.sort(want)).all()


def test_semdedup_prunes_planted_semantic_copies(ray_session, tmp_path):
    """4 tight planted clusters, 12 vectors given a near-identical copy
    with a HIGHER vec_id: SemDeDup must drop every planted copy, the
    surviving keep-set must be pairwise below eps within each cluster,
    and the distributed output must equal a serial recompute through the
    shared scan kernel."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from myaku_ray.functions.ann import (
        _semdedup_scan, kmeans_fit, semdedup_prune,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 32)) * 4.0
    base = np.concatenate(
        [centers[i] + 0.3 * rng.standard_normal((30, 32)) for i in range(4)]
    )
    copies = base[::10] + 1e-4 * rng.standard_normal((12, 32))
    X = np.concatenate([base, copies])
    copy_ids = np.arange(len(base), len(X))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(X)), pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in X], pa.list_(pa.float32())
                ),
                "label": pa.array(np.zeros(len(X), dtype=np.int32)),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    sf = str(tmp_path)
    eps = 0.95

    got = (
        semdedup_prune(sf, k=4, iters=6, eps=eps)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    # every planted (base, copy) pair loses exactly its later-priority
    # member: the copy when the base is more central, else the base —
    # either way one of the two must be pruned
    dropped = set(got["vec_id"])
    for bi, ci in zip(range(0, len(base), 10), copy_ids):
        assert bi in dropped or ci in dropped, (bi, ci)
    assert (got["sim_r"] >= eps).all()
    # dup_of is earlier in priority order => always a distinct vector
    assert (got["dup_of"] != got["vec_id"]).all()

    # keep-set is pairwise below eps inside each cluster: a kept vector
    # saw NO earlier vector >= eps, so for kept i<j (priority order),
    # sim(i, j) < eps
    Xq = np.array(
        pq.read_table(str(tmp_path / "embeddings.parquet"))["embedding"]
        .to_pylist(),
        dtype=np.float64,
    )
    C, _ = kmeans_fit(sf, k=4, iters=6)
    scores = Xq @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
    assign = scores.argmax(axis=1)
    Xu = Xq / np.sqrt((Xq * Xq).sum(axis=1))[:, None]
    kept = np.setdiff1d(np.arange(len(Xq)), got["vec_id"].to_numpy())
    for c in range(4):
        m = kept[assign[kept] == c]
        if len(m) > 1:
            S = np.round(Xu[m] @ Xu[m].T, 6)
            np.fill_diagonal(S, -np.inf)
            assert S.max() < eps

    # serial recompute through the shared kernel reproduces the
    # distributed groupby/map_groups output exactly
    ids = np.arange(len(Xq), dtype=np.int64)
    d2 = np.round(
        (Xq * Xq).sum(axis=1) - 2.0 * scores[np.arange(len(Xq)), assign], 6
    )
    rows = []
    for c in range(4):
        m = np.flatnonzero(assign == c)
        o = m[np.lexsort((ids[m], d2[m]))]
        best, msim = _semdedup_scan(Xu[o], eps)
        for i in np.flatnonzero(msim >= eps):
            rows.append(
                (int(ids[o[i]]), c, int(ids[o[best[i]]]), float(msim[i]))
            )
    want = (
        pd.DataFrame(rows, columns=["vec_id", "cluster_id", "dup_of", "sim_r"])
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # deterministic across runs
    again = (
        semdedup_prune(sf, k=4, iters=6, eps=eps)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)
