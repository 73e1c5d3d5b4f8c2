"""Round-3 operators: repeated-span detection, dup clustering via star
contraction, repetition quality signals, stratified sampling, PMI
co-occurrence — each checked against its DuckDB oracle SQL (the same
comparison the driver runs) plus structural invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str, sf: str = SF) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    return con.sql(sql).df()


def _norm(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    df = df[sorted(df.columns)].sort_values(keys).reset_index(drop=True)
    return df


def _compare(got, sql: str, keys: list[str], sf: str = SF) -> None:
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    want = _oracle(sql, sf)
    got = _norm(got, keys)
    want = _norm(want, keys).astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)


def test_duplicate_spans_matches_oracle(ray_session):
    from myaku_ray.functions.dedup import DUPLICATE_SPANS_SQL, duplicate_spans

    got = duplicate_spans(SF)
    _compare(got, DUPLICATE_SPANS_SQL, ["span_hash"])


def test_duplicate_spans_finds_planted_span(ray_session, tmp_path):
    """A span planted on the stride grid in two docs must surface."""
    shared = " ".join(f"tok{i}" for i in range(8))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    shared + " alpha beta gamma delta",
                    shared + " epsilon zeta eta theta",
                    "totally different words here with no overlap at all",
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from myaku_ray.functions.dedup import duplicate_spans

    out = duplicate_spans(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_docs"] == 2
    assert out.iloc[0]["min_doc_id"] == 1


def test_doc_repetition_stats_matches_oracle(ray_session):
    from myaku_ray.functions.textops import (
        DOC_REPETITION_STATS_SQL, doc_repetition_stats,
    )

    _compare(doc_repetition_stats(SF), DOC_REPETITION_STATS_SQL, ["doc_id"])


def test_doc_repetition_stats_on_pathological_docs(ray_session, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "x x x x x x",          # one token repeated
                    "a b c d e f",          # all distinct
                    "ab",                   # shorter than a trigram
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from myaku_ray.functions.textops import doc_repetition_stats

    out = (
        doc_repetition_stats(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["top_token_frac_r"].tolist() == [1.0, round(1 / 6, 6), 1.0]
    # doc1: all 4 trigram occurrences are the same trigram -> frac 1
    assert out["dup_trigram_frac_r"].tolist() == [1.0, 0.0, 0.0]
    assert out["distinct_frac_r"].tolist() == [round(1 / 6, 6), 1.0, 1.0]


def test_stratified_sample_matches_oracle(ray_session):
    from myaku_ray.functions.textops import (
        STRATIFIED_SAMPLE_SQL, stratified_sample_by_source,
    )

    _compare(
        stratified_sample_by_source(SF), STRATIFIED_SAMPLE_SQL, ["doc_id"]
    )


def test_stratified_sample_balances_sources(ray_session, tmp_path):
    """A 10x-skewed source distribution must come out ~equal per source
    (exact determinism checked by the oracle test; here the rate shape)."""
    n_small, n_big = 40, 400
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_small + n_big), pa.int64()),
            "source": pa.array(
                ["small"] * n_small + ["big"] * n_big
            ),
            "lang": pa.array(["en"] * (n_small + n_big)),
            "n_chars": pa.array(
                np.full(n_small + n_big, 10), pa.int64()
            ),
            "text": pa.array(["w"] * (n_small + n_big)),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from myaku_ray.functions.textops import stratified_sample_by_source

    out = stratified_sample_by_source(str(tmp_path)).to_pandas()
    per = out.groupby("source").size()
    # expected n_small/2 from each; md5 noise makes it binomial around that
    exp = n_small / 2
    assert abs(per.get("big", 0) - exp) <= 3 * np.sqrt(exp)
    assert abs(per.get("small", 0) - exp) <= 3 * np.sqrt(exp)


def test_term_cooccurrence_pmi_matches_oracle(ray_session):
    from myaku_ray.functions.textops import (
        TERM_COOCCURRENCE_PMI_SQL, term_cooccurrence_pmi,
    )

    got = term_cooccurrence_pmi(SF)
    assert len(got) > 0, "min_support too high for the sf0.001 corpus"
    _compare(got, TERM_COOCCURRENCE_PMI_SQL, ["term_a", "term_b"])


def test_dup_clusters_matches_oracle(ray_session):
    from myaku_ray.functions.dedup import DUP_CLUSTERS_SQL, dup_clusters

    got = dup_clusters(SF)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    assert len(got) > 0, "no near-dup pairs at sf0.001 — threshold drifted?"
    _compare(got, DUP_CLUSTERS_SQL, ["doc_id"])


def test_dup_clusters_equals_union_find(ray_session):
    """Star contraction must agree with a serial union-find over the
    same pair set."""
    from myaku_ray.functions.dedup import dup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(SF).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = pd.DataFrame(
        sorted((n, find(n)) for n in parent),
        columns=["doc_id", "cluster_id"],
    )
    got = dup_clusters(SF)
    got = (got if isinstance(got, pd.DataFrame) else got.to_pandas())
    got = got.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64)
    )


def test_events_props_stats_matches_oracle(ray_session):
    import duckdb

    from myaku_ray.functions.events import (
        EVENTS_PROPS_STATS_SQL, events_props_stats,
    )

    got = events_props_stats(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    want = con.sql(EVENTS_PROPS_STATS_SQL).df()
    got = _norm(got, ["event_type"])
    want = _norm(want, ["event_type"]).astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)


def test_ann_filtered_matches_oracle(ray_session):
    import duckdb

    from myaku_ray.functions.ann import (
        ANN_COSINE_TOPK_FILTERED_SQL, ANN_FILTER_LABEL_MOD,
        ann_cosine_topk_filtered,
    )

    got = ann_cosine_topk_filtered(SF)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = con.sql(ANN_COSINE_TOPK_FILTERED_SQL).df()
    keys = ["query_vec_id", "rank"]
    got = _norm(got, keys)
    want = _norm(want, keys).astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    # every neighbor satisfies the predicate
    import pyarrow.parquet as _pq

    lab = _pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "label"])
    l_of = dict(zip(lab["vec_id"].to_pylist(), lab["label"].to_pylist()))
    assert all(
        l_of[int(n)] % ANN_FILTER_LABEL_MOD == 0
        for n in got["neighbor_vec_id"]
    )


def test_dup_clusters_empty_graph(ray_session, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "source": pa.array(["s1", "s2"]),
            "text": pa.array(
                ["completely unique words one", "other body entirely two"]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    from myaku_ray.functions.dedup import dup_clusters

    out = dup_clusters(str(tmp_path))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert len(out) == 0


def test_media_features_batch_shape_independent(ray_session):
    """Feature values (and the 6-dp norm) must not depend on how rows
    are batched — gemm blocking must never leak into oracle values."""
    import pyarrow.parquet as _pq

    from myaku_ray.functions.media import MediaFeatureStage, _as_media

    docs = _pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    media = _as_media(docs)
    stage = MediaFeatureStage()
    whole = stage(media)
    parts = pa.concat_tables(
        [stage(media.slice(0, 7)), stage(media.slice(7))]
    )
    assert whole["feat_norm"].to_pylist() == parts["feat_norm"].to_pylist()
    assert whole["feature"].to_pylist() == parts["feature"].to_pylist()


def test_hybrid_search_rrf_matches_oracle(ray_session):
    import duckdb

    from myaku_ray.functions.fulltext import (
        hybrid_search_rrf, hybrid_search_rrf_sql,
    )

    got = hybrid_search_rrf(SF)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    want = con.sql(hybrid_search_rrf_sql()).df()
    keys = ["query_id", "rank"]
    got = _norm(got, keys)
    want = _norm(want, keys).astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    # fusion actually fuses: some result must carry contributions from
    # BOTH legs (rrf_r > max single-leg contribution 1/61)
    assert (got["rrf_r"] > 1.0 / 61 + 1e-12).any()
