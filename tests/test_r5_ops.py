"""Round-5 operator: incremental IVF maintenance (ivf_add_delta).

The vector-side analog of the text index's batch-incremental update:
new vectors join the EXISTING cell layout by map-side assignment to the
frozen centroids.  Gates: stored-golden equality (serial replica via
the shared deterministic centroid kernels), idempotency (the delta is
added once), and base-immutability (the add never rewrites a base
cell file — delta rows land as NEW files, the text-delta contract).
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def _engine(ray_session):
    from myaku_ray.functions.ann import ivf_add_delta

    return ivf_add_delta(SF)


def test_ivf_add_delta_matches_golden(ray_session):
    import duckdb

    from myaku_ray.functions.op_goldens import IVF_ADD_DELTA_SQL

    got = _engine(ray_session)
    want = duckdb.sql(IVF_ADD_DELTA_SQL).df().sort_values(
        "cell_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_delta"].sum() > 0  # the delta really landed


def test_ivf_add_delta_idempotent_and_base_immutable(ray_session):
    from myaku_ray.functions.ann import (
        _ivf_delta_cut, build_ivf_layout, ivf_add_delta,
    )

    src = f"{SF}/embeddings.parquet"
    cut = _ivf_delta_cut(src)
    layout = build_ivf_layout(SF, vec_id_max=cut)
    first = ivf_add_delta(SF)
    files = sorted(
        glob.glob(os.path.join(layout, "**", "*.parquet"), recursive=True)
    )
    mtimes = {f: os.path.getmtime(f) for f in files}
    again = ivf_add_delta(SF)  # marker makes the add a no-op
    pd.testing.assert_frame_equal(first, again)
    files2 = sorted(
        glob.glob(os.path.join(layout, "**", "*.parquet"), recursive=True)
    )
    assert files2 == files  # no duplicate delta write
    assert all(os.path.getmtime(f) == m for f, m in mtimes.items())
    # base + delta row totals reconcile with the source table
    import pyarrow.parquet as pq

    total = pq.read_metadata(src).num_rows
    assert int(first["n_base"].sum()) == cut
    assert int(first["n_delta"].sum()) == total - cut


def test_pq_recall_eval_consistent(ray_session):
    """pq_recall_eval must equal a direct per-query set intersection of
    its two (already-oracled) legs, with sane bounds."""
    from myaku_ray.functions.ann import (
        TOPK, ann_cosine_topk, pq_cosine_topk, pq_recall_eval,
    )

    got = pq_recall_eval(SF)
    pq_df = pq_cosine_topk(SF)
    brute = ann_cosine_topk(SF)
    for _, row in got.iterrows():
        q = row["query_vec_id"]
        a = set(pq_df.loc[pq_df["query_vec_id"] == q, "neighbor_vec_id"])
        b = set(brute.loc[brute["query_vec_id"] == q, "neighbor_vec_id"])
        assert row["n_hits"] == len(a & b)
        assert 0 <= row["n_hits"] <= TOPK == row["k"]
    assert got["recall_r"].between(0, 1).all()
    assert got["n_hits"].sum() > 0  # the approximation isn't junk


def test_doc_ppl_buckets_invariants(ray_session):
    """CCNet tercile buckets: per-language totals reconcile with the
    documents table, bucket milli-ranges are ordered and disjoint, and
    the head tercile holds ceil(n/3) docs (value-threshold ties can
    only grow it past n/3, never shrink it)."""
    import duckdb
    import math

    from myaku_ray.functions.textops import doc_ppl_buckets

    got = doc_ppl_buckets(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM parquet_scan('{SF}/documents.parquet')"
    )
    lang_totals = dict(
        con.execute("SELECT lang, count(*) FROM documents GROUP BY lang")
        .fetchall()
    )
    for lang, sub in got.groupby("lang"):
        assert int(sub["n_docs"].sum()) == lang_totals[lang]
        by = {r["bucket"]: r for _, r in sub.iterrows()}
        assert set(by) <= {"head", "middle", "tail"}
        if "head" in by and "middle" in by:
            assert by["head"]["max_milli"] < by["middle"]["min_milli"]
        if "middle" in by and "tail" in by:
            assert by["middle"]["max_milli"] < by["tail"]["min_milli"]
        n = lang_totals[lang]
        assert by["head"]["n_docs"] >= math.ceil(n / 3) - 1
