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
