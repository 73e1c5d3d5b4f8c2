"""Round-4 seventh-session work: execution-count cuts for the two
slowest ops.

``events_value_percentiles`` gained a driver/distributed scale switch
(one multi-kth np.partition below PCTL_DRIVER_LIMIT) and a batched
distributed path (all open quantiles share each counting scan);
``dsir_importance_weights`` now tokenizes ONCE into a materialized
per-doc sparse histogram and gained a driver-merge/Ray-groupby switch
for the bucket totals.  Each switch is equality-gated here: both paths
must return IDENTICAL frames, and the DuckDB parity tests elsewhere
pin the shared answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_percentiles_driver_equals_distributed(ray_session):
    from myaku_ray.functions.events import events_value_percentiles

    a = events_value_percentiles(SF)
    b = events_value_percentiles(SF, driver_limit=0)
    pd.testing.assert_frame_equal(a, b)


def test_percentiles_distributed_recursion(ray_session, tmp_path):
    """A value column with one massive tie block forces the counting
    path through its tie-collapse branch; a skewed tail exercises the
    recursion.  Both paths must agree with a plain sort."""
    from myaku_ray.functions.events import events_value_percentiles

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [np.full(5000, 1.25), rng.exponential(100.0, 5000)]
    )
    ids = np.arange(len(vals), dtype=np.int64)
    sf = str(tmp_path)
    pq.write_table(
        pa.table({"event_id": pa.array(ids), "value": pa.array(vals)}),
        f"{sf}/events.parquet",
    )
    got = events_value_percentiles(sf, driver_limit=0)
    srt = np.sort(vals)
    import math

    want = [float(srt[max(0, math.ceil(q * len(vals)) - 1)])
            for q in (0.25, 0.5, 0.9, 0.99)]
    assert got["value"].tolist() == want


def test_dsir_driver_merge_equals_ray_groupby(ray_session):
    from myaku_ray.functions.textops import dsir_importance_weights

    a = (
        dsir_importance_weights(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dsir_importance_weights(SF, driver_merge_rows=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
