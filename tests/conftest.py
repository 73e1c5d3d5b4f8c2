"""Shared pytest fixtures: ONE Ray session for the whole test run."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass
    yield
    ray.shutdown()


def seg_digest(index_dir):
    """sha256 over sorted (term, salt, blob) of an index's segments —
    the byte-identity comparator shared by the build/resume/merge tests."""
    import hashlib
    import os

    import pyarrow.dataset as pads

    tbl = pads.dataset(
        os.path.join(index_dir, "segments"), format="parquet",
        partitioning="hive",
    ).to_table(columns=["term", "salt", "blob"])
    rows = sorted(
        zip(
            tbl["term"].to_pylist(),
            tbl["salt"].to_pylist(),
            (b.as_py() for b in tbl["blob"]),
        )
    )
    h = hashlib.sha256()
    for t, sa, b in rows:
        h.update(t.encode())
        h.update(bytes([sa]))
        h.update(b)
    return h.hexdigest()
