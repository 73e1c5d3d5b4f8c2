"""Build-time title-term sidecar (index/title_sidecar.py) gates.

Round-4 verdict ask #2: replace the serving-init per-row title map with
a build-time hive sidecar.  These tests pin the whole contract:

- the build writes a VALID sidecar (fingerprint-pinned meta);
- per-term point reads equal the legacy in-process map entry for entry;
- topk_title_boost is A/B rank-identical between the sidecar path and
  the forced-legacy path (scores and warc tie-keys included);
- the driver-side and distributed build paths produce the identical
  mapping (the dedup_exact-style scale-switch equality gate);
- a mutated docs store invalidates the sidecar and serving falls back
  (still rank-identical);
- an incremental update re-pins the sidecar through refresh_index and
  the updated index stays A/B-identical.
"""

from __future__ import annotations

import os
import shutil

import pytest

from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
from myaku_ray.index.searcher import Searcher
from myaku_ray.index.title_sidecar import (
    build_title_sidecar,
    load_title_meta,
    read_title_doc_ids,
    title_sidecar_valid,
)
from myaku_ray.oracle import reference_query_set
from myaku_ray.pipelines.build import build_index

N_PAGES = 250


@pytest.fixture(scope="module")
def ratings():
    blogs = gen_blogs_table()
    return dict(zip(blogs["blog_url"], blogs["rating"]))


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory, ratings):
    base = tmp_path_factory.mktemp("titleside")
    pages = str(base / "pages")
    index_dir = str(base / "index")
    write_pages_parquet(pages, N_PAGES, use_ray=False)
    build_index(pages, index_dir, blog_ratings=ratings,
                tokenize_concurrency=2)
    return pages, index_dir


def _boost_rows(s: Searcher, q: str):
    return [
        (r.doc_id, r.score, r.warc_us) for r in s.topk_title_boost(q, 10)
    ]


def test_sidecar_written_and_valid(built):
    _pages, index_dir = built
    meta = load_title_meta(index_dir)
    assert meta is not None and meta["n_rows"] > 0
    assert title_sidecar_valid(index_dir) is not None
    # test corpus is under DRIVER_LIMIT -> the driver path wrote it
    assert meta["distributed"] is False


def test_point_read_equals_legacy_map(built):
    """Every term in the legacy in-process map point-reads to the exact
    same sorted doc_id array, and absent terms read empty."""
    _pages, index_dir = built
    s = Searcher(index_dir)
    legacy = s._title_terms_arrays()
    assert legacy, "titles must tokenize to a non-empty term map"
    meta = load_title_meta(index_dir)
    for term, ids in legacy.items():
        got = read_title_doc_ids(index_dir, term, meta["n_buckets"])
        assert got.tolist() == ids.tolist(), f"term {term!r}"
    assert read_title_doc_ids(
        index_dir, "ゑゐぬ絶対不在語", meta["n_buckets"]
    ).size == 0


def test_serving_init_skips_legacy_map(built):
    """The point-read path must never build the O(docs) legacy map: a
    fresh Searcher serving boost queries leaves the legacy cache
    untouched."""
    _pages, index_dir = built
    s = Searcher(index_dir)
    for q in reference_query_set():
        s.topk_title_boost(q, 10)
    assert getattr(s, "_title_state", None) is None  # legacy map never built
    assert s._title_sidecar_state[1] is not None  # sidecar path served


def test_ab_rank_identity_sidecar_vs_legacy(built):
    """Sidecar path vs forced-legacy path: identical (doc, score, warc)
    rows on the full reference query set."""
    _pages, index_dir = built
    s_side = Searcher(index_dir)
    s_leg = Searcher(index_dir)
    s_leg._title_force_legacy = True
    for q in reference_query_set():
        a = _boost_rows(s_side, q)
        b = _boost_rows(s_leg, q)
        assert a == b, f"query {q!r}: sidecar {a} != legacy {b}"
    assert s_leg._title_state is not None  # legacy really ran
    assert getattr(s_side, "_title_state", None) is None


def test_driver_vs_distributed_equality(built):
    """The scale-switch equality gate: forcing the distributed actor-pool
    build over the same docs store reproduces the identical term -> ids
    mapping (layout may differ; semantics must not)."""
    _pages, index_dir = built
    s = Searcher(index_dir)
    legacy = s._title_terms_arrays()
    meta_d = build_title_sidecar(index_dir, force_distributed=True)
    assert meta_d["distributed"] is True
    assert title_sidecar_valid(index_dir) is not None
    try:
        for term, ids in legacy.items():
            got = read_title_doc_ids(index_dir, term, meta_d["n_buckets"])
            assert got.tolist() == ids.tolist(), f"term {term!r}"
        assert meta_d["n_rows"] == sum(len(v) for v in legacy.values())
    finally:
        # restore the driver-built layout for the other module tests
        build_title_sidecar(index_dir)


def test_stale_docs_fallback(built, tmp_path):
    """Bumping a docs file's mtime invalidates the sidecar; serving must
    fall back to the legacy map and stay rank-identical."""
    _pages, index_dir = built
    work = str(tmp_path / "idxcopy")
    shutil.copytree(index_dir, work)
    ref = Searcher(work)
    want = {q: _boost_rows(ref, q) for q in reference_query_set()}
    assert ref._title_sidecar_meta() is not None

    docs_dir = os.path.join(work, "docs")
    victim = next(
        os.path.join(r, f)
        for r, _d, fs in os.walk(docs_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    os.utime(victim)  # content unchanged, fingerprint changed
    s = Searcher(work)
    assert s._title_sidecar_meta() is None  # sidecar distrusted
    for q, rows in want.items():
        assert _boost_rows(s, q) == rows, f"query {q!r}"
    assert s._title_state is not None  # served from the legacy map


def test_update_refresh_repins_sidecar(
    built, ratings, tmp_path_factory
):
    """After an incremental update the docs fingerprint changes; the
    refresh must rebuild the sidecar (valid again) and the updated index
    stays A/B-identical between sidecar and legacy paths."""
    from myaku_ray.corpus_update import gen_update_batch, write_update_parquet
    from myaku_ray.pipelines.update import update_index

    pages, index_dir = built
    work = str(tmp_path_factory.mktemp("titleupd") / "idx")
    shutil.copytree(index_dir, work)

    batch = gen_update_batch(N_PAGES, n_new=40, recrawl_indices=[3],
                             dup_of_indices=[])
    upd_dir = tmp_path_factory.mktemp("titleupd_pages")
    write_update_parquet(str(upd_dir), batch)
    m = update_index(str(upd_dir), work, blog_ratings=ratings,
                     tokenize_concurrency=2)
    assert m["refreshed"]
    assert title_sidecar_valid(work) is not None

    s_side = Searcher(work)
    s_leg = Searcher(work)
    s_leg._title_force_legacy = True
    diff_from_base = 0
    base = Searcher(index_dir)
    for q in reference_query_set():
        a = _boost_rows(s_side, q)
        assert a == _boost_rows(s_leg, q), f"query {q!r}"
        if a != _boost_rows(base, q):
            diff_from_base += 1
    assert diff_from_base >= 1  # the update actually moved a ranking


def test_crashed_sidecar_rebuilds_on_resume(built, ratings, tmp_path):
    """A build killed between the sidecar write and its meta commit
    leaves an invalid sidecar (meta is written LAST); a resumed build
    must rebuild it while skipping the completed index stages."""
    import time

    from myaku_ray.index.title_sidecar import _meta_path
    from myaku_ray.pipelines.build import build_index

    pages, index_dir = built
    work = str(tmp_path / "idxcrash")
    shutil.copytree(index_dir, work)
    os.remove(_meta_path(work))  # simulate the crash point
    assert title_sidecar_valid(work) is None
    t0 = time.time()
    build_index(pages, work, blog_ratings=ratings, tokenize_concurrency=2)
    wall = time.time() - t0
    assert title_sidecar_valid(work) is not None  # rebuilt
    assert wall < 30  # index stages resumed, not rebuilt
    s = Searcher(work)
    base = Searcher(index_dir)
    for q in reference_query_set():
        assert _boost_rows(s, q) == _boost_rows(base, q)
