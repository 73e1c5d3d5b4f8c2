"""Incremental first-page maintenance: a quality change touching ONE doc
must rewrite only that doc's terms' cache rows, and the patched cache
must equal a from-scratch rebuild (the reference's per-term recache
decisions, myaku/datastore/cache.py:201-312)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
from myaku_ray.pipelines.build import build_index

N = 250


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    pages = tmp_path_factory.mktemp("fp_pages")
    write_pages_parquet(str(pages), N, use_ray=False)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    d = str(tmp_path_factory.mktemp("fp_idx"))
    build_index(str(pages), d, blog_ratings=ratings, tokenize_concurrency=2)
    return d, str(pages)


@pytest.fixture(scope="module")
def idx(built):
    return built[0]


def test_single_doc_patch_rewrites_only_its_terms(idx):
    from myaku_ray.pipelines.first_page import (
        build_first_page_cache,
        load_first_page,
        patch_first_page_cache,
        touched_terms_of_docs,
    )
    from myaku_ray.pipelines.update import (
        load_quality_overrides,
        refresh_index,
        save_quality_overrides,
    )

    build_first_page_cache(idx)
    before, k = load_first_page(idx)

    # manually bump ONE doc's quality (a 1-doc rescore) + refresh
    docs = pq.read_table(f"{idx}/docs", columns=["doc_id", "warc_ts"])
    did = int(docs["doc_id"][0].as_py())
    warc = int(docs["warc_ts"].cast("int64")[0].as_py())
    ov = load_quality_overrides(idx)
    ov[did] = (999_999, warc)
    save_quality_overrides(idx, ov)
    refresh_index(idx, recompute_df=False)
    assert load_first_page(idx) is None  # segments changed -> base stale

    m = patch_first_page_cache(idx, [did])
    touched = touched_terms_of_docs(idx, [did])
    assert 0 < m["patched_terms"] <= len(touched)

    # the patch file holds ONLY the touched terms' rows
    patches = glob.glob(os.path.join(idx, "first_page", "zpatch-*.parquet"))
    assert len(patches) == 1
    patch_terms = set(pq.read_table(patches[0])["term"].to_pylist())
    assert patch_terms <= touched
    assert len(patch_terms) < len(before)  # strictly partial rewrite

    # patched cache == from-scratch rebuild
    after, _ = load_first_page(idx)
    patched_cache = dict(after)
    build_first_page_cache(idx)
    rebuilt, _ = load_first_page(idx)
    assert patched_cache.keys() == rebuilt.keys()
    for t in rebuilt:
        assert patched_cache[t] == rebuilt[t], t

    # untouched terms were identical to before (no drift)
    for t in set(before) - patch_terms:
        assert patched_cache[t] == before[t], t


def test_rescore_patches_cache_and_stays_rank_identical(built, tmp_path_factory):
    idx, pages_dir = built
    from datetime import timedelta

    from myaku_ray.corpus import FIXED_NOW, gen_blogs_table
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import build_oracle_index, oracle_topk, reference_query_set
    from myaku_ray.pipelines.first_page import build_first_page_cache, load_first_page
    from myaku_ray.pipelines.rescore import rescore_index

    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    build_first_page_cache(idx)
    now2 = FIXED_NOW + timedelta(days=220)
    m = rescore_index(idx, now=now2, blog_ratings=ratings)
    assert m["n_rescored"] > 0
    assert m.get("first_page_patched_terms", 0) > 0

    # cache is fresh (patched, not stale) and the cached search path is
    # rank-identical to the serial oracle at the new clock
    assert load_first_page(idx) is not None
    s = Searcher(idx)
    assert s._first_page is not None
    oi = build_oracle_index(pages_dir, blog_ratings=ratings, fixed_now=now2)
    for q in reference_query_set():
        got = [(r.doc_id, round(r.score, 5)) for r in s.search(q, k=10)]
        want = [(d, round(sc, 5)) for d, sc, *_ in oracle_topk(oi, q, k=10)]
        assert got == want, q
