"""Facet-sidecar scan fallback (round-4 verdict ask #6).

``Searcher.facets`` documents a ~1e9-doc bound on its in-process
(doc_id -> source) sidecar; the streaming per-file scan fallback is now
implemented.  Forcing the bound to 0 must produce identical facet
counts on every reference query WITHOUT ever materializing the sidecar.
"""

from __future__ import annotations

import pytest

from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
from myaku_ray.index.searcher import Searcher
from myaku_ray.oracle import reference_query_set
from myaku_ray.pipelines.build import build_index


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("facetfb")
    pages = str(base / "pages")
    index_dir = str(base / "index")
    write_pages_parquet(pages, 250, use_ray=False)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    build_index(pages, index_dir, blog_ratings=ratings,
                tokenize_concurrency=2)
    return index_dir


def test_facet_scan_equals_sidecar(built):
    s_side = Searcher(built)
    s_scan = Searcher(built)
    s_scan.FACET_SIDECAR_DOC_LIMIT = 0  # force the fallback
    nonempty = 0
    for q in reference_query_set():
        a = s_side.facets(q)
        b = s_scan.facets(q)
        assert a == b, f"query {q!r}: sidecar {a} != scan {b}"
        nonempty += bool(a)
    assert nonempty >= 3  # the query set actually exercises facets
    # the fallback must not have built the sidecar
    assert getattr(s_scan, "_facet_state", None) is None
    assert getattr(s_side, "_facet_state", None) is not None


def test_facet_scan_multi_source(built):
    """A query matching multiple sources keeps the (count DESC, source
    ASC) ranking identical across both paths."""
    s = Searcher(built)
    s2 = Searcher(built)
    s2.FACET_SIDECAR_DOC_LIMIT = 0
    for q in reference_query_set():
        a = s.facets(q)
        if len(a) >= 2:
            assert s2.facets(q) == a
            return
    pytest.skip("no multi-source query in the reference set")
