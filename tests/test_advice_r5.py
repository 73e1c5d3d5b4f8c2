"""Round-4 ADVICE items, pinned by tests.

- ``pages_pruned_recall`` skips queries with an empty EXACT top-k so
  the engine and its composed-SQL oracle agree by construction; the
  reference query set must currently have no such query (behavior
  unchanged today — this is the guard that would catch drift).
- ``Searcher.term_df`` reads the stored ``df`` column, so a pruned
  layout reports the ORIGINAL corpus df, not the kept-postings count.
"""

from __future__ import annotations

import pytest


def test_reference_queries_have_exact_results(ray_session):
    """Every reference query must return a non-empty exact top-k on the
    pages-op corpus — the precondition under which pages_pruned_recall
    emits one row per query and matches its LEFT-JOIN SQL oracle."""
    from myaku_ray.functions.fulltext import _pages_searcher
    from myaku_ray.oracle import reference_query_set

    s = _pages_searcher()
    for q in reference_query_set():
        assert len(s.topk(q, 10)) > 0, f"empty exact top-k for {q!r}"


def test_term_df_reports_original_df_over_pruned(
    ray_session, tmp_path_factory
):
    from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.pipelines.build import build_index
    from myaku_ray.pipelines.prune import prune_index

    base = tmp_path_factory.mktemp("prunedf")
    pages = str(base / "pages")
    idx = str(base / "index")
    pruned = str(base / "pruned")
    write_pages_parquet(pages, 200, use_ray=False)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    build_index(pages, idx, blog_ratings=ratings, tokenize_concurrency=2)
    prune_index(idx, pruned, max_postings=2)

    s_full = Searcher(idx)
    s_pruned = Searcher(pruned)
    terms, dfs = s_full._vocab_terms_dfs()
    big = [(t, d) for t, d in zip(terms, dfs) if d > 2][:10]
    assert big, "corpus must have terms with df > max_postings"
    for t, d in big:
        assert s_full.term_df(t) == int(d)
        # pruned tier keeps <= 2 postings but must report the corpus df
        assert s_pruned.term_df(t) == int(d), t
