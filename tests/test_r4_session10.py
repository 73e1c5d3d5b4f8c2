"""Session-10 ops: general-wildcard search (engine vs serial oracle).

The engine (`Searcher.wildcard_topk`) expands a ``*``-pattern over the
cached df vocabulary with a find-based segment matcher; the oracle
(`oracle.oracle_wildcard_topk`) is an INDEPENDENT regex implementation
of the same match contract.  These tests pin (a) rank identity on the
corpus-derived wildcard query set, (b) the max_terms expansion valve,
and (c) the matcher contract itself on adversarial patterns
(head/tail overlap, collapsed ``**`` runs, mid-overlaps-tail, no-star
exact lookup, no-literal refusal).
"""

import pytest


@pytest.fixture(scope="module")
def wc_built(ray_session, tmp_path_factory):
    from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
    from myaku_ray.oracle import build_oracle_index
    from myaku_ray.pipelines.build import build_index

    base = tmp_path_factory.mktemp("wc")
    pages = str(base / "pages")
    index_dir = str(base / "index")
    write_pages_parquet(pages, 300)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    build_index(pages, index_dir, blog_ratings=ratings)
    oracle = build_oracle_index(pages, blog_ratings=ratings)
    return pages, index_dir, oracle


def test_wildcard_rank_identity(wc_built):
    """docIDs AND scores rank-identical to the serial regex
    full-vocabulary scan on the corpus-derived wildcard set (suffix,
    infix, contains, multi-star, exact, zero-hit shapes)."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import oracle_wildcard_topk, wildcard_query_set

    pages, index_dir, oracle = wc_built
    s = Searcher(index_dir)
    qs = wildcard_query_set(pages)
    assert len(qs) >= 6
    n_nonempty = 0
    for p in qs:
        eng = [(r.doc_id, r.score) for r in s.wildcard_topk(p, 10)]
        ora = [(d, sc) for (d, sc, _w) in oracle_wildcard_topk(oracle, p, 10)]
        assert eng == ora, f"pattern {p!r}: engine {eng} != oracle {ora}"
        n_nonempty += bool(eng)
    assert n_nonempty >= 4  # the set must actually exercise matches
    assert s.wildcard_topk("ゑゐ*ぬ", 10) == []


def test_wildcard_cap_determinism(wc_built):
    """max_terms=1 must pick exactly the highest-df (-df, term) member
    on both sides — the deterministic expansion valve shared with
    prefix_topk."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import oracle_wildcard_topk, wildcard_query_set

    pages, index_dir, oracle = wc_built
    s = Searcher(index_dir)
    checked = 0
    for p in wildcard_query_set(pages):
        if "*" not in p:
            continue
        eng = [
            (r.doc_id, r.score) for r in s.wildcard_topk(p, 10, max_terms=1)
        ]
        ora = [
            (d, sc)
            for (d, sc, _w) in oracle_wildcard_topk(oracle, p, 10, max_terms=1)
        ]
        assert eng == ora, f"pattern {p!r} (max_terms=1)"
        checked += 1
        if checked >= 4:
            break
    assert checked >= 3


def test_wildcard_matcher_contract(wc_built):
    """Adversarial patterns where the engine's find-based matcher and
    the oracle's regex could plausibly diverge must agree exactly:
    head/tail overlap, ``**`` runs, mid overlapping the tail region,
    star-only refusal, and single/edge-char literals."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import oracle_wildcard_topk

    pages, index_dir, oracle = wc_built
    s = Searcher(index_dir)
    # pull a few real vocabulary terms to build overlap patterns from
    terms, _dfs = s._vocab_terms_dfs()
    long_terms = [t for t in terms if len(t) >= 3 and not t.isascii()][:4]
    assert long_terms, "vocabulary must contain 3+-char non-ascii terms"
    patterns = ["*", "**", "***"]
    for t in long_terms:
        a, b, c = t[0], t[1], t[-1]
        patterns += [
            a + "**" + c,          # collapsed star run == single star
            a + "*" + a,           # head == tail char (overlap guard)
            "*" + b + "*" + c,     # mid then tail, mid may sit inside tail
            a + "*" + b + "*" + c, # head + mid + tail
            t + "*",               # prefix via wildcard path
            "*" + t,               # suffix of a full term
            t[:2] + "*" + t[-1],   # 2-char head
        ]
    for p in patterns:
        eng = [(r.doc_id, r.score) for r in s.wildcard_topk(p, 10)]
        ora = [(d, sc) for (d, sc, _w) in oracle_wildcard_topk(oracle, p, 10)]
        assert eng == ora, f"pattern {p!r}: engine {eng} != oracle {ora}"
    # star-only patterns are refused, not full-vocabulary unions
    for p in ("*", "**", "***"):
        assert s.wildcard_topk(p, 10) == []


def test_title_boost_rank_identity(wc_built):
    """Fielded (title-boosted) ranking: docIDs AND scores identical to
    the serial oracle on the reference query set, and the boost must
    actually reorder at least one query vs plain topk (the title tokens
    are real, so a no-op implementation cannot pass)."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import oracle_title_boost_topk, reference_query_set

    pages, index_dir, oracle = wc_built
    s = Searcher(index_dir)
    reordered = 0
    for q in reference_query_set():
        eng = [(r.doc_id, r.score) for r in s.topk_title_boost(q, 10)]
        ora = [
            (d, sc) for (d, sc, _w) in oracle_title_boost_topk(oracle, q, 10)
        ]
        assert eng == ora, f"query {q!r}: engine {eng} != oracle {ora}"
        plain = [r.doc_id for r in s.topk(q, 10)]
        if [d for d, _ in eng] != plain:
            reordered += 1
    assert reordered >= 1


def test_title_boost_zero_equals_plain(wc_built):
    """boost=0 must reproduce the plain ranking bit-for-bit (scores
    included) — the fielded path degrades to ordinary BM25."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import reference_query_set

    pages, index_dir, _oracle = wc_built
    s = Searcher(index_dir)
    for q in reference_query_set():
        z = [(r.doc_id, r.score, r.warc_us)
             for r in s.topk_title_boost(q, 10, boost=0.0)]
        plain = [(r.doc_id, r.score, r.warc_us) for r in s.topk(q, 10)]
        assert z == plain, f"query {q!r}"


def test_title_boost_streaming_path(wc_built, monkeypatch):
    """Forced streaming WAND path (DECODE_LIMIT = -1): the
    TitleBoostIterator wrapper's +boost-shifted block bounds must keep
    pruning admissible — rank identity vs the same serial oracle."""
    import myaku_ray.index.searcher as searcher_mod
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import oracle_title_boost_topk, reference_query_set

    pages, index_dir, oracle = wc_built
    monkeypatch.setattr(searcher_mod, "DECODE_LIMIT", -1)
    s = Searcher(index_dir)
    s._first_page = None
    for q in reference_query_set():
        eng = [(r.doc_id, r.score) for r in s.topk_title_boost(q, 10)]
        ora = [
            (d, sc) for (d, sc, _w) in oracle_title_boost_topk(oracle, q, 10)
        ]
        assert eng == ora, f"streaming path, query {q!r}"


def test_wildcard_no_star_is_exact_lookup(wc_built):
    """A pattern without ``*`` degenerates to an exact vocabulary
    lookup and ranks identically to a plain single-term search."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import oracle_wildcard_topk

    pages, index_dir, oracle = wc_built
    s = Searcher(index_dir)
    terms, dfs = s._vocab_terms_dfs()
    # mid-df term that the query analyzer keeps whole, so the plain
    # search comparison is apples-to-apples with the exact lookup
    t = next(
        t
        for _d, t in sorted(zip(dfs, terms))[len(terms) // 2 :]
        if s.analyze_query(t) == [t]
    )
    eng = [(r.doc_id, r.score) for r in s.wildcard_topk(t, 10)]
    ora = [(d, sc) for (d, sc, _w) in oracle_wildcard_topk(oracle, t, 10)]
    assert eng == ora
    plain = [(r.doc_id, r.score) for r in s.search(t, 10)]
    assert eng == plain
    # unknown term → empty
    assert s.wildcard_topk("ゑゐぬか", 10) == []
