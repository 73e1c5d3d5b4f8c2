"""Session-11 ops: fuzzy (edit-distance) ranked search.

The engine (`Searcher.fuzzy_topk`) expands a query over the SymSpell
deletion-neighborhood map (shared with `suggest`) and verifies
candidates with the banded kernel; the oracle
(`oracle.oracle_fuzzy_topk`) is an INDEPENDENT full-matrix Levenshtein
over the whole vocabulary.  These tests pin (a) rank identity on the
corpus-derived fuzzy query set at distances 1 and 2, (b) the
(distance, -df, term) expansion-cap rule, (c) distance-0 behavior (an
exact vocabulary spelling must rank like the plain search when it has
no distance-<=d neighbors, and its group must include itself), and
(d) map sharing between suggest and fuzzy (a depth-2 map serves
depth-1 queries without a rebuild).
"""

import pytest


@pytest.fixture(scope="module")
def fz_built(ray_session, tmp_path_factory):
    from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
    from myaku_ray.oracle import build_oracle_index
    from myaku_ray.pipelines.build import build_index

    base = tmp_path_factory.mktemp("fz")
    pages = str(base / "pages")
    index_dir = str(base / "index")
    write_pages_parquet(pages, 300)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    build_index(pages, index_dir, blog_ratings=ratings)
    oracle = build_oracle_index(pages, blog_ratings=ratings)
    return pages, index_dir, oracle


def test_fuzzy_rank_identity(fz_built):
    """docIDs AND scores rank-identical to the serial full-vocabulary
    Levenshtein scan on the corpus-derived fuzzy set, at max_dist 1
    and 2 (deletion, substitution, exact and zero-hit shapes)."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import fuzzy_query_set, oracle_fuzzy_topk

    pages, index_dir, oracle = fz_built
    s = Searcher(index_dir)
    qs = fuzzy_query_set(pages)
    assert len(qs) >= 5
    n_nonempty = 0
    for q in qs:
        for dist in (1, 2):
            eng = [(r.doc_id, r.score) for r in s.fuzzy_topk(q, 10, max_dist=dist)]
            ora = [
                (d, sc)
                for (d, sc, _w) in oracle_fuzzy_topk(oracle, q, 10, max_dist=dist)
            ]
            assert eng == ora, f"query {q!r} dist={dist}: {eng} != {ora}"
            n_nonempty += bool(eng)
    assert n_nonempty >= 6  # the set must actually exercise matches
    assert s.fuzzy_topk("ゑゐぴぬ", 10, max_dist=1) == []


def test_fuzzy_cap_rule(fz_built):
    """max_terms=1 must pick exactly the (distance, -df, term)-first
    member on both sides — closer spellings survive the cap before
    frequent-but-farther ones."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import fuzzy_query_set, oracle_fuzzy_topk

    pages, index_dir, oracle = fz_built
    s = Searcher(index_dir)
    checked = 0
    for q in fuzzy_query_set(pages):
        eng = [
            (r.doc_id, r.score)
            for r in s.fuzzy_topk(q, 10, max_dist=2, max_terms=1)
        ]
        ora = [
            (d, sc)
            for (d, sc, _w) in oracle_fuzzy_topk(
                oracle, q, 10, max_dist=2, max_terms=1
            )
        ]
        assert eng == ora, f"query {q!r} (max_terms=1)"
        checked += bool(eng)
    assert checked >= 3


def test_fuzzy_exact_spelling_included(fz_built):
    """A query that IS a vocabulary term includes itself (distance 0)
    in the expansion group: with a max_terms=1 cap the ranking must
    equal the plain single-term search bit-for-bit."""
    from myaku_ray.index.searcher import Searcher

    pages, index_dir, _oracle = fz_built
    s = Searcher(index_dir)
    terms, dfs = s._vocab_terms_dfs()
    t = next(
        t
        for _d, t in sorted(zip(dfs, terms))[len(terms) // 2 :]
        if len(t) >= 3 and not t.isascii() and s.analyze_query(t) == [t]
    )
    eng = [(r.doc_id, r.score) for r in s.fuzzy_topk(t, 10, max_dist=1, max_terms=1)]
    plain = [(r.doc_id, r.score) for r in s.search(t, 10)]
    assert eng == plain, f"term {t!r}"


def test_fuzzy_and_suggest_share_map(fz_built):
    """fuzzy_topk (depth 1) must reuse the depth-2 map suggest builds —
    and suggest must stay correct after fuzzy populated the shared
    state (no clobbering either way)."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import fuzzy_query_set

    pages, index_dir, _oracle = fz_built
    s = Searcher(index_dir)
    qs = [q for q in fuzzy_query_set(pages) if len(q) >= 3][:2]
    assert qs
    # suggest first (builds depth-2 map), then fuzzy at depth 1
    sug_before = {q: s.suggest(q, 5) for q in qs}
    state_after_suggest = s._suggest_state
    fz = {q: [(r.doc_id, r.score) for r in s.fuzzy_topk(q, 10, max_dist=1)] for q in qs}
    assert s._suggest_state is state_after_suggest, "fuzzy rebuilt the map"
    # fresh searcher: fuzzy first (still builds depth 2), suggest after
    s2 = Searcher(index_dir)
    fz2 = {q: [(r.doc_id, r.score) for r in s2.fuzzy_topk(q, 10, max_dist=1)] for q in qs}
    state_after_fuzzy = s2._suggest_state
    sug_after = {q: s2.suggest(q, 5) for q in qs}
    assert s2._suggest_state is state_after_fuzzy, "suggest rebuilt the map"
    assert fz == fz2
    assert sug_before == sug_after


# ---- document-sharded build + federated serving (pipelines/shard.py) ----


@pytest.fixture(scope="module")
def sh_built(ray_session, tmp_path_factory):
    """Monolithic and 3-shard positional builds over the SAME corpus."""
    from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
    from myaku_ray.pipelines.build import build_index
    from myaku_ray.pipelines.shard import build_sharded_index

    base = tmp_path_factory.mktemp("sh")
    pages = str(base / "pages")
    mono_dir = str(base / "mono")
    shard_root = str(base / "sharded")
    write_pages_parquet(pages, 300)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    build_index(pages, mono_dir, blog_ratings=ratings, with_positions=True)
    m = build_sharded_index(
        pages, shard_root, 3, blog_ratings=ratings, with_positions=True
    )
    return pages, mono_dir, shard_root, m


def test_sharded_rank_bit_identity(sh_built):
    """Federated top-k must equal the monolithic index's bit-for-bit
    (docIDs, scores, warc tie-keys) on the reference query set — the
    global-stats exchange's guarantee — and counts must sum exactly."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.index.sharded import ShardedSearcher
    from myaku_ray.oracle import reference_query_set

    pages, mono_dir, _root, m = sh_built
    mono = Searcher(mono_dir)
    fed = ShardedSearcher(m["shard_dirs"])
    nonempty = 0
    for q in reference_query_set():
        a = [(r.doc_id, r.score, r.warc_us) for r in mono.topk(q, 10)]
        b = [(r.doc_id, r.score, r.warc_us) for r in fed.topk(q, 10)]
        assert a == b, f"query {q!r}"
        assert mono.count(q) == fed.count(q), f"count {q!r}"
        nonempty += bool(a)
    assert nonempty >= 5


def test_sharded_shards_are_disjoint_and_complete(sh_built):
    """Every matched doc lives in exactly ONE shard (doc_id % n routing)
    and the union of shard matches equals the monolithic matched set."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import reference_query_set

    pages, mono_dir, _root, m = sh_built
    mono = Searcher(mono_dir)
    per_shard = [Searcher(d) for d in m["shard_dirs"]]
    n = len(per_shard)
    for q in reference_query_set()[:4]:
        full = [r.doc_id for r in mono.topk(q, 10_000)]
        union: list[int] = []
        for i, s in enumerate(per_shard):
            ids = [r.doc_id for r in s.topk(q, 10_000)]
            assert all(d % n == i for d in ids), f"shard {i} routing leak"
            union.extend(ids)
        assert sorted(union) == sorted(full), f"query {q!r}"


def test_sharded_phrase_and_near(sh_built):
    """Positional sidecar federates too: phrase/proximity top-k merged
    across shards equals the monolithic positional index's."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.index.sharded import ShardedSearcher
    from myaku_ray.oracle import near_query_set, phrase_query_set

    pages, mono_dir, _root, m = sh_built
    mono = Searcher(mono_dir)
    fed = ShardedSearcher(m["shard_dirs"])
    nonempty = 0
    for q in phrase_query_set(pages):
        a = [(r.doc_id, r.score) for r in mono.phrase_topk(q, 10)]
        b = [(r.doc_id, r.score) for r in fed.phrase_topk(q, 10)]
        assert a == b, f"phrase {q!r}"
        nonempty += bool(a)
    for q, w in near_query_set(pages):
        a = [(r.doc_id, r.score) for r in mono.near_topk(q, w, 10)]
        b = [(r.doc_id, r.score) for r in fed.near_topk(q, w, 10)]
        assert a == b, f"near {q!r}"
        nonempty += bool(a)
    assert nonempty >= 2


def test_sharded_hydration_routes_to_owner(sh_built):
    """search() hydrates each hit on its owning shard and returns the
    merged order with urls/titles identical to the monolithic path."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.index.sharded import ShardedSearcher
    from myaku_ray.oracle import reference_query_set

    pages, mono_dir, _root, m = sh_built
    mono = Searcher(mono_dir)
    fed = ShardedSearcher(m["shard_dirs"])
    q = next(
        q for q in reference_query_set() if mono.topk(q, 10)
    )
    a = [(r.doc_id, r.url, r.title) for r in mono.search(q, 10)]
    b = [(r.doc_id, r.url, r.title) for r in fed.search(q, 10)]
    assert a == b


def test_sharded_resume_and_layout_invalidation(sh_built, tmp_path):
    """A re-run with the same shard count is a marker no-op; changing
    n_shards must invalidate the postings routing and rebuild (the
    layout rule), still ending bit-identical on a probe query."""
    import os
    import time

    from myaku_ray.corpus import gen_blogs_table
    from myaku_ray.index.sharded import ShardedSearcher
    from myaku_ray.oracle import reference_query_set
    from myaku_ray.pipelines.shard import build_sharded_index

    pages, _mono, shard_root, m = sh_built
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    marker = os.path.join(shard_root, "postings", "_SUCCESS")
    mt0 = os.path.getmtime(marker)
    t0 = time.time()
    m2 = build_sharded_index(
        pages, shard_root, 3, blog_ratings=ratings, with_positions=True
    )
    assert os.path.getmtime(marker) == mt0, "resume re-ran the postings stage"
    assert m2["shard_dirs"] == m["shard_dirs"]
    # different shard count in a fresh root: rebuild + still correct
    fed3 = ShardedSearcher(m["shard_dirs"])
    root2 = str(tmp_path / "re2")
    m4 = build_sharded_index(
        pages, root2, 2, blog_ratings=ratings, with_positions=True
    )
    fed2 = ShardedSearcher(m4["shard_dirs"])
    q = next(q for q in reference_query_set() if fed3.topk(q, 10))
    assert [
        (r.doc_id, r.score) for r in fed2.topk(q, 10)
    ] == [(r.doc_id, r.score) for r in fed3.topk(q, 10)]


def test_ray_sharded_actor_tier_identity(sh_built):
    """The actor tier (one Ray query-node process per shard) must be
    bit-identical to the in-process thread federation — top-k, counts,
    phrase/near, and hydrated search — since both merge the same
    per-shard Searcher outputs under the same rank key."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.index.sharded import RayShardedSearcher, ShardedSearcher
    from myaku_ray.oracle import near_query_set, phrase_query_set, reference_query_set

    pages, mono_dir, _root, m = sh_built
    mono = Searcher(mono_dir)
    fed = ShardedSearcher(m["shard_dirs"])
    act = RayShardedSearcher(m["shard_dirs"])
    try:
        for q in reference_query_set():
            a = [(r.doc_id, r.score, r.warc_us) for r in fed.topk(q, 10)]
            b = [(r.doc_id, r.score, r.warc_us) for r in act.topk(q, 10)]
            assert a == b, f"topk {q!r}"
            assert fed.count(q) == act.count(q), f"count {q!r}"
        for q in phrase_query_set(pages)[:2]:
            assert [(r.doc_id, r.score) for r in act.phrase_topk(q, 10)] == [
                (r.doc_id, r.score) for r in mono.phrase_topk(q, 10)
            ], f"phrase {q!r}"
        for q, w in near_query_set(pages)[:2]:
            assert [(r.doc_id, r.score) for r in act.near_topk(q, w, 10)] == [
                (r.doc_id, r.score) for r in mono.near_topk(q, w, 10)
            ], f"near {q!r}"
        q = next(q for q in reference_query_set() if mono.topk(q, 10))
        assert [(r.doc_id, r.url, r.title) for r in act.search(q, 10)] == [
            (r.doc_id, r.url, r.title) for r in mono.search(q, 10)
        ]
    finally:
        act.shutdown()


def test_ray_sharded_async_pipeline(sh_built):
    """topk_async + merge (the QPS bench's pipelined path) returns the
    same rows as the sync call, with many queries in flight at once."""
    import ray as _ray

    from myaku_ray.index.sharded import RayShardedSearcher
    from myaku_ray.oracle import reference_query_set

    _pages, _mono, _root, m = sh_built
    act = RayShardedSearcher(m["shard_dirs"])
    try:
        qs = reference_query_set()
        futs = [act.topk_async(q, 10) for q in qs]  # all in flight
        for q, per_shard in zip(qs, futs):
            got = act.merge(_ray.get(per_shard), 10)
            want = act.topk(q, 10)
            assert [(r.doc_id, r.score) for r in got] == [
                (r.doc_id, r.score) for r in want
            ], q
    finally:
        act.shutdown()


def test_ray_sharded_replicas_identity(sh_built):
    """replicas=2 (two query nodes per shard, round-robin) must be
    result-invariant: every query, count, and hydrated search matches
    the single-replica federation across MANY calls (so the round-robin
    cycles through every replica group member)."""
    from myaku_ray.index.sharded import RayShardedSearcher, ShardedSearcher
    from myaku_ray.oracle import reference_query_set

    _pages, _mono, _root, m = sh_built
    fed = ShardedSearcher(m["shard_dirs"])
    # 3 shards x 2 replicas = 6 actors; the test session has 4 CPUs, so
    # reserve fractional CPUs or the actor pool would never schedule
    act = RayShardedSearcher(
        m["shard_dirs"], num_cpus_per_shard=0.5, replicas=2
    )
    try:
        assert all(len(g) == 2 for g in act.replica_groups)
        for rep in range(2):  # two passes -> both replicas serve each q
            for q in reference_query_set():
                a = [(r.doc_id, r.score) for r in fed.topk(q, 10)]
                b = [(r.doc_id, r.score) for r in act.topk(q, 10)]
                assert a == b, (rep, q)
                assert fed.count(q) == act.count(q), (rep, q)
        q = next(q for q in reference_query_set() if fed.topk(q, 10))
        assert [(r.doc_id, r.url) for r in act.search(q, 10)] == [
            (r.doc_id, r.url) for r in fed.search(q, 10)
        ]
    finally:
        act.shutdown()
