"""Boolean AND/NOT retrieval: kernel path equivalence (array vs
streaming DAAT on identical lists), brute-force identity, and
engine-vs-serial-oracle rank parity over a built index."""

from __future__ import annotations

import numpy as np
import pytest

from myaku_ray.index.codec import ArrayPostings
from myaku_ray.index.wand import (
    array_boolean_topk,
    boolean_topk,
    stream_boolean_topk,
)


def _rand_lists(seed: int, n_terms: int = 3, n_not: int = 2, universe: int = 5000):
    rng = np.random.default_rng(seed)
    all_warc = rng.integers(1, 2**40, size=universe).astype(np.uint64)
    must, nots = {}, []
    for t in range(n_terms):
        # overlapping draws so the intersection is non-trivial
        n = int(rng.integers(universe // 3, universe // 2))
        ids = np.sort(rng.choice(universe, size=n, replace=False)).astype(
            np.int64
        )
        scores = (rng.random(n) * 3).astype(np.float32)
        must[f"t{t}"] = ArrayPostings.from_arrays(
            ids, scores, all_warc[ids], float(scores.max())
        )
    for _ in range(n_not):
        n = int(rng.integers(universe // 8, universe // 4))
        ids = np.sort(rng.choice(universe, size=n, replace=False)).astype(
            np.int64
        )
        scores = np.ones(n, dtype=np.float32)
        nots.append(
            ArrayPostings.from_arrays(ids, scores, all_warc[ids], 1.0)
        )
    return must, nots


def _brute(must, nots, k):
    docs = None
    for it in must.values():
        s = set(int(d) for d in it.ids)
        docs = s if docs is None else (docs & s)
    for it in nots:
        docs -= set(int(d) for d in it.ids)
    acc, warc = {}, {}
    for t in sorted(must):
        it = must[t]
        for i, d in enumerate(it.ids):
            d = int(d)
            if d in docs:
                acc[d] = acc.get(d, 0.0) + float(it.scores[i])
                warc[d] = int(it.warc[i])
    ranked = sorted(((s, warc[d], d) for d, s in acc.items()), reverse=True)
    return [(d, s, w) for (s, w, d) in ranked[:k]]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_array_and_stream_paths_identical(seed):
    must, nots = _rand_lists(seed)
    want = _brute(must, nots, 10)
    got_a = array_boolean_topk(must, nots, 10)
    # fresh iterators for the stream path (it consumes cursor state)
    must2, nots2 = _rand_lists(seed)
    got_s = stream_boolean_topk(must2, nots2, 10)
    assert got_a == want
    assert got_s == want


def test_boolean_empty_cases():
    must, nots = _rand_lists(7, n_terms=2, n_not=0)
    # a must list that intersects nothing -> []
    lonely = ArrayPostings.from_arrays(
        np.array([10**12], dtype=np.int64),
        np.array([1.0], dtype=np.float32),
        np.array([1], dtype=np.uint64),
        1.0,
    )
    must["zz"] = lonely
    assert boolean_topk(must, nots, 10) == []
    # NOT covering the whole universe -> []
    must2, _ = _rand_lists(7, n_terms=1, n_not=0)
    (it,) = must2.values()
    total_not = ArrayPostings.from_arrays(
        it.ids.copy(), it.scores.copy(), it.warc.copy(), it.max_score
    )
    assert boolean_topk(must2, [total_not], 10) == []


def test_boolean_rank_parity_on_built_index(ray_session, tmp_path):
    """Engine boolean_topk vs the serial set-algebra oracle on a small
    built index, over the corpus-derived query set (hits, partial NOT,
    no-op NOT, nonsense must, contradiction)."""
    from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import (
        boolean_query_set,
        build_oracle_index,
        oracle_boolean_topk,
    )
    from myaku_ray.pipelines.build import build_index

    pages = str(tmp_path / "pages")
    idx = str(tmp_path / "index")
    write_pages_parquet(pages, 300)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    build_index(pages, idx, blog_ratings=ratings)
    oracle = build_oracle_index(pages, blog_ratings=ratings)
    s = Searcher(idx)
    queries = boolean_query_set(pages)
    assert len(queries) >= 6
    n_nonempty = 0
    for q in queries:
        eng = [(r.doc_id, r.score) for r in s.boolean_topk(q, 10)]
        ora = [(d, sc) for (d, sc, _w) in oracle_boolean_topk(oracle, q, 10)]
        assert eng == ora, f"query {q!r}: engine {eng} != oracle {ora}"
        n_nonempty += bool(eng)
    assert n_nonempty >= 3  # the set exercises real hits, not just empties

    # faceted search over the same built index: engine sidecar counts ==
    # serial union-postings counts, and they partition the count() total
    from myaku_ray.oracle import oracle_facets, reference_query_set

    n_facet_hits = 0
    for q in reference_query_set():
        eng_f = s.facets(q)
        ora_f = oracle_facets(oracle, q)
        assert eng_f == ora_f, f"facets {q!r}: {eng_f} != {ora_f}"
        assert sum(n for _, n in eng_f) == s.count(q)
        n_facet_hits += bool(eng_f)
    assert n_facet_hits >= 3


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_stream_path_with_real_block_iterators(seed):
    """The streaming DAAT path over ENCODED PostingIterators (block
    headers + seek skipping, not array cursors) must match the
    array-path result on the same lists."""
    from myaku_ray.index.codec import PostingIterator, encode_postings

    rng = np.random.default_rng(seed)
    universe = 8000
    all_warc = rng.integers(1, 2**40, size=universe).astype(np.uint64)

    def make(n):
        ids = np.sort(rng.choice(universe, size=n, replace=False)).astype(
            np.int64
        )
        scores = (rng.random(n) * 3).astype(np.float32)
        tfs = rng.integers(1, 5, size=n).astype(np.uint64)
        return ids, tfs, scores, all_warc[ids]

    lists = {f"t{t}": make(int(rng.integers(2000, 3500))) for t in range(3)}
    not_list = make(int(rng.integers(500, 1500)))

    must_arr = {
        t: ArrayPostings.from_arrays(ids, sc, wc, float(sc.max()))
        for t, (ids, _tf, sc, wc) in lists.items()
    }
    nots_arr = [
        ArrayPostings.from_arrays(
            not_list[0], not_list[2], not_list[3], float(not_list[2].max())
        )
    ]
    want = array_boolean_topk(must_arr, nots_arr, 10)

    must_str = {
        t: PostingIterator(encode_postings(ids, tfs, sc, wc))
        for t, (ids, tfs, sc, wc) in lists.items()
    }
    nots_str = [
        PostingIterator(
            encode_postings(not_list[0], not_list[1], not_list[2], not_list[3])
        )
    ]
    got = stream_boolean_topk(must_str, nots_str, 10)
    assert got == want
