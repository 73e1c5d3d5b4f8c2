"""Round-4 thirteenth-session serving ops: pseudo-relevance-feedback
expansion search (Searcher.topk_prf) and significant-terms aggregation
(Searcher.significant_terms) — engine-vs-serial-oracle identity on a
fresh fixture index, plus kernel-level ordering contracts."""

from __future__ import annotations

import pytest

from myaku_ray.corpus import gen_blogs_table, write_pages_parquet

N_PAGES = 200


@pytest.fixture(scope="module")
def s13_built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("s13")
    pages = str(root / "pages")
    write_pages_parquet(pages, N_PAGES)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    from myaku_ray.pipelines.build import build_index

    idx = str(root / "idx")
    build_index(pages, idx, blog_ratings=ratings)
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import build_oracle_index

    return (
        Searcher(idx), build_oracle_index(pages, blog_ratings=ratings), idx
    )


def test_prf_engine_matches_serial_oracle(s13_built):
    from myaku_ray.oracle import oracle_prf_topk, reference_query_set

    s, oi, _idx = s13_built
    for q in reference_query_set():
        eng = [(r.doc_id, round(r.score, 5)) for r in s.topk_prf(q, 10)]
        ora = [
            (d, round(sc, 5)) for d, sc, _w in oracle_prf_topk(oi, q, 10)
        ]
        assert eng == ora, q


def test_prf_expansion_changes_some_ranking(s13_built):
    """PRF must not be a silent no-op: on the fixture corpus at least
    one reference query's expanded top-10 differs from the plain
    top-10 (doc set or order)."""
    from myaku_ray.oracle import reference_query_set

    s, _oi, _idx = s13_built
    changed = 0
    for q in reference_query_set():
        plain = [r.doc_id for r in s.topk(q, 10)]
        prf = [r.doc_id for r in s.topk_prf(q, 10)]
        if plain != prf:
            changed += 1
    assert changed >= 1


def test_significant_terms_engine_matches_serial_oracle(s13_built):
    from myaku_ray.oracle import (
        oracle_significant_terms, reference_query_set,
    )

    s, oi, _idx = s13_built
    for q in reference_query_set():
        assert s.significant_terms(q) == oracle_significant_terms(oi, q), q


def test_significant_terms_excludes_query_terms(s13_built):
    from myaku_ray.oracle import reference_query_set

    s, _oi, _idx = s13_built
    for q in reference_query_set():
        qset = set(s.analyze_query(q))
        for term, fg, df in s.significant_terms(q):
            assert term not in qset
            assert fg >= 2
            assert df >= fg  # fg docs are a subsample of the df docs


def test_rank_significant_terms_exact_ordering():
    """Lift ties break by fg DESC then term ASC; sub-min_fg and df-0
    terms drop; comparison is exact (no float lift)."""
    from myaku_ray.scoring import rank_significant_terms

    df = {"a": 10, "b": 5, "c": 1, "d": 5, "z": 0}
    fg = {"a": 3, "b": 3, "c": 1, "d": 3, "e": 9, "z": 4}
    out = rank_significant_terms(fg, df.get, 100, k=10)
    # e absent from index, z df=0, c below min_fg -> only a/b/d rank;
    # b and d tie on lift (3*100/5) and fg -> term ASC
    assert out == [("b", 3, 5), ("d", 3, 5), ("a", 3, 10)]
    # exactness: a lift that differs by 1 part in 10^12 must still order
    big = 10**12
    fg2 = {"x": 1000, "y": 1000}
    df2 = {"x": big - 1, "y": big}
    out2 = rank_significant_terms(fg2, df2.get, big, k=2, min_fg=1)
    assert [t for t, _f, _d in out2] == ["x", "y"]


def test_prf_terms_kernel_is_mlt_selection():
    """select_prf_terms shares the MLT salience kernel verbatim."""
    from myaku_ray.scoring import select_mlt_terms, select_prf_terms

    tfs = {"x": 5, "y": 2, "w": 9}
    df = {"x": 3, "y": 1, "w": 0}.get
    assert select_prf_terms(tfs, df, 50) == select_mlt_terms(tfs, df, 50)


def test_dedup_incremental_matches_serial_recompute(ray_session):
    """The one-exchange delta-dedup must equal a direct serial pass:
    group all docs by exact text, then a new doc survives iff its
    group holds no existing doc and it is the min new id."""
    import pyarrow.parquet as pq

    from myaku_ray.functions.textops import (
        INCR_SPLIT_DEN, INCR_SPLIT_NUM, dedup_incremental,
    )

    sf = "/root/testdata/sf0.001"
    got = dedup_incremental(sf).to_pandas()
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ids, texts = t["doc_id"].to_pylist(), t["text"].to_pylist()
    split = max(ids) * INCR_SPLIT_NUM // INCR_SPLIT_DEN
    groups: dict[str, list[int]] = {}
    for did, tx in zip(ids, texts):
        groups.setdefault(tx, []).append(did)
    expect = {}
    for members in groups.values():
        new = [d for d in members if d > split]
        if new and len(new) == len(members):
            expect[min(new)] = len(new)
    assert dict(zip(got["keeper_doc_id"], got["n_new_copies"])) == expect
    assert len(got) == len(expect)


def test_doc_compression_ratio_serial_parity(ray_session):
    """Distributed zlib signal == serial zlib pass, exact ints."""
    import zlib

    import pyarrow.parquet as pq

    from myaku_ray.functions.textops import (
        ZRATIO_LEVEL, doc_compression_ratio,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        doc_compression_ratio(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    for i, (did, tx) in enumerate(
        zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    ):
        b = tx.encode("utf-8")
        c = len(zlib.compress(b, ZRATIO_LEVEL))
        row = got.iloc[i]
        assert (row["doc_id"], row["n_raw"], row["n_zlib"]) == (did, len(b), c)
        assert row["ratio_milli"] == 1000 * c // max(len(b), 1)


def test_pruned_tier_engine_matches_serial_oracle(s13_built, tmp_path):
    """Searcher over the pruned layout == the serial per-term prune +
    rank oracle for every reference query; single-term queries with
    k <= P must also equal the EXACT ranking (rank-key-prefix kept
    set)."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import (
        oracle_pruned_topk, oracle_topk, reference_query_set,
    )
    from myaku_ray.pipelines.prune import prune_index

    _s, oi, idx = s13_built
    pruned_dir = str(tmp_path / "pruned")
    info = prune_index(idx, pruned_dir)
    assert info["postings_kept"] < info["postings_in"]  # pruning bites
    sp = Searcher(pruned_dir)
    for q in reference_query_set():
        eng = [(r.doc_id, round(r.score, 5)) for r in sp.topk(q, 10)]
        ora = [
            (d, round(sc, 5)) for d, sc, _w in oracle_pruned_topk(oi, q, 10)
        ]
        assert eng == ora, q
        if len(sp.analyze_query(q)) == 1:
            exact = [
                (d, round(sc, 5)) for d, sc, _w in oracle_topk(oi, q, 10)
            ]
            assert eng == exact, ("single-term must stay exact", q)


def test_prune_index_idempotent(s13_built, tmp_path):
    """A second prune_index call over the same marker is a no-op that
    returns the recorded stats (resume contract)."""
    from myaku_ray.pipelines.prune import prune_index

    _s, _oi, idx = s13_built
    d = str(tmp_path / "pruned2")
    a = prune_index(idx, d)
    b = prune_index(idx, d)
    assert a == b


def test_term_sharded_bit_identical_to_monolithic(s13_built):
    """Term-routed fan-out must reproduce the monolithic ranking
    bit-for-bit (same arrays, same kernel), and report a non-zero
    posting transfer for matching queries."""
    from myaku_ray.index.term_sharded import TermShardedSearcher
    from myaku_ray.oracle import reference_query_set

    s, _oi, idx = s13_built
    ts = TermShardedSearcher(idx, n_shards=3)
    try:
        moved = 0
        for q in reference_query_set():
            mono = [(r.doc_id, r.score, r.warc_us) for r in s.topk(q, 10)]
            shard = [(r.doc_id, r.score, r.warc_us) for r in ts.topk(q, 10)]
            assert mono == shard, q
            moved += ts.transfer_bytes
        assert moved > 0
    finally:
        ts.shutdown()


def test_term_sharded_over_pruned_tier(s13_built, tmp_path):
    """Composition: term-routing the PRUNED tier bounds the per-term
    transfer by P postings while matching the pruned-tier ranking."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.index.term_sharded import TermShardedSearcher
    from myaku_ray.oracle import reference_query_set
    from myaku_ray.pipelines.prune import PRUNE_MAX_POSTINGS, prune_index

    _s, _oi, idx = s13_built
    pruned_dir = str(tmp_path / "pruned_ts")
    prune_index(idx, pruned_dir)
    sp = Searcher(pruned_dir)
    ts = TermShardedSearcher(pruned_dir, n_shards=2)
    try:
        per_posting = 8 + 4 + 8  # id + score + warc bytes
        for q in reference_query_set():
            mono = [(r.doc_id, r.score, r.warc_us) for r in sp.topk(q, 10)]
            shard = [(r.doc_id, r.score, r.warc_us) for r in ts.topk(q, 10)]
            assert mono == shard, q
            n_terms = len(set(ts._local.analyze_query(q)))
            assert ts.transfer_bytes <= (
                n_terms * PRUNE_MAX_POSTINGS * per_posting
            )
    finally:
        ts.shutdown()


def test_tiered_router_bit_identical_and_routes_head(s13_built, tmp_path):
    """The tiered router must equal the monolithic ranking on EVERY
    query (exactness precondition enforced at routing time) and must
    actually send single-term queries to the pruned tier."""
    from myaku_ray.index.tiered import TieredSearcher
    from myaku_ray.oracle import reference_query_set
    from myaku_ray.pipelines.prune import prune_index

    s, _oi, idx = s13_built
    pruned_dir = str(tmp_path / "pruned_tier")
    prune_index(idx, pruned_dir)
    ts = TieredSearcher(idx, pruned_dir)
    singles = 0
    for q in reference_query_set():
        mono = [(r.doc_id, r.score, r.warc_us) for r in s.topk(q, 10)]
        tier = [(r.doc_id, r.score, r.warc_us) for r in ts.topk(q, 10)]
        assert mono == tier, q
        if len(set(s.analyze_query(q))) == 1:
            singles += 1
    assert ts.served_pruned == singles > 0
    # deep pagination past P must fall back to the full tier
    before = ts.served_full
    ts.topk("の", k=ts.max_postings + 1)
    assert ts.served_full == before + 1
