"""End-to-end parity: Ray pipeline vs serial oracle (the correctness gate).

Mirrors the reference's golden end-to-end test design
(myaku/tests/end_to_end/test_crawl.py): fixed deterministic corpus, fixed
"now", exact equality of index contents and ranked results.
"""

import os
import shutil

import pytest

from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
from myaku_ray.oracle import build_oracle_index, oracle_topk, reference_query_set

N_PAGES = 600


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("idx")
    pages = str(base / "pages")
    index_dir = str(base / "index")
    write_pages_parquet(pages, N_PAGES)
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))

    from myaku_ray.pipelines.build import build_index

    metrics = build_index(pages, index_dir, blog_ratings=ratings)
    oracle = build_oracle_index(pages, blog_ratings=ratings)
    return pages, index_dir, metrics, oracle, ratings


def test_corpus_stats_match(built):
    _, _, metrics, oracle, _ = built
    assert metrics["stats"]["n_docs"] == oracle.n_docs
    assert metrics["stats"]["avgdl"] == pytest.approx(oracle.avgdl, abs=0)
    assert metrics["stats"]["n_terms"] == len(oracle.df)


def test_df_matches_oracle(built):
    _, index_dir, _, oracle, _ = built
    import pandas as pd
    import pyarrow.dataset as pads

    df_tbl = pads.dataset(os.path.join(index_dir, "df"), format="parquet").to_table()
    got = dict(zip(df_tbl["term"].to_pylist(), df_tbl["df"].to_pylist()))
    assert got == oracle.df


def test_rank_identity_topk(built):
    """docIDs AND scores rank-identical on the reference query set."""
    from myaku_ray.index.searcher import Searcher

    _, index_dir, _, oracle, _ = built
    s = Searcher(index_dir)
    for q in reference_query_set():
        eng = [(r.doc_id, r.score) for r in s.topk(q, 10)]
        ora = [(d, sc) for (d, sc, _) in oracle_topk(oracle, q, 10)]
        assert eng == ora, f"query {q!r}: engine {eng} != oracle {ora}"


def test_rank_identity_topk_in_range(built):
    """Date-filtered search: docIDs AND scores rank-identical to the
    serial filtered oracle on corpus-derived (query, range) triples;
    full range == unfiltered topk; inverted/empty range == []."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import date_range_query_set, oracle_topk_in_range

    pages, index_dir, _, oracle, _ = built
    s = Searcher(index_dir)
    triples = date_range_query_set(pages)
    assert triples, "query set must be non-empty"
    for q, lo, hi in triples:
        eng = [(r.doc_id, round(r.score, 9)) for r in s.topk_in_range(q, lo, hi, 10)]
        ora = [
            (d, round(sc, 9))
            for (d, sc, _) in oracle_topk_in_range(oracle, q, lo, hi, 10)
        ]
        assert eng == ora, f"({q!r}, {lo}, {hi}): {eng} != {ora}"
    # filter semantics: the full range reproduces the unfiltered ranking
    all_w = [m["warc_us"] for m in oracle.docs.values()]
    lo, hi = min(all_w), max(all_w)
    for q in reference_query_set()[:3]:
        full = [(r.doc_id, r.score) for r in s.topk_in_range(q, lo, hi, 10)]
        plain = [(r.doc_id, r.score) for r in s.topk(q, 10)]
        assert full == plain
        assert s.topk_in_range(q, hi + 1, hi + 2, 10) == []
        assert s.topk_in_range(q, hi, lo, 10) == []


def test_postings_file_fanout_bounded(built):
    """min_rows_per_file bundling must keep postings files per bucket dir
    bounded by write TASKS (~est_rows/min_rows), never input blocks — the
    unbounded blocks x buckets fan-out was the round-2 1M-build
    superlinearity.  At this corpus size the bound is a handful of files
    per bucket; per-block writes would produce tens."""
    import glob as _glob

    _, index_dir, _, _, _ = built
    buckets = _glob.glob(os.path.join(index_dir, "postings", "bucket=*"))
    assert buckets, "postings dir missing"
    per_bucket = [
        len(_glob.glob(os.path.join(b, "*.parquet"))) for b in buckets
    ]
    assert max(per_bucket) <= 4, (
        f"postings fan-out unbounded: {max(per_bucket)} files in one "
        f"bucket dir across {len(buckets)} buckets"
    )


def test_rank_identity_altforms(built):
    """DEFINITE/POSSIBLE_ALT_FORMS rank-identical to the serial oracle on
    both the alt-form query set and the reference set (QueryType
    semantics, myaku/datastore/__init__.py:26-68 — reserved but never
    implemented by the reference; implemented here end to end)."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import altform_query_set

    _, index_dir, _, oracle, _ = built
    s = Searcher(index_dir)
    for q in altform_query_set() + reference_query_set():
        for qt in ("definite", "possible"):
            eng = [(r.doc_id, r.score) for r in s.topk(q, 10, query_type=qt)]
            ora = [
                (d, sc)
                for (d, sc, _) in oracle_topk(oracle, q, 10, query_type=qt)
            ]
            assert eng == ora, f"{qt} query {q!r}: {eng} != {ora}"


def test_altform_counts_and_exact_default(built):
    """exact == default everywhere; match counts grow monotonically
    exact <= definite <= possible, strictly for the ambiguous-kana query."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import altform_query_set

    _, index_dir, _, oracle, _ = built
    s = Searcher(index_dir)
    qs = altform_query_set()
    for q in qs:
        assert [(r.doc_id, r.score) for r in s.topk(q, 10)] == [
            (r.doc_id, r.score) for r in s.topk(q, 10, query_type="exact")
        ]
        ce = s.count(q)
        cd = s.count(q, query_type="definite")
        cp = s.count(q, query_type="possible")
        assert ce <= cd <= cp
    # the entry-member query (qs[1]) sits in a group with an ambiguous
    # kana: possible must see strictly more docs than definite
    assert s.count(qs[1], query_type="possible") > s.count(
        qs[1], query_type="definite"
    )


def test_segment_postings_match_oracle(built):
    """Full posting equality for a sample of terms (docids + tfs)."""
    from myaku_ray.index.codec import decode_all
    from myaku_ray.index.searcher import Searcher

    _, index_dir, _, oracle, _ = built
    s = Searcher(index_dir)
    import pyarrow.dataset as pads

    terms = sorted(oracle.df)[:50] + ["の", "は"]
    for t in terms:
        from myaku_ray.index.util import term_hash

        seg = term_hash(t) % s.stats["num_segments"]
        ds = s._segment_dataset(seg)
        tbl = ds.to_table(filter=pads.field("term") == t)
        got = []
        for blob in tbl["blob"]:
            ids, tfs, _, _ = decode_all(blob.as_py())
            got += list(zip(ids.tolist(), tfs.tolist()))
        got.sort()
        want = sorted(oracle.postings.get(t, []))
        assert got == want, f"postings differ for {t!r}"


def test_dedup_winner_is_min_doc_id(built):
    _, index_dir, metrics, oracle, _ = built
    # oracle dedup kept min doc_id; engine must have identical doc set
    import pyarrow.dataset as pads

    docs = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["doc_id"]
    )
    engine_ids = set(docs["doc_id"].to_pylist())
    losers = pads.dataset(os.path.join(index_dir, "dedup"), format="parquet").to_table()
    engine_winners = engine_ids - set(losers["doc_id"].to_pylist())
    assert engine_winners == set(oracle.docs)
    assert len(losers) > 0  # dup cases exist in the corpus


def test_hydration_and_preview(built):
    from myaku_ray.index.searcher import Searcher

    _, index_dir, _, oracle, _ = built
    s = Searcher(index_dir)
    q = reference_query_set()[0]
    results = s.search(q, 5)
    assert results
    for r in results:
        assert r.url.startswith("https://")
        assert r.title
        assert q in r.matched_terms
        assert r.preview


def test_resume_skips_completed_stages(built, tmp_path):
    """Deleting one stage and rebuilding redoes only that stage; output equal."""
    pages, index_dir, _, oracle, ratings = built
    from myaku_ray.pipelines.build import build_index
    from myaku_ray.state.lineage import read_lineage

    n_before = len(read_lineage(index_dir))
    shutil.rmtree(os.path.join(index_dir, "segments"))
    build_index(pages, index_dir, blog_ratings=ratings)
    lineage = read_lineage(index_dir)
    assert len(lineage) == n_before + 1  # only segments re-ran
    assert lineage[-1]["stage"] == "segments"

    # and the resumed index still matches the oracle
    from myaku_ray.index.searcher import Searcher

    s = Searcher(index_dir)
    q = reference_query_set()[0]
    eng = [(r.doc_id, r.score) for r in s.topk(q, 10)]
    ora = [(d, sc) for (d, sc, _) in oracle_topk(oracle, q, 10)]
    assert eng == ora


def test_partition_level_resume(ray_session, tmp_path):
    """An interrupted segments stage redoes ONLY unfinished (bucket,
    part) partitions: finished ones are skipped via their durable _done
    markers, half-written outputs of unfinished ones are cleaned, and
    the resumed index is byte-identical to a from-scratch build."""
    import glob as _glob
    import json

    from conftest import seg_digest

    from myaku_ray.pipelines.build import build_index

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, 300)

    idx = str(tmp_path / "idx")
    build_index(pages, idx)
    want = seg_digest(idx)
    seg = os.path.join(idx, "segments")

    # simulate a mid-stage kill: stage marker gone, two partitions
    # unfinished — one lost an output file entirely, the other kept a
    # (complete-looking but un-markered) output that resume must treat
    # as suspect and rewrite
    os.remove(os.path.join(seg, "_SUCCESS"))
    markers = sorted(_glob.glob(os.path.join(seg, "_done", "*.json")))
    assert len(markers) > 2
    for kill_output, m in zip((True, False), markers[:2]):
        name = os.path.basename(m)[: -len(".json")]
        outs = _glob.glob(os.path.join(seg, "segment=*", f"{name}.parquet"))
        assert outs
        if kill_output:
            for f in outs:
                os.remove(f)
        os.remove(m)

    build_index(pages, idx)  # resume=True default
    prof = json.load(open(os.path.join(seg, "_encode_tasks.json")))
    assert prof["n_resumed"] == len(markers) - 2
    assert prof["n_tasks"] == len(markers)
    assert seg_digest(idx) == want

    # stale markers (upstream postings re-ran after they were written)
    # are ignored: everything re-encodes, output unchanged
    os.remove(os.path.join(seg, "_SUCCESS"))
    post_success = os.path.join(idx, "postings", "_SUCCESS")
    now = __import__("time").time() + 2
    os.utime(post_success, (now, now))
    build_index(pages, idx)
    prof = json.load(open(os.path.join(seg, "_encode_tasks.json")))
    assert prof["n_resumed"] == 0
    assert seg_digest(idx) == want


def test_postings_shard_resume(ray_session, tmp_path):
    """The tokenize+write stage sharded over docs files produces the
    same segments as the single pipeline, and an interrupted shard run
    redoes only the missing shard."""
    import glob as _glob
    import json

    import pyarrow.dataset as pads
    from conftest import seg_digest

    from myaku_ray.pipelines.build import build_index

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, 300)

    one = str(tmp_path / "one")
    sharded = str(tmp_path / "sharded")
    build_index(pages, one)
    want = seg_digest(one)

    # sharding is file-granular (ONE docs file here → one shard), so
    # repack the docs stage into three files to exercise multi-shard
    # runs (and leave headroom for the shard-count-change case below —
    # n_chunks is capped at the docs file count)
    build_index(pages, sharded, postings_chunks=2)
    import pyarrow.parquet as _pq

    docs_dir = os.path.join(sharded, "docs")
    docs_files = sorted(_glob.glob(os.path.join(docs_dir, "*.parquet")))
    tbl = pads.dataset(docs_files, format="parquet").to_table()
    third = tbl.num_rows // 3
    for f in docs_files:
        os.remove(f)
    _pq.write_table(tbl.slice(0, third), os.path.join(docs_dir, "a.parquet"))
    _pq.write_table(
        tbl.slice(third, third), os.path.join(docs_dir, "b.parquet")
    )
    _pq.write_table(
        tbl.slice(2 * third), os.path.join(docs_dir, "c.parquet")
    )
    for st in ("postings", "df", "segments"):
        os.remove(os.path.join(sharded, st, "_SUCCESS"))
    build_index(pages, sharded, postings_chunks=2)
    assert seg_digest(sharded) == want
    post = os.path.join(sharded, "postings")
    markers = sorted(_glob.glob(os.path.join(post, "_shard_done", "*.json")))
    n_shards = json.load(open(os.path.join(post, "_SUCCESS")))["shards"]
    assert len(markers) == n_shards == 2

    # interrupt: one shard lost mid-write, stage marker gone — resume
    # redoes only that shard, output unchanged
    os.remove(os.path.join(post, "_SUCCESS"))
    victim = os.path.basename(markers[0])[: -len(".json")]
    shutil.rmtree(os.path.join(post, victim))
    os.remove(markers[0])
    for st in ("df", "segments"):
        os.remove(os.path.join(sharded, st, "_SUCCESS"))
    build_index(pages, sharded, postings_chunks=2)
    assert seg_digest(sharded) == want

    # resume with a DIFFERENT shard count: the old layout's markers are
    # fresh by mtime but record a different stride — trusting them would
    # silently drop the docs of the vanished shards.  The layout
    # signature must invalidate them (full re-tokenize, output equal).
    os.remove(os.path.join(post, "_SUCCESS"))
    for st in ("df", "segments"):
        os.remove(os.path.join(sharded, st, "_SUCCESS"))
    build_index(pages, sharded, postings_chunks=3)
    assert json.load(open(os.path.join(post, "_SUCCESS")))["shards"] == 3
    assert seg_digest(sharded) == want

    # decrease THEN increase: the count-2 run must delete shard-00002's
    # MARKER along with its output dir — otherwise a later count-3
    # resume finds the marker fresh by mtime with a matching 3-layout
    # sig and skips a shard whose output no longer exists (silent loss)
    os.remove(os.path.join(post, "_SUCCESS"))
    for st in ("df", "segments"):
        os.remove(os.path.join(sharded, st, "_SUCCESS"))
    build_index(pages, sharded, postings_chunks=2)
    assert not os.path.exists(
        os.path.join(post, "_shard_done", "shard-00002.json")
    )
    os.remove(os.path.join(post, "_SUCCESS"))
    for st in ("df", "segments"):
        os.remove(os.path.join(sharded, st, "_SUCCESS"))
    build_index(pages, sharded, postings_chunks=3)
    assert seg_digest(sharded) == want


def test_encode_part_count_change_leaves_no_orphans(ray_session, tmp_path):
    """Re-encoding with a changed per-bucket part count must remove the
    old naming set's output files, or the searcher (which reads every
    parquet in a segment dir) would see duplicated postings."""
    import myaku_ray.index.segment_build as sb
    from conftest import seg_digest

    from myaku_ray.pipelines.build import build_index

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, 300)
    idx = str(tmp_path / "idx")
    build_index(pages, idx)  # n_parts == 1 everywhere at this scale
    want = seg_digest(idx)

    os.remove(os.path.join(idx, "segments", "_SUCCESS"))
    old = sb.ENCODE_TASK_TARGET_BYTES
    sb.ENCODE_TASK_TARGET_BYTES = 1  # force n_parts > 1 on every bucket
    try:
        build_index(pages, idx)  # resume: markers stale by NAME, not mtime
    finally:
        sb.ENCODE_TASK_TARGET_BYTES = old
    # digest is content-based over every file: any orphaned single-part
    # file would duplicate its bucket's rows and change the digest
    assert seg_digest(idx) == want

    # many -> many part-count change: p0/p1/... keep VALID NAMES but
    # their contents were hash%old_parts-partitioned — a resume that
    # trusts them by name+mtime silently drops the terms of the removed
    # moduli.  Markers record n_parts; the digest proves re-encode.
    os.remove(os.path.join(idx, "segments", "_SUCCESS"))
    sb.ENCODE_TASK_TARGET_BYTES = 3000  # a DIFFERENT multi-part modulus
    try:
        build_index(pages, idx)
    finally:
        sb.ENCODE_TASK_TARGET_BYTES = old
    assert seg_digest(idx) == want


def test_suggest_matches_oracle(ray_session, tmp_path):
    """Fuzzy did-you-mean: the Searcher's SymSpell deletion-neighborhood
    map + banded verify must equal the serial oracle's full-vocabulary
    uncapped-DP scan — same candidates, distances, df ranks, order."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import (
        build_oracle_index, oracle_suggest, suggest_query_set,
    )
    from myaku_ray.pipelines.build import build_index

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, 300)
    idx = str(tmp_path / "idx")
    build_index(pages, idx)
    s = Searcher(idx)
    oi = build_oracle_index(pages)
    qs = suggest_query_set(pages)
    assert qs
    got_any = False
    for q in qs:
        got = s.suggest(q, 5)
        want = oracle_suggest(oi, q, 5)
        assert got == want, q
        got_any = got_any or bool(got)
    assert got_any  # the derived misspellings do have vocab neighbors
    assert s.suggest("ゑゐゑゐゑ") == []  # nonsense: no d<=2 neighbor


def test_suggest_map_rebuilds_on_df_change(ray_session, tmp_path):
    """A live Searcher must not serve suggestions from a stale vocab
    map after the df stage is rewritten in place (update/refresh):
    the df-file fingerprint rebuild must pick up the new vocabulary."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq

    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import suggest_query_set
    from myaku_ray.pipelines.build import build_index

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, 300)
    idx = str(tmp_path / "idx")
    build_index(pages, idx)
    s = Searcher(idx)
    q = next(qq for qq in suggest_query_set(pages) if s.suggest(qq, 5))
    before = s.suggest(q, 5)
    top = before[0][0]
    # rewrite df/ without the top suggestion's term: a fresh map cannot
    # suggest it any more
    df_dir = os.path.join(idx, "df")
    t = pads.dataset(df_dir, format="parquet").to_table()
    t2 = t.filter(pc.not_equal(t["term"], pa.scalar(top)))
    for f in _glob.glob(os.path.join(df_dir, "*.parquet")):
        os.remove(f)
    _pq.write_table(t2, os.path.join(df_dir, "df-rewritten.parquet"))
    after = s.suggest(q, 5)
    assert all(term != top for term, _d, _f in after), after


def test_deterministic_rebuild(ray_session, tmp_path):
    """Two from-scratch builds produce byte-identical segment blobs."""
    import hashlib

    import pyarrow.dataset as pads

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, 150)
    from myaku_ray.pipelines.build import build_index

    digests = []
    for run in ("a", "b"):
        idx = str(tmp_path / f"index_{run}")
        build_index(pages, idx)
        tbl = pads.dataset(
            os.path.join(idx, "segments"), format="parquet", partitioning="hive"
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
        digests.append(h.hexdigest())
    assert digests[0] == digests[1]


def test_first_page_cache_parity(built):
    """Materialized top-10-per-term table == live single-term search, and
    staleness detection invalidates it when segments are rebuilt."""
    import json
    import os

    from myaku_ray.index.searcher import Searcher
    from myaku_ray.pipelines.first_page import (
        build_first_page_cache,
        load_first_page,
    )

    pages, index_dir, _, oracle, ratings = built
    build_first_page_cache(index_dir)

    cached = Searcher(index_dir)
    assert cached._first_page is not None
    live = Searcher(index_dir)
    live._first_page = None  # force the live WAND/array path

    # every indexed term the oracle knows, plus reference single terms
    sample = sorted(oracle.df)[::7][:60]
    for term in sample:
        a = [(r.doc_id, round(r.score, 5)) for r in cached.topk(term, 10)]
        b = [(r.doc_id, round(r.score, 5)) for r in live.topk(term, 10)]
        assert a == b, term

    # staleness: touching segments/_SUCCESS must invalidate the cache
    succ = os.path.join(index_dir, "segments", "_SUCCESS")
    os.utime(succ, None)
    assert load_first_page(index_dir) is None


def test_streaming_wand_path_parity(built, monkeypatch):
    """Force the streaming block-max WAND path (normally used above
    DECODE_LIMIT postings) and assert it matches the oracle too — the
    scale path must not rot while the array path serves small indexes."""
    import myaku_ray.index.searcher as searcher_mod
    from myaku_ray.index.codec import PostingIterator
    from myaku_ray.index.searcher import MergedIterator, Searcher
    from myaku_ray.oracle import oracle_topk, reference_query_set

    pages, index_dir, _, oracle, ratings = built
    monkeypatch.setattr(searcher_mod, "DECODE_LIMIT", -1)
    s = Searcher(index_dir)
    s._first_page = None
    for q in reference_query_set():
        it_terms = s.analyze_query(q)
        if it_terms:
            it = s.term_iterator(it_terms[0])
            if it is not None:
                assert isinstance(it, MergedIterator), "WAND path not active"
        got = [(r.doc_id, round(r.score, 5)) for r in s.topk(q, 10)]
        want = [(d, round(sc, 5)) for d, sc, *_ in oracle_topk(oracle, q, k=10)]
        assert got == want, f"streaming-path mismatch for {q!r}"


def test_streaming_wand_path_parity_in_range(built, monkeypatch):
    """Date-filtered search on the FORCED streaming WAND path (the
    at-scale branch for terms above DECODE_LIMIT): warc_range candidate
    filtering must preserve rank identity vs the serial filtered oracle."""
    import myaku_ray.index.searcher as searcher_mod
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import date_range_query_set, oracle_topk_in_range

    pages, index_dir, _, oracle, _ = built
    monkeypatch.setattr(searcher_mod, "DECODE_LIMIT", -1)
    s = Searcher(index_dir)
    s._first_page = None
    for q, lo, hi in date_range_query_set(pages):
        got = [
            (r.doc_id, round(r.score, 5))
            for r in s.topk_in_range(q, lo, hi, 10)
        ]
        want = [
            (d, round(sc, 5))
            for d, sc, *_ in oracle_topk_in_range(oracle, q, lo, hi, k=10)
        ]
        assert got == want, f"streaming in-range mismatch for ({q!r},{lo},{hi})"


def test_pagination_and_count(built):
    """search_page / count reproduce the reference's paginate + total
    count semantics (index_search.py:52-66,232-236)."""
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import analyze_query, oracle_topk, reference_query_set

    pages, index_dir, _, oracle, ratings = built
    s = Searcher(index_dir)
    for q in reference_query_set():
        terms = analyze_query(q)
        want_docs = set()
        for t in terms:
            want_docs.update(d for d, _ in oracle.postings.get(t, []))
        assert s.count(q) == len(want_docs), q

        want_all = [
            (d, round(sc, 5)) for d, sc, *_ in oracle_topk(oracle, q, k=30)
        ]
        got_pages = []
        for p in (1, 2, 3):
            got_pages.extend(
                (r.doc_id, round(r.score, 5)) for r in s.search_page(q, p)
            )
        assert got_pages == want_all[: len(got_pages)], q

    import pytest as _pytest

    with _pytest.raises(ValueError):
        s.search_page("x" * 200, 1)
    with _pytest.raises(ValueError):
        s.search_page("ok", 0)


def test_preload_hot_terms_rank_neutral(built):
    """The init-time hot-term warm list must fill the array cache and
    change NO ranked result vs a cold Searcher."""
    _, index_dir, _, _, _ = built
    from myaku_ray.index.searcher import Searcher

    warm = Searcher(index_dir)
    cold = Searcher(index_dir, preload_hot=False)
    assert len(warm._term_arrays) > 0
    assert len(cold._term_arrays) == 0
    for q in reference_query_set():
        assert warm.topk(q, 10) == cold.topk(q, 10)


def test_encode_bucket_split_is_output_identical(
    ray_session, built, tmp_path_factory, monkeypatch
):
    """Oversized encode buckets split into term-hash parts; the rebuilt
    index must serve rank-identical results (same docIDs AND scores)."""
    import myaku_ray.index.segment_build as sb
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.pipelines.build import build_index

    pages, base_index, _, _, ratings = built
    monkeypatch.setattr(sb, "ENCODE_TASK_TARGET_BYTES", 20_000)
    split_dir = str(tmp_path_factory.mktemp("split") / "index")
    build_index(pages, split_dir, blog_ratings=ratings)
    import glob

    part_files = glob.glob(
        f"{split_dir}/segments/**/*-p*.parquet", recursive=True
    )
    assert part_files, "split threshold did not trigger any part files"
    a = Searcher(base_index)
    b = Searcher(split_dir)
    for q in reference_query_set():
        ra = [(r.doc_id, round(r.score, 9)) for r in a.topk(q, 10)]
        rb = [(r.doc_id, round(r.score, 9)) for r in b.topk(q, 10)]
        assert ra == rb, q


def test_term_trend_parity(built, monkeypatch):
    """term_trend (matched docs per term-month from the warc_us posting
    payload) matches the serial per-doc walk — on the array path AND the
    forced streaming path, under exact and alt-form query types."""
    import myaku_ray.index.searcher as searcher_mod
    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import oracle_term_trend, reference_query_set

    pages, index_dir, _, oracle, ratings = built
    s = Searcher(index_dir)
    n_rows = 0
    for q in reference_query_set():
        for qt in ("exact", "possible"):
            got = s.term_trend(q, qt)
            assert got == oracle_term_trend(oracle, q, qt), (q, qt)
            n_rows += len(got)
    assert n_rows > 100
    monkeypatch.setattr(searcher_mod, "DECODE_LIMIT", -1)
    s2 = Searcher(index_dir, preload_hot=False)
    for q in reference_query_set():
        assert s2.term_trend(q) == oracle_term_trend(oracle, q), q
