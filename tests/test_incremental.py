"""Three-stage incremental test: initial build / update / no-change crawl.

Mirrors the reference's end-to-end pattern (myaku/tests/end_to_end/
test_crawl.py:2349-2387 runs the real crawl three times and asserts exact
DB state each time).  Here each stage asserts the distributed index is
rank-identical to a from-scratch serial oracle over the
latest-version-per-url union corpus, and that the update stage only
tokenized the delta.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
from myaku_ray.corpus_update import (
    gen_update_batch,
    write_union_parquet,
    write_update_parquet,
)
from myaku_ray.index.searcher import Searcher
from myaku_ray.normalize import doc_id_for_url
from myaku_ray.oracle import build_oracle_index, oracle_topk, reference_query_set
from myaku_ray.pipelines.build import build_index
from myaku_ray.pipelines.update import update_index

N_BASE = 400


@pytest.fixture(scope="module")
def ratings():
    blogs = gen_blogs_table()
    return dict(zip(blogs["blog_url"], blogs["rating"]))


@pytest.fixture(scope="module")
def base_pages(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_base")
    write_pages_parquet(str(d), N_BASE, use_ray=False)
    return str(d)


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, base_pages, ratings):
    d = tmp_path_factory.mktemp("idx_incremental")
    build_index(base_pages, str(d), blog_ratings=ratings,
                tokenize_concurrency=2)
    return str(d)


def _assert_parity(index_dir: str, pages_path: str, ratings: dict) -> None:
    s = Searcher(index_dir)
    oi = build_oracle_index(pages_path, blog_ratings=ratings)
    assert s.stats["n_docs"] == oi.n_docs
    for q in reference_query_set():
        got = [(r.doc_id, round(r.score, 5)) for r in s.search(q, k=10)]
        want = [(d, round(sc, 5)) for d, sc, *_ in oracle_topk(oi, q, k=10)]
        assert got == want, f"rank mismatch for {q!r}"


def test_stage1_initial_build(index_dir, base_pages, ratings):
    _assert_parity(index_dir, base_pages, ratings)


def test_stage2_update(index_dir, base_pages, ratings, tmp_path_factory):
    # find a dup group in the base docs to exercise resurrection: re-crawl
    # the dup WINNER with fresh text -> its former loser must win its hash
    docs = pq.read_table(
        f"{index_dir}/docs", columns=["doc_id", "url", "text_hash"]
    ).to_pandas()
    groups = docs.groupby("text_hash")["doc_id"].agg(["count", "min"])
    dup_hashes = groups[groups["count"] > 1]
    assert len(dup_hashes) > 0, "base corpus has no dup group"
    winner_id = int(dup_hashes["min"].iloc[0])
    winner_url = docs.loc[docs["doc_id"] == winner_id, "url"].iloc[0]
    # base index of that url (urls encode their index deterministically)
    recrawl_idx = _index_of_url(winner_url)

    batch = gen_update_batch(
        N_BASE, n_new=60, recrawl_indices=[recrawl_idx, 7],
        dup_of_indices=[50],
    )
    _STAGE2_STATE["batch"] = batch
    upd_dir = tmp_path_factory.mktemp("pages_upd")
    write_update_parquet(str(upd_dir), batch)

    m = update_index(
        str(upd_dir), index_dir, blog_ratings=ratings,
        tokenize_concurrency=2,
    )
    assert m["refreshed"]
    assert m["n_recrawled"] == 2
    # only the delta was tokenized: <= fresh extracted docs + resurrected
    assert 0 < m["n_tokenized"] <= m["n_fresh_docs"] + 4

    union = tmp_path_factory.mktemp("pages_union") / "union.parquet"
    write_union_parquet(str(union), base_pages, batch)
    _assert_parity(index_dir, str(union), ratings)

    # the injected duplicate resolved deterministically: exactly one of
    # (donor, dup) is live — min doc_id wins
    donor_url = _url_of_index(50)
    dup_url = batch["url"][len(batch) - 1].as_py()
    live_winner = min(doc_id_for_url(donor_url), doc_id_for_url(dup_url))
    from myaku_ray.pipelines.update import load_losers

    losers = load_losers(index_dir)
    assert live_winner not in losers
    assert (
        max(doc_id_for_url(donor_url), doc_id_for_url(dup_url)) in losers
    )


def test_stage3_no_change(index_dir, base_pages, ratings, tmp_path_factory):
    # re-present an already-indexed slice: nothing is fresh, no refresh
    batch = gen_update_batch(N_BASE, n_new=0, recrawl_indices=[],
                             dup_of_indices=[])
    import pyarrow as pa

    base_slice = pq.read_table(base_pages).slice(0, 100)
    upd_dir = tmp_path_factory.mktemp("pages_nochange")
    write_update_parquet(str(upd_dir), base_slice)
    m = update_index(str(upd_dir), index_dir, blog_ratings=ratings,
                     tokenize_concurrency=2)
    assert m["n_fresh_docs"] == 0
    assert m["n_tokenized"] == 0
    assert m["refreshed"] is False


def test_stage4_rescore(index_dir, base_pages, ratings, tmp_path_factory):
    """Advance the clock across recency-bucket boundaries: rescore must
    leave the index rank-identical to an oracle built at the new now."""
    from datetime import timedelta

    from myaku_ray.corpus import FIXED_NOW
    from myaku_ray.pipelines.rescore import rescore_index

    now2 = FIXED_NOW + timedelta(days=200)
    m = rescore_index(index_dir, now=now2, blog_ratings=ratings)
    assert m["n_rescored"] > 0

    union = tmp_path_factory.mktemp("pages_union2") / "union.parquet"
    write_union_parquet(str(union), base_pages, _stage2_batch(index_dir))
    s = Searcher(index_dir)
    oi = build_oracle_index(str(union), blog_ratings=ratings, fixed_now=now2)
    for q in reference_query_set():
        got = [(r.doc_id, round(r.score, 5)) for r in s.search(q, k=10)]
        want = [(d, round(sc, 5)) for d, sc, *_ in oracle_topk(oi, q, k=10)]
        assert got == want, f"rescore rank mismatch for {q!r}"

    # idempotence: same clock again -> nothing crosses a boundary
    m2 = rescore_index(index_dir, now=now2, blog_ratings=ratings)
    assert m2["n_rescored"] == 0


_STAGE2_STATE: dict = {}


def _stage2_batch(index_dir: str):
    return _STAGE2_STATE["batch"]


def _index_of_url(url: str) -> int:
    """Invert the deterministic url scheme of corpus.gen_page_row."""
    if "/series/" in url:
        parts = url.split("/")
        series = int(parts[-3])
        episode = int(parts[-1])
        seq = series * 20 + (episode - 1)
        return seq * 3 + 2
    src = int(url.split("src")[1][0])
    seq = int(url.rstrip("/").split("/")[-1])
    return seq * 3 + src


def _url_of_index(i: int) -> str:
    from myaku_ray.corpus import gen_page_row

    return gen_page_row(i, N_BASE)["url"]


def test_stage5_crawl_skip(index_dir, base_pages, ratings, tmp_path_factory):
    """Pages that fail extraction are recorded in crawl_skip and never
    re-extracted when re-presented at the same warc_ts (crawl_track.py
    skip-set semantics)."""
    import pyarrow.parquet as pq

    from myaku_ray.pipelines.update import load_crawl_skip, update_index

    # find base pages that never extracted (paywalled / non-ja / empty)
    base_t = pq.read_table(base_pages, columns=["url", "warc_ts"])
    docs = pq.read_table(f"{index_dir}/docs", columns=["url"])
    extracted = set(docs["url"].to_pylist())
    failed = [u for u in base_t["url"].to_pylist() if u not in extracted]
    assert failed, "base corpus has no failing pages"

    mask = [u in set(failed) for u in base_t["url"].to_pylist()]
    failing_slice = pq.read_table(base_pages).filter(
        __import__("pyarrow").array(mask, __import__("pyarrow").bool_())
    )
    upd_dir = tmp_path_factory.mktemp("pages_failing")
    write_update_parquet(str(upd_dir), failing_slice.select(
        ["url", "warc_ts", "html", "text", "lang"]
    ))

    m1 = update_index(str(upd_dir), index_dir, blog_ratings=ratings,
                      tokenize_concurrency=2)
    assert m1["n_fresh_docs"] == 0
    assert m1["refreshed"] is False
    skip = load_crawl_skip(index_dir)
    assert set(failed) <= set(skip)

    # second presentation: the skip set blocks them before extraction
    m2 = update_index(str(upd_dir), index_dir, blog_ratings=ratings,
                      tokenize_concurrency=2)
    assert m2["n_fresh_docs"] == 0
    assert m2["n_crawl_skipped"] == len(skip)


def test_crashed_update_self_heals(base_pages, ratings, tmp_path_factory):
    """An update killed between its docs-delta write and tokenization must
    be cleaned up and redone on the next run with no duplicate postings."""
    import os
    import shutil

    from myaku_ray.oracle import build_oracle_index
    from myaku_ray.pipelines.update import load_tokenized

    idx = str(tmp_path_factory.mktemp("idx_crash"))
    build_index(base_pages, idx, blog_ratings=ratings, tokenize_concurrency=2)

    batch = gen_update_batch(N_BASE, n_new=30)
    upd = tmp_path_factory.mktemp("pages_crash")
    write_update_parquet(str(upd), batch)

    # simulate the crash: a docs delta exists WITHOUT its _DELTA_DONE
    # (as if update_index died right after extraction)
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from myaku_ray.stages.extract import make_extract_fn

    fake_delta = os.path.join(idx, "docs", "delta-1")
    os.makedirs(fake_delta)
    ext = make_extract_fn(ratings)
    pages_t = pq.read_table(str(upd))
    pq2.write_table(
        ext(pages_t.select(["url", "warc_ts", "html", "lang"])),
        os.path.join(fake_delta, "partial.parquet"),
    )
    before = load_tokenized(idx)

    m = update_index(str(upd), idx, blog_ratings=ratings,
                     tokenize_concurrency=2)
    assert not os.path.exists(os.path.join(fake_delta, "partial.parquet")) or \
        os.path.exists(os.path.join(fake_delta, "_DELTA_DONE"))
    assert m["n_fresh_docs"] > 0  # the crashed delta did not mask the docs

    union = tmp_path_factory.mktemp("pages_crash_union") / "union.parquet"
    write_union_parquet(str(union), base_pages, batch)
    _assert_parity(idx, str(union), ratings)
    after = load_tokenized(idx)
    assert len(after) > len(before)


def test_refresh_fallback_on_flat_postings(base_pages, ratings, tmp_path_factory):
    """An index whose postings are NOT bucket-partitioned (legacy layout)
    must refresh through the Dataset-groupby fallback and stay
    rank-identical."""
    import glob
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq2

    from myaku_ray.pipelines.update import refresh_index

    idx = str(tmp_path_factory.mktemp("idx_flat"))
    build_index(base_pages, idx, blog_ratings=ratings, tokenize_concurrency=2)

    # flatten: merge all bucketed posting files into one flat file
    pdir = os.path.join(idx, "postings")
    files = [
        f for f in glob.glob(os.path.join(pdir, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith("_")
    ]
    cols = ["term", "doc_id", "tf", "doclen", "quality", "warc_us"]
    flat = pa.concat_tables([pq2.read_table(f, columns=cols) for f in files])
    shutil.rmtree(pdir)
    os.makedirs(pdir)
    pq2.write_table(flat, os.path.join(pdir, "flat.parquet"))

    m = refresh_index(idx)
    assert "refresh_wall_s" in m
    _assert_parity(idx, base_pages, ratings)


def test_update_after_rescore(base_pages, ratings, tmp_path_factory):
    """rescore then a later incremental update at the same clock must
    stay rank-identical to a from-scratch oracle at that clock (quality
    overrides and fresh-doc scores must agree)."""
    from datetime import timedelta

    from myaku_ray.corpus import FIXED_NOW
    from myaku_ray.oracle import build_oracle_index
    from myaku_ray.pipelines.rescore import rescore_index

    idx = str(tmp_path_factory.mktemp("idx_interleave"))
    build_index(base_pages, idx, blog_ratings=ratings, tokenize_concurrency=2)

    now2 = FIXED_NOW + timedelta(days=120)
    rescore_index(idx, now=now2, blog_ratings=ratings)

    # re-crawl a doc that HAS a rescore override: the override belongs to
    # the old version and must be dropped, not applied to the new text
    from myaku_ray.pipelines.update import load_quality_overrides

    overrides = load_quality_overrides(idx)
    assert overrides, "rescore produced no overrides"
    docs = pq.read_table(f"{idx}/docs", columns=["doc_id", "url"]).to_pandas()
    ov_doc = sorted(overrides)[0]
    ov_url = docs.loc[docs["doc_id"] == ov_doc, "url"].iloc[0]
    recrawl_idx = _index_of_url(ov_url)

    batch = gen_update_batch(N_BASE, n_new=40, recrawl_indices=[recrawl_idx, 11])
    upd = tmp_path_factory.mktemp("pages_interleave")
    write_update_parquet(str(upd), batch)
    m = update_index(str(upd), idx, blog_ratings=ratings,
                     fixed_now=now2, tokenize_concurrency=2)
    assert m["refreshed"]

    union = tmp_path_factory.mktemp("union_interleave") / "union.parquet"
    write_union_parquet(str(union), base_pages, batch)
    s = Searcher(idx)
    oi = build_oracle_index(str(union), blog_ratings=ratings, fixed_now=now2)
    assert s.stats["n_docs"] == oi.n_docs
    for q in reference_query_set():
        got = [(r.doc_id, round(r.score, 5)) for r in s.search(q, k=10)]
        want = [(d, round(sc, 5)) for d, sc, *_ in oracle_topk(oi, q, k=10)]
        assert got == want, f"interleave mismatch for {q!r}"


def test_delete_urls_with_resurrection(base_pages, ratings, tmp_path_factory):
    """Deleting a dedup-winner url must tombstone its postings, resurrect
    its smallest surviving duplicate, and stay rank-identical to an
    oracle built over the corpus minus the deleted page."""
    import pyarrow as pa

    from myaku_ray.oracle import build_oracle_index
    from myaku_ray.pipelines.update import delete_urls, load_deleted

    idx = str(tmp_path_factory.mktemp("idx_delete"))
    build_index(base_pages, idx, blog_ratings=ratings, tokenize_concurrency=2)

    docs = pq.read_table(
        f"{idx}/docs", columns=["doc_id", "url", "text_hash"]
    ).to_pandas()
    groups = docs.groupby("text_hash")["doc_id"].agg(["count", "min"])
    dup = groups[groups["count"] > 1]
    assert len(dup) > 0
    winner_id = int(dup["min"].iloc[0])
    winner_url = docs.loc[docs["doc_id"] == winner_id, "url"].iloc[0]

    m = delete_urls(idx, [winner_url], tokenize_concurrency=2)
    assert m["n_deleted"] == 1
    assert m["n_resurrected"] >= 1
    assert winner_id in load_deleted(idx)

    # oracle over the corpus with the deleted page removed
    full = pq.read_table(base_pages)
    mask = pa.array([u != winner_url for u in full["url"].to_pylist()], pa.bool_())
    reduced = tmp_path_factory.mktemp("pages_deleted") / "reduced.parquet"
    pq.write_table(full.filter(mask), str(reduced))
    _assert_parity(idx, str(reduced), ratings)

    # idempotent re-delete
    m2 = delete_urls(idx, [winner_url], tokenize_concurrency=2)
    assert m2["n_deleted"] == 0 and m2["refreshed"] is False


def test_delete_then_updates_no_delta_collision(base_pages, ratings, tmp_path_factory):
    """Regression: delete_urls writes a postings delta with no docs twin;
    the next update_index must allocate a FRESH delta id (unified counter)
    instead of reusing the resurrection delta's dir and clobbering its
    _tokenized.meta.  Sequence delete -> update -> no-change update must
    end rank-identical with n_tokenized == 0 on the final pass."""
    import os

    import pyarrow as pa

    from myaku_ray.pipelines.update import delete_urls

    idx = str(tmp_path_factory.mktemp("idx_del_upd"))
    build_index(base_pages, idx, blog_ratings=ratings, tokenize_concurrency=2)

    docs = pq.read_table(
        f"{idx}/docs", columns=["doc_id", "url", "text_hash"]
    ).to_pandas()
    groups = docs.groupby("text_hash")["doc_id"].agg(["count", "min"])
    dup = groups[groups["count"] > 1]
    winner_id = int(dup["min"].iloc[0])
    winner_url = docs.loc[docs["doc_id"] == winner_id, "url"].iloc[0]

    m0 = delete_urls(idx, [winner_url], tokenize_concurrency=2)
    assert m0["n_resurrected"] >= 1  # postings delta exists, no docs delta

    batch = gen_update_batch(N_BASE, n_new=20)
    upd = tmp_path_factory.mktemp("pages_del_upd")
    write_update_parquet(str(upd), batch)
    m1 = update_index(str(upd), idx, blog_ratings=ratings,
                      tokenize_concurrency=2)
    assert m1["refreshed"]
    # unified counter: update's delta dirs must not collide with delete's
    deltas = sorted(
        os.path.basename(d)
        for d in __import__("glob").glob(os.path.join(idx, "postings", "delta-*"))
    )
    assert len(deltas) == len(set(deltas)) == 2

    m2 = update_index(str(upd), idx, blog_ratings=ratings,
                      tokenize_concurrency=2)
    assert m2["n_tokenized"] == 0, "resurrected doc was re-tokenized (collision)"
    assert m2["refreshed"] is False

    # parity vs oracle over (base + batch) minus the deleted url
    union = tmp_path_factory.mktemp("union_del_upd") / "union.parquet"
    write_union_parquet(str(union), base_pages, batch)
    full = pq.read_table(str(union))
    mask = pa.array([u != winner_url for u in full["url"].to_pylist()], pa.bool_())
    reduced = tmp_path_factory.mktemp("pages_del_upd_red") / "reduced.parquet"
    pq.write_table(full.filter(mask), str(reduced))
    _assert_parity(idx, str(reduced), ratings)


def test_crashed_recrawl_keeps_old_version(base_pages, ratings, tmp_path_factory):
    """Regression: an update that crashes after extracting a re-crawl but
    before tokenizing must NOT tombstone the old version's postings on the
    next refresh — supersede is derived from COMMITTED doc files only, so
    the partial delta's newer warc is invisible until its postings exist."""
    import os

    import pyarrow.parquet as pq2

    from myaku_ray.pipelines.update import refresh_index
    from myaku_ray.stages.extract import make_extract_fn

    idx = str(tmp_path_factory.mktemp("idx_crash_recrawl"))
    build_index(base_pages, idx, blog_ratings=ratings, tokenize_concurrency=2)

    batch = gen_update_batch(N_BASE, n_new=0, recrawl_indices=[7, 13])
    upd = tmp_path_factory.mktemp("pages_crash_recrawl")
    write_update_parquet(str(upd), batch)

    # simulate the crash: extracted docs delta exists WITHOUT _DELTA_DONE
    fake_delta = os.path.join(idx, "docs", "delta-1")
    os.makedirs(fake_delta)
    ext = make_extract_fn(ratings)
    pages_t = pq.read_table(str(upd))
    pq2.write_table(
        ext(pages_t.select(["url", "warc_ts", "html", "lang"])),
        os.path.join(fake_delta, "partial.parquet"),
    )

    # a refresh right now (e.g. a rescore) must keep the OLD versions live
    refresh_index(idx)
    _assert_parity(idx, base_pages, ratings)

    # re-running the update completes the re-crawl normally
    m = update_index(str(upd), idx, blog_ratings=ratings,
                     tokenize_concurrency=2)
    assert m["refreshed"] and m["n_recrawled"] == 2
    union = tmp_path_factory.mktemp("union_crash_recrawl") / "union.parquet"
    write_union_parquet(str(union), base_pages, batch)
    _assert_parity(idx, str(union), ratings)


def test_distributed_refresh_derivation_matches_driver(base_pages, ratings, tmp_path_factory):
    """Forcing the Dataset-groupby derivation path (the 10^12-doc scale
    switch) must produce the identical drop state and rank-identical
    results as the driver pandas path — after a delete AND a re-crawl
    update, so supersede / effective-deleted / losers are all non-trivial."""
    import pyarrow as pa

    import myaku_ray.pipelines.update as upd

    idx = str(tmp_path_factory.mktemp("idx_dist_derive"))
    build_index(base_pages, idx, blog_ratings=ratings, tokenize_concurrency=2)

    docs = pq.read_table(f"{idx}/docs", columns=["doc_id", "url", "text_hash"]).to_pandas()
    groups = docs.groupby("text_hash")["doc_id"].agg(["count", "min"])
    dup = groups[groups["count"] > 1]
    winner_url = docs.loc[docs["doc_id"] == int(dup["min"].iloc[0]), "url"].iloc[0]
    upd.delete_urls(idx, [winner_url], tokenize_concurrency=2)

    batch = gen_update_batch(N_BASE, n_new=15, recrawl_indices=[7])
    upd_dir = tmp_path_factory.mktemp("pages_dist_derive")
    write_update_parquet(str(upd_dir), batch)
    upd.update_index(str(upd_dir), idx, blog_ratings=ratings, tokenize_concurrency=2)

    driver_state = upd._derive_refresh_state(idx)
    old_limit = upd.REFRESH_DERIVE_DRIVER_LIMIT
    upd.REFRESH_DERIVE_DRIVER_LIMIT = 0
    try:
        dist_state = upd._derive_refresh_state(idx)
        assert dist_state[0] == driver_state[0], "supersede"
        assert dist_state[1] == driver_state[1], "losers"
        assert dist_state[2] == driver_state[2], "deleted"
        assert dist_state[3] == driver_state[3], "overrides"
        assert dist_state[4] == driver_state[4], "n_docs"

        # a full refresh through the distributed path stays rank-identical
        upd.refresh_index(idx)
    finally:
        upd.REFRESH_DERIVE_DRIVER_LIMIT = old_limit

    union = tmp_path_factory.mktemp("union_dist_derive") / "union.parquet"
    write_union_parquet(str(union), base_pages, batch)
    full = pq.read_table(str(union))
    mask = pa.array([u != winner_url for u in full["url"].to_pylist()], pa.bool_())
    reduced = tmp_path_factory.mktemp("red_dist_derive") / "reduced.parquet"
    pq.write_table(full.filter(mask), str(reduced))
    _assert_parity(idx, str(reduced), ratings)


def test_interleaved_ops_full_parity(base_pages, ratings, tmp_path_factory):
    """Six-step interleaving of every incremental operation — update,
    delete, rescore, resurrect-by-recrawl, no-change — asserting
    rank-identity against a from-scratch serial oracle over the expected
    live corpus at the current clock AFTER EVERY STEP."""
    from datetime import timedelta

    import pyarrow as pa

    from myaku_ray.corpus import FIXED_NOW
    from myaku_ray.pipelines.rescore import rescore_index
    from myaku_ray.pipelines.update import delete_urls

    idx = str(tmp_path_factory.mktemp("idx_interleaved"))
    build_index(base_pages, idx, blog_ratings=ratings, tokenize_concurrency=2)
    tmp = tmp_path_factory.mktemp("interleaved")

    def check(corpus_path, clock, label):
        s = Searcher(idx)
        oi = build_oracle_index(corpus_path, blog_ratings=ratings, fixed_now=clock)
        assert s.stats["n_docs"] == oi.n_docs, (label, s.stats["n_docs"], oi.n_docs)
        for q in reference_query_set():
            got = [(r.doc_id, round(r.score, 5)) for r in s.search(q, k=10)]
            want = [(d, round(sc, 5)) for d, sc, *_ in oracle_topk(oi, q, k=10)]
            assert got == want, (label, q)

    from myaku_ray.index.searcher import Searcher
    from myaku_ray.oracle import build_oracle_index, oracle_topk, reference_query_set

    clock = FIXED_NOW
    check(base_pages, clock, "step0-build")

    # step 1: update with new docs + a recrawl
    batch_a = gen_update_batch(N_BASE, n_new=20, recrawl_indices=[3])
    upd_a = tmp / "upd_a"
    upd_a.mkdir()
    write_update_parquet(str(upd_a), batch_a)
    update_index(str(upd_a), idx, blog_ratings=ratings, tokenize_concurrency=2)
    union1 = str(tmp / "union1.parquet")
    write_union_parquet(union1, base_pages, batch_a)
    check(union1, clock, "step1-update")

    # step 2: delete a dup-winner url
    docs = pq.read_table(f"{idx}/docs", columns=["doc_id", "url", "text_hash"]).to_pandas()
    g = docs.groupby("text_hash")["doc_id"].agg(["count", "min"])
    dup = g[g["count"] > 1]
    del_url = docs.loc[docs["doc_id"] == int(dup["min"].iloc[0]), "url"].iloc[0]
    delete_urls(idx, [del_url], tokenize_concurrency=2)

    def minus_url(src, dst, url):
        full = pq.read_table(src)
        mask = pa.array([u != url for u in full["url"].to_pylist()], pa.bool_())
        pq.write_table(full.filter(mask), dst)

    reduced2 = str(tmp / "union2.parquet")
    minus_url(union1, reduced2, del_url)
    check(reduced2, clock, "step2-delete")

    # step 3: rescore at a later clock
    clock = FIXED_NOW + timedelta(days=150)
    m = rescore_index(idx, now=clock, blog_ratings=ratings)
    assert m["n_rescored"] > 0
    check(reduced2, clock, "step3-rescore")

    # step 3b: COMPACT mid-sequence — overrides must survive (not baked),
    # the deleted watermark must survive, rank-identity must hold
    from myaku_ray.pipelines.update import compact_index

    mc = compact_index(idx)
    assert mc["compacted"]
    check(reduced2, clock, "step3b-compact")

    # step 4: update that RESURRECTS the deleted url via a newer recrawl
    del_idx = _index_of_url(del_url)
    batch_b = gen_update_batch(N_BASE, n_new=8, recrawl_indices=[del_idx, 11])
    upd_b = tmp / "upd_b"
    upd_b.mkdir()
    write_update_parquet(str(upd_b), batch_b)
    update_index(str(upd_b), idx, blog_ratings=ratings, fixed_now=clock,
                 tokenize_concurrency=2)
    union3 = str(tmp / "union3.parquet")
    write_union_parquet(union3, union1, batch_b)  # del_url's NEW version live
    check(union3, clock, "step4-resurrect-recrawl")

    # step 5: re-present the same batch — nothing changes
    m5 = update_index(str(upd_b), idx, blog_ratings=ratings, fixed_now=clock,
                      tokenize_concurrency=2)
    assert m5["n_fresh_docs"] == 0 and m5["refreshed"] is False
    check(union3, clock, "step5-nochange")

    # step 6: final compact folds the resurrection delta; still identical
    mc2 = compact_index(idx)
    assert mc2["compacted"]
    check(union3, clock, "step6-compact")
    m7 = update_index(str(upd_b), idx, blog_ratings=ratings, fixed_now=clock,
                      tokenize_concurrency=2)
    assert m7["refreshed"] is False
    check(union3, clock, "step7-nochange-after-compact")


def test_compaction_folds_deltas_and_stays_rank_identical(
    base_pages, ratings, tmp_path_factory
):
    """compact_index folds committed deltas + tombstones into the base
    layout: no delta dirs remain, superseded versions are physically
    gone, rank-identity holds, and every later incremental op — anti-join
    watermark for the deleted url, resurrect-by-recrawl, no-change — still
    behaves exactly as before compaction."""
    import glob as _glob
    import os

    import pyarrow as pa

    from myaku_ray.pipelines.update import compact_index, delete_urls

    idx = str(tmp_path_factory.mktemp("idx_compact"))
    build_index(base_pages, idx, blog_ratings=ratings, tokenize_concurrency=2)

    batch_a = gen_update_batch(N_BASE, n_new=20, recrawl_indices=[3])
    upd_a = tmp_path_factory.mktemp("pages_compact_a")
    write_update_parquet(str(upd_a), batch_a)
    update_index(str(upd_a), idx, blog_ratings=ratings, tokenize_concurrency=2)

    docs = pq.read_table(f"{idx}/docs", columns=["doc_id", "url", "text_hash"]).to_pandas()
    g = docs.groupby("text_hash")["doc_id"].agg(["count", "min"])
    dup = g[g["count"] > 1]
    del_url = docs.loc[docs["doc_id"] == int(dup["min"].iloc[0]), "url"].iloc[0]
    del_warc_row = pq.read_table(f"{idx}/docs", columns=["url", "warc_ts"]).to_pandas()
    delete_urls(idx, [del_url], tokenize_concurrency=2)

    m = compact_index(idx)
    assert m["compacted"]
    # layout: no deltas anywhere, docs are root-only, one file per bucket
    for st in ("docs", "postings"):
        assert not _glob.glob(os.path.join(idx, st, "delta-*")), st
    # superseded old version physically gone: exactly one row per doc_id
    d2 = pq.read_table(f"{idx}/docs", columns=["doc_id"]).to_pandas()
    assert d2["doc_id"].is_unique

    union = tmp_path_factory.mktemp("u_compact") / "u.parquet"
    write_union_parquet(str(union), base_pages, batch_a)
    full = pq.read_table(str(union))
    mask = pa.array([u != del_url for u in full["url"].to_pylist()], pa.bool_())
    reduced = tmp_path_factory.mktemp("r_compact") / "r.parquet"
    pq.write_table(full.filter(mask), str(reduced))
    _assert_parity(idx, str(reduced), ratings)

    # idempotent
    m2 = compact_index(idx)
    assert m2["compacted"] is False

    # the deleted url's SAME version re-presented is still skipped (its
    # docs row survived compaction as the watermark)
    same_version = full.filter(
        pa.array([u == del_url for u in full["url"].to_pylist()], pa.bool_())
    )
    upd_same = tmp_path_factory.mktemp("pages_compact_same")
    write_update_parquet(str(upd_same), same_version.select(
        ["url", "warc_ts", "html", "text", "lang"]
    ))
    ms = update_index(str(upd_same), idx, blog_ratings=ratings,
                      tokenize_concurrency=2)
    assert ms["n_fresh_docs"] == 0 and ms["refreshed"] is False
    _assert_parity(idx, str(reduced), ratings)

    # post-compaction update + resurrection by newer recrawl still works
    del_idx = _index_of_url(del_url)
    batch_b = gen_update_batch(N_BASE, n_new=10, recrawl_indices=[del_idx])
    upd_b = tmp_path_factory.mktemp("pages_compact_b")
    write_update_parquet(str(upd_b), batch_b)
    update_index(str(upd_b), idx, blog_ratings=ratings, tokenize_concurrency=2)
    union2 = tmp_path_factory.mktemp("u2_compact") / "u2.parquet"
    write_union_parquet(str(union2), str(union), batch_b)
    _assert_parity(idx, str(union2), ratings)


def test_crashed_compaction_swap_recovers(base_pages, ratings, tmp_path_factory):
    """A compaction that crashes BEFORE the swap completes must be
    finished by the next update entry (marker-driven recovery), ending
    rank-identical."""
    import os
    import shutil

    import myaku_ray.pipelines.update as upd

    idx = str(tmp_path_factory.mktemp("idx_compact_crash"))
    build_index(base_pages, idx, blog_ratings=ratings, tokenize_concurrency=2)
    batch = gen_update_batch(N_BASE, n_new=10)
    d = tmp_path_factory.mktemp("pages_cc")
    write_update_parquet(str(d), batch)
    update_index(str(d), idx, blog_ratings=ratings, tokenize_concurrency=2)

    # simulate the crash: run compaction but stop right after the marker
    # lands (all .compact dirs are complete, swap not yet performed)
    orig = upd._finish_compaction
    calls = {"n": 0}

    def crashing_finish(index_dir):
        # let the pre-compaction recovery call through; crash on the
        # post-marker swap call
        calls["n"] += 1
        if calls["n"] >= 2 and os.path.exists(upd._compact_marker(index_dir)):
            raise RuntimeError("simulated crash mid-swap")
        return orig(index_dir)

    upd._finish_compaction = crashing_finish
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="simulated crash"):
            upd.compact_index(idx)
    finally:
        upd._finish_compaction = orig

    assert os.path.exists(upd._compact_marker(idx))
    assert os.path.isdir(os.path.join(idx, "docs.compact"))

    # next update recovers the swap and proceeds normally
    m = update_index(str(d), idx, blog_ratings=ratings, tokenize_concurrency=2)
    assert not os.path.exists(upd._compact_marker(idx))
    assert not os.path.isdir(os.path.join(idx, "docs.compact"))

    # refresh state after recovery must be consistent and rank-identical
    upd.refresh_index(idx)
    union = tmp_path_factory.mktemp("u_cc") / "u.parquet"
    write_union_parquet(str(union), base_pages, batch)
    _assert_parity(idx, str(union), ratings)
