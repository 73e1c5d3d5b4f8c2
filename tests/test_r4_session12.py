"""Incremental update on the DOCUMENT-SHARDED layout (pipelines/shard.py
``update_sharded_index`` / ``refresh_sharded_index``).

The guarantee under test composes two already-tested ones: the
monolithic update is rank-identical to a from-scratch build over the
latest-version-per-url union corpus (tests/test_incremental.py), and the
sharded build is bit-identical to the monolithic index over the same
corpus (tests/test_r4_session11.py).  So here: update BOTH layouts with
the same batch and assert the federation stays bit-identical to the
updated monolithic index — scores, counts, and the from-scratch serial
oracle over the union corpus.
"""

from __future__ import annotations

import os

import pytest

from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
from myaku_ray.corpus_update import (
    gen_update_batch,
    write_union_parquet,
    write_update_parquet,
)
from myaku_ray.index.searcher import Searcher
from myaku_ray.index.sharded import ShardedSearcher
from myaku_ray.oracle import build_oracle_index, oracle_topk, reference_query_set
from myaku_ray.pipelines.build import build_index
from myaku_ray.pipelines.shard import (
    build_sharded_index,
    update_sharded_index,
)
from myaku_ray.pipelines.update import update_index

N_BASE = 300


@pytest.fixture(scope="module")
def ratings():
    blogs = gen_blogs_table()
    return dict(zip(blogs["blog_url"], blogs["rating"]))


@pytest.fixture(scope="module")
def upd_built(ray_session, tmp_path_factory, ratings):
    """Base mono + 3-shard builds, then the SAME update batch into both
    (new docs + a re-crawl + an injected duplicate)."""
    base = tmp_path_factory.mktemp("shupd")
    pages = str(base / "pages")
    write_pages_parquet(pages, N_BASE, use_ray=False)
    mono_dir = str(base / "mono")
    shard_root = str(base / "sharded")
    build_index(pages, mono_dir, blog_ratings=ratings, tokenize_concurrency=2)
    m0 = build_sharded_index(pages, shard_root, 3, blog_ratings=ratings)

    batch = gen_update_batch(
        N_BASE, n_new=50, recrawl_indices=[7], dup_of_indices=[40]
    )
    upd_dir = str(base / "upd")
    write_update_parquet(upd_dir, batch)
    mm = update_index(upd_dir, mono_dir, blog_ratings=ratings,
                      tokenize_concurrency=2)
    ms = update_sharded_index(upd_dir, shard_root, blog_ratings=ratings,
                              tokenize_concurrency=2)
    union = str(base / "union.parquet")
    write_union_parquet(union, pages, batch)
    return pages, mono_dir, shard_root, m0, mm, ms, union, upd_dir


def test_sharded_update_metrics_match_monolithic(upd_built):
    """The shared ingest phase must derive the identical delta on both
    layouts: same fresh/recrawl/tokenized/loser counts, both refreshed."""
    *_rest, mm, ms, _union, _upd = upd_built
    _pages, _mono, _root, _m0 = _rest
    for key in ("n_fresh_docs", "n_recrawled", "n_tokenized", "n_losers"):
        assert mm[key] == ms[key], key
    assert mm["refreshed"] and ms["refreshed"]
    assert ms["n_shards"] == 3


def test_sharded_update_rank_bit_identity(upd_built):
    """After the update, federated top-k == updated monolithic top-k
    bit-for-bit, and both == the serial oracle over the union corpus."""
    _pages, mono_dir, shard_root, m0, _mm, _ms, union, _upd = upd_built
    mono = Searcher(mono_dir)
    fed = ShardedSearcher(m0["shard_dirs"])
    oi = build_oracle_index(union, blog_ratings=dict(
        zip(gen_blogs_table()["blog_url"], gen_blogs_table()["rating"])
    ))
    assert fed.shards[0].stats["n_docs"] == mono.stats["n_docs"] == oi.n_docs
    nonempty = 0
    for q in reference_query_set():
        a = [(r.doc_id, round(r.score, 5), r.warc_us) for r in mono.topk(q, 10)]
        b = [(r.doc_id, round(r.score, 5), r.warc_us) for r in fed.topk(q, 10)]
        want = [(d, round(s, 5), w) for d, s, w in oracle_topk(oi, q, 10)]
        assert a == b, f"fed vs mono {q!r}"
        assert b == want, f"fed vs oracle {q!r}"
        assert fed.count(q) == mono.count(q), f"count {q!r}"
        nonempty += bool(a)
    assert nonempty >= 5


def test_sharded_update_delta_routed_not_rebuilt(upd_built):
    """The update tokenized only the delta (postings delta dir is
    (shard, bucket)-routed) and did NOT re-run the base postings stage."""
    import glob
    import json

    _pages, _mono, shard_root, _m0, mm, ms, _union, _upd = upd_built
    # delta postings exist, hive-routed by shard
    deltas = sorted(glob.glob(os.path.join(shard_root, "postings", "delta-*")))
    assert len(deltas) == 1
    shard_parts = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(deltas[0], "shard=*"))
    )
    assert shard_parts and all(p.startswith("shard=") for p in shard_parts)
    assert os.path.exists(os.path.join(deltas[0], "_DELTA_DONE"))
    # the base postings _SUCCESS marker still reports the ORIGINAL build
    with open(os.path.join(shard_root, "postings", "_SUCCESS")) as f:
        assert json.load(f)["n_shards"] == 3
    # both layouts tokenized the same delta size, far below the corpus
    assert 0 < ms["n_tokenized"] == mm["n_tokenized"] < N_BASE


def test_sharded_update_no_change_fast_path(upd_built, tmp_path):
    """Re-presenting already-indexed pages is a no-op: nothing fresh,
    nothing tokenized, refresh skipped (watermark already covers the
    committed deltas)."""
    import pyarrow.parquet as pq

    pages, _mono, shard_root, _m0, _mm, _ms, _union, _upd = upd_built
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    nochange = str(tmp_path / "nochange")
    write_update_parquet(nochange, pq.read_table(pages).slice(0, 80))
    m = update_sharded_index(nochange, shard_root, blog_ratings=ratings,
                             tokenize_concurrency=2)
    assert m["n_fresh_docs"] == 0
    assert m["n_tokenized"] == 0
    assert m["refreshed"] is False


def test_sharded_update_positional(ray_session, tmp_path_factory, ratings):
    """Positional sidecar survives a sharded update: phrase/near top-k
    over the updated federation == the updated monolithic positional
    index's."""
    from myaku_ray.oracle import near_query_set, phrase_query_set

    base = tmp_path_factory.mktemp("shupdpos")
    pages = str(base / "pages")
    write_pages_parquet(pages, 200, use_ray=False)
    mono_dir = str(base / "mono")
    shard_root = str(base / "sharded")
    build_index(pages, mono_dir, blog_ratings=ratings,
                tokenize_concurrency=2, with_positions=True)
    m0 = build_sharded_index(pages, shard_root, 2, blog_ratings=ratings,
                             with_positions=True)
    batch = gen_update_batch(200, n_new=30, recrawl_indices=[3])
    upd_dir = str(base / "upd")
    write_update_parquet(upd_dir, batch)
    update_index(upd_dir, mono_dir, blog_ratings=ratings,
                 tokenize_concurrency=2)
    update_sharded_index(upd_dir, shard_root, blog_ratings=ratings,
                         tokenize_concurrency=2)
    mono = Searcher(mono_dir)
    fed = ShardedSearcher(m0["shard_dirs"])
    nonempty = 0
    for q in reference_query_set():
        assert [(r.doc_id, r.score) for r in fed.topk(q, 10)] == [
            (r.doc_id, r.score) for r in mono.topk(q, 10)
        ], q
    for q in phrase_query_set(pages)[:3]:
        a = [(r.doc_id, r.score) for r in mono.phrase_topk(q, 10)]
        assert [(r.doc_id, r.score) for r in fed.phrase_topk(q, 10)] == a, q
        nonempty += bool(a)
    for q, w in near_query_set(pages)[:2]:
        a = [(r.doc_id, r.score) for r in mono.near_topk(q, w, 10)]
        assert [(r.doc_id, r.score) for r in fed.near_topk(q, w, 10)] == a, q
        nonempty += bool(a)
    assert nonempty >= 1


# ---- resharding (change n_shards without re-tokenizing) -----------------


def test_reshard_bit_identity_and_no_tokenize(upd_built, tmp_path):
    """Resharding the UPDATED 3-shard tree (deltas + supersede + losers
    present) to 2 shards must preserve the federated ranking bit-for-bit,
    fold all deltas away, route every posting by the new key — and never
    touch the tokenizer."""
    import glob
    import json

    from myaku_ray.index.sharded import ShardedSearcher
    from myaku_ray.pipelines.shard import reshard_index

    _pages, _mono, shard_root, m0, _mm, _ms, _union, _upd = upd_built
    new_root = str(tmp_path / "re2")
    m2 = reshard_index(shard_root, new_root, 2)
    fed3 = ShardedSearcher(m0["shard_dirs"])
    fed2 = ShardedSearcher(m2["shard_dirs"])
    assert len(m2["shard_dirs"]) == 2
    nonempty = 0
    for q in reference_query_set():
        a = [(r.doc_id, r.score, r.warc_us) for r in fed3.topk(q, 10)]
        b = [(r.doc_id, r.score, r.warc_us) for r in fed2.topk(q, 10)]
        assert a == b, q
        assert fed3.count(q) == fed2.count(q), q
        nonempty += bool(a)
    assert nonempty >= 5
    # folded: no deltas in the new tree; shards routed by the new key
    assert not glob.glob(os.path.join(new_root, "postings", "delta-*"))
    for i in (0, 1):
        for f in glob.glob(
            os.path.join(new_root, "postings", f"shard={i}", "**", "*.parquet"),
            recursive=True,
        ):
            import pyarrow.parquet as pq

            ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
            assert all(d % 2 == i for d in ids), f
            break  # one file per shard suffices
    # stats are the global ones, re-stamped for the new layout
    with open(os.path.join(m2["shard_dirs"][0], "stats.json")) as f:
        st = json.load(f)
    assert st["n_shards"] == 2 and st["n_docs"] == fed3.shards[0].stats["n_docs"]


def test_resharded_tree_is_updatable(upd_built, tmp_path, ratings):
    """A second crawl batch into the RESHARDED tree must converge to the
    from-scratch serial oracle over the full union corpus — the folded
    tree carries complete watermark/dedup/tokenized state."""
    from myaku_ray.index.sharded import ShardedSearcher
    from myaku_ray.pipelines.shard import reshard_index, update_sharded_index

    pages, _mono, shard_root, _m0, _mm, _ms, _union, upd_dir = upd_built
    new_root = str(tmp_path / "re2b")
    m2 = reshard_index(shard_root, new_root, 2)
    batch1 = gen_update_batch(N_BASE, n_new=50, recrawl_indices=[7],
                              dup_of_indices=[40])
    batch2 = gen_update_batch(N_BASE, n_new=0, recrawl_indices=[2, 11],
                              dup_of_indices=[5])
    upd2 = str(tmp_path / "upd2")
    write_update_parquet(upd2, batch2)
    m = update_sharded_index(upd2, new_root, blog_ratings=ratings,
                             tokenize_concurrency=2)
    assert m["refreshed"] and m["n_recrawled"] == 2
    # only the second delta was tokenized, not the folded corpus
    assert 0 < m["n_tokenized"] <= m["n_fresh_docs"] + 4
    union2 = str(tmp_path / "union2.parquet")
    write_union_parquet(union2, pages, batch1, batch2)
    oi = build_oracle_index(union2, blog_ratings=ratings)
    fed = ShardedSearcher(m2["shard_dirs"])
    assert fed.shards[0].stats["n_docs"] == oi.n_docs
    nonempty = 0
    for q in reference_query_set():
        got = [(r.doc_id, round(r.score, 5)) for r in fed.topk(q, 10)]
        want = [(d, round(s, 5)) for d, s, _w in oracle_topk(oi, q, 10)]
        assert got == want, q
        nonempty += bool(got)
    assert nonempty >= 5


# ---- delete + rescore on the sharded layout ------------------------------


@pytest.fixture(scope="module")
def life_built(ray_session, tmp_path_factory, ratings):
    """Fresh small mono + 2-shard builds reserved for the destructive
    lifecycle tests (delete/rescore mutate the trees)."""
    base = tmp_path_factory.mktemp("shlife")
    pages = str(base / "pages")
    write_pages_parquet(pages, 220, use_ray=False)
    mono_dir = str(base / "mono")
    shard_root = str(base / "sharded")
    build_index(pages, mono_dir, blog_ratings=ratings, tokenize_concurrency=2)
    m0 = build_sharded_index(pages, shard_root, 2, blog_ratings=ratings)
    return pages, mono_dir, shard_root, m0


def _fed_vs_mono(mono_dir: str, shard_dirs: list[str], min_nonempty: int = 4):
    mono = Searcher(mono_dir)
    fed = ShardedSearcher(shard_dirs)
    nonempty = 0
    for q in reference_query_set():
        a = [(r.doc_id, r.score, r.warc_us) for r in mono.topk(q, 10)]
        b = [(r.doc_id, r.score, r.warc_us) for r in fed.topk(q, 10)]
        assert a == b, q
        assert mono.count(q) == fed.count(q), q
        nonempty += bool(a)
    assert nonempty >= min_nonempty
    return mono, fed


def test_sharded_delete_with_resurrection(life_built):
    """Deleting a dedup WINNER on both layouts: the sharded twin must
    derive the same deletion/resurrection and stay bit-identical."""
    import pyarrow.parquet as pq

    from myaku_ray.pipelines.shard import delete_urls_sharded
    from myaku_ray.pipelines.update import delete_urls

    pages, mono_dir, shard_root, m0 = life_built
    docs = pq.read_table(
        os.path.join(mono_dir, "docs"),
        columns=["doc_id", "url", "text_hash"],
    ).to_pandas()
    groups = docs.groupby("text_hash")["doc_id"].agg(["count", "min"])
    dup = groups[groups["count"] > 1]
    assert len(dup) > 0, "corpus has no dup group"
    winner_id = int(dup["min"].iloc[0])
    winner_url = docs.loc[docs["doc_id"] == winner_id, "url"].iloc[0]
    plain_url = docs.loc[~docs["doc_id"].isin(dup["min"]), "url"].iloc[0]

    urls = [winner_url, plain_url]
    mm = delete_urls(mono_dir, urls, tokenize_concurrency=2)
    ms = delete_urls_sharded(shard_root, urls, tokenize_concurrency=2)
    assert mm["n_deleted"] == ms["n_deleted"] == 2
    assert mm["n_resurrected"] == ms["n_resurrected"] >= 1
    mono, fed = _fed_vs_mono(mono_dir, m0["shard_dirs"])
    # the deleted docs are gone from both engines
    assert mono.stats["n_docs"] == fed.shards[0].stats["n_docs"]
    # idempotent: re-deleting is a no-op on both
    assert delete_urls(mono_dir, urls)["refreshed"] is False
    assert delete_urls_sharded(shard_root, urls)["refreshed"] is False


def test_sharded_rescore_time_decay(life_built):
    """Advancing the clock past recency-bucket boundaries: the sharded
    rescore must change the same override set and keep the federation
    bit-identical to the rescored monolithic index."""
    from datetime import timedelta

    from myaku_ray.corpus import FIXED_NOW, gen_blogs_table
    from myaku_ray.pipelines.rescore import rescore_index
    from myaku_ray.pipelines.shard import rescore_sharded_index

    pages, mono_dir, shard_root, m0 = life_built
    ratings = dict(
        zip(gen_blogs_table()["blog_url"], gen_blogs_table()["rating"])
    )
    later = FIXED_NOW + timedelta(days=400)
    mm = rescore_index(mono_dir, now=later, blog_ratings=ratings)
    ms = rescore_sharded_index(shard_root, now=later, blog_ratings=ratings)
    assert mm["n_rescored"] == ms["n_rescored"] > 0
    _fed_vs_mono(mono_dir, m0["shard_dirs"])
    import json

    with open(os.path.join(m0["shard_dirs"][0], "stats.json")) as f:
        assert json.load(f)["fixed_now_us"] == int(
            later.timestamp() * 1_000_000
        )
    # second rescore at the same clock: no score moves on either layout
    assert rescore_index(mono_dir, now=later, blog_ratings=ratings)[
        "n_rescored"
    ] == rescore_sharded_index(
        shard_root, now=later, blog_ratings=ratings
    )["n_rescored"] == 0


def test_sharded_compaction_in_place(upd_built):
    """In-place compaction folds the update's delta + superseded rows
    into the base sharded layout, leaves ranking bit-identical to the
    (uncompacted) monolithic twin, and is idempotent."""
    import glob

    from myaku_ray.pipelines.shard import compact_sharded_index

    _pages, mono_dir, shard_root, m0, _mm, _ms, _union, _upd = upd_built
    assert glob.glob(os.path.join(shard_root, "postings", "delta-*"))
    m = compact_sharded_index(shard_root)
    assert m["compacted"] and m["n_superseded_folded"] >= 1
    # deltas folded away, marker cleaned, no leftover swap dirs
    assert not glob.glob(os.path.join(shard_root, "postings", "delta-*"))
    assert not glob.glob(os.path.join(shard_root, "docs", "delta-*"))
    assert not os.path.exists(shard_root + ".compactnew")
    assert not os.path.exists(os.path.join(shard_root, "compact_sharded.json"))
    mono = Searcher(mono_dir)
    fed = ShardedSearcher(
        sorted(glob.glob(os.path.join(shard_root, "shard-*")))
    )
    nonempty = 0
    for q in reference_query_set():
        a = [(r.doc_id, r.score, r.warc_us) for r in mono.topk(q, 10)]
        b = [(r.doc_id, r.score, r.warc_us) for r in fed.topk(q, 10)]
        assert a == b, q
        nonempty += bool(a)
    assert nonempty >= 5
    # idempotent: nothing left to fold
    assert compact_sharded_index(shard_root)["compacted"] is False
    # and the compacted tree still fast-paths a no-change crawl
    from myaku_ray.pipelines.shard import update_sharded_index

    import pyarrow.parquet as pq

    from myaku_ray.corpus import gen_blogs_table

    blogs = gen_blogs_table()
    nochange = os.path.join(shard_root + "_nc")
    write_update_parquet(nochange, pq.read_table(_pages).slice(0, 50))
    m2 = update_sharded_index(
        nochange, shard_root,
        blog_ratings=dict(zip(blogs["blog_url"], blogs["rating"])),
        tokenize_concurrency=2,
    )
    assert m2["refreshed"] is False
