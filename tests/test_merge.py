"""Fan-out-then-merge: shard builds merged == one build over the union.

The 10^12-doc pattern: build_index per disjoint corpus shard, then
merge_indexes into one serving index — byte-identical segments, equal
BM25 stats, rank-identical results, no re-tokenization.
"""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest
from conftest import seg_digest as _seg_digest

from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
from myaku_ray.oracle import build_oracle_index, oracle_topk, reference_query_set

N_PAGES = 500


@pytest.fixture(scope="module")
def merged(ray_session, tmp_path_factory):
    from myaku_ray.pipelines.build import build_index
    from myaku_ray.pipelines.merge import merge_indexes

    root = tmp_path_factory.mktemp("merge")
    pages = str(root / "pages")
    write_pages_parquet(pages, N_PAGES, use_ray=False)
    t = pq.read_table(os.path.join(pages, "pages.parquet"))

    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    idx_union = str(root / "idx_union")
    build_index(pages, idx_union, blog_ratings=ratings)

    # disjoint halves chosen so every generator dup pair STRADDLES them
    # (second member of each dup group goes to half 1) — the merge's
    # cross-shard dedup is exercised for real
    docs = pq.read_table(
        os.path.join(idx_union, "docs"), columns=["text_hash", "url"]
    )
    seen, second = set(), set()
    for h, u in zip(docs["text_hash"].to_pylist(), docs["url"].to_pylist()):
        if h in seen:
            second.add(u)
        seen.add(h)
    assert second  # the fixed corpus contains exact-dup texts
    urls = t["url"].to_pylist()
    halves = []
    for k in range(2):
        d = str(root / f"half{k}")
        os.makedirs(d)
        rows = [i for i, u in enumerate(urls) if (u in second) == bool(k)]
        pq.write_table(t.take(rows), os.path.join(d, "pages.parquet"))
        halves.append(d)
    shard_idx = []
    for k, d in enumerate(halves):
        idx = str(root / f"idx{k}")
        build_index(d, idx, blog_ratings=ratings)
        shard_idx.append(idx)
    out = str(root / "idx_merged")
    metrics = merge_indexes(shard_idx, out)
    return pages, idx_union, shard_idx, out, metrics, ratings


def test_merge_segments_byte_identical(merged):
    _, idx_union, _, out, metrics, _ = merged
    assert metrics["n_cross_losers"] > 0  # cross-shard dups existed
    assert _seg_digest(out) == _seg_digest(idx_union)


def test_merge_stats_equal(merged):
    _, idx_union, _, out, _, _ = merged
    a = json.load(open(os.path.join(idx_union, "stats.json")))
    b = json.load(open(os.path.join(out, "stats.json")))
    assert a == b


def test_merge_rank_identity(merged):
    from myaku_ray.index.searcher import Searcher

    pages, _, _, out, _, ratings = merged
    oracle = build_oracle_index(pages, blog_ratings=ratings)
    s = Searcher(out)
    for q in reference_query_set():
        eng = [(r.doc_id, r.score) for r in s.topk(q, 10)]
        ora = [(d, sc) for (d, sc, _) in oracle_topk(oracle, q, 10)]
        assert eng == ora, q


def test_merge_hydration_reads_linked_docs(merged):
    from myaku_ray.index.searcher import Searcher

    _, _, _, out, _, _ = merged
    s = Searcher(out)
    q = reference_query_set()[0]
    results = s.search(q, 5) if hasattr(s, "search") else s.hydrate(
        s.topk(q, 5), q
    )
    assert results
    for r in results:
        assert r.url.startswith("https://")


def test_merge_resumes_segment_encode(merged, tmp_path):
    """A killed merge redoes only unfinished segment partitions."""
    from myaku_ray.pipelines.merge import merge_indexes

    _, idx_union, shard_idx, out, _, _ = merged
    seg = os.path.join(out, "segments")
    markers = sorted(glob.glob(os.path.join(seg, "_done", "*.json")))
    assert markers
    name = os.path.basename(markers[0])[: -len(".json")]
    for f in glob.glob(os.path.join(seg, "segment=*", f"{name}.parquet")):
        os.remove(f)
    os.remove(markers[0])
    merge_indexes(shard_idx, out)
    prof = json.load(open(os.path.join(seg, "_encode_tasks.json")))
    assert prof["n_resumed"] == len(markers) - 1
    assert _seg_digest(out) == _seg_digest(idx_union)


def test_merge_distributed_dedup_path(merged, tmp_path):
    """Above DEDUP_DRIVER_LIMIT the cross-shard dedup and the
    disjointness check run as Dataset plans (nothing corpus-sized on
    the driver); the output must equal the driver path's byte for byte
    and the overlap guard must still fire."""
    import myaku_ray.pipelines.merge as m

    _, idx_union, shard_idx, _, _, _ = merged
    old = m.DEDUP_DRIVER_LIMIT
    m.DEDUP_DRIVER_LIMIT = 0
    try:
        out = str(tmp_path / "dist")
        metrics = m.merge_indexes(shard_idx, out)
        assert metrics["n_cross_losers"] > 0
        assert _seg_digest(out) == _seg_digest(idx_union)
        with pytest.raises(ValueError, match="share doc_ids"):
            m.merge_indexes(
                [shard_idx[0], shard_idx[0]], str(tmp_path / "overlap")
            )
    finally:
        m.DEDUP_DRIVER_LIMIT = old


def test_merge_rejects_bad_inputs(merged, tmp_path):
    from myaku_ray.pipelines.merge import merge_indexes

    _, _, shard_idx, _, _, _ = merged
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes(shard_idx[:1], str(tmp_path / "x"))
    # overlapping doc_ids: merging a shard with itself
    with pytest.raises(ValueError, match="share doc_ids"):
        merge_indexes([shard_idx[0], shard_idx[0]], str(tmp_path / "y"))
