"""Materialized first-page (top-10-per-term) cache.

The reference answers page-1 queries from a Redis first-page cache that
is maintained incrementally and patched by rescores
(myaku/datastore/cache.py:134-312, runners/build_first_page_cache.py).
Ray-Data equivalent: a deterministic materialized table rebuilt from the
segments after every build/refresh — simpler than incremental patching
and exactly consistent by construction (SURVEY.md K4).

Two-stage exact top-k, skew-safe:

1. ``map_batches`` over segment rows: each (term, salt) sub-list blob
   decodes independently and emits its own top-k candidates — the global
   top-k of a term is a subset of the union of its sub-lists' top-k
   (sub-lists partition the docs), so no task ever holds a full high-df
   posting list.
2. ``groupby(term).map_groups``: merge ≤ salt_buckets×k candidate rows
   per term with the exact (score, warc_us, doc_id) DESC tie order
   (ArticleRankKey, myaku/datatypes.py:134-148).

Freshness: meta.json records the segments _SUCCESS mtime at build time;
``load_first_page`` returns None when stale.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from myaku_ray.index.codec import ArrayPostings
from myaku_ray.state.lineage import stage_dir

FIRST_PAGE_K = 10


def _segments_success_mtime(index_dir: str) -> float | None:
    p = os.path.join(stage_dir(index_dir, "segments"), "_SUCCESS")
    return os.path.getmtime(p) if os.path.exists(p) else None


def build_first_page_cache(index_dir: str, k: int = FIRST_PAGE_K) -> dict:
    t0 = time.time()
    seg_root = stage_dir(index_dir, "segments")
    rows = rd.read_parquet(seg_root, columns=["term", "max_score", "blob"])

    def sublist_topk(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        blobs = batch["blob"].to_pylist()
        maxes = batch["max_score"].to_pylist()
        out_t, out_d, out_s, out_w = [], [], [], []
        for term, blob, ms in zip(terms, blobs, maxes):
            ap = ArrayPostings([blob], float(ms))
            for d, s, w in ap.topk_arrays(k):
                out_t.append(term)
                out_d.append(d)
                out_s.append(s)
                out_w.append(w)
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float32()),
                "warc_us": pa.array(np.asarray(out_w, dtype=np.uint64)),
            }
        )

    cands = rows.map_batches(sublist_topk, batch_format="pyarrow")

    def merge_term(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        scores = g["score"].to_numpy(zero_copy_only=False)
        warc = g["warc_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, warc, scores))[::-1][:k]
        return pa.table(
            {
                "term": g["term"].take(pa.array(order)),
                "rank": pa.array(np.arange(len(order), dtype=np.int32)),
                "doc_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(scores[order], pa.float32()),
                "warc_us": pa.array(warc[order]),
            }
        )

    out_dir = os.path.join(index_dir, "first_page")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    cands.groupby("term").map_groups(
        merge_term, batch_format="pyarrow"
    ).write_parquet(out_dir)
    with open(os.path.join(out_dir, "_meta.json"), "w") as f:
        json.dump(
            {
                "k": k,
                "segments_success_mtime": _segments_success_mtime(index_dir),
            },
            f,
        )
    return {"first_page_wall_s": round(time.time() - t0, 3)}


def load_first_page(index_dir: str) -> tuple[dict, int] | None:
    """term -> [(doc_id, score, warc_us) in rank order], or None if absent
    or stale (segments rebuilt since the cache was materialized)."""
    out_dir = os.path.join(index_dir, "first_page")
    meta_path = os.path.join(out_dir, "_meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("segments_success_mtime") != _segments_success_mtime(index_dir):
        return None
    t = pq.read_table(out_dir)
    cache: dict = {}
    for term, rank, d, s, w in zip(
        t["term"].to_pylist(),
        t["rank"].to_pylist(),
        t["doc_id"].to_pylist(),
        t["score"].to_pylist(),
        t["warc_us"].to_pylist(),
    ):
        cache.setdefault(term, []).append((rank, d, float(s), w))
    for term in cache:
        cache[term] = [(d, s, w) for _, d, s, w in sorted(cache[term])]
    return cache, int(meta["k"])
