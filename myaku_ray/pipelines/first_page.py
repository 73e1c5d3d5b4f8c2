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
    or stale (segments rebuilt since the cache was materialized or last
    patched).  Patch files (``zpatch-*.parquet``) override the base rows
    for their terms, applied in patch order."""
    import glob as _glob

    out_dir = os.path.join(index_dir, "first_page")
    meta_path = os.path.join(out_dir, "_meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("segments_success_mtime") != _segments_success_mtime(index_dir):
        return None
    files = sorted(
        f
        for f in _glob.glob(os.path.join(out_dir, "*.parquet"))
        if not os.path.basename(f).startswith("_")
    )
    base = [f for f in files if not os.path.basename(f).startswith("zpatch-")]
    patches = [f for f in files if os.path.basename(f).startswith("zpatch-")]
    cache: dict = {}
    for fset in ([base] + [[p] for p in patches]):
        if not fset:
            continue
        t = pq.read_table(fset)
        rows: dict = {}
        for term, rank, d, s, w in zip(
            t["term"].to_pylist(),
            t["rank"].to_pylist(),
            t["doc_id"].to_pylist(),
            t["score"].to_pylist(),
            t["warc_us"].to_pylist(),
        ):
            rows.setdefault(term, []).append((rank, d, float(s), w))
        for term, lst in rows.items():  # later files override per term
            cache[term] = [(d, s, w) for _, d, s, w in sorted(lst)]
    return cache, int(meta["k"])


# ---------------------------------------------------------------------------
# Incremental maintenance (the reference's per-term recache decisions)
# ---------------------------------------------------------------------------

def touched_terms_of_docs(index_dir: str, doc_ids) -> set[str]:
    """Terms of the given docs' CURRENT texts (the terms whose first page
    a quality-only change can affect).  Bounded: predicate-pushdown read
    of just those docs + per-doc tokenization."""
    import pyarrow.dataset as pads

    from myaku_ray.tokenizer import get_tokenizer

    ids = sorted(int(d) for d in doc_ids)
    if not ids:
        return set()
    tbl = pads.dataset(
        stage_dir(index_dir, "docs"), format="parquet",
        partitioning="hive",
    ).to_table(columns=["text"], filter=pads.field("doc_id").isin(ids))
    tok = get_tokenizer()
    terms: set[str] = set()
    for text in tbl["text"].to_pylist():
        terms.update(tok.find_term_tfs(text))
    return terms


def patch_first_page_cache(
    index_dir: str, touched_doc_ids, k: int | None = None
) -> dict:
    """Incrementally patch the cache after a QUALITY-ONLY change (rescore):
    recompute only terms whose posting lists the touched docs appear in;
    every other term's rows are untouched on disk.

    This is the reference's per-term maintenance decision flow
    (myaku/datastore/cache.py:201-312) collapsed to two outcomes: a term
    with no touched doc is UNNECESSARY (skip), any other term is exactly
    recomputed from its (already re-encoded) segment rows — which covers
    both the in-place-reorder and RECACHE_REQUIRED outcomes.  Safe ONLY
    for quality-only changes: term membership and global df/avgdl are
    unchanged, so untouched terms' scores cannot move.  Structural
    updates (new/removed docs) change global stats — callers rebuild."""
    import glob as _glob

    import pyarrow.dataset as pads

    t0 = time.time()
    out_dir = os.path.join(index_dir, "first_page")
    meta_path = os.path.join(out_dir, "_meta.json")
    if not os.path.exists(meta_path):
        return {"patched_terms": 0, "reason": "no_cache"}
    with open(meta_path) as f:
        meta = json.load(f)
    k = k or int(meta["k"])

    terms = touched_terms_of_docs(index_dir, touched_doc_ids)
    if not terms:
        meta["segments_success_mtime"] = _segments_success_mtime(index_dir)
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        return {"patched_terms": 0}

    # exact per-term recompute from the refreshed segments: term-sorted
    # 512-row row groups make the isin filter a row-group-pruned read
    seg = pads.dataset(
        stage_dir(index_dir, "segments"), format="parquet", partitioning="hive"
    )
    tbl = seg.to_table(
        columns=["term", "max_score", "blob"],
        filter=pads.field("term").isin(sorted(terms)),
    )
    rows_t, rows_r, rows_d, rows_s, rows_w = [], [], [], [], []
    by_term: dict[str, list] = {}
    for term, ms, blob in zip(
        tbl["term"].to_pylist(), tbl["max_score"].to_pylist(),
        tbl["blob"].to_pylist(),
    ):
        by_term.setdefault(term, []).append((blob, float(ms)))
    for term, blobs in by_term.items():
        cands = []
        for blob, ms in blobs:
            cands.extend(ArrayPostings([blob], ms).topk_arrays(k))
        cands.sort(key=lambda c: (c[1], c[2], c[0]), reverse=True)
        for rank, (d, s, w) in enumerate(cands[:k]):
            rows_t.append(term)
            rows_r.append(rank)
            rows_d.append(d)
            rows_s.append(s)
            rows_w.append(w)

    n_prev = len(_glob.glob(os.path.join(out_dir, "zpatch-*.parquet")))
    patch_path = os.path.join(out_dir, f"zpatch-{n_prev + 1:05d}.parquet")
    pq.write_table(
        pa.table(
            {
                "term": pa.array(rows_t, pa.string()),
                "rank": pa.array(np.asarray(rows_r, dtype=np.int32)),
                "doc_id": pa.array(rows_d, pa.int64()),
                "score": pa.array(np.asarray(rows_s, dtype=np.float32)),
                "warc_us": pa.array(np.asarray(rows_w, dtype=np.uint64)),
            }
        ),
        patch_path,
    )
    meta["segments_success_mtime"] = _segments_success_mtime(index_dir)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return {
        "patched_terms": len(by_term),
        "first_page_patch_wall_s": round(time.time() - t0, 3),
    }
