"""Merge independently built shard indexes into one index.

The 10^12-doc build pattern is fan-out-then-merge: partition the input
corpus into shards, run ``build_index`` per shard (each its own
resumable job), then merge the shard indexes into one serving index.
``merge_indexes`` implements the merge WITHOUT re-tokenizing anything —
the expensive work (extract + tokenize) is never repeated:

- **cross-shard exact dedup**: each shard deduped within itself at build
  time; the merge recomputes the winner set over the UNION of shard
  winners (same min-doc_id rule over (text_hash, doc_id) — a 2-column
  read per shard, never the text) and drops cross-shard losers during
  segment encode via the same tombstone filter the refresh flow uses.
- **df + stats**: recomputed from the combined postings buckets with the
  drop applied (one vocabulary-sized task per bucket), so BM25 params
  equal a from-scratch build over the union corpus exactly.
- **segments**: ``encode_segments_partitioned`` already accepts multiple
  postings roots — a bucket's encode task concatenates the shard files
  for that bucket; no posting row moves through an exchange.  Output is
  byte-identical to the single build (encode sorts per term, so the
  file layout of its inputs is invisible).
- **docs**: hydration rows are linked (symlink, copy fallback), not
  rewritten — at 100 TB the merged index references the shard doc
  files; on an object store this would be a manifest instead.

Requirements (asserted): identical build params across shards
(num_segments / salt_buckets / encode_buckets / fixed_now /
with_positions), disjoint doc_id sets (the fan-out pattern partitions
by input shard, so a url lives in exactly one shard), and pristine
shard indexes — freshly built, no pending update state (deltas,
deletions, overrides); merge the shards FIRST, then run updates against
the merged index.

Reference parity note: the reference engine has no multi-index merge
(single MongoDB instance); this is the Ray-native scale path for
parallel shard builds, validated byte-identical against a single build
over the union corpus (tests/test_merge.py).
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from myaku_ray.index.segment_build import (
    bucket_file_map,
    df_from_buckets,
    encode_segments_partitioned,
)
from myaku_ray.pipelines.build import (
    DEDUP_DRIVER_LIMIT,
    _parquet_rows,
    driver_loser_ids,
)
from myaku_ray.state.lineage import mark_complete, stage_dir

# Params that must match across shard indexes for the merged segments to
# be well-defined (bucket/salt assignment and scoring are keyed on them).
_MERGE_PARAM_KEYS = (
    "num_segments", "salt_buckets", "encode_buckets", "fixed_now_us",
    "with_positions",
)

# Update-state files whose presence marks a non-pristine index (merge
# inputs must be freshly built shards; run updates AFTER the merge).
_UPDATE_STATE = ("deleted.parquet", "quality_overrides.parquet")


def _shard_losers(index_dir: str) -> np.ndarray:
    d = stage_dir(index_dir, "dedup")
    files = [
        f for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith("_")
    ]
    if not files:
        return np.array([], dtype=np.int64)
    t = pa.concat_tables([pq.read_table(f, columns=["doc_id"]) for f in files])
    return np.sort(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))


def merge_indexes(
    index_dirs: list[str], out_dir: str, *, resume: bool = True
) -> dict:
    """Merge shard indexes into ``out_dir``; returns merge metrics.

    The result is a full index layout (docs / dedup / df / segments +
    stats.json + lineage) — searchable, refreshable and updatable like
    a from-scratch build over the union corpus, and byte-identical to
    one in its segment payloads."""
    if len(index_dirs) < 2:
        raise ValueError("merge_indexes needs at least two shard indexes")
    t_start = time.time()
    metrics: dict = {"n_shards": len(index_dirs)}
    stats_list = []
    for d in index_dirs:
        p = os.path.join(d, "stats.json")
        if not os.path.exists(p):
            raise ValueError(f"{d}: not a completed index (no stats.json)")
        for s in _UPDATE_STATE:
            if os.path.exists(os.path.join(d, s)):
                raise ValueError(
                    f"{d}: has pending update state ({s}); merge freshly "
                    "built shards, then update the merged index"
                )
        with open(p) as f:
            stats_list.append(json.load(f))
    for key in _MERGE_PARAM_KEYS:
        vals = {s.get(key) for s in stats_list}
        if len(vals) > 1:
            raise ValueError(f"shard indexes disagree on {key}: {vals}")

    os.makedirs(out_dir, exist_ok=True)

    # ---- docs: link shard doc files -------------------------------------
    docs_dir = stage_dir(out_dir, "docs")
    os.makedirs(docs_dir, exist_ok=True)
    shard_doc_files: list[list[str]] = []
    n_docs_rows = 0
    for i, d in enumerate(index_dirs):
        src = stage_dir(d, "docs")
        files = []
        for f in sorted(glob.glob(os.path.join(src, "**", "*.parquet"),
                                  recursive=True)):
            if os.path.basename(f).startswith("_"):
                continue
            dst = os.path.join(docs_dir, f"s{i:03d}-{os.path.basename(f)}")
            if not os.path.exists(dst):
                try:
                    os.symlink(os.path.abspath(f), dst)
                except OSError:
                    import shutil as _sh

                    _sh.copy2(f, dst)
            n_docs_rows += pq.read_metadata(f).num_rows
            files.append(f)
        shard_doc_files.append(files)
    mark_complete(out_dir, "docs", rows=n_docs_rows, merged=True)

    # ---- cross-shard exact dedup over the union of shard winners -------
    # Scale switch mirrors the build's dedup stage: below the limit the
    # (text_hash, doc_id) columns fit on the driver; above it nothing
    # corpus-sized is materialized driver-side — disjointness and the
    # winner groupby run as Dataset plans, only loser ids (result-sized)
    # and the per-shard loser arrays (broadcast) come back.
    t0 = time.time()
    shard_losers = [_shard_losers(d) for d in index_dirs]
    overlap_err = (
        "shard indexes share doc_ids — the fan-out pattern requires "
        "disjoint corpus shards (one url lives in exactly one shard)"
    )
    if n_docs_rows <= DEDUP_DRIVER_LIMIT:
        lights = [
            pq.read_table(stage_dir(d, "docs"),
                          columns=["text_hash", "doc_id"])
            for d in index_dirs
        ]
        all_ids = np.concatenate(
            [lt["doc_id"].to_numpy(zero_copy_only=False) for lt in lights]
        )
        if len(np.unique(all_ids)) != len(all_ids):
            raise ValueError(overlap_err)
        winners = []
        for lt, losers in zip(lights, shard_losers):
            ids = lt["doc_id"].to_numpy(zero_copy_only=False)
            if len(losers):
                lt = lt.filter(pa.array(~np.isin(ids, losers)))
            winners.append(lt)
        cross_losers = driver_loser_ids(pa.concat_tables(winners))
    else:
        import ray
        import ray.data as rd

        light = rd.read_parquet(
            [f for files in shard_doc_files for f in files],
            columns=["text_hash", "doc_id"],
        )
        losers_union = (
            np.unique(np.concatenate(shard_losers))
            if any(len(x) for x in shard_losers)
            else np.array([], dtype=np.int64)
        )
        losers_ref = ray.put(losers_union)

        def drop_shard_losers(batch: pa.Table) -> pa.Table:
            larr = ray.get(losers_ref)  # broadcast once per worker
            if not len(larr):
                return batch
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~np.isin(ids, larr)))

        def dup_ids_of_group(g: pa.Table) -> pa.Table:
            if g.num_rows <= 1:
                return pa.table({"doc_id": pa.array([], pa.int64())})
            return g.select(["doc_id"])

        n_dup_ids = (
            light.select_columns(["doc_id"])
            .groupby("doc_id")
            .map_groups(dup_ids_of_group, batch_format="pyarrow")
            .count()
        )
        if n_dup_ids:
            raise ValueError(overlap_err)

        def losers_of_group(g: pa.Table) -> pa.Table:
            ids = g["doc_id"].to_numpy(zero_copy_only=False)
            if len(ids) <= 1:
                return pa.table({"doc_id": pa.array([], pa.int64())})
            keep = ids.min()
            return pa.table({
                "doc_id": pa.array(
                    sorted(int(x) for x in ids if x != keep), pa.int64()
                )
            })

        cross = (
            light.map_batches(drop_shard_losers, batch_format="pyarrow")
            .groupby("text_hash")
            .map_groups(losers_of_group, batch_format="pyarrow")
            .to_pandas()["doc_id"]
            .to_numpy()
            .astype(np.int64)
        )
        cross_losers = np.sort(cross)
    # the merged index's loser set is ALL docs present in docs/ that are
    # not indexed — per-shard losers plus cross-shard losers (the
    # invariant the update/refresh flows rely on)
    all_losers = np.unique(np.concatenate(shard_losers + [cross_losers]))
    dedup_dir = stage_dir(out_dir, "dedup")
    os.makedirs(dedup_dir, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(all_losers, pa.int64())}),
        os.path.join(dedup_dir, "losers.parquet"),
    )
    mark_complete(
        out_dir, "dedup", rows=int(len(all_losers)),
        cross_shard=int(len(cross_losers)),
        wall_s=round(time.time() - t0, 3),
    )
    metrics["n_cross_losers"] = int(len(cross_losers))

    # ---- postings: link shard posting files under the merged layout ----
    # so the merged index is refreshable/updatable exactly like a build
    # (refresh re-derives the loser set from committed docs and re-applies
    # the drop at re-encode — the linked files stay correct inputs)
    postings_dir = stage_dir(out_dir, "postings")
    for i, d in enumerate(index_dirs):
        src_map = bucket_file_map([stage_dir(d, "postings")])
        for b, files in src_map.items():
            bdir = os.path.join(postings_dir, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            for f in files:
                dst = os.path.join(bdir, f"s{i:03d}-{os.path.basename(f)}")
                if not os.path.exists(dst):
                    try:
                        os.symlink(os.path.abspath(f), dst)
                    except OSError:
                        import shutil as _sh

                        _sh.copy2(f, dst)
    if not os.path.exists(os.path.join(postings_dir, "_SUCCESS")):
        # only stamped once: a re-run merge must not bump this mtime, or
        # the segment stage's resume markers would all read as stale
        mark_complete(out_dir, "postings", rows=_parquet_rows(postings_dir),
                      merged=True)

    # ---- df + stats from combined postings, drop applied ---------------
    t0 = time.time()
    postings_roots = [postings_dir]
    buckets = bucket_file_map(postings_roots)
    if not buckets:
        raise ValueError("shard postings are not bucket-partitioned")
    drop = (frozenset(int(x) for x in cross_losers), {}, {})
    df_tbl = df_from_buckets(buckets, drop=drop)
    df_dir = stage_dir(out_dir, "df")
    os.makedirs(df_dir, exist_ok=True)
    pq.write_table(df_tbl, os.path.join(df_dir, "df.parquet"))
    n_docs = n_docs_rows - int(len(all_losers))
    total_tokens = int(pc.sum(df_tbl["ctf"]).as_py() or 0)
    avgdl = total_tokens / max(n_docs, 1)
    base = stats_list[0]
    stats = {
        "n_docs": int(n_docs),
        "total_tokens": total_tokens,
        "avgdl": avgdl,
        "n_terms": int(df_tbl.num_rows),
        "num_segments": base["num_segments"],
        "salt_buckets": base["salt_buckets"],
        "encode_buckets": base["encode_buckets"],
        "fixed_now_us": base["fixed_now_us"],
        "with_positions": bool(base.get("with_positions")),
    }
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f)
    mark_complete(
        out_dir, "df", rows=int(df_tbl.num_rows),
        wall_s=round(time.time() - t0, 3),
    )

    # ---- segments: encode straight from the combined shard buckets -----
    t0 = time.time()
    seg_root = stage_dir(out_dir, "segments")
    df_map = dict(
        zip(df_tbl["term"].to_pylist(),
            (int(x) for x in df_tbl["df"].to_pylist()))
    )
    encode_segments_partitioned(
        postings_roots,
        seg_root,
        df_map=df_map,
        n_docs=stats["n_docs"],
        avgdl=stats["avgdl"],
        num_segments=stats["num_segments"],
        drop=drop,
        resume=resume,
        markers_newer_than=max(
            (
                os.path.getmtime(
                    os.path.join(stage_dir(d, "postings"), "_SUCCESS")
                )
                for d in index_dirs
                if os.path.exists(
                    os.path.join(stage_dir(d, "postings"), "_SUCCESS")
                )
            ),
            default=-1.0,
        ),
    )
    mark_complete(
        out_dir, "segments", wall_s=round(time.time() - t0, 3),
        num_segments=stats["num_segments"], merged=True,
    )
    metrics["stats"] = stats
    metrics["wall_s"] = round(time.time() - t_start, 3)
    return metrics
