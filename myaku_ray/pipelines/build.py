"""The index-build pipeline: pages parquet -> immutable segment files.

Ray-Data-first expression of the reference build lifecycle
(myaku/runners/run_crawl.py:174-200 -> index_build.py:268-311), staged for
resumability (every stage has a _SUCCESS marker + lineage record):

1. ``docs``      read_parquet(pages, pruned columns) -> map_batches(extract)
                 -> write docs/ parquet.  Per-doc, shuffle-free.
2. ``dedup``     light (text_hash, doc_id) projection -> groupby(text_hash)
                 -> loser doc_ids parquet (winner = min doc_id; A6,
                 index_build.py:116-143).  Only 2 small columns shuffle;
                 the text/html payload never moves.
3. ``postings``  docs - losers -> TokenizeStage actor pool -> postings/
                 written hive-partitioned by encode bucket
                 (hash(term)·31+salt % B) — the write IS the (term, salt)
                 exchange; no posting row ever moves through the object
                 store after this.
4. ``stats``     per-bucket partial-df tasks + vocabulary-sized driver
                 merge -> df/ + stats.json (distributed groupby fallback
                 above the scale switch).
5. ``segments``  one raw Ray task per bucket dir: Arrow-sort, score,
                 delta+varint-encode every (term, salt) sub-list ->
                 segments/ partitioned by ``term_hash % num_segments``.
                 Salting bounds the largest sub-list at df_max / salt
                 (adaptive — SURVEY.md §4 skew), so high-DF particles
                 cannot pin one task.

Scale notes (100 TB):
- The bucket-partitioned postings write is the only exchange AND the
  resumability checkpoint; bucket and salt counts scale with the corpus
  (_auto_encode_buckets / _auto_salt_buckets).
- The df/term dictionary is a #terms-row table; at extreme vocab sizes
  swap the driver merge for the distributed groupby (scale switch).
- Loser-id broadcast assumes dup rate << corpus (2% here); the scale path
  is a hash-bucketed anti-join on doc_id.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from myaku_ray.corpus import FIXED_NOW
from myaku_ray.index.segment_build import (
    bucket_file_map,
    df_from_buckets,
    encode_segments,
    encode_segments_partitioned,
    partial_df,
)
from myaku_ray.stages.extract import make_extract_fn
from myaku_ray.stages.tokenize import TokenizeStage
from myaku_ray.state.lineage import is_complete, mark_complete, stage_dir

DEFAULT_NUM_SEGMENTS = 8
DEFAULT_SALT_BUCKETS = 4
# Postings rows per winner doc, used only to size the postings write's
# min_rows_per_file bundling (measured ~300 on the synthetic corpus; an
# over/under-estimate only shifts file counts, never correctness).
TERMS_PER_DOC_EST = 300

# Docs-input bytes above which the postings (tokenize+write) stage runs
# as multiple independently-resumable input shards.  Sized so every
# test/bench corpus here (≤ a few GB of docs) stays ONE shard — the
# single streaming pipeline — while a real 100-TB build gets shard-level
# checkpointing on its longest stage.
POSTINGS_CHUNK_TARGET_BYTES = 8 * 1024 * 1024 * 1024
# Below this many docs, exact dedup runs as a driver-side pandas groupby
# over (text_hash, doc_id) only; above it, the distributed groupby shuffle.
DEDUP_DRIVER_LIMIT = 2_000_000


def driver_loser_ids(light_t: pa.Table) -> np.ndarray:
    """Exact-dedup losers (sorted doc_ids) from a (text_hash, doc_id)
    table — driver-side kernel for corpora below DEDUP_DRIVER_LIMIT.
    Dictionary-encode the hashes once; winner per group = min doc_id =
    first row of each code run after ONE lexsort — no Python strings,
    no pandas groupby (this is driver-side fixed cost, i.e. pure Amdahl
    tax on every scaling leg).  Shared by the build dedup stage and
    index merge (cross-shard dedup)."""
    codes = (
        light_t["text_hash"]
        .combine_chunks()
        .dictionary_encode()
        .indices.to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ids = light_t["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, codes))
    c_s, i_s = codes[order], ids[order]
    first = np.empty(len(c_s), dtype=bool)
    if len(c_s):
        first[0] = True
        first[1:] = c_s[1:] != c_s[:-1]
    return np.sort(i_s[~first])


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers only (no data read)."""
    import glob as _glob

    import pyarrow.parquet as pq

    total = 0
    for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        total += pq.read_metadata(f).num_rows
    return total


def _auto_salt_buckets(n_docs: int) -> int:
    """Salt count bounding the largest posting sub-list: a particle term
    with df ≈ n_docs splits into `salt` disjoint doc_id strides, so one
    encode/query task never holds more than ~25M postings (~500 MB
    decoded) of a single term."""
    return int(max(4, n_docs // 25_000_000))


def _auto_encode_buckets(n_docs: int) -> int:
    """Bucket count targeting ~100k docs' worth of postings per bucket
    group of 64 — keeps per-bucket encode tasks roughly constant-sized as
    the corpus grows, bounded so tokenize write fan-out (input blocks ×
    buckets files) stays sane."""
    return int(min(max(64, n_docs // 6000), 4096))


# Per-worker-process cache of the sorted loser doc_id array, keyed by the
# dedup stage dir with the stage's _SUCCESS mtime in the VALUE.  Workers
# read the (small: losers only) parquet once per process instead of
# receiving it through actor constructor args — an ObjectRef in the ctor
# closure lands the args in the object store and Ray logs a
# restart-safety error for every actor (ray#53727); a path string keeps
# the serialized transform tiny and restart-safe, and the dedup dir is on
# the same shared storage the whole index build already requires.  The
# mtime check means a long-lived worker cannot serve a previous build's
# losers after the dedup stage is re-run at the same path.
_LOSER_CACHE: dict = {}


def _loser_ids_for(dedup_dir: str) -> "np.ndarray":
    marker = os.path.join(dedup_dir, "_SUCCESS")
    mtime = os.path.getmtime(marker) if os.path.exists(marker) else -1.0
    cached = _LOSER_CACHE.get(dedup_dir)
    if cached is None or cached[0] != mtime:
        import pyarrow.parquet as _pq

        tbl = _pq.read_table(dedup_dir, columns=["doc_id"])
        arr = np.sort(tbl["doc_id"].to_numpy(zero_copy_only=False))
        cached = _LOSER_CACHE[dedup_dir] = (mtime, arr)
    return cached[1]


def _clear_stage(index_dir: str, stage: str) -> None:
    """Remove partial output of an interrupted stage before re-running:
    write_parquet uses unique filenames and never deletes, so re-running
    into a half-written directory would duplicate rows."""
    import shutil

    shutil.rmtree(stage_dir(index_dir, stage), ignore_errors=True)


def ensure_docs_dedup(
    pages_path: str,
    index_dir: str,
    *,
    blog_ratings: dict[str, float] | None = None,
    fixed_now=FIXED_NOW,
    resume: bool = True,
    metrics: dict | None = None,
) -> tuple[str, str]:
    """Stages 1+2 of the build — HTML extract to ``docs/`` and exact
    dedup to ``dedup/losers`` — shared verbatim by the monolithic
    build and the sharded build (pipelines/shard.py runs them ONCE and
    routes the winner docs to shards afterwards).  Returns
    (docs_dir, dedup_dir)."""
    os.makedirs(index_dir, exist_ok=True)
    blog_ratings = blog_ratings or {}

    # ---- stage 1: docs -------------------------------------------------
    docs_dir = stage_dir(index_dir, "docs")
    if not (resume and is_complete(index_dir, "docs")):
        _clear_stage(index_dir, "docs")
        t0 = time.time()
        pages = rd.read_parquet(
            pages_path, columns=["url", "warc_ts", "html", "lang"]
        )
        extract_fn = make_extract_fn(blog_ratings, fixed_now)
        docs = pages.map_batches(
            extract_fn, batch_format="pyarrow", batch_size=256
        )
        docs.write_parquet(docs_dir)
        mark_complete(
            index_dir, "docs", rows=_parquet_rows(docs_dir),
            wall_s=round(time.time() - t0, 3),
        )
        if metrics is not None:
            metrics["docs_wall_s"] = time.time() - t0

    # ---- stage 2: exact dedup (losers) ---------------------------------
    # Scale switch: the groupby('text_hash') shuffle is the correct plan at
    # cluster scale, but for corpora whose (hash, id) columns fit on the
    # driver a local groupby computes the same deterministic winner set
    # without paying a Ray all-to-all job (~seconds of fixed overhead).
    dedup_dir = stage_dir(index_dir, "dedup")
    if not (resume and is_complete(index_dir, "dedup")):
        _clear_stage(index_dir, "dedup")
        t0 = time.time()
        n_doc_rows = _parquet_rows(docs_dir)
        if n_doc_rows <= DEDUP_DRIVER_LIMIT:
            import pyarrow.parquet as pq

            light_t = pq.read_table(docs_dir, columns=["text_hash", "doc_id"])
            loser_arr = driver_loser_ids(light_t)
            os.makedirs(dedup_dir, exist_ok=True)
            pq.write_table(
                pa.table({"doc_id": pa.array(loser_arr, pa.int64())}),
                os.path.join(dedup_dir, "losers.parquet"),
            )
        else:
            light = rd.read_parquet(docs_dir, columns=["text_hash", "doc_id"])

            def losers_of_group(g: pa.Table) -> pa.Table:
                ids = g["doc_id"].to_numpy(zero_copy_only=False)
                if len(ids) <= 1:
                    return pa.table({"doc_id": pa.array([], pa.int64())})
                keep = ids.min()  # deterministic winner: min doc_id
                return pa.table({"doc_id": pa.array(sorted(int(x) for x in ids if x != keep), pa.int64())})

            losers = light.groupby("text_hash").map_groups(
                losers_of_group, batch_format="pyarrow"
            )
            losers.write_parquet(dedup_dir)
        n_losers = _parquet_rows(dedup_dir)
        mark_complete(
            index_dir, "dedup", rows=n_losers, wall_s=round(time.time() - t0, 3)
        )
        if metrics is not None:
            metrics["dedup_losers"] = n_losers
    return docs_dir, dedup_dir


def build_index(
    pages_path: str,
    index_dir: str,
    *,
    blog_ratings: dict[str, float] | None = None,
    fixed_now=FIXED_NOW,
    num_segments: int = DEFAULT_NUM_SEGMENTS,
    salt_buckets: int | None = None,
    # encode write-partitions; None = scaled to corpus size (see
    # _auto_encode_buckets) so per-bucket encode tasks stay ~constant work
    encode_buckets: int | None = None,
    tokenize_concurrency: int | tuple | None = None,
    tokenize_batch_size: int = 128,
    resume: bool = True,
    # opt-in positional sidecar (phrase / proximity queries): postings
    # carry per-occurrence (start, len) records and segments gain a
    # pos_blob column.  The score path (blob, WAND, rank identity) is
    # byte-identical either way; positions cost ~tokenize 2x + payload.
    with_positions: bool = False,
    # tokenize+write input shards; None = auto (1 below
    # POSTINGS_CHUNK_TARGET_BYTES of docs input — every corpus in this
    # sandbox — else sized so each shard's pipeline stays bounded).
    # Shards > 1 give the most expensive stage partition-level resume:
    # an interrupted build redoes only unfinished shards.
    postings_chunks: int | None = None,
) -> dict:
    """Build (or resume building) the full index. Returns build metrics."""
    os.makedirs(index_dir, exist_ok=True)
    metrics: dict = {}
    blog_ratings = blog_ratings or {}

    docs_dir, dedup_dir = ensure_docs_dedup(
        pages_path, index_dir, blog_ratings=blog_ratings,
        fixed_now=fixed_now, resume=resume, metrics=metrics,
    )

    import pyarrow.parquet as _pq

    # ---- title-term sidecar (round-4 ask #2), OVERLAPPED -----------------
    # Depends only on the completed docs store, so it runs CONCURRENTLY
    # with the tokenize/df/segments stages as a zero-CPU Ray task that
    # drives its own (tiny — ~2% of the tokenize work) Ray Data job and
    # fills the main pipeline's scheduling gaps: measured ~0 wall added
    # vs ~3-6 s when run serially after the build.  A separate task
    # PROCESS, not a driver thread: concurrent rd.read_parquet path
    # resolution from two driver threads races on the fsspec http
    # lazy-import (no aiohttp in this env) and crashes the build.
    # Resume check is the sidecar's own fingerprint-pinned meta: docs
    # rewritten -> fingerprint mismatch -> rebuild; unchanged -> skip.
    # Awaited (errors re-raised) before build_index returns.
    from myaku_ray.index.title_sidecar import (
        build_title_sidecar, title_sidecar_valid,
    )

    _side_future = None
    _side_t0 = time.time()
    if not (resume and title_sidecar_valid(index_dir)):
        _side_future = (
            ray.remote(num_cpus=0)(build_title_sidecar)
            .remote(index_dir)
        )

    n_losers = _pq.read_table(dedup_dir, columns=["doc_id"]).num_rows

    n_doc_count = _parquet_rows(docs_dir)
    if salt_buckets is None:
        salt_buckets = _auto_salt_buckets(n_doc_count)
    if encode_buckets is None:
        encode_buckets = _auto_encode_buckets(n_doc_count)

    # ---- stage 3: tokenize -> postings ---------------------------------
    postings_dir = stage_dir(index_dir, "postings")
    if not (resume and is_complete(index_dir, "postings")):
        if not resume:
            _clear_stage(index_dir, "postings")
        t0 = time.time()

        _dedup_dir = dedup_dir
        _have_losers = n_losers > 0

        def drop_losers(batch: pa.Table) -> pa.Table:
            if not _have_losers:
                return batch
            larr = _loser_ids_for(_dedup_dir)  # sorted loser doc_ids
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~np.isin(ids, larr)))

        avail = int(ray.cluster_resources().get("CPU", 8))
        if tokenize_concurrency is None:
            # default: FIXED pool sized to the cluster — autoscaling pools
            # ((1, N)) ramp too slowly for a stage this short, leaving most
            # CPUs idle; tokenizer init is ~60ms so full spin-up is cheap
            tokenize_concurrency = max(avail - 2, 1)

        # Close over the bucket params instead of fn_constructor_kwargs so
        # the actor ctor carries no user args at all.  (Ray still logs the
        # ray#53727 restart-safety error for EVERY Ray Data actor pool in
        # this version — Ray Data itself ships the MapTransformer through
        # the object store — so bench.py silences that known line at the
        # glog level instead.)
        _salt, _enc, _wp = salt_buckets, encode_buckets, with_positions

        class _PinnedTokenizeStage(TokenizeStage):
            def __init__(self):
                super().__init__(
                    salt_buckets=_salt, encode_buckets=_enc,
                    with_positions=_wp,
                )

        # Hive-partition by encode bucket: the write IS the (term, salt)
        # shuffle — segment encode later reads one bucket dir per task.
        # Files per bucket are BOUNDED at ~write_tasks regardless of corpus
        # size: min_rows_per_file bundles map-output blocks into at most
        # ~est_rows/min_rows write tasks, and each task writes one file per
        # bucket it sees.  Without this, files = blocks x buckets grows
        # linearly with the corpus and the 1M+ build goes superlinear on
        # file creation (round-2 finding).
        est_rows = max(
            (n_doc_count - n_losers) * TERMS_PER_DOC_EST, 1
        )
        write_tasks = max(64, 2 * avail)
        min_rows = max(est_rows // write_tasks, 50_000)

        # Input-shard chunking (partition-level resume for the most
        # expensive stage): above POSTINGS_CHUNK_TARGET_BYTES of docs
        # input, the stage runs as one bounded pipeline per group of
        # docs files, each writing shard-{k}/bucket=B/... with a durable
        # marker written after the shard completes — an interrupted
        # build redoes only unfinished shards.  Every downstream reader
        # (df, segment encode, refresh, compaction) already discovers
        # postings via a recursive ``bucket=`` glob, so the shard layer
        # is invisible to them.  Below the threshold (every test/bench
        # corpus here) it is ONE shard — the single streaming pipeline,
        # unchanged.
        import glob as _glob
        import shutil as _shutil

        doc_files = sorted(
            _glob.glob(os.path.join(docs_dir, "**", "*.parquet"),
                       recursive=True)
        )
        if postings_chunks is None:
            total_bytes = sum(os.path.getsize(f) for f in doc_files)
            postings_chunks = max(
                1, -(-total_bytes // POSTINGS_CHUNK_TARGET_BYTES)
            )
        n_chunks = min(max(int(postings_chunks), 1), len(doc_files) or 1)
        if n_chunks == 1:
            # single streaming pipeline (every sub-100-GB corpus): no
            # marker granularity below the stage, so a partial write is
            # cleared wholesale as before
            _clear_stage(index_dir, "postings")
        else:
            # drop layout remnants a resumed run must not double-count:
            # top-level bucket= dirs from a previous single-shard attempt
            # and shard dirs outside the current shard range
            expected = {f"shard-{k:05d}" for k in range(n_chunks)}
            for p in _glob.glob(os.path.join(postings_dir, "*")):
                base = os.path.basename(p)
                if base.startswith("bucket=") or (
                    base.startswith("shard-") and base not in expected
                ):
                    _shutil.rmtree(p, ignore_errors=True)
            # markers OUTSIDE the current shard range must go with their
            # dirs: a count decrease followed by a later resume back at
            # the old count would otherwise re-validate the out-of-range
            # marker (fresh mtime AND matching old-layout sig) and skip a
            # shard whose output dir was deleted above — silent data loss
            for m in _glob.glob(
                os.path.join(postings_dir, "_shard_done", "*.json")
            ):
                if os.path.basename(m)[: -len(".json")] not in expected:
                    os.remove(m)
        chunk_done = os.path.join(postings_dir, "_shard_done")
        os.makedirs(chunk_done, exist_ok=True)
        docs_success = os.path.join(docs_dir, "_SUCCESS")
        dedup_success = os.path.join(dedup_dir, "_SUCCESS")
        inputs_mtime = max(
            os.path.getmtime(p)
            for p in (docs_success, dedup_success)
            if os.path.exists(p)
        )
        # A shard's CONTENT is doc_files[k::n_chunks] — a marker is only
        # valid for the exact layout it was written under.  Resuming
        # with a different shard count (or after the docs file list
        # changed without a docs re-run) must re-tokenize everything,
        # not silently skip shards holding a different file subset.
        import hashlib as _hashlib

        layout_sig = _hashlib.blake2b(
            ("\n".join(doc_files) + f"|{n_chunks}").encode(),
            digest_size=8,
        ).hexdigest()
        for k in range(n_chunks):
            shard_files = doc_files[k::n_chunks]
            shard_dir = (
                postings_dir if n_chunks == 1
                else os.path.join(postings_dir, f"shard-{k:05d}")
            )
            marker = os.path.join(chunk_done, f"shard-{k:05d}.json")
            if (
                resume
                and n_chunks > 1
                and os.path.exists(marker)
                and os.path.getmtime(marker) >= inputs_mtime
            ):
                with open(marker) as f:
                    m = json.load(f)
                if m.get("layout_sig") == layout_sig:
                    continue
                os.remove(marker)  # written under a different layout
            if n_chunks > 1:
                _shutil.rmtree(shard_dir, ignore_errors=True)
            docs = rd.read_parquet(
                shard_files,
                columns=["doc_id", "text", "quality_score", "warc_ts"],
            )
            winners = docs.map_batches(drop_losers, batch_format="pyarrow")
            postings = winners.map_batches(
                _PinnedTokenizeStage,
                batch_format="pyarrow",
                batch_size=tokenize_batch_size,
                concurrency=tokenize_concurrency,
                num_cpus=1,
            )
            postings.write_parquet(
                shard_dir,
                partition_cols=["bucket"],
                compression="lz4",
                min_rows_per_file=max(min_rows // n_chunks, 50_000),
            )
            if n_chunks > 1:
                tmp = marker + ".tmp"
                with open(tmp, "w") as f:
                    f.write(json.dumps(
                        {"files": len(shard_files),
                         "layout_sig": layout_sig}
                    ))
                os.replace(tmp, marker)
        mark_complete(
            index_dir, "postings", rows=_parquet_rows(postings_dir),
            wall_s=round(time.time() - t0, 3), shards=n_chunks,
        )
        metrics["postings_wall_s"] = time.time() - t0

    # ---- stage 4: df + corpus stats (map-side combined) ----------------
    # Pre-aggregate (term -> partial df/tf) inside map_batches so the
    # groupby shuffles ~|vocab| rows per batch instead of every posting.
    stats_path = os.path.join(index_dir, "stats.json")
    df_dir = stage_dir(index_dir, "df")
    if not (resume and is_complete(index_dir, "df")):
        _clear_stage(index_dir, "df")
        t0 = time.time()
        import pyarrow.parquet as pq

        buckets = bucket_file_map([postings_dir])
        if buckets:
            # one partial-df task per bucket + a vocabulary-sized driver
            # merge — no read of 1000s of tiny hive files through a
            # Dataset, no posting-row shuffle
            df_tbl = df_from_buckets(buckets)
            os.makedirs(df_dir, exist_ok=True)
            pq.write_table(df_tbl, os.path.join(df_dir, "df.parquet"))
        else:
            postings = rd.read_parquet(postings_dir, columns=["term", "tf"])
            partials = postings.map_batches(
                partial_df, batch_format="pyarrow", batch_size=65536
            )
            (
                partials.groupby("term")
                .aggregate(
                    Sum("pdf_count", alias_name="df"), Sum("ptf", alias_name="ctf")
                )
                .write_parquet(df_dir)
            )

        # n_docs = winners; doclen sum = sum of tf (every posting row carries
        # its doc's tf contribution exactly once)
        n_docs = _parquet_rows(docs_dir) - n_losers
        df_pdf = rd.read_parquet(df_dir).to_pandas()
        total_tokens = int(df_pdf["ctf"].sum())
        avgdl = total_tokens / max(n_docs, 1)
        stats = {
            "n_docs": int(n_docs),
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "n_terms": int(len(df_pdf)),
            "num_segments": num_segments,
            "salt_buckets": salt_buckets,
            "encode_buckets": encode_buckets,
            "fixed_now_us": int(fixed_now.timestamp() * 1_000_000),
            "with_positions": bool(with_positions),
        }
        with open(stats_path, "w") as f:
            json.dump(stats, f)
        mark_complete(
            index_dir, "df", rows=len(df_pdf), wall_s=round(time.time() - t0, 3)
        )

    with open(stats_path) as f:
        stats = json.load(f)

    # ---- stage 5: segments ---------------------------------------------
    seg_root = stage_dir(index_dir, "segments")
    if not (resume and is_complete(index_dir, "segments")):
        if not resume:
            _clear_stage(index_dir, "segments")
        t0 = time.time()
        df_pdf = rd.read_parquet(df_dir).to_pandas()
        df_map = dict(zip(df_pdf["term"], df_pdf["df"].astype(int)))

        # Partition-level resume: an interrupted segments stage redoes
        # only (bucket, part) encode tasks without a durable _done
        # marker; markers older than the postings stage's completion
        # are stale (their input was replaced) and are ignored.
        post_success = os.path.join(
            stage_dir(index_dir, "postings"), "_SUCCESS"
        )
        markers_newer_than = (
            os.path.getmtime(post_success)
            if os.path.exists(post_success)
            else -1.0
        )
        if not encode_segments_partitioned(
            [postings_dir],
            seg_root,
            df_map=df_map,
            n_docs=stats["n_docs"],
            avgdl=stats["avgdl"],
            num_segments=num_segments,
            resume=resume,
            markers_newer_than=markers_newer_than,
        ):
            # postings not bucket-partitioned (legacy layout): shuffle
            # path — clear any partial segment output first
            # (write_parquet uses unique filenames and never deletes, so
            # re-running into a half-written dir would duplicate rows)
            _clear_stage(index_dir, "segments")
            postings = rd.read_parquet(
                postings_dir,
                columns=["term", "doc_id", "tf", "doclen", "quality", "warc_us"],
            )
            encode_segments(
                postings,
                seg_root,
                df_map=df_map,
                n_docs=stats["n_docs"],
                avgdl=stats["avgdl"],
                num_segments=num_segments,
                salt_buckets=salt_buckets,
            )
        mark_complete(
            index_dir, "segments", wall_s=round(time.time() - t0, 3),
            num_segments=num_segments, salt_buckets=salt_buckets,
        )
        metrics["segments_wall_s"] = time.time() - t0

    # ---- await the overlapped title-sidecar task -----------------------
    if _side_future is not None:
        side_meta = ray.get(_side_future)
        metrics["title_sidecar_wall_s"] = time.time() - _side_t0
        metrics["title_sidecar_stage_s"] = side_meta.get("wall_s")
        metrics["title_sidecar_rows"] = side_meta["n_rows"]

    metrics["stats"] = stats
    return metrics
