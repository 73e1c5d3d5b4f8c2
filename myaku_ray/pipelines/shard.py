"""Document-sharded index build with a global-statistics exchange.

At the north-star's 10^12-document scale one index directory is not
servable from one node: the standard serving layout (Lucene/
Elasticsearch shards, Vespa content groups) is N document-routed
shards, each a complete self-contained index over its slice of the
corpus.  BM25 bakes collection statistics (df, n_docs, avgdl) into
every posting's quantized contribution at encode time
(index/segment_build.py), so per-shard-local statistics would make
scores — and therefore merged rankings — drift from the monolithic
index.  The fix is the classic distributed-IDF exchange (Lucene's
``dfs_query_then_fetch``): compute the statistics GLOBALLY, replicate
them to every shard, and encode each shard with them.  Rankings
merged across shards are then bit-identical to a single index — the
driver gates ``pages_sharded_search`` against the SAME stored golden
as ``pages_search_topk``, and pytest compares both engines
hit-by-hit.

Build plan (all stages marker-resumable like pipelines/build.py):

1. ``docs`` + ``dedup`` run ONCE into ``out_root/_shared`` (exact
   dedup is corpus-global curation — ``build.ensure_docs_dedup``,
   shared verbatim with the monolithic build); shards stay disjoint
   because routing happens after the winner set is fixed.
2. ``postings``: ONE tokenize pass; the parquet write is
   hive-partitioned by ``(shard, bucket)`` — the write IS both the
   document routing (``doc_id % n_shards``; doc_id is a url hash, so
   shards are balanced) and the (term, salt) exchange.  No posting
   row moves twice, and no all-to-all is added vs the monolithic
   build.
3. ``df``: per-bucket partial df tasks over ALL shards' postings
   merged once on the driver (``df_from_buckets`` — the vocab-sized
   global-IDF all-reduce), then the df table + stats.json REPLICATED
   into every shard dir (what a real engine broadcasts to its query
   nodes; suggest/prefix/wildcard read it locally).
4. ``segments``: per-shard partitioned encode with the global stats.
   Each shard dir is a complete index directory the ordinary
   ``Searcher`` opens unmodified (its ``docs`` is a symlink into
   ``_shared`` — the shared document-store analog; a real deployment
   would either copy the shard's slice or point at a doc service).

Serving: ``index/sharded.ShardedSearcher`` fans a query to per-shard
Searchers and merges on the total rank key.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from myaku_ray.corpus import FIXED_NOW
from myaku_ray.index.segment_build import (
    bucket_file_map,
    df_from_buckets,
    encode_segments_partitioned,
)
from myaku_ray.pipelines.build import (
    DEFAULT_NUM_SEGMENTS,
    TERMS_PER_DOC_EST,
    _auto_encode_buckets,
    _auto_salt_buckets,
    _clear_stage,
    _loser_ids_for,
    _parquet_rows,
    ensure_docs_dedup,
)
from myaku_ray.stages.tokenize import TokenizeStage
from myaku_ray.state.lineage import (
    append_lineage,
    is_complete,
    mark_complete,
    stage_dir,
)


def shard_dirs_of(out_root: str, n_shards: int) -> list[str]:
    """The per-shard index directories of a sharded build."""
    return [
        os.path.join(out_root, f"shard-{i:05d}") for i in range(n_shards)
    ]


def _ensure_state_links(out_root: str) -> None:
    """Symlink ``out_root/docs`` and ``out_root/dedup`` to the shared
    stage dirs so pipelines/update.py's state derivations — committed doc
    versions, tokenized set, delta counters — work on the sharded root
    unchanged (they resolve ``stage_dir(index_dir, 'docs'|'dedup')``)."""
    for stage in ("docs", "dedup"):
        target = os.path.join(out_root, "_shared", stage)
        link = os.path.join(out_root, stage)
        if os.path.isdir(target) and not os.path.lexists(link):
            os.symlink(
                os.path.relpath(target, out_root), link,
                target_is_directory=True,
            )


def build_sharded_index(
    pages_path: str,
    out_root: str,
    n_shards: int = 2,
    *,
    blog_ratings: dict[str, float] | None = None,
    fixed_now=FIXED_NOW,
    num_segments: int = DEFAULT_NUM_SEGMENTS,
    with_positions: bool = False,
    tokenize_batch_size: int = 128,
    resume: bool = True,
) -> dict:
    """Build (or resume) an ``n_shards``-way document-sharded index under
    ``out_root``.  Returns metrics incl. ``shard_dirs``."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    os.makedirs(out_root, exist_ok=True)
    metrics: dict = {"n_shards": n_shards}
    shards = shard_dirs_of(out_root, n_shards)

    # ---- stages 1+2 (shared): extract + global exact dedup -------------
    shared = os.path.join(out_root, "_shared")
    docs_dir, dedup_dir = ensure_docs_dedup(
        pages_path, shared, blog_ratings=blog_ratings or {},
        fixed_now=fixed_now, resume=resume, metrics=metrics,
    )
    _ensure_state_links(out_root)
    import pyarrow.parquet as pq

    n_losers = pq.read_table(dedup_dir, columns=["doc_id"]).num_rows
    n_doc_count = _parquet_rows(docs_dir)
    n_docs = n_doc_count - n_losers
    # bucket/salt sizing from GLOBAL corpus size, like the monolithic
    # build — per-bucket encode work then stays ~constant per shard too
    salt_buckets = _auto_salt_buckets(n_doc_count)
    encode_buckets = _auto_encode_buckets(n_doc_count)

    # ---- stage 3: tokenize once, route by (shard, bucket) --------------
    # A shard-layout change invalidates the whole stage (the marker
    # records n_shards), mirroring the monolithic build's layout_sig
    # rule: resuming under a different shard count must re-route.
    postings_root = os.path.join(out_root, "postings")
    marker_ok = False
    if resume and is_complete(out_root, "postings"):
        with open(os.path.join(postings_root, "_SUCCESS")) as f:
            marker_ok = json.load(f).get("n_shards") == n_shards
    if not marker_ok:
        _clear_stage(out_root, "postings")
        t0 = time.time()
        _have_losers = n_losers > 0
        _dedup = dedup_dir

        def drop_losers(batch: pa.Table) -> pa.Table:
            if not _have_losers:
                return batch
            larr = _loser_ids_for(_dedup)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~np.isin(ids, larr)))

        _n = n_shards

        def add_shard(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "shard", pa.array((ids % _n).astype(np.int64))
            )

        avail = int(ray.cluster_resources().get("CPU", 8))
        _salt, _enc, _wp = salt_buckets, encode_buckets, with_positions

        class _PinnedTokenizeStage(TokenizeStage):
            def __init__(self):
                super().__init__(
                    salt_buckets=_salt, encode_buckets=_enc,
                    with_positions=_wp,
                )

        docs = rd.read_parquet(
            docs_dir, columns=["doc_id", "text", "quality_score", "warc_ts"]
        )
        postings = (
            docs.map_batches(drop_losers, batch_format="pyarrow")
            .map_batches(
                _PinnedTokenizeStage,
                batch_format="pyarrow",
                batch_size=tokenize_batch_size,
                concurrency=max(avail - 2, 1),
                num_cpus=1,
            )
            .map_batches(add_shard, batch_format="pyarrow")
        )
        # files per (shard, bucket) bounded at ~write_tasks, same rule
        # as the monolithic build (round-2 finding)
        est_rows = max(n_docs * TERMS_PER_DOC_EST, 1)
        min_rows = max(est_rows // max(64, 2 * avail), 50_000)
        postings.write_parquet(
            postings_root,
            partition_cols=["shard", "bucket"],
            compression="lz4",
            min_rows_per_file=min_rows,
        )
        mark_complete(
            out_root, "postings", rows=_parquet_rows(postings_root),
            wall_s=round(time.time() - t0, 3), n_shards=n_shards,
        )
        metrics["postings_wall_s"] = time.time() - t0

    # ---- stage 4: GLOBAL df + stats, replicated to every shard ---------
    if not (resume and is_complete(out_root, "df")):
        _clear_stage(out_root, "df")
        t0 = time.time()
        buckets = bucket_file_map([postings_root])
        df_tbl = df_from_buckets(buckets)
        total_tokens = int(
            df_tbl["ctf"].to_numpy(zero_copy_only=False).sum()
        ) if df_tbl.num_rows else 0
        avgdl = total_tokens / max(n_docs, 1)
        stats = {
            "n_docs": int(n_docs),
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "n_terms": int(df_tbl.num_rows),
            "num_segments": num_segments,
            "salt_buckets": salt_buckets,
            "encode_buckets": encode_buckets,
            "fixed_now_us": int(fixed_now.timestamp() * 1_000_000),
            "with_positions": bool(with_positions),
            "n_shards": n_shards,
            "global_stats": True,  # df/n_docs/avgdl are corpus-global
        }
        # the df stage dir under out_root is the single source of truth;
        # shards get a replica (plus stats.json and the shared-docs link)
        df_stage = stage_dir(out_root, "df")
        os.makedirs(df_stage, exist_ok=True)
        pq.write_table(df_tbl, os.path.join(df_stage, "df.parquet"))
        for i, sdir in enumerate(shards):
            os.makedirs(sdir, exist_ok=True)
            sdf = os.path.join(sdir, "df")
            os.makedirs(sdf, exist_ok=True)
            pq.write_table(df_tbl, os.path.join(sdf, "df.parquet"))
            with open(os.path.join(sdir, "stats.json"), "w") as f:
                json.dump({**stats, "shard": i}, f)
            link = os.path.join(sdir, "docs")
            if not os.path.lexists(link):
                os.symlink(
                    os.path.relpath(docs_dir, sdir), link,
                    target_is_directory=True,
                )
        mark_complete(
            out_root, "df", rows=int(df_tbl.num_rows),
            wall_s=round(time.time() - t0, 3),
        )
        metrics["df_wall_s"] = time.time() - t0

    # ---- stage 5: per-shard segment encode with the global stats -------
    df_stage = stage_dir(out_root, "df")
    with open(os.path.join(shards[0], "stats.json")) as f:
        stats = json.load(f)
    df_pdf = pq.read_table(
        os.path.join(df_stage, "df.parquet"), columns=["term", "df"]
    )
    df_map = dict(
        zip(
            df_pdf["term"].to_pylist(),
            df_pdf["df"].to_numpy(zero_copy_only=False).astype(int),
        )
    )
    post_success = os.path.join(stage_dir(out_root, "postings"), "_SUCCESS")
    markers_newer_than = (
        os.path.getmtime(post_success)
        if os.path.exists(post_success)
        else -1.0
    )
    for i, sdir in enumerate(shards):
        if resume and is_complete(sdir, "segments"):
            continue
        t0 = time.time()
        shard_postings = os.path.join(postings_root, f"shard={i}")
        if not os.path.isdir(shard_postings):
            # degenerate: no winner doc routed here (tiny corpus) — a
            # complete-but-empty shard still serves (zero hits)
            os.makedirs(stage_dir(sdir, "segments"), exist_ok=True)
            mark_complete(sdir, "segments", wall_s=0.0, shard=i, empty=True)
            continue
        ok = encode_segments_partitioned(
            [shard_postings],
            stage_dir(sdir, "segments"),
            df_map=df_map,
            n_docs=stats["n_docs"],
            avgdl=stats["avgdl"],
            num_segments=num_segments,
            resume=resume,
            markers_newer_than=markers_newer_than,
        )
        if not ok:
            raise RuntimeError(
                f"shard {i}: postings at {shard_postings} are not "
                "bucket-partitioned — sharded builds always route "
                "through the hive write"
            )
        mark_complete(
            sdir, "segments", wall_s=round(time.time() - t0, 3),
            num_segments=num_segments, shard=i,
        )

    metrics["stats"] = stats
    metrics["shard_dirs"] = shards
    return metrics


# ---------------------------------------------------------------------------
# incremental update + refresh on the sharded layout
# ---------------------------------------------------------------------------


def _sharded_dirs(out_root: str) -> list[str]:
    """Existing shard dirs of a built sharded index, in shard order."""
    import glob

    dirs = sorted(glob.glob(os.path.join(out_root, "shard-*")))
    if not dirs:
        raise FileNotFoundError(f"no shard dirs under {out_root}")
    return dirs


def refresh_sharded_index(out_root: str, *, recompute_df: bool = True) -> dict:
    """Recompute GLOBAL df / corpus stats and re-encode every shard's
    segments from committed state — the sharded twin of
    ``update.refresh_index``.  The statistics exchange is identical to
    the base build's: one vocab-sized all-reduce over ALL shards'
    postings (base + committed deltas, tombstones dropped), the result
    replicated into every shard dir, then per-shard partitioned encodes
    with the global stats — so the refreshed federation stays
    bit-identical to a refreshed monolithic index over the same corpus
    and update history.

    Per-shard encodes only read that shard's ``shard=i`` posting
    partitions; the doc-routed hive write means refresh adds no new
    exchange either.  On a real cluster each shard's encode runs where
    its data lives and only the df table (vocab-sized) is broadcast."""
    import glob

    import pyarrow.parquet as pq

    from myaku_ray.pipelines.update import (
        _atomic_write_json,
        _clean_partial_deltas,
        _derive_refresh_state,
        _max_committed_delta_id,
        save_losers,
    )

    t0 = time.time()
    _finish_sharded_compaction(out_root)
    shards = _sharded_dirs(out_root)
    _ensure_state_links(out_root)
    _clean_partial_deltas(out_root)
    with open(os.path.join(shards[0], "stats.json")) as f:
        prev_stats = json.load(f)
    num_segments = prev_stats["num_segments"]

    supersede, losers, deleted, overrides, n_docs = _derive_refresh_state(
        out_root
    )
    save_losers(out_root, losers)
    drop_ids = frozenset(losers | deleted)

    postings_root = stage_dir(out_root, "postings")
    df_stage = stage_dir(out_root, "df")
    import shutil

    if recompute_df:
        shutil.rmtree(df_stage, ignore_errors=True)
        buckets = bucket_file_map([postings_root])
        # quality overrides don't change tf/df — same rule as the
        # monolithic refresh's df recompute
        df_tbl = df_from_buckets(buckets, drop=(drop_ids, supersede, {}))
    else:
        # quality-only change (rescore): tf/df/doclen untouched — reuse
        # the existing global df table, skip the vocab all-reduce
        df_tbl = pq.read_table(os.path.join(df_stage, "df.parquet"))
    total_tokens = (
        int(df_tbl["ctf"].to_numpy(zero_copy_only=False).sum())
        if df_tbl.num_rows
        else 0
    )
    avgdl = total_tokens / max(n_docs, 1)
    stats = {
        **prev_stats,
        "n_docs": int(n_docs),
        "total_tokens": total_tokens,
        "avgdl": avgdl,
        "n_terms": int(df_tbl.num_rows),
    }
    stats.pop("refreshed_thru_delta", None)
    os.makedirs(df_stage, exist_ok=True)
    pq.write_table(df_tbl, os.path.join(df_stage, "df.parquet"))
    for i, sdir in enumerate(shards):
        sdf = os.path.join(sdir, "df")
        shutil.rmtree(sdf, ignore_errors=True)
        os.makedirs(sdf, exist_ok=True)
        pq.write_table(df_tbl, os.path.join(sdf, "df.parquet"))
        _atomic_write_json(
            os.path.join(sdir, "stats.json"), {**stats, "shard": i}
        )
    mark_complete(out_root, "df", rows=int(df_tbl.num_rows), refreshed=True)

    df_map = dict(
        zip(
            df_tbl["term"].to_pylist(),
            df_tbl["df"].to_numpy(zero_copy_only=False).astype(int),
        )
    )
    drop = (drop_ids, supersede, overrides)
    for i, sdir in enumerate(shards):
        seg_root = stage_dir(sdir, "segments")
        shutil.rmtree(seg_root, ignore_errors=True)
        sources = [os.path.join(postings_root, f"shard={i}")]
        for d in sorted(glob.glob(os.path.join(postings_root, "delta-*"))):
            if os.path.exists(os.path.join(d, "_DELTA_DONE")):
                sources.append(os.path.join(d, f"shard={i}"))
        sources = [p for p in sources if os.path.isdir(p)]
        if not sources:
            os.makedirs(seg_root, exist_ok=True)
            mark_complete(sdir, "segments", refreshed=True, shard=i, empty=True)
            continue
        if not encode_segments_partitioned(
            sources,
            seg_root,
            df_map=df_map,
            n_docs=stats["n_docs"],
            avgdl=stats["avgdl"],
            num_segments=num_segments,
            drop=drop,
        ):
            raise RuntimeError(
                f"shard {i}: postings under {sources} are not "
                "bucket-partitioned"
            )
        mark_complete(sdir, "segments", refreshed=True, shard=i)

    # the refresh watermark lands LAST (per shard), so a crash anywhere
    # above leaves it behind the committed-delta max and the next update
    # cannot fast-path past a pending refresh
    stats["refreshed_thru_delta"] = _max_committed_delta_id(out_root)
    for i, sdir in enumerate(shards):
        _atomic_write_json(
            os.path.join(sdir, "stats.json"), {**stats, "shard": i}
        )
    return {"refresh_wall_s": round(time.time() - t0, 3), "stats": stats}


def update_sharded_index(
    pages_path: str,
    out_root: str,
    *,
    blog_ratings: dict[str, float] | None = None,
    fixed_now=FIXED_NOW,
    tokenize_concurrency: int | tuple | None = (1, 8),
    tokenize_batch_size: int = 128,
) -> dict:
    """Incrementally index new/updated pages into a sharded layout.

    The ingest phase — watermark anti-join, delta extraction, crawl-skip
    bookkeeping, corpus-global dedup recompute, need-set derivation — is
    ``update._prepare_update`` VERBATIM (it runs against the shared docs
    state via the ``out_root/docs`` symlink).  Only the delta tokenize
    write differs: rows route through the same hive ``(shard, bucket)``
    partitioned write as the base sharded build, so the update adds no
    exchange the monolithic update doesn't have.  The refresh then
    re-runs the global-stats exchange and per-shard encodes
    (``refresh_sharded_index``), keeping the federation bit-identical to
    a monolithic index updated with the same batch — and therefore to a
    from-scratch build over the union corpus (the monolithic update's
    own tested guarantee)."""
    import numpy as _np
    import ray.data as _rd

    from myaku_ray.pipelines.update import (
        _make_keep_need,
        _mark_delta_done,
        _max_committed_delta_id,
        _prepare_update,
        _write_tokenized_shard,
    )

    t_start = time.time()
    blog_ratings = blog_ratings or {}
    _finish_sharded_compaction(out_root)
    shards = _sharded_dirs(out_root)
    _ensure_state_links(out_root)
    with open(os.path.join(shards[0], "stats.json")) as f:
        cur_stats = json.load(f)
    n_shards = int(cur_stats["n_shards"])

    prep = _prepare_update(pages_path, out_root, blog_ratings, fixed_now)
    k, need = prep["k"], prep["need"]
    n_new = prep["n_new"]
    metrics = prep["metrics"]
    metrics["n_shards"] = n_shards

    if need:
        docs_all = _rd.read_parquet(
            stage_dir(out_root, "docs"),
            columns=["doc_id", "text", "quality_score", "warc_ts"],
        )
        postings_delta_dir = os.path.join(
            stage_dir(out_root, "postings"), f"delta-{k}"
        )

        def add_shard(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "shard", pa.array((ids % n_shards).astype(_np.int64))
            )

        (
            docs_all.map_batches(_make_keep_need(need), batch_format="pyarrow")
            .map_batches(
                TokenizeStage,
                batch_format="pyarrow",
                batch_size=tokenize_batch_size,
                concurrency=tokenize_concurrency,
                num_cpus=1,
                fn_constructor_kwargs={
                    "salt_buckets": cur_stats["salt_buckets"],
                    "encode_buckets": cur_stats.get("encode_buckets", 64),
                    "with_positions": cur_stats.get("with_positions", False),
                },
            )
            .map_batches(add_shard, batch_format="pyarrow")
            .write_parquet(
                postings_delta_dir,
                partition_cols=["shard", "bucket"],
                compression="lz4",
            )
        )
        _write_tokenized_shard(postings_delta_dir, need)
        _mark_delta_done(prep["docs_delta_dir"], postings_delta_dir)
    elif n_new > 0:
        _mark_delta_done(prep["docs_delta_dir"])

    append_lineage(
        out_root, stage=f"update-{k}", n_fresh=n_new,
        n_tokenized=len(need), n_losers=len(prep["losers"]),
        sharded=True, wall_s=round(time.time() - t_start, 3),
    )

    if (
        n_new == 0
        and not need
        and prep["losers"] == prep["prev_losers"]
        and cur_stats.get("refreshed_thru_delta", 0)
        >= _max_committed_delta_id(out_root)
    ):
        metrics["refreshed"] = False
        metrics["update_wall_s"] = round(time.time() - t_start, 3)
        return metrics
    metrics.update(refresh_sharded_index(out_root))
    metrics["refreshed"] = True
    metrics["update_wall_s"] = round(time.time() - t_start, 3)
    return metrics


# ---------------------------------------------------------------------------
# resharding (change n_shards WITHOUT re-tokenizing)
# ---------------------------------------------------------------------------


def reshard_index(out_root: str, new_root: str, new_n_shards: int) -> dict:
    """Re-route an existing sharded index to ``new_n_shards`` document
    shards — the capacity-change operation (Elasticsearch shrink/split,
    Vespa redistribution) — WITHOUT re-running tokenization, the build's
    dominant cost.

    Posting rows already carry everything encode needs (term, doc_id,
    tf, doclen, quality, warc_us [, positions]), and both the bucket key
    (term hash) and the GLOBAL collection statistics are routing-
    invariant, so resharding is: fold committed state (compact_index's
    drop rules — superseded versions out, loser/deleted tombstones out
    of postings, docs keep the latest version of every doc as the
    re-crawl watermark), rewrite postings hive-partitioned by the new
    ``doc_id % new_n`` in one per-bucket pass, then per-shard encodes
    with the unchanged global stats.  The new root is a complete,
    UPDATABLE sharded tree (state records copied; no deltas — they were
    folded), and its federation is bit-identical to the source's.

    Writes into a fresh ``new_root`` and commits with a final marker
    (``reshard.json``): a crashed reshard leaves the source untouched —
    delete the partial destination and re-run.  At scale only rows whose
    shard assignment changes NEED to move; this implementation rewrites
    all posting rows (one sequential pass, no tokenize) for simplicity —
    the fold has to touch every row anyway."""
    import glob
    import shutil

    import pyarrow.parquet as pq

    from myaku_ray.pipelines.update import (
        _atomic_write_json,
        _clean_partial_deltas,
        _committed_doc_files,
        _derive_refresh_state,
        _sorted_lookup_pair,
    )

    if new_n_shards < 1:
        raise ValueError("new_n_shards must be >= 1")
    t0 = time.time()
    _finish_sharded_compaction(out_root)
    src_shards = _sharded_dirs(out_root)
    _ensure_state_links(out_root)
    _clean_partial_deltas(out_root)
    with open(os.path.join(src_shards[0], "stats.json")) as f:
        src_stats = json.load(f)
    if os.path.exists(os.path.join(new_root, "reshard.json")):
        raise FileExistsError(f"{new_root} already holds a completed reshard")
    shutil.rmtree(new_root, ignore_errors=True)
    os.makedirs(new_root)

    supersede, losers, deleted, _overrides, n_docs = _derive_refresh_state(
        out_root
    )

    # ---- docs fold: latest committed versions (incl. losers/deleted —
    # their rows are the re-crawl watermark), streamed, no shuffle -------
    new_shared = os.path.join(new_root, "_shared")
    docs_dst = stage_dir(new_shared, "docs")
    files = _committed_doc_files(out_root)
    docs_ds = rd.read_parquet(files)
    if supersede:
        sup_lookup = ray.put(_sorted_lookup_pair(supersede))

        def drop_old_versions(batch: pa.Table) -> pa.Table:
            sk, sv = ray.get(sup_lookup)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            warcs = batch["warc_ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            pos = np.minimum(np.searchsorted(sk, ids), len(sk) - 1)
            hit = sk[pos] == ids
            return batch.filter(pa.array(~(hit & (warcs < sv[pos]))))

        docs_ds = docs_ds.map_batches(drop_old_versions, batch_format="pyarrow")
    docs_ds.write_parquet(docs_dst)
    mark_complete(new_shared, "docs", resharded_from=out_root)

    dedup_dst = stage_dir(new_shared, "dedup")
    os.makedirs(dedup_dst, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(losers), pa.int64())}),
        os.path.join(dedup_dst, "losers.parquet"),
    )
    mark_complete(new_shared, "dedup", rows=len(losers))
    _ensure_state_links(new_root)

    # versioned state records stay derived-valid against the folded docs
    for name in ("deleted.parquet", "quality_overrides.parquet",
                 "crawl_skip.json", "losers.parquet"):
        p = os.path.join(out_root, name)
        if os.path.exists(p):
            shutil.copy2(p, os.path.join(new_root, name))

    # ---- postings: fold + re-route in one per-bucket pass --------------
    postings_dst = os.path.join(new_root, "postings")
    buckets = bucket_file_map([stage_dir(out_root, "postings")])
    if not buckets:
        raise RuntimeError("reshard_index requires bucket-partitioned postings")
    drop_ref = ray.put((frozenset(losers | deleted), supersede, {}))
    _new_n = new_n_shards

    @ray.remote
    def reroute_bucket(bucket: int, bfiles: list, drop, dst: str) -> int:
        # `drop` arrives as an ObjectRef argument — Ray dereferences it
        # to the (losers, supersede, overrides) tuple before the call
        import pyarrow.parquet as _pq

        from myaku_ray.index.segment_build import POSTING_COLS, apply_drop

        cols = POSTING_COLS
        if _pq.read_schema(bfiles[0]).get_field_index("positions") != -1:
            cols = POSTING_COLS + ["positions"]
        t = pa.concat_tables([_pq.read_table(f, columns=cols) for f in bfiles])
        t = apply_drop(t, *drop)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        route = (ids % _new_n).astype(np.int64)
        for i in np.unique(route):
            d = os.path.join(dst, f"shard={int(i)}", f"bucket={bucket}")
            os.makedirs(d, exist_ok=True)
            _pq.write_table(
                t.filter(pa.array(route == i)),
                os.path.join(d, "resharded-00000.parquet"),
                compression="lz4",
            )
        return t.num_rows

    n_rows = sum(
        ray.get(
            [
                reroute_bucket.remote(b, bf, drop_ref, postings_dst)
                for b, bf in sorted(buckets.items())
            ]
        )
    )
    mark_complete(
        new_root, "postings", rows=n_rows, n_shards=new_n_shards,
        resharded_from=out_root,
    )

    # ---- global stats: routing-invariant, recomputed from the folded
    # tree (vocab-sized) so exactness never depends on src refresh state -
    df_tbl = df_from_buckets(bucket_file_map([postings_dst]))
    total_tokens = (
        int(df_tbl["ctf"].to_numpy(zero_copy_only=False).sum())
        if df_tbl.num_rows
        else 0
    )
    stats = {
        **src_stats,
        "n_docs": int(n_docs),
        "total_tokens": total_tokens,
        "avgdl": total_tokens / max(n_docs, 1),
        "n_terms": int(df_tbl.num_rows),
        "n_shards": new_n_shards,
    }
    stats.pop("refreshed_thru_delta", None)
    df_stage = stage_dir(new_root, "df")
    os.makedirs(df_stage, exist_ok=True)
    pq.write_table(df_tbl, os.path.join(df_stage, "df.parquet"))
    mark_complete(new_root, "df", rows=int(df_tbl.num_rows))

    # ---- per-shard encode with the (unchanged) global stats ------------
    new_shards = shard_dirs_of(new_root, new_n_shards)
    df_map = dict(
        zip(
            df_tbl["term"].to_pylist(),
            df_tbl["df"].to_numpy(zero_copy_only=False).astype(int),
        )
    )
    docs_dir = stage_dir(new_shared, "docs")
    for i, sdir in enumerate(new_shards):
        os.makedirs(sdir, exist_ok=True)
        sdf = os.path.join(sdir, "df")
        os.makedirs(sdf, exist_ok=True)
        pq.write_table(df_tbl, os.path.join(sdf, "df.parquet"))
        _atomic_write_json(
            os.path.join(sdir, "stats.json"), {**stats, "shard": i}
        )
        link = os.path.join(sdir, "docs")
        if not os.path.lexists(link):
            os.symlink(
                os.path.relpath(docs_dir, sdir), link,
                target_is_directory=True,
            )
        shard_postings = os.path.join(postings_dst, f"shard={i}")
        if not os.path.isdir(shard_postings):
            os.makedirs(stage_dir(sdir, "segments"), exist_ok=True)
            mark_complete(sdir, "segments", shard=i, empty=True)
            continue
        if not encode_segments_partitioned(
            [shard_postings],
            stage_dir(sdir, "segments"),
            df_map=df_map,
            n_docs=stats["n_docs"],
            avgdl=stats["avgdl"],
            num_segments=stats["num_segments"],
        ):
            raise RuntimeError(f"shard {i}: reshard write was not partitioned")
        mark_complete(sdir, "segments", shard=i, resharded=True)

    wall = round(time.time() - t0, 3)
    _atomic_write_json(
        os.path.join(new_root, "reshard.json"),
        {
            "from": out_root,
            "old_n_shards": int(src_stats["n_shards"]),
            "new_n_shards": new_n_shards,
            "n_posting_rows": int(n_rows),
            "wall_s": wall,
        },
    )
    append_lineage(
        new_root, stage="reshard", n_rows=n_rows,
        new_n_shards=new_n_shards, wall_s=wall,
    )
    return {
        "shard_dirs": new_shards,
        "n_posting_rows": int(n_rows),
        "stats": stats,
        "reshard_wall_s": wall,
    }


# ---------------------------------------------------------------------------
# document removal + time-decay rescore on the sharded layout
# ---------------------------------------------------------------------------


def delete_urls_sharded(
    out_root: str,
    urls: list[str],
    *,
    tokenize_concurrency: int | tuple | None = (1, 8),
    tokenize_batch_size: int = 128,
) -> dict:
    """Remove documents on the sharded layout — derivation is
    ``update._prepare_delete`` VERBATIM (delete record, dedup recompute
    over survivors, resurrection need-set); the resurrection delta, if
    any, routes through the hive ``(shard, bucket)`` write and the
    global-stats refresh re-encodes every shard.  Rank semantics are the
    monolithic ``delete_urls``'s exactly (pytest-gated federation vs
    monolithic bit-identity)."""
    import numpy as _np
    import ray.data as _rd

    from myaku_ray.pipelines.update import (
        _make_keep_need,
        _mark_delta_done,
        _next_delta_id,
        _prepare_delete,
        _write_tokenized_shard,
    )

    t0 = time.time()
    _finish_sharded_compaction(out_root)
    shards = _sharded_dirs(out_root)
    _ensure_state_links(out_root)
    with open(os.path.join(shards[0], "stats.json")) as f:
        cur_stats = json.load(f)
    n_shards = int(cur_stats["n_shards"])

    prep = _prepare_delete(out_root, urls)
    metrics = prep["metrics"]
    need = prep["need"]
    if prep["noop"]:
        return metrics

    if need:
        k = _next_delta_id(out_root)
        postings_delta_dir = os.path.join(
            stage_dir(out_root, "postings"), f"delta-{k}"
        )

        def add_shard(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "shard", pa.array((ids % n_shards).astype(_np.int64))
            )

        (
            _rd.read_parquet(
                stage_dir(out_root, "docs"),
                columns=["doc_id", "text", "quality_score", "warc_ts"],
            )
            .map_batches(_make_keep_need(need), batch_format="pyarrow")
            .map_batches(
                TokenizeStage,
                batch_format="pyarrow",
                batch_size=tokenize_batch_size,
                concurrency=tokenize_concurrency,
                num_cpus=1,
                fn_constructor_kwargs={
                    "salt_buckets": cur_stats["salt_buckets"],
                    "encode_buckets": cur_stats.get("encode_buckets", 64),
                    "with_positions": cur_stats.get("with_positions", False),
                },
            )
            .map_batches(add_shard, batch_format="pyarrow")
            .write_parquet(
                postings_delta_dir,
                partition_cols=["shard", "bucket"],
                compression="lz4",
            )
        )
        _write_tokenized_shard(postings_delta_dir, need)
        _mark_delta_done(postings_delta_dir)

    append_lineage(
        out_root, stage="delete", n_deleted=metrics["n_deleted"],
        n_resurrected=len(need), sharded=True,
        wall_s=round(time.time() - t0, 3),
    )
    metrics.update(refresh_sharded_index(out_root))
    metrics["refreshed"] = True
    return metrics


def rescore_sharded_index(
    out_root: str,
    *,
    now,
    blog_ratings: dict[str, float] | None = None,
) -> dict:
    """Time-decay rescore on the sharded layout: the changed-override
    derivation is ``rescore._changed_overrides`` VERBATIM over the
    shared docs, the merged override records land at the root, and the
    refresh re-encodes every shard WITHOUT the df all-reduce
    (quality-only change — tf/df/doclen untouched, same skip as the
    monolithic ``refresh_index(recompute_df=False)``).  The new clock
    stamps every shard's stats.json."""
    from myaku_ray.pipelines.rescore import _changed_overrides
    from myaku_ray.pipelines.update import (
        _atomic_write_json,
        load_quality_overrides,
        save_quality_overrides,
    )

    t0 = time.time()
    blog_ratings = blog_ratings or {}
    _finish_sharded_compaction(out_root)
    shards = _sharded_dirs(out_root)
    _ensure_state_links(out_root)
    changed, prev_records = _changed_overrides(out_root, now, blog_ratings)
    n_changed = len(changed)
    metrics = {"n_rescored": n_changed}
    if n_changed:
        merged = dict(prev_records)
        merged.update(
            {
                int(d): (int(q), int(w))
                for d, q, w in zip(
                    changed["doc_id"], changed["quality"], changed["warc_us"]
                )
            }
        )
        save_quality_overrides(out_root, merged)
        metrics.update(refresh_sharded_index(out_root, recompute_df=False))
    # the clock stamp lands on every shard (serving state) even when no
    # score moved — the rescore-tracking checkpoint
    for i, sdir in enumerate(shards):
        p = os.path.join(sdir, "stats.json")
        with open(p) as f:
            st = json.load(f)
        st["fixed_now_us"] = int(now.timestamp() * 1_000_000)
        _atomic_write_json(p, st)
    load_quality_overrides(out_root)  # derivable sanity read
    append_lineage(
        out_root, stage="rescore", n_rescored=n_changed, sharded=True,
        wall_s=round(time.time() - t0, 3),
    )
    metrics["rescore_wall_s"] = round(time.time() - t0, 3)
    return metrics


# ---------------------------------------------------------------------------
# in-place sharded compaction (fold deltas/tombstones, keep n_shards)
# ---------------------------------------------------------------------------

_SHARDED_COMPACT_MARKER = "compact_sharded.json"


def _rm_any(path: str) -> None:
    import shutil

    if os.path.isdir(path) and not os.path.islink(path):
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.lexists(path):
        os.remove(path)


def _finish_sharded_compaction(out_root: str) -> bool:
    """Complete (or re-complete) a crashed sharded-compaction swap.
    The marker is written only after the full ``.compactnew`` tree is
    built, so recovery just redoes the per-entry rename sequence."""
    import shutil

    marker = os.path.join(out_root, _SHARDED_COMPACT_MARKER)
    if not os.path.exists(marker):
        return False
    with open(marker) as f:
        entries = json.load(f)["entries"]
    newroot = out_root + ".compactnew"
    for e in entries:
        live = os.path.join(out_root, e)
        new = os.path.join(newroot, e)
        old = live + ".old"
        if os.path.lexists(new):
            _rm_any(old)
            if os.path.lexists(live):
                os.rename(live, old)
            os.rename(new, live)
        _rm_any(old)
    shutil.rmtree(newroot, ignore_errors=True)
    os.remove(marker)
    return True


def compact_sharded_index(out_root: str) -> dict:
    """Fold committed deltas, superseded versions and tombstones back
    into the base sharded layout IN PLACE — the periodic compaction that
    keeps delta chains short (monolithic twin: ``update.compact_index``).

    Implementation: a same-``n_shards`` ``reshard_index`` into a
    ``.compactnew`` sibling (the fold and the re-route are the same
    per-bucket pass; with an unchanged routing key no row changes shard)
    followed by a marker-committed directory swap.  Idempotent via the
    same rule as the monolithic compact: re-fold only when committed
    deltas / supersede exist or the effective deleted set changed since
    the last compaction (its signature is stamped into every shard's
    stats.json)."""
    import glob
    import hashlib
    import shutil

    from myaku_ray.pipelines.update import (
        _atomic_write_json,
        _clean_partial_deltas,
        _derive_refresh_state,
    )

    t0 = time.time()
    _finish_sharded_compaction(out_root)
    shards = _sharded_dirs(out_root)
    _ensure_state_links(out_root)
    _clean_partial_deltas(out_root)
    with open(os.path.join(shards[0], "stats.json")) as f:
        cur_stats = json.load(f)
    n_shards = int(cur_stats["n_shards"])

    has_deltas = any(
        glob.glob(os.path.join(stage_dir(out_root, st), "delta-*"))
        for st in ("docs", "postings")
    )
    supersede, _losers, deleted, _ov, _n = _derive_refresh_state(out_root)
    tomb_sig = hashlib.blake2b(
        np.asarray(sorted(deleted), dtype=np.int64).tobytes(), digest_size=8
    ).hexdigest()
    if (
        not has_deltas
        and not supersede
        and cur_stats.get("compacted_tomb_sig") == tomb_sig
    ):
        return {"compacted": False, "reason": "nothing to fold"}

    newroot = out_root + ".compactnew"
    shutil.rmtree(newroot, ignore_errors=True)
    m = reshard_index(out_root, newroot, n_shards)
    os.remove(os.path.join(newroot, "reshard.json"))
    # stamp the folded tombstone signature into the new tree's stats
    for i, sdir in enumerate(
        shard_dirs_of(newroot, n_shards)
    ):
        p = os.path.join(sdir, "stats.json")
        with open(p) as f:
            st = json.load(f)
        st["compacted_tomb_sig"] = tomb_sig
        _atomic_write_json(p, st)

    entries = ["_shared", "postings", "df"] + [
        os.path.basename(s) for s in shards
    ]
    for name in ("losers.parquet",):
        if os.path.exists(os.path.join(newroot, name)):
            entries.append(name)
    _atomic_write_json(
        os.path.join(out_root, _SHARDED_COMPACT_MARKER), {"entries": entries}
    )
    _finish_sharded_compaction(out_root)
    append_lineage(
        out_root, stage="compact", sharded=True,
        n_superseded_folded=len(supersede),
        n_posting_rows=m["n_posting_rows"],
        wall_s=round(time.time() - t0, 3),
    )
    return {
        "compacted": True,
        "n_superseded_folded": len(supersede),
        "compact_wall_s": round(time.time() - t0, 3),
    }
