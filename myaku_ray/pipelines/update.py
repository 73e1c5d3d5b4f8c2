"""Incremental index update + refresh (the reference's batch-incremental flow).

Reproduces the reference's semantics on a built index directory:

- **Watermark anti-join (J4)**: incoming pages are filtered against the
  indexed (url -> warc_ts) checkpoint; keep a page iff its url is new OR
  its warc_ts is strictly newer (re-crawl-on-update,
  myaku/crawlers/crawl_track.py:89-129).
- **Re-crawl replacement**: an updated url keeps its doc_id (hash of url)
  but gets a new warc_ts; the old version's posting rows are tombstoned
  via a (doc_id -> latest warc_us) supersede map — postings carry warc_us,
  so no generation column is needed anywhere.
- **Exact-dedup recompute (A6/J5)**: the text_hash winner set is
  recomputed over live docs each update (winner = min doc_id, the same
  deterministic rule as the base build), so results stay rank-identical
  to a from-scratch build over the union corpus — including the corner
  cases the reference's `can_store_article` guard handles implicitly:
  a new doc with a smaller doc_id displacing an indexed winner, and a
  former loser resurrected when its re-crawled winner's text changed.
- **Delta tokenization**: ONLY docs that won dedup and have no postings
  for their current (doc_id, warc_us) version are tokenized — the
  expensive actor-pool stage runs on the delta, not the corpus.
- **Refresh**: df / corpus stats / segments are recomputed from the
  accumulated posting files (base + deltas) with the drop filter applied.
  BM25 scores depend on global df/N/avgdl, so exact score parity with a
  full rebuild REQUIRES re-encoding segments; the encode is a cheap
  columnar shuffle compared to tokenization.  At 10^12-doc scale one
  amortizes this with score-frozen delta generations + periodic
  compaction; ``compact_index`` below IS that compaction — it folds
  accumulated deltas, superseded versions and tombstones back into the
  base layout with a crash-recoverable directory swap.

Crash-consistency model (every root state value is either a user-action
record written atomically at its own action time, or DERIVED from the
committed delta set — never a mutation that can desync from a
half-written delta):

- ``docs/delta-<k>/``, ``postings/delta-<k>/`` — per-update outputs; a
  delta COUNTS only once its ``_DELTA_DONE`` marker exists (partial
  deltas from a crash are swept before every update).  Delta ids come
  from ONE counter spanning both stages, so an update after a
  delete-resurrection can never reuse a live postings delta dir.
- supersede (doc_id -> latest warc_us for re-crawled docs) is DERIVED
  from the committed doc files (a doc with >1 committed version is a
  re-crawl; max warc wins) — no side file to desync.
- ``deleted.parquet`` — (doc_id, warc_us) records written by
  delete_urls with the latest committed version at deletion time; a doc
  is effectively deleted iff its current latest committed warc_us is <=
  the recorded one, so a strictly-newer re-crawl un-deletes it with no
  state mutation.
- ``quality_overrides.parquet`` — (doc_id, quality, warc_us) written by
  rescore for the version it scored; an override is effective iff the
  doc's latest committed warc_us still equals the recorded one (a
  re-crawl silently invalidates it — the override belonged to the old
  version's text).
- ``losers.parquet`` — CURRENT dedup-loser doc_id set, recomputed and
  written ONLY by refresh_index from committed state (observability +
  the no-change fast path; the authority is always the derivation).
- ``stats.json`` records ``refreshed_thru_delta`` = max committed delta
  id at the last completed refresh, so a crash between delta commit and
  refresh can never satisfy the no-change fast path.
- every stage appends a lineage record (state/lineage.py).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from myaku_ray.corpus import FIXED_NOW
from myaku_ray.index.segment_build import (
    apply_drop,
    bucket_file_map,
    df_from_buckets,
    encode_segments,
    encode_segments_partitioned,
    partial_df,
)
from myaku_ray.stages.extract import make_extract_fn
from myaku_ray.stages.tokenize import TokenizeStage
from myaku_ray.state.lineage import append_lineage, mark_complete, stage_dir


# ---------------------------------------------------------------------------
# atomic small-file writes
# ---------------------------------------------------------------------------

def _atomic_write_table(path: str, table: pa.Table) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# committed-state readers (the derivation layer)
# ---------------------------------------------------------------------------

def _committed_doc_files(index_dir: str) -> list[str]:
    """Base doc files + files of deltas that carry _DELTA_DONE."""
    docs_dir = stage_dir(index_dir, "docs")
    files = sorted(glob.glob(os.path.join(docs_dir, "*.parquet")))
    for d in sorted(glob.glob(os.path.join(docs_dir, "delta-*"))):
        if os.path.exists(os.path.join(d, "_DELTA_DONE")):
            files.extend(sorted(glob.glob(os.path.join(d, "**", "*.parquet"),
                                          recursive=True)))
    return files


def _docs_versions(index_dir: str) -> pd.DataFrame:
    """Every COMMITTED (doc_id, url, text_hash, warc_us) doc version.

    Driver-side here (checkpoint-sized columns only, no text).  At
    10^12-doc scale this becomes a Dataset groupby on doc_id — the same
    columns, never the payload."""
    files = _committed_doc_files(index_dir)
    if not files:
        return pd.DataFrame(
            columns=["doc_id", "url", "text_hash", "warc_us"]
        ).astype({"doc_id": "int64", "warc_us": "int64"})
    t = pq.read_table(files, columns=["doc_id", "url", "text_hash", "warc_ts"])
    return pd.DataFrame(
        {
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "url": t["url"].to_pylist(),
            "text_hash": t["text_hash"].to_pylist(),
            "warc_us": t["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
        }
    )


def _docs_light(index_dir: str) -> pd.DataFrame:
    """Latest committed version per doc_id."""
    df = _docs_versions(index_dir)
    df = df.sort_values(["doc_id", "warc_us"]).drop_duplicates(
        "doc_id", keep="last"
    )
    return df.reset_index(drop=True)


def derive_supersede(versions: pd.DataFrame) -> dict[int, int]:
    """doc_id -> latest committed warc_us, for re-crawled docs only.

    Derived from the committed doc files instead of a separately-persisted
    json: delta completeness implies the newer version's postings were
    committed in the same transaction, so the old version's postings are
    always safe to drop."""
    g = versions.groupby("doc_id")["warc_us"].agg(["nunique", "max"])
    multi = g[g["nunique"] > 1]
    return dict(zip(multi.index.astype(int), multi["max"].astype(int)))


def load_losers(index_dir: str) -> set[int]:
    p = os.path.join(index_dir, "losers.parquet")
    if os.path.exists(p):
        return set(int(x) for x in pq.read_table(p)["doc_id"].to_pylist())
    # base build stores losers under dedup/ — fall back to that
    d = stage_dir(index_dir, "dedup")
    if os.path.isdir(d):
        return set(
            int(x)
            for x in pq.read_table(d, columns=["doc_id"])["doc_id"].to_pylist()
        )
    return set()


def save_losers(index_dir: str, losers: set[int]) -> None:
    _atomic_write_table(
        os.path.join(index_dir, "losers.parquet"),
        pa.table({"doc_id": pa.array(sorted(losers), pa.int64())}),
    )


def load_tokenized(index_dir: str) -> set[tuple[int, int]]:
    """(doc_id, warc_us) versions whose postings exist.

    Derived, never a lone side file (a side file can desync from the
    posting data on a crash): base versions = root-level doc files minus
    the BASE dedup losers, plus one ``_tokenized.meta`` shard per
    COMPLETED update delta (the shard lives inside the delta dir, so the
    crash-cleanup that removes a partial delta removes its shard too)."""
    docs_dir = stage_dir(index_dir, "docs")
    base_files = sorted(glob.glob(os.path.join(docs_dir, "*.parquet")))
    out: set[tuple[int, int]] = set()
    if base_files:
        t = pq.read_table(base_files, columns=["doc_id", "warc_ts"])
        base_losers: set[int] = set()
        d = stage_dir(index_dir, "dedup")
        if os.path.isdir(d):
            base_losers = set(
                int(x)
                for x in pq.read_table(d, columns=["doc_id"])["doc_id"].to_pylist()
            )
        for did, w in zip(
            t["doc_id"].to_pylist(),
            t["warc_ts"].cast(pa.int64()).to_pylist(),
        ):
            if int(did) not in base_losers:
                out.add((int(did), int(w)))
    for shard in glob.glob(
        os.path.join(stage_dir(index_dir, "postings"), "delta-*", "_tokenized.meta")
    ):
        if not os.path.exists(
            os.path.join(os.path.dirname(shard), "_DELTA_DONE")
        ):
            continue
        t = pq.read_table(shard)
        out.update(
            zip(
                (int(x) for x in t["doc_id"].to_pylist()),
                (int(x) for x in t["warc_us"].to_pylist()),
            )
        )
    return out


def _write_tokenized_shard(delta_dir: str, versions: set[tuple[int, int]]) -> None:
    os.makedirs(delta_dir, exist_ok=True)
    meta = os.path.join(delta_dir, "_tokenized.meta")
    if os.path.exists(meta):
        raise RuntimeError(
            f"postings delta dir already holds a tokenized shard: {delta_dir} "
            "(delta-id collision — ids must come from the unified counter)"
        )
    ids, warcs = zip(*sorted(versions)) if versions else ((), ())
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(ids), pa.int64()),
                "warc_us": pa.array(list(warcs), pa.uint64()),
            }
        ),
        meta,
    )


def load_crawl_skip(index_dir: str) -> dict[str, int]:
    """url -> warc_us of the version that failed extraction (paywalled /
    non-ja / oversized / empty) — the reference's crawl_skip collection
    (myaku/crawlers/crawl_track.py:65-87).  A strictly newer warc_ts
    re-tries the url; the same version is never re-extracted."""
    p = os.path.join(index_dir, "crawl_skip.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {k: int(v) for k, v in json.load(f).items()}


def save_crawl_skip(index_dir: str, m: dict[str, int]) -> None:
    _atomic_write_json(os.path.join(index_dir, "crawl_skip.json"), m)


def _next_delta_id(index_dir: str) -> int:
    """ONE counter spanning docs AND postings deltas: delete_urls writes a
    postings delta with no docs twin, so per-stage counters would let the
    next update reuse its dir and clobber _tokenized.meta (the resurrected
    doc would be re-tokenized forever after, duplicating posting rows)."""
    ks = []
    for stage in ("docs", "postings"):
        for p in glob.glob(os.path.join(stage_dir(index_dir, stage), "delta-*")):
            ks.append(int(os.path.basename(p).split("-")[1]))
    return (max(ks) + 1) if ks else 1


def _max_committed_delta_id(index_dir: str) -> int:
    ks = [0]
    for stage in ("docs", "postings"):
        for p in glob.glob(os.path.join(stage_dir(index_dir, stage), "delta-*")):
            if os.path.exists(os.path.join(p, "_DELTA_DONE")):
                ks.append(int(os.path.basename(p).split("-")[1]))
    return max(ks)


def _clean_partial_deltas(index_dir: str) -> None:
    """Remove delta dirs from a crashed update (no _DELTA_DONE marker) —
    their partial files would otherwise duplicate or orphan rows.  The
    marker lands only after the update's postings AND state files are
    consistent."""
    for stage in ("docs", "postings"):
        for d in glob.glob(os.path.join(stage_dir(index_dir, stage), "delta-*")):
            if not os.path.exists(os.path.join(d, "_DELTA_DONE")):
                shutil.rmtree(d, ignore_errors=True)


def _mark_delta_done(*dirs: str) -> None:
    for d in dirs:
        if os.path.isdir(d):
            with open(os.path.join(d, "_DELTA_DONE"), "w") as f:
                f.write("ok")


# ---------------------------------------------------------------------------
# versioned user-action state: deleted docs + rescore overrides
# ---------------------------------------------------------------------------

def load_deleted(index_dir: str) -> dict[int, int]:
    """doc_id -> warc_us of the latest committed version at deletion time.
    The doc counts as deleted only while its latest committed version is
    still <= this watermark (see effective_deleted)."""
    p = os.path.join(index_dir, "deleted.parquet")
    if not os.path.exists(p):
        return {}
    t = pq.read_table(p)
    ids = (int(x) for x in t["doc_id"].to_pylist())
    if "warc_us" in t.column_names:
        return dict(zip(ids, (int(x) for x in t["warc_us"].to_pylist())))
    # legacy single-column layout: treat as unconditionally deleted
    return {i: 2**62 for i in ids}


def save_deleted(index_dir: str, records: dict[int, int]) -> None:
    items = sorted(records.items())
    _atomic_write_table(
        os.path.join(index_dir, "deleted.parquet"),
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in items], pa.int64()),
                "warc_us": pa.array([w for _, w in items], pa.int64()),
            }
        ),
    )


def effective_deleted(latest_warc: dict[int, int], records: dict[int, int]) -> set[int]:
    """Deleted iff no strictly-newer version was committed since the
    delete — a re-crawl un-deletes with zero state mutation."""
    return {
        d for d, w in records.items() if latest_warc.get(d, 0) <= w
    }


def load_quality_overrides(index_dir: str) -> dict[int, tuple[int, int]]:
    """doc_id -> (rescored quality, warc_us of the version scored)."""
    p = os.path.join(index_dir, "quality_overrides.parquet")
    if not os.path.exists(p):
        return {}
    t = pq.read_table(p)
    ids = [int(x) for x in t["doc_id"].to_pylist()]
    qs = [int(x) for x in t["quality"].to_pylist()]
    if "warc_us" in t.column_names:
        ws = [int(x) for x in t["warc_us"].to_pylist()]
    else:
        ws = [0] * len(ids)  # legacy layout: can't validate, treat as stale
    return {d: (q, w) for d, q, w in zip(ids, qs, ws)}


def save_quality_overrides(
    index_dir: str, records: dict[int, tuple[int, int]]
) -> None:
    items = sorted(records.items())
    _atomic_write_table(
        os.path.join(index_dir, "quality_overrides.parquet"),
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in items], pa.int64()),
                "quality": pa.array([q for _, (q, _w) in items], pa.int64()),
                "warc_us": pa.array([w for _, (_q, w) in items], pa.int64()),
            }
        ),
    )


def effective_overrides(
    latest_warc: dict[int, int], records: dict[int, tuple[int, int]]
) -> dict[int, int]:
    """An override applies only while the version it scored is still the
    doc's latest committed version — a re-crawl invalidates it (the
    override belonged to the OLD version's text/length)."""
    return {
        d: q for d, (q, w) in records.items() if latest_warc.get(d) == w
    }


def _make_keep_need(need: set[tuple[int, int]]):
    """Vectorized (doc_id, warc_us)-version filter for the tokenize read.

    ``need`` holds the latest live version per doc (one warc per doc_id),
    so it collapses to a sorted id->warc lookup: searchsorted + equality,
    no per-row Python."""
    ids_arr = np.fromiter((d for d, _ in sorted(need)), dtype=np.int64,
                          count=len(need))
    warc_arr = np.fromiter((w for _, w in sorted(need)), dtype=np.int64,
                           count=len(need))

    def keep_need(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        warcs = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(
            np.searchsorted(ids_arr, ids), len(ids_arr) - 1
        )
        mask = (ids_arr[pos] == ids) & (warc_arr[pos] == warcs)
        return batch.filter(pa.array(mask))

    return keep_need


# ---------------------------------------------------------------------------
# update
# ---------------------------------------------------------------------------

def _prepare_update(
    pages_path: str,
    index_dir: str,
    blog_ratings: dict[str, float],
    fixed_now,
) -> dict:
    """Shared ingest phase of an incremental update — anti-join, delta
    extraction, crawl-skip bookkeeping, dedup recompute, need-set
    derivation — identical for the monolithic index and the sharded
    layout (pipelines/shard.py routes the same delta through the
    hive (shard, bucket) write afterwards).  Returns the delta state:
    ``{k, docs_delta_dir, n_new, need, losers, prev_losers, metrics}``."""
    metrics: dict = {}

    _clean_partial_deltas(index_dir)
    _finish_compaction(index_dir)  # recover a crashed compaction swap
    old = _docs_light(index_dir)
    # derives from root doc files + completed-delta shards only, so the
    # delta this update is about to write cannot appear as tokenized
    tokenized = load_tokenized(index_dir)
    # url -> warc for the anti-join (url maps 1:1 to doc_id)
    url_warc = dict(zip(old["url"], old["warc_us"].astype(int)))
    crawl_skip = load_crawl_skip(index_dir)
    url_warc_ref = ray.put((url_warc, crawl_skip))

    # ---- J4 anti-join: keep new urls or strictly-newer re-crawls -------
    # (crawl_skip drops versions that already failed extraction)
    pages = rd.read_parquet(pages_path, columns=["url", "warc_ts", "html", "lang"])

    def keep_updated(batch: pa.Table) -> pa.Table:
        known, skip = ray.get(url_warc_ref)
        urls = batch["url"].to_pandas()
        warcs = batch["warc_ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        # Series.map probes the broadcast dicts in C (NaN = absent); the
        # fillna value is irrelevant — the isna term already passes those
        kw = urls.map(known)
        sw = urls.map(skip)
        mask = (
            kw.isna().to_numpy() | (warcs > kw.fillna(0).to_numpy())
        ) & (sw.isna().to_numpy() | (warcs > sw.fillna(0).to_numpy()))
        return batch.filter(pa.array(mask))

    fresh = pages.map_batches(keep_updated, batch_format="pyarrow")

    # ---- extract the fresh pages to delta docs -------------------------
    k = _next_delta_id(index_dir)
    docs_delta_dir = os.path.join(stage_dir(index_dir, "docs"), f"delta-{k}")
    extract_fn = make_extract_fn(blog_ratings, fixed_now)
    fresh.map_batches(
        extract_fn, batch_format="pyarrow", batch_size=256
    ).write_parquet(docs_delta_dir)

    if os.path.isdir(docs_delta_dir):
        new_t = pq.read_table(
            docs_delta_dir, columns=["doc_id", "url", "text_hash", "warc_ts"]
        )
    else:
        # zero extracted rows: Ray's write_parquet creates no directory
        new_t = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                "text_hash": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.timestamp("us")),
            }
        )
    n_new = new_t.num_rows
    metrics["n_fresh_docs"] = n_new

    # ---- crawl-skip bookkeeping: fresh versions that failed extraction -
    # (additive + deterministic per version, so committing it before the
    # delta is crash-safe: a re-run recomputes the identical entries)
    light_in = pq.read_table(pages_path, columns=["url", "warc_ts"])
    in_u = light_in["url"].to_pandas()
    in_w = light_in["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    # Passed-the-anti-join is evaluated against the PRE-update state; a
    # same-run duplicate url can only raise the recorded watermark, and
    # the per-url max below subsumes that sequential update exactly.
    kw = in_u.map(url_warc)
    sw = in_u.map(crawl_skip)
    passed = (kw.isna().to_numpy() | (in_w > kw.fillna(0).to_numpy())) & (
        sw.isna().to_numpy() | (in_w > sw.fillna(0).to_numpy())
    )
    passed &= ~in_u.isin(set(new_t["url"].to_pylist())).to_numpy()
    skip_changed = False
    if passed.any():
        upd = (
            pd.DataFrame({"url": in_u[passed], "w": in_w[passed]})
            .groupby("url")["w"].max()
        )
        for u, w in upd.items():  # result-sized: failed-extraction urls only
            crawl_skip[u] = max(int(w), crawl_skip.get(u, 0))
        skip_changed = True
    if skip_changed:
        save_crawl_skip(index_dir, crawl_skip)
    metrics["n_crawl_skipped"] = len(crawl_skip)
    if n_new == 0:
        # No fresh docs — but a previous update may have crashed between
        # writing its docs delta and tokenizing, so fall through to the
        # dedup/need recompute (cheap, driver-side) instead of returning:
        # `need` self-heals any winner version whose postings are missing.
        shutil.rmtree(docs_delta_dir, ignore_errors=True)

    new_df = pd.DataFrame(
        {
            "doc_id": new_t["doc_id"].to_numpy(zero_copy_only=False),
            "url": new_t["url"].to_pylist(),
            "text_hash": new_t["text_hash"].to_pylist(),
            "warc_us": new_t["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
        }
    )
    recrawled = new_df[new_df["doc_id"].isin(old["doc_id"])]
    metrics["n_recrawled"] = len(recrawled)
    # NOTE: no state files are written here.  supersede is derived from
    # the committed doc files; override/deleted invalidation for re-crawls
    # is derived from the version watermarks (effective_* above).  A crash
    # anywhere before _mark_delta_done leaves the index byte-identical.

    # ---- dedup recompute over live docs --------------------------------
    latest_warc = dict(zip(old["doc_id"].astype(int), old["warc_us"].astype(int)))
    latest_warc.update(
        zip(new_df["doc_id"].astype(int), new_df["warc_us"].astype(int))
    )
    deleted = effective_deleted(latest_warc, load_deleted(index_dir))
    live = pd.concat(
        [old[~old["doc_id"].isin(set(new_df["doc_id"]))], new_df],
        ignore_index=True,
    )
    live = live[~live["doc_id"].isin(deleted)]
    winners = live.groupby("text_hash")["doc_id"].min()
    winner_ids = set(winners.astype(int))
    losers = set(live["doc_id"].astype(int)) - winner_ids
    prev_losers = load_losers(index_dir)
    metrics["n_losers"] = len(losers)
    metrics["n_displaced"] = len(losers - prev_losers - set(new_df["doc_id"].astype(int)))

    # ---- which versions need tokenizing --------------------------------
    live_versions = set(
        zip(live["doc_id"].astype(int), live["warc_us"].astype(int))
    )
    need = {
        (d, w) for (d, w) in live_versions
        if d in winner_ids and (d, w) not in tokenized
    }
    metrics["n_tokenized"] = len(need)
    return {
        "k": k,
        "docs_delta_dir": docs_delta_dir,
        "n_new": n_new,
        "need": need,
        "losers": losers,
        "prev_losers": prev_losers,
        "metrics": metrics,
    }


def update_index(
    pages_path: str,
    index_dir: str,
    *,
    blog_ratings: dict[str, float] | None = None,
    fixed_now=FIXED_NOW,
    tokenize_concurrency: int | tuple | None = (1, 8),
    tokenize_batch_size: int = 128,
) -> dict:
    """Incrementally index new/updated pages; returns update metrics."""
    t_start = time.time()
    blog_ratings = blog_ratings or {}
    prep = _prepare_update(pages_path, index_dir, blog_ratings, fixed_now)
    k = prep["k"]
    docs_delta_dir = prep["docs_delta_dir"]
    n_new = prep["n_new"]
    need = prep["need"]
    losers = prep["losers"]
    prev_losers = prep["prev_losers"]
    metrics = prep["metrics"]

    if need:
        docs_all = rd.read_parquet(
            stage_dir(index_dir, "docs"),
            columns=["doc_id", "text", "quality_score", "warc_ts"],
        )
        to_tok = docs_all.map_batches(
            _make_keep_need(need), batch_format="pyarrow"
        )
        postings_delta_dir = os.path.join(
            stage_dir(index_dir, "postings"), f"delta-{k}"
        )
        with open(os.path.join(index_dir, "stats.json")) as f:
            _stats = json.load(f)
        delta_postings = to_tok.map_batches(
            TokenizeStage,
            batch_format="pyarrow",
            batch_size=tokenize_batch_size,
            concurrency=tokenize_concurrency,
            num_cpus=1,
            fn_constructor_kwargs={
                "salt_buckets": _stats["salt_buckets"],
                "encode_buckets": _stats.get("encode_buckets", 64),
                # positional indexes must stay positional across updates:
                # the encode task concats base + delta postings, so their
                # schemas have to agree
                "with_positions": _stats.get("with_positions", False),
            },
        )
        delta_postings.write_parquet(
            postings_delta_dir, partition_cols=["bucket"], compression="lz4"
        )
        _write_tokenized_shard(postings_delta_dir, need)
        _mark_delta_done(docs_delta_dir, postings_delta_dir)
    elif n_new > 0:
        # nothing to tokenize (all fresh docs were dedup losers) — the
        # docs delta is still state the next update depends on
        _mark_delta_done(docs_delta_dir)

    append_lineage(
        index_dir, stage=f"update-{k}", n_fresh=n_new,
        n_tokenized=len(need), n_losers=len(losers),
        wall_s=round(time.time() - t_start, 3),
    )

    # ---- refresh stats + segments (exact-parity compaction) ------------
    # Fast path only when nothing changed AND the last refresh already
    # covered every committed delta (a crash between delta commit and
    # refresh leaves refreshed_thru_delta behind the committed max).
    with open(os.path.join(index_dir, "stats.json")) as f:
        _cur_stats = json.load(f)
    if (
        n_new == 0
        and not need
        and losers == prev_losers
        and _cur_stats.get("refreshed_thru_delta", 0)
        >= _max_committed_delta_id(index_dir)
    ):
        metrics["refreshed"] = False
        metrics["update_wall_s"] = round(time.time() - t_start, 3)
        return metrics
    refresh_metrics = refresh_index(index_dir)
    metrics.update(refresh_metrics)
    metrics["refreshed"] = True
    metrics["update_wall_s"] = round(time.time() - t_start, 3)
    return metrics


# ---------------------------------------------------------------------------
# refresh (recompute df/stats/segments from accumulated postings)
# ---------------------------------------------------------------------------

# Above this many committed doc versions, the refresh-state derivation
# (latest-per-doc, supersede, dedup losers) runs as Dataset groupbys over
# the 3 checkpoint columns instead of a driver-side pandas pass.  The
# RESULT structures stay driver-sized either way: supersede ~ re-crawled
# docs, deleted/overrides ~ user actions, losers ~ dup rate x corpus (the
# loser broadcast's own scale valve is the hash-bucketed anti-join noted
# in pipelines/build.py).
REFRESH_DERIVE_DRIVER_LIMIT = 5_000_000


def _derive_refresh_state(index_dir: str) -> tuple[dict, set, set, dict, int]:
    """(supersede, losers, effective deleted, effective overrides, n_docs)
    derived from committed doc files — driver pandas under the limit,
    Dataset groupbys above it (identical outputs, tested)."""
    files = _committed_doc_files(index_dir)
    total = sum(pq.read_metadata(f).num_rows for f in files) if files else 0
    del_records = load_deleted(index_dir)
    ov_records = load_quality_overrides(index_dir)

    if total <= REFRESH_DERIVE_DRIVER_LIMIT:
        versions = _docs_versions(index_dir)
        supersede = derive_supersede(versions)
        latest = versions.sort_values(["doc_id", "warc_us"]).drop_duplicates(
            "doc_id", keep="last"
        )
        latest_warc = dict(
            zip(latest["doc_id"].astype(int), latest["warc_us"].astype(int))
        )
        deleted = effective_deleted(latest_warc, del_records)
        live = latest[~latest["doc_id"].isin(deleted)]
        winners = live.groupby("text_hash")["doc_id"].min()
        losers = set(live["doc_id"].astype(int)) - set(winners.astype(int))
        overrides = effective_overrides(latest_warc, ov_records)
        return supersede, losers, deleted, overrides, int(len(live)) - len(losers)

    # ---- distributed derivation ----------------------------------------
    # Only 3 checkpoint-sized columns ever leave storage; the payload
    # (text/html) is never read.  One groupby(doc_id) computes latest
    # version + recrawl flag; a second groupby(text_hash) over the live
    # latest rows computes dedup losers.
    ds = rd.read_parquet(files, columns=["doc_id", "text_hash", "warc_ts"])

    def latest_in_group(g: pa.Table) -> pa.Table:
        w = g["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        i = int(w.argmax())
        return pa.table(
            {
                "doc_id": pa.array([int(g["doc_id"][i].as_py())], pa.int64()),
                "text_hash": pa.array([g["text_hash"][i].as_py()], pa.string()),
                "warc_us": pa.array([int(w.max())], pa.int64()),
                "n_versions": pa.array([len(w)], pa.int32()),
            }
        )

    latest_ds = ds.groupby("doc_id").map_groups(
        latest_in_group, batch_format="pyarrow"
    ).materialize()

    def _collect(dset, cols: list[str]) -> pa.Table:
        """Driver-collect a SMALL result dataset as one Arrow table.
        Ray can pass empty blocks through a map_batches untouched, so the
        collected blocks are projected to ``cols`` before concat."""
        tabs = [ray.get(r) for r in dset.to_arrow_refs()]
        return pa.concat_tables([t.select(cols) for t in tabs])

    # supersede = re-crawled docs only (small): collect where n_versions>1
    def recrawled_only(batch: pa.Table) -> pa.Table:
        nv = batch["n_versions"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(nv > 1))

    sup_t = _collect(
        latest_ds.map_batches(recrawled_only, batch_format="pyarrow"),
        ["doc_id", "warc_us"],
    )
    supersede = dict(
        zip(
            (int(x) for x in sup_t["doc_id"].to_pylist()),
            (int(x) for x in sup_t["warc_us"].to_pylist()),
        )
    )

    # effective deleted / overrides need latest warc for THOSE ids only
    check_ids = sorted(set(del_records) | set(ov_records))
    if check_ids:
        ids_arr = np.asarray(check_ids, dtype=np.int64)

        def pick(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(np.isin(ids, ids_arr)))

        small = _collect(
            latest_ds.map_batches(pick, batch_format="pyarrow"),
            ["doc_id", "warc_us"],
        )
        latest_warc_small = dict(
            zip(
                (int(x) for x in small["doc_id"].to_pylist()),
                (int(x) for x in small["warc_us"].to_pylist()),
            )
        )
    else:
        latest_warc_small = {}
    deleted = effective_deleted(latest_warc_small, del_records)
    overrides = effective_overrides(latest_warc_small, ov_records)

    # dedup losers over live latest rows (winner = min doc_id per hash)
    del_arr = np.asarray(sorted(deleted), dtype=np.int64)

    def drop_deleted(batch: pa.Table) -> pa.Table:
        if len(del_arr) == 0:
            return batch
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(ids, del_arr)))

    def losers_of_group(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) <= 1:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        keep = ids.min()
        return pa.table(
            {"doc_id": pa.array(sorted(int(x) for x in ids if x != keep), pa.int64())}
        )

    live_ds = latest_ds.map_batches(drop_deleted, batch_format="pyarrow")
    n_live = live_ds.count()
    loser_t = _collect(
        live_ds.select_columns(["doc_id", "text_hash"])
        .groupby("text_hash")
        .map_groups(losers_of_group, batch_format="pyarrow"),
        ["doc_id"],
    )
    losers = set(int(x) for x in loser_t["doc_id"].to_pylist())
    return supersede, losers, deleted, overrides, int(n_live) - len(losers)


def refresh_index(index_dir: str, *, recompute_df: bool = True) -> dict:
    """Recompute df / corpus stats / segments from committed state.

    Everything the drop filter needs — supersede, dedup losers, effective
    deleted set, effective overrides — is DERIVED here from the committed
    doc files + the versioned user-action records, so refresh is always
    consistent no matter where a previous run crashed."""
    t0 = time.time()
    with open(os.path.join(index_dir, "stats.json")) as f:
        prev_stats = json.load(f)
    num_segments = prev_stats["num_segments"]
    salt_buckets = prev_stats["salt_buckets"]

    supersede, losers, deleted, overrides, n_docs_derived = (
        _derive_refresh_state(index_dir)
    )
    save_losers(index_dir, losers)

    drop_losers = losers | deleted
    drop_ref = ray.put((frozenset(drop_losers), supersede, overrides))

    def drop_dead(batch: pa.Table) -> pa.Table:
        """Filter tombstoned rows; apply rescored quality overrides."""
        loser_set, sup, ov = ray.get(drop_ref)
        if "quality" not in batch.column_names:
            ov = {}
        return apply_drop(batch, loser_set, sup, ov)

    postings_dir = stage_dir(index_dir, "postings")
    df_dir = stage_dir(index_dir, "df")

    # Base + delta posting files, listed explicitly: hive `bucket=` dirs
    # sit at different depths (postings/bucket=N vs postings/delta-k/
    # bucket=N), so directory-level partition inference would misfire.
    posting_files = sorted(
        f
        for f in glob.glob(
            os.path.join(postings_dir, "**", "*.parquet"), recursive=True
        )
        if not os.path.basename(f).startswith("_")
    )

    # ---- df + corpus stats ---------------------------------------------
    # A quality-only rescore leaves tf/df/doclen untouched — skip the
    # df shuffle (recompute_df=False) and reuse the existing df/ table.
    if recompute_df:
        shutil.rmtree(df_dir, ignore_errors=True)
        buckets = bucket_file_map([postings_dir])
        if buckets:
            df_tbl = df_from_buckets(
                buckets, drop=(frozenset(drop_losers), supersede, {})
            )
            os.makedirs(df_dir, exist_ok=True)
            pq.write_table(df_tbl, os.path.join(df_dir, "df.parquet"))
        else:
            live_postings = rd.read_parquet(
                posting_files, columns=["term", "doc_id", "tf", "warc_us"]
            ).map_batches(drop_dead, batch_format="pyarrow")
            (
                live_postings.map_batches(partial_df, batch_format="pyarrow", batch_size=65536)
                .groupby("term")
                .aggregate(Sum("pdf_count", alias_name="df"), Sum("ptf", alias_name="ctf"))
                .write_parquet(df_dir)
            )

    n_docs = n_docs_derived
    df_pdf = pq.read_table(df_dir).to_pandas()
    total_tokens = int(df_pdf["ctf"].sum())
    avgdl = total_tokens / max(n_docs, 1)
    stats = {
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": avgdl,
        "n_terms": int(len(df_pdf)),
        "num_segments": num_segments,
        "salt_buckets": salt_buckets,
        "encode_buckets": prev_stats.get("encode_buckets", 64),
        "fixed_now_us": prev_stats["fixed_now_us"],
        **(
            {"compacted_tomb_sig": prev_stats["compacted_tomb_sig"]}
            if "compacted_tomb_sig" in prev_stats
            else {}
        ),
    }
    _atomic_write_json(os.path.join(index_dir, "stats.json"), stats)
    mark_complete(index_dir, "df", rows=len(df_pdf), refreshed=True)

    # ---- segments ------------------------------------------------------
    df_map = dict(zip(df_pdf["term"], df_pdf["df"].astype(int)))

    seg_root = stage_dir(index_dir, "segments")
    shutil.rmtree(seg_root, ignore_errors=True)
    if not encode_segments_partitioned(
        [postings_dir],
        seg_root,
        df_map=df_map,
        n_docs=stats["n_docs"],
        avgdl=stats["avgdl"],
        num_segments=num_segments,
        drop=(frozenset(drop_losers), supersede, overrides),
    ):
        refresh_cols = ["term", "doc_id", "tf", "doclen", "quality", "warc_us"]
        if stats.get("with_positions"):
            refresh_cols.append("positions")  # keep the phrase sidecar
        postings = rd.read_parquet(
            posting_files, columns=refresh_cols
        ).map_batches(drop_dead, batch_format="pyarrow")
        encode_segments(
            postings,
            seg_root,
            df_map=df_map,
            n_docs=stats["n_docs"],
            avgdl=stats["avgdl"],
            num_segments=num_segments,
            salt_buckets=salt_buckets,
        )
    mark_complete(index_dir, "segments", refreshed=True)
    # the refresh watermark lands LAST — a crash anywhere above leaves it
    # behind the committed-delta max, so the next update cannot fast-path
    # past a pending refresh
    stats["refreshed_thru_delta"] = _max_committed_delta_id(index_dir)
    _atomic_write_json(os.path.join(index_dir, "stats.json"), stats)

    # ---- title-term sidecar re-pin -------------------------------------
    # Doc deltas changed the docs-store fingerprint, so a build-time
    # sidecar (index/title_sidecar.py) is now stale and serving would
    # fall back to the in-process map.  Rebuild it here for any index
    # that has one (skip legacy indexes without a sidecar — they never
    # paid for it and keep the lazy path).
    from myaku_ray.index.title_sidecar import (
        build_title_sidecar, load_title_meta, title_sidecar_valid,
    )

    if load_title_meta(index_dir) is not None and not title_sidecar_valid(
        index_dir
    ):
        build_title_sidecar(index_dir)

    return {"refresh_wall_s": round(time.time() - t0, 3), "stats": stats}


# ---------------------------------------------------------------------------
# compaction (fold deltas + superseded versions into the base layout)
# ---------------------------------------------------------------------------

_COMPACT_STAGES = ("docs", "postings", "dedup")


def _compact_marker(index_dir: str) -> str:
    return os.path.join(index_dir, "compact_swap.json")


def _finish_compaction(index_dir: str) -> bool:
    """Complete (or re-complete) a directory swap a crashed compaction
    left behind.  Idempotent across every crash point: the marker is
    written only after ALL ``<stage>.compact`` dirs are fully built, so
    recovery just redoes the swap sequence per stage."""
    marker = _compact_marker(index_dir)
    if not os.path.exists(marker):
        return False
    for stage in _COMPACT_STAGES:
        live = stage_dir(index_dir, stage)
        new = live + ".compact"
        old = live + ".old"
        if os.path.isdir(new):
            shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(live):
                os.rename(live, old)
            os.rename(new, live)
        shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)
    return True


def compact_index(index_dir: str) -> dict:
    """Fold committed update/delete deltas into the base layout — the
    periodic compaction the delta design amortizes against at 10^12 docs
    (docstring of this module; SURVEY.md §2.10).

    After compaction:
    - ``docs/`` holds exactly one (the latest committed) version per
      doc_id as root-level files — including dedup losers and deleted
      docs, whose rows ARE the re-crawl watermark (the same page version
      re-presented later must still be skipped);
    - ``postings/bucket=N/`` holds one merged file per bucket with
      superseded versions and loser/deleted tombstones physically
      removed (supersede bakes in: the derivation over the new docs is
      empty by construction);
    - ``dedup/`` holds the CURRENT loser set (so load_tokenized's
      root-minus-losers rule stays exact);
    - rescore overrides and delete records are NOT baked: overrides stay
      derived-valid against the kept latest versions (baking them would
      desync docs.quality_score from the posting column and break the
      rescore no-change detection), delete records keep their watermark
      role.

    Swap protocol: every ``<stage>.compact`` dir is fully written, then
    a marker commits the swap; _finish_compaction() redoes a crashed
    swap at the next update/compact entry.  A refresh runs after the
    swap so segments/df/stats always describe the new layout."""
    t0 = time.time()
    _clean_partial_deltas(index_dir)
    _finish_compaction(index_dir)

    has_deltas = any(
        glob.glob(os.path.join(stage_dir(index_dir, st), "delta-*"))
        for st in ("docs", "postings")
    )
    supersede, losers, deleted, _overrides, _n = _derive_refresh_state(index_dir)
    # Deleted docs keep their records (re-crawl watermark) forever, so a
    # signature of the folded tombstone set makes compaction idempotent:
    # re-fold only when deltas/supersede exist or the deleted set changed
    # since the last compaction.
    import hashlib as _hashlib

    tomb_sig = _hashlib.blake2b(
        np.asarray(sorted(deleted), dtype=np.int64).tobytes(), digest_size=8
    ).hexdigest()
    with open(os.path.join(index_dir, "stats.json")) as f:
        _stats_now = json.load(f)
    if (
        not has_deltas
        and not supersede
        and _stats_now.get("compacted_tomb_sig") == tomb_sig
    ):
        return {"compacted": False, "reason": "nothing to fold"}

    docs_dir = stage_dir(index_dir, "docs")
    postings_dir = stage_dir(index_dir, "postings")
    dedup_dir = stage_dir(index_dir, "dedup")
    for d in (docs_dir, postings_dir, dedup_dir):
        shutil.rmtree(d + ".compact", ignore_errors=True)

    # ---- docs: drop superseded OLD versions (stream, no shuffle) -------
    files = _committed_doc_files(index_dir)
    if supersede:
        sup_lookup = ray.put(_sorted_lookup_pair(supersede))

        def drop_old_versions(batch: pa.Table) -> pa.Table:
            sk, sv = ray.get(sup_lookup)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            warcs = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(sk, ids), len(sk) - 1)
            hit = sk[pos] == ids
            return batch.filter(pa.array(~(hit & (warcs < sv[pos]))))

        rd.read_parquet(files).map_batches(
            drop_old_versions, batch_format="pyarrow"
        ).write_parquet(docs_dir + ".compact")
    else:
        rd.read_parquet(files).write_parquet(docs_dir + ".compact")
    with open(os.path.join(docs_dir + ".compact", "_SUCCESS"), "w") as f:
        f.write("{}")

    # ---- postings: one merged tombstone-free file per bucket -----------
    buckets = bucket_file_map([postings_dir])
    if not buckets:
        raise RuntimeError(
            "compact_index requires the bucket-partitioned postings layout"
        )
    drop_ref = ray.put((frozenset(losers | deleted), supersede, {}))

    @ray.remote
    def compact_bucket(bucket: int, bfiles: list, drop, out_root: str) -> int:
        import pyarrow.parquet as _pq

        from myaku_ray.index.segment_build import POSTING_COLS, apply_drop

        cols = POSTING_COLS
        if _pq.read_schema(bfiles[0]).get_field_index("positions") != -1:
            # positional index: the sidecar must survive compaction, or
            # the next refresh would silently re-encode without pos_blob
            cols = POSTING_COLS + ["positions"]
        t = pa.concat_tables(
            [_pq.read_table(f, columns=cols) for f in bfiles]
        )
        loser_set, sup, ov = drop
        t = apply_drop(t, loser_set, sup, ov)
        d = os.path.join(out_root, f"bucket={bucket}")
        os.makedirs(d, exist_ok=True)
        _pq.write_table(t, os.path.join(d, "compacted-00000.parquet"),
                        compression="lz4")
        return t.num_rows

    ray.get(
        [
            compact_bucket.remote(b, bfiles, drop_ref, postings_dir + ".compact")
            for b, bfiles in sorted(buckets.items())
        ]
    )
    with open(os.path.join(postings_dir + ".compact", "_SUCCESS"), "w") as f:
        f.write("{}")

    # ---- dedup: current loser set --------------------------------------
    os.makedirs(dedup_dir + ".compact", exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(losers), pa.int64())}),
        os.path.join(dedup_dir + ".compact", "losers.parquet"),
    )
    with open(os.path.join(dedup_dir + ".compact", "_SUCCESS"), "w") as f:
        f.write("{}")

    # ---- commit the swap ------------------------------------------------
    _atomic_write_json(_compact_marker(index_dir), {"stages": _COMPACT_STAGES})
    _finish_compaction(index_dir)

    append_lineage(
        index_dir, stage="compact", n_losers=len(losers),
        n_superseded=len(supersede), wall_s=round(time.time() - t0, 3),
    )
    metrics = {"compacted": True, "n_superseded_folded": len(supersede)}
    metrics.update(refresh_index(index_dir))
    with open(os.path.join(index_dir, "stats.json")) as f:
        _stats = json.load(f)
    _stats["compacted_tomb_sig"] = tomb_sig
    _atomic_write_json(os.path.join(index_dir, "stats.json"), _stats)
    metrics["compact_wall_s"] = round(time.time() - t0, 3)
    return metrics


def _sorted_lookup_pair(mapping: dict) -> tuple[np.ndarray, np.ndarray]:
    keys = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
    vals = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
    order = np.argsort(keys)
    return keys[order], vals[order]


# ---------------------------------------------------------------------------
# document removal (check_for_removed_articles analog)
# ---------------------------------------------------------------------------

def delete_urls(
    index_dir: str,
    urls: list[str],
    *,
    tokenize_concurrency: int | tuple | None = (1, 8),
    tokenize_batch_size: int = 128,
) -> dict:
    """Remove documents whose source pages disappeared (the reference's
    check_for_removed_articles runner, runners/check_for_removed_articles
    .py — there the article is flagged `page_removed`; here its postings
    are tombstoned and the index refreshed).

    Deletion interacts with exact dedup exactly like a re-crawl that
    changes content: if a deleted doc was a text_hash winner, its
    smallest surviving duplicate is resurrected (tokenized now if its
    postings never existed)."""
    t0 = time.time()
    prep = _prepare_delete(index_dir, urls)
    metrics = prep["metrics"]
    need = prep["need"]
    if prep["noop"]:
        return metrics

    if need:
        k = _next_delta_id(index_dir)
        postings_delta_dir = os.path.join(
            stage_dir(index_dir, "postings"), f"delta-{k}"
        )
        docs_all = rd.read_parquet(
            stage_dir(index_dir, "docs"),
            columns=["doc_id", "text", "quality_score", "warc_ts"],
        )

        with open(os.path.join(index_dir, "stats.json")) as f:
            _stats = json.load(f)
        docs_all.map_batches(
            _make_keep_need(need), batch_format="pyarrow"
        ).map_batches(
            TokenizeStage,
            batch_format="pyarrow",
            batch_size=tokenize_batch_size,
            concurrency=tokenize_concurrency,
            num_cpus=1,
            fn_constructor_kwargs={
                "salt_buckets": _stats["salt_buckets"],
                "encode_buckets": _stats.get("encode_buckets", 64),
                # positional indexes must stay positional across updates:
                # the encode task concats base + delta postings, so their
                # schemas have to agree
                "with_positions": _stats.get("with_positions", False),
            },
        ).write_parquet(postings_delta_dir, partition_cols=["bucket"], compression="lz4")
        _write_tokenized_shard(postings_delta_dir, need)
        _mark_delta_done(postings_delta_dir)

    append_lineage(
        index_dir, stage="delete", n_deleted=metrics["n_deleted"],
        n_resurrected=len(need), wall_s=round(time.time() - t0, 3),
    )
    metrics.update(refresh_index(index_dir))
    metrics["refreshed"] = True
    return metrics


def _prepare_delete(index_dir: str, urls: list[str]) -> dict:
    """Shared derivation phase of delete_urls — record the user action,
    recompute dedup over survivors, find never-tokenized resurrected
    winners.  Identical for the monolithic and sharded layouts
    (pipelines/shard.py routes the resurrection delta through the hive
    (shard, bucket) write afterwards)."""
    metrics: dict = {}
    _clean_partial_deltas(index_dir)
    _finish_compaction(index_dir)

    old = _docs_light(index_dir)
    tokenized = load_tokenized(index_dir)
    latest_warc = dict(zip(old["doc_id"].astype(int), old["warc_us"].astype(int)))
    del_records = load_deleted(index_dir)
    already = effective_deleted(latest_warc, del_records)
    url_ids = set(
        old.loc[old["url"].isin(set(urls)), "doc_id"].astype(int)
    )
    new_deleted = url_ids - already
    metrics["n_deleted"] = len(new_deleted)
    if not new_deleted:
        metrics["refreshed"] = False
        return {"metrics": metrics, "need": set(), "noop": True}
    # the delete record IS the user action — persist it first (atomic);
    # everything downstream (losers, resurrection) derives from it
    for d in new_deleted:
        del_records[d] = latest_warc[d]
    save_deleted(index_dir, del_records)
    deleted = already | new_deleted

    # dedup recompute over surviving docs (winner = min doc_id)
    live = old[~old["doc_id"].isin(deleted)]
    winners = live.groupby("text_hash")["doc_id"].min()
    winner_ids = set(winners.astype(int))
    losers = set(live["doc_id"].astype(int)) - winner_ids

    # resurrected winners that were never tokenized
    live_versions = set(zip(live["doc_id"].astype(int), live["warc_us"].astype(int)))
    need = {
        (d, w) for (d, w) in live_versions
        if d in winner_ids and (d, w) not in tokenized
    }
    metrics["n_resurrected"] = len(need)
    return {"metrics": metrics, "need": need, "noop": False}
