"""Time-decay rescore: recompute recency-dependent quality scores.

Reproduces the reference rescore flow (myaku/runners/rescore.py ->
myaku/datastore/index_rescore.py:40-343): article quality contains a
publication-recency factor with bucket boundaries at 7/30/90/180/365/1095
days, so scores decay as wall-clock advances.  The reference selects only
articles whose age crossed a bucket boundary since the last rescore,
rescores them, and propagates the new score into every FLI row of the
article via a server-side update pipeline.

Ray-Data expression:

1. ``map_batches`` over the docs table recomputes the full integer quality
   score per doc at ``now`` (pure arithmetic on stored columns + the
   broadcast blog-ratings dim — no tokenization, no text reads beyond the
   needed columns) and emits only CHANGED (doc_id, quality, warc_us)
   rows — docs whose age stayed inside its bucket produce nothing, exactly
   the reference's boundary-crossing selection, computed instead of
   tracked.
2. Changed rows merge into ``quality_overrides.parquet`` keyed by the
   version they scored (warc_us): a later re-crawl invalidates the
   override by derivation (pipelines.update.effective_overrides), no
   mutation needed.  The segment refresh applies effective overrides as a
   column substitution on the posting stream before re-encoding.
   tf/df/doclen are untouched, so the df shuffle is skipped
   (``refresh_index(recompute_df=False)``) — only the cheap encode
   shuffle runs, the analog of the reference rewriting FLI rank fields
   without re-analyzing text (index_rescore.py:199-282).
3. ``stats.json`` records the new clock (``fixed_now_us``) — the
   rescore-tracking checkpoint (index_rescore.py:332-343).

Parity contract: after ``rescore_index(idx, now=T)``, every query is
rank-identical to a from-scratch oracle built with ``fixed_now=T``.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import ray
import ray.data as rd

from myaku_ray.corpus import blog_url_of, order_nums_of
from myaku_ray.pipelines.update import (
    _docs_versions,
    derive_supersede,
    effective_overrides,
    load_quality_overrides,
    refresh_index,
    save_quality_overrides,
    stage_dir,
)
from myaku_ray.scoring import article_quality_score


def _changed_overrides(
    index_dir: str, now, blog_ratings: dict[str, float]
):
    """(changed (doc_id, quality, warc_us) DataFrame, previous override
    records) — the rescore derivation, shared verbatim by the monolithic
    index and the sharded layout (pipelines/shard.py)."""
    ratings_ref = ray.put(blog_ratings)

    docs = rd.read_parquet(
        stage_dir(index_dir, "docs"),
        columns=[
            "doc_id", "url", "warc_ts", "alnum_count", "quality_score",
            "source", "has_video",
        ],
    )
    versions = _docs_versions(index_dir)
    supersede = derive_supersede(versions)
    latest_warc = {
        int(d): int(w)
        for d, w in versions.groupby("doc_id")["warc_us"].max().items()
    }
    prev_records = load_quality_overrides(index_dir)
    prev_eff = effective_overrides(latest_warc, prev_records)
    prev_ref = ray.put(prev_eff)
    sup_ref = ray.put(supersede)

    def changed_quality(batch: pa.Table) -> pa.Table:
        ratings = ray.get(ratings_ref)
        prev_ov = ray.get(prev_ref)
        sup = ray.get(sup_ref)
        warc_us_all = batch["warc_ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if sup:  # keep only the live version of re-crawled docs
            ids_np = batch["doc_id"].to_numpy(zero_copy_only=False)
            mask = [
                int(i) not in sup or int(w) >= sup[int(i)]
                for i, w in zip(ids_np, warc_us_all)
            ]
            batch = batch.filter(pa.array(mask, pa.bool_()))
            warc_us_all = batch["warc_ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        urls = batch["url"].to_pylist()
        warcs = batch["warc_ts"].to_pylist()
        alnums = batch["alnum_count"].to_pylist()
        stored_q = batch["quality_score"].to_pylist()
        sources = batch["source"].to_pylist()
        vids = batch["has_video"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        out_id, out_q, out_w = [], [], []
        for did, url, warc, alnum, q0, src, hv, wus in zip(
            ids, urls, warcs, alnums, stored_q, sources, vids, warc_us_all
        ):
            border, sorder = order_nums_of(url)
            burl = blog_url_of(url)
            rating = ratings.get(burl) if burl is not None else None
            q = article_quality_score(
                alnum=alnum,
                age_days=(now - warc).days,
                has_video=hv,
                source=src,
                blog_rating=rating,
                blog_article_order=border,
                blog_section_order=sorder,
            )
            current = prev_ov.get(int(did), int(q0))
            if q != current:
                out_id.append(did)
                out_q.append(q)
                out_w.append(int(wus))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "quality": pa.array(out_q, pa.int64()),
                "warc_us": pa.array(out_w, pa.int64()),
            }
        )

    changed = docs.map_batches(changed_quality, batch_format="pyarrow").to_pandas()
    return changed, prev_records


def rescore_index(
    index_dir: str,
    *,
    now,
    blog_ratings: dict[str, float] | None = None,
) -> dict:
    """Rescore all recency-affected docs as of ``now``; refresh segments."""
    t0 = time.time()
    blog_ratings = blog_ratings or {}
    changed, prev_records = _changed_overrides(index_dir, now, blog_ratings)
    n_changed = len(changed)

    metrics = {"n_rescored": n_changed}
    stats_path = os.path.join(index_dir, "stats.json")
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
        save_quality_overrides(index_dir, merged)
        metrics.update(refresh_index(index_dir, recompute_df=False))
        # quality-only change: the first-page cache (if built) is patched
        # incrementally — only the rescored docs' terms are recomputed
        # (the reference's per-term recache decision, cache.py:201-312)
        from myaku_ray.pipelines.first_page import patch_first_page_cache

        fp = patch_first_page_cache(
            index_dir, [int(d) for d in changed["doc_id"]]
        )
        if fp.get("patched_terms"):
            metrics["first_page_patched_terms"] = fp["patched_terms"]
    with open(stats_path) as f:
        stats = json.load(f)
    stats["fixed_now_us"] = int(now.timestamp() * 1_000_000)
    with open(stats_path, "w") as f:
        json.dump(stats, f)
    metrics["rescore_wall_s"] = round(time.time() - t0, 3)
    return metrics
