"""Impact-ordered static index pruning — the serve-mostly tier.

Anh & Moffat-style static pruning: keep, per TERM, only the top-P
postings by the engine's total rank key (score, warc_us, doc_id) DESC
and re-encode them into a normal segment layout.  The pruned directory
is a fully valid index (``Searcher(pruned_dir)`` serves it unchanged):
single-term top-k with k <= P is EXACT by construction (the kept set is
a rank-key prefix), multi-term disjunctive queries become approximate —
the classic latency/recall trade a 10^12-doc serving tier makes when a
particle's posting list is a terabyte.  ``docs/`` / ``df/`` / ``dedup/``
are SHARED with the source index via symlink (pruning changes which
postings are scanned, never doc payloads or global stats), so the
pruned tier costs only the re-encoded segments — P rows per term.

Scale shape: ONE ``groupby(term)`` exchange over the segment rows
(terms are already hash-partitioned by segment, so rows never cross
segment partitions), then a per-term decode -> lexsort-select ->
re-encode inside ``map_groups``.  Nothing corpus-sized ever sits on the
driver.

df semantics over the pruned layout (round-4 ADVICE): pruned rows store
``df`` = the ORIGINAL corpus document frequency and ``count`` = kept
postings (<= P).  ``Searcher.term_df`` reads the ``df`` column, so
df-dependent serving paths (PRF expansion, significant terms, suggest
ranking, vocab stats) report the real corpus df over BOTH tiers; only
the scanned posting set differs.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

PRUNE_MAX_POSTINGS = 64


def _share_dir(src: str, dst: str) -> None:
    """Symlink a source-index subdir into the pruned layout (copy
    fallback for filesystems without symlinks) — the production
    contract: docs and global stats are shared, not duplicated."""
    if not os.path.isdir(src):
        return
    try:
        os.symlink(os.path.abspath(src), dst)
    except OSError:
        shutil.copytree(src, dst)


def prune_index(
    index_dir: str,
    out_dir: str,
    max_postings: int = PRUNE_MAX_POSTINGS,
) -> dict:
    """Derive the pruned serving tier from a built index.

    Returns {"n_terms", "postings_in", "postings_kept"}.  Idempotent via
    a ``_PRUNED`` marker (same convention as the build stages)."""
    from myaku_ray.index.codec import decode_all, encode_postings

    marker = os.path.join(out_dir, "_PRUNED")
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for sub in ("docs", "df", "dedup"):
        _share_dir(os.path.join(index_dir, sub), os.path.join(out_dir, sub))
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    stats["pruned_max_postings"] = max_postings
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f)

    def prune_term(g: pd.DataFrame) -> pd.DataFrame:
        ids_p, tfs_p, sc_p, wc_p = [], [], [], []
        for blob in g["blob"]:
            i, t, s, w = decode_all(blob)
            ids_p.append(i)
            tfs_p.append(t)
            sc_p.append(s)
            wc_p.append(w)
        ids = np.concatenate(ids_p)
        tfs = np.concatenate(tfs_p)
        scores = np.concatenate(sc_p)
        warc = np.concatenate(wc_p)
        if len(ids) > max_postings:
            # rank key (score, warc_us, doc_id) DESC: lexsort is
            # ascending with the LAST key primary, so take the tail
            keep = np.lexsort((ids, warc, scores))[-max_postings:]
            ids, tfs, scores, warc = (
                ids[keep], tfs[keep], scores[keep], warc[keep],
            )
        order = np.argsort(ids, kind="stable")
        blob = encode_postings(
            ids[order], tfs[order], scores[order], warc[order]
        )
        return pd.DataFrame(
            {
                "term": [g["term"].iloc[0]],
                "salt": np.array([0], np.int32),
                "df": np.array([int(g["df"].max())], np.int64),
                "count": np.array([len(ids)], np.int64),
                "max_score": np.array([float(scores.max())], np.float32),
                "blob": [blob],
                "segment": np.array([int(g["segment"].iloc[0])], np.int32),
                "n_in": np.array([int(g["count"].sum())], np.int64),
            }
        )

    seg_src = os.path.join(index_dir, "segments")
    pruned = (
        rd.read_parquet(seg_src)
        .groupby("term")
        .map_groups(prune_term, batch_format="pandas")
        .materialize()
    )
    totals = pruned.sum(["n_in", "count"])
    out = {
        "n_terms": pruned.count(),
        "postings_in": int(totals["sum(n_in)"]),
        "postings_kept": int(totals["sum(count)"]),
    }
    pruned.drop_columns(["n_in"]).write_parquet(
        os.path.join(out_dir, "segments"),
        partition_cols=["segment"],
    )
    with open(marker, "w") as f:
        json.dump(out, f)
    return out
