"""Distributed posting-list -> segment encoding (shared by build + refresh).

The (term, salt) grouping that materializes posting sub-lists is the big
shuffle of the index build.  Shuffling with ONE Ray group per (term, salt)
pays per-group scheduling + table-construction overhead ~|vocab|×salt
times; instead rows are grouped by a coarse BUCKET (hash(term, salt) %
n_buckets, a few per CPU), and each bucket group Arrow-sorts its rows and
encodes every (term, salt) sub-list inside one vectorized pass.  Salting
still bounds the largest sub-list (a high-df particle's postings split
into `salt_buckets` disjoint doc_id strides that land in different
buckets), so no single task holds a whole skewed posting list.

Segment assignment stays `term_hash(term) % num_segments` so query
routing is computable client-side (SURVEY.md §4 partitioning key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from myaku_ray.index.codec import encode_postings
from myaku_ray.index.util import term_hash
from myaku_ray.scoring import posting_scores_vec

DEFAULT_ENCODE_BUCKETS = 256

SEGMENT_ROW_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("df", pa.int64()),
        ("count", pa.int64()),
        ("max_score", pa.float32()),
        ("blob", pa.binary()),
        ("segment", pa.int32()),
    ]
)


def _empty_rows() -> pa.Table:
    return pa.table(
        {
            "term": pa.array([], pa.string()),
            "salt": pa.array([], pa.int32()),
            "df": pa.array([], pa.int64()),
            "count": pa.array([], pa.int64()),
            "max_score": pa.array([], pa.float32()),
            "blob": pa.array([], pa.binary()),
            "segment": pa.array([], pa.int32()),
        }
    )


def partial_df(batch: pa.Table) -> pa.Table:
    """Map-side combiner for the df/ctf aggregation: one Arrow-native
    group_by per batch, so the global groupby shuffles ~|vocab| rows per
    batch instead of every posting row."""
    g = (
        batch.select(["term", "tf"])
        .group_by("term")
        .aggregate([("tf", "count"), ("tf", "sum")])
    )
    return pa.table(
        {
            "term": g["term"],
            "pdf_count": g["tf_count"].cast(pa.int64()),
            "ptf": g["tf_sum"].cast(pa.int64()),
        }
    )


def add_salt_bucket(batch: pa.Table, salt_buckets: int, n_buckets: int) -> pa.Table:
    """Append salt + encode-bucket columns.

    Hashes each UNIQUE term once per batch (vocab ≪ rows), then scatters."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    salt = (ids % salt_buckets).astype(np.int32)
    enc = batch["term"].combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    uniques = enc.dictionary.to_pylist()
    uhash = np.fromiter(
        (term_hash(t) for t in uniques), dtype=np.int64, count=len(uniques)
    )
    bucket = ((uhash[codes] * np.int64(31) + salt) % n_buckets).astype(
        np.int32
    )
    return batch.append_column("salt", pa.array(salt)).append_column(
        "bucket", pa.array(bucket)
    )


def make_add_keys_fn(salt_buckets: int, n_buckets: int):
    def add_keys(batch: pa.Table) -> pa.Table:
        return add_salt_bucket(batch, salt_buckets, n_buckets)

    return add_keys


def encode_bucket_table(
    g: pa.Table, dfs: dict, n_docs: int, avgdl: float, num_segments: int
) -> pa.Table:
    """Encode every (term, salt) sub-list inside one bucket's rows.

    When the input carries a ``positions`` column (positional build),
    each output row additionally gets a ``pos_blob`` assembled from the
    sorted per-posting records (index/positions.py) — the score blob is
    byte-identical to the non-positional build's."""
    if g.num_rows == 0:
        return _empty_rows()
    g = g.sort_by(
        [("term", "ascending"), ("salt", "ascending"), ("doc_id", "ascending")]
    )
    with_pos = "positions" in g.schema.names
    pos_arr = None
    if with_pos:
        pos_arr = g["positions"].combine_chunks()
        if isinstance(pos_arr, pa.ChunkedArray):  # pyarrow version drift
            pos_arr = (
                pos_arr.chunk(0) if pos_arr.num_chunks
                else pa.array([], pa.binary())
            )
    # dictionary-encode instead of to_pylist: only the (vocab-sized)
    # dictionary materializes as Python strings, never the row column
    enc = g["term"].combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    uniques = enc.dictionary.to_pylist()
    salts = g["salt"].to_numpy(zero_copy_only=False)
    ids = g["doc_id"].to_numpy(zero_copy_only=False)
    tfs = g["tf"].to_numpy(zero_copy_only=False)
    dls = g["doclen"].to_numpy(zero_copy_only=False)
    qs = g["quality"].to_numpy(zero_copy_only=False)
    ws = g["warc_us"].to_numpy(zero_copy_only=False)
    # group boundaries where (term code, salt) changes
    change = np.empty(len(codes), dtype=bool)
    change[0] = True
    change[1:] = (codes[1:] != codes[:-1]) | (salts[1:] != salts[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(codes))

    out_term: list[str] = []
    out_salt: list[int] = []
    out_df: list[int] = []
    out_count: list[int] = []
    out_max: list[float] = []
    out_blob: list[bytes] = []
    out_seg: list[int] = []
    out_pos: list[bytes] = []
    if with_pos:
        from myaku_ray.index.positions import encode_pos_blob_from_arrow
    for lo, hi in zip(starts, ends):
        term = uniques[codes[lo]]
        df = int(dfs[term])
        scores = posting_scores_vec(
            tfs[lo:hi], dls[lo:hi], qs[lo:hi], df, n_docs, avgdl
        )
        blob = encode_postings(ids[lo:hi], tfs[lo:hi], scores, ws[lo:hi])
        out_term.append(term)
        out_salt.append(int(salts[lo]))
        out_df.append(df)
        out_count.append(hi - lo)
        out_max.append(float(scores.max()))
        out_blob.append(blob)
        out_seg.append(term_hash(term) % num_segments)
        if with_pos:
            out_pos.append(encode_pos_blob_from_arrow(pos_arr, int(lo), int(hi)))
    cols = {
        "term": pa.array(out_term, pa.string()),
        "salt": pa.array(out_salt, pa.int32()),
        "df": pa.array(out_df, pa.int64()),
        "count": pa.array(out_count, pa.int64()),
        "max_score": pa.array(out_max, pa.float32()),
        "blob": pa.array(out_blob, pa.binary()),
    }
    if with_pos:
        cols["pos_blob"] = pa.array(out_pos, pa.binary())
    cols["segment"] = pa.array(out_seg, pa.int32())
    return pa.table(cols)


def make_encode_bucket_fn(df_ref, n_docs: int, avgdl: float, num_segments: int):
    """Group fn wrapper for the Dataset groupby fallback path."""

    def encode_bucket(g: pa.Table) -> pa.Table:
        dfs = ray.get(df_ref) if not isinstance(df_ref, dict) else df_ref
        return encode_bucket_table(g, dfs, n_docs, avgdl, num_segments)

    return encode_bucket


def encode_segments(
    postings_ds,
    seg_root: str,
    *,
    df_map: dict,
    n_docs: int,
    avgdl: float,
    num_segments: int,
    salt_buckets: int,
    n_buckets: int = DEFAULT_ENCODE_BUCKETS,
) -> None:
    """postings Dataset -> partitioned segment parquet under seg_root."""
    df_ref = ray.put(df_map)
    keyed = postings_ds.map_batches(
        make_add_keys_fn(salt_buckets, n_buckets), batch_format="pyarrow"
    )
    rows = keyed.groupby("bucket").map_groups(
        make_encode_bucket_fn(df_ref, n_docs, avgdl, num_segments),
        batch_format="pyarrow",
    )
    rows.write_parquet(seg_root, partition_cols=["segment"])


# ---------------------------------------------------------------------------
# Shuffle-free encode over bucket-partitioned postings
# ---------------------------------------------------------------------------
#
# When the tokenize stage writes postings hive-partitioned by encode
# bucket (``postings/bucket=N/``), the filesystem already IS the shuffle:
# every bucket directory holds exactly the rows one encode group needs,
# written map-side by the tokenize tasks.  Encoding then reads each
# bucket's files in ONE task and never moves a posting row through the
# object store.  The Dataset API cannot express "treat each hive
# partition as a complete group without re-shuffling", so this path uses
# raw Ray tasks over the partition directories — the documented
# last-resort case (a partitioning assumption the layout guarantees).

def _sorted_lookup(mapping: dict) -> tuple[np.ndarray, np.ndarray]:
    """dict[int,int] -> parallel (sorted keys, values) arrays."""
    keys = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
    vals = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
    order = np.argsort(keys)
    return keys[order], vals[order]


def _lookup(
    keys_sorted: np.ndarray, vals_sorted: np.ndarray, queries: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized dict lookup: (hit mask, value-or-garbage per query)."""
    pos = np.searchsorted(keys_sorted, queries)
    pos_c = np.minimum(pos, len(keys_sorted) - 1)
    hit = keys_sorted[pos_c] == queries
    return hit, vals_sorted[pos_c]


def apply_drop(
    t: pa.Table,
    losers: frozenset,
    supersede: dict,
    overrides: dict,
) -> pa.Table:
    """Tombstone filter + quality overrides (refresh/rescore semantics).
    Fully vectorized: sorted-array membership / searchsorted lookups, no
    per-row Python."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    if losers or supersede:
        mask = np.ones(len(ids), dtype=bool)
        if losers:
            loser_arr = np.fromiter(losers, dtype=np.int64, count=len(losers))
            loser_arr.sort()
            mask &= ~np.isin(ids, loser_arr)
        if supersede:
            warcs = t["warc_us"].to_numpy(zero_copy_only=False)
            sk, sv = _sorted_lookup(supersede)
            hit, min_warc = _lookup(sk, sv, ids)
            mask &= ~(hit & (warcs.astype(np.int64) < min_warc))
        t = t.filter(pa.array(mask))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
    if overrides:
        qs = t["quality"].to_numpy(zero_copy_only=False).astype(np.int32)
        ok_, ov = _lookup(*_sorted_lookup(overrides), ids)
        new_q = np.where(ok_, ov.astype(np.int32), qs)
        t = t.set_column(
            t.schema.get_field_index("quality"), "quality",
            pa.array(new_q, pa.int32()),
        )
    return t


POSTING_COLS = ["term", "salt", "doc_id", "tf", "doclen", "quality", "warc_us"]

# One encode task never reads more than ~this much compressed postings
# input; buckets above it split into term-hash parts (see
# encode_segments_partitioned).  Bounds the segments-stage straggler on
# hot-bucket collisions AND keeps task size constant past the bucket-count
# cap at very large corpora.
ENCODE_TASK_TARGET_BYTES = 16 * 1024 * 1024


@ray.remote
def _encode_bucket_task(
    bucket_id: int,
    files: list,
    df_map: dict,
    n_docs: int,
    avgdl: float,
    num_segments: int,
    drop,
    seg_root: str,
    part: int = 0,
    n_parts: int = 1,
    marker_path: str | None = None,
) -> tuple[int, int, float]:
    import os
    import time

    import pyarrow.parquet as pq

    t0 = time.time()
    cols = POSTING_COLS
    if pq.read_schema(files[0]).get_field_index("positions") != -1:
        cols = POSTING_COLS + ["positions"]  # positional build sidecar
    if n_parts > 1:
        # term-hash part filter, applied PER FILE during the read so a
        # part task's peak memory is one file's decode + its own kept
        # subset — never the whole bucket.  A term's postings stay whole
        # within one part, so encode output is identical to the unsplit
        # task's — just written across n_parts files.  (Each part does
        # re-scan the bucket's files; n_parts is capped so the extra
        # sequential scans stay bounded — the common-path sizing lever
        # is the bucket COUNT, this is the hot-bucket valve.)
        kept = []
        for f in files:
            ft = pq.read_table(f, columns=cols)
            enc = ft["term"].combine_chunks().dictionary_encode()
            uhash = np.fromiter(
                (term_hash(x) for x in enc.dictionary.to_pylist()),
                dtype=np.int64,
                count=len(enc.dictionary),
            )
            upart = (np.abs(uhash) // 7) % n_parts  # decorrelate from bucket
            keep = upart[
                enc.indices.to_numpy(zero_copy_only=False)
            ] == part
            kept.append(ft.filter(pa.array(keep)))
        t = pa.concat_tables(kept)
    else:
        t = pa.concat_tables(
            [pq.read_table(f, columns=cols) for f in files]
        )
    in_rows = t.num_rows
    if drop is not None:
        losers, supersede, overrides = drop
        t = apply_drop(t, losers, supersede, overrides)
    rows = encode_bucket_table(t, df_map, n_docs, avgdl, num_segments)
    suffix = f"-p{part}" if n_parts > 1 else ""
    segs = rows["segment"].to_numpy(zero_copy_only=False)
    for seg in np.unique(segs):
        sub = rows.filter(pa.array(segs == seg))
        d = os.path.join(seg_root, f"segment={int(seg)}")
        os.makedirs(d, exist_ok=True)
        _write_rg_bounded(
            sub.drop_columns(["segment"]),
            os.path.join(d, f"bucket-{bucket_id:05d}{suffix}.parquet"),
        )
    wall = time.time() - t0
    if marker_path is not None:
        # Durable per-partition checkpoint, written ATOMICALLY and LAST:
        # its existence means every output file of this (bucket, part)
        # is complete, so a resumed stage can skip the task outright.
        import json

        tmp = marker_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(
                json.dumps(
                    {"rows_out": int(rows.num_rows), "rows_in": int(in_rows),
                     "wall_s": round(wall, 3), "n_parts": int(n_parts)}
                )
            )
        os.replace(tmp, marker_path)
    return rows.num_rows, in_rows, wall


# Row-group bounds for segment files: the query path reads ONLY the row
# groups containing the requested term (_SegmentFileIndex point reads),
# so each group's blob payload bounds the innocent bytes a lookup drags
# in.  Byte-bounded cutting keeps that true under df skew — one hot
# term's multi-MB sub-list gets its own group instead of padding its
# 511 neighbors' lookups.
SEG_RG_MAX_ROWS = 128
SEG_RG_MAX_BYTES = 256 * 1024


def _write_rg_bounded(tbl: pa.Table, path: str) -> None:
    """Write a term-sorted segment table with row groups cut at
    SEG_RG_MAX_ROWS rows or SEG_RG_MAX_BYTES of blob payload, whichever
    comes first (zero-copy slices into one ParquetWriter)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    lens = pc.binary_length(tbl["blob"].combine_chunks()).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    if "pos_blob" in tbl.schema.names:  # positional build: bound both payloads
        lens = lens + pc.binary_length(
            tbl["pos_blob"].combine_chunks()
        ).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(lens)
    cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])
    with pq.ParquetWriter(path, tbl.schema) as w:
        lo = 0
        while lo < n:
            hi = int(
                np.searchsorted(cum, cum[lo] + SEG_RG_MAX_BYTES, "right")
            ) - 1
            hi = max(min(hi, lo + SEG_RG_MAX_ROWS), lo + 1)
            w.write_table(tbl.slice(lo, hi - lo))
            lo = hi


def bucket_file_map(postings_roots: list) -> dict[int, list]:
    """bucket id -> parquet files, parsed from any ``bucket=N`` path
    component under the given roots (base + update deltas)."""
    import glob
    import os

    out: dict[int, list] = {}
    for root in postings_roots:
        for f in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True):
            if os.path.basename(f).startswith("_"):
                continue  # metadata shards (e.g. _tokenized.parquet)
            bucket = None
            for part in f.split(os.sep):
                if part.startswith("bucket="):
                    bucket = int(part.split("=")[1])
                    break
            if bucket is None:
                # mixed/legacy layout: one un-bucketed file poisons the
                # whole map — the caller must use the shuffle path
                return {}
            out.setdefault(bucket, []).append(f)
    return out


def encode_segments_partitioned(
    postings_roots: list,
    seg_root: str,
    *,
    df_map: dict,
    n_docs: int,
    avgdl: float,
    num_segments: int,
    drop=None,
    resume: bool = False,
    markers_newer_than: float = -1.0,
) -> bool:
    """Encode from bucket-partitioned postings; returns False when the
    layout is not partitioned (caller falls back to the shuffle path).

    With ``resume``, finished (bucket, part) tasks — those with a durable
    ``_done`` marker written atomically AFTER their outputs — are skipped,
    so an interrupted segments stage redoes only unfinished partitions
    (at 100-TB scale the stage is thousands of tasks; losing all of them
    to one preemption would make long builds non-convergent).  Markers
    older than ``markers_newer_than`` (the upstream postings stage's
    completion time) are stale — the postings they encoded were replaced
    — and are ignored; un-markered partitions get their deterministic
    output filenames deleted before re-encode, so no row duplicates."""
    import glob as _glob
    import json as _json
    import os as _os

    buckets = bucket_file_map(postings_roots)
    if not buckets:
        return False
    done_dir = _os.path.join(seg_root, "_done")
    _os.makedirs(done_dir, exist_ok=True)

    # Expected partition names for THIS run's layout.  n_parts follows
    # the buckets' current byte sizes, so a resume after inputs changed
    # can change a bucket's naming set (1 part <-> several); any output
    # file or marker OUTSIDE the expected set is an orphan from the old
    # layout and must go, or the searcher would read duplicated postings
    # (it globs every parquet in a segment dir).
    parts_of: dict[int, int] = {}
    for b, files in buckets.items():
        est = sum(_os.path.getsize(f) for f in files)
        parts_of[b] = min(max(1, -(-est // ENCODE_TASK_TARGET_BYTES)), 16)
    expected = set()
    for b, np_ in parts_of.items():
        for part in range(np_):
            expected.add(
                f"bucket-{b:05d}" + (f"-p{part}" if np_ > 1 else "")
            )
    for f in _glob.glob(
        _os.path.join(seg_root, "segment=*", "bucket-*.parquet")
    ):
        if _os.path.basename(f)[: -len(".parquet")] not in expected:
            _os.remove(f)
    for f in _glob.glob(_os.path.join(done_dir, "*.json")):
        if _os.path.basename(f)[: -len(".json")] not in expected:
            _os.remove(f)

    df_ref = ray.put(df_map)
    drop_ref = ray.put(drop)
    refs = []
    skipped: list[tuple[int, int, float]] = []
    for b, files in sorted(buckets.items()):
        # Straggler/scale bound: the bucket COUNT is capped (write
        # fan-out), so at large corpora — or under hot-term collisions —
        # a single bucket's rows can far exceed the constant task size
        # the auto-sizing targets.  Oversized buckets split into
        # term-hash parts: each part filters the same input files to its
        # term subset and writes its own output file, so no encode task
        # ever exceeds ~ENCODE_TASK_TARGET_BYTES of input regardless of
        # corpus size.  Output rows are identical (a term's postings
        # stay whole within one part); readers glob *.parquet per
        # segment dir, so the extra files are invisible to queries.
        # cap: each part re-scans the bucket's files, so the valve is
        # bounded at 16 extra sequential scans; past that the right
        # lever is more buckets (auto-sizing), not more parts
        n_parts = parts_of[b]
        for part in range(n_parts):
            name = f"bucket-{b:05d}" + (f"-p{part}" if n_parts > 1 else "")
            marker = _os.path.join(done_dir, f"{name}.json")
            if resume and _os.path.exists(marker):
                with open(marker) as f:
                    m = _json.load(f)
                # a marker is valid only for the part MODULUS it was
                # written under: terms are hash%n_parts-partitioned, so
                # e.g. a 4->2 change keeps p0/p1's NAMES in the expected
                # set while their contents cover only hash%4 in {0,1} —
                # trusting them would silently drop half the terms
                if (
                    _os.path.getmtime(marker) >= markers_newer_than
                    and m.get("n_parts") == n_parts
                ):
                    skipped.append(
                        (m["rows_out"], m["rows_in"], m["wall_s"])
                    )
                    continue
                _os.remove(marker)  # stale: postings re-ran or layout changed
            # un-markered partition: clear any half-written outputs of a
            # previous attempt (filenames are deterministic, so this is
            # exact), then re-encode
            for stale in _glob.glob(
                _os.path.join(seg_root, "segment=*", f"{name}.parquet")
            ):
                _os.remove(stale)
            refs.append(
                _encode_bucket_task.remote(
                    b, files, df_ref, n_docs, avgdl, num_segments,
                    drop_ref, seg_root, part, n_parts, marker,
                )
            )
    stats = list(ray.get(refs)) + skipped
    # Per-task skew profile: the stage wall at high parallelism is
    # max(task walls), so the straggler distribution is the scaling
    # diagnostic.  Written next to the segments for lineage to pick up.
    walls = sorted(s[2] for s in stats)
    in_rows = [s[1] for s in stats]
    import json as _json
    import os as _os

    with open(_os.path.join(seg_root, "_encode_tasks.json"), "w") as f:
        f.write(
            _json.dumps(
                {
                    "n_tasks": len(stats),
                    "n_resumed": len(skipped),
                    "rows_in_max": max(in_rows),
                    "rows_in_median": int(np.median(in_rows)),
                    "wall_max_s": round(walls[-1], 3),
                    "wall_p90_s": round(walls[int(len(walls) * 0.9)], 3),
                    "wall_median_s": round(walls[len(walls) // 2], 3),
                    "wall_sum_s": round(sum(walls), 3),
                }
            )
        )
    return True


@ray.remote
def _bucket_df_task(files: list, drop) -> pa.Table:
    import pyarrow.parquet as pq

    cols = ["term", "tf"] if drop is None else ["term", "tf", "doc_id", "warc_us"]
    t = pa.concat_tables([pq.read_table(f, columns=cols) for f in files])
    if drop is not None:
        losers, supersede, _overrides = drop
        t = apply_drop(t, losers, supersede, {})
    return partial_df(t)


def df_from_buckets(buckets: dict[int, list], drop=None) -> pa.Table:
    """(term, df, ctf) via one partial-df task per bucket + a driver merge.

    A term's rows span at most `salt_buckets` buckets, so the merge input
    is ≤ salt_buckets × |vocab| rows — vocabulary-sized, not
    postings-sized.  (At extreme vocab scale the fallback is the
    distributed groupby in the pipelines.)"""
    drop_ref = ray.put(drop)
    parts = ray.get(
        [
            _bucket_df_task.remote(files, drop_ref)
            for _, files in sorted(buckets.items())
        ]
    )
    merged = (
        pa.concat_tables(parts)
        .group_by("term")
        .aggregate([("pdf_count", "sum"), ("ptf", "sum")])
    )
    return pa.table(
        {
            "term": merged["term"],
            "df": merged["pdf_count_sum"].cast(pa.int64()),
            "ctf": merged["ptf_sum"].cast(pa.int64()),
        }
    )
