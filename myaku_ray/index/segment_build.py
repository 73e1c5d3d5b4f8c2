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


def make_add_keys_fn(salt_buckets: int, n_buckets: int):
    """Batch fn adding salt + encode-bucket columns.

    Hashes each UNIQUE term once per batch (vocab ≪ rows), then scatters."""

    def add_keys(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        salt = (ids % salt_buckets).astype(np.int32)
        codes, uniques = pd.factorize(
            pd.Series(batch["term"].to_pylist()), sort=False
        )
        uhash = np.fromiter(
            (term_hash(t) for t in uniques), dtype=np.int64, count=len(uniques)
        )
        bucket = ((uhash[codes] * np.int64(31) + salt) % n_buckets).astype(
            np.int32
        )
        return batch.append_column("salt", pa.array(salt)).append_column(
            "bucket", pa.array(bucket)
        )

    return add_keys


def make_encode_bucket_fn(
    df_ref, n_docs: int, avgdl: float, num_segments: int
):
    """Group fn: encode every (term, salt) sub-list inside one bucket."""

    def encode_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty_rows()
        dfs = ray.get(df_ref) if not isinstance(df_ref, dict) else df_ref
        g = g.sort_by(
            [("term", "ascending"), ("salt", "ascending"), ("doc_id", "ascending")]
        )
        terms = g["term"].to_pylist()
        codes, uniques = pd.factorize(pd.Series(terms), sort=False)
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
        return pa.table(
            {
                "term": pa.array(out_term, pa.string()),
                "salt": pa.array(out_salt, pa.int32()),
                "df": pa.array(out_df, pa.int64()),
                "count": pa.array(out_count, pa.int64()),
                "max_score": pa.array(out_max, pa.float32()),
                "blob": pa.array(out_blob, pa.binary()),
                "segment": pa.array(out_seg, pa.int32()),
            }
        )

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
