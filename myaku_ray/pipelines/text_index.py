"""Whitespace-token BM25 index over a generic documents table.

The same engine (codec + salted shuffle + WAND) as the pages index, but
with the trivial analyzer ``text.split(' ')`` — chosen because it is
expressible 1:1 in DuckDB as ``string_split(text, ' ')``, which makes the
whole index SQL-checkable: df, doclen, and the exact BM25 scores (double
precision, bit-identical — all SQL constants cast ::DOUBLE so DuckDB
doesn't parse them as DECIMAL).

Per-posting contributions are quantized to float32 at build time (same as
the pages index); the DuckDB oracle applies ``::FLOAT`` to match.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from myaku_ray.index.codec import PostingIterator, encode_postings
from myaku_ray.index.searcher import MergedIterator
from myaku_ray.index.util import term_hash
from myaku_ray.index.wand import wand_topk
from myaku_ray.scoring import BM25_B, BM25_K1
from myaku_ray.state.lineage import is_complete, mark_complete, stage_dir

DEFAULT_SALT = 4
DEFAULT_SEGMENTS = 8


def tokenize_ws(text: str) -> list[str]:
    """Whitespace analyzer == DuckDB string_split(text, ' ')."""
    return text.split(" ")


def postings_batch(batch: pa.Table) -> pa.Table:
    """docs batch -> posting rows (term, doc_id, tf, doclen)."""
    terms, dids, tfs, dls = [], [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = tokenize_ws(text)
        c = Counter(toks)
        dl = len(toks)
        for t, tf in c.items():
            terms.append(t)
            dids.append(did)
            tfs.append(tf)
            dls.append(dl)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(dids, pa.int64()),
            "tf": pa.array(tfs, pa.int32()),
            "doclen": pa.array(dls, pa.int32()),
        }
    )


def bm25_scores_vec(
    tfs: np.ndarray, doclens: np.ndarray, df: int, n_docs: int, avgdl: float
) -> np.ndarray:
    """Pure BM25 contribution, float32-quantized; expression tree matches the
    DuckDB oracle SQL exactly (ln(1+...) * (tf*(k1+1)) / (tf + k1*(...)))."""
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    tf_f = tfs.astype(np.float64)
    num = tf_f * (BM25_K1 + 1.0)
    den = tf_f + BM25_K1 * (1.0 - BM25_B + BM25_B * doclens.astype(np.float64) / avgdl)
    return (idf * num / den).astype(np.float32)


def build_text_index(
    documents_path: str,
    index_dir: str,
    *,
    salt_buckets: int = DEFAULT_SALT,
    num_segments: int = DEFAULT_SEGMENTS,
    resume: bool = True,
) -> dict:
    """documents.parquet (doc_id, text) -> BM25 segments + stats."""
    os.makedirs(index_dir, exist_ok=True)

    postings_dir = stage_dir(index_dir, "postings")
    if not (resume and is_complete(index_dir, "postings")):
        docs = rd.read_parquet(documents_path, columns=["doc_id", "text"])
        p = docs.map_batches(postings_batch, batch_format="pyarrow", batch_size=512)
        p.write_parquet(postings_dir)
        mark_complete(index_dir, "postings")

    stats_path = os.path.join(index_dir, "stats.json")
    df_dir = stage_dir(index_dir, "df")
    if not (resume and is_complete(index_dir, "df")):
        p = rd.read_parquet(postings_dir, columns=["term", "tf"])
        df_ds = p.groupby("term").aggregate(
            Count(alias_name="df"), Sum("tf", alias_name="ctf")
        )
        df_ds.write_parquet(df_dir)
        n_docs = rd.read_parquet(documents_path, columns=["doc_id"]).count()
        # doclen sum = Σ len(tokens); recover from posting rows: Σ tf
        dfp = rd.read_parquet(df_dir).to_pandas()
        total_tokens = int(dfp["ctf"].sum())
        stats = {
            "n_docs": int(n_docs),
            "total_tokens": total_tokens,
            "avgdl": total_tokens / max(n_docs, 1),
            "n_terms": int(len(dfp)),
            "num_segments": num_segments,
            "salt_buckets": salt_buckets,
        }
        with open(stats_path, "w") as f:
            json.dump(stats, f)
        mark_complete(index_dir, "df")

    with open(stats_path) as f:
        stats = json.load(f)

    seg_root = stage_dir(index_dir, "segments")
    if not (resume and is_complete(index_dir, "segments")):
        dfp = rd.read_parquet(df_dir).to_pandas()
        df_ref = ray.put(dict(zip(dfp["term"], dfp["df"].astype(int))))
        n_docs, avgdl = stats["n_docs"], stats["avgdl"]

        p = rd.read_parquet(postings_dir)

        def add_salt(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "salt", pa.array((ids % salt_buckets).astype(np.int32))
            )

        def encode_group(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
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
            term = g["term"][0].as_py()
            df = int(ray.get(df_ref)[term])
            ids = g["doc_id"].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            tfs = g["tf"].to_numpy(zero_copy_only=False)[order]
            dls = g["doclen"].to_numpy(zero_copy_only=False)[order]
            scores = bm25_scores_vec(tfs, dls, df, n_docs, avgdl)
            blob = encode_postings(
                ids, tfs, scores, np.zeros(len(ids), dtype=np.uint64)
            )
            return pa.table(
                {
                    "term": pa.array([term]),
                    "salt": pa.array([g["salt"][0].as_py()], pa.int32()),
                    "df": pa.array([df], pa.int64()),
                    "count": pa.array([len(ids)], pa.int64()),
                    "max_score": pa.array([float(scores.max())], pa.float32()),
                    "blob": pa.array([blob], pa.binary()),
                    "segment": pa.array([term_hash(term) % num_segments], pa.int32()),
                }
            )

        rows = (
            p.map_batches(add_salt, batch_format="pyarrow")
            .groupby(["term", "salt"])
            .map_groups(encode_group, batch_format="pyarrow")
        )
        rows.write_parquet(seg_root, partition_cols=["segment"])
        mark_complete(index_dir, "segments")

    return {"stats": stats}


class TextSearcher:
    """WAND top-k over a text index; terms are raw whitespace tokens."""

    def __init__(self, index_dir: str):
        import pyarrow.dataset as pads

        self.index_dir = index_dir
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self._seg_root = os.path.join(index_dir, "segments")
        self._cache: dict[int, object] = {}
        self._pads = pads

    def _segment_dataset(self, seg: int):
        ds = self._cache.get(seg)
        if ds is None:
            path = os.path.join(self._seg_root, f"segment={seg}")
            if not os.path.isdir(path):
                return None
            ds = self._pads.dataset(path, format="parquet")
            self._cache[seg] = ds
        return ds

    def term_iterator(self, term: str):
        seg = term_hash(term) % self.stats["num_segments"]
        ds = self._segment_dataset(seg)
        if ds is None:
            return None
        tbl = ds.to_table(
            columns=["term", "blob", "max_score"],
            filter=self._pads.field("term") == term,
        )
        if tbl.num_rows == 0:
            return None
        from myaku_ray.index.searcher import make_term_iterator

        return make_term_iterator(
            [(b.as_py(), float(m.as_py())) for b, m in zip(tbl["blob"], tbl["max_score"])]
        )

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        from myaku_ray.index.codec import ArrayPostings

        terms = []
        seen = set()
        for t in tokenize_ws(query):
            if t and t not in seen:
                seen.add(t)
                terms.append(t)
        iters = {t: self.term_iterator(t) for t in terms}
        iters = {t: it for t, it in iters.items() if it is not None}
        if not iters:
            return []
        if len(iters) == 1:
            (it,) = iters.values()
            if isinstance(it, ArrayPostings):
                return [(d, s) for (d, s, _) in it.topk_arrays(k)]
        from myaku_ray.index.wand import array_topk

        if all(isinstance(it, ArrayPostings) for it in iters.values()):
            return [(d, s) for (d, s, _) in array_topk(iters, k)]
        return [(d, s) for (d, s, _) in wand_topk(iters, k)]
