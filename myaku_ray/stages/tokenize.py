"""Tokenizer actor stage: docs -> posting rows (term, doc_id, tf, ...).

A callable CLASS for ``map_batches(TokenizeStage, concurrency=N, ...)`` —
the dictionary (surface map + phrase set) is built ONCE per actor in
``__init__`` (reference singleton tagger: myaku/japanese_analysis.py:919-962,
myaku/utils/__init__.py:746-787), work happens per batch in ``__call__``.

Emits one row per (term, doc): the FoundJpnLexicalItem analog
(myaku/datatypes.py:345-425) with the per-doc combine (A1,
datatypes.py:428-505) already applied — grouping by (term, doc) never
crosses documents, so this is a local reduction, not a shuffle.

Positions are NOT shipped into the shuffle: the posting payload is
(tf, doclen, quality, warc_us) — positions for result previews are
recomputed at hydration time for the top-k docs only (bounded work,
mirrors the reference recomputing preview sentences query-side,
search/article_preview.py:126-199).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from myaku_ray.tokenizer import Tokenizer

POSTING_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("doclen", pa.int32()),
        ("quality", pa.int32()),
        ("warc_us", pa.uint64()),
    ]
)

# Positional build (with_positions=True): one extra binary column holding
# the per-(term, doc) occurrence record (index/positions.py layout).  It
# rides the same bucket-partitioned write; the score path never reads it.
POSTING_POS_SCHEMA = POSTING_SCHEMA.append(pa.field("positions", pa.binary()))


class TokenizeStage:
    """Optionally emits ``salt`` + ``bucket`` columns so the postings
    parquet can be written hive-partitioned by encode bucket — the
    filesystem then IS the (term, salt) shuffle: segment encode reads one
    bucket directory per task instead of paying a sort all-to-all."""

    def __init__(
        self,
        salt_buckets: int | None = None,
        encode_buckets: int | None = None,
        with_positions: bool = False,
    ) -> None:
        self._tok = Tokenizer()
        self._salt_buckets = salt_buckets
        self._encode_buckets = encode_buckets
        self._with_positions = with_positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        qualities = batch["quality_score"].to_pylist()
        warcs = batch["warc_ts"].cast(pa.int64()).to_pylist()  # us since epoch

        terms: list[str] = []
        out_doc: list[int] = []
        out_tf: list[int] = []
        out_dl: list[int] = []
        out_q: list[int] = []
        out_w: list[int] = []
        # positional build: per-doc flat arrays from the array-native
        # kernel, concatenated once per batch — zero per-occurrence
        # Python objects between kernel and record encoder
        counts_acc: list = []
        starts_acc: list = []
        lens_acc: list = []
        with_pos = self._with_positions
        for text, did, q, w in zip(texts, doc_ids, qualities, warcs):
            if with_pos:
                # positional kernel: same term set, tf == len(positions)
                terms_i, counts_i, starts_i, lens_i = (
                    self._tok.find_term_positions_arrays(text)
                )
                doclen = int(counts_i.sum())
                n = len(terms_i)
                terms.extend(terms_i)
                out_tf.extend(counts_i.tolist())
                counts_acc.append(counts_i)
                starts_acc.append(starts_i)
                lens_acc.append(lens_i)
            else:
                tfs = self._tok.find_term_tfs(text)
                doclen = sum(tfs.values())
                n = len(tfs)
                terms.extend(tfs.keys())
                out_tf.extend(tfs.values())
            out_doc.extend([did] * n)
            out_dl.extend([doclen] * n)
            out_q.extend([q] * n)
            out_w.extend([w] * n)

        cols = {
            "term": terms,
            "doc_id": out_doc,
            "tf": out_tf,
            "doclen": out_dl,
            "quality": out_q,
            "warc_us": np.asarray(out_w, dtype=np.uint64),
        }
        if with_pos:
            from myaku_ray.index.positions import (
                encode_position_records_packed,
            )

            empty = np.empty(0, np.int64)
            data, offs = encode_position_records_packed(
                np.concatenate(counts_acc) if counts_acc else empty,
                np.concatenate(starts_acc) if starts_acc else empty,
                np.concatenate(lens_acc) if lens_acc else empty,
            )
            # zero-copy Arrow binary column over the packed buffer
            pos_col = pa.Array.from_buffers(
                pa.binary(),
                len(terms),
                [
                    None,
                    pa.py_buffer(offs.astype(np.int32)),
                    pa.py_buffer(data),
                ],
            )
            out = pa.Table.from_pydict(
                dict(cols, positions=pos_col),
                schema=POSTING_POS_SCHEMA,
            )
        else:
            out = pa.Table.from_pydict(cols, schema=POSTING_SCHEMA)
        if self._salt_buckets is not None and self._encode_buckets is not None:
            from myaku_ray.index.segment_build import add_salt_bucket

            out = add_salt_bucket(out, self._salt_buckets, self._encode_buckets)
        return out


# ---------------------------------------------------------------------------
# Full FLI payload stage (positions + lexical interpretations)
# ---------------------------------------------------------------------------

INTERP_TYPE = pa.struct(
    [
        ("interp_sources", pa.list_(pa.string())),
        ("parts_of_speech", pa.list_(pa.string())),
        ("conjugated_type", pa.string()),
        ("conjugated_form", pa.string()),
        ("jmdict_interp_entry_id", pa.string()),
    ]
)
POSITION_TYPE = pa.struct([("index", pa.int32()), ("len", pa.int32())])
FLI_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("term", pa.string()),
        ("tf", pa.int32()),
        ("reading", pa.string()),
        ("pos", pa.string()),
        ("found_positions", pa.list_(POSITION_TYPE)),
        ("possible_interps", pa.list_(INTERP_TYPE)),
        # interp_position_map flattened to rows aligned with
        # possible_interps: entry i holds interp i's own positions, or
        # null when that interp covers every found position (exactly
        # convert_interp_pos_map_to_doc's sparse-document layout,
        # myaku/datastore/document_convert.py:156-171)
        ("interp_position_map", pa.list_(pa.list_(POSITION_TYPE))),
    ]
)


def _pos_list(positions) -> list[dict]:
    return [{"index": int(s), "len": int(l)} for s, l in positions]


class FliStage:
    """docs -> full FoundJpnLexicalItem rows: positions, possible_interps
    and the interp_position_map payload (myaku/datatypes.py:307-425) as
    typed Arrow list<struct> columns.  Same actor-pool shape as
    TokenizeStage (dictionary built once per actor); used when the
    consumer needs the lexical interpretation payload, not just BM25
    posting stats."""

    def __init__(self) -> None:
        self._tok = Tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in FLI_SCHEMA.names}
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for item in self._tok.find_lexical_items(text):
                rows["doc_id"].append(int(did))
                rows["term"].append(item["term"])
                rows["tf"].append(item["tf"])
                rows["reading"].append(item["reading"])
                rows["pos"].append(item["pos"])
                rows["found_positions"].append(_pos_list(item["positions"]))
                rows["possible_interps"].append(
                    [
                        {
                            "interp_sources": it["interp_sources"],
                            "parts_of_speech": (
                                it["mecab_interp"]["parts_of_speech"]
                                if it["mecab_interp"]
                                else None
                            ),
                            "conjugated_type": (
                                it["mecab_interp"]["conjugated_type"]
                                if it["mecab_interp"]
                                else None
                            ),
                            "conjugated_form": (
                                it["mecab_interp"]["conjugated_form"]
                                if it["mecab_interp"]
                                else None
                            ),
                            "jmdict_interp_entry_id": it["jmdict_interp_entry_id"],
                        }
                        for it in item["possible_interps"]
                    ]
                )
                pm = item["interp_position_map"]
                rows["interp_position_map"].append(
                    [
                        _pos_list(pm[str(i)]) if pm and str(i) in pm else None
                        for i in range(len(item["possible_interps"]))
                    ]
                )
        return pa.Table.from_pydict(rows, schema=FLI_SCHEMA)
