"""Posting-list block codec: delta-encoded docIDs, varint compression,
per-block max scores for block-max WAND.

Replaces the reference's hand-rolled little-endian + zlib cache blobs
(myaku/datastore/serialize.py:17,79,117,154) with an immutable segment
encoding designed for skipping:

Blob layout (one per (term, salt) sub-list; docIDs strictly ascending):

    varint n_postings
    varint n_blocks
    repeat n_blocks:
        varint body_len          # bytes of the block body (enables skipping)
        varint count             # postings in this block (<= BLOCK_SIZE)
        varint last_docid_delta  # block's last docid - prev block's last
        f32    max_score         # upper bound of contributions in the block
        body:
            count * varint docid deltas   (first is delta from prev block last)
            count * varint tf
            count * f32 score
            count * u64 warc_ts_us (LE)   # rank tie-break payload

A decoder can walk headers only (body_len) to skip past blocks whose
last_docid < seek target — the WAND skip path.
"""

from __future__ import annotations

import struct

import numpy as np

BLOCK_SIZE = 128


def write_varint(buf: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def read_varint(mv, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = mv[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    scores: np.ndarray,
    warc_us: np.ndarray,
) -> bytes:
    """Encode one sorted posting sub-list into a blob. Pure, deterministic."""
    n = len(doc_ids)
    out = bytearray()
    write_varint(out, n)
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    write_varint(out, n_blocks)
    prev_last = 0
    for b in range(n_blocks):
        lo = b * BLOCK_SIZE
        hi = min(lo + BLOCK_SIZE, n)
        ids = doc_ids[lo:hi]
        body = bytearray()
        prev = prev_last
        for d in ids:
            write_varint(body, int(d) - prev)
            prev = int(d)
        for t in tfs[lo:hi]:
            write_varint(body, int(t))
        body += scores[lo:hi].astype("<f4").tobytes()
        body += warc_us[lo:hi].astype("<u8").tobytes()

        write_varint(out, len(body))
        write_varint(out, hi - lo)
        write_varint(out, int(ids[-1]) - prev_last)
        out += struct.pack("<f", float(scores[lo:hi].max()))
        out += body
        prev_last = int(ids[-1])
    return bytes(out)


class PostingIterator:
    """Streaming decoder with block skipping — one term sub-list.

    API for WAND: ``doc_id()`` (current), ``score()``, ``warc_us()``,
    ``next()``, ``seek(target)`` (advance to first doc >= target),
    ``block_max()`` (current block's score upper bound),
    ``max_score`` (whole-list upper bound), ``exhausted``.
    """

    __slots__ = (
        "_mv", "n", "_n_blocks", "_block_idx", "_pos",
        "_blk_ids", "_blk_tfs", "_blk_scores", "_blk_warc",
        "_blk_last", "_blk_max", "_i", "_prev_last", "exhausted", "max_score",
        "_headers",
    )

    def __init__(self, blob: bytes, max_score: float | None = None):
        mv = memoryview(blob)
        self._mv = mv
        self.n, pos = read_varint(mv, 0)
        self._n_blocks, pos = read_varint(mv, pos)
        # Pre-walk headers (cheap: ~4 varints/block) to know offsets/bounds.
        headers = []
        prev_last = 0
        for _ in range(self._n_blocks):
            body_len, pos = read_varint(mv, pos)
            count, pos = read_varint(mv, pos)
            last_delta, pos = read_varint(mv, pos)
            (bmax,) = struct.unpack_from("<f", mv, pos)
            pos += 4
            last = prev_last + last_delta
            headers.append((pos, body_len, count, last, bmax, prev_last))
            prev_last = last
            pos += body_len
        self._headers = headers
        self.max_score = (
            max_score
            if max_score is not None
            else (max(h[4] for h in headers) if headers else 0.0)
        )
        self._block_idx = -1
        self._i = 0
        self.exhausted = self.n == 0
        self._blk_ids = None
        if not self.exhausted:
            self._load_block(0)

    def _load_block(self, bi: int) -> None:
        mv = self._mv
        pos, body_len, count, last, bmax, prev_last = self._headers[bi]
        ids = np.empty(count, dtype=np.int64)
        prev = prev_last
        p = pos
        for k in range(count):
            delta, p = read_varint(mv, p)
            prev += delta
            ids[k] = prev
        tfs = np.empty(count, dtype=np.int32)
        for k in range(count):
            v, p = read_varint(mv, p)
            tfs[k] = v
        scores = np.frombuffer(mv, dtype="<f4", count=count, offset=p)
        p += 4 * count
        warc = np.frombuffer(mv, dtype="<u8", count=count, offset=p)
        self._blk_ids = ids
        self._blk_tfs = tfs
        self._blk_scores = scores
        self._blk_warc = warc
        self._blk_last = last
        self._blk_max = bmax
        self._block_idx = bi
        self._i = 0

    def doc_id(self) -> int:
        return int(self._blk_ids[self._i])

    def tf(self) -> int:
        return int(self._blk_tfs[self._i])

    def score(self) -> float:
        return float(self._blk_scores[self._i])

    def warc_us(self) -> int:
        return int(self._blk_warc[self._i])

    def block_max(self) -> float:
        return float(self._blk_max)

    def next(self) -> None:
        self._i += 1
        if self._i >= len(self._blk_ids):
            nb = self._block_idx + 1
            if nb >= self._n_blocks:
                self.exhausted = True
            else:
                self._load_block(nb)

    def seek(self, target: int) -> None:
        """Advance to the first posting with doc_id >= target."""
        if self.exhausted:
            return
        # Skip whole blocks using header last-docids (no body decode).
        bi = self._block_idx
        if self._headers[bi][3] < target:
            while bi < self._n_blocks and self._headers[bi][3] < target:
                bi += 1
            if bi >= self._n_blocks:
                self.exhausted = True
                return
            self._load_block(bi)
        # binary search inside the block (never move backwards)
        i = max(int(np.searchsorted(self._blk_ids, target, side="left")), self._i)
        if i >= len(self._blk_ids):
            # target beyond this block's last (can't happen given header check)
            self.exhausted = True
            return
        self._i = i


def decode_all(blob: bytes):
    """Decode a full blob -> (doc_ids, tfs, scores, warc_us) numpy arrays.

    One tight sequential pass (no iterator machinery) — used by the
    array-backed query path and by parity tests."""
    mv = memoryview(blob)
    n, pos = read_varint(mv, 0)
    n_blocks, pos = read_varint(mv, pos)
    ids = np.empty(n, dtype=np.int64)
    tfs = np.empty(n, dtype=np.int32)
    scores = np.empty(n, dtype=np.float32)
    warc = np.empty(n, dtype=np.uint64)
    k = 0
    prev = 0
    for _ in range(n_blocks):
        body_len, pos = read_varint(mv, pos)
        count, pos = read_varint(mv, pos)
        _, pos = read_varint(mv, pos)  # last_docid_delta (redundant here)
        pos += 4  # max_score
        p = pos
        for j in range(count):
            shift = 0
            out = 0
            while True:
                b = mv[p]
                p += 1
                out |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            prev += out
            ids[k + j] = prev
        for j in range(count):
            shift = 0
            out = 0
            while True:
                b = mv[p]
                p += 1
                out |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            tfs[k + j] = out
        scores[k : k + count] = np.frombuffer(mv, dtype="<f4", count=count, offset=p)
        p += 4 * count
        warc[k : k + count] = np.frombuffer(mv, dtype="<u8", count=count, offset=p)
        p += 8 * count
        k += count
        pos += body_len
    return ids[:k], tfs[:k], scores[:k], warc[:k]


class ArrayPostings:
    """Array-backed posting iterator (same protocol as PostingIterator).

    Built by fully decoding one or more disjoint sub-list blobs and merging
    them with one argsort.  The per-posting query cost becomes numpy ops
    instead of Python-level block machinery — the right trade below
    ~10^6 postings per term; beyond that the streaming block iterators
    with block-max skipping take over (``DECODE_LIMIT`` in the searchers).
    """

    __slots__ = ("ids", "scores", "warc", "_i", "max_score", "exhausted", "n")

    def __init__(self, blobs: list[bytes], max_score: float | None = None):
        parts = [decode_all(b) for b in blobs]
        if len(parts) == 1:
            ids, _, scores, warc = parts[0]
        else:
            ids = np.concatenate([p[0] for p in parts])
            scores = np.concatenate([p[2] for p in parts])
            warc = np.concatenate([p[3] for p in parts])
            order = np.argsort(ids, kind="stable")
            ids, scores, warc = ids[order], scores[order], warc[order]
        self.ids, self.scores, self.warc = ids, scores, warc
        self.n = len(ids)
        self._i = 0
        self.max_score = (
            float(scores.max()) if max_score is None and self.n else (max_score or 0.0)
        )
        self.exhausted = self.n == 0

    def doc_id(self) -> int:
        return int(self.ids[self._i])

    def score(self) -> float:
        return float(self.scores[self._i])

    def warc_us(self) -> int:
        return int(self.warc[self._i])

    def next(self) -> None:
        self._i += 1
        if self._i >= self.n:
            self.exhausted = True

    def seek(self, target: int) -> None:
        i = int(np.searchsorted(self.ids[self._i :], target, side="left"))
        self._i += i
        if self._i >= self.n:
            self.exhausted = True

    def topk_arrays(self, k: int) -> list[tuple[int, float, int]]:
        """Vectorized single-term top-k with exact (score, warc, doc) order."""
        if self.n == 0:
            return []
        if self.n > k * 8:
            # pre-select candidates by score only, keeping enough to cover ties
            part = np.argpartition(self.scores, -min(k * 8, self.n - 1))[-k * 8 :]
            cutoff = self.scores[part].min()
            cand = np.nonzero(self.scores >= cutoff)[0]
        else:
            cand = np.arange(self.n)
        order = np.lexsort(
            (self.ids[cand], self.warc[cand], self.scores[cand])
        )[::-1][:k]
        sel = cand[order]
        return [
            (int(self.ids[i]), float(self.scores[i]), int(self.warc[i]))
            for i in sel
        ]
