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


# varint byte-length boundaries: value v needs searchsorted(bounds, v)+1 bytes
_VARINT_BOUNDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def encode_varint_stream(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varint encoding of a uint64 array.

    Returns (bytes_u8, per_value_byte_lengths).  Scatter by rounds: round r
    writes byte r of every value still needing one (≤10 rounds total)."""
    vals = vals.astype(np.uint64, copy=False)
    nb = (np.searchsorted(_VARINT_BOUNDS, vals, side="right") + 1).astype(np.int64)
    offs = np.zeros(len(vals), dtype=np.int64)
    np.cumsum(nb[:-1], out=offs[1:]) if len(vals) > 1 else None
    out = np.empty(int(nb.sum()), dtype=np.uint8)
    active = np.arange(len(vals))
    r = 0
    while len(active):
        v = vals[active]
        byte = ((v >> np.uint64(7 * r)) & np.uint64(0x7F)).astype(np.uint8)
        more = nb[active] - 1 > r
        byte[more] |= 0x80
        out[offs[active] + r] = byte
        active = active[more]
        r += 1
    return out, nb


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    scores: np.ndarray,
    warc_us: np.ndarray,
) -> bytes:
    """Encode one sorted posting sub-list into a blob. Pure, deterministic.

    Varint payloads for the whole list are produced with two vectorized
    calls; the per-block Python work is header assembly + slicing only."""
    n = len(doc_ids)
    out = bytearray()
    write_varint(out, n)
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    write_varint(out, n_blocks)
    if n == 0:
        return bytes(out)
    ids64 = doc_ids.astype(np.int64, copy=False)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = ids64[0]
    np.subtract(
        ids64[1:], ids64[:-1], out=deltas[1:], casting="unsafe"
    )
    delta_bytes, delta_lens = encode_varint_stream(deltas)
    tf_bytes, tf_lens = encode_varint_stream(tfs.astype(np.uint64, copy=False))
    # per-block byte extents of each varint stream
    block_starts = np.arange(0, n, BLOCK_SIZE)
    dl_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(delta_lens, out=dl_cum[1:])
    tl_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tf_lens, out=tl_cum[1:])
    scores_f4 = scores.astype("<f4", copy=False)
    warc_u8 = warc_us.astype("<u8", copy=False)
    prev_last = 0
    for b in range(n_blocks):
        lo = int(block_starts[b])
        hi = min(lo + BLOCK_SIZE, n)
        count = hi - lo
        d_lo, d_hi = int(dl_cum[lo]), int(dl_cum[hi])
        t_lo, t_hi = int(tl_cum[lo]), int(tl_cum[hi])
        body_len = (d_hi - d_lo) + (t_hi - t_lo) + 12 * count
        write_varint(out, body_len)
        write_varint(out, count)
        last = int(ids64[hi - 1])
        write_varint(out, last - prev_last)
        out += struct.pack("<f", float(scores_f4[lo:hi].max()))
        out += delta_bytes[d_lo:d_hi].tobytes()
        out += tf_bytes[t_lo:t_hi].tobytes()
        out += scores_f4[lo:hi].tobytes()
        out += warc_u8[lo:hi].tobytes()
        prev_last = last
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

    def block_info(self, target: int) -> tuple[float, int] | None:
        """(block max_score, block last_docid) of the block that holds the
        first posting >= target — HEADER walk only, no body decode, no
        state change.  None when the list has nothing >= target.  This is
        the shallow-advance peek block-max WAND prunes with."""
        bi = self._block_idx
        headers = self._headers
        while bi < self._n_blocks and headers[bi][3] < target:
            bi += 1
        if bi >= self._n_blocks:
            return None
        h = headers[bi]
        return float(h[4]), int(h[3])

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


def decode_varint_stream(buf: np.ndarray) -> np.ndarray:
    """Vectorized decode of a uint8 buffer holding exactly a varint sequence.

    Continuation bits mark value boundaries; each byte contributes its low
    7 bits shifted by 7×(byte index within its varint).  The shifted
    contributions occupy disjoint bit ranges, so ``np.add.reduceat`` over
    value start offsets reassembles every varint in one pass."""
    if len(buf) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (buf & 0x80) == 0
    starts = np.empty(len(buf), dtype=bool)
    starts[0] = True
    starts[1:] = ends[:-1]
    start_pos = np.flatnonzero(starts)
    # byte index within each varint, built with one cumsum (cheaper than
    # arange+repeat on this memory-bound box): +1 per byte, reset at starts
    run_lens = np.diff(np.append(start_pos, len(buf)))
    inc = np.ones(len(buf), dtype=np.uint64)
    inc[start_pos[1:]] -= run_lens[:-1].astype(np.uint64)
    inc[0] = 0
    shift = np.cumsum(inc)
    shift *= 7
    vals = (buf & np.uint8(0x7F)).astype(np.uint64)
    vals <<= shift
    return np.add.reduceat(vals, start_pos)


def decode_all(blob: bytes):
    """Decode a full blob -> (doc_ids, tfs, scores, warc_us) numpy arrays.

    Header walk is Python (4 varints/block); the per-posting payload —
    2n varints + fixed f32/u64 arrays — decodes vectorized."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    mv = memoryview(blob)
    n, pos = read_varint(mv, 0)
    n_blocks, pos = read_varint(mv, pos)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.astype(np.int32), z.astype(np.float32), z.astype(np.uint64)
    counts = np.empty(n_blocks, dtype=np.int64)
    var_parts = []
    score_parts = []
    warc_parts = []
    for bi in range(n_blocks):
        body_len, pos = read_varint(mv, pos)
        count, pos = read_varint(mv, pos)
        _, pos = read_varint(mv, pos)  # last_docid_delta (redundant here)
        pos += 4  # max_score
        counts[bi] = count
        var_len = body_len - 12 * count
        var_parts.append(arr[pos : pos + var_len])
        fixed = pos + var_len
        score_parts.append(np.frombuffer(mv, dtype="<f4", count=count, offset=fixed))
        warc_parts.append(
            np.frombuffer(mv, dtype="<u8", count=count, offset=fixed + 4 * count)
        )
        pos += body_len
    varbuf = var_parts[0] if n_blocks == 1 else np.concatenate(var_parts)
    vals = decode_varint_stream(varbuf)
    # per-block layout [deltas(count), tfs(count)]; first delta of each block
    # is relative to the previous block's last docid, so ONE global cumsum
    # over all deltas reconstructs absolute ids.
    block_bounds = np.cumsum(counts)[:-1]
    inc = np.ones(int(counts.sum()), dtype=np.int64)
    if n_blocks > 1:
        inc[block_bounds] += counts[:-1]
    inc[0] = 0
    delta_idx = np.cumsum(inc)
    tf_idx = delta_idx + np.repeat(counts, counts)
    ids = np.cumsum(vals[delta_idx].astype(np.int64))
    tfs = vals[tf_idx].astype(np.int32)
    scores = score_parts[0] if n_blocks == 1 else np.concatenate(score_parts)
    warc = warc_parts[0] if n_blocks == 1 else np.concatenate(warc_parts)
    return ids, tfs, scores.astype(np.float32, copy=False), warc


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

    @classmethod
    def from_arrays(cls, ids, scores, warc, max_score: float) -> "ArrayPostings":
        """Zero-copy clone over already-decoded arrays (searcher term cache)."""
        obj = object.__new__(cls)
        obj.ids, obj.scores, obj.warc = ids, scores, warc
        obj.n = len(ids)
        obj._i = 0
        obj.max_score = max_score
        obj.exhausted = obj.n == 0
        return obj

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

    def block_info(self, target: int) -> tuple[float, int] | None:
        """Whole list acts as one block (arrays are already decoded, there
        is nothing to skip) — bound is the list max, boundary its last id."""
        if self.exhausted or int(self.ids[-1]) < target:
            return None
        return self.max_score, int(self.ids[-1])

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
