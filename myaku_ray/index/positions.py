"""Positional-posting sidecar codec (phrase / proximity queries).

The reference engine is term-only: its posting payload carries no
positions and previews recompute offsets query-side
(myaku/datastore/database.py:157-174 stores FLI positions only inside
the per-article document, never in a term-keyed index).  Phrase and
proximity search need positions NEXT TO the postings, so the positional
build (an opt-in ``build_index(with_positions=True)`` flag) ships each
posting's occurrence offsets through the same bucket-partitioned write
as the posting row and stores them as a SEPARATE ``pos_blob`` column in
the segment files:

- the score path (``blob`` column, WAND, rank identity) is untouched —
  a positional index answers term queries byte-identically;
- position bytes are read ONLY by phrase/proximity queries, and only
  for the row groups the term lookup already touches.

Per-posting record (one per (term, doc), built in the tokenize stage):

    varint count                 # occurrences of term in doc
    count x varint start-delta   # char offsets, ascending (first = abs)
    count x varint length        # matched surface length per occurrence

Sub-list ``pos_blob`` (one per (term, salt) row, doc_id order identical
to the main blob):

    varint n_postings
    n_postings x varint record byte length
    records, concatenated

The record-length stream gives random access: a phrase query gathers
ONLY the candidate docs' records (after the docID AND-intersection) and
decodes them in one vectorized pass — the decode cost is O(positions of
the candidate docs), not O(ctf of the term).
"""

from __future__ import annotations

import numpy as np

from myaku_ray.index.codec import (
    decode_varint_stream,
    encode_varint_stream,
    read_varint,
    write_varint,
)


def encode_position_record(starts: np.ndarray, lens: np.ndarray) -> bytes:
    """One (term, doc) occurrence list -> record bytes (starts ascending)."""
    n = len(starts)
    out = bytearray()
    write_varint(out, n)
    if n == 0:
        return bytes(out)
    s = np.asarray(starts, dtype=np.int64)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = s[0]
    np.subtract(s[1:], s[:-1], out=deltas[1:], casting="unsafe")
    db, _ = encode_varint_stream(deltas)
    lb, _ = encode_varint_stream(np.asarray(lens, dtype=np.uint64))
    out += db.tobytes()
    out += lb.tobytes()
    return bytes(out)


def encode_position_records_from_pairs(pos_lists: list) -> list[bytes]:
    """Batch encoder over tuple-list inputs: ``pos_lists[i]`` is the
    kernel's [(start, len), ...] for row i.  Flattens the WHOLE batch
    with two ``np.fromiter`` calls, then shares the array encoder."""
    n_rows = len(pos_lists)
    counts = np.fromiter(
        (len(p) for p in pos_lists), dtype=np.int64, count=n_rows
    )
    total = int(counts.sum())
    starts = np.fromiter(
        (p[0] for ps in pos_lists for p in ps), dtype=np.int64, count=total
    )
    lens = np.fromiter(
        (p[1] for ps in pos_lists for p in ps), dtype=np.int64, count=total
    )
    return encode_position_records_from_arrays(counts, starts, lens)


def _segmented_dst(starts_arr: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Flat destination indices for consecutive segments of ``seg_lens``
    bytes placed at ``starts_arr`` — the segmented-arange scatter trick
    (one np.repeat + one np.arange, no per-segment loop)."""
    total = int(seg_lens.sum())
    shift = np.zeros(len(seg_lens), dtype=np.int64)
    if len(seg_lens) > 1:
        np.cumsum(seg_lens[:-1], out=shift[1:])
    return np.repeat(starts_arr - shift, seg_lens) + np.arange(total)


def encode_position_records_packed(
    counts: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Array-native batch encoder (round-4 ask #5's single-scan path):
    ``counts[i]`` occurrences per row, ``starts``/``lens`` flat in row
    order — exactly ``find_term_positions_arrays``'s layout, so the
    tokenize stage feeds the kernel output straight in with zero
    per-occurrence (or even per-row) Python objects.

    Returns ``(data_u8, offsets_i64[n_rows+1])``: every record packed
    into ONE buffer, assembled by three segmented scatters (count
    varints, delta stream, length stream interleaved per row).  Record
    bytes are identical to ``encode_position_record`` (property-
    tested); the stage wraps the buffer as an Arrow binary column
    zero-copy."""
    n_rows = len(counts)
    counts = np.asarray(counts, dtype=np.int64)
    cbytes, clens = encode_varint_stream(counts.astype(np.uint64))
    clens = clens.astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        offs = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(clens, out=offs[1:])
        return cbytes, offs
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    deltas = starts.copy()
    deltas[1:] -= starts[:-1]
    c_cum = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=c_cum[1:])
    firsts = c_cum[:-1][counts > 0]
    deltas[firsts] = starts[firsts]  # reset at row boundaries
    dbytes, dlens = encode_varint_stream(deltas.astype(np.uint64))
    lbytes, llens = encode_varint_stream(lens.astype(np.uint64))
    d_cum = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(dlens, out=d_cum[1:])
    l_cum = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(llens, out=l_cum[1:])
    dseg = d_cum[c_cum[1:]] - d_cum[c_cum[:-1]]
    lseg = l_cum[c_cum[1:]] - l_cum[c_cum[:-1]]
    offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(clens + dseg + lseg, out=offs[1:])
    out = np.empty(int(offs[-1]), dtype=np.uint8)
    out[_segmented_dst(offs[:-1], clens)] = cbytes
    out[_segmented_dst(offs[:-1] + clens, dseg)] = dbytes
    out[_segmented_dst(offs[:-1] + clens + dseg, lseg)] = lbytes
    return out, offs


def encode_position_records_from_arrays(
    counts: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> list[bytes]:
    """List-of-bytes view over the packed encoder (tests / slow paths)."""
    data, offs = encode_position_records_packed(counts, starts, lens)
    buf = data.tobytes()
    return [
        buf[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)
    ]


def encode_pos_blob(records: list[bytes]) -> bytes:
    """Records (doc_id order of the main blob) -> sub-list pos_blob."""
    out = bytearray()
    write_varint(out, len(records))
    lens = np.fromiter(
        (len(r) for r in records), dtype=np.uint64, count=len(records)
    )
    lb, _ = encode_varint_stream(lens) if len(records) else (np.empty(0, np.uint8), None)
    out += lb.tobytes()
    for r in records:
        out += r
    return bytes(out)


def encode_pos_blob_from_arrow(bin_arr, lo: int, hi: int) -> bytes:
    """Sub-list pos_blob straight from a slice of an Arrow binary column
    (the sorted bucket table's ``positions`` rows [lo, hi)): lengths come
    from the offsets buffer, the payload is ONE contiguous buffer slice —
    no per-row Python bytes objects."""
    n = hi - lo
    out = bytearray()
    write_varint(out, n)
    if n == 0:
        return bytes(out)
    offs = np.frombuffer(bin_arr.buffers()[1], dtype=np.int32)
    base = bin_arr.offset
    rec_off = offs[base + lo : base + hi + 1].astype(np.int64)
    lens = (rec_off[1:] - rec_off[:-1]).astype(np.uint64)
    lb, _ = encode_varint_stream(lens)
    out += lb.tobytes()
    data = bin_arr.buffers()[2]
    out += data[int(rec_off[0]) : int(rec_off[-1])]
    return bytes(out)


def _blob_offsets(blob: bytes) -> tuple[np.ndarray, int]:
    """(record byte offsets (n+1, relative to payload start), payload_pos)."""
    mv = memoryview(blob)
    n, pos = read_varint(mv, 0)
    if n == 0:
        return np.zeros(1, dtype=np.int64), pos
    # the length stream is exactly n varints: find its end via the n-th
    # clear continuation bit
    arr = np.frombuffer(blob, dtype=np.uint8)
    ends = np.flatnonzero((arr[pos:] & 0x80) == 0)
    len_stream_end = pos + int(ends[n - 1]) + 1
    lens = decode_varint_stream(arr[pos:len_stream_end]).astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return offs, len_stream_end


def gather_positions(
    blob: bytes, wanted: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode occurrence positions for a subset of postings.

    ``wanted``: ascending posting indices within the sub-list (as in the
    main blob's doc order).  Returns (counts, starts, lens): ``counts``
    aligned with ``wanted``; ``starts``/``lens`` flat, concatenated in
    ``wanted`` order, starts absolute.  One gather + one vectorized
    varint decode; no per-occurrence Python."""
    offs, payload_pos = _blob_offsets(blob)
    wanted = np.asarray(wanted, dtype=np.int64)
    if len(wanted) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    arr = np.frombuffer(blob, dtype=np.uint8)
    rec_lo = offs[wanted] + payload_pos
    rec_hi = offs[wanted + 1] + payload_pos
    return _decode_pos_records(arr, rec_lo, rec_hi)


def _decode_pos_records(
    arr: np.ndarray, rec_lo: np.ndarray, rec_hi: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gather + decode position records given absolute byte extents
    (shared tail of gather_positions / PosBlobIndex.gather)."""
    rec_bytes = rec_hi - rec_lo
    # gather the wanted records into one contiguous buffer
    total_bytes = int(rec_bytes.sum())
    gidx = np.repeat(rec_lo, rec_bytes) + (
        np.arange(total_bytes, dtype=np.int64)
        - np.repeat(np.cumsum(rec_bytes) - rec_bytes, rec_bytes)
    )
    buf = arr[gidx]
    vals = decode_varint_stream(buf).astype(np.int64)
    # value index at each record start = varints ending before that byte
    v_ends = np.flatnonzero((buf & 0x80) == 0)  # end byte of each varint
    rec_start_bytes = np.cumsum(rec_bytes) - rec_bytes
    rec_val_idx = np.searchsorted(v_ends, rec_start_bytes, side="left")
    counts = vals[rec_val_idx]
    total_c = int(counts.sum())
    if total_c == 0:
        z = np.empty(0, dtype=np.int64)
        return counts, z, z
    c_off = np.cumsum(counts) - counts  # exclusive cumsum
    within = np.arange(total_c, dtype=np.int64) - np.repeat(c_off, counts)
    base = np.repeat(rec_val_idx + 1, counts)
    deltas = vals[base + within]
    lens = vals[base + np.repeat(counts, counts) + within]
    # segmented cumsum: absolute starts per record
    g = np.cumsum(deltas)
    rec_first = c_off  # flat index of each record's first occurrence
    prior = np.where(rec_first > 0, g[rec_first - 1], 0)
    starts = g - np.repeat(prior, counts)
    return counts, starts, lens


_CKPT_EVERY = 128  # checkpoint stride; aligned with codec.BLOCK_SIZE so a
# posting block's records share one checkpoint span


class PosBlobIndex:
    """Checkpointed random access into a pos_blob.

    ``gather_positions`` rebuilds the FULL record-offset table (n+1
    int64) on every call — O(n) work and transient memory per gather.
    For the streaming phrase path (index/phrase.py), which gathers a few
    surviving candidates per chunk from corpus-df particle sub-lists,
    that cost is paid once per CHUNK; this index pays the O(n) scan ONCE
    at construction and then persists only two int64 entries per
    ``_CKPT_EVERY`` records (~0.13 B/posting vs 8 B/posting for the full
    table): the record byte offset and the length-stream byte position
    at each checkpoint.  ``gather()`` decodes only the wanted records'
    checkpoint spans and is output-identical to ``gather_positions``
    (pytest-asserted)."""

    __slots__ = ("arr", "n", "payload", "ck_rec", "ck_ls")

    def __init__(self, blob: bytes):
        arr = np.frombuffer(blob, dtype=np.uint8)
        self.arr = arr
        mv = memoryview(blob)
        n, pos = read_varint(mv, 0)
        self.n = n
        if n == 0:
            self.payload = pos
            self.ck_rec = np.zeros(1, dtype=np.int64)
            self.ck_ls = np.asarray([pos], dtype=np.int64)
            return
        # transient O(n) pass: varint ends of the length stream + lens
        ends = np.flatnonzero((arr[pos:] & 0x80) == 0)
        len_stream_end = pos + int(ends[n - 1]) + 1
        lens = decode_varint_stream(arr[pos:len_stream_end]).astype(np.int64)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        self.payload = len_stream_end
        idx = np.arange(0, n, _CKPT_EVERY)
        self.ck_rec = offs[idx]
        ls = np.empty(len(idx), dtype=np.int64)
        ls[0] = pos
        if len(idx) > 1:
            ls[1:] = pos + ends[idx[1:] - 1] + 1
        self.ck_ls = ls

    def gather(
        self, wanted: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """gather_positions() for sorted posting indices, from checkpoints:
        decodes only the wanted records' checkpoint-span record lengths."""
        wanted = np.asarray(wanted, dtype=np.int64)
        if len(wanted) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        arr = self.arr
        blocks = wanted // _CKPT_EVERY
        rec_lo = np.empty(len(wanted), dtype=np.int64)
        rec_hi = np.empty(len(wanted), dtype=np.int64)
        ub, uidx = np.unique(blocks, return_index=True)
        bounds = np.append(uidx, len(wanted))
        n_ck = len(self.ck_ls)
        for j, b in enumerate(ub):
            b = int(b)
            ls_lo = int(self.ck_ls[b])
            ls_hi = (
                int(self.ck_ls[b + 1]) if b + 1 < n_ck else self.payload
            )
            lens_b = decode_varint_stream(arr[ls_lo:ls_hi]).astype(np.int64)
            offs_b = np.zeros(len(lens_b) + 1, dtype=np.int64)
            np.cumsum(lens_b, out=offs_b[1:])
            offs_b += int(self.ck_rec[b])
            w = wanted[bounds[j] : bounds[j + 1]] - b * _CKPT_EVERY
            rec_lo[bounds[j] : bounds[j + 1]] = self.payload + offs_b[w]
            rec_hi[bounds[j] : bounds[j + 1]] = self.payload + offs_b[w + 1]
        return _decode_pos_records(arr, rec_lo, rec_hi)
