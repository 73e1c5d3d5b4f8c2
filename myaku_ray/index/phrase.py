"""Phrase and proximity search over a positional index.

Requires ``build_index(with_positions=True)`` — segments then carry a
``pos_blob`` per (term, salt) sub-list (index/positions.py).  The
reference engine has no phrase queries (term-only postings,
myaku/datastore/database.py:157-174); this is the positional extension
its FLI position payloads make natural.

Semantics
---------
- A phrase is the query's token chain (base forms, in order) with the
  tokens CONTIGUOUS in the query (no spaces/symbols between them — a gap
  means the chain cannot be verified against doc offsets and the query
  matches nothing).
- A doc matches when some occurrence chain exists: term_i at char
  offset s_i with matched-surface length l_i and s_{i+1} == s_i + l_i.
  Offsets/lengths are DOC-side, so conjugated surfaces chain correctly
  (the stored record has each occurrence's own surface length).
- Score = the ordinary multi-term BM25 sum over the chain's DISTINCT
  terms (sorted-term f64 accumulation, identical to the engine's rank
  semantics); rank key (score, warc_us, doc_id) DESC.  A phrase query
  is therefore exactly "AND + adjacency filter" on the ranked scan.

Two execution paths, identical results (pytest A/B asserted)
------------------------------------------------------------
- **Array path** (every chain term's total postings <=
  ``_PHRASE_STREAM_LIMIT``): decode each term's sub-lists fully and run
  one vectorized AND + chain walk.  Fastest for the common case; the
  decoded form is cached per Searcher.
- **Streaming path** (any term above the limit — e.g. a chain
  containing a corpus-df particle の/は): the docID AND runs
  rarest-term-first over candidate CHUNKS (``_STREAM_CHUNK_BLOCKS``
  posting blocks of the rarest term at a time); every other term is
  probed per chunk through its same-salt sub-lists' block headers
  (first/last-docid skip data), decoding only candidate-covering block
  runs, and positions are gathered per surviving candidate through
  checkpointed pos-blob indexes (positions.PosBlobIndex).  No term's
  decoded posting list is ever concatenated: peak decoded postings per
  query is O(chunk × chain length), independent of any term's df
  (asserted in tests/test_phrase_stream.py via the per-query stats the
  driver records on ``searcher._phrase_last_stats``).  Compressed blob
  bytes for hot oversized terms are cached (bounded FIFO) so repeated
  particle-chain queries skip the point-read.

Scale notes
-----------
- Positions are gathered ONLY for docs surviving the AND (random access
  via the record-length stream), so position bytes decoded =
  O(occurrences in candidate docs), not O(ctf).
- The streaming path mirrors the scoring path's DECODE_LIMIT valve
  (index/searcher.py): bounded memory above the threshold, vectorized
  arrays below it.
"""

from __future__ import annotations

import numpy as np

from myaku_ray.index.codec import decode_all, decode_varint_stream, read_varint
from myaku_ray.index.positions import gather_positions
from myaku_ray.index.util import term_hash
from myaku_ray.normalize import normalize_char_width

# doc-ordinal key stride: starts+lens < MAX_ARTICLE_LEN = 2^16, so
# ordinal*STRIDE + offset is collision-free and fits int64 for any
# realistic candidate-set size
_STRIDE = np.int64(1) << np.int64(18)


def phrase_chain(searcher, query_str: str) -> list[str] | None:
    """Query -> ordered base-form chain, or None when no contiguous
    chain exists (empty analysis, symbol token, or a gap between
    tokens)."""
    q = normalize_char_width(query_str)
    toks = searcher._tok.tokenize(q)
    if not toks:
        return None
    from myaku_ray.tokenizer import _SYMBOL_POS

    chain = []
    end = None
    for t in toks:
        if t.pos == _SYMBOL_POS:
            return None  # symbols are unindexed; adjacency can't be proven
        if end is not None and t.start != end:
            return None  # gap (whitespace/symbol) between query tokens
        chain.append(t.base_form)
        end = t.start + t.length
    return chain


# ---------------------------------------------------------------------------
# shared verify kernels (array + streaming paths run the SAME math)
# ---------------------------------------------------------------------------


def _chain_walk(chain: list[str], occ: dict) -> np.ndarray:
    """Vectorized adjacency walk.  ``occ[t]`` = (sorted composite keys
    ordinal*STRIDE+start, starts, lens, ordinals) of term t's occurrences
    restricted to the candidate docs.  Returns the unique candidate
    ORDINALS where some occurrence chain completes."""
    k0, s0, l0, ord0 = occ[chain[0]]
    cur_ord = ord0
    cur_next = s0 + l0
    for t in chain[1:]:
        keys_t, _s_t, l_t, _o_t = occ[t]
        target = cur_ord * _STRIDE + cur_next
        pos = np.searchsorted(keys_t, target)
        ok = pos < len(keys_t)
        okp = np.where(ok, pos, 0)
        ok &= keys_t[okp] == target
        cur_ord = cur_ord[ok]
        cur_next = cur_next[ok] + l_t[okp[ok]]
        if len(cur_ord) == 0:
            return np.empty(0, dtype=np.int64)
    return np.unique(cur_ord)


def _window_match(terms: list[str], occ: dict, window: int) -> np.ndarray:
    """Vectorized proximity decision.  A window of span <= W containing
    every term exists iff SOME occurrence s (the window's left edge is
    always an occurrence) has, for every term, an occurrence in
    [s, s+W] within the same doc — one searchsorted per term over its
    sorted (doc ordinal, start) composite keys against every anchor.
    Returns the unique matching candidate ORDINALS."""
    od_all = np.concatenate([occ[t][3] for t in terms])
    st_all = np.concatenate([occ[t][1] for t in terms])
    anchor_key = od_all * _STRIDE + st_all
    hi_key = od_all * _STRIDE + np.minimum(
        st_all + window, int(_STRIDE) - 1
    )
    ok = np.ones(len(od_all), dtype=bool)
    for t in terms:
        keys_t = occ[t][0]  # already sorted
        pos = np.searchsorted(keys_t, anchor_key)
        found = pos < len(keys_t)
        fp = np.where(found, pos, 0)
        ok &= found & (keys_t[fp] <= hi_key)
        if not ok.any():
            return np.empty(0, dtype=np.int64)
    return np.unique(od_all[ok])


def _rank_key_sort(doc: np.ndarray, score: np.ndarray, warc: np.ndarray, k: int):
    order = np.lexsort((doc, warc, score))[::-1][:k]
    return [
        (int(doc[i]), float(score[i]), int(warc[i])) for i in order
    ]


# ---------------------------------------------------------------------------
# array path (all chain terms below the stream limit)
# ---------------------------------------------------------------------------


class _TermPostings:
    """One term's decoded sub-lists + position blobs (salt strides kept
    separate so record indices stay valid for gather_positions)."""

    __slots__ = ("term", "subs", "all_ids")

    def __init__(self, term: str, subs: list):
        self.term = term
        self.subs = subs  # [(ids, scores, warc, pos_blob), ...]
        self.all_ids = (
            np.sort(np.concatenate([s[0] for s in subs]))
            if subs
            else np.empty(0, dtype=np.int64)
        )

    def occurrences(self, cand: np.ndarray):
        """Positions restricted to candidate docs.

        Returns (doc, start, length) flat arrays (one row per occurrence)
        plus (docs, scores, warc) posting rows for the candidates."""
        occ_doc, occ_start, occ_len = [], [], []
        p_doc, p_score, p_warc = [], [], []
        for ids, scores, warc, pblob in self.subs:
            sel = np.flatnonzero(np.isin(ids, cand))
            if len(sel) == 0:
                continue
            counts, starts, lens = gather_positions(pblob, sel)
            occ_doc.append(np.repeat(ids[sel], counts))
            occ_start.append(starts)
            occ_len.append(lens)
            p_doc.append(ids[sel])
            p_score.append(scores[sel])
            p_warc.append(warc[sel])
        if not occ_doc:
            z = np.empty(0, dtype=np.int64)
            return z, z, z, z, z.astype(np.float32), z.astype(np.uint64)
        return (
            np.concatenate(occ_doc),
            np.concatenate(occ_start),
            np.concatenate(occ_len),
            np.concatenate(p_doc),
            np.concatenate(p_score),
            np.concatenate(p_warc),
        )


# cache bound is a POSTING-COUNT sum over cached terms (decoded ids);
# the attached score/warc/pos-blob payloads scale with it by a small
# constant, so the real byte ceiling is ~30-40 B per counted posting
_PHRASE_CACHE_POSTINGS = 8_000_000  # FIFO eviction


def _tp_cache_put(searcher, term: str, tp: "_TermPostings") -> None:
    cache = searcher._phrase_tp_cache
    n = len(tp.all_ids)
    if n > _PHRASE_CACHE_POSTINGS:
        return  # never cacheable — do NOT flush the warm entries
    while (
        searcher._phrase_tp_postings + n > _PHRASE_CACHE_POSTINGS and cache
    ):
        old = cache.pop(next(iter(cache)))
        searcher._phrase_tp_postings -= len(old.all_ids)
    cache[term] = tp
    searcher._phrase_tp_postings += n


def _candidate_and(tps: dict) -> np.ndarray:
    """Sorted docID intersection across the chain's distinct terms,
    rarest term first (each further intersect only shrinks)."""
    ordered = sorted(tps.values(), key=lambda tp: len(tp.all_ids))
    cand = ordered[0].all_ids
    for tp in ordered[1:]:
        cand = cand[np.isin(cand, tp.all_ids)]
        if len(cand) == 0:
            break
    return cand


def _array_occurrences(tps: dict, cand: np.ndarray) -> tuple[dict, dict]:
    """occ/post dicts for the verify kernels, from fully decoded terms."""
    occ: dict[str, tuple] = {}
    post: dict[str, tuple] = {}
    for t, tp in tps.items():
        od, os_, ol, pd, ps, pw = tp.occurrences(cand)
        ordv = np.searchsorted(cand, od)
        keys = ordv * _STRIDE + os_
        srt = np.argsort(keys, kind="stable")
        occ[t] = (keys[srt], os_[srt], ol[srt], ordv[srt])
        post[t] = (pd, ps, pw)
    return occ, post


def _array_score(matched: np.ndarray, terms, post: dict):
    """Sorted-term f64 score accumulation + warc for matched docs."""
    score = np.zeros(len(matched), dtype=np.float64)
    warc = np.zeros(len(matched), dtype=np.uint64)
    for t in sorted(terms):
        pd, ps, pw = post[t]
        srt = np.argsort(pd, kind="stable")
        pd, ps, pw = pd[srt], ps[srt], pw[srt]
        idx = np.searchsorted(pd, matched)
        score += ps[idx].astype(np.float64)
        warc = pw[idx]  # same doc -> same warc for every term
    return score, warc


# ---------------------------------------------------------------------------
# streaming path (any chain term above the limit)
# ---------------------------------------------------------------------------

# max total postings a chain term may fully decode before the query
# switches to the bounded streaming AND (mirror of searcher.DECODE_LIMIT)
_PHRASE_STREAM_LIMIT = 1_000_000
_STREAM_CHUNK_BLOCKS = 64   # rarest-term blocks per candidate chunk (×128 postings)
_STREAM_RUN_GAP = 8         # merge candidate block runs with gaps <= this
_STREAM_RUN_CAP = 256       # max blocks decoded in one vectorized range
_PHRASE_SUB_CACHE_BYTES = 256 * 1024 * 1024  # compressed blob bytes, FIFO


class _SubList:
    """Block-indexed view of one (term, salt) posting sub-list: header
    metadata parsed once (numpy arrays, ~4 varints per 128-posting
    block), bodies decoded per block RANGE on demand — the whole list is
    never materialized at once."""

    __slots__ = (
        "blob", "pblob", "salt", "n", "n_blocks", "arr",
        "block_pos", "block_len", "block_count", "block_last",
        "block_prev", "block_start", "_pos_index", "nbytes",
    )

    def __init__(self, blob: bytes, pblob: bytes, salt: int):
        self.blob = blob
        self.pblob = pblob
        self.salt = salt
        self.arr = np.frombuffer(blob, dtype=np.uint8)
        mv = memoryview(blob)
        n, pos = read_varint(mv, 0)
        n_blocks, pos = read_varint(mv, pos)
        self.n = n
        self.n_blocks = n_blocks
        bp = np.empty(n_blocks, dtype=np.int64)
        bl = np.empty(n_blocks, dtype=np.int64)
        bc = np.empty(n_blocks, dtype=np.int64)
        blast = np.empty(n_blocks, dtype=np.int64)
        bprev = np.empty(n_blocks, dtype=np.int64)
        prev_last = 0
        for bi in range(n_blocks):
            body_len, pos = read_varint(mv, pos)
            count, pos = read_varint(mv, pos)
            last_delta, pos = read_varint(mv, pos)
            pos += 4  # max_score
            bp[bi] = pos
            bl[bi] = body_len
            bc[bi] = count
            bprev[bi] = prev_last
            prev_last += last_delta
            blast[bi] = prev_last
            pos += body_len
        self.block_pos, self.block_len, self.block_count = bp, bl, bc
        self.block_last, self.block_prev = blast, bprev
        bs = np.zeros(n_blocks + 1, dtype=np.int64)
        np.cumsum(bc, out=bs[1:])
        self.block_start = bs
        self._pos_index = None
        self.nbytes = len(blob) + len(pblob)

    def decode_range(self, b_lo: int, b_hi: int):
        """(ids, scores, warc) for blocks [b_lo, b_hi) — ONE vectorized
        varint decode over the range (the block-range generalization of
        codec.decode_all)."""
        counts = self.block_count[b_lo:b_hi]
        arr = self.arr
        var_parts, score_parts, warc_parts = [], [], []
        for bi in range(b_lo, b_hi):
            pos = int(self.block_pos[bi])
            count = int(self.block_count[bi])
            var_len = int(self.block_len[bi]) - 12 * count
            var_parts.append(arr[pos : pos + var_len])
            fixed = pos + var_len
            score_parts.append(
                np.frombuffer(self.blob, dtype="<f4", count=count, offset=fixed)
            )
            warc_parts.append(
                np.frombuffer(
                    self.blob, dtype="<u8", count=count, offset=fixed + 4 * count
                )
            )
        varbuf = (
            var_parts[0] if len(var_parts) == 1 else np.concatenate(var_parts)
        )
        vals = decode_varint_stream(varbuf)
        total = int(counts.sum())
        # per-block layout [deltas(count), tfs(count)]: skip each block's
        # tf run when indexing deltas (same index math as decode_all)
        inc = np.ones(total, dtype=np.int64)
        bounds = np.cumsum(counts)[:-1]
        if b_hi - b_lo > 1:
            inc[bounds] += counts[:-1]
        inc[0] = 0
        delta_idx = np.cumsum(inc)
        ids = int(self.block_prev[b_lo]) + np.cumsum(
            vals[delta_idx].astype(np.int64)
        )
        scores = (
            score_parts[0]
            if len(score_parts) == 1
            else np.concatenate(score_parts)
        )
        warc = (
            warc_parts[0] if len(warc_parts) == 1 else np.concatenate(warc_parts)
        )
        return ids, scores, warc

    def probe(self, cand: np.ndarray, acct: list):
        """Membership lookup of sorted candidate doc ids against this
        sub-list.  Returns (found mask, scores, abs posting indices).
        Uses the block headers as skip data: only candidate-covering
        block runs (gap-merged, length-capped) are decoded."""
        nb = self.n_blocks
        found = np.zeros(len(cand), dtype=bool)
        scores = np.zeros(len(cand), dtype=np.float32)
        absi = np.zeros(len(cand), dtype=np.int64)
        if nb == 0:
            return found, scores, absi
        bi = np.searchsorted(self.block_last, cand, side="left")
        valid = bi < nb
        if valid.any():
            bv = bi[valid]
            # block b covers (prev_last, last] — except block 0, whose
            # first delta is absolute, so doc_id == 0 lives at prev_last
            vv = (cand[valid] > self.block_prev[bv]) | (bv == 0)
            valid[valid] = vv
        if not valid.any():
            return found, scores, absi
        sel = np.flatnonzero(valid)
        bsel = bi[sel]  # non-decreasing (cand sorted)
        ub = np.unique(bsel)
        run_breaks = np.flatnonzero(np.diff(ub) > _STREAM_RUN_GAP) + 1
        for run in np.split(ub, run_breaks):
            r_lo, r_hi = int(run[0]), int(run[-1]) + 1
            for p_lo in range(r_lo, r_hi, _STREAM_RUN_CAP):
                p_hi = min(p_lo + _STREAM_RUN_CAP, r_hi)
                ids_r, sc_r, _w = self.decode_range(p_lo, p_hi)
                acct[0] += len(ids_r)
                m = (bsel >= p_lo) & (bsel < p_hi)
                if not m.any():
                    continue
                cc = cand[sel[m]]
                p = np.searchsorted(ids_r, cc)
                ok = p < len(ids_r)
                pc = np.where(ok, p, 0)
                ok &= ids_r[pc] == cc
                tgt = sel[m][ok]
                found[tgt] = True
                scores[tgt] = sc_r[pc[ok]]
                absi[tgt] = int(self.block_start[p_lo]) + pc[ok]
        return found, scores, absi

    def gather(self, wanted: np.ndarray):
        """Positions for sorted abs posting indices via the checkpointed
        pos-blob index (built lazily, O(n) once, ~0.13 B/posting kept)."""
        if self._pos_index is None:
            from myaku_ray.index.positions import PosBlobIndex

            self._pos_index = PosBlobIndex(self.pblob)
        return self._pos_index.gather(wanted)


def _read_term_rows(searcher, term: str) -> list[tuple]:
    seg = term_hash(term) % searcher.stats["num_segments"]
    rows = []
    for fi in searcher._segment_file_indexes(seg):
        rows.extend(fi.term_rows(term, with_positions=True))
    return rows


def _init_caches(searcher) -> None:
    if getattr(searcher, "_phrase_tp_cache", None) is None:
        searcher._phrase_tp_cache = {}
        searcher._phrase_tp_postings = 0
    if getattr(searcher, "_phrase_sub_cache", None) is None:
        searcher._phrase_sub_cache = {}
        searcher._phrase_sub_bytes = 0


def _sub_cache_put(searcher, term: str, subs: list) -> None:
    size = sum(u.nbytes for u in subs)
    if size > _PHRASE_SUB_CACHE_BYTES:
        return
    cache = searcher._phrase_sub_cache
    while (
        searcher._phrase_sub_bytes + size > _PHRASE_SUB_CACHE_BYTES and cache
    ):
        old = cache.pop(next(iter(cache)))
        searcher._phrase_sub_bytes -= sum(u.nbytes for u in old)
    cache[term] = subs
    searcher._phrase_sub_bytes += size


def load_term_postings(searcher, term: str) -> _TermPostings | None:
    """Decoded sub-lists + pos blobs for the ARRAY path, cached per
    Searcher (bounded FIFO — the phrase analog of the term-array cache,
    so repeated phrase queries skip the decode)."""
    _init_caches(searcher)
    hit = searcher._phrase_tp_cache.get(term)
    if hit is not None:
        return hit
    rows = _read_term_rows(searcher, term)
    if not rows:
        return None
    subs = [
        (lambda d: (d[0], d[2], d[3], pblob))(decode_all(blob))
        for blob, _ms, pblob, _salt in rows
    ]
    tp = _TermPostings(term, subs)
    _tp_cache_put(searcher, term, tp)
    return tp


def _resolve_terms(searcher, terms: list[str]):
    """Load every distinct term and pick the execution path.

    Returns ('array', {t: _TermPostings}) when every term's total
    postings fit _PHRASE_STREAM_LIMIT, ('stream', {t: [_SubList]})
    otherwise, or (None, None) when any term has no postings."""
    _init_caches(searcher)
    totals: dict[str, int] = {}
    raw_rows: dict[str, list] = {}
    tp_hits: dict[str, _TermPostings] = {}
    sub_hits: dict[str, list] = {}
    for t in terms:
        tp = searcher._phrase_tp_cache.get(t)
        if tp is not None:
            tp_hits[t] = tp
            totals[t] = len(tp.all_ids)
            continue
        subs = searcher._phrase_sub_cache.get(t)
        if subs is not None:
            sub_hits[t] = subs
            totals[t] = sum(u.n for u in subs)
            continue
        rows = _read_term_rows(searcher, t)
        if not rows:
            return None, None
        raw_rows[t] = rows
        totals[t] = sum(
            read_varint(memoryview(blob), 0)[0] for blob, *_ in rows
        )
    if not totals or min(totals.values()) == 0:
        return None, None
    if max(totals.values()) <= _PHRASE_STREAM_LIMIT:
        tps = dict(tp_hits)
        for t, subs in sub_hits.items():
            decoded = [
                (lambda d: (d[0], d[2], d[3], u.pblob))(decode_all(u.blob))
                for u in subs
            ]
            tps[t] = _TermPostings(t, decoded)
            _tp_cache_put(searcher, t, tps[t])
        for t, rows in raw_rows.items():
            decoded = [
                (lambda d: (d[0], d[2], d[3], pblob))(decode_all(blob))
                for blob, _ms, pblob, _salt in rows
            ]
            tps[t] = _TermPostings(t, decoded)
            _tp_cache_put(searcher, t, tps[t])
        return "array", tps
    subs_by_term: dict[str, list] = dict(sub_hits)
    for t, rows in raw_rows.items():
        subs_by_term[t] = [
            _SubList(blob, pblob, salt) for blob, _ms, pblob, salt in rows
        ]
        _sub_cache_put(searcher, t, subs_by_term[t])
    for t in tp_hits:  # decoded-cache hits lack blobs
        subs = searcher._phrase_sub_cache.get(t)
        if subs is None:  # probe the sub cache BEFORE re-reading: a hot
            # small term alongside an oversized particle would otherwise
            # re-pay the row read + header parse on every stream query
            rows = _read_term_rows(searcher, t)
            subs = [
                _SubList(blob, pblob, salt)
                for blob, _ms, pblob, salt in rows
            ]
            _sub_cache_put(searcher, t, subs)
        subs_by_term[t] = subs
    return "stream", subs_by_term


def _group_by_salt(subs: list) -> dict[int, list]:
    out: dict[int, list] = {}
    for u in subs:
        out.setdefault(u.salt, []).append(u)
    return out


def _compress_topk(rows: list, k: int) -> list:
    """Fold accumulated (doc, score, warc) chunk arrays down to the
    global top-k whenever the buffer grows past a few k."""
    total = sum(len(r[0]) for r in rows)
    if total <= max(4 * k, 2048):
        return rows
    doc = np.concatenate([r[0] for r in rows])
    score = np.concatenate([r[1] for r in rows])
    warc = np.concatenate([r[2] for r in rows])
    order = np.lexsort((doc, warc, score))[::-1][:k]
    return [(doc[order], score[order], warc[order])]


def _stream_query(
    searcher,
    terms: list[str],
    subs_by_term: dict,
    verify,
    k: int,
    collect_ids: bool = False,
):
    """Bounded-memory conjunctive scan — the >_PHRASE_STREAM_LIMIT path.

    Iterates the rarest term's sub-lists in _STREAM_CHUNK_BLOCKS-block
    candidate chunks; every other term is probed per chunk through its
    SAME-SALT sub-lists' block index (salt = doc_id % salt_buckets at
    build time, so only the matching stride can contain a candidate),
    decoding only candidate-covering block runs.  ``verify(cand, occ)``
    -> matched candidate ordinals.  Returns (topk rows, count,
    matched_ids-or-None); per-query stats (peak decoded postings per
    chunk, total decoded) land on ``searcher._phrase_last_stats``."""
    order = sorted(terms, key=lambda t: sum(u.n for u in subs_by_term[t]))
    rarest, others = order[0], order[1:]
    by_salt = {t: _group_by_salt(subs_by_term[t]) for t in others}
    score_terms = sorted(set(terms))
    topk_rows: list = []
    count = 0
    matched_parts: list | None = [] if collect_ids else None
    peak = 0
    total_decoded = 0
    for ru in subs_by_term[rarest]:
        for b0 in range(0, ru.n_blocks, _STREAM_CHUNK_BLOCKS):
            acct = [0]
            b1 = min(b0 + _STREAM_CHUNK_BLOCKS, ru.n_blocks)
            cand, r_sc, r_w = ru.decode_range(b0, b1)
            acct[0] += len(cand)
            sc = {rarest: r_sc}
            sub_of = {rarest: np.zeros(len(cand), dtype=np.int32)}
            abs_of = {
                rarest: int(ru.block_start[b0])
                + np.arange(len(cand), dtype=np.int64)
            }
            sublists: dict[str, list] = {rarest: [ru]}
            warc = r_w
            dead = False
            for t in others:
                subs_s = by_salt[t].get(ru.salt, [])
                found = np.zeros(len(cand), dtype=bool)
                f_sc = np.zeros(len(cand), dtype=np.float32)
                f_sub = np.full(len(cand), -1, dtype=np.int32)
                f_abs = np.zeros(len(cand), dtype=np.int64)
                for si, u in enumerate(subs_s):
                    rem = np.flatnonzero(~found)
                    if rem.size == 0:
                        break
                    fnd, s_, a_ = u.probe(cand[rem], acct)
                    hit = rem[fnd]
                    found[hit] = True
                    f_sc[hit] = s_[fnd]
                    f_sub[hit] = si
                    f_abs[hit] = a_[fnd]
                if not found.any():
                    dead = True
                    break
                cand = cand[found]
                warc = warc[found]
                for key in sc:
                    sc[key] = sc[key][found]
                    sub_of[key] = sub_of[key][found]
                    abs_of[key] = abs_of[key][found]
                sc[t] = f_sc[found]
                sub_of[t] = f_sub[found]
                abs_of[t] = f_abs[found]
                sublists[t] = subs_s
            peak = max(peak, acct[0])
            total_decoded += acct[0]
            if dead or len(cand) == 0:
                continue
            # positions per (term, sub-list) for the survivors only
            occ: dict[str, tuple] = {}
            for t in order:
                od_parts, st_parts, ln_parts = [], [], []
                for si, u in enumerate(sublists[t]):
                    m = np.flatnonzero(sub_of[t] == si)
                    if m.size == 0:
                        continue
                    counts, starts, lens = u.gather(abs_of[t][m])
                    od_parts.append(np.repeat(m, counts))
                    st_parts.append(starts)
                    ln_parts.append(lens)
                od = np.concatenate(od_parts)
                st = np.concatenate(st_parts)
                ln = np.concatenate(ln_parts)
                keys = od * _STRIDE + st
                srt = np.argsort(keys, kind="stable")
                occ[t] = (keys[srt], st[srt], ln[srt], od[srt])
            m_ord = verify(cand, occ)
            if len(m_ord) == 0:
                continue
            count += len(m_ord)
            if matched_parts is not None:
                matched_parts.append(cand[m_ord])
            score = np.zeros(len(m_ord), dtype=np.float64)
            for t in score_terms:  # sorted-term f64 accumulation
                score += sc[t][m_ord].astype(np.float64)
            topk_rows.append((cand[m_ord], score, warc[m_ord]))
            topk_rows = _compress_topk(topk_rows, k)
    searcher._phrase_last_stats = {
        "path": "stream",
        "peak_decoded": peak,
        "decoded_total": total_decoded,
        "terms": {t: sum(u.n for u in subs_by_term[t]) for t in terms},
        "matched": count,
    }
    if topk_rows:
        doc = np.concatenate([r[0] for r in topk_rows])
        score = np.concatenate([r[1] for r in topk_rows])
        warc = np.concatenate([r[2] for r in topk_rows])
        final = _rank_key_sort(doc, score, warc, k)
    else:
        final = []
    matched_ids = (
        np.sort(np.concatenate(matched_parts))
        if matched_parts
        else np.empty(0, dtype=np.int64)
    ) if collect_ids else None
    return final, count, matched_ids


def term_positions_in_docs(searcher, terms, doc_ids) -> dict:
    """(term, doc_id) -> (starts, lens) point-reads from the positional
    sidecar — the preview/highlight path's replacement for re-tokenizing
    each result doc query-side (the reference recomputes offsets per
    result, search/article_preview.py:126-199; with ``pos_blob`` the
    offsets are already indexed).  Block headers route each doc to at
    most one block per same-salt sub-list, so the cost is O(results),
    independent of term df."""
    _init_caches(searcher)
    sb = int(searcher.stats.get("salt_buckets", 1))
    docs = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    out: dict = {}
    if len(docs) == 0:
        return out
    for t in terms:
        subs = searcher._phrase_sub_cache.get(t)
        if subs is None:
            rows = _read_term_rows(searcher, t)
            if not rows:
                continue
            subs = [
                _SubList(blob, pblob, salt)
                for blob, _ms, pblob, salt in rows
            ]
            _sub_cache_put(searcher, t, subs)
        for u in subs:
            cand = docs[docs % sb == u.salt]
            if len(cand) == 0:
                continue
            acct = [0]
            found, _sc, absi = u.probe(cand, acct)
            if not found.any():
                continue
            sel = np.flatnonzero(found)
            counts, starts, lens = u.gather(absi[sel])
            off = 0
            for i, c in zip(sel, counts):
                c = int(c)
                out[(t, int(cand[i]))] = (
                    starts[off : off + c], lens[off : off + c]
                )
                off += c
    return out


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def _matched_docs(searcher, chain: list[str]) -> tuple | None:
    """Array-path phrase core: (matched doc ids, tps dict, post) or None."""
    tps: dict[str, _TermPostings] = {}
    for t in dict.fromkeys(chain):  # distinct, order-preserving
        tp = load_term_postings(searcher, t)
        if tp is None:
            return None
        tps[t] = tp
    cand = _candidate_and(tps)
    if len(cand) == 0:
        return None
    occ, post = _array_occurrences(tps, cand)
    m_ord = _chain_walk(chain, occ)
    if len(m_ord) == 0:
        return None
    matched = cand[m_ord]
    searcher._phrase_last_stats = {
        "path": "array",
        "terms": {t: len(tp.all_ids) for t, tp in tps.items()},
        "matched": len(matched),
    }
    return matched, tps, post


def phrase_match_docs(searcher, query_str: str) -> np.ndarray:
    """Sorted doc ids containing the query as a contiguous token chain."""
    chain = phrase_chain(searcher, query_str)
    if not chain:
        return np.empty(0, dtype=np.int64)
    distinct = list(dict.fromkeys(chain))
    mode, data = _resolve_terms(searcher, distinct)
    if mode is None:
        return np.empty(0, dtype=np.int64)
    if mode == "stream":
        _rows, _count, ids = _stream_query(
            searcher, distinct, data, lambda cand, occ: _chain_walk(chain, occ),
            k=1, collect_ids=True,
        )
        return ids
    m = _matched_docs(searcher, chain)
    return m[0] if m else np.empty(0, dtype=np.int64)


def phrase_topk(searcher, query_str: str, k: int = 10) -> list:
    """Ranked [(doc_id, score, warc_us)] of phrase-matching docs."""
    chain = phrase_chain(searcher, query_str)
    if not chain:
        return []
    distinct = list(dict.fromkeys(chain))
    mode, data = _resolve_terms(searcher, distinct)
    if mode is None:
        return []
    if mode == "stream":
        rows, _count, _ids = _stream_query(
            searcher, distinct, data,
            lambda cand, occ: _chain_walk(chain, occ), k,
        )
        return rows
    m = _matched_docs(searcher, chain)
    if not m:
        return []
    matched, _tps, post = m
    score, warc = _array_score(matched, dict.fromkeys(chain), post)
    return _rank_key_sort(matched, score, warc, k)


def phrase_count(searcher, query_str: str) -> int:
    chain = phrase_chain(searcher, query_str)
    if not chain:
        return 0
    distinct = list(dict.fromkeys(chain))
    mode, data = _resolve_terms(searcher, distinct)
    if mode is None:
        return 0
    if mode == "stream":
        _rows, count, _ids = _stream_query(
            searcher, distinct, data,
            lambda cand, occ: _chain_walk(chain, occ), k=1,
        )
        return count
    m = _matched_docs(searcher, chain)
    return int(len(m[0])) if m else 0


def near_topk(
    searcher, query_str: str, window: int, k: int = 10
) -> list:
    """Proximity search: docs where ONE occurrence of every distinct
    query term fits inside a char window (max start - min start <=
    window), ranked like phrase_topk.

    Fully vectorized decision (see _window_match); the serial oracle
    verifies with the classic smallest-range merge instead."""
    terms = searcher.analyze_query(query_str)
    if not terms:
        return []
    mode, data = _resolve_terms(searcher, terms)
    if mode is None:
        return []
    if mode == "stream":
        rows, _count, _ids = _stream_query(
            searcher, terms, data,
            lambda cand, occ: _window_match(terms, occ, window), k,
        )
        return rows
    tps = data
    cand = _candidate_and(tps)
    if len(cand) == 0:
        return []
    occ, post = _array_occurrences(tps, cand)
    m_ord = _window_match(terms, occ, window)
    if len(m_ord) == 0:
        return []
    matched = cand[m_ord]
    searcher._phrase_last_stats = {
        "path": "array",
        "terms": {t: len(tp.all_ids) for t, tp in tps.items()},
        "matched": len(matched),
    }
    score, warc = _array_score(matched, terms, post)
    return _rank_key_sort(matched, score, warc, k)
