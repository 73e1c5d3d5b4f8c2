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

Scale notes
-----------
- The docID AND runs on fully decoded sub-lists; positions are gathered
  ONLY for the intersected docs (``gather_positions`` random access via
  the record-length stream), so position bytes decoded = O(occurrences
  in candidate docs), not O(ctf).
- A phrase of pure high-df particles degenerates to decoding those
  terms' posting ids (same bound as ``Searcher.count``); block-max
  skipping cannot help because adjacency needs every candidate.
"""

from __future__ import annotations

import numpy as np

from myaku_ray.index.codec import decode_all
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


_PHRASE_CACHE_POSTINGS = 8_000_000  # ~decoded-bytes bound, FIFO eviction


def load_term_postings(searcher, term: str) -> _TermPostings | None:
    """Decoded sub-lists + pos blobs, cached per Searcher (bounded FIFO —
    the phrase analog of the term-array cache, so repeated phrase
    queries skip the decode)."""
    cache = getattr(searcher, "_phrase_tp_cache", None)
    if cache is None:
        cache = searcher._phrase_tp_cache = {}
        searcher._phrase_tp_postings = 0
    hit = cache.get(term)
    if hit is not None:
        return hit
    seg = term_hash(term) % searcher.stats["num_segments"]
    subs = []
    for fi in searcher._segment_file_indexes(seg):
        for blob, _ms, pblob in fi.term_rows(term, with_positions=True):
            ids, _tfs, scores, warc = decode_all(blob)
            subs.append((ids, scores, warc, pblob))
    if not subs:
        return None
    tp = _TermPostings(term, subs)
    n = len(tp.all_ids)
    if n > _PHRASE_CACHE_POSTINGS:
        # never cacheable — do NOT flush the warm entries for nothing
        return tp
    while (
        searcher._phrase_tp_postings + n > _PHRASE_CACHE_POSTINGS and cache
    ):
        old = cache.pop(next(iter(cache)))
        searcher._phrase_tp_postings -= len(old.all_ids)
    cache[term] = tp
    searcher._phrase_tp_postings += n
    return tp


def _rank_key_sort(doc: np.ndarray, score: np.ndarray, warc: np.ndarray, k: int):
    order = np.lexsort((doc, warc, score))[::-1][:k]
    return [
        (int(doc[i]), float(score[i]), int(warc[i])) for i in order
    ]


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


def _matched_docs(searcher, chain: list[str]) -> tuple | None:
    """Shared phrase core: (matched doc ids, tps dict, cand) or None."""
    tps: dict[str, _TermPostings] = {}
    for t in dict.fromkeys(chain):  # distinct, order-preserving
        tp = load_term_postings(searcher, t)
        if tp is None:
            return None
        tps[t] = tp
    cand = _candidate_and(tps)
    if len(cand) == 0:
        return None
    # occurrence arrays per distinct term, restricted to candidates
    occ: dict[str, tuple] = {}
    post: dict[str, tuple] = {}
    for t, tp in tps.items():
        od, os_, ol, pd, ps, pw = tp.occurrences(cand)
        ordv = np.searchsorted(cand, od)
        keys = ordv * _STRIDE + os_
        srt = np.argsort(keys, kind="stable")
        occ[t] = (keys[srt], os_[srt], ol[srt], ordv[srt])
        post[t] = (pd, ps, pw)
    # chain walk: survivors carry (doc ordinal, next expected offset)
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
            return None
    matched = cand[np.unique(cur_ord)]
    return matched, tps, post


def phrase_match_docs(searcher, query_str: str) -> np.ndarray:
    """Sorted doc ids containing the query as a contiguous token chain."""
    chain = phrase_chain(searcher, query_str)
    if not chain:
        return np.empty(0, dtype=np.int64)
    m = _matched_docs(searcher, chain)
    return m[0] if m else np.empty(0, dtype=np.int64)


def phrase_topk(searcher, query_str: str, k: int = 10) -> list:
    """Ranked [(doc_id, score, warc_us)] of phrase-matching docs."""
    chain = phrase_chain(searcher, query_str)
    if not chain:
        return []
    m = _matched_docs(searcher, chain)
    if not m:
        return []
    matched, _tps, post = m
    score = np.zeros(len(matched), dtype=np.float64)
    warc = np.zeros(len(matched), dtype=np.uint64)
    for t in sorted(dict.fromkeys(chain)):  # sorted-term f64 accumulation
        pd, ps, pw = post[t]
        srt = np.argsort(pd, kind="stable")
        pd, ps, pw = pd[srt], ps[srt], pw[srt]
        idx = np.searchsorted(pd, matched)
        score += ps[idx].astype(np.float64)
        warc = pw[idx]  # same doc -> same warc for every term
    return _rank_key_sort(matched, score, warc, k)


def phrase_count(searcher, query_str: str) -> int:
    return int(len(phrase_match_docs(searcher, query_str)))


def near_topk(
    searcher, query_str: str, window: int, k: int = 10
) -> list:
    """Proximity search: docs where ONE occurrence of every distinct
    query term fits inside a char window (max start - min start <=
    window), ranked like phrase_topk.

    Fully vectorized decision: a qualifying window's left edge is always
    an occurrence, so a doc matches iff some occurrence s has every term
    occurring in [s, s+window] — one searchsorted per term over its
    composite (doc, start) keys against every anchor.  O(T * N_occ log
    N_occ) numpy work on the AND-candidate occurrences; the serial
    oracle verifies with the classic smallest-range merge instead."""
    terms = searcher.analyze_query(query_str)
    if not terms:
        return []
    tps = {}
    for t in terms:
        tp = load_term_postings(searcher, t)
        if tp is None:
            return []
        tps[t] = tp
    cand = _candidate_and(tps)
    if len(cand) == 0:
        return []
    # occurrences per term restricted to candidates, as composite
    # (doc ordinal, start) keys
    od_all, st_all = [], []
    occ_keys: dict[str, np.ndarray] = {}
    post = {}
    for t in terms:
        od, os_, _ol, pd, ps, pw = tps[t].occurrences(cand)
        ordv = np.searchsorted(cand, od)
        occ_keys[t] = ordv * _STRIDE + os_
        od_all.append(ordv)
        st_all.append(os_)
        post[t] = (pd, ps, pw)
    od_all = np.concatenate(od_all)
    st_all = np.concatenate(st_all)
    # Vectorized window decision: a window of span <= W containing every
    # term exists iff SOME occurrence s (the window's left edge is always
    # an occurrence) has, for every term, an occurrence in [s, s+W]
    # within the same doc.  Per term that is one searchsorted over its
    # (doc ordinal, start) composite keys — no per-doc Python loop.
    anchor_key = od_all * _STRIDE + st_all
    ok = np.ones(len(od_all), dtype=bool)
    hi_key = od_all * _STRIDE + np.minimum(
        st_all + window, int(_STRIDE) - 1
    )
    for t in terms:
        keys_t = np.sort(occ_keys[t])
        pos = np.searchsorted(keys_t, anchor_key)
        found = pos < len(keys_t)
        fp = np.where(found, pos, 0)
        ok &= found & (keys_t[fp] <= hi_key)
        if not ok.any():
            return []
    matched = cand[np.unique(od_all[ok])]
    score = np.zeros(len(matched), dtype=np.float64)
    warc = np.zeros(len(matched), dtype=np.uint64)
    for t in sorted(terms):
        pd, ps, pw = post[t]
        srt = np.argsort(pd, kind="stable")
        pd, ps, pw = pd[srt], ps[srt], pw[srt]
        idx = np.searchsorted(pd, matched)
        score += ps[idx].astype(np.float64)
        warc = pw[idx]
    return _rank_key_sort(matched, score, warc, k)
