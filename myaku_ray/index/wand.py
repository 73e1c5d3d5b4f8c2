"""Document-at-a-time block-max WAND top-k over merged posting iterators.

Shared by the pages-corpus Searcher and the documents-table TextSearcher.
Pivot selection uses whole-list max scores; at an aligned pivot the bound
is refined with the per-block maxima from the codec's block headers
(``block_info`` — header walk, no body decode) and, when the refined
bound cannot reach the heap minimum, the cursors jump past the tightest
block boundary (shallow advance).  Pruning is strict-< against the heap
minimum so score ties are evaluated and resolved by the
(score, warc_us, doc_id) DESC tie-break — required for rank-identity with
serial oracles (ArticleRankKey order, myaku/datatypes.py:134-148).

Score accumulation over a doc's matching terms runs in sorted-term order
(deterministic float64 summation, identical to the oracles).
"""

from __future__ import annotations

import heapq

import numpy as np


def array_topk(
    iters: dict, k: int, warc_range: tuple[int, int] | None = None
) -> list[tuple[int, float, int]]:
    """Vectorized multi-term top-k when every term is array-backed.

    Accumulates per-doc scores with ``acc[doc] += contributions`` one term
    at a time in SORTED term order — float64 over float32 contributions,
    exactly the serial oracle's summation order.

    ``warc_range=(lo, hi)`` applies Lucene-filter semantics: docs whose
    crawl time falls outside [lo, hi] are masked out AFTER accumulation
    (scores of the survivors are unchanged — a filter, not a boost)."""
    terms = sorted(iters)
    all_ids = np.unique(np.concatenate([iters[t].ids for t in terms]))
    acc = np.zeros(len(all_ids), dtype=np.float64)
    warc = np.zeros(len(all_ids), dtype=np.uint64)
    for t in terms:
        it = iters[t]
        idx = np.searchsorted(all_ids, it.ids)
        acc[idx] += it.scores.astype(np.float64)
        warc[idx] = it.warc
    if warc_range is not None:
        lo, hi = warc_range
        keep = (warc >= np.uint64(max(lo, 0))) & (warc <= np.uint64(hi))
        all_ids, acc, warc = all_ids[keep], acc[keep], warc[keep]
        if len(all_ids) == 0:
            return []
    if len(all_ids) > k * 8:
        part = np.argpartition(acc, -min(k * 8, len(acc) - 1))[-k * 8 :]
        cutoff = acc[part].min()
        cand = np.nonzero(acc >= cutoff)[0]
    else:
        cand = np.arange(len(all_ids))
    order = np.lexsort((all_ids[cand], warc[cand], acc[cand]))[::-1][:k]
    sel = cand[order]
    return [(int(all_ids[i]), float(acc[i]), int(warc[i])) for i in sel]


def wand_topk(
    term_iters: dict, k: int, warc_range: tuple[int, int] | None = None
) -> list[tuple[int, float, int]]:
    """Top-k (doc_id, score, warc_us) from {term: MergedIterator}.

    ``warc_range=(lo, hi)`` filters candidates by crawl time at the
    aligned-pivot evaluation (scores unchanged).  Block-max pruning stays
    valid: the per-block bounds are upper bounds for ANY subset of the
    block's docs, so skipping a block that cannot reach theta never skips
    an in-range doc that could."""
    heap: list[tuple[float, int, int]] = []  # min-heap of (score, warc, doc)
    live = [(t, it) for t, it in term_iters.items() if it is not None and not it.exhausted]

    while live:
        live = [(t, it) for (t, it) in live if not it.exhausted]
        if not live:
            break
        live.sort(key=lambda p: p[1].doc_id())
        theta = heap[0][0] if len(heap) >= k else float("-inf")
        ub = 0.0
        pivot = -1
        for i, (_, it) in enumerate(live):
            ub += it.max_score
            if ub >= theta:
                pivot = i
                break
        if pivot == -1:
            break
        pivot_doc = live[pivot][1].doc_id()
        if live[0][1].doc_id() == pivot_doc:
            # Block-max refinement (BMW shallow advance): per-block upper
            # bounds at pivot_doc, read from block HEADERS only.  Prune
            # strictly-below theta so score ties still evaluate (the
            # (score, warc, doc) tie-break needs them for rank-identity).
            if theta != float("-inf"):
                # every list at pivot_doc contributes (lists past the
                # pivot can be tied on doc_id) — bound over that prefix
                edge = pivot
                while (
                    edge + 1 < len(live)
                    and live[edge + 1][1].doc_id() == pivot_doc
                ):
                    edge += 1
                ub_blk = 0.0
                boundaries = []
                for _, it in live[: edge + 1]:
                    info = it.block_info(pivot_doc)
                    if info is None:
                        continue
                    bm, blast = info
                    ub_blk += bm
                    boundaries.append(blast)
                if ub_blk < theta:
                    # no doc in [pivot_doc, d2-1] can reach the heap min:
                    # the per-list block bounds hold through min(boundary),
                    # capped before the first list beyond the aligned set
                    d2 = (min(boundaries) + 1) if boundaries else pivot_doc + 1
                    if edge + 1 < len(live):
                        d2 = min(d2, live[edge + 1][1].doc_id())
                    d2 = max(d2, pivot_doc + 1)
                    for i in range(edge + 1):
                        live[i][1].seek(d2)
                    continue
            contribs = []
            warc = 0
            for t, it in live:
                if not it.exhausted and it.doc_id() == pivot_doc:
                    contribs.append((t, it.score()))
                    warc = it.warc_us()
            score = 0.0
            for _, s in sorted(contribs):
                score += s
            key = (score, warc, pivot_doc)
            if warc_range is not None and not (
                warc_range[0] <= warc <= warc_range[1]
            ):
                pass  # out-of-range doc: advance cursors, never enters heap
            elif len(heap) < k:
                heapq.heappush(heap, key)
            elif key > heap[0]:
                heapq.heapreplace(heap, key)
            for _, it in live:
                if not it.exhausted and it.doc_id() == pivot_doc:
                    it.next()
        else:
            for i in range(pivot):
                live[i][1].seek(pivot_doc)

    ranked = sorted(heap, reverse=True)
    return [(d, s, w) for (s, w, d) in ranked]


# ---------------------------------------------------------------------------
# Boolean retrieval: conjunctive (AND) top-k with exclusions (NOT)
# ---------------------------------------------------------------------------

def _member_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Membership mask of ``a``'s elements in SORTED-unique ``b``."""
    if len(b) == 0:
        return np.zeros(len(a), dtype=bool)
    pos = np.searchsorted(b, a)
    pos[pos == len(b)] = 0
    return b[pos] == a


def array_boolean_topk(
    must: dict, nots: list, k: int
) -> list[tuple[int, float, int]]:
    """Vectorized AND/NOT top-k when every list is array-backed.

    Intersection runs rarest-list-first (candidate set only shrinks);
    score accumulation over the survivors runs in SORTED term order
    (deterministic float64 summation, the array_topk convention)."""
    terms = sorted(must)
    by_df = sorted(terms, key=lambda t: must[t].n)
    cand = must[by_df[0]].ids
    for t in by_df[1:]:
        cand = cand[_member_sorted(cand, must[t].ids)]
        if len(cand) == 0:
            return []
    for nit in nots:
        cand = cand[~_member_sorted(cand, nit.ids)]
        if len(cand) == 0:
            return []
    acc = np.zeros(len(cand), dtype=np.float64)
    warc = np.zeros(len(cand), dtype=np.uint64)
    for t in terms:
        it = must[t]
        idx = np.searchsorted(it.ids, cand)
        acc += it.scores[idx].astype(np.float64)
        warc = it.warc[idx]
    order = np.lexsort((cand, warc, acc))[::-1][:k]
    return [(int(cand[i]), float(acc[i]), int(warc[i])) for i in order]


def stream_boolean_topk(
    must: dict, nots: list, k: int
) -> list[tuple[int, float, int]]:
    """Document-at-a-time AND/NOT over posting iterators (any mix of
    array-backed and streaming block iterators — both expose
    doc_id/seek/next/score/warc_us/exhausted).  Memory is O(1) per list:
    no term's postings are ever concatenated.  The conjunction itself is
    the skip structure — every iterator seeks to the current alignment
    candidate, so a rare term drags the common ones through their block
    metadata without decoding skipped blocks."""
    import heapq

    its = [must[t] for t in sorted(must)]
    if any(it.exhausted for it in its):
        return []
    heap: list[tuple[float, int, int]] = []
    doc = max(it.doc_id() for it in its)
    while True:
        aligned = True
        for it in its:
            if it.doc_id() < doc:
                it.seek(doc)
                if it.exhausted:
                    return _ranked(heap)
            if it.doc_id() > doc:
                doc = it.doc_id()
                aligned = False
        if not aligned:
            continue
        excluded = False
        for nit in nots:
            if nit.exhausted:
                continue
            if nit.doc_id() < doc:
                nit.seek(doc)
            if not nit.exhausted and nit.doc_id() == doc:
                excluded = True
        if not excluded:
            score = 0.0
            warc = 0
            for it in its:  # sorted-term order (its is term-sorted)
                score += it.score()
                warc = it.warc_us()
            key = (score, warc, doc)
            if len(heap) < k:
                heapq.heappush(heap, key)
            elif key > heap[0]:
                heapq.heapreplace(heap, key)
        its[0].next()
        if its[0].exhausted:
            return _ranked(heap)
        doc = its[0].doc_id()


def _ranked(heap: list) -> list[tuple[int, float, int]]:
    return [(d, s, w) for (s, w, d) in sorted(heap, reverse=True)]


def boolean_topk(must: dict, nots: list, k: int):
    """Dispatch: all-array fast path, else streaming DAAT."""
    from myaku_ray.index.codec import ArrayPostings

    if all(isinstance(it, ArrayPostings) for it in must.values()) and all(
        isinstance(it, ArrayPostings) for it in nots
    ):
        return array_boolean_topk(must, nots, k)
    return stream_boolean_topk(must, nots, k)
