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


def array_topk(iters: dict, k: int) -> list[tuple[int, float, int]]:
    """Vectorized multi-term top-k when every term is array-backed.

    Accumulates per-doc scores with ``acc[doc] += contributions`` one term
    at a time in SORTED term order — float64 over float32 contributions,
    exactly the serial oracle's summation order."""
    terms = sorted(iters)
    all_ids = np.unique(np.concatenate([iters[t].ids for t in terms]))
    acc = np.zeros(len(all_ids), dtype=np.float64)
    warc = np.zeros(len(all_ids), dtype=np.uint64)
    for t in terms:
        it = iters[t]
        idx = np.searchsorted(all_ids, it.ids)
        acc[idx] += it.scores.astype(np.float64)
        warc[idx] = it.warc
    if len(all_ids) > k * 8:
        part = np.argpartition(acc, -min(k * 8, len(acc) - 1))[-k * 8 :]
        cutoff = acc[part].min()
        cand = np.nonzero(acc >= cutoff)[0]
    else:
        cand = np.arange(len(all_ids))
    order = np.lexsort((all_ids[cand], warc[cand], acc[cand]))[::-1][:k]
    sel = cand[order]
    return [(int(all_ids[i]), float(acc[i]), int(warc[i])) for i in sel]


def wand_topk(term_iters: dict, k: int) -> list[tuple[int, float, int]]:
    """Top-k (doc_id, score, warc_us) from {term: MergedIterator}."""
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
            if len(heap) < k:
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
