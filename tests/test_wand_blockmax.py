"""Block-max WAND: rank-identity vs brute force + evidence that block
bodies are actually skipped (the BMW shallow advance is live)."""

from __future__ import annotations

import numpy as np

from myaku_ray.index.codec import BLOCK_SIZE, PostingIterator, encode_postings
from myaku_ray.index.wand import wand_topk


def _make_lists(seed: int, n_terms: int = 3, n_docs: int = 20_000):
    """Skewed lists: most scores tiny, rare high-score spikes — the shape
    where block-max skipping pays."""
    rng = np.random.default_rng(seed)
    # warc is a per-DOC attribute — one global draw, shared across terms
    all_warc = rng.integers(1, 2**40, size=n_docs * 4).astype(np.uint64)
    lists = {}
    for t in range(n_terms):
        ids = np.sort(
            rng.choice(n_docs * 4, size=n_docs, replace=False)
        ).astype(np.int64)
        scores = rng.random(n_docs).astype(np.float32) * 0.1
        spikes = rng.choice(n_docs, size=20, replace=False)
        scores[spikes] += 5.0
        tfs = rng.integers(1, 5, size=n_docs).astype(np.uint64)
        lists[f"t{t}"] = (ids, tfs, scores, all_warc[ids])
    return lists


def _brute_topk(lists, k):
    acc: dict[int, float] = {}
    warc: dict[int, int] = {}
    for t in sorted(lists):
        ids, _, scores, ws = lists[t]
        for i, d in enumerate(ids):
            acc[int(d)] = acc.get(int(d), 0.0) + float(scores[i])
            warc[int(d)] = int(ws[i])
    ranked = sorted(
        ((s, warc[d], d) for d, s in acc.items()), reverse=True
    )[:k]
    return [(d, s, w) for (s, w, d) in ranked]


def test_bmw_rank_identical_and_prunes():
    lists = _make_lists(7)
    blobs = {
        t: encode_postings(ids, tfs, scores, warc)
        for t, (ids, tfs, scores, warc) in lists.items()
    }

    evals = {"n": 0}
    orig_score = PostingIterator.score

    def counting_score(self):
        evals["n"] += 1
        return orig_score(self)

    PostingIterator.score = counting_score
    try:
        got = wand_topk({t: PostingIterator(b) for t, b in blobs.items()}, 10)
        bmw_evals = evals["n"]

        # plain-WAND baseline: neutralize the block refinement by making
        # every block bound the whole-list bound (never prunes a pivot)
        orig_info = PostingIterator.block_info
        PostingIterator.block_info = lambda self, target: (
            self.max_score, 2**62
        )
        evals["n"] = 0
        got_plain = wand_topk(
            {t: PostingIterator(b) for t, b in blobs.items()}, 10
        )
        plain_evals = evals["n"]
        PostingIterator.block_info = orig_info
    finally:
        PostingIterator.score = orig_score

    want = _brute_topk(lists, 10)
    assert got == want
    assert got_plain == want
    # the whole point of BMW: most pivot evaluations are pruned away
    assert bmw_evals < plain_evals * 0.5, (bmw_evals, plain_evals)


def test_bmw_exact_on_uniform_scores():
    """No spikes (worst case for pruning) must still be rank-identical."""
    rng = np.random.default_rng(11)
    n = 5 * BLOCK_SIZE
    all_warc = rng.integers(1, 2**40, size=n * 3).astype(np.uint64)
    lists = {}
    for t in range(2):
        ids = np.sort(rng.choice(n * 3, size=n, replace=False)).astype(np.int64)
        scores = np.full(n, 1.0, dtype=np.float32)
        tfs = np.ones(n, dtype=np.uint64)
        lists[f"t{t}"] = (ids, tfs, scores, all_warc[ids])
    iters = {
        t: PostingIterator(encode_postings(*v)) for t, v in lists.items()
    }
    assert wand_topk(iters, 15) == _brute_topk(lists, 15)
