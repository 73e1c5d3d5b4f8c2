"""Property-based codec + top-k tests (hypothesis).

The segment codec and rank path are the trust anchors for everything the
engine returns — fuzz them beyond the golden corpus: random posting
lists round-trip bit-exactly, the streaming iterator agrees with the
vectorized decoder, seek() honors its contract, and WAND/array top-k
equal a brute-force reference ordering.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from myaku_ray.index.codec import (
    ArrayPostings,
    PostingIterator,
    decode_all,
    encode_postings,
)


@st.composite
def posting_lists(draw, max_n=600):
    n = draw(st.integers(min_value=0, max_value=max_n))
    ids = draw(
        st.lists(
            st.integers(min_value=0, max_value=2**48),
            min_size=n, max_size=n, unique=True,
        )
    )
    ids = np.sort(np.asarray(ids, dtype=np.int64))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    tfs = rng.integers(1, 1000, n).astype(np.int32)
    scores = (rng.random(n) * 50).astype(np.float32)
    warc = rng.integers(0, 2**52, n).astype(np.uint64)
    return ids, tfs, scores, warc


@given(posting_lists())
@settings(max_examples=60, deadline=None)
def test_roundtrip_bit_exact(pl):
    ids, tfs, scores, warc = pl
    blob = encode_postings(ids, tfs, scores, warc)
    di, dt, ds, dw = decode_all(blob)
    assert np.array_equal(di, ids)
    assert np.array_equal(dt, tfs)
    assert np.array_equal(ds, scores)
    assert np.array_equal(dw, warc)


@given(posting_lists(max_n=300))
@settings(max_examples=30, deadline=None)
def test_iterator_matches_decoder(pl):
    ids, tfs, scores, warc = pl
    blob = encode_postings(ids, tfs, scores, warc)
    it = PostingIterator(blob)
    got = []
    while not it.exhausted:
        got.append((it.doc_id(), it.tf(), it.score(), it.warc_us()))
        it.next()
    want = list(
        zip(ids.tolist(), tfs.tolist(), scores.tolist(), warc.tolist())
    )
    assert got == want


@given(posting_lists(max_n=300), st.integers(min_value=0, max_value=2**48))
@settings(max_examples=30, deadline=None)
def test_seek_contract(pl, target):
    """seek(t) lands on the first posting with doc_id >= t, or exhausts."""
    ids, tfs, scores, warc = pl
    blob = encode_postings(ids, tfs, scores, warc)
    it = PostingIterator(blob)
    it.seek(target)
    later = ids[ids >= target]
    if len(later) == 0:
        assert it.exhausted
    else:
        assert not it.exhausted
        assert it.doc_id() == int(later[0])


@given(posting_lists(max_n=400), st.integers(min_value=1, max_value=20))
@settings(max_examples=30, deadline=None)
def test_single_term_topk_order(pl, k):
    """Array top-k == brute-force (score, warc, doc) DESC ordering."""
    ids, tfs, scores, warc = pl
    blob = encode_postings(ids, tfs, scores, warc)
    ap = ArrayPostings([blob])
    got = ap.topk_arrays(k)
    order = np.lexsort((ids, warc, scores))[::-1][:k]
    want = [
        (int(ids[i]), float(scores[i]), int(warc[i])) for i in order
    ]
    assert got == want


@given(
    st.lists(posting_lists(max_n=150), min_size=2, max_size=4),
    st.integers(min_value=1, max_value=15),
)
@settings(max_examples=20, deadline=None)
def test_multi_term_topk_matches_bruteforce(pls, k):
    """array_topk over several terms == per-doc float64 sum reference."""
    from myaku_ray.index.wand import array_topk

    iters = {}
    acc: dict[int, float] = {}
    warc_of: dict[int, int] = {}
    for t, (ids, tfs, scores, warc) in enumerate(pls):
        term = f"t{t:02d}"
        blob = encode_postings(ids, tfs, scores, warc)
        iters[term] = ArrayPostings([blob])
    for term in sorted(iters):
        it = iters[term]
        for d, s, w in zip(it.ids, it.scores, it.warc):
            acc[int(d)] = acc.get(int(d), 0.0) + float(np.float64(s))
            warc_of[int(d)] = int(w)
    want = sorted(
        ((sc, warc_of[d], d) for d, sc in acc.items()), reverse=True
    )[:k]
    want = [(d, sc, w) for sc, w, d in want]
    got = array_topk({t: ArrayPostings.from_arrays(
        iters[t].ids, iters[t].scores, iters[t].warc, iters[t].max_score
    ) for t in iters}, k)
    assert [(d, w) for d, _s, w in got] == [(d, w) for d, _s, w in want]
    for (gd, gs, gw), (wd, ws, ww) in zip(got, want):
        assert abs(gs - ws) < 1e-9
