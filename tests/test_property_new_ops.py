"""Property-based tests (hypothesis) for the session's new kernels:
vectorized (doc, term, tf) triples, HLL rank math, CMS lower bound,
and the as-of join vs pandas.merge_asof — all pure-function properties,
no Ray session needed."""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

words = st.text(alphabet="abcde", min_size=1, max_size=4)
texts = st.lists(words, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_doc_term_tfs_equals_counter(docs):
    from myaku_ray.functions.textops import _doc_term_tfs

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    doc_idx, codes, tfs, dictionary = _doc_term_tfs(batch)
    got: dict = {}
    for d, c, tf in zip(doc_idx, codes, tfs):
        got[(int(d), dictionary[int(c)].as_py())] = int(tf)
    want = {
        (i, t): n
        for i, doc in enumerate(docs)
        for t, n in Counter(doc.split(" ")).items()
    }
    assert got == want


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 52) - 1))
def test_hll_rank_fixup_equals_bit_length(rest):
    """The vectorized floor(log2)+shift-fixup bit-length must equal
    int.bit_length for every 52-bit value (incl. 2^k boundaries)."""
    rest_arr = np.array([rest], dtype=np.uint64)
    bl = np.zeros(1, dtype=np.int64)
    nz = rest_arr != 0
    bl[nz] = np.floor(np.log2(rest_arr[nz].astype(np.float64))).astype(np.int64) + 1
    too_hi = nz & ((rest_arr >> np.clip(bl - 1, 0, None).astype(np.uint64)) == 0)
    bl[too_hi] -= 1
    too_lo = nz & ((rest_arr >> bl.astype(np.uint64)) != 0)
    bl[too_lo] += 1
    assert int(bl[0]) == rest.bit_length()


@settings(max_examples=50, deadline=None)
@given(st.lists(texts, min_size=1, max_size=10))
def test_cms_never_underestimates(docs):
    from myaku_ray.functions.textops import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_point_query,
    )

    counts = Counter(t for d in docs for t in d.split(" "))
    # serial CMS with the exact cell-hash rule
    cells: Counter = Counter()
    for t, n in counts.items():
        for j in range(CMS_DEPTH):
            col = (
                int(hashlib.md5(f"{j}:{t}".encode()).hexdigest()[:8], 16)
                % CMS_WIDTH
            )
            cells[(j, col)] += n
    df = pd.DataFrame(
        {
            "row_id": [k[0] for k in cells],
            "col_id": [k[1] for k in cells],
            "n": [cells[k] for k in cells],
        }
    )
    for t, n in counts.items():
        assert cms_point_query(df, t) >= n


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user
        st.integers(min_value=0, max_value=10**6),      # ts_us
        st.sampled_from(["click", "purchase", "view"]),
        st.floats(min_value=0, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=100, deadline=None)
@given(events_strategy)
def test_asof_merge_matches_pandas_merge_asof(rows):
    """The per-user sorted-merge core must agree with pandas.merge_asof
    on which purchase each click matches (after the same max-event_id
    same-ts dedup)."""
    ev = pd.DataFrame(
        rows, columns=["user_id", "ts_us", "event_type", "value"]
    )
    ev["event_id"] = np.arange(len(ev), dtype=np.int64)
    clicks = ev[ev.event_type == "click"]
    right = (
        ev[ev.event_type == "purchase"]
        .sort_values(["user_id", "ts_us", "event_id"])
        .groupby(["user_id", "ts_us"], as_index=False)
        .last()
    )
    if clicks.empty or right.empty:
        return
    want = pd.merge_asof(
        clicks.sort_values("ts_us"),
        right.sort_values("ts_us")[["user_id", "ts_us", "event_id"]].rename(
            columns={"event_id": "purchase_event_id"}
        ),
        on="ts_us",
        by="user_id",
        direction="backward",
    ).dropna(subset=["purchase_event_id"])

    # reference implementation of the searchsorted core (per user)
    got = {}
    for uid, grp in clicks.groupby("user_id"):
        r = right[right.user_id == uid]
        if r.empty:
            continue
        rts = r["ts_us"].to_numpy()
        idx = np.searchsorted(rts, grp["ts_us"].to_numpy(), side="right") - 1
        for eid, i in zip(grp["event_id"], idx):
            if i >= 0:
                got[int(eid)] = int(r["event_id"].to_numpy()[i])
    want_map = dict(
        zip(want["event_id"].astype(int), want["purchase_event_id"].astype(int))
    )
    assert got == want_map


def test_md5_u64_duckdb_kernel_matches_hashlib():
    """hashkit's DuckDB vectorized path and the hashlib fallback are
    bit-equal for both hex widths (the HLL / sampler oracle contract)."""
    import numpy as np

    from myaku_ray.functions.hashkit import _hashlib_md5_u64, md5_u64

    ids = np.concatenate(
        [
            np.arange(0, 50, dtype=np.int64),
            np.array([2**31, 2**40 + 7, 999_999_937], dtype=np.int64),
        ]
    )
    for hexchars in (8, 16):
        a = md5_u64(ids, hexchars=hexchars)
        b = _hashlib_md5_u64(ids, hexchars=hexchars)
        assert a.dtype == np.uint64 and (a == b).all()
    assert md5_u64(np.empty(0, dtype=np.int64)).shape == (0,)
