"""Near-dup family: distributed MinHash verify, exact banded SimHash."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_distributed_verify_matches_local(ray_session):
    """The groupby(pair) verification stage must produce exactly the pairs
    a driver-side reference verify finds on the same LSH candidates."""
    from myaku_ray.functions.dedup import (
        JACCARD_THRESHOLD, _shingle_hashes, minhash_lsh_pairs,
    )

    got = minhash_lsh_pairs(SF)
    # reference: brute-force exact jaccard over ALL doc pairs — LSH with
    # 16 bands x 4 rows at t=0.5 has ~zero false-negative probability at
    # this scale, so verified-candidates == all qualifying pairs
    import pyarrow.parquet as pq

    df = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    sets = {
        int(r.doc_id): set(_shingle_hashes(r.text).tolist())
        for r in df.itertuples()
    }
    ids = sorted(sets)
    want = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = inter / union if union else 0.0
            if j >= JACCARD_THRESHOLD:
                want.append((a, b, j))
    want_df = pd.DataFrame(want, columns=["doc_id_a", "doc_id_b", "jaccard"])
    got = got.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    want_df = want_df.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)
    assert len(got) > 0


def test_simhash_banded_pairs_exact(ray_session):
    """The 4-band bucketing must find EXACTLY the hamming<=3 pairs an
    all-pairs scan finds (pigeonhole exactness)."""
    from myaku_ray.functions.dedup import (
        SIMHASH_HAMMING_MAX, _popcount64, simhash_docs, simhash_pairs,
    )

    sigs = simhash_docs(SF).to_pandas().sort_values("doc_id")
    S = sigs["simhash"].to_numpy().astype(np.uint64)
    ids = sigs["doc_id"].to_numpy()
    ham = _popcount64(S[:, None] ^ S[None, :])
    iu = np.triu_indices(len(ids), k=1)
    ok = ham[iu] <= SIMHASH_HAMMING_MAX
    want = pd.DataFrame(
        {
            "doc_id_a": ids[iu[0][ok]].astype(np.int64),
            "doc_id_b": ids[iu[1][ok]].astype(np.int64),
            "hamming": ham[iu][ok].astype(np.int64),
        }
    ).sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)

    got = simhash_pairs(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_popcount64():
    from myaku_ray.functions.dedup import _popcount64

    x = np.array([0, 1, 3, 0xFFFF_FFFF_FFFF_FFFF, 1 << 62], dtype=np.uint64)
    assert _popcount64(x).tolist() == [0, 1, 2, 64, 1]
    m = np.array([[5, 9], [0, 7]], dtype=np.uint64)
    assert _popcount64(m).tolist() == [[2, 2], [0, 3]]
