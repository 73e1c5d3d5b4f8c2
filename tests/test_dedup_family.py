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


def test_near_dup_lsh_precision_exact_recall_high(ray_session, tmp_path_factory):
    """LSH-bucketed near-dup: every emitted pair satisfies the exact
    rounded-cosine rule (precision 1.0); recall vs a global brute-force
    scan is high on clustered data (banding catches high-cosine pairs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from myaku_ray.functions.ann import near_dup_embeddings_lsh

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = [centers[i % 8] + 0.05 * rng.standard_normal(32) for i in range(200)]
    X = np.stack(rows)
    d = tmp_path_factory.mktemp("lsh_emb")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(200), pa.int64()),
                "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32())),
                "label": pa.array((np.arange(200) % 8).astype(np.int32)),
            }
        ),
        str(d / "embeddings.parquet"),
    )

    thr = 0.9
    got = near_dup_embeddings_lsh(str(d), threshold=thr)
    got_pairs = set(zip(got["vec_id_a"], got["vec_id_b"]))

    Xq = np.stack([np.asarray(r, dtype=np.float64) for r in
                   pq.read_table(str(d / "embeddings.parquet"))["embedding"].to_pylist()])
    norm = np.sqrt((Xq * Xq).sum(axis=1))
    sims = np.round((Xq @ Xq.T) / (norm[:, None] * norm[None, :]), 6)
    iu = np.triu_indices(200, k=1)
    want_pairs = {
        (int(a), int(b))
        for a, b, s in zip(iu[0], iu[1], sims[iu])
        if s >= thr
    }
    assert want_pairs, "fixture produced no near-dup pairs"
    # precision exact
    for a, b in got_pairs:
        assert sims[a, b] >= thr, (a, b, sims[a, b])
    # recall high
    recall = len(got_pairs & want_pairs) / len(want_pairs)
    assert recall >= 0.8, recall


def test_near_dup_tiled_equals_single_tile(ray_session, tmp_path_factory):
    """The tiled exact all-pairs path (max_block small enough that hot
    labels split into multiple chunk-pair tasks) emits exactly the same
    pairs as the single-tile path."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from myaku_ray.functions.ann import near_dup_embeddings

    d = tmp_path_factory.mktemp("nd_tiled")
    rng = np.random.default_rng(7)
    n, dim = 600, 16
    base = rng.standard_normal((6, dim))
    X = base[rng.integers(0, 6, n)] + 0.35 * rng.standard_normal((n, dim))
    labels = np.zeros(n, dtype=np.int64)
    labels[:100] = rng.integers(1, 3, 100)  # label 0 is hot (~500 rows)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in X],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels),
            }
        ),
        str(d / "embeddings.parquet"),
    )

    def norm(res):
        pdf = res.to_pandas()
        return (
            pdf.sort_values(["vec_id_a", "vec_id_b"])
            .reset_index(drop=True)[["vec_id_a", "vec_id_b", "sim_r", "label"]]
        )

    single = norm(near_dup_embeddings(str(d), threshold=0.8, max_block=10_000))
    tiled = norm(near_dup_embeddings(str(d), threshold=0.8, max_block=64))
    assert len(single) > 20
    import pandas as pd

    pd.testing.assert_frame_equal(tiled, single)


def test_driver_components_match_bruteforce():
    """_driver_components equals a brute-force DFS labeling on random
    graphs (including singleton-free node sets and chain/star shapes)."""
    import numpy as np

    from myaku_ray.functions.dedup import _driver_components

    rng = np.random.default_rng(3)
    for trial in range(20):
        n = int(rng.integers(2, 60))
        m = int(rng.integers(1, 90))
        a = rng.integers(0, n, m) * 7 + 3  # sparse non-contiguous ids
        b = rng.integers(0, n, m) * 7 + 3
        keep = a != b
        a, b = a[keep], b[keep]
        if not len(a):
            continue
        nodes, comp = _driver_components(a, b)
        # brute force: min doc id per component via adjacency DFS
        adj = {}
        for x, y in zip(a.tolist(), b.tolist()):
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        want = {}
        seen = set()
        for start in sorted(adj):
            if start in seen:
                continue
            stack, members = [start], []
            while stack:
                u = stack.pop()
                if u in seen:
                    continue
                seen.add(u)
                members.append(u)
                stack.extend(adj[u] - seen)
            root = min(members)
            for u in members:
                want[u] = root
        got = dict(zip(nodes.tolist(), comp.tolist()))
        assert got == want, trial


def test_dup_clusters_driver_and_distributed_paths_agree(ray_session):
    """The driver-side component solve and the alternating-star
    distributed loop produce identical (doc_id, cluster_id) rows."""
    import pandas as pd

    from myaku_ray.functions.dedup import dup_clusters

    sf = "/root/testdata/sf0.01"

    def norm(r):
        if not isinstance(r, pd.DataFrame):
            r = r.to_pandas()
        return (
            r.astype({"doc_id": "int64", "cluster_id": "int64"})
            .sort_values(["doc_id"])
            .reset_index(drop=True)
        )

    fast = norm(dup_clusters(sf))
    slow = norm(dup_clusters(sf, driver_limit=0))
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0
