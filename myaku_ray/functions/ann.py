"""Similarity search over the ``embeddings`` table (list<float> column).

- ``ann_cosine_topk``: brute-force cosine top-k — broadcast query matrix,
  vectorized numpy matmul per batch, partial top-k per batch, tiny final
  reduce.  The 100 TB path swaps the full scan for the label-blocked
  variant below (IVF-style coarse partitioning).
- ``near_dup_embeddings``: embedding-cosine near-duplicate pairs, blocked
  by ``label`` (LSH/IVF-bucket analog): groupby(label) -> in-group matrix
  product -> threshold.

Exactness contract with the DuckDB oracle: similarities are computed in
float64 and rounded to 6 decimals; ranking/thresholding uses the ROUNDED
value with vec_id tie-breaks, so 1-ulp dot-product-order differences
between numpy and DuckDB cannot flip any comparison.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

N_QUERIES = 10
TOPK = 5
NEAR_DUP_THRESHOLD = 0.4


def _matrix(batch_col) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column — zero-copy-ish:
    one ``list_flatten`` + reshape when the lists are equal-length (the
    embedding-column invariant), falling back to the per-row path only
    for ragged input."""
    import pyarrow.compute as pc

    arr = (
        batch_col.combine_chunks()
        if isinstance(batch_col, pa.ChunkedArray)
        else batch_col
    )
    n = len(arr)
    if n:
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        if arr.null_count == 0 and lens.min() == lens.max():
            flat = pc.list_flatten(arr)
            # inner-element nulls would silently become NaN on the
            # vectorized path; route them to the per-row path, which
            # fails loudly instead of corrupting cosine/k-means math
            if flat.null_count == 0:
                return (
                    flat.to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                    .reshape(n, -1)
                )
    return np.stack(
        [np.asarray(v, dtype=np.float64) for v in arr.to_pylist()]
    )


def _load_query_matrix(sf_dir: str):
    """(qids, Q, qnorm) broadcast payload for the brute-force scans."""
    import pyarrow.dataset as pads

    qtbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < N_QUERIES
    )
    qids = qtbl["vec_id"].to_numpy(zero_copy_only=False)
    Q = _matrix(qtbl["embedding"])
    return qids, Q, np.sqrt((Q * Q).sum(axis=1))


def _brute_topk(ds, q_ref, k: int):
    """Shared brute-force cosine top-k: per-batch partial top-k against
    the broadcast query matrix, then one result-sized global finalize.
    Both the unfiltered and the predicate-filtered scans ride this exact
    kernel so tie-breaking/rounding can never diverge between them."""

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_l, Q_l, qnorm_l = ray.get(q_ref)
        rows = {"query_vec_id": [], "neighbor_vec_id": [], "sim_r": []}
        if batch.num_rows:
            X = _matrix(batch["embedding"])
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            xnorm = np.sqrt((X * X).sum(axis=1))
            sims_r = np.round(
                (Q_l @ X.T) / (qnorm_l[:, None] * xnorm[None, :]), 6
            )
            for qi, qid in enumerate(qids_l):
                mask = ids != qid
                cand_ids = ids[mask]
                cand = sims_r[qi][mask]
                # partial top-k within the batch on (sim_r desc, vec_id asc)
                order = np.lexsort((cand_ids, -cand))[:k]
                rows["query_vec_id"] += [int(qid)] * len(order)
                rows["neighbor_vec_id"] += cand_ids[order].astype(int).tolist()
                rows["sim_r"] += cand[order].tolist()
        return pa.table(
            {
                "query_vec_id": pa.array(rows["query_vec_id"], pa.int64()),
                "neighbor_vec_id": pa.array(rows["neighbor_vec_id"], pa.int64()),
                "sim_r": pa.array(rows["sim_r"], pa.float64()),
            }
        )

    allc = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    allc = allc.sort_values(
        ["query_vec_id", "sim_r", "neighbor_vec_id"],
        ascending=[True, False, True],
    )
    out = allc.groupby("query_vec_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_vec_id").cumcount() + 1
    return out


def ann_cosine_topk(sf_dir: str, k: int = TOPK):
    """Top-k cosine neighbors for query vectors (vec_id < N_QUERIES)."""
    q_ref = ray.put(_load_query_matrix(sf_dir))
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return _brute_topk(ds, q_ref, k)


ANN_COSINE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
     b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
     s AS (
       SELECT q.qid AS query_vec_id, b.vec_id AS neighbor_vec_id,
              round(list_dot_product(q.qv, b.v)
                    / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim_r
       FROM q, b WHERE b.vec_id != q.qid)
SELECT query_vec_id, neighbor_vec_id, sim_r,
       CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY sim_r DESC, neighbor_vec_id) AS BIGINT) AS rank
FROM s
QUALIFY rank <= {TOPK}
"""


NEAR_DUP_MAX_BLOCK = 4096


def near_dup_embeddings(
    sf_dir: str,
    threshold: float = NEAR_DUP_THRESHOLD,
    max_block: int = NEAR_DUP_MAX_BLOCK,
):
    """Embedding near-dup pairs within label blocks (cos >= threshold) —
    EXACT all-pairs semantics with BOUNDED per-task work.

    A hot label used to land in one ``map_groups`` task doing O(block^2)
    in one heap.  Now each label of n rows is tiled into
    ``nc = ceil(n / max_block)`` chunks (``chunk = vec_id % nc``) and the
    shuffle key becomes ``(label, tile_i, tile_j)``: a pair with chunks
    (ca, cb) lands in exactly the (min, max) tile, so output is identical
    (no dedup needed) while no task ever holds more than ~2*max_block
    rows or computes more than max_block^2 dot products.  The quadratic
    TOTAL cost is inherent to exact all-pairs (each row must meet every
    chunk — rows replicate nc times); for corpora where that is too much,
    ``near_dup_embeddings_lsh`` is the documented sub-quadratic path.
    Labels are assumed low-cardinality (a class/bucket id), so the
    per-label count table broadcasts via ``ray.put``.
    """
    from ray.data.aggregate import Count

    src = f"{sf_dir}/embeddings.parquet"
    counts = (
        rd.read_parquet(src, columns=["label"])
        .groupby("label")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    max_label = int(counts["label"].max()) if len(counts) else 0
    nc_by_label = np.ones(max_label + 1, dtype=np.int64)
    for lab, n in zip(counts["label"], counts["n"]):
        nc_by_label[int(lab)] = max(-(-int(n) // max_block), 1)
    nc_ref = ray.put(nc_by_label)

    ds = rd.read_parquet(src, columns=["vec_id", "embedding", "label"])

    def tile_rows(batch: pa.Table) -> pa.Table:
        """Emit each row once per tile it participates in (nc copies)."""
        lut = ray.get(nc_ref)
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = lut[labels]
        chunk = ids % nc
        idx = np.repeat(np.arange(len(ids)), nc)
        j = np.arange(int(nc.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(nc) - nc, nc
        )
        ce = chunk[idx]
        t = batch.take(pa.array(idx))
        return pa.table(
            {
                "label": t["label"],
                "tile_i": pa.array(np.minimum(ce, j)),
                "tile_j": pa.array(np.maximum(ce, j)),
                "chunk": pa.array(ce),
                "vec_id": t["vec_id"],
                "embedding": t["embedding"],
            }
        )

    _EMPTY = {
        "vec_id_a": pd.Series(dtype=np.int64),
        "vec_id_b": pd.Series(dtype=np.int64),
        "sim_r": pd.Series(dtype=np.float64),
        "label": pd.Series(dtype=np.int64),
    }

    def pairs_of_tile(g: pd.DataFrame) -> pd.DataFrame:
        ti = int(g["tile_i"].iloc[0])
        tj = int(g["tile_j"].iloc[0])
        lab = int(g["label"].iloc[0])
        if ti == tj:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
            ids = g["vec_id"].to_numpy()
            norm = np.sqrt((X * X).sum(axis=1))
            sims = np.round((X @ X.T) / (norm[:, None] * norm[None, :]), 6)
            iu = np.triu_indices(len(ids), k=1)
            mask = sims[iu] >= threshold
            a, b = ids[iu[0][mask]], ids[iu[1][mask]]
            sv = sims[iu][mask]
        else:
            ga = g[g["chunk"] == ti]
            gb = g[g["chunk"] == tj]
            if ga.empty or gb.empty:
                return pd.DataFrame(_EMPTY)
            A = np.stack([np.asarray(v, dtype=np.float64) for v in ga["embedding"]])
            B = np.stack([np.asarray(v, dtype=np.float64) for v in gb["embedding"]])
            ia, ib = ga["vec_id"].to_numpy(), gb["vec_id"].to_numpy()
            na = np.sqrt((A * A).sum(axis=1))
            nb = np.sqrt((B * B).sum(axis=1))
            sims = np.round((A @ B.T) / (na[:, None] * nb[None, :]), 6)
            ri, ci = np.nonzero(sims >= threshold)
            a, b, sv = ia[ri], ib[ci], sims[ri, ci]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {
                "vec_id_a": lo.astype(np.int64),
                "vec_id_b": hi.astype(np.int64),
                "sim_r": sv,
                "label": np.full(len(lo), lab, dtype=np.int64),
            }
        )

    return (
        ds.map_batches(tile_rows, batch_format="pyarrow")
        .groupby(["label", "tile_i", "tile_j"])
        .map_groups(pairs_of_tile, batch_format="pandas")
        .select_columns(["vec_id_a", "vec_id_b", "sim_r", "label"])
    )


NEAR_DUP_EMBEDDINGS_SQL = f"""
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS sim_r,
       CAST(a.label AS BIGINT) AS label
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
            / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
               * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= {NEAR_DUP_THRESHOLD}::DOUBLE
"""


NEAR_DUP_LSH_PLANES = 36
NEAR_DUP_LSH_BANDS = 6   # 6 bands x 6 bits
NEAR_DUP_LSH_THRESHOLD = 0.85
# Recall model: P(plane agrees) = 1 - theta/pi; a pair at cos 0.9 agrees
# on a 6-bit band with p ~ 0.40, so >=1 of 6 bands matches with ~0.95.
# Low-threshold pairs (cos ~ 0.4) are NOT recalled reliably — this is the
# scale path for true near-duplicates, hence the higher default threshold
# than the exact label-blocked variant.


def near_dup_embeddings_lsh(
    sf_dir: str, threshold: float = NEAR_DUP_LSH_THRESHOLD
):
    """Embedding near-dup pairs via random-hyperplane LSH — the scale
    path beside the label-blocked exact variant: candidate pairs only
    ever form INSIDE an (band, 8-bit sign-key) bucket, so no O(block^2)
    over a hot label; in-bucket verification is the exact rounded-cosine
    rule, so precision is exact and only recall is approximate (pairs
    differing in >=1 bit of every band are missed — banding makes that
    exponentially unlikely for high-cosine pairs).

    Deterministic hyperplanes (seeded RNG, broadcast once); embeddings
    ride through the groupby (64 floats/row — the payload IS the join
    key's data, same as MinHash shingles)."""
    rng = np.random.default_rng(0xA5A5)
    # planes drawn once on the driver; dim read from the table schema
    import pyarrow.dataset as pads

    head = pads.dataset(f"{sf_dir}/embeddings.parquet").head(1)
    dim = len(head["embedding"][0].as_py())
    planes = rng.standard_normal((dim, NEAR_DUP_LSH_PLANES))
    planes_ref = ray.put(planes)

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    bits_per_band = NEAR_DUP_LSH_PLANES // NEAR_DUP_LSH_BANDS

    def band_rows(batch: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        X = _matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        signs = (X @ P) > 0  # (n, PLANES)
        weights = (1 << np.arange(bits_per_band)).astype(np.int64)
        out_band, out_key, out_id, out_emb = [], [], [], []
        emb_col = batch["embedding"]
        for b in range(NEAR_DUP_LSH_BANDS):
            chunk = signs[:, b * bits_per_band : (b + 1) * bits_per_band]
            keys = chunk.astype(np.int64) @ weights
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_key.append(keys)
            out_id.append(ids)
            out_emb.append(emb_col)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "key": pa.array(np.concatenate(out_key), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                "embedding": pa.concat_arrays(
                    [c.combine_chunks() for c in out_emb]
                ),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"vec_id_a": pd.Series(dtype=np.int64),
                 "vec_id_b": pd.Series(dtype=np.int64),
                 "sim_r": pd.Series(dtype=np.float64)}
            )
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in g["embedding"].iloc[order]]
        )
        norm = np.sqrt((X * X).sum(axis=1))
        sims = np.round((X @ X.T) / (norm[:, None] * norm[None, :]), 6)
        iu = np.triu_indices(len(ids), k=1)
        ok = sims[iu] >= threshold
        return pd.DataFrame(
            {
                "vec_id_a": ids[iu[0][ok]].astype(np.int64),
                "vec_id_b": ids[iu[1][ok]].astype(np.int64),
                "sim_r": sims[iu][ok],
            }
        )

    out = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
    ).to_pandas()
    if len(out) == 0:  # all-empty groups can drop the column schema
        return pd.DataFrame(
            {"vec_id_a": pd.Series(dtype=np.int64),
             "vec_id_b": pd.Series(dtype=np.int64),
             "sim_r": pd.Series(dtype=np.float64)}
        )
    out = out.drop_duplicates(["vec_id_a", "vec_id_b"])
    return out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbor — the scale path
# ---------------------------------------------------------------------------

IVF_N_CLUSTERS = 16
IVF_NPROBE = 4
IVF_TRAIN_SAMPLE = 2048
IVF_KMEANS_ITERS = 5
IVF_LAYOUT_ROOT = "/tmp/myaku_ray_ivf"


def _unit(X: np.ndarray) -> np.ndarray:
    n = np.sqrt((X * X).sum(axis=1, keepdims=True))
    n[n == 0] = 1.0
    return X / n


def _train_centroids(X: np.ndarray, n_clusters: int, iters: int) -> np.ndarray:
    """Deterministic spherical k-means from evenly-strided seeds (no RNG —
    resumable builds need repeatable assignments).  Vectors and centroids
    live on the unit sphere so cell assignment matches the cosine metric
    the queries use."""
    Xu = _unit(X)
    seeds = Xu[:: max(len(Xu) // n_clusters, 1)][:n_clusters]
    C = seeds.copy()
    for _ in range(iters):
        assign = (Xu @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = _unit(Xu[m].mean(axis=0)[None, :])[0]
    return C


def _strided_training_sample(
    src: str, target: int, limit_rows: int | None = None
) -> np.ndarray:
    """Evenly-strided training rows read via ROW-GROUP pruning: only row
    groups containing a sampled global index are decoded, so the training
    read touches ~target rows of I/O regardless of corpus size (vs the
    former ``head(target)`` which was a non-random prefix AND forced a
    sequential front read).  ``limit_rows`` restricts the sampled range
    to the first N global rows (the base-snapshot window for the
    incremental-IVF path — vec_id is the ordered row index)."""
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)) \
        if os.path.isdir(src) else [src]
    total = sum(pq.read_metadata(f).num_rows for f in files)
    if limit_rows is not None:
        total = min(total, int(limit_rows))
    stride = max(total // max(target, 1), 1)
    want = set(range(0, total, stride))
    parts: list[np.ndarray] = []
    offset = 0
    for f in files:
        pf = pq.ParquetFile(f)
        for rg in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(rg).num_rows
            local = [i - offset for i in range(offset, offset + n) if i in want]
            if local:
                t = pf.read_row_group(rg, columns=["embedding"])
                parts.append(_matrix(t["embedding"].take(local)))
            offset += n
    return np.concatenate(parts, axis=0)


def build_ivf_layout(
    sf_dir: str,
    layout_dir: str | None = None,
    n_clusters: int = IVF_N_CLUSTERS,
    vec_id_max: int | None = None,
) -> str:
    """Materialize the cell-partitioned embeddings layout ONCE: train
    centroids on a strided sample, assign every vector map-side, write
    hive-partitioned parquet (``cell=<c>/``).  Idempotent via a _SUCCESS
    marker keyed on the source row count, so repeated queries reuse it —
    this is the index build an IVF deployment amortizes over all queries.

    The ``cell`` partition value is also kept as a ``cell_id`` data
    column, because hive partition columns are stripped from the files
    and explicit per-cell dir reads skip partition inference."""
    import glob as _glob

    import pyarrow.parquet as pq

    src = f"{sf_dir}/embeddings.parquet"
    files = sorted(_glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)) \
        if os.path.isdir(src) else [src]
    total = sum(pq.read_metadata(f).num_rows for f in files)
    key = f"{os.path.abspath(sf_dir).strip('/').replace('/', '_')}-{total}-{n_clusters}"
    if vec_id_max is not None:
        key += f"-vmax{int(vec_id_max)}"
    layout_dir = layout_dir or os.path.join(IVF_LAYOUT_ROOT, key)
    marker = os.path.join(layout_dir, "_SUCCESS")
    if os.path.exists(marker):
        return layout_dir

    import shutil

    shutil.rmtree(layout_dir, ignore_errors=True)
    X_train = _strided_training_sample(
        src, IVF_TRAIN_SAMPLE, limit_rows=vec_id_max
    )
    C = _train_centroids(X_train, n_clusters, IVF_KMEANS_ITERS)
    c_ref = ray.put(C)
    _vmax = vec_id_max

    def assign_cell(batch: pa.Table) -> pa.Table:
        C_l = ray.get(c_ref)
        if _vmax is not None:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(ids < _vmax))
        if batch.num_rows == 0:
            cell = np.empty(0, np.int32)
        else:
            X = _matrix(batch["embedding"])
            cell = (_unit(X) @ C_l.T).argmax(axis=1).astype(np.int32)
        batch = batch.append_column("cell_id", pa.array(cell, pa.int32()))
        return batch.append_column("cell", pa.array(cell, pa.int32()))

    rd.read_parquet(src).map_batches(
        assign_cell, batch_format="pyarrow"
    ).write_parquet(layout_dir, partition_cols=["cell"])
    np.save(os.path.join(layout_dir, "centroids.npy"), C)
    with open(marker, "w") as f:
        f.write("ok")
    return layout_dir


def ivf_probed_paths(
    layout_dir: str, probe_cells: set[int]
) -> tuple[list[str], int]:
    """(cell dirs to read, total cell dirs) — the pruning evidence."""
    import glob as _glob

    all_dirs = sorted(_glob.glob(os.path.join(layout_dir, "cell=*")))
    probed = [
        d for d in all_dirs
        if int(os.path.basename(d).split("=")[1]) in probe_cells
    ]
    return probed, len(all_dirs)


def ivf_cosine_topk(
    sf_dir: str,
    k: int = TOPK,
    n_clusters: int = IVF_N_CLUSTERS,
    nprobe: int = IVF_NPROBE,
):
    """IVF-partitioned approximate cosine top-k (same output schema as
    ``ann_cosine_topk``; approximate — verified by a recall test, not a
    SQL oracle).

    Scale path vs the brute-force scan: the cell-partitioned layout from
    ``build_ivf_layout`` is built once and amortized; each query set reads
    ONLY the union of its ``nprobe`` nearest cells' partition dirs —
    untouched cells never leave storage, so at 10^12 vectors the probed
    fraction (~nprobe/n_clusters) bounds I/O as well as compute."""
    import pyarrow.dataset as pads

    layout_dir = build_ivf_layout(sf_dir, n_clusters=n_clusters)
    C = np.load(os.path.join(layout_dir, "centroids.npy"))
    cnorm = np.sqrt((C * C).sum(axis=1))

    qtbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < N_QUERIES
    )
    qids = qtbl["vec_id"].to_numpy(zero_copy_only=False)
    Q = _matrix(qtbl["embedding"])
    qnorm = np.sqrt((Q * Q).sum(axis=1))
    # nprobe nearest cells per query, by cosine to centroids
    qsims = (Q @ C.T) / (qnorm[:, None] * cnorm[None, :])
    probe = np.argsort(-qsims, axis=1)[:, :nprobe]
    probe_sets = [frozenset(int(c) for c in row) for row in probe]
    bcast = ray.put((qids, Q, qnorm, probe_sets))

    union_cells = set().union(*probe_sets)
    probed_dirs, _n_cells = ivf_probed_paths(layout_dir, union_cells)
    import glob as _glob

    probed_files = sorted(
        f for d in probed_dirs
        for f in _glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
    )
    ds = rd.read_parquet(probed_files, columns=["vec_id", "embedding", "cell_id"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_l, Q_l, qnorm_l, probes = ray.get(bcast)
        X = _matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        cell = batch["cell_id"].to_numpy(zero_copy_only=False)
        xnorm = np.sqrt((X * X).sum(axis=1))
        sims = (Q_l @ X.T) / (qnorm_l[:, None] * xnorm[None, :])
        sims_r = np.round(sims, 6)
        rows = {"query_vec_id": [], "neighbor_vec_id": [], "sim_r": []}
        for qi, qid in enumerate(qids_l):
            mask = (ids != qid) & np.isin(cell, list(probes[qi]))
            if not mask.any():
                continue
            cand_ids = ids[mask]
            cand = sims_r[qi][mask]
            take = min(k, len(cand))
            sel = np.lexsort((cand_ids, -cand))[:take]
            rows["query_vec_id"].extend([int(qid)] * take)
            rows["neighbor_vec_id"].extend(int(x) for x in cand_ids[sel])
            rows["sim_r"].extend(float(x) for x in cand[sel])
        return pa.table(
            {
                "query_vec_id": pa.array(rows["query_vec_id"], pa.int64()),
                "neighbor_vec_id": pa.array(rows["neighbor_vec_id"], pa.int64()),
                "sim_r": pa.array(rows["sim_r"], pa.float64()),
            }
        )

    cands = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    cands = cands.sort_values(
        ["query_vec_id", "sim_r", "neighbor_vec_id"],
        ascending=[True, False, True],
    )
    out = cands.groupby("query_vec_id").head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_vec_id").cumcount()
    return out[["query_vec_id", "rank", "neighbor_vec_id", "sim_r"]]


# ---------------------------------------------------------------------------
# Incremental IVF maintenance — the vector-side analog of the text
# index's batch-incremental update (pipelines/update.py): new vectors
# join an EXISTING cell layout by map-side assignment against the FROZEN
# centroids.  No re-train, no re-shuffle, and the base cells' files are
# never rewritten — the delta lands as new uniquely-named parquet files
# inside the same hive ``cell=`` dirs, exactly how the text index's
# delta postings ride the existing ``bucket=`` layout.
# ---------------------------------------------------------------------------

# base snapshot = the first 80% of vec_ids (vec_id is the ordered row
# index of the embeddings table); the remaining 20% play the
# continuously-arriving delta
IVF_DELTA_FRAC = 0.8


def _ivf_delta_cut(src: str) -> int:
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(
        _glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
    ) if os.path.isdir(src) else [src]
    total = sum(pq.read_metadata(f).num_rows for f in files)
    return int(total * IVF_DELTA_FRAC)


def ivf_add_delta(sf_dir: str, n_clusters: int = IVF_N_CLUSTERS):
    """Add the delta vectors (vec_id >= cut) to the base IVF layout
    (built over vec_id < cut only — its centroids were trained on a
    base-window strided sample and are FROZEN).  The add is ONE
    filtered map pass: assign each delta vector to its nearest existing
    centroid, hive-write into the same ``cell=`` layout (idempotent via
    a per-cut marker).  At 10^12 vectors this is the only viable
    maintenance shape — re-clustering the corpus per delta batch is off
    the table, and the probed-cells read path (``ivf_cosine_topk``)
    serves base + delta files without modification.

    Output (exact integers, stored golden by the serial replica sharing
    the same deterministic centroid kernels): one row per cell with
    ``(cell_id, n_base, n_delta, delta_id_sum)`` — the delta-id sum
    pins the exact assignment, not just the counts."""
    src = f"{sf_dir}/embeddings.parquet"
    cut = _ivf_delta_cut(src)
    layout_dir = build_ivf_layout(
        sf_dir, n_clusters=n_clusters, vec_id_max=cut
    )
    C = np.load(os.path.join(layout_dir, "centroids.npy"))
    marker = os.path.join(layout_dir, f"_DELTA_{cut}")
    if not os.path.exists(marker):
        c_ref = ray.put(C)

        def assign_delta(batch: pa.Table) -> pa.Table:
            C_l = ray.get(c_ref)
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(ids >= cut))
            if batch.num_rows == 0:
                cell = np.empty(0, np.int32)
            else:
                X = _matrix(batch["embedding"])
                cell = (_unit(X) @ C_l.T).argmax(axis=1).astype(np.int32)
            batch = batch.append_column(
                "cell_id", pa.array(cell, pa.int32())
            )
            return batch.append_column("cell", pa.array(cell, pa.int32()))

        rd.read_parquet(src).map_batches(
            assign_delta, batch_format="pyarrow"
        ).write_parquet(layout_dir, partition_cols=["cell"])
        with open(marker, "w") as f:
            f.write("ok")

    # per-cell counts + delta-id checksum: a pruned (vec_id, cell_id)
    # scan with per-batch partials; the driver merges <= cells x blocks
    # tiny rows
    import glob as _glob

    files = sorted(
        _glob.glob(os.path.join(layout_dir, "**", "*.parquet"), recursive=True)
    )

    def cell_partial(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        cell = batch["cell_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_delta = ids >= cut
        df = pd.DataFrame(
            {
                "cell_id": cell,
                "n_base": (~is_delta).astype(np.int64),
                "n_delta": is_delta.astype(np.int64),
                "delta_id_sum": np.where(is_delta, ids, 0),
            }
        )
        g = df.groupby("cell_id", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (
        rd.read_parquet(files, columns=["vec_id", "cell_id"])
        .map_batches(cell_partial, batch_format="pyarrow")
        .to_pandas()
    )
    out = (
        parts.groupby("cell_id", as_index=False)[
            ["n_base", "n_delta", "delta_id_sum"]
        ]
        .sum()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# Distributed k-means (full-corpus Lloyd's) — embedding clustering as a
# first-class training-data op (corpus bucketing / diversity sampling /
# IVF-index training at the 100 TB scale where a driver-side sample is
# not enough).  Unlike ``_train_centroids`` (sample-trained, driver-side),
# every iteration here is ONE streaming Dataset pass: the k x d centroid
# matrix broadcasts once per iteration via ``ray.put``, each batch emits
# k partial (count, sum) rows (np.bincount / add.at — vectorized), and
# the driver reduces k*num_blocks tiny rows.  No full materialization;
# the payload crosses the cluster zero times.
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 8
# Fixed-point (Q20) accumulation scale: per-value quantization error is
# 2^-21, and int64 partial sums stay exact and ORDER-INDEPENDENT — the
# reduction result cannot depend on Ray's block boundaries or arrival
# order, so a run at any num_cpus is bit-identical (and equal to the
# serial golden oracle).  Overflow bound: |x| ~ O(1) embeddings keep the
# per-cluster sum under 2^20 * n; n up to ~10^12 rows fits int64.
KMEANS_FP_SCALE = float(1 << 20)


def kmeans_fit(
    sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> tuple[np.ndarray, list[float]]:
    """Lloyd's k-means over ``embeddings``; returns (centroids float64
    [k, d], per-iteration inertia history).  Deterministic independent of
    blocking: seeds are evenly-strided rows (row-group-pruned read), and
    partial (count, vec-sum, inertia) accumulators are Q20 fixed-point
    int64, so the cross-block reduce is exact integer math."""
    src = f"{sf_dir}/embeddings.parquet"
    seeds = _strided_training_sample(src, k)[:k].astype(np.float64)
    if len(seeds) < k:
        raise ValueError(f"corpus smaller than k={k}")
    # Lloyd's is multi-pass: materialize the single projected column ONCE
    # so iterations re-read Arrow blocks from the object store (spilling
    # if oversized) instead of re-decoding the parquet k times — the
    # standard Ray Data idiom for iterative algorithms.
    ds = rd.read_parquet(src, columns=["embedding"]).materialize()
    C = seeds
    history: list[float] = []
    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(batch: pa.Table, _ref=c_ref, _k=k) -> pa.Table:
            Cl = ray.get(_ref)
            X = _matrix(batch["embedding"])
            # argmin_c |x-c|^2 == argmax_c (x.c - |c|^2/2)
            scores = X @ Cl.T - 0.5 * (Cl * Cl).sum(axis=1)[None, :]
            assign = scores.argmax(axis=1)
            d2 = (X * X).sum(axis=1) - 2.0 * scores[np.arange(len(X)), assign]
            # Q20 quantize BEFORE accumulating: int64 sums are exact, so
            # partials reduce associatively (no canonical-order sort, no
            # float drift across block boundaries).
            Xq = np.round(X * KMEANS_FP_SCALE).astype(np.int64)
            d2q = np.round(d2 * KMEANS_FP_SCALE).astype(np.int64)
            sums = np.zeros((_k, X.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, Xq)
            # bincount with integer weights goes through float64; batch
            # partial sums stay < 2^53 so every value is still exact
            ine_q = np.bincount(
                assign, weights=d2q.astype(np.float64), minlength=_k
            ).astype(np.int64)
            return pa.table(
                {
                    "cluster_id": pa.array(np.arange(_k, dtype=np.int64)),
                    "n": pa.array(np.bincount(assign, minlength=_k).astype(np.int64)),
                    "inertia_q": pa.array(ine_q, pa.int64()),
                    "vsum_q": pa.array(list(sums), pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        n = np.zeros(k, dtype=np.int64)
        s = np.zeros((k, C.shape[1]), dtype=np.int64)
        inertia_q = 0
        for cid, cnt, ine, vs in zip(
            parts["cluster_id"], parts["n"], parts["inertia_q"], parts["vsum_q"]
        ):
            n[cid] += int(cnt)
            inertia_q += int(ine)
            s[cid] += np.asarray(vs, dtype=np.int64)
        nz = n > 0
        C = C.copy()
        C[nz] = s[nz].astype(np.float64) / KMEANS_FP_SCALE / n[nz, None]
        history.append(inertia_q / KMEANS_FP_SCALE)
    return C, history


def kmeans_embeddings(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Cluster summary after distributed Lloyd's: per-cluster size and
    mean squared distance (6-decimal-rounded).  The assignment pass is
    the same broadcast + vectorized-argmin map as training."""
    C, _ = kmeans_fit(sf_dir, k=k, iters=iters)
    c_ref = ray.put(C)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def summarize(batch: pa.Table) -> pa.Table:
        Cl = ray.get(c_ref)
        X = _matrix(batch["embedding"])
        scores = X @ Cl.T - 0.5 * (Cl * Cl).sum(axis=1)[None, :]
        assign = scores.argmax(axis=1)
        d2 = (X * X).sum(axis=1) - 2.0 * scores[np.arange(len(X)), assign]
        # Q20 fixed-point like the fit: the d2 sum reduces in exact int64
        # so the rounded mean is independent of blocking
        d2q = np.round(d2 * KMEANS_FP_SCALE).astype(np.int64)
        return pa.table(
            {
                "cluster_id": pa.array(assign.astype(np.int64)),
                "d2_q": pa.array(d2q, pa.int64()),
            }
        )

    pdf = ds.map_batches(summarize, batch_format="pyarrow").to_pandas()
    out = (
        pdf.groupby("cluster_id")
        .agg(size=("d2_q", "size"), sum_d2_q=("d2_q", "sum"))
        .reset_index()
    )
    out["mean_d2_r"] = (
        out["sum_d2_q"] / KMEANS_FP_SCALE / out["size"]
    ).round(6)
    return out[["cluster_id", "size", "mean_d2_r"]].sort_values(
        "cluster_id"
    ).reset_index(drop=True)


KMEANS_REPS = 5


def kmeans_representatives(
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    r: int = KMEANS_REPS,
):
    """Per-cluster most-central vectors — the diversity-sampling /
    corpus-bucketing selection a curation pipeline runs after k-means
    (one exemplar set per topic bucket).

    Same broadcast-assignment map as the fit, then per-BATCH partial
    top-r per cluster (lexsort) so the final ``groupby(cluster)`` shuffle
    sees at most r rows per (batch, cluster) instead of the corpus;
    ranking is (rounded d2 ASC, vec_id ASC) — fully deterministic."""
    C, _ = kmeans_fit(sf_dir, k=k, iters=iters)
    c_ref = ray.put(C)
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        Cl = ray.get(c_ref)
        X = _matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        scores = X @ Cl.T - 0.5 * (Cl * Cl).sum(axis=1)[None, :]
        assign = scores.argmax(axis=1)
        d2 = np.round(
            (X * X).sum(axis=1) - 2.0 * scores[np.arange(len(X)), assign], 6
        )
        order = np.lexsort((ids, d2, assign))
        a_sorted = assign[order]
        starts = np.r_[0, np.flatnonzero(np.diff(a_sorted)) + 1]
        seg = np.repeat(starts, np.diff(np.r_[starts, len(a_sorted)]))
        keep = order[np.arange(len(a_sorted)) - seg < r]
        return pa.table(
            {
                "cluster_id": pa.array(assign[keep].astype(np.int64)),
                "vec_id": pa.array(ids[keep]),
                "d2_r": pa.array(d2[keep], pa.float64()),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["d2_r", "vec_id"]).head(r).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["cluster_id", "rank", "vec_id", "d2_r"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(final, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Filtered ANN: similarity search composed with a metadata predicate —
# the "retrieve within a slice" query every curation pipeline runs
# (same broadcast-queries / per-batch partial-top-k shape, with the
# predicate pushed into the parquet read so non-matching rows never
# leave storage).
# ---------------------------------------------------------------------------

ANN_FILTER_LABEL_MOD = 3  # predicate: label % 3 == 0


def ann_cosine_topk_filtered(sf_dir: str, k: int = TOPK):
    """Top-k cosine neighbors among vectors whose label % 3 == 0 only.
    The label predicate is evaluated as a pushed-down parquet filter, so
    the scan decodes only matching row groups' columns — at corpus scale
    a label-partitioned layout would prune whole files the same way.
    Rides the SAME _brute_topk kernel as the unfiltered op (one
    tie-break/rounding implementation)."""
    import pyarrow.dataset as pads

    src = f"{sf_dir}/embeddings.parquet"
    q_ref = ray.put(_load_query_matrix(sf_dir))
    # Arrow dataset expressions have no modulo; resolve the predicate to
    # an isin over the (low-cardinality) label domain — one tiny column
    # scan — so the row filter still pushes down into the parquet read.
    labels = pads.dataset(src).to_table(columns=["label"])["label"]
    import pyarrow.compute as _pc

    keep_labels = [
        int(v)
        for v in _pc.unique(labels.combine_chunks()).to_pylist()
        if int(v) % ANN_FILTER_LABEL_MOD == 0
    ]
    ds = rd.read_parquet(
        src,
        columns=["vec_id", "embedding"],
        filter=pads.field("label").isin(keep_labels),
    )
    return _brute_topk(ds, q_ref, k)


ANN_COSINE_TOPK_FILTERED_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
     b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE label % {ANN_FILTER_LABEL_MOD} = 0),
     s AS (
       SELECT q.qid AS query_vec_id, b.vec_id AS neighbor_vec_id,
              round(list_dot_product(q.qv, b.v)
                    / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim_r
       FROM q, b WHERE b.vec_id != q.qid)
SELECT query_vec_id, neighbor_vec_id, sim_r,
       CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY sim_r DESC, neighbor_vec_id) AS BIGINT) AS rank
FROM s
QUALIFY rank <= {TOPK}
"""


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
# k-means buckets the corpus into semantic clusters, then WITHIN each
# cluster a vector is pruned if its cosine similarity to any vector
# EARLIER in a deterministic priority order exceeds eps.  This is the
# curation step a training-data pipeline runs between exact/near-dup
# hashing and quality filtering — it removes semantically redundant
# examples the lexical near-dup family (minhash/simhash) cannot see.
# ---------------------------------------------------------------------------

SEMDEDUP_EPS = 0.35
# Row-block width for the within-cluster scan: peak memory is
# O(block x cluster) instead of O(cluster^2), so a 100k-row cluster
# costs ~0.8 GB transient per block instead of 80 GB for the full
# similarity matrix.  At 100 TB the valve is k itself: size k so
# clusters stay ~O(100k) rows (SemDeDup runs k ~ sqrt(N)); a pathological
# hot cluster can additionally be tiled through the shuffle exactly like
# near_dup_embeddings' (label, tile_i, tile_j) scheme, since the drop
# rule only ever compares a row against EARLIER rows.
SEMDEDUP_ROW_BLOCK = 1024


def _semdedup_scan(Xu: np.ndarray, eps: float):
    """Per-row max cosine against all EARLIER rows of unit-normalized
    ``Xu`` (already sorted into priority order) and its argmax, computed
    in row blocks.  Shared verbatim by the serial golden generator
    (tools/gen_op_goldens.py) so blocked-matmul float behavior is
    identical on both paths; similarities are rounded to 6 decimals
    BEFORE the comparison (the library-wide oracle-identity rule).
    Row 0 has no earlier rows: best=-1, sim=-inf."""
    n = len(Xu)
    best = np.full(n, -1, dtype=np.int64)
    msim = np.full(n, -np.inf, dtype=np.float64)
    for s in range(1, n, SEMDEDUP_ROW_BLOCK):
        e = min(s + SEMDEDUP_ROW_BLOCK, n)
        S = np.round(Xu[s:e] @ Xu[:e].T, 6)
        # mask j >= i: row i may only match strictly earlier columns
        S[np.arange(e)[None, :] >= np.arange(s, e)[:, None]] = -np.inf
        b = S.argmax(axis=1)
        best[s:e] = b
        msim[s:e] = S[np.arange(e - s), b]
    return best, msim


def semdedup_prune(
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    eps: float = SEMDEDUP_EPS,
):
    """Semantic near-duplicate pruning: returns the DROPPED rows
    ``(vec_id, cluster_id, dup_of, sim_r)`` — result-sized output, the
    keep-set is its complement.

    Shape: ``kmeans_fit`` (broadcast centroids, Q20 exact reduce) ->
    one assignment ``map_batches`` -> ``groupby(cluster_id)`` shuffle
    (each row crosses the exchange exactly once) -> per-cluster
    vectorized blocked scan.  Priority order inside a cluster is
    (rounded d2-to-centroid ASC, vec_id ASC) — most-central first, fully
    deterministic, independent of Ray blocking; ``dup_of`` is the
    earlier vector with max similarity (SemDeDup's published rule keeps
    one representative per epsilon-ball, dropping later arrivals whether
    or not their match was itself dropped).
    """
    C, _ = kmeans_fit(sf_dir, k=k, iters=iters)
    c_ref = ray.put(C)
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def assign_batch(batch: pa.Table) -> pa.Table:
        Cl = ray.get(c_ref)
        X = _matrix(batch["embedding"])
        scores = X @ Cl.T - 0.5 * (Cl * Cl).sum(axis=1)[None, :]
        a = scores.argmax(axis=1)
        d2 = np.round(
            (X * X).sum(axis=1) - 2.0 * scores[np.arange(len(X)), a], 6
        )
        return pa.table(
            {
                "cluster_id": pa.array(a.astype(np.int64)),
                "d2_r": pa.array(d2, pa.float64()),
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
            }
        )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["vec_id"].to_numpy(), g["d2_r"].to_numpy())
        )
        ids = g["vec_id"].to_numpy().astype(np.int64)[order]
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in g["embedding"].iloc[order]]
        )
        Xu = X / np.sqrt((X * X).sum(axis=1))[:, None]
        best, msim = _semdedup_scan(Xu, eps)
        drop = msim >= eps
        nd = int(drop.sum())
        return pd.DataFrame(
            {
                "vec_id": ids[drop],
                "cluster_id": np.full(
                    nd, int(g["cluster_id"].iloc[0]), dtype=np.int64
                ),
                "dup_of": ids[best[drop]],
                "sim_r": msim[drop],
            }
        )

    return (
        ds.map_batches(assign_batch, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(prune, batch_format="pandas")
        .select_columns(["vec_id", "cluster_id", "dup_of", "sim_r"])
    )


# ---------------------------------------------------------------------------
# Product-quantization ANN (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"): the memory-compression scale path for
# similarity search.  Unit-normalized vectors split into PQ_M subspaces,
# each quantized to PQ_KS centroids -> PQ_M uint8 codes per vector (16
# bytes vs 256 for raw float32 at dim 64, 16x), scanned via per-query
# ADC lookup tables (one m-gather-sum per candidate, no float matmul
# against raw vectors).  At 100 TB the codes table fits where raw
# embeddings don't; compose with the IVF layout (encode per cell) for
# sub-linear scan.  Approximate by construction — recall-gated in
# pytest vs brute force, stored-golden oracled (deterministic: strided
# training sample, fixed-seed-free Lloyd's, per-row encode).
# ---------------------------------------------------------------------------

PQ_M = 16           # subspaces (dim 64 -> 4 dims each)
PQ_KS = 256         # centroids per subspace (textbook uint8 codes)
PQ_TRAIN_SAMPLE = 2048
PQ_ITERS = 10
# 16 bytes/vector vs 256 for raw float32 at dim 64 (16x).  Measured
# recall@5 vs brute force at sf0.01 — near-random vectors, the HARDEST
# case for PQ: 0.86 (m=8/ks=16: 0.18; m=32/ks=256: 0.94).  Clustered
# real-embedding corpora quantize far better; see the planted-cluster
# pytest gate.


def _train_pq_codebooks(
    X: np.ndarray, m: int = PQ_M, ks: int = PQ_KS, iters: int = PQ_ITERS
) -> np.ndarray:
    """(m, ks, dim/m) codebooks from plain Lloyd's per subspace over the
    UNIT-normalized sample; evenly-strided seeds, no RNG (deterministic
    retrain => stable codes across resumed builds).  Driver-side: the
    sample is O(PQ_TRAIN_SAMPLE) rows regardless of corpus size."""
    Xu = _unit(X)
    n, dim = Xu.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books = np.zeros((m, ks, d), dtype=np.float64)
    for j in range(m):
        S = Xu[:, j * d : (j + 1) * d]
        C = S[:: max(n // ks, 1)][:ks].copy()
        if len(C) < ks:  # tiny corpus: pad by repeating the last seed
            C = np.concatenate([C, np.repeat(C[-1:], ks - len(C), axis=0)])
        for _ in range(iters):
            a = (S @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]).argmax(axis=1)
            for c in range(ks):
                sel = a == c
                if sel.any():
                    C[c] = S[sel].mean(axis=0)
        books[j] = C
    return books


def _pq_encode(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per-subspace Euclidean argmin against the
    codebooks, on UNIT-normalized input.  Pure per-row math — blocking-
    independent, shared with the serial golden generator."""
    Xu = _unit(X)
    n = len(Xu)
    m, ks, d = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        S = Xu[:, j * d : (j + 1) * d]
        C = books[j]
        codes[:, j] = (
            S @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
        ).argmax(axis=1).astype(np.uint8)
    return codes


def _pq_score(Q: np.ndarray, codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(nq, n) approximate cosine: ADC lookup tables LUT[q, j, c] =
    q_j . books[j, c] summed over the code gathers, rounded to 6
    decimals (the library-wide oracle-identity rule).  Q must be
    unit-normalized."""
    nq = len(Q)
    m, ks, d = books.shape
    lut = np.einsum("qjd,jcd->qjc", Q.reshape(nq, m, d), books)
    flat = lut.reshape(nq, m * ks)
    keyidx = np.arange(m, dtype=np.int64) * ks + codes.astype(np.int64)
    return np.round(flat[:, keyidx].sum(axis=2), 6)


def pq_cosine_topk(sf_dir: str, k: int = TOPK):
    """Approximate cosine top-k over PQ codes (same output schema as
    ``ann_cosine_topk`` with ``sim_r`` = the ADC approximation).
    Codebooks train once on the driver from a row-group-pruned strided
    sample and broadcast; each batch encodes to uint8 and scans via
    table lookups — the raw embedding column never leaves the map task,
    only (query, neighbor, score) partial top-k rows do."""
    src = f"{sf_dir}/embeddings.parquet"
    books = _train_pq_codebooks(_strided_training_sample(src, PQ_TRAIN_SAMPLE))
    qids, Q, qnorm = _load_query_matrix(sf_dir)
    state_ref = ray.put((qids, _unit(Q), books))
    ds = rd.read_parquet(src, columns=["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_l, Qu_l, books_l = ray.get(state_ref)
        rows = {"query_vec_id": [], "neighbor_vec_id": [], "sim_r": []}
        if batch.num_rows:
            X = _matrix(batch["embedding"])
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            codes = _pq_encode(X, books_l)
            sims_r = _pq_score(Qu_l, codes, books_l)
            for qi, qid in enumerate(qids_l):
                mask = ids != qid
                cand_ids = ids[mask]
                cand = sims_r[qi][mask]
                order = np.lexsort((cand_ids, -cand))[:k]
                rows["query_vec_id"] += [int(qid)] * len(order)
                rows["neighbor_vec_id"] += cand_ids[order].astype(int).tolist()
                rows["sim_r"] += cand[order].tolist()
        return pa.table(
            {
                "query_vec_id": pa.array(rows["query_vec_id"], pa.int64()),
                "neighbor_vec_id": pa.array(rows["neighbor_vec_id"], pa.int64()),
                "sim_r": pa.array(rows["sim_r"], pa.float64()),
            }
        )

    allc = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    allc = allc.sort_values(
        ["query_vec_id", "sim_r", "neighbor_vec_id"],
        ascending=[True, False, True],
    )
    out = allc.groupby("query_vec_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = (out.groupby("query_vec_id").cumcount() + 1).astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# MMR diverse re-ranking (Carbonell & Goldstein 1998): re-rank each
# query's cosine top-N candidate pool so the final top-k trades
# relevance against redundancy — the retrieval-side counterpart of
# SemDeDup (which prunes the corpus; MMR diversifies per answer).
# ---------------------------------------------------------------------------

MMR_N_CAND = 50
MMR_LAMBDA = 0.7
MMR_TOPK = 10


def _mmr_select(qsims: np.ndarray, S: np.ndarray, ids: np.ndarray,
                k: int, lam: float):
    """Greedy MMR over one query's candidate pool.  ``qsims`` are the
    query-candidate cosines and ``S`` the candidate-candidate cosine
    matrix, BOTH already rounded to 6 decimals (the library-wide
    oracle-identity rule); ties break on vec_id ascending.  The first
    pick is pure relevance (classic MMR: the diversity term is a max
    over the selected set, empty at step 0); every later step scores
    ``round(lam*qsim - (1-lam)*max_sel_sim, 6)``.  Shared verbatim by
    the serial golden generator (tools/gen_op_goldens.py) so selection
    float behavior is identical on both paths.  Returns (indices into
    the candidate arrays, per-step mmr scores)."""
    n = len(ids)
    k = min(k, n)
    avail = np.ones(n, dtype=bool)
    maxsim = np.full(n, -np.inf)
    picks = np.empty(k, dtype=np.int64)
    scores = np.empty(k, dtype=np.float64)
    for step in range(k):
        if step == 0:
            mmr = np.round(lam * qsims, 6)
        else:
            mmr = np.round(lam * qsims - (1.0 - lam) * maxsim, 6)
        cand = np.flatnonzero(avail)
        best = cand[np.lexsort((ids[cand], -mmr[cand]))[0]]
        picks[step] = best
        scores[step] = mmr[best]
        avail[best] = False
        maxsim = np.maximum(maxsim, S[:, best])
    return picks, scores


def mmr_diverse_rerank(sf_dir: str, k: int = MMR_TOPK,
                       n_cand: int = MMR_N_CAND, lam: float = MMR_LAMBDA):
    """MMR-diversified top-k per query vector.

    Plan: the corpus-sized work is exactly the oracled brute-force scan
    (``_brute_topk`` — broadcast query matrix, per-batch partial top-k,
    result-sized finalize), widened to an ``n_cand`` pool per query.
    The greedy re-rank then runs on the driver over N_QUERIES x n_cand
    rows — result-sized by construction, O(k x n_cand) per query — with
    candidate vectors fetched once via a pushed-down point-read (the
    pool id set is tiny; at corpus scale this is the same
    hydrate-the-winners shape as Q18).  No extra shuffle anywhere.
    """
    import pyarrow.dataset as pads

    q_ref = ray.put(_load_query_matrix(sf_dir))
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    pool = _brute_topk(ds, q_ref, n_cand)

    cand_ids = sorted(set(pool["neighbor_vec_id"].tolist()))
    ctbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin(cand_ids),
    )
    cids = ctbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    C = _matrix(ctbl["embedding"])
    Cu = C / np.sqrt((C * C).sum(axis=1))[:, None]
    order = np.argsort(cids)
    cids, Cu = cids[order], Cu[order]

    rows = {"query_vec_id": [], "rank": [], "neighbor_vec_id": [], "mmr_r": []}
    for qid, g in pool.groupby("query_vec_id"):
        ids = g["neighbor_vec_id"].to_numpy().astype(np.int64)
        qs = g["sim_r"].to_numpy().astype(np.float64)
        idx = np.searchsorted(cids, ids)
        Xu = Cu[idx]
        S = np.round(Xu @ Xu.T, 6)
        picks, scores = _mmr_select(qs, S, ids, k, lam)
        rows["query_vec_id"] += [int(qid)] * len(picks)
        rows["rank"] += list(range(1, len(picks) + 1))
        rows["neighbor_vec_id"] += ids[picks].tolist()
        rows["mmr_r"] += scores.tolist()
    out = pd.DataFrame(rows)
    out["query_vec_id"] = out["query_vec_id"].astype(np.int64)
    out["rank"] = out["rank"].astype(np.int64)
    out["neighbor_vec_id"] = out["neighbor_vec_id"].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep): for each query
# vector, the most cosine-similar vectors with a DIFFERENT label — the
# canonical "hard negatives" a retrieval/embedding trainer pairs with
# each anchor.  Same brute-force shape as ann_cosine_topk (broadcast
# query matrix + per-batch partial top-k), so the label exclusion is
# the only semantic difference and tie-breaking/rounding cannot diverge.
# ---------------------------------------------------------------------------


def hard_negative_mining(sf_dir: str, k: int = TOPK):
    """Top-k different-label cosine neighbors per query vector.

    Plan: query (vec_id, label, vector) triples broadcast once; each
    batch scores candidates against all queries in one matmul, masks
    same-label rows per query, keeps a per-batch partial top-k; the
    finalize is result-sized.  No shuffle; scales exactly like the
    oracled brute-force scan it rides beside.
    """
    import pyarrow.dataset as pads

    src = f"{sf_dir}/embeddings.parquet"
    qtbl = pads.dataset(src).to_table(
        columns=["vec_id", "embedding", "label"],
        filter=pads.field("vec_id") < N_QUERIES,
    )
    qids = qtbl["vec_id"].to_numpy(zero_copy_only=False)
    qlabels = qtbl["label"].to_numpy(zero_copy_only=False)
    Q = _matrix(qtbl["embedding"])
    q_ref = ray.put((qids, qlabels, Q, np.sqrt((Q * Q).sum(axis=1))))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_l, qlabels_l, Q_l, qnorm_l = ray.get(q_ref)
        rows = {"query_vec_id": [], "neighbor_vec_id": [], "sim_r": []}
        if batch.num_rows:
            X = _matrix(batch["embedding"])
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            labels = batch["label"].to_numpy(zero_copy_only=False)
            xnorm = np.sqrt((X * X).sum(axis=1))
            sims_r = np.round(
                (Q_l @ X.T) / (qnorm_l[:, None] * xnorm[None, :]), 6
            )
            for qi, qid in enumerate(qids_l):
                mask = labels != qlabels_l[qi]
                cand_ids = ids[mask]
                cand = sims_r[qi][mask]
                order = np.lexsort((cand_ids, -cand))[:k]
                rows["query_vec_id"] += [int(qid)] * len(order)
                rows["neighbor_vec_id"] += cand_ids[order].astype(int).tolist()
                rows["sim_r"] += cand[order].tolist()
        return pa.table(
            {
                "query_vec_id": pa.array(rows["query_vec_id"], pa.int64()),
                "neighbor_vec_id": pa.array(rows["neighbor_vec_id"], pa.int64()),
                "sim_r": pa.array(rows["sim_r"], pa.float64()),
            }
        )

    ds = rd.read_parquet(src, columns=["vec_id", "embedding", "label"])
    allc = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    allc = allc.sort_values(
        ["query_vec_id", "sim_r", "neighbor_vec_id"],
        ascending=[True, False, True],
    )
    out = allc.groupby("query_vec_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_vec_id").cumcount() + 1
    return out


HARD_NEGATIVE_MINING_SQL = f"""
WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {N_QUERIES}),
     b AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
     s AS (
       SELECT q.qid AS query_vec_id, b.vec_id AS neighbor_vec_id,
              round(list_dot_product(q.qv, b.v)
                    / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim_r
       FROM q, b WHERE b.label != q.qlabel)
SELECT query_vec_id, neighbor_vec_id, sim_r,
       CAST(row_number() OVER (PARTITION BY query_vec_id ORDER BY sim_r DESC, neighbor_vec_id) AS BIGINT) AS rank
FROM s
QUALIFY rank <= {TOPK}
"""


# ---------------------------------------------------------------------------
# Embedding outlier gate (curation): vectors far from their k-means
# centroid — the semantic counterpart of the lexical quality filters
# (mislabeled/off-distribution examples sit in their cluster's tail).
# ---------------------------------------------------------------------------

EMB_OUTLIER_FACTOR = 1.05


def embedding_outliers(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Vectors whose squared distance to their assigned centroid exceeds
    ``EMB_OUTLIER_FACTOR`` x their cluster's mean squared distance.

    One distributed Lloyd's fit (the oracled ``kmeans_fit`` — Q20
    fixed-point reduces, bit-identical at any blocking), then TWO
    streaming passes sharing the broadcast centroids: per-cluster
    (size, Σd2_q) partials -> k-row driver merge -> per-cluster
    thresholds ``round(F * mean_d2_r, 6)`` broadcast -> a pure map-side
    flag pass emitting (vec_id, cluster_id, d2_r).  The d2 comparison
    happens on 6-decimal-rounded values derived from exact int64 sums,
    so the gate is blocking-independent on both engine and golden.
    """
    C, _ = kmeans_fit(sf_dir, k=k, iters=iters)
    c_ref = ray.put(C)
    src = f"{sf_dir}/embeddings.parquet"

    def stats(batch: pa.Table) -> pa.Table:
        Cl = ray.get(c_ref)
        X = _matrix(batch["embedding"])
        scores = X @ Cl.T - 0.5 * (Cl * Cl).sum(axis=1)[None, :]
        assign = scores.argmax(axis=1)
        d2 = (X * X).sum(axis=1) - 2.0 * scores[np.arange(len(X)), assign]
        d2q = np.round(d2 * KMEANS_FP_SCALE).astype(np.int64)
        t = pa.table(
            {
                "cluster_id": pa.array(assign.astype(np.int64)),
                "n": pa.array(np.ones(len(assign), dtype=np.int64)),
                "sum_d2_q": pa.array(d2q),
            }
        )
        return t.group_by("cluster_id").aggregate(
            [("n", "sum"), ("sum_d2_q", "sum")]
        ).rename_columns(["cluster_id", "n", "sum_d2_q"])

    ds = rd.read_parquet(src, columns=["vec_id", "embedding"])
    st = (
        ds.map_batches(stats, batch_format="pyarrow")
        .to_pandas()
        .groupby("cluster_id", as_index=False)
        .sum()
    )
    mean_d2_r = (st["sum_d2_q"] / KMEANS_FP_SCALE / st["n"]).round(6)
    thr = np.full(k, np.inf)
    thr[st["cluster_id"].to_numpy()] = np.round(
        EMB_OUTLIER_FACTOR * mean_d2_r.to_numpy(), 6
    )
    thr_ref = ray.put(thr)

    def flag(batch: pa.Table) -> pa.Table:
        Cl = ray.get(c_ref)
        th = ray.get(thr_ref)
        X = _matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        scores = X @ Cl.T - 0.5 * (Cl * Cl).sum(axis=1)[None, :]
        assign = scores.argmax(axis=1)
        d2_r = np.round(
            (X * X).sum(axis=1) - 2.0 * scores[np.arange(len(X)), assign], 6
        )
        keep = d2_r > th[assign]
        return pa.table(
            {
                "vec_id": pa.array(ids[keep].astype(np.int64)),
                "cluster_id": pa.array(assign[keep].astype(np.int64)),
                "d2_r": pa.array(d2_r[keep], pa.float64()),
            }
        )

    out = ds.map_batches(flag, batch_format="pyarrow").materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {
                "vec_id": pd.Series(dtype=np.int64),
                "cluster_id": pd.Series(dtype=np.int64),
                "d2_r": pd.Series(dtype=np.float64),
            }
        )
    return out


# ---------------------------------------------------------------------------
# ANN quality evaluation: IVF recall@k against the exact brute-force leg
# ---------------------------------------------------------------------------


def ivf_recall_eval(sf_dir: str):
    """Recall@k of the IVF approximate top-k against the exact
    brute-force cosine top-k, per query vector — the eval every ANN
    deployment needs before trading exactness for pruned reads.

    Both legs are the ALREADY-ORACLED ops (``ivf_cosine_topk``,
    ``ann_cosine_topk``); this op joins their result-sized outputs on
    the driver and counts per-query intersection — integers, with the
    one ratio computed from exact ints and rounded once.  The SQL
    oracle composes the same two oracle queries, so the eval is
    verified end to end, not re-derived."""
    ivf = ivf_cosine_topk(sf_dir)
    brute = ann_cosine_topk(sf_dir)
    if not isinstance(ivf, pd.DataFrame):
        ivf = ivf.to_pandas()
    if not isinstance(brute, pd.DataFrame):
        brute = brute.to_pandas()
    m = ivf.merge(
        brute[["query_vec_id", "neighbor_vec_id"]].assign(hit=1),
        on=["query_vec_id", "neighbor_vec_id"],
        how="left",
    )
    g = (
        m.groupby("query_vec_id", as_index=False)
        .agg(n_hits=("hit", lambda s: int(s.notna().sum())))
        .sort_values("query_vec_id")
        .reset_index(drop=True)
    )
    g["n_hits"] = g["n_hits"].astype(np.int64)
    g["k"] = np.int64(TOPK)
    g["recall_r"] = np.round(g["n_hits"].to_numpy() / float(TOPK), 6)
    return g[["query_vec_id", "n_hits", "k", "recall_r"]]


def _ivf_recall_sql() -> str:
    from myaku_ray.functions import op_goldens

    return f"""
WITH ivf AS ({op_goldens.IVF_COSINE_TOPK_SQL}),
brute AS ({ANN_COSINE_TOPK_SQL})
SELECT ivf.query_vec_id,
  count(brute.neighbor_vec_id)::BIGINT AS n_hits,
  {TOPK}::BIGINT AS k,
  round(count(brute.neighbor_vec_id)::DOUBLE / {TOPK}, 6) AS recall_r
FROM ivf LEFT JOIN brute
  ON brute.query_vec_id = ivf.query_vec_id
  AND brute.neighbor_vec_id = ivf.neighbor_vec_id
GROUP BY ivf.query_vec_id
ORDER BY ivf.query_vec_id
"""


def pq_recall_eval(sf_dir: str):
    """Recall@k of the PQ-ADC approximate top-k against the exact
    brute-force cosine top-k, per query vector — the companion eval to
    ``ivf_recall_eval`` for the OTHER approximation axis (16x vector
    compression instead of pruned reads; together they bound the
    compressed-and-pruned production config).  Same composition
    contract: both legs are the already-oracled ops, joined
    result-sized; the SQL oracle composes the same two oracle
    queries."""
    approx = pq_cosine_topk(sf_dir)
    brute = ann_cosine_topk(sf_dir)
    if not isinstance(approx, pd.DataFrame):
        approx = approx.to_pandas()
    if not isinstance(brute, pd.DataFrame):
        brute = brute.to_pandas()
    m = approx.merge(
        brute[["query_vec_id", "neighbor_vec_id"]].assign(hit=1),
        on=["query_vec_id", "neighbor_vec_id"],
        how="left",
    )
    g = (
        m.groupby("query_vec_id", as_index=False)
        .agg(n_hits=("hit", lambda s: int(s.notna().sum())))
        .sort_values("query_vec_id")
        .reset_index(drop=True)
    )
    g["n_hits"] = g["n_hits"].astype(np.int64)
    g["k"] = np.int64(TOPK)
    g["recall_r"] = np.round(g["n_hits"].to_numpy() / float(TOPK), 6)
    return g[["query_vec_id", "n_hits", "k", "recall_r"]]


def _pq_recall_sql() -> str:
    from myaku_ray.functions import op_goldens

    return f"""
WITH pq AS ({op_goldens.PQ_COSINE_TOPK_SQL}),
brute AS ({ANN_COSINE_TOPK_SQL})
SELECT pq.query_vec_id,
  count(brute.neighbor_vec_id)::BIGINT AS n_hits,
  {TOPK}::BIGINT AS k,
  round(count(brute.neighbor_vec_id)::DOUBLE / {TOPK}, 6) AS recall_r
FROM pq LEFT JOIN brute
  ON brute.query_vec_id = pq.query_vec_id
  AND brute.neighbor_vec_id = pq.neighbor_vec_id
GROUP BY pq.query_vec_id
ORDER BY pq.query_vec_id
"""


# ---------------------------------------------------------------------------
# Exact k-NN graph (all-pairs top-k) via bounded tile-pair exchange
# ---------------------------------------------------------------------------

KNN_GRAPH_K = 5
# Per-task tile width: a (tile x tile) float64 similarity block is
# ~128 MB at 4096, the worker-heap budget used by near_dup_embeddings.
KNN_GRAPH_TILE = 4096


def knn_graph(sf_dir: str, k: int = KNN_GRAPH_K, tile: int = KNN_GRAPH_TILE):
    """Exact cosine k-NN graph over ALL vectors (top-k neighbors per
    node, self excluded) — the all-pairs analog of ``ann_cosine_topk``,
    which only serves a broadcastable query set.

    Plan: with n vectors and ``nt = ceil(n / tile)`` tiles
    (``tile_of = vec_id % nt``), every (i, j) tile pair must meet once,
    so each row is expanded to nt query-role copies keyed (t, j) and nt
    base-role copies keyed (i, t) — 2·nt-fold duplication of (id, vec)
    rows, the price of EXACT all-pairs; the approximate scale path is
    the IVF layout (probe-local candidate sets).  One groupby((i, j))
    co-locates each block; inside, a single matmul + per-query partial
    top-k emits <= |tile|·k rows, and a second groupby(query) merges
    per-block partials into the global top-k.  Ranking uses the rounded
    sim with neighbor-id tie-breaks (the module's exactness contract),
    so partial-merge order can never diverge from the oracle.  The
    n·k-row result streams from the final groupby — the production
    sink is ``write_parquet``, not the driver.
    """
    import math

    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    nt = max(1, math.ceil(n / tile))

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        t = (ids % nt).astype(np.int32)
        pieces = []
        for j in range(nt):
            pieces.append(
                batch.append_column(
                    "gi", pa.array(t)
                ).append_column(
                    "gj", pa.array(np.full(len(ids), j, dtype=np.int32))
                ).append_column(
                    "role", pa.array(np.zeros(len(ids), dtype=np.int8))
                )
            )
        for i in range(nt):
            pieces.append(
                batch.append_column(
                    "gi", pa.array(np.full(len(ids), i, dtype=np.int32))
                ).append_column(
                    "gj", pa.array(t)
                ).append_column(
                    "role", pa.array(np.ones(len(ids), dtype=np.int8))
                )
            )
        return pa.concat_tables(pieces)

    def block_topk(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_vec_id": pd.Series([], dtype="int64"),
                "neighbor_vec_id": pd.Series([], dtype="int64"),
                "sim_r": pd.Series([], dtype="float64"),
            }
        )
        qs = g[g["role"] == 0]
        bs = g[g["role"] == 1]
        if len(qs) == 0 or len(bs) == 0:
            return empty
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in qs["embedding"]])
        X = np.stack([np.asarray(v, dtype=np.float64) for v in bs["embedding"]])
        qids = qs["vec_id"].to_numpy()
        bids = bs["vec_id"].to_numpy()
        qn = np.sqrt((Q * Q).sum(axis=1))
        xn = np.sqrt((X * X).sum(axis=1))
        sims = np.round((Q @ X.T) / (qn[:, None] * xn[None, :]), 6)
        out = {"query_vec_id": [], "neighbor_vec_id": [], "sim_r": []}
        for qi, qid in enumerate(qids):
            mask = bids != qid
            cand_ids = bids[mask]
            cand = sims[qi][mask]
            order = np.lexsort((cand_ids, -cand))[:k]
            out["query_vec_id"] += [int(qid)] * len(order)
            out["neighbor_vec_id"] += cand_ids[order].astype(int).tolist()
            out["sim_r"] += cand[order].tolist()
        return pd.DataFrame(out).astype(
            {"query_vec_id": "int64", "neighbor_vec_id": "int64",
             "sim_r": "float64"}
        )

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g.assign(rank=pd.Series([], dtype="int64"))
        g = g.sort_values(
            ["sim_r", "neighbor_vec_id"], ascending=[False, True]
        ).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["gi", "gj"])
        .map_groups(block_topk)
        .groupby("query_vec_id")
        .map_groups(merge_topk)
        .to_pandas()
    )
    return out.sort_values(["query_vec_id", "rank"]).reset_index(drop=True)


KNN_GRAPH_SQL = f"""
WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
     s AS (
       SELECT a.vec_id AS query_vec_id, c.vec_id AS neighbor_vec_id,
              round(list_dot_product(a.v, c.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(c.v, c.v))), 6) AS sim_r
       FROM b a, b c WHERE c.vec_id != a.vec_id)
SELECT query_vec_id, neighbor_vec_id, sim_r,
       CAST(row_number() OVER (PARTITION BY query_vec_id
                               ORDER BY sim_r DESC, neighbor_vec_id)
            AS BIGINT) AS rank
FROM s
QUALIFY rank <= {KNN_GRAPH_K}
"""
