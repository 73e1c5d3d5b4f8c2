"""Generate stored-golden DuckDB oracles for the formerly rows-only ops.

Every one of these operators is DETERMINISTIC given its input table
(seeded RNG / fixed-point reductions / fixed corpus), so the correct
output at the driver's correctness scale (sf0.01, plus the fixed pages
corpus) is a constant.  This tool computes each output with an
independent SERIAL path — plain numpy/pyarrow in this process, no Ray,
no Dataset, no shuffles — and emits them as literal VALUES tables into
``myaku_ray/functions/op_goldens.py`` for ``oracle_sql()`` to serve.

What the oracle then checks is exactly the thing that needs checking:
that the DISTRIBUTED composition (banded LSH groupbys, broadcast +
partial-top-k reduces, fixed-point partial-sum reductions, actor-pool
stages) reproduces the serial semantics.  Leaf kernels that define the
operator's semantics (hash parameters, tokenizer, extract fn, stub
decoders) are shared with the library — the same pattern the pages
goldens use (tools/gen_pages_golden.py) — while all distribution
machinery is bypassed.

The kmeans/ivf/media/minhash goldens depend on the sf0.01 tables
(/root/testdata/sf0.01), matching the driver's documented correctness
scale; the pages_fli golden depends only on the fixed 600-page corpus.
Regenerate when operator semantics intentionally change:

    PYTHONPATH=/root/repo python tools/gen_op_goldens.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"
OUT = "/root/repo/myaku_ray/functions/op_goldens.py"


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _fmt(v, typ: str) -> str:
    if typ == "BIGINT":
        return f"{int(v)}::BIGINT"
    if typ == "INTEGER":
        return f"{int(v)}::INTEGER"
    if typ == "DOUBLE":
        # through a VARCHAR cast: DuckDB parses a bare decimal literal as
        # DECIMAL first (the ::DOUBLE then re-rounds, off by 1 ulp for
        # full-precision doubles); string->double is correctly-rounded
        # strtod, so repr() round-trips exactly
        return f"'{float(v)!r}'::DOUBLE"
    if typ == "VARCHAR":
        return _sql_str(str(v))
    if typ == "BLOB":
        return f"unhex('{bytes(v).hex()}')"
    raise ValueError(typ)


def values_sql(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    """VALUES-table SQL with explicit per-value casts (floats must never
    parse as DECIMAL; see myaku_ray/functions/__init__.py)."""
    names = ", ".join(n for n, _ in cols)
    if not rows:
        sel = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return f"SELECT {sel} WHERE FALSE"
    body = ",\n  ".join(
        "(" + ", ".join(_fmt(v, t) for v, (_, t) in zip(r, cols)) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES\n  {body}\n) AS golden({names})"


# ---------------------------------------------------------------------------
# serial oracles
# ---------------------------------------------------------------------------

def golden_minhash() -> str:
    from myaku_ray.functions.dedup import (
        JACCARD_THRESHOLD, LSH_BANDS, LSH_ROWS, _perm_params,
        _shingle_hashes, minhash_signature,
    )

    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    a, b = _perm_params()
    sigs = np.stack([minhash_signature(x, a, b) for x in texts])
    chunks = sigs.reshape(len(ids), LSH_BANDS, LSH_ROWS)
    mix = np.zeros((len(ids), LSH_BANDS), dtype=np.uint64)
    P = np.uint64(0x9E3779B97F4A7C15)
    for r in range(LSH_ROWS):
        mix = mix * P + chunks[:, :, r]
        mix ^= mix >> np.uint64(29)
    bucket = (mix & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)

    groups: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, did in enumerate(ids):
        for band in range(LSH_BANDS):
            groups[(band, int(bucket[i, band]))].append(int(did))
    cand = set()
    for members in groups.values():
        ms = sorted(set(members))
        for i, x in enumerate(ms):
            for y in ms[i + 1 :]:
                cand.add((x, y))

    shingles = {
        int(did): set(_shingle_hashes(x).tolist())
        for did, x in zip(ids, texts)
    }
    rows = []
    for x, y in sorted(cand):
        sa, sb = shingles[x], shingles[y]
        union = len(sa | sb)
        j = len(sa & sb) / union if union else 0.0
        if j >= JACCARD_THRESHOLD:
            rows.append((x, y, j))
    return values_sql(
        rows,
        [("doc_id_a", "BIGINT"), ("doc_id_b", "BIGINT"),
         ("jaccard", "DOUBLE")],
    )


def golden_near_dup_lsh() -> str:
    from myaku_ray.functions.ann import (
        NEAR_DUP_LSH_BANDS, NEAR_DUP_LSH_PLANES, NEAR_DUP_LSH_THRESHOLD,
        _matrix,
    )

    t = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    X = _matrix(t["embedding"])
    rng = np.random.default_rng(0xA5A5)
    planes = rng.standard_normal((X.shape[1], NEAR_DUP_LSH_PLANES))
    signs = (X @ planes) > 0
    bits = NEAR_DUP_LSH_PLANES // NEAR_DUP_LSH_BANDS
    weights = (1 << np.arange(bits)).astype(np.int64)
    norm = np.sqrt((X * X).sum(axis=1))
    by_id = {int(v): i for i, v in enumerate(ids)}

    pairs: dict[tuple[int, int], float] = {}
    for band in range(NEAR_DUP_LSH_BANDS):
        keys = signs[:, band * bits : (band + 1) * bits].astype(np.int64) @ weights
        buckets: dict[int, list[int]] = defaultdict(list)
        for vid, key in zip(ids, keys):
            buckets[int(key)].append(int(vid))
        for members in buckets.values():
            ms = sorted(members)
            for i, x in enumerate(ms):
                for y in ms[i + 1 :]:
                    if (x, y) in pairs:
                        continue
                    ix, iy = by_id[x], by_id[y]
                    sim = round(
                        float(X[ix] @ X[iy]) / (norm[ix] * norm[iy]), 6
                    )
                    if sim >= NEAR_DUP_LSH_THRESHOLD:
                        pairs[(x, y)] = sim
    rows = [(x, y, s) for (x, y), s in sorted(pairs.items())]
    return values_sql(
        rows,
        [("vec_id_a", "BIGINT"), ("vec_id_b", "BIGINT"), ("sim_r", "DOUBLE")],
    )


def golden_ivf() -> str:
    from myaku_ray.functions.ann import (
        IVF_KMEANS_ITERS, IVF_N_CLUSTERS, IVF_NPROBE, IVF_TRAIN_SAMPLE,
        N_QUERIES, TOPK, _matrix, _strided_training_sample,
        _train_centroids, _unit,
    )

    src = f"{SF_DIR}/embeddings.parquet"
    t = pq.read_table(src, columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    X = _matrix(t["embedding"])
    C = _train_centroids(
        _strided_training_sample(src, IVF_TRAIN_SAMPLE),
        IVF_N_CLUSTERS, IVF_KMEANS_ITERS,
    )
    cell = (_unit(X) @ C.T).argmax(axis=1)
    cnorm = np.sqrt((C * C).sum(axis=1))
    xnorm = np.sqrt((X * X).sum(axis=1))

    qmask = ids < N_QUERIES
    rows = []
    for qi in np.flatnonzero(qmask):
        qid = int(ids[qi])
        qsims = (X[qi] @ C.T) / (xnorm[qi] * cnorm)
        probe = set(np.argsort(-qsims)[:IVF_NPROBE].tolist())
        m = np.isin(cell, list(probe)) & (ids != qid)
        cand_ids = ids[m]
        sims = np.round(
            (X[qi] @ X[m].T) / (xnorm[qi] * xnorm[m]), 6
        )
        order = np.lexsort((cand_ids, -sims))[:TOPK]
        for rank, sel in enumerate(order):
            rows.append((qid, rank, int(cand_ids[sel]), float(sims[sel])))
    rows.sort(key=lambda r: (r[0], r[1]))
    return values_sql(
        rows,
        [("query_vec_id", "BIGINT"), ("rank", "BIGINT"),
         ("neighbor_vec_id", "BIGINT"), ("sim_r", "DOUBLE")],
    )


def _serial_kmeans(src: str, k: int, iters: int):
    """Serial replica of kmeans_fit: Q20 fixed-point accumulation makes
    the distributed reduce exact integer math, so ONE serial pass over
    the whole table produces bit-identical centroids at any blocking."""
    from myaku_ray.functions.ann import (
        KMEANS_FP_SCALE, _matrix, _strided_training_sample,
    )

    X = _matrix(pq.read_table(src, columns=["embedding"])["embedding"])
    C = _strided_training_sample(src, k)[:k].astype(np.float64)
    S = KMEANS_FP_SCALE
    for _ in range(iters):
        scores = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
        assign = scores.argmax(axis=1)
        Xq = np.round(X * S).astype(np.int64)
        sums = np.zeros((k, X.shape[1]), dtype=np.int64)
        np.add.at(sums, assign, Xq)
        n = np.bincount(assign, minlength=k)
        nz = n > 0
        C = C.copy()
        C[nz] = sums[nz].astype(np.float64) / S / n[nz, None]
    return X, C


def golden_kmeans() -> tuple[str, str]:
    from myaku_ray.functions.ann import (
        KMEANS_FP_SCALE, KMEANS_ITERS, KMEANS_K, KMEANS_REPS,
    )

    src = f"{SF_DIR}/embeddings.parquet"
    X, C = _serial_kmeans(src, KMEANS_K, KMEANS_ITERS)
    ids = np.asarray(
        pq.read_table(src, columns=["vec_id"])["vec_id"].to_pylist(),
        dtype=np.int64,
    )
    scores = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
    assign = scores.argmax(axis=1)
    d2 = (X * X).sum(axis=1) - 2.0 * scores[np.arange(len(X)), assign]
    S = KMEANS_FP_SCALE

    sum_rows = []
    for c in range(KMEANS_K):
        m = assign == c
        if not m.any():
            continue
        d2q = np.round(d2[m] * S).astype(np.int64)
        mean_r = round(float(d2q.sum()) / S / int(m.sum()), 6)
        sum_rows.append((c, int(m.sum()), mean_r))
    summary = values_sql(
        sum_rows,
        [("cluster_id", "BIGINT"), ("size", "BIGINT"),
         ("mean_d2_r", "DOUBLE")],
    )

    d2r = np.round(d2, 6)
    rep_rows = []
    for c in range(KMEANS_K):
        m = np.flatnonzero(assign == c)
        order = m[np.lexsort((ids[m], d2r[m]))][:KMEANS_REPS]
        for rank, i in enumerate(order, start=1):
            rep_rows.append((c, rank, int(ids[i]), float(d2r[i])))
    reps = values_sql(
        rep_rows,
        [("cluster_id", "BIGINT"), ("rank", "BIGINT"),
         ("vec_id", "BIGINT"), ("d2_r", "DOUBLE")],
    )
    return summary, reps


def golden_semdedup() -> str:
    """Serial SemDeDup replica: serial kmeans -> per-cluster priority
    order (rounded d2 ASC, vec_id ASC) -> the SHARED blocked scan kernel
    (_semdedup_scan — identical float behavior to the Ray path)."""
    from myaku_ray.functions.ann import (
        KMEANS_ITERS, KMEANS_K, SEMDEDUP_EPS, _semdedup_scan,
    )

    src = f"{SF_DIR}/embeddings.parquet"
    X, C = _serial_kmeans(src, KMEANS_K, KMEANS_ITERS)
    ids = np.asarray(
        pq.read_table(src, columns=["vec_id"])["vec_id"].to_pylist(),
        dtype=np.int64,
    )
    scores = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
    assign = scores.argmax(axis=1)
    d2 = np.round(
        (X * X).sum(axis=1) - 2.0 * scores[np.arange(len(X)), assign], 6
    )
    Xu = X / np.sqrt((X * X).sum(axis=1))[:, None]
    rows = []
    for c in range(KMEANS_K):
        m = np.flatnonzero(assign == c)
        o = m[np.lexsort((ids[m], d2[m]))]
        best, msim = _semdedup_scan(Xu[o], SEMDEDUP_EPS)
        for i in np.flatnonzero(msim >= SEMDEDUP_EPS):
            rows.append(
                (int(ids[o[i]]), c, int(ids[o[best[i]]]), float(msim[i]))
            )
    rows.sort()
    return values_sql(
        rows,
        [("vec_id", "BIGINT"), ("cluster_id", "BIGINT"),
         ("dup_of", "BIGINT"), ("sim_r", "DOUBLE")],
    )


def golden_pq() -> str:
    """Serial PQ replica: the SHARED train/encode/score kernels
    (_train_pq_codebooks/_pq_encode/_pq_score — identical float behavior
    to the Ray path) over the whole table, then the same
    (sim_r DESC, vec_id ASC) top-k."""
    from myaku_ray.functions.ann import (
        PQ_TRAIN_SAMPLE, TOPK, _load_query_matrix, _matrix, _pq_encode,
        _pq_score, _strided_training_sample, _train_pq_codebooks, _unit,
    )

    src = f"{SF_DIR}/embeddings.parquet"
    books = _train_pq_codebooks(_strided_training_sample(src, PQ_TRAIN_SAMPLE))
    t = pq.read_table(src, columns=["vec_id", "embedding"])
    X = _matrix(t["embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    qids, Q, _ = _load_query_matrix(SF_DIR)
    codes = _pq_encode(X, books)
    sims = _pq_score(_unit(Q), codes, books)
    rows = []
    for qi, qid in enumerate(qids):
        mask = ids != qid
        cand_ids = ids[mask]
        cand = sims[qi][mask]
        order = np.lexsort((cand_ids, -cand))[:TOPK]
        for rank, j in enumerate(order, start=1):
            rows.append(
                (int(qid), int(cand_ids[j]), float(cand[j]), rank)
            )
    return values_sql(
        rows,
        [("query_vec_id", "BIGINT"), ("neighbor_vec_id", "BIGINT"),
         ("sim_r", "DOUBLE"), ("rank", "BIGINT")],
    )


def golden_mmr() -> str:
    """Serial MMR replica: full-matrix cosine top-n_cand pools per query
    (same 6-decimal rounding + (sim DESC, vec_id ASC) tie-break as the
    distributed _brute_topk), then the SHARED greedy selection kernel
    (_mmr_select — identical float behavior to the Ray path)."""
    from myaku_ray.functions.ann import (
        MMR_LAMBDA, MMR_N_CAND, MMR_TOPK, _load_query_matrix, _matrix,
        _mmr_select,
    )

    src = f"{SF_DIR}/embeddings.parquet"
    t = pq.read_table(src, columns=["vec_id", "embedding"])
    X = _matrix(t["embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    xnorm = np.sqrt((X * X).sum(axis=1))
    Xu = X / xnorm[:, None]
    qids, Q, qnorm = _load_query_matrix(SF_DIR)
    sims = np.round((Q @ X.T) / (qnorm[:, None] * xnorm[None, :]), 6)
    rows = []
    for qi, qid in enumerate(qids):
        mask = ids != qid
        cand_ids = ids[mask]
        cand = sims[qi][mask]
        order = np.lexsort((cand_ids, -cand))[:MMR_N_CAND]
        pool_ids = cand_ids[order]
        pool_sims = cand[order]
        S = np.round(Xu[mask][order] @ Xu[mask][order].T, 6)
        picks, scores = _mmr_select(pool_sims, S, pool_ids, MMR_TOPK, MMR_LAMBDA)
        for rank, (j, sc) in enumerate(zip(picks, scores), start=1):
            rows.append((int(qid), rank, int(pool_ids[j]), float(sc)))
    return values_sql(
        rows,
        [("query_vec_id", "BIGINT"), ("rank", "BIGINT"),
         ("neighbor_vec_id", "BIGINT"), ("mmr_r", "DOUBLE")],
    )


def golden_embedding_outliers() -> str:
    """Serial replica of embedding_outliers: serial kmeans (bit-identical
    centroids via Q20 reduces), per-cluster exact-int mean d2, the same
    rounded threshold compare."""
    from myaku_ray.functions.ann import (
        EMB_OUTLIER_FACTOR, KMEANS_FP_SCALE, KMEANS_ITERS, KMEANS_K,
    )

    src = f"{SF_DIR}/embeddings.parquet"
    X, C = _serial_kmeans(src, KMEANS_K, KMEANS_ITERS)
    ids = np.asarray(
        pq.read_table(src, columns=["vec_id"])["vec_id"].to_pylist(),
        dtype=np.int64,
    )
    scores = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
    assign = scores.argmax(axis=1)
    d2 = (X * X).sum(axis=1) - 2.0 * scores[np.arange(len(X)), assign]
    d2q = np.round(d2 * KMEANS_FP_SCALE).astype(np.int64)
    rows = []
    thr = {}
    for c in np.unique(assign):
        m = assign == c
        mean_r = round(d2q[m].sum() / KMEANS_FP_SCALE / m.sum(), 6)
        thr[c] = round(EMB_OUTLIER_FACTOR * mean_r, 6)
    d2_r = np.round(d2, 6)
    for i in np.flatnonzero(d2_r > np.vectorize(thr.get)(assign)):
        rows.append((int(ids[i]), int(assign[i]), float(d2_r[i])))
    rows.sort()
    return values_sql(
        rows,
        [("vec_id", "BIGINT"), ("cluster_id", "BIGINT"), ("d2_r", "DOUBLE")],
    )


def golden_pages_fli() -> str:
    from myaku_ray.corpus import gen_blogs_table, write_pages_parquet
    from myaku_ray.functions.fulltext import PAGES_N, fli_payload_json
    from myaku_ray.stages.extract import make_extract_fn
    from myaku_ray.stages.tokenize import FliStage

    import pyarrow.compute as pc

    pages_dir = "/tmp/myaku_ray_golden_pages"
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS_GOLDEN")):
        write_pages_parquet(pages_dir, PAGES_N, use_ray=False)
        open(os.path.join(pages_dir, "_SUCCESS_GOLDEN"), "w").write("ok")
    blogs = gen_blogs_table()
    ratings = dict(zip(blogs["blog_url"], blogs["rating"]))
    pages = pq.read_table(pages_dir).select(["url", "warc_ts", "html", "lang"])
    docs = make_extract_fn(ratings)(pages).select(["doc_id", "text"])
    fli = FliStage()(docs)
    multi = pc.greater(pc.list_value_length(fli["possible_interps"]), 1)
    phrase = pc.equal(fli["pos"], "連語")
    out = fli_payload_json(fli.filter(pc.or_(multi, phrase)))
    rows = list(
        zip(
            out["doc_id"].to_pylist(), out["term"].to_pylist(),
            out["tf"].to_pylist(), out["reading"].to_pylist(),
            out["pos"].to_pylist(),
            out["found_positions_json"].to_pylist(),
            out["possible_interps_json"].to_pylist(),
            out["interp_position_map_json"].to_pylist(),
        )
    )
    return values_sql(
        rows,
        [("doc_id", "BIGINT"), ("term", "VARCHAR"), ("tf", "INTEGER"),
         ("reading", "VARCHAR"), ("pos", "VARCHAR"),
         ("found_positions_json", "VARCHAR"),
         ("possible_interps_json", "VARCHAR"),
         ("interp_position_map_json", "VARCHAR")],
    )


def _media_manifest() -> pa.Table:
    from myaku_ray.functions.media import _as_media

    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return _as_media(docs)


def golden_media_features() -> str:
    from myaku_ray.functions.media import MediaFeatureStage

    feats = MediaFeatureStage()(_media_manifest())
    rows = list(
        zip(
            feats["media_id"].to_pylist(), feats["media_type"].to_pylist(),
            feats["n_bytes"].to_pylist(), feats["width"].to_pylist(),
            feats["height"].to_pylist(), feats["feat_norm"].to_pylist(),
        )
    )
    return values_sql(
        rows,
        [("media_id", "BIGINT"), ("media_type", "VARCHAR"),
         ("n_bytes", "BIGINT"), ("width", "INTEGER"),
         ("height", "INTEGER"), ("feat_norm", "DOUBLE")],
    )


def golden_media_frames() -> str:
    from myaku_ray.functions.media import FrameSampleStage, hex_frames

    frames = hex_frames(FrameSampleStage()(_media_manifest()))
    rows = list(
        zip(
            frames["media_id"].to_pylist(),
            frames["media_type"].to_pylist(),
            frames["frame_index"].to_pylist(),
            frames["frame_hex"].to_pylist(),
        )
    )
    return values_sql(
        rows,
        [("media_id", "BIGINT"), ("media_type", "VARCHAR"),
         ("frame_index", "INTEGER"), ("frame_hex", "VARCHAR")],
    )


def golden_zratio() -> str:
    """Serial zlib pass over the documents rows — the independent
    reference for doc_compression_ratio (no Ray, no batching)."""
    import zlib

    from myaku_ray.functions.textops import ZRATIO_LEVEL

    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    rows = []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        b = text.encode("utf-8")
        c = len(zlib.compress(b, ZRATIO_LEVEL))
        rows.append((int(did), len(b), c, 1000 * c // max(len(b), 1)))
    return values_sql(
        rows,
        [
            ("doc_id", "BIGINT"),
            ("n_raw", "BIGINT"),
            ("n_zlib", "BIGINT"),
            ("ratio_milli", "BIGINT"),
        ],
    )


def golden_ivf_add_delta() -> str:
    """Serial replica of ivf_add_delta: same deterministic centroid
    kernels over the base window, then assign EVERY vector and reduce
    per-cell (n_base, n_delta, delta-id sum) in one numpy pass."""
    from myaku_ray.functions.ann import (
        IVF_DELTA_FRAC, IVF_KMEANS_ITERS, IVF_N_CLUSTERS,
        IVF_TRAIN_SAMPLE, _matrix, _strided_training_sample,
        _train_centroids, _unit,
    )

    src = f"{SF_DIR}/embeddings.parquet"
    t = pq.read_table(src, columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    X = _matrix(t["embedding"])
    cut = int(len(ids) * IVF_DELTA_FRAC)
    C = _train_centroids(
        _strided_training_sample(src, IVF_TRAIN_SAMPLE, limit_rows=cut),
        IVF_N_CLUSTERS, IVF_KMEANS_ITERS,
    )
    cell = (_unit(X) @ C.T).argmax(axis=1)
    is_delta = ids >= cut
    rows = []
    for c in sorted(set(int(v) for v in cell)):
        m = cell == c
        rows.append(
            (
                c,
                int((m & ~is_delta).sum()),
                int((m & is_delta).sum()),
                int(ids[m & is_delta].sum()),
            )
        )
    return values_sql(
        rows,
        [
            ("cell_id", "BIGINT"),
            ("n_base", "BIGINT"),
            ("n_delta", "BIGINT"),
            ("delta_id_sum", "BIGINT"),
        ],
    )


def main() -> None:
    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    n_emb = pq.read_metadata(f"{SF_DIR}/embeddings.parquet").num_rows
    summary_sql, reps_sql = golden_kmeans()
    parts = {
        "MINHASH_LSH_PAIRS_SQL": golden_minhash(),
        "NEAR_DUP_EMBEDDINGS_LSH_SQL": golden_near_dup_lsh(),
        "IVF_COSINE_TOPK_SQL": golden_ivf(),
        "KMEANS_EMBEDDINGS_SQL": summary_sql,
        "KMEANS_REPRESENTATIVES_SQL": reps_sql,
        "SEMDEDUP_PRUNE_SQL": golden_semdedup(),
        "PQ_COSINE_TOPK_SQL": golden_pq(),
        "MMR_DIVERSE_RERANK_SQL": golden_mmr(),
        "EMBEDDING_OUTLIERS_SQL": golden_embedding_outliers(),
        "PAGES_FLI_INTERPS_SQL": golden_pages_fli(),
        "MEDIA_FEATURES_SQL": golden_media_features(),
        "MEDIA_FRAME_SAMPLE_SQL": golden_media_frames(),
        "DOC_COMPRESSION_RATIO_SQL": golden_zratio(),
        "IVF_ADD_DELTA_SQL": golden_ivf_add_delta(),
    }
    with open(OUT, "w") as f:
        f.write(
            '"""GENERATED stored-golden oracles — do not edit by hand.\n'
            "\n"
            "Computed by tools/gen_op_goldens.py with an independent SERIAL\n"
            "path (no Ray) over the driver correctness inputs:\n"
            f"{SF_DIR} (documents={n_docs}, embeddings={n_emb} rows) and the\n"
            "fixed 600-page corpus.  Every covered operator is deterministic\n"
            "(seeded RNG / Q20 fixed-point reductions / fixed corpus), so\n"
            "these outputs are constants; the driver compare then verifies\n"
            "that the distributed composition reproduces serial semantics.\n"
            '"""\n\n'
        )
        for name, sql in parts.items():
            f.write(f"{name} = \"\"\"\n{sql}\n\"\"\"\n\n")
    sizes = {k: v.count("\n") + 1 for k, v in parts.items()}
    print("wrote", OUT, sizes)


if __name__ == "__main__":
    main()
