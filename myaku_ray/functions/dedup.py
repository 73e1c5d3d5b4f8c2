"""Near-duplicate detection family over ``documents``: MinHash+LSH,
SimHash, n-gram Jaccard.

All hashing is deterministic (blake2b/md5-derived, never Python
``hash()``).

Scale shapes:
- MinHash: per-batch signature computation (vectorized over permutations),
  explode to (band, bucket) rows, ``groupby`` bucket -> candidate pairs,
  then DISTRIBUTED exact-Jaccard verification: shingle sets are extracted
  by a second predicate-pushdown pass over candidate endpoints only and
  shuffled by pair id to a ``groupby(pair)`` verify stage — the driver
  holds only (doc_id_a, doc_id_b) id pairs (result-sized), never texts or
  shingle sets.
- SimHash: per-doc 63-bit signature via tf-weighted bit voting over
  md5-derived token hashes (md5 so the DuckDB oracle can recompute the
  signature exactly); pair stage buckets by the 4 sub-bands
  (16/16/16/15 bits — pigeonhole: hamming<=3 pairs agree on >=1 band) and
  verifies hamming in-group, so it is EXACT for the <=3 radius while only
  ever comparing within buckets.
- n-gram Jaccard: word-3-gram shingle sets; within each ``source`` block
  candidate pairs come from a shingle inverted index (co-occurrence
  counting — cost O(sum_s df_s^2) pair increments instead of the block
  quadratic; identical output because jaccard>=t requires intersection
  >= 1).  SQL-checkable in DuckDB via list_intersect.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

N_PERM = 64
LSH_BANDS = 16          # 16 bands x 4 rows
LSH_ROWS = N_PERM // LSH_BANDS
JACCARD_THRESHOLD = 0.5
NGRAM = 3
NGRAM_JACCARD_THRESHOLD = 0.12
SIMHASH_BITS = 63       # fits signed int64 on both numpy and DuckDB sides
SIMHASH_HAMMING_MAX = 3
SIMHASH_BAND_STARTS = (0, 16, 32, 48)  # 16/16/16/15-bit bands

_MERSENNE = (1 << 61) - 1


def _perm_params(n: int = N_PERM) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameters for n universal-hash permutations."""
    rng = np.random.default_rng(0xD0D0)
    a = rng.integers(1, _MERSENNE, size=n, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingles(text: str) -> set:
    """Distinct word-3-gram shingles.  The short-doc edge (< 3 tokens) pads
    with '' exactly like the SQL oracle's coalesce(toks[i+k], '')."""
    toks = text.split(" ")
    n = len(toks)
    hi = max(n - NGRAM + 1, 1)
    return {
        " ".join(
            [
                toks[i],
                toks[i + 1] if i + 1 < n else "",
                toks[i + 2] if i + 2 < n else "",
            ]
        )
        for i in range(hi)
    }


_TOKEN_HASH_CACHE: dict[str, int] = {}
_SHINGLE_MIX_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier
# P^2 mod 2^64, precomputed in exact Python ints: identical to the uint64
# wraparound product but without tripping numpy's overflow warning
_SHINGLE_MIX_P2 = np.uint64(
    (int(_SHINGLE_MIX_P) * int(_SHINGLE_MIX_P)) % (1 << 64)
)


def _token_hash(tok: str) -> int:
    """md5-derived 64-bit token hash, cached per process (zipf tokens
    repeat massively; the cache turns per-shingle hashing into a few
    dict hits + numpy)."""
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        if len(_TOKEN_HASH_CACHE) > 2_000_000:
            _TOKEN_HASH_CACHE.clear()
        _TOKEN_HASH_CACHE[tok] = h
    return h


def _shingle_hashes(text: str) -> np.ndarray:
    """Distinct 64-bit hashes of the word-3-gram shingles, computed as a
    vectorized polynomial mix over cached per-TOKEN hashes (one numpy
    pass per doc instead of one digest per shingle).  Set semantics
    (sizes, intersections — hence every Jaccard) match the string
    shingles up to 64-bit collisions; MinHash signatures and LSH bands
    build on these values directly."""
    toks = text.split(" ")
    n = len(toks)
    hi = max(n - NGRAM + 1, 1)
    T = np.fromiter(
        (_token_hash(t) for t in toks), dtype=np.uint64, count=n
    )
    if n < hi + NGRAM - 1:  # short doc: pad with hash('') like the oracle
        T = np.concatenate(
            [T, np.full(hi + NGRAM - 1 - n, _token_hash(""), dtype=np.uint64)]
        )
    mixed = (
        T[:hi] * _SHINGLE_MIX_P2
        + T[1 : hi + 1] * _SHINGLE_MIX_P
        + T[2 : hi + 2]
    )
    return np.unique(mixed)


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    h = _shingle_hashes(text)
    if len(h) == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    # (a*h + b) mod p for each permutation, min over shingles — vectorized
    hv = (h.astype(np.uint64))[:, None]
    vals = (hv * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


def minhash_lsh_pairs(sf_dir: str, threshold: float = JACCARD_THRESHOLD):
    """MinHash+LSH candidate generation -> exact-Jaccard verified pairs.

    Verification is a distributed stage: candidate endpoints are re-read
    with predicate pushdown, each doc's shingle-hash set is serialized
    once per pair it participates in, and a ``groupby(pair)`` computes the
    exact Jaccard where the two sets meet.  Driver state is bounded by
    the candidate PAIR IDS (16 bytes each — the same order as the final
    result), never by texts or shingle sets; at extreme dup-cluster skew
    the per-doc fan-out (cluster_size - 1 copies of its shingle set)
    would switch to a cluster-local verify inside the bucket groups."""
    a, b = _perm_params()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bands(batch: pa.Table) -> pa.Table:
        """(band, bucket, doc_id) rows, one per doc x band.

        Bucket keys are a vectorized polynomial mix of the band's minhash
        values (not a per-chunk blake2b): any deterministic function of
        the band values works — a rare mix collision only ADDS candidate
        pairs, which exact verification then rejects, so the output is
        unchanged while the stage is pure numpy after the signatures."""
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        if not texts:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "bucket": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        sigs = np.stack([minhash_signature(t, a, b) for t in texts])
        # (n_docs, LSH_BANDS, LSH_ROWS) -> polynomial mix over the rows axis
        chunks = sigs.reshape(len(texts), LSH_BANDS, LSH_ROWS)
        mix = np.zeros((len(texts), LSH_BANDS), dtype=np.uint64)
        P = np.uint64(0x9E3779B97F4A7C15)
        for r in range(LSH_ROWS):
            mix = mix * P + chunks[:, :, r]
            mix ^= mix >> np.uint64(29)
        bucket = (mix & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
        band = np.broadcast_to(
            np.arange(LSH_BANDS, dtype=np.int32), bucket.shape
        )
        return pa.table(
            {
                "band": pa.array(band.ravel(), pa.int32()),
                "bucket": pa.array(bucket.ravel(), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, LSH_BANDS), pa.int64()),
            }
        )

    # Candidate generation: almost every (band, bucket) group is a
    # singleton, so a per-group map_groups call pays ~n_docs x LSH_BANDS
    # Python invocations to discard them.  Instead: one Arrow-native
    # COUNT aggregate finds the colliding buckets (result-sized), their
    # combined keys broadcast as a sorted array, and a vectorized
    # np.isin filter keeps only rows inside collisions — the driver then
    # expands pairs over that result-sized remainder.  The uint64
    # key-combine may wrap; a wrap collision only lets EXTRA rows
    # through the filter, and the exact (band, bucket) pair expansion
    # below drops them, so output is unchanged.
    from ray.data.aggregate import Count

    # 3 ints per (doc, band) — tiny next to the corpus; pin it so the
    # count pass and the membership pass don't re-hash the texts
    band_rows = ds.map_batches(bands, batch_format="pyarrow").materialize()

    def _combine(band: np.ndarray, bucket: np.ndarray) -> np.ndarray:
        return bucket.astype(np.uint64) * np.uint64(LSH_BANDS) + band.astype(
            np.uint64
        )

    counts = (
        band_rows.groupby(["band", "bucket"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    hot = counts[counts["n"] >= 2]
    hot_keys = np.sort(
        _combine(hot["band"].to_numpy(), hot["bucket"].to_numpy())
    )
    hot_ref = ray.put(hot_keys)

    def in_hot_bucket(batch: pa.Table) -> pa.Table:
        keys = _combine(
            batch["band"].to_numpy(zero_copy_only=False),
            batch["bucket"].to_numpy(zero_copy_only=False),
        )
        mask = np.zeros(len(keys), dtype=bool)
        hk = ray.get(hot_ref)
        if len(hk):
            idx = np.searchsorted(hk, keys)
            idx[idx == len(hk)] = 0
            mask = hk[idx] == keys
        return batch.filter(pa.array(mask))

    member = band_rows.map_batches(
        in_hot_bucket, batch_format="pyarrow"
    ).to_pandas()
    pairs_set: set[tuple[int, int]] = set()
    for (_, _), g in member.groupby(["band", "bucket"]):
        ids = sorted(set(int(x) for x in g["doc_id"]))
        pairs_set.update(
            (x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]
        )
    cand = pd.DataFrame(
        sorted(pairs_set), columns=["doc_id_a", "doc_id_b"]
    ).astype(np.int64)
    empty = pd.DataFrame(
        {"doc_id_a": pd.Series(dtype=np.int64),
         "doc_id_b": pd.Series(dtype=np.int64),
         "jaccard": pd.Series(dtype=np.float64)}
    )
    if len(cand) == 0:
        return empty

    # ---- distributed exact verification --------------------------------
    # doc -> the pairs it participates in (ids only; broadcast once)
    doc_pairs: dict[int, list[tuple[int, int]]] = {}
    for x, y in zip(cand["doc_id_a"].astype(int), cand["doc_id_b"].astype(int)):
        doc_pairs.setdefault(x, []).append((x, y))
        doc_pairs.setdefault(y, []).append((x, y))
    routing_ref = ray.put(doc_pairs)

    import pyarrow.dataset as pads

    need = sorted(doc_pairs)
    endpoint_tbl = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(need)
    )
    endpoints = rd.from_arrow(endpoint_tbl)

    def emit_shingles(batch: pa.Table) -> pa.Table:
        routing = ray.get(routing_ref)
        pa_, pb_, did_, blob_ = [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = _shingle_hashes(text).tobytes()
            for (x, y) in routing.get(int(did), ()):
                pa_.append(x)
                pb_.append(y)
                did_.append(int(did))
                blob_.append(sh)
        return pa.table(
            {
                "doc_id_a": pa.array(pa_, pa.int64()),
                "doc_id_b": pa.array(pb_, pa.int64()),
                "doc_id": pa.array(did_, pa.int64()),
                "shingles": pa.array(blob_, pa.binary()),
            }
        )

    def verify_pair(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) != 2:
            return pd.DataFrame(
                {"doc_id_a": [], "doc_id_b": [], "jaccard": []}
            ).astype({"doc_id_a": np.int64, "doc_id_b": np.int64,
                      "jaccard": np.float64})
        sa = set(np.frombuffer(g["shingles"].iloc[0], dtype=np.uint64).tolist())
        sb = set(np.frombuffer(g["shingles"].iloc[1], dtype=np.uint64).tolist())
        inter = len(sa & sb)
        union = len(sa | sb)
        j = inter / union if union else 0.0
        if j < threshold:
            return pd.DataFrame(
                {"doc_id_a": [], "doc_id_b": [], "jaccard": []}
            ).astype({"doc_id_a": np.int64, "doc_id_b": np.int64,
                      "jaccard": np.float64})
        return pd.DataFrame(
            {
                "doc_id_a": [int(g["doc_id_a"].iloc[0])],
                "doc_id_b": [int(g["doc_id_b"].iloc[0])],
                "jaccard": [j],
            }
        )

    verified = (
        endpoints.map_batches(emit_shingles, batch_format="pyarrow")
        .groupby(["doc_id_a", "doc_id_b"])
        .map_groups(verify_pair, batch_format="pandas")
    ).to_pandas()
    if len(verified) == 0:
        return empty
    return verified.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash — oracle-replicable signatures + exact hamming<=3 pair stage
# ---------------------------------------------------------------------------

_BIT_IDX = np.arange(SIMHASH_BITS, dtype=np.uint64)
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount for uint64 arrays (numpy<2 has no bit_count)."""
    shape = x.shape
    return _POP8[np.ascontiguousarray(x).view(np.uint8)].reshape(
        *shape, 8
    ).sum(axis=-1)


def _token_hash_bits(tokens: list[str]) -> np.ndarray:
    """(len(tokens), 63) sign matrix in {-1,+1} from md5 token hashes.

    md5 (not blake2b) so DuckDB can recompute the identical signature:
    the hash is the first 16 hex chars of md5 = the top 8 digest bytes,
    ('0x' || substr(md5(tok),1,16))::UBIGINT in SQL."""
    hs = np.array(
        [int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in tokens],
        dtype=np.uint64,
    )
    bits = (hs[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)
    return (2 * bits.astype(np.int64) - 1)


def _simhash_batch(batch: pa.Table) -> pa.Table:
    """Per-doc 63-bit SimHash: tf-weighted bit voting, vectorized over the
    batch's UNIQUE tokens (each token hashed once per batch)."""
    from collections import Counter

    texts = batch["text"].to_pylist()
    counters = [Counter(t.split(" ")) for t in texts]
    vocab = sorted(set().union(*counters)) if counters else []
    tok_idx = {t: i for i, t in enumerate(vocab)}
    signs = _token_hash_bits(vocab) if vocab else np.zeros((0, SIMHASH_BITS), np.int64)
    weights = np.uint64(1) << _BIT_IDX
    sigs = []
    for c in counters:
        idx = np.fromiter((tok_idx[t] for t in c), dtype=np.int64, count=len(c))
        tf = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        votes = tf @ signs[idx]
        sigs.append(int(weights[votes > 0].sum()))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(sigs, pa.int64()),
        }
    )


def simhash_docs(sf_dir: str):
    """63-bit SimHash per doc (tf-weighted bit voting over md5 token
    hashes) — exactly reproducible by the DuckDB oracle."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_simhash_batch, batch_format="pyarrow")


def simhash_pairs(sf_dir: str, hamming_max: int = SIMHASH_HAMMING_MAX):
    """All doc pairs with simhash hamming distance <= hamming_max.

    Banded and EXACT: signatures split into 4 bands (16/16/16/15 bits);
    <=3 differing bits can touch at most 3 bands, so every qualifying
    pair agrees exactly on >=1 band (pigeonhole) and is found by a
    ``groupby(band, key)`` — only in-bucket pairs are ever compared, the
    all-pairs quadratic never runs."""
    sigs = simhash_docs(sf_dir)

    def band_rows(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands_, keys_, dids_, sigs_ = [], [], [], []
        for bi, start in enumerate(SIMHASH_BAND_STARTS):
            width = (
                SIMHASH_BITS - start
                if bi == len(SIMHASH_BAND_STARTS) - 1
                else SIMHASH_BAND_STARTS[bi + 1] - start
            )
            key = (sig >> np.uint64(start)) & np.uint64((1 << width) - 1)
            bands_.append(np.full(len(ids), bi, dtype=np.int32))
            keys_.append(key.astype(np.int64))
            dids_.append(ids)
            sigs_.append(sig.astype(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands_), pa.int32()),
                "key": pa.array(np.concatenate(keys_), pa.int64()),
                "doc_id": pa.array(np.concatenate(dids_), pa.int64()),
                "simhash": pa.array(np.concatenate(sigs_), pa.int64()),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        sig = g["simhash"].to_numpy().astype(np.uint64)[order]
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"doc_id_a": [], "doc_id_b": [], "hamming": []}
            ).astype(np.int64)
        ham = _popcount64(sig[:, None] ^ sig[None, :])
        iu = np.triu_indices(n, k=1)
        ok = ham[iu] <= hamming_max
        return pd.DataFrame(
            {
                "doc_id_a": ids[iu[0][ok]].astype(np.int64),
                "doc_id_b": ids[iu[1][ok]].astype(np.int64),
                "hamming": ham[iu][ok].astype(np.int64),
            }
        )

    out = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
    ).to_pandas()
    # a pair can agree on several bands — one row per pair
    out = out.drop_duplicates(["doc_id_a", "doc_id_b"])
    return out.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)


_SIMHASH_SIG_CTE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, tok
), th AS (
  SELECT doc_id, tf, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM tf
), votes AS (
  SELECT doc_id, bb.b AS bit,
         sum(tf * (2 * ((h >> bb.b) & 1)::BIGINT - 1)) AS vote
  FROM th, (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS b) bb
  GROUP BY doc_id, bb.b
), sig AS (
  SELECT doc_id,
         sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
           AS simhash
  FROM votes GROUP BY doc_id
)
"""

SIMHASH_DOCS_SQL = _SIMHASH_SIG_CTE + """
SELECT doc_id, simhash FROM sig
"""

SIMHASH_PAIRS_SQL = _SIMHASH_SIG_CTE + f"""
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAMMING_MAX}
"""


def ngram_jaccard_pairs(sf_dir: str, threshold: float = NGRAM_JACCARD_THRESHOLD):
    """Word-3-gram Jaccard pairs within source blocks (SQL-checkable).

    In-group cost model: a shingle inverted index generates co-occurrence
    counts — O(sum over shingles of df^2) pair increments via one
    vectorized bincount, instead of the former O(n^2) set intersections
    (pairs sharing no shingle now cost nothing).  The exact-preserving
    J <= min/max size filter prunes jaccard computes.  A pathological
    block-hot shingle (df ~ block size) still costs df^2; the scale
    valve is routing through MinHash-LSH candidates first."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def shingle_batch(batch: pa.Table) -> pa.Table:
        """Per-doc UNIQUE shingle-hash blob — the heavy text hashing runs
        data-parallel here instead of serially inside each source group
        (whose concurrency is capped by source cardinality)."""
        blobs = [
            np.unique(_shingle_hashes(t)).tobytes()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "shingles": pa.array(blobs, pa.binary()),
            }
        )

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(zip(g["doc_id"].astype(int), g["shingles"]))
        uniqs = [np.frombuffer(blob, dtype=np.uint64) for _, blob in docs]
        n = len(docs)
        sizes = np.fromiter((len(u) for u in uniqs), dtype=np.int64, count=n)
        out = {"doc_id_a": [], "doc_id_b": [], "jaccard_r": []}
        if n >= 2 and sizes.sum():
            # sort-based inverted index: (shingle, doc) rows sorted by
            # shingle; equal-shingle runs are the posting lists
            all_h = np.concatenate(uniqs)
            all_d = np.repeat(np.arange(n, dtype=np.int64), sizes)
            order = np.argsort(all_h, kind="stable")
            h = all_h[order]
            d = all_d[order]
            rs = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
            rl = np.diff(np.r_[rs, len(h)])
            pair_keys: list[np.ndarray] = []
            for s, m in zip(rs[rl >= 2], rl[rl >= 2]):
                arr = d[s : s + m]
                iu = np.triu_indices(m, k=1)
                pair_keys.append(arr[iu[0]] * n + arr[iu[1]])
            if pair_keys:
                keys = np.concatenate(pair_keys)
                uniq, inter = np.unique(keys, return_counts=True)
                ia = uniq // n
                ib = uniq % n
                la = sizes[ia]
                lb = sizes[ib]
                jac = np.round(inter / (la + lb - inter), 6)
                ok = jac >= threshold
                for i, j, v in zip(ia[ok], ib[ok], jac[ok]):
                    out["doc_id_a"].append(docs[i][0])
                    out["doc_id_b"].append(docs[j][0])
                    out["jaccard_r"].append(float(v))
        return pd.DataFrame(out)

    res = (
        ds.map_batches(shingle_batch, batch_format="pyarrow")
        .groupby("source")
        .map_groups(pairs_of_group, batch_format="pandas")
    )
    return res


NGRAM_JACCARD_SQL = None  # defined below from _NGRAM_PAIRS_CTE (single source)


# ---------------------------------------------------------------------------
# Repeated-span detection (exact substring-level dedup, à la Lee et al.
# "Deduplicating Training Data Makes Language Models Better": find exact
# token windows that recur across documents so they can be cut or the
# docs down-weighted).  Reference has no analog; this is a training-data
# op over the generic documents table.
# ---------------------------------------------------------------------------

SPAN_WIDTH = 8    # tokens per window
SPAN_STRIDE = 4   # window start stride
SPAN_MIN_DOCS = 2


def duplicate_spans(
    sf_dir: str,
    width: int = SPAN_WIDTH,
    stride: int = SPAN_STRIDE,
    min_docs: int = SPAN_MIN_DOCS,
):
    """Exact ``width``-token windows (every ``stride`` tokens) that occur
    in >= ``min_docs`` distinct documents.

    Scale shape: the map side emits one row per DISTINCT (span_hash,
    doc_id) — in-batch combined via np.unique, with the per-doc
    occurrence count carried as a payload — so the only exchange is a
    ``groupby(span_hash)`` over 24-byte rows; span text never crosses
    the shuffle.  Hashes are md5-derived 63-bit ints so the DuckDB
    oracle recomputes them exactly.  Window generation is fully
    vectorized: one split_pattern, one flattened token take per batch
    (start indices by numpy arithmetic), one binary_join to rebuild the
    span strings."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Min, Sum

    from myaku_ray.functions.hashkit import md5_u64_str

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def spans(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "span_hash": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "occ": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        flat = toks.flatten()
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        offsets = np.concatenate([[0], np.cumsum(n_tok)])[:-1]
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        # window start positions per doc: 0, stride, ... while s+width<=n
        n_win = np.maximum(n_tok - width, -stride) // stride + 1
        total = int(n_win.sum())
        if total == 0:
            return empty
        win_doc = np.repeat(np.arange(len(n_tok)), n_win)
        # position of each window within its doc
        first = np.concatenate([[0], np.cumsum(n_win)])[:-1]
        local = (np.arange(total) - np.repeat(first, n_win)) * stride
        starts = offsets[win_doc] + local
        # (total, width) token index matrix -> span strings via one join.
        # Offsets computed in int64 first: a silent int32 wrap on an
        # oversized batch would corrupt spans; fail loudly instead.
        idx = starts[:, None] + np.arange(width)[None, :]
        words = flat.take(pa.array(idx.ravel(), pa.int64()))
        offs64 = np.arange(total + 1, dtype=np.int64) * width
        if offs64[-1] > np.iinfo(np.int32).max:
            raise ValueError(
                f"duplicate_spans batch too large: {total} windows x "
                f"width {width} overflows int32 list offsets — lower "
                "the map_batches batch_size"
            )
        lists = pa.ListArray.from_arrays(
            pa.array(offs64.astype(np.int32), pa.int32()), words
        )
        span_strs = pc.binary_join(lists, " ")
        hashes = (
            md5_u64_str(span_strs) & np.uint64(0x7FFF_FFFF_FFFF_FFFF)
        ).astype(np.int64)
        # in-batch combine to distinct (span_hash, doc_id) + occurrence
        # count: docs never span batches, so these rows are globally
        # distinct and Count == n_docs downstream
        key_doc = doc_ids[win_doc]
        order = np.lexsort((key_doc, hashes))
        h_s, d_s = hashes[order], key_doc[order]
        new = np.empty(total, dtype=bool)
        new[0] = True
        new[1:] = (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])
        idx_first = np.flatnonzero(new)
        occ = np.diff(np.append(idx_first, total))
        return pa.table(
            {
                "span_hash": pa.array(h_s[idx_first]),
                "doc_id": pa.array(d_s[idx_first]),
                "occ": pa.array(occ.astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(spans, batch_format="pyarrow")
        .groupby("span_hash")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("occ", alias_name="n_occ"),
            Min("doc_id", alias_name="min_doc_id"),
        )
    )

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch["n_docs"], pa.scalar(min_docs))
        )

    return agg.map_batches(keep, batch_format="pyarrow")


DUPLICATE_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
spans AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(unnest(list_transform(
        generate_series(1, greatest(len(w) - {SPAN_WIDTH} + 1, 0), {SPAN_STRIDE}),
        i -> array_to_string(w[i:i+{SPAN_WIDTH - 1}], ' ')))), 1, 16))::UBIGINT
      & 9223372036854775807::UBIGINT AS BIGINT) AS span_hash
  FROM toks
)
SELECT span_hash,
  count(DISTINCT doc_id) AS n_docs,
  count(*) AS n_occ,
  min(doc_id) AS min_doc_id
FROM spans
GROUP BY span_hash
HAVING count(DISTINCT doc_id) >= {SPAN_MIN_DOCS}
"""


# ---------------------------------------------------------------------------
# Near-duplicate clusters: connected components over the n-gram-Jaccard
# pair graph via alternating large-star / small-star contraction
# (Kiveris et al., "Connected Components in MapReduce and Beyond") —
# each round is two groupby shuffles over the EDGE set only, converging
# in O(log n) rounds, so no component, however large, is ever
# materialized in one task's memory.  DuckDB oracle: transitive closure
# by recursive CTE over the same pair SQL.
# ---------------------------------------------------------------------------

DUP_CLUSTER_MAX_ROUNDS = 20
# Edge-count bound for solving components on the driver: 16 bytes/edge
# => ~80 MB driver state at the limit.  Above it, the alternating-star
# distributed loop below handles arbitrarily large graphs.  Same
# driver/distributed scale-switch idiom as dedup_exact.
DUP_CLUSTERS_DRIVER_LIMIT = 5_000_000


def _driver_components(a: np.ndarray, b: np.ndarray):
    """Vectorized connected components over an edge list: min-label
    relaxation + pointer jumping, O(log n) numpy rounds, no Python
    per-edge work.  Node labels are indices into the ascending-sorted
    unique node array, so the component label maps back to the
    component's MINIMUM doc_id — identical semantics to the distributed
    star contraction."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        lmin = np.minimum(label[ea], label[eb])
        new = label.copy()
        np.minimum.at(new, ea, lmin)
        np.minimum.at(new, eb, lmin)
        while True:
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        if np.array_equal(new, label):
            break
        label = new
    return nodes, nodes[label]


def _star_round(edges, which: str):
    """One large-star or small-star contraction over an (a, b) edge
    dataset.  Emits the canonical a < b orientation."""

    def contract(g: pd.DataFrame) -> pd.DataFrame:
        u = int(g["node"].iloc[0])
        nbrs = np.unique(g["nbr"].to_numpy())
        if which == "large":
            # attach u's LARGER neighbors to min(N(u) + {u})
            m = min(int(nbrs[0]), u)
            out = nbrs[nbrs > u]
            if len(out) == 0:
                return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
            return pd.DataFrame(
                {"a": np.full(len(out), m, dtype=np.int64), "b": out}
            )
        # small-star: attach u's SMALLER neighbors (and u) to their min
        small = nbrs[nbrs <= u]
        if len(small) == 0:
            return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
        m = min(int(small[0]), u)
        members = np.unique(np.append(small, u))
        members = members[members != m]
        if len(members) == 0:
            return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
        return pd.DataFrame(
            {"a": np.full(len(members), m, dtype=np.int64), "b": members}
        )

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "nbr": pa.array(np.concatenate([b, a])),
            }
        )

    if which == "large":
        src = edges.map_batches(both_dirs, batch_format="pyarrow")
    else:
        # small-star reads each edge at its larger endpoint only
        def upper(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            hi = np.maximum(a, b)
            lo = np.minimum(a, b)
            return pa.table({"node": pa.array(hi), "nbr": pa.array(lo)})

        src = edges.map_batches(upper, batch_format="pyarrow")
    out = src.groupby("node").map_groups(contract, batch_format="pandas")

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo != hi
        return pa.table({"a": pa.array(lo[keep]), "b": pa.array(hi[keep])})

    return out.map_batches(canon, batch_format="pyarrow")


def _edge_sig(edges) -> tuple[int, int]:
    """Order-independent (count, xor-of-row-hashes) signature of an edge
    dataset — a distributed convergence check that never collects rows."""
    from ray.data.aggregate import AggregateFn

    def sig(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = (a * np.uint64(0x9E3779B97F4A7C15) + b) | np.uint64(1)
        x = np.bitwise_xor.reduce(mix) if len(mix) else np.uint64(0)
        return pa.table(
            {
                "n": pa.array([len(a)], pa.int64()),
                "x": pa.array([int(x) - (1 << 63)], pa.int64()),
            }
        )

    parts = edges.map_batches(sig, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    x = 0
    for p in parts:
        x ^= p["x"] + (1 << 63)
    return n, x


def dup_clusters(
    sf_dir: str,
    threshold: float = NGRAM_JACCARD_THRESHOLD,
    driver_limit: int = DUP_CLUSTERS_DRIVER_LIMIT,
):
    """(doc_id, cluster_id) for every document in at least one near-dup
    pair; cluster_id is the component's minimum doc_id.  The near-dup
    EDGE set is result-sized; when it fits the driver bound the
    components solve in one vectorized pass (_driver_components), else
    the alternating star contraction runs distributed (see module
    comment) with only the edge dataset + an O(1) signature as loop
    state.  Both paths are output-identical (pytest-equality-gated)."""
    pairs = ngram_jaccard_pairs(sf_dir, threshold=threshold)

    def init_edges(batch: pa.Table) -> pa.Table:
        a = batch["doc_id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"a": pa.array(np.minimum(a, b)), "b": pa.array(np.maximum(a, b))}
        )

    # materialize BEFORE the first signature: the pair-mining lineage is
    # the operator's dominant cost and must execute exactly once (an
    # unmaterialized dataset recomputes per consumption)
    edges = pairs.map_batches(init_edges, batch_format="pyarrow").materialize()
    prev = _edge_sig(edges)
    if prev[0] == 0:  # no near-dup pairs at all
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "cluster_id": pd.Series([], dtype=np.int64),
            }
        )
    if prev[0] <= driver_limit:
        pdf = edges.to_pandas()
        nodes, comp = _driver_components(
            pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)
        )
        return pd.DataFrame({"doc_id": nodes, "cluster_id": comp})
    for _ in range(DUP_CLUSTER_MAX_ROUNDS):
        edges = _star_round(edges, "large")
        edges = _star_round(edges, "small").materialize()
        cur = _edge_sig(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("dup_clusters: star contraction did not converge")

    # converged state is a set of stars (root, member); emit members and
    # the roots themselves
    def emit(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([b, a])),
                "cluster_id": pa.array(np.concatenate([a, a])),
            }
        )

    from ray.data.aggregate import Min

    return (
        edges.map_batches(emit, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
    )


_NGRAM_PAIRS_CTE = f"""
sh AS (
  SELECT doc_id, source,
    list_distinct(list_transform(
      generate_series(1, greatest(len(string_split(text,' ')) - {NGRAM - 1}, 1)),
      i -> string_split(text,' ')[i] || ' ' || coalesce(string_split(text,' ')[i+1], '')
           || ' ' || coalesce(string_split(text,' ')[i+2], '')
    )) AS shingles
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
    round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard_r
  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.shingles, b.shingles)) > 0
    AND round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))), 6)
        >= {NGRAM_JACCARD_THRESHOLD}::DOUBLE
)
"""

# ONE shingle/pair definition: ngram_jaccard_pairs' oracle and
# dup_clusters' recursive-closure oracle must always mine the same pairs
NGRAM_JACCARD_SQL = f"""
WITH {_NGRAM_PAIRS_CTE}
SELECT doc_id_a, doc_id_b, jaccard_r FROM pairs
"""

DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_NGRAM_PAIRS_CTE},
und AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION
  SELECT doc_id_b, doc_id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
)
SELECT a AS doc_id, least(a, min(b)) AS cluster_id
FROM reach GROUP BY a
"""


# ---------------------------------------------------------------------------
# Per-doc novelty: fraction of a doc's shingles first seen in that doc
# ---------------------------------------------------------------------------

NOVELTY_WIDTH = 5


def shingle_novelty(sf_dir: str, width: int = NOVELTY_WIDTH):
    """Per document: how many distinct word-``width``-gram shingles it
    contains, and how many of those are NOVEL — first seen (by min
    doc_id) in this document.  The curriculum/dedup signal: a doc whose
    shingles all appeared earlier adds no new content.

    Scale shape (same bound as ``duplicate_spans``): the map side emits
    one row per DISTINCT (shingle_hash, doc_id) — stride-1 windows,
    in-batch deduped via lexsort — materialized ONCE so the two
    aggregates that need them (per-doc counts; per-shingle first-doc)
    do not re-tokenize the corpus.  Exchange 1 is a
    ``groupby(span_hash) -> Min(doc_id)`` over 16-byte rows; exchange 2
    re-keys THAT aggregate (shingle-vocabulary-sized) by winner doc.
    Shingle identity is the md5-prefix 63-bit hash of the span string,
    so the DuckDB oracle's DISTINCT-on-string agrees up to 64-bit
    collisions (~2^-64 per pair).  Docs shorter than ``width`` tokens
    emit no shingles and are absent from the output — matching the
    oracle's empty generate_series.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Min

    from myaku_ray.functions.hashkit import md5_u64_str

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "span_hash": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        flat = toks.flatten()
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        offsets = np.concatenate([[0], np.cumsum(n_tok)])[:-1]
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_win = np.maximum(n_tok - width + 1, 0)
        total = int(n_win.sum())
        if total == 0:
            return empty
        win_doc = np.repeat(np.arange(len(n_tok)), n_win)
        first = np.concatenate([[0], np.cumsum(n_win)])[:-1]
        local = np.arange(total) - np.repeat(first, n_win)
        starts = offsets[win_doc] + local
        idx = starts[:, None] + np.arange(width)[None, :]
        words = flat.take(pa.array(idx.ravel(), pa.int64()))
        offs64 = np.arange(total + 1, dtype=np.int64) * width
        if offs64[-1] > np.iinfo(np.int32).max:
            raise ValueError(
                f"shingle_novelty batch too large: {total} windows x "
                f"width {width} overflows int32 list offsets — lower "
                "the map_batches batch_size"
            )
        lists = pa.ListArray.from_arrays(
            pa.array(offs64.astype(np.int32), pa.int32()), words
        )
        span_strs = pc.binary_join(lists, " ")
        hashes = (
            md5_u64_str(span_strs) & np.uint64(0x7FFF_FFFF_FFFF_FFFF)
        ).astype(np.int64)
        key_doc = doc_ids[win_doc]
        order = np.lexsort((key_doc, hashes))
        h_s, d_s = hashes[order], key_doc[order]
        new = np.empty(total, dtype=bool)
        new[0] = True
        new[1:] = (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])
        return pa.table(
            {
                "span_hash": pa.array(h_s[new]),
                "doc_id": pa.array(d_s[new]),
            }
        )

    # the pairs ARE the working set for both aggregates; materialize so
    # the corpus is tokenized once (the rows are the same 16-byte stream
    # duplicate_spans ships through its exchange)
    p = ds.map_batches(pairs, batch_format="pyarrow").materialize()

    per_doc = (
        p.groupby("doc_id")
        .aggregate(Count(alias_name="n_shingles"))
        .to_pandas()
    )
    novel = (
        p.groupby("span_hash")
        .aggregate(Min("doc_id", alias_name="first_doc"))
        .groupby("first_doc")
        .aggregate(Count(alias_name="n_novel"))
        .to_pandas()
        .rename(columns={"first_doc": "doc_id"})
    )
    out = per_doc.merge(novel, on="doc_id", how="left")
    out["n_novel"] = out["n_novel"].fillna(0).astype(np.int64)
    out["n_shingles"] = out["n_shingles"].astype(np.int64)
    return (
        out[["doc_id", "n_shingles", "n_novel"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SHINGLE_NOVELTY_SQL = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents),
sh AS (
  SELECT doc_id, array_to_string(a[i:i+{NOVELTY_WIDTH - 1}], ' ') AS s
  FROM docs,
    unnest(generate_series(1, greatest(len(a) - {NOVELTY_WIDTH - 1}, 0)))
      AS t(i)),
ds AS (SELECT DISTINCT doc_id, s FROM sh),
firsts AS (SELECT s, min(doc_id) AS fd FROM ds GROUP BY s),
per AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM ds
        GROUP BY doc_id),
nov AS (SELECT fd AS doc_id, count(*)::BIGINT AS n_novel FROM firsts
        GROUP BY fd)
SELECT per.doc_id, per.n_shingles,
       coalesce(nov.n_novel, 0)::BIGINT AS n_novel
FROM per LEFT JOIN nov USING (doc_id)
ORDER BY per.doc_id
"""


# ---------------------------------------------------------------------------
# Near-dedup survivor materialization (the end-to-end cleaning gate)
# ---------------------------------------------------------------------------

# Loser doc_ids broadcast as a sorted array into the survivor scan; in a
# heavily duplicated corpus the loser set is corpus-fraction-sized, so
# past this bound the filter must switch to a doc_id-keyed semi-join
# (one hash-bucket exchange) instead of a broadcast.
SURVIVOR_BROADCAST_LIMIT = 50_000_000


def near_dedup_survivors(sf_dir: str):
    """Documents remaining after near-duplicate removal: from every
    n-gram-Jaccard duplicate cluster keep only the minimum doc_id (the
    cluster representative); all unclustered docs survive untouched.
    This is the composition a training-data pipeline actually runs —
    ``ngram_jaccard_pairs`` -> ``dup_clusters`` -> anti-join — exposed
    as one operator so the end-to-end gate itself is oracled.

    Plan: the cluster table is pair-participant-sized (result-sized at
    sane dup rates); its losers broadcast once as a sorted int64 array
    and ONE column-pruned documents scan drops them map-side (see
    SURVIVOR_BROADCAST_LIMIT for the semi-join switch).  No shuffle
    beyond what the pair mining already does.
    """
    clusters = dup_clusters(sf_dir)
    losers = np.sort(
        clusters.loc[
            clusters["doc_id"] != clusters["cluster_id"], "doc_id"
        ].to_numpy(np.int64)
    )
    l_ref = ray.put(losers)

    def keep_survivors(batch: pa.Table) -> pa.Table:
        lo = ray.get(l_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(lo):
            pos = np.searchsorted(lo, ids)
            pos[pos == len(lo)] = 0
            drop = lo[pos] == ids
        else:
            drop = np.zeros(len(ids), dtype=bool)
        return batch.filter(pa.array(~drop))

    out = (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "source", "n_chars"],
        )
        .map_batches(keep_survivors, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


NEAR_DEDUP_SURVIVORS_SQL = f"""
WITH RECURSIVE {_NGRAM_PAIRS_CTE},
und AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION
  SELECT doc_id_b, doc_id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
),
clusters AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
ORDER BY d.doc_id
"""
