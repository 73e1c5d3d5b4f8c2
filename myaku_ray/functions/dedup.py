"""Near-duplicate detection family over ``documents``: MinHash+LSH,
SimHash, n-gram Jaccard.

All hashing is deterministic (blake2b-derived, never Python ``hash()``).

Scale shapes:
- MinHash: per-batch signature computation (vectorized over permutations),
  explode to (band, bucket) rows, ``groupby`` bucket -> candidate pairs,
  exact-Jaccard verification on the candidates only.
- SimHash: per-doc 64-bit signature via tf-weighted bit voting; bucket by
  the 4 x 16-bit sub-bands (pigeonhole: hamming<=3 pairs share a band).
- n-gram Jaccard: word-3-gram shingle sets, pairwise within ``source``
  blocks (bounded quadratic inside blocks) — SQL-checkable in DuckDB via
  list_intersect on distinct shingle lists.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

N_PERM = 64
LSH_BANDS = 16          # 16 bands x 4 rows
LSH_ROWS = N_PERM // LSH_BANDS
JACCARD_THRESHOLD = 0.5
NGRAM = 3
NGRAM_JACCARD_THRESHOLD = 0.12

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


def _shingle_hashes(text: str) -> np.ndarray:
    shingles = sorted(_shingles(text))
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = struct.unpack(
            "<Q", hashlib.blake2b(s.encode(), digest_size=8).digest()
        )[0]
    return out


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    h = _shingle_hashes(text)
    if len(h) == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    # (a*h + b) mod p for each permutation, min over shingles — vectorized
    hv = (h.astype(np.uint64))[:, None]
    vals = (hv * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


def minhash_lsh_pairs(sf_dir: str, threshold: float = JACCARD_THRESHOLD):
    """MinHash+LSH candidate generation -> exact-Jaccard verified pairs."""
    a, b = _perm_params()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bands(batch: pa.Table) -> pa.Table:
        rows = {"band": [], "bucket": [], "doc_id": []}
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = minhash_signature(text, a, b)
            for band in range(LSH_BANDS):
                chunk = sig[band * LSH_ROWS : (band + 1) * LSH_ROWS]
                bucket = struct.unpack(
                    "<Q",
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(),
                )[0] & 0x7FFF_FFFF_FFFF_FFFF
                rows["band"].append(band)
                rows["bucket"].append(bucket)
                rows["doc_id"].append(did)
        return pa.table(
            {
                "band": pa.array(rows["band"], pa.int32()),
                "bucket": pa.array(rows["bucket"], pa.int64()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
            }
        )

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(int(x) for x in g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"doc_id_a": [], "doc_id_b": []}).astype(np.int64)
        pairs = [(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]]
        return pd.DataFrame(pairs, columns=["doc_id_a", "doc_id_b"])

    cand = (
        ds.map_batches(bands, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(candidates, batch_format="pandas")
    ).to_pandas()
    cand = cand.drop_duplicates().reset_index(drop=True)
    if len(cand) == 0:
        return pd.DataFrame(
            {"doc_id_a": pd.Series(dtype=np.int64),
             "doc_id_b": pd.Series(dtype=np.int64),
             "jaccard": pd.Series(dtype=np.float64)}
        )

    # exact verification on the (small) candidate set — bounded driver work
    import pyarrow.dataset as pads

    need = sorted(set(cand["doc_id_a"]) | set(cand["doc_id_b"]))
    tbl = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(need)
    )
    shingles = {
        did.as_py(): set(_shingle_hashes(t.as_py()).tolist())
        for did, t in zip(tbl["doc_id"], tbl["text"])
    }
    out = {"doc_id_a": [], "doc_id_b": [], "jaccard": []}
    for x, y in zip(cand["doc_id_a"], cand["doc_id_b"]):
        sa, sb = shingles[int(x)], shingles[int(y)]
        inter = len(sa & sb)
        union = len(sa | sb)
        j = inter / union if union else 0.0
        if j >= threshold:
            out["doc_id_a"].append(int(x))
            out["doc_id_b"].append(int(y))
            out["jaccard"].append(j)
    return pd.DataFrame(out)


def simhash_docs(sf_dir: str):
    """64-bit SimHash per doc (tf-weighted bit voting over token hashes)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sh(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids, sigs = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            votes = np.zeros(64, dtype=np.int64)
            for tok, tf in Counter(text.split(" ")).items():
                h = struct.unpack(
                    "<Q", hashlib.blake2b(tok.encode(), digest_size=8).digest()
                )[0]
                bits = np.unpackbits(
                    np.frombuffer(struct.pack("<Q", h), dtype=np.uint8)
                ).astype(np.int64)
                votes += (2 * bits - 1) * tf
            sig = int("".join("1" if v > 0 else "0" for v in votes), 2)
            ids.append(did)
            sigs.append(sig & 0x7FFF_FFFF_FFFF_FFFF)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array(sigs, pa.int64()),
            }
        )

    return ds.map_batches(sh, batch_format="pyarrow")


def ngram_jaccard_pairs(sf_dir: str, threshold: float = NGRAM_JACCARD_THRESHOLD):
    """Word-3-gram Jaccard pairs within source blocks (SQL-checkable)."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(zip(g["doc_id"].astype(int), g["text"]))
        sets = [(did, _shingles(text)) for did, text in docs]
        out = {"doc_id_a": [], "doc_id_b": [], "jaccard_r": []}
        for i in range(len(sets)):
            da, sa = sets[i]
            for j in range(i + 1, len(sets)):
                db, sb = sets[j]
                inter = len(sa & sb)
                if inter == 0:
                    continue
                union = len(sa) + len(sb) - inter
                jac = round(inter / union, 6)
                if jac >= threshold:
                    out["doc_id_a"].append(da)
                    out["doc_id_b"].append(db)
                    out["jaccard_r"].append(jac)
        return pd.DataFrame(out)

    res = ds.groupby("source").map_groups(pairs_of_group, batch_format="pandas")
    return res


NGRAM_JACCARD_SQL = f"""
WITH sh AS (
  SELECT doc_id, source,
    list_distinct(list_transform(
      generate_series(1, greatest(len(string_split(text,' ')) - {NGRAM - 1}, 1)),
      i -> string_split(text,' ')[i] || ' ' || coalesce(string_split(text,' ')[i+1], '')
           || ' ' || coalesce(string_split(text,' ')[i+2], '')
    )) AS shingles
  FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard_r
FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.shingles, b.shingles)) > 0
  AND round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 6) >= {NGRAM_JACCARD_THRESHOLD}::DOUBLE
"""
