"""Vectorized oracle-compatible hashing.

Several operators key on ``md5(CAST(id AS VARCHAR))`` because the DuckDB
oracle can recompute the identical value (HLL registers, the
deterministic sampler).  md5 has no numpy kernel, so the batch path runs
the expression through an embedded DuckDB connection — the same C++
vectorized kernel the oracle uses, ~2x faster than a per-row
``hashlib`` loop — with a pure-``hashlib`` fallback that is bit-equal
(property-tested in ``tests/test_property_new_ops.py``).

One connection per worker process, created lazily (Ray map tasks run
one at a time per worker, so no locking is needed).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_DUCK = None


def _hashlib_md5_u64(ids: np.ndarray, hexchars: int) -> np.ndarray:
    md5 = hashlib.md5
    fb = int.from_bytes
    nbytes = hexchars // 2
    return np.fromiter(
        (
            fb(md5(s.encode()).digest()[:nbytes], "big")
            for s in map(str, ids.tolist())
        ),
        dtype=np.uint64,
        count=len(ids),
    )


def md5_u64(ids: np.ndarray, hexchars: int = 16) -> np.ndarray:
    """uint64 value of the first ``hexchars`` hex chars of
    ``md5(str(int(id)))`` — bit-identical to DuckDB's
    ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, hexchars))::UBIGINT``."""
    assert hexchars in (8, 16) and hexchars % 2 == 0
    if len(ids) == 0:
        return np.empty(0, dtype=np.uint64)
    global _DUCK
    try:
        import duckdb

        if _DUCK is None:
            _DUCK = duckdb.connect()
        t = pa.table({"id": pa.array(np.asarray(ids), pa.int64())})  # noqa: F841
        q = (
            f"SELECT ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, {hexchars}))"
            "::UBIGINT AS h FROM t"
        )
        out = _DUCK.execute(q).arrow()["h"].to_numpy(zero_copy_only=False)
        return out.astype(np.uint64)
    except ImportError:
        return _hashlib_md5_u64(np.asarray(ids), hexchars)


def md5_u64_str(strings: pa.Array, hexchars: int = 16) -> np.ndarray:
    """uint64 value of the first ``hexchars`` hex chars of ``md5(s)`` for a
    pyarrow string array — bit-identical to DuckDB's
    ``('0x' || substr(md5(s), 1, hexchars))::UBIGINT``.  Same embedded-
    DuckDB vectorized kernel as :func:`md5_u64`, hashlib fallback."""
    assert hexchars in (8, 16)
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if len(strings) == 0:
        return np.empty(0, dtype=np.uint64)
    global _DUCK
    try:
        import duckdb

        if _DUCK is None:
            _DUCK = duckdb.connect()
        t = pa.table({"s": strings})  # noqa: F841
        q = (
            f"SELECT ('0x' || substr(md5(s), 1, {hexchars}))"
            "::UBIGINT AS h FROM t"
        )
        out = _DUCK.execute(q).arrow()["h"].to_numpy(zero_copy_only=False)
        return out.astype(np.uint64)
    except ImportError:
        md5 = hashlib.md5
        fb = int.from_bytes
        nbytes = hexchars // 2
        return np.fromiter(
            (
                fb(md5(s.encode()).digest()[:nbytes], "big")
                for s in strings.to_pylist()
            ),
            dtype=np.uint64,
            count=len(strings),
        )


def ares_key(h: np.ndarray, w: np.ndarray) -> np.ndarray:
    """A-Res weighted-sampling key ``ln((h+0.5)/2^64)/w`` for uint64 md5
    values ``h`` and positive float weights ``w`` (Efraimidis & Spirakis
    2006: rank by ``u^(1/w)`` ⇔ by ``ln(u)/w``; the +0.5 keeps u in
    (0,1) exactly).  Computed through embedded DuckDB so the doubles
    are BIT-IDENTICAL to the oracle's ``ln(...)/w`` expression — numpy's
    libm ln differs from DuckDB's at the last ulp (measured ~1e-17),
    which a hash compare would see.  numpy fallback without duckdb."""
    if len(h) == 0:
        return np.empty(0, dtype=np.float64)
    global _DUCK
    try:
        import duckdb

        if _DUCK is None:
            _DUCK = duckdb.connect()
        t = pa.table(
            {
                "h": pa.array(np.asarray(h, dtype=np.uint64), pa.uint64()),
                "w": pa.array(np.asarray(w, dtype=np.float64), pa.float64()),
            }
        )  # noqa: F841
        q = (
            "SELECT ln((CAST(h AS DOUBLE)+0.5)/18446744073709551616.0)/w"
            " AS k FROM t"
        )
        return _DUCK.execute(q).arrow()["k"].to_numpy(zero_copy_only=False)
    except ImportError:
        u = (np.asarray(h, dtype=np.float64) + 0.5) / 2.0**64
        return np.log(u) / np.asarray(w, dtype=np.float64)
