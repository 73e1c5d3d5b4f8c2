"""Multimodal (image/audio/video) stages over opaque binary columns.

The container has no image/audio codecs, so DECODING IS STUBBED with a
deterministic fake (documented per stage) — but everything Ray-side is
real and tested: binary-column schema, actor-pool ``map_batches`` stages
with model state loaded once per actor in ``__init__``, small batch sizes
for large payloads, and typed metadata output layouts.  Swapping the
stub for pillow/ffmpeg is a one-function change inside the actor.

The ``documents`` table stands in for a media manifest: each row's text
bytes (utf-8) play the role of an encoded media payload, with the media
type derived deterministically from the source column.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

_MEDIA_TYPES = ("image", "video", "audio")


def media_type_of_source(source: str) -> str:
    """Deterministic media type from the srcN name: N % 3 -> image/video/audio."""
    try:
        n = int(source[3:])
    except (ValueError, IndexError):
        n = 0
    return _MEDIA_TYPES[n % 3]
FEATURE_DIM = 16
FRAMES_PER_VIDEO = 4
# Large binary payloads: keep batches small so batch × concurrency fits
# in a worker heap (the real constraint for image/video columns).
MEDIA_BATCH_SIZE = 64


def _as_media(batch: pa.Table) -> pa.Table:
    """documents -> media manifest (media_id, media_type, payload:binary)."""
    texts = batch["text"].to_pylist()
    sources = batch["source"].to_pylist()
    payloads = [t.encode("utf-8") for t in texts]
    types = [media_type_of_source(s) for s in sources]
    return pa.table(
        {
            "media_id": batch["doc_id"],
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class MediaFeatureStage:
    """Actor-pool stage: decode + feature-extract per media item.

    ``__init__`` stands in for model load (once per actor — the pattern
    under test); ``__call__`` is vectorized over the batch.

    STUB: real decode would be pillow/torchvision/ffmpeg; here features
    are a deterministic blake2b expansion of the payload, and "decoded"
    dimensions derive from the byte length.  Deterministic per payload,
    so distributed results are reproducible and testable.
    """

    def __init__(self) -> None:
        # fake "model": a fixed projection matrix derived from a constant
        # seed, built once per actor (~the expensive load in real life)
        rng = np.random.default_rng(1234)
        self._proj = rng.standard_normal((32, FEATURE_DIM)).astype(np.float32)

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        # deterministic 32-byte digest -> float vector in [0, 1)
        d = hashlib.blake2b(payload, digest_size=32).digest()
        return np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        raw = np.stack([self._decode_stub(p) for p in payloads])
        # Batched "inference" — accumulated over the 32 input dims in a
        # FIXED order (32 vectorized fused steps) instead of one BLAS
        # gemm: gemm picks blocking by matrix shape, so its last-ulp
        # output would depend on the Ray batch size and rounding-boundary
        # rows would flip the 6th decimal vs the serial golden.  Each
        # step is elementwise, so the result is batch-shape-independent.
        proj64 = self._proj.astype(np.float64)
        raw64 = raw.astype(np.float64)
        feats64 = np.zeros((len(raw64), proj64.shape[1]), dtype=np.float64)
        for ki in range(proj64.shape[0]):
            feats64 += raw64[:, ki : ki + 1] * proj64[ki : ki + 1, :]
        feats = feats64.astype(np.float32)
        n_bytes = np.asarray([len(p) for p in payloads], dtype=np.int64)
        widths = (n_bytes % 1920).astype(np.int32)
        heights = (n_bytes % 1080).astype(np.int32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "n_bytes": pa.array(n_bytes),
                "width": pa.array(widths),
                "height": pa.array(heights),
                "feature": pa.array(
                    [row.tolist() for row in feats],
                    pa.list_(pa.float32(), FEATURE_DIM),
                ),
                # round-6 like every cross-engine float in this repo: the
                # stored-golden oracle compares exact values, and rounding
                # absorbs any last-ulp kernel-order difference
                "feat_norm": pa.array(
                    np.round(np.sqrt((feats64**2).sum(axis=1)), 6)
                ),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: sample N evenly-spaced frames from each video.

    STUB: a real implementation seeks keyframes with ffmpeg; here each
    "frame" is the deterministic digest of (payload, frame_index)."""

    def __init__(self, n_frames: int = FRAMES_PER_VIDEO) -> None:
        self._n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, types, fidx, frames = [], [], [], []
        for mid, mtype, payload in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mtype != "video":
                continue
            for j in range(self._n):
                ids.append(mid)
                types.append(mtype)
                fidx.append(j)
                frames.append(
                    hashlib.blake2b(
                        payload + j.to_bytes(4, "big"), digest_size=16
                    ).digest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "frame_index": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def media_meta_stats(sf_dir: str):
    """Per-media-type byte/volume stats through the binary manifest.
    Exact-oracle checkable: byte lengths are utf-8 lengths of text."""
    from ray.data.aggregate import Count, Max, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    media = ds.map_batches(_as_media, batch_format="pyarrow")

    def add_len(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # binary_length reads list offsets only — the payload bytes never
        # materialize into Python (they can be the dominant column size)
        n = pc.binary_length(batch["payload"].combine_chunks()).cast(pa.int64())
        return pa.table(
            {"media_type": batch["media_type"], "n_bytes": n}
        )

    return media.map_batches(add_len, batch_format="pyarrow").groupby(
        "media_type"
    ).aggregate(
        Count(alias_name="n_items"),
        Sum("n_bytes", alias_name="total_bytes"),
        Max("n_bytes", alias_name="max_bytes"),
    )


MEDIA_META_STATS_SQL = """
SELECT CASE CAST(substr(source, 4) AS INTEGER) % 3
         WHEN 0 THEN 'image' WHEN 1 THEN 'video' ELSE 'audio' END
         AS media_type,
       count(*) AS n_items,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents GROUP BY 1
"""


def media_features(sf_dir: str):
    """Feature extraction through the actor pool (stubbed decode);
    deterministic output, rows-only driver check."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    media = ds.map_batches(_as_media, batch_format="pyarrow")
    feats = media.map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
        num_cpus=1,
    )
    return feats.select_columns(
        ["media_id", "media_type", "n_bytes", "width", "height", "feat_norm"]
    )


def hex_frames(batch: pa.Table) -> pa.Table:
    """Driver-facing projection: frame bytes -> hex string.

    The binary ``frame`` column stays the pipeline format (a sink would
    write it as-is); the hex projection exists because the value-hash
    compare path cannot canonicalize BLOB columns (pandas sort over
    bytearray), and one hexlify over the concatenated fixed-width buffer
    is vectorized."""
    import binascii

    arr = batch["frame"].combine_chunks()
    if len(arr):
        # slice the offsets at arr.offset — a sliced array's buffers
        # still cover the parent, and ignoring the offset would cut
        # record i's hex from record (i - offset)'s byte range
        offsets = np.frombuffer(
            arr.buffers()[1], dtype=np.int32, count=len(arr) + arr.offset + 1
        )[arr.offset :]
        hex_all = binascii.hexlify(arr.buffers()[2].to_pybytes()).decode()
        out = [
            hex_all[offsets[i] * 2 : offsets[i + 1] * 2]
            for i in range(len(arr))
        ]
    else:
        out = []
    return pa.table(
        {
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "frame_index": batch["frame_index"],
            "frame_hex": pa.array(out, pa.string()),
        }
    )


def media_frame_sample(sf_dir: str):
    """Frame sampling for video items (stubbed decode); stored-golden
    driver check over the hex projection."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    media = ds.map_batches(_as_media, batch_format="pyarrow")
    return media.map_batches(
        FrameSampleStage,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
        num_cpus=1,
    ).map_batches(hex_frames, batch_format="pyarrow")
