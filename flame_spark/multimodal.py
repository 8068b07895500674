"""Multimodal column plumbing (training-data pipeline).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schemas, Arrow batch shapes, partitioning,
mapInPandas signatures — is real and tested; the actual media DECODE is
stubbed: the container has no image/audio libraries, so decoding is
gated behind an import-try (PIL/soundfile) and otherwise served by a
deterministic fake that parses this module's own synthetic header
format. Real deployments drop their decoder into ``decode_image`` /
``decode_audio`` without touching the Spark plumbing.

Synthetic blob format (deterministic, for tests + fakes):
  bytes 0-3   magic  b"FIMG" / b"FAUD" / b"FVID"
  bytes 4-7   width / sample-rate / n-frames   (uint32 LE)
  bytes 8-11  height / n-samples / fps         (uint32 LE)
  bytes 12+   payload (pseudo pixels / samples / frame offsets)
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # pragma: no cover - optional real decoder
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

IMAGE_MAGIC, AUDIO_MAGIC, VIDEO_MAGIC = b"FIMG", b"FAUD", b"FVID"

MEDIA_SCHEMA = (
    "media_id long, kind string, blob binary, source string"
)
META_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes long, ok boolean"
)


def make_blob(kind: str, a: int, b: int, media_id: int) -> bytes:
    """Deterministic synthetic blob (seeded by media_id)."""
    magic = {"image": IMAGE_MAGIC, "audio": AUDIO_MAGIC, "video": VIDEO_MAGIC}[kind]
    rng = np.random.default_rng(media_id)
    payload = rng.integers(0, 256, size=min(a * b, 4096), dtype=np.uint8)
    return magic + struct.pack("<II", a, b) + payload.tobytes()


def synthetic_media_df(spark, n: int = 100) -> DataFrame:
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        a, b = 32 + (i % 7) * 16, 24 + (i % 5) * 16
        rows.append((i, kind, bytearray(make_blob(kind, a, b, i)), f"src{i % 4}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def parse_header(blob: bytes) -> tuple[str | None, int, int]:
    if blob is None or len(blob) < 12:
        return None, 0, 0
    magic = bytes(blob[:4])
    kind = {IMAGE_MAGIC: "image", AUDIO_MAGIC: "audio", VIDEO_MAGIC: "video"}.get(magic)
    if kind is None:
        return None, 0, 0
    a, b = struct.unpack("<II", bytes(blob[4:12]))
    return kind, a, b


def decode_image(blob: bytes) -> np.ndarray:
    """Decode an image blob to an HxWx3 uint8 array.

    With PIL installed this would be ``np.asarray(Image.open(...))``;
    here the deterministic fake expands the synthetic payload. Raises
    NotImplementedError for real image bytes without a decoder.
    """
    kind, w, h = parse_header(blob)
    if kind == "image":
        rng = np.random.default_rng(int.from_bytes(bytes(blob[4:12]), "little"))
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if HAVE_PIL:  # pragma: no cover
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(bytes(blob))).convert("RGB"))
    raise NotImplementedError(
        "real image decoding requires PIL (not in this container)"
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas: blob -> typed metadata. One Arrow pass, no shuffle."""

    def batches(it):
        for pdf in it:
            metas = [parse_header(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m[0] for m in metas],
                    "width": [int(m[1]) for m in metas],
                    "height": [int(m[2]) for m in metas],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["blob"]],
                    "ok": [m[0] is not None for m in metas],
                }
            )

    return media.mapInPandas(batches, schema=META_SCHEMA)


def image_features(media: DataFrame, grid: int = 4) -> DataFrame:
    """Decode + pooled-grid feature extraction for image rows.

    Feature = grid x grid mean-pooled grayscale (flattened), the batch
    shape a real embedding model would consume. Runs in mapInPandas;
    non-image rows are filtered JVM-side BEFORE the Python stage so the
    decoder only sees its modality (predicate pushdown-friendly)."""

    def batches(it):
        for pdf in it:
            ids, feats = [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                img = decode_image(blob).astype(np.float64).mean(axis=2)
                h, w = img.shape
                gh, gw = max(h // grid, 1), max(w // grid, 1)
                pooled = [
                    float(img[r * gh : (r + 1) * gh, c * gw : (c + 1) * gw].mean())
                    for r in range(grid)
                    for c in range(grid)
                ]
                ids.append(mid)
                feats.append(pooled)
            yield pd.DataFrame({"media_id": ids, "features": feats})

    imgs = media.filter(F.col("kind") == "image")
    return imgs.mapInPandas(batches, schema="media_id long, features array<double>")


def frame_sample(media: DataFrame, every: int = 10) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame index
    (the real decoder would attach the frame bytes). Demonstrates the
    1-row -> N-rows mapInPandas shape used for frame extraction."""

    def batches(it):
        for pdf in it:
            out_ids, out_frames = [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                kind, n_frames, _fps = parse_header(blob)
                if kind != "video":
                    continue
                for fi in range(0, int(n_frames), every):
                    out_ids.append(mid)
                    out_frames.append(fi)
            yield pd.DataFrame({"media_id": out_ids, "frame_idx": out_frames})

    vids = media.filter(F.col("kind") == "video")
    return vids.mapInPandas(batches, schema="media_id long, frame_idx int")
