"""Multimodal column plumbing (EXTENSION).

Images/audio/video are opaque ``binary`` columns beside typed metadata
(modality, mime, width/height/duration). The Spark-side contract —
schema, partition-sized Arrow batches, UDF signatures — is real and
tested. The decode step is pluggable per operator via ``decode_stub``:

- ``decode_stub=None`` (default) auto-detects: the real PIL decoder
  when Pillow is importable, else the deterministic stub;
- ``decode_stub=True`` pins the stub (used by the oracled contract
  queries — their DuckDB oracles replay the stub arithmetic, which
  must not silently change when Pillow appears in the environment);
- ``decode_stub=False`` demands the real decoder and raises
  ImportError if Pillow is missing.

The real image path (``extract_media_features``/``resize_images``)
decodes via PIL inside the same ``mapInPandas`` seam; audio/video
decode needs ffmpeg, which this environment never provides, so those
modalities raise ``NotImplementedError`` in real mode (stub mode
serves them deterministically).

Scale design:
- media bytes ride in the row (parquet binary) only below
  ``INLINE_LIMIT``; bigger payloads should be external-object
  references (path + offset) so shuffles never move gigabyte blobs.
- decode/feature-extract is ``mapInPandas`` — per-partition Arrow
  batches, so a 1000-executor cluster decodes embarrassingly parallel
  with zero shuffle; only extracted features (small, typed) flow on.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

INLINE_LIMIT = 16 * 1024 * 1024  # bytes; larger media must be by-reference


def _pil_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _resolve_stub(decode_stub: bool | None) -> bool:
    """Map the tri-state ``decode_stub`` to a concrete choice. Resolved
    driver-side (cheap) so every executor batch takes the same branch."""
    if decode_stub is None:
        return not _pil_available()
    if decode_stub is False and not _pil_available():
        raise ImportError(
            "decode_stub=False requires Pillow (PIL) on driver and executors"
        )
    return decode_stub

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _decode_batch(batch: pd.DataFrame, decode_stub: bool) -> pd.DataFrame:
    import hashlib

    n_bytes = batch["payload"].map(lambda b: 0 if b is None else len(b))
    if len(batch) and int(n_bytes.max()) > INLINE_LIMIT:
        # blobs this big must be by-reference (path + offset), never
        # inline rows — raised executor-side so the check is free (no
        # extra pre-scan job)
        raise ValueError(
            f"payload exceeds INLINE_LIMIT ({INLINE_LIMIT}B); store by reference"
        )
    payload_hash = batch["payload"].map(
        lambda b: hashlib.md5(b or b"").hexdigest()
    )
    if decode_stub:
        # Deterministic fake decode: dimensions derived from content
        # size. The real decoder below replaces exactly this block;
        # everything around it — batch shape, schema, partitioning —
        # is the production path.
        width = (n_bytes % 1920 + 1).astype("int32")
        height = (n_bytes % 1080 + 1).astype("int32")
        n_frames = batch["modality"].map(
            {"image": 1, "audio": 0, "video": 30}
        ).fillna(0).astype("int32")
    else:
        import io

        from PIL import Image

        widths, heights, frames = [], [], []
        for modality, b in zip(batch["modality"], batch["payload"]):
            if modality != "image":
                raise NotImplementedError(
                    "real audio/video decode requires ffmpeg, unavailable here"
                )
            try:
                with Image.open(io.BytesIO(b or b"")) as img:
                    widths.append(img.width)
                    heights.append(img.height)
                    frames.append(int(getattr(img, "n_frames", 1)))
            except Exception:
                # Corrupt media is data, not a pipeline failure — at
                # corpus scale a poison payload must not kill the job.
                widths.append(None)
                heights.append(None)
                frames.append(None)
        width = pd.Series(widths, dtype="Int32", index=batch.index)
        height = pd.Series(heights, dtype="Int32", index=batch.index)
        n_frames = pd.Series(frames, dtype="Int32", index=batch.index)
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "modality": batch["modality"],
            "n_bytes": n_bytes.astype("int64"),
            "payload_hash": payload_hash,
            "width": width,
            "height": height,
            "n_frames": n_frames,
        }
    )


def extract_media_features(
    media: DataFrame, decode_stub: bool | None = None
) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas (Arrow
    batches per partition, no shuffle). ``decode_stub=None`` picks the
    real PIL image decoder when Pillow is importable (corrupt payloads
    yield NULL dimensions instead of failing the job), else the
    deterministic stub."""
    stub = _resolve_stub(decode_stub)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_batch(batch, stub)

    return media.mapInPandas(fn, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: bool | None = None
) -> DataFrame:
    """Resize image payloads to (width, height) via mapInPandas.

    Real path (Pillow importable, or ``decode_stub=False``): decode,
    ``resize((width, height))``, re-encode PNG; undecodable payloads
    produce a NULL output payload rather than failing the partition.
    Stub path: the output payload is a deterministic function of the
    input bytes and target size (md5-seeded repetition truncated to
    width*height//256 bytes) so tests can assert exact bytes. Batch
    shape, schema, and the no-shuffle partition-parallel plan are
    identical in both modes."""
    stub = _resolve_stub(decode_stub)

    def _real_resize(b):
        import io

        from PIL import Image

        try:
            with Image.open(io.BytesIO(b or b"")) as img:
                out = io.BytesIO()
                img.resize((width, height)).save(out, format="PNG")
                return out.getvalue()
        except Exception:
            return None

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        target = max(width * height // 256, 1)
        for batch in batches:
            batch = batch[batch["modality"] == "image"]
            if stub:
                payload = batch["payload"].map(
                    lambda b: (
                        hashlib.md5(b or b"").digest()
                        * (target // 16 + 1)
                    )[:target]
                )
            else:
                payload = batch["payload"].map(_real_resize)
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"].astype("int64"),
                    "width": pd.Series([width] * len(batch), dtype="int32", index=batch.index),
                    "height": pd.Series([height] * len(batch), dtype="int32", index=batch.index),
                    "payload": payload,
                }
            )

    return media.mapInPandas(fn, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, every_n: int = 10, decode_stub: bool = True
) -> DataFrame:
    """Sample every ``every_n``-th frame of each video payload — a
    row-exploding mapInPandas (one input video → many frame rows).

    Stub path: frame count is derived from the payload size (same rule
    as ``extract_media_features``) and each frame payload is a
    deterministic hash of (video bytes, frame index); a real
    implementation replaces the inner block with ffmpeg/pyav frame
    extraction. The explode happens executor-side: frames of one video
    never cross partitions, so downstream per-frame feature extraction
    stays shuffle-free."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for batch in batches:
            batch = batch[batch["modality"] == "video"]
            ids, idxs, payloads = [], [], []
            for mid, b in zip(batch["media_id"], batch["payload"]):
                if not decode_stub:  # pragma: no cover
                    raise NotImplementedError("real frame sampling requires ffmpeg")
                n_frames = 30  # stub: fixed fps window per video payload
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    # ASCII index suffix (not bytes([i])): replayable by
                    # a SQL oracle as md5(payload || CAST(i AS VARCHAR))
                    payloads.append(
                        hashlib.md5((b or b"") + str(i).encode()).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_payload": pd.Series(payloads, dtype=object),
                }
            )

    return media.mapInPandas(fn, FRAME_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the driver's documents table: treat the utf-8 text
    bytes as an opaque payload (deterministic, lets the multimodal path
    be exercised/oracled without binary fixtures)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
