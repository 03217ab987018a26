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
- ``decode_stub=False`` demands the real decoder; the pure-Python
  container parsers need nothing, and an IMAGE row without Pillow
  raises ImportError executor-side (loud, never NULL-degraded).

The real image path (``extract_media_features``/``resize_images``)
decodes via PIL inside the same ``mapInPandas`` seam. Audio/video
METADATA decode is real too — pure-Python container-header parsing
(WAV RIFF fmt/data chunks, MP4 ISO-BMFF moov/mvhd/tkhd walks:
``parse_wav_header`` / ``parse_mp4_header``) needs no codec and runs
in the same batch path; corrupt containers yield NULL metadata, not
failures. Only SAMPLE-level decode (video frame extraction, PCM
resampling) genuinely requires ffmpeg/pyav, which this environment
never provides — ``sample_frames`` keeps its honest
``NotImplementedError`` in real mode (stub mode serves it
deterministically).

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
    driver-side (cheap) so every executor batch takes the same branch.
    ``decode_stub=False`` is honored even without Pillow: the real
    container parsers (WAV/MP4 metadata) are pure Python; only an
    actual IMAGE row then raises ImportError (executor-side, in the
    image branch) — audio/video-only corpora must not be hostage to an
    image codec."""
    if decode_stub is None:
        return not _pil_available()
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
        # real container metadata (audio sample rate; audio/video
        # duration) — NULL for images and in stub mode
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def parse_wav_header(b: bytes):
    """Parse a RIFF/WAVE container's metadata without any codec:
    returns ``(n_channels, sample_rate, bits_per_sample, n_frames)``
    from the fmt chunk + data chunk size (n_frames = data bytes //
    block align), or ``None`` when the bytes aren't a parseable WAV —
    corrupt media is data, never an exception. Walks chunks with RIFF
    word alignment (odd-sized chunks pad one byte)."""
    import struct

    try:
        if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        pos, fmt, data_size = 12, None, None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
            body = b[pos + 8 : pos + 8 + size]
            if cid == b"fmt " and len(body) >= 16:
                _tag, ch, rate = struct.unpack("<HHI", body[0:8])
                bits = struct.unpack("<H", body[14:16])[0]
                fmt = (ch, rate, bits)
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)
        if fmt is None or data_size is None:
            return None
        ch, rate, bits = fmt
        block = max(ch * (bits // 8), 1)
        return ch, rate, bits, data_size // block
    except Exception:
        return None


def parse_mp4_header(b: bytes):
    """Parse an ISO-BMFF (MP4/MOV) container's movie metadata without
    any codec: returns ``(timescale, duration, width, height)`` from
    the moov/mvhd box (v0 32-bit and v1 64-bit layouts) plus the first
    trak/tkhd's 16.16 fixed-point presentation size, or ``None`` when
    the bytes aren't a parseable MP4. Walks the box tree with 32-bit,
    64-bit (size==1) and to-end (size==0) box sizes."""
    import struct

    def boxes(start, end):
        pos = start
        while pos + 8 <= end:
            size = struct.unpack(">I", b[pos : pos + 4])[0]
            typ = b[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    return
                size = struct.unpack(">Q", b[pos + 8 : pos + 16])[0]
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                return
            yield typ, pos + hdr, pos + size
            pos += size

    try:
        timescale = duration = width = height = None
        for typ, s, e in boxes(0, len(b)):
            if typ != b"moov":
                continue
            for t2, s2, e2 in boxes(s, e):
                if t2 == b"mvhd" and e2 - s2 >= 20:
                    ver = b[s2]
                    if ver == 1 and e2 - s2 >= 32:
                        timescale = struct.unpack(">I", b[s2 + 20 : s2 + 24])[0]
                        duration = struct.unpack(">Q", b[s2 + 24 : s2 + 32])[0]
                    else:
                        timescale = struct.unpack(">I", b[s2 + 12 : s2 + 16])[0]
                        duration = struct.unpack(">I", b[s2 + 16 : s2 + 20])[0]
                elif t2 == b"trak" and width is None:
                    for t3, s3, e3 in boxes(s2, e2):
                        if t3 == b"tkhd" and e3 - s3 >= 8:
                            width = struct.unpack(">I", b[e3 - 8 : e3 - 4])[0] >> 16
                            height = struct.unpack(">I", b[e3 - 4 : e3])[0] >> 16
        if timescale is None:
            return None
        return timescale, duration, width, height
    except Exception:
        return None


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
        # is the production path. Container metadata (sample_rate,
        # duration_ms) is NULL in stub mode: faking it would let an
        # oracle pass without the parser ever running.
        width = (n_bytes % 1920 + 1).astype("int32")
        height = (n_bytes % 1080 + 1).astype("int32")
        n_frames = batch["modality"].map(
            {"image": 1, "audio": 0, "video": 30}
        ).fillna(0).astype("int32")
        sample_rate = pd.Series(
            [None] * len(batch), dtype="Int32", index=batch.index
        )
        duration_ms = pd.Series(
            [None] * len(batch), dtype="Int64", index=batch.index
        )
    else:
        import io

        widths, heights, frames, rates, durs = [], [], [], [], []
        for modality, b in zip(batch["modality"], batch["payload"]):
            w = h = nf = sr = dm = None
            raw = bytes(b or b"")
            # Corrupt/unparseable media is data, not a pipeline
            # failure — every branch degrades to NULL metadata; at
            # corpus scale a poison payload must not kill the job.
            # (A MISSING image codec is a pipeline failure though —
            # the PIL import below raises loudly, never NULLs.)
            if modality == "image":
                from PIL import Image

                try:
                    with Image.open(io.BytesIO(raw)) as img:
                        w, h = img.width, img.height
                        nf = int(getattr(img, "n_frames", 1))
                except Exception:
                    pass
            elif modality == "audio":
                parsed = parse_wav_header(raw)
                if parsed is not None:
                    _ch, rate, _bits, nfr = parsed
                    sr, nf = rate, nfr
                    dm = (nfr * 1000) // rate if rate else None
            elif modality == "video":
                parsed = parse_mp4_header(raw)
                if parsed is not None:
                    ts, dur, w, h = parsed
                    if ts and dur is not None:
                        dm = (dur * 1000) // ts
            widths.append(w)
            heights.append(h)
            frames.append(nf)
            rates.append(sr)
            durs.append(dm)
        width = pd.Series(widths, dtype="Int32", index=batch.index)
        height = pd.Series(heights, dtype="Int32", index=batch.index)
        n_frames = pd.Series(frames, dtype="Int32", index=batch.index)
        sample_rate = pd.Series(rates, dtype="Int32", index=batch.index)
        duration_ms = pd.Series(durs, dtype="Int64", index=batch.index)
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "modality": batch["modality"],
            "n_bytes": n_bytes.astype("int64"),
            "payload_hash": payload_hash,
            "width": width,
            "height": height,
            "n_frames": n_frames,
            "sample_rate": sample_rate,
            "duration_ms": duration_ms,
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


def synthesize_wav(data: bytes, n_channels: int, sample_rate: int) -> bytes:
    """Build a minimal valid 16-bit PCM RIFF/WAVE container around
    ``data`` (truncated to a whole number of sample frames): RIFF
    header + fmt chunk + data chunk = 44 bytes + payload. A real
    container the parser genuinely walks — used by tests and the
    contract fixture, where the ORACLE predicts the parser's output
    from this construction rule (n_frames = usable bytes // block
    align, duration_ms = n_frames·1000 // rate)."""
    import struct

    block = n_channels * 2
    data = data[: len(data) - len(data) % block]
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, n_channels, sample_rate, sample_rate * block, block, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synthesize_mp4(duration_s: int, width: int, height: int) -> bytes:
    """Build a minimal valid ISO-BMFF skeleton: ftyp + moov(mvhd v0 +
    trak(tkhd)) with timescale 600, duration ``duration_s``·600, and
    16.16 fixed-point presentation size — 232 bytes total, constant by
    construction (the contract oracle relies on that). No media data:
    this is the metadata surface ``parse_mp4_header`` reads."""
    import struct

    unity = (0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    mvhd_body = (
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 600)
        + struct.pack(">I", duration_s * 600)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", *unity)
        + b"\x00" * 24
        + struct.pack(">I", 2)
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    tkhd_body = (
        b"\x00\x00\x00\x07"
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)
        + b"\x00" * 4
        + struct.pack(">I", duration_s * 600)
        + b"\x00" * 8
        + struct.pack(">HHH", 0, 0, 0)
        + b"\x00" * 2
        + struct.pack(">9I", *unity)
        + struct.pack(">II", width << 16, height << 16)
    )
    tkhd = struct.pack(">I", 8 + len(tkhd_body)) + b"tkhd" + tkhd_body
    trak = struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
    moov = struct.pack(">I", 8 + len(mvhd) + len(trak)) + b"moov" + mvhd + trak
    return ftyp + moov


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
