"""Multimodal column plumbing (SURVEY.md §2.10 ✚): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The container ships no image/audio libraries, so the actual decoders are
STUBBED (NotImplementedError behind an import-try, exactly as the build
contract requires) — but everything Spark-side is real and tested: the
schema, the binary payload column, the Arrow batch shapes, the
``mapInPandas`` signatures, and a deterministic fake feature extractor that
exercises the full pipeline end-to-end.

Scale design: payloads ride the same DataFrame partitions as everything
else; decode stages are per-row map work (no shuffle), and
``spark.sql.files.maxPartitionBytes`` / explicit ``repartition`` size the
Arrow batches so a partition of payloads fits executor memory.  For 100 TB
media archives, store payloads in parquet binary columns (small) or as
object-store URIs + a fetch inside the decode stage (large).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata accompanying every payload — the typed half of the multimodal column
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Derive a deterministic binary payload column (test surrogate for real
    media bytes): the utf-8 encoding of the source text."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real encoder: FEATURE_DIM floats in
    [0,1) from the md5 of the payload."""
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 256.0 for i in range(FEATURE_DIM)]


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real image decode — requires PIL, not shipped in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs Pillow; this environment stubs it — "
            "use extract_features(real=False) for the deterministic fake"
        ) from e
    raise NotImplementedError("wire Image.open(BytesIO(payload)) here")


def extract_features(media: DataFrame, real: bool = False) -> DataFrame:
    """Feature extraction over payload batches via mapInPandas (Arrow).

    ``real=True`` routes to the stubbed decoder (raises in this container);
    the default exercises the identical plumbing with deterministic fakes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(p) if real else _fake_features(bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


FRAME_BYTES = 64

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("n_frame_bytes", LongType(), False),
        StructField("frame_md5", StringType(), False),
    ]
)


def decode_y4m_frames(payload: bytes):
    """REAL video decode, stdlib-only: parse a YUV4MPEG2 (.y4m) container
    — a plain-text stream header (``YUV4MPEG2 W<w> H<h> ...``) followed
    by ``FRAME``-delimited raw planar frames — and yield each frame's
    pixel bytes.  4:2:0 (the y4m default, 3·w·h/2 bytes/frame) and 4:4:4
    are supported; compressed codecs (H.264 etc.) still need ffmpeg and
    fail loudly here.

    With :func:`decode_wav_pcm16` (audio) and :func:`decode_bmp_rgb24`
    (image) this closes the loop: every modality has one genuinely
    decoded container format through the SAME Arrow stage as its
    oracle-checked deterministic fake."""
    data = bytes(payload)
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", errors="strict")
    fields = header.split(" ")
    if fields[0] != "YUV4MPEG2":
        raise ValueError("decode_y4m_frames: not a YUV4MPEG2 stream")
    w = h = None
    cs = "420"
    for f in fields[1:]:
        if f.startswith("W"):
            w = int(f[1:])
        elif f.startswith("H"):
            h = int(f[1:])
        elif f.startswith("C"):
            cs = f[1:]
    if not w or not h:
        raise ValueError("decode_y4m_frames: missing W/H in stream header")
    if cs.startswith("420"):
        frame_bytes = w * h * 3 // 2
    elif cs.startswith("444"):
        frame_bytes = w * h * 3
    else:
        raise ValueError(f"decode_y4m_frames: unsupported chroma C{cs}")
    pos = nl + 1
    while pos < len(data):
        if not data.startswith(b"FRAME", pos):
            raise ValueError("decode_y4m_frames: missing FRAME marker")
        pos = data.index(b"\n", pos) + 1  # frame header may carry params
        frame = data[pos : pos + frame_bytes]
        if len(frame) != frame_bytes:
            raise ValueError("decode_y4m_frames: truncated frame")
        yield frame
        pos += frame_bytes


def _decode_frames(payload: bytes, real: bool):
    """Frame iterator.  real=True parses the payload as an uncompressed
    YUV4MPEG2 container (:func:`decode_y4m_frames`, stdlib-only;
    compressed codecs need ffmpeg and fail loudly); the fake treats the
    payload as a sequence of FRAME_BYTES-byte frames — deterministic, so
    the whole one-to-many Arrow stage is oracle-checkable."""
    if real:
        yield from decode_y4m_frames(payload)
        return
    for i in range(0, len(payload), FRAME_BYTES):
        yield payload[i : i + FRAME_BYTES]


def frame_sample(
    media: DataFrame, every_n: int = 3, real: bool = False
) -> DataFrame:
    """Video frame sampling: one output row per SAMPLED frame (every
    ``every_n``-th) — the one-to-many mapInPandas shape (input batch of
    payloads -> larger output batch of frames) that real video pipelines
    use.  Row explosion happens inside the Arrow stage, so no Spark-side
    explode over opaque bytes; partitions grow by ~len(payload) /
    (FRAME_BYTES * every_n) — size input partitions accordingly.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for fno, frame in enumerate(_decode_frames(bytes(payload), real)):
                    if fno % every_n == 0:
                        rows.append(
                            (
                                mid,
                                fno,
                                len(frame),
                                hashlib.md5(frame).hexdigest(),
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "n_frame_bytes", "frame_md5"]
            )

    return media.mapInPandas(run, FRAMES_SCHEMA)


CHUNK_BYTES = 256

AUDIO_CHUNKS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("chunk_no", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sum_abs_amp", LongType(), False),
        StructField("energy", LongType(), False),
        StructField("peak_amp", LongType(), False),
    ]
)


def decode_wav_pcm16(payload: bytes):
    """REAL audio decode, stdlib-only: parse a RIFF/WAV container with
    ``wave`` and return its 16-bit PCM samples as int64 (multi-channel
    audio comes back interleaved — one flat sample sequence, which is what
    the chunked loudness stats window over).

    This is the one genuinely decodable modality in a container without
    media libraries; compressed formats still need soundfile/ffmpeg and
    fail loudly here (``wave`` rejects non-PCM WAV)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"decode_wav_pcm16: expected 16-bit PCM, got "
                f"{8 * w.getsampwidth()}-bit"
            )
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2").astype(np.int64)


def audio_chunk_features(
    media: DataFrame, chunk_bytes: int = CHUNK_BYTES, real: bool = False
) -> DataFrame:
    """Audio feature extraction: payload -> per-chunk loudness stats, the
    windowed-frame shape of a real audio front end (VAD, loudness
    normalization, silence trimming all consume exactly this relation).

    real=True DECODES the payload as a 16-bit PCM WAV file with the
    stdlib ``wave`` module (:func:`decode_wav_pcm16` — no media library
    needed); the fake treats the payload as unsigned 8-bit PCM centered
    at 128.  Both paths feed the SAME per-chunk integer aggregates
    (count, sum |amp|, sum amp^2, peak) — no float audio math — so the
    fake keeps the one-to-many Arrow stage oracle-checkable bit-for-bit
    while the real path proves the identical plumbing on genuinely
    decoded audio.  One output row per ``chunk_bytes`` window (samples
    per chunk for the real path), exploded inside the Arrow batch like
    :func:`frame_sample`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if real:
                    amps = decode_wav_pcm16(payload)
                else:
                    amps = np.frombuffer(
                        bytes(payload), dtype=np.uint8
                    ).astype(np.int64) - 128
                for cno in range(0, len(amps), chunk_bytes):
                    c = amps[cno : cno + chunk_bytes]
                    rows.append(
                        (
                            mid,
                            cno // chunk_bytes,
                            len(c),
                            int(np.abs(c).sum()),
                            int((c * c).sum()),
                            int(np.abs(c).max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "chunk_no",
                    "n_samples",
                    "sum_abs_amp",
                    "energy",
                    "peak_amp",
                ],
            )

    return media.mapInPandas(run, AUDIO_CHUNKS_SCHEMA)


def resize_thumbnail_bmp(
    payload: bytes, width: int, height: int
) -> bytes:
    """REAL image resize, stdlib+numpy only: decode an uncompressed
    24-bit BMP (:func:`decode_bmp_rgb24`), nearest-neighbor sample to
    (height, width), and emit a GRAYSCALE thumbnail (integer ITU-R 601
    luma, (299r + 587g + 114b) // 1000 — all-integer, deterministic) so
    the output honors the stage's fixed width*height-byte contract.
    PNG/JPEG still need PIL and fail loudly in the decoder."""
    import numpy as np

    px = decode_bmp_rgb24(payload)  # (h, w, 3) uint8
    h, w = px.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    sampled = px[ys][:, xs].astype(np.int64)
    luma = (
        299 * sampled[:, :, 0] + 587 * sampled[:, :, 1] + 114 * sampled[:, :, 2]
    ) // 1000
    return luma.astype(np.uint8).tobytes()


def resize_image(
    media: DataFrame, width: int = 8, height: int = 8, real: bool = False
) -> DataFrame:
    """Image resize stage: payload -> fixed-size payload (width*height
    bytes).  real=True decodes uncompressed 24-bit BMPs and emits a
    nearest-neighbor grayscale thumbnail (:func:`resize_thumbnail_bmp` —
    no imaging library; other formats fail loudly); the fake
    truncates/zero-pads — deterministic, same schema/batch shape, so the
    downstream contract (fixed n_bytes, binary column preserved through
    Arrow) is tested with and without real pixels."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                resized = [
                    resize_thumbnail_bmp(bytes(p), width, height)
                    for p in pdf["payload"]
                ]
            else:
                resized = [
                    bytes(p)[:target].ljust(target, b"\x00")
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": resized,
                    "n_bytes": [target] * len(resized),
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_px", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
        StructField("peak_luma", LongType(), False),
    ]
)


def decode_bmp_rgb24(payload: bytes):
    """REAL image decode, stdlib-only: parse an uncompressed 24-bit BMP
    (BITMAPINFOHEADER) with ``struct`` and return an (h, w, 3) uint8 RGB
    array.  BMP is the one mainstream image container decodable without
    an imaging library — fixed headers, raw BGR rows, bottom-up with
    4-byte row padding; PNG/JPEG still need PIL and fail loudly via
    :func:`decode_image`."""
    import struct

    import numpy as np

    buf = bytes(payload)
    if buf[:2] != b"BM":
        raise ValueError("decode_bmp_rgb24: missing BM magic")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"decode_bmp_rgb24: need uncompressed 24-bit BMP, got "
            f"bpp={bpp} compression={compression}"
        )
    bottom_up = height > 0
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = []
    for r in range(h):
        src = h - 1 - r if bottom_up else r
        row = np.frombuffer(
            buf, dtype=np.uint8, count=width * 3, offset=data_off + src * stride
        ).reshape(width, 3)
        rows.append(row[:, ::-1])  # BGR -> RGB
    return np.stack(rows)


def image_pixel_stats(media: DataFrame, real: bool = False) -> DataFrame:
    """Image branch of the multimodal family: payload -> per-image channel
    statistics (pixel count, per-channel sums, peak luma) through the
    Arrow mapInPandas stage — the normalize/threshold front end of an
    image pipeline consumes exactly this relation.

    ``real=True`` decodes the payload as an uncompressed 24-bit BMP with
    the stdlib (:func:`decode_bmp_rgb24`); the fake reads consecutive
    payload byte TRIPLES as (r, g, b) pixels.  Both paths feed the same
    integer aggregates, so the fake keeps the stage oracle-checkable
    bit-for-bit while the real path proves identical plumbing on
    genuinely decoded pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if real:
                    px = decode_bmp_rgb24(bytes(payload)).reshape(-1, 3)
                else:
                    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                    px = buf[: 3 * (len(buf) // 3)].reshape(-1, 3)
                px = px.astype(np.int64)
                luma = px.sum(axis=1)
                rows.append(
                    (
                        int(mid),
                        px.shape[0],
                        int(px[:, 0].sum()),
                        int(px[:, 1].sum()),
                        int(px[:, 2].sum()),
                        int(luma.max()) if px.shape[0] else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_px", "sum_r", "sum_g", "sum_b", "peak_luma",
                ],
            )

    return media.mapInPandas(run, IMAGE_STATS_SCHEMA)
