"""Multimodal plumbing (real Spark-side, stubbed decoders) and Structured
Streaming incremental operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_challenge_spark.operators import multimodal as mm
from data_engineering_challenge_spark.streaming import incremental as st


def test_multimodal_payload_and_features(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="hello world"), Row(doc_id=2, text="hello world"),
         Row(doc_id=3, text="different")]
    )
    media = mm.attach_payload(docs, "doc_id", "text")
    feats = mm.extract_features(media).collect()
    assert {r.media_id for r in feats} == {1, 2, 3}
    by_id = {r.media_id: r for r in feats}
    assert by_id[1].n_bytes == len("hello world")
    assert len(by_id[1].feature) == mm.FEATURE_DIM
    # deterministic: identical payloads -> identical features
    assert by_id[1].feature == by_id[2].feature
    assert by_id[1].feature != by_id[3].feature


def test_real_decoder_is_stubbed(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="x")])
    media = mm.attach_payload(docs, "doc_id", "text")
    with pytest.raises(Exception, match="(NotImplementedError|Pillow|stubs)"):
        mm.extract_features(media, real=True).collect()


@pytest.fixture()
def events_dir(spark, tmp_path):
    # events table has ns timestamps; streaming schema wants us — rebuild
    from data_engineering_challenge_spark import roles

    roles.load_events(spark, "/root/testdata/sf0.001").write.parquet(
        str(tmp_path / "events")
    )
    return str(tmp_path / "events")


def test_streaming_incremental_journeys(spark, events_dir, tmp_path):
    from data_engineering_challenge_spark import roles

    stream = st.read_events_stream(spark, events_dir)
    conversions = roles.conversions_from_events(
        roles.load_events(spark, "/root/testdata/sf0.001")
    )
    j = st.incremental_journeys(stream, conversions)
    st.run_available_now(j, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    got = spark.read.parquet(str(tmp_path / "out"))
    # must equal the batch as-of join row count
    from data_engineering_challenge_spark.operators.journeys import build_journeys

    sessions = roles.sessions_from_events(
        roles.load_events(spark, "/root/testdata/sf0.001")
    )
    expected = build_journeys(conversions, sessions).count()
    assert got.count() == expected


def test_streaming_daily_counts(spark, events_dir, tmp_path):
    stream = st.read_events_stream(spark, events_dir)
    agg = st.daily_counts(stream)
    st.run_available_now_complete(agg, str(tmp_path / "ckpt2"), "daily_counts_t")
    got = spark.sql("SELECT SUM(n_events) AS n FROM daily_counts_t").collect()[0].n
    assert got == 1000  # every event lands in exactly one day window


def test_streaming_sessionize(spark, events_dir, tmp_path):
    stream = st.read_events_stream(spark, events_dir)
    agg = st.sessionize_stream(stream)
    st.run_available_now_complete(agg, str(tmp_path / "ckpt3"), "sessions_t")
    total = spark.sql("SELECT SUM(n_events) AS n FROM sessions_t").collect()[0].n
    assert total == 1000
    # session windows must respect the 30-min gap: no window longer than
    # (n_events-1) * gap is checkable, but at minimum windows are disjoint
    # per user — verified by count conservation above.


def test_frame_sample_one_to_many(spark):
    """Every 3rd 64-byte frame per payload; frame counts follow payload
    length (the one-to-many Arrow batch shape)."""
    from pyspark.sql import Row

    from data_engineering_challenge_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [Row(doc_id=1, text="x" * 200), Row(doc_id=2, text="y" * 30)]
    )
    media = mm.attach_payload(df, "doc_id", "text", kind="video")
    frames = mm.frame_sample(media, every_n=3).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.media_id, []).append(r)
    # doc 1: 200 bytes -> frames 0..3 (64,64,64,8 bytes); sampled: 0, 3
    assert sorted(r.frame_no for r in by_doc[1]) == [0, 3]
    assert {r.frame_no: r.n_frame_bytes for r in by_doc[1]} == {0: 64, 3: 8}
    # doc 2: 30 bytes -> one frame, sampled
    assert [(r.frame_no, r.n_frame_bytes) for r in by_doc[2]] == [(0, 30)]


def test_audio_chunk_features_integer_stats(spark):
    """Chunk stats equal a direct python computation on the payload bytes;
    last chunk is short, not padded; real decode stays stubbed."""
    import pytest
    from pyspark.sql import Row

    from data_engineering_challenge_spark.operators import multimodal as mm

    text = "abc" * 100  # 300 bytes -> chunks of 256 and 44
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    media = mm.attach_payload(df, "doc_id", "text", kind="audio")
    got = {r.chunk_no: r for r in mm.audio_chunk_features(media).collect()}
    assert set(got) == {0, 1}
    assert (got[0].n_samples, got[1].n_samples) == (256, 44)
    payload = text.encode()
    for cno, r in got.items():
        amps = [b - 128 for b in payload[cno * 256 : cno * 256 + 256]]
        assert r.sum_abs_amp == sum(abs(a) for a in amps)
        assert r.energy == sum(a * a for a in amps)
        assert r.peak_amp == max(abs(a) for a in amps)
    # real=True on a non-WAV payload fails loudly at the container parse
    with pytest.raises(Exception):
        mm.audio_chunk_features(media, real=True).collect()


def test_audio_chunk_features_real_wav_decode(spark):
    """END-TO-END REAL DECODE, no media library: a synthetic 16-bit PCM
    WAV generated with the stdlib ``wave`` module flows through the SAME
    mapInPandas stage as the fake path (real=True), and the emitted chunk
    stats equal the fake-path integer formula applied to the decoded int16
    samples — the plumbing is proven on genuinely decoded audio, not just
    the deterministic fake."""
    import io
    import math
    import struct
    import wave

    from pyspark.sql import Row

    from data_engineering_challenge_spark.operators import multimodal as mm

    # 700 samples of a 440 Hz-ish sine at 8 kHz, 16-bit mono PCM
    samples = [
        int(12000 * math.sin(2 * math.pi * 440 * i / 8000)) for i in range(700)
    ]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    payload = buf.getvalue()

    media = spark.createDataFrame(
        [Row(media_id=1, kind="audio", payload=payload, n_bytes=len(payload))],
        mm.MEDIA_SCHEMA,
    )
    got = {
        r.chunk_no: r
        for r in mm.audio_chunk_features(media, chunk_bytes=256, real=True)
        .collect()
    }
    # 700 samples -> chunks of 256, 256, 188 (short last chunk, unpadded)
    assert {c: got[c].n_samples for c in got} == {0: 256, 1: 256, 2: 188}
    for cno, r in got.items():
        chunk = samples[cno * 256 : cno * 256 + 256]
        assert r.sum_abs_amp == sum(abs(a) for a in chunk)
        assert r.energy == sum(a * a for a in chunk)
        assert r.peak_amp == max(abs(a) for a in chunk)


def test_resize_fixed_output_bytes(spark):
    from pyspark.sql import Row

    from data_engineering_challenge_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [Row(doc_id=1, text="long " * 40), Row(doc_id=2, text="tiny")]
    )
    media = mm.attach_payload(df, "doc_id", "text")
    out = {r.media_id: r for r in mm.resize_image(media, 8, 8).collect()}
    assert all(r.n_bytes == 64 and len(r.payload) == 64 for r in out.values())
    assert bytes(out[2].payload)[:4] == b"tiny"  # content preserved, padded
    assert bytes(out[2].payload)[4:] == b"\x00" * 60


def _make_bmp(px_rows):
    """Minimal uncompressed 24-bit bottom-up BMP from [[(r,g,b),...],...]."""
    import struct

    h, w = len(px_rows), len(px_rows[0])
    stride = (w * 3 + 3) & ~3
    data = b""
    for row in reversed(px_rows):  # bottom-up storage
        rb = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR on disk
        data += rb + b"\x00" * (stride - 3 * w)
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return hdr + info + data


def test_bmp_decode_real_path_through_arrow_stage(spark):
    import numpy as np
    from pyspark.sql import Row

    from data_engineering_challenge_spark.operators import multimodal as mm

    px = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    bmp = _make_bmp(px)
    # direct decode: exact pixels back, RGB order, row order top-down
    arr = mm.decode_bmp_rgb24(bmp)
    assert arr.shape == (2, 3, 3)
    assert arr.tolist() == [[list(p) for p in row] for row in px]

    media = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=bytearray(bmp),
             n_bytes=len(bmp))]
    )
    got = mm.image_pixel_stats(media, real=True).collect()[0]
    flat = np.array(px).reshape(-1, 3)
    assert got.n_px == 6
    assert (got.sum_r, got.sum_g, got.sum_b) == tuple(
        int(flat[:, i].sum()) for i in range(3)
    )
    assert got.peak_luma == int(flat.sum(axis=1).max())

    # malformed payloads fail LOUD, not silently
    bad = spark.createDataFrame(
        [Row(media_id=2, kind="image", payload=bytearray(b"JFIF..."),
             n_bytes=7)]
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="BM magic"):
        mm.image_pixel_stats(bad, real=True).collect()


def test_image_stats_fake_path_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import Row

    from data_engineering_challenge_spark.operators import multimodal as mm

    payload = bytes(range(1, 32))  # 31 bytes -> 10 pixels + 1 trailing byte
    media = spark.createDataFrame(
        [Row(media_id=7, kind="image", payload=bytearray(payload),
             n_bytes=len(payload))]
    )
    got = mm.image_pixel_stats(media, real=False).collect()[0]
    px = np.frombuffer(payload, dtype=np.uint8)[:30].reshape(-1, 3).astype(int)
    assert got.n_px == 10
    assert (got.sum_r, got.sum_g, got.sum_b) == tuple(
        int(px[:, i].sum()) for i in range(3)
    )
    assert got.peak_luma == int(px.sum(axis=1).max())


def test_frame_sample_real_y4m_decode(spark):
    """END-TO-END REAL VIDEO DECODE, no media library: a synthetic
    YUV4MPEG2 (4:2:0) container flows through the SAME mapInPandas stage
    as the fake path (real=True); sampled frame numbers, sizes, and md5s
    must equal the directly-computed frame planes."""
    import hashlib

    from pyspark.sql import Row

    from data_engineering_challenge_spark.operators import multimodal as mm

    w, h, n_frames = 16, 8, 7
    fb = w * h * 3 // 2  # 4:2:0 plane bytes
    frames = [bytes((i * 37 + j) % 251 for j in range(fb)) for i in range(n_frames)]
    payload = b"YUV4MPEG2 W16 H8 F25:1 Ip A1:1 C420jpeg\n" + b"".join(
        b"FRAME\n" + f for f in frames
    )

    media = spark.createDataFrame(
        [Row(media_id=7, kind="video", payload=payload, n_bytes=len(payload))],
        mm.MEDIA_SCHEMA,
    )
    got = {
        r.frame_no: r
        for r in mm.frame_sample(media, every_n=2, real=True).collect()
    }
    assert sorted(got) == [0, 2, 4, 6]
    for fno, r in got.items():
        assert r.n_frame_bytes == fb
        assert r.frame_md5 == hashlib.md5(frames[fno]).hexdigest()

    # compressed/foreign payloads fail LOUDLY, not silently-empty
    bad = spark.createDataFrame(
        [Row(media_id=8, kind="video", payload=b"\x00\x01mp4?", n_bytes=6)],
        mm.MEDIA_SCHEMA,
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        mm.frame_sample(bad, every_n=2, real=True).collect()


def test_resize_real_bmp_thumbnail(spark):
    """REAL resize path: a 4x2 BMP with known colors nearest-neighbor
    sampled to 2x2 grayscale — expected luma computed by hand with the
    integer ITU-R 601 formula; wrong-format payloads fail loudly."""
    from pyspark.sql import Row

    from data_engineering_challenge_spark.operators import multimodal as mm

    # rows top-down: (r,g,b); 4 wide, 2 tall
    top = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    bot = [(0, 0, 0), (10, 20, 30), (100, 100, 100), (200, 0, 200)]
    payload = _make_bmp([top, bot])
    media = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=payload, n_bytes=len(payload))],
        mm.MEDIA_SCHEMA,
    )
    out = mm.resize_image(media, width=2, height=2, real=True).collect()[0]
    assert out.n_bytes == 4
    # nearest-neighbor with ys=(0,1), xs=(0,2): picks (0,0),(0,2),(1,0),(1,2)
    def luma(r, g, b):
        return (299 * r + 587 * g + 114 * b) // 1000

    expected = bytes(
        [luma(*top[0]), luma(*top[2]), luma(*bot[0]), luma(*bot[2])]
    )
    assert bytes(out.payload) == expected

    import pytest as _pytest

    bad = spark.createDataFrame(
        [Row(media_id=2, kind="image", payload=b"nope", n_bytes=4)],
        mm.MEDIA_SCHEMA,
    )
    with _pytest.raises(Exception):
        mm.resize_image(bad, width=2, height=2, real=True).collect()
