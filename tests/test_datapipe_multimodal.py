"""Multimodal plumbing: binary payloads, Arrow batch shapes, decode gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some content") for i in range(12)],
        ["doc_id", "text"],
    )
    return M.attach_media(docs)


def test_media_schema_and_payload(media):
    # nullability differs for literal-derived cols; names+types must match
    assert [(f.name, f.dataType) for f in media.schema.fields] == [
        (f.name, f.dataType) for f in M.MEDIA_SCHEMA.fields
    ]
    rows = {r["doc_id"]: r for r in media.collect()}
    assert len(rows[0]["content"]) == M.PAYLOAD_BLOCKS * M.BLOCK_BYTES
    assert rows[0]["media_type"] == "image"
    assert rows[1]["media_type"] == "audio"
    assert rows[2]["media_type"] == "video"
    # payload blocks differ (frame sampling is non-trivial)
    c = bytes(rows[2]["content"])
    assert c[:16] != c[16:32]


def test_features_match_bytes(media):
    feats = {r["doc_id"]: r for r in M.extract_features(media).collect()}
    raw = {r["doc_id"]: bytes(r["content"]) for r in media.collect()}
    for doc_id, b in raw.items():
        f = feats[doc_id]
        assert f["n_bytes"] == len(b)
        assert f["byte_sum"] == sum(b)
        assert f["byte_mean"] == pytest.approx(sum(b) / len(b))


def test_features_survive_tiny_arrow_batches(media, spark):
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        n = M.extract_features(media.repartition(2)).count()
        assert n == 12
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_frame_sampling(media):
    frames = M.sample_frames(media).collect()
    video_ids = {r["doc_id"] for r in media.filter(F.col("media_type") == "video").collect()}
    assert {r["doc_id"] for r in frames} == video_ids
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    raw = {r["doc_id"]: bytes(r["content"]) for r in media.collect()}
    for doc_id, rs in by_doc.items():
        assert sorted(r["frame_idx"] for r in rs) == [0, 1, 2, 3]
        for r in rs:
            lo = r["frame_idx"] * M.FRAME_BYTES
            assert r["frame_hex"] == raw[doc_id][lo : lo + M.FRAME_BYTES].hex()
    # stride sampling
    half = M.sample_frames(media, every=2).collect()
    assert sorted({r["frame_idx"] for r in half}) == [0, 2]


def _make_wav(samples: list[int], rate: int = 8000) -> bytes:
    """A genuine PCM16 mono RIFF/WAVE file, stdlib-only."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def _make_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """A genuine uncompressed 24-bit BMP (BI_RGB), stdlib-only.

    ``pixels`` is rows of (b, g, r) triples, top-down as given; BMP stores
    bottom-up, which is part of what the parser must cope with."""
    import struct

    h, w = len(pixels), len(pixels[0])
    row_bytes = (w * 3 + 3) // 4 * 4
    body = b""
    for row in reversed(pixels):
        raw = b"".join(bytes(p) for p in row)
        body += raw + b"\x00" * (row_bytes - len(raw))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info + body


def test_real_decode_wav(spark):
    # features in real mode come from the DECODED PCM bytes, not the file
    samples = [0, 1000, -1000, 32767, -32768, 513]
    wav = _make_wav(samples)
    import struct

    pcm = b"".join(struct.pack("<h", s) for s in samples)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav), None, None, 8000, None)],
        M.MEDIA_SCHEMA,
    )
    f = M.extract_features(df, mode="real").collect()[0]
    assert f["n_bytes"] == len(pcm)
    assert f["byte_sum"] == sum(pcm)
    assert f["byte_mean"] == pytest.approx(sum(pcm) / len(pcm))


def test_real_decode_bmp(spark):
    pixels = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (10, 20, 30)],
    ]
    bmp = _make_bmp(pixels)
    df = spark.createDataFrame(
        [(2, "image", bytearray(bmp), 2, 2, None, None)],
        M.MEDIA_SCHEMA,
    )
    f = M.extract_features(df, mode="real").collect()[0]
    # 2px * 3B = 6B per row, padded to 8; 2 rows
    assert f["n_bytes"] == 16
    flat = sum(sum(p) for row in pixels for p in row)
    assert f["byte_sum"] == flat  # padding bytes are zero


def test_real_decode_unsupported_format_is_gated(media):
    # synthetic md5 payloads are not a real container -> NotImplementedError
    with pytest.raises(Exception) as exc_info:
        M.extract_features(media, mode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )
    with pytest.raises(ValueError):
        M.extract_features(media, mode="nope")


def test_resize_images_nearest_neighbor(spark):
    from project_obsidian_core_spark.datapipe import multimodal as M

    docs = spark.createDataFrame(
        [(0, "alpha doc"), (3, "bravo doc"), (1, "not an image")],
        ["doc_id", "text"],
    )
    media = M.attach_media(docs)
    out = {r["doc_id"]: r.asDict() for r in M.resize_images(media).collect()}
    # only image docs (doc_id % 3 == 0) survive the filter
    assert set(out) == {0, 3}
    for r in out.values():
        assert r["out_w"] == M.RESIZE_TARGET and r["out_h"] == M.RESIZE_TARGET
        assert len(r["resized_hex"]) == 2 * M.RESIZE_TARGET ** 2
    # python model on the actual payload bytes
    row = media.filter("doc_id = 0").collect()[0]
    b, w, h, t = bytes(row["content"]), row["width"], row["height"], M.RESIZE_TARGET
    px = [
        b[((i * h // t) * w + (j * w // t)) % len(b)]
        for i in range(t)
        for j in range(t)
    ]
    assert out[0]["pixel_sum"] == sum(px)
    assert out[0]["resized_hex"] == bytes(px).hex()


def test_resample_audio_nearest_neighbor(spark):
    from project_obsidian_core_spark.datapipe import multimodal as M

    docs = spark.createDataFrame(
        [(1, "audio doc"), (4, "other audio"), (0, "an image")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in M.resample_audio(M.attach_media(docs)).collect()
    }
    assert set(out) == {1, 4}  # only audio docs (doc_id % 3 == 1)
    row = M.attach_media(docs).filter("doc_id = 1").collect()[0]
    b, t = bytes(row["content"]), M.RESAMPLE_TARGET
    expect = [b[(i * len(b)) // t] for i in range(t)]
    assert out[1]["sample_sum"] == sum(expect)
    assert out[1]["resampled_hex"] == bytes(expect).hex()


# ------------------------------------------------ optional Pillow probe
def _tiny_png_bytes():
    """Valid-magic PNG header + junk body (enough for dispatch tests)."""
    return b"\x89PNG\r\n\x1a\n" + b"\x00" * 32


def test_real_decode_png_without_pillow_raises():
    """With no Pillow importable, a PNG payload hits the documented
    NotImplementedError naming the missing dependency."""
    import pytest

    from project_obsidian_core_spark.datapipe import multimodal as M

    if M._pil_image_module() is not None:
        pytest.skip("Pillow is installed in this environment")
    with pytest.raises(NotImplementedError, match="Pillow"):
        M._decode_real("image", _tiny_png_bytes())


def test_real_decode_png_dispatches_to_pillow(monkeypatch):
    """When the probe finds Pillow, JPEG/PNG payloads decode through it
    into flat uint8 pixel bytes (stubbed Image module — the dispatch and
    pixel-flattening contract is ours, the codec isn't)."""
    import sys
    import types

    import numpy as np

    from project_obsidian_core_spark.datapipe import multimodal as M

    class _FakeImg:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def __array__(self, dtype=None, copy=None):
            return np.arange(12, dtype=np.uint8).reshape(3, 4)

    fake_image_mod = types.SimpleNamespace(open=lambda fh: _FakeImg())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    out = M._decode_real("image", _tiny_png_bytes())
    assert out.dtype == np.uint8 and out.shape == (12,)
    assert out.tolist() == list(range(12))

    # JPEG magic routes through the same probe
    out2 = M._decode_real("image", b"\xff\xd8\xff" + b"\x00" * 16)
    assert out2.tolist() == list(range(12))


# ------------------------------------------------ optional PyAV probe
def _tiny_mp4_bytes():
    """Valid-magic MP4 (ftyp box) header + junk body (dispatch tests)."""
    return b"\x00\x00\x00\x18ftypisom" + b"\x00" * 32


def test_real_decode_mp4_without_pyav_raises():
    """With no PyAV importable, an MP4 payload hits the documented
    NotImplementedError naming the missing dependency."""
    import pytest

    from project_obsidian_core_spark.datapipe import multimodal as M

    if M._pyav_module() is not None:
        pytest.skip("PyAV is installed in this environment")
    with pytest.raises(NotImplementedError, match="PyAV"):
        M._decode_real("video", _tiny_mp4_bytes())


def test_real_decode_mp4_dispatches_to_pyav(monkeypatch):
    """When the probe finds PyAV, MP4/MP3 payloads decode through it into
    flat uint8 frame bytes (stubbed av module — the dispatch and
    flattening contract is ours, the codec isn't)."""
    import sys
    import types

    import numpy as np

    from project_obsidian_core_spark.datapipe import multimodal as M

    class _FakeFrame:
        def to_ndarray(self, format=None):
            return np.arange(24, dtype=np.uint8).reshape(2, 3, 4)

        def to_image(self):  # marks this as a video frame
            raise NotImplementedError

    class _FakeContainer:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self):
            return iter([_FakeFrame(), _FakeFrame()])

    fake_av = types.ModuleType("av")
    fake_av.open = lambda fh: _FakeContainer()
    monkeypatch.setitem(sys.modules, "av", fake_av)

    out = M._decode_real("video", _tiny_mp4_bytes())
    assert out.dtype == np.uint8 and out.shape == (48,)
    assert out.tolist() == list(range(24)) * 2

    # MP3 magic (ID3 and bare frame-sync) routes through the same probe
    assert M._decode_real("audio", b"ID3" + b"\x00" * 16).shape == (48,)
    assert M._decode_real("audio", b"\xff\xfb" + b"\x00" * 16).shape == (48,)


def test_image_ahash_matches_python(media):
    """M11: the exact-int aHash matches a direct python recompute, only
    images are hashed, and the hex packing is bit-faithful."""
    import hashlib

    out = {r["doc_id"]: r["ahash_hex"] for r in M.image_ahash(media).collect()}
    assert set(out) == {0, 3, 6, 9}  # doc_id % 3 == 0 -> image
    for doc_id in out:
        text = f"document number {doc_id} with some content"
        payload = b"".join(
            bytes.fromhex(hashlib.md5(f"{text}:{i}".encode()).hexdigest())
            for i in range(1, M.PAYLOAD_BLOCKS + 1)
        )
        b = list(payload)
        tot = sum(b)
        bits = [1 if v * M.AHASH_CELLS > tot else 0 for v in b]
        want = "".join(
            "0123456789abcdef"[
                8 * bits[4 * k] + 4 * bits[4 * k + 1]
                + 2 * bits[4 * k + 2] + bits[4 * k + 3]
            ]
            for k in range(M.AHASH_CELLS // 4)
        )
        assert out[doc_id] == want, doc_id
        assert len(out[doc_id]) == 16


def test_image_ahash_identical_payloads_collide(spark):
    """Equal content -> equal hash (the dedup contract), different
    content -> (here) different hash."""
    docs = spark.createDataFrame(
        [(0, "same text"), (3, "same text"), (6, "other text")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["ahash_hex"]
            for r in M.image_ahash(M.attach_media(docs)).collect()}
    assert rows[0] == rows[3] != rows[6]


def test_image_ahash_rejects_indivisible_payload(spark):
    import pandas as pd

    docs = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    media = M.attach_media(docs).withColumn(
        "content", F.expr("substring(content, 1, 63)")
    )
    with pytest.raises(Exception, match="does not divide"):
        M.image_ahash(media).collect()


def test_media_dedup_hamming_identical_and_different(spark):
    """M12: identical payloads pair at Hamming 0 (is_near), and the
    per-nibble popcount equals a direct python XOR recompute."""
    from project_obsidian_core_spark.plans import datapipe_queries as dq

    docs = spark.createDataFrame(
        [(0, "same text"), (3, "same text"), (6, "other text")],
        ["doc_id", "text"],
    ).selectExpr("doc_id", "text", "'en' lang", "'s' source",
                 "length(text) n_chars")
    orig = dq.load
    dq.load = lambda s, d, t: docs
    try:
        rows = dq.media_dedup_hamming(spark, "unused").collect()
    finally:
        dq.load = orig
    hashes = {
        r["doc_id"]: r["ahash_hex"]
        for r in M.image_ahash(M.attach_media(docs)).collect()
    }
    want = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if hashes[a][:2] == hashes[b][:2]:
                d = bin(int(hashes[a], 16) ^ int(hashes[b], 16)).count("1")
                want[(a, b)] = d
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert got == want
    assert got[(0, 3)] == 0  # identical content -> 0 distance
    for r in rows:
        assert r["is_near"] == (r["hamming"] <= 8)
