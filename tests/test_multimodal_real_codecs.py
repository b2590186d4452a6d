"""Real-codec CI lane for multimodal decode (r13 verdict Next #6).

The Pillow/PyAV probes in ``datapipe/multimodal.py`` were stub-tested
only: this container ships neither codec, so ``_decode_pil`` had no
executed path anywhere.  This module is the optional-dependency lane —
it runs wherever Pillow IS installed (skips cleanly here) and pins the
cross-container contract: the SAME 16×16 grayscale pixel content encoded
as a real PNG (decoded through Pillow) and as a stdlib top-down 8-bit
BMP (decoded through the struct parser) must yield

  1. identical uint8 pixel arrays out of ``_decode_real`` (the shared
     decode contract every downstream operator assumes),
  2. identical ``image_ahash`` hashes and ``image_histogram`` counts over
     the decoded bytes (the operators are container-blind), and
  3. identical ``extract_features(mode='real')`` rows for the two
     containers (decode dispatch inside the Arrow batch).
"""

from __future__ import annotations

import io
import struct

import pytest

PIL = pytest.importorskip("PIL", reason="Pillow lane: optional dependency")
from PIL import Image  # noqa: E402

import numpy as np  # noqa: E402

SIZE = 16  # 256 pixels -> 64 aHash cells of 4 bytes each


def _pixels() -> np.ndarray:
    """Deterministic 16x16 grayscale content with full-range variation."""
    r, c = np.meshgrid(np.arange(SIZE), np.arange(SIZE), indexing="ij")
    return ((3 * r + 5 * c + r * c * 7) % 256).astype(np.uint8)


def _png_bytes(px: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(px, mode="L").save(buf, format="PNG")
    return buf.getvalue()


def _bmp_bytes(px: np.ndarray) -> bytes:
    """Hand-encoded 8bpp BI_RGB BMP, TOP-DOWN (negative height) so the
    raw pixel array matches PNG's row order, width a multiple of 4 so
    rows carry no padding — the layout where the stdlib parser's output
    is bit-identical to Pillow's."""
    h, w = px.shape
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    data_offset = 14 + 40 + len(palette)
    pixel_data = px.tobytes()
    file_size = data_offset + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 8, 0, len(pixel_data), 2835, 2835, 256, 0
    )
    return header + info + palette + pixel_data


def test_png_and_bmp_decode_to_identical_pixel_arrays():
    from project_obsidian_core_spark.datapipe.multimodal import _decode_real

    px = _pixels()
    png_arr = _decode_real("image", _png_bytes(px))
    bmp_arr = _decode_real("image", _bmp_bytes(px))
    assert png_arr.dtype == np.uint8 and bmp_arr.dtype == np.uint8
    assert np.array_equal(png_arr, px.reshape(-1))
    assert np.array_equal(bmp_arr, px.reshape(-1))


def test_ahash_and_histogram_parity_across_containers(spark):
    from project_obsidian_core_spark.datapipe.multimodal import (
        _decode_real,
        image_ahash,
        image_histogram,
    )

    px = _pixels()
    decoded = {
        "png": bytes(_decode_real("image", _png_bytes(px))),
        "bmp": bytes(_decode_real("image", _bmp_bytes(px))),
    }
    media = spark.createDataFrame(
        [(1, "image", decoded["png"]), (2, "image", decoded["bmp"])],
        "doc_id long, media_type string, content binary",
    )
    hashes = {r["doc_id"]: r["ahash_hex"] for r in image_ahash(media).collect()}
    assert hashes[1] == hashes[2]
    hist = {
        (r["doc_id"], r["bin_idx"]): r["n_bytes"]
        for r in image_histogram(media).collect()
    }
    for b in range(4):
        assert hist[(1, b)] == hist[(2, b)]
    # and the counts are the true histogram of the source pixels
    width = 256 // 4
    ref = np.bincount(px.reshape(-1) // width, minlength=4)
    assert [hist[(1, b)] for b in range(4)] == [int(x) for x in ref]


def test_extract_features_real_mode_parity(spark):
    from project_obsidian_core_spark.datapipe.multimodal import extract_features

    px = _pixels()
    media = spark.createDataFrame(
        [
            (1, "image", _png_bytes(px), SIZE, SIZE, 8000, 8),
            (2, "image", _bmp_bytes(px), SIZE, SIZE, 8000, 8),
        ],
        "doc_id long, media_type string, content binary, width int,"
        " height int, sample_rate int, n_frames int",
    )
    rows = {r["doc_id"]: r for r in extract_features(media, mode="real").collect()}
    for k in ("n_bytes", "byte_sum", "byte_mean"):
        assert rows[1][k] == rows[2][k]
    assert rows[1]["n_bytes"] == SIZE * SIZE
    assert rows[1]["byte_sum"] == int(px.astype(np.int64).sum())
