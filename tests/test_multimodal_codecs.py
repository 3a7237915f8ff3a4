"""Real-codec (PIL) path of corpus/multimodal.py.

Pillow is not installed in this sandbox, so every test here importorskips
— the skip is the documented environment gap (same pattern as
test_delta_merge.py). Anywhere Pillow IS present, these run for real:
they build genuine PNG bytes, decode them through the `codec="pil"`
mapInPandas path, and assert true dimensions / resize round-trips.

The driver/oracle queries (q27, q115) pin codec="fake" explicitly so
their cross-engine hashes are independent of the environment.
"""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL", reason="Pillow not installed in this sandbox")
import PIL.Image  # noqa: E402

from modular_etl_data_platform_spark.corpus.multimodal import (  # noqa: E402
    _pil_decode,
    _pil_resize,
    _resolve_codec,
    decode_images,
    resize_images,
)


def _png_bytes(w: int, h: int, color: tuple[int, int, int]) -> bytes:
    img = PIL.Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_resolve_codec_auto_prefers_pil():
    assert _resolve_codec("auto") == "pil"
    assert _resolve_codec("fake") == "fake"
    with pytest.raises(ValueError):
        _resolve_codec("webp")


def test_pil_decode_true_dimensions_and_quadrant_luma():
    meta = _pil_decode(_png_bytes(40, 24, (255, 255, 255)))
    assert (meta["width"], meta["height"]) == (40, 24)
    assert len(meta["feature"]) == 4
    # all-white image → every quadrant's mean luma ≈ 1.0
    assert all(f > 0.95 for f in meta["feature"])
    dark = _pil_decode(_png_bytes(40, 24, (0, 0, 0)))
    assert all(f < 0.05 for f in dark["feature"])


def test_pil_resize_roundtrip_dimensions():
    resized = _pil_resize(_png_bytes(64, 64, (10, 200, 30)), 16, 8)
    out = PIL.Image.open(io.BytesIO(resized))
    assert out.size == (16, 8)
    assert out.format == "PNG"


def test_decode_images_pil_path_on_spark(spark):
    rows = [
        (1, "image/png", len(_png_bytes(32, 16, (5, 5, 5))), _png_bytes(32, 16, (5, 5, 5))),
        (2, "image/png", len(_png_bytes(8, 8, (250, 250, 250))), _png_bytes(8, 8, (250, 250, 250))),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, mime string, byte_len long, payload binary"
    )
    out = {r.doc_id: r for r in decode_images(media, codec="pil").collect()}
    assert (out[1].width, out[1].height) == (32, 16)
    assert (out[2].width, out[2].height) == (8, 8)
    assert all(f > 0.9 for f in out[2].feature)

    resized = resize_images(media, width=4, height=4, codec="pil").collect()
    for r in resized:
        img = PIL.Image.open(io.BytesIO(bytes(r.payload)))
        assert img.size == (4, 4)
