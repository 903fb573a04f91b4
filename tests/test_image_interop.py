"""Image encoders cross-checked against javax.imageio (round 10) — the
JVM that every test session already carries ships an INDEPENDENT
PNG/GIF/BMP decoder, so the encode side of the image roundtrips is
pinned from outside exactly like the zstd binary pins the zstd stack
and audioop pins G.711: a wrong filter choice, palette layout, LZW
packing, interlace pass order or channel order that our own decoder
happened to mirror would surface here as pixel mismatches."""

from __future__ import annotations

import numpy as np
import pytest

from precios_nexo_sperant_etl_spark.operators import multimodal as mm

_Y, _X = np.mgrid[0:16, 0:16]
_RGB = np.stack([(_X * 16 + 3) % 256, (_Y * 16 + 7) % 256,
                 (_X * 7 + _Y * 11) % 256], -1).astype(np.uint8)
_IDX = ((7 + _X + _Y) % 16).astype(np.uint8)
_PAL = np.stack([(np.arange(16) * 17) % 256, (np.arange(16) * 31) % 256,
                 (np.arange(16) * 53) % 256], -1).astype(np.uint8)


def _imageio_pixels(spark, blob: bytes) -> np.ndarray | None:
    jvm = spark.sparkContext._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(blob)))
    if img is None:
        return None
    w, h = img.getWidth(), img.getHeight()
    out = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y)
            out[y, x] = [(argb >> 16) & 255, (argb >> 8) & 255, argb & 255]
    return out


@pytest.mark.parametrize("name", ["png_rgb", "png_adam7", "png_palette",
                                  "gif", "bmp"])
def test_image_encoders_decode_identically_in_imageio(spark, name):
    if name == "png_rgb":
        blob, expect = mm.encode_png(_RGB.tobytes(), 16), _RGB
    elif name == "png_adam7":
        blob, expect = mm.encode_png(_RGB.tobytes(), 16,
                                     interlace=True), _RGB
    elif name == "png_palette":
        blob, expect = mm.encode_png_palette(_IDX, _PAL), _PAL[_IDX]
    elif name == "gif":
        blob, expect = mm.encode_gif(_IDX, _PAL), _PAL[_IDX]
    else:                                       # bmp: B,G,R input contract
        blob, expect = mm.encode_bmp24(_RGB[:, :, ::-1]), _RGB
    got = _imageio_pixels(spark, blob)
    assert got is not None, f"{name}: imageio found no reader"
    assert (got == expect).all(), \
        f"{name}: {(got != expect).any(axis=2).sum()} pixels differ"
