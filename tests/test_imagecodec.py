"""Pure-numpy PNG + baseline-JPEG codecs (stages/imagecodec.py): exact
PNG roundtrips across shapes/channel counts (adaptive filtering means
every filter type 0-4 gets exercised), JPEG roundtrip PSNR floors, and —
crucially — decode of FOREIGN known-good files produced by independent
encoders (CPython's test-suite python.png: palette+tRNS; python.jpg:
libjpeg baseline 4:2:0), cross-validated against each other since both
encode the same source logo."""

from __future__ import annotations

import os

import numpy as np
import pytest

from e_commerce_batch_etl_pipeline_ray.stages import imagecodec as ic
from e_commerce_batch_etl_pipeline_ray.stages import multimodal

_CPY = "/root/.pyenv/versions/3.13.0/lib/python3.13"
_PNG_FIX = f"{_CPY}/test/test_email/data/python.png"
_JPG_FIX = f"{_CPY}/test/test_email/data/python.jpg"
_RGBA_FIX = f"{_CPY}/idlelib/Icons/idle_32.png"


@pytest.mark.parametrize("shape", [(16, 16), (17, 23, 3), (9, 31, 4),
                                   (1, 1, 3), (64, 48, 3)])
def test_png_roundtrip_exact(shape):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = ic.decode_png(ic.encode_png(img))
    assert out.shape == img.shape
    assert (out == img).all()


def test_png_roundtrip_smooth_uses_predictive_filters():
    """Gradient content makes the adaptive encoder pick Sub/Up/Avg/Paeth
    rows — the decoder's unfilter paths all run, and smaller than raw."""
    g = np.clip(np.add.outer(np.arange(40) * 3, np.arange(50) * 2),
                0, 255).astype(np.uint8)
    img = np.dstack([g, np.roll(g, 5, axis=1), 255 - g])
    b = ic.encode_png(img)
    assert (ic.decode_png(b) == img).all()
    assert len(b) < img.nbytes // 2          # predictive filters compress


def test_png_foreign_palette_and_rgba():
    """Files produced by independent encoders (CPython test data)."""
    p = ic.decode_png(open(_PNG_FIX, "rb").read())
    assert p.shape == (16, 16, 4)             # palette + tRNS -> RGBA
    assert p[0, 0, 3] == 0                    # transparent corner
    rgba = ic.decode_png(open(_RGBA_FIX, "rb").read())
    assert rgba.shape == (32, 32, 4)


def test_png_unsupported_raises():
    with pytest.raises(ValueError, match="not a PNG"):
        ic.decode_png(b"nope")


def test_jpeg_roundtrip_psnr():
    yy, xx = np.mgrid[0:40, 0:56]
    smooth = np.stack([(yy * 4) % 256, (xx * 3) % 256,
                       ((yy + xx) * 2) % 256], axis=-1).astype(np.uint8)
    dec = ic.decode_jpeg(ic.encode_jpeg(smooth, quality=90))
    assert dec.shape == smooth.shape
    assert ic.psnr(smooth, dec) > 40
    gray = ((yy * 5 + xx * 2) % 256).astype(np.uint8)
    dg = ic.decode_jpeg(ic.encode_jpeg(gray, quality=92))
    assert dg.shape == gray.shape
    assert ic.psnr(gray, dg) > 40


def test_jpeg_foreign_libjpeg_420_cross_validates_with_png():
    """python.jpg is libjpeg-produced baseline 4:2:0 of the SAME logo as
    python.png — two foreign files, two independent decoders of ours, one
    source image. Compositing the PNG's alpha over black must agree with
    the JPEG decode to JPEG-artifact precision."""
    j = ic.decode_jpeg(open(_JPG_FIX, "rb").read())
    assert j.shape == (16, 16, 3)
    p = ic.decode_png(open(_PNG_FIX, "rb").read())
    rgb = p[..., :3].astype(np.float64)
    a = p[..., 3:4].astype(np.float64) / 255.0
    over_black = (rgb * a).round().astype(np.uint8)
    assert ic.psnr(over_black, j) > 18
    # on fully-opaque pixels (no compositing ambiguity) the two decodes
    # agree to JPEG-artifact precision
    opaque = p[..., 3] == 255
    diff = np.abs(over_black.astype(np.int32) - j.astype(np.int32))
    assert opaque.sum() > 50
    assert diff[opaque].mean() < 12


def test_jpeg_progressive_raises():
    # minimal stream with a SOF2 (progressive) marker
    bad = (b"\xff\xd8" + b"\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01"
           b"\x01\x11\x00" + b"\xff\xd9")
    with pytest.raises(NotImplementedError, match="baseline"):
        ic.decode_jpeg(bad)


def test_decode_image_bytes_dispatch():
    """multimodal.decode_image_bytes routes all four magics and
    normalizes to (H, W, 3)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(12, 18, 3), dtype=np.uint8)
    assert (multimodal.decode_image_bytes(ic.encode_png(img)) == img).all()
    rgba = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    out = multimodal.decode_image_bytes(ic.encode_png(rgba))
    assert out.shape == (8, 8, 3)              # alpha composited
    jimg = multimodal.decode_image_bytes(ic.encode_jpeg(img, quality=95))
    assert jimg.shape == (12, 18, 3)
    assert os.path.exists(_JPG_FIX)
    got = multimodal.decode_image_bytes(open(_JPG_FIX, "rb").read())
    assert got.shape == (16, 16, 3)
