"""Baseline JPEG decoder (operators/jpeg.py): hand-assembled streams
with analytic pixel values, independent-encoder roundtrips (gray /
4:4:4 / 4:2:0 / restart markers), and mode guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kinesis_vcr_spark.operators.jpeg import jpeg_decode
from tests.jpeg_ref import encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def test_hand_assembled_dc_only_block():
    """Fully hand-computed stream, no encoder involved: one 8x8 gray
    block, flat quantizer 16, DC table = {category 3 -> code '0'},
    AC table = {EOB -> code '0'}. Bitstream 0|111|0 + 1-padding
    decodes DC=+7 -> pixel value 7·16/8 + 128 = 142 everywhere."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
               + bytes([1, 1, 0x11, 0]))
    dc_bits = [1] + [0] * 15
    ac_bits = [1] + [0] * 15
    dht = _seg(
        0xC4,
        bytes([0x00] + dc_bits + [3]) + bytes([0x10] + ac_bits + [0x00]),
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    scan = bytes([0b01110111])
    payload = b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"

    w, h, px = jpeg_decode(payload)
    assert (w, h) == (8, 8)
    assert px.shape == (8, 8)
    assert np.all(px == 142)


def test_flat_gray_exact():
    """Flat input whose DC quantizes without remainder must decode
    EXACTLY (100-128 = -28; DCT DC = -224; /8 = -28 integral)."""
    img = np.full((16, 16), 100, dtype=np.uint8)
    w, h, px = jpeg_decode(encode_jpeg(img, quality_divisor=8))
    assert (w, h) == (16, 16)
    assert np.all(px == 100)


def test_gray_gradient_roundtrip_nonmultiple_dims():
    yy, xx = np.mgrid[0:17, 0:24]
    img = ((yy * 5 + xx * 3) % 200 + 20).astype(np.uint8)
    # smooth it so quality 4 keeps it near-lossless
    img = (img * 0.5 + 90).astype(np.uint8)
    w, h, px = jpeg_decode(encode_jpeg(img, quality_divisor=4))
    assert (w, h) == (24, 17)
    assert px.shape == (17, 24)
    assert _psnr(img, px) > 35.0


def test_color_444_roundtrip():
    rng = np.random.RandomState(7)
    base = rng.randint(40, 200, size=(3, 3, 3)).astype(np.float64)
    img = np.kron(base, np.ones((8, 8, 1)))[:, :, :3].astype(np.uint8)
    img = img[:20, :22]
    w, h, px = jpeg_decode(encode_jpeg(img, quality_divisor=4))
    assert (w, h) == (22, 20)
    assert px.shape == (20, 22, 3)
    assert _psnr(img, px) > 30.0


def test_color_420_subsampled_roundtrip():
    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack(
        [
            (80 + yy * 2).clip(0, 255),
            (60 + xx).clip(0, 255),
            np.full_like(yy, 120),
        ],
        axis=-1,
    ).astype(np.uint8)
    w, h, px = jpeg_decode(
        encode_jpeg(img, quality_divisor=4, subsample_420=True)
    )
    assert (w, h) == (40, 24)
    assert px.shape == (24, 40, 3)
    assert _psnr(img, px) > 26.0  # chroma halved, smooth field


def test_restart_markers_match_unrestarted():
    rng = np.random.RandomState(11)
    img = (
        rng.randint(0, 4, size=(24, 32)) * 8 + 100
    ).astype(np.uint8)
    plain = jpeg_decode(encode_jpeg(img, quality_divisor=4))[2]
    rst = jpeg_decode(
        encode_jpeg(img, quality_divisor=4, restart_interval=3)
    )[2]
    assert np.array_equal(plain, rst)


def test_progressive_raises():
    sof2 = _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8)
                + bytes([1, 1, 0x11, 0]))
    payload = b"\xff\xd8" + sof2 + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_decode(payload)


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x89PNG1234")


def test_decode_image_dispatches_jpeg():
    from kinesis_vcr_spark.operators.multimodal import decode_image

    img = np.full((8, 8), 100, dtype=np.uint8)
    out = decode_image(encode_jpeg(img))
    assert (out["width"], out["height"]) == (8, 8)
    assert out["mean_value"] == 100.0
