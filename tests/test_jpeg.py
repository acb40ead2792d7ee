"""Baseline JPEG decoder (operators/jpeg.py): hand-assembled streams
with analytic pixel values, independent-encoder roundtrips (gray /
4:4:4 / 4:2:0 / restart markers), and mode guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kinesis_vcr_spark.operators.jpeg import jpeg_decode
from tests.jpeg_ref import encode_jpeg, encode_jpeg_progressive


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


def test_hand_assembled_progressive_dc_only():
    """Fully hand-computed progressive stream: one 8x8 gray block, DC
    coded in two scans (first at Al=1, refinement at Al=0), no AC
    scans. First scan sends diff 7>>1 = 3 (category 2, bits '11'
    after code '0'); refinement sends raw bit 7&1 = 1 (0xFF byte needs
    a 0x00 stuffing). Reconstructed DC = (3<<1)|1 = 7 -> pixel
    7·16/8 + 128 = 142 everywhere — the same value as the baseline
    hand-assembled test, via the successive-approximation path."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof2 = _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8)
                + bytes([1, 1, 0x11, 0]))
    dht = _seg(0xC4, bytes([0x00] + [1] + [0] * 15 + [2]))
    sos1 = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))  # Ss=Se=0, Al=1
    scan1 = bytes([0b01111111])  # code '0', bits '11', 1-padding
    sos2 = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))  # Ah=1, Al=0
    scan2 = b"\xff\x00"  # raw bit 1 + 1-padding, stuffed
    payload = (b"\xff\xd8" + dqt + sof2 + dht
               + sos1 + scan1 + sos2 + scan2 + b"\xff\xd9")

    w, h, px = jpeg_decode(payload)
    assert (w, h) == (8, 8)
    assert np.all(px == 142)


@pytest.mark.parametrize("successive", [False, True])
@pytest.mark.parametrize(
    "color", ["gray", "rgb444", "rgb420"]
)
def test_progressive_matches_baseline_bit_exact(successive, color):
    """THE progressive oracle: both encoders quantize identical
    coefficients, so a progressive script that covers the full
    spectrum and refines to Al=0 must decode BIT-IDENTICALLY to the
    baseline stream — spectral selection, EOB runs, ZRL, and (with
    successive=True) DC/AC refinement correction bits all have exactly
    one right answer."""
    rng = np.random.RandomState(17 if successive else 23)
    if color == "gray":
        img = (rng.randint(0, 8, size=(25, 38)) * 16 + 40).astype(np.uint8)
        kw = {}
    else:
        img = (rng.randint(0, 8, size=(21, 35, 3)) * 16 + 40).astype(
            np.uint8
        )
        kw = {"subsample_420": color == "rgb420"}
    base = jpeg_decode(encode_jpeg(img, quality_divisor=4, **kw))[2]
    prog = jpeg_decode(
        encode_jpeg_progressive(
            img, quality_divisor=4, successive=successive, **kw
        )
    )[2]
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("successive", [False, True])
def test_progressive_restart_markers_match(successive):
    """RSTn inside progressive scans: DC predictors AND EOB runs must
    reset per segment — decode with restarts == decode without."""
    rng = np.random.RandomState(31)
    img = (rng.randint(0, 4, size=(24, 40)) * 24 + 60).astype(np.uint8)
    plain = jpeg_decode(
        encode_jpeg_progressive(img, quality_divisor=4,
                                successive=successive)
    )[2]
    rst = jpeg_decode(
        encode_jpeg_progressive(img, quality_divisor=4,
                                successive=successive, restart_interval=2)
    )[2]
    assert np.array_equal(plain, rst)


def test_progressive_high_entropy_band_splits():
    """Full-noise image (every ZRL/EOB/refinement branch live) across
    ac_split boundary choices, each bit-identical to baseline."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(17, 29)).astype(np.uint8)
    base = jpeg_decode(encode_jpeg(img, quality_divisor=8))[2]
    for split in (1, 5, 33, 62):
        prog = jpeg_decode(
            encode_jpeg_progressive(
                img, quality_divisor=8, successive=True, ac_split=split
            )
        )[2]
        assert np.array_equal(base, prog), f"ac_split={split}"


def test_lossless_mode_raises():
    sof3 = _seg(0xC3, bytes([8]) + struct.pack(">HH", 8, 8)
                + bytes([1, 1, 0x11, 0]))
    payload = b"\xff\xd8" + sof3 + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="PIL"):
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


def test_truncated_marker_segment_raises_valueerror():
    """A payload cut inside a marker segment header must raise
    ValueError (not struct.error), so decode-and-quarantine loops that
    catch ValueError keep working (ADVICE r07)."""
    import pytest

    from kinesis_vcr_spark.operators.jpeg import jpeg_decode

    # SOI + first 3 bytes of a DQT marker segment (length cut short)
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff\xdb\x00")
