"""GIF decoder (operators/gif.py): hand-assembled stream with known
LZW codes, independent-encoder roundtrips (palette sizes, interlace,
local tables, multi-frame, transparency, table-growth stress), and
malformed-stream guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kinesis_vcr_spark.operators.gif import gif_decode, gif_frames
from tests.gif_ref import encode_gif, lzw_encode


def _gray_palette(n):
    v = np.linspace(0, 255, n).astype(np.uint8)
    return np.stack([v, v, v], axis=1)


def test_hand_assembled_2x2():
    """Fully hand-computed stream: 2×2 image over a 4-color palette,
    pixel indices [0, 1, 2, 3]. Min code size 2: clear=4, eoi=5, codes
    start at width 3. After the third data code the decoder's table
    reaches 8 entries (4 singles + 2 reserved + 2 added), so the LAST
    two codes read at width 4: stream = 4,0,1,2 @3 bits then 3,5 @4 =
    4 + 0·2³ + 1·2⁶ + 2·2⁹ + 3·2¹² + 5·2¹⁶ = 0x53444 → LSB-first
    bytes 44 34 05."""
    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    hdr = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)
    body = (
        bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])  # min code size
        + bytes([3, 0x44, 0x34, 0x05, 0])  # one 3-byte sub-block
        + b"\x3b"
    )
    w, h, px = gif_decode(hdr + palette.tobytes() + body)
    assert (w, h) == (2, 2)
    np.testing.assert_array_equal(px.reshape(4, 3), palette)


@pytest.mark.parametrize("n_colors", [2, 4, 16, 256])
def test_roundtrip_palette_sizes(n_colors):
    rng = np.random.RandomState(n_colors)
    idx = rng.randint(0, n_colors, size=(13, 17)).astype(np.uint8)
    palette = _gray_palette(n_colors)
    w, h, px = gif_decode(encode_gif([(0, 0, idx)], palette))
    assert (w, h) == (17, 13)
    np.testing.assert_array_equal(px, palette[idx])


@pytest.mark.parametrize("size", [(8, 8), (11, 5), (23, 31), (1, 7), (9, 1)])
def test_interlace_matches_sequential(size):
    h, w = size
    rng = np.random.RandomState(h * 37 + w)
    idx = rng.randint(0, 16, size=(h, w)).astype(np.uint8)
    palette = _gray_palette(16)
    plain = gif_decode(encode_gif([(0, 0, idx)], palette))[2]
    inter = gif_decode(encode_gif([(0, 0, idx)], palette, interlace=True))[2]
    np.testing.assert_array_equal(plain, inter)


def test_local_color_tables():
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 8, size=(6, 9)).astype(np.uint8)
    palette = _gray_palette(8)
    a = gif_decode(encode_gif([(0, 0, idx)], palette))[2]
    b = gif_decode(encode_gif([(0, 0, idx)], palette, local_tables=True))[2]
    np.testing.assert_array_equal(a, b)


def test_multiframe_first_frame_composites_onto_screen():
    """gif_decode = first frame at its offset on a zeroed logical
    screen; gif_frames exposes every frame + geometry."""
    palette = _gray_palette(4)
    f1 = np.full((2, 3), 3, np.uint8)
    f2 = np.full((4, 4), 1, np.uint8)
    payload = encode_gif(
        [(1, 2, f1), (0, 0, f2)], palette, screen=(6, 6)
    )
    sw, sh, frames = gif_frames(payload)
    assert (sw, sh) == (6, 6)
    assert len(frames) == 2
    assert frames[0]["left"] == 1 and frames[0]["top"] == 2
    np.testing.assert_array_equal(frames[1]["pixels"], palette[f2])
    w, h, px = gif_decode(payload)
    assert px.shape == (6, 6, 3)
    assert (px[2:4, 1:4] == 255).all()  # frame 1 content (index 3)
    assert (px[0, 0] == 0).all()  # untouched screen stays 0


def test_transparency_yields_alpha():
    palette = _gray_palette(4)
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    w, h, px = gif_decode(
        encode_gif([(0, 0, idx)], palette, transparent=2)
    )
    assert px.shape == (2, 2, 4)
    assert px[1, 0, 3] == 0  # the transparent index
    assert px[0, 0, 3] == 255 and px[1, 1, 3] == 255


def test_lzw_table_growth_stress():
    """Long run-heavy sequence over a tiny palette: the code table
    passes multiple width bumps and reaches the 4096 cap (deferred
    clear — the encoder stops adding, the decoder must too)."""
    rng = np.random.RandomState(9)
    seq = np.repeat(rng.randint(0, 4, 4000), 5).astype(np.uint8)[:18000]
    idx = seq.reshape(100, 180)
    palette = _gray_palette(4)
    px = gif_decode(encode_gif([(0, 0, idx)], palette))[2]
    np.testing.assert_array_equal(px, palette[idx])


def test_malformed_streams_raise():
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"NOTGIF" + b"\x00" * 20)
    palette = _gray_palette(4)
    idx = np.zeros((4, 4), np.uint8)
    good = encode_gif([(0, 0, idx)], palette)
    with pytest.raises(ValueError):  # cut inside the color table
        gif_decode(good[:20])
    with pytest.raises(ValueError, match="truncated"):
        gif_decode(good[:34])  # cut inside the pixel sub-blocks
    # palette index out of range: 2-entry table, index 3 planted
    bad_idx = np.array([[0, 1], [1, 3]], np.uint8)
    hdr = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
    body = (
        bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])
        + bytes([len(lzw_encode(bad_idx.tobytes(), 2))])
        + lzw_encode(bad_idx.tobytes(), 2)
        + b"\x00\x3b"
    )
    with pytest.raises(ValueError, match="palette index"):
        gif_decode(hdr + _gray_palette(2).tobytes() + body)


def test_decode_image_dispatches_gif():
    from kinesis_vcr_spark.operators.multimodal import decode_image

    idx = np.full((5, 5), 2, np.uint8)
    out = decode_image(encode_gif([(0, 0, idx)], _gray_palette(4)))
    assert (out["width"], out["height"]) == (5, 5)
    assert out["mean_value"] == float(_gray_palette(4)[2][0])
