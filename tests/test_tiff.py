"""Baseline TIFF decode (operators/tiff.py) against an INDEPENDENT
minimal TIFF writer assembled from the TIFF6 spec in this file — the
same fixture discipline that landed GIF and progressive JPEG: the
encoder implements the spec's ENCODER rules (LZW widens at 511/1023/
2047), the decoder the spec's DECODER rules (early change at 510/1022/
2046), so any sync-rule error breaks the boundary-crossing cases."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kinesis_vcr_spark.operators.tiff import tiff_decode

CLEAR, EOI = 256, 257


def lzw_encode(data: bytes) -> bytes:
    """TIFF-spec LZW encoder: MSB-first packing; width++ when the
    entry just added is (1<<w)-1; at 12 bits a full table emits a
    Clear (independent of the decoder under test)."""
    out_bits: list[tuple[int, int]] = []
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    out_bits.append((CLEAR, width))
    w = b""
    for ch in data:
        k = bytes([ch])
        if w + k in table:
            w += k
            continue
        out_bits.append((table[w], width))
        table[w + k] = next_code
        added = next_code
        next_code += 1
        w = k
        if added == (1 << width) - 1:
            if width == 12:
                out_bits.append((CLEAR, width))
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
            else:
                width += 1
    if w:
        out_bits.append((table[w], width))
    out_bits.append((EOI, width))
    buf = bytearray()
    acc = nbits = 0
    for code, cw in out_bits:
        acc = (acc << cw) | code
        nbits += cw
        while nbits >= 8:
            nbits -= 8
            buf.append((acc >> nbits) & 0xFF)
    if nbits:
        buf.append((acc << (8 - nbits)) & 0xFF)
    return bytes(buf)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while (
            i + run < len(data) and data[i + run] == data[i] and run < 128
        ):
            run += 1
        if run >= 2:
            out += struct.pack("b", 1 - run) + data[i : i + 1]
            i += run
        else:
            j = i + 1
            while (
                j < len(data)
                and (j + 1 >= len(data) or data[j] != data[j + 1])
                and j - i < 128
            ):
                j += 1
            out += struct.pack("b", j - i - 1) + data[i:j]
            i = j
    return bytes(out)


def write_tiff(
    pixels: np.ndarray,
    *,
    bo: str = "<",
    compression: int = 1,
    photometric: int | None = None,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    bits: int | None = None,
    colormap: list[int] | None = None,
    extra_tags: dict[int, tuple[int, list[int]]] | None = None,
    strips_override: list[bytes] | None = None,
) -> bytes:
    """Minimal spec-following TIFF writer (strips, chunky planar).
    ``strips_override`` bypasses the raw-strip encoding with caller-
    provided segment bytes (JPEG-in-TIFF: each strip its own stream);
    ``pixels`` still supplies the IFD geometry."""
    h, w = pixels.shape[:2]
    spp = 1 if pixels.ndim == 2 else pixels.shape[2]
    if bits is None:
        bits = 16 if pixels.dtype == np.uint16 else 8
    if photometric is None:
        photometric = 2 if spp >= 3 else 1
    rps = rows_per_strip or h
    row_bytes = (w * spp * bits + 7) // 8

    def row_bits(r: np.ndarray) -> bytes:
        if bits == 1:
            return np.packbits(r.reshape(-1).astype(np.uint8)).tobytes()
        if bits == 16:
            return r.astype(np.dtype(bo + "u2")).tobytes()
        return r.astype(np.uint8).tobytes()

    if strips_override is not None:
        strips = list(strips_override)
    else:
        strips = []
        for s0 in range(0, h, rps):
            rows = pixels[s0 : s0 + rps]
            if predictor == 2:
                rr = rows.reshape(len(rows), w, spp).astype(np.int32)
                diff = rr.copy()
                diff[:, 1:] = (rr[:, 1:] - rr[:, :-1]) % (1 << bits)
                rows = diff.reshape(rows.shape).astype(pixels.dtype)
            raw = b"".join(row_bits(rows[i]) for i in range(len(rows)))
            assert len(raw) == len(rows) * row_bytes
            if compression == 5:
                strips.append(lzw_encode(raw))
            elif compression == 32773:
                strips.append(packbits_encode(raw))
            else:
                strips.append(raw)

    tags: dict[int, tuple[int, list[int]]] = {
        256: (4, [w]),
        257: (4, [h]),
        258: (3, [bits] * spp),
        259: (3, [compression]),
        262: (3, [photometric]),
        277: (3, [spp]),
        278: (4, [rps]),
    }
    if predictor != 1:
        tags[317] = (3, [predictor])
    if colormap is not None:
        tags[320] = (3, colormap)
    if extra_tags:
        tags.update(extra_tags)

    # layout: header(8) | IFD | tag overflow | strip data
    n_tags = len(tags) + 2  # + StripOffsets/StripByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n_tags + 4
    overflow = bytearray()
    overflow_base = ifd_off + ifd_size

    def tag_value(typ: int, vals: list[int]) -> bytes:
        fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
        size = struct.calcsize(fmt) * len(vals)
        packed = struct.pack(bo + fmt * len(vals), *vals)
        if size <= 4:
            return packed + b"\x00" * (4 - size)
        off = overflow_base + len(overflow)
        overflow.extend(packed)
        return struct.pack(bo + "I", off)

    # strip locations come after the overflow area; reserve via 2 passes
    strip_area: list[int] = []

    def build(strip_data_base: int) -> bytes:
        offs, pos = [], strip_data_base
        for s in strips:
            offs.append(pos)
            pos += len(s)
        all_tags = dict(tags)
        all_tags[273] = (4, offs)
        all_tags[279] = (4, [len(s) for s in strips])
        overflow.clear()
        body = struct.pack(bo + "H", n_tags)
        for tag in sorted(all_tags):
            typ, vals = all_tags[tag]
            body += struct.pack(bo + "HHI", tag, typ, len(vals))
            body += tag_value(typ, vals)
        body += struct.pack(bo + "I", 0)  # next IFD
        return body

    body = build(0)  # sizing pass (overflow filled)
    strip_base = overflow_base + len(overflow)
    body = build(strip_base)
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    return (
        magic
        + struct.pack(bo + "I", ifd_off)
        + body
        + bytes(overflow)
        + b"".join(strips)
    )


def _gray(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _rgb(h, w, seed=4):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_uncompressed_gray_le_and_be():
    px = _gray(9, 13)
    for bo in ("<", ">"):
        w, h, got = tiff_decode(write_tiff(px, bo=bo))
        assert (w, h) == (13, 9)
        assert np.array_equal(got, px)


def test_uncompressed_rgb_multi_strip():
    px = _rgb(8, 5)
    w, h, got = tiff_decode(write_tiff(px, rows_per_strip=3))
    assert (w, h) == (5, 8)
    assert np.array_equal(got, px)


def test_lzw_gray_crosses_width_boundaries():
    """Random 80x80 builds >510 LZW table entries — any early-change
    desync corrupts everything past the 9→10 bit switch."""
    px = _gray(80, 80, seed=11)
    w, h, got = tiff_decode(write_tiff(px, compression=5))
    assert np.array_equal(got, px)


def test_lzw_rgb_with_horizontal_predictor():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 40, size=(16, 24, 3), dtype=np.uint8)
    px = np.cumsum(base, axis=1).astype(np.uint8)  # smooth → predictor wins
    w, h, got = tiff_decode(
        write_tiff(px, compression=5, predictor=2)
    )
    assert np.array_equal(got, px)


def test_lzw_16bit_gray_predictor_be():
    rng = np.random.default_rng(6)
    px = rng.integers(0, 1 << 16, size=(7, 9), dtype=np.uint16)
    w, h, got = tiff_decode(
        write_tiff(px, bo=">", compression=5, predictor=2)
    )
    assert got.dtype == np.uint16
    assert np.array_equal(got.astype(np.uint16), px)


def test_packbits_gray_runs_and_literals():
    px = np.zeros((6, 50), dtype=np.uint8)
    px[:, 10:20] = 200  # runs
    px[0, :7] = np.arange(7)  # literals
    w, h, got = tiff_decode(write_tiff(px, compression=32773))
    assert np.array_equal(got, px)


def test_bilevel_whitesiszero_inverts_to_intensity():
    px = np.zeros((4, 10), dtype=np.uint8)
    px[1, 2:5] = 1
    payload = write_tiff(px, bits=1, photometric=0)
    w, h, got = tiff_decode(payload)
    # WhiteIsZero: stored 0 = white → intensity 255; stored 1 → 0
    expect = np.where(px == 1, 0, 255).astype(np.uint8)
    assert np.array_equal(got, expect)


def test_palette_maps_through_colormap():
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    # 16-bit colormap entries, R plane then G then B for 256 entries
    n = 256
    cmap = [0] * (3 * n)
    colors = {0: (255, 0, 0), 1: (0, 255, 0), 2: (0, 0, 255)}
    for i, (r, g, b) in colors.items():
        cmap[i] = r * 257
        cmap[n + i] = g * 257
        cmap[2 * n + i] = b * 257
    w, h, got = tiff_decode(
        write_tiff(idx, photometric=3, colormap=cmap)
    )
    assert got.shape == (2, 2, 3)
    assert tuple(got[0, 0]) == (255, 0, 0)
    assert tuple(got[0, 1]) == (0, 255, 0)
    assert tuple(got[1, 0]) == (0, 0, 255)


def test_unsupported_shapes_raise_loudly():
    px = _gray(4, 4)
    # tiled TIFF is real now (write_tiled_tiff tests below); a strip
    # file with a stray TileWidth tag is missing its tile table
    with pytest.raises(ValueError, match="missing required tag"):
        tiff_decode(write_tiff(px, extra_tags={322: (4, [16])}))
    # planar config 2 decodes now (write_planar_tiff tests below); on
    # single-sample data it is equivalent to chunky
    w, h, out = tiff_decode(write_tiff(px, extra_tags={284: (3, [2])}))
    np.testing.assert_array_equal(out, px)
    with pytest.raises(ValueError, match="planar configuration 3"):
        tiff_decode(write_tiff(px, extra_tags={284: (3, [3])}))
    # compression 7 is real now (JPEG-in-TIFF tests below); CCITT G4
    # stays the documented long-tail slot
    with pytest.raises(NotImplementedError, match="compression"):
        tiff_decode(write_tiff(px, extra_tags={259: (3, [4])}))
    with pytest.raises(ValueError, match="magic"):
        tiff_decode(b"NOPE" + bytes(16))


def test_decode_image_dispatches_tiff():
    from kinesis_vcr_spark.operators.multimodal import decode_image

    px = _gray(5, 7)
    out = decode_image(write_tiff(px, compression=5))
    assert out["width"] == 7 and out["height"] == 5
    assert out["mean_value"] == pytest.approx(float(px.mean()))


def _pack9(codes):
    """MSB-first 9-bit code packer (enough for tiny clear-run streams)."""
    bits = "".join(f"{c:09b}" for c in codes)
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def test_lzw_tolerates_runs_of_clear_codes():
    """CLEAR CLEAR 'A' EOI decodes to b'A' — libtiff accepts clear runs;
    treating the second clear as data would emit b'' and corrupt the
    table (r08 ADVICE)."""
    from kinesis_vcr_spark.operators.tiff import _lzw_decode

    assert _lzw_decode(_pack9([256, 256, 256, ord("A"), 257])) == b"A"


def test_lzw_rejects_high_code_after_clear():
    from kinesis_vcr_spark.operators.tiff import _lzw_decode

    with pytest.raises(ValueError, match="after clear"):
        _lzw_decode(_pack9([256, 300, 257]))


# ------------------------------------------------------------- tiling

def write_tiled_tiff(
    pixels: np.ndarray,
    *,
    bo: str = "<",
    compression: int = 1,
    predictor: int = 1,
    tile_w: int = 16,
    tile_l: int = 16,
    bits: int | None = None,
    photometric: int | None = None,
    tiles_override: list[bytes] | None = None,
) -> bytes:
    """Minimal spec-following TILED TIFF writer: every tile is a full
    tile_w×tile_l segment (edge tiles zero-padded), compressed
    independently, with the predictor applied per tile row.
    ``tiles_override`` bypasses tile encoding with caller-provided
    segment bytes (JPEG-in-TIFF)."""
    h, w = pixels.shape[:2]
    spp = 1 if pixels.ndim == 2 else pixels.shape[2]
    if bits is None:
        bits = 16 if pixels.dtype == np.uint16 else (8 if pixels.dtype == np.uint8 else 1)
    if photometric is None:
        photometric = 2 if spp >= 3 else 1
    px3 = pixels.reshape(h, w, spp)
    if tiles_override is not None:
        tiles = list(tiles_override)
    else:
        tiles = []
        for y0 in range(0, h, tile_l):
            for x0 in range(0, w, tile_w):
                tile = np.zeros((tile_l, tile_w, spp), dtype=pixels.dtype)
                src = px3[y0 : y0 + tile_l, x0 : x0 + tile_w]
                tile[: src.shape[0], : src.shape[1]] = src
                if predictor == 2:
                    d = tile.astype(np.int32)
                    diff = d.copy()
                    diff[:, 1:] = (d[:, 1:] - d[:, :-1]) % (1 << bits)
                    tile = diff.astype(pixels.dtype)
                if bits == 1:
                    raw = b"".join(
                        np.packbits(tile[r, :, 0].astype(np.uint8)).tobytes()
                        for r in range(tile_l)
                    )
                elif bits == 16:
                    raw = tile.astype(np.dtype(bo + "u2")).tobytes()
                else:
                    raw = tile.astype(np.uint8).tobytes()
                if compression == 5:
                    tiles.append(lzw_encode(raw))
                elif compression == 32773:
                    tiles.append(packbits_encode(raw))
                else:
                    tiles.append(raw)

    tags: dict[int, tuple[int, list[int]]] = {
        256: (4, [w]),
        257: (4, [h]),
        258: (3, [bits] * spp),
        259: (3, [compression]),
        262: (3, [photometric]),
        277: (3, [spp]),
        322: (4, [tile_w]),
        323: (4, [tile_l]),
    }
    if predictor != 1:
        tags[317] = (3, [predictor])
    n_tags = len(tags) + 2  # + TileOffsets/TileByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n_tags + 4
    overflow = bytearray()
    overflow_base = ifd_off + ifd_size

    def tag_value(typ: int, vals: list[int]) -> bytes:
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        size = struct.calcsize(fmt) * len(vals)
        packed = struct.pack(bo + fmt * len(vals), *vals)
        if size <= 4:
            return packed + b"\x00" * (4 - size)
        off = overflow_base + len(overflow)
        overflow.extend(packed)
        return struct.pack(bo + "I", off)

    def build(data_base: int) -> bytes:
        offs, pos = [], data_base
        for t in tiles:
            offs.append(pos)
            pos += len(t)
        all_tags = dict(tags)
        all_tags[324] = (4, offs)
        all_tags[325] = (4, [len(t) for t in tiles])
        overflow.clear()
        body = struct.pack(bo + "H", n_tags)
        for tag in sorted(all_tags):
            typ, vals = all_tags[tag]
            body += struct.pack(bo + "HHI", tag, typ, len(vals))
            body += tag_value(typ, vals)
        body += struct.pack(bo + "I", 0)
        return body

    body = build(0)
    tile_base = overflow_base + len(overflow)
    body = build(tile_base)
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    return magic + struct.pack(bo + "I", ifd_off) + body + bytes(overflow) + b"".join(tiles)


def test_tiled_uncompressed_rgb_edge_crop_both_byte_orders():
    img = _rgb(21, 29, seed=8)  # 2x2 grid of 16px tiles, ragged edges
    for bo in ("<", ">"):
        w, h, out = tiff_decode(write_tiled_tiff(img, bo=bo))
        assert (w, h) == (29, 21)
        np.testing.assert_array_equal(out, img)


def test_tiled_lzw_gray_with_predictor_resets_per_tile():
    img = _gray(40, 40, seed=9)
    data = write_tiled_tiff(img, compression=5, predictor=2, tile_w=16, tile_l=16)
    w, h, out = tiff_decode(data)
    np.testing.assert_array_equal(out, img)


def test_tiled_packbits_16bit_be():
    rng = np.random.default_rng(10)
    img = rng.integers(0, 1 << 16, size=(18, 20), dtype=np.uint16)
    data = write_tiled_tiff(img, bo=">", compression=32773, tile_w=16, tile_l=16)
    w, h, out = tiff_decode(data)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def test_tiled_bilevel_and_short_tile_table():
    img = (_gray(20, 24, seed=11) > 127).astype(np.uint8)
    data = write_tiled_tiff(img, bits=1, tile_w=16, tile_l=16)
    w, h, out = tiff_decode(data)
    np.testing.assert_array_equal(out, img * np.uint8(255))
    # a tile table shorter than the grid fails loudly
    import pytest as _pytest

    bad = write_tiled_tiff(img, bits=1, tile_w=8, tile_l=8)
    # corrupt: shrink the TileOffsets count in the IFD
    with _pytest.raises(ValueError):
        tiff_decode(bad[:200])


# ------------------------------------------------------------ planar 2

def write_planar_tiff(
    pixels: np.ndarray,
    *,
    bo: str = "<",
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Planar-configuration-2 writer: the strip table holds all strips
    of sample 0, then sample 1, ... (TIFF6 §3, PlanarConfiguration)."""
    h, w, spp = pixels.shape
    bits = 16 if pixels.dtype == np.uint16 else 8
    rps = rows_per_strip or h
    strips = []
    for c in range(spp):
        plane = pixels[:, :, c]
        for s0 in range(0, h, rps):
            rows = plane[s0 : s0 + rps].astype(np.int32)
            if predictor == 2:
                diff = rows.copy()
                diff[:, 1:] = (rows[:, 1:] - rows[:, :-1]) % (1 << bits)
                rows = diff
            if bits == 16:
                raw = rows.astype(np.dtype(bo + "u2")).tobytes()
            else:
                raw = rows.astype(np.uint8).tobytes()
            if compression == 5:
                strips.append(lzw_encode(raw))
            elif compression == 32773:
                strips.append(packbits_encode(raw))
            else:
                strips.append(raw)

    tags: dict[int, tuple[int, list[int]]] = {
        256: (4, [w]),
        257: (4, [h]),
        258: (3, [bits] * spp),
        259: (3, [compression]),
        262: (3, [2]),
        277: (3, [spp]),
        278: (4, [rps]),
        284: (3, [2]),
    }
    if predictor != 1:
        tags[317] = (3, [predictor])
    n_tags = len(tags) + 2
    ifd_off = 8
    ifd_size = 2 + 12 * n_tags + 4
    overflow = bytearray()
    overflow_base = ifd_off + ifd_size

    def tag_value(typ: int, vals: list[int]) -> bytes:
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        size = struct.calcsize(fmt) * len(vals)
        packed = struct.pack(bo + fmt * len(vals), *vals)
        if size <= 4:
            return packed + b"\x00" * (4 - size)
        off = overflow_base + len(overflow)
        overflow.extend(packed)
        return struct.pack(bo + "I", off)

    def build(data_base: int) -> bytes:
        offs, pos = [], data_base
        for s in strips:
            offs.append(pos)
            pos += len(s)
        all_tags = dict(tags)
        all_tags[273] = (4, offs)
        all_tags[279] = (4, [len(s) for s in strips])
        overflow.clear()
        body = struct.pack(bo + "H", n_tags)
        for tag in sorted(all_tags):
            typ, vals = all_tags[tag]
            body += struct.pack(bo + "HHI", tag, typ, len(vals))
            body += tag_value(typ, vals)
        body += struct.pack(bo + "I", 0)
        return body

    body = build(0)
    data_base = overflow_base + len(overflow)
    body = build(data_base)
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    return magic + struct.pack(bo + "I", ifd_off) + body + bytes(overflow) + b"".join(strips)


def test_planar_rgb_multi_strip_both_byte_orders():
    img = _rgb(13, 9, seed=12)
    for bo in ("<", ">"):
        w, h, out = tiff_decode(write_planar_tiff(img, bo=bo, rows_per_strip=5))
        assert (w, h) == (9, 13)
        np.testing.assert_array_equal(out, img)


def test_planar_lzw_predictor_per_plane():
    img = _rgb(10, 17, seed=13)
    data = write_planar_tiff(img, compression=5, predictor=2, rows_per_strip=4)
    w, h, out = tiff_decode(data)
    np.testing.assert_array_equal(out, img)


def test_planar_16bit_packbits():
    rng = np.random.default_rng(14)
    img = rng.integers(0, 1 << 16, size=(6, 7, 3), dtype=np.uint16)
    data = write_planar_tiff(img, bo=">", compression=32773)
    w, h, out = tiff_decode(data)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def test_planar_strip_table_too_short_fails_loudly():
    img = _rgb(8, 8, seed=15)
    data = write_planar_tiff(img)
    # retag spp→4 without adding plane strips: table now too short
    # (simpler: truncate the file at the IFD → offsets invalid)
    with pytest.raises(ValueError):
        tiff_decode(data[:40])


# ------------------------------------------------- new-style JPEG (7)

from tests.jpeg_ref import encode_jpeg  # noqa: E402  (independent encoder)


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full JFIF stream into (JPEGTables stream, abbreviated
    stream) per TIFF TechNote 2: DQT/DHT segments move into an
    SOI..EOI tables stream; everything else (SOF/SOS/scan) stays, so
    the abbreviated strip only decodes with the tables spliced back."""
    assert stream[:2] == b"\xff\xd8"
    tables = b""
    rest = b""
    pos = 2
    while pos < len(stream):
        marker = stream[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seglen]
        pos += 2 + seglen
        if marker in (0xDB, 0xC4):  # DQT / DHT -> tables stream
            tables += seg
        elif marker == 0xDA:  # SOS: the scan runs to EOI
            rest += seg + stream[pos : len(stream) - 2]
            pos = len(stream) - 2
        else:
            rest += seg
    return (b"\xff\xd8" + tables + b"\xff\xd9",
            b"\xff\xd8" + rest + b"\xff\xd9")


def test_jpeg_in_tiff_gray_strips_exact():
    """Two flat-gray JPEG strips decode EXACTLY (DC quantizes without
    remainder at quality_divisor=8), both byte orders."""
    img = np.vstack(
        [np.full((8, 16), 100, np.uint8), np.full((8, 16), 164, np.uint8)]
    )
    strips = [
        encode_jpeg(img[0:8], quality_divisor=8),
        encode_jpeg(img[8:16], quality_divisor=8),
    ]
    for bo in ("<", ">"):
        data = write_tiff(
            img, bo=bo, compression=7, photometric=1,
            rows_per_strip=8, strips_override=strips,
        )
        w, h, out = tiff_decode(data)
        assert (w, h) == (16, 16)
        np.testing.assert_array_equal(out, img)


def test_jpeg_in_tiff_strip_mcu_padding_cropped():
    """A 12-row image in one strip whose JPEG frame is 12 rows: the
    decoder's row slice crops the frame's internal MCU padding."""
    yy = np.linspace(60, 180, 12 * 24).reshape(12, 24)
    img = (yy * 0.5 + 80).astype(np.uint8)
    strips = [encode_jpeg(img, quality_divisor=4)]
    data = write_tiff(
        img, compression=7, photometric=1, strips_override=strips
    )
    w, h, out = tiff_decode(data)
    assert (w, h) == (24, 12)
    mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
    assert mse < 40.0


def test_jpeg_in_tiff_ycbcr_tiles():
    """Color tiles, photometric 6: each tile a full 16x16 YCbCr JPEG,
    decoded to RGB and edge-cropped on assembly."""
    yy, xx = np.mgrid[0:24, 0:20]
    img = np.stack(
        [
            (80 + yy * 2).clip(0, 255),
            (60 + xx * 3).clip(0, 255),
            np.full_like(yy, 120),
        ],
        axis=-1,
    ).astype(np.uint8)
    tiles = []
    for y0 in range(0, 24, 16):
        for x0 in range(0, 20, 16):
            tile = np.zeros((16, 16, 3), np.uint8)
            src = img[y0 : y0 + 16, x0 : x0 + 16]
            tile[: src.shape[0], : src.shape[1]] = src
            tiles.append(encode_jpeg(tile, quality_divisor=4))
    data = write_tiled_tiff(
        img, compression=7, photometric=6, tile_w=16, tile_l=16,
        tiles_override=tiles,
    )
    w, h, out = tiff_decode(data)
    assert (w, h) == (20, 24)
    assert out.shape == (24, 20, 3)
    mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
    assert mse < 60.0


def test_jpeg_in_tiff_jpegtables_abbreviated_matches_full():
    """Abbreviated strips + JPEGTables tag 347 (type UNDEFINED) decode
    bit-identically to the same strips with inline tables."""
    # identical strip content: the independent encoder emits
    # content-adaptive Huffman tables, and ONE JPEGTables stream must
    # serve every strip of the IFD (TechNote 2)
    img = np.vstack(
        [np.full((8, 16), 90, np.uint8), np.full((8, 16), 90, np.uint8)]
    )
    full = [
        encode_jpeg(img[0:8], quality_divisor=8),
        encode_jpeg(img[8:16], quality_divisor=8),
    ]
    tables0, abbrev0 = _split_jpeg_tables(full[0])
    tables1, abbrev1 = _split_jpeg_tables(full[1])
    assert tables0 == tables1
    data_abbrev = write_tiff(
        img, compression=7, photometric=1, rows_per_strip=8,
        strips_override=[abbrev0, abbrev1],
        extra_tags={347: (7, list(tables0))},
    )
    data_full = write_tiff(
        img, compression=7, photometric=1, rows_per_strip=8,
        strips_override=full,
    )
    wa, ha, out_a = tiff_decode(data_abbrev)
    wf, hf, out_f = tiff_decode(data_full)
    np.testing.assert_array_equal(out_a, out_f)
    np.testing.assert_array_equal(out_a, img)


def test_jpeg_in_tiff_guards():
    img = np.full((8, 8), 77, np.uint8)
    strip = encode_jpeg(img, quality_divisor=8)
    # old-style JPEG (6) stays a loud slot
    with pytest.raises(NotImplementedError, match="old-style"):
        tiff_decode(
            write_tiff(img, compression=6, strips_override=[strip])
        )
    # photometric 2 with JPEG needs the suppressed-transform oddity
    with pytest.raises(NotImplementedError, match="photometric"):
        tiff_decode(
            write_tiff(
                np.dstack([img] * 3), compression=7, photometric=2,
                strips_override=[strip],
            )
        )
    # YCbCr without JPEG compression is not a baseline layout
    with pytest.raises(NotImplementedError, match="YCbCr"):
        tiff_decode(write_tiff(np.dstack([img] * 3), photometric=6))
    # frame dims must agree with the IFD
    with pytest.raises(ValueError, match="disagree"):
        tiff_decode(
            write_tiff(
                np.full((8, 12), 77, np.uint8), compression=7,
                photometric=1, strips_override=[strip],
            )
        )
    # a JPEGTables tag that is not SOI..EOI fails loudly
    with pytest.raises(ValueError, match="JPEGTables"):
        tiff_decode(
            write_tiff(
                img, compression=7, photometric=1,
                strips_override=[strip],
                extra_tags={347: (7, [1, 2, 3, 4, 5])},
            )
        )
