"""WebP lossless decode (operators/webp.py) against an INDEPENDENT
minimal VP8L writer assembled from the lossless bitstream spec in this
file — the fixture discipline that landed GIF, progressive JPEG and
TIFF: the encoder implements the spec's ENCODER rules (forward
transforms, canonical code assignment, prefix-split of LZ77 values),
the decoder the spec's DECODER rules, so any convention error (bit
order, canonical direction, distance map, truncating division in
predictor 13) breaks a roundtrip rather than cancelling out."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kinesis_vcr_spark.operators.webp import _DIST_MAP, vp8l_decode, webp_decode

# ------------------------------------------------------------- writer


class W:
    """LSB-first bit writer (spec bit order)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, n: int) -> None:
        for i in range(n):
            self.acc |= ((v >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def bytes(self) -> bytes:
        return bytes(self.buf) + (bytes([self.acc]) if self.n else b"")


def canon(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Canonical (length, symbol)-ordered code assignment; a
    single-symbol code is zero bits (spec special case)."""
    if len(lengths) == 1:
        return {next(iter(lengths)): (0, 0)}
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len: int | None = None
    for ln, sym in sorted((ln, s) for s, ln in lengths.items()):
        if prev_len is not None:
            code = (code + 1) << (ln - prev_len)
        codes[sym] = (ln, code)
        prev_len = ln
    return codes


def put_code(w: W, codes: dict[int, tuple[int, int]], sym: int) -> None:
    ln, c = codes[sym]
    for i in range(ln):  # MSB of the canonical code is read first
        w.put((c >> (ln - 1 - i)) & 1, 1)


def balanced(used: list[int]) -> dict[int, int]:
    """Complete code: with k symbols and L=ceil(log2 k), the first
    2^L - k symbols get length L-1, the rest L (Kraft-exact)."""
    k = len(used)
    if k == 1:
        return {used[0]: 1}
    level = (k - 1).bit_length()
    short = (1 << level) - k
    return {s: (level - 1 if i < short else level) for i, s in enumerate(used)}


CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def emit_code(
    w: W, alphabet: int, used: set[int], force_normal: bool = False
) -> dict[int, tuple[int, int]]:
    syms = sorted(used) if used else [0]
    if not force_normal and len(syms) <= 2 and syms[-1] < 256:
        w.put(1, 1)  # simple
        w.put(len(syms) - 1, 1)
        if syms[0] <= 1:
            w.put(0, 1)
            w.put(syms[0], 1)
        else:
            w.put(1, 1)
            w.put(syms[0], 8)
        if len(syms) == 2:
            w.put(syms[1], 8)
            return {syms[0]: (1, 0), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    lengths = balanced(syms)
    w.put(0, 1)  # normal
    w.put(15, 4)  # all 19 code-length codes present
    cl_used = sorted(set(lengths.values()) | ({0} if len(syms) < alphabet else set()))
    cl_codes = canon(balanced(cl_used))
    cl_bits = {s: ln for s, ln in balanced(cl_used).items()}
    for sym in CLC_ORDER:
        w.put(cl_bits.get(sym, 0), 3)
    w.put(0, 1)  # no max_symbol cap
    for s in range(alphabet):
        put_code(w, cl_codes, lengths.get(s, 0))
    return canon(lengths)


def prefix_split(value: int) -> tuple[int, int, int]:
    """LZ77 value → (prefix code, extra bits, extra value)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    for code in range(4, 40):
        eb = (code - 2) >> 1
        off = (2 + (code & 1)) << eb
        if off <= v < off + (1 << eb):
            return code, eb, v - off
    raise AssertionError(f"no prefix code for {value}")


def emit_body(
    w: W,
    grouped: list[tuple[int, tuple]],
    num_groups: int = 1,
    cache_bits: int = 0,
    level0: bool = True,
    meta: dict | None = None,
    force_normal: bool = False,
) -> None:
    """Emit the transforms-done bit (level 0; any transforms were
    already emitted by the caller, each opening with its own 1-bit),
    cache header, optional meta-Huffman image, the per-group code
    quintuples, then the token stream. Tokens: ("lit", a,r,g,b),
    ("copy", length, dist_code_value), ("cache", index)."""
    if level0:
        w.put(0, 1)  # no more transforms
    w.put(1 if cache_bits else 0, 1)
    if cache_bits:
        w.put(cache_bits, 4)
    if level0:
        if meta is None:
            w.put(0, 1)
        else:
            w.put(1, 1)
            w.put(meta["hbits"] - 2, 3)
            emit_body(w, [(0, t) for t in meta["tokens"]], level0=False)
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    group_codes = []
    for g in range(num_groups):
        greens: set[int] = set()
        reds: set[int] = set()
        blues: set[int] = set()
        alphas: set[int] = set()
        dists: set[int] = set()
        for gi, t in grouped:
            if gi != g:
                continue
            if t[0] == "lit":
                _, a, r, gg, b = t
                greens.add(gg)
                reds.add(r)
                blues.add(b)
                alphas.add(a)
            elif t[0] == "copy":
                greens.add(256 + prefix_split(t[1])[0])
                dists.add(prefix_split(t[2])[0])
            else:
                greens.add(280 + t[1])
        group_codes.append(
            (
                emit_code(w, green_size, greens, force_normal),
                emit_code(w, 256, reds, force_normal),
                emit_code(w, 256, blues, force_normal),
                emit_code(w, 256, alphas, force_normal),
                emit_code(w, 40, dists, force_normal),
            )
        )
    for gi, t in grouped:
        cg, cr, cb, ca, cd = group_codes[gi]
        if t[0] == "lit":
            _, a, r, gg, b = t
            put_code(w, cg, gg)
            put_code(w, cr, r)
            put_code(w, cb, b)
            put_code(w, ca, a)
        elif t[0] == "copy":
            code, eb, ev = prefix_split(t[1])
            put_code(w, cg, 256 + code)
            w.put(ev, eb)
            code, eb, ev = prefix_split(t[2])
            put_code(w, cd, code)
            w.put(ev, eb)
        else:
            put_code(w, cg, 280 + t[1])


def vp8l_bytes(w: int, h: int, alpha: int, body) -> bytes:
    wr = W()
    wr.put(0x2F, 8)
    wr.put(w - 1, 14)
    wr.put(h - 1, 14)
    wr.put(alpha, 1)
    wr.put(0, 3)
    body(wr)
    return wr.bytes()


def container(vp8l_payload: bytes, extra_chunks: list[tuple[bytes, bytes]] = ()) -> bytes:
    chunks = b""
    for tag, data in extra_chunks:
        chunks += tag + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            chunks += b"\x00"
    chunks += b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def lit(a: int, r: int, g: int, b: int) -> tuple:
    return ("lit", a, r, g, b)


def lits(pixels: list[int]) -> list[tuple[int, tuple]]:
    """ARGB ints → group-0 literal tokens."""
    return [
        (0, lit((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF))
        for p in pixels
    ]


def rgba(px_argb: list[int], w: int, h: int) -> np.ndarray:
    arr = np.array(px_argb, dtype=np.uint32).reshape(h, w)
    return np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF, arr >> 24], axis=-1
    ).astype(np.uint8)


def deterministic_pixels(n: int, seed: int = 7) -> list[int]:
    out = []
    v = seed
    for _ in range(n):
        v = (v * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(0xFF000000 | (v & 0xFFFFFF))
    return out


# ------------------------------------------------------ distance table

def test_distance_map_matches_spec_table():
    # Distinctive runs transcribed from the spec's 120-entry table pin
    # the generation rule (d² asc, row desc, +x before -x).
    assert _DIST_MAP[:8] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2)]
    assert _DIST_MAP[8:12] == [(2, 1), (-2, 1), (2, 2), (-2, 2)]
    assert _DIST_MAP[34:40] == [(0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
    assert _DIST_MAP[22:24] == [(0, 4), (4, 0)]
    assert len(set(_DIST_MAP)) == 120


# ---------------------------------------------------------- roundtrips

def test_literal_roundtrip_normal_codes():
    w, h = 7, 5
    px = deterministic_pixels(w * h)
    payload = vp8l_bytes(w, h, 1, lambda wr: emit_body(wr, lits(px), force_normal=True))
    dw, dh, out = vp8l_decode(payload)
    assert (dw, dh) == (w, h)
    assert out.shape == (h, w, 4)
    np.testing.assert_array_equal(out, rgba(px, w, h))


def test_simple_codes_solid_and_two_color():
    # 1-symbol simple codes everywhere (solid color, 8-bit symbol path)
    px = [0xFF204060] * 12
    payload = vp8l_bytes(4, 3, 1, lambda wr: emit_body(wr, lits(px)))
    _, _, out = vp8l_decode(payload)
    np.testing.assert_array_equal(out, rgba(px, 4, 3))
    # 2-symbol simple green code + 1-bit first-symbol path (green 0/1)
    px2 = [0xFF000000 | (x & 1) << 8 for x in range(16)]
    payload2 = vp8l_bytes(8, 2, 1, lambda wr: emit_body(wr, lits(px2)))
    _, _, out2 = vp8l_decode(payload2)
    np.testing.assert_array_equal(out2, rgba(px2, 8, 2))


def test_no_alpha_header_gives_rgb():
    px = [0xFF112233] * 6
    payload = vp8l_bytes(3, 2, 0, lambda wr: emit_body(wr, lits(px)))
    _, _, out = vp8l_decode(payload)
    assert out.shape == (2, 3, 3)
    assert tuple(out[0, 0]) == (0x11, 0x22, 0x33)


def test_lz77_row_copy_via_2d_distance():
    # literal first row, then one backref copying it down the image:
    # dist code 1 maps to offset (0,1) = one row up
    w, h = 6, 5
    row = deterministic_pixels(w, seed=3)
    tokens = lits(row) + [(0, ("copy", (h - 1) * w, 1))]
    payload = vp8l_bytes(w, h, 1, lambda wr: emit_body(wr, tokens))
    _, _, out = vp8l_decode(payload)
    np.testing.assert_array_equal(out, rgba(row * h, w, h))


def test_lz77_linear_distance_beyond_120():
    # distance codes above 120 are plain distances minus 120
    w, h = 16, 10
    head = deterministic_pixels(130, seed=11)
    dist = 125
    tokens = lits(head) + [(0, ("copy", 30, dist + 120))]
    expected = list(head)
    for _ in range(30):
        expected.append(expected[-dist])
    payload = vp8l_bytes(w, h, 1, lambda wr: emit_body(wr, tokens))
    _, _, out = vp8l_decode(payload)
    np.testing.assert_array_equal(out, rgba(expected, w, h))


def cache_index(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def test_color_cache_hits_and_copy_insertion():
    bits = 4
    a_px, b_px = 0xFF123456, 0xFF654321
    ia, ib = cache_index(a_px, bits), cache_index(b_px, bits)
    assert ia != ib  # fixture sanity
    # lit A, lit B, copy(2, dist 2) re-emits A B (inserting them again),
    # then two cache hits referencing A and B
    tokens = (
        lits([a_px, b_px])
        + [(0, ("copy", 2, 120 + 2))]
        + [(0, ("cache", ia)), (0, ("cache", ib))]
    )
    payload = vp8l_bytes(6, 1, 1, lambda wr: emit_body(wr, tokens, cache_bits=bits))
    _, _, out = vp8l_decode(payload)
    np.testing.assert_array_equal(out, rgba([a_px, b_px, a_px, b_px, a_px, b_px], 6, 1))


# ---------------------------------------------------------- transforms

def sub_px(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= (((a >> sh) - (b >> sh)) & 0xFF) << sh
    return out


def test_subtract_green_transform():
    w, h = 5, 4
    px = deterministic_pixels(w * h, seed=21)
    fwd = []
    for p in px:
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) - g) & 0xFF
        b = ((p & 0xFF) - g) & 0xFF
        fwd.append((p & 0xFF00FF00) | (r << 16) | b)

    def body(wr: W) -> None:
        wr.put(1, 1)  # a transform follows
        wr.put(2, 2)  # subtract green
        emit_body(wr, lits(fwd))

    _, _, out = vp8l_decode(vp8l_bytes(w, h, 1, body))
    np.testing.assert_array_equal(out, rgba(px, w, h))


# independent per-channel predictor reimplementation (spec text)

def _ch(p: int, sh: int) -> int:
    return (p >> sh) & 0xFF


def _avg2_ref(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((_ch(a, sh) + _ch(b, sh)) >> 1) << sh
    return out


def _select_ref(left: int, top: int, topleft: int) -> int:
    p_l = sum(abs(_ch(left, s) + _ch(top, s) - _ch(topleft, s) - _ch(left, s)) for s in (24, 16, 8, 0))
    p_t = sum(abs(_ch(left, s) + _ch(top, s) - _ch(topleft, s) - _ch(top, s)) for s in (24, 16, 8, 0))
    return left if p_l < p_t else top


def _clamp_full_ref(left: int, top: int, topleft: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= max(0, min(255, _ch(left, sh) + _ch(top, sh) - _ch(topleft, sh))) << sh
    return out


def _clamp_half_ref(left: int, top: int, topleft: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        ave = (_ch(left, sh) + _ch(top, sh)) >> 1
        d = ave - _ch(topleft, sh)
        half = abs(d) // 2 * (1 if d >= 0 else -1)  # C trunc toward zero
        out |= max(0, min(255, ave + half)) << sh
    return out


def _predict_ref(out: list[int], idx: int, x: int, y: int, w: int, mode: int) -> int:
    if y == 0:
        return 0xFF000000 if x == 0 else out[idx - 1]
    if x == 0:
        return out[idx - w]
    left, top, topleft = out[idx - 1], out[idx - w], out[idx - w - 1]
    topright = out[idx - w + 1]  # x==w-1 wraps to row start, flat buffer
    return [
        lambda: 0xFF000000,
        lambda: left,
        lambda: top,
        lambda: topright,
        lambda: topleft,
        lambda: _avg2_ref(_avg2_ref(left, topright), top),
        lambda: _avg2_ref(left, topleft),
        lambda: _avg2_ref(left, top),
        lambda: _avg2_ref(topleft, top),
        lambda: _avg2_ref(top, topright),
        lambda: _avg2_ref(_avg2_ref(left, topleft), _avg2_ref(top, topright)),
        lambda: _select_ref(left, top, topleft),
        lambda: _clamp_full_ref(left, top, topleft),
        lambda: _clamp_half_ref(left, top, topleft),
    ][mode]()


def test_predictor_transform_all_modes():
    # 16x16 image, 4-px blocks (bits=2) → a 4x4 mode grid covering all
    # 14 predictor modes (last two repeat 7 and 13)
    w = h = 16
    bits = 2
    modes = list(range(14)) + [7, 13]
    px = deterministic_pixels(w * h, seed=5)
    residuals = []
    for y in range(h):
        for x in range(w):
            idx = y * w + x
            m = modes[(y >> bits) * 4 + (x >> bits)]
            residuals.append(sub_px(px[idx], _predict_ref(px, idx, x, y, w, m)))
    mode_tokens = [(0, lit(0xFF, 0, m, 0)) for m in modes]

    def body(wr: W) -> None:
        wr.put(1, 1)
        wr.put(0, 2)  # predictor transform
        wr.put(bits - 2, 3)
        emit_body(wr, mode_tokens, level0=False)
        emit_body(wr, lits(residuals), force_normal=True)

    _, _, out = vp8l_decode(vp8l_bytes(w, h, 1, body))
    np.testing.assert_array_equal(out, rgba(px, w, h))


def _cdelta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def test_color_transform():
    w, h = 8, 4
    bits = 2  # 4-px blocks → 2x1 grid
    ctes = [(0x40, 0x90, 0x15), (0xE0, 0x08, 0x7F)]  # (g2r, g2b, r2b), ± values
    px = deterministic_pixels(w * h, seed=13)
    fwd = []
    for y in range(h):
        for x in range(w):
            p = px[y * w + x]
            g2r, g2b, r2b = ctes[x >> bits]
            g = (p >> 8) & 0xFF
            r = (p >> 16) & 0xFF
            b = p & 0xFF
            nr = (r - _cdelta(g2r, g)) & 0xFF
            nb = (b - _cdelta(g2b, g) - _cdelta(r2b, r)) & 0xFF
            fwd.append((p & 0xFF00FF00) | (nr << 16) | nb)
    cte_tokens = [
        (0, lit(0xFF, r2b, g2b, g2r)) for (g2r, g2b, r2b) in ctes
    ]

    def body(wr: W) -> None:
        wr.put(1, 1)
        wr.put(1, 2)  # color transform
        wr.put(bits - 2, 3)
        emit_body(wr, cte_tokens, level0=False)
        emit_body(wr, lits(fwd), force_normal=True)

    _, _, out = vp8l_decode(vp8l_bytes(w, h, 1, body))
    np.testing.assert_array_equal(out, rgba(px, w, h))


def _palette_body(palette: list[int], indices: list[int], w: int) -> bytes:
    """Emit a color-indexing transform + packed index image."""
    n = len(palette)
    width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
    deltas = [palette[0]] + [sub_px(palette[i], palette[i - 1]) for i in range(1, n)]
    packed_w = (w + (1 << width_bits) - 1) >> width_bits
    h = len(indices) // w
    packed: list[int] = []
    for y in range(h):
        row = indices[y * w : (y + 1) * w]
        for xp in range(packed_w):
            unit = 0
            bpp = 8 >> width_bits
            for k in range(1 << width_bits):
                xi = xp * (1 << width_bits) + k
                if xi < w:
                    unit |= row[xi] << (k * bpp)
            packed.append(0xFF000000 | (unit << 8))

    def body(wr: W) -> None:
        wr.put(1, 1)
        wr.put(3, 2)  # color indexing
        wr.put(n - 1, 8)
        emit_body(wr, lits(deltas), level0=False)
        emit_body(wr, lits(packed), force_normal=True)

    return vp8l_bytes(w, h, 1, body)


@pytest.mark.parametrize("n_colors", [2, 4, 16, 20])
def test_color_indexing_all_bundle_widths(n_colors):
    w, h = 11, 3  # odd width exercises the partial final packed unit
    palette = [0xFF000000 | (i * 0x10203 + 5) & 0xFFFFFF for i in range(n_colors)]
    indices = [(x * 7 + y * 3) % n_colors for y in range(h) for x in range(w)]
    payload = _palette_body(palette, indices, w)
    dw, dh, out = vp8l_decode(payload)
    assert (dw, dh) == (w, h)
    expected = [palette[i] for i in indices]
    np.testing.assert_array_equal(out, rgba(expected, w, h))


def test_meta_huffman_two_groups():
    # 8x8, hbits=2 → 2x2 entropy image; left half group 0, right group 1
    w = h = 8
    hbits = 2
    meta_idx = [0, 1, 0, 1]  # (block row-major) meta code indices
    meta_tokens = [lit(0xFF, i >> 8, i & 0xFF, 0) for i in meta_idx]
    px, tokens = [], []
    for y in range(h):
        for x in range(w):
            gi = meta_idx[(y >> hbits) * 2 + (x >> hbits)]
            p = 0xFF000000 | (0x102030 if gi == 0 else 0x605040)
            px.append(p)
            tokens.append((gi, lit(0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)))
    payload = vp8l_bytes(
        w, h, 1,
        lambda wr: emit_body(
            wr, tokens, num_groups=2, meta={"hbits": hbits, "tokens": meta_tokens}
        ),
    )
    _, _, out = vp8l_decode(payload)
    np.testing.assert_array_equal(out, rgba(px, w, h))


# ---------------------------------------- hand-built code-length paths

def emit_solid_channels(wr: W) -> None:
    """Simple 1-symbol codes for red/blue/alpha/distance (value 0/0/255/0)."""
    for sym, wide in ((0, False), (0, False), (255, True), (0, False)):
        wr.put(1, 1)
        wr.put(0, 1)
        if wide:
            wr.put(1, 1)
            wr.put(sym, 8)
        else:
            wr.put(0, 1)
            wr.put(sym, 1)


def test_normal_code_with_16_17_18_repeats():
    # green code lengths: [2, 2, 2, 2] via literal '2' then a 16-repeat
    # (3 + extra 0), then zeros to 280 via 18-repeats (138+138) and a
    # final 17-repeat (3) plus one literal 0: 4 + 276 = 280.
    wr = W()
    wr.put(0x2F, 8)
    wr.put(3, 14)  # w=4
    wr.put(0, 14)  # h=1
    wr.put(1, 1)
    wr.put(0, 3)
    wr.put(0, 1)  # no transforms
    wr.put(0, 1)  # no cache
    wr.put(0, 1)  # no meta
    # green: normal code
    wr.put(0, 1)
    wr.put(15, 4)
    # CLC lengths: symbols {0,2,16,17,18} all length 3 (complete with
    # {0:3,2:3,16:3,17:3,18:3, plus pad syms 1,3,4 at 3}: 8 × 2^-3 = 1)
    cl_lengths = {0: 3, 1: 3, 2: 3, 3: 3, 4: 3, 16: 3, 17: 3, 18: 3}
    cl_codes = canon(cl_lengths)
    for sym in CLC_ORDER:
        wr.put(cl_lengths.get(sym, 0), 3)
    wr.put(0, 1)  # no max_symbol cap
    put_code(wr, cl_codes, 2)  # green 0 → len 2
    put_code(wr, cl_codes, 16)  # repeat prev len ×(3+extra)
    wr.put(0, 2)  # extra = 0 → greens 1..3 get len 2
    put_code(wr, cl_codes, 17)
    wr.put(7, 3)  # 3+7 = 10 zeros
    put_code(wr, cl_codes, 18)
    wr.put(127, 7)  # 11+127 = 138 zeros
    put_code(wr, cl_codes, 18)
    wr.put(117, 7)  # 11+117 = 128 zeros → 4+10+138+128 = 280
    emit_solid_channels(wr)
    # greens 0..3, canonical codes 00,01,10,11 — emit pixels 2,3,0,1
    for g in (2, 3, 0, 1):
        wr.put((g >> 1) & 1, 1)
        wr.put(g & 1, 1)
    payload = wr.bytes()
    _, _, out = vp8l_decode(payload)
    assert [int(v) for v in ((out[0, :, 1]))] == [2, 3, 0, 1]


def test_normal_code_with_max_symbol_cap():
    # use_length path: cap reading at 4 symbols, rest implicitly zero
    wr = W()
    wr.put(0x2F, 8)
    wr.put(3, 14)
    wr.put(0, 14)
    wr.put(1, 1)
    wr.put(0, 3)
    wr.put(0, 1)  # no transforms
    wr.put(0, 1)  # no cache
    wr.put(0, 1)  # no meta
    wr.put(0, 1)  # green: normal
    wr.put(15, 4)
    cl_lengths = {0: 2, 1: 2, 2: 2, 3: 2}  # complete 4×2^-2
    cl_codes = canon(cl_lengths)
    for sym in CLC_ORDER:
        wr.put(cl_lengths.get(sym, 0), 3)
    wr.put(1, 1)  # use max_symbol
    wr.put(0, 3)  # length_nbits = 2
    wr.put(2, 2)  # max_symbol = 2 + 2 = 4
    for _ in range(4):
        put_code(wr, cl_codes, 2)  # greens 0..3 all length 2
    emit_solid_channels(wr)
    for g in (1, 0, 3, 2):
        wr.put((g >> 1) & 1, 1)
        wr.put(g & 1, 1)
    _, _, out = vp8l_decode(wr.bytes())
    assert [int(v) for v in out[0, :, 1]] == [1, 0, 3, 2]


# ------------------------------------------------------------ container

def test_container_vp8x_skip_and_padding():
    px = [0xFF0A0B0C] * 4
    payload = vp8l_bytes(2, 2, 1, lambda wr: emit_body(wr, lits(px)))
    data = container(payload, extra_chunks=[(b"VP8X", b"\x00" * 10), (b"ICCP", b"\x01" * 3)])
    w, h, out = webp_decode(data)
    assert (w, h) == (2, 2)
    np.testing.assert_array_equal(out, rgba(px, 2, 2))


def test_container_errors():
    with pytest.raises(ValueError, match="RIFF"):
        webp_decode(b"JUNKJUNKJUNKJUNK")
    # lossy VP8 decodes for real now (tests/test_vp8.py); an EMPTY
    # VP8 chunk must still fail loudly
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="too short"):
        webp_decode(lossy)
    # a bare ANIM chunk with no VP8X header is a malformed animation
    # (animated decode is real now — tests below)
    anim = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"ANIM" + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="VP8X"):
        webp_decode(anim)
    empty = b"RIFF" + struct.pack("<I", 4) + b"WEBP"
    with pytest.raises(ValueError, match="no VP8L"):
        webp_decode(empty)


def test_stream_errors():
    with pytest.raises(ValueError, match="signature"):
        vp8l_decode(b"\x00\x00\x00\x00\x00")
    # cache symbol without a cache: impossible to emit via the writer
    # (alphabet too small) — craft manually: green simple code over
    # symbol 280 is rejected as out-of-alphabet at code-read time
    px = [0xFF000000] * 4
    payload = vp8l_bytes(2, 2, 1, lambda wr: emit_body(wr, lits(px)))
    with pytest.raises(ValueError, match="truncated"):
        vp8l_decode(payload[:-2] if len(payload) > 6 else payload[:5])
    # backward reference past the start of the image
    tokens = lits([0xFF010203]) + [(0, ("copy", 2, 120 + 5))]
    bad = vp8l_bytes(2, 2, 1, lambda wr: emit_body(wr, tokens))
    with pytest.raises(ValueError, match="backward"):
        vp8l_decode(bad)


# ------------------------------------------------------- spark surface

def test_decode_image_dispatch():
    from kinesis_vcr_spark.operators.multimodal import decode_image

    px = deterministic_pixels(12, seed=31)
    payload = container(vp8l_bytes(4, 3, 1, lambda wr: emit_body(wr, lits(px))))
    meta = decode_image(payload)
    assert (meta["width"], meta["height"]) == (4, 3)
    expected = float(rgba(px, 4, 3).mean())
    assert abs(meta["mean_value"] - expected) < 1e-9


# ------------------------------------------------- animated (VP8X/ANIM/ANMF)

from kinesis_vcr_spark.operators.webp import webp_frames  # noqa: E402


def u24(v: int) -> bytes:
    return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])


def anim_container(canvas_w, canvas_h, frames) -> bytes:
    """Independent spec-rule animation assembler: VP8X (animation bit)
    + ANIM + one ANMF per (x, y, w, h, dur_ms, flags, vp8l_payload)."""
    chunks = b""
    vp8x = bytes([0x02, 0, 0, 0]) + u24(canvas_w - 1) + u24(canvas_h - 1)
    chunks += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = struct.pack("<IH", 0, 0)  # background BGRA + loop count
    chunks += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for x, y, fw, fh, dur, flags, payload in frames:
        body = (u24(x // 2) + u24(y // 2) + u24(fw - 1) + u24(fh - 1)
                + u24(dur) + bytes([flags]))
        body += b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
        chunks += b"ANMF" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def _solid(w, h, argb):
    return vp8l_bytes(
        w, h, 1, lambda wr: emit_body(wr, lits([argb] * (w * h)))
    )


def test_animated_two_frame_demux():
    f1 = _solid(10, 8, 0xFFAA0000)
    f2 = _solid(4, 2, 0xFF0000BB)
    data = anim_container(10, 8, [
        (0, 0, 10, 8, 40, 0x00, f1),      # blend, keep
        (2, 4, 4, 2, 50, 0x03, f2),       # no-blend, dispose
    ])
    cw, ch, frames = webp_frames(data)
    assert (cw, ch) == (10, 8)
    assert len(frames) == 2
    a, b = frames
    assert (a["x"], a["y"], a["duration_ms"]) == (0, 0, 40)
    assert a["blend"] and not a["dispose_to_background"]
    assert (b["x"], b["y"], b["duration_ms"]) == (2, 4, 50)
    assert not b["blend"] and b["dispose_to_background"]
    np.testing.assert_array_equal(a["pixels"], rgba([0xFFAA0000] * 80, 10, 8))
    np.testing.assert_array_equal(b["pixels"], rgba([0xFF0000BB] * 8, 4, 2))


def test_animated_first_frame_composited_on_transparent_canvas():
    f1 = _solid(3, 2, 0xFF102030)
    data = anim_container(8, 6, [(2, 2, 3, 2, 100, 0x00, f1)])
    w, h, out = webp_decode(data)
    assert (w, h) == (8, 6)
    assert out.shape == (6, 8, 4)
    assert tuple(out[2, 2]) == (0x10, 0x20, 0x30, 0xFF)
    assert tuple(out[3, 4]) == (0x10, 0x20, 0x30, 0xFF)
    assert out[0, 0, 3] == 0 and out[5, 7, 3] == 0  # transparent outside


def test_animated_guards():
    f1 = _solid(4, 2, 0xFF0000BB)
    # frame dims disagreeing with its VP8L stream
    bad = anim_container(8, 6, [(0, 0, 6, 2, 10, 0x00, f1)])
    with pytest.raises(ValueError, match="disagree"):
        webp_frames(bad)
    # ANMF with no VP8X header
    body = (u24(0) + u24(0) + u24(3) + u24(1) + u24(10) + bytes([0])
            + b"VP8L" + struct.pack("<I", len(f1)) + f1)
    chunks = b"ANMF" + struct.pack("<I", len(body)) + body
    headless = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks
    with pytest.raises(ValueError, match="VP8X"):
        webp_frames(headless)
    # lossy frames decode for real now (tests/test_vp8.py); a
    # truncated VP8 frame chunk must still fail loudly
    lossy_body = (u24(0) + u24(0) + u24(3) + u24(1) + u24(10) + bytes([0])
                  + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00")
    lossy = anim_container(8, 6, [])[:12]
    vp8x = bytes([0x02, 0, 0, 0]) + u24(7) + u24(5)
    lossy += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    lossy += b"ANMF" + struct.pack("<I", len(lossy_body)) + lossy_body
    lossy = lossy[:4] + struct.pack("<I", len(lossy) - 8) + lossy[8:]
    with pytest.raises(ValueError, match="too short"):
        webp_frames(lossy)


def test_spark_webp_frame_sampling(spark):
    """The animated-WebP instantiation of the sample_frames plumbing:
    every kept row is a standalone still WebP decodable downstream."""
    from pyspark.sql import Row

    from kinesis_vcr_spark.operators.webp import sample_webp_frames

    colors = [0xFF000000 | (i * 0x102030 & 0xFFFFFF) for i in range(5)]
    frames = [(0, 0, 4, 2, 10, 0x00, _solid(4, 2, c)) for c in colors]
    data = anim_container(4, 2, frames)
    media = spark.createDataFrame(
        [
            Row(media_id=1, payload=data),
            Row(media_id=2, payload=b"not media at all"),
        ]
    )
    rows = sample_webp_frames(media, every_n=2).collect()
    assert [(r["media_id"], r["frame_idx"]) for r in rows] == [
        (1, 0), (1, 2), (1, 4)
    ]
    for r in rows:
        w, h, px = webp_decode(bytes(r["frame"]))
        assert (w, h) == (4, 2)
        c = colors[r["frame_idx"]]
        np.testing.assert_array_equal(px, rgba([c] * 8, 4, 2))
        assert r["frame_bytes"] == len(bytes(r["frame"]))


def test_vp8_lossy_key_frame_dimensions_parse():
    """The lossy VP8 chunk's uncompressed key-frame header (RFC 6386
    §9.1) parses to (width, height); interframes and corrupt start
    codes fail loudly; the container dispatch surfaces the parsed
    dimensions in its documented-slot error."""
    import pytest

    from kinesis_vcr_spark.operators.webp import (
        vp8_key_frame_dimensions,
        webp_decode,
    )

    def vp8_chunk(w, h, wscale=0, hscale=2, keyframe=True):
        tag = (0 if keyframe else 1) | (3 << 1) | (1 << 4) | (100 << 5)
        return (
            bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
            + b"\x9d\x01\x2a"
            + bytes([(w | (wscale << 14)) & 0xFF, (w | (wscale << 14)) >> 8])
            + bytes([(h | (hscale << 14)) & 0xFF, (h | (hscale << 14)) >> 8])
        )

    assert vp8_key_frame_dimensions(vp8_chunk(640, 480)) == (640, 480)
    assert vp8_key_frame_dimensions(vp8_chunk(16383, 1)) == (16383, 1)
    with pytest.raises(ValueError, match="interframe"):
        vp8_key_frame_dimensions(vp8_chunk(64, 64, keyframe=False))
    with pytest.raises(ValueError, match="start code"):
        vp8_key_frame_dimensions(b"\x00\x00\x00" + b"\xff\x01\x2a" + bytes(4))
    with pytest.raises(ValueError, match="too short"):
        vp8_key_frame_dimensions(b"\x00\x00")

    # full decode is real now (tests/test_vp8.py): a header-only
    # chunk (first-partition size pointing past the data) fails loudly
    chunk = vp8_chunk(320, 240)
    riff = b"WEBPVP8 " + struct.pack("<I", len(chunk)) + chunk
    payload = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(ValueError):
        webp_decode(payload)
