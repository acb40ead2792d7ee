"""Minimal independent JPEG ENCODER (baseline + progressive) — test
fixture generator for the decoder in kinesis_vcr_spark/operators/
jpeg.py.

Deliberately independent of the decoder's internals: forward DCT via
its own basis matrix, its own zigzag walk, and NON-standard Huffman
tables (every used symbol gets a fixed-length-9 canonical code), so a
roundtrip exercises the decoder's DHT handling on arbitrary valid
tables rather than sharing Annex K constants with it. Supports 8-bit
grayscale and YCbCr 4:4:4 / 4:2:0, optional restart intervals, and
(:func:`encode_jpeg_progressive`) T.81 Annex G progressive scripts —
spectral selection alone or with one level of successive
approximation, written from figures G.4-G.7, not from the decoder.
Because both encoders quantize identical coefficients, a progressive
stream refined to Al=0 must decode BIT-IDENTICALLY to the baseline
stream of the same image — the exact oracle the tests pin.
"""

from __future__ import annotations

import struct

import numpy as np

_ZZ = []
for _s in range(15):
    _rows = (
        range(max(0, _s - 7), min(_s, 7) + 1)
        if _s % 2
        else range(min(_s, 7), max(0, _s - 7) - 1, -1)
    )
    _ZZ.extend(_r * 8 + (_s - _r) for _r in _rows)

_C = np.array([np.sqrt(1 / 8)] + [np.sqrt(2 / 8)] * 7)
_BASIS = np.array(
    [
        [_C[k] * np.cos((2 * n + 1) * k * np.pi / 16) for n in range(8)]
        for k in range(8)
    ]
)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _BASIS @ block @ _BASIS.T


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


class _FixedHuff:
    """All used symbols at code length 9, canonical order — a valid but
    non-standard Huffman table."""

    def __init__(self, symbols: set[int]):
        self.vals = sorted(symbols)
        assert len(self.vals) <= 500
        self.codes = {s: i for i, s in enumerate(self.vals)}

    def dht_payload(self, tc: int, th: int) -> bytes:
        bits = [0] * 16
        bits[8] = len(self.vals)  # all codes at length 9
        return bytes([tc << 4 | th] + bits + self.vals)

    def emit(self, bw: _BitWriter, sym: int) -> None:
        bw.write(self.codes[sym], 9)


def _block_symbols_and_coeffs(plane: np.ndarray, q: np.ndarray):
    """Per-8x8-block quantized zigzag coefficient lists for a padded
    component plane."""
    h, w = plane.shape
    blocks = []
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            blk = plane[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - 128.0
            coeffs = _dct2(blk)
            zz = np.array(
                [coeffs.reshape(-1)[i] for i in _ZZ], dtype=np.float64
            )
            blocks.append(np.round(zz / q).astype(np.int64))
    return blocks


def _pad(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // bh) * bh, -(-w // bw) * bw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _prepare_components(
    img: np.ndarray, quality_divisor: int, subsample_420: bool
):
    """Shared front half of both encoders: color transform, subsample,
    pad to the MCU grid, forward-DCT + quantize every block. Returns
    (comps, q, h, w, mcux, mcuy) with per-component ``blocks`` (list of
    zigzag int64 arrays, row-major over the padded grid) and ``bw``
    (blocks per padded row)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.full(64, quality_divisor, dtype=np.int64)

    if gray:
        comps = [
            {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": _pad(img, 8, 8)}
        ]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample_420:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = _pad(cb, 2, 2).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            crp = _pad(cr, 2, 2).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            comps = [
                {"id": 1, "h": 2, "v": 2, "tq": 0, "plane": _pad(y, 16, 16)},
                {"id": 2, "h": 1, "v": 1, "tq": 0, "plane": _pad(cbp, 8, 8)},
                {"id": 3, "h": 1, "v": 1, "tq": 0, "plane": _pad(crp, 8, 8)},
            ]
        else:
            comps = [
                {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": _pad(y, 8, 8)},
                {"id": 2, "h": 1, "v": 1, "tq": 0, "plane": _pad(cb, 8, 8)},
                {"id": 3, "h": 1, "v": 1, "tq": 0, "plane": _pad(cr, 8, 8)},
            ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        plane = _pad(c["plane"], mcuy * c["v"] * 8, mcux * c["h"] * 8)
        c["blocks"] = _block_symbols_and_coeffs(plane, q)
        c["bw"] = plane.shape[1] // 8
    return comps, q, h, w, mcux, mcuy


def encode_jpeg(
    img: np.ndarray,
    quality_divisor: int = 8,
    subsample_420: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF bytes for a uint8 [h, w] gray or [h, w, 3] RGB
    array. ``quality_divisor`` is the flat quantizer for every
    coefficient (small = high quality)."""
    comps, q, h, w, mcux, mcuy = _prepare_components(
        img, quality_divisor, subsample_420
    )

    # MCU-ordered (component, block) sequence, with DC made differential
    def mcu_sequence():
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bi = (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                        yield m, ci, c["blocks"][bi]

    # first pass: collect symbols (DC categories, AC run/size bytes)
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00}
    pred = [0] * len(comps)
    entries = []
    last_seg = 0
    for m, ci, zz in mcu_sequence():
        if restart_interval and m // restart_interval != last_seg:
            pred = [0] * len(comps)
            last_seg = m // restart_interval
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        dc_syms.add(_category(diff))
        acs = []
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))
                run -= 16
            s = _category(v)
            acs.append(((run << 4) | s, v, s))
            ac_syms.add((run << 4) | s)
            run = 0
        if run:
            acs.append((0x00, 0, 0))
        entries.append((m, ci, diff, acs))
    ac_syms.update(sym for e in entries for sym, _, _ in e[3])
    ac_syms.add(0xF0)
    dct = _FixedHuff(dc_syms)
    act = _FixedHuff(ac_syms)

    # second pass: entropy-coded segments split at restart boundaries
    bw_ = _BitWriter()
    body = bytearray()
    seg = 0
    for m, ci, diff, acs in entries:
        if restart_interval and m // restart_interval != seg:
            bw_.flush()
            body += bw_.out
            body += bytes([0xFF, 0xD0 + ((seg) % 8)])
            bw_ = _BitWriter()
            seg = m // restart_interval
        t = _category(diff)
        dct.emit(bw_, t)
        if t:
            bw_.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        for sym, v, s in acs:
            act.emit(bw_, sym)
            if s:
                bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
    bw_.flush()
    body += bw_.out

    def segment(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")
    out += segment(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += segment(0xC0, bytes(sof))
    out += segment(0xC4, dct.dht_payload(0, 0) + act.dht_payload(1, 0))
    if restart_interval:
        out += segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])  # td=0, ta=0
    sos += bytes([0, 63, 0])
    out += segment(0xDA, bytes(sos))
    out += body
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G, figures G.4-G.7)
# ---------------------------------------------------------------------------


def _sign_shift(v: int, al: int) -> int:
    """AC first-scan point transform: magnitude shifted toward zero
    (G.1.2.2), sign preserved."""
    m = abs(v) >> al
    return m if v >= 0 else -m


class _TokenStream:
    """Scan encoder output: symbol / raw-bit / restart tokens, written
    in a second pass once the scan's Huffman table is known."""

    def __init__(self):
        self.tokens: list[tuple] = []
        self.syms: set[int] = set()

    def sym(self, s: int) -> None:
        self.tokens.append(("sym", s))
        self.syms.add(s)

    def bits(self, value: int, n: int) -> None:
        if n:
            self.tokens.append(("bits", value, n))

    def rst(self) -> None:
        self.tokens.append(("rst",))


def _dc_scan_tokens(comps, mcux, mcuy, al, refine, restart_interval):
    """Interleaved DC scan: first scans send diffs of coef>>Al (floor
    shift — the decoder reconstructs pred<<Al); refinement scans send
    one raw bit per block."""
    ts = _TokenStream()
    pred = [0] * len(comps)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            ts.rst()
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    bi = (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                    coef0 = int(c["blocks"][bi][0])
                    if refine:
                        ts.bits((coef0 >> al) & 1, 1)
                        continue
                    v = coef0 >> al
                    diff = v - pred[ci]
                    pred[ci] = v
                    t = _category(diff)
                    ts.sym(t)
                    ts.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
    return ts


def _data_grid(c, comps, w, h):
    """Non-interleaved scans traverse ceil(comp_size/8) blocks, NOT the
    padded interleaved grid (T.81 A.2.2)."""
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    comp_w = -(-w * c["h"] // hmax)
    comp_h = -(-h * c["v"] // vmax)
    return -(-comp_w // 8), -(-comp_h // 8)


def _ac_first_scan_tokens(c, comps, w, h, ss, se, al, restart_interval):
    """Single-component AC first scan (G.1.2.2) with accumulated EOB
    runs across blocks."""
    ts = _TokenStream()
    bw_data, bh_data = _data_grid(c, comps, w, h)
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            ts.sym(r << 4)
            ts.bits(eobrun - (1 << r), r)
            eobrun = 0

    for unit in range(bw_data * bh_data):
        if restart_interval and unit and unit % restart_interval == 0:
            flush_eob()
            ts.rst()
        by, bx = divmod(unit, bw_data)
        zz = c["blocks"][by * c["bw"] + bx]
        vals = [_sign_shift(int(zz[k]), al) for k in range(ss, se + 1)]
        if not any(vals):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for v in vals:
            if v == 0:
                run += 1
                continue
            while run > 15:
                ts.sym(0xF0)  # ZRL
                run -= 16
            s = _category(v)
            ts.sym((run << 4) | s)
            ts.bits(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            eobrun += 1
    flush_eob()
    return ts


def _ac_refine_scan_tokens(c, comps, w, h, ss, se, al, restart_interval):
    """Single-component AC refinement scan — figure G.7: newly-nonzero
    coefficients as ±1 at bit Al, runs counting zero-history positions
    only, correction bits for already-nonzero positions buffered and
    emitted after the next symbol (or after the EOB run they fold
    into)."""
    ts = _TokenStream()
    bw_data, bh_data = _data_grid(c, comps, w, h)
    eobrun = 0
    corr_pending: list[int] = []  # correction bits owed to the EOB run

    def flush_eob():
        nonlocal eobrun, corr_pending
        if eobrun:
            r = eobrun.bit_length() - 1
            ts.sym(r << 4)
            ts.bits(eobrun - (1 << r), r)
            for b in corr_pending:
                ts.bits(b, 1)
            eobrun = 0
            corr_pending = []

    for unit in range(bw_data * bh_data):
        if restart_interval and unit and unit % restart_interval == 0:
            flush_eob()
            ts.rst()
        by, bx = divmod(unit, bw_data)
        zz = c["blocks"][by * c["bw"] + bx]
        band = [int(zz[k]) for k in range(ss, se + 1)]
        absv = [abs(v) >> al for v in band]
        # last newly-nonzero position; runs past it fold into the EOB
        k_eob = max((i for i, t in enumerate(absv) if t == 1), default=-1)
        r = 0
        br_bits: list[int] = []  # correction bits since the last symbol
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            if i <= k_eob:
                while r > 15:
                    flush_eob()
                    ts.sym(0xF0)
                    for b in br_bits:
                        ts.bits(b, 1)
                    br_bits = []
                    r -= 16
            if t > 1:  # already nonzero before this scan
                br_bits.append(t & 1)
                continue
            flush_eob()
            ts.sym((r << 4) | 1)
            ts.bits(1 if band[i] >= 0 else 0, 1)
            for b in br_bits:
                ts.bits(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            corr_pending.extend(br_bits)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return ts


def _write_tokens(ts: _TokenStream, table: _FixedHuff | None) -> bytes:
    body = bytearray()
    bw = _BitWriter()
    seg = 0
    for tok in ts.tokens:
        if tok[0] == "rst":
            bw.flush()
            body += bw.out
            body += bytes([0xFF, 0xD0 + seg % 8])
            seg += 1
            bw = _BitWriter()
        elif tok[0] == "sym":
            table.emit(bw, tok[1])
        else:
            bw.write(tok[1], tok[2])
    bw.flush()
    body += bw.out
    return bytes(body)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality_divisor: int = 8,
    subsample_420: bool = False,
    successive: bool = False,
    restart_interval: int = 0,
    ac_split: int = 5,
) -> bytes:
    """Progressive JFIF bytes for a uint8 gray/RGB array.

    ``successive=False``: spectral selection only — interleaved DC
    scan (Al=0), then per-component AC scans [1, ac_split] and
    [ac_split+1, 63] at Al=0.

    ``successive=True``: full successive approximation — DC first at
    Al=1 + DC refinement to Al=0 (raw bits, no Huffman table), then
    per-component AC first scans at Al=1 and AC refinement scans to
    Al=0 (correction bits, EOB-run folding).

    Either script covers the complete spectrum at Al=0, so the decode
    must be bit-identical to the baseline encoding's decode."""
    comps, q, h, w, mcux, mcuy = _prepare_components(
        img, quality_divisor, subsample_420
    )

    # (tokens, scan components, ss, se, ah, al, needs_dht)
    scans = []
    dc_al = 1 if successive else 0
    scans.append(
        (_dc_scan_tokens(comps, mcux, mcuy, dc_al, False, restart_interval),
         list(range(len(comps))), 0, 0, 0, dc_al, True)
    )
    if successive:
        scans.append(
            (_dc_scan_tokens(comps, mcux, mcuy, 0, True, restart_interval),
             list(range(len(comps))), 0, 0, 1, 0, False)
        )
    ac_al = 1 if successive else 0
    bands = [(1, ac_split), (ac_split + 1, 63)]
    for ci, c in enumerate(comps):
        for ss, se in bands:
            scans.append(
                (_ac_first_scan_tokens(
                    c, comps, w, h, ss, se, ac_al, restart_interval),
                 [ci], ss, se, 0, ac_al, True)
            )
    if successive:
        for ci, c in enumerate(comps):
            for ss, se in bands:
                scans.append(
                    (_ac_refine_scan_tokens(
                        c, comps, w, h, ss, se, 0, restart_interval),
                     [ci], ss, se, 1, 0, True)
                )

    def segment(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")
    out += segment(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += segment(0xC2, bytes(sof))
    if restart_interval:
        out += segment(0xDD, struct.pack(">H", restart_interval))

    for ts, cis, ss, se, ah, al, needs_dht in scans:
        table = None
        if needs_dht:
            table = _FixedHuff(ts.syms or {0x00})
            # DC scans bind table class 0, AC scans class 1, both id 0 —
            # redefined before every scan, exercising table rebinding
            tc = 0 if ss == 0 else 1
            out += segment(0xC4, table.dht_payload(tc, 0))
        sos = bytearray([len(cis)])
        for ci in cis:
            sos += bytes([comps[ci]["id"], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += segment(0xDA, bytes(sos))
        out += _write_tokens(ts, table)
    out += b"\xff\xd9"
    return bytes(out)
