"""Baseline JPEG decoder — stdlib + numpy, no PIL.

Closes the last common real-world image slot in the multimodal decode
family (VERDICT r05 item 7): :func:`kinesis_vcr_spark.operators.
multimodal.decode_image` already handles PPM/BMP/PNG with stdlib
codecs; this module adds ITU-T T.81 baseline sequential DCT JPEG —
8-bit samples, Huffman entropy coding, grayscale or YCbCr (JFIF) with
any h/v chroma subsampling (4:4:4, 4:2:2, 4:2:0, ...), restart
markers. Progressive (SOF2), arithmetic coding, 12-bit precision, and
hierarchical modes raise ``NotImplementedError`` — they are rare in
training corpora and are the documented PIL escape hatch.

Scope note (matches the family contract in multimodal.py): this is the
CORRECTNESS decoder for the Spark-side plumbing — schema, Arrow batch
shape, partitioning — and for environments without PIL. The entropy
decode is a per-bit Python loop (the IDCT, dequantize, upsample, and
color-convert stages are numpy), so a production deployment decoding
billions of images should register a PIL/libjpeg-turbo-backed Decoder;
swapping it changes only the UDF body, never the plan.

Verification strategy (tests/test_jpeg.py): (a) hand-assembled streams
with analytically-known pixels (a DC-only block decodes to an exact
flat value); (b) roundtrips against an independent minimal encoder
(forward DCT + custom DHT tables) with PSNR bounds — the encoder
deliberately emits NON-standard Huffman tables so the decoder's DHT
handling is exercised on arbitrary valid tables, not just Annex K's.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: _ZZ[i] = natural (row-major) index of the i-th
# coefficient in zigzag scan order — generated, not a literal (T.81
# Figure 5: anti-diagonals, odd diagonals walk row-increasing)
_ZZ = np.array(
    [
        r * 8 + (s - r)
        for s in range(15)
        for r in (
            range(max(0, s - 7), min(s, 7) + 1)
            if s % 2
            else range(min(s, 7), max(0, s - 7) - 1, -1)
        )
    ],
    dtype=np.int64,
)

# orthonormal 8x8 DCT-II matrix: spatial = A.T @ coeffs @ A
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
    for _n in range(8):
        _A[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; restart markers are handled by the caller
    segmenting the stream."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                # past the end: T.81 pads with 1-bits
                return 1
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                # caller already removed stuffing; a bare FF here is
                # padding before a marker
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1
                else:
                    return 1
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed
    value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class _Huff:
    """Canonical Huffman decode table from DHT (bits[16], vals)."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _parse_segments(payload: bytes):
    """Walk the marker stream → (quant tables, huffman tables, frame,
    restart interval, scan components, scan data bytes)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    frame = None
    ri = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    tbl = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                else:
                    tbl = np.frombuffer(
                        seg[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                qt[tq] = tbl  # zigzag order
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = seg[i + 17 : i + 17 + n]
                huff[(tc, th)] = _Huff(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            h = struct.unpack_from(">H", seg, 1)[0]
            w = struct.unpack_from(">H", seg, 3)[0]
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG requires PIL (baseline decoder)"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline JPEG mode requires PIL"
            )
        elif marker == 0xDD:  # DRI
            ri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — scan data follows the header
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scomps.append(
                    {"cs": cs, "td": tdta >> 4, "ta": tdta & 0xF}
                )
            scan_start = pos + 2 + seglen
            scan_end = _find_scan_end(payload, scan_start)
            return qt, huff, frame, ri, scomps, payload[scan_start:scan_end]
        pos += 2 + seglen
    raise ValueError("JPEG has no SOS scan")


def _find_scan_end(payload: bytes, start: int) -> int:
    i = start
    while i + 1 < len(payload):
        if payload[i] == 0xFF and payload[i + 1] not in (0x00,) and not (
            0xD0 <= payload[i + 1] <= 0xD7
        ):
            return i
        i += 1
    return len(payload)


def _split_restarts(scan: bytes) -> list[bytes]:
    """Entropy-coded segments between RSTn markers (predictors reset
    and bit alignment restart at each boundary)."""
    out = []
    i = last = 0
    while i + 1 < len(scan):
        if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7:
            out.append(scan[last:i])
            i += 2
            last = i
        else:
            i += 1
    out.append(scan[last:])
    return out


def jpeg_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, uint8 array [h, w] gray or [h, w, 3] RGB)."""
    qt, huff, frame, ri, scomps, scan = _parse_segments(payload)
    if frame is None:
        raise ValueError("JPEG scan before frame header")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scomps]
    for c, s in zip(order, scomps):
        c["dc"] = huff[(0, s["td"])]
        c["ac"] = huff[(1, s["ta"])]
        c["q"] = qt[c["tq"]]
        c["plane"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )

    segments = _split_restarts(scan) if ri else [scan]
    n_mcus = mcux * mcuy
    mcu = 0
    for seg in segments:
        br = _BitReader(seg)
        pred = dict.fromkeys(range(len(order)), 0)
        limit = min(mcu + ri, n_mcus) if ri else n_mcus
        while mcu < limit:
            my, mx = divmod(mcu, mcux)
            for ci, c in enumerate(order):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = c["dc"].decode(br)
                        pred[ci] += _extend(br.receive(t), t)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = c["ac"].decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[_ZZ] = zz * c["q"]
                        px = _idct2(coeffs.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu += 1

    planes = []
    for c in order:
        p = c["plane"]
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return w, h, np.clip(planes[0] + 0.5, 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError("only 1- or 3-component JPEG supported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(rgb + 0.5, 0, 255).astype(np.uint8)
