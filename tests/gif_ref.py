"""Minimal independent GIF ENCODER — test fixture generator for the
decoder in kinesis_vcr_spark/operators/gif.py. Written from the GIF89a
spec's compressor side: variable-width LZW (width bumps when the
just-assigned code equals 1 << width — verified against the decoder on
random and run-heavy sequences before the container was built),
interlace row reordering, local color tables, multi-frame streams with
Graphic Control transparency."""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


class _BitW:
    """LSB-first bit writer (GIF's order — the opposite of JPEG)."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 255)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> None:
        if self.n:
            self.out.append(self.acc & 255)
            self.acc = 0
            self.n = 0


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitW()
    width = min_code_size + 1
    bw.write(clear, width)
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w = b""
    for ci in indices:
        wc = w + bytes([ci])
        if wc in table:
            w = wc
            continue
        bw.write(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        w = bytes([ci])
    if w:
        bw.write(table[w], width)
    bw.write(eoi, width)
    bw.flush()
    return bytes(bw.out)


def _blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames,
    palette: np.ndarray,
    screen=None,
    interlace: bool = False,
    transparent: int | None = None,
    local_tables: bool = False,
) -> bytes:
    """GIF89a bytes. ``frames`` = list of (left, top, index_array);
    ``palette`` = (n × 3) uint8 with n a power of two ≥ 2. With
    ``local_tables`` the global table is omitted and every frame
    carries its own copy (exercises the local-table path)."""
    palette = np.asarray(palette, np.uint8)
    n = len(palette)
    assert n & (n - 1) == 0 and n >= 2
    ct_bits = max(1, (n - 1).bit_length())
    if screen is None:
        screen = (
            max(f[0] + f[2].shape[1] for f in frames),
            max(f[1] + f[2].shape[0] for f in frames),
        )
    out = bytearray(b"GIF89a")
    gflags = (0x80 | (ct_bits - 1)) if not local_tables else 0x00
    out += struct.pack("<HHBBB", screen[0], screen[1], gflags, 0, 0)
    if not local_tables:
        out += palette.tobytes()
    for left, top, idx in frames:
        if transparent is not None:
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
        h, w = idx.shape
        iflags = 0x40 if interlace else 0x00
        if local_tables:
            iflags |= 0x80 | (ct_bits - 1)
        out += bytes([0x2C]) + struct.pack("<HHHHB", left, top, w, h, iflags)
        if local_tables:
            out += palette.tobytes()
        rows = idx
        if interlace:
            rows = np.concatenate(
                [idx[start::step] for start, step in _INTERLACE]
            )
        mcs = max(2, ct_bits)
        out += bytes([mcs])
        out += _blocks(lzw_encode(rows.astype(np.uint8).tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)
