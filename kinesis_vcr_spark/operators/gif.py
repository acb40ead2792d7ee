"""GIF decoder (87a/89a) — stdlib + numpy, no PIL.

Completes the stdlib image-codec family beside PPM/BMP/PNG/JPEG
(operators/multimodal.py, operators/jpeg.py): variable-code-width LZW
decompression (GIF's one real algorithm), global and local color
tables, row interlacing (the 8/8/4/2 pass scheme), multi-frame
animations with per-frame geometry and disposal-agnostic first-frame
compositing, and GIF89a Graphics Control transparency (transparent
pixels surface through an alpha channel). Written from the GIF89a
specification (CompuServe 1990, public) — the LZW variant is the
original Welch 1984 table-building decoder with GIF's clear/EOI codes
and per-image minimum code size.

Scope, matching the family contract: the correctness decoder for the
Spark-side plumbing and PIL-free environments. ``gif_decode`` returns
the FIRST frame composited onto the logical screen (training corpora
treat GIFs as still images; ``gif_frames`` exposes every frame's
pixels + geometry for the frame-sampling path). The LZW inner loop is
per-code Python — the PIL swap point at billions-of-images scale,
same as JPEG's entropy loop.

Verification (tests/test_gif.py): an independent encoder written from
the spec's compressor side (with deliberately non-minimal initial code
widths exercised via small palettes), round-tripping gray ramps,
random palettes, interlace on/off, multi-frame, and transparency;
plus a hand-assembled 2×2 stream with analytically known LZW codes.
"""

from __future__ import annotations

import struct

import numpy as np

# interlace passes: (start row, row step) per the GIF89a spec appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-variant LZW: codes start at min_code_size+1 bits, the table
    grows to 4095 entries, CLEAR resets it, EOI ends the stream.
    Returns exactly ``n_pixels`` palette indices (spec-tolerant of
    missing EOI / trailing junk, like every real-world decoder)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: LSB-first within each byte (the opposite of JPEG)
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                return out  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream (code out of range)")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # widen AT table sizes 2^n (next code wouldn't fit)
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _read_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos`` →
    (data, position past the terminator)."""
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-block chain truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + n])
        pos += n


def gif_frames(payload: bytes):
    """Parse every image descriptor → list of dicts with ``left, top,
    width, height, pixels`` (ndarray [h, w] palette indices resolved
    to RGB [h, w, 3], or RGBA [h, w, 4] when the frame carries a
    GIF89a transparency index). Raises ValueError on malformed
    streams."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("GIF header truncated")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_ct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_ct = np.frombuffer(
            payload, np.uint8, n * 3, pos
        ).reshape(n, 3)
        pos += n * 3
    frames = []
    transparent: int | None = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos + 2 > len(payload):
                raise ValueError("GIF extension truncated")
            label = payload[pos + 1]
            data, pos = _read_blocks(payload, pos + 2)
            if label == 0xF9 and len(data) >= 4:  # Graphic Control
                transparent = data[3] if data[0] & 0x01 else None
            continue
        if b != 0x2C:  # image descriptor
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if pos + 10 > len(payload):
            raise ValueError("GIF image descriptor truncated")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        ct = global_ct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image with no color table")
        if pos >= len(payload):
            raise ValueError("GIF pixel data truncated")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_blocks(payload, pos)
        idx = np.frombuffer(
            bytes(_lzw_decode(data, min_code, w * h)), np.uint8
        )
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        idx = idx[: w * h].reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            deinter = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE:
                n_rows = len(range(start, h, step))
                deinter[start::step] = idx[src : src + n_rows]
                src += n_rows
        else:
            deinter = idx
        if int(deinter.max(initial=0)) >= len(ct):
            raise ValueError("GIF palette index out of range")
        rgb = ct[deinter]
        if transparent is not None:
            alpha = np.where(deinter == transparent, 0, 255).astype(np.uint8)
            px = np.dstack([rgb, alpha])
        else:
            px = rgb
        frames.append(
            {"left": left, "top": top, "width": w, "height": h, "pixels": px}
        )
        transparent = None  # GCE applies to the next image only
    if not frames:
        raise ValueError("GIF has no image data")
    return sw, sh, frames


def gif_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, uint8 array) — the FIRST frame composited onto
    the logical screen (unset area = 0): the still-image view training
    corpora use. RGB [h, w, 3], or RGBA when the frame is
    transparent-keyed."""
    sw, sh, frames = gif_frames(payload)
    f = frames[0]
    ch = f["pixels"].shape[2]
    screen = np.zeros((sh, sw, ch), dtype=np.uint8)
    screen[
        f["top"] : f["top"] + f["height"], f["left"] : f["left"] + f["width"]
    ] = f["pixels"]
    return sw, sh, screen
