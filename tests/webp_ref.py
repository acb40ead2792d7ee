"""ctypes bridge to the SYSTEM libwebp — the reference codec used to
generate and pin golden fixtures for the pure-Python lossy-VP8 decoder
(operators/vp8.py). Only tests use this module; the operator path has
no native dependency. Tests that need a LIVE libwebp (fresh encodes)
skip when the library is absent; the committed fixtures carry their
golden pixels inline so conformance pins survive without it."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB = None


def load() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is None:
        for cand in (
            "libwebp.so.7",
            "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
            ctypes.util.find_library("webp"),
        ):
            if not cand:
                continue
            try:
                _LIB = ctypes.CDLL(cand)
                break
            except OSError:
                continue
    return _LIB


def decode_rgba(payload: bytes) -> np.ndarray:
    """Reference decode to (h, w, 4) uint8 via WebPDecodeRGBA."""
    lib = load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    buf = lib.WebPDecodeRGBA(payload, len(payload), ctypes.byref(w),
                             ctypes.byref(h))
    assert buf, "libwebp failed to decode"
    n = w.value * h.value * 4
    out = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    lib.WebPFree(buf)
    return out.reshape(h.value, w.value, 4)


def encode_rgb(px: np.ndarray, quality: float = 75.0) -> bytes:
    """Reference lossy encode of (h, w, 3) uint8 via WebPEncodeRGB —
    produces a VP8 (not VP8L) stream."""
    lib = load()
    assert lib is not None
    h, w, _ = px.shape
    data = np.ascontiguousarray(px, dtype=np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    size = lib.WebPEncodeRGB(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h, w * 3, ctypes.c_float(quality), ctypes.byref(out),
    )
    assert size > 0, "libwebp failed to encode"
    payload = ctypes.string_at(out, size)
    lib.WebPFree(out)
    return payload
