"""Regenerate kinesis_vcr_spark/operators/vp8_tables.py from a system
libwebp shared library.

The VP8 bitstream's default entropy tables are PUBLIC SPEC CONSTANTS
(RFC 6386 §13.4/§13.5 token probabilities and update probabilities,
§11.5 keyframe B-mode probabilities, §14.1 quantizer lookup tables) —
the same data every conformant decoder ships. Transcribing ~3,000
probability bytes by hand is the one step of a clean-room VP8 decoder
that cannot be validated by construction (a single wrong byte desyncs
the arithmetic decoder), so this tool reads them out of the public
libwebp library present on the system, using content ANCHORS (known
spec rows — e.g. the kBModesProba[0][0] row {231,120,48,...} and the
consecutive-integer head of the AC quant table) rather than symbol
names, and cross-checks table adjacency. The generated module is then
validated end-to-end by tests/test_vp8.py: the pure-Python decoder
must reproduce libwebp's own decodes BIT-EXACTLY on committed fixture
files, which would be unattainable with any corrupted table.

Usage: python tools/extract_vp8_tables.py [libwebp.so path] > /dev/null
(writes kinesis_vcr_spark/operators/vp8_tables.py in place).
"""

from __future__ import annotations

import re
import struct
import sys
from pathlib import Path

DEFAULT_LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"


def find_once(data: bytes, pattern: bytes, what: str) -> int:
    offs = [m.start() for m in re.finditer(re.escape(pattern), data)]
    if not offs:
        raise SystemExit(f"anchor for {what} not found")
    return offs[0]


def extract(lib_path: str) -> dict[str, object]:
    data = Path(lib_path).read_bytes()

    # AC quant table: uint16, starts 4,5,6,...,55 consecutively
    ac_anchor = b"".join(struct.pack("<H", v) for v in range(4, 31))
    ac_off = find_once(data, ac_anchor, "AC quant table")
    ac = list(struct.unpack_from("<128H", data, ac_off))
    assert ac[-1] == 284 and ac[55] == 60, "AC table shape unexpected"

    # DC quant table: uint8, distinctive 4,5,...,17,17,18,19,20,20 head
    dc_anchor = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16,
                       17, 17, 18, 19, 20, 20])
    dc_off = find_once(data, dc_anchor, "DC quant table")
    dc = list(data[dc_off : dc_off + 128])
    assert dc[-1] == 157, "DC table shape unexpected"

    # keyframe B-mode probabilities: 10 x 10 x 9, anchored by row [0][0]
    bm_anchor = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    bm_off = find_once(data, bm_anchor, "kf B-mode probabilities")
    bmode = list(data[bm_off : bm_off + 900])
    assert 0 not in bmode, "probabilities must be in 1..255"

    # coefficient UPDATE probabilities (4x8x3x11): the 1056 bytes
    # immediately preceding kBModesProba (mostly 255s)
    upd = list(data[bm_off - 1056 : bm_off])
    assert sum(1 for b in upd if b == 255) > 800, "update table shape"
    assert 0 not in upd

    # coefficient DEFAULT probabilities (4x8x3x11): first non-padding
    # table after kBModesProba — three all-128 rows then 253,136,254,...
    cp_anchor = bytes([128] * 33 + [253, 136, 254])
    cp_off = find_once(data, cp_anchor, "default coefficient probabilities")
    coeffs = list(data[cp_off : cp_off + 1056])
    assert 0 not in coeffs

    def nest(flat: list[int]) -> list:
        return [
            [
                [flat[(t * 8 + b) * 33 + c * 11 : (t * 8 + b) * 33 + (c + 1) * 11]
                 for c in range(3)]
                for b in range(8)
            ]
            for t in range(4)
        ]

    return {
        "dc_q": dc,
        "ac_q": ac,
        "coeff_probs": nest(coeffs),
        "coeff_update_probs": nest(upd),
        "kf_bmode_probs": [
            [bmode[(a * 10 + l) * 9 : (a * 10 + l + 1) * 9] for l in range(10)]
            for a in range(10)
        ],
    }


def render(tables: dict[str, object]) -> str:
    import pprint

    body = []
    body.append('"""Default VP8 entropy/quantizer tables — PUBLIC spec')
    body.append("constants (RFC 6386 §13.4/§13.5/§11.5/§14.1), extracted from")
    body.append("the system libwebp by tools/extract_vp8_tables.py and")
    body.append("validated by bit-exact conformance against libwebp decodes")
    body.append('in tests/test_vp8.py. Regenerate with that tool."""')
    body.append("")
    body.append("# fmt: off")
    for name in ("dc_q", "ac_q", "coeff_probs", "coeff_update_probs",
                 "kf_bmode_probs"):
        rep = pprint.pformat(tables[name], width=76, indent=1, compact=True)
        body.append(f"{name.upper()} = {rep}")
        body.append("")
    body.append("# fmt: on")
    return "\n".join(body)


if __name__ == "__main__":
    lib = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_LIB
    tables = extract(lib)
    out = Path(__file__).resolve().parent.parent / (
        "kinesis_vcr_spark/operators/vp8_tables.py"
    )
    out.write_text(render(tables) + "\n")
    print(f"wrote {out}", file=sys.stderr)
