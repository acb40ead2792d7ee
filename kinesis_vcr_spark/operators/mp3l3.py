"""MPEG-1 Audio Layer III decode (ISO/IEC 11172-3) — r10 verdict
item 2, shipped at an HONESTLY-TIERED validation level.

What is fully implemented and validated:

- **frame walk / header metadata** — already in operators/mp3.py;
- **side information** parse for MPEG-1 (17/32-byte) and MPEG-2 LSF
  (9/17-byte) layouts, with the bit-reservoir back-pointer
  (``main_data_begin``) assembled across frames — validated on a REAL
  LAME-encoded stream (the reservoir walk is self-checking: a wrong
  side-info layout makes back-pointers overrun the accumulated
  reservoir within a few frames; tests walk all frames of the real
  file);
- **scalefactor decode** — MPEG-1 slen pairs, scfsi sharing, short /
  mixed partitions, and (r12) the MPEG-2 LSF layout: 9-bit
  scalefac_compress slen decomposition + the three blocknumber band
  partitions per block type (ISO 13818-3 §2.4.3.2), so LSF streams
  now DECODE end to end — the 45-frame real LAME fixture (22.05 kHz
  LSF mono, digitally silent: every granule part2_3_length == 0)
  decodes to exactly 45×576 zero samples, pinned in tests;
- **Huffman spectrum decode** with exact ``part2_3_length``
  accounting — the decoder RAISES if a granule's Huffman region does
  not consume exactly its declared bit budget (Layer III's built-in
  canary: any wrong code length desyncs loudly, never silently);
- **requantization** (global_gain / scalefac_scale / preflag+pretab /
  subblock_gain), **short-block reorder**, **alias reduction** (the
  8 closed-form butterflies), **36/12-point IMDCT** with all four
  window types, overlap-add, frequency inversion, and the
  already-≥80 dB-validated polyphase synthesis from operators/mp3.py
  — all closed-form math, pinned against literal-definition
  transforms and spec-rule encoder round-trips in tests/test_mp3l3.py.

The tier gap, stated plainly: of the 17 distinct Huffman code tables
(ISO Table B.7), only the ones that pass STRUCTURAL validation
(Kraft completeness + prefix-freeness — see mp3l3_tables.py) are
active: tables 0-3, 5-9 (9 joined in r12 via a two-candidate forced
repair, see its header) and both count1 tables. The remaining big
tables failed transcription validation and there is NO Layer III
reference on this rig to extract or repair them from (unlike VP8,
whose constants came from libwebp's own rodata) — a stream selecting
one raises ``NotImplementedError`` (the documented ffmpeg slot)
instead of decoding garbage. The r12 repair-search results sharpen
the negative finding: exhaustive single-entry search repairs 9
(two candidates, symmetry-forced choice) but proves 10's lengths
hold compensating errors beyond code-level tiling repair, and 12's
minimal repair is 4-way ambiguous (equal-length code permutations) —
the gated tables are unrecoverable without a trustworthy source, not
merely unvalidated. The ESC (linbits) DECODE machinery itself is
fully implemented and round-trip-validated against a synthetic
structurally-valid xlen=16 table (tests/test_mp3l3.py), so correct
ISO data would light the 16-31 families up with zero decoder
changes. This decodes low-amplitude / low-bitrate material and every
stream the in-repo spec-rule encoder emits; typical high-bitrate
music picks the gated tables.

Reference anchor: no counterpart in the reference (record/replay
tool); part of the multimodal E13 surface next to the Layer I/II
decoder in operators/mp3.py.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from kinesis_vcr_spark.operators.mp3 import (
    _BitReader,
    _id3v2_size,
    _parse_header,
    synthesize_subbands,
)
from kinesis_vcr_spark.operators.mp3l3_tables import (
    INVALID_TABLES,
    LINBITS_16,
    LINBITS_24,
    RAW_TABLES,
    VALID_TABLES,
)

# ----------------------------------------------------------- tables

#: MPEG-1 scalefac_compress -> (slen1, slen2)
SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]

#: long-block pretab (applied when preflag, bands 0..21)
PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3,
          2, 0]

#: scalefactor band boundaries, MPEG-1 (ISO Table B.8)
SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}

#: MPEG-2 LSF band boundaries (ISO 13818-3 Table B.2; structural
#: checks pinned in tests: strictly increasing, long ends at 576,
#: short at 192 — and for the silence-spectrum LAME fixture the PCM
#: output is boundary-independent, so the r12 LSF enablement does not
#: rest on these values alone)
SFB_LONG.update({
    22050: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576],
    24000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136,
            162, 194, 232, 278, 332, 394, 464, 540, 576],
    16000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576],
})
SFB_SHORT.update({
    22050: [0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192],
    24000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192],
    16000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192],
})

_CS = []
_CA = []
for _ci in (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
            -0.0037):
    _c = 1.0 / math.sqrt(1.0 + _ci * _ci)
    _CS.append(_c)
    _CA.append(_ci * _c)


def _decoder_for(table: int):
    """(xlen, linbits, (len,code)->symbol map) for a big-value table
    number, or raise the documented slot for gated/unknown tables."""
    if table == 0:
        return 0, 0, None
    if table in LINBITS_16:
        base, linbits = 16, LINBITS_16[table]
    elif table in LINBITS_24:
        base, linbits = 24, LINBITS_24[table]
    elif table in RAW_TABLES:
        base, linbits = table, RAW_TABLES[table][1]
    else:
        raise ValueError(f"Layer III Huffman table {table} does not exist")
    if base not in VALID_TABLES:
        raise NotImplementedError(
            f"Layer III Huffman table {table} (codes of table {base}) is "
            f"GATED: transcription failed structural validation "
            f"({INVALID_TABLES.get(base, ['?'])[0]}) and no reference "
            f"exists on this system to repair it — ffmpeg slot"
        )
    xlen, dec = VALID_TABLES[base]
    return xlen, linbits, dec


# ------------------------------------------------------- side info

def parse_side_info(data: bytes, hdr: dict[str, Any]) -> dict[str, Any]:
    """Side information block (follows the 4-byte header + optional
    CRC). MPEG-1: 2 granules, 9-bit main_data_begin; MPEG-2 LSF: 1
    granule, 8-bit main_data_begin, no scfsi, 21-bit gr/ch fields."""
    br = _BitReader(data)
    nch = hdr["channels"]
    lsf = hdr["version"] != "MPEG1"
    si: dict[str, Any] = {}
    si["main_data_begin"] = br.read(8 if lsf else 9)
    br.read((1 if nch == 1 else 2) if lsf else (5 if nch == 1 else 3))
    if not lsf:
        si["scfsi"] = [[br.read(1) for _ in range(4)] for _ in range(nch)]
    else:
        si["scfsi"] = [[0] * 4 for _ in range(nch)]
    grs = []
    for _g in range(1 if lsf else 2):
        chs = []
        for _ch in range(nch):
            g: dict[str, Any] = {}
            g["part2_3_length"] = br.read(12)
            g["big_values"] = br.read(9)
            if g["big_values"] > 288:
                # 9-bit field admits up to 511 => 1022 lines > 576;
                # anything past 288 pairs is a corrupt stream, not a
                # valid Layer III granule (ISO 11172-3 2.4.2.7).
                raise ValueError(
                    f"big_values {g['big_values']} > 288 "
                    "(corrupt Layer III side info)"
                )
            g["global_gain"] = br.read(8)
            g["scalefac_compress"] = br.read(9 if lsf else 4)
            g["window_switching"] = br.read(1)
            if g["window_switching"]:
                g["block_type"] = br.read(2)
                g["mixed_block"] = br.read(1)
                g["table_select"] = [br.read(5), br.read(5), 0]
                g["subblock_gain"] = [br.read(3) for _ in range(3)]
                g["region0_count"] = 8 if g["block_type"] == 2 and not \
                    g["mixed_block"] else 7
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [br.read(5) for _ in range(3)]
                g["region0_count"] = br.read(4)
                g["region1_count"] = br.read(3)
                g["subblock_gain"] = [0, 0, 0]
            g["preflag"] = 0 if lsf else br.read(1)
            g["scalefac_scale"] = br.read(1)
            g["count1table_select"] = br.read(1)
            chs.append(g)
        grs.append(chs)
    si["granules"] = grs
    si["size"] = (
        (9 if nch == 1 else 17) if lsf else (17 if nch == 1 else 32)
    )
    return si


def walk_side_info(payload: bytes) -> list[dict[str, Any]]:
    """Parse every frame's header + side info and CHECK bit-reservoir
    consistency: frame k's ``main_data_begin`` must not reach back
    past the main data accumulated by earlier frames. A wrong
    side-info layout breaks this within a few frames — the validation
    the real-file test pins. Returns one dict per frame."""
    pos = _id3v2_size(payload)
    out = []
    reservoir_bytes = 0
    while pos + 4 <= len(payload):
        h = int.from_bytes(payload[pos : pos + 4], "big")
        hdr = _parse_header(h)
        if hdr is None:
            pos += 1
            continue
        if pos + hdr["frame_bytes"] > len(payload):
            break
        if hdr["layer"] != 3:
            raise ValueError("walk_side_info expects a Layer III stream")
        off = pos + 4 + (2 if hdr["crc"] else 0)
        si = parse_side_info(payload[off : off + 40], hdr)
        if si["main_data_begin"] > reservoir_bytes:
            raise ValueError(
                f"frame at {pos}: main_data_begin {si['main_data_begin']} "
                f"reaches past the {reservoir_bytes}-byte reservoir"
            )
        main_len = hdr["frame_bytes"] - 4 - (2 if hdr["crc"] else 0) \
            - si["size"]
        reservoir_bytes = min(reservoir_bytes + main_len, 511)
        out.append({"pos": pos, "hdr": hdr, "side": si,
                    "main_len": main_len})
        pos += hdr["frame_bytes"]
    if not out:
        raise ValueError("no Layer III frames found")
    return out


# ----------------------------------------------------- scalefactors

def read_scalefacs_mpeg1(br, g, scfsi_ch, prev, granule_idx):
    """MPEG-1 scalefactors for one granule/channel: returns
    (long[22], short[13][3], bits_read)."""
    slen1, slen2 = SLEN[g["scalefac_compress"]]
    bits = 0
    sf_long = [0] * 22
    sf_short = [[0, 0, 0] for _ in range(13)]
    if g["window_switching"] and g["block_type"] == 2:
        if g["mixed_block"]:
            for b in range(8):
                sf_long[b] = br.read(slen1)
                bits += slen1
            for b in range(3, 6):
                for w in range(3):
                    sf_short[b][w] = br.read(slen1)
                    bits += slen1
            for b in range(6, 12):
                for w in range(3):
                    sf_short[b][w] = br.read(slen2)
                    bits += slen2
        else:
            for b in range(6):
                for w in range(3):
                    sf_short[b][w] = br.read(slen1)
                    bits += slen1
            for b in range(6, 12):
                for w in range(3):
                    sf_short[b][w] = br.read(slen2)
                    bits += slen2
    else:
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                  (16, 21, slen2)]
        for gi, (lo, hi, sl) in enumerate(groups):
            if granule_idx == 1 and scfsi_ch[gi]:
                for b in range(lo, hi):
                    sf_long[b] = prev[b]
            else:
                for b in range(lo, hi):
                    sf_long[b] = br.read(sl)
                    bits += sl
    return sf_long, sf_short, bits


#: LSF scalefactor band-group sizes per blocktypenumber (0 = long,
#: 1 = short, 2 = mixed) and blocknumber (ISO 13818-3 §2.4.3.2; the
#: intensity-stereo blocknumbers 3-5 never arise here — intensity
#: raises the documented slot up front)
_LSF_NR_OF_SFB = {
    0: [(6, 5, 5, 5), (6, 5, 7, 3), (11, 10, 0, 0)],
    1: [(9, 9, 9, 9), (9, 9, 12, 6), (18, 18, 0, 0)],
    2: [(6, 9, 9, 9), (6, 9, 12, 6), (15, 18, 0, 0)],
}


def read_scalefacs_lsf(br, g):
    """MPEG-2 LSF scalefactors for one granule/channel (no scfsi, no
    intensity — that path raises before decode). The 9-bit
    scalefac_compress selects slen[0..3] and a band partition; values
    fill the long bands (or the 3-per-band short windows) in order.
    Returns (long[22], short[13][3], bits_read); sets ``g['preflag']``
    for the blocknumber-2 layout exactly as the spec prescribes."""
    sc = g["scalefac_compress"]
    if sc < 400:
        slen = [(sc >> 4) // 5, (sc >> 4) % 5, (sc % 16) >> 2, sc % 4]
        blocknumber = 0
    elif sc < 500:
        s = sc - 400
        slen = [(s >> 2) // 5, (s >> 2) % 5, s % 4, 0]
        blocknumber = 1
    else:
        s = sc - 500
        slen = [s // 3, s % 3, 0, 0]
        blocknumber = 2
        g["preflag"] = 1
    short = g["window_switching"] and g["block_type"] == 2
    btype = 2 if (short and g["mixed_block"]) else (1 if short else 0)
    nr = _LSF_NR_OF_SFB[btype][blocknumber]
    bits = 0
    sf_long = [0] * 22
    sf_short = [[0, 0, 0] for _ in range(13)]
    if short and not g["mixed_block"]:
        # the LSF short partitions count SCALEFACTORS, not bands:
        # 9+9+9+9 = 36 = 12 bands x 3 windows, filled band-major
        vals = []
        for part, sl in zip(nr, slen):
            for _ in range(part):
                vals.append(br.read(sl) if sl else 0)
                bits += sl
        for i, v in enumerate(vals[:36]):
            sf_short[i // 3][i % 3] = v
    elif short and g["mixed_block"]:
        vals = []
        for part, sl in zip(nr, slen):
            for _ in range(part):
                vals.append(br.read(sl) if sl else 0)
                bits += sl
        # LSF mixed blocks ALWAYS have exactly 6 long bands (ISO
        # 13818-3 / ffmpeg): the nr partitions only group slen widths,
        # so for blocknumber 2 nr[0]=15 is a partition size, NOT the
        # long-band count. Fill sf_long[0:6], then band-major into the
        # short bands starting at band 3.
        n_long = 6
        for b in range(n_long):
            sf_long[b] = vals[b]
        for i, v in enumerate(vals[n_long:][:27]):
            sf_short[3 + i // 3][i % 3] = v
    else:
        b = 0
        for part, sl in zip(nr, slen):
            for _ in range(part):
                if b < 22:
                    sf_long[b] = br.read(sl) if sl else 0
                    bits += sl
                b += 1
    return sf_long, sf_short, bits


# --------------------------------------------------------- huffman

def _read_huff(br, dec, max_len=19):
    """MSB-first code read against a (len,code)->symbol map."""
    code = 0
    for length in range(1, max_len + 1):
        code = (code << 1) | br.read(1)
        sym = dec.get((length, code))
        if sym is not None:
            return sym, length
    raise ValueError("invalid Layer III Huffman code")


def decode_spectrum(br, g, sfb_long, part2_bits):
    """Huffman-decode the 576-line spectrum of one granule/channel,
    enforcing exact part2_3_length consumption (the spec's own
    accounting makes this a hard canary)."""
    xs = np.zeros(576, np.float64)
    budget = g["part2_3_length"] - part2_bits
    used = 0

    def rd(n):
        nonlocal used
        used += n
        return br.read(n)

    # region boundaries in line pairs
    bigv = g["big_values"] * 2
    if g["window_switching"]:
        region1_start = 36
        region2_start = 576
    else:
        region1_start = sfb_long[g["region0_count"] + 1]
        r2 = g["region0_count"] + 1 + g["region1_count"] + 1
        region2_start = sfb_long[min(r2, len(sfb_long) - 1)]
    i = 0
    while i < bigv:
        if i < region1_start:
            table = g["table_select"][0]
        elif i < region2_start:
            table = g["table_select"][1]
        else:
            table = g["table_select"][2]
        xlen, linbits, dec = _decoder_for(table)
        if dec is None:  # table 0: both lines zero
            i += 2
            continue
        sym, ln = _read_huff(br, dec)
        used += ln
        x, y = divmod(sym, xlen)
        for j, v in enumerate((x, y)):
            val = v
            if val == xlen - 1 == 15 and linbits:
                val += rd(linbits)
            if val:
                if rd(1):
                    val = -val
            xs[i + j] = val
        i += 2
    # count1 region
    c1dec = VALID_TABLES["count1A" if g["count1table_select"] == 0
                         else "count1B"][1]
    while used < budget and i + 4 <= 576:
        sym, ln = _read_huff(br, c1dec, max_len=6)
        used += ln
        for j in range(4):
            v = (sym >> (3 - j)) & 1
            if v:
                if rd(1):
                    v = -v
            xs[i + j] = v
        i += 4
    if used > budget:
        raise ValueError(
            f"Huffman region overran part2_3_length by {used - budget} "
            "bits (count1 tail)"
        )
    # skip ancillary/stuffing up to the budget
    while used < budget:
        rd(1)
    return xs, i


# ----------------------------------------------------- requantize &c

def requantize(xs, g, sf_long, sf_short, sfb_long, sfb_short):
    out = np.zeros(576, np.float64)
    mult = 1.0 if g["scalefac_scale"] else 0.5
    gain = g["global_gain"] - 210
    p43 = np.abs(xs) ** (4.0 / 3.0) * np.sign(xs)
    short = g["window_switching"] and g["block_type"] == 2
    mixed = short and g["mixed_block"]
    long_end = 576
    if short:
        long_end = sfb_long[8] if mixed else 0
    # long region
    b = 0
    for i in range(long_end):
        while i >= sfb_long[b + 1]:
            b += 1
        sf = sf_long[b] + (PRETAB[b] if g["preflag"] else 0)
        out[i] = p43[i] * 2.0 ** (gain / 4.0 - mult * 2.0 * sf)
    if not short:
        return out
    # short region (post-reorder layout handled by caller: here xs is
    # still in decoded band/window order — index via short bands)
    start_band = 3 if mixed else 0
    for b in range(start_band, 13):
        lo3, hi3 = sfb_short[b] * 3, sfb_short[b + 1] * 3
        width = sfb_short[b + 1] - sfb_short[b]
        for w in range(3):
            sf = sf_short[min(b, 12)][w] if b < 12 else 0
            g_w = gain - 8 * g["subblock_gain"][w]
            scale = 2.0 ** (g_w / 4.0 - mult * 2.0 * sf)
            base = lo3 + w * width
            for k in range(width):
                idx = base + k
                if idx < 576:
                    out[idx] = p43[idx] * scale
    return out


def reorder_short(xr, g, sfb_short):
    """Short-block reorder: decoded order is per-band window-major;
    the filterbank wants line-interleaved windows."""
    if not (g["window_switching"] and g["block_type"] == 2):
        return xr
    out = xr.copy()
    mixed = g["mixed_block"]
    start_band = 3 if mixed else 0
    for b in range(start_band, 13):
        s = sfb_short[b]
        width = sfb_short[b + 1] - s
        base = s * 3
        for w in range(3):
            for k in range(width):
                src = base + w * width + k
                dst = base + k * 3 + w
                if src < 576 and dst < 576:
                    out[dst] = xr[src]
    return out


def antialias(xr, g):
    if g["window_switching"] and g["block_type"] == 2 and not \
            g["mixed_block"]:
        return xr
    sb_max = 2 if (g["window_switching"] and g["block_type"] == 2) else 32
    out = xr.copy()
    for sb in range(1, sb_max):
        for i in range(8):
            a = out[18 * sb - 1 - i]
            b = out[18 * sb + i]
            out[18 * sb - 1 - i] = a * _CS[i] - b * _CA[i]
            out[18 * sb + i] = b * _CS[i] + a * _CA[i]
    return out


def _imdct(X, n):
    """n-point IMDCT, literal definition (n=36 long, n=12 short)."""
    half = n // 2
    i = np.arange(n)
    k = np.arange(half)
    cosm = np.cos(np.pi / (2 * n) * np.outer(2 * i + 1 + half,
                                             2 * k + 1))
    return cosm @ X


def _window(n_type):
    w = np.zeros(36)
    i = np.arange(36)
    if n_type == 0:
        w = np.sin(np.pi / 36 * (i + 0.5))
    elif n_type == 1:
        w[:18] = np.sin(np.pi / 36 * (i[:18] + 0.5))
        w[18:24] = 1.0
        w[24:30] = np.sin(np.pi / 12 * (i[24:30] - 18 + 0.5))
        w[30:] = 0.0
    elif n_type == 3:
        w[:6] = 0.0
        w[6:12] = np.sin(np.pi / 12 * (i[6:12] - 6 + 0.5))
        w[12:18] = 1.0
        w[18:] = np.sin(np.pi / 36 * (i[18:] + 0.5))
    return w


_WIN_SHORT = np.sin(np.pi / 12 * (np.arange(12) + 0.5))


def hybrid_filterbank(xr, g, overlap):
    """18-line groups → 36-sample IMDCT (or 3×12 short) → window →
    overlap-add; returns (32, 18) subband samples (time-major per
    subband) and updates ``overlap`` (32, 18) in place."""
    out = np.zeros((32, 18))
    short_all = g["window_switching"] and g["block_type"] == 2
    mixed = short_all and g["mixed_block"]
    for sb in range(32):
        X = xr[18 * sb : 18 * (sb + 1)]
        is_short = short_all and (not mixed or sb >= 2)
        if is_short:
            z = np.zeros(36)
            for w in range(3):
                pts = _imdct(X[w::3], 12) * _WIN_SHORT
                z[6 + 6 * w : 18 + 6 * w] += pts
        else:
            btype = g["block_type"] if not (mixed and sb < 2) else 0
            if short_all and mixed and sb < 2:
                btype = 0
            z = _imdct(X, 36) * _window(btype)
        out[sb] = z[:18] + overlap[sb]
        overlap[sb] = z[18:]
    # frequency inversion: odd subbands, odd time samples
    out[1::2, 1::2] = -out[1::2, 1::2]
    return out


# ----------------------------------------------------------- driver

def decode_layer3(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Layer III decode → (frames, channels, int16 PCM) for MPEG-1
    and (r12) MPEG-2 LSF streams. Streams selecting a gated Huffman
    table raise the documented NotImplementedError, as do joint-stereo
    frames with intensity coding (mode_extension bit 0)."""
    frames = walk_side_info(payload)
    hdr0 = frames[0]["hdr"]
    lsf = hdr0["version"] != "MPEG1"
    for fr in frames:
        h = fr["hdr"]
        # joint stereo: MS is implemented below; intensity positioning
        # is NOT — decoding it as plain stereo would silently produce
        # wrong audio, so honour the module contract and raise before
        # any PCM is emitted.
        if h["channels"] == 2 and h["mode"] == 1 and \
                h["mode_extension"] & 1:
            raise NotImplementedError(
                "MPEG-1 Layer III intensity stereo is not implemented "
                "(documented ffmpeg slot); mode_extension bit 0 set"
            )
    nch = hdr0["channels"]
    rate = hdr0["sample_rate"]
    sfb_long, sfb_short = SFB_LONG[rate], SFB_SHORT[rate]
    reservoir = b""
    # subband frames accumulate across the WHOLE stream and run
    # through the (stateful-by-window) polyphase once per channel —
    # per-granule synthesize calls would reset the 512-tap overlap
    sb_frames: list[list[np.ndarray]] = [[] for _ in range(nch)]
    overlap = [np.zeros((32, 18)) for _ in range(nch)]
    prev_sf = [[0] * 22 for _ in range(nch)]
    for fr in frames:
        pos, hdr, si = fr["pos"], fr["hdr"], fr["side"]
        off = pos + 4 + (2 if hdr["crc"] else 0) + si["size"]
        main = payload[off : pos + hdr["frame_bytes"]]
        start = len(reservoir) - si["main_data_begin"]
        if start < 0:
            raise ValueError("bit reservoir underrun")
        data = reservoir[start:] + main
        br = _BitReader(data)
        for gi in range(1 if lsf else 2):
            gr_out = []
            for ch in range(nch):
                g = si["granules"][gi][ch]
                if lsf:
                    sf_long, sf_short, p2 = read_scalefacs_lsf(br, g)
                else:
                    sf_long, sf_short, p2 = read_scalefacs_mpeg1(
                        br, g, si["scfsi"][ch], prev_sf[ch], gi
                    )
                if gi == 0:
                    prev_sf[ch] = sf_long
                xs, _nz = decode_spectrum(br, g, sfb_long, p2)
                xr = requantize(xs, g, sf_long, sf_short, sfb_long,
                                sfb_short)
                xr = reorder_short(xr, g, sfb_short)
                gr_out.append((g, xr))
            # joint stereo: MS only (intensity raises up front)
            if nch == 2 and hdr["mode"] == 1 and \
                    hdr["mode_extension"] & 2:
                m = gr_out[0][1].copy()
                s = gr_out[1][1].copy()
                gr_out[0][1][:] = (m + s) / math.sqrt(2.0)
                gr_out[1][1][:] = (m - s) / math.sqrt(2.0)
            for ch in range(nch):
                g, xr = gr_out[ch]
                xa = antialias(xr, g)
                sb = hybrid_filterbank(xa, g, overlap[ch])
                sb_frames[ch].append(sb.T)  # (18, 32)
        reservoir = (reservoir + main)[-511:]
    chans = [
        synthesize_subbands(np.concatenate(f, axis=0))
        for f in sb_frames
    ]
    n = min(len(c) for c in chans)
    pcm = np.stack([c[:n] for c in chans], axis=1)
    pcm16 = np.clip(np.rint(pcm * 32768.0), -32768, 32767).astype(np.int16)
    return n, nch, pcm16
