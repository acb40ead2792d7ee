"""MPEG-1 Layer III decode (operators/mp3l3.py) — the validation
pyramid for a codec with NO reference implementation on this rig:

1. structural table validation (Kraft completeness + prefix-freeness)
   and UNIQUENESS of the one forced repair in table 7;
2. spec-rule encoder round-trip: a bit-exact in-test encoder writes
   complete frames through the validated tables; the decoder must
   recover the exact quantized spectrum AND consume exactly
   part2_3_length bits per granule (Layer III's built-in canary);
3. MDCT perfect-reconstruction: the 36-point IMDCT + sine window +
   overlap-add must reconstruct an analysis-MDCT'd signal to
   numerical precision (TDAC identity — a property no shared-table
   bug can fake);
4. end-to-end tone placement: a single spectral line through the FULL
   chain (requantize → IMDCT → overlap → frequency inversion →
   polyphase) must come out as a sinusoid at the line's frequency —
   wrong reorder/inversion/window order moves or splatters the tone;
5. real-world file: every frame of a LAME-encoded MPEG-2 stream walks
   with consistent bit-reservoir back-pointers (a wrong side-info
   layout overruns the reservoir within frames), and (r12) the LSF
   decode path reproduces the stream's PCM — the fixture is digital
   silence (every granule part2_3_length == 0), so the expected
   output is exact."""

from __future__ import annotations

import math

import numpy as np
import pytest

from kinesis_vcr_spark.operators.mp3l3 import (
    SFB_LONG,
    _imdct,
    _window,
    decode_layer3,
    parse_side_info,
    walk_side_info,
)
from kinesis_vcr_spark.operators.mp3l3_tables import (
    INVALID_TABLES,
    RAW_TABLES,
    VALID_TABLES,
    validate_table,
)

REAL_MP3 = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
            "test_data/test.mp3")


# ------------------------------------------------------ tier 1: tables

def test_active_tables_are_structurally_valid():
    for n, (xlen, _lb, lens, codes) in RAW_TABLES.items():
        probs = validate_table(lens, codes)
        if n in VALID_TABLES:
            assert not probs, (n, probs)
        else:
            assert n in INVALID_TABLES and probs


def test_gated_tables_raise_the_documented_slot():
    from kinesis_vcr_spark.operators.mp3l3 import _decoder_for

    with pytest.raises(NotImplementedError, match="GATED"):
        _decoder_for(13)
    with pytest.raises(NotImplementedError, match="GATED"):
        _decoder_for(21)  # shares table 16's gated codes
    xlen, linbits, dec = _decoder_for(7)
    assert xlen == 6 and linbits == 0 and dec


def test_table7_repair_is_unique():
    """The committed fix (entry 33: code 5 -> 3) must be the ONLY
    single-entry code edit that validates table 7 — re-run the repair
    search against the original transcription."""
    xlen, lb, lens, codes = RAW_TABLES[7]
    broken = list(codes)
    broken[33] = 5  # the original (invalid) transcription
    assert validate_table(lens, broken)
    fixes = []
    for i in range(len(broken)):
        for c2 in range(1 << lens[i]):
            if c2 == broken[i]:
                continue
            t = list(broken)
            t[i] = c2
            if not validate_table(lens, t):
                fixes.append((i, c2))
    assert fixes == [(33, 3)]


def test_table9_repair_search_is_two_candidate():
    """The r12 table-9 fix (entry 27: hlen 8 -> 7): an exhaustive
    single-entry (length, code) search over the original transcription
    finds EXACTLY the two repairs the docstring claims — entry 27 or
    entry 32 to (7,6) — and the committed choice (27) is the one that
    preserves both symmetry pairs hlen(3,4)=hlen(4,3) and
    hlen(2,5)=hlen(5,2)."""
    xlen, lb, lens, codes = RAW_TABLES[9]
    broken_l = list(lens)
    broken_l[27] = 8  # the original (invalid) transcription
    assert validate_table(broken_l, codes)
    fixes = []
    for i in range(len(codes)):
        for l2 in range(1, 17):
            for c2 in range(1 << min(l2, 14)):
                if (l2, c2) == (broken_l[i], codes[i]):
                    continue
                L2, C2 = list(broken_l), list(codes)
                L2[i], C2[i] = l2, c2
                if not validate_table(L2, C2):
                    fixes.append((i, l2, c2))
    assert fixes == [(27, 7, 6), (32, 7, 6)]
    # the committed table chose 27; symmetry holds there and only there
    g = [lens[i * 6 : (i + 1) * 6] for i in range(6)]
    assert g[4][3] == g[3][4] == 7
    assert g[5][2] == g[2][5] == 8


# --------------------------------------- tier 2: encoder round-trip

class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2)
            for i in range(0, len(bits), 8)
        )


def _encode_granule(bw, spectrum, table, c1sel=0, table_data=None):
    """Huffman-encode a 576-line integer spectrum (big-value pairs
    through ``table``, then |1| quads through count1 A/B). Returns
    (part2_3_length, big_values). ``table_data`` overrides the table's
    (xlen, linbits, lengths, codes) — the hook the synthetic-ESC
    round-trip uses (r12: the linbits layout validated independently
    of the still-gated ISO ESC transcriptions)."""
    xlen, lb, lens, codes = table_data or RAW_TABLES[table]
    enc = {i: (lens[i], codes[i]) for i in range(len(lens))}
    from kinesis_vcr_spark.operators.mp3l3_tables import (
        COUNT1A_C,
        COUNT1A_L,
        COUNT1B_C,
        COUNT1B_L,
    )

    nz = 0
    for i, v in enumerate(spectrum):
        if v:
            nz = i + 1
    big_end = nz
    for i in range(nz):
        if abs(spectrum[i]) > 1:
            big_end = max(big_end, i + 1)
    # locate the big-value region: smallest even prefix covering every
    # |v|>1, then count1 covers the rest of nz in quads
    bigv_end = 0
    for i, v in enumerate(spectrum):
        if abs(v) > 1:
            bigv_end = i + 1
    bigv_end += bigv_end % 2
    c1_end = max(nz, bigv_end)
    c1_end = bigv_end + (-(bigv_end - c1_end) // 4 * -4)
    while c1_end % 4 or c1_end < nz:
        c1_end += 1
        while c1_end % 4:
            c1_end += 1
    n0 = len(bw.bits)
    esc_max = (15 + (1 << lb) - 1) if lb else xlen - 1
    for i in range(0, bigv_end, 2):
        x, y = abs(spectrum[i]), abs(spectrum[i + 1])
        assert x <= esc_max and y <= esc_max, \
            "test spectrum exceeds table range"
        cx, cy = min(x, xlen - 1), min(y, xlen - 1)
        ln, code = enc[cx * xlen + cy]
        bw.write(code, ln)
        # per-value layout matches the decoder: linbits THEN sign,
        # x completely before y (ISO 11172-3 2.4.3.4.6)
        if lb and cx == 15:
            bw.write(x - 15, lb)
        if x:
            bw.write(1 if spectrum[i] < 0 else 0, 1)
        if lb and cy == 15:
            bw.write(y - 15, lb)
        if y:
            bw.write(1 if spectrum[i + 1] < 0 else 0, 1)
    c1l, c1c = (COUNT1A_L, COUNT1A_C) if c1sel == 0 else (
        COUNT1B_L, COUNT1B_C)
    for i in range(bigv_end, c1_end, 4):
        quad = [abs(spectrum[i + j]) for j in range(4)]
        assert all(q <= 1 for q in quad)
        sym = (quad[0] << 3) | (quad[1] << 2) | (quad[2] << 1) | quad[3]
        bw.write(c1c[sym], c1l[sym])
        for j in range(4):
            if quad[j]:
                bw.write(1 if spectrum[i + j] < 0 else 0, 1)
    return len(bw.bits) - n0, bigv_end // 2


def _build_frame(spectra, table=7, rate=44100, c1sel=0,
                 table_data=None):
    """One complete MPEG-1 Layer III mono frame (320 kbps, padded
    with stuffing) holding two granules of the given integer
    spectra."""
    main = _BitWriter()
    sides = []
    for sp in spectra:
        p23, bigv = _encode_granule(main, sp, table, c1sel, table_data)
        sides.append((p23, bigv))
    body = main.to_bytes()
    side = _BitWriter()
    side.write(0, 9)   # main_data_begin
    side.write(0, 5)   # private (mono)
    side.write(0, 4)   # scfsi
    n_long = len(SFB_LONG[rate]) - 1
    for p23, bigv in sides:
        side.write(p23, 12)
        side.write(bigv, 9)
        side.write(210, 8)  # global_gain -> 2^0
        side.write(0, 4)    # scalefac_compress -> slen (0,0)
        side.write(0, 1)    # window_switching off
        for _ in range(3):
            side.write(table, 5)
        side.write(n_long - 2 - 1, 4)  # region0_count: region1 tiny
        side.write(0, 3)               # region1_count
        side.write(0, 1)   # preflag
        side.write(0, 1)   # scalefac_scale
        side.write(c1sel, 1)  # count1table_select
    sidedata = side.to_bytes()
    assert len(sidedata) == 17
    # header: MPEG1 layer3, 320kbps, 44100, mono, no CRC
    hdr = 0xFFFB << 16
    hdr |= 0xE << 12   # bitrate index 14 = 320k
    hdr |= 0x0 << 10   # 44100
    hdr |= 0x3 << 6    # mono
    frame_bytes = 144 * 320000 // rate
    frame = bytearray(hdr.to_bytes(4, "big") + sidedata + body)
    frame += bytes(frame_bytes - len(frame))  # stuffing
    return bytes(frame)


def _spectrum(seed, max_abs, n_big, n_quads):
    rng = np.random.default_rng(seed)
    sp = np.zeros(576, int)
    sp[:n_big] = rng.integers(-max_abs, max_abs + 1, n_big)
    q = rng.integers(-1, 2, n_quads * 4)
    sp[n_big : n_big + 4 * n_quads] = q
    if n_big:
        sp[n_big - 1] = max_abs  # pin the region boundary
    return sp


@pytest.mark.parametrize("table,max_abs", [
    (1, 1), (2, 2), (3, 2), (5, 3), (6, 3), (7, 5), (8, 5), (9, 5),
])
def test_roundtrip_spectrum_exact(table, max_abs):
    """Decode must recover |v|^(4/3)·sign(v) exactly for every line
    (gain 2^0, scalefactors 0) and consume exactly part2_3_length."""
    from kinesis_vcr_spark.operators.mp3 import _BitReader, _parse_header
    from kinesis_vcr_spark.operators.mp3l3 import (
        decode_spectrum,
        read_scalefacs_mpeg1,
    )

    sp0 = _spectrum(41 + table, max_abs, n_big=30, n_quads=8)
    sp1 = _spectrum(97 + table, max_abs, n_big=18, n_quads=5)
    frame = _build_frame([sp0, sp1], table=table, c1sel=table % 2)
    hdr = _parse_header(int.from_bytes(frame[:4], "big"))
    si = parse_side_info(frame[4:40], hdr)
    br = _BitReader(frame[4 + 17 :])
    for gi, sp in enumerate((sp0, sp1)):
        g = si["granules"][gi][0]
        _sfl, _sfs, p2 = read_scalefacs_mpeg1(
            br, g, si["scfsi"][0], [0] * 22, gi
        )
        assert p2 == 0
        xs, _ = decode_spectrum(br, g, SFB_LONG[44100], p2)
        np.testing.assert_array_equal(xs, sp)  # exact integer recovery
        from kinesis_vcr_spark.operators.mp3l3 import SFB_SHORT, requantize

        xr = requantize(
            xs, g, [0] * 22, [[0] * 3 for _ in range(13)],
            SFB_LONG[44100], SFB_SHORT[44100],
        )
        want = np.sign(sp) * np.abs(sp).astype(float) ** (4.0 / 3.0)
        np.testing.assert_allclose(xr, want, rtol=1e-12)


def test_esc_linbits_roundtrip_synthetic(monkeypatch):
    """The ESC (linbits) layout of decode_spectrum, validated
    INDEPENDENTLY of the still-gated ISO ESC transcriptions: a
    synthetic structurally-valid xlen=16 table (256 symbols, all 8-bit
    codes — Kraft-complete and trivially prefix-free) is injected as
    table 16's code set, the in-test encoder writes values ABOVE 15
    through the 15+linbits escape, and the decoder must recover every
    line exactly while consuming exactly part2_3_length bits. Proves
    the machinery so that valid ISO data, when a trustworthy source
    exists, lights the family up with zero decoder changes."""
    from kinesis_vcr_spark.operators import mp3l3_tables as mt
    from kinesis_vcr_spark.operators.mp3 import _BitReader, _parse_header
    from kinesis_vcr_spark.operators.mp3l3 import (
        decode_spectrum,
        read_scalefacs_mpeg1,
    )

    syn_l = [8] * 256
    syn_c = list(range(256))
    assert not validate_table(syn_l, syn_c)
    monkeypatch.setitem(
        mt.VALID_TABLES, 16, (16, mt.build_decoder(syn_l, syn_c))
    )
    lb = mt.LINBITS_16[16]  # 1 -> values up to 16 encodable
    table_data = (16, lb, syn_l, syn_c)
    rng = np.random.default_rng(7)
    sp0 = np.zeros(576, int)
    sp0[:40] = rng.integers(-16, 17, 40)
    sp0[0], sp0[39] = 16, -16          # exercise both ESC signs
    sp0[40:56] = rng.integers(-1, 2, 16)
    sp1 = np.zeros(576, int)
    sp1[:20] = rng.integers(-16, 17, 20)
    sp1[19] = 15                        # boundary: 15 itself escapes
    frame = _build_frame(
        [sp0, sp1], table=16, table_data=table_data
    )
    hdr = _parse_header(int.from_bytes(frame[:4], "big"))
    si = parse_side_info(frame[4:40], hdr)
    br = _BitReader(frame[4 + 17 :])
    for gi, sp in enumerate((sp0, sp1)):
        g = si["granules"][gi][0]
        _sfl, _sfs, p2 = read_scalefacs_mpeg1(
            br, g, si["scfsi"][0], [0] * 22, gi
        )
        xs, _ = decode_spectrum(br, g, SFB_LONG[44100], p2)
        np.testing.assert_array_equal(xs, sp)


def test_full_decode_runs_and_is_finite():
    sp0 = _spectrum(5, 5, 40, 10)
    sp1 = _spectrum(6, 5, 24, 6)
    frame = _build_frame([sp0, sp1], table=7)
    n, ch, pcm = decode_layer3(frame * 3)
    assert ch == 1 and n == 1152 * 3
    assert np.isfinite(pcm).all()


# -------------------------------------- tier 3: MDCT reconstruction

def test_imdct_window_overlap_reconstructs():
    """TDAC: forward MDCT (literal definition) of overlapping
    36-sample sine-windowed segments, then IMDCT + window +
    overlap-add, reproduces the interior signal to float precision."""
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, 18 * 6)
    w = _window(0)
    i = np.arange(36)
    k = np.arange(18)
    fwd = np.cos(np.pi / 72 * np.outer(2 * k + 1,
                                       2 * i + 1 + 18))  # (18, 36)
    prev_tail = np.zeros(18)
    out = []
    for blk in range(5):
        seg = x[blk * 18 : blk * 18 + 36]
        X = fwd @ (seg * w)
        z = _imdct(X, 36) * w * (4.0 / 36)
        out.append(z[:18] + prev_tail)
        prev_tail = z[18:]
    got = np.concatenate(out)[18:]  # skip the first half-block
    np.testing.assert_allclose(got, x[18 : 18 * 5], atol=1e-10)


# ------------------------------------------- tier 4: tone placement

def test_single_line_lands_on_its_frequency():
    """Energy on spectral line k must synthesize to a tone at
    (k+0.5)·rate/1152 Hz — the full-chain canary for reorder /
    frequency-inversion / window order / polyphase stacking."""
    k_line = 40
    sp = np.zeros(576, int)
    sp[k_line] = 5
    sp[k_line + 1] = 5  # pair-coded; keeps big_values even
    frame = _build_frame([sp, sp], table=7)
    n, _ch, pcm = decode_layer3(frame * 8)
    x = pcm[2000:8000, 0].astype(float)
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    peak = np.argmax(spec)
    f_peak = peak * 44100 / len(x)
    f_want_lo = (k_line + 0.5) * 44100 / 1152
    f_want_hi = (k_line + 1.5) * 44100 / 1152
    assert f_want_lo * 0.95 <= f_peak <= f_want_hi * 1.05, (
        f_peak, f_want_lo, f_want_hi)


def test_big_values_over_288_raises_codec_error():
    """The 9-bit big_values field admits 511 (1022 lines > 576);
    parse_side_info must turn that into the codec contract's
    ValueError, not a downstream numpy IndexError."""
    bw = _BitWriter()
    bw.write(0, 9)   # main_data_begin
    bw.write(0, 5)   # private (mono)
    bw.write(0, 4)   # scfsi
    for _gr in range(2):
        bw.write(0, 12)    # part2_3_length
        bw.write(400, 9)   # big_values: corrupt (> 288)
        bw.write(210, 8)
        bw.write(0, 4)
        bw.write(0, 1)
        for _ in range(3):
            bw.write(7, 5)
        bw.write(5, 4)
        bw.write(0, 3)
        bw.write(0, 3)  # preflag+scalefac_scale+count1table_select
    hdr = {"channels": 1, "version": "MPEG1"}
    with pytest.raises(ValueError, match="big_values"):
        parse_side_info(bw.to_bytes(), hdr)


def test_intensity_stereo_raises_documented_slot():
    """Joint-stereo frames with mode_extension bit 0 (intensity) must
    raise NotImplementedError, not silently decode the right channel
    wrong (module contract: every unimplemented path raises)."""
    # the check is an up-front header sweep over walk_side_info's
    # result, so probe it with a patched walk (building a full valid
    # stereo intensity frame would need the very decoder slot gated)
    from kinesis_vcr_spark.operators import mp3l3 as m

    fake_hdr = {
        "channels": 2, "mode": 1, "mode_extension": 1,
        "version": "MPEG1", "sample_rate": 44100,
    }
    real_walk = m.walk_side_info
    m.walk_side_info = lambda payload: [{"hdr": fake_hdr}]
    try:
        with pytest.raises(NotImplementedError, match="intensity"):
            decode_layer3(b"")
    finally:
        m.walk_side_info = real_walk


# ------------------------------------------ tier 5: real-world file

def test_real_lame_stream_side_info_walk():
    with open(REAL_MP3, "rb") as f:
        payload = f.read()
    frames = walk_side_info(payload)
    assert len(frames) == 45
    for fr in frames:
        assert fr["hdr"]["version"] == "MPEG2"
        si = fr["side"]
        assert si["size"] == 9  # LSF mono
        g = si["granules"][0][0]
        # part2_3 bits fit in this frame's main data plus a full
        # 511-byte bit reservoir
        assert g["part2_3_length"] <= 8 * (fr["main_len"] + 511)
        assert g["part2_3_length"] > 0 or g["big_values"] == 0
        assert g["big_values"] <= 288
        for t in g["table_select"]:
            assert t < 32 and t not in (4, 14)
    # reservoir consistency held for all 45 frames (walk_side_info
    # raises otherwise); the LSF decode path (r12) must reproduce the
    # stream's PCM exactly — every granule has part2_3_length == 0
    # (LAME encoded digital silence), so the expected output is 45
    # frames x 576 samples of EXACT zeros: the full chain (LSF
    # scalefactors -> spectrum -> requantize -> IMDCT -> polyphase)
    # runs end to end with a known-exact answer.
    n, nch, pcm = decode_layer3(payload)
    assert (n, nch) == (45 * 576, 1)
    assert int(np.abs(pcm).max()) == 0


def test_lsf_scalefac_slen_decomposition():
    """ISO 13818-3 2.4.3.2: the 9-bit scalefac_compress decomposes
    into slen[0..3] by range; bits_read must equal the partition dot
    product and preflag must switch on only for the >= 500 layout."""
    from kinesis_vcr_spark.operators.mp3 import _BitReader
    from kinesis_vcr_spark.operators.mp3l3 import read_scalefacs_lsf

    def run(sc, short=False, mixed=False):
        g = {
            "scalefac_compress": sc,
            "window_switching": 1 if short else 0,
            "block_type": 2 if short else 0,
            "mixed_block": 1 if mixed else 0,
            "preflag": 0,
        }
        br = _BitReader(bytes(200))
        sfl, sfs, bits = read_scalefacs_lsf(br, g)
        return g, bits

    # blocknumber 0 (sc < 400): slen = (sc>>4)/5, (sc>>4)%5, (sc%16)>>2, sc%4
    g, bits = run(0)
    assert bits == 0 and g["preflag"] == 0
    g, bits = run(399)  # slen = (24//5, 24%5, 15>>2, 3) = (4,4,3,3)
    assert bits == 6 * 4 + 5 * 4 + 5 * 3 + 5 * 3
    # blocknumber 1 (400 <= sc < 500): partitions (6,5,7,3)
    g, bits = run(400 + (7 << 2) + 2)  # slen = (1, 2, 2, 0)
    assert bits == 6 * 1 + 5 * 2 + 7 * 2
    # blocknumber 2 (sc >= 500): partitions (11,10), preflag forced
    g, bits = run(500 + 4)  # slen = (1, 1, 0, 0)
    assert bits == 11 * 1 + 10 * 1 and g["preflag"] == 1
    # short blocks: 36 scalefactors (12 bands x 3 windows)
    g, bits = run(17, short=True)  # slen = (0,1,0,1): 9*0+9*1+9*0+9*1
    assert bits == 18


def test_lsf_mixed_block_long_band_count_is_6():
    """ISO 13818-3 / ffmpeg: LSF mixed blocks ALWAYS have exactly 6
    long bands; the nr partitions only group slen widths. For
    blocknumber 2 (sc >= 500) nr[0] = 15 is a partition SIZE — a
    decoder that assigns the first 15 values to long bands would pass
    the bit-accounting canary while producing silently wrong PCM, so
    the value LAYOUT must be pinned, not just the bit count."""
    from kinesis_vcr_spark.operators.mp3 import _BitReader
    from kinesis_vcr_spark.operators.mp3l3 import read_scalefacs_lsf

    def run(sc):
        g = {
            "scalefac_compress": sc,
            "window_switching": 1,
            "block_type": 2,
            "mixed_block": 1,
            "preflag": 0,
        }
        # all-ones bitstream: every nonzero-slen scalefactor reads as
        # the all-ones value for its width
        br = _BitReader(bytes([0xFF]) * 64)
        return read_scalefacs_lsf(br, g)

    # blocknumber 2 mixed: sc = 504 -> slen = (1, 1, 0, 0),
    # nr = (15, 18) -> 33 one-bit values, all equal to 1
    sfl, sfs, bits = run(504)
    assert bits == 33
    assert sfl[:6] == [1] * 6          # exactly 6 long bands filled
    assert sfl[6:] == [0] * 16         # NOT 15 — bands 6..14 stay 0
    for b in range(13):
        expect = 1 if 3 <= b <= 11 else 0   # 27 vals = bands 3..11
        assert sfs[b] == [expect] * 3, (b, sfs[b])
    # blocknumber 0 mixed: sc = 17 -> slen = (0, 1, 0, 1),
    # nr = (6, 9, 9, 9): long bands read slen 0 -> zeros; the 9+9+9
    # short values split slen (1, 0, 1) by partition
    sfl, sfs, bits = run(17)
    assert bits == 9 + 9
    assert sfl == [0] * 22
    flat = [sfs[3 + i // 3][i % 3] for i in range(27)]
    assert flat == [1] * 9 + [0] * 9 + [1] * 9
