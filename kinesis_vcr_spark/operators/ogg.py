"""Ogg container tier — RFC 3533 page walk (CRC-validated), codec
identification headers, and granule-exact duration; Ogg-FLAC decodes
FOR REAL by native-stream reconstruction.

Training audio corpora ship Ogg routinely (.ogg Vorbis, .opus
LibriVox/podcast rips), and the container itself carries everything a
crawl-stats surface needs without touching the codec's DSP:

- every page is CRC32-protected (poly 0x04C11DB7, init/xorout 0 —
  RFC 3533 §6), so the walk VALIDATES integrity rather than trusting
  lengths, the raise-instead-of-garbage discipline of the other
  in-repo codecs;
- the identification header (first packet of the stream) names the
  codec and its rate/channels: ``\\x01vorbis`` (Vorbis I §4.2.2),
  ``OpusHead`` (RFC 7845 §5.1), ``\\x7fFLAC`` (Ogg-FLAC mapping 1.0),
  ``Speex   ``, ``\\x80theora``;
- the LAST page's granule position is the total PCM sample count
  (Vorbis/FLAC: in sample-rate units; Opus: 48 kHz units minus the
  OpusHead pre-skip — RFC 7845 §4), giving EXACT duration from
  container arithmetic alone, the same honesty as the ADTS
  frame-chain walk in :mod:`~kinesis_vcr_spark.operators.aac`.

Vorbis/Opus payload decode (MDCT/CELT+SILK) stays the documented
soundfile/ffmpeg slot, surfaced with the parsed shape in the error —
the AAC/Layer-III pattern. Ogg-FLAC is the exception: the mapping's
packets ARE native FLAC metadata blocks and frames (mapping spec
§"Packets"), so :func:`decode_ogg` reconstructs the native stream
(fLaC marker + STREAMINFO + frames) and hands it to
:func:`~kinesis_vcr_spark.operators.flac.decode_flac`, inheriting the
STREAMINFO-MD5 self-check — a full, self-validating decode.

Chained Ogg (a new BOS after a completed stream) raises loudly:
per-chain durations silently summed would misreport VBR internet
radio rips, the one place chaining shows up.

Pure Python/stdlib + numpy; no reference counterpart; additive layer.
"""

from __future__ import annotations

import struct
from typing import Any

_CRC_TABLE: list[int] | None = None


def _crc_table() -> list[int]:
    global _CRC_TABLE  # noqa: PLW0603 — computed once, pure function of the poly
    if _CRC_TABLE is None:
        table = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) & 0xFFFFFFFF
            table.append(r)
        _CRC_TABLE = table
    return _CRC_TABLE


def ogg_page_crc(page: bytes) -> int:
    """RFC 3533 §6 CRC over the page with its CRC field zeroed."""
    table = _crc_table()
    crc = 0
    data = page[:22] + b"\x00\x00\x00\x00" + page[26:]
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ table[((crc >> 24) & 0xFF) ^ b]
    return crc


def is_ogg(payload: bytes) -> bool:
    return payload[:4] == b"OggS"


def ogg_pages(payload: bytes, verify_crc: bool | str = True):
    """Yield parsed pages ``(header_type, granule, serial, seq,
    segments, body)`` — structure-validated; truncated pages raise
    ValueError. ``verify_crc``: ``True``/``"all"`` checks every page
    (the decode-path default), ``"edges"`` checks only BOS/EOS pages
    — the pages metadata is READ from — ``False`` skips CRC entirely.
    The per-byte Python CRC is the walk's only O(bytes) work (header
    parsing skips bodies by length): measured single-core 8 MB/s
    strict vs ~2.3 GB/s edges on a 1000-page file."""
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"Ogg: bad capture pattern at offset {pos}")
        if pos + 27 > n:
            raise ValueError("Ogg: truncated page header")
        version = payload[pos + 4]
        if version != 0:
            raise ValueError(f"Ogg: unsupported stream structure version {version}")
        header_type = payload[pos + 5]
        granule, serial, seq, crc = struct.unpack_from("<qIII", payload, pos + 6)
        nsegs = payload[pos + 26]
        seg_end = pos + 27 + nsegs
        if seg_end > n:
            raise ValueError("Ogg: truncated segment table")
        lacing = payload[pos + 27 : seg_end]
        body_len = sum(lacing)
        page_end = seg_end + body_len
        if page_end > n:
            raise ValueError("Ogg: truncated page body")
        check = verify_crc in (True, "all") or (
            verify_crc == "edges" and header_type & 0x06
        )
        if check and ogg_page_crc(payload[pos:page_end]) != crc:
            raise ValueError(f"Ogg: page CRC mismatch at offset {pos}")
        yield header_type, granule, serial, seq, lacing, payload[seg_end:page_end]
        pos = page_end


def ogg_packets(payload: bytes):
    """Reassemble packets across pages: yield ``(serial, granule,
    packet)`` where granule is the granule position of the page the
    packet ENDS on (-1 if the page carries none). Handles 255-lacing
    continuation within and across pages (continued-packet flag
    checked)."""
    pending: dict[int, bytearray] = {}
    seen_eos: set[int] = set()
    seen_any: set[int] = set()
    for header_type, granule, serial, _seq, lacing, body in ogg_pages(payload):
        if header_type & 0x02:  # BOS
            if serial in seen_any:
                raise ValueError("Ogg: duplicate BOS for serial")
            if seen_eos:
                raise ValueError(
                    "Ogg: chained streams unsupported (new BOS after EOS)"
                )
            seen_any.add(serial)
        elif serial not in seen_any:
            raise ValueError("Ogg: page for unknown serial before its BOS")
        continued = bool(header_type & 0x01)
        buf = pending.get(serial)
        if continued and buf is None:
            raise ValueError("Ogg: continued-packet flag with nothing pending")
        if not continued and buf:
            raise ValueError("Ogg: pending packet dropped without continuation")
        off = 0
        for lace in lacing:
            if buf is None:
                buf = bytearray()
            buf += body[off : off + lace]
            off += lace
            if lace < 255:
                yield serial, granule, bytes(buf)
                buf = None
        pending[serial] = buf
        if header_type & 0x04:  # EOS
            if pending.get(serial):
                raise ValueError("Ogg: EOS with incomplete packet pending")
            seen_eos.add(serial)
    leftovers = [s for s, b in pending.items() if b]
    if leftovers:
        raise ValueError("Ogg: stream ends mid-packet")


def _identify(first_packet: bytes) -> dict[str, Any] | None:
    p = first_packet
    if p[:7] == b"\x01vorbis" and len(p) >= 30:
        version, channels, rate = struct.unpack_from("<IBI", p, 7)
        if version != 0:
            raise ValueError(f"Vorbis: unsupported version {version}")
        (nominal,) = struct.unpack_from("<i", p, 20)
        return {
            "codec": "vorbis",
            "channels": channels,
            "sample_rate": rate,
            "nominal_bitrate": nominal if nominal > 0 else None,
            "granule_rate": rate,
            "pre_skip": 0,
        }
    if p[:8] == b"OpusHead" and len(p) >= 19:
        version, channels = p[8], p[9]
        if version >> 4 != 0:  # RFC 7845 §5.1: major version must be 0
            raise ValueError(f"Opus: unsupported version {version}")
        (pre_skip,) = struct.unpack_from("<H", p, 10)
        (input_rate,) = struct.unpack_from("<I", p, 12)
        return {
            "codec": "opus",
            "channels": channels,
            # Opus always decodes at 48 kHz; input_sample_rate is
            # informational (RFC 7845 §5.1) — surfaced, not used
            "sample_rate": 48000,
            "input_sample_rate": input_rate,
            "granule_rate": 48000,
            "pre_skip": pre_skip,
        }
    if p[:5] == b"\x7fFLAC" and len(p) >= 13 and p[9:13] == b"fLaC":
        from kinesis_vcr_spark.operators.flac import (  # noqa: PLC0415
            parse_streaminfo,
        )

        # the mapping CLEARS the STREAMINFO last-metadata flag (later
        # header packets arrive as separate Ogg packets) — set it so
        # the single-block parse terminates at this buffer's end
        si = parse_streaminfo(p[9:13] + bytes([p[13] | 0x80]) + p[14:])
        return {
            "codec": "flac",
            "channels": si["channels"],
            "sample_rate": si["sample_rate"],
            "granule_rate": si["sample_rate"],
            "pre_skip": 0,
            "_streaminfo_block": p[13:],  # metadata block incl. header
        }
    if p[:8] == b"Speex   ":
        (rate,) = struct.unpack_from("<I", p, 36)
        (channels,) = struct.unpack_from("<I", p, 48)
        return {
            "codec": "speex",
            "channels": channels,
            "sample_rate": rate,
            "granule_rate": rate,
            "pre_skip": 0,
        }
    if p[:7] == b"\x80theora":
        return {"codec": "theora", "channels": 0, "sample_rate": 0,
                "granule_rate": 0, "pre_skip": 0}
    return None


def ogg_info(
    payload: bytes, verify_crc: bool | str = "edges"
) -> dict[str, Any]:
    """Identify the first known stream and compute exact duration from
    the last granule position: ``{codec, channels, sample_rate,
    duration_s, total_samples, n_pages, n_streams}`` (+ codec
    extras — ``pre_skip``/``input_sample_rate`` for Opus,
    ``nominal_bitrate`` for Vorbis).

    CRC default is ``"edges"``: the identification (BOS) and final
    (EOS) pages — the only pages whose BYTES this tier reads — stay
    CRC-protected, while bulk data pages are structure-walked only.
    The per-byte Python CRC is the walk's only O(bytes) cost
    (measured single-core: 8 MB/s strict vs ~2.3 GB/s edges), and a
    crawl metadata pass over multi-MB songs should not pay it for
    bodies it never parses. Pass ``verify_crc=True`` for strict
    archival validation."""
    if not is_ogg(payload):
        raise ValueError("not an Ogg stream (no OggS capture)")
    streams: dict[int, dict[str, Any]] = {}
    primary: int | None = None
    n_pages = 0
    last_granule: dict[int, int] = {}
    seen_eos: set[int] = set()
    for header_type, granule, serial, _seq, _lacing, body in ogg_pages(
        payload, verify_crc
    ):
        n_pages += 1
        if header_type & 0x02:
            # chained Ogg (a new BOS after a completed stream) must
            # raise here too, mirroring ogg_packets — walking on would
            # silently report only the first chain's duration and an
            # inflated n_streams (the VBR-radio misreport the module
            # docstring warns about)
            if seen_eos:
                raise ValueError(
                    "Ogg: chained streams unsupported (new BOS after EOS)"
                )
            if serial not in streams:
                info = _identify(bytes(body))
                streams[serial] = dict(
                    info or {"codec": "unknown"}, _open=True
                )
                if primary is None and info and info["codec"] != "theora":
                    primary = serial
        # a BOS page only carries the identification header, whose
        # granule is not a data position — EXCEPT when the page is also
        # EOS (a one-page stream), where its granule is the final one
        if granule >= 0 and (
            (header_type & 0x02) == 0 or header_type & 0x04
        ):
            last_granule[serial] = granule
        if header_type & 0x04:
            seen_eos.add(serial)
    if not streams:
        raise ValueError("Ogg: no BOS page found")
    if primary is None:
        kinds = sorted(s["codec"] for s in streams.values())
        raise ValueError(f"Ogg: no known audio stream (saw {kinds})")
    info = {k: v for k, v in streams[primary].items()
            if not k.startswith("_")}
    granule = last_granule.get(primary)
    total = None
    duration = None
    if granule is not None and info["granule_rate"]:
        total = max(0, granule - info["pre_skip"])
        duration = round(total / info["granule_rate"], 3)
    info.pop("granule_rate")
    info.update(
        total_samples=total,
        duration_s=duration,
        n_pages=n_pages,
        n_streams=len(streams),
    )
    return info


def decode_ogg(payload: bytes):
    """Full decode for Ogg-FLAC by native-stream reconstruction
    (marker + STREAMINFO-as-only-metadata-block + frame packets, then
    :func:`decode_flac` with its MD5 self-check); Vorbis/Opus/Speex
    raise NotImplementedError carrying the parsed shape."""
    info = ogg_info(payload)
    if info["codec"] != "flac":
        shape = (
            f"{info['codec']}, {info['sample_rate']} Hz, "
            f"{info['channels']} ch, ~{info['duration_s']}s"
        )
        raise NotImplementedError(
            f"Ogg {info['codec']} audio ({shape}) decode requires "
            "soundfile/ffmpeg; ogg_info covers the metadata tier"
        )
    from kinesis_vcr_spark.operators.flac import decode_flac  # noqa: PLC0415

    header_packets: int | None = None
    streaminfo: bytes | None = None
    frames: list[bytes] = []
    flac_serial: int | None = None
    n_header_seen = 0
    for serial, _granule, packet in ogg_packets(payload):
        if flac_serial is None and packet[:5] == b"\x7fFLAC":
            flac_serial = serial
            header_packets = struct.unpack_from(">H", packet, 7)[0]
            body = packet[13:]
            # force the last-metadata flag: the reconstruction keeps
            # STREAMINFO as the ONLY metadata block
            streaminfo = bytes([body[0] | 0x80]) + body[1:]
            continue
        if serial != flac_serial:
            continue
        # skip the trailing header packets (VORBIS_COMMENT etc.): by
        # declared count when known, else until the 14-bit frame sync
        # (the mapping allows count 0 = "unknown"; a metadata block's
        # first byte is its block type and can never read 0xFF)
        is_frame = (
            len(packet) >= 2
            and packet[0] == 0xFF
            and packet[1] & 0xFC == 0xF8
        )
        if (header_packets and n_header_seen < header_packets) or (
            not header_packets and not is_frame
        ):
            n_header_seen += 1
            continue
        frames.append(packet)
    if streaminfo is None:
        raise ValueError("Ogg-FLAC: identification packet not found")
    native = b"fLaC" + streaminfo + b"".join(frames)
    return decode_flac(native)


def build_ogg(stream_packets: list[tuple[bytes, int]], serial: int = 1) -> bytes:
    """Spec-rule Ogg writer (the round-trip oracle, the encode_flac
    pattern): one packet per page run, packets beyond the 255×255-byte
    page capacity spanning continuation pages with the continued flag
    and -1 intermediate granules; BOS on the first page, EOS on the
    last; CRC stamped per RFC 3533 §6. ``stream_packets`` is
    ``[(packet_bytes, granule_after_packet), ...]``."""
    pages: list[bytes] = []
    seq = 0
    n = len(stream_packets)
    for i, (packet, granule) in enumerate(stream_packets):
        lac = [255] * (len(packet) // 255) + [len(packet) % 255]
        groups = [lac[j : j + 255] for j in range(0, len(lac), 255)]
        off = 0
        for g_idx, group in enumerate(groups):
            body_len = sum(group)
            body = packet[off : off + body_len]
            off += body_len
            last_group = g_idx == len(groups) - 1
            header_type = 0
            if i == 0 and g_idx == 0:
                header_type |= 0x02  # BOS
            if i == n - 1 and last_group:
                header_type |= 0x04  # EOS
            if g_idx > 0:
                header_type |= 0x01  # continued packet
            gran = granule if last_group else -1
            page = (
                b"OggS"
                + bytes([0, header_type])
                + struct.pack("<qIII", gran, serial, seq, 0)
                + bytes([len(group)])
                + bytes(group)
                + body
            )
            crc = ogg_page_crc(page)
            pages.append(page[:22] + struct.pack("<I", crc) + page[26:])
            seq += 1
    return b"".join(pages)


__all__ = [
    "build_ogg",
    "decode_ogg",
    "is_ogg",
    "ogg_info",
    "ogg_packets",
    "ogg_page_crc",
    "ogg_pages",
]
