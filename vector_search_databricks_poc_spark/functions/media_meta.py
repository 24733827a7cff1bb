"""Pure-stdlib MP3 / MP4 metadata probing (SURVEY.md B13).

Full MP3/MP4 *sample decode* genuinely needs external codec libraries and
stays stubbed (``multimodal.decode_media_stub``).  But the metadata a
100 TB media pipeline actually filters on — duration, sample rate,
bitrate, channel layout, track count, container brand — lives in frame
headers and container boxes whose layouts are public standards
(ISO/IEC 11172-3 / 13818-3 frame headers for MPEG audio; ISO/IEC
14496-12 ISO BMFF boxes for MP4).  Parsing those is real work this
module does with ``struct`` alone:

- :func:`mp3_metadata` — skips an ID3v2 tag, walks MPEG audio frame
  headers (sync, version, layer, bitrate/samplerate indices, padding),
  sums per-frame durations, classifies CBR vs VBR;
- :func:`mp4_metadata` — walks ISO BMFF boxes (32- and 64-bit sizes),
  reads ``ftyp`` major brand and ``mvhd`` timescale/duration (v0 + v1),
  counts ``trak`` boxes.

Both have encoder twins (:func:`make_mp3`, :func:`make_mp4`) producing
standard-conformant streams with silent/empty payloads, so the parse
path is golden-testable end-to-end without media libraries — the same
pattern the BMP/PNG/WAV/JPEG codecs in ``functions.multimodal`` use.

At scale these run inside ``mapInPandas`` batches (see
``multimodal.media_features``): a metadata probe touches only the first
few KB of each payload, so filtering a corpus by duration/bitrate never
decodes a single audio sample or video frame.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# MPEG audio (MP3) frame headers — ISO/IEC 11172-3 §2.4.1.3, 13818-3
# ---------------------------------------------------------------------------

# bitrate tables in kbps, indexed [version-group][layer][bitrate_index];
# index 0 = "free format" (unsupported here), 15 = invalid
_BITRATE_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATE_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_SAMPLE_RATE = {  # [version][sr_index]
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}

# samples per frame, [version-group][layer]
_SPF_V1 = {1: 384, 2: 1152, 3: 1152}
_SPF_V2 = {1: 384, 2: 1152, 3: 576}


def _id3v2_size(payload: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none) — 10-byte header
    with a 28-bit sync-safe length, per the public id3v2 spec."""
    if len(payload) < 10 or payload[:3] != b"ID3":
        return 0
    b = payload[6:10]
    if any(x & 0x80 for x in b):
        return 0  # not sync-safe -> not a valid tag; treat as audio data
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    footer = 10 if (payload[5] & 0x10) else 0
    return 10 + size + footer


def _parse_frame_header(payload: bytes, pos: int):
    """Parse one 4-byte MPEG audio frame header at ``pos``.  Returns
    (frame_len, version, layer, bitrate_kbps, sample_rate, channels,
    samples_per_frame) or None if the bytes are not a valid header."""
    if pos + 4 > len(payload):
        return None
    b0, b1, b2, b3 = payload[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 0x3
    layer_bits = (b1 >> 1) & 0x3
    if ver_bits == 1 or layer_bits == 0:
        return None  # reserved
    version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
    layer = {3: 1, 2: 2, 1: 3}[layer_bits]
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 0x1
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    table = _BITRATE_V1 if version == "1" else _BITRATE_V2
    bitrate = table[layer][br_idx] * 1000
    rate = _SAMPLE_RATE[version][sr_idx]
    spf = (_SPF_V1 if version == "1" else _SPF_V2)[layer]
    if layer == 1:
        frame_len = (12 * bitrate // rate + padding) * 4
    else:
        # layers II/III: floor(spf/8 * bitrate / rate) + padding
        frame_len = spf // 8 * bitrate // rate + padding
    channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
    return frame_len, version, layer, bitrate, rate, channels, spf


def mp3_metadata(payload: bytes) -> dict:
    """Walk every MPEG audio frame in ``payload`` (after an optional ID3v2
    tag) and return the stream's metadata::

        {"n_frames", "duration_s", "sample_rate", "channels", "layer",
         "version", "bitrate_kbps", "mode"}   # mode: "cbr" | "vbr"

    ``duration_s`` is the sum of per-frame durations (spf / rate), exact
    for both CBR and VBR streams — no Xing/VBRI header needed.  Raises
    ValueError when no valid frame exists (not an MPEG audio stream).
    Trailing garbage (e.g. an ID3v1 tag) ends the walk, it does not
    raise: at scale a probe must classify, not crash.
    """
    if payload is None:
        raise ValueError("not an MPEG audio stream")
    pos = _id3v2_size(payload)
    n = 0
    duration = 0.0
    bitrates = set()
    first = None
    while True:
        h = _parse_frame_header(payload, pos)
        if h is None or pos + h[0] > len(payload):
            break
        frame_len, version, layer, bitrate, rate, channels, spf = h
        if first is None:
            first = (version, layer, rate, channels)
        elif (version, layer, rate, channels) != first:
            break  # header desync — stop at the last consistent frame
        n += 1
        duration += spf / rate
        bitrates.add(bitrate)
        pos += frame_len
    if n == 0 or first is None:
        raise ValueError("not an MPEG audio stream")
    version, layer, rate, channels = first
    return {
        "n_frames": n,
        "duration_s": round(duration, 6),
        "sample_rate": rate,
        "channels": channels,
        "layer": layer,
        "version": version,
        "bitrate_kbps": max(bitrates) // 1000,
        "mode": "cbr" if len(bitrates) == 1 else "vbr",
    }


def make_mp3(
    n_frames: int = 10,
    bitrate_kbps: int = 128,
    rate: int = 44100,
    channels: int = 2,
    id3_tag: bytes | None = None,
    vbr_alternate_kbps: int | None = None,
) -> bytes:
    """Build a standard-conformant MPEG-1 Layer III stream of silent
    frames (valid headers + zero payload) — the golden-test twin of
    :func:`mp3_metadata`.  ``vbr_alternate_kbps`` alternates frame
    bitrates to synthesize a VBR stream."""
    sr_idx = _SAMPLE_RATE["1"].index(rate)
    out = bytearray()
    if id3_tag is not None:
        body = id3_tag
        size = len(body)
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3" + bytes([4, 0, 0]) + ss + body
    for i in range(n_frames):
        kbps = bitrate_kbps
        if vbr_alternate_kbps is not None and i % 2:
            kbps = vbr_alternate_kbps
        br_idx = _BITRATE_V1[3].index(kbps)
        padding = 0
        hdr = bytes(
            [
                0xFF,
                0xFB,  # sync + MPEG1 + Layer III + no CRC
                (br_idx << 4) | (sr_idx << 2) | (padding << 1),
                (0x3 if channels == 1 else 0x0) << 6,
            ]
        )
        frame_len = 1152 // 8 * (kbps * 1000) // rate + padding
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 / ISO base media file format — ISO/IEC 14496-12 box structure
# ---------------------------------------------------------------------------


def _walk_boxes(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for each top-level box in
    payload[start:end], honoring 64-bit largesize and size==0 (to EOF)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return  # malformed/truncated box: stop, don't crash
        yield typ, body, pos + size
        pos += size


def mp4_metadata(payload: bytes) -> dict:
    """Probe an ISO BMFF (MP4/MOV/…) container::

        {"brand", "timescale", "duration_s", "n_tracks", "boxes"}

    Walks top-level boxes for ``ftyp`` (major brand) and ``moov``, then
    ``moov``'s children for ``mvhd`` (version 0 and 1 layouts) and
    ``trak`` count.  Raises ValueError when the payload has no ftyp/moov
    signature.  Only headers are touched — ``mdat`` (the media payload,
    ~all of a real file's bytes) is never read, which is what makes this
    probe viable over 100 TB of video.
    """
    if payload is None or len(payload) < 8:
        raise ValueError("not an ISO BMFF container")
    brand = None
    timescale = None
    duration = None
    n_tracks = 0
    top = []
    for typ, body, box_end in _walk_boxes(payload, 0, len(payload)):
        top.append(typ.decode("latin-1"))
        if typ == b"ftyp" and box_end - body >= 4:
            brand = payload[body : body + 4].decode("latin-1").strip()
        elif typ == b"moov":
            for ctyp, cbody, cend in _walk_boxes(payload, body, box_end):
                if ctyp == b"mvhd":
                    if cend <= cbody:  # empty-body box: nothing to read
                        continue
                    version = payload[cbody]
                    if version == 1 and cend - cbody >= 28 + 4:
                        timescale, duration = struct.unpack_from(
                            ">IQ", payload, cbody + 20
                        )
                    elif version == 0 and cend - cbody >= 20:
                        timescale, duration = struct.unpack_from(
                            ">II", payload, cbody + 12
                        )
                elif ctyp == b"trak":
                    n_tracks += 1
    if brand is None and timescale is None:
        raise ValueError("not an ISO BMFF container")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_s": round(duration / timescale, 6) if timescale else None,
        "n_tracks": n_tracks,
        "boxes": top,
    }


def _box(typ: bytes, body: bytes, force_large: bool = False) -> bytes:
    if force_large:
        return struct.pack(">I", 1) + typ + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + typ + body


def make_mp4(
    duration_s: float = 4.5,
    timescale: int = 1000,
    n_tracks: int = 2,
    brand: bytes = b"isom",
    mvhd_version: int = 0,
    large_mdat: bool = False,
) -> bytes:
    """Build a minimal standard-conformant ISO BMFF container (ftyp +
    moov[mvhd + trak…] + mdat) — the golden-test twin of
    :func:`mp4_metadata`.  ``large_mdat`` exercises the 64-bit box-size
    path."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    dur = int(round(duration_s * timescale))
    if mvhd_version == 1:
        mvhd_body = bytes([1, 0, 0, 0]) + struct.pack(">QQIQ", 0, 0, timescale, dur)
    else:
        mvhd_body = bytes([0, 0, 0, 0]) + struct.pack(">IIII", 0, 0, timescale, dur)
    # pad to the spec'd fixed tail (rate/volume/matrix/next_track_id)
    mvhd_body += b"\x00" * 80
    traks = b"".join(
        _box(b"trak", _box(b"tkhd", b"\x00" * 84)) for _ in range(n_tracks)
    )
    moov = _box(b"moov", _box(b"mvhd", mvhd_body) + traks)
    mdat = _box(b"mdat", b"\x00" * 32, force_large=large_mdat)
    return ftyp + moov + mdat
