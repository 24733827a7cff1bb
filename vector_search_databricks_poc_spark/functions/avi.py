"""Pure-stdlib AVI (RIFF) container codec: real metadata for ANY codec,
real frame decode for uncompressed 24-bit DIB video.

Narrows the media stub another notch (after round-4's baseline JPEG and
MP3/MP4 metadata): the container walk — header lists, ``movi`` chunks,
``idx1`` index — is real for every AVI, and for the uncompressed ``DIB ``
codec (BI_RGB 24-bit, the format every capture tool can emit) the frames
decode to pixels with zero external dependencies.  Compressed codecs
(MJPG/XVID/...) still raise ValueError at frame-decode time and keep the
honest ``decode_media_stub`` contract.

Scale notes (the part that matters at 100 TB):
- ``avi_frame_offsets`` reads the ``idx1`` index when present — O(index)
  without touching frame bytes — so every-nth-frame sampling never
  decodes, copies, or even slices skipped frames (same contract as the
  SVF sampler in functions/multimodal.py).
- A sampled DIB frame is re-framed as a standalone BMP by PREPENDING a
  54-byte header — the pixel section of a 24-bit BMP and an AVI ``00db``
  chunk are byte-identical (bottom-up rows, BGR, 4-byte padding), so
  "sample a frame" is a header splice, not a transcode.

Error contract (CLAUDE.md): bad input raises ONLY ValueError or
struct.error — the mapInPandas callers treat exactly those as "bad asset".
"""

from __future__ import annotations

import struct

_AVI_HEADER_BYTES = 14 + 40  # BMP file header + BITMAPINFOHEADER


def _u32(payload: bytes, pos: int) -> int:
    if pos + 4 > len(payload):
        raise ValueError("truncated AVI chunk header")
    return struct.unpack_from("<I", payload, pos)[0]


def _walk_chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) for each RIFF chunk in
    [start, end); chunk bodies are padded to even length per RIFF."""
    pos = start
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        ln = _u32(payload, pos + 4)
        body = pos + 8
        if body + ln > end:
            raise ValueError("AVI chunk overruns its parent")
        yield fourcc, body, ln
        pos = body + ln + (ln & 1)


def avi_metadata(payload: bytes) -> dict:
    """Parse an AVI's header lists into real metadata — works for ANY
    video codec because only headers are read.

    Returns width, height, n_frames, fps, duration_s, codec (strh
    fccHandler), bit_count, compression (strf biCompression; 0 = BI_RGB).
    """
    if payload is None or len(payload) < 12:
        raise ValueError("not an AVI payload")
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    riff_len = _u32(payload, 4)
    end = min(len(payload), 8 + riff_len)

    meta = {
        "width": None, "height": None, "n_frames": None, "fps": None,
        "duration_s": None, "codec": None, "bit_count": None,
        "compression": None, "top_down": False,
    }
    usec_per_frame = None

    def parse_strl(s: int, e: int) -> None:
        # one strl = one stream; only the VIDEO stream's strf may set the
        # bitmap fields (an audio strf is >= 40 bytes too — parsing it as
        # BITMAPINFOHEADER would clobber width/height/compression)
        is_vids = False
        for cc, b, ln in _walk_chunks(payload, s, e):
            if cc == b"strh" and ln >= 40:
                is_vids = payload[b : b + 4] == b"vids"
                if not is_vids:
                    continue
                meta["codec"] = payload[b + 4 : b + 8].decode("latin-1").strip()
                scale, rate = struct.unpack_from("<II", payload, b + 20)
                length = _u32(payload, b + 32)
                if scale:
                    meta["fps"] = round(rate / scale, 6)
                if meta["n_frames"] is None:
                    meta["n_frames"] = length
            elif cc == b"strf" and ln >= 40 and is_vids:
                _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, b)
                meta["width"], meta["height"] = w, abs(h)
                # BI_RGB permits negative biHeight = top-down row order
                meta["top_down"] = h < 0
                meta["bit_count"], meta["compression"] = bpp, comp

    def parse_hdrl(s: int, e: int) -> None:
        nonlocal usec_per_frame
        for cc, b, ln in _walk_chunks(payload, s, e):
            if cc == b"avih" and ln >= 40:
                usec_per_frame = _u32(payload, b)
                meta["n_frames"] = _u32(payload, b + 16)
                meta["width"] = _u32(payload, b + 32)
                meta["height"] = _u32(payload, b + 36)
            elif cc == b"LIST" and payload[b : b + 4] == b"strl":
                parse_strl(b + 4, b + ln)

    for cc, b, ln in _walk_chunks(payload, 12, end):
        if cc == b"LIST" and payload[b : b + 4] == b"hdrl":
            parse_hdrl(b + 4, b + ln)

    if meta["width"] is None:
        raise ValueError("AVI has no parseable header list")
    if meta["fps"] is None and usec_per_frame:
        meta["fps"] = round(1e6 / usec_per_frame, 6)
    if meta["fps"] and meta["n_frames"] is not None:
        meta["duration_s"] = round(meta["n_frames"] / meta["fps"], 6)
    return meta


def avi_frame_offsets(payload: bytes) -> list[tuple[int, int]]:
    """[(absolute_offset, length)] per video frame chunk (``??db``/``??dc``).

    Prefers the ``idx1`` index (O(index), frame bytes untouched); falls
    back to walking the ``movi`` list when the index is absent or lists
    no video chunks (empty / audio-only idx1).  Offsets
    in idx1 are accepted in both common conventions — relative to the
    ``movi`` fourcc (spec) or absolute file offsets (several writers).
    """
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not an AVI payload")
    if payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    end = min(len(payload), 8 + _u32(payload, 4))

    movi_fourcc_pos = None
    idx = None
    movi_span = None
    for cc, b, ln in _walk_chunks(payload, 12, end):
        if cc == b"LIST" and payload[b : b + 4] == b"movi":
            movi_fourcc_pos = b  # offset of the 'movi' fourcc itself
            movi_span = (b + 4, b + ln)
        elif cc == b"idx1":
            idx = (b, ln)

    if movi_fourcc_pos is None:
        raise ValueError("AVI has no movi list")

    def is_frame(cc: bytes) -> bool:
        return len(cc) == 4 and cc[2:4] in (b"db", b"dc")

    offs: list[tuple[int, int]] = []
    if idx is not None:
        b, ln = idx
        for pos in range(b, b + ln - 15, 16):
            cc, _flags, off, size = struct.unpack_from("<4sIII", payload, pos)
            if not is_frame(cc):
                continue
            # spec: off points at the chunk fourcc, relative to 'movi'
            cand = movi_fourcc_pos + off
            if payload[cand : cand + 4] != cc:
                cand = off  # absolute-offset writer
                if payload[cand : cand + 4] != cc:
                    raise ValueError("idx1 entry matches no movi chunk")
            offs.append((cand + 8, size))
        if offs:
            return offs
        # idx1 exists but indexes no video chunks (empty or audio-only
        # index — both produced by real writers): fall through to the
        # movi walk rather than reporting a frameless video.

    s, e = movi_span
    for cc, b, ln in _walk_chunks(payload, s, e):
        if is_frame(cc):
            offs.append((b, ln))
    return offs


def frame_to_bmp(
    frame: bytes, width: int, height: int, top_down: bool = False
) -> bytes:
    """Wrap one uncompressed DIB frame as a standalone 24-bit BMP by
    prepending the 54-byte header — for the usual bottom-up layout the
    pixel bytes are NOT touched (an AVI ``00db`` body already has BMP's
    exact row layout); a top-down frame (negative biHeight) gets its row
    ORDER reversed at the byte level (row slices, still no pixel
    decode)."""
    stride = (width * 3 + 3) // 4 * 4
    if len(frame) < stride * height:
        raise ValueError("DIB frame shorter than width*height demands")
    if top_down:
        frame = b"".join(
            frame[y * stride : (y + 1) * stride]
            for y in range(height - 1, -1, -1)
        )
    off = _AVI_HEADER_BYTES
    header = struct.pack("<2sIHHI", b"BM", off + len(frame), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(frame), 2835, 2835, 0, 0
    )
    return header + info + frame


def decode_avi_frame(
    frame: bytes, width: int, height: int, top_down: bool = False
):
    """Decode one uncompressed DIB frame (BGR, padded rows; bottom-up
    unless ``top_down``) into an (h, w, 3) uint8 RGB array."""
    import numpy as np

    stride = (width * 3 + 3) // 4 * 4
    if len(frame) < stride * height:
        raise ValueError("DIB frame shorter than width*height demands")
    rows = np.frombuffer(frame, dtype=np.uint8, count=stride * height)
    rows = rows.reshape(height, stride)
    if not top_down:
        rows = rows[::-1]
    rows = rows[:, : width * 3]
    return rows.reshape(height, width, 3)[:, :, ::-1].copy()


def sample_avi_frames(
    payload: bytes, every_n: int = 2, max_frames: int | None = None
) -> list[bytes]:
    """Every-nth-frame sampling returning standalone BMP payloads.

    Requires the uncompressed DIB codec (compressed AVIs raise ValueError
    — their frames need external codecs, see decode_media_stub).  Skipped
    frames are never decoded or copied; sampled frames are header-spliced,
    not transcoded.
    """
    meta = avi_metadata(payload)
    if meta["compression"] not in (0, None) or (
        meta["bit_count"] not in (24, None)
    ):
        raise ValueError(
            f"AVI codec {meta['codec']!r} (compression={meta['compression']}) "
            "needs external codecs; only uncompressed 24-bit DIB decodes here"
        )
    offs = avi_frame_offsets(payload)[::every_n]
    if max_frames is not None:
        offs = offs[:max_frames]
    return [
        frame_to_bmp(
            payload[o : o + ln], meta["width"], meta["height"],
            top_down=meta["top_down"],
        )
        for o, ln in offs
    ]


def encode_avi(frames: list, fps: float = 10.0) -> bytes:
    """Encode (h, w, 3) uint8 RGB arrays as an uncompressed 24-bit DIB AVI
    (RIFF: hdrl avih + vids strl, movi ``00db`` chunks, idx1 index) — the
    deterministic synth side that makes the parser/decoder testable without
    binary fixtures, mirroring make_mp3/make_mp4 in media_meta.py."""
    import numpy as np

    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    arr0 = np.asarray(frames[0], dtype=np.uint8)
    h, w = arr0.shape[:2]
    pad = (4 - (w * 3) % 4) % 4
    frame_size = (w * 3 + pad) * h

    bodies = []
    for f in frames:
        a = np.asarray(f, dtype=np.uint8)
        if a.shape[:2] != (h, w):
            raise ValueError("all AVI frames must share one size")
        rows = [a[y][:, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)]
        bodies.append(b"".join(rows))

    scale, rate = 1000, int(round(fps * 1000))
    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(1e6 / fps), frame_size * int(fps), 0, 0x10,  # HASINDEX
        len(frames), 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"DIB ", 0, 0, 0, 0, scale, rate, 0,
        len(frames), frame_size, 0, 0, 0, 0, w if w < 32768 else 0, h if h < 32768 else 0,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    index = bytearray()
    for body in bodies:
        off = len(movi_body)  # chunk fourcc position relative to 'movi' fourcc
        movi_body += chunk(b"00db", body)
        index += struct.pack("<4sIII", b"00db", 0x10, off, len(body))
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(b"idx1", bytes(index))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
