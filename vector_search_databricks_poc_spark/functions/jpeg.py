"""Pure-stdlib baseline JPEG codec (SURVEY.md B13 closure).

The reference treats media columns as opaque payloads decoded by managed
runtimes; this engine decodes every container the environment allows.
JPEG needed only entropy coding + DCT math, both expressible with the
stdlib + numpy — so baseline sequential JPEG (SOF0, Huffman, 8-bit,
4:4:4 or grayscale) decodes for REAL here, and the multimodal stub
narrows to MP3/MP4.

Scope (documented, enforced with ValueError):
- baseline DCT (SOF0) only — no progressive (SOF2), no arithmetic coding;
- 1 or 3 components, sampling factors 1x1 (4:4:4) only;
- restart markers (DRI/RSTn) are handled.

The encoder exists so the decoder is testable end-to-end without
external fixtures: spec quantization tables (Annex K) scaled by a
quality factor, spec Huffman tables, no subsampling.  Roundtrip error is
then bounded by quantization loss, which the golden tests assert.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Spec tables (JPEG Annex K) — public constants of ITU T.81
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# (bits-per-length counts, symbol values) — Annex K.3
DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II matrix: X = M @ x @ M.T, inverse = M.T @ X @ M."""
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    # orthonormal: row 0 scaled by sqrt(1/8), others sqrt(2/8)
    m = m * np.where(k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    return m


_DCT_M = _dct_matrix()


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a quant table (1..100)."""
    q = min(max(int(quality), 1), 100)
    s = 5000 // q if q < 50 else 200 - 2 * q
    t = np.floor((table * s + 50) / 100)
    return np.clip(t, 1, 255)


def _build_huffman_encode(bits, vals):
    """symbol -> (code, length) per the canonical code assignment."""
    out, code = {}, 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _build_huffman_decode(bits, vals):
    """(length, code) -> symbol map for the decoder."""
    out, code = {}, 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(length, code)] = vals[idx]
            code += 1
            idx += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (category, offset bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.buf.append(b)
                if b == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        while self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed byte
                    return 0xFF
                # a marker inside entropy data (RSTn handled by caller)
                self.pos -= 1
                raise _MarkerReached()
            return b
        raise ValueError("truncated JPEG entropy stream")

    def read_bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.n = 0


class _MarkerReached(Exception):
    pass


def _receive_extend(reader: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = reader.read_bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode_jpeg(pixels, quality: int = 90, restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB or (h, w) grayscale array as baseline
    sequential JPEG (4:4:4, spec Huffman tables).  ``restart_interval`` > 0
    emits a DRI segment and an RSTn marker every that-many MCUs (with DC
    predictor resets) — the resync mechanism real encoders use so a bit
    error only corrupts one restart segment; here it exists to exercise
    the decoder's marker path end to end."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comps = [arr.astype(np.float64) - 128.0]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y - 128.0, cb - 128.0, cr - 128.0]

    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    qtabs = [ql] + ([qc, qc] if not gray else [])

    dc_enc = [
        _build_huffman_encode(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_huffman_encode(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_enc = [
        _build_huffman_encode(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_huffman_encode(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    bw = _BitWriter()
    pred = [0] * len(comps)
    mcu_h, mcu_w = (h + 7) // 8, (w + 7) // 8
    mcu_count = 0
    rst_idx = 0
    for by in range(mcu_h):
        for bx in range(mcu_w):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()  # byte-align before the marker
                bw.buf += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, comp in enumerate(comps):
                block = np.zeros((8, 8))
                ys, xs = by * 8, bx * 8
                tile = comp[ys:ys + 8, xs:xs + 8]
                block[: tile.shape[0], : tile.shape[1]] = tile
                # replicate edge pixels into the pad (standard practice)
                if tile.shape[0] < 8:
                    block[tile.shape[0]:, :] = block[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    block[:, tile.shape[1]:] = block[:, tile.shape[1] - 1][:, None]
                coef = _DCT_M @ block @ _DCT_M.T
                q = np.rint(coef / qtabs[ci]).astype(np.int32)
                zz = q.flatten()[ZIGZAG]
                t = 0 if ci == 0 else 1
                # DC
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size, bits_v = _magnitude(diff)
                code, ln = dc_enc[t][size]
                bw.write(code, ln)
                if size:
                    bw.write(bits_v, size)
                # AC with run-length + ZRL/EOB
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc[t][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    size, bits_v = _magnitude(v)
                    code, ln = ac_enc[t][(run << 4) | size]
                    bw.write(code, ln)
                    bw.write(bits_v, size)
                    run = 0
                if run:
                    code, ln = ac_enc[t][0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, qt in enumerate(qtabs[: 2 if not gray else 1]):
        zz = qt.flatten()[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([i]) + zz.tobytes())
    nf = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci in range(nf):
        tq = 0 if ci == 0 else 1
        sof += bytes([ci + 1, 0x11, tq])  # 1x1 sampling
    out += seg(0xC0, sof)
    tables = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not gray:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, bits, vals in tables:
        out += seg(0xC4, bytes([tc]) + bytes(bits[1:]) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nf])
    for ci in range(nf):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline sequential JPEG into (h, w, 3) uint8 RGB (or (h, w)
    for grayscale).  Raises ValueError on progressive/subsampled/corrupt
    input — the honest boundary of the stdlib codec.

    The ValueError contract is load-bearing: media_features /
    transform_media treat exactly (ValueError, struct.error, zlib.error)
    as "bad asset, fall back / drop" — any other exception type escaping
    from here would kill the surrounding mapInPandas task on one corrupt
    payload.  Truncated segments, lying DHT lengths, and dangling table
    ids surface internally as IndexError/KeyError/StopIteration, so the
    walk below runs under a translator that rewraps them as ValueError."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, KeyError, StopIteration, struct.error) as ex:
        raise ValueError(f"corrupt JPEG stream: {ex!r}") from ex


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    data = payload

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        ln = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64)
                t[ZIGZAG] = np.frombuffer(body[p : p + 64], dtype=np.uint8)
                qtabs[tq] = t.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = [0] + list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_huffman_decode(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append({"id": cid, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tdta >> 4, "ta": tdta & 0x0F})
            return _decode_scan(
                data, pos + ln, frame, scan, qtabs, huff, restart_interval
            )
        pos += ln
    raise ValueError("no scan data found")


def _decode_scan(data, start, frame, scan, qtabs, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    mcu_h, mcu_w = (h + 7) // 8, (w + 7) // 8
    reader = _BitReader(data[start:])
    planes = [np.zeros((mcu_h * 8, mcu_w * 8)) for _ in scan]
    pred = [0] * len(scan)

    def read_symbol(table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | reader.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    mcu_count = 0
    for by in range(mcu_h):
        for bx in range(mcu_w):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                # scan to the RSTn marker: everything before it is byte
                # padding (possibly a stuffed FF 00 from all-ones fill)
                dpos = reader.pos
                while dpos + 1 < len(reader.data):
                    if reader.data[dpos] == 0xFF and 0xD0 <= reader.data[dpos + 1] <= 0xD7:
                        dpos += 2
                        break
                    dpos += 1
                reader.pos = dpos
                pred = [0] * len(scan)
            for ci, comp in enumerate(scan):
                try:
                    zz = np.zeros(64, dtype=np.int32)
                    sym = read_symbol(huff[(0, comp["td"])])
                    diff = _receive_extend(reader, sym)
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = read_symbol(huff[(1, comp["ta"])])
                        run, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if run == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC run overflow")
                        zz[k] = _receive_extend(reader, size)
                        k += 1
                except _MarkerReached:
                    raise ValueError("truncated JPEG scan") from None
                q = np.zeros(64)
                q[ZIGZAG] = zz
                coef = q.reshape(8, 8) * qtabs[comp["tq"]]
                block = _DCT_M.T @ coef @ _DCT_M
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            mcu_count += 1

    planes = [p[:h, :w] + 128.0 for p in planes]
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
