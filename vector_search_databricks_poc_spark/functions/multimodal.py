"""Multimodal column plumbing (SURVEY.md B13; north-star "multimodal columns").

A multimodal record is one row: text + dense vector + typed metadata +
opaque ``binary`` payloads (image/audio/video bytes).  The Spark-side
contract — schema, partition-friendly layout, Arrow batch shape through
``mapInPandas`` — is fully real, and so is decoding for every container
format the Python stdlib can parse:

- **WAV audio** (``wave`` module): real header parse + PCM sample math
  (rate, duration, RMS, zero-crossings, peak);
- **BMP image** (``struct`` header parse): real 24-bit pixel decode
  (dimensions, per-channel means, luminance spread);
- **PNG image**: real chunk walk + zlib inflate + all five per-row
  defilter types (``decode_png``);
- **JPEG image** (baseline sequential): real Huffman decode + dequantize
  + IDCT + YCbCr conversion, pure stdlib+numpy (``functions/jpeg.py``);
- **SVF video** (simple frame container): real index parse with
  skip-decode frame sampling.
- **AVI video** (``functions/avi.py``): real RIFF/idx1 container walk
  for any codec (dimensions, fps, frame count, duration), and real
  frame DECODE for uncompressed 24-bit DIB video — sampled frames are
  header-spliced into standalone BMPs, never transcoded.

- **MP3 audio / MP4 video metadata** (``functions/media_meta.py``):
  real MPEG frame-header walk and ISO BMFF box walk — duration, sample
  rate, bitrate, CBR/VBR, brand, track count — no codec needed.

Only the *sample decode* of MP3/MP4 and of compressed-codec AVI, which
genuinely needs external codec libraries, remains stubbed behind
``NotImplementedError`` / the deterministic byte-histogram fake,
clearly marked (``decode_media_stub``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# One row per asset: id + modality tag + opaque bytes + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),     # opaque encoded bytes
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def pack_multimodal(docs: DataFrame, vectors: DataFrame,
                    doc_id: str = "doc_id", vec_id: str = "vec_id") -> DataFrame:
    """Assemble the single-row multimodal record: struct(text meta) +
    embedding + synthesized binary payload column (deterministic bytes from
    the text, standing in for real media)."""
    return (
        docs.join(vectors, docs[doc_id] == vectors[vec_id])
        .select(
            docs[doc_id].alias("asset_id"),
            F.struct(
                docs["text"].alias("text"),
                docs["lang"].alias("lang"),
                docs["source"].alias("source"),
            ).alias("doc"),
            vectors["embedding"].alias("embedding"),
            F.encode(docs["text"], "UTF-8").cast("binary").alias("payload"),
            F.create_map(F.lit("codec"), F.lit("utf8-fake")).alias("meta"),
        )
    )


def decode_image(payload: bytes):
    """Dispatch to the real stdlib decoders by magic bytes: BMP, PNG, and
    baseline JPEG (functions/jpeg.py — pure stdlib+numpy Huffman/IDCT).
    The remaining stub is ``decode_media_stub`` (MP3/MP4/AVI)."""
    if payload is not None and len(payload) >= 2:
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            return decode_jpeg(payload)
    return decode_png(payload)


def decode_media_stub(payload: bytes):  # pragma: no cover - intentional stub
    """STUB for the one capability that genuinely needs external codecs:
    decoding MP3/MP4 *samples* and compressed-codec AVI *frames*.  Their
    METADATA parses for real (``functions.media_meta``: frame-header walk,
    ISO BMFF box walk; ``functions.avi``: RIFF/idx1 walk), uncompressed
    DIB AVI frames DECODE for real (``functions.avi.decode_avi_frame``),
    and images decode for real in every supported container — see
    ``decode_bmp`` / ``decode_png`` / ``functions.jpeg.decode_jpeg``.

    PERMANENT SCOPE (decided r8): MP3 Layer-III sample decode is a
    psychoacoustic codec (scalefactor-band Huffman tables, hybrid
    MDCT/polyphase synthesis) and MP4 samples are whatever codec the
    track declares (almost always AAC/H.264) — thousands of lines of
    codec work with no retrieval-engine semantics to test, in an
    environment that forbids installing ffmpeg-class libraries.  The
    engine's contract is the Spark-side plumbing (schema, partitioning,
    batch shape, bad-asset honesty), which is real and tested; sample
    decode stays behind this stub by design, not as debt."""
    raise NotImplementedError(
        "MP3/MP4 sample / compressed-AVI frame decode requires ffmpeg-class "
        "codecs — not installed; metadata probing is real "
        "(functions/media_meta.py, functions/avi.py) and uncompressed DIB "
        "AVI decodes for real (functions/avi.py)"
    )


# ---------------------------------------------------------------------------
# Real stdlib codecs: 24-bit BMP and 16-bit PCM WAV
# ---------------------------------------------------------------------------


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR order, 4-byte row padding)."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[:2]
    pad = (4 - (w * 3) % 4) % 4
    img_size = (w * 3 + pad) * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = [arr[y][:, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)]
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24-bit BMP into an (h, w, 3) uint8 RGB array.
    Real header parsing — raises ValueError on non-BMP / unsupported depth."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    stride = (w * 3 + 3) // 4 * 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        start = off + (h - 1 - y) * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=start)
        out[y] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


def encode_png(pixels, row_filters=None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG
    (stdlib zlib DEFLATE).  ``row_filters`` optionally picks the filter
    type (0-4) per row — the tests use it to exercise every defilter
    branch of ``decode_png``."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[:2]
    bpp = 3

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int16)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int16)
        f = row_filters[y % len(row_filters)] if row_filters else 0
        if f == 0:
            out = row
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), row[:-bpp]])
            out = (row - left) % 256
        elif f == 2:  # Up
            out = (row - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), row[:-bpp]])
            out = (row - (left + prev) // 2) % 256
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), row[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype=np.int16), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            out = (row - pred) % 256
        else:
            raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Decode an 8-bit truecolor (RGB) PNG into an (h, w, 3) uint8 array —
    real chunk walk, zlib inflate, and per-row defiltering for all five
    PNG filter types.  Raises ValueError on non-PNG / unsupported layout
    (palette, alpha, 16-bit, interlace)."""
    import struct
    import zlib

    import numpy as np

    if payload is None or len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype}, interlace={interlace})"
                )
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int16)
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f in (1, 3, 4):  # Sub / Average / Paeth need the left pixel
            cur = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                up = prev[i]
                upleft = prev[i - bpp] if i >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else upleft)
                cur[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, bpp)


def encode_wav(samples, rate: int = 8000) -> bytes:
    """Encode float samples in [-1, 1] as 16-bit PCM mono WAV (stdlib
    ``wave`` writer)."""
    import io
    import wave

    import numpy as np

    ints = np.clip(np.round(np.asarray(samples, dtype=np.float64) * 32767), -32768, 32767)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(ints.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """Decode a PCM WAV into (samples float64 in [-1, 1], rate) — real
    RIFF parse via the stdlib ``wave`` reader.  Mono or first channel."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        samples = samples[::nch]
    return samples, rate


def resize_nearest(pixels, out_h: int, out_w: int):
    """Nearest-neighbor resize of an (h, w, 3) uint8 array — pure numpy
    index mapping, the standard thumbnail/normalize step before a vision
    model.  Deterministic (floor sampling grid)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return px[rows][:, cols]


def resize_image(payload: bytes, out_h: int, out_w: int) -> bytes:
    """Decode (BMP/PNG/JPEG by magic), nearest-resize, re-encode as BMP."""
    import numpy as np

    px = decode_image(payload)
    if px.ndim == 2:  # grayscale JPEG -> replicate channels for the BMP
        px = np.stack([px, px, px], axis=-1)
    return encode_bmp(resize_nearest(px, out_h, out_w))


# Frame container for the video path: "SVF1" magic + uint32 frame count +
# per-frame uint32 length-prefixed encoded images.  A deliberately simple
# REAL container (deterministic synth + real parse) standing in for
# MP4/AVI, whose codecs need external libraries.
_SVF_MAGIC = b"SVF1"


def encode_svf(frames: list) -> bytes:
    """Pack encoded image payloads (BMP/PNG bytes) into one video blob."""
    import struct

    out = bytearray(_SVF_MAGIC)
    out += struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f))
        out += f
    return bytes(out)


def svf_frame_offsets(payload: bytes) -> list[tuple[int, int]]:
    """Parse the SVF header: [(offset, length)] per frame — O(frames),
    no frame bytes touched, so sampling can skip-decode."""
    import struct

    if payload is None or payload[:4] != _SVF_MAGIC:
        raise ValueError("not an SVF payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    offs, pos = [], 8
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, pos)
        offs.append((pos + 4, ln))
        pos += 4 + ln
    return offs


def sample_frames(payload: bytes, every_n: int = 2, max_frames: int | None = None) -> list[bytes]:
    """Every-nth-frame sampling: parse the index, slice ONLY the selected
    frames' bytes (skipped frames are never decoded or copied) — the shape
    a real keyframe sampler has over MP4 at scale.

    Dispatches by magic: RIFF/AVI containers go through the real idx1-index
    sampler (functions/avi.py — uncompressed DIB frames come back as
    standalone BMPs via a header splice, no transcode); anything else is
    treated as the SVF frame container."""
    if payload is not None and payload[:4] == b"RIFF":
        from .avi import sample_avi_frames

        return sample_avi_frames(payload, every_n, max_frames)
    offs = svf_frame_offsets(payload)[::every_n]
    if max_frames is not None:
        offs = offs[:max_frames]
    return [payload[o : o + ln] for o, ln in offs]


def _pixel_features(px) -> list[float]:
    """The image feature vector: [meanR, meanG, meanB, luma_std] over an
    (h, w, 3) float array — ONE definition shared by every decoded-pixel
    path (BMP/PNG/JPEG images and DIB AVI first frames)."""
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    return [
        round(float(px[..., 0].mean()), 6),
        round(float(px[..., 1].mean()), 6),
        round(float(px[..., 2].mean()), 6),
        round(float(luma.std()), 6),
    ]


def media_features(payload: bytes | None, modality: str, dim: int = 8):
    """Decode-and-featurize one asset.  Returns (n_bytes, width, height,
    sample_rate, duration_s, feature list[float]).

    - image/BMP, image/PNG, or image/JPEG (baseline, functions/jpeg.py):
      real pixel decode -> [meanR, meanG, meanB, luma_std];
    - audio/WAV: real sample decode -> [rms, zero_crossing_rate, peak, mean];
    - audio/MP3: real frame-header walk (functions/media_meta.py) ->
      sample_rate + exact duration; samples stay undecoded (codec stub),
      so the feature falls back to the byte histogram;
    - video/MP4 (ISO BMFF): real box walk -> duration from mvhd; frames
      stay undecoded, byte-histogram feature;
    - anything else (or undecodable bytes): byte-histogram fake, with
      width/height/rate/duration null.
    """
    import struct
    import zlib

    import numpy as np

    n = 0 if payload is None else len(payload)
    if payload is not None and modality == "image":
        try:
            px = decode_image(payload).astype(np.float64)
            if px.ndim == 2:  # grayscale JPEG -> replicate channels
                px = np.stack([px, px, px], axis=-1)
            return n, int(px.shape[1]), int(px.shape[0]), None, None, _pixel_features(px)
        except (ValueError, struct.error, zlib.error):
            pass  # truncated / non-BMP/PNG image bytes -> histogram fallback
    if payload is not None and modality == "audio":
        import wave

        try:
            s, rate = decode_wav(payload)
            zcr = float((np.diff(np.signbit(s)) != 0).mean()) if len(s) > 1 else 0.0
            feat = [
                float(np.sqrt((s * s).mean())) if len(s) else 0.0,
                zcr,
                float(np.abs(s).max()) if len(s) else 0.0,
                float(s.mean()) if len(s) else 0.0,
            ]
            # a header can legally declare framerate 0 — duration is then
            # undefined, not a crash
            dur = round(len(s) / rate, 6) if rate else None
            return n, None, None, int(rate), dur, [round(f, 6) for f in feat]
        except (ValueError, EOFError, wave.Error, struct.error):
            # non-WAV audio: probe MPEG frame headers for real metadata
            # (duration/rate) even though sample decode stays stubbed
            from .media_meta import mp3_metadata

            try:
                m = mp3_metadata(payload)
                return (
                    n, None, None, int(m["sample_rate"]),
                    float(m["duration_s"]), fake_feature(payload, dim),
                )
            except (ValueError, struct.error):
                pass  # histogram fallback below
    if payload is not None and modality == "video":
        from .media_meta import mp4_metadata

        if payload[:4] == b"RIFF":
            from .avi import avi_frame_offsets, avi_metadata, decode_avi_frame

            try:
                m = avi_metadata(payload)
                try:
                    # uncompressed DIB: REAL pixel features from the first
                    # frame — decode it directly from the already-parsed
                    # offsets (no second container walk, no BMP round-trip)
                    if m["compression"] not in (0, None) or m["bit_count"] != 24:
                        raise ValueError("compressed AVI codec")
                    o, ln = avi_frame_offsets(payload)[0]
                    px = decode_avi_frame(
                        payload[o : o + ln], m["width"], m["height"],
                        top_down=m["top_down"],
                    )
                    feat = _pixel_features(px.astype(np.float64))
                except (ValueError, struct.error, IndexError):
                    # compressed codec (MJPG/...) — metadata still real
                    feat = fake_feature(payload, dim)
                return (
                    n, m["width"], m["height"], None, m["duration_s"], feat,
                )
            except (ValueError, struct.error):
                pass  # corrupt RIFF -> histogram fallback below
        try:
            m = mp4_metadata(payload)
            dur = m["duration_s"]
            return (
                n, None, None, None,
                float(dur) if dur is not None else None,
                fake_feature(payload, dim),
            )
        except (ValueError, struct.error):
            pass  # SVF / unknown container -> histogram fallback below
    return n, None, None, None, None, fake_feature(payload, dim)


def fake_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: byte-histogram moments.
    Replace with a real decoder + model at deployment; signature and batch
    shape are identical.  Vectorized (frombuffer + bincount) — the
    fallback must not become the slow path on large payloads."""
    import numpy as np

    if payload is None:
        return [0.0] * dim
    b = np.frombuffer(payload, dtype=np.uint8)
    n = max(len(b), 1)
    idx = np.arange(len(b)) % dim
    acc = np.bincount(idx, weights=b, minlength=dim)
    return [round(float(a) / n, 6) for a in acc]


MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("width", LongType(), True),         # image only
        StructField("height", LongType(), True),        # image only
        StructField("sample_rate", LongType(), True),   # audio only
        StructField("duration_s", FloatType(), True),   # audio only
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synth_media_payload(asset_id: int, modality: str) -> bytes:
    """Deterministic synthetic media as REAL containers — a 24-bit BMP or a
    16-bit PCM WAV derived from the asset id — so the decode path runs end
    to end without media libraries.  ``video`` stays opaque bytes (no
    stdlib container)."""
    import numpy as np

    if modality == "image":
        rng = np.random.default_rng(asset_id)
        h, w = 8 + asset_id % 5, 8 + asset_id % 7
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        # rotate containers so all three real decoders run in the pipeline
        if asset_id % 6 < 2:
            return encode_bmp(px)
        if asset_id % 6 < 4:
            return encode_png(px)
        from .jpeg import encode_jpeg

        return encode_jpeg(px, quality=90)
    if modality == "audio":
        n = 400 + (asset_id % 5) * 100
        t = np.arange(n, dtype=np.float64)
        freq = 2.0 + (asset_id % 10)
        return encode_wav(0.5 * np.sin(2 * np.pi * freq * t / n), rate=8000)
    if modality == "video":
        # real SVF container of 4 small BMP frames (deterministic pixels)
        rng = np.random.default_rng(asset_id + 1_000_000)
        frames = [
            encode_bmp(rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8))
            for _ in range(4)
        ]
        return encode_svf(frames)
    return (f"blob-{asset_id}-").encode() * 16


TRANSFORM_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)


def transform_media(
    media: DataFrame,
    thumb_h: int = 16,
    thumb_w: int = 16,
    frame_every_n: int = 2,
    max_frames: int | None = None,
) -> DataFrame:
    """The preprocessing fan-out stage of a multimodal training pipeline,
    over ``mapInPandas``: images become (thumb_h x thumb_w) nearest-resized
    BMP thumbnails (one row each); SVF videos become one row PER SAMPLED
    FRAME (every_n-th, skipped frames never decoded).  Undecodable
    payloads are dropped, not fatal — mid-pipeline at scale bad assets
    must not kill the job."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        # truncated headers raise struct.error, corrupt DEFLATE streams
        # zlib.error — all are "bad asset", none may kill the job
        bad_asset = (ValueError, struct.error, zlib.error)
        for pdf in it:
            rows = []
            for aid, mod, p in zip(pdf["asset_id"], pdf["modality"], pdf["payload"]):
                if p is None:
                    continue
                p = bytes(p)
                if mod == "image":
                    try:
                        rows.append(
                            (aid, mod, 0, resize_image(p, thumb_h, thumb_w), thumb_w, thumb_h)
                        )
                    except bad_asset:
                        pass
                elif mod == "video":
                    try:
                        for i, fr in enumerate(sample_frames(p, frame_every_n, max_frames)):
                            rows.append((aid, mod, i, fr, None, None))
                    except bad_asset:
                        pass
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "modality", "frame_idx", "payload", "width", "height"],
            )

    return media.select("asset_id", "modality", "payload").mapInPandas(
        batches, schema=TRANSFORM_SCHEMA
    )


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Real decode + featurize over ``mapInPandas`` (Arrow batches in/out):
    BMP pixels and WAV samples are parsed inside the worker, one batch at a
    time; unknown codecs fall back to the byte-histogram feature.  Output
    is scalar-typed per modality (see MEDIA_FEATURE_SCHEMA)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                media_features(p, m, dim)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out = pd.DataFrame(
                rows,
                columns=["n_bytes", "width", "height", "sample_rate", "duration_s", "feature"],
            )
            out.insert(0, "modality", pdf["modality"].to_numpy())
            out.insert(0, "asset_id", pdf["asset_id"].to_numpy())
            yield out

    return media.select("asset_id", "modality", "payload").mapInPandas(
        batches, schema=MEDIA_FEATURE_SCHEMA
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``: iterator of
    pandas batches in, iterator out — per-batch vectorized, per-executor
    init possible (load the model once per worker here, as in
    functions.embedding)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"] if "modality" in pdf else "image",
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": pdf["payload"].map(lambda p: fake_feature(p, dim)),
                }
            )

    cols = [c for c in ("asset_id", "modality", "payload") if c in media.columns]
    src = media.select(*cols)
    if "modality" not in media.columns:
        src = src.withColumn("modality", F.lit("image"))
    return src.mapInPandas(batches, schema=FEATURE_SCHEMA)
