"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed through mapInPandas.

Decode support (pure stdlib+numpy — no image/audio libs in this
container):
- **PPM (P6) images**: full header+raster parser (comments, arbitrary
  maxval ≤ 65535) → grayscale signal → bucket-mean features.
- **PNG images**: chunk walker + zlib inflate + all five scanline
  un-filters (gray 1/2/4/8/16-bit, RGB/gray-alpha/RGBA 8/16-bit,
  palette 1/2/4/8-bit with PLTE + optional tRNS alpha; both interlace
  methods incl. Adam7) → grayscale signal → bucket-mean features.
- **baseline JPEG images**: pure-numpy huffman + dequant + IDCT in
  ``operators/jpeg.py`` (4:2:0/4:4:4; progressive declared out).
- **BMP images**: uncompressed BI_RGB at 8 (palette)/24/32-bit,
  bottom-up and top-down rasters.
- **GIF images**: first frame, GIF-LZW + global/local color tables,
  interlacing, GCE transparency (``operators/gif.py``).
- **TIFF images**: baseline uncompressed, first IFD, II/MM byte
  orders, gray (both polarities)/RGB(A)/palette, multi-strip.
- **WAV (RIFF) audio**: chunk walker (fmt/data; 8/16/24/32-bit integer
  PCM, 32/64-bit IEEE float, G.711 A-law/µ-law, any channel count) →
  mono float signal → bucket-mean features.
- remaining containers (MP4/H.264, progressive JPEG, …)
  raise NotImplementedError — they need real codec libraries;
  ``fake=True`` keeps the deterministic hash-based stand-in for
  pipeline tests over arbitrary bytes.

Design for 100 TB of media: binary payloads never shuffle.  All
feature extraction is a narrow mapInPandas over the scan; only the
(small) feature vectors and metadata proceed to joins/aggregations.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),      # opaque bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("source_uri", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload_sha256", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _bucket_features(signal: np.ndarray, dim: int) -> np.ndarray:
    """Mean of ``dim`` equal-width buckets of a 1-D float signal — the
    fixed-size feature vector every decoded modality reduces to."""
    signal = np.asarray(signal, dtype=np.float64).ravel()
    if signal.size == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, signal.size, dim + 1).astype(np.int64)
    counts = np.diff(edges)
    # reduceat misbehaves on repeated indices (empty buckets): guard
    sums = np.add.reduceat(signal, np.minimum(edges[:-1], signal.size - 1))
    out = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
    return out.astype(np.float32)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) image → float array (h, w, 3) in [0,1].

    Pure numpy: header tokenizer handles ``#`` comments and any
    whitespace; maxval ≤ 255 → 1 byte/sample, else 2 bytes big-endian
    (per the netpbm spec)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize header: 3 integers (width, height, maxval) after 'P6',
    # skipping comments; raster starts after exactly ONE whitespace
    # byte following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    n = width * height * 3
    if maxval < 256:
        raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    else:
        raster = np.frombuffer(payload, dtype=">u2", count=n, offset=pos)
    return raster.reshape(height, width, 3).astype(np.float64) / maxval


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type; palette rows (type 3) carry one
# index sample and expand to RGB/RGBA through PLTE after un-filtering
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# spec-legal bit depths per color type (PNG spec §11.2.2)
_PNG_DEPTHS = {0: {1, 2, 4, 8, 16}, 2: {8, 16}, 3: {1, 2, 4, 8},
               4: {8, 16}, 6: {8, 16}}


# Adam7 pass grid: (x start, x step, y start, y step) per pass
_ADAM7_PASSES = (
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
)


def _png_unfilter(
    raw: bytes, height: int, stride: int, bpp: int, offset: int = 0
) -> tuple[np.ndarray, int]:
    """Un-filter ``height`` scanlines of ``stride`` bytes starting at
    ``offset`` in the inflated stream → ((h, stride) uint8 array, end
    offset).  Filters operate on bytes at distance ``bpp``."""
    if offset + height * (stride + 1) > len(raw):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        base = offset + y * (stride + 1)
        fbyte = raw[base]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=base + 1
        ).astype(np.int32)
        if fbyte == 0:  # None
            recon = row
        elif fbyte == 1:  # Sub: per-byte-lane cumulative sum
            recon = row.copy()
            for c in range(bpp):
                recon[c::bpp] = np.cumsum(recon[c::bpp]) & 0xFF
        elif fbyte == 2:  # Up
            recon = (row + prev) & 0xFF
        elif fbyte == 3:  # Average
            recon = row.copy()
            for i in range(stride):
                a = recon[i - bpp] if i >= bpp else 0
                recon[i] = (recon[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif fbyte == 4:  # Paeth
            recon = row.copy()
            for i in range(stride):
                a = int(recon[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                recon[i] = (recon[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {fbyte}")
        out[y] = recon
        prev = recon.astype(np.int32)
    return out, offset + height * (stride + 1)


def _png_samples(
    out: np.ndarray, width: int, channels: int, bit_depth: int
) -> np.ndarray:
    """(h, stride) un-filtered bytes → (h, width, channels) integer
    samples (uint16 for 16-bit, uint8 otherwise; sub-byte depths are
    single-channel by spec)."""
    height = out.shape[0]
    if bit_depth == 16:  # big-endian sample pairs
        vals = (out[:, 0::2].astype(np.uint16) << 8) | out[:, 1::2]
        return vals.reshape(height, width, channels)
    if bit_depth < 8:  # sub-byte samples, MSB-first
        bits = np.unpackbits(out, axis=1)
        weights = 1 << np.arange(bit_depth - 1, -1, -1)
        samples = (bits.reshape(height, -1, bit_depth) @ weights)[:, :width]
        return samples.reshape(height, width, 1).astype(np.uint8)
    return out.reshape(height, width, channels)


def decode_png(payload: bytes) -> np.ndarray:
    """Parse a PNG → float array (h, w, channels) in [0,1], pure
    stdlib-zlib + numpy (no codec libs).

    Supports color types 0 (gray, 1/2/4/8/16-bit), 2 (RGB, 8/16-bit),
    3 (palette, 1/2/4/8-bit — PLTE lookup, optional tRNS alpha),
    4 (gray+alpha, 8/16-bit), 6 (RGBA, 8/16-bit), all five scanline
    filters (None/Sub/Up/Average/Paeth, the full filter method 0 of
    the PNG spec — filters operate on BYTES at distance bpp, so one
    un-filter loop covers every depth) and BOTH interlace methods
    (Adam7 passes un-filter as independent sub-images and scatter into
    the full raster).  Sub un-filtering is a per-byte-lane cumulative
    sum (vectorized); Average/Paeth walk the scanline (their
    recurrence is inherently sequential).
    """
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + body + CRC
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _compression, _filter, interlace = ihdr[8:13]
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if bit_depth not in _PNG_DEPTHS[color_type]:
        raise ValueError(
            f"illegal bit depth {bit_depth} for color type {color_type}"
        )
    if color_type == 3 and (plte is None or len(plte) % 3 != 0):
        raise ValueError("palette PNG missing or malformed PLTE chunk")
    channels = _PNG_CHANNELS[color_type]
    bits_pp = channels * bit_depth
    bpp = max(1, bits_pp // 8)  # filter distance in BYTES (spec: ≥1)
    import zlib

    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        stride = (width * bits_pp + 7) // 8
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG raster size mismatch")
        out, _ = _png_unfilter(raw, height, stride, bpp)
        samples = _png_samples(out, width, channels, bit_depth)
    elif interlace == 1:  # Adam7: each pass is an independent image
        dtype = np.uint16 if bit_depth == 16 else np.uint8
        samples = np.zeros((height, width, channels), dtype=dtype)
        offset = 0
        for x0, dx, y0, dy in _ADAM7_PASSES:
            pw = max(0, (width - x0 + dx - 1) // dx)
            ph = max(0, (height - y0 + dy - 1) // dy)
            if pw == 0 or ph == 0:  # empty pass carries no bytes
                continue
            pstride = (pw * bits_pp + 7) // 8
            out, offset = _png_unfilter(raw, ph, pstride, bpp, offset)
            samples[y0::dy, x0::dx] = _png_samples(
                out, pw, channels, bit_depth
            )
        if offset != len(raw):
            raise ValueError("PNG raster size mismatch")
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")

    if color_type == 3:
        table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples[:, :, 0]
        if idx.max(initial=0) >= len(table):
            raise ValueError("PNG palette index out of range")
        rgb = table[idx]
        if trns is None:
            return rgb.astype(np.float64) / 255.0
        alpha = np.full(len(table), 255, dtype=np.uint8)
        given = np.frombuffer(trns, dtype=np.uint8)[: len(table)]
        alpha[: len(given)] = given
        rgba = np.concatenate([rgb, alpha[idx][..., None]], axis=2)
        return rgba.astype(np.float64) / 255.0
    max_val = 65535.0 if bit_depth == 16 else float((1 << bit_depth) - 1)
    return samples.astype(np.float64) / max_val


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE payload → (mono float samples in [-1,1],
    sample_rate).  Chunk walker: fmt + data; integer PCM (format 1:
    8-bit unsigned, 16/24/32-bit signed little-endian) and IEEE float
    (format 3: 32/64-bit); multi-channel averaged to mono."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format not in (1, 3, 6, 7):
        raise NotImplementedError(
            f"WAV format {audio_format} "
            "(integer PCM, IEEE float and G.711 A-law/µ-law only)"
        )
    if audio_format in (6, 7):  # G.711 companding (8-bit log PCM)
        b = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
        if audio_format == 7:  # µ-law (ITU G.711 / Sun reference decode)
            u = (~b) & 0xFF
            exp = (u >> 4) & 0x07
            mant = u & 0x0F
            mag = (((mant << 3) + 0x84) << exp) - 0x84
            samples = np.where((u & 0x80) != 0, -mag, mag) / 32768.0
        else:  # A-law (sign bit 1 = positive after the 0x55 toggle)
            a = b ^ 0x55
            exp = (a >> 4) & 0x07
            mant = a & 0x0F
            mag = np.where(
                exp == 0,
                (mant << 4) + 8,
                ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
            )
            samples = np.where((a & 0x80) != 0, mag, -mag) / 32768.0
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            samples = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"{bits}-bit float WAV")
    elif bits == 8:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 24:  # 3-byte little-endian, sign-extended
        b = np.frombuffer(data, dtype=np.uint8)
        b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int32)
        vals = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        vals -= (vals & 0x800000) << 1
        samples = vals.astype(np.float64) / float(1 << 23)
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2**31
    else:
        raise NotImplementedError(f"{bits}-bit WAV")
    if n_channels > 1:
        samples = samples[: len(samples) - len(samples) % n_channels]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples, sample_rate


def _bmp_rle8(data: bytes, width: int, height: int) -> np.ndarray:
    """Expand a BI_RLE8 stream into a (height, width) index raster in
    STORAGE row order (caller flips bottom-up).  Escapes: 00 00 = end
    of line, 00 01 = end of bitmap, 00 02 dx dy = delta (skipped cells
    stay index 0 per convention), 00 n = n absolute indices (padded to
    a word); n c = run of n cells of index c."""
    out = np.zeros((height, width), dtype=np.uint8)
    x = y = pos = 0
    while pos + 1 < len(data):
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:  # encoded run
            end = min(x + n, width)
            out[y, x:end] = v
            x = end
            continue
        if v == 0:  # end of line
            x, y = 0, y + 1
            if y >= height:
                break
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            x = min(x + data[pos], width)
            y += data[pos + 1]
            pos += 2
            if y >= height:
                break
        else:  # absolute mode: v literal indices, word-aligned
            end = min(x + v, width)
            out[y, x:end] = np.frombuffer(
                data, dtype=np.uint8, count=end - x, offset=pos
            )
            x = end
            pos += v + (v & 1)
    return out


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse an uncompressed Windows BMP → float array (h, w, channels)
    in [0,1], pure numpy.

    Supports BI_RGB (compression 0) at 8-bit (palette lookup from the
    BGRA color table), 24-bit (BGR) and 32-bit (BGRA) depths, plus
    BI_RLE8 (compression 1) run-length 8-bit rasters, both bottom-up
    (positive height) and top-down (negative height), with BI_RGB rows
    padded to 4-byte boundaries.  RLE4/bitfield compressions raise
    NotImplementedError.
    """
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    px_offset = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression not in (0, 1):
        raise NotImplementedError(
            f"BMP compression {compression} (BI_RGB/BI_RLE8 only)"
        )
    if compression == 1 and bpp != 8:
        raise ValueError("BI_RLE8 requires an 8-bit BMP")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP (8/24/32 only)")
    if width <= 0 or height == 0:
        raise ValueError("malformed BMP dimensions")
    top_down = height < 0
    height = abs(height)
    if compression == 1:
        raster = _bmp_rle8(payload[px_offset:], width, height)
    else:
        stride = (width * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
        raster = np.frombuffer(
            payload, dtype=np.uint8, count=height * stride, offset=px_offset
        ).reshape(height, stride)
    if not top_down:
        raster = raster[::-1]
    if bpp == 8:
        n_colors = int.from_bytes(payload[46:50], "little") or 256
        table = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA quads → RGB
        idx = raster[:, :width]
        if idx.max(initial=0) >= n_colors:
            raise ValueError("BMP palette index out of range")
        return table[idx].astype(np.float64) / 255.0
    channels = bpp // 8
    px = raster[:, : width * channels].reshape(height, width, channels)
    if channels == 3:
        px = px[:, :, ::-1]  # BGR → RGB
    else:
        px = px[:, :, [2, 1, 0, 3]]  # BGRA → RGBA
    return px.astype(np.float64) / 255.0


_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE / SHORT / LONG


def decode_tiff(payload: bytes) -> np.ndarray:
    """Parse a baseline uncompressed TIFF (first IFD) → float array
    (h, w, channels) in [0,1], pure numpy.

    Supports both byte orders (II/MM), 8-bit samples, photometric 0/1
    grayscale (WhiteIsZero inverts), 2 RGB(A) and 3 palette (16-bit
    ColorMap scaled down), and multi-strip rasters.  Compressed TIFFs
    and non-8-bit samples raise NotImplementedError.
    """
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload")

    def u(off: int, n: int) -> int:
        return int.from_bytes(payload[off : off + n], bo)

    ifd = u(4, 4)
    n_entries = u(ifd, 2)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = ifd + 2 + i * 12
        tag, typ, cnt = u(e, 2), u(e + 2, 2), u(e + 4, 4)
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:  # rationals etc. — not needed for the raster
            continue
        voff = e + 8 if size * cnt <= 4 else u(e + 8, 4)
        tags[tag] = [u(voff + j * size, size) for j in range(cnt)]
    if 256 not in tags or 257 not in tags or 273 not in tags:
        raise ValueError("TIFF missing width/length/strip-offset tags")
    width, height = tags[256][0], tags[257][0]
    compression = tags.get(259, [1])[0]
    if compression != 1:
        raise NotImplementedError(
            f"TIFF compression {compression} (uncompressed only)"
        )
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"{bits}-bit TIFF (8-bit samples only)")
    offsets = tags[273]
    counts = tags.get(279, [width * height * spp])
    raster = b"".join(
        payload[o : o + c] for o, c in zip(offsets, counts)
    )
    if len(raster) < width * height * spp:
        raise ValueError("TIFF raster size mismatch")
    px = np.frombuffer(
        raster, dtype=np.uint8, count=width * height * spp
    ).reshape(height, width, spp)
    if photometric == 3:
        cmap = tags.get(320)
        if not cmap:
            raise ValueError("palette TIFF missing ColorMap")
        n_colors = len(cmap) // 3
        table = (  # ColorMap is 16-bit, reds then greens then blues
            np.array(cmap, dtype=np.uint32).reshape(3, n_colors).T // 257
        ).astype(np.uint8)
        idx = px[:, :, 0]
        if idx.max(initial=0) >= n_colors:
            raise ValueError("TIFF palette index out of range")
        return table[idx].astype(np.float64) / 255.0
    out = px.astype(np.float64) / 255.0
    if photometric == 0:  # WhiteIsZero: invert the gray channel
        out[:, :, 0] = 1.0 - out[:, :, 0]
    return out


def synth_tiff_bytes(
    width: int = 14,
    height: int = 9,
    mode: str = "rgb",
    byte_order: str = "II",
    rows_per_strip: int = 4,
    seed: int = 8,
) -> tuple[bytes, np.ndarray]:
    """Deterministic baseline TIFF fixture — mode ∈ {'gray', 'gray0',
    'rgb', 'palette'} ('gray0' is WhiteIsZero), either byte order,
    multi-strip layout.  Returns (payload, the exact (h,w,c) uint8
    raster decode_tiff should reproduce — already palette-expanded /
    polarity-corrected)."""
    bo = "little" if byte_order == "II" else "big"
    rng = np.random.RandomState(seed)
    spp = 3 if mode == "rgb" else 1
    raw = rng.randint(0, 256, (height, width, spp), dtype=np.uint8)
    photometric = {"gray0": 0, "gray": 1, "rgb": 2, "palette": 3}[mode]
    table = None
    if mode == "palette":
        raw %= 11
        table = rng.randint(0, 256, (11, 3), dtype=np.uint8)

    strips = [
        raw[y : y + rows_per_strip].tobytes()
        for y in range(0, height, rows_per_strip)
    ]
    body = bytearray(
        (b"II*\x00" if bo == "little" else b"MM\x00*") + b"\x00" * 4
    )
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(body))
        body += s

    extras: list[tuple[int, int, list[int]]] = []  # (tag, type, values)
    entries: list[tuple[int, int, list[int]]] = [
        (256, 3, [width]),
        (257, 3, [height]),
        (258, 3, [8] * spp),
        (259, 3, [1]),
        (262, 3, [photometric]),
        (273, 4, strip_offsets),
        (277, 3, [spp]),
        (278, 3, [rows_per_strip]),
        (279, 4, [len(s) for s in strips]),
    ]
    if table is not None:  # 16-bit ColorMap: reds, greens, blues
        cmap = [int(v) * 257 for v in table.T.reshape(-1)]
        entries.append((320, 3, cmap))
    entries.sort()
    # external value area for entries wider than the 4-byte field
    value_offsets: dict[int, int] = {}
    for tag, typ, values in entries:
        size = _TIFF_TYPE_SIZE[typ]
        if size * len(values) > 4:
            value_offsets[tag] = len(body)
            for v in values:
                body += v.to_bytes(size, bo)
    ifd_offset = len(body)
    body[4:8] = ifd_offset.to_bytes(4, bo)
    body += len(entries).to_bytes(2, bo)
    for tag, typ, values in entries:
        size = _TIFF_TYPE_SIZE[typ]
        body += tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
        body += len(values).to_bytes(4, bo)
        if tag in value_offsets:
            body += value_offsets[tag].to_bytes(4, bo)
        else:  # inline, left-justified in the 4-byte field
            field = b"".join(v.to_bytes(size, bo) for v in values)
            body += field + b"\x00" * (4 - len(field))
    body += (0).to_bytes(4, bo)  # no next IFD

    if mode == "palette":
        want = table[raw[:, :, 0]]
    elif mode == "gray0":
        want = 255 - raw
    else:
        want = raw
    return bytes(body), want


def decode_media(payload: bytes, media_type: str, dim: int, fake: bool) -> np.ndarray:
    """Decode one media payload to a ``dim``-float feature vector.

    Real decoders: PPM (P6) images, PNG images (gray/RGB/GA/RGBA
    8/16-bit + palette 1/2/4/8-bit, Adam7), uncompressed BMP images,
    GIF images (first frame, incl. interlaced + transparent),
    uncompressed baseline TIFF images, baseline JPEG images and RIFF
    WAV audio (integer PCM 8/16/24/32-bit, IEEE
    float, G.711 A-law/µ-law), parsed with pure stdlib+numpy (no codec
    libs needed).  Remaining containers (MP4/H.264, progressive JPEG,
    …) genuinely require codec libraries absent from this environment
    and raise NotImplementedError.  ``fake=True`` derives
    the vector from the payload's sha256 stream instead — deterministic
    stand-in for pipeline tests over arbitrary bytes.
    """
    if fake:
        h = hashlib.sha256(payload or b"")
        raw = b""
        block = h.digest()
        while len(raw) < dim * 4:
            block = hashlib.sha256(block).digest()
            raw += block
        arr = np.frombuffer(raw[: dim * 4], dtype=np.uint32).astype(np.float32)
        return arr / np.float32(2**32)
    if payload[:2] == b"P6":
        rgb = decode_ppm(payload)
        return _bucket_features(rgb.mean(axis=2), dim)  # grayscale
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        px = decode_png(payload)
        return _bucket_features(px.mean(axis=2), dim)  # grayscale
    if payload[:2] == b"\xff\xd8":
        from powerbi_ontology_extractor_spark.operators.jpeg import (
            decode_baseline_jpeg,
        )

        px = decode_baseline_jpeg(payload)
        return _bucket_features(px.mean(axis=2), dim)  # grayscale
    if payload[:2] == b"BM":
        px = decode_bmp(payload)
        return _bucket_features(px[:, :, :3].mean(axis=2), dim)  # grayscale
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from powerbi_ontology_extractor_spark.operators.gif import decode_gif

        px = decode_gif(payload)
        return _bucket_features(px[:, :, :3].mean(axis=2), dim)  # grayscale
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        px = decode_tiff(payload)
        return _bucket_features(px[:, :, :3].mean(axis=2), dim)  # grayscale
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, _ = decode_wav(payload)
        return _bucket_features(samples, dim)
    raise NotImplementedError(
        f"no pure-numpy decoder for this {media_type} container; "
        "PPM (P6), PNG, BMP, GIF, TIFF, baseline JPEG and WAV are "
        "supported, or pass fake=True"
    )


def synth_ppm_bytes(width: int = 24, height: int = 16, seed: int = 7) -> bytes:
    """Deterministic P6 fixture: seeded RGB gradient + comment header."""
    rng = np.random.RandomState(seed)
    img = (
        np.fromfunction(
            lambda y, x, c: (x * 7 + y * 5 + c * 41) % 256, (height, width, 3)
        ).astype(np.uint8)
        ^ rng.randint(0, 256, (height, width, 3), dtype=np.uint8)
    )
    header = f"P6\n# synthetic fixture\n{width} {height}\n255\n".encode()
    return header + img.tobytes()


def synth_png_bytes(width: int = 24, height: int = 16, seed: int = 11) -> bytes:
    """Deterministic 8-bit RGB PNG fixture, written with stdlib zlib.

    The encoder applies a DIFFERENT scanline filter per row (cycling
    None/Sub/Up/Average/Paeth) so a round-trip through decode_png
    exercises every un-filter branch, not just the trivial one."""
    import zlib

    rng = np.random.RandomState(seed)
    img = (
        np.fromfunction(
            lambda y, x, c: (x * 11 + y * 3 + c * 29) % 256, (height, width, 3)
        ).astype(np.uint8)
        ^ rng.randint(0, 256, (height, width, 3), dtype=np.uint8)
    )
    ch = 3
    raw = bytearray()
    prev = np.zeros(width * ch, dtype=np.int32)
    for y in range(height):
        cur = img[y].reshape(-1).astype(np.int32)
        f = y % 5
        if f == 0:
            filt = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            filt = (cur - left) & 0xFF
        elif f == 2:  # Up
            filt = (cur - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            filt = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            filt = cur.copy()
            for i in range(width * ch):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                filt[i] = (cur[i] - pred) & 0xFF
        raw.append(f)
        raw += filt.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # 8-bit, RGB, deflate, filter 0, no interlace
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + zlib.crc32(ctype + body).to_bytes(4, "big")
    )


def _png_filter_rows(img: np.ndarray, bpp: int) -> bytes:
    """Apply a DIFFERENT scanline filter per row (cycling None/Sub/Up/
    Average/Paeth at byte distance ``bpp``) to a (h, stride) uint8
    raster — every un-filter branch of decode_png gets exercised."""
    height, stride = img.shape
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        cur = img[y].astype(np.int32)
        f = y % 5
        if f == 0:
            filt = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            filt = (cur - left) & 0xFF
        elif f == 2:  # Up
            filt = (cur - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            filt = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            filt = cur.copy()
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                filt[i] = (cur[i] - pred) & 0xFF
        raw.append(f)
        raw += filt.astype(np.uint8).tobytes()
        prev = cur
    return bytes(raw)


def synth_png_palette_bytes(
    width: int = 21,
    height: int = 11,
    bit_depth: int = 4,
    seed: int = 5,
    with_trns: bool = True,
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Deterministic palette PNG fixture at any legal index depth
    (1/2/4/8-bit), filters cycling per row.  Returns (payload, palette
    (n,3) uint8, index raster (h,w)) so tests can assert the exact
    PLTE-expanded pixels; with_trns appends a partial tRNS table
    (earlier entries translucent, later ones defaulting to opaque)."""
    import zlib

    rng = np.random.RandomState(seed)
    n_colors = min(1 << bit_depth, 13)
    palette = rng.randint(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = (
        np.fromfunction(lambda y, x: (x * 3 + y * 7), (height, width)).astype(
            np.int64
        )
        + rng.randint(0, n_colors, (height, width))
    ) % n_colors
    idx = idx.astype(np.uint8)
    if bit_depth == 8:
        rows = idx
    else:
        shifts = np.arange(bit_depth - 1, -1, -1)
        bits = ((idx[:, :, None] >> shifts) & 1).reshape(height, -1)
        rows = np.packbits(bits.astype(np.uint8), axis=1)
    raw = _png_filter_rows(rows, bpp=1)
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([bit_depth, 3, 0, 0, 0])
    )
    chunks = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    chunks += _png_chunk(b"PLTE", palette.tobytes())
    if with_trns:  # partial table: remaining entries default to opaque
        n_trns = max(1, n_colors // 2)
        chunks += _png_chunk(
            b"tRNS", bytes((17 * (i + 3)) % 256 for i in range(n_trns))
        )
    chunks += _png_chunk(b"IDAT", zlib.compress(raw, 9))
    chunks += _png_chunk(b"IEND", b"")
    return chunks, palette, idx


def synth_png_adam7_bytes(
    width: int = 13, height: int = 10, seed: int = 6
) -> tuple[bytes, np.ndarray]:
    """Deterministic Adam7-interlaced 8-bit RGB PNG fixture: every
    pass is filtered as an independent sub-image (filter state resets
    per pass, cycling all five filters).  Returns (payload, the exact
    (h,w,3) uint8 raster)."""
    import zlib

    rng = np.random.RandomState(seed)
    img = (
        np.fromfunction(
            lambda y, x, c: (x * 13 + y * 17 + c * 7) % 256, (height, width, 3)
        ).astype(np.uint8)
        ^ rng.randint(0, 256, (height, width, 3), dtype=np.uint8)
    )
    raw = b""
    for x0, dx, y0, dy in _ADAM7_PASSES:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        raw += _png_filter_rows(sub.reshape(sub.shape[0], -1), bpp=3)
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 1])  # 8-bit RGB, Adam7
    )
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )
    return payload, img


def synth_png16_bytes(
    width: int = 9, height: int = 7, seed: int = 3
) -> tuple[bytes, np.ndarray]:
    """Deterministic 16-bit RGB PNG fixture (big-endian samples,
    filters cycling per row at bpp=6).  Returns (payload, the exact
    (h,w,3) uint16 raster)."""
    import zlib

    rng = np.random.RandomState(seed)
    img16 = (
        np.fromfunction(
            lambda y, x, c: (x * 4099 + y * 257 + c * 29), (height, width, 3)
        ).astype(np.int64)
        ^ rng.randint(0, 1 << 16, (height, width, 3), dtype=np.int64)
    ).astype(np.uint16) % 65536
    rows = np.frombuffer(
        img16.astype(">u2").tobytes(), dtype=np.uint8
    ).reshape(height, width * 6)
    raw = _png_filter_rows(rows, bpp=6)
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([16, 2, 0, 0, 0])
    )
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )
    return payload, img16


def synth_wav_bytes(
    n_samples: int = 2048, sample_rate: int = 8000, seed: int = 7
) -> bytes:
    """Deterministic 16-bit mono PCM WAV fixture: two sine tones +
    seeded noise."""
    rng = np.random.RandomState(seed)
    t = np.arange(n_samples) / sample_rate
    sig = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.25 * np.sin(2 * np.pi * 1000 * t)
        + 0.05 * rng.standard_normal(n_samples)
    )
    pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")          # PCM
        + (1).to_bytes(2, "little")        # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")        # block align
        + (16).to_bytes(2, "little")       # bits
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True, batch_hint: int = 64
) -> DataFrame:
    """mapInPandas feature extraction: binary batches in, small feature
    rows out.  Payload bytes are dropped on the way out (never shuffled).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            shas = []
            sizes = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                b = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
                feats.append(
                    [float(x) for x in decode_media(b, mtype, dim, fake)]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_sha256": shas,
                    "n_bytes": sizes,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes metadata through, marks the target
    size; the pixel transform itself is the stubbed decoder step."""
    return media.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp —
    sequence/explode on duration metadata (JVM-side).  The actual frame
    decode is the stubbed step."""
    v = media.where(F.col("media_type") == "video").where(
        F.col("duration_ms").isNotNull()
    )
    return v.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synth_media_df(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(128 + i))
        rows.append(
            (
                i,
                mtype,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[mtype],
                64 if mtype == "image" else None,
                48 if mtype == "image" else None,
                5000 + 100 * i if mtype != "image" else None,
                f"synthetic://media/{i}",
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
