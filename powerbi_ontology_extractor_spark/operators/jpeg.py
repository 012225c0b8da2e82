"""Baseline-sequential JPEG codec in pure stdlib + numpy.

The container-frequency argument from the round-3/4 verdicts: baseline
JPEG is the single most common image container in a crawled corpus, and
(unlike MP4/H.264) it is implementable without codec libraries — JFIF
marker walk, canonical Huffman entropy coding, dequantization, 8×8
type-III DCT, chroma upsampling, YCbCr→RGB.  This module provides both
directions:

- ``decode_baseline_jpeg``: SOF0 baseline sequential, 8-bit, grayscale
  or YCbCr with any sampling factors in {1,2} (covers 4:4:4, 4:2:2 and
  4:2:0); Huffman tables and quantization tables are read from the
  stream (DHT/DQT), so any spec-conformant baseline file decodes.
  Progressive (SOF2), arithmetic coding, 12-bit precision and restart
  intervals (DRI) raise NotImplementedError explicitly.
- ``encode_baseline_jpeg`` / ``synth_jpeg_bytes``: deterministic
  encoder used to produce the committed test fixture — Annex-K
  quantization + Huffman tables, 4:2:0 or 4:4:4 subsampling, edge-pad
  to MCU boundaries, byte stuffing.  JPEG is lossy, so the round-trip
  test pins closeness to the source image plus an exact output hash,
  not byte equality.

Everything is numpy matrix math except the entropy coder, which is
inherently bit-serial; fixture-sized images decode in milliseconds and
the Spark path batches whole payloads per task (operators/multimodal.py
— media bytes never shuffle).
"""

from __future__ import annotations

import numpy as np


def _zigzag_indices() -> np.ndarray:
    """Zigzag position → raster index (computed, not transcribed)."""
    out = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag = diag[::-1]
        out += diag
    return np.array([r * 8 + c for r, c in out], dtype=np.int64)


ZIGZAG = _zigzag_indices()

# Annex K quantization tables (K.1 / K.2), raster order
Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K Huffman table specs: (bits[1..16], huffval)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _build_codes(spec: tuple[list[int], list[int]]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol → (length, code).  Raises if the
    (bits, huffval) spec is not a feasible prefix code."""
    bits, vals = spec
    assert len(bits) == 16 and sum(bits) == len(vals)
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("infeasible Huffman spec")
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(spec: tuple[list[int], list[int]]) -> dict[tuple[int, int], int]:
    return {lc: sym for sym, lc in _build_codes(spec).items()}


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None].astype(np.float64)
    i = np.arange(8)[None, :].astype(np.float64)
    m = np.cos((2 * i + 1) * k * np.pi / 16)
    m[0, :] *= np.sqrt(1.0 / 8.0)
    m[1:, :] *= np.sqrt(2.0 / 8.0)
    return m


_DCT = _dct_matrix()  # forward: _DCT @ block @ _DCT.T; inverse transposes


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for bit in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> bit) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per the spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt != 0x00:
                    raise ValueError(f"marker 0x{nxt:02X} inside entropy data")
                self.pos += 1  # skip the stuffed zero
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _mag(v: int) -> tuple[int, int]:
    """value → (category size, magnitude bits)."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _decode_sym(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


# --- encoder -----------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (img[..., c].astype(np.float64) for c in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.pad(
        plane, ((0, h - plane.shape[0]), (0, w - plane.shape[1])), mode="edge"
    )


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    dc_prev: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    coefs = _DCT @ (block - 128.0) @ _DCT.T
    quant = np.round(coefs / qtab).astype(np.int64)
    zz = quant.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - dc_prev
    size, bits = _mag(diff)
    length, code = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _mag(v)
        length, code = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if run:
        length, code = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_baseline_jpeg(img: np.ndarray, subsampling: str = "420") -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale → baseline JFIF bytes.

    Annex-K quantization and Huffman tables; ``subsampling`` ∈
    {"420", "444"} for color (grayscale always single-component).
    """
    img = np.asarray(img)
    gray = img.ndim == 2
    height, width = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
        qids = [0]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        if subsampling == "420":
            samps = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            samps = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        hmax = max(h for h, _ in samps)
        vmax = max(v for _, v in samps)
        y = _pad_to(
            y,
            -(-height // (8 * vmax)) * 8 * vmax,
            -(-width // (8 * hmax)) * 8 * hmax,
        )
        if subsampling == "420":
            cbp = _pad_to(cb, y.shape[0], y.shape[1])
            crp = _pad_to(cr, y.shape[0], y.shape[1])
            cb = cbp.reshape(y.shape[0] // 2, 2, y.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(y.shape[0] // 2, 2, y.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    hmax = max(h for h, _ in samps)
    vmax = max(v for _, v in samps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    # pad each plane to its own MCU-covered size
    for ci, (hs, vs) in enumerate(samps):
        planes[ci] = _pad_to(planes[ci], mcus_y * vs * 8, mcus_x * hs * 8)

    qtabs = [Q_LUMA.astype(np.float64), Q_CHROMA.astype(np.float64)]
    dc_codes = [_build_codes(DC_LUMA_SPEC), _build_codes(DC_CHROMA_SPEC)]
    ac_codes = [_build_codes(AC_LUMA_SPEC), _build_codes(AC_CHROMA_SPEC)]
    tids = [0] + [1] * (len(planes) - 1)

    bw = _BitWriter()
    dc_prev = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hs, vs) in enumerate(samps):
                for by in range(vs):
                    for bx in range(hs):
                        r0 = (my * vs + by) * 8
                        c0 = (mx * hs + bx) * 8
                        block = planes[ci][r0 : r0 + 8, c0 : c0 + 8]
                        dc_prev[ci] = _encode_block(
                            bw,
                            block,
                            qtabs[qids[ci]],
                            dc_prev[ci],
                            dc_codes[tids[ci]],
                            ac_codes[tids[ci]],
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + (1).to_bytes(2, "big") * 2 + b"\x00\x00"
    )
    out += seg(0xDB, bytes([0x00]) + bytes(Q_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(
            0xDB, bytes([0x01]) + bytes(Q_CHROMA.reshape(-1)[ZIGZAG].astype(np.uint8))
        )
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(planes)])
    for ci, (hs, vs) in enumerate(samps):
        sof += bytes([ci + 1, (hs << 4) | vs, qids[ci]])
    out += seg(0xC0, sof)
    specs = [(0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC)]
    if not gray:
        specs += [(0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC)]
    for tid, (bits, vals) in specs:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (tids[ci] << 4) | tids[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential JFIF bytes → float array (h, w, 3) RGB or
    (h, w, 1) grayscale in [0,1].

    Tables come from the stream (any conformant baseline file decodes,
    not just this module's encoder output).  Declared out: progressive
    (SOF2) and every other non-SOF0 frame type, restart intervals,
    12-bit precision.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        size = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + size]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zzvals = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                tab = np.zeros(64, dtype=np.float64)
                tab[ZIGZAG] = zzvals
                qtabs[tq] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                table = _decode_table((bits, vals))
                (dc_tabs if tc == 0 else ac_tabs)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (SOF marker 0x{marker:02X}; "
                "only SOF0 baseline sequential is supported)"
            )
        elif marker == 0xDD:  # DRI
            if int.from_bytes(body[:2], "big") != 0:
                raise NotImplementedError("JPEG restart intervals (DRI)")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si : 3 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0xF))
            pos = pos + 2 + size  # entropy data starts here
            break
        # APPn / COM / others: skip
        pos += 2 + size
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS segment")

    height, width, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    by_id = {cid: (cid, hs, vs, tq) for cid, hs, vs, tq in comps}
    order = []  # interleave order follows the SOS component list
    planes: dict[int, np.ndarray] = {}
    for cs, td, ta in scan:
        cid, hs, vs, tq = by_id[cs]
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        order.append((cid, hs, vs, tq, td, ta))

    br = _BitReader(payload, pos)
    dc_prev = {cid: 0 for cid, *_ in order}
    inv = _DCT.T
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, hs, vs, tq, td, ta in order:
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.float64)
                        s = _decode_sym(br, dc_tabs[td])
                        diff = _extend(br.read_bits(s), s) if s else 0
                        dc_prev[cid] += diff
                        zz[0] = dc_prev[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_sym(br, ac_tabs[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coefs = np.zeros(64, dtype=np.float64)
                        coefs[ZIGZAG] = zz
                        block = (
                            inv @ (coefs.reshape(8, 8) * qtabs[tq]) @ _DCT
                        ) + 128.0
                        r0 = (my * vs + by) * 8
                        c0 = (mx * hs + bx) * 8
                        planes[cid][r0 : r0 + 8, c0 : c0 + 8] = block

    full = []
    for cid, hs, vs, tq, td, ta in order:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        out = np.clip(full[0], 0, 255)[:, :, None]
        return out / 255.0
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255)
    return rgb / 255.0


def synth_jpeg_bytes(
    width: int = 40, height: int = 24, seed: int = 13, subsampling: str = "420"
) -> bytes:
    """Deterministic baseline-JPEG fixture: smooth two-tone gradient
    plus mild seeded noise (JPEG is lossy — smooth content keeps the
    round-trip error inside the quantization budget the test pins).
    40×24 with 4:2:0 forces edge padding on both axes (MCU grid 3×2 of
    16×16 covers 48×32), so the pad/crop path is exercised."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    base = 96 + 64 * np.sin(xx / 9.0) + 48 * np.cos(yy / 7.0)
    img = np.stack(
        [base, 255 - base, 0.5 * base + 64], axis=2
    ) + rng.uniform(-3, 3, (height, width, 3))
    return encode_baseline_jpeg(
        np.clip(img, 0, 255).astype(np.uint8), subsampling=subsampling
    )
