"""Pure-Python/numpy GIF decoder (first frame) for the multimodal
feature path — no codec libs in this container.

GIF87a/GIF89a: logical-screen + global color table, extension blocks
(the 89a Graphic Control Extension supplies transparency), image
descriptor with optional local color table and interlacing, and the
GIF flavor of LZW (variable 3..12-bit codes, LSB-first bit packing,
CLEAR/END codes, deferred table reset).  The LZW loop is per-CODE
Python (each code emits a whole string, so it is far fewer iterations
than pixels); payloads are bounded and decoded inside mapInPandas, so
this stays off every shuffle path like the PNG/JPEG decoders
(multimodal.py module notes).

Animation is out of scope for feature extraction: only the FIRST
image block decodes; later frames and their disposal semantics are
ignored by design (documented, not a declared gap).
"""

from __future__ import annotations

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")

# row order of the four interlace passes (start offset, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def lzw_decode(data: bytes, min_code_size: int, expected: int) -> list[int]:
    """GIF-LZW: variable-width codes (LSB-first), CLEAR resets the
    table, END stops, and the KwKwK case (code == next unassigned
    entry) resolves to prev + prev[0].  Stops after ``expected``
    indices — trailing padding bits are legal."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, tuple[int, ...]] = {i: (i,) for i in range(clear)}
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < expected:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 4], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: (i,) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:  # KwKwK
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"LZW code {code} beyond table ({next_code})")
        out.extend(entry)
        prev = entry
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < expected:
        raise ValueError(
            f"LZW stream ended at {len(out)} of {expected} indices"
        )
    return out[:expected]


def _color_table(payload: bytes, pos: int, packed: int, flag_bit: int):
    """Read a color table if the descriptor's flag bit is set: returns
    ((n,3) RGB array or None, position after the table)."""
    if not (packed >> flag_bit) & 1:
        return None, pos
    n = 2 << (packed & 0x07)
    table = np.frombuffer(
        payload, dtype=np.uint8, count=n * 3, offset=pos
    ).reshape(n, 3)
    return table, pos + n * 3


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks (length-prefixed, 0x00 terminates)."""
    chunks = []
    while pos < len(payload):
        size = payload[pos]
        pos += 1
        if size == 0:
            break
        chunks.append(payload[pos : pos + size])
        pos += size
    return b"".join(chunks), pos


def decode_gif(payload: bytes) -> np.ndarray:
    """Parse the first frame of a GIF → float array (h, w, 3|4) in
    [0,1] (RGBA when the 89a Graphic Control Extension marks a
    transparent index, RGB otherwise).  Local color tables override
    the global one; interlaced frames are deinterlaced."""
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    pos = 6
    packed = payload[pos + 4]
    pos += 7  # logical screen descriptor
    global_table, pos = _color_table(payload, pos, packed, 7)
    transparent_idx = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = payload[pos]
                gce = payload[pos + 1 : pos + 1 + size]
                if gce[0] & 1:  # transparency flag
                    transparent_idx = gce[3]
                pos += 1 + size
            _, pos = _sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor: first frame decodes, then return
        width = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        height = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        ipacked = payload[pos + 8]
        pos += 9
        local_table, pos = _color_table(payload, pos, ipacked, 7)
        table = local_table if local_table is not None else global_table
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = np.array(
            lzw_decode(data, min_code_size, width * height), dtype=np.int64
        ).reshape(height, width)
        if (ipacked >> 6) & 1:  # interlaced: remap pass rows
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, height, step)
            ]
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF color index out of range")
        rgb = table[idx]
        if transparent_idx is None:
            return rgb.astype(np.float64) / 255.0
        alpha = np.where(idx == transparent_idx, 0, 255).astype(np.uint8)
        rgba = np.concatenate([rgb, alpha[..., None]], axis=2)
        return rgba.astype(np.float64) / 255.0
    raise ValueError("GIF contains no image block")


def _lzw_encode_literals(indices: np.ndarray, min_code_size: int) -> bytes:
    """Valid GIF-LZW stream that emits every index as a literal code,
    mirroring the decoder's table-growth accounting so the code width
    advances in lockstep (the standard 'uncompressed GIF' trick)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    next_code = end + 1
    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    fresh = True  # the first code after a CLEAR adds no table entry
    for v in indices.reshape(-1).tolist():
        emit(int(v))
        if fresh:
            fresh = False
        else:  # decoder adds one table entry per subsequent code
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            if next_code >= 4095:  # stay clear of the 12-bit ceiling
                emit(clear)
                code_size = min_code_size + 1
                next_code = end + 1
                fresh = True
    emit(end)
    if nbits:
        bits.append(acc & 0xFF)
    return bytes(bits)


def synth_gif_bytes(
    width: int = 19,
    height: int = 13,
    seed: int = 9,
    interlace: bool = False,
    transparent: bool = False,
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Deterministic GIF89a fixture: 16-color global table, literal-code
    LZW body split into ≤255-byte sub-blocks, optional interlacing and
    optional GCE transparency on index 0.  Returns (payload, palette
    (16,3), index raster (h,w))."""
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = (
        np.fromfunction(lambda y, x: x * 5 + y * 3, (height, width)).astype(
            np.int64
        )
        + rng.randint(0, 16, (height, width))
    ) % 16
    idx = idx.astype(np.uint8)
    rows = idx
    if interlace:
        order = [
            y
            for start, step in _INTERLACE_PASSES
            for y in range(start, height, step)
        ]
        rows = idx[order]  # storage order = pass order
    payload = bytearray(b"GIF89a")
    payload += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    payload += bytes([0x80 | 0x03, 0, 0])  # global table, 2<<3=16 entries
    payload += palette.tobytes()
    if transparent:
        payload += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])  # GCE: idx 0
    payload += bytes([0x2C]) + b"\x00" * 4  # image at (0,0)
    payload += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    payload += bytes([0x40 if interlace else 0x00])
    min_code_size = 4
    payload += bytes([min_code_size])
    body = _lzw_encode_literals(rows, min_code_size)
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        payload += bytes([len(chunk)]) + chunk
    payload += bytes([0x00, 0x3B])  # block terminator + trailer
    return bytes(payload), palette, idx
