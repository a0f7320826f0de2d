"""Minimal pure-stdlib GIF codec (public spec: GIF87a/89a, W3C).

Round-6 extension of the strict multimodal decode seam (VERDICT r5
#7): GIF is the remaining GIF-era web-corpus image format after the
palette-PNG profile (png.py C10), and its payload is LZW + a color
table — fully decodable with struct + numpy, no image library.

Profile: GIF87a and GIF89a, global and local color tables, interlaced
and non-interlaced frames, 89a graphic-control transparency (output
promotes to RGBA). ``decode_gif`` returns the FIRST image frame —
the right unit for corpus feature extraction (animated GIFs are a
frame STREAM; sampling frames is `multimodal_frame_sample`'s job,
and a production deployment plugs PIL/av in at the seam for that).
Malformed streams raise ValueError; anything outside the profile
raises NotImplementedError at the documented seam.

The encoder (`encode_gif_indexed`) writes a real LZW-compressed
GIF89a from (palette, index array) — hermetic fixtures for the
decode tests, the same encoder-for-fixtures pattern as png/jpeg/wav.

Scale posture: identical to png.py — runs inside the Arrow batch of
a ``mapInPandas`` stage, per-task, no driver involvement.
"""

from __future__ import annotations

import struct

import numpy as np


def is_gif(data: bytes) -> bool:
    return bytes(data[:6]) in (b"GIF87a", b"GIF89a")


# ---- LZW ---------------------------------------------------------------------
def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-flavor LZW: codes packed LSB-first, dictionary reset on
    CLEAR, code width grows after the dict fills each width, capped
    at 12 bits (dict then frozen until the next CLEAR)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [[i] for i in range(clear)] + [None, None]

    table = list(base)
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
                if entry is None:
                    raise ValueError("LZW: bad first code")
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError("LZW: code out of range")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(min_code_size: int, indices: "np.ndarray") -> bytes:
    """Real LZW compression (dict up to 4096, CLEAR on overflow)."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for idx in bytes(bytearray(int(i) for i in indices)):
        cand = run + bytes([idx])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = fresh()
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([idx])
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---- decode ------------------------------------------------------------------
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [
        y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
    ]
    out = np.empty_like(rows)
    out[np.array(order)] = rows
    return out


def decode_gif(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode the first frame of a GIF → (width, height, channels,
    pixels) uint8 (h, w, ch); ch=3 RGB, or 4 when an 89a graphic
    control declares a transparent index (RGBA)."""
    data = bytes(data)
    if not is_gif(data):
        raise ValueError("not a GIF: bad signature")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    transparent = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image frame")
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            subs = []
            while data[pos] != 0:
                size = data[pos]
                subs.append(data[pos + 1 : pos + 1 + size])
                pos += 1 + size
            pos += 1  # block terminator
            if label == 0xF9 and subs:  # graphic control
                flags, _delay, tidx = struct.unpack("<BHB", subs[0][:4])
                if flags & 0x01:
                    transparent = tidx
            continue
        if block == 0x2C:  # image descriptor — the first frame
            _left, _top, w, h, ipacked = struct.unpack(
                "<HHHHB", data[pos : pos + 9]
            )
            pos += 9
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(
                    data[pos : pos + 3 * n], np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF frame has no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                size = data[pos]
                lzw += data[pos + 1 : pos + 1 + size]
                pos += 1 + size
            idx = _lzw_decode(min_code, bytes(lzw))
            if len(idx) < w * h:
                raise ValueError("GIF: truncated pixel data")
            grid = np.array(idx[: w * h], np.uint8).reshape(h, w)
            if ipacked & 0x40:
                grid = _deinterlace(grid)
            if int(grid.max()) >= len(table):
                raise ValueError("GIF: index beyond color table")
            rgb = table[grid]
            if transparent is None:
                return w, h, 3, rgb
            alpha = np.where(grid == transparent, 0, 255).astype(np.uint8)
            return w, h, 4, np.dstack([rgb, alpha])
        raise NotImplementedError(
            f"GIF block 0x{block:02x} outside the decoded profile"
        )
    raise ValueError("GIF: unterminated stream")


# ---- encode (fixture generator) ----------------------------------------------
def encode_gif_indexed(
    palette: np.ndarray,
    indices: np.ndarray,
    *,
    interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """GIF89a from an RGB ``palette`` (n≤256, 3) and an (h, w) uint8
    index grid — real LZW compression, optional interlacing and
    transparency, so decode tests exercise every profile branch with
    hermetic payloads."""
    palette = np.asarray(palette, np.uint8)
    indices = np.asarray(indices, np.uint8)
    h, w = indices.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    full = 1 << bits
    pal = np.zeros((full, 3), np.uint8)
    pal[:n] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    ipacked = 0x40 if interlace else 0
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    grid = indices
    if interlace:
        order = [
            y
            for start, step in _INTERLACE_PASSES
            for y in range(start, h, step)
        ]
        grid = indices[np.array(order)]
    min_code = max(2, bits)
    out += bytes([min_code])
    lzw = _lzw_encode(min_code, grid.reshape(-1))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
