"""Minimal pure-stdlib PNG codec (public spec: RFC 2083 / W3C PNG).

The multimodal decode seam (`multimodal.py`) needs a REAL decoder to
prove the Arrow plumbing end-to-end, but this container ships no
image library — so the PNG baseline profile is implemented here from
the public specification with zlib + struct + numpy only: 8-bit
greyscale/RGB/RGBA (color types 0/2/4/6), all five scanline filters
(None/Sub/Up/Average/Paeth), non-interlaced. That covers every PNG a
standard encoder writes with default settings. Palette images,
16-bit depth, and Adam7 interlacing raise ``NotImplementedError`` —
at that point a production deployment plugs in PIL, which this
module's API mirrors 1:1 (decode → (w, h, channels, HxWxC uint8)).

Palette images (color type 3, 8-bit indices) decode too: the PLTE
table maps indices to RGB, and a tRNS chunk promotes the output to
RGBA (entries beyond the tRNS length are opaque, per the spec) —
the profile GIF-era web corpora are full of. Sub-byte palette
indices (1/2/4-bit), 16-bit depth, and Adam7 interlacing remain
behind the NotImplementedError seam.

Scale posture: the codec runs INSIDE the Arrow batch of a
``mapInPandas`` stage — per-task, streaming, no driver involvement.
Python-level cost is the unavoidable price of media decode (PIL pays
it in C; frames here are small); everything before this stage
(metadata filter, frame sampling) is JVM-side so only surviving
payloads reach Python.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # greyscale, RGB, grey+A, RGBA


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_SIGNATURE


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline PNG → ``(width, height, channels, pixels)``
    with ``pixels`` shaped (height, width, channels), dtype uint8."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG: bad signature")
    pos = 8
    idat = bytearray()
    w = h = color_type = None
    plte = trns = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[
            pos + 4 : pos + 8
        ]
        pos += 8
        chunk = data[pos : pos + length]
        pos += length + 4  # payload + CRC (integrity is zlib's job here)
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if bit_depth != 8:
                raise NotImplementedError(f"bit depth {bit_depth} (only 8)")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlacing")
            if color_type != 3 and color_type not in _CHANNELS:
                raise NotImplementedError(f"color type {color_type}")
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS" and color_type == 3:
            trns = np.frombuffer(chunk, np.uint8)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR chunk")
    if color_type == 3 and plte is None:
        raise ValueError("palette image without PLTE chunk")
    ch = 1 if color_type == 3 else _CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    rpos = 0
    for y in range(h):
        f = raw[rpos]
        rpos += 1
        line = np.frombuffer(raw, np.uint8, count=stride, offset=rpos).astype(
            np.int32
        )
        rpos += stride
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up — vectorizable (no left dependency)
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 1:
                    v = line[x] + a
                elif f == 3:
                    v = line[x] + (a + b) // 2
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    v = line[x] + pred
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    if color_type == 3:
        idx = out.reshape(h, w)
        if idx.max(initial=0) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]  # (h, w, 3) gather — vectorized
        if trns is None:
            return w, h, 3, rgb
        alpha = np.full(len(plte), 255, dtype=np.uint8)
        alpha[: len(trns)] = trns
        return w, h, 4, np.dstack([rgb, alpha[idx]])
    return w, h, ch, out.reshape(h, w, ch)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w, ch) or (h, w) uint8 array as a baseline PNG.
    ``filter_type`` applies one filter to every scanline (0/1/2/3/4)
    — exercising the decoder's unfilter paths in tests."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int32)
    lines = bytearray()
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if filter_type == 0:
            enc = cur
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        else:
            enc = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if filter_type == 1:
                    enc[x] = (cur[x] - a) & 0xFF
                elif filter_type == 3:
                    enc[x] = (cur[x] - (a + b) // 2) & 0xFF
                elif filter_type == 4:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    enc[x] = (cur[x] - pred) & 0xFF
                else:
                    raise ValueError(f"unknown filter {filter_type}")
        lines.append(filter_type)
        lines.extend(int(v) & 0xFF for v in enc)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload))
    )


def encode_png_indexed(
    indices: np.ndarray,
    palette: np.ndarray,
    trns: bytes | None = None,
) -> bytes:
    """Encode an (h, w) uint8 index plane as a color-type-3 PNG with
    the given (n, 3) uint8 PLTE (and optional tRNS alpha table) —
    the fixture generator the palette decode path is tested with."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    lines = bytearray()
    for y in range(h):
        lines.append(0)  # filter None
        lines.extend(idx[y].tobytes())
    out = PNG_SIGNATURE + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    )
    out += _png_chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", trns)
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )
