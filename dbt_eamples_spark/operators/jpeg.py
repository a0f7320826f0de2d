"""Minimal pure-stdlib+numpy baseline JPEG codec (public spec:
ITU-T T.81 / ISO 10918-1, JFIF interchange).

Third hermetic codec behind the multimodal strict seam (PNG C2, WAV
C4): a real multimodal corpus is mostly JPEG, so the strict decode
path needs a genuine baseline-DCT decoder even though this container
ships no image library. Implemented from the public specification
with struct + numpy only:

 - decoder: baseline sequential DCT (SOF0) AND progressive DCT
   (SOF2 — multi-scan spectral selection plus full successive
   approximation, DC and AC first/refinement passes with EOB-run
   coding per T.81 Annex G), 8-bit samples, canonical Huffman
   entropy coding (ANY conforming DHT — the standard Annex K tables
   included), grayscale or YCbCr without chroma subsampling (all
   sampling factors 1×1), restart markers honored. Arithmetic
   coding, 12-bit, hierarchical (SOF3+), and subsampled chroma
   raise ``NotImplementedError`` — the libjpeg-turbo/PIL
   integration point.
 - encoder: the matching baseline profile (Annex K quantization
   tables at the 50% operating point, per-image canonical Huffman
   tables over the symbols actually emitted, 4:4:4) — used to
   generate REAL compressed payloads for hermetic tests.

The IDCT/FDCT are exact separable float64 matrix products (the
orthonormal DCT-II basis), vectorized per 8×8 block with numpy — the
Arrow-friendly formulation: inside a ``mapInPandas`` task all blocks
of a payload transform as one (n_blocks, 8, 8) einsum, no per-pixel
Python. JPEG is lossy by quantization; the codec is exact about
everything EXCEPT the quantizer (tests bound reconstruction error).

Scale posture: like png.py — runs inside Arrow batches of the
mapInPandas decode stage, per-task and streaming; JVM-side metadata
and frame sampling keep undecodable/unsampled payloads out of
Python.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants from the public spec ----------------------------------------

SOI = 0xFFD8
EOI = 0xFFD9

# zig-zag scan order (T.81 Figure 5): ZIGZAG[i] = block index of the
# i-th coefficient in scan order
ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
       17, 24, 32, 25, 18, 11,  4,  5,
       12, 19, 26, 33, 40, 48, 41, 34,
       27, 20, 13,  6,  7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36,
       29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46,
       53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K quantization tables (the standard 50%-quality operating
# point every reference encoder ships)
QUANT_LUMA = np.array(
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

QUANT_CHROMA = np.array(
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


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis M[u, x] = c(u)/2 ·
    cos((2x+1)uπ/16): spatial = Mᵀ·F·M, F = M·spatial·Mᵀ."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2.0)
    return m


_DCT = _dct_matrix()


def is_jpeg(data: bytes) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


# ---- bit I/O ----------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any non-stuffed marker (caller handles)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.acc = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            else:
                # marker: per spec the decoder sees 1-bits past the
                # end of valid data (only reached on truncated input)
                self.acc = (self.acc << 8) | 0xFF
                self.bits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.bits += 8

    def read_bit(self) -> int:
        if self.bits == 0:
            self._fill()
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.bits = 0
        self.acc = 0

    def at_marker(self) -> int | None:
        """The marker at the current byte position, if any."""
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] != 0x00
        ):
            return self.data[self.pos + 1]
        return None


class _BitWriter:
    """MSB-first writer with JPEG byte stuffing (0xFF → 0xFF 0x00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.bits += length
        while self.bits >= 8:
            self.bits -= 8
            b = (self.acc >> self.bits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.bits:
            pad = 8 - self.bits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)
        return bytes(self.out)


# ---- Huffman ----------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from a DHT BITS/HUFFVAL spec (T.81
    Annex C code-assignment procedure)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]):
        # (length, code) -> symbol; decode by extending one bit at a
        # time (max 16 iterations — fine at batch scale)
        self.lut: dict[tuple[int, int], int] = {}
        for sym, (code, length) in _canonical_codes(bits, vals).items():
            self.lut[(length, code)] = sym

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss category, appended bits) for a DC diff / AC value —
    T.81 F.1.2.1 (one's-complement negative representation)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    return ssss, (v if v > 0 else v + (1 << ssss) - 1)


def _extend(bits: int, ssss: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if ssss == 0:
        return 0
    if bits < (1 << (ssss - 1)):
        return bits - (1 << ssss) + 1
    return bits


def _build_huffman(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """Per-image canonical table: all used symbols get equal-length
    codes of L = ceil(log2(n+1)) bits (strictly more codewords than
    symbols, so the all-ones code — reserved by the spec's optional
    extension convention — stays unused). Valid DHT, decodable by
    any conforming decoder; compression is a few percent worse than
    the Annex K tables, which is irrelevant for the seam's purpose."""
    syms = sorted(freq)
    if not syms:
        syms = [0]
    n = len(syms)
    length = max(1, (n + 1 - 1).bit_length())
    if (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, syms


# ---- encoder ----------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def _blocks_of(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicated 8×8 tiling → (n_blocks, 8, 8) float64, plus
    the block grid (bh, bw)."""
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(
        plane.astype(np.float64),
        ((0, bh * 8 - h), (0, bw * 8 - w)),
        mode="edge",
    )
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, bh, bw


def _quantized_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize all blocks of a plane at once → (n, 64) int
    in zig-zag order."""
    blocks, _, _ = _blocks_of(plane)
    coefs = np.einsum("ux,nxy,vy->nuv", _DCT, blocks - 128.0, _DCT)
    quant = np.round(coefs / q).astype(np.int64)
    return quant.reshape(-1, 64)[:, ZIGZAG]


def _rle_block(zz: np.ndarray) -> list[tuple[int, int]]:
    """AC run-length symbols for one zig-zag block: (RRRRSSSS
    symbol, value); 0xF0 = ZRL (16 zeros), 0x00 = EOB."""
    out: list[tuple[int, int]] = []
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            out.append((0xF0, 0))
            run -= 16
        ssss, _ = _magnitude(v)
        out.append(((run << 4) | ssss, v))
        run = 0
    if last_nz < 63:
        out.append((0x00, 0))
    return out


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8
    array as a baseline JFIF JPEG (4:4:4, Annex K quantizers,
    per-image canonical Huffman tables)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        quants = [QUANT_LUMA]
        qids = [0]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[:, :, c] for c in range(3)]
        quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
        qids = [0, 1, 1]

    per_comp = [
        _quantized_coeffs(p, q) for p, q in zip(planes, quants)
    ]

    # symbol passes: gather DC/AC symbol frequencies per table class
    # (luma = component 0, chroma = 1&2, as the standard layout)
    n_classes = 1 if gray else 2
    dc_freq: list[dict[int, int]] = [{} for _ in range(n_classes)]
    ac_freq: list[dict[int, int]] = [{} for _ in range(n_classes)]
    comp_class = [0] if gray else [0, 1, 1]
    for ci, coefs in enumerate(per_comp):
        cls = comp_class[ci]
        prev_dc = 0
        for blk in coefs:
            ssss, _ = _magnitude(int(blk[0]) - prev_dc)
            prev_dc = int(blk[0])
            dc_freq[cls][ssss] = dc_freq[cls].get(ssss, 0) + 1
            for sym, _v in _rle_block(blk):
                ac_freq[cls][sym] = ac_freq[cls].get(sym, 0) + 1

    dc_tables = [_build_huffman(f) for f in dc_freq]
    ac_tables = [_build_huffman(f) for f in ac_freq]
    dc_codes = [_canonical_codes(*t) for t in dc_tables]
    ac_codes = [_canonical_codes(*t) for t in ac_tables]

    # entropy-coded scan: components interleaved per MCU (one 8×8
    # block per component at 1×1 sampling)
    bw_ = _BitWriter()
    prev_dc_by_comp = [0] * len(per_comp)
    n_blocks = per_comp[0].shape[0]
    for b in range(n_blocks):
        for ci, coefs in enumerate(per_comp):
            cls = comp_class[ci]
            blk = coefs[b]
            diff = int(blk[0]) - prev_dc_by_comp[ci]
            prev_dc_by_comp[ci] = int(blk[0])
            ssss, extra = _magnitude(diff)
            code, length = dc_codes[cls][ssss]
            bw_.write(code, length)
            if ssss:
                bw_.write(extra, ssss)
            for sym, v in _rle_block(blk):
                code, length = ac_codes[cls][sym]
                bw_.write(code, length)
                s = sym & 0x0F
                if s:
                    _, extra = _magnitude(v)
                    bw_.write(extra, s)
    scan = bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(struct.pack(">H", SOI))
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )  # APP0
    for qid, q in enumerate(quants[: n_classes]):
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([qid]) + zz)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])  # 1×1 sampling
    out += seg(0xFFC0, sof)
    for cls in range(n_classes):
        bits, vals = dc_tables[cls]
        out += seg(0xFFC4, bytes([cls]) + bytes(bits) + bytes(vals))
        bits, vals = ac_tables[cls]
        out += seg(0xFFC4, bytes([0x10 | cls]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = comp_class[ci]
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos) + scan + struct.pack(">H", EOI)
    return bytes(out)


# ---- progressive encoder ----------------------------------------------------


def _enc_ac_first_block(blk, ss, se, al, emit_sym, emit_bits):
    """AC first-pass symbols for one block's band, values in the
    point-transformed domain (sign x (|v| >> Al)); per-block EOB
    (an EOB-run of exactly 1 — valid, never accumulated across
    blocks, which keeps the encoder stateless per block)."""
    vals = []
    for k in range(ss, se + 1):
        v = int(blk[k])
        a = abs(v) >> al
        vals.append(a if v >= 0 else -a)
    nz = [i for i, v in enumerate(vals) if v]
    last = nz[-1] if nz else -1
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            emit_sym(0xF0)
            run -= 16
        ssss, extra = _magnitude(v)
        emit_sym((run << 4) | ssss)
        emit_bits(extra, ssss)
        run = 0
    if last < se - ss:
        emit_sym(0x00)  # EOB


def _enc_ac_refine_block(blk, ss, se, al, emit_sym, emit_bits):
    """AC refinement symbols + correction bits for one block's band
    (T.81 G.1.2.3, the libjpeg buffered-bits structure): runs count
    zero-HISTORY coefficients only; already-nonzero coefficients
    buffer one correction bit each, flushed after the next symbol —
    the exact interleaving the decoder's run-advance walk reads."""
    absv, sgn = [], []
    for k in range(ss, se + 1):
        v = int(blk[k])
        absv.append(abs(v) >> al)
        sgn.append(v < 0)
    eob = -1
    for i, a in enumerate(absv):
        if a == 1:
            eob = i
    run = 0
    pending: list[int] = []

    def flush():
        for bit in pending:
            emit_bits(bit, 1)
        pending.clear()

    for i, a in enumerate(absv):
        if a == 0:
            run += 1
            continue
        if i <= eob:
            while run > 15:
                emit_sym(0xF0)
                flush()
                run -= 16
        if a > 1:
            pending.append(a & 1)
            continue
        emit_sym((run << 4) | 1)
        emit_bits(0 if sgn[i] else 1, 1)
        flush()
        run = 0
    if run > 0 or pending:
        emit_sym(0x00)  # EOB-run of 1 carrying the tail corrections
        flush()


def encode_jpeg_progressive(pixels: np.ndarray, al: int = 1) -> bytes:
    """Encode as a progressive (SOF2) JFIF JPEG with the standard
    scan-script shape: interleaved DC first scan, per-component AC
    band scans (1-5, 6-63), then — when ``al`` > 0 — DC and AC
    refinement scans down to full precision. ``al=0`` produces a
    spectral-selection-only script. Each scan ships its own
    per-scan canonical DHT. Quantized coefficients are IDENTICAL to
    ``encode_jpeg``'s, so a decoder must reproduce the baseline
    pixels bit for bit — the roundtrip tests assert exactly that."""
    if al < 0 or al > 13:
        raise ValueError("al out of range")
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        quants = [QUANT_LUMA]
        qids = [0]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[:, :, c] for c in range(3)]
        quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
        qids = [0, 1, 1]
    per_comp = [_quantized_coeffs(p, q) for p, q in zip(planes, quants)]
    ncomp = len(per_comp)
    comp_class = [0] if gray else [0, 1, 1]
    n_blocks = per_comp[0].shape[0]
    bands = [(1, 5), (6, 63)]

    # scan list: (kind, comp_indices, ss, se, ah, al)
    scans: list[tuple[str, list[int], int, int, int, int]] = []
    scans.append(("dc_first", list(range(ncomp)), 0, 0, 0, al))
    for ci in range(ncomp):
        for ss, se in bands:
            scans.append(("ac_first", [ci], ss, se, 0, al))
    if al > 0:
        # refine one bit at a time down to Al = 0
        for lvl in range(al, 0, -1):
            scans.append(
                ("dc_refine", list(range(ncomp)), 0, 0, lvl, lvl - 1)
            )
            for ci in range(ncomp):
                for ss, se in bands:
                    scans.append(("ac_refine", [ci], ss, se, lvl, lvl - 1))

    def run_scan(kind, cis, ss, se, ah, sal, emit_sym, emit_bits):
        if kind == "dc_first":
            prev = [0] * ncomp
            for b in range(n_blocks):
                for ci in cis:
                    v = int(per_comp[ci][b][0]) >> sal
                    diff = v - prev[ci]
                    prev[ci] = v
                    ssss, extra = _magnitude(diff)
                    emit_sym(comp_class[ci], ssss)
                    if ssss:
                        emit_bits(extra, ssss)
        elif kind == "dc_refine":
            for b in range(n_blocks):
                for ci in cis:
                    emit_bits((int(per_comp[ci][b][0]) >> sal) & 1, 1)
        else:
            ci = cis[0]
            fn = (
                _enc_ac_first_block
                if kind == "ac_first"
                else _enc_ac_refine_block
            )
            cls = comp_class[ci]
            for b in range(n_blocks):
                fn(
                    per_comp[ci][b], ss, se, sal,
                    lambda sym: emit_sym(cls, sym), emit_bits,
                )

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(struct.pack(">H", SOI))
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    n_classes = 1 if gray else 2
    for qid, q in enumerate(quants[:n_classes]):
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([qid]) + zz)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])
    out += seg(0xFFC2, sof)

    for kind, cis, ss, se, ah, sal in scans:
        is_dc = kind.startswith("dc")
        needs_table = kind != "dc_refine"
        if needs_table:
            # pass 1: per-class symbol frequencies for THIS scan
            freqs: dict[int, dict[int, int]] = {}

            def count_sym(cls, sym):
                f = freqs.setdefault(cls, {})
                f[sym] = f.get(sym, 0) + 1

            run_scan(
                kind, cis, ss, se, ah, sal, count_sym, lambda *_: None
            )
            tables = {
                cls: _build_huffman(f) for cls, f in sorted(freqs.items())
            }
            codes = {cls: _canonical_codes(*t) for cls, t in tables.items()}
            tc = 0x00 if is_dc else 0x10
            for cls, (bits, vals) in sorted(tables.items()):
                out += seg(
                    0xFFC4, bytes([tc | cls]) + bytes(bits) + bytes(vals)
                )
        else:
            codes = {}
        bw_ = _BitWriter()

        def write_sym(cls, sym):
            code, length = codes[cls][sym]
            bw_.write(code, length)

        run_scan(kind, cis, ss, se, ah, sal, write_sym, bw_.write)
        sos = bytes([len(cis)])
        for ci in cis:
            cls = comp_class[ci]
            sos += bytes([ci + 1, (cls << 4) | cls])
        sos += bytes([ss, se, (ah << 4) | sal])
        out += seg(0xFFDA, sos) + bw_.flush()
    out += struct.pack(">H", EOI)
    return bytes(out)


# ---- progressive scan passes (T.81 Annex G) --------------------------------


def _ac_first_pass(br, dec, blk, ss, se, al, eobrun):
    """AC spectral-selection first pass for one block; returns the
    remaining EOB run (G.2.2: an (r, 0) symbol with r<15 codes a run
    of 2^r + extra end-of-band blocks, this one included)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = dec.decode(br)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_pass(br, dec, blk, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block (the
    correction-bit pass, T.81 G.1.2.3): every already-nonzero
    coefficient passed contributes one bit; a (r, 1) symbol places a
    new ±2^Al after r zero-HISTORY coefficients."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        if br.read_bit() and (blk[k] & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = dec.decode(br)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                newval = 0  # ZRL: advance 16 zero-history coeffs
            else:
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


# ---- decoder ----------------------------------------------------------------


def _decode_scan(
    data, pos, coefs, scan, huff_dc, huff_ac, n_blocks,
    restart_interval, progressive, ss, se, ah, al,
):
    """Decode ONE entropy-coded scan into the coefficient planes;
    returns the byte position of the next marker. Baseline = the
    single full-band interleaved scan; progressive dispatches on
    (Ss, Ah) to the four Annex G pass types."""
    br = _BitReader(data, pos)
    if not progressive or ss == 0:
        # interleaved MCU order (baseline and DC scans; 1x1 sampling
        # makes one MCU = one block per scan component)
        prev_dc = [0] * len(scan)
        for mcu in range(n_blocks):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align()
                m = br.at_marker()
                if m is not None and 0xD0 <= m <= 0xD7:
                    br.pos += 2
                    prev_dc = [0] * len(scan)
            for si, (ci, dc_id, ac_id) in enumerate(scan):
                blk = coefs[ci][mcu]
                if progressive and ah != 0:  # DC refinement: 1 bit
                    if br.read_bit():
                        blk[0] |= 1 << al
                    continue
                ssss = huff_dc[dc_id].decode(br)
                diff = _extend(br.read_bits(ssss), ssss) if ssss else 0
                prev_dc[si] += diff
                blk[0] = prev_dc[si] << al  # al = 0 for baseline
                if progressive:
                    continue  # DC-only scan
                k = 1
                while k <= 63:
                    sym = huff_ac[ac_id].decode(br)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += sym >> 4
                    s = sym & 0x0F
                    if k > 63:
                        raise ValueError("AC index overflow")
                    blk[k] = _extend(br.read_bits(s), s)
                    k += 1
    else:
        # AC band scan: exactly one component, raster block order
        ci, _dc_id, ac_id = scan[0]
        dec = huff_ac[ac_id]
        passfn = _ac_first_pass if ah == 0 else _ac_refine_pass
        eobrun = 0
        for b in range(n_blocks):
            if restart_interval and b and b % restart_interval == 0:
                br.align()
                m = br.at_marker()
                if m is not None and 0xD0 <= m <= 0xD7:
                    br.pos += 2
                    eobrun = 0
            eobrun = passfn(br, dec, coefs[ci][b], ss, se, al, eobrun)
    br.align()
    return br.pos


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG →
    (width, height, channels, pixels) uint8 (h, w, ch) — grayscale
    ch=1, color ch=3 (RGB). Progressive streams accumulate their
    coefficient planes scan by scan (DC/AC, first/refinement); the
    single dequantize+IDCT at the end is shared with baseline."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    w = h = None
    comps: list[tuple[int, int]] = []  # (comp_id, quant_id)
    restart_interval = 0
    progressive = False
    coefs: list[np.ndarray] = []
    n_blocks = bh = bw_ = 0
    any_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        # 0xFF fill bytes may pad before any marker (B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            # stream ends inside 0xFF padding: no marker byte left
            raise ValueError("truncated stream")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers, no length field
            pos += 2
            continue
        if pos + 4 > len(data):
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            for ci in range(ncomp):
                cid, sampling, qid = payload[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    raise NotImplementedError(
                        "subsampled chroma (only 4:4:4/grayscale)"
                    )
                comps.append((cid, qid))
            bh, bw_ = (h + 7) // 8, (w + 7) // 8
            n_blocks = bh * bw_
            coefs = [
                np.zeros((n_blocks, 64), dtype=np.int64) for _ in comps
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"SOF{marker - 0xC0} (only SOF0 baseline / SOF2 progressive)"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                dec = _HuffDecoder(bits, vals)
                if tc_th >> 4 == 0:
                    huff_dc[tc_th & 0x0F] = dec
                else:
                    huff_ac[tc_th & 0x0F] = dec
                p += 17 + n
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq_tq = payload[p]
                if pq_tq >> 4 != 0:
                    raise NotImplementedError("16-bit quant table")
                zz = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = zz
                quant[pq_tq & 0x0F] = q.reshape(8, 8)
                p += 65
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload)
        elif marker == 0xDA:  # SOS — entropy data follows
            if not comps:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            cid_to_ix = {cid: ix for ix, (cid, _q) in enumerate(comps)}
            scan = []  # (comp_index, dc_tbl, ac_tbl)
            for ci in range(ns):
                cid = payload[1 + 2 * ci]
                tbls = payload[2 + 2 * ci]
                scan.append((cid_to_ix[cid], tbls >> 4, tbls & 0x0F))
            ss, se, ah_al = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            pos = _decode_scan(
                data, pos, coefs, scan, huff_dc, huff_ac, n_blocks,
                restart_interval, progressive, ss, se, ah, al,
            )
            any_scan = True
            if not progressive:
                break  # baseline: single scan, EOI follows
    if w is None or not any_scan:
        raise ValueError("missing SOF/SOS")

    ncomp = len(comps)
    planes = []
    for ci, (cid, qid) in enumerate(comps):
        q = quant[qid]
        dez = np.zeros((n_blocks, 64), dtype=np.float64)
        dez[:, ZIGZAG] = coefs[ci]
        blocks = dez.reshape(-1, 8, 8) * q
        spatial = np.einsum("xu,nuv,yv->nxy", _DCT.T, blocks, _DCT.T)
        grid = (
            spatial.reshape(bh, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        planes.append(grid[:h, :w] + 128.0)
    if ncomp == 1:
        px = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, px
    ycc = np.stack(planes, axis=2)
    return w, h, 3, _ycbcr_to_rgb(ycc)
