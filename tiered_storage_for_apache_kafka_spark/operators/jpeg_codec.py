"""Pure-Python/numpy baseline JPEG (JFIF) codec.

Implements the baseline sequential DCT process of ITU-T T.81 (the public
JPEG specification) with the Annex K example quantization and Huffman
tables — no libjpeg, no PIL:

- **encode_jpeg**: 8-bit grayscale or RGB (converted to YCbCr; 4:4:4
  or 4:2:0 chroma subsampling), level shift → 2-D DCT → quality-scaled
  quantization → zigzag → differential DC + run-length AC Huffman
  coding with byte stuffing; emits SOI/APP0/DQT/SOF0/DHT/SOS/EOI.
- **decode_jpeg**: marker parse (DQT 8-bit, DHT, SOS; SOF0 baseline
  decodes here, SOF2 progressive routes to `jpeg_progressive.py`;
  restart intervals (DRI + RSTn resync, sequence-checked) are
  decoded; 12-bit / >2x2-sampled streams are rejected with
  ValueError), canonical Huffman decode with 0xFF00 unstuffing,
  dequantize, IDCT, level shift + clamp, YCbCr→RGB.

Rounding is pinned everywhere to ``floor(x + 0.5)`` (round half toward
+inf) so the arithmetic is reproducible in SQL. DC-only blocks take the
exact-integer fast path every practical IDCT has (libjpeg's ``dcval``
shortcut in jidctint.c): a block whose AC coefficients are all zero
decodes to the constant ``clamp(floor(dc*q00/8 + 0.5) + 128)`` — which
is what makes the piecewise-constant fixture of the oracle-checked
query byte-predictable while the general float-IDCT path handles
arbitrary blocks.

Reference provenance: the tiered-storage reference has no media path;
this module exists for the LLM-pipeline brief (multimodal decode as an
Arrow-batched narrow map stage).
"""

from __future__ import annotations

import struct

import numpy as np

# -- Annex K tables (ITU-T T.81, public) --------------------------------------

QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

# (bits[1..16], huffval) per Annex K
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
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

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 2-D DCT basis: S = A @ s @ A.T ; s = A.T @ S @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _round_half_up(x):
    """floor(x + 0.5): the pinned rounding used by both codec directions
    (reproducible in SQL as FLOOR(x + 0.5))."""
    return np.floor(x + 0.5).astype(np.int64)


def scale_quant_table(base: "np.ndarray", quality: int) -> "np.ndarray":
    """IJG quality scaling (public libjpeg convention)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


_HUFFMAN_CACHE: dict = {}


def _build_huffman(bits: list[int], vals: list[int]):
    """Canonical Huffman per T.81 Annex C: returns (code, size) dicts
    keyed by symbol. Cached: the encoder always uses the four fixed
    Annex K tables, and rebuilding them dominated encode profiles
    (~20% of encode time across a corpus)."""
    key = (tuple(bits), tuple(vals))
    cached = _HUFFMAN_CACHE.get(key)
    if cached is not None:
        return cached
    if len(_HUFFMAN_CACHE) >= _CODEC_CACHE_MAX:
        _HUFFMAN_CACHE.pop(next(iter(_HUFFMAN_CACHE)))
    sizes = []
    for length, n in enumerate(bits, start=1):
        sizes.extend([length] * n)
    codes = {}
    code = 0
    prev_size = sizes[0] if sizes else 0
    for sym, size in zip(vals, sizes):
        code <<= size - prev_size
        prev_size = size
        codes[sym] = (code, size)
        code += 1
    _HUFFMAN_CACHE[key] = codes
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def align(self) -> None:
        """Pad to a byte boundary with 1s (T.81 B.2.1) — the state a
        restart marker must land on."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (markers are never byte-stuffed)."""
        self.align()
        self.out += bytes((0xFF, 0xD0 | (n & 7)))

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy stream truncated at 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                    )
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, n: int) -> None:
        """Consume the expected RSTn at the current byte boundary:
        discard partial bits (the encoder padded with 1s), verify the
        marker and its sequence number mod 8."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG entropy stream truncated at restart")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
            raise ValueError(
                f"expected RST{n & 7} marker, found {b0:02X}{b1:02X}"
            )
        if (b1 & 7) != (n & 7):
            raise ValueError(
                f"restart marker out of sequence: expected RST{n & 7}, "
                f"found RST{b1 & 7}"
            )
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t received bits back to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Bit size of |v| (DC/AC size category)."""
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


# -- encoder ------------------------------------------------------------------


def _fdct_quant(block: "np.ndarray", q: "np.ndarray") -> "np.ndarray":
    s = block.astype(np.float64) - 128.0
    S = _A @ s @ _A.T
    return _round_half_up(S / q)


def _encode_block(
    coeffs: "np.ndarray", dc_pred: int, dc_codes, ac_codes, w: _BitWriter
) -> int:
    z = coeffs.flatten()[ZIGZAG]
    dc = int(z[0])
    diff = dc - dc_pred
    t = _category(diff)
    code, size = dc_codes[t]
    w.write(code, size)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if z[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(z[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, size = ac_codes[0xF0]  # ZRL
            w.write(code, size)
            run -= 16
        t = _category(v)
        code, size = ac_codes[(run << 4) | t]
        w.write(code, size)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz != 63:
        code, size = ac_codes[0x00]  # EOB
        w.write(code, size)
    return dc


def _rgb_to_ycbcr(px: "np.ndarray") -> "np.ndarray":
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=2)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(px: "np.ndarray") -> "np.ndarray":
    y = px[:, :, 0].astype(np.float64)
    cb = px[:, :, 1].astype(np.float64) - 128.0
    cr = px[:, :, 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def encode_jpeg(
    pixels: "np.ndarray",
    quality: int = 92,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder: uint8 HxW (grayscale) or HxWx3 (RGB,
    coded as YCbCr). ``subsampling`` is ``"444"`` (one block per
    component per MCU) or ``"420"`` (2x2 luma MCUs with 2x2-box-averaged
    chroma — the dominant real-corpus layout; needs 3 components and
    dimensions that are multiples of 16). Dimensions must be multiples
    of 8 (this encoder does not edge-pad)."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg needs uint8 pixels")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ncomp = pixels.shape
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 components")
    if h % 8 or w % 8:
        raise ValueError("dimensions must be multiples of 8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    # grayscale has no chroma to subsample: '420' degrades to 4:4:4
    sub420 = subsampling == "420" and ncomp == 3
    if sub420 and (h % 16 or w % 16):
        raise ValueError("4:2:0 needs dimensions that are multiples of 16")
    if ncomp == 3:
        pixels = _rgb_to_ycbcr(pixels)

    ql = scale_quant_table(QUANT_LUMA, quality)
    qc = scale_quant_table(QUANT_CHROMA, quality)
    tables = [ql] + ([qc] if ncomp == 3 else [])

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(tables):
        out += _marker(0xDB, bytes([tid]) + bytes(int(v) for v in q.flatten()[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        hv = 0x22 if (sub420 and c == 0) else 0x11
        sof += bytes([c + 1, hv, 0 if c == 0 else 1])
    out += _marker(0xC0, sof)  # SOF0 baseline
    huff_defs = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if ncomp == 3:
        huff_defs += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in huff_defs:
        out += _marker(
            0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    dc_l = _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS)

    writer = _BitWriter()
    preds = [0] * ncomp
    if sub420:
        # chroma planes: 2x2 box average (round-half-up), then MCU
        # interleave 4 Y blocks + 1 Cb + 1 Cr (T.81 A.2.3 order)
        y_plane = pixels[:, :, 0]
        chroma = [
            np.clip(
                _round_half_up(
                    pixels[:, :, c]
                    .astype(np.float64)
                    .reshape(h // 2, 2, w // 2, 2)
                    .mean(axis=(1, 3))
                ),
                0,
                255,
            ).astype(np.uint8)
            for c in (1, 2)
        ]
        n_mcu = 0
        for my in range(h // 16):
            for mx in range(w // 16):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    writer.restart(n_mcu // restart_interval - 1)
                    preds = [0] * ncomp
                n_mcu += 1
                for byi in range(2):
                    for bxi in range(2):
                        y0 = my * 16 + byi * 8
                        x0 = mx * 16 + bxi * 8
                        coeffs = _fdct_quant(
                            y_plane[y0 : y0 + 8, x0 : x0 + 8], ql
                        )
                        preds[0] = _encode_block(
                            coeffs, preds[0], dc_l, ac_l, writer
                        )
                for c, plane in enumerate(chroma, start=1):
                    y0, x0 = my * 8, mx * 8
                    coeffs = _fdct_quant(plane[y0 : y0 + 8, x0 : x0 + 8], qc)
                    preds[c] = _encode_block(
                        coeffs, preds[c], dc_c, ac_c, writer
                    )
    else:
        n_mcu = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    writer.restart(n_mcu // restart_interval - 1)
                    preds = [0] * ncomp
                n_mcu += 1
                for c in range(ncomp):
                    block = pixels[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c]
                    q = ql if c == 0 else qc
                    coeffs = _fdct_quant(block, q)
                    dc_codes = dc_l if c == 0 else dc_c
                    ac_codes = ac_l if c == 0 else ac_c
                    preds[c] = _encode_block(coeffs, preds[c], dc_codes, ac_codes, writer)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ------------------------------------------------------------------


_DECODER_CACHE: dict = {}
_CODEC_CACHE_MAX = 64  # bounded: optimized JPEGs carry per-image DHTs,
# so an unbounded cache would grow with the corpus (and adversarial
# inputs could force it); 64 covers the standard-table population


def _decoder_for(bits: list[int], vals: list[int]) -> "_HuffDecoder":
    """Decoders are pure functions of their DHT payload — cache them
    (non-optimized corpora reuse the Annex K tables on every image, and
    profiles showed 4 rebuilds per decode); FIFO-bounded for
    per-image-optimized tables."""
    key = (tuple(bits), tuple(vals))
    dec = _DECODER_CACHE.get(key)
    if dec is None:
        if len(_DECODER_CACHE) >= _CODEC_CACHE_MAX:
            _DECODER_CACHE.pop(next(iter(_DECODER_CACHE)))
        dec = _DECODER_CACHE[key] = _HuffDecoder(bits, vals)
    return dec


class _HuffDecoder:
    """Canonical Huffman decode table: (mincode/maxcode/valptr per
    length) per T.81 Annex F."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = r.read_bit()
        length = 1
        while code > self.maxcode[length] or self.maxcode[length] < 0:
            length += 1
            if length > 16:
                raise ValueError("invalid JPEG Huffman code")
            code = (code << 1) | r.read_bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _idct_block(coeffs: "np.ndarray", q: "np.ndarray") -> "np.ndarray":
    deq = coeffs * q
    flat = deq.ravel()
    if not flat[1:].any():
        # exact-integer DC-only fast path (libjpeg's dcval shortcut):
        # a constant block decodes to floor(dc*q00/8 + 0.5) + 128
        import math

        val = math.floor(int(flat[0]) / 8.0 + 0.5) + 128
        return np.full((8, 8), max(0, min(255, val)), dtype=np.uint8)
    s = _A.T @ deq.astype(np.float64) @ _A
    return np.clip(_round_half_up(s) + 128, 0, 255).astype(np.uint8)


def decode_jpeg(blob: bytes) -> "np.ndarray":
    """JFIF decoder; returns uint8 HxWxC (C = 1 or 3, RGB for color).
    Baseline (SOF0) decodes here; progressive (SOF2) routes to
    `jpeg_progressive.decode_progressive`; other processes raise."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    comps: list[dict] = []
    restart_interval = 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        if pos + 2 > len(blob):
            raise ValueError("truncated JPEG: lone 0xFF at end of stream")
        tag = blob[pos + 1]
        if tag == 0xD9:  # EOI
            raise ValueError("JPEG has no scan data before EOI")
        if tag == 0x01 or 0xD0 <= tag <= 0xD7:  # TEM / RSTn: no payload
            pos += 2
            continue
        if pos + 4 > len(blob):
            raise ValueError("truncated JPEG marker")
        (length,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        body = blob[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated JPEG marker body")
        if tag == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                if zz.size != 64:
                    raise ValueError("short DQT payload")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif tag == 0xC2:  # SOF2: progressive — route to the Annex G path
            from tiered_storage_for_apache_kafka_spark.operators.jpeg_progressive import (  # noqa: E501 (local import: jpeg_progressive imports this module)
                decode_progressive,
            )

            return decode_progressive(blob)
        elif tag in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{tag - 0xC0}): "
                "baseline and progressive only"
            )
        elif tag == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("short SOF0 payload")
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + nc * 3:
                raise ValueError("short SOF0 component list")
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"unsupported sampling factors {hi}x{vi} (max 2x2)"
                    )
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            frame = (h, w, nc)
        elif tag == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                if len(bits) != 16:
                    raise ValueError("short DHT payload")
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise ValueError("short DHT payload")
                huff[(tc, th)] = _decoder_for(bits, vals)
                p += 17 + n
        elif tag == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("short DRI payload")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif tag == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if not body or len(body) < 1 + body[0] * 2 + 3:
                raise ValueError("short SOS payload")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + c * 2 : 3 + c * 2]
                comp = next((x for x in comps if x["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"scan references unknown component {cs}")
                scan.append({**comp, "td": tdta >> 4, "ta": tdta & 0x0F})
            data_start = pos + 2 + length
            return _decode_scan(
                blob, data_start, frame, scan, qtables, huff,
                restart_interval,
            )
        # APPn/COM/unknown: skipped
        pos += 2 + length
    raise ValueError("JPEG has no SOS marker")


def _decode_one_block(reader, comp, ci, preds, qtables, huff) -> "np.ndarray":
    dc_dec = huff.get((0, comp["td"]))
    ac_dec = huff.get((1, comp["ta"]))
    q = qtables.get(comp["tq"])
    if dc_dec is None or ac_dec is None or q is None:
        raise ValueError("scan references missing table")
    t = dc_dec.decode(reader)
    diff = _extend(reader.receive(t), t)
    preds[ci] += diff
    z = np.zeros(64, dtype=np.int64)
    z[0] = preds[ci]
    k = 1
    while k < 64:
        rs = ac_dec.decode(reader)
        r_, s_ = rs >> 4, rs & 0x0F
        if s_ == 0:
            if r_ == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r_
        if k > 63:
            raise ValueError("AC run past end of block")
        z[k] = _extend(reader.receive(s_), s_)
        k += 1
    coeffs = np.zeros(64, dtype=np.int64)
    coeffs[ZIGZAG] = z
    return _idct_block(coeffs.reshape(8, 8), q)


def _decode_scan(
    blob, start, frame, scan, qtables, huff, restart_interval=0
) -> "np.ndarray":
    """MCU-interleaved entropy decode (T.81 A.2.3): the MCU is hmax x
    vmax luma blocks plus each chroma component's hi x vi blocks; after
    reconstruction, subsampled planes are box-upsampled (nearest) to the
    frame size. 4:4:4 degenerates to the one-block-per-component MCU; a
    single-component scan is non-interleaved by definition (data unit =
    one block, regardless of its sampling factors)."""
    h, w, nc = frame
    if len(scan) != nc:
        raise ValueError("interleaved single-scan baseline expected")
    end = blob.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    reader = _BitReader(blob[start:end])
    if nc == 1:
        scan = [{**scan[0], "h": 1, "v": 1}]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.uint8)
        for c in scan
    ]
    preds = [0] * nc
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                # T.81 restart: byte-align, verify RSTn sequence, reset
                # DC predictions
                reader.restart(n_mcu // restart_interval - 1)
                preds = [0] * nc
            n_mcu += 1
            for ci, comp in enumerate(scan):
                for byi in range(comp["v"]):
                    for bxi in range(comp["h"]):
                        block = _decode_one_block(
                            reader, comp, ci, preds, qtables, huff
                        )
                        y0 = (my * comp["v"] + byi) * 8
                        x0 = (mx * comp["h"] + bxi) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    full = []
    for ci, comp in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1:
            p = p.repeat(ry, axis=0)
        if rx > 1:
            p = p.repeat(rx, axis=1)
        full.append(p[:h, :w])
    img = np.stack(full, axis=2)
    if nc == 3:
        img = _ycbcr_to_rgb(img)
    return img
