"""From-scratch baseline JPEG (ITU-T T.81) codec — numpy only.

Closes the "JPEG decode is out of scope" gap from rounds 4-5: with
PNG/BMP/GIF (image_codec), WAV (audio_codec) and now JFIF/JPEG, every
common still-image container in a web-crawl multimodal column decodes
natively inside the Arrow-batched UDF stages, no PIL/ffmpeg.

Scope — the Huffman-coded DCT modes that cover essentially all web
JPEGs:
- SOF0/SOF1 (baseline/extended sequential) and SOF2 (progressive,
  spectral selection + successive approximation per T.81 Annex G),
  8-bit samples, 1 (grayscale) or 3 (YCbCr) components,
  4:4:4 / 4:2:2 / 4:2:0 chroma subsampling
- DHT Huffman tables are read from the stream (the encoder writes the
  Annex K "typical" tables); DQT 8-bit and 16-bit precision
- DRI/RSTn restart markers (DC predictors reset, bitstream realigns)
- arithmetic coding (SOF9+), lossless and 12-bit depth raise
  :class:`image_codec.ImageDecodeError` — honestly unsupported

The 8×8 DCT-II/III runs as two dense 8×8 matmuls per block over a
stacked (n_blocks, 8, 8) array — vectorized in numpy, no per-pixel
Python. Entropy coding is necessarily bit-serial; blobs parallelize
across Arrow batch rows in Spark, not within a blob.

All constants (zig-zag scan, Annex K quantization + Huffman tables,
JFIF marker layout, BT.601 YCbCr) are from the public JPEG spec.
"""

from __future__ import annotations

import struct

import numpy as np

from .image_codec import ImageDecodeError

# ---------------------------------------------------------------- constants

# zig-zag scan order, generated (no typo risk): position i of the
# 64-entry scan holds the raster index it reads from
def _zigzag() -> np.ndarray:
    # odd diagonals run down-left (row ascending), even diagonals
    # up-right (row descending ⇔ column ascending) — T.81 Figure A.6;
    # head pinned by test: 0, 1, 8, 16, 9, 2, 3, 10, 17, 24
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables (luminance / chrominance), raster order
Q_LUM = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
Q_CHR = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K "typical" Huffman tables: (bits[1..16], symbol values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal DCT-II basis: SPATIAL = D.T @ COEF @ D, COEF = D @ SPATIAL @ D.T
_k = np.arange(8).reshape(-1, 1)
_n = np.arange(8).reshape(1, -1)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
DCT_M[0] /= np.sqrt(2.0)


def _canonical_codes(bits, vals):
    """(bits, vals) → {symbol: (code, length)} per T.81 Annex C."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# ------------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """coefficient → (category, extra bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _fdct_quant(planes: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples → (n, 64) zig-zag quantized."""
    coef = DCT_M @ planes @ DCT_M.T
    q = np.round(coef.reshape(-1, 64) / qtab.reshape(1, 64)).astype(np.int64)
    return q[:, ZIGZAG]


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (H/8 * W/8, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_to(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = img.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(img, ((0, ph), (0, pw)), mode="edge")


def _encode_block(bw, block, dc_codes, ac_codes, pred):
    diff = int(block[0]) - pred
    s, extra = _magnitude(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(extra, s)
    run = 0
    last = 63
    while last > 0 and block[last] == 0:
        last -= 1
    for i in range(1, last + 1):
        v = int(block[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, extra = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(extra, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(block[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 75,
    subsample: str = "4:2:0",
    interleaved: bool = True,
) -> bytes:
    """Serialize (H, W), (H, W, 1) gray or (H, W, 3) RGB uint8 to a
    baseline JFIF stream. Grayscale emits one component; color emits
    BT.601 YCbCr with the requested chroma subsampling.
    ``interleaved=False`` emits one SOS per component (the T.81
    non-interleaved sequential layout some encoders produce) — used to
    fixture the decoder's Ns=1 branch; pixel output is identical."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H,W)[,1|3] uint8")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsample not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(f"subsample must be 4:4:4/4:2:2/4:2:0, got {subsample}")
    sh, sv = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}[subsample]
    if gray:
        sh = sv = 1

    qlum = _quality_scale(Q_LUM, quality)
    qchr = _quality_scale(Q_CHR, quality)
    dc_l = _canonical_codes(*DC_LUM)
    ac_l = _canonical_codes(*AC_LUM)
    dc_c = _canonical_codes(*DC_CHR)
    ac_c = _canonical_codes(*AC_CHR)

    if gray:
        y = arr.astype(np.float64)
        comps = [(1, (1, 1), 0)]
        planes = {1: _pad_to(y, 8, 8)}
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        yp = _pad_to(y, 8 * sv, 8 * sh)
        # box-average subsample AFTER padding so chroma blocks align
        def sub(c):
            c = _pad_to(c, 8 * sv, 8 * sh)
            if sh > 1 or sv > 1:
                ph, pw = c.shape
                c = c.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            return c
        comps = [(1, (sh, sv), 0), (2, (1, 1), 1), (3, (1, 1), 1)]
        planes = {1: yp, 2: sub(cb), 3: sub(cr)}

    # quantized zig-zag blocks per component, raster block order
    zz = {}
    for cid, _, tq in comps:
        qt = qlum if tq == 0 else qchr
        zz[cid] = _fdct_quant(_blocks(planes[cid] - 128.0), qt)

    # ---- headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qlum), (1, qchr)) if not gray else ((0, qlum),):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(x) for x in qt[ZIGZAG]
        )
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, (csh, csv), tq in comps:
        out += bytes([cid, (csh << 4) | csv, tq])
    # DHT
    tables = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if not gray:
        tables += [(0x01, DC_CHR), (0x11, AC_CHR)]
    for tclass, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tclass])
        out += bytes(bits) + bytes(vals)
    if interleaved or gray:
        # SOS
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
        for cid, _, tq in comps:
            out += bytes([cid, 0x00 if tq == 0 else 0x11])
        out += b"\x00\x3f\x00"

        # ---- entropy-coded MCU stream
        bw = _BitWriter()
        ph, pw = planes[1].shape
        mcu_rows, mcu_cols = ph // (8 * sv), pw // (8 * sh)
        ybpr = pw // 8  # luma blocks per row
        preds = {cid: 0 for cid, _, _ in comps}
        for mr in range(mcu_rows):
            for mc in range(mcu_cols):
                for v in range(sv):
                    for hh in range(sh):
                        bi = (mr * sv + v) * ybpr + (mc * sh + hh)
                        preds[1] = _encode_block(bw, zz[1][bi], dc_l, ac_l, preds[1])
                if not gray:
                    cbpr = planes[2].shape[1] // 8
                    bi = mr * cbpr + mc
                    preds[2] = _encode_block(bw, zz[2][bi], dc_c, ac_c, preds[2])
                    preds[3] = _encode_block(bw, zz[3][bi], dc_c, ac_c, preds[3])
        bw.flush()
        out += bw.out
    else:
        # one SOS per component; each walks its UNPADDED block grid
        # (cw × ch) raster-order — the layout the decoder's
        # _decode_baseline_noninterleaved branch consumes
        hmax, vmax = sh, sv
        for cid, (csh, csv), tq in comps:
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += bytes([cid, 0x00 if tq == 0 else 0x11])
            out += b"\x00\x3f\x00"
            cw = ((w * csh + hmax - 1) // hmax + 7) // 8
            ch = ((h * csv + vmax - 1) // vmax + 7) // 8
            bpr = planes[cid].shape[1] // 8  # padded blocks per row
            dc, ac = (dc_l, ac_l) if tq == 0 else (dc_c, ac_c)
            bw = _BitWriter()
            pred = 0
            for r in range(ch):
                for col in range(cw):
                    pred = _encode_block(bw, zz[cid][r * bpr + col], dc, ac, pred)
            bw.flush()
            out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy-coded data into restart-interval
    segments with 0xFF00 stuffing removed, using C-speed ``bytes.find``
    — one linear pass so the per-symbol hot loop never inspects
    markers. Stops at the first non-RST marker (EOI or the next
    segment header — progressive streams interleave many scans); 0xFF
    fill bytes before a marker are skipped per T.81 B.1.1.2. Returns
    ``(segments, end)`` where ``end`` indexes the terminating marker's
    0xFF (or ``len(data)``) so the caller's marker walk can resume."""
    segs: list[bytes] = []
    parts: list[bytes] = []
    n = len(data)
    p = pos
    end = n
    while True:
        q = data.find(b"\xff", p)
        if q < 0:
            parts.append(data[p:n])
            break
        nxt = data[q + 1] if q + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed data byte: keep the 0xFF, drop the 0x00
            parts.append(data[p : q + 1])
            p = q + 2
        elif nxt == 0xFF:  # fill byte before a marker
            parts.append(data[p:q])
            p = q + 1
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: close this segment, open the next
            parts.append(data[p:q])
            segs.append(b"".join(parts))
            parts = []
            p = q + 2
        else:  # any other marker ends the scan
            parts.append(data[p:q])
            end = q
            break
    segs.append(b"".join(parts))
    return segs, end


class _EntropyReader:
    """MSB-first bit reader over one pre-unstuffed entropy segment.
    Bits past the end of the segment read as 1s (T.81 F.2.2.5 pad)."""

    __slots__ = ("buf", "n", "pos", "acc", "cnt")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.n = len(buf)
        self.pos = 0
        self.acc = 0
        self.cnt = 0

    def peek16(self) -> int:
        while self.cnt < 16:
            b = self.buf[self.pos] if self.pos < self.n else 0xFF
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.cnt += 8
        return (self.acc >> (self.cnt - 16)) & 0xFFFF

    def skip(self, nb: int) -> None:
        self.cnt -= nb
        self.acc &= (1 << self.cnt) - 1

    def get(self, nb: int) -> int:
        while self.cnt < nb:
            b = self.buf[self.pos] if self.pos < self.n else 0xFF
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.cnt += 8
        self.cnt -= nb
        v = (self.acc >> self.cnt) & ((1 << nb) - 1)
        self.acc &= (1 << self.cnt) - 1
        return v


class _HuffTable:
    """Canonical Huffman decode via a peek-16 LUT (the libjpeg scheme):
    ``lut[next_16_bits] = (symbol << 5) | code_length``, 0 = invalid.
    One symbol costs a list index + a bit-skip instead of up to 16
    single-bit reads — ~6× on the whole-image decode."""

    __slots__ = ("lut",)

    def __init__(self, bits, vals):
        lut = np.zeros(1 << 16, np.uint16)
        code = 0
        i = 0
        for length in range(1, 17):
            span = 1 << (16 - length)
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                lut[lo : lo + span] = (vals[i] << 5) | length
                code += 1
                i += 1
            code <<= 1
        # Python list: indexing yields plain ints (no numpy-scalar tax)
        self.lut = lut.tolist()

    def decode(self, br: _EntropyReader) -> int:
        e = self.lut[br.peek16()]
        if e == 0:
            raise ImageDecodeError("bad Huffman code")
        br.skip(e & 31)
        return e >> 5


# LUT construction costs ~0.6 ms/table (65,536-entry fill), which
# measured at ~40% of a small MJPEG frame's whole decode — and every
# frame of a clip (and most web JPEGs) carries the SAME four Annex-K
# tables. Memoize on the raw (bits, vals) spec; bounded so adversarial
# streams with thousands of distinct tables can't grow worker memory.
_HUFF_CACHE: dict = {}
_HUFF_CACHE_MAX = 256


def _huff_table(bits, vals) -> _HuffTable:
    key = (bytes(bits), bytes(vals))
    t = _HUFF_CACHE.get(key)
    if t is None:
        if len(_HUFF_CACHE) >= _HUFF_CACHE_MAX:
            _HUFF_CACHE.clear()
        t = _HuffTable(bits, vals)
        _HUFF_CACHE[key] = t
    return t


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _upsample2_triangular(p: np.ndarray, axis: int) -> np.ndarray:
    """2× upsample along ``axis`` with 3:1 triangular weights."""
    if axis == 1:
        p = p.T
    prev = np.vstack([p[:1], p[:-1]])
    nxt = np.vstack([p[1:], p[-1:]])
    out = np.empty((p.shape[0] * 2, p.shape[1]), p.dtype)
    out[0::2] = (3.0 * p + prev) / 4.0
    out[1::2] = (3.0 * p + nxt) / 4.0
    return out.T if axis == 1 else out


def _decode_baseline_scan(segs, scan_comps, huff, ri, mcu_rows, mcu_cols):
    """One interleaved sequential (SOF0/1) scan: DC diff + full AC
    spectrum per block, components interleaved per MCU (T.81 F.2)."""
    seg_i = 0
    br = _EntropyReader(segs[0])
    for c in scan_comps:
        c["pred"] = 0
        if huff.get(c["td"]) is None or huff.get(0x10 | c["ta"]) is None:
            raise ImageDecodeError("missing Huffman table")
    for m in range(mcu_rows * mcu_cols):
        if ri and m and m % ri == 0:
            seg_i += 1
            br = _EntropyReader(segs[seg_i] if seg_i < len(segs) else b"")
            for c in scan_comps:
                c["pred"] = 0
        mr, mc = divmod(m, mcu_cols)
        for c in scan_comps:
            dct = huff[c["td"]]
            act = huff[0x10 | c["ta"]]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    blk = c["coef"][(mr * c["v"] + v) * c["bw"] + mc * c["h"] + hh]
                    s = dct.decode(br)
                    c["pred"] += _extend(br.get(s), s) if s else 0
                    blk[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = act.decode(br)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ImageDecodeError("AC run past block end")
                        blk[k] = _extend(br.get(s), s)
                        k += 1


def _decode_baseline_noninterleaved(segs, c, huff, ri):
    """One NON-interleaved sequential scan (T.81 allows Ns=1 per scan
    for SOF0 too — some encoders emit Y, Cb, Cr as three scans): the
    MCU is a single data unit and the scan walks the component's
    UNPADDED block grid (cw × ch) in raster order, restart interval
    counted in blocks."""
    dct = huff.get(c["td"])
    act = huff.get(0x10 | c["ta"])
    if dct is None or act is None:
        raise ImageDecodeError("missing Huffman table")
    seg_i = 0
    br = _EntropyReader(segs[0])
    pred = 0
    for m in range(c["ch"] * c["cw"]):
        if ri and m and m % ri == 0:
            seg_i += 1
            br = _EntropyReader(segs[seg_i] if seg_i < len(segs) else b"")
            pred = 0
        r, col = divmod(m, c["cw"])
        blk = c["coef"][r * c["bw"] + col]
        s = dct.decode(br)
        pred += _extend(br.get(s), s) if s else 0
        blk[0] = pred
        k = 1
        while k < 64:
            rs = act.decode(br)
            r2, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r2 == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += r2
            if k > 63:
                raise ImageDecodeError("AC run past block end")
            blk[k] = _extend(br.get(s), s)
            k += 1


def _decode_dc_scan(segs, scan_comps, huff, ah, al, ri, mcu_rows, mcu_cols):
    """Progressive DC scan (T.81 G.1.2.1). First pass (``ah == 0``)
    decodes the usual DC differences scaled by ``<< al``; refinement
    passes read one raw bit per block into bit ``al``. Interleaved when
    the scan lists >1 component; a single-component scan walks only
    that component's unpadded block grid."""
    seg_i = 0
    br = _EntropyReader(segs[0])
    for c in scan_comps:
        c["pred"] = 0
        if ah == 0 and huff.get(c["td"]) is None:
            raise ImageDecodeError("missing Huffman table")
    interleaved = len(scan_comps) > 1
    if interleaved:
        units = mcu_rows * mcu_cols
    else:
        units = scan_comps[0]["cw"] * scan_comps[0]["ch"]
    for m in range(units):
        if ri and m and m % ri == 0:
            seg_i += 1
            br = _EntropyReader(segs[seg_i] if seg_i < len(segs) else b"")
            for c in scan_comps:
                c["pred"] = 0
        if interleaved:
            mr, mc = divmod(m, mcu_cols)
            for c in scan_comps:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = c["coef"][
                            (mr * c["v"] + v) * c["bw"] + mc * c["h"] + hh
                        ]
                        _dc_unit(br, c, blk, huff, ah, al)
        else:
            c = scan_comps[0]
            row, col = divmod(m, c["cw"])
            _dc_unit(br, c, c["coef"][row * c["bw"] + col], huff, ah, al)


def _dc_unit(br, c, blk, huff, ah, al):
    if ah == 0:
        s = huff[c["td"]].decode(br)
        c["pred"] += _extend(br.get(s), s) if s else 0
        blk[0] = c["pred"] << al
    elif br.get(1):
        blk[0] |= 1 << al


def _decode_ac_scan(segs, c, act, ss, se, ah, al, ri):
    """Progressive AC scan over one component's spectral band
    [ss, se] (T.81 G.1.2.2/G.1.2.3): EOB-run codes amortize trailing
    zeros across whole blocks; refinement passes append one
    correction bit per already-nonzero coefficient."""
    seg_i = 0
    br = _EntropyReader(segs[0])
    eobrun = 0
    for m in range(c["cw"] * c["ch"]):
        if ri and m and m % ri == 0:
            seg_i += 1
            br = _EntropyReader(segs[seg_i] if seg_i < len(segs) else b"")
            eobrun = 0
        row, col = divmod(m, c["cw"])
        blk = c["coef"][row * c["bw"] + col]
        if ah == 0:
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = act.decode(br)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1  # this block's EOB + r extra
                    if r:
                        eobrun += br.get(r)
                    break
                k += r
                if k > se:
                    raise ImageDecodeError("AC run past band end")
                blk[k] = _extend(br.get(s), s) << al
                k += 1
        else:
            eobrun = _ac_refine_block(br, act, blk, ss, se, al, eobrun)


def _ac_refine_block(br, act, blk, ss, se, al, eobrun):
    """Successive-approximation AC refinement for one block — the
    T.81 G.1.2.3 control flow: newly-significant coefficients arrive
    as ±(1 << al); every already-nonzero coefficient crossed on the
    way (including the EOB-run sweep) consumes one correction bit."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.get(r)
                    break  # rest of band handled by the EOB sweep below
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                val = p1 if br.get(1) else m1
            while k <= se:
                coefp = int(blk[k])
                if coefp != 0:
                    if br.get(1) and (coefp & p1) == 0:
                        blk[k] = coefp + (p1 if coefp >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun:
        while k <= se:
            coefp = int(blk[k])
            if coefp != 0 and br.get(1) and (coefp & p1) == 0:
                blk[k] = coefp + (p1 if coefp >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JFIF/JPEG bytes → (H, W, C) uint8,
    C=1 or 3 (RGB)."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error, ValueError) as e:
        if isinstance(e, ImageDecodeError):
            raise
        # truncated segments / short tables surface as the typed error
        # so the UDFs' per-row fault isolation catches them uniformly
        raise ImageDecodeError(f"truncated/malformed JPEG: {e}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ImageDecodeError("not a JPEG stream (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[int, _HuffTable] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    progressive = False
    mcu_rows = mcu_cols = 0
    hmax = vmax = 1
    got_scan = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT, possibly several tables
            b = body
            while b:
                prec, tid = b[0] >> 4, b[0] & 0x0F
                n = 64 * (2 if prec else 1)
                raw = b[1 : 1 + n]
                t = (
                    np.frombuffer(raw, ">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(raw, np.uint8).astype(np.int64)
                )
                qtabs[tid] = t[UNZIGZAG]  # store raster order
                b = b[1 + n :]
        elif marker == 0xC4:  # DHT, possibly several tables
            b = body
            while b:
                tc, th = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17 : 17 + n])
                huff[(tc << 4) | th] = _huff_table(bits, vals)
                b = b[17 + n :]
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential or progressive SOF
            progressive = marker == 0xC2
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ImageDecodeError(f"unsupported sample precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
                raise ImageDecodeError("bad sampling factors")
            mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)
            mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["bw"] = mcu_cols * c["h"]  # MCU-padded blocks per row
                c["bh"] = mcu_rows * c["v"]
                # unpadded block grid — what a non-interleaved scan walks
                c["cw"] = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
                c["ch"] = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageDecodeError(
                f"unsupported JPEG mode (SOF{marker - 0xC0}): "
                "Huffman sequential/progressive only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — decode this scan, then keep walking
            if comps is None:
                raise ImageDecodeError("SOS before SOF")
            by_id = {c["id"]: c for c in comps}
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                c = by_id.get(cs)
                if c is None:
                    raise ImageDecodeError("scan references unknown component")
                c["td"], c["ta"] = tt >> 4, tt & 0x0F
                scan_comps.append(c)
            ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            segs, pos = _entropy_segments(data, pos + 2 + seglen)
            if not progressive:
                if len(scan_comps) == 1 and len(comps) > 1:
                    # non-interleaved sequential: one component per
                    # scan, walked over its own unpadded block grid
                    _decode_baseline_noninterleaved(
                        segs, scan_comps[0], huff, restart_interval
                    )
                elif len(scan_comps) != len(comps):
                    # partial multi-component interleaves (1 < Ns < Nf)
                    # are spec-legal but unseen in the wild; typed error
                    raise ImageDecodeError(
                        "sequential scan must cover all components or one"
                    )
                else:
                    _decode_baseline_scan(
                        segs, scan_comps, huff, restart_interval,
                        mcu_rows, mcu_cols,
                    )
            elif ss == 0:  # DC scan (se must be 0 per G.1.1.1.1)
                if se != 0:
                    raise ImageDecodeError("progressive DC scan with Se != 0")
                _decode_dc_scan(
                    segs, scan_comps, huff, ah, al,
                    restart_interval, mcu_rows, mcu_cols,
                )
            else:  # AC band scan: always a single component
                if len(scan_comps) != 1 or se > 63 or ss > se:
                    raise ImageDecodeError("bad progressive AC scan header")
                c = scan_comps[0]
                act = huff.get(0x10 | c["ta"])
                if act is None:
                    raise ImageDecodeError("missing Huffman table")
                _decode_ac_scan(segs, c, act, ss, se, ah, al, restart_interval)
            got_scan = True
            continue  # pos already at the terminating marker's 0xFF
        pos += 2 + seglen
    if comps is None or not got_scan or not qtabs:
        raise ImageDecodeError("missing SOF/SOS/DQT")
    for c in comps:
        if c["tq"] not in qtabs:
            raise ImageDecodeError("missing quant table")

    # dequantize + IDCT, vectorized per component
    out_planes = []
    for c in comps:
        qt = qtabs[c["tq"]]
        coef = np.zeros_like(c["coef"], dtype=np.float64)
        coef[:, ZIGZAG] = c["coef"]  # zig-zag order → raster
        coef *= qt.reshape(1, 64)
        blocks = DCT_M.T @ coef.reshape(-1, 8, 8) @ DCT_M
        bh, bw_ = c["bh"], c["bw"]
        plane = (
            blocks.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        ) + 128.0
        # upsample to the full MCU grid, then crop to (h, w). For the
        # ubiquitous 2× ratios use triangular ("fancy") interpolation
        # — out[2i] = (3·s[i] + s[i−1])/4, out[2i+1] = (3·s[i] +
        # s[i+1])/4 with edge clamp, libjpeg's h2v1/h2v2 filter — so
        # sharp chroma edges land within rounding of mainstream
        # decoders; other ratios fall back to sample replication.
        ry, rx = vmax // c["v"], hmax // c["h"]
        for axis, r in ((0, ry), (1, rx)):
            if r == 2:
                plane = _upsample2_triangular(plane, axis)
            elif r > 1:
                plane = plane.repeat(r, axis=axis)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[..., None]
    if len(out_planes) != 3:
        raise ImageDecodeError(f"unsupported component count {len(out_planes)}")
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
