"""From-scratch image codecs for the multimodal column family
(VERDICT r4 next-round #1): PNG (stdlib ``zlib`` inflate + per-row
unfiltering, the same no-external-codec route the PDF branch takes for
Flate streams in ``functions/pdf_extract.py``), BMP (pure byte
format), and GIF (from-scratch LZW). Everything here is deterministic
pure-Python/numpy over ``bytes`` — no PIL/ffmpeg — so it runs
unchanged inside the Arrow-batched multimodal UDFs
(``operators/multimodal.py``) and its outputs are reproducible across
partitionings and cluster sizes.

Encoders exist for the same three formats so tests can build
deterministic fixtures and assert pixel-exact round-trips without any
binary test assets.

Supported surface (raise :class:`ImageDecodeError` outside it, so the
row-level fault isolation in the UDFs can catch and tag):

- PNG: bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); non-interlaced (Adam7 is a pre-shuffle of
  the same filters — unsupported, declared). CRCs verified.
- BMP: BITMAPINFOHEADER (or the 108/124-byte successors), 24-bit
  BI_RGB and 8-bit palette, bottom-up and top-down.
- GIF: GIF87a/GIF89a, first image frame, global or local palette,
  variable-width LZW, 4-pass interlace.

Perceptual hashes (aHash / dHash) live here too: grayscale → box-mean
downsample → 64-bit signatures, consumed by the Hamming-LSH pair
machinery in ``operators/dedup.py``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ImageDecodeError(ValueError):
    """Raised for malformed bytes or formats outside the declared
    decode surface — callers (the multimodal UDFs) catch this per row."""


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ImageDecodeError("png: truncated chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) == 4 and struct.unpack(">I", crc)[0] != (
            zlib.crc32(ctype + body) & 0xFFFFFFFF
        ):
            raise ImageDecodeError(f"png: bad crc in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo PNG row filters. Filters 0 (none) and 2 (up) vectorize
    across the row; 1 (sub) is a per-channel cumulative sum; 3
    (average) and 4 (paeth) are inherently sequential in x (the left
    neighbor is the RECONSTRUCTED byte) — a per-pixel loop, acceptable
    because it is bounded by image size inside an Arrow batch."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ImageDecodeError("png: idat too short")
    out = np.zeros((h, stride), dtype=np.uint16)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.uint16
        )
        if ftype == 0:
            rec = cur
        elif ftype == 1:  # sub: cumulative sum per channel phase
            rec = cur.reshape(w, bpp).cumsum(axis=0, dtype=np.uint64) & 0xFF
            rec = rec.reshape(stride).astype(np.uint16)
        elif ftype == 2:  # up
            rec = (cur + prev) & 0xFF
        elif ftype == 3:  # average
            rec = np.zeros(stride, dtype=np.uint16)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # paeth
            rec = np.zeros(stride, dtype=np.uint16)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ImageDecodeError(f"png: unknown filter {ftype}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ImageDecodeError("png: bad signature")
    w = h = None
    color_type = bit_depth = interlace = None
    plte = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if w is None:
        raise ImageDecodeError("png: no IHDR")
    if interlace:
        raise ImageDecodeError("png: Adam7 interlace unsupported")
    if bit_depth != 8:
        raise ImageDecodeError(f"png: bit depth {bit_depth} unsupported (8 only)")
    if color_type not in _PNG_CHANNELS:
        raise ImageDecodeError(f"png: color type {color_type} unsupported")
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # noqa: PERF203
        raise ImageDecodeError(f"png: inflate failed: {e}") from e
    px = _unfilter(raw, h, w, ch).reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ImageDecodeError("png: palette image without PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ImageDecodeError("png: palette index out of range")
        px = plte[idx]
    return np.ascontiguousarray(px)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    c = cur.astype(np.int32)
    p = prev.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), c[:-bpp]]) if len(c) > bpp else np.zeros_like(c)
    upleft = np.concatenate([np.zeros(bpp, np.int32), p[:-bpp]]) if len(p) > bpp else np.zeros_like(p)
    if ftype == 0:
        out = c
    elif ftype == 1:
        out = c - left
    elif ftype == 2:
        out = c - p
    elif ftype == 3:
        out = c - ((left + p) >> 1)
    elif ftype == 4:
        pr = left + p - upleft
        pa, pb, pc = np.abs(pr - left), np.abs(pr - p), np.abs(pr - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, upleft)
        )
        out = c - pred
    else:
        raise ValueError(f"bad filter {ftype}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int | str = 0) -> bytes:
    """Minimal PNG writer for fixtures: bit depth 8, color type from
    channel count (1→gray, 2→gray+alpha, 3→RGB, 4→RGBA).
    ``filter_type`` 0-4 applies that filter to every row; ``'mixed'``
    cycles through all five so a single fixture exercises every decode
    branch."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    arr = arr.astype(np.uint8)
    rows = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        cur = arr[y].reshape(-1)
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        rows.append(ft)
        rows.extend(_filter_row(ft, cur, prev, ch).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- BMP


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ImageDecodeError("bmp: bad signature")
    if len(data) < 54:
        raise ImageDecodeError("bmp: truncated header")
    (px_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ImageDecodeError(f"bmp: header size {hdr_size} unsupported")
    w, h_raw = struct.unpack("<ii", data[18:26])
    _planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise ImageDecodeError(f"bmp: compression {compression} unsupported (BI_RGB only)")
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ImageDecodeError("bmp: bad dimensions")
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        need = px_off + stride * h
        if len(data) < need:
            raise ImageDecodeError("bmp: truncated pixel data")
        rows = np.frombuffer(data, np.uint8, stride * h, px_off).reshape(h, stride)
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    elif bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data, np.uint8, n_colors * 4, pal_off).reshape(-1, 4)[
            :, [2, 1, 0]
        ]  # BGRA→RGB
        stride = (w + 3) & ~3
        if len(data) < px_off + stride * h:
            raise ImageDecodeError("bmp: truncated pixel data")
        idx = np.frombuffer(data, np.uint8, stride * h, px_off).reshape(h, stride)[
            :, :w
        ]
        if int(idx.max(initial=0)) >= len(pal):
            raise ImageDecodeError("bmp: palette index out of range")
        px = pal[idx]
    else:
        raise ImageDecodeError(f"bmp: {bpp}bpp unsupported (8/24 only)")
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up writer for fixtures."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_bmp wants HxWx3")
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = arr[y, :, ::-1].astype(np.uint8).tobytes()  # RGB→BGR
        body.extend(row)
        body.extend(b"\0" * (stride - len(row)))
    px_off = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", px_off + len(body), 0, 0, px_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + bytes(body)


# ---------------------------------------------------------------- GIF


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    # bit reader, LSB-first
    bitpos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return end  # treat truncation as end-of-stream
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 3], "little")
        val = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return val

    table: list[bytes] = []

    def reset_table():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset_table()
    prev: bytes | None = None
    while n_out < n_expected:
        code = read(width)
        if code == clear:
            reset_table()
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ImageDecodeError("gif: bad lzw code")
        take = min(len(entry), n_expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_expected:
        raise ImageDecodeError("gif: lzw stream short")
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageDecodeError("gif: bad signature")
    if len(data) < 13:
        raise ImageDecodeError("gif: truncated header")
    flags = data[10]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        global_pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _l, _t, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            iflags = data[pos + 9]
            pos += 10
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if pal is None:
                raise ImageDecodeError("gif: no palette")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                stream.extend(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(stream), min_code, w * h).reshape(h, w)
            if iflags & 0x40:  # 4-pass interlace: rows were written
                order = []  # in pass order; invert the permutation
                for start, step in _GIF_INTERLACE_PASSES:
                    order.extend(range(start, h, step))
                deinter = np.empty_like(idx)
                deinter[np.asarray(order)] = idx
                idx = deinter
            if int(idx.max(initial=0)) >= len(pal):
                raise ImageDecodeError("gif: palette index out of range")
            return np.ascontiguousarray(pal[idx])
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ImageDecodeError(f"gif: unknown block 0x{b0:02x}")
    raise ImageDecodeError("gif: no image block")


def encode_gif(
    idx: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """GIF87a writer for fixtures: index array (H,W) + palette (N,3).
    Emits literal LZW codes with a clear code before the table could
    force a width change — the classic 'uncompressed GIF' technique,
    so the writer needs no string table while the decoder exercises
    its real variable-width path (clear-code handling included)."""
    h, w = idx.shape
    n_pal = 1
    while (1 << n_pal) < len(palette):
        n_pal += 1
    n_pal = max(n_pal, 1)
    pal = np.zeros((1 << n_pal, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    min_code = max(2, n_pal)
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    if interlace:
        order = []
        for start, step in _GIF_INTERLACE_PASSES:
            order.extend(range(start, h, step))
        seq = idx[np.asarray(order)].reshape(-1)
    else:
        seq = idx.reshape(-1)
    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # after a clear the decoder's table has `end+1` entries; each
    # literal grows it by one — clear again before it hits 1<<width
    budget = (1 << width) - end - 2
    for i, v in enumerate(seq.astype(np.int64)):
        if i and i % max(budget, 1) == 0:
            emit(clear)
        emit(int(v))
    emit(end)
    if nbits:
        bits.append(acc & 0xFF)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n_pal - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ------------------------------------------------------- dispatch etc.


def decode_image(data: bytes) -> np.ndarray:
    """Decode PNG/BMP/GIF/JPEG bytes to an (H, W, C) uint8 array, C per
    the source format (PNG gray stays 1-channel; palette formats expand
    to RGB; JPEG gives RGB or 1-channel gray)."""
    try:
        if data[:8] == _PNG_SIG or data[:4] == b"\x89PNG":
            arr = decode_png(data)
        elif data[:2] == b"BM":
            arr = decode_bmp(data)
        elif data[:4] == b"GIF8":
            arr = decode_gif(data)
        elif data[:3] == b"\xff\xd8\xff":
            from .jpeg_codec import decode_jpeg  # lazy: avoids import cycle

            arr = decode_jpeg(data)
        else:
            raise ImageDecodeError(
                "unknown image format (PNG/BMP/GIF/JPEG supported)"
            )
    except ImageDecodeError:
        raise
    except (struct.error, IndexError, ValueError) as e:
        # malformed container bytes surface as the typed error so the
        # UDFs' per-row fault isolation catches them uniformly. The
        # ValueError arm matters: numpy raises plain ValueError on
        # short buffers / bad reshape (e.g. a PLTE chunk whose length
        # is not a multiple of 3, a GIF palette shorter than declared)
        raise ImageDecodeError(f"truncated/malformed image: {e}") from e
    if arr.size == 0:
        # w=0 / h=0 in a declared header decodes to an empty array that
        # would crash the downstream hashes (np.add.reduceat on an
        # empty axis) OUTSIDE the callers' per-row try — reject here
        raise ImageDecodeError("zero-dimension image")
    return arr


def to_gray(arr: np.ndarray) -> np.ndarray:
    """(H,W,C) uint8 → (H,W) float64 luma. 1/2 channels = gray(+alpha):
    take the gray plane; 3/4 = ITU-R 601 luma, alpha ignored."""
    if arr.ndim == 2:
        return arr.astype(np.float64)
    c = arr.shape[2]
    if c <= 2:
        return arr[:, :, 0].astype(np.float64)
    a = arr.astype(np.float64)
    return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]


def box_downsample(gray: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Box-mean resample to (th, tw) with integer bin edges
    (``i*H//th``). When the source is SMALLER than the target along an
    axis some bins are empty; those take the nearest source row/col
    (deterministic nearest-neighbor upsample)."""
    h, w = gray.shape
    re = (np.arange(th) * h) // th
    ce = (np.arange(tw) * w) // tw
    sums = np.add.reduceat(np.add.reduceat(gray, re, axis=0), ce, axis=1)
    rc = np.diff(np.append(re, h))
    cc = np.diff(np.append(ce, w))
    # an empty bin (upsampling along that axis) makes reduceat return
    # the single element AT the bin start — i.e. it behaves as count 1
    # along that axis, so clamp counts per axis, not on the product
    counts = np.outer(np.maximum(rc, 1), np.maximum(cc, 1))
    return sums / counts


def ahash64(arr: np.ndarray, gray: np.ndarray | None = None) -> int:
    """Average hash: gray → 8×8 box mean → bit i (row-major, LSB
    first) set iff pixel > mean. Returned as a SIGNED 64-bit int
    (bit 63 → negative) to match Spark's LongType. Pass a precomputed
    ``gray`` plane to share the luma conversion across hashes."""
    g = box_downsample(to_gray(arr) if gray is None else gray, 8, 8).reshape(-1)
    m = g.mean()
    bits = g > m
    v = 0
    for i in range(64):
        if bits[i]:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v


def dhash64(arr: np.ndarray, gray: np.ndarray | None = None) -> int:
    """Difference hash: gray → 8×9 box mean → bit (r*8+c) set iff
    px[r,c] > px[r,c+1]. Signed 64-bit like :func:`ahash64`."""
    g = box_downsample(to_gray(arr) if gray is None else gray, 8, 9)
    bits = (g[:, :-1] > g[:, 1:]).reshape(-1)
    v = 0
    for i in range(64):
        if bits[i]:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (type-II, norm='ortho' — same transform
    the JPEG codec uses, sized for the hash)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    c[0] /= np.sqrt(2.0)
    return c


_PHASH_DCT32 = _dct_matrix(32)


def phash64(arr: np.ndarray, gray: np.ndarray | None = None) -> int:
    """Perceptual (DCT) hash: gray → 32×32 box mean → 2-D orthonormal
    DCT-II → top-left 8×8 low-frequency block → bit i (row-major, LSB
    first) set iff coefficient > the block's median. The standard
    pHash construction (imagehash/pHash.org, public): affine edits
    px → a·px + b scale the AC coefficients uniformly and shift only
    DC, so the > median bits survive brightness/contrast changes, and
    the low-frequency basis shrugs off recompression ringing and
    sharpening that perturb pixel-domain hashes. Complementary to
    aHash/dHash, not strictly stronger: on SPECTRALLY SPARSE images
    (flat logos, screenshots) most of the 8×8 block is ~0, the median
    splits a cluster of near-identical values, and re-encode noise can
    flip many bits where the mean-relative aHash stays exact — measured
    on real photos pHash is Hamming-0 under brightness+re-encode, on
    pure-sinusoid synthetics it is not. Use both columns; exact-match
    candidate generation should default to aHash. Signed 64-bit like
    :func:`ahash64`."""
    g = box_downsample(to_gray(arr) if gray is None else gray, 32, 32)
    d = _PHASH_DCT32 @ g @ _PHASH_DCT32.T
    low = d[:8, :8].reshape(-1)
    # relative dead-zone around the median: flat/separable images (web
    # logos, screenshots) put many coefficients at EXACTLY 0, where a
    # bare > median comparison flips bits on 1e-15 float jitter between
    # otherwise-identical renders; anything within eps of the median
    # deterministically reads as 0
    eps = 1e-9 * max(1.0, float(np.abs(low).max()))
    bits = (low - np.median(low)) > eps
    v = 0
    for i in range(64):
        if bits[i]:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v
