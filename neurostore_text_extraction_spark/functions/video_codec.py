"""From-scratch AVI / Motion-JPEG container codec — stdlib + numpy.

Completes the multimodal decode triad (image_codec: PNG/BMP/GIF/JPEG,
audio_codec: RIFF/PCM WAV): AVI is the same RIFF chunk grammar the WAV
parser walks, and MJPEG frames are plain baseline JPEGs decoded by
:mod:`.jpeg_codec` — so video frame-sampling (the task brief's
"decode / frame-sample as UDFs over mapInPandas") runs for real with
no ffmpeg.

Scope: AVI 1.0 ('RIFF…AVI ') with one MJPG/JPEG video stream
('00dc'/'00db' chunks in LIST movi, frames optionally nested in
LIST rec chunks). Inter-frame-compressed codecs (H.264/VP9/MPEG-4)
are out of from-scratch scope and raise :class:`VideoDecodeError`,
surfacing as ``decode_error`` rows upstream.

Layout constants are from the public AVI RIFF spec (Microsoft
"AVI RIFF File Reference": avih 56-byte main header, strh 56-byte
stream header, strf = BITMAPINFOHEADER).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from .jpeg_codec import decode_jpeg, encode_jpeg


class VideoDecodeError(ValueError):
    """Malformed/unsupported video container (row-isolated upstream)."""


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _list(form: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", form + body)


def encode_avi_mjpeg(
    frames, fps: int = 25, quality: int = 85, subsample: str = "4:2:0"
) -> bytes:
    """Serialize frames ((H, W)[,1|3] uint8 arrays, or pre-encoded JPEG
    ``bytes``) into a single-stream MJPEG AVI."""
    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    jpegs = [
        f if isinstance(f, (bytes, bytearray)) else encode_jpeg(
            np.asarray(f), quality=quality, subsample=subsample
        )
        for f in frames
    ]
    first = decode_jpeg(jpegs[0])
    h, w = first.shape[:2]
    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # AVIF_HASINDEX
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, max(fps, 1), 0, n, max_bytes, 0, -1)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    idx = b""
    for j in jpegs:
        # idx1 offsets are measured from the 'movi' fourcc
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(j))
        movi_body += _chunk(b"00dc", bytes(j))
    movi = _chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run.
    ``end`` is clamped to the real buffer and a declared size is capped
    at the bytes actually present, so truncated files walk cleanly
    instead of handing oversized spans to the header parsers."""
    end = min(end, len(data))
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        yield fourcc, pos + 8, min(size, end - pos - 8)
        pos += 8 + size + (size % 2)


def iter_avi_frames(
    data: bytes, every_n: int = 1, max_frames: int | None = None
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield ``(frame_index, (H, W, C) uint8)`` for every ``every_n``-th
    video frame. Undecodable single frames are skipped (a torn frame
    must not kill the blob); a non-MJPEG stream raises
    :class:`VideoDecodeError` on the first frame."""
    meta = avi_metadata(data)  # validates container + codec
    if meta["codec"] not in ("MJPG", "JPEG", "jpeg", "mjpg", "dmb1"):
        raise VideoDecodeError(f"unsupported video codec {meta['codec']!r} (MJPEG only)")
    every_n = max(int(every_n), 1)
    emitted = 0
    idx = -1

    def _frame_chunks(lo: int, hi: int):
        """Depth-first: 'LIST rec ' groups expand IN PLACE, so frame
        order (and therefore frame_idx / every_n striding) follows the
        container's temporal order even when bare and rec-wrapped
        frames interleave."""
        for fourcc, start, size in _walk_chunks(data, lo, hi):
            if fourcc == b"LIST" and data[start : start + 4] == b"rec ":
                yield from _frame_chunks(start + 4, start + size)
            else:
                yield fourcc, start, size

    for fourcc, start, size in _frame_chunks(
        meta["_movi_start"], meta["_movi_end"]
    ):
        if fourcc[2:4] not in (b"dc", b"db"):
            continue
        idx += 1
        if idx % every_n:
            continue
        try:
            frame = decode_jpeg(data[start : start + size])
            if frame.size == 0:  # zero-dim SOF: torn, skip
                continue
        except (ValueError, struct.error, IndexError):
            # torn frame (ImageDecodeError is a ValueError; numpy
            # raises plain ValueError/IndexError on short buffers)
            # must not kill the blob
            continue
        yield idx, frame
        emitted += 1
        if max_frames is not None and emitted >= max_frames:
            return


def avi_metadata(data: bytes) -> dict:
    """Parse the AVI headers without decoding frames: codec fourcc,
    frame count/size/rate and the movi payload span."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise VideoDecodeError("not a RIFF/AVI stream")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    n_frames = width = height = 0
    us_per_frame = 0
    codec = ""
    movi = None
    for fourcc, start, size in _walk_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        form = data[start : start + 4]
        if form == b"movi":
            movi = (start + 4, start + size)
        elif form == b"hdrl":
            for f2, s2, z2 in _walk_chunks(data, start + 4, start + size):
                if f2 == b"avih" and z2 >= 40:
                    vals = struct.unpack("<10I", data[s2 : s2 + 40])
                    us_per_frame, n_frames, width, height = (
                        vals[0], vals[4], vals[8], vals[9]
                    )
                elif f2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    for f3, s3, z3 in _walk_chunks(data, s2 + 4, s2 + z2):
                        if f3 == b"strh" and z3 >= 8:
                            if data[s3 : s3 + 4] == b"vids":
                                codec = (
                                    data[s3 + 4 : s3 + 8].decode("latin-1").strip("\x00 ")
                                )
    if movi is None:
        raise VideoDecodeError("missing LIST movi chunk")
    fps = 1_000_000 / us_per_frame if us_per_frame else None
    return {
        "codec": codec or None,
        "n_frames": n_frames,
        "width": width,
        "height": height,
        "fps": round(fps, 3) if fps else None,
        "duration_ms": int(n_frames * us_per_frame // 1000) if us_per_frame else None,
        "_movi_start": movi[0],
        "_movi_end": movi[1],
    }
