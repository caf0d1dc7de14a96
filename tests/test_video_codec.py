"""AVI/MJPEG container codec (functions/video_codec.py) and the
video_stats / video_frames operators: header parse, frame-sampling
semantics, per-frame fidelity, bounded output, fault isolation."""

import struct

import numpy as np
import pytest

from neurostore_text_extraction_spark.functions.video_codec import (
    VideoDecodeError,
    avi_metadata,
    encode_avi_mjpeg,
    iter_avi_frames,
)


def _frames(n=5, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.stack(
            [
                128 + 80 * np.sin((yy + 8 * t) / 6.0),
                128 + 80 * np.cos((xx + 5 * t) / 7.0),
                np.full_like(yy, (40 * t) % 256, dtype=float),
            ],
            -1,
        ).astype(np.uint8)
        for t in range(n)
    ]


def test_metadata_and_full_decode():
    frames = _frames()
    avi = encode_avi_mjpeg(frames, fps=10, quality=90)
    m = avi_metadata(avi)
    assert (m["codec"], m["n_frames"], m["width"], m["height"]) == ("MJPG", 5, 48, 32)
    assert m["fps"] == 10.0 and m["duration_ms"] == 500
    got = list(iter_avi_frames(avi))
    assert [i for i, _ in got] == [0, 1, 2, 3, 4]
    for (_, f), orig in zip(got, frames):
        assert f.shape == orig.shape
        assert np.abs(f.astype(int) - orig.astype(int)).mean() < 4.0


def test_sampling_and_bounds():
    avi = encode_avi_mjpeg(_frames(7), fps=5)
    assert [i for i, _ in iter_avi_frames(avi, every_n=2)] == [0, 2, 4, 6]
    assert [i for i, _ in iter_avi_frames(avi, every_n=3)] == [0, 3, 6]
    assert [i for i, _ in iter_avi_frames(avi, max_frames=2)] == [0, 1]


def test_preencoded_jpeg_frames_accepted():
    from neurostore_text_extraction_spark.functions.jpeg_codec import encode_jpeg

    jpegs = [encode_jpeg(f, quality=85) for f in _frames(3)]
    avi = encode_avi_mjpeg(jpegs, fps=4)
    assert avi_metadata(avi)["n_frames"] == 3
    assert len(list(iter_avi_frames(avi))) == 3


def test_torn_frame_skipped_not_fatal():
    """One corrupt frame chunk must not kill the blob decode."""
    frames = _frames(3)
    avi = bytearray(encode_avi_mjpeg(frames, fps=5, quality=90))
    # corrupt the SECOND frame's JPEG payload (find its SOI after movi)
    movi = avi.index(b"movi")
    first = avi.index(b"00dc", movi)
    second = avi.index(b"00dc", first + 4)
    # zero everything after frame 1's SOI — no SOF/SOS markers survive
    avi[second + 10 : second + 200] = b"\x00" * 190
    got = list(iter_avi_frames(bytes(avi)))
    assert [i for i, _ in got] == [0, 2]


def test_malformed_and_non_mjpeg_raise():
    with pytest.raises(VideoDecodeError):
        avi_metadata(b"RIFF\x08\x00\x00\x00WAVEdata")
    with pytest.raises(VideoDecodeError):
        avi_metadata(b"not even riff")
    avi = bytearray(encode_avi_mjpeg(_frames(2), fps=5))
    strh = avi.index(b"vids")
    avi[strh + 4 : strh + 8] = b"H264"
    with pytest.raises(VideoDecodeError, match="MJPEG only"):
        list(iter_avi_frames(bytes(avi)))


def test_video_near_dup_pairs(spark):
    """A re-encoded copy (lower JPEG quality) shares frame aHashes
    with its source; an unrelated clip shares none."""
    from neurostore_text_extraction_spark.operators.multimodal import (
        video_near_dup_pairs,
    )

    frames = _frames(6)
    a = encode_avi_mjpeg(frames, fps=10, quality=92)
    b = encode_avi_mjpeg(frames, fps=10, quality=60)  # re-encoded copy
    other = [255 - f for f in frames]  # inverted → different hashes
    c = encode_avi_mjpeg(other, fps=10, quality=92)
    df = spark.createDataFrame(
        [("a", bytearray(a)), ("b", bytearray(b)), ("c", bytearray(c)),
         ("bad", bytearray(b"RIFFxxxxWAVE"))],
        "blob_id string, blob binary",
    )
    pairs = video_near_dup_pairs(df, min_overlap=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [("a", "b")]
    assert pairs[0]["overlap"] >= 0.5


def test_video_operators(spark):
    from neurostore_text_extraction_spark.functions.image_codec import ahash64
    from neurostore_text_extraction_spark.operators.multimodal import (
        video_frames,
        video_stats,
    )

    frames = _frames(6)
    avi = encode_avi_mjpeg(frames, fps=10, quality=90)
    df = spark.createDataFrame(
        [
            ("v", bytearray(avi)),
            ("junk", bytearray(b"RIFFxxxxWAVE")),
            ("nul", None),
        ],
        "blob_id string, blob binary",
    )
    stats = {r["blob_id"]: r for r in video_stats(df).collect()}
    assert stats["v"]["media_type"] == "video/x-msvideo"
    assert (stats["v"]["codec"], stats["v"]["n_frames"]) == ("MJPG", 6)
    assert stats["v"]["decode_error"] is None
    assert stats["junk"]["decode_error"] is not None
    assert stats["nul"]["decode_error"] == "null blob"

    rows = video_frames(df, every_n=2).collect()
    ok = sorted(
        (r["frame_idx"] for r in rows if r["blob_id"] == "v" and r["decode_error"] is None)
    )
    assert ok == [0, 2, 4]
    by_idx = {r["frame_idx"]: r for r in rows if r["blob_id"] == "v"}
    # per-frame aHash matches the library hash of the decoded frame
    from neurostore_text_extraction_spark.functions.video_codec import iter_avi_frames

    for idx, frame in iter_avi_frames(avi, every_n=2):
        assert by_idx[idx]["ahash"] == ahash64(frame)
        assert (by_idx[idx]["width"], by_idx[idx]["height"]) == (48, 32)
    # fault rows: one per undecodable blob
    assert sum(1 for r in rows if r["blob_id"] == "junk") == 1
    assert sum(1 for r in rows if r["blob_id"] == "nul") == 1


# ------------------------------- fault-isolation hardening (round 5)


def test_truncated_avi_is_typed_error_not_struct_error(spark):
    """Header parsers walk DECLARED chunk sizes; a file cut mid-header
    must surface as VideoDecodeError (→ decode_error row), never a raw
    struct.error that kills the Spark task."""
    from neurostore_text_extraction_spark.operators.multimodal import video_stats

    full = encode_avi_mjpeg(_frames(2), fps=5)
    for cut in (40, 60, 100, len(full) // 2):
        trunc = full[:cut]
        try:
            avi_metadata(trunc)
        except VideoDecodeError:
            pass  # typed failure is fine; silent partial parse is too
    df = spark.createDataFrame(
        [("t", bytearray(full[:40]))], "blob_id string, blob binary"
    )
    rows = video_stats(df).collect()
    assert len(rows) == 1  # one row, task alive


def test_all_frames_torn_emits_error_row(spark):
    """A parseable container whose every frame is corrupt must emit ONE
    'no decodable frames' row — not vanish from the output."""
    from neurostore_text_extraction_spark.operators.multimodal import video_frames

    avi = bytearray(encode_avi_mjpeg(_frames(2), fps=5, quality=90))
    movi = avi.index(b"movi")
    pos = movi
    while True:
        try:
            pos = avi.index(b"00dc", pos + 4)
        except ValueError:
            break
        if pos > avi.index(b"idx1") if b"idx1" in avi else False:
            break
        avi[pos + 10 : pos + 60] = b"\x00" * 50  # shred each payload head
    df = spark.createDataFrame(
        [("torn", bytearray(bytes(avi)))], "blob_id string, blob binary"
    )
    rows = video_frames(df).collect()
    assert len(rows) == 1
    assert rows[0]["decode_error"] == "no decodable frames"
    assert rows[0]["ahash"] is None


def test_shared_signature_pairs_denominator_over_cold_set(spark):
    """Two identical clips dominated by ubiquitous signatures (title
    cards / silence) must still pair: overlap's denominator counts the
    SAME hot-filtered set as the numerator, so cold_shared/cold_size =
    1.0, not cold_shared/full_size."""
    from neurostore_text_extraction_spark.operators.multimodal import (
        shared_signature_pairs,
    )

    rows = []
    # A and B: 8 hot sigs (shared with 10 other blobs each) + 2 cold
    for sig in range(8):
        for blob in ["A", "B"] + [f"x{i}" for i in range(10)]:
            rows.append((blob, sig))
    rows += [("A", 100), ("A", 101), ("B", 100), ("B", 101)]
    sig = spark.createDataFrame(rows, "blob_id string, s long")
    pairs = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in shared_signature_pairs(
            sig, "blob_id", "s", min_overlap=0.5, max_sig_df=5
        ).collect()
    }
    assert pairs[("A", "B")] == 1.0


def test_rec_list_frames_keep_temporal_order():
    """'LIST rec ' groups must expand IN PLACE: an interleaved layout
    [rec(f0,f1), f2, rec(f3)] yields frames 0,1,2,3 in temporal order,
    not BFS order 2,0,1,3."""
    from neurostore_text_extraction_spark.functions.video_codec import (
        _chunk,
        _list,
    )
    from neurostore_text_extraction_spark.functions.jpeg_codec import encode_jpeg

    frames = _frames(4)
    jpegs = [encode_jpeg(f, quality=90) for f in frames]
    base = bytearray(encode_avi_mjpeg(frames, fps=5, quality=90))
    # rebuild the movi body with mixed rec-wrapped and bare frames
    movi_body = (
        b"movi"
        + _list(b"rec ", _chunk(b"00dc", jpegs[0]) + _chunk(b"00dc", jpegs[1]))
        + _chunk(b"00dc", jpegs[2])
        + _list(b"rec ", _chunk(b"00dc", jpegs[3]))
    )
    movi_at = base.index(b"LIST", base.index(b"movi") - 8)
    import struct as _s

    new = bytes(base[:movi_at]) + _chunk(b"LIST", movi_body)
    # fix the RIFF size
    new = b"RIFF" + _s.pack("<I", len(new) - 8) + new[8:]
    got = list(iter_avi_frames(new))
    assert [i for i, _ in got] == [0, 1, 2, 3]
    for (idx, frame), orig in zip(got, frames):
        assert frame.shape == orig.shape
        # frame content must correspond to the SAME temporal frame
        assert abs(float(frame.astype(int).mean()) - float(orig.astype(int).mean())) < 3.0


def test_webp_riff_sniffed_as_image_not_wav():
    from neurostore_text_extraction_spark.operators.multimodal import (
        sniff_media_type,
    )
    import struct as _s

    webp = b"RIFF" + _s.pack("<I", 12) + b"WEBPVP8 " + b"\x00" * 8
    assert sniff_media_type(webp) == "image/webp"
    assert sniff_media_type(b"RIFF\x04\x00\x00\x00JUNK") == "application/octet-stream"
    wav = b"RIFF" + _s.pack("<I", 4) + b"WAVE"
    assert sniff_media_type(wav) == "audio/wav"


def test_video_frames_phash_and_brightness_robust_near_dup(spark):
    """Frames carry a phash column, exact vs the driver-side hash of
    the decoded frame, and hash_col='phash' drives the clip-overlap
    join end to end (pairing a brightness-edited re-encode of a
    textured clip; unrelated clips stay unpaired)."""
    from neurostore_text_extraction_spark.functions.image_codec import phash64
    from neurostore_text_extraction_spark.functions.jpeg_codec import decode_jpeg
    from neurostore_text_extraction_spark.operators.multimodal import (
        video_frames,
        video_near_dup_pairs,
    )

    frames = _frames(4)
    brighter = [np.clip(f.astype(int) + 30, 0, 255).astype(np.uint8) for f in frames]
    rng = np.random.RandomState(77)
    other = [rng.randint(0, 256, frames[0].shape, np.uint8) for _ in range(4)]
    df = spark.createDataFrame(
        [
            ("clip", bytearray(encode_avi_mjpeg(frames, fps=5, quality=92))),
            ("clip_bright", bytearray(encode_avi_mjpeg(brighter, fps=5, quality=92))),
            ("other", bytearray(encode_avi_mjpeg(other, fps=5, quality=92))),
        ],
        "blob_id string, blob binary",
    )
    fr = {(r["blob_id"], r["frame_idx"]): r for r in video_frames(df).collect()}
    # phash column matches the driver-side hash of the DECODED frame
    avi = bytes(encode_avi_mjpeg(frames, fps=5, quality=92))
    from neurostore_text_extraction_spark.functions.video_codec import (
        iter_avi_frames,
    )
    f0 = next(iter_avi_frames(avi))[1]
    assert fr[("clip", 0)]["phash"] == phash64(f0)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in video_near_dup_pairs(df, hash_col="phash", min_overlap=0.5).collect()
    }
    assert ("clip", "clip_bright") in pairs
    assert not any("other" in p for p in pairs)


def test_shared_signature_pairs_single_decode_pass(spark):
    """The signature source must be computed EXACTLY ONCE in eager
    mode: shared_signature_pairs fans the sig frame out to five
    different-key consumers (hot count, both self-join sides, two
    per-blob denominators), and when sig comes off a media-decode
    mapInPandas, recomputing it per consumer decodes every blob ~4-5x
    (the dominant cost of the audio/video near-dup queries). The
    eager persist pins decode to one pass; lazy mode documents the
    recompute hazard. Counted with an accumulator inside the same
    mapInPandas hop the real decode operators use."""
    import pandas as pd

    from neurostore_text_extraction_spark.operators.multimodal import (
        shared_signature_pairs,
    )

    rows = [("A", s) for s in range(6)] + [("B", s) for s in range(6)] + [
        ("C", s) for s in range(100, 106)
    ]
    base = spark.createDataFrame(rows, "blob_id string, s long")
    n_rows = len(rows)

    def run_with_counter(eager):
        acc = spark.sparkContext.accumulator(0)

        def fake_decode(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pdf

        sig = base.mapInPandas(fake_decode, "blob_id string, s long")
        out = sorted(
            tuple(r)
            for r in shared_signature_pairs(
                sig, "blob_id", "s", min_overlap=0.5, max_sig_df=50,
                eager=eager,
            ).collect()
        )
        return out, acc.value

    eager_pairs, eager_decodes = run_with_counter(eager=True)
    lazy_pairs, lazy_decodes = run_with_counter(eager=False)
    assert eager_pairs == lazy_pairs  # same result either way
    assert [p[:2] for p in eager_pairs] == [("A", "B")]
    assert eager_decodes == n_rows  # one pass, ever
    assert lazy_decodes >= 2 * n_rows  # the hazard eager exists to kill
