"""From-scratch WAV/PCM codec (functions/audio_codec.py) and the
audio_stats operator: roundtrip exactness across depths/channels,
chunk-walking robustness, feature math vs a numpy reference, and
row-level fault isolation in the Arrow stage."""

import struct

import numpy as np
import pytest

from neurostore_text_extraction_spark.functions.audio_codec import (
    AudioDecodeError,
    audio_features,
    decode_wav,
    encode_wav,
)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_exact(bits, channels):
    rng = np.random.default_rng(bits * 10 + channels)
    n = 777
    if bits == 8:
        samples = rng.integers(0, 256, (n, channels))
    else:
        lim = 2 ** (bits - 1)
        samples = rng.integers(-lim, lim, (n, channels))
    data = encode_wav(samples, 8000, bits=bits)
    out, rate, got_bits = decode_wav(data)
    assert (rate, got_bits) == (8000, bits)
    assert out.shape == (n, channels)
    assert np.array_equal(out, samples)


def test_mono_1d_input_and_odd_data_padding():
    # odd-length data chunk (8-bit, odd n) exercises RIFF word padding
    data = encode_wav(np.array([0, 255, 128], np.uint8), 44100, bits=8)
    assert len(data) % 2 == 0
    out, rate, bits = decode_wav(data)
    assert out[:, 0].tolist() == [0, 255, 128] and (rate, bits) == (44100, 8)


def test_metadata_chunks_before_data_are_skipped():
    """Real-world WAVs carry LIST/fact chunks between fmt and data —
    the parser must walk, not assume data follows fmt directly."""
    wav = encode_wav(np.array([1, -1, 2], np.int16), 16000, bits=16)
    fmt_at = wav.index(b"fmt ")
    fmt_chunk = wav[fmt_at : fmt_at + 8 + 16]
    data_at = wav.index(b"data")
    data_chunk = wav[data_at:]
    info = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
    body = b"WAVE" + fmt_chunk + info + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate, bits = decode_wav(rebuilt)
    assert out[:, 0].tolist() == [1, -1, 2]


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"RIFF",
        b"RIFF\x10\x00\x00\x00JUNK",
        b"\x89PNG not audio",
        # fmt present but non-PCM (tag 3 = float)
        b"RIFF" + struct.pack("<I", 28) + b"WAVE" + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 3, 1, 8000, 8000, 1, 8),
    ],
)
def test_malformed_raises_decode_error(blob):
    with pytest.raises(AudioDecodeError):
        decode_wav(blob)


def test_features_match_numpy_reference():
    # 8-bit: centered at 128; crossings are strict sign flips
    s = np.array([100, 200, 128, 50, 250, 10], np.uint8)
    f = audio_features(s[:, None].astype(np.int32), 8000, 8)
    assert f["sample_sum"] == int(s.sum())
    c = s.astype(int) - 128
    assert f["zero_crossings"] == int(np.count_nonzero(c[:-1] * c[1:] < 0))
    assert f["peak"] == int(np.abs(c).max())
    assert f["duration_ms"] == 6 * 1000 // 8000
    assert f["rms"] == pytest.approx(float(np.sqrt(np.mean(c.astype(float) ** 2))))
    # stereo mixdown: per-frame channel mean
    st = np.array([[0, 200], [255, 255]], np.int32)
    f2 = audio_features(st, 8000, 8)
    assert f2["sample_sum"] == 100 + 255
    assert f2["channels"] == 2


def test_audio_stats_operator_and_fault_isolation(spark):
    from neurostore_text_extraction_spark.operators.multimodal import audio_stats

    good = encode_wav(np.array([100, 200, 50], np.uint8), 8000, bits=8)
    rows = [
        ("ok", bytearray(good)),
        ("garbage", bytearray(b"not a wav at all")),
        ("null", None),
        ("png", bytearray(b"\x89PNG\r\n\x1a\n....")),
    ]
    df = spark.createDataFrame(rows, "blob_id string, blob binary")
    got = {r["blob_id"]: r for r in audio_stats(df).collect()}
    ok = got["ok"]
    assert ok["decode_error"] is None
    assert ok["media_type"] == "audio/wav"
    assert (ok["sample_rate"], ok["bits"], ok["n_samples"]) == (8000, 8, 3)
    assert ok["sample_sum"] == 350
    assert ok["zero_crossings"] == 2  # (100-128)(200-128)<0, (200-128)(50-128)<0
    for bad in ("garbage", "null", "png"):
        assert got[bad]["decode_error"] is not None
        assert got[bad]["sample_sum"] is None


# --------------------------------------------- fingerprints (round 5)


def _clip(seed, seconds=3.0, sr=8000, freqs=(440.0, 880.0)):
    """Deterministic synthetic 'song': tone mixture + seeded noise."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(sr * seconds)) / sr
    sig = sum(
        (9000 / (i + 1)) * np.sin(2 * np.pi * f * t * (1 + 0.05 * np.sin(2 * np.pi * 0.5 * t)))
        for i, f in enumerate(freqs)
    ) + 1200 * rng.randn(len(t))
    return np.clip(sig, -32768, 32767).astype(np.int32)[:, None]


def _fp_overlap(a, b):
    sa, sb = set(a.tolist()), set(b.tolist())
    return len(sa & sb) / min(len(sa), len(sb))


def test_audio_fingerprint_haitsma_kalker_properties():
    from neurostore_text_extraction_spark.functions.audio_codec import (
        audio_fingerprint,
    )

    base = _clip(7)
    fp = audio_fingerprint(base, 8000, 16)
    # 3 s at 100 ms frames / 50 ms hop → 59 windows → 58 subfingerprints
    assert len(fp) == 58
    assert fp.min() >= 0 and fp.max() < 2**32
    # sign-of-energy-difference bits are EXACTLY volume-invariant
    scaled = (base * 0.55).astype(np.int32)
    assert np.array_equal(fp, audio_fingerprint(scaled, 8000, 16))
    # 8-bit requantization (re-encode) keeps a large shared fraction
    q8 = ((base >> 8) + 128).astype(np.int32)
    assert _fp_overlap(fp, audio_fingerprint(q8, 8000, 8)) >= 0.4
    # unrelated content shares ~nothing
    other = _clip(99, freqs=(613.0, 1290.0))
    assert _fp_overlap(fp, audio_fingerprint(other, 8000, 16)) <= 0.05
    # max_frames bounds output; short clips yield empty, never raise
    assert len(audio_fingerprint(base, 8000, 16, max_frames=10)) == 10
    assert len(audio_fingerprint(base[:100], 8000, 16)) == 0


def test_audio_fingerprints_operator_and_near_dup_pairs(spark):
    from neurostore_text_extraction_spark.functions.audio_codec import (
        audio_fingerprint,
    )
    from neurostore_text_extraction_spark.operators.multimodal import (
        audio_fingerprints,
        audio_near_dup_pairs,
    )

    base = _clip(7)
    vol = (base * 0.7).astype(np.int32)
    other = _clip(99, freqs=(613.0, 1290.0))
    rows = [
        ("song", bytearray(encode_wav(base, 8000, bits=16))),
        ("song_loud", bytearray(encode_wav(vol, 8000, bits=16))),
        ("other", bytearray(encode_wav(other, 8000, bits=16))),
        ("garbage", bytearray(b"not audio")),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "blob_id string, blob binary")
    fps = audio_fingerprints(df).collect()
    by_id = {}
    for r in fps:
        by_id.setdefault(r["blob_id"], []).append(r)
    song = sorted(by_id["song"], key=lambda r: r["frame_idx"])
    expect = audio_fingerprint(base, 8000, 16, max_frames=512)
    assert [r["fp"] for r in song] == expect.tolist()
    assert all(r["decode_error"] is None for r in song)
    assert by_id["garbage"][0]["decode_error"] is not None
    assert by_id["null"][0]["decode_error"] == "null blob"

    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in audio_near_dup_pairs(df).collect()
    }
    assert ("song", "song_loud") in pairs
    p = pairs[("song", "song_loud")]
    assert p["overlap"] == 1.0 and p["shared_fps"] == 58
    assert not any("other" in k or "garbage" in k for k in pairs)


def test_audio_near_dup_hot_fp_anti_join(spark):
    """A subfingerprint ubiquitous across > max_fp_df blobs (silence /
    shared jingle) must not create pairs by itself: hot signatures are
    anti-joined away before the self-join."""
    from neurostore_text_extraction_spark.operators.multimodal import (
        audio_near_dup_pairs,
    )

    silence = np.zeros((8000 * 2, 1), np.int32)  # all-equal frames → 1 fp value
    rows = [
        (f"s{i}", bytearray(encode_wav(silence, 8000, bits=16))) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "blob_id string, blob binary")
    assert audio_near_dup_pairs(df, max_fp_df=3).count() == 0
    # under the cap the same corpus pairs freely
    assert audio_near_dup_pairs(df, max_fp_df=50).count() == 15
