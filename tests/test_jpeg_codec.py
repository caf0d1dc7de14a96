"""From-scratch baseline JPEG codec (functions/jpeg_codec.py):
zig-zag pin, exactness on flat blocks, roundtrip PSNR floors across
subsampling modes, conformance against real-world JPEGs (decoded
within rounding of the JVM ImageIO decoder), and typed rejection of
the unsupported modes."""

import glob
import os

import numpy as np
import pytest

from neurostore_text_extraction_spark.functions.image_codec import (
    ImageDecodeError,
    decode_image,
)
from neurostore_text_extraction_spark.functions.jpeg_codec import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)

REAL_JPEGS = sorted(
    glob.glob(
        "/opt/spark-*/data/mllib/images/origin/**/*.jpg", recursive=True
    )
)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_zigzag_is_t81_scan():
    # T.81 Figure A.6 head — a transposed scan (the classic bug) would
    # produce files other decoders render with swapped frequencies
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_flat_blocks_roundtrip_exact():
    for v in (0, 128, 200, 255):
        img = np.full((24, 40), v, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == (24, 40, 1)
        assert int(np.abs(out[..., 0].astype(int) - v).max()) <= 1
    color = np.zeros((16, 16, 3), np.uint8)
    color[...] = (30, 180, 90)
    out = decode_jpeg(encode_jpeg(color, quality=95, subsample="4:4:4"))
    assert int(np.abs(out.astype(int) - color.astype(int)).max()) <= 1


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:2", "4:2:0"])
def test_smooth_color_roundtrip_psnr(subsample):
    yy, xx = np.mgrid[0:64, 0:80]
    img = np.stack(
        [
            128 + 90 * np.sin(yy / 9.0),
            128 + 90 * np.cos(xx / 8.0),
            128 + 60 * np.sin((xx + yy) / 14.0),
        ],
        -1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    assert out.shape == img.shape
    assert _psnr(img, out) > 38.0


def test_odd_sizes_and_grayscale():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)
    assert decode_jpeg(encode_jpeg(img, quality=75)).shape == (17, 23, 3)
    gray = rng.integers(0, 256, (9, 31)).astype(np.uint8)
    assert decode_jpeg(encode_jpeg(gray, quality=75)).shape == (9, 31, 1)


def test_decode_image_dispatches_jpeg():
    img = np.full((8, 8), 77, np.uint8)
    data = encode_jpeg(img, quality=90)
    assert data[:3] == b"\xff\xd8\xff"
    out = decode_image(data)
    assert int(np.abs(out[..., 0].astype(int) - 77).max()) <= 1


def test_unsupported_modes_raise_typed_error():
    img = np.full((8, 8), 100, np.uint8)
    data = bytearray(encode_jpeg(img, quality=90))
    with pytest.raises(ImageDecodeError):
        decode_jpeg(b"\x89PNG not jpeg")
    with pytest.raises(ImageDecodeError):
        decode_jpeg(bytes(data[:40]))  # truncated before SOS
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC9  # rebadge as arithmetic-coded sequential
    with pytest.raises(ImageDecodeError, match="SOF9"):
        decode_jpeg(bytes(data))


@pytest.mark.skipif(not REAL_JPEGS, reason="no sample JPEGs on this host")
def test_real_world_jpegs_all_decode():
    """Every externally-produced camera JPEG in Spark's mllib samples
    (real encoders: EXIF, 4:2:0, multi-table DHT, one progressive
    SOF2) must decode with plausible photographic statistics."""
    for f in REAL_JPEGS:
        img = decode_jpeg(open(f, "rb").read())
        h, w, c = img.shape
        assert 10 < h < 5000 and 10 < w < 5000 and c in (1, 3)
        assert 5.0 < img.std() < 128.0  # photographic content, not noise


@pytest.mark.skipif(not REAL_JPEGS, reason="no sample JPEGs on this host")
def test_conformance_vs_jvm_imageio(spark):
    """Decode the same real-world file with the JVM's independent
    ImageIO decoder (spark.read.format('image')) and require agreement
    within IDCT rounding tolerance — proof of spec conformance, not
    just self-consistency."""
    f = REAL_JPEGS[0]
    row = spark.read.format("image").load(f).collect()[0]["image"]
    ref = np.frombuffer(bytes(row["data"]), np.uint8).reshape(
        row["height"], row["width"], row["nChannels"]
    )[..., ::-1]
    mine = decode_jpeg(open(f, "rb").read())
    assert mine.shape == ref.shape
    d = np.abs(ref.astype(int) - mine.astype(int))
    assert d.mean() < 1.5
    assert np.percentile(d, 99) <= 6


PROG_JPEGS = [f for f in REAL_JPEGS if b"\xff\xc2" in open(f, "rb").read()]


@pytest.mark.skipif(not PROG_JPEGS, reason="no progressive sample on this host")
def test_progressive_grayscale_conformance_vs_jvm_imageio(spark):
    """The mllib sample set ships one real progressive (SOF2) file;
    require agreement with the JVM's independent decoder within IDCT
    rounding — exercises DC/AC first passes, EOB runs, and
    successive-approximation refinement on externally-coded data."""
    f = PROG_JPEGS[0]
    row = spark.read.format("image").load(f).collect()[0]["image"]
    ref = np.frombuffer(bytes(row["data"]), np.uint8).reshape(
        row["height"], row["width"], row["nChannels"]
    )
    mine = decode_jpeg(open(f, "rb").read())
    assert mine.shape == ref.shape
    d = np.abs(ref.astype(int) - mine.astype(int))
    assert d.mean() < 0.5
    assert d.max() <= 2


@pytest.mark.skipif(not REAL_JPEGS, reason="no sample JPEGs on this host")
def test_progressive_color_conformance_vs_jvm_writer(spark, tmp_path):
    """Transcode a baseline color sample to progressive with the JVM
    ImageIO *writer* (standard multi-scan script: interleaved DC,
    per-component AC bands, successive-approximation refinements),
    then require our decode to match the JVM decode of that same file
    — covers 4:2:0 progressive color end-to-end."""
    jvm = spark._jvm
    File = jvm.java.io.File
    ImageIO = jvm.javax.imageio.ImageIO
    bimg = ImageIO.read(File(REAL_JPEGS[0]))
    writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    dst = str(tmp_path / "prog_color.jpg")
    ios = ImageIO.createImageOutputStream(File(dst))
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bimg, None, None), param)
    ios.close()
    writer.dispose()
    data = open(dst, "rb").read()
    assert b"\xff\xc2" in data  # really progressive
    row = spark.read.format("image").load(dst).collect()[0]["image"]
    ref = np.frombuffer(bytes(row["data"]), np.uint8).reshape(
        row["height"], row["width"], row["nChannels"]
    )[..., ::-1]
    mine = decode_jpeg(data)
    assert mine.shape == ref.shape
    d = np.abs(ref.astype(int) - mine.astype(int))
    assert d.mean() < 1.5
    assert np.percentile(d, 99) <= 6


def test_image_stats_decodes_jpeg_blobs(spark):
    from neurostore_text_extraction_spark.operators.multimodal import image_stats

    yy, xx = np.mgrid[0:32, 0:32]
    img = (128 + 80 * np.sin(yy / 5.0) * np.cos(xx / 7.0)).astype(np.uint8)
    df = spark.createDataFrame(
        [("j", bytearray(encode_jpeg(img, quality=85)))],
        "blob_id string, blob binary",
    )
    r = image_stats(df).collect()[0]
    assert r["media_type"] == "image/jpeg"
    assert r["decode_error"] is None
    assert (r["width"], r["height"]) == (32, 32)
    # pixel stats reflect the actual signal, not a fake decode
    assert abs(r["mean_px"] - float(img.mean())) < 3.0
    assert r["ahash"] is not None


def test_noninterleaved_sequential_scans_decode_identically():
    """T.81 allows baseline images encoded as one scan PER component
    (Ns=1); some encoders emit this. The Ns=1 decoder branch must
    reproduce the interleaved decode bit-for-bit (same coefficients,
    different scan order only)."""
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack(
        [128 + 80 * np.sin(xx / 6.0), 128 + 70 * np.cos(yy / 5.0), (xx * 3 + yy * 2) % 256],
        -1,
    ).astype(np.uint8)
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        a = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        b = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub, interleaved=False))
        assert np.array_equal(a, b), sub
    # odd dimensions exercise the unpadded cw/ch walk vs the padded grid
    odd = img[:30, :41]
    a = decode_jpeg(encode_jpeg(odd, quality=85, subsample="4:2:0"))
    b = decode_jpeg(encode_jpeg(odd, quality=85, subsample="4:2:0", interleaved=False))
    assert a.shape == (30, 41, 3) and np.array_equal(a, b)


def test_huffman_lut_memoized_across_decodes():
    """Every MJPEG frame carries the same DHT bytes; the 65k-entry LUT
    must be built once and shared, not rebuilt per blob (~40% of a
    small frame's decode cost)."""
    from neurostore_text_extraction_spark.functions import jpeg_codec as J

    img = np.full((16, 16), 99, np.uint8)
    blob = encode_jpeg(img, quality=80)
    J._HUFF_CACHE.clear()
    decode_jpeg(blob)
    n1 = len(J._HUFF_CACHE)
    tables_before = {k: id(v) for k, v in J._HUFF_CACHE.items()}
    decode_jpeg(blob)
    assert len(J._HUFF_CACHE) == n1  # no new entries
    assert {k: id(v) for k, v in J._HUFF_CACHE.items()} == tables_before
