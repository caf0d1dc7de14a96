"""Decode-throughput bench for the from-scratch media codecs, driven
through the public Arrow-batched operators (image_stats / audio_stats
/ video_frames) on local[32] — the number that matters for a
multimodal column at crawl scale is distributed blobs/sec, not
single-thread codec speed.

Inputs are deterministic: Spark's mllib sample photos (real camera
JPEGs, baseline 4:2:0 + one progressive SOF2) replicated N×, plus
synthesized PNG / WAV / MJPEG-AVI blobs from seeded noise. Reports
min-of-REPS wall time per operator (this host has phantom load +
DVFS; only min-of-N is meaningful — see BENCH/BASELINE.md).

Usage: python BENCH/codec_throughput.py   (never concurrently with
bench.py or run_scaling.py)
"""

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neurostore_text_extraction_spark.functions.audio_codec import encode_wav
from neurostore_text_extraction_spark.functions.image_codec import encode_png
from neurostore_text_extraction_spark.functions.video_codec import encode_avi_mjpeg
from neurostore_text_extraction_spark.operators.multimodal import (
    audio_stats,
    image_stats,
    video_frames,
)
from neurostore_text_extraction_spark.session import get_spark

REPS = 3
JPEG_COPIES = 64          # 6 real photos × 64 ≈ 13 MB compressed
PNG_BLOBS = 192
WAV_BLOBS = 192
AVI_BLOBS = 48


def _bench(name, df, op, n_blobs, n_bytes, results):
    df = df.cache()
    df.count()  # materialize input outside the timed region
    times = []
    for _ in range(REPS):
        t0 = time.monotonic()
        op(df).write.format("noop").mode("overwrite").save()
        times.append(time.monotonic() - t0)
    best = min(times)
    results[name] = {
        "blobs": n_blobs,
        "mb": round(n_bytes / 1e6, 1),
        "sec_min": round(best, 2),
        "blobs_per_sec": round(n_blobs / best, 1),
        "mb_per_sec": round(n_bytes / 1e6 / best, 1),
        "samples_sec": [round(t, 2) for t in times],
    }
    df.unpersist()


def main():
    spark = get_spark(cores=32)
    results = {}

    # Real camera JPEGs (baseline + progressive), replicated.
    files = sorted(
        glob.glob("/opt/spark-*/data/mllib/images/origin/**/*.jpg", recursive=True)
    )
    blobs = [open(f, "rb").read() for f in files]
    rows = [
        (f"j{i}_{k}", bytearray(b))
        for k in range(JPEG_COPIES)
        for i, b in enumerate(blobs)
    ]
    df = spark.createDataFrame(rows, "blob_id string, blob binary").repartition(64)
    _bench(
        "jpeg_image_stats", df, image_stats,
        len(rows), sum(len(b) for b in blobs) * JPEG_COPIES, results,
    )

    rng = np.random.default_rng(7)
    png_rows, png_bytes = [], 0
    for i in range(PNG_BLOBS):
        img = rng.integers(0, 256, (96, 128, 3)).astype(np.uint8)
        b = encode_png(img, filter_type=4)
        png_bytes += len(b)
        png_rows.append((f"p{i}", bytearray(b)))
    df = spark.createDataFrame(png_rows, "blob_id string, blob binary").repartition(64)
    _bench("png_image_stats", df, image_stats, PNG_BLOBS, png_bytes, results)

    wav_rows, wav_bytes = [], 0
    for i in range(WAV_BLOBS):
        sig = (8000 * np.sin(np.arange(44100) / (20 + i))).astype(np.int16)
        b = encode_wav(sig, 44100)
        wav_bytes += len(b)
        wav_rows.append((f"w{i}", bytearray(b)))
    df = spark.createDataFrame(wav_rows, "blob_id string, blob binary").repartition(64)
    _bench("wav_audio_stats", df, audio_stats, WAV_BLOBS, wav_bytes, results)

    avi_rows, avi_bytes = [], 0
    for i in range(AVI_BLOBS):
        yy, xx = np.mgrid[0:64, 0:96]
        frames = [
            (128 + 80 * np.sin(yy / 7.0 + t + i) * np.cos(xx / 9.0)).astype(np.uint8)
            for t in range(16)
        ]
        b = encode_avi_mjpeg(frames, quality=80)
        avi_bytes += len(b)
        avi_rows.append((f"v{i}", bytearray(b)))
    df = spark.createDataFrame(avi_rows, "blob_id string, blob binary").repartition(48)
    _bench(
        "avi_video_frames", df,
        lambda d: video_frames(d, every_n=1, max_frames=16),
        AVI_BLOBS, avi_bytes, results,
    )
    results["avi_video_frames"]["frames_per_sec"] = round(
        AVI_BLOBS * 16 / results["avi_video_frames"]["sec_min"], 1
    )

    print(json.dumps(results, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
