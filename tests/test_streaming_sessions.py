"""Streaming sessionization tests (§2.10 depth): watermark-gated
session_window aggregation and the applyInPandasWithState custom
stateful operator, driven through real micro-batches (file source,
one file per trigger) so late-data/watermark semantics are exercised."""

import datetime as dt
import os
import uuid

from pyspark.sql import functions as F

from neurostore_text_extraction_spark.streaming.sessions import (
    session_counts,
    session_counts_stateful,
)


def _write_batch(spark, d, rows):
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    df.coalesce(1).write.mode("append").parquet(d)


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def test_session_counts_batch_semantics(spark):
    rows = [
        ("u1", _mins(0)),
        ("u1", _mins(10)),  # same session (gap 10m < 30m)
        ("u1", _mins(50)),  # new session (gap 40m)
        ("u2", _mins(0)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in session_counts(df, streaming=False).collect()
    }
    # session end = last event + gap
    assert out[("u1", _mins(0))] == (_mins(40), 2)
    assert out[("u1", _mins(50))] == (_mins(80), 1)
    assert out[("u2", _mins(0))] == (_mins(30), 1)


def _run_stream(spark, make_query, tmp_path):
    """Two micro-batches within ONE availableNow run
    (maxFilesPerTrigger=1, files ordered by modification time): the
    second file's far-future event pushes the watermark past the first
    file's sessions so they emit in append mode."""
    import time

    src = str(tmp_path / f"events_{uuid.uuid4().hex[:6]}")
    os.makedirs(src)
    _write_batch(
        spark,
        src,
        [("u1", _mins(0)), ("u1", _mins(10)), ("u2", _mins(5))],
    )
    time.sleep(1.1)  # distinct mtime → deterministic batch order
    _write_batch(spark, src, [("u3", _mins(600))])
    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_df = make_query(stream)
    name = f"sess_{uuid.uuid4().hex[:6]}"
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_session_window_stream_emits_after_watermark(spark, tmp_path):
    rows = _run_stream(
        spark, lambda s: session_counts(s, gap="30 minutes", watermark="1 hour"), tmp_path
    )
    got = {(r.user_id): (r.session_start, r.n_events) for r in rows}
    assert got["u1"] == (_mins(0), 2)
    assert got["u2"] == (_mins(5), 1)
    assert "u3" not in got  # its session is still open behind the watermark


def test_stateful_sessionization_stream(spark, tmp_path):
    rows = _run_stream(
        spark,
        lambda s: session_counts_stateful(s, gap_seconds=1800, watermark="1 hour"),
        tmp_path,
    )
    got = {r.user_id: (r.session_start, r.session_end, r.n_events) for r in rows}
    # stateful form reports session_end = last EVENT time (not +gap)
    assert got["u1"] == (_mins(0), _mins(10), 2)
    assert got["u2"] == (_mins(5), _mins(5), 1)
    assert "u3" not in got


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark-based crawl dedup: byte-identical
    re-fetches of a url are dropped inside the horizon, a re-crawl with
    CHANGED bytes passes (content-aware key), state stays bounded by
    the watermark (unlike stream-side dropDuplicates)."""
    from datetime import datetime, timedelta

    from neurostore_text_extraction_spark.streaming.dedup import dedup_stream

    base = datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        ("u1", base, b"<p>one</p>"),
        ("u1", base + timedelta(minutes=5), b"<p>one</p>"),  # dup bytes
        ("u1", base + timedelta(minutes=10), b"<p>CHANGED</p>"),  # new bytes
        ("u2", base, b"<p>two</p>"),
        ("u2", base + timedelta(minutes=2), b"<p>two</p>"),  # dup bytes
    ]
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).coalesce(1).write.parquet(in_dir)

    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, html binary")
        .parquet(in_dir)
    )
    out = dedup_stream(stream, watermark="30 minutes", by_content=True)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.url, bytes(r.html))
        for r in spark.sql("select * from dedup_sink").collect()
    }
    assert got == {
        ("u1", b"<p>one</p>"),
        ("u1", b"<p>CHANGED</p>"),
        ("u2", b"<p>two</p>"),
    }
    # batch fallback: same operator, same answer, no streaming state
    batch = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    bgot = {
        (r.url, bytes(r.html))
        for r in dedup_stream(batch, by_content=True).collect()
    }
    assert bgot == got
