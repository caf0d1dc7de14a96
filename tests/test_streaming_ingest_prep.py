"""Streaming corpus-prep back half (ingest_prep.prep_stream): the full
crawl → gated, deduped, sampled chain run as a stream over planted
dup/junk micro-batches must equal the batch run over the same rows
(VERDICT r3 next-round #8)."""

import datetime

import pytest
from pyspark.sql import functions as F

from neurostore_text_extraction_spark.streaming.ingest_prep import prep_stream


def _good_text(i):
    words = " ".join(f"tok{i}w{j}" for j in range(80))
    return f"{words}. Second sentence here. And a third one."


def _crawl_rows(n=40):
    """Pages with planted junk (fails C4/Gopher), exact re-fetches
    (same url+bytes), and changed re-crawls (same url, new bytes)."""
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(n):
        ts = t0 + datetime.timedelta(minutes=i)
        url = f"https://ex.com/p{i}"
        if i % 5 == 0:
            text = f"- junk{i} ### ...\n- click ..."  # fails the gate
        else:
            text = _good_text(i)
        html = text.encode()
        rows.append((url, ts, html, text, "en"))
        if i % 4 == 1:
            # byte-identical re-fetch 2 minutes later -> dedup drops
            rows.append((url, ts + datetime.timedelta(minutes=2), html, text, "en"))
        if i % 8 == 3:
            # changed re-crawl -> content hash differs, KEPT
            text2 = text + " Updated content appended for the re-crawl."
            rows.append(
                (url, ts + datetime.timedelta(minutes=3), text2.encode(), text2, "en")
            )
    return rows


SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def test_stream_equals_batch_full_chain(spark, tmp_path):
    rows = _crawl_rows()
    docs = spark.createDataFrame(rows, SCHEMA)

    batch_out = prep_stream(docs, sample_rate=0.6).select("url", "warc_ts", "text")
    batch = {(r["url"], r["text"]) for r in batch_out.collect()}
    assert batch, "batch chain must keep something"

    # the gate must have dropped the junk, the sampler some urls
    kept_urls = {u for (u, _) in batch}
    assert not any(u.endswith("p0") or u.endswith("p5") for u in kept_urls)
    all_good_urls = {
        f"https://ex.com/p{i}" for i in range(40) if i % 5 != 0
    }
    assert kept_urls < all_good_urls  # sampler removed some

    # changed re-crawls survive dedup (content-keyed): both versions
    recrawled = [u for (u, t) in batch if "Updated content" in t]
    assert recrawled, "changed re-crawl versions must pass dedup"

    # --- stream the same rows as 3 time-ordered micro-batch files.
    # Files must be in event-time order: dropDuplicatesWithinWatermark
    # DROPS rows older than the advanced watermark, so an interleaved
    # split would lose legitimately-kept rows as "late" (the planted
    # dups arrive 2-3 min after their originals — well inside the
    # 30-min horizon as long as ingestion is roughly ordered). Each
    # write coalesces to one file so maxFilesPerTrigger=1 means one
    # time-slab per micro-batch. ---
    src = str(tmp_path / "crawl")
    docs.where("minute(warc_ts) < 15").coalesce(1).write.mode("append").parquet(src)
    docs.where("minute(warc_ts) >= 15 and minute(warc_ts) < 30").coalesce(1).write.mode("append").parquet(src)
    docs.where("minute(warc_ts) >= 30").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        prep_stream(stream, sample_rate=0.6)
        .select("url", "warc_ts", "text")
        .writeStream.format("memory")
        .queryName("prep_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["url"], r["text"]) for r in spark.table("prep_out").collect()
    }
    assert streamed == batch


def test_sampler_is_stateless_and_nested(spark):
    """The hash sampler's streamed keep-set at rate r1 < r2 nests in
    the r2 keep-set — rate schedules tighten without resampling, on a
    stream exactly as in batch."""
    docs = spark.createDataFrame(_crawl_rows(), SCHEMA)
    keep_03 = {
        r["url"]
        for r in prep_stream(docs, sample_rate=0.3).select("url").collect()
    }
    keep_07 = {
        r["url"]
        for r in prep_stream(docs, sample_rate=0.7).select("url").collect()
    }
    assert keep_03 <= keep_07


def test_prep_stream_plan_is_stateless_except_dedup(spark):
    """Everything except dropDuplicatesWithinWatermark must be narrow
    (no extra shuffles/state): assert the batch plan has no Exchange
    beyond the dedup aggregation."""
    docs = spark.createDataFrame(_crawl_rows(), SCHEMA)
    out = prep_stream(docs, sample_rate=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # batch fallback dedups via aggregate; the gate and sampler add none
    assert plan.count("Exchange") <= 1, plan


def test_prep_stream_works_without_html_column(spark):
    """Post-extraction streams carry (url, warc_ts, text) but no raw
    html; content-keyed dedup must auto-fall-back to the text column
    instead of crashing on the missing html (round-4 review finding)."""
    rows = [
        (u, ts, t, lang)
        for (u, ts, h, t, lang) in _crawl_rows()
    ]
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    )
    out = prep_stream(docs).select("url", "text").collect()
    assert out
    # changed re-crawl still passes (text-keyed)
    assert any("Updated content" in r["text"] for r in out)


def test_url_triage_runs_first_on_stream_and_batch(spark, tmp_path):
    """URL-level triage composes as the FIRST prep stage; stream and
    batch agree, and blocked domains never reach the output."""
    rows = _crawl_rows(20)
    # redirect some urls to a blocked domain
    rows = [
        (u.replace("ex.com", "evil.example") if i % 6 == 0 else u, ts, h, t, lang)
        for i, (u, ts, h, t, lang) in enumerate(rows)
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    batch = {
        (r["url"], r["text"])
        for r in prep_stream(
            docs, url_blocked_domains=["evil.example"]
        ).select("url", "text").collect()
    }
    assert batch and not any("evil.example" in u for (u, _) in batch)
    src = str(tmp_path / "crawl2")
    docs.where("minute(warc_ts) < 10").coalesce(1).write.mode("append").parquet(src)
    docs.where("minute(warc_ts) >= 10").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        prep_stream(stream, url_blocked_domains=["evil.example"])
        .select("url", "text")
        .writeStream.format("memory")
        .queryName("prep_url_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["url"], r["text"]) for r in spark.table("prep_url_out").collect()
    }
    assert streamed == batch


def test_prep_stream_word_only_triage_active(spark):
    """ADVICE r4: enabling ONLY the url word filter (no domain
    blocklist) must still run URL triage — it must not be silently
    skipped just because blocked_domains is None."""
    from pyspark.sql import functions as F

    good = "This is a perfectly normal english sentence that repeats nothing. " * 8
    docs = spark.createDataFrame(
        [
            ("https://good.example/a", good + "A."),
            ("https://spam.example/casino/bonus", good + "B."),
        ],
        "url string, text string",
    ).withColumn("warc_ts", F.timestamp_seconds(F.lit(1700000000)))
    out = prep_stream(docs, url_banned_words=("casino",))
    urls = sorted(r["url"] for r in out.select("url").collect())
    assert urls == ["https://good.example/a"]
    # and the no-knob default remains triage-free (both rows survive)
    out2 = prep_stream(docs)
    assert out2.count() == 2
