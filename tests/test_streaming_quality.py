"""Streaming quality filter: the stateless gates produce IDENTICAL
results on a stream (file micro-batches) and on the same data as a
batch frame, classifier scoring included."""

import pytest
from pyspark.sql import functions as F

from neurostore_text_extraction_spark.streaming.quality import quality_filter


def _good(i):
    words = " ".join(f"tok{i}w{j}" for j in range(80))
    return f"{words}. Second sentence here. And a third one."


def _docs(spark, n=30):
    rows = []
    for i in range(n):
        if i % 5 == 0:
            rows.append((i, f"- spam{i} ### ...\n- click ..."))
        elif i % 7 == 0:
            rows.append((i, _good(i) + " lorem ipsum"))
        else:
            rows.append((i, _good(i)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_equals_batch(spark, tmp_path):
    from neurostore_text_extraction_spark.operators.quality_classifier import (
        train_quality_classifier,
    )

    docs = _docs(spark)
    ref = docs.where("doc_id % 5 != 0 and doc_id % 7 != 0").select("text")
    crawl = docs.where("doc_id % 5 = 0").select("text")
    model = train_quality_classifier(ref, crawl)

    batch_out = quality_filter(docs, quality_model=model).select(
        "doc_id", "quality_clf_score"
    )

    # stream the same rows as two parquet micro-batch files
    src = str(tmp_path / "src")
    docs.where("doc_id < 15").write.mode("append").parquet(src)
    docs.where("doc_id >= 15").write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        quality_filter(stream, quality_model=model)
        .select("doc_id", "quality_clf_score")
        .writeStream.format("memory")
        .queryName("qf_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_out = spark.table("qf_out")

    a = {(r["doc_id"], r["quality_clf_score"]) for r in batch_out.collect()}
    b = {(r["doc_id"], r["quality_clf_score"]) for r in stream_out.collect()}
    assert a == b and len(a) > 0
    # the gates actually dropped the planted junk
    kept_ids = {d for d, _ in a}
    assert all(i not in kept_ids for i in range(0, 30, 5))  # spam
    assert all(i not in kept_ids for i in (7, 21))  # lorem ipsum
