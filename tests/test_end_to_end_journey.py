"""The full user journey across subsystems in one test: synthetic
crawl pages → extraction pipeline (store snapshots) → corpus-prep
cleaning chain over the extracted text → sequence packing → assembled
training sequences. Asserts each hand-off preserves content and
invariants."""

import pytest
from pyspark.sql import functions as F

from neurostore_text_extraction_spark.operators.packing import (
    assemble_packed,
    pack_sequences,
)
from neurostore_text_extraction_spark.plans.corpus_prep import (
    prepare_training_corpus,
)
from neurostore_text_extraction_spark.plans.pipeline import (
    read_results,
    run_extraction,
)
from neurostore_text_extraction_spark.sources.pages import (
    generate_pages,
    pages_view,
)


def test_extract_prep_pack_roundtrip(spark, tmp_path):
    store = str(tmp_path / "store")
    n = 60
    gen = generate_pages(spark, n, 4).cache()
    gen.count()

    # 1. extraction into the snapshot store (partitioned results)
    res = run_extraction(
        spark, pages_view(gen), store, partition_buckets=4, salt=False
    )
    assert res.n_processed == n and res.n_errors == 0

    # 2. corpus prep over the extracted text (string url → long id for
    #    the packing stage downstream)
    docs = read_results(spark, store).select(
        F.xxhash64("url").alias("doc_id"), "url", "text"
    )
    prep = prepare_training_corpus(
        docs.select("doc_id", "text"),
        # synthetic goldens are extraction-focused, not C4-shaped —
        # exercise the dedup/substr stages, not the prose filters
        require_c4=False,
        require_gopher=False,
    )
    kept = prep.clean
    n_kept = kept.count()
    assert n_kept > 0
    report = {r["reason"]: r["n_docs"] for r in prep.report.collect()}
    assert sum(report.values()) == n

    # 3. pack the cleaned corpus into training sequences
    assigns = pack_sequences(
        kept.select("doc_id", F.col("clean_text").alias("text")),
        max_tokens=512,
        num_shards=4,
    )
    assert assigns.count() == n_kept  # every kept doc assigned once
    sums = assigns.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n_docs")
    )
    over = sums.where("tot > 512 and n_docs > 1").count()
    assert over == 0  # budget holds except single-oversize-doc bins

    # 4. assemble and verify content survives the whole chain
    packed = assemble_packed(
        assigns, kept.select("doc_id", F.col("clean_text").alias("text"))
    )
    total_docs = packed.agg(F.sum("n_docs")).first()[0]
    assert total_docs == n_kept
    # a kept doc's cleaned text appears verbatim in its sequence
    sample = kept.where(F.length("clean_text") > 50).first()
    frag = sample["clean_text"][:40]
    assert packed.where(F.col("packed_text").contains(frag)).count() >= 1
    gen.unpersist()
