"""End-to-end pipeline tests (reference layer-4 determinism suite,
``tests/test_word_count.py:86-120`` etc.): golden roundtrip, serial ≡
parallel, idempotent re-run (whole-run memoization), incremental
change detection, kill-and-resume, lineage accounting."""

import pyspark.sql.functions as F
import pytest

from neurostore_text_extraction_spark.operators.extract import extract_pages
from neurostore_text_extraction_spark.plans.pipeline import (
    read_results,
    replay_postprocess,
    run_extraction,
)
from neurostore_text_extraction_spark.sources.catalog import Catalog
from neurostore_text_extraction_spark.sources.pages import generate_pages, pages_view

N_ROWS = 150


@pytest.fixture(scope="module")
def corpus(spark):
    gen = generate_pages(spark, N_ROWS, 8).cache()
    gen.count()
    yield gen
    gen.unpersist()


def test_extraction_matches_goldens(spark, corpus):
    ext = extract_pages(pages_view(corpus), num_partitions=8)
    joined = ext.join(corpus.select("url", "golden_text", "golden_kind"), "url")
    assert joined.count() == N_ROWS
    assert joined.filter("error is not null").count() == 0
    assert joined.filter("text != golden_text").count() == 0
    assert joined.filter("kind != golden_kind").count() == 0


def test_serial_equals_parallel(spark, corpus):
    pages = pages_view(corpus)
    a = extract_pages(pages, num_partitions=1).select("url", "text", "spans")
    b = extract_pages(pages, num_partitions=32).select("url", "text", "spans")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_pipeline_run_resume_idempotent(spark, corpus, tmp_path):
    store = str(tmp_path / "store")
    pages = pages_view(corpus)

    r1 = run_extraction(spark, pages, store, num_partitions=8)
    assert not r1.skipped
    assert r1.n_processed == N_ROWS and r1.n_errors == 0

    # idempotent re-run: whole-run memoization, nothing re-processed
    r2 = run_extraction(spark, pages, store, num_partitions=8)
    assert r2.skipped

    # results table: byte-identical to goldens
    res = read_results(spark, store)
    assert res.count() == N_ROWS
    mism = res.join(corpus.select("url", "golden_text"), "url").filter(
        "text != golden_text"
    )
    assert mism.count() == 0


def test_kill_and_resume_exact(spark, corpus, tmp_path):
    """Simulated partial failure: first run only covers half the corpus
    (as if the job died before the rest committed); the resume run must
    process exactly the remainder and the union must equal a full run."""
    store = str(tmp_path / "store2")
    pages = pages_view(corpus)
    first_half = pages.where(F.xxhash64("url") % 2 == 0)
    r1 = run_extraction(spark, first_half, store, num_partitions=8)
    assert 0 < r1.n_processed < N_ROWS

    r2 = run_extraction(spark, pages, store, num_partitions=8)
    assert not r2.skipped
    assert r1.n_processed + r2.n_processed == N_ROWS

    res = read_results(spark, store)
    assert res.count() == N_ROWS
    assert res.join(
        corpus.select("url", "golden_text"), "url"
    ).filter("text != golden_text").count() == 0


def test_changed_input_reprocessed(spark, corpus, tmp_path):
    store = str(tmp_path / "store3")
    pages = pages_view(corpus)
    run_extraction(spark, pages, store, num_partitions=8)

    # mutate one page's html → exactly that page is reprocessed
    changed = pages.withColumn(
        "html",
        F.when(
            F.xxhash64("url") % 31 == 0,
            F.concat(F.col("html"), F.lit(b"<!-- changed -->")),
        ).otherwise(F.col("html")),
    )
    n_changed = pages.where(F.xxhash64("url") % 31 == 0).count()
    assert n_changed > 0
    r = run_extraction(spark, changed, store, num_partitions=8)
    assert r.n_processed == n_changed

    # read_results picks the newest snapshot per url
    res = read_results(spark, store)
    assert res.count() == N_ROWS


def test_lineage_accounts_for_every_row(spark, corpus, tmp_path):
    store = str(tmp_path / "store4")
    run_extraction(spark, pages_view(corpus), store, num_partitions=8)
    lin = Catalog(store).read(spark, "lineage")
    agg = lin.agg(
        F.sum("input_count").alias("n"), F.sum("bytes").alias("b")
    ).first()
    assert agg["n"] == N_ROWS
    assert agg["b"] > 0
    assert lin.select("partition_id").distinct().count() == lin.count()


def test_replay_postprocess_only(spark, corpus, tmp_path):
    store = str(tmp_path / "store5")
    run_extraction(spark, pages_view(corpus), store, num_partitions=8)
    out = replay_postprocess(
        spark,
        store,
        lambda df: df.select("url", F.length("text").alias("n_chars")),
    )
    assert out.count() == N_ROWS
    assert out.filter("n_chars > 0").count() == N_ROWS


def test_error_isolation_in_pipeline(spark, tmp_path):
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1", "u2"],
                "warc_ts": [None, None],
                "html": [None, b"<html><body><p>Fine page with plenty of words to keep here always, truly.</p></body></html>"],
                "text": [None, None],
                "lang": [None, None],
            }
        ),
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    store = str(tmp_path / "store6")
    r = run_extraction(spark, bad, store, num_partitions=2)
    assert r.n_errors == 1
    res = read_results(spark, store)
    assert res.filter("valid").count() == 1
    assert res.filter("not valid").count() == 1


def test_manifest_compaction(spark, corpus, tmp_path):
    """Catalog.compact collapses the snapshot history to latest-per-key
    in ONE snapshot; resume semantics (skip-on-no-change) survive it."""
    from pyspark.sql import functions as F

    from neurostore_text_extraction_spark.sources.catalog import Catalog

    store = str(tmp_path / "store")
    pages = pages_view(corpus)
    run_extraction(spark, pages, store, num_partitions=8)
    # second run over a changed subset -> second manifest snapshot
    changed = pages.withColumn(
        "html",
        F.when(
            F.xxhash64("url") % 17 == 0,
            F.concat(F.col("html"), F.lit(b"<!-- v2 -->")),
        ).otherwise(F.col("html")),
    )
    assert pages.where(F.xxhash64("url") % 17 == 0).count() > 0
    run_extraction(spark, changed, store, num_partitions=8)
    cat = Catalog(store)
    assert len(cat.snapshots("manifest")) == 2
    before = cat.read(spark, "manifest")
    n_keys = before.select("url").distinct().count()

    cat.compact(spark, "manifest", key_cols=["url"], order_col="date")
    assert len(cat.snapshots("manifest")) == 1
    after = cat.read(spark, "manifest")
    assert after.count() == n_keys  # one latest row per url
    # the compacted manifest still memoizes: re-run of the changed
    # corpus is a whole-run cache hit
    r3 = run_extraction(spark, changed, store, num_partitions=8)
    assert r3.skipped
