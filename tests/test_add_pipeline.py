"""S10 end-to-end upstream-pipeline attach (mirrors the reference's
``test_patient_study.py:134-199`` flow: a downstream extractor consumes
another pipeline's per-study results resolved at version/config
'latest')."""

import logging

from pyspark.sql import functions as F

from neurostore_text_extraction_spark.operators.resolve import add_pipeline


def _results(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, extractor string, version string, config_hash string, "
        "config_date date, payload string",
    )


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_add_pipeline_latest_semver_and_config(spark):
    import datetime as dt

    d = dt.date
    rows = [
        ("u1", "demo", "1.2.0", "aaa", d(2023, 1, 1), "old-version"),
        ("u1", "demo", "1.10.0", "aaa", d(2023, 2, 1), "old-config"),
        ("u1", "demo", "1.10.0", "bbb", d(2024, 2, 1), "WANT"),
        ("u1", "other", "9.0.0", "zzz", d(2025, 1, 1), "decoy"),
        ("u2", "demo", "1.10.0", "bbb", d(2024, 2, 1), "WANT2"),
    ]
    out = add_pipeline(
        _pages(spark, ["u1", "u2", "u3"]),
        _results(spark, rows),
        extractor="demo",
        warn_dangling=False,
    )
    got = {r.url: (r.version, r.config_hash, r.payload) for r in out.collect()}
    assert got["u1"] == ("1.10.0", "bbb", "WANT")  # numeric semver, newest config
    assert got["u2"] == ("1.10.0", "bbb", "WANT2")
    assert got["u3"] == (None, None, None)  # dangling page kept, null payload


def test_add_pipeline_pinned_version(spark):
    import datetime as dt

    rows = [
        ("u1", "demo", "1.2.0", "aaa", dt.date(2023, 1, 1), "pinned"),
        ("u1", "demo", "2.0.0", "bbb", dt.date(2024, 1, 1), "newer"),
    ]
    out = add_pipeline(
        _pages(spark, ["u1"]),
        _results(spark, rows),
        extractor="demo",
        version="1.2.0",
        config_hash="aaa",
        warn_dangling=False,
    ).first()
    assert out.payload == "pinned"


def test_add_pipeline_warns_on_dangling(spark, caplog):
    import datetime as dt

    rows = [("u1", "demo", "1.0.0", "aaa", dt.date(2023, 1, 1), "p")]
    with caplog.at_level(logging.WARNING):
        add_pipeline(
            _pages(spark, ["u1", "u2"]),
            _results(spark, rows),
            extractor="demo",
            warn_dangling=True,  # opt-in: the count is a second full pass
        ).collect()
    assert any("no upstream result" in m for m in caplog.messages)


def test_add_pipeline_default_runs_no_extra_count_job(spark):
    """warn_dangling defaults OFF: building the attach plan must not
    trigger any Spark job (the count was an eager full pass over the
    join output before any consumer ran)."""
    import datetime as dt

    rows = [("u1", "demo", "1.0.0", "aaa", dt.date(2023, 1, 1), "p")]
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    out = add_pipeline(_pages(spark, ["u1", "u2"]), _results(spark, rows), extractor="demo")
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before)  # plan construction is lazy
    assert out.where("payload IS NULL").count() == 1  # consumer-side dangling count


def test_downstream_consumes_upstream_groups(spark):
    """PatientStudy-style chain: upstream demographics results joined
    by add_pipeline, then U8's has_patient_group over the payload."""
    import datetime as dt

    from neurostore_text_extraction_spark.operators.demographics import (
        has_patient_group,
    )

    groups_df = spark.createDataFrame(
        [
            ("u1", [("patient",), ("control",)]),
            ("u2", [("control",)]),
        ],
        "url string, groups array<struct<group_name:string>>",
    ).select(
        "url",
        F.lit("demo").alias("extractor"),
        F.lit("1.0.0").alias("version"),
        F.lit("aaa").alias("config_hash"),
        F.lit(dt.date(2024, 1, 1)).alias("config_date"),
        F.col("groups").alias("payload"),
    )
    out = add_pipeline(
        _pages(spark, ["u1", "u2"]),
        groups_df,
        extractor="demo",
        warn_dangling=False,
    ).select("url", has_patient_group(F.col("payload")).alias("has_patient"))
    got = {r.url: r.has_patient for r in out.collect()}
    assert got == {"u1": True, "u2": False}
