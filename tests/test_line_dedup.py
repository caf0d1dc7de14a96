"""Inter-document line dedup (C4 §2.1 / RefinedWeb): hand-computed
vectors + a plan assert that the boilerplate-key removal is a broadcast
anti-join, never a Window over the line key (a window partition is one
task — the most common line of the crawl would funnel into it)."""

import pytest

from neurostore_text_extraction_spark.operators.webtext import line_dedup


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = line_dedup(df, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_drops_cross_doc_boilerplate_keeps_order(spark):
    rows = [
        (1, "NAV\nalpha one\nbeta two\nFOOTER"),
        (2, "NAV\ngamma three\nFOOTER"),
        (3, "NAV\ndelta four\nepsilon five\nFOOTER"),
    ]
    got = _run(spark, rows)
    assert got[1]["clean_text"] == "alpha one\nbeta two"
    assert got[2]["clean_text"] == "gamma three"
    assert got[3]["clean_text"] == "delta four\nepsilon five"
    assert got[1]["n_lines_kept"] == 2 and got[1]["n_lines_dropped"] == 2
    assert got[2]["n_lines_kept"] == 1 and got[2]["n_lines_dropped"] == 2


def test_trimmed_key_matching_and_blank_lines_kept(spark):
    # '  NAV ' and 'NAV' share a trimmed key; blank lines survive
    rows = [(1, "  NAV \n\nbody a"), (2, "NAV\nbody b")]
    got = _run(spark, rows)
    assert got[1]["clean_text"] == "\nbody a"
    assert got[2]["clean_text"] == "body b"
    # blank line neither kept-counted nor dropped-counted
    assert got[1]["n_lines_kept"] == 1 and got[1]["n_lines_dropped"] == 1


def test_within_doc_repeats_survive_threshold(spark):
    # the repeated line appears in ONE doc only → df=1 → kept twice
    rows = [(1, "same\nmid\nsame"), (2, "other")]
    got = _run(spark, rows)
    assert got[1]["clean_text"] == "same\nmid\nsame"
    assert got[1]["n_lines_kept"] == 3


def test_max_doc_freq_threshold(spark):
    rows = [(1, "shared\na"), (2, "shared\nb"), (3, "c")]
    loose = _run(spark, rows, max_doc_freq=2)
    assert loose[1]["clean_text"] == "shared\na"
    strict = _run(spark, rows, max_doc_freq=1)
    assert strict[1]["clean_text"] == "a"


def test_null_text_and_fully_dropped_doc(spark):
    rows = [(1, None), (2, "only shared"), (3, "only shared")]
    got = _run(spark, rows)
    assert got[1]["clean_text"] is None and got[1]["n_lines_kept"] == 0
    assert got[2]["clean_text"] == "" and got[2]["n_lines_dropped"] == 1
    assert len(got) == 3


def test_plan_broadcast_dupflag_join_no_window(spark):
    df = spark.createDataFrame([(1, "a\nb")], "doc_id int, text string")
    plan = line_dedup(df)._jdf.queryExecution().optimizedPlan().toString()
    # boilerplate keys come back as a broadcast dup-flag join, and no
    # Window node ever partitions by the line key
    assert "ResolvedHint" in plan or "broadcast" in plan.lower()
    assert "Window" not in plan
