"""Learned quality classifier: separability, raw-space coefficient
fold-back, deterministic retrain, scoring-plan purity, Pareto rule."""

import pytest
from pyspark.sql import functions as F

from neurostore_text_extraction_spark.operators.quality_classifier import (
    pareto_keep_col,
    score_quality,
    train_quality_classifier,
)


def _ref_doc(i):
    words = " ".join(f"prose{i}w{j}" for j in range(80))
    return f"{words}. A clear second sentence. And a third one here."


def _spam_doc(i):
    # short, bullet-ridden, symbol-heavy — separable from reference
    return f"- buy{i} now ### deal ...\n- click here ...\n- spam {i} ..."


@pytest.fixture(scope="module")
def model(spark):
    ref = spark.createDataFrame([( _ref_doc(i),) for i in range(30)], "text string")
    crawl = spark.createDataFrame(
        [(_spam_doc(i),) for i in range(30)], "text string"
    )
    return train_quality_classifier(ref, crawl)


def test_separates_reference_from_spam(spark, model):
    mixed = spark.createDataFrame(
        [(1, _ref_doc(99)), (2, _spam_doc(99))], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["quality_clf_score"] for r in score_quality(mixed, model).collect()}
    assert got[1] > 0.9
    assert got[2] < 0.1


def test_retrain_is_deterministic(spark, model):
    ref = spark.createDataFrame([( _ref_doc(i),) for i in range(30)], "text string")
    crawl = spark.createDataFrame(
        [(_spam_doc(i),) for i in range(30)], "text string"
    )
    again = train_quality_classifier(ref, crawl)
    assert again.intercept == pytest.approx(model.intercept, rel=1e-8)
    for a, b in zip(again.coefficients, model.coefficients):
        assert a == pytest.approx(b, rel=1e-8)


def test_scoring_plan_has_no_python_and_no_shuffle(spark, model):
    df = spark.createDataFrame([(1, _ref_doc(0))], "doc_id int, text string")
    plan = (
        score_quality(df, model)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
    assert "Exchange" not in plan


def test_pareto_keep_rule(spark, model):
    df = spark.createDataFrame(
        [(i, _spam_doc(i)) for i in range(2000)]
        + [(10_000 + i, _ref_doc(i)) for i in range(50)],
        "doc_id int, text string",
    )
    scored = score_quality(df, model)
    kept = scored.where(
        pareto_keep_col(F.col("quality_clf_score"), F.col("doc_id"))
    )
    n_ref_kept = kept.where("doc_id >= 10000").count()
    n_spam_kept = kept.where("doc_id < 10000").count()
    # survival is score-monotone but stochastic-by-design (GPT-3 §A.2):
    # a score-s doc survives with prob (2-s)^(-alpha), so ~0.97-score
    # reference docs keep ~90%+ and ~0.01-score spam ~0.2%
    assert n_ref_kept >= 45
    assert n_spam_kept < 100
    assert n_ref_kept / 50 > 10 * (n_spam_kept + 1) / 2000  # monotone in score
    # deterministic: same keep-set on re-evaluation under repartition
    again = scored.repartition(7).where(
        pareto_keep_col(F.col("quality_clf_score"), F.col("doc_id"))
    )
    assert kept.select("doc_id").exceptAll(again.select("doc_id")).count() == 0
