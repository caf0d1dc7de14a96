"""Evaluation harness unit test — hand-computed P/R/F1 per field
(reference ``calculate_metrics.py:86-152`` semantics)."""

import math

from neurostore_text_extraction_spark.operators.evaluation import FieldSpec, field_prf


def test_field_prf_hand_computed(spark):
    truth = spark.createDataFrame(
        [
            ("a", "Patient Group", "10", "yes"),
            ("b", "Control", "20", "no"),
            ("c", None, "30", "yes"),
            ("d", "Extra", None, None),
        ],
        "url string, name string, n string, flag string",
    )
    pred = spark.createDataFrame(
        [
            ("a", " patient   group ", "10.4", "YES"),  # all match (tol 0.5)
            ("b", "wrong", "25", "yes"),  # all mismatch
            ("c", "Anything", None, None),  # truth-null name, pred-null n/flag
            ("d", None, "7", "junk"),  # pred-null name; junk bool -> null
        ],
        "url string, name string, n string, flag string",
    )
    out = field_prf(
        truth,
        pred,
        [
            FieldSpec("name", "text"),
            FieldSpec("n", "numeric", tolerance=0.5),
            FieldSpec("flag", "bool"),
        ],
        id_col="url",
    )
    rows = {r.field: r for r in out.collect()}

    # name: truth non-null {a,b,d}=3, pred non-null {a,b,c}=3, match {a}=1
    assert (rows["name"].matches, rows["name"].total_ground_truth,
            rows["name"].total_extracted) == (1, 3, 3)
    assert math.isclose(rows["name"].precision, 1 / 3)
    assert math.isclose(rows["name"].f1, 1 / 3)

    # n: truth {a,b,c}=3, pred {a,b,d}=3, match {a}=1 (|10-10.4|<=0.5)
    assert (rows["n"].matches, rows["n"].total_ground_truth,
            rows["n"].total_extracted) == (1, 3, 3)

    # flag: truth {a,b,c}=3, pred {a,b}=2 ('junk'->null), match {a}=1
    r = rows["flag"]
    assert (r.matches, r.total_ground_truth, r.total_extracted) == (1, 3, 2)
    assert math.isclose(r.precision, 0.5)
    assert math.isclose(r.recall, 1 / 3)
    assert math.isclose(r.f1, 2 * 0.5 * (1 / 3) / (0.5 + 1 / 3))


def test_field_prf_empty_sides(spark):
    truth = spark.createDataFrame([("a", None)], "url string, v string")
    pred = spark.createDataFrame([("a", None)], "url string, v string")
    r = field_prf(truth, pred, [FieldSpec("v", "text")], id_col="url").first()
    assert (r.precision, r.recall, r.f1) == (0.0, 0.0, 0.0)
