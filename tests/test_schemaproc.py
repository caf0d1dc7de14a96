"""F6 schema-metadata-driven nested post-processing + validation tests
(reference ``base.py:896-959``, ``1097-1226``, ``1072-1095``)."""

from pyspark.sql import Row, functions as F, types as T

from neurostore_text_extraction_spark.functions.textnorm import normalize_string
from neurostore_text_extraction_spark.operators import schemaproc as SP


GROUPS_SCHEMA = T.StructType(
    [
        T.StructField(
            "groups",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("group_name", T.StringType()),
                        T.StructField(
                            "diagnosis",
                            T.StringType(),
                            metadata={SP.NORMALIZE: True, SP.EXPAND: True},
                        ),
                        T.StructField(
                            "count", T.IntegerType(), metadata={SP.REQUIRED: True}
                        ),
                    ]
                )
            ),
            metadata={SP.REQUIRED: True},
        ),
        T.StructField("note", T.StringType(), metadata={SP.NORMALIZE: True}),
    ]
)


def test_collect_marked_paths():
    assert SP.collect_marked_paths(GROUPS_SCHEMA) == ["groups[].diagnosis", "note"]
    assert SP.collect_marked_paths(GROUPS_SCHEMA, keys=(SP.EXPAND,)) == [
        "groups[].diagnosis"
    ]


def test_normalize_string_col_matches_python(spark):
    vectors = [
        "  major   depressive disorder ",
        "None",
        "N/a",
        "ALL CAPS TEXT",
        "mIxEd\tcase\nwords",
        "don’t",
        "",
        None,
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vectors)], "i int, s string")
    got = {r.i: r.n for r in df.select("i", SP.normalize_string_col(F.col("s")).alias("n")).collect()}
    for i, v in enumerate(vectors):
        assert got[i] == (normalize_string(v) if v is not None else None), v


def test_expand_abbreviations_first_long_form_wins(spark):
    ab = [
        Row(short_text="MDD", short_start=0, short_end=0,
            long_text="major depressive disorder", long_start=0, long_end=0),
        Row(short_text="MDD", short_start=0, short_end=0,
            long_text="WRONG", long_start=0, long_end=0),
    ]
    df = spark.createDataFrame([("patients with MDD only", ab)], ["s", "ab"])
    out = df.select(
        SP.expand_abbreviations_col(F.col("s"), F.col("ab")).alias("e")
    ).first()["e"]
    assert out == "patients with major depressive disorder only"


def test_apply_schema_postprocess_nested(spark):
    source = "We studied major depressive disorder (MDD) patients."
    rows = [
        (
            1,
            source,
            [("control", "  healthy  volunteers ", 10), ("patient", "MDD", 12)],
            "None",
        ),
        (2, source, [("patient", "None", None)], "  fine  text "),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, src string, groups array<struct<group_name:string,diagnosis:string,count:int>>, note string"
    )
    out = SP.apply_schema_postprocess(df, GROUPS_SCHEMA, source_col="src")
    out = SP.with_validity(out, GROUPS_SCHEMA)
    got = {r.doc_id: r for r in out.collect()}
    g1 = got[1].groups
    assert (g1[0].group_name, g1[0].diagnosis) == ("control", "Healthy Volunteers")
    assert g1[1].diagnosis == "Major Depressive Disorder"  # expanded then normalized
    assert got[1].note is None  # sentinel 'None' -> null
    assert got[1].valid  # all counts present
    assert got[2].groups[0].diagnosis is None
    assert got[2].note == "Fine Text"
    assert not got[2].valid  # required count is null inside the array


def test_with_validity_required_array_null(spark):
    df = spark.createDataFrame(
        [(1, None, "x")],
        "doc_id int, groups array<struct<group_name:string,diagnosis:string,count:int>>, note string",
    )
    out = SP.with_validity(df, GROUPS_SCHEMA).first()
    assert not out.valid  # groups itself is required


def test_rewrite_plan_is_native(spark):
    """The nested rewrite must not inject a Python stage: with no
    expand marker there is no UDF at all — explain() shows no
    BatchEvalPython/ArrowEvalPython."""
    schema = T.StructType(
        [
            T.StructField(
                "groups",
                T.ArrayType(
                    T.StructType(
                        [T.StructField("diagnosis", T.StringType(), metadata={SP.NORMALIZE: True})]
                    )
                ),
            )
        ]
    )
    df = spark.createDataFrame(
        [(1, [("x",)])], "doc_id int, groups array<struct<diagnosis:string>>"
    )
    out = SP.apply_schema_postprocess(df, schema)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
