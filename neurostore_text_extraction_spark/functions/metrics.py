"""Evaluation metric normalizers (F14 / ``evaluation/scripts/
calculate_metrics.py:19-86``) as native column expressions:
text normalization (lower/trim/whitespace-collapse), numeric coercion
(strip non-digits), boolean coercion, age-range parsing
``(\\d+)[-to ]+(\\d+)`` → (lo, hi).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def norm_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def coerce_numeric(col: Column) -> Column:
    """Strip everything but digits and dot, cast to double; empty → null."""
    stripped = F.regexp_replace(col.cast("string"), r"[^0-9.]", "")
    return F.when(stripped == "", None).otherwise(stripped.cast("double"))


def coerce_boolean(col: Column) -> Column:
    low = F.lower(F.trim(col.cast("string")))
    return (
        F.when(low.isin("true", "yes", "y", "1"), True)
        .when(low.isin("false", "no", "n", "0"), False)
        .otherwise(F.lit(None).cast("boolean"))
    )


AGE_RANGE_RE = r"(\d+)\s*(?:-|to)+\s*(\d+)"


def age_range_lo(col: Column) -> Column:
    v = F.regexp_extract(col, AGE_RANGE_RE, 1)
    return F.when(v == "", None).otherwise(v.cast("int"))


def age_range_hi(col: Column) -> Column:
    v = F.regexp_extract(col, AGE_RANGE_RE, 2)
    return F.when(v == "", None).otherwise(v.cast("int"))
