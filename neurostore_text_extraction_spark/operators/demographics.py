"""Demographics-style nested post-processing as pure DataFrame algebra
(F13 / ``ns_extract/pipelines/participant_demographics/model.py:21-89``
pandas cleanup, re-expressed per SURVEY.md §2.7 F13):

- explode ``groups`` array<struct>;
- fillna diagnosis → 'healthy' for control-like groups;
- drop rows with null count (``model.py:55``);
- clip counts at 0 (``clip(lower=0)``);
- impute male_count = count − female_count and symmetrically
  (``model.py:70-80``);
- re-collect to array<struct> per doc (F6 nested-path rewrite done
  relationally instead of via path walking).

Also the U8 PatientStudyExtractor predicate (``tests/example_pipelines/
patient_study/model.py:21-58``): any group named 'patient' → bool —
a single ``F.exists`` higher-order call, no explode needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

GROUP_SCHEMA = (
    "array<struct<group_name:string,diagnosis:string,count:int,"
    "male_count:int,female_count:int>>"
)


def clean_groups(df: DataFrame, id_col: str = "url", groups_col: str = "groups") -> DataFrame:
    """Exploded, cleaned demographic rows (one per group)."""
    g = df.select(F.col(id_col), F.explode(groups_col).alias("g")).select(
        F.col(id_col),
        F.col("g.group_name").alias("group_name"),
        F.col("g.diagnosis").alias("diagnosis"),
        F.col("g.count").alias("count"),
        F.col("g.male_count").alias("male_count"),
        F.col("g.female_count").alias("female_count"),
    )
    cleaned = (
        g.where(F.col("count").isNotNull())  # NA-count rows dropped
        .select(
            F.col(id_col),
            F.col("group_name"),
            F.when(
                F.col("diagnosis").isNull() & (F.lower("group_name") == "control"),
                F.lit("healthy"),
            )
            .otherwise(F.col("diagnosis"))
            .alias("diagnosis"),
            F.greatest(F.lit(0), F.col("count")).alias("count"),
            F.col("male_count"),
            F.col("female_count"),
        )
        .select(
            F.col(id_col),
            "group_name",
            "diagnosis",
            "count",
            # NOTE: Spark's greatest() skips nulls, so guard explicitly —
            # a null male_count must impute from count-female (or stay
            # null when female is null too), never collapse to 0.
            F.coalesce(
                F.when(F.col("male_count").isNotNull(), F.greatest(F.lit(0), F.col("male_count"))),
                F.col("count")
                - F.when(
                    F.col("female_count").isNotNull(),
                    F.greatest(F.lit(0), F.col("female_count")),
                ),
            ).alias("male_count"),
            F.coalesce(
                F.when(F.col("female_count").isNotNull(), F.greatest(F.lit(0), F.col("female_count"))),
                F.col("count")
                - F.when(
                    F.col("male_count").isNotNull(),
                    F.greatest(F.lit(0), F.col("male_count")),
                ),
            ).alias("female_count"),
        )
    )
    return cleaned


def recollect_groups(cleaned: DataFrame, id_col: str = "url") -> DataFrame:
    """Back to one row per doc with array<struct> groups (sorted for
    determinism)."""
    return cleaned.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct("group_name", "diagnosis", "count", "male_count", "female_count")
            )
        ).alias("groups")
    )


def has_patient_group(groups_col: Column) -> Column:
    """U8: any group named 'patient' (case-insensitive)."""
    return F.exists(groups_col, lambda g: F.lower(g["group_name"]) == "patient")
