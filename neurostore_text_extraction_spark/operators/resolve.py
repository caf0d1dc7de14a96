"""Source resolution and "latest" picks (S9–S11, W1–W3 in SURVEY.md).

- Prioritized source resolution (``ns_extract/pipelines/base.py:432-465``,
  config shape ``base.py:94-105``): for input type T and source priority
  (s1, s2, …), take the first source whose value exists. Spark:
  ``F.coalesce(s1.T, s2.T, …)`` — per-row lazy, exactly the reference's
  ``break`` on first hit (O5).
- Latest-version / latest-config / newest-prior-result picks
  (``ns_extract/dataset.py:274-331``, ``base.py:342-370``): window
  ``row_number() == 1`` over a descending sort key; semver compares as
  a struct of split integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def resolve_sources(
    df: DataFrame, input_type: str, priority: tuple[str, ...]
) -> Column:
    """coalesce(src1.type, src2.type, ...). Sources are nullable struct
    columns (ace/pubget/db), input types their fields; dot paths like
    ``metadata.abstract`` work natively (F5)."""
    return F.coalesce(*[F.col(f"{src}.{input_type}") for src in priority]).alias(
        input_type
    )


def semver_key(version_col: Column) -> Column:
    """'1.10.2' → struct(1, 10, 2) so the window orders numerically,
    not lexically (``dataset.py:274-296`` uses int-tuple compare)."""
    parts = F.split(version_col, r"\.")
    return F.struct(
        F.coalesce(parts.getItem(0).cast("int"), F.lit(0)).alias("major"),
        F.coalesce(parts.getItem(1).cast("int"), F.lit(0)).alias("minor"),
        F.coalesce(parts.getItem(2).cast("int"), F.lit(0)).alias("patch"),
    )


def pick_latest(
    df: DataFrame, partition_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """row_number()==1 over a per-key descending window (W1–W3). The
    caller includes a unique tiebreaker in order_cols for determinism."""
    w = Window.partitionBy(*partition_cols).orderBy(*[c.desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def slice_ids(df: DataFrame, ids: list[str], id_col: str = "url") -> DataFrame:
    """Dataset.slice (``dataset.py:207-211``). For large id sets join a
    broadcast ids frame instead of isin."""
    if len(ids) <= 1000:
        return df.where(F.col(id_col).isin(ids))
    ids_df = df.sparkSession.createDataFrame([(i,) for i in ids], f"{id_col} string")
    return df.join(F.broadcast(ids_df), id_col, "left_semi")
