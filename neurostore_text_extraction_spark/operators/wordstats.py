"""Word-count operators (U1/U2, A1/A2 in SURVEY.md §2.4/§2.8).

Reference semantics:
- word_count = ``len(text.split())`` (``tests/example_pipelines/
  word_count/model.py:31-47``) — whitespace-run split, so empty/blank
  text counts 0.
- word_deviance = ``abs(word_count - mean)`` where mean is the
  *integer-floor* corpus mean ``total_words // num_docs``
  (``word_count/model.py:77-102``).

Spark realization: word_count is a whole-stage-codegen'd native column
expression (no UDF). word_deviance is a two-phase aggregate: partial
map-side sum/count, a 1-row global agg broadcast back via cross join —
the classic "corpus-scoped then per-row finalize" DependentPipeline
shape (``ns_extract/pipelines/base.py:536-669``) with the driver-side
materialization removed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def word_count_col(text: Column) -> Column:
    """len(text.split()) as a native expression: split on whitespace
    runs after trim; blank → 0."""
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def word_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col), word_count_col(F.col(text_col)).cast("long").alias("word_count")
    )


def word_deviance(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """abs(wc - floor(sum(wc)/n)) per doc. The global aggregate is one
    row — broadcast cross join, no shuffle of the fact side."""
    wc = word_count(df, id_col, text_col)
    mean = wc.agg(
        F.floor(F.sum("word_count") / F.count("*")).cast("long").alias("mean_wc")
    )
    return wc.crossJoin(F.broadcast(mean)).select(
        F.col(id_col),
        F.abs(F.col("word_count") - F.col("mean_wc")).cast("long").alias("word_deviance"),
    )
