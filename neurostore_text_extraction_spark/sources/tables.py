"""Pubget-style table-file pairing (S3, ``ns_extract/dataset.py:66-96``):
``table_NNN.csv`` + ``table_NNN_info.json`` paired by filename stem.
Relational form: rows of (study, filename, payload) → groupBy stem →
pivot on suffix kind → one row per (study, table) with both parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pair_table_files(
    files: DataFrame,
    id_col: str = "url",
    name_col: str = "filename",
    payload_col: str = "payload",
) -> DataFrame:
    """files(url, filename, payload) where filename is like
    'table_000.csv' / 'table_000_info.json' → one row per (url, stem)
    with `data` and `info` columns (null when half is missing, mirroring
    the reference's tolerant pairing)."""
    stem = F.regexp_extract(F.col(name_col), r"^(table_\d+)", 1)
    kind = F.when(F.col(name_col).endswith("_info.json"), "info").otherwise(
        F.when(F.col(name_col).endswith(".csv"), "data")
    )
    tagged = files.select(
        F.col(id_col), stem.alias("stem"), kind.alias("kind"), F.col(payload_col)
    ).where(F.col("stem") != "")
    return (
        tagged.groupBy(id_col, "stem")
        .pivot("kind", ["data", "info"])
        .agg(F.first(payload_col))
    )
