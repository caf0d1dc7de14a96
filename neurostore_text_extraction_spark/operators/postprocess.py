"""Arrow-batched pandas UDFs for the text post-processing functions
(F1–F4). Lives in its own module WITHOUT ``from __future__ import
annotations`` — pyspark's pandas_udf resolves the type hints at
definition time and postponed (string) annotations break it.

The reference applies these via schema-metadata-driven post-processing
(``ns_extract/pipelines/base.py:1097-1226``); here they are plain
column transforms usable in any pipeline stage.
"""

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.textnorm import (
    extract_abbreviations,
    find_and_remove_definitions,
    normalize_string,
    resolve_abbreviations,
)

ABBREV_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("short_text", T.StringType()),
            T.StructField("short_start", T.IntegerType()),
            T.StructField("short_end", T.IntegerType()),
            T.StructField("long_text", T.StringType()),
            T.StructField("long_start", T.IntegerType()),
            T.StructField("long_end", T.IntegerType()),
        ]
    )
)


@pandas_udf(T.StringType())
def normalize_string_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: normalize_string(x) if x is not None else None)


@pandas_udf(ABBREV_SCHEMA)
def extract_abbreviations_udf(s: pd.Series) -> pd.Series:
    def run(x):
        if x is None:
            return None
        return [
            (
                a["short_text"],
                a["short_start"],
                a["short_end"],
                a["long_text"],
                a["long_start"],
                a["long_end"],
            )
            for a in extract_abbreviations(x)
        ]

    return s.map(run)


@pandas_udf(T.StringType())
def resolve_abbreviations_udf(text: pd.Series, source: pd.Series) -> pd.Series:
    """Expand abbreviations defined in `source` within `text` only (no
    definition stripping) — the J3 mention-expansion step
    (``umls_disease/model.py:214-231``)."""

    def run(t, src):
        if t is None:
            return None
        return resolve_abbreviations(t, extract_abbreviations(src) if src else [])

    return pd.Series([run(t, s) for t, s in zip(text, source)])


@pandas_udf(T.StringType())
def resolve_and_clean_udf(text: pd.Series, source: pd.Series) -> pd.Series:
    """Expand abbreviations found in `source` within `text`, then strip
    parenthetical definitions — the reference's post_process chain
    (``base.py:1147-1161``)."""

    def run(t, src):
        if t is None:
            return None
        abbrevs = extract_abbreviations(src) if src else []
        return find_and_remove_definitions(resolve_abbreviations(t, abbrevs), abbrevs)

    return pd.Series([run(t, s) for t, s in zip(text, source)])
