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


def add_pipeline(
    pages: DataFrame,
    results: DataFrame,
    extractor: str,
    version: str = "latest",
    config_hash: str = "latest",
    id_col: str = "url",
    payload_cols: tuple[str, ...] = ("payload",),
    warn_dangling: bool = False,
) -> DataFrame:
    """S10 end-to-end upstream-pipeline attach (``ns_extract/
    dataset.py:243-382``): resolve which run of an upstream extractor
    to read, then left-join its per-study payload into pages.

    ``results`` columns: (id, extractor, version, config_hash,
    config_date, *payload_cols).

    - ``version="latest"`` picks the max *semver* over the extractor's
      distinct versions (numeric tuple compare, ``dataset.py:274-296``
      — '1.10.1' beats '1.2.0').
    - ``config_hash="latest"`` picks the newest ``config_date`` within
      the chosen version (``dataset.py:299-331``).
    Both picks are tiny distinct+limit(1) plans broadcast back — no
    driver collect, no full-table shuffle.
    - The attach itself is a left join on the study id; studies with no
      upstream result keep the pages row with null payload, and (like
      the reference's per-study warning, ``dataset.py:350-382``) the
      dangling count is logged when ``warn_dangling``. Default OFF: the
      count is a second full pass over the join output before any
      consumer has run — at scale, derive the dangling count from the
      consumer's own aggregation (payload IS NULL) instead."""
    r = results.where(F.col("extractor") == extractor)
    if version == "latest":
        top_v = (
            r.select("version")
            .distinct()
            .orderBy(semver_key(F.col("version")).desc())
            .limit(1)
        )
        r = r.join(F.broadcast(top_v), "version")
    else:
        r = r.where(F.col("version") == version)
    if config_hash == "latest":
        top_c = (
            r.select("config_hash", "config_date")
            .distinct()
            .orderBy(F.col("config_date").desc(), F.col("config_hash").desc())
            .limit(1)
            .select("config_hash")
        )
        r = r.join(F.broadcast(top_c), "config_hash")
    else:
        r = r.where(F.col("config_hash") == config_hash)
    # newest-prior-result guard (W3): one row per study even if a run
    # was partially rewritten (payload itself is not a sort key — it
    # may be an array/map type)
    r = pick_latest(
        r, [id_col], [F.col("config_date"), F.col("version"), F.col("config_hash")]
    )
    attach = r.select(
        F.col(id_col), F.col("version"), F.col("config_hash"), *payload_cols
    )
    joined = pages.join(attach, id_col, "left")
    if warn_dangling:
        n = joined.where(F.col(payload_cols[0]).isNull()).count()
        if n:
            import logging

            logging.getLogger(__name__).warning(
                "add_pipeline(%s): %d pages have no upstream result", extractor, n
            )
    return joined


def slice_ids(df: DataFrame, ids: list[str], id_col: str = "url") -> DataFrame:
    """Dataset.slice (``dataset.py:207-211``). For large id sets join a
    broadcast ids frame instead of isin."""
    if len(ids) <= 1000:
        return df.where(F.col(id_col).isin(ids))
    ids_df = df.sparkSession.createDataFrame([(i,) for i in ids], f"{id_col} string")
    return df.join(F.broadcast(ids_df), id_col, "left_semi")
