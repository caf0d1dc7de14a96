"""Streaming quality filtering (SURVEY §2.10 × the corpus-prep
filters): the C4/Gopher signal columns and the folded
quality-classifier score are pure narrow expressions, so the same
filter runs unchanged on a crawl STREAM — no state, no watermark, no
Python. Dedup-family stages stay batch/`dropDuplicatesWithinWatermark`
territory; this is the stateless front half of corpus prep applied at
ingest time (drop junk before it ever lands in the lake).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.textquality import c4_counts, c4_out_cols, c4_prebind_cols


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    require_c4: bool = True,
    require_gopher: bool = True,
    quality_model=None,
    min_clf_score: float = 0.5,
) -> DataFrame:
    """Keep docs passing the stateless quality gates; works identically
    on batch and streaming frames (asserted by test). ``quality_model``
    is any object with ``score_col(prefix)`` (see
    ``operators/quality_classifier``) — its coefficients are literals,
    so scoring streams without a stream-static join."""
    # staged projections (r6, mirroring plans/corpus_prep): arrays and
    # counts bind as attributes so each split/fold evaluates once per
    # row — the single-projection signal dict re-split the text at
    # every keep-flag/feature reference. Stateless either way: still
    # stream-safe, no watermark, no Python.
    pre_raw = c4_prebind_cols(F.coalesce(F.col(text_col), F.lit("")))
    pre_cols = {"_qp" + n: c for n, c in pre_raw.items()}
    pre = df.withColumns(pre_cols)
    count_raw = c4_counts(
        F.col("_qp_t"), F.col("_qp_words"), F.col("_qp_lines")
    )
    count_cols = {"_qp" + n: c for n, c in count_raw.items()}
    out = pre.withColumns(count_cols).drop(*pre_cols)
    sig = c4_out_cols({n: F.col("_qp" + n) for n in count_raw})
    out = out.withColumns(
        {"_keep_c4": sig["keep_c4"], "_keep_gopher": sig["keep_gopher"]}
    )
    cond: Column = F.col(text_col).isNotNull()
    if require_c4:
        cond = cond & F.col("_keep_c4")
    if require_gopher:
        cond = cond & F.col("_keep_gopher")
    if quality_model is not None:
        from ..operators.quality_classifier import FEATURE_COLS

        out = out.withColumns(
            {"_qf_" + c: sig[c].cast("double") for c in FEATURE_COLS}
        ).withColumn(
            "quality_clf_score", F.round(quality_model.score_col("_qf_"), 6)
        )
        cond = cond & (F.col("quality_clf_score") >= min_clf_score)
        out = out.drop(*["_qf_" + c for c in FEATURE_COLS])
    return out.where(cond).drop("_keep_c4", "_keep_gopher", *count_cols)
