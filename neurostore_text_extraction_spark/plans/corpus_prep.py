"""The standard web-corpus preparation chain, composed end-to-end:

    C4 + Gopher filters [→ learned quality classifier]
      → exact dedup → MinHash near-dup clustering (keep representative)
      → ExactSubstr dup-fraction cap
      → inter-doc line dedup → PII scrub (transformations)

One call, one cleaned corpus, one per-reason drop report — the
pipeline a training-data user actually runs (C4 §2.2, Gopher A1,
GPT-3 §A.2, RefinedWeb §3, CCNet), built from this repo's operators.

Spark shape: instead of filtering stage-by-stage (each stage a
separate pass with its own count() job for reporting), docs are tagged
with their FIRST failing stage across three plan groups:

- group 1 over the FULL corpus: the narrow filter signals
  (null/C4/Gopher);
- group 2 over the filter SURVIVORS: doc-level dedup keep-sides
  (exact groupBy min-id; minhash pairs → connected components →
  min-label) — representatives must be chosen among survivors, or a
  filter-dropped copy could be the nominal representative and the
  whole duplicate group would vanish;
- group 3 over the dedup SURVIVORS: span-level signals (substr dup
  fraction, line dedup, PII scrub) — sequenced after doc-level dedup
  because an already-dropped duplicate would otherwise poison the
  span statistics of its kept representative;
- one ``drop_reason`` coalesce picks the first failure in pipeline
  order; survivors have reason NULL.

The report is then a single groupBy(drop_reason).count() and the
cleaned corpus a single ``where(drop_reason IS NULL)`` — both off the
same plan, so Spark runs the signal computation once.

Materialization contract (``eager=True``): the three stage frames
(``filtered``, ``pre``, ``tagged``) are CORPUS-cardinality — one row
per input doc — so they are materialized RECOVERABLY
(reliable ``checkpoint`` to the configured checkpoint store — tmpfs
locally, HDFS/S3 on a cluster: a lost executor re-reads the
checkpoint) rather than via ``localCheckpoint``, whose unreplicated
lineage-free executor-local blocks would make a single executor loss
fatal at 10^5-task scale. Small pair/edge frames inside the dedup
operators keep their localCheckpoint fast path (see
``operators/dedup._materialize``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..operators import dedup
from ..operators.textquality import c4_counts, c4_out_cols, c4_prebind_cols
from ..operators.webtext import (
    line_dedup,
    pii_scrub,
    repetition_counts,
    repetition_out_cols,
    repetition_prebind_cols,
)


@dataclass
class PrepResult:
    """``tagged``: every input doc with its signals and ``drop_reason``
    (NULL = kept, text in ``clean_text`` with boilerplate lines removed
    and PII scrubbed). ``clean``: the kept rows. ``report``: one row
    per drop_reason with counts (kept rows under reason 'kept')."""

    tagged: DataFrame
    clean: DataFrame
    report: DataFrame


def prepare_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    require_c4: bool = True,
    require_gopher: bool = True,
    gopher_repetition: bool = False,
    max_dup_line_frac: float = 0.3,
    max_top_word_frac: float = 0.2,
    line_dedup_max_doc_freq: int = 1,
    substr_window_tokens: int = 20,
    max_substr_dup_frac: float = 0.5,
    minhash_threshold: float = 0.7,
    quality_model=None,
    min_clf_score: float = 0.5,
    c4_line_filters: bool = False,
    eager: bool = True,
) -> PrepResult:
    """See module docstring. Stage order (first failure wins):
    ``null_text`` → ``c4_filter`` → ``gopher_filter`` →
    ``gopher_repetition`` (only with ``gopher_repetition=True``:
    Gopher §A1.1 dup-line / top-word thresholds as a pure column
    predicate) → ``quality_clf`` (only when a ``quality_model`` with
    a ``score_col()`` — see ``operators/quality_classifier`` — is
    passed; docs scoring below ``min_clf_score`` drop) → ``exact_dup``
    → ``near_dup`` → ``substr_dup``. Line dedup and PII scrubbing are
    *transformations* of surviving text, not drop reasons.

    Scale notes: the signal operators are narrow maps or single
    groupBys; both dedup keep-sides arrive as (id → keep/cluster)
    frames joined on the id; the near-dup stage reuses the production
    MinHash+LSH path (bucket caps, anti-join guards) and its clusters
    keep the min doc id as representative — matching the exact-dedup
    convention."""
    base = docs.select(F.col(id_col), F.col(text_col))

    # --- stage group 1: the narrow filter signals over the full
    # corpus, appended IN PLACE (a same-cardinality signals frame
    # joined back on the id would shuffle the whole corpus twice for
    # columns that are pure functions of the text). Staged projections
    # (r6): the split arrays and integer counts bind as attributes, so
    # each split/fold/regexp evaluates once per row — the former
    # single-projection signal dicts re-split the text at every
    # reference (keep flag, each feature column, each reason test) ---
    c4_pre = c4_prebind_cols(F.coalesce(F.col(text_col), F.lit("")))
    pre_cols = {"_t": c4_pre["_t"], "_words": c4_pre["_words"], "_lines": c4_pre["_lines"]}
    if gopher_repetition:
        # the repetition signals reuse the non-blank line array (same
        # expression); only the regexp word array is theirs
        pre_cols["_rwords"] = repetition_prebind_cols(text_col)["_words"]
    pre = base.withColumns(pre_cols)
    count_cols = dict(c4_counts(F.col("_t"), F.col("_words"), F.col("_lines")))
    if gopher_repetition:
        rep_raw = repetition_counts(F.col("_lines"), F.col("_rwords"))
        # prefix-rename: the c4 and repetition count dicts both emit
        # _n_lines/_n_words (identical values for lines, DIFFERENT
        # word definitions — whitespace vs regexp)
        count_cols.update({"_r" + n: c for n, c in rep_raw.items()})
    mid = pre.withColumns(count_cols).drop(*pre_cols)
    bound = {n: F.col(n) for n in count_cols}
    sig = c4_out_cols(bound)
    reason = (
        F.when(F.col(text_col).isNull(), F.lit("null_text"))
        .when(F.lit(require_c4) & ~F.col("keep_c4"), F.lit("c4_filter"))
        .when(F.lit(require_gopher) & ~F.col("keep_gopher"), F.lit("gopher_filter"))
    )
    if gopher_repetition:
        rep = repetition_out_cols({n: F.col("_r" + n) for n in rep_raw})
        reason = reason.when(
            (rep["dup_line_frac"] > max_dup_line_frac)
            | (rep["top_word_frac"] > max_top_word_frac),
            F.lit("gopher_repetition"),
        )
    filtered = mid.withColumns(
        {"keep_c4": sig["keep_c4"], "keep_gopher": sig["keep_gopher"]}
    )
    if quality_model is not None:
        # learned filter (quality_classifier.QualityModel, duck-typed
        # on .score_col()): a pure column expression over the same
        # signal columns — still a narrow map, still no join. Feature
        # columns are added first (score_col reads them), then dropped.
        from ..operators.quality_classifier import FEATURE_COLS

        filtered = (
            filtered.withColumns({c: sig[c].cast("double") for c in FEATURE_COLS})
            .withColumn("quality_clf_score", F.round(quality_model.score_col(), 6))
            .drop(*FEATURE_COLS)
        )
        reason = reason.when(
            F.col("quality_clf_score") < min_clf_score, F.lit("quality_clf")
        )
    filtered = filtered.withColumn("drop_reason", reason).drop(*count_cols)
    if eager:
        # consumed by both dedup operators and the final tagging;
        # corpus-sized -> recoverable materialization (module contract)
        filtered = dedup._materialize_recoverable(filtered)

    # --- stage group 2: doc-level dedup over the FILTER SURVIVORS.
    # Dedup's contract is "keep one representative per duplicate
    # group"; choosing the representative from the full corpus would
    # let a filter-dropped doc (e.g. the copy that happens to contain
    # 'lorem ipsum') be the nominal representative, dropping every
    # surviving copy of the content as well — the group would vanish
    # entirely.
    filter_ok = filtered.where(F.col("drop_reason").isNull()).select(
        id_col, text_col
    )
    # exact dedup: keep the min-id representative per text hash
    exact_rep = (
        dedup.exact_duplicates(filter_ok, id_col, text_col)
        .select(F.col("representative").alias(id_col), F.lit(True).alias("_exact_keep"))
    )
    # near-dup: minhash pairs above threshold → clusters → min-id kept
    # pairs stay LAZY regardless of ``eager``: connected_components_star
    # localCheckpoints its edge frame up front, so the minhash tree runs
    # once either way, and the lazy plan avoids the eager cycle's
    # measured 3-8x stalls at high core counts (BENCH/AB_MINHASH.md)
    pairs = dedup.minhash_lsh_pairs(
        filter_ok, id_col, text_col, eager=False
    ).where(F.col("est_jaccard") >= minhash_threshold)
    clusters = dedup.connected_components_star(pairs)  # (doc_id, cluster_id)
    near_drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col), F.lit(True).alias("_near_drop")
    )
    pre = (
        filtered.join(exact_rep, id_col, "left")
        .join(near_drop, id_col, "left")
        .withColumn(
            "drop_reason",
            F.coalesce(
                F.col("drop_reason"),
                F.when(F.col("_exact_keep").isNull(), F.lit("exact_dup")).when(
                    F.col("_near_drop").isNotNull(), F.lit("near_dup")
                ),
            ),
        )
        .drop("_exact_keep", "_near_drop")
    )
    if eager:
        # the survivor frame feeds three downstream operators (substr
        # stats, line dedup, final tagging) — compute the plan once;
        # corpus-sized -> recoverable materialization (module contract)
        pre = dedup._materialize_recoverable(pre)

    # --- stage group 3: span/line-level signals over the dedup
    # SURVIVORS only. Computing them over the full corpus would let
    # docs that are already dropped poison the statistics: a
    # byte-identical pair makes its kept representative's rolling
    # windows (and every one of its lines) look corpus-duplicated, so
    # the representative itself would be dropped/blanked — the reason
    # real pipelines sequence doc-level dedup before span-level dedup.
    survivors = pre.where(F.col("drop_reason").isNull()).select(id_col, text_col)
    ss = dedup.substr_dup_stats(
        survivors, id_col, text_col, window_tokens=substr_window_tokens, eager=eager
    ).select(id_col, "dup_frac")
    # c4_line_filters additionally applies C4 §2.2's line-level drops
    # (terminal punctuation / min words / javascript) in the same
    # reassembly pass — see webtext.c4_line_drop_col
    ld = line_dedup(
        survivors,
        id_col,
        text_col,
        max_doc_freq=line_dedup_max_doc_freq,
        c4_line_filters=c4_line_filters,
    )
    scrubbed = pii_scrub(ld, text_col="clean_text").select(
        F.col(id_col),
        F.col("scrubbed_text").alias("clean_text"),
        "n_lines_dropped",
        (F.col("n_emails") + F.col("n_ssns") + F.col("n_ips") + F.col("n_phones"))
        .cast("long")
        .alias("n_pii_redactions"),
    )

    tagged = (
        pre.join(ss, id_col, "left")
        .join(scrubbed, id_col, "left")
        .withColumn(
            "drop_reason",
            F.coalesce(
                F.col("drop_reason"),
                F.when(
                    F.coalesce(F.col("dup_frac"), F.lit(0.0)) > max_substr_dup_frac,
                    F.lit("substr_dup"),
                ),
            ),
        )
    )
    if eager:
        # one computation of the wide signal plan serves both outputs;
        # corpus-sized -> recoverable materialization (module contract)
        tagged = dedup._materialize_recoverable(tagged)
    clean = tagged.where(F.col("drop_reason").isNull())
    report = (
        tagged.groupBy(
            F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("reason")
        )
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    return PrepResult(tagged=tagged, clean=clean, report=report)
