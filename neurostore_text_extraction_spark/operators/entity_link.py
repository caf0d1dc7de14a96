"""Entity linking via char-ngram cosine candidate generation (U7 /
UMLSDiseaseExtractor, ``ns_extract/pipelines/umls_disease/model.py:
67-320``): the reference uses scispacy's ``CandidateGenerator`` (char
3-gram tf-idf ANN over a concept lexicon, k=30) then threshold + top-k
filtering (W4/W5, ``model.py:249-273``).

Re-expressed as pure DataFrame algebra (SQL-oracle-able):
- mention and lexicon strings → lowercased char 3-grams with counts;
- each ngram is weighted by smooth idf over the *lexicon* —
  ln((1+n_concepts)/(1+df)) + 1, sklearn ``TfidfVectorizer`` semantics,
  the same idf twin as ``operators/tfidf.py`` — so high-df trigrams
  ("the", "ion") no longer dominate the cosine (scispacy's
  ``CandidateGenerator`` is a char-3gram *tf-idf* ANN, not raw counts);
  mention ngrams absent from the lexicon vocabulary are dropped, like
  sklearn's fitted-vectorizer ``transform``;
- candidate score = cosine over the weighted ngram vectors, computed
  by an equi-join on the shared ngram (sparse dot product — only
  colliding ngrams contribute), so the pair space is pruned exactly
  like an inverted index;
- per-mention top-k by (score desc, concept_id asc) + score threshold;
  a stricter ``no_definition_threshold`` applies to concepts without a
  definition (``model.py:249-270``).

The lexicon side is small (a concept vocabulary) → broadcast; the
mention side scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _ngram_counts(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, ngram, cnt) rows via native substring explode.

    The lowered text is materialized as a column BEFORE the transform:
    a compound expression (``lower(text)``) captured inside a
    higher-order-function lambda is re-evaluated per element —
    quadratic in string length (the shingles_col/top-word trap). A
    plain column reference binds to the row value once."""
    lowered = df.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("_lc")
    )
    grams = F.when(F.length(F.col("_lc")) < n, F.array(F.col("_lc"))).otherwise(
        F.expr(
            f"transform(sequence(1, length(_lc) - {n - 1}), "
            f"i -> substring(_lc, i, {n}))"
        )
    )
    return (
        lowered.select(F.col(id_col), F.explode(grams).alias("ng"))
        .groupBy(id_col, "ng")
        .agg(F.count("*").cast("double").alias("cnt"))
    )


def link_entities_with_context(
    mentions: DataFrame,
    lexicon: DataFrame,
    source_text: str = "source_text",
    mention_text: str = "mention",
    **kwargs,
) -> DataFrame:
    """J3: group-row ⨝ source doc. The reference re-joins each
    demographics group row to its study's full text and resolves
    abbreviations in the mention span-bounded before candidate
    generation (``umls_disease/model.py:214-231, 289-318``).

    Here the source text is carried through on the mention row (no
    extra shuffle — the join is fused at mention-construction time) and
    the mention is abbreviation-expanded by an Arrow-batched UDF before
    the ngram-cosine linking."""
    from .postprocess import resolve_abbreviations_udf

    resolved = mentions.withColumn(
        mention_text,
        resolve_abbreviations_udf(F.col(mention_text), F.col(source_text)),
    ).drop(source_text)
    return link_entities(resolved, lexicon, mention_text=mention_text, **kwargs)


def link_entities(
    mentions: DataFrame,
    lexicon: DataFrame,
    k: int = 5,
    threshold: float = 0.5,
    no_definition_threshold: float = 0.7,
    mention_id: str = "mention_id",
    mention_text: str = "mention",
    concept_id: str = "concept_id",
    concept_text: str = "concept_name",
    idf_weighting: bool = True,
) -> DataFrame:
    """mentions(mention_id, mention) × lexicon(concept_id, concept_name,
    has_definition) → (mention_id, concept_id, score, rank).

    ``idf_weighting=True`` (default, scispacy ``CandidateGenerator``
    parity — reference ``umls_disease/model.py:239-247``) weights each
    char-3gram by smooth idf fitted on the lexicon before the cosine;
    ``False`` keeps the raw-count cosine (kept for the pytest that
    demonstrates the ranking difference). All idf machinery runs on
    the tiny lexicon side and broadcasts — the mention-side plan gains
    one broadcast-hash join, no extra shuffle."""
    m = _ngram_counts(mentions, mention_id, mention_text)
    c = _ngram_counts(lexicon, concept_id, concept_text)
    if idf_weighting:
        # df per ngram over the lexicon: c is one row per (concept,
        # ngram), so count(*) per ngram IS document frequency. n is a
        # 1-row frame cross-joined in (no driver-side count() job).
        n_concepts = lexicon.select(F.count("*").cast("double").alias("_n"))
        idf = (
            c.groupBy("ng")
            .agg(F.count("*").cast("double").alias("_df"))
            .crossJoin(F.broadcast(n_concepts))
            .select(
                "ng",
                (
                    F.log((F.lit(1.0) + F.col("_n")) / (F.lit(1.0) + F.col("_df")))
                    + F.lit(1.0)
                ).alias("_idf"),
            )
        )
        c = c.join(idf, "ng").select(
            concept_id, "ng", (F.col("cnt") * F.col("_idf")).alias("cnt")
        )
        # inner join = vocabulary restriction: mention ngrams unseen in
        # the lexicon drop out of the vector AND its norm, exactly like
        # transforming with a lexicon-fitted TfidfVectorizer.
        m = m.join(F.broadcast(idf), "ng").select(
            mention_id, "ng", (F.col("cnt") * F.col("_idf")).alias("cnt")
        )
    m_norm = m.groupBy(mention_id).agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("m_norm")
    )
    c_norm = c.groupBy(concept_id).agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("c_norm")
    )
    dots = (
        m.alias("m")
        .join(F.broadcast(c.alias("c")), F.col("m.ng") == F.col("c.ng"))
        .groupBy(mention_id, concept_id)
        .agg(F.sum(F.col("m.cnt") * F.col("c.cnt")).alias("dot"))
    )
    scored = (
        dots.join(m_norm, mention_id)
        .join(F.broadcast(c_norm), concept_id)
        .select(
            mention_id,
            concept_id,
            (F.col("dot") / (F.col("m_norm") * F.col("c_norm"))).alias("score"),
        )
    )
    has_def = lexicon.select(concept_id, "has_definition")
    thresholded = scored.join(F.broadcast(has_def), concept_id).where(
        (F.col("has_definition") & (F.col("score") >= threshold))
        | (~F.col("has_definition") & (F.col("score") >= no_definition_threshold))
    )
    w = Window.partitionBy(mention_id).orderBy(
        F.col("score").desc(), F.col(concept_id).asc()
    )
    return (
        thresholded.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(mention_id, concept_id, "score", "rank")
    )
