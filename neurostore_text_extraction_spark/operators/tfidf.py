"""TF-IDF as a two-phase DataFrame aggregation with exact sklearn
parity (U3/A3; reference ``ns_extract/pipelines/tfidf/model.py:18-129``
delegates to ``sklearn.TfidfVectorizer``).

sklearn semantics mirrored exactly (unit-pinned in tests):
- tokenizer: lowercase, token_pattern ``(?u)\\b\\w\\w+\\b`` — i.e.
  maximal runs of >=2 word characters;
- tf: raw count of term in doc;
- smooth idf: ``ln((1+n)/(1+df)) + 1``;
- min_df document-frequency floor (count form);
- l2 normalization per document.

Spark shape: tokenize (native ``regexp_extract_all``) → ``explode`` →
two groupBys. The df-phase output is small (vocabulary-sized) and is
broadcast back onto the per-doc term counts — the corpus-wide state the
reference materializes on the driver (``base.py:561-585``) becomes a
broadcast join, which is what makes this work at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# maximal runs of >=2 word chars ≙ sklearn's (?u)\b\w\w+\b
TOKEN_REGEX = r"\w\w+"


def tokens_col(text_col: str = "text"):
    return F.expr(f"regexp_extract_all(lower({text_col}), r'{TOKEN_REGEX}', 0)")


def document_frequency(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_df: int = 1
) -> DataFrame:
    """term → number of docs containing it (phase 1). Map-side partial
    aggregation applies on both groupBys; AQE coalesces the small
    shuffle."""
    terms = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("term")
    ).distinct()
    return (
        terms.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
    )


def tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    vocabulary: list[str] | None = None,
    max_vocab: int | None = None,
) -> DataFrame:
    """(doc, term, tfidf) rows, l2-normalized per doc — the exploded
    form of the reference's per-doc ``{term: score}`` map. Collect back
    with ``map_from_entries(collect_list(...))`` if map shape is needed.

    The idf table is broadcast back onto the per-doc counts; at corpus
    scale an unbounded vocabulary would blow the broadcast, so cap it:
    ``min_df`` floors document frequency (sklearn semantics) and
    ``max_vocab`` keeps only the top-V terms by df (desc, term asc
    tie-break — a global TakeOrdered, no full sort). sklearn's
    ``max_features`` has the same contract."""
    n_docs = df.select(id_col).distinct().count()  # scalar; one cheap job
    tf = (
        df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    # document frequency DERIVED from the tf table (exactly one row per
    # (doc, term), so counting rows per term == counting distinct docs
    # per term): one tokenize+explode pass and one exchange for the
    # whole query instead of a second full corpus pass through
    # explode+distinct (r6; document_frequency stays the standalone
    # API). The shared groupBy(id, term) exchange is deduped by
    # ReuseExchange across the tf/df consumers at runtime.
    dfreq = (
        tf.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
    )
    if vocabulary is not None:
        vocab_df = tf.sparkSession.createDataFrame(
            [(v,) for v in vocabulary], "term string"
        )
        dfreq = dfreq.join(F.broadcast(vocab_df), "term", "inner")
    if max_vocab is not None:
        dfreq = dfreq.orderBy(F.col("df").desc(), F.col("term").asc()).limit(max_vocab)
    idf = dfreq.select(
        "term",
        (F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df"))) + 1.0)
        .alias("idf"),
    )
    raw = tf.join(F.broadcast(idf), "term", "inner").select(
        F.col(id_col), F.col("term"), (F.col("tf") * F.col("idf")).alias("w")
    )
    # l2 norm per doc via window (single shuffle on id_col, reused)
    norm = raw.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    return raw.join(norm, id_col).select(
        F.col(id_col), F.col("term"), (F.col("w") / F.col("norm")).alias("tfidf")
    )
