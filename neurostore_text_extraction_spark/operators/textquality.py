"""Text-analysis operators for a training-data pipeline: language-ID,
quality scoring, token counting, document fingerprinting (task brief;
complements the reference's metric normalizers,
``evaluation/scripts/calculate_metrics.py:19-86``).

Everything here is a native column expression (codegen'd, no UDF) and
has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .tfidf import tokens_col

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with", "for"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
}
_LANG_ORDER = ("en", "es", "de", "fr")  # deterministic tie-break order


def _marker_hits(text_col: str, lang: str) -> Column:
    toks = tokens_col(text_col)
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """argmax over marker-token hit counts; ties resolve in _LANG_ORDER
    (en first); zero hits anywhere → 'und'."""
    hit_cols = {lang: _marker_hits(text_col, lang) for lang in _LANG_ORDER}
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    # build reversed so earlier langs win ties
    for lang in reversed(_LANG_ORDER):
        pred = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select(F.col(id_col), pred.alias("lang_pred"))


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Length / punctuation / stopword-ratio features + a composite
    quality score in [0,1] (gopher-style filters, simplified)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens_col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*LANG_MARKERS["en"]))
    )
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    mean_tok_len = F.when(n_tokens > 0, (
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
        / n_tokens.cast("double"))).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens.cast("double")).otherwise(
        F.lit(0.0)
    )
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars.cast("double")).otherwise(
        F.lit(0.0)
    )
    length_ok = (n_tokens >= 10) & (n_tokens <= 100000)
    tok_len_ok = (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)
    score = (
        F.when(length_ok, 0.4).otherwise(0.0)
        + F.when(tok_len_ok, 0.2).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.2).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.2).otherwise(0.0)
    )
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (word chars in
    chunks of <=4 plus standalone non-space symbols)."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    ws_tokens = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    word_chars = F.length(F.regexp_replace(t, r"[^0-9A-Za-z]", ""))
    symbols = F.length(F.regexp_replace(t, r"[0-9A-Za-z\s]", ""))
    bpe_est = F.ceil(word_chars / F.lit(4.0)) + symbols
    return df.select(
        F.col(id_col),
        ws_tokens.cast("long").alias("ws_tokens"),
        bpe_est.cast("long").alias("bpe_tokens_est"),
    )


def fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 4,
) -> DataFrame:
    """Winnowing-lite document fingerprint: the lexicographic min and
    max md5 over k-word shingles (rolling-hash selection) + token
    count; robust to small edits away from the extremes."""
    toks = tokens_col(text_col)
    sh = F.when(F.size(toks) < shingle_words, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - shingle_words),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_words)),
        )
    )
    hashes = F.transform(sh, F.md5)
    return df.select(
        F.col(id_col),
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
