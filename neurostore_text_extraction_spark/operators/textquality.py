"""Text-analysis operators for a training-data pipeline: language-ID,
quality scoring, token counting, document fingerprinting (task brief;
complements the reference's metric normalizers,
``evaluation/scripts/calculate_metrics.py:19-86``).

Everything here is a native column expression (codegen'd, no UDF) and
has an exact DuckDB oracle twin.
"""

from __future__ import annotations

import pandas as pd
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


def _marker_hits(toks: Column, lang: str) -> Column:
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_counts(toks: Column) -> dict[str, Column]:
    """Per-language marker hit counts over a BOUND token-array column
    — the regexp tokenizer runs once per row instead of once per
    language (and once more per reference inside the argmax chain)."""
    return {f"_h_{lang}": _marker_hits(toks, lang) for lang in _LANG_ORDER}


def lang_pred_col(counts: dict[str, Column]) -> Column:
    """argmax over the (bound) hit-count columns; ties resolve in
    _LANG_ORDER (en first); zero hits anywhere → 'und'."""
    hit_cols = {lang: counts[f"_h_{lang}"] for lang in _LANG_ORDER}
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    # build reversed so earlier langs win ties
    for lang in reversed(_LANG_ORDER):
        pred = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """argmax over marker-token hit counts; staged projections bind the
    token array then the four counts as attributes, so tokenizer and
    counts each evaluate once per row (the single-projection form
    re-ran the regexp per language and per argmax reference)."""
    pre = df.select(F.col(id_col), tokens_col(text_col).alias("_toks"))
    counts = lang_counts(F.col("_toks"))
    mid = pre.select(F.col(id_col), *(c.alias(n) for n, c in counts.items()))
    bound = {n: F.col(n) for n in counts}
    return mid.select(F.col(id_col), lang_pred_col(bound).alias("lang_pred"))


def lang_id_nb(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style broad language ID: 24-language char-ngram Naive
    Bayes (``functions/langid.py``, committed deterministic model)
    with a confidence column — the routing stage real pipelines put
    before per-language quality filtering (Wenzek et al. 2020 §4.3).

    Scale shape: one Arrow-batched pandas UDF; the ~1 MB model is a
    module global loaded once per Python worker and reused across
    batches (no broadcast traffic, no per-batch deserialization). The
    narrow 4-language marker heuristic (``lang_id``) stays as the
    zero-Python, SQL-twinnable fast path.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<lang_pred:string,lang_conf:double>")
    def _detect(texts: pd.Series) -> pd.DataFrame:
        from ..functions import langid

        preds = langid.detect_many(texts.tolist())
        return pd.DataFrame(
            {
                "lang_pred": [p[0] for p in preds],
                "lang_conf": [round(p[1], 4) for p in preds],
            }
        )

    out = df.select(F.col(id_col), _detect(F.col(text_col)).alias("_l"))
    return out.select(id_col, "_l.lang_pred", "_l.lang_conf")


def quality_counts(t: Column, toks: Column) -> dict[str, Column]:
    """Per-doc integer counts behind :func:`quality_features`, over
    BOUND text/token-array columns — each count evaluates once per
    row when the caller materializes these as a middle projection."""
    n_chars = F.length(t)
    return {
        "_n_chars": n_chars,
        "_n_tokens": F.size(toks),
        "_stop_hits": F.size(F.filter(toks, lambda x: x.isin(*LANG_MARKERS["en"]))),
        "_n_punct": n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", "")),
        "_tok_len_sum": F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)),
    }


def quality_out_cols(c: dict[str, Column]) -> dict[str, Column]:
    """Output columns of :func:`quality_features` from the (bound)
    count columns — identical arithmetic to the original inline form
    (same integer counts, same double divisions, same rounding)."""
    n_chars, n_tokens = c["_n_chars"], c["_n_tokens"]
    mean_tok_len = F.when(
        n_tokens > 0, c["_tok_len_sum"] / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0, c["_stop_hits"] / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, c["_n_punct"] / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    length_ok = (n_tokens >= 10) & (n_tokens <= 100000)
    tok_len_ok = (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)
    score = (
        F.when(length_ok, 0.4).otherwise(0.0)
        + F.when(tok_len_ok, 0.2).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.2).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.2).otherwise(0.0)
    )
    return {
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": F.round(mean_tok_len, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "quality_score": F.round(score, 2),
    }


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Length / punctuation / stopword-ratio features + a composite
    quality score in [0,1] (gopher-style filters, simplified).

    Staged projections (text+tokens → counts → ratios/score): the
    tokenizer and each count evaluate once per row; the single-
    projection form re-ran the token regexp at every reference."""
    pre = df.select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
        tokens_col(text_col).alias("_toks"),
    )
    counts = quality_counts(F.col("_t"), F.col("_toks"))
    mid = pre.select(F.col(id_col), *(c.alias(n) for n, c in counts.items()))
    out = quality_out_cols({n: F.col(n) for n in counts})
    return mid.select(F.col(id_col), *(c.alias(n) for n, c in out.items()))


def c4_gopher_signal_cols(text_col: str = "text") -> dict[str, Column]:
    """The C4/Gopher signal columns as a name→Column dict, so callers
    composing a wider per-doc plan (e.g. ``plans/corpus_prep``) can
    ``withColumns`` them in place instead of computing a same-
    cardinality frame and join-shuffling it back onto the corpus."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lower = F.lower(t)
    # whitespace words (Gopher counts words, not sklearn tokens)
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
        / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.size(F.split(t, r"#", -1))
        - 1
        + F.size(F.split(t, r"\.\.\.", -1))
        - 1
        + F.size(F.split(t, "…", -1))
        - 1
    )
    symbol_word_ratio = F.when(
        n_words > 0, n_symbols / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_sentences = F.size(F.regexp_extract_all(t, F.lit(r"[^.!?]+[.!?]"), F.lit(0)))
    lines = F.filter(F.split(t, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    frac_term_punct = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike('[.!?"]$')))
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    frac_bullet = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•])")))
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    frac_ellipsis_end = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    frac_alpha = F.when(
        n_words > 0, n_alpha_words / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    has_lorem = lower.contains("lorem ipsum")
    has_brace = t.contains("{")
    has_js_line = F.size(F.filter(lines, lambda l: F.lower(l).contains("javascript"))) > 0
    keep_c4 = (n_sentences >= 3) & ~has_lorem & ~has_brace
    keep_gopher = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (symbol_word_ratio < 0.1)
        & (frac_alpha >= 0.8)
        & (frac_bullet < 0.9)
        & (frac_ellipsis_end < 0.3)
    )
    return {
        "n_words": n_words.cast("long"),
        "n_sentences": n_sentences.cast("long"),
        "mean_word_len": F.round(mean_word_len, 4),
        "symbol_word_ratio": F.round(symbol_word_ratio, 4),
        "frac_alpha_words": F.round(frac_alpha, 4),
        "frac_lines_term_punct": F.round(frac_term_punct, 4),
        "frac_lines_bullet": F.round(frac_bullet, 4),
        "frac_lines_ellipsis_end": F.round(frac_ellipsis_end, 4),
        "has_lorem_ipsum": has_lorem,
        "has_curly_brace": has_brace,
        "has_javascript_line": has_js_line,
        "keep_c4": keep_c4,
        "keep_gopher": keep_gopher,
    }


def c4_prebind_cols(t: Column) -> dict[str, Column]:
    """Stage-1 bindings for the staged C4/Gopher path: the coalesced
    text plus its whitespace-word and non-blank-line arrays (each
    split runs once per row; the single-projection form re-split the
    text at every reference)."""
    return {
        "_t": t,
        "_words": F.filter(F.split(t, r"\s+"), lambda w: w != ""),
        "_lines": F.filter(F.split(t, "\n"), lambda l: F.trim(l) != ""),
    }


def c4_counts(t: Column, words: Column, lines: Column) -> dict[str, Column]:
    """Stage-2 integer/boolean signals over the bound text/words/lines
    columns — same expressions as :func:`c4_gopher_signal_cols`."""
    lower = F.lower(t)
    return {
        "_n_words": F.size(words),
        "_n_alpha_words": F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))),
        "_word_len_sum": F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)),
        "_n_symbols": (
            F.size(F.split(t, r"#", -1))
            - 1
            + F.size(F.split(t, r"\.\.\.", -1))
            - 1
            + F.size(F.split(t, "…", -1))
            - 1
        ),
        "_n_sentences": F.size(F.regexp_extract_all(t, F.lit(r"[^.!?]+[.!?]"), F.lit(0))),
        "_n_lines": F.size(lines),
        "_n_term": F.size(F.filter(lines, lambda l: F.trim(l).rlike('[.!?"]$'))),
        "_n_bullet": F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•])"))),
        "_n_ellip": F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))),
        "_has_lorem": lower.contains("lorem ipsum"),
        "_has_brace": t.contains("{"),
        "_has_js": F.size(F.filter(lines, lambda l: F.lower(l).contains("javascript"))) > 0,
    }


def c4_out_cols(c: dict[str, Column]) -> dict[str, Column]:
    """Output columns of :func:`c4_gopher_filters` from the (bound)
    stage-2 signals — identical arithmetic and rounding."""
    n_words, n_lines = c["_n_words"], c["_n_lines"]
    mean_word_len = F.when(
        n_words > 0, c["_word_len_sum"] / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    symbol_word_ratio = F.when(
        n_words > 0, c["_n_symbols"] / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    frac_term_punct = F.when(
        n_lines > 0, c["_n_term"] / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    frac_bullet = F.when(
        n_lines > 0, c["_n_bullet"] / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    frac_ellipsis_end = F.when(
        n_lines > 0, c["_n_ellip"] / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    frac_alpha = F.when(
        n_words > 0, c["_n_alpha_words"] / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    keep_c4 = (c["_n_sentences"] >= 3) & ~c["_has_lorem"] & ~c["_has_brace"]
    keep_gopher = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (symbol_word_ratio < 0.1)
        & (frac_alpha >= 0.8)
        & (frac_bullet < 0.9)
        & (frac_ellipsis_end < 0.3)
    )
    return {
        "n_words": n_words.cast("long"),
        "n_sentences": c["_n_sentences"].cast("long"),
        "mean_word_len": F.round(mean_word_len, 4),
        "symbol_word_ratio": F.round(symbol_word_ratio, 4),
        "frac_alpha_words": F.round(frac_alpha, 4),
        "frac_lines_term_punct": F.round(frac_term_punct, 4),
        "frac_lines_bullet": F.round(frac_bullet, 4),
        "frac_lines_ellipsis_end": F.round(frac_ellipsis_end, 4),
        "has_lorem_ipsum": c["_has_lorem"],
        "has_curly_brace": c["_has_brace"],
        "has_javascript_line": c["_has_js"],
        "keep_c4": keep_c4,
        "keep_gopher": keep_gopher,
    }


def c4_gopher_filters(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The published C4 (Raffel et al. 2020 §2.2) and Gopher (Rae et
    al. 2021, Table A1) document-filter rules as per-doc signal columns
    plus the two composite keep flags — the standard web-corpus triage
    applied before training:

    C4: >=3 sentences; no "lorem ipsum"; no ``{`` (code); and the
    per-line signals behind its line filter (fraction of non-blank
    lines ending in terminal punctuation, any line mentioning
    javascript).
    Gopher: 50..100k words; mean word length 3..10; hash/ellipsis
    symbol-to-word ratio < 0.1; >=80% of words contain an alphabetic
    char; <90% bullet-started lines; <30% ellipsis-ended lines.

    All native column expressions — staged projections (text/words/
    lines → counts → ratios/keeps, each evaluated once per row), no
    shuffle, exact DuckDB twin (joined into the ``quality_features``
    oracle row)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    pre_cols = c4_prebind_cols(t)
    pre = df.select(F.col(id_col), *(c.alias(n) for n, c in pre_cols.items()))
    counts = c4_counts(F.col("_t"), F.col("_words"), F.col("_lines"))
    mid = pre.select(F.col(id_col), *(c.alias(n) for n, c in counts.items()))
    out = c4_out_cols({n: F.col(n) for n in counts})
    return mid.select(F.col(id_col), *(c.alias(n) for n, c in out.items()))


def token_count_cols(t: Column) -> dict[str, Column]:
    """:func:`token_counts`' output columns over a bound trimmed-text
    column (reused by the fused bench query)."""
    ws_tokens = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    word_chars = F.length(F.regexp_replace(t, r"[^0-9A-Za-z]", ""))
    symbols = F.length(F.regexp_replace(t, r"[0-9A-Za-z\s]", ""))
    bpe_est = F.ceil(word_chars / F.lit(4.0)) + symbols
    return {
        "ws_tokens": ws_tokens.cast("long"),
        "bpe_tokens_est": bpe_est.cast("long"),
    }


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (word chars in
    chunks of <=4 plus standalone non-space symbols)."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    cols = token_count_cols(t)
    return df.select(
        F.col(id_col), *(c.alias(n) for n, c in cols.items())
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
    from .dedup import shingles_from_tokens, with_tokens

    # staged: tokens bound once, the md5'd shingle array bound once —
    # the inline form re-ran the tokenizer at every reference and the
    # whole shingle+md5 chain twice (once per array_min/array_max)
    pre = with_tokens(df, id_col, text_col)
    mid = pre.select(
        F.col(id_col),
        F.size(F.col("_toks")).cast("long").alias("n_tokens"),
        F.transform(
            shingles_from_tokens(F.col("_toks"), shingle_words), F.md5
        ).alias("_h"),
    )
    return mid.select(
        F.col(id_col),
        F.array_min(F.col("_h")).alias("fp_min"),
        F.array_max(F.col("_h")).alias("fp_max"),
        F.col("n_tokens"),
    )
