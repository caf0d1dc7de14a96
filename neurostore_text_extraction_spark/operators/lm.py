"""Language-model perplexity scoring (CCNet-style quality filtering —
the third leg of the standard web-corpus triage next to repetition
features and contamination checks; reference scope: the extraction
repo has no LM stage, this is part of the "operations a large-scale
training-data pipeline would need" brief).

CCNet scores every document with a KenLM 5-gram model and keeps the
low-perplexity head/middle. No KenLM in this environment, so the model
is a **bigram MLE with add-one smoothing trained on a reference
corpus** — the same train-then-score shape, expressed as DataFrame
algebra end to end:

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)

    doc score  = mean over the doc's bigrams of -ln p(w2 | w1)
    perplexity = exp(score)

Tokenization matches the repo-wide sklearn convention (lowercased runs
of >=2 word chars) so token streams agree with tfidf/quality oracles.

Scale shape (10^12 docs):

- **Train** (:func:`train_bigram_lm`): explode bigrams → one
  map-side-combinable groupBy for bigram counts; context (w1) totals
  and the vocabulary size V derive from the *bigram* count table
  (vocabulary-sized, not corpus-sized), so training is one shuffle
  over the exploded corpus + one over the vocabulary.
- **Cap**: ``max_vocab`` keeps only the top-V bigrams by count
  (deterministic count-desc / key-asc TakeOrdered). At CCNet scale the
  LM is trained on a sample (e.g. one shard) and the capped count
  tables are MB-sized → both sides **broadcast** in the scoring join;
  the corpus scan stays shuffle-free except the final per-doc mean
  (map-side combinable on doc id).
- **Score** (:func:`score_perplexity`): unseen bigram backs off to the
  context row (c=0 numerator); unseen context backs off to 1/V — every
  doc gets a finite score, so the operator never drops rows on OOV.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .tfidf import tokens_col


def bigrams_col(text_col: str = "text"):
    """Adjacent-token bigrams as 'w1 w2' strings (native zip_with over
    two slices; empty/1-token docs yield an empty array)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )


def bigram_pairs_from_tokens(toks):
    """Adjacent-token (w1, w2) STRUCTS over a bound token-array column
    — the same pairs :func:`bigrams_col` encodes as 'w1 w2' strings
    (tokens are \\w runs, so the space join is bijective), minus the
    concat-then-substring_index round trip per bigram."""
    n = F.size(toks)
    return F.when(
        n < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
    )


def trigrams_from_tokens(toks):
    """Adjacent-token (w1, w2, w3) structs over a bound token-array
    column — :func:`trigrams_col` minus the per-reference re-tokenize."""
    n = F.size(toks) - 2
    pairs = F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return F.when(F.size(toks) < 3, F.array().cast(
        "array<struct<w1:string,w2:string,w3:string>>"
    )).otherwise(
        F.zip_with(
            pairs,
            F.slice(toks, 3, n),
            lambda p, c: F.struct(
                p["w1"].alias("w1"), p["w2"].alias("w2"), c.alias("w3")
            ),
        )
    )


@dataclass
class BigramLM:
    """Count tables of a fitted bigram model (both vocabulary-sized).

    ``bigram_counts``: (w1, w2, c) rows; ``context_counts``: (w1, c1)
    rows summed over the *kept* bigrams so add-one probabilities stay a
    proper distribution after a ``max_vocab`` cap; ``vocab_size``: V =
    distinct unigrams observed in either bigram slot."""

    bigram_counts: DataFrame
    context_counts: DataFrame
    vocab_size: int


def train_bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    max_vocab: int | None = None,
    tokens: DataFrame | None = None,
) -> BigramLM:
    """One groupBy over the exploded corpus bigrams; everything
    downstream operates on the vocabulary-sized count table.

    ``tokens``: optional pre-tokenized frame carrying a ``_toks``
    array column (``dedup.with_tokens``) — pass a PERSISTED one when
    several train/score calls share a corpus, so the regexp tokenizer
    runs once for the whole query instead of once per call. Bigrams
    group as (w1, w2) structs; counts are identical to the former
    'w1 w2' string grouping (the space join was bijective)."""
    src = (
        tokens.select(F.col("_toks").alias("_toks"))
        if tokens is not None
        else corpus.select(tokens_col(text_col).alias("_toks"))
    )
    bg = (
        src.select(F.explode(bigram_pairs_from_tokens(F.col("_toks"))).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c"))
    )
    if max_vocab is not None:
        bg = bg.orderBy(
            F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).limit(max_vocab)
    split = bg.select("w1", "w2", "c")
    # cache: vocab_size + context totals + the scoring join all read it
    split = split.localCheckpoint(eager=True)
    ctx = split.groupBy("w1").agg(F.sum("c").cast("long").alias("c1"))
    vocab = (
        split.select(F.col("w1").alias("w"))
        .unionAll(split.select(F.col("w2").alias("w")))
        .distinct()
        .count()
    )
    return BigramLM(bigram_counts=split, context_counts=ctx, vocab_size=int(vocab))


def score_perplexity(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens: DataFrame | None = None,
) -> DataFrame:
    """Per-doc mean negative log-likelihood and perplexity under
    ``lm``: (id, n_bigrams, avg_neg_logp, perplexity). Docs with <2
    tokens have no bigrams → n_bigrams 0, NULL scores (callers filter
    or impute; CCNet drops them).

    ``id_col`` must be unique (it is the corpus key everywhere in this
    repo): a duplicated id yields one output row per input row. This
    is deliberately NOT validated here — deduplicating defensively
    would cost a corpus-wide shuffle on every call; callers holding a
    multi-snapshot union must latest-pick (``Catalog.read_latest``)
    first.

    Both count tables are vocabulary-sized → broadcast joins; the only
    shuffle over the corpus is the final doc-id aggregation.
    ``tokens``: optional pre-tokenized (id, _toks) frame."""
    v = float(lm.vocab_size)
    src = (
        tokens
        if tokens is not None
        else docs.select(F.col(id_col), tokens_col(text_col).alias("_toks"))
    )
    doc_bg = src.select(
        F.col(id_col),
        F.explode(bigram_pairs_from_tokens(F.col("_toks"))).alias("bg"),
    ).select(id_col, "bg.w1", "bg.w2")
    joined = (
        doc_bg.join(F.broadcast(lm.bigram_counts), ["w1", "w2"], "left")
        .join(F.broadcast(lm.context_counts), ["w1"], "left")
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(v))
                )
            ).alias("neg_logp"),
        )
    )
    scored = joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.avg("neg_logp").alias("avg_neg_logp"),
    )
    # left join back so 0-bigram docs keep a row; the id column is the
    # corpus key (unique by contract), so no distinct() — that would be
    # a second full shuffle of every doc id just to dedupe nothing
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("avg_neg_logp"),
            F.exp(F.col("avg_neg_logp")).alias("perplexity"),
        )
    )


def trigrams_col(text_col: str = "text"):
    """Adjacent-token trigram (w1, w2, w3) structs via three aligned
    slices zipped pairwise — linear, like :func:`bigrams_col`."""
    toks = tokens_col(text_col)
    n = F.size(toks) - 2
    pairs = F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return F.when(F.size(toks) < 3, F.array().cast(
        "array<struct<w1:string,w2:string,w3:string>>"
    )).otherwise(
        F.zip_with(
            pairs,
            F.slice(toks, 3, n),
            lambda p, c: F.struct(
                p["w1"].alias("w1"), p["w2"].alias("w2"), c.alias("w3")
            ),
        )
    )


@dataclass
class BackoffLM:
    """Stupid-backoff n-gram model (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the web-scale LM):
    raw count tables, no normalization at train time."""

    trigram_counts: DataFrame  # (w1, w2, w3, c3)
    bigram_counts: DataFrame  # (w1, w2, c2)
    unigram_counts: DataFrame  # (w, c1)
    n_tokens: int


def train_backoff_lm(
    corpus: DataFrame,
    text_col: str = "text",
    max_vocab: int | None = None,
    tokens: DataFrame | None = None,
) -> BackoffLM:
    """One groupBy per order over the exploded corpus; ``max_vocab``
    caps each table at the top-V rows by count (count desc / key asc —
    deterministic). At CCNet/web scale the capped tables are the
    MB-sized broadcast state; training is three shuffles over the
    exploded corpus.

    ``tokens``: optional pre-tokenized ``_toks`` frame (pass a
    persisted one to share a single tokenizer pass across the three
    count tables — and with the sibling bigram-LM/scoring calls).
    N is summed from the CHECKPOINTED unigram table when no cap is
    set (the uncapped table is the full count table), saving the
    extra corpus pass the pre-r6 shape spent on it."""
    src = (
        tokens.select(F.col("_toks").alias("_toks"))
        if tokens is not None
        else corpus.select(tokens_col(text_col).alias("_toks"))
    )
    uni = (
        src.select(F.explode(F.col("_toks")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c1"))
    )
    bg = (
        src.select(F.explode(bigram_pairs_from_tokens(F.col("_toks"))).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c2"))
    )
    tg = (
        src.select(F.explode(trigrams_from_tokens(F.col("_toks"))).alias("t"))
        .select("t.w1", "t.w2", "t.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").cast("long").alias("c3"))
    )
    if max_vocab is not None:
        n_tokens = int(uni.agg(F.coalesce(F.sum("c1"), F.lit(0))).first()[0])
        uni = uni.orderBy(F.col("c1").desc(), F.col("w").asc()).limit(max_vocab)
        bg = bg.orderBy(
            F.col("c2").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).limit(max_vocab)
        tg = tg.orderBy(
            F.col("c3").desc(), F.col("w1").asc(), F.col("w2").asc(), F.col("w3").asc()
        ).limit(max_vocab)
        uni_ck = uni.localCheckpoint(eager=True)
        tg_ck, bg_ck = (
            tg.localCheckpoint(eager=True),
            bg.localCheckpoint(eager=True),
        )
    else:
        # the three count-table materializations are independent
        # actions over the same (persisted) token source — submit them
        # from driver threads so their stages overlap instead of
        # paying three serialized job latencies (guide §2.6: actions
        # are only sequential because the driver calls them
        # sequentially)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(3) as pool:
            f_uni = pool.submit(lambda: uni.localCheckpoint(eager=True))
            f_tg = pool.submit(lambda: tg.localCheckpoint(eager=True))
            f_bg = pool.submit(lambda: bg.localCheckpoint(eager=True))
            uni_ck, tg_ck, bg_ck = f_uni.result(), f_tg.result(), f_bg.result()
        n_tokens = int(uni_ck.agg(F.coalesce(F.sum("c1"), F.lit(0))).first()[0])
    return BackoffLM(
        trigram_counts=tg_ck,
        bigram_counts=bg_ck,
        unigram_counts=uni_ck,
        n_tokens=n_tokens,
    )


SBO_ALPHA = 0.4  # Brants et al.'s backoff factor


def score_stupid_backoff(
    docs: DataFrame,
    lm: BackoffLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens: DataFrame | None = None,
) -> DataFrame:
    """Per-doc mean negative log stupid-backoff score:

        S(w3|w1,w2) = c3/c2(w1,w2)           if the trigram was seen
                    | α·c2(w2,w3)/c1(w2)     else if that bigram was
                    | α²·max(c1(w3),1)/N     else (unseen w3 floors at
                                              pseudo-count 1 — SBO's
                                              score 0 has no log)

    (id, n_trigrams, avg_neg_logscore). Docs with <3 tokens → 0
    trigrams, NULL score. All four count lookups are broadcast joins
    (the capped tables are the model); the only corpus shuffle is the
    final per-doc mean. Same unique-id contract as
    :func:`score_perplexity`. ``tokens``: optional pre-tokenized
    (id, _toks) frame."""
    n = float(max(lm.n_tokens, 1))
    src = (
        tokens
        if tokens is not None
        else docs.select(F.col(id_col), tokens_col(text_col).alias("_toks"))
    )
    doc_tg = src.select(
        F.col(id_col), F.explode(trigrams_from_tokens(F.col("_toks"))).alias("t")
    ).select(id_col, "t.w1", "t.w2", "t.w3")
    tg = lm.trigram_counts
    bg_pre = lm.bigram_counts.select(
        F.col("w1"), F.col("w2"), F.col("c2").alias("_c2_prefix")
    )
    bg_back = lm.bigram_counts.select(
        F.col("w1").alias("w2"),
        F.col("w2").alias("w3"),
        F.col("c2").alias("_c2_back"),
    )
    uni_mid = lm.unigram_counts.select(
        F.col("w").alias("w2"), F.col("c1").alias("_c1_mid")
    )
    uni_last = lm.unigram_counts.select(
        F.col("w").alias("w3"), F.col("c1").alias("_c1_last")
    )
    joined = (
        doc_tg.join(F.broadcast(tg), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(bg_pre), ["w1", "w2"], "left")
        .join(F.broadcast(bg_back), ["w2", "w3"], "left")
        .join(F.broadcast(uni_mid), ["w2"], "left")
        .join(F.broadcast(uni_last), ["w3"], "left")
    )
    # Each level is gated on its DENOMINATOR too: with max_vocab the
    # tables are capped independently, so a kept trigram's prefix
    # bigram (or a kept backoff bigram's w2 unigram) may be absent —
    # ungated, c3/_c2_prefix would be NULL and F.avg would silently
    # skip the trigram while n_trigrams still counts it (biased mean).
    # Gated, the inconsistent lookup falls through to the next backoff
    # level and the score is total (never NULL).
    score = (
        F.when(
            F.col("c3").isNotNull() & F.col("_c2_prefix").isNotNull(),
            F.col("c3") / F.col("_c2_prefix"),
        )
        .when(
            F.col("_c2_back").isNotNull() & F.col("_c1_mid").isNotNull(),
            F.lit(SBO_ALPHA) * F.col("_c2_back") / F.col("_c1_mid"),
        )
        .otherwise(
            F.lit(SBO_ALPHA * SBO_ALPHA)
            * F.greatest(F.coalesce(F.col("_c1_last"), F.lit(0)), F.lit(1))
            / F.lit(n)
        )
    )
    scored = (
        joined.select(F.col(id_col), (-F.log(score)).alias("nls"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.avg("nls").alias("avg_neg_logscore"),
        )
    )
    return docs.select(id_col).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_trigrams"), F.lit(0)).cast("long").alias("n_trigrams"),
        F.col("avg_neg_logscore"),
    )
