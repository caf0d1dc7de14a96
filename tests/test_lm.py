"""Bigram-LM perplexity scoring (CCNet-style quality filter):
hand-computed probabilities, OOV back-off, vocab cap determinism, and
a plan assert that the scoring joins are broadcasts (the corpus scan
must stay shuffle-free up to the per-doc mean)."""

import math

import pytest

from neurostore_text_extraction_spark.operators import lm


@pytest.fixture(scope="module")
def model(spark):
    corpus = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], "doc_id int, text string"
    )
    return lm.train_bigram_lm(corpus)


def test_train_counts(model):
    counts = {
        (r["w1"], r["w2"]): r["c"] for r in model.bigram_counts.collect()
    }
    # bigrams: (the,cat) x2, (cat,sat), (cat,ran)
    assert counts == {("the", "cat"): 2, ("cat", "sat"): 1, ("cat", "ran"): 1}
    ctx = {r["w1"]: r["c1"] for r in model.context_counts.collect()}
    assert ctx == {"the": 2, "cat": 2}
    # vocab = {the, cat, sat, ran}
    assert model.vocab_size == 4


def test_score_known_and_oov(spark, model):
    docs = spark.createDataFrame(
        [(10, "the cat"), (11, "the dog"), (12, "zz")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in lm.score_perplexity(docs, model).collect()}
    # p(cat|the) = (2+1)/(2+4) = 0.5
    assert got[10]["n_bigrams"] == 1
    assert got[10]["avg_neg_logp"] == pytest.approx(-math.log(0.5))
    assert got[10]["perplexity"] == pytest.approx(2.0)
    # unseen bigram with seen context: p(dog|the) = (0+1)/(2+4)
    assert got[11]["avg_neg_logp"] == pytest.approx(-math.log(1 / 6))
    # <2 tokens → no bigrams, NULL scores, row preserved
    assert got[12]["n_bigrams"] == 0 and got[12]["avg_neg_logp"] is None


def test_oov_context_backs_off_to_uniform(spark, model):
    docs = spark.createDataFrame([(1, "qq ww")], "doc_id int, text string")
    got = lm.score_perplexity(docs, model).collect()[0]
    # unseen context: p = (0+1)/(0+V) = 1/4
    assert got["avg_neg_logp"] == pytest.approx(-math.log(1 / 4))


def test_lower_perplexity_for_in_domain_text(spark, model):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "sat ran the zz qq")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["perplexity"] for r in lm.score_perplexity(docs, model).collect()}
    assert got[1] < got[2]


def test_max_vocab_cap_deterministic(spark):
    corpus = spark.createDataFrame(
        [(1, "aa bb aa bb aa cc")], "doc_id int, text string"
    )
    # bigram counts: (aa,bb)x2, (bb,aa)x2, (aa,cc)x1 → cap 2 keeps the
    # two count-2 bigrams (tie broken by key asc)
    model = lm.train_bigram_lm(corpus, max_vocab=2)
    kept = sorted((r["w1"], r["w2"]) for r in model.bigram_counts.collect())
    assert kept == [("aa", "bb"), ("bb", "aa")]


def test_scoring_plan_broadcasts_counts(spark, model):
    docs = spark.createDataFrame([(1, "the cat")], "doc_id int, text string")
    plan = (
        lm.score_perplexity(docs, model)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LeftOuter" in plan  # back-off joins are left outer...
    assert plan.count("broadcast") >= 2  # ...and both count tables broadcast


@pytest.fixture(scope="module")
def sbo_model(spark):
    corpus = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran to the mat")],
        "doc_id int, text string",
    )
    return lm.train_backoff_lm(corpus)


def test_backoff_counts(sbo_model):
    assert sbo_model.n_tokens == 12
    c3 = {
        (r["w1"], r["w2"], r["w3"]): r["c3"]
        for r in sbo_model.trigram_counts.collect()
    }
    assert c3[("the", "cat", "sat")] == 1 and c3[("the", "cat", "ran")] == 1


def test_stupid_backoff_three_tiers(spark, sbo_model):
    import math

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),   # seen trigram: c3/c2(the,cat) = 1/2
            (2, "on cat sat"),    # unseen trigram, seen bigram (cat,sat):
                                  # 0.4 * c2(cat,sat)/c1(cat) = 0.4*1/2
            (3, "on on mat"),     # unseen both: 0.16*c1(mat)/N = 0.16*2/12
            (4, "on on zz"),      # unseen last word: 0.16*1/12 floor
            (5, "two words"),     # <3 tokens -> no trigram
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in lm.score_stupid_backoff(docs, sbo_model).collect()
    }
    assert got[1]["avg_neg_logscore"] == pytest.approx(-math.log(1 / 2))
    assert got[2]["avg_neg_logscore"] == pytest.approx(-math.log(0.4 * 1 / 2))
    assert got[3]["avg_neg_logscore"] == pytest.approx(-math.log(0.16 * 2 / 12))
    assert got[4]["avg_neg_logscore"] == pytest.approx(-math.log(0.16 * 1 / 12))
    assert got[5]["n_trigrams"] == 0 and got[5]["avg_neg_logscore"] is None


def test_backoff_scoring_plan_broadcasts_all_tables(spark, sbo_model):
    docs = spark.createDataFrame([(1, "the cat sat")], "doc_id int, text string")
    plan = (
        lm.score_stupid_backoff(docs, sbo_model)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("broadcast") >= 5  # trigram, 2x bigram, 2x unigram


def test_capped_tables_inconsistent_lookup_falls_through(spark):
    """max_vocab caps each order's table independently, so a kept
    trigram's prefix bigram (or a kept backoff bigram's w2 unigram)
    may be absent. The score must fall through to the next backoff
    level, never go NULL (which would silently bias F.avg while
    n_trigrams still counts the row) — ADVICE r3 regression."""
    import math

    from pyspark.sql import functions as F

    # trigram (a b c) kept, but its prefix bigram (a,b) capped out;
    # backoff bigram (b,c) kept but its w2 unigram capped out too ->
    # must land on the unigram floor tier, not NULL.
    tg = spark.createDataFrame(
        [("aa", "bb", "cc", 5)], "w1 string, w2 string, w3 string, c3 long"
    )
    bg = spark.createDataFrame([("bb", "cc", 3)], "w1 string, w2 string, c2 long")
    uni = spark.createDataFrame([("cc", 4)], "w string, c1 long")
    model = lm.BackoffLM(
        trigram_counts=tg, bigram_counts=bg, unigram_counts=uni, n_tokens=100
    )
    docs = spark.createDataFrame([(1, "aa bb cc")], "doc_id int, text string")
    row = lm.score_stupid_backoff(docs, model).collect()[0]
    assert row["n_trigrams"] == 1
    # floor tier: alpha^2 * c1(c)/N = 0.16 * 4/100
    assert row["avg_neg_logscore"] == pytest.approx(-math.log(0.16 * 4 / 100))

    # and when only the w2-unigram is missing but the prefix bigram
    # exists, level 1 still applies
    bg2 = spark.createDataFrame(
        [("aa", "bb", 10), ("bb", "cc", 3)], "w1 string, w2 string, c2 long"
    )
    model2 = lm.BackoffLM(
        trigram_counts=tg, bigram_counts=bg2, unigram_counts=uni, n_tokens=100
    )
    row2 = lm.score_stupid_backoff(docs, model2).collect()[0]
    assert row2["avg_neg_logscore"] == pytest.approx(-math.log(5 / 10))
