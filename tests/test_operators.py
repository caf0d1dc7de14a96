"""Operator unit tests on inline data (reference layer-2 style,
``tests/test_word_count.py:25-45``): exact expected values."""

import math

from pyspark.sql import functions as F

from neurostore_text_extraction_spark.operators import dedup, tfidf, wordstats
from neurostore_text_extraction_spark.operators.resolve import (
    pick_latest,
    semver_key,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_count_exact(spark):
    df = _docs(spark, ["This is a test document with exactly ten words, wow.", "", "  ", None, "one"])
    got = {r.doc_id: r.word_count for r in wordstats.word_count(df).collect()}
    assert got == {0: 10, 1: 0, 2: 0, 3: 0, 4: 1}


def test_word_deviance_floor_mean(spark):
    # counts {10, 20} → mean 15 → deviance {5, 5}; with a third doc of
    # 1 word the floor mean is (31 // 3) = 10
    df = _docs(spark, ["w " * 10, "w " * 20])
    got = {r.doc_id: r.word_deviance for r in wordstats.word_deviance(df).collect()}
    assert got == {0: 5, 1: 5}
    df3 = _docs(spark, ["w " * 10, "w " * 20, "w"])
    got3 = {r.doc_id: r.word_deviance for r in wordstats.word_deviance(df3).collect()}
    assert got3 == {0: 0, 1: 10, 2: 9}


def test_tfidf_sklearn_parity(spark):
    """Hand-computed sklearn semantics: smooth idf ln((1+n)/(1+df))+1,
    raw tf, l2 norm, token pattern \\w\\w+ (drops 1-char tokens)."""
    df = _docs(spark, ["aa aa bb x", "bb cc"])
    rows = tfidf.tfidf(df, min_df=1).collect()
    got = {(r.doc_id, r.term): r.tfidf for r in rows}
    idf_aa = math.log(3 / 2) + 1
    idf_bb = math.log(3 / 3) + 1
    idf_cc = math.log(3 / 2) + 1
    w0 = {"aa": 2 * idf_aa, "bb": 1 * idf_bb}
    n0 = math.sqrt(sum(v * v for v in w0.values()))
    w1 = {"bb": idf_bb, "cc": idf_cc}
    n1 = math.sqrt(sum(v * v for v in w1.values()))
    assert ("0x" not in got)  # 1-char token 'x' must not appear
    for (d, t), v in got.items():
        expected = (w0 if d == 0 else w1)[t] / (n0 if d == 0 else n1)
        assert abs(v - expected) < 1e-12, (d, t, v, expected)
    assert len(got) == 4


def test_tfidf_vocabulary_restriction(spark):
    df = _docs(spark, ["aa bb cc", "aa dd"])
    rows = tfidf.tfidf(df, min_df=1, vocabulary=["aa", "dd"]).collect()
    assert {r.term for r in rows} == {"aa", "dd"}


def test_tfidf_max_vocab_caps_broadcast(spark):
    """max_vocab keeps the top-V terms by df (desc, term asc) — the
    broadcast-size guard for corpus-scale vocabularies."""
    df = _docs(spark, ["aa bb cc", "aa bb dd", "aa ee ff"])
    rows = tfidf.tfidf(df, min_df=1, max_vocab=2).collect()
    assert {r.term for r in rows} == {"aa", "bb"}  # df 3 and 2


def test_exact_duplicates(spark):
    df = _docs(spark, ["same text here", "same text here", "different"])
    rows = {r.text_md5: (r.n_docs, r.representative) for r in dedup.exact_duplicates(df).collect()}
    assert sorted(v[0] for v in rows.values()) == [1, 2]
    assert any(v == (2, 0) for v in rows.values())


def test_minhash_identical_docs_estimate_one(spark):
    df = _docs(spark, ["alpha beta gamma delta epsilon zeta", "alpha beta gamma delta epsilon zeta", "unrelated words entirely other thing box"])
    pairs = dedup.minhash_lsh_pairs(df).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.doc_a, p.doc_b, p.est_jaccard) == (0, 1, 1.0)


def test_simhash_identical_equal_similar_close(spark):
    df = _docs(spark, ["the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over the lazy dog", "completely unrelated terms about spacecraft telemetry systems"])
    got = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]


def test_ngram_jaccard_exact_value(spark):
    # doc0: shingles {a b c, b c d}; doc1: {a b c}; jaccard = 1/2
    df = _docs(spark, ["aa bb cc dd", "aa bb cc"])
    rows = dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert len(rows) == 1
    assert abs(rows[0].jaccard - 0.5) < 1e-12


def test_ngram_jaccard_df_cap_prunes_boilerplate(spark):
    """A shingle shared by every doc (boilerplate) must be dropped by
    the df cap BEFORE the self-join — here max_df=2 with 3 docs sharing
    'copyright footer text' leaves no shared shingles, so no pairs."""
    boiler = "copyright footer text"
    df = _docs(spark, [f"{boiler} unique alpha", f"{boiler} other beta", f"{boiler} third gamma"])
    with_cap = dedup.ngram_jaccard_pairs(df, threshold=0.0, max_df=2).collect()
    without_cap = dedup.ngram_jaccard_pairs(df, threshold=0.0, max_df=1000).collect()
    assert len(without_cap) == 3  # all pairs share the boilerplate shingle
    assert len(with_cap) == 0


def test_simhash_pairs_finds_identical(spark):
    df = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",
            "completely unrelated terms about spacecraft telemetry systems",
        ],
    )
    rows = dedup.simhash_pairs(df).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in rows] == [(0, 1, 0)]


def test_connected_components_clusters(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_minhash_bucket_cap_drops_degenerate_bucket(spark):
    """With bucket_cap=1 every band bucket is over-full for the
    identical pair → no candidates survive."""
    df = _docs(spark, ["alpha beta gamma delta", "alpha beta gamma delta"])
    assert len(dedup.minhash_lsh_pairs(df, bucket_cap=1).collect()) == 0
    assert len(dedup.minhash_lsh_pairs(df, bucket_cap=10).collect()) == 1


def test_dedup_caps_have_no_window_node(spark):
    """The bucket/df caps must be groupBy-count + broadcast anti-join,
    never count().over(Window.partitionBy(band/shingle)) — a window
    partition is one task, so the degenerate bucket the cap exists to
    drop would be materialized in a single task's state (the exact
    straggler the guard prevents). eager=False exposes the lazy plan."""
    df = _docs(spark, ["alpha beta gamma delta", "alpha beta gamma delta epsilon"])
    for frame in (
        dedup.minhash_lsh_pairs(df, eager=False),
        dedup.ngram_jaccard_pairs(df, threshold=0.0, eager=False),
    ):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        assert "Window" not in plan, plan
        assert "LeftAnti" in plan, plan


def test_dedup_eager_unpersists_intermediates(spark):
    """Eager paths must not leak the big INTERMEDIATE persists
    (signatures / shingle / window frames) into the CacheManager
    across calls (ADVICE: persist-leak in long-lived sessions).
    Allowed residue per call: small-result localCheckpoint RDDs and
    substr's reliable-checkpoint result files — both freed by the
    ContextCleaner on GC, neither registered in the CacheManager
    (a persist()-based materialization WOULD be, and would leak
    until explicit unpersist — the round-4 review finding that moved
    _materialize_recoverable to reliable checkpoint)."""
    spark.catalog.clearCache()
    df = _docs(spark, ["alpha beta gamma delta", "alpha beta gamma delta"])
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    dedup.minhash_lsh_pairs(df, eager=True).collect()
    dedup.ngram_jaccard_pairs(df, threshold=0.0, eager=True).collect()
    dedup.simhash_pairs(df).collect()
    dedup.substr_dup_stats(df, window_tokens=3).collect()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    # 4 calls -> at most 4 result RDDs, no intermediates
    assert after - before <= 4
    # and NOTHING remains registered in the session CacheManager
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty()


def test_materialize_recoverable_warns_once_on_bare_session(spark):
    """VERDICT r4 #6: falling back to unreplicated localCheckpoint on a
    session without cleanCheckpoints must warn LOUDLY (exactly once per
    process), and must NOT warn on the production factory session."""
    import warnings
    from unittest import mock

    df = _docs(spark, ["alpha beta", "gamma delta"])
    # production session (get_spark sets cleanCheckpoints=true): silent
    dedup._WARNED_LOCAL_FALLBACK = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        dedup._materialize_recoverable(df).collect()
    assert not [w for w in rec if issubclass(w.category, RuntimeWarning)]
    # bare session (conf absent): warn once, then stay quiet
    with mock.patch.object(
        type(spark.conf), "get", lambda self, k, d=None: "false"
    ):
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            dedup._materialize_recoverable(df).collect()
            dedup._materialize_recoverable(df).collect()
    msgs = [w for w in rec if issubclass(w.category, RuntimeWarning)]
    assert len(msgs) == 1
    assert "cleanCheckpoints" in str(msgs[0].message)
    assert "SPARK_CHECKPOINT_DIR" in str(msgs[0].message)
    dedup._WARNED_LOCAL_FALLBACK = False


def test_lsh_topk_multitable_superset_recall(spark):
    """Identical query vector must always retrieve itself at rank 1."""
    from neurostore_text_extraction_spark.operators import similarity

    data = [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)]) for i in range(20)]
    emb = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.lsh_topk(
        emb, queries, dim=8, k=3, n_planes=4, n_probes=2, n_tables=4
    ).collect()
    top1 = {r.query_id: r.vec_id for r in out if r.rank == 1}
    assert top1 == {0: 0, 1: 1, 2: 2}


def test_pick_latest_semver(spark):
    df = spark.createDataFrame(
        [("e", "1.2.0"), ("e", "1.10.0"), ("e", "0.9.9")],
        "extractor string, version string",
    )
    got = pick_latest(df, ["extractor"], [semver_key(F.col("version"))]).collect()
    assert got[0].version == "1.10.0"  # numeric, not lexicographic


def test_connected_components_star_matches_propagation(spark):
    """large-star/small-star must produce the identical (node -> min
    of component) mapping as min-label propagation on seeded random
    graphs, including singleton-pair and multi-cluster shapes."""
    import random

    rng = random.Random(42)
    nodes = list(range(120))
    edges = set()
    while len(edges) < 150:
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
    ref = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(pairs).collect()
    }
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_star(pairs).collect()
    }
    assert got == ref


def test_connected_components_star_deep_chain(spark):
    """A 120-node path has diameter 119: min-label propagation cannot
    converge within its default 25 rounds, large-star/small-star
    finishes in O(log^2) rounds — the reason it is the 10^12 path."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_star(pairs).collect()
    }
    assert got == {i: 0 for i in range(120)}


def test_connected_components_star_string_ids(spark):
    """ids need not be numeric — min is lexicographic for strings."""
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_star(pairs).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_substr_dup_stats_hand_computed(spark):
    """ExactSubstr-style window dup stats: 3-token windows, corpus of
    two docs sharing one window, one doc with an internal repeat."""
    from neurostore_text_extraction_spark.operators.dedup import substr_dup_stats

    rows = [
        # doc 1: tokens aa bb cc dd -> windows "aa bb cc", "bb cc dd"
        (1, "aa bb cc dd"),
        # doc 2: tokens bb cc dd ee -> windows "bb cc dd", "cc dd ee"
        (2, "bb cc dd ee"),
        # doc 3: internal repeat -> "xx yy zz" twice among its windows
        (3, "xx yy zz xx yy zz"),
        # doc 4: shorter than the window -> single full-join window
        (4, "qq rr"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in substr_dup_stats(df, window_tokens=3).collect()
    }
    # "bb cc dd" occurs in docs 1 and 2 -> dup in both
    assert got[1]["n_windows"] == 2 and got[1]["n_dup_windows"] == 1
    assert got[2]["n_windows"] == 2 and got[2]["n_dup_windows"] == 1
    assert got[1]["dup_frac"] == 0.5
    # doc 3 windows: "xx yy zz","yy zz xx","zz xx yy","xx yy zz" ->
    # the repeated window counts as dup BOTH times (ExactSubstr
    # removes every occurrence of a repeated span)
    assert got[3]["n_windows"] == 4 and got[3]["n_dup_windows"] == 2
    # doc 4: one unique full-join window, no dups
    assert got[4]["n_windows"] == 1 and got[4]["n_dup_windows"] == 0
