"""C4 (Raffel et al. 2020 §2.2) + Gopher (Rae et al. 2021 Table A1)
document-filter rules: hand-computed vectors over tiny docs."""

import pytest

from neurostore_text_extraction_spark.operators.textquality import c4_gopher_filters


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r.asDict() for r in c4_gopher_filters(df).collect()}


GOOD = " ".join(["word"] * 60) + ". Second sentence here. And a third one."


def test_c4_sentence_count_and_flags(spark):
    got = _run(
        spark,
        [
            (1, GOOD),
            (2, "One sentence. Two only."),
            (3, "Has three. Yes three. Truly three. But lorem ipsum inside."),
            (4, "Code doc. With brace. Three sentences. var x = {1};"),
        ],
    )
    assert got[1]["n_sentences"] == 3 and got[1]["keep_c4"] is True
    assert got[2]["n_sentences"] == 2 and got[2]["keep_c4"] is False
    assert got[3]["has_lorem_ipsum"] is True and got[3]["keep_c4"] is False
    assert got[4]["has_curly_brace"] is True and got[4]["keep_c4"] is False


def test_gopher_word_count_bounds(spark):
    few = "Short doc. Second sentence. Third sentence."  # 6 words < 50
    got = _run(spark, [(1, GOOD), (2, few)])
    assert got[1]["n_words"] == 67 and got[1]["keep_gopher"] is True
    assert got[2]["keep_gopher"] is False


def test_gopher_mean_word_len_and_alpha(spark):
    # 60 numeric "words" → frac_alpha 0, mean len 5
    nums = " ".join(["12345"] * 60)
    got = _run(spark, [(1, nums)])
    assert got[1]["mean_word_len"] == pytest.approx(5.0)
    assert got[1]["frac_alpha_words"] == 0.0
    assert got[1]["keep_gopher"] is False


def test_symbol_ratio_counts_hash_and_ellipsis(spark):
    t = "alpha # beta ... gamma … delta"
    got = _run(spark, [(1, t)])
    # 7 words (symbols split as their own words), 3 symbol hits
    assert got[1]["symbol_word_ratio"] == pytest.approx(3 / 7, abs=1e-4)


def test_line_fractions(spark):
    t = "Real sentence line.\n- bullet one\n- bullet two\ntrails off ..."
    got = _run(spark, [(1, t)])
    # "trails off ..." ends in '.' so it counts as terminal punctuation
    # too (C4's rule is literally "ends in a terminal punctuation mark")
    assert got[1]["frac_lines_term_punct"] == pytest.approx(0.5)
    assert got[1]["frac_lines_bullet"] == pytest.approx(0.5)
    assert got[1]["frac_lines_ellipsis_end"] == pytest.approx(0.25)
    assert got[1]["has_javascript_line"] is False


def test_javascript_line_detection(spark):
    got = _run(spark, [(1, "Top line.\nEnable JavaScript to continue.")])
    assert got[1]["has_javascript_line"] is True


def test_null_and_empty(spark):
    got = _run(spark, [(1, None), (2, "")])
    for i in (1, 2):
        assert got[i]["n_words"] == 0
        assert got[i]["keep_c4"] is False
        assert got[i]["keep_gopher"] is False
