"""End-to-end corpus-prep chain: planted offenders for every stage
must be dropped with the right first-failure reason; clean docs
survive with boilerplate lines removed and PII scrubbed."""

import pytest

from neurostore_text_extraction_spark.plans.corpus_prep import (
    prepare_training_corpus,
)


def _good_text(i: int, n: int = 60) -> str:
    words = " ".join(f"tok{i}x{j}" for j in range(n))
    return f"{words}. Second sentence here. Third sentence now."


@pytest.fixture(scope="module")
def prep(spark):
    a = _good_text(1, 100)
    b = _good_text(2, 100)
    franken = (
        " ".join(a.split(" ")[:40] + b.split(" ")[:40])
        + ". End one. End two. End three."
    )
    docs = [
        (1, a),
        (2, b),
        (3, _good_text(3) + "\nSHARED FOOTER LINE"),
        (4, _good_text(4) + "\nSHARED FOOTER LINE"),
        (5, _good_text(5) + " Contact me at test@example.com for info."),
        (10, None),  # null_text
        (11, _good_text(11) + " lorem ipsum dolor"),  # c4_filter
        (12, "Tiny doc here. Two sentences. Three now."),  # gopher_filter
        (13, a),  # exact duplicate of doc 1 (higher id dropped)
        (14, _good_text(6)),
        (15, _good_text(6) + " near duplicate tail extra"),  # near-dup of 14
        (16, franken),  # substr_dup: half doc 1, half doc 2
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return prepare_training_corpus(df)


def test_drop_reasons_first_failure_wins(prep):
    reasons = {
        r["doc_id"]: r["drop_reason"] for r in prep.tagged.collect()
    }
    assert reasons[10] == "null_text"
    assert reasons[11] == "c4_filter"
    assert reasons[12] == "gopher_filter"
    assert reasons[13] == "exact_dup"
    assert reasons[15] == "near_dup"
    assert reasons[16] == "substr_dup"
    for good in (1, 2, 3, 4, 5, 14):
        assert reasons[good] is None, good


def test_exact_and_near_dup_keep_min_id_representative(prep):
    kept = {r["doc_id"] for r in prep.clean.collect()}
    assert 1 in kept and 13 not in kept
    assert 14 in kept and 15 not in kept


def test_clean_text_is_line_deduped_and_pii_scrubbed(prep):
    rows = {r["doc_id"]: r for r in prep.clean.collect()}
    assert "SHARED FOOTER LINE" not in rows[3]["clean_text"]
    assert "SHARED FOOTER LINE" not in rows[4]["clean_text"]
    assert rows[3]["n_lines_dropped"] == 1
    assert "test@example.com" not in rows[5]["clean_text"]
    assert "<EMAIL>" in rows[5]["clean_text"]
    assert rows[5]["n_pii_redactions"] == 1
    # untouched good doc keeps its text verbatim
    assert rows[1]["clean_text"] == _good_text(1, 100)


def test_report_accounts_for_every_doc(prep):
    rep = {r["reason"]: r["n_docs"] for r in prep.report.collect()}
    assert rep["kept"] == 6
    assert sum(rep.values()) == 12
    for reason in (
        "null_text", "c4_filter", "gopher_filter",
        "exact_dup", "near_dup", "substr_dup",
    ):
        assert rep[reason] == 1, reason


def test_all_unique_corpus_nothing_dropped(spark):
    df = spark.createDataFrame(
        [(i, _good_text(i)) for i in range(5)], "doc_id long, text string"
    )
    out = prepare_training_corpus(df)
    assert out.clean.count() == 5
    rep = {r["reason"]: r["n_docs"] for r in out.report.collect()}
    assert rep == {"kept": 5}


def test_duplicate_group_survives_when_nominal_min_id_copy_is_filtered(spark):
    """If the min-id copy of a duplicate group fails a filter, the
    surviving copy must be kept as representative — dedup over the
    full corpus would drop the group's content entirely."""
    base = _good_text(8, 100)
    df = spark.createDataFrame(
        [
            (1, base + " lorem ipsum"),  # min-id copy, killed by C4
            (2, base),                   # must survive as representative
            (3, base),                   # exact dup of 2 -> dropped
        ],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(df)
    reasons = {r["doc_id"]: r["drop_reason"] for r in out.tagged.collect()}
    assert reasons[1] == "c4_filter"
    assert reasons[2] is None
    assert reasons[3] == "exact_dup"


def test_empty_docs_not_marked_substr_dup(spark):
    """Token-less docs share no windows (they emit none) — two
    unrelated empty docs must not read as 100% duplicated."""
    df = spark.createDataFrame(
        [(1, "!!! ???"), (2, "??? !!!"), (3, _good_text(9))],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(df, require_c4=False, require_gopher=False)
    reasons = {r["doc_id"]: r["drop_reason"] for r in out.tagged.collect()}
    assert reasons[1] != "substr_dup" and reasons[2] != "substr_dup"
    assert reasons[3] is None


def test_optional_quality_classifier_stage(spark):
    from neurostore_text_extraction_spark.operators.quality_classifier import (
        train_quality_classifier,
    )

    spam = "- buy now ### deal ...\n- click here ...\n- spam spam ..."
    ref = spark.createDataFrame(
        [(_good_text(i),) for i in range(20)], "text string"
    )
    crawl = spark.createDataFrame([(spam,) for _ in range(20)], "text string")
    model = train_quality_classifier(ref, crawl)
    df = spark.createDataFrame(
        [(1, _good_text(50)), (2, spam)], "doc_id long, text string"
    )
    out = prepare_training_corpus(
        df, require_c4=False, require_gopher=False, quality_model=model
    )
    reasons = {r["doc_id"]: r["drop_reason"] for r in out.tagged.collect()}
    assert reasons[1] is None
    assert reasons[2] == "quality_clf"
    scores = {r["doc_id"]: r["quality_clf_score"] for r in out.tagged.collect()}
    assert scores[1] > 0.9 and scores[2] < 0.1


def test_gopher_repetition_drop_reason(spark):
    """Gopher §A1.1 repetition rules as a first-class drop reason
    (flag-gated, default off): a doc that passes C4+Gopher stats but
    is mostly one repeated line drops as 'gopher_repetition'."""
    good = (
        "This is a clean enough document with a decent number of words "
        "in every sentence. It talks about several different things in "
        "plain language today. The quick brown fox jumps over the lazy "
        "dog near the river bank. Most lines end with terminal "
        "punctuation as real prose does. A few more sentences pad the "
        "word count comfortably past the Gopher minimum of fifty words "
        "so only the repetition rule separates the two documents here."
    )
    # repeated-line doc: n_words/sentences pass, dup_line_frac ~0.9
    rep_line = "The same boilerplate sentence repeats on every line here."
    repetitive = "\n".join([rep_line] * 10) + "\n" + good
    docs = spark.createDataFrame(
        [(1, good), (2, repetitive)], "doc_id long, text string"
    )
    res = prepare_training_corpus(docs, gopher_repetition=True, eager=False)
    reasons = {r["doc_id"]: r["drop_reason"] for r in res.tagged.collect()}
    assert reasons[1] is None
    assert reasons[2] == "gopher_repetition"
    # default OFF: the repetition reason never fires (doc 2 still
    # drops — as a near-dup of doc 1, whose text it contains — which
    # is the point: the repetition rule catches it EARLIER and
    # cheaper, before any dedup shuffle)
    res2 = prepare_training_corpus(docs, eager=False)
    reasons2 = {r["doc_id"]: r["drop_reason"] for r in res2.tagged.collect()}
    assert reasons2[2] != "gopher_repetition"
