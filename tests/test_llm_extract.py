"""U5/U6 LLM prompt-extractor stage tests (mirrors the reference's
``test_participant_demographics.py:12-50`` flow with the deterministic
stub client standing in for the recorded API cassettes)."""

import pytest

from pyspark.sql import functions as F

from neurostore_text_extraction_spark.operators.llm_extract import (
    BrokenJSONClient,
    DEMOGRAPHICS_PROMPT,
    TASK_PROMPT,
    StubLLMClient,
    escape_template_text,
    llm_extract,
    render_prompt,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_escape_template_text():
    assert escape_template_text("costs $100 and $5") == "costs $$100 and $$5"


def test_render_prompt_preserves_document_dollars():
    prompt = render_prompt("Read: ${text}", "the fee is $100 (10% of $1k)")
    assert "the fee is $100 (10% of $1k)" in prompt
    assert prompt.endswith("Call the extractData function to save the output.")


def test_render_prompt_without_escape_would_fail():
    from string import Template

    body = "Read: " + "the fee is $100"  # unescaped document text
    with pytest.raises((KeyError, ValueError)):
        Template(body).substitute()


def test_render_prompt_substitutes_extra_variables():
    out = render_prompt("As a $role, read ${text}", "doc body", role="radiologist")
    assert out.startswith("As a radiologist, read doc body")


def test_llm_demographics_extraction(spark):
    pages = _pages(
        spark,
        [
            ("s1", "We enrolled 24 patients and 25 controls for $5."),
            ("s2", "A cohort of 120 participants was scanned."),
            ("s3", ""),  # empty text short-circuit
            ("s4", None),
        ],
    )
    out = llm_extract(pages, StubLLMClient).collect()
    by_id = {r.url: r for r in out}
    assert [(g.group_name, g["count"]) for g in by_id["s1"].groups] == [
        ("patients", 24),
        ("controls", 25),
    ]
    assert [(g.group_name, g["count"]) for g in by_id["s2"].groups] == [
        ("participants", 120)
    ]
    # groups struct carries the full schema with missing fields null
    assert by_id["s1"].groups[0].male_count is None
    assert by_id["s3"].groups == [] and by_id["s3"].valid
    assert by_id["s4"].groups == [] and by_id["s4"].valid
    assert all(r.valid for r in out)
    assert all(r.error is None for r in out)


def test_llm_task_extraction(spark):
    pages = _pages(spark, [("s1", "Subjects performed the stroop task.")])
    out = llm_extract(
        pages,
        lambda: StubLLMClient(mode="tasks"),
        prompt_template=TASK_PROMPT,
        mode="tasks",
    ).collect()
    assert out[0].tasks == ["stroop"]


def test_llm_broken_reply_fault_isolated(spark):
    """O9: a malformed model reply marks the row invalid with an error
    message; the job itself succeeds."""
    pages = _pages(spark, [("s1", "10 patients"), ("s2", "")])
    out = {r.url: r for r in llm_extract(pages, BrokenJSONClient).collect()}
    assert not out["s1"].valid
    assert "JSONDecodeError" in out["s1"].error
    assert out["s1"].groups is None
    assert out["s2"].valid  # empty-text row unaffected


def test_llm_short_reply_list_errors_unmatched_rows(spark):
    """A client returning fewer replies than prompts must mark the
    unmatched rows with an explicit error — not leave them valid=False
    / error=None, indistinguishable from never-attempted rows."""

    class ShortClient:
        def complete(self, prompts):
            from neurostore_text_extraction_spark.operators.llm_extract import (
                StubLLMClient,
            )

            return StubLLMClient().complete(prompts)[:1]  # drop the rest

    pages = _pages(
        spark, [("s1", "10 patients enrolled."), ("s2", "20 controls enrolled.")]
    ).coalesce(1)  # one Arrow batch so both prompts hit one complete() call
    out = {r.url: r for r in llm_extract(pages, ShortClient).collect()}
    answered = [r for r in out.values() if r.valid]
    unmatched = [r for r in out.values() if not r.valid]
    assert len(answered) == 1 and len(unmatched) == 1
    assert "1 replies for 2 prompts" in unmatched[0].error


def test_llm_chain_into_clean_groups(spark):
    """U5 end-to-end: LLM extraction feeding the F13 post-process."""
    from neurostore_text_extraction_spark.operators.demographics import clean_groups

    pages = _pages(spark, [("s1", "We enrolled 24 patients and 25 controls.")])
    raw = llm_extract(pages, StubLLMClient)
    cleaned = clean_groups(raw.select("url", "groups"), id_col="url")
    rows = {r.group_name: r for r in cleaned.collect()}
    assert rows["patients"]["count"] == 24
    assert rows["controls"]["count"] == 25


def test_prompt_templates_have_text_slot():
    assert "${text}" in DEMOGRAPHICS_PROMPT
    assert "${text}" in TASK_PROMPT
