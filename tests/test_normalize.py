"""F1–F4 parity tests against the reference's own vectors
(/root/reference/tests/test_normalize.py:53-199 — behavior
re-specified, not imported)."""

import pytest

from neurostore_text_extraction_spark.functions.textnorm import (
    extract_abbreviations,
    find_and_remove_definitions,
    normalize_string,
    resolve_abbreviations,
)

SENTS = {
    "basic": "Magnetic Resonance Imaging (MRI) revealed structural changes",
    "multiple": (
        "Using Positron Emission Tomography (PET) and "
        "Magnetic Resonance Imaging (MRI) techniques"
    ),
    "mixed_case": (
        "FUNCTIONAL magnetic resonance imaging (fMRI) and "
        "electroencephalogram (EEG) Data"
    ),
    "nested": "Computed Tomography (CT (Computed Tomography)) scans",
    "apostrophe": "Patient's functional magnetic resonance imaging (fMRI) results",
    "non_abbrev": "The study (published in 2023) showed results",
    "complex": (
        "The Diffusion Tensor Imaging (DTI) and "
        "Blood Oxygen Level Dependent (BOLD) signals"
    ),
    "repeated": (
        "The MRI was conducted. After reviewing the MRI results, "
        "another MRI was scheduled."
    ),
}


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("", None),
        ("   ", None),
        ("None", None),
        ("N/A", None),
        ("n/a", None),
        ("NULL", None),
        ("nan", None),
        ("HELLO", "Hello"),
        ("world", "World"),
        ("HeLLo", "Hello"),
        (
            SENTS["apostrophe"],
            "Patient's Functional Magnetic Resonance Imaging (fmri) Results",
        ),
        ("  two   spaced\twords ", "Two Spaced Words"),  # capwords collapses ws
    ],
)
def test_normalize_string(raw, expected):
    assert normalize_string(raw) == expected


@pytest.mark.parametrize(
    "key,expected",
    [
        ("basic", [("MRI", "magnetic resonance imaging")]),
        (
            "multiple",
            [
                ("PET", "positron emission tomography"),
                ("MRI", "magnetic resonance imaging"),
            ],
        ),
        (
            "mixed_case",
            [
                ("fMRI", "functional magnetic resonance imaging"),
                ("EEG", "electroencephalogram"),
            ],
        ),
        (
            "complex",
            [
                ("DTI", "diffusion tensor imaging"),
                ("BOLD", "blood oxygen level dependent"),
            ],
        ),
        ("non_abbrev", []),
    ],
)
def test_extract_abbreviations(key, expected):
    got = extract_abbreviations(SENTS[key])
    pairs = [(g["short_text"], g["long_text"].lower()) for g in got]
    assert pairs == expected
    for g in got:
        assert SENTS[key][g["short_start"] : g["short_end"]] == g["short_text"]
        assert SENTS[key][g["long_start"] : g["long_end"]] == g["long_text"]


def test_resolve_abbreviations_all_occurrences():
    abbrevs = [{"short_text": "MRI", "long_text": "Magnetic Resonance Imaging"}]
    out = resolve_abbreviations(SENTS["repeated"], abbrevs)
    assert out == (
        "The Magnetic Resonance Imaging was conducted. "
        "After reviewing the Magnetic Resonance Imaging results, "
        "another Magnetic Resonance Imaging was scheduled."
    )
    assert resolve_abbreviations("", abbrevs) == ""
    assert resolve_abbreviations(SENTS["non_abbrev"], []) == SENTS["non_abbrev"]


def test_find_and_remove_definitions():
    abbrevs = [{"short_text": "MRI", "long_text": "Magnetic Resonance Imaging"}]
    assert (
        find_and_remove_definitions(SENTS["basic"], abbrevs)
        == "Magnetic Resonance Imaging revealed structural changes"
    )
    # acronym-of-initials path, no known abbrevs needed
    assert (
        find_and_remove_definitions(SENTS["multiple"], [])
        == "Using Positron Emission Tomography and Magnetic Resonance Imaging techniques"
    )
    # non-abbreviation parenthetical must survive
    assert find_and_remove_definitions(SENTS["non_abbrev"], []) == SENTS["non_abbrev"]


def test_integration_chain():
    abbrevs = extract_abbreviations(SENTS["basic"])
    resolved = resolve_abbreviations(SENTS["basic"], abbrevs)
    assert "(Magnetic Resonance Imaging)" in resolved
    cleaned = find_and_remove_definitions(resolved, abbrevs)
    assert "(MRI)" not in cleaned
    assert "revealed structural changes" in cleaned
