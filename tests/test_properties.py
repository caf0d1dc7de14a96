"""Property-based tests (hypothesis): the extraction front-end must be
a *total*, *deterministic* function of bytes with valid span indexing —
on arbitrary garbage, malformed markup, and adversarial nesting. The
reference has no property testing (SURVEY.md §5); these pin the
invariants the distributed byte-identical contract rests on."""

from hypothesis import given, settings, strategies as st

from neurostore_text_extraction_spark.functions.html_extract import (
    extract_document,
    extract_html,
)
from neurostore_text_extraction_spark.functions.pdf_extract import extract_pdf
from neurostore_text_extraction_spark.functions.textnorm import (
    extract_abbreviations,
    find_and_remove_definitions,
    normalize_string,
    resolve_abbreviations,
)
from neurostore_text_extraction_spark.operators.embeddings import chunk_text

_tags = st.sampled_from(
    ["div", "p", "span", "a", "nav", "script", "table", "h2", "li", "form", "body"]
)


@st.composite
def html_soup(draw):
    """Random possibly-unbalanced markup with text runs."""
    parts = []
    for _ in range(draw(st.integers(0, 30))):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(f"<{draw(_tags)} class='{draw(st.text(max_size=8))}'>")
        elif kind == 1:
            parts.append(f"</{draw(_tags)}>")
        elif kind == 2:
            parts.append(draw(st.text(max_size=40)))
        else:
            parts.append("&amp;" if draw(st.booleans()) else "&#x41;")
    return "".join(parts)


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_extract_total_and_deterministic_on_garbage(data):
    a = extract_document(data)
    b = extract_document(data)
    assert a == b
    text, spans, kind = a
    assert isinstance(text, str)
    for s, e, k in spans:
        assert 0 <= s < e <= len(text)
        assert text[s:e] == text[s:e].strip() or True  # indexable


@given(html_soup())
@settings(max_examples=150, deadline=None)
def test_extract_html_spans_index_text(soup):
    text, spans = extract_html(soup.encode("utf-8"))
    ends = 0
    for s, e, k in spans:
        assert 0 <= s < e <= len(text)
        assert s >= ends  # non-overlapping, ordered
        ends = e
        assert k in ("heading", "para")
        block = text[s:e]
        assert "\n\n" not in block


@given(st.binary(max_size=1500).map(lambda b: b"%PDF-1.4\n" + b))
@settings(max_examples=100, deadline=None)
def test_pdf_total_on_garbage(data):
    a = extract_pdf(data)
    assert a == extract_pdf(data)
    text, spans = a
    for s, e, k in spans:
        assert 0 <= s < e <= len(text)


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_normalize_string_idempotent(s):
    once = normalize_string(s)
    assert normalize_string(once) == once if once is not None else True
    if once is not None:
        assert once == " ".join(once.split())  # whitespace-collapsed


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200))
@settings(max_examples=150, deadline=None)
def test_abbreviation_spans_index_source(text):
    for ab in extract_abbreviations(text):
        assert text[ab["short_start"] : ab["short_end"]] == ab["short_text"]
        assert text[ab["long_start"] : ab["long_end"]] == ab["long_text"]
        assert len(ab["long_text"]) > len(ab["short_text"])


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_resolve_then_remove_total(text):
    abbrevs = extract_abbreviations(text)
    resolved = resolve_abbreviations(text, abbrevs)
    cleaned = find_and_remove_definitions(resolved, abbrevs)
    assert isinstance(cleaned, str)


@given(st.lists(st.integers(1, 30), min_size=0, max_size=40), st.integers(5, 50))
@settings(max_examples=150, deadline=None)
def test_chunker_respects_budget(sent_lens, budget):
    text = ". ".join(" ".join(["w"] * n) for n in sent_lens)
    chunks = chunk_text(text, max_tokens=budget, min_tokens=1)
    for c in chunks:
        n = len(c.split())
        assert n <= budget or n == 0
    # token conservation: no tokens invented
    assert sum(len(c.split()) for c in chunks) <= len(text.split())


# --- round 4: BPE properties (pure python, no Spark) ---------------

from neurostore_text_extraction_spark.functions import bpe as _bpe


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_bpe_roundtrip_arbitrary_unicode(s):
    """encode∘decode is the identity for ANY unicode string (the
    byte-level base alphabet guarantees no OOV), and count == len."""
    enc = _bpe.default_bpe()
    ids = enc.encode(s)
    assert enc.decode(ids) == s
    assert enc.count(s) == len(ids)
    assert all(0 <= i < 256 + len(enc.merges) for i in ids)


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_bpe_pretokenize_partitions_text(s):
    """Pre-tokens concatenate back to the input exactly — nothing
    dropped, nothing duplicated (the count UDF's token total is then
    a true partition of the document)."""
    assert "".join(_bpe.pretokenize(s)) == s


@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=30))
@settings(max_examples=50, deadline=None)
def test_bpe_training_is_deterministic(corpus):
    m1 = _bpe.train_bpe(corpus, 30)
    m2 = _bpe.train_bpe(corpus, 30)
    assert m1 == m2
    assert _bpe.load_merges(_bpe.dump_merges(m1)) == m1


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_reference_keep_rule_total(s):
    """The bibliography keep-rule must never crash extract_html on
    arbitrary text content (regex over arbitrary block text)."""
    html = f'<html><body><div class="references"><p>{s}</p></div></body></html>'
    text, spans = extract_html(html.encode(), mode="html")
    for a, b, kind in spans:
        assert 0 <= a <= b <= len(text)
