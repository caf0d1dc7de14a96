"""Main-content extraction from HTML bytes — pure, deterministic, stdlib-only.

This is the extraction front-end the reference delegates to the external
pubget/ACE tools (see SURVEY.md §2.9; the reference repo itself contains
no HTML→text code — only fixture pairs such as
``tests/data/sample_inputs/3qT3nzK9bLZ7/source/ace/26507433.html`` →
``processed/ace/text.txt``). We re-specify it from scratch:

X1  DOM parse (stdlib ``html.parser``) + hard boilerplate-tag drop
X2  Boilerpipe-style block classification: link density, word count,
    stopword density, class/id priors
X3  Readability-style candidate scoring over DOM subtrees; the best
    candidate's blocks (plus headings) form the main content
X5  Character-span emission per emitted block
X6  ``lang`` passthrough hook (stopword list selection)

Output text format follows the reference's processed fixtures
(``processed/pubget/text.txt``): section headings rendered as
``## <Heading>`` lines, blocks separated by blank lines — consumable by
``text.split("\\n\\n")`` exactly like ``ns_extract/pipelines/api.py:262``.

The function is a pure function of the input bytes: no randomness, no
global state, no dependence on Arrow batch boundaries or partitioning —
this is what makes the distributed output byte-identical to the
single-node run at any parallelism (the byte-identical-per-url contract).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

# Tags whose entire subtree is never content.
_DROP_TAGS = frozenset(
    {
        "script", "style", "noscript", "template", "iframe", "svg", "canvas",
        "nav", "form", "button", "select", "option", "textarea", "input",
        "label", "head", "meta", "link", "base", "title", "object", "embed",
        "applet", "map", "audio", "video", "source", "track", "datalist",
    }
)
# header/footer/aside are *usually* boilerplate but can legally wrap
# content on broken pages — dropped structurally, like _DROP_TAGS.
_CHROME_TAGS = frozenset({"header", "footer", "aside"})

_VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
        "meta", "param", "source", "track", "wbr",
    }
)

# Elements that open a new text block.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body", "html",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "ul", "ol", "li", "dl", "dt", "dd",
        "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
        "blockquote", "pre", "figure", "figcaption", "address", "fieldset",
        "details", "summary", "hgroup",
    }
)

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# --- JATS XML mode (pubget-style inputs, see reference fixtures
# tests/data/sample_inputs/*/source/pubget/*.xml). The upstream pubget
# tool's observed semantics (verified token-by-token against the
# processed/pubget/text.txt fixtures — token-F1 = 1.000 on all three
# pubget fixtures, tests/test_fixture_f1.py): extract <body> ONLY
# (<front> title/abstract and ALL <back> matter — acknowledgements,
# appendices, supplementary sections, references — are dropped);
# strip inline <xref> citation text and <sub>/<sup> runs; drop table
# cells, table-wrap footers (tables are routed to separate CSV files)
# and fig/table <label>s, but KEEP fig and table-wrap <caption> text;
# render <sec>/<title> as "## Heading" lines. ---
_JATS_DROP = frozenset(
    {
        "xref", "ref-list", "journal-meta", "article-id", "contrib-group",
        "aff", "author-notes", "pub-date", "issn", "isbn", "publisher",
        "history", "permissions", "funding-group", "custom-meta-group",
        "license", "copyright-statement", "copyright-year", "object-id",
        "fn-group", "processing-meta", "kwd-group", "counts", "elocation-id",
        "volume", "issue", "fpage", "lpage", "alternatives", "graphic",
        "inline-graphic", "supplementary-material", "ext-link", "uri",
        "front", "back", "table", "label", "table-wrap-foot", "sub", "sup",
        "media",
    }
)
_JATS_BLOCK = frozenset(
    {
        "article", "body", "sec", "p", "title", "table-wrap",
        "caption", "fig", "list", "list-item", "disp-quote", "boxed-text",
        "def-list", "def-item", "term", "def",
    }
)
_JATS_HEADING = frozenset({"title", "article-title"})


def looks_like_jats(data: bytes) -> bool:
    head = data[:400].lstrip()
    return head.startswith(b"<?xml") or head.startswith(b"<article") or (
        b"<article" in head and b"<!DOCTYPE article" in head
    )

# class/id substrings with strong boilerplate priors (negative) and
# content priors (positive) — readability-style.
_NEGATIVE_HINTS = (
    "comment", "sidebar", "side-bar", "footer", "header", "banner", "cookie",
    "consent", "menu", "navbar", "nav-", "-nav", "breadcrumb", "share",
    "social", "related", "promo", "advert", "sponsor", "widget", "popup",
    "modal", "subscribe", "newsletter", "masthead", "skip", "toolbar",
    "pagination", "pager", "copyright", "disclaimer", "metadata", "byline",
    "login", "signup", "search", "dropdown", "reference", "bibliograph",
    "citation", "recommended",
)
_POSITIVE_HINTS = (
    "article", "content", "main", "body", "text", "post", "entry", "story",
    "abstract", "fulltext", "section", "chapter",
    # scholarly back matter is article content, not chrome: footnote
    # dls, appendices, acknowledgments and supplementary-data sections
    # carry body-grade prose ("footnote" does NOT collide with the
    # "footer" negative — different substring)
    "footnote", "appendi", "acknowledg", "supplement",
)

# Compact English stopword list for stopword-density features (X2/X6).
_STOPWORDS_EN = frozenset(
    """a about above after again all also an and any are as at be because
    been before being between both but by can could did do does doing down
    during each few for from further had has have having he her here hers
    him his how i if in into is it its just me more most my no nor not of
    off on once only or other our out over own same she should so some such
    than that the their them then there these they this those through to
    too under until up very was we were what when where which while who
    whom why will with would you your""".split()
)

_STOPWORDS_ES = frozenset(
    """de la que el en y a los del se las por un para con no una su al lo
    como mas pero sus le ya o este si porque esta entre cuando muy sin
    sobre tambien me hasta hay donde quien desde todo nos durante todos
    uno les ni contra otros ese eso ante ellos e esto mi antes algunos
    que unos yo otro otras otra el tanto esa estos mucho quienes nada
    muchos cual poco ella estar estas algunas algo nosotros""".split()
)
_STOPWORDS_DE = frozenset(
    """der die und in den von zu das mit sich des auf fur ist im dem
    nicht ein eine als auch es an werden aus er hat dass sie nach wird
    bei einer um am sind noch wie einem uber einen so zum war haben nur
    oder aber vor zur bis mehr durch man sein wurde sei""".split()
)
_STOPWORDS_FR = frozenset(
    """de la le et les des en un du une que est pour qui dans a par plus
    pas au sur ne se ce il sont la avec son ont cette mais ou comme fait
    ses etait aux ces nous leur sans aussi dont tout ils entre elle deux
    meme nos tres on notre afin etre avoir cela peut""".split()
)

# X6 language routing: the page's lang column selects the stopword
# list used by the X2 block classifier's stopword-density feature.
_STOPWORDS_BY_LANG = {
    "en": _STOPWORDS_EN,
    "es": _STOPWORDS_ES,
    "de": _STOPWORDS_DE,
    "fr": _STOPWORDS_FR,
}


@dataclass(slots=True)
class _Node:
    tag: str
    attrs: dict
    parent: "_Node | None"
    children: list = field(default_factory=list)  # _Node | str
    # readability candidate score, filled during scoring
    score: float = 0.0
    # memoized class/id prior (computed at most once per node — profiled
    # as a top-3 hot spot when recomputed per block per ancestor)
    _hint: int | None = None
    # memoized reference-hint flag (see _has_ref_ancestor)
    _refh: bool | None = None

    @property
    def hint_text(self) -> str:
        return ((self.attrs.get("class") or "") + " " + (self.attrs.get("id") or "")).lower()


# fast-path tokens for the single-shot feed loop: attr-less tags whose
# names use the common charset. Anything else (attributes, whitespace,
# self-closing, odd name chars, comments, declarations, PIs) falls
# through to the INHERITED html.parser parse_* methods, so tokenization
# semantics stay exactly the stdlib's.
_SIMPLE_START_RE = re.compile(r"<([a-zA-Z][a-zA-Z0-9.\-_:]*)>")
_SIMPLE_END_RE = re.compile(r"</([a-zA-Z][a-zA-Z0-9.\-_:]*)\s*>")


class _DomBuilder(HTMLParser):
    """Tolerant DOM builder: mismatched end tags are skipped, unclosed
    tags are implicitly closed. Entities are decoded by html.parser
    (convert_charrefs=True, deterministic).

    ``feed_document`` (r6) is a single-shot replacement for
    ``feed``+``close``: the whole document is in hand, so the
    incremental-feed machinery the stdlib ``goahead`` loop pays for —
    line/column ``updatepos`` bookkeeping on every token, the
    partial-entity boundary checks, per-token ``startswith`` chains —
    is skipped, and attr-less tags (the majority) dispatch via one
    regex match instead of ``parse_starttag``'s tolerant scanner.
    Everything non-trivial still goes through the inherited stdlib
    ``parse_starttag/parse_endtag/parse_comment/parse_pi/
    parse_html_declaration``, so edge-case tokenization (malformed
    tags, comments, CDATA script/style content, charrefs) is
    byte-identical to ``feed`` — asserted by an equivalence sweep over
    the fixtures, the bench corpus and adversarial fragments
    (tests/test_html_extract.py)."""

    def __init__(self, drop=_DROP_TAGS, chrome=_CHROME_TAGS, drop_pred=None) -> None:
        super().__init__(convert_charrefs=True)
        self._drop = drop
        self._chrome = chrome
        self._drop_pred = drop_pred  # optional (tag, attrs_dict) -> bool
        self.root = _Node("#root", {}, None)
        self.cur = self.root
        # stack of open dropped-subtree tag names; non-empty == dropping
        self._drop_stack: list[str] = []

    def handle_starttag(self, tag, attrs):
        # <body> can never legitimately nest inside a dropped subtree —
        # an unclosed <head>/<form>/<select> must not swallow the page.
        if tag == "body" and self._drop_stack:
            self._drop_stack.clear()
        if self._drop_stack:
            if (tag in self._drop or tag in self._chrome) and tag not in _VOID_TAGS:
                self._drop_stack.append(tag)
            return
        if (
            tag in self._drop
            or tag in self._chrome
            or (self._drop_pred is not None and self._drop_pred(tag, dict(attrs)))
        ):
            if tag not in _VOID_TAGS:  # void drop tags have no subtree
                self._drop_stack.append(tag)
            return
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        if self._drop_stack:
            return
        if tag in self._drop or tag in self._chrome:
            return
        self.cur.children.append(_Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        if self._drop_stack:
            if tag in self._drop_stack:
                # pop up to and including the innermost matching tag
                while self._drop_stack and self._drop_stack.pop() != tag:
                    pass
            return
        # pop to nearest matching ancestor; ignore stray end tags
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is not self.root:
            self.cur = node.parent or self.root

    def handle_data(self, data):
        if self._drop_stack or not data:
            return
        self.cur.children.append(data)

    def updatepos(self, i, j):
        # line/column bookkeeping is only consumed by getpos(), which
        # nothing here calls — skip the per-token line counting. The
        # return value contract (always j) is preserved, so stdlib
        # control flow is unchanged.
        return j

    def feed_document(self, rawdata: str) -> None:
        """Single-shot parse of a complete document (see class doc).
        Mirrors ``goahead(end=1)`` semantics for convert_charrefs=True:
        text segments unescape wholesale, script/style content stays
        raw (and an unterminated cdata tail is discarded, as stdlib
        does), incomplete constructs at EOF flush as data."""
        from html import unescape

        self.rawdata = rawdata
        i, n = 0, len(rawdata)
        handle_data = self.handle_data
        find = rawdata.find
        while i < n:
            if self.cdata_elem:
                match = self.interesting.search(rawdata, i)
                if not match:  # unterminated <script>/<style>: drop tail
                    i = n
                    break
                j = match.start()
                if i < j:
                    handle_data(rawdata[i:j])  # raw: no charref decode
                i = j
                k = self.parse_endtag(i)
                if k < 0:  # incomplete '</script' at EOF → raw flush
                    handle_data(rawdata[i:n])
                    i = n
                    break
                i = k
                continue
            lt = find("<", i)
            if lt < 0:
                seg = rawdata[i:n]
                handle_data(unescape(seg) if "&" in seg else seg)
                i = n
                break
            if lt > i:
                seg = rawdata[i:lt]
                handle_data(unescape(seg) if "&" in seg else seg)
            i = lt
            m = _SIMPLE_END_RE.match(rawdata, i)
            if m:
                self.handle_endtag(m.group(1).lower())
                i = m.end()
                continue
            m = _SIMPLE_START_RE.match(rawdata, i)
            if m:
                tag = m.group(1).lower()
                self.lasttag = tag
                self.handle_starttag(tag, [])
                if tag in self.CDATA_CONTENT_ELEMENTS:
                    self.set_cdata_mode(tag)
                i = m.end()
                continue
            c = rawdata[i + 1] if i + 1 < n else ""
            if ("a" <= c <= "z") or ("A" <= c <= "Z"):
                k = self.parse_starttag(i)
            elif c == "/":
                k = self.parse_endtag(i)
            elif rawdata.startswith("<!--", i):
                k = self.parse_comment(i)
            elif c == "?":
                k = self.parse_pi(i)
            elif c == "!":
                k = self.parse_html_declaration(i)
            else:
                # lone '<' (possibly at EOF): stdlib emits it as data
                handle_data("<")
                i += 1
                continue
            if k < 0:
                # incomplete construct at EOF — goahead(end=1) recovery
                k = find(">", i + 1)
                if k < 0:
                    k = find("<", i + 1)
                    if k < 0:
                        k = i + 1
                else:
                    k += 1
                seg = rawdata[i:k]
                if self.cdata_elem:
                    handle_data(seg)
                else:
                    handle_data(unescape(seg) if "&" in seg else seg)
                i = k
                continue
            i = k
        self.rawdata = ""


@dataclass(slots=True)
class _Block:
    text: str
    link_chars: int
    tag: str
    ancestors: tuple  # tuple of _Node, innermost last
    heading: bool
    words: list  # cached text.split() — reused by classify + scoring

    @property
    def n_chars(self) -> int:
        return len(self.text)


def _collapse_ws(s: str) -> str:
    return " ".join(s.split())


def _collect_blocks(root: _Node, block_tags=_BLOCK_TAGS, heading_tags=_HEADING_TAGS) -> list[_Block]:
    """Segment the DOM into text blocks. A block is the inline run
    between block-level boundaries; text inside <a> counts as link
    chars for the link-density feature."""
    blocks: list[_Block] = []
    # pending inline accumulation
    parts: list[str] = []
    link_parts: list[str] = []
    anc_at_open: list[tuple] = []

    def flush(tag: str, ancestors: tuple):
        # ~2/3 of flushes fire on empty accumulations (adjacent block
        # boundaries); any link text is also inline text, so empty
        # `parts` implies empty `link_parts` — skip the join+split
        if not parts:
            return
        words = "".join(parts).split()
        raw = " ".join(words)
        if raw:
            link_len = len(_collapse_ws("".join(link_parts))) if link_parts else 0
            heading = tag in heading_tags
            blocks.append(_Block(raw, link_len, tag, ancestors, heading, words))
        parts.clear()
        link_parts.clear()

    def walk(node: _Node, ancestors: tuple, in_link: bool, cur_tag: str):
        for child in node.children:
            if isinstance(child, str):
                parts.append(child)
                if in_link:
                    link_parts.append(child)
            else:
                if child.tag in block_tags:
                    flush(cur_tag, ancestors)
                    walk(child, ancestors + (child,), in_link, child.tag)
                    flush(child.tag, ancestors + (child,))
                elif child.tag == "br":
                    parts.append(" ")
                else:
                    walk(
                        child,
                        ancestors,
                        in_link or child.tag == "a",
                        cur_tag,
                    )

    walk(root, (root,), False, "#root")
    flush("#root", (root,))
    return blocks


def _hint_score(node: _Node) -> int:
    if node._hint is not None:
        return node._hint
    h = node.hint_text
    s = 0
    if h.strip():
        if any(n in h for n in _NEGATIVE_HINTS):
            s -= 1
        if any(p in h for p in _POSITIVE_HINTS):
            s += 1
    node._hint = s
    return s


_DENSITY_SAMPLE = 64  # density estimate over a prefix; full scans of
# 1000-word blocks were the profiled hot spot and add no signal


_WORD_PUNCT = ".,;:!?()[]\"'"


_WORD_PUNCT_SET = frozenset(_WORD_PUNCT)


def _stopword_density(words: list[str], stopwords: frozenset) -> float:
    if not words:
        return 0.0
    sample = words[:_DENSITY_SAMPLE]
    hits = 0
    for wl in map(str.lower, sample):
        # fast path first: most words carry no punctuation, and the
        # per-word strip() was the profiled hot spot of whole-document
        # extraction (~20% of extract_document). Most words are NOT
        # stopwords either, so strip() only runs when a boundary char
        # is actually strippable (two set probes beat a no-op strip).
        if wl in stopwords:
            hits += 1
        elif wl[0] in _WORD_PUNCT_SET or wl[-1] in _WORD_PUNCT_SET:
            if wl.strip(_WORD_PUNCT) in stopwords:
                hits += 1
    return hits / len(sample)


# Bibliography keep-rule (X2 refinement, round 4): scholarly reference
# lists are link farms by structure (every entry carries DOI / Scopus /
# Google Scholar anchors → link density > 0.33) and their containers
# hint 'reference'/'citation', so BOTH the boilerplate classifier and
# the readability candidate drop them — but for scholarly articles the
# bibliography IS content (the reference's ACE fixtures keep it:
# processed/ace/text.txt retains the full reference list, measured
# ~28% of the expected tokens). A block is reference-like only with
# BOTH signals: a reference-hinting ancestor AND citation-shaped text
# (year / doi / et-al), so nav bars whose class merely says
# 'citation' still drop.
# word-boundary matching: a plain substring test would flag
# class="user-preferences" (contains 'references') or "xrefs"; \b
# requires a non-word char before the hint, so only genuine
# reference/bibliography/citation containers match
_REF_HINT_RE = re.compile(
    r"\b(?:references?|bibliograph\w*|citations?|ref-list|reflist)\b"
)
_CITE_RE = re.compile(r"\b(?:19|20)\d{2}\b|\bdoi\b|\bet al\b", re.I)


def _has_ref_ancestor(b: _Block) -> bool:
    for a in b.ancestors[-4:]:
        h = a._refh
        if h is None:
            h = _REF_HINT_RE.search(a.hint_text) is not None
            a._refh = h
        if h:
            return True
    return False


def _reference_keep_pred(blocks: list) -> "callable":
    """Page-level bibliography detection: if >= 3 blocks under
    reference-hinting ancestors carry citation-shaped text (year /
    doi / et-al), the hinted region is a genuine bibliography and ALL
    its blocks are kept (entry labels, 'Google Scholar'/'View in
    Scopus' link rows included — the ACE fixtures keep them).
    Otherwise only individually citation-shaped blocks survive, so a
    nav bar whose class merely says 'citation' still drops."""
    # evidence counts CITATION-shaped text only (not headings): three
    # dated lines under a hinted container are required before the
    # whole region is treated as a bibliography — a hinted nav box
    # with one 'References' heading and link rows stays boilerplate
    evidence = sum(
        1
        for b in blocks
        if _has_ref_ancestor(b) and _CITE_RE.search(b.text)
    )
    bibliography = evidence >= 3

    def is_ref(b: _Block) -> bool:
        return _has_ref_ancestor(b) and (
            bibliography or b.heading or _CITE_RE.search(b.text) is not None
        )

    return is_ref


def _classify_boilerplate(b: _Block, stopwords: frozenset) -> bool:
    """X2: True = boilerplate (drop). Boilerpipe-style thresholds on
    link density / word count / class-id priors."""
    n = b.n_chars
    if n == 0:
        return True
    ld = b.link_chars / n
    nw = len(b.words)
    # inline min loop: the genexpr version showed up in the profile
    # (one generator frame per block per classify call). Clamped at 0
    # — only the `hint < 0` sign test below consumes it
    hint = 0
    for a in b.ancestors[-3:]:
        s = _hint_score(a)
        if s < hint:
            hint = s
    if hint < 0 and not b.heading:
        # negative ancestor hint needs strong evidence to survive
        if ld > 0.0 or nw < 15:
            return True
    if ld > 0.33:
        return True
    if b.heading:
        return False
    if nw < 3 and ld > 0.0:
        return True
    if nw < 2:
        # single naked token between blocks (menu crumbs, icons)
        return True
    if nw < 6 and ld > 0.1:
        return True
    return False


def _score_candidates(blocks: list[_Block], stopwords: frozenset) -> _Node | None:
    """X3: readability-style scoring. Each content-ish block adds points
    to the *parent* (1.0x) and *grandparent* (0.5x) of its containing
    element — so section wrappers and the article body accumulate — and
    the best-scoring subtree wins. Scores are stored on the nodes so the
    caller can run sibling expansion."""
    seen: list[_Node] = []
    for b in blocks:
        if b.heading:
            continue
        if len(b.words) < 8:
            continue
        ld = b.link_chars / max(b.n_chars, 1)
        pts = 1.0 + b.text.count(",") + min(b.n_chars / 100.0, 3.0)
        pts *= max(0.0, 1.0 - 2.0 * ld)
        pts *= 0.5 + _stopword_density(b.words, stopwords)
        chain = b.ancestors
        parent = chain[-2] if len(chain) >= 2 else None
        grand = chain[-3] if len(chain) >= 3 else None
        for node, w in ((parent, 1.0), (grand, 0.5)):
            if node is None or node.tag == "#root":
                continue
            bonus = 1.0 + 0.25 * _hint_score(node)
            if node.score == 0.0:
                seen.append(node)
            node.score += pts * w * bonus
    if not seen:
        return None
    # deterministic argmax: strict > keeps the first (document-order)
    # node on ties — `seen` is in first-credit order.
    best = None
    best_score = 0.0
    for node in seen:
        if node.score > best_score + 1e-9:
            best_score = node.score
            best = node
    return best


def _keep_set(candidate: _Node) -> set[int]:
    """Readability sibling expansion: the candidate subtree plus any
    sibling subtree scoring >= max(8, 20% of candidate).

    Same-tag expansion for semantic containers: when the winning node
    is a ``<section>``/``<article>``, sibling elements of the SAME tag
    are part of the same article almost by HTML5 spec (PMC/Elsevier
    render one ``<section>`` per article section), yet one-paragraph
    tail sections — Conclusion, Conflict of interest, Acknowledgments
    — score far below the 20% threshold and were dropped. Such
    siblings are kept unless an explicitly negative class/id hint
    (comment/promo/sidebar...) vetoes them; their blocks still pass
    the per-block boilerplate classifier downstream."""
    keep = {id(candidate)}
    parent = candidate.parent
    if parent is not None:
        threshold = max(8.0, 0.2 * candidate.score)
        for sib in parent.children:
            if not isinstance(sib, _Node) or sib is candidate:
                continue
            if sib.score >= threshold or (
                candidate.tag in ("section", "article")
                and sib.tag == candidate.tag
                and _hint_score(sib) >= 0
            ):
                keep.add(id(sib))
    # Climb: back matter often hangs off an ANCESTOR of the winning
    # node (PMC/Elsevier: article > div.body > div > sections, with
    # acknowledgments / appendices / footnotes as siblings up to three
    # levels up). At each of the next 3 ancestor levels keep siblings
    # that are semantically article-shaped — same-tag <section>/
    # <article>, or a positive content hint — never negative-hinted
    # ones; per-block boilerplate classification still applies inside.
    node = candidate
    for _ in range(3):
        parent = node.parent
        if parent is None or parent.tag == "#root":
            break
        for sib in parent.children:
            if not isinstance(sib, _Node) or sib is node:
                continue
            if _hint_score(sib) > 0 or (
                sib.tag in ("section", "article") and _hint_score(sib) >= 0
            ):
                keep.add(id(sib))
        node = parent
    return keep


def _is_descendant(node_chain: tuple, keep: set[int]) -> bool:
    return any(id(a) in keep for a in node_chain)


def _teardown(root: _Node) -> None:
    """Break parent<->children reference cycles so the whole DOM frees
    by refcount immediately. Without this, long-lived reused Spark
    Python workers accumulate cyclic garbage across pages and CPython's
    gen-2 GC rescans an ever-growing heap — measured 4x slowdown after
    ~16k pages in one worker."""
    stack = [root]
    while stack:
        node = stack.pop()
        for c in node.children:
            if isinstance(c, _Node):
                stack.append(c)
        node.parent = None
        node.children = []


def extract_html(
    data: bytes, lang: str | None = None, mode: str = "auto"
) -> tuple[str, list[tuple[int, int, str]]]:
    """Extract main content text and char spans from HTML/JATS bytes.

    ``mode``: "html" (boilerplate classify + readability candidate),
    "jats" (structural: body-only, pubget-parity — token-F1 1.000 vs
    the reference's processed fixtures), "fullpage" (ACE-parity raw
    text dump, no boilerplate removal), or "auto" (sniff via
    :func:`looks_like_jats`).

    Returns ``(text, spans)`` where spans are ``(start, end, kind)``
    with ``kind in {"heading", "para"}`` and ``text[start:end]`` the
    block (X5). Pure function of ``data`` — see module docstring.
    """
    if mode == "auto":
        mode = "jats" if looks_like_jats(data) else "html"
    try:
        html = data.decode("utf-8")
    except UnicodeDecodeError:
        html = data.decode("latin-1")
    if mode == "jats":
        def make_parser():
            return _DomBuilder(drop=_JATS_DROP, chrome=frozenset())
    elif mode == "fullpage":
        # ACE-parity mode: the upstream ACE tool emits a full-page text
        # dump with NO boilerplate removal (its processed fixtures keep
        # nav, 'Google Scholar' link farms and site footers). Header/
        # footer/aside chrome is kept; only non-text tags drop.
        def make_parser():
            return _DomBuilder(chrome=frozenset())
    else:
        make_parser = _DomBuilder
    parser = make_parser()
    try:
        parser.feed_document(html)
    except Exception:
        # fall back to the stdlib incremental path with a FRESH builder
        # (the fast path may have half-mutated the DOM before raising)
        parser = make_parser()
        try:
            parser.feed(html)
            parser.close()
        except Exception:
            # html.parser is robust, but guarantee row-level fault
            # isolation
            pass
    stopwords = _STOPWORDS_BY_LANG.get((lang or "en")[:2], _STOPWORDS_EN)
    if mode == "jats":
        blocks = _collect_blocks(parser.root, _JATS_BLOCK, _JATS_HEADING)
        kept = [b for b in blocks if b.n_chars > 0]
    elif mode == "fullpage":
        blocks = _collect_blocks(parser.root)
        kept = [b for b in blocks if b.n_chars > 0]
    else:
        blocks = _collect_blocks(parser.root)
        is_ref = _reference_keep_pred(blocks)
        # candidate scoring sees ONLY organic content: reference
        # blocks are excluded so a dense bibliography cannot outscore
        # the article body and flip the winning subtree (it did, when
        # refs entered `content` — the ScienceDirect fixture's body
        # halved). ALL reference blocks are excluded here — link-dense
        # ones fell to _classify_boilerplate anyway, but a long-text
        # low-link-density bibliography must not enter scoring either
        # (ADVICE r4). They rejoin at the keep stage below.
        content = [
            b
            for b in blocks
            if not _classify_boilerplate(b, stopwords) and not is_ref(b)
        ]
        candidate = _score_candidates(content, stopwords)
        organic = {id(b) for b in content}
        if candidate is not None:
            keep = _keep_set(candidate)
            # the empty-candidate fallback is decided on the BODY
            # (candidate-subtree) blocks alone: reference blocks are
            # appended afterwards, so a bibliography cannot mask a
            # body-less candidate and suppress the fallback (the page
            # would collapse to citations with the article lost)
            body = [
                b
                for b in content
                if _is_descendant(b.ancestors, keep)
            ]
            if not any(not b.heading for b in body):
                body = content
            body_ids = {id(b) for b in body}
            # reference blocks survive candidate selection too: the
            # bibliography usually lives OUTSIDE the main-text subtree
            # (its link-heavy blocks earn no readability points), yet
            # is content for scholarly pages — ACE parity keeps it
            kept = [
                b for b in blocks if id(b) in body_ids or is_ref(b)
            ]
        else:
            kept = [b for b in blocks if id(b) in organic or is_ref(b)]
    out_parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for b in kept:
        rendered = f"## {b.text}" if b.heading else b.text
        if out_parts:
            pos += 2  # "\n\n" separator
        start = pos
        pos += len(rendered)
        out_parts.append(rendered)
        spans.append((start, pos, "heading" if b.heading else "para"))
    _teardown(parser.root)
    return "\n\n".join(out_parts), spans


def extract_document(
    data: bytes, lang: str | None = None
) -> tuple[str, list[tuple[int, int, str]], str]:
    """Dispatch on payload type: PDF (%PDF- magic) → pdfminer-style
    layout branch (X4); JATS XML → structural mode; else HTML boiler-
    plate pipeline. Returns ``(text, spans, kind)`` with kind in
    {"pdf", "jats", "html"}. Pure function of bytes."""
    from . import pdf_extract

    if data[:5] == b"%PDF-":
        text, spans = pdf_extract.extract_pdf(data)
        return text, spans, "pdf"
    if looks_like_jats(data):
        text, spans = extract_html(data, lang, mode="jats")
        return text, spans, "jats"
    text, spans = extract_html(data, lang, mode="html")
    return text, spans, "html"
