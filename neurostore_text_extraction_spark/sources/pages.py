"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

FIXTURES.md §1: url (Zipf-skewed domains), warc_ts, html (boilerplate
shell wrapping known main content; ~5% PDF payloads; log-normal sizes),
text (null — engine fills), lang. Seeded (42); a row's content is a
pure function of ``(seed, row_id)`` so any subset at any parallelism
regenerates identically — goldens are *by construction*: the generator
records the exact main-content text (and heading structure) it embeds,
which is what the extractor must recover byte-for-byte.

Generation runs distributed via ``mapInPandas`` over ``spark.range`` —
no driver-side materialization, so the same generator scales to the
bench corpus and (on a real cluster) far beyond.
"""

from __future__ import annotations

import random
import zlib
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

SEED = 42
_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

_WORDS = (
    "the of and to in a is that for it with as on be at by this from or "
    "an are was but not have had they which one you were her all she there "
    "would their we him been has when who will more no if out so said what "
    "up its about into than them can only other new some could time these "
    "two may then do first any my now such like our over man me even most "
    "made after also did many before must through back years where much "
    "your way well down should because each just those people how too "
    "brain study data model result analysis method signal region cortex "
    "network sample measure effect group task response image scan voxel "
    "activation stimulus memory learning language attention emotion"
).split()

_LANGS = ["en"] * 18 + ["es", "de", "fr", "zh"] + [None]

GEN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        # golden columns (not part of the canonical pages schema;
        # select PAGES columns via pages_view)
        T.StructField("golden_text", T.StringType(), False),
        T.StructField("golden_kind", T.StringType(), False),
    ]
)


def _rng_for(row_id: int, seed: int = SEED) -> random.Random:
    return random.Random((seed << 40) ^ (row_id * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFF))


def _sentence(rng: random.Random, n_words: int) -> str:
    ws = [rng.choice(_WORDS) for _ in range(n_words)]
    ws[0] = ws[0].capitalize()
    # commas help readability scoring look like real prose
    if n_words > 8:
        ws[rng.randrange(3, n_words - 3)] += ","
    return " ".join(ws) + "."


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 24)) for _ in range(rng.randint(3, 9)))


def _nav_links(rng: random.Random, n: int) -> str:
    return " ".join(
        f'<a href="/{rng.choice(_WORDS)}/{i}">{rng.choice(_WORDS).capitalize()}</a>'
        for i in range(n)
    )


def _make_html_page(rng: random.Random) -> tuple[bytes, str]:
    """Build a boilerplate-wrapped page; return (bytes, golden_text).

    Sizes are log-normal with a heavy tail (FIXTURES.md §1: median tens
    of KB, tail to ~2 MB — reference fixture HTML spans 180-636 KB), so
    partitions see realistic fat-row skew."""
    n_sections = 1 + int(rng.lognormvariate(1.5, 0.9))
    if rng.random() < 0.01:  # rare mega-page: the straggler tail
        n_sections *= 8
    sections: list[str] = []
    golden_parts: list[str] = []
    for _ in range(n_sections):
        heading = " ".join(w.capitalize() for w in rng.sample(_WORDS, rng.randint(2, 4)))
        paras = [_paragraph(rng) for _ in range(rng.randint(2, 7))]
        sections.append(
            f"<h2>{heading}</h2>" + "".join(f"<p>{p}</p>" for p in paras)
        )
        golden_parts.append(f"## {heading}")
        golden_parts.extend(paras)
    golden = "\n\n".join(golden_parts)
    sidebar_items = "".join(
        f'<li><a href="/cat/{i}">{rng.choice(_WORDS)}</a></li>' for i in range(8)
    )
    html = (
        "<!DOCTYPE html><html><head><title>page</title>"
        "<script>function t(){return 1;}</script>"
        "<style>.m{color:red}</style></head><body>"
        f"<nav>{_nav_links(rng, 6)}</nav>"
        f"<header><h1>Site {rng.randrange(100)}</h1>{_nav_links(rng, 3)}</header>"
        '<div class="cookie-banner">We use cookies. <a href="#">Accept</a> '
        '<a href="#">Decline</a></div>'
        f'<div class="sidebar widget"><ul>{sidebar_items}</ul></div>'
        f'<div id="main" class="article-content">{"".join(sections)}</div>'
        f'<div class="related">Related: {_nav_links(rng, 5)}</div>'
        f"<footer>Copyright 2024. {_nav_links(rng, 4)}</footer>"
        "</body></html>"
    )
    return html.encode("utf-8"), golden


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _make_pdf_page(rng: random.Random) -> tuple[bytes, str]:
    """Minimal single-page PDF with positioned text lines; ~half get a
    FlateDecode-compressed content stream. Returns (bytes, golden)."""
    n_blocks = rng.randint(2, 10)
    ops = ["BT /F1 12 Tf"]
    golden_blocks: list[str] = []
    y = 740.0
    for _ in range(n_blocks):
        lines = [_sentence(rng, rng.randint(5, 10)) for _ in range(rng.randint(3, 8))]
        for ln in lines:
            ops.append(f"1 0 0 1 72 {y:.1f} Tm ({_pdf_escape(ln)}) Tj")
            y -= 14.0
        golden_blocks.append(" ".join(lines))
        y -= 28.0  # block gap > 1.8x line leading
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    flate = rng.random() < 0.5
    if flate:
        body = zlib.compress(content)
        filt = " /Filter /FlateDecode"
    else:
        body = content
        filt = ""
    stream_obj = (
        b"4 0 obj\n<< /Length " + str(len(body)).encode() + filt.encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
    )
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + stream_obj
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, "\n\n".join(golden_blocks)


def generate_row(row_id: int, seed: int = SEED) -> dict:
    """Pure function (seed, row_id) → page row. Used by both the
    distributed generator and single-node golden checks."""
    rng = _rng_for(row_id, seed)
    # Zipf-ish skew: Pareto tail puts ~half the corpus in few domains
    domain_rank = min(int(rng.paretovariate(1.1)), 500)
    domain = f"d{domain_rank}.example.com"
    url = f"https://{domain}/{rng.choice(_WORDS)}/{row_id}"
    is_pdf = rng.random() < 0.05
    if is_pdf:
        payload, golden = _make_pdf_page(rng)
        kind = "pdf"
    else:
        payload, golden = _make_html_page(rng)
        kind = "html"
    return {
        "url": url,
        "warc_ts": _BASE_TS + timedelta(seconds=row_id * 7 + (row_id % 13)),
        "html": payload,
        "text": None,
        "lang": rng.choice(_LANGS),
        "golden_text": golden,
        "golden_kind": kind,
    }


def _gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [generate_row(int(i)) for i in pdf["id"]]
        yield pd.DataFrame(rows)


def generate_pages(
    spark: SparkSession, n_rows: int, num_partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus: spark.range → mapInPandas."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, num_partitions)
    return base.mapInPandas(_gen_batches, GEN_SCHEMA)


def pages_view(df: DataFrame) -> DataFrame:
    """Project the canonical pages schema (input_hint)."""
    return df.select("url", "warc_ts", "html", "text", "lang")
