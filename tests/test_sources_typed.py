"""S2 identifier ingest, S7 CSV source, S8 extension dispatch, X6
language routing tests."""

import pytest

from pyspark.sql import functions as F

from neurostore_text_extraction_spark.sources.catalog import (
    parse_identifiers,
    read_typed,
)


def test_parse_identifiers(spark):
    df = spark.createDataFrame(
        [
            ('{"pmid": "123", "pmcid": "PMC9", "doi": "10.1/x"}',),
            ('{"pmid": "456"}',),
            ("not json",),
        ],
        "identifiers string",
    )
    out = df.select(parse_identifiers("identifiers").alias("ids")).select(
        "ids.pmid", "ids.pmcid", "ids.doi"
    )
    rows = out.collect()
    assert (rows[0].pmid, rows[0].pmcid, rows[0].doi) == ("123", "PMC9", "10.1/x")
    assert (rows[1].pmid, rows[1].pmcid, rows[1].doi) == ("456", None, None)
    assert rows[2].pmid is None  # malformed JSON -> null struct, no abort


def test_read_typed_dispatch(spark, tmp_path):
    (tmp_path / "a.txt").write_text("hello world\nsecond line")
    (tmp_path / "b.json").write_text('{"k": 1}\n{"k": 2}')
    (tmp_path / "c.csv").write_text("x,y\n1,2\n3,4\n")

    txt = read_typed(spark, str(tmp_path / "a.txt"))
    assert txt.first().value == "hello world\nsecond line"  # wholetext

    js = read_typed(spark, str(tmp_path / "b.json"))
    assert sorted(r.k for r in js.collect()) == [1, 2]

    csv = read_typed(spark, str(tmp_path / "c.csv"))
    assert csv.columns == ["x", "y"]  # S7: header honored
    assert sorted((r.x, r.y) for r in csv.collect()) == [("1", "2"), ("3", "4")]

    with pytest.raises(ValueError, match="unsupported input extension"):
        read_typed(spark, str(tmp_path / "a.docx"))


def test_x6_language_routing_changes_candidate():
    """The lang column routes the stopword list (X6): a Spanish main
    article must win candidate scoring under lang='es' even when an
    English block of similar shape competes."""
    from neurostore_text_extraction_spark.functions.html_extract import extract_html

    es_par = (
        "La ciudad se encuentra en la costa y es conocida por sus playas, "
        "su puerto antiguo, y la cultura que se vive en las calles durante "
        "todo el verano, cuando muchos visitantes llegan desde otros paises."
    )
    en_par = (
        "The town sits on the coast and is known for its beaches, "
        "its old harbor, and the culture that fills the streets during "
        "the whole summer, when many visitors arrive from other countries."
    )
    page = (
        "<html><body>"
        f"<div id='d1'><p>{es_par}</p><p>{es_par}</p><p>{es_par}</p></div>"
        f"<div id='d2'><p>{en_par}</p><p>{en_par}</p><p>{en_par}</p></div>"
        "</body></html>"
    )
    import neurostore_text_extraction_spark.functions.html_extract as H

    def winner(lang):
        p = H._DomBuilder()
        p.feed(page)
        p.close()
        sw = H._STOPWORDS_BY_LANG[lang]
        blocks = H._collect_blocks(p.root)
        content = [b for b in blocks if not H._classify_boilerplate(b, sw)]
        cand = H._score_candidates(content, sw)
        return cand.attrs.get("id")

    assert winner("es") == "d1"
    assert winner("en") == "d2"
    # end-to-end: both languages still extract real text
    text, _ = extract_html(page.encode(), lang="es")
    assert "La ciudad" in text


def test_nan_metadata_repair_matches_reference(spark):
    """S6 NaN-repair quirk (reference ns_extract/pipelines/utils.py:
    70-74): a float NaN title/abstract in pandas-written metadata JSON
    is coerced to "" on load; a quoted "NaN" STRING is a real value and
    must survive (the reference's isinstance(float) check)."""
    from pyspark.sql import functions as F

    from neurostore_text_extraction_spark.sources.catalog import (
        parse_study_metadata,
    )

    df = spark.createDataFrame(
        [
            ('{"title": NaN, "abstract": "kept", "year": 2020}',),
            ('{"title": "NaN", "abstract": NaN, "year": 2021}',),
            ('{"title": "ok", "year": 2022}',),
        ],
        "js string",
    )
    rows = (
        df.select(parse_study_metadata(F.col("js")).alias("m"))
        .select("m.title", "m.abstract", "m.year")
        .collect()
    )
    assert (rows[0].title, rows[0].abstract, rows[0].year) == ("", "kept", 2020)
    assert (rows[1].title, rows[1].abstract, rows[1].year) == ("NaN", "", 2021)
    assert (rows[2].title, rows[2].abstract, rows[2].year) == ("ok", None, 2022)
