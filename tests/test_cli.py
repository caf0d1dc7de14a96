"""CLI runner tests (reference ``cli/run.py:141-216`` behaviors:
registry name-mangling, YAML config validation, sequential pipelines,
exit codes). Invokes main() in-process against a tmp parquet corpus."""

import json

import pytest

from neurostore_text_extraction_spark.cli import (
    build_registry,
    load_config,
    main,
    snake_case,
)


def test_snake_case_mangle():
    assert snake_case("WordCountExtractor") == "word_count"
    assert snake_case("TFIDFExtractor") == "t_f_i_d_f"
    assert snake_case("ParticipantDemographicsExtractor") == "participant_demographics"


def test_registry_names():
    reg = build_registry()
    for name in ("word_count", "word_deviance", "extract", "participant_demographics"):
        assert name in reg


def test_load_config_validation(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("word_count:\n  id_col: doc_id\n")
    cfg = load_config(str(p), {"word_count"})
    assert cfg == {"word_count": {"id_col": "doc_id"}}

    p.write_text("nope: {}\n")
    with pytest.raises(SystemExit):
        load_config(str(p), {"word_count"})

    p.write_text("word_count: [1, 2]\n")
    with pytest.raises(SystemExit):
        load_config(str(p), {"word_count"})


def test_cli_end_to_end(spark, tmp_path):
    corpus = tmp_path / "pages.parquet"
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, None)],
        "doc_id long, text string",
    ).write.parquet(str(corpus))
    out = tmp_path / "out"
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("word_count:\n  text_col: text\n")
    rc = main(
        [
            str(corpus),
            str(out),
            "--pipelines",
            "word_count",
            "lang_id",
            "--config",
            str(cfg),
        ]
    )
    assert rc == 0
    wc = spark.read.parquet(str(out / "word_count" / "results"))
    assert {r.doc_id: r.word_count for r in wc.collect()} == {1: 3, 2: 2, 3: 0}
    info = json.loads((out / "word_count" / "pipeline_info.json").read_text())
    assert info["pipeline"] == "word_count"
    assert (out / "lang_id" / "results").exists()


def test_cli_unknown_pipeline_exits(tmp_path):
    with pytest.raises(SystemExit):
        main([str(tmp_path), str(tmp_path), "--pipelines", "does_not_exist"])
