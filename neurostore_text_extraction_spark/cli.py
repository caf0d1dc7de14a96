"""CLI runner — the reference's ``ns-extract <dataset> <out>
--pipelines …`` entry point (``ns_extract/cli/run.py:141-216``) on a
parquet corpus.

Mirrored behaviors:
- the pipeline registry is built by name-mangling CamelCase extractor
  names to snake_case (``cli/run.py:13-33``);
- an optional YAML (or JSON) config file supplies per-pipeline kwargs
  and is validated before anything runs (``cli/run.py:36-92``):
  unknown pipeline names or non-mapping kwargs abort with exit 1;
- pipelines run sequentially; the first failure exits 1
  (``cli/run.py:122-134``).

Usage:
    python -m neurostore_text_extraction_spark pages.parquet out/ \
        --pipelines word_count tfidf extract --config cfg.yaml
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from datetime import datetime, timezone
from pathlib import Path


def snake_case(camel: str) -> str:
    """WordCountExtractor → word_count (the reference's registry
    mangle, ``cli/run.py:13-33``)."""
    base = camel[: -len("Extractor")] if camel.endswith("Extractor") else camel
    return re.sub(r"(?<!^)(?=[A-Z])", "_", base).lower()


def build_registry() -> dict:
    """snake_case name → callable(spark, pages_df, out_dir, **kwargs)
    returning the result DataFrame (already written)."""
    from pyspark.sql import functions as F

    from .operators import dedup, textquality, tfidf, wordstats
    from .operators.embeddings import embed_documents
    from .operators.llm_extract import StubLLMClient, llm_extract
    from .plans.pipeline import run_extraction

    def df_op(fn):
        def run(spark, pages, out_dir, id_col="doc_id", **kw):
            result = fn(pages, id_col=id_col, **kw)
            result.write.mode("overwrite").parquet(str(Path(out_dir) / "results"))
            return result

        return run

    def _extract(spark, pages, out_dir, **kw):
        run_extraction(spark, pages, str(out_dir), kwargs=kw or None)
        return None

    def _llm_demographics(spark, pages, out_dir, id_col="doc_id", **kw):
        result = llm_extract(pages, StubLLMClient, id_col=id_col, **kw)
        result.write.mode("overwrite").parquet(str(Path(out_dir) / "results"))
        return result

    def _dedup_exact(spark, pages, out_dir, id_col="doc_id", **kw):
        result = dedup.exact_duplicates(pages, id_col=id_col, **kw)
        result.write.mode("overwrite").parquet(str(Path(out_dir) / "results"))
        return result

    camel = {
        "WordCountExtractor": df_op(wordstats.word_count),
        "WordDevianceExtractor": df_op(wordstats.word_deviance),
        "TFIDFExtractor": df_op(tfidf.tfidf),
        "LangIdExtractor": df_op(textquality.lang_id),
        "QualityFeaturesExtractor": df_op(textquality.quality_features),
        "TokenCountsExtractor": df_op(textquality.token_counts),
        "FingerprintsExtractor": df_op(textquality.fingerprints),
        "ExactDedupExtractor": _dedup_exact,
        "EmbeddingExtractor": df_op(lambda df, id_col="doc_id", **kw: embed_documents(df, id_col=id_col, **kw)),
        "ParticipantDemographicsExtractor": _llm_demographics,
        "MainContentExtractor": _extract,
    }
    reg = {snake_case(k): v for k, v in camel.items()}
    # the flagship extraction pipeline keeps its short alias
    reg["extract"] = reg.pop("main_content")
    return reg


def load_config(path: str, known: set[str]) -> dict:
    """Parse + validate the per-pipeline kwargs config (YAML if
    available, JSON otherwise)."""
    text = Path(path).read_text()
    try:
        import yaml

        cfg = yaml.safe_load(text)
    except ImportError:  # pragma: no cover - yaml is present in CI
        cfg = json.loads(text)
    if cfg is None:
        cfg = {}
    if not isinstance(cfg, dict):
        raise SystemExit(f"config {path}: top level must be a mapping")
    for name, kwargs in cfg.items():
        if name not in known:
            raise SystemExit(
                f"config {path}: unknown pipeline {name!r}; known: {sorted(known)}"
            )
        if kwargs is not None and not isinstance(kwargs, dict):
            raise SystemExit(f"config {path}: kwargs for {name!r} must be a mapping")
    return {k: (v or {}) for k, v in cfg.items()}


def main(argv: list[str] | None = None) -> int:
    registry = build_registry()
    parser = argparse.ArgumentParser(
        prog="neurostore_text_extraction_spark",
        description="Run extraction pipelines over a parquet corpus.",
    )
    parser.add_argument("pages", help="input parquet path (pages/documents table)")
    parser.add_argument("out", help="output store root")
    parser.add_argument(
        "--pipelines",
        nargs="+",
        required=True,
        choices=sorted(registry),
        metavar="PIPELINE",
        help=f"one or more of: {', '.join(sorted(registry))}",
    )
    parser.add_argument("--config", help="YAML/JSON per-pipeline kwargs")
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--cores", type=int, default=8)
    args = parser.parse_args(argv)

    cfg = load_config(args.config, set(registry)) if args.config else {}

    from .session import get_spark

    spark = get_spark(cores=args.cores)
    pages = spark.read.parquet(args.pages)
    out_root = Path(args.out)
    for name in args.pipelines:
        pipe_dir = out_root / name
        pipe_dir.mkdir(parents=True, exist_ok=True)
        kwargs = dict(cfg.get(name, {}))
        if name != "extract":
            kwargs.setdefault("id_col", args.id_col)
        try:
            registry[name](spark, pages, pipe_dir, **kwargs)
        except Exception as exc:
            print(f"pipeline {name} failed: {type(exc).__name__}: {exc}", file=sys.stderr)
            return 1
        info = {
            "pipeline": name,
            "kwargs": {k: v for k, v in kwargs.items()},
            "date": datetime.now(timezone.utc).isoformat(),
        }
        (pipe_dir / "pipeline_info.json").write_text(json.dumps(info, sort_keys=True))
        print(f"pipeline {name}: ok")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
