"""The end-to-end extraction pipeline (the reference's
``transform_dataset``, ``ns_extract/pipelines/base.py:121-234``,
re-expressed as one DataFrame job per SURVEY.md §3.2's mapping):

    pages → left_anti(manifest)            # O2 incremental / exact resume
          → repartition(xxhash64(url))     # skew salting (north rule)
          → mapInPandas(extract)           # Arrow-batched front-end
          → validate                       # pydantic-analogue validity flag
          → results + lineage + manifest + runs snapshots (atomic)

Whole-run memoization (O1, ``base.py:157-162``): if nothing is left
after the manifest anti-join the run returns early. Exact resume: a
killed run commits nothing (snapshot rename is atomic), a partially
complete multi-snapshot history replays only missing urls.

``post_process="only"`` mode (``base.py:172-215``): replay a transform
over the persisted results table without re-extraction — see
:func:`replay_postprocess`.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_pages, lineage_from_extracted
from ..operators.incremental import config_hash, unprocessed
from ..schemas import EXTRACTED_SCHEMA
from ..sources.catalog import Catalog

EXTRACTOR_NAME = "main_content_extraction"
EXTRACTOR_VERSION = "1.1.0"  # versioned like the reference's _version (base.py:851)


@dataclass
class RunResult:
    run_id: str
    config_hash: str
    n_input: int
    n_processed: int
    n_errors: int
    skipped: bool  # whole-run cache hit


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    store_root: str,
    kwargs: dict | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    auto_compact_after: int | None = 16,
    corpus_scoped: bool = False,
    salt: bool = True,
    partition_buckets: int | None = None,
) -> RunResult:
    """See module docstring. ``auto_compact_after``: once the results/
    manifest snapshot history exceeds this many snapshots it is
    compacted to the latest row per key, keeping ``read_results``'s
    latest-pick (and the manifest anti-join's right side) bounded at
    O(auto_compact_after) files per scan for arbitrarily long-lived
    pipelines. ``None`` disables.

    ``partition_buckets=N`` writes the results table hive-partitioned
    on ``url_bucket = pmod(xxhash64(url), N)`` (north rule: results
    back to *partitioned* tables keyed on url-hash — uniform in the
    url, so Zipf-skewed domains cannot produce fat partitions). Point
    lookups via :func:`read_results_for_url` then prune all but one
    bucket directory at planning time. Use the same N for the lifetime
    of a store (the layout must stay consistent across snapshots).

    ``corpus_scoped=True`` folds the corpus identity (the commutative
    url-set digest, A5) into the run's cache key — the distributed form
    of the reference DependentPipeline's group-identity hash
    (``base.py:646-669``) and its ``-1``/``-2`` fresh-dir suffixing
    (``base.py:163-165``, ``utils.py:91-114``): the same config over a
    DIFFERENT corpus is a cache miss and recomputes into fresh manifest
    rows, while re-running the identical corpus still memoizes. Costs
    one column-pruned scan of the id column per run; default off — the
    per-(url, md5, config) manifest match already handles per-doc
    incrementality."""
    cat = Catalog(store_root)
    if corpus_scoped:
        from ..operators.incremental import corpus_hash_scalable

        digest = corpus_hash_scalable(pages, id_col="url").first()["corpus_sha256"]
        cfg = config_hash(EXTRACTOR_VERSION, {**(kwargs or {}), "_corpus": digest})
    else:
        cfg = config_hash(EXTRACTOR_VERSION, kwargs)
    run_id = uuid.uuid4().hex[:12]
    now = datetime.now(timezone.utc).isoformat()

    manifest = cat.read(spark, "manifest") if resume else None
    todo = unprocessed(pages, manifest, cfg)

    # O1 whole-run memoization: empty work list → skip (cheap limit-1
    # probe, not a full count)
    if todo.limit(1).isEmpty():
        return RunResult(run_id, cfg, 0, 0, 0, True)

    # ``salt`` is an execution detail (same rows either way), so it is
    # deliberately NOT part of the config hash — toggling it must not
    # invalidate the cache.
    ext = extract_pages(todo, num_partitions=num_partitions, salt=salt)
    # per-row validity = no kernel error AND non-empty text AND schema
    # conformance (required-marked fields non-null — the generic
    # StructType-walk validator, ≙ the reference's per-study pydantic
    # validation at base.py:1072-1095; failures flag, never abort)
    from ..operators.schemaproc import with_validity

    validated = (
        with_validity(ext, EXTRACTED_SCHEMA, out_col="_schema_ok")
        .withColumn(
            "valid",
            F.col("error").isNull()
            & F.col("_schema_ok")
            & F.col("text").isNotNull()
            & (F.length("text") > 0),
        )
        .drop("_schema_ok")
        # rows carry their run's config identity (≙ the reference's
        # <config_hash>/ output directory level): per-config results
        # survive compaction and can be selected on read.
        .withColumn("config_hash", F.lit(cfg))
    )
    # One pass: write results, derive lineage/manifest from the written
    # snapshot (re-read is a cheap columnar scan; avoids caching the
    # heavy text in memory and avoids recomputing the UDF 3x).
    if partition_buckets:
        # repartition ON the bucket before the partitioned write: each
        # write task then owns whole buckets, so the snapshot holds
        # O(buckets) files instead of O(extract_tasks × buckets) — the
        # small-files failure mode of naive partitionBy at scale. Costs
        # one shuffle of the output rows (not the html payload — that
        # was consumed by the extract kernel).
        validated = validated.withColumn(
            "url_bucket",
            F.pmod(F.xxhash64(F.col("url")), F.lit(partition_buckets)).cast("int"),
        ).repartition(partition_buckets, F.col("url_bucket"))
        snap = cat.append(validated, "results", partition_by=["url_bucket"])
    else:
        snap = cat.append(validated, "results")
    written = spark.read.parquet(snap)

    cat.append(lineage_from_extracted(written, run_id), "lineage")
    cat.append(
        written.select(
            "url",
            "input_md5",
            F.lit(cfg).alias("config_hash"),
            F.lit(run_id).alias("run_id"),
            F.lit(now).alias("date"),
        ),
        "manifest",
    )
    cat.append(
        spark.createDataFrame(
            [
                (
                    run_id,
                    EXTRACTOR_NAME,
                    EXTRACTOR_VERSION,
                    cfg,
                    json.dumps(kwargs or {}, sort_keys=True),
                    EXTRACTED_SCHEMA.json(),
                    now,
                )
            ],
            "run_id string, extractor string, version string, config_hash string,"
            " kwargs_json string, schema_json string, date string",
        ),
        "runs",
    )
    counts = written.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("e"),
    ).first()
    if auto_compact_after is not None:
        # results keyed by (url, config_hash): latest row per url per
        # config survives, so compaction never drops another config's
        # results; manifest keyed by its full match tuple so every
        # config's skip rows survive; lineage/runs rows are unique per
        # key, so their compaction is a pure file-count bound.
        cat.maybe_compact(
            spark,
            "results",
            ["url", "config_hash"],
            max_snapshots=auto_compact_after,
            partition_by=["url_bucket"] if partition_buckets else None,
        )
        cat.maybe_compact(
            spark,
            "manifest",
            ["url", "input_md5", "config_hash"],
            max_snapshots=auto_compact_after,
        )
        cat.maybe_compact(
            spark, "lineage", ["run_id", "partition_id"], max_snapshots=auto_compact_after
        )
        cat.maybe_compact(spark, "runs", ["run_id"], max_snapshots=auto_compact_after)
    return RunResult(run_id, cfg, counts["n"], counts["n"], int(counts["e"] or 0), False)


def read_results(
    spark: SparkSession, store_root: str, config_hash: str | None = None
) -> DataFrame:
    """Latest result per url across snapshots (W3 newest-prior pick:
    later snapshot wins — snapshot paths sort by sequence number).
    Delegates to Catalog.read_latest, the same latest-wins rule compact
    applies, so reads are identical before/after (auto-)compaction.

    ``config_hash`` restricts the pick to one run configuration (≙
    reading one ``<config_hash>/`` directory in the reference's output
    store); default is latest-across-configs. The filter lands before
    the window, so it prunes at the scan."""
    cat = Catalog(store_root)
    snaps = cat.snapshots("results")
    if not snaps:
        raise FileNotFoundError(f"no results table under {store_root}")
    if config_hash is None:
        return cat.read_latest(spark, "results", ["url"])
    df = (
        cat.read(spark, "results")
        .where(F.col("config_hash") == config_hash)
        .withColumn("_snap", F.input_file_name())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(F.col("_snap").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_snap")
    )


def read_results_for_url(
    spark: SparkSession,
    store_root: str,
    url: str,
    partition_buckets: int,
    config_hash: str | None = None,
) -> DataFrame:
    """Point lookup against a bucket-partitioned results table: the
    ``url_bucket = pmod(xxhash64(url), N)`` predicate folds to a
    literal at planning time, so all other bucket directories are
    pruned from the scan (verify: the plan's partition filter lists
    one bucket). Scans 1/N of the store regardless of corpus size."""
    df = read_results(spark, store_root, config_hash=config_hash)
    return df.where(
        (
            F.col("url_bucket")
            == F.pmod(F.xxhash64(F.lit(url)), F.lit(partition_buckets)).cast("int")
        )
        & (F.col("url") == url)
    )


def replay_postprocess(
    spark: SparkSession, store_root: str, transform
) -> DataFrame:
    """post_process='only' (``base.py:172-215``): apply ``transform``
    to the persisted results without re-running extraction."""
    return transform(read_results(spark, store_root))
