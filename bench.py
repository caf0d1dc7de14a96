"""Benchmark harness. Runs the headline workload at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "extract_docs_per_sec": ..., "extract_mb_per_sec": ..., "cpus": N}

The flagship metric is the extraction pipeline (BASELINE.json: extracted
docs/sec and GB/s of html bytes); the rest are representative operator
queries from __spark_entry__.queries(). BENCH/run_scaling.py runs this
at two parallelism levels for the N-vs-4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# extraction corpus size scales with the sf dir (sf0.1 → 4000 pages)
_SF_GUESS = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_PAGES = int(os.environ.get("SPARK_GRAFT_N_PAGES", str(max(400, int(40000 * _SF_GUESS)))))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from neurostore_text_extraction_spark.operators.extract import extract_pages
    from neurostore_text_extraction_spark.session import get_spark
    from neurostore_text_extraction_spark.sources.pages import (
        generate_pages,
        pages_view,
    )

    spark = get_spark(app_name="nse-bench", cores=CPUS)
    timings: dict[str, float] = {}

    # --- flagship: extraction pipeline over the synthetic corpus ---
    gen = pages_view(generate_pages(spark, N_PAGES, CPUS * 2)).persist()
    n_docs = gen.count()  # materialize: generation excluded from timing
    total_bytes = gen.agg(F.sum(F.length("html"))).first()[0]

    # warmup (python worker fork + Arrow init)
    extract_pages(gen.limit(64), num_partitions=CPUS).count()

    t0 = time.perf_counter()
    ext = extract_pages(gen, num_partitions=CPUS * 2)
    n_ok = ext.where(F.col("error").isNull() & (F.length("text") > 0)).count()
    t_extract = time.perf_counter() - t0
    timings["extract_pipeline"] = round(t_extract, 3)
    gen.unpersist()
    assert n_ok >= n_docs * 0.99, f"extraction failures: {n_ok}/{n_docs}"

    # --- representative operator queries (driver-contract entries) ---
    qs = entry.queries()
    bench_queries = [
        "word_count",
        "word_deviance",
        "tfidf",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "quality_features",
        "pricing_summary",
        "topk_per_group",
        "revenue_topn",
        "latest_order_per_customer",
        "ann_bruteforce",
        "ann_lsh",
        "extract_roundtrip",
    ]
    for name in bench_queries:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline workload wall time (extraction pipeline + operator queries)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _SF_GUESS,
                "extract_docs_per_sec": round(n_docs / t_extract, 1),
                "extract_mb_per_sec": round(total_bytes / 1e6 / t_extract, 1),
                "extract_n_docs": n_docs,
                "extract_total_mb": round(total_bytes / 1e6, 1),
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
