"""Optimization-round measurement harness (guide §1). NOT the frozen
driver bench — bench.py stays untouched. This one:

- times each query's CONSTRUCTION (eager operators run jobs at build
  time) separately from its noop-sink EXECUTION (guide §1.4), min over
  N interleaved passes like bench.py;
- labels every job (guide §1.5) so the UI/event log is readable;
- dumps .explain("formatted") per query to plans/r06/<q>_<tag>.txt.

Usage:
    python bench_extra.py [tag] [query ...]
tag defaults to "before"; default query set = the 27 bench.py queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "3"))

BENCH_QUERIES = [
    "word_stats", "tfidf", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "quality_features", "pricing_summary",
    "topk_per_group", "revenue_topn", "latest_order_per_customer",
    "ann_bruteforce", "ann_lsh", "extract_roundtrip", "entity_link",
    "llm_demographics", "repetition_features", "contamination_check",
    "pii_url_scrub", "eval_prf", "dedup_clusters", "session_windows",
    "dedup_embedding", "line_dedup", "lm_perplexity", "substr_dedup",
    "url_quality_filter",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES

    import __spark_entry__ as entry
    from neurostore_text_extraction_spark.session import get_spark

    spark = get_spark(app_name="nse-bench-extra", cores=CPUS)
    qs = entry.queries()
    os.makedirs("plans/r06", exist_ok=True)

    build: dict[str, list[float]] = {n: [] for n in names}
    execu: dict[str, list[float]] = {n: [] for n in names}
    for p in range(REPS):
        for name in names:
            sc = spark.sparkContext
            sc.setJobDescription(f"{name}: build (pass {p})")
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            sc.setJobDescription(f"{name}: exec (pass {p})")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobDescription(None)
            build[name].append(t1 - t0)
            execu[name].append(t2 - t1)
            if p == 0:
                with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))

    out = {}
    for name in names:
        out[name] = {
            "build_min": round(min(build[name]), 3),
            "exec_min": round(min(execu[name]), 3),
            "total_min": round(min(b + e for b, e in zip(build[name], execu[name])), 3),
            "samples": [round(b + e, 3) for b, e in zip(build[name], execu[name])],
        }
    out["_total_of_mins"] = round(sum(v["total_min"] for v in out.values()), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
