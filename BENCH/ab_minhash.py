"""A/B isolation of the dedup_minhash_lsh anti-scaling seen in r3.

Round-3 medians showed 12.0s at local[8] -> 35.5s at local[32] for the
minhash query (same shape for ngram_jaccard and simhash).  Two rival
explanations:

  (a) host phantom load / DVFS (the builder's claim, supported by
      min-of-N samples), or
  (b) a real cause in the eager persist -> localCheckpoint -> unpersist
      cycle inside ``minhash_lsh_pairs`` (the judge's candidate,
      VERDICT r3 "What's wrong #1").

This script separates them: it runs the exact bench query at
cores in {8, 32} x eager in {True, False}, fresh JVM per config,
REPS timed reps per JVM after one warm-up, and prints min + median
per config.  If (b) were true, eager=False would scale well while
eager=True anti-scales; if (a), both variants move together and
min-of-N at 32 beats 8.

Usage:
    python BENCH/ab_minhash.py            # driver: all 4 configs
    python BENCH/ab_minhash.py CHILD 8 1  # one config (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


def child(cores: int, eager: bool) -> None:
    from pyspark.sql import functions as F

    from neurostore_text_extraction_spark.operators import dedup
    from neurostore_text_extraction_spark.session import get_spark

    spark = get_spark(app_name=f"ab-minhash-{cores}-{eager}", cores=cores)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    pert = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate tail")).alias("text"),
    )
    src = docs.unionAll(pert)

    def run() -> float:
        t0 = time.perf_counter()
        out = dedup.minhash_lsh_pairs(src, eager=eager)
        out.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run()  # warm-up: python workers + JIT + page cache
    walls = sorted(run() for _ in range(REPS))
    print(
        "AB_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "eager": eager,
                "min": round(walls[0], 2),
                "median": round(walls[len(walls) // 2], 2),
                "all": [round(w, 2) for w in walls],
            }
        )
    )


def main() -> None:
    results = []
    for cores in (8, 32):
        for eager in (True, False):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "CHILD", str(cores), str(int(eager))],
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            for line in p.stdout.splitlines():
                if line.startswith("AB_RESULT "):
                    r = json.loads(line[len("AB_RESULT "):])
                    results.append(r)
                    print(json.dumps(r), flush=True)
                    break
            else:
                print(f"FAILED cores={cores} eager={eager}: {p.stderr[-2000:]}", flush=True)
    by = {(r["cores"], r["eager"]): r for r in results}
    for eager in (True, False):
        a, b = by.get((8, eager)), by.get((32, eager))
        if a and b:
            print(
                f"eager={eager}: min 8c={a['min']}s 32c={b['min']}s "
                f"(32c/8c={b['min']/a['min']:.2f}) | "
                f"median 8c={a['median']}s 32c={b['median']}s "
                f"(32c/8c={b['median']/a['median']:.2f})"
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "CHILD":
        child(int(sys.argv[2]), bool(int(sys.argv[3])))
    else:
        main()
