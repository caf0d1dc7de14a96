"""Measure LSH ANN recall@k against the exact brute-force top-k.

Usage: python BENCH/recall_lsh.py [sf_dir]

Prints one line per (n_planes, n_probes) config:
    planes=4 probes=1 recall@5=0.92 candidates/query=...
Written into BENCH/BASELINE.md (recall section).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from neurostore_text_extraction_spark.operators import similarity
from neurostore_text_extraction_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_vec = emb.count()
    dim = len(emb.select("embedding").first()[0])
    queries = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 5
    exact = similarity.brute_force_topk(emb, queries, k=k)
    exact_pairs = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    n_q = len({q for q, _ in exact_pairs})
    print(f"corpus={n_vec} dim={dim} queries={n_q} k={k}")
    for n_planes in (4, 6):
        for n_probes in (1, 3, n_planes + 1):
            approx = similarity.lsh_topk(
                emb, queries, dim=dim, k=k, n_planes=n_planes, n_probes=n_probes
            )
            got = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
            recall = len(got & exact_pairs) / len(exact_pairs)
            print(
                f"planes={n_planes} probes={n_probes} "
                f"recall@{k}={recall:.3f} returned={len(got)}"
            )


if __name__ == "__main__":
    main()
