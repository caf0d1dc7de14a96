"""Measured dedup coverage of semantic_dedup (SemDeDup) vs exact.

Same augmented corpus as recall_neardup.py (sf embeddings + planted
near-dups at cosine ~0.9905-0.9999). Ground truth = every pair with
exact cosine >= threshold. SemDeDup is a DROP decision, not a pair
list, so the operational metric is PAIR COVERAGE: a truth pair is
covered when at least one endpoint is marked duplicate — i.e. no
near-duplicate pair survives the dedup intact. Clustering loss shows
up as uncovered pairs whose endpoints landed in different k-means
clusters (the documented SemDeDup tradeoff; the paper picks k small
enough that true duplicates co-cluster).

    python BENCH/recall_semdedup.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--centroids", type=int, nargs="*", default=[8, 25])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from neurostore_text_extraction_spark.operators import similarity
    from neurostore_text_extraction_spark.session import get_spark

    spark = get_spark(cores=8)
    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    v = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", v.alias("embedding"))
    parts = [base]
    for r, eps in ((0, 0.1), (1, 0.07), (2, 0.04), (3, 0.02)):
        parts.append(
            emb.where(F.col("vec_id") % 10 == r).select(
                (F.col("vec_id") + 1000000 * (r + 1)).alias("vec_id"),
                F.concat(
                    F.array(F.element_at(v, 1) + F.lit(eps)),
                    F.slice(v, 2, 63),
                ).alias("embedding"),
            )
        )
    allv = parts[0]
    for p in parts[1:]:
        allv = allv.unionAll(p)
    allv = allv.cache()
    n = allv.count()

    a = allv.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("_va"))
    b = allv.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("_vb"))
    cos = similarity.cosine_col(F.col("_va"), F.col("_vb"))
    truth = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", cos.alias("cosine"))
        .where(F.col("cosine") >= args.threshold)
        .cache()
    )
    n_truth = truth.count()

    for k in args.centroids:
        out = similarity.semantic_dedup(
            allv, dim=64, n_centroids=k, threshold=args.threshold,
            id_col="vec_id",
        ).cache()
        dropped = out.where("is_dup").select(F.col("vec_id"))
        n_drop = dropped.count()
        cov = (
            truth.join(
                dropped.withColumnRenamed("vec_id", "doc_a"), "doc_a", "left_semi"
            )
            .unionAll(
                truth.join(
                    dropped.withColumnRenamed("vec_id", "doc_b"), "doc_b", "left_semi"
                )
            )
            .select("doc_a", "doc_b")
            .distinct()
            .count()
        )
        print(
            f"k={k}: vectors={n} truth_pairs={n_truth} dropped={n_drop} "
            f"pairs_covered={cov} coverage={cov / max(n_truth, 1):.4f} "
            f"(threshold {args.threshold})"
        )
        out.unpersist()


if __name__ == "__main__":
    main()
