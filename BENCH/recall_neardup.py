"""Measured recall of embedding_neardup_pairs vs exact brute force.

Ground truth = every pair with exact cosine >= threshold over the
sf0.01 embeddings table augmented with deterministic near-dups at a
RANGE of perturbation strengths (cosine ~0.9905 to ~0.9999 for eps
0.1-0.01 on unit vectors), so recall is measured across the band just
above the 0.9 threshold, not only on easy almost-identical pairs.

    python BENCH/recall_neardup.py [--sf /root/testdata/sf0.01]
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
    ap.add_argument("--threshold", type=float, default=0.9)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from neurostore_text_extraction_spark.operators import similarity
    from neurostore_text_extraction_spark.session import get_spark

    spark = get_spark(cores=8)
    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    v = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", v.alias("embedding"))
    # perturbation bands: vec_id%10==r -> eps per band (r=0..3)
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

    # exact ground truth: all-pairs cosine >= threshold (O(n^2), small sf)
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

    got = similarity.embedding_neardup_pairs(
        allv, dim=64, threshold=args.threshold, n_planes=8, n_tables=4
    )
    hit = truth.join(got.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi")
    n_hit = hit.count()
    print(
        f"vectors={n} truth_pairs={n_truth} lsh_pairs={got.count()} "
        f"hit={n_hit} recall={n_hit / max(n_truth, 1):.4f} "
        f"(8 planes x 4 tables, threshold {args.threshold})"
    )


if __name__ == "__main__":
    main()
