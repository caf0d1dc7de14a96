"""Similarity search over an embedding column (task brief: brute-force
cosine top-k baseline + LSH-bucketed scale path; also the engine-side
analogue of the reference's embedding mean-pool, A4 / ``ns_extract/
pipelines/api.py:275-278``).

All vector math is native Spark (``zip_with`` + ``aggregate`` higher-
order functions — JVM-side, codegen'd); no Python hop. Cosine uses
double precision throughout so the DuckDB oracle matches to the last
rounding digit.

Scale path: brute force is O(Q·N) — fine when Q is small or N fits a
broadcast; the hyperplane-LSH variant buckets vectors by sign
signature so each query only scans its bucket (candidates = same
bucket), turning the scan into an equi-join. Recall is tunable by
n_planes (fewer planes → bigger buckets → higher recall).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast —
    never the corpus — so the corpus scan stays partition-parallel
    with no shuffle until the final per-query top-k window."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = vectors.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_col(F.col("_qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(query_id_col, id_col, "cosine", F.col("_rk").alias("rank"))
    )


def _plane_weight(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1):
    derived from md5(f"{plane}:{dim}") — reproducible in SQL."""
    h = F.md5(F.concat_ws(":", F.lit(plane), F.lit(dim)))
    v = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
    return v / F.lit(float(0x80000000)) - 1.0


def lsh_bucket_col(vec_col: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-signature bucket id: bit p = 1 iff dot(vec, plane_p) > 0."""
    bits = []
    for p in range(n_planes):
        dot = sum(
            vec_col.getItem(d).cast("double") * _plane_weight(p, d)
            for d in range(dim)
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(bits).cast("int")


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane
    bucket (equi-join on bucket), then exact cosine re-rank."""
    vb = vectors.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), dim, n_planes))
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket_col(F.col(vec_col), dim, n_planes).alias("_bucket"),
    )
    scored = vb.join(F.broadcast(qb), "_bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_col(F.col("_qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(query_id_col, id_col, "cosine", F.col("_rk").alias("rank"))
    )


def embedding_mean_pool(
    chunks: DataFrame, id_col: str = "doc_id", vec_col: str = "embedding"
) -> DataFrame:
    """Mean over chunk embeddings per doc (A4): element-wise sum via
    zip_with aggregation, then divide by count — no UDF."""
    dim_zero = F.transform(F.col(vec_col), lambda x: x * F.lit(0.0))
    summed = chunks.groupBy(id_col).agg(
        F.count("*").alias("_n"),
        F.aggregate(
            F.collect_list(vec_col),
            F.array().cast("array<double>"),
            lambda acc, v: F.when(F.size(acc) == 0, v.cast("array<double>")).otherwise(
                F.zip_with(acc, v, lambda a, b: a + b.cast("double"))
            ),
        ).alias("_sum"),
    )
    return summed.select(
        F.col(id_col),
        F.transform(F.col("_sum"), lambda x: x / F.col("_n")).alias("mean_embedding"),
    )
