"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard (training-data pipeline extensions; task
brief "Beyond the reference's own operators").

Cross-engine determinism: every hash is an md5 *hex string* (lowercase)
— identical in Spark (`F.md5`) and DuckDB (`md5`) — so each operator
has an exact ANSI-SQL oracle twin in ``__spark_entry__.py``. Min-hash
minima are lexicographic minima over hex strings: order-independent,
shuffle-safe.

Scale notes:
- exact dedup: one groupBy on md5(text) — map-side partial agg.
- MinHash: explode(shingles) → k mins in ONE groupBy (k agg exprs,
  single shuffle); LSH banding turns O(n²) pair search into a
  self-equi-join on (band_idx, band_hash) — the classic shingle→
  minhash→band→bucket-join pipeline; skewed buckets (boilerplate-heavy
  shingle sets) are handled by AQE skew-join splitting.
- SimHash: explode(token)×explode(bit) — bounded by N_BITS; emits one
  signature row per doc, pairs found by Hamming-band prefix join.
- n-gram Jaccard: distinct shingle self-join; candidate pruning by
  requiring a shared shingle (inner join) keeps the pair space sparse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tfidf import tokens_col

MINHASH_K = 8  # signature length
LSH_BAND_SIZE = 2  # 4 bands of 2 — candidates need one identical band
SIMHASH_BITS = 32


def shingles_col(text_col: str = "text", k: int = 3):
    """k-word shingles as space-joined strings from the sklearn-parity
    tokenizer; docs shorter than k words get their full token join."""
    t = tokens_col(text_col)
    return F.when(F.size(t) < k, F.array(F.concat_ws(" ", t))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - k),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)),
        )
    )


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with its
    representative (min id) and multiplicity."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(id_col).alias("representative"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    shingle_words: int = 3,
) -> DataFrame:
    """One row per doc with columns mh_0..mh_{k-1}: the lexicographic
    min of md5(f"{i}|{shingle}") over the doc's distinct shingles."""
    # no distinct: min over a multiset equals min over its set, so the
    # extra (doc, shingle) dedup shuffle would be pure waste
    sh = df.select(
        F.col(id_col), F.explode(shingles_col(text_col, shingle_words)).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"mh_{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    band_size: int = LSH_BAND_SIZE,
    shingle_words: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >=1 LSH band, with the
    minhash-estimated jaccard (fraction of equal signature slots)."""
    sig = minhash_signatures(df, id_col, text_col, k, shingle_words)
    n_bands = k // band_size
    bands = sig.select(
        F.col(id_col),
        *[F.col(f"mh_{i}") for i in range(k)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"mh_{b * band_size + j}")
                                    for j in range(band_size)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, *[f"mh_{i}" for i in range(k)], "band.band_idx", "band.band_hash")
    # The self-join consumes `bands` twice; without persistence Spark
    # recomputes the whole tokenize->shingle->minhash tree per side.
    # bands is tiny (n_docs x n_bands short rows), so cache it.
    bands = bands.persist()
    a = bands.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(k)],
        "band_idx",
        "band_hash",
    )
    b = bands.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(k)],
        "band_idx",
        "band_hash",
    )
    eq_terms = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(k)
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", (eq_terms / F.lit(float(k))).alias("est_jaccard"))
        .distinct()
    )


def _bit_of_md5(col, bit: int):
    """Deterministic bit: parse one hex nibble of the md5 and test one
    of its 4 bits — identical arithmetic in DuckDB SQL."""
    nibble = F.conv(F.substring(col, bit // 4 + 1, 1), 16, 10).cast("int")
    return F.shiftright(nibble, bit % 4).bitwiseAND(F.lit(1))


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Per-doc SimHash over token md5s: bit b of the signature is 1 iff
    sum over tokens of (2*bit_b(md5(token)) - 1) > 0."""
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    ).select(F.col(id_col), F.md5(F.col("tok")).alias("h"))
    bit_sums = [
        F.sum(_bit_of_md5(F.col("h"), b) * 2 - 1).alias(f"s_{b}") for b in range(n_bits)
    ]
    sums = toks.groupBy(id_col).agg(*bit_sums)
    sig = sum(
        F.when(F.col(f"s_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(n_bits)
    )
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over distinct k-word shingles for every pair
    sharing at least one shingle; |A∪B| = |A|+|B|-|A∩B|."""
    sh = df.select(
        F.col(id_col), F.explode(shingles_col(text_col, shingle_words)).alias("sh")
    ).distinct()
    # consumed three times (self-join sides + sizes): cache the small
    # (id, shingle) frame instead of recomputing the tokenize tree
    sh = sh.persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").cast("long").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "sh")
    b = sh.select(F.col(id_col).alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
