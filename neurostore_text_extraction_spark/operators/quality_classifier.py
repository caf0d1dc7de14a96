"""Learned quality classifier (the GPT-3 §A.2 / LLaMA-style filter):
a logistic regression trained to distinguish a *reference* corpus
(e.g. curated articles) from raw crawl documents, then used to score
every crawl doc — pages that look like the reference survive.

Spark-first: features are this repo's native quality/C4/Gopher signal
columns (no tokenizer or embedding dependency), assembled with
``pyspark.ml`` and trained with its distributed L-BFGS logistic
regression — the idiomatic cluster path (the driver holds only the
coefficient vector; each iteration is one aggregation over the data).

Determinism: L-BFGS over a convex loss from a fixed init — no RNG
anywhere in the pipeline, so retrains on the same input reproduce the
same coefficients.

GPT-3 also *resamples* with a Pareto rule rather than thresholding:
``keep if score > 1 - np.random.pareto(alpha)``. The deterministic
analogue here reuses the repo's keyed-hash uniform (see
:func:`pareto_keep_col`): u = hash-uniform(key) per doc, keep iff
``score > 1 - pareto_quantile(u)`` — reproducible across runs and
partitionings like every sampler in this repo.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from .textquality import c4_gopher_signal_cols

# numeric signal columns used as features (all pure text functions)
FEATURE_COLS = (
    "n_words",
    "n_sentences",
    "mean_word_len",
    "symbol_word_ratio",
    "frac_alpha_words",
    "frac_lines_term_punct",
    "frac_lines_bullet",
    "frac_lines_ellipsis_end",
)


def _featurize(df: DataFrame, text_col: str, prefix: str = "") -> DataFrame:
    sig = c4_gopher_signal_cols(text_col)
    return df.withColumns(
        {prefix + c: sig[c].cast("double") for c in FEATURE_COLS}
    )


@dataclass
class QualityModel:
    """Fitted coefficients (driver-side floats — broadcastable by
    construction; scoring is a pure column expression, no ml runtime
    needed at inference)."""

    coefficients: list[float]
    intercept: float

    def score_col(self, prefix: str = "") -> Column:
        z = F.lit(float(self.intercept))
        for c, w in zip(FEATURE_COLS, self.coefficients):
            z = z + F.col(prefix + c) * float(w)
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_quality_classifier(
    reference: DataFrame,
    crawl: DataFrame,
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> QualityModel:
    """Label reference docs 1, crawl docs 0; fit LR on the native
    signal features. Both frames only need ``text_col``."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    labeled = _featurize(
        reference.select(F.col(text_col)).withColumn("label", F.lit(1.0)),
        text_col,
    ).unionByName(
        _featurize(
            crawl.select(F.col(text_col)).withColumn("label", F.lit(0.0)),
            text_col,
        )
    )
    asm = VectorAssembler(inputCols=list(FEATURE_COLS), outputCol="_raw")
    scaler = StandardScaler(
        inputCol="_raw", outputCol="_features", withMean=True, withStd=True
    )
    assembled = asm.transform(labeled)
    smodel = scaler.fit(assembled)
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,  # we scaled explicitly to recover raw-space coefs
    )
    m = lr.fit(smodel.transform(assembled))
    # fold the scaler back so score_col works on RAW feature columns:
    # w_raw_i = w_scaled_i / std_i ; b_raw = b - sum_i w_scaled_i * mean_i / std_i
    means = smodel.mean.toArray()
    stds = smodel.std.toArray()
    ws = m.coefficients.toArray()
    coefs, b = [], float(m.intercept)
    for w, mu, sd in zip(ws, means, stds):
        sd = sd if sd > 0 else 1.0
        coefs.append(float(w / sd))
        b -= float(w * mu / sd)
    return QualityModel(coefficients=coefs, intercept=b)


def score_quality(
    df: DataFrame, model: QualityModel, text_col: str = "text"
) -> DataFrame:
    """Append ``quality_clf_score`` in [0,1] (P(reference-like)) — a
    pure column expression over the raw signal columns: the corpus
    scan stays narrow, nothing ships to Python, no ml runtime on the
    scoring path. Internal feature columns are name-prefixed so a
    caller's own ``n_words``/``mean_word_len``/... columns survive
    untouched."""
    return (
        _featurize(df, text_col, prefix="_qc_")
        .withColumn("quality_clf_score", model.score_col(prefix="_qc_"))
        .drop(*["_qc_" + c for c in FEATURE_COLS])
    )


def pareto_keep_col(
    score_col: Column, key_col: Column, alpha: float = 9.0, seed: int = 0
) -> Column:
    """GPT-3 §A.2's stochastic keep rule, made deterministic: keep iff
    ``score > 1 - pareto(alpha)`` where the Pareto draw comes from the
    keyed-hash uniform (inverse CDF: ``(1-u)^(-1/alpha) - 1``) — high
    scores always survive, low scores survive occasionally, and the
    decision is a pure function of (key, seed)."""
    buckets = 1 << 20
    u = F.pmod(F.xxhash64(key_col, F.lit(seed)), F.lit(buckets)) / float(buckets)
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return score_col > (F.lit(1.0) - pareto)
