"""Field-level precision/recall/F1 evaluation harness (SURVEY.md §5
layer 6; reference ``evaluation/scripts/calculate_metrics.py:86-152``,
field configs ``evaluation/run_evaluation.py:41-60``).

Semantics preserved exactly:
- both sides normalized per field kind (text lower/trim/collapse,
  numeric coercion, boolean coercion — the F14 normalizers);
- ``total_ground_truth`` / ``total_extracted`` = non-null counts after
  normalization;
- a match needs both sides non-null and equal (numeric: within
  ``tolerance``);
- precision = matches/total_extracted, recall =
  matches/total_ground_truth, F1 harmonic (0.0 on empty denominators).

Spark realization: ONE full-outer join on the row key + ONE aggregate
computing every field's three counts as conditional sums (map-side
combinable), then an inline unpivot of the single result row into
(field, …) rows. No UDF, no per-field pass over the data."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import metrics as M


@dataclass(frozen=True)
class FieldSpec:
    name: str
    kind: str = "text"  # text | numeric | bool
    tolerance: float = 0.0


def _normalize(col: Column, kind: str) -> Column:
    if kind == "numeric":
        return M.coerce_numeric(col)
    if kind == "bool":
        return M.coerce_boolean(col)
    return M.norm_text(col)


def field_prf(
    truth: DataFrame,
    pred: DataFrame,
    fields: list[FieldSpec],
    id_col: str = "url",
) -> DataFrame:
    """truth(id, f1..fn) × pred(id, f1..fn) → one row per field:
    (field, matches, total_ground_truth, total_extracted, precision,
    recall, f1)."""
    t = truth.select(
        F.col(id_col), *[F.col(f.name).alias(f"_t_{f.name}") for f in fields]
    )
    p = pred.select(
        F.col(id_col), *[F.col(f.name).alias(f"_p_{f.name}") for f in fields]
    )
    j = t.join(p, id_col, "full_outer")
    aggs = []
    for f in fields:
        g = _normalize(F.col(f"_t_{f.name}"), f.kind)
        e = _normalize(F.col(f"_p_{f.name}"), f.kind)
        if f.kind == "numeric":
            eq = F.abs(g - e) <= F.lit(f.tolerance)
        else:
            eq = g == e
        match = g.isNotNull() & e.isNotNull() & eq
        aggs += [
            F.sum(F.when(match, 1).otherwise(0)).cast("long").alias(f"_m_{f.name}"),
            F.count(g).alias(f"_tg_{f.name}"),
            F.count(e).alias(f"_te_{f.name}"),
        ]
    counts = j.agg(*aggs)
    per_field = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(f.name).alias("field"),
                    F.col(f"_m_{f.name}").alias("matches"),
                    F.col(f"_tg_{f.name}").alias("total_ground_truth"),
                    F.col(f"_te_{f.name}").alias("total_extracted"),
                )
                for f in fields
            ]
        )
    ).alias("r")
    prec = F.when(
        F.col("r.total_extracted") > 0,
        F.col("r.matches") / F.col("r.total_extracted"),
    ).otherwise(0.0)
    rec = F.when(
        F.col("r.total_ground_truth") > 0,
        F.col("r.matches") / F.col("r.total_ground_truth"),
    ).otherwise(0.0)
    return (
        counts.select(per_field)
        .select(
            "r.field",
            "r.matches",
            "r.total_ground_truth",
            "r.total_extracted",
            prec.alias("precision"),
            rec.alias("recall"),
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(0.0),
        )
    )
