"""Replicates the driver's Spark-vs-DuckDB correctness comparison so
mismatches surface locally before the round gate. Used by
tests/test_entry.py and runnable standalone:

    python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math

import numpy as np
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            continue
        # normalize all NA flavors (None, pd.NA, NaN-in-object, NaT) to
        # one token so sort keys align across engines
        col = out[c].astype(object)
        out[c] = col.map(
            lambda v: str(v)
            if isinstance(v, (list, tuple, dict, bytes, np.ndarray))
            else ("\x00NA" if pd.isna(v) else str(v))
        )
    out = out.sort_values(by=list(out.columns), key=lambda s: s.astype(str)).reset_index(
        drop=True
    )
    return out


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"schema mismatch: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    a, b = canonical(spark_pdf), canonical(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                av_f = av.astype(float)
                bv_f = bv.astype(float)
                bad = ~(
                    (av_f.isna() & bv_f.isna())
                    | (abs(av_f - bv_f) <= 1e-9 + 1e-9 * abs(bv_f))
                )
            else:
                bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
        except Exception as exc:
            problems.append(f"col {c}: compare error {exc}")
            continue
        n_bad = int(bad.sum())
        if n_bad:
            i = bad.idxmax()
            problems.append(
                f"col {c}: {n_bad} diffs, first at row {i}: spark={a[c][i]!r} duck={b[c][i]!r}"
            )
    return problems


def run_all(sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from neurostore_text_extraction_spark.session import get_spark

    spark = get_spark(cores=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, list[str]] = {}
    names = only or list(qs)
    for name in names:
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:
            results[name] = [f"SPARK ERROR: {type(exc).__name__}: {exc}"]
            continue
        if name not in oracles:
            results[name] = [] if len(spark_pdf) >= 0 else ["no rows"]
            continue
        try:
            con = duck_con(sf_dir)  # fresh per query: a fatal duckdb
            # error must not cascade into later comparisons
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            results[name] = [f"DUCK ERROR: {type(exc).__name__}: {exc}"]
            continue
        results[name] = compare(name, spark_pdf, duck_pdf)
    return results


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None
    res = run_all(sf_dir, only)
    n_bad = 0
    for name, problems in res.items():
        status = "OK " if not problems else "FAIL"
        if problems:
            n_bad += 1
        print(f"{status} {name}")
        for p in problems:
            print(f"     {p[:400]}")
    sys.exit(1 if n_bad else 0)
