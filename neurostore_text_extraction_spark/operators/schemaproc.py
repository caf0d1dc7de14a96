"""Generic schema-metadata-driven nested post-processing (F6) and
output-schema validation — SURVEY.md §2.7 F6 and §1.2.

Reference semantics re-expressed:
- the extractor declares an output schema whose field metadata mark
  string leaves for processing (``json_schema_extra={"normalize_text":
  …, "expand_abbreviations": …}``, ``ns_extract/pipelines/
  data_structures.py:14-18``); paths are collected recursively with
  ``[]`` markers for list nesting (``base.py:896-959``);
- post-processing walks those paths and rewrites the string leaves —
  abbreviation expansion first, then normalization
  (``base.py:1097-1226``, esp. ``1114-1120``, ``1174-1222``);
- every row is validated against the declared schema; failures set a
  per-row ``valid`` flag instead of aborting (``base.py:1072-1095``,
  ``utils.py:286-307``).

Spark realization: the declared schema is a ``StructType`` whose
``StructField.metadata`` carry the same markers. The rewrite is a
recursive Column builder over nested types using ONLY higher-order
functions — ``F.transform`` for arrays, ``Column.withField`` for
structs, ``F.aggregate`` + ``F.replace`` for the per-row abbreviation
replace loop — so the whole rewrite stays JVM-side/codegen (Python
UDFs cannot appear inside lambda functions, and none are needed:
``string.capwords`` semantics are expressible natively). The only
Python hop is the one Schwartz–Hearst abbreviation extraction per row
(Arrow-batched), computed once and shared by every marked leaf — the
analogue of the reference extracting abbreviations once per study
(``base.py:1147-1161``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

NORMALIZE = "normalize_text"
EXPAND = "expand_abbreviations"
REQUIRED = "required"


# --- path collection (diagnostics / parity with base.py:896-959) -----------


def collect_marked_paths(
    schema: T.StructType, keys: tuple[str, ...] = (NORMALIZE, EXPAND)
) -> list[str]:
    """Dotted paths of marked string leaves, with ``[]`` for list
    nesting — e.g. ``groups[].diagnosis``."""
    out: list[str] = []

    def walk(dtype: T.DataType, meta: dict, path: str) -> None:
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f.dataType, f.metadata or {}, f"{path}.{f.name}" if path else f.name)
        elif isinstance(dtype, T.ArrayType):
            walk(dtype.elementType, meta, path + "[]")
        elif isinstance(dtype, T.StringType) and any(meta.get(k) for k in keys):
            out.append(path)

    walk(schema, {}, "")
    return out


def _has_marks(dtype: T.DataType, meta: dict) -> bool:
    if isinstance(dtype, T.StructType):
        return any(_has_marks(f.dataType, f.metadata or {}) for f in dtype.fields)
    if isinstance(dtype, T.ArrayType):
        return _has_marks(dtype.elementType, meta)
    return isinstance(dtype, T.StringType) and bool(meta.get(NORMALIZE) or meta.get(EXPAND))


# --- native leaf transforms --------------------------------------------------


def normalize_string_col(col: Column) -> Column:
    """F1 ``normalize_string`` as a pure native expression (capwords
    parity: split on whitespace, capitalize each word, single-space
    join — collapsing inner runs — then curly-apostrophe fold and
    sentinel-to-null). Usable inside higher-order lambdas, where
    Python UDFs are not."""
    words = F.split(F.trim(col), r"\s+")
    cap = F.transform(
        words,
        lambda w: F.concat(
            F.upper(w.substr(F.lit(1), F.lit(1))),
            F.lower(w.substr(F.lit(2), F.length(w))),
        ),
    )
    joined = F.replace(F.array_join(cap, " "), F.lit("’"), F.lit("'"))
    return F.when(
        col.isNull() | joined.isin("", "None", "Nan", "N/a", "Null"), F.lit(None)
    ).otherwise(joined)


_ABBREV_DDL = (
    "array<struct<short_text:string,short_start:int,short_end:int,"
    "long_text:string,long_start:int,long_end:int>>"
)


def _empty_abbrevs() -> Column:
    return F.array().cast(_ABBREV_DDL)


def dedup_abbreviations_col(abbrevs: Column, seed: Column | None = None) -> Column:
    """Keep the first-listed entry per short form (the reference's
    'first long form wins', ``normalize.py:100-144``) — an aggregate
    fold appending only unseen short forms. Default seed is
    ``slice(abbrevs, 1, 0)`` (an empty array of the INPUT's exact
    struct type, whatever its integer widths); pass an explicit typed
    seed to keep ``abbrevs`` referenced exactly once."""
    return F.aggregate(
        abbrevs,
        seed if seed is not None else F.slice(abbrevs, 1, 0),
        lambda acc, ab: F.when(
            F.exists(acc, lambda p: p["short_text"] == ab["short_text"]), acc
        ).otherwise(F.concat(acc, F.array(ab))),
    )


def expand_abbreviations_col(
    target: Column, abbrevs: Column, prepared: bool = False
) -> Column:
    """F3 ``resolve_abbreviations`` natively: fold the (deduped)
    abbreviation list over the target with ``replace`` — every
    occurrence of each short form becomes its long form; absent short
    forms are no-ops, exactly like the reference's str.replace loop.

    ``prepared=True`` promises the column is already non-null and
    deduped (see :func:`apply_schema_postprocess`) and folds it with a
    SINGLE column reference — otherwise CollapseProject would inline
    an upstream UDF once per sub-expression reference."""
    if prepared:
        return F.aggregate(
            abbrevs,
            target,
            lambda acc, ab: F.replace(acc, ab["short_text"], ab["long_text"]),
        )
    return F.when(abbrevs.isNull(), target).otherwise(
        F.aggregate(
            dedup_abbreviations_col(F.coalesce(abbrevs, F.slice(abbrevs, 1, 0))),
            target,
            lambda acc, ab: F.replace(acc, ab["short_text"], ab["long_text"]),
        )
    )


# --- the generic rewrite ------------------------------------------------------


def _rewrite(
    col: Column,
    dtype: T.DataType,
    meta: dict,
    abbrevs: Column | None,
    prepared: bool = False,
) -> Column:
    if isinstance(dtype, T.StringType):
        out = col
        if meta.get(EXPAND) and abbrevs is not None:
            out = expand_abbreviations_col(out, abbrevs, prepared=prepared)
        if meta.get(NORMALIZE):
            out = normalize_string_col(out)
        return out
    if isinstance(dtype, T.StructType):
        out = col
        for f in dtype.fields:
            fmeta = f.metadata or {}
            if _has_marks(f.dataType, fmeta):
                out = out.withField(
                    f.name,
                    _rewrite(out.getField(f.name), f.dataType, fmeta, abbrevs, prepared),
                )
        return out
    if isinstance(dtype, T.ArrayType):
        return F.transform(
            col, lambda x: _rewrite(x, dtype.elementType, meta, abbrevs, prepared)
        )
    return col


def apply_schema_postprocess(
    df: DataFrame,
    schema: T.StructType,
    source_col: str | None = None,
) -> DataFrame:
    """Rewrite every metadata-marked string leaf of the columns named
    in ``schema`` (the extractor's *declared* output schema, ≙ the
    reference's ``_output_schema`` pydantic class — markers live on
    the declaration, not the data).

    ``source_col`` names the column holding each row's source text;
    when any leaf is marked ``expand_abbreviations``, Schwartz–Hearst
    abbreviations are extracted from it once per row and folded into
    every marked leaf."""
    abbrevs = None
    needs_expand = bool(collect_marked_paths(schema, keys=(EXPAND,)))
    tmp = "_sp_abbrevs"
    if needs_expand and source_col is not None:
        from .postprocess import extract_abbreviations_udf

        # prepared once: non-null + deduped, so every marked leaf folds
        # it with a single column reference (one UDF eval per leaf even
        # after CollapseProject inlining)
        raw = F.coalesce(
            extract_abbreviations_udf(F.col(source_col)), _empty_abbrevs()
        )
        df = df.withColumn(
            tmp, dedup_abbreviations_col(raw, seed=_empty_abbrevs())
        )
        abbrevs = F.col(tmp)
    for f in schema.fields:
        fmeta = f.metadata or {}
        if f.name in df.columns and _has_marks(f.dataType, fmeta):
            df = df.withColumn(
                f.name,
                _rewrite(F.col(f.name), f.dataType, fmeta, abbrevs, prepared=True),
            )
    if needs_expand and source_col is not None:
        df = df.drop(tmp)
    return df


# --- schema validation ---------------------------------------------------------


def _valid_expr(col: Column, dtype: T.DataType, meta: dict) -> Column:
    this = col.isNotNull() if meta.get(REQUIRED) else F.lit(True)
    if isinstance(dtype, T.StructType):
        child_checks = [
            _valid_expr(col.getField(f.name), f.dataType, f.metadata or {})
            for f in dtype.fields
        ]
        children = child_checks[0] if child_checks else F.lit(True)
        for c in child_checks[1:]:
            children = children & c
        return this & F.when(col.isNull(), F.lit(True)).otherwise(children)
    if isinstance(dtype, T.ArrayType):
        elems = F.forall(col, lambda x: _valid_expr(x, dtype.elementType, {}))
        return this & F.when(col.isNull(), F.lit(True)).otherwise(elems)
    return this


def with_validity(
    df: DataFrame, schema: T.StructType, out_col: str = "valid"
) -> DataFrame:
    """Per-row schema-conformance flag (``base.py:1072-1095``):
    required-marked fields (at any nesting depth, arrays included)
    must be non-null. Types are already guaranteed static by Spark;
    nullability is the dynamic part pydantic would catch. Failures
    flag the row — they never abort the job."""
    checks = [
        _valid_expr(F.col(f.name), f.dataType, f.metadata or {})
        for f in schema.fields
        if f.name in df.columns
    ]
    valid = checks[0] if checks else F.lit(True)
    for c in checks[1:]:
        valid = valid & c
    return df.withColumn(out_col, valid)
