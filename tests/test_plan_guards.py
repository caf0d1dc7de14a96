"""Plan-regression guards over the driver-contract queries: the
optimized plans of the lazily-constructible registry entries must
never contain a Cartesian product, and only the known Python-stage
queries may contain a Python eval node. Catches accidental
plan-shape regressions (a dropped join key, a UDF slipping into a
native path) before they cost a round."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

# queries whose construction is lazy (no eager materialization) — the
# guard builds their plans without running the heavy eager dedup ops
LAZY_QUERIES = [
    "word_stats",
    "tfidf",
    "dedup_exact",
    "quality_features",
    "token_fingerprints",
    "incremental_changed",
    "events_json",
    "source_priority",
    "source_attach",
    "add_pipeline_latest",
    "latest_order_per_customer",
    "topk_per_group",
    "pricing_summary",
    "revenue_topn",
    "embedding_mean_pool",
    "textnorm_abbrev",
    "url_quality_filter",
    "demographics_clean",
    "nested_postprocess",
    "patient_study",
    "metrics_normalize",
    "eval_prf",
    "identifiers_json",
    "table_pairing",
    "domain_stats",
    "pii_url_scrub",
    "repetition_features",
    "line_dedup",
    "event_sessions",
]

# lazy queries that legitimately cross into Python (Arrow-batched):
# textnorm_abbrev rides pandas UDFs by design (capwords /
# Schwartz–Hearst reference parity), as does nested_postprocess's ctx
# variant; url_quality_filter's list path (the registered one) is
# pure expressions
PYTHON_OK = {"nested_postprocess", "textnorm_abbrev"}

# word_deviance broadcasts its 1-ROW global mean with a cross join —
# that is the intended plan (corpus-scoped scalar, not a blowup)
CROSS_OK = {"word_stats"}


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    out = {}
    for name in LAZY_QUERIES:
        df = qs[name](spark, SF)
        out[name] = df._jdf.queryExecution().optimizedPlan().toString()
    return out


def test_no_cartesian_products(plans):
    bad = [
        n
        for n, p in plans.items()
        if n not in CROSS_OK and ("Join Cross" in p or "Cartesian" in p)
    ]
    assert not bad, bad


def test_python_nodes_only_where_expected(plans):
    markers = ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "MapInArrow")
    bad = [
        n
        for n, p in plans.items()
        if n not in PYTHON_OK and any(m in p for m in markers)
    ]
    assert not bad, bad


def test_every_plan_reads_parquet(plans):
    # each registry query must bottom out in the sf tables (no
    # accidental in-memory stand-ins)
    bad = [n for n, p in plans.items() if "parquet" not in p.lower()]
    assert not bad, bad
