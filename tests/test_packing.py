"""Sequence packing (shard-local FFD): completeness, budget
invariants, determinism, oversize isolation, JVM-side assembly."""

import pytest
from pyspark.sql import functions as F

from neurostore_text_extraction_spark.operators.packing import (
    assemble_packed,
    pack_sequences,
)


def _docs(spark, sizes):
    # doc i has sizes[i] two-char tokens
    rows = [(i, " ".join(["tk"] * n)) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_every_doc_assigned_once_and_budget_held(spark):
    df = _docs(spark, [10, 20, 30, 40, 50, 60, 5, 15, 25, 35])
    out = pack_sequences(df, max_tokens=64, num_shards=2, token_counter="words").collect()
    assert sorted(r["doc_id"] for r in out) == list(range(10))
    sums = {}
    for r in out:
        sums[r["seq_id"]] = sums.get(r["seq_id"], 0) + r["n_tokens"]
    assert all(s <= 64 for s in sums.values())


def test_oversize_doc_gets_own_sequence(spark):
    df = _docs(spark, [100, 10, 10])
    out = pack_sequences(df, max_tokens=64, num_shards=1, token_counter="words").collect()
    by_seq = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], []).append(r["doc_id"])
    oversize_seq = [s for s, ds in by_seq.items() if 0 in ds]
    assert len(by_seq[oversize_seq[0]]) == 1  # isolated
    # the two small docs pack together
    assert any(len(ds) == 2 for ds in by_seq.values())


def test_deterministic_across_input_partitionings(spark):
    df = _docs(spark, [7, 13, 21, 9, 30, 18, 4, 26])
    a = pack_sequences(df, max_tokens=40, num_shards=2, token_counter="words").collect()
    b = pack_sequences(df.repartition(7), max_tokens=40, num_shards=2, token_counter="words").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bfd_is_near_optimal_on_one_shard(spark):
    # sizes summing to 120 with max 40 -> lower bound 3 bins; BFD finds 3
    df = _docs(spark, [25, 15, 20, 20, 30, 10])
    out = pack_sequences(df, max_tokens=40, num_shards=1, token_counter="words").collect()
    assert len({r["seq_id"] for r in out}) == 3


def test_assemble_packed_orders_and_counts(spark):
    df = _docs(spark, [3, 2, 1])
    assigns = pack_sequences(df, max_tokens=10, num_shards=1, token_counter="words")
    packed = assemble_packed(assigns, df, sep=" | ").collect()
    assert len(packed) == 1
    row = packed[0]
    assert row["n_docs"] == 3 and row["n_tokens"] == 6
    # BFD order: largest doc first, then descending
    assert row["packed_text"] == "tk tk tk | tk tk | tk"
    # no Python hop in the assembly plan
    plan = (
        assemble_packed(assigns, df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "PythonUDF" not in plan


def test_empty_shards_and_default_shard_count(spark):
    """A hash shard with no rows must yield no output, not crash —
    with default num_shards the frame repartitions to the session
    shuffle parallelism, so most shards of a tiny corpus ARE empty."""
    df = _docs(spark, [5, 9])
    out = pack_sequences(df, max_tokens=16).collect()  # default shards
    assert sorted(r["doc_id"] for r in out) == [0, 1]
    out2 = pack_sequences(df, max_tokens=16, num_shards=64).collect()
    assert sorted(r["doc_id"] for r in out2) == [0, 1]


def test_non_integral_id_rejected(spark):
    df = spark.createDataFrame([("u1", "tk tk")], "doc_id string, text string")
    with pytest.raises(ValueError, match="integral id"):
        pack_sequences(df, max_tokens=16)


def test_null_text_packs_as_zero_tokens(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "tk tk tk")], "doc_id long, text string"
    )
    out = pack_sequences(df, max_tokens=8, num_shards=1, token_counter="words").collect()
    got = {r["doc_id"]: r["n_tokens"] for r in out}
    assert got == {0: 0, 1: 3}  # both docs assigned, null = 0 tokens


def test_zero_token_doc_never_reopens_oversize_bin(spark):
    """A 0-token doc (NULL/empty text) must not join an oversize
    single-doc bin: the invariant is that ONLY single-doc sequences
    may exceed max_tokens — ADVICE r3 regression."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "word " * 50),  # 50 tokens, oversize vs max_tokens=10
            (2, None),          # 0 tokens
            (3, ""),            # 0 tokens
        ],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, max_tokens=10, num_shards=1, token_counter="words").collect()
    assert {r["doc_id"] for r in out} == {1, 2, 3}  # completeness
    by_seq = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for seq, rows in by_seq.items():
        total = sum(r["n_tokens"] for r in rows)
        if total > 10:
            assert len(rows) == 1, f"multi-doc oversize sequence {seq}: {rows}"
