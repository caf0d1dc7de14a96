"""From-scratch byte-level BPE (functions/bpe.py): pinned merges on
reference strings, determinism, roundtrip, and packing/chunking under
BPE budgets (VERDICT r3 next-round #4)."""

import pytest

from neurostore_text_extraction_spark.functions import bpe


def test_train_deterministic_and_pinned():
    corpus = ["low lower lowest", "new newer newest", "low low new"]
    m1 = bpe.train_bpe(corpus, 8)
    m2 = bpe.train_bpe(corpus, 8)
    assert m1 == m2
    # PINNED merge sequence on this reference corpus: most frequent
    # pair wins, ties break on the lexicographically smallest pair —
    # any change to training is a contract break, not a refactor
    assert [(a.decode(), b.decode()) for a, b in m1] == [
        ("l", "o"), ("lo", "w"), ("e", "w"), ("n", "ew"),
        (" ", "low"), (" ", "new"), (" low", "e"), (" new", "e"),
    ]
    enc = bpe.BPE(m1)
    ids = enc.encode("low lower")
    assert enc.decode(ids) == "low lower"
    assert ids == [257, 262, 114]  # 'low', ' lowe', 'r'
    assert enc.count("newest") == 4


def test_committed_merges_table_pinned():
    """The committed resources/bpe_merges.txt is a versioned model
    artifact: its head merges and a reference count are pinned so a
    silent retrain (or resource-loading bug) fails loudly. Regenerate
    intentionally with scripts/train_bpe_merges.py."""
    enc = bpe.default_bpe()
    # round 5: retrained at a 16k target over documents + goldens +
    # langid seeds; the committed corpus saturates at 9,575 merges
    # (no pair occurs twice beyond that — see train_bpe_merges.py)
    assert len(enc.merges) == 9575
    assert enc.merges[:3] == [(b"e", b"r"), (b" ", b"s"), (b"i", b"n")]
    assert enc.count("the scan filter") == 3


def test_serialization_roundtrip():
    m = bpe.train_bpe(["abc abd abe abc"], 5)
    assert bpe.load_merges(bpe.dump_merges(m)) == m


def test_default_encoder_roundtrips_unicode():
    enc = bpe.default_bpe()
    for s in [
        "The quick brown fox.",
        "Ünïcödé — em-dash and café",
        "numbers 12345 and mixed a1b2",
        "",
    ]:
        assert enc.decode(enc.encode(s)) == s
        assert enc.count(s) == len(enc.encode(s))


def test_count_less_than_bytes_more_than_words():
    """Sanity envelope: merged subwords compress below byte count;
    unknown-ish words split above word count."""
    enc = bpe.default_bpe()
    s = "the scan filter join query window sort"
    n = enc.count(s)
    assert n < len(s.encode())
    assert n >= len(s.split())


def test_pack_sequences_bpe_budget(spark):
    from pyspark.sql import functions as F

    from neurostore_text_extraction_spark.operators.packing import pack_sequences

    enc = bpe.default_bpe()
    texts = [
        "scan filter join " * 8,
        "window sort order " * 6,
        "query group hash " * 4,
        "zqxj vbnm " * 3,  # unmerged junk: several tokens per word
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    budget = 40
    out = pack_sequences(docs, max_tokens=budget, num_shards=1, token_counter="bpe")
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {0, 1, 2, 3}
    # n_tokens matches the library encoder exactly
    for r in rows:
        assert r["n_tokens"] == enc.count(texts[r["doc_id"]])
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for seq, rs in by_seq.items():
        total = sum(r["n_tokens"] for r in rs)
        if total > budget:
            assert len(rs) == 1  # only oversize singletons may exceed
    # deterministic across runs
    again = pack_sequences(
        docs, max_tokens=budget, num_shards=1, token_counter="bpe"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pack_sequences_defaults_to_bpe(spark):
    """Round-5 contract: pack_sequences budgets by BPE tokens unless
    the caller opts into the word counter (VERDICT r4 next-round #7)."""
    from neurostore_text_extraction_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(0, "scan filter join " * 4), (1, "zqxj vbnm " * 2)],
        "doc_id long, text string",
    )
    default = pack_sequences(docs, max_tokens=64, num_shards=1).collect()
    explicit = pack_sequences(
        docs, max_tokens=64, num_shards=1, token_counter="bpe"
    ).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, explicit))
    enc = bpe.default_bpe()
    got = {r["doc_id"]: r["n_tokens"] for r in default}
    assert got == {0: enc.count("scan filter join " * 4), 1: enc.count("zqxj vbnm " * 2)}


def test_chunk_text_bpe_budget():
    from neurostore_text_extraction_spark.operators.embeddings import chunk_text

    enc = bpe.default_bpe()
    text = ". ".join(["the scan filter join query window sort merge"] * 12) + "."
    chunks = chunk_text(text, max_tokens=30, min_tokens=5, token_counter=enc.count)
    assert chunks
    for c in chunks:
        assert enc.count(c) <= 30 or len(c.split()) == 1
    # all words preserved in order
    assert " ".join(" ".join(chunks).split()) == " ".join(text.split())
