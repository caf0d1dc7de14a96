"""Model-based tests: seeded random corpora checked against exact
pure-Python reference implementations of the operator semantics (the
hypothesis-style depth the Spark-bound operators can't get per-example
without a JVM round-trip each)."""

import random

from pyspark.sql import functions as F

from neurostore_text_extraction_spark.operators.packing import pack_sequences
from neurostore_text_extraction_spark.operators.webtext import line_dedup

_POOL = [
    "alpha line", "beta line", "gamma line", "  padded line ", "",
    "delta content", "epsilon content", "zeta unique", "eta filler",
]


def _py_line_dedup(docs: dict[int, str | None], max_doc_freq: int):
    """Reference model of line_dedup semantics."""
    from collections import defaultdict

    key_docs = defaultdict(set)
    for d, t in docs.items():
        if t is None:
            continue
        for ln in t.split("\n"):
            k = ln.strip()
            if k:
                key_docs[k].add(d)
    drop = {k for k, ds in key_docs.items() if len(ds) > max_doc_freq}
    out = {}
    for d, t in docs.items():
        if t is None:
            out[d] = (None, 0, 0)
            continue
        kept_lines, n_kept, n_drop = [], 0, 0
        for ln in t.split("\n"):
            k = ln.strip()
            if k and k in drop:
                n_drop += 1
            else:
                kept_lines.append(ln)
                if k:
                    n_kept += 1
        out[d] = ("\n".join(kept_lines), n_kept, n_drop)
    return out


def test_line_dedup_matches_python_model_on_random_corpora(spark):
    rng = random.Random(42)
    for trial in range(3):
        docs = {}
        for d in range(25):
            if rng.random() < 0.08:
                docs[d] = None
            else:
                n = rng.randint(0, 6)
                docs[d] = "\n".join(rng.choice(_POOL) for _ in range(n))
        cap = rng.choice([1, 2])
        df = spark.createDataFrame(
            list(docs.items()), "doc_id int, text string"
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_dropped"])
            for r in line_dedup(df, max_doc_freq=cap).collect()
        }
        assert got == _py_line_dedup(docs, cap), f"trial {trial} cap {cap}"


def _py_bfd(sizes: dict[int, int], max_tokens: int):
    """Reference best-fit-decreasing over one shard: each doc goes to
    the open bin with the SMALLEST remaining capacity that fits (ties
    on lower bin index); returns doc_id -> (bin, pos)."""
    order = sorted(sizes, key=lambda d: (-sizes[d], d))
    bins, members = [], []
    for d in order:
        n = sizes[d]
        fits = [(rem, b) for b, rem in enumerate(bins) if n <= rem]
        if fits:
            rem, b = min(fits)
            bins[b] = rem - n
            members[b].append(d)
        else:
            bins.append(max(max_tokens - n, 0))
            members.append([d])
    return {
        d: (b, pos) for b, docs in enumerate(members) for pos, d in enumerate(docs)
    }


def test_packing_matches_python_bfd_on_random_sizes(spark):
    rng = random.Random(7)
    for trial in range(3):
        sizes = {d: rng.randint(1, 120) for d in range(40)}
        cap = rng.choice([64, 128])
        rows = [(d, " ".join(["tk"] * n)) for d, n in sizes.items()]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (int(r["seq_id"].split("-")[1]), r["pos"])
            for r in pack_sequences(df, max_tokens=cap, num_shards=1, token_counter="words").collect()
        }
        assert got == _py_bfd(sizes, cap), f"trial {trial} cap {cap}"


def _py_substr_dup(docs: dict[int, str | None], w: int):
    """Reference model of substr_dup_stats semantics."""
    import re
    from collections import Counter

    def windows(t):
        toks = re.findall(r"\w\w+", t.lower())
        if not toks:
            return []
        if len(toks) < w:
            return [" ".join(toks)]
        return [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]

    per_doc = {
        d: windows(t) for d, t in docs.items() if t is not None
    }
    counts = Counter(x for ws in per_doc.values() for x in ws)
    out = {}
    for d, ws in per_doc.items():
        if not ws:
            continue  # token-less docs emit no row
        nd = sum(1 for x in ws if counts[x] > 1)
        out[d] = (len(ws), nd, round(nd / len(ws), 6))
    return out


def test_substr_dup_matches_python_model(spark):
    from neurostore_text_extraction_spark.operators.dedup import substr_dup_stats

    rng = random.Random(13)
    vocab = [f"word{i}" for i in range(12)]
    for trial in range(2):
        docs = {}
        for d in range(30):
            r = rng.random()
            if r < 0.05:
                docs[d] = None
            elif r < 0.1:
                docs[d] = "!!! ???"  # token-less
            else:
                docs[d] = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
        w = rng.choice([3, 5])
        df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
        got = {
            r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
            for r in substr_dup_stats(df, window_tokens=w).collect()
        }
        assert got == _py_substr_dup(docs, w), f"trial {trial} w {w}"
