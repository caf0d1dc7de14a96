"""Train the committed char-ngram language-ID profiles.

From-scratch analogue of the fastText/CLD-style classifier CCNet-shaped
pipelines route on (Wenzek et al. 2020 route documents by language
before quality filtering; the reference delegates language handling to
its upstream sources — ns_extract has no lang-ID of its own, so this is
part of the beyond-reference training-data surface).

Deterministic: reads the committed seed sentences at
``neurostore_text_extraction_spark/resources/langid_seeds/<lang>.txt``,
trains a character 1-3-gram multinomial Naive Bayes on the first
``TRAIN_LINES`` lines of each file (the remainder is the held-out set
used by ``tests/test_langid.py`` — never seen here), and writes
``neurostore_text_extraction_spark/resources/langid_profiles.json``:

    {"ngram_ns": [1,2,3], "topk": K, "train_lines": 14,
     "langs": {"en": {"total": N, "counts": {"the": 12, ...}}, ...}}

Only raw counts are stored (small, diff-able); smoothing happens at
load time in ``functions/langid.py`` so the smoothing constant can
change without retraining.

    python scripts/train_langid_profiles.py
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

PKG = os.path.join(_REPO_ROOT, "neurostore_text_extraction_spark")
SEEDS_DIR = os.path.join(PKG, "resources", "langid_seeds")
OUT_PATH = os.path.join(PKG, "resources", "langid_profiles.json")

NGRAM_NS = (1, 2, 3)
TOPK = 600  # per-language ngram budget; union vocab stays ~10k
TRAIN_LINES = 14  # lines 0-13 train; 14+ are the held-out test set


# the normalization contract lives in the SCORER — importing it (not
# copying it) guarantees trainer and scorer can never skew apart; any
# edit to functions/langid.normalize retrains against the same bytes
from neurostore_text_extraction_spark.functions.langid import (  # noqa: E402
    normalize,
)


def ngrams(text: str) -> Counter:
    norm = normalize(text)
    c: Counter = Counter()
    for n in NGRAM_NS:
        for i in range(len(norm) - n + 1):
            g = norm[i : i + n]
            if g.strip():  # skip pure-space grams
                c[g] += 1
    return c


def main() -> None:
    langs: dict[str, dict] = {}
    for fname in sorted(os.listdir(SEEDS_DIR)):
        if not fname.endswith(".txt"):
            continue
        lang = fname[:-4]
        with open(os.path.join(SEEDS_DIR, fname), encoding="utf-8") as f:
            lines = [l.strip() for l in f if l.strip()]
        train = lines[:TRAIN_LINES]
        counts: Counter = Counter()
        for line in train:
            counts.update(ngrams(line))
        top = dict(
            sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPK]
        )
        langs[lang] = {"total": sum(counts.values()), "counts": top}
        print(f"{lang}: {len(lines)} lines, {len(counts)} distinct ngrams, kept {len(top)}")
    doc = {
        "ngram_ns": list(NGRAM_NS),
        "topk": TOPK,
        "train_lines": TRAIN_LINES,
        "langs": langs,
    }
    with open(OUT_PATH, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, separators=(",", ":"), sort_keys=True)
    print(f"→ {OUT_PATH} ({os.path.getsize(OUT_PATH)} bytes, {len(langs)} languages)")


if __name__ == "__main__":
    main()
