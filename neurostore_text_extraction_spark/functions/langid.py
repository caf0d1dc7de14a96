"""Char-ngram Naive Bayes language identification over 24 languages.

From-scratch stand-in for the fastText lid.176 model CCNet-style
pipelines route on (Wenzek et al. 2020, §4.3: documents are binned by
detected language + confidence before LM filtering). The reference
repo delegates language handling upstream (its sources arrive
pre-identified), so this is part of the beyond-reference
training-data surface; the committed model is trained by
``scripts/train_langid_profiles.py`` from committed seed text only —
no external data, deterministic.

Model: multinomial NB over character 1-3 grams. The committed profile
stores raw per-language ngram counts; at load time they become a dense
``V×L`` log-probability matrix (Lidstone smoothing) plus a per-language
unseen-gram penalty, so scoring a document is: count its ngrams, one
vocab-dict lookup per distinct gram, one ``V_doc×L`` matmul — numpy
work, no per-gram Python in the per-language loop.

Scale shape: the profile matrix is ~10k×24 float32 (~1 MB) and ships
to executors as a broadcast-sized module global (lazy-loaded once per
Python worker, reused across Arrow batches). Scoring is in the pandas
UDF hot path — per *row* Python is bounded by ngram extraction
(linear in text length, capped via ``max_chars``).
"""

from __future__ import annotations

import json
import math
import os
from collections import Counter
from typing import Iterable

import numpy as np

_PROFILE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "langid_profiles.json",
)

# Lidstone smoothing constant: unseen ngrams get probability
# a / (total + a*V) — small enough that genuinely foreign text scores
# poorly everywhere, large enough that one unseen gram doesn't veto.
_ALPHA = 0.3

# Documents longer than this are identified from their head — language
# is redundant at document scale and this bounds per-row work.
MAX_CHARS = 4000

# below this per-ngram average log-margin over the runner-up the
# prediction is reported but flagged low-confidence by callers that
# threshold on lang_conf
_NGRAM_NS: tuple[int, ...] = (1, 2, 3)


def normalize(text: str) -> str:
    """Lowercase, keep letters, collapse everything else to single
    spaces, pad. MUST stay byte-identical to the trainer's version
    (scripts/train_langid_profiles.py imports the contract from here
    conceptually; both are pinned by the committed-profile test)."""
    out = []
    prev_space = True
    for ch in text.lower():
        if ch.isalpha():
            out.append(ch)
            prev_space = False
        elif not prev_space:
            out.append(" ")
            prev_space = True
    return " " + "".join(out).strip() + " "


def _ngram_counts(text: str) -> Counter:
    norm = normalize(text[:MAX_CHARS])
    c: Counter = Counter()
    for n in _NGRAM_NS:
        for i in range(len(norm) - n + 1):
            g = norm[i : i + n]
            if g.strip():
                c[g] += 1
    return c


class _Model:
    __slots__ = ("langs", "vocab", "logp", "unseen", "n_langs")

    def __init__(self, profile: dict):
        langs = sorted(profile["langs"])
        counts_by_lang = [profile["langs"][l]["counts"] for l in langs]
        vocab_set: set[str] = set()
        for counts in counts_by_lang:
            vocab_set.update(counts)
        vocab = {g: i for i, g in enumerate(sorted(vocab_set))}
        V = len(vocab)
        L = len(langs)
        logp = np.empty((V, L), dtype=np.float32)
        unseen = np.empty(L, dtype=np.float32)
        for j, counts in enumerate(counts_by_lang):
            total = profile["langs"][langs[j]]["total"]
            denom = total + _ALPHA * (V + 1)
            unseen[j] = math.log(_ALPHA / denom)
            col = np.full(V, unseen[j], dtype=np.float32)
            for g, c in counts.items():
                col[vocab[g]] = math.log((c + _ALPHA) / denom)
            logp[:, j] = col
        self.langs = langs
        self.vocab = vocab
        self.logp = logp
        self.unseen = unseen
        self.n_langs = L


_MODEL: _Model | None = None


def _model() -> _Model:
    global _MODEL
    if _MODEL is None:
        with open(_PROFILE_PATH, encoding="utf-8") as f:
            _MODEL = _Model(json.load(f))
    return _MODEL


def detect(text: str | None) -> tuple[str, float]:
    """Return ``(lang, confidence)``. ``('und', 0.0)`` for empty /
    letterless text. Confidence is the softmax weight of the winning
    language over per-ngram-normalized log-likelihoods — comparable
    across documents of different lengths."""
    if not text:
        return ("und", 0.0)
    counts = _ngram_counts(text)
    if not counts:
        return ("und", 0.0)
    m = _model()
    idx, cnt, n_unseen = [], [], 0
    for g, c in counts.items():
        i = m.vocab.get(g)
        if i is None:
            n_unseen += c
        else:
            idx.append(i)
            cnt.append(c)
    total = sum(cnt) + n_unseen
    if not idx:
        return ("und", 0.0)
    scores = m.unseen * float(n_unseen)
    scores = scores + np.asarray(cnt, dtype=np.float32) @ m.logp[idx]
    per_gram = scores / float(total)
    # softmax over length-normalized scores; temperature chosen so a
    # decisive margin (~0.5 nats/gram) saturates near 1.0
    z = (per_gram - per_gram.max()) / 0.05
    w = np.exp(z)
    w /= w.sum()
    best = int(np.argmax(w))
    return (m.langs[best], float(w[best]))


def detect_many(texts: Iterable[str | None]) -> list[tuple[str, float]]:
    return [detect(t) for t in texts]


def available_languages() -> list[str]:
    return list(_model().langs)
