"""From-scratch deterministic byte-level BPE tokenizer (Sennrich et
al. 2016 "Neural Machine Translation of Rare Words with Subword
Units"; byte-level base alphabet per GPT-2, Radford et al. 2019).

Why it exists (VERDICT r3 "What's missing #3"): sequence packing and
chunking budgeted by the sklearn-ish word tokenizer, but real
pretraining packs by BPE tokens — counts diverge 30-60% on web text.
tiktoken is env-barred, so this is a self-contained reimplementation:
train on any corpus sample, commit the merges table, and count/encode
deterministically forever after.

Design:

- **Base alphabet = the 256 bytes.** Any UTF-8 string encodes without
  an OOV concept (GPT-2's key property). Symbols are ``bytes``
  objects; a token is a byte sequence produced by merges.
- **Pre-tokenization** approximates GPT-2's regex with stdlib ``re``
  (no ``\\p`` classes): leading-space word runs ``' ?[A-Za-z]+'``,
  number runs, and non-space symbol runs. Deterministic, and the
  leading-space convention means word boundaries survive in the
  tokens themselves.
- **Training** (:func:`train_bpe`): classic count-and-merge over the
  pre-token frequency table. Ties on pair frequency break
  lexicographically on the pair bytes — fully deterministic, no dict
  iteration order dependence.
- **Encoding** (:class:`BPE.encode`): standard lowest-rank-first
  merging, memoized per distinct pre-token (web text repeats words;
  the cache turns per-word cost amortized-O(1)).

Scale shape: training runs DRIVER-SIDE on a corpus *sample* (the
merges table is the model — like the LM count tables, vocabulary-
sized, not corpus-sized); counting/encoding runs inside Arrow-batched
pandas UDFs (:func:`bpe_count_udf`) — the same mapInPandas hot path
as extraction, never row-at-a-time Python.
"""

from __future__ import annotations

import re
from functools import lru_cache

# GPT-2-ish pre-tokenizer on stdlib re: optional leading space +
# letter run | digit run | non-space-non-alnum run | space run that
# precedes nothing (trailing spaces).
_PRETOK = re.compile(
    r" ?[A-Za-zÀ-ɏ]+| ?[0-9]+| ?[^\sA-Za-z0-9À-ɏ]+|\s+(?!\S)|\s+"
)


def pretokenize(text: str) -> list[str]:
    return _PRETOK.findall(text)


def _word_symbols(word: str) -> tuple[bytes, ...]:
    bs = word.encode("utf-8")
    return tuple(bytes([b]) for b in bs)


def train_bpe(texts, n_merges: int = 2000) -> list[tuple[bytes, bytes]]:
    """Learn ``n_merges`` merges from an iterable of strings.

    Deterministic: pair selection is (max count, then lexicographically
    smallest pair). Runs driver-side over a corpus SAMPLE — the merges
    table is the model artifact (committed to the repo like the LM
    count tables), training never touches the full corpus.

    Incremental implementation (subword-nmt-style, Sennrich 2016
    ``learn_bpe.py``'s big-corpus path): pair counts are maintained
    under each merge by re-counting ONLY the words that contain the
    merged pair (an inverted pair→words index), and the argmax is a
    lazy max-heap keyed ``(-count, pair)`` — stale entries are popped
    and dropped when their recorded count no longer matches. Output is
    byte-identical to the naive rescan-everything loop (same counts,
    same tie-break) at O(affected words) per merge instead of
    O(vocabulary); 16k merges train in seconds, not hours."""
    import heapq
    from collections import Counter

    word_counts: Counter = Counter()
    for t in texts:
        if not t:
            continue
        word_counts.update(pretokenize(t))
    # one entry per distinct pre-token; duplicates fold into counts
    syms: list[list[bytes]] = []
    counts: list[int] = []
    seen: dict[tuple[bytes, ...], int] = {}
    for w, c in word_counts.items():
        sym = _word_symbols(w)
        if not sym:
            continue
        idx = seen.get(sym)
        if idx is None:
            seen[sym] = len(syms)
            syms.append(list(sym))
            counts.append(c)
        else:
            counts[idx] += c
    del seen

    pair_counts: dict[tuple[bytes, bytes], int] = {}
    pair_where: dict[tuple[bytes, bytes], set[int]] = {}
    for idx, sym in enumerate(syms):
        c = counts[idx]
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_where.setdefault(p, set()).add(idx)

    heap: list[tuple[int, tuple[bytes, bytes]]] = [
        (-c, p) for p, c in pair_counts.items()
    ]
    heapq.heapify(heap)

    def push(p: tuple[bytes, bytes]) -> None:
        heapq.heappush(heap, (-pair_counts[p], p))

    merges: list[tuple[bytes, bytes]] = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if -negc != cur or cur == 0:
            continue  # stale heap entry
        if cur < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        touched: set[tuple[bytes, bytes]] = set()
        for idx in list(pair_where.get(best, ())):
            sym = syms[idx]
            c = counts[idx]
            # retract this word's old pair contributions
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                n = pair_counts[p] - c
                if n:
                    pair_counts[p] = n
                else:
                    del pair_counts[p]
                w = pair_where.get(p)
                if w is not None:
                    w.discard(idx)
                touched.add(p)
            # apply the merge left-to-right (same as encode)
            out: list[bytes] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            syms[idx] = out
            # add the new contributions
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_where.setdefault(p, set()).add(idx)
                touched.add(p)
        pair_where.pop(best, None)
        for p in touched:
            if p in pair_counts:
                push(p)
    return merges


def dump_merges(merges: list[tuple[bytes, bytes]]) -> str:
    """Serialize merges as hex pairs, one per line (byte-exact,
    encoding-agnostic — safe to commit)."""
    return "\n".join(f"{a.hex()} {b.hex()}" for a, b in merges)


def load_merges(text: str) -> list[tuple[bytes, bytes]]:
    out = []
    for line in text.strip().splitlines():
        if not line.strip() or line.startswith("#"):
            continue
        a, b = line.split()
        out.append((bytes.fromhex(a), bytes.fromhex(b)))
    return out


class BPE:
    """Encoder over a fixed merges table. Token ids: 0-255 are the
    bytes; merge i yields id 256+i."""

    def __init__(self, merges: list[tuple[bytes, bytes]]) -> None:
        self.merges = merges
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.vocab: dict[bytes, int] = {bytes([i]): i for i in range(256)}
        for i, (a, b) in enumerate(merges):
            self.vocab[a + b] = 256 + i
        # per-instance memo keyed by pre-token (web text repeats
        # words; amortizes encode to a dict hit per word)
        self._encode_word = lru_cache(maxsize=65536)(self._encode_word_uncached)

    def _encode_word_uncached(self, word: str) -> tuple[int, ...]:
        sym = list(_word_symbols(word))
        if not sym:
            return ()
        ranks = self.ranks
        while len(sym) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            a, b = sym[best_i], sym[best_i + 1]
            merged = a + b
            # merge ALL occurrences of this pair (left-to-right)
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return tuple(self.vocab[s] for s in sym)

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for w in pretokenize(text):
            ids.extend(self._encode_word(w))
        return ids

    def count(self, text: str) -> int:
        n = 0
        for w in pretokenize(text):
            n += len(self._encode_word(w))
        return n

    def decode(self, ids: list[int]) -> str:
        inv = {v: k for k, v in self.vocab.items()}
        return b"".join(inv[i] for i in ids).decode("utf-8", "replace")


_DEFAULT: BPE | None = None


def default_bpe() -> BPE:
    """The committed repo tokenizer: merges trained deterministically
    on the synthetic sf0.001 documents corpus
    (``scripts/train_bpe_merges.py``; table at
    ``resources/bpe_merges.txt``)."""
    global _DEFAULT
    if _DEFAULT is None:
        import importlib.resources as ir

        text = (
            ir.files("neurostore_text_extraction_spark.resources")
            .joinpath("bpe_merges.txt")
            .read_text()
        )
        _DEFAULT = BPE(load_merges(text))
    return _DEFAULT


def bpe_count_udf():
    """Arrow-batched pandas UDF: text → BPE token count (long).
    Workers each build the encoder once from the committed merges
    (module-level memo) and share the per-word cache across batches."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _count(texts):
        enc = default_bpe()
        return texts.map(lambda t: enc.count(t) if isinstance(t, str) else 0)

    # annotations set as real objects (not strings): this module uses
    # postponed annotations, under which pyspark's hint inference
    # cannot resolve 'pd.Series' written inline
    _count.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_count, "long")
