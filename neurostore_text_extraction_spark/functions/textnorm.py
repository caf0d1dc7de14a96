"""Text post-processing functions (F1–F4 in SURVEY.md §2.7).

Behavioral parity targets (re-specified from scratch, verified against
the reference's test vectors in ``tests/test_normalize.py:53-199``):

- :func:`normalize_string` ≙ ``ns_extract/pipelines/normalize.py:8-28``
  — ``string.capwords`` semantics (split on whitespace, capitalize each
  word, join with single spaces — note this *collapses* inner runs of
  whitespace and lowercases all but the first letter), curly-apostrophe
  fold, sentinel-to-null.
- :func:`extract_abbreviations` ≙ ``normalize.py:31-97`` — the
  reference delegates to scispacy's AbbreviationDetector; that detector
  implements the published Schwartz–Hearst algorithm (Schwartz &
  Hearst, PSB 2003), which we implement directly — deterministic and
  dependency-free.
- :func:`resolve_abbreviations` ≙ ``normalize.py:100-144`` — replace
  every occurrence of each unique short form with its long form
  (first-listed long form wins per short form).
- :func:`find_and_remove_definitions` ≙ ``normalize.py:147-193`` —
  drop standalone parenthetical tokens ``(ABC)`` when ABC is a known
  abbreviation or the acronym of the initials of the preceding
  ``len(ABC)`` words.

All functions are pure; Spark exposure is through
``operators/postprocess.py`` pandas UDFs (Arrow-batched).
"""

from __future__ import annotations


_NULL_SENTINELS = frozenset({"", "None", "Nan", "N/a", "Null"})


def capwords(s: str) -> str:
    """``string.capwords`` semantics without importing string."""
    return " ".join(w.capitalize() for w in s.split())


def normalize_string(s: str | None) -> str | None:
    if s is None:
        return None
    clean = capwords(s.strip()).replace("’", "'")
    if clean in _NULL_SENTINELS:
        return None
    return clean


# --- Schwartz–Hearst abbreviation detection -------------------------------

_MAX_SF_LEN = 10
_MIN_SF_LEN = 2


def _valid_short_form(sf: str) -> bool:
    if not (_MIN_SF_LEN <= len(sf) <= _MAX_SF_LEN):
        return False
    if len(sf.split()) > 2:
        return False
    if not any(c.isalpha() for c in sf):
        return False
    if not (sf[0].isalnum() or sf[0] == "("):
        return False
    return True


def _best_long_form(sf: str, lf: str) -> str | None:
    """Schwartz–Hearst right-to-left character match of the short form
    against the candidate long form; the short form's first character
    must begin a word of the long form."""
    i = len(sf) - 1
    j = len(lf) - 1
    while i >= 0:
        c = sf[i].lower()
        if not c.isalnum():
            i -= 1
            continue
        while (j >= 0 and lf[j].lower() != c) or (
            i == 0 and j > 0 and lf[j - 1].isalnum()
        ):
            j -= 1
        if j < 0:
            return None
        i -= 1
        j -= 1
    start = lf.rfind(" ", 0, j + 1) + 1
    return lf[start:]


def extract_abbreviations(text: str) -> list[dict]:
    """Find (short form, long form) definitions of the shape
    ``long form (SF)``. Returns dicts with the same keys the reference
    exposes (``short_text/short_start/short_end/long_text/long_start/
    long_end``, ``normalize.py:75-92``)."""
    results: list[dict] = []
    if not text:
        return results
    n = len(text)
    i = 0
    while i < n:
        if text[i] != "(":
            i += 1
            continue
        # find the matching close paren (allow one nesting level)
        depth = 1
        j = i + 1
        while j < n and depth:
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
            j += 1
        if depth:  # unbalanced
            break
        sf = text[i + 1 : j - 1].strip()
        # inner nesting: take the part before any inner paren
        if "(" in sf:
            sf = sf.split("(", 1)[0].strip()
        if not _valid_short_form(sf):
            i = j
            continue
        # candidate long form: up to min(|sf|+5, |sf|*2) words before '('
        prefix = text[:i].rstrip()
        words = prefix.split()
        max_words = min(len(sf) + 5, len(sf) * 2)
        cand_words = words[-max_words:] if max_words else []
        # stop the candidate at sentence boundaries
        for b in range(len(cand_words) - 1, 0, -1):
            if cand_words[b - 1].endswith((".", ";", "!", "?")):
                cand_words = cand_words[b:]
                break
        cand = " ".join(cand_words)
        lf = _best_long_form(sf, cand) if cand else None
        if lf and lf.lower() != sf.lower() and len(lf) > len(sf):
            long_start = prefix.rfind(lf)
            results.append(
                {
                    "short_text": sf,
                    "short_start": i + 1,
                    "short_end": i + 1 + len(sf),
                    "long_text": lf,
                    "long_start": long_start,
                    "long_end": long_start + len(lf),
                }
            )
        i = j
    return results


def resolve_abbreviations(target: str | None, abbreviations: list[dict]) -> str | None:
    """Expand each unique short form appearing in ``target`` to its
    (first-listed) long form — every occurrence, like the reference's
    ``str.replace`` loop."""
    if not target or not abbreviations:
        return target
    done: set[str] = set()
    out = target
    for ab in abbreviations:
        sf = ab["short_text"]
        if sf in done or sf not in target:
            continue
        out = out.replace(sf, ab["long_text"])
        done.add(sf)
    return out


def find_and_remove_definitions(s: str | None, abbreviations: list[dict]) -> str:
    """Drop whitespace-delimited tokens of the exact shape ``(ABC)``
    when ABC is a known short form, is empty, or acronymizes the
    initials of the preceding ``len(ABC)`` words."""
    if s is None:
        return ""
    known = {ab["short_text"] for ab in abbreviations}
    words = s.split()
    kept: list[str] = []
    for idx, word in enumerate(words):
        drop = False
        if word.startswith("(") and word.endswith(")"):
            clause = word[1:-1]
            if clause in known:
                drop = True
            elif idx >= len(clause):
                if not clause:
                    drop = True
                else:
                    initials = "".join(w[0] for w in words[idx - len(clause) : idx])
                    if initials.lower() == clause.lower():
                        drop = True
        if not drop:
            kept.append(word)
    return " ".join(kept)
