"""Bounded Damerau-Levenshtein distance (fuzzy matching / suggestions).

The reference computes "terms within edit distance k" with a Levenshtein
automaton intersected against the sorted term dictionary
(/root/reference/src/whoosh/automata/lev.py:7-30, fsa.py:463-488,
reading.py:522-568).  Candidate sets here are pre-pruned by the shared
prefix (FuzzyTerm.prefixlength) from the sorted lexicon, so a banded DP
with early exit over the slice yields the same result set at comparable
cost for realistic vocabularies.
"""

from __future__ import annotations


def damerau_levenshtein(a: str, b: str, maxdist: int | None = None) -> int:
    """Restricted Damerau-Levenshtein (adjacent transposition) distance.

    With ``maxdist`` the computation exits early returning ``maxdist + 1``
    once no band entry can stay within the bound."""
    la, lb = len(a), len(b)
    if maxdist is not None and abs(la - lb) > maxdist:
        return maxdist + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        row_min = i
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (prev2 is not None and i > 1 and j > 1
                    and ca == b[j - 2] and a[i - 2] == b[j - 1]):
                d = min(d, prev2[j - 2] + 1)
            cur[j] = d
            if d < row_min:
                row_min = d
        if maxdist is not None and row_min > maxdist:
            return maxdist + 1
        prev2, prev = prev, cur
    return prev[lb]


def levenshtein(a: str, b: str, maxdist: int | None = None) -> int:
    """Plain Levenshtein (no transpositions) with early exit — matches the
    reference's levenshtein_automaton acceptance set (automata/lev.py:7-30),
    which FuzzyTerm / terms_within / suggest are built on."""
    la, lb = len(a), len(b)
    if maxdist is not None and abs(la - lb) > maxdist:
        return maxdist + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        row_min = i
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            cur[j] = d
            if d < row_min:
                row_min = d
        if maxdist is not None and row_min > maxdist:
            return maxdist + 1
        prev = cur
    return prev[lb]


def suggestions(word: str, candidates: list[str], *, maxdist: int = 2,
                prefix: int = 0, freq_of=None, limit: int = 5) -> list[str]:
    """Rank candidate corrections by (distance, -frequency, word) — the
    reference's suggest ordering (spelling.py:41-117)."""
    out = []
    for c in candidates:
        if prefix and not c.startswith(word[:prefix]):
            continue
        d = damerau_levenshtein(word, c, maxdist)
        if d <= maxdist and c != word:
            f = freq_of(c) if freq_of else 0
            out.append((d, -f, c))
    out.sort()
    return [c for _, _, c in out[:limit]]
