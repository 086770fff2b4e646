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


# ---- Corrector objects (reference spelling.py:41-177) ----

class Corrector:
    """Base corrector: rank ``_suggestions`` (score, word) items with
    the reference's exact heap semantics — keep the ``limit`` LARGEST
    (score, word) tuples (score ties keep the alphabetically-last
    words), then present sorted by (-score, word)."""

    def suggest(self, text: str, limit: int = 5, maxdist: int = 2,
                prefix: int = 0) -> list[str]:
        from heapq import nlargest

        best = nlargest(limit, self._suggestions(text, maxdist, prefix))
        best.sort(key=lambda x: (0 - x[0], x[1]))
        return [sug for _, sug in best]

    def _suggestions(self, text, maxdist, prefix):
        raise NotImplementedError


class ListCorrector(Corrector):
    """Corrections from a sorted word list (reference spelling.py:
    118-152): every word within plain-Levenshtein ``maxdist`` sharing
    the ``prefix``, scored by the SMALLEST accepting distance.
    DOCUMENTED DIVERGENCE: the reference's sorted-list skipper starts
    each miss-bisect one past its cursor, silently dropping boundary
    words (e.g. the list's first word can never match after the DFA's
    \\x00-prefixed first probe) — this implementation returns the full
    acceptance set the automaton defines."""

    def __init__(self, wordlist):
        self.wordlist = wordlist

    def _suggestions(self, text, maxdist, prefix):
        pre = text[:prefix]
        seen = set()
        for mxd in range(1, maxdist + 1):
            for w in self.wordlist:
                if w in seen or (prefix and not w.startswith(pre)):
                    continue
                if levenshtein(text, w, mxd) <= mxd:
                    seen.add(w)
                    yield (0 - mxd, w)


class ReaderCorrector(Corrector):
    """Corrections from an indexed field (reference spelling.py:90-117)
    — delegates to the Searcher's suggest machinery, which carries the
    pinned frequency-only ranking quirk."""

    def __init__(self, searcher, fieldname: str):
        self.searcher = searcher
        self.fieldname = fieldname

    def suggest(self, text: str, limit: int = 5, maxdist: int = 2,
                prefix: int = 0) -> list[str]:
        return self.searcher.suggest(self.fieldname, text, limit=limit,
                                     maxdist=maxdist, prefix=prefix)

    def _suggestions(self, text, maxdist, prefix):
        from whoosh_ray.functions.spelling import levenshtein as _lev

        s, fieldname = self.searcher, self.fieldname
        cands = (s.expand_prefix(fieldname, text[:prefix]) if prefix
                 else s.lexicon(fieldname))
        for w in cands:
            if _lev(text, w, maxdist) <= maxdist:
                f = s.frequency(fieldname, w) or 1
                yield (0 - (maxdist + (1.0 / f * 0.5)), w)


class MultiCorrector(Corrector):
    """Op-merge of sub-correctors' scores (reference spelling.py:
    155-176).  The reference is BROKEN AS SHIPPED: its _suggestions
    returns (word, score) pairs into a pipeline expecting
    (score, word), so suggest() raises TypeError on any non-empty
    result — pinned in tests; the op-merge intent is implemented."""

    def __init__(self, correctors, op=max):
        self.correctors = correctors
        self.op = op

    def _suggestions(self, text, maxdist, prefix):
        seen: dict = {}
        for corr in self.correctors:
            for score, sug in corr._suggestions(text, maxdist, prefix):
                seen[sug] = (self.op(seen[sug], score) if sug in seen
                             else score)
        return ((score, sug) for sug, score in seen.items())
