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

import numpy as np


def levenshtein_batch(word: str, cands, maxdist: int, *,
                      damerau: bool = False,
                      chunk: int = 65536) -> np.ndarray:
    """Vectorized (Damerau-)Levenshtein of ``word`` against a whole
    lexicon at once — the numpy banded-DP the reference's automaton
    intersection amortizes (automata/lev.py:7-30, fsa.py:463-488).

    ``cands`` is a sequence of str or a numpy ``U``/``S`` array (the
    fixed-width term matrix).  Returns an int32 distance per candidate,
    with everything provably beyond ``maxdist`` (length delta) reported
    as ``maxdist + 1`` exactly like the scalar early exit.  The DP rows
    are vectors over the candidate axis: cost is O(len(word) x width)
    numpy ops instead of a Python loop per candidate, and candidates are
    length-filtered first so the width is capped at len(word)+maxdist."""
    arr = cands if isinstance(cands, np.ndarray) else None
    if arr is None or arr.dtype.kind not in "US":
        arr = np.array(list(cands), dtype="U")
    n = len(arr)
    out = np.full(n, maxdist + 1, dtype=np.int32)
    if n == 0:
        return out
    if arr.dtype.kind == "S" and not word.isascii():
        arr = arr.astype("U")  # byte-DP is char-DP only for ASCII words
    itemsize = arr.dtype.itemsize
    width = itemsize if arr.dtype.kind == "S" else itemsize // 4
    ct = np.uint8 if arr.dtype.kind == "S" else np.uint32
    M_all = arr.view(ct).reshape(n, width)
    lens_all = np.count_nonzero(M_all, axis=1).astype(np.int32)
    la = len(word)
    keep = np.abs(lens_all - la) <= maxdist
    if la == 0:
        out[keep] = lens_all[keep]
        return out
    wv = (np.frombuffer(word.encode("ascii"), dtype=np.uint8)
          if ct is np.uint8
          else np.frombuffer(word.encode("utf-32-le"), dtype=np.uint32))
    w_eff = min(width, la + maxdist)
    idx_all = np.nonzero(keep)[0]
    for c0 in range(0, len(idx_all), chunk):
        idx = idx_all[c0:c0 + chunk]
        M = M_all[idx, :w_eff]
        lens = lens_all[idx]
        m = len(idx)
        prev = np.tile(np.arange(w_eff + 1, dtype=np.int32), (m, 1))
        prev2 = None
        sentinel = np.int32(maxdist + 1)
        for i in range(1, la + 1):
            # banded columns: any cell with |i - j| > maxdist is > maxdist;
            # seeding it with the maxdist+1 sentinel is exact for every
            # decision <= maxdist (paths only add non-negative increments,
            # so sentinel-derived values can never drop back under it)
            jlo, jhi = max(1, i - maxdist), min(w_eff, i + maxdist)
            cur = np.full_like(prev, sentinel)
            if jlo == 1:
                cur[:, 0] = i
            cost = (M != wv[i - 1]).astype(np.int32)
            for j in range(jlo, jhi + 1):
                d = np.minimum(prev[:, j] + 1, prev[:, j - 1] + cost[:, j - 1])
                np.minimum(d, cur[:, j - 1] + 1, out=d)
                if damerau and i > 1 and j > 1:
                    t = ((M[:, j - 1] == wv[i - 2])
                         & (M[:, j - 2] == wv[i - 1]))
                    if t.any():
                        d = np.where(t, np.minimum(d, prev2[:, j - 2] + 1), d)
                cur[:, j] = d
            prev2, prev = prev, cur
            if i < la:
                # vectorized early exit: a candidate whose whole DP row
                # exceeds maxdist can never come back under it — compact
                # the active set (the scalar version's row_min bailout)
                alive = cur.min(axis=1) <= maxdist
                if not alive.all():
                    idx, M, lens = idx[alive], M[alive], lens[alive]
                    prev = prev[alive]
                    if prev2 is not None:
                        prev2 = prev2[alive]
                    if len(idx) == 0:
                        break
        if len(idx):
            out[idx] = np.minimum(
                prev[np.arange(len(idx)), np.minimum(lens, w_eff)],
                maxdist + 1)
    return out


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
    cands = ([c for c in candidates if c.startswith(word[:prefix])]
             if prefix else list(candidates))
    dists = levenshtein_batch(word, cands, maxdist, damerau=True)
    out = [(int(d), -(freq_of(c) if freq_of else 0), c)
           for c, d in zip(cands, dists)
           if d <= maxdist and c != word]
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
        # the reference's ascending-mxd loop scores each word by the
        # SMALLEST accepting bound = max(true distance, 1); a single
        # vectorized pass over the list computes the same scores
        pre = text[:prefix]
        words = ([w for w in self.wordlist if w.startswith(pre)]
                 if prefix else self.wordlist)
        dists = levenshtein_batch(text, words, maxdist)
        for w, d in zip(words, dists):
            if d <= maxdist:
                yield (0 - max(int(d), 1), w)


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
        s, fieldname = self.searcher, self.fieldname
        cands = (s.expand_prefix(fieldname, text[:prefix]) if prefix
                 else s.lexicon(fieldname))
        dists = levenshtein_batch(text, cands, maxdist)
        for w, d in zip(cands, dists):
            if d <= maxdist:
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


# ---- query correction objects (reference spelling.py:178-344) ----


class Correction:
    """The corrected form of a user query (reference spelling.py:
    178-240): ``query``/``string`` corrected, ``original_query``/
    ``original_string`` as given, ``tokens`` the corrected word tokens
    (with ``original`` text and original-string char spans).
    ``format_string(formatter)`` splices the corrections back into the
    original string via the formatter's replace mode."""

    def __init__(self, q, qstring, corr_q, tokens):
        self.original_query = q
        self.query = corr_q
        self.original_string = qstring
        self.tokens = tokens
        if self.original_string:
            from whoosh_ray.search.highlight import NullFormatter

            self.string = self.format_string(NullFormatter())
        else:
            self.string = ""

    def __repr__(self):
        return "%s(%r, %r)" % (self.__class__.__name__, self.query,
                               self.string)

    def format_string(self, formatter):
        if not self.original_string:
            return ""
        if isinstance(formatter, type):
            formatter = formatter()
        from whoosh_ray.search.highlight import Fragment

        fragment = Fragment(self.original_string, self.tokens, 0,
                            len(self.original_string))
        return formatter.format_fragment(fragment, replace=True)


class QueryCorrector:
    """Plug-point base (reference spelling.py:243-267)."""

    def __init__(self, fieldname):
        self.fieldname = fieldname

    def correct_query(self, q, qstring) -> Correction:
        raise NotImplementedError

    def field(self):
        return self.fieldname


class SimpleQueryCorrector(QueryCorrector):
    """Corrects the terms in ``terms`` using per-field ``correctors``,
    taking each word's FIRST suggestion (reference spelling.py:270-344).
    Token char spans come from the parsed query, so the corrected
    string splices exactly; tokens without spans correct the query but
    not the string."""

    def __init__(self, correctors, terms, aliases=None, prefix: int = 0,
                 maxdist: int = 2):
        self.correctors = correctors
        self.aliases = aliases or {}
        self.termset = frozenset(terms)
        self.prefix = prefix
        self.maxdist = maxdist

    def correct_query(self, q, qstring) -> Correction:
        correctors = self.correctors
        aliases = self.aliases
        termset = self.termset
        corrected_tokens = []
        corrected_q = q
        # Query.replace returns copies, so no deepcopy needed — but
        # token ORDER (position in the string) must be preserved for
        # the formatter, hence a list, not a set
        for token in q.all_tokens():
            fname = token.fieldname
            aname = aliases.get(fname, fname)
            if (fname, token.text) in termset:
                c = correctors[aname]
                sugs = c.suggest(token.text, prefix=self.prefix,
                                 maxdist=self.maxdist)
                if sugs:
                    sug = sugs[0]
                    corrected_q = corrected_q.replace(token.fieldname,
                                                      token.text, sug)
                    token.original = token.text
                    token.text = sug
                    corrected_tokens.append(token)
        return Correction(q, qstring, corrected_q, corrected_tokens)
