"""Edit-distance functions (drop-in for reference
support/levenshtein.py:8-71), delegating to the engine's scalar DPs in
:mod:`whoosh_ray.functions.spelling` (whose acceptance sets are
fuzz-pinned against the reference automata).  The reference's ``limit``
is a soft bailout — once exceeded it returns ``limit + 1`` — which is
exactly our ``maxdist`` contract."""

from __future__ import annotations

from whoosh_ray.functions.spelling import damerau_levenshtein as _dl
from whoosh_ray.functions.spelling import levenshtein as _l


def levenshtein(seq1: str, seq2: str, limit: int | None = None) -> int:
    return _l(seq1, seq2, maxdist=limit)


def damerau_levenshtein(seq1: str, seq2: str, limit: int | None = None) -> int:
    return _dl(seq1, seq2, maxdist=limit)


distance = damerau_levenshtein


def relative(a: str, b: str) -> float:
    """Relative similarity in [0, 1], 1 = equal
    (reference levenshtein.py:58-68)."""
    d = distance(a, b)
    longer = float(max(len(a), len(b)))
    shorter = float(min(len(a), len(b)))
    return ((longer - d) / longer) * (shorter / longer)
