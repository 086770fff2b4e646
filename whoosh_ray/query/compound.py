"""Reference-layout submodule: ``whoosh.query.compound`` names
(reference query/compound.py).

The reference's DefaultOr / SplitOr / PreloadedOr subclasses differ
from Or ONLY in matcher strategy (UnionMatcher tree vs small/big split
vs preloaded array union — compound.py:371-449); the documents and
scores they produce are identical.  Here the engine always evaluates
Or vectorized, so they are behavioral synonyms kept as distinct
classes for isinstance checks and structural equality (a DefaultOr
never equals an Or, same as the reference)."""

from __future__ import annotations

from abc import ABC

from whoosh_ray.search.query import (  # noqa: F401
    And,
    AndMaybe,
    AndNot,
    DisjunctionMax,
    Or,
    Otherwise,
    Require,
)
from whoosh_ray.search.query import _Compound as CompoundQuery  # noqa: F401


class DefaultOr(Or):
    JOINT = " dOR "


class SplitOr(Or):
    JOINT = " sOr "
    SPLIT_DOC_LIMIT = 8000


class PreloadedOr(Or):
    JOINT = " pOR "


class BinaryQuery(ABC):
    """Virtual base of the two-subquery combinators (reference
    compound.py:493-543).  The engine's AndNot/Otherwise/Require/
    AndMaybe subclass Query directly (each carries its own quirk
    evaluation), so this is an ABC they are *registered* on —
    ``isinstance(q, BinaryQuery)`` works for ported code."""


BinaryQuery.register(AndNot)
BinaryQuery.register(Otherwise)
BinaryQuery.register(Require)
BinaryQuery.register(AndMaybe)


def BooleanQuery(required, should, prohibited):
    """required AND (maybe should) NOT prohibited (reference
    compound.py:655-657)."""
    return AndNot(AndMaybe(And(required), Or(should)),
                  Or(prohibited)).normalize()
