"""Group classes from the reference qparser/syntax.py:395-446.

The reference's syntax tree (SyntaxNode/GroupNode/WordNode...) is
internal tagger machinery; the user-visible part of this module is the
family of group classes passed as ``QueryParser(group=...)``.  They are
markers carrying ``_wr_group``, which the engine parser normalizes
(search/qparser.py:_norm_group).  ``AndNotGroup`` / ``AndMaybeGroup`` /
``RequireGroup`` / ``NotGroup`` exist for completeness but are not
meaningful as a whitespace join (binary/wrapper groups — the reference
itself only produces them from operator plugins); passing one as
``group=`` raises TypeError with guidance.
"""

from __future__ import annotations


class AndGroup:
    """Whitespace joins clauses with And (the default; syntax.py:406)."""
    _wr_group = "and"


class OrGroup:
    """Whitespace joins clauses with Or; ``factory(scale)`` adds the
    coordination bonus (syntax.py:410-422 -> Or(scale=))."""
    _wr_group = "or"

    @classmethod
    def factory(cls, scale: float = 1.0):
        class ScaledOrGroup(OrGroup):
            _wr_group = ("or", scale)
        return ScaledOrGroup


class DisMaxGroup:
    """Whitespace joins clauses with DisjunctionMax (syntax.py:424)."""
    _wr_group = "dismax"


class OrderedGroup:
    """Whitespace joins clauses with Ordered (syntax.py:428)."""
    _wr_group = "ordered"


class AndNotGroup:
    """Binary group built by the ANDNOT operator (syntax.py:432); not a
    whitespace join."""


class AndMaybeGroup:
    """Binary group built by the ANDMAYBE operator (syntax.py:436); not
    a whitespace join."""


class RequireGroup:
    """Binary group built by the REQUIRE operator (syntax.py:440); not
    a whitespace join."""


class NotGroup:
    """Wrapper group built by the NOT operator (syntax.py:444); not a
    whitespace join."""
