"""Reference-layout submodule: ``whoosh.query.ranges`` names
(reference query/ranges.py).  RangeMixin is the shared-behavior mixin
in the reference (ranges.py:35-131); the engine classes implement the
same surface directly, so it is a registration ABC here."""

from __future__ import annotations

from abc import ABC

from whoosh_ray.search.query import (  # noqa: F401
    DateRange,
    NumericRange,
    TermRange,
)


class RangeMixin(ABC):
    """Virtual base: ``isinstance(q, RangeMixin)`` is True for the
    engine's range queries (all of which answer ``is_range()``)."""


RangeMixin.register(TermRange)
RangeMixin.register(NumericRange)  # DateRange subclasses NumericRange
