"""Drop-in query surface: ``from whoosh_ray.query import Term, And, Or``
ports reference ``whoosh.query`` imports unchanged (reference
query/__init__.py re-exports qcore + terms + compound + ranges +
positional + spans + nested + wrappers; the engine classes live in
whoosh_ray.search.query / search.spans / search.nested)."""

from whoosh_ray.search.nested import (  # noqa: F401
    NestedChildren,
    NestedParent,
)
from whoosh_ray.search.query import (  # noqa: F401
    And,
    AndMaybe,
    AndNot,
    ColumnQuery,
    DateRange,
    DisjunctionMax,
    Every,
    FuzzyTerm,
    Not,
    NullQuery,
    NumericRange,
    Or,
    Ordered,
    Otherwise,
    Phrase,
    Prefix,
    Query,
    QueryError,
    Regex,
    Require,
    Sequence,
    Term,
    TermNotFound,
    TermRange,
    Variations,
    Wildcard,
    WrappingQuery,
    _NullQuery,
)
from whoosh_ray.search.spans import (  # noqa: F401
    SpanBefore,
    SpanCondition,
    SpanContains,
    SpanFirst,
    SpanNear,
    SpanNear2,
    SpanNot,
    SpanOr,
)

# base-class aliases for ported isinstance checks / subclass walks:
# the engine's _Compound plays CompoundQuery's role, _MultiTerm covers
# the reference's MultiTerm / ExpandingTerm / PatternQuery lexicon-
# expansion bases (qcore.py/terms.py class split)
from whoosh_ray.search.query import _Compound as CompoundQuery  # noqa: E402,F401
from whoosh_ray.search.query import _MultiTerm as MultiTerm  # noqa: E402,F401

ExpandingTerm = MultiTerm
PatternQuery = MultiTerm

# reference whoosh.query module-level re-exports
from whoosh_ray.fields import datetime_to_long, long_to_datetime  # noqa: E402,F401
from whoosh_ray.functions.morph_en import variations  # noqa: E402,F401
