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
