"""Drop-in query surface: ``from whoosh_ray.query import Term, And, Or``
ports reference ``whoosh.query`` imports unchanged, and the package
mirrors the reference submodule split (reference query/__init__.py
star-imports qcore + terms + compound + positional + ranges + wrappers
+ nested + qcolumns + spans; the engine classes live in
whoosh_ray.search.query / search.spans / search.nested)."""

from whoosh_ray.query.qcore import (  # noqa: F401
    Every,
    Highest,
    Lowest,
    NullQuery,
    Query,
    QueryError,
    _NullQuery,
    error_query,
    token_lists,
)
from whoosh_ray.query.terms import (  # noqa: F401
    ExpandingTerm,
    FuzzyTerm,
    MultiTerm,
    PatternQuery,
    Prefix,
    Regex,
    Term,
    Variations,
    Wildcard,
)
from whoosh_ray.query.compound import (  # noqa: F401
    And,
    AndMaybe,
    AndNot,
    BinaryQuery,
    BooleanQuery,
    CompoundQuery,
    DefaultOr,
    DisjunctionMax,
    Or,
    Otherwise,
    PreloadedOr,
    Require,
    SplitOr,
)
from whoosh_ray.query.positional import (  # noqa: F401
    Ordered,
    Phrase,
    Sequence,
)
from whoosh_ray.query.ranges import (  # noqa: F401
    DateRange,
    NumericRange,
    RangeMixin,
    TermRange,
)
from whoosh_ray.query.wrappers import (  # noqa: F401
    ConstantScoreQuery,
    Not,
    WeightingQuery,
    WrappingQuery,
)
from whoosh_ray.query.nested import (  # noqa: F401
    NestedChildren,
    NestedParent,
)
from whoosh_ray.query.qcolumns import ColumnQuery  # noqa: F401
from whoosh_ray.query.spans import (  # noqa: F401
    Span,
    SpanBefore,
    SpanCondition,
    SpanContains,
    SpanFirst,
    SpanNear,
    SpanNear2,
    SpanNot,
    SpanOr,
    SpanQuery,
    WrappingSpan,
    bisect_spans,
)

from whoosh_ray.search.query import TermNotFound  # noqa: F401

# reference whoosh.query module-level re-exports
from whoosh_ray.fields import datetime_to_long, long_to_datetime  # noqa: F401
from whoosh_ray.functions.morph_en import variations  # noqa: F401
