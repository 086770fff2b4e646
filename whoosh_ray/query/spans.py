"""Reference-layout submodule: ``whoosh.query.spans`` names
(reference query/spans.py).  Span matcher classes
(SpanWrappingMatcher/SpanBiMatcher) are pull-iterator internals the
vectorized span algebra replaces (search/spans.py doc_spans)."""

from whoosh_ray.search.spans import (  # noqa: F401
    Span,
    SpanBefore,
    SpanCondition,
    SpanContains,
    SpanFirst,
    SpanNear,
    SpanNear2,
    SpanNot,
    SpanOr,
    bisect_spans,
)
from whoosh_ray.search.spans import _SpanQuery as SpanQuery  # noqa: F401

#: reference WrappingSpan is the shared base of SpanFirst/SpanNot/...
#: — same role as the engine's _SpanQuery base
WrappingSpan = SpanQuery

#: reference query/spans.py re-exports these for span-tree construction
from whoosh_ray.search.query import (  # noqa: E402,F401
    And,
    AndMaybe,
    Or,
    Query,
    Term,
)
from whoosh_ray.util import make_binary_tree  # noqa: E402,F401
