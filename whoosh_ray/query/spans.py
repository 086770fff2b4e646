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
