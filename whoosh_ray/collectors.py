"""Drop-in collectors surface (reference whoosh/collectors.py names
that have engine counterparts).  The engine's collectors are vectorized
per-segment reducers: Collector + search_with_collector cover the
custom-collector plug point; the reference's internal wrapper classes
(Scored/Unsorted/Wrapping/...Collector) are that design's iterator
machinery and intentionally have no counterpart (semantics covered by
the Searcher.search keyword surface — see COVERAGE.md)."""

from whoosh_ray.search.searcher import (  # noqa: F401
    Collector,
    TimeLimit,
    TimeLimitCollector,
)

#: reference collectors.py:699 alias
TimeExceeded = TimeLimit
