"""Reference-layout submodule: ``whoosh.query.qcolumns`` names
(reference query/qcolumns.py).  The reference's ColumnMatcher is the
iterator that applies the condition row by row — the engine evaluates
ColumnQuery vectorized over the stored column, so there is no matcher
class to expose (same policy as the other internal matcher names;
see COVERAGE.md)."""

from whoosh_ray.search.query import ColumnQuery  # noqa: F401
