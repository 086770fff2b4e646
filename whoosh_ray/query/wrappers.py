"""Reference-layout submodule: ``whoosh.query.wrappers`` names
(reference query/wrappers.py)."""

from whoosh_ray.search.query import (  # noqa: F401
    ConstantScoreQuery,
    Not,
    WeightingQuery,
    WrappingQuery,
)
