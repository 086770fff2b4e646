"""Reference-layout submodule: ``whoosh.query.positional`` names
(reference query/positional.py)."""

from whoosh_ray.search.query import (  # noqa: F401
    Ordered,
    Phrase,
    Sequence,
)
