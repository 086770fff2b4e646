"""Reference-layout submodule: ``whoosh.query.nested`` names
(reference query/nested.py)."""

from whoosh_ray.search.nested import (  # noqa: F401
    NestedChildren,
    NestedParent,
)
