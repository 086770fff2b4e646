"""Reference-layout submodule: ``whoosh.query.terms`` names
(reference query/terms.py).  The engine's _MultiTerm plays the
MultiTerm / PatternQuery / ExpandingTerm lexicon-expansion base roles
(the reference splits them only to share matcher plumbing)."""

from whoosh_ray.search.query import (  # noqa: F401
    FuzzyTerm,
    Prefix,
    Regex,
    Term,
    Variations,
    Wildcard,
)
from whoosh_ray.search.query import _MultiTerm as MultiTerm  # noqa: F401

ExpandingTerm = MultiTerm
PatternQuery = MultiTerm
