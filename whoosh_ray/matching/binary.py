"""Reference-layout alias: ``whoosh.matching.binary`` names
(reference matching/binary.py) live in the package root here."""

from whoosh_ray.matching import (  # noqa: F401
    AdditiveBiMatcher,
    AndMaybeMatcher,
    AndNotMatcher,
    BiMatcher,
    DisjunctionMaxMatcher,
    IntersectionMatcher,
    RequireMatcher,
    UnionMatcher,
)
