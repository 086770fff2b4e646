"""Reference-layout alias: ``whoosh.matching.wrappers`` names
(reference matching/wrappers.py) live in the package root here."""

from whoosh_ray.matching import (  # noqa: F401
    ConstantScoreWrapperMatcher,
    CoordMatcher,
    ExcludeMatcher,
    FilterMatcher,
    InverseMatcher,
    MultiMatcher,
    SingleTermMatcher,
    WrappingMatcher,
)

from whoosh_ray.matching import RequireMatcher  # noqa: E402,F401
