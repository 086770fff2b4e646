"""Reference-layout alias: ``whoosh.matching.mcore`` names
(reference matching/mcore.py) live in the package root here."""

from whoosh_ray.matching import (  # noqa: F401
    ConstantScoreMatcher,
    LeafMatcher,
    ListMatcher,
    Matcher,
    NoQualityAvailable,
    NullMatcher,
    NullMatcherClass,
    ReadTooFar,
)
