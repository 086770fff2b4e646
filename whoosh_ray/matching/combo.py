"""Reference-layout alias: ``whoosh.matching.combo`` names
(reference matching/combo.py) live in the package root here."""

from whoosh_ray.matching import (  # noqa: F401
    ArrayUnionMatcher,
    CombinationMatcher,
    PreloadedUnionMatcher,
)
