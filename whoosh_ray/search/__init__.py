from whoosh_ray.search.query import (  # noqa: F401
    And,
    AndMaybe,
    AndNot,
    DisjunctionMax,
    Every,
    FuzzyTerm,
    Not,
    Or,
    Otherwise,
    Phrase,
    Prefix,
    Require,
    Term,
    TermRange,
    Variations,
    Wildcard,
)
from whoosh_ray.search.searcher import Searcher  # noqa: F401
