"""Drop-in searching surface (reference whoosh/searching.py names):
Searcher / Results / Hit / ResultsPage / Collector / SearchContext /
TimeLimit live in whoosh_ray.search.searcher."""

from whoosh_ray.search.searcher import (  # noqa: F401
    Collector,
    Hit,
    Results,
    ResultsPage,
    SearchContext,
    Searcher,
    TimeLimit,
    TimeLimitCollector,
)
from whoosh_ray.search.query import TermNotFound  # noqa: F401

#: reference searching.py:49-52 — raised when term data was not
#: recorded for a search (search(terms=True) not requested)
class NoTermsException(Exception):
    message = "Results were created without recording terms"

# reference searching.py imports these for filter/mask coercion
from whoosh_ray.functions.idsets import BitIdSet as BitSet  # noqa: E402,F401
from whoosh_ray.functions.idsets import DocIdSet  # noqa: E402,F401
