"""Reference-layout submodule: ``whoosh.query.qcore`` names
(reference query/qcore.py).  The engine classes live in
whoosh_ray.search.query; the sentinel/utility objects are defined
here."""

from __future__ import annotations

from whoosh_ray.search.query import (  # noqa: F401
    Every,
    NullQuery,
    Query,
    QueryError,
    _NullQuery,
)


def error_query(msg, q=None):
    """Tag ``q`` (or a fresh _NullQuery) with a parse error message
    (reference qcore.py:48-57)."""
    if q is None:
        q = _NullQuery()
    q.error = msg
    return q


def token_lists(q, phrases: bool = True):
    """The query tree's terms as nested lists mirroring the hierarchy
    (reference qcore.py:60-77)."""
    from whoosh_ray.search.query import Phrase

    if q.is_leaf():
        if phrases or not isinstance(q, Phrase):
            return list(q.tokens())
        return []
    ls = []
    for qq in q.children():
        t = token_lists(qq, phrases=phrases)
        if len(t) == 1:
            t = t[0]
        if t:
            ls.append(t)
    return ls


class Lowest:
    """Sentinel that sorts below every other object except itself
    (reference qcore.py:82-108)."""

    def __eq__(self, other):
        return self.__class__ is type(other)

    def __ne__(self, other):
        return not self.__eq__(other)

    def __lt__(self, other):
        return type(other) is not self.__class__

    def __gt__(self, other):
        return False

    def __le__(self, other):
        return True

    def __ge__(self, other):
        return self.__eq__(other)

    def __hash__(self):
        return hash(self.__class__)


class Highest:
    """Sentinel that sorts above every other object except itself
    (reference qcore.py:111-137)."""

    def __eq__(self, other):
        return self.__class__ is type(other)

    def __ne__(self, other):
        return not self.__eq__(other)

    # reference quirk kept: Highest < Highest is True (qcore.py:124-125
    # compares ``type(other) is self.__class__``)
    def __lt__(self, other):
        return type(other) is self.__class__

    def __gt__(self, other):
        return type(other) is not self.__class__

    def __le__(self, other):
        return self.__eq__(other) or self.__lt__(other)

    def __ge__(self, other):
        return True

    def __hash__(self):
        return hash(self.__class__)


# the reference rebinds both names to singleton INSTANCES
# (qcore.py:139-140) — sort keys use them directly as values
Lowest = Lowest()
Highest = Highest()
