"""Pull-based posting matchers (reference matching/{mcore,binary,
wrappers,combo}.py).

The ENGINE does not run on these: queries evaluate through vectorized
numpy kernels (``search/matching.py``) over whole posting arrays, which
is the Ray-Data-first design.  This module exists because matchers are
the reference's PUBLIC EXTENSION PROTOCOL — custom ``Query`` subclasses
build and combine them — so a working, behavior-parity implementation
ships for migrated user code.  ``drain()`` bridges the two worlds: a
query whose ``matcher()`` returns one of these is evaluated by draining
it into the (docids, scores) arrays the engine consumes
(search/query.py Query.docs_scores fallback).

Behavior parity is lockstep-tested against the reference classes in
tests/test_matching.py, including the pinned quirks:

- ``AndMaybeMatcher.weight()`` probes ``b.id()`` unguarded — crashes
  when the optional side is exhausted (reference binary.py:783-787).
- ``Matcher.all_ids()`` re-replaces every 10 postings, so a quality
  replacement mid-iteration can change what a partially-consumed
  matcher yields (reference mcore.py:200-214).
- ``UnionMatcher.skip_to_quality`` loops on ``aq + bq < minquality``
  while DisjunctionMax loops on ``max(aq, bq) <= minquality`` —
  boundary-inclusive asymmetry kept.
"""

from array import array

import numpy as np


class ReadTooFar(Exception):
    """next()/skip_to() called on an inactive matcher."""


class NoQualityAvailable(Exception):
    """Quality methods called on a matcher without block quality."""


# ---------------------------------------------------------------- base


class Matcher:
    """Cursor over a posting list: ``id()`` is the current document,
    ``next()``/``skip_to()`` advance, ``score()`` rates the current
    posting, ``replace()`` may return an optimized equivalent."""

    def is_active(self) -> bool:
        raise NotImplementedError

    def reset(self):
        raise NotImplementedError

    def id(self):
        raise NotImplementedError

    def next(self):
        raise NotImplementedError(type(self).__name__)

    def copy(self):
        raise NotImplementedError

    def value(self):
        raise NotImplementedError

    def supports(self, astype) -> bool:
        raise NotImplementedError("supports not implemented in %s"
                                  % type(self))

    def value_as(self, astype):
        raise NotImplementedError("value_as not implemented in %s"
                                  % type(self))

    def score(self):
        raise NotImplementedError(type(self).__name__)

    def term(self):
        return None

    def term_matchers(self):
        if self.term() is not None:
            yield self
        else:
            for child in self.children():
                yield from child.term_matchers()

    def matching_terms(self, id=None):
        if not self.is_active():
            return
        if id is None:
            id = self.id()
        elif id != self.id():
            return
        t = self.term()
        if t is None:
            for child in self.children():
                yield from child.matching_terms(id)
        else:
            yield t

    def is_leaf(self) -> bool:
        return not bool(self.children())

    def children(self) -> list:
        return []

    def replace(self, minquality=0):
        return self

    def depth(self) -> int:
        return 0

    def supports_block_quality(self) -> bool:
        return False

    def max_quality(self):
        raise NoQualityAvailable(type(self))

    def block_quality(self):
        raise NoQualityAvailable(type(self))

    def skip_to_quality(self, minquality):
        raise NotImplementedError(type(self).__name__)

    def all_ids(self):
        # re-replace every 10 postings, exactly like the reference
        # (a mid-stream quality replacement is observable)
        i = 0
        m = self
        while m.is_active():
            yield m.id()
            m.next()
            i += 1
            if i == 10:
                m = m.replace()
                i = 0

    def all_items(self):
        i = 0
        m = self
        while self.is_active():
            yield (m.id(), m.value())
            m.next()
            i += 1
            if i == 10:
                m = m.replace()
                i = 0

    def items_as(self, astype):
        while self.is_active():
            yield (self.id(), self.value_as(astype))
            self.next()

    def spans(self):
        from whoosh_ray.query import Span

        if self.supports("characters"):
            return [Span(pos, startchar=sc, endchar=ec)
                    for pos, sc, ec in self.value_as("characters")]
        if self.supports("positions"):
            return [Span(pos) for pos in self.value_as("positions")]
        raise Exception("Field does not support spans")

    def skip_to(self, id):
        while self.is_active() and self.id() < id:
            self.next()

    def weight(self):
        return self.value_as("weight")

    # reference matchers compare by CLASS only
    def __eq__(self, other):
        return self.__class__ is type(other)

    def __ne__(self, other):
        return not self.__eq__(other)

    def __lt__(self, other):
        return type(other) is self.__class__

    def __gt__(self, other):
        return not (self.__lt__(other) or self.__eq__(other))

    def __le__(self, other):
        return self.__eq__(other) or self.__lt__(other)

    def __ge__(self, other):
        return self.__eq__(other) or self.__gt__(other)


class ConstantScoreMatcher(Matcher):
    def __init__(self, score=1.0):
        self._score = score

    def supports_block_quality(self):
        return True

    def max_quality(self):
        return self._score

    def block_quality(self):
        return self._score

    def skip_to_quality(self, minquality):
        if minquality >= self._score:
            self.go_inactive()

    def score(self):
        return self._score


class NullMatcherClass(Matcher):
    """Never-active matcher; the ``NullMatcher`` singleton is also
    callable, returning itself (reference mcore.py:371-408)."""

    def __call__(self):
        return self

    def __repr__(self):
        return "<NullMatcher>"

    def supports_block_quality(self):
        return True

    def max_quality(self):
        return 0

    def block_quality(self):
        return 0

    def skip_to_quality(self, minquality):
        return 0

    def is_active(self):
        return False

    def reset(self):
        pass

    def all_ids(self):
        return []

    def copy(self):
        return self


NullMatcher = NullMatcherClass()


class ListMatcher(Matcher):
    """Matcher over in-memory id/weight/value lists — the class user
    code actually instantiates (reference mcore.py:410-573)."""

    def __init__(self, ids, weights=None, values=None, format=None,
                 scorer=None, position=0, all_weights=None, term=None,
                 terminfo=None):
        self._ids = ids
        self._weights = weights
        self._all_weights = all_weights
        self._values = values
        self._i = position
        self._format = format
        self._scorer = scorer
        self._term = term
        self._terminfo = terminfo

    def __repr__(self):
        return "<%s>" % type(self).__name__

    def is_active(self):
        return self._i < len(self._ids)

    def reset(self):
        self._i = 0

    def skip_to(self, id):
        if not self.is_active():
            raise ReadTooFar
        if id < self.id():
            return
        while self._i < len(self._ids) and self._ids[self._i] < id:
            self._i += 1

    def term(self):
        return self._term

    def copy(self):
        # reference copy() drops term/terminfo — kept
        return self.__class__(self._ids, self._weights, self._values,
                              self._format, self._scorer, self._i,
                              self._all_weights)

    def replace(self, minquality=0):
        if not self.is_active():
            return NullMatcher()
        if minquality and self.max_quality() < minquality:
            return NullMatcher()
        return self

    def supports_block_quality(self):
        return (self._scorer is not None
                and self._scorer.supports_block_quality())

    def max_quality(self):
        # the whole list is one block
        if self._scorer:
            return self._scorer.block_quality(self)
        return self.block_max_weight()

    def block_quality(self):
        return self._scorer.block_quality(self)

    def skip_to_quality(self, minquality):
        while (self._i < len(self._ids)
               and self.block_quality() <= minquality):
            self._i += 1
        return 0

    def id(self):
        return self._ids[self._i]

    def all_ids(self):
        return iter(self._ids)

    def all_items(self):
        from itertools import repeat

        values = self._values if self._values is not None else repeat("")
        return zip(self._ids, values)

    def value(self):
        if self._values:
            v = self._values[self._i]
            if isinstance(v, list):
                # lazily combine multi-source value lists (MultiTerm
                # TOO_MANY_CLAUSES collapse), caching the combination
                assert len(v) > 0
                v = v[0] if len(v) == 1 else self._format.combine(v)
                self._values[self._i] = v
            return v
        return ""

    def value_as(self, astype):
        return self._format.decoder(astype)(self.value())

    def supports(self, astype):
        return self._format.supports(astype)

    def next(self):
        self._i += 1

    def weight(self):
        if self._all_weights:
            return self._all_weights
        if self._weights:
            return self._weights[self._i]
        return 1.0

    def block_min_length(self):
        return self._terminfo.min_length()

    def block_max_length(self):
        return self._terminfo.max_length()

    def block_max_weight(self):
        if self._all_weights:
            return self._all_weights
        if self._weights:
            return max(self._weights)
        if self._terminfo is not None:
            return self._terminfo.max_weight()
        return 1.0

    def score(self):
        if self._scorer:
            return self._scorer.score(self)
        return self.weight()


# -------------------------------------------------------------- binary


class LeafMatcher(Matcher):
    """Base for term-level matchers (reference mcore.py:575-632):
    subclasses set ``self.scorer`` (a Scorer or None) and
    ``self.format`` (a :class:`whoosh_ray.formats.Format`) and get the
    value_as/spans/quality surface for free."""

    def __repr__(self):
        return "%s(%r, %s)" % (type(self).__name__, self.term(),
                               self.is_active())

    def term(self):
        return self._term

    def items_as(self, astype):
        decoder = self.format.decoder(astype)
        for id_, value in self.all_items():
            yield (id_, decoder(value))

    def supports(self, astype):
        return self.format.supports(astype)

    def value_as(self, astype):
        return self.format.decoder(astype)(self.value())

    def spans(self):
        from whoosh_ray.search.spans import Span

        if self.supports("characters"):
            return [Span(pos, startchar=sc, endchar=ec)
                    for pos, sc, ec in self.value_as("characters")]
        elif self.supports("positions"):
            return [Span(pos) for pos in self.value_as("positions")]
        else:
            raise Exception("Field does not support positions (%r)"
                            % (self.term(),))

    def supports_block_quality(self):
        return self.scorer and self.scorer.supports_block_quality()

    def max_quality(self):
        return self.scorer.max_quality()

    def block_quality(self):
        return self.scorer.block_quality(self)

    def score(self):
        return self.scorer.score(self)


class BiMatcher(Matcher):
    """Combines two sub-matchers (reference binary.py:31-69)."""

    def __init__(self, a, b):
        self.a = a
        self.b = b

    def __repr__(self):
        return "%s(%r, %r)" % (type(self).__name__, self.a, self.b)

    def reset(self):
        self.a.reset()
        self.b.reset()

    def children(self):
        return [self.a, self.b]

    def copy(self):
        return self.__class__(self.a.copy(), self.b.copy())

    def depth(self):
        return 1 + max(self.a.depth(), self.b.depth())

    def skip_to(self, id):
        if not self.is_active():
            raise ReadTooFar
        ra = self.a.skip_to(id)
        rb = self.b.skip_to(id)
        return ra or rb

    def supports_block_quality(self):
        return (self.a.supports_block_quality()
                and self.b.supports_block_quality())

    def supports(self, astype):
        return self.a.supports(astype) and self.b.supports(astype)


class AdditiveBiMatcher(BiMatcher):
    """BiMatcher whose score is the sum of its children's."""

    def max_quality(self):
        q = 0.0
        if self.a.is_active():
            q += self.a.max_quality()
        if self.b.is_active():
            q += self.b.max_quality()
        return q

    def block_quality(self):
        bq = 0.0
        if self.a.is_active():
            bq += self.a.block_quality()
        if self.b.is_active():
            bq += self.b.block_quality()
        return bq

    def weight(self):
        return self.a.weight() + self.b.weight()

    def score(self):
        return self.a.score() + self.b.score()


class UnionMatcher(AdditiveBiMatcher):
    """OR of two matchers; same-doc scores add (reference
    binary.py:118-297)."""

    _id = None

    def replace(self, minquality=0):
        a, b = self.a, self.b
        a_active, b_active = a.is_active(), b.is_active()

        if minquality and a_active and b_active:
            a_max, b_max = a.max_quality(), b.max_quality()
            if a_max < minquality and b_max < minquality:
                return IntersectionMatcher(a, b).replace(minquality)
            if a_max < minquality:
                return AndMaybeMatcher(b, a)
            if b_max < minquality:
                return AndMaybeMatcher(a, b)

        if not (a_active or b_active):
            return NullMatcher()
        if not a_active:
            return b.replace(minquality)
        if not b_active:
            return a.replace(minquality)

        a = a.replace(minquality - b.max_quality() if minquality else 0)
        b = b.replace(minquality - a.max_quality() if minquality else 0)
        if a is not self.a or b is not self.b:
            return self.__class__(a, b)
        self._id = None
        return self

    def is_active(self):
        return self.a.is_active() or self.b.is_active()

    def skip_to(self, id):
        self._id = None
        ra = rb = False
        if self.a.is_active():
            ra = self.a.skip_to(id)
        if self.b.is_active():
            rb = self.b.skip_to(id)
        return ra or rb

    def id(self):
        if self._id is not None:
            return self._id
        a, b = self.a, self.b
        if not a.is_active():
            _id = b.id()
        elif not b.is_active():
            _id = a.id()
        else:
            _id = min(a.id(), b.id())
        self._id = _id
        return _id

    def next(self):
        self._id = None
        a, b = self.a, self.b
        a_active, b_active = a.is_active(), b.is_active()
        if not (a_active or b_active):
            raise ReadTooFar
        if not a_active:
            return b.next()
        if not b_active:
            return a.next()
        a_id, b_id = a.id(), b.id()
        ar = br = None
        if a_id <= b_id:
            ar = a.next()
        if b_id <= a_id:
            br = b.next()
        return ar or br

    def spans(self):
        if not self.a.is_active():
            return self.b.spans()
        if not self.b.is_active():
            return self.a.spans()
        id_a, id_b = self.a.id(), self.b.id()
        if id_a < id_b:
            return self.a.spans()
        if id_b < id_a:
            return self.b.spans()
        return sorted(set(self.a.spans()) | set(self.b.spans()))

    def weight(self):
        a, b = self.a, self.b
        if not a.is_active():
            return b.weight()
        if not b.is_active():
            return a.weight()
        id_a, id_b = a.id(), b.id()
        if id_a < id_b:
            return a.weight()
        if id_b < id_a:
            return b.weight()
        return a.weight() + b.weight()

    def score(self):
        a, b = self.a, self.b
        if not a.is_active():
            return b.score()
        if not b.is_active():
            return a.score()
        id_a, id_b = a.id(), b.id()
        if id_a < id_b:
            return a.score()
        if id_b < id_a:
            return b.score()
        return a.score() + b.score()

    def skip_to_quality(self, minquality):
        self._id = None
        a, b = self.a, self.b
        if not (a.is_active() or b.is_active()):
            raise ReadTooFar
        if not a.is_active():
            return b.skip_to_quality(minquality)
        if not b.is_active():
            return a.skip_to_quality(minquality)

        skipped = 0
        aq, bq = a.block_quality(), b.block_quality()
        while a.is_active() and b.is_active() and aq + bq < minquality:
            if aq < bq:
                skipped += a.skip_to_quality(minquality - bq)
                aq = a.block_quality()
            else:
                skipped += b.skip_to_quality(minquality - aq)
                bq = b.block_quality()
        return skipped


class DisjunctionMaxMatcher(UnionMatcher):
    """OR taking the max (not sum) of same-doc scores (reference
    binary.py:300-406)."""

    def __init__(self, a, b, tiebreak=0.0):
        super().__init__(a, b)
        self.tiebreak = tiebreak

    def copy(self):
        return self.__class__(self.a.copy(), self.b.copy(),
                              tiebreak=self.tiebreak)

    def replace(self, minquality=0):
        a, b = self.a, self.b
        a_active, b_active = a.is_active(), b.is_active()

        if minquality and a_active and b_active:
            a_max, b_max = a.max_quality(), b.max_quality()
            if a_max < minquality and b_max < minquality:
                return NullMatcher()
            if b_max < minquality:
                return a.replace(minquality)
            if a_max < minquality:
                return b.replace(minquality)

        if not (a_active or b_active):
            return NullMatcher()
        if not a_active:
            return b.replace(minquality)
        if not b_active:
            return a.replace(minquality)

        # max semantics: minquality passes straight down
        a = a.replace(minquality)
        b = b.replace(minquality)
        a_active, b_active = a.is_active(), b.is_active()
        if not (a_active and b_active):
            # reference quirk: BOTH must stay active after replacement
            # or the whole DisMax goes inactive/single
            return NullMatcher()
        if not a_active:
            return b
        if not b_active:
            return a
        if a is not self.a or b is not self.b:
            return self.__class__(a, b)
        return self

    def score(self):
        if not self.a.is_active():
            return self.b.score()
        if not self.b.is_active():
            return self.a.score()
        return max(self.a.score(), self.b.score())

    def max_quality(self):
        return max(self.a.max_quality(), self.b.max_quality())

    def block_quality(self):
        return max(self.a.block_quality(), self.b.block_quality())

    def skip_to_quality(self, minquality):
        a, b = self.a, self.b
        if not a.is_active():
            return b.skip_to_quality(minquality)
        if not b.is_active():
            return a.skip_to_quality(minquality)

        skipped = 0
        aq, bq = a.block_quality(), b.block_quality()
        while (a.is_active() and b.is_active()
               and max(aq, bq) <= minquality):
            if aq <= minquality:
                skipped += a.skip_to_quality(minquality)
                aq = a.block_quality()
            if bq <= minquality:
                skipped += b.skip_to_quality(minquality)
                bq = b.block_quality()
        return skipped


class IntersectionMatcher(AdditiveBiMatcher):
    """AND of two matchers (reference binary.py:408-563)."""

    def __init__(self, a, b):
        super().__init__(a, b)
        self._find_first()

    def reset(self):
        self.a.reset()
        self.b.reset()
        self._find_first()

    def _find_first(self):
        if (self.a.is_active() and self.b.is_active()
                and self.a.id() != self.b.id()):
            self._find_next()

    def _find_next(self):
        a, b = self.a, self.b
        a_id, b_id = a.id(), b.id()
        assert a_id != b_id
        r = False
        while a.is_active() and b.is_active() and a_id != b_id:
            if a_id < b_id:
                ra = a.skip_to(b_id)
                if not a.is_active():
                    return
                r = r or ra
                a_id = a.id()
            else:
                rb = b.skip_to(a_id)
                if not b.is_active():
                    return
                r = r or rb
                b_id = b.id()
        return r

    def replace(self, minquality=0):
        a, b = self.a, self.b
        if not (a.is_active() and b.is_active()):
            return NullMatcher()

        if minquality:
            a_max, b_max = a.max_quality(), b.max_quality()
            if a_max + b_max < minquality:
                return NullMatcher()
            a_min = minquality - b_max
            b_min = minquality - a_max
        else:
            a_min = b_min = 0

        a = a.replace(a_min)
        b = b.replace(b_min)
        a_active, b_active = a.is_active(), b.is_active()
        if not (a_active or b_active):
            return NullMatcher()
        if not a_active:
            return b
        if not b_active:
            return a
        if a is not self.a or b is not self.b:
            return self.__class__(a, b)
        return self

    def is_active(self):
        return self.a.is_active() and self.b.is_active()

    def id(self):
        return self.a.id()

    def all_ids(self):
        return iter(sorted(set(self.a.all_ids())
                           & set(self.b.all_ids())))

    def skip_to(self, id):
        if not self.is_active():
            raise ReadTooFar
        ra = self.a.skip_to(id)
        rb = self.b.skip_to(id)
        if self.is_active():
            rn = False
            if self.a.id() != self.b.id():
                rn = self._find_next()
            return ra or rb or rn

    def skip_to_quality(self, minquality):
        a, b = self.a, self.b
        skipped = 0
        aq, bq = a.block_quality(), b.block_quality()
        while a.is_active() and b.is_active() and aq + bq < minquality:
            if aq < bq:
                sk = a.skip_to_quality(minquality - bq)
                skipped += sk
                if not sk and a.is_active():
                    a.next()
            else:
                sk = b.skip_to_quality(minquality - aq)
                skipped += sk
                if not sk and b.is_active():
                    b.next()
            if not a.is_active() or not b.is_active():
                break
            if a.id() != b.id():
                self._find_next()
            aq, bq = a.block_quality(), b.block_quality()
        return skipped

    def next(self):
        if not self.is_active():
            raise ReadTooFar
        ar = self.a.next()
        if self.is_active():
            nr = self._find_next()
            return ar or nr

    def spans(self):
        return sorted(set(self.a.spans()) | set(self.b.spans()))


class AndNotMatcher(BiMatcher):
    """Postings of ``a`` not present in ``b`` (reference
    binary.py:565-684)."""

    def __init__(self, a, b):
        super().__init__(a, b)
        self._find_first()

    def reset(self):
        self.a.reset()
        self.b.reset()
        self._find_first()

    def _find_first(self):
        if (self.a.is_active() and self.b.is_active()
                and self.a.id() == self.b.id()):
            self._find_next()

    def _find_next(self):
        pos, neg = self.a, self.b
        if not neg.is_active():
            return
        pos_id = pos.id()
        r = False
        if neg.id() < pos_id:
            neg.skip_to(pos_id)
        while pos.is_active() and neg.is_active() and pos_id == neg.id():
            nr = pos.next()
            if not pos.is_active():
                break
            r = r or nr
            pos_id = pos.id()
            neg.skip_to(pos_id)
        return r

    def is_active(self):
        return self.a.is_active()

    def supports_block_quality(self):
        return self.a.supports_block_quality()

    def replace(self, minquality=0):
        if not self.a.is_active():
            return NullMatcher()
        if minquality and self.a.max_quality() < minquality:
            return NullMatcher()
        if not self.b.is_active():
            return self.a.replace(minquality)

        a = self.a.replace(minquality)
        b = self.b.replace()
        if a is not self.a or b is not self.b:
            return self.__class__(a, b)
        return self

    def max_quality(self):
        return self.a.max_quality()

    def block_quality(self):
        return self.a.block_quality()

    def skip_to_quality(self, minquality):
        skipped = self.a.skip_to_quality(minquality)
        self._find_next()
        return skipped

    def id(self):
        return self.a.id()

    def next(self):
        if not self.a.is_active():
            raise ReadTooFar
        ar = self.a.next()
        nr = False
        if self.a.is_active() and self.b.is_active():
            nr = self._find_next()
        return ar or nr

    def skip_to(self, id):
        if not self.a.is_active():
            raise ReadTooFar
        if id < self.a.id():
            return
        self.a.skip_to(id)
        if self.b.is_active():
            self.b.skip_to(id)
            self._find_next()

    def weight(self):
        return self.a.weight()

    def score(self):
        return self.a.score()

    def supports(self, astype):
        return self.a.supports(astype)

    def value(self):
        return self.a.value()

    def value_as(self, astype):
        return self.a.value_as(astype)


class AndMaybeMatcher(AdditiveBiMatcher):
    """Postings of ``a``; ``b``'s score added where it matches too
    (reference binary.py:686-803)."""

    def __init__(self, a, b):
        super().__init__(a, b)
        self._first_b()

    def reset(self):
        self.a.reset()
        self.b.reset()
        self._first_b()

    def _first_b(self):
        a, b = self.a, self.b
        if a.is_active() and b.is_active() and a.id() != b.id():
            b.skip_to(a.id())

    def is_active(self):
        return self.a.is_active()

    def id(self):
        return self.a.id()

    def next(self):
        if not self.a.is_active():
            raise ReadTooFar
        ar = self.a.next()
        br = False
        if self.a.is_active() and self.b.is_active():
            br = self.b.skip_to(self.a.id())
        return ar or br

    def skip_to(self, id):
        if not self.a.is_active():
            raise ReadTooFar
        ra = self.a.skip_to(id)
        rb = False
        if self.a.is_active() and self.b.is_active():
            rb = self.b.skip_to(id)
        return ra or rb

    def replace(self, minquality=0):
        a, b = self.a, self.b
        a_active, b_active = a.is_active(), b.is_active()
        if not a_active:
            return NullMatcher()
        if minquality and b_active:
            if a.max_quality() + b.max_quality() < minquality:
                return NullMatcher()
            if a.max_quality() < minquality:
                return IntersectionMatcher(self.a, self.b)
        elif not b_active:
            return a.replace(minquality)

        new_a = a.replace(minquality - b.max_quality())
        new_b = b.replace(minquality - a.max_quality())
        if new_a is not a or new_b is not b:
            return self.__class__(new_a, new_b)
        return self

    def skip_to_quality(self, minquality):
        a, b = self.a, self.b
        if not a.is_active():
            raise ReadTooFar
        if not b.is_active():
            return a.skip_to_quality(minquality)
        skipped = 0
        aq, bq = a.block_quality(), b.block_quality()
        while a.is_active() and b.is_active() and aq + bq < minquality:
            if aq < bq:
                skipped += a.skip_to_quality(minquality - bq)
                aq = a.block_quality()
            else:
                skipped += b.skip_to_quality(minquality - aq)
                bq = b.block_quality()
        return skipped

    def weight(self):
        # reference quirk kept: probes b.id() without an is_active
        # guard — crashes when b is exhausted (binary.py:783-787)
        if self.a.id() == self.b.id():
            return self.a.weight() + self.b.weight()
        return self.a.weight()

    def score(self):
        if self.b.is_active() and self.a.id() == self.b.id():
            return self.a.score() + self.b.score()
        return self.a.score()

    def supports(self, astype):
        return self.a.supports(astype)

    def value(self):
        return self.a.value()

    def value_as(self, astype):
        return self.a.value_as(astype)


# ------------------------------------------------------------ wrappers


class WrappingMatcher(Matcher):
    """Delegating wrapper with a score boost (reference
    wrappers.py:33-116)."""

    def __init__(self, child, boost=1.0):
        self.child = child
        self.boost = boost

    def __repr__(self):
        return "%s(%r, boost=%s)" % (type(self).__name__, self.child,
                                     self.boost)

    def copy(self):
        kwargs = {}
        if hasattr(self, "boost"):
            kwargs["boost"] = self.boost
        return self.__class__(self.child.copy(), **kwargs)

    def depth(self):
        return 1 + self.child.depth()

    def _replacement(self, newchild):
        return self.__class__(newchild, boost=self.boost)

    def replace(self, minquality=0):
        r = self.child.replace(minquality)
        if r is not self.child:
            return self._replacement(r)
        return self

    def id(self):
        return self.child.id()

    def all_ids(self):
        return self.child.all_ids()

    def is_active(self):
        return self.child.is_active()

    def reset(self):
        self.child.reset()

    def children(self):
        return [self.child]

    def supports(self, astype):
        return self.child.supports(astype)

    def value(self):
        return self.child.value()

    def value_as(self, astype):
        return self.child.value_as(astype)

    def spans(self):
        return self.child.spans()

    def skip_to(self, id):
        return self.child.skip_to(id)

    def next(self):
        self.child.next()

    def supports_block_quality(self):
        return self.child.supports_block_quality()

    def skip_to_quality(self, minquality):
        return self.child.skip_to_quality(minquality / self.boost)

    def max_quality(self):
        return self.child.max_quality() * self.boost

    def block_quality(self):
        return self.child.block_quality() * self.boost

    def weight(self):
        return self.child.weight() * self.boost

    def score(self):
        return self.child.score() * self.boost


class MultiMatcher(Matcher):
    """Concatenates per-segment matchers with docid offsets (reference
    wrappers.py:118-252)."""

    def __init__(self, matchers, idoffsets, scorer=None, current=0):
        self.matchers = matchers
        self.offsets = idoffsets
        self.scorer = scorer
        self.current = current
        self._next_matcher()

    def __repr__(self):
        return "%s(%r, %r, current=%s)" % (type(self).__name__,
                                           self.matchers, self.offsets,
                                           self.current)

    def is_active(self):
        return self.current < len(self.matchers)

    def reset(self):
        for mr in self.matchers:
            mr.reset()
        self.current = 0

    def children(self):
        return [self.matchers[self.current]]

    def _next_matcher(self):
        matchers = self.matchers
        while (self.current < len(matchers)
               and not matchers[self.current].is_active()):
            self.current += 1

    def copy(self):
        return self.__class__([mr.copy() for mr in self.matchers],
                              self.offsets, current=self.current)

    def depth(self):
        if self.is_active():
            return 1 + max(mr.depth()
                           for mr in self.matchers[self.current:])
        return 0

    def replace(self, minquality=0):
        m = self
        if minquality:
            while (m.is_active()
                   and m.matchers[m.current].max_quality() < minquality):
                m = self.__class__(self.matchers, self.offsets,
                                   self.scorer, m.current + 1)
                m._next_matcher()
        if not m.is_active():
            return NullMatcher()
        return m

    def id(self):
        current = self.current
        return self.matchers[current].id() + self.offsets[current]

    def all_ids(self):
        offsets = self.offsets
        for i, mr in enumerate(self.matchers):
            for id in mr.all_ids():
                yield id + offsets[i]

    def spans(self):
        return self.matchers[self.current].spans()

    def supports(self, astype):
        return self.matchers[self.current].supports(astype)

    def value(self):
        return self.matchers[self.current].value()

    def value_as(self, astype):
        return self.matchers[self.current].value_as(astype)

    def next(self):
        if not self.is_active():
            raise ReadTooFar
        self.matchers[self.current].next()
        if not self.matchers[self.current].is_active():
            self._next_matcher()

    def skip_to(self, id):
        if not self.is_active():
            raise ReadTooFar
        if id <= self.id():
            return
        matchers, offsets = self.matchers, self.offsets
        r = False
        while self.current < len(matchers) and id > self.id():
            mr = matchers[self.current]
            sr = mr.skip_to(id - offsets[self.current])
            r = sr or r
            if mr.is_active():
                break
            self._next_matcher()
        return r

    def supports_block_quality(self):
        return all(mr.supports_block_quality()
                   for mr in self.matchers[self.current:])

    def max_quality(self):
        return max(m.max_quality()
                   for m in self.matchers[self.current:])

    def block_quality(self):
        return self.matchers[self.current].block_quality()

    def weight(self):
        return self.matchers[self.current].weight()

    def score(self):
        return self.scorer.score(self)


def ExcludeMatcher(child, excluded, boost=1.0):
    return FilterMatcher(child, excluded, exclude=True, boost=boost)


class FilterMatcher(WrappingMatcher):
    """Keeps (or excludes) child postings by membership in an id set
    (reference wrappers.py:258-329)."""

    def __init__(self, child, ids, exclude=False, boost=1.0):
        super().__init__(child)
        self._ids = ids
        self._exclude = exclude
        self.boost = boost
        self._find_next()

    def __repr__(self):
        return "%s(%r, %r, %r, boost=%s)" % (
            type(self).__name__, self.child, self._ids, self._exclude,
            self.boost)

    def reset(self):
        self.child.reset()
        self._find_next()

    def copy(self):
        return self.__class__(self.child.copy(), self._ids,
                              self._exclude, boost=self.boost)

    def _replacement(self, newchild):
        return self.__class__(newchild, self._ids,
                              exclude=self._exclude, boost=self.boost)

    def _find_next(self):
        child = self.child
        ids = self._ids
        r = False
        if self._exclude:
            while child.is_active() and child.id() in ids:
                r = child.next() or r
        else:
            while child.is_active() and child.id() not in ids:
                r = child.next() or r
        return r

    def next(self):
        self.child.next()
        self._find_next()

    def skip_to(self, id):
        self.child.skip_to(id)
        self._find_next()

    def all_ids(self):
        ids = self._ids
        if self._exclude:
            return (id for id in self.child.all_ids() if id not in ids)
        return (id for id in self.child.all_ids() if id in ids)

    def all_items(self):
        ids = self._ids
        if self._exclude:
            return (item for item in self.child.all_items()
                    if item[0] not in ids)
        return (item for item in self.child.all_items()
                if item[0] in ids)


class InverseMatcher(WrappingMatcher):
    """Yields ids NOT matched by the child, up to ``limit``, skipping
    ``missing`` docs (reference wrappers.py:332-420)."""

    def __init__(self, child, limit, missing=None, weight=1.0, id=0):
        super().__init__(child)
        self.limit = limit
        self._weight = weight
        self.missing = missing or (lambda id: False)
        self._id = id
        self._find_next()

    def copy(self):
        return self.__class__(self.child.copy(), self.limit,
                              weight=self._weight, missing=self.missing,
                              id=self._id)

    def _replacement(self, newchild):
        return self.__class__(newchild, self.limit, missing=self.missing,
                              weight=self._weight, id=self._id)

    def is_active(self):
        return self._id < self.limit

    def reset(self):
        self.child.reset()
        self._id = 0
        self._find_next()

    def supports_block_quality(self):
        return False

    def _find_next(self):
        child = self.child
        missing = self.missing
        if not child.is_active() and not missing(self._id):
            return
        while self._id < self.limit and missing(self._id):
            self._id += 1
        if child.is_active() and child.id() < self._id:
            child.skip_to(self._id)
        while child.is_active() and self._id < self.limit:
            if missing(self._id):
                self._id += 1
                continue
            if self._id == child.id():
                self._id += 1
                child.next()
                continue
            break

    def id(self):
        return self._id

    def all_ids(self):
        return Matcher.all_ids(self)

    def next(self):
        if self._id >= self.limit:
            raise ReadTooFar
        self._id += 1
        self._find_next()

    def skip_to(self, id):
        if self._id >= self.limit:
            raise ReadTooFar
        if id < self._id:
            return
        self._id = id
        self._find_next()

    def weight(self):
        return self._weight

    def score(self):
        return self._weight


class RequireMatcher(WrappingMatcher):
    """Intersection that scores only from ``a`` (reference
    wrappers.py:423-484)."""

    def __init__(self, a, b):
        self.a = a
        self.b = b
        super().__init__(IntersectionMatcher(a, b))

    def copy(self):
        return self.__class__(self.a.copy(), self.b.copy())

    def supports_block_quality(self):
        return self.a.supports_block_quality()

    def replace(self, minquality=0):
        if not self.child.is_active():
            return NullMatcher()
        if minquality and self.a.max_quality() < minquality:
            return NullMatcher()
        new_a = self.a.replace(minquality)
        new_b = self.b.replace()
        if not new_a.is_active():
            return NullMatcher()
        if new_a is not self.a or new_b is not self.b:
            return self.__class__(new_a, self.b)
        return self

    def max_quality(self):
        return self.a.max_quality()

    def block_quality(self):
        return self.a.block_quality()

    def skip_to_quality(self, minquality):
        skipped = self.a.skip_to_quality(minquality)
        self.child._find_next()
        return skipped

    def weight(self):
        return self.a.weight()

    def score(self):
        return self.a.score()

    def supports(self, astype):
        return self.a.supports(astype)

    def value(self):
        return self.a.value()

    def value_as(self, astype):
        return self.a.value_as(astype)


class ConstantScoreWrapperMatcher(WrappingMatcher):
    def __init__(self, child, score=1.0):
        super().__init__(child)
        self._score = score

    def copy(self):
        return self.__class__(self.child.copy(), score=self._score)

    def _replacement(self, newchild):
        return self.__class__(newchild, score=self._score)

    def max_quality(self):
        return self._score

    def block_quality(self):
        return self._score

    def score(self):
        return self._score


class SingleTermMatcher(WrappingMatcher):
    """Reports a whole subtree as one term for matched-term questions
    (reference wrappers.py:508-522)."""

    def __init__(self, child, term):
        super().__init__(child)
        self._term = term

    def term(self):
        return self._term

    def replace(self, minquality=0):
        return self


class CoordMatcher(WrappingMatcher):
    """Scales scores by matched-term count — the SQR (Short Query
    Ranking) formula from V-Twin (reference wrappers.py:524-575)."""

    def __init__(self, child, scale=1.0):
        super().__init__(child)
        self._termcount = len(list(child.term_matchers()))
        self._scale = scale

    def _replacement(self, newchild):
        return self.__class__(newchild, scale=self._scale)

    def _sqr(self, score, matching):
        termcount = self._termcount
        scale = self._scale
        if termcount == 0 or termcount == scale:
            return 0
        return ((score + ((matching - 1) / (termcount - scale) ** 2))
                * ((termcount - 1) / termcount))

    def max_quality(self):
        return self._sqr(self.child.max_quality(), self._termcount)

    def block_quality(self):
        return self._sqr(self.child.block_quality(), self._termcount)

    def score(self):
        child = self.child
        score = child.score()
        matching = sum(1 for _ in child.matching_terms(child.id()))
        return self._sqr(score, matching)


# --------------------------------------------------------------- combo


class CombinationMatcher(Matcher):
    def __init__(self, submatchers, boost=1.0):
        self._submatchers = submatchers
        self._boost = boost

    def supports_block_quality(self):
        return all(m.supports_block_quality()
                   for m in self._submatchers)

    def max_quality(self):
        return max(m.max_quality() for m in self._submatchers
                   if m.is_active()) * self._boost

    def supports(self, astype):
        return all(m.supports(astype) for m in self._submatchers)

    def children(self):
        return iter(self._submatchers)

    def score(self):
        return sum(m.score() for m in self._submatchers) * self._boost


class PreloadedUnionMatcher(CombinationMatcher):
    """N-way union that pre-accumulates EVERY submatcher's scores into
    one dense array (reference combo.py:57-155) — memory for speed."""

    def __init__(self, submatchers, doccount, boost=1.0, scored=True):
        super().__init__(submatchers, boost=boost)
        self._doccount = doccount
        a = array("d")
        active = [m for m in self._submatchers if m.is_active()]
        if active:
            offset = self._docnum = min(m.id() for m in active)
            for m in active:
                while m.is_active():
                    score = m.score() * boost if scored else boost
                    place = m.id() - offset
                    if len(a) <= place:
                        a.extend(0 for _ in range(place - len(a) + 1))
                    a[place] += score
                    m.next()
            self._offset = offset
        else:
            self._docnum = 0
            self._offset = 0
        self._a = a

    def is_active(self):
        return self._docnum - self._offset < len(self._a)

    def id(self):
        return self._docnum

    def score(self):
        return self._a[self._docnum - self._offset]

    def next(self):
        a = self._a
        place = self._docnum - self._offset + 1
        while place < len(a) and a[place] == 0:
            place += 1
        self._docnum = place + self._offset

    def max_quality(self):
        return max(self._a[self._docnum - self._offset:])

    def block_quality(self):
        return self.max_quality()

    def skip_to(self, docnum):
        if docnum < self._docnum:
            return
        self._docnum = docnum
        i = docnum - self._offset
        if i < len(self._a) and self._a[i] == 0:
            self.next()

    def skip_to_quality(self, minquality):
        a = self._a
        place = self._docnum - self._offset
        skipped = 0
        while place < len(a) and a[place] <= minquality:
            place += 1
            skipped = 1
        self._docnum = place + self._offset
        return skipped

    def supports(self, astype):
        return False

    def all_ids(self):
        a = self._a
        offset = self._offset
        place = self._docnum - offset
        while place < len(a):
            if a[place] > 0:
                yield place + offset
            place += 1


class ArrayUnionMatcher(CombinationMatcher):
    """N-way union accumulating scores one ``partsize`` block at a time
    (reference combo.py:160-309)."""

    def __init__(self, submatchers, doccount, boost=1.0, scored=True,
                 partsize=2048):
        super().__init__(submatchers, boost=boost)
        self._scored = scored
        self._doccount = doccount
        if not partsize:
            partsize = doccount
        self._partsize = partsize
        self._a = array("d", (0 for _ in range(partsize)))
        self._docnum = self._min_id()
        self._read_part()

    def __repr__(self):
        return ("%s(%r, boost=%f, scored=%r, partsize=%d)"
                % (type(self).__name__, self._submatchers, self._boost,
                   self._scored, self._partsize))

    def _min_id(self):
        active = [m for m in self._submatchers if m.is_active()]
        if active:
            return min(m.id() for m in active)
        return self._doccount

    def _read_part(self):
        scored = self._scored
        boost = self._boost
        limit = min(self._docnum + self._partsize, self._doccount)
        offset = self._docnum
        a = self._a
        for i in range(self._partsize):
            a[i] = 0
        for m in self._submatchers:
            while m.is_active() and m.id() < limit:
                i = m.id() - offset
                if scored:
                    a[i] += m.score() * boost
                else:
                    a[i] = 1
                m.next()
        self._offset = offset
        self._limit = limit

    def _find_next(self):
        a = self._a
        docnum = self._docnum
        offset, limit = self._offset, self._limit
        while docnum < limit:
            if a[docnum - offset] > 0:
                break
            docnum += 1
        if docnum == limit:
            self._docnum = self._min_id()
            self._read_part()
        else:
            self._docnum = docnum

    def supports(self, astype):
        return False

    def is_active(self):
        return self._docnum < self._doccount

    def max_quality(self):
        return max(m.max_quality() for m in self._submatchers)

    def block_quality(self):
        return max(self._a)

    def skip_to(self, docnum):
        if docnum < self._offset:
            return
        if docnum < self._limit:
            self._docnum = docnum
            self._find_next()
            return
        for m in self._submatchers:
            if m.is_active():
                m.skip_to(docnum)
        if any(m.is_active() for m in self._submatchers):
            self._docnum = self._min_id()
            self._read_part()
        else:
            self._docnum = self._doccount

    def skip_to_quality(self, minquality):
        skipped = 0
        while self.is_active() and self.block_quality() <= minquality:
            skipped += 1
            self._docnum = self._limit
            self._read_part()
        if self.is_active():
            self._find_next()
        return skipped

    def id(self):
        return self._docnum

    def next(self):
        self._docnum += 1
        return self._find_next()

    def score(self):
        return self._a[self._docnum - self._offset]

    def all_ids(self):
        doccount = self._doccount
        docnum = self._docnum
        offset, limit = self._offset, self._limit
        a = self._a
        while docnum < doccount:
            if a[docnum - offset] > 0:
                yield docnum
            docnum += 1
            if docnum == limit:
                self._docnum = docnum
                self._read_part()
                offset, limit = self._offset, self._limit


# ------------------------------------------------- engine bridge


def drain(matcher: Matcher) -> tuple[np.ndarray, np.ndarray]:
    """Exhaust a matcher into the (docids, scores) float64/int64 arrays
    the engine's evaluation protocol consumes — the bridge that lets a
    reference-style custom Query (one that builds matchers) run on the
    vectorized searcher.  Consumes the matcher."""
    ids: list[int] = []
    scores: list[float] = []
    while matcher.is_active():
        ids.append(matcher.id())
        scores.append(matcher.score())
        matcher.next()
    return (np.asarray(ids, dtype=np.int64),
            np.asarray(scores, dtype=np.float64))
