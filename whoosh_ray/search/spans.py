"""Span queries — positional span algebra over the positions payloads.

Reference: /root/reference/src/whoosh/query/spans.py (Span ops :51-168,
SpanFirst :299-339, SpanNear2 :493-638, SpanOr :647-699, SpanNot
:717-765, SpanContains :767-813, SpanBefore :815-847, SpanCondition
:850-877).  Each span query scores with its underlying boolean query's
matcher (Intersection sum for Near/Contains/Before/Condition, AndMaybe
for SpanNot, Or-sum for SpanOr, the child itself for SpanFirst) and then
keeps only docs whose computed span set is non-empty — reproduced here
as: evaluate the underlying query vectorized, then filter candidates by
a per-doc span computation that follows the reference algorithms
verbatim (including SpanNear2's slop/mindist/ordered merge and Span.to
span-joining)."""

from __future__ import annotations

from bisect import bisect_left

import numpy as np

from whoosh_ray.search import matching
from whoosh_ray.search import query as _query
from whoosh_ray.search.query import (
    And,
    AndMaybe,
    Or,
    Phrase,
    Query,
    Term,
)

# spans are (start, end) tuples internally; the public Span class below
# is the reference's user-facing span object (query/spans.py:53-168)


class Span:
    """A (start, end) position range with optional char offsets —
    the object reference APIs hand to users (query/spans.py:53-168).
    Engine internals stay plain tuples; this class exists for ported
    code that constructs, merges and compares spans."""

    __slots__ = ("start", "end", "startchar", "endchar", "boost")

    def __init__(self, start, end=None, startchar=None, endchar=None,
                 boost=1.0):
        if end is None:
            end = start
        assert start <= end
        self.start = start
        self.end = end
        self.startchar = startchar
        self.endchar = endchar
        self.boost = boost

    def __repr__(self):
        if self.startchar is not None or self.endchar is not None:
            return "<%d-%d %d:%d>" % (self.start, self.end,
                                      self.startchar, self.endchar)
        return "<%d-%d>" % (self.start, self.end)

    # reference quirk kept: __eq__ compares char offsets too, but
    # __ne__/__hash__ look at positions only
    def __eq__(self, other):
        return (self.start == other.start and self.end == other.end
                and self.startchar == other.startchar
                and self.endchar == other.endchar)

    def __ne__(self, other):
        return self.start != other.start or self.end != other.end

    def __lt__(self, other):
        return self.start < other.start

    def __gt__(self, other):
        return self.start > other.start

    def __hash__(self):
        return hash((self.start, self.end))

    @classmethod
    def merge(cls, spans):
        """Coalesce overlapping/touching spans IN PLACE and return the
        list (reference classmethod semantics, including the mutation)."""
        i = 0
        while i < len(spans) - 1:
            here = spans[i]
            j = i + 1
            while j < len(spans):
                there = spans[j]
                if there.start > here.end + 1:
                    break
                if here.touches(there) or here.overlaps(there):
                    here = here.to(there)
                    spans[i] = here
                    del spans[j]
                else:
                    j += 1
            i += 1
        return spans

    def to(self, span):
        if self.startchar is None:
            minchar = span.startchar
        elif span.startchar is None:
            minchar = self.startchar
        else:
            minchar = min(self.startchar, span.startchar)
        if self.endchar is None:
            maxchar = span.endchar
        elif span.endchar is None:
            maxchar = self.endchar
        else:
            maxchar = max(self.endchar, span.endchar)
        return type(self)(min(self.start, span.start),
                          max(self.end, span.end), minchar, maxchar)

    def overlaps(self, span):
        return _overlaps((self.start, self.end), (span.start, span.end))

    def surrounds(self, span):
        return self.start < span.start and self.end > span.end

    def is_within(self, span):
        return self.start >= span.start and self.end <= span.end

    def is_before(self, span):
        return self.end < span.start

    def is_after(self, span):
        return self.start > span.end

    def touches(self, span):
        return self.start == span.end + 1 or self.end == span.start - 1

    def distance_to(self, span):
        if self.overlaps(span):
            return 0
        if self.is_before(span):
            return span.start - self.end
        return self.start - span.end


def bisect_spans(spans, start):
    """Leftmost index in ``spans`` whose .start >= start (reference
    query/spans.py:170-179)."""
    return bisect_left(spans, start, key=lambda s: s.start)


def _overlaps(a, b):
    return ((b[0] <= a[0] <= b[1]) or (b[0] <= a[1] <= b[1])
            or (a[0] <= b[0] <= a[1]) or (a[0] <= b[1] <= a[1]))


def _distance(a, b):
    if _overlaps(a, b):
        return 0
    if a[1] < b[0]:
        return b[0] - a[1]
    return a[0] - b[1]


def _to(a, b):
    return (min(a[0], b[0]), max(a[1], b[1]))


def doc_spans(q: Query, searcher, seg, docids: np.ndarray) -> list[list[tuple]]:
    """Span lists for the given docids (per the reference span algebra)."""
    if isinstance(q, Term):
        p = seg.postings(q.fieldname, q.text)
        pos = seg.positions(q.fieldname, q.text)
        out = []
        if p is None or pos is None:
            return [[] for _ in docids]
        idx = np.searchsorted(p.docids, docids)
        for i, d in zip(idx, docids):
            if i < len(p.docids) and p.docids[i] == d:
                out.append([(int(x), int(x)) for x in pos[int(i)]])
            else:
                out.append([])
        return out
    if isinstance(q, SpanNear2):
        subs = [doc_spans(s, searcher, seg, docids) for s in q.qs]
        out = []
        for di in range(len(docids)):
            aspans = subs[0][di]
            i = 1
            while i < len(subs) and aspans:
                bspans = subs[i][di]
                found = set()
                for aspan in aspans:
                    # ordered can seek to b.start >= a.start (the skip
                    # condition below is start-based); unordered must
                    # scan from 0 — its skip tests bspan's END, and a
                    # wide merged span can start far before a.start yet
                    # end inside the slop window (spans.py:474)
                    if q.ordered:
                        j = bisect_left([b[0] for b in bspans], aspan[0])
                    else:
                        j = 0
                    while j < len(bspans):
                        bspan = bspans[j]
                        j += 1
                        if (bspan[1] < aspan[0] - q.slop
                                or (q.ordered and aspan[0] > bspan[0])):
                            continue
                        if bspan[0] > aspan[1] + q.slop:
                            break
                        if q.mindist <= _distance(aspan, bspan) <= q.slop:
                            found.add(_to(aspan, bspan))
                aspans = sorted(found)
                i += 1
            out.append(aspans)
        return out
    if isinstance(q, SpanOr):
        subs = [doc_spans(s, searcher, seg, docids) for s in q.subqs]
        return [sorted(set().union(*[s[di] for s in subs]))
                for di in range(len(docids))]
    if isinstance(q, SpanFirst):
        child = doc_spans(q.q, searcher, seg, docids)
        return [[s for s in spans if s[1] <= q.limit] for spans in child]
    if isinstance(q, SpanNot):
        aa = doc_spans(q.a, searcher, seg, docids)
        bb = doc_spans(q.b, searcher, seg, docids)
        out = []
        for aspans, bspans in zip(aa, bb):
            if bspans:
                out.append([a for a in aspans
                            if not any(_overlaps(a, b) for b in bspans)])
            else:
                out.append(aspans)
        return out
    if isinstance(q, SpanContains):
        aa = doc_spans(q.a, searcher, seg, docids)
        bb = doc_spans(q.b, searcher, seg, docids)
        out = []
        for aspans, bspans in zip(aa, bb):
            keep = []
            for a in aspans:
                for b in bspans:
                    if a[0] > b[1]:
                        continue
                    if a[1] < b[0]:
                        break
                    if b[0] >= a[0] and b[1] <= a[1]:
                        keep.append(a)
                        break
            out.append(keep)
        return out
    if isinstance(q, SpanBefore):
        aa = doc_spans(q.a, searcher, seg, docids)
        bb = doc_spans(q.b, searcher, seg, docids)
        out = []
        for aspans, bspans in zip(aa, bb):
            if not bspans:
                out.append([])
                continue
            bmin = min(b[0] for b in bspans)
            out.append([a for a in aspans if a[1] < bmin])
        return out
    if isinstance(q, SpanCondition):
        return doc_spans(q.a, searcher, seg, docids)
    # --- generic (non-span) children inside a span tree -----------------
    # Sequence/Ordered over arbitrary subqueries (positional.py:37-120)
    # evaluate children through the matcher protocol, whose .spans() is:
    # UnionMatcher -> union of the sides at the current doc
    # (matching/binary.py:221-236), IntersectionMatcher -> union of both
    # sides (binary.py:561), wrappers delegate to the child
    # (wrappers.py:90); multiterm queries expand to term unions under
    # needs_current (ArrayUnion is bypassed).
    if isinstance(q, Phrase):
        return doc_spans(SpanNear.phrase(q.fieldname, q.words,
                                         slop=q.slop),
                         searcher, seg, docids)
    if isinstance(q, _query._MultiTerm):
        subs = [doc_spans(Term(q.fieldname, w), searcher, seg, docids)
                for w in q._expand(searcher)]
        return [sorted(set().union(*[s[di] for s in subs])) if subs
                else [] for di in range(len(docids))]
    if isinstance(q, (And, Or, _query.DisjunctionMax)):
        subs = [doc_spans(s, searcher, seg, docids)
                for s in q.subqueries]
        return [sorted(set().union(*[s[di] for s in subs])) if subs
                else [] for di in range(len(docids))]
    if isinstance(q, (_query.AndNot, _query.Require, AndMaybe)):
        return doc_spans(q.a, searcher, seg, docids)
    raise NotImplementedError(type(q))


class _SpanQuery(Query):
    """Base: evaluate the scoring query, keep docs with non-empty spans."""

    def needs_spans(self) -> bool:
        # reference spans.py:284-285
        return True

    def _scoring_query(self) -> Query:
        raise NotImplementedError

    def terms(self):
        return self._scoring_query().terms()

    def docs_scores(self, searcher, seg):
        ids, scores = self._scoring_query().docs_scores(searcher, seg)
        if not len(ids):
            return matching.empty()
        spans = doc_spans(self, searcher, seg, ids)
        keep = np.array([bool(s) for s in spans])
        res = (ids[keep], scores[keep])
        if self.boost != 1.0:
            return res[0], res[1] * self.boost
        return res


class SpanFirst(_SpanQuery):
    def __init__(self, q: Query, limit: int = 0, boost: float = 1.0):
        self.q, self.limit, self.boost = q, limit, boost

    def _scoring_query(self):
        return self.q


class SpanNear2(_SpanQuery):
    def __init__(self, qs, slop: int = 1, ordered: bool = True,
                 mindist: int = 1, boost: float = 1.0):
        self.qs = list(qs)
        self.slop, self.ordered, self.mindist = slop, ordered, mindist
        self.boost = boost

    def _scoring_query(self):
        return And(list(self.qs))


class SpanNear(SpanNear2):
    """Classic binary SpanNear (reference spans.py:342-490): two
    subqueries, nested into trees for more — ``phrase`` builds the
    reference's balanced ``make_binary_tree`` shape.  Span combination
    is exactly one SpanNear2 chain step, so this is a construction
    shim over the same kernel."""

    def __init__(self, a: Query, b: Query, slop: int = 1,
                 ordered: bool = True, mindist: int = 1,
                 boost: float = 1.0):
        super().__init__([a, b], slop=slop, ordered=ordered,
                         mindist=mindist, boost=boost)
        self.a, self.b = a, b

    @classmethod
    def phrase(cls, fieldname: str, words, slop: int = 1,
               ordered: bool = True):
        """Balanced tree of SpanNear over the words (reference
        spans.py:424-443 + util.make_binary_tree)."""
        def build(ts):
            if len(ts) == 1:
                return ts[0]
            half = len(ts) // 2
            return cls(build(ts[:half]), build(ts[half:]),
                       slop=slop, ordered=ordered)

        return build([Term(fieldname, w) for w in words])


class SpanOr(_SpanQuery):
    def __init__(self, subqs, boost: float = 1.0):
        self.subqs = list(subqs)
        self.boost = boost

    def _scoring_query(self):
        return Or(list(self.subqs))


class SpanNot(_SpanQuery):
    """Spans of a that do NOT overlap spans of b; scored AndMaybe(a, b)."""

    def __init__(self, a: Query, b: Query, boost: float = 1.0):
        self.a, self.b, self.boost = a, b, boost

    def _scoring_query(self):
        return AndMaybe(self.a, self.b)


class SpanContains(_SpanQuery):
    def __init__(self, a: Query, b: Query, boost: float = 1.0):
        self.a, self.b, self.boost = a, b, boost

    def _scoring_query(self):
        return And([self.a, self.b])


class SpanBefore(_SpanQuery):
    def __init__(self, a: Query, b: Query, boost: float = 1.0):
        self.a, self.b, self.boost = a, b, boost

    def _scoring_query(self):
        return And([self.a, self.b])


class SpanCondition(_SpanQuery):
    def __init__(self, a: Query, b: Query, boost: float = 1.0):
        self.a, self.b, self.boost = a, b, boost

    def _scoring_query(self):
        return And([self.a, self.b])
