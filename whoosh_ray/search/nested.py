"""Hierarchical (parent/child) queries over the docid order.

Reference: /root/reference/src/whoosh/query/nested.py — NestedParent
(:34-208): each child match is credited to the closest parent docid <=
the child's docid; the parent scores ``score_fn`` (sum) of its matching
children (the parent itself counts as its own child when it matches);
``per_parent_limit`` caps children considered per parent.
NestedChildren (:211-415): for each doc matched by ``subq``, return the
docs AFTER it up to the next parent (any parent), each scored ``boost``.

Vectorized: parents/children evaluate globally; the parent-of-child map
is one searchsorted over the sorted parent docid array, child-score
combination one bincount (sum) / reduceat.  The parent map spans
segment boundaries, so local evaluation is global-only — but the
distributed fan-out handles NestedParent (sum or custom score_fn,
reduced driver-side over per-shard child-score lists) with a
last-parent boundary handoff and NestedChildren with an open-range
count per shard edge (search/dist.py).
"""

from __future__ import annotations

import numpy as np

from whoosh_ray.search import matching
from whoosh_ray.search.query import Query


class NestedParent(Query):
    def __init__(self, parents: Query, subq: Query,
                 per_parent_limit: int | None = None, score_fn=None):
        self.parents = parents
        self.child = subq
        self.per_parent_limit = per_parent_limit
        self.score_fn = score_fn  # None == sum (vectorized fast path)
        self.boost = 1.0

    def terms(self):
        return self.parents.terms() + self.child.terms()

    def docs_scores(self, searcher, seg):
        raise NotImplementedError("NestedParent evaluates globally")

    def global_docs_scores(self, searcher):
        p_ids = searcher.global_eval(self.parents)[0]
        c_ids, c_scores = searcher.global_eval(self.child)
        if not len(p_ids) or not len(c_ids):
            return matching.empty()
        pos = np.searchsorted(p_ids, c_ids, side="right") - 1
        valid = pos >= 0  # children before the first parent have no parent
        pos, c_ids, c_scores = pos[valid], c_ids[valid], c_scores[valid]
        if not len(pos):
            return matching.empty()
        if self.per_parent_limit:
            # keep the first N children per parent (docid order)
            change = np.empty(len(pos), dtype=bool)
            change[0] = True
            change[1:] = pos[1:] != pos[:-1]
            starts = np.flatnonzero(change)
            rank = np.arange(len(pos)) - np.repeat(
                starts, np.diff(np.append(starts, len(pos))))
            keep = rank < self.per_parent_limit
            pos, c_scores = pos[keep], c_scores[keep]
        upar, inv = np.unique(pos, return_inverse=True)
        if self.score_fn is None:
            scores = np.bincount(inv, weights=c_scores,
                                 minlength=len(upar))
        else:
            scores = np.array([
                self.score_fn(list(c_scores[inv == i]))
                for i in range(len(upar))])
        return p_ids[upar], scores


class NestedChildren(Query):
    def __init__(self, parents: Query, subq: Query, boost: float = 1.0):
        self.parents = parents
        self.child = subq
        self.boost = boost

    def terms(self):
        return self.parents.terms() + self.child.terms()

    def docs_scores(self, searcher, seg):
        raise NotImplementedError("NestedChildren evaluates globally")

    def global_docs_scores(self, searcher):
        p_ids = searcher.global_eval(self.parents)[0]
        m_ids = searcher.global_eval(self.child)[0]
        all_ids = searcher.all_docids()
        if not len(m_ids):
            return matching.empty()
        out = []
        maxdoc = int(all_ids[-1]) + 1 if len(all_ids) else 0
        for m in m_ids:
            lo = int(m) + 1
            # reference: comb.after(nextchild) — first parent STRICTLY
            # greater, so a doc at lo is a child even if it is a parent
            j = np.searchsorted(p_ids, lo, side="right")
            hi = int(p_ids[j]) if j < len(p_ids) else maxdoc
            a = np.searchsorted(all_ids, lo)
            b = np.searchsorted(all_ids, hi)
            out.append(all_ids[a:b])
        if not out:
            return matching.empty()
        # bug-parity: the reference's matcher re-emits children reachable
        # from several consecutive subq matches (overlapping ranges are NOT
        # deduplicated), so results can contain duplicate docids
        ids = np.sort(np.concatenate(out))
        return ids, np.full(len(ids), self.boost, dtype=np.float64)
