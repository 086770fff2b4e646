"""Vectorized matcher kernels over sorted (docid, score) arrays.

Each reference matcher is a pull-based iterator over one segment's posting
streams (/root/reference/src/whoosh/matching/*.py).  In a batch engine the
same relational operations are single numpy kernels over docid-sorted
arrays — the ArrayUnionMatcher idea (matching/combo.py:57-312) applied
everywhere:

- UnionMatcher (binary.py:118-297)        -> union_sum
- DisjunctionMaxMatcher (binary.py:300)   -> union_max
- IntersectionMatcher leapfrog (binary.py:408-563) -> intersect_sum
  (np.intersect1d is a sort-merge — the vectorized leapfrog)
- AndNotMatcher (binary.py:565-684)       -> diff
- RequireMatcher (wrappers.py:423-486)    -> require
- AndMaybeMatcher (binary.py:686-803)     -> and_maybe
- InverseMatcher (wrappers.py:332-421)    -> inverse
"""

from __future__ import annotations

import numpy as np

EMPTY_IDS = np.empty(0, dtype=np.int64)
EMPTY_SCORES = np.empty(0, dtype=np.float64)


def empty() -> tuple[np.ndarray, np.ndarray]:
    return EMPTY_IDS, EMPTY_SCORES


def union_sum(parts: list[tuple[np.ndarray, np.ndarray]]):
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return empty()
    if len(parts) == 1:
        return parts[0]
    ids = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    uids, inv = np.unique(ids, return_inverse=True)
    out = np.bincount(inv, weights=scores, minlength=len(uids))
    return uids, out


def union_max(parts: list[tuple[np.ndarray, np.ndarray]], tiebreak: float = 0.0):
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return empty()
    if len(parts) == 1:
        return parts[0]
    ids = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    uids, inv = np.unique(ids, return_inverse=True)
    out = np.full(len(uids), -np.inf)
    np.maximum.at(out, inv, scores)
    if tiebreak:
        sums = np.bincount(inv, weights=scores, minlength=len(uids))
        out = out + tiebreak * (sums - out)
    return uids, out


def union_max_cursor(parts: list[tuple[np.ndarray, np.ndarray]]):
    """DisjunctionMaxMatcher parity, including its cursor-leak quirk: the
    reference's ``score()`` takes ``max(a.score(), b.score())`` without
    checking that both sub-matchers sit on the *current* doc
    (binary.py:369-376), so a doc's score is the max over every leaf of the
    score at that leaf's first docid >= doc.  (The ``tiebreak`` parameter is
    stored but never used by the reference's score(), so it is ignored.)"""
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return empty()
    if len(parts) == 1:
        return parts[0]
    uids = np.unique(np.concatenate([p[0] for p in parts]))
    out = np.full(len(uids), -np.inf)
    for ids, scores in parts:
        pos = np.searchsorted(ids, uids)
        valid = pos < len(ids)
        cand = np.full(len(uids), -np.inf)
        cand[valid] = scores[pos[valid]]
        np.maximum(out, cand, out=out)
    return uids, out


def intersect_sum(parts: list[tuple[np.ndarray, np.ndarray]]):
    if not parts:
        return empty()
    ids, scores = parts[0]
    for nids, nscores in parts[1:]:
        common, ia, ib = np.intersect1d(ids, nids, assume_unique=True,
                                        return_indices=True)
        ids = common
        scores = scores[ia] + nscores[ib]
        if len(ids) == 0:
            return empty()
    return ids, scores


def diff(a: tuple[np.ndarray, np.ndarray], b_ids: np.ndarray):
    ids, scores = a
    if len(ids) == 0 or len(b_ids) == 0:
        return a
    keep = ~np.isin(ids, b_ids, assume_unique=True)
    return ids[keep], scores[keep]


def require(a: tuple[np.ndarray, np.ndarray], b_ids: np.ndarray):
    ids, scores = a
    if len(ids) == 0 or len(b_ids) == 0:
        return empty()
    keep = np.isin(ids, b_ids, assume_unique=True)
    return ids[keep], scores[keep]


def and_maybe(a: tuple[np.ndarray, np.ndarray], b: tuple[np.ndarray, np.ndarray]):
    ids, scores = a
    bids, bscores = b
    if len(ids) == 0 or len(bids) == 0:
        return a
    pos = np.searchsorted(bids, ids)
    pos_c = np.clip(pos, 0, len(bids) - 1)
    hit = bids[pos_c] == ids
    out = scores.copy()
    out[hit] += bscores[pos_c[hit]]
    return ids, out


def inverse(all_ids: np.ndarray, child_ids: np.ndarray, score: float = 1.0):
    if len(child_ids) == 0:
        ids = all_ids
    else:
        ids = all_ids[~np.isin(all_ids, child_ids, assume_unique=True)]
    return ids, np.full(len(ids), score, dtype=np.float64)
