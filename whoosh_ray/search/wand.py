"""Pruned top-k: block-max skipping + MaxScore term pruning.

Reference machinery being reproduced (batch-vectorized instead of
document-at-a-time):

- block quality = score(block_max_weight, block_min_length) and
  ``skip_to_quality`` skipping whole 128-posting blocks
  (/root/reference/src/whoosh/scoring.py:199-217, codec/whoosh3.py:1038-1051);
- the collector's growing ``minscore`` threshold from a bounded min-heap
  (collectors.py:376-420) — here the running k-th best accumulated score;
- ``matcher.replace(minquality)`` pruning exhausted/low-quality branches
  (matching/mcore.py:147-153) — here MaxScore-style term classification:
  terms are processed in descending max-quality order; once the remaining
  terms' summed max quality cannot beat the threshold, they stop
  producing NEW candidate docs and are only decoded for blocks that
  contain existing candidates (block-dir searchsorted → decode_blocks
  mask), which preserves exact scores for every surviving candidate.

Exactness: a doc seen only by pruned terms has score <= the pruned
suffix's summed max quality < threshold <= final k-th score, so the
returned top-k (docids AND scores, (-score, docid) order) is identical
to the exhaustive path — asserted by tests against both the exhaustive
evaluator and the whoosh oracle.
"""

from __future__ import annotations

import numpy as np

from whoosh_ray.functions.lengths import byte_to_length
from whoosh_ray.search import matching


def _block_qualities(scorer, blk_dir) -> np.ndarray:
    """Vectorized block quality for every block of a term in a segment."""
    maxw = blk_dir.max_weights.astype(np.float64) * scorer.boost
    fl = byte_to_length(blk_dir.min_len_bytes).astype(np.float64)
    B, K1 = scorer.B, scorer.K1
    return scorer.idf * ((maxw * (K1 + 1)) /
                         (maxw + K1 * ((1 - B) + B * fl / scorer.avgfl)))


def term_topk_segment(searcher, seg, fieldname: str, text: str, k: int,
                      threshold: float, boost: float = 1.0):
    """Single-term top-k within one segment with block-max skipping.

    Decodes blocks in descending quality order, stopping as soon as the
    next block's quality cannot beat the running k-th score (or the
    incoming ``threshold`` from other segments)."""
    from whoosh_ray.search.scoring import BM25FScorer

    reader = seg.blob_reader(fieldname, text)
    if reader is None:
        return matching.empty()
    scorer = searcher.scorer(fieldname, text)
    if not isinstance(scorer, BM25FScorer):
        p = reader.decode_all()
        scores = scorer.score_array(p.score_weights, p.len_bytes) * boost
        return p.docids, scores
    d = reader.dir
    quals = _block_qualities(scorer, d) * boost
    order = np.argsort(-quals, kind="stable")
    # phase 1: decode just enough best-quality blocks to have k candidates
    # (or every block whose quality beats the incoming threshold)
    mask = np.zeros(d.nblocks, dtype=bool)
    n_kept = 0
    for bi in order:
        if n_kept >= k and quals[bi] <= threshold:
            break
        if quals[bi] <= threshold and n_kept >= k:
            break
        mask[bi] = True
        n_kept += int(d.counts[bi])
        if n_kept >= k:
            break
    p = _apply_deletes(seg, reader.decode_blocks(mask))
    scores = scorer.score_array(p.score_weights, p.len_bytes) * boost
    # phase 2: the true k-th score bounds which remaining blocks matter
    if len(scores) >= k:
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        thr = max(threshold, float(kth))
    else:
        thr = threshold
    more = (quals > thr) & ~mask
    if more.any():
        p2 = _apply_deletes(seg, reader.decode_blocks(more))
        s2 = scorer.score_array(p2.score_weights, p2.len_bytes) * boost
        ids = np.concatenate([p.docids, p2.docids])
        sc = np.concatenate([scores, s2])
        o = np.argsort(ids, kind="stable")
        return ids[o], sc[o]
    return p.docids, scores


def _apply_deletes(seg, p):
    from whoosh_ray.state import codec

    if len(seg.deletes):
        keep = seg._mask_deleted(p.docids)
        if not keep.all():
            return codec.Postings(
                p.docids[keep], p.tfs[keep], p.len_bytes[keep],
                p.weights[keep] if p.weights is not None else None)
    return p


def _candidate_block_mask(blk_dir, cand_ids: np.ndarray) -> np.ndarray:
    """Blocks that may contain any of the (sorted) candidate docids."""
    last = blk_dir.last_docids
    first = np.concatenate(([0], last[:-1] + 1))  # lower bound of block range
    # block i covers (prev_last, last]; candidate c hits block i iff
    # searchsorted(last, c) == i
    pos = np.searchsorted(last, cand_ids)
    pos = pos[pos < len(last)]
    mask = np.zeros(len(last), dtype=bool)
    mask[np.unique(pos)] = True
    return mask


def or_terms_topk(searcher, terms: list[tuple[str, str, float]], k: int):
    """MaxScore top-k for Or-of-Terms across all segments.

    ``terms`` = [(field, text, boost)].  Returns (docids, scores) of the
    top-k candidate superset in docid order (caller applies the final
    (-score, docid) sort + limit); exact for the true top-k set."""
    infos = []
    for qpos, (f, t, b) in enumerate(terms):
        scorer = searcher.scorer(f, t)
        mq = scorer.max_quality() * b
        infos.append((mq, qpos, f, t, b, scorer))
    infos.sort(key=lambda x: -x[0])
    suffix = np.cumsum([0.0] + [x[0] for x in infos][::-1])[::-1]
    # suffix[i] = sum of max qualities of infos[i:]
    contribs: list[tuple[int, np.ndarray, np.ndarray]] = []
    ids = np.empty(0, dtype=np.int64)
    scores = np.empty(0, dtype=np.float64)
    thr = -np.inf
    for i, (mq, qpos, f, t, b, scorer) in enumerate(infos):
        prune_new = (mq + suffix[i + 1]) < thr and len(ids) >= k
        parts_ids, parts_sc = [], []
        for seg in searcher.segments:
            reader = seg.blob_reader(f, t)
            if reader is None:
                continue
            if prune_new and len(ids):
                base, end = seg.meta.docid_range()
                lo = np.searchsorted(ids, base)
                hi = np.searchsorted(ids, end)
                cand = ids[lo:hi]
                if not len(cand):
                    continue
                mask = _candidate_block_mask(reader.dir, cand)
                p = _apply_deletes(seg, reader.decode_blocks(mask))
            else:
                p = _apply_deletes(seg, reader.decode_all())
            s = scorer.score_array(p.score_weights, p.len_bytes) * b
            parts_ids.append(p.docids)
            parts_sc.append(s)
        if not parts_ids:
            continue
        t_ids = np.concatenate(parts_ids)
        t_sc = np.concatenate(parts_sc)
        if prune_new:
            keep = np.isin(t_ids, ids, assume_unique=True)
            t_ids, t_sc = t_ids[keep], t_sc[keep]
        contribs.append((qpos, t_ids, t_sc))
        # running accumulation only drives the pruning threshold
        ids, scores = matching.union_sum([(ids, scores), (t_ids, t_sc)])
        if len(scores) >= k:
            thr = np.partition(scores, len(scores) - k)[len(scores) - k]
    # final scores summed in ORIGINAL query order so float accumulation is
    # bit-identical to the exhaustive Or evaluation
    contribs.sort(key=lambda x: x[0])
    return matching.union_sum([(c[1], c[2]) for c in contribs])
