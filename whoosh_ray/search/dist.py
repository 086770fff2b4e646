"""Distributed query execution over the segment partitions.

Two Ray-native shapes (SURVEY.md §2.6 MultiMatcher / §4 mapping):

1. ``batch_search`` — query *throughput*: the query set is a Ray Dataset
   and an actor pool of ``QueryWorker``s (each holding a lazily-loaded
   Searcher over the whole index — per-actor state built once in
   ``__init__``, the reference's open-reader caching) evaluates query
   batches in parallel.  Scales with CPUs; each worker touches only the
   posting blobs its queries need (parquet row-group pruned reads).

2. ``fanout_search`` — single-query *latency* over many segments: one
   long-lived ``SegmentShardActor`` per segment shard; phase 1 gathers
   per-shard term statistics (df / field lengths) which the driver merges
   into GLOBAL idf/avgfl (exactly the reference's parent-searcher stats,
   searching.py:285-316); phase 2 broadcasts the query + global stats and
   every shard returns its local top-k, merged with the (-score, docid)
   tie-break.  This is the MultiMatcher concatenation (wrappers.py:118-253)
   turned into a scatter-gather; exact for segment-decomposable queries
   (Term/And/Or/Phrase/expansions).  DisjunctionMax and AndNot — whose
   reference quirks leak across boundaries — fan out too, via a
   boundary-state handoff: shards are CONTIGUOUS docid ranges, each
   shard receives every leaf's first match in later shards (the doc an
   unchecked cursor would sit on at the boundary) for the cursor-max
   leak, and AndNot's first-doc-escape is resolved from the shards'
   reported local firsts.  NestedParent (sum or custom score_fn,
   reduced driver-side) fans out with a last-parent handoff so blocks
   spanning shard boundaries aggregate correctly, and NestedChildren
   with an open-range count per shard edge (duplicate-emission quirk
   preserved).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from whoosh_ray.search import scoring
from whoosh_ray.search.query import (AndNot, DisjunctionMax, Not, Query,
                                     _Compound)
from whoosh_ray.search.searcher import Results, Searcher


class QueryWorker:
    """map_batches actor: evaluates a batch of queries against the index.
    ``fblob``/``mblob`` are roaring id-set blobs shared by every query
    of the run — deserialized ONCE here in ``__init__`` (per actor),
    never per batch."""

    def __init__(self, index_dir: str, fblob: bytes | None = None,
                 mblob: bytes | None = None):
        from whoosh_ray.functions.idsets import RoaringIdSet

        self.searcher = Searcher(index_dir)
        self.allow = (RoaringIdSet.from_bytes(fblob)
                      if fblob is not None else None)
        self.deny = (RoaringIdSet.from_bytes(mblob)
                     if mblob is not None else None)
        import pickle

        self._loads = pickle.loads

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docids, scores = [], [], [], []
        for qid, qblob, limit in zip(batch["query_id"].to_pylist(),
                                     batch["query_pickle"].to_pylist(),
                                     batch["limit"].to_pylist()):
            q = self._loads(qblob)
            if self.allow is not None or self.deny is not None:
                # filter-then-limit needs the full match set before the
                # cut — same as the local FilterCollector path
                r = self.searcher.search(q, limit=limit,
                                         filter=self.allow,
                                         mask=self.deny)
            else:
                # pruned top-k where the query shape supports it
                # (identical results, asserted by tests); exhaustive
                # otherwise
                r = self.searcher.search_topk(q, limit=limit)
            n = len(r.docids)
            qids.extend([qid] * n)
            ranks.extend(range(n))
            docids.extend(r.docids.tolist())
            scores.extend(r.scores.tolist())
        return pa.table({
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "docid": pa.array(docids, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        })


def _set_blob(obj) -> bytes | None:
    """Coerce a filter/mask argument (RoaringIdSet, DocIdSet, iterable)
    to a roaring blob ready to ship through an actor constructor."""
    from whoosh_ray.functions.idsets import RoaringIdSet

    if obj is None:
        return None
    if isinstance(obj, RoaringIdSet):
        return obj.to_bytes()
    arr = (obj.to_array() if hasattr(obj, "to_array")
           else np.asarray(sorted(int(d) for d in obj), dtype=np.int64))
    return RoaringIdSet(arr).to_bytes()


def _index_fingerprint(index_dir: str):
    """Cheap staleness token for a cached query pool: the manifest's
    monotonic generation counter PLUS the stat signature of every
    tombstone file — deletes.json writes deliberately do not bump the
    generation (state/manifest.py), so a pool serving an index that was
    just delete_by_term'd must still be rebuilt."""
    import json as _json

    mpath = os.path.join(index_dir, "manifest.json")
    try:
        with open(mpath) as f:
            gen = _json.load(f).get("settings", {}).get("generation")
        if gen is None:
            gen = os.path.getmtime(mpath)
    except (OSError, ValueError):
        gen = -1
    dels = []
    try:
        with os.scandir(os.path.join(index_dir, "segments")) as it:
            for e in it:
                try:
                    st = os.stat(os.path.join(e.path, "deletes.json"))
                    dels.append((e.name, st.st_mtime_ns, st.st_size))
                except OSError:
                    pass
    except OSError:
        pass
    return gen, tuple(sorted(dels))


# {(index_dir, concurrency, fblob, mblob): (job_id, fingerprint, pool)}
# — AT MOST ONE entry (latest key wins): idle cached pools must not
# accumulate actor processes across an application's lifetime
_POOL_CACHE: dict = {}


def clear_pool_cache() -> None:
    """Shut down and forget every cached batch_search pool."""
    for _, _, pool in _POOL_CACHE.values():
        try:
            pool.shutdown()
        except Exception:
            pass
    _POOL_CACHE.clear()


def batch_search(index_dir: str, queries: list[Query], limit: int = 10,
                 concurrency: int = 4, *, filter=None, mask=None,
                 reuse_pool: bool = True) -> pa.Table:
    """Evaluate many queries in parallel; returns
    (query_id, rank, docid, score) for all queries.  ``filter``/``mask``
    (DocIdSets or id iterables, applied to every query) ship as roaring
    blobs through the actor constructor — one deserialize per actor.

    The actor pool is PERSISTENT by default: repeated calls against the
    same (index_dir, concurrency, filter, mask) reuse the same warm
    ``QueryPool`` (steady-state cost = query evaluation + one round trip
    per actor), rebuilt automatically when the index mutates (manifest
    generation or tombstones change) or the Ray session restarts.  Pass
    ``reuse_pool=False`` to pay a fresh pool and release it on return."""
    fblob, mblob = _set_blob(filter), _set_blob(mask)
    if not reuse_pool:
        with QueryPool(index_dir, concurrency, filter=filter,
                       mask=mask) as pool:
            return pool.search_batch(queries, limit)
    key = (index_dir, max(1, concurrency), fblob, mblob)
    job_id = ray.get_runtime_context().get_job_id()
    fp = _index_fingerprint(index_dir)
    ent = _POOL_CACHE.get(key)
    pool = None
    if ent is not None:
        if ent[0] == job_id and ent[1] == fp:
            pool = ent[2]
            try:
                ray.get([a.ping.remote() for a in pool.actors], timeout=60)
            except Exception:
                pool = None
        elif ent[0] == job_id:
            # same session, stale index state: release the old actors
            try:
                ent[2].shutdown()
            except Exception:
                pass
    if pool is None:
        # latest key wins: a different (index, filter) evicts the old
        # pool so idle cached actors never accumulate
        for k in list(_POOL_CACHE):
            if k != key:
                try:
                    _POOL_CACHE.pop(k)[2].shutdown()
                except Exception:
                    pass
        pool = QueryPool(index_dir, concurrency, filter=filter, mask=mask)
        _POOL_CACHE[key] = (job_id, fp, pool)
    return pool.search_batch(queries, limit)


class QueryPool:
    """PERSISTENT query-actor pool — the steady-state serving shape.

    ``batch_search`` pays a fresh actor pool per call (worker process
    fork + import chain + Searcher init), which is fine for one-shot
    batch jobs but wrong for a long-lived query service.  QueryPool
    creates the ``QueryWorker`` actors ONCE (same worker class, same
    per-actor state) and reuses them across ``search_batch`` calls, so
    a call costs only query evaluation + one round trip per actor.
    Construction blocks until every actor is warm (a ping round)."""

    def __init__(self, index_dir: str, concurrency: int = 4, *,
                 filter=None, mask=None):
        import pickle

        self._pickle = pickle
        # num_cpus=0: a query pool is a SERVING construct that coexists
        # with data-plane jobs.  Reserving logical CPU slots for actors
        # that are idle between batches starves Ray Data tasks outright
        # once pool size reaches the cluster budget (a 4-actor pool on a
        # 4-CPU dev session deadlocks the next map_batches forever) — on
        # a production cluster a serving pool gets dedicated capacity
        # via placement groups / custom resources instead, so the
        # data-plane accounting is not the right ledger for it here.
        Actor = ray.remote(num_cpus=0)(_PoolWorker)
        self.actors = [Actor.remote(index_dir, _set_blob(filter),
                                    _set_blob(mask))
                       for _ in range(max(1, concurrency))]
        # warm barrier; the timeout turns a scheduling deadlock (e.g. a
        # resource-starved cluster) into a diagnosable error
        try:
            ray.get([a.ping.remote() for a in self.actors], timeout=600)
        except ray.exceptions.GetTimeoutError:
            self.shutdown()
            raise RuntimeError(
                "QueryPool warm-up timed out — the cluster could not "
                "schedule the pool actors within 600s") from None

    def search_batch(self, queries: list[Query],
                     limit: int = 10) -> pa.Table:
        k = len(self.actors)
        chunks: list[list] = [[] for _ in range(k)]
        for i, q in enumerate(queries):
            chunks[i % k].append((i, self._pickle.dumps(q), limit))
        refs = [a.run.remote(c) for a, c in zip(self.actors, chunks) if c]
        parts = [t for t in ray.get(refs) if t.num_rows]
        out = (pa.concat_tables(parts) if parts
               else _empty_results_table())
        idx = np.lexsort((out["rank"].to_numpy(),
                          out["query_id"].to_numpy()))
        return out.take(pa.array(idx))

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()


def _empty_results_table() -> pa.Table:
    return pa.table({
        "query_id": pa.array([], type=pa.int64()),
        "rank": pa.array([], type=pa.int64()),
        "docid": pa.array([], type=pa.int64()),
        "score": pa.array([], type=pa.float64()),
    })


class _PoolWorker(QueryWorker):
    """QueryWorker with a direct (non-map_batches) entry point."""

    def ping(self) -> bool:
        return True

    def run(self, items: list[tuple[int, bytes, int]]) -> pa.Table:
        batch = pa.table({
            "query_id": pa.array([i for i, _, _ in items], type=pa.int64()),
            "query_pickle": pa.array([b for _, b, _ in items],
                                     type=pa.large_binary()),
            "limit": pa.array([m for _, _, m in items], type=pa.int64()),
        })
        return self(batch)


def _has_nondecomposable(q: Query) -> bool:
    from whoosh_ray.search.nested import NestedChildren, NestedParent

    if isinstance(q, (DisjunctionMax, AndNot, Not, NestedParent,
                      NestedChildren)):
        return True
    if isinstance(q, _Compound):
        return any(_has_nondecomposable(s) for s in q.subqueries)
    for attr in ("a", "b", "subquery"):
        s = getattr(q, attr, None)
        if isinstance(s, Query) and _has_nondecomposable(s):
            return True
    return False


@ray.remote
class SegmentShardActor:
    """Holds a shard of segments; serves term stats + per-shard top-k."""

    def __init__(self, index_dir: str, seg_ids: list[int]):
        from whoosh_ray.state.manifest import read_manifest
        from whoosh_ray.state.segment import SegmentReader

        manifest = read_manifest(index_dir)
        self.manifest = manifest
        by_id = {m.seg_id: m for m in manifest.segments}
        fb = manifest.settings.get("overlay_base")
        self.segments = [SegmentReader(index_dir, by_id[s], manifest.schema,
                                       fallback_dir=fb)
                         for s in seg_ids]

    def term_stats(self, terms: list[tuple[str, str]]) -> dict:
        out = {}
        for f, t in terms:
            df = 0
            maxw = 0.0
            minlen = 255
            for seg in self.segments:
                ti = seg.term_info(f, t)
                if ti:
                    df += ti["df"]
                    maxw = max(maxw, ti["max_weight"])
                    minlen = min(minlen, ti["min_length"])
            if df:
                out[(f, t)] = {"df": df, "max_weight": maxw,
                               "min_length": minlen}
        return out

    def expand(self, fieldname: str, prefix_lo, hi, mode: str) -> list[str]:
        out = set()
        for seg in self.segments:
            if mode == "prefix":
                out.update(seg.expand_prefix(fieldname, prefix_lo))
            else:
                out.update(seg.all_terms(fieldname))
        return sorted(out)

    def _concat_eval(self, s, q):
        parts_i, parts_s = [], []
        for seg in self.segments:
            ids, sc = s.eval(q, seg)
            if len(ids):
                parts_i.append(ids)
                parts_s.append(sc)
        if not parts_i:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        return np.concatenate(parts_i), np.concatenate(parts_s)

    def topk(self, qblob: bytes, stats: dict, limit: int,
             fblob: bytes | None = None, mblob: bytes | None = None):
        """Phase 2: evaluate with driver-merged global stats.
        ``fblob``/``mblob`` are roaring id-set blobs (broadcast ONCE
        via ray.put, auto-dereferenced here) applied BEFORE the local
        top-k cut so filter-then-limit matches the global order."""
        import pickle

        from whoosh_ray.functions.idsets import RoaringIdSet

        q = pickle.loads(qblob)
        s = _ShardSearcher(self.manifest, self.segments, stats)
        ids, sc = self._concat_eval(s, q)
        if fblob is not None and len(ids):
            keep = RoaringIdSet.from_bytes(fblob).contains(ids)
            ids, sc = ids[keep], sc[keep]
        if mblob is not None and len(ids):
            keep = ~RoaringIdSet.from_bytes(mblob).contains(ids)
            ids, sc = ids[keep], sc[keep]
        if not len(ids):
            return ids, sc
        order = np.lexsort((ids, -sc))[:limit]
        return ids[order], sc[order]

    def subquery_heads(self, qblobs: list[bytes], stats: dict):
        """Phase 2a for DisjunctionMax: each subquery's FIRST local
        match (docid, score) — the boundary state later shards leak
        into earlier ones (binary.py:369-376's unchecked cursors)."""
        import pickle

        s = _ShardSearcher(self.manifest, self.segments, stats)
        # keep every unpickled query alive for the whole call: the eval
        # cache keys by id(q), and a freed object's address can be
        # reused by the next pickle.loads
        qs = [pickle.loads(qb) for qb in qblobs]
        out = []
        for q in qs:
            ids, sc = self._concat_eval(s, q)
            out.append((int(ids[0]), float(sc[0])) if len(ids) else None)
        return out

    def djm_topk(self, qblobs: list[bytes], stats: dict, extras: list,
                 boost: float, limit: int):
        """Phase 2b: cursor-max union with each leaf's next-match-after-
        this-shard appended, reproducing the reference's cross-boundary
        cursor leak exactly; results clipped back to this shard's docid
        range."""
        import pickle

        from whoosh_ray.search import matching

        s = _ShardSearcher(self.manifest, self.segments, stats)
        qs = [pickle.loads(qb) for qb in qblobs]  # hold refs: id(q) cache
        parts = []
        for q, extra in zip(qs, extras):
            ids, sc = self._concat_eval(s, q)
            if extra is not None:
                ids = np.concatenate((ids, [np.int64(extra[0])]))
                sc = np.concatenate((sc, [np.float64(extra[1])]))
            parts.append((ids, sc))
        uids, out = matching.union_max_cursor(parts)
        if not len(uids):
            return uids, out
        lo = min(seg.meta.docid_range()[0] for seg in self.segments)
        hi = max(seg.meta.docid_range()[1] for seg in self.segments)
        keep = (uids >= lo) & (uids < hi)
        uids, out = uids[keep], out[keep]
        if boost != 1.0:
            out = out * boost
        order = np.lexsort((uids, -out))[:limit]
        return uids[order], out[order]

    def last_parent(self, pblob: bytes, stats: dict):
        """Boundary state for NestedParent: this shard's LAST matching
        parent docid (None if no parent matches here)."""
        import pickle

        s = _ShardSearcher(self.manifest, self.segments, stats)
        qp = pickle.loads(pblob)
        p_ids, _ = self._concat_eval(s, qp)
        return int(p_ids[-1]) if len(p_ids) else None

    def nested_parent_partial(self, pblob: bytes, cblob: bytes,
                              stats: dict, prev_parent,
                              per_parent_limit):
        """Per-shard NestedParent partials: each resident child is
        credited to the closest parent docid <= it — including
        ``prev_parent``, the last parent in EARLIER shards, so blocks
        spanning the boundary aggregate correctly.  Returns
        (parent_ids, flat child scores in docid order, offsets); child
        lists are truncated to ``per_parent_limit`` locally (the driver
        re-applies the GLOBAL rank cut when combining shards)."""
        import pickle

        s = _ShardSearcher(self.manifest, self.segments, stats)
        qp, qc = pickle.loads(pblob), pickle.loads(cblob)
        p_ids, _ = self._concat_eval(s, qp)
        c_ids, c_scores = self._concat_eval(s, qc)
        if prev_parent is not None:
            p_ids = np.concatenate(([np.int64(prev_parent)], p_ids))
        if not len(p_ids) or not len(c_ids):
            return (np.empty(0, dtype=np.int64), np.empty(0),
                    np.zeros(1, dtype=np.int64))
        pos = np.searchsorted(p_ids, c_ids, side="right") - 1
        valid = pos >= 0
        pos, c_scores = pos[valid], c_scores[valid]
        if not len(pos):
            return (np.empty(0, dtype=np.int64), np.empty(0),
                    np.zeros(1, dtype=np.int64))
        change = np.empty(len(pos), dtype=bool)
        change[0] = True
        change[1:] = pos[1:] != pos[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(pos))
        if per_parent_limit:
            keep_ends = np.minimum(ends, starts + per_parent_limit)
        else:
            keep_ends = ends
        parents = p_ids[pos[starts]]
        parts = [c_scores[s0:e0] for s0, e0 in zip(starts, keep_ends)]
        flat = np.concatenate(parts) if parts else np.empty(0)
        offsets = np.concatenate(
            ([0], np.cumsum([len(p) for p in parts])))
        return parents, flat, offsets

    def nested_children_info(self, pblob: bytes, cblob: bytes,
                             stats: dict):
        """Phase A for NestedChildren: (first_parent, has_parent,
        n_matches_after_last_parent, n_matches)."""
        import pickle

        s = _ShardSearcher(self.manifest, self.segments, stats)
        qp, qc = pickle.loads(pblob), pickle.loads(cblob)
        p_ids, _ = self._concat_eval(s, qp)
        m_ids, _ = self._concat_eval(s, qc)
        first_p = int(p_ids[0]) if len(p_ids) else None
        if len(p_ids):
            # a range stays open past the shard edge iff NO local parent
            # lies strictly after the match — note >=: a match that IS
            # the last parent doc still opens (its closer is elsewhere)
            open_mask = m_ids >= p_ids[-1] if len(m_ids) else m_ids
        else:
            open_mask = np.ones(len(m_ids), dtype=bool)
        n_after = int(open_mask.sum()) if len(m_ids) else 0
        # open ranges whose lo lands EXACTLY on the next shard's first
        # docid: their closer is the first parent STRICTLY past it
        shard_hi = max(seg.meta.docid_range()[1] for seg in self.segments)
        n_edge = (int(((m_ids + 1 == shard_hi) & open_mask).sum())
                  if len(m_ids) else 0)
        return first_p, bool(len(p_ids)), n_after, n_edge

    def nested_children_emit(self, pblob: bytes, cblob: bytes,
                             stats: dict, k_in: int, k_edge: int,
                             boost: float, limit):
        """Phase B: emit this shard's child docs — ``k_in`` copies of
        the run from the shard start to its first parent (ranges opened
        by earlier shards' matches), plus each local match's run up to
        the next local parent, clipped at the shard end (the remainder
        continues in later shards via their ``k_in``).  Duplicate
        emission for overlapping ranges is the reference's own quirk
        and is preserved."""
        import pickle

        s = _ShardSearcher(self.manifest, self.segments, stats)
        qp, qc = pickle.loads(pblob), pickle.loads(cblob)
        p_ids, _ = self._concat_eval(s, qp)
        m_ids, _ = self._concat_eval(s, qc)
        all_parts = [seg.all_docids() for seg in self.segments]
        all_ids = (np.concatenate(all_parts) if all_parts
                   else np.empty(0, dtype=np.int64))
        shard_hi = (max(seg.meta.docid_range()[1]
                        for seg in self.segments))
        shard_lo = min(seg.meta.docid_range()[0] for seg in self.segments)
        out = []
        # inherited open ranges end at this shard's first parent —
        # except ranges whose lo IS the shard start (k_edge of them): a
        # parent sitting exactly at the boundary doc is still a child
        # for those, so their closer is the first parent strictly past
        # shard_lo
        if k_in > 0 and len(all_ids):
            p_first = int(p_ids[0]) if len(p_ids) else shard_hi
            run = all_ids[: np.searchsorted(all_ids, p_first)]
            j = np.searchsorted(p_ids, shard_lo, side="right")
            closer_strict = int(p_ids[j]) if j < len(p_ids) else shard_hi
            run_edge = all_ids[: np.searchsorted(all_ids, closer_strict)]
            out.extend([run] * (k_in - k_edge))
            out.extend([run_edge] * k_edge)
        for m in m_ids:
            lo = int(m) + 1
            j = np.searchsorted(p_ids, lo, side="right")
            hi = int(p_ids[j]) if j < len(p_ids) else shard_hi
            a = np.searchsorted(all_ids, lo)
            b = np.searchsorted(all_ids, hi)
            out.append(all_ids[a:b])
        if not out:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        ids = np.sort(np.concatenate(out))
        if limit is not None:
            ids = ids[:limit]
        return ids, np.full(len(ids), boost, dtype=np.float64)

    def andnot_local(self, ablob: bytes, bblob: bytes, stats: dict,
                     boost: float, limit: int):
        """AndNot per shard + the boundary state the first-doc-escape
        quirk needs: (top ids, top scores, first_a (docid, score) or
        None, first_b docid or None, first_a_excluded)."""
        import pickle

        from whoosh_ray.search import matching

        s = _ShardSearcher(self.manifest, self.segments, stats)
        qa, qb_ = pickle.loads(ablob), pickle.loads(bblob)  # hold refs
        a_ids, a_sc = self._concat_eval(s, qa)
        b_ids, _ = self._concat_eval(s, qb_)
        res_i, res_s = matching.diff((a_ids, a_sc), b_ids)
        if boost != 1.0:
            res_s = res_s * boost
        first_a = ((int(a_ids[0]), float(a_sc[0]) * boost)
                   if len(a_ids) else None)
        first_b = int(b_ids[0]) if len(b_ids) else None
        excluded = bool(len(a_ids) and (not len(res_i)
                                        or int(res_i[0]) != int(a_ids[0])))
        order = np.lexsort((res_i, -res_s))[:limit]
        return res_i[order], res_s[order], first_a, first_b, excluded


class _ShardSearcher(Searcher):
    """Searcher facade for a shard: global stats are injected, segments
    are the shard's only."""

    def __init__(self, manifest, segments, injected_stats: dict):
        self.index_dir = ""
        self.manifest = manifest
        self.schema = manifest.schema
        self.weighting = scoring.BM25F()
        self.segments = segments
        self._injected = injected_stats
        self._ti_cache = {}
        self._idf_cache = {}
        self._scorer_cache = {}
        self._eval_cache = {}
        self._global_cache = {}
        self._all_docids = None

    def global_term_info(self, fieldname, text):
        st = self._injected.get((fieldname, text))
        if st is None:
            return None
        return {"df": st["df"], "max_weight": st["max_weight"],
                "min_length": st["min_length"], "sum_tf": 0,
                "total_weight": 0.0, "max_length": 255,
                "min_docid": 0, "max_docid": 0}


class FanoutSearcher:
    """Driver-side facade for scatter-gather search over shard actors."""

    def __init__(self, index_dir: str, num_shards: int = 4):
        from whoosh_ray.state.manifest import read_manifest

        self.index_dir = index_dir
        self.manifest = read_manifest(index_dir)
        # CONTIGUOUS docid-range shards (not strided): the boundary-state
        # handoff for DisjunctionMax/AndNot needs shards ordered by docid
        metas = sorted(self.manifest.segments,
                       key=lambda m: m.docid_range()[0])
        seg_ids = [m.seg_id for m in metas]
        k = max(1, min(num_shards, len(seg_ids)))
        size = -(-len(seg_ids) // k)
        shards = [seg_ids[i: i + size] for i in range(0, len(seg_ids), size)]
        self.actors = [SegmentShardActor.remote(index_dir, s) for s in shards]
        self._local = Searcher(index_dir)  # fallback for leaky operators

    def _merged_stats(self, terms) -> dict:
        # phase 1: merge per-shard term stats into global stats
        stats_parts = ray.get([a.term_stats.remote(terms)
                               for a in self.actors])
        merged: dict = {}
        for part in stats_parts:
            for key, st in part.items():
                if key in merged:
                    merged[key]["df"] += st["df"]
                    merged[key]["max_weight"] = max(merged[key]["max_weight"],
                                                    st["max_weight"])
                    merged[key]["min_length"] = min(merged[key]["min_length"],
                                                    st["min_length"])
                else:
                    merged[key] = dict(st)
        return merged

    def _finish(self, ids_list, sc_list, limit) -> Results:
        ids = (np.concatenate(ids_list) if ids_list
               else np.empty(0, np.int64))
        sc = np.concatenate(sc_list) if sc_list else np.empty(0)
        order = np.lexsort((ids, -sc))
        if limit is not None:
            order = order[:limit]
        return Results(self._local, ids[order], sc[order])

    def _as_roaring(self, obj):
        """Driver-side coercion of a filter/mask argument (query,
        Results, DocIdSet, iterable) to a roaring set ready for ONE
        ``ray.put`` broadcast."""
        from whoosh_ray.functions.idsets import RoaringIdSet

        resolved = self._local._as_docid_set(obj)
        return (resolved if isinstance(resolved, RoaringIdSet)
                else RoaringIdSet(np.asarray(resolved, dtype=np.int64)
                                  if not hasattr(resolved, "to_array")
                                  else resolved.to_array()))

    def search(self, q: Query, limit: int = 10, *,
               filter=None, mask=None) -> Results:
        """``filter``/``mask`` ship to the shards as roaring blobs —
        ``ray.put`` once, dereferenced in every actor call — and are
        applied shard-side BEFORE the local top-k cut (the scale path).
        The quirk fan-outs (DisjunctionMax / AndNot / Nested) compute
        boundary state from the UNFILTERED stream, so for them the
        shards return their full result sets and the driver applies
        the sets before the rank cut — correct, but driver-sized in
        the match count; prefer plain queries for huge filtered
        scans."""
        import pickle

        allow = self._as_roaring(filter) if filter is not None else None
        deny = self._as_roaring(mask) if mask is not None else None
        filtered = allow is not None or deny is not None
        inner_limit = None if filtered else limit

        def _cut(res: Results) -> Results:
            if not filtered:
                return res
            ids, sc = res.docids, res.scores
            if allow is not None and len(ids):
                keep = allow.contains(ids)
                ids, sc = ids[keep], sc[keep]
            if deny is not None and len(ids):
                keep = ~deny.contains(ids)
                ids, sc = ids[keep], sc[keep]
            if limit is not None:
                ids, sc = ids[:limit], sc[:limit]
            return Results(self._local, ids, sc)

        q = q.expansion_queries(self._local)[0]
        if (isinstance(q, DisjunctionMax) and q.subqueries
                and not any(_has_nondecomposable(s) for s in q.subqueries)):
            return _cut(self._djm_fanout(q, inner_limit))
        if (isinstance(q, AndNot)
                and not _has_nondecomposable(q.a)
                and not _has_nondecomposable(q.b)):
            return _cut(self._andnot_fanout(q, inner_limit))
        from whoosh_ray.search.nested import NestedChildren, NestedParent

        if (isinstance(q, NestedParent)
                and not _has_nondecomposable(q.parents)
                and not _has_nondecomposable(q.child)):
            return _cut(self._nested_parent_fanout(q, inner_limit))
        if (isinstance(q, NestedChildren)
                and not _has_nondecomposable(q.parents)
                and not _has_nondecomposable(q.child)):
            return _cut(self._nested_children_fanout(q, inner_limit))
        if _has_nondecomposable(q):
            return self._local.search(q, limit, filter=allow, mask=deny)
        merged = self._merged_stats(q.terms())
        # phase 2: broadcast query + stats + set blobs (ray.put once —
        # actors deref the same object, nothing re-ships per call),
        # gather per-shard FILTERED top-k
        qblob = pickle.dumps(q)
        fref = ray.put(allow.to_bytes()) if allow is not None else None
        mref = ray.put(deny.to_bytes()) if deny is not None else None
        tops = ray.get([a.topk.remote(qblob, merged, limit, fref, mref)
                        for a in self.actors])
        return self._finish([t[0] for t in tops], [t[1] for t in tops],
                            limit)

    def _djm_fanout(self, q, limit) -> Results:
        """Distributed DisjunctionMax with the reference's cursor-leak
        quirk preserved across shard boundaries: each shard receives,
        per leaf, the leaf's first match in LATER shards (phase 2a
        heads), which is exactly the state an unchecked cursor would
        sit on at the boundary."""
        import pickle

        qblobs = [pickle.dumps(s) for s in q.subqueries]
        merged = self._merged_stats(q.terms())
        heads = ray.get([a.subquery_heads.remote(qblobs, merged)
                         for a in self.actors])
        n, nleaf = len(self.actors), len(qblobs)
        extras = [[None] * nleaf for _ in range(n)]
        nxt: list = [None] * nleaf
        for s_idx in range(n - 1, -1, -1):
            extras[s_idx] = list(nxt)
            for li in range(nleaf):
                if heads[s_idx][li] is not None:
                    nxt[li] = heads[s_idx][li]
        tops = ray.get([
            a.djm_topk.remote(qblobs, merged, extras[i], q.boost, limit)
            for i, a in enumerate(self.actors)])
        return self._finish([t[0] for t in tops], [t[1] for t in tops],
                            limit)

    def _nested_parent_fanout(self, q, limit) -> Results:
        """Distributed NestedParent: shards report per-parent ordered
        child-score lists (credited through the last-parent boundary
        state), the driver concatenates each parent's lists in shard
        order, applies the global per_parent_limit rank cut, and
        reduces — sum by default, or the user's ``score_fn`` over the
        docid-ordered child-score list (reference nested.py:128-145
        combines child scores the same way).  Partitioning assumption:
        an arbitrary score_fn needs EVERY child score of a parent, so
        the per-parent lists are driver-sized; per_parent_limit bounds
        them when set."""
        import pickle

        pblob = pickle.dumps(q.parents)
        cblob = pickle.dumps(q.child)
        merged = self._merged_stats(q.terms())
        lasts = ray.get([a.last_parent.remote(pblob, merged)
                         for a in self.actors])
        prev = [None] * len(self.actors)
        run = None
        for i in range(len(self.actors)):
            prev[i] = run
            if lasts[i] is not None:
                run = lasts[i]
        parts = ray.get([
            a.nested_parent_partial.remote(pblob, cblob, merged, prev[i],
                                           q.per_parent_limit)
            for i, a in enumerate(self.actors)])
        acc: dict[int, list] = {}
        for parents, flat, offsets in parts:  # shard (docid) order
            for j, p in enumerate(parents.tolist()):
                acc.setdefault(p, []).extend(
                    flat[offsets[j]: offsets[j + 1]].tolist())
        if not acc:
            return Results(self._local, np.empty(0, dtype=np.int64),
                           np.empty(0, dtype=np.float64))
        lim = q.per_parent_limit
        ids = np.array(sorted(acc), dtype=np.int64)
        reduce = q.score_fn if q.score_fn is not None else sum
        sc = np.array([reduce(acc[p][:lim] if lim else acc[p])
                       for p in ids.tolist()])
        return self._finish([ids], [sc], limit)

    def _nested_children_fanout(self, q, limit) -> Results:
        """Distributed NestedChildren: the boundary state is the COUNT
        of ranges still open at each shard edge (a match with no parent
        before the edge keeps emitting into the next shard) — shards
        emit that many copies of their head run, preserving the
        reference's duplicate-emission quirk."""
        import pickle

        pblob = pickle.dumps(q.parents)
        cblob = pickle.dumps(q.child)
        merged = self._merged_stats(q.terms())
        infos = ray.get([a.nested_children_info.remote(pblob, cblob,
                                                       merged)
                         for a in self.actors])
        k_in = [0] * len(self.actors)
        k_edge = [0] * len(self.actors)
        for i in range(1, len(self.actors)):
            _fp, has_p, n_after, n_edge = infos[i - 1]
            k_in[i] = n_after + (k_in[i - 1] if not has_p else 0)
            # edge ranges only ever come from the immediately previous
            # shard (an inherited range's lo predates that boundary)
            k_edge[i] = n_edge
        outs = ray.get([
            a.nested_children_emit.remote(pblob, cblob, merged, k_in[i],
                                          k_edge[i], q.boost, limit)
            for i, a in enumerate(self.actors)])
        return self._finish([o[0] for o in outs], [o[1] for o in outs],
                            limit)

    def _andnot_fanout(self, q, limit) -> Results:
        """Distributed AndNot preserving the first-doc-escape quirk:
        shards report their local firsts; the docid-ordered first
        becomes the global first, and its owner's exclusion flag decides
        whether the escaped doc is re-added."""
        import pickle

        terms = q.terms()
        merged = self._merged_stats(terms)
        outs = ray.get([
            a.andnot_local.remote(pickle.dumps(q.a), pickle.dumps(q.b),
                                  merged, q.boost, limit)
            for a in self.actors])
        ids_list = [o[0] for o in outs]
        sc_list = [o[1] for o in outs]
        first_a = next((o[2] for o in outs if o[2] is not None), None)
        first_b = next((o[3] for o in outs if o[3] is not None), None)
        excluded = next((o[4] for o in outs if o[2] is not None), False)
        if (first_a is not None and first_b is not None
                and first_a[0] != first_b and excluded):
            ids_list = [np.array([first_a[0]], dtype=np.int64)] + ids_list
            sc_list = [np.array([first_a[1]])] + sc_list
        return self._finish(ids_list, sc_list, limit)
