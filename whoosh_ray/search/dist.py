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
   (Term/And/Or/Phrase/expansions — not DisjunctionMax/AndNot whose
   reference quirks leak across segment boundaries; those route to the
   global path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from whoosh_ray.search import scoring
from whoosh_ray.search.query import (AndNot, DisjunctionMax, Not, Query,
                                     _Compound)
from whoosh_ray.search.searcher import Results, Searcher


class QueryWorker:
    """map_batches actor: evaluates a batch of queries against the index."""

    def __init__(self, index_dir: str):
        self.searcher = Searcher(index_dir)
        import pickle

        self._loads = pickle.loads

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docids, scores = [], [], [], []
        for qid, qblob, limit in zip(batch["query_id"].to_pylist(),
                                     batch["query_pickle"].to_pylist(),
                                     batch["limit"].to_pylist()):
            q = self._loads(qblob)
            # pruned top-k where the query shape supports it (identical
            # results, asserted by tests); exhaustive otherwise
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


def batch_search(index_dir: str, queries: list[Query], limit: int = 10,
                 concurrency: int = 4) -> pa.Table:
    """Evaluate many queries in parallel; returns
    (query_id, rank, docid, score) for all queries."""
    import pickle

    items = [{"query_id": i, "query_pickle": pickle.dumps(q), "limit": limit}
             for i, q in enumerate(queries)]
    ds = ray.data.from_items(items)
    out = ds.map_batches(QueryWorker, batch_format="pyarrow",
                         batch_size=max(1, len(items) // max(concurrency, 1)),
                         concurrency=concurrency,
                         fn_constructor_args=(index_dir,))
    return pa.Table.from_pandas(
        out.to_pandas().sort_values(["query_id", "rank"]),
        preserve_index=False)


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
        self.segments = [SegmentReader(index_dir, by_id[s], manifest.schema)
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

    def topk(self, qblob: bytes, stats: dict, limit: int):
        """Phase 2: evaluate with driver-merged global stats."""
        import pickle

        q = pickle.loads(qblob)
        s = _ShardSearcher(self.manifest, self.segments, stats)
        parts_i, parts_s = [], []
        for seg in self.segments:
            ids, sc = s.eval(q, seg)
            if len(ids):
                parts_i.append(ids)
                parts_s.append(sc)
        if not parts_i:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        ids = np.concatenate(parts_i)
        sc = np.concatenate(parts_s)
        order = np.lexsort((ids, -sc))[:limit]
        return ids[order], sc[order]


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
        seg_ids = sorted(m.seg_id for m in self.manifest.segments)
        shards = [seg_ids[i::num_shards] for i in range(num_shards)]
        shards = [s for s in shards if s]
        self.actors = [SegmentShardActor.remote(index_dir, s) for s in shards]
        self._local = Searcher(index_dir)  # fallback for leaky operators

    def search(self, q: Query, limit: int = 10) -> Results:
        import pickle

        if _has_nondecomposable(q):
            return self._local.search(q, limit)
        q = q.expansion_queries(self._local)[0]
        terms = q.terms()
        # phase 1: merge per-shard term stats into global stats
        stats_parts = ray.get([a.term_stats.remote(terms) for a in self.actors])
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
        # phase 2: broadcast query + stats, gather per-shard top-k
        qblob = pickle.dumps(q)
        tops = ray.get([a.topk.remote(qblob, merged, limit)
                        for a in self.actors])
        ids = np.concatenate([t[0] for t in tops]) if tops else np.empty(0, np.int64)
        sc = np.concatenate([t[1] for t in tops]) if tops else np.empty(0)
        order = np.lexsort((ids, -sc))
        if limit is not None:
            order = order[:limit]
        return Results(self._local, ids[order], sc[order])
