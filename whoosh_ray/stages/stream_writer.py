"""Streaming segment build: direct actor routing instead of a sort shuffle.

The fused build's ``groupby("seg")`` is a sort-based all-to-all with a
barrier: no segment encode can start until every input block has been
read and sort-mapped, and the last reduce wave straggles.  This mode
replaces the exchange with explicit routing (the custom-operator
pattern (b) — an actor-pool stage holding per-segment state):

- the MAP task pool tokenizes each batch once (vectorized analyzers,
  exactly ``TokenizePostings``) and slices the posting table + stored
  rows by segment owner, handing each slice to its owner actor
  (``owner = seg % n_actors``) with a blocking ``ray.get`` (natural
  backpressure: a slow owner throttles its feeders);
- each **SegmentBufferActor** just appends the slices to per-segment
  buffers (cheap — the heavy tokenize already happened in the map pool,
  so ingest parallelism is the task pool, not the actor count), and
  spills a segment's buffer to a coalesced parquet part file once it
  crosses ``spill_bytes`` (the buffered map-side spill from BASELINE.md:
  big sequential writes, never one tiny file per batch);
- after the input is fully consumed the driver calls ``finalize()`` on
  every actor in parallel: per owned segment, concat buffers (+ spilled
  parts), re-establish strict (field, term, docid) order, batch-encode
  posting blobs (reusing ``EncodeSegmentTerms``) and write
  terms.parquet + docs.parquet atomically.

Why it scales: bytes cross the wire exactly once (map → owner), there
is no global barrier (tokenize overlaps the read from the first block),
a hot term is still salted by the docid-range segment key, and actor
memory is bounded by ``spill_bytes`` per segment.  Fault unit: a lost
actor loses only its uncommitted segments — a re-run resumes past every
committed segment exactly like the fused path (same lineage commits).

Exactly-once: a re-executed map task would re-add slices it already
delivered, so ``finalize`` drops duplicate (field, term, docid) posting
rows and duplicate stored docids before encoding (both exact — the
payloads of duplicates are identical by construction).
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from whoosh_ray.state.manifest import seg_dirname
from whoosh_ray.state.schema import IndexSchema
from whoosh_ray.stages.tokenize import TokenizePostings
from whoosh_ray.stages.write_seg import EncodeSegmentTerms, _atomic_emit


def _slice_by_seg(table: pa.Table, segs: np.ndarray) -> list[tuple[int, pa.Table]]:
    """Split a table into per-segment zero-copy slices.  ``segs`` must be
    the table's seg values; rows are sorted by seg first (stable)."""
    if table.num_rows == 0:
        return []
    order = np.argsort(segs, kind="stable")
    if not np.array_equal(order, np.arange(len(order))):
        table = table.take(pa.array(order))
        segs = segs[order]
    bounds = np.flatnonzero(np.diff(segs)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(segs)]))
    return [(int(segs[s]), table.slice(s, e - s)) for s, e in zip(starts, ends)]


class SegmentBufferActor:
    """Owns ``seg % n_actors == idx`` segments: buffers slices, spills
    coalesced parts past the threshold, encodes + commits at finalize."""

    def __init__(self, index_dir: str, schema_json: dict,
                 spill_bytes: int = 64 * 1024 * 1024):
        self.index_dir = index_dir
        self.schema = IndexSchema.from_json(schema_json)
        self.enc = EncodeSegmentTerms(index_dir, self.schema)
        self.spill_bytes = spill_bytes
        self.post_buf: dict[int, list[pa.Table]] = {}
        self.doc_buf: dict[int, list[pa.Table]] = {}
        self.post_bytes: dict[int, int] = {}
        self.doc_bytes: dict[int, int] = {}
        self.spilled: set[int] = set()

    def _parts_dir(self, seg: int, kind: str) -> str:
        return os.path.join(self.index_dir, "segments", ".parts",
                            f"{kind}-{seg_dirname(seg)}")

    def _maybe_spill(self, seg: int, kind: str) -> None:
        buf, nbytes = ((self.post_buf, self.post_bytes) if kind == "post"
                       else (self.doc_buf, self.doc_bytes))
        if nbytes.get(seg, 0) < self.spill_bytes:
            return
        tables = buf.pop(seg, [])
        if not tables:
            return
        d = self._parts_dir(seg, kind)
        os.makedirs(d, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(d, "." + name)
        pq.write_table(pa.concat_tables(tables), tmp)
        os.replace(tmp, os.path.join(d, name))
        nbytes[seg] = 0
        self.spilled.add(seg)

    def add(self, post_slices: list[tuple[int, pa.Table]],
            doc_slices: list[tuple[int, pa.Table]]) -> int:
        n = 0
        for seg, t in post_slices:
            self.post_buf.setdefault(seg, []).append(t)
            self.post_bytes[seg] = self.post_bytes.get(seg, 0) + t.nbytes
            self._maybe_spill(seg, "post")
            n += t.num_rows
        for seg, t in doc_slices:
            self.doc_buf.setdefault(seg, []).append(t)
            self.doc_bytes[seg] = self.doc_bytes.get(seg, 0) + t.nbytes
            self._maybe_spill(seg, "doc")
        return n

    def _gather(self, seg: int, kind: str) -> pa.Table | None:
        buf = self.post_buf if kind == "post" else self.doc_buf
        tables = list(buf.pop(seg, []))
        d = self._parts_dir(seg, kind)
        if os.path.isdir(d):
            tables = [pq.read_table(os.path.join(d, f))
                      for f in sorted(os.listdir(d))
                      if f.endswith(".parquet")] + tables
        if not tables:
            return None
        return pa.concat_tables(tables)

    def finalize(self) -> list[dict]:
        import shutil

        from whoosh_ray.state.segment import (TERMS_ARROW_SCHEMA,
                                              write_docs_file,
                                              write_terms_file)

        out = []
        segs = sorted(set(self.post_buf) | set(self.doc_buf) | self.spilled)
        for seg in segs:
            t0 = time.time()
            post = self._gather(seg, "post")
            docs = self._gather(seg, "doc")
            if docs is None:
                continue
            # exact dedup of retried deliveries by docid
            ids = docs["docid"].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids_sorted = ids[order]
            keep = np.empty(len(ids_sorted), dtype=bool)
            if len(ids_sorted):
                keep[0] = True
                np.not_equal(ids_sorted[1:], ids_sorted[:-1], out=keep[1:])
            docs = docs.take(pa.array(order[keep]))
            _atomic_emit(self.index_dir, seg, "docs.parquet",
                         lambda tmp, d=docs: write_docs_file(tmp, d))
            t_docs = time.time() - t0

            if post is not None and post.num_rows:
                stats = self.enc(post, dedup=True)
                row = {c: stats[c][0].as_py() for c in stats.column_names}
            else:
                empty = pa.table({f.name: pa.array([], type=f.type)
                                  for f in TERMS_ARROW_SCHEMA})
                _atomic_emit(self.index_dir, seg, "terms.parquet",
                             lambda tmp, t=empty: write_terms_file(tmp, t))
                row = {"seg": seg, "n_terms": 0, "n_postings": 0,
                       "field_lengths": "{}", "terms_secs": 0.0}
            d = docs["docid"]
            row.update({
                "doc_count": docs.num_rows,
                "min_docid": int(d[0].as_py()),
                "max_docid": int(d[-1].as_py()),
                "docs_secs": t_docs,
            })
            out.append(row)
            for kind in ("post", "doc"):
                shutil.rmtree(self._parts_dir(seg, kind), ignore_errors=True)
        self.post_buf.clear()
        self.doc_buf.clear()
        return out


class StreamRouter(TokenizePostings):
    """map_batches callable: tokenize + route slices to owner actors."""

    def __init__(self, schema: IndexSchema, seg_size: int,
                 actors: list):
        super().__init__(schema, seg_size)
        self.actors = actors
        keep = {f.name for f in schema.fields if f.stored}
        keep.update(schema.stored_columns)
        self._stored = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        post = super().__call__(batch)
        segs_post = post["seg"].to_numpy() if post.num_rows else np.empty(0, np.int64)
        post_slices = _slice_by_seg(post, segs_post)

        stored_cols = ["docid"] + [c for c in batch.column_names
                                   if c in self._stored]
        docs = batch.select(stored_cols)
        segs_doc = (batch["docid"].to_numpy() // self.seg_size)
        doc_slices = _slice_by_seg(docs, segs_doc)

        k = len(self.actors)
        per_actor_post: list[list] = [[] for _ in range(k)]
        per_actor_doc: list[list] = [[] for _ in range(k)]
        for seg, t in post_slices:
            per_actor_post[seg % k].append((seg, t))
        for seg, t in doc_slices:
            per_actor_doc[seg % k].append((seg, t))
        refs = [self.actors[i].add.remote(per_actor_post[i], per_actor_doc[i])
                for i in range(k)
                if per_actor_post[i] or per_actor_doc[i]]
        # bytes handed across the map -> owner exchange (the stream
        # mode's entire inter-node traffic; evidence for BENCH/BASELINE)
        shipped = (sum(t.nbytes for _, t in post_slices)
                   + sum(t.nbytes for _, t in doc_slices))
        # blocking hand-off: backpressure + exactly-once-complete semantics
        total = sum(ray.get(refs)) if refs else 0
        return pa.table({"rows": pa.array([int(total)], type=pa.int64()),
                         "bytes": pa.array([int(shipped)], type=pa.int64())})


def build_stream(ds, index_dir: str, schema: IndexSchema, seg_size: int,
                 *, n_actors: int | None = None,
                 spill_bytes: int = 64 * 1024 * 1024,
                 tokenize_batch_size: int | None = None):
    """Run the streaming build over a docid-assigned dataset; returns a
    pandas stats frame shaped like the fused writer's output.

    Measured defaults (BASELINE.md §Round 4): block-sized tokenize
    batches (``batch_size=None``) fan each map call out to many owner
    actors at once, and ``ncpu // 2`` buffer actors leave the CPUs to
    the tokenize task pool — together they took the sf0.1 stream build
    from 19.5 s to ~4.4 s (vs fused 7.4 s in the same session).  More
    actors is NOT better: the buffers are I/O-light, and oversubscribing
    them starves the map pool that feeds them."""
    import pandas as pd

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    k = n_actors or max(4, ncpu // 2)
    Actor = ray.remote(num_cpus=0.05)(SegmentBufferActor)
    actors = [Actor.remote(index_dir, schema.to_json(), spill_bytes)
              for _ in range(k)]
    try:
        router = StreamRouter(schema, seg_size, actors)
        # tasks (not an actor pool): the router is stateless beyond the
        # compiled analyzers; the task pool soaks up every CPU not held
        # by the (near-free) buffer actors
        acct = ds.map_batches(router, batch_format="pyarrow",
                              batch_size=tokenize_batch_size).materialize()
        parts = ray.get([a.finalize.remote() for a in actors])
    finally:
        for a in actors:
            ray.kill(a)
    rows = [r for p in parts for r in p]
    cols = ["seg", "doc_count", "min_docid", "max_docid", "n_terms",
            "n_postings", "field_lengths", "docs_secs", "terms_secs"]
    df = pd.DataFrame(rows, columns=cols)
    try:
        df.attrs["exchange_bytes"] = int(
            acct.sum("bytes") if acct.count() else 0)
    except Exception:
        pass
    return df
