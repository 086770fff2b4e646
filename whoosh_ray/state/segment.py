"""Immutable segment: terms table + docs table under one directory.

Reference analogue: the W3 segment — terms file, postings file, per-doc
columns, assembled per commit (/root/reference/src/whoosh/codec/whoosh3.py:70-141,
W3Segment :1254-1296).  Here a segment covers one contiguous docid range
(the build partition) and is two Parquet files plus a lineage entry:

- ``terms.parquet`` — one row per (field, term), sorted by (field, term):
  TermInfo stats (df, total_weight, max_weight, min/max length-byte,
  min/max docid — reading.py:62-137) + the posting blob (codec.py) +
  optional positions blob.  Parquet row-group statistics on the sorted
  ``term`` column give block-range pruning for term lookups and prefix
  scans without loading the blobs.
- ``docs.parquet`` — one row per document, sorted by docid: stored fields
  (the reference's stored-field column, whoosh3.py:156-277).
- ``meta.json`` — lineage + metrics (manifest.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from whoosh_ray.state import codec
from whoosh_ray.state.manifest import SegmentMeta, seg_dirname
from whoosh_ray.state.schema import IndexSchema

TERM_STAT_COLS = [
    "field", "term", "df", "sum_tf", "total_weight", "max_weight",
    "min_length", "max_length", "min_docid", "max_docid",
]

TERMS_ARROW_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("sum_tf", pa.int64()),
        ("total_weight", pa.float64()),
        ("max_weight", pa.float32()),
        ("min_length", pa.uint8()),
        ("max_length", pa.uint8()),
        ("min_docid", pa.int64()),
        ("max_docid", pa.int64()),
        ("postings", pa.large_binary()),
        ("positions", pa.large_binary()),
    ]
)


class SegmentReader:
    """Reads one segment's terms/postings/stored docs.

    Cheap to construct; loads the stats columns (no blobs) lazily and keeps
    them cached — this is the per-actor state of query actor pools.
    """

    def __init__(self, index_dir: str, meta: SegmentMeta, schema: IndexSchema):
        self.meta = meta
        self.schema = schema
        self.dir = os.path.join(index_dir, "segments", seg_dirname(meta.seg_id))
        self._terms_path = os.path.join(self.dir, "terms.parquet")
        self._docs_path = os.path.join(self.dir, "docs.parquet")
        self._stats: pa.Table | None = None
        self._blob_cache: dict[tuple[str, str], tuple[bytes, bytes | None]] = {}
        self._deletes: np.ndarray | None = None  # sorted tombstoned docids

    @property
    def deletes(self) -> np.ndarray:
        """Per-segment tombstone set (reference: per-segment deleted docnum
        sets pickled with the segment, whoosh3.py:1284-1296).  Deleted docs
        are masked out of every posting/doc scan; term statistics stay
        unchanged until a merge rewrites the segment — exactly the
        reference's behavior."""
        if self._deletes is None:
            import json

            p = os.path.join(self.dir, "deletes.json")
            if os.path.exists(p):
                with open(p) as f:
                    self._deletes = np.array(sorted(json.load(f)["docids"]),
                                             dtype=np.int64)
            else:
                self._deletes = np.empty(0, dtype=np.int64)
        return self._deletes

    def _mask_deleted(self, docids: np.ndarray) -> np.ndarray:
        d = self.deletes
        if len(d) == 0:
            return np.ones(len(docids), dtype=bool)
        return ~np.isin(docids, d, assume_unique=True)

    # ---- terms ----

    # process-level stats cache: segments are immutable (any rewrite is
    # an atomic replace that changes mtime/size), so fresh Searcher
    # instances in the same process share the loaded stats tables
    _STATS_CACHE: dict = {}

    @property
    def stats(self) -> pa.Table:
        if self._stats is None:
            st = os.stat(self._terms_path)
            key = (self._terms_path, st.st_size, st.st_mtime_ns)
            cached = SegmentReader._STATS_CACHE.get(key)
            if cached is None:
                cached = pq.read_table(self._terms_path,
                                       columns=TERM_STAT_COLS)
                if len(SegmentReader._STATS_CACHE) > 4096:
                    SegmentReader._STATS_CACHE.clear()
                SegmentReader._STATS_CACHE[key] = cached
            self._stats = cached
        return self._stats

    def term_info(self, field: str, term: str) -> dict | None:
        t = self.stats
        idx = self._find(field, term)
        if idx is None:
            return None
        return {c: t[c][idx].as_py() for c in TERM_STAT_COLS}

    def _find(self, field: str, term: str) -> int | None:
        """Binary search the (field, term)-sorted stats table."""
        t = self.stats
        fields = t["field"].to_numpy(zero_copy_only=False)
        terms = t["term"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(fields, field, side="left")
        hi = np.searchsorted(fields, field, side="right")
        if lo == hi:
            return None
        j = lo + np.searchsorted(terms[lo:hi], term, side="left")
        if j < hi and terms[j] == term:
            return int(j)
        return None

    def term_range(self, field: str, lo: str | None, hi: str | None,
                   *, include_lo: bool = True, include_hi: bool = False) -> list[str]:
        """Sorted terms of ``field`` in [lo, hi) (lexicon range scan).

        Reference analogue: OrderedHashReader range scans over the terms
        dictionary (filedb/filetables.py:440-570) used by Prefix/TermRange
        expansion (query/terms.py:274-288)."""
        t = self.stats
        fields = t["field"].to_numpy(zero_copy_only=False)
        terms = t["term"].to_numpy(zero_copy_only=False)
        flo = np.searchsorted(fields, field, side="left")
        fhi = np.searchsorted(fields, field, side="right")
        sub = terms[flo:fhi]
        a = 0 if lo is None else np.searchsorted(sub, lo, side="left" if include_lo else "right")
        b = len(sub) if hi is None else np.searchsorted(sub, hi, side="right" if include_hi else "left")
        return [str(x) for x in sub[a:b]]

    def expand_prefix(self, field: str, prefix: str) -> list[str]:
        return self.term_range(field, prefix, prefix + "￿", include_hi=True)

    def all_terms(self, field: str) -> list[str]:
        return self.term_range(field, None, None)

    _MISS = ("", None)  # cached-miss sentinel

    def preload_blobs(self, by_field: dict[str, list[str]]) -> None:
        """Fetch ALL of a query's term blobs for this segment in ONE
        row-group-pruned read per field (VERDICT r1 #9: one filtered
        parquet read per (term, segment) made cold multi-term queries
        pay ~0.5 s/term; a term-list filter amortizes the read).
        Misses are cached too, so absent terms don't re-read."""
        for field, terms in by_field.items():
            todo = [t for t in dict.fromkeys(terms)
                    if (field, t) not in self._blob_cache]
            if not todo:
                continue
            t = pq.read_table(
                self._terms_path,
                columns=["field", "term", "postings", "positions"],
                filters=[("field", "=", field), ("term", "in", todo)],
            )
            found = {}
            for i in range(t.num_rows):
                found[t["term"][i].as_py()] = (t["postings"][i].as_py(),
                                               t["positions"][i].as_py())
            if len(self._blob_cache) > max(256, 4 * len(todo)):
                self._blob_cache.clear()
            for term in todo:
                self._blob_cache[(field, term)] = found.get(term, self._MISS)

    def _load_blobs(self, field: str, term: str) -> tuple[bytes, bytes | None] | None:
        key = (field, term)
        hit = self._blob_cache.get(key)
        if hit is not None:
            return None if hit is self._MISS else hit
        # Row-group-pruned selective read of the blob columns.
        t = pq.read_table(
            self._terms_path,
            columns=["field", "term", "postings", "positions"],
            filters=[("field", "=", field), ("term", "=", term)],
        )
        if t.num_rows == 0:
            if len(self._blob_cache) > 256:
                self._blob_cache.clear()
            self._blob_cache[key] = self._MISS
            return None
        blob = t["postings"][0].as_py()
        posblob = t["positions"][0].as_py()
        out = (blob, posblob)
        if len(self._blob_cache) > 256:
            self._blob_cache.clear()
        self._blob_cache[key] = out
        return out

    def blob_reader(self, field: str, term: str) -> codec.BlobReader | None:
        blobs = self._load_blobs(field, term)
        if blobs is None:
            return None
        return codec.BlobReader(blobs[0])

    def postings(self, field: str, term: str) -> codec.Postings | None:
        r = self.blob_reader(field, term)
        if r is None:
            return None
        p = r.decode_all()
        if len(self.deletes):
            keep = self._mask_deleted(p.docids)
            if not keep.all():
                return codec.Postings(p.docids[keep], p.tfs[keep],
                                      p.len_bytes[keep])
        return p

    def positions_flat(self, field: str, term: str):
        """(docids, flat positions, offsets) with deletes applied — the
        vectorized phrase path."""
        blobs = self._load_blobs(field, term)
        if blobs is None or blobs[1] is None or len(blobs[1]) == 0:
            return None
        p = codec.BlobReader(blobs[0]).decode_all()
        flat, offsets = codec.decode_positions_flat(blobs[1], p.tfs)
        if len(self.deletes):
            keep = self._mask_deleted(p.docids)
            if not keep.all():
                lens = np.diff(offsets)[keep]
                idx = np.flatnonzero(keep)
                new_off = np.concatenate(([0], np.cumsum(lens)))
                gather = np.concatenate([
                    np.arange(offsets[i], offsets[i + 1]) for i in idx
                ]) if len(idx) else np.empty(0, dtype=np.int64)
                return p.docids[keep], flat[gather], new_off
        return p.docids, flat, offsets

    def positions(self, field: str, term: str) -> list[np.ndarray] | None:
        blobs = self._load_blobs(field, term)
        if blobs is None or blobs[1] is None or len(blobs[1]) == 0:
            return None
        p = codec.BlobReader(blobs[0]).decode_all()
        out = codec.decode_positions(blobs[1], p.tfs)
        if len(self.deletes):
            keep = self._mask_deleted(p.docids)
            out = [o for o, k in zip(out, keep) if k]
        return out

    # ---- docs ----

    def all_docids(self) -> np.ndarray:
        t = pq.read_table(self._docs_path, columns=["docid"])
        ids = t["docid"].to_numpy()
        if len(self.deletes):
            ids = ids[self._mask_deleted(ids)]
        return ids

    def stored(self, docids: np.ndarray,
               columns: list[str] | None = None) -> pa.Table:
        """Stored-field rows for the given (segment-resident) docids,
        returned in the order requested; ``columns`` prunes the read."""
        cols = None
        if columns is not None:
            cols = list(dict.fromkeys(["docid"] + list(columns)))
        t = pq.read_table(self._docs_path, columns=cols)
        all_ids = t["docid"].to_numpy()
        idx = np.searchsorted(all_ids, docids)
        idx = np.clip(idx, 0, len(all_ids) - 1)
        ok = all_ids[idx] == docids
        return t.take(pa.array(idx[ok]))

    def docs_table(self, columns: list[str] | None = None) -> pa.Table:
        return pq.read_table(self._docs_path, columns=columns)


def write_terms_file(seg_dir: str, table: pa.Table) -> None:
    """Write the (field, term)-sorted terms table with small row groups so
    parquet statistics give fine-grained term-range pruning."""
    pq.write_table(table, os.path.join(seg_dir, "terms.parquet"),
                   row_group_size=4096,
                   sorting_columns=[pq.SortingColumn(0), pq.SortingColumn(1)])


def write_docs_file(seg_dir: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(seg_dir, "docs.parquet"),
                   row_group_size=16384,
                   sorting_columns=[pq.SortingColumn(0)])
