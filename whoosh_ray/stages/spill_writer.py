"""Map-side doc spilling: shuffle ONLY compact posting rows.

The fused build routes raw doc rows (text dominates the bytes) through
the groupby(seg) exchange.  This variant removes stored fields from the
shuffle entirely:

- the MAP stage tokenizes each batch once AND writes the batch's stored
  rows directly into per-segment part files
  (``segments/.parts/seg=NNNNN/docs-<uuid>.parquet``, atomic
  write-temp-rename); only the dictionary-encoded posting rows enter the
  all-to-all exchange (~4x fewer bytes than raw text);
- the per-segment reduce encodes the posting blobs as before and then
  FINALIZES the segment's docs file: reads the part files (all present —
  the shuffle is a barrier over every map output), de-duplicates by
  docid (a retried map task may have double-spilled; docids are unique
  so the dedup is exact), sorts, writes docs.parquet, removes the parts.

Resume interplay: uncommitted segments are cleaned before a build
(pipelines/build.py), which also clears stale part files.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from whoosh_ray.state.manifest import seg_dirname
from whoosh_ray.state.schema import IndexSchema
from whoosh_ray.state.segment import write_docs_file
from whoosh_ray.stages.tokenize import TokenizePostings
from whoosh_ray.stages.write_seg import EncodeSegmentTerms


class TokenizeAndSpillDocs(TokenizePostings):
    """map_batches: spill stored rows per segment + emit posting rows."""

    def __init__(self, index_dir: str, schema: IndexSchema, seg_size: int):
        super().__init__(schema, seg_size)
        self.index_dir = index_dir
        keep = {f.name for f in schema.fields if f.stored}
        keep.update(schema.stored_columns)
        self._stored = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        segs = batch["seg"].to_numpy()
        stored_cols = ["docid"] + [c for c in batch.column_names
                                   if c in self._stored]
        docs = batch.select(stored_cols)
        for s in np.unique(segs):
            part_dir = os.path.join(self.index_dir, "segments", ".parts",
                                    seg_dirname(int(s)))
            os.makedirs(part_dir, exist_ok=True)
            sub = docs.filter(pa.array(segs == s))
            name = f"docs-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(part_dir, "." + name)
            pq.write_table(sub, tmp)
            os.replace(tmp, os.path.join(part_dir, name))
        return super().__call__(batch)


class SegmentFinalizer(EncodeSegmentTerms):
    """reduce: encode terms (inherited) + assemble docs.parquet from the
    map-side part files; emits the combined stats row."""

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        terms_stats = super().__call__(group)
        seg_id = int(terms_stats["seg"][0].as_py())
        part_dir = os.path.join(self.index_dir, "segments", ".parts",
                                seg_dirname(seg_id))
        parts = sorted(os.listdir(part_dir)) if os.path.isdir(part_dir) else []
        tables = [pq.read_table(os.path.join(part_dir, p)) for p in parts
                  if p.endswith(".parquet") and not p.startswith(".")]
        docs = pa.concat_tables(tables) if tables else None
        if docs is None:
            raise RuntimeError(f"segment {seg_id}: no spilled doc parts")
        ids = docs["docid"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids_sorted = ids[order]
        # exact dedup by docid (guards against retried map tasks)
        keep_mask = np.empty(len(ids_sorted), dtype=bool)
        if len(ids_sorted):
            keep_mask[0] = True
            np.not_equal(ids_sorted[1:], ids_sorted[:-1], out=keep_mask[1:])
        docs = docs.take(pa.array(order[keep_mask]))
        from whoosh_ray.stages.write_seg import _atomic_emit

        _atomic_emit(self.index_dir, seg_id, "docs.parquet",
                     lambda tmp: write_docs_file(tmp, docs))
        for p in parts:
            try:
                os.remove(os.path.join(part_dir, p))
            except OSError:
                pass
        try:
            os.rmdir(part_dir)
        except OSError:
            pass
        d = docs["docid"]
        return pa.table({
            "seg": terms_stats["seg"],
            "doc_count": pa.array([docs.num_rows], type=pa.int64()),
            "min_docid": pa.array([d[0].as_py()], type=pa.int64()),
            "max_docid": pa.array([d[-1].as_py()], type=pa.int64()),
            "n_terms": terms_stats["n_terms"],
            "n_postings": terms_stats["n_postings"],
            "field_lengths": terms_stats["field_lengths"],
            "docs_secs": pa.array([time.time() - t0]),
            "terms_secs": terms_stats["terms_secs"],
        })
