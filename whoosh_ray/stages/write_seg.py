"""Segment writers: per-segment posting-list encode + atomic file commits.

Reference analogues:

- ``FieldWriter.add_postings`` consuming a globally sorted posting stream
  term-by-term (/root/reference/src/whoosh/codec/base.py:161-236) — here a
  single ``groupby("seg")`` shuffle co-locates each docid-range partition's
  postings and ``EncodeSegmentTerms`` re-establishes the strict
  (field, term, docid) order in one vectorized sort (the reference instead
  external-sorts runs and K-way merges, writing.py:130-180,
  externalsort.py:85-240);
- ``W3PostingsWriter``/``W3FieldWriter`` block + TermInfo writes
  (whoosh3.py:650-869, :280-349) → codec blobs + terms-table rows;
- ``W3PerDocWriter`` stored fields (whoosh3.py:156-277) → docs.parquet.

Skew (the north rule's "salted groupby"): the shuffle key is the docid
-range bucket, so a hot term ("deploy" in 50% of turns) is split into
per-segment groups of at most ``seg_size`` postings — bounded by
construction — and the per-salt sublists are already docid-ordered
because segments are contiguous docid ranges; queries fan out per
segment and concatenate.  One segment's postings must fit a worker's
heap: ``seg_size`` (docs per segment) is the memory knob.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa

from whoosh_ray.state import codec
from whoosh_ray.state.manifest import SegmentMeta, atomic_write_json, seg_dirname
from whoosh_ray.state.schema import IndexSchema
from whoosh_ray.state.segment import TERMS_ARROW_SCHEMA, write_docs_file, write_terms_file


def _sorted_factorize(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """np.unique(return_inverse) semantics via hash-based factorize."""
    codes, uniq = pd.factorize(values, sort=False)
    uniq = np.asarray(uniq, dtype=object)
    order = np.argsort(uniq, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return rank[codes], uniq[order]


def _atomic_emit(index_dir: str, seg_id: int, filename: str, write_fn) -> None:
    """Write one segment file (plus any sidecars the writer produced,
    e.g. blobs.bin next to terms.parquet) via temp-dir + rename
    (idempotent on retry).  Sidecars move BEFORE the named file so the
    named file's presence implies its sidecars are in place."""
    seg_dir = os.path.join(index_dir, "segments", seg_dirname(seg_id))
    tmp = seg_dir + f".tmp-{filename}-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    write_fn(tmp)
    os.makedirs(seg_dir, exist_ok=True)
    for name in sorted(os.listdir(tmp)):
        if name != filename:
            os.replace(os.path.join(tmp, name), os.path.join(seg_dir, name))
    os.replace(os.path.join(tmp, filename), os.path.join(seg_dir, filename))
    os.rmdir(tmp)


class EncodeSegmentTerms:
    """groupby("seg").map_groups stage: all posting rows of ONE segment ->
    terms.parquet (written atomically) + one stats row.

    The per-term body is numpy-only over slices of the segment-sorted
    arrays; no per-term Python/pandas materialization."""

    def __init__(self, index_dir: str, schema: IndexSchema):
        self.index_dir = index_dir
        self.schema = schema
        self.__name__ = type(self).__name__  # ray map_groups wraps fn.__name__

    def __call__(self, group: pa.Table, dedup: bool = False) -> pa.Table:
        t0 = time.time()
        seg_id = int(group["seg"][0].as_py())
        fields = group["field"].to_numpy(zero_copy_only=False)
        terms = group["term"].to_numpy(zero_copy_only=False)
        docids = group["docid"].to_numpy()
        tfs = group["tf"].to_numpy().astype(np.int64)
        len_bytes = group["len_byte"].to_numpy()
        has_pos = "positions" in group.column_names

        # sorted-unique codes => final (field, term) dictionary order.
        # pandas factorize is hash-based O(n); only the (small) unique-value
        # arrays get a comparison sort — object-array np.unique would
        # argsort every row's PyObject instead.
        fcode, ufields = _sorted_factorize(fields)
        tcode, uterms = _sorted_factorize(terms)
        order = np.lexsort((docids, tcode, fcode))
        fcode = fcode[order]
        tcode = tcode[order]
        docids = docids[order]
        if dedup:
            # stream mode: a retried map task may have double-delivered a
            # slice; duplicate (field, term, docid) rows carry identical
            # payloads, so dropping repeats is exact
            uniq = np.empty(len(order), dtype=bool)
            if len(order):
                uniq[0] = True
                uniq[1:] = ((fcode[1:] != fcode[:-1])
                            | (tcode[1:] != tcode[:-1])
                            | (docids[1:] != docids[:-1]))
            if not uniq.all():
                order = order[uniq]
                fcode = fcode[uniq]
                tcode = tcode[uniq]
                docids = docids[uniq]
        tfs = tfs[order]
        len_bytes = len_bytes[order]

        # term-group boundaries over the sorted stream
        key_change = np.empty(len(order), dtype=bool)
        key_change[0] = True
        np.not_equal(fcode[1:], fcode[:-1], out=key_change[1:])
        key_change[1:] |= tcode[1:] != tcode[:-1]
        starts = np.flatnonzero(key_change)
        ends = np.append(starts[1:], len(order))

        pos_flat = None
        pos_offsets = None
        if has_pos:
            pos_col = group["positions"].combine_chunks()
            if pos_col.null_count < len(pos_col):
                taken = pos_col.take(pa.array(order))
                lens = pa.compute.list_value_length(taken)
                lens = pa.compute.fill_null(lens, 0).to_numpy().astype(np.int64)
                pos_flat = taken.flatten().to_numpy().astype(np.int64)
                pos_offsets = np.concatenate(([0], np.cumsum(lens)))

        n_terms = len(starts)
        out = {
            "field": ufields[fcode[starts]],
            "term": uterms[tcode[starts]],
            "df": (ends - starts).astype(np.int64),
            "sum_tf": np.add.reduceat(tfs, starts),
            "max_weight": np.maximum.reduceat(tfs, starts).astype(np.float32),
            "min_length": np.minimum.reduceat(len_bytes, starts),
            "max_length": np.maximum.reduceat(len_bytes, starts),
            "min_docid": docids[starts],
            "max_docid": docids[ends - 1],
        }
        out["total_weight"] = out["sum_tf"].astype(np.float64)

        blobs = codec.encode_postings_batch(docids, tfs, len_bytes, starts)
        if pos_flat is not None:
            # id-field postings carry empty position lists, so their slices
            # come out as b"" naturally
            posblobs = codec.encode_positions_batch(pos_flat, pos_offsets,
                                                    starts, ends)
        else:
            posblobs = [b""] * n_terms

        cols = {}
        for f in TERMS_ARROW_SCHEMA:
            if f.name == "postings":
                cols[f.name] = pa.array(blobs, type=f.type)
            elif f.name == "positions":
                cols[f.name] = pa.array(posblobs, type=f.type)
            elif f.name in ("chars", "boosts"):
                # boost/chars-bearing schemas build via mode="fused"
                cols[f.name] = pa.array([b""] * n_terms, type=f.type)
            else:
                cols[f.name] = pa.array(out[f.name], type=f.type)
        table = pa.table(cols)
        _atomic_emit(self.index_dir, seg_id, "terms.parquet",
                     lambda tmp: write_terms_file(tmp, table))

        # exact per-field surviving-token totals (avg_field_length parity:
        # true lengths, not quantized — searching.py:259-262)
        field_sums = {
            str(ufields[k]): int(tfs[fcode == k].sum()) for k in range(len(ufields))
        }
        return pa.table(
            {
                "seg": pa.array([seg_id], type=pa.int64()),
                "n_terms": pa.array([n_terms], type=pa.int64()),
                "n_postings": pa.array([len(order)], type=pa.int64()),
                "field_lengths": pa.array([json.dumps(field_sums)]),
                "terms_secs": pa.array([time.time() - t0]),
            }
        )


class DocsFileWriter:
    """groupby("seg").map_groups stage: stored-field rows -> docs.parquet."""

    def __init__(self, index_dir: str, schema: IndexSchema):
        self.index_dir = index_dir
        self.schema = schema
        self.__name__ = type(self).__name__  # ray map_groups wraps fn.__name__

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        seg_id = int(group["seg"][0].as_py())
        order = np.argsort(group["docid"].to_numpy(), kind="stable")
        keep = ["docid"] + [c for c in group.column_names
                            if c not in ("docid", "seg")]
        table = group.select(keep).take(pa.array(order))
        _atomic_emit(self.index_dir, seg_id, "docs.parquet",
                     lambda tmp: write_docs_file(tmp, table))
        d = table["docid"]
        return pa.table(
            {
                "seg": pa.array([seg_id], type=pa.int64()),
                "doc_count": pa.array([table.num_rows], type=pa.int64()),
                "min_docid": pa.array([d[0].as_py()], type=pa.int64()),
                "max_docid": pa.array([d[-1].as_py()], type=pa.int64()),
                "docs_secs": pa.array([time.time() - t0]),
            }
        )


def commit_segment_meta(index_dir: str, seg_id: int, docid_base: int,
                        doc_count: int, field_lengths: dict[str, int],
                        lineage: dict, metrics: dict) -> SegmentMeta:
    meta = SegmentMeta(
        seg_id=seg_id, docid_base=docid_base, doc_count=doc_count,
        field_lengths=field_lengths, lineage=lineage, metrics=metrics,
    )
    seg_dir = os.path.join(index_dir, "segments", seg_dirname(seg_id))
    atomic_write_json(os.path.join(seg_dir, "meta.json"), meta.to_json())
    return meta
