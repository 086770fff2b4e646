"""Fused per-segment writer: ONE shuffle builds both segment files.

The two-branch build (docs groupby + tokenize/postings groupby) pays two
reads and two all-to-all exchanges.  This fused stage routes the RAW doc
rows once — ``groupby("seg")`` on the docid-range key — and the segment
worker does everything locally: write the stored-fields file, tokenize
(vectorized analyzer), aggregate (row, term) postings, sort to strict
(field, term, docid) order and batch-encode the posting blobs.

This preserves the north-star shuffle semantics (the posting-list
construction is still keyed by the docid-range bucket = the hot-term
salt; the term grouping happens against the segment-local stream exactly
as in write_seg.EncodeSegmentTerms) while halving bytes shuffled and
removing one full pipeline's fixed costs — the difference between 0.4
and 0.8 scaling efficiency at small corpus sizes.

Term sorting never touches per-posting strings: the analyzer's
``aggregate`` emits integer term codes per field; only each field's
(small) term dictionary is comparison-sorted.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

from whoosh_ray.functions.analysis import VectorAnalyzer
from whoosh_ray.functions.lengths import length_to_byte
from whoosh_ray.state import codec
from whoosh_ray.state.schema import IndexSchema
from whoosh_ray.state.segment import (
    TERMS_ARROW_SCHEMA,
    write_docs_file,
    write_terms_file,
)
from whoosh_ray.stages.write_seg import _atomic_emit


def _reorder_lists(flat: np.ndarray, offsets: np.ndarray,
                   order: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reorder a flattened list-array by list index, fully vectorized."""
    lens = np.diff(offsets)
    new_lens = lens[order]
    new_offsets = np.concatenate(([0], np.cumsum(new_lens)))
    total = int(new_offsets[-1])
    if total == 0:
        return flat[:0], new_offsets
    src_starts = offsets[:-1][order]
    idx = (np.arange(total, dtype=np.int64)
           - np.repeat(new_offsets[:-1], new_lens)
           + np.repeat(src_starts, new_lens))
    return flat[idx], new_offsets


class FusedSegmentWriter:
    """groupby("seg").map_groups stage over raw doc rows."""

    def __init__(self, index_dir: str, schema: IndexSchema,
                 commit: dict | None = None):
        self.index_dir = index_dir
        self.schema = schema
        self._analyzers = {f.name: VectorAnalyzer(f.analyzer)
                           for f in schema.fields}
        # when set ({seg_size, fingerprint, source}), the worker commits
        # the segment's meta.json itself right after both files land —
        # distributed per-partition commits instead of a serial driver
        # loop over every segment after the pipeline drains
        self.commit = commit
        self.__name__ = type(self).__name__

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        seg_id = int(group["seg"][0].as_py())
        order = np.argsort(group["docid"].to_numpy(), kind="stable")
        group = group.take(pa.array(order))
        docids = group["docid"].to_numpy()

        # ---- docs file (stored fields only); deferred when a field
        # stores term vectors (they come out of the tokenize pass below)
        keep = {f.name for f in self.schema.fields if f.stored}
        keep.update(self.schema.stored_columns)
        stored_cols = ["docid"] + [
            c for c in group.column_names
            if c != "docid" and c != "seg" and c in keep]
        docs_table = group.select(stored_cols)
        has_vectors = any(getattr(f, "vector", False)
                          for f in self.schema.fields)
        if not has_vectors:
            _atomic_emit(self.index_dir, seg_id, "docs.parquet",
                         lambda tmp: write_docs_file(tmp, docs_table))
        t_docs = time.time() - t0

        # ---- per-field tokenize + encode, fields in sorted name order
        field_chunks = []
        field_sums: dict[str, int] = {}
        n_docs = group.num_rows
        # per-doc term vectors (FieldType(vector=...) parity): default
        # every vector field to empty lists so docs schema stays uniform
        # across segments even when a group has zero surviving tokens
        vector_cols: dict[str, pa.Array] = {}
        for f in self.schema.fields:
            if getattr(f, "vector", False):
                z = np.zeros(n_docs + 1, dtype=np.int32)
                vector_cols[f"{f.name}__vector_terms"] = \
                    pa.ListArray.from_arrays(pa.array(z, type=pa.int32()),
                                             pa.array([], type=pa.string()))
                vector_cols[f"{f.name}__vector_weights"] = \
                    pa.ListArray.from_arrays(pa.array(z, type=pa.int32()),
                                             pa.array([], type=pa.float64()))
        n_postings = 0
        # index-time doc/field boosts (reference add_document _boost /
        # _fieldname_boost, writing.py:473-500): side columns scale the
        # posting weights (weights tail engages, tf stays the raw count)
        base_boost = None
        if "__boost" in group.column_names:
            base_boost = np.nan_to_num(
                group["__boost"].to_numpy(zero_copy_only=False)
                .astype(np.float64), nan=1.0)
        for f in sorted(self.schema.fields, key=lambda f: f.name):
            texts = group[f.source or f.name].to_numpy(zero_copy_only=False)
            agg = self._analyzers[f.name].aggregate(
                texts, with_positions=f.positions,
                with_chars=getattr(f, "chars", False),
                with_boosts=getattr(f, "token_boosts", False))
            rows = agg["row_ids"]
            if len(rows) == 0:
                continue
            fboost = base_boost
            bcol = f"__boost__{f.name}"
            if bcol in group.column_names:
                # a set field boost REPLACES the doc boost for that
                # field (reference _field_boost(default=docboost),
                # writing.py:74-77); null = unset = fall back
                col = group[bcol].to_numpy(
                    zero_copy_only=False).astype(np.float64)
                fallback = (base_boost if base_boost is not None
                            else np.ones(len(col), dtype=np.float64))
                fboost = np.where(np.isnan(col), fallback, col)
            if fboost is not None and np.any(fboost != 1.0):
                pw = (agg["weights"].astype(np.float64)
                      if "weights" in agg
                      else agg["tfs"].astype(np.float64))
                agg = dict(agg)
                agg["weights"] = pw * fboost[rows]
            tcode = agg["term_codes"].astype(np.int64)
            tdict = agg["term_dict"]
            # rank terms lexicographically (sort only the dictionary)
            dorder = np.argsort(tdict, kind="stable")
            rank = np.empty(len(dorder), dtype=np.int64)
            rank[dorder] = np.arange(len(dorder))
            trank = rank[tcode]
            if getattr(f, "vector", False):
                # per-doc (term, weight) lists in term order, aligned
                # with the docid-sorted docs rows
                vorder = np.lexsort((trank, rows))
                vcounts = np.bincount(rows, minlength=n_docs)
                voff = np.zeros(n_docs + 1, dtype=np.int32)
                np.cumsum(vcounts, out=voff[1:])
                vterms = tdict[dorder][trank[vorder]]
                vw = (agg["weights"][vorder].astype(np.float64)
                      if "weights" in agg
                      else agg["tfs"][vorder].astype(np.float64))
                vector_cols[f"{f.name}__vector_terms"] = \
                    pa.ListArray.from_arrays(
                        pa.array(voff, type=pa.int32()),
                        pa.array(vterms, type=pa.string()))
                vector_cols[f"{f.name}__vector_weights"] = \
                    pa.ListArray.from_arrays(
                        pa.array(voff, type=pa.int32()),
                        pa.array(vw, type=pa.float64()))
            p_docids = docids[rows]
            sort = np.lexsort((p_docids, trank))
            trank_s = trank[sort]
            p_docids = p_docids[sort]
            tfs = agg["tfs"][sort].astype(np.int64)
            len_bytes = length_to_byte(agg["row_lengths"])[rows][sort]
            weights = (agg["weights"][sort].astype(np.float64)
                       if "weights" in agg else None)

            change = np.empty(len(sort), dtype=bool)
            change[0] = True
            np.not_equal(trank_s[1:], trank_s[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(sort))

            blobs = codec.encode_postings_batch(p_docids, tfs, len_bytes,
                                                starts, weights=weights)
            if f.positions:
                flat, offs = _reorder_lists(agg["pos_values"].astype(np.int64),
                                            agg["pos_offsets"].astype(np.int64),
                                            sort)
                posblobs = codec.encode_positions_batch(flat, offs, starts,
                                                        ends)
            else:
                posblobs = [b""] * len(starts)
            if getattr(f, "chars", False):
                sc, offs_c = _reorder_lists(agg["char_starts"].astype(np.int64),
                                            agg["pos_offsets"].astype(np.int64),
                                            sort)
                ec, _ = _reorder_lists(agg["char_ends"].astype(np.int64),
                                       agg["pos_offsets"].astype(np.int64),
                                       sort)
                charblobs = codec.encode_chars_batch(sc, ec, offs_c,
                                                     starts, ends)
            else:
                charblobs = [b""] * len(starts)
            if getattr(f, "token_boosts", False):
                occ, offs_b = _reorder_lists(agg["occ_boosts"],
                                             agg["pos_offsets"].astype(np.int64),
                                             sort)
                boostblobs = codec.encode_boosts_batch(occ, offs_b,
                                                       starts, ends)
            else:
                boostblobs = [b""] * len(starts)

            n_terms = len(starts)
            w32 = (weights.astype(np.float32) if weights is not None
                   else None)
            chunk = {
                "field": np.repeat(f.name, n_terms),
                "term": tdict[dorder][trank_s[starts]],
                "df": (ends - starts).astype(np.int64),
                "sum_tf": np.add.reduceat(tfs, starts),
                "max_weight": (np.maximum.reduceat(w32, starts)
                               if w32 is not None
                               else np.maximum.reduceat(tfs, starts)
                               .astype(np.float32)),
                "min_length": np.minimum.reduceat(len_bytes, starts),
                "max_length": np.maximum.reduceat(len_bytes, starts),
                "min_docid": p_docids[starts],
                "max_docid": p_docids[ends - 1],
                "postings": blobs,
                "positions": posblobs,
                "chars": charblobs,
                "boosts": boostblobs,
            }
            chunk["total_weight"] = (np.add.reduceat(weights, starts)
                                     if weights is not None
                                     else chunk["sum_tf"].astype(np.float64))
            field_chunks.append(chunk)
            field_sums[f.name] = int(tfs.sum())
            n_postings += len(sort)

        if has_vectors:
            for name, arr in vector_cols.items():
                docs_table = docs_table.append_column(name, arr)
            _atomic_emit(self.index_dir, seg_id, "docs.parquet",
                         lambda tmp: write_docs_file(tmp, docs_table))

        cols = {}
        for fld in TERMS_ARROW_SCHEMA:
            vals = [c[fld.name] for c in field_chunks]
            if fld.name in ("postings", "positions", "chars", "boosts"):
                flatv = [b for v in vals for b in v]
                cols[fld.name] = pa.array(flatv, type=fld.type)
            else:
                cols[fld.name] = pa.array(
                    np.concatenate(vals) if vals else [], type=fld.type)
        terms_table = pa.table(cols)
        _atomic_emit(self.index_dir, seg_id, "terms.parquet",
                     lambda tmp: write_terms_file(tmp, terms_table))

        if self.commit is not None:
            from whoosh_ray.stages.write_seg import commit_segment_meta

            seg_size = int(self.commit["seg_size"])
            fp_of = self.commit.get("fp_of")
            fp = fp_of(seg_id) if fp_of else self.commit["fingerprint"]
            commit_segment_meta(
                self.index_dir, seg_id,
                docid_base=seg_id * seg_size,
                doc_count=group.num_rows,
                field_lengths=field_sums,
                lineage={"fingerprint": fp,
                         "docid_range": [seg_id * seg_size,
                                         (seg_id + 1) * seg_size],
                         "source": self.commit.get("source", "<dataset>")},
                metrics={"complete": True,
                         "n_terms": int(terms_table.num_rows),
                         "n_postings": int(n_postings),
                         "terms_secs": time.time() - t0 - t_docs,
                         "docs_secs": t_docs},
            )

        return pa.table({
            "seg": pa.array([seg_id], type=pa.int64()),
            "doc_count": pa.array([group.num_rows], type=pa.int64()),
            "min_docid": pa.array([int(docids[0])], type=pa.int64()),
            "max_docid": pa.array([int(docids[-1])], type=pa.int64()),
            "n_terms": pa.array([terms_table.num_rows], type=pa.int64()),
            "n_postings": pa.array([n_postings], type=pa.int64()),
            "field_lengths": pa.array([json.dumps(field_sums)]),
            "docs_secs": pa.array([t_docs]),
            "terms_secs": pa.array([time.time() - t0 - t_docs]),
        })
