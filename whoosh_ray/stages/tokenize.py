"""Tokenize + posting-explode stage (the write-path hot loop).

Reference analogue: ``IndexWriter.add_document`` — analyze each indexed
field, fold tokens per term (Format.word_values), emit posting tuples
``(fieldname, tbytes, docnum, weight, vbytes)`` into the pool
(/root/reference/src/whoosh/writing.py:725-797, formats.py:78-92).

Ray-Data form: one ``map_batches`` over zero-copy Arrow batches emits the
posting *rows* for every indexed field of every document::

    seg:int64, field:string, term:string, docid:int64, tf:int32,
    len_byte:uint8[, positions:list<int32>]

``len_byte`` is the document's quantized surviving-token count for that
field, carried in-line so posting-list encoding never joins back to a
doc-length table.  Analyzers are compiled once per worker process.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from whoosh_ray.functions.analysis import VectorAnalyzer
from whoosh_ray.functions.lengths import length_to_byte
from whoosh_ray.state.schema import IndexSchema


class TokenizePostings:
    """Callable for ``map_batches`` (used as an actor pool so the compiled
    analyzers and any stateful filters are built once per actor)."""

    def __init__(self, schema: IndexSchema, seg_size: int,
                 with_positions: bool | None = None):
        self.schema = schema
        self.seg_size = seg_size
        self._analyzers = {
            f.name: VectorAnalyzer(f.analyzer) for f in schema.fields
        }
        self._with_positions = with_positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        docids = batch["docid"].to_numpy()
        parts: list[pa.Table] = []
        any_positions = any(
            f.positions if self._with_positions is None else self._with_positions
            for f in self.schema.fields
        )
        for f in self.schema.fields:
            texts = batch[f.source or f.name].to_numpy(zero_copy_only=False)
            want_pos = f.positions if self._with_positions is None else (
                self._with_positions and f.positions)
            agg = self._analyzers[f.name].aggregate(texts, with_positions=want_pos)
            rows = agg["row_ids"]
            if len(rows) == 0:
                continue
            lens = agg["row_lengths"]          # exact surviving-token count/row
            len_bytes = length_to_byte(lens)   # quantized (scoring parity)
            pdocids = docids[rows]
            # dictionary-encoded terms: no per-row string materialization and
            # a far smaller shuffle payload
            term_arr = pa.DictionaryArray.from_arrays(
                pa.array(agg["term_codes"]),
                pa.array(agg["term_dict"], type=pa.string()))
            cols = {
                "seg": pa.array(pdocids // self.seg_size, type=pa.int64()),
                "field": pa.array(np.repeat(f.name, len(rows)), type=pa.string()),
                "term": term_arr,
                "docid": pa.array(pdocids, type=pa.int64()),
                "tf": pa.array(agg["tfs"], type=pa.int32()),
                "len_byte": pa.array(len_bytes[rows], type=pa.uint8()),
            }
            if any_positions:
                if want_pos:
                    pos_arr = pa.ListArray.from_arrays(
                        pa.array(agg["pos_offsets"], type=pa.int32()),
                        pa.array(agg["pos_values"], type=pa.int32()))
                else:
                    pos_arr = pa.nulls(len(rows), type=pa.list_(pa.int32()))
                cols["positions"] = pos_arr
            parts.append(pa.table(cols))
        if not parts:
            schema = [
                ("seg", pa.int64()), ("field", pa.string()),
                ("term", pa.dictionary(pa.int32(), pa.string())),
                ("docid", pa.int64()), ("tf", pa.int32()), ("len_byte", pa.uint8()),
            ]
            if any_positions:
                schema.append(("positions", pa.list_(pa.int32())))
            return pa.table(
                {n: pa.array([], type=t) for n, t in schema})
        return pa.concat_tables(parts)
