"""Stable global docid assignment — deterministic, resumable, shuffle-light.

The reference assigns docnums by arrival order per segment with offsets
(/root/reference/src/whoosh/writing.py:561-583, multiproc.py:235-246) —
non-deterministic under parallel ingest.  For a resumable distributed
build we instead derive the docid from the data: **docid = dense rank of
(conv_id, turn_idx) under stable ordering** (the driver's per-row
invariant).  Re-runs, resumes and different parallelism levels all
produce identical docids, which is what makes per-partition checkpointing
sound and rank-parity with a whoosh oracle testable.

Implementation (no global sort):

1. one small aggregate — ``groupby(conv_id).max(turn_idx)`` — yields each
   conversation's turn span (#convs rows, ~1/7.5 of turn count);
2. driver sorts conv keys + prefix-sums spans into per-conv docid bases
   (at true 10^12-turn scale this step itself shards: range-partition
   conv_ids into K lexicographic buckets, prefix-sum bucket totals, then
   per-bucket bases — same math, two levels; documented, not needed at
   sandbox scale);
3. bases are broadcast once via ``ray.put`` and every batch computes
   ``docid = base[conv_id] + turn_idx`` with a vectorized searchsorted.

For tables that already carry a unique integer id (documents.doc_id) the
column is used directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def conv_bases(ds: ray.data.Dataset, conv_col: str = "conv_id",
               turn_col: str = "turn_idx") -> tuple[np.ndarray, np.ndarray, int]:
    """Compute (sorted conv keys, docid bases, total docid span)."""
    spans = ds.select_columns([conv_col, turn_col]).groupby(conv_col).max(turn_col)
    pdf = spans.to_pandas()  # #convs rows — small relative to turns
    maxcol = [c for c in pdf.columns if c != conv_col][0]
    pdf = pdf.sort_values(conv_col, kind="mergesort")
    keys = pdf[conv_col].to_numpy()
    counts = pdf[maxcol].to_numpy().astype(np.int64) + 1
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return keys, bases, int(counts.sum())


def with_docids(ds: ray.data.Dataset, *, conv_col: str = "conv_id",
                turn_col: str = "turn_idx",
                docid_col: str | None = None,
                bases_ds: ray.data.Dataset | None = None) -> tuple[ray.data.Dataset, int]:
    """Attach the ``docid`` column; returns (dataset, docid span).

    The (keys, bases) pair is fetched from the object store once per
    worker process (broadcast join — no shuffle)."""
    from whoosh_ray.stages.bcast import get_broadcast

    if docid_col is not None:
        def from_col(batch: pa.Table) -> pa.Table:
            d = batch[docid_col].cast(pa.int64())
            return batch.append_column("docid", d)
        # span from column stats (one cheap aggregate)
        hi = ds.max(docid_col)
        return ds.map_batches(from_col, batch_format="pyarrow"), int(hi) + 1

    keys, bases, span = conv_bases(bases_ds if bases_ds is not None else ds,
                                   conv_col, turn_col)
    ref = ray.put((keys, bases))

    def assign(batch: pa.Table) -> pa.Table:
        k, b = get_broadcast(ref)
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(k, conv)
        docid = b[idx] + batch[turn_col].to_numpy().astype(np.int64)
        return batch.append_column("docid", pa.array(docid, type=pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow"), span
