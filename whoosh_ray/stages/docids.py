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


def _np_bytes(arr: pa.Array | pa.ChunkedArray, width: int | None = None
              ) -> np.ndarray:
    """Arrow string array → numpy ``S{width}`` array, fully vectorized.

    No per-element Python objects: the UTF-8 data buffer is scattered into
    a zero-padded fixed-width byte matrix.  memcmp order on NUL-padded
    ASCII equals Python str order, so sort/searchsorted semantics are
    preserved while staying in C the whole way (this is what keeps the
    driver's docid-base head sub-second at millions of conv keys, and the
    broadcast a single contiguous buffer instead of a million pickled
    PyObjects)."""
    a = (arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
         else arr)
    if pa.types.is_large_string(a.type) or pa.types.is_large_binary(a.type):
        a = a.cast(pa.string())
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=f"S{width or 1}")
    raw_off = np.frombuffer(a.buffers()[1], dtype=np.int32)
    off = raw_off[a.offset: a.offset + n + 1].astype(np.int64)
    data_buf = a.buffers()[2]
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.empty(0, np.uint8))
    lens = np.diff(off)
    w = int(width if width is not None else max(1, lens.max()))
    out = np.zeros((n, w), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        dst = (np.repeat(np.arange(n, dtype=np.int64) * w, lens)
               + (np.arange(total, dtype=np.int64)
                  - np.repeat(off[:-1] - off[0], lens)))
        out.reshape(-1)[dst] = data[off[0]:off[-1]]
    return out.reshape(-1).view(f"S{w}")


def conv_bases(ds: ray.data.Dataset, conv_col: str = "conv_id",
               turn_col: str = "turn_idx") -> tuple[np.ndarray, np.ndarray, int]:
    """Compute (sorted conv keys, docid bases, total docid span)."""
    spans = ds.select_columns([conv_col, turn_col]).groupby(conv_col).max(turn_col)
    pdf = spans.to_pandas()  # #convs rows — small relative to turns
    maxcol = [c for c in pdf.columns if c != conv_col][0]
    keys = _np_bytes(pa.array(pdf[conv_col], type=pa.string()))
    return _bases_from_spans(keys, pdf[maxcol].to_numpy())


def conv_bases_local(paths: list[str], conv_col: str = "conv_id",
                     turn_col: str = "turn_idx"):
    """Driver-local conv-span aggregate over the two key columns only.

    The stats input is tiny relative to the corpus (two narrow columns);
    below ~1 GB of key data a direct multithreaded pyarrow read + one
    C++ hash aggregate beats a Ray shuffle round-trip by an order of
    magnitude.  Above that, the Ray path (:func:`conv_bases`) — or, at
    true 10^12-turn scale, its two-level range-partitioned variant — takes
    over (see module docstring)."""
    import pyarrow.dataset as pads

    t = pads.dataset(paths).to_table(columns=[conv_col, turn_col])
    # arrow C++ hash-groupby: no Python-object materialization of keys
    agg = t.group_by(conv_col).aggregate([(turn_col, "max")])
    keys = _np_bytes(agg[conv_col])
    return _bases_from_spans(keys, agg[f"{turn_col}_max"].to_numpy())


@ray.remote(num_cpus=1)
def _files_spans(paths: list[str], conv_col: str, turn_col: str):
    """Per-chunk conv spans + per-FILE conv ranges (for file-level
    lineage/pruning)."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    parts = []
    file_rows = []
    for path in paths:
        t = _pq.read_table(path, columns=[conv_col, turn_col])
        parts.append(t.group_by(conv_col).aggregate([(turn_col, "max")]))
        if t.num_rows:
            file_rows.append((path,
                              _pc.min(t[conv_col]).as_py(),
                              _pc.max(t[conv_col]).as_py()))
        else:
            file_rows.append((path, None, None))
    merged = (pa.concat_tables(parts).group_by(conv_col)
              .aggregate([(f"{turn_col}_max", "max")]))
    return merged, file_rows


def conv_bases_submit(paths: list[str], conv_col: str = "conv_id",
                      turn_col: str = "turn_idx") -> list:
    """Kick off the sharded conv-span aggregate (one Ray task per chunk
    of input files) and return the futures — submit this FIRST in a
    build so the span scan overlaps driver-side planning/cleanup."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_chunks = max(1, min(len(paths), 2 * ncpu))
    chunks = [paths[i::n_chunks] for i in range(n_chunks)]
    return [_files_spans.remote(c, conv_col, turn_col)
            for c in chunks if c]


def conv_bases_collect(futures: list, turn_col: str = "turn_idx",
                       conv_col: str = "conv_id"):
    """Combine the per-chunk span tables (tiny — #convs rows) with a
    second C++ hash aggregate and prefix-sum the docid bases."""
    results = ray.get(futures)
    parts = [r[0] for r in results]
    file_spans = {path: (lo, hi)
                  for r in results for path, lo, hi in r[1]}
    merged = (pa.concat_tables(parts)
              .group_by(conv_col)
              .aggregate([(f"{turn_col}_max_max", "max")]))
    keys = _np_bytes(merged[conv_col])
    keys, bases, span = _bases_from_spans(
        keys, merged[f"{turn_col}_max_max_max"].to_numpy())
    return keys, bases, span, file_spans


def file_docid_ranges(keys: np.ndarray, bases: np.ndarray, span: int,
                      file_spans: dict, paths: list[str]):
    """Per-file [lo, hi) docid ranges — valid ONLY when the files
    partition the conv-id space in sorted, non-overlapping runs
    (time-ordered log shards).  Returns None when that doesn't hold,
    in which case file-level lineage is not applicable."""
    width = keys.dtype.itemsize
    ranges = []
    prev_hi = None
    for p in paths:
        lo_k, hi_k = file_spans.get(p, (None, None))
        if lo_k is None:
            ranges.append((p, 0, 0))
            continue
        if prev_hi is not None and str(lo_k) < str(prev_hi):
            # conv ranges out of order / interleaved: docid shifts on
            # append could leave a segment's overlapping-file set
            # unchanged while its rows changed, so file-level lineage
            # would be UNSOUND here — disable it (callers fall back to
            # the whole-input fingerprint).  A conv straddling two
            # adjacent files (equality) is fine: appends still leave
            # old conv bases untouched.
            return None
        prev_hi = hi_k
        lo_b = np.array([str(lo_k).encode()], dtype=f"S{width}")
        hi_b = np.array([str(hi_k).encode()], dtype=f"S{width}")
        i_lo = int(np.searchsorted(keys, lo_b[0]))
        i_hi = int(np.searchsorted(keys, hi_b[0]))
        if i_lo >= len(keys) or i_hi >= len(keys):
            return None
        lo = int(bases[i_lo])
        hi = int(bases[i_hi + 1]) if i_hi + 1 < len(bases) else int(span)
        ranges.append((p, lo, hi))
    return ranges


def conv_bases_tasks(paths: list[str], conv_col: str = "conv_id",
                     turn_col: str = "turn_idx"):
    """Two-level conv-span aggregate: Ray tasks compute per-file-chunk
    (conv, max turn) tables with arrow C++ hash aggregates; the driver
    combines the (tiny) partials and prefix-sums the bases.  This is the
    sharded variant the module docstring describes — the partial tables
    are #convs-sized, so the driver never touches the raw turn rows."""
    keys, bases, span, _ = conv_bases_collect(
        conv_bases_submit(paths, conv_col, turn_col), turn_col, conv_col)
    return keys, bases, span


def _bases_from_spans(keys: np.ndarray, max_turn: np.ndarray):
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    counts = max_turn[order].astype(np.int64) + 1
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return keys, bases, int(counts.sum())


def with_docids(ds: ray.data.Dataset, *, conv_col: str = "conv_id",
                turn_col: str = "turn_idx",
                docid_col: str | None = None,
                bases_ds: ray.data.Dataset | None = None,
                local_paths: list[str] | None = None,
                bases_futures: list | None = None,
                bases_precomputed: tuple | None = None) -> tuple[ray.data.Dataset, int]:
    """Attach the ``docid`` column; returns (dataset, docid span).

    The (keys, bases) pair is fetched from the object store once per
    worker process (broadcast join — no shuffle); per-batch lookup is
    dictionary-encoded so the string binary-search touches each DISTINCT
    conv id once per batch, not each row."""
    from whoosh_ray.stages.bcast import get_broadcast

    if docid_col is not None:
        def from_col(batch: pa.Table) -> pa.Table:
            d = batch[docid_col].cast(pa.int64())
            return batch.append_column("docid", d)
        # span from column stats (one cheap aggregate)
        hi = ds.max(docid_col)
        return ds.map_batches(from_col, batch_format="pyarrow"), int(hi) + 1

    if bases_precomputed is not None:
        keys, bases, span = bases_precomputed
    elif bases_futures is not None:
        keys, bases, span, _ = conv_bases_collect(bases_futures, turn_col,
                                                  conv_col)
    elif local_paths is not None:
        if len(local_paths) >= 8:
            keys, bases, span = conv_bases_tasks(local_paths, conv_col,
                                                 turn_col)
        else:
            keys, bases, span = conv_bases_local(local_paths, conv_col,
                                                 turn_col)
    else:
        keys, bases, span = conv_bases(
            bases_ds if bases_ds is not None else ds, conv_col, turn_col)
    width = keys.dtype.itemsize
    ref = ray.put((keys, bases))

    def assign(batch: pa.Table) -> pa.Table:
        k, b = get_broadcast(ref)
        enc = pa.compute.dictionary_encode(batch[conv_col].combine_chunks())
        uniq = _np_bytes(enc.dictionary, width=width)
        pos = np.searchsorted(k, uniq)
        docid = (b[pos][enc.indices.to_numpy()]
                 + batch[turn_col].to_numpy().astype(np.int64))
        return batch.append_column("docid", pa.array(docid, type=pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow"), span
