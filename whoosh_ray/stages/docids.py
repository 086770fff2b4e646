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
2. conv keys are sorted and their spans prefix-summed into per-conv
   docid bases.  Two implementations, same math:

   - **single-level** (:func:`conv_bases` / :func:`conv_bases_local`):
     the driver sorts all keys + prefix-sums — fine up to ~10^8 convs;
   - **two-level sharded** (:func:`sharded_bases_collect`, the default
     on the multi-file build path): conv_ids are range-partitioned into
     K lexicographic buckets (boundaries picked from per-chunk key
     samples); each bucket task sorts ITS keys and prefix-sums locally;
     the driver prefix-sums only the K bucket totals.  The driver holds
     K-1 boundary keys + K object refs + K ints — never the key array —
     so the head scales to 10^11 convs.  Because bucket ranges are
     disjoint and ordered, ``global base = bucket offset + local base``
     is byte-identical to the single-level result.

3. bases are broadcast via ``ray.put`` (single-level: one blob;
   sharded: one blob per bucket, workers fetch only the buckets their
   batches touch) and every batch computes
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


# ---------------------------------------------------------------------------
# Two-level range-partitioned docid bases (the 10^12-turn head).
#
# The single-level head above pulls every (conv, span) row to the driver;
# at ~10^11 convs that is >100 GB of key bytes on one node.  The sharded
# variant keeps the key array distributed end-to-end:
#
#   round A  (chunk tasks, overlap with planning): per-file-chunk arrow
#            hash-aggregate → partial (conv, max_turn) table LEFT IN THE
#            OBJECT STORE (num_returns=2); driver receives only a small
#            meta tuple (per-file conv ranges, ≤256 sample keys, width).
#   driver:  picks K-1 lexicographic boundaries from the merged samples.
#   round B  (split tasks): each partial is sliced into K key-range
#            buckets without touching the driver.
#   round C  (bucket tasks): each bucket concat+re-aggregates its slices,
#            sorts ITS keys, prefix-sums local bases, re-puts the
#            (keys, local_bases) blob; only the bucket TOTAL (one int)
#            returns to the driver.
#   driver:  prefix-sums the K totals into global bucket offsets.
#
# Total driver state: K-1 boundary keys, K ints, K ObjectRefs.
# ---------------------------------------------------------------------------


class ShardedBases:
    """Range-partitioned conv→docid-base map (driver never holds keys).

    ``bucket(key) = searchsorted(boundaries, key, side='right')``;
    ``base(conv) = bucket_base[b] + local_bases_b[pos_in_bucket]``.
    """

    def __init__(self, boundaries: np.ndarray, blob_refs: list,
                 bucket_base: np.ndarray, span: int, width: int):
        self.boundaries = boundaries      # S{width}, len K-1
        self.blob_refs = blob_refs        # K refs → (keys_b, local_bases_b)
        self.bucket_base = bucket_base    # int64, len K
        self.span = span
        self.width = width

    def assign_uniq(self, uniq: np.ndarray, fetch=None) -> np.ndarray:
        """Vectorized base lookup for a batch's DISTINCT conv keys.

        ``fetch`` defaults to the per-worker broadcast cache so each
        worker pays one object-store read per bucket it actually
        touches, not per batch."""
        if fetch is None:
            from whoosh_ray.stages.bcast import get_broadcast as fetch
        out = np.empty(len(uniq), np.int64)
        bid = np.searchsorted(self.boundaries, uniq, side="right")
        for b in np.unique(bid):
            m = bid == b
            keys_b, lbases_b = fetch(self.blob_refs[int(b)])
            pos = np.searchsorted(keys_b, uniq[m])
            out[m] = self.bucket_base[int(b)] + lbases_b[pos]
        return out

    def next_base_after(self, key: bytes, fetch=None) -> int | None:
        """Docid base of the conv AFTER ``key`` in global order (span if
        key is the last conv) — the [lo, hi) upper bound for file-level
        lineage.  Returns None when ``key`` is not a known conv."""
        if fetch is None:
            fetch = ray.get
        k = np.array([key], dtype=f"S{self.width}")
        b = int(np.searchsorted(self.boundaries, k, side="right")[0])
        keys_b, lbases_b = fetch(self.blob_refs[b])
        i = int(np.searchsorted(keys_b, k[0]))
        if i >= len(keys_b) or keys_b[i] != k[0]:
            return None
        if i + 1 < len(keys_b):
            return int(self.bucket_base[b] + lbases_b[i + 1])
        # last conv of bucket b: next base = next bucket's offset
        return int(self.bucket_base[b + 1]) if b + 1 < len(self.bucket_base) \
            else int(self.span)


@ray.remote(num_cpus=1, num_returns=2)
def _files_spans2(paths: list[str], conv_col: str, turn_col: str,
                  n_samples: int = 256):
    """Round A: per-chunk partial span table (stays remote) + small meta."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    parts, file_rows = [], []
    for path in paths:
        t = _pq.read_table(path, columns=[conv_col, turn_col])
        parts.append(t.group_by(conv_col).aggregate([(turn_col, "max")]))
        if t.num_rows:
            file_rows.append((path, _pc.min(t[conv_col]).as_py(),
                              _pc.max(t[conv_col]).as_py()))
        else:
            file_rows.append((path, None, None))
    merged = (pa.concat_tables(parts).group_by(conv_col)
              .aggregate([(f"{turn_col}_max", "max")]))
    keys = np.sort(_np_bytes(merged[conv_col]))
    step = max(1, len(keys) // n_samples)
    samples = [bytes(k) for k in keys[::step]]
    width = keys.dtype.itemsize if len(keys) else 1
    return merged, (file_rows, samples, width, len(keys))


@ray.remote(num_cpus=1)
def _split_partial(partial: pa.Table, boundaries: list, width: int,
                   conv_col: str):
    """Round B: slice one partial span table into K key-range buckets."""
    bnd = np.array(boundaries, dtype=f"S{width}")
    keys = _np_bytes(partial[conv_col], width=width)
    bid = np.searchsorted(bnd, keys, side="right")
    return [partial.take(pa.array(np.nonzero(bid == b)[0]))
            for b in range(len(boundaries) + 1)]


@ray.remote(num_cpus=1, num_returns=2)
def _bucket_bases(width: int, conv_col: str, *slices):
    """Round C: merge one bucket's slices, sort, local prefix-sum.

    Returns (total_docids:int → driver, (keys, local_bases) blob → stays
    in the object store for on-demand worker fetch)."""
    live = [s for s in slices if s is not None and s.num_rows]
    if not live:
        return 0, (np.empty(0, dtype=f"S{width}"), np.empty(0, np.int64))
    maxcol = [c for c in live[0].column_names if c != conv_col][0]
    t = (pa.concat_tables(live).group_by(conv_col)
         .aggregate([(maxcol, "max")]))
    keys = _np_bytes(t[conv_col], width=width)
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    counts = t[f"{maxcol}_max"].to_numpy()[order].astype(np.int64) + 1
    local = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return int(counts.sum()), (keys, local)


def sharded_bases_submit(paths: list[str], conv_col: str = "conv_id",
                         turn_col: str = "turn_idx") -> list:
    """Kick off round A (submit FIRST so the span scan overlaps driver
    planning).  Returns [(partial_ref, meta_ref), ...] — the driver only
    ever ray.gets the meta refs."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_chunks = max(1, min(len(paths), 2 * ncpu))
    chunks = [paths[i::n_chunks] for i in range(n_chunks)]
    return [_files_spans2.remote(c, conv_col, turn_col)
            for c in chunks if c]


def sharded_bases_collect(submitted: list, conv_col: str = "conv_id",
                          turn_col: str = "turn_idx",
                          n_buckets: int | None = None
                          ) -> tuple["ShardedBases", dict]:
    """Rounds B+C + the K-int prefix sum.  Returns (ShardedBases,
    per-file conv-range dict for file-level lineage)."""
    partial_refs = [s[0] for s in submitted]
    metas = ray.get([s[1] for s in submitted])
    file_spans = {path: (lo, hi)
                  for m in metas for path, lo, hi in m[0]}
    width = max((m[2] for m in metas), default=1)
    n_convs_est = sum(m[3] for m in metas)
    if n_buckets is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        # ~4M convs (≈100 MB of key+base bytes) per bucket at scale; at
        # sandbox sizes the cpu term keeps the path multi-bucket so it
        # is exercised for real.
        n_buckets = max(2, min(max(ncpu // 2, n_convs_est // 4_000_000),
                               4096))
    samples = np.sort(np.array(
        [s for m in metas for s in m[1]] or [b""], dtype=f"S{width}"))
    idx = (np.arange(1, n_buckets) * len(samples)) // n_buckets
    boundaries = np.unique(samples[idx])
    bnd_list = [bytes(b) for b in boundaries]
    k = len(bnd_list) + 1
    if k > 1:
        slice_refs = [
            _split_partial.options(num_returns=k).remote(
                ref, bnd_list, width, conv_col)
            for ref in partial_refs]
    else:  # degenerate key space (≤1 distinct sample): no split round
        slice_refs = [[ref] for ref in partial_refs]
    total_refs, blob_refs = [], []
    for b in range(k):
        t_ref, blob_ref = _bucket_bases.remote(
            width, conv_col, *[sr[b] for sr in slice_refs])
        total_refs.append(t_ref)
        blob_refs.append(blob_ref)
    totals = np.array(ray.get(total_refs), dtype=np.int64)
    bucket_base = np.concatenate(([0], np.cumsum(totals)[:-1]))
    sb = ShardedBases(boundaries, blob_refs, bucket_base,
                      int(totals.sum()), width)
    return sb, file_spans


def file_docid_ranges_sharded(sb: "ShardedBases", file_spans: dict,
                              paths: list[str]):
    """Sharded twin of :func:`file_docid_ranges` — same validity rules,
    but key→base lookups fetch one bucket blob at a time (peak driver
    memory = one bucket, not the key array).  Files are conv-sorted, so
    bucket access is sequential: a one-slot memo avoids re-fetching the
    current bucket per file WITHOUT accumulating buckets the way the
    worker-side LRU broadcast cache would."""
    memo: dict = {}

    def get_broadcast(ref):
        key = ref.hex() if hasattr(ref, "hex") else ref
        if key not in memo:
            memo.clear()  # one bucket resident at a time
            memo[key] = ray.get(ref)
        return memo[key]

    ranges, prev_hi = [], None
    for p in paths:
        lo_k, hi_k = file_spans.get(p, (None, None))
        if lo_k is None:
            ranges.append((p, 0, 0))
            continue
        if prev_hi is not None and str(lo_k) < str(prev_hi):
            return None  # interleaved conv ranges: lineage unsound
        prev_hi = hi_k
        lo_u = np.array([str(lo_k).encode()], dtype=f"S{sb.width}")
        lo = sb.assign_uniq(lo_u, fetch=get_broadcast)
        hi = sb.next_base_after(str(hi_k).encode(), fetch=get_broadcast)
        if hi is None:
            return None
        ranges.append((p, int(lo[0]), int(hi)))
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


def docid_span_from_stats(paths: list[str], docid_col: str) -> int | None:
    """max(docid_col)+1 from parquet ROW-GROUP STATISTICS — O(#row
    groups) metadata reads, no data IO, no Ray execution.  Returns None
    when any row group lacks statistics (caller falls back)."""
    import pyarrow.parquet as pq

    hi = None
    for p in paths:
        md = pq.ParquetFile(p).metadata
        try:
            ci = md.schema.to_arrow_schema().names.index(docid_col)
        except ValueError:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            hi = st.max if hi is None else max(hi, st.max)
    return None if hi is None else int(hi) + 1


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
                bases_precomputed: tuple | None = None,
                bases_sharded: "ShardedBases | None" = None,
                docid_span: int | None = None) -> tuple[ray.data.Dataset, int]:
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
        if docid_span is None:
            # span via a Ray aggregate — a full pipeline execution with
            # ~3s fixed cost; callers with parquet sources pass
            # docid_span from row-group statistics instead
            docid_span = int(ds.max(docid_col)) + 1
        return ds.map_batches(from_col, batch_format="pyarrow"), docid_span

    if bases_sharded is not None:
        sb = bases_sharded
        sb_width = sb.width

        def assign_sharded(batch: pa.Table) -> pa.Table:
            enc = pa.compute.dictionary_encode(
                batch[conv_col].combine_chunks())
            uniq = _np_bytes(enc.dictionary, width=sb_width)
            base = sb.assign_uniq(uniq)
            docid = (base[enc.indices.to_numpy()]
                     + batch[turn_col].to_numpy().astype(np.int64))
            return batch.append_column("docid",
                                       pa.array(docid, type=pa.int64()))

        return (ds.map_batches(assign_sharded, batch_format="pyarrow"),
                sb.span)

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
