"""Distributed index build: the flagship Ray Data pipeline.

End-to-end (reference lifecycle analogue: SURVEY.md §3.1/§3.2 —
create_in → add_document* → commit, and MpWriter's process fan-out)::

    read_parquet(columns pruned)
      → with_docids            (broadcast conv bases — no shuffle)
      → [resume filter]        (drop rows of already-committed segments)
      ├─ docs branch:    groupby("seg") → DocsFileWriter   → stats rows
      └─ posting branch: map_batches(TokenizePostings)     (actor pool)
                         → groupby("seg") → EncodeSegmentTerms → stats rows
      → per-segment meta.json commits → manifest seal

Shuffle inventory (each is an all-to-all exchange — kept to the minimum):
  1. groupby("seg") over stored-doc rows      (range partition by docid)
  2. groupby("seg") over posting rows         (THE wide step; the docid
     -range bucket in the key is the hot-term salt — see write_seg.py)
plus one tiny aggregate (conv bases) materialized driver-side and
broadcast.  Both branches re-read the input (read + docid-assign is
cheaper than pinning the whole input in the object store); tokenization
runs once, in the posting branch only — doc lengths are derived from the
posting stream (sum tf == surviving token count).

Checkpoint/resume: each segment commits independently (atomic renames +
meta.json with lineage fingerprint + metrics); a re-run with the same
input fingerprint skips committed segments before tokenization and
reseals the manifest (the reference's all-or-nothing TOC commit,
index.py:567-712, does not scale to this).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import ray.data

from whoosh_ray.stages.docids import with_docids
from whoosh_ray.stages.tokenize import TokenizePostings
from whoosh_ray.stages.write_seg import (
    DocsFileWriter,
    EncodeSegmentTerms,
    commit_segment_meta,
)
from whoosh_ray.state.manifest import (
    Manifest,
    completed_segments,
    read_manifest,
    write_manifest,
)
from whoosh_ray.state.schema import IndexSchema

DEFAULT_SEG_SIZE = 65536  # docs per segment; one segment's postings must fit a worker


def _expand_paths(source) -> list[str]:
    paths = [source] if isinstance(source, str) else list(source)
    out = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                       if f.endswith(".parquet"))
        else:
            out.append(p)
    return out


def _input_fingerprint(source, schema: IndexSchema) -> str:
    """Cheap deterministic lineage fingerprint of (input, schema)."""
    h = hashlib.sha256()
    h.update(json.dumps(schema.to_json(), sort_keys=True, default=str).encode())
    if isinstance(source, (list, tuple)):
        for p in source:
            h.update(str(p).encode())
            try:
                st = os.stat(p)
                h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                pass
    elif isinstance(source, str):
        h.update(source.encode())
        try:
            st = os.stat(source)
            h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
        except OSError:
            pass
    else:
        h.update(b"<dataset>")
    return h.hexdigest()[:16]


def build_index(
    source,
    index_dir: str,
    schema: IndexSchema,
    *,
    seg_size: int | None = None,
    docid_col: str | None = None,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    tokenize_concurrency: int | tuple[int, int] | None = None,
    # None = block-sized tokenize batches: with the 4*ncpu-block read and
    # span/(4*ncpu) segment sizing, each map call covers ~one whole
    # segment, so spill parts coalesce to ~1 file/segment and the stream
    # router fans out wide (measured: stream 19.5s -> 4.4s, BASELINE §r4)
    tokenize_batch_size: int | None = None,
    resume: bool = True,
    mode: str = "fused",
    compound: bool = False,
) -> Manifest:
    """Build (or resume) an index at ``index_dir`` over ``source``.

    ``source`` is a parquet path / list of paths, or a ray Dataset.
    Returns the sealed :class:`Manifest`.  ``compound=True`` packs each
    sealed segment's data files into one ``segment.cmpd`` before the
    manifest seal (reference: compound file assembled at commit,
    writing.py:857-862) — byte-identical reads, half the objects per
    segment on the store.
    """
    t_start = time.time()
    if isinstance(schema, type):
        # a declarative SchemaClass (whoosh_ray.fields) — bind it
        from whoosh_ray.fields import ensure_schema

        schema = ensure_schema(schema)
    if schema.glob_fields:
        # dynamic glob fields resolve against the SOURCE's columns up
        # front (one footer read), so the pruned read and the sealed
        # manifest both see concrete fields only
        if isinstance(source, ray.data.Dataset):
            colnames = source.schema().names
        else:
            import pyarrow.parquet as _pq

            colnames = _pq.read_schema(_expand_paths(source)[0]).names
        schema = schema.resolve_globs(colnames)
    # chars / vector / token-boost payloads are produced by the fused
    # writer only; the alternate modes would silently drop them
    if mode != "fused":
        rich = [f.name for f in schema.fields
                if getattr(f, "chars", False) or getattr(f, "vector", False)
                or getattr(f, "token_boosts", False)
                or (f.analyzer.chain is not None
                    and any(k == "delimited" for k, _ in f.analyzer.chain))]
        if rich:
            raise ValueError(
                f"fields {rich} use chars/vector/boost payloads — "
                f"supported by mode='fused' only (got mode={mode!r})")
    segroot = os.path.join(index_dir, "segments")
    os.makedirs(segroot, exist_ok=True)

    # kick off the sharded conv-span scan FIRST so it overlaps the
    # driver-side cleanup + pipeline planning below
    bases_futures = None
    if (not isinstance(source, ray.data.Dataset) and docid_col is None):
        from whoosh_ray.stages.docids import sharded_bases_submit

        _paths = _expand_paths(source)
        if len(_paths) >= 8:
            bases_futures = sharded_bases_submit(_paths, conv_col, turn_col)

    fingerprint = _input_fingerprint(source, schema)

    # clean uncommitted leftovers from a crashed run: segment dirs without a
    # meta.json commit, stale temp dirs, and map-side doc part spills
    import shutil as _shutil

    for name in os.listdir(segroot):
        path = os.path.join(segroot, name)
        if name == ".parts" or ".tmp" in name:
            _shutil.rmtree(path, ignore_errors=True)
        elif (name.startswith("seg=")
              and not os.path.exists(os.path.join(path, "meta.json"))):
            _shutil.rmtree(path, ignore_errors=True)
    # ---- conv bases + optional FILE-LEVEL lineage ----
    # When input files partition the conv-id space in sorted,
    # non-overlapping runs (time-ordered log shards — the common append
    # pattern), each file covers a contiguous docid range and each
    # segment's identity depends only on the files overlapping its
    # range: appended files leave old segments' fingerprints unchanged,
    # so an incremental re-run resumes past them AND prunes fully-
    # covered files from the read entirely.
    file_ranges = None
    bases_precomputed = None
    bases_sharded = None
    span = None
    if bases_futures is not None:
        from whoosh_ray.stages.docids import (file_docid_ranges_sharded,
                                              sharded_bases_collect)

        bases_sharded, _fspans = sharded_bases_collect(
            bases_futures, conv_col, turn_col)
        span = bases_sharded.span
        file_ranges = file_docid_ranges_sharded(bases_sharded, _fspans,
                                                _paths)

    # stable segment sizing across appends: reuse the existing
    # manifest's seg_size so resumed segment boundaries stay aligned
    prev_settings = {}
    if resume and os.path.exists(os.path.join(index_dir, "manifest.json")):
        try:
            prev_settings = read_manifest(index_dir).settings
        except Exception:
            prev_settings = {}
    if seg_size is None and int(prev_settings.get("seg_size") or 0):
        seg_size = int(prev_settings["seg_size"])

    import ray as _ray

    _ncpu = int(_ray.cluster_resources().get("CPU", 8))

    if seg_size is None and span is not None:
        seg_size = int(min(16384, max(2048, span // (4 * _ncpu))))

    # ---- per-segment fingerprints ----
    if file_ranges is not None and seg_size is not None:
        schema_hash = hashlib.sha256(
            json.dumps(schema.to_json(), sort_keys=True,
                       default=str).encode()).hexdigest()[:16]

        def _ftok(p):
            st = os.stat(p)
            return f"{p}:{st.st_size}:{st.st_mtime_ns}"

        _ftoks = [(lo, hi, _ftok(p)) for p, lo, hi in file_ranges]
        _ss = seg_size

        def fp_of_range(r0: int, r1: int) -> str:
            toks = [t for lo, hi, t in _ftoks if lo < r1 and hi > r0]
            h = hashlib.sha256(
                (schema_hash + "|" + "|".join(toks)).encode())
            return "fl-" + h.hexdigest()[:16]

        def fp_of(seg_id: int) -> str:
            return fp_of_range(seg_id * _ss, (seg_id + 1) * _ss)
    else:
        def fp_of_range(r0: int, r1: int) -> str:
            return fingerprint

        def fp_of(seg_id: int) -> str:
            return fingerprint

    # ---- resume set (needs fingerprints; file path also prunes reads) ----
    # Reconciled by DOCID RANGE, not seg id: a merged segment carries a
    # fresh seg id but covers the union of its inputs' ranges, so the
    # "already indexed" test must be interval membership.  Fingerprint
    # validity: a merged segment validates each constituent range
    # (lineage["fp_parts"], written by merge.py) against the current
    # input files; plain segments validate their own range.
    def _meta_valid(m) -> bool:
        if not m.metrics.get("complete"):
            return False
        parts = m.lineage.get("fp_parts")
        if parts:
            return all(p[2] == fp_of_range(int(p[0]), int(p[1]))
                       for p in parts)
        return m.lineage.get("fingerprint") == fp_of_range(*m.docid_range())

    done = ({s: m for s, m in completed_segments(index_dir).items()
             if _meta_valid(m)} if resume else {})
    done_ranges = sorted(m.docid_range() for m in done.values())
    # resumed ranges are disjoint by construction; guard anyway so a
    # corrupted segment store fails loudly instead of double-counting
    for (a0, a1), (b0, b1) in zip(done_ranges, done_ranges[1:]):
        if b0 < a1:
            raise RuntimeError(
                f"resume found overlapping committed docid ranges "
                f"[{a0},{a1}) and [{b0},{b1}) in {index_dir}")

    # ---- build the input dataset (pruned to needed files if possible) ----
    def _covered(lo: int, hi: int) -> bool:
        """True iff [lo, hi) is fully inside the resumed ranges."""
        pos = lo
        for r0, r1 in done_ranges:
            if r1 <= pos:
                continue
            if r0 > pos:
                return False
            pos = r1
            if pos >= hi:
                return True
        return pos >= hi

    read_source = source
    if file_ranges is not None and done_ranges:
        needed = []
        for p, lo, hi in file_ranges:
            if hi <= lo:
                continue
            if not _covered(lo, hi):
                needed.append(p)
        read_source = needed

    def _boost_cols(names) -> list[str]:
        # per-document / per-(doc, field) index-time boost side columns
        # ("__boost", "__boost__<field>"; reference add_document _boost /
        # _fieldname_boost kwargs, writing.py:473-500).  They ride next
        # to the data columns and scale posting weights in the fused
        # writer; they never land in docs.parquet.
        return [c for c in names
                if c == "__boost" or c.startswith("__boost__")]

    if isinstance(source, ray.data.Dataset):
        src_names = source.schema().names
        ds = source.select_columns(
            [c for c in schema.input_columns() if c in src_names]
            + _boost_cols(src_names)
            + ([conv_col, turn_col] if docid_col is None else [docid_col]))
    elif read_source:
        import pyarrow.parquet as _pq

        src_names = _pq.read_schema(_expand_paths(read_source)[0]).names
        cols = list(dict.fromkeys(
            schema.input_columns() + _boost_cols(src_names)
            + ([conv_col, turn_col] if docid_col is None else [docid_col])))
        # split the read well beyond the file count (files with several row
        # groups can be read by multiple tasks) so the scan keeps every CPU
        # busy instead of one task per input file
        ds = ray.data.read_parquet(read_source, columns=cols,
                                   override_num_blocks=4 * _ncpu)
    else:
        ds = None  # every file fully covered by resumed segments
        src_names = []
    if mode != "fused" and _boost_cols(src_names):
        raise ValueError(
            "__boost side columns scale posting weights in the fused "
            f"writer only (got mode={mode!r})")

    bases_ds = None
    local_paths = None
    if (bases_precomputed is None and bases_sharded is None
            and not isinstance(source, ray.data.Dataset)
            and docid_col is None):
        paths = _expand_paths(source)
        total = sum(os.path.getsize(p) for p in paths)
        if total < 2 * 1024 ** 3:
            # stats input is tiny: driver-local pyarrow aggregate
            local_paths = paths
        else:
            # dedicated column-pruned read for the conv-span aggregate so
            # the stats pass never pulls the text column off storage
            bases_ds = ray.data.read_parquet(source,
                                             columns=[conv_col, turn_col])

    docid_span = None
    if docid_col is not None and not isinstance(source, ray.data.Dataset):
        from whoosh_ray.stages.docids import docid_span_from_stats

        docid_span = docid_span_from_stats(_expand_paths(source), docid_col)

    if ds is not None:
        ds, span = with_docids(ds, conv_col=conv_col, turn_col=turn_col,
                               docid_col=docid_col, bases_ds=bases_ds,
                               local_paths=local_paths,
                               bases_precomputed=bases_precomputed,
                               bases_sharded=bases_sharded,
                               docid_span=docid_span)

    if seg_size is None:
        # segments are the unit of encode/write parallelism AND the memory
        # bound (one segment's rows materialize in one map_groups call).
        # ~16k docs/segment is the measured sweet spot (cache-sized groups,
        # good wave balance); the size is independent of the CPU budget so
        # the same corpus produces the same segments at every parallelism
        # level (smaller only when the corpus itself is small).
        seg_size = int(min(16384, max(2048, span // (4 * _ncpu))))

    def add_seg(batch: pa.Table) -> pa.Table:
        seg = pa.compute.divide(batch["docid"], seg_size).cast(pa.int64())
        return batch.append_column("seg", seg)

    if ds is not None:
        ds = ds.map_batches(add_seg, batch_format="pyarrow")

    # groupby partition count: finer than the input block count so the
    # reduce stage schedules in balanced waves (one task per ~1-2
    # segments at high CPU counts — the last wave otherwise straggles on
    # a handful of coarse multi-segment tasks)
    n_seg_est = max(1, -(-span // seg_size))
    num_partitions = int(min(n_seg_est, max(8 * _ncpu, 64)))

    if done_ranges and ds is not None:
        starts = np.array([r[0] for r in done_ranges], dtype=np.int64)
        ends = np.array([r[1] for r in done_ranges], dtype=np.int64)

        def drop_done(batch: pa.Table) -> pa.Table:
            docid = batch["docid"].to_numpy()
            idx = np.searchsorted(starts, docid, side="right") - 1
            covered = (idx >= 0) & (docid < ends[np.clip(idx, 0, None)])
            return batch.filter(pa.array(~covered))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    if ds is None:
        import pandas as _pd

        doc_stats = _pd.DataFrame(columns=[
            "seg", "doc_count", "min_docid", "max_docid", "n_terms",
            "n_postings", "field_lengths", "docs_secs", "terms_secs"])
        term_stats = doc_stats
        mode = "noop"

    if mode == "noop":
        pass  # all segments resumed; stats frames prepared above
    elif mode == "stream":
        # ---- no-shuffle streaming build: tokenize in the map task pool,
        # route tokenized posting/doc slices straight to per-segment
        # owner actors (buffered, coalesced spills), encode at finalize.
        # Replaces the sort barrier with direct routing — the multi-node
        # scale path (stages/stream_writer.py docstring).
        from whoosh_ray.stages.stream_writer import build_stream

        stats = build_stream(ds, index_dir, schema, seg_size,
                             tokenize_batch_size=tokenize_batch_size)
        doc_stats = stats
        term_stats = stats
    elif mode == "spill":
        # ---- map-side doc spill: stored rows go straight to per-segment
        # part files in the map stage; ONLY compact posting rows (dict-
        # encoded terms) cross the all-to-all exchange; the reduce encodes
        # terms and assembles docs.parquet from the parts (spill_writer.py).
        # Part files are coalesced by the block-sized tokenize batches
        # (one map call ~= one segment's rows at the default read/seg
        # sizing), so a segment gets ~1 part per overlapping block
        # instead of one per 8k-row batch.
        from whoosh_ray.stages.spill_writer import (SegmentFinalizer,
                                                    TokenizeAndSpillDocs)

        tok = TokenizeAndSpillDocs(index_dir, schema, seg_size)
        post_ds = ds.map_batches(
            tok, batch_format="pyarrow", batch_size=tokenize_batch_size,
            **({"concurrency": tokenize_concurrency}
               if tokenize_concurrency is not None else {}))
        stats = (
            post_ds.groupby("seg", num_partitions=num_partitions)
            .map_groups(SegmentFinalizer(index_dir, schema),
                        batch_format="pyarrow")
            .to_pandas()
        )
        doc_stats = stats
        term_stats = stats
    elif mode == "fused":
        # ---- single-shuffle fused path: one groupby(seg) over raw rows,
        # the segment worker writes docs.parquet AND terms.parquet
        from whoosh_ray.stages.fused_writer import FusedSegmentWriter

        commit_info = {"seg_size": seg_size, "fingerprint": fingerprint,
                       "fp_of": fp_of,
                       "source": source if isinstance(source, str)
                       else "<dataset>"}
        stats = (
            ds.groupby("seg", num_partitions=num_partitions)
            .map_groups(FusedSegmentWriter(index_dir, schema,
                                           commit=commit_info),
                        batch_format="pyarrow")
            .to_pandas()
        )
        doc_stats = stats
        term_stats = stats
    else:
        # ---- two-branch path (docs + postings shuffles separately)
        stored_cols = list(dict.fromkeys(
            [f.name for f in schema.fields if f.stored]
            + list(schema.stored_columns)))
        docs_ds = ds.select_columns(["seg", "docid"] + stored_cols)
        doc_stats = (
            docs_ds.groupby("seg", num_partitions=num_partitions)
            .map_groups(DocsFileWriter(index_dir, schema),
                        batch_format="pyarrow")
            .to_pandas()
        )
        tok = TokenizePostings(schema, seg_size)
        post_ds = ds.map_batches(
            tok,
            batch_format="pyarrow",
            batch_size=tokenize_batch_size,
            **({"concurrency": tokenize_concurrency}
               if tokenize_concurrency is not None else {}),
        )
        term_stats = (
            post_ds.groupby("seg", num_partitions=num_partitions)
            .map_groups(EncodeSegmentTerms(index_dir, schema),
                        batch_format="pyarrow")
            .to_pandas()
        )

    # ---- stragglers: a segment whose docs all analyzed to zero tokens
    # produces no posting group, so its spilled doc parts were never
    # finalized; assemble them here (empty terms table)
    parts_root = os.path.join(segroot, ".parts")
    if mode == "spill" and os.path.isdir(parts_root):
        import pandas as _pd
        import pyarrow.parquet as _pq

        from whoosh_ray.state.segment import (TERMS_ARROW_SCHEMA,
                                              write_docs_file,
                                              write_terms_file)
        from whoosh_ray.stages.write_seg import _atomic_emit

        extra_rows = []
        for name in sorted(os.listdir(parts_root)):
            pdir = os.path.join(parts_root, name)
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            if not files:
                continue
            seg_id = int(name.split("=")[1])
            docs = pa.concat_tables(
                [_pq.read_table(os.path.join(pdir, f)) for f in files])
            order = np.argsort(docs["docid"].to_numpy(), kind="stable")
            docs = docs.take(pa.array(order))
            _atomic_emit(index_dir, seg_id, "docs.parquet",
                         lambda tmp, d=docs: write_docs_file(tmp, d))
            empty = pa.table({f.name: pa.array([], type=f.type)
                              for f in TERMS_ARROW_SCHEMA})
            _atomic_emit(index_dir, seg_id, "terms.parquet",
                         lambda tmp, t=empty: write_terms_file(tmp, t))
            d = docs["docid"].to_numpy()
            extra_rows.append({
                "seg": seg_id, "doc_count": docs.num_rows,
                "min_docid": int(d[0]), "max_docid": int(d[-1]),
                "n_terms": 0, "n_postings": 0,
                "field_lengths": "{}", "docs_secs": 0.0, "terms_secs": 0.0,
            })
            _shutil.rmtree(pdir, ignore_errors=True)
        if extra_rows:
            doc_stats = _pd.concat(
                [doc_stats, _pd.DataFrame(extra_rows)], ignore_index=True)
            term_stats = doc_stats
        _shutil.rmtree(parts_root, ignore_errors=True)

    # ---- per-segment lineage commits ----
    # (fused mode commits inside the workers; reconstruct the identical
    # SegmentMeta objects from the stats rows without re-writing files)
    build_secs = time.time() - t_start
    worker_committed = mode == "fused"
    # vectorized seg -> term-stats alignment (VERDICT r4 #8: iterrows +
    # per-row .loc is a serial driver tail at million-segment manifests;
    # one sorted searchsorted + plain-array iteration replaces it).
    # Full resume leaves doc_stats an EMPTY (columnless) frame.
    if len(doc_stats) and "seg" in doc_stats.columns:
        segs_arr = doc_stats["seg"].to_numpy().astype(np.int64)
        doc_counts_arr = doc_stats["doc_count"].to_numpy().astype(np.int64)
        docs_secs_arr = doc_stats["docs_secs"].to_numpy().astype(np.float64)
    else:
        segs_arr = np.empty(0, dtype=np.int64)
        doc_counts_arr = np.empty(0, dtype=np.int64)
        docs_secs_arr = np.empty(0, dtype=np.float64)
    if len(term_stats) and "seg" in term_stats.columns:
        tsegs = term_stats["seg"].to_numpy().astype(np.int64)
        torder = np.argsort(tsegs, kind="stable")
        tsorted = tsegs[torder]
        pos = np.clip(np.searchsorted(tsorted, segs_arr), 0,
                      max(len(tsorted) - 1, 0))
        has_t = (tsorted[pos] == segs_arr) if len(tsorted) else \
            np.zeros(len(segs_arr), dtype=bool)
        tidx = torder[pos]
        t_nterms = term_stats["n_terms"].to_numpy()
        t_nposts = term_stats["n_postings"].to_numpy()
        t_secs = term_stats["terms_secs"].to_numpy()
        t_flen = term_stats["field_lengths"].to_numpy()
    else:
        has_t = np.zeros(len(segs_arr), dtype=bool)
        tidx = t_nterms = t_nposts = t_secs = t_flen = None
    new_metas = []
    for i, seg_id in enumerate(segs_arr.tolist()):
        if has_t[i]:
            j = int(tidx[i])
            field_lengths = json.loads(t_flen[j])
            metrics = {
                "complete": True,
                "n_terms": int(t_nterms[j]),
                "n_postings": int(t_nposts[j]),
                "terms_secs": float(t_secs[j]),
                "docs_secs": float(docs_secs_arr[i]),
            }
        else:  # segment had docs but zero surviving tokens
            field_lengths = {}
            metrics = {"complete": True, "n_terms": 0, "n_postings": 0,
                       "docs_secs": float(docs_secs_arr[i])}
        lineage = {"fingerprint": fp_of(seg_id),
                   "docid_range": [seg_id * seg_size,
                                   (seg_id + 1) * seg_size],
                   "source": source if isinstance(source, str) else "<dataset>"}
        if worker_committed:
            from whoosh_ray.state.manifest import SegmentMeta

            meta = SegmentMeta(
                seg_id=seg_id, docid_base=seg_id * seg_size,
                doc_count=int(doc_counts_arr[i]),
                field_lengths=field_lengths, lineage=lineage,
                metrics=metrics)
        else:
            meta = commit_segment_meta(
                index_dir, seg_id,
                docid_base=seg_id * seg_size,
                doc_count=int(doc_counts_arr[i]),
                field_lengths=field_lengths,
                lineage=lineage,
                metrics=metrics,
            )
        new_metas.append(meta)

    # ---- manifest seal: resumed segments + new segments ----
    all_metas = {m.seg_id: m for m in done.values()}  # pre-validated above
    for m in new_metas:
        all_metas[m.seg_id] = m
    if compound:
        # pack BEFORE the seal: every meta.json is committed, so the
        # pack fan-out (one Ray task batch per 16 segments, local file
        # rewrites only) sees exactly the sealed set; a crash mid-pack
        # leaves every segment readable (compound rename is atomic and
        # readers prefer segment.cmpd when both layouts exist)
        from whoosh_ray.state.compound import pack_index

        pack_index(index_dir)
    manifest = Manifest(
        schema=schema,
        segments=sorted(all_metas.values(), key=lambda m: m.seg_id),
        settings={
            "seg_size": seg_size,
            "docid_span": span,
            "fingerprint": fingerprint,
            "build_secs": build_secs,
            "resumed_segments": len(done),
            "file_lineage": file_ranges is not None,
            "files_read": (len(read_source)
                           if isinstance(read_source, list)
                           else (len(_paths) if bases_futures is not None
                                 else None)),
        },
    )
    write_manifest(index_dir, manifest)

    # ---- retire segment dirs excluded from the seal ----
    # A committed dir whose fingerprint no longer matches (source file
    # changed, or a merged segment whose range was rebuilt) is dead: if
    # left on disk, merge_segments' crash-recovery dir scan would
    # resurrect it into the manifest with an overlapping docid range.
    sealed = set(all_metas)
    for name in os.listdir(segroot):
        if not name.startswith("seg="):
            continue
        try:
            sid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if sid not in sealed:
            _shutil.rmtree(os.path.join(segroot, name), ignore_errors=True)
    return manifest


def open_index(index_dir: str) -> Manifest:
    return read_manifest(index_dir)
