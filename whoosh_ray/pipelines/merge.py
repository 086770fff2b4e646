"""Segment merging: whoosh's merge policies driven by an actor pool.

Reference: merge policies NO_MERGE / MERGE_SMALL (fibonacci heuristic:
fold the sorted prefix up to the first index ``i > 3`` whose running doc
total stays under ``fib(i + 5)``) / OPTIMIZE
(/root/reference/src/whoosh/writing.py:65-125, fib util/__init__.py:104-112),
executed by ``add_reader`` copying per-doc data and re-adding postings
for NON-DELETED docs only (writing.py:707-716) — i.e. a merge expunges
tombstones and is the point where deleted docs stop counting in stats.

Ray-native execution: the driver computes the merge plan from manifest
stats only (no data reads), then a pool of ``MergeWorker`` actors
(``map_batches(cls, concurrency=N)`` over the plan) each stream-merges
its group's segments: terms tables are already (field, term)-sorted so
the merge is a concatenate + stable re-sort; same-term posting blobs
from different segments decode → concat (docid ranges are disjoint and
ordered by construction) → re-encode via the vectorized batch codec.

Commit protocol (crash-safe): each merged segment is written under a
FRESH unused seg id, atomically renamed into place FIRST, and only then
are the input dirs retired.  A crash leaves either the inputs or the
merged output (possibly both) discoverable; the reseal drops any
segment listed in a survivor's ``lineage.merged_from``.

Divergence from the reference, on purpose: a merge group is split into
docid-adjacent runs so a merged segment's docid range never overlaps a
survivor's (the searchsorted docid→segment mapping depends on disjoint,
ordered ranges; the reference has no such invariant because its docnums
are per-segment).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from whoosh_ray.state import codec
from whoosh_ray.state.manifest import (
    Manifest,
    SegmentMeta,
    atomic_write_json,
    read_manifest,
    seg_dirname,
    write_manifest,
)

_COMBINE_COLS = ("df", "sum_tf", "total_weight", "max_weight",
                 "min_length", "max_length", "min_docid", "max_docid")


def _fib(n: int) -> int:
    """Parity: util/__init__.py:104-112 — the reference's sequence
    starts fib(1)=1, fib(2)=2 (i.e. fib(n) = standard F(n+1)), so
    fib(9) = 55, not 34."""
    if n <= 2:
        return n
    a, b = 1, 2
    for _ in range(n - 2):
        a, b = b, a + b
    return b


def _adjacent_runs(fold_ids: set[int],
                   metas: list[SegmentMeta]) -> list[list[int]]:
    """Split a fold set into runs that are adjacent in docid space
    relative to ALL segments (no survivor's range between members), so
    merged ranges stay disjoint from surviving ranges."""
    groups: list[list[int]] = []
    cur: list[int] = []
    for m in sorted(metas, key=lambda m: m.docid_range()[0]):
        if m.seg_id in fold_ids:
            cur.append(m.seg_id)
        else:
            if len(cur) > 1:
                groups.append(cur)
            cur = []
    if len(cur) > 1:
        groups.append(cur)
    return groups


def plan_merge_small(metas: list[SegmentMeta]) -> list[list[int]]:
    """MERGE_SMALL plan (writing.py:71-104 parity): scan segments sorted
    by doc count, accumulating non-zero counts; the merge point is the
    first index ``i > 3`` where the running total is under fib(i + 5);
    everything up to and including it folds, the rest stays."""
    sorted_metas = sorted(metas, key=lambda m: m.doc_count)
    total = 0
    to_merge: list[int] = []
    found = False
    for i, m in enumerate(sorted_metas):
        if m.doc_count > 0:
            total += m.doc_count
        to_merge.append(m.seg_id)
        if i > 3 and total < _fib(i + 5):
            found = True
            break
    if not (found and len(to_merge) > 1):
        return []
    return _adjacent_runs(set(to_merge), metas)


def plan_optimize(metas: list[SegmentMeta],
                  target_segments: int = 1) -> list[list[int]]:
    """Merge-all, optionally hierarchical: adjacent docid-range segments
    are chunked into ``target_segments`` groups so the mergers run in
    parallel (the single-group plan would serialize on one actor)."""
    ids = [m.seg_id for m in sorted(metas, key=lambda m: m.docid_range()[0])]
    if len(ids) <= max(1, target_segments):
        return []
    k = max(1, target_segments)
    size = (len(ids) + k - 1) // k
    groups = [ids[i: i + size] for i in range(0, len(ids), size)]
    return [g for g in groups if len(g) > 1]


def _terms_schema():
    from whoosh_ray.state.segment import TERMS_ARROW_SCHEMA

    return TERMS_ARROW_SCHEMA


def _read_deletes(seg_dir: str) -> np.ndarray:
    p = os.path.join(seg_dir, "deletes.json")
    if not os.path.exists(p):
        return np.empty(0, dtype=np.int64)
    with open(p) as f:
        return np.array(sorted(json.load(f)["docids"]), dtype=np.int64)


def _expunge(terms: pa.Table, docs: pa.Table,
             deletes: np.ndarray) -> tuple[pa.Table, pa.Table,
                                           dict[str, int], int]:
    """Filter one segment's tables down to non-deleted docs, recomputing
    per-term stats from the filtered postings (reference: add_reader
    re-adds only undeleted docs, writing.py:707-716).  Returns
    (terms, docs, removed_field_lengths, n_docs_removed).

    ``field_lengths`` totals are exact tf sums (fused_writer), so the
    removed length per field is exactly the tf mass of dropped postings —
    no dequantization error."""
    doc_ids = docs["docid"].to_numpy()
    keep_docs = ~np.isin(doc_ids, deletes, assume_unique=True)
    n_removed = int(len(doc_ids) - keep_docs.sum())
    if n_removed == 0:
        return terms, docs, {}, 0
    docs = docs.filter(pa.array(keep_docs))

    fields = terms["field"].to_numpy(zero_copy_only=False)
    posts = terms["postings"].to_pylist()
    poss = terms["positions"].to_pylist()
    chs = (terms["chars"].to_pylist() if "chars" in terms.column_names
           else [b""] * terms.num_rows)
    bst = (terms["boosts"].to_pylist() if "boosts" in terms.column_names
           else [b""] * terms.num_rows)
    stats = {c: terms[c].to_numpy(zero_copy_only=False)
             for c in _COMBINE_COLS}
    tvals = terms["term"].to_numpy(zero_copy_only=False)
    # docid-range prune: a term whose [min_docid, max_docid] cannot
    # contain any tombstone needs no blob decode at all (the stats row
    # carries the range) — on a lightly-deleted segment this skips the
    # decode for almost every term
    lo = np.searchsorted(deletes, stats["min_docid"], side="left")
    may_hit = lo < len(deletes)
    may_hit[may_hit] &= (deletes[lo[may_hit]]
                         <= stats["max_docid"][may_hit])
    removed_fl: dict[str, int] = {}
    out: dict[str, list] = {f.name: [] for f in _terms_schema()}
    for i in range(terms.num_rows):
        if not may_hit[i]:
            out["field"].append(fields[i])
            out["term"].append(tvals[i])
            for c in _COMBINE_COLS:
                out[c].append(stats[c][i])
            out["postings"].append(posts[i])
            out["positions"].append(poss[i])
            out["chars"].append(chs[i])
            out["boosts"].append(bst[i])
            continue
        p = codec.BlobReader(posts[i]).decode_all()
        keep = ~np.isin(p.docids, deletes, assume_unique=True)
        nkeep = int(keep.sum())
        if nkeep == len(p.docids):
            out["field"].append(fields[i])
            out["term"].append(tvals[i])
            for c in _COMBINE_COLS:
                out[c].append(stats[c][i])
            out["postings"].append(posts[i])
            out["positions"].append(poss[i])
            out["chars"].append(chs[i])
            out["boosts"].append(bst[i])
            continue
        fname = str(fields[i])
        removed_fl[fname] = removed_fl.get(fname, 0) + int(p.tfs[~keep].sum())
        if nkeep == 0:
            continue
        ids, tfs, lens = p.docids[keep], p.tfs[keep], p.len_bytes[keep]
        w = p.weights[keep] if p.weights is not None else None
        out["field"].append(fields[i])
        out["term"].append(tvals[i])
        out["df"].append(nkeep)
        out["sum_tf"].append(int(tfs.sum()))
        out["total_weight"].append(float(w.sum()) if w is not None
                                   else float(tfs.sum()))
        out["max_weight"].append(np.float32(w.max()) if w is not None
                                 else np.float32(tfs.max()))
        out["min_length"].append(np.uint8(lens.min()))
        out["max_length"].append(np.uint8(lens.max()))
        out["min_docid"].append(int(ids[0]))
        out["max_docid"].append(int(ids[-1]))
        out["postings"].append(codec.encode_postings(ids, tfs, lens,
                                                     weights=w))
        if poss[i]:
            plists = codec.decode_positions(poss[i], p.tfs)
            out["positions"].append(codec.encode_positions(
                [pl for pl, k in zip(plists, keep) if k]))
        else:
            out["positions"].append(b"")
        if chs[i]:
            spans = codec.decode_chars(chs[i], p.tfs)
            out["chars"].append(codec.encode_chars(
                [sp for sp, k in zip(spans, keep) if k]))
        else:
            out["chars"].append(b"")
        if bst[i]:
            blists = codec.decode_boosts(bst[i], p.tfs)
            out["boosts"].append(codec.encode_boosts(
                [bl for bl, k in zip(blists, keep) if k]))
        else:
            out["boosts"].append(b"")

    from whoosh_ray.state.segment import TERMS_ARROW_SCHEMA

    filtered = pa.table({f.name: pa.array(out[f.name], type=f.type)
                         for f in TERMS_ARROW_SCHEMA})
    return filtered, docs, removed_fl, n_removed


class MergeWorker:
    """Actor-pool callable: one input row = one merge group."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.manifest = read_manifest(index_dir)
        self._by_id = {m.seg_id: m for m in self.manifest.segments}
        self.__name__ = type(self).__name__

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            out.append(self._merge(json.loads(row["group"]),
                                   int(row["new_seg"])))
        return pa.table({"result": pa.array([json.dumps(r) for r in out])})

    def _merge(self, seg_ids: list[int], new_id: int) -> dict:
        t0 = time.time()
        seg_ids = sorted(seg_ids)
        dirs = [os.path.join(self.index_dir, "segments", seg_dirname(s))
                for s in seg_ids]

        # ---- load + expunge tombstoned docs per input segment
        terms_parts, docs_parts = [], []
        removed_fl: dict[str, int] = {}
        n_docs_removed = 0
        for d in dirs:
            from whoosh_ray.state.segment import (read_docs_file,
                                                  read_terms_file)

            t = read_terms_file(d)
            dd = read_docs_file(d)
            dels = _read_deletes(d)
            if len(dels):
                t, dd, rfl, nrm = _expunge(t, dd, dels)
                for k, v in rfl.items():
                    removed_fl[k] = removed_fl.get(k, 0) + v
                n_docs_removed += nrm
            terms_parts.append(t)
            docs_parts.append(dd)

        # ---- terms: concat -> stable sort -> combine duplicate terms
        terms = pa.concat_tables(terms_parts)
        # a merge RECLAIMS removed fields (reference test_optimize_away:
        # optimize after remove_field drops the field's data): postings
        # of fields absent from the current schema are filtered out here
        schema_fields = {f.name for f in self.manifest.schema.fields}
        if terms.num_rows:
            fcol = terms["field"].to_numpy(zero_copy_only=False)
            keep = np.array([f in schema_fields for f in fcol])
            if not keep.all():
                terms = terms.take(pa.array(np.flatnonzero(keep)))
        # stable sort by (field, term); min_docid orders duplicates since
        # docid ranges are disjoint per segment
        fields = terms["field"].to_numpy(zero_copy_only=False)
        tvals = terms["term"].to_numpy(zero_copy_only=False)
        from whoosh_ray.state.segment import (TERMS_ARROW_SCHEMA,
                                              write_docs_file,
                                              write_terms_file)

        if terms.num_rows == 0:
            merged_terms = pa.table(
                {f.name: pa.array([], type=f.type)
                 for f in TERMS_ARROW_SCHEMA})
        else:
            mind = terms["min_docid"].to_numpy()
            order = np.lexsort((mind, tvals, fields))
            terms = terms.take(pa.array(order))
            fields = fields[order]
            tvals = tvals[order]

            change = np.empty(len(tvals), dtype=bool)
            change[0] = True
            change[1:] = ((fields[1:] != fields[:-1])
                          | (tvals[1:] != tvals[:-1]))
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(tvals))

            rows = {f.name: [] for f in TERMS_ARROW_SCHEMA}
            posts = terms["postings"].to_pylist()
            poss = terms["positions"].to_pylist()
            chs = (terms["chars"].to_pylist()
                   if "chars" in terms.column_names
                   else [b""] * terms.num_rows)
            bst = (terms["boosts"].to_pylist()
                   if "boosts" in terms.column_names
                   else [b""] * terms.num_rows)
            col = {c: terms[c].to_numpy(zero_copy_only=False)
                   for c in _COMBINE_COLS}
            for s, e in zip(starts, ends):
                s, e = int(s), int(e)
                rows["field"].append(fields[s])
                rows["term"].append(tvals[s])
                rows["df"].append(int(col["df"][s:e].sum()))
                rows["sum_tf"].append(int(col["sum_tf"][s:e].sum()))
                rows["total_weight"].append(float(col["total_weight"][s:e].sum()))
                rows["max_weight"].append(np.float32(col["max_weight"][s:e].max()))
                rows["min_length"].append(np.uint8(col["min_length"][s:e].min()))
                rows["max_length"].append(np.uint8(col["max_length"][s:e].max()))
                rows["min_docid"].append(int(col["min_docid"][s]))
                rows["max_docid"].append(int(col["max_docid"][s:e].max()))
                if e - s == 1:
                    rows["postings"].append(posts[s])
                    rows["positions"].append(poss[s])
                    rows["chars"].append(chs[s])
                    rows["boosts"].append(bst[s])
                else:
                    parts = [codec.BlobReader(posts[j]).decode_all()
                             for j in range(s, e)]
                    ids = np.concatenate([p.docids for p in parts])
                    tfs = np.concatenate([p.tfs for p in parts])
                    lens = np.concatenate([p.len_bytes for p in parts])
                    w = None
                    if any(p.weights is not None for p in parts):
                        w = np.concatenate([
                            p.weights if p.weights is not None
                            else p.tfs.astype(np.float32) for p in parts])
                    rows["postings"].append(
                        codec.encode_postings(ids, tfs, lens, weights=w))
                    if any(poss[j] for j in range(s, e)):
                        plists = []
                        for j in range(s, e):
                            plists.extend(codec.decode_positions(poss[j],
                                                                 parts[j - s].tfs))
                        rows["positions"].append(codec.encode_positions(plists))
                    else:
                        rows["positions"].append(b"")
                    if all(chs[j] for j in range(s, e)):
                        spans = []
                        for j in range(s, e):
                            spans.extend(codec.decode_chars(chs[j],
                                                            parts[j - s].tfs))
                        rows["chars"].append(codec.encode_chars(spans))
                    else:
                        rows["chars"].append(b"")
                    if all(bst[j] for j in range(s, e)):
                        blists = []
                        for j in range(s, e):
                            blists.extend(codec.decode_boosts(bst[j],
                                                              parts[j - s].tfs))
                        rows["boosts"].append(codec.encode_boosts(blists))
                    else:
                        rows["boosts"].append(b"")

            merged_terms = pa.table(
                {f.name: pa.array(rows[f.name], type=f.type)
                 for f in TERMS_ARROW_SCHEMA})

        docs = pa.concat_tables(docs_parts)
        docs = docs.take(pa.array(np.argsort(docs["docid"].to_numpy(),
                                             kind="stable")))
        # stored columns of removed fields reclaim too
        allowed = {"docid", *self.manifest.schema.stored_columns}
        for f in self.manifest.schema.fields:
            allowed.update((f.name, f"{f.name}__vector_terms",
                            f"{f.name}__vector_weights"))
        keep_cols = [c for c in docs.column_names if c in allowed]
        if len(keep_cols) != len(docs.column_names):
            docs = docs.select(keep_cols)

        # ---- atomic commit: rename the merged segment into place under a
        # FRESH id first, then retire the inputs
        tmp = os.path.join(self.index_dir, "segments",
                           f".merge-tmp-{new_id}-{os.getpid()}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        write_terms_file(tmp, merged_terms)
        write_docs_file(tmp, docs)
        metas = [self._by_id[s] for s in seg_ids]
        field_lengths: dict[str, int] = {}
        for m in metas:
            for k, v in m.field_lengths.items():
                field_lengths[k] = field_lengths.get(k, 0) + v
        for k, v in removed_fl.items():
            field_lengths[k] = field_lengths.get(k, 0) - v
        # removed fields contribute no lengths to the merged segment
        field_lengths = {k: v for k, v in field_lengths.items()
                         if k in schema_fields}
        # fp_parts: each constituent (lo, hi, fingerprint) so build-resume
        # can re-validate a merged segment range-by-range against the
        # current input files (build.py _meta_valid); inputs that are
        # themselves merges contribute their own parts
        fp_parts: list[list] = []
        for m in metas:
            parts = m.lineage.get("fp_parts")
            if parts:
                fp_parts.extend([list(p) for p in parts])
            elif m.lineage.get("fingerprint"):
                lo, hi = m.docid_range()
                fp_parts.append([lo, hi, m.lineage["fingerprint"]])
        merged_meta = SegmentMeta(
            seg_id=new_id,
            docid_base=min(m.docid_base for m in metas),
            doc_count=sum(m.doc_count for m in metas) - n_docs_removed,
            field_lengths=field_lengths,
            lineage={"merged_from": seg_ids,
                     **{k: v for k, v in metas[0].lineage.items()
                        if k == "fingerprint"},
                     "fp_parts": fp_parts,
                     "docid_range": [
                         min(m.docid_range()[0] for m in metas),
                         max(m.docid_range()[1] for m in metas)]},
            metrics={"complete": True, "merge_secs": time.time() - t0,
                     "n_terms": merged_terms.num_rows,
                     "docs_expunged": n_docs_removed},
        )
        atomic_write_json(os.path.join(tmp, "meta.json"), merged_meta.to_json())
        final = os.path.join(self.index_dir, "segments", seg_dirname(new_id))
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
        return {"new_seg": new_id, "merged": seg_ids,
                "secs": time.time() - t0}


def merge_segments(index_dir: str, policy: str = "MERGE_SMALL",
                   concurrency: int = 2,
                   target_segments: int = 1) -> Manifest:
    """Apply a merge policy; returns the resealed manifest."""
    manifest = read_manifest(index_dir)
    if policy == "NO_MERGE":
        return manifest
    # OverlayStorage facade (read base / write overlay): merges only
    # rewrite overlay-RESIDENT segments — base segments are read-only by
    # contract (reference OverlayStorage writes go to storage B only,
    # filedb/filestore.py:338-358), so they pass through the reseal
    overlay_base = manifest.settings.get("overlay_base")
    if overlay_base is not None:
        from whoosh_ray.state.manifest import completed_segments as _cs

        resident = set(_cs(index_dir))
        mergeable = [m for m in manifest.segments if m.seg_id in resident]
        base_metas = [m for m in manifest.segments
                      if m.seg_id not in resident]
    else:
        mergeable, base_metas = manifest.segments, []
    plan = (plan_optimize(mergeable, target_segments)
            if policy == "OPTIMIZE"
            else plan_merge_small(mergeable))
    if policy == "OPTIMIZE":
        # optimize also RECLAIMS removed fields (reference
        # test_optimize_away): segments still carrying data for fields
        # absent from the current schema rewrite even when there is
        # nothing to fold (single-member groups)
        schema_fields = {f.name for f in manifest.schema.fields}
        planned = {s for g in plan for s in g}
        stale = [m.seg_id for m in mergeable
                 if m.seg_id not in planned
                 and set(m.field_lengths) - schema_fields]
        plan = plan + [[s] for s in stale]
    if plan:
        next_id = max((m.seg_id for m in manifest.segments), default=-1) + 1
        items = [{"group": json.dumps(g), "new_seg": next_id + i}
                 for i, g in enumerate(plan)]
        ds = ray.data.from_items(items)
        ds.map_batches(MergeWorker, batch_format="pyarrow",
                       batch_size=1, concurrency=min(concurrency, len(items)),
                       fn_constructor_args=(index_dir,)).to_pandas()
    # reseal from surviving segment dirs; a segment named in another
    # survivor's merged_from lineage was replaced — drop (and clean) it,
    # so a crash between rename and input-retire never double-counts
    from whoosh_ray.state.manifest import completed_segments

    survivors = completed_segments(index_dir)
    retired: set[int] = set()
    for m in survivors.values():
        retired.update(int(s) for s in m.lineage.get("merged_from", []))
    for sid in list(survivors):
        if sid in retired:
            shutil.rmtree(os.path.join(index_dir, "segments",
                                       seg_dirname(sid)),
                          ignore_errors=True)
            del survivors[sid]
    # disjointness guard: the dir scan exists for crash recovery, but it
    # must never resurrect a stale dir the previous build/reseal excluded
    # from its manifest.  On a docid-range overlap, prefer the segment the
    # CURRENT manifest knows about and drop (and delete) the stranger;
    # an overlap among manifest members is unrecoverable — fail loudly.
    known = {m.seg_id for m in manifest.segments} | {
        int(it["new_seg"]) for it in (items if plan else [])}

    def _drop(meta):
        shutil.rmtree(os.path.join(index_dir, "segments",
                                   seg_dirname(meta.seg_id)),
                      ignore_errors=True)
        del survivors[meta.seg_id]

    # compare OCCUPIED spans [docid_base, docid_base + doc_count): a
    # build segment's nominal lineage range is the full seg_size slot
    # even when the corpus ends mid-slot, and a writer-APPENDED segment
    # legitimately bases inside that trailing gap — only actually-
    # occupied docids may not collide (docids are contiguous per
    # segment by the dense-rank invariant)
    def occ(meta):
        return (meta.docid_base, meta.docid_base + meta.doc_count)

    kept: list[SegmentMeta] = []
    for m in sorted(survivors.values(), key=occ):
        while kept and m is not None and occ(m)[0] < occ(kept[-1])[1]:
            prev = kept[-1]
            stranger = next((x for x in (prev, m)
                             if x.seg_id not in known), None)
            if stranger is None:
                raise RuntimeError(
                    f"merge reseal: overlapping docid ranges "
                    f"{occ(prev)} (seg {prev.seg_id}) and "
                    f"{occ(m)} (seg {m.seg_id}) in {index_dir}")
            _drop(stranger)
            if stranger is m:
                m = None
            else:
                kept.pop()
        if m is not None:
            kept.append(m)
    manifest = Manifest(schema=manifest.schema,
                        segments=sorted(list(survivors.values())
                                        + base_metas,
                                        key=lambda m: m.seg_id),
                        settings=manifest.settings)
    write_manifest(index_dir, manifest)
    return manifest
