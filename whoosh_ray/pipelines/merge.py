"""Segment merging: whoosh's merge policies driven by an actor pool.

Reference: merge policies NO_MERGE / MERGE_SMALL (fibonacci heuristic:
fold the smallest segments while ``total_docs < fib(i + 5)``) / OPTIMIZE
(/root/reference/src/whoosh/writing.py:65-125, fib util/__init__.py:104-112),
executed by ``add_reader`` copying per-doc data and re-adding postings
(writing.py:707-716).

Ray-native execution: the driver computes the merge plan from manifest
stats only (no data reads), then a pool of ``MergeWorker`` actors
(``map_batches(cls, concurrency=N)`` over the plan) each stream-merges
its group's segments: terms tables are already (field, term)-sorted so
the merge is a concatenate + stable re-sort; same-term posting blobs
from different segments decode → concat (docid ranges are disjoint and
ordered by construction) → re-encode via the vectorized batch codec.
Merged segments commit atomically like build segments; the manifest is
resealed with the survivors.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
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


def _fib(n: int) -> int:
    """Parity: util/__init__.py:104-112."""
    a, b = 0, 1
    for _ in range(n):
        a, b = b, a + b
    return a


def plan_merge_small(metas: list[SegmentMeta]) -> list[list[int]]:
    """MERGE_SMALL plan (writing.py:71-104): sort segments by doc count;
    fold a growing prefix while the running total stays under fib(i+5)."""
    sorted_metas = sorted(metas, key=lambda m: m.doc_count)
    total = 0
    group: list[int] = []
    for i, m in enumerate(sorted_metas):
        total += m.doc_count
        if total < _fib(i + 5):
            group.append(m.seg_id)
        else:
            break
    return [group] if len(group) > 1 else []


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


class MergeWorker:
    """Actor-pool callable: one input row = one merge group."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.manifest = read_manifest(index_dir)
        self._by_id = {m.seg_id: m for m in self.manifest.segments}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for group_json in batch["group"].to_pylist():
            out.append(self._merge(json.loads(group_json)))
        return pa.table({"result": pa.array([json.dumps(r) for r in out])})

    def _merge(self, seg_ids: list[int]) -> dict:
        t0 = time.time()
        seg_ids = sorted(seg_ids)
        new_id = seg_ids[0]
        dirs = [os.path.join(self.index_dir, "segments", seg_dirname(s))
                for s in seg_ids]

        # ---- terms: concat -> stable sort -> combine duplicate terms
        terms = pa.concat_tables(
            [pq.read_table(os.path.join(d, "terms.parquet")) for d in dirs])
        # stable sort by (field, term); min_docid orders duplicates since
        # docid ranges are disjoint per segment
        fields = terms["field"].to_numpy(zero_copy_only=False)
        tvals = terms["term"].to_numpy(zero_copy_only=False)
        mind = terms["min_docid"].to_numpy()
        order = np.lexsort((mind, tvals, fields))
        terms = terms.take(pa.array(order))
        fields = fields[order]
        tvals = tvals[order]

        change = np.empty(len(tvals), dtype=bool)
        change[0] = True
        change[1:] = (fields[1:] != fields[:-1]) | (tvals[1:] != tvals[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(tvals))

        rows = {name: [] for name in terms.column_names}
        posts = terms["postings"].to_pylist()
        poss = terms["positions"].to_pylist()
        col = {c: terms[c].to_numpy(zero_copy_only=False)
               for c in ("df", "sum_tf", "total_weight", "max_weight",
                          "min_length", "max_length", "min_docid", "max_docid")}
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
            else:
                parts = [codec.BlobReader(posts[j]).decode_all()
                         for j in range(s, e)]
                ids = np.concatenate([p.docids for p in parts])
                tfs = np.concatenate([p.tfs for p in parts])
                lens = np.concatenate([p.len_bytes for p in parts])
                rows["postings"].append(codec.encode_postings(ids, tfs, lens))
                if any(poss[j] for j in range(s, e)):
                    plists = []
                    for j in range(s, e):
                        plists.extend(codec.decode_positions(poss[j],
                                                             parts[j - s].tfs))
                    rows["positions"].append(codec.encode_positions(plists))
                else:
                    rows["positions"].append(b"")

        from whoosh_ray.state.segment import (TERMS_ARROW_SCHEMA,
                                              write_docs_file,
                                              write_terms_file)

        merged_terms = pa.table({f.name: pa.array(rows[f.name], type=f.type)
                                 for f in TERMS_ARROW_SCHEMA})

        docs = pa.concat_tables(
            [pq.read_table(os.path.join(d, "docs.parquet")) for d in dirs])
        docs = docs.take(pa.array(np.argsort(docs["docid"].to_numpy(),
                                             kind="stable")))

        # ---- atomic commit of the merged segment, then retire inputs
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
        merged_meta = SegmentMeta(
            seg_id=new_id,
            docid_base=min(m.docid_base for m in metas),
            doc_count=sum(m.doc_count for m in metas),
            field_lengths=field_lengths,
            lineage={"merged_from": seg_ids,
                     **{k: v for k, v in metas[0].lineage.items()
                        if k == "fingerprint"},
                     "docid_range": [
                         min(m.lineage.get("docid_range", [m.docid_base])[0]
                             for m in metas),
                         max(m.lineage.get("docid_range", [m.docid_base + m.doc_count])[-1]
                             for m in metas)]},
            metrics={"complete": True, "merge_secs": time.time() - t0,
                     "n_terms": merged_terms.num_rows},
        )
        atomic_write_json(os.path.join(tmp, "meta.json"), merged_meta.to_json())
        final = os.path.join(self.index_dir, "segments", seg_dirname(new_id))
        for d, s in zip(dirs, seg_ids):
            if s != new_id:
                shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        return {"new_seg": new_id, "merged": seg_ids,
                "secs": time.time() - t0}


def merge_segments(index_dir: str, policy: str = "MERGE_SMALL",
                   concurrency: int = 2,
                   target_segments: int = 1) -> Manifest:
    """Apply a merge policy; returns the resealed manifest."""
    manifest = read_manifest(index_dir)
    if policy == "NO_MERGE":
        return manifest
    plan = (plan_optimize(manifest.segments, target_segments)
            if policy == "OPTIMIZE"
            else plan_merge_small(manifest.segments))
    if plan:
        items = [{"group": json.dumps(g)} for g in plan]
        ds = ray.data.from_items(items)
        ds.map_batches(MergeWorker, batch_format="pyarrow",
                       batch_size=1, concurrency=min(concurrency, len(items)),
                       fn_constructor_args=(index_dir,)).to_pandas()
    # reseal from surviving segment dirs
    from whoosh_ray.state.manifest import completed_segments

    survivors = completed_segments(index_dir)
    manifest = Manifest(schema=manifest.schema,
                        segments=sorted(survivors.values(),
                                        key=lambda m: m.seg_id),
                        settings=manifest.settings)
    write_manifest(index_dir, manifest)
    return manifest
