"""Index manifest: commit protocol, per-partition lineage, checkpoint-resume.

The reference commits an index generation by atomically writing a TOC file
naming the live segments (/root/reference/src/whoosh/index.py:567-712,
atomic temp-file rename :673-712).  That all-or-nothing commit doesn't
scale to a 100 TB build, so this engine commits *per partition*:

- every segment directory ``segments/seg=NNNNN/`` is written under a temp
  name and atomically renamed into place, with a ``meta.json`` lineage
  entry (input fingerprint, docid range, doc count, exact per-field token
  totals, build metrics) written last inside it;
- a final ``manifest.json`` seal aggregates the segment entries plus the
  global stats BM25 needs (doc_count_all, per-field total lengths →
  avg_field_length, searching.py:259-262);
- resume = re-run the build; segments whose ``meta.json`` exists with a
  matching lineage fingerprint are skipped before tokenization.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from whoosh_ray.state.schema import IndexSchema

FORMAT_VERSION = 1


def seg_dirname(seg_id: int) -> str:
    return f"seg={seg_id:05d}"


@dataclass
class SegmentMeta:
    seg_id: int
    docid_base: int
    doc_count: int
    field_lengths: dict[str, int] = field(default_factory=dict)  # exact totals
    lineage: dict = field(default_factory=dict)
    metrics: dict = field(default_factory=dict)

    def docid_range(self) -> tuple[int, int]:
        """[base, end) covered by this segment (merged segments span the
        union of their inputs' ranges)."""
        r = self.lineage.get("docid_range")
        if r:
            return int(r[0]), int(r[-1])
        return self.docid_base, self.docid_base + self.doc_count

    def to_json(self) -> dict:
        return {
            "seg_id": self.seg_id,
            "docid_base": self.docid_base,
            "doc_count": self.doc_count,
            "field_lengths": self.field_lengths,
            "lineage": self.lineage,
            "metrics": self.metrics,
        }

    @staticmethod
    def from_json(d: dict) -> "SegmentMeta":
        return SegmentMeta(
            seg_id=d["seg_id"], docid_base=d["docid_base"],
            doc_count=d["doc_count"],
            field_lengths={k: int(v) for k, v in d["field_lengths"].items()},
            lineage=d.get("lineage", {}), metrics=d.get("metrics", {}),
        )


@dataclass
class Manifest:
    schema: IndexSchema
    segments: list[SegmentMeta]
    settings: dict = field(default_factory=dict)
    # global stats cached from a sealed manifest file (set by
    # read_manifest for parquet-spilled manifests, where re-summing
    # millions of segment rows per property call would be wasteful).
    # Code paths that EDIT segments build fresh Manifest objects, so the
    # cache can't go stale.
    cached_global: dict | None = None

    @property
    def doc_count_all(self) -> int:
        if self.cached_global is not None:
            return int(self.cached_global["doc_count_all"])
        return sum(s.doc_count for s in self.segments)

    def field_length(self, fieldname: str) -> int:
        if self.cached_global is not None:
            return int(self.cached_global["field_lengths"]
                       .get(fieldname, 0))
        return sum(s.field_lengths.get(fieldname, 0) for s in self.segments)

    def avg_field_length(self, fieldname: str) -> float:
        """Parity: searching.py:259-262 — total exact length / doc_count_all."""
        dc = self.doc_count_all
        if not dc:
            return 1.0
        return self.field_length(fieldname) / dc

    def to_json(self) -> dict:
        return {
            "version": FORMAT_VERSION,
            "schema": self.schema.to_json(),
            "settings": self.settings,
            "segments": [s.to_json() for s in sorted(self.segments,
                                                     key=lambda s: s.seg_id)],
            "global": {
                "doc_count_all": self.doc_count_all,
                "field_lengths": {
                    f.name: self.field_length(f.name)
                    for f in self.schema.fields
                },
            },
        }


def atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


# Above this many segments the manifest's segment list spills to a
# columnar sidecar (manifest_segments.parquet): a 10^12-turn index has
# millions of segment partitions, and a JSON array of them would be a
# multi-GB parse on every open.  The parquet is written (atomically)
# BEFORE manifest.json — the json's presence implies the sidecar is in
# place — and manifest.json keeps only the pointer + the precomputed
# global stats.
SEGMENTS_SPILL_THRESHOLD = int(os.environ.get(
    "WHOOSH_RAY_MANIFEST_SPILL", "10000"))
_SEGMENTS_PARQUET = "manifest_segments.parquet"


def write_manifest(index_dir: str, manifest: Manifest) -> str:
    path = os.path.join(index_dir, "manifest.json")
    # monotonic commit counter: coarse-granularity mtimes cannot
    # distinguish two commits in the same timestamp tick, so
    # up_to_date()/latest_generation() compare this instead (ADVICE r3)
    prev = -1
    try:
        with open(path) as f:
            prev = int(json.load(f).get("settings", {})
                       .get("generation", -1))
    except (OSError, ValueError, json.JSONDecodeError):
        pass
    manifest.settings["generation"] = prev + 1
    d = manifest.to_json()
    spath = os.path.join(index_dir, _SEGMENTS_PARQUET)
    if len(manifest.segments) > SEGMENTS_SPILL_THRESHOLD:
        import pyarrow as pa
        import pyarrow.parquet as pq

        segs = d.pop("segments")
        t = pa.table({
            "seg_id": pa.array([s["seg_id"] for s in segs],
                               type=pa.int64()),
            "docid_base": pa.array([s["docid_base"] for s in segs],
                                   type=pa.int64()),
            "doc_count": pa.array([s["doc_count"] for s in segs],
                                  type=pa.int64()),
            "field_lengths": pa.array([json.dumps(s["field_lengths"])
                                       for s in segs]),
            "lineage": pa.array([json.dumps(s["lineage"]) for s in segs]),
            "metrics": pa.array([json.dumps(s["metrics"]) for s in segs]),
        })
        pq.write_table(t, spath + ".tmp")
        os.replace(spath + ".tmp", spath)
        d["segments"] = []
        d["segments_parquet"] = _SEGMENTS_PARQUET
    elif os.path.exists(spath):
        os.remove(spath)  # shrunk below the bound: json is authoritative
    atomic_write_json(path, d)
    return path


def read_manifest(index_dir: str) -> Manifest:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        d = json.load(f)
    if d.get("segments_parquet"):
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(index_dir, d["segments_parquet"]))
        segments = [
            SegmentMeta(
                seg_id=int(t["seg_id"][i].as_py()),
                docid_base=int(t["docid_base"][i].as_py()),
                doc_count=int(t["doc_count"][i].as_py()),
                field_lengths={k: int(v) for k, v in
                               json.loads(t["field_lengths"][i].as_py())
                               .items()},
                lineage=json.loads(t["lineage"][i].as_py()),
                metrics=json.loads(t["metrics"][i].as_py()),
            )
            for i in range(t.num_rows)
        ]
        return Manifest(schema=IndexSchema.from_json(d["schema"]),
                        segments=segments,
                        settings=d.get("settings", {}),
                        cached_global=d.get("global"))
    return Manifest(
        schema=IndexSchema.from_json(d["schema"]),
        segments=[SegmentMeta.from_json(s) for s in d["segments"]],
        settings=d.get("settings", {}),
    )


def read_segment_meta(index_dir: str, seg_id: int) -> SegmentMeta | None:
    p = os.path.join(index_dir, "segments", seg_dirname(seg_id), "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return SegmentMeta.from_json(json.load(f))


def completed_segments(index_dir: str) -> dict[int, SegmentMeta]:
    """Scan for committed segment partitions (the resume set)."""
    segroot = os.path.join(index_dir, "segments")
    out: dict[int, SegmentMeta] = {}
    if not os.path.isdir(segroot):
        return out
    for name in os.listdir(segroot):
        if not name.startswith("seg="):
            continue
        p = os.path.join(segroot, name, "meta.json")
        if os.path.exists(p):
            with open(p) as f:
                m = SegmentMeta.from_json(json.load(f))
            out[m.seg_id] = m
    return out
