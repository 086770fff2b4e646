"""Top-level index facade — the reference's ``whoosh.index`` entry
points (``create_in``/``open_dir``/``exists_in``/``version_in`` and the
``Index`` object, reference index.py:85-470) over this engine's
manifest + segment-dir layout.

An "index" here is one directory holding ``manifest.json`` +
``segments/``; ``indexname`` scopes multiple indexes inside one parent
directory like the reference's ``_<indexname>`` file prefixes do
(index.py:98-105).  ``create_in`` seals an EMPTY manifest immediately —
the reference's create-then-commit-empty-TOC behavior — so a fresh
index is searchable (0 docs) before any writer commit.  There are no
file locks: commits are single-driver manifest swaps, so
``up_to_date``/``refresh`` compare the manifest generation counter.
"""

from __future__ import annotations

import os
import shutil

from whoosh_ray.state.manifest import (
    FORMAT_VERSION,
    Manifest,
    read_manifest,
    seg_dirname,
    write_manifest,
)
from whoosh_ray.state.schema import IndexSchema

_DEF_INDEX_NAME = "MAIN"


class IndexError_(Exception):
    """Generic index error (the reference exports ``IndexError``
    shadowing the builtin, index.py:47-57; renamed here to avoid the
    shadow — ``IndexVersionError``/``OutOfDateError`` subclass it like
    the reference's)."""


class IndexVersionError(IndexError_):
    """The on-disk format is newer/older than this library reads
    (reference index.py:59-70)."""

    def __init__(self, msg, version, release=None):
        super().__init__(msg)
        self.version = version
        self.release = release


class OutOfDateError(IndexError_):
    """A commit raced a newer generation (reference index.py:72-75)."""


class EmptyIndexError(Exception):
    """The directory holds no index (reference index.py:78-82)."""


def _ix_dir(dirname: str, indexname: str | None) -> str:
    return os.path.join(dirname, indexname or _DEF_INDEX_NAME)


def create_in(dirname: str, schema: IndexSchema,
              indexname: str | None = None, *,
              seg_size: int = 16384, conv_col: str = "conv_id",
              turn_col: str = "turn_idx") -> "Index":
    """Create (or CLEAR — reference parity, index.py:85-105) an index
    under ``dirname`` and return it.  ``conv_col``/``turn_col`` name
    the document-identity columns writers will use."""
    if isinstance(schema, type):
        # a declarative SchemaClass (whoosh_ray.fields) — bind it
        from whoosh_ray.fields import ensure_schema

        schema = ensure_schema(schema)
    path = _ix_dir(dirname, indexname)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.join(path, "segments"), exist_ok=True)
    manifest = Manifest(schema=schema, segments=[], settings={
        "seg_size": int(seg_size), "docid_span": 0,
        "conv_col": conv_col, "turn_col": turn_col,
    })
    write_manifest(path, manifest)
    return Index(path)


def open_dir(dirname: str, indexname: str | None = None) -> "Index":
    path = _ix_dir(dirname, indexname)
    if not exists_in(dirname, indexname):
        # fall back to treating dirname itself as the index dir, so
        # indexes built directly by build_index(dir, ...) open too
        if indexname is None and os.path.exists(
                os.path.join(dirname, "manifest.json")):
            return Index(dirname)
        raise EmptyIndexError(f"no index named {indexname or _DEF_INDEX_NAME}"
                              f" in {dirname}")
    return Index(path)


def open_overlay(base_dir: str, overlay_dir: str) -> "Index":
    """Open ``base_dir``'s index through an overlay: every read falls
    back to the base per-file, every write (new segments, tombstones,
    merges of overlay-resident segments, commits) lands in
    ``overlay_dir`` — the base is never modified.

    Reference analogue: ``OverlayStorage`` (filedb/filestore.py:313-375),
    a union mount that "reads from A unless the file exists in B, writes
    to B".  Same shadowing rule here, at segment-file granularity: base
    ``deletes.json`` files are snapshotted into the overlay at creation
    (a shadow file fully replaces its base twin, so the union stays
    exact when new tombstones accumulate).

    Idempotent: re-opening an existing overlay keeps its state."""
    base_dir = os.path.abspath(base_dir)
    if os.path.exists(os.path.join(overlay_dir, "manifest.json")):
        return Index(overlay_dir)
    base = read_manifest(base_dir)
    os.makedirs(os.path.join(overlay_dir, "segments"), exist_ok=True)
    for m in base.segments:
        src = os.path.join(base_dir, "segments", seg_dirname(m.seg_id),
                           "deletes.json")
        if os.path.exists(src):
            dst_dir = os.path.join(overlay_dir, "segments",
                                   seg_dirname(m.seg_id))
            os.makedirs(dst_dir, exist_ok=True)
            shutil.copy(src, os.path.join(dst_dir, "deletes.json"))
    manifest = Manifest(schema=base.schema, segments=list(base.segments),
                        settings={**base.settings,
                                  "overlay_base": base_dir})
    write_manifest(overlay_dir, manifest)
    return Index(overlay_dir)


def exists_in(dirname: str, indexname: str | None = None) -> bool:
    return os.path.exists(os.path.join(_ix_dir(dirname, indexname),
                                       "manifest.json"))


def version_in(dirname: str, indexname: str | None = None) -> tuple:
    """(library version, manifest format version) — reference
    version_in returns (release, format) (index.py:157-181)."""
    from whoosh_ray import __version__

    open_dir(dirname, indexname)  # raises EmptyIndexError when absent
    return (__version__, FORMAT_VERSION)


# reference module-level conveniences (index.py:146-196): ``exists``/
# ``version`` take a directory here (the Storage role is a directory
# of parquet/blob files)
exists = exists_in
version = version_in

# the writer's advisory flock error, re-exported where the reference
# keeps it (whoosh.index.LockError)
from whoosh_ray.pipelines.writer import LockError  # noqa: E402


class Index:
    """Handle on one index directory: writers, searchers, maintenance
    (reference Index/FileIndex, index.py:217-470)."""

    @classmethod
    def create(cls, storage, schema, indexname: str | None = None) -> "Index":
        """Create a new index in the given Storage / directory
        (reference FileIndex.create, index.py:423-439)."""
        folder = getattr(storage, "folder", storage)
        return create_in(folder, schema, indexname)

    def __init__(self, index_dir: str, schema=None,
                 indexname: str | None = None):
        # also accept a Storage object, like the reference
        # FileIndex(storage, schema=None, indexname="MAIN")
        folder = getattr(index_dir, "folder", None)
        if folder is not None:
            index_dir = _ix_dir(folder, indexname) if os.path.exists(
                os.path.join(_ix_dir(folder, indexname), "manifest.json")
            ) else folder
        self.index_dir = index_dir
        self._manifest = read_manifest(index_dir)
        if schema is not None:
            self._manifest.schema = schema

    def __repr__(self):
        return f"Index({self.index_dir!r})"

    # ---- metadata ----

    @property
    def schema(self) -> IndexSchema:
        return self._mf().schema

    def refresh(self) -> "Index":
        """Re-read the manifest (reference returns an up-to-date
        version of this index, index.py:257-264)."""
        self._manifest = read_manifest(self.index_dir)
        return self

    def latest_generation(self) -> float:
        """Commit marker — the manifest's monotonic generation counter
        (falls back to mtime for pre-counter manifests).  The engine
        swaps one manifest instead of numbering TOC generations."""
        path = os.path.join(self.index_dir, "manifest.json")
        try:
            import json as _json

            with open(path) as f:
                gen = _json.load(f).get("settings", {}).get("generation")
            if gen is not None:
                return int(gen)
            return os.path.getmtime(path)
        except (OSError, ValueError):
            return -1

    def last_modified(self) -> float:
        return self.latest_generation()

    def up_to_date(self) -> bool:
        """Whether this handle reflects the latest committed generation
        (reference index.py:294-300); the Searcher has the same check."""
        mine = self._manifest.settings.get("generation")
        if mine is None:
            return True
        return self.latest_generation() == mine

    def _mf(self):
        """Current manifest: the reference Index re-reads the TOC per
        accessor, so a writer's commit is visible on the same handle —
        refresh only when the generation moved."""
        if not self.up_to_date():
            self._manifest = read_manifest(self.index_dir)
        return self._manifest

    def is_empty(self) -> bool:
        return self._mf().doc_count_all == 0

    def doc_count_all(self) -> int:
        return self._mf().doc_count_all

    def doc_count(self) -> int:
        return self.searcher().doc_count()

    def field_length(self, fieldname: str) -> int:
        return self._mf().field_length(fieldname)

    def field_names(self) -> list[str]:
        return list(self._mf().schema.field_names)

    def max_field_length(self, fieldname: str) -> int:
        """Largest per-doc quantized field length (reference
        index.py Index.max_field_length → reader)."""
        return self.searcher().max_field_length(fieldname)

    def min_field_length(self, fieldname: str) -> int:
        return self.searcher().min_field_length(fieldname)

    def version(self) -> int:
        """The manifest format version (reference FileIndex.version)."""
        return FORMAT_VERSION

    def lock(self, name: str = "WRITELOCK") -> bool:
        """API-compat no-op (reference FileIndex.lock acquires a file
        lock; this engine's per-partition atomic-rename commits and
        monotonic manifest generations need none).  Returns True like a
        successfully acquired reference lock."""
        return True

    def release(self, name: str = "WRITELOCK") -> None:
        pass

    def close(self) -> None:
        pass  # no file handles held at this level

    # ---- access ----

    def searcher(self, **kw):
        from whoosh_ray.search.searcher import Searcher

        return Searcher(self.index_dir, **kw)

    def reader(self, **kw):
        """The Searcher doubles as the reader (reader statistics and
        document-lookup conveniences live there)."""
        return self.searcher(**kw)

    def writer(self, **kw):
        from whoosh_ray.pipelines.writer import IndexWriter

        kw.setdefault("conv_col",
                      self._manifest.settings.get("conv_col", "conv_id"))
        kw.setdefault("turn_col",
                      self._manifest.settings.get("turn_col", "turn_idx"))
        return IndexWriter(self.index_dir, **kw)

    # ---- schema evolution (reference index.py:228-249) ----

    def add_field(self, fieldname: str, fieldspec) -> None:
        """Add a field to the schema (reference Index.add_field →
        writer.add_field + commit).  Existing segments simply have no
        postings and a null stored column for it; new writer commits
        index it."""
        import dataclasses

        if any(f.name == fieldname for f in self.schema.fields):
            raise ValueError(f"field {fieldname!r} already in schema")
        spec = dataclasses.replace(fieldspec, name=fieldname)
        self._reschema(self.schema.fields + (spec,),
                       self.schema.stored_columns)

    def remove_field(self, fieldname: str) -> None:
        """Drop a field from the schema (reference Index.remove_field;
        like the reference, existing postings stay on disk — the field
        just leaves the schema)."""
        if not any(f.name == fieldname for f in self.schema.fields):
            raise KeyError(fieldname)
        self._reschema(tuple(f for f in self.schema.fields
                             if f.name != fieldname),
                       self.schema.stored_columns)

    def _reschema(self, fields, stored_columns) -> None:
        from whoosh_ray.state.manifest import Manifest

        schema = IndexSchema(fields=tuple(fields),
                             stored_columns=tuple(stored_columns),
                             glob_fields=self.schema.glob_fields)
        self._manifest = Manifest(schema=schema,
                                  segments=self._manifest.segments,
                                  settings=self._manifest.settings)
        write_manifest(self.index_dir, self._manifest)

    # ---- maintenance ----

    def optimize(self) -> None:
        """Merge everything into one segment (reference index.py:286-289
        → writer(commit with optimize))."""
        from whoosh_ray.pipelines.merge import merge_segments

        merge_segments(self.index_dir, policy="OPTIMIZE")
        self.refresh()

    def pack(self, *, remove: bool = True) -> int:
        """Pack every sealed segment's data files into one compound file
        per segment (reference CompoundWriter, filedb/compound.py:27-331,
        assembled at commit in writing.py:857-862).  Byte-identical
        reads, 4 -> 2 objects per segment; idempotent.  Returns the
        number of segments packed."""
        from whoosh_ray.state.compound import pack_index

        n = pack_index(self.index_dir, remove=remove)
        self.refresh()
        return n

    def delete_by_term(self, fieldname: str, text: str) -> int:
        w = self.writer()
        n = w.delete_by_term(fieldname, text)
        w.commit()
        self.refresh()
        return n

    def delete_by_query(self, q) -> int:
        w = self.writer()
        n = w.delete_by_query(q)
        w.commit()
        self.refresh()
        return n


# reference name for the concrete directory-backed index class
# (index.py:411); the TOC's role is played by state/manifest.py
FileIndex = Index


#: the commit-state container (reference index.py:567 TOC: schema +
#: segment list + generation); here that object is the Manifest
from whoosh_ray.state.manifest import Manifest as TOC  # noqa: E402,F401

#: reference legacy.toc_loaders maps old pickle TOC format versions to
#: loaders; this engine's manifest is versioned JSON with no legacy
#: formats, so the map is empty by design
toc_loaders: dict = {}


def clean_files(dirname: str, indexname: str | None = None) -> list[str]:
    """Remove segment directories the current manifest no longer
    references (reference index.py:374-403 role: prune files from
    earlier generations after a commit).  Returns the removed dir
    names.  Only fully-sealed strangers are touched — the manifest is
    the authority; in-flight temp dirs (no ``meta.json`` yet) are left
    for their builder."""
    import shutil

    from whoosh_ray.state.manifest import read_manifest, seg_dirname

    ix_dir = _ix_dir(dirname, indexname)
    if indexname is None and not os.path.exists(
            os.path.join(ix_dir, "manifest.json")) and os.path.exists(
            os.path.join(dirname, "manifest.json")):
        ix_dir = dirname  # built directly by build_index(dir, ...)
    manifest = read_manifest(ix_dir)
    live = {seg_dirname(s.seg_id) for s in manifest.segments}
    segroot = os.path.join(ix_dir, "segments")
    removed: list[str] = []
    if os.path.isdir(segroot):
        for name in sorted(os.listdir(segroot)):
            if not name.startswith("seg=") or name in live:
                continue
            path = os.path.join(segroot, name)
            if not os.path.exists(os.path.join(path, "meta.json")):
                continue  # in-flight builder temp, not ours to reap
            shutil.rmtree(path, ignore_errors=True)
            removed.append(name)
    return removed


def ensure_schema(schema):
    """Re-export (reference fields.ensure_schema is reachable via
    whoosh.index in user code through ``from whoosh.index import *``
    patterns); accepts IndexSchema or a SchemaClass."""
    from whoosh_ray.fields import ensure_schema as _es

    return _es(schema)


# The reference exports ``IndexError`` (shadowing the builtin,
# index.py:47-57); keep the import-compatible name at the END of the
# module so nothing inside accidentally catches the shadowed builtin.
globals()["IndexError"] = IndexError_
