"""Writer facades: op-log ``IndexWriter``, ``AsyncWriter``, and the
near-real-time ``BufferedWriter`` (RAM-segment overlay search).

Reference semantics being reproduced (behavior, not implementation):

- ``IndexWriter`` batch semantics (writing.py:239-489): deletes and
  update-lookups see only the COMMITTED index — documents added in the
  same writer are invisible to ``delete_by_term``/``update_document``
  until commit (the "cannot replace documents you've added in that
  writer" quirk, writing.py:464-473).  ``update_document`` dooms every
  committed doc matching ANY schema-``unique`` field present in the
  kwargs (writing.py:480-486), then adds.
- ``AsyncWriter`` (writing.py:954-1053) exists in the reference to dodge
  file-lock contention by buffering method calls and replaying them once
  the lock is acquired.  This engine has no writer locks (single-driver
  manifest commit), so the replay buffer IS the op log; ``start``/``join``
  are kept as no-ops for drop-in compatibility.
- ``BufferedWriter`` (writing.py:1102-1280): quasi-real-time search —
  buffered documents become searchable immediately via a RAM segment
  combined with the on-disk segments (MultiReader, writing.py:1206-1219);
  auto-commit after ``limit`` buffered docs or every ``period`` seconds;
  unlike the plain writer, ``update_document`` here DOES replace
  still-buffered documents (the class docstring's advertised difference).

Engine-shape notes:

- The "RAM segment" is a real segment built driver-side with the same
  vectorized ``FusedSegmentWriter`` kernel the Ray build uses, then
  lifted whole into a ``MemorySegmentReader`` (state/memseg.py — the
  reference MemoryCodec analogue; the scratch dir is deleted before any
  search runs).  Byte-compatible with disk segments, so every
  query/scoring path works unchanged over the overlay (BM25 stats
  include buffered docs because the overlay meta joins the manifest
  used for doc_count_all/avgfl).
- Overlay search is a DRIVER-side convenience: distributed fan-out
  (``search.dist``) always reads committed segments only, exactly like
  "other processes only see documents written to disk" in the reference.
- Docids are content-derived (dense rank of (conv_id, turn_idx) + the
  committed span) — identical before and after commit, unlike the
  reference's arrival-order RAM docnums.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from whoosh_ray.state.manifest import SegmentMeta, read_manifest, seg_dirname
from whoosh_ray.state.schema import IndexSchema
from whoosh_ray.state.segment import SegmentReader


def _unique_fields(schema: IndexSchema, fields: dict) -> list[str]:
    """Schema-unique field names present in the kwargs
    (reference writing.py:239-247 _unique_fields)."""
    return [f.name for f in schema.fields
            if getattr(f, "unique", False) and f.name in fields]


# merge-policy names for commit(mergetype=) — reference writing.py:65-125
NO_MERGE = "NO_MERGE"
MERGE_SMALL = "MERGE_SMALL"
OPTIMIZE = "OPTIMIZE"
CLEAR = "CLEAR"


class IndexingError(Exception):
    """Raised for writer-lifecycle misuse (reference writing.py:51-52)."""


class UnknownFieldError(Exception):
    """add_document kwarg names no schema field (writing.py:47-48)."""


class LockError(Exception):
    """The index is locked by another writer (reference index.py:51;
    SegmentWriter acquires WRITELOCK with timeout, writing.py:506-514)."""


class FLock:
    """Standalone advisory file lock with the reference's lock-object
    protocol (util/filelock.py:44-78: ``acquire(blocking=False)`` →
    bool, ``release()``).  flock-based like the writer's WRITELOCK, so
    a crashed holder's lock releases with its process."""

    def __init__(self, filename: str):
        self.filename = filename
        self.fd: int | None = None
        self.locked = False

    def __del__(self):
        if getattr(self, "fd", None) is not None:
            try:
                self.release()
            except Exception:
                pass

    def acquire(self, blocking: bool = False) -> bool:
        import fcntl

        fd = os.open(self.filename, os.O_CREAT | os.O_RDWR, 0o644)
        flags = fcntl.LOCK_EX | (0 if blocking else fcntl.LOCK_NB)
        try:
            fcntl.flock(fd, flags)
        except OSError:
            os.close(fd)
            return False
        self.fd = fd
        self.locked = True
        return True

    def release(self) -> None:
        if self.fd is None:
            raise Exception("Lock was not acquired")
        os.close(self.fd)  # flock releases with the fd
        self.fd = None
        self.locked = False

    def __enter__(self) -> "FLock":
        self.acquire(blocking=True)
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.release()


class IndexWriter:
    """Op-log batch writer over an existing index directory.

    Buffers ``add_document`` rows and eagerly-resolved delete docid sets;
    ``commit()`` applies tombstones then appends the buffered rows as new
    segments (``pipelines.mutate``).  ``searcher()`` reflects pending
    deletes but NOT pending adds — reference writer-visibility parity
    (writing.py:464-473).

    A WRITELOCK file guards the directory against concurrent writers
    (reference writing.py:506-514: acquire with ``timeout``/``delay`` or
    raise LockError).  flock-based, so a crashed writer's lock releases
    with its process; ``commit``/``cancel`` release it, and the next
    mutation on a reused writer re-acquires."""

    def __init__(self, index_dir, *, conv_col: str = "conv_id",
                 turn_col: str = "turn_idx", docid_col: str | None = None,
                 timeout: float = 0.0, delay: float = 0.1,
                 lock: bool = True):
        # also accept an Index handle, like the reference writer
        # constructors (writing.py:1012, AsyncWriter(index))
        index_dir = getattr(index_dir, "index_dir", index_dir)
        self.index_dir = index_dir
        self.manifest = read_manifest(index_dir)
        self.schema = self.manifest.schema
        self.conv_col = conv_col
        self.turn_col = turn_col
        self.docid_col = docid_col
        self._rows: list[dict] = []
        self._doomed: set[int] = set()   # committed docids to tombstone
        self._lock = threading.RLock()
        self._schema_dirty = False
        self._groups: list[tuple[int, int]] = []  # buffered-row spans
        self._group_start: int | None = None
        self._lk = lock
        self._lk_timeout, self._lk_delay = timeout, delay
        self._lk_fd: int | None = None
        if lock:
            self._acquire_writelock()

    def __enter__(self) -> "IndexWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        # reference IndexWriter context manager (writing.py:183-189):
        # cancel on exception, commit on clean exit
        if exc_type is not None:
            self.cancel()
        else:
            self.commit()

    # ---- WRITELOCK ----

    def _acquire_writelock(self) -> None:
        import fcntl
        import time as _time

        if not self._lk or self._lk_fd is not None:
            return
        path = os.path.join(self.index_dir, "WRITELOCK")
        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
        deadline = _time.monotonic() + max(self._lk_timeout, 0.0)
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                self._lk_fd = fd
                return
            except OSError:
                if _time.monotonic() >= deadline:
                    os.close(fd)
                    raise LockError(
                        f"index {self.index_dir!r} is locked by another "
                        "writer") from None
                _time.sleep(self._lk_delay)

    def _release_writelock(self) -> None:
        if self._lk_fd is not None:
            os.close(self._lk_fd)  # flock releases with the fd
            self._lk_fd = None

    # ---- visibility ----

    def searcher(self, **kw):
        """Searcher over the committed index with pending deletes applied
        (the reference writer's reader sees its own deletes,
        writing.py:597-618)."""
        from whoosh_ray.search.searcher import Searcher

        s = Searcher(self.index_dir, **kw)
        self._apply_doomed(s)
        return s

    def reader(self, **kw):
        """Reader over the writer's visible state (reference
        IndexWriter.reader, writing.py:597-618)."""
        return self.searcher(**kw).reader()

    def _apply_doomed(self, s) -> None:
        if not self._doomed:
            return
        doomed = np.array(sorted(self._doomed), dtype=np.int64)
        for seg in s.segments:
            lo, hi = seg.meta.docid_range()
            sel = doomed[(doomed >= lo) & (doomed < hi)]
            if len(sel):
                seg._deletes = np.union1d(seg.deletes, sel)

    # ---- delete-state accessors (reference writing.py:612-636:
    # has_deletions / deleted_count / is_deleted reflect the writer's
    # CURRENT view — committed tombstones plus this writer's pending
    # dooms, which buffer until commit here) ----

    def _committed_tombstones(self):
        from whoosh_ray.search.searcher import Searcher

        for seg in Searcher(self.index_dir).segments:
            yield seg.deletes

    def has_deletions(self) -> bool:
        if self._doomed:
            return True
        return any(len(d) for d in self._committed_tombstones())

    def deleted_count(self) -> int:
        committed = set()
        for d in self._committed_tombstones():
            committed.update(int(x) for x in d)
        return len(committed | self._doomed)

    def is_deleted(self, docnum: int) -> bool:
        docnum = int(docnum)
        if docnum in self._doomed:
            return True
        return any(docnum in set(int(x) for x in d)
                   for d in self._committed_tombstones())

    def doc_count(self) -> int:
        """Documents added by THIS writer so far (reference
        SegmentWriter.doc_count, writing.py:799-800: docnum − docbase —
        a writer-local counter, not the index total; the index total
        lives on Index/Searcher/IndexReader)."""
        return len(self._rows)

    # ---- mutations ----

    def add_document(self, **fields) -> None:
        with self._lock:
            self._acquire_writelock()
            self._rows.append(self._capture_boosts(fields))

    def _capture_boosts(self, fields: dict) -> dict:
        """Reference add_document boost kwargs (writing.py:473-500):
        ``_boost=`` scales every posting of the document,
        ``_<field>_boost=`` one field's.  They become ``__boost`` /
        ``__boost__<field>`` side columns the fused writer applies.

        DOCUMENTED DIVERGENCE: the reference accepts a LIST value for
        an indexed field and bypasses the analyzer (each element = one
        pre-analyzed token, formats.py:121-126 entoken) while storing
        the raw list — a schemaless-store trick the columnar layout
        can't mirror (one Arrow column, one type).  Raise with guidance
        instead of silently diverging; plain stored_columns passthrough
        still takes lists."""
        indexed = {f.name for f in self.schema.fields}
        for k, v in fields.items():
            if k in indexed and isinstance(v, (list, tuple)):
                raise TypeError(
                    f"{k}={v!r}: pre-analyzed token lists aren't "
                    "supported by the columnar store — join the values "
                    "into one string (KEYWORD fields tokenize on their "
                    "separator) or use a stored_columns passthrough")
        if "_boost" in fields:
            fields["__boost"] = float(fields.pop("_boost"))
        for k in [k for k in fields
                  if k.startswith("_") and not k.startswith("__")
                  and k.endswith("_boost") and len(k) > len("__boost")]:
            fields[f"__boost__{k[1:-len('_boost')]}"] = float(
                fields.pop(k))
        self._check_fieldnames(fields)
        return fields

    def _check_fieldnames(self, fields: dict) -> None:
        """Reference add_document raises for a kwarg naming no schema
        field (writing.py:462-471 UnknownFieldError) — catch typos
        instead of silently storing a stray column.  Allowed: schema
        fields, declared stored_columns, the document-identity columns,
        glob-field matches, and the __boost side columns."""
        import fnmatch

        allowed = ({f.name for f in self.schema.fields}
                   | set(self.schema.stored_columns)
                   | {self.conv_col, self.turn_col})
        if self.docid_col:
            allowed.add(self.docid_col)
        globs = [pat for pat, _t in self.schema.glob_fields]
        for k in fields:
            if k in allowed or k.startswith("__boost"):
                continue
            if any(fnmatch.fnmatchcase(k, pat) for pat in globs):
                continue
            raise UnknownFieldError(
                f"There is no field named {k!r} (schema fields: "
                f"{sorted(allowed)}; glob patterns: {globs})")

    def delete_document(self, docid: int) -> None:
        with self._lock:
            self._acquire_writelock()
            self._doomed.add(int(docid))

    def delete_by_term(self, fieldname: str, text: str) -> int:
        from whoosh_ray.search.query import Term

        return self.delete_by_query(Term(fieldname, str(text)))

    def delete_by_query(self, q) -> int:
        with self._lock:
            r = self.searcher().search(q, limit=None)
            fresh = {int(d) for d in r.docids} - self._doomed
            self._doomed.update(fresh)
            return len(fresh)

    def update_document(self, **fields) -> None:
        """Doom committed docs matching any unique field, then add
        (writing.py:480-489).  Docs still buffered in THIS writer are
        not replaced — quirk preserved on purpose."""
        with self._lock:
            uniq = _unique_fields(self.schema, fields)
            if uniq:
                from whoosh_ray.search.query import Or, Term

                q = Or([Term(n, str(fields[n])) for n in uniq])
                self.delete_by_query(q)
            self.add_document(**fields)

    # ---- schema evolution (reference IndexWriter.add_field /
    # remove_field, writing.py:228-249: visible to THIS writer at once,
    # sealed into the manifest at commit) ----

    def add_field(self, fieldname: str, fieldspec) -> None:
        import dataclasses

        from whoosh_ray.state.schema import IndexSchema

        with self._lock:
            if any(f.name == fieldname for f in self.schema.fields):
                raise ValueError(f"field {fieldname!r} already in schema")
            spec = dataclasses.replace(fieldspec, name=fieldname)
            self.schema = IndexSchema(
                fields=self.schema.fields + (spec,),
                stored_columns=self.schema.stored_columns,
                glob_fields=self.schema.glob_fields)
            self._schema_dirty = True

    def remove_field(self, fieldname: str) -> None:
        from whoosh_ray.state.schema import IndexSchema

        with self._lock:
            if not any(f.name == fieldname for f in self.schema.fields):
                raise KeyError(fieldname)
            self.schema = IndexSchema(
                fields=tuple(f for f in self.schema.fields
                             if f.name != fieldname),
                stored_columns=self.schema.stored_columns,
                glob_fields=self.schema.glob_fields)
            self._schema_dirty = True

    # ---- document groups (reference IndexWriter.group /
    # start_group / end_group, writing.py:260-297: a parent followed
    # directly by its children must land on contiguous docnums for
    # NestedParent/NestedChildren) ----

    def group(self):
        """``with writer.group():`` — mark the documents added inside
        as one contiguous block.  This engine's docids derive from the
        (conv, turn) keys (or docid_col), not arrival order, so the
        grouping is VALIDATED at commit: if the group's rows would not
        sort into one contiguous in-order run, commit raises before
        writing anything."""
        import contextlib

        @contextlib.contextmanager
        def _grp():
            self.start_group()
            try:
                yield
            finally:
                self.end_group()

        return _grp()

    def start_group(self) -> None:
        with self._lock:
            if self._group_start is not None:
                raise ValueError("group already open")
            self._group_start = len(self._rows)

    def end_group(self) -> None:
        with self._lock:
            if self._group_start is None:
                raise ValueError("no group open")
            span = (self._group_start, len(self._rows))
            self._group_start = None
            if span[1] > span[0]:
                self._groups.append(span)

    def _check_groups(self) -> None:
        """Every group's rows must form one contiguous, in-order run
        under the writer's docid assignment."""
        if not self._groups:
            return
        order = self._buffered_sort_ranks()
        for a, b in self._groups:
            ranks = order[a:b]
            if not (np.all(np.diff(ranks) == 1)):
                raise ValueError(
                    "grouped documents would not receive contiguous "
                    "docids: rows {}..{} sort to ranks {} — give the "
                    "group one conv key and increasing turn indexes "
                    "(or consecutive docid_col values)".format(
                        a, b - 1, ranks.tolist()))

    def _buffered_sort_ranks(self) -> np.ndarray:
        """Rank of each buffered row under the docid assignment."""
        if self.docid_col is not None:
            keys = np.asarray([int(r[self.docid_col])
                               for r in self._rows], dtype=np.int64)
            order = np.argsort(keys, kind="stable")
        else:
            convs = [str(r.get(self.conv_col)) for r in self._rows]
            turns = [int(r.get(self.turn_col, 0)) for r in self._rows]
            order = sorted(range(len(self._rows)),
                           key=lambda i: (convs[i], turns[i]))
            order = np.asarray(order, dtype=np.int64)
        ranks = np.empty(len(order), dtype=np.int64)
        ranks[order] = np.arange(len(order))
        return ranks

    def add_reader(self, reader) -> int:
        """Buffer every (undeleted) document of another index's reader
        (reference IndexWriter.add_reader, writing.py:318-370, which
        copies per-doc data segment-to-segment).  DOCUMENTED DIVERGENCE:
        this re-indexes from the stored fields instead of copying
        posting data — identical results when every indexed field is
        stored (the flagship schemas), an error otherwise."""
        stored_cols = None
        n = 0
        for _docnum, stored in reader.iter_docs():
            if stored_cols is None:
                stored_cols = set(stored)
                missing = [f.name for f in self.schema.fields
                           if f.name not in stored_cols]
                if missing:
                    raise ValueError(
                        f"add_reader re-indexes from stored fields; "
                        f"indexed fields {missing} are not stored")
            self.add_document(**{k: v for k, v in stored.items()
                                 if v is not None})
            n += 1
        return n

    # ---- commit protocol ----

    def cancel(self) -> None:
        with self._lock:
            self._rows.clear()
            self._doomed.clear()
            self._groups.clear()
            self._group_start = None
            self._schema_dirty = False
            self._release_writelock()

    def commit(self, mergetype=None, optimize=None, merge=None) -> None:
        """Tombstone doomed docids, append buffered rows as new segments
        (one ``add_documents`` batch), refresh the manifest, then apply
        the merge policy and release the WRITELOCK — the reference's
        four commit modes (writing.py:901-932):

        - ``commit()`` — MERGE_SMALL (fibonacci small-segment merging);
        - ``commit(optimize=True)`` — merge everything into one segment;
        - ``commit(merge=False)`` — no merging at all;
        - ``commit(mergetype=CLEAR)`` — DELETE all existing segments
          first, keeping only this writer's buffered documents
          (writing.py:120-125); NO_MERGE/MERGE_SMALL/OPTIMIZE are also
          accepted as mergetype names.  Reference parity: a mergetype
          overrides optimize/merge; optimize overrides merge."""
        from whoosh_ray.pipelines import mutate

        if mergetype is not None:
            policy = mergetype
            if not isinstance(policy, str):
                raise NotImplementedError(
                    "custom mergetype callables are not supported — pass "
                    "NO_MERGE/MERGE_SMALL/OPTIMIZE/CLEAR")
        elif optimize:
            policy = OPTIMIZE
        elif merge is False:
            policy = NO_MERGE
        else:
            policy = MERGE_SMALL

        with self._lock:
            self._acquire_writelock()  # no-op when already held;
            # AsyncWriter defers acquisition to here (blocking)
            if policy == CLEAR:
                self._clear_segments()
            self._check_groups()
            self._groups.clear()
            if self._schema_dirty:
                # seal the evolved schema before indexing buffered rows
                # (mutate re-reads the manifest for the build schema)
                from whoosh_ray.state.manifest import (Manifest,
                                                       write_manifest)

                cur = read_manifest(self.index_dir)
                write_manifest(self.index_dir, Manifest(
                    schema=self.schema, segments=cur.segments,
                    settings=cur.settings))
                self._schema_dirty = False
            if self._doomed:
                mutate.delete_docids(self.index_dir, self._doomed)
                self._doomed.clear()
            if self._rows:
                src = self._rows_to_parquet(self._rows)
                try:
                    self.manifest = mutate.add_documents(
                        self.index_dir, src, conv_col=self.conv_col,
                        turn_col=self.turn_col,
                        docid_col=self.docid_col or "__rowid")
                finally:
                    shutil.rmtree(os.path.dirname(src), ignore_errors=True)
                self._rows.clear()
            else:
                self.manifest = read_manifest(self.index_dir)
            if policy in (MERGE_SMALL, OPTIMIZE) and self.manifest.segments:
                from whoosh_ray.pipelines.merge import merge_segments

                self.manifest = merge_segments(self.index_dir,
                                               policy=policy)
            self._release_writelock()

    def _clear_segments(self) -> None:
        """CLEAR policy (writing.py:120-125): drop every existing
        segment; only this writer's buffered documents survive."""
        from whoosh_ray.state.manifest import Manifest, write_manifest

        cur = read_manifest(self.index_dir)
        write_manifest(self.index_dir, Manifest(
            schema=self.schema, segments=[], settings=cur.settings))
        segroot = os.path.join(self.index_dir, "segments")
        if os.path.isdir(segroot):
            for name in os.listdir(segroot):
                shutil.rmtree(os.path.join(segroot, name),
                              ignore_errors=True)
        self._doomed.clear()  # their targets no longer exist
        self.manifest = read_manifest(self.index_dir)

    # ---- helpers ----

    def _docs_file_schema(self) -> pa.Schema | None:
        """An existing segment's docs schema — the authoritative column
        types for buffered rows (keeps multi-file docs datasets over old
        + new segments schema-uniform)."""
        from whoosh_ray.state.segment import docs_schema

        for m in self.manifest.segments:
            sch = docs_schema(os.path.join(self.index_dir, "segments",
                                           seg_dirname(m.seg_id)))
            if sch is not None:
                return sch
        return None

    def _rows_to_table(self, rows: list[dict]) -> pa.Table:
        cols: list[str] = list(self.schema.input_columns())
        for r in rows:
            for k in r:
                if k not in cols:
                    cols.append(k)
        # str-coerce only the TEXT/ID/BOOLEAN-analyzed fields; numeric/
        # datetime fields keep their native values (a NUMERIC stored
        # value must round-trip as a number, not '1')
        text_fields = {f.name for f in self.schema.fields
                       if f.kind != "numeric"}
        data = {}
        ref_schema = self._docs_file_schema()
        for c in cols:
            vals = [r.get(c) for r in rows]
            if c in text_fields:
                # None stays null: a missing field is SKIPPED at index
                # time (reference add_document, writing.py:488-492),
                # while a real "" indexes the empty ID term
                vals = [None if v is None else str(v) for v in vals]
            arr = pa.array(vals)
            if ref_schema is not None and c in ref_schema.names:
                arr = arr.cast(ref_schema.field(c).type)
            data[c] = arr
        return pa.table(data)

    def _rows_to_parquet(self, rows: list[dict]) -> str:
        d = tempfile.mkdtemp(prefix="wr_writer_")
        path = os.path.join(d, "buffered.parquet")
        table = self._rows_to_table(rows)
        if self.docid_col is None:
            # ARRIVAL-order docids for buffered rows (reference writers
            # hand out docnums sequentially, writing.py:786-800).  The
            # (conv, turn) dense rank would assign two buffered rows
            # with the SAME key the SAME docid (the update_document
            # two-adds-in-one-writer quirk produces exactly that) —
            # duplicate docids inside a segment and an under-counted
            # docid_span.  The synthetic column never reaches
            # docs.parquet (build selects schema columns only).
            table = table.append_column(
                "__rowid", pa.array(np.arange(table.num_rows),
                                    type=pa.int64()))
        pq.write_table(table, path)
        return path


class AsyncWriter(IndexWriter):
    """Drop-in for the reference AsyncWriter (writing.py:954-1053).

    The reference exists to tolerate a HELD write lock: it tries once
    to obtain the writer, and if it can't, buffers method calls and
    retries in a thread.  Same contract here: construction never raises
    LockError — mutations buffer in the inherited op log regardless of
    the lock, and ``commit()`` BLOCKS (polling every ``delay`` seconds)
    until the WRITELOCK frees, then replays the whole log at once.
    ``start``/``join``/``is_alive`` are retained so code written against
    the reference API runs unchanged."""

    def __init__(self, index_dir: str, delay: float = 0.25, **kw):
        kw.setdefault("delay", delay)
        super().__init__(index_dir, lock=False, **kw)
        self.delay = delay
        self.running = False
        self._lk = True                  # commit() does lock...
        self._lk_timeout = float("inf")  # ...waiting as long as needed

    def add_document(self, **fields) -> None:
        with self._lock:                 # buffer WITHOUT the writelock
            self._rows.append(self._capture_boosts(fields))

    def delete_document(self, docid: int) -> None:
        with self._lock:
            self._doomed.add(int(docid))

    def start(self) -> None:          # pragma: no cover - trivial
        self.running = True

    def join(self, timeout=None) -> None:  # pragma: no cover - trivial
        pass

    def is_alive(self) -> bool:       # pragma: no cover - trivial
        return False




class BufferedWriter(IndexWriter):
    """Near-real-time writer: buffered docs are searchable immediately.

    ``searcher()`` returns a Searcher over the committed segments PLUS a
    RAM segment built from the buffer (reference writing.py:1206-1226);
    global stats (doc_count_all, avgfl, idf) include the buffered docs.
    Auto-commits after ``limit`` buffered docs or every ``period``
    seconds.  Call ``close()`` before discarding the writer.

    Unlike the base writer, ``update_document`` and the delete methods
    here see the OVERLAY (committed + buffered): updating a key that is
    still buffered replaces the buffered doc — the reference
    BufferedWriter's advertised improvement over the plain writer
    (writing.py:1112-1115)."""

    def __init__(self, index_dir: str, *, period: float | None = None,
                 limit: int = 10, **kw):
        super().__init__(index_dir, **kw)
        self.period = period
        self.limit = limit
        self._ram_cache: tuple[int, list] | None = None
        self._gen = 0            # bumped on every buffer mutation
        self._timer: threading.Timer | None = None
        if self.period:
            self._start_timer()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- RAM segment ----

    def _ram_segments(self) -> list[SegmentReader]:
        if not self._rows:
            return []
        if self._ram_cache and self._ram_cache[0] == self._gen:
            return self._ram_cache[1]
        from whoosh_ray.stages.fused_writer import FusedSegmentWriter

        table = self._rows_to_table(self._rows)
        base = int(self.manifest.settings.get("docid_span", 0))
        if self.docid_col is not None:
            local = table[self.docid_col].to_numpy().astype(np.int64)
            span = int(local.max()) + 1
        else:
            # ARRIVAL order — must match what commit() produces (the
            # synthetic __rowid docid_col in _rows_to_parquet) so
            # overlay scores == post-commit scores bit-for-bit
            local = np.arange(table.num_rows, dtype=np.int64)
            span = table.num_rows
        docids = local + base
        # fresh id past every committed segment: searcher eval caches
        # key on (query, seg_id), so the overlay must never collide
        ram_id = max((m.seg_id for m in self.manifest.segments),
                     default=-1) + 1
        group = table.append_column(
            "docid", pa.array(docids, type=pa.int64()))
        group = group.append_column(
            "seg", pa.array(np.full(len(docids), ram_id), type=pa.int64()))

        with tempfile.TemporaryDirectory(prefix="wr_ram_seg_") as td:
            writer = FusedSegmentWriter(td, self.schema)
            ret = writer(group)
            meta = SegmentMeta(
                seg_id=ram_id, docid_base=base,
                doc_count=group.num_rows,
                field_lengths=json.loads(ret["field_lengths"][0].as_py()),
                lineage={"docid_range": [base, base + span], "ram": True},
            )
            # lift into a true memory segment (MemoryCodec analogue,
            # state/memseg.py) — the scratch dir is gone before any
            # search runs, and overlay queries never touch a file
            from whoosh_ray.state.memseg import MemorySegmentReader

            seg_dir = os.path.join(td, "segments", seg_dirname(ram_id))
            reader = MemorySegmentReader.load(seg_dir, meta, self.schema)
        self._ram_cache = (self._gen, [reader])
        return self._ram_cache[1]

    # ---- overlay-aware API ----

    def searcher(self, **kw):
        from whoosh_ray.search.searcher import Searcher

        with self._lock:
            s = Searcher(self.index_dir,
                         extra_segments=tuple(self._ram_segments()), **kw)
            self._apply_doomed(s)
            return s

    def add_document(self, **fields) -> None:
        with self._lock:
            self._rows.append(self._capture_boosts(fields))
            self._gen += 1
            if len(self._rows) >= self.limit:
                self.commit()

    def delete_by_query(self, q) -> int:
        """Deletes see the overlay: committed matches are doomed,
        buffered matches are dropped from the buffer."""
        with self._lock:
            r = self.searcher().search(q, limit=None)
            base = int(self.manifest.settings.get("docid_span", 0))
            hit = {int(d) for d in r.docids}
            committed = {d for d in hit if d < base} - self._doomed
            self._doomed.update(committed)
            buffered = sorted(d for d in hit if d >= base)
            n_buf = self._drop_buffered(buffered)
            return len(committed) + n_buf

    def _drop_buffered(self, docids: list[int]) -> int:
        """Remove buffered rows by their (current) overlay docids."""
        if not docids:
            return 0
        ram = self._ram_segments()
        if not ram:
            return 0
        docs = ram[0].docs_table()
        want = set(docids)
        sel = [i for i, d in enumerate(docs["docid"].to_pylist())
               if d in want]
        if not sel:
            return 0
        # map ram rows back to buffer entries via the schema key columns
        keycols = ([self.docid_col] if self.docid_col is not None
                   else [self.conv_col, self.turn_col])
        # conv_col may be an indexed field (stored) and turn_col a stored
        # passthrough — both land in docs.parquet
        keys = {tuple(docs[c][i].as_py() for c in keycols) for i in sel}
        before = len(self._rows)
        self._rows = [r for r in self._rows
                      if tuple(r.get(c) for c in keycols) not in keys]
        self._gen += 1
        return before - len(self._rows)

    def delete_document(self, docid: int) -> None:
        base = int(self.manifest.settings.get("docid_span", 0))
        with self._lock:
            if docid < base:
                self._doomed.add(int(docid))
            else:
                self._drop_buffered([int(docid)])

    def update_document(self, **fields) -> None:
        """Unlike the plain writer, replaces still-buffered docs too
        (reference writing.py:1112-1115, 1264-1266)."""
        with self._lock:
            uniq = _unique_fields(self.schema, fields)
            if uniq:
                from whoosh_ray.search.query import Or, Term

                self.delete_by_query(
                    Or([Term(n, str(fields[n])) for n in uniq]))
            self.add_document(**fields)

    # ---- commit / close ----

    def _start_timer(self) -> None:
        self._timer = threading.Timer(self.period, self._timer_fire)
        self._timer.daemon = True
        self._timer.start()

    def _timer_fire(self) -> None:
        try:
            self.commit()
        finally:
            if self.period:
                self._start_timer()

    def commit(self) -> None:
        with self._lock:
            super().commit()
            self._gen += 1
            self._ram_cache = None

    def close(self) -> None:
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None
        self.period = None
        self.commit()
