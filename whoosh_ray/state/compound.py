"""Compound segment file: pack a sealed segment's data files into ONE file.

Reference analogue: ``CompoundWriter`` / ``CompoundStorage``
(/root/reference/src/whoosh/filedb/compound.py:27-331), assembled at commit
time from the segment's already-written files (writing.py:857-862): the
per-segment files are concatenated into a single mmap-backed file with a
directory of (offset, length) sub-file entries.  Packing changes no byte
of any sub-file — it only cuts the per-segment object count (4 -> 2),
which is what matters on an object store holding millions of segment
partitions of a 10^12-turn index.

Format (single file ``segment.cmpd``)::

    [file 0 bytes][file 1 bytes]...[JSON TOC][u32 toc_len][8-byte magic]

The TOC is a *footer* (like parquet) so packing is one sequential write.
Sub-file reads stay exact: blob point-reads become ``pread(base + off)``
and parquet sub-files are handed to pyarrow as zero-copy buffer slices of
one shared memory map, so row-group pruning works unchanged.

``CompoundFileSystem`` additionally exposes sub-files to pyarrow/Ray Data
dataset readers as ``<cmpd_path>!<name>`` paths through a
``pyarrow.fs.PyFileSystem`` handler (plain local paths pass through), so
the batched multi-segment terms warm read (search/searcher.py
_warm_stats_batched) and the distributed term-stats read (pipelines/ir.py)
work over packed and unpacked segments alike.

Two per-segment files intentionally stay OUTSIDE the compound file:
``meta.json`` (the commit marker that resume scans for) and
``deletes.json`` (the only mutable per-segment file — tombstones arrive
after sealing, exactly like the reference keeps deletions out of the
compound file in the segment object).
"""

from __future__ import annotations

import json
import os
import struct

import pyarrow as pa

MAGIC = b"WRCMPD01"
COMPOUND_NAME = "segment.cmpd"
# data files eligible for packing, in pack order
PACKED_FILES = ("terms.parquet", "blobs.bin", "docs.parquet")
SUBFILE_SEP = "!"


def pack_segment(seg_dir: str, *, remove: bool = True) -> str | None:
    """Pack ``seg_dir``'s data files into ``segment.cmpd``.

    Atomic: the compound file is written under a temp name and renamed
    into place before the originals are unlinked, so a crash at any point
    leaves a readable segment (readers prefer the compound file when both
    exist).  Idempotent: packing a packed segment is a no-op.  Returns
    the compound path, or None when there was nothing to pack.
    """
    out = os.path.join(seg_dir, COMPOUND_NAME)
    if os.path.exists(out):
        # crash between rename and unlink left originals — but only
        # clean them up if the compound file actually parses: a torn
        # write that survived the rename must not cost the only good
        # copies (it is removed and re-packed from the originals)
        try:
            read_toc(out)
        except Exception:
            os.remove(out)
        else:
            if remove:
                for name in PACKED_FILES:
                    try:
                        os.remove(os.path.join(seg_dir, name))
                    except OSError:
                        pass
            return None
    for name in os.listdir(seg_dir):  # stale temp from a crashed pack
        if name.startswith(COMPOUND_NAME + ".tmp-"):
            try:
                os.remove(os.path.join(seg_dir, name))
            except OSError:
                pass
    present = [n for n in PACKED_FILES
               if os.path.exists(os.path.join(seg_dir, n))]
    if not present:
        return None
    toc: dict[str, list[int]] = {}
    tmp = out + f".tmp-{os.getpid()}"
    off = 0
    with open(tmp, "wb") as f:
        for name in present:
            with open(os.path.join(seg_dir, name), "rb") as src:
                n = 0
                while True:
                    chunk = src.read(1 << 24)
                    if not chunk:
                        break
                    f.write(chunk)
                    n += len(chunk)
            toc[name] = [off, n]
            off += n
        footer = json.dumps(toc).encode("utf-8")
        f.write(footer)
        f.write(struct.pack("<I", len(footer)))
        f.write(MAGIC)
    os.replace(tmp, out)
    if remove:
        for name in present:
            try:
                os.remove(os.path.join(seg_dir, name))
            except OSError:
                pass
    return out


# process-level caches: compound files are immutable once renamed into
# place, so the parsed TOC and the shared memory map are keyed by
# (path, size, mtime) and safe across Searcher instances
_TOC_CACHE: dict = {}
_MMAP_CACHE: dict = {}


def _stat_key(path: str) -> tuple:
    st = os.stat(path)
    return (path, st.st_size, st.st_mtime_ns)


def read_toc(cmpd_path: str) -> dict[str, tuple[int, int]]:
    """The compound file's sub-file directory: name -> (offset, length)."""
    key = _stat_key(cmpd_path)
    toc = _TOC_CACHE.get(key)
    if toc is None:
        with open(cmpd_path, "rb") as f:
            f.seek(-12, os.SEEK_END)
            tail = f.read(12)
            if tail[4:] != MAGIC:
                raise ValueError(f"not a compound segment file: {cmpd_path}")
            (toc_len,) = struct.unpack("<I", tail[:4])
            f.seek(-(12 + toc_len), os.SEEK_END)
            toc = {k: (int(v[0]), int(v[1]))
                   for k, v in json.loads(f.read(toc_len)).items()}
        if len(_TOC_CACHE) > 4096:
            _TOC_CACHE.clear()
        _TOC_CACHE[key] = toc
    return toc


def subfile_buffer(cmpd_path: str, name: str) -> pa.Buffer:
    """Zero-copy ``pa.Buffer`` over one sub-file (shared memory map)."""
    toc = read_toc(cmpd_path)
    off, length = toc[name]
    key = _stat_key(cmpd_path)
    mm = _MMAP_CACHE.get(key)
    if mm is None:
        if len(_MMAP_CACHE) > 512:
            _MMAP_CACHE.clear()
        mm = pa.memory_map(cmpd_path, "r")
        _MMAP_CACHE[key] = mm
    mm.seek(off)
    return mm.read_buffer(length)


def subfile_path(cmpd_path: str, name: str) -> str:
    """The ``CompoundFileSystem`` address of one sub-file."""
    return cmpd_path + SUBFILE_SEP + name


class _CompoundHandler:
    """Read-only ``pyarrow.fs.FileSystemHandler``: resolves
    ``<cmpd>!<name>`` paths to buffer slices, passes plain paths through
    to the local filesystem.  Stateless (TOC/mmap caches are per-process),
    so instances pickle cleanly into Ray Data read tasks."""

    def __eq__(self, other):
        return isinstance(other, _CompoundHandler)

    def __ne__(self, other):
        return not isinstance(other, _CompoundHandler)

    def __hash__(self):
        return hash(type(self))

    def get_type_name(self):
        return "whoosh-ray-compound"

    def normalize_path(self, path):
        return path

    def _split(self, path):
        if SUBFILE_SEP in path:
            cmpd, name = path.rsplit(SUBFILE_SEP, 1)
            return cmpd, name
        return path, None

    def get_file_info(self, paths):
        from pyarrow import fs as pafs

        out = []
        for path in paths:
            cmpd, name = self._split(path)
            if name is None:
                out.append(pafs.LocalFileSystem().get_file_info([path])[0])
                continue
            try:
                toc = read_toc(cmpd)
            except (OSError, ValueError):
                out.append(pafs.FileInfo(path, pafs.FileType.NotFound))
                continue
            if name not in toc:
                out.append(pafs.FileInfo(path, pafs.FileType.NotFound))
                continue
            st = os.stat(cmpd)
            out.append(pafs.FileInfo(path, pafs.FileType.File,
                                     size=toc[name][1],
                                     mtime_ns=st.st_mtime_ns))
        return out

    def get_file_info_selector(self, selector):
        from pyarrow import fs as pafs

        return pafs.LocalFileSystem().get_file_info(selector)

    def open_input_file(self, path):
        cmpd, name = self._split(path)
        if name is None:
            return pa.memory_map(path, "r")
        return pa.BufferReader(subfile_buffer(cmpd, name))

    def open_input_stream(self, path):
        return self.open_input_file(path)

    # ---- writes: compound segments are immutable ----

    def _readonly(self, *a, **kw):
        raise OSError("compound segment filesystem is read-only")

    open_output_stream = _readonly
    open_append_stream = _readonly
    create_dir = _readonly
    delete_dir = _readonly
    delete_dir_contents = _readonly
    delete_root_dir_contents = _readonly
    delete_file = _readonly
    move = _readonly
    copy_file = _readonly


def CompoundFileSystem():
    """A ``pyarrow.fs.PyFileSystem`` over :class:`_CompoundHandler` —
    pass as ``filesystem=`` to pyarrow / Ray Data dataset readers whose
    path lists mix plain files and ``!``-addressed compound sub-files."""
    from pyarrow import fs as pafs

    class _Handler(_CompoundHandler, pafs.FileSystemHandler):
        pass

    return pafs.PyFileSystem(_Handler())


def pack_index(index_dir: str, *, remove: bool = True) -> int:
    """Pack every sealed segment of an index (one Ray Data pass, one
    task per batch of segment dirs — pure local-file rewrites, no
    shuffle).  Returns the number of segments packed.  Safe to re-run:
    packed segments are skipped."""
    segroot = os.path.join(index_dir, "segments")
    if not os.path.isdir(segroot):
        return 0
    dirs = sorted(os.path.join(segroot, n) for n in os.listdir(segroot)
                  if n.startswith("seg=") and
                  os.path.exists(os.path.join(segroot, n, "meta.json")))
    if not dirs:
        return 0
    if len(dirs) <= 8:  # not worth task dispatch
        return sum(1 for d in dirs if pack_segment(d, remove=remove))

    import ray.data

    def _pack(batch):
        done = [1 if pack_segment(d, remove=remove) else 0
                for d in batch["dir"].tolist()]
        import numpy as np

        return {"packed": np.asarray(done, dtype=np.int64)}

    ds = ray.data.from_items([{"dir": d} for d in dirs])
    return int(ds.map_batches(_pack, batch_size=16).sum("packed") or 0)
