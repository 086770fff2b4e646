"""Drop-in ``Storage`` objects (reference filedb/filestore.py:51-663).

A reference user writes::

    from whoosh.filedb.filestore import FileStorage, RamStorage
    st = FileStorage("indexdir").create()
    ix = st.create_index(schema)

Here a Storage is a *directory of parquet/blob segment files* — the
engine's readers (Ray ``read_parquet``, mmap'd ``blobs.bin`` preads)
address files by path, so every storage flavour must be
path-addressable:

- :class:`FileStorage` wraps a plain directory (same role as the
  reference's).
- :class:`RamStorage` allocates its directory on a tmpfs mount
  (``/dev/shm``) when one exists — actual RAM, zero disk I/O — and
  falls back to the system temp dir otherwise.  The reference's
  dict-of-BytesIO design cannot serve a distributed engine (workers on
  other nodes cannot reach the driver's heap), so path-on-tmpfs is the
  honest equivalent.
- :class:`OverlayStorage` maps to :func:`whoosh_ray.index.open_overlay`:
  reads fall back ``a`` → ``b`` per file, writes land in ``a``
  (reference filestore.py:313-375 union-mount semantics).

File-level methods (``create_file``/``open_file``/...) operate on real
files and return plain binary file objects — the reference returns
``StructFile`` wrappers, but their varint/struct codec belongs to the
retired file format; byte-stream semantics (what ``copy_storage``
needs) are identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from whoosh_ray import index as _index

_DEF_INDEX_NAME = "MAIN"


class StorageError(Exception):
    pass


class ReadOnlyError(StorageError):
    pass


class Storage:
    """Base class (reference filestore.py:51-310): index-level and
    file-level operations over one storage location."""

    readonly = False
    supports_mmap = True
    folder: str = ""

    # -- index level ----------------------------------------------------

    def create_index(self, schema, indexname: str = _DEF_INDEX_NAME,
                     indexclass=None, **kw) -> "_index.Index":
        if self.readonly:
            raise ReadOnlyError
        return _index.create_in(self.folder, schema, indexname, **kw)

    def open_index(self, indexname: str = _DEF_INDEX_NAME,
                   schema=None, indexclass=None) -> "_index.Index":
        ix = _index.open_dir(self.folder, indexname)
        if schema is not None:
            # reference open_index(schema=) overrides the stored schema
            ix._mf().schema = schema
        return ix

    def index_exists(self, indexname: str | None = None) -> bool:
        return _index.exists_in(self.folder, indexname or _DEF_INDEX_NAME)

    # -- lifecycle -------------------------------------------------------

    def create(self) -> "Storage":
        os.makedirs(self.folder, exist_ok=True)
        return self

    def destroy(self, *args, **kwargs) -> None:
        if self.readonly:
            raise ReadOnlyError
        shutil.rmtree(self.folder, ignore_errors=True)

    def close(self) -> None:
        pass

    def optimize(self) -> None:
        pass

    def __enter__(self) -> "Storage":
        return self.create()

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        self.close()

    def __iter__(self):
        return iter(self.list())

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({self.folder!r})"

    # -- file level (plain os-backed) -------------------------------------

    def _fpath(self, name: str) -> str:
        return os.path.join(self.folder, name)

    def create_file(self, name: str, excl: bool = False, mode: str = "wb",
                    **kwargs):
        if self.readonly:
            raise ReadOnlyError
        if excl:
            fd = os.open(self._fpath(name),
                         os.O_CREAT | os.O_EXCL | os.O_RDWR)
            return os.fdopen(fd, mode)
        return open(self._fpath(name), mode)

    def open_file(self, name: str, mode: str = "rb", **kwargs):
        try:
            return open(self._fpath(name), mode)
        except FileNotFoundError:
            raise NameError(name) from None

    def list(self) -> list:
        try:
            return os.listdir(self.folder)
        except FileNotFoundError:
            return []

    def file_exists(self, name: str) -> bool:
        return os.path.exists(self._fpath(name))

    def file_modified(self, name: str) -> float:
        try:
            return os.path.getmtime(self._fpath(name))
        except FileNotFoundError:
            raise NameError(name) from None

    def file_length(self, name: str) -> int:
        try:
            return os.path.getsize(self._fpath(name))
        except FileNotFoundError:
            raise NameError(name) from None

    def delete_file(self, name: str) -> None:
        if self.readonly:
            raise ReadOnlyError
        try:
            os.remove(self._fpath(name))
        except FileNotFoundError:
            raise NameError(name) from None

    def rename_file(self, frm: str, to: str, safe: bool = False) -> None:
        if self.readonly:
            raise ReadOnlyError
        if not os.path.exists(self._fpath(frm)):
            raise NameError(frm)
        if safe and os.path.exists(self._fpath(to)):
            raise NameError(f"File {to!r} exists")
        os.replace(self._fpath(frm), self._fpath(to))

    def clean(self, ignore: bool = False) -> None:
        if self.readonly:
            raise ReadOnlyError
        for name in self.list():
            try:
                path = self._fpath(name)
                if os.path.isdir(path):
                    shutil.rmtree(path)
                else:
                    os.remove(path)
            except OSError:
                if not ignore:
                    raise

    def total_size(self) -> int:
        return sum(self.file_length(f) for f in self.list()
                   if os.path.isfile(self._fpath(f)))

    def lock(self, name: str):
        from whoosh_ray.pipelines.writer import FLock

        return FLock(self._fpath(name))

    def temp_storage(self, name: str | None = None) -> "Storage":
        name = name or f"{os.urandom(6).hex()}.tmp"
        return FileStorage(os.path.join(tempfile.gettempdir(),
                                        name)).create()


class FileStorage(Storage):
    """Directory-backed storage (reference filestore.py:376-564)."""

    def __init__(self, path: str, supports_mmap: bool = True,
                 readonly: bool = False, debug: bool = False):
        self.folder = path
        self.supports_mmap = supports_mmap
        self.readonly = readonly


def _ram_root() -> str:
    shm = "/dev/shm"
    base = shm if os.path.isdir(shm) and os.access(shm, os.W_OK) else None
    return tempfile.mkdtemp(prefix="whoosh_ray_ram_", dir=base)


class RamStorage(Storage):
    """RAM-resident storage: a directory on tmpfs (see module docstring
    for why the reference's heap-dict design doesn't transfer)."""

    supports_mmap = False

    def __init__(self):
        self.folder = _ram_root()

    def create(self) -> "RamStorage":
        os.makedirs(self.folder, exist_ok=True)
        return self

    def file_modified(self, name: str) -> float:
        if not self.file_exists(name):
            raise NameError(name)
        return -1  # reference parity (filestore.py:598-599)

    def destroy(self) -> None:
        shutil.rmtree(self.folder, ignore_errors=True)


class OverlayStorage(Storage):
    """Union of two storages: reads try ``a`` then ``b``, writes always
    go to ``b`` (reference filestore.py:313-375).  ``open_index`` routes
    through the engine's overlay-index machinery
    (:func:`whoosh_ray.index.open_overlay`) with ``a`` as the immutable
    base and ``b`` as the write side — so tombstones / new segments /
    merges land in ``b`` while ``a`` stays untouched.  Two documented
    divergences: the reference's ``open_index`` drops its return value
    (filestore.py:326-327, a missing ``return`` — the method is useless
    as shipped), and index-level reads here see ``b``-resident shadow
    files preferentially (a just-committed write must be visible to the
    searcher that committed it)."""

    def __init__(self, a: Storage, b: Storage):
        self.a = a
        self.b = b
        self.folder = b.folder

    def create_index(self, *args, **kwargs):
        self.b.create_index(*args, **kwargs)  # drops the handle, like ref

    def open_index(self, indexname: str = _DEF_INDEX_NAME, schema=None,
                   indexclass=None):
        base = _index._ix_dir(self.a.folder, indexname)
        over = _index._ix_dir(self.b.folder, indexname)
        if not os.path.exists(os.path.join(base, "manifest.json")) and \
                os.path.exists(os.path.join(self.a.folder, "manifest.json")):
            # base indexes built directly by build_index(dir, ...)
            base, over = self.a.folder, self.b.folder
        return _index.open_overlay(base, over)

    def create_file(self, name: str, *args, **kwargs):
        return self.b.create_file(name, *args, **kwargs)

    def open_file(self, name: str, *args, **kwargs):
        if self.a.file_exists(name):
            return self.a.open_file(name, *args, **kwargs)
        return self.b.open_file(name, *args, **kwargs)

    def list(self) -> list:
        return sorted(set(self.a.list()) | set(self.b.list()))

    def file_exists(self, name: str) -> bool:
        return self.a.file_exists(name) or self.b.file_exists(name)

    def file_modified(self, name: str) -> float:
        if self.a.file_exists(name):
            return self.a.file_modified(name)
        return self.b.file_modified(name)

    def file_length(self, name: str) -> int:
        if self.a.file_exists(name):
            return self.a.file_length(name)
        return self.b.file_length(name)

    def delete_file(self, name: str) -> None:
        self.b.delete_file(name)

    def rename_file(self, *args, **kwargs):
        raise NotImplementedError  # reference parity (filestore.py:358)

    def lock(self, name: str):
        return self.b.lock(name)

    def close(self) -> None:
        self.a.close()
        self.b.close()

    def optimize(self) -> None:
        self.a.optimize()
        self.b.optimize()

    def temp_storage(self, name: str | None = None) -> Storage:
        return self.b.temp_storage(name=name)


def copy_storage(sourcestore: Storage, deststore: Storage) -> None:
    """Byte-copy every file (reference filestore.py:641-650)."""
    for name in sourcestore.list():
        src = os.path.join(sourcestore.folder, name)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(deststore.folder, name),
                            dirs_exist_ok=True)
        else:
            with sourcestore.open_file(name) as f_in, \
                    deststore.create_file(name) as f_out:
                shutil.copyfileobj(f_in, f_out)


def copy_to_ram(storage: Storage) -> RamStorage:
    """Copy a storage into a fresh :class:`RamStorage`
    (reference filestore.py:653-663)."""
    ram = RamStorage().create()
    copy_storage(storage, ram)
    return ram


# names the reference module exposes at module level
from whoosh_ray.index import EmptyIndexError  # noqa: E402,F401
from whoosh_ray.writing import random_name  # noqa: E402,F401

#: re-exports the reference filestore module carries (filestore.py:36)
from whoosh_ray.filedb.structfile import BufferFile, StructFile  # noqa: E402,F401
from whoosh_ray.util.filelock import FileLock  # noqa: E402,F401
