"""Compound-file storage byte-compatible with the reference
whoosh/filedb/compound.py: many sub-files packed into one file with a
pickled directory at the tail.

    long(0->dirpos) int(0->dirlen) [subfile bytes]* pickle(dir)
    pickle(options), then the header is back-patched.

Files assembled here open with the reference CompoundStorage and vice
versa (tests/test_filetables.py).  Note this is the REFERENCE's packing
format, kept for migration; the engine's own compound segments use
``state/compound.py`` (offset-TOC JSON footer, mmap-sliced parquet
sub-files) which Ray's parquet reader can address directly.
"""

from __future__ import annotations

import mmap
import sys
from io import BytesIO
from shutil import copyfileobj
from threading import Lock

from whoosh_ray.filedb.filestore import FileStorage, StorageError
from whoosh_ray.filedb.structfile import BufferFile, StructFile
from whoosh_ray.util import random_name


class CompoundStorage(FileStorage):
    """Read-only Storage over one compound file (reference
    compound.py:46-187)."""

    readonly = True

    def __init__(self, dbfile, use_mmap=True, basepos=0):
        self._file = dbfile
        self._name = getattr(dbfile, "_name", None)
        self.is_closed = False

        dbfile.seek(0, 2)
        filesize = dbfile.tell()
        dbfile.seek(basepos)

        self._diroffset = dbfile.read_long()
        self._dirlength = dbfile.read_int()
        dbfile.seek(self._diroffset)
        self._dir = dbfile.read_pickle()
        self._options = dbfile.read_pickle()
        self._locks = {}
        self._source = None

        if use_mmap and hasattr(dbfile, "fileno") and dbfile.is_real \
                and filesize < sys.maxsize:
            try:
                self._source = mmap.mmap(dbfile.fileno(), 0,
                                         access=mmap.ACCESS_READ)
            except (OSError, ValueError):
                pass
            else:
                dbfile.close()
                self._file = None

    def __repr__(self):
        return "<%s (%s)>" % (type(self).__name__, self._name)

    def close(self):
        if self.is_closed:
            raise Exception("Already closed")
        self.is_closed = True
        if self._source:
            try:
                self._source.close()
            except BufferError:
                del self._source
        if self._file:
            self._file.close()

    def range(self, name):
        try:
            fileinfo = self._dir[name]
        except KeyError:
            raise NameError("Unknown file %r" % (name,))
        return fileinfo["offset"], fileinfo["length"]

    def open_file(self, name, *args, **kwargs):
        if self.is_closed:
            raise StorageError("Storage was closed")
        offset, length = self.range(name)
        if self._source is not None:
            return BufferFile(memoryview(self._source)[offset:
                                                       offset + length],
                              name=name)
        return StructFile(SubFile(self._file, offset, length), name=name)

    def list(self):
        return list(self._dir.keys())

    def file_exists(self, name):
        return name in self._dir

    def file_length(self, name):
        return self._dir[name]["length"]

    def file_modified(self, name):
        return self._dir[name]["modified"]

    def lock(self, name):
        if name not in self._locks:
            self._locks[name] = Lock()
        return self._locks[name]

    @staticmethod
    def assemble(dbfile, store, names, **options):
        """Pack ``names`` from ``store`` into ``dbfile`` (compound.py:
        148-172)."""
        assert names, names
        for name in names:
            if name.endswith(".toc") or name.endswith(".seg"):
                raise Exception(name)
        directory = {}
        basepos = dbfile.tell()
        dbfile.write_long(0)
        dbfile.write_int(0)
        for name in names:
            offset = dbfile.tell()
            directory[name] = {"offset": offset,
                               "length": store.file_length(name),
                               "modified": store.file_modified(name)}
            f = store.open_file(name)
            copyfileobj(f, dbfile)
            f.close()
        CompoundStorage.write_dir(dbfile, basepos, directory, options)

    @staticmethod
    def write_dir(dbfile, basepos, directory, options=None):
        options = options or {}
        dirpos = dbfile.tell()
        dbfile.write_pickle(directory)
        dbfile.write_pickle(options)
        endpos = dbfile.tell()
        dbfile.flush()
        dbfile.seek(basepos)
        dbfile.write_long(dirpos)
        dbfile.write_int(endpos - dirpos)
        dbfile.close()


class SubFile:
    """Raw file-like window into a region of a parent file (reference
    compound.py:189-249); wrap in StructFile for typed reads."""

    def __init__(self, parentfile, offset, length, name=None):
        self._file = parentfile
        self._offset = offset
        self._length = length
        self._end = offset + length
        self._pos = 0
        self.name = name
        self.closed = False

    def close(self):
        self.closed = True

    def subset(self, position, length, name=None):
        return SubFile(self._file, self._offset + position, length,
                       name=name or self.name)

    def read(self, size=None):
        remaining = self._length - self._pos
        size = remaining if size is None else min(size, remaining)
        if size <= 0:
            return b""
        self._file.seek(self._offset + self._pos)
        self._pos += size
        return self._file.read(size)

    def readline(self):
        maxsize = self._length - self._pos
        self._file.seek(self._offset + self._pos)
        data = self._file.readline()
        if len(data) > maxsize:
            data = data[:maxsize]
        self._pos += len(data)
        return data

    def seek(self, where, whence=0):
        if whence == 0:
            pos = where
        elif whence == 1:
            pos = self._pos + where
        elif whence == 2:
            pos = self._length - where
        else:
            raise ValueError
        self._pos = pos

    def tell(self):
        return self._pos


class CompoundWriter:
    """Interleaved multi-stream writer (reference compound.py:251-341):
    ``create_file`` streams buffer to one shared temp file in blocks;
    ``save_as_compound`` reassembles per-name contiguous regions."""

    def __init__(self, tempstorage, buffersize=32 * 1024):
        assert isinstance(buffersize, int)
        self._tempstorage = tempstorage
        self._tempname = "%s.ctmp" % random_name()
        self._temp = tempstorage.create_file(self._tempname, mode="w+b")
        self._buffersize = buffersize
        self._streams = {}

    def create_file(self, name):
        ss = self.SubStream(self._temp, self._buffersize)
        self._streams[name] = ss
        return StructFile(ss)

    def _readback(self):
        temp = self._temp
        for name, substream in self._streams.items():
            substream.close()

            def gen(substream=substream):
                for f, offset, length in substream.blocks:
                    if f is None:
                        f = temp
                    f.seek(offset)
                    yield f.read(length)

            yield (name, gen)
        temp.close()
        self._tempstorage.delete_file(self._tempname)

    def save_as_compound(self, dbfile):
        basepos = dbfile.tell()
        dbfile.write_long(0)
        dbfile.write_int(0)
        directory = {}
        for name, blocks in self._readback():
            filestart = dbfile.tell()
            for block in blocks():
                dbfile.write(block)
            directory[name] = {"offset": filestart,
                               "length": dbfile.tell() - filestart}
        CompoundStorage.write_dir(dbfile, basepos, directory)

    def save_as_files(self, storage, name_fn):
        for name, blocks in self._readback():
            f = storage.create_file(name_fn(name))
            for block in blocks():
                f.write(block)
            f.close()

    class SubStream:
        """Buffers small writes; spills full buffers as (temp, offset,
        length) blocks so many sub-files can interleave one temp."""

        def __init__(self, dbfile, buffersize):
            self._dbfile = dbfile
            self._buffersize = buffersize
            self._buffer = BytesIO()
            self.blocks = []

        def tell(self):
            return sum(b[2] for b in self.blocks) + self._buffer.tell()

        def write(self, inbytes):
            bio = self._buffer
            buflen = bio.tell()
            length = buflen + len(inbytes)
            if length >= self._buffersize:
                offset = self._dbfile.tell()
                self._dbfile.write(bio.getvalue()[:buflen])
                self._dbfile.write(inbytes)
                self.blocks.append((None, offset, length))
                self._buffer.seek(0)
            else:
                bio.write(inbytes)

        def close(self):
            bio = self._buffer
            length = bio.tell()
            if length:
                self.blocks.append((bio, 0, length))
