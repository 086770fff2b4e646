"""On-disk hash files byte-compatible with the reference
whoosh/filedb/filetables.py (a CDB-style two-level hash: 256 buckets,
open-addressed slot tables, a 256-entry directory, pickled extras at
the tail).  Files written here read with the reference classes and
vice versa — the formats are pinned by round-trip tests
(tests/test_filetables.py).

Layout (all big-endian):

    magic(4) hashtype(1) int(0) int(0)
    [keylen(i) datalen(i) key data] * N        <- data region
    [(hash(I) pos(q)) * 2*len(bucket)] * 256   <- slot tables
    [(tablepos(q) numslots(i))] * 256          <- directory
    pickle(extras) [+ index array for Ordered variants]
    extras_len(i)

The Ordered variants additionally store every key's position in a
GrowableArray so ``closest_key`` can binary-search; the Fielded variant
stores one such array per field in ``extras['fieldmap']``.
"""

from __future__ import annotations

import os
import struct
from binascii import crc32
from hashlib import md5

from whoosh_ray.system import _INT_SIZE, emptybytes
from whoosh_ray.util.numlists import GrowableArray


class FileFormatError(Exception):
    pass


def cdb_hash(key):
    h = 5381
    for c in key:
        h = (h + (h << 5)) & 0xffffffff ^ ord(c)
    return h


def md5_hash(key):
    return int(md5(key).hexdigest(), 16) & 0xffffffff


def crc_hash(key):
    return crc32(key) & 0xffffffff


_hash_functions = (md5_hash, crc_hash, cdb_hash)

_lengths = struct.Struct("!ii")      # keylen, datalen before each pair
_pointer = struct.Struct("!Iq")      # hash value, key position
_dir_entry = struct.Struct("!qi")    # table position, slot count
_directory_size = 256 * _dir_entry.size

_INDEX_GETTERS = {  # typecode -> StructFile positional getter name
    "B": "get_byte", "H": "get_ushort", "i": "get_int",
    "I": "get_uint", "q": "get_long",
}


class HashWriter:
    """Serial writer for the two-level on-disk hash (reference
    filetables.py:83-215).  Keys need not be unique."""

    def __init__(self, dbfile, magic=b"HSH3", hashtype=0):
        self.dbfile = dbfile
        self.hashtype = hashtype
        self.hashfn = _hash_functions[hashtype]
        self.extras = {}
        self.startoffset = dbfile.tell()
        dbfile.write(magic)
        dbfile.write_byte(hashtype)
        dbfile.write_int(0)   # future expansion
        dbfile.write_int(0)
        self.buckets = [[] for _ in range(256)]
        self.directory = []

    def tell(self):
        return self.dbfile.tell()

    def add(self, key, value):
        assert isinstance(key, bytes)
        assert isinstance(value, bytes)
        dbfile = self.dbfile
        pos = dbfile.tell()
        dbfile.write(_lengths.pack(len(key), len(value)))
        dbfile.write(key)
        dbfile.write(value)
        h = self.hashfn(key)
        self.buckets[h & 255].append((h, pos))

    def add_all(self, items):
        add = self.add
        for key, value in items:
            add(key, value)

    def _write_hashes(self):
        # each bucket's open-addressed slot table, 2x oversized;
        # (0, 0) marks an empty slot (no pair can sit at offset 0)
        dbfile = self.dbfile
        null = (0, 0)
        for entries in self.buckets:
            pos = dbfile.tell()
            numslots = 2 * len(entries)
            self.directory.append((pos, numslots))
            hashtable = [null] * numslots
            for hashval, position in entries:
                slot = (hashval >> 8) % numslots
                while hashtable[slot] != null:
                    slot = (slot + 1) % numslots
                hashtable[slot] = (hashval, position)
            for hashval, position in hashtable:
                dbfile.write(_pointer.pack(hashval, position))

    def _write_directory(self):
        dbfile = self.dbfile
        for position, numslots in self.directory:
            dbfile.write(_dir_entry.pack(position, numslots))

    def _write_extras(self):
        self.dbfile.write_pickle(self.extras)

    def close(self):
        dbfile = self.dbfile
        self._write_hashes()
        self._write_directory()
        expos = dbfile.tell()
        self._write_extras()
        dbfile.write_int(dbfile.tell() - expos)
        endpos = dbfile.tell()
        dbfile.close()
        return endpos


class HashReader:
    """Reader for :class:`HashWriter` files (reference
    filetables.py:217-437)."""

    def __init__(self, dbfile, length=None, magic=b"HSH3", startoffset=0):
        self.dbfile = dbfile
        self.startoffset = startoffset
        self.is_closed = False
        if length is None:
            dbfile.seek(0, os.SEEK_END)
            length = dbfile.tell() - startoffset
        dbfile.seek(startoffset)
        filemagic = dbfile.read(4)
        if filemagic != magic:
            raise FileFormatError("Unknown file header %r" % filemagic)
        self.hashtype = dbfile.read_byte()
        self.hashfn = _hash_functions[self.hashtype]
        dbfile.read_int()
        dbfile.read_int()
        self.startofdata = dbfile.tell()

        exptr = startoffset + length - _INT_SIZE
        exlen = dbfile.get_int(exptr)
        expos = exptr - exlen
        dbfile.seek(expos)
        self._read_extras()

        dbfile.seek(expos - _directory_size)
        self.tables = []
        entrysize = _dir_entry.size
        unpackentry = _dir_entry.unpack
        for _ in range(256):
            self.tables.append(unpackentry(dbfile.read(entrysize)))
        self.endofdata = self.tables[0][0]

    @classmethod
    def open(cls, storage, name):
        length = storage.file_length(name)
        dbfile = storage.open_file(name)
        return cls(dbfile, length)

    def file(self):
        return self.dbfile

    def _read_extras(self):
        try:
            self.extras = self.dbfile.read_pickle()
        except EOFError:
            self.extras = {}

    def close(self):
        if self.is_closed:
            raise Exception("Tried to close %r twice" % self)
        self.dbfile.close()
        self.is_closed = True

    def key_at(self, pos):
        dbfile = self.dbfile
        keylen = dbfile.get_uint(pos)
        return dbfile.get(pos + _lengths.size, keylen)

    def key_and_range_at(self, pos):
        dbfile = self.dbfile
        lenssize = _lengths.size
        if pos >= self.endofdata:
            return None
        keylen, datalen = _lengths.unpack(dbfile.get(pos, lenssize))
        keybytes = dbfile.get(pos + lenssize, keylen)
        datapos = pos + lenssize + keylen
        return keybytes, datapos, datalen

    def _ranges(self, pos=None, eod=None):
        # (keypos, keylen, datapos, datalen) for every stored pair
        dbfile = self.dbfile
        pos = pos or self.startofdata
        eod = eod or self.endofdata
        lenssize = _lengths.size
        unpacklens = _lengths.unpack
        while pos < eod:
            keylen, datalen = unpacklens(dbfile.get(pos, lenssize))
            keypos = pos + lenssize
            datapos = keypos + keylen
            yield (keypos, keylen, datapos, datalen)
            pos = datapos + datalen

    def __getitem__(self, key):
        for value in self.all(key):
            return value
        raise KeyError(key)

    def __iter__(self):
        return self.items()

    def __contains__(self, key):
        for _ in self.ranges_for_key(key):
            return True
        return False

    def keys(self):
        dbfile = self.dbfile
        for keypos, keylen, _, _ in self._ranges():
            yield dbfile.get(keypos, keylen)

    def values(self):
        dbfile = self.dbfile
        for _, _, datapos, datalen in self._ranges():
            yield dbfile.get(datapos, datalen)

    def items(self):
        dbfile = self.dbfile
        for keypos, keylen, datapos, datalen in self._ranges():
            yield (dbfile.get(keypos, keylen), dbfile.get(datapos, datalen))

    def get(self, key, default=None):
        for value in self.all(key):
            return value
        return default

    def all(self, key):
        dbfile = self.dbfile
        for datapos, datalen in self.ranges_for_key(key):
            yield dbfile.get(datapos, datalen)

    def ranges_for_key(self, key):
        """(datapos, datalen) for every value stored under ``key``."""
        if not isinstance(key, bytes):
            raise TypeError("Key %r should be bytes" % (key,))
        dbfile = self.dbfile
        keyhash = self.hashfn(key)
        tablestart, numslots = self.tables[keyhash & 255]
        if not numslots:
            return
        ptrsize = _pointer.size
        unpackptr = _pointer.unpack
        lenssize = _lengths.size
        unpacklens = _lengths.unpack
        slotpos = tablestart + (((keyhash >> 8) % numslots) * ptrsize)
        for _ in range(numslots):
            slothash, itempos = unpackptr(dbfile.get(slotpos, ptrsize))
            if not itempos:
                return
            if slothash == keyhash:
                keylen, datalen = unpacklens(dbfile.get(itempos, lenssize))
                if keylen == len(key):
                    keystart = itempos + lenssize
                    if key == dbfile.get(keystart, keylen):
                        yield (keystart + keylen, datalen)
            slotpos += ptrsize
            if slotpos == tablestart + (numslots * ptrsize):
                slotpos = tablestart

    def range_for_key(self, key):
        for item in self.ranges_for_key(key):
            return item
        raise KeyError(key)


class OrderedHashWriter(HashWriter):
    """Requires ascending keys; stores a key-position index so the
    reader can find nearest keys (reference filetables.py:440-471)."""

    def __init__(self, dbfile):
        HashWriter.__init__(self, dbfile)
        self.index = GrowableArray("H")
        self.lastkey = emptybytes

    def add(self, key, value):
        if key <= self.lastkey:
            raise ValueError("Keys must increase: %r..%r"
                             % (self.lastkey, key))
        self.index.append(self.dbfile.tell())
        HashWriter.add(self, key, value)
        self.lastkey = key

    def _write_extras(self):
        self.extras["indextype"] = self.index.typecode
        self.extras["indexlen"] = len(self.index)
        HashWriter._write_extras(self)
        self.index.to_file(self.dbfile)


class OrderedHashReader(HashReader):
    def _read_extras(self):
        HashReader._read_extras(self)
        indextype = self.extras["indextype"]
        self.indexbase = self.dbfile.tell()
        self.indexlen = self.extras["indexlen"]
        self.indexsize = struct.calcsize(indextype)
        try:
            self._get_pos = getattr(self.dbfile, _INDEX_GETTERS[indextype])
        except KeyError:
            raise Exception("Unknown index type %r" % indextype)

    def closest_key_pos(self, key):
        """Position of ``key``, or of the next greater key; None past
        the end."""
        if not isinstance(key, bytes):
            raise TypeError("Key %r should be bytes" % (key,))
        indexbase = self.indexbase
        indexsize = self.indexsize
        key_at = self.key_at
        _get_pos = self._get_pos
        lo, hi = 0, self.indexlen
        while lo < hi:
            mid = (lo + hi) // 2
            if key_at(_get_pos(indexbase + mid * indexsize)) < key:
                lo = mid + 1
            else:
                hi = mid
        if lo == self.indexlen:
            return None
        return _get_pos(indexbase + lo * indexsize)

    def closest_key(self, key):
        pos = self.closest_key_pos(key)
        if pos is None:
            return None
        return self.key_at(pos)

    def ranges_from(self, key):
        pos = self.closest_key_pos(key)
        if pos is None:
            return
        for item in self._ranges(pos=pos):
            yield item

    def keys_from(self, key):
        dbfile = self.dbfile
        for keypos, keylen, _, _ in self.ranges_from(key):
            yield dbfile.get(keypos, keylen)

    def items_from(self, key):
        dbfile = self.dbfile
        for keypos, keylen, datapos, datalen in self.ranges_from(key):
            yield (dbfile.get(keypos, keylen), dbfile.get(datapos, datalen))


class FieldedOrderedHashWriter(HashWriter):
    """One ordered position index per field (reference
    filetables.py:572-607)."""

    def __init__(self, dbfile):
        HashWriter.__init__(self, dbfile)
        self.fieldmap = self.extras["fieldmap"] = {}
        self.lastkey = emptybytes

    def start_field(self, fieldname):
        self.fieldstart = self.dbfile.tell()
        self.fieldname = fieldname
        self.poses = GrowableArray("H")
        self.lastkey = emptybytes

    def add(self, key, value):
        if key <= self.lastkey:
            raise ValueError("Keys must increase: %r..%r"
                             % (self.lastkey, key))
        self.poses.append(self.dbfile.tell() - self.fieldstart)
        HashWriter.add(self, key, value)
        self.lastkey = key

    def end_field(self):
        dbfile = self.dbfile
        poses = self.poses
        self.fieldmap[self.fieldname] = (self.fieldstart, dbfile.tell(),
                                         len(poses), poses.typecode)
        poses.to_file(dbfile)


class FieldedOrderedHashReader(HashReader):
    def __init__(self, *args, **kwargs):
        HashReader.__init__(self, *args, **kwargs)
        self.fieldmap = self.extras["fieldmap"]
        self.fieldlist = []
        for fieldname in sorted(self.fieldmap.keys()):
            startpos, ixpos, _, _ = self.fieldmap[fieldname]
            self.fieldlist.append((fieldname, startpos, ixpos))

    def field_start(self, fieldname):
        return self.fieldmap[fieldname][0]

    def fielded_ranges(self, pos=None, eod=None):
        flist = self.fieldlist
        fpos = 0
        fieldname, start, end = flist[fpos]
        for keypos, keylen, datapos, datalen in self._ranges(pos, eod):
            if keypos >= end:
                fpos += 1
                fieldname, start, end = flist[fpos]
            yield fieldname, keypos, keylen, datapos, datalen

    def iter_terms(self):
        get = self.dbfile.get
        for fieldname, keypos, keylen, _, _ in self.fielded_ranges():
            yield fieldname, get(keypos, keylen)

    def iter_term_items(self):
        get = self.dbfile.get
        for fieldname, keypos, keylen, datapos, datalen \
                in self.fielded_ranges():
            yield fieldname, get(keypos, keylen), get(datapos, datalen)

    def contains_term(self, fieldname, btext):
        try:
            self.range_for_term(fieldname, btext)
            return True
        except KeyError:
            return False

    def range_for_term(self, fieldname, btext):
        start, ixpos, _, _ = self.fieldmap[fieldname]
        for datapos, datalen in self.ranges_for_key(btext):
            if start < datapos < ixpos:
                return datapos, datalen
        raise KeyError((fieldname, btext))

    def term_data(self, fieldname, btext):
        datapos, datalen = self.range_for_term(fieldname, btext)
        return self.dbfile.get(datapos, datalen)

    def term_get(self, fieldname, btext, default=None):
        try:
            return self.term_data(fieldname, btext)
        except KeyError:
            return default

    def closest_term_pos(self, fieldname, key):
        # DIVERGENCE (documented): the reference strides its index
        # binary search by the ENTRY COUNT instead of the entry byte
        # size (filetables.py:695 `mid * ixsize` where ixsize =
        # len(poses)) — garbage positions for any field whose index
        # typecode size != its entry count; nothing in the shipped W3
        # codec calls it (W3 uses OrderedHashReader, whoosh3.py:567).
        # This implementation strides by struct.calcsize(typecode).
        if not isinstance(key, bytes):
            raise TypeError("Key %r should be bytes" % (key,))
        dbfile = self.dbfile
        key_at = self.key_at
        startpos, ixpos, ixsize, ixtype = self.fieldmap[fieldname]
        try:
            get_pos = getattr(dbfile, _INDEX_GETTERS[ixtype])
        except KeyError:
            raise Exception("Unknown index type %r" % ixtype)
        itemsize = struct.calcsize(ixtype)
        lo, hi = 0, ixsize
        while lo < hi:
            mid = (lo + hi) // 2
            if key_at(startpos + get_pos(ixpos + mid * itemsize)) < key:
                lo = mid + 1
            else:
                hi = mid
        if lo == ixsize:
            return None
        return startpos + get_pos(ixpos + lo * itemsize)

    def closest_term(self, fieldname, btext):
        pos = self.closest_term_pos(fieldname, btext)
        if pos is None:
            return None
        return self.key_at(pos)

    def term_ranges_from(self, fieldname, btext):
        pos = self.closest_term_pos(fieldname, btext)
        if pos is None:
            return
        startpos, ixpos, _, _ = self.fieldmap[fieldname]
        for item in self._ranges(pos, ixpos):
            yield item

    def terms_from(self, fieldname, btext):
        dbfile = self.dbfile
        for keypos, keylen, _, _ in self.term_ranges_from(fieldname, btext):
            yield dbfile.get(keypos, keylen)

    def term_items_from(self, fieldname, btext):
        dbfile = self.dbfile
        for keypos, keylen, datapos, datalen \
                in self.term_ranges_from(fieldname, btext):
            yield (dbfile.get(keypos, keylen), dbfile.get(datapos, datalen))
