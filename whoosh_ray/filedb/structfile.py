"""Typed binary file wrapper (reference filedb/structfile.py:58-401).

The engine's own on-disk formats are Arrow/parquet plus the vectorized
block codec in ``state/codec.py`` — StructFile is NOT on any hot path.
It ships as a working scalar implementation because it is the file API
of the reference's documented extension points (``util/numlists.py``
encoders take one, custom codecs write through one), with the same wire
formats: varint/svarint from ``util/varints.py``, length-prefixed
strings, tagint (0-253 inline, 0xFE + u16be, 0xFF + u32be), arrays
stored BIG-endian regardless of host order.

Known py2-isms in the reference are implemented as intent (reference
``write_tagint`` writes ``chr(i)`` str — crashes on py3 binary files;
here it writes the byte).
"""

import pickle
from array import array
from copy import copy
from struct import Struct, calcsize

from whoosh_ray.system import (
    _DOUBLE_SIZE, _FLOAT_SIZE, _INT_SIZE, _LONG_SIZE, _SHORT_SIZE,
    IS_LITTLE,
    pack_byte, pack_float, pack_int, pack_long, pack_sbyte, pack_uint,
    pack_uint_le, pack_ulong, pack_ushort, pack_ushort_le,
    unpack_byte, unpack_float, unpack_int, unpack_long, unpack_sbyte,
    unpack_uint, unpack_uint_le, unpack_ulong, unpack_ushort,
    unpack_ushort_le,
)
from whoosh_ray.util.varints import (
    decode_signed_varint, read_varint, signed_varint, varint,
)

_SIZEMAP = {typecode: calcsize(typecode) for typecode in "bBhHiIlLqQfd"}
_ORDERMAP = {"little": "<", "big": ">"}

_types = (("sbyte", "b"), ("int", "i"), ("varint", "v"), ("svarint", "V"),
          ("byte", "B"), ("uint", "I"), ("ushort", "H"), ("tagint", "t"),
          ("long", "q"), ("float", "f"))


class StructFile:
    """Wraps a binary file-like object with typed read/write methods."""

    def __init__(self, fileobj, name=None, onclose=None):
        self.file = fileobj
        self._name = name
        self.onclose = onclose
        self.is_closed = False
        self.is_real = hasattr(fileobj, "fileno")
        if self.is_real:
            try:
                self.fileno = fileobj.fileno
            except AttributeError:
                self.is_real = False

    def __repr__(self):
        return "%s(%r)" % (type(self).__name__, self._name)

    def __str__(self):
        return self._name or repr(self)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.close()

    def __iter__(self):
        return iter(self.file)

    def raw_file(self):
        return self.file

    # passthroughs

    def read(self, *args, **kwargs):
        return self.file.read(*args, **kwargs)

    def readline(self, *args, **kwargs):
        return self.file.readline(*args, **kwargs)

    def write(self, *args, **kwargs):
        return self.file.write(*args, **kwargs)

    def tell(self, *args, **kwargs):
        return self.file.tell(*args, **kwargs)

    def seek(self, *args, **kwargs):
        return self.file.seek(*args, **kwargs)

    def truncate(self, *args, **kwargs):
        return self.file.truncate(*args, **kwargs)

    def flush(self):
        if hasattr(self.file, "flush"):
            self.file.flush()

    def close(self):
        if self.is_closed:
            raise Exception("This file is already closed")
        if self.onclose:
            self.onclose(self)
        if hasattr(self.file, "close"):
            self.file.close()
        self.is_closed = True

    def subset(self, offset, length, name=None):
        from whoosh_ray.compat import BytesIO

        self.seek(offset)
        return StructFile(BytesIO(self.read(length)), name=name)

    # strings

    def write_string(self, s: bytes):
        """varint length prefix + raw bytes."""
        self.write_varint(len(s))
        self.write(s)

    def write_string2(self, s: bytes):
        self.write(pack_ushort(len(s)) + s)

    def write_string4(self, s: bytes):
        self.write(pack_int(len(s)) + s)

    def read_string(self) -> bytes:
        return self.read(self.read_varint())

    def read_string2(self) -> bytes:
        return self.read(self.read_ushort())

    def read_string4(self) -> bytes:
        return self.read(self.read_int())

    def get_string2(self, pos):
        length = self.get_ushort(pos)
        base = pos + _SHORT_SIZE
        return self.get(base, length), base + length

    def get_string4(self, pos):
        length = self.get_int(pos)
        base = pos + _INT_SIZE
        return self.get(base, length), base + length

    def skip_string(self):
        self.seek(self.read_varint(), 1)

    # variable-width ints

    def write_varint(self, i: int):
        self.write(varint(i))

    def write_svarint(self, i: int):
        self.write(signed_varint(i))

    def read_varint(self) -> int:
        return read_varint(self.read)

    def read_svarint(self) -> int:
        return decode_signed_varint(read_varint(self.read))

    def write_tagint(self, i: int):
        """0-253 in one byte; 0xFE + u16be; 0xFF + u32be."""
        if i <= 253:
            self.write(bytes((i,)))
        elif i <= 65535:
            self.write(b"\xFE" + pack_ushort(i))
        else:
            self.write(b"\xFF" + pack_uint(i))

    def read_tagint(self) -> int:
        tb = self.read(1)[0]
        if tb == 254:
            return self.read_ushort()
        if tb == 255:
            return self.read_uint()
        return tb

    # fixed-width writes

    def write_byte(self, n: int):
        self.write(pack_byte(n))

    def write_sbyte(self, n: int):
        self.write(pack_sbyte(n))

    def write_int(self, n: int):
        self.write(pack_int(n))

    def write_uint(self, n: int):
        self.write(pack_uint(n))

    def write_uint_le(self, n: int):
        self.write(pack_uint_le(n))

    def write_ushort(self, n: int):
        self.write(pack_ushort(n))

    def write_ushort_le(self, n: int):
        self.write(pack_ushort_le(n))

    def write_long(self, n: int):
        self.write(pack_long(n))

    def write_ulong(self, n: int):
        self.write(pack_ulong(n))

    def write_float(self, n: float):
        self.write(pack_float(n))

    def write_pickle(self, obj, protocol=-1):
        pickle.dump(obj, self.file, protocol)

    def write_array(self, arry: array):
        if IS_LITTLE:
            arry = copy(arry)
            arry.byteswap()
        if self.is_real:
            arry.tofile(self.file)
        else:
            self.write(arry.tobytes())

    # fixed-width reads

    def read_byte(self) -> int:
        return unpack_byte(self.read(1))[0]

    def read_sbyte(self) -> int:
        return unpack_sbyte(self.read(1))[0]

    def read_int(self) -> int:
        return unpack_int(self.read(_INT_SIZE))[0]

    def read_uint(self) -> int:
        return unpack_uint(self.read(_INT_SIZE))[0]

    def read_uint_le(self) -> int:
        return unpack_uint_le(self.read(_INT_SIZE))[0]

    def read_ushort(self) -> int:
        return unpack_ushort(self.read(_SHORT_SIZE))[0]

    def read_ushort_le(self) -> int:
        return unpack_ushort_le(self.read(_SHORT_SIZE))[0]

    def read_long(self) -> int:
        return unpack_long(self.read(_LONG_SIZE))[0]

    def read_ulong(self) -> int:
        return unpack_ulong(self.read(_LONG_SIZE))[0]

    def read_float(self) -> float:
        return unpack_float(self.read(_FLOAT_SIZE))[0]

    def read_pickle(self):
        return pickle.load(self.file)

    def read_array(self, typecode: str, length: int) -> array:
        a = array(typecode)
        if self.is_real:
            a.fromfile(self.file, length)
        else:
            a.frombytes(self.read(length * _SIZEMAP[typecode]))
        if IS_LITTLE:
            a.byteswap()
        return a

    # positioned reads

    def get(self, position, length) -> bytes:
        self.seek(position)
        return self.read(length)

    def get_byte(self, position) -> int:
        return unpack_byte(self.get(position, 1))[0]

    def get_sbyte(self, position) -> int:
        return unpack_sbyte(self.get(position, 1))[0]

    def get_int(self, position) -> int:
        return unpack_int(self.get(position, _INT_SIZE))[0]

    def get_uint(self, position) -> int:
        return unpack_uint(self.get(position, _INT_SIZE))[0]

    def get_ushort(self, position) -> int:
        return unpack_ushort(self.get(position, _SHORT_SIZE))[0]

    def get_long(self, position) -> int:
        return unpack_long(self.get(position, _LONG_SIZE))[0]

    def get_ulong(self, position) -> int:
        return unpack_ulong(self.get(position, _LONG_SIZE))[0]

    def get_float(self, position) -> float:
        return unpack_float(self.get(position, _FLOAT_SIZE))[0]

    def get_array(self, position, typecode, length) -> array:
        self.seek(position)
        return self.read_array(typecode, length)


class BufferFile(StructFile):
    """StructFile over an in-memory buffer with zero-copy positioned
    reads (reference structfile.py:353-375)."""

    def __init__(self, buf, name=None, onclose=None):
        self._buf = buf
        self._name = name
        self.file = None
        self.onclose = onclose
        self.is_real = False
        self.is_closed = False
        self._pos = 0

    def read(self, n=None):
        pos = self._pos
        end = len(self._buf) if n is None else min(pos + n, len(self._buf))
        self._pos = end
        return bytes(self._buf[pos:end])

    def tell(self):
        return self._pos

    def seek(self, pos, whence=0):
        if whence == 0:
            self._pos = pos
        elif whence == 1:
            self._pos += pos
        else:
            self._pos = len(self._buf) + pos
        return self._pos

    def write(self, *a, **kw):
        raise ValueError("BufferFile is read-only")

    def close(self):
        if self.is_closed:
            raise Exception("This file is already closed")
        if self.onclose:
            self.onclose(self)
        self.is_closed = True

    def subset(self, position, length, name=None):
        return BufferFile(self._buf[position:position + length], name=name)

    def get(self, position, length):
        return bytes(self._buf[position:position + length])

    def get_array(self, position, typecode, length):
        a = array(typecode)
        a.frombytes(self.get(position, length * _SIZEMAP[typecode]))
        if IS_LITTLE:
            a.byteswap()
        return a


class ChecksumFile(StructFile):
    """StructFile that CRC32s every byte it reads or writes (reference
    structfile.py:378-401).  No seeking."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._check = 0
        self._crc32 = __import__("zlib").crc32

    def __iter__(self):
        for line in self.file:
            self._check = self._crc32(line, self._check)
            yield line

    def seek(self, *args):
        raise Exception("Cannot seek on a ChecksumFile")

    def read(self, *args, **kwargs):
        b = self.file.read(*args, **kwargs)
        self._check = self._crc32(b, self._check)
        return b

    def write(self, b):
        self._check = self._crc32(b, self._check)
        self.file.write(b)

    def checksum(self) -> int:
        return self._check & 0xFFFFFFFF
