"""Packed integer-list encodings (reference util/numlists.py:10-360):
delta coding, the growable typed array, and the NumberEncoding family
(fixed-width, varint, Simple16, Google packed ints).  Wire formats are
byte-identical to the reference (parity-tested in
tests/test_structfile.py); the engine's own postings use the vectorized
numpy block codec in ``state/codec.py`` instead — these exist for user
code built on the reference's extension API.

Simple16: Zhang et al., "Performance of Compressed Inverted List
Caching in Search Engines" (WWW'08) — 28 payload bits + 4 selector bits
per 32-bit word.
"""

from array import array

from whoosh_ray.system import (
    emptybytes, pack_byte, pack_uint_le, pack_ushort_le, unpack_byte,
    unpack_uint_le, unpack_ushort_le,
)


def delta_encode(nums):
    base = 0
    for n in nums:
        yield n - base
        base = n


def delta_decode(nums):
    base = 0
    for n in nums:
        base += n
        yield base


class GrowableArray:
    """A typed array that widens its typecode as appended values
    outgrow it (B -> H -> i -> I -> q -> plain list)."""

    def __init__(self, inittype: str = "B", allow_longs: bool = True):
        self.array = array(inittype)
        self._allow_longs = allow_longs

    def __repr__(self):
        return "%s(%r)" % (type(self).__name__, self.array)

    def __len__(self):
        return len(self.array)

    def __iter__(self):
        return iter(self.array)

    def _retype(self, maxnum: int):
        if maxnum < 2 ** 16:
            newtype = "H"
        elif maxnum < 2 ** 31:
            newtype = "i"
        elif maxnum < 2 ** 32:
            newtype = "I"
        elif self._allow_longs:
            newtype = "q"
        else:
            raise OverflowError("%r is too big to fit in an array" % maxnum)
        try:
            self.array = array(newtype, iter(self.array))
        except (ValueError, OverflowError):
            self.array = list(self.array)

    def append(self, n: int):
        try:
            self.array.append(n)
        except OverflowError:
            self._retype(n)
            self.array.append(n)

    def extend(self, ns):
        append = self.append
        for n in ns:
            append(n)

    @property
    def typecode(self) -> str:
        if isinstance(self.array, array):
            return self.array.typecode
        return "q"

    def to_file(self, dbfile):
        if isinstance(self.array, array):
            dbfile.write_array(self.array)
        else:
            for n in self.array:
                dbfile.write_long(n)


class NumberEncoding:
    maxint: int | None = None

    def write_nums(self, f, numbers):
        raise NotImplementedError

    def read_nums(self, f, n):
        raise NotImplementedError

    def write_deltas(self, f, numbers):
        return self.write_nums(f, list(delta_encode(numbers)))

    def read_deltas(self, f, n):
        return delta_decode(self.read_nums(f, n))

    def get(self, f, pos, i):
        f.seek(pos)
        n = None
        for n in self.read_nums(f, i + 1):
            pass
        return n


class FixedEncoding(NumberEncoding):
    _encode = None
    _decode = None
    size: int | None = None

    def write_nums(self, f, numbers):
        enc = self._encode
        for n in numbers:
            f.write(enc(n))

    def read_nums(self, f, n):
        dec = self._decode
        size = self.size
        for _ in range(n):
            yield dec(f.read(size))[0]

    def get(self, f, pos, i):
        f.seek(pos + i * self.size)
        return self._decode(f.read(self.size))[0]


class ByteEncoding(FixedEncoding):
    size = 1
    maxint = 255
    _encode = staticmethod(pack_byte)
    _decode = staticmethod(unpack_byte)


class UShortEncoding(FixedEncoding):
    size = 2
    maxint = 2 ** 16 - 1
    _encode = staticmethod(pack_ushort_le)
    _decode = staticmethod(unpack_ushort_le)


class UIntEncoding(FixedEncoding):
    size = 4
    maxint = 2 ** 32 - 1
    _encode = staticmethod(pack_uint_le)
    _decode = staticmethod(unpack_uint_le)


class Varints(NumberEncoding):
    maxint = None

    def write_nums(self, f, numbers):
        for n in numbers:
            f.write_varint(n)

    def read_nums(self, f, n):
        for _ in range(n):
            yield f.read_varint()


class Simple16(NumberEncoding):
    """Packs runs of small non-negative ints (< 2**28) into 32-bit LE
    words: top 4 bits select one of 16 bit-width layouts, low 28 bits
    carry the payload, values packed low-bits-first."""

    _numsize = 16
    _bitsize = 28
    maxint = 2 ** _bitsize - 1

    # the 16 selector layouts, written run-length ("count x width"):
    # each row's widths sum to 28 payload bits
    _LAYOUTS = "28x1|7x2 14x1|7x1 7x2 7x1|14x1 7x2|14x2|1x4 8x3|" \
               "1x3 4x4 3x3|7x4|4x5 2x4|2x4 4x5|3x6 2x5|2x5 3x6|" \
               "4x7|1x10 2x9|2x14|1x28"

    @staticmethod
    def _expand_layouts(spec):
        rows = []
        for row in spec.split("|"):
            widths = []
            for run in row.split():
                count, width = run.split("x")
                widths.extend([int(width)] * int(count))
            rows.append(tuple(widths))
        return rows

    _bits = _expand_layouts.__func__(_LAYOUTS)
    _num = [len(row) for row in _bits]

    def write_nums(self, f, numbers):
        i = 0
        while i < len(numbers):
            value, taken = self._compress(numbers, i, len(numbers) - i)
            f.write_uint_le(value)
            i += taken

    def _compress(self, inarray, inoffset, n):
        for key in range(self._numsize):
            value = key << self._bitsize
            num = min(self._num[key], n)
            bits = 0
            j = 0
            while j < num and inarray[inoffset + j] < (
                    1 << self._bits[key][j]):
                value |= inarray[inoffset + j] << bits
                bits += self._bits[key][j]
                j += 1
            if j == num:
                return value, num
        raise Exception("value too large for Simple16")

    def read_nums(self, f, n):
        i = 0
        while i < n:
            value = unpack_uint_le(f.read(4))[0]
            for v in self._decompress(value, n - i):
                yield v
                i += 1

    def _decompress(self, value, n):
        key = value >> self._bitsize
        num = min(self._num[key], n)
        bits = 0
        for j in range(num):
            yield (value >> bits) & (0xFFFFFFFF >> (32 - self._bits[key][j]))
            bits += self._bits[key][j]

    def get(self, f, pos, i):
        f.seek(pos)
        base = 0
        value = unpack_uint_le(f.read(4))[0]
        key = value >> self._bitsize
        num = self._num[key]
        while i > base + num:
            base += num
            value = unpack_uint_le(f.read(4))[0]
            key = value >> self._bitsize
            num = self._num[key]
        offset = i - base
        if offset:
            value >>= sum(self._bits[key][:offset])
        return value & (2 ** self._bits[key][offset] - 1)


class GInts(NumberEncoding):
    """Google packed ints: a key byte holds four 2-bit byte-widths,
    followed by the four integers at those widths (LE)."""

    maxint = 2 ** 32 - 1

    # payload bytes following a key byte of value N (used to skip ahead)
    _lens = array("B", [sum((key >> (s * 2) & 3) + 1 for s in range(4))
                        for key in range(256)])

    @staticmethod
    def key_to_sizes(key: int) -> list[int]:
        return [(key >> (i * 2) & 3) + 1 for i in range(4)]

    def write_nums(self, f, numbers):
        buf = emptybytes
        count = 0
        key = 0
        for v in numbers:
            shift = count * 2
            if v < 256:
                buf += pack_byte(v)
            elif v < 65536:
                key |= 1 << shift
                buf += pack_ushort_le(v)
            elif v < 16777216:
                key |= 2 << shift
                buf += pack_uint_le(v)[:3]
            else:
                key |= 3 << shift
                buf += pack_uint_le(v)
            count += 1
            if count == 4:
                f.write_byte(key)
                f.write(buf)
                count = 0
                key = 0
                buf = emptybytes
        if count:
            f.write_byte(key)
            f.write(buf)

    def read_nums(self, f, n):
        count = 0
        key = None
        for _ in range(n):
            if count == 0:
                key = f.read_byte()
            code = key >> (count * 2) & 3
            if code == 0:
                yield f.read_byte()
            elif code == 1:
                yield f.read_ushort_le()
            elif code == 2:
                yield unpack_uint_le(f.read(3) + b"\x00")[0]
            else:
                yield f.read_uint_le()
            count = (count + 1) % 4
