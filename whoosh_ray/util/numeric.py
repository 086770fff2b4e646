"""Numeric field helpers (drop-in for reference util/numeric.py).

The sortable converters are the same ones the engine's NUMERIC index
uses (re-exported from :mod:`whoosh_ray.fields`); the byte-quantized
lengths delegate to the vectorized table in
:mod:`whoosh_ray.functions.lengths` (the BM25-bit-parity one).
``split_ranges``/``tiered_ranges`` reproduce the reference's trie-range
generator (numeric.py:143-207) for user code that consumed it — the
engine's own NumericRange decomposition is the covering-cell form in
``search/query.py``.  Parity-fuzzed in tests/test_util_compat.py.
"""

from __future__ import annotations

import math
import struct

from whoosh_ray.fields import (  # noqa: F401  (re-exports)
    datetime_to_long,
    float_to_sortable_long,
    from_sortable,
    long_to_datetime,
    sortable_long_to_float,
    to_sortable,
)
from whoosh_ray.functions.lengths import BYTE_TO_LENGTH, _MAX_LEN
from whoosh_ray.functions.lengths import byte_to_length as _b2l_vec
from whoosh_ray.functions.lengths import length_to_byte as _l2b_vec


def bits_required(maxnum: int) -> int:
    """Bits required for the given unsigned integer (≥1)."""
    return max(1, math.ceil(math.log(maxnum, 2)))


def typecode_required(maxnum: int) -> str:
    for code, bound in (("B", 256), ("H", 2 ** 16), ("i", 2 ** 31 - 1),
                        ("I", 2 ** 32), ("q", 2 ** 63 - 1)):
        if maxnum < bound:
            return code
    return "Q"


def max_value(bitcount: int) -> int:
    return ~(~0 << bitcount)


def bytes_for_bits(bitcount: int) -> int:
    return int(math.ceil((bitcount + 1) / 8.0))


def split_ranges(intsize: int, step: int, start: int, end: int):
    """Split the inclusive [start, end] into trie ranges
    ``(start, end, shift)`` — high precision at the edges, ``step``-bit
    coarser blocks toward the middle (reference numeric.py:143-178)."""
    shift = 0
    while True:
        diff = 1 << (shift + step)
        mask = ((1 << step) - 1) << shift
        haslower = (start & mask) != 0
        hasupper = (end & mask) != mask

        not_mask = ~mask & ((1 << intsize + 1) - 1)
        nextstart = (start + diff if haslower else start) & not_mask
        nextend = (end - diff if hasupper else end) & not_mask

        low_fill = (1 << shift) - 1
        if shift + step >= intsize or nextstart > nextend:
            yield (start, end | low_fill, shift)
            break
        if haslower:
            yield (start, (start | mask) | low_fill, shift)
        if hasupper:
            yield (end & not_mask, end | low_fill, shift)

        start, end, shift = nextstart, nextend, shift + step


def tiered_ranges(numtype, intsize: int, signed: bool, start, end,
                  shift_step: int, startexcl: bool, endexcl: bool):
    """Sortable-int trie ranges for a numeric range query
    (reference numeric.py:181-207)."""
    assert numtype in (int, float)
    assert intsize in (8, 16, 32, 64)

    if start is None:
        start = 0
    else:
        start = to_sortable(numtype, intsize, signed, start)
        if startexcl:
            start += 1
    if end is None:
        end = 2 ** intsize - 1
    else:
        end = to_sortable(numtype, intsize, signed, end)
        if endexcl:
            end -= 1

    if not shift_step:
        return ((start, end, 0),)
    return split_ranges(intsize, shift_step, start, end)


def float_to_byte(value: float, mantissabits: int = 5,
                  zeroexp: int = 2) -> bytes:
    """Lossy one-byte float encoding (reference numeric.py:210-232):
    top mantissa bits of the float32 form, offset so bytes 1..255 span
    a useful positive range; ≤0 maps to byte 0."""
    fzero = (63 - zeroexp) << mantissabits
    bits = struct.unpack("i", struct.pack("f", value))[0]
    smallfloat = bits >> (24 - mantissabits)
    if smallfloat < fzero:
        out = 0 if bits <= 0 else 1
    elif smallfloat >= fzero + 0x100:
        out = 255
    else:
        out = smallfloat - fzero
    return bytes([out])


def byte_to_float(b, mantissabits: int = 5, zeroexp: int = 2) -> float:
    if type(b) is not int:
        b = ord(b)
    if b == 0:
        return 0.0
    bits = ((b & 0xFF) << (24 - mantissabits)) + ((63 - zeroexp) << 24)
    return struct.unpack("f", struct.pack("i", bits))[0]


def length_to_byte(length) -> int:
    """Scalar quantized length (reference numeric.py:309-315); the
    vectorized twin is :func:`whoosh_ray.functions.lengths.length_to_byte`."""
    if length is None:
        return 0
    if length >= _MAX_LEN:
        return 255
    return int(_l2b_vec(length)[0])


def byte_to_length(b: int) -> int:
    return int(_b2l_vec(b)[()] if not hasattr(b, "__len__") else _b2l_vec(b))


# struct packers the reference module exposes at top level
# (numeric.py:33-55) — big-endian fixed-width codecs
_pk = struct.Struct


def _mk(fmt):
    s = _pk(">" + fmt)
    return s.pack, lambda b: s.unpack(b)


pack_byte, unpack_byte = _mk("B")
pack_ushort, unpack_ushort = _mk("H")
pack_int, unpack_int = _mk("i")
pack_uint, unpack_uint = _mk("I")
pack_long, unpack_long = _mk("q")
pack_ulong, unpack_ulong = _mk("Q")
pack_float, unpack_float = _mk("f")
pack_double, unpack_double = _mk("d")

typecode_pack = {"B": pack_byte, "H": pack_ushort, "i": pack_int,
                 "I": pack_uint, "q": pack_long, "Q": pack_ulong,
                 "f": pack_float, "d": pack_double}
typecode_unpack = {"B": unpack_byte, "H": unpack_ushort, "i": unpack_int,
                   "I": unpack_uint, "q": unpack_long, "Q": unpack_ulong,
                   "f": unpack_float, "d": unpack_double}
typecode_min = {"B": 0, "H": 0, "i": -2 ** 31, "I": 0, "q": -2 ** 63,
                "Q": 0, "f": -1e38, "d": -1e308}
typecode_max = {"B": 255, "H": 2 ** 16 - 1, "i": 2 ** 31 - 1,
                "I": 2 ** 32 - 1, "q": 2 ** 63 - 1, "Q": 2 ** 64 - 1,
                "f": 1e38, "d": 1e308}
