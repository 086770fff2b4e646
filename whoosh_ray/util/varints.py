"""Scalar varint codec (drop-in for reference util/varints.py:39-103).

The engine's posting blocks use a *vectorized* numpy varint codec
(``state/codec.py``); these scalar helpers exist for user code that
imported them from the reference.  Same LEB128 wire format (7 data
bits per byte, high bit = continuation), zig-zag for the signed
variant.
"""

from __future__ import annotations

from array import array


def varint(i: int) -> bytes:
    """Unsigned LEB128 encoding of a non-negative integer."""
    a = array("B")
    while (i & ~0x7F) != 0:
        a.append((i & 0x7F) | 0x80)
        i >>= 7
    a.append(i)
    return a.tobytes()


def varint_to_int(vi: bytes) -> int:
    b = vi[0]
    pos = 1
    i = b & 0x7F
    shift = 7
    while b & 0x80 != 0:
        b = vi[pos]
        pos += 1
        i |= (b & 0x7F) << shift
        shift += 7
    return i


def signed_varint(i: int) -> bytes:
    """Zig-zag then varint (reference varints.py:76-82)."""
    if i >= 0:
        return varint(i << 1)
    return varint((abs(i) << 1) - 1)


def decode_signed_varint(i: int) -> int:
    if not i & 1:
        return i >> 1
    return -((i >> 1) + 1)


def read_varint(readfn) -> int:
    """Read a varint off a ``readfn(nbytes) -> bytes`` stream."""
    b = ord(readfn(1))
    i = b & 0x7F
    shift = 7
    while b & 0x80 != 0:
        b = ord(readfn(1))
        i |= (b & 0x7F) << shift
        shift += 7
    return i
