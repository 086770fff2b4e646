"""Text helpers (drop-in for reference util/text.py:42-132).

``prefix_encode*`` served the retired on-disk term dictionary in the
reference; here the terms dictionary is sorted parquet (dictionary- and
delta-encoded by Arrow), so these survive purely as user-facing
utilities.  Behavior is parity-tested in tests/test_util_compat.py.
"""

from __future__ import annotations

import re


def first_diff(a, b) -> int:
    """Position of the first differing character, capped at 255 so it
    encodes in one byte."""
    i = 0
    n = min(len(a), len(b))
    while i <= 255 and i < n and a[i] == b[i]:
        i += 1
    return i


def prefix_encode(a: bytes, b: bytes) -> bytes:
    """``b`` as (shared-prefix length byte) + suffix."""
    i = first_diff(a, b)
    return bytes([i]) + b[i:]


def prefix_encode_all(ls):
    """Each string (after the first) as a prefix-length byte + UTF-8
    suffix, against its predecessor.  The reference's version is
    py2-only (``chr(i) + bytes`` TypeErrors on any py3 input,
    text.py:66-77); this is that intent with a ``bytes`` output —
    crash parity pinned in tests/test_util_compat.py."""
    last = ""
    for w in ls:
        i = first_diff(last, w)
        yield bytes([i]) + w[i:].encode("utf-8")
        last = w


def prefix_decode_all(ls):
    last = ""
    for w in ls:
        last = last[:w[0]] + w[1:].decode("utf-8")
        yield last


_nkre = re.compile(r"\D+|\d+", re.UNICODE)


def natural_key(s: str) -> tuple:
    """Sort key where digit runs compare numerically (``name5`` before
    ``name10``) and letter runs compare case-folded."""
    return tuple(int(m) if m.isdigit() else m.lower()
                 for m in _nkre.findall(s))


def rcompile(pattern, flags: int = 0, verbose: bool = False):
    """re.compile wrapper: passes through pre-compiled patterns and
    always adds re.UNICODE."""
    if not isinstance(pattern, str):
        return pattern
    if verbose:
        flags |= re.VERBOSE
    return re.compile(pattern, re.UNICODE | flags)


def utf8encode(s: str) -> tuple:
    return s.encode("utf-8"), len(s)


def utf8decode(bs) -> tuple:
    s = bytes(bs).decode("utf-8")
    return s, len(bs)


def byte(i: int) -> bytes:
    """Single byte (reference compat.b/byte helper used by
    prefix_encode)."""
    return bytes([i])
