"""Drop-in util surface (the reference whoosh/util helpers user code
actually imports: rcompile from util/text.py, fib from
util/__init__.py, the sortable converters from util/numeric.py and the
datetime converters from util/times.py)."""

from __future__ import annotations

import re

from whoosh_ray.fields import (  # noqa: F401
    datetime_to_long,
    float_to_sortable_long,
    from_sortable,
    long_to_datetime,
    sortable_long_to_float,
    to_sortable,
)
from whoosh_ray.writing import fib  # noqa: F401


def rcompile(pattern, flags: int = 0, verbose: bool = False):
    """re.compile wrapper: passes through pre-compiled patterns and
    always adds re.UNICODE (reference util/text.py:122-132)."""
    if not isinstance(pattern, str):
        return pattern
    if verbose:
        flags |= re.VERBOSE
    return re.compile(pattern, re.UNICODE | flags)


def make_binary_tree(fn, args, **kwargs):
    """Fold a flat argument list into a balanced binary tree of
    ``fn(left, right)`` calls (reference util/__init__.py:76-92) — the
    shape the classic SpanNear/phrase trees use."""
    count = len(args)
    if not count:
        raise ValueError("Called make_binary_tree with empty list")
    if count == 1:
        return args[0]
    half = count // 2
    return fn(make_binary_tree(fn, args[:half], **kwargs),
              make_binary_tree(fn, args[half:], **kwargs), **kwargs)


def make_weighted_tree(fn, ls, **kwargs):
    """Huffman-style weighted tree from (weight, obj) pairs (reference
    util/__init__.py:95-111)."""
    if not ls:
        raise ValueError("Called make_weighted_tree with empty list")
    ls.sort()
    while len(ls) > 1:
        a = ls.pop(0)
        b = ls.pop(0)
        insort(ls, (a[0] + b[0], fn(a[1], b[1])))
    return ls[0][1]


from bisect import insort  # noqa: E402


def synchronized(func):
    """Method decorator serializing on ``self._sync_lock`` (reference
    util/__init__.py:119-129)."""
    import functools

    @functools.wraps(func)
    def wrapper(self, *args, **kwargs):
        with self._sync_lock:
            return func(self, *args, **kwargs)

    return wrapper


def random_bytes(size: int = 20) -> bytes:
    import os as _os

    return _os.urandom(size)


def random_name(size: int = 28) -> str:
    from whoosh_ray.writing import random_name as _rn

    return _rn(size)


#: valid separate characters in case-insensitive filenames
#: (reference util/__init__.py:37)
IDCHARS = "0123456789abcdefghijklmnopqrstuvwxyz"

from time import perf_counter as now  # noqa: E402  (reference util:41-46)


def unclosed(method):
    """Method decorator raising on a closed object
    (reference util/__init__.py:132-143)."""
    import functools

    @functools.wraps(method)
    def unclosed_wrapper(self, *args, **kwargs):
        if self.closed:
            raise ValueError("Operation on a closed object")
        return method(self, *args, **kwargs)

    return unclosed_wrapper
