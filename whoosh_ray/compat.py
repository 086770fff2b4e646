"""Python-2/3 compatibility aliases, kept so reference-era user code
(``from whoosh.compat import u, text_type, iteritems``) keeps working
after switching the import root (reference compat.py:1-180).  This
package is Python-3 only, so every alias is the py3 binding.
"""

import array as _array
import io
import pickle
import queue  # noqa: F401  (re-export)
from html import escape as htmlescape  # noqa: F401
from itertools import permutations  # noqa: F401
from pickle import dump, dumps, load, loads  # noqa: F401
from urllib.request import urlretrieve  # noqa: F401

PY3 = True

BytesIO = io.BytesIO
StringIO = io.StringIO

integer_types = (int,)
long_type = int
string_type = str
text_type = str
bytes_type = bytes

unichr = chr
xrange = range
izip = zip
next = next


def b(s):
    return s.encode("latin-1")


def u(s):
    if isinstance(s, bytes):
        return s.decode("ascii")
    return s


def byte(num):
    return bytes((num,))


def callable(o):  # noqa: A001 - reference exports this name
    import collections.abc

    return isinstance(o, collections.abc.Callable)


def exec_(code, ns=None):
    exec(code, ns if ns is not None else {})


def iteritems(o):
    return o.items()


def itervalues(o):
    return o.values()


def iterkeys(o):
    return iter(o.keys())


def zip_(*args):
    return list(zip(*args))


def memoryview_(source, offset=None, length=None):
    mv = memoryview(source)
    if offset or length:
        return mv[offset:offset + length]
    return mv


def with_metaclass(meta, base=object):
    ns = dict(base=base, meta=meta)
    exec("class _WhooshBase(base, metaclass=meta):\n    pass", ns)
    return ns["_WhooshBase"]


def array_tobytes(arry: _array.array) -> bytes:
    return arry.tobytes()


def array_frombytes(arry: _array.array, bs: bytes) -> None:
    arry.frombytes(bs)
