"""Column-type compat surface (reference columns.py).

The reference stores per-document "column" files next to the inverted
index so fields can be sorted/faceted without loading stored documents;
each class here describes one on-disk codec.  In this engine *every*
stored field is already a real Arrow column in ``docs.parquet`` —
columnar, compressed, mmap-readable — so these classes are accepted
**as declarative markers** (``FieldSpec``'s ``sortable=`` argument
takes them, reference fields accept ``sortable=columns.VarBytesColumn()``)
and carry no storage behavior of their own.  Per-document access goes
through :class:`whoosh_ray.search.reader.ColumnReader`
(``searcher.reader().column_reader(field)``), which serves the same
``__len__/__getitem__/sort_key`` protocol from the parquet column.

Constructor signatures match the reference so schema definitions port
verbatim.
"""

from __future__ import annotations

from whoosh_ray.search.reader import ColumnReader  # noqa: F401


class Column:
    """Base marker; ``default`` is what missing documents read as."""

    _default = None

    def default_value(self, reverse: bool = False):
        return self._default

    def stores_lists(self) -> bool:
        return False

    def __repr__(self):
        return f"{self.__class__.__name__}()"


class VarBytesColumn(Column):
    _default = b""

    def __init__(self, allow_offsets: bool = True,
                 write_offsets_cutoff: int = 2 ** 15):
        self.allow_offsets = allow_offsets
        self.write_offsets_cutoff = write_offsets_cutoff


class FixedBytesColumn(Column):
    def __init__(self, fixedlen: int, default: bytes | None = None):
        self.fixedlen = fixedlen
        self._default = default if default is not None else b"\x00" * fixedlen


class RefBytesColumn(Column):
    """Dictionary-encoded bytes in the reference; parquet dictionary
    encoding plays this role automatically."""

    def __init__(self, fixedlen: int = 0, default: bytes | None = None):
        self.fixedlen = fixedlen
        if default is None:
            default = b"\x00" * fixedlen if fixedlen else b""
        self._default = default


class NumericColumn(FixedBytesColumn):
    def __init__(self, typecode: str, default: int = 0):
        self.typecode = typecode
        self._default = default

    def default_value(self, reverse: bool = False):
        v = self._default
        if reverse and isinstance(v, (int, float)):
            return 0 - v
        return v


class BitColumn(Column):
    _default = False

    def __init__(self, compress_at: int = 2048):
        self.compress_at = compress_at

    def default_value(self, reverse: bool = False):
        return self._default ^ reverse


class CompressedBytesColumn(Column):
    _default = b""

    def __init__(self, level: int = 3, module: str = "zlib"):
        self.level = level
        self.module = module


class CompressedBlockColumn(Column):
    _default = b""

    def __init__(self, level: int = 3, blocksize: int = 32,
                 module: str = "zlib"):
        self.level = level
        self.blocksize = blocksize
        self.module = module


class StructColumn(FixedBytesColumn):
    def __init__(self, spec: str, default):
        self.spec = spec
        self._default = default


class WrappedColumn(Column):
    def __init__(self, child: Column):
        self._child = child

    def stores_lists(self) -> bool:
        return self._child.stores_lists()


class ClampedNumericColumn(WrappedColumn):
    """Clamps out-of-range values to the typecode's bounds on write."""


class PickleColumn(WrappedColumn):
    """Pickles arbitrary objects into the wrapped bytes column; stored
    Arrow columns hold native values here, so this is a pure marker."""

    _default = None


class ListColumn(WrappedColumn):
    def stores_lists(self) -> bool:
        return True


class VarBytesListColumn(ListColumn):
    _default = []

    def __init__(self):
        pass


class FixedBytesListColumn(ListColumn):
    _default = []

    def __init__(self, fixedlen: int):
        self.fixedlen = fixedlen


class ColumnWriter:
    """Marker for the reference's writer half (columns.py:119-135);
    stored Arrow columns are written by the build pipeline here."""

    def __init__(self, dbfile=None):
        self.dbfile = dbfile


class EmptyColumnReader:
    """Reader returning a default value for every document
    (reference columns.py:1010-1031)."""

    def __init__(self, default, doccount: int):
        self._default = default
        self._doccount = doccount

    def __len__(self) -> int:
        return self._doccount

    def __getitem__(self, docnum):
        return self._default

    def __iter__(self):
        from itertools import repeat

        return repeat(self._default, self._doccount)

    def sort_key(self, docnum):
        return self._default


class MultiColumnReader:
    """Concatenation of per-segment readers (reference
    columns.py:1034-1072)."""

    def __init__(self, readers, offsets=None):
        self._readers = list(readers)
        if offsets is None:
            self._offsets = []
            base = 0
            for r in self._readers:
                self._offsets.append(base)
                base += len(r)
        else:
            self._offsets = list(offsets)

    def __len__(self) -> int:
        return sum(len(r) for r in self._readers)

    def _find(self, docnum: int):
        from bisect import bisect_right

        i = bisect_right(self._offsets, docnum) - 1
        return self._readers[i], docnum - self._offsets[i]

    def __getitem__(self, docnum):
        r, n = self._find(docnum)
        return r[n]

    def __iter__(self):
        for r in self._readers:
            yield from r

    def sort_key(self, docnum):
        r, n = self._find(docnum)
        return r.sort_key(n) if hasattr(r, "sort_key") else r[n]


class TranslatingColumnReader:
    """Wraps a reader, applying ``translate`` per value (reference
    columns.py:1075-1116); ``raw_column()`` unwraps."""

    def __init__(self, reader, translate):
        self._reader = reader
        self._translate = translate

    def raw_column(self):
        return self._reader

    def __len__(self) -> int:
        return len(self._reader)

    def __getitem__(self, docnum):
        return self._translate(self._reader[docnum])

    def __iter__(self):
        return (self._translate(v) for v in self._reader)

    def sort_key(self, docnum):
        return self._reader.sort_key(docnum) \
            if hasattr(self._reader, "sort_key") else self[docnum]


#: list-column reader role (reference columns.py:1237-1243) — the
#: engine's ColumnReader already returns native lists for list columns
ListColumnReader = ColumnReader
WrappedColumnReader = TranslatingColumnReader
WrappedColumnWriter = ColumnWriter


#: bit-set machinery the reference columns module re-exports
#: (reference columns.py imports BitSet/OnDiskBitSet from idsets and
#: GrowableArray from util.numlists)
from whoosh_ray.idsets import BitSet, OnDiskBitSet  # noqa: E402,F401
from whoosh_ray.util.numlists import GrowableArray  # noqa: E402,F401
