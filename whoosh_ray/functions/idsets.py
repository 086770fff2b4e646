"""Vectorized doc-id sets (reference: idsets.py:27-703).

The reference ships a pure-Python family — DocIdSet, BitSet,
SortedIntSet, RoaringIdSet, MultiIdSet — iterated one integer at a
time.  In a batch engine the same roles are numpy arrays: a filter is
applied as ONE ``contains(ids) -> bool mask`` kernel over a result
block, and a set ships to shard actors as ONE compact blob via
``ray.put`` (broadcast once, read in every task — never re-shipped per
batch).  So every class here exposes the reference's set API *plus*
vectorized ``contains``/``to_array`` and, for the broadcastable kinds,
``to_bytes``/``from_bytes``.

Representation parity notes (reference idsets.py):

- ``RoaringIdSet`` (:610-663) partitions ids into 2^16-wide buckets and
  keeps each bucket sparse (sorted uint16) or dense (4 KiB bitmap) with
  the same ROARING_CUTOFF = 2^12 crossing rule.  The reference's own
  class is broken as shipped — ``_find`` computes ``floor = n << 16``
  instead of ``bucket << 16`` so ``add(n)`` feeds negative residues to
  the container, and ``__iter__`` unpacks ``for i, idset in
  self.idsets`` over a flat list (TypeError) — so as with DFree there
  is no working behavior to pin; this is the published roaring design
  (Chambi et al., "Better bitmap performance with Roaring bitmaps")
  implemented correctly and vectorized.
- ``MultiIdSet`` (:666-701) aggregates per-segment sets behind global
  ids; the reference's ``_document_set`` (:682-684) takes ``max(...)``
  where interval location needs ``bisect_right - 1``, sending most
  lookups to the wrong sub-set — implemented correctly here.
- ``BitSet.to_disk`` (:360) writes the raw byte array; ``to_bytes`` is
  the same layout, so ``BitIdSet.from_bytes`` doubles as the
  OnDiskBitSet (:244) reader over any buffer.
"""

from __future__ import annotations

import struct

import numpy as np

# Bucket width and the sparse<->dense crossing point (reference
# idsets.py:607: ROARING_CUTOFF = 1 << 12).
BUCKET_BITS = 16
BUCKET_SIZE = 1 << BUCKET_BITS
ROARING_CUTOFF = 1 << 12
_WORDS = BUCKET_SIZE // 64  # uint64 words per dense container

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)

_U64_1 = np.uint64(1)


def _popcount(words: np.ndarray) -> int:
    return int(_POP8[words.view(np.uint8)].sum())


def _bits_to_sorted(words: np.ndarray) -> np.ndarray:
    """Dense bitmap -> sorted uint16 positions (words little-endian)."""
    bits = np.unpackbits(words.view(np.uint8), bitorder="little")
    return np.flatnonzero(bits).astype(np.uint16)


def _sorted_to_bits(lo: np.ndarray, nwords: int = _WORDS) -> np.ndarray:
    words = np.zeros(nwords, dtype=np.uint64)
    np.bitwise_or.at(words, lo >> 6, _U64_1 << (lo & 63).astype(np.uint64))
    return words


def _test_bits(words: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """bool mask: bit lo[i] set in words."""
    return ((words[lo >> 6] >> (lo & 63).astype(np.uint64)) & _U64_1) \
        .astype(bool)


class DocIdSet:
    """Base: a set of non-negative integers with the reference's set API
    (idsets.py:27-146) plus vectorized ``contains`` and ``to_array``."""

    def to_array(self) -> np.ndarray:
        """Sorted unique int64 member array."""
        raise NotImplementedError

    def contains(self, ids) -> np.ndarray:
        """Vectorized membership: bool mask aligned with ``ids``."""
        ids = np.asarray(ids, dtype=np.int64)
        arr = self.to_array()
        if not arr.size:
            return np.zeros(ids.shape, dtype=bool)
        pos = np.searchsorted(arr, ids)
        inb = pos < arr.size
        return inb & (arr[np.where(inb, pos, 0)] == ids)

    # ---- reference-API surface, generic implementations ----

    def __len__(self):
        return int(self.to_array().size)

    def __iter__(self):
        return iter(self.to_array().tolist())

    def __bool__(self):
        return len(self) > 0

    def __contains__(self, i):
        return bool(self.contains(np.array([i], dtype=np.int64))[0])

    def __eq__(self, other):
        mine = self.to_array()
        theirs = (other.to_array() if isinstance(other, DocIdSet)
                  else np.asarray(sorted(set(other)), dtype=np.int64))
        return mine.size == theirs.size and bool(np.all(mine == theirs))

    def __or__(self, other):
        return self.union(other)

    def __and__(self, other):
        return self.intersection(other)

    def __sub__(self, other):
        return self.difference(other)

    def _wrap(self, ids: np.ndarray) -> "DocIdSet":
        """Result constructor for the generic set algebra.  View-like
        subclasses (Reverse/Multi) cannot be rebuilt from a bare id
        array, so their results fall back to a concrete representation."""
        try:
            return type(self)(ids)
        except TypeError:
            return as_id_set(ids)

    def copy(self) -> "DocIdSet":
        return self._wrap(self.to_array())

    def _coerce(self, other) -> np.ndarray:
        if isinstance(other, DocIdSet):
            return other.to_array()
        return np.unique(np.asarray(list(other), dtype=np.int64))

    def union(self, other) -> "DocIdSet":
        return self._wrap(np.union1d(self.to_array(),
                                     self._coerce(other)))

    def intersection(self, other) -> "DocIdSet":
        return self._wrap(np.intersect1d(self.to_array(),
                                         self._coerce(other),
                                         assume_unique=True))

    def difference(self, other) -> "DocIdSet":
        return self._wrap(np.setdiff1d(self.to_array(),
                                       self._coerce(other),
                                       assume_unique=True))

    def invert(self, size: int) -> "DocIdSet":
        return self._wrap(np.setdiff1d(np.arange(size, dtype=np.int64),
                                       self.to_array(),
                                       assume_unique=True))

    def isdisjoint(self, other) -> bool:
        return not np.intersect1d(self.to_array(),
                                  self._coerce(other)).size

    # mutation defaults route through to_array (subclasses override
    # where a cheaper in-place path exists)

    def add(self, n: int) -> None:
        raise NotImplementedError

    def discard(self, n: int) -> None:
        raise NotImplementedError

    def update(self, other) -> None:
        for n in other:
            self.add(int(n))

    # ---- cursor helpers (reference idsets.py:128-146) ----

    def first(self):
        arr = self.to_array()
        return int(arr[0]) if arr.size else None

    def last(self):
        arr = self.to_array()
        return int(arr[-1]) if arr.size else None

    def before(self, i: int):
        arr = self.to_array()
        pos = np.searchsorted(arr, i)
        return int(arr[pos - 1]) if pos > 0 else None

    def after(self, i: int):
        arr = self.to_array()
        pos = np.searchsorted(arr, i, side="right")
        return int(arr[pos]) if pos < arr.size else None


class SortedIdSet(DocIdSet):
    """SortedIntSet (reference idsets.py:442-547) as a sorted unique
    int64 numpy array."""

    def __init__(self, source=None):
        if source is None:
            self.data = np.empty(0, dtype=np.int64)
        else:
            src = (source.to_array() if isinstance(source, DocIdSet)
                   else np.asarray(list(source) if not isinstance(
                       source, np.ndarray) else source, dtype=np.int64))
            self.data = np.unique(src.astype(np.int64, copy=False))

    def to_array(self) -> np.ndarray:
        return self.data

    def __len__(self):
        return int(self.data.size)

    def add(self, n: int) -> None:
        pos = int(np.searchsorted(self.data, n))
        if pos < self.data.size and self.data[pos] == n:
            return
        self.data = np.insert(self.data, pos, n)

    def discard(self, n: int) -> None:
        pos = int(np.searchsorted(self.data, n))
        if pos < self.data.size and self.data[pos] == n:
            self.data = np.delete(self.data, pos)

    def to_bytes(self) -> bytes:
        return self.data.tobytes()

    @classmethod
    def from_bytes(cls, bs: bytes) -> "SortedIdSet":
        s = cls()
        s.data = np.frombuffer(bs, dtype=np.int64).copy()
        return s


class BitIdSet(DocIdSet):
    """BitSet (reference idsets.py:288-439) as a uint64-word bitmap.
    ``to_bytes`` matches BitSet.to_disk's raw byte-array layout, so
    ``from_bytes`` also reads OnDiskBitSet (:244-285) payloads."""

    def __init__(self, source=None, size: int = 0):
        # NB any ndarray source — uint64 included — is a list of doc
        # IDS; raw bitmap words enter only via the explicit
        # ``_from_words`` / ``from_bytes`` constructors
        ids = (np.empty(0, dtype=np.int64) if source is None
               else self._coerce(source))
        top = int(ids[-1]) + 1 if ids.size else 0
        nwords = max((max(size, top) + 63) // 64, 1)
        self.words = np.zeros(nwords, dtype=np.uint64)
        if ids.size:
            np.bitwise_or.at(self.words, ids >> 6,
                             _U64_1 << (ids & 63).astype(np.uint64))

    @classmethod
    def _from_words(cls, words: np.ndarray) -> "BitIdSet":
        b = cls()
        b.words = words
        return b

    # construction from raw bytes (BitSet.from_bytes / OnDiskBitSet)
    @classmethod
    def from_bytes(cls, bs: bytes) -> "BitIdSet":
        buf = np.frombuffer(bs, dtype=np.uint8)
        pad = (-buf.size) % 8
        if pad:
            buf = np.concatenate([buf, np.zeros(pad, dtype=np.uint8)])
        return cls._from_words(buf.view(np.uint64).copy())

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    def to_array(self) -> np.ndarray:
        bits = np.unpackbits(self.words.view(np.uint8), bitorder="little")
        return np.flatnonzero(bits).astype(np.int64)

    def __len__(self):
        return _popcount(self.words)

    def contains(self, ids) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        inb = (ids >= 0) & (ids < self.words.size * 64)
        safe = np.where(inb, ids, 0)
        return inb & _test_bits(self.words, safe)

    def copy(self) -> "BitIdSet":
        return BitIdSet._from_words(self.words.copy())

    def _grow(self, nwords: int) -> None:
        if nwords > self.words.size:
            self.words = np.concatenate(
                [self.words,
                 np.zeros(nwords - self.words.size, dtype=np.uint64)])

    def add(self, n: int) -> None:
        self._grow(n // 64 + 1)
        self.words[n >> 6] |= _U64_1 << np.uint64(n & 63)

    def discard(self, n: int) -> None:
        if n // 64 < self.words.size:
            self.words[n >> 6] &= ~(_U64_1 << np.uint64(n & 63))

    def _aligned(self, other: "BitIdSet"):
        a, b = self.words, other.words
        n = max(a.size, b.size)
        if a.size < n:
            a = np.concatenate([a, np.zeros(n - a.size, dtype=np.uint64)])
        if b.size < n:
            b = np.concatenate([b, np.zeros(n - b.size, dtype=np.uint64)])
        return a, b

    def union(self, other):
        if isinstance(other, BitIdSet):
            a, b = self._aligned(other)
            return BitIdSet._from_words(a | b)
        return BitIdSet(np.union1d(self.to_array(), self._coerce(other)))

    def intersection(self, other):
        if isinstance(other, BitIdSet):
            a, b = self._aligned(other)
            return BitIdSet._from_words(a & b)
        return BitIdSet(np.intersect1d(self.to_array(),
                                       self._coerce(other)))

    def difference(self, other):
        if isinstance(other, BitIdSet):
            a, b = self._aligned(other)
            return BitIdSet._from_words(a & ~b)
        return BitIdSet(np.setdiff1d(self.to_array(),
                                     self._coerce(other)))

    # in-place mutators (reference idsets.py:73-95,379-404 surface,
    # vectorized)

    def clear(self) -> None:
        self.words[:] = 0

    def update(self, other) -> None:
        self.words = self.union(other).words

    def intersection_update(self, other) -> None:
        self.words = self.intersection(other).words

    def difference_update(self, other) -> None:
        self.words = self.difference(other).words

    def invert_update(self, size: int) -> None:
        """In place: contain exactly [0, size) minus current members
        (reference idsets.py:87-95)."""
        self.words = self.invert(size).words

    # byte-array disk protocol (reference idsets.py:352-372; the byte
    # layout equals the uint64-LE word dump — bit n lives at byte n>>3,
    # bit n&7, both here and in the reference's array("B") bitmap)

    def byte_count(self) -> int:
        return len(self.words) * 8

    def to_disk(self, dbfile) -> int:
        from array import array as _array

        a = _array("B", self.to_bytes())
        dbfile.write_array(a)
        return len(a)

    @classmethod
    def from_disk(cls, dbfile, bytecount: int) -> "BitIdSet":
        return cls.from_bytes(bytes(dbfile.read_array("B", bytecount)))

    def invert(self, size: int) -> "BitIdSet":
        nwords = (size + 63) // 64
        self._grow(nwords)
        words = ~self.words[:nwords]
        spill = size & 63
        if spill:
            words[-1] &= (_U64_1 << np.uint64(spill)) - _U64_1
        return BitIdSet._from_words(words)


class RoaringIdSet(DocIdSet):
    """Roaring bitmap: ids partitioned into 2^16 buckets, each bucket a
    sorted uint16 array (<= ROARING_CUTOFF members) or a 4 KiB bitmap
    (above it).  Bulk-built vectorized; ``contains`` groups the probe
    ids by bucket and tests each group with one kernel."""

    def __init__(self, source=None):
        self.keys = np.empty(0, dtype=np.int64)
        self.containers: list[np.ndarray] = []
        if source is not None:
            ids = (source.to_array() if isinstance(source, DocIdSet)
                   else np.unique(np.asarray(
                       list(source) if not isinstance(source, np.ndarray)
                       else source, dtype=np.int64)))
            self._bulk_load(ids)

    def _bulk_load(self, ids: np.ndarray) -> None:
        if not ids.size:
            return
        if int(ids[0]) < 0:
            raise ValueError("doc ids must be non-negative")
        keys = ids >> BUCKET_BITS
        uk, starts = np.unique(keys, return_index=True)
        bounds = np.append(starts, ids.size)
        self.keys = uk.astype(np.int64)
        self.containers = []
        for i in range(uk.size):
            lo = (ids[bounds[i]:bounds[i + 1]]
                  & (BUCKET_SIZE - 1)).astype(np.uint16)
            self.containers.append(_sorted_to_bits(lo)
                                   if lo.size > ROARING_CUTOFF else lo)

    # ---- core reads ----

    @staticmethod
    def _is_dense(c: np.ndarray) -> bool:
        return c.dtype == np.uint64

    def _container_len(self, c: np.ndarray) -> int:
        return _popcount(c) if self._is_dense(c) else int(c.size)

    def __len__(self):
        return sum(self._container_len(c) for c in self.containers)

    def to_array(self) -> np.ndarray:
        parts = []
        for k, c in zip(self.keys.tolist(), self.containers):
            lo = _bits_to_sorted(c) if self._is_dense(c) else c
            parts.append(lo.astype(np.int64) + (k << BUCKET_BITS))
        return (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.int64))

    def contains(self, ids) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        out = np.zeros(ids.shape, dtype=bool)
        if not self.keys.size or not ids.size:
            return out
        bk = ids >> BUCKET_BITS
        pos = np.searchsorted(self.keys, bk)
        inb = (pos < self.keys.size) & (ids >= 0)
        safe = np.where(inb, pos, 0)
        match = inb & (self.keys[safe] == bk)
        for j in np.unique(safe[match]):
            sel = match & (safe == j)
            lo = (ids[sel] & (BUCKET_SIZE - 1)).astype(np.uint16)
            c = self.containers[j]
            if self._is_dense(c):
                out[sel] = _test_bits(c, lo)
            else:
                p = np.searchsorted(c, lo)
                pin = p < c.size
                out[sel] = pin & (c[np.where(pin, p, 0)] == lo)
        return out

    def copy(self) -> "RoaringIdSet":
        r = RoaringIdSet()
        r.keys = self.keys.copy()
        r.containers = [c.copy() for c in self.containers]
        return r

    @property
    def nbytes(self) -> int:
        return self.keys.nbytes + sum(c.nbytes for c in self.containers)

    # ---- bucket-aligned set algebra ----

    @staticmethod
    def _norm(c: np.ndarray) -> np.ndarray:
        """Pick the representation the member count calls for."""
        if c.dtype == np.uint64:
            if _popcount(c) <= ROARING_CUTOFF:
                return _bits_to_sorted(c)
            return c
        if c.size > ROARING_CUTOFF:
            return _sorted_to_bits(c)
        return c

    @classmethod
    def _union_c(cls, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        da, db = a.dtype == np.uint64, b.dtype == np.uint64
        if da and db:
            return cls._norm(a | b)
        if da or db:
            words, lo = (a, b) if da else (b, a)
            words = words.copy()
            np.bitwise_or.at(words, lo >> 6,
                             _U64_1 << (lo & 63).astype(np.uint64))
            return cls._norm(words)
        return cls._norm(np.union1d(a, b).astype(np.uint16))

    @classmethod
    def _intersect_c(cls, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        da, db = a.dtype == np.uint64, b.dtype == np.uint64
        if da and db:
            return cls._norm(a & b)
        if da or db:
            words, lo = (a, b) if da else (b, a)
            return cls._norm(lo[_test_bits(words, lo)])
        return np.intersect1d(a, b, assume_unique=True).astype(np.uint16)

    @classmethod
    def _difference_c(cls, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        da, db = a.dtype == np.uint64, b.dtype == np.uint64
        if da and db:
            return cls._norm(a & ~b)
        if da:  # dense minus sparse: clear b's bits
            words = a.copy()
            np.bitwise_and.at(words, b >> 6,
                              ~(_U64_1 << (b & 63).astype(np.uint64)))
            return cls._norm(words)
        if db:  # sparse minus dense: keep unset bits
            return a[~_test_bits(b, a)]
        return np.setdiff1d(a, b, assume_unique=True).astype(np.uint16)

    def _rewrap(self, keys, containers) -> "RoaringIdSet":
        keep = [i for i, c in enumerate(containers)
                if self._container_len(c)]
        r = RoaringIdSet()
        r.keys = np.array([keys[i] for i in keep], dtype=np.int64)
        r.containers = [containers[i] for i in keep]
        return r

    def _as_roaring(self, other) -> "RoaringIdSet":
        return (other if isinstance(other, RoaringIdSet)
                else RoaringIdSet(self._coerce(other)))

    def union(self, other) -> "RoaringIdSet":
        o = self._as_roaring(other)
        keys = np.union1d(self.keys, o.keys)
        mine = dict(zip(self.keys.tolist(), self.containers))
        theirs = dict(zip(o.keys.tolist(), o.containers))
        out = []
        for k in keys.tolist():
            a, b = mine.get(k), theirs.get(k)
            out.append(self._union_c(a, b) if a is not None
                       and b is not None else (a if a is not None else b))
        return self._rewrap(keys.tolist(), out)

    def intersection(self, other) -> "RoaringIdSet":
        o = self._as_roaring(other)
        keys = np.intersect1d(self.keys, o.keys, assume_unique=True)
        mine = dict(zip(self.keys.tolist(), self.containers))
        theirs = dict(zip(o.keys.tolist(), o.containers))
        out = [self._intersect_c(mine[k], theirs[k])
               for k in keys.tolist()]
        return self._rewrap(keys.tolist(), out)

    def difference(self, other) -> "RoaringIdSet":
        o = self._as_roaring(other)
        theirs = dict(zip(o.keys.tolist(), o.containers))
        out = []
        for k, c in zip(self.keys.tolist(), self.containers):
            b = theirs.get(k)
            out.append(c if b is None else self._difference_c(c, b))
        return self._rewrap(self.keys.tolist(), out)

    def invert(self, size: int) -> "RoaringIdSet":
        mine = dict(zip(self.keys.tolist(), self.containers))
        keys, out = [], []
        for k in range((size + BUCKET_SIZE - 1) // BUCKET_SIZE):
            n_in_bucket = min(size - k * BUCKET_SIZE, BUCKET_SIZE)
            c = mine.get(k)
            words = (np.zeros(_WORDS, dtype=np.uint64) if c is None
                     else (c.copy() if self._is_dense(c)
                           else _sorted_to_bits(c)))
            words = ~words
            full = n_in_bucket // 64
            spill = n_in_bucket & 63
            if spill:
                words[full] &= (_U64_1 << np.uint64(spill)) - _U64_1
                words[full + 1:] = 0
            else:
                words[full:] = 0
            keys.append(k)
            out.append(self._norm(words))
        return self._rewrap(keys, out)

    # ---- point mutation (reference crossing rule idsets.py:651-663) ----

    def _bucket_at(self, n: int):
        k = n >> BUCKET_BITS
        pos = int(np.searchsorted(self.keys, k))
        hit = pos < self.keys.size and self.keys[pos] == k
        return k, pos, hit

    def add(self, n: int) -> None:
        if n < 0:
            raise ValueError("doc ids must be non-negative")
        k, pos, hit = self._bucket_at(n)
        lo = n & (BUCKET_SIZE - 1)
        if not hit:
            self.keys = np.insert(self.keys, pos, k)
            self.containers.insert(pos, np.array([lo], dtype=np.uint16))
            return
        c = self.containers[pos]
        if self._is_dense(c):
            # copy-on-write: set-operation results pass unchanged
            # containers through by reference, so in-place bit flips
            # would corrupt the operand they came from
            c = c.copy()
            c[lo >> 6] |= _U64_1 << np.uint64(lo & 63)
            self.containers[pos] = c
            return
        p = int(np.searchsorted(c, lo))
        if p < c.size and c[p] == lo:
            return
        c = np.insert(c, p, lo)
        # sparse -> dense when the count crosses the cutoff
        self.containers[pos] = (_sorted_to_bits(c)
                                if c.size > ROARING_CUTOFF else c)

    def discard(self, n: int) -> None:
        k, pos, hit = self._bucket_at(n)
        if not hit:
            return
        lo = n & (BUCKET_SIZE - 1)
        c = self.containers[pos]
        if self._is_dense(c):
            if not _test_bits(c, np.array([lo], dtype=np.uint16))[0]:
                return
            c = c.copy()  # copy-on-write (see add)
            c[lo >> 6] &= ~(_U64_1 << np.uint64(lo & 63))
            self.containers[pos] = c
            if _popcount(c) <= ROARING_CUTOFF:
                self.containers[pos] = _bits_to_sorted(c)
            if not self._container_len(self.containers[pos]):
                self._drop_bucket(pos)
            return
        p = int(np.searchsorted(c, lo))
        if p < c.size and c[p] == lo:
            c = np.delete(c, p)
            self.containers[pos] = c
            if not c.size:
                self._drop_bucket(pos)

    def _drop_bucket(self, pos: int) -> None:
        self.keys = np.delete(self.keys, pos)
        del self.containers[pos]

    # ---- broadcast blob (ship once via ray.put, not per batch) ----

    _MAGIC = b"WRRB"
    _SPARSE, _DENSE = 0, 1

    def to_bytes(self) -> bytes:
        parts = [self._MAGIC, struct.pack("<I", self.keys.size)]
        for k, c in zip(self.keys.tolist(), self.containers):
            dense = self._is_dense(c)
            payload = c.tobytes()
            parts.append(struct.pack("<qBI", k,
                                     self._DENSE if dense else self._SPARSE,
                                     len(payload)))
            parts.append(payload)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, bs: bytes) -> "RoaringIdSet":
        if bs[:4] != cls._MAGIC:
            raise ValueError("not a roaring id-set blob")
        (count,) = struct.unpack_from("<I", bs, 4)
        off = 8
        r = cls()
        keys, containers = [], []
        for _ in range(count):
            k, kind, nbytes = struct.unpack_from("<qBI", bs, off)
            off += 13
            raw = bs[off:off + nbytes]
            off += nbytes
            containers.append(np.frombuffer(raw, dtype=np.uint64).copy()
                              if kind == cls._DENSE
                              else np.frombuffer(raw,
                                                 dtype=np.uint16).copy())
            keys.append(k)
        r.keys = np.array(keys, dtype=np.int64)
        r.containers = containers
        return r


class ReverseIdSet(DocIdSet):
    """Complement view of a wrapped set over [0, limit)
    (reference idsets.py:550-605)."""

    def __init__(self, idset: DocIdSet, limit: int):
        self.idset = idset
        self.limit = limit

    def __len__(self):
        return self.limit - len(self.idset)

    def contains(self, ids) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        return ((ids >= 0) & (ids < self.limit)
                & ~self.idset.contains(ids))

    def to_array(self) -> np.ndarray:
        return np.setdiff1d(np.arange(self.limit, dtype=np.int64),
                            self.idset.to_array(), assume_unique=True)

    def add(self, n: int) -> None:
        self.idset.discard(n)

    def discard(self, n: int) -> None:
        self.idset.add(n)

    def copy(self) -> "ReverseIdSet":
        return ReverseIdSet(self.idset.copy(), self.limit)


class MultiIdSet(DocIdSet):
    """Read-only aggregation of serial per-segment sets behind global
    ids (reference idsets.py:666-701; its interval location is buggy —
    see module docstring — so this is the corrected semantics: segment
    of id n = rightmost offset <= n)."""

    def __init__(self, idsets: list[DocIdSet], offsets: list[int]):
        assert len(idsets) == len(offsets)
        self.idsets = idsets
        self.offsets = np.asarray(offsets, dtype=np.int64)

    def __len__(self):
        return sum(len(s) for s in self.idsets)

    def contains(self, ids) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        out = np.zeros(ids.shape, dtype=bool)
        if not len(self.idsets):
            return out
        seg = np.searchsorted(self.offsets, ids, side="right") - 1
        for j in np.unique(seg[seg >= 0]):
            sel = seg == j
            out[sel] = self.idsets[j].contains(ids[sel]
                                               - self.offsets[j])
        return out

    def to_array(self) -> np.ndarray:
        parts = [s.to_array() + off
                 for s, off in zip(self.idsets, self.offsets.tolist())]
        return (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.int64))


def as_id_set(obj) -> DocIdSet:
    """Coerce queries-of-ids / arrays / iterables to a DocIdSet.
    Large inputs get the roaring representation (compact to broadcast);
    small ones stay sorted arrays."""
    if isinstance(obj, DocIdSet):
        return obj
    arr = np.unique(np.asarray(
        obj if isinstance(obj, np.ndarray) else list(obj),
        dtype=np.int64))
    return RoaringIdSet(arr) if arr.size > ROARING_CUTOFF \
        else SortedIdSet(arr)
