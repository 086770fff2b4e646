"""Doc-id sets: set-algebra parity with Python sets over mixed
sparse/dense draws, serialization roundtrips, vectorized contains, and
the reference-API cursor helpers (reference idsets.py:27-703).

The reference's own RoaringIdSet is broken as shipped (idsets.py:642-647
computes floor = n << 16 and :637 unpacks a flat list), so there is no
working behavior to pin — a regression test documents that fact and the
rest of the file checks the published roaring semantics instead.
"""

import random

import numpy as np
import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.functions.idsets import (BitIdSet, MultiIdSet,
                                         ROARING_CUTOFF, ReverseIdSet,
                                         RoaringIdSet, SortedIdSet,
                                         as_id_set)


def _draws(seed):
    """Mixed shapes: sparse scatter, a dense run (> cutoff in one
    bucket), bucket-boundary ids, empty."""
    rng = random.Random(seed)
    sparse = sorted(rng.sample(range(0, 1 << 21), 700))
    dense = list(range(131072, 131072 + ROARING_CUTOFF + 500))
    edges = [0, 65535, 65536, 65537, 131071, (1 << 21) - 1]
    mixed = sorted(set(sparse + dense + edges))
    return {"sparse": sparse, "dense": dense, "edges": edges,
            "mixed": mixed, "empty": []}


KINDS = [SortedIdSet, BitIdSet, RoaringIdSet]


@pytest.mark.parametrize("kind", KINDS)
def test_set_algebra_parity(kind):
    d = _draws(7)
    names = list(d)
    for i, na in enumerate(names):
        a_ids, sa = d[na], set(d[na])
        a = kind(a_ids)
        assert len(a) == len(sa)
        assert a.to_array().tolist() == sorted(sa)
        for nb in names[i:]:
            b_ids, sb = d[nb], set(d[nb])
            b = kind(b_ids)
            assert (a | b).to_array().tolist() == sorted(sa | sb)
            assert (a & b).to_array().tolist() == sorted(sa & sb)
            assert (a - b).to_array().tolist() == sorted(sa - sb)
            assert a.isdisjoint(b) == sa.isdisjoint(sb)


@pytest.mark.parametrize("kind", KINDS)
def test_contains_vectorized(kind):
    d = _draws(11)
    s = kind(d["mixed"])
    probe = np.array(d["mixed"][:50]
                     + [1, 2, 70000, (1 << 21), (1 << 22) + 5],
                     dtype=np.int64)
    want = np.array([int(p) in set(d["mixed"]) for p in probe])
    assert (s.contains(probe) == want).all()
    assert (65536 in s) == (65536 in set(d["mixed"]))
    assert ((1 << 40) in s) is False


@pytest.mark.parametrize("kind", KINDS)
def test_invert_and_cursors(kind):
    ids = [0, 3, 5, 100, 65535, 65536, 200000]
    s = kind(ids)
    size = 200002
    inv = s.invert(size)
    assert inv.to_array().tolist() == sorted(
        set(range(size)) - set(ids))
    assert s.first() == 0 and s.last() == 200000
    assert s.before(5) == 3 and s.after(5) == 100
    assert s.before(0) is None and s.after(200000) is None
    assert s.after(-1) == 0 and s.before(10 ** 9) == 200000
    assert kind([]).first() is None and kind([]).last() is None


@pytest.mark.parametrize("kind", KINDS)
def test_point_mutation(kind):
    rng = random.Random(3)
    s = kind([])
    model = set()
    # push one bucket across the sparse->dense cutoff and back
    ops = ([("add", n) for n in rng.sample(range(0, 1 << 17),
                                           ROARING_CUTOFF + 400)]
           + [("discard", n) for n in rng.sample(range(0, 1 << 17),
                                                 3000)])
    rng.shuffle(ops)
    for op, n in ops:
        getattr(s, op)(n)
        getattr(model, op)(n)
    assert s.to_array().tolist() == sorted(model)
    assert len(s) == len(model)


def test_roaring_representation_and_blob():
    d = _draws(19)
    r = RoaringIdSet(d["mixed"])
    kinds = {c.dtype.type for c in r.containers}
    assert np.uint64 in kinds and np.uint16 in kinds  # both reprs live
    # compact vs int64 shipping: the dense run costs ~8KiB, not 8B/id
    assert r.nbytes < np.asarray(d["mixed"]).nbytes
    blob = r.to_bytes()
    back = RoaringIdSet.from_bytes(blob)
    assert back == r
    assert back.to_array().tolist() == r.to_array().tolist()
    with pytest.raises(ValueError):
        RoaringIdSet.from_bytes(b"nope" + blob)
    with pytest.raises(ValueError):
        RoaringIdSet([-1])


def test_bitset_bytes_layout():
    """to_bytes matches the reference BitSet.to_disk raw-bit layout
    (idsets.py:360-362): byte i bit j  <=>  id 8*i+j."""
    ids = [1, 10, 15, 7, 2]  # the OnDiskBitSet docstring example
    b = BitIdSet(ids)
    raw = b.to_bytes()
    assert raw[0] == (1 << 1) | (1 << 2) | (1 << 7)
    assert raw[1] == (1 << (10 - 8)) | (1 << (15 - 8))
    assert BitIdSet.from_bytes(raw).to_array().tolist() == sorted(ids)


def test_reverse_and_multi():
    inner = RoaringIdSet([1, 5, 9])
    rev = ReverseIdSet(inner, 12)
    assert len(rev) == 9
    assert rev.to_array().tolist() == [0, 2, 3, 4, 6, 7, 8, 10, 11]
    assert (rev.contains(np.array([0, 1, 5, 11, 12, -1]))
            == np.array([True, False, False, True, False, False])).all()
    rev.add(5)
    assert 5 in rev and 5 not in inner
    rev.discard(5)
    assert 5 not in rev and 5 in inner

    m = MultiIdSet([SortedIdSet([0, 3]), SortedIdSet([2]),
                    SortedIdSet([0, 7])], [0, 10, 20])
    assert m.to_array().tolist() == [0, 3, 12, 20, 27]
    assert len(m) == 5
    assert (m.contains(np.array([0, 3, 10, 12, 20, 27, 5]))
            == np.array([True, True, False, True, True, True,
                         False])).all()


def test_as_id_set_picks_representation():
    small = as_id_set([3, 1, 2])
    assert isinstance(small, SortedIdSet)
    big = as_id_set(np.arange(ROARING_CUTOFF + 10))
    assert isinstance(big, RoaringIdSet)
    assert as_id_set(big) is big
    assert small == [1, 2, 3]


def test_reference_roaring_is_broken_as_shipped():
    """No behavior to pin: the reference RoaringIdSet corrupts on add
    (floor = n << 16, idsets.py:644) and crashes on iteration
    (idsets.py:637) — recorded here the way DFree's breakage is."""
    load_whoosh_oracle()
    from whoosh.idsets import RoaringIdSet as RefRoaring

    from whoosh.idsets import SortedIntSet as RefSorted

    # residue n - (n << 16) is negative for every n >= 1 and overflows
    # the container's unsigned typecode — adding ANY nonzero id fails
    with pytest.raises(OverflowError):
        RefRoaring().add(70000)
    with pytest.raises(OverflowError):
        RefRoaring([1, 2])
    # and even a hand-assembled instance cannot be iterated
    r = RefRoaring()
    r.idsets = [RefSorted([1, 2])]
    with pytest.raises(TypeError):
        list(r)


def test_mutating_an_op_result_leaves_operands_alone():
    """Set-operation results may share unchanged containers with their
    operands; point mutations must copy-on-write, never corrupt the
    source set (dense containers flip bits in place without it)."""
    dense = RoaringIdSet(np.arange(ROARING_CUTOFF + 500, dtype=np.int64))
    other = RoaringIdSet([1 << 20])  # disjoint bucket: pass-through
    before = dense.to_array().tolist()
    u = dense | other
    u.add(ROARING_CUTOFF + 600)         # lands in dense's bucket
    u.discard(3)
    assert dense.to_array().tolist() == before
    d = dense - other
    d.discard(5)
    assert dense.to_array().tolist() == before


def test_bitset_mutators_and_disk_roundtrip(tmp_path):
    """In-place mutators + the byte-array disk protocol (reference
    idsets.py:73-95,352-404), cross-checked against the reference
    BitSet on the same operations."""
    from tests.conftest import load_whoosh_oracle

    from whoosh_ray.filedb.structfile import StructFile
    from whoosh_ray.idsets import BitSet

    load_whoosh_oracle()
    from whoosh.idsets import BitSet as RefBitSet

    a = BitSet([1, 5, 9, 63, 64, 200])
    ra = RefBitSet([1, 5, 9, 63, 64, 200], size=256)

    # update / intersection_update / difference_update / invert_update
    for op, arg in [("update", [2, 5, 100]),
                    ("intersection_update", [5, 9, 64, 100, 200]),
                    ("difference_update", [9, 100])]:
        getattr(a, op)(BitSet(arg))
        getattr(ra, op)(RefBitSet(arg))
        assert sorted(a.to_array().tolist()) == sorted(ra), op

    # invert_update: ours contains exactly [0, size) minus members;
    # the reference flips only its ALLOCATED byte prefix (it never
    # grows to size) — parity holds on that prefix
    before = set(a.to_array().tolist())
    a.invert_update(256)
    ra.invert_update(256)
    assert set(a.to_array().tolist()) == set(range(256)) - before
    prefix_bits = len(ra.bits) * 8
    assert (sorted(x for x in a.to_array().tolist() if x < prefix_bits)
            == sorted(ra))

    # reference artifact: invert_update(size) with size SMALLER than
    # the allocated bitmap computes a negative spill, makes the mask a
    # float (2**negative) and crashes (idsets.py:341-345); ours inverts
    # the [0, size) prefix cleanly
    a2, ra2 = BitSet([1, 200]), RefBitSet([1, 200], size=256)
    a2.invert_update(128)
    assert sorted(a2.to_array().tolist()) == sorted(
        set(range(128)) - {1})
    import pytest as _pytest
    with _pytest.raises(TypeError):
        ra2.invert_update(128)

    # clear
    a.clear()
    ra.clear()
    assert len(a) == 0 and sorted(ra) == []

    # disk roundtrip through our StructFile
    b = BitSet([3, 77, 1000])
    p = tmp_path / "bits.bin"
    with open(p, "wb") as f:
        n = b.to_disk(StructFile(f))
    assert n == b.byte_count()
    with open(p, "rb") as f:
        back = BitSet.from_disk(StructFile(f), n)
    assert back.to_array().tolist() == [3, 77, 1000]

    # byte layout equals the reference's array("B") bitmap — ours pads
    # to a whole uint64 word with zero bytes, the reference stops at
    # the last occupied byte
    # (the reference's bytes_for_bits over-allocates one trailing byte
    # for whole-byte sizes; both tails are zero)
    rb = RefBitSet([3, 77, 1000], size=len(b.words) * 64)
    mine = b.to_bytes()
    refb = bytes(rb.bits)
    n = min(len(mine), len(refb))
    assert mine[:n] == refb[:n]
    assert set(mine[n:]) <= {0} and set(refb[n:]) <= {0}
