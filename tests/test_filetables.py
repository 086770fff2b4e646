"""filedb.filetables byte-format parity: files written by our
HashWriter/OrderedHashWriter/FieldedOrderedHashWriter read with the
REFERENCE readers and vice versa, plus lookup-behavior parity."""

from __future__ import annotations

import os

import pytest

from tests.conftest import load_whoosh_oracle

PAIRS = [(b"alpha", b"1"), (b"beta", b"two"), (b"delta", b""),
         (b"gamma", b"ggg" * 50), (b"zeta", b"z")]
DUPED = PAIRS + [(b"beta", b"again"), (b"beta", b"thrice")]


def _ref_mods():
    load_whoosh_oracle()
    from whoosh.filedb import filetables as rt
    from whoosh.filedb.structfile import StructFile as RefSF
    return rt, RefSF


def _my_mods():
    from whoosh_ray.filedb import filetables as mt
    from whoosh_ray.filedb.structfile import StructFile as MySF
    return mt, MySF


def _write(path, writer_cls, sf_cls, pairs, fielded=None):
    f = sf_cls(open(path, "wb"))
    w = writer_cls(f)
    if fielded:
        for fieldname, fpairs in fielded:
            w.start_field(fieldname)
            for k, v in fpairs:
                w.add(k, v)
            w.end_field()
    else:
        for k, v in pairs:
            w.add(k, v)
    return w.close()


def test_cdb_hashtype_broken_on_py3():
    # hashtype 2 (cdb_hash) iterates bytes and calls ord() on ints —
    # TypeError on Python 3 in the reference (filetables.py:54); same
    # crash here
    rt, _ = _ref_mods()
    mt, _ = _my_mods()
    with pytest.raises(TypeError):
        rt.cdb_hash(b"alpha")
    with pytest.raises(TypeError):
        mt.cdb_hash(b"alpha")


@pytest.mark.parametrize("hashtype", [0, 1])
def test_hash_roundtrip_bytes_identical(tmp_path, hashtype):
    rt, RefSF = _ref_mods()
    mt, MySF = _my_mods()
    a, b = str(tmp_path / "ref.hsh"), str(tmp_path / "my.hsh")

    fa = RefSF(open(a, "wb"))
    wa = rt.HashWriter(fa, hashtype=hashtype)
    wa.add_all(DUPED)
    wa.close()

    fb = MySF(open(b, "wb"))
    wb = mt.HashWriter(fb, hashtype=hashtype)
    wb.add_all(DUPED)
    wb.close()

    assert open(a, "rb").read() == open(b, "rb").read()


def test_cross_read_hash(tmp_path):
    rt, RefSF = _ref_mods()
    mt, MySF = _my_mods()

    mine = str(tmp_path / "my.hsh")
    _write(mine, mt.HashWriter, MySF, DUPED)
    r = rt.HashReader(RefSF(open(mine, "rb")),
                      length=os.path.getsize(mine))
    assert r[b"alpha"] == b"1"
    assert sorted(r.all(b"beta")) == [b"again", b"thrice", b"two"]
    assert b"zeta" in r and b"nope" not in r
    assert sorted(r.keys()) == sorted(k for k, _ in DUPED)
    r.close()

    theirs = str(tmp_path / "ref.hsh")
    _write(theirs, rt.HashWriter, RefSF, DUPED)
    m = mt.HashReader(MySF(open(theirs, "rb")),
                      length=os.path.getsize(theirs))
    assert m[b"gamma"] == b"ggg" * 50
    assert m.get(b"nope") is None
    assert sorted(m.items()) == sorted(DUPED)
    m.close()


def test_ordered_hash_cross_read(tmp_path):
    rt, RefSF = _ref_mods()
    mt, MySF = _my_mods()
    pairs = sorted(PAIRS)

    mine = str(tmp_path / "my.ohsh")
    _write(mine, mt.OrderedHashWriter, MySF, pairs)
    r = rt.OrderedHashReader(RefSF(open(mine, "rb")),
                             length=os.path.getsize(mine))
    m = mt.OrderedHashReader(MySF(open(mine, "rb")),
                             length=os.path.getsize(mine))
    for probe in (b"", b"alpha", b"alpz", b"beta", b"gamm", b"zz"):
        assert r.closest_key(probe) == m.closest_key(probe), probe
        assert list(r.keys_from(probe)) == list(m.keys_from(probe)), probe
    assert list(r.items_from(b"b")) == list(m.items_from(b"b"))
    r.close()
    m.close()

    # out-of-order add raises on both
    bad = str(tmp_path / "bad.ohsh")
    w = mt.OrderedHashWriter(MySF(open(bad, "wb")))
    w.add(b"m", b"1")
    with pytest.raises(ValueError):
        w.add(b"a", b"2")


def test_fielded_ordered_cross_read(tmp_path):
    rt, RefSF = _ref_mods()
    mt, MySF = _my_mods()
    fields = [("body", sorted([(b"apple", b"1"), (b"pear", b"2"),
                               (b"plum", b"3")])),
              ("title", sorted([(b"apple", b"t1"), (b"zebra", b"t2")]))]

    mine = str(tmp_path / "my.fhsh")
    _write(mine, mt.FieldedOrderedHashWriter, MySF, None, fielded=fields)
    r = rt.FieldedOrderedHashReader(RefSF(open(mine, "rb")),
                                    length=os.path.getsize(mine))
    m = mt.FieldedOrderedHashReader(MySF(open(mine, "rb")),
                                    length=os.path.getsize(mine))
    # shared surface reads identically
    assert list(r.iter_terms()) == list(m.iter_terms())
    assert list(r.iter_term_items()) == list(m.iter_term_items())
    for field, probe, want in [("body", b"pear", True),
                               ("body", b"zebra", False),
                               ("title", b"zebra", True)]:
        assert r.contains_term(field, probe) == \
            m.contains_term(field, probe) == want
    assert r.term_data("body", b"plum") == m.term_data("body", b"plum") \
        == b"3"
    # closest_term: the reference strides by entry count
    # (filetables.py:695) — broken as shipped for counts != typecode
    # size; ours strides by the typecode size and returns the right
    # neighbors
    assert m.closest_term("body", b"b") == b"pear"
    assert m.closest_term("body", b"q") is None
    assert list(m.terms_from("title", b"b")) == [b"zebra"]
    r.close()
    m.close()
