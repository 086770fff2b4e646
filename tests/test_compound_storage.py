"""filedb.compound byte-format parity: compound files assembled here
open with the reference CompoundStorage and vice versa."""

from __future__ import annotations

import os

from tests.conftest import load_whoosh_oracle

FILES = {"a.bin": b"alpha" * 100, "b.bin": b"", "c.bin": b"\x00\xff" * 33}


def _fill(dirpath):
    os.makedirs(dirpath, exist_ok=True)
    for name, data in FILES.items():
        with open(os.path.join(dirpath, name), "wb") as f:
            f.write(data)


def test_assemble_cross_read(tmp_path):
    load_whoosh_oracle()
    from whoosh.filedb.compound import CompoundStorage as RefCS
    from whoosh.filedb.filestore import FileStorage as RefFS
    from whoosh.filedb.structfile import StructFile as RefSF

    from whoosh_ray.filedb.compound import CompoundStorage as MyCS
    from whoosh_ray.filedb.filestore import FileStorage as MyFS
    from whoosh_ray.filedb.structfile import StructFile as MySF

    src = str(tmp_path / "src")
    _fill(src)

    # ours assembles -> reference reads
    mine = str(tmp_path / "mine.cmp")
    MyCS.assemble(MySF(open(mine, "wb")), MyFS(src), sorted(FILES))
    rcs = RefCS(RefSF(open(mine, "rb")))
    assert sorted(rcs.list()) == sorted(FILES)
    for name, data in FILES.items():
        assert rcs.file_length(name) == len(data)
        f = rcs.open_file(name)
        assert f.read(len(data)) == data
        f.close()
    rcs.close()

    # reference assembles -> ours reads (mmap and non-mmap paths)
    theirs = str(tmp_path / "theirs.cmp")
    RefCS.assemble(RefSF(open(theirs, "wb")), RefFS(src), sorted(FILES))
    for use_mmap in (True, False):
        mcs = MyCS(MySF(open(theirs, "rb")), use_mmap=use_mmap)
        assert sorted(mcs.list()) == sorted(FILES)
        for name, data in FILES.items():
            assert mcs.file_exists(name)
            f = mcs.open_file(name)
            assert f.read(len(data)) == data
        assert not mcs.file_exists("nope.bin")
        mcs.close()


def test_compound_writer_cross_read(tmp_path):
    load_whoosh_oracle()
    from whoosh.filedb.compound import CompoundStorage as RefCS
    from whoosh.filedb.structfile import StructFile as RefSF

    from whoosh_ray.filedb.compound import CompoundWriter
    from whoosh_ray.filedb.filestore import FileStorage as MyFS
    from whoosh_ray.filedb.structfile import StructFile as MySF

    tempst = MyFS(str(tmp_path / "tmpst")).create()
    cw = CompoundWriter(tempst, buffersize=16)  # tiny: force spills
    fa = cw.create_file("x.dat")
    fb = cw.create_file("y.dat")
    # interleave writes so both buffered and spilled blocks occur
    for i in range(10):
        fa.write(b"x%d" % i * 3)
        fb.write(b"Y" * (i + 1))
    out = str(tmp_path / "w.cmp")
    cw.save_as_compound(MySF(open(out, "wb")))

    rcs = RefCS(RefSF(open(out, "rb")))
    xa = rcs.open_file("x.dat").read(10 ** 6)
    ya = rcs.open_file("y.dat").read(10 ** 6)
    assert xa == b"".join(b"x%d" % i * 3 for i in range(10))
    assert ya == b"".join(b"Y" * (i + 1) for i in range(10))
    rcs.close()


def test_save_as_files(tmp_path):
    from whoosh_ray.filedb.compound import CompoundWriter
    from whoosh_ray.filedb.filestore import FileStorage as MyFS

    tempst = MyFS(str(tmp_path / "tmpst")).create()
    cw = CompoundWriter(tempst)
    cw.create_file("one").write(b"11111")
    cw.create_file("two").write(b"2")
    outst = MyFS(str(tmp_path / "out")).create()
    cw.save_as_files(outst, lambda n: n + ".out")
    assert open(str(tmp_path / "out" / "one.out"), "rb").read() == b"11111"
    assert open(str(tmp_path / "out" / "two.out"), "rb").read() == b"2"
