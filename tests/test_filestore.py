"""Storage-object compat surface (reference filedb/filestore.py):
FileStorage / RamStorage / OverlayStorage / copy_storage / copy_to_ram
drive the real engine end-to-end."""

import os

import pytest

from whoosh_ray.filedb.filestore import (FileStorage, OverlayStorage,
                                         RamStorage, ReadOnlyError,
                                         copy_storage, copy_to_ram)
from whoosh_ray.search.query import Term
from whoosh_ray.state.schema import FieldSpec, IndexSchema


def _schema() -> IndexSchema:
    return IndexSchema(
        fields=(FieldSpec.text("text", stored=True, positions=True),
                FieldSpec.id("role", stored=True),
                FieldSpec.id("conv_id", stored=True)),
        stored_columns=("turn_idx",),
    )


def _populate(ix, texts):
    w = ix.writer()
    for i, t in enumerate(texts):
        w.add_document(text=t, role="user", conv_id=f"c{i:03d}", turn_idx=0)
    w.commit()


def test_filestorage_index_roundtrip(tmp_path):
    st = FileStorage(str(tmp_path / "ixd")).create()
    assert not st.index_exists()
    ix = st.create_index(_schema(), seg_size=512)
    assert st.index_exists() and not st.index_exists("OTHER")
    _populate(ix, ["quick brown fox", "lazy dogs", "quick wins"])

    ix2 = st.open_index()
    assert ix2.doc_count_all() == 3
    with ix2.searcher() as s:
        assert len(s.search(Term("text", "quick"), limit=None)) == 2

    # context-manager + iteration protocols
    with FileStorage(str(tmp_path / "ixd")) as st2:
        assert any(name == "MAIN" for name in st2)

    st.destroy()
    assert not os.path.exists(str(tmp_path / "ixd"))


def test_filestorage_file_ops(tmp_path):
    st = FileStorage(str(tmp_path / "f")).create()
    with st.create_file("a.bin") as f:
        f.write(b"hello")
    assert st.file_exists("a.bin") and st.file_length("a.bin") == 5
    assert st.file_modified("a.bin") > 0
    with st.open_file("a.bin") as f:
        assert f.read() == b"hello"
    st.rename_file("a.bin", "b.bin")
    assert st.list() == ["b.bin"]
    with pytest.raises(NameError):
        st.open_file("a.bin")
    with pytest.raises(NameError):
        st.rename_file("missing", "x")
    st.create_file("c.bin").close()
    with pytest.raises(NameError):
        st.rename_file("c.bin", "b.bin", safe=True)  # target exists
    assert st.total_size() == 5
    st.delete_file("c.bin")
    with pytest.raises(NameError):
        st.delete_file("c.bin")
    st.clean()
    assert st.list() == []

    ro = FileStorage(str(tmp_path / "f"), readonly=True)
    for call in (lambda: ro.create_file("x"),
                 lambda: ro.delete_file("x"),
                 lambda: ro.create_index(_schema()),
                 ro.destroy, ro.clean):
        with pytest.raises(ReadOnlyError):
            call()


def test_storage_lock_protocol(tmp_path):
    st = FileStorage(str(tmp_path / "lk")).create()
    lk = st.lock("WRITELOCK")
    assert lk.acquire() is True and lk.locked
    # a second lock object on the same file cannot acquire
    lk2 = st.lock("WRITELOCK")
    assert lk2.acquire() is False and not lk2.locked
    lk.release()
    assert lk2.acquire() is True
    lk2.release()
    with pytest.raises(Exception):
        lk2.release()


def test_ramstorage_is_path_addressable():
    st = RamStorage()
    try:
        ix = st.create_index(_schema(), seg_size=512)
        _populate(ix, ["alpha beta", "beta gamma"])
        with st.open_index().searcher() as s:
            assert len(s.search(Term("text", "beta"), limit=None)) == 2
        assert st.supports_mmap is False
        with st.create_file("x.bin") as f:
            f.write(b"ab")
        assert st.file_modified("x.bin") == -1  # reference parity
        with pytest.raises(NameError):
            st.file_modified("nope.bin")
    finally:
        st.destroy()
    assert not os.path.exists(st.folder)


def test_copy_to_ram_and_copy_storage(tmp_path):
    src = FileStorage(str(tmp_path / "src")).create()
    ix = src.create_index(_schema(), seg_size=512)
    _populate(ix, ["deploy the cluster", "render frames", "deploy again"])

    ram = copy_to_ram(src)
    try:
        with ram.open_index().searcher() as s:
            assert len(s.search(Term("text", "deploy"), limit=None)) == 2
    finally:
        ram.destroy()

    dst = FileStorage(str(tmp_path / "dst")).create()
    copy_storage(src, dst)
    with dst.open_index().searcher() as s:
        assert len(s.search(Term("text", "deploy"), limit=None)) == 2


def test_overlay_storage_routes_writes_to_b(tmp_path):
    base_st = FileStorage(str(tmp_path / "base")).create()
    over_st = FileStorage(str(tmp_path / "over")).create()
    ix = base_st.create_index(_schema(), seg_size=512)
    _populate(ix, ["deploy the cluster", "render frames"])
    base_manifest = open(
        os.path.join(base_st.folder, "MAIN", "manifest.json"), "rb").read()

    union = OverlayStorage(base_st, over_st)
    oix = union.open_index()
    w = oix.writer()
    w.add_document(text="deploy overlay doc", role="user",
                   conv_id="c999", turn_idx=0)
    w.commit()
    with oix.refresh().searcher() as s:
        assert len(s.search(Term("text", "deploy"), limit=None)) == 2

    # the base storage is untouched, byte for byte
    assert open(os.path.join(base_st.folder, "MAIN", "manifest.json"),
                "rb").read() == base_manifest

    # file-level union: reads prefer a, writes land in b
    with base_st.create_file("shared.txt") as f:
        f.write(b"from-a")
    with union.create_file("written.txt") as f:
        f.write(b"via-union")
    assert union.open_file("shared.txt").read() == b"from-a"
    assert over_st.file_exists("written.txt")
    assert not base_st.file_exists("written.txt")
    assert "shared.txt" in union.list() and "written.txt" in union.list()
    assert union.file_length("shared.txt") == 6
    with pytest.raises(NotImplementedError):
        union.rename_file("shared.txt", "x")
