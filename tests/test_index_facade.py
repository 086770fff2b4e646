"""whoosh_ray.index facade: the reference's create_in/open_dir/Index
workflow (reference index.py:85-470) end-to-end over this engine."""

import pytest

from whoosh_ray import index as wix
from whoosh_ray.search.query import Term
from whoosh_ray.state.schema import FieldSpec, IndexSchema


def _schema() -> IndexSchema:
    return IndexSchema(
        fields=(FieldSpec.text("text", stored=True, positions=True),
                FieldSpec.id("role", stored=True),
                FieldSpec.id("conv_id", stored=True, unique=False)),
        stored_columns=("turn_idx",),
    )


def test_create_open_write_search(tmp_path):
    d = str(tmp_path)
    assert not wix.exists_in(d)
    with pytest.raises(wix.EmptyIndexError):
        wix.open_dir(d)

    ix = wix.create_in(d, _schema(), seg_size=512)
    assert wix.exists_in(d)
    assert ix.is_empty() and ix.doc_count_all() == 0
    # empty index is searchable immediately (sealed empty manifest)
    assert ix.searcher().search(Term("text", "x"), limit=5).docids.size == 0
    release, fmt = wix.version_in(d)
    assert fmt == 1

    w = ix.writer()
    for i, text in enumerate(["the quick brown fox", "lazy dogs sleep",
                              "quick thinking wins", "brown paper bags"]):
        w.add_document(text=text, role="user" if i % 2 == 0 else "assistant",
                       conv_id=f"c{i:03d}", turn_idx=0)
    w.commit()

    ix2 = wix.open_dir(d)
    assert ix2.doc_count_all() == 4 and not ix2.is_empty()
    with ix2.searcher() as s:  # context-manager protocol
        hits = s.search(Term("text", "quick"), limit=10)
        texts = {h["text"] for h in hits.hits()}
        assert texts == {"the quick brown fox", "quick thinking wins"}
    # analyzed token count: "the" is a StandardAnalyzer stopword
    assert ix2.field_length("text") == 12
    assert set(ix2.field_names()) == {"text", "role", "conv_id"}

    # stale handle refreshes to see the commit
    assert ix.refresh().doc_count_all() == 4


def test_delete_and_optimize(tmp_path):
    d = str(tmp_path)
    ix = wix.create_in(d, _schema(), seg_size=2)
    w = ix.writer()
    for i in range(6):
        w.add_document(text=f"alpha beta doc{i}", role="user",
                       conv_id=f"c{i:03d}", turn_idx=0)
    w.commit()
    ix.refresh()
    assert ix.doc_count_all() == 6
    n = ix.delete_by_term("text", "doc3")
    assert n == 1
    assert ix.doc_count() == 5          # live docs
    assert ix.doc_count_all() == 6      # stats until merge — parity
    ix.optimize()
    assert len(ix._manifest.segments) == 1
    assert ix.doc_count_all() == 5      # tombstones expunged by merge
    hits = ix.searcher().search(Term("text", "alpha"), limit=None)
    assert hits.docids.size == 5


def test_named_indexes_and_clear(tmp_path):
    d = str(tmp_path)
    a = wix.create_in(d, _schema(), indexname="A", seg_size=512)
    wix.create_in(d, _schema(), indexname="B", seg_size=512)
    assert wix.exists_in(d, "A") and wix.exists_in(d, "B")
    assert not wix.exists_in(d, "C")
    w = a.writer()
    w.add_document(text="hello", role="user", conv_id="c0", turn_idx=0)
    w.commit()
    assert wix.open_dir(d, "A").doc_count_all() == 1
    assert wix.open_dir(d, "B").doc_count_all() == 0
    # create_in CLEARS an existing index (reference parity)
    wix.create_in(d, _schema(), indexname="A", seg_size=512)
    assert wix.open_dir(d, "A").doc_count_all() == 0


def test_schema_evolution(tmp_path):
    """Index.add_field / remove_field (reference index.py:228-249):
    old segments have no postings and a null stored column for the new
    field; new commits index it."""
    d = str(tmp_path)
    ix = wix.create_in(d, _schema(), seg_size=4)
    w = ix.writer()
    for i in range(5):
        w.add_document(text=f"alpha doc{i}", role="user",
                       conv_id=f"c{i:03d}", turn_idx=0)
    w.commit()
    ix.refresh()

    with pytest.raises(ValueError):
        ix.add_field("text", FieldSpec.text("x"))
    ix.add_field("topic", FieldSpec.id("x", stored=True))
    assert "topic" in ix.field_names()

    w = ix.writer()
    for i in range(5, 8):
        w.add_document(text=f"alpha doc{i}", role="user",
                       conv_id=f"c{i:03d}", turn_idx=0, topic="ray")
    w.commit()
    ix.refresh()
    s = ix.searcher()
    # new field matches only the new docs
    hits = s.search(Term("topic", "ray"), limit=None)
    assert sorted(h["conv_id"] for h in hits.hits()) == [
        "c005", "c006", "c007"]
    # stored reads across old+new segments promote the missing column
    t = s.stored(s.all_docids(), columns=["conv_id", "topic"])
    rows = {r["conv_id"]: r["topic"] for r in t.to_pylist()}
    assert rows["c001"] is None and rows["c006"] == "ray"
    # old docs still searchable on the old fields
    assert len(s.search(Term("text", "alpha"), limit=None)) == 8

    ix.remove_field("topic")
    assert "topic" not in ix.field_names()
    with pytest.raises(KeyError):
        ix.remove_field("topic")


def test_up_to_date_same_tick_commit(ray_session, tmp_path):
    """A commit landing in the same filesystem-timestamp tick as the
    Searcher must still be seen: up_to_date() compares the manifest's
    monotonic generation counter, not mtime (ADVICE r3)."""
    import os

    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.build import build_index
    from whoosh_ray.search import Searcher
    from whoosh_ray.sources.transcripts import generate_transcripts
    from whoosh_ray.state.manifest import read_manifest, write_manifest
    from whoosh_ray.state.schema import transcripts_schema

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(generate_transcripts(n_convs=20, seed=2),
                   str(src / "p.parquet"))
    ix = str(tmp_path / "ix")
    build_index(str(src), ix, transcripts_schema(), seg_size=64)
    s = Searcher(ix)
    assert s.up_to_date() and s.refresh() is s

    # "commit" again, then pin the file's mtime back to the searcher's
    # snapshot — mtime alone would (wrongly) report up-to-date
    mpath = os.path.join(ix, "manifest.json")
    old_mtime = os.path.getmtime(mpath)
    write_manifest(ix, read_manifest(ix))
    os.utime(mpath, (old_mtime, old_mtime))
    assert not s.up_to_date()
    assert s.refresh() is not s

    # generation counter is monotonic across commits
    from whoosh_ray.index import open_dir
    g1 = open_dir(ix).latest_generation()
    write_manifest(ix, read_manifest(ix))
    assert open_dir(ix).latest_generation() == g1 + 1


def test_index_module_conveniences(tmp_path):
    """exists/version aliases, exception hierarchy, FileIndex,
    ensure_schema, reader storage introspection, add_sortable."""
    import whoosh_ray.index as I
    from whoosh_ray import fields as wf
    from whoosh_ray.search.facets import add_sortable

    assert I.exists is I.exists_in and I.version is I.version_in
    assert issubclass(I.IndexVersionError, I.IndexError_)
    assert issubclass(I.OutOfDateError, I.IndexError_)
    e = I.IndexVersionError("old", -100, release=(1, 2, 3))
    assert e.version == -100 and e.release == (1, 2, 3)
    assert I.FileIndex is I.Index
    assert not I.exists(str(tmp_path))

    class S(wf.SchemaClass):
        text = wf.TEXT(stored=True)
        role = wf.ID
        note = wf.STORED()

    ix = I.create_in(str(tmp_path), S)  # SchemaClass accepted directly
    assert I.exists(str(tmp_path))
    rel, fmt = I.version(str(tmp_path))
    assert isinstance(fmt, int)
    w = ix.writer()
    w.add_document(conv_id="c1", turn_idx=0, text="deploy the cluster",
                   role="user", note="kept")
    w.commit()
    s = ix.searcher()
    r = s.search(__import__("whoosh_ray.search", fromlist=["Term"])
                 .Term("text", "deploy"), limit=5)
    assert len(r) == 1 and r[0]["note"] == "kept"
    # reader introspection: composite reader -> None accessors,
    # segments() lists the per-segment readers
    rd = s.reader()
    assert rd.codec() is None and rd.segment() is None
    assert rd.storage() is None and rd.supports_caches() is False
    assert len(rd.segments()) == len(s.segments) >= 1
    # add_sortable: stored field/column no-op; unstored raises
    w2 = ix.writer()
    add_sortable(w2, "text")
    add_sortable(w2, "note")
    with pytest.raises(KeyError):
        add_sortable(w2, "nope")
    w2.cancel()


def test_quickstart_idioms(tmp_path):
    """The reference quickstart, verbatim modulo the package name:
    writer context manager (commit on clean exit, cancel on exception),
    schemas WITHOUT identity columns (arrival-order docids), Index
    handles seeing a writer's commit without refresh(), native
    NUMERIC/DATETIME stored round-trips, and writers accepting the
    Index object itself."""
    import datetime as dt

    from whoosh_ray import index as wix
    from whoosh_ray.fields import DATETIME, ID, NUMERIC, TEXT, Schema
    from whoosh_ray.qparser import QueryParser
    from whoosh_ray.query import NumericRange
    from whoosh_ray.writing import AsyncWriter

    schema = Schema(title=TEXT(stored=True),
                    path=ID(stored=True, unique=True),
                    content=TEXT(stored=True), num=NUMERIC(stored=True),
                    ts=DATETIME(stored=True))
    ix = wix.create_in(str(tmp_path), schema)
    with ix.writer() as w:
        w.add_document(title="Alpha doc", path="/a",
                       content="alpha words here", num=1,
                       ts=dt.datetime(2024, 5, 1, 12, 0))
        w.add_document(title="Beta doc", path="/b",
                       content="beta words here", num=20,
                       ts=dt.datetime(2024, 6, 1, 12, 0))
    # the handle reflects the commit without an explicit refresh()
    assert ix.doc_count_all() == 2 and ix.up_to_date()

    with ix.searcher() as s:
        d = s.document(path="/a")
        assert d["num"] == 1                      # native int, not '1'
        assert d["ts"] == dt.datetime(2024, 5, 1, 12, 0)
        q = QueryParser("content", ix.schema).parse("words")
        assert len(s.search(q, limit=5)) == 2
        assert [h["path"] for h in s.search(NumericRange("num", 5, 50),
                                            limit=5)] == ["/b"]

    # cancel on exception: the doomed doc never lands
    try:
        with ix.writer() as w:
            w.add_document(title="Doomed", path="/x", content="nope",
                           num=9, ts=dt.datetime(2024, 1, 1))
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert ix.doc_count_all() == 2

    # writers accept the Index handle like the reference constructors
    aw = AsyncWriter(ix)
    aw.add_document(title="Gamma", path="/c", content="gamma words",
                    num=3, ts=dt.datetime(2024, 7, 1))
    aw.commit()
    assert ix.doc_count_all() == 3
