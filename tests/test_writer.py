"""Writer facades: IndexWriter op-log, AsyncWriter no-op threading shim,
BufferedWriter RAM-segment overlay (reference writing.py:239-489,
:954-1053, :1102-1280 semantics)."""

import os

import numpy as np
import pytest

from whoosh_ray.pipelines.build import build_index
from whoosh_ray.pipelines.writer import AsyncWriter, BufferedWriter, IndexWriter
from whoosh_ray.search import Searcher, Term
from whoosh_ray.sources.transcripts import write_transcripts
from whoosh_ray.state.schema import FieldSpec, IndexSchema


def unique_schema():
    return IndexSchema(
        fields=(
            FieldSpec.text("text", stored=True, positions=True),
            FieldSpec.id("role", stored=True),
            FieldSpec.id("tool", stored=True),
            FieldSpec.id("conv_id", stored=True, unique=True),
        ),
        stored_columns=("turn_idx", "ts"),
    )


@pytest.fixture()
def small_index(tmp_path):
    src = write_transcripts(str(tmp_path / "src"), n_convs=40)
    build_index(src, str(tmp_path / "ix"), unique_schema(), seg_size=128)
    return str(tmp_path / "ix")


def hits(s, field, text, limit=None):
    return [int(d) for d in s.search(Term(field, text), limit=limit).docids]


def test_indexwriter_add_and_commit(small_index):
    w = IndexWriter(small_index)
    before = Searcher(small_index).doc_count_all
    w.add_document(conv_id="convzzz01", turn_idx=0, role="user",
                   text="a freshly buffered zebra document")
    w.add_document(conv_id="convzzz01", turn_idx=1, role="assistant",
                   text="zebra zebra reply")
    # pending adds are NOT searchable pre-commit (reference parity)
    assert hits(w.searcher(), "text", "zebra") == []
    w.commit()
    s = Searcher(small_index)
    assert s.doc_count_all == before + 2
    got = hits(s, "text", "zebra")
    assert len(got) == 2
    # content-derived docids continue after the old span
    assert min(got) >= before


def test_indexwriter_delete_and_cancel(small_index):
    s0 = Searcher(small_index)
    doomed = hits(s0, "text", "deploy")
    assert doomed
    w = IndexWriter(small_index)
    n = w.delete_by_term("text", "deploy")
    assert n == len(doomed)
    # visible through the writer's searcher, not through a fresh one
    assert hits(w.searcher(), "text", "deploy") == []
    assert hits(Searcher(small_index), "text", "deploy") == doomed
    w.cancel()
    w.commit()
    assert hits(Searcher(small_index), "text", "deploy") == doomed
    # now for real
    w2 = IndexWriter(small_index)
    w2.delete_by_term("text", "deploy")
    w2.commit()
    assert hits(Searcher(small_index), "text", "deploy") == []
    # stats unchanged until merge (tombstone semantics)
    assert Searcher(small_index).doc_count_all == s0.doc_count_all


def test_indexwriter_update_quirk(small_index):
    """update_document only replaces COMMITTED docs — two updates with
    the same unique key in one writer add TWO docs
    (reference writing.py:464-473)."""
    w = IndexWriter(small_index)
    w.update_document(conv_id="convupd01", turn_idx=0, role="user",
                      text="first upsertmarker version")
    w.update_document(conv_id="convupd01", turn_idx=0, role="user",
                      text="second upsertmarker version")
    w.commit()
    assert len(hits(Searcher(small_index), "text", "upsertmarker")) == 2
    # a second writer DOES replace them (they're committed now)
    w2 = IndexWriter(small_index)
    w2.update_document(conv_id="convupd01", turn_idx=0, role="user",
                       text="third upsertmarker version")
    w2.commit()
    s = Searcher(small_index)
    live = hits(s, "text", "upsertmarker")
    assert len(live) == 1
    txt = s.stored(np.array(live), columns=["text"])["text"][0].as_py()
    assert "third" in txt


def test_asyncwriter_is_droppable_shim(small_index):
    w = AsyncWriter(small_index)
    w.add_document(conv_id="convasync1", turn_idx=0, role="user",
                   text="asynchronously added needle")
    w.start()
    w.commit()
    w.join()
    assert len(hits(Searcher(small_index), "text", "needle")) == 1


def test_bufferedwriter_overlay_search(small_index):
    with BufferedWriter(small_index, limit=100) as w:
        before = Searcher(small_index).doc_count_all
        w.add_document(conv_id="convbuf001", turn_idx=0, role="user",
                       text="buffered xylophone question")
        w.add_document(conv_id="convbuf001", turn_idx=1, role="assistant",
                       text="buffered xylophone answer")
        s = w.searcher()
        # searchable BEFORE commit; stats include the overlay
        assert len(hits(s, "text", "xylophone")) == 2
        assert s.doc_count_all == before + 2
        # idf over the overlay counts buffered docs
        assert s.doc_frequency("text", "xylophone") == 2
        # a plain searcher doesn't see them (other-process parity)
        assert hits(Searcher(small_index), "text", "xylophone") == []
        overlay_ids = sorted(hits(s, "text", "xylophone"))
    # close() committed; same docids on disk now (content-derived)
    assert sorted(hits(Searcher(small_index), "text", "xylophone")) \
        == overlay_ids


def test_bufferedwriter_limit_autocommit(small_index):
    w = BufferedWriter(small_index, limit=3)
    for i in range(3):
        w.add_document(conv_id="convauto01", turn_idx=i, role="user",
                       text=f"autocommit quokka {i}")
    # hitting limit committed synchronously
    assert len(hits(Searcher(small_index), "text", "quokka")) == 3
    w.close()


def test_bufferedwriter_update_replaces_buffered(small_index):
    """The buffered writer's advertised difference: update_document
    replaces still-buffered docs (writing.py:1112-1115)."""
    with BufferedWriter(small_index, limit=100) as w:
        w.update_document(conv_id="convbupd01", turn_idx=0, role="user",
                          text="first wombat version")
        w.update_document(conv_id="convbupd01", turn_idx=0, role="user",
                          text="second wombat version")
        assert len(hits(w.searcher(), "text", "wombat")) == 1
    s = Searcher(small_index)
    live = hits(s, "text", "wombat")
    assert len(live) == 1
    txt = s.stored(np.array(live), columns=["text"])["text"][0].as_py()
    assert "second" in txt


def test_bufferedwriter_deletes_span_overlay(small_index):
    with BufferedWriter(small_index, limit=100) as w:
        w.add_document(conv_id="convbdel01", turn_idx=0, role="user",
                       text="ephemeral pangolin doc")
        committed = hits(w.searcher(), "text", "deploy")
        assert committed
        # delete a committed doc and the buffered doc through the overlay
        n = w.delete_by_query(Term("text", "pangolin"))
        assert n == 1
        w.delete_document(committed[0])
        s = w.searcher()
        assert hits(s, "text", "pangolin") == []
        assert committed[0] not in hits(s, "text", "deploy")
    s = Searcher(small_index)
    assert hits(s, "text", "pangolin") == []
    assert committed[0] not in hits(s, "text", "deploy")


def test_bufferedwriter_scores_match_committed(small_index):
    """BM25 over the overlay is identical to BM25 after commit: the RAM
    segment is a real segment and overlay stats equal sealed stats."""
    with BufferedWriter(small_index, limit=100) as w:
        w.add_document(conv_id="convsco001", turn_idx=0, role="user",
                       text="deploy the deploy ferret deploy")
        pre = [(int(d), float(s))
               for d, s in w.searcher().search(Term("text", "deploy"),
                                               limit=20).pairs()]
    post = [(int(d), float(s))
            for d, s in Searcher(small_index).search(Term("text", "deploy"),
                                                     limit=20).pairs()]
    assert pre == post


def test_writer_group_contiguity(small_index):
    """with writer.group(): rows must land on contiguous docids —
    valid groups commit; an interleaved group raises BEFORE writing
    (reference writing.py:260-297 group semantics, validated against
    this engine's key-derived docid assignment)."""
    w = IndexWriter(small_index)
    with w.group():
        w.add_document(conv_id="convzzz50", turn_idx=0, role="user",
                       text="parent gnu document")
        w.add_document(conv_id="convzzz50", turn_idx=1, role="assistant",
                       text="child gnu one")
        w.add_document(conv_id="convzzz50", turn_idx=2, role="assistant",
                       text="child gnu two")
    w.commit()
    s = Searcher(small_index)
    ids = hits(s, "text", "gnu")
    assert len(ids) == 3 and ids == sorted(ids)
    assert ids[2] - ids[0] == 2  # contiguous run

    w2 = IndexWriter(small_index)
    with w2.group():
        w2.add_document(conv_id="convzzz60", turn_idx=0, role="user",
                        text="parent emu")
        w2.add_document(conv_id="convzzz70", turn_idx=0, role="user",
                        text="stray emu")
    w2.add_document(conv_id="convzzz65", turn_idx=0, role="user",
                    text="interloper emu")   # sorts BETWEEN the group
    n_before = Searcher(small_index).doc_count_all
    with pytest.raises(ValueError, match="contiguous"):
        w2.commit()
    assert Searcher(small_index).doc_count_all == n_before


def test_writer_schema_evolution_and_reader(small_index):
    w = IndexWriter(small_index)
    w.add_field("topic", FieldSpec.id("topic", stored=True))
    w.add_document(conv_id="convzzz80", turn_idx=0, role="user",
                   text="walrus text", topic="animals")
    w.commit()
    s = Searcher(small_index)
    assert len(hits(s, "topic", "animals")) == 1
    r = w.reader()
    assert ("topic", "animals") in r
    w2 = IndexWriter(small_index)
    w2.remove_field("topic")
    w2.commit()
    assert "topic" not in [f.name for f in
                           Searcher(small_index).schema.fields]


def test_writer_add_reader(small_index, tmp_path):
    other_src = write_transcripts(str(tmp_path / "osrc"), n_convs=3,
                                  seed=99)
    build_index(other_src, str(tmp_path / "oix"), unique_schema(),
                seg_size=128)
    other = Searcher(str(tmp_path / "oix"))
    w = IndexWriter(small_index)
    n = w.add_reader(other.reader())
    assert n == other.doc_count()
    w.commit()
    s = Searcher(small_index)
    # every ingested doc is findable by its conv_id term
    convs = {d["conv_id"] for d in other.reader().all_stored_fields()}
    for c in convs:
        assert len(hits(s, "conv_id", c)) >= 1


def test_commit_merge_policies(tmp_path):
    """commit() merge modes (reference writing.py:901-932 + policies
    :65-125): default merges small segments, merge=False leaves them,
    optimize=True ends at one segment, mergetype=CLEAR drops all
    pre-existing docs."""
    from whoosh_ray.pipelines.writer import CLEAR, IndexWriter

    src = write_transcripts(str(tmp_path / "src"), n_convs=40)
    build_index(src, str(tmp_path / "ix"), unique_schema(), seg_size=64)
    ix = str(tmp_path / "ix")
    n0 = Searcher(ix).doc_count_all
    nseg0 = len(Searcher(ix).segments)
    assert nseg0 >= 4

    # merge=False: segments untouched, docs appended
    w = IndexWriter(ix)
    w.add_document(conv_id="convmf01", turn_idx=0, role="user",
                   text="mergefalse marker")
    w.commit(merge=False)
    assert len(Searcher(ix).segments) == nseg0 + 1
    assert Searcher(ix).doc_count_all == n0 + 1

    # default commit(): the fib policy decides; segment count can only
    # shrink or stay, never grow beyond the append
    w = IndexWriter(ix)
    w.add_document(conv_id="convmf02", turn_idx=0, role="user",
                   text="mergedefault marker")
    w.commit()
    assert len(Searcher(ix).segments) <= nseg0 + 2

    # optimize=True: ONE segment, all docs and tombstone semantics kept
    w = IndexWriter(ix)
    w.delete_by_term("text", "mergefalse")
    w.commit(optimize=True)
    s = Searcher(ix)
    assert len(s.segments) == 1
    assert s.doc_count() == n0 + 1  # +2 appends -1 delete (expunged)
    assert hits(s, "text", "mergefalse") == []
    assert len(hits(s, "text", "mergedefault")) == 1

    # CLEAR: only this writer's buffered docs survive
    w = IndexWriter(ix)
    w.add_document(conv_id="convclr01", turn_idx=0, role="user",
                   text="clearmarker only survivor")
    w.commit(mergetype=CLEAR)
    s = Searcher(ix)
    assert s.doc_count_all == 1
    assert len(hits(s, "text", "clearmarker")) == 1
    assert hits(s, "text", "mergedefault") == []


def test_writelock(small_index):
    """WRITELOCK parity (reference index.py:51 + writing.py:506-514):
    a second concurrent writer raises LockError; commit/cancel release;
    lock=False opts out."""
    from whoosh_ray.pipelines.writer import IndexWriter, LockError

    w = IndexWriter(small_index)
    with pytest.raises(LockError):
        IndexWriter(small_index)
    # a no-lock writer can still be constructed (reference _lk=False)
    IndexWriter(small_index, lock=False).cancel()
    w.cancel()  # releases
    w2 = IndexWriter(small_index)
    w2.add_document(conv_id="convlk01", turn_idx=0, role="user",
                    text="lockmarker")
    w2.commit(merge=False)  # releases again
    w3 = IndexWriter(small_index)
    w3.cancel()
    assert len(hits(Searcher(small_index), "text", "lockmarker")) == 1


def test_asyncwriter_tolerates_held_lock(small_index):
    """AsyncWriter never raises LockError at construction (reference
    writing.py:954-976: buffer and retry); its commit waits for the
    lock to free and then replays the op log."""
    import threading
    import time as _time

    from whoosh_ray.pipelines.writer import AsyncWriter, IndexWriter

    holder = IndexWriter(small_index)     # holds WRITELOCK
    aw = AsyncWriter(small_index, delay=0.05)  # must NOT raise
    aw.add_document(conv_id="convaw01", turn_idx=0, role="user",
                    text="asyncmarker buffered while locked")

    done = threading.Event()

    def _commit():
        aw.commit(merge=False)
        done.set()

    t = threading.Thread(target=_commit, daemon=True)
    t.start()
    _time.sleep(0.3)
    assert not done.is_set()              # blocked on the held lock
    holder.cancel()                       # releases
    t.join(timeout=60)
    assert done.is_set()
    assert len(hits(Searcher(small_index), "text", "asyncmarker")) == 1


def test_doc_and_field_boosts_match_reference(tmp_path):
    """add_document(_boost=, _<field>_boost=): index-time posting-weight
    scaling (reference writing.py:42-77,112-120; a set field boost
    REPLACES the doc boost for that field).  Scores bit-compare vs the
    reference on the same corpus."""
    import numpy as np

    from tests.conftest import load_whoosh_oracle
    from whoosh_ray import index as wrindex
    from whoosh_ray.search import Or, Term
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    docs = [
        dict(text="alpha beta beta", title="alpha intro"),
        dict(text="alpha gamma", title="beta notes", _boost=2.0),
        dict(text="beta beta alpha", title="alpha beta",
             _boost=2.0, _title_boost=3.0),
        dict(text="gamma alpha", title="gamma", _text_boost=0.5),
    ]
    schema = IndexSchema(fields=(FieldSpec.text("text", stored=True),
                                 FieldSpec.text("title", stored=True)))
    ix = wrindex.create_in(str(tmp_path), schema)
    w = ix.writer()
    for i, d in enumerate(docs):
        w.add_document(conv_id=f"c{i:03d}", turn_idx=0, **d)
    w.commit(merge=False)
    s = ix.searcher()

    load_whoosh_oracle()
    from whoosh import fields as rf
    from whoosh.analysis import StandardAnalyzer
    from whoosh.filedb.filestore import RamStorage
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WT

    rix = RamStorage().create_index(rf.Schema(
        text=rf.TEXT(analyzer=StandardAnalyzer(), stored=True),
        title=rf.TEXT(analyzer=StandardAnalyzer(), stored=True)))
    rw = rix.writer()
    for d in docs:
        rw.add_document(**d)
    rw.commit()

    with rix.searcher() as rs:
        for myq, refq in [
            (Term("text", "alpha"), WT("text", "alpha")),
            (Term("text", "beta"), WT("text", "beta")),
            (Term("title", "alpha"), WT("title", "alpha")),
            (Or([Term("text", "alpha"), Term("title", "beta")]),
             WOr([WT("text", "alpha"), WT("title", "beta")])),
        ]:
            mine = [(int(d), float(sc))
                    for d, sc in s.search(myq, limit=None).pairs()]
            ref = [(int(h.docnum), float(h.score))
                   for h in rs.search(refq, limit=None)]
            assert [d for d, _ in mine] == [d for d, _ in ref], myq
            np.testing.assert_allclose([x for _, x in mine],
                                       [x for _, x in ref], rtol=1e-12,
                                       err_msg=repr(myq))
    # boosts never leak into stored fields
    hit = s.search(Term("text", "gamma"), limit=1)[0]
    assert set(hit.keys()) >= {"text", "title"}
    assert not any(k.startswith("__boost") for k in hit.keys())


def test_multivalue_list_raises_with_guidance(tmp_path):
    """Reference list-valued fields bypass the analyzer (entoken) and
    store the raw list — inexpressible in one Arrow column; we raise
    with guidance instead of silently diverging."""
    from whoosh_ray import index as wrindex
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    schema = IndexSchema(fields=(FieldSpec.text("text", stored=True),),
                         stored_columns=("meta",))
    ix = wrindex.create_in(str(tmp_path), schema)
    w = ix.writer()
    with pytest.raises(TypeError, match="pre-analyzed token lists"):
        w.add_document(conv_id="c0", turn_idx=0, text=["a b", "c d"])
    w.cancel()


def test_remove_field_and_optimize_away(tmp_path):
    """Reference test_removefield/test_optimize_away semantics: after
    remove_field+commit the field vanishes from the reader and stored
    reads immediately; optimize RECLAIMS its postings and stored
    column from the merged segment."""
    import glob
    import os

    import pyarrow.parquet as pq

    from whoosh_ray import index as wrindex
    from whoosh_ray.search import Term
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    schema = IndexSchema(fields=(FieldSpec.id("id", stored=True),
                                 FieldSpec.text("content", stored=False),
                                 FieldSpec.keyword("city", stored=True)))
    ix = wrindex.create_in(str(tmp_path), schema)
    w = ix.writer()
    for i, (d, c, city) in enumerate([("b", "bravo", "baghdad"),
                                      ("c", "charlie", "cairo"),
                                      ("d", "delta", "dakar")]):
        w.add_document(conv_id=f"x{i}", turn_idx=0, id=d, content=c,
                       city=city)
    w.commit(merge=False)
    s = ix.searcher()
    doc = s.search(Term("id", "c"), limit=1)[0]
    assert doc["id"] == "c" and doc["city"] == "cairo"

    w = ix.writer()
    w.remove_field("content")
    w.remove_field("city")
    w.commit(merge=False)
    ix.refresh()
    s = ix.searcher()
    assert [f.name for f in s.schema.fields] == ["id"]
    rd = s.reader()
    # gone from the reader and stored reads IMMEDIATELY (pre-merge)
    assert ("content", "charlie") not in rd
    hit = s.search(Term("id", "c"), limit=1)[0]
    assert "city" not in hit.keys() and "content" not in hit.keys()
    # ...but still physically present until a merge
    tp = glob.glob(os.path.join(str(tmp_path), "MAIN", "segments", "*",
                                "terms.parquet"))
    on_disk = set()
    for p in tp:
        on_disk.update(pq.read_table(p, columns=["field"])
                       ["field"].to_pylist())
    assert "content" in on_disk

    w = ix.writer()
    w.commit(optimize=True)
    ix.refresh()
    s = ix.searcher()
    tp = glob.glob(os.path.join(str(tmp_path), "MAIN", "segments", "*",
                                "terms.parquet"))
    on_disk = set()
    doc_cols = set()
    for p in tp:
        on_disk.update(pq.read_table(p, columns=["field"])
                       ["field"].to_pylist())
        doc_cols.update(pq.read_schema(
            os.path.join(os.path.dirname(p), "docs.parquet")).names)
    assert on_disk == {"id"}
    assert "city" not in doc_cols and "content" not in doc_cols
    hit = s.search(Term("id", "c"), limit=1)[0]
    assert dict(hit.items())["id"] == "c"


def test_postingpool_external_sort_parity(tmp_path):
    """writing.PostingPool (reference writing.py:130-180): byte-budgeted
    spill of posting tuples; items() streams them back fully sorted.
    Same inputs + limit against the reference pool must produce the
    same sorted stream, the same fieldnames set, and the same number of
    spilled runs (identical per-item size model)."""
    import random

    from tests.conftest import load_whoosh_oracle

    from whoosh_ray.writing import PostingPool

    load_whoosh_oracle()
    from whoosh.filedb.filestore import FileStorage as RefStorage
    from whoosh.writing import PostingPool as RefPool

    rng = random.Random(7)
    items = [(rng.choice(["text", "role", "tool"]),
              ("w%04d" % rng.randrange(500)).encode(),
              rng.randrange(10000),
              float(rng.randrange(1, 5)),
              None if rng.random() < 0.5 else b"\x01\x02")
             for _ in range(5000)]

    ours = PostingPool(str(tmp_path / "ours"), segment=None, limitmb=1)
    # force several spills: the size model says ~100 bytes/item, so
    # shrink the limit below the total
    ours.limit = 64 * 1024

    refdir = tmp_path / "ref"
    refdir.mkdir()
    ref = RefPool(RefStorage(str(refdir)), segment=None, limitmb=1)
    ref.limit = 64 * 1024

    for it in items:
        ours.add(it)
        ref.add(it)
    assert ours.fieldnames == ref.fieldnames
    assert len(ours.runs) == len(ref.runs) and len(ours.runs) >= 2

    got = list(ours.iter_postings())
    want = list(ref.iter_postings())
    assert got == want == sorted(items)


def test_clean_files_prunes_unreferenced_segments(small_index):
    """index.clean_files (reference index.py:374-403 role): sealed
    segment dirs the manifest doesn't reference are reaped; in-flight
    temp dirs (no meta.json) are left alone; live segments survive."""
    import json
    import shutil

    from whoosh_ray.index import clean_files, open_dir

    segroot = os.path.join(small_index, "segments")
    live = sorted(os.listdir(segroot))
    assert live

    # a sealed stranger: copy of a live segment under an unused id
    stranger = os.path.join(segroot, "seg=99997")
    shutil.copytree(os.path.join(segroot, live[0]), stranger)
    # an in-flight builder temp: has files but no meta.json
    inflight = os.path.join(segroot, "seg=99998")
    shutil.copytree(os.path.join(segroot, live[0]), inflight)
    os.remove(os.path.join(inflight, "meta.json"))

    before = Searcher(small_index).search(Term("text", "deploy"),
                                          limit=None).docids

    removed = clean_files(small_index)
    assert removed == ["seg=99997"]
    names = set(os.listdir(segroot))
    assert "seg=99997" not in names and "seg=99998" in names
    assert set(live) <= names

    after = Searcher(small_index).search(Term("text", "deploy"),
                                         limit=None).docids
    assert list(before) == list(after)
