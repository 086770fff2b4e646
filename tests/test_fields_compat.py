"""whoosh_ray.fields: reference-style Schema construction ports to the
engine and scores identically to the reference on the same corpus."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray import fields as wf
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher, Term

DOCS = [
    {"title": "Deploy guide", "body": "deploy the cluster render batch",
     "path": "/a", "count": 3, "tags": "ops,infra", "extra": "x1"},
    {"title": "Render notes", "body": "render render deploy error",
     "path": "/b", "count": 7, "tags": "gfx", "extra": "x2"},
    {"title": "Batch jobs", "body": "batch jobs run deploy nightly",
     "path": "/c", "count": 5, "tags": "ops", "extra": "x3"},
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("fieldscompat")
    t = pa.Table.from_pylist(DOCS)
    t = t.append_column("rowid", pa.array(np.arange(len(DOCS))))
    (d / "src").mkdir()
    pq.write_table(t, str(d / "src" / "p.parquet"))
    schema = wf.Schema(title=wf.TEXT(stored=True),
                       body=wf.TEXT(stored=True),
                       path=wf.ID(stored=True, unique=True),
                       count=wf.NUMERIC(int, 32, stored=True),
                       tags=wf.KEYWORD(stored=True, commas=True,
                                       lowercase=True),
                       extra=wf.STORED())
    build_index(str(d / "src"), str(d / "ix"), schema, docid_col="rowid")
    return Searcher(str(d / "ix"))


@pytest.fixture(scope="module")
def oracle():
    load_whoosh_oracle()
    from whoosh import fields as rf
    from whoosh.analysis import StandardAnalyzer
    from whoosh.filedb.filestore import RamStorage

    schema = rf.Schema(title=rf.TEXT(stored=True,
                                     analyzer=StandardAnalyzer()),
                       body=rf.TEXT(stored=True,
                                    analyzer=StandardAnalyzer()),
                       path=rf.ID(stored=True, unique=True),
                       count=rf.NUMERIC(int, 32, stored=True),
                       tags=rf.KEYWORD(stored=True, commas=True,
                                       lowercase=True),
                       extra=rf.STORED())
    ix = RamStorage().create_index(schema)
    w = ix.writer()
    for doc in DOCS:
        w.add_document(**doc)
    w.commit()
    return ix


def test_schema_builds_and_scores_like_reference(built, oracle):
    from whoosh.query import NumericRange as WNR
    from whoosh.query import Term as WT

    from whoosh_ray.search.query import NumericRange

    with oracle.searcher() as s:
        for myq, refq in [
            (Term("body", "deploy"), WT("body", "deploy")),
            (Term("tags", "ops"), WT("tags", "ops")),
            (Term("title", "render"), WT("title", "render")),
            (NumericRange("count", 4, 8), WNR("count", 4, 8)),
        ]:
            mine = [(int(d), float(sc))
                    for d, sc in built.search(myq, limit=None).pairs()]
            ref = [(int(h.docnum), float(h.score))
                   for h in s.search(refq, limit=None)]
            assert [d for d, _ in mine] == [d for d, _ in ref], myq
            np.testing.assert_allclose([x for _, x in mine],
                                       [x for _, x in ref], rtol=1e-12)
    # STORED passthrough is readable, unindexed
    r = built.search(Term("body", "deploy"), limit=1)
    assert r[0]["extra"] in {"x1", "x2", "x3"}
    assert len(built.search(Term("extra", "x1"), limit=5)) == 0


def test_schema_class_and_bare_ctors(tmp_path):
    class MySchema(wf.SchemaClass):
        path = wf.ID(stored=True)
        content = wf.TEXT

    s = wf.ensure_schema(MySchema)
    assert [f.name for f in s.fields] == ["content", "path"]
    # bare constructor (path = ID) binds with defaults
    s2 = wf.Schema(a=wf.TEXT, b=wf.ID)
    assert {f.name for f in s2.fields} == {"a", "b"}
    with pytest.raises(wf.FieldConfigurationError):
        wf.Schema(_x=wf.TEXT)
    with pytest.raises(TypeError):
        wf.NUMERIC(float)
    with pytest.raises(TypeError):
        wf.NGRAMWORDS(2, at="start")


def test_schema_mapping_protocol_parity():
    """Schema names/items/contains/len/add/remove/copy vs the reference
    Schema on the same declaration (fields.py:1315-1535)."""
    load_whoosh_oracle()
    from whoosh import fields as rf

    ref = rf.Schema(text=rf.TEXT(stored=True), role=rf.ID(stored=True),
                    n=rf.NUMERIC(bits=32))
    mine = wf.Schema(text=wf.TEXT(stored=True), role=wf.ID(stored=True),
                     n=wf.NUMERIC(bits=32))

    assert mine.names() == ref.names()
    assert [n for n, _ in mine.items()] == [n for n, _ in ref.items()]
    assert len(mine) == len(ref)
    assert ("text" in mine) == ("text" in ref) is True
    assert ("bogus" in mine) == ("bogus" in ref) is False
    assert mine.scorable_names() == ref.scorable_names()
    assert mine.has_scorable_fields() == ref.has_scorable_fields()
    assert mine.stored_names() == ref.stored_names()

    # add/remove mutate in place on both
    ref.add("extra", rf.KEYWORD(stored=True))
    mine.add("extra", wf.KEYWORD(stored=True))
    assert mine.names() == ref.names()
    ref.remove("extra")
    mine.remove("extra")
    assert mine.names() == ref.names()
    # duplicate add raises on both
    with pytest.raises(Exception):
        ref.add("text", rf.ID())
    with pytest.raises(Exception):
        mine.add("text", wf.ID())
    # copy() detaches
    cp = mine.copy()
    cp.add("only_in_copy", wf.ID())
    assert "only_in_copy" not in mine

    # dynamic (glob) add resolves through __getitem__ on both
    ref.add("tag_*", rf.KEYWORD(stored=True), glob=True)
    mine.add("tag_*", wf.KEYWORD(stored=True), glob=True)
    assert ("tag_x" in ref) and ("tag_x" in mine)
    assert mine["tag_x"].name == "tag_x"


def test_fieldtype_protocol_parity():
    """FieldSpec's FieldType surface vs the reference: process_text,
    supports, to_bytes, self_parsing, and byte-identical index()
    posting tuples (the formats codecs are shared)."""
    load_whoosh_oracle()
    from whoosh import fields as rf

    ref = rf.Schema(text=rf.TEXT(stored=True, phrase=True),
                    role=rf.ID(stored=True),
                    kw=rf.KEYWORD(lowercase=True),
                    flag=rf.BOOLEAN())
    mine = wf.Schema(text=wf.TEXT(stored=True, phrase=True),
                     role=wf.ID(stored=True),
                     kw=wf.KEYWORD(lowercase=True),
                     flag=wf.BOOLEAN())

    val = "Deploy THE render pipeline, twice-Deployed"
    for fn in ("text", "role", "kw"):
        assert (list(mine[fn].process_text(val, mode="query"))
                == list(ref[fn].process_text(val, mode="query"))), fn
        assert (sorted(mine[fn].index(val))
                == sorted((t.decode() if isinstance(t, bytes) else t,
                           f, w, v) for t, f, w, v in ref[fn].index(val))), fn
        for feature in ("existence", "frequency", "positions",
                        "characters"):
            assert (mine[fn].supports(feature)
                    == ref[fn].supports(feature)), (fn, feature)
        assert mine[fn].to_bytes("Xy") == ref[fn].to_bytes("Xy")
        assert mine[fn].self_parsing() == ref[fn].self_parsing()

    # boolean: self-parsing, 't'/'f' bytes
    assert mine["flag"].self_parsing() and ref["flag"].self_parsing()
    for v in (True, False, "yes", "no", "1", "0"):
        assert mine["flag"].to_bytes(v) == ref["flag"].to_bytes(v), v

    # tokenize yields Token objects with text/pos (the reference reuses
    # ONE mutable Token, so its texts must be consumed eagerly)
    mtexts = [t.text for t in mine["text"].tokenize("deploy the render")]
    rtexts = [t.text for t in ref["text"].tokenize("deploy the render",
                                                   positions=True)]
    assert mtexts == rtexts


def test_id_field_is_case_sensitive_like_reference(tmp_path):
    """ID fields keep case (reference IDAnalyzer() default is
    lowercase=False, analyzers.py:117; fields.py:472): 'Ops' and 'ops'
    are DIFFERENT terms, query case must match the stored case."""
    load_whoosh_oracle()
    from whoosh import fields as rf
    from whoosh.filedb.filestore import RamStorage
    from whoosh.query import Term as RTerm

    docs = [{"body": "deploy one", "team": "Ops", "rowid": 0},
            {"body": "deploy two", "team": "ops", "rowid": 1},
            {"body": "deploy three", "team": "GFX", "rowid": 2}]

    rschema = rf.Schema(body=rf.TEXT(stored=True),
                        team=rf.ID(stored=True))
    rix = RamStorage().create_index(rschema)
    w = rix.writer()
    for d in docs:
        w.add_document(body=d["body"], team=d["team"])
    w.commit()

    t = pa.Table.from_pylist(docs)
    (tmp_path / "src").mkdir()
    pq.write_table(t, str(tmp_path / "src" / "p.parquet"))
    schema = wf.Schema(body=wf.TEXT(stored=True),
                       team=wf.ID(stored=True))
    build_index(str(tmp_path / "src"), str(tmp_path / "ix"), schema,
                docid_col="rowid")
    s = Searcher(str(tmp_path / "ix"))

    with rix.searcher() as rs:
        for probe in ("Ops", "ops", "OPS", "GFX", "gfx"):
            ref = sorted(h.docnum for h in rs.search(RTerm("team", probe),
                                                     limit=None))
            mine = sorted(int(d) for d in
                          s.search(Term("team", probe), limit=None).docids)
            assert mine == ref, probe
        # the lexicon stores the raw-cased terms
        ref_lex = sorted(t.decode() for t in rs.reader().lexicon("team"))
        assert sorted(s.lexicon("team")) == ref_lex == ["GFX", "Ops", "ops"]
