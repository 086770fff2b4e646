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
