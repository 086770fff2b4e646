"""KEYWORD / BOOLEAN / IDLIST / NGRAM / NGRAMWORDS field types:
rank/score conformance vs the reference engine on the same corpus."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher, Term
from whoosh_ray.search.qparser import QueryParser
from whoosh_ray.state.schema import FieldSpec, IndexSchema

ROWS = [
    # (tags, ctags, done, ids, name)
    ("alpha Beta", "Red, Green", True, "u1 u2,u3", "hello"),
    ("beta gamma", "green,blue", False, "u2;u4", "help"),
    ("Alpha", "Blue", True, "u5", "yellow"),
    ("delta epsilon zeta", "red", False, "u1", "hell"),
    ("beta", "Green , Red", True, "u6 u1", "jello"),
    ("", "", None, "", ""),
]


def _schema() -> IndexSchema:
    return IndexSchema(fields=(
        FieldSpec.keyword("tags", lowercase=True),
        FieldSpec.keyword("ctags", commas=True),
        FieldSpec.boolean("done"),
        FieldSpec.idlist("ids"),
        FieldSpec.ngram("name", minsize=2, maxsize=3),
        FieldSpec.ngramwords("wname", minsize=2, maxsize=3, queryor=True),
        FieldSpec.id("conv_id", stored=True)))


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("ft")
    t = pa.table({
        "conv_id": [f"c{i:03d}" for i in range(len(ROWS))],
        "turn_idx": pa.array([0] * len(ROWS), pa.int32()),
        "tags": [r[0] for r in ROWS],
        "ctags": [r[1] for r in ROWS],
        "done": pa.array([r[2] for r in ROWS], pa.bool_()),
        "ids": [r[3] for r in ROWS],
        "name": [r[4] for r in ROWS],
        "wname": [r[4] for r in ROWS],
    })
    src = d / "src"
    src.mkdir()
    pq.write_table(t, str(src / "p0.parquet"))
    build_index(str(src), str(d / "ix"), _schema(), seg_size=4)
    return Searcher(str(d / "ix"))


@pytest.fixture(scope="module")
def oracle():
    load_whoosh_oracle()
    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    sch = fields.Schema(
        conv_id=fields.ID(stored=True),
        tags=fields.KEYWORD(lowercase=True, stored=True),
        ctags=fields.KEYWORD(commas=True, stored=True),
        done=fields.BOOLEAN(stored=True),
        ids=fields.IDLIST(stored=True),
        name=fields.NGRAM(minsize=2, maxsize=3, stored=True),
        wname=fields.NGRAMWORDS(minsize=2, maxsize=3, queryor=True,
                                stored=True))
    ix = RamStorage().create_index(sch)
    w = ix.writer()
    for i, (tags, ctags, done, ids, name) in enumerate(ROWS):
        kw = {"conv_id": f"c{i:03d}"}
        if tags:
            kw.update(tags=tags, ctags=ctags, ids=ids,
                      name=name, wname=name)
        if done is not None:
            kw["done"] = done
        w.add_document(**kw)
    w.commit()
    return ix


def _compare(engine, os_, myq, refq, label):
    mine = [(int(d), round(float(s), 9))
            for d, s in engine.search(myq, limit=None).pairs()]
    ref = [(int(h.docnum), round(float(h.score), 9))
           for h in os_.search(refq, limit=None)]
    assert mine == ref, (label, myq, refq, mine, ref)


def test_keyword_fields(engine, oracle):
    from whoosh.query import Term as WT

    with oracle.searcher() as os_:
        for field, val in [("tags", "beta"), ("tags", "alpha"),
                           ("tags", "Beta"), ("ctags", "Red"),
                           ("ctags", "green"), ("ctags", "Green"),
                           ("ids", "u1"), ("ids", "u2"), ("ids", "u6")]:
            _compare(engine, os_, Term(field, val), WT(field, val),
                     f"{field}:{val}")


def test_boolean_field(engine, oracle):
    from whoosh.qparser import QueryParser as WQP
    from whoosh.query import Term as WT

    p = QueryParser("tags", _schema())
    with oracle.searcher() as os_:
        wp = WQP("tags", schema=oracle.schema)
        _compare(engine, os_, Term("done", "t"), WT("done", "t"), "t")
        _compare(engine, os_, Term("done", "f"), WT("done", "f"), "f")
        for qs in ["done:true", "done:false", "done:yes", "done:no",
                   "done:1", "done:0", "done:t", "done:banana"]:
            _compare(engine, os_, p.parse(qs), wp.parse(qs), qs)
        # the reference's query-side bool(x) fallback: garbage -> True
        q = p.parse("done:banana")
        assert engine.search(q, limit=None).docids.size == \
            engine.search(p.parse("done:true"), limit=None).docids.size


def test_ngram_fields(engine, oracle):
    from whoosh.qparser import QueryParser as WQP

    from whoosh_ray.search.query import And, Or

    p = QueryParser("name", _schema())
    with oracle.searcher() as os_:
        wp = WQP("name", schema=oracle.schema)
        for qs in ["name:hello", "name:hel", "name:ll", "name:jel",
                   "wname:hello", "wname:el"]:
            myq, refq = p.parse(qs), wp.parse(qs)
            _compare(engine, os_, myq, refq, qs)
        # multi-gram words parse to And (Or under queryor) of gram
        # terms, never Phrase (fields.py:1222-1231)
        assert isinstance(p.parse("name:hello"), And)
        assert isinstance(p.parse("wname:hello"), Or)


def test_empty_values_index_nothing(engine, oracle):
    with oracle.searcher() as os_:
        # the all-empty row is invisible to every field's lexicon
        for field in ["tags", "ctags", "done", "ids", "name"]:
            mine = set()
            for seg in engine.segments:
                mine.update(seg.all_terms(field))
            ref = {t.decode() for f, t in os_.reader().all_terms()
                   if f == field}
            assert mine == ref, field


def test_boolean_empty_string_query_mode():
    """Query-mode BOOLEAN maps '' through bool('') == False -> 'f'
    (reference _obj_to_bool); index mode still skips it as the
    missing-value fill (ADVICE r3)."""
    import dataclasses

    from whoosh_ray.functions.analysis import VectorAnalyzer
    from whoosh_ray.state.schema import FieldSpec

    spec = FieldSpec.boolean("flag").analyzer
    idx = VectorAnalyzer(spec)
    qry = VectorAnalyzer(dataclasses.replace(spec, mode="query"))
    assert idx.token_lists(["", "yes", None]) == [[], ["t"], []]
    assert qry.token_lists(["", "yes", "maybe", "false"]) == \
        [["f"], ["t"], ["t"], ["f"]]
