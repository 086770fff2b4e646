"""Facet family conformance vs the whoosh oracle (VERDICT r1 #5):
sortedby / groupedby parity for Field/Query/Range/DateRange/Score/
Function/Translate/StoredField/Multi facets and the Facets collection,
mirroring the reference's tests/test_sorting.py behaviors."""

import datetime

import numpy as np
import pytest

from tests.oracle import build_oracle_index
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import (
    Count,
    DateRangeFacet,
    Facets,
    FieldFacet,
    MultiFacet,
    QueryFacet,
    RangeFacet,
    ScoreFacet,
    Searcher,
    StoredFieldFacet,
    Term,
    TranslateFacet,
)
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=30, seed=42)


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("facetix")
    (d / "src").mkdir()
    pq.write_table(corpus, str(d / "src" / "p.parquet"))
    build_index(str(d / "src"), str(d / "index"), transcripts_schema(),
                seg_size=64)
    return Searcher(str(d / "index"))


@pytest.fixture(scope="module")
def oracle(corpus):
    return build_oracle_index(corpus, text_fields=("text",),
                              id_fields=("role", "tool", "conv_id"),
                              numeric_fields=("turn_idx",),
                              datetime_fields=("ts",))


def wsorting():
    from whoosh import sorting

    return sorting


def wquery():
    from whoosh import query

    return query


def o_search(oracle, wq, **kw):
    with oracle.searcher() as s:
        r = s.search(wq, **kw)
        docs = [hit.docnum for hit in r]
        groups = None
        if kw.get("groupedby") is not None:
            names = list(r.facet_names())
            groups = {n: dict(r.groups(n)) for n in names}
        return docs, groups


def test_sortedby_field(engine, oracle):
    wq = wquery()
    for reverse in (False, True):
        mine = engine.search(Term("text", "deploy"), limit=20,
                             sortedby="turn_idx", reverse=reverse)
        ref, _ = o_search(oracle, wq.Term("text", "deploy"), limit=20,
                          sortedby="turn_idx", reverse=reverse)
        assert mine.docids.tolist() == ref


def test_sortedby_multi_with_score(engine, oracle):
    ws = wsorting()
    wq = wquery()
    mine = engine.search(
        Term("text", "deploy"), limit=30,
        sortedby=MultiFacet([FieldFacet("role"), ScoreFacet()]))
    ref, _ = o_search(
        oracle, wq.Term("text", "deploy"), limit=30,
        sortedby=ws.MultiFacet([ws.FieldFacet("role"), ws.ScoreFacet()]))
    assert mine.docids.tolist() == ref


def test_sortedby_reverse_subfacet(engine, oracle):
    ws = wsorting()
    wq = wquery()
    mine = engine.search(
        Term("text", "deploy"), limit=30,
        sortedby=MultiFacet([FieldFacet("role", reverse=True),
                             FieldFacet("turn_idx")]))
    ref, _ = o_search(
        oracle, wq.Term("text", "deploy"), limit=30,
        sortedby=ws.MultiFacet([ws.FieldFacet("role", reverse=True),
                                ws.FieldFacet("turn_idx")]))
    assert mine.docids.tolist() == ref


def test_groupedby_field(engine, oracle):
    wq = wquery()
    mine = engine.search(Term("text", "deploy"), limit=None,
                         groupedby="role")
    ref_docs, ref_groups = o_search(oracle, wq.Term("text", "deploy"),
                                    limit=None, groupedby="role")
    assert mine.groups() == ref_groups["role"]


def test_groupedby_count_maptype(engine, oracle):
    ws = wsorting()
    wq = wquery()
    mine = engine.search(Term("text", "deploy"), limit=None,
                         groupedby=FieldFacet("role", maptype=Count))
    _, ref_groups = o_search(
        oracle, wq.Term("text", "deploy"), limit=None,
        groupedby=ws.FieldFacet("role", maptype=ws.Count))
    assert mine.groups() == ref_groups["role"]


def test_groupedby_query_facet(engine, oracle):
    ws = wsorting()
    wq = wquery()
    myqd = {"dep": Term("text", "deploy"), "ren": Term("text", "render"),
            "none": Term("text", "absentterm")}
    wqd = {"dep": wq.Term("text", "deploy"),
           "ren": wq.Term("text", "render"),
           "none": wq.Term("text", "absentterm")}
    mine = engine.search(Term("text", "cluster"), limit=None,
                         groupedby=QueryFacet(myqd, other="misc"))
    _, ref_groups = o_search(
        oracle, wq.Term("text", "cluster"), limit=None,
        groupedby=ws.QueryFacet(wqd, other="misc"))
    (ref_key,) = ref_groups
    assert mine.groups() == ref_groups[ref_key]


def test_groupedby_range_facet(engine, oracle):
    ws = wsorting()
    wq = wquery()
    mine = engine.search(Term("text", "deploy"), limit=None,
                         groupedby=RangeFacet("turn_idx", 0, 12, 3))
    _, ref_groups = o_search(
        oracle, wq.Term("text", "deploy"), limit=None,
        groupedby=ws.RangeFacet("turn_idx", 0, 12, 3))
    assert mine.groups() == ref_groups["turn_idx"]


def test_groupedby_range_facet_gap_list_hardend(engine, oracle):
    ws = wsorting()
    wq = wquery()
    for hardend in (False, True):
        mine = engine.search(
            Term("text", "deploy"), limit=None,
            groupedby=RangeFacet("turn_idx", 0, 11, [1, 2, 4],
                                 hardend=hardend))
        _, ref_groups = o_search(
            oracle, wq.Term("text", "deploy"), limit=None,
            groupedby=ws.RangeFacet("turn_idx", 0, 11, [1, 2, 4],
                                    hardend=hardend))
        assert mine.groups() == ref_groups["turn_idx"]


def test_groupedby_daterange(engine, oracle, corpus):
    ws = wsorting()
    wq = wquery()
    ts = corpus["ts"].to_pylist()
    lo = min(ts).replace(minute=0, second=0, microsecond=0)
    hi = max(ts)
    gap = datetime.timedelta(days=2)
    mine = engine.search(Term("text", "deploy"), limit=None,
                         groupedby=DateRangeFacet("ts", lo, hi, gap))
    _, ref_groups = o_search(
        oracle, wq.Term("text", "deploy"), limit=None,
        groupedby=ws.DateRangeFacet("ts", lo, hi, gap))
    assert mine.groups() == ref_groups["ts"]


def test_translate_facet(engine, oracle):
    ws = wsorting()
    wq = wquery()

    def parity(v):
        return v % 2

    mine = engine.search(Term("text", "deploy"), limit=None,
                         groupedby=TranslateFacet(parity,
                                                  FieldFacet("turn_idx")))
    _, ref_groups = o_search(
        oracle, wq.Term("text", "deploy"), limit=None,
        groupedby=ws.TranslateFacet(parity, ws.FieldFacet("turn_idx")))
    (ref_key,) = ref_groups
    assert mine.groups() == ref_groups[ref_key]


def test_stored_field_facet(engine, oracle):
    ws = wsorting()
    wq = wquery()
    mine = engine.search(Term("text", "deploy"), limit=None,
                         groupedby=StoredFieldFacet("role"))
    _, ref_groups = o_search(
        oracle, wq.Term("text", "deploy"), limit=None,
        groupedby=ws.StoredFieldFacet("role"))
    assert mine.groups() == ref_groups["role"]


def test_facets_collection_multi_grouping(engine, oracle):
    ws = wsorting()
    wq = wquery()
    mine = engine.search(
        Term("text", "deploy"), limit=None,
        groupedby=Facets().add_field("role")
                          .add_facet("bins",
                                     RangeFacet("turn_idx", 0, 12, 4)))
    _, ref_groups = o_search(
        oracle, wq.Term("text", "deploy"), limit=None,
        groupedby=ws.Facets().add_field("role")
                             .add_facet("bins",
                                        ws.RangeFacet("turn_idx", 0, 12, 4)))
    assert mine.groups("role") == ref_groups["role"]
    assert mine.groups("bins") == ref_groups["bins"]


def test_function_facet(engine, oracle):
    """FunctionFacet gets (searcher, GLOBAL docid); keys must agree with
    a driver-computed reference (the whoosh fn signature differs only in
    the searcher object, so parity is checked on our side)."""
    fn = lambda s, docid: docid % 7  # noqa: E731
    from whoosh_ray.search import FunctionFacet

    r = engine.search(Term("text", "deploy"), limit=None,
                      groupedby=FunctionFacet(fn))
    got = r.groups()
    expect: dict = {}
    plain = engine.search(Term("text", "deploy"), limit=None)
    for d in plain.docids:
        expect.setdefault(int(d) % 7, []).append(int(d))
    assert {k: sorted(v) for k, v in got.items()} \
        == {k: sorted(v) for k, v in expect.items()}


def test_missing_value_sort_and_group_parity(tmp_path):
    """Missing (None) stored values: text columns default '' (sort
    FIRST asc, group under ''), numeric columns default the type max
    (sort LAST asc) — reference column-default semantics, output-
    matched against a whoosh sortable-column index."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.build import build_index
    from whoosh_ray.search import FieldFacet, Searcher, Term
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    rows = [("d0", "alpha x", "b", 3), ("d1", "alpha y", None, 1),
            ("d2", "alpha z", "a", 2), ("d3", "alpha w", "b", None),
            ("d4", "alpha v", None, 2), ("d5", "alpha u", "c", 1)]
    t = pa.table({
        "doc": [r[0] for r in rows],
        "turn_idx": pa.array([0] * 6, pa.int32()),
        "text": [r[1] for r in rows],
        "cat": [r[2] for r in rows],
        "num": pa.array([r[3] for r in rows], pa.int32())})
    (tmp_path / "src").mkdir()
    pq.write_table(t, str(tmp_path / "src" / "p.parquet"))
    sch = IndexSchema(fields=(FieldSpec.text("text"), FieldSpec.id("cat"),
                              FieldSpec.id("doc")), stored_columns=("num",))
    build_index(str(tmp_path / "src"), str(tmp_path / "ix"), sch,
                conv_col="doc", seg_size=2)
    s = Searcher(str(tmp_path / "ix"))

    # expectations captured from the reference engine on this corpus
    expect = {("cat", False): ["d1", "d4", "d2", "d0", "d3", "d5"],
              ("cat", True): ["d5", "d0", "d3", "d2", "d1", "d4"],
              ("num", False): ["d1", "d5", "d2", "d4", "d0", "d3"],
              ("num", True): ["d3", "d0", "d2", "d4", "d1", "d5"]}
    for (f, rev), want in expect.items():
        r = s.search(Term("text", "alpha"),
                     sortedby=FieldFacet(f, reverse=rev), limit=None)
        assert [h["doc"] for h in r.hits()] == want, (f, rev)
    g = s.search(Term("text", "alpha"), groupedby=FieldFacet("cat"),
                 limit=None).groups("cat")
    assert {k: sorted(v) for k, v in g.items()} == {
        "b": [0, 3], "": [1, 4], "a": [2], "c": [5]}


def test_fill_missing_all_none_uses_column_type():
    """An all-None numeric/datetime facet column keeps its TYPE default
    (sort-last inf / datetime.max), not the text '' fallback the value
    probe would pick (ADVICE r3)."""
    import datetime as dt

    import pyarrow as pa

    from whoosh_ray.search.facets import _fill_missing

    assert _fill_missing([None, None], pa.int64()) == \
        [float("inf"), float("inf")]
    assert _fill_missing([None], pa.float32()) == [float("inf")]
    assert _fill_missing([None], pa.timestamp("us")) == [dt.datetime.max]
    assert _fill_missing([None], pa.string()) == [""]
    assert _fill_missing([None], pa.large_binary()) == [b""]
    # typed fill also wins over a MIXED column's first-value probe
    assert _fill_missing([None, 3], pa.int64()) == [float("inf"), 3]
    # no type: value-probe fallback unchanged
    assert _fill_missing([None, "x"]) == ["", "x"]
    assert _fill_missing([None, 2.5]) == [float("inf"), 2.5]


def test_groupedby_best_maptype(engine, oracle):
    from whoosh_ray.search.facets import Best

    ws = wsorting()
    wq = wquery()
    mine = engine.search(Term("text", "deploy"), limit=None,
                         groupedby=FieldFacet("role", maptype=Best))
    _, ref_groups = o_search(
        oracle, wq.Term("text", "deploy"), limit=None,
        groupedby=ws.FieldFacet("role", maptype=ws.Best))
    assert mine.groups() == ref_groups["role"]


def test_custom_categorizer_facet(engine, oracle):
    """A reference-style custom FacetType (subclass + categorizer()
    returning a Categorizer) plugs into sortedby/groupedby unchanged —
    the extension contract from reference sorting.py:74-155."""
    from whoosh import sorting as ws

    from whoosh_ray.sorting import Categorizer, FacetType

    class MyParity(FacetType):
        """Groups docs by turn_idx parity via per-doc key_for."""

        def categorizer(self, global_searcher):
            outer = self

            class _C(Categorizer):
                def set_searcher(self, s, offset):
                    self._s = s
                    self._off = offset

                def key_for(self, matcher, docnum):
                    t = self._s.stored(
                        np.array([docnum + self._off]),
                        columns=["turn_idx"])
                    return int(t["turn_idx"][0].as_py()) % 2

                def key_to_name(self, key):
                    return "odd" if key else "even"

            return _C()

    class WParity(ws.FacetType):
        def categorizer(self, global_searcher):
            class _C(ws.Categorizer):
                def set_searcher(self, s, offset):
                    self._r = s.reader()

                def key_for(self, matcher, docnum):
                    return self._r.stored_fields(docnum)["turn_idx"] % 2

                def key_to_name(self, key):
                    return "odd" if key else "even"

            return _C()

    wq = wquery()
    q = Term("text", "deploy")
    rq = wq.Term("text", "deploy")

    mine = engine.search(q, limit=None, groupedby={"par": MyParity()})
    odocs, ogroups = o_search(oracle, rq, limit=None,
                              groupedby={"par": WParity()})
    assert dict(mine.groups("par")) == ogroups["par"]

    mine_s = engine.search(q, limit=None, sortedby=MyParity())
    ours_docs = mine_s.docids.tolist()
    odocs_s, _ = o_search(oracle, rq, limit=None, sortedby=WParity())
    assert ours_docs == odocs_s
