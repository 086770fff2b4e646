"""Span query conformance vs the reference (rank + score identical)."""

import numpy as np
import pytest

from tests.oracle import build_oracle_index, oracle_search
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher, Term
from whoosh_ray.search.spans import (
    SpanBefore,
    SpanCondition,
    SpanContains,
    SpanFirst,
    SpanNear2,
    SpanNot,
    SpanOr,
)
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=25, seed=17)


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("spans")
    (d / "src").mkdir()
    pq.write_table(corpus, str(d / "src" / "p.parquet"))
    build_index(str(d / "src"), str(d / "index"), transcripts_schema(),
                seg_size=64)
    return Searcher(str(d / "index"))


@pytest.fixture(scope="module")
def oracle(corpus):
    return build_oracle_index(corpus, text_fields=("text",),
                              id_fields=("role", "conv_id"))


def test_span_queries_match_oracle(engine, oracle, whoosh_oracle):
    from whoosh.query import Term as WT
    from whoosh.query.spans import SpanBefore as WSpanBefore
    from whoosh.query.spans import SpanCondition as WSpanCondition
    from whoosh.query.spans import SpanContains as WSpanContains
    from whoosh.query.spans import SpanFirst as WSpanFirst
    from whoosh.query.spans import SpanNear2 as WSpanNear2
    from whoosh.query.spans import SpanNot as WSpanNot
    from whoosh.query.spans import SpanOr as WSpanOr

    t = lambda w: Term("text", w)  # noqa: E731
    wt = lambda w: WT("text", w)  # noqa: E731
    cases = [
        (SpanFirst(t("deploy"), limit=0), WSpanFirst(wt("deploy"), limit=0)),
        (SpanFirst(t("november"), limit=3),
         WSpanFirst(wt("november"), limit=3)),
        (SpanNear2([t("deploy"), t("render")]),
         WSpanNear2([wt("deploy"), wt("render")])),
        (SpanNear2([t("deploy"), t("render")], slop=4),
         WSpanNear2([wt("deploy"), wt("render")], slop=4)),
        (SpanNear2([t("deploy"), t("render")], slop=3, ordered=False),
         WSpanNear2([wt("deploy"), wt("render")], slop=3, ordered=False)),
        (SpanNear2([t("cluster"), t("error"), t("november")], slop=5),
         WSpanNear2([wt("cluster"), wt("error"), wt("november")], slop=5)),
        (SpanOr([t("cluster"), t("error")]),
         WSpanOr([wt("cluster"), wt("error")])),
        (SpanNot(t("deploy"), t("render")),
         WSpanNot(wt("deploy"), wt("render"))),
        (SpanContains(SpanNear2([t("deploy"), t("render")], slop=6),
                      t("november")),
         WSpanContains(WSpanNear2([wt("deploy"), wt("render")], slop=6),
                       wt("november"))),
        (SpanBefore(t("deploy"), t("november")),
         WSpanBefore(wt("deploy"), wt("november"))),
        (SpanCondition(t("deploy"), t("november")),
         WSpanCondition(wt("deploy"), wt("november"))),
    ]
    for myq, refq in cases:
        mine = [(int(d), float(s)) for d, s in engine.search(myq, limit=None).pairs()]
        ref = [(int(d), float(s))
               for d, s in oracle_search(oracle, refq, limit=None)]
        assert [d for d, _ in mine] == [d for d, _ in ref], refq
        np.testing.assert_allclose([x for _, x in mine],
                                   [x for _, x in ref], rtol=1e-9,
                                   err_msg=repr(refq))


def test_classic_spannear_matches_oracle(engine, oracle, whoosh_oracle):
    """Classic binary SpanNear incl. nested trees and phrase()'s
    balanced-tree shape (reference spans.py:342-490); the unordered
    cases exercise the end-based skip over wide merged spans."""
    from whoosh.query import Term as WT
    from whoosh.query.spans import SpanNear as WSpanNear

    from whoosh_ray.search.spans import SpanNear

    t = lambda w: Term("text", w)  # noqa: E731
    wt = lambda w: WT("text", w)  # noqa: E731
    cases = [
        (SpanNear(t("november"), t("deploy")),
         WSpanNear(wt("november"), wt("deploy"))),
        (SpanNear(t("november"), t("deploy"), slop=3),
         WSpanNear(wt("november"), wt("deploy"), slop=3)),
        (SpanNear(t("deploy"), t("november"), slop=4, ordered=False),
         WSpanNear(wt("deploy"), wt("november"), slop=4, ordered=False)),
        (SpanNear(t("november"), t("november"), slop=5, mindist=2),
         WSpanNear(wt("november"), wt("november"), slop=5, mindist=2)),
        (SpanNear(SpanNear(t("november"), t("november"), slop=3),
                  t("camelcase"), slop=5, ordered=False),
         WSpanNear(WSpanNear(wt("november"), wt("november"), slop=3),
                   wt("camelcase"), slop=5, ordered=False)),
        (SpanNear.phrase("text", ["november", "november", "deploy"],
                         slop=3),
         WSpanNear.phrase("text", ["november", "november", "deploy"],
                          slop=3)),
        (SpanNear.phrase("text",
                         ["november", "big", "time", "november"],
                         slop=4, ordered=False),
         WSpanNear.phrase("text",
                          ["november", "big", "time", "november"],
                          slop=4, ordered=False)),
    ]
    n_nonempty = 0
    for myq, refq in cases:
        mine = [(int(d), float(s)) for d, s in engine.search(myq, limit=None).pairs()]
        ref = [(int(d), float(s))
               for d, s in oracle_search(oracle, refq, limit=None)]
        assert [d for d, _ in mine] == [d for d, _ in ref], refq
        np.testing.assert_allclose([x for _, x in mine],
                                   [x for _, x in ref], rtol=1e-9,
                                   err_msg=repr(refq))
        n_nonempty += bool(mine)
    assert n_nonempty >= 5  # the cases genuinely match documents


def test_nested_queries_match_oracle(engine, oracle):
    from whoosh.query import Term as WT
    from whoosh.query.nested import NestedChildren as WNestedChildren
    from whoosh.query.nested import NestedParent as WNestedParent

    from whoosh_ray.search.nested import NestedChildren, NestedParent

    cases = [
        (NestedParent(Term("role", "user"), Term("text", "deploy")),
         WNestedParent(WT("role", "user"), WT("text", "deploy"))),
        (NestedParent(Term("role", "user"), Term("text", "november"),
                      per_parent_limit=2),
         WNestedParent(WT("role", "user"), WT("text", "november"),
                       per_parent_limit=2)),
        (NestedChildren(Term("role", "user"),
                        Term("conv_id", "conv000003")),
         WNestedChildren(WT("role", "user"), WT("conv_id", "conv000003"))),
    ]
    for myq, refq in cases:
        mine = [(int(d), float(s)) for d, s in engine.search(myq, limit=None).pairs()]
        ref = [(int(d), float(s))
               for d, s in oracle_search(oracle, refq, limit=None)]
        assert [d for d, _ in mine] == [d for d, _ in ref], refq
        np.testing.assert_allclose([x for _, x in mine],
                                   [x for _, x in ref], rtol=1e-9)


def test_spannot_absent_exclusion_crashes_reference(engine, oracle,
                                                    whoosh_oracle):
    """SpanNot with an absent exclusion term CRASHES the reference
    (spans.py:751 calls b.id() on the NullMatcher unguarded ->
    NotImplementedError) — no behavior to match; here the a-side spans
    pass through untouched."""
    import numpy as np
    import pytest as _pytest
    from whoosh.query import Term as WT
    from whoosh.query.spans import SpanNot as WSpanNot

    from whoosh_ray.search.spans import SpanNot

    with oracle.searcher() as os_:
        with _pytest.raises(NotImplementedError):
            # "the" is a stopword — never indexed
            os_.search(WSpanNot(WT("text", "deploy"), WT("text", "the")))
    mine = engine.search(SpanNot(Term("text", "deploy"),
                                 Term("text", "the")), limit=None)
    base = engine.search(Term("text", "deploy"), limit=None)
    np.testing.assert_array_equal(np.sort(mine.docids),
                                  np.sort(base.docids))
