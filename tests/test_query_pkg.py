"""whoosh_ray.query package layout + the round-5 additions:
ConstantScoreQuery / WeightingQuery scoring conformance vs the
reference, Span class parity, qcore sentinels, BooleanQuery."""

import random

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import load_whoosh_oracle
from tests.oracle import build_oracle_index, oracle_search
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher
from whoosh_ray.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=25, seed=77)


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory):
    from whoosh_ray.state.schema import transcripts_schema

    d = tmp_path_factory.mktemp("qpkg_ix")
    src = d / "src"
    src.mkdir()
    pq.write_table(corpus, str(src / "part0.parquet"))
    build_index(str(src), str(d / "index"), transcripts_schema(),
                seg_size=64)
    return Searcher(str(d / "index"))


@pytest.fixture(scope="module")
def oracle(corpus):
    return build_oracle_index(corpus, text_fields=("text",),
                              id_fields=("role", "tool", "conv_id"))


def _pairs(results):
    return [(int(d), float(s)) for d, s in results]


def both(engine, oracle, myq, wq, limit=10):
    mine = _pairs(engine.search(myq, limit=limit).pairs())
    ref = _pairs(oracle_search(oracle, wq, limit=limit))
    return mine, ref


def assert_identical(mine, ref):
    assert [d for d, _ in mine] == [d for d, _ in ref]
    np.testing.assert_allclose([s for _, s in mine], [s for _, s in ref],
                               rtol=0, atol=0)


# ---- package layout ----

REF_SUBMODULE_NAMES = {
    "qcore": ["Every", "Highest", "Lowest", "NullQuery", "Query",
              "QueryError", "error_query", "token_lists"],
    "terms": ["ExpandingTerm", "FuzzyTerm", "MultiTerm", "PatternQuery",
              "Prefix", "Regex", "Term", "Variations", "Wildcard"],
    "compound": ["And", "AndMaybe", "AndNot", "BinaryQuery", "BooleanQuery",
                 "CompoundQuery", "DefaultOr", "DisjunctionMax", "Or",
                 "Otherwise", "PreloadedOr", "Require", "SplitOr"],
    "ranges": ["DateRange", "NumericRange", "RangeMixin", "TermRange"],
    "wrappers": ["ConstantScoreQuery", "Not", "WeightingQuery",
                 "WrappingQuery"],
    "positional": ["Ordered", "Phrase", "Sequence"],
    "nested": ["NestedChildren", "NestedParent"],
    "qcolumns": ["ColumnQuery"],
    "spans": ["Span", "SpanBefore", "SpanCondition", "SpanContains",
              "SpanFirst", "SpanNear", "SpanNear2", "SpanNot", "SpanOr",
              "SpanQuery", "WrappingSpan", "bisect_spans"],
}


def test_submodule_layout():
    import importlib

    for sub, names in REF_SUBMODULE_NAMES.items():
        mod = importlib.import_module(f"whoosh_ray.query.{sub}")
        for n in names:
            assert hasattr(mod, n), f"whoosh_ray.query.{sub}.{n}"
    # and everything re-exported at package level, like the reference
    import whoosh_ray.query as q

    for names in REF_SUBMODULE_NAMES.values():
        for n in names:
            assert hasattr(q, n), f"whoosh_ray.query.{n}"


def test_virtual_bases():
    from whoosh_ray.query import (AndMaybe, AndNot, BinaryQuery, DateRange,
                                  NumericRange, Otherwise, RangeMixin,
                                  Require, Term, TermRange)

    t = Term("text", "x")
    for cls in (AndNot, Require, AndMaybe, Otherwise):
        assert isinstance(cls(t, t), BinaryQuery)
    assert not isinstance(t, BinaryQuery)
    assert isinstance(TermRange("text", "a", "b"), RangeMixin)
    assert isinstance(NumericRange("n", 1, 2), RangeMixin)
    assert isinstance(DateRange, type) and issubclass(DateRange, NumericRange)
    assert not isinstance(t, RangeMixin)


# ---- ConstantScoreQuery / WeightingQuery conformance ----

def test_constantscore_query(engine, oracle):
    load_whoosh_oracle()
    from whoosh import query as wq

    from whoosh_ray.query import ConstantScoreQuery, Or, Term

    mine, ref = both(
        engine, oracle,
        ConstantScoreQuery(Term("text", "deploy"), score=2.5),
        wq.ConstantScoreQuery(wq.Term("text", "deploy"), score=2.5),
        limit=None)
    assert_identical(mine, ref)
    assert all(s == 2.5 for _, s in mine)

    # as a filter branch inside a scored Or
    mine, ref = both(
        engine, oracle,
        Or([Term("text", "render"),
            ConstantScoreQuery(Term("text", "deploy"))]),
        wq.Or([wq.Term("text", "render"),
               wq.ConstantScoreQuery(wq.Term("text", "deploy"))]),
        limit=20)
    assert_identical(mine, ref)


def test_constantscore_over_compound(engine, oracle):
    load_whoosh_oracle()
    from whoosh import query as wq

    from whoosh_ray.query import And, ConstantScoreQuery, Term

    mine, ref = both(
        engine, oracle,
        ConstantScoreQuery(And([Term("text", "deploy"),
                                Term("text", "render")]), score=7.0),
        wq.ConstantScoreQuery(wq.And([wq.Term("text", "deploy"),
                                      wq.Term("text", "render")]),
                              score=7.0),
        limit=None)
    assert_identical(mine, ref)


def test_reference_weighting_query_is_a_noop(oracle):
    """Reference BUG pinned: WeightingQuery.matcher calls
    ``context.set(weighting=...)`` but SearchContext.set returns a
    MODIFIED COPY (searching.py:92-95) which is discarded
    (query/wrappers.py:193-199) — so the wrapped weighting never
    applies and the subtree scores with the searcher's model.  We
    implement the documented intent instead (below)."""
    load_whoosh_oracle()
    from whoosh import query as wq
    from whoosh import scoring as wscoring

    plain = _pairs(oracle_search(oracle, wq.Term("text", "deploy"),
                                 limit=None))
    wrapped = _pairs(oracle_search(
        oracle, wq.WeightingQuery(wq.Term("text", "deploy"),
                                  wscoring.TF_IDF()), limit=None))
    assert wrapped == plain  # the no-op, verbatim


def _repaired_ref_weighting(monkeypatch):
    """The reference class with the one-line intent repair
    (context = context.set(...)) for conformance comparison."""
    from whoosh import query as wq

    def matcher(self, searcher, context=None):
        context = context.set(weighting=self.weighting)
        return self.child.matcher(searcher, context)

    monkeypatch.setattr(wq.WeightingQuery, "matcher", matcher)
    return wq.WeightingQuery


def test_weighting_query(engine, oracle, monkeypatch):
    load_whoosh_oracle()
    from whoosh import query as wq
    from whoosh import scoring as wscoring

    from whoosh_ray.query import Or, Term, WeightingQuery
    from whoosh_ray.search import scoring

    RefWQ = _repaired_ref_weighting(monkeypatch)

    # root WeightingQuery: the whole tree scores TF_IDF
    mine, ref = both(
        engine, oracle,
        WeightingQuery(Term("text", "deploy"), scoring.TF_IDF()),
        RefWQ(wq.Term("text", "deploy"), wscoring.TF_IDF()),
        limit=None)
    assert_identical(mine, ref)

    # subtree weighting inside a BM25-scored Or
    mine, ref = both(
        engine, oracle,
        Or([Term("text", "render"),
            WeightingQuery(Term("text", "deploy"), scoring.Frequency())]),
        wq.Or([wq.Term("text", "render"),
               RefWQ(wq.Term("text", "deploy"), wscoring.Frequency())]),
        limit=20)
    assert_identical(mine, ref)


def test_weighting_query_cache_isolation(engine):
    """The same Term object evaluated inside and outside a
    WeightingQuery must not share cached scores."""
    from whoosh_ray.query import Term, WeightingQuery
    from whoosh_ray.search import scoring

    t = Term("text", "deploy")
    r_plain = _pairs(engine.search(t, limit=None).pairs())
    r_freq = _pairs(engine.search(WeightingQuery(t, scoring.Frequency()),
                                  limit=None).pairs())
    r_plain2 = _pairs(engine.search(t, limit=None).pairs())
    assert r_plain == r_plain2
    assert [d for d, _ in r_plain] == [d for d, _ in
                                       sorted(r_freq,
                                              key=lambda p: (-p[1], p[0]))] \
        or r_freq != r_plain  # scores differ unless tf == bm25 ranks align


# ---- Span class parity (randomized, vs the reference class) ----

def test_span_parity():
    load_whoosh_oracle()
    from whoosh.query.spans import Span as RefSpan

    from whoosh_ray.query import Span

    rng = random.Random(4242)

    def mk(cls, seed):
        r = random.Random(seed)
        start = r.randrange(0, 30)
        end = start + r.randrange(0, 6)
        sc = r.choice([None, start * 5])
        ec = r.choice([None, end * 5 + 4])
        return cls(start, end, sc, ec)

    def rep(s):
        # reference repr CRASHES when exactly one of startchar/endchar
        # is None ("%d" on None) — pin crash-for-crash
        try:
            return repr(s)
        except TypeError:
            return "<TypeError>"

    for i in range(300):
        a, b = mk(Span, i), mk(Span, i * 31 + 7)
        ra, rb = mk(RefSpan, i), mk(RefSpan, i * 31 + 7)
        assert rep(a) == rep(ra)
        assert (a == b) == (ra == rb)
        assert (a != b) == (ra != rb)
        assert (a < b) == (ra < rb)
        assert (a > b) == (ra > rb)
        assert a.overlaps(b) == ra.overlaps(rb)
        assert a.surrounds(b) == ra.surrounds(rb)
        assert a.is_within(b) == ra.is_within(rb)
        assert a.is_before(b) == ra.is_before(rb)
        assert a.is_after(b) == ra.is_after(rb)
        assert a.touches(b) == ra.touches(rb)
        assert a.distance_to(b) == ra.distance_to(rb)
        j, rj = a.to(b), ra.to(rb)
        assert (j.start, j.end, j.startchar, j.endchar) == \
            (rj.start, rj.end, rj.startchar, rj.endchar)

    # merge parity on random lists
    for i in range(60):
        seeds = [rng.randrange(10**9) for _ in range(rng.randrange(1, 8))]
        ours = sorted(mk(Span, s) for s in seeds)
        refs = sorted(mk(RefSpan, s) for s in seeds)
        m, rm = Span.merge(ours), RefSpan.merge(refs)
        assert [(s.start, s.end) for s in m] == [(s.start, s.end) for s in rm]


def test_bisect_spans():
    load_whoosh_oracle()
    from whoosh.query.spans import Span as RefSpan
    from whoosh.query.spans import bisect_spans as ref_bisect

    from whoosh_ray.query import Span, bisect_spans

    r = random.Random(9)
    for _ in range(100):
        starts = sorted(r.randrange(0, 40) for _ in range(r.randrange(0, 9)))
        ours = [Span(s, s + 2) for s in starts]
        refs = [RefSpan(s, s + 2) for s in starts]
        probe = r.randrange(0, 45)
        assert bisect_spans(ours, probe) == ref_bisect(refs, probe)


# ---- qcore sentinels + helpers ----

def test_lowest_highest_parity():
    load_whoosh_oracle()
    from whoosh.query.qcore import Highest as RefHighest
    from whoosh.query.qcore import Lowest as RefLowest

    from whoosh_ray.query import Highest, Lowest

    others = [0, 3.5, "zz", (1, 2)]
    for mine, ref in ((Lowest, RefLowest), (Highest, RefHighest)):
        for x in others:
            for op in ("__lt__", "__gt__", "__le__", "__ge__", "__eq__",
                       "__ne__"):
                assert getattr(mine, op)(x) == getattr(ref, op)(x), \
                    (type(mine).__name__, op, x)
        # self-comparison quirks (Highest < Highest is True in the ref)
        for op in ("__lt__", "__gt__", "__le__", "__ge__", "__eq__",
                   "__ne__"):
            assert getattr(mine, op)(mine) == getattr(ref, op)(ref), op
    assert sorted([3, Lowest, 1], key=lambda v: (v is not Lowest, v if
                  v is not Lowest else 0))[0] is Lowest


def test_token_lists_and_error_query(engine):
    from whoosh_ray.query import (And, Or, Phrase, Term, error_query,
                                  token_lists)

    q = And([Term("text", "a"), Or([Term("text", "b"), Term("text", "c")]),
             Phrase("text", ["d", "e"])])
    tl = token_lists(q)
    # nested-list hierarchy: [a, [b, c], [d, e]] as Token-ish leaf objects
    assert len(tl) == 3 and len(tl[1]) == 2 and len(tl[2]) == 2
    assert error_query("boom").error == "boom"
    t = Term("text", "x")
    assert error_query("bad", t) is t and t.error == "bad"


def test_boolean_query(engine, oracle):
    load_whoosh_oracle()
    from whoosh.query import BooleanQuery as RefBooleanQuery
    from whoosh.query import Term as RefTerm

    from whoosh_ray.query import BooleanQuery, Term

    mine_q = BooleanQuery([Term("text", "deploy")],
                          [Term("text", "render")],
                          [Term("text", "error")])
    ref_q = RefBooleanQuery([RefTerm("text", "deploy")],
                            [RefTerm("text", "render")],
                            [RefTerm("text", "error")])
    mine, ref = both(engine, oracle, mine_q, ref_q, limit=None)
    assert_identical(mine, ref)


def test_or_variants_evaluate_like_or(engine):
    from whoosh_ray.query import DefaultOr, Or, PreloadedOr, SplitOr, Term

    subs = lambda: [Term("text", "deploy"), Term("text", "render")]
    base = _pairs(engine.search(Or(subs()), limit=None).pairs())
    for cls in (DefaultOr, SplitOr, PreloadedOr):
        assert _pairs(engine.search(cls(subs()), limit=None).pairs()) == base
        # distinct classes stay structurally distinct (reference parity)
        assert cls(subs()) != Or(subs())
