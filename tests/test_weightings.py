"""Every scoring model vs the reference on a seeded rand100 corpus
(FIXTURES.md F5 / reference tests/test_weightings.py), plus
filter/mask search semantics."""

import random

import numpy as np
import pyarrow as pa
import pytest

from tests.oracle import oracle_search
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Or, Searcher, Term
from whoosh_ray.search import scoring as my_scoring
from whoosh_ray.state.schema import FieldSpec, IndexSchema


@pytest.fixture(scope="module")
def corpus():
    random.seed(77)
    domain = ["alfa", "bravo", "charlie", "delta", "echo", "foxtrot"]
    rows = []
    for i in range(100):
        rows.append({
            "key": f"doc{i:03d}",
            "text": " ".join(random.choices(domain,
                                            k=random.randint(10, 20))),
        })
    return pa.Table.from_pylist(rows)


@pytest.fixture(scope="module")
def engine_ix(corpus, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("wts")
    (d / "src").mkdir()
    pq.write_table(corpus, str(d / "src" / "p.parquet"))
    schema = IndexSchema(fields=(FieldSpec.text("text", positions=False),
                                 FieldSpec.id("key")))
    # docids: row order — use an explicit docid column
    t = corpus.append_column("rowid", pa.array(np.arange(corpus.num_rows)))
    pq.write_table(t, str(d / "src" / "p.parquet"))
    build_index(str(d / "src"), str(d / "index"), schema, seg_size=32,
                docid_col="rowid")
    return str(d / "index")


@pytest.fixture(scope="module")
def oracle(corpus):
    from tests.conftest import load_whoosh_oracle

    load_whoosh_oracle()
    from whoosh import fields
    from whoosh.analysis import StandardAnalyzer
    from whoosh.filedb.filestore import RamStorage

    ix = RamStorage().create_index(fields.Schema(
        key=fields.ID(stored=True),
        text=fields.TEXT(analyzer=StandardAnalyzer(), stored=True)))
    w = ix.writer()
    for key, text in zip(corpus["key"].to_pylist(),
                         corpus["text"].to_pylist()):
        w.add_document(key=key, text=text)
    w.commit()
    return ix


MODEL_PAIRS = [
    ("BM25F", lambda w: w.BM25F(), lambda: my_scoring.BM25F()),
    ("TF_IDF", lambda w: w.TF_IDF(), lambda: my_scoring.TF_IDF()),
    ("Frequency", lambda w: w.Frequency(), lambda: my_scoring.Frequency()),
    ("DFree", lambda w: w.DFree(), lambda: my_scoring.DFree()),
    ("PL2", lambda w: w.PL2(), lambda: my_scoring.PL2()),
]


def test_all_models_match_oracle(engine_ix, oracle):
    from whoosh import scoring as w_scoring
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WTerm

    # The reference's DFreeScorer calls parent.weight(...), a method the
    # reference Searcher does not have (scoring.py:374 — broken as
    # shipped); restore the evident intent (total term weight ==
    # frequency) so there is an oracle to compare against.
    import whoosh.searching as wsearching

    if not hasattr(wsearching.Searcher, "weight"):
        wsearching.Searcher.weight = (
            lambda self, fieldname, text: self.frequency(fieldname, text))

    for name, wfac, myfac in MODEL_PAIRS:
        s = Searcher(engine_ix, weighting=myfac())
        with oracle.searcher(weighting=wfac(w_scoring)) as os_:
            for qterms in [["alfa"], ["bravo", "echo"]]:
                myq = (Term("text", qterms[0]) if len(qterms) == 1
                       else Or([Term("text", t) for t in qterms]))
                refq = (WTerm("text", qterms[0]) if len(qterms) == 1
                        else WOr([WTerm("text", t) for t in qterms]))
                mine = [(int(d), float(sc))
                        for d, sc in s.search(myq, limit=None).pairs()]
                r = os_.search(refq, limit=None)
                ref = [(int(h.docnum), float(h.score)) for h in r]
                assert [d for d, _ in mine] == [d for d, _ in ref], (
                    name, qterms)
                np.testing.assert_allclose(
                    [x for _, x in mine], [x for _, x in ref], rtol=1e-9,
                    err_msg=f"{name} {qterms}")


def test_multi_and_function_weighting(engine_ix):
    s_default = Searcher(engine_ix)
    mw = my_scoring.MultiWeighting(my_scoring.BM25F(),
                                   text=my_scoring.TF_IDF())
    s_multi = Searcher(engine_ix, weighting=mw)
    s_tfidf = Searcher(engine_ix, weighting=my_scoring.TF_IDF())
    q = Term("text", "alfa")
    np.testing.assert_array_equal(
        s_multi.search(q, limit=None).scores,
        s_tfidf.search(q, limit=None).scores)

    fw = my_scoring.FunctionWeighting(
        lambda searcher, f, t, tfs, lens: tfs * 2.0)
    s_fn = Searcher(engine_ix, weighting=fw)
    r = s_fn.search(q, limit=None)
    freq = Searcher(engine_ix,
                    weighting=my_scoring.Frequency()).search(q, limit=None)
    np.testing.assert_array_equal(r.scores, freq.scores * 2.0)


def test_filter_and_mask(engine_ix, oracle):
    from whoosh.query import Term as WTerm

    s = Searcher(engine_ix)
    base = s.search(Term("text", "alfa"), limit=None)
    filt = s.search(Term("text", "bravo"), limit=None)
    both = s.search(Term("text", "alfa"), limit=None,
                    filter=Term("text", "bravo"))
    assert set(both.docids) == set(base.docids) & set(filt.docids)
    masked = s.search(Term("text", "alfa"), limit=None,
                      mask=Term("text", "bravo"))
    assert set(masked.docids) == set(base.docids) - set(filt.docids)
    # oracle comparison
    with oracle.searcher() as os_:
        ref = os_.search(WTerm("text", "alfa"), limit=None,
                         filter=WTerm("text", "bravo"))
        refd = [int(h.docnum) for h in ref]
    assert both.docids.tolist() == refd

def test_reverse_weighting_matches_oracle(engine_ix, oracle):
    from whoosh import scoring as w_scoring
    from whoosh.query import Term as WTerm

    with oracle.searcher(
            weighting=w_scoring.ReverseWeighting(w_scoring.BM25F())) as s:
        ref = [(h.docnum, h.score)
               for h in s.search(WTerm("text", "alfa"), limit=None)]
    mine = Searcher(engine_ix,
                    weighting=my_scoring.ReverseWeighting(
                        my_scoring.BM25F()))
    r = mine.search(Term("text", "alfa"), limit=None)
    assert r.docids.tolist() == [d for d, _ in ref]
    np.testing.assert_allclose(r.scores, [s for _, s in ref], rtol=1e-9)


def test_final_hook_matches_oracle(engine_ix, oracle):
    from whoosh import scoring as w_scoring
    from whoosh.query import Term as WTerm

    class WFinal(w_scoring.BM25F):
        use_final = True

        def final(self, searcher, docnum, score):
            return score + (docnum % 7) * 0.25

    class MyFinal(my_scoring.BM25F):
        use_final = True

        def final(self, searcher, docnum, score):
            return score + (docnum % 7) * 0.25

    with oracle.searcher(weighting=WFinal()) as s:
        ref = [(h.docnum, h.score)
               for h in s.search(WTerm("text", "bravo"), limit=10)]
    mine = Searcher(engine_ix, weighting=MyFinal())
    r = mine.search_topk(Term("text", "bravo"), limit=10)
    assert r.docids.tolist() == [d for d, _ in ref]
    np.testing.assert_allclose(r.scores, [s for _, s in ref], rtol=1e-9)


def test_raw_formula_functions_match_reference():
    """bm25/dfree/pl2 module functions + constants (reference
    scoring.py:266,337,388)."""
    from whoosh import scoring as w_scoring

    assert my_scoring.pi == pytest.approx(np.pi)
    assert my_scoring.rec_log2_of_e == w_scoring.rec_log2_of_e
    cases = [(1.7, 3.0, 12.0, 9.5, 0.75, 1.2), (2.0, 1.0, 4.0, 7.0, 0.6, 1.5)]
    for idf, tf, fl, avgfl, B, K1 in cases:
        assert my_scoring.bm25(idf, tf, fl, avgfl, B, K1) == pytest.approx(
            w_scoring.bm25(idf, tf, fl, avgfl, B, K1))
    for tf, cf, qf, dl, fl in [(3.0, 17.0, 1.0, 12.0, 900.0),
                               (1.0, 2.0, 2.0, 5.0, 100.0)]:
        assert my_scoring.dfree(tf, cf, qf, dl, fl) == pytest.approx(
            w_scoring.dfree(tf, cf, qf, dl, fl))
    for tf, cf, qf, dc, fl, avgfl, c in [(3.0, 17.0, 1.0, 50, 12.0, 9.5, 1.0),
                                         (2.0, 9.0, 1.0, 100, 6.0, 8.0, 1.3)]:
        assert my_scoring.pl2(tf, cf, qf, dc, fl, avgfl, c) == pytest.approx(
            w_scoring.pl2(tf, cf, qf, dc, fl, avgfl, c))


def test_legacy_weighting_compat(engine_ix, oracle):
    """Subclassing scoring.Weighting with a per-document score()
    (reference scoring.py:479-500) produces identical rankings; topk
    falls back to the exhaustive path."""
    from whoosh import scoring as w_scoring
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WTerm

    class MyW(my_scoring.Weighting):
        def score(self, searcher, fieldname, text, docnum, weight):
            return weight * ((docnum % 5) + 1)

    class RefW(w_scoring.Weighting):
        def score(self, searcher, fieldname, text, docnum, weight):
            return weight * ((docnum % 5) + 1)

    s = Searcher(engine_ix, weighting=MyW())
    with oracle.searcher(weighting=RefW()) as os_:
        for myq, refq in [
            (Term("text", "alfa"), WTerm("text", "alfa")),
            (Or([Term("text", "bravo"), Term("text", "echo")]),
             WOr([WTerm("text", "bravo"), WTerm("text", "echo")])),
        ]:
            mine = [(int(d), float(sc)) for d, sc in s.search(myq, limit=None).pairs()]
            ref = [(int(h.docnum), float(h.score))
                   for h in os_.search(refq, limit=None)]
            assert mine == pytest.approx(ref)
            # pruned entry point agrees (falls back internally)
            topk = s.search_topk(myq, limit=7)
            assert [int(d) for d in topk.docids] == [d for d, _ in mine[:7]]


def test_weight_length_scorer_base(engine_ix, oracle):
    """A custom WeightLengthScorer (vectorized _score(weight, length))
    matches the reference's scalar WeightLengthScorer subclass."""
    from whoosh import scoring as w_scoring
    from whoosh.query import Term as WTerm

    class MyModel(my_scoring.WeightingModel):
        def scorer(self, searcher, fieldname, text, qf=1):
            return MyScorer()

    class MyScorer(my_scoring.WeightLengthScorer):
        def _score(self, weight, length):
            return weight / length

    class RefModel(w_scoring.WeightingModel):
        def scorer(self, searcher, fieldname, text, qf=1):
            sc = RefScorer.__new__(RefScorer)
            sc.setup(searcher, fieldname, text)
            return sc

    class RefScorer(w_scoring.WeightLengthScorer):
        def _score(self, weight, length):
            return weight / length

    s = Searcher(engine_ix, weighting=MyModel())
    with oracle.searcher(weighting=RefModel()) as os_:
        mine = [(int(d), float(sc))
                for d, sc in s.search(Term("text", "charlie"), limit=None).pairs()]
        ref = [(int(h.docnum), float(h.score))
               for h in os_.search(WTerm("text", "charlie"), limit=None)]
        assert [d for d, _ in mine] == [d for d, _ in ref]
        np.testing.assert_allclose([x for _, x in mine],
                                   [x for _, x in ref], rtol=1e-12)


def test_debug_model_log(engine_ix, oracle):
    """DebugModel logs (fieldname, text, docnum, weight, length) per
    scored posting (reference scoring.py:228-260); same multiset."""
    from whoosh import scoring as w_scoring
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WTerm

    dm, rdm = my_scoring.DebugModel(), w_scoring.DebugModel()
    s = Searcher(engine_ix, weighting=dm)
    with oracle.searcher(weighting=rdm) as os_:
        mine = [(int(d), float(sc)) for d, sc in
                s.search(Or([Term("text", "alfa"), Term("text", "delta")]),
                         limit=None).pairs()]
        ref = [(int(h.docnum), float(h.score)) for h in
               os_.search(WOr([WTerm("text", "alfa"),
                               WTerm("text", "delta")]), limit=None)]
        assert mine == pytest.approx(ref)
    # the reference logs the term as BYTES (its postings currency)
    ref_log = [(f, t.decode() if isinstance(t, bytes) else t, d, w, ln)
               for f, t, d, w, ln in rdm.log]
    assert sorted(dm.log) == sorted(ref_log)
