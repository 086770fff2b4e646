"""Conformance for spelling suggest, key terms, more-like-this,
highlighting — each vs the reference engine on the same corpus."""

import numpy as np
import pytest

from tests.conftest import load_whoosh_oracle
from tests.oracle import build_oracle_index
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher, Term
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=25, seed=11)


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("extras")
    (d / "src").mkdir()
    pq.write_table(corpus, str(d / "src" / "p.parquet"))
    build_index(str(d / "src"), str(d / "index"), transcripts_schema(),
                seg_size=64)
    return Searcher(str(d / "index"))


@pytest.fixture(scope="module")
def oracle(corpus):
    return build_oracle_index(corpus, text_fields=("text",),
                              id_fields=("role", "tool", "conv_id"))


def test_suggest_matches_oracle(engine, oracle):
    with oracle.searcher() as s:
        corr = s.corrector("text")
        for word in ["deplou", "rendor", "clustre", "novembur", "batch",
                     "erorr"]:
            for maxdist in [1, 2]:
                ref = corr.suggest(word, limit=5, maxdist=maxdist)
                mine = engine.suggest("text", word, limit=5, maxdist=maxdist)
                assert mine == ref, (word, maxdist, mine, ref)


def test_suggest_with_prefix(engine, oracle):
    with oracle.searcher() as s:
        corr = s.corrector("text")
        ref = corr.suggest("deplou", limit=5, maxdist=2, prefix=2)
        mine = engine.suggest("text", "deplou", limit=5, maxdist=2, prefix=2)
        assert mine == ref


def test_key_terms_matches_oracle(engine, oracle):
    with oracle.searcher() as s:
        for docnum in [0, 5, 17]:
            ref = s.key_terms([docnum], "text", numterms=5)
            mine = engine.key_terms([docnum], "text", numterms=5)
            assert [w for w, _ in mine] == [w for w, _ in ref]
            np.testing.assert_allclose([x for _, x in mine],
                                       [x for _, x in ref], rtol=1e-9)


def test_key_terms_from_text_matches_oracle(engine, oracle):
    text = "deploy the cluster and render the batch deploy deploy"
    with oracle.searcher() as s:
        ref = s.key_terms_from_text("text", text, numterms=4)
    mine = engine.key_terms_from_text("text", text, numterms=4)
    assert [w for w, _ in mine] == [w for w, _ in ref]
    np.testing.assert_allclose([x for _, x in mine], [x for _, x in ref],
                               rtol=1e-9)


def test_more_like_matches_oracle(engine, oracle):
    with oracle.searcher() as s:
        for docnum in [3, 21]:
            ref = [(h.docnum, h.score)
                   for h in s.more_like(docnum, "text", top=10)]
            mine = [(int(d), float(sc))
                    for d, sc in engine.more_like(docnum, "text", top=10).pairs()]
            assert [d for d, _ in mine] == [d for d, _ in ref]
            np.testing.assert_allclose([x for _, x in mine],
                                       [x for _, x in ref], rtol=1e-9)


def test_highlights_match_oracle(engine, oracle, corpus):
    from whoosh.query import Term as WTerm

    from whoosh_ray.search.highlight import Highlighter, HtmlFormatter

    with oracle.searcher() as s:
        r = s.search(WTerm("text", "deploy"), limit=5)
        hl = Highlighter(formatter=HtmlFormatter(tagname="b"))
        for hit in r:
            mine = hl.highlight(hit["text"], {"deploy"}, top=3)
            ref = hit.highlights("text", top=3)
            assert mine == ref, (hit.docnum, mine, ref)


def test_highlights_uppercase_whole(engine, oracle):
    from whoosh import highlight as wh
    from whoosh.query import Term as WTerm

    from whoosh_ray.search.highlight import (Highlighter, UppercaseFormatter,
                                             WholeFragmenter)

    with oracle.searcher() as s:
        r = s.search(WTerm("text", "render"), limit=5)
        r.fragmenter = wh.WholeFragmenter()
        r.formatter = wh.UppercaseFormatter()
        hl = Highlighter(fragmenter=WholeFragmenter(),
                         formatter=UppercaseFormatter())
        for hit in r:
            mine = hl.highlight(hit["text"], {"render"}, top=3)
            ref = hit.highlights("text", top=3)
            assert mine == ref, (hit.docnum, mine, ref)


def test_numeric_and_date_ranges_match_oracle(corpus, engine, tmp_path_factory):
    """NumericRange/DateRange via stored-column scan vs the reference's
    tiered-term NUMERIC machinery: same doc sets, same constant scores."""
    from whoosh.query import DateRange as WDateRange
    from whoosh.query import NumericRange as WNumericRange

    from tests.oracle import build_oracle_index, oracle_search
    from whoosh_ray.search.query import DateRange, NumericRange

    oix = build_oracle_index(corpus, text_fields=("text",),
                             id_fields=("role",),
                             numeric_fields=("turn_idx",),
                             datetime_fields=("ts",))
    cases = [
        (NumericRange("turn_idx", 2, 5), WNumericRange("turn_idx", 2, 5)),
        (NumericRange("turn_idx", 2, 5, startexcl=True, endexcl=True),
         WNumericRange("turn_idx", 2, 5, startexcl=True, endexcl=True)),
        (NumericRange("turn_idx", None, 1), WNumericRange("turn_idx", None, 1)),
        (NumericRange("turn_idx", 9, None), WNumericRange("turn_idx", 9, None)),
    ]
    import datetime as dt

    lo = dt.datetime(2023, 11, 15)
    hi = dt.datetime(2023, 11, 16, 12)
    cases.append((DateRange("ts", lo, hi), WDateRange("ts", lo, hi)))
    for myq, refq in cases:
        ref = oracle_search(oix, refq, limit=None)
        mine = [(int(d), float(s)) for d, s in engine.search(myq, limit=None).pairs()]
        assert [d for d, _ in mine] == [d for d, _ in ref], refq
        np.testing.assert_allclose([s for _, s in mine],
                                   [s for _, s in ref])


def test_regex_and_sequence_match_oracle(engine, oracle):
    from tests.oracle import oracle_search
    from whoosh.query import Regex as WRegex
    from whoosh.query import Sequence as WSequence
    from whoosh.query import Term as WTerm

    from whoosh_ray.search.query import Regex, Sequence, Term

    cases = [
        (Regex("text", "ren.*er"), WRegex("text", "ren.*er")),
        (Regex("text", "^dep"), WRegex("text", "^dep")),
        (Regex("text", "clus|err"), WRegex("text", "clus|err")),
    ]
    for myq, refq in cases:
        mine = [(int(d), float(s)) for d, s in engine.search(myq, limit=None).pairs()]
        ref = [(int(d), float(s))
               for d, s in oracle_search(oracle, refq, limit=None)]
        assert [d for d, _ in mine] == [d for d, _ in ref], refq
        np.testing.assert_allclose([x for _, x in mine],
                                   [x for _, x in ref], rtol=1e-9)
    seq_cases = [
        (["deploy", "render"], 1),
        (["cluster", "error"], 2),
    ]
    for words, slop in seq_cases:
        myq = Sequence([Term("text", w) for w in words], slop=slop)
        refq = WSequence([WTerm("text", w) for w in words], slop=slop)
        mine = [(int(d), float(s)) for d, s in engine.search(myq, limit=None).pairs()]
        ref = [(int(d), float(s))
               for d, s in oracle_search(oracle, refq, limit=None)]
        assert [d for d, _ in mine] == [d for d, _ in ref], (words, slop)
        np.testing.assert_allclose([x for _, x in mine],
                                   [x for _, x in ref], rtol=1e-9)


def test_correct_query(engine):
    from whoosh_ray.search.query import And, Term

    q = And([Term("text", "deplou"), Term("text", "render")])
    c = engine.correct_query(q)
    assert [(t.fieldname, t.original) for t in c.tokens] == [("text",
                                                              "deplou")]
    assert c.string == ""  # no qstring given
    r = engine.search(c.query, limit=5)
    assert len(r) > 0


def test_sentence_fragmenter_matches_oracle(engine, oracle):
    from whoosh import highlight as wh
    from whoosh.query import Term as WTerm

    from whoosh_ray.search.highlight import (Highlighter, SentenceFragmenter,
                                             UppercaseFormatter)

    # sentence-punctuated synthetic text driven through both fragmenters
    text = ("Deploy the cluster now. Render it later! What about the "
            "batch? Deploy again... and render. Nothing here.")
    hl = Highlighter(fragmenter=SentenceFragmenter(),
                     formatter=UppercaseFormatter())
    mine = hl.highlight(text, {"deploy", "render"}, top=3)
    whl = wh.Highlighter(fragmenter=wh.SentenceFragmenter(),
                         formatter=wh.UppercaseFormatter())
    from whoosh.analysis import StandardAnalyzer

    ref = whl.highlight_hit_manual if False else None
    # drive the reference pipeline manually (same API surface it uses)
    analyzer = StandardAnalyzer(stoplist=None, minsize=0)
    tokens = analyzer(text, positions=True, chars=True, mode="index",
                      removestops=False)
    tokens = wh.set_matched_filter(tokens, {"deploy", "render"})
    frags = wh.SentenceFragmenter().fragment_tokens(text, tokens)
    frags = wh.top_fragments(frags, 3, wh.BasicFragmentScorer(), wh.FIRST)
    ref = wh.UppercaseFormatter().format(frags)
    assert mine == ref


def test_matched_terms(engine, oracle):
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WTerm

    from whoosh_ray.search.query import Or, Term

    r = engine.search(Or([Term("text", "deploy"), Term("text", "absent"),
                          Term("text", "render")]), limit=10, terms=True)
    with oracle.searcher() as s:
        wr = s.search(WOr([WTerm("text", "deploy"), WTerm("text", "absent"),
                           WTerm("text", "render")]), limit=10, terms=True)
        ref_terms = {(f, t.decode()) for f, t in wr.matched_terms()}
        assert r.matched_terms() == ref_terms
        for hit in wr:
            mine_ht = r.matched_terms_for(hit.docnum)
            ref_ht = {(f, t.decode()) for f, t in hit.matched_terms()}
            assert mine_ht == ref_ht, hit.docnum


def test_time_limit_collector(engine):
    """TimeLimitCollector analogue: exceeding the budget raises
    TimeLimit carrying the partial results; a generous budget returns
    the same results as a plain search."""
    import time

    import pytest as _pytest

    from whoosh_ray.search import Term
    from whoosh_ray.search.searcher import TimeLimit

    full = engine.search(Term("text", "deploy"), limit=None)
    ok = engine.search_with_timelimit(Term("text", "deploy"), limit=None,
                                      timelimit=30.0)
    assert ok.docids.tolist() == full.docids.tolist()

    # force a timeout: make per-segment eval slow
    orig = type(engine).eval
    def slow_eval(self, q, seg):
        time.sleep(0.05)
        return orig(self, q, seg)
    type(engine).eval = slow_eval
    try:
        with _pytest.raises(TimeLimit) as ei:
            engine.search_with_timelimit(Term("text", "deploy"),
                                         limit=None, timelimit=0.06)
        partial = ei.value.partial
        assert 0 < len(partial.docids) < len(full.docids)
        assert set(partial.docids.tolist()) <= set(full.docids.tolist())
    finally:
        type(engine).eval = orig


def test_pinpoint_fragmenter_matches_oracle(engine, oracle):
    from whoosh import highlight as wh
    from whoosh.query import Term as WTerm

    from whoosh_ray.search.highlight import (Highlighter, PinpointFragmenter,
                                             UppercaseFormatter)

    for autotrim in (False, True):
        with oracle.searcher() as s:
            r = s.search(WTerm("text", "deploy"), limit=5)
            r.fragmenter = wh.PinpointFragmenter(maxchars=120, surround=15,
                                                 autotrim=autotrim)
            r.formatter = wh.UppercaseFormatter()
            hl = Highlighter(
                fragmenter=PinpointFragmenter(maxchars=120, surround=15,
                                              autotrim=autotrim),
                formatter=UppercaseFormatter())
            for hit in r:
                mine = hl.highlight(hit["text"], {"deploy"}, top=3)
                ref = hit.highlights("text", top=3)
                assert mine == ref, (autotrim, hit.docnum, mine, ref)


def test_results_combination_vs_oracle(engine, oracle):
    """extend/filter/upgrade/upgrade_and_extend order-parity with the
    reference Results (searching.py:1275-1345), incl. the empty-other
    no-ops."""
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WT

    from whoosh_ray.search import Or, Term

    qa = Or([Term("text", "deploy"), Term("text", "cluster")])
    qb = Or([Term("text", "cluster"), Term("text", "error")])
    wqa = WOr([WT("text", "deploy"), WT("text", "cluster")])
    wqb = WOr([WT("text", "cluster"), WT("text", "error")])
    qnone = Term("text", "zzzznope")
    wqnone = WT("text", "zzzznope")

    ops = [("extend", ()), ("filter", ()), ("upgrade", ()),
           ("upgrade", (True,)), ("upgrade_and_extend", ())]
    with oracle.searcher() as ws:
        for op, args in ops:
            for q2, wq2 in [(qb, wqb), (qnone, wqnone)]:
                mine = engine.search(qa, limit=20)
                theirs = ws.search(wqa, limit=20)
                getattr(mine, op)(engine.search(q2, limit=20), *args)
                getattr(theirs, op)(ws.search(wq2, limit=20), *args)
                assert mine.docids.tolist() == \
                    [h.docnum for h in theirs], (op, args)


def test_reader_stats_and_document_lookup_vs_oracle(engine, oracle):
    """most_frequent_terms / most_distinctive_terms (value + order incl.
    nlargest tie-breaks), doc_count, and the document()/documents()
    keyword lookups match the reference reader (reading.py:551-569,
    searching.py:336-376)."""
    with oracle.reader() as wr:
        for prefix in ("", "d", "re"):
            for number in (5, 12):
                dec = lambda t: (t.decode() if isinstance(t, bytes)
                                 else t)  # noqa: E731 — reader yields btext
                mf = engine.most_frequent_terms("text", number, prefix)
                wmf = wr.most_frequent_terms("text", number, prefix)
                assert [t for _, t in mf] == [dec(t) for _, t in wmf]
                np.testing.assert_allclose([w for w, _ in mf],
                                           [w for w, _ in wmf])
                md = engine.most_distinctive_terms("text", number, prefix)
                wmd = wr.most_distinctive_terms("text", number, prefix)
                assert [t for _, t in md] == [dec(t) for _, t in wmd]
                np.testing.assert_allclose([w for w, _ in md],
                                           [w for w, _ in wmd],
                                           rtol=1e-12)
        assert engine.doc_count() == wr.doc_count()

    with oracle.searcher() as ws:
        mine = engine.document(conv_id="conv000003", role="user")
        theirs = ws.document(conv_id="conv000003", role="user")
        assert mine["text"] == theirs["text"]
        assert engine.document(conv_id="nope") is None \
            and ws.document(conv_id="nope") is None
        n_mine = sum(1 for _ in engine.documents(role="tool"))
        n_theirs = sum(1 for _ in ws.documents(role="tool"))
        assert n_mine == n_theirs > 0
        assert (sum(1 for _ in engine.documents())
                == engine.doc_count()
                == sum(1 for _ in ws.documents()))


def test_hit_objects_vs_oracle(engine, oracle):
    """results[n] / hits(): dict-style stored access, rank/score
    metadata, per-hit highlights and matched_terms parity with the
    reference Hit (searching.py:1348-1440)."""
    from whoosh.query import Term as WT

    from whoosh_ray.search import Term

    q, wq = Term("text", "deploy"), WT("text", "deploy")
    with oracle.searcher() as ws:
        mine = engine.search(q, limit=5, terms=True)
        theirs = ws.search(wq, limit=5, terms=True)
        assert len(mine[:3]) == 3 and mine[-1].docid == mine[4].docid
        for h, wh in zip(mine.hits(), theirs):
            assert h.docid == wh.docnum and h.rank == wh.rank
            np.testing.assert_allclose(h.score, wh.score, rtol=1e-12)
            assert h["text"] == wh["text"] and "role" in h
            assert h.get("nope", "x") == "x"
            # our schema stores extra passthrough columns the
            # oracle fixture doesn't declare
            assert set(wh.fields().keys()) <= set(h.keys())
            assert h.matched_terms() == {
                (f, t.decode()) for f, t in wh.matched_terms()}
            assert h.highlights("text") == wh.highlights("text")
        kt = mine.key_terms("text", docs=5, numterms=3)
        wkt = theirs.key_terms("text", docs=5, numterms=3)
        assert [t for t in kt] == [t for t, _ in wkt] or kt == wkt


def test_list_corrector_parity():
    """ListCorrector matches the reference exactly whenever the
    reference's sorted-list skipper bug doesn't bite (its first-word
    drop is a pinned divergence), and MultiCorrector's reference
    implementation crashes as shipped."""
    from whoosh.spelling import ListCorrector as RefLC
    from whoosh.spelling import MultiCorrector as RefMC

    from whoosh_ray.functions.spelling import ListCorrector, MultiCorrector

    # pad the list head so the acceptance set never touches data[0]
    words = sorted(["aaaa", "apple", "ample", "apply", "appel", "maple",
                    "napped", "nap", "apples", "bapple", "zzz"])
    ref, mine = RefLC(words), ListCorrector(words)
    for text, kw in [("apple", dict(limit=10, maxdist=2)),
                     ("apple", dict(limit=10, maxdist=2, prefix=1)),
                     ("aple", dict(limit=3, maxdist=1)),
                     ("napp", dict(limit=5, maxdist=1)),
                     ("zzz", dict(limit=5, maxdist=1))]:
        assert mine.suggest(text, **kw) == ref.suggest(text, **kw), text

    # the pinned divergence: the reference DROPS the list's first word
    # from the acceptance set ('ample' never suggested for 'apple')
    bug = sorted(["apple", "ample", "apply"])
    assert RefLC(bug).suggest("apple", maxdist=1) == ["apple", "apply"]
    assert ListCorrector(bug).suggest("apple", maxdist=1) == [
        "ample", "apple", "apply"]

    # reference MultiCorrector: broken as shipped ((word, score) pairs
    # into a (score, word) pipeline) — TypeError on any result
    import pytest as _pytest

    with _pytest.raises(TypeError):
        RefMC([RefLC(words)], max).suggest("apple")
    got = MultiCorrector([ListCorrector(words),
                          ListCorrector(sorted(["appla"]))],
                         max).suggest("apple", limit=10, maxdist=2)
    assert "appla" in got and "apple" in got


def test_reader_corrector_facade(engine):
    from whoosh_ray.functions.spelling import ReaderCorrector

    rc = ReaderCorrector(engine, "text")
    assert rc.suggest("deploi", maxdist=2) == engine.suggest(
        "text", "deploi", maxdist=2)


def test_wrapping_query_and_results_accessors(engine):
    """WrappingQuery subclassing plug-point + the small Results
    accessor surface (docs/copy/fields/has_exact_length...)."""
    import numpy as np

    from whoosh_ray.search import NullQuery, Term, WrappingQuery

    class Doubled(WrappingQuery):
        def docs_scores(self, searcher, seg):
            ids, scores = searcher.eval(self.child, seg)
            return ids, scores * 2.0

    base = engine.search(Term("text", "deploy"), limit=None)
    wrapped = engine.search(Doubled(Term("text", "deploy")), limit=None)
    np.testing.assert_array_equal(base.docids, wrapped.docids)
    np.testing.assert_allclose(wrapped.scores, base.scores * 2.0)
    # passthrough subclass matches exactly
    plain = engine.search(WrappingQuery(Term("text", "deploy")),
                          limit=None)
    np.testing.assert_array_equal(plain.docids, base.docids)
    np.testing.assert_allclose(plain.scores, base.scores)
    # normalize unwraps to Null when the child nullifies
    from whoosh_ray.search.query import _NullQuery
    assert isinstance(WrappingQuery(_NullQuery()).normalize(), _NullQuery)
    assert len(engine.search(NullQuery, limit=None)) == 0

    # Results accessors
    assert base.docs() == set(base.docids.tolist())
    assert base.has_exact_length() and base.estimated_length() == len(base)
    assert not base.has_matched_terms()
    c = base.copy()
    assert c.docs() == base.docs() and c is not base
    assert base.fields(0) == base[0].fields()
    assert base.score(0) == float(base.scores[0])


def test_highlight_edge_matrix():
    """Module-level highlight() vs the reference across fragmenter x
    formatter x edge-case texts (empty, unicode, boundary terms,
    repeats, no-match) — string identity."""
    from whoosh import highlight as WH
    from whoosh.analysis import StandardAnalyzer

    from whoosh_ray.search import highlight as MH

    ana = StandardAnalyzer(stoplist=None, minsize=1)
    cases = [
        ("the quick brown fox", ["quick", "fox"]),
        ("", ["x"]),
        ("fox fox fox fox", ["fox"]),
        ("edge term at end", ["end"]),
        ("start is matched", ["start"]),
        ("ünïcode tëst ünïcode", ["ünïcode"]),
        ("a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4,
         ["q", "z"]),
        ("punctuation, matters! right? yes.", ["matters", "yes"]),
        ("no matches here at all", ["zebra"]),
        ("OverLapping overlapping OVERLAPPING", ["overlapping"]),
    ]
    for frag in ["WholeFragmenter", "ContextFragmenter",
                 "SentenceFragmenter"]:
        for fmt in ["UppercaseFormatter", "HtmlFormatter"]:
            for text, terms in cases:
                ref = WH.highlight(text, frozenset(terms), ana,
                                   getattr(WH, frag)(),
                                   getattr(WH, fmt)(), top=3)
                mine = MH.highlight(text, terms,
                                    fragmenter=getattr(MH, frag)(),
                                    formatter=getattr(MH, fmt)(), top=3)
                assert str(ref) == str(mine), (frag, fmt, text, terms)


def test_correct_query_phrases(engine):
    """Phrase words correct individually, like the reference's token
    correction inside quotes."""
    from whoosh_ray.search.qparser import QueryParser
    from whoosh_ray.search.query import Phrase
    from whoosh_ray.state.schema import transcripts_schema

    p = QueryParser("text", transcripts_schema())
    qs = '"deploi rendor"'
    c = engine.correct_query(p.parse(qs), qs)
    assert isinstance(c.query, Phrase)
    assert c.query.words == ["deploy", "render"]
    assert [(t.original, t.text) for t in c.tokens] == [
        ("deploi", "deploy"), ("rendor", "render")]
    assert c.string == '"deploy render"'


def test_null_formatter_matches_reference(engine, oracle):
    from whoosh_ray.search.highlight import Highlighter, NullFormatter

    import whoosh.highlight as wh
    from whoosh.query import Term as WTerm

    with oracle.searcher() as s:
        r = s.search(WTerm("text", "deploy"), limit=3)
        r.formatter = wh.NullFormatter()
        refs = [hit.highlights("text", top=2) for hit in r]
        docnums = [hit.docnum for hit in r]
    hl = Highlighter(formatter=NullFormatter())
    for docnum, ref in zip(docnums, refs):
        text = engine.stored(np.array([docnum]),
                             columns=["text"])["text"][0].as_py()
        mine = hl.highlight(text, {"deploy"}, top=2)
        assert mine == ref, docnum


def test_genshi_formatter_event_stream_parity(monkeypatch, whoosh_oracle):
    """GenshiFormatter facade (reference highlight.py:821-875): the
    constructor imports genshi (ImportError when absent — not in this
    container); with a stand-in genshi.core injected, the event stream
    is compared event-for-event against the reference formatter,
    INCLUDING the reference's shipped bug of appending the raw
    (text, token, replace) 3-tuple for every matched token."""
    import sys
    import types

    from whoosh_ray.search.highlight import (ContextFragmenter,
                                             GenshiFormatter,
                                             merge_matched, set_matched,
                                             tokenize_chars, top_fragments)

    # genshi is absent: the facade must raise ImportError like the
    # reference would
    assert "genshi" not in sys.modules
    with pytest.raises(ImportError):
        GenshiFormatter()

    core = types.ModuleType("genshi.core")
    core.START, core.END, core.TEXT = "START", "END", "TEXT"

    class Attrs(tuple):
        def __new__(cls, items=()):
            return super().__new__(cls, tuple(items))

    class Stream:
        def __init__(self, events):
            self.events = list(events)

        def __iter__(self):
            return iter(self.events)

    core.Attrs, core.Stream = Attrs, Stream
    pkg = types.ModuleType("genshi")
    pkg.core = core
    monkeypatch.setitem(sys.modules, "genshi", pkg)
    monkeypatch.setitem(sys.modules, "genshi.core", core)

    import whoosh.highlight as wh
    from whoosh.analysis import StandardAnalyzer

    text = ("deploy the render cluster then deploy again and render "
            "the batch deploy")
    terms = {"deploy", "render"}

    # reference side: manual pipeline (same as its Highlighter drives)
    analyzer = StandardAnalyzer(stoplist=None, minsize=0)
    tokens = analyzer(text, positions=True, chars=True, mode="index",
                      removestops=False)
    tokens = wh.set_matched_filter(tokens, terms)
    rfrags = wh.ContextFragmenter().fragment_tokens(text, tokens)
    rfrags = wh.top_fragments(rfrags, 3, wh.BasicFragmentScorer(), wh.FIRST)
    ref = wh.GenshiFormatter(qname="b", between="|").format(rfrags)

    # our side (same steps Highlighter.highlight runs)
    mtoks = merge_matched(set_matched(tokenize_chars(text), terms))
    frags = ContextFragmenter().fragment_tokens(text, mtoks)
    frags = top_fragments(frags, 3)
    mine = GenshiFormatter(qname="b", between="|").format(frags)

    def norm(ev):
        if ev[0] in ("START", "END", "TEXT"):
            return (ev[0], ev[1], ev[2])
        # the pinned bug tuple: (fragment text, Token, replace)
        t = ev[1]
        return ("BUGTUPLE", ev[0], t.startchar, t.endchar, ev[2])

    got, want = [norm(e) for e in mine], [norm(e) for e in ref]
    assert got == want
    # sanity: the bug tuples are really in there
    assert any(e[0] == "BUGTUPLE" for e in want)


def test_results_highlighter_properties(engine, oracle):
    """Results.fragmenter/formatter/scorer/order mutate the shared
    per-Results highlighter and drive every Hit.highlights (reference
    searching.py:961,1216-1245); items() yields (docnum, score) in rank
    order (searching.py:1024-1029)."""
    from whoosh import highlight as wh
    from whoosh.query import Term as WT

    from whoosh_ray.search.highlight import (UppercaseFormatter,
                                             WholeFragmenter)

    q, wq = Term("text", "render"), WT("text", "render")
    with oracle.searcher() as s:
        mine = engine.search(q, limit=5)
        theirs = s.search(wq, limit=5)
        # default config parity first (ContextFragmenter + <b class=...>)
        for h, w in zip(mine.hits(), theirs):
            assert h.highlights("text", top=2) == w.highlights("text", top=2)
        # mutate via the properties: later hits see the change
        mine.fragmenter = WholeFragmenter()
        mine.formatter = UppercaseFormatter()
        theirs.fragmenter = wh.WholeFragmenter()
        theirs.formatter = wh.UppercaseFormatter()
        assert mine.fragmenter is mine.highlighter.fragmenter
        assert mine.formatter is mine.highlighter.formatter
        for h, w in zip(mine.hits(), theirs):
            assert h.highlights("text", top=3) == w.highlights("text", top=3)
        ref_items = [(w.docnum, w.score) for w in theirs]
        got_items = list(mine.items())
        assert [d for d, _ in got_items] == [d for d, _ in ref_items]
        np.testing.assert_allclose([sc for _, sc in got_items],
                                   [sc for _, sc in ref_items], rtol=1e-12)


def test_hit_highlights_expands_multiterm(engine, oracle):
    """Without terms=True, Hit.highlights derives its word set from the
    EXPANDED query (Prefix resolved against the reader — reference
    highlight.py:1007 query_terms(expand=True))."""
    from whoosh.query import Prefix as WPrefix

    from whoosh_ray.search.query import Prefix

    with oracle.searcher() as s:
        mine = engine.search(Prefix("text", "dep"), limit=5)
        theirs = s.search(WPrefix("text", "dep"), limit=5)
        assert [h.docid for h in mine.hits()] == [w.docnum for w in theirs]
        for h, w in zip(mine.hits(), theirs):
            got, want = h.highlights("text"), w.highlights("text")
            assert got == want, (h.docid, got, want)
        # the expansion really matched something (else this tests nothing)
        assert any(h.highlights("text") for h in mine.hits())


def test_strict_phrase_highlights_match_reference(engine, oracle):
    """strict_phrase=True highlights phrase constituents only where the
    whole phrase matches (reference highlight.py:176-259,1043-1045),
    individual terms everywhere; order constants (SCORE/FIRST) drive
    fragment ordering via results.order."""
    from whoosh import highlight as wh
    from whoosh.qparser import QueryParser

    from whoosh_ray.search import highlight as myh
    from whoosh_ray.search.qparser import QueryParser as MyParser

    load_oracle_schema = oracle.schema
    wq = QueryParser("text", load_oracle_schema).parse('"the deploy" OR render')
    mq = MyParser("text", engine.schema).parse('"the deploy" OR render')
    with oracle.searcher() as s:
        mine = engine.search(mq, limit=8)
        theirs = s.search(wq, limit=8)
        assert [h.docid for h in mine.hits()] == [w.docnum for w in theirs]
        for strict in (False, True):
            for h, w in zip(mine.hits(), theirs):
                got = h.highlights("text", strict_phrase=strict)
                want = w.highlights("text", strict_phrase=strict)
                assert got == want, (strict, h.docid, got, want)
        # order constants parity
        mine.order = myh.SCORE
        theirs.order = wh.SCORE
        for h, w in zip(mine.hits(), theirs):
            assert h.highlights("text") == w.highlights("text")
        # outputs differ between strict and non-strict somewhere
        assert any(
            h.highlights("text", strict_phrase=True)
            != h.highlights("text", strict_phrase=False)
            for h in mine.hits())


def test_highlight_module_public_names():
    """Public helpers the reference exports (highlight.py): order
    constants, scorer classes, mkfrag/get_text, NullFragmeter alias,
    Fragmenter base."""
    from whoosh import highlight as wh

    from whoosh_ray.search import highlight as myh

    f = myh.Fragment("hello world", [], 0, 5)
    assert myh.LONGER(f) == wh.LONGER(f) == -5
    assert myh.SHORTER(f) == wh.SHORTER(f) == 5
    assert myh.SCORE(f) == wh.SCORE(f) == 1
    assert myh.FIRST(f) == wh.FIRST(f) == 0
    assert myh.NullFragmeter is myh.WholeFragmenter
    assert myh.BasicFragmentScorer()(f) == myh.basic_fragment_scorer(f)
    assert isinstance(myh.BasicFragmentScorer(), myh.FragmentScorer)
    tok = myh.Token("deploy", 2, 8)
    assert myh.get_text("x deploy y", tok, False) == "deploy"
    assert myh.get_text("x deploy y", tok, True) == "deploy"
    assert myh.mkfrag is myh._mkfrag
    assert myh.Fragmenter().must_retokenize()


def test_correct_query_string_matches_reference(engine, oracle):
    """Correction.query/.string/.format_string parity with the
    reference on shared-corpus misspellings (searching.py:820-931 +
    spelling.py:178-344): parser-recorded char spans splice the
    corrected words back into the user's string."""
    from whoosh import highlight as wh
    from whoosh.qparser import QueryParser as WQP

    from whoosh_ray.search import highlight as myh
    from whoosh_ray.search.qparser import QueryParser as MyQP

    myp = MyQP("text", engine.schema)
    with oracle.searcher() as s:
        wp = WQP("text", oracle.schema)
        for qs in ['deplou AND rendor', 'mary "deploi rendor"',
                   'text:deploi extra', 'clustre^2 deploy',
                   '(deplou OR rendor) batch', 'NOT deplou render']:
            mc = engine.correct_query(myp.parse(qs), qs)
            rc = s.correct_query(wp.parse(qs), qs)
            assert mc.string == rc.string, (qs, mc.string, rc.string)
            assert repr(mc.query.normalize()) != ""  # well-formed
            got = mc.format_string(myh.UppercaseFormatter())
            want = rc.format_string(wh.UppercaseFormatter())
            assert got == want, (qs, got, want)
            got_html = mc.format_string(myh.HtmlFormatter(classname="change"))
            want_html = rc.format_string(wh.HtmlFormatter(classname="change"))
            assert got_html == want_html, (qs, got_html, want_html)
            # corrected tokens carry (original, corrected, span) parity
            assert ([(t.fieldname, t.original, t.text, t.startchar,
                      t.endchar) for t in mc.tokens]
                    == [(t.fieldname, t.original, t.text, t.startchar,
                         t.endchar) for t in rc.tokens]), qs


def test_set_matched_filter_phrases_slop_parity():
    """Direct parity of the strict-phrase marker vs the reference
    function, including the sloppy reversed-window probe
    (highlight.py:176-259): 'one two two six three'~2 matches because
    the LAST in-window 'two' is taken."""
    from types import SimpleNamespace

    load_whoosh_oracle()
    from whoosh.highlight import (
        set_matched_filter_phrases as ref_fn)

    from whoosh_ray.search.highlight import (Token, tokenize_chars,
                                             set_matched_filter_phrases)

    class RefTok(SimpleNamespace):
        pass

    cases = [
        # (text, terms, [(words, slop)])
        ("one two two six three end", set(), [(["one", "two", "three"], 2)]),
        ("one two six six three", set(), [(["one", "two", "three"], 2)]),
        ("alpha beta gamma beta alpha", {"gamma"}, [(["alpha", "beta"], 1)]),
        ("a b c a b c", set(), [(["a", "b", "c"], 1)]),
        ("x one two three y one three", {"y"},
         [(["one", "two", "three"], 1)]),
        ("repeat repeat repeat", set(), [(["repeat", "repeat"], 1)]),
    ]
    for text, terms, phrases in cases:
        words = text.split()
        my_phr = [SimpleNamespace(words=w, slop=s) for w, s in phrases]
        my_toks = tokenize_chars(text)
        mine = [t.matched for t in set_matched_filter_phrases(
            my_toks, text, terms, my_phr)]
        ref_toks = [RefTok(text=w, matched=False) for w in words]
        ref_terms = [SimpleNamespace(text=t) for t in terms]
        want = [t.matched for t in ref_fn(iter(ref_toks), text, ref_terms,
                                          my_phr)]
        assert mine == want, (text, terms, phrases, mine, want)


def test_correct_query_random_sweep(engine, oracle):
    """Seeded random misspelled query strings: corrected string parity
    with the reference across word/phrase/field/boost shapes."""
    import random

    from whoosh.qparser import QueryParser as WQP

    from whoosh_ray.search.qparser import QueryParser as MyQP

    rng = random.Random(1234)
    words = ["deploy", "render", "cluster", "batch", "error", "metric",
             "november", "throughput"]

    def misspell(w):
        i = rng.randrange(len(w))
        op = rng.choice(["swap", "drop", "dup"])
        if op == "swap":
            return w[:i] + rng.choice("abcdefgh") + w[i + 1:]
        if op == "drop" and len(w) > 3:
            return w[:i] + w[i + 1:]
        return w[:i] + w[i] + w[i:]

    myp = MyQP("text", engine.schema)
    with oracle.searcher() as s:
        wp = WQP("text", oracle.schema)
        for _ in range(30):
            parts = []
            for _ in range(rng.randrange(1, 4)):
                w = rng.choice(words)
                w = misspell(w) if rng.random() < 0.7 else w
                if rng.random() < 0.25:
                    w2 = rng.choice(words)
                    parts.append(f'"{w} {w2}"')
                elif rng.random() < 0.2:
                    parts.append(f"{w}^2")
                else:
                    parts.append(w)
                if rng.random() < 0.2:
                    parts.append(rng.choice(["AND", "OR"]))
            qs = " ".join(p for p in parts if p not in
                          ("AND", "OR")) if parts and parts[-1] in (
                              "AND", "OR") else " ".join(parts)
            if not qs.strip():
                continue
            mc = engine.correct_query(myp.parse(qs), qs)
            rc = s.correct_query(wp.parse(qs), qs)
            assert mc.string == rc.string, (qs, mc.string, rc.string)


def test_collapse_matches_reference(engine, oracle):
    """search(collapse=, collapse_limit=, collapse_order=) — the
    CollapseCollector semantics (collectors.py:850-1004): per-key
    survivor selection incl. the arrival-order eviction rule, falsy
    keys exempt, and collapsed_counts counting only docs rejected on
    arrival (evictions are uncounted — reference quirk)."""
    from whoosh import sorting as wsort
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WT

    from whoosh_ray.search.facets import FieldFacet
    from whoosh_ray.search.query import Or

    myq = Or([Term("text", "deploy"), Term("text", "render")])
    wq = WOr([WT("text", "deploy"), WT("text", "render")])
    with oracle.searcher() as s:
        for climit in (1, 2, 3):
            for order, worder in [
                (None, None),
                (FieldFacet("conv_id"), wsort.FieldFacet("conv_id")),
                (FieldFacet("conv_id", reverse=True),
                 wsort.FieldFacet("conv_id", reverse=True)),
            ]:
                unlimited = engine.search(myq, limit=None,
                                          collapse=FieldFacet("role"),
                                          collapse_limit=climit,
                                          collapse_order=order)
                for limtop in (None, 5):
                    mine = engine.search(myq, limit=limtop,
                                         collapse=FieldFacet("role"),
                                         collapse_limit=climit,
                                         collapse_order=order)
                    # our limited search is ALWAYS the unlimited-ranking
                    # prefix (the same deliberate divergence as the
                    # limited DJM/AndNot paths: reference score-pruning
                    # can hide docs from the collapse buckets and change
                    # survivor sets under limit + a reverse order facet)
                    k = len(mine.docids)
                    assert [int(d) for d in mine.docids] == [
                        int(d) for d in unlimited.docids[:k]]
                    if limtop is not None and order is not None and \
                            getattr(order, "reverse", False):
                        continue  # reference pruning divergence (above)
                    c = s.collector(limit=limtop,
                                    collapse=wsort.FieldFacet("role"),
                                    collapse_limit=climit,
                                    collapse_order=worder)
                    s.search_with_collector(wq, c)
                    ref = c.results()
                    got = [(int(d), round(float(sc), 9)) for d, sc in mine.pairs()]
                    want = [(h.docnum, round(h.score, 9)) for h in ref]
                    assert got == want, (climit, worder, limtop)
                    cc = c
                    while not hasattr(cc, "collapsed_counts"):
                        cc = cc.child
                    assert dict(mine.collapsed_counts) == dict(
                        cc.collapsed_counts), (climit, worder, limtop)
                    assert mine.collapsed_total == sum(
                        cc.collapsed_counts.values())


def test_unscored_search_matches_reference(engine, oracle):
    """search(scored=False): matching (docid) order, score None, and
    the limit is IGNORED (reference UnsortedCollector quirk);
    optimize= is accepted."""
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WT

    from whoosh_ray.search.query import Or

    myq = Or([Term("text", "deploy"), Term("text", "render")])
    wq = WOr([WT("text", "deploy"), WT("text", "render")])
    with oracle.searcher() as s:
        for limtop in (None, 3):
            mine = engine.search(myq, limit=limtop, scored=False)
            ref = s.search(wq, limit=limtop, scored=False)
            assert [(d, sc) for d, sc in mine.pairs()] == [
                (h.docnum, h.score) for h in ref], limtop
            assert mine.score(0) is None and mine[0].score is None
            assert list(mine.items())[0][1] is None
        # optimize kwarg accepted; scored results unchanged
        a = engine.search(myq, limit=5, optimize=False)
        b = engine.search(myq, limit=5)
        assert [int(d) for d in a.docids] == [int(d) for d in b.docids]


def test_fuzz_strict_phrase_marker():
    """Hypothesis sweep of set_matched_filter_phrases vs the reference
    on random word streams and random phrases (exact skip/evict/slop
    behavior, excluding the reference's 1-word-sloppy hang)."""
    from types import SimpleNamespace

    from hypothesis import given, settings
    from hypothesis import strategies as st

    load_whoosh_oracle()
    from whoosh.highlight import set_matched_filter_phrases as ref_fn

    from whoosh_ray.search.highlight import (set_matched_filter_phrases,
                                             tokenize_chars)

    words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])

    @settings(max_examples=120, deadline=None, derandomize=True)
    @given(
        text_words=st.lists(words, min_size=1, max_size=12),
        phrase_words=st.lists(words, min_size=2, max_size=4),
        slop=st.integers(min_value=1, max_value=3),
        terms=st.sets(words, max_size=2),
    )
    def check(text_words, phrase_words, slop, terms):
        text = " ".join(text_words)
        phr = [SimpleNamespace(words=phrase_words, slop=slop)]
        mine = [t.matched for t in set_matched_filter_phrases(
            tokenize_chars(text), text, terms, phr)]
        ref_toks = [SimpleNamespace(text=w, matched=False)
                    for w in text_words]
        ref_terms = [SimpleNamespace(text=t) for t in terms]
        want = [t.matched for t in ref_fn(iter(ref_toks), text,
                                          ref_terms, phr)]
        assert mine == want, (text, phrase_words, slop, terms)

    check()


def test_query_expanded_terms_and_needs_spans(engine, oracle):
    """Per-node expanded_terms (qcore.py:335 + MultiTerm override) and
    needs_spans (qcore.py:233, spans.py:284) vs the reference on the
    same corpus."""
    load_whoosh_oracle()
    from whoosh import query as wq

    from whoosh_ray.search.query import And, Or, Prefix, Term
    from whoosh_ray.search.spans import SpanFirst, SpanNear

    r = engine.reader()
    with oracle.searcher() as s:
        rr = s.reader()

        def ref_expand(q):
            return sorted((f, t.decode() if isinstance(t, bytes) else t)
                          for f, t in q.expanded_terms(rr))

        # literal leaf passes through even when it doesn't exist
        assert (sorted(Term("text", "zzznope").expanded_terms(r))
                == ref_expand(wq.Term("text", "zzznope"))
                == [("text", "zzznope")])
        # pattern leaf expands against the reader
        assert (sorted(Prefix("text", "de").expanded_terms(r))
                == ref_expand(wq.Prefix("text", "de")))
        # compound yields nothing per-node
        q = And([Term("text", "deploy"), Term("text", "render")])
        wqq = wq.And([wq.Term("text", "deploy"), wq.Term("text", "render")])
        assert list(q.expanded_terms(r)) == ref_expand(wqq) == []

    t = Term("text", "deploy")
    assert not t.needs_spans()
    assert not And([t, Or([t, t])]).needs_spans()
    assert SpanFirst(t).needs_spans()
    assert And([t, SpanNear(t, Term("text", "render"))]).needs_spans()
    # reference agrees
    assert not wq.And([wq.Term("text", "a"), wq.Term("text", "b")]).needs_spans()
    assert wq.SpanFirst(wq.Term("text", "a")).needs_spans()
    # parser-surface attrs exist with reference defaults
    assert t.error is None and Term.startchar is None


def test_highlighter_can_load_chars_and_highlight_hit(corpus, engine,
                                                      tmp_path_factory):
    """Highlighter.can_load_chars gates (highlight.py:920-937) and
    highlight_hit == Hit.highlights with this highlighter's config."""
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.build import build_index
    from whoosh_ray.search import Searcher, Term
    from whoosh_ray.search.highlight import (ContextFragmenter,
                                             Highlighter,
                                             PinpointFragmenter,
                                             UppercaseFormatter)
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    d = tmp_path_factory.mktemp("hlchars")
    (d / "src").mkdir()
    pq.write_table(corpus, str(d / "src" / "p.parquet"))
    schema = IndexSchema(
        fields=(FieldSpec.text("text", stored=True, positions=True,
                               chars=True),
                FieldSpec.id("role", stored=True),
                FieldSpec.id("tool", stored=True),
                FieldSpec.id("conv_id", stored=True)),
        stored_columns=("turn_idx", "ts"))
    build_index(str(d / "src"), str(d / "index"), schema, seg_size=64)
    s = Searcher(str(d / "index"))

    res = s.search(Term("text", "deploy"), limit=3, terms=True)
    hi_pin = Highlighter(fragmenter=PinpointFragmenter(),
                         formatter=UppercaseFormatter())
    hi_ctx = Highlighter(fragmenter=ContextFragmenter(),
                         formatter=UppercaseFormatter())

    # chars field + pinpoint + matched terms -> loadable
    assert hi_pin.can_load_chars(res, "text")
    # context fragmenter must retokenize
    assert not hi_ctx.can_load_chars(res, "text")
    # forced retokenize wins
    assert not Highlighter(fragmenter=PinpointFragmenter(),
                           always_retokenize=True).can_load_chars(res, "text")
    # no matched terms recorded -> not loadable
    res_nt = s.search(Term("text", "deploy"), limit=3)
    assert not hi_pin.can_load_chars(res_nt, "text")
    # unknown / chars-less field -> not loadable
    assert not hi_pin.can_load_chars(res, "role")
    assert not hi_pin.can_load_chars(res, "bogus")

    hit = res[0]
    got = hi_ctx.highlight_hit(hit, "text")
    want = hit.highlights("text", fragmenter=hi_ctx.fragmenter,
                          formatter=hi_ctx.formatter,
                          scorer=hi_ctx.scorer, order=hi_ctx.order)
    assert got == want and "DEPLOY" in got
