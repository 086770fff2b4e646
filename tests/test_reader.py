"""Searcher.reader() — the reference IndexReader surface — conformance
vs the reference engine's own reader on the same corpus (term dictionary
iteration with TermInfo stats, per-doc lengths, stored-field iteration,
spelling, deletions)."""

import numpy as np
import pytest

from tests.oracle import build_oracle_index
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher, Term, TermNotFound
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=25, seed=19)


@pytest.fixture(scope="module")
def built_dir(corpus, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("reader")
    (d / "src").mkdir()
    pq.write_table(corpus, str(d / "src" / "p.parquet"))
    build_index(str(d / "src"), str(d / "index"), transcripts_schema(),
                seg_size=64)
    return str(d / "index")


@pytest.fixture(scope="module")
def engine(built_dir):
    return Searcher(built_dir)


@pytest.fixture(scope="module")
def oracle(corpus):
    return build_oracle_index(corpus, text_fields=("text",),
                              id_fields=("role", "tool", "conv_id"))


def _dec(b):
    return b.decode("utf-8") if isinstance(b, bytes) else b


def test_all_terms_and_lexicon(engine, oracle):
    r = engine.reader()
    with oracle.searcher() as s:
        ref = [(f, _dec(t)) for f, t in s.reader().all_terms()]
        mine = list(r.all_terms())
        # the reference schema carries extra stored-only fields that
        # never index terms; the term sets must match exactly
        assert mine == ref
        assert list(r.lexicon("text")) == \
            [_dec(t) for t in s.reader().lexicon("text")]
        assert list(r.expand_prefix("text", "de")) == \
            [_dec(t) for t in s.reader().expand_prefix("text", "de")]


def test_iter_field_terminfo_parity(engine, oracle):
    r = engine.reader()
    with oracle.searcher() as s:
        ref = list(s.reader().iter_field("text"))
        mine = list(r.iter_field("text"))
        assert len(mine) == len(ref)
        for (mt, mi), (rt, ri) in zip(mine, ref):
            assert mt == _dec(rt)
            assert mi.doc_frequency() == ri.doc_frequency(), mt
            assert mi.weight() == ri.weight(), mt
            assert mi.min_length() == ri.min_length(), mt
            assert mi.max_length() == ri.max_length(), mt
            assert mi.max_weight() == ri.max_weight(), mt
            assert mi.min_id() == ri.min_id(), mt
            assert mi.max_id() == ri.max_id(), mt


def test_iter_prefix_and_contains(engine, oracle):
    r = engine.reader()
    with oracle.searcher() as s:
        ref = [( _dec(t), ti.doc_frequency())
               for t, ti in s.reader().iter_prefix("text", "re")]
        mine = [(t, ti.doc_frequency())
                for t, ti in r.iter_prefix("text", "re")]
        assert mine == ref
    assert ("text", "deploy") in r
    assert ("text", "zzzznope") not in r
    with pytest.raises(TermNotFound):
        r.term_info("text", "zzzznope")


def test_doc_field_length_parity(engine, oracle):
    r = engine.reader()
    with oracle.searcher() as s:
        rr = s.reader()
        for docnum in [0, 3, 7, 20, 41]:
            assert r.doc_field_length(docnum, "text") == \
                rr.doc_field_length(docnum, "text"), docnum
    assert r.doc_field_length(0, "nosuchfield", default=7) == 7


def test_first_id_and_postings(engine, oracle):
    r = engine.reader()
    with oracle.searcher() as s:
        rr = s.reader()
        for term in ["deploy", "error", "the", "render"]:
            try:
                ref_first = rr.first_id("text", term)
            except Exception:
                ref_first = None
            if ref_first is None:
                with pytest.raises(TermNotFound):
                    r.first_id("text", term)
            else:
                assert r.first_id("text", term) == ref_first, term
                ids, ws = r.postings("text", term)
                assert ids[0] == ref_first


def test_stored_and_iter_docs(engine, oracle):
    r = engine.reader()
    with oracle.searcher() as s:
        rr = s.reader()
        ref0 = rr.stored_fields(5)
        mine0 = r.stored_fields(5)
        for k, v in ref0.items():
            assert mine0.get(k) == v, k
    docs = list(r.iter_docs())
    assert docs[0][0] == 0 and len(docs) == r.doc_count()
    stored_iter = list(r.all_stored_fields())
    assert len(stored_iter) == r.doc_count()
    assert stored_iter[5] == mine0


def test_terms_within_and_corrector(engine, oracle):
    r = engine.reader()
    with oracle.searcher() as s:
        rr = s.reader()
        for word, maxdist in [("deplou", 1), ("rendor", 2),
                              ("clustre", 2)]:
            ref = {_dec(t) for t in rr.terms_within("text", word,
                                                    maxdist)}
            assert set(r.terms_within("text", word, maxdist)) == ref
        assert (r.corrector("text").suggest("deplou", limit=5) ==
                s.corrector("text").suggest("deplou", limit=5))


def test_deletions_and_generation(built_dir):
    import shutil

    from whoosh_ray.index import open_dir

    work = built_dir + "_del"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(built_dir, work)
    ix = open_dir(work)
    r0 = Searcher(work).reader()
    assert not r0.has_deletions() and r0.deleted_docs_set() == set()
    n = ix.delete_by_term("text", "deploy")
    assert n > 0
    r = Searcher(work).reader()
    assert r.has_deletions()
    dels = r.deleted_docs_set()
    assert len(dels) == n
    some = next(iter(dels))
    assert r.is_deleted(some) and not r.is_deleted(
        next(d for d in range(r.doc_count_all()) if d not in dels))
    assert r.doc_count() == r.doc_count_all() - n
    assert all(d not in dels for d in r.all_doc_ids())
    assert r.generation() >= 0
    shutil.rmtree(work, ignore_errors=True)


def test_column_reader(engine):
    r = engine.reader()
    col = r.column_reader("role")
    assert len(col) == r.doc_count_all()
    t = engine.stored(np.asarray([0, 5, 17]), columns=["role"])
    assert [col[0], col[5], col[17]] == t["role"].to_pylist()
    assert sorted({v for v in col if v is not None}) == \
        sorted({v for v in col._values if v is not None})


def test_searcher_find_and_collector(engine, oracle):
    """find() (parse+search) and the collector run path equal a plain
    search; TimeLimitCollector with a generous budget is a no-op."""
    from whoosh_ray.search import TimeLimitCollector
    from whoosh_ray.search.query import Term

    with oracle.searcher() as s:
        ref = [h.docnum for h in s.find("text", "deploy AND render",
                                        limit=10)]
    mine = engine.find("text", "deploy AND render", limit=10)
    assert mine.docids.tolist() == ref

    c = engine.collector(limit=10)
    engine.search_with_collector(Term("text", "deploy"), c)
    want = engine.search(Term("text", "deploy"), limit=10)
    assert c.results().docids.tolist() == want.docids.tolist()

    tlc = TimeLimitCollector(engine.collector(limit=10), timelimit=30.0)
    engine.search_with_collector(Term("text", "deploy"), tlc)
    assert tlc.results().docids.tolist() == want.docids.tolist()

    ctx = engine.context()
    assert ctx.weighting is engine.weighting
    assert engine.boolean_context().weighting is None
    assert ctx.set(limit=5).limit == 5 and ctx.limit == 0
    assert engine.get_parent() is engine and not engine.has_parent()
    assert len(engine.leaf_searchers()) == len(engine.segments)


def test_query_terms_and_existing_terms(engine, oracle):
    from whoosh_ray.search.query import And, Phrase, Prefix, Term

    q = And([Term("text", "deploy"), Term("text", "zzznope"),
             Phrase("text", ["error", "retry"])])
    with oracle.searcher() as s:
        from whoosh import qparser as _qp  # noqa: F401 — oracle loaded
        ref_r = s.search(_oracle_query(q), limit=10)
        ref = {(f, _dec(t)) for f, t in ref_r.query_terms()}
        ref_nophrase = {(f, _dec(t)) for f, t in
                        ref_r.q.existing_terms(s.reader(), phrases=False)}
    r = engine.search(q, limit=10)
    assert r.query_terms() == ref
    assert q.existing_terms(engine.reader(), phrases=False) == \
        ref_nophrase
    # expand=True resolves multiterm leaves to existing expansions
    pq = Prefix("text", "de")
    with oracle.searcher() as s:
        ref_exp = {(f, _dec(t)) for f, t in s.search(
            _oracle_prefix("text", "de"), limit=5).query_terms(
                expand=True)}
    assert pq.existing_terms(engine.reader(), expand=True) == ref_exp


def _oracle_query(q):
    from whoosh import query as wq

    return wq.And([wq.Term("text", "deploy"),
                   wq.Term("text", "zzznope"),
                   wq.Phrase("text", ["error", "retry"])])


def _oracle_prefix(field, prefix):
    from whoosh import query as wq

    return wq.Prefix(field, prefix)


def test_hit_mapping_surface(engine):
    r = engine.search(Term("text", "deploy"), limit=3)
    h = r[0]
    assert set(h.keys()) == {k for k in h}
    assert list(h.values()) == [h[k] for k in h.keys()]
    assert list(h.iteritems()) == list(h.items())
    assert len(h) == len(h.fields())
    for mut in (lambda: h.update({"x": 1}), lambda: h.clear(),
                lambda: h.pop("text")):
        with pytest.raises(NotImplementedError):
            mut()


def test_iter_postings(engine, oracle):
    r = engine.reader()
    mine = [(f, t, d) for f, t, d, _w in r.iter_postings()
            if f == "role"]
    with oracle.searcher() as s:
        ref = []
        for fname, btext, docnum, _w, _v in s.reader().iter_postings():
            if fname == "role":
                ref.append((fname, _dec(btext), docnum))
    assert sorted(mine) == sorted(ref)


def test_leaf_readers_and_misc(engine):
    r = engine.reader()
    leaves = r.leaf_readers()
    assert len(leaves) == len(engine.segments)
    offs = [o for _, o in leaves]
    assert offs == sorted(offs) and offs[0] == 0
    assert r.is_atomic() == (len(engine.segments) <= 1)
    assert set(r.indexed_field_names()) >= {"text", "role"}
    with r as rr:
        assert rr is r


def test_timelimit_collector_preserves_kwargs(engine):
    """ADVICE r4: a TimeLimitCollector wrapping a CONFIGURED collector
    (filter/terms/...) must honour the full configuration, like the
    reference TimeLimitCollector wrapping its child."""
    from whoosh_ray.search import TimeLimitCollector
    from whoosh_ray.search.query import Term

    q = Term("text", "deploy")
    flt = Term("role", "user")
    want = engine.search(q, limit=10, filter=flt, terms=True)
    tlc = TimeLimitCollector(
        engine.collector(limit=10, filter=flt, terms=True),
        timelimit=30.0)
    engine.search_with_collector(q, tlc)
    got = tlc.results()
    assert got.docids.tolist() == want.docids.tolist()
    assert got.scores.tolist() == want.scores.tolist()
    assert got.termdocs.keys() == want.termdocs.keys()
    # and the plain timelimit API takes the same kwargs directly
    direct = engine.search_with_timelimit(q, 10, timelimit=30.0,
                                          filter=flt)
    assert direct.docids.tolist() == want.docids.tolist()


def test_column_reader_reverse(engine):
    """ADVICE r4: reverse=True must actually invert sort keys (numeric
    negation, reference columns.py:647-651) and raise for
    non-reversible column types (reference columns.py:160-161)."""
    r = engine.reader()
    col = r.column_reader("turn_idx", reverse=False)
    rcol = r.column_reader("turn_idx", reverse=True)
    keys = [col.sort_key(d) for d in range(len(col))]
    rkeys = [rcol.sort_key(d) for d in range(len(col))]
    order = sorted(range(len(col)), key=lambda d: (keys[d], d))
    rorder = sorted(range(len(col)), key=lambda d: (rkeys[d], d))
    vals = [col[d] for d in order]
    rvals = [rcol[d] for d in rorder]
    assert vals == sorted(vals, key=lambda v: (v is None, v))
    nn = [v for v in rvals if v is not None]
    assert nn == sorted(nn, reverse=True)
    with pytest.raises(NotImplementedError):
        r.column_reader("role", reverse=True)
    # temporal columns reverse like the reference's numeric date ticks
    tcol = r.column_reader("ts", reverse=True)
    tk = [tcol.sort_key(d) for d in range(min(64, len(tcol)))]
    tv = [tcol[d] for d in range(min(64, len(tcol)))]
    pairs = [(k, v) for k, v in zip(tk, tv) if v is not None]
    assert [p[1] for p in sorted(pairs, key=lambda p: p[0])] == \
        sorted([p[1] for p in pairs], reverse=True)


def test_cursor_parity(engine, oracle):
    """TermCursor first/find/next/is_valid/term_info vs the reference
    reader.cursor() (reading.py:849-853, whoosh3.py:505-560).  The
    reference cursor is per-segment merged via MultiCursor; this corpus
    builds one oracle segment, so the raw cursor compares directly."""
    r = engine.reader()
    cur = r.cursor("text")
    with oracle.searcher() as s:
        ref = s.reader().cursor("text")

        def dec(x):
            return x.decode() if isinstance(x, bytes) else x

        # construction positions at the first term
        assert cur.text() == dec(ref.text())
        assert cur.is_valid() and ref.is_valid()
        assert cur.first() == dec(ref.first())
        # walk a stretch in lockstep
        for _ in range(25):
            a, b = cur.next(), ref.next()
            assert a == dec(b)
            if a is not None:
                assert (cur.term_info().doc_frequency()
                        == ref.term_info().doc_frequency())
        # seek: exact hit, gap probe (first term >= probe), past-end
        for probe in ["deploy", "deplox", "zzzzzzzz"]:
            assert cur.find(probe) == dec(ref.find(probe))
        assert cur.is_valid() == ref.is_valid()
        assert cur.next() is None and ref.next() is None


def test_reader_has_column(engine):
    r = engine.reader()
    assert r.has_column("text") and r.has_column("role")
    assert not r.has_column("nosuchfield")


def test_writer_delete_accessors(built_dir, tmp_path):
    """IndexWriter has_deletions/deleted_count/is_deleted/doc_count
    (reference writing.py:612-636, 799-800): committed tombstones plus
    this writer's pending dooms."""
    import shutil

    from whoosh_ray.pipelines.writer import IndexWriter

    ix = str(tmp_path / "ixw")
    shutil.copytree(built_dir, ix)
    w = IndexWriter(ix)
    assert not w.has_deletions() and w.deleted_count() == 0
    assert w.doc_count() == 0
    n = w.delete_by_term("text", "deploy")
    assert n > 0
    assert w.has_deletions() and w.deleted_count() == n
    doomed = next(iter(w._doomed))
    assert w.is_deleted(doomed)
    assert not w.is_deleted(10**9)
    w.add_document(conv_id="cx", turn_idx=0, role="user",
                   text="fresh deploy", tool="browser",
                   ts=np.datetime64("2024-01-01T00:00:00", "us").item())
    assert w.doc_count() == 1
    w.cancel()


def test_estimate_simplify_docs_parity(engine, oracle):
    """estimate_size/estimate_min_size/simplify/docs vs the reference
    on the same corpus (qcore.py:515-548, compound.py:100-118,262-263,
    terms.py:173-201, positional.py:210-214)."""
    import whoosh.query as wq

    from whoosh_ray.search.query import (And, Not, Or, Phrase, Prefix,
                                         Require, Term)

    r = engine.reader()
    t = lambda x: Term("text", x)  # noqa: E731
    wt = lambda x: wq.Term("text", x)  # noqa: E731
    cases = [
        (t("deploy"), wt("deploy")),
        (And([t("deploy"), t("render")]), wq.And([wt("deploy"), wt("render")])),
        (Or([t("deploy"), t("render")]), wq.Or([wt("deploy"), wt("render")])),
        (And([t("deploy"), Not(t("render"))]),
         wq.And([wt("deploy"), wq.Not(wt("render"))])),
        (Require(t("deploy"), t("render")),
         wq.Require(wt("deploy"), wt("render"))),
        (Phrase("text", ["deploy", "render"]),
         wq.Phrase("text", ["deploy", "render"])),
        (Prefix("text", "rend"), wq.Prefix("text", "rend")),
    ]
    with oracle.searcher() as s:
        rr = s.reader()
        for mine, ref in cases:
            assert mine.estimate_size(r) == ref.estimate_size(rr), mine
            assert mine.estimate_min_size(r) == \
                ref.estimate_min_size(rr), mine
            # docs(): identical docnum sets (docids align by build)
            assert sorted(mine.docs(engine)) == sorted(ref.docs(s)), mine
        # simplify: Prefix -> Or of existing Terms, same word set
        msimp = Prefix("text", "rend").simplify(r)
        rsimp = wq.Prefix("text", "rend").simplify(rr)
        mwords = sorted(x for _, x in msimp.all_terms())
        rwords = sorted(x.decode() if isinstance(x, bytes) else x
                        for _, x in rsimp.all_terms())
        assert mwords == rwords and len(mwords) >= 1


def test_multicursor_merge(engine, built_dir):
    """reading.MultiCursor k-way merge over per-child cursors.  The
    reference class is broken as shipped (reading.py:1280-1295
    ``_find_low`` never seeds its low list — both ``if low and ...``
    guards are false while ``low`` is empty — and term_info feeds bare
    TermInfos to combine_terminfos which indexes ``(ti, offset)``
    pairs); we implement the evident intent and pin the breakage."""
    from whoosh_ray.reading import MultiCursor

    r = engine.reader()
    full = [t for t in r.lexicon("text")]

    # two overlapping halves of the lexicon as child cursors
    class ListCursor:
        def __init__(self, terms, reader):
            self._terms, self._r, self._i = terms, reader, 0

        def is_valid(self):
            return 0 <= self._i < len(self._terms)

        def term(self):
            return self._terms[self._i] if self.is_valid() else None

        def first(self):
            self._i = 0
            return self.term()

        def find(self, probe):
            from bisect import bisect_left
            self._i = bisect_left(self._terms, probe)
            return self.term()

        def next(self):
            self._i += 1
            return self.term()

        def term_info(self):
            return self._r.term_info("text", self.term())

    a = ListCursor(full[: 2 * len(full) // 3], r)
    b = ListCursor(full[len(full) // 3:], r)
    mc = MultiCursor([a, b])

    # walking the merged cursor yields the full lexicon exactly once
    walked = []
    assert mc.first() == full[0]
    while mc.is_valid():
        walked.append(mc.text())
        mc.next()
    assert walked == full

    # term_info on an overlap term combines both children: stats sum,
    # so df == 2x the single-reader df (both cursors serve one reader)
    mid = full[len(full) // 2]
    mc.find(mid)
    assert mc.text() == mid
    assert (mc.term_info().doc_frequency()
            == 2 * r.term_info("text", mid).doc_frequency())


def test_reference_multicursor_broken_as_shipped(oracle):
    """Pin the reference artifact our MultiCursor diverges from."""
    from whoosh.reading import MultiCursor as RefMultiCursor

    with oracle.searcher() as s:
        reader = s.reader()
        c1 = reader.cursor("text")
        c2 = reader.cursor("text")
        # W3FieldCursor never implements the term() accessor _find_low
        # calls (codec/base.py:299 raises), so construction crashes on
        # any real cursor...
        with pytest.raises(NotImplementedError):
            RefMultiCursor([c1, c2])

        # ...and even with term() patched in, _find_low's empty-low
        # guards never seed the low list: no current term, ever
        class Patched:
            def __init__(self, c):
                self._c = c

            def __getattr__(self, n):
                return getattr(self._c, n)

            def term(self):
                return self._c.text()

        mc = RefMultiCursor([Patched(c1), Patched(c2)])
        assert mc._low == [] and mc._text is None


def test_combine_terminfos(engine):
    from whoosh_ray.reading import combine_terminfos

    r = engine.reader()
    terms = list(r.lexicon("text"))[:3]
    tis = [r.term_info("text", t) for t in terms]

    one = combine_terminfos([(tis[0], 7)])
    assert one.min_id() == tis[0].min_id() + 7
    assert one.max_id() == tis[0].max_id() + 7
    assert one.weight() == tis[0].weight()

    many = combine_terminfos([(ti, off) for ti, off in
                              zip(tis, (0, 100, 200))])
    assert many.weight() == sum(ti.weight() for ti in tis)
    assert many.doc_frequency() == sum(ti.doc_frequency() for ti in tis)
    assert many.min_length() == min(ti.min_length() for ti in tis)
    assert many.max_length() == max(ti.max_length() for ti in tis)
    assert many.max_weight() == max(ti.max_weight() for ti in tis)
    assert many.min_id() == min(ti.min_id() + o for ti, o in
                                zip(tis, (0, 100, 200)))
    assert many.max_id() == max(ti.max_id() + o for ti, o in
                                zip(tis, (0, 100, 200)))


def test_empty_reader_surface():
    """reading.EmptyReader (reference reading.py:905-993): the full
    reader surface answering 'nothing here'."""
    import pytest as _pytest

    from whoosh_ray.reading import EmptyReader

    r = EmptyReader()
    assert ("text", "deploy") not in r
    assert list(iter(r)) == []
    assert r.doc_count() == 0 and r.doc_count_all() == 0
    assert r.field_length("text") == 0
    assert r.doc_field_length(0, "text", default=42) == 42
    assert not r.has_deletions() and not r.is_deleted(0)
    assert list(r.lexicon("text")) == []
    assert list(r.most_frequent_terms("text")) == []
    assert r.frequency("text", "x") == 0 and r.doc_frequency("text", "x") == 0
    cur = r.cursor("text")
    assert not cur.is_valid() and cur.first() is None and cur.next() is None
    with _pytest.raises(TermNotFound):
        r.term_info("text", "deploy")
    with _pytest.raises(TermNotFound):
        r.postings("text", "deploy")
    with _pytest.raises(KeyError):
        r.stored_fields(0)
    with _pytest.raises(KeyError):
        r.vector(0, "text")


def test_multicursor_fuzz_random_partitions():
    """MultiCursor over arbitrary sorted child lists == sorted union
    (property: every term exactly once, in order, regardless of how
    terms are partitioned/duplicated across children)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from whoosh_ray.reading import MultiCursor

    class ListCursor:
        def __init__(self, terms):
            # a real field cursor walks a sorted UNIQUE lexicon
            self._terms, self._i = sorted(set(terms)), 0

        def is_valid(self):
            return 0 <= self._i < len(self._terms)

        def term(self):
            return self._terms[self._i] if self.is_valid() else None

        def first(self):
            self._i = 0
            return self.term()

        def find(self, probe):
            from bisect import bisect_left
            self._i = bisect_left(self._terms, probe)
            return self.term()

        def next(self):
            self._i += 1
            return self.term()

    words = st.text(alphabet="abcd", min_size=1, max_size=4)

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(st.lists(st.lists(words, max_size=12), min_size=1, max_size=5),
           words)
    def check(children, probe):
        mc = MultiCursor([ListCursor(c) for c in children])
        want = sorted(set().union(*[set(c) for c in children]))
        got = []
        while mc.is_valid():
            got.append(mc.text())
            mc.next()
        assert got == want
        # find() = first term >= probe across all children
        from bisect import bisect_left
        assert mc.find(probe) == (
            want[bisect_left(want, probe)]
            if bisect_left(want, probe) < len(want) else None)
        # first() rewinds fully
        assert mc.first() == (want[0] if want else None)

    check()
