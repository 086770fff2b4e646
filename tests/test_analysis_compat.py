"""Drop-in analysis surface (whoosh_ray.analysis) parity vs the
reference: reference-named tokenizer/filter constructors compose with
``|`` into AnalyzerSpecs whose token streams match the reference
generator chains exactly."""

import pickle

import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray import analysis as wa
from whoosh_ray.functions.analysis import AnalyzerSpec, VectorAnalyzer


@pytest.fixture(scope="module", autouse=True)
def _oracle():
    load_whoosh_oracle()


TEXTS = [
    "Hello there, WORLD! it's a-test of the filter_chain v2.5",
    "the quick brown fox-JUMPED over 42 lazy dogs' tails",
    "", "x", "a an and are", "Wi-Fi PowerShot A's+B's",
    "don't stop believing 1234 ab",
    "  padded   words  ", "CamelCaseRuns IBMThinkPad360",
]


def ref_stream(analyzer, text, mode="index"):
    return [(t.text, t.pos)
            for t in analyzer(text, positions=True, mode=mode)]


def my_stream(spec, text, mode="index"):
    import dataclasses

    if mode != "index":
        spec = dataclasses.replace(spec, mode=mode)
    tb = VectorAnalyzer(spec)([text])
    return list(zip(tb.terms.tolist(), tb.positions.tolist()))


def assert_parity(spec, ref, texts=TEXTS, modes=("index",)):
    for mode in modes:
        for text in texts:
            assert my_stream(spec, text, mode) == ref_stream(ref, text, mode), (
                mode, text)


def test_standard_chain():
    from whoosh.analysis import LowercaseFilter, RegexTokenizer, StopFilter

    ref = RegexTokenizer() | LowercaseFilter() | StopFilter()
    mine = wa.RegexTokenizer() | wa.LowercaseFilter() | wa.StopFilter()
    assert_parity(mine, ref)


def test_stop_lang_adds_to_english():
    from whoosh.analysis import LowercaseFilter, RegexTokenizer, StopFilter

    ref = RegexTokenizer() | LowercaseFilter() | StopFilter(lang="es")
    mine = wa.RegexTokenizer() | wa.LowercaseFilter() | wa.StopFilter(lang="es")
    assert_parity(mine, ref,
                  texts=TEXTS + ["el lapiz es en la mesa", "the el and la"])
    with pytest.raises(wa.NoStopWords):
        wa.StopFilter(lang="xx")


def test_substitution_and_reverse():
    from whoosh.analysis import (RegexTokenizer, ReverseTextFilter,
                                 SubstitutionFilter)

    ref = RegexTokenizer(r"\S+") | SubstitutionFilter("-", "")
    mine = wa.RegexTokenizer(r"\S+") | wa.SubstitutionFilter("-", "")
    assert_parity(mine, ref)

    ref2 = RegexTokenizer() | ReverseTextFilter()
    mine2 = wa.RegexTokenizer() | wa.ReverseTextFilter()
    assert_parity(mine2, ref2)

    # re.sub with groups (the reference docstring example)
    ref3 = RegexTokenizer(r"\S+") | SubstitutionFilter(
        "([^/]*)/(./*)", r"\2/\1")
    mine3 = wa.RegexTokenizer(r"\S+") | wa.SubstitutionFilter(
        "([^/]*)/(./*)", r"\2/\1")
    assert_parity(mine3, ref3, texts=["a/b c/d e/f", "x/", "nop"])


def test_id_tokenizer_composes():
    from whoosh.analysis import IDTokenizer, LowercaseFilter

    ref = IDTokenizer() | LowercaseFilter()
    mine = wa.IDTokenizer() | wa.LowercaseFilter()
    assert_parity(mine, ref, texts=["Hello World", "", "MiXeD"])


def test_path_tokenizer_prefixes():
    from whoosh.analysis import PathTokenizer

    ref = PathTokenizer()
    mine = wa.PathTokenizer()
    assert_parity(mine, ref, texts=["/a/b/c", "a/b", "/", "", "x",
                                    "/usr/local/lib/python"])


def test_ngram_filter_index_and_query():
    from whoosh.analysis import LowercaseFilter, NgramFilter, RegexTokenizer

    for minsize, maxsize, at in [(2, None, None), (3, 5, None),
                                 (2, 4, "start"), (2, 4, "end"),
                                 (4, None, "start"), (4, None, "end")]:
        ref = RegexTokenizer() | LowercaseFilter() | NgramFilter(
            minsize, maxsize, at=at)
        mine = (wa.RegexTokenizer() | wa.LowercaseFilter()
                | wa.NgramFilter(minsize, maxsize, at=at))
        assert_parity(mine, ref, modes=("index", "query"))


def test_ngram_tokenizer_lowercase_composition():
    from whoosh.analysis import NgramAnalyzer

    mine = wa.NgramTokenizer(3, 4) | wa.LowercaseFilter()
    assert_parity(mine, NgramAnalyzer(3, 4))
    with pytest.raises(TypeError):
        wa.NgramTokenizer(3) | wa.StopFilter()


def test_ngramword_analyzer_at():
    from whoosh.analysis import NgramWordAnalyzer
    from whoosh_ray.functions.analysis import NgramWordAnalyzer as MyNWA

    for at in (None, "start", "end"):
        assert_parity(MyNWA(2, 4, at=at), NgramWordAnalyzer(2, 4, at=at),
                      modes=("index", "query"))
    # custom tokenizer arg
    assert_parity(MyNWA(2, 3, tokenizer=wa.RegexTokenizer(r"\S+")),
                  NgramWordAnalyzer(2, 3, tokenizer=__import__(
                      "whoosh.analysis", fromlist=["RegexTokenizer"]
                  ).RegexTokenizer(r"\S+")))


def test_filter_chain_composition_without_tokenizer():
    from whoosh.analysis import (LowercaseFilter, RegexTokenizer,
                                 StemFilter, StopFilter)

    tail = wa.LowercaseFilter() | wa.StopFilter() | wa.StemFilter()
    assert isinstance(tail, wa.StageChain)
    mine = wa.RegexTokenizer() | tail
    ref = (RegexTokenizer() | LowercaseFilter() | StopFilter()
           | StemFilter())
    assert_parity(mine, ref)
    with pytest.raises(wa.CompositionError):
        tail | wa.RegexTokenizer()


def test_tee_and_multi():
    from whoosh.analysis import (LowercaseFilter, MultiFilter, NgramFilter,
                                 PassFilter, RegexTokenizer,
                                 ReverseTextFilter, TeeFilter)

    ref = RegexTokenizer() | TeeFilter(LowercaseFilter(),
                                       ReverseTextFilter())
    mine = wa.RegexTokenizer() | wa.TeeFilter(wa.LowercaseFilter(),
                                              wa.ReverseTextFilter())
    assert_parity(mine, ref)

    # composite tee arm
    ref2 = RegexTokenizer() | TeeFilter(
        LowercaseFilter() | ReverseTextFilter(), PassFilter())
    mine2 = wa.RegexTokenizer() | wa.TeeFilter(
        wa.LowercaseFilter() | wa.ReverseTextFilter(), wa.PassFilter())
    assert_parity(mine2, ref2)

    # MultiFilter picks by mode; unmatched mode passes through.  The
    # reference CRASHES on an empty token stream (filters.py:142
    # unguarded next()) — no behavior to match there.
    nonempty = [t for t in TEXTS if t.strip()]
    ref3 = RegexTokenizer() | MultiFilter(index=NgramFilter(2, 3),
                                          query=LowercaseFilter())
    mine3 = wa.RegexTokenizer() | wa.MultiFilter(
        index=wa.NgramFilter(2, 3), query=wa.LowercaseFilter())
    assert_parity(mine3, ref3, texts=nonempty, modes=("index", "query"))
    ref4 = RegexTokenizer() | MultiFilter(query=LowercaseFilter())
    mine4 = wa.RegexTokenizer() | wa.MultiFilter(query=wa.LowercaseFilter())
    assert_parity(mine4, ref4, texts=nonempty, modes=("index",))


def test_stem_pystemmer_charset_delimited():
    from whoosh.analysis import (CharsetFilter, DelimitedAttributeFilter,
                                 LowercaseFilter, RegexTokenizer, StemFilter)
    from whoosh.support.charset import accent_map

    ref = RegexTokenizer() | LowercaseFilter() | StemFilter()
    mine = wa.RegexTokenizer() | wa.LowercaseFilter() | wa.StemFilter()
    assert_parity(mine, ref)

    ref2 = RegexTokenizer() | CharsetFilter(accent_map)
    mine2 = wa.RegexTokenizer() | wa.CharsetFilter(accent_map)
    assert_parity(mine2, ref2, texts=["café naïve résumé", "plain"])

    ref3 = RegexTokenizer(r"\S+") | DelimitedAttributeFilter()
    mine3 = wa.RegexTokenizer(r"\S+") | wa.DelimitedAttributeFilter()
    assert_parity(mine3, ref3, texts=["word^2 plain other^0.5"])

    # stemfn by engine function object resolves to a named chain
    from whoosh_ray.functions.porter2 import stem as p2
    st = wa.StemFilter(stemfn=p2)
    assert st == ("stemfn", ("porter2", (), 50000))
    with pytest.raises(TypeError):
        wa.StemFilter(stemfn=lambda w: w)


def test_intraword_compound_biword_shingle_guards():
    # stream parity for these is pinned in test_tokenfilters; here the
    # compat constructors must produce the exact stage tuples
    assert wa.BiWordFilter() == ("biword", ("-",))
    assert wa.ShingleFilter(3, "_") == ("shingle", (3, "_"))
    assert wa.CompoundWordFilter({"base", "ball"}) == (
        "compound", (("ball", "base"), True))
    assert wa.IntraWordFilter()[0] == "intraword"
    with pytest.raises(TypeError):
        wa.IntraWordFilter(splitwords=False, splitnums=False)
    assert wa.DoubleMetaphoneFilter() == ("dmetaphone", (1.0, 0.5, False))
    assert wa.PyStemmerFilter("german")[0] == "pystemmer"


def test_spec_pickles_and_hashes():
    mine = (wa.RegexTokenizer() | wa.LowercaseFilter()
            | wa.StopFilter() | wa.StemFilter())
    assert isinstance(mine, AnalyzerSpec)
    rt = pickle.loads(pickle.dumps(mine))
    assert rt == mine
    assert hash(rt) == hash(mine)
    assert my_stream(rt, TEXTS[0]) == my_stream(mine, TEXTS[0])


def test_entoken_unstopped_logging_pass():
    toks = list(wa.entoken(["a", "bb", "ccc"], positions=True, chars=True))
    assert [(t.text, t.pos, t.startchar, t.endchar) for t in toks] == [
        ("a", 0, 0, 1), ("bb", 1, 1, 3), ("ccc", 2, 3, 6)]
    assert [t.text for t in wa.unstopped(iter(toks))] == ["a", "bb", "ccc"]

    from whoosh.analysis import (LoggingFilter, PassFilter, RegexTokenizer)

    ref = RegexTokenizer() | PassFilter() | LoggingFilter()
    mine = wa.RegexTokenizer() | wa.PassFilter() | wa.LoggingFilter()
    assert_parity(mine, ref)


def test_end_to_end_field_analyzer(tmp_path):
    """A compat-composed analyzer drives a real build + search."""
    from whoosh_ray import index as wix
    from whoosh_ray.search.query import Term
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    ana = wa.RegexTokenizer() | wa.LowercaseFilter() | wa.StopFilter() \
        | wa.StemFilter()
    schema = IndexSchema(fields=(
        FieldSpec.text("body", stored=True, analyzer=ana),
        FieldSpec.id("conv_id", stored=True),
    ), stored_columns=("turn_idx",))
    ix = wix.create_in(str(tmp_path), schema, seg_size=512)
    w = ix.writer()
    w.add_document(body="The runners were running happily",
                   conv_id="c1", turn_idx=0)
    w.add_document(body="nothing to see here", conv_id="c2", turn_idx=0)
    w.commit()
    with ix.searcher() as s:
        # whoosh's porter variant stems "runners" -> "runner" (and
        # "running" -> "runn", the pinned inert double-consonant rule)
        r = s.search(Term("body", "runner"), limit=5)
        assert [h["conv_id"] for h in r.hits()] == ["c1"]


def test_stemmed_field_highlights_match_reference(tmp_path):
    """Hit.highlights retokenizes with the FIELD'S analyzer
    (removestops=False): on a stemmed field the query term ('runner')
    must highlight the surface word ('runners') — string parity with
    the reference."""
    from whoosh import fields as wf
    from whoosh.analysis import StemmingAnalyzer as RefStemming
    from whoosh.filedb.filestore import RamStorage
    from whoosh.qparser import QueryParser as WQP

    from whoosh_ray import index as wix
    from whoosh_ray.search.qparser import QueryParser
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    docs = ["The runners were running happily through fields",
            "nothing to see here at all",
            "a runner runs alone in the rain"]

    rix = RamStorage().create_index(wf.Schema(
        body=wf.TEXT(analyzer=RefStemming(), stored=True)))
    w = rix.writer()
    for t in docs:
        w.add_document(body=t)
    w.commit()

    schema = IndexSchema(fields=(
        FieldSpec.text("body", stored=True,
                       analyzer=wa.StemmingAnalyzer()),
        FieldSpec.id("conv_id", stored=True),
    ), stored_columns=("turn_idx",))
    ix = wix.create_in(str(tmp_path), schema, seg_size=512)
    mw = ix.writer()
    for i, t in enumerate(docs):
        mw.add_document(body=t, conv_id=f"c{i}", turn_idx=0)
    mw.commit()

    for qs in ["runners", "running fields", "rain alone"]:
        with rix.searcher() as rs:
            rq = WQP("body", rix.schema).parse(qs)
            ref = {h["body"]: h.highlights("body")
                   for h in rs.search(rq, limit=None)}
        with ix.searcher() as s:
            mq = QueryParser("body", schema).parse(qs)
            mine = {h["body"]: h.highlights("body")
                    for h in s.search(mq, limit=None)}
        assert mine == ref, qs
