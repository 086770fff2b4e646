"""Stream-restructuring filter parity vs the reference
(IntraWord/CompoundWord/BiWord/Shingle/Tee/Multi — VERDICT r1 missing
#5): (text, pos) streams must match the reference generator chains."""

import numpy as np
import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.functions.analysis import STOP_WORDS, AnalyzerSpec, VectorAnalyzer


@pytest.fixture(scope="module", autouse=True)
def _oracle():
    load_whoosh_oracle()


def ref_stream(analyzer, text):
    return [(t.text, t.pos) for t in analyzer(text, positions=True)]


def my_stream(spec, text):
    tb = VectorAnalyzer(spec)([text])
    return list(zip(tb.terms.tolist(), tb.positions.tolist()))


INTRAWORD_TEXTS = [
    "PowerShot", "A's+B's&C's", "Super-Duper-XL500-42-AutoCoder!",
    "Wi-Fi", "O'Neil's", "SD500", "plain words here", "camelCaseRuns",
    "IBMThinkPad360", "a-b-c", "''''", "-leading trailing-", "123abc456",
    "don't", "it's A1 b2C3", "x", "",
]


@pytest.mark.parametrize("sw,sn,mw,mn", [
    (True, True, False, False),
    (True, True, True, True),
    (True, False, True, False),
    (False, True, False, True),
    # splitwords=False, splitnums=False CRASHES in the reference
    # (intraword.py:334 reads self.boundary which is never set) — no
    # behavior to match
])
def test_intraword_parity(sw, sn, mw, mn):
    from whoosh.analysis import IntraWordFilter, RegexTokenizer

    ref = RegexTokenizer(r"\S+") | IntraWordFilter(
        splitwords=sw, splitnums=sn, mergewords=mw, mergenums=mn)
    delims = "-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+"
    spec = AnalyzerSpec(chain=(
        ("tokenizer", (r"\S+", False)),
        ("intraword", (delims, sw, sn, mw, mn)),
    ))
    for text in INTRAWORD_TEXTS:
        assert my_stream(spec, text) == ref_stream(ref, text), text


def test_intraword_fuzz():
    from whoosh.analysis import IntraWordFilter, RegexTokenizer

    ref = RegexTokenizer(r"\S+") | IntraWordFilter(mergewords=True,
                                                   mergenums=True)
    delims = "-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+"
    spec = AnalyzerSpec(chain=(
        ("tokenizer", (r"\S+", False)),
        ("intraword", (delims, True, True, True, True)),
    ))
    rng = np.random.default_rng(3)
    alphabet = list("abcDEF012-_'&. xX9")
    for _ in range(800):
        n = int(rng.integers(1, 24))
        text = "".join(rng.choice(alphabet, n))
        assert my_stream(spec, text) == ref_stream(ref, text), repr(text)


def test_fancy_analyzer_parity():
    from whoosh.analysis import FancyAnalyzer

    ref = FancyAnalyzer()
    delims = "-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+"
    # FancyAnalyzer = RegexTokenizer(r"\s+", gaps) | IntraWordFilter()
    #   | LowercaseFilter | StopFilter (analyzers.py; merge* default off)
    spec = AnalyzerSpec(chain=(
        ("tokenizer", (r"\s+", True)),
        ("intraword", (delims, True, True, False, False)),
        ("lowercase", ()),
        ("stop", (tuple(sorted(STOP_WORDS)), 2, None, True)),
    ))
    texts = ["The Quick-Witted BrownFox is a PowerShot SD500 user",
             "Wi-Fi and the O'Neil's code-base", "", "ALLCAPS"]
    for text in texts:
        assert my_stream(spec, text) == ref_stream(ref, text), text


def test_biword_parity():
    from whoosh.analysis import BiWordFilter, RegexTokenizer

    ref = RegexTokenizer() | BiWordFilter("-")
    spec = AnalyzerSpec(chain=(
        ("tokenizer", (r"\w+(?:\.?\w+)*", False)),
        ("biword", ("-",)),
    ))
    # NB: the reference BiWordFilter raises UnboundLocalError on an
    # EMPTY token stream (intraword.py:167) — nothing to match there
    for text in ["the sign of four", "single", "two words"]:
        assert my_stream(spec, text) == ref_stream(ref, text), text


def test_shingle_parity():
    from whoosh.analysis import RegexTokenizer, ShingleFilter

    ref = RegexTokenizer() | ShingleFilter(3, " ")
    spec = AnalyzerSpec(chain=(
        ("tokenizer", (r"\w+(?:\.?\w+)*", False)),
        ("shingle", (3, " ")),
    ))
    for text in ["better a witty fool than a foolish wit", "one two",
                 "single", ""]:
        assert my_stream(spec, text) == ref_stream(ref, text), text


def test_compound_word_parity():
    from whoosh.analysis import CompoundWordFilter, RegexTokenizer

    wordset = {"green", "eggs", "apple", "script", "ham"}
    for keep in (True, False):
        ref = RegexTokenizer(r"\S+") | CompoundWordFilter(wordset, keep)
        spec = AnalyzerSpec(chain=(
            ("tokenizer", (r"\S+", False)),
            ("compound", (tuple(sorted(wordset)), keep)),
        ))
        for text in ["I do not like greeneggs and ham",
                     "applescript is greenham", ""]:
            assert my_stream(spec, text) == ref_stream(ref, text), (text, keep)


def test_multi_filter_modes():
    from whoosh.analysis import (IntraWordFilter, LowercaseFilter,
                                 MultiFilter, RegexTokenizer)

    iwf_i = IntraWordFilter(mergewords=True, mergenums=True)
    iwf_q = IntraWordFilter(mergewords=False, mergenums=False)
    mf = MultiFilter(index=iwf_i, query=iwf_q)
    ref = RegexTokenizer(r"\S+") | mf | LowercaseFilter()
    delims = "-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+"
    for mode in ("index", "query"):
        spec = AnalyzerSpec(mode=mode, chain=(
            ("tokenizer", (r"\S+", False)),
            ("multi", (("index", (("intraword",
                                   (delims, True, True, True, True)),)),
                       ("query", (("intraword",
                                   (delims, True, True, False, False)),)))),
            ("lowercase", ()),
        ))
        for text in ["PowerShot SD500 Wi-Fi", "plain words"]:
            want = [(t.text, t.pos)
                    for t in ref(text, positions=True, mode=mode)]
            assert my_stream(spec, text) == want, (text, mode)


def test_tee_filter_parity():
    from whoosh.analysis import (LowercaseFilter, ReverseTextFilter,
                                 RegexTokenizer, TeeFilter)

    ref = (RegexTokenizer() | TeeFilter(LowercaseFilter(),
                                        ReverseTextFilter()))
    want = [(t.text, t.pos)
            for t in ref("ALFA BRavo", positions=True)]
    # independent implementation: interleave the two sub-streams
    from whoosh_ray.functions.tokenfilters import Token, lowercase_filter

    def reverse_filter(tokens):
        for t in tokens:
            t.text = t.text[::-1]
            yield t

    toks = [Token("ALFA", 0), Token("BRavo", 1)]
    a = list(lowercase_filter(t.copy() for t in toks))
    b = list(reverse_filter(t.copy() for t in toks))
    got = []
    for x, y in zip(a, b):
        got.extend([(x.text, x.pos), (y.text, y.pos)])
    assert got == want, (got, want)


def test_delimited_attribute_parity():
    from whoosh.analysis import DelimitedAttributeFilter, RegexTokenizer

    ref = RegexTokenizer(r"\S+") | DelimitedAttributeFilter()
    spec = AnalyzerSpec(chain=(
        ("tokenizer", (r"\S+", False)),
        ("delimited", ("^",)),
    ))
    for text in ["image render^2 file^0.5", "plain words", ""]:
        assert my_stream(spec, text) == ref_stream(ref, text), text


def test_pipe_composition_sugar():
    """AnalyzerSpec | ("kind", params) — the reference's
    ``analyzer | filter`` composition (acore.py:137-145): the flag
    pipeline materializes to its chain equivalent and the stage
    appends; streams match the reference composite."""
    from whoosh.analysis import ShingleFilter, StandardAnalyzer

    composed = AnalyzerSpec() | ("shingle", (2, " "))
    ref = StandardAnalyzer() | ShingleFilter(2, " ")
    for text in ["better a witty fool than a foolish wit",
                 "the deploy of the render", "single", ""]:
        assert my_stream(composed, text) == ref_stream(ref, text), text
    # chaining composes left-to-right
    twice = composed | ("biword", (" ",))
    assert twice.chain[-1] == ("biword", (" ",))
    # inexpressible flags refuse rather than silently drop semantics
    with pytest.raises(TypeError):
        AnalyzerSpec(reverse=True) | ("shingle", (2, " "))
