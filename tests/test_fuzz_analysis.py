"""Randomized analyzer-chain conformance fuzz vs the reference.

Hypothesis feeds arbitrary mixed-script text (ascii, accents, CJK,
Greek/Cyrillic, emoji, punctuation runs) through paired analyzer chains
and asserts the (text, pos, startchar, endchar) token streams are
identical — the vectorized analyzer is the build hot path, and unicode
edges are where a vectorized reimplementation would drift.

Deterministic (``derandomize=True``).
"""

import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import load_whoosh_oracle
from whoosh_ray.functions.analysis import AnalyzerSpec, VectorAnalyzer
from whoosh_ray.functions.charset import accent_items


@pytest.fixture(scope="module", autouse=True)
def _oracle():
    load_whoosh_oracle()


ALPHABET = (
    "abcdefghijklm nopqrstuvwxyz ABCDEFGHIJKLM NOPQRSTUVWXYZ 0123456789 "
    ".,-_'^&*()[]@#:;!?/\\\"+=~`|<>{} \t\n"
    "éàüñößçĀŽžœÆ 日本語中 αβΓδ джЯб 🦙💡 ’“”"
)

texts = st.text(alphabet=st.sampled_from(list(ALPHABET)), max_size=80)


def ref_stream(analyzer, text, chars=False):
    if chars:
        return [(t.text, t.pos, t.startchar, t.endchar)
                for t in analyzer(text, positions=True, chars=True)]
    return [(t.text, t.pos) for t in analyzer(text, positions=True)]


def my_stream(spec, text, chars=False):
    tb = VectorAnalyzer(spec)([text], with_chars=chars)
    if chars:
        sc = tb.startchars if tb.startchars is not None else []
        ec = tb.endchars if tb.endchars is not None else []
        return list(zip(tb.terms.tolist(),
                        tb.positions.tolist(),
                        [int(x) for x in sc],
                        [int(x) for x in ec]))
    return list(zip(tb.terms.tolist(), tb.positions.tolist()))


def _pairs():
    """(AnalyzerSpec, reference analyzer, chars?) triples, built lazily
    so the oracle import happens inside the test session."""
    from whoosh import analysis as A

    return {
        "standard": (AnalyzerSpec(), A.StandardAnalyzer(), True),
        "simple": (AnalyzerSpec(stopwords=None, minsize=0),
                   A.SimpleAnalyzer(), True),
        "stemming": (AnalyzerSpec(stem=True),
                     A.StemmingAnalyzer(), False),
        "reverse": (AnalyzerSpec(reverse=True),
                    A.StandardAnalyzer() | A.ReverseTextFilter(), False),
        "substitute": (AnalyzerSpec(substitute=(r"[oO]", "0")),
                       A.RegexTokenizer() | A.LowercaseFilter()
                       | A.SubstitutionFilter(r"[oO]", "0")
                       | A.StopFilter(), False),
        # charmap applies after Lowercase and BEFORE Stop (the
        # AnalyzerSpec contract), so the paired reference chain orders
        # the same way
        "accent_fold": (AnalyzerSpec(charmap=accent_items()),
                        A.RegexTokenizer() | A.LowercaseFilter()
                        | A.CharsetFilter(dict(accent_items()))
                        | A.StopFilter(), False),
        "ngram_words": (AnalyzerSpec(stopwords=None, minsize=0,
                                     ngram=(2, 4)),
                        A.SimpleAnalyzer() | A.NgramFilter(2, 4), False),
    }


_CHAIN_KEYS = ["standard", "simple", "stemming", "reverse", "substitute",
               "accent_fold", "ngram_words"]


@settings(max_examples=600, deadline=None, derandomize=True)
@given(text=texts, key=st.sampled_from(_CHAIN_KEYS))
def test_analyzer_chains_stream_identical(text, key):
    spec, ref, chars = _pairs()[key]
    assert my_stream(spec, text, chars) == ref_stream(ref, text, chars), \
        (key, repr(text))
