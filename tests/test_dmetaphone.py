"""Double Metaphone parity vs the reference (lang/dmetaphone.py,
analysis/morph.py:218-267).

Our implementation is a data-driven rule table (functions/dmetaphone.py)
rather than a branch cascade; these tests pin code-for-code parity on a
curated quirk list plus a 100k-word structured fuzz, and stream parity
(text, pos, boost) for the DoubleMetaphoneFilter chain stage."""

import random

import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.functions.dmetaphone import double_metaphone
from whoosh_ray.functions.tokenfilters import analyze_row, compile_chain

# Words chosen to hit every published rule plus the reference
# translation's quirks (stale-action fallthrough, dead -EWSKI-/-ger-
# clauses, J-at-end secondary space).
QUIRK_WORDS = [
    "", "jose", "san jacinto", "josefina", "sugar", "caesar", "island",
    "isle", "carlisle", "carlysle", "school", "schooner", "schermerhorn",
    "schenker", "thomas", "thames", "smith", "schmidt", "snider",
    "schneider", "filipowicz", "wasserman", "vasserman", "arnow",
    "arnoff", "dumb", "thumb", "edge", "edgar", "ghislane", "ghiradelli",
    "hugh", "laugh", "mclaughlin", "cough", "gough", "rough", "tough",
    "cagney", "tagliaro", "biaggi", "danger", "ranger", "manger",
    "jankelowicz", "yankelovich", "bajador", "cabrillo", "gallegos",
    "rogier", "hochmeier", "breaux", "zhao", "czerny", "focaccia",
    "bellocchio", "bacchus", "accident", "accede", "succeed", "bacci",
    "bertucci", "mac caffrey", "mac gregor", "mcclellan", "michael",
    "chianti", "chorus", "chore", "orchestra", "architect", "orchid",
    "von schmidt", "van dyke", "resnais", "artois", "campbell",
    "raspberry", "nowakowski", "ewski",
    # stale-action fallthrough: vowel + GH in the first three letters
    # re-applies the previous letter's output ("agha" -> "AA")
    "agha", "aghast", "ogham", "high", "weigh", "sighing", "nihgh",
    # J at end of word: secondary gets a literal trailing space
    "raj", "taj", "j", "jj", "hajj",
    # doubled letters and one-letter words
    "rr", "zz", "xx", "ssz", "r", "s", "x", "z", "q", "w", "y",
    "ça", "ñandu", "peña",
]


@pytest.fixture(scope="module")
def ref():
    load_whoosh_oracle()
    from whoosh.lang.dmetaphone import double_metaphone as ref_dm

    return ref_dm


def test_quirk_words_parity(ref):
    for w in QUIRK_WORDS:
        assert double_metaphone(w) == ref(w), w


def test_structured_fuzz_parity(ref):
    rng = random.Random(4207)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    clusters = [
        "sch", "ch", "gh", "gn", "kn", "pn", "wr", "ps", "cz", "cc",
        "ck", "sc", "sh", "th", "wicz", "witz", "jose", "san ", "von ",
        "van ", "mc", "umb", "illo", "alle", "ier", "tion", "tia",
        "tch", "zh", " c", " g", " q", "isl", "sugar", "caesar",
        "aggi", "oggi", "ough", "ugh", "ewski", "owsky",
    ]
    for _ in range(100000):
        parts = [
            rng.choice(clusters) if rng.random() < 0.5
            else "".join(rng.choices(alpha, k=rng.randint(1, 4)))
            for _ in range(rng.randint(1, 5))
        ]
        w = "".join(parts)
        assert double_metaphone(w) == ref(w), w


def _ref_stream(ref_chain, text):
    return [(t.text, t.boost) for t in ref_chain(text)]


@pytest.mark.parametrize("combine", [False, True])
def test_filter_stream_parity(ref, combine):
    load_whoosh_oracle()
    from whoosh.analysis import DoubleMetaphoneFilter, RegexTokenizer

    ref_chain = RegexTokenizer() | DoubleMetaphoneFilter(
        primary_boost=2.0, secondary_boost=0.5, combine=combine)
    tokenize, fns = compile_chain(
        (("dmetaphone", (2.0, 0.5, combine)),))

    texts = [
        "Smith Schmidt lived on High Street near San Jacinto",
        "Jose and Raj laugh at the chianti in Edinburgh",
        "filipowicz wasserman arnow cabrillo agha",
    ]
    from whoosh_ray.functions.tokenfilters import _apply

    for text in texts:
        ours = [(t.text, t.boost) for t in _apply(fns, tokenize(text))]
        theirs = _ref_stream(ref_chain, text)
        assert ours == theirs, text


def test_filter_positions_follow_source():
    tokenize, fns = compile_chain((("dmetaphone", (1.0, 0.5, False)),))
    from whoosh_ray.functions.tokenfilters import _apply

    toks = list(_apply(fns, tokenize("smith high agha")))
    # primary (and secondary, when present) keep the source position
    assert [(t.text, t.pos) for t in toks] == [
        ("SM0", 0), ("XMT", 0), ("HH", 1), ("AA", 2)]
