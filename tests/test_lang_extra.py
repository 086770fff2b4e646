"""Parity tests for the lang long tail: porter2, Lovins, Paice-Husk,
phonetic encoders, and the WordNet thesaurus machinery — each checked
against the reference implementation, including its crash behaviors."""

import random

import pytest

from tests.conftest import load_whoosh_oracle

load_whoosh_oracle()

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def both(fn_ref, fn_mine, word):
    def run(fn):
        try:
            return fn(word)
        except Exception as e:  # crash parity: compare exception types
            return ("EXC", type(e).__name__)
    return run(fn_ref), run(fn_mine)


def fuzz_words(seed, n, suffixes, alphabet=ALPHA + "'"):
    rng = random.Random(seed)
    out = set()
    for _ in range(n):
        base = "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(0, 8)))
        out.add(base + rng.choice(suffixes))
    return sorted(out)


# ---- porter2 ----

def test_porter2_parity_fuzz():
    from whoosh.lang.porter2 import stem as ref

    from whoosh_ray.functions.porter2 import stem as mine

    sufs = ["ization", "ational", "iveness", "tional", "biliti", "entli",
            "ation", "ingly", "edly", "ied", "ies", "sses", "eedly",
            "eed", "ing", "ed", "li", "ly", "y", "ness", "ful", "icate",
            "ative", "alize", "iciti", "ical", "ement", "s", "'s", "'s'",
            "'", "ance", "er", "able", "ent", "ate", "ous", "ive", "ize",
            "sion", "tion", "ll", "e", ""]
    for w in fuzz_words(42, 20000, sufs):
        a, b = both(ref, mine, w)
        assert a == b, (w, a, b)
    # exceptional forms + region-override prefixes
    for w in ["skis", "dying", "early", "news", "generously", "arsenal",
              "communication", "inning", "proceed", "supposedly"]:
        assert mine(w) == ref(w), w


# ---- Lovins ----

def test_lovins_tables_match_reference():
    from whoosh.lang import lovins as REF

    from whoosh_ray.functions import lovins as MINE

    refmap = {}
    for el in range(1, 12):
        for ending, cond in REF.m[el].items():
            refmap[ending] = cond.__name__
    assert refmap == MINE.ENDINGS
    assert [tuple(r) for r in REF._endings] == [tuple(r)
                                                for r in MINE._RECODE]


def test_lovins_parity_fuzz():
    from whoosh.lang.lovins import stem as ref

    from whoosh_ray.functions import lovins

    sufs = (list(lovins.ENDINGS)[::7]
            + ["", "end", "uct", "mit", "yz", "ly", "arly", "ar"])
    for w in fuzz_words(99, 20000, sufs):
        a, b = both(ref, lovins.stem, w)
        assert a == b, (w, a, b)


def test_lovins_crash_parity():
    from whoosh.lang.lovins import stem as ref

    from whoosh_ray.functions.lovins import stem as mine

    # K/X probe base[-3] before their length guards; recoding indexes
    # one char before a whole-word target
    for w in ["nearly", "soar", "end", ""]:
        with pytest.raises(IndexError):
            ref(w)
        with pytest.raises(IndexError):
            mine(w)


# ---- Paice-Husk ----

def test_paicehusk_rule_table_matches_reference():
    from whoosh.lang.paicehusk import PaiceHuskStemmer as RefPH
    from whoosh.lang.paicehusk import defaultrules

    from whoosh_ray.functions.paicehusk import RULES, PaiceHuskStemmer

    refrules = RefPH(defaultrules).rules
    minerules = PaiceHuskStemmer(RULES).rules
    assert refrules == minerules
    # the textual rule parser accepts the reference format too
    assert PaiceHuskStemmer(defaultrules).rules == refrules


def test_paicehusk_parity_fuzz():
    from whoosh.lang.paicehusk import stem as ref

    from whoosh_ray.functions.paicehusk import stem as mine

    sufs = ["ness", "ied", "ceed", "ed", "hood", "e", "ing", "ish",
            "abl", "ful", "al", "ium", "ism", "sion", "ion", "een",
            "en", "ship", "er", "ear", "ies", "ss", "ous", "us", "s",
            "ment", "ent", "sist", "ist", "iv", "bly", "ily", "ply",
            "ly", "ity", "ary", "ncy", "acy", "iz", "y", "th", "um",
            "ia", "a", "'t", ""]
    for w in fuzz_words(13, 20000, sufs):
        a, b = both(ref, mine, w)
        assert a == b, (w, a, b)


def test_paicehusk_quirks():
    from whoosh.lang.paicehusk import stem as ref

    from whoosh_ray.functions.paicehusk import stem as mine

    # remove-0 "protect" rules slice stem[:0-0] and ERASE the stem
    for w in ["mess", "screen", "sister", "apply", "deceive"]:
        assert ref(w) == "" and mine(w) == "", w
    # prefix strip can empty the stem; vowel-less stems crash the
    # first-vowel probe — both pinned as crashes
    for w in ["kilo", "xyz", "try"]:
        with pytest.raises((ValueError, IndexError)):
            ref(w)
        with pytest.raises((ValueError, IndexError)):
            mine(w)
    # leading \w+ truncation: "can't" stems just "can"
    assert mine("can't") == ref("can't")


# ---- phonetic ----

def test_soundex_parity():
    from whoosh.lang import phonetic as REF

    from whoosh_ray.functions import phonetic as MINE

    rng = random.Random(7)
    en = ["".join(rng.choice(ALPHA + "019 -é")
                  for _ in range(rng.randint(0, 10))) for _ in range(5000)]
    for w in en:
        a, b = both(REF.soundex_en, MINE.soundex_en, w)
        assert a == b, (w, a, b)
    es = ["".join(rng.choice(ALPHA + "áéíóúüñ")
                  for _ in range(rng.randint(0, 10))) for _ in range(5000)]
    for w in es:
        a, b = both(REF.soundex_esp, MINE.soundex_esp, w)
        assert a == b, (w, a, b)
    ar_alphabet = "ابتثجحخدذرزسشصضطظعغفقكلمنهويأإآء0a"
    ar = ["".join(rng.choice(ar_alphabet)
                  for _ in range(rng.randint(0, 8))) for _ in range(5000)]
    for w in ar:
        a, b = both(REF.soundex_ar, MINE.soundex_ar, w)
        assert a == b, (w, a, b)
    # quirk pins: no-alpha input TypeErrors in English; unmapped first
    # char crashes Arabic
    with pytest.raises(TypeError):
        MINE.soundex_en("123")
    with pytest.raises((UnboundLocalError, NameError)):
        MINE.soundex_ar("abc")


# ---- stemfn analyzer chain ----

def test_stemfn_chain_matches_reference_stemfilter():
    from whoosh.analysis import RegexTokenizer, StemFilter
    from whoosh.lang.lovins import stem as lovins_stem
    from whoosh.lang.porter2 import stem as porter2_stem

    from whoosh_ray.functions.analysis import AnalyzerSpec, VectorAnalyzer

    texts = ["nationally accepted kindness classified",
             "the materialization of gravitational fields",
             "fishing fished fish fisher fishers"]
    for name, ref_fn in [("lovins", lovins_stem),
                         ("porter2", porter2_stem)]:
        ref = RegexTokenizer() | StemFilter(ref_fn)
        spec = AnalyzerSpec(chain=(("stemfn", (name, None, 50000)),))
        for text in texts:
            tb = VectorAnalyzer(spec)([text])
            mine = list(zip(tb.terms.tolist(), tb.positions.tolist()))
            want = [(t.text, t.pos) for t in ref(text, positions=True)]
            assert mine == want, (name, text)


# ---- WordNet thesaurus ----

WN_FIXTURE = """\
s(100001,1,'hail',v,1,0).
s(100001,2,'acclaim',v,1,0).
s(100001,3,'herald',v,1,0).
s(100002,1,'hail',v,2,0).
s(100002,2,'come',v,1,0).
s(100003,1,'light',n,1,0).
s(100003,2,'luminosity',n,1,0).
s(100003,3,'brightness',n,1,0).
s(100004,1,'light',a,1,0).
s(100004,2,'weightless',a,1,0).
s(100005,1,'multi-word',n,1,0).
x(999999,1,'ignored',n,1,0).
"""


def test_wordnet_parse_and_synonyms_parity():
    import io

    from whoosh.lang import wordnet as REF

    from whoosh_ray.functions import wordnet as MINE

    rw2n, rn2w = REF.parse_file(io.StringIO(WN_FIXTURE))
    mw2n, mn2w = MINE.parse_file(io.StringIO(WN_FIXTURE))
    assert dict(rw2n) == dict(mw2n)
    assert dict(rn2w) == dict(mn2w)
    # non-alpha words are dropped at parse
    assert "multi-word" not in mw2n

    rt = REF.Thesaurus.from_file(io.StringIO(WN_FIXTURE))
    mt = MINE.Thesaurus.from_file(io.StringIO(WN_FIXTURE))
    for w in ["hail", "light", "come", "acclaim", "nosuchword"]:
        assert mt.synonyms(w) == rt.synonyms(w), w
    assert mt.synonyms("hail") == ["acclaim", "come", "herald"]


def test_wordnet_storage_roundtrip(tmp_path):
    import io

    from whoosh_ray.functions import wordnet as MINE

    mem = MINE.Thesaurus.from_file(io.StringIO(WN_FIXTURE))
    mem.to_storage(str(tmp_path))
    disk = MINE.Thesaurus.from_storage(str(tmp_path))
    for w in sorted(mem.w2n):
        assert disk.synonyms(w) == mem.synonyms(w), w
    # unloaded thesaurus refuses to_storage (reference parity)
    with pytest.raises(Exception):
        MINE.Thesaurus().to_storage(str(tmp_path), "OTHER")
