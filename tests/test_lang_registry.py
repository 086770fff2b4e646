"""whoosh_ray.lang registry + per-language stemmer parity vs the
reference whoosh.lang (two_letter_code / has_stemmer / has_stopwords /
stemmer_for_language / stopwords_for_language / stoplists)."""

import pytest

from tests.conftest import load_whoosh_oracle


@pytest.fixture(scope="module", autouse=True)
def _oracle():
    load_whoosh_oracle()


def test_registry_parity():
    import whoosh.lang as wl

    import whoosh_ray.lang as ml

    assert ml.languages == wl.languages
    names = list(wl.languages) + list(wl.aliases) + ["xx", "klingon",
                                                     "en_porter"]
    for n in names:
        assert ml.two_letter_code(n) == wl.two_letter_code(n), n
        assert ml.has_stemmer(n) == wl.has_stemmer(n), n
        assert ml.has_stopwords(n) == wl.has_stopwords(n), n
    with pytest.raises(ml.NoStemmer):
        ml.stemmer_for_language("xx")
    with pytest.raises(ml.NoStopWords):
        ml.stopwords_for_language("ro")


def test_stemmer_behavior_parity():
    import whoosh.lang as wl

    import whoosh_ray.lang as ml

    words = ["running", "nationalities", "connection", "aufeinander",
             "generaciones", "historiquement", "bellissimo"]
    for lg in wl.languages:
        if not wl.has_stemmer(lg):
            continue
        rs, ms = wl.stemmer_for_language(lg), ml.stemmer_for_language(lg)
        for w in words:
            assert ms(w) == rs(w), (lg, w)
    assert (ml.stemmer_for_language("en_porter")("running")
            == wl.stemmer_for_language("en_porter")("running"))


def test_stoplists_parity():
    import whoosh.lang.stopwords as ws

    from whoosh_ray.lang import stopwords_for_language
    from whoosh_ray.lang.stopwords import stoplists

    for lg, words in ws.stoplists.items():
        if lg in stoplists:
            assert stoplists[lg] == frozenset(words), lg
            assert stopwords_for_language(lg) == frozenset(words), lg


def test_lang_submodule_aliases():
    from whoosh_ray.lang.dmetaphone import double_metaphone
    from whoosh_ray.lang.morph_en import variations
    from whoosh_ray.lang.paicehusk import stem as ph_stem
    from whoosh_ray.lang.porter import stem as p_stem
    from whoosh_ray.lang.porter2 import stem as p2_stem

    assert p_stem("running") == "runn"      # inert double-consonant quirk
    assert p2_stem("running") == "run"
    assert "rendered" in variations("render")
    assert double_metaphone("smith")
    # Paice-Husk's protect rules ERASE the stem in the reference too —
    # pinned bug-for-bug (see functions/paicehusk.py)
    from whoosh.lang.paicehusk import stem as ref_ph

    assert ph_stem("classical") == ref_ph("classical")
