"""LanguageAnalyzer parity (reference analysis/analyzers.py:253-296):
per-language stop lists + snowball stemmers for German and Spanish.
Stemmer outputs are fuzz-matched against the reference's shipped
snowball implementations (including their translation quirks — RV
substring probe, step-2b-after-2a, first-match suffix precedence)."""

import random

import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.functions.analysis import language_analyzer
from whoosh_ray.functions.snowball import stem_de, stem_es

DE_SENTS = [
    "Die Häuser wurden schnell aufgebaut und die Kinder spielten",
    "Wissenschaftlichkeit und Freundlichkeit sind Eigenschaften",
    "Er läuft täglich durch die verschneiten Straßen der Städte",
    "Die Entwicklung neuer Möglichkeiten erfordert Aufmerksamkeit",
]
ES_SENTS = [
    "Los niños estaban jugando felizmente en los jardines",
    "La organización presentó nuevas soluciones tecnológicas",
    "Cantándoselo lentamente para que todos pudieran entenderlo",
    "Las universidades españolas publicaron investigaciones importantes",
]


@pytest.fixture(scope="module")
def ref():
    load_whoosh_oracle()
    from whoosh.analysis import LanguageAnalyzer
    from whoosh.lang.snowball.german import GermanStemmer
    from whoosh.lang.snowball.spanish import SpanishStemmer

    return {
        "de": (LanguageAnalyzer("de"), GermanStemmer().stem),
        "es": (LanguageAnalyzer("es"), SpanishStemmer().stem),
    }


@pytest.mark.parametrize("lang,sents", [("de", DE_SENTS), ("es", ES_SENTS)])
def test_language_analyzer_stream_parity(ref, lang, sents):
    mine = language_analyzer(lang).compile()
    ref_ana, _ = ref[lang]
    for sent in sents:
        ours = mine.token_lists([sent])[0]
        theirs = [t.text for t in ref_ana(sent)]
        assert ours == theirs, (lang, sent)


@pytest.mark.parametrize("lang", ["de", "es"])
def test_stemmer_fuzz_parity(ref, lang):
    _, ref_stem = ref[lang]
    mine = {"de": stem_de, "es": stem_es}[lang]
    rng = random.Random(13)
    chars = ("abcdefghijklmnopqrstuvwxyzäöüß" if lang == "de"
             else "abcdefghijklmnopqrstuvwxyzáéíóúüñ")
    sfx = (["ung", "heit", "keit", "lich", "isch", "ern", "en", "est",
            "st", "niss", "nisse", "igkeit", "erinnen"]
           if lang == "de" else
           ["amientos", "ación", "logía", "ución", "encia", "mente",
            "idad", "iva", "ándoselas", "iéndoselo", "aba", "ieron",
            "uyendo", "íamos", "guen", "es", "amente", "atividad"])
    for _ in range(20000):
        w = "".join(rng.choices(chars, k=rng.randint(1, 12)))
        if rng.random() < 0.7:
            w += rng.choice(sfx)
        assert mine(w) == ref_stem(w), w


def test_stoplist_only_languages():
    a = language_analyzer("fr").compile()
    # stop list applied, no stemming (documented divergence)
    assert a.token_lists(["le chat et un chien de la rue"])[0] == \
        ["chat", "chien", "rue"]
    with pytest.raises(ValueError):
        language_analyzer("xx")
