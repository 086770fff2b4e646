"""LanguageAnalyzer parity (reference analysis/analyzers.py:253-296):
per-language stop lists + snowball stemmers for every language the
reference ships a snowball class for.  Stemmer outputs are fuzz-matched
against the reference's shipped implementations (including their
translation quirks — RV substring probe, step-2b-after-2a, first-match
suffix precedence, the Scandinavian ``word[3:]`` R1 floor)."""

import random

import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.functions.analysis import language_analyzer
from whoosh_ray.functions.snowball import STEMMERS

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

# (reference snowball module, class name), fuzz alphabet, seed suffixes
LANGS = {
    "de": (("german", "GermanStemmer"), "abcdefghijklmnopqrstuvwxyzäöüß",
           ["ung", "heit", "keit", "lich", "isch", "ern", "en", "est",
            "st", "niss", "nisse", "igkeit", "erinnen"]),
    "es": (("spanish", "SpanishStemmer"),
           "abcdefghijklmnopqrstuvwxyzáéíóúüñ",
           ["amientos", "ación", "logía", "ución", "encia", "mente",
            "idad", "iva", "ándoselas", "iéndoselo", "aba", "ieron",
            "uyendo", "íamos", "guen", "es", "amente", "atividad"]),
    "da": (("danish", "DanishStemmer"), "abcdefghijklmnopqrstuvwxyzæøå",
           ["hedens", "erende", "ethed", "erne", "ende", "elig", "løst",
            "lig", "en", "er", "et", "es", "e", "s", "gd", "dt"]),
    "sv": (("swedish", "SwedishStemmer"), "abcdefghijklmnopqrstuvwxyzäöå",
           ["heterna", "ornas", "ande", "arna", "erna", "heten", "anden",
            "aste", "ast", "lig", "els", "ig", "fullt", "löst", "en",
            "ar", "er", "et", "es", "s"]),
    "no": (("norwegian", "NorwegianStemmer"),
           "abcdefghijklmnopqrstuvwxyzæøå",
           ["hetenes", "endes", "ande", "ende", "edes", "enes",
            "hetens", "ers", "ets", "astes", "erte", "ert", "eleg",
            "leg", "eig", "lov", "elov", "slov", "hetslov", "en", "et",
            "e", "s"]),
    "nl": (("dutch", "DutchStemmer"), "abcdefghijklmnopqrstuvwxyzèéë",
           ["heden", "ende", "enheid", "baar", "lijk", "ingen", "isch",
            "elijk", "en", "se", "s", "e", "heid", "ing", "end", "ig",
            "bar"]),
    "en": (("english", "EnglishStemmer"), "abcdefghijklmnopqrstuvwxyz",
           ["ational", "ization", "fulness", "iveness", "ousness",
            "biliti", "tional", "ation", "alism", "ement", "ing", "ed",
            "edly", "ingly", "es", "s", "ly", "ness", "ful", "ant",
            "ence", "ibility", "ies", "ied"]),
    "fr": (("french", "FrenchStemmer"),
           "abcdefghijklmnopqrstuvwxyzàâçèéêëîïôùûü",
           ["issements", "issement", "atrices", "ication", "iqUes",
            "ances", "ements", "ités", "ives", "eaux", "aux", "euses",
            "ment", "emment", "amment", "ions", "ez", "ais", "ait",
            "ant", "er", "ira", "asse", "ante", "eux", "é", "ée",
            "ées", "és", "èrent", "e", "es", "s"]),
    "it": (("italian", "ItalianStemmer"),
           "abcdefghijklmnopqrstuvwxyzàèéìíîòóùú",
           ["azione", "amento", "atrice", "ibilità", "mente", "isti",
            "anza", "iche", "ando", "endo", "ar", "ire", "ò", "ata",
            "ate", "ati", "ato", "ava", "erà", "erebbe", "iamo",
            "iano", "are", "ere", "ite", "ita", "i", "e", "a", "o"]),
    "pt": (("portugese", "PortugueseStemmer"),
           "abcdefghijklmnopqrstuvwxyzàáâãçéêíóôõú",
           ["amentos", "imentos", "adoras", "ância", "logía", "ución",
            "ências", "amente", "idades", "ismos", "istas", "osas",
            "ação", "ações", "ava", "áveis", "íamos", "ariam",
            "assem", "eiro", "eira", "ando", "endo", "indo", "ar",
            "er", "ir", "os", "as", "a", "e", "o", "ã", "ões"]),
}


@pytest.fixture(scope="module")
def ref_stem():
    load_whoosh_oracle()

    def get(lang):
        mod, cls = LANGS[lang][0]
        m = __import__(f"whoosh.lang.snowball.{mod}", fromlist=[cls])
        return getattr(m, cls)().stem

    return get


def test_stemmer_registry_matches_reference():
    # every language in STEMMERS has a fuzz config here, and vice versa
    assert set(LANGS) <= set(STEMMERS)


@pytest.mark.parametrize("lang,sents", [("de", DE_SENTS), ("es", ES_SENTS)])
def test_language_analyzer_stream_parity(ref_stem, lang, sents):
    load_whoosh_oracle()
    from whoosh.analysis import LanguageAnalyzer

    mine = language_analyzer(lang).compile()
    ref_ana = LanguageAnalyzer(lang)
    for sent in sents:
        ours = mine.token_lists([sent])[0]
        theirs = [t.text for t in ref_ana(sent)]
        assert ours == theirs, (lang, sent)


@pytest.mark.parametrize("lang", sorted(LANGS))
def test_stemmer_fuzz_parity(ref_stem, lang):
    refs = ref_stem(lang)
    mine = STEMMERS[lang]
    _, chars, sfx = LANGS[lang]
    rng = random.Random(13)
    for _ in range(12000):
        w = "".join(rng.choices(chars, k=rng.randint(1, 12)))
        if rng.random() < 0.7:
            w += rng.choice(sfx)
        assert mine(w) == refs(w), w


def test_stoplist_only_languages():
    # tr has a stop list but no stemmer (same as the reference registry)
    a = language_analyzer("tr").compile()
    assert a.token_lists(["bu bir kedi ve köpek"])[0] == \
        ["bir", "kedi", "köpek"]
    with pytest.raises(ValueError):
        language_analyzer("xx")
