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
    "fi": (("finnish", "FinnishStemmer"), "abcdefghijklmnopqrstuvwxyzäö",
           ["kaan", "sti", "kin", "han", "nsa", "mme", "si", "ni",
            "an", "en", "siin", "tten", "seen", "hin", "den", "tta",
            "ssa", "sta", "lla", "lta", "lle", "ksi", "ine", "ta",
            "na", "a", "n", "impi", "mmi", "eja", "issa", "ille",
            "iksi", "iin", "t", "et", "ien", "ään", "kö", "pä"]),
    "hu": (("hungarian", "HungarianStemmer"),
           "abcdefghijklmnopqrstuvwxyzöüáéíóõúû",
           ["al", "el", "ként", "ban", "ben", "nak", "nek", "val",
            "vel", "tól", "ról", "ból", "hoz", "nál", "ért", "kor",
            "ba", "ra", "ig", "at", "ul", "vá", "en", "on", "n", "t",
            "ánként", "án", "én", "astul", "stul", "ké", "éi", "é",
            "ájuk", "unk", "juk", "ánk", "nk", "uk", "em", "om", "od",
            "ja", "je", "m", "d", "a", "e", "o", "á", "jaitok",
            "aitok", "jaim", "eink", "itek", "jeik", "aim", "ai",
            "ik", "i", "ák", "ék", "ök", "ok", "ek", "ak", "k"]),
    "ro": (("romanian", "RomanianStemmer"),
           "abcdefghijklmnopqrstuvwxyzăâîşţ",
           ["iilor", "ului", "elor", "iile", "ilor", "atei", "aţie",
            "aţia", "aua", "ele", "iua", "iei", "ile", "ul", "ea",
            "ii", "abilitate", "ibilitate", "ivitate", "icitate",
            "icator", "aţiune", "atoare", "itoare", "iciva", "icala",
            "ativa", "atori", "itiva", "itor", "abila", "itate",
            "oasa", "anta", "ator", "iune", "isme", "ista", "ata",
            "uta", "ita", "ica", "osi", "ant", "iva", "ism", "ist",
            "at", "ut", "it", "ic", "os", "iv", "seserăţi", "aserăm",
            "ească", "arăţi", "ează", "eşti", "eaţi", "urăm", "asem",
            "are", "ire", "ind", "eze", "esc", "eam", "iau", "aşi",
            "ară", "ase", "aţi", "sei", "ez", "am", "ea", "ui", "ăm",
            "se", "ie", "a", "e", "i", "ă"]),
    "ru": (("russian", "RussianStemmer"),
           "абвгдежзийклмнопрстуфхцчшщъыьэюя",
           ["ившись", "ывшись", "вшись", "ивши", "вши", "ив", "в",
            "ся", "сь", "ший", "щий", "его", "ого", "ему", "ими",
            "ыми", "их", "ых", "ую", "яя", "ее", "ие", "ые", "ое",
            "ей", "ий", "ой", "ем", "им", "ым", "ом", "ешь", "ейте",
            "уйте", "ует", "ишь", "ете", "ют", "ила", "ыла", "ена",
            "ите", "или", "ыли", "ило", "ено", "ят", "ены", "ить",
            "ыть", "ла", "на", "ли", "ло", "но", "ет", "ны", "ть",
            "уй", "ил", "ен", "ит", "л", "н", "иями", "иях", "ями",
            "иям", "ах", "ию", "ья", "ев", "ов", "ье", "еи", "ии",
            "ам", "а", "е", "и", "й", "о", "у", "ы", "ь", "ость",
            "ост", "ейше", "ейш", "нн"]),
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


def test_isri_arabic_fuzz_parity():
    load_whoosh_oracle()
    from whoosh.lang.isri import ISRIStemmer

    from whoosh_ray.functions.isri import stem_ar

    ref = ISRIStemmer()
    letters = "ابتثجحخدذرزسشصضطظعغفقكلمنهويةئؤءآأإى"
    pre = list(ref.p3) + list(ref.p2) + list(ref.p1) + [""]
    suf = list(ref.s3) + list(ref.s2) + list(ref.s1) + [""]
    rng = random.Random(5)
    for _ in range(12000):
        w = (rng.choice(pre)
             + "".join(rng.choices(letters + "ًٌٍَُِّْ", k=rng.randint(1, 9)))
             + rng.choice(suf))
        assert stem_ar(w) == ref.stem(w), w
    for w in ref.stop_words:
        assert stem_ar(w) == ref.stem(w)


def test_stoplist_only_languages():
    # tr has a stop list but no stemmer (same as the reference registry)
    a = language_analyzer("tr").compile()
    assert a.token_lists(["bu bir kedi ve köpek"])[0] == \
        ["bir", "kedi", "köpek"]


def test_degraded_and_alias_languages(ref_stem):
    load_whoosh_oracle()
    from whoosh.analysis import LanguageAnalyzer

    # ro: stemmer but NO stop list -> no stop filter, no minsize floor
    sent = "copiii alergau fericiti prin gradinile orasului"
    ours = language_analyzer("ro").compile().token_lists([sent])[0]
    theirs = [t.text for t in LanguageAnalyzer("ro")(sent)]
    assert ours == theirs
    # unknown language degrades to tokenize+lowercase (reference quirk)
    sent2 = "Some WORDS here"
    ours2 = language_analyzer("xx").compile().token_lists([sent2])[0]
    theirs2 = [t.text for t in LanguageAnalyzer("xx")(sent2)]
    assert ours2 == theirs2 == ["some", "words", "here"]
    # aliases resolve like the reference registry
    assert (language_analyzer("english").lang
            == language_analyzer("eng").lang
            == language_analyzer("en").lang == "en")
    assert language_analyzer("français").lang == "fr"


def test_pystemmer_filter_facade():
    """PyStemmerFilter (reference morph.py:152-217) facade: named
    snowball algorithms resolve through the alias registry to the
    fuzz-verified stemmers when the C extension is absent; the ignore
    set and ValueError-on-unknown behaviors match the reference API."""
    import pytest

    from whoosh_ray.functions.analysis import AnalyzerSpec
    from whoosh_ray.functions.snowball import (STEMMERS,
                                               pystemmer_algorithms,
                                               resolve_stemmer)

    spec = AnalyzerSpec(chain=(
        ("tokenizer", (r"\w+", False)),
        ("lowercase", ()),
        ("pystemmer", ("spanish", ("corriendo",), 10000)),
    ))
    out = spec.compile().token_lists(["Corriendo gatos saltando"])[0]
    assert out == ["corriendo", "gat", "salt"]  # ignore honored

    assert resolve_stemmer("russian")("кошки") == STEMMERS["ru"]("кошки")
    assert resolve_stemmer("pt") is STEMMERS["pt"]
    with pytest.raises(ValueError):
        resolve_stemmer("klingon")
    algos = pystemmer_algorithms()
    assert "spanish" in algos and len(algos) == 15
