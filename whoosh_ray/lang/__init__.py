"""Drop-in lang surface (reference whoosh/lang/__init__.py): language
registry helpers over the engine's stemmer/stoplist tables
(functions/snowball.py STEMMERS — all 15 reference languages incl. the
ISRI Arabic stemmer — and functions/lang_stopwords_data.py)."""

from whoosh_ray.functions.analysis import LANG_ALIASES as aliases


class NoStemmer(Exception):
    pass


class NoStopWords(Exception):
    pass


#: reference lang/__init__.py:43-44
languages = ("ar", "da", "nl", "en", "fi", "fr", "de", "hu", "it",
             "no", "pt", "ro", "ru", "es", "sv", "tr")


def two_letter_code(name: str) -> str | None:
    """Reference lang/__init__.py:88-93: only registered languages and
    aliases resolve; anything else is None."""
    if name in languages:
        return name
    return aliases.get(name)


def has_stemmer(lang: str) -> bool:
    try:
        return bool(stemmer_for_language(lang))
    except NoStemmer:
        return False


def has_stopwords(lang: str) -> bool:
    try:
        return bool(stopwords_for_language(lang))
    except NoStopWords:
        return False


def stemmer_for_language(lang: str):
    """Stemming function for the language (reference :111-129).
    "en_porter" selects the classic porter variant; everything else
    routes through the snowball/ISRI table (en = the snowball English
    stemmer, like the reference's snowball classes)."""
    if lang == "en_porter":
        from whoosh_ray.functions.porter import stem

        return stem
    from whoosh_ray.functions.snowball import STEMMERS

    tlc = two_letter_code(lang)
    if tlc in STEMMERS:
        return STEMMERS[tlc]
    raise NoStemmer(f"No stemmer available for {lang!r}")


def stopwords_for_language(lang: str):
    """Stop-word frozenset for the language (reference :133-140)."""
    from whoosh_ray.functions.lang_stopwords_data import STOPLISTS

    tlc = two_letter_code(lang)
    if tlc in STOPLISTS:
        return frozenset(STOPLISTS[tlc])
    raise NoStopWords(f"No stop-word list available for {lang!r}")
