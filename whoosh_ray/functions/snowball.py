"""Snowball stemmers for German and Spanish.

The algorithms are published (snowballstem.org: german/stemmer.html,
spanish/stemmer.html); this module implements them as suffix tables +
small step functions over a (word, r1, r2[, rv]) state, matching the
REFERENCE engine's shipped stemmers output-for-output (fuzz-tested in
tests/test_language.py) — including the translation quirks its
NLTK-heritage code carries (first-match precedence over ordered suffix
tuples rather than longest-match, clamped negative slices when a
region is shorter than the probe window, and region strings that are
deliberately NOT updated in some branches).  Reference:
/root/reference/src/whoosh/lang/snowball/german.py and spanish.py —
behavioral parity targets, not code sources.
"""

from __future__ import annotations

# ---------------------------------------------------------------- regions


def _r1r2(word: str, vowels: str) -> tuple[str, str]:
    """Standard R1/R2: the region after the first non-vowel following a
    vowel (R2: the same rule applied inside R1)."""
    r1 = r2 = ""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = word[i + 1:]
            break
    for i in range(1, len(r1)):
        if r1[i] not in vowels and r1[i - 1] in vowels:
            r2 = r1[i + 1:]
            break
    return r1, r2


def _rv(word: str, vowels: str) -> str:
    """RV (Spanish/Italian/Portuguese family) — with the reference's
    quirk reproduced on purpose: its "first two letters are vowels"
    test is ``word[:2] in vowels``, a SUBSTRING probe of the vowel
    string, so only adjacent pairs of the vowel alphabet take the
    vowel-vowel branch (snowball/bases.py:125)."""
    if len(word) < 2:
        return ""
    if word[1] not in vowels:
        for i in range(2, len(word)):
            if word[i] in vowels:
                return word[i + 1:]
        return ""
    if word[:2] in vowels:
        for i in range(2, len(word)):
            if word[i] not in vowels:
                return word[i + 1:]
        return ""
    return word[3:]


# ---------------------------------------------------------------- german

_DE_VOWELS = "aeiouy\xe4\xf6\xfc"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"
_DE_STEP1 = ("ern", "em", "er", "en", "es", "e", "s")
_DE_STEP2 = ("est", "en", "er", "st")
_DE_STEP3 = ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")


def stem_de(word: str) -> str:
    word = word.lower().replace("\xdf", "ss")
    # mark u/y between vowels (single left-to-right pass over the
    # evolving string: an upper-case mark is no longer a vowel for the
    # next window)
    for i in range(1, len(word) - 1):
        if (word[i - 1] in _DE_VOWELS and word[i + 1] in _DE_VOWELS
                and word[i] in "uy"):
            word = word[:i] + word[i].upper() + word[i + 1:]

    r1, r2 = _r1r2(word, _DE_VOWELS)
    # R1 floor: the region before R1 must have >= 3 letters
    for i in range(1, len(word)):
        if word[i] not in _DE_VOWELS and word[i - 1] in _DE_VOWELS:
            if 0 < i + 1 < 3:
                r1 = word[3:]
            break

    # step 1 (first match wins)
    for sfx in _DE_STEP1:
        if not r1.endswith(sfx):
            continue
        n = len(sfx)
        if sfx in ("en", "es", "e") and word[-n - 4:-n] == "niss":
            word, r1, r2 = word[:-n - 1], r1[:-n - 1], r2[:-n - 1]
        elif sfx == "s":
            if word[-2] in _DE_S_END:
                word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
        else:
            word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
        break

    # step 2
    for sfx in _DE_STEP2:
        if not r1.endswith(sfx):
            continue
        if sfx == "st":
            if word[-3] in _DE_ST_END and len(word) - 3 >= 3:
                word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
        else:
            n = len(sfx)
            word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
        break

    # step 3 (derivational)
    for sfx in _DE_STEP3:
        if not r2.endswith(sfx):
            continue
        n = len(sfx)
        if sfx in ("end", "ung"):
            if "ig" in r2[-n - 2:-n] and "e" not in r2[-n - 3:-n - 2]:
                word = word[:-n - 2]
            else:
                word = word[:-n]
        elif sfx in ("ig", "ik", "isch"):
            if "e" not in r2[-n - 1:-n]:
                word = word[:-n]
        elif sfx in ("lich", "heit"):
            if "er" in r1[-n - 2:-n] or "en" in r1[-n - 2:-n]:
                word = word[:-n - 2]
            else:
                word = word[:-n]
        else:  # keit
            if "lich" in r2[-n - 4:-n]:
                word = word[:-n - 4]
            elif "ig" in r2[-n - 2:-n]:
                word = word[:-n - 2]
            else:
                word = word[:-n]
        break

    return (word.replace("\xe4", "a").replace("\xf6", "o")
            .replace("\xfc", "u").replace("U", "u").replace("Y", "y"))


# ---------------------------------------------------------------- spanish

_ES_VOWELS = "aeiou\xe1\xe9\xed\xf3\xfa\xfc"
_ES_STEP0 = ("selas", "selos", "sela", "selo", "las", "les", "los",
             "nos", "me", "se", "la", "le", "lo")
_ES_STEP1 = ("amientos", "imientos", "amiento", "imiento", "aciones",
             "uciones", "adoras", "adores", "ancias", "log\xedas",
             "encias", "amente", "idades", "anzas", "ismos", "ables",
             "ibles", "istas", "adora", "aci\xf3n", "antes", "ancia",
             "log\xeda", "uci\xf3n", "encia", "mente", "anza", "icos",
             "icas", "ismo", "able", "ible", "ista", "osos", "osas",
             "ador", "ante", "idad", "ivas", "ivos", "ico", "ica",
             "oso", "osa", "iva", "ivo")
_ES_STEP2A = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
              "yes", "ya", "ye", "yo", "y\xf3")
_ES_STEP2B = ("ar\xedamos", "er\xedamos", "ir\xedamos", "i\xe9ramos",
              "i\xe9semos", "ar\xedais", "aremos", "er\xedais", "eremos",
              "ir\xedais", "iremos", "ierais", "ieseis", "asteis",
              "isteis", "\xe1bamos", "\xe1ramos", "\xe1semos",
              "ar\xedan", "ar\xedas", "ar\xe9is", "er\xedan", "er\xedas",
              "er\xe9is", "ir\xedan", "ir\xedas", "ir\xe9is", "ieran",
              "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
              "arais", "aseis", "\xe9amos", "ar\xe1n", "ar\xe1s",
              "ar\xeda", "er\xe1n", "er\xe1s", "er\xeda", "ir\xe1n",
              "ir\xe1s", "ir\xeda", "iera", "iese", "aste", "iste",
              "aban", "aran", "asen", "aron", "ando", "abas", "adas",
              "idas", "aras", "ases", "\xedais", "ados", "idos",
              "amos", "imos", "emos", "ar\xe1", "ar\xe9", "er\xe1",
              "er\xe9", "ir\xe1", "ir\xe9", "aba", "ada", "ida", "ara",
              "ase", "\xedan", "ado", "ido", "\xedas", "\xe1is",
              "\xe9is", "\xeda", "ad", "ed", "id", "an", "i\xf3", "ar",
              "er", "ir", "as", "\xeds", "en", "es")
_ES_STEP3 = ("os", "a", "e", "o", "\xe1", "\xe9", "\xed", "\xf3")

_ES_DEACCENT = str.maketrans("\xe1\xe9\xed\xf3\xfa", "aeiou")
_ES_DEACCENT3 = str.maketrans("\xe1\xe9\xed", "aei")


def stem_es(word: str) -> str:
    word = word.lower()
    r1, r2 = _r1r2(word, _ES_VOWELS)
    rv = _rv(word, _ES_VOWELS)
    step1_ok = False

    # step 0: attached pronoun
    for sfx in _ES_STEP0:
        if not word.endswith(sfx):
            continue
        n = len(sfx)
        if rv.endswith(sfx):
            head = rv[:-n]
            if head.endswith(("i\xe9ndo", "\xe1ndo", "\xe1r", "\xe9r",
                              "\xedr")):
                word = word[:-n].translate(_ES_DEACCENT3)
                r1 = r1[:-n].translate(_ES_DEACCENT3)
                r2 = r2[:-n].translate(_ES_DEACCENT3)
                rv = head.translate(_ES_DEACCENT3)
            elif (head.endswith(("ando", "iendo", "ar", "er", "ir"))
                  or (head.endswith("yendo")
                      and word[:-n].endswith("uyendo"))):
                word, r1, r2, rv = word[:-n], r1[:-n], r2[:-n], head
        break

    # step 1: standard suffixes (first match wins)
    for sfx in _ES_STEP1:
        if not word.endswith(sfx):
            continue
        n = len(sfx)
        if sfx == "amente" and r1.endswith(sfx):
            step1_ok = True
            word, r2, rv = word[:-6], r2[:-6], rv[:-6]
            if r2.endswith("iv"):
                word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                if r2.endswith("at"):
                    word, rv = word[:-2], rv[:-2]
            elif r2.endswith(("os", "ic", "ad")):
                word, rv = word[:-2], rv[:-2]
        elif r2.endswith(sfx):
            step1_ok = True
            if sfx in ("adora", "ador", "aci\xf3n", "adoras", "adores",
                       "aciones", "ante", "antes", "ancia", "ancias"):
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                if r2.endswith("ic"):
                    word, rv = word[:-2], rv[:-2]
            elif sfx in ("log\xeda", "log\xedas"):
                word = word.replace(sfx, "log")
                rv = rv.replace(sfx, "log")
            elif sfx in ("uci\xf3n", "uciones"):
                word = word.replace(sfx, "u")
                rv = rv.replace(sfx, "u")
            elif sfx in ("encia", "encias"):
                word = word.replace(sfx, "ente")
                rv = rv.replace(sfx, "ente")
            elif sfx == "mente":
                word, r2, rv = word[:-5], r2[:-5], rv[:-5]
                if r2.endswith(("ante", "able", "ible")):
                    word, rv = word[:-4], rv[:-4]
            elif sfx in ("idad", "idades"):
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                for pre in ("abil", "ic", "iv"):
                    if r2.endswith(pre):
                        word, rv = word[:-len(pre)], rv[:-len(pre)]
            elif sfx in ("ivo", "iva", "ivos", "ivas"):
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                if r2.endswith("at"):
                    word, rv = word[:-2], rv[:-2]
            else:
                word, rv = word[:-n], rv[:-n]
        break

    if not step1_ok:
        # step 2a: verb suffixes beginning with y (preceded by u)
        for sfx in _ES_STEP2A:
            if rv.endswith(sfx) and word[-len(sfx) - 1:-len(sfx)] == "u":
                word, rv = word[:-len(sfx)], rv[:-len(sfx)]
                break
        # step 2b: other verb suffixes — the reference runs this even
        # when 2a matched (it diverges from the published algorithm
        # there; parity quirk reproduced on purpose)
        for sfx in _ES_STEP2B:
            if not rv.endswith(sfx):
                continue
            n = len(sfx)
            word, rv = word[:-n], rv[:-n]
            if sfx in ("en", "es", "\xe9is", "emos"):
                if word.endswith("gu"):
                    word = word[:-1]
                if rv.endswith("gu"):
                    rv = rv[:-1]
            break

    # step 3: residual suffix
    for sfx in _ES_STEP3:
        if not rv.endswith(sfx):
            continue
        n = len(sfx)
        if sfx in ("e", "\xe9"):
            word, rv = word[:-n], rv[:-n]
            if (len(word) >= 2 and word[-2:] == "gu" and rv
                    and rv[-1] == "u"):
                word = word[:-1]
        else:
            word = word[:-n]
        break

    return word.translate(_ES_DEACCENT)


STEMMERS = {"de": stem_de, "es": stem_es}
