"""Snowball stemmers (all languages the reference engine ships).

The algorithms are published (snowballstem.org); this module implements
them as suffix tables + small step functions over a (word, r1, r2[, rv])
state, matching the REFERENCE engine's shipped stemmers
output-for-output (fuzz-tested in tests/test_language.py) — including
the translation quirks its NLTK-heritage code carries (first-match
precedence over ordered suffix tuples rather than longest-match,
clamped negative slices when a region is shorter than the probe window,
region strings that are deliberately NOT updated in some branches, and
the Scandinavian R1 three-letter floor computed as ``word[3:]``).
Reference: /root/reference/src/whoosh/lang/snowball/*.py — behavioral
parity targets, not code sources.
"""

from __future__ import annotations

# ---------------------------------------------------------------- regions


def _r1_scand(word: str, vowels: str) -> str:
    """Scandinavian R1: standard R1 but the region before it must hold
    at least three letters; the reference applies the floor as
    ``word[3:]`` when the boundary falls earlier (snowball/bases.py:33-44)."""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            return word[3:] if i + 1 < 3 else word[i + 1:]
    return ""


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


# ---------------------------------------------------------------- danish

_DA_VOWELS = "aeiouy\xe6\xe5\xf8"
_DA_S_END = "abcdfghjklmnoprtvyz\xe5"
_DA_STEP1 = ("erendes", "erende", "hedens", "ethed", "erede", "heden",
             "heder", "endes", "ernes", "erens", "erets", "ered", "ende",
             "erne", "eren", "erer", "heds", "enes", "eres", "eret",
             "hed", "ene", "ere", "ens", "ers", "ets", "en", "er", "es",
             "et", "e", "s")
_DA_STEP2 = ("gd", "dt", "gt", "kt")
_DA_STEP3 = ("elig", "l\xf8st", "lig", "els", "ig")
_DA_DOUBLE = ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll",
              "mm", "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww",
              "xx", "zz")


def stem_da(word: str) -> str:
    word = word.lower()
    r1 = _r1_scand(word, _DA_VOWELS)

    for sfx in _DA_STEP1:
        if r1.endswith(sfx):
            if sfx == "s":
                if word[-2] in _DA_S_END:
                    word, r1 = word[:-1], r1[:-1]
            else:
                n = len(sfx)
                word, r1 = word[:-n], r1[:-n]
            break

    for sfx in _DA_STEP2:
        if r1.endswith(sfx):
            word, r1 = word[:-1], r1[:-1]
            break

    if r1.endswith("igst"):
        word, r1 = word[:-2], r1[:-2]
    for sfx in _DA_STEP3:
        if r1.endswith(sfx):
            if sfx == "l\xf8st":
                word, r1 = word[:-1], r1[:-1]
            else:
                n = len(sfx)
                word, r1 = word[:-n], r1[:-n]
                if r1.endswith(_DA_STEP2):
                    word, r1 = word[:-1], r1[:-1]
            break

    # undouble a final double consonant (only on words > 3 letters)
    for dc in _DA_DOUBLE:
        if word.endswith(dc) and len(word) > 3:
            word = word[:-1]
            break
    return word


# ---------------------------------------------------------------- swedish

_SV_VOWELS = "aeiouy\xe4\xe5\xf6"
_SV_S_END = "bcdfghjklmnoprtvy"
_SV_STEP1 = ("heterna", "hetens", "heter", "heten", "anden", "arnas",
             "ernas", "ornas", "andes", "andet", "arens", "arna",
             "erna", "orna", "ande", "arne", "aste", "aren", "ades",
             "erns", "ade", "are", "ern", "ens", "het", "ast", "ad",
             "en", "ar", "er", "or", "as", "es", "at", "a", "e", "s")
_SV_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = ("fullt", "l\xf6st", "els", "lig", "ig")


def stem_sv(word: str) -> str:
    word = word.lower()
    r1 = _r1_scand(word, _SV_VOWELS)

    for sfx in _SV_STEP1:
        if r1.endswith(sfx):
            if sfx == "s":
                if word[-2] in _SV_S_END:
                    word, r1 = word[:-1], r1[:-1]
            else:
                n = len(sfx)
                word, r1 = word[:-n], r1[:-n]
            break

    for sfx in _SV_STEP2:
        if r1.endswith(sfx):
            word, r1 = word[:-1], r1[:-1]
            break

    for sfx in _SV_STEP3:
        if r1.endswith(sfx):
            if sfx in ("els", "lig", "ig"):
                word = word[:-len(sfx)]
            else:  # fullt / löst: drop only the final letter
                word = word[:-1]
            break
    return word


# --------------------------------------------------------------- norwegian

_NO_VOWELS = "aeiouy\xe6\xe5\xf8"
_NO_S_END = "bcdfghjlmnoprtvyz"
_NO_STEP1 = ("hetenes", "hetene", "hetens", "heter", "heten", "endes",
             "ande", "ende", "edes", "enes", "erte", "ede", "ane",
             "ene", "ens", "ers", "ets", "het", "ast", "ert", "en",
             "ar", "er", "as", "es", "et", "a", "e", "s")
_NO_STEP2 = ("dt", "vt")
_NO_STEP3 = ("hetslov", "eleg", "elig", "elov", "slov", "leg", "eig",
             "lig", "els", "lov", "ig")


def stem_no(word: str) -> str:
    word = word.lower()
    r1 = _r1_scand(word, _NO_VOWELS)

    for sfx in _NO_STEP1:
        if r1.endswith(sfx):
            if sfx in ("erte", "ert"):
                word = word[:-len(sfx)] + "er"
                r1 = r1[:-len(sfx)] + "er"
            elif sfx == "s":
                if (word[-2] in _NO_S_END
                        or (word[-2] == "k" and word[-3] not in _NO_VOWELS)):
                    word, r1 = word[:-1], r1[:-1]
            else:
                n = len(sfx)
                word, r1 = word[:-n], r1[:-n]
            break

    for sfx in _NO_STEP2:
        if r1.endswith(sfx):
            word, r1 = word[:-1], r1[:-1]
            break

    for sfx in _NO_STEP3:
        if r1.endswith(sfx):
            word = word[:-len(sfx)]
            break
    return word


# ----------------------------------------------------------------- dutch

_NL_VOWELS = "aeiouy\xe8"
_NL_STEP1 = ("heden", "ene", "en", "se", "s")
_NL_STEP3B = ("baar", "lijk", "bar", "end", "ing", "ig")
_NL_DEACCENT = str.maketrans("\xe4\xe1\xeb\xe9\xed\xef\xf6\xf3\xfc\xfa",
                             "aaeeiioouu")


def _nl_undouble(word: str, r1: str, r2: str) -> tuple[str, str, str]:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1], r1[:-1], r2[:-1]
    return word, r1, r2


def stem_nl(word: str) -> str:
    word = word.lower().translate(_NL_DEACCENT)
    step2_ok = False

    # initial y / y-after-vowel / i-between-vowels become consonant marks
    if word.startswith("y"):
        word = "Y" + word[1:]
    for i in range(1, len(word)):
        if word[i - 1] in _NL_VOWELS and word[i] == "y":
            word = word[:i] + "Y" + word[i + 1:]
    for i in range(1, len(word) - 1):
        if (word[i - 1] in _NL_VOWELS and word[i] == "i"
                and word[i + 1] in _NL_VOWELS):
            word = word[:i] + "I" + word[i + 1:]

    r1, r2 = _r1r2(word, _NL_VOWELS)
    # R1 floor: region before R1 must hold >= 3 letters (r2 NOT redone)
    for i in range(1, len(word)):
        if word[i] not in _NL_VOWELS and word[i - 1] in _NL_VOWELS:
            if i + 1 < 3:
                r1 = word[3:]
            break

    # STEP 1
    for sfx in _NL_STEP1:
        if r1.endswith(sfx):
            n = len(sfx)
            if sfx == "heden":
                word = word[:-5] + "heid"
                r1 = r1[:-5] + "heid"
                if r2.endswith("heden"):
                    r2 = r2[:-5] + "heid"
            elif (sfx in ("ene", "en") and not word.endswith("heden")
                  and word[-n - 1] not in _NL_VOWELS
                  and word[-n - 3:-n] != "gem"):
                word, r1, r2 = _nl_undouble(word[:-n], r1[:-n], r2[:-n])
            elif (sfx in ("se", "s") and word[-n - 1] not in _NL_VOWELS
                  and word[-n - 1] != "j"):
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # STEP 2
    if r1.endswith("e") and word[-2] not in _NL_VOWELS:
        step2_ok = True
        word, r1, r2 = _nl_undouble(word[:-1], r1[:-1], r2[:-1])

    # STEP 3a
    if r2.endswith("heid") and word[-5] != "c":
        word, r1, r2 = word[:-4], r1[:-4], r2[:-4]
        if (r1.endswith("en") and word[-3] not in _NL_VOWELS
                and word[-5:-2] != "gem"):
            word, r1, r2 = _nl_undouble(word[:-2], r1[:-2], r2[:-2])

    # STEP 3b: derivational suffixes
    for sfx in _NL_STEP3B:
        if r2.endswith(sfx):
            if sfx in ("end", "ing"):
                word, r2 = word[:-3], r2[:-3]
                if r2.endswith("ig") and word[-3] != "e":
                    word = word[:-2]
                elif word.endswith(("kk", "dd", "tt")):
                    word = word[:-1]
            elif sfx == "ig":
                if word[-3] != "e":
                    word = word[:-2]
            elif sfx == "lijk":
                word, r1 = word[:-4], r1[:-4]
                if r1.endswith("e") and word[-2] not in _NL_VOWELS:
                    word = word[:-1]
                    if word.endswith(("kk", "dd", "tt")):
                        word = word[:-1]
            elif sfx == "baar":
                word = word[:-4]
            elif sfx == "bar":
                if step2_ok:
                    word = word[:-3]
            break

    # STEP 4: undouble vowel (CVVC tail -> CVC)
    if (len(word) >= 4 and word[-1] not in _NL_VOWELS and word[-1] != "I"
            and word[-3:-1] in ("aa", "ee", "oo", "uu")
            and word[-4] not in _NL_VOWELS):
        word = word[:-3] + word[-3] + word[-1]

    return word.replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------- english

_EN_VOWELS = "aeiouy"
_EN_DOUBLE = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_END = "cdeghkmnrt"
_EN_STEP0 = ("'s'", "'s", "'")
_EN_STEP1A = ("sses", "ied", "ies", "us", "ss", "s")
_EN_STEP1B = ("eedly", "ingly", "edly", "eed", "ing", "ed")
_EN_STEP2 = ("ization", "ational", "fulness", "ousness", "iveness",
             "tional", "biliti", "lessli", "entli", "ation", "alism",
             "aliti", "ousli", "iviti", "fulli", "enci", "anci", "abli",
             "izer", "ator", "alli", "bli", "ogi", "li")
_EN_STEP3 = ("ational", "tional", "alize", "icate", "iciti", "ative",
             "ical", "ness", "ful")
_EN_STEP4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant",
             "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
             "al", "er", "ic")
# irregular forms + stems frozen by the published algorithm's exception
# lists (english/stemmer.html "exceptional forms")
_EN_SPECIAL = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "howe": "howe", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes", "inning": "inning",
    "innings": "inning", "outing": "outing", "outings": "outing",
    "canning": "canning", "cannings": "canning", "herring": "herring",
    "herrings": "herring", "earring": "earring", "earrings": "earring",
    "proceed": "proceed", "proceeds": "proceed", "proceeded": "proceed",
    "proceeding": "proceed", "exceed": "exceed", "exceeds": "exceed",
    "exceeded": "exceed", "exceeding": "exceed", "succeed": "succeed",
    "succeeds": "succeed", "succeeded": "succeed",
    "succeeding": "succeed",
}


def _en_repl(word, r1, r2, n, repl, r2_short=""):
    """Replace an n-char suffix with ``repl`` in word/r1/r2; a region
    shorter than the suffix collapses to "" (or the reference's odd
    ``r2_short`` sentinel — "e" for the ation/ive families)."""
    word = word[:-n] + repl
    r1 = (r1[:-n] + repl) if len(r1) >= n else ""
    r2 = (r2[:-n] + repl) if len(r2) >= n else r2_short
    return word, r1, r2


def stem_en(word: str) -> str:
    word = word.lower()
    if word in _EN_SPECIAL:
        return _EN_SPECIAL[word]

    word = (word.replace("’", "'").replace("‘", "'")
            .replace("‛", "'"))
    if word.startswith("'"):
        word = word[1:]
    if word.startswith("y"):
        word = "Y" + word[1:]
    for i in range(1, len(word)):
        if word[i - 1] in _EN_VOWELS and word[i] == "y":
            word = word[:i] + "Y" + word[i + 1:]

    # R1 with the published gener-/commun-/arsen- prefix exception
    if word.startswith(("gener", "commun", "arsen")):
        r1 = word[5:] if word.startswith(("gener", "arsen")) else word[6:]
        r2 = ""
        for i in range(1, len(r1)):
            if r1[i] not in _EN_VOWELS and r1[i - 1] in _EN_VOWELS:
                r2 = r1[i + 1:]
                break
    else:
        r1, r2 = _r1r2(word, _EN_VOWELS)

    # STEP 0: apostrophe suffixes
    for sfx in _EN_STEP0:
        if word.endswith(sfx):
            n = len(sfx)
            word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # STEP 1a
    for sfx in _EN_STEP1A:
        if word.endswith(sfx):
            if sfx == "sses":
                word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif sfx in ("ied", "ies"):
                n = 2 if len(word[:-3]) > 1 else 1
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            elif sfx == "s":
                if any(ch in _EN_VOWELS for ch in word[:-2]):
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
            break

    # STEP 1b
    for sfx in _EN_STEP1B:
        if word.endswith(sfx):
            n = len(sfx)
            if sfx in ("eed", "eedly"):
                if r1.endswith(sfx):
                    word, r1, r2 = _en_repl(word, r1, r2, n, "ee")
            elif any(ch in _EN_VOWELS for ch in word[:-n]):
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                if word.endswith(("at", "bl", "iz")):
                    word += "e"
                    r1 += "e"
                    if len(word) > 5 or len(r1) >= 3:
                        r2 += "e"
                elif word.endswith(_EN_DOUBLE):
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                elif ((r1 == "" and len(word) >= 3
                       and word[-1] not in _EN_VOWELS
                       and word[-1] not in "wxY"
                       and word[-2] in _EN_VOWELS
                       and word[-3] not in _EN_VOWELS)
                      or (r1 == "" and len(word) == 2
                          and word[0] in _EN_VOWELS
                          and word[1] not in _EN_VOWELS)):
                    # short-word CVC tail: restore the e; the reference
                    # only extends non-empty regions here
                    word += "e"
                    if r1:
                        r1 += "e"
                    if r2:
                        r2 += "e"
            break

    # STEP 1c: y -> i after a consonant
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _EN_VOWELS:
        word = word[:-1] + "i"
        r1 = (r1[:-1] + "i") if r1 else ""
        r2 = (r2[:-1] + "i") if r2 else ""

    # STEP 2
    for sfx in _EN_STEP2:
        if word.endswith(sfx):
            n = len(sfx)
            if r1.endswith(sfx):
                if sfx in ("tional", "entli", "fulli", "lessli"):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
                elif sfx in ("enci", "anci", "abli"):
                    word, r1, r2 = _en_repl(word, r1, r2, 1, "e")
                elif sfx in ("izer", "ization"):
                    word, r1, r2 = _en_repl(word, r1, r2, n, "ize")
                elif sfx in ("ational", "ation", "ator"):
                    word, r1, r2 = _en_repl(word, r1, r2, n, "ate",
                                            r2_short="e")
                elif sfx in ("alism", "aliti", "alli"):
                    word, r1, r2 = _en_repl(word, r1, r2, n, "al")
                elif sfx == "fulness":
                    word, r1, r2 = word[:-4], r1[:-4], r2[:-4]
                elif sfx in ("ousli", "ousness"):
                    word, r1, r2 = _en_repl(word, r1, r2, n, "ous")
                elif sfx in ("iveness", "iviti"):
                    word, r1, r2 = _en_repl(word, r1, r2, n, "ive",
                                            r2_short="e")
                elif sfx in ("biliti", "bli"):
                    word, r1, r2 = _en_repl(word, r1, r2, n, "ble")
                elif sfx == "ogi":
                    if word[-4] == "l":
                        word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                elif sfx == "li":
                    if word[-3] in _EN_LI_END:
                        word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            break

    # STEP 3
    for sfx in _EN_STEP3:
        if word.endswith(sfx):
            n = len(sfx)
            if r1.endswith(sfx):
                if sfx == "tional":
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
                elif sfx == "ational":
                    word, r1, r2 = _en_repl(word, r1, r2, n, "ate")
                elif sfx == "alize":
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                elif sfx in ("icate", "iciti", "ical"):
                    word, r1, r2 = _en_repl(word, r1, r2, n, "ic")
                elif sfx in ("ful", "ness"):
                    word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                elif sfx == "ative":
                    if r2.endswith(sfx):
                        word, r1, r2 = word[:-5], r1[:-5], r2[:-5]
            break

    # STEP 4
    for sfx in _EN_STEP4:
        if word.endswith(sfx):
            n = len(sfx)
            if r2.endswith(sfx):
                if sfx == "ion":
                    if word[-4] in "st":
                        word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                else:
                    word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # STEP 5
    if r2.endswith("l") and word[-2] == "l":
        word = word[:-1]
    elif r2.endswith("e"):
        word = word[:-1]
    elif r1.endswith("e"):
        if len(word) >= 4 and (word[-2] in _EN_VOWELS or word[-2] in "wxY"
                               or word[-3] not in _EN_VOWELS
                               or word[-4] in _EN_VOWELS):
            word = word[:-1]

    return word.replace("Y", "y")


# ----------------------------------------------------------------- french

_FR_VOWELS = "aeiouy\xe2\xe0\xeb\xe9\xea\xe8\xef\xee\xf4\xfb\xf9"
_FR_STEP1 = ("issements", "issement", "atrices", "atrice", "ateurs",
             "ations", "logies", "usions", "utions", "ements", "amment",
             "emment", "ances", "iqUes", "ismes", "ables", "istes",
             "ateur", "ation", "logie", "usion", "ution", "ences",
             "ement", "euses", "ments", "ance", "iqUe", "isme", "able",
             "iste", "ence", "it\xe9s", "ives", "eaux", "euse", "ment",
             "eux", "it\xe9", "ive", "ifs", "aux", "if")
_FR_STEP2A = ("issaIent", "issantes", "iraIent", "issante", "issants",
              "issions", "irions", "issais", "issait", "issant",
              "issent", "issiez", "issons", "irais", "irait", "irent",
              "iriez", "irons", "iront", "isses", "issez", "\xeemes",
              "\xeetes", "irai", "iras", "irez", "isse", "ies", "ira",
              "\xeet", "ie", "ir", "is", "it", "i")
_FR_STEP2B = ("eraIent", "assions", "erions", "assent", "assiez",
              "\xe8rent", "erais", "erait", "eriez", "erons", "eront",
              "aIent", "antes", "asses", "ions", "erai", "eras", "erez",
              "\xe2mes", "\xe2tes", "ante", "ants", "asse", "\xe9es",
              "era", "iez", "ais", "ait", "ant", "\xe9e", "\xe9s", "er",
              "ez", "\xe2t", "ai", "as", "\xe9", "a")
_FR_2B_ER = ("eraIent", "erions", "\xe8rent", "erais", "erait", "eriez",
             "erons", "eront", "erai", "eras", "erez", "\xe9es", "era",
             "iez", "\xe9e", "\xe9s", "er", "ez", "\xe9")
_FR_2B_A = ("assions", "assent", "assiez", "aIent", "antes", "asses",
            "\xe2mes", "\xe2tes", "ante", "ants", "asse", "ais", "ait",
            "ant", "\xe2t", "ai", "as", "a")
_FR_STEP4 = ("i\xe8re", "I\xe8re", "ion", "ier", "Ier", "e", "\xeb")


def _rv_fr(word: str) -> str:
    """French RV: after the third letter when the word starts with two
    vowels or par/col/tap; else after the first non-initial vowel."""
    if len(word) < 2:
        return ""
    if (word.startswith(("par", "col", "tap"))
            or (word[0] in _FR_VOWELS and word[1] in _FR_VOWELS)):
        return word[3:]
    for i in range(1, len(word)):
        if word[i] in _FR_VOWELS:
            return word[i + 1:]
    return ""


def stem_fr(word: str) -> str:
    word = word.lower()
    step1_ok = rv_ending = s2a_ok = s2b_ok = False

    # consonant marks: qU, intervocalic U/I, vowel-adjacent Y
    for i in range(1, len(word)):
        if word[i - 1] == "q" and word[i] == "u":
            word = word[:i] + "U" + word[i + 1:]
    for i in range(1, len(word) - 1):
        if word[i - 1] in _FR_VOWELS and word[i + 1] in _FR_VOWELS:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "i":
                word = word[:i] + "I" + word[i + 1:]
        if ((word[i - 1] in _FR_VOWELS or word[i + 1] in _FR_VOWELS)
                and word[i] == "y"):
            word = word[:i] + "Y" + word[i + 1:]

    r1, r2 = _r1r2(word, _FR_VOWELS)
    rv = _rv_fr(word)

    # STEP 1 — NOTE: region membership here is SUBSTRING containment
    # ("suffix in r2"), the reference's quirk, not an endswith probe
    for sfx in _FR_STEP1:
        if word.endswith(sfx):
            n = len(sfx)
            if sfx == "eaux":
                word = word[:-1]
                step1_ok = True
            elif sfx in ("euse", "euses"):
                if sfx in r2:
                    word = word[:-n]
                    step1_ok = True
                elif sfx in r1:
                    word = word[:-n] + "eux"
                    step1_ok = True
            elif sfx in ("ement", "ements") and sfx in rv:
                word = word[:-n]
                step1_ok = True
                if word[-2:] == "iv" and "iv" in r2:
                    word = word[:-2]
                    if word[-2:] == "at" and "at" in r2:
                        word = word[:-2]
                elif word[-3:] == "eus":
                    if "eus" in r2:
                        word = word[:-3]
                    elif "eus" in r1:
                        word = word[:-1] + "x"
                elif word[-3:] in ("abl", "iqU"):
                    if "abl" in r2 or "iqU" in r2:
                        word = word[:-3]
                elif word[-3:] in ("i\xe8r", "I\xe8r"):
                    if "i\xe8r" in rv or "I\xe8r" in rv:
                        word = word[:-3] + "i"
            elif sfx == "amment" and sfx in rv:
                word = word[:-6] + "ant"
                rv = rv[:-6] + "ant"
                rv_ending = True
            elif sfx == "emment" and sfx in rv:
                word = word[:-6] + "ent"
                rv_ending = True
            elif (sfx in ("ment", "ments") and sfx in rv
                  and not rv.startswith(sfx)
                  and rv[rv.rindex(sfx) - 1] in _FR_VOWELS):
                word = word[:-n]
                rv = rv[:-n]
                rv_ending = True
            elif sfx == "aux" and sfx in r1:
                word = word[:-2] + "l"
                step1_ok = True
            elif (sfx in ("issement", "issements") and sfx in r1
                  and word[-n - 1] not in _FR_VOWELS):
                word = word[:-n]
                step1_ok = True
            elif sfx in ("ance", "iqUe", "isme", "able", "iste", "eux",
                         "ances", "iqUes", "ismes", "ables",
                         "istes") and sfx in r2:
                word = word[:-n]
                step1_ok = True
            elif sfx in ("atrice", "ateur", "ation", "atrices",
                         "ateurs", "ations") and sfx in r2:
                word = word[:-n]
                step1_ok = True
                if word[-2:] == "ic":
                    word = word[:-2] if "ic" in r2 else word[:-2] + "iqU"
            elif sfx in ("logie", "logies") and sfx in r2:
                word = word[:-n] + "log"
                step1_ok = True
            elif sfx in ("usion", "ution", "usions", "utions") and sfx in r2:
                word = word[:-n] + "u"
                step1_ok = True
            elif sfx in ("ence", "ences") and sfx in r2:
                word = word[:-n] + "ent"
                step1_ok = True
            elif sfx in ("it\xe9", "it\xe9s") and sfx in r2:
                word = word[:-n]
                step1_ok = True
                if word[-4:] == "abil":
                    word = word[:-4] if "abil" in r2 else word[:-2] + "l"
                elif word[-2:] == "ic":
                    word = word[:-2] if "ic" in r2 else word[:-2] + "iqU"
                elif word[-2:] == "iv":
                    if "iv" in r2:
                        word = word[:-2]
            elif sfx in ("if", "ive", "ifs", "ives") and sfx in r2:
                word = word[:-n]
                step1_ok = True
                if word[-2:] == "at" and "at" in r2:
                    word = word[:-2]
                    if word[-2:] == "ic":
                        word = word[:-2] if "ic" in r2 else word[:-2] + "iqU"
            break

    # STEP 2a / 2b
    if not step1_ok or rv_ending:
        for sfx in _FR_STEP2A:
            if word.endswith(sfx):
                if (sfx in rv and len(rv) > len(sfx)
                        and rv[rv.rindex(sfx) - 1] not in _FR_VOWELS):
                    word = word[:-len(sfx)]
                    s2a_ok = True
                break
        if not s2a_ok:
            for sfx in _FR_STEP2B:
                if rv.endswith(sfx):
                    if sfx == "ions":
                        if "ions" in r2:
                            word = word[:-4]
                            s2b_ok = True
                    elif sfx in _FR_2B_ER:
                        word = word[:-len(sfx)]
                        s2b_ok = True
                    elif sfx in _FR_2B_A:
                        word = word[:-len(sfx)]
                        rv = rv[:-len(sfx)]
                        s2b_ok = True
                        if rv.endswith("e"):
                            word = word[:-1]
                    break

    if step1_ok or s2a_ok or s2b_ok:
        # STEP 3
        if word[-1] == "Y":
            word = word[:-1] + "i"
        elif word[-1] == "\xe7":
            word = word[:-1] + "c"
    else:
        # STEP 4: residual suffixes
        if (len(word) >= 2 and word[-1] == "s"
                and word[-2] not in "aiou\xe8s"):
            word = word[:-1]
        for sfx in _FR_STEP4:
            if word.endswith(sfx):
                if sfx in rv:
                    if sfx == "ion" and sfx in r2 and rv[-4] in "st":
                        word = word[:-3]
                    elif sfx in ("ier", "i\xe8re", "Ier", "I\xe8re"):
                        word = word[:-len(sfx)] + "i"
                    elif sfx == "e":
                        word = word[:-1]
                    elif sfx == "\xeb" and word[-3:-1] == "gu":
                        word = word[:-1]
                    break

    # STEP 5: undouble
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        word = word[:-1]

    # STEP 6: un-accent the last vowel when not final
    for i in range(1, len(word)):
        if word[-i] in _FR_VOWELS:
            if i != 1 and word[-i] in ("\xe9", "\xe8"):
                word = word[:-i] + "e" + word[len(word) - i + 1:]
            break

    return word.replace("I", "i").replace("U", "u").replace("Y", "y")


# ---------------------------------------------------------------- italian

_IT_VOWELS = "aeiou\xe0\xe8\xec\xf2\xf9"
_IT_STEP0 = ("gliela", "gliele", "glieli", "glielo", "gliene", "sene",
             "mela", "mele", "meli", "melo", "mene", "tela", "tele",
             "teli", "telo", "tene", "cela", "cele", "celi", "celo",
             "cene", "vela", "vele", "veli", "velo", "vene", "gli",
             "ci", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi")
_IT_STEP1 = ("atrice", "atrici", "azione", "azioni", "uzione", "uzioni",
             "usione", "usioni", "amento", "amenti", "imento", "imenti",
             "amente", "abile", "abili", "ibile", "ibili", "mente",
             "atore", "atori", "logia", "logie", "anza", "anze", "iche",
             "ichi", "ismo", "ismi", "ista", "iste", "isti", "ist\xe0",
             "ist\xe8", "ist\xec", "ante", "anti", "enza", "enze",
             "ico", "ici", "ica", "ice", "oso", "osi", "osa", "ose",
             "it\xe0", "ivo", "ivi", "iva", "ive")
_IT_STEP2 = ("erebbero", "irebbero", "assero", "assimo", "eranno",
             "erebbe", "eremmo", "ereste", "eresti", "essero", "iranno",
             "irebbe", "iremmo", "ireste", "iresti", "iscano", "iscono",
             "issero", "arono", "avamo", "avano", "avate", "eremo",
             "erete", "erono", "evamo", "evano", "evate", "iremo",
             "irete", "irono", "ivamo", "ivano", "ivate", "ammo",
             "ando", "asse", "assi", "emmo", "enda", "ende", "endi",
             "endo", "erai", "erei", "Yamo", "iamo", "immo", "irai",
             "irei", "isca", "isce", "isci", "isco", "ano", "are",
             "ata", "ate", "ati", "ato", "ava", "avi", "avo", "er\xe0",
             "ere", "er\xf2", "ete", "eva", "evi", "evo", "ir\xe0",
             "ire", "ir\xf2", "ita", "ite", "iti", "ito", "iva", "ivi",
             "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir")
_IT_GRAVE = str.maketrans("\xe1\xe9\xed\xf3\xfa", "\xe0\xe8\xec\xf2\xf9")


def stem_it(word: str) -> str:
    word = word.lower().translate(_IT_GRAVE)
    step1_ok = False

    for i in range(1, len(word)):
        if word[i - 1] == "q" and word[i] == "u":
            word = word[:i] + "U" + word[i + 1:]
    for i in range(1, len(word) - 1):
        if word[i - 1] in _IT_VOWELS and word[i + 1] in _IT_VOWELS:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "i":
                word = word[:i] + "I" + word[i + 1:]

    r1, r2 = _r1r2(word, _IT_VOWELS)
    rv = _rv(word, _IT_VOWELS)

    # STEP 0: attached pronoun
    for sfx in _IT_STEP0:
        if rv.endswith(sfx):
            n = len(sfx)
            if rv[-n - 4:-n] in ("ando", "endo"):
                word, r1, r2, rv = word[:-n], r1[:-n], r2[:-n], rv[:-n]
            elif rv[-n - 2:-n] in ("ar", "er", "ir"):
                word = word[:-n] + "e"
                r1 = r1[:-n] + "e"
                r2 = r2[:-n] + "e"
                rv = rv[:-n] + "e"
            break

    # STEP 1: standard suffixes
    for sfx in _IT_STEP1:
        if word.endswith(sfx):
            n = len(sfx)
            if sfx == "amente" and r1.endswith(sfx):
                step1_ok = True
                word, r2, rv = word[:-6], r2[:-6], rv[:-6]
                if r2.endswith("iv"):
                    word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                elif r2.endswith(("os", "ic")):
                    word, rv = word[:-2], rv[:-2]
                elif r2.endswith("abil"):
                    word, rv = word[:-4], rv[:-4]
            elif (sfx in ("amento", "amenti", "imento", "imenti")
                  and rv.endswith(sfx)):
                step1_ok = True
                word, rv = word[:-6], rv[:-6]
            elif r2.endswith(sfx):
                step1_ok = True
                if sfx in ("azione", "azioni", "atore", "atori"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("ic"):
                        word, rv = word[:-2], rv[:-2]
                elif sfx in ("logia", "logie"):
                    # reference quirk (italian.py:166-168): rv is rebuilt
                    # from the ALREADY-truncated word, double-truncating
                    word = word[:-2]
                    rv = word[:-2]
                elif sfx in ("uzione", "uzioni", "usione", "usioni"):
                    word, rv = word[:-5], rv[:-5]
                elif sfx in ("enza", "enze"):
                    word = word[:-2] + "te"
                    rv = rv[:-2] + "te"
                elif sfx == "it\xe0":
                    word, r2, rv = word[:-3], r2[:-3], rv[:-3]
                    if r2.endswith(("ic", "iv")):
                        word, rv = word[:-2], rv[:-2]
                    elif r2.endswith("abil"):
                        word, rv = word[:-4], rv[:-4]
                elif sfx in ("ivo", "ivi", "iva", "ive"):
                    word, r2, rv = word[:-3], r2[:-3], rv[:-3]
                    if r2.endswith("at"):
                        word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                        if r2.endswith("ic"):
                            word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # STEP 2: verb suffixes
    if not step1_ok:
        for sfx in _IT_STEP2:
            if rv.endswith(sfx):
                word, rv = word[:-len(sfx)], rv[:-len(sfx)]
                break

    # STEP 3a: final vowel (+ trailing i)
    if rv.endswith(("a", "e", "i", "o", "\xe0", "\xe8", "\xec", "\xf2")):
        word, rv = word[:-1], rv[:-1]
        if rv.endswith("i"):
            word, rv = word[:-1], rv[:-1]

    # STEP 3b
    if rv.endswith(("ch", "gh")):
        word = word[:-1]

    return word.replace("I", "i").replace("U", "u")


# -------------------------------------------------------------- portuguese

_PT_VOWELS = "aeiou\xe1\xe9\xed\xf3\xfa\xe2\xea\xf4"
_PT_STEP1 = ("amentos", "imentos", "uciones", "amento", "imento",
             "adoras", "adores", "a\xe7o~es", "log\xedas", "\xeancias",
             "amente", "idades", "ismos", "istas", "adora", "a\xe7a~o",
             "antes", "\xe2ncia", "log\xeda", "uci\xf3n", "\xeancia",
             "mente", "idade", "ezas", "icos", "icas", "ismo",
             "\xe1vel", "\xedvel", "ista", "osos", "osas", "ador",
             "ante", "ivas", "ivos", "iras", "eza", "ico", "ica",
             "oso", "osa", "iva", "ivo", "ira")
_PT_STEP2 = ("ar\xedamos", "er\xedamos", "ir\xedamos", "\xe1ssemos",
             "\xeassemos", "\xedssemos", "ar\xedeis", "er\xedeis",
             "ir\xedeis", "\xe1sseis", "\xe9sseis", "\xedsseis",
             "\xe1ramos", "\xe9ramos", "\xedramos", "\xe1vamos",
             "aremos", "eremos", "iremos", "ariam", "eriam", "iriam",
             "assem", "essem", "issem", "ara~o", "era~o", "ira~o",
             "arias", "erias", "irias", "ardes", "erdes", "irdes",
             "asses", "esses", "isses", "astes", "estes", "istes",
             "\xe1reis", "areis", "\xe9reis", "ereis", "\xedreis",
             "ireis", "\xe1veis", "\xedamos", "armos", "ermos", "irmos",
             "aria", "eria", "iria", "asse", "esse", "isse", "aste",
             "este", "iste", "arei", "erei", "irei", "aram", "eram",
             "iram", "avam", "arem", "erem", "irem", "ando", "endo",
             "indo", "adas", "idas", "ar\xe1s", "aras", "er\xe1s",
             "eras", "ir\xe1s", "avas", "ares", "eres", "ires",
             "\xedeis", "ados", "idos", "\xe1mos", "amos", "emos",
             "imos", "iras", "ada", "ida", "ar\xe1", "ara", "er\xe1",
             "era", "ir\xe1", "ava", "iam", "ado", "ido", "ias", "ais",
             "eis", "ira", "ia", "ei", "am", "em", "ar", "er", "ir",
             "as", "es", "is", "eu", "iu", "ou")
_PT_STEP4 = ("os", "a", "i", "o", "\xe1", "\xed", "\xf3")


def stem_pt(word: str) -> str:
    word = word.lower().replace("\xe3", "a~").replace("\xf5", "o~")
    step1_ok = step2_ok = False

    r1, r2 = _r1r2(word, _PT_VOWELS)
    rv = _rv(word, _PT_VOWELS)

    # STEP 1: standard suffixes
    for sfx in _PT_STEP1:
        if word.endswith(sfx):
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
            elif (sfx in ("ira", "iras") and rv.endswith(sfx)
                  and word[-n - 1:-n] == "e"):
                step1_ok = True
                word = word[:-n] + "ir"
                rv = rv[:-n] + "ir"
            elif r2.endswith(sfx):
                step1_ok = True
                if sfx in ("log\xeda", "log\xedas"):
                    word, rv = word[:-2], rv[:-2]
                elif sfx in ("uci\xf3n", "uciones"):
                    word = word[:-n] + "u"
                    rv = rv[:-n] + "u"
                elif sfx in ("\xeancia", "\xeancias"):
                    word = word[:-n] + "ente"
                    rv = rv[:-n] + "ente"
                elif sfx == "mente":
                    word, r2, rv = word[:-5], r2[:-5], rv[:-5]
                    if r2.endswith(("ante", "avel", "\xedvel")):
                        word, rv = word[:-4], rv[:-4]
                elif sfx in ("idade", "idades"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith(("ic", "iv")):
                        word, rv = word[:-2], rv[:-2]
                    elif r2.endswith("abil"):
                        word, rv = word[:-4], rv[:-4]
                elif sfx in ("iva", "ivo", "ivas", "ivos"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # STEP 2: verb suffixes
    if not step1_ok:
        for sfx in _PT_STEP2:
            if rv.endswith(sfx):
                step2_ok = True
                word, rv = word[:-len(sfx)], rv[:-len(sfx)]
                break

    # STEP 3
    if (step1_ok or step2_ok) and rv.endswith("i") and word[-2] == "c":
        word, rv = word[:-1], rv[:-1]

    # STEP 4: residual suffix
    if not step1_ok and not step2_ok:
        for sfx in _PT_STEP4:
            if rv.endswith(sfx):
                word, rv = word[:-len(sfx)], rv[:-len(sfx)]
                break

    # STEP 5
    if rv.endswith(("e", "\xe9", "\xea")):
        word, rv = word[:-1], rv[:-1]
        if ((word.endswith("gu") and rv.endswith("u"))
                or (word.endswith("ci") and rv.endswith("i"))):
            word = word[:-1]
    elif word.endswith("\xe7"):
        word = word[:-1] + "c"

    return word.replace("a~", "\xe3").replace("o~", "\xf5")


# ---------------------------------------------------------------- finnish

_FI_VOWELS = "aeiouy\xe4\xf6"
_FI_RESTRICTED = "aeiou\xe4\xf6"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "\xe4\xe4", "\xf6\xf6")
_FI_CONS = "bcdfghjklmnpqrstvwxz"
_FI_DOUBLE = ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll",
              "mm", "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww",
              "xx", "zz")
_FI_STEP1 = ("kaan", "k\xe4\xe4n", "sti", "kin", "han", "h\xe4n",
             "ko", "k\xf6", "pa", "p\xe4")
_FI_STEP2 = ("nsa", "ns\xe4", "mme", "nne", "si", "ni", "an", "\xe4n",
             "en")
_FI_STEP3 = ("siin", "tten", "seen", "han", "hen", "hin", "hon",
             "h\xe4n", "h\xf6n", "den", "tta", "tt\xe4", "ssa",
             "ss\xe4", "sta", "st\xe4", "lla", "ll\xe4", "lta",
             "lt\xe4", "lle", "ksi", "ine", "ta", "t\xe4", "na",
             "n\xe4", "a", "\xe4", "n")
_FI_STEP4 = ("impi", "impa", "imp\xe4", "immi", "imma", "imm\xe4",
             "mpi", "mpa", "mp\xe4", "mmi", "mma", "mm\xe4", "eja",
             "ej\xe4")
_FI_ILLATIVE = ("han", "hen", "hin", "hon", "h\xe4n", "h\xf6n")
_FI_PLURAL_I = ("siin", "den", "tten")


def stem_fi(word: str) -> str:
    """Finnish snowball (snowballstem.org/algorithms/finnish).  Quirks
    kept from the reference (lang/snowball/finnish.py): the ``sti``
    particle tests ``"sti" in r2`` as a SUBSTRING, and step 1's other
    particles break without removal when the preceding letter check
    fails (first-match, no fallback)."""
    word = word.lower()
    r1, r2 = _r1r2(word, _FI_VOWELS)

    # step 1: particles
    for sfx in _FI_STEP1:
        if r1.endswith(sfx):
            if sfx == "sti":
                if sfx in r2:
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            elif word[-len(sfx) - 1] in "ntaeiouy\xe4\xf6":
                n = len(sfx)
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # step 2: possessives
    for sfx in _FI_STEP2:
        if r1.endswith(sfx):
            if sfx == "si":
                if word[-3] != "k":
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif sfx == "ni":
                word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
                if word.endswith("kse"):
                    word = word[:-3] + "ksi"
                if r1.endswith("kse"):
                    r1 = r1[:-3] + "ksi"
                if r2.endswith("kse"):
                    r2 = r2[:-3] + "ksi"
            elif sfx == "an":
                if (word[-4:-2] in ("ta", "na")
                        or word[-5:-2] in ("ssa", "sta", "lla", "lta")):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif sfx == "\xe4n":
                if (word[-4:-2] in ("t\xe4", "n\xe4")
                        or word[-5:-2] in ("ss\xe4", "st\xe4", "ll\xe4",
                                           "lt\xe4")):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif sfx == "en":
                if word[-5:-2] in ("lle", "ine"):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            else:
                word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            break

    # step 3: cases
    step3 = False
    for sfx in _FI_STEP3:
        if r1.endswith(sfx):
            if sfx in _FI_ILLATIVE:
                # h<V>n drops only after the harmonizing vowel <V>
                if word[-4] == sfx[1]:
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                    step3 = True
            elif sfx in _FI_PLURAL_I:
                n = len(sfx)
                if (word[-n - 1] == "i"
                        and word[-n - 2] in _FI_RESTRICTED):
                    word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                    step3 = True
                else:
                    continue
            elif sfx == "seen":
                if word[-6:-4] in _FI_LONG:
                    word, r1, r2 = word[:-4], r1[:-4], r2[:-4]
                    step3 = True
                else:
                    continue
            elif sfx in ("a", "\xe4"):
                if word[-2] in _FI_VOWELS and word[-3] in _FI_CONS:
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                    step3 = True
            elif sfx in ("tta", "tt\xe4"):
                if word[-4] == "e":
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                    step3 = True
            elif sfx == "n":
                word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                step3 = True
                if word[-2:] == "ie" or word[-2:] in _FI_LONG:
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
            else:
                n = len(sfx)
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                step3 = True
            break

    # step 4: comparatives / other endings (conditioned on R2)
    for sfx in _FI_STEP4:
        if r2.endswith(sfx):
            if sfx in ("mpi", "mpa", "mp\xe4", "mmi", "mma", "mm\xe4"):
                if word[-5:-3] != "po":
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            else:
                n = len(sfx)
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # step 5: plurals
    if step3 and r1[-1:] in ("i", "j"):
        word, r1 = word[:-1], r1[:-1]
    elif (not step3 and len(r1) >= 2 and r1[-1] == "t"
          and r1[-2] in _FI_VOWELS):
        word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
        if r2.endswith("imma"):
            word, r1 = word[:-4], r1[:-4]
        elif r2.endswith("mma") and r2[-5:-3] != "po":
            word, r1 = word[:-3], r1[:-3]

    # step 6: tidying
    if r1[-2:] in _FI_LONG:
        word, r1 = word[:-1], r1[:-1]
    if len(r1) >= 2 and r1[-2] in _FI_CONS and r1[-1] in "a\xe4ei":
        word, r1 = word[:-1], r1[:-1]
    if r1.endswith(("oj", "uj")):
        word, r1 = word[:-1], r1[:-1]
    if r1.endswith("jo"):
        word, r1 = word[:-1], r1[:-1]
    # undouble the consonant that starts the final CC(V*) cluster
    for i in range(1, len(word)):
        if word[-i] in _FI_VOWELS:
            continue
        if i == 1:
            if word[-2:] in _FI_DOUBLE:
                word = word[:-1]
        elif word[-i - 1:-i + 1] in _FI_DOUBLE:
            word = word[:-i] + word[-i + 1:]
        break

    return word


# ---------------------------------------------------------------- hungarian

_HU_VOWELS = "aeiou\xf6\xfc\xe1\xe9\xed\xf3\xf5\xfa\xfb"
_HU_DIGRAPHS = ("cs", "dz", "dzs", "gy", "ly", "ny", "ty", "zs")
_HU_DOUBLE = ("bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk",
              "ll", "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz",
              "tt", "tty", "vv", "zz", "zzs")
_HU_STEP2 = ("k\xe9ppen", "onk\xe9nt", "enk\xe9nt", "ank\xe9nt",
             "k\xe9pp", "k\xe9nt", "ban", "ben", "nak", "nek", "val",
             "vel", "t\xf3l", "t\xf5l", "r\xf3l", "r\xf5l", "b\xf3l",
             "b\xf5l", "hoz", "hez", "h\xf6z", "n\xe1l", "n\xe9l",
             "\xe9rt", "kor", "ba", "be", "ra", "re", "ig", "at", "et",
             "ot", "\xf6t", "ul", "\xfcl", "v\xe1", "v\xe9", "en", "on",
             "an", "\xf6n", "n", "t")
_HU_STEP3 = ("\xe1nk\xe9nt", "\xe1n", "\xe9n")
_HU_STEP4 = ("astul", "est\xfcl", "\xe1stul", "\xe9st\xfcl", "stul",
             "st\xfcl")
_HU_STEP6 = ("ok\xe9", "\xf6k\xe9", "ak\xe9", "ek\xe9", "\xe1k\xe9",
             "\xe1\xe9i", "\xe9k\xe9", "\xe9\xe9i", "k\xe9", "\xe9i",
             "\xe9\xe9", "\xe9")
_HU_STEP7 = ("\xe1juk", "\xe9j\xfck", "\xfcnk", "unk", "juk",
             "j\xfck", "\xe1nk", "\xe9nk", "nk", "uk", "\xfck", "em",
             "om", "am", "od", "ed", "ad", "\xf6d", "ja", "je",
             "\xe1m", "\xe1d", "\xe9m", "\xe9d", "m", "d", "a", "e",
             "o", "\xe1", "\xe9")
_HU_STEP7_A = ("\xe1nk", "\xe1juk", "\xe1m", "\xe1d", "\xe1")
_HU_STEP7_E = ("\xe9nk", "\xe9j\xfck", "\xe9m", "\xe9d", "\xe9")
_HU_STEP8 = ("jaitok", "jeitek", "jaink", "jeink", "aitok", "eitek",
             "\xe1itok", "\xe9itek", "jaim", "jeim", "jaid", "jeid",
             "eink", "aink", "itek", "jeik", "jaik", "\xe1ink",
             "\xe9ink", "aim", "eim", "aid", "eid", "jai", "jei",
             "ink", "aik", "eik", "\xe1im", "\xe1id", "\xe1ik",
             "\xe9im", "\xe9id", "\xe9ik", "im", "id", "ai", "ei",
             "ik", "\xe1i", "\xe9i", "i")
_HU_STEP8_A = ("\xe1im", "\xe1id", "\xe1i", "\xe1ink", "\xe1itok",
               "\xe1ik")
_HU_STEP8_E = ("\xe9im", "\xe9id", "\xe9i", "\xe9ink", "\xe9itek",
               "\xe9ik")
_HU_STEP9 = ("\xe1k", "\xe9k", "\xf6k", "ok", "ek", "ak", "k")


def _r1_hu(word: str) -> str:
    """Hungarian R1 with the reference's digraph quirk (hungarian.py:
    252-256): a vowel-initial word probes the digraph TUPLE in order
    for containment anywhere in word[1:], and R1 then starts after the
    first occurrence of that digraph's LAST letter in the whole word —
    not after the digraph itself."""
    if word[0] in _HU_VOWELS:
        for dg in _HU_DIGRAPHS:
            if dg in word[1:]:
                return word[word.index(dg[-1]) + 1:]
        for i in range(1, len(word)):
            if word[i] not in _HU_VOWELS:
                return word[i + 1:]
        return ""
    for i in range(1, len(word)):
        if word[i] in _HU_VOWELS:
            return word[i + 1:]
    return ""


def _hu_norm_ae(word: str, r1: str) -> tuple[str, str]:
    """Normalize a trailing accented a/e after a removal."""
    if r1.endswith("\xe1"):
        word, r1 = word[:-1] + "a", r1[:-1] + "a"
    elif r1.endswith("\xe9"):
        word, r1 = word[:-1] + "e", r1[:-1] + "e"
    return word, r1


def stem_hu(word: str) -> str:
    """Hungarian snowball (snowballstem.org/algorithms/hungarian).
    Reference quirks (lang/snowball/hungarian.py): the step-1/step-5
    undoubling always rewrites ``word[:-4] + word[-3]`` (resp. -3/-2)
    even for three-letter double consonants, and step 1 never removes
    the al/el suffix itself."""
    word = word.lower()
    r1 = _r1_hu(word)

    # step 1: instrumental case — undouble only
    if r1.endswith(("al", "el")):
        for dc in _HU_DOUBLE:
            if word[-2 - len(dc):-2] == dc:
                word = word[:-4] + word[-3]
                if r1[-2 - len(dc):-2] == dc:
                    r1 = r1[:-4] + r1[-3]
                break

    # step 2: frequent cases
    for sfx in _HU_STEP2:
        if word.endswith(sfx):
            if r1.endswith(sfx):
                n = len(sfx)
                word, r1 = word[:-n], r1[:-n]
                word, r1 = _hu_norm_ae(word, r1)
            break

    # step 3: special cases
    for sfx in _HU_STEP3:
        if r1.endswith(sfx):
            if sfx == "\xe9n":
                word, r1 = word[:-2] + "e", r1[:-2] + "e"
            else:
                n = len(sfx)
                word, r1 = word[:-n] + "a", r1[:-n] + "a"
            break

    # step 4: other cases
    for sfx in _HU_STEP4:
        if r1.endswith(sfx):
            if sfx == "\xe1stul":
                word, r1 = word[:-5] + "a", r1[:-5] + "a"
            elif sfx == "\xe9st\xfcl":
                word, r1 = word[:-5] + "e", r1[:-5] + "e"
            else:
                n = len(sfx)
                word, r1 = word[:-n], r1[:-n]
            break

    # step 5: factive case — undouble only
    for sfx in ("\xe1", "\xe9"):
        if r1.endswith(sfx):
            for dc in _HU_DOUBLE:
                if word[-1 - len(dc):-1] == dc:
                    word = word[:-3] + word[-2]
                    if r1[-1 - len(dc):-1] == dc:
                        r1 = r1[:-3] + r1[-2]
                    break

    # step 6: owned
    for sfx in _HU_STEP6:
        if r1.endswith(sfx):
            if sfx in ("\xe1k\xe9", "\xe1\xe9i"):
                word, r1 = word[:-3] + "a", r1[:-3] + "a"
            elif sfx in ("\xe9k\xe9", "\xe9\xe9i", "\xe9\xe9"):
                n = len(sfx)
                word, r1 = word[:-n] + "e", r1[:-n] + "e"
            else:
                n = len(sfx)
                word, r1 = word[:-n], r1[:-n]
            break

    # step 7: singular owner suffixes
    for sfx in _HU_STEP7:
        if word.endswith(sfx):
            if r1.endswith(sfx):
                n = len(sfx)
                if sfx in _HU_STEP7_A:
                    word, r1 = word[:-n] + "a", r1[:-n] + "a"
                elif sfx in _HU_STEP7_E:
                    word, r1 = word[:-n] + "e", r1[:-n] + "e"
                else:
                    word, r1 = word[:-n], r1[:-n]
            break

    # step 8: plural owner suffixes
    for sfx in _HU_STEP8:
        if word.endswith(sfx):
            if r1.endswith(sfx):
                n = len(sfx)
                if sfx in _HU_STEP8_A:
                    word, r1 = word[:-n] + "a", r1[:-n] + "a"
                elif sfx in _HU_STEP8_E:
                    word, r1 = word[:-n] + "e", r1[:-n] + "e"
                else:
                    word, r1 = word[:-n], r1[:-n]
            break

    # step 9: plural suffixes
    for sfx in _HU_STEP9:
        if word.endswith(sfx):
            if r1.endswith(sfx):
                if sfx == "\xe1k":
                    word = word[:-2] + "a"
                elif sfx == "\xe9k":
                    word = word[:-2] + "e"
                else:
                    word = word[:-len(sfx)]
            break

    return word


# ---------------------------------------------------------------- romanian

_RO_VOWELS = "aeiouă\xe2\xee"
_RO_STEP0 = ("iilor", "ului", "elor", "iile", "ilor", "atei",
             "aţie", "aţia", "aua", "ele", "iua", "iei",
             "ile", "ul", "ea", "ii")
_RO_STEP1 = ("abilitate", "abilitati", "abilităţi",
             "ibilitate", "abilităi", "ivitate", "ivitati",
             "ivităţi", "icitate", "icitati",
             "icităţi", "icatori", "ivităi",
             "icităi", "icator", "aţiune", "atoare",
             "ătoare", "iţiune", "itoare", "iciva", "icive",
             "icivi", "icivă", "icala", "icale", "icali",
             "icală", "ativa", "ative", "ativi", "ativă",
             "atori", "ători", "itiva", "itive", "itivi",
             "itivă", "itori", "iciv", "ical", "ativ", "ator",
             "ător", "itiv", "itor")
_RO_STEP1_ABIL = ("abilitate", "abilitati", "abilităi",
                  "abilităţi")
_RO_STEP1_IV = ("ivitate", "ivitati", "ivităi",
                "ivităţi")
_RO_STEP1_IC = ("icitate", "icitati", "icităi",
                "icităţi", "icator", "icatori", "iciv",
                "iciva", "icive", "icivi", "icivă", "ical",
                "icala", "icale", "icali", "icală")
_RO_STEP1_AT = ("ativ", "ativa", "ative", "ativi", "ativă",
                "aţiune", "atoare", "ator", "atori",
                "ătoare", "ător", "ători")
_RO_STEP1_IT = ("itiv", "itiva", "itive", "itivi", "itivă",
                "iţiune", "itoare", "itor", "itori")
_RO_STEP2 = ("abila", "abile", "abili", "abilă", "ibila",
             "ibile", "ibili", "ibilă", "atori", "itate",
             "itati", "ităţi", "abil", "ibil", "oasa",
             "oasă", "oase", "anta", "ante", "anti",
             "antă", "ator", "ităi", "iune", "iuni",
             "isme", "ista", "iste", "isti", "istă",
             "işti", "ata", "ată", "ati", "ate", "uta",
             "ută", "uti", "ute", "ita", "ită", "iti",
             "ite", "ica", "ice", "ici", "ică", "osi",
             "oşi", "ant", "iva", "ive", "ivi", "ivă",
             "ism", "ist", "at", "ut", "it", "ic", "os", "iv")
_RO_STEP2_IST = ("ism", "isme", "ist", "ista", "iste", "isti",
                 "istă", "işti")
_RO_STEP3 = ("seserăţi", "aserăţi",
             "iserăţi", "\xe2serăţi",
             "userăţi", "seserăm", "aserăm",
             "iserăm", "\xe2serăm", "userăm",
             "serăţi", "seseşi", "seseră",
             "ească", "arăţi", "urăţi",
             "irăţi", "\xe2răţi", "aseşi",
             "aseră", "iseşi", "iseră", "\xe2seşi",
             "\xe2seră", "useşi", "useră",
             "serăm", "sesem", "indu", "\xe2ndu", "ează",
             "eşti", "eşte", "ăşti",
             "ăşte", "eaţi", "iaţi", "arăm",
             "urăm", "irăm", "\xe2răm", "asem",
             "isem", "\xe2sem", "usem", "seşi", "seră",
             "sese", "are", "ere", "ire", "\xe2re", "ind", "\xe2nd",
             "eze", "ezi", "esc", "ăsc", "eam", "eai", "eau",
             "iam", "iai", "iau", "aşi", "ară", "uşi",
             "ură", "işi", "iră", "\xe2şi",
             "\xe2ră", "ase", "ise", "\xe2se", "use", "aţi",
             "eţi", "iţi", "\xe2ţi", "sei", "ez",
             "am", "ai", "au", "ea", "ia", "ui", "\xe2i", "ăm",
             "em", "im", "\xe2m", "se")
_RO_STEP3_S = ("seserăţi", "seserăm",
               "serăţi", "seseşi", "seseră",
               "serăm", "sesem", "seşi", "seră",
               "sese", "aţi", "eţi", "iţi",
               "\xe2ţi", "sei", "ăm", "em", "im",
               "\xe2m", "se")


def stem_ro(word: str) -> str:
    """Romanian snowball (snowballstem.org/algorithms/romanian).
    Reference quirks (lang/snowball/romanian.py): region membership is
    a SUBSTRING test (``suffix in r1``), R1/R2 are never re-sliced as
    the word shrinks, step 0's aua/atei/ile branch removes only two
    letters, and step 3's non-s-group guard indexes the FIRST
    occurrence of the suffix in RV and excludes ``u`` from its
    preceding-vowel set."""
    word = word.lower()
    step1_success = False
    step2_success = False

    # mark intervocalic i/u as consonants
    for i in range(1, len(word) - 1):
        if word[i - 1] in _RO_VOWELS and word[i + 1] in _RO_VOWELS:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "i":
                word = word[:i] + "I" + word[i + 1:]

    r1, r2 = _r1r2(word, _RO_VOWELS)
    rv = _rv(word, _RO_VOWELS)

    # STEP 0: plurals and simplifications (word/rv only; r1 frozen)
    for sfx in _RO_STEP0:
        if word.endswith(sfx):
            if sfx in r1:
                if sfx in ("ul", "ului"):
                    word = word[:-len(sfx)]
                    rv = rv[:-len(sfx)] if sfx in rv else ""
                elif (sfx in ("aua", "atei")
                      or (sfx == "ile" and word[-5:-3] != "ab")):
                    word = word[:-2]
                elif sfx in ("ea", "ele", "elor"):
                    word = word[:-len(sfx)] + "e"
                    rv = rv[:-len(sfx)] + "e" if sfx in rv else ""
                elif sfx in ("ii", "iua", "iei", "iile", "iilor",
                             "ilor"):
                    word = word[:-len(sfx)] + "i"
                    rv = rv[:-len(sfx)] + "i" if sfx in rv else ""
                elif sfx in ("aţie", "aţia"):
                    word = word[:-1]
            break

    # STEP 1: combining suffixes, repeated to a fixed point
    while True:
        replaced = False
        for sfx in _RO_STEP1:
            if word.endswith(sfx):
                if sfx in r1:
                    step1_success = True
                    replaced = True
                    if sfx in _RO_STEP1_ABIL:
                        word = word[:-len(sfx)] + "abil"
                    elif sfx == "ibilitate":
                        word = word[:-5]
                    elif sfx in _RO_STEP1_IV:
                        word = word[:-len(sfx)] + "iv"
                    elif sfx in _RO_STEP1_IC:
                        word = word[:-len(sfx)] + "ic"
                    elif sfx in _RO_STEP1_AT:
                        word = word[:-len(sfx)] + "at"
                        if sfx in r2:
                            r2 = r2[:-len(sfx)] + "at"
                    elif sfx in _RO_STEP1_IT:
                        word = word[:-len(sfx)] + "it"
                        if sfx in r2:
                            r2 = r2[:-len(sfx)] + "it"
                else:
                    step1_success = False
                break
        if not replaced:
            break

    # STEP 2: standard suffixes
    for sfx in _RO_STEP2:
        if word.endswith(sfx):
            if sfx in r2:
                step2_success = True
                if sfx in ("iune", "iuni"):
                    if word[-5] == "ţ":
                        word = word[:-5] + "t"
                elif sfx in _RO_STEP2_IST:
                    word = word[:-len(sfx)] + "ist"
                else:
                    word = word[:-len(sfx)]
            break

    # STEP 3: verb suffixes (only if steps 1-2 did nothing)
    if not step1_success and not step2_success:
        for sfx in _RO_STEP3:
            if word.endswith(sfx):
                if sfx in rv:
                    if sfx in _RO_STEP3_S:
                        word = word[:-len(sfx)]
                        rv = rv[:-len(sfx)]
                    elif (not rv.startswith(sfx)
                          and rv[rv.index(sfx) - 1]
                          not in "aeioă\xe2\xee"):
                        word = word[:-len(sfx)]
                    break

    # STEP 4: final vowel
    for sfx in ("ie", "a", "e", "i", "ă"):
        if word.endswith(sfx):
            if sfx in rv:
                word = word[:-len(sfx)]
            break

    return word.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------- russian

# Romanization per the reference's table (lang/snowball/russian.py:
# 354-386) — ALA-LC-style with i^a / i^u / e` / i` / t^s digraph marks.
_RU_CYR2ROM = (
    ("А", "a"), ("а", "a"), ("Б", "b"), ("б", "b"),
    ("В", "v"), ("в", "v"), ("Г", "g"), ("г", "g"),
    ("Д", "d"), ("д", "d"), ("Е", "e"), ("е", "e"),
    ("Ё", "e"), ("ё", "e"), ("Ж", "zh"), ("ж", "zh"),
    ("З", "z"), ("з", "z"), ("И", "i"), ("и", "i"),
    ("Й", "i`"), ("й", "i`"), ("К", "k"), ("к", "k"),
    ("Л", "l"), ("л", "l"), ("М", "m"), ("м", "m"),
    ("Н", "n"), ("н", "n"), ("О", "o"), ("о", "o"),
    ("П", "p"), ("п", "p"), ("Р", "r"), ("р", "r"),
    ("С", "s"), ("с", "s"), ("Т", "t"), ("т", "t"),
    ("У", "u"), ("у", "u"), ("Ф", "f"), ("ф", "f"),
    ("Х", "kh"), ("х", "kh"), ("Ц", "t^s"),
    ("ц", "t^s"), ("Ч", "ch"), ("ч", "ch"),
    ("Ш", "sh"), ("ш", "sh"), ("Щ", "shch"),
    ("щ", "shch"), ("Ъ", "''"), ("ъ", "''"),
    ("Ы", "y"), ("ы", "y"), ("Ь", "'"), ("ь", "'"),
    ("Э", "e`"), ("э", "e`"), ("Ю", "i^u"),
    ("ю", "i^u"), ("Я", "i^a"), ("я", "i^a"),
)
# The inverse chain runs in the reference's exact order — longer marks
# first (shch before sh before s…), with "e" deliberately replaced
# BEFORE "zh"/"z" just as the reference does.
_RU_ROM2CYR = (
    ("i^u", "ю"), ("i^a", "я"), ("shch", "щ"),
    ("kh", "х"), ("t^s", "ц"), ("ch", "ч"),
    ("e`", "э"), ("i`", "й"), ("sh", "ш"),
    ("k", "к"), ("e", "е"), ("zh", "ж"),
    ("a", "а"), ("b", "б"), ("v", "в"), ("g", "г"),
    ("d", "д"), ("z", "з"), ("i", "и"), ("l", "л"),
    ("m", "м"), ("n", "н"), ("o", "о"), ("p", "п"),
    ("r", "р"), ("s", "с"), ("t", "т"), ("u", "у"),
    ("f", "ф"), ("''", "ъ"), ("y", "ы"),
    ("'", "ь"),
)

_RU_GERUND = ("ivshis'", "yvshis'", "vshis'", "ivshi", "yvshi", "vshi",
              "iv", "yv", "v")
_RU_GERUND_A = ("v", "vshi", "vshis'")

# adjectival = (participle prefix | "") + adjective ending; the "a-
# conditioned" subset is the plain-participle prefixes.  The reference
# carries one typo'd entry — 'ui^ushchaia' for ui^ushch+ai^a — which we
# keep verbatim (russian.py:34).
_RU_ADJ_ENDINGS = ("i^ui^u", "i^ai^a", "imi", "ymi", "ego", "ogo",
                   "emu", "omu", "ikh", "ykh", "ui^u", "ai^a", "oi^u",
                   "ei^u", "ee", "ie", "ye", "oe", "ei`", "ii`", "yi`",
                   "oi`", "em", "im", "ym", "om")
_RU_PART_A = ("em", "nn", "vsh", "i^ushch", "shch")
_RU_PART_PLAIN = ("ivsh", "yvsh", "ui^ushch")


def _ru_adjectival() -> tuple[tuple[str, ...], frozenset]:
    full = {p + e for p in _RU_PART_A + _RU_PART_PLAIN + ("",)
            for e in _RU_ADJ_ENDINGS}
    full.discard("ui^ushchai^a")
    full.add("ui^ushchaia")           # reference typo, kept on purpose
    special = frozenset(p + e for p in _RU_PART_A
                        for e in _RU_ADJ_ENDINGS)
    ordered = tuple(sorted(full, key=lambda s: (-len(s), s)))
    return ordered, special


_RU_ADJECTIVAL, _RU_ADJ_A = _ru_adjectival()
_RU_REFLEXIVE = ("si^a", "s'")
_RU_VERB = ("esh'", "ei`te", "ui`te", "ui^ut", "ish'", "ete", "i`te",
            "i^ut", "nno", "ila", "yla", "ena", "ite", "ili", "yli",
            "ilo", "ylo", "eno", "i^at", "uet", "eny", "it'", "yt'",
            "ui^u", "la", "na", "li", "em", "lo", "no", "et", "ny",
            "t'", "ei`", "ui`", "il", "yl", "im", "ym", "en", "it",
            "yt", "i^u", "i`", "l", "n")
_RU_VERB_A = frozenset(("la", "na", "ete", "i`te", "li", "i`", "l",
                        "em", "n", "lo", "no", "et", "i^ut", "ny",
                        "t'", "esh'", "nno"))
_RU_NOUN = ("ii^ami", "ii^akh", "i^ami", "ii^am", "i^akh", "ami",
            "iei`", "i^am", "iem", "akh", "ii^u", "'i^u", "ii^a",
            "'i^a", "ev", "ov", "ie", "'e", "ei", "ii", "ei`", "oi`",
            "ii`", "em", "am", "om", "i^u", "i^a", "a", "e", "i",
            "i`", "o", "u", "y", "'")
_RU_VOWELS_ROM = "AUEaeiouy"


def _ru_regions(word: str) -> tuple[str, str]:
    """RV and R2 on the romanized word, with i^a/i^u/e` packed to
    single markers while scanning (russian.py:305-336)."""
    packed = (word.replace("i^a", "A").replace("i^u", "U")
              .replace("e`", "E"))
    r1 = r2 = rv = ""
    for i in range(1, len(packed)):
        if packed[i] not in _RU_VOWELS_ROM and packed[i - 1] in _RU_VOWELS_ROM:
            r1 = packed[i + 1:]
            break
    for i in range(1, len(r1)):
        if r1[i] not in _RU_VOWELS_ROM and r1[i - 1] in _RU_VOWELS_ROM:
            r2 = r1[i + 1:]
            break
    for i in range(len(packed)):
        if packed[i] in _RU_VOWELS_ROM:
            rv = packed[i + 1:]
            break
    unpack = lambda s: (s.replace("A", "i^a").replace("U", "i^u")
                        .replace("E", "e`"))
    return unpack(rv), unpack(r2)


def _ru_preceded_by_a(rv: str, n: int) -> bool:
    return (rv[-n - 3:-n] == "i^a" or rv[-n - 1:-n] == "a")


def stem_ru(word: str) -> str:
    """Russian snowball (snowballstem.org/algorithms/russian) over the
    reference's romanized alphabet: Cyrillic input is transliterated,
    stemmed, and transliterated back; pure latin-1 input is stemmed
    as already-romanized text.  No lowercasing (reference quirk)."""
    cyrillic = any(ord(c) > 255 for c in word)
    if cyrillic:
        for cyr, rom in _RU_CYR2ROM:
            word = word.replace(cyr, rom)

    rv, r2 = _ru_regions(word)

    # step 1: perfective gerund, else reflexive + adjectival/verb/noun
    step1 = False
    for sfx in _RU_GERUND:
        if rv.endswith(sfx):
            n = len(sfx)
            if sfx in _RU_GERUND_A and not _ru_preceded_by_a(rv, n):
                continue
            word, r2, rv = word[:-n], r2[:-n], rv[:-n]
            step1 = True
            break

    if not step1:
        for sfx in _RU_REFLEXIVE:
            if rv.endswith(sfx):
                n = len(sfx)
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                break

        removed = False
        for sfx in _RU_ADJECTIVAL:
            if rv.endswith(sfx):
                n = len(sfx)
                if sfx in _RU_ADJ_A and not _ru_preceded_by_a(rv, n):
                    continue
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                removed = True
                break

        if not removed:
            for sfx in _RU_VERB:
                if rv.endswith(sfx):
                    n = len(sfx)
                    if sfx in _RU_VERB_A and not _ru_preceded_by_a(rv, n):
                        continue
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    removed = True
                    break

        if not removed:
            for sfx in _RU_NOUN:
                if rv.endswith(sfx):
                    n = len(sfx)
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    break

    # step 2: final i
    if rv.endswith("i"):
        word, r2 = word[:-1], r2[:-1]

    # step 3: derivational (R2)
    for sfx in ("ost'", "ost"):
        if r2.endswith(sfx):
            word = word[:-len(sfx)]
            break

    # step 4: undouble n / superlative / soft sign
    undoubled = superlative = False
    if word.endswith("nn"):
        word = word[:-1]
        undoubled = True
    if not undoubled:
        for sfx in ("ei`she", "ei`sh"):
            if word.endswith(sfx):
                word = word[:-len(sfx)]
                superlative = True
                break
        if word.endswith("nn"):
            word = word[:-1]
    if not undoubled and not superlative and word.endswith("'"):
        word = word[:-1]

    if cyrillic:
        for rom, cyr in _RU_ROM2CYR:
            word = word.replace(rom, cyr)
    return word


from whoosh_ray.functions.isri import stem_ar  # noqa: E402  (ar is ISRI, not snowball)

# Every language the reference's stemmer_for_language registry resolves
# (lang/__init__.py:113-131): 14 snowball classes + the ISRI Arabic
# stemmer.  Turkish has a stop list but no stemmer there either.
STEMMERS = {"de": stem_de, "es": stem_es, "da": stem_da, "sv": stem_sv,
            "no": stem_no, "nl": stem_nl, "en": stem_en, "fr": stem_fr,
            "it": stem_it, "pt": stem_pt, "fi": stem_fi, "hu": stem_hu,
            "ro": stem_ro, "ru": stem_ru, "ar": stem_ar}


def resolve_stemmer(lang: str):
    """PyStemmerFilter._get_stemmer_fn facade (reference
    analysis/morph.py:152-217 wraps the py-stemmer C extension and
    raises ImportError without it).  Here the C extension is used when
    importable and otherwise the name resolves — via the same aliases
    the reference's language registry accepts — to the fuzz-verified
    pure implementations above; unknown algorithms raise ValueError."""
    try:
        import Stemmer  # C extension; absent in this environment

        s = Stemmer.Stemmer(lang)
        return s.stemWord
    except ImportError:
        pass
    from whoosh_ray.functions.analysis import LANG_ALIASES

    code = LANG_ALIASES.get(lang, lang)
    if code in STEMMERS:
        return STEMMERS[code]
    raise ValueError(f"no stemming algorithm named {lang!r}")


def pystemmer_algorithms() -> list[str]:
    """PyStemmerFilter.algorithms (morph.py:177-184): the C library's
    list when present, else the snowball names backed above."""
    try:
        import Stemmer

        return list(Stemmer.algorithms())
    except ImportError:
        return ["arabic", "danish", "dutch", "english", "finnish",
                "french", "german", "hungarian", "italian", "norwegian",
                "portuguese", "romanian", "russian", "spanish",
                "swedish"]
