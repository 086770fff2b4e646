"""Porter2 (snowball "English") stemmer — behavior-parity rebuild of the
reference's adaptation (reference src/whoosh/lang/porter2.py, itself
adapted from pyporter2).  The reference module is a distinct, slightly
quirky rendering of the published algorithm
(http://snowball.tartarus.org/algorithms/english/stemmer.html) and is a
separate public entry point from the snowball English stemmer
(``whoosh.lang.snowball.english``), so it gets its own parity here.

Reference quirks reproduced on purpose (fuzz-pinned in
tests/test_lang_extra.py):

- R1/R2 are frozen BEFORE step 0 strips apostrophe suffixes, so a
  trailing ``'s`` inflates the regions for every later step.
- Step 1c's condition is ``endswith('y') or (endswith('Y') and len>1)``
  — the ``len > 1`` guard binds only to the ``'Y'`` arm (Python ``and``
  over ``or`` precedence in the reference source).
- The region scan treats any non-``aeiouy`` character — digits,
  punctuation — as a consonant (the reference regex ``[^aeiouy]``).
- ``ends_with_short_syllable`` excludes a trailing capital ``Y``
  (consonant-marked y) from the final consonant class.

This file contains only the published algorithm's suffix tables (shared
data, like the Porter constants in functions/porter.py); the code is an
original scanner-based implementation.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
# R1 overrides for exceptional stems (published algorithm data)
_R1_PREFIXES = (("commun", 6), ("gener", 5), ("arsen", 5))

_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

# step 2: suffix -> (replacement, required chars just before the suffix)
_STEP2 = (
    ("ization", "ize", ""), ("ational", "ate", ""), ("fulness", "ful", ""),
    ("ousness", "ous", ""), ("iveness", "ive", ""), ("tional", "tion", ""),
    ("biliti", "ble", ""), ("lessli", "less", ""), ("entli", "ent", ""),
    ("ation", "ate", ""), ("alism", "al", ""), ("aliti", "al", ""),
    ("ousli", "ous", ""), ("iviti", "ive", ""), ("fulli", "ful", ""),
    ("enci", "ence", ""), ("anci", "ance", ""), ("abli", "able", ""),
    ("izer", "ize", ""), ("ator", "ate", ""), ("alli", "al", ""),
    ("bli", "ble", ""), ("ogi", "og", "l"), ("li", "", "cdeghkmnrt"),
)

# step 3: suffix -> (replacement, needs R2)
_STEP3 = (
    ("ational", "ate", False), ("tional", "tion", False),
    ("alize", "al", False), ("icate", "ic", False), ("iciti", "ic", False),
    ("ative", "", True), ("ical", "ic", False), ("ness", "", False),
    ("ful", "", False),
)

_STEP4 = ("al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
          "ment", "ent", "ism", "ate", "iti", "ous", "ive", "ize")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "howe": "howe", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes",
}

_STOP_AFTER_1A = frozenset(("inning", "outing", "canning", "herring",
                            "earring", "proceed", "exceed", "succeed"))

_WORDCHARS = None  # lazily built \w membership probe


def _is_wordchar(c: str) -> bool:
    # the reference regions regex ends in (\w*); only membership of the
    # char AT the region boundary matters and \w never changes start(1),
    # so region computation below never needs this — kept for clarity
    return c.isalnum() or c == "_"


def _region_after_vc(word: str, start: int) -> int:
    """Index just past the first vowel-run + one consonant at/after
    ``start`` (the reference regex ``[^aeiouy]*[aeiouy]+[^aeiouy]`` with
    ``match.start(1)``); ``len(word)`` when the pattern never completes."""
    n = len(word)
    i = start
    while i < n and word[i] not in _VOWELS:
        i += 1
    if i >= n:
        return n
    while i < n and word[i] in _VOWELS:
        i += 1
    if i >= n:
        return n
    return i + 1


def _get_r1(word: str) -> int:
    for pre, r1 in _R1_PREFIXES:
        if word.startswith(pre):
            return r1
    return _region_after_vc(word, 0)


def _get_r2(word: str) -> int:
    return _region_after_vc(word, _get_r1(word))


def _short_syllable_end(word: str) -> bool:
    if len(word) == 2 and word[0] in _VOWELS and word[1] not in _VOWELS:
        return True
    # ...[consonant][vowel][consonant not in wxY] at the very end
    if len(word) >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (a not in _VOWELS and b in _VOWELS
                and c not in _VOWELS and c not in "wxY")
    return False


def _is_short(word: str) -> bool:
    return _short_syllable_end(word) and _get_r1(word) == len(word)


def _mark_consonant_ys(word: str) -> str:
    if word.startswith("y"):
        word = "Y" + word[1:]
    out = []
    prev_vowel = False
    for ch in word:
        if ch == "y" and prev_vowel:
            out.append("Y")
            prev_vowel = False  # the marked Y is a consonant
        else:
            out.append(ch)
            prev_vowel = ch in _VOWELS
    return "".join(out)


def _step0(word: str) -> str:
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            return word[: -len(suf)]
    return word


def _has_vowel_before_last(s: str) -> bool:
    # the reference's s1a_exp: a vowel followed by ANY character
    return any(c in _VOWELS for c in s[:-1])


def _step1a(word: str) -> str:
    if word.endswith("sses"):
        return word[:-4] + "ss"
    if word.endswith("ied") or word.endswith("ies"):
        return word[:-3] + ("i" if len(word) > 4 else "ie")
    if word.endswith("us") or word.endswith("ss"):
        return word
    if word.endswith("s") and _has_vowel_before_last(word[:-1]):
        return word[:-1]
    return word


def _step1b_fixup(word: str) -> str:
    if word.endswith(("at", "bl", "iz")):
        return word + "e"
    if word.endswith(_DOUBLES):
        return word[:-1]
    if _is_short(word):
        return word + "e"
    return word


def _step1b(word: str, r1: int) -> str:
    if word.endswith("eedly"):
        return word[:-3] if len(word) - 5 >= r1 else word
    if word.endswith("eed"):
        return word[:-1] if len(word) - 3 >= r1 else word
    for suf in ("ed", "edly", "ing", "ingly"):
        if word.endswith(suf):
            stem = word[: -len(suf)]
            if any(c in _VOWELS for c in stem):
                return _step1b_fixup(stem)
            return word
    return word


def _step1c(word: str) -> str:
    # reference precedence quirk: len guard applies to the 'Y' arm only
    if word.endswith("y") or (word.endswith("Y") and len(word) > 1):
        if word[-2] not in "aeiouy" and len(word) > 2:
            return word[:-1] + "i"
    return word


def _step2(word: str, r1: int) -> str:
    for suf, repl, before in _STEP2:
        if word.endswith(suf):
            stem = word[: -len(suf)]
            if len(stem) >= r1 and (not before or (stem and stem[-1] in before)):
                return stem + repl
            return word
    return word


def _step3(word: str, r1: int, r2: int) -> str:
    for suf, repl, need_r2 in _STEP3:
        if word.endswith(suf):
            stem = word[: -len(suf)]
            if len(stem) >= r1 and (not need_r2 or len(stem) >= r2):
                return stem + repl
            return word
    return word


def _step4(word: str, r2: int) -> str:
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                return word[: -len(suf)]
            return word
    if (word.endswith("sion") or word.endswith("tion")) \
            and len(word) - 3 >= r2:
        return word[:-3]
    return word


def _step5(word: str, r1: int, r2: int) -> str:
    if word.endswith("l"):
        if len(word) - 1 >= r2 and word[-2] == "l":
            return word[:-1]
        return word
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            return word[:-1]
        if len(word) - 1 >= r1 and not _short_syllable_end(word[:-1]):
            return word[:-1]
    return word


def stem(word: str) -> str:
    """Porter2 stem with reference-adaptation parity (see module doc)."""
    if len(word) <= 2:
        return word
    if word.startswith("'"):
        word = word[1:]
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]

    word = _mark_consonant_ys(word)
    r1 = _get_r1(word)
    r2 = _get_r2(word)
    word = _step0(word)
    word = _step1a(word)
    if word in _STOP_AFTER_1A:
        return word
    word = _step1b(word, r1)
    word = _step1c(word)
    word = _step2(word, r1)
    word = _step3(word, r1, r2)
    word = _step4(word, r2)
    word = _step5(word, r1, r2)
    return word.replace("Y", "y")
