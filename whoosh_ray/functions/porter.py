"""Porter stemmer — behavior-parity with the reference's variant.

The reference ships its own Porter implementation
(/root/reference/src/whoosh/lang/porter.py) whose behavior DIVERGES from
the classic 1980 algorithm in reproducible ways, all of which matter for
rank-identical stemmed indexes, so they are reproduced here on purpose:

- a leading ``y`` is treated as a consonant (temporarily cased away);
- the step-1b "double consonant -> single" and "at/bl/iz -> +e" rules
  are tested with START-anchored matches in the reference, so they fire
  only on degenerate 2-char inputs — i.e. effectively never ("hopping"
  stems to "hopp", not the classic "hop");
- suffix selection in steps 2-4 is the leftmost-longest-suffix of a
  lazy-stem regex alternation, not the classic longest-suffix table walk;
- measure tests use unanchored prefix matches (``m>0`` is "stem has a
  VC somewhere after the lead consonants", not an exact-measure parse).

Fuzz-tested token-identical against the reference over dictionary words
and random strings (tests/test_kernels.py).
"""

from __future__ import annotations

import re

_C = "[^aeiouy]+"
_V = "[aeiou]+"

_M_GT0 = re.compile(f"^({_C})?{_V}{_C}")
_M_EQ1 = re.compile(f"^({_C})?{_V}{_C}({_V})?$")
_M_GT1 = re.compile(f"^({_C})?{_V}{_C}{_V}{_C}")
_HAS_VOWEL = re.compile(f"^({_C})?[aeiouy]")
_ENDS_CVC = re.compile(f"^{_C}[aeiouy][^aeiouwxy]$")

_ED_ING = re.compile(r"^(.*)(ed|ing)$")
_AT_BL_IZ_ANCHORED = re.compile(r"(at|bl|iz)$")     # fired with .match: inert
_DOUBLE_ANCHORED = re.compile(r"([^aeiouylsz])\1$")  # fired with .match: inert

_SUF2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
)
_SUF3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_RE2 = re.compile("^(.+?)(" + "|".join(s for s, _ in _SUF2) + ")$")
_RE3 = re.compile("^(.+?)(" + "|".join(s for s, _ in _SUF3) + ")$")
_MAP2 = dict(_SUF2)
_MAP3 = dict(_SUF3)
_RE4A = re.compile(r"^(.+?)(al|ance|ence|er|ic|able|ible|ant|ement|ment|ent"
                   r"|ou|ism|ate|iti|ous|ive|ize)$")
_RE4B = re.compile(r"^(.+?)(s|t)(ion)$")
_RE5 = re.compile(r"^(.+?)e$")


def stem(word: str) -> str:
    if len(word) < 3:
        return word
    w = word
    y_lead = w[0] == "y"
    if y_lead:
        w = "Y" + w[1:]

    # plurals
    if w.endswith("s"):
        if w.endswith("sses") or w.endswith("ies"):
            w = w[:-2]
        elif w[-2] != "s":
            w = w[:-1]

    # -ed / -ing
    if w.endswith("eed"):
        if _M_GT0.match(w[:-3]):
            w = w[:-1]
    else:
        m = _ED_ING.match(w)
        if m and _HAS_VOWEL.match(m.group(1)):
            w = m.group(1)
            if _AT_BL_IZ_ANCHORED.match(w):
                w += "e"
            elif _DOUBLE_ANCHORED.match(w):
                w = w[:-1]
            elif _ENDS_CVC.match(w):
                w += "e"

    # terminal y
    if w.endswith("y") and _HAS_VOWEL.match(w[:-1]):
        w = w[:-1] + "i"

    m = _RE2.match(w)
    if m and _M_GT0.match(m.group(1)):
        w = m.group(1) + _MAP2[m.group(2)]

    m = _RE3.match(w)
    if m and _M_GT0.match(m.group(1)):
        w = m.group(1) + _MAP3[m.group(2)]

    m = _RE4A.match(w)
    if m:
        if _M_GT1.match(m.group(1)):
            w = m.group(1)
    else:
        m = _RE4B.match(w)
        if m and _M_GT1.match(m.group(1) + m.group(2)):
            w = m.group(1) + m.group(2)

    m = _RE5.match(w)
    if m:
        base = m.group(1)
        if _M_GT1.match(base) or (_M_EQ1.match(base)
                                  and not _ENDS_CVC.match(base)):
            w = base

    if w.endswith("ll") and _M_GT1.match(w):
        w = w[:-1]

    if y_lead:
        w = "y" + w[1:]
    return w
