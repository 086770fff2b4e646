"""Quasi-phonetic encoders — behavior parity with the reference
``whoosh/lang/phonetic.py`` (soundex for English, Spanish and Arabic).

The code tables are published data the reference itself credits:
English soundex digits (classic Russell/Odell soundex, ActiveState
recipe 52213), the Spanish rule list (Sebastian Ferreyra's javalobby
coder) and the Arabic class map (Tammam Koujan's ArabicSoundex).

Reference quirks reproduced on purpose (fuzz-pinned in
tests/test_lang_extra.py):

- ``soundex_en`` keeps the FIRST ALPHA character (not the first char),
  dedups consecutive codes before substituting the head, and raises
  ``TypeError`` on input with no a-z at all (``None + str``).
- ``soundex_esp`` applies the first matching rule AT each position
  (rules are anchored, not global subs) and falls back to copying the
  raw character; consecutive equal codes collapse.
- ``soundex_ar`` drops a leading alef form, skips vowels (class 0),
  REUSES the previous code for unmapped characters (the reference
  assigns ``code`` only inside the membership test), and raises
  ``UnboundLocalError``/``NameError`` when the first examined char is
  unmapped, ``IndexError`` on empty input.
"""

from __future__ import annotations

import re

# a-z -> soundex digit ('0' = vowel-ish, dropped implicitly by dedup)
_EN_CODES = "01230120022455012623010202"


def soundex_en(word: str) -> str:
    if not word:
        return ""
    first_alpha = None
    codes = []
    prev = None
    for ch in word.lower():
        o = ord(ch)
        if 97 <= o <= 122:
            if first_alpha is None:
                first_alpha = ch
            code = _EN_CODES[o - 97]
            if code != prev:
                codes.append(code)
            prev = code
    # reference: r = fc + r[1:] — TypeError when no alpha seen
    return first_alpha + "".join(codes)[1:]


_ESP_RULES = tuple(
    (re.compile(pat), repl) for pat, repl in (
        (r"\Aw?[uh]?([aeiou])", ""),
        (r"c[eiéí]|z|ll|sh|ch|sch|cc|y[aeiouáéíóú]|ps|bs|x|j|g[eiéí]", "s"),
        (r"[aeiouhwáéíóúü]+", ""),
        (r"y", ""),
        (r"ñ|gn", "n"),
        (r"[dpc]t", "t"),
        (r"c[aouáóú]|ck|q", "k"),
        (r"v", "b"),
        (r"d$", "t"),
    ))


def soundex_esp(word: str) -> str:
    word = word.lower()
    out = []
    prev = None
    i = 0
    while i < len(word):
        code = None
        for expr, ecode in _ESP_RULES:
            m = expr.match(word, i)
            if m:
                i = m.end()
                code = ecode
                break
        if code is None:
            code = word[i]
            i += 1
        if code != prev:
            out.append(code)
        prev = code
    return "".join(out)


_AR_CLASSES = {
    "اأإآحخهعغشوي": "0",
    "فب": "1",
    "جزسصظقك": "2",
    "تثدذضط": "3",
    "ل": "4",
    "من": "5",
    "ر": "6",
}
_AR_CODES = {c: code for chars, code in _AR_CLASSES.items() for c in chars}


def soundex_ar(word: str) -> str:
    if word[0] in "اأإآ":
        word = word[1:]
    out = ["0"]
    prevcode = "0"
    code = None
    if len(word) > 1:
        for ch in word[1:]:
            if ch in _AR_CODES:
                code = _AR_CODES[ch]
            elif code is None:
                # reference reads a never-assigned local here
                raise UnboundLocalError(
                    "cannot access local variable 'code' where it is not "
                    "associated with a value")
            if code != prevcode and code != "0":
                out.append(code)
            prevcode = code
    return "".join(out)
