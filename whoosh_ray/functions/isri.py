"""ISRI Arabic stemmer (Taghva, Elkhoury & Coombs 2005: "Arabic
Stemming without a root dictionary", ISRI / UNLV) — the root-extraction
stemmer the reference engine uses for ``lang="ar"``.

Behavioral parity target: /root/reference/src/whoosh/lang/isri.py
(fuzz-matched in tests/test_language.py).  Reference quirks kept on
purpose:

- the prefix pass interleaves the 2-letter prefix probe inside the
  3-letter loop, so a 2-letter prefix wins over every 3-letter prefix
  except the first (isri.py:197-208); the suffix pass has the same
  shape, which makes later 3-letter suffixes unreachable whenever a
  2-letter suffix also matches (e.g. a word ending تان strips only ان);
- the length-6/4-root pattern test ``(stm[0] and stm[4]) == alif``
  collapses to ``stm[4] == alif`` because ``and`` returns the second
  truthy operand (isri.py:351);
- ISRI's own 60-word stop list short-circuits stemming AFTER diacritic
  removal but BEFORE affix stripping.
"""

from __future__ import annotations

import re

_ALIF = "ا"
_TEH_MARBUTA = "ة"

_P3 = ("كال", "بال",
       "ولل", "وال")
_P2 = ("ال", "لل")
_P1 = ("ل", "ب", "ف", "س", "و",
       "ي", "ت", "ن", "ا")
_S3 = ("تمل", "همل",
       "تان", "تين",
       "كمل")
_S2 = ("ون", "ات", "ان",
       "ين", "تن", "كم",
       "هن", "نا", "يا",
       "ها", "تم", "كن",
       "ني", "وا", "ما",
       "هم")
_S1 = ("ة", "ه", "ي", "ك", "ت",
       "ا", "ن")

# positional letter groups for the length-4 and length-5/3-root patterns
_PR4 = {0: "م", 1: "ا", 2: "اوي", 3: "ة"}
_PR53 = {0: "ات", 1: "ايو",
         2: "اتم", 3: "ميت",
         4: "مت", 5: "او", 6: "ام"}

_SHORT_VOWELS = re.compile("[ً-ْ]")
_INITIAL_HAMZA = re.compile("^[آأإ]")

_STOPWORDS = frozenset((
    "يكون", "وليس",
    "وكان", "كذلك",
    "التي", "وبين",
    "عليها", "مساء",
    "الذي", "وكانت",
    "ولكن", "والتي",
    "تكون", "اليوم",
    "اللذين", "عليه",
    "كانت", "لذلك",
    "أمام", "هناك",
    "منها", "مازال",
    "لازال",
    "لايزال",
    "مايزال",
    "اصبح", "أصبح",
    "أمسى", "امسى",
    "أضحى", "اضحى",
    "مابرح", "مافتئ",
    "ماانفك",
    "لاسيما",
    "ولايزال",
    "الحالي",
    "اليها",
    "الذين", "فانه",
    "والذي", "وهذا",
    "لهذا", "فكان",
    "ستكون", "اليه",
    "يمكن", "بهذا",
    "الذى",
))


def _pre32(s: str) -> str:
    """3- then 2-letter prefixes, with the reference's interleaving:
    the 2-letter probe runs at the FIRST 3-letter miss."""
    if len(s) < 6:
        return s
    for p3 in _P3:
        if s.startswith(p3):
            return s[3:]
        if len(s) >= 5:
            for p2 in _P2:
                if s.startswith(p2):
                    return s[2:]
    return s


def _suf32(s: str) -> str:
    if len(s) < 6:
        return s
    for s3 in _S3:
        if s.endswith(s3):
            return s[:-3]
        if len(s) >= 5:
            for s2 in _S2:
                if s.endswith(s2):
                    return s[:-2]
    return s


def _suf1(s: str) -> str:
    for sf in _S1:
        if s.endswith(sf):
            return s[:-1]
    return s


def _pre1(s: str) -> str:
    for sp in _P1:
        if s.startswith(sp):
            return s[1:]
    return s


def _pro_w4(s: str) -> str:
    if s[0] in _PR4[0]:                       # mif3al
        return s[1:]
    if s[1] in _PR4[1]:                       # fa3il
        return s[0] + s[2:]
    if s[2] in _PR4[2]:                       # fi3al / fu3ul / fi3il
        return s[:2] + s[3]
    if s[3] in _PR4[3]:                       # fa3la
        return s[:-1]
    s = _suf1(s)
    if len(s) == 4:
        s = _pre1(s)
    return s


def _pro_w53(s: str) -> str:
    if s[2] in _PR53[0] and s[0] == _ALIF:
        return s[1] + s[3:]
    if s[3] in _PR53[1] and s[0] == "م":
        return s[1:3] + s[4]
    if s[0] in _PR53[2] and s[4] == _TEH_MARBUTA:
        return s[1:4]
    if s[0] in _PR53[3] and s[2] == "ت":
        return s[1] + s[3:]
    if s[0] in _PR53[4] and s[2] == _ALIF:
        return s[1] + s[3:]
    if s[2] in _PR53[5] and s[4] == _TEH_MARBUTA:
        return s[:2] + s[3]
    if s[0] in _PR53[6] and s[1] == "ن":
        return s[2:]
    if s[3] == _ALIF and s[0] == _ALIF:
        return s[1:3] + s[4]
    if s[4] == "ن" and s[3] == _ALIF:
        return s[:3]
    if s[3] == "ي" and s[0] == "ت":
        return s[1:3] + s[4]
    if s[3] == "و" and s[1] == _ALIF:
        return s[0] + s[2] + s[4]
    if s[2] == _ALIF and s[1] == "و":
        return s[0] + s[3:]
    if s[3] == "ئ" and s[2] == _ALIF:
        return s[:2] + s[4]
    if s[4] == _TEH_MARBUTA and s[1] == _ALIF:
        return s[0] + s[2:4]
    if s[4] == "ي" and s[2] == _ALIF:
        return s[:2] + s[3]
    s = _suf1(s)
    if len(s) == 5:
        s = _pre1(s)
    return s


def _pro_w54(s: str) -> str:
    if s[0] in _PR53[2]:                      # tfa3lal / af3alal / mif3alal
        return s[1:]
    if s[4] == _TEH_MARBUTA:                  # fa3lala
        return s[:4]
    if s[2] == _ALIF:                         # fi3alal
        return s[:2] + s[3:]
    return s


def _end_w5(s: str) -> str:
    if len(s) == 4:
        return _pro_w4(s)
    if len(s) == 5:
        return _pro_w54(s)
    return s


def _pro_w6(s: str) -> str:
    if (s.startswith("است")
            or s.startswith("مست")):
        return s[3:]
    if s[0] == "م" and s[3] == _ALIF and s[5] == _TEH_MARBUTA:
        return s[1:3] + s[4]
    if s[0] == _ALIF and s[2] == "ت" and s[4] == _ALIF:
        return s[1] + s[3] + s[5]
    if s[0] == _ALIF and s[3] == "و" and s[2] == s[4]:
        return s[1] + s[4:]
    if s[0] == "ت" and s[2] == _ALIF and s[4] == "ي":
        return s[1] + s[3] + s[5]
    s = _suf1(s)
    if len(s) == 6:
        s = _pre1(s)
    return s


def _pro_w64(s: str) -> str:
    # the reference's (s[0] and s[4]) == alif reduces to s[4] == alif
    if s[4] == _ALIF:
        return s[1:4] + s[5]
    if s.startswith("مت"):
        return s[2:]
    return s


def _end_w6(s: str) -> str:
    if len(s) == 5:
        return _end_w5(_pro_w53(s))
    if len(s) == 6:
        return _pro_w64(s)
    return s


def stem_ar(word: str) -> str:
    """ISRI root extraction; returns the normalized form when no
    pattern applies (never the original unnormalized word)."""
    s = _SHORT_VOWELS.sub("", word)
    if s in _STOPWORDS:
        return s
    s = _pre32(s)
    s = _suf32(s)
    if len(s) >= 4 and s.startswith("وو"):
        s = s[1:]                             # connective waw
    s = _INITIAL_HAMZA.sub(_ALIF, s)
    n = len(s)
    if n <= 3:
        return s
    if n == 4:
        return _pro_w4(s)
    if n == 5:
        return _end_w5(_pro_w53(s))
    if n == 6:
        return _end_w6(_pro_w6(s))
    if n == 7:
        s = _suf1(s)
        if len(s) == 7:
            s = _pre1(s)
        if len(s) == 6:
            return _end_w6(_pro_w6(s))
    return s
