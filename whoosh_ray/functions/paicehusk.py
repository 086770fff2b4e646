"""Paice-Husk (Lancaster) stemmer — behavior parity with the reference
``whoosh/lang/paicehusk.py``.

The rule set is the published Lancaster/Paice-Husk table (Paice 1990,
"Another stemmer", SIGIR Forum 24(3)); it is stored here as structured
tuples ``(ending, intact_only, remove, append, continue)`` with endings
in forward orientation instead of the reference's reversed-suffix rule
strings (a structural-equality test against the reference's parsed rule
table guards the transcription).

Reference quirks reproduced on purpose (fuzz-pinned in
tests/test_lang_extra.py):

- the word is first truncated to its leading ``\\w+`` run (``can't``
  stems ``can``); words with no leading word-char return unchanged;
- measurement-prefix stripping can leave an EMPTY stem ("kilo" →
  ``ValueError``/``IndexError`` in the reference's first-vowel probe);
  vowel-less words crash the same probe (``min()`` of an empty list);
- ``y`` counts as the first vowel only when it appears after position
  0 and before any ``aeiou``;
- acceptability: stems that start with a vowel must keep ≥2 chars,
  consonant-initial stems ≥3 — checked against the POST-rule length
  ``len(stem) - remove + len(append)``.
"""

from __future__ import annotations

import re
from collections import defaultdict

# (ending, intact_only, remove_count, append, continue) — in the
# published table's order; first match within a bucket wins.
RULES = (
    ("ia", True, 2, "", False),
    ("a", True, 1, "", False),
    ("bb", False, 1, "", False),
    ("ytic", False, 3, "s", False),
    ("ic", False, 2, "", True),
    ("nc", False, 1, "t", True),
    ("dd", False, 1, "", False),
    ("ied", False, 3, "y", True),
    ("ceed", False, 2, "ss", False),
    ("eed", False, 1, "", False),
    ("ed", False, 2, "", True),
    ("hood", False, 4, "", True),
    ("e", False, 1, "", True),
    ("lief", False, 1, "v", False),
    ("if", False, 2, "", True),
    ("ing", False, 3, "", True),
    ("iag", False, 3, "y", False),
    ("ag", False, 2, "", True),
    ("gg", False, 1, "", False),
    ("th", True, 2, "", False),
    ("guish", False, 5, "ct", False),
    ("ish", False, 3, "", True),
    ("i", True, 1, "", False),
    ("i", False, 1, "y", True),
    ("ij", False, 1, "d", False),
    ("fuj", False, 1, "s", False),
    ("uj", False, 1, "d", False),
    ("oj", False, 1, "d", False),
    ("hej", False, 1, "r", False),
    ("verj", False, 1, "t", False),
    ("misj", False, 2, "t", False),
    ("nj", False, 1, "d", False),
    ("j", False, 1, "s", False),
    ("ifiabl", False, 6, "", False),
    ("iabl", False, 4, "y", False),
    ("abl", False, 3, "", True),
    ("ibl", False, 3, "", False),
    ("bil", False, 2, "l", True),
    ("cl", False, 1, "", False),
    ("iful", False, 4, "y", False),
    ("ful", False, 3, "", True),
    ("ul", False, 2, "", False),
    ("ial", False, 3, "", True),
    ("ual", False, 3, "", True),
    ("al", False, 2, "", True),
    ("ll", False, 1, "", False),
    ("ium", False, 3, "", False),
    ("um", True, 2, "", False),
    ("ism", False, 3, "", True),
    ("mm", False, 1, "", False),
    ("sion", False, 4, "j", True),
    ("xion", False, 4, "ct", False),
    ("ion", False, 3, "", True),
    ("ian", False, 3, "", True),
    ("an", False, 2, "", True),
    ("een", False, 0, "", False),
    ("en", False, 2, "", True),
    ("nn", False, 1, "", False),
    ("ship", False, 4, "", True),
    ("pp", False, 1, "", False),
    ("er", False, 2, "", True),
    ("ear", False, 0, "", False),
    ("ar", False, 2, "", False),
    ("or", False, 2, "", True),
    ("ur", False, 2, "", True),
    ("rr", False, 1, "", False),
    ("tr", False, 1, "", True),
    ("ier", False, 3, "y", True),
    ("ies", False, 3, "y", True),
    ("sis", False, 2, "", False),
    ("is", False, 2, "", True),
    ("ness", False, 4, "", True),
    ("ss", False, 0, "", False),
    ("ous", False, 3, "", True),
    ("us", True, 2, "", False),
    ("s", True, 1, "", True),
    ("s", False, 0, "", False),
    ("plicat", False, 4, "y", False),
    ("at", False, 2, "", True),
    ("ment", False, 4, "", True),
    ("ent", False, 3, "", True),
    ("ant", False, 3, "", True),
    ("ript", False, 2, "b", False),
    ("orpt", False, 2, "b", False),
    ("duct", False, 1, "", False),
    ("sumpt", False, 2, "", False),
    ("cept", False, 2, "iv", False),
    ("olut", False, 2, "v", False),
    ("sist", False, 0, "", False),
    ("ist", False, 3, "", True),
    ("tt", False, 1, "", False),
    ("iqu", False, 3, "", False),
    ("ogu", False, 1, "", False),
    ("siv", False, 3, "j", True),
    ("eiv", False, 0, "", False),
    ("iv", False, 2, "", True),
    ("bly", False, 1, "", True),
    ("ily", False, 3, "y", True),
    ("ply", False, 0, "", False),
    ("ly", False, 2, "", True),
    ("ogy", False, 1, "", False),
    ("phy", False, 1, "", False),
    ("omy", False, 1, "", False),
    ("opy", False, 1, "", False),
    ("ity", False, 3, "", True),
    ("ety", False, 3, "", True),
    ("lty", False, 2, "", False),
    ("istry", False, 5, "", False),
    ("ary", False, 3, "", True),
    ("ory", False, 3, "", True),
    ("ify", False, 3, "", False),
    ("ncy", False, 2, "t", True),
    ("acy", False, 3, "", True),
    ("iz", False, 2, "", True),
    ("yz", False, 1, "s", False),
)

_PREFIXES = ("kilo", "micro", "milli", "intra", "ultra", "mega",
             "nano", "pico", "pseudo")

_WORD_HEAD = re.compile(r"^\w+", re.UNICODE)
# reference custom-rule line format: reversed-ending, optional '*',
# remove count, optional append, '.' (stop) or '>' (continue)
_RULE_LINE = re.compile(
    r"^(?P<ending>\w+)(?P<intact>[*]?)(?P<num>\d+)(?P<append>\w*)"
    r"(?P<cont>[.>])", re.UNICODE)


def _bucket(rules) -> dict[str, list]:
    by_last: dict[str, list] = defaultdict(list)
    for ending, intact, num, append, cont in rules:
        by_last[ending[-1]].append((ending, intact, num, append, cont))
    return dict(by_last)


def parse_rule_text(ruletable: str):
    """Parse the reference's newline-separated reversed-suffix rule
    format into structured tuples (custom rule-set compatibility)."""
    out = []
    for line in ruletable.split("\n"):
        line = line.strip()
        if not line:
            continue
        match = _RULE_LINE.match(line)
        if not match:
            raise Exception("Bad rule: %r" % line)
        out.append((match.group("ending")[::-1],
                    match.group("intact") == "*",
                    int(match.group("num")),
                    match.group("append"),
                    match.group("cont") == ">"))
    return tuple(out)


class PaiceHuskStemmer:
    """Paice-Husk engine over a structured rule table; pass a string to
    use the reference's textual rule format."""

    def __init__(self, rules=RULES):
        if isinstance(rules, str):
            rules = parse_rule_text(rules)
        self.rules = _bucket(rules)

    @staticmethod
    def _first_vowel(stem: str) -> int:
        # min() over an empty list ValueErrors for vowel-less stems —
        # reference parity (paicehusk.py first_vowel)
        vp = min(p for p in (stem.find(v) for v in "aeiou") if p > -1)
        yp = stem.find("y")
        return yp if 0 < yp < vp else vp

    def stem(self, word: str) -> str:
        head = _WORD_HEAD.match(word)
        if not head:
            return word
        stem = head.group(0)
        for prefix in _PREFIXES:
            if stem.startswith(prefix):
                stem = stem[len(prefix):]
                break
        is_intact = True
        continuing = True
        while continuing:
            pfv = self._first_vowel(stem)
            bucket = self.rules.get(stem[-1])
            if not bucket:
                break
            continuing = False
            for ending, intact, num, append, cont in bucket:
                if not stem.endswith(ending):
                    continue
                if intact and not is_intact:
                    continue
                newlen = len(stem) - num + len(append)
                # vowel-initial stems keep >=2 chars, others >=3
                if newlen < (2 if pfv == 0 else 3):
                    continue
                is_intact = False
                # reference applies ``stem[:0 - num]``: -0 slices to ""
                # so remove-0 "protect" rules ERASE the stem ("mess" →
                # ''), pinned on purpose
                stem = stem[:0 - num] + append
                continuing = cont
                break
        return stem


_default = PaiceHuskStemmer()


def stem(word: str) -> str:
    """Stem with the standard Paice-Husk rule table."""
    return _default.stem(word)
