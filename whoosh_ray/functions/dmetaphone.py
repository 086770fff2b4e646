"""Double Metaphone phonetic codes as a data-driven rule table.

Lawrence Philips's Double Metaphone algorithm (published in the
June 2000 C/C++ Users Journal) encodes a word into a primary and an
optional secondary phonetic key.  The reference engine ships a Python
translation of the public C source as a single 400-line if/elif
cascade (reference ``lang/dmetaphone.py``, used by
``analysis/morph.py:218-267`` DoubleMetaphoneFilter).

This module reimplements the algorithm as an ORDERED RULE TABLE
interpreted by a tiny condition evaluator — one `(condition, primary,
secondary, advance)` row per published rule — the same
data-over-branches design used for our porter and snowball stemmers.
Parity with the reference translation is pinned by fuzz tests
(tests/test_dmetaphone.py), INCLUDING that translation's documented
quirks, which we reproduce on purpose:

* stale-action reuse: two G+H branches can fall through without
  assigning an action, silently re-applying the PREVIOUS letter's
  output and advance (e.g. "AGHA" -> "AA", not the canonical "AK").
  Encoded below as the ``REPEAT`` sentinel.
* dead rules: ``text[pos+1:pos+2] == 'ER'`` (a 1-char slice can never
  equal a 2-char string, so only the ``-gy-`` half of that rule
  lives), and the W-rule ``text[pos-1:pos+5] in ["EWSKI", ...]``
  (a 6-char slice compared against 5-char strings — always false
  given the fixed "--"/5-space padding).  Both are omitted here with
  these notes standing in as the tombstones.
* the J-at-end rule appends a literal space to the secondary key.
"""

from __future__ import annotations

import re

_VOWELS = frozenset("AEIOUY")
_SLAVO = re.compile("W|K|CZ|WITZ")
_SILENT = re.compile("GN|KN|PN|WR|PS")

# Sentinel: re-apply the previously applied (primary, secondary,
# advance) action — the reference cascade's stale-`next` fallthrough.
REPEAT = object()


def _ev(c, t, pos, first, last, slavo):
    """Evaluate one condition tuple against the padded text.

    ``t`` is "--" + WORD + five spaces (the reference's exact padding,
    kept so negative-start slices and end-of-word probes behave
    identically); ``pos`` indexes into it; ``first``/``last`` bound
    the real word.
    """
    op = c[0]
    if op == "all":
        return all(_ev(x, t, pos, first, last, slavo) for x in c[1:])
    if op == "any":
        return any(_ev(x, t, pos, first, last, slavo) for x in c[1:])
    if op == "not":
        return not _ev(c[1], t, pos, first, last, slavo)
    if op == "at":               # single char at pos+off in charset
        return t[pos + c[1]] in c[2]
    if op == "notat":
        return t[pos + c[1]] not in c[2]
    if op == "sub":              # slice at pos+off matches an option
        opts = c[2]
        start = pos + c[1]
        return t[start:start + len(opts[0])] in opts
    if op == "head":             # word-start slice matches an option
        return t[first:first + len(c[1][0])] in c[1]
    if op == "first":
        return pos == first
    if op == "gt":               # pos > first + k
        return pos > first + c[1]
    if op == "lt":               # pos < first + k
        return pos < first + c[1]
    if op == "eq":               # pos == first + k
        return pos == first + c[1]
    if op == "atlast":           # pos + off == last
        return pos + c[1] == last
    if op == "lastsub":          # slice anchored at last+off
        opts = c[2]
        start = last + c[1]
        return t[start:start + len(opts[0])] in opts
    if op == "lastchar":
        return t[last] in c[1]
    if op == "vowel":
        return t[pos + c[1]] in _VOWELS
    if op == "notvowel":
        return t[pos + c[1]] not in _VOWELS
    if op == "slavo":
        return slavo is c[1]
    raise ValueError(f"unknown condition op {op!r}")


def _advsplit(bases, advchars):
    """Expand rules whose advance depends on the next char.

    The published rules for J/R/S/X/Z compute the output first and
    the advance (2 if the letter is doubled, else 1) separately;
    flatten each base into an (and next-is-X, adv 2) row followed by
    an (adv 1) row.
    """
    rules = []
    probe = ("at", 1, advchars)
    for cond, p, s in bases:
        c2 = probe if cond is None else ("all", cond, probe)
        rules.append((c2, p, s, 2))
        rules.append((cond, p, s, 1))
    return rules


_VOWEL_RULES = (
    # initial vowels all map to 'A'; later ones are silent
    (("first",), "A", "A", 1),
    (None, None, None, 1),
)

_ANY_VOWEL = ("A", "E", "I", "O", "U", "Y")

RULES = {
    "A": _VOWEL_RULES, "E": _VOWEL_RULES, "I": _VOWEL_RULES,
    "O": _VOWEL_RULES, "U": _VOWEL_RULES, "Y": _VOWEL_RULES,

    "B": (
        (("at", 1, "B"), "P", "P", 2),
        (None, "P", "P", 1),
    ),

    "\xc7": ((None, "S", "S", 1),),

    "C": (
        # germanic -ACH- ("bacher", "macher"; not "-achi-"/"-ache-")
        (("all", ("gt", 1), ("notvowel", -2), ("sub", -1, ("ACH",)),
          ("any", ("notat", 2, "IE"),
           ("sub", -2, ("BACHER", "MACHER")))), "K", "K", 2),
        # CAESAR
        (("all", ("first",), ("head", ("CAESAR",))), "S", "S", 2),
        # italian "chianti"
        (("sub", 0, ("CHIA",)), "K", "K", 2),
        # --- CH ---
        (("all", ("sub", 0, ("CH",)), ("gt", 0),
          ("sub", 0, ("CHAE",))), "K", "X", 2),           # "michael"
        (("all", ("sub", 0, ("CH",)), ("first",),
          ("any", ("sub", 1, ("HARAC", "HARIS")),
           ("sub", 1, ("HOR", "HYM", "HIA", "HEM"))),
          ("not", ("head", ("CHORE",)))), "K", "K", 2),
        # germanic / greek 'kh' sound
        (("all", ("sub", 0, ("CH",)),
          ("any", ("head", ("VAN ", "VON ")), ("head", ("SCH",)),
           ("sub", -2, ("ORCHES", "ARCHIT", "ORCHID")),
           ("at", 2, "TS"),
           ("all", ("any", ("at", -1, "AOUE"), ("first",)),
            ("at", 2, "LRNMBHFVW ")))), "K", "K", 1),
        (("all", ("sub", 0, ("CH",)), ("gt", 0),
          ("head", ("MC",))), "K", "K", 2),                # "McHugh"
        (("all", ("sub", 0, ("CH",)), ("gt", 0)), "X", "K", 2),
        (("sub", 0, ("CH",)), "X", "X", 2),
        # "czerny"
        (("all", ("sub", 0, ("CZ",)),
          ("not", ("sub", -2, ("WICZ",)))), "S", "X", 2),
        # "focaccia"
        (("sub", 1, ("CIA",)), "X", "X", 3),
        # --- CC (but not "McClellan") ---
        (("all", ("sub", 0, ("CC",)),
          ("not", ("all", ("eq", 1), ("head", ("M",)))),
          ("at", 2, "IEH"), ("not", ("sub", 2, ("HU",))),
          ("any", ("all", ("eq", 1), ("head", ("A",))),
           ("sub", -1, ("UCCEE", "UCCES")))), "KS", "KS", 3),
        (("all", ("sub", 0, ("CC",)),
          ("not", ("all", ("eq", 1), ("head", ("M",)))),
          ("at", 2, "IEH"),
          ("not", ("sub", 2, ("HU",)))), "X", "X", 3),     # "bacci"
        (("all", ("sub", 0, ("CC",)),
          ("not", ("all", ("eq", 1), ("head", ("M",))))), "K", "K", 2),
        (("sub", 0, ("CK", "CG", "CQ")), "K", "K", 2),
        # italian vs english soft C
        (("sub", 0, ("CIO", "CIE", "CIA")), "S", "X", 2),
        (("sub", 0, ("CI", "CE", "CY")), "S", "S", 2),
        # "mac caffrey", "mac gregor"
        (("sub", 1, (" C", " Q", " G")), "K", "K", 3),
        (("all", ("at", 1, "CKQ"),
          ("not", ("sub", 1, ("CE", "CI")))), "K", "K", 2),
        (None, "K", "K", 1),
    ),

    "D": (
        (("all", ("sub", 0, ("DG",)), ("at", 2, "IEY")), "J", "J", 3),
        (("sub", 0, ("DG",)), "TK", "TK", 2),
        (("sub", 0, ("DT", "DD")), "T", "T", 2),
        (None, "T", "T", 1),
    ),

    "F": (
        (("at", 1, "F"), "F", "F", 2),
        (None, "F", "F", 1),
    ),

    "G": (
        # --- GH ---
        (("all", ("at", 1, "H"), ("gt", 0),
          ("notvowel", -1)), "K", "K", 2),
        (("all", ("at", 1, "H"), ("lt", 3), ("first",),
          ("at", 2, "I")), "J", "J", 2),                  # "ghislane"
        (("all", ("at", 1, "H"), ("lt", 3), ("first",)), "K", "K", 2),
        # quirk: vowel+GH inside the first three letters falls
        # through the cascade — previous action re-applied
        (("all", ("at", 1, "H"), ("lt", 3)), REPEAT, REPEAT, REPEAT),
        # Parker's rule — "hugh"
        (("all", ("at", 1, "H"),
          ("any", ("all", ("gt", 1), ("at", -2, "BHD")),
           ("all", ("gt", 2), ("at", -3, "BHD")),
           ("all", ("gt", 3), ("at", -4, "BH")))), None, None, 2),
        # "laugh", "cough", "rough"
        (("all", ("at", 1, "H"), ("gt", 2), ("at", -1, "U"),
          ("at", -3, "CGLRT")), "F", "F", 2),
        (("all", ("at", 1, "H"), ("gt", 0),
          ("notat", -1, "I")), "K", "K", 2),
        # quirk: -IGH- past the head also falls through
        (("at", 1, "H"), REPEAT, REPEAT, REPEAT),
        # --- GN ---
        (("all", ("at", 1, "N"), ("eq", 1), ("head", _ANY_VOWEL),
          ("slavo", False)), "KN", "N", 2),
        (("all", ("at", 1, "N"), ("not", ("sub", 2, ("EY",))),
          ("notat", 1, "Y"), ("slavo", False)), "N", "KN", 2),
        (("at", 1, "N"), "KN", "KN", 2),
        # "tagliaro"
        (("all", ("sub", 1, ("LI",)), ("slavo", False)), "KL", "L", 2),
        # -ges-/-gep-/... at the head
        (("all", ("first",),
          ("any", ("at", 1, "Y"),
           ("sub", 1, ("ES", "EP", "EB", "EL", "EY", "IB", "IL",
                       "IN", "IE", "EI", "ER")))), "K", "J", 2),
        # -gy- (the -ger- half of the published rule is dead in the
        # reference translation; see module docstring)
        (("all", ("at", 1, "Y"),
          ("not", ("head", ("DANGER", "RANGER", "MANGER"))),
          ("notat", -1, "EI"),
          ("not", ("sub", -1, ("RGY", "OGY")))), "K", "J", 2),
        # italian "biaggi"
        (("all", ("any", ("at", 1, "EIY"),
                  ("sub", -1, ("AGGI", "OGGI"))),
          ("any", ("head", ("VON ", "VAN ")), ("head", ("SCH",)),
           ("sub", 1, ("ET",)))), "K", "K", 2),
        (("all", ("any", ("at", 1, "EIY"),
                  ("sub", -1, ("AGGI", "OGGI"))),
          ("sub", 1, ("IER ",))), "J", "J", 2),            # french
        (("any", ("at", 1, "EIY"),
          ("sub", -1, ("AGGI", "OGGI"))), "J", "K", 2),
        (("at", 1, "G"), "K", "K", 2),
        (None, "K", "K", 1),
    ),

    "H": (
        # keep only if word-initial or between vowels
        (("all", ("any", ("first",), ("vowel", -1)),
          ("vowel", 1)), "H", "H", 2),
        (None, None, None, 1),
    ),

    "J": tuple(_advsplit((
        # "jose" / "san jacinto"
        (("all", ("any", ("sub", 0, ("JOSE",)), ("head", ("SAN ",))),
          ("any", ("all", ("first",), ("at", 4, " ")),
           ("head", ("SAN ",)))), "H", "H"),
        (("any", ("sub", 0, ("JOSE",)), ("head", ("SAN ",))), "J", "H"),
        (("first",), "J", "A"),                    # Yankelovich/Jankelowicz
        (("all", ("vowel", -1), ("slavo", False),
          ("at", 1, "AO")), "J", "H"),             # spanish "bajador"
        # quirk: final J appends a literal space to the secondary
        (("atlast", 0), "J", " "),
        (("all", ("notat", 1, "LTKSNMBZ"),
          ("notat", -1, "SKL")), "J", "J"),
        (None, None, None),
    ), "J")),

    "K": (
        (("at", 1, "K"), "K", "K", 2),
        (None, "K", "K", 1),
    ),

    "L": (
        # spanish "cabrillo", "gallegos": L dropped from the secondary
        (("all", ("at", 1, "L"),
          ("any", ("all", ("atlast", 2),
                   ("sub", -1, ("ILLO", "ILLA", "ALLE"))),
           ("all", ("any", ("lastsub", -1, ("AS", "OS")),
                    ("lastchar", "AO")),
            ("sub", -1, ("ALLE",))))), "L", "", 2),
        (("at", 1, "L"), "L", "L", 2),
        (None, "L", "L", 1),
    ),

    "M": (
        (("any", ("all", ("sub", 1, ("UMB",)),
                  ("any", ("atlast", 1), ("sub", 2, ("ER",)))),
          ("at", 1, "M")), "M", "M", 2),
        (None, "M", "M", 1),
    ),

    "N": (
        (("at", 1, "N"), "N", "N", 2),
        (None, "N", "N", 1),
    ),

    "\xd1": ((None, "N", "N", 1),),

    "P": (
        (("at", 1, "H"), "F", "F", 2),
        (("at", 1, "PB"), "P", "P", 2),              # "campbell"
        (None, "P", "P", 1),
    ),

    "Q": (
        (("at", 1, "Q"), "K", "K", 2),
        (None, "K", "K", 1),
    ),

    "R": tuple(_advsplit((
        # french "rogier" (but not "hochmeier"): R dropped from primary
        (("all", ("atlast", 0), ("slavo", False), ("sub", -2, ("IE",)),
          ("not", ("sub", -4, ("ME", "MA")))), "", "R"),
        (None, "R", "R"),
    ), "R")),

    "S": (
        # "island", "isle"
        (("sub", -1, ("ISL", "YSL")), None, None, 1),
        (("all", ("first",), ("head", ("SUGAR",))), "X", "S", 1),
        # SH: germanic -heim/-hoek/-holm/-holz keep S
        (("all", ("sub", 0, ("SH",)),
          ("sub", 1, ("HEIM", "HOEK", "HOLM", "HOLZ"))), "S", "S", 2),
        (("sub", 0, ("SH",)), "X", "X", 2),
        # italian & armenian -sio-/-sia-
        (("all", ("any", ("sub", 0, ("SIO", "SIA")),
                  ("sub", 0, ("SIAN",))),
          ("slavo", False)), "S", "X", 3),
        (("any", ("sub", 0, ("SIO", "SIA")),
          ("sub", 0, ("SIAN",))), "S", "S", 3),
        # "smith" ~ "schmidt"; -sz-
        *_advsplit((
            (("any", ("all", ("first",), ("at", 1, "MNLW")),
              ("at", 1, "Z")), "S", "X"),
        ), "Z"),
        # --- SC (Schlesinger's rule) ---
        (("all", ("sub", 0, ("SC",)), ("at", 2, "H"),
          ("sub", 3, ("ER", "EN"))), "X", "SK", 3),  # "schermerhorn"
        (("all", ("sub", 0, ("SC",)), ("at", 2, "H"),
          ("sub", 3, ("OO", "UY", "ED", "EM"))), "SK", "SK", 3),
        (("all", ("sub", 0, ("SC",)), ("at", 2, "H"), ("first",),
          ("notvowel", 3), ("notat", 3, "W")), "X", "S", 3),
        (("all", ("sub", 0, ("SC",)), ("at", 2, "H")), "X", "X", 3),
        (("all", ("sub", 0, ("SC",)), ("at", 2, "IEY")), "S", "S", 3),
        (("sub", 0, ("SC",)), "SK", "SK", 3),
        # french "resnais", "artois": S dropped from primary
        (("all", ("atlast", 0), ("sub", -2, ("AI", "OI"))), "", "S", 1),
        *_advsplit(((None, "S", "S"),), "SZ"),
    ),

    "T": (
        (("sub", 0, ("TION",)), "X", "X", 3),
        (("sub", 0, ("TIA", "TCH")), "X", "X", 3),
        # "thomas", "thames", germanic TH
        (("all", ("any", ("sub", 0, ("TH",)), ("sub", 0, ("TTH",))),
          ("any", ("sub", 2, ("OM", "AM")),
           ("head", ("VON ", "VAN ")), ("head", ("SCH",)))),
         "T", "T", 2),
        (("any", ("sub", 0, ("TH",)), ("sub", 0, ("TTH",))),
         "0", "T", 2),
        (("at", 1, "TD"), "T", "T", 2),
        (None, "T", "T", 1),
    ),

    "V": (
        (("at", 1, "V"), "F", "F", 2),
        (None, "F", "F", 1),
    ),

    "W": (
        (("sub", 0, ("WR",)), "R", "R", 2),
        # "Wasserman" ~ "Vasserman"
        (("all", ("first",), ("vowel", 1)), "A", "F", 1),
        (("all", ("first",), ("sub", 0, ("WH",))), "A", "A", 1),
        # "Arnow" ~ "Arnoff" (the published -EWSKI- clause is dead in
        # the reference translation; see module docstring)
        (("any", ("all", ("atlast", 0), ("vowel", -1)),
          ("head", ("SCH",))), "", "F", 1),
        # polish "filipowicz"
        (("sub", 0, ("WICZ", "WITZ")), "TS", "FX", 4),
        (None, None, None, 1),
    ),

    "X": tuple(_advsplit((
        # french "breaux": silent final X
        (("all", ("atlast", 0),
          ("any", ("sub", -3, ("IAU", "EAU")),
           ("sub", -2, ("AU", "OU")))), None, None),
        (None, "KS", "KS"),
    ), "CX")),

    "Z": tuple(_advsplit((
        (("at", 1, "H"), "J", "J"),                # chinese "zhao"
        (("any", ("sub", 1, ("ZO", "ZI", "ZA")),
          ("all", ("slavo", True), ("gt", 0),
           ("notat", -1, "T"))), "S", "TS"),
        (None, "S", "S"),
    ), "Z")),
}

_DEFAULT_RULES = ((None, None, None, 1),)


def double_metaphone(text):
    """Return (primary, secondary_or_None) phonetic codes for text.

    Behavior-identical to the reference's translation
    (reference lang/dmetaphone.py:18-414), quirks included.
    """
    word = text.upper()
    n = len(word)
    slavo = _SLAVO.search(word) is not None
    t = "--" + word + "     "
    first = 2
    last = first + n - 1
    pos = first
    if _SILENT.match(t, pos):
        pos += 1

    pri: list = []
    sec: list = []
    prev = (None, None, 1)
    end = n + 2
    while pos < end:
        action = None
        for cond, p, s, adv in RULES.get(t[pos], _DEFAULT_RULES):
            if cond is None or _ev(cond, t, pos, first, last, slavo):
                action = prev if p is REPEAT else (p, s, adv)
                break
        if action is None:
            action = (None, None, 1)
        p, s, adv = action
        if p:
            pri.append(p)
        if s:
            sec.append(s)
        pos += adv
        prev = action

    primary = "".join(pri)
    secondary = "".join(sec)
    if primary == secondary:
        return (primary, None)
    return (primary, secondary)


def dmetaphone_filter(tokens, primary_boost=1.0, secondary_boost=0.5,
                      combine=False, cache=None):
    """DoubleMetaphoneFilter (reference analysis/morph.py:218-267):
    replace each token with its primary code (boost x primary_boost)
    and, when distinct, its secondary code (boost x secondary_boost);
    with combine=True the original token precedes the codes.
    """
    if cache is None:
        cache = {}
    for tok in tokens:
        if combine:
            yield tok.copy()
        codes = cache.get(tok.text)
        if codes is None:
            codes = cache[tok.text] = double_metaphone(tok.text)
        primary, secondary = codes
        base = tok.boost
        if primary:
            tok.text = primary
            tok.boost = base * primary_boost
            yield tok
        if secondary:
            tok = tok.copy()
            tok.text = secondary
            tok.boost = base * secondary_boost
            yield tok
