"""Accent-folding charmaps + Sphinx charset-table parsing.

``accent_map`` reproduces, for compatibility, the published accent-
folding table from Carlos Bueno's "Accent Folding for Auto-Complete"
(A List Apart; github.com/aristus/accent-folding) that the reference
ships verbatim (/root/reference/src/whoosh/support/charset.py:23-735).
Rather than pasting the 707 entries, the table is REGENERATED from
Unicode data by layered rules, with the hand-crafted divergences pinned
explicitly (tests/test_kernels-style conformance asserts exact equality
with the reference's dict):

- R1: NFKD-decompose, strip combining marks; a single ASCII letter
  result folds to lowercase (fullwidth forms U+FF21-FF3A keep case —
  the table's quirk);
- R2: letters whose Unicode name reads "LATIN ... LETTER X WITH ..."
  (stroke/hook/tail/... — no decomposition) fold to lowercase x;
- pins: the table's irregular entries (Þ→t, ß→s, the famous Ĺ→a BUG,
  seven combining marks that fold to letters, fullwidth digits, and a
  13-entry ASCII subset) and its irregular exclusions (ſ ǅ ȿ ɦ ᵯ …).

``charset_table_to_dict`` parses the Sphinx charset-table format
(documented at sphinxsearch.com, conf-charset-table) into the mapping
``str.translate`` expects; reimplemented from the format description.
"""

from __future__ import annotations

import re
import unicodedata
from collections import defaultdict

_ASCII = frozenset("abcdefghijklmnopqrstuvwxyz")

# Block ranges the published table covers (outside them nothing folds,
# even when the rules would produce a mapping — e.g. superscripts ʰ).
_BLOCKS = (
    (0x00C0, 0x02A0),
    (0x0303, 0x0331),
    (0x1D6C, 0x1D75),
    (0x1E00, 0x1EF9),
    (0x2C60, 0x2C6C),
    (0xFF10, 0xFF5A),
)

# Irregular entries the rules cannot derive (values from the published
# table; incl. its Ĺ→a bug at 0x0139, kept ON PURPOSE for parity).
_PINS = {
    0x00DE: "t", 0x00DF: "s", 0x00F0: "d", 0x00FE: "t", 0x0131: "i",
    0x0139: "a", 0x0189: "d", 0x018E: "e", 0x018F: "e", 0x01BA: "z",
    0x01DD: "e", 0x01E2: "a", 0x01E3: "a", 0x01EE: "z", 0x01EF: "z",
    0x01FC: "a", 0x01FD: "a", 0x0237: "j", 0x0244: "u", 0x024A: "q",
    0x025A: "e", 0x025D: "e", 0x025F: "j", 0x0275: "o", 0x0284: "j",
    0x0289: "u", 0x028F: "y",
    # combining marks folded to letters (an artifact of the original
    # script keying some decomposed pairs by their combining char)
    0x0303: "p", 0x0308: "t", 0x030A: "y", 0x030C: "j", 0x0323: "l",
    0x0329: "s", 0x0331: "h",
    # fullwidth digits
    **{0xFF10 + d: str(d) for d in range(10)},
}

# In-block codepoints the published table (irregularly) leaves out.
_EXCLUDE = frozenset([
    0x017F, 0x01C5, 0x01C8, 0x01CB, 0x01F2, 0x023F, 0x0240, 0x0266,
    0x1D6F, 0x1D70, 0x1D71, 0x1D74,
])

# The table's odd ASCII subset: a handful of identity/lowercase entries.
_ASCII_PINS = {ord(c): c.lower() for c in "HIJNPSTWYinps"}

_NAME_RE = re.compile(r"LATIN (?:SMALL|CAPITAL) LETTER ([A-Z]) WITH ")


def _fold(cp: int) -> str | None:
    """Rule-derived fold of one codepoint, or None."""
    ch = chr(cp)
    nk = "".join(c for c in unicodedata.normalize("NFKD", ch)
                 if not unicodedata.combining(c))
    if len(nk) == 1 and nk.lower() in _ASCII:
        return nk if 0xFF21 <= cp <= 0xFF3A else nk.lower()
    probe = nk if len(nk) == 1 else ch
    try:
        name = unicodedata.name(probe)
    except ValueError:
        return None
    m = _NAME_RE.match(name)
    return m.group(1).lower() if m else None


def _build_accent_map() -> dict[int, str]:
    out: dict[int, str] = dict(_ASCII_PINS)
    for lo, hi in _BLOCKS:
        for cp in range(lo, hi + 1):
            if cp in _EXCLUDE:
                continue
            v = _PINS.get(cp)
            if v is None:
                v = _fold(cp)
            if v is not None:
                out[cp] = v
    return out


#: ord -> replacement str, as ``str.translate`` wants (reference:
#: support/charset.py:735)
accent_map: dict[int, str] = _build_accent_map()


# ---- Sphinx charset-table parsing (format: sphinxsearch.com,
# conf-charset-table).  Item forms, whitespace-insensitive:
#   a         -> stray char (maps to itself)
#   a..z      -> stray range (identity)
#   A->a      -> single map
#   A..Z->a..z-> range map (parallel)
# chars are literal or U+XXXX.

_CHARSPEC = r"((?:U\+[0-9A-Fa-f]+)|.)"
_ITEM_RES = [
    ("rangemap", re.compile(rf"^{_CHARSPEC}\.\.{_CHARSPEC}->"
                            rf"{_CHARSPEC}\.\.{_CHARSPEC}$")),
    ("checker", re.compile(rf"^{_CHARSPEC}\.\.{_CHARSPEC}/2$")),
    ("map", re.compile(rf"^{_CHARSPEC}->{_CHARSPEC}$")),
    ("strayrange", re.compile(rf"^{_CHARSPEC}\.\.{_CHARSPEC}$")),
    ("stray", re.compile(rf"^{_CHARSPEC}$")),
]


def _spec_int(s: str) -> int:
    if s.startswith("U+") or s.startswith("u+"):
        return int(s[2:], 16)
    if len(s) == 1:
        return ord(s)
    raise ValueError(f"bad charspec: {s!r}")


def charset_table_to_dict(tablestring: str) -> defaultdict:
    """Sphinx charset table text -> translate mapping; characters absent
    from the table map to None (token-break semantics)."""
    out: defaultdict = defaultdict(lambda: None)
    for line in tablestring.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        line = re.sub(r"\s", "", line)
        for item in line.split(","):
            if not item:
                continue
            for kind, rx in _ITEM_RES:
                m = rx.match(item)
                if not m:
                    continue
                try:
                    if kind == "rangemap":
                        a0, a1 = _spec_int(m.group(1)), _spec_int(m.group(2))
                        b0, b1 = _spec_int(m.group(3)), _spec_int(m.group(4))
                        if a1 - a0 != b1 - b0:
                            raise ValueError(f"unbalanced range: {item!r}")
                        for src, dst in zip(range(a0, a1 + 1),
                                            range(b0, b1 + 1)):
                            out[src] = chr(dst)
                    elif kind == "checker":
                        # "a..z/2" checker range: each even/odd pair maps
                        # to the pair's second char
                        a0, a1 = _spec_int(m.group(1)), _spec_int(m.group(2))
                        for cp in range(a0, a1 + 1, 2):
                            out[cp] = chr(cp + 1)
                            out[cp + 1] = chr(cp + 1)
                    elif kind == "map":
                        out[_spec_int(m.group(1))] = chr(_spec_int(m.group(2)))
                    elif kind == "strayrange":
                        for cp in range(_spec_int(m.group(1)),
                                        _spec_int(m.group(2)) + 1):
                            out[cp] = chr(cp)
                    else:
                        cp = _spec_int(m.group(1))
                        out[cp] = chr(cp)
                except ValueError:
                    pass
                break
    return out


from whoosh_ray.functions.charset_default_data import (  # noqa: E402
    DEFAULT_CHARSET as default_charset,
)


def accent_items() -> tuple:
    """``accent_map`` as a sorted hashable tuple for AnalyzerSpec fields."""
    return tuple(sorted(accent_map.items()))


class _BreakMap(dict):
    """translate map where unmapped/None chars become a break sentinel."""

    def __missing__(self, cp: int) -> str:
        return "\x00"


def compile_breakmap(charmap) -> _BreakMap:
    bm = _BreakMap()
    for cp, v in charmap.items():
        bm[cp] = v if v else "\x00"
    return bm


def charset_tokenize_row(value: str, breakmap: _BreakMap) -> list[str]:
    """CharsetTokenizer parity (tokenizers.py:187-290): translate each
    char; break on chars mapping to None/''.

    Reference QUIRK reproduced: the FINAL token (when the text does not
    end on a break char) is emitted with its ORIGINAL, untranslated text
    (tokenizers.py:283 ``value[startchar:currentchar]``)."""
    if not value:
        return []
    translated = value.translate(breakmap)
    toks = [t for t in translated.split("\x00") if t]
    if toks and translated and not translated.endswith("\x00"):
        # untranslated-final-token quirk: the original tail spans from
        # just past the last break char to the end
        i = len(value) - 1
        while i >= 0 and breakmap[ord(value[i])] != "\x00":
            i -= 1
        toks[-1] = value[i + 1:]
    return toks
