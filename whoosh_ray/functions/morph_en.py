"""English morphological variations (LiteMorph_en semantics).

Reference: /root/reference/src/whoosh/lang/morph_en.py — a translation
of Sun's public Minion ``LiteMorph_en``.  The linguistic DATA tables
live in :mod:`morph_en_data` (see scripts/gen_morph_data.py for
provenance); the matching implementation here is original and
deliberately bug-compatible:

- the reference packs rules into 20-rule alternation regexes and takes
  the *leftmost* match within each chunk (ties broken by rule order),
  chunks tried in order (morph_en.py:884-933).  We reproduce that
  selection by searching each rule individually per 20-rule chunk and
  picking (start position, rule index) minimal — same winner, no
  giant named-group regexes;
- ``*`` recursion results are DISCARDED (the reference calls
  ``out.union(...)`` and ignores the return value, morph_en.py:929) —
  reproduced as a no-op;
- exception hits return a LIST (split on spaces), rule hits return a
  SET, and the no-match fallthrough returns ``[word]`` — the mixed
  return types are part of the observable behavior.
"""

from __future__ import annotations

import re

from whoosh_ray.functions.morph_en_data import EXCEPTIONS, RULES

_EXDICT: dict[str, str] = {}
for _line in EXCEPTIONS:
    for _w in _line.split(" "):
        _EXDICT[_w] = _line

_CHUNK = 20
# outer group reproduces the reference's named chunk group: for rules
# with no inner capture (e.g. the albatross/kiss rule) groups[-1] falls
# back to the WHOLE rule match as the "ending" — a quirk we must keep
_COMPILED = [(re.compile("(" + p + ")$"), results) for p, results in RULES]


def variations(word: str):
    """Morphological variations of an English word (may contain
    non-words, e.g. render -> renderment)."""
    if word in _EXDICT:
        return _EXDICT[word].split(" ")

    for c0 in range(0, len(_COMPILED), _CHUNK):
        best: tuple[int, int] | None = None  # (start, rule index)
        best_m = None
        for ri in range(c0, min(c0 + _CHUNK, len(_COMPILED))):
            m = _COMPILED[ri][0].search(word)
            if m is not None:
                key = (m.start(), ri)
                if best is None or key < best:
                    best = key
                    best_m = m
        if best is None:
            continue
        ri = best[1]
        groups = [g for g in best_m.groups() if g is not None]
        ending = groups[-1] if groups else ""
        root = word[: len(word) - len(ending)] if ending else word
        out = {word}
        for result in _COMPILED[ri][1].split(","):
            if result.startswith("&"):
                out.add(root + root[-1] + result[1:])
            elif result.startswith("*"):
                # reference bug-parity: the recursion's result set is
                # discarded (set.union return value ignored)
                pass
            else:
                out.add(root + result)
        return set(out)

    return [word]
