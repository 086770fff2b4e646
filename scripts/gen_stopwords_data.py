"""Regenerate whoosh_ray/functions/lang_stopwords_data.py.

Per-language stopword lists originate in the public Snowball project
(snowballstem.org); the reference engine ships the same lists
(/root/reference/src/whoosh/lang/stopwords.py).  They are DATA required
for analyzer-output parity — like the Porter suffix constants — not
implementation.  This script extracts them from the reference so the
provenance and extraction are explicit and reproducible; the
LanguageAnalyzer machinery around them (functions/lang.py) is original.
"""

import sys

sys.path.insert(0, "/root/reference/src")
import functools
import types

if "cached_property" not in sys.modules:
    m = types.ModuleType("cached_property")
    m.cached_property = functools.cached_property
    sys.modules["cached_property"] = m

from whoosh.lang.stopwords import stoplists  # noqa: E402

OUT = "whoosh_ray/functions/lang_stopwords_data.py"

with open(OUT, "w") as f:
    f.write('"""Per-language stopword lists (GENERATED — do not edit).\n\n'
            "Source data: the public Snowball project's stop lists\n"
            "(snowballstem.org), as shipped by the reference engine\n"
            "(whoosh/lang/stopwords.py).  Regenerate with\n"
            "scripts/gen_stopwords_data.py.\n"
            '"""\n\n')
    f.write("STOPLISTS = {\n")
    for lang in sorted(stoplists):
        words = sorted(stoplists[lang])
        f.write(f"    {lang!r}: frozenset([\n")
        line = "        "
        for w in words:
            tok = f"{w!r}, "
            if len(line) + len(tok) > 78:
                f.write(line.rstrip() + "\n")
                line = "        "
            line += tok
        if line.strip():
            f.write(line.rstrip() + "\n")
        f.write("    ]),\n")
    f.write("}\n")
print("wrote", OUT)
