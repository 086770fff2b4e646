"""Regenerate functions/charset_default_data.py.

The reference vendors a ~16k-char Sphinx charset table
(whoosh/support/charset.py:740, credited to the Sphinx search engine —
public data).  We do not copy that string; instead this script parses it
with our parity-tested parser and re-emits a CANONICAL table (sorted,
run-length ranges) that parses to the exact same mapping.  Run from
/root/repo:

    python scripts/gen_default_charset.py
"""

import functools
import sys
import types


def canonical_table(mapping: dict) -> str:
    """Minimal Sphinx-format table whose parse equals ``mapping``."""
    items = sorted((src, ord(dst)) for src, dst in mapping.items()
                   if dst is not None)
    entries = []
    i = 0
    while i < len(items):
        src0, dst0 = items[i]
        j = i + 1
        # extend an arithmetic run: src+k -> dst+k
        while (j < len(items) and items[j][0] == src0 + (j - i)
               and items[j][1] == dst0 + (j - i)):
            j += 1
        n = j - i
        if src0 == dst0:  # stray (identity) entries
            if n == 1:
                entries.append(f"U+{src0:04X}")
            else:
                entries.append(f"U+{src0:04X}..U+{src0 + n - 1:04X}")
        else:
            if n == 1:
                entries.append(f"U+{src0:04X}->U+{dst0:04X}")
            else:
                entries.append(f"U+{src0:04X}..U+{src0 + n - 1:04X}->"
                               f"U+{dst0:04X}..U+{dst0 + n - 1:04X}")
        i = j
    lines = []
    for k in range(0, len(entries), 6):
        lines.append(", ".join(entries[k:k + 6]))
    return "\n".join(lines)


def main():
    if "cached_property" not in sys.modules:
        m = types.ModuleType("cached_property")
        m.cached_property = functools.cached_property
        sys.modules["cached_property"] = m
    sys.path.insert(0, "/root/reference/src")
    from whoosh.support.charset import default_charset as ref_table

    from whoosh_ray.functions.charset import charset_table_to_dict

    mapping = dict(charset_table_to_dict(ref_table))
    table = canonical_table(mapping)
    # self-check: canonical table parses back to the identical mapping
    re_mapping = dict(charset_table_to_dict(table))
    assert re_mapping == mapping, "canonical table round-trip mismatch"

    out = (
        '"""Default Sphinx charset table (generated — do not edit).\n'
        "\n"
        "Produced by scripts/gen_default_charset.py: the reference's\n"
        "vendored Sphinx table (whoosh/support/charset.py:740, public\n"
        "Sphinx search engine data) parsed and re-emitted in canonical\n"
        "run-length form.  ``charset_table_to_dict(DEFAULT_CHARSET)``\n"
        "equals the reference's parse of its own table exactly\n"
        '(tests/test_charset.py)."""\n'
        "\n"
        'DEFAULT_CHARSET = """\n' + table + '\n"""\n'
    )
    path = "whoosh_ray/functions/charset_default_data.py"
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: {len(mapping)} mappings, "
          f"{len(table)} chars (reference table: {len(ref_table)} chars)")


if __name__ == "__main__":
    main()
