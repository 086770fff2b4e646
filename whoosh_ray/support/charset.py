"""Alias of whoosh_ray.functions.charset (reference
whoosh/support/charset.py): ``accent_map`` (generated from
unicodedata, reference-parity-tested) for CharsetFilter, and
``charset_table_to_dict`` (Sphinx charset-table parser, parity-tested
against the reference on its shipped table) for CharsetTokenizer.

``default_charset`` is the reference's vendored Sphinx table (public
Sphinx search engine data) re-emitted in canonical run-length form by
scripts/gen_default_charset.py — ``charset_table_to_dict`` of either
string yields the identical mapping (tests/test_charset.py)."""

from whoosh_ray.functions.charset import (  # noqa: F401
    accent_items,
    accent_map,
    charset_table_to_dict,
    default_charset,
)

from whoosh_ray.functions.charset import _spec_int as charspec_to_int  # noqa: E402,F401
