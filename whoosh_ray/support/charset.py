"""Alias of whoosh_ray.functions.charset (reference
whoosh/support/charset.py): ``accent_map`` (generated from
unicodedata, reference-parity-tested) for CharsetFilter, and
``charset_table_to_dict`` (Sphinx charset-table parser, parity-tested
against the reference on its shipped table) for CharsetTokenizer.

The reference's ``default_charset`` constant is a ~16k-char data table
lifted from the Sphinx search engine; it is intentionally not vendored
here — pass your own table string (the parser accepts the same format),
or use ``accent_items()`` for the common accent-folding case."""

from whoosh_ray.functions.charset import (  # noqa: F401
    accent_items,
    accent_map,
    charset_table_to_dict,
)

from whoosh_ray.functions.charset import _spec_int as charspec_to_int  # noqa: E402,F401
