"""Plain-text segment codec (reference codec/plaintext.py
PlainTextCodec) — exact text round-trip of a segment for debugging
and archival; implementation in ``state/plaintext.py``."""

from whoosh_ray.state.plaintext import (  # noqa: F401
    dump_segment,
    parse_segment,
    write_segment,
)


class PlainTextCodec:
    """Handle bundling the dump/parse/write functions."""

    length_stats = False

    dump = staticmethod(dump_segment)
    parse = staticmethod(parse_segment)
    write = staticmethod(write_segment)
