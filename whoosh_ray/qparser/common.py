"""Reference qparser/common.py names (common.py:36-67)."""

from __future__ import annotations

import sys

from whoosh_ray.util import rcompile  # noqa: F401


class QueryParserError(Exception):
    """Raised by reference parsers on malformed input
    (common.py:36-40).  This engine's parser is lenient (every string
    parses to SOME query, like the reference's default plugins), so the
    class exists for ported except-clauses."""

    def __init__(self, cause, msg=None):
        super().__init__(str(cause))
        self.cause = cause


def get_single_text(field, text, **kwargs):
    """First token of a field's query-mode analysis (common.py:42-47).
    ``field`` is a FieldSpec here; falls back to the raw text when the
    analysis drops everything."""
    from whoosh_ray.functions.analysis import VectorAnalyzer

    spec = getattr(field, "analyzer", None)
    if spec is None:
        return text
    import dataclasses as _dc

    if getattr(spec, "mode", None) != "query":
        spec = _dc.replace(spec, mode="query")
    tb = VectorAnalyzer(spec)([text])
    return str(tb.terms[0]) if len(tb.terms) else None


def attach(q, stxnode):
    """Copy the syntax node's char range onto a query (common.py:50-58)."""
    if q:
        try:
            q.startchar = stxnode.startchar
            q.endchar = stxnode.endchar
        except AttributeError:
            raise AttributeError("Can't set attribute on %s"
                                 % q.__class__.__name__)
    return q


def print_debug(level, msg, out=sys.stderr):
    if level:
        out.write("%s%s\n" % (" " * (level - 1), msg))
