"""Reference qparser/taggers.py classes (taggers.py:33-96).

These are the extension protocol plugins use to match query syntax.
USER TaggingPlugins carrying taggers like these inject into the engine
parser through ``QueryParser.add_plugin`` (search/qparser.py:_lex_tagged
tries them positionally; matched nodes contribute queries via
``node.query(parser)``).  The classes also behave exactly like the
reference when driven directly (RegexTagger matches and calls
``create``; FnTagger calls ``fn(**groupdict)``)."""

from __future__ import annotations

from whoosh_ray.util import rcompile


class Tagger:
    """Base: ``match(parser, text, pos)`` returns a node or None."""

    def match(self, parser, text, pos):
        raise NotImplementedError


class RegexTagger(Tagger):
    """Regex-driven tagger; subclasses override ``create``
    (taggers.py:51-76)."""

    def __init__(self, expr):
        self.expr = rcompile(expr)

    def match(self, parser, text, pos):
        match = self.expr.match(text, pos)
        if match:
            node = self.create(parser, match)
            if node is not None:
                node = node.set_range(match.start(), match.end())
                return node

    def create(self, parser, match):
        raise NotImplementedError


class FnTagger(RegexTagger):
    """Calls ``fn(**match.groupdict())`` on a match (taggers.py:78-96)."""

    def __init__(self, expr, fn, memo=""):
        RegexTagger.__init__(self, expr)
        self.fn = fn
        self.memo = memo

    def __repr__(self):
        return "<%s %r (%s)>" % (type(self).__name__, self.expr, self.memo)

    def create(self, parser, match):
        return self.fn(**match.groupdict())
