"""Group classes from the reference qparser/syntax.py:395-446.

The reference's syntax tree (SyntaxNode/GroupNode/WordNode...) is
internal tagger machinery; the user-visible part of this module is the
family of group classes passed as ``QueryParser(group=...)``.  They are
markers carrying ``_wr_group``, which the engine parser normalizes
(search/qparser.py:_norm_group).  ``AndNotGroup`` / ``AndMaybeGroup`` /
``RequireGroup`` / ``NotGroup`` exist for completeness but are not
meaningful as a whitespace join (binary/wrapper groups — the reference
itself only produces them from operator plugins); passing one as
``group=`` raises TypeError with guidance.
"""

from __future__ import annotations


class AndGroup:
    """Whitespace joins clauses with And (the default; syntax.py:406)."""
    _wr_group = "and"


class OrGroup:
    """Whitespace joins clauses with Or; ``factory(scale)`` adds the
    coordination bonus (syntax.py:410-422 -> Or(scale=))."""
    _wr_group = "or"

    @classmethod
    def factory(cls, scale: float = 1.0):
        class ScaledOrGroup(OrGroup):
            _wr_group = ("or", scale)
        return ScaledOrGroup


class DisMaxGroup:
    """Whitespace joins clauses with DisjunctionMax (syntax.py:424)."""
    _wr_group = "dismax"


class OrderedGroup:
    """Whitespace joins clauses with Ordered (syntax.py:428)."""
    _wr_group = "ordered"


class AndNotGroup:
    """Binary group built by the ANDNOT operator (syntax.py:432); not a
    whitespace join."""


class AndMaybeGroup:
    """Binary group built by the ANDMAYBE operator (syntax.py:436); not
    a whitespace join."""


class RequireGroup:
    """Binary group built by the REQUIRE operator (syntax.py:440); not
    a whitespace join."""


class NotGroup:
    """Wrapper group built by the NOT operator (syntax.py:444); not a
    whitespace join."""


# ---- user-authorable syntax nodes (reference syntax.py:30-230) ----
#
# The reference parser builds a full AST from these; the engine parser
# is regex-lexer-driven, so the ONLY place these nodes appear is as the
# product of a user TaggingPlugin's tagger (see
# search/qparser.py:add_plugin) — the parser calls ``node.query(self)``
# to splice the node's query into the tree.  The attribute contract
# (has_fieldname/has_text/has_boost, startchar/endchar, set_*) matches
# the reference so plugin code ports verbatim.

class SyntaxNode:
    """Base class for user plugin syntax nodes (reference
    syntax.py:30-130 contract)."""

    has_fieldname = False
    has_text = False
    has_boost = False
    startchar = None
    endchar = None

    def __repr__(self):
        r = "<"
        if self.has_fieldname:
            r += "%r:" % (self.fieldname,)
        r += self.r()
        if self.has_boost and self.boost != 1.0:
            r += " ^%s" % self.boost
        r += ">"
        return r

    def r(self):
        return "%s %r" % (type(self).__name__, self.__dict__)

    def apply(self, fn):
        return self

    def accept(self, fn):
        def fn_wrapper(n):
            return fn(n.apply(fn_wrapper))
        return fn_wrapper(self)

    def query(self, parser):
        raise NotImplementedError(type(self).__name__)

    def is_ws(self):
        return False

    def is_text(self):
        return False

    def set_fieldname(self, name, override: bool = False):
        if not self.has_fieldname:
            return
        if self.fieldname is None or override:
            self.fieldname = name
        return self

    def set_boost(self, boost):
        if not self.has_boost:
            return
        self.boost = boost
        return self

    def set_range(self, startchar, endchar):
        self.startchar = startchar
        self.endchar = endchar
        return self


class MarkerNode(SyntaxNode):
    """A node that never contributes a query (reference syntax.py:233)."""

    def query(self, parser):
        return None


class Whitespace(MarkerNode):
    """Ignorable whitespace (reference syntax.py:244)."""

    def is_ws(self):
        return True

    def r(self):
        return " "


class TextNode(SyntaxNode):
    """Base for nodes searching for text: subclasses set ``qclass`` (the
    query class the default ``query()`` builds) or override ``query()``
    (reference syntax.py:715-760 contract)."""

    has_fieldname = True
    has_text = True
    has_boost = True
    qclass = None
    tokenize = False
    removestops = False

    def __init__(self, text):
        self.fieldname = None
        self.text = text
        self.boost = 1.0

    def r(self):
        return "%s %r" % (type(self).__name__, self.text)

    def is_text(self):
        return True

    def query(self, parser):
        fieldname = self.fieldname or parser.fieldname
        termclass = self.qclass or parser.termclass
        return parser.term_query(fieldname, self.text, termclass,
                                 boost=self.boost, tokenize=self.tokenize,
                                 removestops=self.removestops)


class WordNode(TextNode):
    """Term-query node (reference syntax.py:777-785)."""

    tokenize = True
    removestops = True

    def r(self):
        return repr(self.text)
