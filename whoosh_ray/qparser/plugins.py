"""Reference Plugin classes (reference qparser/plugins.py:89-1352).

The reference plugins are tagger pipelines; here they are thin markers
that ``QueryParser.add_plugin`` translates onto the engine parser's
declarative options.

Default-set plugins (Whitespace/Fields/Wildcard/Phrase/Range/Group/
Operators/Boost/Every/SingleQuote) are always on in the engine parser —
their markers are accepted no-ops so reference setup code runs
unchanged.
"""

from __future__ import annotations


# ---- plugin markers ----

class Plugin:
    """Base marker; subclasses carry ``_wr_plugin = (kind, payload)``."""
    _wr_plugin = ("noop", None)


def _noop(name, doc):
    # reference default-set plugins take config args (custom exprs);
    # the engine's are always-on markers, so arguments are accepted
    # and ignored
    def _init(self, *args, **kwargs):
        pass

    cls = type(name, (Plugin,), {"__doc__": doc, "__init__": _init})
    return cls


# Always-on in the engine parser (accepted for compat, no effect):
WhitespacePlugin = _noop("WhitespacePlugin", "default set; always on")
SingleQuotePlugin = _noop("SingleQuotePlugin", "default set; always on")
PrefixPlugin = _noop("PrefixPlugin", "wildcard 'x*' covers it; always on")
WildcardPlugin = _noop("WildcardPlugin", "default set; always on")
PhrasePlugin = _noop("PhrasePlugin", "default set; always on")
RangePlugin = _noop("RangePlugin", "default set; always on")
GroupPlugin = _noop("GroupPlugin", "default set; always on")
OperatorsPlugin = _noop("OperatorsPlugin", "default set; always on")
BoostPlugin = _noop("BoostPlugin", "default set; always on")
EveryPlugin = _noop("EveryPlugin", "default set; always on")
FieldsPlugin = _noop("FieldsPlugin", "default set; always on")


class GtLtPlugin(Plugin):
    """field:>x / >=x / <x / <=x open ranges (plugins.py:519-586)."""
    _wr_plugin = ("gtlt", None)


class PlusMinusPlugin(Plugin):
    """+required -prohibited (plugins.py:1001-1061)."""
    _wr_plugin = ("plusminus", None)


class FuzzyTermPlugin(Plugin):
    """word~ / word~n / word~n/p (plugins.py:263-322)."""
    _wr_plugin = ("fuzzy", None)


class RegexPlugin(Plugin):
    """[field:]r"pattern" (plugins.py:202-221)."""
    _wr_plugin = ("regex", None)


class SequencePlugin(Plugin):
    """Quoted bodies parse as ordered Sequences (plugins.py:748-824)."""
    _wr_plugin = ("sequence", None)


class FieldAliasPlugin(Plugin):
    """{fieldname: [aliases...]} (plugins.py:1066-1094)."""

    def __init__(self, fieldmap: dict):
        # reference maps field -> aliases; the parser wants alias -> field
        aliases = {}
        for field, als in fieldmap.items():
            if isinstance(als, str):
                als = [als]
            for a in als:
                aliases[a] = field
        self._wr_plugin = ("aliases", aliases)


class CopyFieldPlugin(Plugin):
    """{field: mirror} — a fielded term also searches the mirror
    (plugins.py:1240-1293)."""

    def __init__(self, map: dict, group=None):
        if group is not None:
            raise TypeError("custom copy-group isn't supported; the "
                            "mirror joins with Or (the reference "
                            "default)")
        self._wr_plugin = ("copyfields", dict(map))


class FunctionPlugin(Plugin):
    """#name[a,kw=v] -> fn(qs, *args, **kw) (plugins.py:560-645)."""

    def __init__(self, fns: dict):
        self._wr_plugin = ("functions", dict(fns))


class PseudoFieldPlugin(Plugin):
    """{name: fn(text) -> Query | None} (plugins.py:1293-1352)."""

    def __init__(self, xlators: dict):
        self._wr_plugin = ("pseudofields", dict(xlators))


class DateParserPlugin(Plugin):
    """English date expressions on datetime fields
    (qparser/dateparse.py:727-817).  ``fields=`` names the datetime
    columns the DSL applies to; when omitted, every 64-bit tiered
    numeric field (the shape FieldSpec.datetime builds) is selected."""

    def __init__(self, basedate=None, fields=None, free: bool = False):
        if free:
            raise TypeError("free-form date parsing (free=True) isn't "
                            "supported; use fielded date expressions")
        self._fields = fields
        self._basedate = basedate

    @property
    def _wr_plugin(self):
        return ("dateparser", (self._basedate, self._fields or ()))


class MultifieldPlugin(Plugin):
    """Use MultifieldParser(fieldnames, schema, fieldboosts) instead —
    the engine parser fans unfielded clauses out at construction time
    (plugins.py:1096-1153)."""

    def __init__(self, *a, **kw):
        raise TypeError("construct MultifieldParser(fieldnames, schema, "
                        "fieldboosts=...) instead of adding "
                        "MultifieldPlugin to an existing parser")




class TaggingPlugin(Plugin):
    """User-authorable plugin base (reference plugins.py:63-86): the
    plugin IS a tagger.  Subclasses set ``expr`` (regex string or
    compiled), ``priority``, and either ``nodetype`` (instantiated with
    the match's named groups) or an overridden ``create()``.  The
    matched node's ``query(parser)`` supplies the query —
    QueryParser.add_plugin registers the taggers on the engine lexer
    (negative priority outranks builtin syntax; >= 0 outranks only the
    plain-word fallback, mirroring the reference's priority-900 word
    tagger)."""

    priority = 0
    expr = None
    nodetype = None

    def __init__(self, expr=None):
        from whoosh_ray.util import rcompile

        self.expr = rcompile(expr or self.expr)

    def match(self, parser, text, pos):
        match = self.expr.match(text, pos)
        if match:
            node = self.create(parser, match)
            if node is not None:
                node = node.set_range(match.start(), match.end())
                return node

    def taggers(self, parser):
        return [(self, self.priority)]

    def filters(self, parser):
        return ()

    def create(self, parser, match):
        kwargs = {str(k): v for k, v in match.groupdict().items()}
        return self.nodetype(**kwargs)
