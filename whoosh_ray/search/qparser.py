"""Query-string parser — the reference QueryParser's default-plugin subset.

Reference: /root/reference/src/whoosh/qparser/default.py:38-165 with the
default plugin set (default.py:89-105): Whitespace, Fields ("field:"),
Wildcard (*/?), Phrase ("..." with optional ~slop), Range ([a TO b] /
{a TO b}), Group (parentheses), Operators (AND / OR / NOT / ANDNOT /
ANDMAYBE / REQUIRE, uppercase only), Boost (^n), Every (field:* / *).

Semantics reproduced:

- bare whitespace-separated terms join with the default group (And, as
  the reference's ``QueryParser(..., group=AndGroup)`` default);
- term text runs through the FIELD'S analyzer (fields.py:144-165 via
  parser), so stopwords/short tokens vanish and a term that analyzes to
  multiple tokens becomes a Phrase-like And;
- quoted phrases analyze each word and build Phrase(field, words, slop).

This is driver-side pure Python — parsing is never on the hot path.
"""

from __future__ import annotations

import re

from whoosh_ray.functions.analysis import VectorAnalyzer
from whoosh_ray.search.query import (
    And,
    AndMaybe,
    AndNot,
    Every,
    Not,
    Or,
    Phrase,
    Prefix,
    Query,
    Require,
    Term,
    TermRange,
    Wildcard,
    _NullQuery,
)
from whoosh_ray.state.schema import IndexSchema

_TOKEN_RE = re.compile(r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<fncall>\#[A-Za-z_][A-Za-z0-9._]*\[[^\]]*\](?:\^\d+(?:\.\d+)?)?) |
    (?P<rgx>(?:\w+:)?r"(?P<rbody>[^"]*)") |
    (?P<quoted>(?:(?P<qfield>\w+):)?"(?P<qbody>[^"]*)"(~(?P<slop>\d+))?) |
    (?P<fieldsq>\w+:'[^']*') |
    (?P<range>(?:(?P<rfield>\w+):)?[\[{][^\]}]*?[Tt][Oo][^\]}]*[\]}]) |
    (?P<word>[^\s()"]+)
""", re.VERBOSE)

# the published range-body grammar (reference RangePlugin.expr,
# plugins.py:829-843): optional single-quoted or until-TO start,
# case-insensitive TO, optional single-quoted or lazy end
_RANGE_BODY = re.compile(r"""
    ^(?P<start>('[^']*?'\s+)|([^\]}]+?(?=[Tt][Oo])))?
    [Tt][Oo]
    (?P<end>(\s+'[^']*?')|([^\]}]+?))?$
""", re.VERBOSE)

_OPS = {"AND", "OR", "NOT", "ANDNOT", "ANDMAYBE", "REQUIRE"}


def _norm_group(group):
    """Normalize a ``group=`` argument: None/"and" -> ("and", None);
    "or" / ("or", scale) -> or-group; also accepts the compat module's
    AndGroup/OrGroup markers (anything with a ``_wr_group`` attr)."""
    g = getattr(group, "_wr_group", group)
    if g is None or g == "and":
        return "and", None
    if g in ("or", "dismax", "ordered"):
        return g, None
    if (isinstance(g, tuple) and len(g) == 2 and g[0] == "or"):
        return "or", g[1]
    raise TypeError(f"unsupported group {group!r}; use 'and', 'or', "
                    f"('or', scale), 'dismax' or 'ordered'")


class SpannedStr(str):
    """Lexed token text carrying its (startchar, endchar) in the
    original query string — feeds Term.startchar/endchar so
    Correction.format_string can splice corrected words back into the
    user's string (the reference parser's node char positions,
    qparser/syntax.py node r/startchar plumbing)."""

    span: tuple[int, int] | None = None

    @classmethod
    def make(cls, s, start: int, end: int) -> "SpannedStr":
        v = cls(s)
        v.span = (start, end)
        return v


def _subspan(val, start: int, stop: int):
    """Slice ``val`` keeping an adjusted span when it carries one."""
    s = str(val)[start:stop]
    sp = getattr(val, "span", None)
    if sp is None:
        return s
    return SpannedStr.make(s, sp[0] + start, sp[0] + stop)


class QueryParser:
    """``plugins`` enables the optional reference plugins
    (qparser/plugins.py:89-1293 subset):

    - "gtlt": ``field:>x  >=x  <x  <=x`` open-ended ranges
      (GtLtPlugin, plugins.py:519-586);
    - "plusminus": ``+required -prohibited`` with bare terms grouped by
      the parser's group (optional-Or under ``group="or"``)
      (PlusMinusPlugin, plugins.py:589-643; builds the reference's
      BooleanQuery shape AndNot(AndMaybe(And(req), Or(should)),
      Or(proh)));
    - "fuzzy": ``word~  word~n  word~n/p`` FuzzyTerm syntax
      (FuzzyTermPlugin, plugins.py:263-322);
    - "regex": ``[field:]r"pattern"`` Regex queries (RegexPlugin,
      plugins.py:202-221);
    - "sequence": quoted bodies parse as ordered Sequence queries with
      embedded sub-queries (SequencePlugin, plugins.py:748-824; its
      boost-drop quirk kept — see ``_make_sequence``);
    - ``aliases``: {alias: fieldname} (FieldAliasPlugin,
      plugins.py:1066-1094);
    - ``copyfields``: {field: mirror_field} — a fielded term also
      searches the mirror, joined by Or (CopyFieldPlugin,
      plugins.py:1240-1293);
    - ``functions``: {name: fn} — ``#name[a,b,kw=v]`` calls
      fn(qs, *args, **kwargs) -> Query (FunctionPlugin,
      plugins.py:560-645);
    - ``pseudofields``: {name: fn} — ``name:text`` runs fn(text) ->
      Query | None (PseudoFieldPlugin, plugins.py:1293-1352).
    """

    def __init__(self, default_field: str, schema: IndexSchema,
                 plugins: tuple[str, ...] = (),
                 aliases: dict[str, str] | None = None,
                 copyfields: dict[str, str] | None = None,
                 datefields: tuple[str, ...] = (),
                 basedate=None,
                 functions: dict | None = None,
                 pseudofields: dict | None = None,
                 group=None):
        self.default_field = default_field
        self.schema = schema
        self.plugins = frozenset(plugins)
        # reference QueryParser(group=AndGroup) default (default.py:78):
        # the group joins whitespace-separated clauses AND a single word
        # analyzing to several tokens; "or" takes an optional Or(scale=)
        # coordination bonus (OrGroup.factory, syntax.py:413-422).
        # Accepts "and" / "or" / ("or", scale) / None.
        self.group, self.group_scale = _norm_group(group)
        self.aliases = dict(aliases or {})
        self.copyfields = dict(copyfields or {})
        # FunctionPlugin (plugins.py:560-645): ``#name[a,b,kw=v]`` calls
        # fn(args..., kwargs...) -> Query; a trailing ^n passes
        # boost= as a kwarg exactly like the reference FunctionNode
        self.functions = dict(functions or {})
        # PseudoFieldPlugin (plugins.py:1293-1352): ``name:text`` runs
        # fn(text) -> Query | None (None -> Null) — the engine's
        # node-free equivalent of the reference's syntax-node transform
        self.pseudofields = dict(pseudofields or {})
        # DateParserPlugin analogue (qparser/dateparse.py:727-817):
        # fielded terms on these (stored datetime) columns parse through
        # the English date DSL subset (search/dateparse.py) into
        # inclusive DateRange queries
        self.datefields = frozenset(datefields)
        self.basedate = basedate
        # user TaggingPlugins (reference qparser/plugins.py:33-86
        # protocol): [(priority, tagger, owner_plugin)] — see add_plugin
        self.custom_taggers: list = []
        import dataclasses as _dc

        # boolean/ngram fields analyze query strings in query mode
        # (_obj_to_bool's bool(x) fallback; ngram tokenizers emit only
        # min(max, len)-sized grams at query time).  schema=None is the
        # reference's schema-less mode (default.py:203-247 fallback +
        # do_fieldnames' `if parser.schema` guard): every field prefix
        # is accepted verbatim and term text passes through UNanalyzed.
        self._analyzers = {} if schema is None else {
            f.name: VectorAnalyzer(
                _dc.replace(f.analyzer, mode="query")
                if f.analyzer.boolean or f.analyzer.ngram is not None
                else f.analyzer)
            for f in schema.fields}

    def _known_field(self, name: str) -> bool:
        """Whether a ``name:`` prefix binds as a field: aliases and
        datefields always; any name with no schema (reference
        do_fieldnames only strips unknown fields `if parser.schema`,
        plugins.py:399-415); else schema membership."""
        if name in self.aliases or name in self.datefields:
            return True
        if self.schema is None:
            return True
        return any(f.name == name for f in self.schema.fields)

    def add_plugin(self, pin) -> "QueryParser":
        """Enable a plugin on an existing parser (reference
        QueryParser.add_plugin, default.py:119-123).  Accepts a flag
        name ("gtlt"/"plusminus"/"fuzzy"/"regex"/"sequence"), or a
        marker object from whoosh_ray.qparser carrying a
        ``_wr_plugin = (kind, payload)`` attribute."""
        if isinstance(pin, type):
            pin = pin()
        spec = getattr(pin, "_wr_plugin", None)
        if spec is None and isinstance(pin, str):
            spec = (pin, None)
        if callable(getattr(pin, "taggers", None)):
            # a USER TaggingPlugin (reference qparser/plugins.py:33-86):
            # taggers() returns (Tagger, priority) pairs whose matched
            # nodes contribute queries via node.query(parser).  Node-
            # list filters are the reference AST's transform pass — the
            # engine parser has no node list, so plugins that need one
            # are rejected up front rather than silently half-applied.
            filters = (pin.filters(self)
                       if callable(getattr(pin, "filters", None)) else ())
            if filters:
                raise TypeError(
                    f"{type(pin).__name__}.filters() is not supported: "
                    "the engine parser has no syntax-node list to "
                    "filter — express the transform in the node's "
                    "query() method instead")
            for tagger, priority in pin.taggers(self):
                self.custom_taggers.append((priority, tagger, pin))
            self.custom_taggers.sort(key=lambda t: t[0])
            return self
        if spec is None:
            raise TypeError(f"not a recognized plugin: {pin!r}")
        kind, payload = spec
        if kind == "noop":
            pass  # a default-set plugin (always on)
        elif kind in ("gtlt", "plusminus", "fuzzy", "regex", "sequence"):
            self.plugins = self.plugins | {kind}
        elif kind == "aliases":
            self.aliases.update(payload)
        elif kind == "copyfields":
            self.copyfields.update(payload)
        elif kind == "functions":
            self.functions.update(payload)
        elif kind == "pseudofields":
            self.pseudofields.update(payload)
        elif kind == "dateparser":
            basedate, fieldnames = payload
            if basedate is not None:
                self.basedate = basedate
            if not fieldnames:
                # auto-select datetime-shaped fields: 64-bit tiered
                # numeric (what FieldSpec.datetime builds)
                fieldnames = tuple(
                    f.name for f in self.schema.fields
                    if f.kind == "numeric" and f.analyzer.numeric
                    and f.analyzer.numeric[0] == 64)
            self.datefields = self.datefields | frozenset(fieldnames)
        else:
            raise TypeError(f"unknown plugin kind {kind!r}")
        return self

    def remove_plugin(self, pin) -> "QueryParser":
        """Disable a previously-enabled optional plugin (reference
        remove_plugin_class, default.py:133-140)."""
        if isinstance(pin, type):
            pin = pin()
        spec = getattr(pin, "_wr_plugin", None)
        if spec is None and isinstance(pin, str):
            spec = (pin, None)
        if callable(getattr(pin, "taggers", None)):
            # remove a user TaggingPlugin: by the registered instance,
            # or by class (reference remove_plugin_class semantics)
            cls = pin if isinstance(pin, type) else type(pin)
            self.custom_taggers = [
                (p, t, o) for p, t, o in self.custom_taggers
                if o is not pin and type(o) is not cls]
            return self
        if spec is None:
            raise TypeError(f"not a recognized plugin: {pin!r}")
        kind, payload = spec
        if kind in ("gtlt", "plusminus", "fuzzy", "regex", "sequence"):
            self.plugins = self.plugins - {kind}
        elif kind == "aliases":
            for k in (payload or dict(self.aliases)):
                self.aliases.pop(k, None)
        elif kind == "copyfields":
            for k in (payload or dict(self.copyfields)):
                self.copyfields.pop(k, None)
        elif kind == "functions":
            for k in (payload or dict(self.functions)):
                self.functions.pop(k, None)
        elif kind == "pseudofields":
            for k in (payload or dict(self.pseudofields)):
                self.pseudofields.pop(k, None)
        elif kind == "dateparser":
            self.datefields = frozenset()
        elif kind != "noop":
            raise TypeError(f"unknown plugin kind {kind!r}")
        return self

    remove_plugin_class = remove_plugin

    def add_plugins(self, pins) -> "QueryParser":
        """Add several plugins (reference default.py:107-113)."""
        for pin in pins:
            self.add_plugin(pin)
        return self

    def replace_plugin(self, pin) -> "QueryParser":
        """Remove the given plugin's prior configuration, then add it
        (reference default.py:140-151 remove-class-then-add).  The
        instance itself names what to remove — marker payloads (alias /
        copyfield / function maps) are keyed, so removing via the
        instance clears exactly the keys it re-adds."""
        if isinstance(pin, type):
            pin = pin()
        self.remove_plugin(pin)
        return self.add_plugin(pin)

    def default_set(self) -> list:
        """The default plugin set as marker instances (reference
        default.py:89-105) — these are always on in the engine parser;
        the list exists so reference-style setup code can iterate it."""
        from whoosh_ray.qparser import plugins as _p

        return [_p.WhitespacePlugin(), _p.SingleQuotePlugin(),
                _p.FieldsPlugin(), _p.WildcardPlugin(),
                _p.PhrasePlugin(), _p.RangePlugin(), _p.GroupPlugin(),
                _p.OperatorsPlugin(), _p.BoostPlugin(), _p.EveryPlugin()]

    def multitoken_query(self, spec: str, texts, fieldname, termclass,
                         boost: float = 1.0):
        """Join several analyzed tokens per the field's multitoken
        policy (reference default.py:180-201): "and"/"or" join with
        that compound, "phrase" builds a Phrase, "default" uses the
        parser's group."""
        from whoosh_ray.search.query import Phrase

        spec = spec.lower()

        def one(w):
            q = termclass(fieldname, w)
            return _with_boost(q, boost) if boost != 1.0 else q

        if spec == "phrase":
            q = Phrase(fieldname, list(texts))
            return _with_boost(q, boost) if boost != 1.0 else q
        if spec == "and":
            return And([one(w) for w in texts])
        if spec == "or":
            return Or([one(w) for w in texts])
        return self._group_join([one(w) for w in texts])

    # ---- reference parser attributes user plugin nodes read ----

    @property
    def fieldname(self):
        """The default field under the reference's attribute name
        (default.py QueryParser.fieldname) — TextNode.query reads it."""
        return self.default_field

    @property
    def termclass(self):
        """Default term query class (default.py QueryParser.termclass)."""
        from whoosh_ray.search.query import Term

        return Term

    def term_query(self, fieldname, text, termclass, boost: float = 1.0,
                   tokenize: bool = True, removestops: bool = True):
        """Build the query for one term (reference default.py:203-247):
        analyze ``text`` in ``fieldname`` and construct ``termclass``;
        several tokens join with the parser's group, each carrying the
        boost (the engine's multi-token-word rule — equivalent to the
        reference's group boost after normalize-flatten); no tokens is
        Null.  An unknown field passes the raw text through."""
        from whoosh_ray.search.query import Term

        if fieldname in self._analyzers and tokenize:
            words = self._analyzers[fieldname].token_lists([str(text)])[0]
            if not words:
                return _NullQuery()

            def one(w):
                q = termclass(fieldname, w)
                return _with_boost(q, boost) if boost != 1.0 else q

            if len(words) == 1:
                return one(words[0])
            return self._group_join([one(w) for w in words])
        q = termclass(fieldname, str(text))
        return _with_boost(q, boost) if boost != 1.0 else q

    # ---- lexing ----

    def _lex(self, text: str):
        if self.custom_taggers:
            yield from self._lex_tagged(text)
            return
        prev_end = -1
        for m in _TOKEN_RE.finditer(text):
            yield from self._classify(m, text, prev_end)
            prev_end = m.end()

    def _lex_tagged(self, text: str):
        """Position-driven lexer variant used when user TaggingPlugins
        are registered (reference parser core semantics, default.py
        tag() loop: at each non-space position taggers are tried in
        priority order, the word tagger — priority 900 — last).  Our
        builtin syntax is one master regex, so the interleave is:
        negative-priority taggers fire BEFORE any builtin token;
        priority >= 0 taggers fire before a builtin that would be a
        plain word but after builtin special syntax (phrases, ranges,
        parens — all of which the reference tags at priority <= 0)."""
        pos, prev_end = 0, -1
        neg = [(p, t) for p, t, _o in self.custom_taggers if p < 0]
        nonneg = [(p, t) for p, t, _o in self.custom_taggers if p >= 0]

        def try_taggers(taggers, at):
            for _p, tagger in taggers:
                node = tagger.match(self, text, at)
                if (node is not None
                        and getattr(node, "endchar", None) is not None
                        and node.endchar > at):
                    return node
            return None

        while pos < len(text):
            if text[pos].isspace():
                pos += 1
                continue
            node = try_taggers(neg, pos)
            if node is None:
                m = _TOKEN_RE.match(text, pos)
                if m is not None and m.group("word") is not None:
                    # builtin would make a plain word here: >=0 taggers
                    # outrank the reference's priority-900 word tagger
                    node = try_taggers(nonneg, pos)
                if node is None:
                    if m is None or m.end() == pos:
                        node = try_taggers(nonneg, pos)
                        if node is None:
                            pos += 1
                            continue
                    else:
                        yield from self._classify(m, text, prev_end)
                        prev_end = pos = m.end()
                        continue
            if getattr(node, "is_ws", lambda: False)():
                prev_end = pos = node.endchar
                continue
            yield ("foreign", node)
            prev_end = pos = node.endchar

    def _classify(self, m, text: str, prev_end: int):
            # a "^n" word acts as a BOOST only when directly attached
            # to the previous token (the reference BoostPlugin tagger
            # requires (?<=\S); 'retry ^2' leaves '^2' a plain word
            # whose analysis is the term '2' — stopped when too short)
            detached = m.start() > prev_end
            if m.group("lparen"):
                yield ("(", None)
            elif m.group("rparen"):
                yield (")", None)
            elif m.group("fncall") is not None:
                if self.functions:
                    yield ("word", m.group("fncall"))
                else:
                    # inactive: the old per-whitespace word lexing
                    for w in m.group("fncall").split():
                        yield ("word", w)
            elif m.group("rgx") is not None:
                if "regex" in self.plugins:
                    yield ("regex", m.group("rgx"))
                else:
                    # without the plugin the old lexing applies: the
                    # r-prefix is a word, the quotes a phrase
                    head = m.group("rgx")[: -len(m.group("rbody")) - 2]
                    yield ("word", head)
                    yield ("phrase", (None, m.group("rbody"), 1))
            elif m.group("quoted") is not None:
                body = SpannedStr.make(m.group("qbody"), *m.span("qbody"))
                yield ("phrase", (m.group("qfield"), body,
                                  int(m.group("slop") or 1)))
            elif m.group("fieldsq") is not None:
                yield ("word", m.group("fieldsq"))
            elif m.group("range"):
                rf = m.group("rfield")
                raw = m.group("range")
                yield ("range", (rf, raw[len(rf) + 1:] if rf else raw))
            else:
                val = m.group("word")
                if val in _OPS and not self._op_context_ok(text, m):
                    # reference operator taggers demand surrounding
                    # whitespace ((?<=\s)OP(?=\s), plugins.py:925-930) —
                    # elsewhere the word is a plain term ("ANDNOT deploy"
                    # = And([andnot, deploy]))
                    yield ("wordlit", SpannedStr.make(val, *m.span("word")))
                elif (re.search(r"\^[0-9]*(\.[0-9]+)?$", val)
                      and m.end() < len(text)
                      and text[m.end()] not in " \t\r\n)"):
                    # a trailing ^num NOT followed by the boost
                    # terminator class ($ / whitespace / ')') is no
                    # boost at all (the tagger expr, plugins.py:229) —
                    # 'deploy^2"..."' keeps the plain word 'deploy^2'
                    yield ("wordnb", SpannedStr.make(val, *m.span("word")))
                elif (detached and re.fullmatch(r"\^[0-9]*(\.[0-9]+)?", val)
                      and len(val) > 1):
                    # space-detached "^n" boost token: the reference's
                    # clean_boost (plugins.py:256-267) kills it at the
                    # TOP level (previous node is whitespace) but does
                    # NOT recurse into groups, where do_boost (:269-287,
                    # post-ws-removal) applies it to the previous node —
                    # nesting decides, so tag it for _collect_items
                    yield ("boostw", SpannedStr.make(val, *m.span("word")))
                else:
                    yield ("word", SpannedStr.make(val, *m.span("word")))

    @staticmethod
    def _op_context_ok(text: str, m) -> bool:
        s, e = m.span("word")
        op = m.group("word")
        if not (e < len(text) and text[e].isspace()):
            return False
        if op == "NOT":
            return s == 0 or text[s - 1].isspace() or text[s - 1] in "()"
        if op == "REQUIRE":
            return s == 0 or text[s - 1].isspace()
        return s > 0 and text[s - 1].isspace()

    # ---- parsing ----

    def parse(self, text: str) -> Query:
        tokens = list(self._lex(text))
        tokens = self._drop_unpaired_parens(tokens)
        # a query that is ENTIRELY one paren group unwraps ONE layer
        # before filtering (the reference's top group), so
        # '(render ^2)' behaves like 'render ^2' (top-level detached
        # boost dies) while '((render ^2))' keeps a nested group where
        # the boost survives clean_boost's non-recursion
        if (len(tokens) >= 2 and tokens[0][0] == "("
                and tokens[-1][0] == ")"
                and self._is_whole_group(tokens)):
            tokens = tokens[1:-1]
        if "plusminus" in self.plugins:
            tokens = list(self._split_pm_markers(tokens))
        q, _ = self._parse_group(tokens, 0)
        if q is None:
            return _NullQuery()
        # the reference parses with normalize=True by default
        # (qparser/default.py parse): flatten/dedup/range-merge happen
        # at PARSE time, never inside search()
        return q.normalize()

    @staticmethod
    def _drop_unpaired_parens(tokens):
        """The reference's group machinery PAIRS parens; an unmatched
        '(' or ')' simply vanishes from the flat node list, so
        'a ( b OP c' parses exactly like 'a b OP c' (ops bind across
        the phantom boundary) — probed on 'cluster ( deploy render',
        '^2.5( ANDNOT ( cluster render' and friends."""
        stack = []
        drop = set()
        for idx, (kind, _val) in enumerate(tokens):
            if kind == "(":
                stack.append(idx)
            elif kind == ")":
                if stack:
                    stack.pop()
                else:
                    drop.add(idx)
        drop.update(stack)
        if not drop:
            return tokens
        return [t for i, t in enumerate(tokens) if i not in drop]

    @staticmethod
    def _is_whole_group(tokens) -> bool:
        depth = 0
        for i, (kind, _v) in enumerate(tokens):
            if kind == "(":
                depth += 1
            elif kind == ")":
                depth -= 1
                if depth == 0 and i != len(tokens) - 1:
                    return False
        return depth == 0

    @staticmethod
    def _split_pm_markers(tokens):
        """PlusMinusPlugin lexing (plugins.py:1017-1023): the +/-
        taggers match ANYWHERE — a word token splits at every +/- into
        subwords and marker tokens, and a marker tags the NEXT query
        item across whitespace ('deploy - render' bans render;
        'deploy-render' with the plugin on means deploy ANDNOT
        render).  Split FRAGMENTS are never operators (the reference
        op taggers demand surrounding whitespace, so 'bash+AND' yields
        the plain term 'and')."""
        for kind, val in tokens:
            if kind not in ("word", "wordlit", "wordnb") or val in _OPS \
                    or not ("+" in val or "-" in val):
                yield (kind, val)
                continue
            def _frag_kind(frag, final):
                # a NON-final fragment's terminator was the +/- the
                # split consumed, so the reference's op and boost
                # taggers (which demand whitespace / a ")" / end there)
                # never fire on it: "wordnb" = plain word, no trailing
                # ^boost, never an operator.  The FINAL fragment keeps
                # the original word's terminator and semantics.
                if not final or kind == "wordnb":
                    return "wordnb"
                if kind == "wordlit" or str(frag) in _OPS \
                        or str(frag).startswith("^"):
                    return "wordlit"
                return "word"

            pos = 0
            s = str(val)
            for j, ch in enumerate(s):
                if ch in "+-":
                    if j > pos:
                        frag = _subspan(val, pos, j)
                        yield (_frag_kind(frag, final=False), frag)
                    yield ("pm", ch)
                    pos = j + 1
            if pos < len(s):
                frag = _subspan(val, pos, len(s))
                yield (_frag_kind(frag, final=True), frag)

    def _parse_group(self, tokens, i, nested: bool = False):
        items, i = self._collect_items(tokens, i, nested)
        return self._combine(items), i

    def _collect_items(self, tokens, i, nested: bool = False):
        items: list = []  # queries, op markers, plusminus markers
        while i < len(tokens):
            kind, val = tokens[i]
            if kind == ")":
                i += 1
                if nested:
                    break
                # unmatched close paren at the top level is DROPPED
                # (the reference's group machinery ignores it; our old
                # break silently truncated the rest of the query)
                continue
            if kind == "pm":
                items.append(("pm", val))
                i += 1
                continue
            if kind == "boostw":
                # space-detached boost: applies to the previous node
                # only INSIDE a nested group (reference do_boost after
                # ws removal); at the top level it degrades to a word
                i += 1
                if nested and items and isinstance(items[-1], Query) \
                        and not isinstance(items[-1], _NullQuery):
                    items[-1] = _with_boost(items[-1],
                                            float(str(val)[1:]))
                else:
                    q = self._leaf("wordlit", val)
                    if q is not None:
                        items.append(q)
                continue
            if kind == "(":
                sub, i = self._parse_group(tokens, i + 1, nested=True)
                items.append(sub if sub is not None else _NullQuery())
                items, i = self._maybe_boost(items, tokens, i)
                continue
            if kind == "word" and val in _OPS:
                items.append(("op", val))
                i += 1
                continue
            if kind == "foreign":
                # a trailing ^n lands on the NODE (reference do_boost
                # calls set_boost on the previous syntax node; whether
                # the query carries it is the node's query() business —
                # a custom query() that ignores self.boost drops it,
                # exactly like the reference)
                i += 1
                if (i < len(tokens) and tokens[i][0] == "word"
                        and tokens[i][1].startswith("^")):
                    try:
                        val.set_boost(float(tokens[i][1][1:]))
                        i += 1
                    except ValueError:
                        pass
                q = self._leaf(kind, val)
                if q is not None:
                    items.append(q)
                continue
            q = self._leaf(kind, val)
            i += 1
            if q is not None:
                items.append(q)
                items, i = self._maybe_boost(items, tokens, i)
            elif (items and isinstance(items[-1], tuple)
                  and items[-1][0] == "pm"):
                # a marker CONSUMES a stopped word as a Null node — the
                # reference required bucket holds the (stopped) word
                # node, so '+the deploy' nulls the whole query instead
                # of promoting deploy to required
                items.append(_NullQuery())
        return items, i

    def _maybe_boost(self, items, tokens, i):
        from whoosh_ray.search.query import Sequence as _Seq

        # Boost plugin: trailing ^n token attached to the previous item
        # — EXCEPT on a sequence group, where the reference drops the
        # boost ('"a b"^2' parses with boost 1.0; SequencePlugin quirk)
        if ("sequence" in self.plugins and items
                and isinstance(items[-1], _Seq)
                and i < len(tokens) and tokens[i][0] == "word"
                and tokens[i][1].startswith("^")):
            return items, i + 1
        if (i < len(tokens) and tokens[i][0] == "word"
                and tokens[i][1].startswith("^") and items
                and not isinstance(items[-1], tuple)):
            try:
                boost = float(tokens[i][1][1:])
            except ValueError:
                return items, i
            items[-1] = _with_boost(items[-1], boost)
            i += 1
        return items, i

    def _combine(self, items) -> Query | None:
        if "plusminus" in self.plugins and any(
                isinstance(it, tuple) and it[0] == "pm" for it in items):
            # do_plusminus (plugins.py:1028-1061): route EVERY node —
            # queries, stopped-word Nulls, even op markers — into
            # required/optional/banned (a marker's target consumes the
            # NEXT node of any kind, then resets to optional); operator
            # binding then runs INSIDE each bucket (do_operators is a
            # later filter pass over the re-grouped tree).
            required, should, banned = [], [], []
            target = should
            for it in items:
                if isinstance(it, tuple) and it[0] == "pm":
                    target = required if it[1] == "+" else banned
                    continue
                target.append(it)
                target = should
            req_q = self._op_passes(required)
            sh_q = [q for q in self._op_passes(should)
                    if not isinstance(q, _NullQuery)]
            ban_q = self._op_passes(banned)
            if required and not req_q:
                # a required bucket that DISSOLVES (it held only op
                # words, e.g. '+ OR') nulls the whole query — the
                # reference's AndMaybe keeps the empty required side
                # and normalizes to Null (probed: 'error + OR' -> Null)
                return None

            # BooleanQuery shape (compound.py:656-658), normalized like
            # the reference: drop empty branches.  The "optional" nodes
            # take the PARSER'S group (an AndGroup parser makes bare
            # terms required-by-default, plugins.py:1037-1039); banned
            # is always an OrGroup (:1035).
            def one_or(qs):
                return qs[0] if len(qs) == 1 else Or(qs)

            def one_and(qs):
                return qs[0] if len(qs) == 1 else And(qs)

            def one_group(qs):
                return qs[0] if len(qs) == 1 else self._group_join(qs)

            if req_q and sh_q:
                base = AndMaybe(one_and(req_q), one_group(sh_q))
            elif req_q:
                base = one_and(req_q)
            elif sh_q:
                base = one_group(sh_q)
            else:
                base = None
            if ban_q and base is not None:
                base = AndNot(base, one_or(ban_q))
            return base
        qs = self._op_passes(items)
        if not qs:
            return None
        return qs[0] if len(qs) == 1 else self._group_join(qs)

    def _group_join(self, qs: list) -> Query:
        if self.group == "or":
            return Or(qs, scale=self.group_scale)
        if self.group == "dismax":
            # reference syntax.py:424 DisMaxGroup (qclass DisjunctionMax)
            from whoosh_ray.search.query import DisjunctionMax

            return DisjunctionMax(qs)
        if self.group == "ordered":
            # reference syntax.py:428 OrderedGroup (qclass Ordered)
            from whoosh_ray.search.query import Ordered

            return Ordered(qs)
        return And(qs)

    def _op_passes(self, items) -> list:
        """Operator application over a flat item list, returning the
        surviving top-level queries (whitespace-AND NOT yet applied) —
        shared by group combine and the sequence plugin."""
        # 1) NOT prefixes (PrefixOperator, applied first — the
        #    reference's op list order, plugins.py:936-951)
        out = []
        skip_next = False
        for j, it in enumerate(items):
            if skip_next:
                skip_next = False
                continue
            if isinstance(it, tuple) and it[1] == "NOT":
                nxt = items[j + 1] if j + 1 < len(items) else None
                if isinstance(nxt, Query):
                    out.append(Not(nxt))
                    skip_next = True
                continue
            out.append(it)
        items = out

        # 2) infix passes in the reference's operator-application order
        #    (OperatorsPlugin.do_operators iterates its op list:
        #    AND, OR, ANDNOT, ANDMAYBE, REQUIRE), each left-to-right and
        #    left-associative; explicit AND/OR take only their IMMEDIATE
        #    neighbors, so "aa bb OR cc dd" is And([aa, Or(bb, cc), dd])
        #    — OR binds TIGHTER than the implicit whitespace-AND.
        #    Unboosted same-class left groups merge (AndGroup/OrGroup
        #    merging=True): "aa OR bb OR cc" is one 3-way Or.
        def _and_join(left, right):
            if isinstance(left, And) and left.boost == 1.0:
                return And(left.subqueries + [right])
            return And([left, right])

        def _or_join(left, right):
            if (type(left) is Or and left.boost == 1.0
                    and left.minmatch == 0 and left.scale is None):
                return Or(left.subqueries + [right])
            return Or([left, right])

        def _binary(cls):
            # group-BUILD null handling (distinct from the normalize
            # layer): the reference drops null children from a syntax
            # group and unwraps the single survivor, so ANY side of a
            # binary op that analyzed to nothing yields the other side
            # ("the ANDNOT deploy" == "deploy ANDNOT the" == deploy)
            def join(left, right):
                if isinstance(left, _NullQuery):
                    return right
                if isinstance(right, _NullQuery):
                    return left
                return cls(left, right)

            return join

        passes = (("AND", _and_join), ("OR", _or_join),
                  ("ANDNOT", _binary(AndNot)), ("ANDMAYBE", _binary(AndMaybe)),
                  ("REQUIRE", _binary(Require)))
        for opname, combine in passes:
            out = []
            j = 0
            while j < len(items):
                it = items[j]
                if (isinstance(it, tuple) and it[1] == opname and out
                        and isinstance(out[-1], Query)
                        and j + 1 < len(items)
                        and isinstance(items[j + 1], Query)):
                    left = out.pop()
                    out.append(combine(left, items[j + 1]))
                    j += 2
                else:
                    out.append(it)
                    j += 1
            items = out

        # 3) leftover dangling operator markers (e.g. a trailing OR)
        #    are dropped; the caller applies whitespace-AND
        return [it for it in items if isinstance(it, Query)]

    # ---- leaves ----

    def _leaf(self, kind, val) -> Query | None:
        field = self.default_field
        if kind == "foreign":
            # a user TaggingPlugin node: its query() IS the leaf
            # (reference SyntaxNode.query contract, syntax.py:82-88)
            q = val.query(self)
            return q if q is not None else _NullQuery()
        if kind == "phrase":
            qfield, body, slop = val
            if qfield and self._known_field(qfield):
                # fielded phrase: field:"..." (FieldsPlugin binds the
                # following quoted node, reference plugins.py:368-447)
                field = self.aliases.get(qfield, qfield)
                if field in self.datefields:
                    return self._make_date(field, body)
                return self._make_phrase(field, body, slop)
            if qfield:
                # UNKNOWN field prefix: the reference folds the would-be
                # fieldname INTO the default-field phrase word list
                # ('bogus:"query planning"' -> Phrase(body, [bogus,
                # query, planning]) — quirk kept)
                body = qfield + " " + body
            if "sequence" in self.plugins:
                return self._make_sequence(body, slop)
            return self._make_phrase(field, body, slop)
        if kind == "regex":
            # RegexPlugin (plugins.py:202-221): [field:]r"pattern"
            m = re.match(r'^(?:(\w+):)?r"([^"]*)"$', val)
            fname = m.group(1)
            pattern = m.group(2)
            if fname and self._known_field(fname):
                field = self.aliases.get(fname, fname)
            elif fname:
                # UNKNOWN field prefix folds INTO the pattern text, like
                # the phrase/range fold-in (reference do_fieldnames,
                # plugins.py:407-415: 'bogus:r"pat"' -> Regex(default,
                # 'bogus:pat'))
                pattern = fname + ":" + pattern
            from whoosh_ray.search.query import Regex

            return Regex(field, pattern)
        if kind == "range":
            rfield, raw = val
            if rfield:
                if self._known_field(rfield):
                    field = self.aliases.get(rfield, rfield)
                    if field in self.datefields:
                        return self._make_date(field, raw)
                else:
                    # UNKNOWN field prefix becomes a default-field term
                    # alongside the range (reference 'bogus:[a TO b]' ->
                    # And([Term(bogus), TermRange]))
                    t = self._make_term(self.default_field, rfield)
                    rng = self._make_range(field, raw)
                    if t is None or isinstance(t, _NullQuery):
                        return rng
                    return And([t, rng])
            return self._make_range(field, raw)
        # FunctionPlugin syntax, with boost passed as a kwarg to the fn
        # (reference FunctionNode.query, plugins.py:595-598)
        if kind == "word" and self.functions and val.startswith("#"):
            fm = re.match(r"^#([A-Za-z_][A-Za-z0-9._]*)"
                          r"(?:\[(.*?)\])?(?:\^(\d+(?:\.\d+)?))?$", val)
            if fm and fm.group(1) in self.functions:
                args, kwargs = _parse_fn_args(fm.group(2) or "")
                if fm.group(3) is not None and "boost" not in kwargs:
                    kwargs["boost"] = float(fm.group(3))
                # reference fns take (qs, *args, **kwargs); qs is the
                # (in practice always empty) sub-node list
                return self.functions[fm.group(1)]([], *args, **kwargs)
        # word — maybe carrying an attached ^boost (Boost plugin);
        # "wordnb" fragments (plusminus splits) never boost
        text = val
        boost = 1.0
        bm = (None if kind == "wordnb"
              else re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", text))
        if bm and bm.group(1):
            text = _subspan(text, 0, len(bm.group(1)))
            boost = float(bm.group(2))
            q = self._leaf(kind, text)
            return _with_boost(q, boost) if isinstance(q, Query) and not isinstance(q, _NullQuery) else q
        m = re.match(r"^(\w+):(.*)$", text, re.DOTALL)
        if m and m.group(1) in self.pseudofields:
            q = self.pseudofields[m.group(1)](m.group(2))
            return q if q is not None else _NullQuery()
        if m and self._known_field(m.group(1)):
            field = self.aliases.get(m.group(1), m.group(1))
            text = _subspan(text, m.start(2), len(text))
            if field in self.datefields:
                return self._make_date(field, text)
            if text.startswith('"') and text.endswith('"') and len(text) > 1:
                return self._make_phrase(field,
                                         _subspan(text, 1, len(text) - 1), 1)
            if text.startswith("[") or text.startswith("{"):
                return self._make_range(field, text)
        if "gtlt" in self.plugins:
            gm = re.match(r"^(>=|<=|>|<)(.+)$", text)
            if gm:
                op, val = gm.group(1), gm.group(2).lower()
                if op == ">":
                    return TermRange(field, val, None, startexcl=True)
                if op == ">=":
                    return TermRange(field, val, None)
                if op == "<":
                    return TermRange(field, None, val, endexcl=True)
                return TermRange(field, None, val)
        if "fuzzy" in self.plugins:
            fm = re.match(r"^(.+?)~(\d+)?(?:/(\d+))?$", text)
            if fm:
                from whoosh_ray.search.query import FuzzyTerm

                an = self._analyzers.get(field)
                words = (an.token_lists([fm.group(1)])[0] if an
                         else [str(fm.group(1))])
                if words:
                    return FuzzyTerm(
                        field, words[0],
                        maxdist=int(fm.group(2) or 1),
                        prefixlength=int(fm.group(3) or 0))
        if val == "*:*":
            # EveryPlugin (plugins.py:353-366): the unfielded match-all
            return Every(None)
        if text == "*":
            # reference Wildcard("*").normalize() -> Every(fieldname)
            # (query/wildcards.py); bare "*" therefore takes the
            # DEFAULT field, not the unfielded Every
            return Every(field)
        if "*" in text or "?" in text:
            # lowercasing is the schema'd analyzers' convention; the
            # schema-less reference parser passes pattern text through
            low = (str.lower if self.schema is not None
                   else (lambda s: s))
            if text.endswith("*") and "*" not in text[:-1] and "?" not in text:
                return Prefix(field, low(text[:-1]))
            return Wildcard(field, low(text))
        return self._make_term(field, text)

    def _make_sequence(self, body: str, slop: int) -> Query:
        """SequencePlugin (plugins.py:748-824): quoted body parses as
        sub-queries (groups/fields/wildcards/ops apply inside) joined
        into an ordered Sequence with the given slop, composing
        normally with the surrounding query.  Reference quirks kept: a
        trailing ``^boost`` on the closing quote is DROPPED (handled in
        ``_maybe_boost``), and positionless (ID-field) sub-terms crash
        the reference at search time (its raise is itself a broken
        %-format, matching/mcore.py:608) — here they simply yield no
        spans."""
        from whoosh_ray.search.query import Sequence

        toks = list(self._lex(str(body)))
        base = getattr(body, "span", None)
        if base is not None:
            # sub-lexed spans are body-relative; shift them into the
            # original query string so corrections splice correctly
            off = base[0]

            def _shift(v):
                sp = getattr(v, "span", None)
                if sp is None:
                    return v
                return SpannedStr.make(str(v), sp[0] + off, sp[1] + off)

            def _shift_tok(k, v):
                if isinstance(v, str):
                    return (k, _shift(v))
                if k == "phrase":
                    qf, b, sl = v
                    return (k, (qf, _shift(b), sl))
                return (k, v)

            toks = [_shift_tok(k, v) for k, v in toks]
        items, _ = self._collect_items(toks, 0)
        return Sequence(self._op_passes(items), slop=slop)

    def _make_date(self, field, text) -> Query:
        """DateParserPlugin analogue: parse the English date expression
        into an inclusive DateRange; range syntax [a TO b] parses each
        end."""
        import datetime as _dt

        from whoosh_ray.search.dateparse import date_from
        from whoosh_ray.search.query import DateRange

        base = self.basedate or _dt.datetime.utcnow()
        text = text.strip()
        if len(text) > 1 and text[0] == "'" and text[-1] == "'":
            text = text[1:-1]
        if (text.startswith("[") or text.startswith("{")) and (
                text.endswith("]") or text.endswith("}")):
            body = text[1:-1]
            lo_s, hi_s = re.split(r"\s+[Tt][Oo]\s+", body, maxsplit=1)
            lo = date_from(lo_s.strip().strip("'"), base)[0] if lo_s.strip() else None
            hi = date_from(hi_s.strip().strip("'"), base)[1] if hi_s.strip() else None
            return DateRange(field, lo, hi,
                             startexcl=text[0] == "{",
                             endexcl=text[-1] == "}")
        lo, hi = date_from(text, base)
        return DateRange(field, lo, hi)

    def _make_term(self, field, text) -> Query | None:
        q = self._term_in_field(field, text)
        if field in self.copyfields and not isinstance(q, _NullQuery):
            mirror = self._term_in_field(self.copyfields[field], text)
            if not isinstance(mirror, _NullQuery):
                return Or([q, mirror])
        return q

    def _term_in_field(self, field, text) -> Query | None:
        an = self._analyzers.get(field)
        if an is None:
            # schema-less mode: raw text, case and all (reference
            # term_query's no-schema fallback, default.py:244-247)
            t = Term(field, str(text))
            sp = getattr(text, "span", None)
            if sp is not None:
                t.startchar, t.endchar = sp
            return t
        words = an.token_lists([text])[0]
        if not words:
            return _NullQuery()
        if len(words) == 1:
            t = Term(field, words[0])
            chars = self._token_chars(field, text)
            if chars and len(chars) == 1:
                t.startchar, t.endchar = chars[0]
            return t
        spec = (None if self.schema is None else
                next((f for f in self.schema.fields if f.name == field),
                     None))
        if spec is not None and spec.analyzer.ngram is not None:
            # NGRAM fields parse a word to And/Or of its grams, never a
            # Phrase (reference NGRAM.parse_query, fields.py:1222-1231)
            cls = Or if getattr(spec, "queryor", False) else And
            return cls([Term(field, w) for w in words])
        # ONE query word analyzing to several tokens ("deploy-render")
        # groups as THE PARSER'S GROUP (And by default), NOT a Phrase
        # (reference WordNode + process_text, default.py term handling;
        # an OrGroup parser flattens the word's tokens into the
        # surrounding Or; a trailing ^boost lands on each term, which
        # normalize-flattens identically to boosting the group)
        return self._group_join([Term(field, w) for w in words])

    def _token_chars(self, field, text):
        """Absolute (startchar, endchar) per surviving query token, when
        the lexer recorded the token's span and the field's chain can
        carry char offsets; None otherwise.  Feeds Term.startchar /
        Phrase.char_ranges for Correction string splicing — the
        reference parser's equivalent plumbing runs the analyzer with
        chars=True offset by the word position (default.py
        process_text)."""
        sp = getattr(text, "span", None)
        if sp is None:
            return None
        base = sp[0]
        try:
            tb = self._analyzers[field]([str(text)], with_chars=True)
        except (ValueError, TypeError):
            tb = None
        if tb is None or tb.startchars is None:
            # chars-less analyzer path (ID fields, restructuring
            # chains): a single whole-word token spans the word itself
            if tb is None:
                tb = self._analyzers[field]([str(text)])
            n = int(tb.row_lengths[0]) if len(tb.row_lengths) else 0
            if n == 1:
                return [(base, base + len(str(text)))]
            return None
        return [(base + int(s), base + int(e))
                for s, e in zip(tb.startchars, tb.endchars)]

    def _make_phrase(self, field, body, slop) -> Query | None:
        an = self._analyzers.get(field)
        if an is None:
            # schema-less phrase: \S+ word split (reference
            # PhrasePlugin.wordexpr fallback, plugins.py:679,720-726)
            base = getattr(body, "span", (0, 0))[0]
            words, chars = [], []
            for wm in re.finditer(r"\S+", str(body)):
                words.append(wm.group(0))
                chars.append((base + wm.start(), base + wm.end()))
            if not words:
                return Phrase(field, [], slop=slop)
            if len(words) == 1:
                t = Term(field, words[0])
                if getattr(body, "span", None) is not None:
                    t.startchar, t.endchar = chars[0]
                return t
            p = Phrase(field, words, slop=slop)
            if getattr(body, "span", None) is not None:
                p.char_ranges = chars
            return p
        words = an.token_lists([body])[0]
        if not words:
            # an all-stopword PHRASE builds a real (empty) Phrase query
            # that only nullifies at normalize — unlike a stopword WORD,
            # which vanishes at group build.  The reference's binary
            # groups drop a None (word) side but keep an empty Phrase,
            # so '"the the" ANDNOT x' is Null while 'the ANDNOT x' is x
            # (syntax.py:351-366 + Phrase.normalize).
            return Phrase(field, [], slop=slop)
        chars = self._token_chars(field, body)
        if chars is not None and len(chars) != len(words):
            chars = None
        if len(words) == 1:
            t = Term(field, words[0])
            if chars:
                t.startchar, t.endchar = chars[0]
            return t
        p = Phrase(field, words, slop=slop)
        p.char_ranges = chars
        return p

    def _make_range(self, field, text) -> Query:
        startexcl = text[0] == "{"
        endexcl = text[-1] == "}"
        m = _RANGE_BODY.match(text[1:-1])
        lo = m.group("start") or ""
        hi = m.group("end") or ""
        lo = lo.rstrip()
        if lo.startswith("'") and lo.endswith("'") and len(lo) > 1:
            lo = lo[1:-1]
        hi = hi.lstrip()
        if hi.startswith("'") and hi.endswith("'") and len(hi) > 1:
            hi = hi[1:-1]
        if self.schema is not None:
            lo, hi = lo.lower(), hi.lower()
        lo = lo or None
        hi = hi or None
        try:
            spec = self.schema.field(field) if self.schema else None
        except KeyError:
            spec = None
        if spec is not None and spec.kind == "numeric":
            from whoosh_ray.search.query import NumericRange

            try:
                return NumericRange(field,
                                    int(lo) if lo is not None else None,
                                    int(hi) if hi is not None else None,
                                    startexcl=startexcl, endexcl=endexcl)
            except ValueError:
                # an unparsable end ('[40 to *]') Nulls the whole range
                # (reference NUMERIC.parse_range -> error_query ->
                # normalize -> NullQuery; pinned by test_numeric_range)
                return _NullQuery()
        return TermRange(field, lo, hi, startexcl=startexcl, endexcl=endexcl)


class MultifieldParser(QueryParser):
    """Unfielded terms search every listed field joined by Or, with
    optional per-field boosts (MultifieldPlugin, plugins.py:1096-1153;
    qparser.MultifieldParser)."""

    _SENTINEL = "\x00multi"

    def __init__(self, fieldnames, schema: IndexSchema,
                 fieldboosts: dict[str, float] | None = None, **kw):
        super().__init__(self._SENTINEL, schema, **kw)
        self.fieldnames = list(fieldnames)
        self.fieldboosts = dict(fieldboosts or {})
        # the sentinel "field" analyzes like the first real field
        # (schema-less mode has no analyzers: raw terms throughout)
        if self.fieldnames[0] in self._analyzers:
            self._analyzers[self._SENTINEL] = \
                self._analyzers[self.fieldnames[0]]

    def _fanout(self, per_field) -> Query:
        subs = []
        for f in self.fieldnames:
            q = per_field(f)
            if q is None or isinstance(q, _NullQuery):
                continue
            b = self.fieldboosts.get(f)
            if b is not None:
                q = _with_boost(q, q.boost * b)
            subs.append(q)
        if not subs:
            return _NullQuery()
        return subs[0] if len(subs) == 1 else Or(subs)

    def _make_term(self, field, text):
        if field != self._SENTINEL:
            return super()._make_term(field, text)
        return self._fanout(lambda f: super(MultifieldParser, self)
                            ._make_term(f, text))

    def _make_phrase(self, field, body, slop):
        if field != self._SENTINEL:
            return super()._make_phrase(field, body, slop)
        return self._fanout(lambda f: super(MultifieldParser, self)
                            ._make_phrase(f, body, slop))

    def _leaf(self, kind, val):
        q = super()._leaf(kind, val)
        fn = getattr(q, "fieldname", None)
        if fn == self._SENTINEL:
            from whoosh_ray.search.query import Regex

            if isinstance(q, (Prefix, Wildcard, Regex)):
                return self._fanout(
                    lambda f: type(q)(f, q.text, boost=q.boost))
            from whoosh_ray.search.query import FuzzyTerm

            if isinstance(q, FuzzyTerm):
                return self._fanout(
                    lambda f: FuzzyTerm(f, q.text, boost=q.boost,
                                        maxdist=q.maxdist,
                                        prefixlength=q.prefixlength))
            if isinstance(q, TermRange):
                return self._fanout(
                    lambda f: TermRange(f, q.start, q.end,
                                        startexcl=q.startexcl,
                                        endexcl=q.endexcl))
        if isinstance(q, Every) and q.fieldname == self._SENTINEL:
            # bare "*" under MultifieldParser fans out per field like
            # any other unfielded leaf (reference parses it to
            # Or([Every(f) for f in fields])); "*:*" stays Every(None)
            # via the _leaf val check
            return self._fanout(lambda f: Every(f, boost=q.boost))
        return q


# SimpleParser grammar (default.py:406-418 plugin set): plus/minus
# markers match ANYWHERE (PlusMinusPlugin taggers "\+"/"-" carry no
# word-boundary guard, plugins.py:1017-1023 — so "deploy-render" parses
# as deploy AND NOT render), quoted phrases take an optional ~slop, and
# whitespace separates; everything between matches accumulates into
# words.  No fields, parens, operators, ranges or boosts.
_SIMPLE_TOKEN_RE = re.compile(
    r'(?P<plus>\+)'
    r'|(?P<minus>-)'
    r'|"(?P<phrase>[^"]*?)"(~(?P<slop>[1-9][0-9]*))?'
    r'|(?P<ws>\s+)')


class SimpleParser(QueryParser):
    """Reference SimpleParser (qparser/default.py:406-418): only +, -
    and phrase syntax over an OrGroup — built for end-user search
    boxes.  Whitespace-separated terms join with Or; ``+``/``-`` mark
    the NEXT node (word or phrase) required/prohibited, building
    AndNot(AndMaybe(And(required), Or(optional)), Or(banned))
    (PlusMinusPlugin.do_plusminus, plugins.py:1028-1061); a word that
    analyzes to several tokens joins as Or (the OrGroup), not And; a
    stopped required word nulls the whole query (AndMaybe(Null, x) ->
    Null)."""

    def parse(self, text: str) -> Query:
        nodes: list = []
        pos = 0

        def flush_word(upto: int):
            nonlocal pos
            w = text[pos:upto]
            if w:
                nodes.append(self._simple_word(
                    SpannedStr.make(w, pos, upto)))
            pos = upto

        for m in _SIMPLE_TOKEN_RE.finditer(text):
            flush_word(m.start())
            pos = m.end()
            if m.group("plus"):
                nodes.append("plus")
            elif m.group("minus"):
                nodes.append("minus")
            elif m.group("phrase") is not None:
                body = SpannedStr.make(m.group("phrase"),
                                       *m.span("phrase"))
                q = self._simple_phrase(body, int(m.group("slop") or 1))
                if q is not None:
                    nodes.append(q)
        flush_word(len(text))

        required: list = []
        optional: list = []
        banned: list = []
        target = optional
        for nd in nodes:
            if nd == "plus":
                target = required
            elif nd == "minus":
                target = banned
            else:
                target.append(nd)
                target = optional
        group: Query = Or(optional) if optional else _NullQuery()
        if required:
            group = AndMaybe(And(required), group)
        if banned:
            group = AndNot(group, Or(banned))
        return group.normalize()

    def _simple_word(self, text) -> Query:
        field = self.default_field
        words = self._analyzers[field].token_lists([str(text)])[0]
        if not words:
            return _NullQuery()
        if len(words) == 1:
            t = Term(field, words[0])
            chars = self._token_chars(field, text)
            if chars and len(chars) == 1:
                t.startchar, t.endchar = chars[0]
            return t
        # OrGroup: a multi-token word joins the surrounding Or flat
        return Or([Term(field, w) for w in words])

    def _simple_phrase(self, body, slop) -> Query | None:
        return self._make_phrase(self.default_field, body, slop)


class DisMaxParser(SimpleParser):
    """Reference DisMaxParser (qparser/default.py:421-439): the simple
    +/-/phrase grammar, with each term/phrase fanned out over
    ``fieldboosts`` as a DisjunctionMax (MultifieldPlugin with
    group=DisMaxGroup)."""

    _SENTINEL = "\x00dismax"

    def __init__(self, fieldboosts: dict, schema: IndexSchema,
                 tiebreak: float = 0.0, **kw):
        self.fieldboosts = dict(fieldboosts)
        names = list(self.fieldboosts)
        super().__init__(names[0], schema, **kw)
        self.tiebreak = tiebreak

    def _dismax(self, per_field) -> Query:
        from whoosh_ray.search.query import DisjunctionMax

        subs = []
        for f, b in self.fieldboosts.items():
            q = per_field(f)
            if q is None:
                q = _NullQuery()
            if b != 1.0 and not isinstance(q, _NullQuery):
                q = _with_boost(q, q.boost * b)
            subs.append(q)
        return DisjunctionMax(subs, tiebreak=self.tiebreak)

    def _simple_word(self, text) -> Query:
        return self._dismax(
            lambda f: SimpleParser._simple_word(
                _FieldView(self, f), text))

    def _simple_phrase(self, body, slop) -> Query | None:
        from whoosh_ray.search.query import DisjunctionMax

        # the fieldboost rides the PHRASE NODE, and the reference's
        # one-token-phrase -> Term conversion DROPS node boost — so a
        # quoted body that analyzes to a single token (1-word text
        # phrase, or ANY phrase on an ID field) fans out UNBOOSTED
        # (PhraseNode.query + the Term-sans-boost quirk)
        subs = []
        for f, b in self.fieldboosts.items():
            q = self._make_phrase(f, body, slop)
            if q is None:
                q = _NullQuery()
            if b != 1.0 and isinstance(q, Phrase):
                q = _with_boost(q, q.boost * b)
            subs.append(q)
        return DisjunctionMax(subs, tiebreak=self.tiebreak)


class _FieldView:
    """Proxy presenting ``parser`` with a different default field —
    lets DisMaxParser reuse SimpleParser's per-word builder per
    fanned-out field."""

    def __init__(self, parser, field):
        self._parser = parser
        self.default_field = field

    def __getattr__(self, name):
        return getattr(self._parser, name)


def _parse_fn_args(argstring: str) -> tuple[list, dict]:
    """Comma-split function args; ``name=value`` pairs become kwargs,
    'single quotes' strip (reference FunctionPlugin._parse_args,
    plugins.py:620-645)."""
    args: list = []
    kwargs: dict = {}
    if not argstring:
        return args, kwargs
    for part in argstring.split(","):
        name = None
        value = part
        if "=" in part:
            name, value = part.split("=", 1)
            name = name.strip()
        value = value.strip()
        if value.startswith("'") and value.endswith("'"):
            value = value[1:-1]
        if name:
            kwargs[name] = value
        else:
            args.append(value)
    return args, kwargs


def _with_boost(q: Query, boost: float) -> Query:
    import copy

    q2 = copy.copy(q)
    q2.boost = boost
    return q2
