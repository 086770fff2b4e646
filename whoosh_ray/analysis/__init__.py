"""Drop-in analysis surface with the reference's names and signatures.

A user of the reference writes ``RegexTokenizer() | LowercaseFilter() |
StopFilter()`` and passes the result as a field's analyzer
(reference analysis/acore.py:137-172 Composable ``|`` protocol, plus the
tokenizer/filter classes in analysis/tokenizers.py and
analysis/filters.py).  Here every tokenizer constructor returns an
:class:`~whoosh_ray.functions.analysis.AnalyzerSpec` (the engine's
picklable declarative analyzer) and every filter constructor returns a
declarative chain :class:`Stage`; ``|`` composes them into the same
spec objects the vectorized engine compiles once per worker — so a
reference schema definition ports by changing only the import line.

Stream parity of every stage is pinned in tests/test_tokenfilters.py
and tests/test_analysis_compat.py against the reference generators.
"""

from __future__ import annotations

import re

from whoosh_ray.functions.analysis import (  # noqa: F401  (re-exports)
    STOP_WORDS,
    AnalyzerSpec,
    FancyAnalyzer,
    IDAnalyzer,
    KeywordAnalyzer,
    LanguageAnalyzer,
    NgramAnalyzer,
    NgramWordAnalyzer,
    RegexAnalyzer,
    SimpleAnalyzer,
    StandardAnalyzer,
    StemmingAnalyzer,
    VectorAnalyzer,
    LANG_ALIASES,
)
from whoosh_ray.functions.tokenfilters import Token  # noqa: F401

#: the reference default_pattern (tokenizers.py:43) — spelled with a
#: non-capturing group because the vectorized tokenizer extracts whole
#: matches (the matched text is identical)
default_pattern = re.compile(r"\w+(?:\.?\w+)*", re.UNICODE)

# The engine analyzes whole Arrow columns at once, so an "analyzer" is
# data (a spec), not a generator pipeline; Analyzer is the spec type.
Analyzer = AnalyzerSpec


class CompositionError(Exception):
    """Raised for compositions the reference also rejects (a filter
    before a tokenizer, acore.py:151-158)."""


class NoStopWords(Exception):
    """No stop-word list for the requested language
    (reference lang/__init__.py:129-140)."""


def _is_stage(s) -> bool:
    return isinstance(s, tuple) and len(s) == 2 and isinstance(s[0], str)


class Stage(tuple):
    """One declarative ("kind", params) filter stage — the compat
    stand-in for a reference Filter instance.  A plain tuple subclass:
    it drops into ``AnalyzerSpec.chain`` unchanged, and ``|`` composes
    stages into a :class:`StageChain` the way reference filters compose
    into a CompositeAnalyzer tail."""

    __slots__ = ()
    _TWO = object()

    def __new__(cls, kind, params=_TWO):
        # also accept a single iterable: dataclasses.asdict and the
        # default tuple pickle path reconstruct via type(obj)(iterable)
        if params is cls._TWO:
            return tuple.__new__(cls, tuple(kind))
        return tuple.__new__(cls, (kind, params))

    def __getnewargs__(self):
        return (self[0], self[1])

    _MORPH_KINDS = frozenset({"stem", "stemfn", "pystemmer",
                              "dmetaphone"})

    @property
    def is_morph(self):
        """True for stages that alter token text morphologically —
        stemmers / metaphone (reference acore.py:138, set on
        StemFilter/PyStemmerFilter/DoubleMetaphoneFilter)."""
        return self[0] in self._MORPH_KINDS

    def has_morph(self):
        return self.is_morph

    def __or__(self, other):
        return StageChain((self,)) | other


# Filter is what reference user code subclass-checks against rarely but
# constructs often; expose the stage type under that name too.
Filter = Stage


class StageChain(tuple):
    """An ordered tuple of stages — a pre-composed filter pipeline
    (what ``LowercaseFilter() | StemFilter()`` yields before a
    tokenizer is prepended)."""

    __slots__ = ()

    @property
    def is_morph(self):
        return any(Stage(st).is_morph for st in self)

    def has_morph(self):
        """Any stage is a morphological filter (reference
        analyzers.py:111-112)."""
        return self.is_morph

    def __or__(self, other):
        if isinstance(other, AnalyzerSpec):
            raise CompositionError(
                "the tokenizer/analyzer must come first in a chain")
        if isinstance(other, StageChain):
            return StageChain(tuple(self) + tuple(other))
        if _is_stage(other):
            return StageChain(tuple(self) + (other,))
        raise TypeError("compose with a filter stage or chain")


def _as_chain(flt) -> tuple:
    """Normalize a Stage / StageChain / raw stage tuple to a chain."""
    if isinstance(flt, StageChain):
        return tuple(flt)
    if _is_stage(flt):
        return (flt,)
    raise TypeError(f"not a filter stage/chain: {flt!r}")


# ---------------------------------------------------------------- tokenizers

def RegexTokenizer(expression=r"\w+(?:\.?\w+)*",
                   gaps: bool = False) -> AnalyzerSpec:
    """tokenizers.py:49-111: yield matches of ``expression`` (or the
    text between matches with ``gaps=True``)."""
    pat = getattr(expression, "pattern", expression)
    return AnalyzerSpec(chain=(("tokenizer", (pat, gaps)),))


def IDTokenizer() -> AnalyzerSpec:
    """tokenizers.py:230-243: the whole value is a single token."""
    return AnalyzerSpec(chain=(("tokenizer", (None, False)),))


def SpaceSeparatedTokenizer() -> AnalyzerSpec:
    """tokenizers.py:294-303."""
    return RegexTokenizer(r"[^ \t\r\n]+")


def CommaSeparatedTokenizer() -> AnalyzerSpec:
    """tokenizers.py:306-317: split on commas, strip whitespace."""
    return RegexTokenizer(r"[^,]+") | StripFilter()


def PathTokenizer(expression: str = "[^/]+") -> AnalyzerSpec:
    """tokenizers.py:320-337: pattern matches path COMPONENTS; the
    emitted tokens are the cumulative prefixes."""
    if expression != "[^/]+":
        raise TypeError("custom PathTokenizer expressions aren't "
                        "spec-expressible; the default component "
                        "pattern is supported")
    from whoosh_ray.functions.analysis import PATH

    return PATH


def CharsetTokenizer(charmap) -> AnalyzerSpec:
    """tokenizers.py:187-290: the charmap drives tokenization —
    unmapped characters break tokens, mapped characters translate.
    Vectorized-only (does not compose with chain filters)."""
    items = tuple(sorted(charmap.items())) if hasattr(charmap, "items") \
        else tuple(charmap)
    return AnalyzerSpec(lowercase=False, stopwords=None, minsize=0,
                        charmap=items, charset_tokenize=True)


def NgramTokenizer(minsize: int, maxsize: int | None = None) -> AnalyzerSpec:
    """ngrams.py:37-116: slide a character window over the raw text.
    Composes with LowercaseFilter (the NgramAnalyzer chain); other
    filters can't ride the vectorized ngram path."""
    return AnalyzerSpec(lowercase=False, stopwords=None, minsize=0,
                        ngram=(minsize, maxsize or minsize),
                        ngram_mode="text")


# ------------------------------------------------------------------- filters

def PassFilter() -> Stage:
    """filters.py:84-89: identity."""
    return Stage("pass", ())


def LoggingFilter(logger=None) -> Stage:
    """filters.py:92-112: debug-log each token's text."""
    if logger is not None:
        raise TypeError("a custom logger isn't spec-expressible; the "
                        "'whoosh_ray.analysis' logger is used")
    return Stage("logging", ())


def LowercaseFilter() -> Stage:
    """filters.py:215-226."""
    return Stage("lowercase", ())


def StripFilter() -> Stage:
    """filters.py:229-237."""
    return Stage("strip", ())


def StopFilter(stoplist=STOP_WORDS, minsize: int = 2,
               maxsize: int | None = None, renumber: bool = True,
               lang: str | None = None) -> Stage:
    """filters.py:240-311.  ``lang=`` ADDS the language's list to
    ``stoplist`` (which defaults to the English STOP_WORDS — so both
    drop; reference :258-282)."""
    stops = set()
    if stoplist:
        stops.update(stoplist)
    if lang:
        from whoosh_ray.functions.lang_stopwords_data import STOPLISTS

        tlc = LANG_ALIASES.get(lang, lang)
        if tlc not in STOPLISTS:
            raise NoStopWords(f"No stop-word list available for {lang!r}")
        stops.update(STOPLISTS[tlc])
    return Stage("stop", (tuple(sorted(stops)) if stops else None,
                          minsize, maxsize, renumber))


_STEMFN_NAMES = {"porter", "porter2", "lovins", "paicehusk"}


def _stemfn_name(stemfn) -> str:
    """Accept a known stemmer by name or by the engine's own function
    object; arbitrary callables aren't expressible in a picklable
    spec (pass a name)."""
    if isinstance(stemfn, str):
        if stemfn not in _STEMFN_NAMES:
            raise TypeError(f"unknown stemmer name {stemfn!r}; one of "
                            f"{sorted(_STEMFN_NAMES)}")
        return stemfn
    for name in _STEMFN_NAMES:
        mod = __import__(f"whoosh_ray.functions.{name}",
                         fromlist=["stem"])
        if stemfn is getattr(mod, "stem", None):
            return name
    raise TypeError("StemFilter(stemfn=) takes a stemmer NAME "
                    "('porter'/'porter2'/'lovins'/'paicehusk') or one "
                    "of whoosh_ray.functions.*.stem; arbitrary "
                    "callables aren't spec-expressible")


def StemFilter(stemfn="porter", lang: str | None = None, ignore=None,
               cachesize: int = 50000) -> Stage:
    """morph.py:35-151: stem token text, memoized per analyzer.  With
    ``lang=`` the snowball stemmer for that language is used (the
    reference delegates to PyStemmer there)."""
    if lang is not None:
        return Stage("pystemmer", (lang, tuple(sorted(ignore or ())),
                                   cachesize))
    name = _stemfn_name(stemfn)
    if name == "porter" and not ignore and cachesize == 50000:
        return Stage("stem", ())
    return Stage("stemfn", (name, tuple(sorted(ignore or ())), cachesize))


def PyStemmerFilter(lang: str = "english", ignore=None,
                    cachesize: int = 10000) -> Stage:
    """morph.py:154-221: snowball stemmer by language name (C extension
    when importable, else the engine's pure stemmers — resolve_stemmer
    in functions/snowball.py)."""
    return Stage("pystemmer", (lang, tuple(sorted(ignore or ())),
                               cachesize))


def CharsetFilter(charmap) -> Stage:
    """filters.py:323-372: translate token text through a charmap
    (e.g. accent folding)."""
    items = tuple(sorted(charmap.items())) if hasattr(charmap, "items") \
        else tuple(charmap)
    return Stage("charset", items)


def SubstitutionFilter(pattern, replacement: str) -> Stage:
    """filters.py:439-479: re.sub on token text."""
    pat = getattr(pattern, "pattern", pattern)
    return Stage("substitute", (pat, replacement))


def ReverseTextFilter() -> Stage:
    """filters.py:201-212: reverse token text."""
    return Stage("reverse", ())


def NgramFilter(minsize: int, maxsize: int | None = None,
                at: str | None = None) -> Stage:
    """ngrams.py:119-219: explode each word into its grams (drop words
    shorter than ``minsize``; query mode emits the single size
    min(maxsize, len))."""
    return Stage("ngram", (minsize, maxsize or minsize, at))


def DelimitedAttributeFilter(delimiter: str = "^",
                             attribute: str = "boost",
                             default=1.0, type=float) -> Stage:
    """filters.py:375-436: parse a 'word^2' suffix into token.boost."""
    if attribute != "boost" or type is not float:
        raise TypeError("only the boost attribute is spec-expressible "
                        "(posting weights)")
    return Stage("delimited", (delimiter,))


def IntraWordFilter(delims: str = "-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+",
                    splitwords: bool = True, splitnums: bool = True,
                    mergewords: bool = False,
                    mergenums: bool = False) -> Stage:
    """intraword.py:222-494.  splitwords=False with splitnums=False
    crashes the reference (unset self.boundary) — no behavior to
    match; the engine raises at compile time for that combination."""
    if not splitwords and not splitnums:
        raise TypeError("splitwords=False with splitnums=False crashes "
                        "the reference (intraword.py:334); no behavior "
                        "to match")
    return Stage("intraword", (delims, splitwords, splitnums,
                               mergewords, mergenums))


def CompoundWordFilter(wordset, keep_compound: bool = True) -> Stage:
    """intraword.py:36-99: greedily decompose tokens into wordset
    members."""
    return Stage("compound", (tuple(sorted(wordset)), keep_compound))


def BiWordFilter(sep: str = "-") -> Stage:
    """intraword.py:105-167."""
    return Stage("biword", (sep,))


def ShingleFilter(size: int = 2, sep: str = "-") -> Stage:
    """intraword.py:169-221."""
    return Stage("shingle", (size, sep))


def DoubleMetaphoneFilter(primary_boost: float = 1.0,
                          secondary_boost: float = 0.5,
                          combine: bool = False) -> Stage:
    """morph.py:224-277 + lang/dmetaphone.py (the engine's table is
    functions/dmetaphone.py, 100k-word fuzz parity)."""
    return Stage("dmetaphone", (primary_boost, secondary_boost, combine))


def TeeFilter(*filters) -> Stage:
    """filters.py:115-168: run every token through each sub-filter;
    outputs interleave round-robin per token."""
    if len(filters) < 2:
        raise Exception("TeeFilter requires two or more filters")
    return Stage("tee", tuple(_as_chain(f) for f in filters))


def MultiFilter(**kwargs) -> Stage:
    """filters.py:115-160 (MultiFilter): pick a sub-filter by analysis
    mode; an unmatched mode passes tokens through (the reference's
    PassFilter default)."""
    subs = [(mode, _as_chain(f)) for mode, f in kwargs.items()]
    if "default" not in kwargs:
        subs.append(("default", ()))
    return Stage("multi", tuple(subs))


# Reference module-level helpers ----------------------------------------

def unstopped(tokenstream):
    """acore.py:46-50: only tokens not marked stopped.  The engine
    removes stopped tokens eagerly, so every token passes."""
    return (t for t in tokenstream if not getattr(t, "stopped", False))


def entoken(textstream, positions: bool = False, chars: bool = False,
            start_pos: int = 0, start_char: int = 0, **kwargs):
    """acore.py:53-74: wrap pre-tokenized strings as a token stream.
    Extra kwargs (``boosts`` etc.) are Token-mode flags in the
    reference; tokens here always carry boost 1.0."""
    pos = start_pos
    char = start_char
    for text in textstream:
        t = Token(text, pos if positions else 0)
        if chars:
            t.startchar = char
            char = char + len(text)
            t.endchar = char
        yield t
        if positions:
            pos += 1


# ---- remaining reference module-level names ----

#: reference analysis re-exports (analysis/__init__.py): the porter
#: stem function and double_metaphone
from whoosh_ray.functions.dmetaphone import double_metaphone  # noqa: E402,F401
from whoosh_ray.functions.porter import stem  # noqa: E402,F401


def rcompile(pattern, flags=0, verbose=False):
    from whoosh_ray.util import rcompile as _rc

    return _rc(pattern, flags, verbose)


#: URL-or-word tokenizer pattern (reference analysis/filters.py:50-58),
#: for RegexTokenizer(url_pattern)-style schemas
url_pattern = rcompile(r"""
(
    [A-Za-z+]+://          # URL protocol
    \S+?                   # URL body
    (?=\s|[.]\s|$|[.]$)    # Stop at space/end, or a dot followed by space/end
) | (                      # or...
    \w+([:.]?\w+)*         # word characters, with opt. internal colons/dots
)
""", verbose=True)


#: an analyzer IS the composite here (a picklable spec); the names are
#: kept so isinstance checks in ported code keep working
CompositeAnalyzer = AnalyzerSpec
Tokenizer = AnalyzerSpec
#: isinstance(x, Composable) covers specs AND filter stages/chains
Composable = (AnalyzerSpec, Stage, StageChain)

#: cache decorators the reference analysis module re-exports
#: (analysis/__init__.py imports them for its own memoized helpers)
from whoosh_ray.util.cache import lfu_cache, unbound_cache  # noqa: E402,F401
