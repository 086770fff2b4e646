"""Generic token-stream filter chains (the niche analyzer filters).

The hot StandardAnalyzer path stays fully vectorized
(functions/analysis.py); the filters here — IntraWord, CompoundWord,
BiWord, Shingle, Tee, Multi — restructure the token STREAM in ways that
don't vectorize, so they run as per-row generator chains exactly like
the reference's (analysis/intraword.py:36-494, filters.py:115-198).
A chain is declared as data on ``AnalyzerSpec.chain`` so specs stay
picklable/hashable; parity with the reference chains is fuzz-tested
(tests/test_tokenfilters.py).

Implementation notes (independent, semantics matched to the reference):

- IntraWordFilter splits on delimiters, case transitions (lower→upper)
  and letter↔digit transitions, strips possessive "'s", renumbers
  positions, and optionally merges alpha/digit runs into an extra token
  at the run's last position (intraword.py:222-494).  Character classes
  come from ``unicodedata`` categories (Ll*/Lu/Nd) rather than the
  reference's generated tables.
- BiWord joins adjacent tokens with ``sep`` at the previous token's
  position; a single-token stream passes through (intraword.py:105-167).
- Shingle windows ``size`` tokens; a shorter stream yields one joined
  token (intraword.py:169-221).
- CompoundWord greedily decomposes tokens into word-set members (all
  subword tokens share the original position; intraword.py:36-99).
- Tee runs every token through several sub-chains and interleaves the
  outputs per token; Multi picks a sub-chain by analysis mode
  (filters.py:115-198).
"""

from __future__ import annotations

import re
import unicodedata


class Token:
    __slots__ = ("text", "pos", "boost", "startchar", "endchar")

    def __init__(self, text: str, pos: int, boost: float = 1.0,
                 startchar: int | None = None, endchar: int | None = None):
        self.text = text
        self.pos = pos
        self.boost = boost
        # char offsets into the ORIGINAL text (reference Token.startchar/
        # endchar when chars=True); None when chars aren't tracked
        self.startchar = startchar
        self.endchar = endchar

    def copy(self) -> "Token":
        return Token(self.text, self.pos, self.boost,
                     self.startchar, self.endchar)


def _is_lower(ch: str) -> bool:
    return unicodedata.category(ch) == "Ll"


def _is_upper(ch: str) -> bool:
    return unicodedata.category(ch) in ("Lu", "Lt")


def _is_digit(ch: str) -> bool:
    return unicodedata.category(ch) == "Nd"


def _is_letter(ch: str) -> bool:
    return unicodedata.category(ch).startswith("L")


# ---- filters (each: (tokens, ...params) -> iterator of Token)

def lowercase_filter(tokens):
    for t in tokens:
        t.text = t.text.lower()
        yield t


def strip_filter(tokens):
    for t in tokens:
        t.text = t.text.strip()
        yield t


def stop_filter(tokens, stopwords, minsize=2, maxsize=None, renumber=True):
    """StopFilter parity (filters.py:259-311): removed tokens drop out;
    with renumber the FIRST survivor keeps its original position and the
    rest count up from there."""
    pos = None
    for t in tokens:
        text = t.text
        if (len(text) >= minsize
                and (maxsize is None or len(text) <= maxsize)
                and (stopwords is None or text not in stopwords)):
            if renumber:
                if pos is None:
                    pos = t.pos
                else:
                    pos += 1
                t.pos = pos
            yield t


def stem_filter(tokens, cache):
    from whoosh_ray.functions.porter import stem as porter_stem

    for t in tokens:
        w = t.text
        st = cache.get(w)
        if st is None:
            st = porter_stem(w)
            if len(cache) < 50000:
                cache[w] = st
        t.text = st
        yield t


def resolve_stemfn(name: str):
    """Named pure stem functions usable as ``("stemfn", (name, ignore,
    cachesize))`` chain entries (the reference's StemFilter takes the
    callables directly, analysis/morph.py:57-111)."""
    if name == "porter":
        from whoosh_ray.functions.porter import stem
    elif name == "porter2":
        from whoosh_ray.functions.porter2 import stem
    elif name == "lovins":
        from whoosh_ray.functions.lovins import stem
    elif name == "paicehusk":
        from whoosh_ray.functions.paicehusk import stem
    else:
        raise ValueError(f"no stem function named {name!r}")
    return stem


def pystemmer_filter(tokens, stem_fn, ignore, cache, cachesize):
    """PyStemmerFilter (reference analysis/morph.py:152-217): a
    StemFilter over a named snowball algorithm with an ignore set and a
    bounded memo cache; backed by functions/snowball.resolve_stemmer
    (C extension when importable, pure implementations otherwise)."""
    for t in tokens:
        w = t.text
        if w in ignore:
            yield t
            continue
        st = cache.get(w)
        if st is None:
            st = stem_fn(w)
            if len(cache) < cachesize:
                cache[w] = st
        t.text = st
        yield t


def charset_filter(tokens, charmap):
    for t in tokens:
        t.text = t.text.translate(charmap)
        yield t


def substitution_filter(tokens, rex, replacement):
    for t in tokens:
        t.text = rex.sub(replacement, t.text)
        yield t


def reverse_text_filter(tokens):
    for t in tokens:
        t.text = t.text[::-1]
        yield t


def ngram_filter(tokens, gmin, gmax, at, mode):
    """NgramFilter parity (ngrams.py:119-219): words shorter than
    ``gmin`` drop; index mode emits grams per (start, size) — or only
    start-/end-anchored grams for ``at`` — all at the word's original
    position; query mode emits the single size min(gmax, len)."""
    for t in tokens:
        text = t.text
        if len(text) < gmin:
            continue
        if mode == "query":
            size = min(gmax, len(text))
            if at == "start":
                t.text = text[:size]
                yield t
            elif at == "end":
                t.text = text[len(text) - size:]
                yield t
            else:
                for start in range(0, len(text) - size + 1):
                    nt = t.copy()
                    nt.text = text[start:start + size]
                    yield nt
        elif at == "start":
            limit = min(gmax, len(text))
            for size in range(gmin, limit + 1):
                nt = t.copy()
                nt.text = text[:size]
                yield nt
        elif at == "end":
            for start in range(max(0, len(text) - gmax),
                               len(text) - gmin + 1):
                nt = t.copy()
                nt.text = text[start:]
                yield nt
        else:
            for start in range(0, len(text) - gmin + 1):
                for size in range(gmin, gmax + 1):
                    if start + size > len(text):
                        continue
                    nt = t.copy()
                    nt.text = text[start:start + size]
                    yield nt


def delimited_attribute_filter(tokens, delimiter="^"):
    """DelimitedAttributeFilter parity (filters.py:375-436): the
    delimited payload is stripped from the token text and parsed into
    ``token.boost``, which the writers fold into per-posting scoring
    weights exactly like the reference's Frequency/Positions
    ``word_values`` (formats.py:182-263: weight = sum of token
    boosts)."""
    for t in tokens:
        pos = t.text.find(delimiter)
        if pos > -1:
            attr = t.text[pos + 1:]
            if attr:
                t.boost = float(attr)
            if t.endchar is not None:
                # strip the delimiter+payload from the char span too
                # (reference filters.py:430: endchar -= len(text) - pos)
                t.endchar -= len(t.text) - pos
            t.text = t.text[:pos]
        yield t


def compound_word_filter(tokens, wordset, keep_compound=True):
    """CompoundWordFilter parity (intraword.py:36-99): greedy prefix
    decomposition into word-set members; subwords share the original
    token's position."""
    memo: dict = {}

    def subwords(s):
        if s in wordset:
            return [s]
        if s in memo:
            return memo[s]
        for i in range(1, len(s)):
            prefix = s[:i]
            if prefix in wordset:
                rest = subwords(s[i:])
                if rest:
                    out = [prefix] + rest
                    memo[s] = out
                    return out
        memo[s] = None
        return None

    for t in tokens:
        subs = subwords(t.text)
        if subs:
            if len(subs) > 1 and keep_compound:
                yield t.copy()
            for s in subs:
                nt = t.copy()
                nt.text = s
                yield nt
        else:
            yield t


def biword_filter(tokens, sep="-"):
    """BiWordFilter parity (intraword.py:105-167): adjacent pairs joined
    with ``sep`` at the FIRST token's position; single-token streams
    pass the lone token through."""
    prev_text = None
    prev_pos = None
    atleastone = False
    token = None
    for token in tokens:
        text = token.text
        pos = token.pos
        if prev_text is not None:
            token.pos = prev_pos
            token.text = prev_text + sep + text
            yield token
            atleastone = True
        prev_text = text
        prev_pos = pos
    if not atleastone and token is not None:
        yield token


def shingle_filter(tokens, size=2, sep="-"):
    """ShingleFilter parity (intraword.py:169-221): ``size``-token
    windows joined with ``sep`` at the window's first token's position;
    a shorter stream yields one joined token."""
    from collections import deque

    buf: deque = deque()
    atleastone = False

    def make():
        tk = buf[0].copy()
        tk.text = sep.join(t.text for t in buf)
        return tk

    for token in tokens:
        buf.append(token.copy())
        if len(buf) == size:
            atleastone = True
            yield make()
            buf.popleft()
    if not atleastone and buf:
        yield make()


class _IntraWord:
    """IntraWordFilter engine (intraword.py:222-494)."""

    def __init__(self, delims="-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+",
                 splitwords=True, splitnums=True,
                 mergewords=False, mergenums=False):
        self.delims = set(delims)
        self.splitwords = splitwords
        self.splitnums = splitnums
        self.mergewords = mergewords
        self.mergenums = mergenums
        self.between = re.compile(
            "[^%s]+" % re.escape("".join(sorted(self.delims))), re.UNICODE)

    def _possessive_runs(self, s: str):
        """Runs of text between possessive 's occurrences: "'s"/"'S"
        preceded by a letter and followed by end-of-string or a
        delimiter."""
        if "'" not in s:
            return [(0, len(s))]
        runs = []
        prev = 0
        i = 0
        n = len(s)
        while i < n - 1:
            if (s[i] == "'" and s[i + 1] in "sS" and i > 0
                    and (_is_lower(s[i - 1]) or _is_upper(s[i - 1]))
                    and (i + 2 == n or s[i + 2] in self.delims)):
                runs.append((prev, i))
                i += 2
                prev = i
            else:
                i += 1
        if prev < n:
            runs.append((prev, n))
        return runs

    def _transitions(self, s: str, start: int, end: int):
        """Pivot points: lower→upper / letter→digit / digit→letter.

        The reference finds these with regex ``finditer`` over TWO-char
        patterns, so matches are non-overlapping: a transition consumes
        both chars and the scan resumes after them — "b2C3" splits as
        b|2C|3, not b|2|C|3.  Reproduced with the explicit skip."""
        i = start
        while i < end - 1:
            a, b = s[i], s[i + 1]
            if ((self.splitwords and _is_lower(a) and _is_upper(b))
                    or (self.splitnums
                        and ((_is_letter(a) and _is_digit(b))
                             or (_is_digit(a) and _is_letter(b))))):
                yield i + 1
                i += 2
            else:
                i += 1

    def _split(self, s: str):
        splitting = self.splitwords or self.splitnums
        for sc, ec in self._possessive_runs(s):
            for m in self.between.finditer(s, sc, ec):
                ps, pe = m.start(), m.end()
                if splitting:
                    prev = ps
                    for pivot in self._transitions(s, ps, pe):
                        yield (prev, pivot)
                        prev = pivot
                    if prev < pe:
                        yield (prev, pe)
                else:
                    yield (ps, pe)

    def _merge(self, parts: list):
        """Insert merged alpha/digit-run tokens (intraword.py:385-437);
        a merged token takes position (last part's pos - 1) mid-list or
        the final pos at the end — reference quirk preserved."""
        mergewords, mergenums = self.mergewords, self.mergenums
        last = 0
        insertat = 0
        buf: list = []
        pos = 0

        def insert(buf, newpos):
            # reference quirk: its insert helper ignores the passed-in
            # index and always inserts at the running ``insertat``
            # (intraword.py:396-401) — including the final flush
            newtext = "".join(item[0] for item in buf)
            parts.insert(insertat, (newtext, newpos))

        for item in list(parts):
            text, pos = item
            if text.isalpha():
                this = 1
            elif text.isdigit():
                this = 2
            else:
                this = None
            if (buf and ((this == last == 1 and mergewords)
                         or (this == last == 2 and mergenums))):
                buf.append(item)
            else:
                if len(buf) > 1:
                    insert(buf, pos - 1)
                    insertat += 1
                buf = [item]
                last = this
            insertat += 1
        if len(buf) > 1:
            insert(buf, pos)

    def __call__(self, tokens):
        newpos = None
        for t in tokens:
            text = t.text
            if newpos is None:
                newpos = t.pos
            if ((text.isalpha() and (text.islower() or text.isupper()))
                    or text.isdigit()):
                t.pos = newpos
                yield t
                newpos += 1
            else:
                ranges = self._split(text)
                parts = [(text[sc:ec], i + newpos)
                         for i, (sc, ec) in enumerate(ranges)]
                if len(parts) > 1 and (self.mergewords or self.mergenums):
                    self._merge(parts)
                for ptext, ppos in parts:
                    nt = t.copy()
                    nt.text = ptext
                    nt.pos = ppos
                    yield nt
                if parts:
                    newpos = parts[-1][1] + 1


def intraword_filter(tokens, delims, splitwords, splitnums, mergewords,
                     mergenums):
    return _IntraWord(delims, splitwords, splitnums, mergewords,
                      mergenums)(tokens)


# ---- chain compilation

def compile_chain(chain: tuple, mode: str = "index"):
    """Compile a declarative chain into (tokenize_fn, [filter_fn, ...]).

    Chain items (kind, params):
      ("tokenizer", (pattern, gaps))            — must be first if present
      ("lowercase", ())        ("strip", ())    ("stem", ())
      ("pystemmer", (lang, ignore|None, cachesize))
      ("stemfn", (name, ignore|None, cachesize))  — porter/porter2/lovins/paicehusk
      ("stop", (words|None, minsize, maxsize, renumber))
      ("charset", items)                        — (ord, str) pairs
      ("substitute", (pattern, replacement))    — re.sub on token text
      ("reverse", ())                           — text[::-1]
      ("ngram", (minsize, maxsize, at|None))    — NgramFilter (mode-aware)
      ("intraword", (delims, sw, sn, mw, mn))
      ("biword", (sep,))      ("shingle", (size, sep))
      ("compound", (words, keep_compound))
      ("dmetaphone", (primary_boost, secondary_boost, combine))
      ("tee", (chain_a, chain_b, ...))          — interleave sub-chains
      ("multi", ((mode, chain), ...))           — pick sub-chain by mode
    """
    items = list(chain)
    pattern, gaps, tmode = r"\w+(?:\.?\w+)*", False, None
    if items and items[0][0] == "tokenizer":
        params = items[0][1]
        pattern, gaps = params[0], params[1]
        # optional third element: "path" = PathTokenizer semantics
        tmode = params[2] if len(params) > 2 else None
        items = items[1:]

    if pattern is None:
        # IDTokenizer semantics (tokenizers.py:47-71): the whole value
        # is one token; the empty string still indexes the term ''.
        # The reference emits pos = start_pos + 1 (:66-67), i.e. 1.
        def tokenize(text: str, with_chars: bool = False):
            if text is None:
                return iter(())
            t = str(text)
            if with_chars:
                return iter((Token(t, 1, startchar=0, endchar=len(t)),))
            return iter((Token(t, 1),))

        fns = [_compile_filter(kind, params, mode) for kind, params in items]
        return tokenize, [f for f in fns if f is not None]

    rex = re.compile(pattern, re.UNICODE)

    if tmode == "path":
        # PathTokenizer (tokenizers.py:320-337): the pattern matches
        # path COMPONENTS; each token is the cumulative prefix of the
        # value up to that component's end.
        def tokenize(text: str, with_chars: bool = False):
            if with_chars:
                raise ValueError("char offsets aren't defined for "
                                 "path-prefix tokens")
            t = text or ""
            return (Token(t[:m.end()], i)
                    for i, m in enumerate(rex.finditer(t)))

        fns = [_compile_filter(kind, params, mode) for kind, params in items]
        return tokenize, [f for f in fns if f is not None]

    def tokenize(text: str, with_chars: bool = False):
        if gaps:
            if with_chars:
                raise ValueError("char offsets need a non-gaps tokenizer")
            words = [w for w in rex.split(text or "") if w]
            return (Token(w, i) for i, w in enumerate(words))
        if with_chars:
            return (Token(m.group(0), i, startchar=m.start(), endchar=m.end())
                    for i, m in enumerate(rex.finditer(text or "")))
        words = rex.findall(text or "")
        return (Token(w, i) for i, w in enumerate(words))

    fns = [_compile_filter(kind, params, mode) for kind, params in items]
    fns = [f for f in fns if f is not None]
    return tokenize, fns


# Filters that preserve/adjust token char spans correctly (the reference
# leaves t.startchar/endchar pointing at the ORIGINAL text for text-only
# rewrites; stream-restructuring filters synthesize spans we don't model)
CHARS_SAFE_FILTERS = frozenset(
    ["lowercase", "strip", "stop", "charset", "delimited", "stem",
     "pystemmer", "stemfn", "substitute", "reverse"])


def chain_chars_safe(chain: tuple) -> bool:
    """True when every filter in the chain keeps char offsets exact."""
    for kind, _params in chain:
        if kind == "tokenizer":
            continue
        if kind not in CHARS_SAFE_FILTERS:
            return False
    return True


def _compile_filter(kind: str, params, mode: str):
    if kind == "pass":
        return None  # identity (reference PassFilter, filters.py:84-89)
    if kind == "logging":
        import logging

        lg = logging.getLogger("whoosh_ray.analysis")

        def _logging(tokens, _lg=lg):
            for t in tokens:
                _lg.debug(repr(t.text))
                yield t

        return _logging
    if kind == "lowercase":
        return lowercase_filter
    if kind == "strip":
        return strip_filter
    if kind == "stem":
        cache: dict = {}
        return lambda toks: stem_filter(toks, cache)
    if kind == "pystemmer":
        from whoosh_ray.functions.snowball import resolve_stemmer

        lang, ignore, cachesize = params
        stem_fn = resolve_stemmer(lang)
        ig = frozenset(ignore or ())
        pcache: dict = {}
        return lambda toks: pystemmer_filter(toks, stem_fn, ig, pcache,
                                             cachesize)
    if kind == "stemfn":
        # StemFilter(stemfn=...) with a named pure stemmer — the
        # declarative equivalent of passing lang.{porter2,lovins,
        # paicehusk}.stem to the reference filter (analysis/morph.py:
        # 57-111; the callable must be picklable there too)
        name, ignore, cachesize = params
        fn = resolve_stemfn(name)
        sig = frozenset(ignore or ())
        scache: dict = {}
        return lambda toks: pystemmer_filter(toks, fn, sig, scache,
                                             cachesize)
    if kind == "stop":
        words, minsize, maxsize, renumber = params
        ws = frozenset(words) if words is not None else None
        return lambda toks: stop_filter(toks, ws, minsize, maxsize, renumber)
    if kind == "charset":
        cm = dict(params)
        return lambda toks: charset_filter(toks, cm)
    if kind == "substitute":
        # SubstitutionFilter (filters.py:439-479): re.sub on token text;
        # char offsets keep pointing at the ORIGINAL text (reference
        # leaves them untouched for text-only rewrites)
        pat, rep = params
        srex = re.compile(pat)
        return lambda toks: substitution_filter(toks, srex, rep)
    if kind == "reverse":
        return reverse_text_filter
    if kind == "ngram":
        gmin, gmax, at = params
        return lambda toks: ngram_filter(toks, gmin, gmax, at, mode)
    if kind == "intraword":
        iw = _IntraWord(*params)
        return iw
    if kind == "biword":
        (sep,) = params
        return lambda toks: biword_filter(toks, sep)
    if kind == "shingle":
        size, sep = params
        return lambda toks: shingle_filter(toks, size, sep)
    if kind == "delimited":
        (delim,) = params
        return lambda toks: delimited_attribute_filter(toks, delim)
    if kind == "compound":
        words, keep = params
        ws = frozenset(words)
        return lambda toks: compound_word_filter(toks, ws, keep)
    if kind == "dmetaphone":
        from whoosh_ray.functions.dmetaphone import dmetaphone_filter

        pboost, sboost, combine = params
        cache: dict = {}
        return lambda toks: dmetaphone_filter(toks, pboost, sboost,
                                              combine, cache)
    if kind == "tee":
        sub = [compile_chain((("tokenizer", (r"\S+", False)),) + tuple(c),
                             mode)[1] for c in params]

        def tee(tokens, _subs=sub):
            """TeeFilter (filters.py:115-168): each sub-chain sees the
            whole stream; outputs interleave round-robin per token."""
            toks = list(tokens)
            iters = [_apply(fns, (t.copy() for t in toks))
                     for fns in _subs]
            active = list(iters)
            while active:
                nxt = []
                for it in active:
                    try:
                        yield next(it)
                        nxt.append(it)
                    except StopIteration:
                        pass
                active = nxt

        return tee
    if kind == "multi":
        chosen = None
        default = None
        for m, sub in params:
            if m == mode:
                chosen = sub
            if m == "default" or default is None:
                default = sub
        sub = chosen if chosen is not None else default
        fns = compile_chain((("tokenizer", (r"\S+", False)),) + tuple(sub),
                            mode)[1]
        return lambda toks: _apply(fns, toks)
    raise ValueError(f"unknown filter kind {kind!r}")


def _apply(fns, tokens):
    for f in fns:
        tokens = f(tokens)
    return tokens


def analyze_row(text: str, tokenize, fns) -> list[tuple[str, int]]:
    return [(t.text, t.pos) for t in _apply(fns, tokenize(text))]


def analyze_row_boosts(text: str, tokenize, fns) -> list[tuple[str, int, float]]:
    """analyze_row + per-token boost (DelimitedAttributeFilter carries
    the parsed ``word^boost`` value into posting weights, reference
    filters.py:375-436 + Frequency.word_values formats.py:182-196)."""
    return [(t.text, t.pos, t.boost) for t in _apply(fns, tokenize(text))]


def analyze_row_full(text: str, tokenize,
                     fns) -> list[tuple[str, int, float, int, int]]:
    """analyze_row_boosts + char spans: (text, pos, boost, startchar,
    endchar) per surviving token — the CharacterBoosts token stream
    (reference formats.py:415-481).  Requires a chars-safe chain
    (``chain_chars_safe``)."""
    return [(t.text, t.pos, t.boost, t.startchar, t.endchar)
            for t in _apply(fns, tokenize(text, with_chars=True))]
