"""Post-retrieval highlighting — fragment + format matched terms.

Reference pipeline (/root/reference/src/whoosh/highlight.py): retokenize
the stored text with char offsets keeping stopped tokens
(highlight_hit :1041-1048, removestops=False), mark query terms
(set_matched_filter :160-173), merge adjacent matched spans
(:963-988), fragment (WholeFragmenter :301, ContextFragmenter
:418-505), score fragments (BasicFragmentScorer :598-606: sum of
match boosts x 100 x distinct terms), keep the best ``top`` by
(score, fragment-startchar) via nlargest then re-sort by position
(top_fragments :880-886), and format (HtmlFormatter :750-818,
UppercaseFormatter :734-741, between="...").

The per-hit flow here is the same algorithm on the same token spans;
``highlight_batch`` runs it as a stateless map over the top-k hit rows
(analyzer compiled once), which is the Ray-side shape for highlighting
at scale (SURVEY.md §2.11).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace
from heapq import nlargest
from html import escape as htmlescape

DEFAULT_CHARLIMIT = 2 ** 15


@dataclass
class Token:
    text: str
    startchar: int
    endchar: int
    matched: bool = False
    boost: float = 1.0
    # set on query-derived tokens (Query.tokens/all_tokens); analysis
    # tokens leave it None
    fieldname: str | None = None


@dataclass
class Fragment:
    text: str
    matches: list
    startchar: int
    endchar: int
    matched_terms: frozenset = field(default_factory=frozenset)

    def __len__(self):
        return self.endchar - self.startchar

    def __lt__(self, other):
        return self.startchar < other.startchar


def _mkfrag(text, tokens, startchar=None, endchar=None) -> Fragment:
    if startchar is None:
        startchar = tokens[0].startchar if tokens else 0
    if endchar is None:
        endchar = tokens[-1].endchar if tokens else len(text)
    return Fragment(text, list(tokens), max(0, startchar),
                    min(len(text), endchar),
                    frozenset(t.text for t in tokens))


# public name (reference highlight.py:66-84)
mkfrag = _mkfrag


def get_text(original, token, replace):
    """Text to render for a match (reference highlight.py:634-645):
    the original slice, or the (possibly filtered) token text when
    ``replace``."""
    if replace:
        return token.text
    return original[token.startchar:token.endchar]


class Fragmenter:
    """Fragmenter plug-point base (reference highlight.py:264-298);
    subclass and override ``fragment_tokens`` (and
    ``must_retokenize`` -> False for span-driven fragmenters)."""

    charlimit = DEFAULT_CHARLIMIT

    def must_retokenize(self):
        return True

    def fragment_tokens(self, text, tokens):
        raise NotImplementedError

    def fragment_matches(self, text, matched_tokens):
        """Fragments from matched tokens alone — the chars-payload
        path (reference highlight.py:289-298); only span-driven
        fragmenters implement it."""
        raise NotImplementedError


def tokenize_chars(text: str, pattern: str = r"\w+(?:\.?\w+)*",
                   lowercase: bool = True) -> list[Token]:
    """Char-span tokens, stopwords KEPT (removestops=False semantics)."""
    out = []
    for m in re.finditer(pattern, text):
        t = m.group(0)
        out.append(Token(t.lower() if lowercase else t, m.start(), m.end()))
    return out


def analyzer_tokens(spec, text: str) -> list[Token] | None:
    """Char-span tokens through the FIELD'S analyzer with stopwords
    KEPT — the reference retokenizes with ``analyzer(text, chars=True,
    removestops=False)`` (highlight.py:1038-1040), so stemmed /
    charset-folded / substituted token TEXT matches query terms while
    the spans still point at the original text.  Returns None when the
    analyzer can't carry char offsets (ngram / charset / gaps
    tokenizers, numeric/boolean fields, stream-restructuring chains):
    callers fall back to the plain char tokenizer."""
    import re as _re

    if spec is None or spec.numeric is not None or spec.boolean:
        return None
    if spec.chain is not None:
        from whoosh_ray.functions.tokenfilters import (chain_chars_safe,
                                                       compile_chain)

        if not chain_chars_safe(spec.chain):
            return None
        # drop the stop stages: removestops=False keeps every token
        chain = tuple(st for st in spec.chain if st[0] != "stop")
        tokenize, fns = compile_chain(chain, mode=spec.mode)
        try:
            toks = tokenize(text or "", with_chars=True)
        except ValueError:
            return None
        for f in fns:
            toks = f(toks)
        return [Token(t.text, t.startchar, t.endchar) for t in toks
                if t.startchar is not None]
    if spec.ngram is not None or spec.charset_tokenize or spec.gaps:
        return None

    def transform(s: str) -> str:
        if spec.lowercase:
            s = s.lower()
        if spec.charmap:
            s = s.translate(dict(spec.charmap))
        if spec.strip:
            s = s.strip()
        if spec.substitute:
            s = _re.sub(spec.substitute[0], spec.substitute[1], s)
        if spec.stem or spec.lang:
            if spec.stem:
                from whoosh_ray.functions.porter import stem as stem_fn
            else:
                from whoosh_ray.functions.snowball import STEMMERS

                stem_fn = STEMMERS[spec.lang]
            s = stem_fn(s)
        if spec.reverse:
            s = s[::-1]
        return s

    if spec.pattern is None:
        # ID field: the whole value is one token
        t = text or ""
        return [Token(transform(t), 0, len(t))]
    return [Token(transform(m.group(0)), m.start(), m.end())
            for m in _re.finditer(spec.pattern, text or "", _re.UNICODE)]


def set_matched(tokens: list[Token], termset) -> list[Token]:
    for t in tokens:
        t.matched = t.text in termset
    return tokens


# public name (reference highlight.py:160-174); phrase-agnostic: every
# token whose text is in the term set is marked, even inside phrases
set_matched_filter = set_matched


def set_matched_filter_phrases(tokens, text, terms, phrases):
    """Strict-phrase matched-token marking (reference
    highlight.py:176-259): phrase constituents highlight only where the
    WHOLE phrase matches; individual query terms highlight everywhere.
    Alignment is by whitespace-split word index — the reference compares
    ``text.split()`` slots to token order, so punctuation-splitting
    analyzers can mis-align there and here alike.  ``terms`` are Term
    objects (or strings), ``phrases`` Phrase objects (.words/.slop)."""
    words = text.split()
    matches: set[int] = set()

    for phrase in phrases:
        i = 0
        pwords = list(phrase.words)
        n = len(pwords)
        slop = phrase.slop
        while i < len(words):
            if pwords[0] == words[i]:
                if slop == 1:
                    if words[i + 1:i + n] == pwords[1:]:
                        matches.update(range(i, i + n))
                        i += n
                    else:
                        i += 1
                else:
                    # sloppy scan: for each next phrase word take the
                    # LAST occurrence inside the slop window (reference
                    # reversed-substring probe, highlight.py:229-241)
                    if n == 1:
                        # the reference loops forever here (i never
                        # advances); no behavior to match — advance
                        matches.add(i)
                        i += 1
                        continue
                    cur = first = last = i
                    slop_matches = [first]
                    for word in pwords[1:]:
                        sub = words[cur + 1:cur + 1 + slop][::-1]
                        try:
                            nxt = len(sub) - sub.index(word) - 1
                        except ValueError:
                            i += 1
                            break
                        last = cur + nxt + 1
                        slop_matches.append(last)
                        cur = last
                    else:
                        i = last
                        matches.update(slop_matches)
            else:
                i += 1

    termtexts = {getattr(t, "text", t) for t in terms}
    for i, word in enumerate(words):
        if word in termtexts:
            matches.add(i)

    for i, t in enumerate(tokens):
        t.matched = i in matches
    return tokens


def merge_matched(tokens: list[Token]) -> list[Token]:
    """Merge consecutive/overlapping matched tokens (highlight.py:963-988)."""
    out: list[Token] = []
    token: Token | None = None
    for t in tokens:
        if not t.matched:
            if token is not None:
                out.append(token)
                token = None
            out.append(t)
            continue
        if token is None:
            token = replace(t)
        elif t.startchar <= token.endchar:
            if t.endchar > token.endchar:
                token.text += t.text[token.endchar - t.endchar:]
                token.endchar = t.endchar
        else:
            out.append(token)
            token = None
            out.append(t)
    if token is not None:
        out.append(token)
    return out


class WholeFragmenter(Fragmenter):
    """The whole text is one fragment (highlight.py:301-320)."""

    charlimit = DEFAULT_CHARLIMIT

    # reference Fragmenter.must_retokenize (highlight.py:267-273):
    # True for every fragmenter except Pinpoint — a True fragmenter
    # needs the full token stream, so stored char spans can't feed it
    def must_retokenize(self):
        return True

    def fragment_tokens(self, text, tokens):
        charlimit = self.charlimit
        matched = [t for t in tokens
                   if t.matched and (not charlimit or t.endchar <= charlimit)]
        return [_mkfrag(text, matched, startchar=0, endchar=len(text))]


class SentenceFragmenter(Fragmenter):
    """Sentence-boundary fragments (highlight.py:343-417): a sentence ends
    where the char after a token is in ``sentencechars`` (runs of
    punctuation like "..." do not break); sentences with matches and
    length <= maxchars become fragments."""

    def __init__(self, maxchars: int = 200, sentencechars: str = ".!?",
                 charlimit: int = DEFAULT_CHARLIMIT):
        self.maxchars = maxchars
        self.sentencechars = frozenset(sentencechars)
        self.charlimit = charlimit

    def must_retokenize(self):
        return True

    def fragment_tokens(self, text, tokens):
        out = []
        textlen = len(text)
        first = None
        tks: list[Token] = []
        endchar = None
        currentlen = 0
        for t in tokens:
            startchar, endchar = t.startchar, t.endchar
            if self.charlimit and endchar > self.charlimit:
                break
            if first is None:
                first = startchar
                currentlen = 0
            currentlen += endchar - startchar
            if t.matched:
                tks.append(replace(t))
            if endchar < textlen and text[endchar] in self.sentencechars:
                if (endchar + 1 < textlen
                        and text[endchar + 1] in self.sentencechars):
                    continue
                if tks and currentlen <= self.maxchars:
                    out.append(_mkfrag(text, tks, startchar=first,
                                       endchar=endchar))
                tks = []
                first = None
                currentlen = 0
        if tks:
            out.append(_mkfrag(text, tks, startchar=first, endchar=endchar))
        return out


class ContextFragmenter(Fragmenter):
    """Matched terms + surrounding context (highlight.py:418-505)."""

    def __init__(self, maxchars: int = 200, surround: int = 20,
                 charlimit: int = DEFAULT_CHARLIMIT):
        self.maxchars = maxchars
        self.surround = surround
        self.charlimit = charlimit

    def must_retokenize(self):
        return True

    def fragment_tokens(self, text, tokens):
        from collections import deque

        maxchars, surround, charlimit = (self.maxchars, self.surround,
                                         self.charlimit)
        out = []
        first = None
        firsts: deque = deque()
        countdown = -1
        tks: list[Token] = []
        endchar = None
        currentlen = 0
        for t in tokens:
            startchar, endchar = t.startchar, t.endchar
            tlength = endchar - startchar
            if charlimit and endchar > charlimit:
                break
            if countdown < 0 and not t.matched:
                firsts.append(startchar)
                while firsts and endchar - firsts[0] > surround:
                    firsts.popleft()
            elif currentlen + tlength > maxchars:
                countdown = 0
            elif t.matched:
                countdown = surround
                if first is None:
                    if firsts:
                        first = firsts[0]
                    else:
                        first = startchar
                        countdown += surround
                tks.append(replace(t))
            if countdown >= 0:
                currentlen += tlength
                countdown -= tlength
                if countdown <= 0:
                    out.append(_mkfrag(text, tks, startchar=first,
                                       endchar=endchar))
                    tks = []
                    firsts = deque()
                    first = None
                    currentlen = 0
        if tks:
            out.append(_mkfrag(text, tks, startchar=first, endchar=endchar))
        return out


# the reference ships this misspelled alias (highlight.py:340)
NullFragmeter = WholeFragmenter


class PinpointFragmenter(Fragmenter):
    """Builds fragments directly from matched-term char spans without
    scanning unmatched tokens (highlight.py:506-590).  The reference
    feeds it char offsets stored in the index (Characters format); here
    the same spans come from the char-offset retokenization the
    reference itself falls back to when the index lacks them — the
    fragment geometry is identical."""

    def __init__(self, maxchars: int = 200, surround: int = 20,
                 autotrim: bool = False, charlimit: int = DEFAULT_CHARLIMIT):
        self.maxchars = maxchars
        self.surround = surround
        self.autotrim = autotrim
        self.charlimit = charlimit

    def must_retokenize(self):
        # the one fragmenter that works from matched spans alone
        # (reference highlight.py:521-523)
        return False

    @staticmethod
    def _autotrim(fragment: Fragment) -> None:
        text = fragment.text
        startchar, endchar = fragment.startchar, fragment.endchar
        firstspace = text.find(" ", startchar, endchar)
        if firstspace > 0:
            startchar = firstspace + 1
        lastspace = text.rfind(" ", startchar, endchar)
        if lastspace > 0:
            endchar = lastspace
        if fragment.matches:
            startchar = min(startchar, fragment.matches[0].startchar)
            endchar = max(endchar, fragment.matches[-1].endchar)
        fragment.startchar = startchar
        fragment.endchar = endchar

    def fragment_matches(self, text, tokens):
        """Chars-payload entry (reference highlight.py:556-590):
        identical geometry — fragment_tokens only reads the matched
        tokens anyway."""
        for t in tokens:
            t.matched = True
        return self.fragment_tokens(text, tokens)

    def fragment_tokens(self, text, tokens):
        matched = [t for t in tokens if t.matched]
        out = []
        j = -1
        for i, t in enumerate(matched):
            if j >= i:
                continue
            j = i
            left = t.startchar
            right = t.endchar
            if self.charlimit and right > self.charlimit:
                break
            currentlen = right - left
            while j < len(matched) - 1 and currentlen < self.maxchars:
                nxt = matched[j + 1]
                ec = nxt.endchar
                if (ec - right <= self.surround
                        and ec - left <= self.maxchars):
                    j += 1
                    right = ec
                    currentlen += ec - nxt.startchar
                else:
                    break
            left = max(0, left - self.surround)
            right = min(len(text), right + self.surround)
            frag = Fragment(text, matched[i:j + 1], left, right,
                            frozenset(tk.text for tk in matched[i:j + 1]))
            if self.autotrim:
                self._autotrim(frag)
            out.append(frag)
        return out


def basic_fragment_scorer(f: Fragment) -> float:
    score = sum(t.boost for t in f.matches)
    score *= (len(f.matched_terms) * 100) or 1
    return score


class FragmentScorer:
    """Scorer plug-point base (reference highlight.py:594-595)."""


class BasicFragmentScorer(FragmentScorer):
    """Class form of the default scorer (reference
    highlight.py:598-606): boost sum x 100-per-distinct-term."""

    def __call__(self, f: Fragment) -> float:
        return basic_fragment_scorer(f)


# fragment sort orders (reference highlight.py:610-630): pass as
# ``order=`` / ``results.order = ...``.  SCORE is a constant key — with
# a stable sort that preserves the nlargest (score-descending) order
def SCORE(fragment):
    return 1


def FIRST(fragment):
    return fragment.startchar


def LONGER(fragment):
    return 0 - len(fragment)


def SHORTER(fragment):
    return len(fragment)


def top_fragments(fragments, count, scorer=basic_fragment_scorer,
                  order=FIRST, minscore=1):
    scored = ((scorer(f), f) for f in fragments)
    best = nlargest(count, scored)
    best = [f for score, f in best if score >= minscore]
    best.sort(key=order)
    return best


class Formatter:
    between = "..."

    def _text(self, text):
        return text

    def format_token(self, text, token, replace=False):
        raise NotImplementedError

    def format_fragment(self, fragment: Fragment, replace=False) -> str:
        """``replace=True`` renders each match's ``token.text`` instead
        of the original slice (the Correction.format_string currency,
        reference highlight.py:683-723)."""
        output = []
        index = fragment.startchar
        text = fragment.text
        for t in fragment.matches:
            if t.startchar is None or t.startchar < index:
                continue
            if t.startchar > index:
                output.append(self._text(text[index:t.startchar]))
            output.append(self.format_token(text, t, replace))
            index = t.endchar
        output.append(self._text(text[index:fragment.endchar]))
        return "".join(output)

    def format(self, fragments) -> str:
        return self.between.join(self.format_fragment(f) for f in fragments)


class NullFormatter(Formatter):
    """Returns matched fragments without marking the hits (reference
    highlight.py:726-731)."""

    def format_token(self, text, token, replace=False):
        return get_text(text, token, replace)


class UppercaseFormatter(Formatter):
    def format_token(self, text, token, replace=False):
        return get_text(text, token, replace).upper()


class HtmlFormatter(Formatter):
    """Parity with highlight.py:750-818 (term classes recycled mod
    maxclasses, html-escaped text)."""

    template = '<%(tag)s class=%(q)s%(cls)s%(tn)s%(q)s>%(t)s</%(tag)s>'

    def __init__(self, tagname="strong", between="...", classname="match",
                 termclass="term", maxclasses=5, attrquote='"'):
        self.between = between
        self.tagname = tagname
        self.classname = classname
        self.termclass = termclass
        self.attrquote = attrquote
        self.maxclasses = maxclasses
        self.seen: dict[str, int] = {}

    def clean(self):
        """Clear the term -> classname map so a reused formatter
        restarts numbering (reference highlight.py:815-818)."""
        self.seen = {}

    def _text(self, text):
        return htmlescape(text, quote=False)

    def format_token(self, text, token, replace=False):
        # parity: classes are keyed by the DISPLAYED (original-case) text,
        # so "Deploy" and "deploy" get different term classes, and the
        # mapping persists across hits of one result set (highlight.py:802-813)
        seen = self.seen
        ttext = self._text(get_text(text, token, replace))
        if ttext in seen:
            termnum = seen[ttext]
        else:
            termnum = len(seen) % self.maxclasses
            seen[ttext] = termnum
        return self.template % {
            "tag": self.tagname, "q": self.attrquote,
            "cls": self.classname + " " + self.termclass, "tn": termnum,
            "t": ttext,
        }


class GenshiFormatter(Formatter):
    """Genshi event-stream formatter (reference highlight.py:821-875).

    Optional-backend facade in the PyStemmerFilter pattern: the
    constructor imports ``genshi.core`` and raises ImportError when the
    package is absent (exactly the reference behavior — genshi is not
    in this container, so tests drive it with an injected stand-in
    module).  Event-stream parity is exact, INCLUDING the reference's
    shipped bug: ``format_fragment`` appends the raw ``(text, token,
    replace)`` 3-tuple into the event list for every matched token
    (highlight.py:861) instead of the token's formatted START/TEXT/END
    events, so match positions surface as malformed events.  Pinned,
    like DFree/Roaring."""

    def __init__(self, qname="strong", between="..."):
        self.qname = qname
        self.between = between
        from genshi.core import END, START, TEXT, Attrs, Stream

        self.START, self.END, self.TEXT = START, END, TEXT
        self.Attrs, self.Stream = Attrs, Stream

    def _add_text(self, text, output):
        if output and output[-1][0] == self.TEXT:
            output[-1] = (self.TEXT, output[-1][1] + text, output[-1][2])
        else:
            output.append((self.TEXT, text, (None, -1, -1)))

    def format_token(self, text, token, replace=False):
        qn = self.qname
        txt = (token.text if replace
               else text[token.startchar:token.endchar])
        return self.Stream([
            (self.START, (qn, self.Attrs()), (None, -1, -1)),
            (self.TEXT, txt, (None, -1, -1)),
            (self.END, qn, (None, -1, -1)),
        ])

    def format_fragment(self, fragment: Fragment, replace=False):
        output = []
        index = fragment.startchar
        text = fragment.text
        for t in fragment.matches:
            if t.startchar > index:
                self._add_text(text[index:t.startchar], output)
            output.append((text, t, replace))  # reference bug, pinned
            index = t.endchar
        if index < len(text):
            self._add_text(text[index:], output)
        return self.Stream(output)

    def format(self, fragments, replace=False):
        output = []
        first = True
        for fragment in fragments:
            if not first:
                self._add_text(self.between, output)
            output += self.format_fragment(fragment, replace=replace)
            first = False
        return self.Stream(output)


class Highlighter:
    def __init__(self, fragmenter=None, scorer=None, formatter=None,
                 order=FIRST, always_retokenize: bool = False):
        self.fragmenter = fragmenter or ContextFragmenter()
        self.scorer = scorer or basic_fragment_scorer
        self.formatter = formatter or HtmlFormatter(tagname="b")
        self.order = order
        self.always_retokenize = always_retokenize

    def can_load_chars(self, results, fieldname: str) -> bool:
        """Whether matched-term char spans can come straight from the
        index — no re-tokenize (reference highlight.py:920-937: needs
        matched terms, a span-capable fragmenter, and a chars=True
        field)."""
        if self.always_retokenize:
            return False
        if not results.has_matched_terms():
            return False
        if getattr(self.fragmenter, "must_retokenize", lambda: True)():
            return False
        try:
            spec = results.searcher.schema.field(fieldname)
        except KeyError:
            return False
        return bool(getattr(spec, "chars", False))

    def highlight_hit(self, hitobj, fieldname: str, text: str | None = None,
                      top: int = 3, minscore: int = 1,
                      strict_phrase: bool = False) -> str:
        """Highlights for one Hit using THIS highlighter's config
        (reference highlight.py:990-1060; Hit.highlights delegates the
        chars-vs-retokenize branch to the same gates can_load_chars
        describes)."""
        return hitobj.highlights(fieldname, top=top, text=text,
                                 minscore=minscore,
                                 strict_phrase=strict_phrase,
                                 fragmenter=self.fragmenter,
                                 formatter=self.formatter,
                                 scorer=self.scorer, order=self.order)

    def highlight(self, text: str, terms, top: int = 3,
                  minscore: int = 1, phrases=None, tokens=None) -> str:
        """``phrases`` switches on strict-phrase marking (the reference
        ``strict_phrase=True`` path, highlight.py:1043-1045): phrase
        constituents highlight only where the whole phrase matches;
        ``terms`` then marks the stray individual terms.  ``tokens``
        supplies a pre-analyzed char-span stream (analyzer_tokens) —
        the field-analyzer retokenize path; default is the plain char
        tokenizer."""
        words = frozenset(terms)
        if tokens is None:
            tokens = tokenize_chars(text)
        if phrases is not None:
            tokens = set_matched_filter_phrases(tokens, text, words,
                                                phrases)
        else:
            tokens = set_matched(tokens, words)
        tokens = merge_matched(tokens)
        fragments = self.fragmenter.fragment_tokens(text, tokens)
        fragments = top_fragments(fragments, top, self.scorer, self.order,
                                  minscore=minscore)
        return self.formatter.format(fragments)

    def highlight_spans(self, text: str, spans, top: int = 3,
                        minscore: int = 1) -> str:
        """Highlight from precomputed matched (startchar, endchar)
        spans — the Characters-payload path (Searcher.char_offsets):
        no re-tokenization of the stored text.  Geometry-identical to
        :meth:`highlight` when used with span-driven fragmenters
        (PinpointFragmenter)."""
        tokens = [Token(text=text[sc:ec].lower(), startchar=sc,
                        endchar=ec, matched=True)
                  for sc, ec in sorted(set(map(tuple, spans)))]
        fragments = self.fragmenter.fragment_tokens(text, tokens)
        fragments = top_fragments(fragments, top, self.scorer, self.order,
                                  minscore=minscore)
        return self.formatter.format(fragments)


def highlight_batch(texts, terms, top: int = 3, **kwargs) -> list[str]:
    """Highlight a batch of stored texts (the map_batches body for
    highlighting top-k hit rows)."""
    hl = Highlighter(**kwargs)
    return [hl.highlight(t or "", terms, top=top) for t in texts]


def highlight(text: str, terms, fragmenter=None, formatter=None,
              top: int = 3, scorer=None, minscore: int = 1,
              order=None) -> str:
    """Module-level one-shot highlight — the reference's convenience
    entry point (highlight.py:888-905); the analyzer is the engine's
    standard char-span tokenizer."""
    kw = {"fragmenter": fragmenter, "scorer": scorer,
          "formatter": formatter}
    if order is not None:
        kw["order"] = order
    return Highlighter(**kw).highlight(text, terms, top=top,
                                       minscore=minscore)
