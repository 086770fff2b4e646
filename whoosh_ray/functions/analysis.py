"""Vectorized analysis chain — StandardAnalyzer parity over Arrow batches.

The reference analyzes text with a generator-of-tokens chain; the flagship
``StandardAnalyzer`` is RegexTokenizer | LowercaseFilter | StopFilter
(/root/reference/src/whoosh/analysis/analyzers.py:171-194) with

- token pattern ``\\w+(\\.?\\w+)*``  (analysis/tokenizers.py:33),
- the default STOP_WORDS set        (analysis/filters.py:41-45),
- ``minsize=2`` minimum token length (analysis/filters.py:259),
- positions renumbered over surviving tokens (analysis/filters.py:300-311).

This module reproduces those semantics as *batch* transforms: one call
tokenizes every row of an Arrow/pandas batch and returns flat numpy arrays
(row id, term, position) ready to explode into posting rows.  The only hot
Python-level loop is the per-row ``findall`` (regex iteration is inherently
per-string); everything downstream — stopword masking, position
renumbering, (row, term) tf aggregation — is numpy/pandas vectorized.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

# Reference parity: analysis/filters.py:41-45
STOP_WORDS = frozenset(
    (
        "a", "an", "and", "are", "as", "at", "be", "by", "can", "for", "from",
        "have", "if", "in", "is", "it", "may", "not", "of", "on", "or", "tbd",
        "that", "the", "this", "to", "us", "we", "when", "will", "with",
        "yet", "you", "your",
    )
)

# Reference parity: analysis/tokenizers.py:33 — ``\w+(\.?\w+)*``; the group is
# made non-capturing (identical match semantics) so ``findall`` yields whole
# matches.
DEFAULT_PATTERN = re.compile(r"\w+(?:\.?\w+)*", re.UNICODE)


@dataclass(frozen=True)
class AnalyzerSpec:
    """Configuration of a vectorized analyzer chain (standard preset).

    ``lowercase``/``stopwords``/``minsize``/``maxsize`` mirror the
    LowercaseFilter/StopFilter stages; setting ``stopwords=None`` and
    ``minsize=0`` yields SimpleAnalyzer (analyzers.py:131-143) semantics.
    ``stem`` appends a Porter StemFilter (analysis/morph.py:35-151, with
    the same per-analyzer memo cache); ``substitute`` a
    SubstitutionFilter (filters.py:439-479); ``reverse`` a
    ReverseTextFilter (filters.py:201-212); ``strip`` a StripFilter.
    """

    pattern: str = r"\w+(?:\.?\w+)*"
    lowercase: bool = True
    stopwords: frozenset[str] | None = STOP_WORDS
    minsize: int = 2
    maxsize: int | None = None
    gaps: bool = False  # RegexTokenizer(gaps=True): pattern splits instead
    stem: bool = False
    # LanguageAnalyzer (analyzers.py:253-296): snowball stemmer for the
    # given two-letter language code (currently "de"/"es" — fuzz-tested
    # output parity with the reference's shipped stemmers); combine
    # with per-language stopwords via language_analyzer()
    lang: str | None = None
    substitute: tuple[str, str] | None = None  # (pattern, replacement)
    reverse: bool = False
    strip: bool = False
    # n-gram emission (analysis/ngrams.py:37-221): mode "text" slides the
    # window over the raw text (NgramTokenizer; pattern ignored), mode
    # "words" explodes each token into its grams (NgramFilter) keeping the
    # word's position
    ngram: tuple[int, int] | None = None
    ngram_mode: str = "words"
    # CharsetFilter (filters.py:323-372): translate token text through a
    # charmap (e.g. charset.accent_items() for accent folding); applied
    # after LowercaseFilter, before StopFilter.  With
    # ``charset_tokenize=True`` the charmap drives a CharsetTokenizer
    # (tokenizers.py:187-290) instead of the regex pattern: unmapped /
    # None-mapped characters break tokens, mapped characters translate
    # (incl. the reference's untranslated-final-token quirk).
    charmap: tuple | None = None  # tuple of (ord, replacement)
    charset_tokenize: bool = False
    # Generic per-row filter chain (functions/tokenfilters.py) for the
    # stream-restructuring filters (IntraWord/CompoundWord/BiWord/
    # Shingle/Tee/Multi).  When set it REPLACES the vectorized flag
    # pipeline above; mode ("index"/"query") selects MultiFilter
    # sub-chains.
    chain: tuple | None = None
    mode: str = "index"
    # Tiered numeric indexing (fields.py:658-671 semantics, own byte
    # format): ``numeric=(bits, step)`` emits, per value v (offset to
    # unsigned), one term per tier: "{shift:02d}:{v >> shift:x}".  A
    # NumericRange over such a field expands to the minimal covering
    # term set instead of scanning the stored column.
    numeric: tuple | None = None
    # BOOLEAN field (fields.py:910-977): values index as "t"/"f".
    # Index mode: strings are true iff lower() is in the trues set
    # (BOOLEAN.index); query mode: trues -> t, falses -> f, any OTHER
    # non-empty string -> bool(x) == True (the reference's
    # _obj_to_bool index/query asymmetry, kept on purpose).
    boolean: bool = False

    def compile(self) -> "VectorAnalyzer":
        return VectorAnalyzer(self)

    #: a spec is never ITSELF a morph filter (reference acore.py:138)
    is_morph = False

    def has_morph(self) -> bool:
        """Whether any component morphs token text — stemmers /
        metaphone (reference analyzers.py:111-112)."""
        if self.stem or self.lang:
            return True
        if self.chain:
            morph = {"stem", "stemfn", "pystemmer", "dmetaphone"}
            return any(st[0] in morph for st in self.chain)
        return False

    def to_chain(self) -> tuple:
        """Materialize the vectorized flag pipeline as the equivalent
        declarative chain (functions/tokenfilters.py stage tuples) —
        the reference's CompositeAnalyzer item list.  Raises TypeError
        for flags the chain engine has no stage kind for."""
        for flag in ("substitute", "reverse", "ngram", "numeric"):
            if getattr(self, flag):
                raise TypeError(
                    f"AnalyzerSpec.{flag} has no chain-stage equivalent")
        if self.charset_tokenize or self.boolean or self.lang:
            raise TypeError("charset_tokenize/boolean/lang specs cannot "
                            "materialize as a chain")
        if self.chain is not None:
            return tuple(self.chain)
        out: list = [("tokenizer", (self.pattern, self.gaps))]
        if self.lowercase:
            out.append(("lowercase", ()))
        if self.charmap:
            out.append(("charset", tuple(self.charmap)))
        if self.strip:
            out.append(("strip", ()))
        if self.stopwords is not None or self.minsize or self.maxsize:
            out.append(("stop", (self.stopwords, self.minsize,
                                 self.maxsize, True)))
        if self.stem:
            out.append(("stem", ()))
        return tuple(out)

    def __or__(self, stage) -> "AnalyzerSpec":
        """Reference ``tokenizer | filter`` composition sugar
        (analysis/acore.py:137-145): a NEW spec whose chain is this
        spec's stages plus the given ("kind", params) stage — or a
        tuple of such stages (a pre-composed filter chain)."""
        import dataclasses

        def _is_stage(s):
            return (isinstance(s, tuple) and len(s) == 2
                    and isinstance(s[0], str))

        if _is_stage(stage):
            stages = (stage,)
        elif (isinstance(stage, tuple) and stage
              and all(_is_stage(s) for s in stage)):
            stages = tuple(stage)
        else:
            raise TypeError(
                "compose with a ('kind', params) chain stage tuple")
        if self.ngram is not None and self.chain is None:
            # NgramTokenizer | LowercaseFilter — the composition
            # NgramAnalyzer uses (ngrams.py:223-233); other filters
            # can't ride the vectorized ngram path
            if all(k == "lowercase" for k, _ in stages):
                return dataclasses.replace(self, lowercase=True)
            raise TypeError(
                "only LowercaseFilter composes onto NgramTokenizer")
        return dataclasses.replace(self, chain=self.to_chain() + stages)


# ISO-639 aliases accepted by the reference's language registry
# (lang/__init__.py:46-85): 3-letter codes, English names, native names.
LANG_ALIASES = {
    "ara": "ar", "dan": "da", "nld": "nl", "eng": "en", "fin": "fi",
    "fra": "fr", "deu": "de", "hun": "hu", "ita": "it", "nor": "no",
    "por": "pt", "ron": "ro", "rus": "ru", "spa": "es", "swe": "sv",
    "tur": "tr",
    "arabic": "ar", "danish": "da", "dutch": "nl", "english": "en",
    "finnish": "fi", "french": "fr", "german": "de", "hungarian": "hu",
    "italian": "it", "norwegian": "no", "portuguese": "pt",
    "romanian": "ro", "russian": "ru", "spanish": "es", "swedish": "sv",
    "turkish": "tr",
    "العربية": "ar", "dansk": "da", "nederlands": "nl", "suomi": "fi",
    "français": "fr", "deutsch": "de", "magyar": "hu", "italiano": "it",
    "norsk": "no", "português": "pt", "русский язык": "ru",
    "español": "es", "svenska": "sv", "türkçe": "tr",
}


def language_analyzer(lang: str) -> AnalyzerSpec:
    """LanguageAnalyzer preset (reference analyzers.py:253-296):
    RegexTokenizer | LowercaseFilter | StopFilter(per-language list) |
    StemFilter.  Degrades exactly like the reference: a language
    without a stop list (ro, ar) skips the StopFilter (and with it the
    minsize-2 floor), one without a stemmer (tr) skips the StemFilter,
    and an unknown language yields a plain lowercasing tokenizer
    rather than raising.  Stemming parity (functions/snowball.py +
    functions/isri.py, fuzz-matched) covers all 15 stemmed languages."""
    from whoosh_ray.functions.lang_stopwords_data import STOPLISTS
    from whoosh_ray.functions.snowball import STEMMERS

    lang = LANG_ALIASES.get(lang, lang)
    has_stop = lang in STOPLISTS
    # the reference builds StopFilter(lang=lang), whose stoplist=
    # STOP_WORDS default stays in place and the language list is
    # ADDED (filters.py:271-288) — so English stopwords drop too
    return AnalyzerSpec(
        stopwords=(frozenset(STOPLISTS[lang]) | STOP_WORDS) if has_stop
        else None,
        minsize=2 if has_stop else 0,
        lang=lang if lang in STEMMERS else None)


# Chain-stage kinds that transform word FORMS — the reference's
# is_morph=True filters (StemFilter + subclasses analysis/morph.py:71,
# DoubleMetaphoneFilter morph.py:227, IntraWordFilter intraword.py:280).
# analyzer(value, no_morph=True) skips exactly these top-level stages
# (analyzers.py:91); sub-chains inside multi/tee are NOT filtered, like
# the reference (MultiFilter is not is_morph and no_morph does not
# propagate into wrapped filters).
MORPH_KINDS = frozenset({
    "stem", "stemfn", "porter", "porter2", "lovins", "paicehusk",
    "pystemmer", "dmetaphone", "intraword",
})


def analyzer_has_morph(spec: "AnalyzerSpec") -> bool:
    """CompositeAnalyzer.has_morph (reference analyzers.py:111-112)."""
    if spec.stem or spec.lang:
        return True
    if spec.chain:
        return any(st and st[0] in MORPH_KINDS for st in spec.chain)
    return False


def analyzer_no_morph(spec: "AnalyzerSpec") -> "AnalyzerSpec":
    """The same chain with every morphological stage removed — what the
    reference's ``analyzer(value, no_morph=True)`` call runs
    (analyzers.py:88-93).  Used by separate-spelling subfields
    (FieldType.spellable_words, fields.py:299-315)."""
    import dataclasses as _dc

    kw: dict = {}
    if spec.stem:
        kw["stem"] = False
    if spec.lang:
        kw["lang"] = None
    if spec.chain:
        kw["chain"] = tuple(st for st in spec.chain
                            if not (st and st[0] in MORPH_KINDS))
    return _dc.replace(spec, **kw) if kw else spec


STANDARD = AnalyzerSpec()
SIMPLE = AnalyzerSpec(stopwords=None, minsize=0)
#: whole value as one term, case KEPT — the reference ID field uses
#: IDAnalyzer() whose default is lowercase=False (analyzers.py:117,
#: fields.py:472); mixed-case IDs index and query case-sensitively
ID_ANALYZER = AnalyzerSpec(pattern=None, stopwords=None, minsize=0,
                           lowercase=False)
# StemmingAnalyzer preset (analyzers.py:197-226): Standard chain + porter
STEMMING = AnalyzerSpec(stem=True)
KEYWORD = AnalyzerSpec(pattern=r"[^ \t\r\n]+", lowercase=False,
                       stopwords=None, minsize=0)  # SpaceSeparatedTokenizer
COMMA_SEPARATED = AnalyzerSpec(pattern=r"[^,]+", lowercase=False,
                               stopwords=None, minsize=0, strip=True)
# PathTokenizer (tokenizers.py:320-337): prefixes of a /-path
PATH = AnalyzerSpec(chain=(("tokenizer", (r"[^/]+", False, "path")),))
# FancyAnalyzer (analyzers.py:229-254): whitespace-gaps tokenizer |
# IntraWordFilter | LowercaseFilter | StopFilter — stream parity with
# the reference incl. IntraWord's quirks (test_tokenfilters)
FANCY = AnalyzerSpec(chain=(
    ("tokenizer", (r"\s+", True)),
    ("intraword", ("-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+",
                   True, True, False, False)),
    ("lowercase", ()),
    ("stop", (tuple(sorted(STOP_WORDS)), 2, None, True)),
))


@dataclass
class TokenizedBatch:
    """Flat token arrays for one batch of documents."""

    row_ids: np.ndarray   # int64, index into the batch, one per surviving token
    terms: np.ndarray     # object array of str
    positions: np.ndarray  # int32, renumbered position within its row
    row_lengths: np.ndarray  # int64 per input row: surviving token count
    # optional per-token attributes: boosts (DelimitedAttributeFilter —
    # None means all 1.0) and char spans (Characters format — None when
    # not requested)
    boosts: np.ndarray | None = None       # float64
    startchars: np.ndarray | None = None   # int64
    endchars: np.ndarray | None = None     # int64


class VectorAnalyzer:
    """Compiled analyzer: texts column -> flat (row, term, pos) arrays.

    Stateless and picklable; compiled once per actor/worker process when
    used inside ``map_batches`` callable classes.
    """

    def __init__(self, spec: AnalyzerSpec = STANDARD):
        self.spec = spec
        self._re = re.compile(spec.pattern, re.UNICODE) if spec.pattern else None
        self._sub = (re.compile(spec.substitute[0]) if spec.substitute
                     else None)
        self._stem_cache: dict[str, str] = {}
        self._chain = None
        if spec.chain is not None:
            from whoosh_ray.functions.tokenfilters import compile_chain

            self._chain = compile_chain(spec.chain, mode=spec.mode)
        self._charmap = dict(spec.charmap) if spec.charmap else None
        self._breakmap = None
        if spec.charset_tokenize:
            from whoosh_ray.functions.charset import compile_breakmap

            if self._charmap is None:
                raise ValueError("charset_tokenize requires a charmap")
            self._breakmap = compile_breakmap(self._charmap)

    def token_lists(self, texts) -> list[list[str]]:
        """Per-row surviving token lists (lowercased, stopped)."""
        tb = self(texts)
        out: list[list[str]] = []
        cuts = np.concatenate(([0], np.cumsum(tb.row_lengths)))
        terms = tb.terms
        for i in range(len(cuts) - 1):
            out.append(list(terms[cuts[i]: cuts[i + 1]]))
        return out

    def __call__(self, texts, with_chars: bool = False) -> TokenizedBatch:
        spec = self.spec
        if isinstance(texts, pd.Series):
            texts = texts.to_numpy()
        if spec.numeric is not None:
            return self._numeric_call(texts)
        if spec.boolean:
            return self._boolean_call(texts)
        if self._chain is not None:
            if with_chars:
                from whoosh_ray.functions.tokenfilters import chain_chars_safe

                if not chain_chars_safe(spec.chain):
                    raise ValueError(
                        "char-offset payloads through a filter chain need "
                        "a chars-safe chain (text-only rewrites); "
                        "stream-restructuring filters don't carry spans")
            return self._chain_call(texts, with_chars=with_chars)
        if spec.ngram is not None:
            return self._ngram_call(texts)
        n = len(texts)
        token_lists: list[list[str]] = []
        span_lists: list = []
        counts = np.empty(n, dtype=np.int64)
        if with_chars and (self._breakmap is not None or self._re is None
                           or spec.gaps):
            raise ValueError(
                "char-offset payloads are supported on the regex "
                "tokenizer path only (Characters format)")
        if self._breakmap is not None:
            from whoosh_ray.functions.charset import charset_tokenize_row

            bm = self._breakmap
            for i, t in enumerate(texts):
                toks = charset_tokenize_row(t or "", bm)
                token_lists.append(toks)
                counts[i] = len(toks)
        elif self._re is None:
            # IDTokenizer semantics: whole value is one token.  A NULL
            # value is a skipped field (reference add_document drops
            # None fields, writing.py:488-492) but a REAL empty string
            # indexes the term '' exactly like the reference ID field
            # (IDTokenizer emits the unmodified value, tokenizers.py:
            # 230-243) — surfaced by reader.all_terms() parity.
            for i, t in enumerate(texts):
                toks = [] if t is None else [str(t)]
                token_lists.append(toks)
                counts[i] = len(toks)
        elif spec.gaps:
            split = self._re.split
            for i, t in enumerate(texts):
                toks = [w for w in split(t or "") if w]
                token_lists.append(toks)
                counts[i] = len(toks)
        elif with_chars:
            finditer = self._re.finditer
            for i, t in enumerate(texts):
                toks, spans = [], []
                if t:
                    for m in finditer(t):
                        toks.append(m.group(0))
                        spans.append(m.span())
                token_lists.append(toks)
                span_lists.append(spans)
                counts[i] = len(toks)
        else:
            findall = self._re.findall
            for i, t in enumerate(texts):
                toks = findall(t) if t else []
                token_lists.append(toks)
                counts[i] = len(toks)

        if n == 0 or counts.sum() == 0:
            empty = np.empty(0, dtype=np.int64)
            return TokenizedBatch(empty, np.empty(0, dtype=object),
                                  empty.astype(np.int32), np.zeros(n, dtype=np.int64))

        flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists if t])
        sc_flat = ec_flat = None
        if with_chars:
            all_spans = [sp for spans in span_lists for sp in spans]
            sc_flat = np.array([sp[0] for sp in all_spans], dtype=np.int64)
            ec_flat = np.array([sp[1] for sp in all_spans], dtype=np.int64)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
        # original (pre-filter) position of each token within its row
        pre_cuts = np.concatenate(([np.int64(0)], np.cumsum(counts)))
        orig_pos = np.arange(len(flat), dtype=np.int64) - pre_cuts[row_ids]

        s = pd.Series(flat, dtype=object)
        if spec.lowercase:
            s = s.str.lower()
        if self._charmap is not None and self._breakmap is None:
            # CharsetFilter: unicode translate per token (filters.py:371)
            s = s.str.translate(self._charmap)
        keep = np.ones(len(s), dtype=bool)
        if spec.minsize > 1:
            keep &= (s.str.len() >= spec.minsize).to_numpy()
        if spec.maxsize is not None:
            keep &= (s.str.len() <= spec.maxsize).to_numpy()
        if spec.stopwords:
            keep &= ~s.isin(spec.stopwords).to_numpy()

        # post-stop token transforms (order: strip -> substitute ->
        # stem -> reverse, matching the preset chains)
        if spec.strip:
            s = s.str.strip()
        if self._sub is not None:
            pat, rep = self._sub, spec.substitute[1]
            s = pd.Series([pat.sub(rep, x) for x in s.to_numpy()],
                          dtype=object)
        if spec.stem or spec.lang:
            if spec.stem:
                from whoosh_ray.functions.porter import stem as stem_fn
            else:
                from whoosh_ray.functions.snowball import STEMMERS

                stem_fn = STEMMERS[spec.lang]
            cache = self._stem_cache
            vals = s.to_numpy()
            out = np.empty(len(vals), dtype=object)
            for i, w in enumerate(vals):
                st = cache.get(w)
                if st is None:
                    st = stem_fn(w)
                    if len(cache) < 50000:  # morph.py cachesize parity
                        cache[w] = st
                out[i] = st
            s = pd.Series(out, dtype=object)
        if spec.reverse:
            s = pd.Series([x[::-1] for x in s.to_numpy()], dtype=object)

        terms = s.to_numpy()[keep]
        row_ids = row_ids[keep]
        orig_pos = orig_pos[keep]
        if with_chars:
            sc_flat = sc_flat[keep]
            ec_flat = ec_flat[keep]
        # surviving token count per row
        row_lengths = np.bincount(row_ids, minlength=n).astype(np.int64)
        # Renumbered positions (StopFilter renumber=True, filters.py:300-311):
        # the FIRST surviving token keeps its original position; subsequent
        # survivors increment from there.
        cuts = np.concatenate(([np.int64(0)], np.cumsum(row_lengths)))
        rank_in_row = np.arange(len(row_ids), dtype=np.int64) - cuts[row_ids]
        first_orig = np.zeros(n, dtype=np.int64)
        has_any = row_lengths > 0
        first_orig[has_any] = orig_pos[cuts[:-1][has_any]]
        positions = (first_orig[row_ids] + rank_in_row).astype(np.int32)
        if self._re is None and self._breakmap is None:
            # IDTokenizer emits pos = start_pos + 1 (tokenizers.py:66-67)
            positions += 1
        return TokenizedBatch(row_ids, terms, positions, row_lengths,
                              startchars=sc_flat, endchars=ec_flat)

    def _numeric_call(self, values) -> TokenizedBatch:
        """Tiered numeric terms: one token per tier per value."""
        bits, step = self.spec.numeric
        n = len(values)
        vals = np.asarray(values)
        mask_valid = ~pd.isna(vals)
        v = np.zeros(n, dtype=np.int64)
        sub = vals[mask_valid]
        if np.issubdtype(np.asarray(sub).dtype, np.datetime64):
            # DATETIME-on-NUMERIC (reference fields.py:783-907): index
            # the epoch-microsecond int64
            sub = np.asarray(sub, dtype="datetime64[us]").astype(np.int64)
        v[mask_valid] = np.asarray(sub, dtype=np.int64)
        if bits >= 64:
            # offset-to-unsigned must wrap mod 2**64 (int64 + 2**63
            # overflows); two's-complement reinterpretation + uint add
            # gives exactly v + 2**63 mod 2**64
            u = v.astype(np.uint64) + np.uint64(1 << 63)
        else:
            u = (v + (1 << (bits - 1))).astype(np.uint64)
        shifts = list(range(0, bits, step))
        rows_v = np.flatnonzero(mask_valid)
        nv = len(rows_v)
        row_ids = np.repeat(rows_v, len(shifts))
        terms = np.empty(nv * len(shifts), dtype=object)
        k = 0
        for i in rows_v:
            uv = int(u[i])
            for sh in shifts:
                terms[k] = f"{sh:02d}:{uv >> sh:x}"
                k += 1
        positions = np.zeros(nv * len(shifts), dtype=np.int32)
        counts = np.zeros(n, dtype=np.int64)
        counts[rows_v] = len(shifts)
        return TokenizedBatch(row_ids, terms, positions, counts)

    def _chain_call(self, texts, with_chars: bool = False) -> TokenizedBatch:
        """Generic filter-chain path (tokenfilters.py): per-row generator
        chains for the stream-restructuring filters."""
        from whoosh_ray.functions.tokenfilters import (analyze_row_boosts,
                                                       analyze_row_full)

        tokenize, fns = self._chain
        n = len(texts)
        rows, terms, positions, boosts = [], [], [], []
        scs, ecs = [], []
        if with_chars:
            for i, t in enumerate(texts):
                for text, pos, boost, sc, ec in analyze_row_full(
                        t or "", tokenize, fns):
                    rows.append(i)
                    terms.append(text)
                    positions.append(pos)
                    boosts.append(boost)
                    scs.append(sc)
                    ecs.append(ec)
        else:
            for i, t in enumerate(texts):
                for text, pos, boost in analyze_row_boosts(t or "",
                                                           tokenize, fns):
                    rows.append(i)
                    terms.append(text)
                    positions.append(pos)
                    boosts.append(boost)
        row_ids = np.asarray(rows, dtype=np.int64)
        counts = np.bincount(row_ids, minlength=n).astype(np.int64)
        barr = np.asarray(boosts, dtype=np.float64)
        return TokenizedBatch(
            row_ids,
            np.asarray(terms, dtype=object),
            np.asarray(positions, dtype=np.int32),
            counts,
            boosts=None if (len(barr) == 0 or bool(np.all(barr == 1.0)))
            else barr,
            startchars=np.asarray(scs, dtype=np.int64) if with_chars else None,
            endchars=np.asarray(ecs, dtype=np.int64) if with_chars else None,
        )

    _BOOL_TRUES = frozenset("t true yes 1".split())
    _BOOL_FALSES = frozenset("f false no 0".split())

    def _boolean_call(self, values) -> TokenizedBatch:
        """BOOLEAN value stream -> "t"/"f" tokens (fields.py:959-966
        index semantics; 970-977 query semantics under mode="query").
        In INDEX mode None / empty-string (the writers' missing-value
        fill) index nothing, like a missing field in the reference; in
        QUERY mode only None is skipped — the reference's _obj_to_bool
        maps "" through bool("") == False, so an empty query string
        yields the 'f' token (ADVICE r3)."""
        query_mode = self.spec.mode == "query"
        rows, terms = [], []
        for i, v in enumerate(values):
            if v is None or (not query_mode
                             and isinstance(v, str) and v == ""):
                continue
            if isinstance(v, str):
                lv = v.lower()
                if query_mode:
                    b = (True if lv in self._BOOL_TRUES
                         else False if lv in self._BOOL_FALSES
                         else bool(v))
                else:
                    b = lv in self._BOOL_TRUES
            else:
                b = bool(v)
            rows.append(i)
            terms.append("t" if b else "f")
        row_ids = np.asarray(rows, dtype=np.int64)
        return TokenizedBatch(
            row_ids,
            np.asarray(terms, dtype=object),
            np.zeros(len(rows), dtype=np.int32),
            np.bincount(row_ids, minlength=len(values)).astype(np.int64),
        )

    def _ngram_call(self, texts) -> TokenizedBatch:
        """N-gram token streams (reference parity, probed):

        - text mode: for each window start, grams of every size min..max
          that fit; all grams at one start share a position (the start
          counter), lowercased;
        - words mode: regex-tokenize + lowercase, then per word emit grams
          of sizes min..max per start; all grams of a word share the
          word's position."""
        gmin, gmax = self.spec.ngram
        lower = self.spec.lowercase
        n = len(texts)
        rows, terms, positions = [], [], []
        counts = np.zeros(n, dtype=np.int64)
        if self.spec.mode == "query":
            # query mode emits ONE gram size = min(max, len) (reference
            # ngrams.py:73-90 tokenizer, :168-186 filter; the filter
            # additionally drops words shorter than min)
            for i, t in enumerate(texts):
                t = t or ""
                if self.spec.ngram_mode == "text":
                    if lower:
                        t = t.lower()
                    size = min(gmax, len(t))
                    for start in range(0, len(t) - size + 1):
                        rows.append(i)
                        terms.append(t[start:start + size])
                        positions.append(start)
                else:
                    words = self._re.findall(t) if self._re else [t]
                    for wpos, w in enumerate(words):
                        if lower:
                            w = w.lower()
                        if len(w) < gmin:
                            continue
                        size = min(gmax, len(w))
                        for start in range(0, len(w) - size + 1):
                            rows.append(i)
                            terms.append(w[start:start + size])
                            positions.append(wpos)
            row_ids = np.asarray(rows, dtype=np.int64)
            return TokenizedBatch(
                row_ids,
                np.asarray(terms, dtype=object),
                np.asarray(positions, dtype=np.int32),
                np.bincount(row_ids, minlength=n).astype(np.int64),
            )
        for i, t in enumerate(texts):
            t = t or ""
            if self.spec.ngram_mode == "text":
                if lower:
                    t = t.lower()
                pos = 0
                for start in range(len(t)):
                    emitted = False
                    for size in range(gmin, gmax + 1):
                        if start + size > len(t):
                            break
                        rows.append(i)
                        terms.append(t[start:start + size])
                        positions.append(pos)
                        emitted = True
                    if emitted:
                        pos += 1
            else:
                words = self._re.findall(t) if self._re else [t]
                for wpos, w in enumerate(words):
                    if lower:
                        w = w.lower()
                    for start in range(len(w)):
                        for size in range(gmin, gmax + 1):
                            if start + size > len(w):
                                break
                            rows.append(i)
                            terms.append(w[start:start + size])
                            positions.append(wpos)
            counts[i] = 0
        row_ids = np.asarray(rows, dtype=np.int64)
        counts = np.bincount(row_ids, minlength=n).astype(np.int64)
        return TokenizedBatch(
            row_ids,
            np.asarray(terms, dtype=object),
            np.asarray(positions, dtype=np.int32),
            counts,
        )

    def aggregate(self, texts, with_positions: bool = False,
                  with_chars: bool = False, with_boosts: bool = False):
        """Per-(row, term) aggregation — the Format.word_values analogue.

        The reference folds the token stream of each field value into
        ``(term, freq, weight, payload)`` per unique term
        (/root/reference/src/whoosh/formats.py:78-92, Frequency at :182-196,
        Positions at :217-229).  Fully vectorized: hash-factorize the flat
        term stream, one stable integer lexsort by (row, term-code) — which
        keeps positions ascending within each group — then boundary
        detection; no per-group Python.

        Returns a dict of flat numpy arrays: ``row_ids``, ``term_codes``,
        ``term_dict`` (codes index into it), ``tfs``, ``row_lengths``, and
        with positions ``pos_values``/``pos_offsets`` (flat int32 + group
        offsets, ready for ``pa.ListArray.from_arrays``).
        """
        tb = self(texts, with_chars=with_chars) if with_chars else self(texts)
        n_tok = len(tb.terms)
        if n_tok == 0:
            out = dict(
                row_ids=np.empty(0, dtype=np.int64),
                term_codes=np.empty(0, dtype=np.int32),
                term_dict=np.empty(0, dtype=object),
                tfs=np.empty(0, dtype=np.int64),
                row_lengths=tb.row_lengths,
            )
            if with_positions:
                out["pos_values"] = np.empty(0, dtype=np.int32)
                out["pos_offsets"] = np.zeros(1, dtype=np.int32)
            if with_chars:
                out["char_starts"] = np.empty(0, dtype=np.int64)
                out["char_ends"] = np.empty(0, dtype=np.int64)
            if with_boosts:
                out["occ_boosts"] = np.empty(0, dtype=np.float64)
            return out

        tcode, term_dict = pd.factorize(tb.terms, sort=False)
        order = np.lexsort((tcode, tb.row_ids))  # stable: positions ascend
        r = tb.row_ids[order]
        t = tcode[order]
        boundary = np.empty(n_tok, dtype=bool)
        boundary[0] = True
        np.not_equal(r[1:], r[:-1], out=boundary[1:])
        boundary[1:] |= t[1:] != t[:-1]
        starts = np.flatnonzero(boundary)
        tfs = np.diff(np.append(starts, n_tok))
        out = dict(
            row_ids=r[starts],
            term_codes=t[starts].astype(np.int32),
            term_dict=np.asarray(term_dict, dtype=object),
            tfs=tfs.astype(np.int64),
            row_lengths=tb.row_lengths,
        )
        if with_positions:
            p = tb.positions[order]
            out["pos_values"] = p.astype(np.int32)
            out["pos_offsets"] = np.append(starts, n_tok).astype(np.int32)
        if with_chars:
            out["char_starts"] = tb.startchars[order]
            out["char_ends"] = tb.endchars[order]
        if with_boosts:
            # per-OCCURRENCE boosts in the same (group-major) order as
            # pos_values — the PositionBoosts/CharacterBoosts payload
            # stream (reference formats.py:339-481)
            out["occ_boosts"] = (tb.boosts[order] if tb.boosts is not None
                                 else np.ones(n_tok, dtype=np.float64))
        if tb.boosts is not None:
            # per-(row, term) scoring weight = sum of token boosts
            # (Frequency/Positions word_values, formats.py:182-263);
            # omitted when every weight equals the tf (no boost in play)
            w = np.add.reduceat(tb.boosts[order], starts)
            if not np.array_equal(w, out["tfs"].astype(np.float64)):
                out["weights"] = w
        return out


# ---- reference-named analyzer factories (analyzers.py:117-296,
# ngrams.py:223-237): each returns an AnalyzerSpec so schemas written
# against the reference API port by changing only the import ----


def _pat(expression) -> str:
    return getattr(expression, "pattern", expression)


def IDAnalyzer(lowercase: bool = False) -> AnalyzerSpec:
    return AnalyzerSpec(pattern=None, stopwords=None, minsize=0,
                        lowercase=lowercase)


def KeywordAnalyzer(lowercase: bool = False,
                    commas: bool = False) -> AnalyzerSpec:
    if commas:
        return AnalyzerSpec(pattern=r"[^,]+", lowercase=lowercase,
                            stopwords=None, minsize=0, strip=True)
    return AnalyzerSpec(pattern=r"[^ \t\r\n]+", lowercase=lowercase,
                        stopwords=None, minsize=0)


def RegexAnalyzer(expression: str = r"\w+(?:\.?\w+)*",
                  gaps: bool = False) -> AnalyzerSpec:
    """Tokenizer only — no case folding (analyzers.py:149-153).  NB the
    reference default spells the pattern with a CAPTURING group (the
    matched text is the same); the vectorized tokenizer extracts whole
    matches, so pass non-capturing groups in custom patterns."""
    return AnalyzerSpec(pattern=_pat(expression), gaps=gaps,
                        lowercase=False, stopwords=None, minsize=0)


def SimpleAnalyzer(expression: str = r"\w+(?:\.?\w+)*",
                   gaps: bool = False) -> AnalyzerSpec:
    return AnalyzerSpec(pattern=_pat(expression), gaps=gaps,
                        stopwords=None, minsize=0)


def StandardAnalyzer(expression: str = r"\w+(?:\.?\w+)*",
                     stoplist=STOP_WORDS, minsize: int = 2,
                     maxsize: int | None = None,
                     gaps: bool = False) -> AnalyzerSpec:
    if stoplist is None:
        return AnalyzerSpec(pattern=_pat(expression), gaps=gaps,
                            stopwords=None, minsize=0)
    return AnalyzerSpec(pattern=_pat(expression), gaps=gaps,
                        stopwords=frozenset(stoplist), minsize=minsize,
                        maxsize=maxsize)


def StemmingAnalyzer(expression: str = r"\w+(?:\.?\w+)*",
                     stoplist=STOP_WORDS, minsize: int = 2,
                     maxsize: int | None = None, gaps: bool = False,
                     stemfn=None, ignore=None,
                     cachesize: int = 50000) -> AnalyzerSpec:
    """``stemfn`` accepts the chain names ("porter", "porter2",
    "lovins", "paicehusk") or None for the default porter; arbitrary
    callables aren't expressible in a spec — pass a name."""
    base = StandardAnalyzer(expression, stoplist, minsize, maxsize, gaps)
    if stemfn is None and ignore is None:
        import dataclasses as _dc

        return _dc.replace(base, stem=True)
    name = stemfn or "porter"
    if not isinstance(name, str):
        raise TypeError("StemmingAnalyzer(stemfn=) takes a stemmer NAME "
                        "('porter'/'porter2'/'lovins'/'paicehusk'); "
                        "arbitrary callables aren't spec-expressible")
    chain = [("tokenizer", (_pat(expression), gaps)), ("lowercase", ())]
    if stoplist is not None:
        chain.append(("stop", (tuple(sorted(stoplist)), minsize,
                               maxsize, True)))
    chain.append(("stemfn", (name, tuple(sorted(ignore or ())),
                             cachesize)))
    return AnalyzerSpec(chain=tuple(chain))


def FancyAnalyzer(expression: str = r"\s+", stoplist=STOP_WORDS,
                  minsize: int = 2, maxsize: int | None = None,
                  gaps: bool = True, splitwords: bool = True,
                  splitnums: bool = True, mergewords: bool = False,
                  mergenums: bool = False) -> AnalyzerSpec:
    return AnalyzerSpec(chain=(
        ("tokenizer", (_pat(expression), gaps)),
        ("intraword", ("-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+",
                       splitwords, splitnums, mergewords, mergenums)),
        ("lowercase", ()),
        ("stop", (tuple(sorted(stoplist)) if stoplist is not None
                  else (), minsize, maxsize, True)),
    ))


def LanguageAnalyzer(lang: str, expression: str = r"\w+(?:\.?\w+)*",
                     gaps: bool = False,
                     cachesize: int = 50000) -> AnalyzerSpec:
    import dataclasses as _dc

    return _dc.replace(language_analyzer(lang), pattern=_pat(expression),
                       gaps=gaps)


def NgramAnalyzer(minsize: int, maxsize: int | None = None) -> AnalyzerSpec:
    return AnalyzerSpec(stopwords=None, minsize=0,
                        ngram=(minsize, maxsize or minsize),
                        ngram_mode="text")


def NgramWordAnalyzer(minsize: int, maxsize: int | None = None,
                      tokenizer=None, at=None) -> AnalyzerSpec:
    """ngrams.py:236-244: tokenizer | LowercaseFilter | NgramFilter.
    The default shape rides the vectorized words-mode ngram path; a
    custom ``tokenizer`` (an AnalyzerSpec) or ``at`` trimming routes
    through the equivalent declarative chain."""
    if tokenizer is None and at is None:
        return AnalyzerSpec(stopwords=None, minsize=0,
                            ngram=(minsize, maxsize or minsize),
                            ngram_mode="words")
    tok = tokenizer if tokenizer is not None else RegexAnalyzer()
    if not isinstance(tok, AnalyzerSpec):
        raise TypeError("NgramWordAnalyzer(tokenizer=) takes an "
                        "AnalyzerSpec (e.g. RegexTokenizer())")
    return AnalyzerSpec(chain=tok.to_chain() + (
        ("lowercase", ()),
        ("ngram", (minsize, maxsize or minsize, at))))
