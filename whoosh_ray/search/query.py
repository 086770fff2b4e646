"""Query AST — per-operator semantics matching the reference.

Reference: /root/reference/src/whoosh/query/ (Term terms.py:40-142,
And/Or compound.py:242-489, Not wrappers.py:77-151, AndNot/Require/
AndMaybe compound.py:546-653, Prefix/Wildcard terms.py:232-404, FuzzyTerm
terms.py:420-486, TermRange ranges.py:134-347, Phrase positional.py:121-249,
Every qcore.py:650-738).

Each node implements ``docs_scores(searcher, seg) -> (docids, scores)``
over ONE segment — numpy arrays, docids ascending — using the vectorized
kernels in matching.py.  Global statistics (idf, avgfl) come from the
searcher, exactly as the reference's per-segment matchers score with the
parent (multi-reader) searcher's stats (searching.py:285-316).

Scoring semantics pinned against the oracle (see tests/test_conformance):
Or sums; DisjunctionMax maxes; Not/Every score ``boost`` (1.0); a Not
child inside And *adds* its boost to the intersection score; Phrase
scores the sum of its terms' BM25 scores on matching docs; constantscore
expansions (Prefix/Wildcard/TermRange/Fuzzy default) score ``boost``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield

import numpy as np

from whoosh_ray.search import matching


class Query:
    boost: float = 1.0
    #: parser-recorded char span (reference qcore.py:164; Terms carry
    #: real values when parsed, everything else keeps the None default)
    startchar = None
    endchar = None
    #: parse error recorded on queries the parser salvaged
    #: (reference qcore.py:167; see error_query)
    error = None

    # structural identity, shared by every node type (the reference
    # queries define field-wise __eq__/__hash__ per class,
    # qcore.py/compound.py/terms.py) — required for requires()/
    # all_terms() set semantics
    def __eq__(self, other):
        return isinstance(other, Query) and _qkey(self) == _qkey(other)

    def __hash__(self):
        return hash(_qkey(self))

    def docs_scores(self, searcher, seg):
        """Evaluate over ONE segment -> (docids asc, scores).

        Bridge for reference-protocol custom queries: a subclass that
        implements ``matcher(searcher, seg)`` (returning a
        whoosh_ray.matching.Matcher over this segment's docids —
        globally valid, since docids are global here) but not
        docs_scores is evaluated by draining the matcher."""
        if type(self).matcher is not Query.matcher:
            from whoosh_ray import matching as pull_matching
            return pull_matching.drain(self.matcher(searcher, seg))
        raise NotImplementedError

    def matcher(self, searcher, seg=None):
        """Reference extension protocol: build a pull Matcher for this
        query over one segment.  Engine queries use docs_scores
        directly; implement either one in a custom subclass."""
        raise NotImplementedError

    def global_docs_scores(self, searcher):
        """Evaluate over the whole index.  Default: concatenate per-segment
        results (segments are disjoint ascending docid ranges, so the
        concatenation is globally sorted).  Compound nodes override this to
        combine their children's *global* arrays — required for exact parity
        of operators whose reference matchers leak state across the whole
        docid space (DisjunctionMax cursor scores, AndNot first-doc quirk),
        which a per-segment decomposition would cut at segment boundaries."""
        import numpy as np
        ids_parts, score_parts = [], []
        for seg in searcher.segments:
            ids, scores = searcher.eval(self, seg)
            if len(ids):
                ids_parts.append(ids)
                score_parts.append(scores)
        if not ids_parts:
            return matching.empty()
        return np.concatenate(ids_parts), np.concatenate(score_parts)

    def terms(self) -> list[tuple[str, str]]:
        """(field, term) leaves needing global stats (df/idf)."""
        return []

    def children(self):
        """Direct sub-queries (reference qcore.py children())."""
        subs = getattr(self, "subqueries", None)
        if subs:
            yield from subs
        for name in ("subquery", "a", "b", "child", "parents", "query"):
            c = getattr(self, name, None)
            if isinstance(c, Query):
                yield c

    def leaves(self):
        """Leaf queries of this tree (reference qcore.py:400-410)."""
        kids = list(self.children())
        if not kids:
            yield self
        else:
            for k in kids:
                yield from k.leaves()

    def needs_spans(self) -> bool:
        """True when any node in this tree is a span query
        (reference qcore.py:233-237; spans.py:284 overrides True)."""
        return any(c.needs_spans() for c in self.children())

    def expanded_terms(self, reader, phrases: bool = True):
        """This NODE's (fieldname, text) pairs — per-node like the
        reference (qcore.py:335: base = terms(phrases); the MultiTerm
        override expands against the reader).  Literal leaves pass
        their terms through unfiltered; pattern leaves (Prefix/
        Wildcard/Fuzzy/...) yield their reader expansions; compound
        nodes yield nothing (walk ``leaves()`` / use ``existing_terms``
        for whole trees)."""
        if isinstance(self, Phrase):
            return iter([(self.fieldname, w) for w in self.words]
                        if phrases else ())
        if not self.is_leaf():
            # compound nodes yield nothing per-node (our terms() is the
            # internal stats-preload collector, which DOES recurse)
            return iter(())
        lit = self.terms()
        if lit:
            return iter(lit)
        out = []
        for q in self.expansion_queries(reader.searcher):
            out.extend(q.terms())
        return iter(out)

    def existing_terms(self, reader, phrases: bool = True,
                       expand: bool = False,
                       fieldname: str | None = None) -> set:
        """(fieldname, text) pairs of this tree's terms that EXIST in
        the index (reference qcore.py:338-375; drives
        Results.query_terms).  ``phrases`` includes Phrase words;
        ``expand`` resolves multiterm leaves to their matching
        expansions."""
        searcher = reader.searcher
        out: set[tuple[str, str]] = set()
        for leaf in self.leaves():
            fn = getattr(leaf, "fieldname", None)
            if fieldname is not None and fn != fieldname:
                continue
            if isinstance(leaf, Phrase):
                if not phrases:
                    continue
                cand = [(leaf.fieldname, w) for w in leaf.words]
            elif expand:
                cand = []
                for q in leaf.expansion_queries(searcher):
                    cand.extend(q.terms())
            else:
                cand = leaf.terms()
            for f, t in cand:
                if (f, t) not in out and \
                        searcher.global_term_info(f, t) is not None:
                    out.add((f, t))
        return out

    def expansion_queries(self, searcher) -> list["Query"]:
        """Resolve lexicon expansions (global, so stats are consistent)."""
        return [self]

    def normalize(self) -> "Query":
        return self

    # ---- generic tree utilities (reference qcore.py:205-560) ----

    def is_leaf(self) -> bool:
        return not any(True for _ in self.children())

    def is_range(self) -> bool:
        return False

    def has_terms(self) -> bool:
        """True when this node searches for SPECIFIC terms (so
        ``replace`` is meaningful) — Term/Phrase and expanding-term
        leaves, not patterns (qcore.py:224-231)."""
        return False

    def copy(self) -> "Query":
        import copy as _copy

        return _copy.deepcopy(self)

    def apply(self, fn) -> "Query":
        """Copy of this node with ``fn`` applied to each direct child;
        leaves return self (qcore.py:239-264).  Generic over the same
        child attributes ``children()`` discovers, preserving every
        other constructor argument."""
        import copy as _copy

        if self.is_leaf():
            return self
        q = _copy.copy(self)
        subs = getattr(q, "subqueries", None)
        if subs:
            q.subqueries = [fn(s) for s in subs]
        for name in ("subquery", "a", "b", "child", "query"):
            c = getattr(q, name, None)
            if isinstance(c, Query):
                setattr(q, name, fn(c))
        return q

    def accept(self, fn) -> "Query":
        """Bottom-up transform: ``fn`` on (copies of) the children,
        then on this node (qcore.py:266-290)."""
        def wrap(q):
            return fn(q.apply(wrap))

        return wrap(self)

    def replace(self, fieldname: str, oldtext: str,
                newtext: str) -> "Query":
        """COPY with ``oldtext`` replaced by ``newtext`` in matching
        term leaves (qcore.py:291-305)."""
        import copy as _copy
        from operator import methodcaller

        if self.is_leaf():
            return _copy.copy(self)
        return self.apply(methodcaller("replace", fieldname, oldtext,
                                       newtext))

    def iter_all_terms(self, phrases: bool = True):
        """(fieldname, text) pairs of every term leaf (qcore.py:412-430);
        ``phrases`` adds Phrase words.  Expanding-term leaves
        (Fuzzy/Variations) contribute their BASE word like the
        reference's ExpandingTerm.terms()."""
        for leaf in self.leaves():
            if isinstance(leaf, Phrase):
                if phrases:
                    for w in leaf.words:
                        yield (leaf.fieldname, w)
            elif leaf.has_terms():
                ts = list(leaf.terms())
                if not ts and getattr(leaf, "text", None) is not None:
                    ts = [(leaf.fieldname, leaf.text)]
                yield from ts

    def all_terms(self, phrases: bool = True) -> set:
        return set(self.iter_all_terms(phrases=phrases))

    def phrases(self):
        """(terms, phrases) lists (qcore.py:377-398).  Reference quirk
        mirrored: only Term nodes found AMONG CHILDREN are collected —
        a bare Term self yields ([], [])."""
        terms: list = []
        phrs: list = []
        if isinstance(self, Phrase):
            phrs.append(self)
        else:
            for q in self.children():
                if isinstance(q, Term):
                    terms.append(q)
                else:
                    t, p = q.phrases()
                    terms.extend(t)
                    phrs.extend(p)
        return terms, phrs

    def field(self):
        """The single field this query matches in, or None
        (qcore.py:497-502; compound.py:94-98 common-across-children)."""
        f = getattr(self, "fieldname", None)
        if f is not None:
            return f
        fields = [q.field() for q in self.children()]
        if fields and all(x == fields[0] for x in fields[1:]):
            return fields[0]
        return None

    def with_boost(self, boost: float) -> "Query":
        """COPY with the boost set (qcore.py:504-513)."""
        q = self.copy()
        q.boost = boost
        return q

    def requires(self) -> set:
        """Queries statically KNOWN required to match (qcore.py:475-495;
        default: this node itself)."""
        return {self}

    def estimate_size(self, reader) -> int:
        """Overestimate of matchable docs (qcore.py:515-521).  Default
        (compound/binary/wrapper shape, compound.py:100-102): sum of
        the children capped at doc_count."""
        kids = list(self.children())
        if not kids:
            raise NotImplementedError(type(self).__name__)
        return min(sum(q.estimate_size(reader) for q in kids),
                   _reader_doc_count(reader))

    def estimate_min_size(self, reader) -> int:
        """Leaves: same as estimate_size.  Nodes with children: the
        CompoundQuery rule (compound.py:104-118 — min positive child
        min-size minus the Not children's sizes)."""
        subs = list(self.children())
        if not subs:
            return self.estimate_size(reader)
        qs = [(q, q.estimate_min_size(reader)) for q in subs
              if not isinstance(q, Not)]
        pos = [m for _, m in qs if m > 0]
        if pos:
            neg = [q.estimate_size(reader) for q in subs
                   if isinstance(q, Not)]
            return max(min(pos) - sum(neg), 0)
        return 0

    def simplify(self, reader) -> "Query":
        """Replace expandable leaves with concrete Term/Or trees
        (terms.py:173-191; compound rebuild + normalize,
        compound.py:190-197)."""
        from operator import methodcaller

        if self.is_leaf():
            return self
        return self.apply(methodcaller("simplify", reader)).normalize()

    def docs(self, searcher):
        """Iterator of matching docnums (qcore.py:535-548)."""
        return iter(searcher.docs_for_query(self))

    def tokens(self, boost: float = 1.0, exreader=None):
        """Token objects for the terms this leaf searches, carrying
        startchar/endchar when the query came from the parser
        (qcore.py:456-486); non-term leaves yield nothing."""
        return iter(())

    def all_tokens(self, boost: float = 1.0):
        """All term tokens in the tree, boosts multiplied down
        (qcore.py:438-454)."""
        if self.is_leaf():
            yield from self.tokens(boost)
        else:
            boost *= getattr(self, "boost", 1.0)
            for child in self.children():
                yield from child.all_tokens(boost)

    def deletion_docs(self, searcher):
        """Docnums for delete_by_query (qcore.py:550-560; forwards to
        ``docs`` — special queries may override)."""
        return self.docs(searcher)


def _reader_doc_count(reader) -> int:
    dc = reader.doc_count
    return int(dc() if callable(dc) else dc)


def _reader_df(reader, fieldname: str, text: str) -> int:
    return int(reader.doc_frequency(fieldname, str(text)))


def _reader_searcher(reader):
    """Expansion needs a Searcher; accept either the IndexReader facade
    (has .searcher) or a Searcher itself."""
    return getattr(reader, "searcher", reader)


@dataclass(eq=False)
class Term(Query):
    fieldname: str
    text: str
    boost: float = 1.0

    # original-query char span, set by the parser on single-token words
    # (reference terms.py:89-92; None on hand-built or multi-token
    # queries).  NOT part of structural equality, like the reference.
    startchar = None
    endchar = None

    def terms(self):
        return [(self.fieldname, self.text)]

    def tokens(self, boost: float = 1.0, exreader=None):
        from whoosh_ray.search.highlight import Token

        yield Token(self.text, self.startchar, self.endchar,
                    boost=boost * self.boost, fieldname=self.fieldname)

    def has_terms(self):
        return True

    def replace(self, fieldname, oldtext, newtext):
        import copy as _copy

        q = _copy.copy(self)
        if q.fieldname == fieldname and q.text == oldtext:
            q.text = newtext
        return q

    def estimate_size(self, reader):
        return _reader_df(reader, self.fieldname, self.text)

    def docs_scores(self, searcher, seg):
        p = seg.postings(self.fieldname, self.text)
        if p is None:
            return matching.empty()
        scorer = searcher.scorer(self.fieldname, self.text)
        from whoosh_ray.search.scoring import score_postings
        scores = score_postings(scorer, p.docids, p.score_weights,
                                p.len_bytes)
        if self.boost != 1.0:
            scores = scores * self.boost
        return p.docids, scores


def _scale_boost(q: "Query", mult: float) -> "Query":
    """Copy with boost multiplied (reference with_boost semantics —
    queries stay immutable through normalize)."""
    if mult == 1.0:
        return q
    import copy

    q2 = copy.copy(q)
    q2.boost = getattr(q, "boost", 1.0) * mult
    return q2


# original-string char positions are presentation metadata, NOT query
# identity: the reference's __eq__/__hash__ compare (class, fieldname,
# text, boost) only (terms.py:54-84), so 'deploy deploy' still dedups
# at normalize even though the two terms carry different spans
_QKEY_SKIP = frozenset({"startchar", "endchar", "char_ranges"})


def _qkey(v):
    """Structural identity key used by normalize's duplicate
    elimination — mirrors the reference queries' field-wise
    __eq__/__hash__ (class + every attribute, subquery order
    significant)."""
    if isinstance(v, Query):
        return (type(v).__name__,
                tuple((k, _qkey(x)) for k, x in sorted(vars(v).items())
                      if k not in _QKEY_SKIP))
    if isinstance(v, (list, tuple)):
        return tuple(_qkey(x) for x in v)
    if isinstance(v, (set, frozenset)):
        return tuple(sorted(_qkey(x) for x in v))
    return v


class _Compound(Query):
    #: And merges overlapping same-field ranges by intersection, Or by
    #: union (reference compound.py:254,:284); DisjunctionMax has NO
    #: intersect_merge in the reference (normalize of a DJM holding
    #: overlapping ranges crashes there) — we default to union
    intersect_merge = False

    def __init__(self, subqueries, boost: float = 1.0):
        self.subqueries = list(subqueries)
        self.boost = boost

    # sequence protocol over the subqueries (reference
    # compound.py:69-76: q[0], len(q), iteration)
    def __getitem__(self, i):
        return self.subqueries[i]

    def __len__(self):
        return len(self.subqueries)

    def __iter__(self):
        return iter(self.subqueries)

    def terms(self):
        out = []
        for q in self.subqueries:
            out.extend(q.terms())
        return out

    def expansion_queries(self, searcher):
        return [type(self)([q2 for q in self.subqueries
                            for q2 in q.expansion_queries(searcher)],
                           boost=self.boost)]

    def _apply_boost(self, res):
        if self.boost != 1.0:
            return res[0], res[1] * self.boost
        return res

    def normalize(self) -> "Query":
        """Reference CompoundQuery.normalize (compound.py:119-188):
        flatten same-class nesting (boosts multiplied in), collapse on
        unfielded Every, merge overlapping same-field term ranges,
        drop fields covered by an Every(field), eliminate duplicates
        (keep-first, full structural equality incl. boost), drop
        nulls, unwrap single children (boost multiplied).  Invoked by
        the PARSER like the reference's parse(normalize=True) —
        ``search()`` does not normalize, matching the reference (an
        un-normalized And([t, t]) really does score 2x there)."""
        import copy

        subs: list[Query] = []
        for s in self.subqueries:
            s = s.normalize()
            if isinstance(s, self.__class__):
                subs += [_scale_boost(ss, s.boost) for ss in s.subqueries]
            else:
                subs.append(s)

        if all(isinstance(q, _NullQuery) for q in subs):
            return _NullQuery()
        if any(isinstance(q, Every) and q.fieldname is None for q in subs):
            return Every()

        # merge overlapping ranges; collect Every-covered fields
        everyfields: set = set()
        i = 0
        while i < len(subs):
            q = subs[i]
            if getattr(q, "fieldname", None) in everyfields:
                subs.pop(i)
                continue
            if isinstance(q, TermRange):
                j = i + 1
                while j < len(subs):
                    if q.overlaps(subs[j]):
                        q = q.merge(subs.pop(j),
                                    intersect=self.intersect_merge)
                    else:
                        j += 1
                subs[i] = q = q.normalize()
            if isinstance(q, Every):
                everyfields.add(q.fieldname)
            i += 1

        out: list[Query] = []
        seen: set = set()
        for s in subs:
            if (not isinstance(s, Every)
                    and getattr(s, "fieldname", None) in everyfields):
                continue
            k = _qkey(s)
            if k in seen:
                continue
            seen.add(k)
            out.append(s)
        out = [q for q in out if not isinstance(q, _NullQuery)]

        if not out:
            return _NullQuery()
        if len(out) == 1:
            sub = out[0]
            sub_boost = getattr(sub, "boost", 1.0)
            if not (self.boost == 1.0 and sub_boost == 1.0):
                sub = _scale_boost(sub, self.boost)
            return sub
        new = copy.copy(self)   # keeps minmatch/scale/tiebreak extras
        new.subqueries = out
        return new


class And(_Compound):
    #: repr joiner (reference compound.py:253)
    JOINT = " AND "
    intersect_merge = True

    def requires(self):
        # compound.py:256-260
        s = set()
        for q in self.subqueries:
            s |= q.requires()
        return s

    def estimate_size(self, reader):
        # compound.py:262-263
        return min(q.estimate_size(reader) for q in self.subqueries)

    def _combine(self, evalfn):
        pos = [q for q in self.subqueries if not isinstance(q, Not)]
        neg = [q for q in self.subqueries if isinstance(q, Not)]
        if not pos:
            # pure-negative And degenerates to intersected complements
            res = evalfn(neg[0])
            for n in neg[1:]:
                res = matching.require(res, evalfn(n)[0])
            return self._apply_boost(res)
        parts = [evalfn(q) for q in pos]
        if any(len(p[0]) == 0 for p in parts):
            return matching.empty()
        res = matching.intersect_sum(parts)
        for n in neg:
            ex = evalfn(n.subquery)[0]
            res = matching.diff(res, ex)
            # oracle-pinned: surviving docs gain the Not's boost
            res = (res[0], res[1] + n.boost)
        return self._apply_boost(res)

    def docs_scores(self, searcher, seg):
        return self._combine(lambda q: searcher.eval(q, seg))

    def global_docs_scores(self, searcher):
        return self._combine(lambda q: searcher.global_eval(q))


class Or(_Compound):
    #: repr joiner (reference compound.py:283)
    JOINT = " OR "
    """Union-sum scoring; ``minmatch`` is an extension (the reference
    documents it "not yet implemented", compound.py:305); ``scale``
    applies the reference's coordination bonus (CoordMatcher wrapping,
    compound.py:382-383, matching/wrappers.py:524-574): the SQR
    function rescales each doc's score by how many of the tree's term
    leaves match it.  ``termcount`` is computed from GLOBAL term
    existence (df > 0) — the reference counts per-subsearcher matcher
    leaves, which makes multi-segment scores depend on index layout; we
    pin the single-segment semantic so results are layout-independent
    and match the whoosh oracle."""

    def __init__(self, subqueries, boost: float = 1.0, minmatch: int = 0,
                 scale: float | None = None):
        super().__init__(subqueries, boost)
        self.minmatch = minmatch
        self.scale = scale

    def requires(self):
        # compound.py:328-332
        if len(self.subqueries) == 1:
            return self.subqueries[0].requires()
        return set()

    def expansion_queries(self, searcher):
        return [Or([q2 for q in self.subqueries
                    for q2 in q.expansion_queries(searcher)],
                   boost=self.boost, minmatch=self.minmatch,
                   scale=self.scale)]

    def _term_leaves(self) -> list["Term"]:
        out: list[Term] = []

        def walk(q):
            if isinstance(q, Term):
                out.append(q)
            elif isinstance(q, _Compound):
                for s in q.subqueries:
                    walk(s)
            else:
                for attr in ("a", "b", "subquery"):
                    s = getattr(q, attr, None)
                    if isinstance(s, Query):
                        walk(s)

        walk(self)
        return out

    def _coord(self, searcher, res, eval_term_docids):
        """SQR coordination (wrappers.py:546-574): score' =
        (score + (matching-1)/(termcount-scale)^2) * (termcount-1)/termcount."""
        leaves = [t for t in self._term_leaves()
                  if searcher.global_term_info(t.fieldname, t.text)]
        termcount = len(leaves)
        docids, scores = res
        if not len(docids):
            return res
        if termcount == 0:
            # reference wraps only `if ... any(m.term_matchers())`
            # (compound.py:382) — no term leaves, no coordination
            return res
        if termcount == self.scale:
            return docids, np.zeros(len(docids))
        matching_n = np.zeros(len(docids), dtype=np.int64)
        for t in leaves:
            tdocs = eval_term_docids(t)
            if len(tdocs):
                pos = np.searchsorted(tdocs, docids)
                pos = np.clip(pos, 0, len(tdocs) - 1)
                matching_n += (tdocs[pos] == docids)
        sqr = ((scores + (matching_n - 1) / (termcount - self.scale) ** 2)
               * ((termcount - 1) / termcount))
        return docids, sqr

    def _combine(self, evalfn):
        parts = [evalfn(q) for q in self.subqueries]
        res = matching.union_sum(parts)
        if self.minmatch > 1:
            counts = matching.union_sum(
                [(p[0], np.ones(len(p[0]))) for p in parts])
            keep = counts[1][np.searchsorted(counts[0], res[0])] >= self.minmatch
            res = (res[0][keep], res[1][keep])
        return self._apply_boost(res)

    def docs_scores(self, searcher, seg):
        res = self._combine(lambda q: searcher.eval(q, seg))
        if self.scale:
            res = self._coord(searcher, res,
                              lambda t: searcher.eval(t, seg)[0])
        return res

    def global_docs_scores(self, searcher):
        res = self._combine(lambda q: searcher.global_eval(q))
        if self.scale:
            res = self._coord(searcher, res,
                              lambda t: searcher.global_eval(t)[0])
        return res


class DisjunctionMax(_Compound):
    #: repr joiner (the reference DefaultOr variant, compound.py:372)
    JOINT = " dOR "

    def __init__(self, subqueries, boost: float = 1.0, tiebreak: float = 0.0):
        super().__init__(subqueries, boost)
        self.tiebreak = tiebreak

    def requires(self):
        # compound.py:477-481
        if len(self.subqueries) == 1:
            return self.subqueries[0].requires()
        return set()

    def docs_scores(self, searcher, seg):
        # per-segment form: cursor leaks are cut at segment boundaries
        # (used by the distributed fan-out; exact parity needs the global
        # form below because the reference's leak spans the whole index)
        parts = [searcher.eval(q, seg) for q in self.subqueries]
        return self._apply_boost(matching.union_max_cursor(parts))

    def global_docs_scores(self, searcher):
        parts = [searcher.global_eval(q) for q in self.subqueries]
        return self._apply_boost(matching.union_max_cursor(parts))


@dataclass(eq=False)
class Not(Query):
    subquery: Query
    boost: float = 1.0

    def terms(self):
        return self.subquery.terms()

    def expansion_queries(self, searcher):
        return [Not(self.subquery.expansion_queries(searcher)[0], self.boost)]

    def normalize(self):
        # reference wrappers.py:127-132
        q = self.subquery.normalize()
        if isinstance(q, _NullQuery):
            return q
        return Not(q, self.boost)

    def docs_scores(self, searcher, seg):
        child = searcher.eval(self.subquery, seg)[0]
        return matching.inverse(seg.all_docids(), child, self.boost)

    def global_docs_scores(self, searcher):
        child = searcher.global_eval(self.subquery)[0]
        return matching.inverse(searcher.all_docids(), child, self.boost)

    def field(self):
        return None  # wrappers.py:134-135

    def estimate_size(self, reader):
        return _reader_doc_count(reader)  # wrappers.py:137-138

    def estimate_min_size(self, reader):
        return 1 if _reader_doc_count(reader) else 0


class AndNot(Query):
    """Matches a's documents not matched by b, with a's scores
    (compound.py:546-580).

    Bug-parity: the reference's ``AndNotMatcher._find_first`` only advances
    past a's first doc when ``a.id() == b.id()`` at construction
    (binary.py:577-581), so a's (globally) first matching doc escapes
    exclusion unless it is also b's first matching doc.  Reproduced here so
    top-k lists are identical."""

    def __init__(self, a: Query, b: Query, boost: float = 1.0):
        self.a, self.b, self.boost = a, b, boost

    def terms(self):
        return self.a.terms() + self.b.terms()

    def normalize(self):
        # reference AndNot.normalize (compound.py:556-565); NB the
        # rebuilt node is constructed WITHOUT the boost — the
        # reference's self.__class__(a, b) resets it to 1.0
        a = self.a.normalize()
        b = self.b.normalize()
        if isinstance(a, _NullQuery):
            return _NullQuery()
        if isinstance(b, _NullQuery):
            return a
        return AndNot(a, b)

    def expansion_queries(self, searcher):
        return [AndNot(self.a.expansion_queries(searcher)[0],
                       self.b.expansion_queries(searcher)[0], self.boost)]

    def requires(self):
        return self.a.requires()  # compound.py:567-568

    def with_boost(self, boost):
        # compound.py:553-554: boost lands on A only, node boost reset
        return self.__class__(self.a.with_boost(boost), self.b)

    def docs_scores(self, searcher, seg):
        res = matching.diff(searcher.eval(self.a, seg),
                            searcher.eval(self.b, seg)[0])
        return (res[0], res[1] * self.boost) if self.boost != 1.0 else res

    def global_docs_scores(self, searcher):
        a_ids, a_scores = searcher.global_eval(self.a)
        b_ids = searcher.global_eval(self.b)[0]
        res = matching.diff((a_ids, a_scores), b_ids)
        if (len(a_ids) and len(b_ids) and int(a_ids[0]) != int(b_ids[0])
                and (len(res[0]) == 0 or int(res[0][0]) != int(a_ids[0]))):
            # first-doc escape (see class docstring)
            res = (np.concatenate(([a_ids[0]], res[0])),
                   np.concatenate(([a_scores[0]], res[1])))
        return (res[0], res[1] * self.boost) if self.boost != 1.0 else res


class Require(Query):
    """Semi-join: a's docs also matching b, scored by a only
    (compound.py:582-620, wrappers.py:423-486)."""

    def __init__(self, a: Query, b: Query, boost: float = 1.0):
        self.a, self.b, self.boost = a, b, boost

    def terms(self):
        return self.a.terms() + self.b.terms()

    def normalize(self):
        # reference Require.normalize (compound.py:611-616); boost reset
        a = self.a.normalize()
        b = self.b.normalize()
        if isinstance(a, _NullQuery) or isinstance(b, _NullQuery):
            return _NullQuery()
        return Require(a, b)

    def expansion_queries(self, searcher):
        return [Require(self.a.expansion_queries(searcher)[0],
                        self.b.expansion_queries(searcher)[0], self.boost)]

    def requires(self):
        return self.a.requires() | self.b.requires()  # compound.py:599

    def estimate_size(self, reader):
        return self.b.estimate_size(reader)  # compound.py:602

    def estimate_min_size(self, reader):
        return self.b.estimate_min_size(reader)  # compound.py:605

    def with_boost(self, boost):
        # compound.py:608-609: boost lands on A only, node boost reset
        return self.__class__(self.a.with_boost(boost), self.b)

    def docs_scores(self, searcher, seg):
        res = matching.require(searcher.eval(self.a, seg),
                               searcher.eval(self.b, seg)[0])
        return (res[0], res[1] * self.boost) if self.boost != 1.0 else res

    def global_docs_scores(self, searcher):
        res = matching.require(searcher.global_eval(self.a),
                               searcher.global_eval(self.b)[0])
        return (res[0], res[1] * self.boost) if self.boost != 1.0 else res


class AndMaybe(Query):
    """Left outer: a's docs; b's score added where b also matches
    (compound.py:622-653, binary.py:686-803)."""

    def __init__(self, a: Query, b: Query, boost: float = 1.0):
        self.a, self.b, self.boost = a, b, boost

    def terms(self):
        return self.a.terms() + self.b.terms()

    def normalize(self):
        # reference AndMaybe.normalize (compound.py:636-643); boost reset
        a = self.a.normalize()
        b = self.b.normalize()
        if isinstance(a, _NullQuery):
            return _NullQuery()
        if isinstance(b, _NullQuery):
            return a
        return AndMaybe(a, b)

    def expansion_queries(self, searcher):
        return [AndMaybe(self.a.expansion_queries(searcher)[0],
                         self.b.expansion_queries(searcher)[0], self.boost)]

    def requires(self):
        return self.a.requires()  # compound.py:645-646

    def estimate_min_size(self, reader):
        return self.a.estimate_min_size(reader)  # compound.py:648-649

    def with_boost(self, boost):
        # BinaryQuery base (compound.py:525-527): both children
        return self.__class__(self.a.with_boost(boost),
                              self.b.with_boost(boost))

    def docs_scores(self, searcher, seg):
        res = matching.and_maybe(searcher.eval(self.a, seg),
                                 searcher.eval(self.b, seg))
        return (res[0], res[1] * self.boost) if self.boost != 1.0 else res

    def global_docs_scores(self, searcher):
        res = matching.and_maybe(searcher.global_eval(self.a),
                                 searcher.global_eval(self.b))
        return (res[0], res[1] * self.boost) if self.boost != 1.0 else res


class Otherwise(Query):
    """Matches ``a``; if ``a`` matches NO documents at all, matches ``b``
    instead (compound.py:576-588).

    The reference checks matcher liveness per subsearcher, so on a
    multi-segment index the fallback flips per segment depending on
    layout; we pin the single-segment semantic (a matches anywhere in
    the index → use a everywhere) so results are layout-independent and
    match the whoosh oracle."""

    def __init__(self, a: Query, b: Query, boost: float = 1.0):
        self.a, self.b, self.boost = a, b, boost

    def terms(self):
        return self.a.terms() + self.b.terms()

    def with_boost(self, boost):
        # BinaryQuery base (compound.py:525-527): both children
        return self.__class__(self.a.with_boost(boost),
                              self.b.with_boost(boost))

    def normalize(self):
        # reference BinaryQuery.normalize (compound.py:529-539)
        a = self.a.normalize()
        b = self.b.normalize()
        if isinstance(a, _NullQuery) and isinstance(b, _NullQuery):
            return _NullQuery()
        if isinstance(a, _NullQuery):
            return b
        if isinstance(b, _NullQuery):
            return a
        return Otherwise(a, b)

    def expansion_queries(self, searcher):
        return [Otherwise(self.a.expansion_queries(searcher)[0],
                          self.b.expansion_queries(searcher)[0], self.boost)]

    def _pick(self, searcher):
        ids, _ = searcher.global_eval(self.a)
        return self.a if len(ids) else self.b

    def docs_scores(self, searcher, seg):
        res = searcher.eval(self._pick(searcher), seg)
        return (res[0], res[1] * self.boost) if self.boost != 1.0 else res

    def global_docs_scores(self, searcher):
        res = searcher.global_eval(self._pick(searcher))
        return (res[0], res[1] * self.boost) if self.boost != 1.0 else res


@dataclass(eq=False)
class Every(Query):
    """All documents (fieldname=None) or all documents with >=1 posting in
    the field — the reference reads every posting list for the latter
    (qcore.py:650-738); we take the same cost."""

    fieldname: str | None = None
    boost: float = 1.0

    def estimate_size(self, reader):
        return _reader_doc_count(reader)

    def docs_scores(self, searcher, seg):
        if self.fieldname is None:
            ids = seg.all_docids()
        else:
            parts = []
            for t in seg.all_terms(self.fieldname):
                p = seg.postings(self.fieldname, t)
                if p is not None:
                    parts.append(p.docids)
            ids = np.unique(np.concatenate(parts)) if parts else matching.EMPTY_IDS
        return ids, np.full(len(ids), self.boost, dtype=np.float64)


class _MultiTerm(Query):
    """Base for lexicon-expansion queries.  ``constantscore=True`` (the
    reference default for Prefix/Wildcard/TermRange/Fuzzy) scores every
    matching doc ``boost``; otherwise expands to a scored Or of Terms
    (terms.py:203-229)."""

    fieldname: str
    boost: float = 1.0
    constantscore: bool = True

    def _expand(self, searcher) -> list[str]:
        raise NotImplementedError

    def simplify(self, reader):
        # terms.py:173-191: concrete Term/Or over the existing
        # expansions (boost carried onto each Term), Null when none
        words = sorted(set(self._expand(_reader_searcher(reader))))
        existing = [Term(self.fieldname, w, boost=self.boost)
                    for w in words]
        if len(existing) == 1:
            return existing[0]
        if existing:
            return Or(existing)
        return _NullQuery()

    def estimate_size(self, reader):
        # terms.py:193-196 (uncapped sum of expansion dfs)
        return sum(_reader_df(reader, self.fieldname, w)
                   for w in self._expand(_reader_searcher(reader)))

    def estimate_min_size(self, reader):
        # terms.py:198-201 (NB the reference min() raises on an empty
        # expansion; mirrored)
        return min(_reader_df(reader, self.fieldname, w)
                   for w in self._expand(_reader_searcher(reader)))

    def expansion_queries(self, searcher):
        words = self._expand(searcher)
        if not words:
            return [_NullQuery()]
        if len(words) == 1:
            # reference parity: a single-term expansion bypasses
            # constantscore and is fully scored — and DROPS the query
            # boost, because the expansion Terms are constructed without
            # it (terms.py:210-217: ``Term(fieldname, word)``)
            return [Term(self.fieldname, words[0])]
        if self.constantscore and not self._constantscore_is_scored(searcher,
                                                                    words):
            # constant score is literally 1.0 — NOT the boost: the
            # weighting=None context makes the array path emit 1.0 per
            # doc and the Or(boost=) wrapper never scores
            # (terms.py:219-228; probed: Prefix(boost=0.5) == 1.0,
            # tf=2 docs == 1.0, two-expansion-term docs == 1.0)
            return [_ConstantTermSet(self.fieldname, words, 1.0)]
        return [Or([Term(self.fieldname, w) for w in words], boost=self.boost)]

    @staticmethod
    def _constantscore_is_scored(searcher, words) -> bool:
        """Bug-parity with the reference's constantscore machinery: the
        weighting=None context is passed to Or, whose AUTO strategy picks
        the binary UnionMatcher tree when there are exactly 2 expanded
        terms or doc_count_all > 5000 (compound.py:339-349) — and on that
        path searcher.postings() replaces the None weighting with the real
        one (searching.py ``weighting = weighting or self.weighting``), so
        "constant score" silently becomes full scoring.  Only the
        preloaded-array path (small index, 3..1023 terms) actually yields
        the constant boost."""
        if len(words) >= 1024:  # TOO_MANY_CLAUSES -> array path
            return False
        return len(words) == 2 or searcher.doc_count_all > 5000

    def docs_scores(self, searcher, seg):
        return self.expansion_queries(searcher)[0].docs_scores(searcher, seg)


class _NullQuery(Query):
    def docs_scores(self, searcher, seg):
        return matching.empty()


# the reference exposes a NullQuery singleton instance
# (query/qcore.py `NullQuery = _NullQuery()`)
NullQuery = _NullQuery()


class QueryError(Exception):
    """User-facing query error (reference query/qcore.py:38-41)."""


class TermNotFound(Exception):
    """Reference reading.py TermNotFound, re-homed with the queries."""


class WrappingQuery(Query):
    """Base for user queries that wrap a child without changing its
    matching (reference qcore.py:268-330) — the Query-subclassing
    plug-point: override ``docs_scores``/``global_docs_scores`` to
    transform the child's (docids, scores)."""

    def __init__(self, child: Query):
        self.child = child
        self.boost = 1.0

    def __repr__(self):
        return f"{type(self).__name__}({self.child!r})"

    def terms(self):
        return self.child.terms()

    def expansion_queries(self, searcher):
        return [self]

    def docs_scores(self, searcher, seg):
        return searcher.eval(self.child, seg)

    # NB: evaluation is per-segment (the default global path), so a
    # wrapper around DJM/AndNot does not carry their cross-segment
    # cursor quirks — same documented boundary as nested score_fn.

    def normalize(self) -> "Query":
        import copy

        c = self.child.normalize()
        if isinstance(c, _NullQuery):
            return c
        q = copy.copy(self)
        q.child = c
        return q


class _ConstantTermSet(Query):
    """Union of several terms' postings with constant score = boost."""

    def __init__(self, fieldname: str, words: list[str], boost: float):
        self.fieldname = fieldname
        self.words = words
        self.boost = boost

    def terms(self):
        return [(self.fieldname, w) for w in self.words]

    def docs_scores(self, searcher, seg):
        parts = []
        for w in self.words:
            p = seg.postings(self.fieldname, w)
            if p is not None:
                parts.append(p.docids)
        if not parts:
            return matching.empty()
        ids = np.unique(np.concatenate(parts))
        return ids, np.full(len(ids), self.boost, dtype=np.float64)


class ConstantScoreQuery(WrappingQuery):
    """Matches exactly the child's documents but scores every one a
    constant ``score`` (reference query/wrappers.py:152-184 — the
    "this branch is only a filter" optimization).  The child's own
    scores are never computed into the result; ``score`` is NOT
    multiplied by boost (the reference matcher uses the raw
    ``self.score`` as ``all_weights``)."""

    def __init__(self, child: Query, score: float = 1.0):
        super().__init__(child)
        self.score = float(score)

    def __repr__(self):
        return f"{type(self).__name__}({self.child!r}, score={self.score!r})"

    def docs_scores(self, searcher, seg):
        ids, _ = searcher.eval(self.child, seg)
        return ids, np.full(len(ids), self.score, dtype=np.float64)

    def global_docs_scores(self, searcher):
        # evaluate the child on ITS global path so whole-index quirks
        # (DJM cursor leak, AndNot first-doc) keep their docid sets
        ids, _ = searcher.global_eval(self.child)
        return ids, np.full(len(ids), self.score, dtype=np.float64)


class WeightingQuery(WrappingQuery):
    """Scores the child subtree with a specific WeightingModel instead
    of the searcher's (reference query/wrappers.py:186-199, which sets
    ``context.weighting`` for the subtree).  Like the reference, only
    matcher-time scores change — any top-level ``final()`` is still the
    searcher's own model's, applied at collection time."""

    def __init__(self, child: Query, weighting):
        super().__init__(child)
        self.weighting = weighting

    def __repr__(self):
        return f"{type(self).__name__}({self.child!r}, {self.weighting!r})"

    def _eval_swapped(self, searcher, fn):
        # scoped weighting swap: fresh scorer/eval caches so the
        # subtree's scores never leak into (or read from) entries
        # computed under the searcher's own model
        saved = (searcher.weighting, searcher._scorer_cache,
                 searcher._eval_cache, searcher._global_cache)
        searcher.weighting = self.weighting
        searcher._scorer_cache = {}
        searcher._eval_cache = {}
        searcher._global_cache = {}
        try:
            return fn()
        finally:
            (searcher.weighting, searcher._scorer_cache,
             searcher._eval_cache, searcher._global_cache) = saved

    def docs_scores(self, searcher, seg):
        return self._eval_swapped(
            searcher, lambda: self.child.docs_scores(searcher, seg))

    def global_docs_scores(self, searcher):
        return self._eval_swapped(
            searcher, lambda: self.child.global_docs_scores(searcher))


class Prefix(_MultiTerm):
    def __init__(self, fieldname, text, boost: float = 1.0,
                 constantscore: bool = True):
        self.fieldname, self.text = fieldname, text
        self.boost, self.constantscore = boost, constantscore

    def _expand(self, searcher):
        return searcher.expand_prefix(self.fieldname, self.text)


class Wildcard(_MultiTerm):
    """``*`` and ``?`` patterns, expanded via the longest literal prefix
    then regex-filtered (terms.py:357-404)."""

    def __init__(self, fieldname, text, boost: float = 1.0,
                 constantscore: bool = True):
        self.fieldname, self.text = fieldname, text
        self.boost, self.constantscore = boost, constantscore

    def _expand(self, searcher):
        text = self.text
        i = min([text.find(c) if text.find(c) >= 0 else len(text)
                 for c in "*?"])
        prefix = text[:i]
        pat = re.compile(
            "^" + "".join(
                ".*" if c == "*" else "." if c == "?" else re.escape(c)
                for c in text) + "$")
        cand = (searcher.expand_prefix(self.fieldname, prefix) if prefix
                else searcher.lexicon(self.fieldname))
        return [w for w in cand if pat.match(w)]


class Regex(_MultiTerm):
    """Regex term expansion (terms.py:361-404): candidates from the
    longest literal prefix, filtered with ``re.match`` (PREFIX-match
    semantics — the reference does not anchor the end)."""

    SPECIAL_CHARS = frozenset("{}()[].?*+^$\\")

    def __init__(self, fieldname, text, boost: float = 1.0,
                 constantscore: bool = True):
        self.fieldname, self.text = fieldname, text
        self.boost, self.constantscore = boost, constantscore

    def _expand(self, searcher):
        text = self.text
        probe = text
        if "|" in probe:
            prefix = ""
        else:
            if probe.startswith("^"):
                probe = probe[1:]
            elif probe.startswith("\\A"):
                probe = probe[2:]
            i = 0
            for i, ch in enumerate(probe):
                if ch in self.SPECIAL_CHARS:
                    break
            prefix = probe[:i]
            # a trailing-stripped * or ? makes the last literal char optional
            lp = len(prefix)
            if lp and lp < len(probe) and probe[lp] in "*?":
                prefix = prefix[:-1]
        pat = re.compile(text)
        cand = (searcher.expand_prefix(self.fieldname, prefix) if prefix
                else searcher.lexicon(self.fieldname))
        return [w for w in cand if pat.match(w)]


class Sequence(Query):
    """Sub-queries matching at successive positions (positional.py:37-120,
    SpanNear semantics with slop/ordered).  All-Term sequences route
    through Phrase (the oracle-pinned sum-of-term-scores rule); arbitrary
    sub-queries (Or, Prefix, nested groups...) build the reference's
    order-preserving binary SpanNear tree (compound.py:218-230 +
    util.make_binary_tree) over the span algebra in search/spans.py."""

    def __init__(self, subqueries, slop: int = 1, ordered: bool = True,
                 boost: float = 1.0):
        self.subqueries = list(subqueries)
        self.slop = slop
        self.ordered = ordered
        self.boost = boost

    def terms(self):
        out = []
        for q in self.subqueries:
            out.extend(q.terms())
        return out

    def _span_tree(self):
        from whoosh_ray.search.spans import SpanNear

        def build(qs):
            if len(qs) == 1:
                return qs[0]
            half = len(qs) // 2
            return SpanNear(build(qs[:half]), build(qs[half:]),
                            slop=self.slop, ordered=self.ordered)

        return build(list(self.subqueries))

    def docs_scores(self, searcher, seg):
        if not all(isinstance(q, Term) for q in self.subqueries):
            ids, scores = self._span_tree().docs_scores(searcher, seg)
            if self.boost != 1.0:
                scores = scores * self.boost
            return ids, scores
        words = [(q.fieldname, q.text) for q in self.subqueries]
        f = words[0][0]
        ph = Phrase(f, [w for _, w in words], slop=self.slop,
                    boost=self.boost)
        return ph.docs_scores(searcher, seg)


class Ordered(Sequence):
    """Sub-queries matching in document order (positional.py:108-118: a
    balanced ``make_binary_tree`` of SpanBefore matchers).  SpanBefore
    keeps a-spans ending before ``min(b span starts)`` (spans.py:838-847),
    and a node's surviving span set keeps its child's minimum — so for
    Term sub-queries the whole tree reduces to one vectorized predicate:
    at every internal node, the FIRST position of the left subtree's
    leftmost term precedes the first position of the right subtree's
    leftmost term.  (NOT a greedy any-ascending-chain: a doc
    ``render .. deploy .. render`` does not match Ordered(deploy,
    render) in the reference — probed and pinned in
    test_conformance.)"""

    def __init__(self, subqueries, boost: float = 1.0):
        super().__init__(subqueries, slop=1, ordered=True, boost=boost)

    def _span_tree(self):
        from whoosh_ray.search.spans import SpanBefore

        def build(qs):
            if len(qs) == 1:
                return qs[0]
            half = len(qs) // 2
            return SpanBefore(build(qs[:half]), build(qs[half:]))

        return build(list(self.subqueries))

    def docs_scores(self, searcher, seg):
        if not all(isinstance(q, Term) for q in self.subqueries):
            ids, scores = self._span_tree().docs_scores(searcher, seg)
            if self.boost != 1.0:
                scores = scores * self.boost
            return ids, scores
        words = [(q.fieldname, q.text) for q in self.subqueries]
        f = words[0][0]
        plists = []
        for _, w in words:
            p = seg.postings(f, w)
            if p is None:
                return matching.empty()
            plists.append(p)
        cand = plists[0].docids
        for p in plists[1:]:
            cand = np.intersect1d(cand, p.docids, assume_unique=True)
        if len(cand) == 0:
            return matching.empty()

        firsts = []
        for _, w in words:
            pf = seg.positions_flat(f, w)
            if pf is None:
                return matching.empty()
            t_docids, flat, offsets = pf
            idx = np.searchsorted(t_docids, cand)
            firsts.append(flat[offsets[idx]].astype(np.int64))

        # conditions of the balanced tree: (leftmost leaf of left half,
        # leftmost leaf of right half) per internal node
        conds = []

        def rec(lo, hi):
            if hi - lo == 1:
                return lo
            half = (hi - lo) // 2
            left = rec(lo, lo + half)
            right = rec(lo + half, hi)
            conds.append((left, right))
            return left

        rec(0, len(words))
        mask = np.ones(len(cand), dtype=bool)
        for left, right in conds:
            mask &= firsts[left] < firsts[right]
        match_ids = cand[mask]
        if not len(match_ids):
            return matching.empty()
        scores = np.zeros(len(match_ids), dtype=np.float64)
        from whoosh_ray.search.scoring import score_postings
        for (_, w), p in zip(words, plists):
            scorer = searcher.scorer(f, w)
            idx = np.searchsorted(p.docids, match_ids)
            scores += score_postings(scorer, match_ids,
                                     p.score_weights[idx], p.len_bytes[idx])
        if self.boost != 1.0:
            scores = scores * self.boost
        return match_ids, scores


class TermRange(_MultiTerm):
    """Lexicographic term range (ranges.py:134-218); constantscore=True by
    default (ranges.py:66, pinned by conformance tests)."""

    def is_range(self):
        return True

    def __init__(self, fieldname, start, end, startexcl: bool = False,
                 endexcl: bool = False, boost: float = 1.0,
                 constantscore: bool = True):
        self.fieldname = fieldname
        self.start, self.end = start, end
        self.startexcl, self.endexcl = startexcl, endexcl
        self.boost, self.constantscore = boost, constantscore

    # comparable bound encodings (reference ranges.py:70-83): the rank
    # element totalizes the Lowest/Highest sentinels; within rank 1 the
    # (value, second) pair compares exactly like the reference's
    def _comparable_start(self):
        if self.start is None:
            return (0, "", 0)
        return (1, self.start, 1 if self.startexcl else 0)

    def _comparable_end(self):
        if self.end is None:
            return (2, "", 0)
        return (1, self.end, -1 if self.endexcl else 0)

    def overlaps(self, other) -> bool:
        """Reference RangeMixin.overlaps (ranges.py:84-98)."""
        if not isinstance(other, TermRange) or \
                self.fieldname != other.fieldname:
            return False
        s1, s2 = self._comparable_start(), other._comparable_start()
        e1, e2 = self._comparable_end(), other._comparable_end()
        return (s2 <= s1 <= e2 or s2 <= e1 <= e2
                or s1 <= s2 <= e1 or s1 <= e2 <= e1)

    def merge(self, other: "TermRange", intersect: bool = True
              ) -> "TermRange":
        """Reference RangeMixin.merge (ranges.py:100-131): containment
        wins, else intersect/union per the enclosing compound; boost =
        max, constantscore = or."""
        s1, s2 = self._comparable_start(), other._comparable_start()
        e1, e2 = self._comparable_end(), other._comparable_end()
        if s1 >= s2 and e1 <= e2:
            start, end = s2, e2
        elif s2 >= s1 and e2 <= e1:
            start, end = s1, e1
        elif intersect:
            start, end = max(s1, s2), min(e1, e2)
        else:
            start, end = min(s1, s2), max(e1, e2)
        return TermRange(
            self.fieldname,
            None if start[0] == 0 else start[1],
            None if end[0] == 2 else end[1],
            startexcl=start[2] == 1, endexcl=end[2] == -1,
            boost=max(self.boost, other.boost),
            constantscore=self.constantscore or other.constantscore)

    def normalize(self):
        # reference TermRange.normalize (ranges.py:164-176): unbounded
        # -> Every(field); degenerate [x TO x] -> Term (boost KEPT
        # here, unlike the multiterm expansion paths); {x TO x} ->
        # null.  The rebuild drops constantscore back to the ctor
        # default — reference quirk preserved.
        if self.start in ("", None) and self.end in ("￿", None):
            return Every(self.fieldname, boost=self.boost)
        if self.start == self.end:
            if self.startexcl or self.endexcl:
                return _NullQuery()
            return Term(self.fieldname, self.start, boost=self.boost)
        return TermRange(self.fieldname, self.start, self.end,
                         self.startexcl, self.endexcl, boost=self.boost)

    def _expand(self, searcher):
        return searcher.term_range(self.fieldname, self.start, self.end,
                                   include_lo=not self.startexcl,
                                   include_hi=not self.endexcl)


class FuzzyTerm(_MultiTerm):
    """Terms within Damerau-Levenshtein ``maxdist`` sharing ``prefixlength``
    initial chars (terms.py:420-486; automaton intersection in the
    reference, reading.py:522-568 — here a vectorized DL distance over the
    prefix-pruned lexicon slice, same result set)."""

    def __init__(self, fieldname, text, boost: float = 1.0, maxdist: int = 1,
                 prefixlength: int = 1, constantscore: bool = True):
        self.fieldname, self.text = fieldname, text
        self.boost, self.maxdist = boost, maxdist
        self.prefixlength = prefixlength

    def has_terms(self):
        return True  # ExpandingTerm (terms.py:329-332)

    def replace(self, fieldname, oldtext, newtext):
        import copy as _copy

        q = _copy.copy(self)
        if q.fieldname == fieldname and q.text == oldtext:
            q.text = newtext
        return q
        self.constantscore = constantscore

    def _expand(self, searcher):
        from whoosh_ray.functions.spelling import levenshtein_batch

        prefix = self.text[: self.prefixlength]
        cand = (searcher.expand_prefix(self.fieldname, prefix) if prefix
                else searcher.lexicon(self.fieldname))
        dists = levenshtein_batch(self.text, cand, self.maxdist)
        return [w for w, d in zip(cand, dists) if d <= self.maxdist]


class Variations(_MultiTerm):
    """Scored expansion to the word's English morphological variations
    present in the index (query/terms.py:488-534 over lang/morph_en's
    LiteMorph_en tables — functions/morph_en.py).  Unlike
    Prefix/Fuzzy, the reference does NOT set constantscore, so the
    expansion is a fully-scored Or (terms.py:150, :207)."""

    def __init__(self, fieldname, text, boost: float = 1.0):
        self.fieldname, self.text = fieldname, text
        self.boost = boost
        self.constantscore = False

    def has_terms(self):
        return True  # ExpandingTerm (terms.py:329-332)

    def replace(self, fieldname, oldtext, newtext):
        import copy as _copy

        q = _copy.copy(self)
        if q.fieldname == fieldname and q.text == oldtext:
            q.text = newtext
        return q

    def _expand(self, searcher):
        from whoosh_ray.functions.morph_en import variations

        return [w for w in variations(self.text)
                if searcher.global_term_info(self.fieldname, w) is not None]


class ColumnQuery(Query):
    """Filter by a predicate over a STORED column — no index involved,
    the docs table is scanned (reference: query/qcolumns.py:32-117, the
    same "use a column instead of the index" tradeoff).  Score = boost."""

    def __init__(self, column: str, predicate, boost: float = 1.0):
        self.column = column
        self.predicate = predicate  # (pyarrow.ChunkedArray) -> bool mask
        self.boost = boost

    def docs_scores(self, searcher, seg):
        t = seg.docs_table(columns=["docid", self.column])
        mask = self.predicate(t[self.column])
        ids = t["docid"].filter(mask).to_numpy()
        if len(seg.deletes):
            ids = ids[seg._mask_deleted(ids)]
        return ids, np.full(len(ids), self.boost, dtype=np.float64)


class NumericRange(ColumnQuery):
    """Numeric range over a stored numeric column.

    The reference implements this with tiered shift terms over a NUMERIC
    field (query/ranges.py:220-317, fields.py:658-671) and scores
    constantscore boost; the docs-column scan here produces the same doc
    set and scores (conformance-tested), expressed as a vectorized Arrow
    predicate per segment instead of a term expansion."""

    def is_range(self):
        return True

    def estimate_size(self, reader):
        # permissible overestimate (qcore.py:515-521); the indexed
        # tiered-shift path would expand terms, the column path scans
        return _reader_doc_count(reader)

    def __init__(self, column: str, start, end, startexcl: bool = False,
                 endexcl: bool = False, boost: float = 1.0):
        import pyarrow.compute as pc

        self.start, self.end = start, end
        self.startexcl, self.endexcl = startexcl, endexcl

        def pred(arr):
            mask = None
            if start is not None:
                m = (pc.greater(arr, start) if startexcl
                     else pc.greater_equal(arr, start))
                mask = m
            if end is not None:
                m = pc.less(arr, end) if endexcl else pc.less_equal(arr, end)
                mask = m if mask is None else pc.and_(mask, m)
            if mask is None:
                mask = pc.is_valid(arr)
            return pc.fill_null(mask, False)

        super().__init__(column, pred, boost)

    @staticmethod
    def _covering(a: int, b: int, step: int,
                  bits: int = 64) -> list[tuple[int, int]]:
        """Minimal covering cells (shift, prefix) of the inclusive
        unsigned range [a, b] — the tiered-term range decomposition
        (ranges.py:220-317 semantics).  Cells never exceed the top
        indexed tier (the largest multiple of ``step`` below ``bits``)."""
        out: list[tuple[int, int]] = []
        max_shift = ((bits - 1) // step) * step
        shift = 0
        while a <= b:
            if shift >= max_shift:
                # top indexed tier: enumerate its cells directly ([a, b]
                # is tier-aligned by construction at this point)
                out.extend((max_shift, p)
                           for p in range(a >> max_shift,
                                          (b >> max_shift) + 1))
                break
            align = 1 << (shift + step)
            unit = 1 << shift
            while a <= b and a % align != 0:
                out.append((shift, a >> shift))
                a += unit
            if a > b:
                break
            # b is the INCLUSIVE end: the cell block is aligned when
            # b+1 is a multiple of align
            while a <= b and (b + 1) % align != 0:
                out.append((shift, b >> shift))
                b -= unit
            if a > b:
                break
            shift += step
        return out

    def _int_bounds(self):
        """(start, end) as ints for the indexed tiered-term path, or
        None to fall back to the stored-column scan."""
        def _int_ok(x):
            return x is None or isinstance(x, (int, np.integer))

        if not _int_ok(self.start) or not _int_ok(self.end):
            return None
        return (None if self.start is None else int(self.start),
                None if self.end is None else int(self.end))

    def docs_scores(self, searcher, seg):
        spec = None
        try:
            spec = searcher.schema.field(self.column)
        except KeyError:
            pass
        bounds = None
        if (spec is not None and spec.kind == "numeric"
                and spec.analyzer.numeric is not None):
            bounds = self._int_bounds()
        if bounds is None:
            # stored-column scan fallback (non-indexed columns,
            # float bounds, unconvertible datetimes)
            return super().docs_scores(searcher, seg)
        istart, iend = bounds
        bits, step = spec.analyzer.numeric
        off = 1 << (bits - 1)
        lo = 0 if istart is None else istart + off
        if istart is not None and self.startexcl:
            lo += 1
        hi = (1 << bits) - 1 if iend is None else iend + off
        if iend is not None and self.endexcl:
            hi -= 1
        lo = max(lo, 0)
        hi = min(hi, (1 << bits) - 1)
        if lo > hi:
            return matching.empty()
        parts = []
        for shift, prefix in self._covering(lo, hi, step, bits):
            # round shift UP to an indexed tier; widen + post-filter?
            # tiers exist at every multiple of step and _covering only
            # emits multiples of step by construction
            p = seg.postings(self.column, f"{shift:02d}:{prefix:x}")
            if p is not None:
                parts.append(p.docids)
        if not parts:
            return matching.empty()
        ids = np.unique(np.concatenate(parts))
        return ids, np.full(len(ids), self.boost, dtype=np.float64)


class DateRange(NumericRange):
    """Datetime range: over a ``FieldSpec.datetime`` field it expands to
    covering tiered shift terms on the epoch-microsecond int64 exactly
    like NumericRange (reference DATETIME-on-NUMERIC machinery,
    fields.py:783-907); otherwise it scans the stored timestamp
    column (same doc set, conformance-tested)."""

    @staticmethod
    def _to_micros(x):
        if x is None:
            return None
        return int(np.datetime64(x, "us").astype(np.int64))

    def _int_bounds(self):
        try:
            return (self._to_micros(self.start), self._to_micros(self.end))
        except (ValueError, TypeError):
            return None


class Phrase(Query):
    """Exact/sloppy ordered phrase over position payloads
    (positional.py:121-249; matching via SpanNear2 semantics: successive
    term positions within [1, slop]).  Scores the sum of the constituent
    terms' scores on matching docs (oracle-pinned)."""

    # per-word original-query char spans, parser-set (positional.py:174)
    char_ranges = None

    def __init__(self, fieldname: str, words: list[str], slop: int = 1,
                 boost: float = 1.0):
        self.fieldname = fieldname
        self.words = list(words)
        self.slop = slop
        self.boost = boost

    def has_terms(self):
        return True  # positional.py:166-167

    def tokens(self, boost: float = 1.0, exreader=None):
        from whoosh_ray.search.highlight import Token

        char_ranges = self.char_ranges
        startchar = endchar = None
        for i, word in enumerate(self.words):
            if char_ranges:
                startchar, endchar = char_ranges[i]
            yield Token(word, startchar, endchar,
                        boost=boost * self.boost,
                        fieldname=self.fieldname)

    def replace(self, fieldname, oldtext, newtext):
        import copy as _copy

        q = _copy.copy(self)
        if q.fieldname == fieldname:
            for i, word in enumerate(q.words):
                if word == oldtext:
                    # NB the shallow copy SHARES the words list, so the
                    # original query's words mutate too — the reference
                    # does exactly this (positional.py:198-204); pinned
                    q.words[i] = newtext
        return q

    def replace(self, fieldname, oldtext, newtext):
        # positional.py:198-204 (every matching word swapped in place)
        import copy as _copy

        q = _copy.copy(self)
        if q.fieldname == fieldname:
            q.words = [newtext if w == oldtext else w for w in q.words]
        return q

    def _and_query(self):
        return And([Term(self.fieldname, w) for w in self.words])

    def estimate_size(self, reader):
        return self._and_query().estimate_size(reader)  # positional.py:210

    def estimate_min_size(self, reader):
        return self._and_query().estimate_min_size(reader)

    def normalize(self):
        # reference Phrase.normalize (positional.py:185-196): empty ->
        # null; one word -> a bare Term (the boost is DROPPED there)
        if not self.words:
            return _NullQuery()
        if len(self.words) == 1:
            return Term(self.fieldname, self.words[0])
        words = [w for w in self.words if w is not None]
        p = Phrase(self.fieldname, words, slop=self.slop,
                   boost=self.boost)
        if self.char_ranges and len(words) == len(self.words):
            p.char_ranges = self.char_ranges
        return p

    def terms(self):
        return [(self.fieldname, w) for w in self.words]

    def docs_scores(self, searcher, seg):
        f = self.fieldname
        plists = []
        for w in self.words:
            p = seg.postings(f, w)
            if p is None:
                return matching.empty()
            plists.append(p)
        # candidate docs = intersection
        cand = plists[0].docids
        for p in plists[1:]:
            cand = np.intersect1d(cand, p.docids, assume_unique=True)
            if len(cand) == 0:
                return matching.empty()
        # positional verification — vectorized over ALL candidate docs at
        # once: encode (candidate-index, position) into one int64 key
        # (docidx << 32 | pos) so the per-doc position intersections of the
        # whole segment happen in single sorted-array operations
        slop = self.slop
        term_keys = []
        for w, p in zip(self.words, plists):
            pf = seg.positions_flat(f, w)
            if pf is None:
                return matching.empty()  # field indexed without positions
            t_docids, flat, offsets = pf
            idx = np.searchsorted(t_docids, cand)
            lens = (offsets[idx + 1] - offsets[idx]).astype(np.int64)
            # gather candidate docs' position runs from the flat stream
            gather_total = int(lens.sum())
            gather = (np.arange(gather_total, dtype=np.int64)
                      - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])),
                                  lens)
                      + np.repeat(offsets[idx], lens))
            pvals = flat[gather]
            docidx = np.repeat(np.arange(len(cand), dtype=np.int64), lens)
            term_keys.append((docidx << np.int64(32)) | pvals.astype(np.int64))
        current = term_keys[0]
        for t in range(1, len(self.words)):
            nxt = term_keys[t]
            if slop == 1:
                current = np.intersect1d(current + 1, nxt,
                                         assume_unique=True)
            else:
                parts = [np.intersect1d(current + delta, nxt,
                                        assume_unique=True)
                         for delta in range(1, slop + 1)]
                current = np.unique(np.concatenate(parts))
            if len(current) == 0:
                return matching.empty()
        match_ids = cand[np.unique(current >> np.int64(32))]
        if len(match_ids) == 0:
            return matching.empty()
        # score: sum of term scores on the matching docs
        scores = np.zeros(len(match_ids), dtype=np.float64)
        from whoosh_ray.search.scoring import score_postings
        for w, p in zip(self.words, plists):
            scorer = searcher.scorer(f, w)
            idx = np.searchsorted(p.docids, match_ids)
            scores += score_postings(scorer, match_ids,
                                     p.score_weights[idx], p.len_bytes[idx])
        if self.boost != 1.0:
            scores = scores * self.boost
        return match_ids, scores


# ---- reference string rendering (Query.__unicode__/__str__) ----
# Format-for-format with the reference so parsed-query dumps compare
# (terms.py:68-81, compound.py:55-59,311-317,461-467,546-634 JOINTs,
# ranges.py:44-50, positional.py:155-156, wrappers.py:108-109,
# qcore.py:602,710-711).  Only classes the reference renders get a
# __str__; everything else keeps the dataclass/default repr.

def _qstr(q) -> str:
    return str(q)


def _term_str(self) -> str:
    t = f"{self.fieldname}:{self.text}"
    if self.boost != 1:
        t += f"^{self.boost}"
    return t


Term.__str__ = _term_str
Prefix.__str__ = lambda self: f"{self.fieldname}:{self.text}*"
Wildcard.__str__ = lambda self: f"{self.fieldname}:{self.text}"
Regex.__str__ = lambda self: f'{self.fieldname}:r"{self.text}"'
Variations.__str__ = lambda self: f"{self.fieldname}:<{self.text}>"
Every.__str__ = lambda self: f"{self.fieldname}:*"
_NullQuery.__str__ = lambda self: "<_NullQuery>"
Not.__str__ = lambda self: "NOT " + _qstr(self.subquery)
Phrase.__str__ = lambda self: f'{self.fieldname}:"{" ".join(self.words)}"'


def _compound_str(self) -> str:
    return "(" + self.JOINT.join(_qstr(s) for s in self.subqueries) + ")"


And.__str__ = _compound_str


def _or_str(self) -> str:
    r = "(" + self.JOINT.join(_qstr(s) for s in self.subqueries) + ")"
    if self.minmatch:
        r += f">{self.minmatch}"
    return r


Or.__str__ = _or_str


def _dismax_str(self) -> str:
    r = "DisMax(" + " ".join(sorted(_qstr(s)
                                    for s in self.subqueries)) + ")"
    if self.tiebreak:
        r += f"~{self.tiebreak}"
    return r


DisjunctionMax.__str__ = _dismax_str


def _binary_str(joint):
    def render(self):
        return "(" + _qstr(self.a) + joint + _qstr(self.b) + ")"
    return render


AndNot.__str__ = _binary_str(" ANDNOT ")
Require.__str__ = _binary_str(" REQUIRE ")
AndMaybe.__str__ = _binary_str(" ANDMAYBE ")
Otherwise.__str__ = _binary_str(" OTHERWISE ")


def _range_str(self) -> str:
    sc = "{" if self.startexcl else "["
    ec = "}" if self.endexcl else "]"
    start = "" if self.start is None else self.start
    end = "" if self.end is None else self.end
    return f"{self.fieldname}:{sc}{start} TO {end}{ec}"


TermRange.__str__ = _range_str
NumericRange.__str__ = _range_str
DateRange.__str__ = _range_str


# sequence protocol on the binary queries (reference BinaryQuery sets
# subqueries=(a, b) and inherits compound.py:69-76; here the pair
# protocol is added directly — children() already walks .a/.b)
def _bin_getitem(self, i):
    return (self.a, self.b)[i]


def _bin_len(self):
    return 2


def _bin_iter(self):
    return iter((self.a, self.b))


for _cls in (AndNot, Require, AndMaybe, Otherwise):
    _cls.__getitem__ = _bin_getitem
    _cls.__len__ = _bin_len
    _cls.__iter__ = _bin_iter
del _cls
