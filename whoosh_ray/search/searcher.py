"""Searcher: multi-segment BM25F top-k with global statistics.

Reference lifecycle analogue (SURVEY.md §3.3): open latest TOC → one
reader per segment (MultiReader with doc offsets, index.py:496-562) →
per-segment matcher trees scored with the PARENT searcher's global
idf/avgfl (searching.py:285-316, scoring.py:317-332) → bounded top-k
with the (−score, docid) tie-break (collectors.py:465-480).

Here: manifest → SegmentReader per partition → vectorized per-segment
(docids, scores) → concatenate → one argsort.  Global docids need no
offset arithmetic — they are stable ranks assigned at build time.  The
distributed path (search/dist.py) fans the same per-segment evaluation
out over an actor pool and merges per-segment top-k.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from whoosh_ray.search import scoring
from whoosh_ray.search.query import Query
from whoosh_ray.state.manifest import Manifest, read_manifest
from whoosh_ray.state.segment import SegmentReader


class TimeLimit(Exception):
    """Raised when a time-limited search exceeds its budget
    (reference: searching.TimeLimit via TimeLimitCollector,
    collectors.py:1006-1102).  ``partial`` holds the results collected
    so far — the reference exposes the same via
    ``collector.results()`` after catching the exception."""

    def __init__(self, partial: "Results"):
        super().__init__("search time limit exceeded")
        self.partial = partial


class Results:
    """Ranked hits: global docids + float64 scores (+ lazy stored fields)."""

    def __init__(self, searcher: "Searcher", docids: np.ndarray,
                 scores: np.ndarray):
        self.searcher = searcher
        self.docids = docids
        self.scores = scores

    # search(scored=False): scores are not computed — score accessors
    # return None (reference UnsortedCollector results)
    _unscored = False

    def __len__(self):
        return len(self.docids)

    def __iter__(self):
        """Iterate :class:`Hit` objects in rank order — the reference
        Results protocol (searching.py:1010-1016), so
        ``for hit in results: hit["field"]`` ports unchanged.  The
        batch engine's native (docid, score) pairs are :meth:`pairs`."""
        return (Hit(self, i) for i in range(len(self.docids)))

    def pairs(self):
        """Iterator of (docid, score) tuples in rank order; score is
        None for unscored searches."""
        if self._unscored:
            return iter((d, None) for d in self.docids.tolist())
        return iter(zip(self.docids.tolist(), self.scores.tolist()))

    # populated by search(terms=True): {(field, term): matching result docids}
    termdocs: dict | None = None
    # populated by search(groupedby=...): facet name -> groups dict
    _groups: dict | None = None
    # populated by search(collapse=...): {collapse key: docs removed}
    # (the reference exposes these on CollapseCollector,
    # collectors.py:860-866; here they ride the Results)
    collapsed_counts: dict | None = None
    collapsed_total: int = 0

    def groups(self, name: str | None = None) -> dict:
        """Facet groups recorded by ``search(groupedby=...)``
        (reference: Results.groups, searching.py:1072-1105): with one
        facet the name may be omitted."""
        if not self._groups:
            raise ValueError("search() was not run with groupedby=")
        if name is None:
            if len(self._groups) == 1:
                return next(iter(self._groups.values()))
            raise KeyError("multiple facets — pass a name: "
                           + ", ".join(self._groups))
        return self._groups[name]

    def matched_terms(self) -> set:
        """TermsCollector parity (collectors.py:1103-1165): the query terms
        that matched at least one result document."""
        if self.termdocs is None:
            raise ValueError("search() was not run with terms=True")
        return set(self.termdocs.keys())

    def matched_terms_for(self, docid: int) -> set:
        if self.termdocs is None:
            raise ValueError("search() was not run with terms=True")
        return {k for k, v in self.termdocs.items() if docid in v}

    def query_terms(self, expand: bool = False,
                    fieldname: str | None = None) -> set:
        """(fieldname, text) pairs of the query that exist in the index
        (reference Results.query_terms, searching.py:1176-1178)."""
        if self.q is None:
            return set()
        return self.q.existing_terms(self.searcher.reader(),
                                     fieldname=fieldname, expand=expand)

    # ---- result-set combination (reference searching.py:1275-1345) ----

    def extend(self, other: "Results") -> None:
        """Append the other's hits not already here (their order)."""
        mask = ~np.isin(other.docids, self.docids)
        self.docids = np.concatenate([self.docids, other.docids[mask]])
        self.scores = np.concatenate([self.scores, other.scores[mask]])

    def filter(self, other: "Results") -> None:
        """Keep only hits also present in the other results; the
        reference no-ops on an empty other (searching.py:1293)."""
        if not len(other):
            return
        keep = np.isin(self.docids, other.docids)
        self.docids, self.scores = self.docids[keep], self.scores[keep]

    def upgrade(self, other: "Results", reverse: bool = False) -> None:
        """Stable-partition: hits also in the other move to the front
        (or back with ``reverse``), relative order preserved; adds
        nothing."""
        if not len(other):
            return
        inother = np.isin(self.docids, other.docids)
        order = (np.concatenate([np.flatnonzero(~inother),
                                 np.flatnonzero(inother)]) if reverse
                 else np.concatenate([np.flatnonzero(inother),
                                      np.flatnonzero(~inother)]))
        self.docids, self.scores = self.docids[order], self.scores[order]

    def upgrade_and_extend(self, other: "Results") -> None:
        """upgrade + extend in one step (searching.py:1326-1345)."""
        if not len(other):
            return
        mine = self.docids
        self.upgrade(other)
        mask = ~np.isin(other.docids, mine)
        self.docids = np.concatenate([self.docids, other.docids[mask]])
        self.scores = np.concatenate([self.scores, other.scores[mask]])

    def docid_set(self):
        """The result docids as a compact DocIdSet (roaring above the
        container cutoff) — the broadcastable currency for chaining
        ``search(filter=...)`` calls and for shipping to shard actors
        (reference: Results.docs / docset, searching.py:1046-1070)."""
        from whoosh_ray.functions.idsets import as_id_set

        return as_id_set(self.docids)

    # the (expanded) query that produced these results, when known —
    # lets Hit.highlights derive its term set without re-parsing
    q = None
    # shared across this result set's Hits (reference Results.highlighter,
    # searching.py:961) — built lazily; the fragmenter/formatter/scorer/
    # order properties below mutate it exactly like the reference's
    # (searching.py:1216-1245)
    _highlighter = None

    @property
    def highlighter(self):
        if self._highlighter is None:
            from whoosh_ray.search.highlight import Highlighter

            self._highlighter = Highlighter()
        return self._highlighter

    @highlighter.setter
    def highlighter(self, hl):
        self._highlighter = hl

    def _get_fragmenter(self):
        return self.highlighter.fragmenter

    def _set_fragmenter(self, f):
        self.highlighter.fragmenter = f

    fragmenter = property(_get_fragmenter, _set_fragmenter)

    def _get_formatter(self):
        return self.highlighter.formatter

    def _set_formatter(self, f):
        self.highlighter.formatter = f

    formatter = property(_get_formatter, _set_formatter)

    def _get_scorer(self):
        return self.highlighter.scorer

    def _set_scorer(self, s):
        self.highlighter.scorer = s

    scorer = property(_get_scorer, _set_scorer)

    def _get_order(self):
        return self.highlighter.order

    def _set_order(self, o):
        self.highlighter.order = o

    order = property(_get_order, _set_order)

    def items(self):
        """Iterator of (docnum, score) pairs in rank order (reference
        Results.items, searching.py:1024-1029)."""
        if self._unscored:
            return ((d, None) for d in self.docids.tolist())
        return zip(self.docids.tolist(), self.scores.tolist())

    def __getitem__(self, n):
        """``results[n]`` -> :class:`Hit` (reference searching.py:996-
        1004); slices give lists of Hits.  ``__iter__`` also yields
        Hits (reference protocol); (docid, score) tuples are
        :meth:`pairs` / :meth:`items`."""
        if isinstance(n, slice):
            return [Hit(self, i)
                    for i in range(*n.indices(len(self.docids)))]
        if n < 0:
            n += len(self.docids)
        return Hit(self, n)

    def hits(self):
        """Iterator of :class:`Hit` objects in rank order."""
        return (Hit(self, i) for i in range(len(self.docids)))

    def scored_length(self) -> int:
        return len(self.docids)

    def score(self, n: int) -> float | None:
        if self._unscored:
            return None
        return float(self.scores[n])

    def docnum(self, n: int) -> int:
        return int(self.docids[n])

    def is_empty(self) -> bool:
        return len(self.docids) == 0

    def docs(self) -> set:
        """Set of matching docnums (reference Results.docs,
        searching.py:1046-1053)."""
        return set(self.docids.tolist())

    def fields(self, n: int) -> dict:
        """Stored fields of the nth hit (searching.py:1014-1020)."""
        return self[n].fields()

    def estimated_length(self) -> int:
        return len(self.docids)

    def estimated_min_length(self) -> int:
        return len(self.docids)

    def has_exact_length(self) -> bool:
        return True  # the batch engine always evaluates exactly

    def facet_names(self) -> list:
        """Names recorded by search(groupedby=...)
        (searching.py:1066-1070)."""
        return list(self._groups or {})

    def has_matched_terms(self) -> bool:
        return self.termdocs is not None

    def copy(self) -> "Results":
        r = Results(self.searcher, self.docids.copy(), self.scores.copy())
        r.termdocs = dict(self.termdocs) if self.termdocs else None
        r._groups = dict(self._groups) if self._groups else None
        r.q = self.q
        return r

    def key_terms(self, fieldname: str, docs: int = 10,
                  numterms: int = 5) -> list:
        """Most important terms of the top ``docs`` hits (reference
        Results.key_terms, searching.py:1247-1273)."""
        return self.searcher.key_terms(self.docids[:docs], fieldname,
                                       numterms=numterms)

    def to_arrow(self, columns: list[str] | None = None) -> pa.Table:
        """(rank, docid, score) + stored fields, in rank order."""
        stored = self.searcher.stored(self.docids, columns=columns)
        rank = pa.array(np.arange(len(self.docids)), type=pa.int64())
        out = pa.table(
            {
                "rank": rank,
                "docid": pa.array(self.docids, type=pa.int64()),
                "score": pa.array(self.scores, type=pa.float64()),
            }
        )
        for name in stored.column_names:
            if name != "docid":
                out = out.append_column(name, stored[name])
        return out


class Hit:
    """Dict-like view of one result's stored fields plus rank/score
    metadata (reference searching.py:1348-1440): ``hit["text"]``,
    ``hit.score``, ``hit.highlights(...)``.  Stored fields load lazily
    on first access — iterating ranks without touching fields reads
    nothing."""

    def __init__(self, results: Results, rank: int):
        self.results = results
        self.searcher = results.searcher
        self.pos = self.rank = rank
        self.docid = self.docnum = int(results.docids[rank])
        self.score = (None if results._unscored
                      else float(results.scores[rank]))
        self._fields: dict | None = None

    def fields(self) -> dict:
        if self._fields is None:
            t = self.searcher.stored(np.array([self.docid]))
            row = t.to_pylist()[0] if t.num_rows else {}
            self._fields = {k: v for k, v in row.items() if k != "docid"}
        return self._fields

    def __getitem__(self, key):
        return self.fields()[key]

    def get(self, key, default=None):
        return self.fields().get(key, default)

    def __contains__(self, key):
        return key in self.fields()

    def keys(self):
        return self.fields().keys()

    def items(self):
        return self.fields().items()

    def values(self):
        return self.fields().values()

    # py2-era iterator aliases the reference still ships
    # (searching.py:1466-1476)
    def iterkeys(self):
        return iter(self.fields().keys())

    def itervalues(self):
        return iter(self.fields().values())

    def iteritems(self):
        return iter(self.fields().items())

    def __iter__(self):
        return iter(self.fields().keys())

    def __len__(self):
        return len(self.fields())

    def _readonly(self, *a, **kw):
        """Hits are read-only views (reference searching.py:1478-1496
        raises NotImplementedError from every mutator)."""
        raise NotImplementedError("You cannot modify a search result")

    __setitem__ = _readonly
    __delitem__ = _readonly
    clear = _readonly
    update = _readonly
    setdefault = _readonly
    pop = _readonly
    popitem = _readonly

    def __repr__(self):
        return f"<Hit {self.fields()!r}>"

    def matched_terms(self) -> set:
        return self.results.matched_terms_for(self.docid)

    def highlights(self, fieldname: str, top: int = 3, *,
                   text: str | None = None, minscore: int = 1,
                   strict_phrase: bool = False, **kwargs) -> str:
        """Highlighted snippets using the originating query's terms for
        this field (reference Hit.highlights, searching.py:1417-1453).
        Config (fragmenter/formatter/scorer/order) comes from the result
        set's shared ``highlighter`` unless overridden per call — setting
        ``results.formatter = ...`` changes every hit's highlights, and
        the formatter's term->class state persists across hits like the
        reference's per-Results highlighter (searching.py:961).
        ``strict_phrase`` highlights phrase constituents only where the
        whole phrase matches (highlight.py:1043-1045); the reference
        derives both lists from the FULL query there, unfiltered by
        field — mirrored.  ``text`` overrides the stored text (for
        unstored fields)."""
        if strict_phrase:
            if self.results.q is None:
                raise ValueError("results carry no query to highlight "
                                 "from")
            qterms, phrases = self.results.q.phrases()
            kwargs["phrases"] = phrases
            terms = sorted({t.text for t in qterms})
            hl = self.results.highlighter
            kwargs.setdefault("formatter", hl.formatter)
            kwargs.setdefault("fragmenter", hl.fragmenter)
            kwargs.setdefault("scorer", hl.scorer)
            kwargs.setdefault("order", hl.order)
            return self.searcher.highlights(self.docid, fieldname, terms,
                                            top=top, text=text,
                                            minscore=minscore, **kwargs)
        if self.results.has_matched_terms():
            # the reference derives the word set from the whole result
            # set's matched terms when terms=True was used
            # (highlight.py:1003-1005)
            terms = sorted({t for f, t in self.results.matched_terms()
                            if f == fieldname})
        elif self.results.q is None:
            raise ValueError("results carry no query to highlight from")
        else:
            # else the EXPANDED query terms (Prefix/Wildcard resolved
            # against the reader — highlight.py:1007)
            terms = sorted({t for f, t in self.results.query_terms(
                expand=True, fieldname=fieldname) if f == fieldname})
        hl = self.results.highlighter
        kwargs.setdefault("formatter", hl.formatter)
        kwargs.setdefault("fragmenter", hl.fragmenter)
        kwargs.setdefault("scorer", hl.scorer)
        kwargs.setdefault("order", hl.order)
        return self.searcher.highlights(self.docid, fieldname, terms,
                                        top=top, text=text,
                                        minscore=minscore, **kwargs)

    def more_like_this(self, fieldname: str, **kwargs) -> Results:
        """Docs similar to this hit (reference searching.py:1390-1404)."""
        return self.searcher.more_like(self.docid, fieldname, **kwargs)


class ResultsPage:
    """One page of a longer result list (reference ResultsPage,
    searching.py:1553-1652): ``pagenum`` clamps to ``pagecount`` (the
    reference docstring threatens ValueError but the code clamps),
    ``offset``/``pagelen`` adjust on the last page, indexing and
    iteration are page-relative Hits, ``len()`` is the TOTAL hit
    count."""

    def __init__(self, results: Results, pagenum: int, pagelen: int = 10):
        import math

        self.results = results
        self.total = len(results)
        if pagenum < 1:
            raise ValueError("pagenum must be >= 1")
        self.pagecount = int(math.ceil(self.total / pagelen))
        self.pagenum = min(self.pagecount, pagenum)
        offset = (self.pagenum - 1) * pagelen
        if offset + pagelen > self.total:
            pagelen = self.total - offset
        self.offset = offset
        self.pagelen = pagelen

    def __getitem__(self, n):
        if isinstance(n, slice):
            start, stop, step = n.indices(self.pagelen)
            return self.results[start + self.offset:
                                stop + self.offset:step]
        return self.results[n + self.offset]

    def __iter__(self):
        return iter(self.results[self.offset:self.offset + self.pagelen])

    def __len__(self):
        return self.total

    def scored_length(self) -> int:
        return self.results.scored_length()

    def score(self, n: int) -> float:
        return self.results.score(n + self.offset)

    def docnum(self, n: int) -> int:
        return self.results.docnum(n + self.offset)

    def is_last_page(self) -> bool:
        return self.pagecount == 0 or self.pagenum == self.pagecount


class SearchContext:
    """Carrier of search-time knobs (reference searching.py:81-117):
    attribute bag with the reference's ``set`` copy-with-overrides."""

    def __init__(self, needs_current: bool = False, weighting=None,
                 top_query=None, limit: int = 0):
        self.needs_current = needs_current
        self.weighting = weighting
        self.top_query = top_query
        self.limit = limit

    def set(self, **kwargs) -> "SearchContext":
        out = SearchContext(self.needs_current, self.weighting,
                            self.top_query, self.limit)
        for k, v in kwargs.items():
            setattr(out, k, v)
        return out

    def __repr__(self):  # pragma: no cover
        return (f"SearchContext(needs_current={self.needs_current}, "
                f"weighting={self.weighting!r}, limit={self.limit})")


class Collector:
    """Captured ``search(...)`` keyword arguments, runnable via
    ``Searcher.search_with_collector`` (the reference's collector
    objects, collectors.py:62-180, built by Searcher.collector).
    ``results()`` after the run; on a TimeLimit the partial results are
    retained, exactly like the reference's TimeLimitCollector."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.timelimit: float | None = None
        self.greedy: bool = False
        self._results: Results | None = None

    def results(self) -> Results:
        if self._results is None:
            raise ValueError("collector has not been run yet")
        return self._results

    def _run(self, searcher: "Searcher", q: Query) -> None:
        if self.timelimit is not None:
            kw = dict(self.kwargs)
            limit = kw.pop("limit", 10)
            try:
                self._results = searcher.search_with_timelimit(
                    q, limit, timelimit=self.timelimit,
                    greedy=self.greedy, **kw)
            except TimeLimit as e:
                self._results = e.partial
                raise
        else:
            self._results = searcher.search(q, **self.kwargs)


class TimeLimitCollector(Collector):
    """Wrap a collector with a wall-clock budget (reference
    collectors.py:1006-1102): raises :class:`TimeLimit` when exceeded;
    ``results()`` then returns the partial set."""

    def __init__(self, child: Collector, timelimit: float,
                 greedy: bool = False):
        super().__init__(**child.kwargs)
        self.timelimit = timelimit
        self.greedy = greedy
        self._child = child

    def _run(self, searcher: "Searcher", q: Query) -> None:
        try:
            super()._run(searcher, q)
        finally:
            self._child._results = self._results


class Searcher:
    def __init__(self, index_dir: str, manifest: Manifest | None = None,
                 weighting: scoring.WeightingModel | None = None,
                 extra_segments: "tuple[SegmentReader, ...]" = ()):
        self.index_dir = index_dir
        self.manifest = manifest or read_manifest(index_dir)
        try:
            self._manifest_mtime = os.path.getmtime(
                os.path.join(index_dir, "manifest.json"))
        except OSError:
            self._manifest_mtime = None
        if extra_segments:
            # overlay readers (e.g. BufferedWriter's RAM segment): their
            # metas join the manifest so doc_count_all / avg_field_length
            # include the overlay docs — MultiReader semantics
            # (reference writing.py:1206-1219 BufferedWriter.reader)
            self.manifest = Manifest(
                schema=self.manifest.schema,
                segments=list(self.manifest.segments)
                + [r.meta for r in extra_segments],
                settings=self.manifest.settings,
            )
        self.schema = self.manifest.schema
        self.weighting = weighting or scoring.BM25F()
        extra_ids = {id(r.meta) for r in extra_segments}
        # OverlayStorage facade: segments whose files live in the base
        # index resolve there per-file (whoosh_ray.index.open_overlay)
        fb = self.manifest.settings.get("overlay_base")
        self.segments = [
            next(r for r in extra_segments if r.meta is m)
            if id(m) in extra_ids
            else SegmentReader(index_dir, m, self.schema, fallback_dir=fb)
            # docid-range order (NOT seg_id order): merged segments get
            # fresh ids, so only the range start orders segments such
            # that _seg_index_of's searchsorted mapping is valid.
            for m in sorted(self.manifest.segments,
                            key=lambda m: m.docid_range()[0])
        ]
        self._ti_cache: dict[tuple[str, str], dict | None] = {}
        self._idf_cache: dict[tuple[str, str], float] = {}
        self._scorer_cache: dict[tuple[str, str], scoring.Scorer] = {}
        self._eval_cache: dict[tuple[int, int], tuple] = {}
        self._global_cache: dict[int, tuple] = {}
        self._all_docids = None

    # ---- global statistics ----

    @property
    def doc_count_all(self) -> int:
        return self.manifest.doc_count_all

    def doc_count(self) -> int:
        """UNDELETED document count (reference searching.py:195-199 /
        reading.py:959; doc_count_all stays the stats denominator until
        a merge expunges tombstones — reference parity)."""
        return self.doc_count_all - sum(len(s.deletes)
                                        for s in self.segments)

    def avg_field_length(self, fieldname: str) -> float:
        return self.manifest.avg_field_length(fieldname)

    def global_term_info(self, fieldname: str, text: str) -> dict | None:
        """TermInfo merged across segments (MultiReader semantics,
        reading.py:1218-1260)."""
        key = (fieldname, text)
        if key in self._ti_cache:
            return self._ti_cache[key]
        merged: dict | None = None
        for seg in self.segments:
            ti = seg.term_info(fieldname, text)
            if ti is None:
                continue
            if merged is None:
                merged = dict(ti)
            else:
                merged["df"] += ti["df"]
                merged["sum_tf"] += ti["sum_tf"]
                merged["total_weight"] += ti["total_weight"]
                merged["max_weight"] = max(merged["max_weight"], ti["max_weight"])
                merged["min_length"] = min(merged["min_length"], ti["min_length"])
                merged["max_length"] = max(merged["max_length"], ti["max_length"])
                merged["min_docid"] = min(merged["min_docid"], ti["min_docid"])
                merged["max_docid"] = max(merged["max_docid"], ti["max_docid"])
        self._ti_cache[key] = merged
        return merged

    def doc_frequency(self, fieldname: str, text: str) -> int:
        ti = self.global_term_info(fieldname, text)
        return ti["df"] if ti else 0

    def frequency(self, fieldname: str, text: str) -> float:
        ti = self.global_term_info(fieldname, text)
        return ti["total_weight"] if ti else 0.0

    def idf(self, fieldname: str, text: str) -> float:
        """Parity: scoring.py:53-60 + per-searcher cache searching.py:318-334."""
        key = (fieldname, text)
        if key not in self._idf_cache:
            self._idf_cache[key] = scoring.idf(
                self.doc_count_all, self.doc_frequency(fieldname, text))
        return self._idf_cache[key]

    def scorer(self, fieldname: str, text: str) -> scoring.Scorer:
        key = (fieldname, text)
        if key not in self._scorer_cache:
            self._scorer_cache[key] = self.weighting.scorer(self, fieldname, text)
        return self._scorer_cache[key]

    # ---- lexicon ----

    def expand_prefix(self, fieldname: str, prefix: str) -> list[str]:
        out: set[str] = set()
        for seg in self.segments:
            out.update(seg.expand_prefix(fieldname, prefix))
        return sorted(out)

    def lexicon(self, fieldname: str) -> list[str]:
        out: set[str] = set()
        for seg in self.segments:
            out.update(seg.all_terms(fieldname))
        return sorted(out)

    def _merged_prefix_stats(self, fieldname: str, prefix: str):
        """(terms, weights, dfs) summed across segments for the prefix
        range — prefix-pruned zero-copy slices per segment, one pandas
        merge.  For full-lexicon sweeps at cluster scale use the
        distributed ``pipelines.ir.term_stats_table`` plan instead."""
        import pandas as pd

        parts = [seg.stats_slice(fieldname, prefix)
                 .select(["term", "df", "total_weight"])
                 for seg in self.segments]
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return [], np.empty(0), np.empty(0, dtype=np.int64)
        pdf = (pa.concat_tables(parts).to_pandas()
               .groupby("term", sort=False).sum())
        return (pdf.index.tolist(), pdf["total_weight"].to_numpy(),
                pdf["df"].to_numpy())

    def most_frequent_terms(self, fieldname: str, number: int = 5,
                            prefix: str = "") -> list[tuple]:
        """Top terms by total weight as (frequency, text) tuples —
        reference reading.py:551-558 incl. nlargest's larger-text
        tie-break."""
        from heapq import nlargest

        terms, weights, _dfs = self._merged_prefix_stats(fieldname,
                                                         prefix)
        return nlargest(number, zip(weights.tolist(), terms))

    def most_distinctive_terms(self, fieldname: str, number: int = 5,
                               prefix: str = "") -> list[tuple]:
        """Top terms by weight * log(N / df) (tf-idf; reference
        reading.py:560-569, N = UNDELETED doc count)."""
        from heapq import nlargest

        terms, weights, dfs = self._merged_prefix_stats(fieldname,
                                                        prefix)
        n = float(self.doc_count())
        scores = weights * np.log(n / dfs)
        return nlargest(number, zip(scores.tolist(), terms))

    def documents(self, **kw):
        """Stored fields of every document whose indexed fields match
        the keyword terms; no kwargs yields ALL documents (reference
        searching.py:360-376)."""
        if kw:
            from whoosh_ray.search.query import And, Term

            qs = [Term(k, v) for k, v in kw.items()]
            q = qs[0] if len(qs) == 1 else And(qs)
            docids = self.search(q, limit=None).docids
        else:
            docids = self.all_docids()
        stored = self.stored(docids)
        return iter(stored.to_pylist())

    def document(self, **kw):
        """First matching stored-fields dict or None (reference
        searching.py:336-358)."""
        for d in self.documents(**kw):
            return d
        return None

    def field_length(self, fieldname: str) -> int:
        """Total (exact, unquantized) token count of the field
        (reference searching.py:322-330 → reader.field_length)."""
        return self.manifest.field_length(fieldname)

    def _field_length_bounds(self, fieldname: str) -> tuple[int, int] | None:
        """(min, max) per-doc quantized length BYTES over every posting
        of the field, or None when the field has no postings."""
        lo, hi = 256, -1
        import pyarrow.compute as pc

        for seg in self.segments:
            sl = seg.stats_slice(fieldname)
            if sl.num_rows:
                lo = min(lo, pc.min(sl["min_length"]).as_py())
                hi = max(hi, pc.max(sl["max_length"]).as_py())
        return None if hi < 0 else (lo, hi)

    def min_field_length(self, fieldname: str) -> int:
        """Smallest per-doc field length, decoded from the quantized
        byte exactly like the reference (reading.py:971-976 →
        byte_to_length of the perdoc min byte).  DOCUMENTED DIVERGENCE:
        a doc whose field analyzed to zero tokens emits no postings and
        is invisible to this posting-derived statistic, so the min
        floors at the shortest POSTED doc; the reference's perdoc store
        records such docs as length 0."""
        from whoosh_ray.functions.lengths import byte_to_length

        b = self._field_length_bounds(fieldname)
        return 0 if b is None else int(byte_to_length(b[0]))

    def max_field_length(self, fieldname: str) -> int:
        from whoosh_ray.functions.lengths import byte_to_length

        b = self._field_length_bounds(fieldname)
        return 0 if b is None else int(byte_to_length(b[1]))

    def postings(self, fieldname: str, text: str):
        """Raw postings of one term across all segments with deletes
        applied: (global docids, weights) numpy arrays — the engine's
        matcher currency (reference Searcher.postings returns a pull
        Matcher, searching.py:397-415)."""
        ids, ws = [], []
        for seg in self.segments:
            p = seg.postings(fieldname, str(text))
            if p is not None and len(p.docids):
                ids.append(p.docids)
                ws.append(p.weights if p.weights is not None
                          else p.tfs.astype(np.float64))
        if not ids:
            from whoosh_ray.search.matching import empty

            return empty()
        return (np.concatenate(ids),
                np.concatenate(ws).astype(np.float64))

    def docs_for_query(self, q: "Query"):
        """Iterator of every matching docnum in docid order (reference
        searching.py:488-510)."""
        r = self.search(q, limit=None)
        return iter(np.sort(r.docids).tolist())

    def document_numbers(self, **kw):
        """Docnums whose indexed fields match the keyword terms
        (reference searching.py:379-394)."""
        if not kw:
            return iter(self.all_docids().tolist())
        from whoosh_ray.search.query import And, Term

        qs = [Term(k, v) for k, v in kw.items()]
        return self.docs_for_query(qs[0] if len(qs) == 1 else And(qs))

    def document_number(self, **kw):
        """First matching docnum or None (reference searching.py:
        366-377)."""
        for d in self.document_numbers(**kw):
            return d
        return None

    def refresh(self) -> "Searcher":
        """A Searcher over the latest commit — self when nothing
        changed (reference searching.py:167-186)."""
        if self.up_to_date():
            return self
        return Searcher(self.index_dir, weighting=self.weighting)

    def up_to_date(self) -> bool:
        if self._manifest_mtime is None:
            return True
        path = os.path.join(self.index_dir, "manifest.json")
        # prefer the monotonic generation counter: two commits in one
        # timestamp tick are indistinguishable by mtime (ADVICE r3)
        mine = self.manifest.settings.get("generation")
        if mine is not None:
            try:
                import json as _json

                with open(path) as f:
                    disk = (_json.load(f).get("settings", {})
                            .get("generation"))
            except (OSError, ValueError):
                return True
            if disk is not None:
                return int(disk) <= int(mine)
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            return True
        return mtime <= self._manifest_mtime

    def term_range(self, fieldname: str, lo, hi, *, include_lo=True,
                   include_hi=False) -> list[str]:
        out: set[str] = set()
        for seg in self.segments:
            out.update(seg.term_range(fieldname, lo, hi,
                                      include_lo=include_lo,
                                      include_hi=include_hi))
        return sorted(out)

    # ---- lifecycle (reference searching.py Searcher is a context
    # manager; nothing to release here — segments are read per call) ----

    def reader(self):
        """The reference's ``Searcher.reader()`` surface — term
        dictionary iteration with TermInfo stats, stored-field/doc
        iteration, per-doc lengths, deletions, vectors, correctors,
        sortable columns (:mod:`whoosh_ray.search.reader`)."""
        from whoosh_ray.search.reader import IndexReader

        return IndexReader(self)

    # ---- reference Searcher conveniences (searching.py:120-320) ----

    def is_atomic(self) -> bool:
        return len(self.segments) <= 1

    def leaf_searchers(self):
        """[(segment reader, docid offset)] — the per-segment leaves
        (reference searching.py:141-147)."""
        return [(seg, seg.meta.docid_range()[0]) for seg in self.segments]

    def has_parent(self) -> bool:
        return False  # this engine's searchers are never sub-searchers

    def get_parent(self) -> "Searcher":
        """Reference searching.py:166-173 — self when not a child."""
        return self

    def context(self, **kwargs) -> "SearchContext":
        """A SearchContext carrying the effective weighting (reference
        searching.py:175-186)."""
        kwargs.setdefault("weighting", self.weighting)
        return SearchContext(**kwargs)

    def boolean_context(self) -> "SearchContext":
        """Context for unscored (needs_current=False) evaluation
        (reference searching.py:188-193)."""
        return self.context(needs_current=False, weighting=None)

    def find(self, defaultfield: str, querystring: str, **kwargs):
        """Parse with QueryParser and search (reference
        searching.py:314-320)."""
        from whoosh_ray.search.qparser import QueryParser

        q = QueryParser(defaultfield, self.schema).parse(querystring)
        return self.search(q, **kwargs)

    def collector(self, **kwargs) -> "Collector":
        """Capture search(...) arguments as a reusable collector
        (reference Searcher.collector, searching.py:506-556); run it
        with :meth:`search_with_collector`."""
        return Collector(**kwargs)

    def search_with_collector(self, q: Query, collector: "Collector"):
        """Run the query through the captured collector arguments
        (reference searching.py:558-582); read ``collector.results()``
        after.  A collector carrying a ``timelimit`` routes through the
        TimeLimit path and re-raises exactly like the reference."""
        collector._run(self, q)

    def close(self) -> None:
        pass

    def __enter__(self) -> "Searcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ---- evaluation helpers ----

    def eval(self, q: Query, seg) -> tuple[np.ndarray, np.ndarray]:
        """Per-(query-node, segment) memoized evaluation within one search."""
        key = (id(q), seg.meta.seg_id)
        if key not in self._eval_cache:
            self._eval_cache[key] = q.docs_scores(self, seg)
        return self._eval_cache[key]

    def global_eval(self, q: Query) -> tuple[np.ndarray, np.ndarray]:
        """Whole-index memoized evaluation (global arrays)."""
        key = id(q)
        if key not in self._global_cache:
            self._global_cache[key] = q.global_docs_scores(self)
        return self._global_cache[key]

    def all_docids(self) -> np.ndarray:
        if self._all_docids is None:
            parts = [seg.all_docids() for seg in self.segments]
            self._all_docids = (np.concatenate(parts) if parts
                                else np.empty(0, dtype=np.int64))
        return self._all_docids

    # ---- search ----

    def _as_docid_set(self, obj):
        """Queries/Results resolve to their docids; DocIdSet objects
        (functions/idsets.py — roaring/bitmap/sorted) pass through so
        the keep-mask uses their vectorized ``contains`` kernel."""
        from whoosh_ray.functions.idsets import DocIdSet

        if isinstance(obj, Query):
            return self.search(obj, limit=None).docids
        if isinstance(obj, Results):
            return obj.docids
        if isinstance(obj, DocIdSet):
            return obj
        return np.asarray(sorted(int(d) for d in obj), dtype=np.int64)

    def _preload_terms(self, q: Query) -> None:
        """Batch-fetch every query term's blobs per segment in one
        filtered read (cold-latency fix, VERDICT r1 #9)."""
        try:
            tkeys = set(q.terms())
        except Exception:
            return
        if not tkeys:
            return
        by_field: dict[str, list[str]] = {}
        for f, t in sorted(tkeys):
            by_field.setdefault(f, []).append(t)
        if len(self.segments) <= 2:
            for seg in self.segments:
                seg.preload_blobs(by_field)
            return
        # dataset-level batched reads: ONE threaded, row-group-pruned
        # multi-file read per field replaces 100+ per-segment parquet
        # opens, with parquet footers cached in the process-level
        # dataset (VERDICT r2 #1 — the many-segment cold-query cost)
        self._warm_stats_batched()
        self._preload_blobs_batched(by_field)

    def _warm_stats_batched(self) -> None:
        """Load every not-yet-cached segment's term-stats table in one
        multi-file read, split back per segment by docid range."""
        from whoosh_ray.state.segment import (BLOB_LOC_COLS, TERM_STAT_COLS,
                                              SegmentReader, terms_dataset)

        todo = []
        for s in self.segments:
            if s._stats is not None:
                continue
            key = s._terms_key()
            cached = SegmentReader._STATS_CACHE.get(key)
            if cached is not None:
                s._stats = cached
            else:
                todo.append((s, key))
        if not todo:
            return
        if len({s.has_bin for s, _ in todo}) > 1:
            for s, _ in todo:  # mixed blob formats: per-segment loads
                s.stats
            return
        ds = terms_dataset([s for s, _ in todo])
        cols = TERM_STAT_COLS + ([c for c in BLOB_LOC_COLS
                                  if c in ds.schema.names]
                                 if todo[0][0].has_bin else [])
        t = ds.to_table(columns=cols)
        starts = np.array([s.meta.docid_range()[0] for s, _ in todo],
                          dtype=np.int64)
        mind = t["min_docid"].to_numpy()
        seg_idx = np.searchsorted(starts, mind, side="right") - 1
        # fragments were passed in docid order, so rows arrive grouped
        # and nondecreasing by segment: zero-copy slices, not 121 filters
        sliceable = bool(np.all(seg_idx[1:] >= seg_idx[:-1]))
        bounds = (np.searchsorted(seg_idx, np.arange(len(todo) + 1))
                  if sliceable else None)
        for i, (s, key) in enumerate(todo):
            if sliceable:
                part = t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
            else:
                part = t.filter(pa.array(seg_idx == i))
            s._stats = part
            if len(SegmentReader._STATS_CACHE) > 4096:
                SegmentReader._STATS_CACHE.clear()
            SegmentReader._STATS_CACHE[key] = part

    def _preload_blobs_batched(self, by_field: dict[str, list[str]]) -> None:
        # with blobs.bin, a per-segment preload is an in-memory binary
        # search + one pread per present term — no parquet scan at all
        for s in self.segments:
            s.preload_blobs(by_field)

    def search(self, q: Query, limit: int | None = 10, *,
               filter=None, mask=None, terms: bool = False,
               sortedby=None, reverse: bool = False,
               groupedby=None, maptype=None,
               collapse=None, collapse_limit: int = 1,
               collapse_order=None, scored: bool = True,
               optimize: bool = True) -> Results:
        """``filter``/``mask`` restrict/exclude results by a query, a
        Results, or a docid set without changing scores — the reference's
        FilterCollector wrappers (collectors.py:657-760,
        searching.py:775-787).  ``terms=True`` records which query terms
        match each result doc (TermsCollector, collectors.py:1103-1165).
        ``sortedby``/``reverse`` order by a facet (SortingCollector,
        collectors.py:535-583); ``groupedby``/``maptype`` record facet
        groups over the full match set (FacetCollector,
        collectors.py:761-849) — see :mod:`whoosh_ray.search.facets`."""
        allow = self._as_docid_set(filter) if filter is not None else None
        deny = self._as_docid_set(mask) if mask is not None else None
        self._eval_cache.clear()
        self._global_cache.clear()
        q = q.expansion_queries(self)[0]
        self._preload_terms(q)
        docids, scores = q.global_docs_scores(self)
        return self._finish_match_set(
            q, docids, scores, limit=limit, allow=allow, deny=deny,
            terms=terms, sortedby=sortedby, reverse=reverse,
            groupedby=groupedby, maptype=maptype, collapse=collapse,
            collapse_limit=collapse_limit, collapse_order=collapse_order,
            scored=scored)

    def _finish_match_set(self, q: Query, docids, scores, *, limit,
                          allow=None, deny=None, terms: bool = False,
                          sortedby=None, reverse: bool = False,
                          groupedby=None, maptype=None, collapse=None,
                          collapse_limit: int = 1,
                          collapse_order=None,
                          scored: bool = True) -> Results:
        """Everything ``search`` does AFTER evaluation — filter/mask
        cuts, final(), sort/facet, limit, terms=True bookkeeping —
        shared with the timelimit path so a budgeted search honours the
        full collector configuration."""
        if allow is not None and len(docids):
            keep = (allow.contains(docids) if hasattr(allow, "contains")
                    else np.isin(docids, allow, assume_unique=True))
            docids, scores = docids[keep], scores[keep]
        if deny is not None and len(docids):
            keep = ~(deny.contains(docids) if hasattr(deny, "contains")
                     else np.isin(docids, deny, assume_unique=True))
            docids, scores = docids[keep], scores[keep]
        if getattr(self.weighting, "use_final", False) and len(docids):
            # reference final() hook (scoring.py:51-76): per-doc score
            # adjustment before ranking
            fin = self.weighting.final
            scores = np.asarray(
                [fin(self, int(d), float(s))
                 for d, s in zip(docids, scores)], dtype=np.float64)
        if not len(docids):
            res = Results(self, np.empty(0, dtype=np.int64),
                          np.empty(0, dtype=np.float64))
            res.q = q
            if groupedby is not None:
                res._groups = {}
            return res
        unscored = not scored and sortedby is None
        if sortedby is not None:
            from whoosh_ray.search.facets import sort_match_set

            r_docids, r_scores = sort_match_set(self, sortedby, docids,
                                                scores, reverse=reverse)
        elif unscored:
            # scored=False (reference UnsortedCollector,
            # collectors.py:468-533): matching (docid) order, no
            # scores, and — reference quirk — the limit is IGNORED
            full = np.argsort(docids, kind="stable")
            r_docids, r_scores = docids[full], scores[full]
            limit = None
        else:
            full = np.lexsort((docids, -scores))
            r_docids, r_scores = docids[full], scores[full]
        collapsed_counts = None
        if collapse is not None and len(r_docids):
            keep, collapsed_counts = self._collapse_match_set(
                r_docids, r_scores, collapse, collapse_limit,
                collapse_order)
            r_docids, r_scores = r_docids[keep], r_scores[keep]
        groups = None
        if groupedby is not None:
            from whoosh_ray.search.facets import Facets, compute_groups

            facets = Facets.from_groupedby(groupedby)
            groups = {
                name: compute_groups(self, facet, r_docids, r_scores,
                                     maptype=maptype)
                for name, facet in facets.items()
            }
        if limit is not None:
            r_docids, r_scores = r_docids[:limit], r_scores[:limit]
        res = Results(self, r_docids, r_scores)
        res.q = q
        res._groups = groups
        if unscored:
            res._unscored = True
        if collapsed_counts is not None:
            res.collapsed_counts = collapsed_counts
            res.collapsed_total = sum(collapsed_counts.values())
        if terms:
            termdocs: dict[tuple[str, str], np.ndarray] = {}
            for key in set(q.terms()):
                parts = []
                for seg in self.segments:
                    p = seg.postings(*key)
                    if p is not None:
                        parts.append(p.docids)
                tdocs = (np.concatenate(parts) if parts
                         else np.empty(0, dtype=np.int64))
                hit = np.intersect1d(tdocs, res.docids)
                if len(hit):
                    termdocs[key] = hit
            res.termdocs = termdocs
        return res

    def _collapse_match_set(self, r_docids, r_scores, collapse,
                            collapse_limit, collapse_order):
        """CollapseCollector semantics (reference collectors.py:
        850-1004) over a RESULTS-ORDERED match set: keep at most
        ``collapse_limit`` docs per collapse key; which survive is the
        results order, or ``collapse_order`` facet keys with strictly-
        less replacement (ties keep the earlier-matched = lower docid).
        Docs with a FALSY key are never collapsed (collectors.py:963-
        966: ``if not ckey``).  Returns (keep mask over the results
        order, {key: n_removed})."""
        from collections import defaultdict

        from whoosh_ray.search.facets import MultiFacet

        keyfacet = MultiFacet.from_sortedby(collapse)
        keys = keyfacet.keys(self, r_docids, r_scores)
        n = len(r_docids)
        keep = np.ones(n, dtype=bool)
        counts: dict = defaultdict(int)
        if collapse_order is not None:
            orderfacet = MultiFacet.from_sortedby(collapse_order)
            sortkeys = list(orderfacet.keys(self, r_docids, r_scores))
        else:
            # the results order itself is the sort key (TopCollector
            # sort_key == rank here, since r_docids is results-ordered)
            sortkeys = list(range(n))
        # sequential pass in MATCHING order (ascending docid), exactly
        # like the reference's collect loop: a full bucket admits a
        # strictly-better arrival by EVICTING its worst (eviction is
        # NOT counted — reference collapsed_counts counts only docs
        # rejected on arrival, collectors.py:975-1002)
        arrival = np.argsort(r_docids, kind="stable")
        best: dict = defaultdict(list)  # key -> sorted [(sortkey, docid, i)]
        for i in map(int, arrival):
            k = keys[i]
            if not k:
                continue
            lst = best[k]
            entry = (sortkeys[i], int(r_docids[i]), i)
            if len(lst) < collapse_limit:
                lst.append(entry)
                lst.sort()
            elif entry[0] < lst[-1][0]:
                keep[lst.pop()[2]] = False
                lst.append(entry)
                lst.sort()
            else:
                keep[i] = False
                counts[k] += 1
        return keep, dict(counts)

    def search_page(self, query: Query, pagenum: int, pagelen: int = 10,
                    **kw) -> "ResultsPage":
        """One page of results (reference searching.py:587-639).  The
        reference's TopCollector scans every match anyway to know the
        total, so this ranks the full match set (limit=None) and slices
        — identical page contents, exact ``total``/``pagecount``."""
        if pagenum < 1:
            raise ValueError("pagenum must be >= 1")
        return ResultsPage(self.search(query, limit=None, **kw),
                           pagenum, pagelen)

    def search_with_timelimit(self, q: Query, limit: int | None = 10, *,
                              timelimit: float, greedy: bool = False,
                              filter=None, mask=None, terms: bool = False,
                              sortedby=None, reverse: bool = False,
                              groupedby=None, maptype=None,
                              collapse=None, collapse_limit: int = 1,
                              collapse_order=None, scored: bool = True,
                              optimize: bool = True) -> Results:
        """TimeLimitCollector analogue (collectors.py:1006-1102): abort
        when the budget is exceeded, raising :class:`TimeLimit` with the
        partial results collected so far.  The check granularity is one
        SEGMENT (the reference checks per matched doc via a timer
        thread); ``greedy=True`` finishes the in-flight segment before
        raising.  Queries whose reference quirks span segment boundaries
        (DisjunctionMax/AndNot/...) evaluate globally and can only time
        out before/after that single evaluation.  All ``search`` kwargs
        (filter/mask/sortedby/groupedby/terms/...) apply to the finished
        — full or partial — match set, matching the reference's
        TimeLimitCollector wrapping a configured child collector."""
        import time as _time

        from whoosh_ray.search.dist import _has_nondecomposable

        t0 = _time.monotonic()
        allow = self._as_docid_set(filter) if filter is not None else None
        deny = self._as_docid_set(mask) if mask is not None else None
        self._eval_cache.clear()
        self._global_cache.clear()
        qx = q.expansion_queries(self)[0]
        self._preload_terms(qx)

        def finish(parts, timed_out: bool):
            if parts:
                docids = np.concatenate([p[0] for p in parts])
                scores = np.concatenate([p[1] for p in parts])
            else:
                docids = np.empty(0, dtype=np.int64)
                scores = np.empty(0, dtype=np.float64)
            res = self._finish_match_set(
                qx, docids, scores, limit=limit, allow=allow, deny=deny,
                terms=terms, sortedby=sortedby, reverse=reverse,
                groupedby=groupedby, maptype=maptype, collapse=collapse,
                collapse_limit=collapse_limit,
                collapse_order=collapse_order, scored=scored)
            if timed_out:
                raise TimeLimit(res)
            return res

        if _has_nondecomposable(qx):
            res = qx.global_docs_scores(self)
            return finish([res], _time.monotonic() - t0 > timelimit)

        parts = []
        for seg in self.segments:
            if _time.monotonic() - t0 > timelimit:
                return finish(parts, True)
            parts.append(self.eval(qx, seg))
            if greedy is False and _time.monotonic() - t0 > timelimit:
                return finish(parts, True)
        return finish(parts, False)

    def search_topk(self, q: Query, limit: int = 10) -> Results:
        """Pruned top-k (block-max skipping + MaxScore term pruning,
        search/wand.py) for Term and Or-of-Terms queries; identical
        results to :meth:`search` (asserted by tests), falls back to the
        exhaustive path for other query shapes."""
        from whoosh_ray.search import wand
        from whoosh_ray.search.query import Or, Term

        if limit is None:
            return self.search(q, None)
        if (getattr(self.weighting, "use_final", False)
                or getattr(self.weighting, "needs_docids", False)):
            # final() breaks the score bounds pruning relies on;
            # docid-coupled scorers (legacy Weighting compat, Debug)
            # have no bounds at all
            return self.search(q, limit)
        self._eval_cache.clear()
        self._global_cache.clear()
        qx = q.expansion_queries(self)[0]
        self._preload_terms(qx)
        if isinstance(qx, Term):
            thr = -np.inf
            parts = []
            for seg in self.segments:
                ids, sc = wand.term_topk_segment(
                    self, seg, qx.fieldname, qx.text, limit, thr, qx.boost)
                if len(sc) >= limit:
                    kth = np.partition(sc, len(sc) - limit)[len(sc) - limit]
                    thr = max(thr, float(kth))
                if len(ids):
                    parts.append((ids, sc))
            if not parts:
                return Results(self, np.empty(0, dtype=np.int64),
                               np.empty(0, dtype=np.float64))
            docids = np.concatenate([p[0] for p in parts])
            scores = np.concatenate([p[1] for p in parts])
        elif (isinstance(qx, Or) and qx.boost == 1.0 and qx.minmatch <= 1
              and all(isinstance(s, Term) for s in qx.subqueries)):
            docids, scores = wand.or_terms_topk(
                self, [(s.fieldname, s.text, s.boost) for s in qx.subqueries],
                limit)
        else:
            return self.search(q, limit)
        order = np.lexsort((docids, -scores))[:limit]
        res = Results(self, docids[order], scores[order])
        res.q = qx
        return res

    # ---- spelling / classification conveniences ----

    def suggest(self, fieldname: str, text: str, limit: int = 5,
                maxdist: int = 2, prefix: int = 0) -> list[str]:
        """Spelling suggestions — ReaderCorrector parity
        (spelling.py:41-117): candidates within ``maxdist`` (plain
        Levenshtein, the automaton's acceptance set) sharing ``prefix``
        initial chars, ranked by the reference's actual score
        ``-(maxdist + 0.5/frequency)`` (frequency desc, then word asc;
        the edit distance itself does NOT rank — spelling.py:112-117)."""
        from heapq import nlargest

        from whoosh_ray.functions.spelling import levenshtein_batch

        # separate spelling (reference spelling.py:103-115): candidates
        # come from the spell subfield's UNMORPHED lexicon; frequency
        # (the rank) still reads the parent field
        sugfield = fieldname
        try:
            sugfield = self.schema.field(fieldname).spell_field or fieldname
        except KeyError:
            pass
        cands = (self.expand_prefix(sugfield, text[:prefix]) if prefix
                 else self.lexicon(sugfield))
        dists = levenshtein_batch(text, cands, maxdist)
        items = []
        for w, d in zip(cands, dists):
            if d <= maxdist:
                f = self.frequency(fieldname, w) or 1
                items.append((0 - (maxdist + (1.0 / f * 0.5)), w))
        best = nlargest(limit, items)
        best.sort(key=lambda x: (0 - x[0], x[1]))
        return [w for _, w in best]

    def correct_query(self, q: Query, qstring: str | None = None,
                      correctors: dict | None = None, terms=None,
                      maxdist: int = 2, prefix: int = 0,
                      aliases: dict | None = None):
        """Corrected version of a user query (reference
        searching.py:820-931): by default every query term missing from
        the index is replaced by its field corrector's first
        suggestion.  Returns a :class:`~whoosh_ray.functions.spelling.
        Correction` — ``.query`` is the corrected tree, ``.string``
        splices the corrections into ``qstring`` using the parser's
        recorded char spans, ``.format_string(formatter)`` renders them
        marked up."""
        from whoosh_ray.functions.spelling import SimpleQueryCorrector

        reader = self.reader()
        aliases = aliases or {}
        correctors = {aliases.get(f, f): c
                      for f, c in (correctors or {}).items()}
        for spec in self.schema.fields:
            fieldname = aliases.get(spec.name, spec.name)
            if fieldname not in correctors:
                correctors[fieldname] = reader.corrector(fieldname)
        if terms is None:
            terms = []
            for token in q.all_tokens():
                aname = aliases.get(token.fieldname, token.fieldname)
                if (aname in correctors
                        and (aname, token.text) not in reader):
                    # keep the ORIGINAL fieldname so the replace hits
                    # the query's own nodes (searching.py:924)
                    terms.append((token.fieldname, token.text))
        sqc = SimpleQueryCorrector(correctors, terms, aliases,
                                   maxdist=maxdist, prefix=prefix)
        return sqc.correct_query(q, qstring)

    def key_terms(self, docids, fieldname: str, numterms: int = 5,
                  **kwargs):
        from whoosh_ray.search.classify import key_terms

        return key_terms(self, docids, fieldname, numterms, **kwargs)

    def key_terms_from_text(self, fieldname: str, text: str,
                            numterms: int = 5, **kwargs):
        from whoosh_ray.search.classify import key_terms_from_text

        return key_terms_from_text(self, fieldname, text, numterms, **kwargs)

    def more_like(self, docid: int, fieldname: str, text: str | None = None,
                  top: int = 10, **kwargs):
        from whoosh_ray.search.classify import more_like

        return more_like(self, docid, fieldname, text=text, top=top, **kwargs)

    # ---- stored fields ----

    def _seg_index_of(self, docids: np.ndarray) -> np.ndarray:
        """Map docids to positions in self.segments via the manifest's
        per-segment docid ranges (valid across merges, unlike //seg_size)."""
        bases = np.array([s.meta.docid_range()[0] for s in self.segments])
        return np.searchsorted(bases, np.asarray(docids), side="right") - 1

    def seg_of(self, docid: int) -> SegmentReader:
        i = int(self._seg_index_of(np.array([docid]))[0])
        if 0 <= i < len(self.segments):
            return self.segments[i]
        raise KeyError(docid)

    def has_vector(self, fieldname: str) -> bool:
        try:
            spec = self.schema.field(fieldname)
        except KeyError:
            return False
        return bool(getattr(spec, "vector", False))

    def vector(self, docid: int, fieldname: str):
        """Stored per-doc term vector (terms, weights) for a
        ``vector=True`` field (FieldType(vector=...) parity,
        reference whoosh3.py:156-277 / reading.py vector()); None when
        the field stores no vectors."""
        if not self.has_vector(fieldname):
            return None
        cols = [f"{fieldname}__vector_terms",
                f"{fieldname}__vector_weights"]
        t = self.stored(np.array([docid]), columns=cols)
        if not t.num_rows:
            return None
        return (t[cols[0]][0].as_py(), t[cols[1]][0].as_py())

    def highlights(self, docid: int, fieldname: str, terms, *,
                   top: int = 3, fragmenter=None, formatter=None,
                   scorer=None, order=None, minscore: int = 1,
                   text: str | None = None, phrases=None) -> str:
        """Highlighted snippets for one hit.  On a ``chars=True`` field
        the matched spans come straight from the stored Characters
        payloads (no re-tokenize) — but only when the fragmenter can
        work from spans alone (``must_retokenize() == False``, i.e.
        Pinpoint; the reference gate, highlight.py:920-937): a context/
        sentence fragmenter needs the full token stream, so those
        re-tokenize the stored text even on a chars field, exactly like
        the reference's fallback (highlight.py:1040-1059)."""
        from whoosh_ray.search.highlight import (Highlighter,
                                                 PinpointFragmenter)

        if text is None:
            stored = self.stored(np.array([docid]), columns=[fieldname])
            if not stored.num_rows:
                return ""
            text = stored[fieldname][0].as_py() or ""
        spec = None
        try:
            spec = self.schema.field(fieldname)
        except KeyError:
            pass
        kw = {}
        if scorer is not None:
            kw["scorer"] = scorer
        if order is not None:
            kw["order"] = order
        span_capable = (fragmenter is None
                        or not getattr(fragmenter, "must_retokenize",
                                       lambda: True)())
        # strict-phrase marking exists only on the retokenize path
        # (the reference's chars branch ignores it, highlight.py:1012)
        if (spec is not None and getattr(spec, "chars", False)
                and span_capable and phrases is None):
            spans = []
            for t in set(terms):
                spans.extend(self.char_offsets(docid, fieldname, t))
            hl = Highlighter(fragmenter=fragmenter or PinpointFragmenter(),
                             formatter=formatter, **kw)
            return hl.highlight_spans(text, spans, top=top,
                                      minscore=minscore)
        from whoosh_ray.search.highlight import analyzer_tokens

        hl = Highlighter(fragmenter=fragmenter, formatter=formatter, **kw)
        # retokenize with the FIELD'S analyzer, stopwords kept
        # (reference removestops=False, highlight.py:1038-1040) — so
        # stemmed/folded fields match query terms; analyzers that can't
        # carry char offsets fall back to the plain char tokenizer
        toks = analyzer_tokens(spec.analyzer if spec is not None else None,
                               text)
        return hl.highlight(text, set(terms), top=top, minscore=minscore,
                            phrases=phrases, tokens=toks)

    def char_offsets(self, docid: int, field: str,
                     term: str) -> list[tuple[int, int]]:
        """Exact (startchar, endchar) spans of ``term`` in a document's
        field, from the stored Characters payload (no re-tokenize).
        Empty list when the term doesn't occur or the field has no
        chars payloads."""
        seg = self.seg_of(docid)
        spans = seg.char_spans(field, term)
        if spans is None:
            return []
        docids, per_posting = spans
        j = int(np.searchsorted(docids, docid))
        if j >= len(docids) or docids[j] != docid:
            return []
        sc, ec = per_posting[j]
        return list(zip(sc.tolist(), ec.tolist()))

    def position_boosts(self, docid: int, field: str,
                        term: str) -> list[tuple[int, float]]:
        """(pos, boost) per occurrence of ``term`` in a document's field
        — the reference's ``value_as("position_boosts")`` on the
        PositionBoosts format (formats.py:339-412).  Empty list when the
        term doesn't occur or no boost payloads are stored."""
        seg = self.seg_of(docid)
        pb = seg.boost_payloads(field, term)
        if pb is None or pb[1] is None:
            return []
        docids, poss, _chars, boosts = pb
        j = int(np.searchsorted(docids, docid))
        if j >= len(docids) or docids[j] != docid:
            return []
        return list(zip(poss[j].tolist(),
                        [float(b) for b in boosts[j]]))

    def character_boosts(self, docid: int, field: str,
                         term: str) -> list[tuple[int, int, int, float]]:
        """(pos, startchar, endchar, boost) per occurrence — the
        reference's ``value_as("character_boosts")`` on the
        CharacterBoosts format (formats.py:415-481)."""
        seg = self.seg_of(docid)
        pb = seg.boost_payloads(field, term, with_chars=True)
        if pb is None or pb[1] is None or pb[2] is None:
            return []
        docids, poss, chars, boosts = pb
        j = int(np.searchsorted(docids, docid))
        if j >= len(docids) or docids[j] != docid:
            return []
        sc, ec = chars[j]
        return list(zip(poss[j].tolist(), sc.tolist(), ec.tolist(),
                        [float(b) for b in boosts[j]]))

    def stored(self, docids: np.ndarray, columns: list[str] | None = None) -> pa.Table:
        segs = self._seg_index_of(docids)
        parts = []
        for si, s in enumerate(self.segments):
            sel = np.asarray(docids)[segs == si]
            if len(sel):
                parts.append(s.stored(np.sort(sel), columns=columns))
        if not parts:
            return pa.table({"docid": pa.array([], type=pa.int64())})
        # promote: segments written before an Index.add_field lack the
        # new column (null-typed there)
        t = pa.concat_tables(parts, promote_options="default")
        if columns is None:
            # a REMOVED field's values vanish from stored reads at once,
            # before any merge reclaims the column (reference
            # test_removefield: document() drops it right after
            # remove_field+commit) — filter the default projection to
            # the CURRENT schema
            allowed = {"docid", *self.schema.stored_columns}
            for f in self.schema.fields:
                allowed.add(f.name)
                allowed.add(f"{f.name}__vector_terms")
                allowed.add(f"{f.name}__vector_weights")
            keep = [c for c in t.column_names if c in allowed]
            if len(keep) != len(t.column_names):
                t = t.select(keep)
        # restore requested (rank) order: segments are docid-ordered and
        # per-segment results docid-sorted, so the concat is globally
        # sorted — one vectorized searchsorted, no per-row Python
        all_ids = t["docid"].to_numpy()
        pos = np.searchsorted(all_ids, np.asarray(docids))
        pos = np.clip(pos, 0, max(len(all_ids) - 1, 0))
        ok = all_ids[pos] == np.asarray(docids)
        return t.take(pa.array(pos[ok]))
