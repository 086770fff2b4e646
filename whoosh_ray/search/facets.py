"""Facet family — sorting/grouping criteria (reference: sorting.py).

Each facet computes per-document keys VECTORIZED over the match-set
arrays (stored-column batch reads, docset membership via searchsorted)
instead of the reference's per-document ``key_for`` callbacks
(sorting.py:110-158).  ``Searcher.search(sortedby=..., groupedby=...)``
applies them with whoosh's ordering semantics:

- sorted results order by ``(key, docid)`` ascending (``reverse=True``
  flips the whole comparison, like sorted(..., reverse=True));
- groups record docids in results order (OrderedList maptype,
  sorting.py:989-1013), or counts (Count) / unordered (UnorderedList).

Divergence, documented: FieldFacet keys by the STORED value.  The
reference's PostingCategorizer keys multi-token text fields by the last
term posting seen (sorting.py:341-400) — an ordering its own docs call
unsupported ("don't sort by a field with multiple tokens"); ID/NUMERIC
fields (where sorting is supported) behave identically.

For driver-scale grouping use the distributed plans in pipelines/ir.py;
this module is the API-parity surface over a match set.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np

__all__ = [
    "FacetType", "FieldFacet", "QueryFacet", "RangeFacet", "DateRangeFacet",
    "ScoreFacet", "FunctionFacet", "TranslateFacet", "StoredFieldFacet",
    "MultiFacet", "Facets", "OrderedList", "UnorderedList", "Count",
    "Best",
]


def _fill_missing(vals: list, arrow_type=None) -> list:
    """Missing (None) stored values take the reference column
    DEFAULTS (sorting.py FieldFacet over column storage): bytes/text
    columns default '' — missing docs sort FIRST ascending and group
    under the '' key — while numeric/datetime columns default to the
    type maximum — missing docs sort LAST ascending.

    The fill is derived from the ARROW column type when available, so
    an all-None numeric/datetime column still takes its numeric default
    instead of falling through to '' (ADVICE r3); the value probe is
    only the fallback for typeless python lists."""
    if not any(v is None for v in vals):
        return vals
    fill = None
    if arrow_type is not None:
        import pyarrow as _pa

        if _pa.types.is_string(arrow_type) or \
                _pa.types.is_large_string(arrow_type):
            fill = ""
        elif _pa.types.is_binary(arrow_type) or \
                _pa.types.is_large_binary(arrow_type):
            fill = b""
        elif _pa.types.is_timestamp(arrow_type):
            fill = _dt.datetime.max
        elif _pa.types.is_date(arrow_type):
            fill = _dt.date.max
        elif _pa.types.is_integer(arrow_type) or \
                _pa.types.is_floating(arrow_type) or \
                _pa.types.is_decimal(arrow_type):
            fill = float("inf")
    if fill is None:
        probe = next((v for v in vals if v is not None), None)
        if probe is None or isinstance(probe, str):
            fill = ""
        elif isinstance(probe, bytes):
            fill = b""
        elif isinstance(probe, _dt.datetime):
            fill = _dt.datetime.max
        elif isinstance(probe, _dt.date):
            fill = _dt.date.max
        else:
            fill = float("inf")
    return [fill if v is None else v for v in vals]


class _Rev:
    """Inverted-comparison wrapper: FieldFacet(reverse=True) inside a
    MultiFacet (the reference reverses one column via reversed ordinals,
    sorting.py:245-268)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return isinstance(other, _Rev) and other.v == self.v

    def __hash__(self):
        return hash(("_Rev", self.v))

    def __repr__(self):
        return f"Rev({self.v!r})"


class Categorizer:
    """Per-document key extractor — the reference's FacetType extension
    contract (sorting.py:93-155): a custom FacetType returns one of
    these from ``categorizer(searcher)``; the engine calls
    ``set_searcher`` then ``key_for``/``keys_for`` per matched doc and
    renders keys with ``key_to_name``.

    This engine evaluates its built-in facets vectorized, but a
    reference-written subclass plugs in unchanged: the base
    :meth:`FacetType.keys` detects an overridden ``categorizer`` and
    drives it per doc.  One documented divergence:
    ``requires_matcher`` categorizers get ``matcher=None`` (there is no
    pull-based matcher object at scoring time here) — use
    searcher/reader state instead."""

    allow_overlap = False
    requires_matcher = False

    def set_searcher(self, segment_searcher, docoffset: int) -> None:
        """Called per segment; this engine passes the global searcher
        once with ``docoffset=0`` (docids are globally dense)."""

    def key_for(self, matcher, segment_docnum: int):
        raise NotImplementedError(self.__class__.__name__)

    def keys_for(self, matcher, segment_docnum: int):
        """Overlap variant (reference sorting.py:129-135)."""
        raise NotImplementedError(self.__class__.__name__)

    def key_to_name(self, key):
        return key


class FacetType:
    allow_overlap = False
    maptype = None

    def default_name(self) -> str:
        return "facet"

    def map(self, default=None):
        """The FacetMap instance results for this facet collect into
        (reference sorting.py:52-62: the facet's maptype, else the
        caller's default, else OrderedList)."""
        t = self.maptype
        if t is None:
            t = default
        if t is None:
            return OrderedList()
        if isinstance(t, type):
            return t()
        return t

    def categorizer(self, global_searcher) -> Categorizer:
        """Reference extension hook (sorting.py:74-90).  Built-in
        facets never call this; a subclass that overrides it gets the
        base ``keys``/``overlap_keys`` driven through its Categorizer."""
        raise NotImplementedError

    def _categorizer_keys(self, searcher, docids, overlap: bool):
        c = self.categorizer(searcher)
        c.set_searcher(searcher, 0)
        if overlap:
            return [[c.key_to_name(k) for k in c.keys_for(None, int(d))]
                    for d in docids]
        return [c.key_to_name(c.key_for(None, int(d))) for d in docids]

    def keys(self, searcher, docids: np.ndarray,
             scores: np.ndarray) -> list:
        """One sort/group key per matched doc."""
        if type(self).categorizer is not FacetType.categorizer:
            return self._categorizer_keys(searcher, docids, overlap=False)
        raise NotImplementedError

    def overlap_keys(self, searcher, docids, scores) -> list[list]:
        """Per-doc key lists for allow_overlap grouping (keys_for,
        sorting.py:129-135)."""
        if type(self).categorizer is not FacetType.categorizer:
            return self._categorizer_keys(searcher, docids, overlap=True)
        return [[k] for k in self.keys(searcher, docids, scores)]


class FieldFacet(FacetType):
    """Sort/group by a field's (stored) value (sorting.py:161-214)."""

    def __init__(self, fieldname: str, reverse: bool = False,
                 allow_overlap: bool = False, maptype=None):
        self.fieldname = fieldname
        self.reverse = reverse
        self.allow_overlap = allow_overlap
        self.maptype = maptype

    def default_name(self):
        return self.fieldname

    def _values(self, searcher, docids):
        t = searcher.stored(docids, columns=[self.fieldname])
        col = t[self.fieldname]
        return _fill_missing(col.to_pylist(), arrow_type=col.type)

    def keys(self, searcher, docids, scores):
        vals = self._values(searcher, docids)
        if self.reverse:
            return [_Rev(v) for v in vals]
        return vals


class StoredFieldFacet(FacetType):
    """Sort/group by a stored (possibly unindexed) field; with
    ``allow_overlap`` the value is split into multiple group keys
    (sorting.py:692-750)."""

    def __init__(self, fieldname: str, allow_overlap: bool = False,
                 split_fn=None, maptype=None):
        self.fieldname = fieldname
        self.allow_overlap = allow_overlap
        self.split_fn = split_fn
        self.maptype = maptype

    def default_name(self):
        return self.fieldname

    def keys(self, searcher, docids, scores):
        t = searcher.stored(docids, columns=[self.fieldname])
        return t[self.fieldname].to_pylist()

    def overlap_keys(self, searcher, docids, scores):
        vals = self.keys(searcher, docids, scores)
        split = self.split_fn or (lambda v: v.split())
        return [split(v) if v is not None else [None] for v in vals]


class QueryFacet(FacetType):
    """Group/sort by which of several queries matches the doc
    (sorting.py:402-451): first matching name in dict order wins;
    queries with EMPTY docsets are skipped entirely (reference parity);
    non-matching docs key as ``other``."""

    def __init__(self, querydict: dict, other=None,
                 allow_overlap: bool = False, maptype=None):
        self.querydict = dict(querydict)
        self.other = other
        self.allow_overlap = allow_overlap
        self.maptype = maptype

    def default_name(self):
        return "query"

    def _docsets(self, searcher):
        out = {}
        for qname, q in self.querydict.items():
            ids = searcher.search(q, limit=None).docids
            if len(ids):
                out[qname] = np.sort(ids)
        return out

    def keys(self, searcher, docids, scores):
        keys = np.full(len(docids), None, dtype=object)
        unset = np.ones(len(docids), dtype=bool)
        for qname, ids in self._docsets(searcher).items():
            pos = np.searchsorted(ids, docids)
            pos = np.clip(pos, 0, len(ids) - 1)
            hit = (ids[pos] == docids) & unset
            # per-index assignment: qname may be a tuple (RangeFacet
            # names), which numpy would try to broadcast element-wise
            for j in np.flatnonzero(hit):
                keys[j] = qname
            unset &= ~hit
        if self.other is not None:
            for j in np.flatnonzero(unset):
                keys[j] = self.other
        return list(keys)

    def overlap_keys(self, searcher, docids, scores):
        out = [[] for _ in range(len(docids))]
        for qname, ids in self._docsets(searcher).items():
            pos = np.searchsorted(ids, docids)
            pos = np.clip(pos, 0, len(ids) - 1)
            for i in np.flatnonzero(ids[pos] == docids):
                out[i].append(qname)
        return [ks if ks else [None] for ks in out]


class RangeFacet(QueryFacet):
    """Numeric buckets [start, start+gap) named by (start, end) tuples
    (sorting.py:453-531); ``gap`` may be a sequence; buckets are
    start-inclusive / end-exclusive; ``hardend`` clamps the final
    bucket."""

    def __init__(self, fieldname: str, start, end, gap, hardend=False,
                 maptype=None):
        self.fieldname = fieldname
        self.start, self.end, self.gap = start, end, gap
        self.hardend = hardend
        super().__init__(self._build_queries(), maptype=maptype)

    def default_name(self):
        return self.fieldname

    def _rangetype(self):
        from whoosh_ray.search.query import NumericRange

        return NumericRange

    def _build_queries(self):
        if not self.gap:
            raise ValueError(f"No gap specified ({self.gap!r})")
        gaps = list(self.gap) if isinstance(self.gap, (list, tuple)) else None
        rangetype = self._rangetype()
        qd = {}
        cstart = self.start
        i = 0
        while cstart < self.end:
            thisgap = (gaps[min(i, len(gaps) - 1)] if gaps is not None
                       else self.gap)
            i += 1
            cend = cstart + thisgap
            if self.hardend:
                cend = min(self.end, cend)
            qd[(cstart, cend)] = rangetype(self.fieldname, cstart, cend,
                                           endexcl=True)
            cstart = cend
        return qd


class DateRangeFacet(RangeFacet):
    """RangeFacet over datetimes: datetime start/end, timedelta gap(s)
    (sorting.py:535-562)."""

    def _rangetype(self):
        from whoosh_ray.search.query import DateRange

        return DateRange


class ScoreFacet(FacetType):
    """Sort key = negated score, so higher scores sort first
    (sorting.py:563-593)."""

    def default_name(self):
        return "score"

    def keys(self, searcher, docids, scores):
        return list(0 - np.asarray(scores, dtype=np.float64))


class FunctionFacet(FacetType):
    """key = fn(searcher, docid) (sorting.py:596-631)."""

    def __init__(self, fn, maptype=None):
        self.fn = fn
        self.maptype = maptype

    def default_name(self):
        return "function"

    def keys(self, searcher, docids, scores):
        fn = self.fn
        return [fn(searcher, int(d)) for d in docids]


class TranslateFacet(FacetType):
    """key = fn(*keys of the wrapped facets) (sorting.py:634-689)."""

    def __init__(self, fn, *facets):
        self.fn = fn
        self.facets = facets

    def default_name(self):
        return self.facets[0].default_name() if self.facets else "translate"

    def keys(self, searcher, docids, scores):
        cols = [f.keys(searcher, docids, scores) for f in self.facets]
        fn = self.fn
        return [fn(*vals) for vals in zip(*cols)]


class MultiFacet(FacetType):
    """Tuple of sub-facet keys (sorting.py:752-860); strings shorthand
    for FieldFacet."""

    def __init__(self, items=None, maptype=None):
        self.facets: list[FacetType] = []
        self.maptype = maptype
        for item in items or ():
            self._add(item)

    @classmethod
    def from_sortedby(cls, sortedby):
        multi = cls()
        if isinstance(sortedby, str):
            multi._add(sortedby)
        elif isinstance(sortedby, (list, tuple)):
            for item in sortedby:
                multi._add(item)
        else:
            multi._add(sortedby)
        return multi

    def _add(self, item):
        if isinstance(item, FacetType):
            self.facets.append(item)
        elif isinstance(item, str):
            self.facets.append(FieldFacet(item))
        else:
            raise TypeError(f"Don't know what to do with facet {item!r}")
        return self

    def add_field(self, fieldname, reverse=False):
        self.facets.append(FieldFacet(fieldname, reverse=reverse))
        return self

    def add_query(self, querydict, other=None, allow_overlap=False):
        self.facets.append(QueryFacet(querydict, other=other,
                                      allow_overlap=allow_overlap))
        return self

    def add_score(self):
        self.facets.append(ScoreFacet())
        return self

    def add_facet(self, facet):
        self.facets.append(facet)
        return self

    def default_name(self):
        return "/".join(f.default_name() for f in self.facets)

    def keys(self, searcher, docids, scores):
        if len(self.facets) == 1:
            return self.facets[0].keys(searcher, docids, scores)
        cols = [f.keys(searcher, docids, scores) for f in self.facets]
        return [tuple(vals) for vals in zip(*cols)]


class Facets:
    """Named facets for multi-grouping (sorting.py:862-951)."""

    def __init__(self, x=None):
        self.facets: dict[str, FacetType] = {}
        if x:
            self.add_facets(x)

    @classmethod
    def from_groupedby(cls, groupedby):
        facets = cls()
        if isinstance(groupedby, (cls, dict)):
            facets.add_facets(groupedby)
        elif isinstance(groupedby, str):
            facets.add_field(groupedby)
        elif isinstance(groupedby, FacetType):
            facets.add_facet(groupedby.default_name(), groupedby)
        elif isinstance(groupedby, (list, tuple)):
            for item in groupedby:
                facets.add_facets(cls.from_groupedby(item))
        else:
            raise TypeError(f"Don't know what to do with groupedby="
                            f"{groupedby!r}")
        return facets

    def names(self):
        return iter(self.facets)

    def items(self):
        return self.facets.items()

    def add_field(self, fieldname, **kwargs):
        self.facets[fieldname] = FieldFacet(fieldname, **kwargs)
        return self

    def add_query(self, name, querydict, **kwargs):
        self.facets[name] = QueryFacet(querydict, **kwargs)
        return self

    def add_facet(self, name, facet):
        if not isinstance(facet, FacetType):
            raise TypeError(f"{name!r}:{facet!r} is not a facet")
        self.facets[name] = facet
        return self

    def add_facets(self, facets, replace=True):
        if not isinstance(facets, (dict, Facets)):
            raise TypeError(f"{facets!r} is not a Facets object or dict")
        for name, facet in facets.items():
            if replace or name not in self.facets:
                self.facets[name] = facet
        return self


# ---- facet maps (sorting.py:955-1037)

class FacetMap:
    def add(self, groupname, docid, sortkey):
        raise NotImplementedError

    def as_dict(self) -> dict:
        raise NotImplementedError


class OrderedList(FacetMap):
    """group -> docids in results order."""

    def __init__(self):
        self.dict: dict = {}

    def add(self, groupname, docid, sortkey):
        self.dict.setdefault(groupname, []).append((sortkey, docid))

    def as_dict(self):
        return {k: [d for _, d in sorted(v)] for k, v in self.dict.items()}


class UnorderedList(FacetMap):
    """group -> docids in docid-insertion order."""

    def __init__(self):
        self.dict: dict = {}

    def add(self, groupname, docid, sortkey):
        self.dict.setdefault(groupname, []).append(docid)

    def as_dict(self):
        return dict(self.dict)


class Count(FacetMap):
    """group -> number of matching docs."""

    def __init__(self):
        self.dict: dict = {}

    def add(self, groupname, docid, sortkey):
        self.dict[groupname] = self.dict.get(groupname, 0) + 1

    def as_dict(self):
        return dict(self.dict)


class Best(FacetMap):
    """group -> the docid with the LOWEST sort key (the best-ranked
    doc; reference sorting.py:1059-1082 keeps the first strictly-lower
    key)."""

    def __init__(self):
        self.bestids: dict = {}
        self.bestkeys: dict = {}

    def add(self, groupname, docid, sortkey):
        if groupname not in self.bestids \
                or sortkey < self.bestkeys[groupname]:
            self.bestids[groupname] = docid
            self.bestkeys[groupname] = sortkey

    def as_dict(self):
        return dict(self.bestids)


def compute_groups(searcher, facet: FacetType, docids, scores,
                   maptype=None) -> dict:
    """Group a ranked match set: docids/scores are in RESULTS order, so
    rank is the sortkey OrderedList records."""
    mt = (maptype or facet.maptype or OrderedList)()
    if facet.allow_overlap:
        key_lists = facet.overlap_keys(searcher, docids, scores)
        for rank, (d, ks) in enumerate(zip(docids, key_lists)):
            for k in ks:
                mt.add(k, int(d), rank)
    else:
        keys = facet.keys(searcher, docids, scores)
        for rank, (d, k) in enumerate(zip(docids, keys)):
            mt.add(k, int(d), rank)
    return mt.as_dict()


def sort_match_set(searcher, sortedby, docids, scores,
                   reverse: bool = False):
    """whoosh sorted-search ordering: (facet key, docid) ascending,
    ``reverse=True`` flips the whole comparison."""
    facet = MultiFacet.from_sortedby(sortedby)
    keys = facet.keys(searcher, docids, scores)
    order = sorted(range(len(docids)),
                   key=lambda i: (keys[i], int(docids[i])),
                   reverse=reverse)
    idx = np.asarray(order, dtype=np.int64)
    return docids[idx], scores[idx]


def add_sortable(writer, fieldname: str, facet=None, column=None) -> None:
    """Reference sorting.add_sortable (sorting.py upgrade-in-place:
    builds a per-document column for an existing field so it can sort/
    facet without loading stored fields).  This engine's stored values
    ARE Arrow columns, so a stored field or stored column is already
    sortable — validated here as a no-op.  A field indexed without
    storing its value has nothing to derive the column from in-place;
    re-index it with ``stored=True`` (raises NotImplementedError)."""
    schema = writer.schema
    stored_cols = set(getattr(schema, "stored_columns", ()))
    if fieldname in stored_cols:
        return
    try:
        spec = schema.field(fieldname)
    except KeyError:
        raise KeyError(f"No field named {fieldname!r}")
    if getattr(spec, "stored", False):
        return
    raise NotImplementedError(
        f"field {fieldname!r} is indexed without stored values; the "
        "columnar engine derives sort keys from stored Arrow columns — "
        "re-index the field with stored=True")
