"""IndexReader facade: the reference's reader API surface over a Searcher.

Reference analogue: ``whoosh.reading.IndexReader`` / ``MultiReader``
(reading.py:139-700, 1040-1260) — the object ``Searcher.reader()``
returns, and the surface ``whoosh.writing.add_reader`` and user tooling
iterate (term dictionaries with :class:`TermInfo` stats, stored-field
iteration, per-doc field lengths, deletions, vectors, spelling
correctors, sortable columns).  Everything here delegates to the
Searcher's merged-across-segments machinery, so every statistic matches
the scoring path bit-for-bit.

Iteration yields *str* term texts (this engine's convention everywhere)
where the reference yields encoded bytes; ``from_bytes`` is the identity
for its text fields, so values compare equal.
"""

from __future__ import annotations

import numpy as np

from whoosh_ray.functions.lengths import byte_to_length, length_to_byte
from whoosh_ray.search.query import TermNotFound


class TermInfo:
    """Merged term statistics (reference reading.py:44-137): the same
    accessors over the Searcher's cross-segment merge."""

    __slots__ = ("_d",)

    def __init__(self, d: dict):
        self._d = d

    def weight(self) -> float:
        return float(self._d["total_weight"])

    def doc_frequency(self) -> int:
        return int(self._d["df"])

    def min_length(self) -> int:
        return int(byte_to_length(self._d["min_length"]))

    def max_length(self) -> int:
        return int(byte_to_length(self._d["max_length"]))

    def max_weight(self) -> float:
        return float(self._d["max_weight"])

    def min_id(self) -> int:
        return int(self._d["min_docid"])

    def max_id(self) -> int:
        return int(self._d["max_docid"])

    def __repr__(self):  # pragma: no cover
        return f"TermInfo({self._d!r})"


class ColumnReader:
    """Per-document random access to a stored column (reference
    columns.ColumnReader surface: len / getitem / iter).  Loads the
    column once; docnum gaps (never produced by dense docid assignment)
    and schema-evolution misses read as None."""

    def __init__(self, searcher, fieldname: str, reverse: bool = False):
        import pyarrow as pa

        parts = [seg.docs_table(columns=["docid", fieldname])
                 for seg in searcher.segments]
        t = (pa.concat_tables(parts, promote_options="default")
             if parts else None)
        n = searcher.doc_count_all
        self._values: list = [None] * n
        col_type = None
        if t is not None:
            ids = t["docid"].to_numpy()
            vals = t[fieldname].to_pylist()
            for i, v in zip(ids.tolist(), vals):
                if 0 <= i < n:
                    self._values[i] = v
            col_type = t[fieldname].type
        if reverse and not (col_type is not None
                            and (pa.types.is_integer(col_type)
                                 or pa.types.is_floating(col_type)
                                 or pa.types.is_boolean(col_type)
                                 or pa.types.is_temporal(col_type))):
            # reference parity (columns.py:160-161): only numeric/bit
            # columns implement set_reverse; others raise
            raise NotImplementedError(
                f"column type {col_type} is not reversible")
        self._reverse = reverse

    def __len__(self) -> int:
        return len(self._values)

    def __getitem__(self, docnum: int):
        return self._values[docnum]

    def __iter__(self):
        return iter(self._values)

    def sort_key(self, docnum: int):
        v = self._values[docnum]
        if self._reverse and v is not None:
            # reference numeric Reader.sort_key negates (columns.py:
            # 647-651); bit readers xor (columns.py:739).  Dates are
            # numeric ticks in the reference, so negate epoch ticks.
            if isinstance(v, bool):
                v = not v
            elif isinstance(v, (int, float)):
                v = 0 - v
            else:
                import calendar

                tt = (v.utctimetuple() if hasattr(v, "utctimetuple")
                      else v.timetuple())
                v = -(calendar.timegm(tt) * 10**6
                      + getattr(v, "microsecond", 0))
        return (v is None, v)


class ReaderCorrector:
    """reference spelling.ReaderCorrector: suggestions from the field's
    term dictionary, ranked exactly like ``Searcher.suggest`` (incl. the
    frequency-only rank quirk)."""

    def __init__(self, searcher, fieldname: str):
        self.searcher = searcher
        self.fieldname = fieldname

    def suggest(self, text: str, limit: int = 5, maxdist: int = 2,
                prefix: int = 0) -> list[str]:
        return self.searcher.suggest(self.fieldname, text, limit=limit,
                                     maxdist=maxdist, prefix=prefix)


class TermCursor:
    """FieldCursor facade over one field's merged sorted lexicon
    (reference codec/base.py:288-300 contract; whoosh3.py:505-560
    behavior): ``first()``/``find()``/``next()`` return the new current
    term text or None past the field's last term; ``find`` seeks to the
    first term >= the probe (closest-key semantics).  One cursor covers
    the whole index — the reference's per-segment cursors merge through
    MultiCursor; our lexicon is already the merged view."""

    def __init__(self, reader: "IndexReader", fieldname: str):
        self._reader = reader
        self._fieldname = fieldname
        self._terms = list(reader.searcher.lexicon(fieldname))
        self._i = 0

    def is_valid(self) -> bool:
        return 0 <= self._i < len(self._terms)

    def text(self):
        return self._terms[self._i] if self.is_valid() else None

    # base.FieldCursor names the accessor term(); W3 adds text()
    term = text

    def first(self):
        self._i = 0
        return self.text()

    def find(self, string):
        from bisect import bisect_left

        self._i = bisect_left(self._terms, str(string))
        return self.text()

    def next(self):
        if self.is_valid():
            self._i += 1
        return self.text()

    def term_info(self):
        return (self._reader.term_info(self._fieldname, self.text())
                if self.is_valid() else None)


class IndexReader:
    """See module docstring.  Cheap to construct; holds no file state of
    its own (all reads go through the Searcher's segment readers)."""

    def __init__(self, searcher):
        self.searcher = searcher
        self.schema = searcher.schema

    # ---- lifecycle ----

    def close(self) -> None:
        pass

    def __enter__(self) -> "IndexReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def is_atomic(self) -> bool:
        return len(self.searcher.segments) <= 1

    def leaf_readers(self):
        """[(segment reader, docid offset)] — reference
        MultiReader.leaf_readers (reading.py:1102-1104)."""
        return [(seg, seg.meta.docid_range()[0])
                for seg in self.searcher.segments]

    def generation(self) -> int:
        return int(self.searcher.manifest.settings.get("generation", -1))

    # ---- storage introspection (reference reading.py:158-186,631-642:
    # atomic readers expose their codec/segment/storage, composite
    # readers return None; this reader is composite by design — the
    # per-segment objects are reachable via segments()/leaf_readers) --

    def codec(self):
        return None

    def segment(self):
        return None

    def storage(self):
        return None

    def segments(self) -> list:
        """The per-segment readers backing this reader (the engine's
        Segment objects; reference reading.py:174-178)."""
        return list(self.searcher.segments)

    def supports_caches(self) -> bool:
        # the reference's field-cache files don't exist here; sorting/
        # faceting read the Arrow stored columns directly
        return False

    def indexed_field_names(self) -> list[str]:
        return [f.name for f in self.schema.fields]

    # ---- term dictionary ----

    def __contains__(self, term: tuple[str, str]) -> bool:
        f, t = term
        # removed fields vanish from the reader IMMEDIATELY, before any
        # merge reclaims their postings (reference test_removefield:
        # ("content", ...) not in reader right after remove_field+commit)
        if not any(fs.name == f for fs in self.schema.fields):
            return False
        return self.searcher.global_term_info(f, str(t)) is not None

    def all_terms(self):
        """(fieldname, text) for every term, in lexical order."""
        for fname in sorted(f.name for f in self.schema.fields):
            for text in self.searcher.lexicon(fname):
                yield fname, text

    def terms_from(self, fieldname: str, prefix: str):
        """Reference default semantics (reading.py:225-242): a FILTER
        over all_terms — terms in later fields sorting below ``prefix``
        are skipped too, exactly like the reference's loop."""
        for fname, text in self.all_terms():
            if fname < fieldname or text < prefix:
                continue
            yield fname, text

    def expand_prefix(self, fieldname: str, prefix: str):
        yield from self.searcher.expand_prefix(fieldname, prefix)

    def lexicon(self, fieldname: str):
        yield from self.searcher.lexicon(fieldname)

    def field_terms(self, fieldname: str):
        yield from self.searcher.lexicon(fieldname)

    def term_info(self, fieldname: str, text: str) -> TermInfo:
        ti = self.searcher.global_term_info(fieldname, str(text))
        if ti is None:
            raise TermNotFound(f"{fieldname}:{text!r}")
        return TermInfo(ti)

    def __iter__(self):
        for term in self.all_terms():
            yield term, self.term_info(*term)

    def iter_from(self, fieldname: str, text: str):
        for term in self.terms_from(fieldname, text):
            yield term, self.term_info(*term)

    def iter_field(self, fieldname: str, prefix: str = ""):
        for (fn, text), ti in self.iter_from(fieldname, prefix):
            if fn != fieldname:
                return
            yield text, ti

    def iter_prefix(self, fieldname: str, prefix: str):
        for text, ti in self.iter_field(fieldname, prefix):
            if not text.startswith(prefix):
                return
            yield text, ti

    # ---- documents ----

    def doc_count(self) -> int:
        return self.searcher.doc_count()

    def doc_count_all(self) -> int:
        return self.searcher.doc_count_all

    def has_deletions(self) -> bool:
        return any(len(seg.deletes) for seg in self.searcher.segments)

    def deleted_docs_set(self) -> set[int]:
        out: set[int] = set()
        for seg in self.searcher.segments:
            out.update(int(d) for d in seg.deletes)
        return out

    def is_deleted(self, docnum: int) -> bool:
        try:
            seg = self.searcher.seg_of(docnum)
        except KeyError:
            return False
        return bool(len(seg.deletes)) and int(docnum) in set(
            seg.deletes.tolist())

    def all_doc_ids(self):
        yield from self.searcher.all_docids().tolist()

    def stored_fields(self, docnum: int) -> dict:
        t = self.searcher.stored(np.asarray([docnum], dtype=np.int64))
        if not t.num_rows:
            raise KeyError(docnum)
        return {k: v for k, v in t.to_pylist()[0].items()
                if k != "docid" and "__vector_" not in k}

    def all_stored_fields(self):
        for docnum in self.all_doc_ids():
            yield self.stored_fields(docnum)

    def iter_docs(self):
        for docnum in self.all_doc_ids():
            yield docnum, self.stored_fields(docnum)

    def column_reader(self, fieldname: str,
                      reverse: bool = False) -> ColumnReader:
        return ColumnReader(self.searcher, fieldname, reverse=reverse)

    def has_column(self, fieldname: str) -> bool:
        """True when a per-document column exists for the field
        (reference reading.py:867-871: column_type and the per-doc
        storage has it).  Here every STORED field is a parquet column,
        so presence == stored in the schema (incl. stored passthrough
        columns)."""
        schema = self.searcher.schema
        try:
            return bool(schema.field(fieldname).stored)
        except KeyError:
            return fieldname in schema.stored_columns

    def cursor(self, fieldname: str) -> "TermCursor":
        """Seekable term cursor over the field's merged lexicon
        (reference reading.py:849-853 -> codec FieldCursor,
        whoosh3.py:505-560: first/find/next/text/term_info/is_valid;
        construction positions at the field's first term)."""
        self.searcher.schema.field(fieldname)  # KeyError on unknown
        return TermCursor(self, fieldname)

    # ---- statistics ----

    def field_length(self, fieldname: str) -> int:
        return self.searcher.field_length(fieldname)

    def min_field_length(self, fieldname: str) -> int:
        return self.searcher.min_field_length(fieldname)

    def max_field_length(self, fieldname: str) -> int:
        return self.searcher.max_field_length(fieldname)

    def doc_field_length(self, docnum: int, fieldname: str,
                         default: int = 0) -> int:
        """Quantized per-doc field length (reference reading.py:412-416
        → byte_to_length of the stored length byte).  Recomputed from
        the STORED text through the field's analyzer — identical to the
        indexed value because the index derived it from the same
        analysis; unstored fields return ``default``."""
        from whoosh_ray.functions.analysis import VectorAnalyzer

        try:
            spec = self.schema.field(fieldname)
        except KeyError:
            return default
        t = self.searcher.stored(np.asarray([docnum], dtype=np.int64),
                                 columns=[fieldname])
        if not t.num_rows or not t[fieldname][0].is_valid:
            return default
        text = t[fieldname][0].as_py()
        agg = VectorAnalyzer(spec.analyzer).aggregate([str(text)])
        n = int(agg["row_lengths"][0]) if len(agg["row_lengths"]) else 0
        if n == 0:
            return default
        return int(byte_to_length(length_to_byte(np.asarray([n]))[0]))

    def doc_frequency(self, fieldname: str, text: str) -> int:
        return self.searcher.doc_frequency(fieldname, str(text))

    def frequency(self, fieldname: str, text: str) -> float:
        return self.searcher.frequency(fieldname, str(text))

    def most_frequent_terms(self, fieldname: str, number: int = 5,
                            prefix: str = "") -> list[tuple]:
        return self.searcher.most_frequent_terms(fieldname, number,
                                                 prefix)

    def most_distinctive_terms(self, fieldname: str, number: int = 5,
                               prefix: str = "") -> list[tuple]:
        return self.searcher.most_distinctive_terms(fieldname, number,
                                                    prefix)

    # ---- postings ----

    def postings(self, fieldname: str, text: str):
        ids, ws = self.searcher.postings(fieldname, str(text))
        if not len(ids):
            raise TermNotFound(f"{fieldname}:{text!r}")
        return ids, ws

    def first_id(self, fieldname: str, text: str) -> int:
        ids, _ = self.postings(fieldname, text)
        return int(ids[0])

    def iter_postings(self):
        """(fieldname, text, docnum, weight) for every posting in the
        reader (reference reading.py:429-440; the low-level surface
        add_reader-style consumers walk)."""
        for fname, text in self.all_terms():
            try:
                ids, ws = self.postings(fname, text)
            except TermNotFound:  # pragma: no cover — deleted everywhere
                continue
            for d, w in zip(ids.tolist(), ws.tolist()):
                yield fname, text, int(d), float(w)

    # ---- vectors ----

    def has_vector(self, docnum: int, fieldname: str) -> bool:
        return (self.searcher.has_vector(fieldname)
                and self.searcher.vector(docnum, fieldname) is not None)

    def vector(self, docnum: int, fieldname: str):
        v = self.searcher.vector(docnum, fieldname)
        if v is None:
            raise KeyError((docnum, fieldname))
        return v

    def vector_as(self, astype: str, docnum: int, fieldname: str):
        """(termtext, value) pairs from the stored vector — reference
        reading.py:482-510; astype "frequency" yields int weights,
        "weight" floats."""
        terms, weights = self.vector(docnum, fieldname)
        for t, w in zip(terms, weights):
            yield t, (int(w) if astype == "frequency" else float(w))

    # ---- spelling ----

    def corrector(self, fieldname: str) -> ReaderCorrector:
        return ReaderCorrector(self.searcher, fieldname)

    def terms_within(self, fieldname: str, text: str, maxdist: int,
                     prefix: int = 0):
        """Field terms within ``maxdist`` edits of ``text`` (reference
        reading.py:522-548; same acceptance set as the suggest path —
        plain Levenshtein, fuzz-pinned vs the reference automaton)."""
        from whoosh_ray.functions.spelling import levenshtein_batch

        # reference reading.py:855-863: redirect to the separate-spelling
        # subfield's lexicon when the field has one
        try:
            fieldname = (self.searcher.schema.field(fieldname).spell_field
                         or fieldname)
        except KeyError:
            pass
        cands = (self.searcher.expand_prefix(fieldname, text[:prefix])
                 if prefix else self.searcher.lexicon(fieldname))
        dists = levenshtein_batch(text, cands, maxdist)
        for w, d in zip(cands, dists):
            if d <= maxdist:
                yield w
