"""Drop-in reading surface (reference whoosh/reading.py names);
IndexReader/TermInfo/cursor live in whoosh_ray.search.reader.  The
composite reader over all segments plays the reference MultiReader's
role (one class covers both — segment fan-in is vectorized)."""

from whoosh_ray.search.reader import (  # noqa: F401
    ColumnReader,
    IndexReader,
    TermCursor,
    TermInfo,
    TermNotFound,
)

#: the reference's multi-segment reader; the engine's IndexReader IS the
#: composite (reading.py:866-1080 role)
MultiReader = IndexReader


class ReaderClosed(Exception):
    """Operation on a closed reader (reference reading.py:56-62)."""
    message = "Operation on a closed object"


#: per-segment reader / overlay storage under the reference's re-export
#: names (reference reading.py imports them from codec/filedb)
from whoosh_ray.state.segment import SegmentReader  # noqa: E402,F401
from whoosh_ray.filedb.filestore import OverlayStorage  # noqa: E402,F401


def combine_terminfos(tis):
    """Merge per-segment ``(TermInfo, doc_offset)`` pairs into one
    TermInfo (reference reading.py:1252-1270 semantics: sum weight/df,
    min/max lengths and weights, offset-shifted min/max ids)."""
    from whoosh_ray.functions.lengths import length_to_byte

    if len(tis) == 1:
        ti, offset = tis[0]
        d = dict(ti._d)
        d["min_docid"] = int(d["min_docid"]) + offset
        d["max_docid"] = int(d["max_docid"]) + offset
        return TermInfo(d)
    return TermInfo({
        "total_weight": sum(ti.weight() for ti, _ in tis),
        "df": sum(ti.doc_frequency() for ti, _ in tis),
        "min_length": length_to_byte(min(ti.min_length() for ti, _ in tis)),
        "max_length": length_to_byte(max(ti.max_length() for ti, _ in tis)),
        "max_weight": max(ti.max_weight() for ti, _ in tis),
        "min_docid": min(ti.min_id() + off for ti, off in tis),
        "max_docid": max(ti.max_id() + off for ti, off in tis),
    })


class MultiCursor:
    """K-way merge cursor over several per-segment/field cursors
    (reference reading.py:1273-1317 role).

    The reference class is broken as shipped (pinned in
    tests/test_reader.py): ``_find_low`` never seeds its low list (the
    ``if low and ...`` guards are both false while ``low`` is empty, so
    no cursor is ever selected) and ``term_info`` feeds bare TermInfos
    to ``combine_terminfos`` which expects ``(ti, offset)`` pairs.  We
    implement the evident intent — a correct k-way merge: movement
    methods return the new lowest current term; ``next()`` advances
    only the cursors sitting on that term (the reference's
    advance-everything ``next`` would skip terms)."""

    def __init__(self, cursors):
        self._cursors = [c for c in cursors if c.is_valid()]
        self._low = []
        self._text = None
        self._find_low()

    def _find_low(self):
        low = []
        lowterm = None
        for c in self._cursors:
            if c.is_valid():
                cterm = c.term()
                if not low or cterm < lowterm:
                    low = [c]
                    lowterm = cterm
                elif cterm == lowterm:
                    low.append(c)
        self._low = low
        self._text = lowterm
        return lowterm

    def first(self):
        for c in self._cursors:
            c.first()
        return self._find_low()

    def find(self, term):
        for c in self._cursors:
            c.find(term)
        return self._find_low()

    def next(self):
        for c in self._low:
            c.next()
        return self._find_low()

    def text(self):
        return self._text

    term = text

    def term_info(self):
        tis = [(c.term_info(), 0) for c in self._low]
        return combine_terminfos(tis) if tis else None

    def is_valid(self):
        return any(c.is_valid() for c in self._cursors)


class EmptyReader(IndexReader):
    """Reader over no documents (reference reading.py:905-993): the
    full IndexReader surface answering 'nothing here' without touching
    storage.  ``Index.reader()`` on a zero-segment index could return
    one; the engine's composite reader already handles empty manifests,
    so this exists for user code that imports it directly."""

    def __init__(self, schema=None):
        self.schema = schema

    def __contains__(self, term):
        return False

    def __iter__(self):
        return iter([])

    def segments(self):
        return None

    def cursor(self, fieldname):
        from whoosh_ray.codec.base import EmptyCursor

        return EmptyCursor()

    def indexed_field_names(self):
        return []

    def all_terms(self):
        return iter([])

    def term_info(self, fieldname, text):
        raise TermNotFound((fieldname, text))

    def iter_from(self, fieldname, text):
        return iter([])

    def iter_field(self, fieldname, prefix=""):
        return iter([])

    def iter_prefix(self, fieldname, prefix=""):
        return iter([])

    def lexicon(self, fieldname):
        return iter([])

    def has_deletions(self):
        return False

    def is_deleted(self, docnum):
        return False

    def stored_fields(self, docnum):
        raise KeyError("No document number %s" % docnum)

    def all_stored_fields(self):
        return iter([])

    def doc_count_all(self):
        return 0

    def doc_count(self):
        return 0

    def frequency(self, fieldname, text):
        return 0

    def doc_frequency(self, fieldname, text):
        return 0

    def field_length(self, fieldname):
        return 0

    def min_field_length(self, fieldname):
        return 0

    def max_field_length(self, fieldname):
        return 0

    def doc_field_length(self, docnum, fieldname, default=0):
        return default

    def postings(self, fieldname, text, scorer=None):
        raise TermNotFound("%s:%r" % (fieldname, text))

    def has_vector(self, docnum, fieldname):
        return False

    def vector(self, docnum, fieldname, format_=None):
        raise KeyError("No document number %s" % docnum)

    def most_frequent_terms(self, fieldname, number=5, prefix=""):
        return iter([])

    def most_distinctive_terms(self, fieldname, number=5, prefix=None):
        return iter([])

    def close(self):
        pass
