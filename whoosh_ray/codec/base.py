"""Codec plug-point surface under the reference's module path
(reference codec/base.py).

The reference's Codec/FieldWriter/TermsReader abstract classes define a
scalar single-writer file-format plug point; this engine's segment
layout is built by parallel Ray tasks through the vectorized kernels in
``state/codec.py`` and read through ``state/segment.SegmentReader`` —
so the writer/reader abstract bases have no counterpart here (see
COVERAGE.md).  What this module keeps is the part user code actually
imports: the cursor contract (``FieldCursor``/``EmptyCursor``,
codec/base.py:288-300,832-849), the ``Segment`` handle role (our
``SegmentMeta``), ``TermInfo``, and the codec entry points."""

from whoosh_ray.codec import default_codec  # noqa: F401
from whoosh_ray.codec.whoosh3 import W3Codec  # noqa: F401
from whoosh_ray.search.reader import TermCursor, TermInfo  # noqa: F401
from whoosh_ray.state.manifest import SegmentMeta as Segment  # noqa: F401

#: the default codec class under the base-module name the reference
#: exposes (codec/base.py:50)
Codec = W3Codec

#: the engine's merged-lexicon cursor plays the FieldCursor role
#: (codec/base.py:288-300 contract)
FieldCursor = TermCursor


class OutOfOrderError(Exception):
    """Postings added out of (field, term, docid) order
    (reference codec/base.py:44)."""


class EmptyCursor:
    """Cursor over no terms (reference codec/base.py:832-849) —
    every movement returns None, ``is_valid()`` is False."""

    def first(self):
        return None

    def find(self, term):
        return None

    def next(self):
        return None

    def text(self):
        return None

    # base.FieldCursor names the accessor term()
    term = text

    def term_info(self):
        return None

    def is_valid(self):
        return False
