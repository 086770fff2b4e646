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
