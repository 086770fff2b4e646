"""Drop-in spelling surface (reference whoosh/spelling.py names);
the vectorized Levenshtein engine lives in
whoosh_ray.functions.spelling (suggest rides Searcher/reader)."""

from whoosh_ray.functions.spelling import (  # noqa: F401
    Correction,
    Corrector,
    ListCorrector,
    MultiCorrector,
    QueryCorrector,
    ReaderCorrector,
    SimpleQueryCorrector,
    levenshtein_batch,
)
