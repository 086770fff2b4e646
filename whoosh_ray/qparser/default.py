"""Reference-layout alias: parser constructors (reference
qparser/default.py:38-439) live in whoosh_ray.search.qparser."""

from whoosh_ray.search.qparser import (  # noqa: F401
    DisMaxParser,
    MultifieldParser,
    QueryParser,
    SimpleParser,
)
