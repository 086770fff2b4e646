"""Drop-in writing surface (reference whoosh/writing.py names);
the writers live in whoosh_ray.pipelines.writer."""

from whoosh_ray.pipelines.writer import (  # noqa: F401
    CLEAR,
    MERGE_SMALL,
    NO_MERGE,
    OPTIMIZE,
    AsyncWriter,
    BufferedWriter,
    IndexingError,
    IndexWriter,
    LockError,
    UnknownFieldError,
)

#: reference writing.py:1012 — BatchWriter is the legacy alias of
#: BufferedWriter
BatchWriter = BufferedWriter

#: reference writing.py:505 — SegmentWriter is the concrete writer an
#: ``ix.writer()`` call returns; here that role is IndexWriter itself
#: (the posting-sort/flush machinery it adds over the base class is the
#: Ray build pipeline)
SegmentWriter = IndexWriter


def groupmanager(writer):
    """Context manager marking a hierarchical document group
    (reference writing.py:52-56) — the function form of
    ``writer.group()``."""
    return writer.group()


def try_for(fn, timeout: float = 5.0, delay: float = 0.1):
    """Retry helper the reference writer's lock loop uses
    (re-export; util/filelock.py:44-60)."""
    from whoosh_ray.util.filelock import try_for as _tf

    return _tf(fn, timeout, delay)


def fib(n: int) -> int:
    """Fibonacci helper the MERGE_SMALL policy thresholds on
    (reference util/__init__.py:104-112: fib(1)=1, fib(2)=2)."""
    if n <= 2:
        return n
    a, b = 1, 2
    for _ in range(n - 2):
        a, b = b, a + b
    return b


def random_name(size: int = 28) -> str:
    """Random base-36-ish name (reference util/__init__.py:60-62)."""
    import random
    import string

    return "".join(random.choice(string.ascii_lowercase + string.digits)
                   for _ in range(size))


def add_spelling(ix, fieldnames, commit: bool = True) -> None:
    """Reference writing.add_spelling retrofits FST word-graph files
    so suggest() works on an existing index (writing.py:60-107 in older
    releases).  This engine's suggest/FuzzyTerm read the sorted term
    dictionary directly (functions/spelling.levenshtein_batch over the
    lexicon), so every field is already 'spellable' — nothing to
    retrofit; provided as a documented no-op."""
    return None
