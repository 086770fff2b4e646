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


def fib(n: int) -> int:
    """Fibonacci helper the MERGE_SMALL policy thresholds on
    (reference util/__init__.py:104-112: fib(1)=1, fib(2)=2)."""
    if n <= 2:
        return n
    a, b = 1, 2
    for _ in range(n - 2):
        a, b = b, a + b
    return b
