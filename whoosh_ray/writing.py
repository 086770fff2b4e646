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

from whoosh_ray.externalsort import SortingPool  # noqa: E402,F401


class PostingPool(SortingPool):
    """Byte-budgeted external sort of ``(fieldname, tbytes, docnum,
    weight, vbytes)`` posting tuples (reference writing.py:130-180).

    The engine's distributed build replaces this with a Ray
    ``groupby(seg)`` shuffle + segment-local vectorized sorts, but the
    class is a documented extension point, so a working implementation
    ships for user code that imported it.  ``tempstore`` may be a
    directory path or any object with ``create_file/open_file/
    delete_file`` (the reference Storage protocol); runs spill when the
    reference's per-item size estimate crosses ``limitmb``."""

    namechars = "abcdefghijklmnopqrstuvwxyz0123456789"

    def __init__(self, tempstore=None, segment=None, limitmb: int = 128,
                 **kwargs):
        if isinstance(tempstore, str):
            import os

            os.makedirs(tempstore, exist_ok=True)
            kwargs.setdefault("tempdir", tempstore)
            tempstore = None
        super().__init__(**kwargs)
        self.tempstore = tempstore
        self.segment = segment
        self.limit = limitmb * 1024 * 1024
        self.currentsize = 0
        self.fieldnames: set = set()

    def _new_run(self):
        if self.tempstore is None:
            return super()._new_run()
        path = "%s.run" % random_name()
        return path, self.tempstore.create_file(path).raw_file()

    def _open_run(self, path):
        if self.tempstore is None:
            return super()._open_run(path)
        return self.tempstore.open_file(path).raw_file()

    def _remove_run(self, path):
        if self.tempstore is None:
            return super()._remove_run(path)
        return self.tempstore.delete_file(path)

    def add(self, item):
        # item = (fieldname, tbytes, docnum, weight, vbytes)
        assert isinstance(item[1], bytes), "tbytes=%r" % (item[1],)
        if item[4] is not None:
            assert isinstance(item[4], bytes), "vbytes=%r" % (item[4],)
        self.fieldnames.add(item[0])
        # the reference's flat per-item size model (writing.py:152-158)
        size = (28 + 4 * 5
                + 21 + len(item[0])
                + 26 + len(item[1]) * 2
                + 18
                + 16
                + 21 + len(item[4] or b""))
        self.currentsize += size
        if self.currentsize > self.limit:
            self.save()
        self.current.append(item)

    def iter_postings(self):
        return self.items()

    def save(self):
        super().save()
        self.currentsize = 0

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
