"""K-way external merge sort for arbitrary Python objects
(reference externalsort.py:85-240 API).

The engine never uses this — the distributed build replaces the
reference's PostingPool with a Ray ``groupby(seg)`` shuffle and
segment-local vectorized sorts — but the class is a documented
extension point (reference writing.py:131 invites subclassing
SortingPool), so a working single-process implementation ships for
user code that imported it.

Runs are pickled to temp files; ``items()`` streams a heap merge, so
memory stays bounded by ``maxsize`` items plus one pickle record per
open run.
"""

import os
import pickle
import tempfile
from heapq import merge as _heap_merge


def imerge(iterables):
    """Merge already-sorted iterables into one sorted iterator."""
    return _heap_merge(*iterables)


class SortingPool:
    """Accepts an unlimited number of items via :meth:`add`, spilling
    sorted runs to disk every ``maxsize`` items; :meth:`items` streams
    them back in fully sorted order.  Items must be picklable and
    mutually orderable."""

    def __init__(self, maxsize: int = 1000000, tempdir: str | None = None,
                 prefix: str = "", suffix: str = ".run"):
        if maxsize < 1:
            raise ValueError("maxsize=%s must be >= 1" % maxsize)
        self.maxsize = maxsize
        self.tempdir = tempdir
        self.prefix = prefix
        self.suffix = suffix
        self.current: list = []
        self.runs: list[str] = []

    # run-file primitives (subclass hooks, same names as the reference)

    def _new_run(self):
        fd, path = tempfile.mkstemp(prefix=self.prefix, suffix=self.suffix,
                                    dir=self.tempdir)
        return path, os.fdopen(fd, "wb")

    def _open_run(self, path):
        return open(path, "rb")

    def _remove_run(self, path):
        os.remove(path)

    def _read_run(self, path):
        with self._open_run(path) as f:
            try:
                while True:
                    yield pickle.load(f)
            except EOFError:
                pass
        self._remove_run(path)

    def _write_run(self, f, items):
        with f:
            for item in items:
                pickle.dump(item, f, protocol=pickle.HIGHEST_PROTOCOL)

    def _add_run(self, path):
        self.runs.append(path)

    def _merge_runs(self, paths):
        return imerge([self._read_run(p) for p in paths])

    # public surface

    def add(self, item):
        if len(self.current) >= self.maxsize:
            self.save()
        self.current.append(item)

    def save(self):
        """Spill the in-memory queue as one sorted run."""
        if self.current:
            self.current.sort()
            path, f = self._new_run()
            self._write_run(f, self.current)
            self._add_run(path)
            self.current = []

    def cleanup(self):
        for path in self.runs:
            try:
                os.remove(path)
            except OSError:
                pass

    def reduce_to(self, target: int, k: int):
        """Merge runs ``k`` at a time until at most ``target`` remain
        (bounds simultaneously-open files during the final merge)."""
        if k < 2:
            raise ValueError("k=%s must be > 2" % k)
        if target < 1:
            raise ValueError("target=%s must be >= 1" % target)
        while len(self.runs) > target:
            tomerge = [self.runs.pop() for _ in
                       range(min(k, len(self.runs)))]
            path, f = self._new_run()
            self._write_run(f, self._merge_runs(tomerge))
            self.runs.insert(0, path)

    def items(self, maxfiles: int = 128):
        """All added items in sorted order — a plain sorted list when
        nothing spilled, else a streaming merge of the runs.  Resets
        the pool for reuse."""
        if maxfiles < 2:
            raise ValueError("maxfiles=%s must be >= 2" % maxfiles)
        if not self.runs:
            return sorted(self.current)
        self.save()
        if len(self.runs) > maxfiles:
            self.reduce_to(maxfiles, maxfiles)
        runs, self.runs = self.runs, []
        return self._merge_runs(runs)


def sort(items, maxsize: int = 100000, tempdir: str | None = None,
         maxfiles: int = 128):
    """One-shot external sort of an iterable."""
    pool = SortingPool(maxsize=maxsize, tempdir=tempdir)
    for item in items:
        pool.add(item)
    return pool.items(maxfiles=maxfiles)
