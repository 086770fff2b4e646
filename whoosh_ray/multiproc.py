"""Multiprocessing-writer compat surface (reference multiproc.py).

The reference's ``MpWriter`` forks ``procs`` subprocesses, each
building a sub-segment with its own PostingPool, then merges the runs
(multiproc.py:156-340).  In this engine *every* writer is already a
parallel distributed build — ``commit()`` runs the Ray Data pipeline
(read → map_batches tokenize → groupby(seg) → per-segment encode) over
the whole cluster — so these classes accept the reference's
parallelism knobs for signature compatibility and delegate to
:class:`whoosh_ray.pipelines.writer.IndexWriter`:

- ``procs`` / ``batchsize`` / ``subargs`` are accepted and ignored
  (Ray's streaming executor sizes the actual fan-out).
- ``multisegment=True`` is the reference's "skip the final merge" mode;
  our build already seals one segment per ``seg_size`` docid range and
  never merges at commit unless a merge policy asks for it, so the
  flag is a no-op with the same observable effect.
"""

from __future__ import annotations

from whoosh_ray.pipelines.writer import IndexWriter


class MpWriter(IndexWriter):
    """Parallel writer (reference multiproc.py:156): same add/commit
    surface; the Ray pipeline supplies the parallelism."""

    def __init__(self, ix, procs: int | None = None, batchsize: int = 100,
                 subargs: dict | None = None, multisegment: bool = False,
                 **kwargs):
        self.procs = procs
        self.batchsize = batchsize
        self.multisegment = multisegment
        super().__init__(ix, **kwargs)


class SerialMpWriter(MpWriter):
    """Reference multiproc.py:342 — the in-process fallback used when
    multiprocessing is unavailable; identical here."""


class MultiSegmentWriter(MpWriter):
    """Reference multiproc.py:381 — MpWriter(multisegment=True)."""

    def __init__(self, ix, procs: int | None = None, batchsize: int = 100,
                 **kwargs):
        super().__init__(ix, procs=procs, batchsize=batchsize,
                         multisegment=True, **kwargs)


# the reference module imports SegmentWriter as its base; same alias
from whoosh_ray.writing import SegmentWriter  # noqa: E402,F401
