"""File locks (drop-in for reference util/filelock.py:44-150).

The engine's writer already guards index directories with an flock'd
WRITELOCK (:class:`whoosh_ray.pipelines.writer.FLock`); this module
re-exposes it under the reference's names.  Only the fcntl flavour
exists — this engine targets POSIX workers.
"""

from __future__ import annotations

import time

from whoosh_ray.pipelines.writer import FLock

FcntlLock = FLock
LockBase = FLock


def FileLock(filename: str) -> FLock:
    """Return a platform-appropriate lock object (reference
    util/filelock.py picks FcntlLock on POSIX)."""
    return FLock(filename)


def try_for(fn, timeout: float = 5.0, delay: float = 0.1):
    """Call ``fn`` every ``delay`` seconds until it returns true or
    ``timeout`` elapses; returns the last result."""
    until = time.time() + timeout
    v = fn()
    while not v and time.time() < until:
        time.sleep(delay)
        v = fn()
    return v
