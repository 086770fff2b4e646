"""Broadcast-side lookup helper for map_batches stages.

Small reference data (docid bases, query matrices, stop lists) is put in
the object store ONCE on the driver (``ray.put``) and fetched inside
worker processes with a per-process cache, so a stateless task stage pays
the deserialization once per worker instead of once per batch — the
broadcast-join pattern, no shuffle.
"""

from __future__ import annotations

from collections import OrderedDict

import ray

_CACHE: OrderedDict = OrderedDict()
_CAPACITY = 64


def get_broadcast(ref):
    key = ref.hex() if hasattr(ref, "hex") else ref
    hit = _CACHE.get(key)
    if hit is not None:
        _CACHE.move_to_end(key)  # LRU touch
        return hit
    # LRU eviction (not clear-all): a worker cycling through many
    # broadcast objects — e.g. the sharded docid-base buckets its
    # batches touch — keeps its hot set instead of re-fetching
    # everything after each overflow
    while len(_CACHE) >= _CAPACITY:
        _CACHE.popitem(last=False)
    val = ray.get(ref)
    _CACHE[key] = val
    return val
