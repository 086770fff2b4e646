"""Broadcast-side lookup helper for map_batches stages.

Small reference data (docid bases, query matrices, stop lists) is put in
the object store ONCE on the driver (``ray.put``) and fetched inside
worker processes with a per-process cache, so a stateless task stage pays
the deserialization once per worker instead of once per batch — the
broadcast-join pattern, no shuffle.
"""

from __future__ import annotations

import ray

_CACHE: dict = {}


def get_broadcast(ref):
    key = ref.hex() if hasattr(ref, "hex") else ref
    if key not in _CACHE:
        if len(_CACHE) > 32:
            _CACHE.clear()
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
