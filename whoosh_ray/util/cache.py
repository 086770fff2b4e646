"""Caching decorators (drop-in for reference util/cache.py:44-110).

``lru_cache`` in the reference is a backport of functools.lru_cache;
here it IS functools.lru_cache.  ``lfu_cache`` keeps the reference's
evict-the-least-frequent-10% policy and cache_info()/cache_clear()
protocol.
"""

from __future__ import annotations

import functools
from collections import Counter
from heapq import nsmallest
from operator import itemgetter

lru_cache = functools.lru_cache


def unbound_cache(func):
    """Unbounded memoizer (positional args must be hashable)."""
    cache: dict = {}

    @functools.wraps(func)
    def caching_wrapper(*args):
        try:
            return cache[args]
        except KeyError:
            result = func(*args)
            cache[args] = result
            return result

    return caching_wrapper


def lfu_cache(maxsize: int = 100):
    """When full, evicts the least frequently used 10% of entries."""

    def decorating_function(user_function):
        stats = [0, 0]  # hits, misses
        data: dict = {}
        usecount: Counter = Counter()

        @functools.wraps(user_function)
        def wrapper(*args):
            try:
                result = data[args]
                stats[0] += 1
            except KeyError:
                stats[1] += 1
                if len(data) == maxsize:
                    for k, _ in nsmallest(maxsize // 10 or 1,
                                          usecount.items(),
                                          key=itemgetter(1)):
                        del data[k]
                        del usecount[k]
                data[args] = user_function(*args)
                result = data[args]
            finally:
                usecount[args] += 1
            return result

        wrapper.cache_info = lambda: (stats[0], stats[1], maxsize, len(data))

        def cache_clear():
            data.clear()
            usecount.clear()

        wrapper.cache_clear = cache_clear
        return wrapper

    return decorating_function
