"""Drop-in util surface (the reference whoosh/util helpers user code
actually imports: rcompile from util/text.py, fib from
util/__init__.py, the sortable converters from util/numeric.py and the
datetime converters from util/times.py)."""

from __future__ import annotations

import re

from whoosh_ray.fields import (  # noqa: F401
    datetime_to_long,
    float_to_sortable_long,
    from_sortable,
    long_to_datetime,
    sortable_long_to_float,
    to_sortable,
)
from whoosh_ray.writing import fib  # noqa: F401


def rcompile(pattern, flags: int = 0, verbose: bool = False):
    """re.compile wrapper: passes through pre-compiled patterns and
    always adds re.UNICODE (reference util/text.py:122-132)."""
    if not isinstance(pattern, str):
        return pattern
    if verbose:
        flags |= re.VERBOSE
    return re.compile(pattern, re.UNICODE | flags)
