"""Reference qparser/dateparse.py surface.

The date grammar itself is implemented expression-for-expression in
``whoosh_ray.search.dateparse`` (tested vs the reference English parser
in tests/test_dateparse.py).  This module provides the names user code
imports: ``DateParserPlugin`` (the marker the engine parser consumes),
``DateParseError``, and an ``English`` parser facade whose
``date_from`` returns a concrete datetime for a fully-specified point
and a :class:`whoosh_ray.util.times.timespan` for a range — or None
when the grammar rejects the text, like the reference."""

from __future__ import annotations

from datetime import datetime

from whoosh_ray.qparser.plugins import DateParserPlugin  # noqa: F401
from whoosh_ray.util.times import timespan


class DateParseError(Exception):
    """Reference dateparse.py:42-45."""


class English:
    """Facade over the engine grammar mirroring the reference English
    parser's ``date_from`` contract (dateparse.py:581-727): a point in
    time comes back as a datetime, a range as a timespan, unparseable
    text as None."""

    def date_from(self, text: str, basedate: datetime | None = None,
                  pos: int = 0, debug: int = -9999, toend: bool = True):
        from whoosh_ray.search.dateparse import date_from as _df

        if basedate is None:
            basedate = datetime.utcnow()
        if pos:
            text = text[pos:]
        try:
            floor, ceil = _df(text, basedate)
        except ValueError:
            return None
        if floor == ceil:
            return floor
        return timespan(floor, ceil)
