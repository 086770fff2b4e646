"""English date-expression parsing — the practical subset of the
reference's dateparse DSL (qparser/dateparse.py, 922 LoC of parser
combinators).  Instead of porting the combinator machinery, this module
parses the commonly-used expressions directly and is conformance-tested
against the reference's ``English().date_from`` on every covered form
(tests/test_dateparse.py); uncovered expressions raise ValueError so
callers can fall back.

Covered: ``now`` · ``today/yesterday/tomorrow`` · numeric datetimes
``YYYY[MM[DD[hh[mm[ss[us]]]]]]`` · month-name forms ("march 2005",
"mar 29 2005", "29 march 2005", day ordinals) · 12-hour times
("3pm", "10:25am") · ``next/last <weekday>`` ·
``next/last week/month/year``.

A parse yields an inclusive (floor, ceil) datetime span exactly like
the reference's adatetime floor()/ceil() pair (e.g. "2005" spans
2005-01-01 00:00:00.000000 .. 2005-12-31 23:59:59.999999).
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

MONTHS = {
    name.lower(): i + 1
    for i, name in enumerate(calendar.month_name[1:])
}
MONTHS.update({name.lower(): i + 1
               for i, name in enumerate(calendar.month_abbr[1:])})
WEEKDAYS = {name.lower(): i for i, name in enumerate(calendar.day_name)}
WEEKDAYS.update({name.lower(): i
                 for i, name in enumerate(calendar.day_abbr)})

_ORD = re.compile(r"^(\d{1,2})(?:st|nd|rd|th)?$")
_NUMERIC = re.compile(r"^(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?"
                      r"(\d{2})?(\d{6})?$")
_TIME12 = re.compile(r"^(\d{1,2})(?::(\d{2}))?(?::(\d{2}))?\s*(am|pm)$")


def _span_year(y):
    return (datetime(y, 1, 1),
            datetime(y, 12, 31, 23, 59, 59, 999999))


def _span_month(y, m):
    last = calendar.monthrange(y, m)[1]
    return (datetime(y, m, 1),
            datetime(y, m, last, 23, 59, 59, 999999))


def _span_day(y, m, d):
    return (datetime(y, m, d),
            datetime(y, m, d, 23, 59, 59, 999999))


def date_from(text: str, basedate: datetime) -> tuple[datetime, datetime]:
    """Parse an English date expression into an inclusive (floor, ceil)
    span; a point in time yields floor == ceil.  Raises ValueError on
    expressions outside the covered subset."""
    t = text.strip().lower()
    if not t:
        raise ValueError("empty date expression")

    if t == "now":
        return basedate, basedate
    if t in ("today", "yesterday", "tomorrow"):
        delta = {"today": 0, "yesterday": -1, "tomorrow": 1}[t]
        d = basedate + timedelta(days=delta)
        return _span_day(d.year, d.month, d.day)

    m = _TIME12.match(t)
    if m:
        hh = int(m.group(1)) % 12 + (12 if m.group(4) == "pm" else 0)
        mm = m.group(2)
        ss = m.group(3)
        base = basedate.replace(hour=hh, minute=int(mm or 0),
                                second=int(ss or 0), microsecond=0)
        if ss is not None:
            return base, base.replace(microsecond=999999)
        if mm is not None:
            return base, base.replace(second=59, microsecond=999999)
        return base, base.replace(minute=59, second=59, microsecond=999999)

    m = _NUMERIC.match(t.replace(" ", ""))
    if m and t.replace(" ", "").isdigit():
        y = int(m.group(1))
        parts = [g for g in m.groups()[1:] if g is not None]
        if not parts:
            return _span_year(y)
        mo = int(parts[0])
        if len(parts) == 1:
            return _span_month(y, mo)
        d = int(parts[1])
        if len(parts) == 2:
            return _span_day(y, mo, d)
        hh = int(parts[2])
        if len(parts) == 3:
            return (datetime(y, mo, d, hh),
                    datetime(y, mo, d, hh, 59, 59, 999999))
        mi = int(parts[3])
        if len(parts) == 4:
            return (datetime(y, mo, d, hh, mi),
                    datetime(y, mo, d, hh, mi, 59, 999999))
        ss = int(parts[4])
        if len(parts) == 5:
            return (datetime(y, mo, d, hh, mi, ss),
                    datetime(y, mo, d, hh, mi, ss, 999999))
        us = int(parts[5])
        point = datetime(y, mo, d, hh, mi, ss, us)
        return point, point

    words = t.split()

    if len(words) == 2 and words[0] in ("next", "last"):
        unit = words[1]
        sign = 1 if words[0] == "next" else -1
        if unit in WEEKDAYS:
            wd = WEEKDAYS[unit]
            diff = (wd - basedate.weekday()) % 7
            if sign > 0:
                diff = diff or 7
                target = basedate + timedelta(days=diff)
            else:
                diff = (basedate.weekday() - wd) % 7
                diff = diff or 7
                target = basedate - timedelta(days=diff)
            return _span_day(target.year, target.month, target.day)
        if unit == "week":
            # reference semantics: the calendar week (mon..sun) +-1
            start = (basedate - timedelta(days=basedate.weekday())
                     + timedelta(weeks=sign))
            end = start + timedelta(days=6)
            return (datetime(start.year, start.month, start.day),
                    datetime(end.year, end.month, end.day,
                             23, 59, 59, 999999))
        if unit == "month":
            y, mo = basedate.year, basedate.month + sign
            if mo == 0:
                y, mo = y - 1, 12
            elif mo == 13:
                y, mo = y + 1, 1
            return _span_month(y, mo)
        if unit == "year":
            return _span_year(basedate.year + sign)
        raise ValueError(f"unsupported relative unit {unit!r}")

    # month-name forms
    month = None
    day = None
    year = None
    for w in words:
        if w in MONTHS and month is None:
            month = MONTHS[w]
            continue
        om = _ORD.match(w)
        if om and len(om.group(1)) <= 2 and day is None and int(om.group(1)) <= 31:
            day = int(om.group(1))
            continue
        if w.isdigit() and len(w) == 4 and year is None:
            year = int(w)
            continue
        raise ValueError(f"unrecognized date word {w!r} in {text!r}")
    if month is None:
        raise ValueError(f"no month in {text!r}")
    if year is None:
        year = basedate.year
    if day is None:
        return _span_month(year, month)
    return _span_day(year, month, day)
