"""English date-expression parsing — full-grammar coverage of the
reference's dateparse DSL (qparser/dateparse.py: the English parser's
simple / time12 / time24 / dmy / plusdate / dayname / bundle / torange
elements and the adatetime/timespan disambiguation rules from
util/times.py:179-400), rebuilt as a compact regex-driven parser
instead of the combinator machinery.  Conformance-tested against the
reference's ``English().date_from`` per covered form
(tests/test_dateparse.py).

A parse yields an inclusive (floor, ceil) datetime span exactly like
the reference's adatetime floor()/ceil() pair (e.g. "2005" spans
2005-01-01 00:00:00.000000 .. 2005-12-31 23:59:59.999999); a point in
time yields floor == ceil.  Expressions the reference grammar rejects
raise ValueError — except the documented extensions ``next/last
week|month|year`` (the reference returns None for these; see
CLAUDE.md quirks ledger).
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

try:
    from dateutil.relativedelta import relativedelta
except ImportError:  # pragma: no cover
    relativedelta = None

MONTHS = {
    name.lower(): i + 1
    for i, name in enumerate(calendar.month_name[1:])
}
MONTHS.update({name.lower(): i + 1
               for i, name in enumerate(calendar.month_abbr[1:])})
WEEKDAYS = {name.lower(): i for i, name in enumerate(calendar.day_name)}
WEEKDAYS.update({name.lower(): i
                 for i, name in enumerate(calendar.day_abbr)})

_UNITS = ("year", "month", "day", "hour", "minute", "second", "microsecond")


class P:
    """Partial datetime (the reference's adatetime): None = unspecified."""

    __slots__ = _UNITS

    def __init__(self, **kw):
        for u in _UNITS:
            setattr(self, u, kw.get(u))

    def copy(self) -> "P":
        return P(**{u: getattr(self, u) for u in _UNITS})

    def merge(self, other: "P") -> "P":
        out = self.copy()
        for u in _UNITS:
            v = getattr(other, u)
            if v is not None:
                setattr(out, u, v)
        return out

    def is_full(self) -> bool:
        return all(getattr(self, u) is not None for u in _UNITS)

    def has_no_date(self) -> bool:
        return self.year is None and self.month is None and self.day is None

    def floor(self) -> datetime:
        y, m, d, h, mi, s, us = (getattr(self, u) for u in _UNITS)
        return datetime(y, m if m is not None else 1,
                        d if d is not None else 1,
                        h if h is not None else 0,
                        mi if mi is not None else 0,
                        s if s is not None else 0,
                        us if us is not None else 0)

    def ceil(self) -> datetime:
        y, m, d, h, mi, s, us = (getattr(self, u) for u in _UNITS)
        m = m if m is not None else 12
        return datetime(y, m,
                        d if d is not None else calendar.monthrange(y, m)[1],
                        h if h is not None else 23,
                        mi if mi is not None else 59,
                        s if s is not None else 59,
                        us if us is not None else 999999)


def _from_dt(dt: datetime) -> P:
    return P(year=dt.year, month=dt.month, day=dt.day, hour=dt.hour,
             minute=dt.minute, second=dt.second, microsecond=dt.microsecond)


class Span:
    def __init__(self, start, end):
        self.start = start  # P or datetime
        self.end = end


class _NoMatch(Exception):
    pass


def _rx(p):
    return re.compile(p, re.IGNORECASE)


_SEP = _rx(r"(\s+|\s*,\s*)")

# element regexes — the same token grammar as the reference's English
# parser (dateparse.py:581-723); the patterns are grammar data, the
# parsing machinery below is original
_DAY = _rx(r"(?P<day>([123][0-9])|[1-9])(st|nd|rd|th)?(?=(\W|$))")
_YEAR = _rx(r"(?P<year>[0-9]{4})(?=(\W|$))")
_TIME24 = _rx(r"(?P<hour>([0-1][0-9])|(2[0-3])):(?P<mins>[0-5][0-9])"
              r"(:(?P<secs>[0-5][0-9])(\.(?P<usecs>[0-9]{1,5}))?)?"
              r"(?=(\W|$))")
_TIME12 = _rx(r"(?P<hour>[1-9]|10|11|12)(:(?P<mins>[0-5][0-9])"
              r"(:(?P<secs>[0-5][0-9])(\.(?P<usecs>[0-9]{1,5}))?)?)?"
              r"\s*(?P<ampm>am|pm)(?=(\W|$))")
_MONTH_PATS = ("january|jan", "february|febuary|feb", "march|mar",
               "april|apr", "may", "june|jun", "july|jul", "august|aug",
               "september|sept|sep", "october|oct", "november|nov",
               "december|dec")
_MONTH = _rx("(?P<month>" + "|".join(f"({p})" for p in _MONTH_PATS)
             + r")(?=(\W|$))")
_MONTH_EXPRS = [_rx(p) for p in _MONTH_PATS]
_DAYNAME_PATS = ("monday|mon|mo", "tuesday|tues|tue|tu", "wednesday|wed|we",
                 "thursday|thur|thu|th", "friday|fri|fr", "saturday|sat|sa",
                 "sunday|sun|su")
_DAYNAME = _rx(r"(?P<dir>next|last) +(?P<day>"
               + "|".join(_DAYNAME_PATS) + r")(?=(\W|$))")
_DAYNAME_EXPRS = [_rx(p) for p in _DAYNAME_PATS]
_PLUS_UNITS = ("years|year|yrs|yr|ys|y", "months|month|mons|mon|mos|mo",
               "weeks|week|wks|wk|ws|w", "days|day|dys|dy|ds|d",
               "hours|hour|hrs|hr|hs|h", "minutes|minute|mins|min|ms|m",
               "seconds|second|secs|sec|s")
_PLUS = _rx(r"(?P<dir>[+-]) *"
            + r" *".join(f"((?P<{g}>[0-9]+) *({p}))?"
                         for g, p in zip(("years", "months", "weeks", "days",
                                          "hours", "mins", "secs"),
                                         _PLUS_UNITS))
            + r"(?=(\W|$))")
_SIMPLE = _rx(r"(?P<year>[0-9]{4})([- .:/]*(?P<month>[0-1][0-9])"
              r"([- .:/]*(?P<day>[0-3][0-9])"
              r"([- .:/]*(?P<hour>([0-1][0-9])|(2[0-3]))"
              r"([- .:/]*(?P<minute>[0-5][0-9])"
              r"([- .:/]*(?P<second>[0-5][0-9])"
              r"([- .:/]*(?P<microsecond>[0-9]{6}))?)?)?)?)?)?(?=(\s|$))")
_TO = _rx(r"to(?=(\W|$))")


def _ig(m, name):
    v = m.group(name)
    return int(v) if v is not None else None


# ---- element parsers: (text, pos, basedate) -> (value, newpos) | None

def _p_time(text, pos, dt):
    m = _TIME12.match(text, pos)
    if m:
        hh = int(m.group("hour"))
        if m.group("ampm").lower().startswith("a"):
            hh = 0 if hh == 12 else hh
        else:
            hh = hh if hh == 12 else hh + 12
        return (P(hour=hh, minute=_ig(m, "mins"), second=_ig(m, "secs"),
                  microsecond=_ig(m, "usecs")), m.end())
    m = _TIME24.match(text, pos)
    if m:
        return (P(hour=_ig(m, "hour"), minute=_ig(m, "mins"),
                  second=_ig(m, "secs"), microsecond=_ig(m, "usecs")),
                m.end())
    for lit, val in (("midnight", P(hour=0, minute=0, second=0,
                                    microsecond=0)),
                     ("noon", P(hour=12, minute=0, second=0,
                                microsecond=0))):
        if text.startswith(lit, pos):
            return val.copy(), pos + len(lit)
    if text.startswith("now", pos):
        return dt, pos + 3
    return None


def _p_month(text, pos, dt):
    m = _MONTH.match(text, pos)
    if not m:
        return None
    word = m.group("month")
    for i, expr in enumerate(_MONTH_EXPRS):
        if expr.match(word):
            return P(month=i + 1), m.end()
    return None


def _p_day(text, pos, dt):
    m = _DAY.match(text, pos)
    if m:
        return P(day=int(m.group("day"))), m.end()
    return None


def _p_year(text, pos, dt):
    m = _YEAR.match(text, pos)
    if m:
        return P(year=int(m.group("year"))), m.end()
    return None


def _p_dayname(text, pos, dt):
    m = _DAYNAME.match(text, pos)
    if not m:
        return None
    sign = -1 if m.group("dir").lower() == "last" else 1
    word = m.group("day")
    for daynum, expr in enumerate(_DAYNAME_EXPRS):
        if expr.match(word):
            break
    cur = dt.weekday()
    if cur == daynum:
        delta = 7 * sign
    elif sign == 1:
        delta = (daynum + 7 - cur) % 7
    else:
        delta = -((cur + 7 - daynum) % 7)
    d = dt.date() + timedelta(days=delta)
    return P(year=d.year, month=d.month, day=d.day), m.end()


def _lit_date(text, pos, dt):
    """today / tomorrow / yesterday / this year / this month / now."""
    for lit, fn in (
        ("tomorrow", lambda: _date_p(dt.date() + timedelta(days=1))),
        ("yesterday", lambda: _date_p(dt.date() + timedelta(days=-1))),
        ("this year", lambda: P(year=dt.year)),
        ("this month", lambda: P(year=dt.year, month=dt.month)),
        ("today", lambda: _date_p(dt.date())),
    ):
        if text.startswith(lit, pos):
            return fn(), pos + len(lit)
    if text.startswith("now", pos):
        return dt, pos + 3
    return None


def _date_p(d):
    return P(year=d.year, month=d.month, day=d.day)


def _seq(parsers):
    """Ordered sequence with the grammar's separator; merges partials."""

    def run(text, pos, dt):
        out = P()
        first = True
        for p in parsers:
            p2 = pos
            if not first:
                m = _SEP.match(text, pos)
                if not m:
                    return None
                p2 = m.end()
            r = p(text, p2, dt)
            if r is None:
                return None
            val, pos = r
            if isinstance(val, datetime):
                val = _from_dt(val)
            out = out.merge(val)
            first = False
        return out, pos

    return run


_DMY_CHOICES = [
    _seq([_p_day, _p_month, _p_year]),
    _seq([_p_month, _p_day, _p_year]),
    _seq([_p_year, _p_month, _p_day]),
    _seq([_p_year, _p_day, _p_month]),
    _seq([_p_day, _p_month]),
    _seq([_p_month, _p_day]),
    _seq([_p_month, _p_year]),
    _p_month,
    _p_year,
    _p_dayname,
    _lit_date,
]


def _p_dmy(text, pos, dt):
    for p in _DMY_CHOICES:
        r = p(text, pos, dt)
        if r is not None:
            return r
    return None


def _p_bag(text, pos, dt):
    """Bag((time, dmy)): any order, each at most once."""
    out = P()
    got = seen_time = seen_date = False
    exact = None
    first = True
    while True:
        p2 = pos
        if not first:
            m = _SEP.match(text, pos)
            if not m:
                break
            p2 = m.end()
        r = None
        if not seen_time:
            r = _p_time(text, p2, dt)
            if r is not None:
                seen_time = True
        if r is None and not seen_date:
            r = _p_dmy(text, p2, dt)
            if r is not None:
                seen_date = True
        if r is None:
            break
        val, pos = r
        if isinstance(val, datetime):
            exact = val
        else:
            out = out.merge(val)
        got = True
        first = False
    if not got:
        return None
    if exact is not None:
        if seen_time and seen_date:
            out = _from_dt(exact).merge(out)
        else:
            return exact, pos
    return out, pos


def _p_plusdate(text, pos, dt):
    m = _PLUS.match(text, pos)
    if not m or relativedelta is None:
        return None
    if not any(m.group(g) for g in ("years", "months", "weeks", "days",
                                    "hours", "mins", "secs")):
        return None
    sign = -1 if m.group("dir") == "-" else 1
    delta = relativedelta(
        years=(_ig(m, "years") or 0) * sign,
        months=(_ig(m, "months") or 0) * sign,
        weeks=(_ig(m, "weeks") or 0) * sign,
        days=(_ig(m, "days") or 0) * sign,
        hours=(_ig(m, "hours") or 0) * sign,
        minutes=(_ig(m, "mins") or 0) * sign,
        seconds=(_ig(m, "secs") or 0) * sign)
    return dt + delta, m.end()


def _p_simple(text, pos, dt):
    m = _SIMPLE.match(text, pos)
    if not m:
        return None
    return (P(**{u: _ig(m, u) for u in _UNITS}), m.end())


def _p_bundle(text, pos, dt):
    for p in (_p_plusdate, _p_bag, _p_simple):
        r = p(text, pos, dt)
        if r is not None:
            return r
    return None


def _p_torange(text, pos, dt):
    r = _p_bundle(text, pos, dt)
    if r is None:
        return None
    left, pos = r
    m = _SEP.match(text, pos)
    if not m:
        return None
    m2 = _TO.match(text, m.end())
    if not m2:
        return None
    m3 = _SEP.match(text, m2.end())
    if not m3:
        return None
    r2 = _p_bundle(text, m3.end(), dt)
    if r2 is None:
        return None
    right, pos = r2
    return Span(left, right), pos


# ---- disambiguation (util/times.py:241-400 semantics) ----

def _floor(x):
    return x if isinstance(x, datetime) else x.floor()


def _ceil(x):
    return x if isinstance(x, datetime) else x.ceil()


def _span_disambiguate(span: Span, basedate: datetime):
    start = span.start if isinstance(span.start, datetime) \
        else span.start.copy()
    end = span.end if isinstance(span.end, datetime) else span.end.copy()
    start_year_amb = not isinstance(start, datetime) and start.year is None
    end_year_amb = not isinstance(end, datetime) and end.year is None

    def _hnd(x):
        return not isinstance(x, datetime) and x.has_no_date()

    if _hnd(start) and _hnd(end):
        for x in (start, end):
            x.year, x.month, x.day = (basedate.year, basedate.month,
                                      basedate.day)
    else:
        if start_year_amb and end_year_amb:
            start.year = end.year = basedate.year
        elif start_year_amb:
            start.year = end.year if isinstance(end, datetime) else end.year
        elif end_year_amb:
            end.year = max(start.year, basedate.year)

    sy = start.year
    ey = end.year
    if sy == ey:
        def _dm(x):
            if isinstance(x, datetime):
                return True
            return not (x.month is None and x.day is None)

        start_dm, end_dm = _dm(start), _dm(end)
        if end_dm and not start_dm:
            if _floor(start).time() > _ceil(end).time():
                start.month, start.day = basedate.month, basedate.day
            else:
                start.month = (end.month if isinstance(end, datetime)
                               else end.month)
                start.day = end.day if isinstance(end, datetime) else end.day
        elif start_dm and not end_dm:
            end.month, end.day = basedate.month, basedate.day

    if _floor(start).date() > _ceil(end).date():
        if start_year_amb:
            start.year = end.year - 1
        elif end_year_amb:
            end.year = start.year + 1
        else:
            start, end = end, start

    lo, hi = _floor(start), _ceil(end)
    if lo.date() == hi.date() and lo.time() > hi.time():
        hi += timedelta(days=1)
    return lo, hi


def _disambiguate(value, basedate: datetime):
    if isinstance(value, datetime):
        return value, value
    if isinstance(value, Span):
        return _span_disambiguate(value, basedate)
    if value.is_full():
        dt = value.floor()
        return dt, dt
    return _span_disambiguate(Span(value, value.copy()), basedate)


# ---- documented extensions beyond the reference grammar ----

def _extension(t: str, basedate: datetime):
    words = t.split()
    if len(words) == 2 and words[0] in ("next", "last"):
        sign = 1 if words[0] == "next" else -1
        unit = words[1]
        if unit == "week":
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
            last = calendar.monthrange(y, mo)[1]
            return (datetime(y, mo, 1),
                    datetime(y, mo, last, 23, 59, 59, 999999))
        if unit == "year":
            y = basedate.year + sign
            return (datetime(y, 1, 1),
                    datetime(y, 12, 31, 23, 59, 59, 999999))
    return None


def date_from(text: str, basedate: datetime) -> tuple[datetime, datetime]:
    """Parse an English date expression into an inclusive (floor, ceil)
    span; a point in time yields floor == ceil.  Raises ValueError on
    expressions the grammar rejects."""
    t = text.strip().lower()
    if not t:
        raise ValueError("empty date expression")

    for parser in (_p_torange, _p_bundle):
        r = parser(t, 0, basedate)
        if r is None:
            continue
        value, pos = r
        if t[pos:].strip():
            continue  # must consume to end (the reference's ToEnd)
        try:
            return _disambiguate(value, basedate)
        except ValueError:
            # invalid concrete values (day 32, month 13, ...) — the
            # reference returns None for these
            break

    ext = _extension(t, basedate)
    if ext is not None:
        return ext
    raise ValueError(f"unparseable date expression {text!r}")
