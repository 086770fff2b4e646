"""Ambiguous-datetime utilities (drop-in for reference util/times.py).

``adatetime`` is a datetime whose units may be None (= unspecified);
``timespan`` is a start/end pair of them.  The dateparse DSL
(:mod:`whoosh_ray.search.dateparse`) keeps its own compact partials
internally; this module is the *user-facing* surface — DateRange
callers and dateparse consumers in reference code import these names
directly.  Semantics (validation bounds, floor/ceil fills, the
disambiguation heuristics, the ``fix`` ambiguity rule) follow reference
util/times.py:35-466 and are parity-tested against it in
tests/test_times_compat.py.
"""

from __future__ import annotations

import calendar
import copy
from datetime import date, datetime, timedelta

UNITS = ("year", "month", "day", "hour", "minute", "second", "microsecond")

#: value ranges enforced at construction (reference times.py:110-129);
#: day's upper bound also checks the month length when year+month known
_BOUNDS = {"month": (1, 12), "hour": (0, 23), "minute": (0, 59),
           "second": (0, 59), "microsecond": (0, 999999)}

#: (floor fill, ceil fill) per unit; None = computed (month length)
_FILLS = {"month": (1, 12), "day": (1, None), "hour": (0, 23),
          "minute": (0, 59), "second": (0, 59), "microsecond": (0, 999999)}


class TimeError(Exception):
    pass


def relative_days(current_wday: int, wday: int, dir: int) -> int:
    """Days (signed) to the next (dir=1) / last (dir=-1) ``wday``
    from ``current_wday`` (0=Monday); the same weekday is a full week
    away (reference times.py:39-61)."""
    if current_wday == wday:
        return 7 * dir
    if dir == 1:
        return (wday - current_wday) % 7
    return -((current_wday - wday) % 7)


def timedelta_to_usecs(td: timedelta) -> int:
    return (td.days * 86400 + td.seconds) * 1000000 + td.microseconds


def datetime_to_long(dt: datetime) -> int:
    """Microseconds since ``datetime.min`` (reference times.py:70-75)."""
    return timedelta_to_usecs(dt.replace(tzinfo=None) - dt.min)


def long_to_datetime(x: int) -> datetime:
    return datetime.min + timedelta(microseconds=x)


class adatetime:
    """A datetime whose units may be None (reference times.py:94-262)."""

    units = frozenset(UNITS)

    def __init__(self, year=None, month=None, day=None, hour=None,
                 minute=None, second=None, microsecond=None):
        if isinstance(year, datetime):
            for u in UNITS:
                setattr(self, u, getattr(year, u))
            return
        vals = dict(year=year, month=month, day=day, hour=hour,
                    minute=minute, second=second, microsecond=microsecond)
        for u, (lo, hi) in _BOUNDS.items():
            v = vals[u]
            if v is not None and not lo <= v <= hi:
                raise TimeError(f"{u} must be in {lo}..{hi}")
        if day is not None:
            if day < 1:
                raise TimeError("day must be greater than 1")
            if (year is not None and month is not None
                    and day > calendar.monthrange(year, month)[1]):
                raise TimeError("day is out of range for month")
        for u in UNITS:
            setattr(self, u, vals[u])

    def __eq__(self, other):
        if other.__class__ is not self.__class__:
            # an unambiguous adatetime equals its datetime fix
            if not is_ambiguous(self) and isinstance(other, datetime):
                return fix(self) == other
            return False
        return self.tuple() == other.tuple()

    def __hash__(self):
        return hash(self.tuple())

    def __repr__(self):
        return f"{self.__class__.__name__}{self.tuple()!r}"

    def tuple(self) -> tuple:
        return tuple(getattr(self, u) for u in UNITS)

    def date(self) -> date:
        return date(self.year, self.month, self.day)

    def copy(self) -> "adatetime":
        return adatetime(**{u: getattr(self, u) for u in UNITS})

    def replace(self, **kwargs) -> "adatetime":
        out = self.copy()
        for key, value in kwargs.items():
            if key not in self.units:
                raise KeyError(f"Unknown argument {key!r}")
            setattr(out, key, value)
        return out

    def _filled(self, which: int) -> datetime:
        if self.year is None:
            raise ValueError("Date has no year")
        vals = {"year": self.year}
        for u, fills in _FILLS.items():
            v = getattr(self, u)
            if v is None:
                v = fills[which]
                if v is None:  # ceil day = length of the (filled) month
                    v = calendar.monthrange(self.year, vals["month"])[1]
            vals[u] = v
        return datetime(**vals)

    def floor(self) -> datetime:
        """All unspecified units at their lowest values."""
        return self._filled(0)

    def ceil(self) -> datetime:
        """All unspecified units at their highest values."""
        return self._filled(1)

    def disambiguated(self, basedate: datetime):
        """datetime when fully specified, else the floor..ceil
        timespan disambiguated against ``basedate``."""
        if not is_ambiguous(self):
            return fix(self)
        return timespan(self, self).disambiguated(basedate)


class timespan:
    """A start/end pair of datetime/adatetime objects
    (reference times.py:264-383)."""

    def __init__(self, start, end):
        for p in (start, end):
            if not isinstance(p, (datetime, adatetime)):
                raise TimeError(f"{p!r} is not a datetime object")
        self.start = copy.copy(start)
        self.end = copy.copy(end)

    def __eq__(self, other):
        if other.__class__ is not self.__class__:
            return False
        return self.start == other.start and self.end == other.end

    def __repr__(self):
        return f"{self.__class__.__name__}({self.start!r}, {self.end!r})"

    def disambiguated(self, basedate: datetime, debug: int = 0):
        """Resolve both ends to concrete datetimes using the reference's
        heuristics (times.py:292-383): times-only spans take the
        basedate's date; a missing year copies across (start from end;
        end = max(start year, base year)); month/day copy end→start
        unless that inverts the times; out-of-order dates shift the
        side whose year was ambiguous (else swap); same-day inverted
        times push the end to the next day."""
        start, end = copy.copy(self.start), copy.copy(self.end)
        start_year_was_amb = start.year is None
        end_year_was_amb = end.year is None

        if has_no_date(start) and has_no_date(end):
            start = start.replace(year=basedate.year, month=basedate.month,
                                  day=basedate.day)
            end = end.replace(year=basedate.year, month=basedate.month,
                              day=basedate.day)
        else:
            if start.year is None and end.year is None:
                start.year = end.year = basedate.year
            elif start.year is None:
                start.year = end.year
            elif end.year is None:
                end.year = max(start.year, basedate.year)

        if start.year == end.year:
            start_dm = not (start.month is None and start.day is None)
            end_dm = not (end.month is None and end.day is None)
            if end_dm and not start_dm:
                if start.floor().time() > end.ceil().time():
                    start.month, start.day = basedate.month, basedate.day
                else:
                    start.month, start.day = end.month, end.day
            elif start_dm and not end_dm:
                end.month, end.day = basedate.month, basedate.day

        if floor(start).date() > ceil(end).date():
            if start_year_was_amb:
                start.year = end.year - 1
            elif end_year_was_amb:
                end.year = start.year + 1
            else:
                start, end = end, start

        start = floor(start)
        end = ceil(end)

        if start.date() == end.date() and start.time() > end.time():
            end += timedelta(days=1)

        return timespan(start, end)


def floor(at):
    return at if isinstance(at, datetime) else at.floor()


def ceil(at):
    return at if isinstance(at, datetime) else at.ceil()


def fill_in(at, basedate: datetime, units=adatetime.units):
    """Copy of ``at`` with unspecified units taken from ``basedate``
    (reference times.py:398-412)."""
    if isinstance(at, datetime):
        return at
    args = {u: (getattr(at, u) if getattr(at, u) is not None
                else getattr(basedate, u))
            for u in units}
    return fix(adatetime(**args))


def has_no_date(at) -> bool:
    if isinstance(at, datetime):
        return False
    return at.year is None and at.month is None and at.day is None


def has_no_time(at) -> bool:
    if isinstance(at, datetime):
        return False
    return all(getattr(at, u) is None
               for u in ("hour", "minute", "second", "microsecond"))


def is_ambiguous(at) -> bool:
    if isinstance(at, datetime):
        return False
    return any(getattr(at, u) is None for u in UNITS)


def is_void(at) -> bool:
    if isinstance(at, datetime):
        return False
    return all(getattr(at, u) is None for u in UNITS)


def fix(at):
    """Unambiguous adatetime → datetime; anything else unchanged."""
    if is_ambiguous(at) or isinstance(at, datetime):
        return at
    return datetime(*at.tuple())
