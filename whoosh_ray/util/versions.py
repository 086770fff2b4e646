"""Version-string parsing (drop-in for reference util/versions.py).

``SimpleVersion`` parses the PEP-386-ish subset the reference accepts
(``1``, ``1.2c3``, ``10.7.5rc1``...) and compares as a tuple; the
``to_int``/``from_int`` packing mirrors the reference bit layout
(major 1 byte << 24, minor/release nibble-packed with the ex tag)."""

from __future__ import annotations

from whoosh_ray.util.text import rcompile


class BaseVersion:
    _parts: list
    _version_exp = None

    @classmethod
    def parse(cls, text: str):
        obj = cls()
        match = cls._version_exp.match(text)
        if match:
            groupdict = match.groupdict()
            for groupname, typ in cls._parts:
                v = groupdict.get(groupname)
                if v is not None:
                    setattr(obj, groupname, typ(v))
        return obj

    def __repr__(self):
        vs = ", ".join(repr(getattr(self, slot)) for slot in self.__slots__)
        return f"{self.__class__.__name__}({vs})"

    def tuple(self) -> tuple:
        return tuple(getattr(self, slot) for slot in self.__slots__)

    def _cmp_tuple(self, other):
        if not hasattr(other, "tuple"):
            raise ValueError(f"Can't compare {self!r} with {other!r}")
        return other.tuple()

    def __eq__(self, other):
        return self.tuple() == self._cmp_tuple(other)

    def __ne__(self, other):
        return self.tuple() != self._cmp_tuple(other)

    def __lt__(self, other):
        return self.tuple() < self._cmp_tuple(other)

    def __gt__(self, other):
        return self.tuple() > self._cmp_tuple(other)

    def __ge__(self, other):
        return self.tuple() >= self._cmp_tuple(other)

    def __le__(self, other):
        return self.tuple() <= self._cmp_tuple(other)


class SimpleVersion(BaseVersion):
    """Parses version numbers such as ``12.2.5b`` (reference
    versions.py:84-166)."""

    _version_exp = rcompile(r"""
    ^
    (?P<major>\d{1,4})
    (
        [.](?P<minor>\d{1,4})
        (
            [.](?P<release>\d{1,4})
        )?
        (
            (?P<ex>[abc]|rc)
            (?P<exnum>\d{1,4})?
        )?
    )?
    $
    """, verbose=True)

    _parts = [("major", int), ("minor", int), ("release", int),
              ("ex", str), ("exnum", int)]

    _ex_bits = {"a": 0, "b": 1, "c": 2, "rc": 10, "z": 15}
    _bits_ex = {v: k for k, v in _ex_bits.items()}

    __slots__ = ("major", "minor", "release", "ex", "exnum")

    def __init__(self, major: int = 1, minor: int = 0, release: int = 0,
                 ex: str = "z", exnum: int = 0):
        self.major = major
        self.minor = minor
        self.release = release
        self.ex = ex
        self.exnum = exnum

    def to_int(self) -> int:
        assert self.major < 1024
        n = self.major << 34
        assert self.minor < 1024
        n |= self.minor << 24
        assert self.release < 1024
        n |= self.release << 14
        exbits = self._ex_bits.get(self.ex, 15)
        n |= exbits << 10
        assert self.exnum < 1024
        n |= self.exnum
        return n

    @classmethod
    def from_int(cls, n: int) -> "SimpleVersion":
        major = (n & (1023 << 34)) >> 34
        minor = (n & (1023 << 24)) >> 24
        release = (n & (1023 << 14)) >> 14
        # reference quirk (versions.py:161): the ex mask is 3 bits, so
        # "rc" (10) and "z" (15) do NOT roundtrip — 10 & 7 reads back
        # as 2 = "c", 15 & 7 as 7 = "z"-by-default
        exbits = (n & (7 << 10)) >> 10
        ex = cls._bits_ex.get(exbits, "z")
        exnum = n & 1023
        return cls(major, minor, release, ex, exnum)
