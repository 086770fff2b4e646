"""Base-85 integer/bytes codecs over the reference's SORT-ORDERED
charset (support/base85.py:17-44 — the alphabet is arranged so encoded
text sorts like the numbers it encodes, unlike ascii85).

``to_base85``/``from_base85`` are value-identical to the reference.
The reference's ``b85encode``/``b85decode`` are Python-2-only (float
``/=`` indexing, ``str`` struct packing) and CRASH on py3 — no behavior
exists to match, so the bytes codecs here are working py3
implementations of the documented intent (4 bytes -> 5 chars,
big-endian, partial final group truncated).
"""

import struct

b85chars = ("!$%&*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ"
            "^_abcdefghijklmnopqrstuvwxyz{|}~")
b85dec = {c: i for i, c in enumerate(b85chars)}


def to_base85(x: int, islong: bool = False) -> str:
    """Fixed-width (5 or 10 char) base-85 encoding of an integer."""
    size = 10 if islong else 5
    out = []
    for _ in range(size):
        out.append(b85chars[x % 85])
        x //= 85
    return "".join(reversed(out))


def from_base85(text: str) -> int:
    acc = 0
    for c in text:
        acc = acc * 85 + b85dec[c]
    return acc


def b85encode(data: bytes, pad: bool = False) -> str:
    n = len(data)
    rem = n % 4
    if rem:
        data = data + b"\0" * (4 - rem)
    out = []
    for (word,) in struct.iter_unpack(">L", data):
        group = []
        for _ in range(5):
            group.append(b85chars[word % 85])
            word //= 85
        out.extend(reversed(group))
    enc = "".join(out)
    if pad or not rem:
        return enc
    return enc[: (n // 4) * 5 + rem + 1]


def b85decode(text: str) -> bytes:
    n = len(text)
    rem = n % 5
    if rem == 1:
        raise ValueError("invalid base85 length %d" % n)
    if rem:
        # pad with the HIGHEST char so truncated low digits round up,
        # then cut the synthesized bytes back off
        text = text + b85chars[-1] * (5 - rem)
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for j, c in enumerate(text[i:i + 5]):
            try:
                acc = acc * 85 + b85dec[c]
            except KeyError:
                raise TypeError("Bad base85 character at byte %d" % (i + j))
        if acc > 0xFFFFFFFF:
            raise OverflowError(
                "Base85 overflow in hunk starting at byte %d" % i)
        out += struct.pack(">L", acc)
    if rem:
        out = out[: -(5 - rem)]
    return bytes(out)
