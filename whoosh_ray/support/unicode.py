"""Unicode block lookups and 5.1-era character classes (reference
support/unicode.py:214-527).  Data lives in the generated
``_unicode_data`` module (see scripts/gen_unicode_data.py for
provenance); lookups are bisect over the range starts, with the same
None-for-gap semantics as the reference.

The engine's own tokenizers classify characters with the interpreter's
``unicodedata`` (documented divergence — newer UCD); these tables exist
for user code that imported the reference's pinned 5.1 sets.
"""

from bisect import bisect_right

from whoosh_ray.support._unicode_data import (  # noqa: F401
    BLOCK_ENDS as _ends,
    BLOCK_NAMES as _names,
    BLOCK_STARTS as _starts,
    digits,
    lowercase,
    uppercase,
)


class blocks:
    """Block-name -> block-number constants (spaces become
    underscores): ``blocks.Basic_Latin == 0``."""


for _i, _name in enumerate(_names):
    setattr(blocks, _name.replace(" ", "_"), _i)
del _i, _name


def blockname(ch: str) -> str | None:
    """The Unicode block name containing ``ch``, or None for
    unassigned gaps."""
    assert isinstance(ch, str) and len(ch) == 1, repr(ch)
    cp = ord(ch)
    i = bisect_right(_starts, cp) - 1
    if cp > _ends[i]:
        return None
    return _names[i]


def blocknum(ch: str) -> int | None:
    """The Unicode block number containing ``ch``, or None for
    unassigned gaps."""
    cp = ord(ch)
    i = bisect_right(_starts, cp) - 1
    if cp > _ends[i]:
        return None
    return i
