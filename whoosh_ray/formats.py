"""Drop-in formats surface (reference whoosh/formats.py names).

The engine stores postings columnar, so a "format" is not a pluggable
byte codec here — it is the set of per-posting payloads a FieldSpec
enables (positions / chars / token_boosts / vector columns).  The
reference class names are provided as markers:

- they are truthy, so reference code like ``TEXT(vector=Positions())``
  works unchanged (vector storage is enabled);
- ``fieldspec_kwargs()`` returns the FieldSpec.text flags that store
  the same payloads the reference format would
  (formats.py:121-481 word_values: Existence/Frequency -> weights
  only, Positions -> +positions, Characters -> +char spans,
  PositionBoosts -> +per-token boosts, CharacterBoosts -> both).
"""

from __future__ import annotations


class Format:
    """Marker base (reference formats.py:49-118)."""

    field_boost = 1.0

    def __init__(self, field_boost: float = 1.0, **options):
        self.field_boost = field_boost
        self.options = options

    def fieldspec_kwargs(self) -> dict:
        return {}

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.__dict__ == other.__dict__)

    def __repr__(self):
        return f"{type(self).__name__}(boost={self.field_boost})"


class Existence(Format):
    """Binary occurrence; weight 1 per doc (formats.py:121-139)."""


class Frequency(Format):
    """Term-frequency weights (formats.py:163-196)."""


class Positions(Format):
    """+ per-occurrence positions (formats.py:199-263)."""

    def fieldspec_kwargs(self) -> dict:
        return {"positions": True}


class Characters(Positions):
    """+ per-occurrence char spans (formats.py:266-335)."""

    def fieldspec_kwargs(self) -> dict:
        return {"positions": True, "chars": True}


class PositionBoosts(Positions):
    """+ per-occurrence boosts (formats.py:339-412)."""

    def fieldspec_kwargs(self) -> dict:
        return {"positions": True, "token_boosts": True}


class CharacterBoosts(Characters):
    """+ spans AND boosts (formats.py:415-481)."""

    def fieldspec_kwargs(self) -> dict:
        return {"positions": True, "chars": True, "token_boosts": True}
