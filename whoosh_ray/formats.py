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


# ---- module-level token helpers (reference formats.py:121-130) ----

def tokens(value, analyzer, kwargs: dict | None = None):
    """Token stream for a value: pre-tokenized lists go through
    ``entoken``; strings run through the analyzer (an
    :class:`~whoosh_ray.functions.analysis.AnalyzerSpec` here), with
    stopped tokens removed (the reference pipes through ``unstopped``;
    this engine's analyzers drop stopped tokens eagerly)."""
    from whoosh_ray.analysis import entoken, unstopped

    kwargs = kwargs or {}
    if isinstance(value, (tuple, list)):
        return unstopped(entoken(value, **kwargs))
    from whoosh_ray.analysis import Token
    from whoosh_ray.functions.analysis import VectorAnalyzer

    tb = VectorAnalyzer(analyzer)([value])

    def _gen():
        for i in range(len(tb.terms)):
            t = Token(str(tb.terms[i]), int(tb.positions[i]))
            if getattr(tb, "startchars", None) is not None:
                t.startchar = int(tb.startchars[i])
                t.endchar = int(tb.endchars[i])
            yield t

    return _gen()


def entoken(textstream, **kwargs):
    from whoosh_ray.analysis import entoken as _e

    return _e(textstream, **kwargs)


def unstopped(tokenstream):
    from whoosh_ray.analysis import unstopped as _u

    return _u(tokenstream)
