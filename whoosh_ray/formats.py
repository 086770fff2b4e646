"""Drop-in formats surface (reference whoosh/formats.py names).

The engine stores postings columnar, so a "format" is not the storage
codec here — it is the set of per-posting payloads a FieldSpec enables
(positions / chars / token_boosts / vector columns), with
``fieldspec_kwargs()`` mapping each class to the FieldSpec.text flags
that store the same payloads (formats.py:121-481 word_values:
Existence/Frequency -> weights only, Positions -> +positions,
Characters -> +char spans, PositionBoosts -> +per-token boosts,
CharacterBoosts -> both).

The classes are also REAL value codecs: ``word_values`` /
``encode`` / ``decode_*`` / ``combine`` produce byte-identical posting
value strings to the reference (pack_uint/pack_float headers +
pickle-protocol-2 delta codes), so ported code that round-trips
valuestrings — and the compat :class:`~whoosh_ray.matching.ListMatcher`
``value_as``/``spans`` path — behaves identically.  Reference quirks
carried on purpose:

- ``decode_*`` appends ``b"."`` when missing (truncated fixed-size
  reads still unpickle);
- ``Frequency.combine`` crashes (reference calls the nonexistent
  ``self.decode_value``, formats.py:205 — AttributeError);
- ``Characters.combine``/``CharacterBoosts.combine`` crash on a
  duplicate position (reference evaluates ``pos[s]``,
  formats.py:330/472 — TypeError);
- ``CharacterBoosts.word_values`` yields the summed boost WITHOUT the
  field_boost multiplier (formats.py:425), while its ``encode`` folds
  field_boost into the stored summed boost — so ``decode_weight``
  (inherited from PositionBoosts) double-applies it.
"""

from __future__ import annotations

import pickle

from whoosh_ray.system import (_FLOAT_SIZE, _INT_SIZE, emptybytes,
                               pack_float, pack_uint, unpack_float,
                               unpack_uint)


def dumps(obj) -> bytes:
    """Reference compat.dumps: pickle protocol 2."""
    return pickle.dumps(obj, 2)


def loads(data: bytes):
    return pickle.loads(data)


def _terminated(valuestring: bytes) -> bytes:
    # reference decode_* re-appends the pickle STOP byte when a
    # fixed-size read truncated it (formats.py:240-242)
    if not valuestring.endswith(b"."):
        valuestring += b"."
    return valuestring


class Format:
    """Marker base + value-codec protocol (reference formats.py:49-118)."""

    posting_size = -1
    textual = True
    field_boost = 1.0

    def __init__(self, field_boost: float = 1.0, **options):
        self.field_boost = field_boost
        self.options = options

    def fieldspec_kwargs(self) -> dict:
        return {}

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.__dict__ == other.__dict__)

    __hash__ = None  # reference Format defines __eq__ only

    def __repr__(self):
        return f"{type(self).__name__}(boost={self.field_boost})"

    def fixed_value_size(self) -> int | None:
        if self.posting_size < 0:
            return None
        return self.posting_size

    def word_values(self, value, analyzer, **kwargs):
        """("tokentext", frequency, weight, valuestring) tuples for one
        field value (reference formats.py:79-94)."""
        raise NotImplementedError

    def supports(self, name: str) -> bool:
        return hasattr(self, "decode_" + name)

    def decoder(self, name: str):
        return getattr(self, "decode_" + name)

    def decode_as(self, astype: str, valuestring: bytes):
        return self.decoder(astype)(valuestring)


class Existence(Format):
    """Binary occurrence; weight 1 per doc (formats.py:121-160)."""

    posting_size = 0

    def word_values(self, value, analyzer, **kwargs):
        fb = self.field_boost
        wordset = set(t.text for t in tokens(value, analyzer, kwargs))
        return ((w, 1, fb, emptybytes) for w in wordset)

    def encode(self, value) -> bytes:
        return emptybytes

    def decode_frequency(self, valuestring) -> int:
        return 1

    def decode_weight(self, valuestring) -> float:
        return self.field_boost

    def combine(self, vs) -> bytes:
        return emptybytes


class Frequency(Format):
    """Term-frequency weights (formats.py:163-206): value = pack_uint(freq)."""

    posting_size = _INT_SIZE

    def __init__(self, field_boost: float = 1.0, boost_as_freq: bool = False,
                 **options):
        # the reference asserts a float boost here (formats.py:178)
        # and accepts-but-ignores boost_as_freq
        assert isinstance(field_boost, float)
        self.field_boost = field_boost
        self.options = options

    def word_values(self, value, analyzer, **kwargs):
        fb = self.field_boost
        freqs: dict[str, int] = {}
        weights: dict[str, float] = {}
        kwargs["boosts"] = True
        for t in tokens(value, analyzer, kwargs):
            freqs[t.text] = freqs.get(t.text, 0) + 1
            weights[t.text] = weights.get(t.text, 0.0) + t.boost
        return ((w, freq, weights[w] * fb, pack_uint(freq))
                for w, freq in freqs.items())

    # NOTE: the reference Frequency defines no encode() — values are
    # packed inline in word_values (formats.py:163-206)

    def decode_frequency(self, valuestring) -> int:
        return unpack_uint(valuestring)[0]

    def decode_weight(self, valuestring) -> float:
        return unpack_uint(valuestring)[0] * self.field_boost

    def combine(self, vs):
        # the reference calls the nonexistent self.decode_value
        # (formats.py:205) — broken as shipped, crash parity
        raise AttributeError(
            f"{type(self).__name__!r} object has no attribute "
            f"'decode_value'")


class Positions(Format):
    """+ per-occurrence positions (formats.py:209-263): value =
    pack_uint(n) + pickle2 of position deltas."""

    def fieldspec_kwargs(self) -> dict:
        return {"positions": True}

    def word_values(self, value, analyzer, **kwargs):
        fb = self.field_boost
        poses: dict[str, list[int]] = {}
        weights: dict[str, float] = {}
        kwargs["positions"] = True
        kwargs["boosts"] = True
        for t in tokens(value, analyzer, kwargs):
            poses.setdefault(t.text, []).append(t.pos)
            weights[t.text] = weights.get(t.text, 0.0) + t.boost
        for w, poslist in poses.items():
            yield (w, len(poslist), weights[w] * fb, self.encode(poslist))

    def encode(self, poslist) -> bytes:
        deltas = []
        base = 0
        for pos in poslist:
            deltas.append(pos - base)
            base = pos
        return pack_uint(len(deltas)) + dumps(deltas)

    def decode_positions(self, valuestring) -> list[int]:
        codes = loads(_terminated(valuestring)[_INT_SIZE:])
        position = 0
        positions = []
        for code in codes:
            position += code
            positions.append(position)
        return positions

    def decode_frequency(self, valuestring) -> int:
        return unpack_uint(valuestring[:_INT_SIZE])[0]

    def decode_weight(self, valuestring) -> float:
        return self.decode_frequency(valuestring) * self.field_boost

    def decode_position_boosts(self, valuestring):
        return [(pos, 1) for pos in self.decode_positions(valuestring)]

    def combine(self, vs) -> bytes:
        s: set[int] = set()
        for v in vs:
            s.update(self.decode_positions(v))
        return self.encode(sorted(s))


class Characters(Positions):
    """+ per-occurrence char spans (formats.py:266-336): codes are
    (pos delta, startchar − prev endchar, span length)."""

    def fieldspec_kwargs(self) -> dict:
        return {"positions": True, "chars": True}

    def word_values(self, value, analyzer, **kwargs):
        fb = self.field_boost
        seen: dict[str, list] = {}
        weights: dict[str, float] = {}
        kwargs["positions"] = True
        kwargs["chars"] = True
        kwargs["boosts"] = True
        for t in tokens(value, analyzer, kwargs):
            seen.setdefault(t.text, []).append((t.pos, t.startchar,
                                                t.endchar))
            weights[t.text] = weights.get(t.text, 0.0) + t.boost
        for w, poslist in seen.items():
            yield (w, len(poslist), weights[w] * fb, self.encode(poslist))

    def encode(self, poslist) -> bytes:
        deltas = []
        posbase = 0
        charbase = 0
        for pos, startchar, endchar in poslist:
            deltas.append((pos - posbase, startchar - charbase,
                           endchar - startchar))
            posbase = pos
            charbase = endchar
        return pack_uint(len(deltas)) + dumps(deltas)

    def decode_characters(self, valuestring):
        codes = loads(_terminated(valuestring)[_INT_SIZE:])
        position = 0
        endchar = 0
        posns_chars = []
        for code in codes:
            position = code[0] + position
            startchar = code[1] + endchar
            endchar = code[2] + startchar
            posns_chars.append((position, startchar, endchar))
        return posns_chars

    def decode_positions(self, valuestring) -> list[int]:
        codes = loads(_terminated(valuestring)[_INT_SIZE:])
        position = 0
        posns = []
        for code in codes:
            position = code[0] + position
            posns.append(position)
        return posns

    def combine(self, vs) -> bytes:
        s: dict[int, tuple] = {}
        for v in vs:
            for pos, sc, ec in self.decode_characters(v):
                if pos in s:
                    # the reference evaluates pos[s] here
                    # (formats.py:330) — TypeError, crash parity
                    raise TypeError("'int' object is not subscriptable")
                s[pos] = (sc, ec)
        poses = [(pos, s[pos][0], s[pos][1]) for pos in sorted(s.keys())]
        return self.encode(poses)


class PositionBoosts(Positions):
    """+ per-occurrence boosts (formats.py:339-404): value =
    pack_uint(n) + pack_float(summed boost) + pickle2 of
    (pos delta, boost) codes."""

    def fieldspec_kwargs(self) -> dict:
        return {"positions": True, "token_boosts": True}

    def word_values(self, value, analyzer, **kwargs):
        fb = self.field_boost
        seen: dict[str, list] = {}
        kwargs["positions"] = True
        kwargs["boosts"] = True
        for t in tokens(value, analyzer, kwargs):
            seen.setdefault(t.text, []).append((t.pos, t.boost))
        for w, poses in seen.items():
            yield (w, len(poses), sum(p[1] for p in poses) * fb,
                   self.encode(poses))

    def encode(self, poses) -> bytes:
        codes = []
        base = 0
        summedboost = 0
        for pos, boost in poses:
            summedboost += boost
            codes.append((pos - base, boost))
            base = pos
        return (pack_uint(len(poses)) + pack_float(summedboost)
                + dumps(codes))

    def decode_position_boosts(self, valuestring):
        codes = loads(_terminated(valuestring)[_INT_SIZE + _FLOAT_SIZE:])
        position = 0
        posns_boosts = []
        for code in codes:
            position = code[0] + position
            posns_boosts.append((position, code[1]))
        return posns_boosts

    def decode_positions(self, valuestring) -> list[int]:
        codes = loads(_terminated(valuestring)[_INT_SIZE + _FLOAT_SIZE:])
        position = 0
        posns = []
        for code in codes:
            position = code[0] + position
            posns.append(position)
        return posns

    def decode_weight(self, v) -> float:
        summedboost = unpack_float(v[_INT_SIZE:_INT_SIZE + _FLOAT_SIZE])[0]
        return summedboost * self.field_boost

    def combine(self, vs) -> bytes:
        s: dict[int, float] = {}
        for v in vs:
            for pos, boost in self.decode_position_boosts(v):
                s[pos] = s.get(pos, 0.0) + boost
        return self.encode(sorted(s.items()))


class CharacterBoosts(Characters):
    """+ spans AND boosts (formats.py:407-481): codes are (pos delta,
    char gap, span length, boost); the stored summed boost folds in
    field_boost while word_values' weight does NOT (reference quirk)."""

    def fieldspec_kwargs(self) -> dict:
        return {"positions": True, "chars": True, "token_boosts": True}

    def word_values(self, value, analyzer, **kwargs):
        seen: dict[str, list] = {}
        kwargs["positions"] = True
        kwargs["chars"] = True
        kwargs["boosts"] = True
        for t in tokens(value, analyzer, kwargs):
            seen.setdefault(t.text, []).append((t.pos, t.startchar,
                                                t.endchar, t.boost))
        for w, poses in seen.items():
            value, summedboost = self.encode(poses)
            # reference yields the UNSCALED summed boost (formats.py:425)
            yield (w, len(poses), summedboost, value)

    def encode(self, poses):
        fb = self.field_boost
        codes = []
        posbase = 0
        charbase = 0
        summedboost = 0
        for pos, startchar, endchar, boost in poses:
            codes.append((pos - posbase, startchar - charbase,
                          endchar - startchar, boost))
            posbase = pos
            charbase = endchar
            summedboost += boost
        return (pack_uint(len(poses)) + pack_float(summedboost * fb)
                + dumps(codes)), summedboost

    def decode_character_boosts(self, valuestring):
        codes = loads(_terminated(valuestring)[_INT_SIZE + _FLOAT_SIZE:])
        position = 0
        endchar = 0
        posn_char_boosts = []
        for code in codes:
            position = position + code[0]
            startchar = endchar + code[1]
            endchar = startchar + code[2]
            posn_char_boosts.append((position, startchar, endchar,
                                     code[3]))
        return posn_char_boosts

    def decode_positions(self, valuestring) -> list[int]:
        return [item[0]
                for item in self.decode_character_boosts(valuestring)]

    def decode_characters(self, valuestring):
        return [(pos, startchar, endchar) for pos, startchar, endchar, _
                in self.decode_character_boosts(valuestring)]

    def decode_position_boosts(self, valuestring):
        return [(pos, boost) for pos, _, _, boost
                in self.decode_character_boosts(valuestring)]

    # decode_weight inherits from Positions (count word × field_boost)
    # — the reference does NOT read the stored summed boost here,
    # unlike PositionBoosts (formats.py:407-481 defines no override)

    def combine(self, vs) -> bytes:
        s: dict[int, tuple] = {}
        for v in vs:
            for pos, sc, ec, boost in self.decode_character_boosts(v):
                if pos in s:
                    # reference formats.py:472 evaluates pos[s] —
                    # TypeError, crash parity
                    raise TypeError("'int' object is not subscriptable")
                s[pos] = (sc, ec, boost)
        poses = [(pos, sc, ec, boost) for pos, (sc, ec, boost)
                 in sorted(s.items())]
        return self.encode(poses)[0]


# ---- module-level token helpers (reference formats.py:121-130) ----

def tokens(value, analyzer, kwargs: dict | None = None):
    """Token stream for a value: pre-tokenized lists go through
    ``entoken``; strings run through the analyzer (an
    :class:`~whoosh_ray.functions.analysis.AnalyzerSpec` here), with
    stopped tokens removed (the reference pipes through ``unstopped``;
    this engine's analyzers drop stopped tokens eagerly).  Honors the
    reference word_values kwargs: ``positions`` / ``chars`` /
    ``boosts`` select which Token attributes are populated."""
    from whoosh_ray.analysis import entoken, unstopped

    kwargs = kwargs or {}
    if isinstance(value, (tuple, list)):
        return unstopped(entoken(value, **kwargs))
    from whoosh_ray.analysis import Token
    from whoosh_ray.functions.analysis import VectorAnalyzer

    want_chars = bool(kwargs.get("chars"))
    tb = VectorAnalyzer(analyzer)([value], with_chars=want_chars)

    def _gen():
        boosts = getattr(tb, "boosts", None)
        for i in range(len(tb.terms)):
            t = Token(str(tb.terms[i]), int(tb.positions[i]))
            if boosts is not None:
                t.boost = float(boosts[i])
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
