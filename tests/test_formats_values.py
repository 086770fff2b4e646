"""Format value-codec parity vs the reference whoosh/formats.py:
word_values tuples, encode/decode byte round-trips, combine(), and the
broken-as-shipped crash quirks."""

from __future__ import annotations

import pytest

from tests.conftest import load_whoosh_oracle

FORMAT_NAMES = ["Existence", "Frequency", "Positions", "Characters",
                "PositionBoosts", "CharacterBoosts"]
DECODERS = ["frequency", "weight", "positions", "characters",
            "position_boosts", "character_boosts"]

TEXTS = [
    "alpha beta alpha gamma beta alpha",
    "the quick brown fox jumps over the lazy dog dog",
    "",
    "one",
    "repeated repeated repeated",
    "a b c d e f g a b c",
    "Mixed CASE tokens Mixed case",
    "numbers 123 and 456 and 123 again",
]


def _pairs(name, boost=1.0):
    load_whoosh_oracle()
    import whoosh.formats as rf

    import whoosh_ray.formats as mf

    return getattr(rf, name)(field_boost=boost), \
        getattr(mf, name)(field_boost=boost)


@pytest.mark.parametrize("name", FORMAT_NAMES)
@pytest.mark.parametrize("boost", [1.0, 2.5])
def test_word_values_and_decode_parity(name, boost):
    load_whoosh_oracle()
    from whoosh.analysis import StandardAnalyzer

    from whoosh_ray.analysis import StandardAnalyzer as MyStd

    R, M = _pairs(name, boost)
    ra, ma = StandardAnalyzer(), MyStd()
    for text in TEXTS:
        rw = sorted(R.word_values(text, ra))
        mw = sorted(M.word_values(text, ma))
        assert rw == mw, (name, text)
        for _, _, _, v in rw:
            for dec in DECODERS:
                assert R.supports(dec) == M.supports(dec)
                if R.supports(dec):
                    assert R.decode_as(dec, v) == M.decode_as(dec, v), \
                        (name, dec, text)


@pytest.mark.parametrize("name", ["Frequency", "Positions",
                                  "PositionBoosts", "CharacterBoosts"])
def test_word_values_stem_and_boost_chains(name):
    """Parity through a stemming analyzer (chars survive the chain) and
    a per-token ^boost chain (DelimitedAttributeFilter -> t.boost)."""
    load_whoosh_oracle()
    from whoosh.analysis import (LowercaseFilter, RegexTokenizer,
                                 StemmingAnalyzer)
    from whoosh.analysis.filters import DelimitedAttributeFilter

    from whoosh_ray.analysis import \
        DelimitedAttributeFilter as MyDAF
    from whoosh_ray.analysis import LowercaseFilter as MyLC
    from whoosh_ray.analysis import RegexTokenizer as MyRT
    from whoosh_ray.analysis import StemmingAnalyzer as MyStem

    R, M = _pairs(name, 1.5)
    pairs = [
        (StemmingAnalyzer(), MyStem(),
         "running runners ran the jumping"),
        (RegexTokenizer(r"\S+") | DelimitedAttributeFilter()
         | LowercaseFilter(),
         MyRT(r"\S+") | MyDAF() | MyLC(),
         "deploy^2 render^0.5 deploy test"),
    ]
    for ra, ma, text in pairs:
        assert sorted(R.word_values(text, ra)) == \
            sorted(M.word_values(text, ma)), (name, text)


@pytest.mark.parametrize("name", FORMAT_NAMES)
def test_pretokenized_list_path(name):
    R, M = _pairs(name)
    for value in (["a", "b", "a"], ["ab", "c", "ab", "d"], []):
        assert sorted(R.word_values(value, None)) == \
            sorted(M.word_values(value, None)), (name, value)


def test_combine_parity_and_quirks():
    load_whoosh_oracle()
    import whoosh.formats as rf

    import whoosh_ray.formats as mf

    # working combine paths are byte-identical
    P, MP = rf.Positions(), mf.Positions()
    vs = [P.encode([1, 4, 9]), P.encode([2, 4, 20])]
    assert P.combine(vs) == MP.combine(vs)
    PB, MPB = rf.PositionBoosts(), mf.PositionBoosts()
    vs = [PB.encode([(1, 1.0), (4, 2.0)]), PB.encode([(1, 0.5), (9, 1.0)])]
    assert PB.combine(vs) == MPB.combine(vs)
    C, MC = rf.Characters(), mf.Characters()
    vs = [C.encode([(1, 0, 5), (4, 10, 14)]), C.encode([(2, 6, 9)])]
    assert C.combine(vs) == MC.combine(vs)
    CB, MCB = rf.CharacterBoosts(), mf.CharacterBoosts()
    vs = [CB.encode([(1, 0, 5, 1.0)])[0], CB.encode([(2, 6, 9, 2.0)])[0]]
    assert CB.combine(vs) == MCB.combine(vs)
    assert rf.Existence().combine([b"", b""]) == \
        mf.Existence().combine([b"", b""]) == b""

    # Frequency.combine calls the nonexistent decode_value
    # (reference formats.py:205) — AttributeError both sides; note the
    # reference Frequency also defines no encode() (values pack inline
    # in word_values) — mirrored
    assert not hasattr(rf.Frequency(), "encode")
    assert not hasattr(mf.Frequency(), "encode")
    from whoosh_ray.system import pack_uint
    fv = [pack_uint(3)]
    with pytest.raises(AttributeError):
        rf.Frequency().combine(fv)
    with pytest.raises(AttributeError):
        mf.Frequency().combine(fv)

    # duplicate positions crash Characters/CharacterBoosts combine
    # (reference pos[s], formats.py:330/472) — TypeError both sides
    vs = [C.encode([(1, 0, 5)]), C.encode([(1, 2, 7)])]
    with pytest.raises(TypeError):
        C.combine(vs)
    with pytest.raises(TypeError):
        MC.combine(vs)
    vs = [CB.encode([(1, 0, 5, 1.0)])[0], CB.encode([(1, 2, 7, 1.0)])[0]]
    with pytest.raises(TypeError):
        CB.combine(vs)
    with pytest.raises(TypeError):
        MCB.combine(vs)


def test_misc_quirks():
    load_whoosh_oracle()
    import whoosh.formats as rf

    import whoosh_ray.formats as mf

    # truncated fixed-size read: decode_* re-appends the pickle STOP
    P, MP = rf.Positions(), mf.Positions()
    v = P.encode([3, 7])[:-1]
    assert P.decode_positions(v) == MP.decode_positions(v)

    # Frequency asserts a float boost (reference formats.py:178)
    with pytest.raises(AssertionError):
        rf.Frequency(field_boost=2)
    with pytest.raises(AssertionError):
        mf.Frequency(field_boost=2)

    for name in FORMAT_NAMES:
        R, M = _pairs(name)
        assert R.fixed_value_size() == M.fixed_value_size(), name
        assert R.posting_size == M.posting_size, name


def test_listmatcher_value_as_and_spans():
    """The compat ListMatcher dispatches value_as/spans through a real
    Format now."""
    import whoosh_ray.formats as mf
    from whoosh_ray.matching import ListMatcher

    fmt = mf.Characters()
    vals = [fmt.encode([(0, 0, 5), (3, 12, 17)]), fmt.encode([(1, 6, 9)])]
    m = ListMatcher([2, 7], weights=[2.0, 1.0], values=vals, format=fmt)
    assert m.supports("characters") and m.supports("positions")
    assert m.value_as("positions") == [0, 3]
    sp = m.spans()
    assert [(s.startchar, s.endchar) for s in sp] == [(0, 5), (12, 17)]
    m.next()
    assert m.value_as("characters") == [(1, 6, 9)]


# ---- hypothesis byte-parity fuzz over random posting payloads ----

from hypothesis import given, settings, strategies as st  # noqa: E402


def _poslist():
    # strictly increasing positions
    return st.lists(st.integers(0, 50), min_size=1, max_size=12,
                    unique=True).map(sorted)


def _charlist():
    # (pos, startchar, endchar) with increasing positions and
    # non-overlapping increasing char spans
    def build(pairs):
        out, char = [], 0
        for i, width in enumerate(pairs):
            out.append((i * 2, char, char + width))
            char += width + 1
        return out
    return st.lists(st.integers(1, 9), min_size=1, max_size=10).map(build)


def _boost():
    return st.floats(min_value=0.25, max_value=4.0,
                     allow_nan=False, allow_infinity=False)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(_poslist())
def test_fuzz_positions_bytes(poslist):
    load_whoosh_oracle()
    import whoosh.formats as rf

    import whoosh_ray.formats as mf

    R, M = rf.Positions(), mf.Positions()
    assert R.encode(poslist) == M.encode(poslist)
    v = R.encode(poslist)
    assert M.decode_positions(v) == R.decode_positions(v) == list(poslist)
    assert M.decode_frequency(v) == R.decode_frequency(v)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(_charlist())
def test_fuzz_characters_bytes(poslist):
    load_whoosh_oracle()
    import whoosh.formats as rf

    import whoosh_ray.formats as mf

    R, M = rf.Characters(), mf.Characters()
    assert R.encode(poslist) == M.encode(poslist)
    v = R.encode(poslist)
    assert M.decode_characters(v) == R.decode_characters(v) == poslist
    assert M.decode_positions(v) == R.decode_positions(v)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(_poslist(), st.data())
def test_fuzz_position_boosts_bytes(poslist, data):
    load_whoosh_oracle()
    import whoosh.formats as rf

    import whoosh_ray.formats as mf

    poses = [(p, data.draw(_boost())) for p in poslist]
    R, M = rf.PositionBoosts(), mf.PositionBoosts()
    assert R.encode(poses) == M.encode(poses)
    v = R.encode(poses)
    assert M.decode_position_boosts(v) == R.decode_position_boosts(v)
    assert M.decode_weight(v) == R.decode_weight(v)
    # combine parity on two disjoint-position payloads
    shifted = [(p + 100, b) for p, b in poses]
    vs = [v, R.encode(shifted)]
    assert R.combine(vs) == M.combine(vs)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(_charlist(), st.data())
def test_fuzz_character_boosts_bytes(charlist, data):
    load_whoosh_oracle()
    import whoosh.formats as rf

    import whoosh_ray.formats as mf

    poses = [(p, sc, ec, data.draw(_boost())) for p, sc, ec in charlist]
    R, M = rf.CharacterBoosts(), mf.CharacterBoosts()
    assert R.encode(poses) == M.encode(poses)
    v = R.encode(poses)[0]
    assert M.decode_character_boosts(v) == R.decode_character_boosts(v)
    assert M.decode_positions(v) == R.decode_positions(v)
    assert M.decode_weight(v) == R.decode_weight(v)
