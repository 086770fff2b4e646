"""Randomized query-tree conformance fuzz vs the reference engine.

Hypothesis generates arbitrary boolean/positional/expansion query trees
over the F1 transcript fixture and asserts rank- AND score-identity
against the reference whoosh oracle — the property-based complement of
the hand-picked cases in test_conformance.py (mirrors the reference's
own randomized corpora habit, tests/test_weightings.py:24-27).

Deterministic (``derandomize=True``) so CI results are stable.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.oracle import build_oracle_index, oracle_search
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import (
    And,
    AndMaybe,
    AndNot,
    DisjunctionMax,
    Not,
    Or,
    Phrase,
    Prefix,
    Require,
    Searcher,
    Term,
    TermRange,
    Wildcard,
)
from whoosh_ray.sources.transcripts import generate_transcripts

# words spanning: frequent, mid, rare, stopword-stripped, absent,
# mixed-case-normalized, regex-edge tokens
WORDS = ["deploy", "render", "cluster", "error", "user", "november",
         "token", "alpha", "camelcase", "big-time", "under_score",
         "3.141", "the", "absentterm", "query", "merge"]
PREFIXES = ["de", "ren", "clu", "err", "a", "zz"]
WILDCARDS = ["de*oy", "ren*", "*ster", "er?or", "z*q"]
RANGES = [("a", "c"), ("d", "f"), ("m", "p"), ("t", "u"), ("x", "z")]
FIELDS = ["text", "role"]


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=30, seed=7)


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory):
    from whoosh_ray.state.schema import transcripts_schema

    d = tmp_path_factory.mktemp("fuzz_ix")
    (d / "src").mkdir()
    pq.write_table(corpus, str(d / "src" / "part0.parquet"))
    build_index(str(d / "src"), str(d / "index"), transcripts_schema(),
                seg_size=64)
    return Searcher(str(d / "index"))


@pytest.fixture(scope="module")
def oracle(corpus):
    return build_oracle_index(corpus, text_fields=("text",),
                              id_fields=("role", "tool", "conv_id"))


def _wq():
    from tests.conftest import load_whoosh_oracle

    load_whoosh_oracle()
    from whoosh import query as wq

    return wq


def leaf_strategy():
    w = _wq()
    terms = st.sampled_from(WORDS).map(
        lambda t: (Term("text", t), w.Term("text", t)))
    roles = st.sampled_from(["user", "assistant", "tool", "ghost"]).map(
        lambda t: (Term("role", t), w.Term("role", t)))
    prefixes = st.sampled_from(PREFIXES).map(
        lambda p: (Prefix("text", p), w.Prefix("text", p)))
    wilds = st.sampled_from(WILDCARDS).map(
        lambda p: (Wildcard("text", p), w.Wildcard("text", p)))
    ranges = st.sampled_from(RANGES).map(
        lambda r: (TermRange("text", r[0], r[1]),
                   w.TermRange("text", r[0], r[1])))
    phrases = st.tuples(
        st.lists(st.sampled_from(WORDS[:8]), min_size=2, max_size=3),
        st.integers(min_value=1, max_value=3),
    ).map(lambda ps: (Phrase("text", list(ps[0]), slop=ps[1]),
                      w.Phrase("text", list(ps[0]), slop=ps[1])))
    return st.one_of(terms, roles, prefixes, wilds, ranges, phrases)


def boosted(pair_strategy):
    return st.tuples(pair_strategy,
                     st.sampled_from([1.0, 1.0, 1.0, 0.5, 2.0])).map(
        lambda pb: _apply_boost(pb[0], pb[1]))


def _apply_boost(pair, b):
    if b == 1.0:
        return pair
    import copy

    mine, ref = pair
    # deep-copy before mutating: hypothesis may alias one drawn pair at
    # several tree positions, and the reference side is immutable
    # (with_boost copies) while ours mutates in place
    mine = copy.deepcopy(mine)
    mine.boost = mine.boost * b
    ref = ref.with_boost(ref.boost * b)
    return mine, ref


def _mk_compound(kind, subs):
    w = _wq()
    mines = [m for m, _ in subs]
    refs = [r for _, r in subs]
    if kind == "and":
        return And(mines), w.And(refs)
    if kind == "or":
        return Or(mines), w.Or(refs)
    if kind == "djm":
        return DisjunctionMax(mines), w.DisjunctionMax(refs)
    if kind == "andnot":
        return (AndNot(mines[0], Or(mines[1:])),
                w.AndNot(refs[0], w.Or(refs[1:])))
    if kind == "require":
        return (Require(mines[0], Or(mines[1:])),
                w.Require(refs[0], w.Or(refs[1:])))
    if kind == "andmaybe":
        return (AndMaybe(mines[0], Or(mines[1:])),
                w.AndMaybe(refs[0], w.Or(refs[1:])))
    if kind == "andnotlast":
        return (And(mines[:-1] + [Not(mines[-1])]),
                w.And(refs[:-1] + [w.Not(refs[-1])]))
    raise AssertionError(kind)


# minmatch excluded: the reference documents Or.minmatch as "not yet
# implemented" (compound.py:305) — ours implements it.
#
# Scope note: the quirky combinators (djm/andnot/require/andmaybe and
# And-with-Not) appear only at the OUTERMOST level, mirroring the pinned
# quirk ledger.  NESTING them inside each other exercises reference
# behavior that is an emergent function of matcher cursor STATE (e.g.
# And([AndMaybe(a, b), Not(c)]): whether b's +score reaches a given doc
# depends on how far the enclosing intersection leapfrogged b's cursor —
# doc-by-doc, block-layout-dependent).  Reproducing that would mean
# re-implementing the reference's pull-based matcher engine verbatim,
# which is exactly what this vectorized engine is not; compositional
# scores are produced instead (divergence documented in COVERAGE.md).
_SAFE_KINDS = ["and", "or", "or"]
_ALL_KINDS = _SAFE_KINDS + ["djm", "andnot", "require", "andmaybe",
                            "andnotlast"]


def compound(kinds, children):
    return st.tuples(st.sampled_from(kinds), children).map(
        lambda ks: _mk_compound(ks[0], ks[1]))


def query_strategy():
    leaves = boosted(leaf_strategy())
    inner = compound(_SAFE_KINDS, st.lists(leaves, min_size=2, max_size=4))
    outer = compound(
        _ALL_KINDS,
        st.lists(st.one_of(leaves, inner), min_size=2, max_size=3))
    return st.one_of(leaves, inner, boosted(outer))


#: node types whose reference matcher ``replace()`` is broken under a
#: LIMITED search (collector minscore pruning), losing valid docs:
#: - DisjunctionMaxMatcher.replace (binary.py:319-368) returns
#:   NullMatcher when either child goes inactive and degenerates to one
#:   branch once the other's max quality dips below minscore;
#: - AndNotMatcher.replace (binary.py:613-633) rebuilds the matcher,
#:   whose constructor re-runs ``_find_first()`` at the CURRENT cursor —
#:   re-evaluating the first-doc-escape quirk mid-stream and excluding
#:   docs the unlimited evaluation keeps.
#: We implement the intent (top-k == prefix of the unlimited ranking).
_LIMITED_LOSSY = (DisjunctionMax, AndNot)


def _limited_lossy(q) -> bool:
    if isinstance(q, _LIMITED_LOSSY):
        return True
    subs = list(getattr(q, "subqueries", None) or [])
    if subs and len(set(subs)) < len(subs):
        # un-normalized DUPLICATE siblings (search() never normalizes):
        # the reference's block-quality estimates multi-count the dup
        # matchers and its limited search can skip the true top docs
        # (probed: And([deploy, Or([deploy]*3)]) limit=1 returns doc 24
        # while its own unlimited top is doc 180) — compare against the
        # unlimited prefix.  Shapes where the reference's pruning IS a
        # prefix coincide under either baseline, so classifying every
        # dup-sibling tree lossy is safe.
        return True
    for sub in subs:
        if _limited_lossy(sub):
            return True
    for attr in ("a", "b", "subquery"):
        sub = getattr(q, attr, None)
        if sub is not None and _limited_lossy(sub):
            return True
    return False


@settings(max_examples=120, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pair=query_strategy(),
       limit=st.sampled_from([1, 5, 10, 50, None]))
def test_random_query_trees_rank_and_score_identical(engine, oracle,
                                                     pair, limit):
    from hypothesis import assume

    myq, refq = pair
    # Trees containing limited-lossy nodes (see _LIMITED_LOSSY) are
    # compared against the reference's UNLIMITED ranking prefix —
    # divergence pinned in test_djm_limited_prune_divergence.
    ref_limit = None if (limit is not None and _limited_lossy(myq)) else limit
    try:
        ref = [(int(d), float(s))
               for d, s in oracle_search(oracle, refq, limit=ref_limit)]
    except AssertionError:
        # the reference crashes on e.g. Require with equal sides
        # (matching/binary.py `assert a_id != b_id`); behavior doesn't
        # exist there, so there is nothing to conform to
        assume(False)
    if ref_limit is None and limit is not None:
        ref = ref[:limit]
    mine = [(int(d), float(s))
            for d, s in engine.search(myq, limit=limit).pairs()]
    assert [d for d, _ in mine] == [d for d, _ in ref]
    np.testing.assert_allclose([s for _, s in mine], [s for _, s in ref],
                               rtol=1e-9, atol=1e-12)


def test_djm_limited_prune_divergence(engine, oracle):
    """Pinned DELIBERATE divergence (same family as DFree/Roaring
    "broken as shipped"): under a limited search the reference's
    DisjunctionMaxMatcher.replace() drops valid docs — here the
    lower-docid member of the top tie pair — so its top-2 is NOT a
    prefix of its own unlimited ranking.  We return the exact prefix."""
    w = _wq()
    myq = DisjunctionMax([Term("text", "deploy"), Term("role", "user")])
    refq = w.DisjunctionMax([w.Term("text", "deploy"),
                             w.Term("role", "user")])
    full_ref = oracle_search(oracle, refq, limit=None)
    lim_ref = oracle_search(oracle, refq, limit=2)
    # the reference bug: limited result is not a prefix of its own
    # unlimited ranking (if a reference upgrade ever fixes this, drop
    # the special-casing in the fuzz above)
    assert [d for d, _ in lim_ref] != [d for d, _ in full_ref[:2]]
    # ours: exact prefix, scores identical to the reference's unlimited
    mine = [(int(d), float(s)) for d, s in engine.search(myq, limit=2).pairs()]
    assert mine == [(int(d), float(s)) for d, s in full_ref[:2]]


def _util_key(q, with_boost=True):
    name = type(q).__name__
    kids = [_util_key(c, with_boost) for c in q.children()]
    own = []
    for k in ("fieldname", "text", "slop", "start", "end"):
        v = getattr(q, k, None)
        if isinstance(v, bytes):
            v = v.decode()
        if isinstance(v, (str, int, float)):
            own.append((k, v))
    words = getattr(q, "words", None)
    if words is not None:
        own.append(("words", tuple(
            w.decode() if isinstance(w, bytes) else w for w in words)))
    if with_boost:
        own.append(("boost", round(float(getattr(q, "boost", 1.0)), 6)))
    return (name, tuple(own), tuple(kids))


@given(pair=query_strategy())
@settings(max_examples=120, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_tree_utilities_parity(engine, oracle, pair):
    """Boost-independent tree utilities on RANDOM trees vs the
    reference: is_leaf/is_range/has_terms/field, all_terms (both
    phrases= settings), requires (structural keys sans boost — the
    engines land explicit boosts on different tree levels by design,
    score-verified elsewhere), phrases() shape, and replace() identity
    (new tree with the text swapped, original untouched)."""
    mine, ref = pair

    def dec(s):
        return {(f, (x.decode() if isinstance(x, bytes) else x))
                for f, x in s}

    assert mine.is_leaf() == ref.is_leaf()
    assert mine.is_range() == ref.is_range()
    assert mine.has_terms() == ref.has_terms()
    assert mine.field() == ref.field()
    assert mine.all_terms() == dec(ref.all_terms())
    assert mine.all_terms(phrases=False) == dec(ref.all_terms(phrases=False))
    assert sorted(_util_key(q, False) for q in mine.requires()) == \
        sorted(_util_key(q, False) for q in ref.requires())
    mt, mp = mine.phrases()
    rt, rp = ref.phrases()
    assert len(mt) == len(rt) and len(mp) == len(rp)
    mrep = mine.replace("text", "deploy", "zzreplaced")
    rrep = ref.replace("text", "deploy", "zzreplaced")
    assert _util_key(mrep, False) == _util_key(rrep, False)
    assert _util_key(mine, False) != _util_key(mrep, False) or \
        ("text", "deploy") not in mine.all_terms()
