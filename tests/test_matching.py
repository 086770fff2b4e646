"""whoosh_ray.matching pull-matcher parity vs the reference matcher
classes: lockstep iteration (id/score/weight per next()), random
skip_to, all_ids, quality-guided skipping (skip_to_quality + replace
with minquality), the wrapper and combo families, crash parity for the
pinned quirks, and the matcher()->docs_scores engine bridge."""

import random

import numpy as np
import pytest

from tests.conftest import load_whoosh_oracle

import whoosh_ray.matching as M


def _ref_matching():
    load_whoosh_oracle()
    import whoosh.matching as wm
    return wm


# ---- helpers -------------------------------------------------------


class FakeScorer:
    """Minimal scorer protocol shared by both implementations:
    score = weight * factor, block quality = max weight * factor."""

    def __init__(self, factor=1.0):
        self.factor = factor

    def supports_block_quality(self):
        return True

    def score(self, m):
        return m.weight() * self.factor

    def block_quality(self, m):
        return m.block_max_weight() * self.factor

    def max_quality(self, m):
        return m.block_max_weight() * self.factor


def posting_list(rng, n=None, maxid=60):
    n = rng.randrange(0, 12) if n is None else n
    ids = sorted(rng.sample(range(maxid), min(n, maxid)))
    weights = [round(rng.uniform(0.5, 4.0), 3) for _ in ids]
    return ids, weights


def make_pair(rng, refm, scored=True):
    ids, weights = posting_list(rng)
    scorer = FakeScorer(1.5) if scored else None
    ours = M.ListMatcher(list(ids), list(weights), scorer=scorer)
    ref = refm.ListMatcher(list(ids), list(weights), scorer=scorer)
    return ours, ref


def _both(fa, fb):
    """Run the same op on both sides; crashes must MATCH (several
    reference combinators have unguarded id() probes — pinned)."""
    ea = eb = None
    ra = rb = None
    try:
        ra = fa()
    except Exception as e:  # noqa: BLE001 - crash parity
        ea = type(e).__name__
    try:
        rb = fb()
    except Exception as e:  # noqa: BLE001
        eb = type(e).__name__
    assert ea == eb, f"crash mismatch: ours={ea} ref={eb}"
    return ra, rb, ea is not None


def lockstep(ours, ref, rng, steps=200, check_weight=True):
    """Drive both matchers with the same operation sequence and compare
    every observable."""
    for _ in range(steps):
        assert ours.is_active() == ref.is_active()
        if not ref.is_active():
            break
        assert ours.id() == ref.id()
        assert ours.score() == pytest.approx(ref.score(), rel=0, abs=0)
        if check_weight:
            assert ours.weight() == pytest.approx(ref.weight())
        op = rng.random()
        if op < 0.6:
            _, _, crashed = _both(ours.next, ref.next)
        elif op < 0.9:
            target = ref.id() + rng.randrange(0, 8)
            _, _, crashed = _both(lambda: ours.skip_to(target),
                                  lambda: ref.skip_to(target))
        else:
            ro, rr, crashed = _both(ours.replace, ref.replace)
            if not crashed:
                ours, ref = ro, rr
        if crashed:
            break
    return ours, ref


# ---- ListMatcher ---------------------------------------------------


def test_listmatcher_parity():
    wm = _ref_matching()
    rng = random.Random(99)
    for i in range(200):
        ours, ref = make_pair(rng, wm, scored=bool(i % 2))
        lockstep(ours, ref, rng)

    # all_items / values path
    ids = [1, 4, 9]
    vals = ["a", "b", "c"]
    ours = M.ListMatcher(ids, None, list(vals))
    ref = wm.ListMatcher(ids, None, list(vals))
    assert list(ours.all_items()) == list(ref.all_items())

    # ReadTooFar parity
    ours = M.ListMatcher([], None)
    with pytest.raises(M.ReadTooFar):
        ours.skip_to(5)
    with pytest.raises(wm.ReadTooFar):
        wm.ListMatcher([], None).skip_to(5)


def test_nullmatcher():
    wm = _ref_matching()
    assert not M.NullMatcher.is_active()
    assert M.NullMatcher() is M.NullMatcher
    assert list(M.NullMatcher.all_ids()) == list(wm.NullMatcher.all_ids())
    assert M.NullMatcher.max_quality() == wm.NullMatcher.max_quality() == 0


# ---- binary combinators --------------------------------------------


BINARY = ["UnionMatcher", "IntersectionMatcher", "AndNotMatcher",
          "AndMaybeMatcher", "DisjunctionMaxMatcher"]


@pytest.mark.parametrize("cls", BINARY)
def test_binary_parity(cls):
    wm = _ref_matching()
    rng = random.Random(hash(cls) % 10**6)
    for i in range(150):
        a_o, a_r = make_pair(rng, wm)
        b_o, b_r = make_pair(rng, wm)
        ours = getattr(M, cls)(a_o, b_o)
        ref = getattr(wm, cls)(a_r, b_r)
        # AndMaybe.weight probes b.id() unguarded in the reference —
        # compare weight only through score (score() is guarded)
        lockstep(ours, ref, rng, check_weight=(cls != "AndMaybeMatcher"))

    # fresh pair for all_ids comparison
    for i in range(60):
        a_o, a_r = make_pair(rng, wm)
        b_o, b_r = make_pair(rng, wm)
        assert (list(getattr(M, cls)(a_o, b_o).all_ids())
                == list(getattr(wm, cls)(a_r, b_r).all_ids()))


def test_nested_tree_parity():
    wm = _ref_matching()
    rng = random.Random(431)

    # generate a random structure ONCE as nested tuples of posting
    # lists, then instantiate it against both implementations
    def gen(depth):
        if depth == 0 or rng.random() < 0.35:
            return posting_list(rng)
        return (rng.choice(BINARY), gen(depth - 1), gen(depth - 1))

    def inst(node, mod):
        if isinstance(node, tuple) and len(node) == 3 \
                and isinstance(node[0], str):
            cls, l, r = node
            return getattr(mod, cls)(inst(l, mod), inst(r, mod))
        ids, weights = node
        scorer = FakeScorer(2.0)
        return mod.ListMatcher(list(ids), list(weights), scorer=scorer)

    for i in range(80):
        structure = gen(3)
        # construction itself can crash (nested combinators seek
        # through unguarded id() probes) — type must match
        ours, ref, crashed = _both(lambda: inst(structure, M),
                                   lambda: inst(structure, wm))
        if not crashed:
            assert _walk_scores(ours) == _walk_scores(ref)


def _walk(m):
    while m.is_active():
        yield m.id()
        m.next()


def _walk_scores(m):
    """(id, score) stream until exhaustion — or until the matcher
    crashes (nested combinators have unguarded id() probes in the
    reference; the crash point and type must match)."""
    out = []
    try:
        while m.is_active():
            out.append((m.id(), m.score()))
            m.next()
    except Exception as e:  # noqa: BLE001 - crash parity
        out.append(("CRASH", type(e).__name__))
    return out


def test_quality_skipping_parity():
    """skip_to_quality + replace(minquality) drive the same survivor
    streams on both sides."""
    wm = _ref_matching()
    rng = random.Random(77)
    for cls in BINARY:
        for i in range(60):
            a_o, a_r = make_pair(rng, wm)
            b_o, b_r = make_pair(rng, wm)
            ours = getattr(M, cls)(a_o, b_o)
            ref = getattr(wm, cls)(a_r, b_r)
            minq = rng.uniform(0.0, 8.0)
            ours = ours.replace(minq)
            ref = ref.replace(minq)
            assert type(ours).__name__ == type(ref).__name__
            while ours.is_active() and ref.is_active():
                assert ours.id() == ref.id()
                assert ours.score() == pytest.approx(ref.score())
                if ours.supports_block_quality() and rng.random() < 0.4:
                    ours.skip_to_quality(minq)
                    ref.skip_to_quality(minq)
                else:
                    ours.next()
                    ref.next()
            assert ours.is_active() == ref.is_active()


def test_andmaybe_weight_crash_parity():
    wm = _ref_matching()
    ours = M.AndMaybeMatcher(M.ListMatcher([5], [1.0]),
                             M.ListMatcher([1], [1.0]))
    ref = wm.AndMaybeMatcher(wm.ListMatcher([5], [1.0]),
                             wm.ListMatcher([1], [1.0]))
    # optional side exhausts itself skipping to 5 -> weight() probes
    # b.id() on an inactive matcher in BOTH implementations
    with pytest.raises(IndexError):
        ref.weight()
    with pytest.raises(IndexError):
        ours.weight()


# ---- wrappers ------------------------------------------------------


def test_filter_exclude_parity():
    wm = _ref_matching()
    rng = random.Random(55)
    for i in range(100):
        ids, weights = posting_list(rng)
        fset = set(rng.sample(range(60), rng.randrange(0, 20)))
        for exclude in (False, True):
            ours = M.FilterMatcher(M.ListMatcher(list(ids), list(weights)),
                                   fset, exclude=exclude, boost=1.5)
            ref = wm.FilterMatcher(wm.ListMatcher(list(ids), list(weights)),
                                   fset, exclude=exclude, boost=1.5)
            lockstep(ours, ref, rng)
        o = M.ExcludeMatcher(M.ListMatcher(list(ids), list(weights)), fset)
        r = wm.ExcludeMatcher(wm.ListMatcher(list(ids), list(weights)), fset)
        assert list(o.all_ids()) == list(r.all_ids())


def test_inverse_parity():
    wm = _ref_matching()
    rng = random.Random(66)
    for i in range(100):
        ids, weights = posting_list(rng)
        missing_set = set(rng.sample(range(60), rng.randrange(0, 10)))
        limit = rng.randrange(1, 70)
        ours = M.InverseMatcher(M.ListMatcher(list(ids), list(weights)),
                                limit, missing=missing_set.__contains__,
                                weight=2.0)
        ref = wm.InverseMatcher(wm.ListMatcher(list(ids), list(weights)),
                                limit, missing=missing_set.__contains__,
                                weight=2.0)
        lockstep(ours, ref, rng)


def test_require_constantscore_singleterm_parity():
    wm = _ref_matching()
    rng = random.Random(88)
    for i in range(80):
        a_o, a_r = make_pair(rng, wm)
        b_o, b_r = make_pair(rng, wm)
        ours = M.RequireMatcher(a_o, b_o)
        ref = wm.RequireMatcher(a_r, b_r)
        lockstep(ours, ref, rng)

        c_o, c_r = make_pair(rng, wm)
        ours = M.ConstantScoreWrapperMatcher(c_o, score=7.5)
        ref = wm.ConstantScoreWrapperMatcher(c_r, score=7.5)
        lockstep(ours, ref, rng, check_weight=False)

        d_o, d_r = make_pair(rng, wm)
        ours = M.SingleTermMatcher(d_o, ("text", "x"))
        ref = wm.SingleTermMatcher(d_r, ("text", "x"))
        assert ours.term() == ref.term() == ("text", "x")
        assert (list(ours.matching_terms()) == list(ref.matching_terms()))
        lockstep(ours, ref, rng)


def test_coord_parity():
    wm = _ref_matching()
    rng = random.Random(111)
    for i in range(80):
        a_o, a_r = make_pair(rng, wm)
        b_o, b_r = make_pair(rng, wm)
        # term matchers so CoordMatcher counts terms
        a_o._term = a_r._term = ("text", "a")
        b_o._term = b_r._term = ("text", "b")
        ours = M.CoordMatcher(M.UnionMatcher(a_o, b_o), scale=0.5)
        ref = wm.CoordMatcher(wm.UnionMatcher(a_r, b_r), scale=0.5)
        lockstep(ours, ref, rng, check_weight=False)


def test_multimatcher_parity():
    wm = _ref_matching()
    rng = random.Random(222)

    class SumScorer:
        def score(self, m):
            return m.weight() * 3.0

    for i in range(100):
        parts = [posting_list(rng, maxid=20) for _ in range(rng.randrange(1, 5))]
        offsets = list(np.cumsum([0] + [20] * (len(parts) - 1)))
        ours = M.MultiMatcher(
            [M.ListMatcher(list(i_), list(w)) for i_, w in parts],
            offsets, scorer=SumScorer())
        ref = wm.MultiMatcher(
            [wm.ListMatcher(list(i_), list(w)) for i_, w in parts],
            offsets, scorer=SumScorer())
        lockstep(ours, ref, rng)


# ---- combo ---------------------------------------------------------


@pytest.mark.parametrize("cls,kw", [
    ("ArrayUnionMatcher", {"partsize": 16}),
    ("ArrayUnionMatcher", {"partsize": 0}),
    ("PreloadedUnionMatcher", {}),
])
def test_combo_parity(cls, kw):
    wm = _ref_matching()
    rng = random.Random(333)
    for i in range(80):
        parts = [posting_list(rng) for _ in range(rng.randrange(1, 6))]
        doccount = 60
        ours = getattr(M, cls)(
            [M.ListMatcher(list(i_), list(w), scorer=FakeScorer())
             for i_, w in parts], doccount, boost=1.25, **kw)
        ref = getattr(wm, cls)(
            [wm.ListMatcher(list(i_), list(w), scorer=FakeScorer())
             for i_, w in parts], doccount, boost=1.25, **kw)
        seq_o = _walk_scores(ours)
        seq_r = _walk_scores(ref)
        assert [d for d, _ in seq_o] == [d for d, _ in seq_r]
        assert [s for _, s in seq_o] == pytest.approx(
            [s for _, s in seq_r])


# ---- engine bridge -------------------------------------------------


def test_custom_matcher_query_bridge(tmp_path):
    """A reference-style custom Query implementing matcher() runs on
    the engine through the drain bridge."""
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.build import build_index
    from whoosh_ray.search import Searcher, Term
    from whoosh_ray.search.query import Query
    from whoosh_ray.sources.transcripts import generate_transcripts
    from whoosh_ray.state.schema import transcripts_schema

    corpus = generate_transcripts(n_convs=12, seed=31)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(corpus, str(src / "p.parquet"))
    build_index(str(src), str(tmp_path / "ix"), transcripts_schema(),
                seg_size=64)
    s = Searcher(str(tmp_path / "ix"))

    class EverySecondDoc(Query):
        """Custom query via the reference matcher protocol: matches the
        segment's even docids at weight 2.0."""

        def matcher(self, searcher, seg=None):
            ids = [int(d) for d in seg.all_docids() if d % 2 == 0]
            return M.ListMatcher(ids, [2.0] * len(ids))

    res = s.search(EverySecondDoc(), limit=None)
    got = sorted(int(d) for d, _ in res.pairs())
    want = sorted(int(d) for seg in s.segments
                  for d in seg.all_docids() if d % 2 == 0)
    assert got == want
    assert all(sc == 2.0 for _, sc in
               s.search(EverySecondDoc(), limit=None).pairs())

    # and it composes with engine queries
    from whoosh_ray.search.query import And
    both = s.search(And([EverySecondDoc(), Term("text", "deploy")]),
                    limit=None)
    deploy = {int(d) for d, _ in s.search(Term("text", "deploy"),
                                          limit=None).pairs()}
    assert {int(d) for d, _ in both.pairs()} == \
        {d for d in deploy if d % 2 == 0}
