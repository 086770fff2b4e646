"""whoosh_ray.automata parity vs the reference: levenshtein/glob
acceptance over random word pools, DFA next_valid_string /
find_all_matches lockstep over a sorted lexicon, strings_dfa minimal
construction, NFA combinators, product/minimize language preservation,
and agreement with the engine's own vectorized levenshtein_batch."""

import random
import string as stringmod

import pytest

from tests.conftest import load_whoosh_oracle

from whoosh_ray.automata import fsa, glob as globmod, lev


def _ref():
    load_whoosh_oracle()
    import whoosh.automata.fsa as rfsa
    import whoosh.automata.glob as rglob
    import whoosh.automata.lev as rlev

    return rfsa, rglob, rlev


def words(rng, n, alpha="abc", lo=0, hi=8):
    return [("".join(rng.choice(alpha) for _ in range(rng.randrange(lo, hi))))
            for _ in range(n)]


def test_levenshtein_acceptance_parity():
    rfsa, _, rlev = _ref()
    rng = random.Random(17)
    for trial in range(60):
        term = "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 7)))
        k = rng.randrange(0, 3)
        prefix = rng.randrange(0, min(2, len(term)) + 1)
        ours = lev.levenshtein_automaton(term, k, prefix).to_dfa()
        ref = rlev.levenshtein_automaton(term, k, prefix).to_dfa()
        for cand in words(rng, 60, "abcde", 0, 9):
            assert ours.accept(cand) == ref.accept(cand), (term, k, cand)


def test_levenshtein_agrees_with_engine_batch():
    """The automaton's acceptance set == the vectorized banded-DP
    acceptance the engine actually uses."""
    from whoosh_ray.functions.spelling import levenshtein_batch

    rng = random.Random(23)
    pool = sorted(set(words(rng, 400, "abcd", 1, 7)))
    for trial in range(20):
        term = "".join(rng.choice("abcd") for _ in range(rng.randrange(2, 6)))
        k = rng.randrange(1, 3)
        dfa = lev.levenshtein_automaton(term, k).to_dfa()
        via_dfa = {w for w in pool if dfa.accept(w)}
        dists = levenshtein_batch(term, pool, k)
        via_batch = {w for w, d in zip(pool, dists) if d <= k}
        assert via_dfa == via_batch, (term, k)


def test_glob_acceptance_parity():
    rfsa, rglob, _ = _ref()
    rng = random.Random(31)
    patterns = ["a*", "*a", "a?c", "*", "a[bc]d", "ab", "a*b*c", "a**b",
                "*?a", "[ab][cd]", "a[]b", "??"]
    for _ in range(30):
        # random patterns from the glob alphabet
        patterns.append("".join(rng.choice("abc*?") for _ in
                                range(rng.randrange(1, 6))))
    for pat in patterns:
        ours = globmod.glob_automaton(pat).to_dfa()
        ref = rglob.glob_automaton(pat).to_dfa()
        for cand in words(rng, 50, "abcd", 0, 7):
            assert ours.accept(cand) == ref.accept(cand), (pat, cand)


def test_next_valid_string_and_find_all_matches():
    rfsa, _, rlev = _ref()
    rng = random.Random(47)
    lexicon = sorted(set(words(rng, 500, "abcd", 1, 7)))

    def lookup(key):
        from bisect import bisect_left

        i = bisect_left(lexicon, key)
        return lexicon[i] if i < len(lexicon) else None

    for trial in range(25):
        term = rng.choice(lexicon)
        k = rng.randrange(0, 3)
        ours = lev.levenshtein_automaton(term, k).to_dfa()
        ref = rlev.levenshtein_automaton(term, k).to_dfa()

        # next_valid_string lockstep on random probes
        for probe in words(rng, 30, "abcd", 0, 7):
            assert (ours.next_valid_string(probe)
                    == ref.next_valid_string(probe)), (term, k, probe)

        got = list(fsa.find_all_matches(ours, lookup))
        want = list(rfsa.find_all_matches(ref, lookup))
        assert got == want
        # and the semantic ground truth
        assert got == [w for w in lexicon if ours.accept(w)]


def test_strings_dfa():
    rfsa, _, _ = _ref()
    rng = random.Random(59)
    for trial in range(25):
        strings = sorted(set(words(rng, rng.randrange(1, 40), "abc", 1, 6)))
        ours = fsa.strings_dfa(strings)
        ref = rfsa.strings_dfa(strings)
        assert list(ours.generate_all()) == strings
        assert ours.transitions == ref.transitions
        assert ours.final_states == ref.final_states
        for cand in words(rng, 40, "abcd", 0, 7):
            assert ours.accept(cand) == (cand in strings)

    with pytest.raises(Exception):
        fsa.strings_dfa(["b", "a"])
    with pytest.raises(Exception):
        fsa.strings_dfa([""])


def test_nfa_combinators_and_product():
    rfsa, _, _ = _ref()
    rng = random.Random(61)

    a = fsa.string_nfa("ab")
    b = fsa.string_nfa("cd")
    assert sorted(fsa.choice_nfa(a, b).to_dfa().generate_all()) \
        == ["ab", "cd"]
    assert list(fsa.concat_nfa(fsa.string_nfa("a"),
                               fsa.string_nfa("b")).to_dfa()
                .generate_all()) == ["ab"]
    star = fsa.star_nfa(fsa.string_nfa("ab")).to_dfa()
    for n in range(4):
        assert star.accept("ab" * n)
    assert not star.accept("aba")
    plus = fsa.plus_nfa(fsa.string_nfa("a")).to_dfa()
    assert not plus.accept("") and plus.accept("aaa")
    opt = fsa.optional_nfa(fsa.string_nfa("a")).to_dfa()
    assert opt.accept("") and opt.accept("a") and not opt.accept("aa")
    cs = fsa.charset_nfa("xyz").to_dfa()
    assert cs.accept("y") and not cs.accept("a")

    # product: intersection/union of two strings_dfa languages.
    # BOTH implementations index transitions[state] unguarded inside
    # product() — a sink state with no outgoing arcs (every strings_dfa
    # final leaf) raises KeyError identically (reference fsa.py:510).
    def run(fn, *args):
        try:
            return fn(*args)
        except KeyError:
            return "KeyError"

    for trial in range(15):
        s1 = sorted(set(words(rng, 15, "ab", 1, 5)))
        s2 = sorted(set(words(rng, 15, "ab", 1, 5)))
        d1, d2 = fsa.strings_dfa(s1), fsa.strings_dfa(s2)
        r1, r2 = rfsa.strings_dfa(s1), rfsa.strings_dfa(s2)
        inter = run(fsa.intersection, d1, d2)
        rinter = run(rfsa.intersection, r1, r2)
        uni = run(fsa.union, d1, d2)
        runi = run(rfsa.union, r1, r2)
        assert isinstance(inter, str) == isinstance(rinter, str)
        assert isinstance(uni, str) == isinstance(runi, str)
        for cand in words(rng, 40, "ab", 0, 6):
            if not isinstance(inter, str):
                assert inter.accept(cand) == rinter.accept(cand)
            if not isinstance(uni, str):
                assert uni.accept(cand) == runi.accept(cand)


def test_minimize_preserves_language():
    """minimize() works only on TOTAL DFAs: reachable_from indexes
    transitions[src] unguarded, so any DFA with a sink state (every
    finite language) crashes — in BOTH implementations (reference
    fsa.py:305)."""
    rfsa, _, _ = _ref()

    def evens(mod):
        # non-minimal DFA for "even number of a's": state = count % mod,
        # accepting the even residues — equivalent residues collapse
        d = fsa.DFA(0)
        r = rfsa.DFA(0)
        for dd in (d, r):
            for s in range(mod):
                dd.add_transition(s, "a", (s + 1) % mod)
                dd.add_transition(s, "b", s)
                if s % 2 == 0:
                    dd.add_final_state(s)
        return d, r

    rng = random.Random(71)
    for mod in (4, 6, 8):
        ours, ref = evens(mod)
        before = len(ours)
        ours.minimize()
        ref.minimize()
        assert len(ours) < before
        assert len(ours) == len(ref)
        # FSA.accept treats state 0 as a dead end (falsy-state quirk,
        # pinned in the module doc) so the base-0 DFA misaccepts some
        # strings — identically on both sides; ground truth holds once
        # renumbered away from 0
        ours1 = fsa.renumber_dfa(ours, base=1)
        ref1 = rfsa.renumber_dfa(ref, base=1)
        for cand in words(rng, 80, "ab", 0, 12):
            want = cand.count("a") % 2 == 0
            assert ours.accept(cand) == ref.accept(cand), cand
            assert ours1.accept(cand) == want, cand
            assert ref1.accept(cand) == want, cand

    # crash parity on a finite-language (sink-state) DFA
    def mk(mod):
        n = mod.choice_nfa(mod.string_nfa("ab"), mod.string_nfa("cd"))
        return mod.renumber_dfa(n.to_dfa(), base=1)

    with pytest.raises(KeyError):
        mk(fsa).minimize()
    with pytest.raises(KeyError):
        mk(rfsa).minimize()


def test_u_to_utf8_and_renumber():
    """u_to_utf8 works for single-byte (ASCII) labels; MULTI-BYTE
    labels add chain states to the dict being iterated and raise
    RuntimeError in BOTH implementations (reference fsa.py:439-460,
    broken as shipped) — pinned."""
    rfsa, _, rlev = _ref()

    ours = lev.levenshtein_automaton("hello", 1).to_dfa()
    ref = rlev.levenshtein_automaton("hello", 1).to_dfa()
    ours_b = fsa.renumber_dfa(ours, base=1)
    ref_b = rfsa.renumber_dfa(ref, base=1)
    fsa.u_to_utf8(ours_b, base=10**6)
    rfsa.u_to_utf8(ref_b, base=10**6)
    for cand in ["hello", "helxo", "hxlxo", "hell", "helloxx"]:
        enc = list(cand.encode("utf8"))
        assert ours_b.accept(enc) == ref_b.accept(enc) \
            == ours.accept(cand), cand

    with pytest.raises(RuntimeError):
        fsa.u_to_utf8(fsa.renumber_dfa(
            lev.levenshtein_automaton("héllo", 1).to_dfa(), base=1))
    with pytest.raises(RuntimeError):
        rfsa.u_to_utf8(rfsa.renumber_dfa(
            rlev.levenshtein_automaton("héllo", 1).to_dfa(), base=1))
