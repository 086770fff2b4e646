"""levenshtein_batch == the scalar DP, element for element (the scalar
versions are themselves fuzz-pinned against the reference's automaton
acceptance sets)."""

import random
import string

import numpy as np

from whoosh_ray.functions.spelling import (damerau_levenshtein,
                                           levenshtein, levenshtein_batch)


def _vocab(rng, n, alphabet, maxlen=12):
    return [''.join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, maxlen)))
            for _ in range(n)]


def test_batch_matches_scalar_levenshtein():
    rng = random.Random(7)
    vocab = _vocab(rng, 400, "abcdef")
    for word in ["", "a", "fed", "abcde", "deadbeefcafe", "abcabcabc"]:
        for maxdist in (1, 2, 3):
            got = levenshtein_batch(word, vocab, maxdist)
            want = [min(levenshtein(word, c, maxdist), maxdist + 1)
                    for c in vocab]
            assert got.tolist() == want, (word, maxdist)


def test_batch_matches_scalar_damerau():
    rng = random.Random(11)
    vocab = _vocab(rng, 400, "abcd")  # tiny alphabet => many transpositions
    for word in ["abcd", "dcba", "aabb", "abab", "dd"]:
        for maxdist in (1, 2):
            got = levenshtein_batch(word, vocab, maxdist, damerau=True)
            want = [min(damerau_levenshtein(word, c, maxdist), maxdist + 1)
                    for c in vocab]
            assert got.tolist() == want, (word, maxdist)


def test_batch_unicode_and_bytes_matrix():
    vocab = ["héllo", "hello", "hèllo", "hallo", "χψω", "hé", "h"]
    got = levenshtein_batch("héllo", vocab, 2)
    want = [min(levenshtein("héllo", c, 2), 3) for c in vocab]
    assert got.tolist() == want
    # fixed-width BYTE matrix input (ascii word): same result as str list
    ascii_vocab = ["hello", "hallo", "help", "yelp", "hell"]
    arr = np.array(ascii_vocab, dtype="S8")
    got_b = levenshtein_batch("hello", arr, 2)
    got_u = levenshtein_batch("hello", ascii_vocab, 2)
    assert got_b.tolist() == got_u.tolist()
    # non-ascii word against a byte matrix falls back to char semantics
    got_nb = levenshtein_batch("héllo", np.array(["hello"], dtype="S8"), 2)
    assert got_nb.tolist() == [1]


def test_batch_chunking_boundary():
    vocab = ["word%04d" % i for i in range(300)] + ["word", "sword"]
    a = levenshtein_batch("word", vocab, 2, chunk=64)
    b = levenshtein_batch("word", vocab, 2, chunk=100000)
    assert a.tolist() == b.tolist()
    assert a[-2] == 0 and a[-1] == 1


def test_vectorized_wiring_preserves_results(ray_session, tmp_path):
    """Searcher.suggest / FuzzyTerm still give reference-parity results
    through the batched kernel (the full parity matrix lives in
    test_conformance; this guards the wiring)."""
    from whoosh_ray.functions.spelling import ListCorrector, suggestions

    lc = ListCorrector(sorted(["render", "rendered", "rend", "ponder",
                               "bender", "tender", "renders"]))
    assert lc.suggest("rende", limit=3, maxdist=1) == \
        ["rend", "render"]
    assert suggestions("rende", ["render", "fender", "xyz", "rende"],
                       maxdist=2) == ["render", "fender"]
