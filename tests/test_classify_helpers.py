"""Parity for the public classify-module helpers (reference
classify.py:208-395) and the ExpansionModel base."""

import random

import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.search import classify as myc


@pytest.fixture(scope="module")
def refc():
    load_whoosh_oracle()
    from whoosh import classify as wc
    return wc


def test_shingles(refc):
    for s, size in [("deploy the render", 2), ("abc", 3), ("ab", 2),
                    ("a", 2), ("", 2)]:
        assert sorted(myc.shingles(s, size)) == sorted(refc.shingles(s, size))


def test_simhash_and_hamming(refc):
    texts = ["deploy the render cluster now", "deploy the render cluster",
             "a completely different sentence", ""]
    for hashbits in (32, 24, 64):
        hs_mine = [myc.simhash(myc.shingles(t), hashbits) for t in texts]
        hs_ref = [refc.simhash(refc.shingles(t), hashbits) for t in texts]
        assert hs_mine == hs_ref
        for a in range(len(texts)):
            for b in range(len(texts)):
                assert (myc.hamming_distance(hs_mine[a], hs_mine[b], hashbits)
                        == refc.hamming_distance(hs_ref[a], hs_ref[b],
                                                 hashbits))
    # near-dup pair is closer than the unrelated pair
    h = [myc.simhash(myc.shingles(t), 64) for t in texts[:3]]
    assert (myc.hamming_distance(h[0], h[1], 64)
            < myc.hamming_distance(h[0], h[2], 64))


def test_kmeans(refc):
    data = [1.0, 1.2, 0.9, 5.0, 5.1, 4.9, 9.7, 10.0, 10.1, 1.05, 5.05]
    # explicit centers: fully deterministic on both sides
    labels_m, c_m = myc.kmeans(data, 3, centers=[1.0, 5.0, 10.0])
    labels_r, c_r = refc.kmeans(data, 3, centers=[1.0, 5.0, 10.0])
    assert list(labels_m) == list(labels_r)
    assert c_m == pytest.approx(c_r)
    # random init: same seed -> same sample -> same result
    random.seed(7)
    labels_m, c_m = myc.kmeans(data, 2)
    random.seed(7)
    labels_r, c_r = refc.kmeans(data, 2)
    assert list(labels_m) == list(labels_r)
    assert c_m == pytest.approx(c_r)


def test_variance_and_swin(refc):
    data = [3.0, 7.0, 7.0, 19.0, 24.0, 25.0]
    assert myc.two_pass_variance(data) == pytest.approx(
        refc.two_pass_variance(data))
    pairs = [(3.0, 1.0), (7.0, 2.0), (19.0, 0.5), (24.0, 1.5)]
    assert myc.weighted_incremental_variance(pairs) == pytest.approx(
        refc.weighted_incremental_variance(pairs))
    assert myc.swin(data, 6) == refc.swin(data, 6)
    assert myc.swin(data, 30) == refc.swin(data, 30)


def test_expansion_model_base(refc):
    m = myc.Bo1Model(10, 1000)
    r = refc.Bo1Model(10, 1000)
    assert isinstance(m, myc.ExpansionModel)
    assert m.mean_length == r.mean_length == 100
    z = myc.Bo2Model(0, 0)
    rz = refc.Bo2Model(0, 0)
    assert z.mean_length == rz.mean_length == 0
    with pytest.raises(NotImplementedError):
        myc.ExpansionModel(1, 1).normalizer(1, 1)
