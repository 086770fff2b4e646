"""Embedding-cosine near-dup: the exact pair scan must equal the
all-pairs brute force bit-for-bit in pair membership, and the LSH path
must be exact-precision with the recall its band math predicts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from whoosh_ray.pipelines.dedup import (embed_cosine_lsh,
                                        embed_cosine_pairs)


def _vectors(n=160, dim=32, n_dups=30, seed=5, noise=0.08):
    """n base vectors + n_dups perturbed copies (high-cosine near-dups
    of known provenance)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    src = rng.choice(n, n_dups, replace=False)
    dups = base[src] + noise * rng.standard_normal((n_dups, dim))
    mat = np.vstack([base, dups])
    ids = np.arange(len(mat), dtype=np.int64)
    return ids, mat


def _dataset(ids, mat):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([row.astype(np.float32).tolist()
                               for row in mat],
                              type=pa.list_(pa.float32())),
    }))


def _brute_pairs(ids, mat, threshold):
    v = np.stack([r.astype(np.float32).astype(np.float64) for r in mat])
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    c = v @ v.T
    iu = np.triu_indices(len(ids), 1)
    keep = c[iu] >= threshold
    return (pd.DataFrame({"id_a": ids[iu[0][keep]],
                          "id_b": ids[iu[1][keep]],
                          "cosine": c[iu][keep]})
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def test_exact_pairs_match_brute_force():
    ids, mat = _vectors()
    got = embed_cosine_pairs(_dataset(ids, mat), threshold=0.9)
    want = _brute_pairs(ids, mat, 0.9)
    assert got[["id_a", "id_b"]].values.tolist() == \
        want[["id_a", "id_b"]].values.tolist()
    np.testing.assert_allclose(got["cosine"], want["cosine"], rtol=1e-12)
    assert len(got) >= 25  # the planted near-dups are found


def test_exact_pairs_low_threshold_and_empty():
    ids, mat = _vectors(n=60, n_dups=0)
    got = embed_cosine_pairs(_dataset(ids, mat), threshold=0.3)
    want = _brute_pairs(ids, mat, 0.3)
    assert got[["id_a", "id_b"]].values.tolist() == \
        want[["id_a", "id_b"]].values.tolist()
    none = embed_cosine_pairs(_dataset(ids, mat), threshold=0.999)
    assert len(none) == 0 and list(none.columns) == \
        ["id_a", "id_b", "cosine"]


def test_lsh_exact_precision_and_recall():
    ids, mat = _vectors()
    got = embed_cosine_lsh(_dataset(ids, mat), threshold=0.9,
                           n_bands=16, band_bits=8, seed=23)
    want = _brute_pairs(ids, mat, 0.9)
    got_set = set(map(tuple, got[["id_a", "id_b"]].values.tolist()))
    want_set = set(map(tuple, want[["id_a", "id_b"]].values.tolist()))
    # precision is EXACT: every returned pair is a verified true pair
    assert got_set <= want_set
    for _, r in got.iterrows():
        w = want[(want.id_a == r.id_a) & (want.id_b == r.id_b)]
        np.testing.assert_allclose(r.cosine, w.cosine.iloc[0],
                                   rtol=1e-9)
    # recall per the band math: 1-(1-p^8)^16 ~ 0.99+ at cosine 0.9
    assert len(got_set) >= 0.9 * len(want_set) > 0


def test_lsh_exhaustive_bands_equal_exact():
    """band_bits=0 puts every vector in ONE bucket => candidates are
    all pairs and the LSH output must equal the exact scan — the
    embed_lsh_exhaustive oracle-gate shape (VERDICT r4 #5)."""
    ids, mat = _vectors(n=80, n_dups=20)
    got = embed_cosine_lsh(_dataset(ids, mat), threshold=0.9,
                           n_bands=1, band_bits=0, max_bucket=None)
    want = embed_cosine_pairs(_dataset(ids, mat), threshold=0.9)
    assert got[["id_a", "id_b"]].values.tolist() == \
        want[["id_a", "id_b"]].values.tolist()
    np.testing.assert_allclose(got["cosine"], want["cosine"], rtol=1e-9)
    assert len(got) >= 15


def test_embed_verify_distributed_matches_broadcast():
    """VERDICT r4 #1: above ``max_driver_pairs`` the candidate pairs
    stay a Dataset (hash-join verify); pair set and cosines must equal
    the broadcast path."""
    ids, mat = _vectors()
    want = embed_cosine_lsh(_dataset(ids, mat), threshold=0.9,
                            n_bands=16, band_bits=8, seed=23)
    got = embed_cosine_lsh(_dataset(ids, mat), threshold=0.9,
                           n_bands=16, band_bits=8, seed=23,
                           max_driver_pairs=1)
    assert isinstance(got, ray.data.Dataset)
    gdf = (got.to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    assert gdf[["id_a", "id_b"]].values.tolist() == \
        want[["id_a", "id_b"]].values.tolist()
    np.testing.assert_array_equal(gdf["cosine"].to_numpy(),
                                  want["cosine"].to_numpy())


def test_lsh_no_candidates():
    rng = np.random.default_rng(1)
    mat = rng.standard_normal((40, 32))
    ids = np.arange(40, dtype=np.int64)
    got = embed_cosine_lsh(_dataset(ids, mat), threshold=0.999,
                           n_bands=4, band_bits=16, seed=23)
    assert len(got) == 0
