"""The SipHash-in-SQL generator (__ray_entry__._siphash_sql) ==
pd.util.hash_array — the identity the minhash/simhash/fingerprint
DuckDB oracles stand on (pandas hash = splitmix64(SipHash-2-4(utf8)))."""

import duckdb
import numpy as np
import pandas as pd

import __ray_entry__ as entrymod


def _hash_words(words, key=b"0123456789123456", max_blocks=6):
    base = ("SELECT * FROM (VALUES "
            + ",".join(f"('{w}')" for w in words) + ") t(w)")
    sql = entrymod._siphash_sql(base, "w", ["w"], key=key,
                                max_blocks=max_blocks)
    return duckdb.connect().execute(sql).df().set_index("w")["h"]


def test_siphash_sql_matches_pandas_hash_array():
    words = ["spark", "hash", "a", "", "deploy render cluster",
             "x" * 7, "y" * 8, "z" * 9, "q" * 47,
             "tok3n 12ab longish-shingle text here ok"]
    got = _hash_words(words)
    want = pd.util.hash_array(np.asarray(words, dtype=object),
                              hash_key="0123456789123456",
                              categorize=False)
    for w, v in zip(words, want):
        assert int(got[w]) == int(v), w


def test_siphash_sql_alternate_key():
    words = ["alpha", "beta9", "gamma gamma"]
    got = _hash_words(words, key=b"6543216789123450", max_blocks=2)
    want = pd.util.hash_array(np.asarray(words, dtype=object),
                              hash_key="6543216789123450",
                              categorize=False)
    for w, v in zip(words, want):
        assert int(got[w]) == int(v), w


def test_block_boundary_lengths():
    """Lengths around the 8-byte block edges (7/8/9, 15/16/17) hit the
    tail-block and full-block paths in every combination."""
    words = ["k" * n for n in [1, 7, 8, 9, 15, 16, 17, 23, 24, 31]]
    got = _hash_words(words, max_blocks=4)
    want = pd.util.hash_array(np.asarray(words, dtype=object),
                              hash_key="0123456789123456",
                              categorize=False)
    for w, v in zip(words, want):
        assert int(got[w]) == int(v), len(w)
