"""Driver-emulating correctness check: run every queries() entry and its
oracle SQL side by side, compare row count + schema + order-insensitive
value hash (sorted columns, sorted rows), like CORRECTNESS_r{N}.json.

Usage: python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd
import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(pd.util.hash_pandas_object(df[c], index=False).to_numpy().tobytes())
    return h.hexdigest()[:16]


def main(sf_dir: str):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            mine = canonical(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: engine error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        secs = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(mine)} rows  ({secs:.1f}s)")
            n_pass += 1
            continue
        try:
            ref = canonical(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} vs {len(ref)}")
        if list(mine.columns) != list(ref.columns):
            problems.append(f"cols {list(mine.columns)} vs {list(ref.columns)}")
        if not problems:
            hm, hr = value_hash(mine), value_hash(ref)
            if hm != hr:
                problems.append("value-hash mismatch")
                merged = mine.compare(ref) if mine.shape == ref.shape else None
                if merged is not None and len(merged):
                    print(merged.head(5))
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}  ({secs:.1f}s)")
            print("  mine:", mine.head(3).to_dict("records"))
            print("  ref :", ref.head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(mine)} rows hash-identical  ({secs:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return n_fail


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    try:
        rc = main(sf)
    finally:
        ray.shutdown()
    sys.exit(1 if rc else 0)
