"""IR query pipelines over the documents corpus + index cache.

These are the `queries()` entries of the driver contract: each builds
(or resumes — the manifest fingerprint makes rebuild a no-op) the index
for the given sf_dir, runs one engine operation, and returns an Arrow
table whose column names match the DuckDB oracle SQL exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher
from whoosh_ray.search.query import Query
from whoosh_ray.state.schema import documents_schema

_SEARCHERS: dict[str, Searcher] = {}


def documents_searcher(sf_dir: str) -> Searcher:
    """Build-or-resume the documents index for sf_dir; cache the searcher."""
    src = os.path.join(sf_dir, "documents.parquet")
    index_dir = os.path.join(
        "/tmp/whoosh_ray_cache",
        "documents-" + sf_dir.strip("/").replace("/", "_"))
    key = index_dir
    if key not in _SEARCHERS:
        manifest = build_index(src, index_dir, documents_schema(),
                               seg_size=2048, docid_col="doc_id")
        _SEARCHERS[key] = Searcher(index_dir, manifest)
    return _SEARCHERS[key]


def topk_table(searcher: Searcher, q: Query, limit: int = 10) -> pa.Table:
    """(rank, docid, score) for a query — the flagship top-k output."""
    r = searcher.search(q, limit=limit)
    return pa.table({
        "rank": pa.array(np.arange(len(r.docids)), type=pa.int64()),
        "docid": pa.array(r.docids, type=pa.int64()),
        "score": pa.array(r.scores, type=pa.float64()),
    })


def term_stats_table(searcher: Searcher, field: str = "text") -> pa.Table:
    """Full lexicon statistics: (term, df, total_tf) — validates the whole
    tokenize + groupby-aggregate path against SQL."""
    parts = []
    for seg in searcher.segments:
        t = seg.stats
        mask = pa.compute.equal(t["field"], field)
        parts.append(t.filter(mask).select(["term", "df", "sum_tf"]))
    all_t = pa.concat_tables(parts)
    df = all_t.to_pandas().groupby("term", sort=True, as_index=False).agg(
        df=("df", "sum"), total_tf=("sum_tf", "sum"))
    return pa.table({
        "term": pa.array(df["term"], type=pa.string()),
        "df": pa.array(df["df"], type=pa.int64()),
        "total_tf": pa.array(df["total_tf"], type=pa.int64()),
    })


def facet_count(searcher: Searcher, q: Query, facet_col: str) -> pa.Table:
    """Count matching docs per facet value (FacetCollector analogue,
    collectors.py:761-849 -> groupby aggregate)."""
    r = searcher.search(q, limit=None)
    stored = searcher.stored(r.docids, columns=[facet_col])
    pdf = stored.to_pandas().groupby(facet_col, sort=True, as_index=False).agg(
        n=("docid", "count"))
    return pa.table({facet_col: pa.array(pdf[facet_col]),
                     "n": pa.array(pdf["n"], type=pa.int64())})


def sorted_by(searcher: Searcher, q: Query, key_col: str, limit: int = 20,
              descending: bool = True) -> pa.Table:
    """Matches sorted by a stored column (SortingCollector analogue,
    collectors.py:535-583), tie-broken by docid ascending."""
    r = searcher.search(q, limit=None)
    stored = searcher.stored(r.docids, columns=[key_col])
    pdf = stored.to_pandas().sort_values(
        [key_col, "docid"], ascending=[not descending, True],
        kind="mergesort").head(limit)
    return pa.Table.from_pandas(pdf[["docid", key_col]], preserve_index=False)


def collapse_best_per_key(searcher: Searcher, q: Query, key_col: str) -> pa.Table:
    """Best-scoring hit per key (CollapseCollector analogue,
    collectors.py:850-1005): one row per key, (score desc, docid asc)."""
    r = searcher.search(q, limit=None)
    stored = searcher.stored(r.docids, columns=[key_col]).to_pandas()
    scores = pd.Series(r.scores, index=r.docids)
    stored["score"] = stored["docid"].map(scores)
    stored = stored.sort_values(["score", "docid"], ascending=[False, True],
                                kind="mergesort")
    best = stored.groupby(key_col, sort=True, as_index=False).head(1)
    best = best.sort_values(key_col)
    return pa.table({
        key_col: pa.array(best[key_col]),
        "docid": pa.array(best["docid"], type=pa.int64()),
        "score": pa.array(best["score"], type=pa.float64()),
    })
