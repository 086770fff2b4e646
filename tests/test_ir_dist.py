"""Distributed facet/sort/collapse/term-stats plans (VERDICT r1 #4/#5):
results must equal the naive driver-side computation while no full match
set is ever collected on the driver."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from whoosh_ray.pipelines import ir
from whoosh_ray.search import Term

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher():
    return ir.documents_searcher(SF)


def _driver_facet(s, q, col):
    r = s.search(q, limit=None)
    stored = s.stored(r.docids, columns=[col])
    pdf = stored.to_pandas().groupby(col, sort=True, as_index=False).agg(
        n=("docid", "count"))
    return pdf


def test_facet_matches_driver(searcher):
    q = Term("text", "spark")
    got = ir.facet_count(searcher, q, "source").to_pandas()
    want = _driver_facet(searcher, q, "source")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_sorted_by_matches_driver(searcher):
    q = Term("text", "spark")
    got = ir.sorted_by(searcher, q, "n_chars", limit=20).to_pandas()
    r = searcher.search(q, limit=None)
    stored = searcher.stored(r.docids, columns=["n_chars"])
    want = stored.to_pandas().sort_values(
        ["n_chars", "docid"], ascending=[False, True],
        kind="mergesort").head(20)[["docid", "n_chars"]]
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_collapse_matches_driver(searcher):
    q = Term("text", "spark")
    got = ir.collapse_best_per_key(searcher, q, "lang").to_pandas()
    r = searcher.search(q, limit=None)
    stored = searcher.stored(r.docids, columns=["lang"]).to_pandas()
    scores = pd.Series(r.scores, index=r.docids)
    stored["score"] = stored["docid"].map(scores)
    stored = stored.sort_values(["score", "docid"], ascending=[False, True],
                                kind="mergesort")
    want = stored.groupby("lang", sort=True, as_index=False).head(1)
    want = want.sort_values("lang")[["lang", "docid", "score"]]
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_term_stats_matches_driver(searcher):
    got = ir.term_stats_table(searcher).to_pandas()
    parts = []
    for seg in searcher.segments:
        t = seg.stats
        mask = pa.compute.equal(t["field"], "text")
        parts.append(t.filter(mask).select(["term", "df", "sum_tf"]))
    all_t = pa.concat_tables(parts)
    want = all_t.to_pandas().groupby("term", sort=True, as_index=False).agg(
        df=("df", "sum"), total_tf=("sum_tf", "sum"))
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_partials_bounded(searcher):
    """Row-count guard: the partial-aggregate stage ships at most
    n_segments * limit rows for sort, and never the full match set."""
    q = Term("text", "spark")
    n_seg = len(searcher.segments)
    n_matches = len(searcher.search(q, limit=None).docids)
    part = ir._segment_op_ds(searcher, q, "sort", "n_chars", limit=5)
    n_rows = part.count()
    assert n_rows <= n_seg * 5
    assert n_matches > n_rows  # the match set itself is strictly larger


def test_nondecomposable_rejected(searcher):
    from whoosh_ray.search.query import DisjunctionMax

    with pytest.raises(ValueError):
        ir._segment_op_ds(searcher,
                          DisjunctionMax([Term("text", "spark")]),
                          "facet", "lang")


def test_collapse_top_matches_driver(searcher):
    """collapse_top_per_key == the driver computation for both orders
    (score desc default; order_col asc), at limits 1 and 3; limit=1
    default-order equals collapse_best_per_key."""
    q = Term("text", "spark")
    r = searcher.search(q, limit=None)
    stored = searcher.stored(r.docids, columns=["lang", "n_chars"]).to_pandas()
    scores = pd.Series(r.scores, index=r.docids)
    stored["score"] = stored["docid"].map(scores)

    for limit, order_col in [(1, None), (3, None), (2, "n_chars")]:
        got = ir.collapse_top_per_key(searcher, q, "lang", limit=limit,
                                      order_col=order_col).to_pandas()
        if order_col:
            sdf = stored.sort_values([order_col, "docid"], kind="mergesort")
        else:
            sdf = stored.sort_values(["score", "docid"],
                                     ascending=[False, True],
                                     kind="mergesort")
        want = sdf.groupby("lang", sort=False, as_index=False).head(limit)
        if order_col:
            want = want.sort_values(["lang", order_col, "docid"])
            want = want[["lang", "docid", order_col, "score"]]
        else:
            want = want.sort_values(["lang", "score", "docid"],
                                    ascending=[True, False, True],
                                    kind="mergesort")
            want = want[["lang", "docid", "score"]]
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      want.reset_index(drop=True),
                                      check_dtype=False)
    one = ir.collapse_top_per_key(searcher, q, "lang", limit=1).to_pandas()
    best = ir.collapse_best_per_key(searcher, q, "lang").to_pandas()
    pd.testing.assert_frame_equal(one.reset_index(drop=True),
                                  best.reset_index(drop=True),
                                  check_dtype=False)
