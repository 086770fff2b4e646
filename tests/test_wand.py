"""Pruned (block-max / MaxScore) top-k must equal the exhaustive path."""

import numpy as np
import pytest

from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Or, Searcher, Term
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("wand")
    (d / "src").mkdir()
    pq.write_table(generate_transcripts(n_convs=120, seed=1),
                   str(d / "src" / "p.parquet"))
    # small segments → many blocks/segments to exercise skipping
    build_index(str(d / "src"), str(d / "index"), transcripts_schema(),
                seg_size=100)
    return Searcher(str(d / "index"))


TERMS = ["deploy", "render", "cluster", "error", "november", "the", "batch",
         "alpha", "absent"]


def same(r1, r2):
    assert np.array_equal(r1.docids, r2.docids)
    np.testing.assert_array_equal(r1.scores, r2.scores)


def test_term_topk_matches_exhaustive(engine):
    for t in TERMS:
        for k in [1, 3, 10, 50]:
            same(engine.search(Term("text", t), limit=k),
                 engine.search_topk(Term("text", t), limit=k))


def test_term_topk_with_boost(engine):
    same(engine.search(Term("text", "deploy", boost=2.5), limit=10),
         engine.search_topk(Term("text", "deploy", boost=2.5), limit=10))


def test_or_topk_matches_exhaustive(engine):
    combos = [
        ["deploy", "render"],
        ["cluster", "error", "november"],
        ["deploy", "absent"],
        ["batch", "alpha", "render", "deploy", "cluster"],
    ]
    for words in combos:
        for k in [1, 5, 10, 25]:
            q = Or([Term("text", w) for w in words])
            same(engine.search(q, limit=k), engine.search_topk(q, limit=k))


def test_or_topk_with_term_boosts(engine):
    q = Or([Term("text", "deploy", boost=3.0), Term("text", "render")])
    same(engine.search(q, limit=10), engine.search_topk(q, limit=10))
