"""Distributed query paths must match the local searcher exactly."""

import numpy as np
import pytest

from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import And, Or, Phrase, Prefix, Searcher, Term
from whoosh_ray.search.dist import FanoutSearcher, batch_search
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("dist")
    (d / "src").mkdir()
    pq.write_table(generate_transcripts(n_convs=80, seed=3),
                   str(d / "src" / "p.parquet"))
    build_index(str(d / "src"), str(d / "index"), transcripts_schema(),
                seg_size=64)
    return str(d / "index")


QUERIES = [
    Term("text", "deploy"),
    And([Term("text", "deploy"), Term("text", "render")]),
    Or([Term("text", "cluster"), Term("text", "error")]),
    Phrase("text", ["deploy", "render"]),
    Prefix("text", "rend"),
    And([Term("text", "deploy"), Term("role", "user")]),
]


def test_batch_search_matches_local(index_dir):
    local = Searcher(index_dir)
    out = batch_search(index_dir, QUERIES, limit=10, concurrency=2)
    pdf = out.to_pandas()
    for i, q in enumerate(QUERIES):
        r = local.search(q, limit=10)
        sub = pdf[pdf["query_id"] == i]
        assert sub["docid"].tolist() == r.docids.tolist()
        np.testing.assert_array_equal(sub["score"].to_numpy(), r.scores)


def test_fanout_matches_local(index_dir):
    local = Searcher(index_dir)
    fan = FanoutSearcher(index_dir, num_shards=3)
    for q in QUERIES:
        r1 = local.search(q, limit=10)
        r2 = fan.search(q, limit=10)
        assert r1.docids.tolist() == r2.docids.tolist(), q
        np.testing.assert_array_equal(r1.scores, r2.scores)


def test_fanout_djm_andnot_boundary_handoff(index_dir):
    """DisjunctionMax / AndNot now fan out with boundary-state handoff:
    results must be IDENTICAL to the global evaluation (whose
    cross-segment cursor-leak / first-doc-escape quirks are themselves
    whoosh-oracle-pinned)."""
    from whoosh_ray.search import AndNot, DisjunctionMax, Or, Searcher, Term
    from whoosh_ray.search.dist import FanoutSearcher

    local = Searcher(index_dir)
    fan = FanoutSearcher(index_dir, num_shards=3)
    cases = [
        DisjunctionMax([Term("text", "deploy"), Term("text", "render")]),
        DisjunctionMax([Term("text", "cluster"), Term("text", "error"),
                        Term("text", "deploy")], boost=1.5),
        DisjunctionMax([Or([Term("text", "deploy"), Term("text", "error")]),
                        Term("text", "render")]),
        AndNot(Term("text", "deploy"), Term("text", "render")),
        AndNot(Term("text", "render"), Term("text", "deploy")),
        AndNot(Or([Term("text", "deploy"), Term("text", "cluster")]),
               Term("text", "error")),
    ]
    for q in cases:
        for limit in (10, 100, None):
            a = local.search(q, limit=limit)
            b = fan.search(q, limit=limit)
            assert a.docids.tolist() == b.docids.tolist(), (q, limit)
            np.testing.assert_allclose(a.scores, b.scores, rtol=1e-12,
                                       err_msg=str(q))


def test_fanout_nested_parent(index_dir):
    """NestedParent fans out via the last-parent boundary handoff:
    identical to the global evaluation incl. blocks spanning shard
    boundaries and the per_parent_limit global rank cut."""
    from whoosh_ray.search import Or, Searcher, Term
    from whoosh_ray.search.dist import FanoutSearcher
    from whoosh_ray.search.nested import NestedParent

    local = Searcher(index_dir)
    fan = FanoutSearcher(index_dir, num_shards=3)
    cases = [
        NestedParent(Term("role", "user"), Term("text", "deploy")),
        NestedParent(Term("role", "user"),
                     Or([Term("text", "deploy"), Term("text", "render")])),
        NestedParent(Term("role", "user"), Term("text", "deploy"),
                     per_parent_limit=2),
        NestedParent(Term("role", "user"), Term("text", "deploy"),
                     per_parent_limit=1),
    ]
    for q in cases:
        for limit in (10, None):
            a = local.search(q, limit=limit)
            b = fan.search(q, limit=limit)
            assert a.docids.tolist() == b.docids.tolist(), (q.per_parent_limit, limit)
            np.testing.assert_allclose(a.scores, b.scores, rtol=1e-12)


def test_batch_search_filter_mask(index_dir):
    """batch_search ships shared roaring filter/mask blobs through the
    actor constructor; per-query results equal the local filtered
    search."""
    from whoosh_ray.functions.idsets import RoaringIdSet

    local = Searcher(index_dir)
    allow = local.search(Term("role", "user"), limit=None).docids
    deny = RoaringIdSet(allow[1::3])
    qs = [Term("text", "deploy"),
          Or([Term("text", "cluster"), Term("text", "error")]),
          And([Term("text", "deploy"), Term("text", "render")])]
    out = batch_search(index_dir, qs, limit=7, concurrency=2,
                       filter=RoaringIdSet(allow), mask=deny)
    for i, q in enumerate(qs):
        want = local.search(q, limit=7, filter=allow.tolist(), mask=deny)
        part = out.filter(
            np.equal(out["query_id"].to_numpy(), i)).to_pydict()
        assert part["docid"] == want.docids.tolist(), q
        np.testing.assert_allclose(part["score"], want.scores, rtol=1e-12)


def test_fanout_filter_mask(index_dir):
    """filter=/mask= on the fan-out path: roaring blobs broadcast to
    the shards (plain queries, applied pre-cut) or applied driver-side
    (quirk fan-outs) — identical to the local FilterCollector
    semantics for every coercible argument kind."""
    from whoosh_ray.functions.idsets import RoaringIdSet
    from whoosh_ray.search.dist import FanoutSearcher
    from whoosh_ray.search.query import AndNot
    from whoosh_ray.search.nested import NestedParent

    local = Searcher(index_dir)
    fan = FanoutSearcher(index_dir, num_shards=3)
    base = Or([Term("text", "deploy"), Term("text", "cluster")])
    allow_q = Term("role", "user")
    allow_ids = local.search(allow_q, limit=None).docids
    deny_set = RoaringIdSet(allow_ids[::2])
    cases = [
        (base, dict(filter=allow_q)),
        (base, dict(filter=RoaringIdSet(allow_ids))),
        (base, dict(filter=allow_ids.tolist(), mask=deny_set)),
        (base, dict(mask=deny_set)),
        (AndNot(base, Term("text", "error")), dict(filter=allow_q)),
        (NestedParent(Term("role", "user"), Term("text", "deploy")),
         dict(mask=deny_set)),
    ]
    for q, kw in cases:
        for limit in (5, None):
            a = local.search(q, limit=limit, **kw)
            b = fan.search(q, limit=limit, **kw)
            assert a.docids.tolist() == b.docids.tolist(), (q, kw, limit)
            np.testing.assert_allclose(a.scores, b.scores, rtol=1e-12)


def test_fanout_nested_parent_score_fn(index_dir):
    """Custom score_fn NestedParent fans out too: shards ship each
    parent's docid-ordered child-score list and the driver applies the
    user's reduction — identical to the global evaluation (reference
    nested.py:128-145 semantics)."""
    import statistics

    from whoosh_ray.search import Or, Searcher, Term
    from whoosh_ray.search.dist import FanoutSearcher
    from whoosh_ray.search.nested import NestedParent

    local = Searcher(index_dir)
    fan = FanoutSearcher(index_dir, num_shards=3)
    cases = [
        NestedParent(Term("role", "user"), Term("text", "deploy"),
                     score_fn=max),
        NestedParent(Term("role", "user"),
                     Or([Term("text", "deploy"), Term("text", "render")]),
                     score_fn=statistics.mean),
        NestedParent(Term("role", "user"), Term("text", "deploy"),
                     per_parent_limit=2, score_fn=min),
    ]
    for q in cases:
        for limit in (10, None):
            a = local.search(q, limit=limit)
            b = fan.search(q, limit=limit)
            assert a.docids.tolist() == b.docids.tolist(), (q.score_fn, limit)
            np.testing.assert_allclose(a.scores, b.scores, rtol=1e-12)


def test_fanout_nested_children(index_dir):
    """NestedChildren fans out by counting ranges open at each shard
    edge; identical to the global evaluation incl. the duplicate-
    emission quirk."""
    from whoosh_ray.search import Searcher, Term
    from whoosh_ray.search.dist import FanoutSearcher
    from whoosh_ray.search.nested import NestedChildren

    local = Searcher(index_dir)
    for shards in (2, 3, 5):
        fan = FanoutSearcher(index_dir, num_shards=shards)
        for q in [NestedChildren(Term("role", "user"),
                                 Term("text", "deploy")),
                  NestedChildren(Term("role", "user"),
                                 Term("text", "cluster"), boost=2.0),
                  NestedChildren(Term("role", "tool"),
                                 Term("text", "render"))]:
            for limit in (10, None):
                a = local.search(q, limit=limit)
                b = fan.search(q, limit=limit)
                assert a.docids.tolist() == b.docids.tolist(), (shards, limit)
                np.testing.assert_allclose(a.scores, b.scores)


def test_fanout_nested_children_boundary_parent(tmp_path):
    """Engineered edge: the match sits on the last doc of a shard and a
    PARENT sits exactly on the next shard's first doc — that parent doc
    is still a child of the open range (strictly-greater closer)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.build import build_index
    from whoosh_ray.search import Searcher, Term
    from whoosh_ray.search.dist import FanoutSearcher
    from whoosh_ray.search.nested import NestedChildren
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    roles = ["p", "c", "c", "c", "p", "c", "p", "c"]  # parent at docid 4
    texts = ["x", "x", "x", "match", "x", "x", "x", "x"]  # match at 3
    t = pa.table({
        "rowid": pa.array(range(8), type=pa.int64()),
        "role": pa.array(roles),
        "text": pa.array(texts),
    })
    (tmp_path / "src").mkdir()
    pq.write_table(t, str(tmp_path / "src" / "p.parquet"))
    schema = IndexSchema(fields=(FieldSpec.text("text"),
                                 FieldSpec.id("role")))
    build_index(str(tmp_path / "src"), str(tmp_path / "ix"), schema,
                seg_size=4, docid_col="rowid")
    local = Searcher(str(tmp_path / "ix"))
    fan = FanoutSearcher(str(tmp_path / "ix"), num_shards=2)
    q = NestedChildren(Term("role", "p"), Term("text", "match"))
    a = local.search(q, limit=None)
    b = fan.search(q, limit=None)
    # global semantics: range (3, first parent > 4) = docs {4, 5}
    assert a.docids.tolist() == [4, 5]
    assert b.docids.tolist() == a.docids.tolist()


def test_query_pool_matches_batch_search(ray_session, index_dir):
    """Persistent QueryPool == per-call batch_search, across reuse."""
    from whoosh_ray.search import And, Or, Phrase, Prefix, Term
    from whoosh_ray.search.dist import QueryPool, batch_search

    qset = [Term("text", "deploy"),
            And([Term("text", "deploy"), Term("text", "render")]),
            Or([Term("text", "cluster"), Term("text", "error")]),
            Phrase("text", ["deploy", "render"]),
            Prefix("text", "rend")]
    want = batch_search(index_dir, qset, limit=10).to_pandas()
    with QueryPool(index_dir, concurrency=2) as pool:
        for _ in range(2):  # reuse across calls
            got = pool.search_batch(qset, limit=10).to_pandas()
            assert got.reset_index(drop=True).equals(
                want.reset_index(drop=True))
        # a different batch through the same warm actors
        one = pool.search_batch([Term("text", "november")], limit=5)
        ref = batch_search(index_dir, [Term("text", "november")], limit=5)
        assert one.to_pandas().equals(ref.to_pandas())


def test_query_pool_filter_mask(ray_session, index_dir):
    """QueryPool's filter=/mask= roaring blobs behave like
    batch_search's (one deserialize per actor)."""
    from whoosh_ray.search import Or, Term
    from whoosh_ray.search.dist import QueryPool, batch_search
    from whoosh_ray.search.searcher import Searcher

    s = Searcher(index_dir)
    allow = s.search(Term("role", "user"), limit=None).docid_set()
    deny = s.search(Term("text", "render"), limit=None).docid_set()
    qs = [Term("text", "deploy"),
          Or([Term("text", "cluster"), Term("text", "error")])]
    want = batch_search(index_dir, qs, limit=10,
                        filter=allow, mask=deny).to_pandas()
    with QueryPool(index_dir, concurrency=2,
                   filter=allow, mask=deny) as pool:
        got = pool.search_batch(qs, limit=10).to_pandas()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_batch_search_pool_cache_and_invalidation(ray_session, tmp_path):
    """batch_search reuses ONE warm pool across calls (VERDICT r4 #2)
    and rebuilds it when the index mutates — including deletes, which
    do not bump the manifest generation."""
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.mutate import delete_by_term
    from whoosh_ray.search import dist

    (tmp_path / "src").mkdir()
    pq.write_table(generate_transcripts(n_convs=40, seed=9),
                   str(tmp_path / "src" / "p.parquet"))
    ix = str(tmp_path / "index")
    build_index(str(tmp_path / "src"), ix, transcripts_schema(),
                seg_size=256)
    q = [Term("text", "deploy")]
    before = batch_search(ix, q, limit=None).to_pandas()
    key = (ix, 4, None, None)
    pool1 = dist._POOL_CACHE[key][2]
    again = batch_search(ix, q, limit=None).to_pandas()
    assert dist._POOL_CACHE[key][2] is pool1  # same warm actors
    assert again.equals(before)
    # one-shot mode: results identical, cache untouched
    oneshot = batch_search(ix, q, limit=None, reuse_pool=False).to_pandas()
    assert oneshot.equals(before)
    assert dist._POOL_CACHE[key][2] is pool1
    # a tombstone write must invalidate the cached pool
    n = delete_by_term(ix, "text", "deploy")
    assert n > 0
    from whoosh_ray.state.segment import SegmentReader
    SegmentReader._STATS_CACHE.clear()
    after = batch_search(ix, q, limit=None).to_pandas()
    assert dist._POOL_CACHE[key][2] is not pool1  # rebuilt
    assert len(after) == 0
    dist.clear_pool_cache()
