"""Segment-merge equivalence (FIXTURES.md F8, mirroring the reference's
serial-vs-multiprocess identity tests, tests/test_mpwriter.py:105-272):
merging partition segments must not change term stats or any query
result."""

import numpy as np
import pytest

from whoosh_ray.pipelines.build import build_index
from whoosh_ray.pipelines.merge import merge_segments, plan_merge_small
from whoosh_ray.search import And, Or, Phrase, Prefix, Searcher, Term
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.manifest import SegmentMeta
from whoosh_ray.state.schema import transcripts_schema

QUERIES = [
    Term("text", "deploy"),
    And([Term("text", "deploy"), Term("text", "render")]),
    Or([Term("text", "cluster"), Term("text", "error")]),
    Phrase("text", ["deploy", "render"]),
    Prefix("text", "rend"),
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("merge")
    (d / "src").mkdir()
    pq.write_table(generate_transcripts(n_convs=60, seed=9),
                   str(d / "src" / "p.parquet"))
    build_index(str(d / "src"), str(d / "index"), transcripts_schema(),
                seg_size=64)
    return str(d / "index")


def snapshot(index_dir):
    s = Searcher(index_dir)
    results = {}
    for i, q in enumerate(QUERIES):
        r = s.search(q, limit=None)
        results[i] = (r.docids.tolist(), r.scores.tolist())
    stats = {
        "dc": s.doc_count_all,
        "avgfl": s.avg_field_length("text"),
        "df_deploy": s.doc_frequency("text", "deploy"),
        "ti": s.global_term_info("text", "render"),
    }
    return results, stats


def test_optimize_merge_preserves_everything(built):
    before_r, before_s = snapshot(built)
    m = merge_segments(built, policy="OPTIMIZE")
    assert len(m.segments) == 1
    after_r, after_s = snapshot(built)
    assert before_s == after_s
    for k in before_r:
        assert before_r[k][0] == after_r[k][0]
        np.testing.assert_array_equal(before_r[k][1], after_r[k][1])
    # stored-field fetch still resolves docids through the merged range
    s = Searcher(built)
    r = s.search(Term("text", "deploy"), limit=5)
    t = r.to_arrow(columns=["conv_id", "turn_idx"])
    assert t.num_rows == len(r.docids)


def test_merge_small_policy_shape():
    # Reference parity (writing.py:71-104): merge point = first i > 3
    # with running total < fib(i+5); a big segment inside the scanned
    # prefix blocks the fold entirely.
    def metas_of(counts):
        return [SegmentMeta(seg_id=i, docid_base=i * 100, doc_count=c,
                            lineage={"docid_range": [i * 100, i * 100 + 100]})
                for i, c in enumerate(counts)]

    # total at i=4 includes the 500+1000 segments -> never under fib -> no plan
    assert plan_merge_small(metas_of([1, 1, 2, 500, 1000])) == []
    # five tiny adjacent segments fold together, the big one stays
    plan = plan_merge_small(metas_of([1, 1, 1, 1, 1, 1000]))
    assert plan == [[0, 1, 2, 3, 4]]

    # fib CONVENTION parity (util/__init__.py:104-112: fib(1)=1,
    # fib(2)=2, so the i=4 threshold is fib(9)=55, NOT standard F(9)=34):
    # a 50-doc running total at i=4 is under 55 and folds
    plan = plan_merge_small(metas_of([10, 10, 10, 10, 10, 1000]))
    assert plan == [[0, 1, 2, 3, 4]]
    # ...and 60 is not
    assert plan_merge_small(metas_of([12, 12, 12, 12, 12, 1000])) == []


def test_merge_small_docid_adjacency():
    # the fold set must split at docid-range gaps so merged ranges never
    # overlap a survivor's range
    counts = [1, 1000, 1, 1, 1, 1]
    metas = [SegmentMeta(seg_id=i, docid_base=i * 100, doc_count=c,
                         lineage={"docid_range": [i * 100, i * 100 + 100]})
             for i, c in enumerate(counts)]
    plan = plan_merge_small(metas)
    assert plan == [[2, 3, 4, 5]]


def test_merge_expunges_deletes(tmp_path):
    """ADVICE r1: deleted docs must not be resurrected by a merge; stats
    (doc_count, avgfl, df) must stop counting them after the rewrite."""
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.mutate import delete_docids

    (tmp_path / "src").mkdir()
    pq.write_table(generate_transcripts(n_convs=60, seed=9),
                   str(tmp_path / "src" / "p.parquet"))
    build_index(str(tmp_path / "src"), str(tmp_path / "index"),
                transcripts_schema(), seg_size=64)
    ix = str(tmp_path / "index")

    s = Searcher(ix)
    r = s.search(Term("text", "deploy"), limit=None)
    before_hits = len(r.docids)
    victims = [int(d) for d in r.docids[:5]]
    n_all_before = s.doc_count_all
    delete_docids(ix, victims)

    s = Searcher(ix)
    r = s.search(Term("text", "deploy"), limit=None)
    assert len(r.docids) == before_hits - 5
    # pre-merge: stats intentionally unchanged (reference parity)
    assert s.doc_count_all == n_all_before

    m = merge_segments(ix, policy="OPTIMIZE")
    assert len(m.segments) == 1
    s = Searcher(ix)
    r = s.search(Term("text", "deploy"), limit=None)
    assert len(r.docids) == before_hits - 5
    assert not set(victims) & set(r.docids.tolist())
    # post-merge: tombstones expunged from stats
    assert s.doc_count_all == n_all_before - 5
    assert s.doc_frequency("text", "deploy") == before_hits - 5
    # no stale tombstone file in the merged segment
    import os
    seg = m.segments[0]
    from whoosh_ray.state.manifest import seg_dirname
    assert not os.path.exists(os.path.join(ix, "segments",
                                           seg_dirname(seg.seg_id),
                                           "deletes.json"))
    # exact field_lengths shrank consistently (avgfl = totals / doc_count)
    assert s.avg_field_length("text") > 0


def test_hierarchical_optimize(tmp_path):
    import pyarrow.parquet as pq

    (tmp_path / "src").mkdir()
    pq.write_table(generate_transcripts(n_convs=60, seed=9),
                   str(tmp_path / "src" / "p.parquet"))
    build_index(str(tmp_path / "src"), str(tmp_path / "index"),
                transcripts_schema(), seg_size=32)
    ix = str(tmp_path / "index")
    before_r, before_s = snapshot(ix)
    m = merge_segments(ix, policy="OPTIMIZE", target_segments=4,
                       concurrency=4)
    assert 1 < len(m.segments) <= 5
    after_r, after_s = snapshot(ix)
    assert before_s == after_s
    for k in before_r:
        assert before_r[k] == after_r[k]


def test_merge_crash_between_rename_and_retire(tmp_path):
    """ADVICE r1: a crash AFTER the merged segment is renamed into place
    but BEFORE the inputs are retired must not lose or double-count
    documents — the reseal drops segments named in a survivor's
    merged_from lineage."""
    import shutil as _sh

    import pyarrow.parquet as pq

    import whoosh_ray.pipelines.merge as M

    (tmp_path / "src").mkdir()
    pq.write_table(generate_transcripts(n_convs=60, seed=9),
                   str(tmp_path / "src" / "p.parquet"))
    build_index(str(tmp_path / "src"), str(tmp_path / "index"),
                transcripts_schema(), seg_size=64)
    ix = str(tmp_path / "index")
    before_r, before_s = snapshot(ix)

    from whoosh_ray.state.manifest import read_manifest

    manifest = read_manifest(ix)
    plan = M.plan_optimize(manifest.segments, 1)
    next_id = max(m.seg_id for m in manifest.segments) + 1
    worker = M.MergeWorker(ix)

    orig_rmtree = M.shutil.rmtree

    def crashing_rmtree(path, **kw):
        # the merged output landed (os.replace already ran); "crash"
        # before any input dir is retired
        if "/segments/seg=" in str(path):
            return
        return orig_rmtree(path, **kw)

    M.shutil.rmtree = crashing_rmtree
    try:
        worker._merge(plan[0], next_id)
    finally:
        M.shutil.rmtree = orig_rmtree

    # both the merged segment AND every input dir now exist on disk
    import glob

    assert len(glob.glob(ix + "/segments/seg=*")) == len(plan[0]) + 1

    # recovery = any reseal (here: a MERGE_SMALL call with no plan)
    m = M.merge_segments(ix, policy="MERGE_SMALL")
    assert [s.seg_id for s in m.segments] == [next_id]
    after_r, after_s = snapshot(ix)
    assert before_s == after_s
    for k in before_r:
        assert before_r[k][0] == after_r[k][0]
        np.testing.assert_array_equal(before_r[k][1], after_r[k][1])


def test_resume_build_after_merge_no_duplicates(tmp_path):
    """ADVICE r2 (high): build -> OPTIMIZE merge -> build(resume=True)
    must reconcile by docid range (a merged segment's fresh seg id never
    equals docid // seg_size) — no re-indexed rows, no duplicate hits."""
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(generate_transcripts(n_convs=60, seed=9),
                   str(src / "p.parquet"))
    ix = str(tmp_path / "index")
    m1 = build_index(str(src), ix, transcripts_schema(), seg_size=64)
    before_r, before_s = snapshot(ix)

    merge_segments(ix, policy="OPTIMIZE")
    m3 = build_index(str(src), ix, transcripts_schema(), seg_size=64)
    assert m3.doc_count_all == m1.doc_count_all
    assert m3.settings["resumed_segments"] == len(m3.segments) == 1
    after_r, after_s = snapshot(ix)
    assert before_s["dc"] == after_s["dc"]
    for k in before_r:
        assert before_r[k][0] == after_r[k][0]
        assert len(after_r[k][0]) == len(set(after_r[k][0]))


def test_resume_after_partial_merge(tmp_path):
    """Mixed manifest (merged + unmerged segments) resumes cleanly."""
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(generate_transcripts(n_convs=60, seed=9),
                   str(src / "p.parquet"))
    ix = str(tmp_path / "index")
    m1 = build_index(str(src), ix, transcripts_schema(), seg_size=64)
    assert len(m1.segments) > 3
    merge_segments(ix, policy="OPTIMIZE", target_segments=3)
    m3 = build_index(str(src), ix, transcripts_schema(), seg_size=64)
    assert m3.doc_count_all == m1.doc_count_all
    assert m3.settings["resumed_segments"] == len(m3.segments)
    ranges = sorted(m.docid_range() for m in m3.segments)
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert b0 >= a1  # pairwise disjoint


def test_merge_reseal_does_not_resurrect_stale_dirs(tmp_path):
    """ADVICE r2 (medium): a segment dir excluded from the sealed
    manifest (e.g. stale after a source change) must not be resurrected
    by a later merge_segments reseal with an overlapping docid range."""
    import json
    import os

    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(generate_transcripts(n_convs=60, seed=9),
                   str(src / "p.parquet"))
    ix = str(tmp_path / "index")
    m1 = build_index(str(src), ix, transcripts_schema(), seg_size=64)
    dc = m1.doc_count_all

    # plant a stale committed dir overlapping segment 0's range, with a
    # bogus fingerprint (as a crashed/abandoned run would leave behind)
    segroot = os.path.join(ix, "segments")
    real0 = os.path.join(segroot, "seg=00000")
    stale = os.path.join(segroot, "seg=09999")
    import shutil

    shutil.copytree(real0, stale)
    mj = json.load(open(os.path.join(stale, "meta.json")))
    mj["seg_id"] = 9999
    mj["lineage"]["fingerprint"] = "bogus"
    json.dump(mj, open(os.path.join(stale, "meta.json"), "w"))

    # a rebuild excludes the stale dir from its seal AND retires it
    m2 = build_index(str(src), ix, transcripts_schema(), seg_size=64)
    assert m2.doc_count_all == dc
    assert not os.path.exists(stale)

    # and even if one appears between build and merge, the reseal's
    # disjointness sweep drops it rather than double-counting
    shutil.copytree(real0, stale)
    json.dump(mj, open(os.path.join(stale, "meta.json"), "w"))
    m3 = merge_segments(ix, policy="OPTIMIZE")
    assert m3.doc_count_all == dc
    ranges = sorted(m.docid_range() for m in m3.segments)
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert b0 >= a1


def test_expunge_prunes_decodes_by_docid_range(monkeypatch):
    """_expunge must not decode posting blobs for terms whose
    [min_docid, max_docid] cannot intersect the tombstone set — and the
    pruned result must equal the unpruned one exactly."""
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines import merge as merge_mod
    from whoosh_ray.state import codec
    from whoosh_ray.stages.fused_writer import FusedSegmentWriter  # noqa: F401

    # build one real segment's tables via the normal build path
    import tempfile, os, glob, json
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(generate_transcripts(n_convs=40, seed=13),
                       os.path.join(d, "p.parquet"))
        build_index(d, os.path.join(d, "ix"), transcripts_schema(),
                    seg_size=10_000)  # one fat segment
        segdir = glob.glob(os.path.join(d, "ix", "segments", "seg=*"))[0]
        from whoosh_ray.state.segment import read_terms_file
        terms = read_terms_file(segdir)  # blob columns rehydrated
        docs = pq.read_table(os.path.join(segdir, "docs.parquet"))

    # delete ONE doc: most terms' ranges can't contain it
    victim = int(docs["docid"][len(docs) // 2].as_py())
    deletes = np.array([victim], dtype=np.int64)

    calls = {"n": 0}
    real_reader = codec.BlobReader

    class CountingReader(real_reader):
        def __init__(self, blob):
            calls["n"] += 1
            super().__init__(blob)

    t1, d1, fl1, n1 = merge_mod._expunge(terms, docs, deletes)
    monkeypatch.setattr(merge_mod.codec, "BlobReader", CountingReader)
    t2, d2, fl2, n2 = merge_mod._expunge(terms, docs, deletes)
    monkeypatch.undo()

    # exactly the terms whose [min_docid, max_docid] contains the victim
    # are decoded — every other blob is passed through untouched
    mins = terms["min_docid"].to_numpy()
    maxs = terms["max_docid"].to_numpy()
    expected = int(((mins <= victim) & (victim <= maxs)).sum())
    assert calls["n"] == expected < terms.num_rows, \
        f"decoded {calls['n']}, range-hit {expected} of {terms.num_rows}"
    assert n1 == n2 == 1 and fl1 == fl2
    assert t1.equals(t2) and d1.equals(d2)
