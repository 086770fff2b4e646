"""Compound segment files (reference CompoundWriter/CompoundStorage,
filedb/compound.py:27-331, assembled at commit in writing.py:857-862):
packing a sealed segment's data files into one ``segment.cmpd`` must be
invisible to every reader — identical scores, stats, merges, resumes —
while halving the per-segment object count."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search.query import And, Or, Phrase, Term
from whoosh_ray.search.searcher import Searcher
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state import compound as cf
from whoosh_ray.state.schema import transcripts_schema

QUERIES = [
    Term("text", "deploy"),
    And([Term("text", "error"), Term("text", "retry")]),
    Or([Term("text", "timeout"), Term("text", "deploy"),
        Term("text", "cache")]),
    Phrase("text", ["deploy", "the", "service"]),
]


def _results(index_dir):
    from whoosh_ray.state.segment import SegmentReader

    SegmentReader._STATS_CACHE.clear()
    from whoosh_ray.state import segment as segmod

    segmod._TERMS_DATASET_CACHE.clear()
    s = Searcher(index_dir)
    out = []
    for q in QUERIES:
        r = s.search(q, limit=20)
        out.append((r.docids.tolist(), r.scores.tolist()))
    return s, out


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cmpd")
    src = tmp / "src"
    src.mkdir()
    pq.write_table(generate_transcripts(n_convs=400, seed=33),
                   str(src / "p.parquet"))
    index_dir = str(tmp / "idx")
    # small segments -> several of them, so the batched multi-segment
    # warm path (len(segments) > 2) runs over the compound filesystem
    build_index(str(src), index_dir, transcripts_schema(), seg_size=512)
    return str(src), index_dir


def test_pack_roundtrip_identical(built):
    """Scores, docids, and term stats are byte-identical after packing;
    each packed segment dir holds exactly {segment.cmpd, meta.json}."""
    _, index_dir = built
    s0, before = _results(index_dir)
    assert len(s0.segments) > 2  # exercises _warm_stats_batched
    lex_before = s0.lexicon("text")

    from whoosh_ray.index import open_dir

    ix = open_dir(index_dir)
    n = ix.pack()
    assert n == len(s0.segments)
    segroot = os.path.join(index_dir, "segments")
    for name in sorted(os.listdir(segroot)):
        files = sorted(os.listdir(os.path.join(segroot, name)))
        assert files == ["meta.json", cf.COMPOUND_NAME], (name, files)

    s1, after = _results(index_dir)
    for (d0, sc0), (d1, sc1) in zip(before, after):
        assert d0 == d1
        assert sc0 == sc1  # float-exact: same bytes, same kernels
    assert s1.lexicon("text") == lex_before
    # packing again is a no-op
    assert ix.pack() == 0


def test_pack_preserves_subfile_bytes(built):
    """The compound sub-files are the original files' bytes verbatim."""
    _, index_dir = built
    segroot = os.path.join(index_dir, "segments")
    name = sorted(os.listdir(segroot))[0]
    seg_dir = os.path.join(segroot, name)
    cmpd = os.path.join(seg_dir, cf.COMPOUND_NAME)
    assert os.path.exists(cmpd)
    toc = cf.read_toc(cmpd)
    assert set(toc) == {"terms.parquet", "blobs.bin", "docs.parquet"}
    # parquet sub-files parse from the zero-copy buffer slices
    import pyarrow as pa

    t = pq.read_table(pa.BufferReader(cf.subfile_buffer(cmpd,
                                                        "terms.parquet")))
    assert t.num_rows > 0
    d = pq.read_table(pa.BufferReader(cf.subfile_buffer(cmpd,
                                                        "docs.parquet")))
    assert d.num_rows > 0
    lens = sorted((off, ln) for off, ln in toc.values())
    for (o1, l1), (o2, _) in zip(lens, lens[1:]):
        assert o1 + l1 == o2  # contiguous, no gaps


def test_pack_crash_midway_both_layouts(ray_session, tmp_path):
    """A crash between the compound rename and the original-unlink
    leaves BOTH layouts on disk: readers must prefer segment.cmpd, and
    the next pack run must finish the cleanup."""
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(generate_transcripts(n_convs=80, seed=3),
                   str(src / "p.parquet"))
    ix = str(tmp_path / "idx")
    build_index(str(src), ix, transcripts_schema(), seg_size=512)
    want = Searcher(ix).search(QUERIES[0], limit=10)
    segroot = os.path.join(ix, "segments")
    for name in os.listdir(segroot):
        cf.pack_segment(os.path.join(segroot, name), remove=False)
    # both layouts present -> compound wins, results identical
    from whoosh_ray.state.segment import SegmentReader

    SegmentReader._STATS_CACHE.clear()
    s = Searcher(ix)
    assert all(seg._compound is not None for seg in s.segments)
    got = s.search(QUERIES[0], limit=10)
    assert got.docids.tolist() == want.docids.tolist()
    assert got.scores.tolist() == want.scores.tolist()
    # a later pack run completes the crash cleanup (originals removed)
    assert cf.pack_index(ix) == 0
    for name in os.listdir(segroot):
        files = sorted(os.listdir(os.path.join(segroot, name)))
        assert files == ["meta.json", cf.COMPOUND_NAME]


def test_term_stats_over_compound(built, ray_session):
    """The distributed term-stats read goes through the compound
    filesystem handler (Ray Data read_parquet over !-addressed paths)."""
    _, index_dir = built
    from whoosh_ray.pipelines.ir import term_stats_table

    s = Searcher(index_dir)
    assert all(seg._compound is not None for seg in s.segments)
    t = term_stats_table(s, "text")
    assert t.num_rows > 100
    terms = t["term"].to_pylist()
    dfs = dict(zip(terms, t["df"].to_pylist()))
    # spot-check one term's df against the searcher's own stats
    ti = s.global_term_info("text", "deploy")
    assert ti is not None and dfs["deploy"] == ti["df"]


def test_delete_and_optimize_on_packed(built):
    """Tombstones (which stay outside the compound file) and merges
    (which read packed inputs via read_terms_file) both work."""
    src, index_dir = built
    import shutil

    work = index_dir + "_mergecopy"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    from whoosh_ray.index import open_dir

    ix = open_dir(work)
    ndel = ix.delete_by_term("text", "deploy")
    assert ndel > 0
    s = Searcher(work)
    r = s.search(Term("text", "deploy"), limit=5)
    assert len(r.docids) == 0
    before_err = s.search(Term("text", "error"), limit=20)
    ix.optimize()
    s2 = Searcher(work)
    assert len(s2.segments) == 1
    assert s2.segments[0]._compound is None  # merged segment is unpacked
    r2 = s2.search(Term("text", "deploy"), limit=5)
    assert len(r2.docids) == 0
    r3 = s2.search(Term("text", "error"), limit=20)
    assert r3.docids.tolist() == before_err.docids.tolist()
    shutil.rmtree(work, ignore_errors=True)


def test_build_compound_flag_and_resume(ray_session, tmp_path):
    """build_index(compound=True) seals packed segments, and a resumed
    build over them skips every partition (meta.json stays outside)."""
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(generate_transcripts(n_convs=120, seed=7),
                   str(src / "p.parquet"))
    plain = str(tmp_path / "plain")
    packed = str(tmp_path / "packed")
    build_index(str(src), plain, transcripts_schema(), seg_size=512)
    m = build_index(str(src), packed, transcripts_schema(), seg_size=512,
                    compound=True)
    nsegs = len(m.segments)
    segroot = os.path.join(packed, "segments")
    assert all(os.path.exists(os.path.join(segroot, n, cf.COMPOUND_NAME))
               for n in os.listdir(segroot))
    # identical results vs the plain build
    sa, ra = Searcher(plain), []
    sb = Searcher(packed)
    for q in QUERIES:
        a = sa.search(q, limit=20)
        b = sb.search(q, limit=20)
        assert a.docids.tolist() == b.docids.tolist()
        assert np.allclose(a.scores, b.scores, rtol=0, atol=0)
    # resume: every packed segment is recognized as done
    m2 = build_index(str(src), packed, transcripts_schema(), seg_size=512,
                     compound=True, resume=True)
    assert m2.settings["resumed_segments"] == nsegs


def test_pack_torn_compound_keeps_originals(ray_session, tmp_path):
    """A TORN segment.cmpd (kernel/power crash surviving the rename)
    must not trigger the crash-recovery cleanup: the originals are the
    only good copies, so pack validates the TOC first, discards the torn
    file, and re-packs from the originals."""
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(generate_transcripts(n_convs=40, seed=11),
                   str(src / "p.parquet"))
    ix = str(tmp_path / "idx")
    build_index(str(src), ix, transcripts_schema(), seg_size=512)
    want = Searcher(ix).search(QUERIES[0], limit=10)
    segroot = os.path.join(ix, "segments")
    names = sorted(os.listdir(segroot))
    victim = os.path.join(segroot, names[0])
    with open(os.path.join(victim, cf.COMPOUND_NAME), "wb") as f:
        f.write(b"\x00garbage-torn-write\x00" * 7)
    out = cf.pack_segment(victim)
    assert out is not None  # re-packed, not short-circuited
    assert cf.read_toc(out)  # and the new compound parses
    # data files were packed (not deleted while the compound was torn)
    assert not os.path.exists(os.path.join(victim, "terms.parquet"))
    from whoosh_ray.state.segment import SegmentReader

    SegmentReader._STATS_CACHE.clear()
    got = Searcher(ix).search(QUERIES[0], limit=10)
    assert got.docids.tolist() == want.docids.tolist()
    assert got.scores.tolist() == want.scores.tolist()
