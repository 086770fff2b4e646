"""File-level lineage: incremental appends resume file-by-file — old
segments keep their fingerprints (derived from the files overlapping
their docid range), fully-covered files are pruned from the read, and
results equal a from-scratch build."""

import glob
import os

import pyarrow.parquet as pq

from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher, Term
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


def test_incremental_append_resumes_per_file(tmp_path):
    t = generate_transcripts(n_convs=1200, seed=7)
    n = t.num_rows
    src = tmp_path / "src"
    src.mkdir()
    per = (n + 9) // 10  # 10 conv-sorted files, convs straddle cuts
    for i in range(10):
        pq.write_table(t.slice(i * per, per),
                       str(src / f"part{i:02d}.parquet"))

    first8 = sorted(glob.glob(str(src / "part0*.parquet")))
    ix = str(tmp_path / "ix")
    m1 = build_index(first8, ix, transcripts_schema())
    assert m1.settings["file_lineage"]

    allf = sorted(glob.glob(str(src / "part*.parquet")))
    m2 = build_index(allf, ix, transcripts_schema())
    assert m2.settings["file_lineage"]
    assert m2.settings["resumed_segments"] > 0
    assert m2.settings["files_read"] < 10  # covered files pruned

    m3 = build_index(allf, str(tmp_path / "scratch"),
                     transcripts_schema(), resume=False)
    a, b = Searcher(ix), Searcher(str(tmp_path / "scratch"))
    assert a.doc_count_all == b.doc_count_all == m3.doc_count_all
    for term in ["deploy", "render", "cluster"]:
        ra = a.search(Term("text", term), limit=None)
        rb = b.search(Term("text", term), limit=None)
        assert ra.docids.tolist() == rb.docids.tolist()
        assert ra.scores.tolist() == rb.scores.tolist()

    # idempotent re-run: everything resumes, ZERO files read
    m4 = build_index(allf, ix, transcripts_schema())
    assert m4.settings["resumed_segments"] == len(m4.segments)
    assert m4.settings["files_read"] == 0


def test_unsorted_files_fall_back_to_full_fingerprint(tmp_path):
    """Interleaved conv ranges make file lineage unsound — it must
    disable itself (correctness over cleverness)."""
    t = generate_transcripts(n_convs=400, seed=9)
    src = tmp_path / "src"
    src.mkdir()
    n = t.num_rows
    per = (n + 7) // 8
    # write slices in REVERSED name order so path order != conv order
    for i in range(8):
        pq.write_table(t.slice(i * per, per),
                       str(src / f"part{7 - i:02d}.parquet"))
    m = build_index(str(src), str(tmp_path / "ix"), transcripts_schema())
    assert not m.settings["file_lineage"]
    s = Searcher(str(tmp_path / "ix"))
    assert s.doc_count_all == n


def test_stream_mode_resume(tmp_path):
    """mode=stream commits the same per-segment lineage: a deleted
    segment rebuilds, the rest resume."""
    import glob
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    t = generate_transcripts(n_convs=400, seed=13)
    pq.write_table(t, str(src / "p.parquet"))
    ix = str(tmp_path / "ix")
    m1 = build_index(str(src), ix, transcripts_schema(), seg_size=256,
                     mode="stream")
    segs = sorted(glob.glob(ix + "/segments/seg=*"))
    assert len(segs) == len(m1.segments)
    shutil.rmtree(segs[1])
    m2 = build_index(str(src), ix, transcripts_schema(), seg_size=256,
                     mode="stream")
    assert m2.settings["resumed_segments"] == len(segs) - 1
    s = Searcher(ix)
    assert s.doc_count_all == t.num_rows


def test_manifest_segment_spill_roundtrip(ray_session, tmp_path, monkeypatch):
    """Above the spill bound the manifest's segment list lives in a
    columnar sidecar; reads, queries, resume and the generation counter
    behave identically."""
    import whoosh_ray.state.manifest as mf

    monkeypatch.setattr(mf, "SEGMENTS_SPILL_THRESHOLD", 3)

    t = generate_transcripts(n_convs=300, seed=21)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    ix = str(tmp_path / "ix")
    m1 = build_index(str(src), ix, transcripts_schema(), seg_size=128)
    assert len(m1.segments) > 3
    assert os.path.exists(os.path.join(ix, "manifest_segments.parquet"))

    m2 = mf.read_manifest(ix)
    assert m2.cached_global is not None
    assert m2.doc_count_all == m1.doc_count_all
    assert len(m2.segments) == len(m1.segments)
    assert [s.seg_id for s in m2.segments] == [s.seg_id for s in m1.segments]
    for a, b in zip(m1.segments, m2.segments):
        assert (a.docid_base, a.doc_count, a.field_lengths,
                a.lineage) == (b.docid_base, b.doc_count,
                               b.field_lengths, b.lineage)
    assert m2.avg_field_length("text") == m1.avg_field_length("text")

    s = Searcher(ix)
    r = s.search(Term("text", "deploy"), limit=5)
    assert len(r.docids) > 0

    # re-seal (resume no-op) keeps the sidecar + bumps the generation
    g1 = int(m2.settings["generation"])
    m3 = build_index(str(src), ix, transcripts_schema(), seg_size=128)
    assert m3.settings["resumed_segments"] == len(m3.segments)
    assert int(mf.read_manifest(ix).settings["generation"]) > g1

    # shrinking below the bound retires the sidecar (json authoritative)
    monkeypatch.setattr(mf, "SEGMENTS_SPILL_THRESHOLD", 10000)
    mf.write_manifest(ix, mf.read_manifest(ix))
    assert not os.path.exists(os.path.join(ix, "manifest_segments.parquet"))
    assert mf.read_manifest(ix).doc_count_all == m1.doc_count_all
