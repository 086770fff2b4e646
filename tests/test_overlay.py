"""OverlayStorage facade (reference filedb/filestore.py:313-375: a union
mount that reads from storage A unless the file exists in B, and writes
to B).  ``open_overlay(base, overlay)``: searches see base+overlay
segments, while tombstones, new documents, merges, and commits all land
in the overlay — the base index directory is never modified."""

import os

import pyarrow.parquet as pq
import pytest

from whoosh_ray.index import open_overlay
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search.query import And, Term
from whoosh_ray.search.searcher import Searcher
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


def _snapshot(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


@pytest.fixture()
def base(ray_session, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(generate_transcripts(n_convs=200, seed=5),
                   str(src / "p.parquet"))
    base_dir = str(tmp_path / "base")
    build_index(str(src), base_dir, transcripts_schema(), seg_size=512)
    return str(src), base_dir, str(tmp_path / "over")


def test_overlay_reads_base(base):
    """A fresh overlay answers queries identically to the base."""
    _, base_dir, over_dir = base
    q = And([Term("text", "deploy"), Term("role", "user")])
    want = Searcher(base_dir).search(q, limit=10)
    open_overlay(base_dir, over_dir)
    got = Searcher(over_dir).search(q, limit=10)
    assert got.docids.tolist() == want.docids.tolist()
    assert got.scores.tolist() == want.scores.tolist()


def test_overlay_writes_never_touch_base(base):
    """Tombstones, added docs, and an optimize all land in the overlay;
    the base file tree is bit-for-bit untouched."""
    _, base_dir, over_dir = base
    before = _snapshot(base_dir)
    ix = open_overlay(base_dir, over_dir)

    # delete through the overlay
    n = ix.delete_by_term("text", "deploy")
    assert n > 0
    s = Searcher(over_dir)
    assert len(s.search(Term("text", "deploy"), limit=5).docids) == 0
    # base still finds them
    assert len(Searcher(base_dir).search(Term("text", "deploy"),
                                         limit=5).docids) > 0

    # add documents through the overlay (new segment in overlay only)
    w = ix.writer()
    w.add_document(conv_id="zzz_new", turn_idx=0, role="user",
                   text="overlay flamingo document")
    w.commit()
    ix.refresh()
    s = Searcher(over_dir)
    r = s.search(Term("text", "flamingo"), limit=5)
    assert len(r.docids) == 1
    assert len(Searcher(base_dir).search(Term("text", "flamingo"),
                                         limit=5).docids) == 0

    # merge: only overlay-resident segments are rewritten; base metas
    # pass through the reseal
    nsegs_before = len(ix.refresh()._manifest.segments)
    ix.optimize()
    m = ix.refresh()._manifest
    assert len(m.segments) == nsegs_before  # 1 overlay seg stayed 1
    s = Searcher(over_dir)
    assert len(s.search(Term("text", "flamingo"), limit=5).docids) == 1
    assert len(s.search(Term("text", "deploy"), limit=5).docids) == 0

    assert _snapshot(base_dir) == before


def test_overlay_reopen_keeps_state(base):
    """Re-opening an existing overlay is idempotent: its segments,
    tombstones, and manifest generation survive."""
    _, base_dir, over_dir = base
    ix = open_overlay(base_dir, over_dir + "_re")
    ix.delete_by_term("text", "render")
    gen_before = ix.refresh().latest_generation()
    n_before = len(ix._manifest.segments)
    ix2 = open_overlay(base_dir, over_dir + "_re")
    assert ix2.latest_generation() == gen_before
    assert len(ix2._manifest.segments) == n_before
    s = Searcher(over_dir + "_re")
    assert len(s.search(Term("text", "render"), limit=5).docids) == 0


def test_overlay_snapshots_base_deletes(base):
    """Base tombstones present at overlay creation stay deleted even
    after NEW overlay tombstones shadow the file."""
    _, base_dir, over_dir = base
    from whoosh_ray.index import open_dir

    bix = open_dir(base_dir)
    assert bix.delete_by_term("text", "timeout") > 0
    ix = open_overlay(base_dir, over_dir)
    ix.delete_by_term("text", "cache")
    s = Searcher(over_dir)
    assert len(s.search(Term("text", "timeout"), limit=5).docids) == 0
    assert len(s.search(Term("text", "cache"), limit=5).docids) == 0


def test_overlay_distributed_fanout(base):
    """The actor fan-out resolves base files through the same per-file
    fallback (SegmentShardActor reads overlay_base from the manifest)."""
    _, base_dir, over_dir = base
    from whoosh_ray.search.dist import batch_search

    ix = open_overlay(base_dir, over_dir + "_dist")
    ix.delete_by_term("text", "cache")
    qs = [Term("text", "deploy"),
          And([Term("text", "error"), Term("role", "user")]),
          Term("text", "cache")]
    local = Searcher(over_dir + "_dist")
    want = [local.search(q, limit=10) for q in qs]
    got = batch_search(over_dir + "_dist", qs, limit=10, concurrency=2)
    import pyarrow.compute as pc

    for qi, w in enumerate(want):
        g = got.filter(pc.equal(got["query_id"], qi))
        assert g["docid"].to_pylist() == w.docids.tolist()
        assert g["score"].to_pylist() == w.scores.tolist()
    assert len(want[2].docids) == 0  # tombstones visible to the fan-out


def test_overlay_over_packed_base(base):
    """Union resolution composes with compound packing: a packed base
    segment's data resolves through the base's segment.cmpd while its
    tombstones live in the overlay shadow dir."""
    _, base_dir, over_dir = base
    from whoosh_ray.index import open_dir

    open_dir(base_dir).pack()
    ix = open_overlay(base_dir, over_dir + "_packed")
    ix.delete_by_term("text", "deploy")
    s = Searcher(over_dir + "_packed")
    assert all(seg._cmpd_path.startswith(base_dir)
               for seg in s.segments)
    assert len(s.search(Term("text", "deploy"), limit=5).docids) == 0
    assert len(s.search(Term("text", "error"), limit=10).docids) > 0
