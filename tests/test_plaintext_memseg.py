"""PlainText codec (reference codec/plaintext.py:38-452) and memory
codec (reference codec/memory.py:30-334) analogues: a text dump must
reconstruct the segment EXACTLY (tables equal, scores identical), and an
in-memory segment must answer every query like its on-disk twin."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from whoosh_ray.functions.analysis import AnalyzerSpec
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import And, Or, Phrase, Searcher, Term
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state import plaintext as pt
from whoosh_ray.state.manifest import read_manifest, seg_dirname
from whoosh_ray.state.memseg import MemorySegmentReader
from whoosh_ray.state.schema import (FieldSpec, IndexSchema,
                                     transcripts_schema)
from whoosh_ray.state.segment import (SegmentReader, read_docs_file,
                                      read_terms_file)

QUERIES = [
    Term("text", "deploy"),
    And([Term("text", "error"), Term("text", "retry")]),
    Or([Term("text", "timeout"), Term("text", "cache")]),
    Phrase("text", ["deploy", "the", "service"]),
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pt")
    src = tmp / "src"
    src.mkdir()
    pq.write_table(generate_transcripts(n_convs=150, seed=11),
                   str(src / "p.parquet"))
    index_dir = str(tmp / "idx")
    build_index(str(src), index_dir, transcripts_schema(), seg_size=512)
    return index_dir


def _seg_dirs(index_dir):
    segroot = os.path.join(index_dir, "segments")
    return [os.path.join(segroot, n) for n in sorted(os.listdir(segroot))]


def test_plaintext_roundtrip_exact(built, tmp_path):
    """dump -> parse -> write lands byte-equivalent Arrow tables for
    every segment, and the rebuilt index scores identically."""
    rebuilt = str(tmp_path / "rebuilt")
    os.makedirs(os.path.join(rebuilt, "segments"))
    for seg_dir in _seg_dirs(built):
        text = pt.dump_segment(seg_dir)
        assert text.startswith(pt.HEADER)
        meta, terms, docs = pt.parse_segment(text)
        assert terms.equals(read_terms_file(seg_dir))
        assert docs.equals(read_docs_file(seg_dir))
        pt.write_segment(text, os.path.join(
            rebuilt, "segments", os.path.basename(seg_dir)))
    # seal a manifest over the rebuilt segments
    import shutil

    shutil.copy(os.path.join(built, "manifest.json"),
                os.path.join(rebuilt, "manifest.json"))
    a, b = Searcher(built), Searcher(rebuilt)
    for q in QUERIES:
        ra, rb = a.search(q, limit=20), b.search(q, limit=20)
        assert ra.docids.tolist() == rb.docids.tolist()
        assert ra.scores.tolist() == rb.scores.tolist()


def test_plaintext_rich_payloads(ray_session, tmp_path):
    """chars spans and per-token boost weights survive the text dump."""
    docs = ["alpha beta^2 gamma", "beta gamma gamma", "alpha beta^0.5"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3), type=pa.int64()),
        "text": pa.array(docs),
    }), str(tmp_path / "src.parquet"))
    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True, positions=True, chars=True,
                       token_boosts=True,
                       analyzer=AnalyzerSpec(chain=(
                           ("tokenizer", (r"[^ \t\r\n]+", False)),
                           ("lowercase", ()),
                           ("delimited", ("^",)),
                       ))),
    ), stored_columns=("doc_id",))
    ix = str(tmp_path / "ix")
    build_index(str(tmp_path / "src.parquet"), ix, schema,
                docid_col="doc_id", seg_size=16)
    seg_dir = _seg_dirs(ix)[0]
    text = pt.dump_segment(seg_dir)
    assert "  CHARS " in text and "  BOOSTS " in text
    _, terms, dd = pt.parse_segment(text)
    assert terms.equals(read_terms_file(seg_dir))
    assert dd.equals(read_docs_file(seg_dir))


def test_memory_segment_matches_disk(built):
    """A MemorySegmentReader over a lifted segment answers postings,
    positions, stored lookups, and searches exactly like the disk
    reader (the overlay Searcher path BufferedWriter uses)."""
    manifest = read_manifest(built)
    schema = manifest.schema
    metas = sorted(manifest.segments, key=lambda m: m.docid_range()[0])
    disk, mem = [], []
    for m in metas:
        seg_dir = os.path.join(built, "segments", seg_dirname(m.seg_id))
        disk.append(SegmentReader(built, m, schema))
        mem.append(MemorySegmentReader.load(seg_dir, m, schema))
    for d, r in zip(disk, mem):
        assert r.all_docids().tolist() == d.all_docids().tolist()
        for term in ("deploy", "error", "the"):
            pd_, pr = d.postings("text", term), r.postings("text", term)
            assert (pd_ is None) == (pr is None)
            if pd_ is not None:
                assert pd_.docids.tolist() == pr.docids.tolist()
                assert pd_.tfs.tolist() == pr.tfs.tolist()
                posd = d.positions("text", term)
                posr = r.positions("text", term)
                assert (posd is None) == (posr is None)
                if posd is not None:
                    assert [p.tolist() for p in posd] == \
                        [p.tolist() for p in posr]
    # a searcher over pure memory segments (manifest metas + overlay
    # readers) scores identically to the disk searcher
    sd = Searcher(built)
    empty = read_manifest(built)
    empty.segments = []
    sm = Searcher(built, manifest=empty, extra_segments=tuple(mem))
    for q in QUERIES:
        ra, rb = sd.search(q, limit=20), sm.search(q, limit=20)
        assert ra.docids.tolist() == rb.docids.tolist()
        assert ra.scores.tolist() == rb.scores.tolist()


def test_buffered_writer_ram_is_memory_segment(built):
    """BufferedWriter's NRT overlay now serves from memory: no file
    descriptors, no scratch dir left behind."""
    import glob

    from whoosh_ray.pipelines.writer import BufferedWriter

    w = BufferedWriter(built, limit=100)
    w.add_document(conv_id="zz", turn_idx=0, role="user",
                   text="flamingo overlay memory")
    s = w.searcher()
    ram = [seg for seg in s.segments
           if isinstance(seg, MemorySegmentReader)]
    assert len(ram) == 1
    r = s.search(Term("text", "flamingo"), limit=5)
    assert len(r.docids) == 1
    assert not glob.glob("/tmp/wr_ram_seg_*")  # scratch dir already gone
    w.cancel()  # drop the buffered row; nothing reaches the index
