"""Deletes / incremental add / upsert conformance vs the reference."""

import numpy as np
import pytest

from tests.oracle import build_oracle_index, oracle_search
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.pipelines.mutate import (
    add_documents,
    delete_by_term,
    update_documents,
)
from whoosh_ray.search import And, Not, Or, Searcher, Term
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


def _fresh_index(tmp_path, corpus, seg_size=64):
    import pyarrow.parquet as pq

    (tmp_path / "src").mkdir()
    pq.write_table(corpus, str(tmp_path / "src" / "p.parquet"))
    build_index(str(tmp_path / "src"), str(tmp_path / "index"),
                transcripts_schema(), seg_size=seg_size)
    return str(tmp_path / "index")


QUERIES = lambda: [  # noqa: E731
    Term("text", "deploy"),
    Or([Term("text", "deploy"), Term("text", "render")]),
    And([Term("text", "cluster"), Not(Term("text", "error"))]),
]


def test_delete_by_term_matches_oracle(tmp_path):
    corpus = generate_transcripts(n_convs=20, seed=13)
    ix = _fresh_index(tmp_path, corpus)
    oix = build_oracle_index(corpus, text_fields=("text",),
                             id_fields=("role", "tool", "conv_id"))

    n_mine = delete_by_term(ix, "text", "november")
    w = oix.writer()
    n_ref = w.delete_by_term("text", "november")
    w.commit()
    assert n_mine == n_ref

    from whoosh.query import And as WAnd
    from whoosh.query import Not as WNot
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WTerm

    s = Searcher(ix)
    refqs = [WTerm("text", "deploy"),
             WOr([WTerm("text", "deploy"), WTerm("text", "render")]),
             WAnd([WTerm("text", "cluster"), WNot(WTerm("text", "error"))])]
    for myq, refq in zip(QUERIES(), refqs):
        mine = [(int(d), float(sc)) for d, sc in s.search(myq, limit=None).pairs()]
        ref = [(int(d), float(sc))
               for d, sc in oracle_search(oix, refq, limit=None)]
        assert [d for d, _ in mine] == [d for d, _ in ref], myq
        np.testing.assert_allclose([x for _, x in mine],
                                   [x for _, x in ref], rtol=1e-9)


def test_incremental_add(tmp_path):
    corpus1 = generate_transcripts(n_convs=12, seed=21)
    corpus2 = generate_transcripts(n_convs=8, seed=22)
    ix = _fresh_index(tmp_path, corpus1)
    s0 = Searcher(ix)
    n0 = s0.doc_count_all

    import pyarrow.parquet as pq

    (tmp_path / "src2").mkdir()
    pq.write_table(corpus2, str(tmp_path / "src2" / "p.parquet"))
    m = add_documents(ix, str(tmp_path / "src2"))
    s1 = Searcher(ix)
    assert s1.doc_count_all == n0 + corpus2.num_rows

    # oracle: one index over the concatenation, docids must align
    import pyarrow as pa

    both = pa.concat_tables([corpus1, corpus2])
    oix = build_oracle_index(both, text_fields=("text",),
                             id_fields=("role", "tool", "conv_id"))
    from whoosh.query import Term as WTerm

    for t in ["deploy", "render", "november"]:
        mine = [(int(d), float(sc))
                for d, sc in s1.search(Term("text", t), limit=None).pairs()]
        ref = [(int(d), float(sc))
               for d, sc in oracle_search(oix, WTerm("text", t), limit=None)]
        assert [d for d, _ in mine] == [d for d, _ in ref], t
        np.testing.assert_allclose([x for _, x in mine],
                                   [x for _, x in ref], rtol=1e-9)


def test_upsert_by_unique_key(tmp_path):
    corpus = generate_transcripts(n_convs=10, seed=31)
    ix = _fresh_index(tmp_path, corpus)
    # re-ingest conversation conv000003 with fresh content
    import pyarrow as pa
    import pyarrow.parquet as pq

    sub = corpus.filter(
        pa.compute.equal(corpus["conv_id"], "conv000003"))
    new_texts = ["upserted fresh words here"] * sub.num_rows
    sub = sub.set_column(sub.column_names.index("text"), "text",
                         pa.array(new_texts))
    (tmp_path / "upd").mkdir()
    pq.write_table(sub, str(tmp_path / "upd" / "p.parquet"))
    update_documents(ix, str(tmp_path / "upd"), unique_field="conv_id")

    s = Searcher(ix)
    r = s.search(Term("conv_id", "conv000003"), limit=None)
    stored = s.stored(r.docids, columns=["text"])
    texts = set(stored["text"].to_pylist())
    assert texts == {"upserted fresh words here"}
    # old content of that conversation is gone
    r2 = s.search(Term("text", "upserted"), limit=None)
    assert len(r2) == sub.num_rows


def test_build_resume_skips_committed_segments(tmp_path):
    """Checkpoint-resume: delete one committed segment, rerun the build —
    only that partition is rebuilt and results are identical."""
    import shutil

    import numpy as np

    from whoosh_ray.search import Or

    corpus = generate_transcripts(n_convs=30, seed=41)
    ix = _fresh_index(tmp_path, corpus, seg_size=48)
    s0 = Searcher(ix)
    before = [(int(d), float(sc)) for d, sc in
              s0.search(Or([Term("text", "deploy"), Term("text", "render")]),
                        limit=None).pairs()]
    segdirs = sorted(p for p in (tmp_path / "index" / "segments").iterdir()
                     if p.name.startswith("seg="))
    shutil.rmtree(segdirs[1])
    m = build_index(str(tmp_path / "src"), ix, transcripts_schema(),
                    seg_size=48)
    assert m.settings["resumed_segments"] == len(segdirs) - 1
    s1 = Searcher(ix)
    after = [(int(d), float(sc)) for d, sc in
             s1.search(Or([Term("text", "deploy"), Term("text", "render")]),
                       limit=None).pairs()]
    assert before == after
