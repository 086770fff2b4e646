"""PositionBoosts / CharacterBoosts per-occurrence payload formats.

Reference semantics (formats.py:339-481): PositionBoosts stores one
(pos, boost) per token occurrence in the posting value and weights the
posting by the boost sum; CharacterBoosts additionally stores the char
span per occurrence.  Here the occurrence boosts live in a float32
``boosts`` section of blobs.bin aligned with the positions payload
(state/codec.py encode_boosts_batch), written only by the fused writer
(FieldSpec.text(token_boosts=True)).  Verified against the reference
engine's ``value_as("position_boosts")`` / ``value_as("character_boosts")``.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.functions.analysis import AnalyzerSpec
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher, Term
from whoosh_ray.state.schema import FieldSpec, IndexSchema

DOCS = [
    "alpha beta^2 gamma beta",
    "alpha beta gamma gamma",
    "beta^0.5 delta epsilon beta^4",
    "alpha alpha beta^3 zeta",
    "gamma delta epsilon zeta",
    "beta beta^2 beta alpha",
]

# boosts exactly representable in float32 so array('f')-precision
# round-trips match between the reference and the f4 payload section
DELIM_CHAIN = (
    ("tokenizer", (r"[^ \t\r\n]+", False)),
    ("lowercase", ()),
    ("delimited", ("^",)),
)


def _table():
    return pa.table({
        "doc_id": pa.array(np.arange(len(DOCS)), type=pa.int64()),
        "text": pa.array(DOCS),
    })


def _oracle_ix(fmt):
    load_whoosh_oracle()
    from whoosh import fields
    from whoosh.analysis import (DelimitedAttributeFilter, LowercaseFilter,
                                 RegexTokenizer)
    from whoosh.filedb.filestore import RamStorage

    ana = (RegexTokenizer(r"[^ \t\r\n]+") | LowercaseFilter()
           | DelimitedAttributeFilter(delimiter="^"))
    ft = fields.FieldType(format=fmt, analyzer=ana, scorable=True,
                          stored=True)
    ix = RamStorage().create_index(fields.Schema(text=ft))
    w = ix.writer()
    for t in DOCS:
        w.add_document(text=t)
    w.commit()
    return ix


def _oracle_values(ix, term, kind):
    """docnum -> decoded per-occurrence payload list."""
    out = {}
    with ix.searcher() as s:
        if not s.doc_frequency("text", term):
            return out
        m = s.postings("text", term)
        while m.is_active():
            out[m.id()] = m.value_as(kind)
            m.next()
    return out


@pytest.fixture(scope="module")
def pb_engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("posboosts")
    pq.write_table(_table(), str(d / "src.parquet"))
    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True, token_boosts=True,
                       analyzer=AnalyzerSpec(chain=DELIM_CHAIN)),
    ), stored_columns=("doc_id",))
    build_index(str(d / "src.parquet"), str(d / "ix"), schema,
                docid_col="doc_id", seg_size=4)
    return Searcher(str(d / "ix"))


@pytest.fixture(scope="module")
def pb_oracle():
    load_whoosh_oracle()
    from whoosh import formats

    return _oracle_ix(formats.PositionBoosts())


@pytest.mark.parametrize("term", ["beta", "alpha", "gamma", "zeta"])
def test_position_boosts_match_reference(pb_engine, pb_oracle, term):
    ref = _oracle_values(pb_oracle, term, "position_boosts")
    for docid in range(len(DOCS)):
        ours = pb_engine.position_boosts(docid, "text", term)
        want = [(int(p), float(b)) for p, b in ref.get(docid, [])]
        assert ours == want, (term, docid)


@pytest.mark.parametrize("term", ["beta", "alpha"])
def test_position_boosts_scores_match_reference(pb_engine, pb_oracle, term):
    load_whoosh_oracle()
    from whoosh.query import Term as WTerm

    ours = pb_engine.search_topk(Term("text", term), limit=10)
    with pb_oracle.searcher() as s:
        r = s.search(WTerm("text", term), limit=10)
        ref = [(hit.docnum, hit.score) for hit in r]
    assert ours.docids.tolist() == [d for d, _ in ref]
    np.testing.assert_array_equal(ours.scores, [s for _, s in ref])


# ---- CharacterBoosts ----

@pytest.fixture(scope="module")
def cb_engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("charboosts")
    pq.write_table(_table(), str(d / "src.parquet"))
    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True, chars=True, token_boosts=True,
                       analyzer=AnalyzerSpec(chain=DELIM_CHAIN)),
    ), stored_columns=("doc_id",))
    build_index(str(d / "src.parquet"), str(d / "ix"), schema,
                docid_col="doc_id", seg_size=4)
    return Searcher(str(d / "ix"))


@pytest.fixture(scope="module")
def cb_oracle():
    load_whoosh_oracle()
    from whoosh import formats

    return _oracle_ix(formats.CharacterBoosts())


@pytest.mark.parametrize("term", ["beta", "alpha", "delta", "zeta"])
def test_character_boosts_match_reference(cb_engine, cb_oracle, term):
    ref = _oracle_values(cb_oracle, term, "character_boosts")
    for docid in range(len(DOCS)):
        ours = cb_engine.character_boosts(docid, "text", term)
        want = [(int(p), int(sc), int(ec), float(b))
                for p, sc, ec, b in ref.get(docid, [])]
        assert ours == want, (term, docid)
        # stripped spans point at the bare term text
        for _p, sc, ec, _b in ours:
            assert DOCS[docid][sc:ec].lower() == term


def test_character_boosts_survive_merge(tmp_path):
    from whoosh_ray.pipelines.merge import merge_segments

    pq.write_table(_table(), str(tmp_path / "src.parquet"))
    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True, chars=True, token_boosts=True,
                       analyzer=AnalyzerSpec(chain=DELIM_CHAIN)),
    ), stored_columns=("doc_id",))
    build_index(str(tmp_path / "src.parquet"), str(tmp_path / "ix"), schema,
                docid_col="doc_id", seg_size=2)
    before = Searcher(str(tmp_path / "ix"))
    want = {d: before.character_boosts(d, "text", "beta")
            for d in range(len(DOCS))}
    assert sum(len(v) for v in want.values()) > 0
    merge_segments(str(tmp_path / "ix"), policy="OPTIMIZE")
    after = Searcher(str(tmp_path / "ix"))
    assert len(after.segments) == 1
    for d in range(len(DOCS)):
        assert after.character_boosts(d, "text", "beta") == want[d]


def test_expunge_keeps_boost_alignment(tmp_path):
    """Deleting a doc then merging must keep per-posting boost payloads
    aligned with the surviving postings."""
    from whoosh_ray.pipelines.merge import merge_segments
    from whoosh_ray.pipelines.mutate import delete_docids

    pq.write_table(_table(), str(tmp_path / "src.parquet"))
    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True, token_boosts=True,
                       analyzer=AnalyzerSpec(chain=DELIM_CHAIN)),
    ), stored_columns=("doc_id",))
    build_index(str(tmp_path / "src.parquet"), str(tmp_path / "ix"), schema,
                docid_col="doc_id", seg_size=3)
    before = Searcher(str(tmp_path / "ix"))
    want = {d: before.position_boosts(d, "text", "beta")
            for d in range(len(DOCS)) if d != 0}
    delete_docids(str(tmp_path / "ix"), [0])
    merge_segments(str(tmp_path / "ix"), policy="OPTIMIZE")
    after = Searcher(str(tmp_path / "ix"))
    for d, w in want.items():
        assert after.position_boosts(d, "text", "beta") == w
