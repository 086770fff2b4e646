"""Per-token boost posting weights + Characters payloads (VERDICT r2 #4).

Reference semantics: DelimitedAttributeFilter parses ``word^2`` into
token.boost (analysis/filters.py:375-436) and Frequency/Positions
``word_values`` fold it into the posting weight (formats.py:182-263), so
a boosted token changes BM25 scores; the Characters format additionally
stores per-occurrence (pos, startchar, endchar) (formats.py:266-335).
Both are verified here against the reference engine."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.functions.analysis import AnalyzerSpec
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Or, Searcher, Term
from whoosh_ray.state.schema import FieldSpec, IndexSchema

DOCS = [
    "alpha beta^2 gamma delta",
    "alpha beta gamma gamma",
    "beta^0.5 delta epsilon",
    "alpha alpha beta^3 zeta",
    "gamma delta epsilon zeta",
    "beta beta^2 beta alpha",
]

# boost values exactly representable in float32, so the reference's
# array('f') block storage and our f32 tail round-trip identically
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


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("boosts")
    pq.write_table(_table(), str(d / "src.parquet"))
    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True, positions=True,
                       analyzer=AnalyzerSpec(chain=DELIM_CHAIN)),
    ), stored_columns=("doc_id",))
    build_index(str(d / "src.parquet"), str(d / "ix"), schema,
                docid_col="doc_id", seg_size=4)
    return Searcher(str(d / "ix"))


@pytest.fixture(scope="module")
def oracle():
    load_whoosh_oracle()
    from whoosh import fields
    from whoosh.analysis import (DelimitedAttributeFilter, LowercaseFilter,
                                 SpaceSeparatedTokenizer)
    from whoosh.filedb.filestore import RamStorage

    ana = (SpaceSeparatedTokenizer() | LowercaseFilter()
           | DelimitedAttributeFilter(delimiter="^"))
    ix = RamStorage().create_index(fields.Schema(
        text=fields.TEXT(analyzer=ana, stored=True, phrase=True)))
    w = ix.writer()
    for t in DOCS:
        w.add_document(text=t)
    w.commit()
    return ix


def _oracle_search(ix, q, limit=10):
    with ix.searcher() as s:
        r = s.search(q, limit=limit)
        return [(hit.docnum, hit.score) for hit in r]


@pytest.mark.parametrize("term", ["beta", "alpha", "gamma", "delta"])
def test_boosted_term_scores_match_reference(engine, oracle, term):
    load_whoosh_oracle()
    from whoosh.query import Term as WTerm

    ours = engine.search_topk(Term("text", term), limit=10)
    ref = _oracle_search(oracle, WTerm("text", term))
    assert ours.docids.tolist() == [d for d, _ in ref]
    np.testing.assert_array_equal(ours.scores, [s for _, s in ref])


def test_boosted_or_scores_match_reference(engine, oracle):
    load_whoosh_oracle()
    from whoosh.query import Or as WOr
    from whoosh.query import Term as WTerm

    ours = engine.search_topk(Or([Term("text", "beta"),
                                  Term("text", "zeta")]), limit=10)
    ref = _oracle_search(oracle, WOr([WTerm("text", "beta"),
                                      WTerm("text", "zeta")]))
    assert ours.docids.tolist() == [d for d, _ in ref]
    np.testing.assert_array_equal(ours.scores, [s for _, s in ref])


def test_boost_changes_ranking(engine):
    """word^3 in doc 3 must outrank plain repetitions when tf is equal —
    the silent-loss case from VERDICT r2 #4."""
    r = engine.search_topk(Term("text", "beta"), limit=10)
    ti = engine.global_term_info("text", "beta")
    # total_weight reflects boosts (2 + 1 + 0.5 + 3 + (1+2+1)), not tf
    assert ti["total_weight"] == pytest.approx(10.5)


# ---- Characters payloads ----

CHAR_DOCS = [
    "The quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs quick",
    "how quickly daft jumping zebras vex",
]


@pytest.fixture(scope="module")
def chars_engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("chars")
    t = pa.table({
        "doc_id": pa.array(np.arange(len(CHAR_DOCS)), type=pa.int64()),
        "text": pa.array(CHAR_DOCS),
    })
    pq.write_table(t, str(d / "src.parquet"))
    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True, chars=True),
    ), stored_columns=("doc_id",))
    build_index(str(d / "src.parquet"), str(d / "ix"), schema,
                docid_col="doc_id", seg_size=2)
    return Searcher(str(d / "ix"))


@pytest.fixture(scope="module")
def chars_oracle():
    load_whoosh_oracle()
    from whoosh import fields, formats
    from whoosh.analysis import StandardAnalyzer
    from whoosh.filedb.filestore import RamStorage

    ft = fields.TEXT(analyzer=StandardAnalyzer(), stored=True, chars=True)
    ix = RamStorage().create_index(fields.Schema(text=ft))
    w = ix.writer()
    for t in CHAR_DOCS:
        w.add_document(text=t)
    w.commit()
    return ix


@pytest.mark.parametrize("term", ["quick", "jumps", "box", "dog"])
def test_char_offsets_match_reference(chars_engine, chars_oracle, term):
    load_whoosh_oracle()
    ref_spans = {}
    with chars_oracle.searcher() as s:
        m = s.postings("text", term) if s.doc_frequency("text", term) else None
        while m is not None and m.is_active():
            ref_spans[m.id()] = [(sc, ec) for _, sc, ec
                                 in m.value_as("characters")]
            m.next()
    for docid in range(len(CHAR_DOCS)):
        ours = chars_engine.char_offsets(docid, "text", term)
        assert ours == ref_spans.get(docid, [])
        # spans point at the actual term text
        for sc, ec in ours:
            assert CHAR_DOCS[docid][sc:ec].lower() == term


def test_highlights_from_chars_match_retokenize(chars_engine):
    """Searcher.highlights on a chars field uses stored spans (no
    re-tokenize) and produces the same snippets as the retokenize path
    with the same fragmenter."""
    from whoosh_ray.search.highlight import Highlighter, PinpointFragmenter

    for docid, term in [(0, "quick"), (1, "box"), (2, "quickly")]:
        via_spans = chars_engine.highlights(docid, "text", {term})
        text = chars_engine.stored(np.array([docid]),
                                   columns=["text"])["text"][0].as_py()
        hl = Highlighter(fragmenter=PinpointFragmenter())
        via_retok = hl.highlight(text, {term})
        assert via_spans == via_retok
        if term in text.lower():
            assert "<b" in via_spans


def test_rich_payloads_require_fused_mode(tmp_path):
    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True, chars=True),
    ), stored_columns=("doc_id",))
    pq.write_table(_table(), str(tmp_path / "src.parquet"))
    with pytest.raises(ValueError, match="fused"):
        build_index(str(tmp_path / "src.parquet"), str(tmp_path / "ix"),
                    schema, docid_col="doc_id", mode="stream")


def test_hit_highlights_chars_field_fragmenter_gate(chars_engine,
                                                    chars_oracle):
    """Hit.highlights on a chars=True field: the default
    ContextFragmenter must retokenize (reference can_load_chars gate,
    highlight.py:920-937), while Pinpoint + terms=True rides the stored
    char spans — both output-identical to the reference."""
    load_whoosh_oracle()
    from whoosh import highlight as wh
    from whoosh.query import Term as WTerm

    from whoosh_ray.search.highlight import PinpointFragmenter

    with chars_oracle.searcher() as s:
        mine = chars_engine.search(Term("text", "quick"), limit=5,
                                   terms=True)
        theirs = s.search(WTerm("text", "quick"), limit=5, terms=True)
        # default config: retokenize path on both sides
        for h, w in zip(mine.hits(), theirs):
            assert h.highlights("text") == w.highlights("text")
        # pinpoint: span-capable fragmenter -> stored-chars path
        mine.fragmenter = PinpointFragmenter()
        theirs.fragmenter = wh.PinpointFragmenter()
        for h, w in zip(mine.hits(), theirs):
            got, want = h.highlights("text"), w.highlights("text")
            assert got == want, (h.docid, got, want)
        assert any(h.highlights("text") for h in mine.hits())
