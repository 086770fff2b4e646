"""Second API-surface sweep: reference-layout submodules
(analysis.*, lang.snowball.*, multiproc, columns), versionstring,
writing/formats/idsets module-level additions."""

import pytest


def test_analysis_submodules_mirror_reference_layout(whoosh_oracle):
    import importlib

    # every public class the reference submodule exposes resolves from
    # OUR submodule of the same name
    for sub in ("acore", "tokenizers", "filters", "analyzers", "morph",
                "ngrams", "intraword"):
        ref = importlib.import_module(f"whoosh.analysis.{sub}")
        mine = importlib.import_module(f"whoosh_ray.analysis.{sub}")
        for n in dir(ref):
            obj = getattr(ref, n)
            if (n.startswith("_") or not isinstance(obj, type)
                    or getattr(obj, "__module__", "") != ref.__name__):
                continue
            assert hasattr(mine, n), (sub, n)
    from whoosh_ray.analysis import url_pattern
    from whoosh_ray.analysis.filters import url_pattern as up2

    assert up2 is url_pattern
    assert url_pattern.match("http://example.com/x")


def test_snowball_classes(whoosh_oracle):
    from whoosh.lang.snowball import classes as ref_classes

    from whoosh_ray.lang.snowball import classes

    assert set(classes) == set(ref_classes)
    for code, cls in classes.items():
        for w in ("deployment", "stemming", "aufeinander", "corriendo"):
            mine = cls().stem(w)
            ref = ref_classes[code]().stem(w)
            assert mine == ref, (code, w, mine, ref)
    from whoosh_ray.lang.snowball.english import EnglishStemmer

    assert EnglishStemmer().stem("running") == "run"


def test_multiproc_writers(tmp_path):
    from whoosh_ray import index as wix
    from whoosh_ray.multiproc import MpWriter, MultiSegmentWriter
    from whoosh_ray.search.query import Term
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    schema = IndexSchema(
        fields=(FieldSpec.text("text", stored=True),
                FieldSpec.id("conv_id", stored=True)),
        stored_columns=("turn_idx",))
    ix = wix.create_in(str(tmp_path), schema, seg_size=512)
    with MpWriter(ix, procs=4, batchsize=10) as w:
        for i in range(20):
            w.add_document(text=f"deploy item {i}", conv_id=f"c{i:03d}",
                           turn_idx=0)
    assert ix.refresh().doc_count_all() == 20
    with ix.searcher() as s:
        assert len(s.search(Term("text", "deploy"), limit=None)) == 20

    w2 = MultiSegmentWriter(ix, procs=2)
    assert w2.multisegment is True
    w2.cancel()


def test_columns_markers_and_reader(tmp_path):
    import whoosh_ray.columns as columns
    from whoosh_ray import index as wix
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    # marker constructors with reference signatures
    assert columns.VarBytesColumn().default_value() == b""
    assert columns.FixedBytesColumn(4).default_value() == b"\x00" * 4
    assert columns.NumericColumn("q").default_value(reverse=True) == 0
    assert columns.BitColumn().default_value(reverse=True) is True
    assert columns.VarBytesListColumn().stores_lists()
    assert columns.PickleColumn(columns.VarBytesColumn()).stores_lists() \
        is False

    # the real per-document reader over a built index
    schema = IndexSchema(
        fields=(FieldSpec.text("text", stored=True),
                FieldSpec.id("conv_id", stored=True)),
        stored_columns=("turn_idx",))
    ix = wix.create_in(str(tmp_path), schema, seg_size=512)
    with ix.writer() as w:
        for i in range(5):
            w.add_document(text=f"t {i}", conv_id=f"c{i}", turn_idx=i)
    with ix.refresh().searcher() as s:
        cr = columns.ColumnReader(s, "turn_idx")
        assert len(cr) == 5 and cr[3] == 3
        assert [v for v in cr] == [0, 1, 2, 3, 4]


def test_versionstring_and_writing_names():
    import whoosh_ray
    from whoosh_ray.writing import (SegmentWriter, IndexWriter,
                                    groupmanager, try_for)

    assert whoosh_ray.versionstring() == "0.1.0"
    assert whoosh_ray.versionstring(build=False) == "0.1"
    assert SegmentWriter is IndexWriter
    assert callable(groupmanager) and callable(try_for)

    from whoosh_ray.idsets import ROARING_CUTOFF

    assert ROARING_CUTOFF == 1 << 12


def test_formats_tokens_helper():
    from whoosh_ray.formats import tokens
    from whoosh_ray.functions.analysis import StandardAnalyzer

    out = [(t.text, t.pos)
           for t in tokens("The Quick brown fox", StandardAnalyzer(), {})]
    assert out == [("quick", 1), ("brown", 2), ("fox", 3)]
    out2 = [(t.text, t.pos)
            for t in tokens(["a", "b"], None, {"positions": True})]
    assert out2 == [("a", 0), ("b", 1)]


def test_index_accepts_storage(tmp_path):
    from whoosh_ray.filedb.filestore import FileStorage
    from whoosh_ray.index import FileIndex
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    schema = IndexSchema(fields=(FieldSpec.id("conv_id", stored=True),),
                         stored_columns=("turn_idx",))
    st = FileStorage(str(tmp_path)).create()
    st.create_index(schema, seg_size=512)
    ix = FileIndex(st)  # reference FileIndex(storage) ctor shape
    assert ix.doc_count_all() == 0


def test_small_surface_sweep_round5():
    """Round-5 method-sweep leftovers: JOINT constants, WeightingModel
    .idf, Expander.add, FacetType.map, Formatter.clean, fragmenter
    fragment_matches, analyzer morph flags."""
    from whoosh_ray.analysis import (RegexTokenizer, StandardAnalyzer,
                                     StemFilter, StemmingAnalyzer)
    from whoosh_ray.query import And, DisjunctionMax, Or
    from whoosh_ray.search.classify import Expander
    from whoosh_ray.search.facets import Count, FieldFacet, OrderedList
    from whoosh_ray.search.highlight import (ContextFragmenter,
                                             HtmlFormatter,
                                             PinpointFragmenter, Token)

    assert (And.JOINT, Or.JOINT, DisjunctionMax.JOINT) == (
        " AND ", " OR ", " dOR ")

    # WeightingModel.idf == the engine's idf (log(N/(df+1))+1)
    from whoosh_ray.scoring import BM25F
    assert callable(BM25F().idf)

    # Expander.add consumes (text, weight) forward vectors
    class _FakeSearcher:
        doc_count_all = 10

        class manifest:
            @staticmethod
            def field_length(f):
                return 100

        class schema:
            @staticmethod
            def field(name):
                from whoosh_ray.state.schema import FieldSpec

                return FieldSpec.text("text")

    e = Expander(_FakeSearcher(), "text")
    e.add([("deploy", 2.0), ("render", 1.0)])
    assert e.topN_weight["deploy"] == 2.0 and e.top_total == 3.0

    # FacetType.map resolution order: own maptype > default > OrderedList
    f = FieldFacet("role")
    assert isinstance(f.map(), OrderedList)
    assert isinstance(f.map(Count), Count)
    f2 = FieldFacet("role", maptype=Count)
    assert isinstance(f2.map(OrderedList), Count)

    # formatter clean() resets term classes
    hf = HtmlFormatter()
    hf.seen["deploy"] = 3
    hf.clean()
    assert hf.seen == {}

    # fragment_matches: pinpoint implements, context raises (reference
    # base Fragmenter.fragment_matches raises, highlight.py:289-298)
    pf = PinpointFragmenter()
    frags = pf.fragment_matches("deploy the render",
                                [Token("deploy", 0, 6),
                                 Token("render", 11, 17)])
    assert len(frags) == 1 and frags[0].matched_terms == {"deploy",
                                                          "render"}
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        ContextFragmenter().fragment_matches("x", [])

    # morph flags (reference acore.py:138, analyzers.py:111)
    assert StemFilter().is_morph and StemFilter().has_morph()
    assert StemmingAnalyzer().has_morph()
    assert not StandardAnalyzer().has_morph()
    assert not RegexTokenizer().has_morph()
