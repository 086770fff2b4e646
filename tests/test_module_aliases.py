"""The reference's top-level module layout ports 1:1: every
``from whoosh.X import Y`` a reference user writes resolves as
``from whoosh_ray.X import Y``."""

import pytest

from tests.conftest import load_whoosh_oracle


@pytest.fixture(scope="module", autouse=True)
def _oracle():
    load_whoosh_oracle()


# (module, names a reference pipeline actually imports)
SURFACE = {
    "analysis": ["RegexTokenizer", "IDTokenizer", "SpaceSeparatedTokenizer",
                 "CommaSeparatedTokenizer", "PathTokenizer",
                 "CharsetTokenizer", "NgramTokenizer", "LowercaseFilter",
                 "StopFilter", "StemFilter", "PyStemmerFilter",
                 "CharsetFilter", "SubstitutionFilter", "ReverseTextFilter",
                 "NgramFilter", "DelimitedAttributeFilter",
                 "IntraWordFilter", "CompoundWordFilter", "BiWordFilter",
                 "ShingleFilter", "DoubleMetaphoneFilter", "TeeFilter",
                 "MultiFilter", "PassFilter", "LoggingFilter",
                 "StandardAnalyzer", "StemmingAnalyzer", "SimpleAnalyzer",
                 "FancyAnalyzer", "KeywordAnalyzer", "IDAnalyzer",
                 "RegexAnalyzer", "NgramAnalyzer", "NgramWordAnalyzer",
                 "LanguageAnalyzer", "STOP_WORDS", "Token", "unstopped",
                 "entoken", "CompositionError", "Composable",
                 "CompositeAnalyzer", "Tokenizer", "Analyzer", "Filter",
                 "stem", "double_metaphone", "rcompile",
                 "default_pattern"],
    "fields": ["TEXT", "ID", "KEYWORD", "IDLIST", "NUMERIC", "DATETIME",
               "BOOLEAN", "NGRAM", "NGRAMWORDS", "STORED", "Schema",
               "SchemaClass", "ensure_schema", "FieldType", "COLUMN",
               "merge_fielddict", "merge_schema", "merge_schemas",
               "to_sortable", "from_sortable", "datetime_to_long",
               "long_to_datetime"],
    "index": ["create_in", "open_dir", "exists_in", "version_in",
              "EmptyIndexError", "LockError", "IndexError",
              "IndexVersionError", "OutOfDateError", "TOC",
              "toc_loaders", "clean_files", "FileIndex",
              "ensure_schema"],
    "qparser": ["QueryParser", "MultifieldParser", "SimpleParser",
                "DisMaxParser", "OrGroup", "AndGroup", "GtLtPlugin",
                "PlusMinusPlugin", "FuzzyTermPlugin", "RegexPlugin",
                "SequencePlugin", "FieldAliasPlugin", "CopyFieldPlugin",
                "FunctionPlugin", "PseudoFieldPlugin", "DateParserPlugin",
                "PhrasePlugin", "WildcardPlugin", "OperatorsPlugin"],
    "query": ["Term", "And", "Or", "Not", "DisjunctionMax", "AndNot",
              "AndMaybe", "Require", "Otherwise", "Phrase", "Sequence",
              "Ordered", "Prefix", "Wildcard", "Regex", "FuzzyTerm",
              "Variations", "TermRange", "NumericRange", "DateRange",
              "Every", "NestedParent", "NestedChildren", "ColumnQuery",
              "SpanFirst", "SpanNear", "SpanNear2", "SpanOr", "SpanNot",
              "SpanContains", "SpanBefore", "SpanCondition", "Query",
              "QueryError", "TermNotFound", "NullQuery", "WrappingQuery",
              "CompoundQuery", "MultiTerm", "ExpandingTerm",
              "PatternQuery", "variations", "datetime_to_long",
              "long_to_datetime"],
    "searching": ["Searcher", "Results", "Hit", "ResultsPage",
                  "Collector", "SearchContext", "TimeLimit",
                  "NoTermsException", "BitSet", "DocIdSet"],
    "scoring": ["BM25F", "TF_IDF", "Frequency", "PL2", "DFree",
                "FunctionWeighting", "MultiWeighting", "ReverseWeighting",
                "WeightingModel", "WeightScorer", "WeightLengthScorer",
                "BaseScorer", "Weighting", "TF_IDFScorer", "DebugModel"],
    "sorting": ["FieldFacet", "QueryFacet", "RangeFacet", "DateRangeFacet",
                "ScoreFacet", "FunctionFacet", "TranslateFacet",
                "StoredFieldFacet", "MultiFacet", "Facets", "FacetType",
                "FacetMap", "Count", "Best", "OrderedList", "UnorderedList",
                "add_sortable"],
    "highlight": ["Highlighter", "WholeFragmenter", "SentenceFragmenter",
                  "ContextFragmenter", "PinpointFragmenter",
                  "HtmlFormatter", "UppercaseFormatter", "NullFormatter",
                  "GenshiFormatter", "BasicFragmentScorer", "highlight",
                  "SCORE", "FIRST", "LONGER", "SHORTER"],
    "spelling": ["Corrector", "ReaderCorrector", "ListCorrector",
                 "MultiCorrector", "QueryCorrector", "SimpleQueryCorrector",
                 "Correction"],
    "classify": ["ExpansionModel", "Bo1Model", "Bo2Model", "KLModel",
                 "Expander"],
    "reading": ["IndexReader", "MultiReader", "TermInfo", "TermNotFound",
                "ReaderClosed", "EmptyReader", "MultiCursor",
                "combine_terminfos", "SegmentReader", "OverlayStorage",
                "TermCursor", "ColumnReader"],
    "collectors": ["Collector", "TimeLimitCollector", "TimeExceeded"],
    "idsets": ["DocIdSet", "BaseBitSet", "BitSet", "OnDiskBitSet",
               "SortedIntSet", "MultiIdSet", "RoaringIdSet",
               "bytes_for_bits"],
    "writing": ["IndexWriter", "AsyncWriter", "BufferedWriter",
                "BatchWriter", "CLEAR", "MERGE_SMALL", "NO_MERGE",
                "OPTIMIZE", "LockError", "IndexingError",
                "UnknownFieldError", "fib", "random_name", "add_spelling",
                "PostingPool", "SortingPool", "SegmentWriter",
                "groupmanager", "try_for"],
    "util": ["rcompile", "fib", "to_sortable", "from_sortable",
             "datetime_to_long", "long_to_datetime", "make_binary_tree",
             "make_weighted_tree", "synchronized", "random_name",
             "random_bytes"],
    "formats": ["Format", "Existence", "Frequency", "Positions",
                "Characters", "PositionBoosts", "CharacterBoosts"],
    "lang": ["languages", "aliases", "two_letter_code", "has_stemmer",
             "has_stopwords", "stemmer_for_language",
             "stopwords_for_language", "NoStemmer", "NoStopWords"],
    "support.charset": ["accent_map", "charset_table_to_dict",
                        "default_charset", "charspec_to_int"],
    "columns": ["Column", "VarBytesColumn", "FixedBytesColumn",
                "RefBytesColumn", "NumericColumn", "BitColumn",
                "CompressedBytesColumn", "StructColumn", "PickleColumn",
                "VarBytesListColumn", "FixedBytesListColumn",
                "ClampedNumericColumn", "ColumnWriter", "ColumnReader",
                "EmptyColumnReader", "MultiColumnReader",
                "TranslatingColumnReader", "ListColumnReader",
                "BitSet", "OnDiskBitSet", "GrowableArray"],
    "matching.wrappers": ["WrappingMatcher", "MultiMatcher",
                          "FilterMatcher", "ExcludeMatcher",
                          "InverseMatcher", "RequireMatcher",
                          "ConstantScoreWrapperMatcher",
                          "SingleTermMatcher", "CoordMatcher"],
    "query.spans": ["Span", "SpanFirst", "SpanNear", "SpanNear2",
                    "SpanOr", "SpanNot", "SpanContains", "SpanBefore",
                    "SpanCondition", "SpanQuery", "WrappingSpan",
                    "bisect_spans", "And", "AndMaybe", "Or", "Query",
                    "Term", "make_binary_tree"],
    "codec.base": ["Codec", "Segment", "TermInfo", "FieldCursor",
                   "EmptyCursor", "OutOfOrderError", "W3Codec",
                   "default_codec"],
    "matching": ["Matcher", "NullMatcher", "NullMatcherClass",
                 "ListMatcher", "ConstantScoreMatcher", "ReadTooFar",
                 "NoQualityAvailable", "BiMatcher", "AdditiveBiMatcher",
                 "UnionMatcher", "DisjunctionMaxMatcher",
                 "IntersectionMatcher", "AndNotMatcher", "AndMaybeMatcher",
                 "WrappingMatcher", "MultiMatcher", "FilterMatcher",
                 "ExcludeMatcher", "InverseMatcher", "RequireMatcher",
                 "ConstantScoreWrapperMatcher", "SingleTermMatcher",
                 "CoordMatcher", "CombinationMatcher",
                 "PreloadedUnionMatcher", "ArrayUnionMatcher"],
    "externalsort": ["SortingPool", "imerge", "sort"],
    "compat": ["u", "b", "text_type", "bytes_type", "string_type",
               "integer_types", "iteritems", "itervalues", "iterkeys",
               "xrange", "izip", "unichr", "byte", "dumps", "loads",
               "dump", "load", "BytesIO", "StringIO", "htmlescape",
               "with_metaclass", "memoryview_", "array_tobytes",
               "array_frombytes", "permutations"],
    "system": ["IS_LITTLE", "emptybytes", "pack_byte", "pack_int",
               "pack_uint", "pack_uint_le", "pack_ushort",
               "pack_ushort_le", "pack_long", "pack_ulong", "pack_float",
               "pack_double", "unpack_byte", "unpack_int", "unpack_uint",
               "unpack_ushort", "unpack_long", "unpack_float"],
    "codec": ["default_codec"],
    "codec.whoosh3": ["W3Codec"],
    "codec.plaintext": ["PlainTextCodec"],
    "codec.memory": ["MemoryCodec"],
    "filedb.structfile": ["StructFile", "BufferFile", "ChecksumFile"],
    "filedb.filestore": ["FileStorage", "RamStorage", "OverlayStorage",
                         "Storage", "ReadOnlyError", "FileLock",
                         "StructFile", "BufferFile", "copy_storage",
                         "copy_to_ram"],
    "util.numlists": ["delta_encode", "delta_decode", "GrowableArray",
                      "NumberEncoding", "FixedEncoding", "ByteEncoding",
                      "UShortEncoding", "UIntEncoding", "Varints",
                      "Simple16", "GInts"],
    "util.testing": ["TempDir", "TempStorage", "TempIndex",
                     "is_abstract_method", "check_abstract_methods",
                     "timing"],
    "util.varints": ["varint", "signed_varint", "decode_signed_varint",
                     "read_varint"],
    "support.base85": ["b85chars", "b85dec", "to_base85", "from_base85",
                       "b85encode", "b85decode"],
    "support.unicode": ["blocks", "blockname", "blocknum", "digits",
                        "lowercase", "uppercase"],
    "support.relativedelta": ["relativedelta"],
    "automata.fsa": ["EPSILON", "ANY", "FSA", "NFA", "DFA",
                     "renumber_dfa", "u_to_utf8", "find_all_matches",
                     "reverse_nfa", "product", "intersection", "union",
                     "epsilon_nfa", "dot_nfa", "basic_nfa", "charset_nfa",
                     "string_nfa", "choice_nfa", "concat_nfa", "star_nfa",
                     "plus_nfa", "optional_nfa", "strings_dfa"],
    "automata.glob": ["parse_glob", "glob_automaton"],
    "automata.lev": ["levenshtein_automaton"],
}


def test_every_surface_name_importable():
    import importlib

    missing = []
    for mod, names in SURFACE.items():
        m = importlib.import_module(f"whoosh_ray.{mod}")
        for n in names:
            if not hasattr(m, n):
                missing.append(f"whoosh_ray.{mod}.{n}")
    assert not missing, missing


def test_fib_matches_reference():
    from whoosh.util import fib as ref_fib

    from whoosh_ray.writing import fib

    assert [fib(i) for i in range(1, 21)] == [
        ref_fib(i) for i in range(1, 21)]


def test_unknown_field_error(tmp_path):
    from whoosh_ray import index as wix
    from whoosh_ray.state.schema import FieldSpec, IndexSchema
    from whoosh_ray.writing import UnknownFieldError

    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True),
        FieldSpec.id("conv_id", stored=True),
    ), stored_columns=("turn_idx",))
    ix = wix.create_in(str(tmp_path), schema, seg_size=512)
    w = ix.writer()
    w.add_document(text="ok", conv_id="c1", turn_idx=0)   # fine
    with pytest.raises(UnknownFieldError):
        w.add_document(text="x", conv_id="c2", turn_idx=0, bogus="nope")
    w.commit()


def test_unknown_field_error_respects_globs(tmp_path):
    from whoosh_ray import index as wix
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True),
        FieldSpec.id("conv_id", stored=True),
    ), stored_columns=("turn_idx",),
        glob_fields=(("tag_*", FieldSpec.id("tag_*", stored=True)),))
    ix = wix.create_in(str(tmp_path), schema, seg_size=512)
    w = ix.writer()
    w.add_document(text="ok", conv_id="c1", turn_idx=0, tag_lang="en")
    w.commit()
    with ix.searcher() as s:
        from whoosh_ray.query import Term

        assert len(s.search(Term("tag_lang", "en"), limit=5).docids) == 1
