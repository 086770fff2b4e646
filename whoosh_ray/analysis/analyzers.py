"""Reference-layout shim (whoosh/analysis/analyzers.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    STOP_WORDS, Analyzer, CommaSeparatedTokenizer, Composable,
    CompositeAnalyzer, CompositionError, FancyAnalyzer, IDAnalyzer,
    IDTokenizer, IntraWordFilter, KeywordAnalyzer, LanguageAnalyzer,
    LowercaseFilter, RegexAnalyzer, RegexTokenizer, SimpleAnalyzer,
    SpaceSeparatedTokenizer, StandardAnalyzer, StemFilter,
    StemmingAnalyzer, StopFilter, Tokenizer, default_pattern, stem)
