"""Reference-layout shim (whoosh/analysis/analyzers.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    Analyzer, CompositeAnalyzer, FancyAnalyzer, IDAnalyzer,
    KeywordAnalyzer, LanguageAnalyzer, RegexAnalyzer, SimpleAnalyzer,
    StandardAnalyzer, StemmingAnalyzer)
