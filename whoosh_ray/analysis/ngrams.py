"""Reference-layout shim (whoosh/analysis/ngrams.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    Filter, LowercaseFilter, NgramAnalyzer, NgramFilter, NgramTokenizer,
    NgramWordAnalyzer, RegexTokenizer, Token, Tokenizer)
