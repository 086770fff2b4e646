"""Reference-layout shim (whoosh/analysis/ngrams.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    NgramAnalyzer, NgramFilter, NgramTokenizer, NgramWordAnalyzer)
