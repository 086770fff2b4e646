"""Reference-layout shim (whoosh/analysis/morph.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    DoubleMetaphoneFilter, Filter, PyStemmerFilter, StemFilter,
    double_metaphone, stem)
from whoosh_ray.util.cache import lfu_cache, unbound_cache  # noqa: F401
