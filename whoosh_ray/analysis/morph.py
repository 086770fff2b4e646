"""Reference-layout shim (whoosh/analysis/morph.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    DoubleMetaphoneFilter, PyStemmerFilter, StemFilter)
