"""Reference-layout shim (whoosh/analysis/intraword.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    BiWordFilter, CompoundWordFilter, Filter, IntraWordFilter,
    ShingleFilter)
