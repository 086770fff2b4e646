"""Reference-layout shim (whoosh/analysis/filters.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    STOP_WORDS, CharsetFilter, DelimitedAttributeFilter, Filter,
    LoggingFilter, LowercaseFilter, MultiFilter, PassFilter,
    ReverseTextFilter, StopFilter, StripFilter, SubstitutionFilter,
    TeeFilter, url_pattern)
