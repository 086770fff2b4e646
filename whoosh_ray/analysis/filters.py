"""Reference-layout shim (whoosh/analysis/filters.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    STOP_WORDS, CharsetFilter, Composable, DelimitedAttributeFilter,
    Filter, LoggingFilter, LowercaseFilter, MultiFilter, PassFilter,
    ReverseTextFilter, StopFilter, StripFilter, SubstitutionFilter,
    TeeFilter, rcompile, url_pattern)
