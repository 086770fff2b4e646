"""Reference-layout shim (whoosh/analysis/tokenizers.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    CharsetTokenizer, CommaSeparatedTokenizer, IDTokenizer, PathTokenizer,
    RegexTokenizer, SpaceSeparatedTokenizer, Tokenizer, default_pattern)
