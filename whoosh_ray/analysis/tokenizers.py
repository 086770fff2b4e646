"""Reference-layout shim (whoosh/analysis/tokenizers.py)."""
from whoosh_ray.analysis import (  # noqa: F401
    CharsetTokenizer, CommaSeparatedTokenizer, Composable, IDTokenizer,
    PathTokenizer, RegexTokenizer, SpaceSeparatedTokenizer, Token,
    Tokenizer, default_pattern, rcompile)
