"""Reference-layout shim (whoosh/analysis/acore.py): the core
composition types live in the package root here."""
from whoosh_ray.analysis import (  # noqa: F401
    Composable, CompositionError, Token, entoken, unstopped)
