"""Drop-in highlight surface (reference whoosh/highlight.py names);
implementations live in whoosh_ray.search.highlight."""

from whoosh_ray.search.highlight import *  # noqa: F401,F403
from whoosh_ray.search.highlight import (  # noqa: F401
    FIRST,
    LONGER,
    SCORE,
    SHORTER,
    BasicFragmentScorer,
    ContextFragmenter,
    Formatter,
    Fragment,
    Fragmenter,
    FragmentScorer,
    GenshiFormatter,
    Highlighter,
    HtmlFormatter,
    NullFormatter,
    NullFragmeter,
    PinpointFragmenter,
    SentenceFragmenter,
    UppercaseFormatter,
    WholeFragmenter,
    highlight,
)
