"""Drop-in scoring surface (reference whoosh/scoring.py names); the
implementations live in whoosh_ray.search.scoring."""

from whoosh_ray.search.scoring import *  # noqa: F401,F403
from whoosh_ray.search.scoring import (  # noqa: F401
    BM25F,
    PL2,
    TF_IDF,
    BaseScorer,
    DFree,
    DebugModel,
    Frequency,
    FunctionWeighting,
    MultiWeighting,
    ReverseWeighting,
    WeightingModel,
    WeightLengthScorer,
    WeightScorer,
    Weighting,
)

#: reference scoring.py TF_IDFScorer name
TF_IDFScorer = TFIDFScorer  # noqa: F405
