"""Drop-in classify surface (reference whoosh/classify.py names);
implementations live in whoosh_ray.search.classify."""

from whoosh_ray.search.classify import *  # noqa: F401,F403
from whoosh_ray.search.classify import (  # noqa: F401
    Bo1Model,
    Bo2Model,
    Expander,
    ExpansionModel,
    KLModel,
)
