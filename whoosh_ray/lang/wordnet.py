"""Alias of whoosh_ray.functions.wordnet (reference whoosh/lang/wordnet.py)."""

from whoosh_ray.functions.wordnet import *  # noqa: F401,F403


# the reference module builds an index over the thesaurus with these
# (lang/wordnet.py:33): re-exported so that import style keeps working
from whoosh_ray.fields import ID, STORED, Schema  # noqa: E402,F401
