"""Alias of whoosh_ray.functions.wordnet (reference whoosh/lang/wordnet.py)."""

from whoosh_ray.functions.wordnet import *  # noqa: F401,F403
