"""Alias of whoosh_ray.functions.phonetic (reference whoosh/lang/phonetic.py)."""

from whoosh_ray.functions.phonetic import *  # noqa: F401,F403
