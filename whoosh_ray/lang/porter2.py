"""Alias of whoosh_ray.functions.porter2 (reference whoosh/lang/porter2.py)."""

from whoosh_ray.functions.porter2 import *  # noqa: F401,F403
