"""Alias of whoosh_ray.functions.porter (reference whoosh/lang/porter.py)."""

from whoosh_ray.functions.porter import *  # noqa: F401,F403
