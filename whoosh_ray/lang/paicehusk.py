"""Alias of whoosh_ray.functions.paicehusk (reference whoosh/lang/paicehusk.py)."""

from whoosh_ray.functions.paicehusk import *  # noqa: F401,F403
