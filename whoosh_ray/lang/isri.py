"""Alias of whoosh_ray.functions.isri (reference whoosh/lang/isri.py)."""

from whoosh_ray.functions.isri import *  # noqa: F401,F403
