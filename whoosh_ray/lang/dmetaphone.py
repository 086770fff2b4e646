"""Alias of whoosh_ray.functions.dmetaphone (reference whoosh/lang/dmetaphone.py)."""

from whoosh_ray.functions.dmetaphone import *  # noqa: F401,F403
