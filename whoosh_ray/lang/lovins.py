"""Alias of whoosh_ray.functions.lovins (reference whoosh/lang/lovins.py)."""

from whoosh_ray.functions.lovins import *  # noqa: F401,F403
