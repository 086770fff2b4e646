"""Alias of whoosh_ray.functions.morph_en (reference whoosh/lang/morph_en.py)."""

from whoosh_ray.functions.morph_en import *  # noqa: F401,F403
