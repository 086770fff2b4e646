"""Alias of the generated stop-list tables (reference
whoosh/lang/stopwords.py `stoplists` dict)."""

from whoosh_ray.functions.lang_stopwords_data import STOPLISTS

stoplists = {k: frozenset(v) for k, v in STOPLISTS.items()}
