"""Alias of whoosh_ray.functions.isri (reference whoosh/lang/isri.py)."""

from whoosh_ray.functions.isri import *  # noqa: F401,F403


class ISRIStemmer:
    """Class form of the ISRI Arabic stemmer (reference lang/isri.py
    wraps NLTK's class); the algorithm is the function in
    whoosh_ray/functions/isri.py, fuzz-pinned against the reference."""

    def stem(self, word: str) -> str:
        from whoosh_ray.functions.isri import stem_ar

        return stem_ar(word)
