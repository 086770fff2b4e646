"""Reference-layout shim (whoosh/lang/snowball/danish.py):
the Danish Snowball stemmer as a class.  The algorithm itself is the
vectors-of-steps implementation in whoosh_ray/functions/snowball.py
(``stem_da``), fuzz-pinned per language against the reference
(tests/test_language.py, including its degradation quirks)."""

from whoosh_ray.functions.snowball import stem_da
from whoosh_ray.lang.snowball.bases import _ScandinavianStemmer


class DanishStemmer(_ScandinavianStemmer):
    def stem(self, word: str) -> str:
        return stem_da(word)
