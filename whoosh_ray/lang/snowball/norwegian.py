"""Reference-layout shim (whoosh/lang/snowball/norwegian.py):
the Norwegian Snowball stemmer as a class.  The algorithm itself is the
vectors-of-steps implementation in whoosh_ray/functions/snowball.py
(``stem_no``), fuzz-pinned per language against the reference
(tests/test_language.py, including its degradation quirks)."""

from whoosh_ray.functions.snowball import stem_no
from whoosh_ray.lang.snowball.bases import _ScandinavianStemmer


class NorwegianStemmer(_ScandinavianStemmer):
    def stem(self, word: str) -> str:
        return stem_no(word)
