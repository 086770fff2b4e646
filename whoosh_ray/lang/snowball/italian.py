"""Reference-layout shim (whoosh/lang/snowball/italian.py):
the Italian Snowball stemmer as a class.  The algorithm itself is the
vectors-of-steps implementation in whoosh_ray/functions/snowball.py
(``stem_it``), fuzz-pinned per language against the reference
(tests/test_language.py, including its degradation quirks)."""

from whoosh_ray.functions.snowball import stem_it
from whoosh_ray.lang.snowball.bases import _StandardStemmer


class ItalianStemmer(_StandardStemmer):
    def stem(self, word: str) -> str:
        return stem_it(word)
