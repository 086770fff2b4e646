"""Reference-layout shim (whoosh/lang/snowball/english.py):
the English Snowball stemmer as a class.  The algorithm itself is the
vectors-of-steps implementation in whoosh_ray/functions/snowball.py
(``stem_en``), fuzz-pinned per language against the reference
(tests/test_language.py, including its degradation quirks)."""

from whoosh_ray.functions.snowball import stem_en
from whoosh_ray.lang.snowball.bases import _StandardStemmer


class EnglishStemmer(_StandardStemmer):
    def stem(self, word: str) -> str:
        return stem_en(word)
