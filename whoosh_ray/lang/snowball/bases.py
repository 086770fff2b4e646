"""Reference-layout shim (whoosh/lang/snowball/bases.py): the two
stemmer base classes.  They exist so ``isinstance`` checks and
subclassing in ported user code keep working; the per-language
region helpers live in whoosh_ray/functions/snowball.py
(_r1_scand/_r1r2/_rv)."""


class _ScandinavianStemmer:
    def stem(self, word: str) -> str:  # pragma: no cover - abstract
        raise NotImplementedError


class _StandardStemmer:
    def stem(self, word: str) -> str:  # pragma: no cover - abstract
        raise NotImplementedError
