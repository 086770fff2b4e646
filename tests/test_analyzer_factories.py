"""Reference-named analyzer factories: token-stream parity with the
reference analyzers on shared texts (analyzers.py:117-296,
ngrams.py:223-237)."""

import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.functions import analysis as mya
from whoosh_ray.functions.analysis import VectorAnalyzer

TEXTS = [
    "Deploy the RENDER-cluster now, it's e2e ready!",
    "a an and or but",
    "batch.job-7 runs at 9:30pm (UTC+2)",
    "Die Häuser wurden schnell gebaut",
    "",
]


def _mine(spec, text):
    return VectorAnalyzer(spec).token_lists([text])[0]


def _ref(ana, text):
    return [t.text for t in ana(text)]


@pytest.fixture(scope="module")
def refa():
    load_whoosh_oracle()
    from whoosh import analysis as wa
    return wa


FACTORIES = [
    ("IDAnalyzer", (), {}),
    ("IDAnalyzer", (), {"lowercase": True}),
    ("KeywordAnalyzer", (), {}),
    ("KeywordAnalyzer", (), {"lowercase": True, "commas": True}),
    ("RegexAnalyzer", (), {}),
    ("RegexAnalyzer", (r"[a-zA-Z]+",), {"gaps": False}),
    ("SimpleAnalyzer", (), {}),
    ("StandardAnalyzer", (), {}),
    ("StandardAnalyzer", (), {"stoplist": None}),
    ("StandardAnalyzer", (), {"minsize": 3, "maxsize": 6}),
    ("StemmingAnalyzer", (), {}),
    ("FancyAnalyzer", (), {}),
    ("LanguageAnalyzer", ("de",), {}),
    ("NgramAnalyzer", (3,), {}),
    ("NgramAnalyzer", (2, 4), {}),
    ("NgramWordAnalyzer", (3,), {}),
    ("NgramWordAnalyzer", (2, 4), {}),
]


@pytest.mark.parametrize("name,args,kwargs", FACTORIES)
def test_factory_token_parity(refa, name, args, kwargs):
    spec = getattr(mya, name)(*args, **kwargs)
    ref = getattr(refa, name)(*args, **kwargs)
    for text in TEXTS:
        if name == "IDAnalyzer" and not text:
            continue  # our ID path skips empty values like None fields
        got, want = _mine(spec, text), _ref(ref, text)
        assert got == want, (name, args, kwargs, text, got, want)


def test_stemming_analyzer_named_stemfn(refa):
    from whoosh.lang.porter import stem as porter_stem

    spec = mya.StemmingAnalyzer(stemfn="porter", ignore=["rendering"])
    ref = refa.StemmingAnalyzer(stemfn=porter_stem, ignore=["rendering"])
    for text in TEXTS[:3]:
        assert _mine(spec, text) == _ref(ref, text), text
    with pytest.raises(TypeError):
        mya.StemmingAnalyzer(stemfn=porter_stem)
    # NgramWordAnalyzer(at=) routes through the ngram chain kind now
    # (parity in test_analysis_compat); a non-spec tokenizer still raises
    with pytest.raises(TypeError):
        mya.NgramWordAnalyzer(2, tokenizer=object())
