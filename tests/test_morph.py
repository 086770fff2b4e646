"""variations() parity vs the reference LiteMorph_en (VERDICT r1 #8) —
word-set AND type/order parity, plus the Variations query against the
whoosh oracle."""

import numpy as np
import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.functions.morph_en import variations


@pytest.fixture(scope="module")
def ref_variations():
    load_whoosh_oracle()
    from whoosh.lang.morph_en import variations as rv

    return rv


WORDS = [
    # exceptions (incl. multiword lines + identity lines)
    "abandon", "abandoning", "be", "was", "analysis", "analyses", "a",
    "you", "worse",
    # rule families
    "pull", "happiness", "baseless", "render", "deploys", "deployed",
    "tries", "tokenizes", "tokenises", "crisis", "kiss", "albatross",
    "arches", "spoon", "rhythm", "full", "data", "schemata", "polka",
    "betray", "bed", "cop", "open", "fix", "rash", "joyous", "bronchitis",
    "gutless", "thoughtless", "bluntness", "grayness",
    # odd inputs
    "x", "", "zzzz", "qqq", "123", "run4", "deploy",
]


def test_variations_parity(ref_variations):
    for w in WORDS:
        mine = variations(w)
        theirs = ref_variations(w)
        assert type(mine) is type(theirs), (w, type(mine), type(theirs))
        assert list(mine) == list(theirs), w


def test_variations_fuzz_parity(ref_variations):
    rng = np.random.default_rng(21)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    for _ in range(3000):
        n = int(rng.integers(1, 12))
        w = "".join(rng.choice(letters, n))
        assert list(variations(w)) == list(ref_variations(w)), w


def test_variations_query_oracle(tmp_path):
    import pyarrow.parquet as pq

    from tests.oracle import build_oracle_index, oracle_search
    from whoosh_ray.pipelines.build import build_index
    from whoosh_ray.search import Searcher, Variations
    from whoosh_ray.sources.transcripts import generate_transcripts
    from whoosh_ray.state.schema import transcripts_schema

    corpus = generate_transcripts(n_convs=30, seed=42)
    (tmp_path / "src").mkdir()
    pq.write_table(corpus, str(tmp_path / "src" / "p.parquet"))
    build_index(str(tmp_path / "src"), str(tmp_path / "ix"),
                transcripts_schema(), seg_size=64)
    s = Searcher(str(tmp_path / "ix"))
    oracle = build_oracle_index(corpus, text_fields=("text",),
                                id_fields=("role", "tool", "conv_id"))
    from whoosh import query as wq

    for word in ["deploy", "render", "cluster", "error", "deployed",
                 "rendering"]:
        mine = [(int(d), float(sc))
                for d, sc in s.search(Variations("text", word), limit=20).pairs()]
        ref = oracle_search(oracle, wq.Variations("text", word), limit=20)
        assert [d for d, _ in mine] == [d for d, _ in ref], word
        np.testing.assert_allclose([sc for _, sc in mine],
                                   [sc for _, sc in ref],
                                   rtol=1e-9, atol=1e-12)
