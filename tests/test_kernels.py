"""Unit tests for the vectorized kernels (varint, lengths, codec, analyzer)."""

import numpy as np
import pytest

from whoosh_ray.functions import varint
from whoosh_ray.functions.analysis import STANDARD, VectorAnalyzer
from whoosh_ray.functions.lengths import BYTE_TO_LENGTH, byte_to_length, length_to_byte
from whoosh_ray.state import codec


def test_varint_roundtrip():
    rng = np.random.default_rng(0)
    for n in [0, 1, 5, 1000, 100000]:
        v = rng.integers(0, 2 ** 40, n)
        assert np.array_equal(varint.decode(varint.encode(v), n), v)


def test_varint_deltas():
    rng = np.random.default_rng(1)
    v = np.sort(rng.choice(10 ** 9, 5000, replace=False))
    assert np.array_equal(varint.decode_deltas(varint.encode_deltas(v), 5000), v)


def test_length_table_matches_reference():
    from tests.conftest import load_whoosh_oracle

    load_whoosh_oracle()
    from whoosh.util.numeric import _length_byte_cache
    from whoosh.util.numeric import length_to_byte as w_l2b

    assert np.array_equal(BYTE_TO_LENGTH, np.asarray(_length_byte_cache))
    ls = np.concatenate([np.arange(0, 2000),
                         np.array([106373, 106374, 106375, 10 ** 7])])
    assert np.array_equal(length_to_byte(ls),
                          np.array([w_l2b(int(x)) for x in ls]))
    assert byte_to_length(np.array([0, 255])).tolist() == [0, 106374]


def test_codec_roundtrip_and_block_decode():
    rng = np.random.default_rng(2)
    for n in [1, 127, 128, 129, 1000, 50000]:
        ids = np.sort(rng.choice(10 ** 9, n, replace=False))
        tfs = rng.integers(1, 50, n)
        lens = rng.integers(0, 256, n).astype(np.uint8)
        r = codec.BlobReader(codec.encode_postings(ids, tfs, lens))
        p = r.decode_all()
        assert np.array_equal(p.docids, ids)
        assert np.array_equal(p.tfs, tfs)
        assert np.array_equal(p.len_bytes, lens)
        # per-block stats
        d = r.dir
        starts = np.arange(0, n, codec.BLOCK_SIZE)
        assert np.array_equal(d.last_docids,
                              ids[np.minimum(starts + codec.BLOCK_SIZE, n) - 1])
        mask = rng.random(d.nblocks) < 0.5
        sel = np.zeros(n, bool)
        for bi in np.flatnonzero(mask):
            sel[starts[bi]: starts[bi] + codec.BLOCK_SIZE] = True
        p2 = r.decode_blocks(mask)
        assert np.array_equal(p2.docids, ids[sel])
        assert np.array_equal(p2.tfs, tfs[sel])


def test_batch_encode_matches_per_term():
    rng = np.random.default_rng(5)
    # synthesize a sorted multi-term posting stream
    n_terms = 57
    dfs = rng.integers(1, 400, n_terms)
    parts_ids, parts_tfs, parts_lens, starts = [], [], [], []
    pos = 0
    for df in dfs:
        starts.append(pos)
        parts_ids.append(np.sort(rng.choice(10 ** 7, int(df), replace=False)))
        parts_tfs.append(rng.integers(1, 9, int(df)))
        parts_lens.append(rng.integers(0, 256, int(df)).astype(np.uint8))
        pos += int(df)
    ids = np.concatenate(parts_ids)
    tfs = np.concatenate(parts_tfs)
    lens = np.concatenate(parts_lens)
    starts = np.array(starts)
    batch = codec.encode_postings_batch(ids, tfs, lens, starts)
    for i, df in enumerate(dfs):
        one = codec.encode_postings(parts_ids[i], parts_tfs[i], parts_lens[i])
        assert batch[i] == one, f"term {i} blob differs"
    # positions batch vs per-posting
    pos_lists = [np.sort(rng.choice(1000, int(t), replace=False)) for t in tfs]
    pos_flat = np.concatenate(pos_lists)
    offs = np.concatenate(([0], np.cumsum([len(p) for p in pos_lists])))
    ends = np.append(starts[1:], len(ids))
    pbatch = codec.encode_positions_batch(pos_flat, offs, starts, ends)
    for i in range(n_terms):
        s, e = int(starts[i]), int(ends[i])
        one = codec.encode_positions(pos_lists[s:e])
        assert pbatch[i] == one, f"term {i} positions differ"


def test_positions_roundtrip():
    rng = np.random.default_rng(3)
    tfs = rng.integers(1, 10, 200)
    pos = [np.sort(rng.choice(500, int(t), replace=False)) for t in tfs]
    back = codec.decode_positions(codec.encode_positions(pos), tfs)
    assert all(np.array_equal(a, b) for a, b in zip(pos, back))


def test_analyzer_matches_reference_standard_analyzer():
    from tests.conftest import load_whoosh_oracle

    load_whoosh_oracle()
    from whoosh.analysis import StandardAnalyzer

    wa = StandardAnalyzer()
    va = VectorAnalyzer(STANDARD)
    import random

    random.seed(7)
    vocab = ["the", "a", "deploy", "render", "Alpha", "beta-3", "x", "of",
             "TBD", "t.b.d", "Big-Time", "under_score", "3.141", "naïve"]
    texts = [
        "Hello, World! The quick fox 3.141 big-time under_score a I xy",
        "THE the To tO TBD us YOUR rendering e-mail user@example.com",
        "", "a", "multi.part.token    spaces\ttabs\nnewlines",
    ] + [" ".join(random.choices(vocab, k=random.randint(0, 30)))
         for _ in range(100)]
    tb = va(texts)
    cuts = np.concatenate(([0], np.cumsum(tb.row_lengths)))
    for i, t in enumerate(texts):
        ref = [(tok.text, tok.pos) for tok in wa(t, positions=True)]
        mine = [(str(x), int(p))
                for x, p in zip(tb.terms[cuts[i]: cuts[i + 1]],
                                tb.positions[cuts[i]: cuts[i + 1]])]
        assert mine == ref, t


def test_schema_json_roundtrip():
    import json

    from whoosh_ray.state.schema import IndexSchema, transcripts_schema

    s = transcripts_schema()
    j = json.loads(json.dumps(s.to_json()))
    s2 = IndexSchema.from_json(j)
    assert s2 == s
    assert s2.field("text").analyzer.stopwords == s.field("text").analyzer.stopwords


def test_porter_matches_reference_variant():
    import random
    import string

    from tests.conftest import load_whoosh_oracle

    load_whoosh_oracle()
    from whoosh.lang.porter import stem as wstem

    from whoosh_ray.functions.porter import stem as mystem

    random.seed(9)
    words = ["deployment", "agreed", "hopping", "nationalization", "yearly",
             "fundamentally", "ponies", "caresses", "generalizations"]
    for _ in range(5000):
        words.append("".join(random.choices(string.ascii_lowercase,
                                            k=random.randint(1, 14))))
    for w in words:
        assert mystem(w) == wstem(w), w


def test_stemming_analyzer_matches_reference():
    from tests.conftest import load_whoosh_oracle

    load_whoosh_oracle()
    from whoosh.analysis import StemmingAnalyzer

    from whoosh_ray.functions.analysis import STEMMING, VectorAnalyzer

    wa = StemmingAnalyzer()
    va = VectorAnalyzer(STEMMING)
    texts = [
        "Deployments were rendering the clusters nationally",
        "agreed troubling hopping tanned generalizations",
        "The filing of motions continued relentlessly",
    ]
    tb = va(texts)
    cuts = np.concatenate(([0], np.cumsum(tb.row_lengths)))
    for i, t in enumerate(texts):
        ref = [(tok.text, tok.pos) for tok in wa(t, positions=True)]
        mine = [(str(x), int(p))
                for x, p in zip(tb.terms[cuts[i]: cuts[i + 1]],
                                tb.positions[cuts[i]: cuts[i + 1]])]
        assert mine == ref, (t, mine, ref)


def test_keyword_and_comma_analyzers_match_reference():
    from tests.conftest import load_whoosh_oracle

    load_whoosh_oracle()
    from whoosh.analysis import CommaSeparatedTokenizer, KeywordAnalyzer

    from whoosh_ray.functions.analysis import (COMMA_SEPARATED, KEYWORD,
                                               VectorAnalyzer)

    texts = ["Alpha Beta gamma-3", "one, two ,  three four , five"]
    wa = KeywordAnalyzer()
    va = VectorAnalyzer(KEYWORD)
    for t in texts:
        ref = [tok.text for tok in wa(t)]
        mine = va.token_lists([t])[0]
        assert mine == ref, t
    wc = CommaSeparatedTokenizer()
    vc = VectorAnalyzer(COMMA_SEPARATED)
    for t in texts:
        ref = [tok.text for tok in wc(t)]
        mine = vc.token_lists([t])[0]
        assert mine == ref, t


def test_ngram_analyzers_match_reference():
    from tests.conftest import load_whoosh_oracle

    load_whoosh_oracle()
    from whoosh.analysis import NgramAnalyzer, NgramWordAnalyzer

    from whoosh_ray.functions.analysis import AnalyzerSpec, VectorAnalyzer

    texts = ["ab cde fgh", "abcd", "Hello Big-World", ""]
    pairs = [
        (NgramAnalyzer(3),
         AnalyzerSpec(ngram=(3, 3), ngram_mode="text", stopwords=None,
                      minsize=0)),
        (NgramAnalyzer(2, 4),
         AnalyzerSpec(ngram=(2, 4), ngram_mode="text", stopwords=None,
                      minsize=0)),
        (NgramWordAnalyzer(2, 3),
         AnalyzerSpec(ngram=(2, 3), ngram_mode="words", stopwords=None,
                      minsize=0)),
    ]
    for wa, spec in pairs:
        va = VectorAnalyzer(spec)
        tb = va(texts)
        cuts = np.concatenate(([0], np.cumsum(tb.row_lengths)))
        for i, t in enumerate(texts):
            ref = [(tok.text, tok.pos) for tok in wa(t, positions=True)]
            mine = [(str(x), int(p))
                    for x, p in zip(tb.terms[cuts[i]: cuts[i + 1]],
                                    tb.positions[cuts[i]: cuts[i + 1]])]
            assert mine == ref, (spec, t, mine, ref)
