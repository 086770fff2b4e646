"""Rank/score-identity conformance vs the reference engine (whoosh oracle).

Mirrors the query behaviors of the reference's tests/test_searching.py,
test_results.py (stability/tie-break) on the F1 transcripts fixture —
the correctness gate of BASELINE.json (rank-identical BM25 top-k)."""

import numpy as np
import pytest

from tests.oracle import build_oracle_index, oracle_search
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import (
    And,
    AndMaybe,
    AndNot,
    DisjunctionMax,
    Every,
    FuzzyTerm,
    Not,
    Or,
    Phrase,
    Prefix,
    Require,
    Searcher,
    Term,
    TermRange,
    Wildcard,
)
from whoosh_ray.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def corpus():
    t = generate_transcripts(n_convs=30, seed=42)
    return t


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory):
    import ray.data

    from whoosh_ray.state.schema import transcripts_schema

    d = tmp_path_factory.mktemp("ix")
    src_dir = d / "src"
    src_dir.mkdir()
    import pyarrow.parquet as pq

    pq.write_table(corpus, str(src_dir / "part0.parquet"))
    # several small segments to exercise multi-segment global stats
    manifest = build_index(str(src_dir), str(d / "index"),
                           transcripts_schema(), seg_size=64)
    return Searcher(str(d / "index"))


@pytest.fixture(scope="module")
def oracle(corpus):
    return build_oracle_index(corpus, text_fields=("text",),
                              id_fields=("role", "tool", "conv_id"))


def both(engine, oracle, myq, wq, limit=10):
    mine = [(int(d), float(s)) for d, s in engine.search(myq, limit=limit).pairs()]
    ref = [(int(d), float(s)) for d, s in oracle_search(oracle, wq, limit=limit)]
    return mine, ref


def assert_rank_identical(mine, ref):
    assert [d for d, _ in mine] == [d for d, _ in ref]
    np.testing.assert_allclose([s for _, s in mine], [s for _, s in ref],
                               rtol=1e-9, atol=1e-12)


WQ = None


def wq():
    global WQ
    if WQ is None:
        from whoosh import query as WQ_

        WQ = WQ_
    return WQ


TERMS = ["deploy", "render", "cluster", "error", "parquet", "alpha",
         "camelcase", "big-time", "under_score", "3.141", "the", "absentterm",
         "a", "user"]


def test_single_terms(engine, oracle):
    w = wq()
    for t in TERMS:
        mine, ref = both(engine, oracle, Term("text", t), w.Term("text", t))
        assert_rank_identical(mine, ref)


def test_limits_and_stability(engine, oracle):
    w = wq()
    for lim in [1, 3, 5, 20, 100, None]:
        mine, ref = both(engine, oracle, Term("text", "deploy"),
                         w.Term("text", "deploy"), limit=lim)
        assert_rank_identical(mine, ref)


def test_boolean_combinations(engine, oracle):
    w = wq()
    cases = [
        (And([Term("text", "deploy"), Term("text", "render")]),
         w.And([w.Term("text", "deploy"), w.Term("text", "render")])),
        (Or([Term("text", "deploy"), Term("text", "render")]),
         w.Or([w.Term("text", "deploy"), w.Term("text", "render")])),
        (Or([Term("text", "deploy"), Term("text", "absent")]),
         w.Or([w.Term("text", "deploy"), w.Term("text", "absent")])),
        (And([Term("text", "deploy"), Not(Term("text", "render"))]),
         w.And([w.Term("text", "deploy"), w.Not(w.Term("text", "render"))])),
        (AndNot(Term("text", "deploy"), Term("text", "render")),
         w.AndNot(w.Term("text", "deploy"), w.Term("text", "render"))),
        (Require(Term("text", "deploy"), Term("text", "render")),
         w.Require(w.Term("text", "deploy"), w.Term("text", "render"))),
        (AndMaybe(Term("text", "deploy"), Term("text", "render")),
         w.AndMaybe(w.Term("text", "deploy"), w.Term("text", "render"))),
        (DisjunctionMax([Term("text", "deploy"), Term("text", "render")]),
         w.DisjunctionMax([w.Term("text", "deploy"), w.Term("text", "render")])),
        (And([Or([Term("text", "deploy"), Term("text", "cluster")]),
              Term("text", "error")]),
         w.And([w.Or([w.Term("text", "deploy"), w.Term("text", "cluster")]),
                w.Term("text", "error")])),
        (Not(Term("text", "deploy")), w.Not(w.Term("text", "deploy"))),
    ]
    for myq, refq in cases:
        mine, ref = both(engine, oracle, myq, refq, limit=None)
        assert_rank_identical(mine, ref)


def test_boosts(engine, oracle):
    w = wq()
    mine, ref = both(engine, oracle, Term("text", "deploy", boost=2.5),
                     w.Term("text", "deploy", boost=2.5))
    assert_rank_identical(mine, ref)
    mine, ref = both(
        engine, oracle,
        Or([Term("text", "deploy", boost=3.0), Term("text", "render")]),
        w.Or([w.Term("text", "deploy", boost=3.0), w.Term("text", "render")]))
    assert_rank_identical(mine, ref)


def test_phrases(engine, oracle):
    w = wq()
    phrases = [
        ["deploy", "render"], ["render", "deploy"],
        ["cluster", "error", "retry"], ["deploy", "deploy"],
        ["absent", "deploy"],
    ]
    for ph in phrases:
        mine, ref = both(engine, oracle, Phrase("text", ph),
                         w.Phrase("text", ph), limit=None)
        assert_rank_identical(mine, ref)


def test_phrase_with_slop(engine, oracle):
    w = wq()
    mine, ref = both(engine, oracle, Phrase("text", ["deploy", "render"], slop=3),
                     w.Phrase("text", ["deploy", "render"], slop=3), limit=None)
    assert_rank_identical(mine, ref)


def test_expansions(engine, oracle):
    w = wq()
    cases = [
        (Prefix("text", "rend"), w.Prefix("text", "rend")),
        (Prefix("text", "rend", constantscore=False),
         w.Prefix("text", "rend", constantscore=False)),
        (Wildcard("text", "ren*er"), w.Wildcard("text", "ren*er")),
        (Wildcard("text", "?eploy"), w.Wildcard("text", "?eploy")),
        (TermRange("text", "deploy", "error"),
         w.TermRange("text", "deploy", "error")),
        (FuzzyTerm("text", "deplou"), w.FuzzyTerm("text", "deplou")),
        (Every("text"), w.Every("text")),
    ]
    for myq, refq in cases:
        mine, ref = both(engine, oracle, myq, refq, limit=None)
        assert_rank_identical(mine, ref)


def test_id_field_terms(engine, oracle):
    w = wq()
    for f, v in [("role", "user"), ("role", "assistant"), ("tool", "bash"),
                 ("conv_id", "conv000003")]:
        mine, ref = both(engine, oracle, Term(f, v), w.Term(f, v), limit=None)
        assert_rank_identical(mine, ref)
    mine, ref = both(
        engine, oracle,
        And([Term("text", "deploy"), Term("role", "user")]),
        w.And([w.Term("text", "deploy"), w.Term("role", "user")]), limit=None)
    assert_rank_identical(mine, ref)


def test_or_scale_coordination(engine, oracle):
    """Or(scale=) coordination bonus (CoordMatcher SQR,
    matching/wrappers.py:524-574) — rank/score-identical."""
    from whoosh_ray.search.query import Or as MyOr

    w = wq()
    cases = [
        (["deploy", "render", "cluster"], 0.5),
        (["deploy", "render"], 0.5),
        (["deploy", "render", "absentterm"], 0.5),
        (["deploy", "render", "cluster", "error"], 0.9),
        (["deploy", "the", "error"], 0.25),
    ]
    for terms, scale in cases:
        mine, ref = both(
            engine, oracle,
            MyOr([Term("text", t) for t in terms], scale=scale),
            w.Or([w.Term("text", t) for t in terms], scale=scale),
            limit=20)
        assert_rank_identical(mine, ref)


def test_otherwise(engine, oracle):
    """Otherwise (compound.py:576-588): b only when a matches nothing."""
    from whoosh_ray.search import Otherwise

    w = wq()
    cases = [
        ("deploy", "render"),        # a matches -> a's results
        ("absentterm", "render"),    # a empty -> b's results
        ("absentterm", "alsogone"),  # both empty
    ]
    for a, b in cases:
        mine, ref = both(engine, oracle,
                         Otherwise(Term("text", a), Term("text", b)),
                         w.Otherwise(w.Term("text", a), w.Term("text", b)),
                         limit=20)
        assert_rank_identical(mine, ref)


def test_ordered_and_sequence(engine, oracle):
    """Ordered (positional.py:108-118) / Sequence rank/score parity."""
    from whoosh_ray.search import Ordered, Sequence

    w = wq()
    cases = [
        (Ordered([Term("text", "deploy"), Term("text", "render")]),
         w.Ordered([w.Term("text", "deploy"), w.Term("text", "render")])),
        (Ordered([Term("text", "render"), Term("text", "deploy")]),
         w.Ordered([w.Term("text", "render"), w.Term("text", "deploy")])),
        (Ordered([Term("text", "deploy"), Term("text", "render"),
                  Term("text", "cluster")]),
         w.Ordered([w.Term("text", "deploy"), w.Term("text", "render"),
                    w.Term("text", "cluster")])),
    ]
    for myq, refq in cases:
        mine, ref = both(engine, oracle, myq, refq, limit=20)
        assert_rank_identical(mine, ref)


def test_reader_stats_and_postings_parity(engine, oracle):
    """min/max_field_length, field_length, postings, docnum lookups —
    reference reading.py:959-977 / searching.py:366-415."""
    with oracle.searcher() as osearch:
        orr = osearch.reader()
        assert engine.field_length("text") == orr.field_length("text")
        assert (engine.max_field_length("text")
                == orr.max_field_length("text"))
        # min: posting-derived — zero-token docs are invisible here
        # (documented divergence); check against the reference's
        # per-doc lengths EXCLUDING its length-0 records
        posted = [orr.doc_field_length(dn, "text")
                  for dn in range(orr.doc_count_all())]
        want_min = min(l for l in posted if l)
        assert engine.min_field_length("text") == want_min
        assert orr.min_field_length("text") == 0  # the divergent case

        for term in ["deploy", "the", "november", "zzz-not-there"]:
            ids, ws = engine.postings("text", term)
            if osearch.reader().__class__ and term != "zzz-not-there" \
                    and orr.doc_frequency("text", term):
                m = osearch.postings("text", term)
                want = []
                while m.is_active():
                    want.append((m.id(), float(m.weight())))
                    m.next()
                got = sorted(zip(ids.tolist(), ws.tolist()))
                assert got == sorted(want), term
            elif term == "zzz-not-there":
                assert ids.size == 0

        # docnum conveniences agree with the oracle's docnums (docids
        # are dense rank == whoosh docnums on this fixture)
        want = sorted(osearch.document_numbers(role="user"))
        assert sorted(engine.document_numbers(role="user")) == want
        assert engine.document_number(role="user") == next(
            iter(engine.document_numbers(role="user")))
        from whoosh_ray.search.query import Term as T
        assert (list(engine.docs_for_query(T("text", "deploy")))
                == sorted(d for d, _ in engine.search(T("text", "deploy"),
                                                      limit=None).pairs()))

    # freshness probes
    assert engine.up_to_date() and engine.refresh() is engine


# ---------------------------------------------------------------------------
# Positional queries over a crafted corpus (VERDICT r4 #6): Ordered's
# min-position tree semantics and Sequence/Ordered over non-Term children.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def positional_corpus():
    import pyarrow as pa

    texts = [
        "render alpha deploy beta render",   # min(deploy) > min(render)
        "deploy alpha beta render gamma",
        "deploy render deploy render",
        "alpha deploy beta gamma",
        "render beta deploy",
        "alpha beta gamma alpha beta gamma",
        "gamma beta alpha",
        "deploy beta render gamma alpha",
        "deploy render beta gamma",          # beta AFTER render: still Ordered
    ]
    n = len(texts)
    return pa.table({
        "conv_id": pa.array(["c0"] * n),
        "turn_idx": pa.array(range(n), type=pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts),
        "tool": pa.array(["browser"] * n),
        "ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                        for i in range(n)], type=pa.timestamp("us")),
    })


@pytest.fixture(scope="module")
def pos_engine(positional_corpus, tmp_path_factory):
    import pyarrow.parquet as pq

    from whoosh_ray.state.schema import transcripts_schema

    d = tmp_path_factory.mktemp("positional")
    (d / "src").mkdir()
    pq.write_table(positional_corpus, str(d / "src" / "p.parquet"))
    build_index(str(d / "src"), str(d / "index"), transcripts_schema(),
                seg_size=4)  # multi-segment on purpose
    return Searcher(str(d / "index"))


@pytest.fixture(scope="module")
def pos_oracle(positional_corpus):
    return build_oracle_index(positional_corpus, text_fields=("text",),
                              id_fields=("role", "conv_id"))


def test_ordered_min_position_tree_semantics(pos_engine, pos_oracle,
                                             whoosh_oracle):
    """Ordered is a balanced SpanBefore tree (positional.py:108-118):
    per internal node, first-position(left subtree's leftmost term) <
    first-position(right subtree's leftmost term).  NOT a greedy
    any-ascending-chain — 'render .. deploy .. render' must NOT match
    Ordered(deploy, render); and the 4-term balanced tree does NOT
    compare terms 2 and 3 ('deploy render beta gamma' matches
    Ordered(deploy, beta, render, gamma))."""
    from whoosh_ray.search import Ordered

    w = wq()
    t = lambda x: Term("text", x)  # noqa: E731
    wt = lambda x: w.Term("text", x)  # noqa: E731
    cases = [
        (Ordered([t("deploy"), t("render")]),
         w.Ordered([wt("deploy"), wt("render")])),
        (Ordered([t("render"), t("deploy")]),
         w.Ordered([wt("render"), wt("deploy")])),
        (Ordered([t("alpha"), t("beta"), t("gamma")]),
         w.Ordered([wt("alpha"), wt("beta"), wt("gamma")])),
        (Ordered([t("deploy"), t("beta"), t("render"), t("gamma")]),
         w.Ordered([wt("deploy"), wt("beta"), wt("render"),
                    wt("gamma")])),
    ]
    for myq, refq in cases:
        mine, ref = both(pos_engine, pos_oracle, myq, refq, limit=None)
        assert_rank_identical(mine, ref)
    # the two pinned shapes, explicitly:
    got = {d for d, _ in pos_engine.search(
        Ordered([t("deploy"), t("render")]), limit=None).pairs()}
    assert 0 not in got          # render..deploy..render
    got4 = {d for d, _ in pos_engine.search(
        Ordered([t("deploy"), t("beta"), t("render"), t("gamma")]),
        limit=None).pairs()}
    assert 8 in got4             # deploy render beta gamma


def test_sequence_ordered_nonterm_children(pos_engine, pos_oracle,
                                           whoosh_oracle):
    """Sequence/Ordered over Or/Prefix/Phrase children (VERDICT r4 #6;
    reference positional.py:37-120 chains arbitrary sub-matchers)."""
    from whoosh_ray.search import Ordered, Sequence

    w = wq()
    t = lambda x: Term("text", x)  # noqa: E731
    wt = lambda x: w.Term("text", x)  # noqa: E731
    cases = [
        (Sequence([Or([t("deploy"), t("render")]), t("beta")], slop=2),
         w.Sequence([w.Or([wt("deploy"), wt("render")]), wt("beta")],
                    slop=2)),
        (Sequence([Prefix("text", "dep"), t("alpha")]),
         w.Sequence([w.Prefix("text", "dep"), wt("alpha")])),
        (Sequence([t("deploy"), Or([t("beta"), t("render")])]),
         w.Sequence([wt("deploy"), w.Or([wt("beta"), wt("render")])])),
        (Sequence([Or([t("alpha"), t("deploy")]), t("beta"),
                   Or([t("gamma"), t("render")])], slop=3),
         w.Sequence([w.Or([wt("alpha"), wt("deploy")]), wt("beta"),
                     w.Or([wt("gamma"), wt("render")])], slop=3)),
        (Sequence([Phrase("text", ["alpha", "beta"]), t("gamma")],
                  slop=2),
         w.Sequence([w.Phrase("text", ["alpha", "beta"]), wt("gamma")],
                    slop=2)),
        (Ordered([Or([t("render"), t("gamma")]), t("deploy")]),
         w.Ordered([w.Or([wt("render"), wt("gamma")]), wt("deploy")])),
        (Ordered([Prefix("text", "alp"), t("gamma"), t("beta")]),
         w.Ordered([w.Prefix("text", "alp"), wt("gamma"), wt("beta")])),
    ]
    for myq, refq in cases:
        mine, ref = both(pos_engine, pos_oracle, myq, refq, limit=None)
        assert_rank_identical(mine, ref)
