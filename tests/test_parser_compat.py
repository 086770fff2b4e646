"""SimpleParser / DisMaxParser / group= / plugin-marker parity: parse
with both engines' parsers, run both searches, assert rank/score
identity (the test_qparser harness pattern)."""

import numpy as np
import pytest

from tests.oracle import build_oracle_index
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import transcripts_schema


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=30, seed=7)


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("pc")
    (d / "src").mkdir()
    pq.write_table(corpus, str(d / "src" / "p.parquet"))
    build_index(str(d / "src"), str(d / "index"), transcripts_schema(),
                seg_size=64)
    return Searcher(str(d / "index"))


@pytest.fixture(scope="module")
def oracle(corpus):
    return build_oracle_index(corpus, text_fields=("text",),
                              id_fields=("role", "tool", "conv_id"))


def _compare(engine, os_, myq, refq, label):
    mine = [(int(d), float(s)) for d, s in engine.search(myq, limit=None).pairs()]
    r = os_.search(refq, limit=None)
    ref = [(int(h.docnum), float(h.score)) for h in r]
    assert [d for d, _ in mine] == [d for d, _ in ref], (
        f"{label!r}: mine={myq!r} ref={refq!r}")
    np.testing.assert_allclose([s for _, s in mine], [s for _, s in ref],
                               rtol=1e-9, err_msg=label)


SIMPLE_QUERIES = [
    "deploy",
    "deploy render",
    "+deploy render",
    "-deploy render",
    "+deploy -render cluster",
    "+deploy +render cluster",
    '"deploy render" cluster',
    '+"deploy render" cluster',
    '-"deploy render" cluster',
    '"deploy render"~3',
    "deploy AND render",         # ops are plain words (stopword-dropped)
    "NOT deploy render",
    "(deploy render) cluster",   # parens are word chars, analyzed away
    "deploy^2.5 render",         # no boost syntax: ^2.5 -> term "2.5"
    "role:user deploy",          # no fields: tokens join the Or flat
    "deploy-render cluster",     # '-' tags anywhere: deploy ANDNOT render
    "+the deploy",               # stopped required word nulls the query
    "-deploy",
    "deploy +",
    '"unclosed deploy',
    "a- deploy",
]


def test_simple_parser_parity(engine, oracle, whoosh_oracle):
    from whoosh.qparser import SimpleParser as WSP

    from whoosh_ray.search.qparser import SimpleParser

    mine = SimpleParser("text", transcripts_schema())
    with oracle.searcher() as os_:
        ref = WSP("text", oracle.schema)
        for qs in SIMPLE_QUERIES:
            _compare(engine, os_, mine.parse(qs), ref.parse(qs), qs)


def test_dismax_parser_parity(engine, oracle, whoosh_oracle):
    from whoosh.qparser import DisMaxParser as WDP

    from whoosh_ray.search.qparser import DisMaxParser

    boosts = {"text": 1.0, "tool": 2.5}
    mine = DisMaxParser(boosts, transcripts_schema())
    with oracle.searcher() as os_:
        ref = WDP(boosts, oracle.schema)
        for qs in ["deploy", "bash", "deploy bash", "+deploy bash",
                   '"deploy render" bash', "-bash deploy render",
                   # fieldboost rides the PHRASE NODE: a quoted body
                   # analyzing to ONE token (1-word text phrase, or any
                   # phrase on an ID field) fans out UNBOOSTED — found
                   # by fuzz, pinned (the Term-sans-boost quirk)
                   '"bash" deploy', '"" bash', '~2-x ""cluster error"~2 ',
                   'deploy-render "bash"']:
            _compare(engine, os_, mine.parse(qs), ref.parse(qs), qs)


def test_orgroup_parser_parity(engine, oracle, whoosh_oracle):
    from whoosh.qparser import OrGroup as WOG
    from whoosh.qparser import QueryParser as WQP

    from whoosh_ray.search.qparser import QueryParser

    mine = QueryParser("text", transcripts_schema(), group="or")
    with oracle.searcher() as os_:
        ref = WQP("text", oracle.schema, group=WOG)
        for qs in ["deploy render", "deploy AND render cluster",
                   "deploy OR render cluster", "deploy-render cluster",
                   "NOT deploy render", "(deploy render) cluster",
                   "deploy render ANDNOT cluster", "role:user deploy",
                   '"deploy render" cluster', "deploy^2 render"]:
            _compare(engine, os_, mine.parse(qs), ref.parse(qs), qs)


def test_orgroup_factory_scale_parity(engine, oracle, whoosh_oracle):
    from whoosh.qparser import OrGroup as WOG
    from whoosh.qparser import QueryParser as WQP

    from whoosh_ray import qparser as cq

    mine = cq.QueryParser("text", transcripts_schema(),
                          group=cq.OrGroup.factory(0.9))
    with oracle.searcher() as os_:
        ref = WQP("text", oracle.schema, group=WOG.factory(0.9))
        for qs in ["deploy render cluster", "deploy-render cluster"]:
            _compare(engine, os_, mine.parse(qs), ref.parse(qs), qs)

        # DOCUMENTED DIVERGENCE (the replace() family): when the
        # reference's Or tree exhausts down to ONE live term matcher
        # mid-stream, CoordMatcher._replacement recomputes termcount=1
        # and the SQR factor (termcount-1)/termcount zeroes every
        # remaining doc (wrappers.py:537-558).  We score compositionally
        # with the full tree's termcount.  Non-zero-scored docs must
        # still agree exactly.
        qs = "deploy render error retry"
        mq, rq = mine.parse(qs), ref.parse(qs)
        mined = {int(d): float(s) for d, s in engine.search(mq, limit=None).pairs()}
        refd = {int(h.docnum): float(h.score)
                for h in os_.search(rq, limit=None)}
        assert set(mined) == set(refd)
        zeros = {d for d, s in refd.items() if s == 0.0}
        assert zeros, "expected the reference's zeroed single-term tail"
        for d in refd:
            if d not in zeros:
                np.testing.assert_allclose(mined[d], refd[d], rtol=1e-9)


def test_plugin_markers_add_plugin(engine, oracle, whoosh_oracle):
    import whoosh.qparser as wq

    from whoosh_ray import qparser as cq

    schema = transcripts_schema()
    with oracle.searcher() as os_:
        # optional plugins via add_plugin markers
        mine = cq.QueryParser("text", schema)
        mine.add_plugin(cq.GtLtPlugin())
        mine.add_plugin(cq.FuzzyTermPlugin())
        ref = wq.QueryParser("text", oracle.schema)
        ref.add_plugin(wq.GtLtPlugin())
        ref.add_plugin(wq.FuzzyTermPlugin())
        for qs in ["text:>=deploy", "deploi~", "deploy~2"]:
            _compare(engine, os_, mine.parse(qs), ref.parse(qs), qs)

        # default-set markers are accepted no-ops
        mine.add_plugin(cq.PhrasePlugin())
        mine.add_plugin(cq.WildcardPlugin)
        _compare(engine, os_, mine.parse('"deploy render"'),
                 ref.parse('"deploy render"'), "phrase-after-noop")

        # remove_plugin disables an optional plugin again
        mine.remove_plugin(cq.FuzzyTermPlugin())
        assert "fuzzy" not in mine.plugins

        # field aliases: reference maps field -> [aliases]
        mine2 = cq.QueryParser("text", schema)
        mine2.add_plugin(cq.FieldAliasPlugin({"role": ["who"]}))
        ref2 = wq.QueryParser("text", oracle.schema)
        ref2.add_plugin(wq.FieldAliasPlugin({"role": ["who"]}))
        _compare(engine, os_, mine2.parse("who:user deploy"),
                 ref2.parse("who:user deploy"), "alias")


def test_simple_parser_random_strings(engine, oracle, whoosh_oracle):
    """Random-string sweep of the simple grammar: markers, quotes,
    slop, mid-word minus, op words, parens, concatenation accidents —
    full ranked-result parity per string."""
    import random

    from whoosh.qparser import SimpleParser as WSP

    from whoosh_ray.search.qparser import SimpleParser

    rng = random.Random(1234)
    pieces = ["deploy", "render", "cluster", "error", "the", "a", "bash",
              "retry", "deploy-render", "a.b.c", "x", "November",
              "+", "-", '"deploy render"', '"cluster error"~2',
              "(", ")", "AND", "OR", "NOT"]
    mine = SimpleParser("text", transcripts_schema())
    with oracle.searcher() as os_:
        ref = WSP("text", oracle.schema)
        for _ in range(120):
            toks = [rng.choice(pieces) for _ in range(rng.randint(1, 6))]
            qs = ""
            for t in toks:
                qs += t
                if rng.random() < 0.85:
                    qs += " "
            _compare(engine, os_, mine.parse(qs), ref.parse(qs), qs)


def test_simple_parser_null_shapes(whoosh_oracle):
    """Structural parity for the Null edge cases."""
    from whoosh.qparser import SimpleParser as WSP

    from whoosh_ray.search.qparser import SimpleParser
    from whoosh_ray.search.query import _NullQuery

    mine = SimpleParser("text", transcripts_schema())
    from whoosh import fields as wf

    ref = WSP("text", wf.Schema(text=wf.TEXT))
    for qs in ["+the deploy", "-deploy", "+a +b c d -e", '"a b"~3']:
        mq, rq = mine.parse(qs), ref.parse(qs)
        assert isinstance(mq, _NullQuery) == (
            rq.__class__.__name__ == "_NullQuery"), (qs, mq, rq)


def test_unpaired_parens_and_boost_terminators(engine, oracle,
                                               whoosh_oracle):
    """Unpaired parens VANISH from the node list (ops bind across the
    phantom boundary); a whole-query paren group unwraps first; a
    space-detached '^n' boost dies at the top level but applies inside
    a nested group (the reference's clean_boost doesn't recurse,
    plugins.py:256-267); a '^n' not followed by space/')'/end is no
    boost at all."""
    from whoosh.qparser import QueryParser as WQP

    from whoosh_ray.search.qparser import QueryParser

    mine = QueryParser("text", transcripts_schema())
    with oracle.searcher() as os_:
        ref = WQP("text", oracle.schema)
        for qs in [") cluster deploy", "cluster ) deploy",
                   "cluster ( deploy render",
                   "^2.5( ANDNOT ( cluster render ",
                   "deploy (render cluster))",
                   "render ^2", "(render ^2)", "render ^2)",
                   "deploy (render ^2) x", "((render ^2))",
                   "(deploy (render ^2.5))", "render ^2 deploy",
                   'deploy^2"deploy render" OR ',
                   "retry ^2 deploy-render retry"]:
            _compare(engine, os_, mine.parse(qs), ref.parse(qs), qs)


def test_plusminus_markers_on_default_parser(engine, oracle,
                                             whoosh_oracle):
    """PlusMinusPlugin on the DEFAULT parser: markers tag the next
    node ANYWHERE ('deploy-render' = deploy ANDNOT render), operator
    binding runs inside the routed buckets ('OR NOT deploy-render'
    bans render and Nots deploy), a marker eats an op word (which then
    can't operate), and a required bucket that dissolves to op words
    nulls the query."""
    from whoosh.qparser import OrGroup, PlusMinusPlugin
    from whoosh.qparser import QueryParser as WQP

    from whoosh_ray.search.qparser import QueryParser

    mine_and = QueryParser("text", transcripts_schema(),
                           plugins=("plusminus",))
    mine_or = QueryParser("text", transcripts_schema(),
                          plugins=("plusminus",), group="or")
    with oracle.searcher() as os_:
        ref_and = WQP("text", oracle.schema)
        ref_and.add_plugin(PlusMinusPlugin())
        ref_or = WQP("text", oracle.schema, group=OrGroup)
        ref_or.add_plugin(PlusMinusPlugin())
        for qs in ["deploy - render", "deploy-render", "deploy + render",
                   "+ deploy render", "- deploy render", "+the deploy",
                   "OR NOT deploy-render ", "- NOT ) cluster deploy",
                   "render bash+AND", "error cluster AND + OR ( ",
                   "deploy-render retry + ANDNOT cluster",
                   "render ^2.5- OR deploy ", "render ^2+deploy render ",
                   "ANDNOT error^2.5- -render AND ",
                   "deploy cluster - render( deploy "]:
            _compare(engine, os_, mine_and.parse(qs), ref_and.parse(qs),
                     "and:" + qs)
            _compare(engine, os_, mine_or.parse(qs), ref_or.parse(qs),
                     "or:" + qs)
