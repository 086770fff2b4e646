"""Reference package-layout parity for the matching/ and qparser/
packages: deep-import paths resolve, group classes drive the parser
with reference-identical results, the English dateparse facade matches
the reference parser, and LeafMatcher works over a real Format."""

from __future__ import annotations

from datetime import datetime

import pytest

from tests.conftest import load_whoosh_oracle


def test_deep_import_paths():
    # matching subtree (reference matching/{mcore,binary,combo,wrappers})
    from whoosh_ray.matching import binary, combo, mcore, wrappers

    assert mcore.ListMatcher is not None
    assert mcore.LeafMatcher is not None
    assert not mcore.NullMatcher.is_active()
    assert binary.UnionMatcher and binary.AndMaybeMatcher
    assert combo.ArrayUnionMatcher and combo.PreloadedUnionMatcher
    assert wrappers.MultiMatcher and wrappers.CoordMatcher

    # qparser subtree (reference qparser/{common,default,plugins,
    # syntax,taggers,dateparse})
    from whoosh_ray.qparser import (common, dateparse, default, plugins,
                                    syntax, taggers)

    assert default.QueryParser and default.DisMaxParser
    assert plugins.FuzzyTermPlugin and plugins.GtLtPlugin
    assert syntax.OrGroup.factory(0.5)._wr_group == ("or", 0.5)
    assert issubclass(common.QueryParserError, Exception)
    assert taggers.FnTagger and taggers.RegexTagger
    assert dateparse.DateParserPlugin and dateparse.English

    # package root re-exports (reference qparser/__init__.py does
    # `from ... import *` over default/plugins/syntax)
    import whoosh_ray.qparser as qp

    for name in ("QueryParser", "MultifieldParser", "SimpleParser",
                 "DisMaxParser", "OrGroup", "AndGroup", "DisMaxGroup",
                 "FuzzyTermPlugin", "PhrasePlugin", "QueryParserError",
                 "Tagger"):
        assert hasattr(qp, name), name


def _ref_parser(group_name):
    load_whoosh_oracle()
    from whoosh import fields
    from whoosh.qparser import QueryParser, syntax

    schema = fields.Schema(text=fields.TEXT)
    return QueryParser("text", schema, group=getattr(syntax, group_name))


@pytest.mark.parametrize("group_name,qstring", [
    ("DisMaxGroup", "alpha beta gamma"),
    ("DisMaxGroup", "alpha"),
    ("OrderedGroup", "alpha beta"),
    ("OrGroup", "alpha beta gamma"),
])
def test_group_classes_match_reference(group_name, qstring):
    import whoosh_ray.qparser as qp
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    rp = _ref_parser(group_name)
    rq = rp.parse(qstring)

    schema = IndexSchema([FieldSpec.text("text")])
    mp = qp.QueryParser("text", schema, group=getattr(qp, group_name))
    mq = mp.parse(qstring)

    def shape(q):
        kids = list(getattr(q, "children", lambda: [])()) or \
            getattr(q, "subqueries", None) or []
        if not kids and hasattr(q, "text"):
            return (type(q).__name__, q.text)
        return (type(q).__name__, tuple(shape(k) for k in kids))

    rname = type(rq).__name__
    mname = type(mq).__name__
    assert rname == mname, (rname, mname)
    rterms = sorted(t.text for t in rq.leaves()) if hasattr(rq, "leaves") \
        else [rq.text]
    mterms = sorted(t.text for t in mq.leaves()) if hasattr(mq, "leaves") \
        else [mq.text]
    assert rterms == mterms


def test_binary_group_markers_rejected():
    import whoosh_ray.qparser as qp
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    schema = IndexSchema([FieldSpec.text("text")])
    for marker in (qp.NotGroup, qp.AndNotGroup, qp.AndMaybeGroup,
                   qp.RequireGroup):
        with pytest.raises(TypeError):
            qp.QueryParser("text", schema, group=marker)


def test_english_dateparse_facade_matches_reference():
    load_whoosh_oracle()
    from whoosh.qparser.dateparse import English as RefEnglish

    from whoosh_ray.qparser.dateparse import English as MyEnglish

    base = datetime(2010, 9, 20, 15, 16, 6, 454000)
    ref, mine = RefEnglish(), MyEnglish()
    for text in ("last tuesday", "2005", "mar 29 1972", "noon",
                 "tomorrow", "-1hr", "now", "201009", "5:10pm",
                 "next friday to next tuesday", "20050912",
                 "2005 sep 12th", "yesterday at noon",
                 "garbage input zz"):
        r = ref.date_from(text, base)
        m = mine.date_from(text, base)
        assert (getattr(r, "start", r), getattr(r, "end", r)) == \
            (getattr(m, "start", m), getattr(m, "end", m)), text


def test_leafmatcher_surface():
    import whoosh_ray.formats as mf
    from whoosh_ray.matching.mcore import LeafMatcher, ListMatcher

    class TermishMatcher(LeafMatcher):
        def __init__(self, term, ids, values, fmt):
            self._term = term
            self._inner = ListMatcher(ids, values=values, format=fmt)
            self.format = fmt
            self.scorer = None

        def is_active(self):
            return self._inner.is_active()

        def value(self):
            return self._inner.value()

        def all_items(self):
            return self._inner.all_items()

    fmt = mf.Characters()
    vals = [fmt.encode([(0, 0, 5), (2, 10, 15)])]
    m = TermishMatcher(("text", "alpha"), [3], vals, fmt)
    assert m.supports("characters")
    assert m.value_as("positions") == [0, 2]
    assert [(s.startchar, s.endchar) for s in m.spans()] == \
        [(0, 5), (10, 15)]
    assert list(m.items_as("positions")) == [(3, [0, 2])]
    assert repr(m).startswith("TermishMatcher(")
