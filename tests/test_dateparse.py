"""dateparse subset conformance: every covered expression must produce
the same inclusive (floor, ceil) span as the reference English grammar,
and date-fielded query strings must give oracle-identical results."""

from datetime import datetime

import numpy as np
import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.search.dateparse import date_from

BASE = datetime(2024, 3, 14, 15, 9, 26, 535897)

COVERED = [
    "now", "today", "yesterday", "tomorrow",
    "2005", "200503", "20050329", "2005032913", "200503291325",
    "20050329132544",
    "march 2005", "mar 29 2005", "29 march 2005", "march 29th 2005",
    "mar 29",
    "3pm", "10:25am", "10:25:17am",
    "next tuesday", "next friday", "last friday", "last tuesday",
    "next monday", "last sunday",
    # ---- full-grammar matrix (reference tests/test_dateparse.py) ----
    # time
    "13:05", "3 pm", "10pm", "10 pm", "3am", "3:15 am", "5:10pm",
    "12:45am", "12:45pm", "5:45:05 pm", "noon", "midnight",
    # dmy permutations incl. commas and ordinals
    "25 may 2011", "may 2 2011", "2011 25 may", "2011 may 5",
    "apr", "september", "2001", "july 2525", "nov 30",
    "25 may, 2011", "may 2nd, 2011", "2011, 25 may", "2011, may 5th",
    "this month", "this year",
    # plusdate (relative deltas)
    "+1hr", "+5mins", "+20s", "- 2 h", "- 25 minutes", "-400 secs",
    "+1hr 5m", "-8hr 12m", "+1hr 5s", "+1hr 12m 5s", "-1hr 5s",
    "-1hr 12m 5s", "+1y", "+2mo", "+3w", "+5d", "+5days", "-6yr",
    "- 7 mons", "-8 wks", "- 9 dy", "+1y 12mo 400d", "-7mo 8d",
    "+5wks 2d", "-1y 1w", "+1y 2d 5h 12s", "-3 weeks",
    # dayname
    "next sunday", "last sun", "next th", "next thur",
    # bundles (time + date in any order)
    "mar 29 1972 2:45am", "16:10:45 14 february 2005",
    "1985 sept 12 12:01", "5pm 21st oct 2005", "5:59:59pm next thur",
    "5:10pm",
    # ranges
    "last tuesday to next tuesday", "last monday to dec 25",
    "oct 25 to feb 14", "3am oct 12 to 5pm", "3am feb 12 to 5pm today",
    "feb to oct", "oct 25 2005 11am to 5pm tomorrow",
    "oct 5 2005 to november 20", "2007 to 2010", "2007 to oct 12",
    "-2d to +1w", "feb to nov", "2005 to 10 oct 2009",
    "jan 12 to oct 10 2009", "jan to oct 2009",
]

REJECTED = [
    # reference grammar rejects these (None); we raise ValueError
    "28:91", "15 am", "24:00", "12:65", "25 2525",
    "may 32 2005", "2005 may 32", "2005-13-32",
]


def test_rejected_expressions(english):
    for x in REJECTED:
        assert english.date_from(x, BASE) is None, x
        with pytest.raises(ValueError):
            date_from(x, BASE)


@pytest.fixture(scope="module")
def english():
    load_whoosh_oracle()
    from whoosh.qparser.dateparse import English

    return English()


def ref_span(e, text):
    dt = e.date_from(text, BASE)
    assert dt is not None, text
    if isinstance(dt, datetime):
        return (dt, dt)
    return (dt.start, dt.end)


def test_covered_expressions_match_reference(english):
    for x in COVERED:
        assert date_from(x, BASE) == ref_span(english, x), x


def test_extensions_beyond_reference(english):
    # the reference grammar returns None for these; ours parses them
    # (documented extension)
    for x in ["next week", "last month", "next year"]:
        assert english.date_from(x, BASE) is None
        lo, hi = date_from(x, BASE)
        assert lo < hi


def test_uncovered_raises():
    for x in ["the day before pearl harbor", ""]:
        with pytest.raises(ValueError):
            date_from(x, BASE)


def test_date_fielded_queries_match_oracle(tmp_path):
    import pyarrow.parquet as pq

    from tests.oracle import build_oracle_index, oracle_search
    from whoosh_ray.pipelines.build import build_index
    from whoosh_ray.search import Searcher
    from whoosh_ray.search.qparser import QueryParser
    from whoosh_ray.sources.transcripts import generate_transcripts
    from whoosh_ray.state.schema import transcripts_schema

    corpus = generate_transcripts(n_convs=30, seed=42)
    (tmp_path / "src").mkdir()
    pq.write_table(corpus, str(tmp_path / "src" / "p.parquet"))
    build_index(str(tmp_path / "src"), str(tmp_path / "ix"),
                transcripts_schema(), seg_size=64)
    s = Searcher(str(tmp_path / "ix"))
    oracle = build_oracle_index(corpus, text_fields=("text",),
                                id_fields=("role",),
                                datetime_fields=("ts",))
    from whoosh.qparser import QueryParser as WQP
    from whoosh.qparser.dateparse import DateParserPlugin

    ts = corpus["ts"].to_pylist()
    basedate = max(ts)
    mid = sorted(ts)[len(ts) // 2]
    my_parser = QueryParser("text", transcripts_schema(),
                            datefields=("ts",), basedate=basedate)
    with oracle.searcher() as os_:
        wp = WQP("text", schema=oracle.schema)
        wp.add_plugin(DateParserPlugin(basedate=basedate))
        day = mid.strftime("%Y%m%d")
        for qs in [f"ts:{day}", f"ts:'{mid.strftime('%b %d %Y').lower()}'",
                   f"deploy ts:{day}"]:
            myq = my_parser.parse(qs)
            refq = wp.parse(qs)
            mine = [int(d) for d, _ in s.search(myq, limit=None).pairs()]
            ref = [h.docnum for h in os_.search(refq, limit=None)]
            assert mine == ref, (qs, myq, refq)
