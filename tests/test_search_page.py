"""search_page / ResultsPage: page math parity with the reference and
end-to-end paging over a real index."""

import numpy as np
import pytest

from tests.conftest import load_whoosh_oracle

load_whoosh_oracle()


class _StubResults(list):
    def scored_length(self):
        return len(self)


def test_page_math_matches_reference():
    from whoosh.searching import ResultsPage as RefPage

    from whoosh_ray.search.searcher import ResultsPage as MinePage

    for total in [0, 1, 9, 10, 11, 25, 100]:
        stub = _StubResults(range(total))
        for pagelen in [1, 3, 10]:
            for pagenum in [1, 2, 3, 7, 50]:
                a = RefPage(stub, pagenum, pagelen)
                b = MinePage(stub, pagenum, pagelen)
                assert (a.pagecount, a.pagenum, a.offset, a.pagelen,
                        a.total, a.is_last_page()) == \
                       (b.pagecount, b.pagenum, b.offset, b.pagelen,
                        b.total, b.is_last_page()), (total, pagelen, pagenum)
    with pytest.raises(ValueError):
        MinePage(_StubResults(range(5)), 0, 10)


def test_search_page_over_index(tmp_path):
    from whoosh_ray import index as wix
    from whoosh_ray.search.query import Term
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True),
        FieldSpec.id("conv_id", stored=True)))
    ix = wix.create_in(str(tmp_path), schema, seg_size=8)
    w = ix.writer()
    for i in range(23):
        w.add_document(text="common filler " + ("alpha " * (i % 5 + 1)),
                       conv_id=f"c{i:03d}", turn_idx=0)
    w.commit()
    s = wix.open_dir(str(tmp_path)).searcher()

    full = s.search(Term("text", "common"), limit=None)
    assert len(full) == 23
    # pages tile the full ranking exactly
    seen = []
    pagenum = 1
    while True:
        page = s.search_page(Term("text", "common"), pagenum, pagelen=7)
        assert len(page) == 23 and page.pagecount == 4
        seen.extend(h.docid for h in page)
        assert [page.docnum(i) for i in range(page.pagelen)] == \
               list(seen[-page.pagelen:])
        assert page.score(0) == pytest.approx(
            float(full.scores[page.offset]))
        if page.is_last_page():
            break
        pagenum += 1
    np.testing.assert_array_equal(np.array(seen), full.docids)
    assert pagenum == 4
    # over-asking clamps to the last page (reference behavior)
    page = s.search_page(Term("text", "common"), 99, pagelen=7)
    assert page.pagenum == 4 and page.pagelen == 2
    with pytest.raises(ValueError):
        s.search_page(Term("text", "common"), 0)
