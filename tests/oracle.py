"""Whoosh-oracle helpers: build a reference index from arrow rows and run
reference queries, for rank/score-identity conformance tests."""

from __future__ import annotations

import pyarrow as pa

from tests.conftest import load_whoosh_oracle


def build_oracle_index(table: pa.Table, *, text_fields=("text",),
                       id_fields=(), numeric_fields=(), datetime_fields=(),
                       stored_extra=()):
    """Build a RamStorage whoosh index; docs added in (conv_id, turn_idx) /
    row order so whoosh docnums == our stable docids (rows must arrive
    pre-sorted and docid-dense)."""
    load_whoosh_oracle()
    from whoosh import fields
    from whoosh.analysis import StandardAnalyzer
    from whoosh.filedb.filestore import RamStorage

    kw = {}
    for f in text_fields:
        kw[f] = fields.TEXT(analyzer=StandardAnalyzer(), stored=True,
                            phrase=True)
    for f in id_fields:
        kw[f] = fields.ID(stored=True)
    for f in numeric_fields:
        kw[f] = fields.NUMERIC(int, 32, stored=True)
    for f in datetime_fields:
        kw[f] = fields.DATETIME(stored=True)
    ix = RamStorage().create_index(fields.Schema(**kw))
    w = ix.writer()
    cols = (list(text_fields) + list(id_fields) + list(numeric_fields)
            + list(datetime_fields))
    data = {c: table[c].to_pylist() for c in cols}
    for i in range(table.num_rows):
        w.add_document(**{c: data[c][i] for c in cols
                          if data[c][i] is not None})
    w.commit()
    return ix


def oracle_search(ix, q, limit=10):
    """Run a whoosh query; returns [(docnum, score), ...] in rank order."""
    with ix.searcher() as s:
        r = s.search(q, limit=limit)
        return [(hit.docnum, hit.score) for hit in r]
