"""Per-doc term vectors (FieldType(vector=...) parity, reference
whoosh3.py:156-277, tests/test_vectors.py): stored (term, weight)
vectors per document; Expander/key_terms read the vector instead of
re-analyzing stored text (classify.py:123-130)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher
from whoosh_ray.search.classify import key_terms, more_like
from whoosh_ray.state.schema import FieldSpec, IndexSchema

DOCS = [
    "alpha beta beta gamma deployment cluster",
    "deployment deployment pipeline cluster alpha",
    "gamma delta epsilon pipeline render render",
    "render cluster error error error beta",
    "alpha pipeline gamma delta deployment",
]


def _build(tmp_path, vector: bool):
    t = pa.table({
        "doc_id": pa.array(np.arange(len(DOCS)), type=pa.int64()),
        "text": pa.array(DOCS),
    })
    sub = "v" if vector else "nv"
    (tmp_path / sub).mkdir()
    pq.write_table(t, str(tmp_path / sub / "src.parquet"))
    schema = IndexSchema(fields=(
        FieldSpec.text("text", stored=True, vector=vector),
    ), stored_columns=("doc_id",))
    build_index(str(tmp_path / sub / "src.parquet"),
                str(tmp_path / sub / "ix"), schema,
                docid_col="doc_id", seg_size=2)
    return Searcher(str(tmp_path / sub / "ix"))


def test_vector_roundtrip(tmp_path):
    s = _build(tmp_path, vector=True)
    terms, weights = s.vector(0, "text")
    assert dict(zip(terms, weights)) == {
        "alpha": 1.0, "beta": 2.0, "gamma": 1.0,
        "deployment": 1.0, "cluster": 1.0}
    assert terms == sorted(terms)  # term order, like the reference


def test_key_terms_vector_equals_retokenize(tmp_path):
    sv = _build(tmp_path, vector=True)
    sn = _build(tmp_path, vector=False)
    assert sv.has_vector("text") and not sn.has_vector("text")
    for docids in ([0], [1, 3], [0, 2, 4]):
        kv = key_terms(sv, docids, "text", numterms=4)
        kn = key_terms(sn, docids, "text", numterms=4)
        assert kv == kn
    mv = more_like(sv, 0, "text")
    mn = more_like(sn, 0, "text")
    assert mv.docids.tolist() == mn.docids.tolist()
    np.testing.assert_array_equal(mv.scores, mn.scores)


def test_vectors_survive_merge(tmp_path):
    from whoosh_ray.pipelines.merge import merge_segments

    s = _build(tmp_path, vector=True)
    before = {d: s.vector(d, "text") for d in range(len(DOCS))}
    merge_segments(str(tmp_path / "v" / "ix"), policy="OPTIMIZE")
    s2 = Searcher(str(tmp_path / "v" / "ix"))
    assert len(s2.segments) == 1
    for d in range(len(DOCS)):
        assert s2.vector(d, "text") == before[d]
