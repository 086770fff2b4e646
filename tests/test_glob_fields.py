"""Dynamic glob fields (reference Schema.add(glob=True),
fields.py:1380-1385, 1487-1488): pattern-derived fields resolve against
the input's columns at build time and behave like statically declared
fields afterward."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import load_whoosh_oracle
from whoosh_ray.pipelines.build import build_index
from whoosh_ray.search import Searcher, Term
from whoosh_ray.sources.transcripts import generate_transcripts
from whoosh_ray.state.schema import FieldSpec, IndexSchema, transcripts_schema


def _glob_schema():
    base = transcripts_schema()
    return IndexSchema(
        fields=base.fields,
        stored_columns=base.stored_columns,
        glob_fields=(
            ("*_txt", FieldSpec.text("_", stored=True)),
            ("tag_*", FieldSpec.id("_", stored=True)),
        ),
    )


def test_glob_fields_build_and_query(tmp_path):
    t = generate_transcripts(n_convs=30, seed=9)
    n = t.num_rows
    rng = np.random.default_rng(4)
    t = t.append_column("note_txt", pa.array(
        ["alpha beta" if x else "gamma delta"
         for x in rng.integers(0, 2, n)]))
    t = t.append_column("tag_kind", pa.array(
        [f"k{x}" for x in rng.integers(0, 3, n)]))
    t = t.append_column("untyped", pa.array(["zz"] * n))  # no glob match
    (tmp_path / "src").mkdir()
    pq.write_table(t, str(tmp_path / "src" / "p.parquet"))

    m = build_index(str(tmp_path / "src"), str(tmp_path / "ix"),
                    _glob_schema(), seg_size=128)
    # the sealed manifest holds CONCRETE fields, no patterns
    names = set(m.schema.field_names)
    assert {"note_txt", "tag_kind"} <= names
    assert "untyped" not in names and not m.schema.glob_fields

    s = Searcher(str(tmp_path / "ix"))
    want_alpha = sum(1 for v in t["note_txt"].to_pylist() if v == "alpha beta")
    r = s.search(Term("note_txt", "alpha"), limit=None)
    assert len(r) == want_alpha
    want_k1 = sum(1 for v in t["tag_kind"].to_pylist() if v == "k1")
    assert len(s.search(Term("tag_kind", "k1"), limit=None)) == want_k1
    # glob fields are stored like static ones
    stored = s.stored(r.docids[:3], columns=["note_txt", "tag_kind"])
    assert set(stored["note_txt"].to_pylist()) == {"alpha beta"}


def test_glob_match_semantics_vs_reference():
    """First-match declaration order + fnmatch wildcards, same column
    set the reference's dynamic-field lookup would resolve."""
    load_whoosh_oracle()
    from whoosh.fields import ID as WID
    from whoosh.fields import TEXT as WTEXT
    from whoosh.fields import Schema as WSchema

    ws = WSchema(text=WTEXT)
    ws.add("*_txt", WTEXT(stored=True), glob=True)
    ws.add("tag_?", WID(stored=True), glob=True)

    ours = IndexSchema(
        fields=(FieldSpec.text("text"),),
        glob_fields=(("*_txt", FieldSpec.text("_", stored=True)),
                     ("tag_?", FieldSpec.id("_", stored=True))),
    )
    cols = ["text", "note_txt", "a_txt", "tag_a", "tag_long", "plain"]
    resolved = ours.resolve_globs(cols)
    mine = set(resolved.field_names)
    theirs = {c for c in cols if c in ws}
    assert mine == theirs == {"text", "note_txt", "a_txt", "tag_a"}

    with pytest.raises(ValueError):
        IndexSchema(fields=(), glob_fields=(
            ("noglob", FieldSpec.id("_")),))


def test_glob_schema_json_roundtrip():
    s = _glob_schema()
    back = IndexSchema.from_json(s.to_json())
    assert back == s
    assert back.glob_fields[0][0] == "*_txt"
