"""Subfield expansion parity: TEXT(spelling=True) separate-spelling and
ReverseField vs the reference (fields.py:299-326, 1132-1147, 1270-1284;
spelling.py:103-115 candidate/frequency split)."""

import shutil

import pytest

DOCS = [
    ("a", "rendering the deployment pipelines", "alpha server"),
    ("b", "render deploys quickly", "beta archive"),
    ("c", "deployment renders beautifully and repeatedly", "gamma"),
    ("d", "pipelines rendering deployments", "delta servers"),
]


@pytest.fixture(scope="module")
def ref_index(whoosh_oracle, tmp_path_factory):
    from whoosh import index as windex
    from whoosh.analysis import StemmingAnalyzer
    from whoosh.fields import ID, TEXT, ReverseField, Schema

    # the reference ReverseField is BROKEN AS SHIPPED: its __init__
    # references BasicFormat, a name that exists nowhere in the package
    # (fields.py:1274) — NameError on construction.  The reference index
    # carries only the spelling subfield; the reverse side is checked
    # against the documented intent below.
    with pytest.raises(NameError):
        ReverseField(TEXT(stored=True))
    d = tmp_path_factory.mktemp("refspell")
    schema = Schema(conv_id=ID(stored=True),
                    content=TEXT(analyzer=StemmingAnalyzer(), spelling=True,
                                 stored=True),
                    title=TEXT(stored=True))
    ix = windex.create_in(str(d), schema)
    w = ix.writer()
    for cid, content, title in DOCS:
        w.add_document(conv_id=cid, content=content, title=title)
    w.commit()
    return ix


@pytest.fixture(scope="module")
def our_index(tmp_path_factory):
    from whoosh_ray.fields import ID, TEXT, ReverseField, Schema
    from whoosh_ray.functions.analysis import StemmingAnalyzer
    from whoosh_ray.index import create_in

    d = tmp_path_factory.mktemp("ourspell")
    schema = Schema(conv_id=ID(stored=True),
                    content=TEXT(analyzer=StemmingAnalyzer(), spelling=True,
                                 stored=True),
                    title=ReverseField(TEXT(stored=True)))
    ix = create_in(str(d), schema)
    w = ix.writer()
    for cid, content, title in DOCS:
        w.add_document(conv_id=cid, content=content, title=title)
    w.commit()
    return ix


def _ref_lexicon(ix, field):
    with ix.reader() as r:
        return [t.decode() for t in r.lexicon(field)]


def test_spell_subfield_lexicon_matches_reference(ref_index, our_index):
    ref = _ref_lexicon(ref_index, "spell_content")
    ours = our_index.searcher().lexicon("spell_content")
    assert list(ours) == ref


def test_parent_lexicon_still_stemmed(ref_index, our_index):
    ref = _ref_lexicon(ref_index, "content")
    ours = our_index.searcher().lexicon("content")
    assert list(ours) == ref


def test_reverse_subfield_lexicon(ref_index, our_index):
    # documented intent (reference fields.py:1270-1284, unconstructible
    # as shipped): rev_title terms are the title terms reversed
    ref_terms = _ref_lexicon(ref_index, "title")
    ours = our_index.searcher().lexicon("rev_title")
    assert list(ours) == sorted(t[::-1] for t in ref_terms)


@pytest.mark.parametrize("text", ["deployement", "rendring", "pipeline",
                                  "repeatedli", "quickli"])
def test_suggest_matches_reference(ref_index, our_index, text):
    with ref_index.searcher() as rs:
        ref = rs.suggest("content", text)
    ours = our_index.searcher().suggest("content", text)
    assert ours == ref


def test_corrector_redirects_to_spell_field(ref_index, our_index):
    with ref_index.searcher() as rs:
        ref = rs.reader().terms_within("content", "rendering", 1)
        ref = sorted(t.decode() if isinstance(t, bytes) else t for t in ref)
    ours = sorted(our_index.searcher().reader()
                  .terms_within("content", "rendering", 1))
    assert ours == ref


def test_spelling_noop_without_morph(whoosh_oracle):
    # a non-morphic analyzer leaves separate_spelling() False on both
    # sides: no spell_ field appears in the schema
    from whoosh.fields import TEXT as RTEXT
    from whoosh.fields import Schema as RSchema

    from whoosh_ray.fields import TEXT, Schema

    rs = RSchema(content=RTEXT(spelling=True))
    assert "spell_content" not in rs.names()
    ours = Schema(content=TEXT(spelling=True))
    assert "spell_content" not in ours.field_names


def test_fieldwrapper_default_does_not_split():
    # reference fields.py:436-439: the base wrapper indexes only itself
    from whoosh_ray.fields import TEXT, FieldWrapper, Schema

    sch = Schema(content=FieldWrapper(TEXT(stored=True), "x_"))
    assert sch.field_names == ["content"]


def test_reopen_preserves_spelling_redirect(our_index):
    # the spell_field linkage survives the manifest round-trip
    from whoosh_ray.index import open_dir

    ix2 = open_dir(our_index.index_dir)
    s = ix2.searcher()
    assert s.schema.field("content").spell_field == "spell_content"
    assert "rendering" in s.suggest("content", "rendring")
