"""Reference-compatible field constructors + Schema builder.

Schemas written against the reference API (fields.py:538-1565) port by
changing only the import::

    from whoosh_ray.fields import Schema, TEXT, ID, NUMERIC, STORED
    schema = Schema(title=TEXT(stored=True), path=ID(unique=True),
                    count=NUMERIC(int, 32), body=TEXT)

Each constructor returns an UNBOUND field definition; ``Schema(**kw)``
binds names and produces the engine's :class:`IndexSchema`.  Bare
classes work like the reference (``path=ID``).  Declarative
``SchemaClass`` subclasses are supported via ``build_schema()`` /
passing the class itself to ``index.create_in``.

Deliberate mapping notes (engine is columnar Arrow):
- ``sortable=`` is accepted and ignored — every stored column is
  sortable/facetable here (the reference needs a separate column file).
- ``spelling=`` is accepted and ignored — suggestions always come from
  the main term dictionary (the reference's add_spelling role is
  replaced by levenshtein_batch over the lexicon).
- Inexpressible knobs (Decimal ``decimal_places``, NUMERIC defaults,
  custom NGRAMWORDS tokenizer/at) raise TypeError.
"""

from __future__ import annotations

import dataclasses as _dc

from whoosh_ray.functions.analysis import AnalyzerSpec
from whoosh_ray.state.schema import FieldSpec, IndexSchema


from whoosh_ray.state.schema import (  # noqa: E402,F401
    FieldConfigurationError,
)


class UnknownFieldError(KeyError):
    pass


class FieldDef:
    """An unbound field: FieldSpec factory + kwargs, bound by Schema."""

    def __init__(self, binder, sort_key: int = 0):
        self._binder = binder

    def bind(self, name: str):
        return self._binder(name)


class _FieldCtor:
    """Constructor facade: calling returns a FieldDef; passing the bare
    name (``path=ID``) also works, like the reference SchemaClass."""

    def __init__(self, fn, name):
        self._fn = fn
        self.__name__ = name

    def __call__(self, *args, **kwargs):
        self._fn("probe", *args, **kwargs)  # validate args eagerly
        return FieldDef(lambda name: self._fn(name, *args, **kwargs))

    def bind(self, name: str):
        return self._fn(name)


def _text(name, analyzer=None, phrase=True, chars=False, stored=False,
          field_boost=1.0, multitoken_query="default", spelling=False,
          sortable=False, lang=None, vector=None, spelling_prefix="spell_"):
    if multitoken_query != "default":
        raise TypeError("multitoken_query modes other than 'default' are "
                        "not supported (the parser And-groups multi-token "
                        "words, the reference default)")
    if lang is not None and analyzer is None:
        from whoosh_ray.functions.analysis import LanguageAnalyzer

        analyzer = LanguageAnalyzer(lang)
    kw = dict(stored=stored, positions=phrase, chars=chars,
              vector=bool(vector), boost=field_boost)
    if analyzer is not None:
        if not isinstance(analyzer, AnalyzerSpec):
            raise TypeError("analyzer must be an AnalyzerSpec (use the "
                            "factories in whoosh_ray.functions.analysis)")
        kw["analyzer"] = analyzer
    spec = FieldSpec.text(name, **kw)
    # Separate spelling (reference TEXT.subfields, fields.py:1132-1147):
    # with a morphic analyzer, also index the UNMORPHED words into a
    # spelling-only subfield; suggestions then draw candidates from it
    # (frequency still ranks on the parent — spelling.py:109-115).
    # With a non-morphic analyzer spelling=True is a no-op, exactly
    # like the reference (separate_spelling() is False).
    from whoosh_ray.functions.analysis import (analyzer_has_morph,
                                               analyzer_no_morph)

    if spelling and analyzer_has_morph(spec.analyzer):
        spell_name = spelling_prefix + name
        spell = _dc.replace(
            spec, name=spell_name, source=name,
            analyzer=analyzer_no_morph(spec.analyzer),
            stored=False, scorable=False, positions=False, chars=False,
            token_boosts=False, vector=False, unique=False,
            fmt="frequency")
        return [_dc.replace(spec, spell_field=spell_name), spell]
    return spec


def _id(name, stored=False, unique=False, field_boost=1.0, sortable=False,
        analyzer=None):
    if analyzer is not None:
        raise TypeError("ID with a custom analyzer: use FieldSpec directly")
    return FieldSpec.id(name, stored=stored, unique=unique,
                        boost=field_boost)


def _keyword(name, stored=False, lowercase=False, commas=False,
             scorable=False, unique=False, field_boost=1.0, sortable=False,
             vector=None, analyzer=None):
    if analyzer is not None or vector:
        raise TypeError("KEYWORD custom analyzer/vector: use FieldSpec")
    return FieldSpec.keyword(name, stored=stored, lowercase=lowercase,
                             commas=commas, scorable=scorable,
                             unique=unique, boost=field_boost)


def _idlist(name, stored=False, unique=False, expression=None,
            field_boost=1.0):
    kw = dict(stored=stored, unique=unique, boost=field_boost)
    if expression is not None:
        kw["expression"] = getattr(expression, "pattern", expression)
    return FieldSpec.idlist(name, **kw)


def _numeric(name, numtype=int, bits=32, stored=False, unique=False,
             field_boost=1.0, decimal_places=0, shift_step=4, signed=True,
             sortable=False, default=None):
    if numtype is not int or decimal_places or not signed \
            or default is not None:
        raise TypeError("NUMERIC supports signed ints without defaults "
                        "(floats/Decimal: store the column and use "
                        "NumericRange over the stored values)")
    spec = FieldSpec.numeric(name, bits=bits, step=shift_step,
                             stored=stored, boost=field_boost)
    return _dc.replace(spec, unique=unique) if unique else spec


def _datetime(name, stored=False, unique=False, sortable=False):
    spec = FieldSpec.datetime(name, stored=stored)
    return _dc.replace(spec, unique=unique) if unique else spec


def _boolean(name, stored=False, field_boost=1.0):
    return FieldSpec.boolean(name, stored=stored, boost=field_boost)


def _ngram(name, minsize=2, maxsize=4, stored=False, field_boost=1.0,
           queryor=False, phrase=False, sortable=False):
    return FieldSpec.ngram(name, minsize=minsize, maxsize=maxsize,
                           stored=stored, queryor=queryor, phrase=phrase,
                           boost=field_boost)


def _ngramwords(name, minsize=2, maxsize=4, stored=False, field_boost=1.0,
                tokenizer=None, at=None, queryor=False, sortable=False):
    if tokenizer is not None or at is not None:
        raise TypeError("NGRAMWORDS custom tokenizer/at: use FieldSpec")
    return FieldSpec.ngramwords(name, minsize=minsize, maxsize=maxsize,
                                stored=stored, queryor=queryor,
                                boost=field_boost)


TEXT = _FieldCtor(_text, "TEXT")
ID = _FieldCtor(_id, "ID")
KEYWORD = _FieldCtor(_keyword, "KEYWORD")
IDLIST = _FieldCtor(_idlist, "IDLIST")
NUMERIC = _FieldCtor(_numeric, "NUMERIC")
DATETIME = _FieldCtor(_datetime, "DATETIME")
BOOLEAN = _FieldCtor(_boolean, "BOOLEAN")
NGRAM = _FieldCtor(_ngram, "NGRAM")
NGRAMWORDS = _FieldCtor(_ngramwords, "NGRAMWORDS")


def _bind_specs(fd, name: str) -> list:
    """Bind a field definition to its FieldSpec expansion (one spec, or
    parent+subfields — the reference's FieldType.subfields())."""
    if isinstance(fd, FieldSpec):
        return [_dc.replace(fd, name=name)]
    out = fd.bind(name)
    return list(out) if isinstance(out, (list, tuple)) else [out]


def _with_reverse(spec: AnalyzerSpec) -> AnalyzerSpec:
    """Append a ReverseTextFilter to an analyzer chain (chain analyzers
    get a trailing stage; flag analyzers set the reverse flag)."""
    if spec.chain is not None:
        return _dc.replace(spec, chain=tuple(spec.chain) + (("reverse", ()),))
    return _dc.replace(spec, reverse=True)


class FieldWrapper:
    """Delegating wrapper around a field definition (reference
    fields.py:362-440).  The DEFAULT wrapper indexes only the wrapped
    field — its subfields() does not split (fields.py:436-439 comment);
    subclasses like :class:`ReverseField` override the expansion."""

    def __init__(self, subfield, prefix: str):
        if isinstance(subfield, _FieldCtor):
            subfield = subfield()
        self.subfield = subfield
        self.name_prefix = prefix

    def bind(self, name: str):
        return _bind_specs(self.subfield, name)


class ReverseField(FieldWrapper):
    """Index the field normally AND reversed under ``rev_<name>``
    (reference fields.py:1270-1284): the reversed subfield runs the
    subfield's analyzer + ReverseTextFilter, Existence format
    (BasicFormat(lengths=False, weights=False)), unstored/unscorable —
    the leading-wildcard acceleration pattern."""

    def __init__(self, subfield, prefix: str = "rev_"):
        super().__init__(subfield, prefix)

    def bind(self, name: str):
        specs = _bind_specs(self.subfield, name)
        parent = specs[0]
        rev = _dc.replace(
            parent, name=self.name_prefix + name,
            source=parent.source or name,
            analyzer=_with_reverse(parent.analyzer),
            stored=False, scorable=False, positions=False, chars=False,
            token_boosts=False, vector=False, unique=False,
            fmt="existence", spell_field="")
        return specs + [rev]


class SpellField:
    """Minimal unmorphed-words field (reference fields.py:1151-1180),
    normally created internally by ``TEXT(spelling=True)``; usable
    directly in a Schema with ``source=`` pointing at the text column."""

    def __init__(self, analyzer, source: str = ""):
        if not isinstance(analyzer, AnalyzerSpec):
            raise TypeError("analyzer must be an AnalyzerSpec")
        self.analyzer = analyzer
        self.source = source

    def bind(self, name: str):
        from whoosh_ray.functions.analysis import analyzer_no_morph

        return FieldSpec(name=name, kind="text",
                         analyzer=analyzer_no_morph(self.analyzer),
                         source=self.source, stored=False, scorable=False,
                         positions=False, fmt="frequency")


class _StoredDef:
    """STORED marker: the column lands in stored_columns (docs.parquet
    passthrough), never indexed (reference fields.py:980-996)."""


def STORED():
    return _StoredDef()


def Schema(**fields) -> IndexSchema:
    """Bind (name -> field def) pairs into an IndexSchema.  Field names
    are sorted like the reference Schema (its dict iteration is sorted
    in names()); a leading-underscore name raises, mirroring the
    reference's reserved-name check (fields.py:1334-1336)."""
    specs = []
    stored_cols = []
    for name in sorted(fields):
        if name.startswith("_"):
            raise FieldConfigurationError(
                "Field names cannot start with an underscore")
        fd = fields[name]
        if isinstance(fd, _StoredDef) or fd is STORED:
            stored_cols.append(name)
            continue
        if isinstance(fd, (FieldDef, _FieldCtor, FieldWrapper, SpellField,
                           FieldSpec)):
            specs.extend(_bind_specs(fd, name))
            continue
        raise FieldConfigurationError(f"{name}: not a field definition "
                                      f"({fd!r})")
    return IndexSchema(fields=tuple(specs),
                       stored_columns=tuple(stored_cols))


class MetaSchema(type):
    def __new__(mcs, clsname, bases, attrs):
        new_class = super().__new__(mcs, clsname, bases, attrs)
        fields = {}
        for b in bases:
            fields.update(getattr(b, "_declared_fields", {}))
        for key, val in attrs.items():
            if key.startswith("_"):
                continue
            if isinstance(val, (FieldDef, _FieldCtor, FieldSpec, _StoredDef,
                                FieldWrapper, SpellField)) or val is STORED:
                fields[key] = val
        new_class._declared_fields = fields
        return new_class

    def schema_(cls) -> IndexSchema:
        return Schema(**cls._declared_fields)


class SchemaClass(metaclass=MetaSchema):
    """Declarative schema (reference fields.py:1538-1565)::

        class MySchema(SchemaClass):
            path = ID(stored=True)
            content = TEXT

    ``MySchema.schema_()`` (or passing the class to ``ensure_schema``)
    yields the bound IndexSchema; inheritance shares fields."""


def ensure_schema(schema) -> IndexSchema:
    """IndexSchema from an IndexSchema, a Schema(...) result, or a
    SchemaClass subclass (reference fields.py:1568-1575)."""
    if isinstance(schema, type) and issubclass(schema, SchemaClass):
        return schema.schema_()
    if isinstance(schema, IndexSchema):
        return schema
    raise FieldConfigurationError(f"{schema!r} is not a schema")


# ---- numeric / datetime sortable helpers (reference re-exports from
# util/numeric.py:104-140 and util/times.py:70-90) ----

def float_to_sortable_long(x: float, signed: bool) -> int:
    import struct

    v = struct.unpack("<q", struct.pack("<d", x))[0]
    if v < 0:
        v ^= 0x7fffffffffffffff
    if signed:
        v += 1 << 63
    assert v >= 0
    return v


def sortable_long_to_float(x: int, signed: bool) -> float:
    import struct

    if signed:
        x -= 1 << 63
    if x < 0:
        x ^= 0x7fffffffffffffff
    return struct.unpack("<d", struct.pack("<q", x))[0]


def to_sortable(numtype, intsize: int, signed: bool, x):
    if numtype is int:
        return x + (1 << intsize - 1) if signed else x
    return float_to_sortable_long(x, signed)


def from_sortable(numtype, intsize: int, signed: bool, x):
    if numtype is int:
        return x - (1 << intsize - 1) if signed else x
    return sortable_long_to_float(x, signed)


def datetime_to_long(dt) -> int:
    """Microseconds since datetime.min (reference util/times.py:70-75)."""
    d = dt.replace(tzinfo=None) - dt.min
    return (d.days * 86400 + d.seconds) * 1000000 + d.microseconds


def long_to_datetime(x: int):
    from datetime import datetime, timedelta

    days, x = divmod(x, 86400000000)
    seconds, x = divmod(x, 1000000)
    return datetime.min + timedelta(days=days, seconds=seconds,
                                    microseconds=x)


# ---- schema merging (reference fields.py:1589-1613) ----

def merge_schemas(schemas) -> IndexSchema:
    """Union of several IndexSchemas; equal-named fields must be equal
    (reference merge_fielddict raises on inconsistency)."""
    out = ensure_schema(schemas[0])
    for s in schemas[1:]:
        s = ensure_schema(s)
        have = {f.name: f for f in out.fields}
        merged = list(out.fields)
        for f in s.fields:
            prev = have.get(f.name)
            if prev is None:
                merged.append(f)
            elif prev != f:
                raise Exception(
                    f"Inconsistent field {f.name!r}: {prev!r} != {f!r}")
        stored = tuple(dict.fromkeys(tuple(out.stored_columns)
                                     + tuple(s.stored_columns)))
        globs = tuple(dict.fromkeys(tuple(out.glob_fields)
                                    + tuple(s.glob_fields)))
        out = IndexSchema(fields=tuple(merged), stored_columns=stored,
                          glob_fields=globs)
    return out


def merge_schema(s1, s2) -> IndexSchema:
    return merge_schemas([s1, s2])


#: the unbound-field type (the reference FieldType role): what TEXT()/
#: ID()/... return before Schema binds a name
FieldType = FieldDef


def COLUMN(columnobj=None):
    """Reference COLUMN field (fields.py:1014-1035): a stored per-doc
    value with no indexed terms.  The engine's stored columns are
    columnar parquet already (inherently sortable), so this is the
    STORED marker; a custom column object has no meaning here."""
    if columnobj is not None:
        raise TypeError("custom column objects aren't supported — "
                        "stored columns are columnar parquet already")
    return STORED()


def merge_fielddict(d1: dict, d2: dict) -> dict:
    """Union of two {name: field} dicts; same-named fields must be
    equal (reference fields.py:1589-1599)."""
    out = {}
    for name in set(d1) | set(d2):
        f1, f2 = d1.get(name), d2.get(name)
        if f1 and f2 and f1 != f2:
            raise Exception(f"Inconsistent field {name!r}: {f1!r} != {f2!r}")
        out[name] = f1 or f2
    return out
