"""Index schema: engine-side field specs over an Arrow input table.

The reference's Schema maps fieldname -> FieldType carrying the analyzer,
posting format, scorability and storage flags
(/root/reference/src/whoosh/fields.py:60-124, Schema fields.py:1315-1535).
Here the *data* schema is the input Parquet/Arrow schema; ``FieldSpec``
carries only engine semantics per indexed field.

Field kinds and their posting formats (reference parity):

- ``text``: TEXT — StandardAnalyzer, Frequency format (weight = tf * boost),
  scorable (length byte stored), optional positions for phrase queries
  (fields.py:1055-1180, formats.py:162-263).
- ``id``: ID — whole value is one token, Existence format (weight = boost,
  independent of freq), not scorable (fields.py:458-478, formats.py:129-159).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict

from whoosh_ray.functions.analysis import (
    ID_ANALYZER,
    STANDARD,
    AnalyzerSpec,
)


@dataclass(frozen=True)
class FieldSpec:
    name: str                      # source column name == logical field name
    kind: str = "text"             # "text" | "id"
    analyzer: AnalyzerSpec = STANDARD
    stored: bool = True
    scorable: bool = True          # store per-doc quantized length; BM25-scored
    positions: bool = False        # store position payloads (phrase support)
    chars: bool = False            # store char-span payloads (Characters fmt)
    token_boosts: bool = False     # store per-occurrence boost payloads
    vector: bool = False           # store per-doc term vectors (key_terms)
    boost: float = 1.0
    fmt: str = "frequency"         # "frequency" | "existence"
    unique: bool = False           # upsert key for update_document
                                   # (reference fields.py:106, writing.py:426)
    queryor: bool = False          # NGRAM(queryor=): parse multi-gram
                                   # query text as Or instead of And
                                   # (fields.py:1227-1231)
    # Subfield support (reference FieldType.subfields / FieldWrapper,
    # fields.py:320-326,362-440): a subfield indexes ANOTHER field's
    # source column under its own name/analyzer.  ``source`` names the
    # input column to tokenize ("" = this field's own name).
    source: str = ""
    # Set on a PARENT field: the name of the separate-spelling subfield
    # whose lexicon feeds suggestions for this field (reference
    # spelling_fieldname, fields.py:1144-1147; suggestion frequency
    # still comes from the parent field — spelling.py:109-115).
    spell_field: str = ""

    @staticmethod
    def text(name: str, *, stored: bool = True, positions: bool = False,
             chars: bool = False, token_boosts: bool = False,
             vector: bool = False, boost: float = 1.0,
             analyzer: AnalyzerSpec = STANDARD) -> "FieldSpec":
        """``chars=True`` additionally stores per-occurrence character
        spans (the reference's Characters format, formats.py:266-335)
        for exact highlight offsets without retokenizing; implies
        positions.  ``token_boosts=True`` stores one boost per token
        occurrence (the reference's PositionBoosts format,
        formats.py:339-412; with ``chars=True`` too, CharacterBoosts,
        formats.py:415-481); implies positions.  ``vector=True`` stores
        per-document (term, weight) vectors in docs.parquet
        (FieldType(vector=...) parity, whoosh3.py:156-277) so
        key_terms/more_like read the vector instead of re-analyzing the
        stored text."""
        return FieldSpec(name=name, kind="text", analyzer=analyzer, stored=stored,
                         scorable=True,
                         positions=positions or chars or token_boosts,
                         chars=chars, token_boosts=token_boosts,
                         vector=vector, boost=boost,
                         fmt="frequency")

    @staticmethod
    def id(name: str, *, stored: bool = True, boost: float = 1.0,
           unique: bool = False) -> "FieldSpec":
        return FieldSpec(name=name, kind="id", analyzer=ID_ANALYZER, stored=stored,
                         scorable=False, positions=False, boost=boost,
                         fmt="existence", unique=unique)

    @staticmethod
    def keyword(name: str, *, stored: bool = True, lowercase: bool = False,
                commas: bool = False, scorable: bool = False,
                unique: bool = False, boost: float = 1.0) -> "FieldSpec":
        """KEYWORD field (reference fields.py:1014-1053): space- or
        comma-separated tags, Frequency format, no positions, scorable
        off by default; KeywordAnalyzer = SpaceSeparated/CommaSeparated
        tokenizer (+ optional lowercase, + strip for commas)."""
        spec = AnalyzerSpec(pattern=(r"[^,]+" if commas
                                     else r"[^ \t\r\n]+"),
                            lowercase=lowercase, stopwords=None,
                            minsize=0, strip=commas)
        return FieldSpec(name=name, kind="text", analyzer=spec,
                         stored=stored, scorable=scorable,
                         positions=False, boost=boost, fmt="frequency",
                         unique=unique)

    @staticmethod
    def boolean(name: str, *, stored: bool = True,
                boost: float = 1.0) -> "FieldSpec":
        """BOOLEAN field (reference fields.py:910-977): values index as
        the single tokens "t"/"f" (Existence format, not scorable);
        query strings map through the trues/falses sets with the
        reference's bool(x) fallback asymmetry."""
        return FieldSpec(name=name, kind="id",
                         analyzer=AnalyzerSpec(pattern=None, stopwords=None,
                                               minsize=0, lowercase=False,
                                               boolean=True),
                         stored=stored, scorable=False, positions=False,
                         boost=boost, fmt="existence")

    @staticmethod
    def idlist(name: str, *, stored: bool = True, unique: bool = False,
               expression: str = r"[^\r\n\t ,;]+",
               boost: float = 1.0) -> "FieldSpec":
        """IDLIST field (reference fields.py:480-503): multiple IDs per
        value split on whitespace/commas/semicolons (no lowercase),
        Existence format, not scorable."""
        return FieldSpec(name=name, kind="id",
                         analyzer=AnalyzerSpec(pattern=expression,
                                               stopwords=None, minsize=0,
                                               lowercase=False),
                         stored=stored, scorable=False, positions=False,
                         boost=boost, fmt="existence", unique=unique)

    @staticmethod
    def ngram(name: str, *, minsize: int = 2, maxsize: int = 4,
              stored: bool = True, queryor: bool = False,
              phrase: bool = False, boost: float = 1.0) -> "FieldSpec":
        """NGRAM field (reference fields.py:1183-1231): the whole text
        chopped into lowercased grams (whitespace included), scorable,
        Frequency format (Positions when ``phrase``); query text parses
        to And of its grams (Or with ``queryor``)."""
        return FieldSpec(name=name, kind="text",
                         analyzer=AnalyzerSpec(stopwords=None, minsize=0,
                                               ngram=(minsize, maxsize),
                                               ngram_mode="text"),
                         stored=stored, scorable=True, positions=phrase,
                         boost=boost, fmt="frequency", queryor=queryor)

    @staticmethod
    def ngramwords(name: str, *, minsize: int = 2, maxsize: int = 4,
                   stored: bool = True, queryor: bool = False,
                   boost: float = 1.0) -> "FieldSpec":
        """NGRAMWORDS field (reference fields.py:1234-1267): tokenize +
        lowercase first, then gram each word (grams share the word's
        position)."""
        return FieldSpec(name=name, kind="text",
                         analyzer=AnalyzerSpec(stopwords=None, minsize=0,
                                               ngram=(minsize, maxsize),
                                               ngram_mode="words"),
                         stored=stored, scorable=True, positions=False,
                         boost=boost, fmt="frequency", queryor=queryor)

    @staticmethod
    def datetime(name: str, *, step: int = 8, stored: bool = True,
                 boost: float = 1.0) -> "FieldSpec":
        """DATETIME field (reference fields.py:783-907): tiered shift
        terms over the epoch-microsecond int64 (64 bits, shift step 8 —
        the reference's DATETIME defaults), so DateRange queries expand
        to covering postings instead of scanning the stored column."""
        return FieldSpec(name=name, kind="numeric",
                         analyzer=AnalyzerSpec(pattern=None, stopwords=None,
                                               minsize=0, lowercase=False,
                                               numeric=(64, step)),
                         stored=stored, scorable=False, positions=False,
                         boost=boost, fmt="existence")

    @staticmethod
    def numeric(name: str, *, bits: int = 32, step: int = 4,
                stored: bool = True, boost: float = 1.0) -> "FieldSpec":
        """NUMERIC field with tiered shift terms (fields.py:658-671
        semantics, own term format): NumericRange queries over it expand
        to a minimal covering term set — an INDEXED range path whose I/O
        is bounded by matching postings instead of a full stored-column
        scan."""
        return FieldSpec(name=name, kind="numeric",
                         analyzer=AnalyzerSpec(pattern=None, stopwords=None,
                                               minsize=0, lowercase=False,
                                               numeric=(bits, step)),
                         stored=stored, scorable=False, positions=False,
                         boost=boost, fmt="existence")

    def to_json(self) -> dict:
        d = asdict(self)
        a = asdict(self.analyzer)
        # frozensets don't survive json round-trips as sets
        a["stopwords"] = sorted(a["stopwords"]) if a["stopwords"] else None
        d["analyzer"] = a
        return d

    @staticmethod
    def from_json(d: dict) -> "FieldSpec":
        a = d.pop("analyzer")
        a["stopwords"] = frozenset(a["stopwords"]) if a.get("stopwords") else None

        def tuplize(x):
            return (tuple(tuplize(v) for v in x)
                    if isinstance(x, (list, tuple)) else x)

        for k in ("substitute", "ngram", "charmap", "chain", "numeric"):
            if a.get(k) is not None:
                a[k] = tuplize(a[k])
        return FieldSpec(analyzer=AnalyzerSpec(**a), **d)

    # ---- reference FieldType protocol (fields.py:60-455) ----
    # FieldSpec carries the same facts the reference FieldType spreads
    # over analyzer/format/column objects; these methods expose them
    # under the reference names so schema-introspecting user code ports.

    @property
    def format(self):
        """The posting Format instance this spec's flags imply
        (reference FieldType.format; whoosh_ray.formats classes are
        byte-compatible value codecs)."""
        from whoosh_ray import formats as _f

        if self.chars and self.token_boosts:
            return _f.CharacterBoosts(field_boost=self.boost)
        if self.positions and self.token_boosts:
            return _f.PositionBoosts(field_boost=self.boost)
        if self.chars:
            return _f.Characters(field_boost=self.boost)
        if self.positions:
            return _f.Positions(field_boost=self.boost)
        if self.fmt == "frequency":
            return _f.Frequency(field_boost=self.boost)
        return _f.Existence(field_boost=self.boost)

    def supports(self, name: str) -> bool:
        """Whether postings carry the named feature (reference
        FieldType.supports -> Format.supports)."""
        return self.format.supports(name)

    def process_text(self, qstring, mode: str = "index", **kwargs):
        """Iterator of analyzed token TEXTS for one value (reference
        fields.py:290-297).  mode="query" applies the same clones the
        parser uses (boolean _obj_to_bool / query-size ngrams)."""
        import dataclasses as _dc

        from whoosh_ray.functions.analysis import VectorAnalyzer

        spec = self.analyzer
        if mode == "query" and (spec.boolean or spec.ngram is not None):
            spec = _dc.replace(spec, mode="query")
        return iter(VectorAnalyzer(spec).token_lists([qstring])[0])

    def tokenize(self, value, **kwargs):
        """Token objects for one value (reference fields.py:283-289)."""
        from whoosh_ray.analysis import Token

        mode = kwargs.pop("mode", "index")
        for i, text in enumerate(self.process_text(value, mode=mode)):
            yield Token(text=text, pos=i)

    def index(self, value, **kwargs):
        """Posting tuples ("token", freq, weight, valuestring) for one
        stored value (reference fields.py:254-270: delegates to the
        posting format's word_values)."""
        return self.format.word_values(value, self.analyzer,
                                       mode="index", **kwargs)

    def to_bytes(self, value) -> bytes:
        """The indexed term bytes for a value (reference to_bytes:
        utf-8 for text kinds; 't'/'f' for BOOLEAN; the shift-0 tiered
        term for NUMERIC/DATETIME)."""
        num = self.analyzer.numeric
        if num is not None:
            bits, _step = num
            v = value
            try:
                import datetime as _dt

                if isinstance(v, _dt.datetime):
                    epoch = _dt.datetime(1970, 1, 1)
                    v = int((v - epoch).total_seconds() * 1_000_000)
            except Exception:
                pass
            u = (int(v) + (1 << (bits - 1))) % (1 << max(bits, 64))
            return f"00:{u:x}".encode()
        if self.analyzer.boolean:
            # query-mode conversion == the reference's _obj_to_bool
            toks = list(self.process_text(value, mode="query"))
            return toks[0].encode() if toks else b"f"
        if isinstance(value, bytes):
            return value
        return str(value).encode("utf-8")

    def from_bytes(self, bs: bytes):
        """Inverse of to_bytes for text kinds (reference from_bytes);
        numeric terms don't round-trip to values here either (the
        reference decodes sortable bytes; our tiered text keeps the
        shift prefix) — returns the term text."""
        return bs.decode("utf-8") if isinstance(bs, bytes) else bs

    def self_parsing(self) -> bool:
        """True when the field parses its own query text rather than
        running the analyzer (reference: NUMERIC/DATETIME/BOOLEAN)."""
        return self.analyzer.numeric is not None or self.analyzer.boolean

    def parse_query(self, fieldname: str, qstring, boost: float = 1.0):
        """Query for one self-parsed value (reference NUMERIC/BOOLEAN
        parse_query): the exact-match Term on the indexed term text."""
        from whoosh_ray.search.query import Term

        q = Term(fieldname, self.to_bytes(qstring).decode())
        if boost != 1.0:
            q = q.with_boost(boost)
        return q

    def parse_range(self, fieldname: str, start, end,
                    startexcl: bool = False, endexcl: bool = False,
                    boost: float = 1.0):
        """Range query for a self-parsed field (reference
        NUMERIC.parse_range -> NumericRange)."""
        from whoosh_ray.search.query import NumericRange

        q = NumericRange(fieldname,
                         None if start is None else int(start),
                         None if end is None else int(end),
                         startexcl=startexcl, endexcl=endexcl)
        if boost != 1.0:
            q = q.with_boost(boost)
        return q

    def separate_spelling(self) -> bool:
        """True when suggestions read a separate subfield's lexicon
        (reference fields.py:1139-1143)."""
        return bool(self.spell_field)

    def spelling_fieldname(self, fieldname: str) -> str:
        """The field whose lexicon feeds suggest() for this field
        (reference fields.py:1144-1147)."""
        return self.spell_field or fieldname

    def spellable_words(self, value):
        """Words a spelling subfield would store for a value (reference
        fields.py:303-313: the analyzed tokens, stops kept out here
        because the engine's analyzers drop them eagerly)."""
        return list(self.process_text(value, mode="index"))

    def subfields(self):
        """(suffix, field) pairs this field indexes under (reference
        fields.py:320-326; the engine's spelling subfield is declared
        as its own schema entry, so only self is yielded)."""
        yield "", self

    def sortable_terms(self, ixreader, fieldname: str):
        """All term bytes in sorted order (reference fields.py:330-338)."""
        for t in ixreader.lexicon(fieldname):
            yield t.encode("utf-8") if isinstance(t, str) else t

    # trivial reference attributes: schema-lifecycle no-ops and column
    # declarations the parquet layout replaces (every stored field IS a
    # real Arrow column — see whoosh_ray/columns.py)
    indexed = True
    column_type = None

    def clean(self):
        return None

    def on_add(self, schema, fieldname: str):
        return None

    def on_remove(self, schema, fieldname: str):
        return None

    def set_sortable(self, sortable) -> None:
        return None

    def sortable_typecode(self):
        return None

    def default_column(self):
        from whoosh_ray.columns import VarBytesColumn

        return VarBytesColumn()

    def to_column_value(self, value):
        return value

    def from_column_value(self, value):
        return value

    #: how several analyzed tokens of one query word join (reference
    #: fields.py class attribute — a string the parser dispatches on;
    #: the engine parser groups, i.e. "default")
    multitoken_query = "default"


@dataclass(frozen=True)
class IndexSchema:
    """Indexed fields + stored (non-indexed) passthrough columns.

    ``glob_fields`` are the reference's dynamic fields
    (Schema.add(glob=True), fields.py:1487-1488; match fields.py:
    1380-1385): ``(fnmatch pattern, FieldSpec template)`` pairs.  The
    reference materializes a dynamic field per DOCUMENT KEY at
    add_document time; the batch-engine equivalent materializes one per
    INPUT COLUMN — ``build_index`` resolves patterns against the source
    Parquet schema before the pipeline plans, so column pruning still
    reads only matched columns and the sealed manifest stores concrete
    fields (queries never see a pattern)."""

    fields: tuple[FieldSpec, ...]
    stored_columns: tuple[str, ...] = ()   # extra columns copied into docs.parquet
    # (pattern, template) pairs; declaration order wins like the
    # reference's _dyn_fields iteration
    glob_fields: tuple = ()

    def __post_init__(self):
        object.__setattr__(self, "fields", tuple(self.fields))
        object.__setattr__(self, "stored_columns", tuple(self.stored_columns))
        object.__setattr__(self, "glob_fields", tuple(self.glob_fields))
        for pat, _tmpl in self.glob_fields:
            # reference parity (fields.py:1478-1486): a glob pattern
            # must actually contain glob characters
            if not any(ch in pat for ch in "*?[]"):
                raise ValueError(f"glob pattern {pat!r} has no wildcard")

    def resolve_globs(self, column_names) -> "IndexSchema":
        """Concrete schema for this input: every column not already a
        field or stored passthrough takes the FIRST matching glob
        pattern's template (fnmatchcase, declaration order)."""
        if not self.glob_fields:
            return self
        import dataclasses
        from fnmatch import fnmatchcase

        have = set(self.field_names) | set(self.stored_columns)
        new = list(self.fields)
        for col in column_names:
            if col in have:
                continue
            for pat, tmpl in self.glob_fields:
                if fnmatchcase(col, pat):
                    new.append(dataclasses.replace(tmpl, name=col))
                    have.add(col)
                    break
        return IndexSchema(fields=tuple(new),
                           stored_columns=self.stored_columns)

    def field(self, name: str) -> FieldSpec:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    @property
    def scorable_fields(self) -> list[FieldSpec]:
        return [f for f in self.fields if f.scorable]

    def input_columns(self) -> list[str]:
        cols: list[str] = []
        for f in self.fields:
            src = f.source or f.name
            if src not in cols:
                cols.append(src)
        for c in self.stored_columns:
            if c not in cols:
                cols.append(c)
        return cols

    def to_json(self) -> dict:
        out = {
            "fields": [f.to_json() for f in self.fields],
            "stored_columns": list(self.stored_columns),
        }
        if self.glob_fields:
            out["glob_fields"] = [[p, t.to_json()]
                                  for p, t in self.glob_fields]
        return out

    @staticmethod
    def from_json(d: dict) -> "IndexSchema":
        return IndexSchema(
            fields=tuple(FieldSpec.from_json(f) for f in d["fields"]),
            stored_columns=tuple(d.get("stored_columns", ())),
            glob_fields=tuple((p, FieldSpec.from_json(t))
                              for p, t in d.get("glob_fields", ())),
        )

    # ---- reference Schema mapping protocol (fields.py:1315-1535) ----

    def __getitem__(self, name: str) -> FieldSpec:
        """Field by name; unmatched names try the glob (dynamic)
        templates like the reference's _dyn_fields (fields.py:1380-85)."""
        try:
            return self.field(name)
        except KeyError:
            from dataclasses import replace as _replace
            from fnmatch import fnmatchcase

            for pat, tmpl in self.glob_fields:
                if fnmatchcase(name, pat):
                    return _replace(tmpl, name=name)
            raise

    def __contains__(self, name) -> bool:
        try:
            self[name]
            return True
        except KeyError:
            return False

    def __iter__(self):
        """Field objects in name order (reference fields.py:1350)."""
        return iter(sorted(self.fields, key=lambda f: f.name))

    def __len__(self) -> int:
        return len(self.fields)

    def names(self, check_names=None) -> list[str]:
        """Sorted field names; ``check_names`` keeps only those
        (reference fields.py:1399-1410)."""
        out = sorted(f.name for f in self.fields)
        if check_names is not None:
            wanted = set(check_names)
            out = [n for n in out if n in wanted]
        return out

    def items(self) -> list[tuple[str, FieldSpec]]:
        return [(f.name, f) for f in
                sorted(self.fields, key=lambda f: f.name)]

    def copy(self) -> "IndexSchema":
        return IndexSchema(fields=self.fields,
                           stored_columns=self.stored_columns,
                           glob_fields=self.glob_fields)

    def add(self, name: str, fieldtype, glob: bool = False) -> None:
        """Add a field in place (reference fields.py:1411-1464).
        ``fieldtype`` is a FieldSpec, a whoosh_ray.fields factory
        (TEXT / ID / ...) or an instance/class thereof; ``glob=True``
        registers a dynamic-field template instead."""
        from dataclasses import replace as _replace

        spec = _as_fieldspec(name, fieldtype)
        if glob:
            object.__setattr__(self, "glob_fields",
                               self.glob_fields + ((name, spec),))
            return
        if any(f.name == name for f in self.fields):
            raise FieldConfigurationError(f"schema already has a field "
                                          f"named {name!r}")
        object.__setattr__(self, "fields",
                           self.fields + (_replace(spec, name=name),))

    def remove(self, name: str) -> None:
        """Remove a field in place (reference fields.py:1466-1474)."""
        if not any(f.name == name for f in self.fields):
            raise KeyError(f"no field named {name!r}")
        object.__setattr__(self, "fields",
                           tuple(f for f in self.fields if f.name != name))

    def has_scorable_fields(self) -> bool:
        return any(f.scorable for f in self.fields)

    def scorable_names(self) -> list[str]:
        return sorted(f.name for f in self.fields if f.scorable)

    def stored_names(self) -> list[str]:
        """Names of stored fields — including the engine's stored
        passthrough columns (every stored column is a real field of the
        docs table here)."""
        out = sorted(f.name for f in self.fields if f.stored)
        return out + [c for c in self.stored_columns if c not in out]

    def indexable_fields(self):
        for f in sorted(self.fields, key=lambda f: f.name):
            yield f.name, f

    def clean(self) -> None:
        # reference Schema.clean clears per-field caches; stateless here
        return None


class FieldConfigurationError(Exception):
    """Invalid schema manipulation (reference fields.py:53)."""


def _as_fieldspec(name: str, fieldtype) -> FieldSpec:
    """Normalize Schema.add's fieldtype argument — a FieldSpec, a
    whoosh_ray.fields declaration (TEXT(...) FieldDef, bare TEXT
    factory, wrapper) — to one bound FieldSpec."""
    from whoosh_ray import fields as _wf

    if isinstance(fieldtype, FieldSpec) or hasattr(fieldtype, "bind"):
        specs = _wf._bind_specs(fieldtype, name)
        if len(specs) != 1:
            raise FieldConfigurationError(
                "multi-spec field declarations (separate spelling / "
                "wrappers) must be added via Schema(**kw) construction")
        return specs[0]
    raise FieldConfigurationError(f"not a field type: {fieldtype!r}")


def transcripts_schema(*, positions: bool = True) -> IndexSchema:
    """Flagship schema over the driver's transcript table.

    Mirrors the whoosh-oracle schema in FIXTURES.md F1:
    ``text`` TEXT(StandardAnalyzer, stored, phrase) plus ``role``/``tool``/
    ``conv_id`` ID fields; ``turn_idx``/``ts`` stored passthrough.
    """
    return IndexSchema(
        fields=(
            FieldSpec.text("text", stored=True, positions=positions),
            FieldSpec.id("role", stored=True),
            FieldSpec.id("tool", stored=True),
            FieldSpec.id("conv_id", stored=True),
        ),
        stored_columns=("turn_idx", "ts"),
    )


def documents_schema(*, positions: bool = True) -> IndexSchema:
    """Secondary corpus: /root/testdata/sf*/documents.parquet."""
    return IndexSchema(
        fields=(
            FieldSpec.text("text", stored=True, positions=positions),
            FieldSpec.id("lang", stored=True),
            FieldSpec.id("source", stored=True),
            # indexed tiered numeric terms: range queries read covering
            # postings instead of scanning the stored column
            FieldSpec.numeric("n_chars", stored=True),
        ),
        stored_columns=("doc_id",),
    )


def events_schema() -> IndexSchema:
    """Event stream corpus: /root/testdata/sf*/events.parquet — an ID
    field on event_type plus an INDEXED DATETIME on ts, so DateRange
    filters read covering postings instead of scanning the column."""
    return IndexSchema(
        fields=(
            FieldSpec.id("event_type", stored=True),
            FieldSpec.datetime("ts", stored=True),
        ),
        stored_columns=("event_id", "user_id", "value"),
    )
