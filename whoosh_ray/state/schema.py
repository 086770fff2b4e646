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
