"""PlainText codec: dump a segment as readable text, and load it back.

Reference analogue: ``codec.plaintext.PlainTextCodec``
(/root/reference/src/whoosh/codec/plaintext.py:38-452) — a debug codec
that stores the whole segment as a human-readable text file.  Same idea
here: :func:`dump_segment` emits a line-oriented text rendering of one
segment (stored docs, then the term dictionary with fully decoded
postings/positions/chars/boosts), :func:`parse_segment` reconstructs the
EXACT Arrow tables (floats via ``float.hex`` so every BM25 input
round-trips bit-identically; blob re-encodes are deterministic, so the
rebuilt segment is byte-identical), and :func:`write_segment` lands it
back on disk in the standard format.  Debug/inspection only — nothing in
the engine's hot path reads this format.
"""

from __future__ import annotations

import base64
import json
import os

import numpy as np
import pyarrow as pa

from whoosh_ray.state import codec
from whoosh_ray.state.manifest import SegmentMeta, atomic_write_json
from whoosh_ray.state.segment import (
    BLOB_COLS,
    TERM_STAT_COLS,
    read_docs_file,
    read_terms_file,
)

HEADER = "WHOOSH-RAY PLAINTEXT SEGMENT v1"

_F64 = ("total_weight",)
_F32 = ("max_weight",)


# ---- typed scalar encode/decode (exact round-trips) ----

def _enc_val(v: pa.Scalar, typ: pa.DataType):
    """Encode one Arrow scalar to a JSON-safe value, exactly."""
    if not v.is_valid:
        return None
    if pa.types.is_floating(typ):
        return float(v.as_py()).hex()
    if pa.types.is_timestamp(typ):
        # raw int ticks; the recorded type string carries the unit/tz
        return int(v.value)
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return base64.b64encode(v.as_py()).decode("ascii")
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return [_enc_val(x, typ.value_type) for x in v.values]
    if pa.types.is_integer(typ) or pa.types.is_boolean(typ) \
            or pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return v.as_py()
    raise TypeError(f"plaintext codec: unsupported column type {typ}")


def _dec_val(v, typ: pa.DataType):
    if v is None:
        return None
    if pa.types.is_floating(typ):
        return float.fromhex(v)
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return base64.b64decode(v)
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return [_dec_val(x, typ.value_type) for x in v]
    return v


def _type_from_str(s: str) -> pa.DataType:
    if s.startswith("timestamp["):
        inner = s[len("timestamp["):-1]
        if ", tz=" in inner:
            unit, tz = inner.split(", tz=")
            return pa.timestamp(unit, tz=tz)
        return pa.timestamp(inner)
    if s.startswith("list<item: ") and s.endswith(">"):
        return pa.list_(_type_from_str(s[len("list<item: "):-1]))
    if s.startswith("large_list<item: ") and s.endswith(">"):
        return pa.large_list(_type_from_str(s[len("large_list<item: "):-1]))
    return pa.type_for_alias(s)


def _csv(arr) -> str:
    return ",".join(str(int(x)) for x in arr)


def _uncsv(s: str) -> np.ndarray:
    return (np.array([int(x) for x in s.split(",")], dtype=np.int64)
            if s else np.empty(0, dtype=np.int64))


# ---- dump ----

def dump_segment(seg_dir: str, meta: SegmentMeta | None = None) -> str:
    """Render one sealed segment as text (see module docstring)."""
    if meta is None:
        with open(os.path.join(seg_dir, "meta.json")) as f:
            meta = SegmentMeta.from_json(json.load(f))
    terms = read_terms_file(seg_dir)
    docs = read_docs_file(seg_dir)
    out = [HEADER, "META " + json.dumps(meta.to_json(), default=str)]

    out.append("DOCSCHEMA " + json.dumps(
        [[f.name, str(f.type)] for f in docs.schema]))
    for i in range(docs.num_rows):
        out.append("DOC " + json.dumps(
            {f.name: _enc_val(docs[f.name][i], f.type)
             for f in docs.schema}))

    for i in range(terms.num_rows):
        field = terms["field"][i].as_py()
        term = terms["term"][i].as_py()
        out.append(f"TERM {json.dumps(field)} {json.dumps(term)}")
        stats = {}
        for c in TERM_STAT_COLS[2:]:
            v = terms[c][i].as_py()
            stats[c] = float(v).hex() if c in _F64 + _F32 else int(v)
        out.append("  STATS " + json.dumps(stats))
        p = codec.BlobReader(terms["postings"][i].as_py()).decode_all()
        out.append("  POSTINGS docids=" + _csv(p.docids)
                   + " tfs=" + _csv(p.tfs)
                   + " lens=" + _csv(p.len_bytes)
                   + " weights=" + (",".join(float(w).hex()
                                             for w in p.weights)
                                    if p.weights is not None else "-"))
        pos = terms["positions"][i].as_py()
        if pos:
            per = codec.decode_positions(pos, p.tfs)
            out.append("  POSITIONS " + ";".join(_csv(a) for a in per))
        ch = terms["chars"][i].as_py() if "chars" in terms.column_names \
            else None
        if ch:
            per = codec.decode_chars(ch, p.tfs)
            out.append("  CHARS " + ";".join(
                ",".join(f"{int(s)}:{int(e)}" for s, e in zip(sc, ec))
                for sc, ec in per))
        bo = terms["boosts"][i].as_py() if "boosts" in terms.column_names \
            else None
        if bo:
            per = codec.decode_boosts(bo, p.tfs)
            out.append("  BOOSTS " + ";".join(
                ",".join(float(b).hex() for b in a) for a in per))
    return "\n".join(out) + "\n"


# ---- parse ----

def parse_segment(text: str) -> tuple[SegmentMeta, pa.Table, pa.Table]:
    """Inverse of :func:`dump_segment`: (meta, terms table with inline
    blob columns, docs table) — exact Arrow reconstructions."""
    lines = text.splitlines()
    if not lines or lines[0] != HEADER:
        raise ValueError("not a plaintext segment dump")
    meta = None
    doc_schema: list[tuple[str, pa.DataType]] = []
    doc_rows: list[dict] = []
    term_keys: list[tuple[str, str]] = []
    term_stats: list[dict] = []
    term_blobs: list[dict] = []

    for line in lines[1:]:
        if line.startswith("META "):
            meta = SegmentMeta.from_json(json.loads(line[5:]))
        elif line.startswith("DOCSCHEMA "):
            doc_schema = [(n, _type_from_str(t))
                          for n, t in json.loads(line[10:])]
        elif line.startswith("DOC "):
            doc_rows.append(json.loads(line[4:]))
        elif line.startswith("TERM "):
            # two JSON strings separated by one space
            dec = json.JSONDecoder()
            field, end = dec.raw_decode(line[5:])
            term, _ = dec.raw_decode(line[5 + end + 1:])
            term_keys.append((field, term))
            term_stats.append({})
            term_blobs.append({})
        elif line.startswith("  STATS "):
            st = json.loads(line[8:])
            term_stats[-1] = {
                c: (float.fromhex(v) if c in _F64 + _F32 else int(v))
                for c, v in st.items()}
        elif line.startswith("  POSTINGS "):
            kv = dict(part.split("=", 1)
                      for part in line[11:].split(" "))
            docids = _uncsv(kv["docids"])
            tfs = _uncsv(kv["tfs"])
            lens = _uncsv(kv["lens"]).astype(np.uint8)
            weights = (None if kv["weights"] == "-" else
                       np.array([float.fromhex(x)
                                 for x in kv["weights"].split(",")],
                                dtype=np.float32))
            term_blobs[-1]["postings"] = codec.encode_postings(
                docids, tfs, lens, weights=weights)
            term_blobs[-1]["_tfs"] = tfs
        elif line.startswith("  POSITIONS "):
            per = [_uncsv(s) for s in line[12:].split(";")]
            term_blobs[-1]["positions"] = codec.encode_positions(per)
        elif line.startswith("  CHARS "):
            spans = []
            for s in line[8:].split(";"):
                pairs = ([tuple(int(v) for v in p.split(":"))
                          for p in s.split(",")] if s else [])
                spans.append(
                    (np.array([a for a, _ in pairs], dtype=np.int64),
                     np.array([b for _, b in pairs], dtype=np.int64)))
            term_blobs[-1]["chars"] = codec.encode_chars(spans)
        elif line.startswith("  BOOSTS "):
            per = [np.array([float.fromhex(x) for x in s.split(",")]
                            if s else [], dtype=np.float32)
                   for s in line[9:].split(";")]
            term_blobs[-1]["boosts"] = codec.encode_boosts(per)

    if meta is None:
        raise ValueError("plaintext dump has no META line")

    docs_cols = {}
    for name, typ in doc_schema:
        vals = [_dec_val(r.get(name), typ) for r in doc_rows]
        if pa.types.is_timestamp(typ):
            docs_cols[name] = pa.array(vals, type=pa.int64()).cast(typ)
        else:
            docs_cols[name] = pa.array(vals, type=typ)
    docs = pa.table(docs_cols) if doc_schema else pa.table({})

    tcols = {
        "field": pa.array([f for f, _ in term_keys], type=pa.string()),
        "term": pa.array([t for _, t in term_keys], type=pa.string()),
    }
    stat_types = {"df": pa.int64(), "sum_tf": pa.int64(),
                  "total_weight": pa.float64(),
                  "max_weight": pa.float32(),
                  "min_length": pa.uint8(), "max_length": pa.uint8(),
                  "min_docid": pa.int64(), "max_docid": pa.int64()}
    for c, typ in stat_types.items():
        tcols[c] = pa.array([s[c] for s in term_stats], type=typ)
    for c in BLOB_COLS:
        tcols[c] = pa.array([b.get(c, b"") for b in term_blobs],
                            type=pa.large_binary())
    terms = pa.table(tcols)
    return meta, terms, docs


def write_segment(text: str, seg_dir: str) -> SegmentMeta:
    """Land a parsed dump back on disk in the standard segment format
    (terms.parquet + blobs.bin + docs.parquet + meta.json)."""
    from whoosh_ray.state.segment import write_docs_file, write_terms_file

    meta, terms, docs = parse_segment(text)
    os.makedirs(seg_dir, exist_ok=True)
    write_terms_file(seg_dir, terms)
    write_docs_file(seg_dir, docs)
    atomic_write_json(os.path.join(seg_dir, "meta.json"), meta.to_json())
    return meta
