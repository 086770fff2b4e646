"""Driver contract for the graft builder (Ray Data target).

`entry()` runs the flagship pipeline (transcript index build + BM25F
query set) at sf0.001 scale; `queries()` exposes one callable per
implemented operator family; `oracle_sql()` gives the DuckDB-equivalent
SQL for every SQL-expressible entry (column names match exactly; BM25
scores are bit-identical — the SQL embeds the same length-quantization
table and uses `::DOUBLE` literals so DuckDB's decimal literals don't
diverge from float64 arithmetic).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------- helpers

_STOPS_SQL = ("'a','an','and','are','as','at','be','by','can','for','from',"
              "'have','if','in','is','it','may','not','of','on','or','tbd',"
              "'that','the','this','to','us','we','when','will','with','yet',"
              "'you','your'")


def _langid_markers_sql() -> str:
    """(lang, marker-word, priority) VALUES rows for the text_langid
    oracle — generated from the SAME table LangId uses, so the SQL
    argmax (ORDER BY c DESC, pri) mirrors numpy's first-max-wins."""
    from whoosh_ray.pipelines.textstats import _LANG_MARKERS

    return ",".join(
        f"('{lang}', '{w}', {pri})"
        for pri, (lang, words) in enumerate(_LANG_MARKERS.items())
        for w in sorted(words))


def _quant_sql() -> str:
    from whoosh_ray.functions.lengths import BYTE_TO_LENGTH

    return ",".join(str(int(x)) for x in BYTE_TO_LENGTH)


# ---- SipHash-in-SQL -------------------------------------------------------
# The dedup/fingerprint pipelines key on ``pd.util.hash_array`` =
# splitmix64(SipHash-2-4(utf8, key)) — reverse-engineered and validated
# against pandas 2.2 (tests/test_siphash_sql.py).  The generator below
# emits that hash as NESTED SUBQUERY LAYERS (each layer's expressions
# reference only the previous layer's named columns — lateral aliases
# would blow up exponentially in the binder), which lets DuckDB oracle
# the minhash / simhash / fingerprint entries exactly.

_U64 = "18446744073709551616"  # 2^64


def _sip_rotl(x: str, b: int) -> str:
    return (f"(((({x})::HUGEINT * {1 << b}) % {_U64})::UBIGINT"
            f" | (({x}) >> {64 - b}))")


def _sip_addm(a: str, b: str) -> str:
    return f"((({a})::HUGEINT + ({b})) % {_U64})::UBIGINT"


def _sip_mulm(x: str, c: int) -> str:
    # (x * c) mod 2^64 via 32-bit split: partial products stay < 2^96,
    # inside INT128 range
    return (f"(((({x}) % 4294967296)::HUGEINT * {c}"
            f" + (((({x}) >> 32)::HUGEINT * {c}) % 4294967296)"
            f" * 4294967296) % {_U64})::UBIGINT")


def _sip_layers(col: str, key: bytes, max_blocks: int, out: str = "h"):
    """Layer list computing pandas-hash(col); supports byte lengths
    <= 8*max_blocks - 1 (ASCII input — this corpus is [a-z0-9 ])."""
    k0 = int.from_bytes(key[:8], "little")
    k1 = int.from_bytes(key[8:], "little")
    L = [[("sn", f"length({col})"),
          ("v0", f"{0x736F6D6570736575 ^ k0}::UBIGINT"),
          ("v1", f"{0x646F72616E646F6D ^ k1}::UBIGINT"),
          ("v2", f"{0x6C7967656E657261 ^ k0}::UBIGINT"),
          ("v3", f"{0x7465646279746573 ^ k1}::UBIGINT")],
         [("snb", "(sn // 8)")]]

    def round_layers():
        return [
            [("t0", _sip_addm("v0", "v1")), ("t2", _sip_addm("v2", "v3"))],
            [("u1", f"xor({_sip_rotl('v1', 13)}, t0)"),
             ("u3", f"xor({_sip_rotl('v3', 16)}, t2)"),
             ("t0r", _sip_rotl("t0", 32))],
            [("w0", _sip_addm("t0r", "u3")), ("w2", _sip_addm("t2", "u1"))],
            [("v0", "w0"),
             ("v1", f"xor({_sip_rotl('u1', 17)}, w2)"),
             ("v2", _sip_rotl("w2", 32)),
             ("v3", f"xor({_sip_rotl('u3', 21)}, w0)")],
        ]

    for k in range(max_blocks):
        parts = [f"CASE WHEN sn >= {8 * k + j + 1} THEN "
                 f"ascii(substr({col}, {8 * k + j + 1}, 1))::UBIGINT * "
                 f"{1 << (8 * j)}::UBIGINT ELSE 0::UBIGINT END"
                 for j in range(8)]
        parts.append(f"CASE WHEN {k} = snb THEN "
                     f"((sn % 256)::UBIGINT * {1 << 56}::UBIGINT) "
                     f"ELSE 0::UBIGINT END")
        L.append([("mk", " + ".join(f"({p})" for p in parts)),
                  ("p0", "v0"), ("p1", "v1"), ("p2", "v2"), ("p3", "v3")])
        L.append([("v3", "xor(v3, mk)")])
        L.extend(round_layers())
        L.extend(round_layers())
        L.append([("v0", "xor(v0, mk)")])
        L.append([(v, f"CASE WHEN {k} <= snb THEN {v} ELSE p{i} END")
                  for i, v in enumerate(["v0", "v1", "v2", "v3"])])
    L.append([("v2", "xor(v2, 255::UBIGINT)")])
    for _ in range(4):
        L.extend(round_layers())
    L.append([("hx", "xor(xor(v0, v1), xor(v2, v3))")])
    L.append([("hx", "xor(hx, hx >> 30)")])
    L.append([("hx", _sip_mulm("hx", 0xBF58476D1CE4E5B9))])
    L.append([("hx", "xor(hx, hx >> 27)")])
    L.append([("hx", _sip_mulm("hx", 0x94D049BB133111EB))])
    L.append([(out, "xor(hx, hx >> 31)")])
    return L


def _siphash_sql(base_sql: str, col: str, keep: list[str], *,
                 key: bytes = b"0123456789123456", max_blocks: int = 2,
                 out: str = "h") -> str:
    """Wrap ``base_sql`` (yielding ``col`` + ``keep``) in the hash
    layers; the result selects keep + ``out`` = pandas-hash(col)."""
    sql = f"({base_sql})"
    defined: set[str] = set()
    for layer in _sip_layers(col, key, max_blocks, out):
        redef = [n for n, _ in layer if n in defined]
        star = (f"* EXCLUDE ({', '.join(redef)})" if redef else "*")
        cols = ", ".join(f"{e} AS {n}" for n, e in layer)
        sql = f"(SELECT {star}, {cols} FROM {sql})"
        defined.update(n for n, _ in layer)
    return f"SELECT {', '.join(keep)}, {out} FROM {sql}"


def _tok_rows_sql(table: str = "documents") -> str:
    """(doc_id, token) rows WITH multiplicity — StandardAnalyzer CTE."""
    return rf"""
WITH tok AS (
  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '\w+(\.?\w+)*'),
    t -> length(t) >= 2 AND t NOT IN ({_STOPS_SQL})) AS toks
  FROM {table}
)
SELECT doc_id, unnest(toks) AS w FROM tok
"""


_SHINGLES_CASE = """
    CASE WHEN len(toks) >= 3 THEN
      list_distinct(list_transform(range(1, len(toks) - 1),
        i -> concat_ws(' ', list_extract(toks, i), list_extract(toks, i + 1),
                       list_extract(toks, i + 2))))
    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
    ELSE []::VARCHAR[] END
"""


def _shingle_rows_sql() -> str:
    return rf"""
WITH tok AS (
  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '\w+(\.?\w+)*'),
    t -> length(t) >= 2 AND t NOT IN ({_STOPS_SQL})) AS toks
  FROM documents
),
sh AS (SELECT doc_id, {_SHINGLES_CASE} AS shingles FROM tok)
SELECT doc_id, unnest(shingles) AS w FROM sh
"""


def _u64_to_i64(col: str) -> str:
    return (f"CASE WHEN {col} >= 9223372036854775808::UBIGINT "
            f"THEN ({col}::HUGEINT - {_U64})::BIGINT "
            f"ELSE {col}::BIGINT END")


def _fingerprints_sql() -> str:
    hashed = _siphash_sql(_tok_rows_sql(), "w", ["doc_id"])
    return f"""
SELECT d.doc_id AS doc_id,
  coalesce({_u64_to_i64('x.f')}, 0) AS fingerprint
FROM documents d LEFT JOIN (
  SELECT doc_id, bit_xor(h) AS f FROM ({hashed}) GROUP BY doc_id
) x ON d.doc_id = x.doc_id
ORDER BY d.doc_id
"""


def _simhash_sql() -> str:
    # engine packs (v > 0)[::-1] via np.packbits().view(uint64): bit j of
    # the hash lands at position j + 16*((63-j)//8) - 56 (verified)
    def pos(j):
        return j + 16 * ((63 - j) // 8) - 56

    hashed = _siphash_sql(_tok_rows_sql(), "w", ["doc_id"])
    terms = " + ".join(
        f"(CASE WHEN 2 * sum(((h >> {j}) & 1)::HUGEINT) - count(*) > 0 "
        f"THEN {1 << pos(j)}::HUGEINT ELSE 0::HUGEINT END)"
        for j in range(64))
    return f"""
SELECT d.doc_id AS doc_id,
  coalesce(CASE WHEN x.s >= 9223372036854775808::HUGEINT
           THEN (x.s - {_U64})::BIGINT ELSE x.s::BIGINT END, 0) AS simhash
FROM documents d LEFT JOIN (
  SELECT doc_id, ({terms}) AS s FROM ({hashed}) GROUP BY doc_id
) x ON d.doc_id = x.doc_id
ORDER BY d.doc_id
"""


def _minhash_pairs_sql() -> str:
    """MinHash-LSH candidates + exact-Jaccard verification, end to end:
    shingle SipHashes, the 64 affine signatures WITH the engine's numpy
    int64 wraparound semantics, 16x4 band-bucket folding, bucket-join
    candidates, jaccard >= 0.5 verification."""
    from whoosh_ray.pipelines.dedup import _hash_params

    a, b = _hash_params()
    params = ",".join(f"({i},{int(a[i])}::HUGEINT,{int(b[i])}::HUGEINT)"
                      for i in range(len(a)))
    m61 = (1 << 61) - 1
    h63 = 9223372036854775808

    def fmw(x):  # floor-mod(int64-wrap(x), 2^61-1), x a HUGEINT expr
        return (f"(((((({x}) % {_U64}) + {_U64} + {h63}) % {_U64} - {h63})"
                f" % {m61} + {m61}) % {m61})")

    hashed = _siphash_sql(_shingle_rows_sql(), "w", ["doc_id"],
                          max_blocks=4)
    jacc = ("len(list_intersect(a.shingles, b.shingles))::DOUBLE / "
            "(len(a.shingles) + len(b.shingles) "
            "- len(list_intersect(a.shingles, b.shingles)))")
    return rf"""
WITH hs AS (
  SELECT doc_id, (h % {m61})::HUGEINT AS x FROM ({hashed})
),
params(i, pa, pb) AS (SELECT * FROM (VALUES {params})),
sig AS (
  SELECT hs.doc_id, p.i, min({fmw('p.pa * hs.x + p.pb')}) AS s
  FROM hs, params p GROUP BY hs.doc_id, p.i
),
bands AS (
  SELECT doc_id, (i // 4) AS band,
         max(CASE WHEN i % 4 = 0 THEN s END) AS s0,
         max(CASE WHEN i % 4 = 1 THEN s END) AS s1,
         max(CASE WHEN i % 4 = 2 THEN s END) AS s2,
         max(CASE WHEN i % 4 = 3 THEN s END) AS s3
  FROM sig GROUP BY doc_id, (i // 4)
),
buckets AS (
  SELECT doc_id, band,
    {fmw(fmw(fmw('s0 * 1000003 + s1') + ' * 1000003 + s2')
         + ' * 1000003 + s3')} AS bucket
  FROM bands
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM buckets x JOIN buckets y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
shs AS (
  SELECT doc_id, {_SHINGLES_CASE} AS shingles
  FROM (SELECT doc_id, list_filter(
          regexp_extract_all(lower(text), '\w+(\.?\w+)*'),
          t -> length(t) >= 2 AND t NOT IN ({_STOPS_SQL})) AS toks
        FROM documents)
)
SELECT c.doc_a, c.doc_b, {jacc} AS jaccard
FROM cand c
JOIN shs a ON a.doc_id = c.doc_a
JOIN shs b ON b.doc_id = c.doc_b
WHERE {jacc} >= 0.5
ORDER BY doc_a, doc_b
"""


def _base_ctes() -> str:
    """Shared CTEs: tokenization (StandardAnalyzer parity), quantized
    lengths, postings, global stats."""
    return rf"""
quant AS (SELECT unnest([{_quant_sql()}]) AS l),
tok AS (
  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '\w+(\.?\w+)*'),
    t -> length(t) >= 2 AND t NOT IN ({_STOPS_SQL})) AS toks
  FROM documents
),
lens AS (
  SELECT doc_id, len(toks) AS fl_exact,
    (SELECT min(l) FROM quant WHERE l >= least(len(toks), 106374)) AS fl_q
  FROM tok
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tok, unnest(toks) AS u(term) GROUP BY doc_id, term
),
stats AS (SELECT (SELECT count(*) FROM lens)::DOUBLE AS dc,
                 (SELECT sum(fl_exact) FROM lens)::DOUBLE AS total_len),
ts AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY term)
"""


_BM25_EXPR = ("(ln(dc / (df + 1)) + 1) * ((tf * (1.2::DOUBLE + 1)) / "
              "(tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * fl_q "
              "/ (total_len / dc))))")


def _bm25_single_sql(term: str, limit: int = 10) -> str:
    return rf"""
WITH {_base_ctes()},
scored AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = '{term}' AND ts.term = '{term}'
)
SELECT (row_number() OVER (ORDER BY score DESC, docid) - 1) AS rank,
       docid, score
FROM scored ORDER BY score DESC, docid LIMIT {limit}
"""


def _bm25_pair_sql(term_a: str, term_b: str, op: str, limit: int = 10) -> str:
    """op = 'and' (intersection, sum) or 'or' (union, sum)."""
    join = "JOIN" if op == "and" else "FULL OUTER JOIN"
    return rf"""
WITH {_base_ctes()},
sa AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = '{term_a}' AND ts.term = '{term_a}'
),
sb AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = '{term_b}' AND ts.term = '{term_b}'
),
scored AS (
  SELECT coalesce(sa.docid, sb.docid) AS docid,
         coalesce(sa.score, 0) + coalesce(sb.score, 0) AS score
  FROM sa {join} sb ON sa.docid = sb.docid
)
SELECT (row_number() OVER (ORDER BY score DESC, docid) - 1) AS rank,
       docid, score
FROM scored ORDER BY score DESC, docid LIMIT {limit}
"""


def _transcripts_ctes(src: str = "/tmp/whoosh_ray_qsoracle/src") -> str:
    """Transcript-schema twin of _base_ctes: docid = dense rank of
    (conv_id, turn_idx); text TEXT field (StandardAnalyzer CTE) plus the
    role ID field (one token per doc, scored as raw weight).
    Reads the deterministic corpus the transcripts_bm25_rank query entry
    writes to ``src`` (engine runs first)."""
    return rf"""
quant AS (SELECT unnest([{_quant_sql()}]) AS l),
tsrc AS (
  SELECT role, text,
         (row_number() OVER (ORDER BY conv_id, turn_idx) - 1)::BIGINT
           AS doc_id
  FROM read_parquet('{src}/*.parquet')
),
tok AS (
  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '\w+(\.?\w+)*'),
    t -> length(t) >= 2 AND t NOT IN ({_STOPS_SQL})) AS toks
  FROM tsrc
),
lens AS (
  SELECT doc_id, len(toks) AS fl_exact,
    (SELECT min(l) FROM quant WHERE l >= least(len(toks), 106374)) AS fl_q
  FROM tok
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tok, unnest(toks) AS u(term) GROUP BY doc_id, term
),
stats AS (SELECT (SELECT count(*) FROM lens)::DOUBLE AS dc,
                 (SELECT sum(fl_exact) FROM lens)::DOUBLE AS total_len),
ts AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY term),
rpostings AS (SELECT doc_id, role AS term, 1::BIGINT AS tf FROM tsrc)
"""


def _transcripts_ops_sql(src: str = "/tmp/whoosh_ray_qsops/src") -> str:
    """AndNot/Require/AndMaybe/Prefix/slop-Phrase of the flagship
    queryset.  The AndNot first-doc-escape quirk (reference
    binary.py:577-581: a's globally-first doc escapes exclusion unless
    it is also b's first doc) is encoded as a UNION of the anti-join
    with a's min-docid row when min(a) != min(b)."""
    rank = ("(row_number() OVER (ORDER BY score DESC, docid) - 1) AS rank, "
            "docid, score")
    return rf"""
WITH {_transcripts_ctes(src)},
sdeploy AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'deploy' AND ts.term = 'deploy'
),
srender AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'render' AND ts.term = 'render'
),
q_andnot AS (
  SELECT 'andnot' AS query, {rank} FROM (
    SELECT a.docid, a.score FROM sdeploy a
    WHERE a.docid NOT IN (SELECT docid FROM srender)
    UNION
    SELECT a.docid, a.score FROM sdeploy a
    WHERE a.docid = (SELECT min(docid) FROM sdeploy)
      AND (SELECT min(docid) FROM sdeploy)
          IS DISTINCT FROM (SELECT min(docid) FROM srender))
  ORDER BY score DESC, docid LIMIT 10
),
q_require AS (
  SELECT 'require' AS query, {rank} FROM (
    SELECT a.docid, a.score FROM sdeploy a
    JOIN srender b USING (docid))
  ORDER BY score DESC, docid LIMIT 10
),
q_andmaybe AS (
  SELECT 'andmaybe' AS query, {rank} FROM (
    SELECT a.docid, a.score + coalesce(b.score, 0) AS score
    FROM sdeploy a LEFT JOIN srender b USING (docid))
  ORDER BY score DESC, docid LIMIT 10
),
q_prefix AS (
  -- >=3-word expansion => constantscore literal 1.0 (boost dropped)
  SELECT 'prefix' AS query, {rank} FROM (
    SELECT DISTINCT doc_id AS docid, 1.0::DOUBLE AS score
    FROM postings WHERE term LIKE 'pa%')
  ORDER BY score DESC, docid LIMIT 10
),
positions AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS pos
  FROM tok
),
slop_docs AS (
  SELECT DISTINCT p1.doc_id AS doc_id
  FROM positions p1 JOIN positions p2
    ON p1.doc_id = p2.doc_id
   AND p2.pos BETWEEN p1.pos + 1 AND p1.pos + 2
  WHERE p1.term = 'deploy' AND p2.term = 'render'
),
q_slop AS (
  SELECT 'slop' AS query, {rank} FROM (
    SELECT a.docid, a.score + b.score AS score
    FROM sdeploy a JOIN srender b USING (docid)
    WHERE a.docid IN (SELECT doc_id FROM slop_docs))
  ORDER BY score DESC, docid LIMIT 10
)
SELECT * FROM q_andnot UNION ALL SELECT * FROM q_require
UNION ALL SELECT * FROM q_andmaybe UNION ALL SELECT * FROM q_prefix
UNION ALL SELECT * FROM q_slop
"""


def _transcripts_parsed_sql(src: str = "/tmp/whoosh_ray_qsparsed/src") -> str:
    """Parsed-query members (SimpleParser / OrGroup-scale / DisMax).

    - simple_or: Or union-sum;
    - simple_pm: AndNot(AndMaybe(deploy, render), cluster) incl. the
      AndNot first-doc-escape quirk;
    - orgroup_scale: the SQR coordination formula
      (score + (matching-1)/(termcount-scale)^2) * (termcount-1)/termcount
      with left-associated addition matching the engine's bincount order;
    - dismax: the reference DJM cursor-leak — per doc, per LEAF, the
      leaf's score at its first docid >= doc, max over leaves
      (binary.py:369-376; correlated subqueries encode the leak)."""
    rank = ("(row_number() OVER (ORDER BY score DESC, docid) - 1) AS rank, "
            "docid, score")
    return rf"""
WITH {_transcripts_ctes(src)},
sdeploy AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'deploy' AND ts.term = 'deploy'
),
srender AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'render' AND ts.term = 'render'
),
scluster AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'cluster' AND ts.term = 'cluster'
),
serror AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'error' AND ts.term = 'error'
),
sbash AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'bash' AND ts.term = 'bash'
),
stool AS (
  -- tool is an ID field: WeightScorer raw weight (tf = 1)
  SELECT docid, 1.0::DOUBLE AS score FROM (
    SELECT tool,
      (row_number() OVER (ORDER BY conv_id, turn_idx) - 1)::BIGINT AS docid
    FROM read_parquet('{src}/*.parquet'))
  WHERE tool = 'bash'
),
q_simple_or AS (
  SELECT 'simple_or' AS query, {rank} FROM (
    SELECT coalesce(a.docid, b.docid) AS docid,
           coalesce(a.score, 0) + coalesce(b.score, 0) AS score
    FROM sdeploy a FULL OUTER JOIN srender b ON a.docid = b.docid)
  ORDER BY score DESC, docid LIMIT 10
),
am AS (
  SELECT a.docid, a.score + coalesce(b.score, 0) AS score
  FROM sdeploy a LEFT JOIN srender b USING (docid)
),
q_simple_pm AS (
  SELECT 'simple_pm' AS query, {rank} FROM (
    SELECT am.docid, am.score FROM am
    WHERE am.docid NOT IN (SELECT docid FROM scluster)
    UNION
    SELECT am.docid, am.score FROM am
    WHERE am.docid = (SELECT min(docid) FROM am)
      AND (SELECT min(docid) FROM am)
          IS DISTINCT FROM (SELECT min(docid) FROM scluster))
  ORDER BY score DESC, docid LIMIT 10
),
u3 AS (
  SELECT coalesce(a.docid, b.docid, c.docid) AS docid,
         coalesce(a.score, 0) + coalesce(b.score, 0)
           + coalesce(c.score, 0) AS score,
         ((a.docid IS NOT NULL)::INT + (b.docid IS NOT NULL)::INT
           + (c.docid IS NOT NULL)::INT)::BIGINT AS matching
  FROM sdeploy a
  FULL OUTER JOIN srender b ON a.docid = b.docid
  FULL OUTER JOIN serror c ON coalesce(a.docid, b.docid) = c.docid
),
tc AS (
  SELECT count(*)::BIGINT AS n FROM ts
  WHERE term IN ('deploy', 'render', 'error')
),
q_orgroup_scale AS (
  SELECT 'orgroup_scale' AS query, {rank} FROM (
    SELECT u3.docid,
           (u3.score + (u3.matching - 1)::DOUBLE
              / ((tc.n - 0.9::DOUBLE) * (tc.n - 0.9::DOUBLE)))
           * ((tc.n - 1)::DOUBLE / tc.n) AS score
    FROM u3, tc)
  ORDER BY score DESC, docid LIMIT 10
),
udj AS (SELECT docid FROM sbash UNION SELECT docid FROM stool),
dj AS (
  SELECT u.docid, (SELECT s.score FROM sbash s WHERE s.docid >= u.docid
                   ORDER BY s.docid LIMIT 1) AS sc
  FROM udj u
  UNION ALL
  SELECT u.docid, (SELECT s.score FROM stool s WHERE s.docid >= u.docid
                   ORDER BY s.docid LIMIT 1) AS sc
  FROM udj u
),
q_dismax AS (
  SELECT 'dismax' AS query, {rank} FROM (
    SELECT docid, max(sc) AS score FROM dj
    WHERE sc IS NOT NULL GROUP BY docid)
  ORDER BY score DESC, docid LIMIT 10
)
SELECT * FROM q_simple_or UNION ALL SELECT * FROM q_simple_pm
UNION ALL SELECT * FROM q_orgroup_scale UNION ALL SELECT * FROM q_dismax
"""


def _transcripts_queryset_sql(
        src: str = "/tmp/whoosh_ray_qsoracle/src") -> str:
    """term/and/or/phrase/role of the flagship queryset, rank+score."""
    rank = ("(row_number() OVER (ORDER BY score DESC, docid) - 1) AS rank, "
            "docid, score")
    return rf"""
WITH {_transcripts_ctes(src)},
sdeploy AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'deploy' AND ts.term = 'deploy'
),
srender AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'render' AND ts.term = 'render'
),
scluster AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'cluster' AND ts.term = 'cluster'
),
serror AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'error' AND ts.term = 'error'
),
suser AS (
  -- role is an ID field: not scorable, so the engine (like the
  -- reference BM25F.scorer) falls back to WeightScorer = raw weight
  SELECT p.doc_id AS docid, p.tf::DOUBLE AS score
  FROM rpostings p WHERE p.term = 'user'
),
positions AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS pos
  FROM tok
),
phrase_docs AS (
  SELECT DISTINCT p1.doc_id AS doc_id
  FROM positions p1 JOIN positions p2
    ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
  WHERE p1.term = 'deploy' AND p2.term = 'render'
),
q_term AS (
  SELECT 'term' AS query, {rank} FROM sdeploy
  ORDER BY score DESC, docid LIMIT 10
),
q_and AS (
  SELECT 'and' AS query, {rank} FROM (
    SELECT a.docid, a.score + b.score AS score
    FROM sdeploy a JOIN srender b USING (docid))
  ORDER BY score DESC, docid LIMIT 10
),
q_or AS (
  SELECT 'or' AS query, {rank} FROM (
    SELECT coalesce(a.docid, b.docid) AS docid,
           coalesce(a.score, 0) + coalesce(b.score, 0) AS score
    FROM scluster a FULL OUTER JOIN serror b ON a.docid = b.docid)
  ORDER BY score DESC, docid LIMIT 10
),
q_phrase AS (
  SELECT 'phrase' AS query, {rank} FROM (
    SELECT a.docid, a.score + b.score AS score
    FROM sdeploy a JOIN srender b USING (docid)
    WHERE a.docid IN (SELECT doc_id FROM phrase_docs))
  ORDER BY score DESC, docid LIMIT 10
),
q_role AS (
  SELECT 'role' AS query, {rank} FROM (
    SELECT a.docid, a.score + b.score AS score
    FROM sdeploy a JOIN suser b USING (docid))
  ORDER BY score DESC, docid LIMIT 10
)
SELECT * FROM q_term UNION ALL SELECT * FROM q_and
UNION ALL SELECT * FROM q_or UNION ALL SELECT * FROM q_phrase
UNION ALL SELECT * FROM q_role
"""


def _phrase_sql(word1: str, word2: str, limit: int = 10) -> str:
    """Adjacent-pair phrase over analyzer positions + sum-of-term-scores."""
    return rf"""
WITH {_base_ctes()},
positions AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS pos
  FROM tok
),
phrase_docs AS (
  SELECT DISTINCT p1.doc_id AS doc_id
  FROM positions p1 JOIN positions p2
    ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
  WHERE p1.term = '{word1}' AND p2.term = '{word2}'
),
sa AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = '{word1}' AND ts.term = '{word1}'
),
sb AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = '{word2}' AND ts.term = '{word2}'
),
scored AS (
  SELECT sa.docid AS docid, sa.score + sb.score AS score
  FROM sa JOIN sb USING (docid)
  WHERE docid IN (SELECT doc_id FROM phrase_docs)
)
SELECT (row_number() OVER (ORDER BY score DESC, docid) - 1) AS rank,
       docid, score
FROM scored ORDER BY score DESC, docid LIMIT {limit}
"""


# engine-side query constructors (lazy imports keep module import cheap)

def _searcher(sf_dir: str):
    from whoosh_ray.pipelines.ir import documents_searcher

    return documents_searcher(sf_dir)


def _read_docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))


# ---------------------------------------------------------------- contract


def entry() -> Any:
    """Flagship: build the transcript index with the Ray pipeline and run
    a BM25F query set; returns the concatenated top-k result table."""
    import shutil

    from whoosh_ray.pipelines.build import build_index
    from whoosh_ray.pipelines.ir import topk_table, topk_table_filtered
    from whoosh_ray.search import And, Or, Phrase, Searcher, Term
    from whoosh_ray.search.nested import NestedParent
    from whoosh_ray.search.spans import SpanNear
    from whoosh_ray.sources.transcripts import write_transcripts
    from whoosh_ray.state.schema import transcripts_schema

    work = "/tmp/whoosh_ray_entry"
    shutil.rmtree(work, ignore_errors=True)
    src = write_transcripts(os.path.join(work, "src"), n_convs=30)
    manifest = build_index(src, os.path.join(work, "ix"),
                           transcripts_schema(), seg_size=64)
    s = Searcher(os.path.join(work, "ix"), manifest)
    queryset = {
        "term": Term("text", "deploy"),
        "and": And([Term("text", "deploy"), Term("text", "render")]),
        "or": Or([Term("text", "cluster"), Term("text", "error")]),
        "phrase": Phrase("text", ["deploy", "render"]),
        "role": And([Term("text", "deploy"), Term("role", "user")]),
        "span_near": SpanNear.phrase("text", ["deploy", "november"],
                                     slop=3, ordered=False),
        "nested_max": NestedParent(Term("role", "user"),
                                   Term("text", "deploy"), score_fn=max),
    }
    parts = []
    for name, q in queryset.items():
        t = topk_table(s, q, limit=10)
        parts.append(t.append_column(
            "query", pa.array([name] * t.num_rows, type=pa.string())))
    # the roaring filter=/mask= surface, smoke-covered too
    allow = s.search(Term("role", "user"), limit=None).docid_set()
    t = topk_table_filtered(s, Term("text", "deploy"), filter=allow)
    parts.append(t.append_column(
        "query", pa.array(["filtered"] * t.num_rows, type=pa.string())))
    return pa.concat_tables(parts)


def queries() -> dict[str, Callable[[str], Any]]:
    from whoosh_ray.pipelines import ir
    from whoosh_ray.search import And, Or, Phrase, Prefix, Term

    def ir_term_stats(sf_dir):
        return ir.term_stats_table(_searcher(sf_dir))

    def ir_bm25_spark(sf_dir):
        return ir.topk_table(_searcher(sf_dir), Term("text", "spark"))

    def ir_bm25_window(sf_dir):
        return ir.topk_table(_searcher(sf_dir), Term("text", "window"))

    def ir_bm25_and(sf_dir):
        return ir.topk_table(
            _searcher(sf_dir), And([Term("text", "spark"), Term("text", "hash")]))

    def ir_bm25_or(sf_dir):
        return ir.topk_table(
            _searcher(sf_dir), Or([Term("text", "spark"), Term("text", "hash")]))

    def ir_phrase(sf_dir):
        return ir.topk_table(_searcher(sf_dir),
                             Phrase("text", ["table", "hash"]))

    def ir_prefix(sf_dir):
        s = _searcher(sf_dir)
        r = s.search(Prefix("text", "s"), limit=None)
        return pa.table({
            "docid": pa.array(np.sort(r.docids), type=pa.int64()),
        })

    def ir_facet_source(sf_dir):
        return ir.facet_count(_searcher(sf_dir), Term("text", "spark"),
                              "source")

    def ir_numeric_range(sf_dir):
        """Indexed tiered-numeric range (covering-cell postings, no
        column scan) AND'd with a text term."""
        from whoosh_ray.search import And, NumericRange

        s = _searcher(sf_dir)
        r = s.search(And([Term("text", "table"),
                          NumericRange("n_chars", 120, 480,
                                       endexcl=True)]), limit=None)
        return pa.table({
            "docid": pa.array(np.sort(r.docids), type=pa.int64()),
        })

    def ir_keyword_bool(sf_dir):
        """KEYWORD(lang, lowercased) AND BOOLEAN(long_doc = n_chars
        >= 300, derived by an Arrow map_batches stage) AND
        IDLIST(source) — the field-type family end-to-end."""
        from whoosh_ray.pipelines.ir import fieldtypes_searcher
        from whoosh_ray.search import And, Not

        s = fieldtypes_searcher(sf_dir)
        r = s.search(And([Term("lang", "en"), Term("long_doc", "t"),
                          Not(Term("source", "src0"))]), limit=None)
        return pa.table({
            "docid": pa.array(np.sort(r.docids), type=pa.int64()),
        })

    def ir_date_range(sf_dir):
        """INDEXED DateRange (tiered shift terms on epoch-microsecond
        int64, covering-cell postings — no timestamp-column scan)
        AND'd with an event_type ID term over the events table."""
        import datetime

        from whoosh_ray.pipelines.ir import events_searcher
        from whoosh_ray.search import And, DateRange

        s = events_searcher(sf_dir)
        r = s.search(And([Term("event_type", "purchase"),
                          DateRange("ts",
                                    datetime.datetime(2024, 1, 3),
                                    datetime.datetime(2024, 1, 10),
                                    endexcl=True)]), limit=None)
        ids = s.stored(np.sort(r.docids), columns=["event_id"])
        return pa.table({
            "event_id": pa.array(np.sort(ids["event_id"].to_numpy()),
                                 type=pa.int64()),
        })

    def ir_facet_query(sf_dir):
        """QueryFacet grouping (first-matching-query key, other=
        fallback) with Count maptype — facet-family driver check."""
        from whoosh_ray.search import Count, QueryFacet

        s = _searcher(sf_dir)
        r = s.search(
            Term("text", "table"), limit=None,
            groupedby=QueryFacet({"has_spark": Term("text", "spark"),
                                  "has_hash": Term("text", "hash")},
                                 other="misc"),
            maptype=Count)
        g = r.groups()
        keys = sorted(g)
        return pa.table({
            "grp": pa.array(keys, type=pa.string()),
            "n": pa.array([g[k] for k in keys], type=pa.int64()),
        })

    def ir_sorted_nchars(sf_dir):
        return ir.sorted_by(_searcher(sf_dir), Term("text", "spark"),
                            "n_chars", limit=20)

    def ir_collapse_lang(sf_dir):
        return ir.collapse_best_per_key(_searcher(sf_dir),
                                        Term("text", "spark"), "lang")

    def ir_collapse_top(sf_dir):
        # full collapse contract: top-2 per language ordered by the
        # n_chars column (collapse_limit + collapse_order, distributed)
        return ir.collapse_top_per_key(_searcher(sf_dir),
                                       Term("text", "spark"), "lang",
                                       limit=2, order_col="n_chars")

    def dedup_exact_q(sf_dir):
        from whoosh_ray.pipelines.dedup import dedup_exact

        out = dedup_exact(_read_docs(sf_dir)).to_pandas()
        return pa.table({"doc_id": pa.array(np.sort(out["doc_id"].to_numpy()),
                                            type=pa.int64())})

    def dedup_jaccard_pairs(sf_dir):
        from whoosh_ray.pipelines.dedup import jaccard_pairs_exact

        pdf = jaccard_pairs_exact(_read_docs(sf_dir), threshold=0.5)
        pdf = pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        return pa.table({
            "doc_a": pa.array(pdf["doc_a"], type=pa.int64()),
            "doc_b": pa.array(pdf["doc_b"], type=pa.int64()),
            "jaccard": pa.array(pdf["jaccard"], type=pa.float64()),
        })

    def dedup_minhash_pairs(sf_dir):
        """MinHash-LSH candidates + Jaccard verification, hash-checked:
        the DuckDB oracle reproduces the whole chain — pandas hash_array
        (= splitmix64(SipHash-2-4), generated as nested-layer SQL), the
        64 affine signatures with numpy int64-wraparound semantics, the
        16x4 band-bucket folding and the exact-Jaccard verify."""
        from whoosh_ray.pipelines.dedup import (minhash_candidate_pairs,
                                                verify_jaccard)

        ds = _read_docs(sf_dir)
        cand = minhash_candidate_pairs(ds).to_pandas()
        pdf = verify_jaccard(ds, cand, threshold=0.5)
        pdf = pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def dedup_embed_pairs(sf_dir):
        """Embedding-cosine near-dup pairs, EXACT (broadcast-matmul
        scan; the LSH-bucketed variant embed_cosine_lsh is the no-
        broadcast 100-TB path, pytest-verified for exact precision)."""
        import ray.data

        from whoosh_ray.pipelines.dedup import embed_cosine_pairs

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"])
        pdf = embed_cosine_pairs(ds, threshold=0.4)
        return pa.table({
            "id_a": pa.array(pdf["id_a"], type=pa.int64()),
            "id_b": pa.array(pdf["id_b"], type=pa.int64()),
            "cosine": pa.array(np.round(pdf["cosine"].to_numpy(), 6),
                               type=pa.float64()),
        })

    def embed_lsh_exhaustive(sf_dir):
        """embed_cosine_lsh with band_bits=0: every vector lands in ONE
        bucket, so the candidate set is ALL pairs and the LSH output
        must equal the exact scan — puts the LSH bucketing + verify
        plumbing under the SQL hash gate the way knn_ivf_exhaustive
        gates IVF (VERDICT r4 #5).  The production-recall variant is
        pytest-verified (test_embed_dedup)."""
        import ray.data

        from whoosh_ray.pipelines.dedup import embed_cosine_lsh

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"])
        pdf = embed_cosine_lsh(ds, threshold=0.4, n_bands=1,
                               band_bits=0, max_bucket=None)
        return pa.table({
            "id_a": pa.array(pdf["id_a"], type=pa.int64()),
            "id_b": pa.array(pdf["id_b"], type=pa.int64()),
            "cosine": pa.array(np.round(pdf["cosine"].to_numpy(), 6),
                               type=pa.float64()),
        })

    def knn_top10(sf_dir):
        import pyarrow.parquet as pq

        from whoosh_ray.pipelines.knn import knn_bruteforce
        import ray.data

        emb_path = os.path.join(sf_dir, "embeddings.parquet")
        head = pq.read_table(emb_path).slice(0, 5)
        qids = head["vec_id"].to_numpy()
        qmat = np.array(head["embedding"].to_pylist(), dtype=np.float64)
        ds = ray.data.read_parquet(emb_path)
        out = knn_bruteforce(ds, qids, qmat, k=10)
        return pa.table({
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
        })

    def knn_ivf_exhaustive(sf_dir):
        """IVF index machinery under the HASH gate: with nprobe == nlist
        every bucket partition is read through the IVF plumbing
        (bucket-partitioned parquet, per-bucket gather, global merge)
        and the result must equal exact brute-force cosine top-k —
        the DuckDB oracle.  The pruned (approximate) path stays the
        separate rows-only knn_ivf_top10 entry with its recall pytest."""
        import pyarrow.parquet as pq
        import ray.data

        from whoosh_ray.pipelines.knn import knn_ivf

        emb_path = os.path.join(sf_dir, "embeddings.parquet")
        head = pq.read_table(emb_path).slice(0, 5)
        out = knn_ivf(ray.data.read_parquet(emb_path),
                      head["vec_id"].to_numpy(),
                      np.array(head["embedding"].to_pylist(),
                               dtype=np.float64),
                      k=10, nlist=16, nprobe=16,
                      index_dir=os.path.join(
                          "/tmp/whoosh_ray_cache",
                          "ivfx-" + sf_dir.strip("/").replace("/", "_")))
        return pa.table({
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
        })

    def text_token_stats(sf_dir):
        from whoosh_ray.pipelines.textstats import token_stats

        ds = token_stats(_read_docs(sf_dir))
        agg = ds.groupby("lang").sum(
            ["n_tokens", "n_tokens_all", "n_stopwords"])
        pdf = agg.to_pandas().sort_values("lang").reset_index(drop=True)
        pdf.columns = ["lang", "total_tokens", "total_tokens_all",
                       "total_stopwords"]
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def text_fingerprints(sf_dir):
        """SipHash-based order-insensitive doc fingerprints, hash-checked:
        the oracle replays pandas hash_array in SQL and bit_xor-folds
        per doc (multiplicity included)."""
        from whoosh_ray.pipelines.textstats import Fingerprint

        ds = _read_docs(sf_dir).map_batches(Fingerprint(),
                                            batch_format="pyarrow")
        return ds.select_columns(["doc_id", "fingerprint"])

    def text_langid(sf_dir):
        """Stopword-profile language ID (hash-checked: the DuckDB oracle
        replays the same marker table + first-max-wins argmax)."""
        from whoosh_ray.pipelines.textstats import LangId

        ds = _read_docs(sf_dir).map_batches(LangId(), batch_format="pyarrow")
        return ds.select_columns(["doc_id", "lang_pred"])

    def text_simhash(sf_dir):
        """64-bit simhash fingerprints, hash-checked: per-bit majority
        over token-occurrence SipHashes, incl. the engine's packbits
        bit-order quirk (bit j lands at j + 16*((63-j)//8) - 56)."""
        from whoosh_ray.pipelines.dedup import SimHasher

        ds = _read_docs(sf_dir).map_batches(SimHasher(),
                                            batch_format="pyarrow")
        return ds.select_columns(["doc_id", "simhash"])

    def events_sessionize(sf_dir):
        import ray.data

        from whoosh_ray.pipelines.events import sessionize

        ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
        out = sessionize(ds).to_pandas().sort_values(
            ["user_id", "session"]).reset_index(drop=True)
        return pa.table({
            "user_id": pa.array(out["user_id"], type=pa.int64()),
            "session": pa.array(out["session"], type=pa.int64()),
            "n_events": pa.array(out["n_events"], type=pa.int64()),
            "start_us": pa.array(out["start_ts"].astype("int64") // 1000
                                 if out["start_ts"].dtype.kind == "M"
                                 and out["start_ts"].dt.unit == "ns"
                                 else out["start_ts"].astype("int64"),
                                 type=pa.int64()),
            "end_us": pa.array(out["end_ts"].astype("int64") // 1000
                               if out["end_ts"].dtype.kind == "M"
                               and out["end_ts"].dt.unit == "ns"
                               else out["end_ts"].astype("int64"),
                               type=pa.int64()),
        })

    def events_windows(sf_dir):
        import ray.data

        from whoosh_ray.pipelines.events import tumbling_window_counts

        ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
        out = tumbling_window_counts(ds).to_pandas()
        return pa.table({
            "window": pa.array(out["window"], type=pa.int64()),
            "n": pa.array(out["n"], type=pa.int64()),
        })

    def ir_range_facet(sf_dir):
        from whoosh_ray.search import Term

        s = _searcher(sf_dir)
        r = s.search(Term("text", "spark"), limit=None)
        stored = s.stored(r.docids, columns=["n_chars"]).to_pandas()
        stored["bin"] = stored["n_chars"] // 100
        g = stored.groupby("bin", sort=True, as_index=False).agg(
            n=("docid", "count"))
        return pa.table({"bin": pa.array(g["bin"], type=pa.int64()),
                         "n": pa.array(g["n"], type=pa.int64())})

    def knn_ivf_top10(sf_dir):
        """Rows-only: IVF-bucketed approximate ANN (the scale path)."""
        import pyarrow.parquet as pq
        import ray.data

        from whoosh_ray.pipelines.knn import knn_ivf

        emb_path = os.path.join(sf_dir, "embeddings.parquet")
        head = pq.read_table(emb_path).slice(0, 5)
        # persistent bucket-partitioned index: queries read only the
        # probed ivf_bucket=N/ partitions (I/O-pruned scale path)
        ivf_dir = os.path.join(
            "/tmp/whoosh_ray_cache",
            "ivf-" + sf_dir.strip("/").replace("/", "_"))
        out = knn_ivf(ray.data.read_parquet(emb_path),
                      head["vec_id"].to_numpy(),
                      np.array(head["embedding"].to_pylist(),
                               dtype=np.float64), k=10,
                      index_dir=ivf_dir)
        return pa.table({
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
        })

    def multimodal_features(sf_dir):
        """Rows-only: binary-payload actor-pool feature extraction.
        Decode is REAL pure-numpy for WAV/PPM/BMP/PNG/JPEG payloads
        (functions/media.py, functions/jpeg.py); only MP4/video remains
        an explicit stub."""
        import ray.data

        from whoosh_ray.pipelines.multimodal import (extract_image_features,
                                                     synthesize_media)

        ds = ray.data.from_arrow(synthesize_media(256))
        return extract_image_features(ds, concurrency=2, batch_size=64)

    def multimodal_frames(sf_dir):
        """Rows-only: video frame sampling — REAL y4m decode in an
        actor pool, 1 video row fans out to <=4 PNG-encoded frame rows
        (pipelines/multimodal.py FrameSample)."""
        import ray.data

        from whoosh_ray.pipelines.multimodal import (sample_frames,
                                                     synthesize_video)

        ds = ray.data.from_arrow(synthesize_video(96))
        out = sample_frames(ds, max_frames=4, concurrency=2, batch_size=16)

        def meta(batch):
            import hashlib

            pay = batch["payload"]
            return pa.table({
                "item_id": batch["item_id"],
                "frame_idx": batch["frame_idx"],
                "png_bytes": pa.array(
                    [len(pay[i].as_py()) for i in range(batch.num_rows)],
                    type=pa.int64()),
                "png_sha": pa.array(
                    [hashlib.sha256(pay[i].as_py()).hexdigest()[:16]
                     for i in range(batch.num_rows)]),
            })

        # frame payload BYTES stay distributed; only deterministic
        # metadata (len + digest) reaches the driver
        return out.map_batches(meta, batch_format="pyarrow")

    def ir_bm25_filtered(sf_dir):
        """BM25 with filter= and mask= as ROARING id sets (the
        functions/idsets.py broadcastable representation, hash-checked
        end-to-end): 'spark' hits restricted to lang='en' docs minus
        source in {src0,src1,src2}."""
        import pyarrow.compute as pc

        from whoosh_ray.functions.idsets import RoaringIdSet
        from whoosh_ray.search.query import ColumnQuery

        s = _searcher(sf_dir)
        allow = RoaringIdSet(s.search(
            ColumnQuery("lang", lambda c: pc.equal(c, "en")),
            limit=None).docids)
        deny = RoaringIdSet(s.search(
            ColumnQuery("source",
                        lambda c: pc.is_in(c, value_set=pa.array(
                            ["src0", "src1", "src2"]))),
            limit=None).docids)
        return ir.topk_table_filtered(s, Term("text", "spark"),
                                      filter=allow, mask=deny)

    def ir_suggest(sf_dir):
        """Spelling suggestions, hash-checked: the DuckDB oracle
        reproduces the lexicon (StandardAnalyzer tok CTE), plain
        levenshtein(maxdist=2) acceptance, and the selection boundary
        (nlargest picks freq DESC, term DESC) — the limit-3 probes
        have 4-5 candidates so frequency ranking decides the cut."""
        s = _searcher(sf_dir)
        rows = []
        for w, lim in [("sprak", 5), ("tabel", 5), ("windwo", 5),
                       ("mrege", 5), ("sat", 3), ("bat", 3),
                       ("dat", 3), ("art", 3)]:
            for sug in s.suggest("text", w, limit=lim):
                rows.append({"word": w, "suggestion": sug})
        return pa.Table.from_pylist(rows)

    def ir_highlights(sf_dir):
        """Highlighted snippets for the top-10 'spark' hits, hash-checked:
        the DuckDB oracle replays the ContextFragmenter state machine as a
        recursive CTE and formats with HtmlFormatter(tagname='b') string
        templates (string-identical to the reference per pytest too)."""
        from whoosh_ray.search import Term
        from whoosh_ray.search.highlight import highlight_batch

        s = _searcher(sf_dir)
        r = s.search(Term("text", "spark"), limit=10)
        stored = s.stored(r.docids, columns=["text"])
        hls = highlight_batch(stored["text"].to_pylist(), {"spark"})
        return pa.table({
            "docid": pa.array(r.docids, type=pa.int64()),
            "snippet": pa.array(hls, type=pa.string()),
        })

    def transcripts_queryset(sf_dir):
        """Rows-only: the flagship transcript pipeline (entry()) — its
        rank/score parity with the reference is pinned by pytest.  The
        SQL-expressible members are hash-checked separately by
        transcripts_bm25_rank."""
        return entry()

    def transcripts_bm25_rank(sf_dir):
        """Flagship-queryset SQL-expressible members (term/and/or/phrase/
        role), hash-checked end-to-end over the TRANSCRIPTS schema: the
        deterministic corpus is written to /tmp/whoosh_ray_qsoracle/src
        here, and the DuckDB oracle reads the same parquet, reproducing
        the docid dense-rank over (conv_id, turn_idx) and per-field BM25
        (text TEXT field + role ID field with its own lengths/df)."""
        import shutil

        from whoosh_ray.pipelines.build import build_index
        from whoosh_ray.pipelines.ir import topk_table
        from whoosh_ray.search import And, Or, Phrase, Searcher, Term
        from whoosh_ray.sources.transcripts import write_transcripts
        from whoosh_ray.state.schema import transcripts_schema

        work = "/tmp/whoosh_ray_qsoracle"
        shutil.rmtree(work, ignore_errors=True)
        src = write_transcripts(os.path.join(work, "src"), n_convs=120)
        manifest = build_index(src, os.path.join(work, "ix"),
                               transcripts_schema(), seg_size=256)
        s = Searcher(os.path.join(work, "ix"), manifest)
        queryset = {
            "term": Term("text", "deploy"),
            "and": And([Term("text", "deploy"), Term("text", "render")]),
            "or": Or([Term("text", "cluster"), Term("text", "error")]),
            "phrase": Phrase("text", ["deploy", "render"]),
            "role": And([Term("text", "deploy"), Term("role", "user")]),
        }
        parts = []
        for name, q in queryset.items():
            t = topk_table(s, q, limit=10)
            parts.append(t.append_column(
                "query", pa.array([name] * t.num_rows, type=pa.string())))
        return pa.concat_tables(parts)

    def transcripts_ops_rank(sf_dir):
        """Binary/expansion operator members of the flagship queryset,
        hash-checked over the TRANSCRIPTS schema: AndNot (incl. the
        reference's first-doc-escape quirk, encoded in the SQL oracle),
        Require (semi-join, a's scores), AndMaybe (left-outer add),
        Prefix >=3-word expansion (constantscore literal 1.0), and a
        slop=2 Phrase.  Own corpus dir so the flagship entry's corpus
        is untouched."""
        import shutil

        from whoosh_ray.pipelines.build import build_index
        from whoosh_ray.pipelines.ir import topk_table
        from whoosh_ray.search import (AndMaybe, AndNot, Phrase, Prefix,
                                       Require, Searcher, Term)
        from whoosh_ray.sources.transcripts import write_transcripts
        from whoosh_ray.state.schema import transcripts_schema

        work = "/tmp/whoosh_ray_qsops"
        shutil.rmtree(work, ignore_errors=True)
        src = write_transcripts(os.path.join(work, "src"), n_convs=120)
        manifest = build_index(src, os.path.join(work, "ix"),
                               transcripts_schema(), seg_size=256)
        s = Searcher(os.path.join(work, "ix"), manifest)
        queryset = {
            "andnot": AndNot(Term("text", "deploy"),
                             Term("text", "render")),
            "require": Require(Term("text", "deploy"),
                               Term("text", "render")),
            "andmaybe": AndMaybe(Term("text", "deploy"),
                                 Term("text", "render")),
            "prefix": Prefix("text", "pa"),
            "slop": Phrase("text", ["deploy", "render"], slop=2),
        }
        parts = []
        for name, q in queryset.items():
            t = topk_table(s, q, limit=10)
            parts.append(t.append_column(
                "query", pa.array([name] * t.num_rows, type=pa.string())))
        return pa.concat_tables(parts)

    def transcripts_parsed_rank(sf_dir):
        """Drop-in parser constructors under the hash gate: queries are
        parsed from STRINGS by SimpleParser (the +/- end-user grammar),
        QueryParser(group=("or", 0.9)) (coordination-scaled OrGroup),
        and DisMaxParser, then ranked top-10 over the transcripts
        schema.  The SQL oracle reproduces the parse results' scoring
        exactly, including the SQR coordination formula and the
        reference's DJM cursor-leak (a doc scores the max over every
        leaf of the leaf's score at its first docid >= doc)."""
        import shutil

        from whoosh_ray.pipelines.build import build_index
        from whoosh_ray.pipelines.ir import topk_table
        from whoosh_ray.search import Searcher
        from whoosh_ray.search.qparser import (DisMaxParser, QueryParser,
                                               SimpleParser)
        from whoosh_ray.sources.transcripts import write_transcripts
        from whoosh_ray.state.schema import transcripts_schema

        work = "/tmp/whoosh_ray_qsparsed"
        shutil.rmtree(work, ignore_errors=True)
        src = write_transcripts(os.path.join(work, "src"), n_convs=120)
        manifest = build_index(src, os.path.join(work, "ix"),
                               transcripts_schema(), seg_size=256)
        s = Searcher(os.path.join(work, "ix"), manifest)
        schema = transcripts_schema()
        sp = SimpleParser("text", schema)
        op = QueryParser("text", schema, group=("or", 0.9))
        dp = DisMaxParser({"text": 1.0, "tool": 1.0}, schema)
        queryset = {
            "simple_or": sp.parse("deploy render"),
            "simple_pm": sp.parse("+deploy render -cluster"),
            "orgroup_scale": op.parse("deploy render error"),
            "dismax": dp.parse("bash"),
        }
        parts = []
        for name, q in queryset.items():
            t = topk_table(s, q, limit=10)
            parts.append(t.append_column(
                "query", pa.array([name] * t.num_rows, type=pa.string())))
        return pa.concat_tables(parts)

    def transcripts_bm25_rank_packed(sf_dir):
        """transcripts_bm25_rank over COMPOUND-packed segments (one
        segment.cmpd per partition, state/compound.py): same corpus
        written to its own dir, index packed via pack_index before any
        query — the hash gate proves packing changes no score bit."""
        import shutil

        from whoosh_ray.pipelines.build import build_index
        from whoosh_ray.pipelines.ir import topk_table
        from whoosh_ray.search import And, Or, Phrase, Searcher, Term
        from whoosh_ray.sources.transcripts import write_transcripts
        from whoosh_ray.state.compound import pack_index
        from whoosh_ray.state.schema import transcripts_schema

        work = "/tmp/whoosh_ray_qsoracle_packed"
        shutil.rmtree(work, ignore_errors=True)
        src = write_transcripts(os.path.join(work, "src"), n_convs=120)
        ix = os.path.join(work, "ix")
        build_index(src, ix, transcripts_schema(), seg_size=256)
        pack_index(ix)
        s = Searcher(ix)
        queryset = {
            "term": Term("text", "deploy"),
            "and": And([Term("text", "deploy"), Term("text", "render")]),
            "or": Or([Term("text", "cluster"), Term("text", "error")]),
            "phrase": Phrase("text", ["deploy", "render"]),
            "role": And([Term("text", "deploy"), Term("role", "user")]),
        }
        parts = []
        for name, q in queryset.items():
            t = topk_table(s, q, limit=10)
            parts.append(t.append_column(
                "query", pa.array([name] * t.num_rows, type=pa.string())))
        return pa.concat_tables(parts)

    return {
        "ir_term_stats": ir_term_stats,
        "ir_bm25_spark": ir_bm25_spark,
        "ir_bm25_window": ir_bm25_window,
        "ir_bm25_and": ir_bm25_and,
        "ir_bm25_or": ir_bm25_or,
        "ir_phrase": ir_phrase,
        "ir_prefix": ir_prefix,
        "ir_facet_source": ir_facet_source,
        "ir_facet_query": ir_facet_query,
        "ir_numeric_range": ir_numeric_range,
        "ir_keyword_bool": ir_keyword_bool,
        "ir_date_range": ir_date_range,
        "ir_sorted_nchars": ir_sorted_nchars,
        "ir_collapse_lang": ir_collapse_lang,
        "ir_collapse_top": ir_collapse_top,
        "dedup_exact": dedup_exact_q,
        "dedup_jaccard_pairs": dedup_jaccard_pairs,
        "dedup_minhash_pairs": dedup_minhash_pairs,
        "dedup_embed_pairs": dedup_embed_pairs,
        "embed_lsh_exhaustive": embed_lsh_exhaustive,
        "knn_top10": knn_top10,
        "knn_ivf_exhaustive": knn_ivf_exhaustive,
        "text_token_stats": text_token_stats,
        "text_fingerprints": text_fingerprints,
        "text_langid": text_langid,
        "text_simhash": text_simhash,
        "events_sessionize": events_sessionize,
        "events_windows": events_windows,
        "ir_range_facet": ir_range_facet,
        "knn_ivf_top10": knn_ivf_top10,
        "multimodal_features": multimodal_features,
        "multimodal_frames": multimodal_frames,
        "ir_suggest": ir_suggest,
        "ir_bm25_filtered": ir_bm25_filtered,
        "ir_highlights": ir_highlights,
        "transcripts_queryset": transcripts_queryset,
        "transcripts_bm25_rank": transcripts_bm25_rank,
        "transcripts_ops_rank": transcripts_ops_rank,
        "transcripts_parsed_rank": transcripts_parsed_rank,
        "transcripts_bm25_rank_packed": transcripts_bm25_rank_packed,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ir_bm25_filtered": rf"""
WITH {_base_ctes()},
scored AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  JOIN documents d ON d.doc_id = p.doc_id
  WHERE p.term = 'spark' AND ts.term = 'spark'
    AND d.lang = 'en' AND d.source NOT IN ('src0', 'src1', 'src2')
)
SELECT (row_number() OVER (ORDER BY score DESC, docid) - 1) AS rank,
       docid, score
FROM scored ORDER BY score DESC, docid LIMIT 10
""",
        "ir_suggest": rf"""
WITH {_base_ctes()},
freqs AS (SELECT term, sum(tf) AS freq FROM postings GROUP BY term),
q(word, lim) AS (
  SELECT * FROM (VALUES ('sprak', 5), ('tabel', 5), ('windwo', 5),
                        ('mrege', 5), ('sat', 3), ('bat', 3),
                        ('dat', 3), ('art', 3)) v(word, lim)
),
cand AS (
  SELECT q.word, q.lim, f.term, f.freq FROM q, freqs f
  WHERE levenshtein(q.word, f.term) <= 2
),
sel AS (
  SELECT word, lim, term, row_number() OVER (
    PARTITION BY word ORDER BY freq DESC, term DESC) AS rn
  FROM cand
)
SELECT word, term AS suggestion FROM sel WHERE rn <= lim
ORDER BY word, suggestion
""",
        # ContextFragmenter + HtmlFormatter(tagname='b'), string-identical:
        # the fragmenter's sequential scan (whoosh highlight.py:418-505 —
        # countdown/surround state, "firsts" deque, maxchars guard) runs as
        # a recursive CTE over space-split tokens (this corpus is strictly
        # lowercase words + single spaces, so \w+ tokenization == split and
        # startchar is a running length sum); top-3 fragments by
        # (score DESC, startchar DESC) = nlargest over (score, Fragment)
        # with Fragment.__lt__ on startchar, joined with '...'.
        "ir_highlights": rf"""
WITH RECURSIVE {_base_ctes()},
scored AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'spark' AND ts.term = 'spark'
),
top10 AS (
  SELECT docid FROM scored ORDER BY score DESC, docid LIMIT 10
),
words0 AS (
  SELECT d.doc_id, unnest(string_split(d.text, ' ')) AS w,
         generate_subscripts(string_split(d.text, ' '), 1) AS i
  FROM documents d JOIN top10 ON top10.docid = d.doc_id
),
words AS (
  SELECT doc_id, w, (i - 1)::INT AS idx,
         (sum(length(w) + 1) OVER (PARTITION BY doc_id ORDER BY i
            ROWS UNBOUNDED PRECEDING) - length(w) - 1)::INT AS s
  FROM words0
),
toks AS (
  SELECT doc_id, idx, s, (s + length(w))::INT AS e, length(w)::INT AS len,
         (w = 'spark') AS m
  FROM words
),
ntok AS (SELECT doc_id, max(idx) AS last_idx FROM toks GROUP BY doc_id),
wind AS (
  -- the fragmenter's "firsts" deque: candidate fragment-start chars at
  -- token i = startchars of tokens j<i with s_j >= e_(i-1) - surround
  SELECT t1.doc_id, t1.idx, list(t2.s ORDER BY t2.s) AS cand
  FROM toks t1
  JOIN toks t0 ON t0.doc_id = t1.doc_id AND t0.idx = t1.idx - 1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.idx < t1.idx
              AND t2.s >= t0.e - 20
  GROUP BY t1.doc_id, t1.idx
),
walk AS (
  SELECT doc_id, -1 AS idx, -1 AS cd, 0 AS cl,
         NULL::INT AS f, -1 AS lei, -1 AS s_lei, false AS ht,
         false AS tk_added, false AS emit,
         NULL::INT AS frag_s, NULL::INT AS frag_e,
         NULL::INT AS tok_s, NULL::INT AS tok_e
  FROM ntok
  UNION ALL
  SELECT doc_id, idx,
         cd2 AS cd,
         CASE WHEN emit THEN 0 ELSE cl1 END AS cl,
         CASE WHEN emit THEN NULL ELSE f1 END AS f,
         CASE WHEN emit THEN idx ELSE lei END AS lei,
         CASE WHEN emit THEN s ELSE s_lei END AS s_lei,
         CASE WHEN emit THEN false ELSE (ht OR b3) END AS ht,
         b3 AS tk_added, emit,
         CASE WHEN emit THEN f1 ELSE NULL END AS frag_s,
         CASE WHEN emit THEN e ELSE NULL END AS frag_e,
         s AS tok_s, e AS tok_e
  FROM (
    SELECT q.*,
           CASE WHEN consume THEN cl + len ELSE cl END AS cl1,
           (consume AND cd1 - (CASE WHEN consume THEN len ELSE 0 END) <= 0)
             AS emit,
           cd1 - (CASE WHEN consume THEN len ELSE 0 END) AS cd2
    FROM (
      SELECT p.*, (cd1 >= 0) AS consume
      FROM (
        SELECT b.*,
          CASE WHEN b3 AND f IS NULL THEN coalesce(fcand, s) ELSE f END AS f1,
          CASE WHEN b2 THEN 0
               WHEN b3 THEN (CASE WHEN f IS NULL AND fcand IS NULL
                             THEN 40 ELSE 20 END)
               ELSE cd END AS cd1
        FROM (
          SELECT w.doc_id, t.idx, t.s, t.e, t.len, t.m,
                 w.cd, w.cl, w.f, w.lei, w.s_lei, w.ht,
                 (w.cd < 0 AND NOT t.m) AS b1,
                 (NOT (w.cd < 0 AND NOT t.m) AND w.cl + t.len > 200) AS b2,
                 (NOT (w.cd < 0 AND NOT t.m)
                  AND NOT (w.cl + t.len > 200) AND t.m) AS b3,
                 list_min(list_filter(coalesce(wd.cand, []),
                                      x -> x > w.s_lei)) AS fcand
          FROM walk w
          JOIN toks t ON t.doc_id = w.doc_id AND t.idx = w.idx + 1
          LEFT JOIN wind wd ON wd.doc_id = t.doc_id AND wd.idx = t.idx
        ) b
      ) p
    ) q
  )
),
frags AS (
  SELECT doc_id, idx AS fe_idx, frag_s, frag_e FROM walk WHERE emit
  UNION ALL
  SELECT w.doc_id, w.idx, w.f, w.tok_e
  FROM walk w JOIN ntok n ON n.doc_id = w.doc_id AND w.idx = n.last_idx
  WHERE w.ht
),
frags2 AS (
  SELECT *, lag(fe_idx, 1, -1) OVER (PARTITION BY doc_id ORDER BY fe_idx)
           AS prev_idx
  FROM frags
),
fmatch AS (
  SELECT f.doc_id, f.fe_idx, f.frag_s, f.frag_e, w.tok_s, w.tok_e
  FROM frags2 f
  JOIN walk w ON w.doc_id = f.doc_id AND w.tk_added
             AND w.idx > f.prev_idx AND w.idx <= f.fe_idx
),
fparts AS (
  SELECT *, lag(tok_e, 1, frag_s) OVER (
             PARTITION BY doc_id, fe_idx ORDER BY tok_s) AS prev_e
  FROM fmatch
),
fhtml AS (
  SELECT p.doc_id, p.fe_idx, any_value(p.frag_s) AS frag_s,
         count(*)::BIGINT AS nmatch,
         string_agg(substring(d.text, p.prev_e + 1, p.tok_s - p.prev_e)
                    || '<b class="match term0">'
                    || substring(d.text, p.tok_s + 1, p.tok_e - p.tok_s)
                    || '</b>', '' ORDER BY p.tok_s)
         || substring(any_value(d.text), max(p.tok_e) + 1,
                      any_value(p.frag_e) - max(p.tok_e)) AS html
  FROM fparts p JOIN documents d ON d.doc_id = p.doc_id
  GROUP BY p.doc_id, p.fe_idx
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY nmatch DESC, frag_s DESC) AS rn
  FROM fhtml
)
SELECT t.docid,
       (SELECT string_agg(b.html, '...' ORDER BY b.frag_s)
        FROM best b WHERE b.doc_id = t.docid AND b.rn <= 3) AS snippet
FROM top10 t
""",
        "transcripts_bm25_rank": _transcripts_queryset_sql(),
        "transcripts_ops_rank": _transcripts_ops_sql(),
        "transcripts_parsed_rank": _transcripts_parsed_sql(),
        "transcripts_bm25_rank_packed": _transcripts_queryset_sql(
            "/tmp/whoosh_ray_qsoracle_packed/src"),
        "text_fingerprints": _fingerprints_sql(),
        "text_simhash": _simhash_sql(),
        "dedup_minhash_pairs": _minhash_pairs_sql(),
        "ir_term_stats": rf"""
WITH {_base_ctes()}
SELECT p.term AS term, count(*)::BIGINT AS df, sum(p.tf)::BIGINT AS total_tf
FROM postings p GROUP BY p.term
""",
        "ir_bm25_spark": _bm25_single_sql("spark"),
        "ir_bm25_window": _bm25_single_sql("window"),
        "ir_bm25_and": _bm25_pair_sql("spark", "hash", "and"),
        "ir_bm25_or": _bm25_pair_sql("spark", "hash", "or"),
        "ir_phrase": _phrase_sql("table", "hash"),
        "ir_prefix": rf"""
WITH {_base_ctes()}
SELECT DISTINCT p.doc_id AS docid FROM postings p
WHERE p.term LIKE 's%' ORDER BY docid
""",
        "ir_facet_source": rf"""
WITH {_base_ctes()}
SELECT d.source AS source, count(*)::BIGINT AS n
FROM documents d WHERE d.doc_id IN
  (SELECT doc_id FROM postings WHERE term = 'spark')
GROUP BY d.source ORDER BY d.source
""",
        "ir_numeric_range": rf"""
WITH {_base_ctes()}
SELECT d.doc_id AS docid FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM postings WHERE term = 'table')
  AND d.n_chars >= 120 AND d.n_chars < 480
ORDER BY docid
""",
        "ir_keyword_bool": """
SELECT doc_id AS docid FROM documents
WHERE lower(lang) = 'en' AND n_chars >= 300 AND source <> 'src0'
ORDER BY docid
""",
        "ir_date_range": """
SELECT event_id FROM events
WHERE event_type = 'purchase'
  AND ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-10'
ORDER BY event_id
""",
        "ir_facet_query": rf"""
WITH {_base_ctes()}
SELECT grp, count(*)::BIGINT AS n FROM (
  SELECT CASE
    WHEN d.doc_id IN (SELECT doc_id FROM postings WHERE term = 'spark')
      THEN 'has_spark'
    WHEN d.doc_id IN (SELECT doc_id FROM postings WHERE term = 'hash')
      THEN 'has_hash'
    ELSE 'misc' END AS grp
  FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM postings WHERE term = 'table'))
GROUP BY grp ORDER BY grp
""",
        "ir_sorted_nchars": rf"""
WITH {_base_ctes()}
SELECT d.doc_id AS docid, d.n_chars AS n_chars
FROM documents d WHERE d.doc_id IN
  (SELECT doc_id FROM postings WHERE term = 'spark')
ORDER BY d.n_chars DESC, d.doc_id LIMIT 20
""",
        "ir_collapse_lang": rf"""
WITH {_base_ctes()},
scored AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'spark' AND ts.term = 'spark'
)
SELECT lang, docid, score FROM (
  SELECT d.lang AS lang, s.docid AS docid, s.score AS score,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY s.score DESC, s.docid) AS rn
  FROM scored s JOIN documents d ON d.doc_id = s.docid)
WHERE rn = 1 ORDER BY lang
""",
        "ir_collapse_top": rf"""
WITH {_base_ctes()},
scored AS (
  SELECT p.doc_id AS docid, {_BM25_EXPR} AS score
  FROM postings p JOIN lens USING (doc_id), stats, ts
  WHERE p.term = 'spark' AND ts.term = 'spark'
)
SELECT lang, docid, n_chars, score FROM (
  SELECT d.lang AS lang, s.docid AS docid, d.n_chars AS n_chars,
         s.score AS score,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY d.n_chars, s.docid) AS rn
  FROM scored s JOIN documents d ON d.doc_id = s.docid)
WHERE rn <= 2 ORDER BY lang, n_chars, docid
""",
        "dedup_exact": """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id
""",
        "dedup_jaccard_pairs": rf"""
WITH tok AS (
  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '\w+(\.?\w+)*'),
    t -> length(t) >= 2 AND t NOT IN ({_STOPS_SQL})) AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN
      list_distinct(list_transform(range(1, len(toks) - 1),
        i -> concat_ws(' ', list_extract(toks, i), list_extract(toks, i + 1),
                       list_extract(toks, i + 2))))
    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
    ELSE []::VARCHAR[] END AS shingles
  FROM tok
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  len(list_intersect(a.shingles, b.shingles))::DOUBLE /
  len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_distinct(list_concat(a.shingles, b.shingles))) > 0
  AND len(list_intersect(a.shingles, b.shingles))::DOUBLE /
      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
ORDER BY doc_a, doc_b
""",
        "dedup_embed_pairs": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                               b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= 0.4::DOUBLE
ORDER BY id_a, id_b
""",
        "embed_lsh_exhaustive": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                               b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= 0.4::DOUBLE
ORDER BY id_a, id_b
""",
        "knn_top10": """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
  FROM q, embeddings e WHERE e.vec_id != q.vec_id
)
SELECT query_id, neighbor_id,
  (row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) - 1) AS rank
FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) <= 10
ORDER BY query_id, rank
""",
        "knn_ivf_exhaustive": """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
    list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cosine
  FROM q, embeddings e WHERE e.vec_id != q.vec_id
)
SELECT query_id, neighbor_id,
  (row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) - 1) AS rank
FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) <= 10
ORDER BY query_id, rank
""",
        "events_sessionize": """
WITH d AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
      AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
    (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session
  FROM d
)
SELECT user_id, session, count(*)::BIGINT AS n_events,
       epoch_us(min(ts))::BIGINT AS start_us,
       epoch_us(max(ts))::BIGINT AS end_us
FROM s GROUP BY user_id, session ORDER BY user_id, session
""",
        "events_windows": """
SELECT (epoch_us(ts) // 3600000000)::BIGINT AS window,
       count(*)::BIGINT AS n
FROM events GROUP BY 1 ORDER BY 1
""",
        "ir_range_facet": rf"""
WITH {_base_ctes()}
SELECT (d.n_chars // 100)::BIGINT AS bin, count(*)::BIGINT AS n
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM postings WHERE term = 'spark')
GROUP BY 1 ORDER BY 1
""",
        "text_token_stats": rf"""
WITH tokall AS (
  SELECT doc_id,
    regexp_extract_all(lower(text), '\w+(\.?\w+)*') AS toks_all,
    list_filter(regexp_extract_all(lower(text), '\w+(\.?\w+)*'),
      t -> length(t) >= 2 AND t NOT IN ({_STOPS_SQL})) AS toks
  FROM documents
)
SELECT d.lang AS lang,
  sum(len(t.toks))::BIGINT AS total_tokens,
  sum(len(t.toks_all))::BIGINT AS total_tokens_all,
  sum(len(list_filter(t.toks_all, x -> x IN ({_STOPS_SQL}))))::BIGINT
    AS total_stopwords
FROM documents d JOIN tokall t USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
""",
        "text_langid": rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+(\.?\w+)*')) AS term
  FROM documents
),
dterms AS (SELECT DISTINCT doc_id, term FROM toks),
markers(lang, term, pri) AS (VALUES {_langid_markers_sql()}),
cnt AS (
  SELECT doc_id, lang, pri, count(*) AS c
  FROM dterms JOIN markers USING (term) GROUP BY doc_id, lang, pri
),
best AS (
  SELECT doc_id, lang,
    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, pri) AS rn
  FROM cnt
)
SELECT t.doc_id, coalesce(b.lang, 'und') AS lang_pred
FROM documents t
LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
ORDER BY t.doc_id
""",
    }
