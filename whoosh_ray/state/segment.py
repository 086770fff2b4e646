"""Immutable segment: terms table + docs table under one directory.

Reference analogue: the W3 segment — terms file, postings file, per-doc
columns, assembled per commit (/root/reference/src/whoosh/codec/whoosh3.py:70-141,
W3Segment :1254-1296).  Here a segment covers one contiguous docid range
(the build partition) and is two Parquet files plus a lineage entry:

- ``terms.parquet`` — one row per (field, term), sorted by (field, term):
  TermInfo stats (df, total_weight, max_weight, min/max length-byte,
  min/max docid — reading.py:62-137) + the posting blob (codec.py) +
  optional positions blob.  Parquet row-group statistics on the sorted
  ``term`` column give block-range pruning for term lookups and prefix
  scans without loading the blobs.
- ``docs.parquet`` — one row per document, sorted by docid: stored fields
  (the reference's stored-field column, whoosh3.py:156-277).
- ``meta.json`` — lineage + metrics (manifest.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from whoosh_ray.state import codec
from whoosh_ray.state import compound as cf
from whoosh_ray.state.manifest import SegmentMeta, seg_dirname
from whoosh_ray.state.schema import IndexSchema

TERM_STAT_COLS = [
    "field", "term", "df", "sum_tf", "total_weight", "max_weight",
    "min_length", "max_length", "min_docid", "max_docid",
]

# blob locator columns (blobs.bin format): byte offset + length of each
# term's postings / positions blobs in the segment's blobs.bin sidecar
BLOB_LOC_COLS = ["post_off", "post_len", "pos_off", "pos_len",
                 "chars_off", "chars_len", "boosts_off", "boosts_len"]

# binary payload columns, in blobs.bin section order
BLOB_COLS = ("postings", "positions", "chars", "boosts")

TERMS_ARROW_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("sum_tf", pa.int64()),
        ("total_weight", pa.float64()),
        ("max_weight", pa.float32()),
        ("min_length", pa.uint8()),
        ("max_length", pa.uint8()),
        ("min_docid", pa.int64()),
        ("max_docid", pa.int64()),
        ("postings", pa.large_binary()),
        ("positions", pa.large_binary()),
        ("chars", pa.large_binary()),
        ("boosts", pa.large_binary()),
    ]
)


# process-level cache of multi-file pyarrow datasets over an index's
# terms.parquet files: segments are immutable, so the parsed parquet
# footers (cached inside the dataset's fragments after first use) are
# shared by every Searcher in the process — one batched, threaded,
# row-group-pruned read replaces per-segment sequential opens on
# many-segment cold queries (VERDICT r2 #1)
_TERMS_DATASET_CACHE: dict = {}


def terms_dataset(readers: "list[SegmentReader]"):
    """Cached pyarrow dataset over the given segments' terms files.
    Packed segments are addressed through the compound filesystem, so a
    mixed packed/unpacked index still gets ONE multi-file dataset."""
    import pyarrow.dataset as pads

    key = tuple(r._terms_key() for r in readers)
    ds = _TERMS_DATASET_CACHE.get(key)
    if ds is None:
        if len(_TERMS_DATASET_CACHE) > 64:
            _TERMS_DATASET_CACHE.clear()
        paths = [r.terms_ds_path() for r in readers]
        fs = (cf.CompoundFileSystem()
              if any(r._compound is not None for r in readers) else None)
        ds = pads.dataset(paths, format="parquet", filesystem=fs)
        _TERMS_DATASET_CACHE[key] = ds
    return ds


class SegmentReader:
    """Reads one segment's terms/postings/stored docs.

    Cheap to construct; loads the stats columns (no blobs) lazily and keeps
    them cached — this is the per-actor state of query actor pools.
    """

    def __init__(self, index_dir: str, meta: SegmentMeta, schema: IndexSchema,
                 fallback_dir: str | None = None):
        self.meta = meta
        self.schema = schema
        self.dir = os.path.join(index_dir, "segments", seg_dirname(meta.seg_id))
        # union-mount resolution (reference OverlayStorage,
        # filedb/filestore.py:313-375: read from A unless the file exists
        # in B, writes go to B): each per-segment file resolves to the
        # overlay dir when present there, else to the base index dir
        if fallback_dir is not None:
            fb = os.path.join(fallback_dir, "segments",
                              seg_dirname(meta.seg_id))

            def _resolve(name: str) -> str:
                p = os.path.join(self.dir, name)
                if os.path.exists(p):
                    return p
                q = os.path.join(fb, name)
                return q if os.path.exists(q) else p
        else:
            def _resolve(name: str) -> str:
                return os.path.join(self.dir, name)
        self._deletes_path = _resolve("deletes.json")
        self._terms_path = _resolve("terms.parquet")
        self._docs_path = _resolve("docs.parquet")
        self._blobs_path = _resolve("blobs.bin")
        self._cmpd_path = _resolve(cf.COMPOUND_NAME)
        self._toc: dict | None | bool = False  # False = not probed yet
        self._has_bin: bool | None = None
        self._bin_fd: int | None = None
        self._stats: pa.Table | None = None
        self._blob_cache: dict[tuple[str, str], tuple[bytes, bytes | None]] = {}
        self._deletes: np.ndarray | None = None  # sorted tombstoned docids

    @property
    def _compound(self) -> dict | None:
        """The compound file's TOC when this segment is packed
        (state/compound.py), else None."""
        if self._toc is False:
            self._toc = (cf.read_toc(self._cmpd_path)
                         if os.path.exists(self._cmpd_path) else None)
        return self._toc

    def _terms_key(self) -> tuple:
        """Immutability cache key for the terms sub-file (path + stat)."""
        if self._compound is not None:
            st = os.stat(self._cmpd_path)
            return (cf.subfile_path(self._cmpd_path, "terms.parquet"),
                    st.st_size, st.st_mtime_ns)
        st = os.stat(self._terms_path)
        return (self._terms_path, st.st_size, st.st_mtime_ns)

    def terms_ds_path(self) -> str:
        """Dataset-addressable path of the terms file (compound-aware)."""
        if self._compound is not None:
            return cf.subfile_path(self._cmpd_path, "terms.parquet")
        return self._terms_path

    def _terms_source(self):
        """A source ``pq.read_table``/``read_schema`` accepts: the plain
        path, or a zero-copy buffer slice of the compound mmap."""
        if self._compound is not None:
            return pa.BufferReader(
                cf.subfile_buffer(self._cmpd_path, "terms.parquet"))
        return self._terms_path

    def _docs_source(self):
        if self._compound is not None:
            return pa.BufferReader(
                cf.subfile_buffer(self._cmpd_path, "docs.parquet"))
        return self._docs_path

    @property
    def has_bin(self) -> bool:
        """True when this segment uses the point-readable blobs.bin
        format (False only for legacy inline-blob segments)."""
        if self._has_bin is None:
            self._has_bin = ("blobs.bin" in self._compound
                             if self._compound is not None
                             else os.path.exists(self._blobs_path))
        return self._has_bin

    def _pread(self, off: int, length: int) -> bytes:
        if self._bin_fd is None:
            if self._compound is not None:
                # exact point reads survive packing: same pread, at
                # base + off inside the compound file
                self._bin_base = self._compound["blobs.bin"][0]
                self._bin_fd = os.open(self._cmpd_path, os.O_RDONLY)
            else:
                self._bin_base = 0
                self._bin_fd = os.open(self._blobs_path, os.O_RDONLY)
        return os.pread(self._bin_fd, length, self._bin_base + off)

    def __del__(self):
        if self._bin_fd is not None:
            try:
                os.close(self._bin_fd)
            except OSError:
                pass

    @property
    def deletes(self) -> np.ndarray:
        """Per-segment tombstone set (reference: per-segment deleted docnum
        sets pickled with the segment, whoosh3.py:1284-1296).  Deleted docs
        are masked out of every posting/doc scan; term statistics stay
        unchanged until a merge rewrites the segment — exactly the
        reference's behavior."""
        if self._deletes is None:
            import json

            p = self._deletes_path
            if os.path.exists(p):
                with open(p) as f:
                    self._deletes = np.array(sorted(json.load(f)["docids"]),
                                             dtype=np.int64)
            else:
                self._deletes = np.empty(0, dtype=np.int64)
        return self._deletes

    def _mask_deleted(self, docids: np.ndarray) -> np.ndarray:
        d = self.deletes
        if len(d) == 0:
            return np.ones(len(docids), dtype=bool)
        return ~np.isin(docids, d, assume_unique=True)

    # ---- terms ----

    # process-level stats cache: segments are immutable (any rewrite is
    # an atomic replace that changes mtime/size), so fresh Searcher
    # instances in the same process share the loaded stats tables
    _STATS_CACHE: dict = {}

    @property
    def stats(self) -> pa.Table:
        if self._stats is None:
            key = self._terms_key()
            cached = SegmentReader._STATS_CACHE.get(key)
            if cached is None:
                cols = TERM_STAT_COLS
                if self.has_bin:
                    # older segments lack the boosts locator pair
                    names = pq.read_schema(self._terms_source()).names
                    cols = cols + [c for c in BLOB_LOC_COLS if c in names]
                cached = pq.read_table(self._terms_source(), columns=cols)
                if len(SegmentReader._STATS_CACHE) > 4096:
                    SegmentReader._STATS_CACHE.clear()
                SegmentReader._STATS_CACHE[key] = cached
            self._stats = cached
        return self._stats

    def term_info(self, field: str, term: str) -> dict | None:
        t = self.stats
        idx = self._find(field, term)
        if idx is None:
            return None
        return {c: t[c][idx].as_py() for c in TERM_STAT_COLS}

    def _key_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """Cached numpy views of the (field, term) key columns — the
        object-array conversion costs ~70 us per call otherwise and
        _find runs per (term x query)."""
        ka = getattr(self, "_keys_np", None)
        if ka is None:
            t = self.stats
            ka = (t["field"].to_numpy(zero_copy_only=False),
                  t["term"].to_numpy(zero_copy_only=False))
            self._keys_np = ka
        return ka

    def _find(self, field: str, term: str) -> int | None:
        """Binary search the (field, term)-sorted stats table."""
        fields, terms = self._key_arrays()
        lo = np.searchsorted(fields, field, side="left")
        hi = np.searchsorted(fields, field, side="right")
        if lo == hi:
            return None
        j = lo + np.searchsorted(terms[lo:hi], term, side="left")
        if j < hi and terms[j] == term:
            return int(j)
        return None

    def term_range(self, field: str, lo: str | None, hi: str | None,
                   *, include_lo: bool = True, include_hi: bool = False) -> list[str]:
        """Sorted terms of ``field`` in [lo, hi) (lexicon range scan).

        Reference analogue: OrderedHashReader range scans over the terms
        dictionary (filedb/filetables.py:440-570) used by Prefix/TermRange
        expansion (query/terms.py:274-288)."""
        fields, terms = self._key_arrays()
        flo = np.searchsorted(fields, field, side="left")
        fhi = np.searchsorted(fields, field, side="right")
        sub = terms[flo:fhi]
        a = 0 if lo is None else np.searchsorted(sub, lo, side="left" if include_lo else "right")
        b = len(sub) if hi is None else np.searchsorted(sub, hi, side="right" if include_hi else "left")
        return [str(x) for x in sub[a:b]]

    def expand_prefix(self, field: str, prefix: str) -> list[str]:
        return self.term_range(field, prefix, prefix + "￿", include_hi=True)

    def stats_slice(self, field: str, prefix: str = "") -> pa.Table:
        """Zero-copy slice of the term-stats table covering ``field``
        terms with ``prefix`` (sorted keys -> two binary searches)."""
        fields, terms = self._key_arrays()
        flo = int(np.searchsorted(fields, field, side="left"))
        fhi = int(np.searchsorted(fields, field, side="right"))
        sub = terms[flo:fhi]
        a = int(np.searchsorted(sub, prefix, side="left")) if prefix else 0
        b = (int(np.searchsorted(sub, prefix + "￿", side="right"))
             if prefix else len(sub))
        return self.stats.slice(flo + a, b - a)

    def all_terms(self, field: str) -> list[str]:
        return self.term_range(field, None, None)

    _MISS = ("", None)  # cached-miss sentinel

    def _blobs_at(self, idx: int) -> tuple[bytes, bytes | None]:
        """Point-read one term's blobs by stats row index (blobs.bin)."""
        t = self.stats
        post = self._pread(int(t["post_off"][idx].as_py()),
                           int(t["post_len"][idx].as_py()))
        zl = int(t["pos_len"][idx].as_py())
        pos = (self._pread(int(t["pos_off"][idx].as_py()), zl)
               if zl else b"")
        return (post, pos)

    def preload_blobs(self, by_field: dict[str, list[str]]) -> None:
        """Fetch ALL of a query's term blobs for this segment: exact
        (offset, len) preads on blobs.bin (one per present term — cold
        cost is O(terms hit), not O(segment size)); legacy inline
        segments fall back to ONE row-group-pruned filtered read per
        field.  Misses are cached too, so absent terms don't re-read."""
        for field, terms in by_field.items():
            todo = [t for t in dict.fromkeys(terms)
                    if (field, t) not in self._blob_cache]
            if not todo:
                continue
            if len(self._blob_cache) > max(256, 4 * len(todo)):
                self._blob_cache.clear()
            if self.has_bin:
                for term in todo:
                    idx = self._find(field, term)
                    self._blob_cache[(field, term)] = (
                        self._MISS if idx is None else self._blobs_at(idx))
                continue
            t = pq.read_table(
                self._terms_path,
                columns=["field", "term", "postings", "positions"],
                filters=[("field", "=", field), ("term", "in", todo)],
            )
            found = {}
            for i in range(t.num_rows):
                found[t["term"][i].as_py()] = (t["postings"][i].as_py(),
                                               t["positions"][i].as_py())
            for term in todo:
                self._blob_cache[(field, term)] = found.get(term, self._MISS)

    def _load_blobs(self, field: str, term: str) -> tuple[bytes, bytes | None] | None:
        key = (field, term)
        hit = self._blob_cache.get(key)
        if hit is not None:
            return None if hit is self._MISS else hit
        if len(self._blob_cache) > 256:
            self._blob_cache.clear()
        if self.has_bin:
            idx = self._find(field, term)
            out = self._MISS if idx is None else self._blobs_at(idx)
            self._blob_cache[key] = out
            return None if out is self._MISS else out
        # legacy inline format: row-group-pruned selective read
        t = pq.read_table(
            self._terms_path,
            columns=["field", "term", "postings", "positions"],
            filters=[("field", "=", field), ("term", "=", term)],
        )
        if t.num_rows == 0:
            self._blob_cache[key] = self._MISS
            return None
        out = (t["postings"][0].as_py(), t["positions"][0].as_py())
        self._blob_cache[key] = out
        return out

    def char_spans(self, field: str, term: str):
        """Per-posting character spans for a chars-format field
        (Characters payloads, reference formats.py:266-335): returns
        (docids, [(startchars, endchars) arrays]) aligned by posting,
        or None when absent.  Exact highlight offsets without
        re-tokenizing the stored text."""
        idx = self._find(field, term)
        if idx is None or not self.has_bin:
            return None
        t = self.stats
        if "chars_len" not in t.column_names:
            return None
        cl = int(t["chars_len"][idx].as_py())
        if cl == 0:
            return None
        blob = self._pread(int(t["chars_off"][idx].as_py()), cl)
        r = self.blob_reader(field, term)
        p = r.decode_all()
        return p.docids, codec.decode_chars(blob, p.tfs)

    def boost_payloads(self, field: str, term: str, with_chars: bool = False):
        """Per-occurrence boost payloads (PositionBoosts/CharacterBoosts
        decode surface, reference formats.py:339-481): returns
        (docids, positions, chars, boosts) where positions/boosts are
        lists of per-posting arrays aligned by posting, chars is a list
        of per-posting (sc, ec) pairs (or None unless requested/stored).
        None when the term is absent or no boost payloads are stored."""
        idx = self._find(field, term)
        if idx is None or not self.has_bin:
            return None
        t = self.stats
        if "boosts_len" not in t.column_names:
            return None
        bl = int(t["boosts_len"][idx].as_py())
        if bl == 0:
            return None
        blob = self._pread(int(t["boosts_off"][idx].as_py()), bl)
        blobs = self._load_blobs(field, term)
        p = codec.BlobReader(blobs[0]).decode_all()
        boosts = codec.decode_boosts(blob, p.tfs)
        poss = (codec.decode_positions(blobs[1], p.tfs)
                if blobs[1] else None)
        chars = None
        if with_chars:
            cs = self.char_spans(field, term)
            chars = cs[1] if cs is not None else None
        return p.docids, poss, chars, boosts

    def blob_reader(self, field: str, term: str) -> codec.BlobReader | None:
        blobs = self._load_blobs(field, term)
        if blobs is None:
            return None
        return codec.BlobReader(blobs[0])

    def postings(self, field: str, term: str) -> codec.Postings | None:
        cache = getattr(self, "_post_cache", None)
        if cache is None:
            cache = self._post_cache = {}
        hit = cache.get((field, term))
        if hit is not None:
            return None if hit is self._MISS else hit
        r = self.blob_reader(field, term)
        if r is None:
            out = None
        else:
            p = r.decode_all()
            out = p
            if len(self.deletes):
                keep = self._mask_deleted(p.docids)
                if not keep.all():
                    out = codec.Postings(
                        p.docids[keep], p.tfs[keep], p.len_bytes[keep],
                        p.weights[keep] if p.weights is not None else None)
        if len(cache) > 256:
            cache.clear()
        cache[(field, term)] = self._MISS if out is None else out
        return out

    def positions_flat(self, field: str, term: str):
        """(docids, flat positions, offsets) with deletes applied — the
        vectorized phrase path."""
        blobs = self._load_blobs(field, term)
        if blobs is None or blobs[1] is None or len(blobs[1]) == 0:
            return None
        p = codec.BlobReader(blobs[0]).decode_all()
        flat, offsets = codec.decode_positions_flat(blobs[1], p.tfs)
        if len(self.deletes):
            keep = self._mask_deleted(p.docids)
            if not keep.all():
                lens = np.diff(offsets)[keep]
                idx = np.flatnonzero(keep)
                new_off = np.concatenate(([0], np.cumsum(lens)))
                gather = np.concatenate([
                    np.arange(offsets[i], offsets[i + 1]) for i in idx
                ]) if len(idx) else np.empty(0, dtype=np.int64)
                return p.docids[keep], flat[gather], new_off
        return p.docids, flat, offsets

    def positions(self, field: str, term: str) -> list[np.ndarray] | None:
        blobs = self._load_blobs(field, term)
        if blobs is None or blobs[1] is None or len(blobs[1]) == 0:
            return None
        p = codec.BlobReader(blobs[0]).decode_all()
        out = codec.decode_positions(blobs[1], p.tfs)
        if len(self.deletes):
            keep = self._mask_deleted(p.docids)
            out = [o for o, k in zip(out, keep) if k]
        return out

    # ---- docs ----

    def all_docids(self) -> np.ndarray:
        t = pq.read_table(self._docs_source(), columns=["docid"])
        ids = t["docid"].to_numpy()
        if len(self.deletes):
            ids = ids[self._mask_deleted(ids)]
        return ids

    def stored(self, docids: np.ndarray,
               columns: list[str] | None = None) -> pa.Table:
        """Stored-field rows for the given (segment-resident) docids,
        returned in the order requested; ``columns`` prunes the read.
        Columns this segment predates (schema evolution via
        Index.add_field) come back null-typed — the cross-segment
        concat promotes them."""
        cols = None
        want_missing: list[str] = []
        if columns is not None:
            cols = list(dict.fromkeys(["docid"] + list(columns)))
            avail = self._docs_colnames()
            want_missing = [c for c in cols if c not in avail]
            cols = [c for c in cols if c in avail]
        t = pq.read_table(self._docs_source(), columns=cols)
        for c in want_missing:
            t = t.append_column(c, pa.nulls(t.num_rows))
        all_ids = t["docid"].to_numpy()
        idx = np.searchsorted(all_ids, docids)
        idx = np.clip(idx, 0, len(all_ids) - 1)
        ok = all_ids[idx] == docids
        return t.take(pa.array(idx[ok]))

    def docs_table(self, columns: list[str] | None = None) -> pa.Table:
        return pq.read_table(self._docs_source(), columns=columns)

    def _docs_colnames(self) -> frozenset:
        names = getattr(self, "_docs_names", None)
        if names is None:
            names = frozenset(pq.read_schema(self._docs_source()).names)
            self._docs_names = names
        return names


def write_terms_file(seg_dir: str, table: pa.Table) -> None:
    """Write the (field, term)-sorted terms table: stats + blob locators
    to ``terms.parquet`` (small row groups so parquet statistics give
    fine-grained term-range pruning) and the posting/position blob BYTES
    to a ``blobs.bin`` sidecar, point-readable by (offset, len) pread.

    Why not blobs inline in parquet: a cold point query must fetch a
    handful of terms' blobs per segment, but parquet can only decode a
    whole row-group column chunk — on a many-segment index that made
    every cold query read O(index size) instead of O(terms hit)
    (VERDICT r2 #1).  The reference's posting files are offset-addressed
    for the same reason (codec/whoosh3.py W3Codec .pst files)."""
    n = table.num_rows

    def _section(name):
        """(contiguous data memoryview, per-row lengths) zero-copy from
        the large_binary column's offsets/data buffers — no per-blob
        Python bytes objects (that copy cost doubled build time)."""
        if name not in table.column_names:
            return memoryview(b""), np.zeros(n, dtype=np.int64)
        arr = table[name].combine_chunks()
        bufs = arr.buffers()
        odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        o = np.frombuffer(bufs[1], dtype=odt, count=len(arr) + 1,
                          offset=arr.offset * np.dtype(odt).itemsize
                          ).astype(np.int64)
        lens = np.diff(o)
        data = memoryview(bufs[2])[o[0]: o[-1]] if bufs[2] is not None \
            else memoryview(b"")
        return data, lens

    sections = [_section(c) for c in BLOB_COLS]
    offs, lens, base = [], [], 0
    for _, ln in sections:
        off = np.full(len(ln), base, dtype=np.int64)
        if len(ln):
            off[1:] += np.cumsum(ln[:-1])
        offs.append(off)
        lens.append(ln)
        base += int(ln.sum())
    with open(os.path.join(seg_dir, "blobs.bin"), "wb") as f:
        for data, _ in sections:
            f.write(data)
    out = table.drop_columns([c for c in BLOB_COLS
                              if c in table.column_names])
    loc_names = (("post_off", "post_len"), ("pos_off", "pos_len"),
                 ("chars_off", "chars_len"), ("boosts_off", "boosts_len"))
    for (oname, lname), off, ln in zip(loc_names, offs, lens):
        out = out.append_column(oname, pa.array(off, type=pa.int64()))
        out = out.append_column(lname, pa.array(ln, type=pa.int64()))
    pq.write_table(out, os.path.join(seg_dir, "terms.parquet"),
                   row_group_size=4096,
                   sorting_columns=[pq.SortingColumn(0), pq.SortingColumn(1)])


def read_terms_file(seg_dir: str) -> pa.Table:
    """Read a segment's FULL terms table back into memory with inline
    ``postings``/``positions`` binary columns (merge/mutate need whole
    segments; point reads go through SegmentReader instead).  Transparent
    over the blobs.bin format, the legacy inline format, and compound
    (segment.cmpd) packing."""
    cmpd = os.path.join(seg_dir, cf.COMPOUND_NAME)
    packed = os.path.exists(cmpd)
    if packed:
        t = pq.read_table(pa.BufferReader(
            cf.subfile_buffer(cmpd, "terms.parquet")))
    else:
        t = pq.read_table(os.path.join(seg_dir, "terms.parquet"))
    if "postings" in t.column_names:  # legacy inline format
        for name in ("chars", "boosts"):
            if name not in t.column_names:
                t = t.append_column(name, pa.array([b""] * t.num_rows,
                                                   type=pa.large_binary()))
        return t
    if packed:
        mv = memoryview(cf.subfile_buffer(cmpd, "blobs.bin"))
    else:
        with open(os.path.join(seg_dir, "blobs.bin"), "rb") as f:
            mv = memoryview(f.read())
    out_cols = {"postings": ("post_off", "post_len"),
                "positions": ("pos_off", "pos_len")}
    if "chars_off" in t.column_names:
        out_cols["chars"] = ("chars_off", "chars_len")
    if "boosts_off" in t.column_names:
        out_cols["boosts"] = ("boosts_off", "boosts_len")
    drop = [c for pair in out_cols.values() for c in pair]
    rebuilt = {}
    for name, (oc, lc) in out_cols.items():
        o = t[oc].to_numpy()
        ln = t[lc].to_numpy()
        rebuilt[name] = [bytes(mv[a: a + b]) for a, b in zip(o, ln)]
    t = t.drop_columns(drop)
    for name in BLOB_COLS:
        vals = rebuilt.get(name, [b""] * t.num_rows)
        t = t.append_column(name,
                            pa.array(vals, type=pa.large_binary()))
    return t


def write_docs_file(seg_dir: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(seg_dir, "docs.parquet"),
                   row_group_size=16384,
                   sorting_columns=[pq.SortingColumn(0)])


def _docs_source_for(seg_dir: str):
    """docs.parquet source for a segment dir, compound-aware."""
    cmpd = os.path.join(seg_dir, cf.COMPOUND_NAME)
    if os.path.exists(cmpd):
        return pa.BufferReader(cf.subfile_buffer(cmpd, "docs.parquet"))
    p = os.path.join(seg_dir, "docs.parquet")
    return p if os.path.exists(p) else None


def read_docs_file(seg_dir: str,
                   columns: list[str] | None = None) -> pa.Table:
    """Read a segment's full docs table (compound-aware)."""
    return pq.read_table(_docs_source_for(seg_dir), columns=columns)


def docs_schema(seg_dir: str) -> pa.Schema | None:
    """The docs.parquet schema of a segment dir, or None when the
    segment has no docs file yet (compound-aware)."""
    src = _docs_source_for(seg_dir)
    return None if src is None else pq.read_schema(src)
