"""In-memory segment reader — the MemoryCodec analogue.

Reference analogue: ``codec.memory.MemoryCodec`` (/root/reference/src/
whoosh/codec/memory.py:30-334), the RAM codec whose segments live
entirely in process memory and are served to a searcher without touching
storage; the reference uses it for its BufferedWriter's NRT overlay.

Here a :class:`MemorySegmentReader` holds the segment's two Arrow tables
(terms WITH inline blob columns, and docs) and serves the full
``SegmentReader`` surface from them — no file descriptors, no parquet
reads, no temp directory.  ``pipelines/writer.py``'s BufferedWriter uses
it for the RAM overlay, and ``state/plaintext.py`` loads parsed text
dumps into it for inspection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from whoosh_ray.state import codec
from whoosh_ray.state.manifest import SegmentMeta
from whoosh_ray.state.segment import (
    TERM_STAT_COLS,
    SegmentReader,
    read_docs_file,
    read_terms_file,
)
from whoosh_ray.state.schema import IndexSchema


class MemorySegmentReader(SegmentReader):
    """A SegmentReader over in-memory Arrow tables.

    ``terms`` must carry the inline blob columns (the
    ``read_terms_file`` layout: postings/positions/chars/boosts as
    large_binary), ``docs`` is the stored-field table sorted by docid.
    """

    def __init__(self, meta: SegmentMeta, schema: IndexSchema,
                 terms: pa.Table, docs: pa.Table):
        self.meta = meta
        self.schema = schema
        self.dir = f"<memory seg={meta.seg_id}>"
        self._terms_inline = terms
        self._docs = docs
        # eagerly materialized stats: Searcher._warm_stats_batched skips
        # segments whose _stats is set, so the batched multi-file warm
        # never tries to os.stat this reader's (nonexistent) paths
        self._stats = terms.select([c for c in TERM_STAT_COLS
                                    if c in terms.column_names])
        self._has_bin = True  # point lookups, never a parquet scan
        self._deletes = np.empty(0, dtype=np.int64)
        self._blob_cache: dict = {}
        self._bin_fd = None  # SegmentReader.__del__ probes this

    @classmethod
    def load(cls, seg_dir: str, meta: SegmentMeta,
             schema: IndexSchema) -> "MemorySegmentReader":
        """Lift an on-disk segment fully into memory (after which the
        directory may be deleted — BufferedWriter's RAM overlay path)."""
        return cls(meta, schema, read_terms_file(seg_dir),
                   read_docs_file(seg_dir))

    # ---- blobs: inline column slices instead of preads ----

    def _inline(self, idx: int, name: str) -> bytes | None:
        if name not in self._terms_inline.column_names:
            return None
        v = self._terms_inline[name][idx].as_py()
        return v if v else None

    def _blobs_at(self, idx: int):
        return (self._inline(idx, "postings") or b"",
                self._inline(idx, "positions"))

    def preload_blobs(self, by_field) -> None:
        pass  # everything is already resident

    def _load_blobs(self, field: str, term: str):
        idx = self._find(field, term)
        if idx is None:
            return None
        return self._blobs_at(idx)

    def char_spans(self, field: str, term: str):
        idx = self._find(field, term)
        if idx is None:
            return None
        blob = self._inline(idx, "chars")
        if blob is None:
            return None
        p = codec.BlobReader(self._inline(idx, "postings")).decode_all()
        return p.docids, codec.decode_chars(blob, p.tfs)

    def boost_payloads(self, field: str, term: str,
                       with_chars: bool = False):
        idx = self._find(field, term)
        if idx is None:
            return None
        blob = self._inline(idx, "boosts")
        if blob is None:
            return None
        p = codec.BlobReader(self._inline(idx, "postings")).decode_all()
        boosts = codec.decode_boosts(blob, p.tfs)
        posblob = self._inline(idx, "positions")
        poss = codec.decode_positions(posblob, p.tfs) if posblob else None
        chars = None
        if with_chars:
            cs = self.char_spans(field, term)
            chars = cs[1] if cs is not None else None
        return p.docids, poss, chars, boosts

    # ---- docs: table slices instead of parquet reads ----

    def all_docids(self) -> np.ndarray:
        return self._docs["docid"].to_numpy()

    def docs_table(self, columns: list[str] | None = None) -> pa.Table:
        return self._docs if columns is None else self._docs.select(columns)

    def _docs_colnames(self) -> frozenset:
        return frozenset(self._docs.column_names)

    def stored(self, docids: np.ndarray,
               columns: list[str] | None = None) -> pa.Table:
        t = self._docs
        if columns is not None:
            cols = list(dict.fromkeys(["docid"] + list(columns)))
            have = [c for c in cols if c in t.column_names]
            t = t.select(have)
            for c in cols:
                if c not in t.column_names:
                    t = t.append_column(c, pa.nulls(t.num_rows))
        all_ids = t["docid"].to_numpy()
        idx = np.searchsorted(all_ids, docids)
        idx = np.clip(idx, 0, len(all_ids) - 1)
        ok = all_ids[idx] == docids
        return t.take(pa.array(idx[ok]))

    # ---- unused file plumbing, kept inert on purpose ----

    _compound = None  # shadows the base property: never file-backed

    def terms_ds_path(self) -> str:
        raise RuntimeError(
            "memory segments have no dataset-addressable terms file; "
            "commit the buffered docs before distributed stats reads")

    def _terms_key(self):
        return ("<memory>", self.meta.seg_id, id(self._terms_inline))

    def _pread(self, off, length):  # pragma: no cover
        raise RuntimeError("MemorySegmentReader has no backing file")
