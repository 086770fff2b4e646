"""Posting-list block codec: varint/delta blocks with skip (block-max) info.

Reproduces the *capabilities* of the reference's W3 posting blocks —
<=128 postings per block, delta-encoded docids, per-block
(count, last_docid, max_weight, min/max length-byte) skip info enabling
block-max WAND pruning (/root/reference/src/whoosh/codec/whoosh3.py:650-869,
block info :788-799, skip usage :1018-1051) — with a layout designed for
vectorized decode instead of pickled per-block payloads:

Blob layout (one blob per (field, term) per segment)::

    header    : varint npostings, varint nblocks
    block dir : varint counts[nblocks]
                varint last_docid deltas[nblocks]
                varint docid_stream byte-offset deltas[nblocks]  (end offsets)
                varint tf_stream byte-offset deltas[nblocks]     (end offsets)
                f32    block max_weight[nblocks]        (raw little-endian)
                u8     block min_length_byte[nblocks]
                u8     block max_length_byte[nblocks]
    streams   : varint docid deltas  (contiguous across blocks)
                varint tfs           (contiguous across blocks)
                u8     per-posting quantized doc-length byte

Because the docid delta stream is contiguous across block boundaries
(each block's first delta is relative to the previous block's last docid),
a full decode is ONE vectorized varint pass + cumsum; a pruned decode
slices streams using the per-block end offsets and seeds the cumsum with
the previous block's last docid.  Per-posting length bytes are stored
in-line so BM25 scoring is a single numpy expression with no doc-length
lookup join (the reference instead reads a per-doc length column,
whoosh3.py:420-433 — same quantized values, different layout).

Weights: the engine stores integer term frequencies; ``weight`` is
reconstructed per the field format (frequency: tf * boost; existence:
boost — formats.py:129-206).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from whoosh_ray.functions import varint

BLOCK_SIZE = 128  # reference parity: whoosh3.py:77 blocklimit=128


@dataclass
class BlockDir:
    """Decoded block directory (skip info) for one term."""

    npostings: int
    counts: np.ndarray        # int64[nblocks]
    last_docids: np.ndarray   # int64[nblocks]
    docid_ends: np.ndarray    # int64[nblocks] byte end-offsets into docid stream
    tf_ends: np.ndarray       # int64[nblocks]
    max_weights: np.ndarray   # float32[nblocks] (tf-based; boost applied by scorer)
    min_len_bytes: np.ndarray  # uint8[nblocks]
    max_len_bytes: np.ndarray  # uint8[nblocks]

    @property
    def nblocks(self) -> int:
        return len(self.counts)


@dataclass
class Postings:
    """Fully or partially decoded postings of one term (docid-ascending)."""

    docids: np.ndarray     # int64
    tfs: np.ndarray        # int64
    len_bytes: np.ndarray  # uint8
    # per-posting float32 scoring weights (sum of token boosts), present
    # only when some weight differs from tf — the reference stores the
    # same minified array('f') (whoosh3.py:745-829); absent => weight==tf
    weights: np.ndarray | None = None

    @property
    def score_weights(self) -> np.ndarray:
        """Weights to score with: the boost-aware array when stored,
        else the integer tfs (Frequency-format default)."""
        return self.weights if self.weights is not None else self.tfs


def encode_postings(docids: np.ndarray, tfs: np.ndarray,
                    len_bytes: np.ndarray,
                    weights: np.ndarray | None = None) -> bytes:
    """Encode one term's postings (already docid-sorted) into a blob.

    ``weights`` (optional float array of per-posting boost-aware scoring
    weights) is appended as a raw float32 tail; its presence is implied
    by blob length (exactly 4*n extra bytes) so the base layout stays
    byte-identical when weights are absent."""
    n = len(docids)
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    len_bytes = np.asarray(len_bytes, dtype=np.uint8)
    if weights is not None:
        weights = np.asarray(weights, dtype=np.float32)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE

    # Per-block stats, vectorized via reduceat on block starts.
    starts = np.arange(0, n, BLOCK_SIZE, dtype=np.int64)
    ends = np.minimum(starts + BLOCK_SIZE, n)
    counts = ends - starts
    last_docids = docids[ends - 1]
    max_tfs = (np.maximum.reduceat(weights, starts) if weights is not None
               else np.maximum.reduceat(tfs, starts))
    min_lens = np.minimum.reduceat(len_bytes, starts)
    max_lens = np.maximum.reduceat(len_bytes, starts)

    # Streams: contiguous delta/varint encodes.
    docid_stream = varint.encode_deltas(docids)
    tf_stream = varint.encode(tfs)

    # Byte end-offset of each block inside each stream: encode per-value byte
    # sizes once and reduce.  varint byte size = ceil(bit_length/7).
    deltas = np.empty_like(docids)
    deltas[0] = docids[0]
    np.subtract(docids[1:], docids[:-1], out=deltas[1:])
    docid_sizes = _varint_sizes(deltas)
    tf_sizes = _varint_sizes(tfs)
    docid_ends = np.add.reduceat(docid_sizes, starts).cumsum()
    tf_ends = np.add.reduceat(tf_sizes, starts).cumsum()

    header = varint.encode(np.array([n, nblocks], dtype=np.int64))
    dir_parts = [
        varint.encode(counts),
        varint.encode_deltas(last_docids),
        varint.encode_deltas(docid_ends),
        varint.encode_deltas(tf_ends),
        max_tfs.astype(np.float32).tobytes(),
        min_lens.astype(np.uint8).tobytes(),
        max_lens.astype(np.uint8).tobytes(),
    ]
    tail = weights.tobytes() if weights is not None else b""
    return b"".join([header, *dir_parts, docid_stream, tf_stream,
                     len_bytes.tobytes(), tail])


def _varint_sizes(values: np.ndarray) -> np.ndarray:
    v = np.asarray(values, dtype=np.uint64)
    sizes = np.ones(v.shape, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while shifted.any():
        sizes += shifted > 0
        shifted = shifted >> np.uint64(7)
    return sizes


def encode_postings_batch(docids: np.ndarray, tfs: np.ndarray,
                          len_bytes: np.ndarray,
                          term_starts: np.ndarray,
                          weights: np.ndarray | None = None) -> list[bytes]:
    """Encode MANY terms' postings in one vectorized pass.

    ``docids``/``tfs``/``len_bytes`` are the segment's postings sorted by
    (term, docid); ``term_starts`` marks each term's first posting.
    Produces blobs byte-identical to :func:`encode_postings` per term
    (asserted by unit tests) with no per-posting Python work — the whole
    segment's delta/varint streams are computed once and sliced per term.
    """
    n = len(docids)
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    len_bytes = np.asarray(len_bytes, dtype=np.uint8)
    term_starts = np.asarray(term_starts, dtype=np.int64)
    n_terms = len(term_starts)
    term_ends = np.append(term_starts[1:], n)
    term_of_post = np.repeat(np.arange(n_terms), term_ends - term_starts)

    # ---- block structure: blocks never span terms (each term starts one)
    rank_in_term = np.arange(n, dtype=np.int64) - term_starts[term_of_post]
    block_start_mask = (rank_in_term % BLOCK_SIZE) == 0
    block_starts = np.flatnonzero(block_start_mask)
    block_ends = np.append(block_starts[1:], n)
    counts = block_ends - block_starts
    term_of_block = term_of_post[block_starts]
    last_docids = docids[block_ends - 1]
    if weights is not None:
        weights = np.asarray(weights, dtype=np.float32)
        max_tfs = np.maximum.reduceat(weights, block_starts)
    else:
        max_tfs = np.maximum.reduceat(tfs, block_starts)
    min_lens = np.minimum.reduceat(len_bytes, block_starts)
    max_lens = np.maximum.reduceat(len_bytes, block_starts)
    # blocks per term + first block index of each term
    nblocks = np.bincount(term_of_block, minlength=n_terms)
    term_block_start = np.concatenate(([0], np.cumsum(nblocks)[:-1]))

    # ---- docid delta stream (reset to absolute at term starts)
    deltas = np.empty_like(docids)
    deltas[1:] = docids[1:] - docids[:-1]
    deltas[term_starts] = docids[term_starts]
    docid_sizes = _varint_sizes(deltas)
    tf_sizes = _varint_sizes(tfs)
    docid_stream = np.frombuffer(varint.encode(deltas), dtype=np.uint8)
    tf_stream = np.frombuffer(varint.encode(tfs), dtype=np.uint8)
    docid_csum = np.concatenate(([0], np.cumsum(docid_sizes)))
    tf_csum = np.concatenate(([0], np.cumsum(tf_sizes)))
    # per-block END offsets relative to the term's stream start
    docid_block_ends = docid_csum[block_ends] - docid_csum[term_starts[term_of_block]]
    tf_block_ends = tf_csum[block_ends] - tf_csum[term_starts[term_of_block]]

    # ---- per-term block-dir varint streams, each encoded globally with
    # per-term reset where the format is delta-encoded
    def _delta_reset(values, starts_idx):
        v = np.asarray(values, dtype=np.int64)
        d = np.empty_like(v)
        d[1:] = v[1:] - v[:-1]
        d[starts_idx] = v[starts_idx]
        return d

    tb = term_block_start  # first block idx per term
    counts_stream, counts_off = _varint_stream(counts)
    ld_stream, ld_off = _varint_stream(_delta_reset(last_docids, tb))
    de_stream, de_off = _varint_stream(_delta_reset(docid_block_ends, tb))
    te_stream, te_off = _varint_stream(_delta_reset(tf_block_ends, tb))
    maxw_bytes = max_tfs.astype(np.float32).tobytes()
    minl_bytes = min_lens.astype(np.uint8).tobytes()
    maxl_bytes = max_lens.astype(np.uint8).tobytes()

    # ---- headers: varint(npostings), varint(nblocks) per term
    header_vals = np.empty(2 * n_terms, dtype=np.int64)
    header_vals[0::2] = term_ends - term_starts
    header_vals[1::2] = nblocks
    h_stream, h_off = _varint_stream(header_vals)

    out: list[bytes] = []
    mv_h = memoryview(h_stream)
    mv_c = memoryview(counts_stream)
    mv_ld = memoryview(ld_stream)
    mv_de = memoryview(de_stream)
    mv_te = memoryview(te_stream)
    mv_doc = memoryview(docid_stream.tobytes())
    mv_tf = memoryview(tf_stream.tobytes())
    mv_len = memoryview(len_bytes.tobytes())
    w_bytes = weights.tobytes() if weights is not None else None
    for i in range(n_terms):
        b0, b1 = int(tb[i]), int(tb[i] + nblocks[i])
        parts = (
            mv_h[h_off[2 * i]: h_off[2 * i + 2]],
            mv_c[counts_off[b0]: counts_off[b1]],
            mv_ld[ld_off[b0]: ld_off[b1]],
            mv_de[de_off[b0]: de_off[b1]],
            mv_te[te_off[b0]: te_off[b1]],
            maxw_bytes[4 * b0: 4 * b1],
            minl_bytes[b0: b1],
            maxl_bytes[b0: b1],
            mv_doc[docid_csum[term_starts[i]]: docid_csum[term_ends[i]]],
            mv_tf[tf_csum[term_starts[i]]: tf_csum[term_ends[i]]],
            mv_len[term_starts[i]: term_ends[i]],
        )
        if w_bytes is not None:
            parts = parts + (w_bytes[4 * term_starts[i]:
                                     4 * term_ends[i]],)
        out.append(b"".join(parts))
    return out


def _varint_stream(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """(encoded stream, element byte-offset array of len n+1)."""
    v = np.asarray(values, dtype=np.int64)
    sizes = _varint_sizes(v)
    return varint.encode(v), np.concatenate(([0], np.cumsum(sizes)))


def encode_positions_batch(pos_flat: np.ndarray, post_offsets: np.ndarray,
                           term_post_starts: np.ndarray,
                           term_post_ends: np.ndarray) -> list[bytes]:
    """Vectorized positions payloads for many terms.

    ``pos_flat`` is the concatenation of every posting's position list (in
    (term, docid) posting order); ``post_offsets[j]`` is posting j's start
    in ``pos_flat`` (len n_postings+1).  Per-posting delta encoding with
    absolute first position, matching :func:`encode_positions`.
    """
    flat = np.asarray(pos_flat, dtype=np.int64)
    deltas = np.empty_like(flat)
    if len(flat):
        deltas[1:] = flat[1:] - flat[:-1]
        starts = post_offsets[:-1]
        starts = starts[starts < len(flat)]
        deltas[starts] = flat[starts]
    stream, off = _varint_stream(deltas)
    mv = memoryview(stream)
    out = []
    for s, e in zip(term_post_starts, term_post_ends):
        lo = post_offsets[int(s)]
        hi = post_offsets[int(e)]
        out.append(bytes(mv[off[lo]: off[hi]]))
    return out


class BlobReader:
    """Lazy reader over one term's blob: block dir first, streams on demand."""

    def __init__(self, blob: bytes | memoryview):
        self._buf = memoryview(blob)
        b = np.frombuffer(self._buf, dtype=np.uint8)
        self._bytes = b
        # Parse header + dir with ONE scalar varint scan: the header is
        # 2 + 4*nblocks small values (tens of bytes) — a single Python
        # loop beats five numpy-assisted scans' fixed overhead by ~10x
        # on the many-(segment x term) cold-query path.
        vals, pos = self._scan_header(bytes(self._buf[:512]))
        if vals is None:  # header larger than the fast window
            pos, (n, nblocks) = self._read_varints(0, 2)
            self.npostings = int(n)
            nblocks = int(nblocks)
            pos, counts = self._read_varints(pos, nblocks)
            pos, ld = self._read_varints(pos, nblocks)
            pos, de = self._read_varints(pos, nblocks)
            pos, te = self._read_varints(pos, nblocks)
        else:
            self.npostings = vals[0]
            nblocks = vals[1]
            a = np.array(vals[2:], dtype=np.int64)
            counts = a[:nblocks]
            ld = a[nblocks: 2 * nblocks]
            de = a[2 * nblocks: 3 * nblocks]
            te = a[3 * nblocks: 4 * nblocks]
        maxw = np.frombuffer(self._buf[pos:pos + 4 * nblocks],
                             dtype=np.float32).copy()
        pos += 4 * nblocks
        minl = np.frombuffer(self._buf[pos:pos + nblocks], dtype=np.uint8)
        pos += nblocks
        maxl = np.frombuffer(self._buf[pos:pos + nblocks], dtype=np.uint8)
        pos += nblocks
        self.dir = BlockDir(
            npostings=self.npostings,
            counts=counts,
            last_docids=np.cumsum(ld),
            docid_ends=np.cumsum(de),
            tf_ends=np.cumsum(te),
            max_weights=maxw,
            min_len_bytes=minl,
            max_len_bytes=maxl,
        )
        self._docid0 = pos
        self._tf0 = pos + int(self.dir.docid_ends[-1]) if nblocks else pos
        self._len0 = self._tf0 + (int(self.dir.tf_ends[-1]) if nblocks else 0)
        # optional float32 weights tail (implied by exact length)
        self._w0 = self._len0 + self.npostings
        self.has_weights = (self.npostings > 0 and
                            len(self._buf) - self._w0
                            == 4 * self.npostings)

    @staticmethod
    def _scan_header(window: bytes):
        """Scalar-decode the 2 + 4*nblocks header varints from a bounded
        prefix window.  Returns (values, end_pos), or (None, 0) if the
        header did not fit the window (rare giant dirs — vector path)."""
        vals = []
        need = 2
        val = 0
        shift = 0
        for pos, byte in enumerate(window):
            if byte & 0x80:
                val |= (byte & 0x7F) << shift
                shift += 7
            else:
                vals.append(val | (byte << shift))
                val = 0
                shift = 0
                if len(vals) == 2:
                    need = 2 + 4 * vals[1]
                if len(vals) == need:
                    return vals, pos + 1
        return None, 0

    def _read_varints(self, pos: int, count: int):
        """Scan exactly ``count`` varints starting at byte ``pos``."""
        if count == 0:
            return pos, np.empty(0, dtype=np.int64)
        b = self._bytes
        # find the end: the count-th terminator byte from pos (scan only
        # the bounded window, not the whole blob tail)
        window = b[pos: pos + self._scan_limit(count)]
        is_last = (window & 0x80) == 0
        term_idx = np.flatnonzero(is_last)
        if len(term_idx) < count:
            is_last = (b[pos:] & 0x80) == 0
            term_idx = np.flatnonzero(is_last)
        end = pos + int(term_idx[count - 1]) + 1
        vals = varint.decode(self._buf[pos:end], count)
        return end, vals

    @staticmethod
    def _scan_limit(count: int) -> int:
        return count * 9  # varints here are <= 8 bytes

    # ---- decode paths ----

    def decode_all(self) -> Postings:
        d = self.dir
        n = self.npostings
        docids = np.cumsum(varint.decode(
            self._buf[self._docid0:self._docid0 + int(d.docid_ends[-1])], n))
        tfs = varint.decode(self._buf[self._tf0:self._tf0 + int(d.tf_ends[-1])], n)
        lens = np.frombuffer(self._buf[self._len0:self._len0 + n], dtype=np.uint8)
        w = (np.frombuffer(self._buf[self._w0:self._w0 + 4 * n],
                           dtype=np.float32) if self.has_weights else None)
        return Postings(docids, tfs, lens, w)

    def decode_blocks(self, block_mask: np.ndarray) -> Postings:
        """Decode only the selected blocks (block-max WAND skip path)."""
        d = self.dir
        if block_mask.all():
            return self.decode_all()
        sel = np.flatnonzero(block_mask)
        if len(sel) == 0:
            e = np.empty(0, dtype=np.int64)
            return Postings(e, e.copy(), np.empty(0, dtype=np.uint8))
        docid_starts = np.concatenate(([0], d.docid_ends[:-1]))
        tf_starts = np.concatenate(([0], d.tf_ends[:-1]))
        post_ends = np.cumsum(d.counts)
        post_starts = post_ends - d.counts
        b = self._bytes
        # gather the selected blocks' byte ranges and decode each stream
        # ONCE — per-block varint.decode calls were the cold-query
        # hot spot (~40us of fixed vectorization overhead per call)
        doc_bytes = np.concatenate([
            b[self._docid0 + int(docid_starts[i]):
              self._docid0 + int(d.docid_ends[i])] for i in sel])
        tf_bytes = np.concatenate([
            b[self._tf0 + int(tf_starts[i]):
              self._tf0 + int(d.tf_ends[i])] for i in sel])
        counts_sel = d.counts[sel].astype(np.int64)
        n_sel = int(counts_sel.sum())
        all_deltas = varint.decode(doc_bytes, n_sel)
        tfs = varint.decode(tf_bytes, n_sel)
        # per-block docid reconstruction, vectorized: within a block,
        # ids = cumsum(block deltas) + prev block's last docid
        cs = np.cumsum(all_deltas)
        block_offsets = np.concatenate(([0], np.cumsum(counts_sel)[:-1]))
        prefix_at_start = np.where(block_offsets > 0,
                                   cs[block_offsets - 1], 0)
        bases = np.where(sel > 0, d.last_docids[sel - 1], 0)
        adjust = np.repeat(bases - prefix_at_start, counts_sel)
        docids = cs + adjust
        lens = np.concatenate([
            b[self._len0 + int(post_starts[i]):
              self._len0 + int(post_ends[i])] for i in sel])
        w = None
        if self.has_weights:
            wall = np.frombuffer(
                self._buf[self._w0: self._w0 + 4 * self.npostings],
                dtype=np.float32)
            w = np.concatenate([wall[int(post_starts[i]):
                                     int(post_ends[i])] for i in sel])
        return Postings(docids, tfs, lens.view(np.uint8), w)


def encode_positions(positions_per_posting: list[np.ndarray]) -> bytes:
    """Position payload stream for one term: varint deltas, split by tf.

    Reference analogue: Positions format payloads (formats.py:209-263).  The
    per-posting position count equals tf, so the stream needs no explicit
    counts — decode splits by the tf array.
    """
    if not positions_per_posting:
        return b""
    parts = []
    for pos in positions_per_posting:
        p = np.asarray(pos, dtype=np.int64)
        d = np.empty_like(p)
        d[0] = p[0]
        np.subtract(p[1:], p[:-1], out=d[1:])
        parts.append(d)
    return varint.encode(np.concatenate(parts))


def decode_positions_flat(blob: bytes | memoryview,
                          tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of a whole term's position payloads: returns
    (absolute positions flat, per-posting offsets of len n+1) with one
    varint pass and a segmented cumsum — no per-posting Python."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    offsets = np.concatenate(([0], np.cumsum(tfs)))
    deltas = varint.decode(blob, total)
    if total == 0:
        return deltas, offsets
    c = np.cumsum(deltas)
    starts = offsets[:-1]
    # value of the running sum just before each posting's first element
    base = np.zeros(len(starts), dtype=np.int64)
    base[1:] = c[starts[1:] - 1]
    flat = c - np.repeat(base, tfs)
    return flat, offsets


def decode_positions(blob: bytes | memoryview, tfs: np.ndarray) -> list[np.ndarray]:
    """Inverse of :func:`encode_positions` for the whole term."""
    flat, offsets = decode_positions_flat(blob, tfs)
    return [flat[offsets[i]: offsets[i + 1]] for i in range(len(tfs))]


# ---- character-offset payloads (Characters format parity,
# reference formats.py:266-335: per occurrence (pos, startchar, endchar);
# positions already have their own stream, so this blob stores only the
# char span per occurrence, aligned with the positions stream) ----

def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, 2 * v, -2 * v - 1)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return np.where(u % 2 == 0, u // 2, -(u + 1) // 2)


def encode_chars_batch(sc_flat: np.ndarray, ec_flat: np.ndarray,
                       post_offsets: np.ndarray,
                       term_post_starts: np.ndarray,
                       term_post_ends: np.ndarray) -> list[bytes]:
    """Vectorized char-span payloads for many terms: per occurrence an
    interleaved (zigzag(startchar - prev endchar), length) varint pair,
    deltas resetting at each posting's first occurrence (zigzag because
    overlapping tokens — ngrams, intraword subwords — can step
    backwards)."""
    sc = np.asarray(sc_flat, dtype=np.int64)
    ec = np.asarray(ec_flat, dtype=np.int64)
    total = len(sc)
    d_sc = np.empty_like(sc)
    if total:
        d_sc[1:] = sc[1:] - ec[:-1]
        starts = np.asarray(post_offsets[:-1], dtype=np.int64)
        starts = starts[starts < total]
        d_sc[starts] = sc[starts]
    inter = np.empty(2 * total, dtype=np.int64)
    inter[0::2] = _zigzag(d_sc)
    inter[1::2] = ec - sc
    stream, off = _varint_stream(inter)
    mv = memoryview(stream)
    out = []
    for s, e in zip(term_post_starts, term_post_ends):
        lo = int(post_offsets[int(s)])
        hi = int(post_offsets[int(e)])
        out.append(bytes(mv[off[2 * lo]: off[2 * hi]]))
    return out


def encode_chars(spans_per_posting: list) -> bytes:
    """One term's char payload from per-posting (sc, ec) array pairs."""
    if not spans_per_posting:
        return b""
    scs = [np.asarray(s, dtype=np.int64) for s, _ in spans_per_posting]
    ecs = [np.asarray(e, dtype=np.int64) for _, e in spans_per_posting]
    tfs = np.array([len(s) for s in scs], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(tfs)))
    sc = np.concatenate(scs) if scs else np.empty(0, dtype=np.int64)
    ec = np.concatenate(ecs) if ecs else np.empty(0, dtype=np.int64)
    return encode_chars_batch(sc, ec, offsets, np.array([0]),
                              np.array([len(tfs)]))[0]


def decode_chars_flat(blob: bytes | memoryview,
                      tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
    """Decode a term's char payload: (startchars, endchars, offsets)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    offsets = np.concatenate(([0], np.cumsum(tfs)))
    vals = varint.decode(blob, 2 * total)
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), offsets
    d_sc = _unzigzag(vals[0::2])
    lens = vals[1::2]
    c = np.cumsum(d_sc + lens)  # running endchar within the segment sum
    starts = offsets[:-1]
    base = np.zeros(len(starts), dtype=np.int64)
    base[1:] = c[starts[1:] - 1]
    ec = c - np.repeat(base, tfs)
    sc = ec - lens
    return sc, ec, offsets


def decode_chars(blob: bytes | memoryview, tfs: np.ndarray) -> list:
    """Per-posting (sc, ec) array pairs — inverse of encode_chars."""
    sc, ec, offsets = decode_chars_flat(blob, tfs)
    return [(sc[offsets[i]: offsets[i + 1]], ec[offsets[i]: offsets[i + 1]])
            for i in range(len(tfs))]


# ---- per-occurrence boost payloads (PositionBoosts / CharacterBoosts) ----
#
# The reference's PositionBoosts/CharacterBoosts formats store one boost
# per token occurrence inside the posting value (formats.py:339-481,
# pickled (delta, boost) tuples).  Here the occurrence grouping is already
# implied by the posting tfs (same layout as positions), so the payload is
# simply a raw little-endian float32 per occurrence — zero-copy decodable
# with np.frombuffer.  The reference's float boosts round-trip through
# array('f') block storage, so float32 matches its precision.


def encode_boosts_batch(boosts_flat: np.ndarray,
                        post_offsets: np.ndarray,
                        term_post_starts: np.ndarray,
                        term_post_ends: np.ndarray) -> list[bytes]:
    """Vectorized per-term boost payloads: slice one contiguous f4 buffer
    by the postings' occurrence offsets."""
    raw = np.ascontiguousarray(np.asarray(boosts_flat, dtype="<f4")).tobytes()
    mv = memoryview(raw)
    out = []
    for s, e in zip(term_post_starts, term_post_ends):
        lo = int(post_offsets[int(s)])
        hi = int(post_offsets[int(e)])
        out.append(bytes(mv[4 * lo: 4 * hi]))
    return out


def encode_boosts(boosts_per_posting: list) -> bytes:
    """One term's boost payload from per-posting boost arrays."""
    if not boosts_per_posting:
        return b""
    arrs = [np.asarray(a, dtype="<f4") for a in boosts_per_posting]
    return np.concatenate(arrs).astype("<f4").tobytes()


def decode_boosts_flat(blob: bytes | memoryview,
                       tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(flat float32 boosts, per-posting offsets)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(tfs)))
    vals = np.frombuffer(bytes(blob), dtype="<f4")
    return vals, offsets


def decode_boosts(blob: bytes | memoryview, tfs: np.ndarray) -> list:
    """Per-posting boost arrays — inverse of encode_boosts."""
    vals, offsets = decode_boosts_flat(blob, tfs)
    return [vals[offsets[i]: offsets[i + 1]] for i in range(len(tfs))]
