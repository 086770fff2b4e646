"""Numpy-vectorized LEB128 varint codec for posting blocks.

The reference engine delta-encodes docids inside posting blocks with a
byte-oriented varint scheme (see /root/reference/src/whoosh/util/numlists.py:10-21
and codec/whoosh3.py:811-817).  That implementation is a per-value Python
loop; ours encodes/decodes whole numpy arrays at once so a multi-million
posting list costs a handful of vector ops, which is what makes the
Arrow-batch query kernel viable at 100 TB scale.

Format: classic LEB128 — little-endian base-128, 7 payload bits per byte,
high bit set on every byte except the last byte of each value.  Values are
unsigned and < 2**53 (docid deltas, term frequencies, position deltas), so
float64 accumulation in ``np.bincount`` is exact.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 8  # 7*8 = 56 bits > 53-bit ceiling we allow


def encode(values: np.ndarray) -> bytes:
    """Encode an array of non-negative ints (< 2**53) as a varint stream."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value: ceil(bit_length/7), min 1
    nbytes = np.ones(v.shape, dtype=np.int64)
    threshold = np.uint64(1 << 7)
    shifted = v.copy()
    for _ in range(_MAX_VARINT_BYTES - 1):
        more = shifted >= threshold
        if not more.any():
            break
        nbytes += more
        shifted = shifted >> np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # byte offset where each value starts
    starts = np.zeros(v.shape, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    for k in range(int(nbytes.max())):
        sel = nbytes > k
        idx = starts[sel] + k
        payload = (v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = np.where(nbytes[sel] - 1 > k, 0x80, 0).astype(np.uint8)
        out[idx] = payload.astype(np.uint8) | cont
    return out.tobytes()


def decode(buf: bytes | memoryview | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a varint stream to an int64 array (vectorized, no Python loop
    for large streams; a scalar loop for tiny ones — the numpy machinery
    costs ~50 us of fixed overhead per call, which dominated block-header
    reads on many-segment cold queries)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    if b.size <= 80:
        out = []
        val = 0
        shift = 0
        for byte in bytes(b):
            if byte & 0x80:
                val |= (byte & 0x7F) << shift
                shift += 7
            else:
                out.append(val | (byte << shift))
                val = 0
                shift = 0
        if count is not None and count != len(out):
            raise ValueError(f"expected {count} varints, decoded {len(out)}")
        return np.array(out, dtype=np.int64)
    is_last = (b & 0x80) == 0
    # value index for every byte = number of terminators strictly before it
    value_id = np.empty(b.shape, dtype=np.int64)
    value_id[0] = 0
    np.cumsum(is_last[:-1], out=value_id[1:])
    n_values = int(is_last.sum())
    # position of each byte within its value
    starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    pos_in_value = np.arange(b.size, dtype=np.int64) - starts[value_id]
    weights = (b & 0x7F).astype(np.float64) * np.exp2(7.0 * pos_in_value)
    vals = np.bincount(value_id, weights=weights, minlength=n_values)
    out = vals.astype(np.int64)
    if count is not None and count != n_values:
        raise ValueError(f"expected {count} varints, decoded {n_values}")
    return out


def encode_deltas(sorted_values: np.ndarray) -> bytes:
    """Delta-encode a sorted int array then varint it (docid lists)."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return encode(deltas)


def decode_deltas(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Inverse of :func:`encode_deltas`."""
    deltas = decode(buf, count)
    return np.cumsum(deltas)
