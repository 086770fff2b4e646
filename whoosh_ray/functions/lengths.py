"""Field-length quantization — byte-for-byte parity with the reference.

The reference stores each document's per-field token count quantized to a
single byte via a logarithmic 256-bucket table, and BM25 scores with the
*dequantized* value (/root/reference/src/whoosh/util/numeric.py:288-317,
used by codec/whoosh3.py:218-222 and :420-433).  Rank-identical BM25
therefore requires the exact same table.

The table is regenerated here from the published closed form
``byte_to_length(n) = int(round((1.033**n - 1) * 27))`` (numeric.py:250-273
documents the formula the cached table was generated from); a unit test
asserts equality with the reference's literal cache for all 256 entries.
``length_to_byte`` rounds *down* via bisect-left semantics, matching the
"new implementation" in the reference.
"""

from __future__ import annotations

import numpy as np

# byte -> representative length (exact reproduction of the reference table)
BYTE_TO_LENGTH = np.array(
    [int(round((1.033 ** n - 1) * 27)) for n in range(256)], dtype=np.int64
)
_MAX_LEN = int(BYTE_TO_LENGTH[255])  # 106374


def length_to_byte(lengths: np.ndarray | int) -> np.ndarray:
    """Vectorized log-bucket quantization of token counts to uint8.

    Parity: numeric.py:309-315 — lengths >= 106374 clamp to byte 255,
    otherwise bisect_left into the cached table.
    """
    arr = np.atleast_1d(np.asarray(lengths, dtype=np.int64))
    bytes_ = np.searchsorted(BYTE_TO_LENGTH, np.minimum(arr, _MAX_LEN), side="left")
    return bytes_.astype(np.uint8)


def byte_to_length(bytes_: np.ndarray) -> np.ndarray:
    """Vectorized inverse: the dequantized length BM25 scores with."""
    return BYTE_TO_LENGTH[np.asarray(bytes_, dtype=np.int64)]
