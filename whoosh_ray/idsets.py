"""Drop-in idsets surface (reference whoosh/idsets.py names mapped to
the vectorized numpy sets in whoosh_ray.functions.idsets)."""

from whoosh_ray.functions.idsets import (  # noqa: F401
    ROARING_CUTOFF,
    BitIdSet,
    DocIdSet,
    MultiIdSet,
    ReverseIdSet,
    RoaringIdSet,
    SortedIdSet,
    as_id_set,
)

# reference class names (idsets.py:303 BitSet, :467 SortedIntSet,
# :244 OnDiskBitSet — the engine's BitIdSet reads/writes the same raw
# byte layout via to_bytes/from_bytes, so the on-disk reader is the
# same class)
BaseBitSet = BitIdSet
BitSet = BitIdSet
SortedIntSet = SortedIdSet
OnDiskBitSet = BitIdSet


def bytes_for_bits(maxid: int) -> int:
    """Bytes needed to hold ``maxid`` bits (reference idsets.py:33)."""
    return (maxid >> 3) + 1
