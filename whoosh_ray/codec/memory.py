"""In-memory segment codec (reference codec/memory.py MemoryCodec) —
a full segment-reader surface over in-memory Arrow tables, used by the
NRT BufferedWriter overlay; implementation in ``state/memseg.py``."""

from whoosh_ray.state.memseg import MemorySegmentReader  # noqa: F401


class MemoryCodec:
    """Handle constructing in-memory segment readers."""

    length_stats = False

    @staticmethod
    def reader(*args, **kwargs) -> MemorySegmentReader:
        return MemorySegmentReader(*args, **kwargs)
