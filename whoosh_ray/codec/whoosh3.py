"""The default segment codec (reference codec/whoosh3.py W3Codec).

The W3 single-writer file formats are replaced by a vectorized
Arrow/parquet layout built in parallel by Ray tasks; the numpy
varint/delta posting-block kernels live in ``state/codec.py`` and are
re-exported here under the reference's module path.  ``W3Codec``
itself is the handle build/search code passes around: it knows the
per-segment file set and can pack/unpack compound segments.
"""

from whoosh_ray.state.codec import (  # noqa: F401
    BlobReader,
    BlockDir,
    Postings,
    decode_boosts,
    decode_chars,
    decode_positions,
    encode_boosts_batch,
    encode_chars_batch,
    encode_positions_batch,
    encode_postings,
    encode_postings_batch,
)

TERMS_FILE = "terms.parquet"
BLOBS_FILE = "blobs.bin"
DOCS_FILE = "docs.parquet"
META_FILE = "meta.json"


class W3Codec:
    """Default on-disk segment layout handle.

    The reference W3Codec carries knobs (blocklimit, compression,
    inlinelimit) for its scalar block writer; the vectorized writer
    sizes blocks itself, so the knobs are accepted and recorded for
    compatibility but do not change the wire format.
    """

    def __init__(self, blocklimit: int = 128, compression: int = 3,
                 inlinelimit: int = 1):
        self.blocklimit = blocklimit
        self.compression = compression
        self.inlinelimit = inlinelimit

    def __repr__(self):
        return "%s()" % type(self).__name__

    @staticmethod
    def segment_files() -> tuple[str, ...]:
        """Data files making up one segment directory."""
        return (TERMS_FILE, BLOBS_FILE, DOCS_FILE, META_FILE)

    @staticmethod
    def pack_segment(seg_dir: str, *, remove: bool = True):
        """Pack a segment directory into one compound file."""
        from whoosh_ray.state.compound import pack_segment

        return pack_segment(seg_dir, remove=remove)

    @staticmethod
    def reader(seg_dir: str, **kwargs):
        """Open a SegmentReader over a (plain or compound) segment."""
        from whoosh_ray.state.segment import SegmentReader

        return SegmentReader(seg_dir, **kwargs)
