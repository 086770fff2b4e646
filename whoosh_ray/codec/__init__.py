"""Codec entry points under the reference's module layout
(reference codec/__init__.py).

A "codec" here is a segment on-disk layout.  The default is the
Arrow/parquet layout that replaced the reference's W3 file formats:
``terms.parquet`` (sorted lexicon + stats) + ``blobs.bin``
(offset-addressed posting/position/char sidecar) + ``docs.parquet``
(stored fields/lengths/vectors) + ``meta.json`` per docid-range
segment, optionally packed into one ``segment.cmpd`` compound file.
"""

from whoosh_ray.codec.whoosh3 import W3Codec


def default_codec(*args, **kwargs):
    return W3Codec(*args, **kwargs)
