"""Storage-object compatibility package (reference ``whoosh.filedb``).

Only :mod:`whoosh_ray.filedb.filestore` is populated: the reference's
file-format plumbing (``structfile``, ``filetables``, ``compound``) is
role-replaced by the Arrow/parquet segment layout (``state/codec.py``,
``state/segment.py``, ``state/compound.py``) and has no line-for-line
counterpart on purpose.
"""
