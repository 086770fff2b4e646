"""whoosh_ray — a Ray-Data-native inverted-index + BM25F query engine.

A brand-new engine with the query/data-processing capabilities of
mchaput/whoosh (reference at /root/reference), re-expressed Ray-Data-first:

- index build = ``ray.data.read_parquet`` -> ``map_batches`` (vectorized
  StandardAnalyzer tokenization over zero-copy Arrow batches) -> posting
  explode -> ``groupby(["segment","field","term"])`` shuffle -> per-group
  varint/delta posting-block encode -> partitioned Parquet segments with a
  checkpoint-resumable manifest (per-partition lineage + metrics);
- query = BM25F top-k over the immutable segments with block-max WAND
  pruning, numpy-vectorized matchers, distributed per-segment fan-out.

Nothing is copied from the reference; reference file:line citations in
docstrings point at the *behavior* being reproduced.
"""

__version__ = "0.1.0"

#: version as a tuple, the shape the reference keeps in
#: ``whoosh.__version__`` (tuple there, string here — ours predates the
#: compat layer and is part of the manifest format)
version_tuple = (0, 1, 0)


def versionstring(build: bool = True, extra: bool = True) -> str:
    """Version number as a string (reference __init__.py:36-55):
    ``build=False`` drops the third component, ``extra`` appends any
    alpha/beta/rc tags beyond it."""
    first = 3 if build else 2
    s = ".".join(str(n) for n in version_tuple[:first])
    if build and extra:
        s += "".join(str(n) for n in version_tuple[3:])
    return s


from whoosh_ray.state.schema import FieldSpec, IndexSchema  # noqa: F401,E402
