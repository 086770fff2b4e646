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

from whoosh_ray.state.schema import FieldSpec, IndexSchema  # noqa: F401
