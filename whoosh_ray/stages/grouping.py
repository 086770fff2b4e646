"""Vectorized group processing: co-locate key groups into whole blocks.

``groupby(...).map_groups(fn)`` invokes ``fn`` once per group — with
tens of thousands of tiny groups (LSH band buckets, shingle buckets,
content-hash groups) the per-call pandas overhead dominates the whole
pipeline.  This helper hash-partitions by the keys instead (every
group lands entirely in ONE block, sorted), then applies ``fn`` to each
whole block, so ``fn`` handles MANY groups per call with vectorized
boundary detection.

The keyed repartition needs Ray Data's hash-shuffle strategy; the
global context is flipped only around the materialization, leaving the
sort-based strategy (which the build's groupby pipelines are tuned on)
untouched for everything else.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.context import ShuffleStrategy


def _arrow_out(fn):
    """Wrap a block fn so pandas outputs become METADATA-FREE Arrow
    tables.  ``pa.Table.from_pandas`` attaches a ``b'pandas'`` schema
    metadata blob, and ``pa.Schema.__hash__`` RAISES on any schema with
    metadata — so every such block defeats Ray's schema-dedup fast path
    (unify_schemas' ``set(schemas)`` early exit) and spams 'Failed to
    hash the schemas' from the hash-shuffle aggregators.  Ray would do
    the pandas->arrow conversion at the exchange anyway; doing it here
    costs nothing extra and keeps schemas hashable."""
    def wrapped(batch):
        out = fn(batch)
        if isinstance(out, pd.DataFrame):
            out = pa.Table.from_pandas(out, preserve_index=False)
        if isinstance(out, pa.Table) and out.schema.metadata:
            out = out.replace_schema_metadata(None)
        return out

    wrapped.__name__ = getattr(fn, "__name__", "group_fn")
    return wrapped


def groups_in_blocks(ds: ray.data.Dataset, keys: list[str], fn,
                     num_blocks: int | None = None,
                     batch_format: str = "pandas") -> ray.data.Dataset:
    """Hash-partition ``ds`` by ``keys`` (sorted within blocks) and map
    ``fn`` over whole blocks; returns the MATERIALIZED result (executed
    while the hash-shuffle strategy is active).  ``fn`` must handle a
    batch containing multiple complete, contiguous key groups."""
    return groups_in_blocks_chain(ds, [(keys, fn)], num_blocks,
                                  batch_format)


def groups_in_blocks_chain(ds: ray.data.Dataset, stages,
                           num_blocks: int | None = None,
                           batch_format: str = "pandas",
                           ) -> ray.data.Dataset:
    """Run SEVERAL keyed repartition+map stages in ONE execution.

    ``stages`` is a list of ``(keys, fn)``.  A chain of
    ``groups_in_blocks`` calls pays one materialization plus one
    hash-shuffle aggregator-pool spin-up per call; here all stages build
    one lazy plan executed under a single hash-shuffle context flip —
    the same exchanges, half the fixed cost (the dominant term for
    contract-small inputs like LSH candidate-pair sets)."""
    ds = ds.materialize()
    if num_blocks is None:
        # each hash-shuffle partition spins up an aggregator actor —
        # size the partition count to the data, not the CPU count, so
        # small inputs don't pay 2*ncpu actor launches of fixed cost
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        rows = ds.count()
        num_blocks = int(min(max(4, rows // 100_000), 2 * ncpu))
    out = ds
    for keys, fn in stages:
        rp = out.repartition(num_blocks=num_blocks, keys=keys, sort=True)
        out = rp.map_batches(_arrow_out(fn), batch_format=batch_format,
                             batch_size=None)
    # each Dataset carries its own context snapshot; flip only THIS
    # plan's strategy and execute it here
    out.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return out.materialize()
