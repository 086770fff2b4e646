"""Multimodal columns: opaque binary payloads + actor-pool decode stages.

Images/audio/video travel as ``binary`` columns with typed metadata
columns alongside; decode / feature-extract / resize / frame-sample are
stateful actor-pool ``map_batches`` stages (decoder built once per actor
in ``__init__``).  The actual media libraries are NOT in this container,
so the decode kernel is stubbed: ``backend="fake"`` produces
deterministic features from the payload bytes (the default, so the whole
Ray-side plumbing — schema, batch sizing, actor signature, output layout
— is real and tested), while ``backend="pillow"``/``"ffmpeg"`` raise
``NotImplementedError`` until the dependency exists.

Memory note: binary payloads make rows wide — keep ``batch_size`` small
(64-256) and size ``concurrency x num_cpus`` to the node so
payload_batches x actors fit the heap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

IMAGE_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def synthesize_media(n: int, seed: int = 3, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table for tests/benches (no external data)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table({
        "item_id": pa.array(np.arange(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "mime": pa.array(["image/png"] * n),
        "width": pa.array(rng.integers(64, 1024, n).astype(np.int32)),
        "height": pa.array(rng.integers(64, 1024, n).astype(np.int32)),
    })


class ImageFeatures:
    """Actor-pool stage: payload -> fixed-dim feature vector.

    backend="fake": deterministic 32-dim feature from byte histograms —
    real plumbing, fake pixels.  backend="pillow": STUB, raises until the
    imaging library is installed."""

    def __init__(self, backend: str = "fake", dim: int = 32):
        if backend not in ("fake", "pillow"):
            raise ValueError(backend)
        if backend == "pillow":
            raise NotImplementedError(
                "image decode backend requires pillow, which is not in this "
                "container; use backend='fake' for plumbing tests")
        self.backend = backend
        self.dim = dim
        # per-actor init: the bucket edges the histogram kernel reuses
        self._edges = np.linspace(0, 256, dim + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        feats = np.zeros((batch.num_rows, self.dim), dtype=np.float32)
        for i in range(batch.num_rows):
            buf = np.frombuffer(payloads[i].as_py(), dtype=np.uint8)
            h, _ = np.histogram(buf, bins=self._edges)
            n = np.linalg.norm(h)
            feats[i] = h / (n or 1.0)
        return batch.drop_columns(["payload"]).append_column(
            "features", pa.array(list(feats), type=pa.list_(pa.float32())))


class Resize:
    """Actor-pool stage: resize metadata transform (decode stubbed)."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy().astype(np.float64)
        h = batch["height"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        return (batch
                .append_column("out_width",
                               pa.array((w * scale).astype(np.int32)))
                .append_column("out_height",
                               pa.array((h * scale).astype(np.int32))))


def extract_image_features(ds: ray.data.Dataset, *, concurrency: int = 4,
                           batch_size: int = 128) -> ray.data.Dataset:
    """The canonical multimodal pipeline shape: small batches, actor pool."""
    return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"backend": "fake"})
