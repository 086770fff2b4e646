"""Multimodal columns: opaque binary payloads + actor-pool decode stages.

Images/audio travel as ``binary`` columns with typed metadata columns
alongside; decode / feature-extract / resize are stateful actor-pool
``map_batches`` stages (state built once per actor in ``__init__``).

``backend="numpy"`` (default) performs REAL decodes with the pure-numpy
codecs in :mod:`whoosh_ray.functions.media` — WAV (PCM/float), PPM and
24-bit BMP — and real kernels (FFT audio features, channel statistics,
nearest-neighbor resize).  Formats that genuinely require external
codec libraries (JPEG/PNG/MP4 — pillow/ffmpeg are not in this
container) fall back per row: ``on_unknown="fake"`` produces the
deterministic byte-histogram feature (so pipelines keep flowing, with a
``decoded`` flag column telling which rows got real features), while
``on_unknown="error"`` raises.

Memory note: binary payloads make rows wide — keep ``batch_size`` small
(64-256) and size ``concurrency x num_cpus`` to the node so
payload_batches x actors fit the heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from whoosh_ray.functions import media

IMAGE_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])

FEATURE_DIM = 16  # unified feature width across modalities


def synthesize_media(n: int, seed: int = 3,
                     payload_bytes: int = 4096) -> pa.Table:
    """Deterministic media table with REAL payloads: a rotating mix of
    PPM images, BMP images, WAV tones, PNGs (gray/RGB/RGBA) and baseline
    JPEGs (4:4:4 / 4:2:0), plus a few undecodable blobs to exercise the
    fallback path.  No external data."""
    from whoosh_ray.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    payloads, mimes, widths, heights = [], [], [], []
    for i in range(n):
        kind = i % 6
        if kind == 5:
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            gy, gx = np.mgrid[0:h, 0:w]
            img = np.stack([gy * 255 // max(h - 1, 1),
                            gx * 255 // max(w - 1, 1),
                            (gy + gx) * 127 // max(h + w - 2, 1)],
                           axis=2).astype(np.uint8)
            payloads.append(encode_jpeg(img, subsample=("444", "420")[i % 2]))
            mimes.append("image/jpeg")
        elif kind == 4:
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            ch = (1, 3, 4)[i % 3]  # rotate gray / RGB / RGBA
            img = rng.integers(0, 256, (h, w, ch) if ch > 1 else (h, w),
                               dtype=np.uint8)
            payloads.append(media.encode_png(img))
            mimes.append("image/png")
        elif kind == 0:
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payloads.append(media.encode_ppm(img))
            mimes.append("image/x-portable-pixmap")
        elif kind == 1:
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payloads.append(media.encode_bmp(img))
            mimes.append("image/bmp")
        elif kind == 2:
            rate = 8000
            freq = float(rng.integers(100, 1500))
            t = np.arange(int(rng.integers(800, 4000))) / rate
            payloads.append(media.encode_wav(np.sin(2 * np.pi * freq * t),
                                             rate))
            mimes.append("audio/wav")
            w = h = 0
        else:
            payloads.append(rng.integers(0, 256, payload_bytes,
                                         dtype=np.uint8).tobytes())
            mimes.append("application/octet-stream")
            w = h = 0
        if kind in (0, 1, 4, 5):
            widths.append(w)
            heights.append(h)
        else:
            widths.append(0)
            heights.append(0)
    return pa.table({
        "item_id": pa.array(np.arange(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "mime": pa.array(mimes),
        "width": pa.array(np.asarray(widths, dtype=np.int32)),
        "height": pa.array(np.asarray(heights, dtype=np.int32)),
    })


def _as_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize decoded image planes to (h, w, 3) for image_features:
    grayscale broadcasts across channels, alpha is dropped."""
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 4:
        return img[:, :, :3]
    return img


def _pad(vec: np.ndarray, dim: int) -> np.ndarray:
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(vec))] = vec[:dim]
    return out


class MediaFeatures:
    """Actor-pool stage: payload -> fixed-dim feature vector + decoded
    flag.  Real decode per sniffed format; byte-histogram fallback for
    container-less codecs."""

    def __init__(self, backend: str = "numpy", dim: int = FEATURE_DIM,
                 on_unknown: str = "fake"):
        if backend not in ("numpy", "fake"):
            raise ValueError(backend)
        if on_unknown not in ("fake", "error"):
            raise ValueError(on_unknown)
        self.backend = backend
        self.dim = dim
        self.on_unknown = on_unknown
        self._edges = np.linspace(0, 256, dim + 1)  # fallback histogram

    def _fallback(self, buf: bytes) -> np.ndarray:
        h, _ = np.histogram(np.frombuffer(buf, dtype=np.uint8),
                            bins=self._edges)
        n = np.linalg.norm(h)
        return (h / (n or 1.0)).astype(np.float32)

    def _features(self, buf: bytes) -> tuple[np.ndarray, bool]:
        if self.backend == "fake":
            return self._fallback(buf), False
        mime = media.sniff_mime(buf)
        if mime == "audio/wav":
            samples, rate = media.decode_wav(buf)
            return _pad(media.audio_features(samples, rate), self.dim), True
        if mime == "image/x-portable-pixmap":
            return _pad(media.image_features(media.decode_ppm(buf)),
                        self.dim), True
        if mime == "image/bmp":
            return _pad(media.image_features(media.decode_bmp(buf)),
                        self.dim), True
        if mime == "image/png":
            return _pad(media.image_features(_as_rgb(media.decode_png(buf))),
                        self.dim), True
        if mime == "image/jpeg":
            from whoosh_ray.functions.jpeg import decode_jpeg

            return _pad(media.image_features(_as_rgb(decode_jpeg(buf))),
                        self.dim), True
        if mime in ("video/x-y4m", "video/mp4"):
            if mime == "video/x-y4m":
                frames = media.decode_y4m(buf)
            else:
                # optional-backend facade (PyAV / ffmpeg-on-PATH);
                # degrades to fallback features when neither exists
                try:
                    frames = media.decode_mp4(buf)
                except media.MissingVideoCodec:
                    if self.on_unknown == "error":
                        raise
                    return self._fallback(buf), False
            if len(frames) == 0:
                return self._fallback(buf), False
            # mean of per-frame image features over up to 4 uniformly
            # sampled frames — deterministic and length-stable
            idx = np.unique(np.linspace(0, len(frames) - 1,
                                        min(4, len(frames)), dtype=int))
            feats = np.stack([media.image_features(frames[i])
                              for i in idx])
            return _pad(feats.mean(axis=0).astype(np.float32),
                        self.dim), True
        if self.on_unknown == "error":
            raise NotImplementedError(
                f"no in-container codec for {mime!r}")
        return self._fallback(buf), False

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        feats = np.zeros((batch.num_rows, self.dim), dtype=np.float32)
        decoded = np.zeros(batch.num_rows, dtype=bool)
        for i in range(batch.num_rows):
            feats[i], decoded[i] = self._features(payloads[i].as_py())
        return (batch.drop_columns(["payload"])
                .append_column("features",
                               pa.array(list(feats),
                                        type=pa.list_(pa.float32())))
                .append_column("decoded", pa.array(decoded)))


# backwards-compatible name (r1 plumbing used ImageFeatures)
ImageFeatures = MediaFeatures


class Resize:
    """Actor-pool stage: REAL nearest-neighbor pixel resize for
    decodable images (re-encoded in their source format); rows of other
    modalities pass through with out dims = scaled metadata only."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def _resize_one(self, buf: bytes) -> tuple[bytes, int, int, bool]:
        mime = media.sniff_mime(buf)
        if mime == "image/x-portable-pixmap":
            img = media.decode_ppm(buf)
            enc = media.encode_ppm
        elif mime == "image/bmp":
            img = media.decode_bmp(buf)
            enc = media.encode_bmp
        elif mime == "image/png":
            img = media.decode_png(buf)
            enc = media.encode_png
        elif mime == "image/jpeg":
            from whoosh_ray.functions.jpeg import decode_jpeg, encode_jpeg

            img = decode_jpeg(buf)
            if img.ndim == 3 and img.shape[2] == 1:
                img = img[:, :, 0]
            enc = encode_jpeg
        else:
            return buf, 0, 0, False
        h, w = img.shape[:2]
        scale = min(1.0, self.max_side / max(w, h))
        ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
        out = media.resize_nearest(img, ow, oh)
        return enc(out), ow, oh, True

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        outs, ows, ohs, flags = [], [], [], []
        for i in range(batch.num_rows):
            b, ow, oh, ok = self._resize_one(payloads[i].as_py())
            outs.append(b)
            ows.append(ow)
            ohs.append(oh)
            flags.append(ok)
        return (batch.set_column(batch.column_names.index("payload"),
                                 "payload",
                                 pa.array(outs, type=pa.large_binary()))
                .append_column("out_width",
                               pa.array(np.asarray(ows, dtype=np.int32)))
                .append_column("out_height",
                               pa.array(np.asarray(ohs, dtype=np.int32)))
                .append_column("resized", pa.array(flags)))


def synthesize_video(n: int, seed: int = 5) -> pa.Table:
    """Deterministic y4m video table (REAL decodable payloads): moving
    gradients, rotating 444/420 chroma, 4-16 frames each."""
    from whoosh_ray.functions.media import encode_y4m

    rng = np.random.default_rng(seed)
    payloads, widths, heights, nframes = [], [], [], []
    for i in range(n):
        w = int(rng.integers(4, 16)) * 2
        h = int(rng.integers(4, 16)) * 2
        nf = int(rng.integers(4, 17))
        gy, gx = np.mgrid[0:h, 0:w]
        frames = np.stack([np.stack([
            (gy * 8 + t * 16) % 256,
            (gx * 8 + t * 8) % 256,
            (gy + gx + t * 4) % 256], axis=2)
            for t in range(nf)]).astype(np.uint8)
        payloads.append(encode_y4m(frames,
                                   subsample=("444", "420")[i % 2]))
        widths.append(w)
        heights.append(h)
        nframes.append(nf)
    return pa.table({
        "item_id": pa.array(np.arange(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "mime": pa.array(["video/x-y4m"] * n),
        "width": pa.array(np.asarray(widths, dtype=np.int32)),
        "height": pa.array(np.asarray(heights, dtype=np.int32)),
        "n_frames": pa.array(np.asarray(nframes, dtype=np.int32)),
    })


class FrameSample:
    """Actor-pool stage: video payload -> one row PER SAMPLED FRAME
    (uniform, deterministic), each frame re-encoded as PNG.  The
    1-row-in / k-rows-out shape is the frame-sample pattern for
    training-data pipelines; non-video rows pass through untouched
    with frame_idx = -1."""

    def __init__(self, max_frames: int = 4):
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from whoosh_ray.functions.media import (MissingVideoCodec,
                                                decode_mp4, decode_y4m,
                                                encode_png, sniff_mime)

        ids, payloads, fidx = [], [], []
        for i in range(batch.num_rows):
            item = batch["item_id"][i].as_py()
            buf = batch["payload"][i].as_py()
            mime = sniff_mime(buf)
            if mime == "video/x-y4m":
                frames = decode_y4m(buf)
            elif mime == "video/mp4":
                try:
                    frames = decode_mp4(buf)
                except MissingVideoCodec:
                    # no backend in this env: structured pass-through,
                    # same shape as a non-video row
                    ids.append(item)
                    payloads.append(buf)
                    fidx.append(-1)
                    continue
            else:
                ids.append(item)
                payloads.append(buf)
                fidx.append(-1)
                continue
            take = np.unique(np.linspace(0, len(frames) - 1,
                                         min(self.max_frames, len(frames)),
                                         dtype=int))
            for t in take:
                ids.append(item)
                payloads.append(encode_png(frames[t]))
                fidx.append(int(t))
        return pa.table({
            "item_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(np.asarray(fidx, dtype=np.int32)),
            "payload": pa.array(payloads, type=pa.large_binary()),
        })


def sample_frames(ds: ray.data.Dataset, *, max_frames: int = 4,
                  concurrency: int = 2,
                  batch_size: int = 32) -> ray.data.Dataset:
    """Video -> frame rows, actor pool (decode state per actor)."""
    return ds.map_batches(FrameSample, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"max_frames": max_frames})


def extract_image_features(ds: ray.data.Dataset, *, concurrency: int = 4,
                           batch_size: int = 128) -> ray.data.Dataset:
    """The canonical multimodal pipeline shape: small batches, actor pool."""
    return ds.map_batches(MediaFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"backend": "numpy"})
