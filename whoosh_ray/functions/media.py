"""Pure-numpy media codecs: real decode kernels with no external libs.

The container has no pillow/ffmpeg, but several real formats are plain
structs + sample arrays, which numpy parses vectorized:

- WAV (RIFF/WAVE): PCM u8/s16/s32 and IEEE float32, any channel count
  (chunk walk + ``np.frombuffer``);
- PPM (P6 binary / P3 ascii) RGB images;
- BMP (Windows BITMAPINFOHEADER, 24-bit uncompressed BI_RGB,
  bottom-up or top-down, row padding);
- PNG (stdlib zlib inflate + numpy scanline unfilter: 8-bit
  gray/RGB/gray-alpha/RGBA, all five filters, multi-IDAT;
  palette/16-bit/Adam7 raise ValueError).

Plus real kernels over the decoded arrays: nearest-neighbor resize
(pure indexing), image statistics, and audio features (RMS,
zero-crossing rate, dominant frequency + banded spectrum via np.fft).
These power the multimodal actor-pool stages (pipelines/multimodal.py).
JPEG has a real pure-numpy codec (functions/jpeg.py); MP4 — the one
format that genuinely needs an external codec — is an
optional-backend facade (``decode_mp4``: PyAV if importable, else an
ffmpeg binary on PATH, else a structured ``MissingVideoCodec``).
"""

from __future__ import annotations

import struct

import numpy as np


# ---- WAV ----

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] (n,) or (n, ch) -> 16-bit PCM WAV."""
    s = np.atleast_2d(np.asarray(samples, dtype=np.float64))
    if s.shape[0] < s.shape[1] and s.ndim == 2 and s.shape[0] <= 8:
        pass  # (ch, n) given?  require (n, ch): fallthrough below
    if s.shape[0] == 1:
        s = s.T
    n, ch = s.shape
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.reshape(-1).tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = (b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate,
                                 byte_rate, ch * 2, 16))
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples (n, ch) in [-1, 1], sample_rate)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
                 - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = (np.frombuffer(data, dtype="<i4").astype(np.float32)
                 / 2147483648.0)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format code {audio_format}")
    n = len(x) // ch
    return x[: n * ch].reshape(n, ch), rate


def audio_features(samples: np.ndarray, rate: int,
                   n_bands: int = 8) -> np.ndarray:
    """Real DSP features: [duration_sec, rms, zero_crossing_rate,
    dominant_freq_hz, band_energy_0..n-1] (float32)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return np.zeros(4 + n_bands, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono ** 2)))
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    dom = float(freqs[int(np.argmax(spec[1:])) + 1]) if len(spec) > 1 else 0.0
    edges = np.linspace(0, len(spec), n_bands + 1).astype(int)
    band = np.asarray([spec[a:b].sum() for a, b in zip(edges[:-1], edges[1:])],
                      dtype=np.float64)
    tot = band.sum() or 1.0
    out = np.concatenate(([n / rate, rms, zc, dom], band / tot))
    return out.astype(np.float32)


# ---- PPM ----

def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary P6 PPM."""
    h, w, c = img.shape
    assert c == 3
    return (f"P6\n{w} {h}\n255\n".encode()
            + np.ascontiguousarray(img, dtype=np.uint8).tobytes())


def decode_ppm(buf: bytes) -> np.ndarray:
    """P6 (binary) or P3 (ascii) PPM -> uint8 (h, w, 3)."""
    if not buf.startswith((b"P6", b"P3")):
        raise ValueError("not a PPM stream")
    binary = buf.startswith(b"P6")
    # header: magic, width, height, maxval — comments (#...) allowed
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    w, h, maxval = fields
    pos += 1  # single whitespace after maxval
    if binary:
        raw = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    else:
        raw = np.array(buf[pos:].split(), dtype=np.int64)[: w * h * 3]
    img = raw.reshape(h, w, 3).astype(np.float64)
    if maxval != 255:
        img = img * (255.0 / maxval)
    return np.round(img).astype(np.uint8)


# ---- BMP (24-bit uncompressed) ----

def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit bottom-up BI_RGB BMP."""
    h, w, _ = img.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    bgr = img[:, :, ::-1]
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + b"\x00" * pad
    data = bytes(body)
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                            2835, 2835, 0, 0))
    return header + data


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> uint8 (h, w, 3) RGB (handles bottom-up
    and top-down rows + padding)."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (off,) = struct.unpack_from("<I", buf, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bits = struct.unpack_from("<HH", buf, 26)
    (compression,) = struct.unpack_from("<I", buf, 30)
    if bits != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bits}-bit compression="
                         f"{compression}")
    topdown = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not topdown:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---- PNG (stdlib zlib + numpy unfilter; 8-bit gray/RGB/RGBA) ----

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only; palette unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA -> PNG
    (8-bit, non-interlaced, filter 0 rows, one IDAT)."""
    import zlib

    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # prepend filter byte 0 to every scanline, one vectorized hstack
    raw = np.hstack([np.zeros((h, 1), np.uint8),
                     a.reshape(h, w * ch)]).tobytes()
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def _png_unfilter(ftype: int, cur: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """One scanline: filtered bytes -> reconstructed bytes (uint8).

    Up (2) is fully vectorized; Sub/Average/Paeth carry an intra-row
    recurrence, resolved with a per-column loop over ``bpp``-wide lanes
    (row width iterations of tiny numpy ops — fine for the actor-pool
    batch sizes these stages run at)."""
    cur = cur.astype(np.int32)
    prev = prev.astype(np.int32)
    n = len(cur)
    if ftype == 0:                       # None
        return cur.astype(np.uint8)
    if ftype == 2:                       # Up
        return ((cur + prev) & 0xFF).astype(np.uint8)
    out = np.zeros(n, np.int32)
    if ftype == 1:                       # Sub
        out[:bpp] = cur[:bpp]
        for x in range(bpp, n, bpp):
            e = min(x + bpp, n)
            out[x:e] = (cur[x:e] + out[x - bpp:x - bpp + (e - x)]) & 0xFF
        return out.astype(np.uint8)
    if ftype == 3:                       # Average
        out[:bpp] = (cur[:bpp] + prev[:bpp] // 2) & 0xFF
        for x in range(bpp, n, bpp):
            e = min(x + bpp, n)
            left = out[x - bpp:x - bpp + (e - x)]
            out[x:e] = (cur[x:e] + (left + prev[x:e]) // 2) & 0xFF
        return out.astype(np.uint8)
    if ftype == 4:                       # Paeth
        out[:bpp] = (cur[:bpp] + prev[:bpp]) & 0xFF
        for x in range(bpp, n, bpp):
            e = min(x + bpp, n)
            a = out[x - bpp:x - bpp + (e - x)]
            b = prev[x:e]
            c = prev[x - bpp:x - bpp + (e - x)]
            p = a + b - c
            pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                            np.where(pb <= pc, b, c))
            out[x:e] = (cur[x:e] + pred) & 0xFF
        return out.astype(np.uint8)
    raise ValueError(f"bad PNG filter type {ftype}")


def decode_png(buf: bytes) -> np.ndarray:
    """PNG -> uint8 array: (h, w) for grayscale, (h, w, ch) otherwise.

    Supports 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha,
    RGBA), non-interlaced, all five scanline filters, multi-IDAT.
    Palette (type 3), 16-bit and Adam7 raise ValueError."""
    import zlib

    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    idat = bytearray()
    w = h = depth = color = interlace = None
    while pos + 8 <= len(buf):
        (size,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + size]
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + size
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or color not in _PNG_CHANNELS or interlace:
        raise ValueError(f"unsupported PNG: depth={depth} color={color} "
                         f"interlace={interlace}")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        out[y] = _png_unfilter(int(rows[y, 0]), rows[y, 1:], prev, ch)
        prev = out[y]
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


# ---- kernels over decoded arrays ----

def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize by pure index math."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // max(out_h, 1), h - 1)
    xs = np.minimum((np.arange(out_w) * w) // max(out_w, 1), w - 1)
    return img[ys[:, None], xs[None, :]]


def image_features(img: np.ndarray, hist_bins: int = 8) -> np.ndarray:
    """[w, h, mean_r, mean_g, mean_b, std_r, std_g, std_b,
    luma_hist_0..n-1] (float32)."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3).astype(np.float64)
    mean = flat.mean(axis=0)
    std = flat.std(axis=0)
    luma = flat @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=hist_bins, range=(0, 256))
    hist = hist / (hist.sum() or 1.0)
    return np.concatenate(([w, h], mean, std, hist)).astype(np.float32)


# ---- video: YUV4MPEG2 (y4m) — a real, fully-decodable plain container


def _rgb_to_yuv(frames: np.ndarray):
    f = frames.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return (np.clip(np.round(y), 0, 255).astype(np.uint8),
            np.clip(np.round(u), 0, 255).astype(np.uint8),
            np.clip(np.round(v), 0, 255).astype(np.uint8))


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
               subsample: str = "444") -> bytes:
    """(n, H, W, 3) uint8 RGB -> YUV4MPEG2 bytes (C444 or C420jpeg).
    Deterministic; 4:2:0 chroma is a 2x2 mean (even dims required)."""
    n, h, w = frames.shape[:3]
    y, u, v = _rgb_to_yuv(frames)
    if subsample == "420":
        if h % 2 or w % 2:
            raise ValueError("4:2:0 y4m needs even dimensions")
        u = u.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        v = v.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        u = np.clip(np.round(u), 0, 255).astype(np.uint8)
        v = np.clip(np.round(v), 0, 255).astype(np.uint8)
        ctag = "420jpeg"
    elif subsample == "444":
        ctag = "444"
    else:
        raise ValueError(subsample)
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{ctag}\n"
        .encode())
    for i in range(n):
        out += b"FRAME\n"
        out += y[i].tobytes() + u[i].tobytes() + v[i].tobytes()
    return bytes(out)


def decode_y4m(buf: bytes) -> np.ndarray:
    """YUV4MPEG2 bytes -> (n, H, W, 3) uint8 RGB.  C444 / C420*."""
    nl = buf.index(b"\n")
    header = buf[:nl].decode("ascii", "replace").split(" ")
    if header[0] != "YUV4MPEG2":
        raise ValueError("not a y4m stream")
    w = h = None
    ctag = "420jpeg"  # the y4m default when no C tag present
    for tok in header[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C"):
            ctag = tok[1:]
    if not w or not h:
        raise ValueError("y4m header missing dimensions")
    if ctag.startswith("420"):
        cw, ch = w // 2, h // 2
    elif ctag == "444":
        cw, ch = w, h
    else:
        raise NotImplementedError(f"y4m chroma {ctag!r}")
    fsize = h * w + 2 * cw * ch
    pos = nl + 1
    frames = []
    while pos < len(buf):
        fl = buf.index(b"\n", pos)  # FRAME line (may carry params)
        if not buf[pos:fl].startswith(b"FRAME"):
            raise ValueError("bad y4m frame marker")
        pos = fl + 1
        raw = np.frombuffer(buf[pos: pos + fsize], dtype=np.uint8)
        pos += fsize
        y = raw[: h * w].reshape(h, w).astype(np.float64)
        u = raw[h * w: h * w + cw * ch].reshape(ch, cw).astype(np.float64)
        v = raw[h * w + cw * ch:].reshape(ch, cw).astype(np.float64)
        if ctag.startswith("420"):
            u = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
            v = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
        u -= 128.0
        v -= 128.0
        r = y + 1.402 * v
        g = y - 0.344136 * u - 0.714136 * v
        b = y + 1.772 * u
        frames.append(np.clip(np.round(np.stack([r, g, b], axis=2)),
                              0, 255).astype(np.uint8))
    return np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8)


class MissingVideoCodec(NotImplementedError):
    """No MP4 decode backend is available in this environment (neither
    PyAV nor an ffmpeg binary).  Callers treat this as a STRUCTURED
    fallback signal — the in-container real video codec is Y4M."""


_MP4_UNRESOLVED = object()
_MP4_BACKEND = _MP4_UNRESOLVED


def mp4_backend():
    """Resolve the optional MP4 decode backend once per process —
    the PyStemmerFilter C-ext-if-importable pattern: ("pyav", module)
    if the ``av`` package imports, else ("ffmpeg", path) if an ffmpeg
    binary is on PATH, else None."""
    global _MP4_BACKEND
    if _MP4_BACKEND is _MP4_UNRESOLVED:
        try:
            import av  # noqa: F401  (not in this container; facade)
            _MP4_BACKEND = ("pyav", av)
        except ImportError:
            import shutil

            p = shutil.which("ffmpeg")
            _MP4_BACKEND = ("ffmpeg", p) if p else None
    return _MP4_BACKEND


def decode_mp4(buf: bytes) -> np.ndarray:
    """MP4/containerized video -> (n, h, w, 3) uint8 RGB frames via the
    optional external backend (``mp4_backend``).  Raises
    MissingVideoCodec when no backend exists; MediaFeatures/FrameSample
    catch it and degrade gracefully (fallback features / row
    pass-through) instead of failing the pipeline."""
    be = mp4_backend()
    if be is None:
        raise MissingVideoCodec(
            "no MP4 decode backend: install the 'av' package or put an "
            "ffmpeg binary on PATH (the in-container video codec is Y4M)")
    kind, handle = be
    if kind == "pyav":
        import io

        frames = []
        with handle.open(io.BytesIO(buf)) as container:
            for frame in container.decode(video=0):
                frames.append(frame.to_ndarray(format="rgb24"))
        if not frames:
            raise ValueError("mp4: no video frames")
        return np.stack(frames)
    # ffmpeg binary: ffprobe the dimensions, then rawvideo-pipe frames
    import json
    import os
    import shutil
    import subprocess
    import tempfile

    probe = shutil.which("ffprobe")
    if probe is None:
        raise MissingVideoCodec("ffmpeg present but ffprobe missing: "
                                "cannot size the raw frame stream")
    fd, path = tempfile.mkstemp(suffix=".mp4")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(buf)
        meta = json.loads(subprocess.run(
            [probe, "-v", "error", "-select_streams", "v:0",
             "-show_entries", "stream=width,height", "-of", "json", path],
            capture_output=True, check=True).stdout)
        st = meta["streams"][0]
        w, h = int(st["width"]), int(st["height"])
        raw = subprocess.run(
            [handle, "-v", "error", "-i", path, "-f", "rawvideo",
             "-pix_fmt", "rgb24", "-"],
            capture_output=True, check=True).stdout
        n = len(raw) // (w * h * 3)
        if n == 0:
            raise ValueError("mp4: no video frames")
        return (np.frombuffer(raw[:n * w * h * 3], dtype=np.uint8)
                .reshape(n, h, w, 3).copy())
    finally:
        os.unlink(path)


def sniff_mime(buf: bytes) -> str:
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "audio/wav"
    if buf[:2] in (b"P6", b"P3"):
        return "image/x-portable-pixmap"
    if buf[:2] == b"BM":
        return "image/bmp"
    if buf[:8] == _PNG_SIG:
        return "image/png"
    if buf[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if buf[:9] == b"YUV4MPEG2":
        return "video/x-y4m"
    if len(buf) >= 12 and buf[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"
