"""Pipeline ops: sessionize, tumbling windows, IVF knn, multimodal stubs,
dedup building blocks — functional tests (SQL-oracle checks run via
scripts/check_oracle.py / the driver)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def test_sessionize_gaps():
    from whoosh_ray.pipelines.events import sessionize

    base = 1_700_000_000_000_000
    rows = []
    for u, offsets in [(1, [0, 60, 120, 7200, 7260]),  # gap at 2h
                       (2, [0, 30 * 60 + 1])]:         # just over the gap
        for o in offsets:
            rows.append({"user_id": u, "ts": base + o * 1_000_000,
                         "value": 1.0})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = sessionize(ds).to_pandas().sort_values(
        ["user_id", "session"]).reset_index(drop=True)
    assert out[out.user_id == 1]["n_events"].tolist() == [3, 2]
    assert out[out.user_id == 2]["n_events"].tolist() == [1, 1]


def test_tumbling_windows():
    from whoosh_ray.pipelines.events import tumbling_window_counts

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = tumbling_window_counts(ds).to_pandas()
    assert out["n"].sum() == 1000
    assert (out["n"] > 0).all()


def test_knn_ivf_recall():
    from whoosh_ray.pipelines.knn import knn_bruteforce, knn_ivf

    import pyarrow.parquet as pq

    emb = "/root/testdata/sf0.01/embeddings.parquet"
    head = pq.read_table(emb).slice(0, 8)
    qids = head["vec_id"].to_numpy()
    qmat = np.array(head["embedding"].to_pylist(), dtype=np.float64)
    ds = ray.data.read_parquet(emb)
    exact = knn_bruteforce(ds, qids, qmat, k=10)
    approx = knn_ivf(ds, qids, qmat, k=10, nlist=16, nprobe=8)
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    assert np.mean(recalls) >= 0.8, recalls


def test_multimodal_real_decode():
    from whoosh_ray.pipelines.multimodal import (FEATURE_DIM, MediaFeatures,
                                                 Resize,
                                                 extract_image_features,
                                                 synthesize_media)

    t = synthesize_media(64)
    ds = ray.data.from_arrow(t)
    out = extract_image_features(ds, concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 64
    assert all(len(f) == FEATURE_DIM for f in out["features"])
    # 5 of every 6 rows (ppm/bmp/wav/png/jpeg) really decode; the
    # octet-stream rows take the documented fallback
    assert out["decoded"].sum() == 53
    # determinism across runs
    out2 = extract_image_features(ray.data.from_arrow(t),
                                  concurrency=2, batch_size=16).to_pandas()
    a = np.array(list(out.sort_values("item_id")["features"]))
    b = np.array(list(out2.sort_values("item_id")["features"]))
    np.testing.assert_array_equal(a, b)
    # real pixel resize for decodable images, passthrough otherwise
    r = ds.map_batches(Resize(max_side=16), batch_format="pyarrow",
                       batch_size=16).to_pandas()
    resized = r[r["resized"]]
    assert len(resized) == 42  # the ppm + bmp + png + jpeg rows
    assert (np.maximum(resized["out_width"], resized["out_height"]) <= 16).all()
    # the resized payloads really decode to the new dims, in every format
    from whoosh_ray.functions import media as M
    from whoosh_ray.functions.jpeg import decode_jpeg

    decoders = {"image/x-portable-pixmap": M.decode_ppm,
                "image/bmp": M.decode_bmp, "image/png": M.decode_png,
                "image/jpeg": decode_jpeg}
    seen = set()
    for _, row in resized.iterrows():
        mime = M.sniff_mime(row["payload"])
        img = decoders[mime](row["payload"])
        assert img.shape[:2] == (row["out_height"], row["out_width"])
        seen.add(mime)
    assert seen == set(decoders)
    # MP4/video stays an explicit stub under on_unknown="error"
    mf = MediaFeatures(on_unknown="error")
    with pytest.raises(NotImplementedError):
        mf._features(b"\x00\x00\x00\x18ftypisom fake mp4 box")


def test_media_codecs_roundtrip():
    from whoosh_ray.functions import media as M

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    np.testing.assert_array_equal(M.decode_ppm(M.encode_ppm(img)), img)
    np.testing.assert_array_equal(M.decode_bmp(M.encode_bmp(img)), img)
    # P3 ascii ppm with comments
    ascii_ppm = b"P3\n# comment\n2 2\n255\n1 2 3 4 5 6\n7 8 9 10 11 12\n"
    np.testing.assert_array_equal(
        M.decode_ppm(ascii_ppm),
        np.arange(1, 13, dtype=np.uint8).reshape(2, 2, 3))
    # wav roundtrip + dominant frequency recovery
    rate = 8000
    t = np.arange(rate) / rate
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    samples, r2 = M.decode_wav(M.encode_wav(tone, rate))
    assert r2 == rate and samples.shape == (rate, 1)
    np.testing.assert_allclose(samples[:, 0], tone, atol=1.5e-4)
    feats = M.audio_features(samples, rate)
    assert abs(feats[3] - 440.0) < 2.0  # dominant_freq_hz
    assert abs(feats[0] - 1.0) < 1e-6   # duration
    # nearest resize exact on an axis-aligned gradient
    grad = np.repeat(np.arange(16, dtype=np.uint8)[None, :, None] * 16,
                     8, axis=0).repeat(3, axis=2)
    small = M.resize_nearest(grad, 4, 2)
    assert small.shape == (2, 4, 3)
    np.testing.assert_array_equal(small[0, :, 0], grad[0, [0, 4, 8, 12], 0])


def test_png_codec():
    from whoosh_ray.functions import media as M

    rng = np.random.default_rng(7)
    # roundtrip every supported plane layout
    for shape in [(13, 17, 3), (9, 5, 4), (11, 23)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        buf = M.encode_png(img)
        assert M.sniff_mime(buf) == "image/png"
        np.testing.assert_array_equal(M.decode_png(buf), img)

    # decode of FOREIGN filter choices: build an IDAT whose rows use
    # filters 1-4, filtering each scanline with a straightforward
    # reference implementation, and assert the unfilter recovers pixels
    import struct as st
    import zlib

    img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    h, w, ch = img.shape
    flat = img.reshape(h, w * ch).astype(np.int32)
    lines = []
    prev = np.zeros(w * ch, np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4, 1]):
        cur = flat[y]
        left = np.zeros(w * ch, np.int32)
        left[ch:] = cur[:-ch]
        upleft = np.zeros(w * ch, np.int32)
        upleft[ch:] = prev[:-ch]
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - (left + prev) // 2
        else:  # paeth
            p = left + prev - upleft
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - upleft)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = cur - pred
        lines.append(bytes([ftype]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = (M._PNG_SIG + M._png_chunk(b"IHDR", ihdr)
           # split across two IDAT chunks to exercise reassembly
           + M._png_chunk(b"IDAT", zlib.compress(b"".join(lines))[:10])
           + M._png_chunk(b"IDAT", zlib.compress(b"".join(lines))[10:])
           + M._png_chunk(b"IEND", b""))
    np.testing.assert_array_equal(M.decode_png(buf), img)

    # unsupported shapes are explicit errors, not wrong pixels
    pal_ihdr = st.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    bad = (M._PNG_SIG + M._png_chunk(b"IHDR", pal_ihdr)
           + M._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        M.decode_png(bad)
    with pytest.raises(ValueError):
        M.decode_png(b"not a png")


def test_simhash_near_dup_hamming():
    from whoosh_ray.pipelines.dedup import SimHasher

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "spark table merge join window hash key value scan filter",
            "spark table merge join window hash key value scan filters",
            "completely different content about nothing at all whatsoever",
        ]),
    })
    out = ray.data.from_arrow(docs).map_batches(
        SimHasher(), batch_format="pyarrow").to_pandas()
    h = out.sort_values("doc_id")["simhash"].to_numpy().astype(np.uint64)
    d01 = bin(int(h[0]) ^ int(h[1])).count("1")
    d02 = bin(int(h[0]) ^ int(h[2])).count("1")
    assert d01 < d02


def test_minhash_empty_doc_bucket_guard():
    """VERDICT r1 #2: 10k shingle-less docs must not form a degenerate
    O(n^2) LSH bucket; completes fast with no bogus pairs."""
    from whoosh_ray.pipelines.dedup import minhash_candidate_pairs, verify_jaccard

    n = 10_000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n + 2), type=pa.int64()),
        "text": pa.array([""] * n + ["alpha beta gamma delta epsilon"] * 2),
    })
    ds = ray.data.from_arrow(tbl)
    cand = minhash_candidate_pairs(ds).to_pandas()
    assert len(cand) == 1
    assert sorted(cand.iloc[0].tolist()) == [n, n + 1]
    ver = verify_jaccard(ds, cand, threshold=0.5)
    assert len(ver) == 1 and ver["jaccard"].iloc[0] == 1.0


def test_verify_jaccard_matches_exact_sets():
    """The distributed verify must equal a naive per-pair set Jaccard."""
    import pandas as pd

    from whoosh_ray.functions.analysis import STANDARD, VectorAnalyzer
    from whoosh_ray.pipelines.dedup import verify_jaccard

    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy cat tonight",
        "completely different content about ray data pipelines here",
        "completely different content about ray data engines here",
        "unrelated words entirely",
    ]
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    pairs = pd.DataFrame({"doc_a": [0, 2, 0], "doc_b": [1, 3, 4]})
    got = verify_jaccard(ds, pairs, threshold=0.05)
    ana = VectorAnalyzer(STANDARD)

    def sset(t):
        toks = ana.token_lists([t])[0]
        return {" ".join(toks[i:i+3]) for i in range(len(toks) - 2)}

    for _, row in got.iterrows():
        sa, sb = sset(texts[int(row.doc_a)]), sset(texts[int(row.doc_b)])
        expect = len(sa & sb) / len(sa | sb)
        assert abs(row.jaccard - expect) < 1e-12
    # pair (0,4) shares nothing -> absent
    assert not ((got.doc_a == 0) & (got.doc_b == 4)).any()
    assert ((got.doc_a == 0) & (got.doc_b == 1)).any()


def test_verify_jaccard_distributed_matches_broadcast():
    """VERDICT r4 #1: a pair set larger than ``max_driver_pairs`` never
    reaches the driver — the verify runs as hash joins with the pairs a
    Dataset end-to-end, and values equal the broadcast path exactly."""
    import pandas as pd

    from whoosh_ray.pipelines.dedup import verify_jaccard

    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy cat tonight",
        "completely different content about ray data pipelines here",
        "completely different content about ray data engines here",
        "unrelated words entirely",
    ]
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    pairs = pd.DataFrame({"doc_a": [0, 2, 0, 1], "doc_b": [1, 3, 4, 2]})
    want = (verify_jaccard(ds, pairs, threshold=0.05)
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    # duplicate pair rows (as LSH cross-band emission produces): the
    # distributed distinct must collapse them
    dup = pd.concat([pairs, pairs.iloc[[0, 2]]], ignore_index=True)
    got = verify_jaccard(ds, ray.data.from_pandas(dup), threshold=0.05,
                         max_driver_pairs=1)
    assert isinstance(got, ray.data.Dataset)
    gdf = (got.to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    assert gdf[["doc_a", "doc_b"]].values.tolist() == \
        want[["doc_a", "doc_b"]].values.tolist()
    np.testing.assert_array_equal(gdf["jaccard"].to_numpy(),
                                  want["jaccard"].to_numpy())


def test_sessionize_bucket_stitching_and_skew():
    """Two-level sessionize: sessions crossing bucket boundaries must
    stitch exactly; a hot key's events never form one giant group."""
    import pandas as pd

    from whoosh_ray.pipelines.events import sessionize

    MIN = 60_000_000  # 1 min in us
    rows = []
    # bot: event every 10 min for 30 hours -> ONE session spanning many
    # 1-hour buckets
    for i in range(180):
        rows.append(("bot", i * 10 * MIN, 1.0))
    # user: two sessions, the first crossing an hour boundary
    rows.append(("u1", 55 * MIN, 2.0))
    rows.append(("u1", 65 * MIN, 3.0))   # 10 min gap -> same session
    rows.append(("u1", 200 * MIN, 4.0))  # 135 min gap -> new session
    base = pd.Timestamp("2024-01-01").value // 1000
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([base + r[1] for r in rows],
                       type=pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows]),
    })
    ds = ray.data.from_arrow(tbl)
    out = sessionize(ds, bucket_us=3_600_000_000).to_pandas()
    out = out.sort_values(["user_id", "session"]).reset_index(drop=True)
    bot = out[out.user_id == "bot"]
    assert len(bot) == 1
    assert int(bot.n_events.iloc[0]) == 180
    u1 = out[out.user_id == "u1"]
    assert len(u1) == 2
    assert u1.n_events.tolist() == [2, 1]
    assert u1.sum_value.tolist() == [5.0, 4.0]


def test_knn_ivf_codebook_deterministic(tmp_path):
    """The codebook sample is content-keyed (splitmix64 fold of the
    embedding bytes), so two builds over the same corpus produce
    IDENTICAL centroids regardless of block order or scheduling —
    ray random_sample(seed=)'s per-task streams did not guarantee that
    and made IVF recall flap between runs."""
    from whoosh_ray.pipelines.knn import ivf_build

    emb = "/root/testdata/sf0.01/embeddings.parquet"
    a = ivf_build(ray.data.read_parquet(emb), str(tmp_path / "a"),
                  nlist=8)
    b = ivf_build(ray.data.read_parquet(emb, override_num_blocks=7),
                  str(tmp_path / "b"), nlist=8)
    assert np.array_equal(a, b)


def test_knn_ivf_io_pruning(tmp_path):
    """The IVF query must READ only the probed bucket partitions —
    bytes_probed ≈ nprobe/nlist of the corpus (VERDICT r1 #3)."""
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.knn import ivf_build, knn_ivf_query

    emb = "/root/testdata/sf0.01/embeddings.parquet"
    head = pq.read_table(emb).slice(0, 4)
    qids = head["vec_id"].to_numpy()
    qmat = np.array(head["embedding"].to_pylist(), dtype=np.float64)
    ivf_dir = str(tmp_path / "ivf")
    ivf_build(ray.data.read_parquet(emb), ivf_dir, nlist=16)
    out, io_stats = knn_ivf_query(ivf_dir, qids, qmat, k=10, nprobe=2)
    assert len(out) > 0
    assert io_stats["bytes_total"] > 0
    # 4 queries x 2 probes <= 8 of 16 buckets; sizes vary, so just
    # assert a real reduction
    assert io_stats["fraction"] <= 0.75, io_stats


def test_knn_ivf_recall_on_cluster_sorted_corpus(tmp_path):
    """VERDICT r2 #6: the codebook sample must be random — on a corpus
    SORTED by cluster, a head sample only sees the first clusters and
    recall quietly collapses for queries from the rest."""
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.knn import knn_bruteforce, knn_ivf

    rng = np.random.default_rng(5)
    k_clusters, per, dim = 12, 600, 16
    centers = rng.normal(size=(k_clusters, dim)) * 6.0
    rows = np.concatenate([
        centers[c] + rng.normal(scale=0.4, size=(per, dim))
        for c in range(k_clusters)])          # cluster-sorted on purpose
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(rows)), type=pa.int64()),
        "embedding": pa.array(list(rows), type=pa.list_(pa.float64())),
    })
    path = str(tmp_path / "emb.parquet")
    pq.write_table(tbl, path)

    # queries drawn from the LAST clusters (unseen by a head sample)
    qidx = np.arange(len(rows) - 5 * per, len(rows), per) + 3
    qids = qidx.astype(np.int64)
    qmat = rows[qidx]
    ds = ray.data.read_parquet(path)
    exact = knn_bruteforce(ds, qids, qmat, k=10)
    approx = knn_ivf(ds, qids, qmat, k=10, nlist=16, nprobe=6,
                     sample_size=1024)
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    assert np.mean(recalls) >= 0.8, recalls


def test_term_stats_sink_above_bound(ray_session, tmp_path):
    """Lexicon-sized aggregates stream to parquet instead of the driver
    heap: above max_driver_rows (forced tiny here) the API returns a
    Dataset over the sink files with identical contents."""
    import os

    import pyarrow as pa
    import ray.data

    from whoosh_ray.pipelines.ir import documents_searcher, term_stats_table

    s = documents_searcher("/root/testdata/sf0.001")
    small = term_stats_table(s)  # driver-sized: a pa.Table
    assert isinstance(small, pa.Table)

    sink = str(tmp_path / "lexicon")
    big = term_stats_table(s, max_driver_rows=10, sink_path=sink)
    assert isinstance(big, ray.data.Dataset)
    assert os.path.isdir(sink) and any(
        f.endswith(".parquet") for f in os.listdir(sink))
    got = big.to_pandas().sort_values("term").reset_index(drop=True)
    want = small.to_pandas().sort_values("term").reset_index(drop=True)
    assert got.equals(want)

    # auto-bound path (no sink given): still a Dataset above the bound
    auto = term_stats_table(s, max_driver_rows=10)
    assert isinstance(auto, ray.data.Dataset)
    assert auto.count() == len(want)


def test_y4m_video_roundtrip_and_frame_sample(ray_session):
    """Real y4m decode: roundtrip fidelity, FrameSample actor-pool
    fan-out (1 video row -> k PNG frame rows), and MediaFeatures over
    video payloads."""
    from whoosh_ray.functions import media as M
    from whoosh_ray.pipelines.multimodal import (MediaFeatures,
                                                 sample_frames,
                                                 synthesize_video)

    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (5, 12, 16, 3), dtype=np.uint8)
    # 4:4:4 roundtrips near-exactly (only YUV<->RGB rounding)
    out = M.decode_y4m(M.encode_y4m(frames, subsample="444"))
    assert out.shape == frames.shape
    assert np.abs(out.astype(int) - frames.astype(int)).max() <= 2
    # 4:2:0 is lossy in chroma but luma-faithful on unclipped content
    gy, gx = np.mgrid[0:12, 0:16]
    smooth = np.stack([np.stack([gy * 10 + 60, gx * 8 + 50,
                                 gy * 4 + gx * 4 + 40], axis=2)
                       for _ in range(3)]).astype(np.uint8)
    out420 = M.decode_y4m(M.encode_y4m(smooth, subsample="420"))
    luma = lambda f: f.astype(float) @ np.array([0.299, 0.587, 0.114])
    assert np.abs(luma(out420) - luma(smooth)).max() < 3
    assert M.sniff_mime(M.encode_y4m(frames)) == "video/x-y4m"

    t = synthesize_video(12)
    ds = ray.data.from_arrow(t)
    fr = sample_frames(ds, max_frames=4, concurrency=2,
                       batch_size=8).to_pandas()
    nf = t["n_frames"].to_numpy()
    expected = sum(min(4, int(k)) for k in nf)
    assert len(fr) == expected
    assert (fr["frame_idx"] >= 0).all()
    # every sampled frame is a real PNG of the source dims
    one = fr.iloc[0]
    img = M.decode_png(one["payload"])
    row = t.to_pandas().set_index("item_id").loc[one["item_id"]]
    assert img.shape[:2] == (row["height"], row["width"])

    mf = MediaFeatures()
    feats, decoded = mf._features(t["payload"][0].as_py())
    assert decoded and np.isfinite(feats).all() and feats.any()


def test_mp4_facade_structured_fallback(monkeypatch):
    """MP4 decode is an optional-backend facade (VERDICT r4 #7): with
    neither PyAV nor ffmpeg in the container the stages degrade
    gracefully (fallback features / row pass-through), and a backend
    (monkeypatched here) flows through the same code path."""
    from whoosh_ray.functions import media
    from whoosh_ray.pipelines.multimodal import FrameSample, MediaFeatures

    fake_mp4 = b"\x00\x00\x00\x18ftypisom" + bytes(64)
    assert media.sniff_mime(fake_mp4) == "video/mp4"
    assert media.mp4_backend() is None  # this container has no backend
    with pytest.raises(media.MissingVideoCodec):
        media.decode_mp4(fake_mp4)

    batch = pa.table({
        "item_id": pa.array([7], type=pa.int64()),
        "payload": pa.array([fake_mp4], type=pa.large_binary()),
    })
    out = MediaFeatures(on_unknown="fake")(batch)
    assert out["decoded"].to_pylist() == [False]
    assert len(out["features"][0].as_py()) > 0
    with pytest.raises(media.MissingVideoCodec):
        MediaFeatures(on_unknown="error")(batch)

    fs = FrameSample(max_frames=4)
    res = fs(batch)
    assert res["frame_idx"].to_pylist() == [-1]
    assert res["payload"][0].as_py() == fake_mp4

    # with a backend, the SAME payload decodes through the y4m-shared
    # sampling path
    gy, gx = np.mgrid[0:6, 0:8]
    frames = np.stack([np.stack([(gy * 9 + t) % 256, (gx * 7) % 256,
                                 (gy + gx + t) % 256], axis=2)
                       for t in range(6)]).astype(np.uint8)
    monkeypatch.setattr(media, "decode_mp4", lambda b: frames)
    res2 = fs(batch)
    assert res2["frame_idx"].to_pylist() == [0, 1, 3, 5]
    feats, decoded = MediaFeatures(on_unknown="error")._features(fake_mp4)
    assert decoded and np.isfinite(feats).all()


def test_embed_keys_empty_batch():
    """ADVICE r4: ray can deliver empty blocks; _embed_keys must not
    IndexError on shape-(0,) input, and an ivf_build whose block count
    exceeds the row count must still work."""
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.knn import _embed_keys, ivf_build

    out = _embed_keys(np.array([]))
    assert out.dtype == np.uint64 and len(out) == 0
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    rows = pq.read_table(emb).slice(0, 5)
    ds = ray.data.from_arrow(rows).repartition(16)  # most blocks empty
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        cents = ivf_build(ds, d, nlist=2, sample_size=64)
        assert cents.shape[0] == 2


def test_verify_distributed_empty_and_disjoint_pairs():
    """_staged_join edge paths: an empty candidate-pair Dataset and a
    pair set referencing docs with no shingles must both come back as
    EMPTY results with the correct schema (the driver-side empty-join
    short-circuit), not crash on columnless partitions."""
    import pandas as pd

    from whoosh_ray.pipelines.dedup import verify_jaccard_distributed

    tbl = pa.table({
        "doc_id": pa.array(np.arange(3), type=pa.int64()),
        "text": pa.array(["alpha beta gamma delta", "x", "y"]),
    })
    ds = ray.data.from_arrow(tbl)
    empty_pairs = ray.data.from_pandas(
        pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                      "doc_b": pd.Series([], dtype=np.int64)}))
    out = verify_jaccard_distributed(ds, empty_pairs)
    # NB to_pandas() on an all-empty-blocks Dataset returns a
    # COLUMNLESS frame (Ray quirk) — assert on the Dataset schema
    assert out.schema().names == ["doc_a", "doc_b", "jaccard"]
    assert out.count() == 0
    # docs 1 and 2 are single-token (< k=3 shingles): the semi-join
    # leaves no shingle rows, so the verify short-circuits empty too
    disjoint = ray.data.from_pandas(
        pd.DataFrame({"doc_a": [1], "doc_b": [2]}))
    out2 = verify_jaccard_distributed(ds, disjoint)
    assert out2.schema().names == ["doc_a", "doc_b", "jaccard"]
    assert out2.count() == 0
