"""Deduplication pipelines over a document table (training-data ops).

All are Ray Data pipelines over Arrow batches:

- exact: content-hash in a vectorized map_batches, then one
  groupby(hash) keeping the smallest doc_id (hash-partitioned; the
  reference's update_document/unique-key upsert analogue,
  /root/reference/src/whoosh/writing.py:426-489).
- minhash-LSH: shingle -> 64 minhashes -> band buckets -> groupby
  (band, bucket) emits candidate pairs -> verified n-gram Jaccard.
- simhash: 64-bit simhash fingerprint per doc (the reference ships an
  unused simhash utility, classify.py:216-263 — here it is a first-class
  batch op).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from whoosh_ray.functions.analysis import STANDARD, VectorAnalyzer

# 64 independent universal-hash functions over a 61-bit Mersenne prime.
_MERSENNE = (1 << 61) - 1
_N_HASH = 64
_BANDS = 16  # 16 bands x 4 rows


def _hash_params(seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, _N_HASH, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, _N_HASH, dtype=np.int64)
    return a, b


def _shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """Stable 64-bit hashes of k-token shingles (pandas hash_array — a
    keyed SipHash, deterministic across processes unlike Python's hash())."""
    if len(tokens) < k:
        shingles = [" ".join(tokens)] if tokens else []
    else:
        shingles = [" ".join(tokens[i: i + k]) for i in range(len(tokens) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(shingles, dtype=object))


class ExactHash:
    """map_batches: add a deterministic content hash of the text column."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        hashes = [hashlib.sha1((t or "").encode()).hexdigest() for t in texts]
        return batch.append_column("content_hash", pa.array(hashes))


def dedup_exact(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                text_col: str = "text") -> ray.data.Dataset:
    """Keep the smallest id per distinct text (hash-partitioned groupby)."""
    hashed = ds.map_batches(ExactHash(text_col), batch_format="pyarrow")

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, id_col)

    keep_first.__name__ = "keep_first"
    return hashed.groupby("content_hash").map_groups(keep_first,
                                                     batch_format="pandas")


class MinHasher:
    """map_batches actor: text -> 64 minhashes -> (band, bucket) rows."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 shingle_k: int = 3):
        self.analyzer = VectorAnalyzer(STANDARD)
        self.a, self.b = _hash_params()
        self.text_col = text_col
        self.id_col = id_col
        self.k = shingle_k

    def signatures(self, texts) -> np.ndarray:
        toks = self.analyzer.token_lists(texts)
        sigs = np.full((len(texts), _N_HASH), _MERSENNE, dtype=np.int64)
        for i, t in enumerate(toks):
            sh = _shingle_hashes(t, self.k)
            if len(sh) == 0:
                continue
            x = (sh % np.uint64(_MERSENNE)).astype(np.int64)
            hv = (self.a[None, :] * x[:, None] + self.b[None, :]) % _MERSENNE
            sigs[i] = hv.min(axis=0)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        sigs = self.signatures(batch[self.text_col].to_numpy(zero_copy_only=False))
        rows_per_band = _N_HASH // _BANDS
        n = len(ids)
        band_ids = np.tile(np.arange(_BANDS, dtype=np.int32), n)
        doc_ids = np.repeat(ids, _BANDS)
        buckets = np.empty(n * _BANDS, dtype=np.int64)
        for b in range(_BANDS):
            seg = sigs[:, b * rows_per_band: (b + 1) * rows_per_band]
            # mix the band rows into one bucket key
            mixed = seg[:, 0]
            for j in range(1, rows_per_band):
                mixed = (mixed * 1000003 + seg[:, j]) % _MERSENNE
            buckets[b::_BANDS] = mixed
        return pa.table({
            "band": pa.array(band_ids, type=pa.int32()),
            "bucket": pa.array(buckets, type=pa.int64()),
            "doc_id": pa.array(doc_ids, type=pa.int64()),
        })


def minhash_candidate_pairs(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                            text_col: str = "text") -> ray.data.Dataset:
    """LSH candidate pairs (doc_a < doc_b), deduplicated across bands."""
    bands = ds.map_batches(MinHasher(text_col, id_col), batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].to_numpy())
        ids = np.unique(ids)
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    pairs.__name__ = "pairs"
    cand = bands.groupby(["band", "bucket"]).map_groups(pairs,
                                                        batch_format="pandas")

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    dedup_pairs.__name__ = "dedup_pairs"
    return cand.groupby(["doc_a", "doc_b"]).map_groups(dedup_pairs,
                                                       batch_format="pandas")


def verify_jaccard(ds: ray.data.Dataset, pairs: pd.DataFrame, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   k: int = 3, threshold: float = 0.5) -> pd.DataFrame:
    """Exact k-token-shingle Jaccard for candidate pairs (broadcast join:
    the candidate doc set is collected, shingled once, compared)."""
    wanted = np.unique(np.concatenate([pairs["doc_a"].to_numpy(),
                                       pairs["doc_b"].to_numpy()])) if len(pairs) else np.array([], dtype=np.int64)
    analyzer = VectorAnalyzer(STANDARD)
    texts: dict[int, set] = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        ids = batch[id_col].to_numpy()
        mask = np.isin(ids, wanted)
        if not mask.any():
            continue
        toks = analyzer.token_lists(
            pa.compute.take(batch[text_col], pa.array(np.flatnonzero(mask))).to_pylist())
        for i, r in enumerate(np.flatnonzero(mask)):
            t = toks[i]
            sh = ({" ".join(t[j: j + k]) for j in range(len(t) - k + 1)}
                  if len(t) >= k else ({" ".join(t)} if t else set()))
            texts[int(ids[r])] = sh
    rows = []
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        sa, sb = texts.get(int(a), set()), texts.get(int(b), set())
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= threshold:
            rows.append((int(a), int(b), j))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


class ShingleRows:
    """map_batches: explode docs to (shingle_hash, doc_id) rows."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 k: int = 3):
        self.analyzer = VectorAnalyzer(STANDARD)
        self.text_col = text_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        toks = self.analyzer.token_lists(
            batch[self.text_col].to_numpy(zero_copy_only=False))
        out_ids, out_sh = [], []
        for i, t in enumerate(toks):
            sh = np.unique(_shingle_hashes(t, self.k))
            out_ids.append(np.full(len(sh), ids[i], dtype=np.int64))
            out_sh.append(sh.astype(np.int64))
        return pa.table({
            "shingle": pa.array(np.concatenate(out_sh) if out_sh else [],
                                type=pa.int64()),
            "doc_id": pa.array(np.concatenate(out_ids) if out_ids else [],
                               type=pa.int64()),
        })


def jaccard_pairs_exact(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        threshold: float = 0.5,
                        max_bucket: int = 1000) -> pd.DataFrame:
    """EXACT n-gram-Jaccard near-dup pairs >= threshold.

    Candidates = pairs sharing at least one k-shingle (complete for any
    J > 0, unlike LSH banding), generated by a groupby(shingle) shuffle;
    buckets larger than ``max_bucket`` docs are dropped with the shingle
    (a shingle shared by that many docs contributes ~nothing to J >= 0.5
    pairs at these corpus sizes; the cap bounds pair explosion — noted,
    not silent)."""
    rows = ds.map_batches(ShingleRows(text_col, id_col, k),
                          batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > max_bucket:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    pairs.__name__ = "pairs"
    cand = rows.groupby("shingle").map_groups(pairs, batch_format="pandas")
    cand_pdf = cand.to_pandas().drop_duplicates()
    return verify_jaccard(ds, cand_pdf, id_col=id_col, text_col=text_col,
                          k=k, threshold=threshold)


class SimHasher:
    """map_batches: 64-bit simhash fingerprint of the token multiset."""

    def __init__(self, text_col: str = "text"):
        self.analyzer = VectorAnalyzer(STANDARD)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = self.analyzer.token_lists(
            batch[self.text_col].to_numpy(zero_copy_only=False))
        out = np.zeros(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            if not t:
                continue
            hashes = _shingle_hashes(t, 1)
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((v > 0)[::-1]).view(np.uint64)[0]
        return batch.append_column("simhash",
                                   pa.array(out.astype(np.int64), type=pa.int64()))
