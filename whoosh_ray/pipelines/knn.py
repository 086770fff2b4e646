"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
via ``ray.put`` and every ``map_batches`` task does one numpy matmul
against its batch, emitting per-batch partial top-k rows; a final small
sort/limit per query merges the partials.  No shuffle of the corpus.

Scale path: IVF-style bucketing — a sampled k-means-ish codebook (here:
deterministic random projection buckets) broadcast to a first
map_batches that assigns each vector a bucket; queries probe only the
nearest ``nprobe`` buckets.  Exactness is traded per the nprobe knob.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from whoosh_ray.stages.bcast import get_broadcast


def _stack_embeddings(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = arr.offsets.to_numpy()
    dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    return flat.reshape(-1, dim)


class BruteForceCosine:
    """map_batches stage: per-batch cosine top-k against broadcast queries."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 emb_col: str = "embedding", include_self: bool = False):
        self.queries_ref = queries_ref
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col
        self.include_self = include_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, qmat = get_broadcast(self.queries_ref)  # (nq,), (nq, dim) L2-normalized
        ids = batch[self.id_col].to_numpy()
        mat = _stack_embeddings(batch, self.emb_col)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        sims = qmat @ mat.T  # (nq, nbatch)
        if not self.include_self:
            sims[qids[:, None] == ids[None, :]] = -np.inf
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(qids, k)
        rows_n = ids[idx.ravel()]
        rows_s = np.take_along_axis(sims, idx, axis=1).ravel()
        return pa.table({
            "query_id": pa.array(rows_q, type=pa.int64()),
            "neighbor_id": pa.array(rows_n, type=pa.int64()),
            "cosine": pa.array(rows_s, type=pa.float64()),
        })


def _kmeans_lite(sample: np.ndarray, k: int, iters: int = 8,
                 seed: int = 5) -> np.ndarray:
    """Deterministic small k-means for the IVF codebook (numpy only)."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)),
                                  replace=False)].astype(np.float64)
    for _ in range(iters):
        sims = sample @ centroids.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


class IVFAssign:
    """map_batches: add the nearest-centroid bucket column."""

    def __init__(self, centroids_ref, emb_col: str = "embedding"):
        self.centroids_ref = centroids_ref
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        centroids = get_broadcast(self.centroids_ref)
        mat = _stack_embeddings(batch, self.emb_col)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        buckets = np.argmax((mat / norms[:, None]) @ centroids.T, axis=1)
        return batch.append_column(
            "ivf_bucket", pa.array(buckets.astype(np.int32), type=pa.int32()))


def knn_ivf(ds: ray.data.Dataset, query_ids: np.ndarray,
            query_mat: np.ndarray, k: int = 10, *, nlist: int = 16,
            nprobe: int = 4, id_col: str = "vec_id",
            emb_col: str = "embedding",
            sample_size: int = 4096) -> pd.DataFrame:
    """IVF-bucketed approximate cosine top-k — the scale path.

    A sampled codebook (deterministic k-means) is broadcast; one
    map_batches assigns each corpus vector its nearest-centroid bucket;
    queries probe only their ``nprobe`` nearest buckets, so the scored
    fraction is ~nprobe/nlist of the corpus.  Recall is the knob traded
    for that pruning (tested >= 0.9 @ nprobe=nlist/4 on the fixture
    embeddings)."""
    sample = ds.limit(sample_size).to_pandas()[emb_col]
    smat = np.array(list(sample), dtype=np.float64)
    norms = np.linalg.norm(smat, axis=1)
    norms[norms == 0] = 1.0
    smat = smat / norms[:, None]
    centroids = _kmeans_lite(smat, nlist)
    cref = ray.put(centroids)

    qnorm = np.linalg.norm(query_mat, axis=1)
    qnorm[qnorm == 0] = 1.0
    qmat = query_mat.astype(np.float64) / qnorm[:, None]
    # per-query probe set
    probes = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    probe_ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat, probes))

    bucketed = ds.map_batches(IVFAssign(cref, emb_col),
                              batch_format="pyarrow")

    k_ = k

    def score_batch(batch: pa.Table) -> pa.Table:
        qids, qm, prb = get_broadcast(probe_ref)
        ids = batch[id_col].to_numpy()
        bkt = batch["ivf_bucket"].to_numpy()
        mat = _stack_embeddings(batch, emb_col)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        mat = mat / nrm[:, None]
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(bkt, prb[qi]) & (ids != qids[qi])
            if not mask.any():
                continue
            sims = qm[qi] @ mat[mask].T
            cand_ids = ids[mask]
            kk = min(k_, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, qids[qi]))
            out_n.append(cand_ids[top])
            out_s.append(sims[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    pdf = bucketed.map_batches(score_batch, batch_format="pyarrow",
                               batch_size=4096).to_pandas()
    pdf = pdf.sort_values(["query_id", "cosine", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
    out = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount()
    return out


def knn_bruteforce(ds: ray.data.Dataset, query_ids: np.ndarray,
                   query_mat: np.ndarray, k: int = 10, *,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   include_self: bool = False) -> pd.DataFrame:
    """Exact cosine top-k for each query vector.  Returns a small pandas
    frame (nq * k rows) with (query_id, neighbor_id, cosine, rank)."""
    qnorm = np.linalg.norm(query_mat, axis=1)
    qnorm[qnorm == 0] = 1.0
    qmat = query_mat.astype(np.float64) / qnorm[:, None]
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat))
    partial = ds.map_batches(
        BruteForceCosine(ref, k, id_col, emb_col, include_self),
        batch_format="pyarrow", batch_size=4096)
    pdf = partial.to_pandas()  # nq * k * nblocks rows — small
    pdf = pdf[np.isfinite(pdf["cosine"])]
    pdf = pdf.sort_values(["query_id", "cosine", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
    out = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount()
    return out
