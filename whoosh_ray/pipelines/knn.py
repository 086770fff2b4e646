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
