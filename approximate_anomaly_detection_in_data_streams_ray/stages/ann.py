"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — one numpy matmul per batch against a
broadcast query matrix, per-batch top-k partials merged driver-side (no
shuffle, no full materialization).  Scale path: IVF — k-means coarse
centroids (trained on a sample), each batch routed to its centroid buckets,
query probes only the closest ``nprobe`` buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


class BatchTopK:
    """Per-batch cosine top-k against the broadcast query matrix.  Used as a
    PLAIN-TASK callable: the only state is the (tiny, already-normalized)
    query matrix fetched zero-copy from the object store per call — an
    actor pool's startup cost would dwarf that."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str) -> None:
        Q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.Q = _normalize(np.asarray(Q, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _normalize(np.stack(batch[self.vec_col].to_numpy(zero_copy_only=False)).astype(np.float64))
        sims = M @ self.Q.T  # (batch, n_queries)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        kk = min(self.k, len(ids))
        for qi in range(self.Q.shape[0]):
            part = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[part].tolist())
            out_s.extend(sims[part, qi].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                self.id_col: pa.array(out_id),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def brute_force_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding", concurrency: int | None = None) -> pd.DataFrame:
    """Exact cosine top-k for each query row: per-batch partial top-k → tiny
    driver-side merge.  ``queries`` is (n_queries, d)."""
    stage = BatchTopK(np.asarray(queries, dtype=np.float64), k, id_col, vec_col)
    partials = ds.map_batches(stage.__call__, batch_format="pyarrow").to_pandas()
    out = (
        partials.sort_values(["query_idx", "cosine", id_col],
                             ascending=[True, False, True])
        .groupby("query_idx", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return out


class IVFIndex:
    """IVF coarse quantizer: centroids trained on a driver-side sample, then
    per-batch assignment; queries probe the ``nprobe`` nearest lists.

    At cluster scale the assignment stage is a ``map_batches`` writing
    list-partitioned Parquet, and each query touches only nprobe/nlist of
    the data — this class holds the small centroid model only."""

    def __init__(self, nlist: int = 16, nprobe: int = 4, iters: int = 10, seed: int = 9):
        self.nlist = nlist
        self.nprobe = nprobe
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def train(self, sample: np.ndarray) -> "IVFIndex":
        X = _normalize(np.asarray(sample, dtype=np.float64))
        rng = np.random.default_rng(self.seed)
        self.nlist = min(self.nlist, len(X))
        C = X[rng.choice(len(X), self.nlist, replace=False)]
        for _ in range(self.iters):
            assign = (X @ C.T).argmax(axis=1)
            for c in range(self.nlist):
                m = assign == c
                if m.any():
                    v = X[m].mean(axis=0)
                    C[c] = v / max(np.linalg.norm(v), 1e-12)
        self.centroids = C
        return self

    def assign_batch(self, M: np.ndarray) -> np.ndarray:
        return (_normalize(M) @ self.centroids.T).argmax(axis=1)

    def probe_lists(self, q: np.ndarray) -> np.ndarray:
        sims = _normalize(q[None, :])[0] @ self.centroids.T
        return np.argsort(-sims)[: self.nprobe]


def ivf_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
             vec_col: str = "embedding", nlist: int = 16, nprobe: int = 4,
             sample_size: int = 2048, seed: int = 9,
             concurrency: int | None = None) -> pd.DataFrame:
    """ANN top-k probing only nprobe/nlist of the vectors per query."""
    # seeded RANDOM training sample — ds.limit() would train the centroids
    # on the first blocks only, a biased sample under any input ordering
    n_rows = ds.count()  # parquet-metadata count, no scan
    if n_rows > sample_size:
        frac = min(1.0, 1.3 * sample_size / n_rows)
        sample_rows = ds.random_sample(frac, seed=seed).limit(sample_size).to_pandas()
        if len(sample_rows) < min(sample_size // 2, n_rows // 2):
            sample_rows = ds.limit(sample_size).to_pandas()
    else:
        sample_rows = ds.to_pandas()
    sample = np.stack(sample_rows[vec_col].to_numpy())
    index = IVFIndex(nlist=nlist, nprobe=nprobe, seed=seed).train(sample)
    Q = np.asarray(queries, dtype=np.float64)
    Qn = _normalize(Q)
    probe_sets = [set(index.probe_lists(q).tolist()) for q in Q]

    # plain tasks: the centroid model is tiny and ships once in the task
    # spec — actor-pool startup would dominate this short stage
    def probed_topk(batch: pa.Table) -> pa.Table:
        M = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        Mn = _normalize(M)
        assign = index.assign_batch(M)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(Qn)):
            mask = np.isin(assign, list(probe_sets[qi]))
            if not mask.any():
                continue
            sims = Mn[mask] @ Qn[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            part = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(sub_ids[part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(probed_topk, batch_format="pyarrow").to_pandas()
    return (
        partials.sort_values(["query_idx", "cosine", id_col],
                             ascending=[True, False, True])
        .groupby("query_idx", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
