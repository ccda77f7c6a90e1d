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


# ------------------------------------------------------ distributed k-means


def _vec_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    """Zero-copy list<float> → (n, d) float64 with the ragged/null guard
    (a null or ragged row would silently misalign the flatten)."""
    col = batch[vec_col].combine_chunks()
    if col.null_count:
        raise ValueError(f"{vec_col}: null embeddings are not clusterable")
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    offs = np.asarray(col.offsets)
    widths = offs[1:] - offs[:-1]
    if n and not (widths == widths[0]).all():
        raise ValueError(f"{vec_col}: ragged embedding widths {set(widths)}")
    return flat.reshape(n, int(widths[0]) if n else 0)


def kmeans_fit(ds, k: int = 8, iters: int = 10, id_col: str = "vec_id",
               vec_col: str = "embedding", tol: float = 1e-4):
    """DISTRIBUTED Lloyd's k-means — the iterative-algorithm shape on Ray
    Data: each iteration is ONE ``map_batches`` pass emitting per-cluster
    (sum-vector, count, inertia) partials — k·(d+1)+1 floats per batch
    regardless of row count — folded on the driver into the next centroid
    set (empty clusters keep their previous centroid, the deterministic
    convention).  Unlike :class:`IVFIndex` (sample-trained), this fits on
    ALL rows; initialisation is the k smallest-id vectors (deterministic
    across runs and cluster sizes, per-block partial top-k fetch).

    Returns ``(centroids, counts, inertia_history)`` where
    ``inertia_history[i]`` is the total squared distance to the
    PRE-update centroids of iteration i — non-increasing by Lloyd's
    monotonicity, which callers can assert as a convergence witness."""
    from ..functions.hashing import stable_hash64

    # deterministic, UNBIASED init: farthest-first traversal over a
    # hash-ordered sample (k·64 rows with the smallest stable_hash64(id)
    # — reproducible on any cluster size, and unlike smallest-id it does
    # not correlate with insertion time, which would seed every centroid
    # inside one early cluster).  Partial top-m per block → ≤ m rows per
    # block reach the driver.
    m = k * 64

    def hash_low(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = stable_hash64(df[id_col].to_numpy())
        return df.sort_values(["_h", id_col]).head(m)

    low = (ds.map_batches(hash_low, batch_format="pandas")
           .to_pandas().sort_values(["_h", id_col]).head(m))
    S = _vec_matrix(pa.table({vec_col: pa.array(list(low[vec_col]))}),
                    vec_col)
    if len(S) < k:
        raise ValueError(f"kmeans_fit: need >= {k} rows, got {len(S)}")
    chosen = [0]                      # the sample's hash-first row
    d2min = ((S - S[0]) ** 2).sum(1)
    for _ in range(k - 1):
        nxt = int(d2min.argmax())     # farthest from every chosen center
        chosen.append(nxt)
        d2min = np.minimum(d2min, ((S - S[nxt]) ** 2).sum(1))
    C = S[chosen].copy()
    d = C.shape[1]
    history: list[float] = []
    counts = np.zeros(k, dtype=np.int64)

    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(b: pa.Table, _cr=c_ref) -> pa.Table:
            M = _vec_matrix(b, vec_col)
            Cw = ray.get(_cr)
            d2 = ((M * M).sum(1)[:, None] - 2.0 * (M @ Cw.T)
                  + (Cw * Cw).sum(1)[None, :])
            a = d2.argmin(1)
            onehot = (a[:, None] == np.arange(len(Cw))[None, :])
            sums = onehot.T.astype(np.float64) @ M          # (k, d)
            cnt = np.bincount(a, minlength=len(Cw)).astype(np.int64)
            inert = float(d2[np.arange(len(a)), a].sum())
            return pa.table({
                "sums": pa.array([sums.tobytes()], pa.binary()),
                "counts": pa.array([cnt.tobytes()], pa.binary()),
                "inertia": pa.array([inert], pa.float64()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        for sb, cb in zip(parts["sums"], parts["counts"]):
            sums += np.frombuffer(sb, dtype=np.float64).reshape(k, d)
            counts += np.frombuffer(cb, dtype=np.int64)
        history.append(float(parts["inertia"].sum()))
        nz = counts > 0
        C = C.copy()
        C[nz] = sums[nz] / counts[nz, None]
        # early stop: each extra iteration is a full corpus pass — stop
        # when the relative inertia improvement falls under tol
        if (len(history) >= 2
                and history[-2] - history[-1] <= tol * abs(history[-2])):
            break

    return C, counts, history
