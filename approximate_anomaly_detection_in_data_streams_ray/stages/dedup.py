"""Deduplication family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Engine-level generalisation of the reference's coordinate/id dedup sets
(SURVEY.md §2.6 O4).  Shapes chosen for 100 TB:

* exact: hash(text) per batch (vectorized) → ``groupby(hash).aggregate``
  keeps min id — the only full shuffle, over (hash, id) pairs only;
* MinHash-LSH: per-batch signatures → explode to (band, band_hash, id)
  rows → ``groupby`` buckets → candidate pairs verified by signature
  Jaccard — raw text never shuffles;
* SimHash: 64-bit fingerprints, near-dup = Hamming ≤ t within buckets of
  the fingerprint's high bits;
* embedding cosine: random-hyperplane LSH buckets → within-bucket matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_hash64


def _fixed_pool(requested, num_cpus_per_actor: float = 0.75) -> int:
    """Clamp a requested actor-pool size to what the session can actually
    schedule: oversized fixed pools wait for their minimum size forever and
    autoscaling pools ramp up too slowly for short stages."""
    import ray

    if isinstance(requested, tuple):
        requested = requested[1]
    avail = ray.available_resources().get("CPU", 4) if ray.is_initialized() else 4
    return max(1, min(int(requested), int(avail / num_cpus_per_actor) - 1 or 1))
from ..functions.sketches import MinHasher, char_shingle_hashes, simhash64
from ..functions.text import token_hashes


# ----------------------------------------------------------------- exact dedup


def add_text_hash(batch: pa.Table, col: str = "text", out: str = "text_hash") -> pa.Table:
    return batch.append_column(out, pa.array(stable_hash64(batch[col]).astype(np.int64)))


def exact_dedup_keep_first(ds, id_col: str, text_col: str = "text"):
    """Dataset of the surviving (min-id per distinct text) rows' ids."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: add_text_hash(b, text_col).select([id_col, "text_hash"]),
        batch_format="pyarrow",
    )
    return hashed.groupby("text_hash").aggregate(Min(id_col, alias_name=id_col)).select_columns([id_col])


# --------------------------------------------------------------- MinHash + LSH


class MinHashSignatures:
    """Actor: per-batch MinHash band keys, exploded to bucket rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 5,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.mh = MinHasher(num_perm=num_perm)
        self.bands = bands
        self.shingle = shingle
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bucket_keys, sigs = [], [], []
        texts = batch[self.text_col].to_pylist()
        id_vals = batch[self.id_col].to_pylist()
        rows_per_band = self.mh.num_perm // self.bands
        for i, text in enumerate(texts):
            sig = self.mh.signature(char_shingle_hashes(text or "", self.shingle))
            sig_b = sig.tobytes()
            # one combined int64 bucket key per band: band id mixed into the
            # band's segment hash (single exchange column)
            seg = sig.reshape(self.bands, rows_per_band)
            from ..functions.hashing import splitmix64

            with np.errstate(over="ignore"):
                h = np.zeros(self.bands, dtype=np.uint64)
                for j in range(rows_per_band):
                    h = splitmix64(h + seg[:, j])
                h = splitmix64(h + np.arange(self.bands, dtype=np.uint64))
            for k in h.astype(np.int64).tolist():
                ids.append(id_vals[i])
                bucket_keys.append(k)
                sigs.append(sig_b)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "bucket_key": pa.array(bucket_keys, pa.int64()),
                "sig": pa.array(sigs, pa.binary()),
            }
        )


def minhash_near_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                           threshold: float = 0.8, num_perm: int = 64,
                           bands: int = 16, concurrency: int = 2):
    """(id_a, id_b, est_jaccard) candidate pairs verified by signature
    agreement ≥ threshold.  Bucket groupby carries only (id, 8B hash,
    signature) rows."""

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        """One call per coarse partition (not per LSH bucket): sort by
        bucket_key, detect equal-key runs vectorized, and only the rare
        multi-member runs get pairwise signature comparison."""
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        g = g.sort_values(["bucket_key", id_col], kind="stable")
        keys = g["bucket_key"].to_numpy()
        boundaries = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(keys)]])
        ids = g[id_col].to_numpy()
        sig_col = g["sig"].to_numpy()
        out_a, out_b, out_j = [], [], []
        for s0, s1 in zip(starts, ends):
            if s1 - s0 < 2:
                continue
            sigs = [np.frombuffer(x, dtype=np.uint64) for x in sig_col[s0:s1]]
            for i in range(s1 - s0):
                for j in range(i + 1, s1 - s0):
                    if ids[s0 + i] == ids[s0 + j]:
                        continue
                    jac = float((sigs[i] == sigs[j]).mean())
                    if jac >= threshold:
                        out_a.append(ids[s0 + i]); out_b.append(ids[s0 + j])
                        out_j.append(jac)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": out_j})

    buckets = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=_fixed_pool(concurrency),
        num_cpus=0.75,
    ).map_batches(
        lambda b: b.append_column(
            "pbucket", pa.array((b["bucket_key"].to_numpy(zero_copy_only=False)
                                 % 64).astype(np.int32))
        ),
        batch_format="pyarrow",
    )
    pairs = buckets.groupby("pbucket").map_groups(
        pairs_in_partition, batch_format="pandas"
    )
    # a pair can match in several bands → dedup
    pdf = pairs.to_pandas()
    if pdf.empty or "id_a" not in pdf.columns:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "est_jaccard": pd.Series(dtype="float64")})
    pdf = pdf.drop_duplicates(subset=["id_a", "id_b"])
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------------------- SimHash


class SimHashStage:
    """Actor: 64-bit SimHash fingerprints per document."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            np.int64(np.uint64(simhash64(token_hashes(t or "")))).item()
            for t in batch[self.text_col].to_pylist()
        ]
        return pa.table(
            {self.id_col: batch[self.id_col], "simhash": pa.array(fps, pa.int64())}
        )


def simhash_near_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                           max_hamming: int = 3, concurrency: int = 2):
    """Near-dup pairs with Hamming(simhash) ≤ t.  Bucket by the 16 high
    bits (a near-dup pair collides in at least one of 4 rotated buckets with
    high probability for t ≤ 3); within-bucket comparison is vectorized."""

    fps_df = ds.map_batches(
        SimHashStage, fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", batch_size=512,
        concurrency=_fixed_pool(concurrency), num_cpus=0.75,
    ).to_pandas()
    f = fps_df["simhash"].to_numpy().astype(np.uint64)
    ids = fps_df[id_col].to_numpy()
    out_a, out_b, out_h = [], [], []
    # 4 rotations × 16-bit prefix buckets
    for rot in range(4):
        rotated = (f << np.uint64(rot * 16)) | (f >> np.uint64(64 - rot * 16)) if rot else f
        prefix = rotated >> np.uint64(48)
        order = np.argsort(prefix, kind="stable")
        ps, fs, is_ = prefix[order], f[order], ids[order]
        start = 0
        for end in range(1, len(ps) + 1):
            if end == len(ps) or ps[end] != ps[start]:
                if end - start > 1:
                    bucket_f, bucket_i = fs[start:end], is_[start:end]
                    for i in range(len(bucket_f)):
                        x = bucket_f[i] ^ bucket_f[i + 1 :]
                        h = np.array([bin(int(v)).count("1") for v in x])
                        for j in np.nonzero(h <= max_hamming)[0]:
                            a, b = bucket_i[i], bucket_i[i + 1 + j]
                            if a != b:
                                out_a.append(min(a, b)); out_b.append(max(a, b))
                                out_h.append(int(h[j]))
                start = end
    df = pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})
    return df.drop_duplicates(subset=["id_a", "id_b"]).sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_verify(ds, candidate_pairs: pd.DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 5,
                         threshold: float = 0.8) -> pd.DataFrame:
    """Exact n-gram Jaccard for a (small) candidate pair set: broadcast the
    candidate ids, collect only those texts, verify driver-side."""
    wanted = set(candidate_pairs["id_a"]) | set(candidate_pairs["id_b"])
    if not wanted:
        return candidate_pairs.assign(jaccard=pd.Series(dtype=float)).iloc[:0]
    import pyarrow.compute as pc

    vs = pa.array(list(wanted))
    texts = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=vs)).select([id_col, text_col]),
        batch_format="pyarrow",
    ).to_pandas().set_index(id_col)[text_col].to_dict()
    shingles = {i: set(char_shingle_hashes(t or "", n).tolist()) for i, t in texts.items()}
    rows = []
    for _, r in candidate_pairs.iterrows():
        a, b = shingles.get(r["id_a"], set()), set(shingles.get(r["id_b"], set()))
        jac = len(a & b) / max(1, len(a | b))
        if jac >= threshold:
            rows.append({"id_a": r["id_a"], "id_b": r["id_b"], "jaccard": jac})
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


# ------------------------------------------------------- embedding near-dup


def embedding_near_dup_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                             threshold: float = 0.95, n_planes: int = 8, seed: int = 5):
    """Cosine near-dup via random-hyperplane buckets + within-bucket matmul.
    Buckets shuffle only (id, bucket, vector); vectors never pairwise-cross
    buckets (recall traded for scale, standard SimHash-for-vectors)."""
    import pyarrow.compute as pc

    def to_buckets(batch: pa.Table, planes: np.ndarray) -> pa.Table:
        M = np.stack(batch[vec_col].to_numpy(zero_copy_only=False))
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        signs = (M @ planes.T) > 0
        bucket = np.packbits(signs, axis=1, bitorder="little")[:, 0].astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(bucket),
                "nvec": pa.array(list(M.astype(np.float32))),
            }
        )

    first = ds.take(1)[0][vec_col]
    planes = np.random.default_rng(seed).standard_normal((n_planes, len(first)))

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(id_col)
        M = np.stack(g["nvec"].to_numpy())
        sims = M @ M.T
        ids = g[id_col].to_numpy()
        iu = np.triu_indices(len(g), k=1)
        hit = sims[iu] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][hit]],
                "id_b": ids[iu[1][hit]],
                "cosine": sims[iu][hit].astype(np.float64),
            }
        )

    buckets = ds.map_batches(lambda b: to_buckets(b, planes), batch_format="pyarrow")
    pairs = buckets.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")
    pdf = pairs.to_pandas()
    if pdf.empty or "id_a" not in pdf.columns:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
