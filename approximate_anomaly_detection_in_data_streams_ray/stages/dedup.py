"""Deduplication family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Engine-level generalisation of the reference's coordinate/id dedup sets
(SURVEY.md §2.6 O4).  Shapes chosen for 100 TB:

* exact: hash(text) per batch (vectorized) → ``groupby(hash).aggregate``
  keeps min id — the only full shuffle, over (hash, id) pairs only;
* MinHash-LSH: per-batch signatures → explode to (band, band_hash, id)
  rows → ``groupby`` buckets → candidate pairs verified by signature
  Jaccard — raw text never shuffles;
* SimHash: 64-bit fingerprints → (rotation, 16-bit-prefix) bucket rows →
  the same distributed bucket ``groupby`` — nothing materializes on the
  driver, Hamming via vectorized popcount;
* embedding cosine: banded random-hyperplane buckets (bits scale with N
  so bucket sizes stay bounded) → within-bucket matmul.

All bucket exchanges group by a coarse partition key (``pbucket``) so the
``map_groups`` Python-call count is bounded by the partition count, not the
LSH-bucket count; equal-key runs inside a partition are detected vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import popcount64, splitmix64, stable_hash64
from ..functions.sketches import MinHasher, char_shingle_hashes, simhash64_batch
from .common import auto_pool


def _fixed_pool(requested, num_cpus_per_actor: float = 0.75) -> int:
    """Back-compat alias for :func:`..stages.common.auto_pool`."""
    return auto_pool(requested, num_cpus_per_actor)


def _n_partitions(requested: int | None = None) -> int:
    """Coarse shuffle width for bucket exchanges: ~2 groups per CPU keeps
    every core busy through the map_groups stage without exploding the
    Python-call/task count.  (Round 1 hardcoded 64, capping wide clusters.)"""
    if requested is not None:
        return int(requested)
    from .common import cluster_cpus

    return max(32, int(2 * cluster_cpus()))


def _empty_pairs(value_col: str, value_dtype: str = "float64") -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                         "id_b": pd.Series(dtype="int64"),
                         value_col: pd.Series(dtype=value_dtype)})


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


_MH_CACHE: dict[int, MinHasher] = {}


def _cached_minhasher(num_perm: int) -> MinHasher:
    """Per-worker-process MinHasher (deterministic seed, so every worker's
    instance is identical) — lets the signature stage run as PLAIN TASKS:
    short stages pay ~100ms × pool-size to spin up an actor pool, which
    dwarfs the (µs) constructor this cache amortizes."""
    if num_perm not in _MH_CACHE:
        _MH_CACHE[num_perm] = MinHasher(num_perm=num_perm)
    return _MH_CACHE[num_perm]


class MinHashSignatures:
    """Per-batch MinHash band keys, exploded to bucket rows (plain-task
    callable; the hasher itself is process-cached)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 5,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.mh = _cached_minhasher(num_perm)
        self.bands = bands
        self.shingle = shingle
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Whole-batch vectorized: signatures via
        :meth:`MinHasher.signatures_batch` (one pass over the concatenated
        Arrow string buffer), band keys as (docs × bands) splitmix rounds,
        exploded doc-major.  No per-document Python (round 2's hotspot)."""
        n_docs = len(batch)
        sigs = self.mh.signatures_batch(batch[self.text_col], n=self.shingle)
        rows_per_band = self.mh.num_perm // self.bands
        seg = sigs.reshape(n_docs, self.bands, rows_per_band)
        with np.errstate(over="ignore"):
            # band id mixed into the band's segment hash → ONE int64
            # exchange column
            h = np.zeros((n_docs, self.bands), dtype=np.uint64)
            for j in range(rows_per_band):
                h = splitmix64(h + seg[:, :, j])
            h = splitmix64(h + np.arange(self.bands, dtype=np.uint64)[None, :])
        ids = np.repeat(batch[self.id_col].to_numpy(zero_copy_only=False), self.bands)
        sig_rows = np.repeat(sigs, self.bands, axis=0)
        sig_arr = pa.Array.from_buffers(
            pa.binary(self.mh.num_perm * 8), n_docs * self.bands,
            [None, pa.py_buffer(np.ascontiguousarray(sig_rows).tobytes())],
        )
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "bucket_key": pa.array(h.ravel().astype(np.int64)),
                "sig": sig_arr,
            }
        )


def _run_bounds(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-key runs in a sorted key array."""
    boundaries = np.nonzero(keys[1:] != keys[:-1])[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(keys)]])
    return starts, ends


def sig_agreement_pairs(g: pd.DataFrame, id_col: str = "doc_id",
                        threshold: float = 0.8) -> pd.DataFrame:
    """Candidate pairs from one bucket partition's (id, bucket_key, sig)
    rows: sort by bucket_key, detect equal-key runs vectorized, and only
    the rare multi-member runs get pairwise signature comparison.  Shared
    by the one-shot path (:func:`minhash_near_dup_pairs`) and the
    checkpointed per-item path (``pipelines/dedup_resume.py``)."""
    if len(g) < 2:
        return _empty_pairs("est_jaccard")
    g = g.sort_values(["bucket_key", id_col], kind="stable")
    starts, ends = _run_bounds(g["bucket_key"].to_numpy())
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


def minhash_near_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                           threshold: float = 0.8, num_perm: int = 64,
                           bands: int = 16, concurrency: int | None = None,
                           n_partitions: int | None = None):
    """(id_a, id_b, est_jaccard) candidate pairs verified by signature
    agreement ≥ threshold.  Bucket groupby carries only (id, 8B hash,
    signature) rows."""
    P = _n_partitions(n_partitions)

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        return sig_agreement_pairs(g, id_col=id_col, threshold=threshold)

    sig_stage = MinHashSignatures(num_perm=num_perm, bands=bands,
                                  id_col=id_col, text_col=text_col)
    buckets = ds.map_batches(
        sig_stage.__call__,  # plain tasks — no actor-pool startup tax
        batch_format="pyarrow",
        batch_size=512,
    ).map_batches(
        lambda b: b.append_column(
            "pbucket", pa.array((b["bucket_key"].to_numpy(zero_copy_only=False)
                                 % P).astype(np.int32))
        ),
        batch_format="pyarrow",
    )
    pairs = buckets.groupby("pbucket").map_groups(
        pairs_in_partition, batch_format="pandas"
    )
    # a pair can match in several bands → dedup (pairs table is output-sized)
    pdf = pairs.to_pandas()
    if pdf.empty or "id_a" not in pdf.columns:
        return _empty_pairs("est_jaccard")
    pdf = pdf.drop_duplicates(subset=["id_a", "id_b"])
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------------------- SimHash


class SimHashStage:
    """Actor: 64-bit SimHash fingerprints per document (batched kernel)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = simhash64_batch(batch[self.text_col].to_pylist()).view(np.int64)
        return pa.table(
            {self.id_col: batch[self.id_col], "simhash": pa.array(fps)}
        )


def simhash_buckets(batch: pa.Table, id_col: str, max_hamming: int = 3) -> pa.Table:
    """Explode fingerprints into disjoint-bit-block bucket rows with an
    EXACT recall guarantee (Manku-style pigeonhole): the 64 bits are split
    into ``max(4, max_hamming + 1)`` disjoint blocks, so ``max_hamming``
    flipped bits cannot touch every block — any pair at Hamming ≤ t shares
    at least one block key and is guaranteed to meet in a bucket.  (Round 2
    used 4 rotated 16-bit prefixes: exact only for t ≤ 3, silently
    probabilistic for the t = 6 caller.)"""
    f = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    n = len(f)
    n_blocks = max(4, int(max_hamming) + 1)
    bounds = [round(i * 64 / n_blocks) for i in range(n_blocks + 1)]
    keys = np.empty(n_blocks * n, dtype=np.int64)
    for blk in range(n_blocks):
        lo, hi = bounds[blk], bounds[blk + 1]
        val = ((f >> np.uint64(lo)) & np.uint64((1 << (hi - lo)) - 1)).astype(np.int64)
        keys[blk * n:(blk + 1) * n] = (np.int64(blk) << np.int64(32)) | val
    ids = np.tile(batch[id_col].to_numpy(zero_copy_only=False), n_blocks)
    sims = np.tile(f.view(np.int64), n_blocks)
    return pa.table({id_col: pa.array(ids), "bucket_key": pa.array(keys),
                     "simhash": pa.array(sims)})


def simhash_near_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                           max_hamming: int = 3, concurrency: int | None = None,
                           n_partitions: int | None = None,
                           fp_out_dir: str | None = None):
    """Near-dup pairs with Hamming(simhash) ≤ t, fully distributed AND
    exact-recall (pigeonhole bit-blocks, see :func:`simhash_buckets`): the
    fingerprint stage emits t+1 block-key bucket rows per doc, pairs are
    found inside a coarse-partition ``groupby`` (same exchange shape as
    MinHash) — nothing ever materializes on the driver except the
    output-sized pair list."""
    P = _n_partitions(n_partitions)

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_pairs("hamming", "int64")
        g = g.sort_values(["bucket_key", id_col], kind="stable")
        starts, ends = _run_bounds(g["bucket_key"].to_numpy())
        ids = g[id_col].to_numpy()
        fps = g["simhash"].to_numpy().view(np.uint64)
        out_a, out_b, out_h = [], [], []
        for s0, s1 in zip(starts, ends):
            if s1 - s0 < 2:
                continue
            bf, bi = fps[s0:s1], ids[s0:s1]
            for i in range(len(bf) - 1):
                h = popcount64(bf[i] ^ bf[i + 1:])
                for j in np.nonzero(h <= max_hamming)[0]:
                    a, b = bi[i], bi[i + 1 + j]
                    if a != b:
                        out_a.append(min(a, b)); out_b.append(max(a, b))
                        out_h.append(int(h[j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    fps = ds.map_batches(
        SimHashStage(id_col=id_col, text_col=text_col).__call__,  # plain tasks
        batch_format="pyarrow", batch_size=512,
    )
    if fp_out_dir is not None:
        # side ARTIFACT, not a pipeline hop: materialize the fingerprint
        # dataset once (16 B/doc — bounded regardless of text size), write
        # it as Parquet for the DuckDB bit_count(xor) oracle self-join,
        # and continue the pair stage from the in-memory blocks.  The
        # write lands via tempdir + rename: a concurrent reader never sees
        # a HALF-WRITTEN table (each version is complete before its rename),
        # though the path is briefly absent between the rename-aside of the
        # old version and the rename-in of the new one — single-writer is
        # the contract here.  fp_out_dir must be on storage every node can
        # reach (same contract as the join exchange scratch) — a
        # node-local path only works single-node.
        import os
        import shutil

        fps = fps.materialize()
        tmp = f"{fp_out_dir}.tmp.{os.getpid()}"
        old = f"{fp_out_dir}.old.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        fps.write_parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(fp_out_dir):
            os.rename(fp_out_dir, old)   # rename-aside, not rmtree: the old
        os.rename(tmp, fp_out_dir)       # version stays readable until here
        shutil.rmtree(old, ignore_errors=True)

    def bucketize(b: pa.Table) -> pa.Table:
        t = simhash_buckets(b, id_col, max_hamming=max_hamming)
        pb = (splitmix64(t["bucket_key"].to_numpy(zero_copy_only=False)
                         .view(np.uint64)) % np.uint64(P)).astype(np.int32)
        return t.append_column("pbucket", pa.array(pb))

    buckets = fps.map_batches(bucketize, batch_format="pyarrow")
    pairs = buckets.groupby("pbucket").map_groups(
        pairs_in_partition, batch_format="pandas"
    )
    pdf = pairs.to_pandas()
    if pdf.empty or "id_a" not in pdf.columns:
        return _empty_pairs("hamming", "int64")
    pdf = pdf.drop_duplicates(subset=["id_a", "id_b"])
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------------------------- n-gram Jaccard


_VERIFY_COLS = ["id_a", "id_b", "n_inter", "n_union", "jaccard"]


def _empty_verify() -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                         "id_b": pd.Series(dtype="int64"),
                         "n_inter": pd.Series(dtype="int64"),
                         "n_union": pd.Series(dtype="int64"),
                         "jaccard": pd.Series(dtype="float64")})


def verify_pairs_with_texts(texts: dict, candidate_pairs: pd.DataFrame,
                            n: int = 5, threshold: float = 0.8) -> pd.DataFrame:
    """Exact n-gram Jaccard over an in-memory {id: text} map — the local
    verify kernel shared by :func:`ngram_jaccard_verify` (broadcast-collect
    route) and the checkpointed per-item route
    (``pipelines/dedup_resume.py``)."""
    empty = np.empty(0, dtype=np.uint64)
    shingles = {i: np.unique(char_shingle_hashes(t or "", n)) for i, t in texts.items()}
    ids_a = candidate_pairs["id_a"].to_numpy()
    ids_b = candidate_pairs["id_b"].to_numpy()
    rows = []
    for a_id, b_id in zip(ids_a, ids_b):
        a, b = shingles.get(a_id, empty), shingles.get(b_id, empty)
        inter = int(np.intersect1d(a, b, assume_unique=True).size)
        union = max(1, a.size + b.size - inter)
        jac = inter / union
        if jac >= threshold:
            rows.append({"id_a": a_id, "id_b": b_id, "n_inter": inter,
                         "n_union": int(union), "jaccard": jac})
    out = pd.DataFrame(rows, columns=_VERIFY_COLS)
    return out if len(out) else _empty_verify()


def ngram_jaccard_verify(ds, candidate_pairs: pd.DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 5,
                         threshold: float = 0.8) -> pd.DataFrame:
    """Exact n-gram Jaccard for a (small) candidate pair set: broadcast the
    candidate ids, collect only those texts, verify vectorized.  Emits the
    exact shingle-set sizes (``n_inter``, ``n_union``) alongside the ratio
    so downstream comparisons (and the SQL oracle) can match on integers —
    immune to float-rounding-convention differences."""
    wanted = set(candidate_pairs["id_a"]) | set(candidate_pairs["id_b"])
    if not wanted:
        return _empty_verify()
    import pyarrow.compute as pc

    vs = pa.array(list(wanted))
    texts = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=vs)).select([id_col, text_col]),
        batch_format="pyarrow",
    ).to_pandas().set_index(id_col)[text_col].to_dict()
    return verify_pairs_with_texts(texts, candidate_pairs, n=n,
                                   threshold=threshold)


def ngram_jaccard_verify_distributed(ds, candidate_pairs, id_col: str = "doc_id",
                                     text_col: str = "text", n: int = 5,
                                     threshold: float = 0.8,
                                     B: int | None = None,
                                     scratch_dir: str | None = None) -> pd.DataFrame:
    """Scale path for exact n-gram Jaccard verification: the driver never
    holds texts or the pair list.  Shingle rows (id, sorted-unique uint64
    hashes as one binary blob) are computed in one streaming pass, then two
    bucketed hash joins route each pair together with BOTH sides' shingles
    (pairs ⋈ shingles(id_a) ⋈ shingles(id_b), ``stages/joins.py``), and the
    Jaccard check runs vectorized inside the join buckets.  Use when the
    candidate set is too large to collect (the default
    :func:`ngram_jaccard_verify` is faster for small candidate sets)."""
    import ray

    from .common import cluster_cpus
    from .joins import bucketed_hash_join

    if B is None:
        B = max(8, int(cluster_cpus()))

    def shingle_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        blobs = [np.unique(char_shingle_hashes(t or "", n)).tobytes()
                 for t in b[text_col].to_pylist()]
        return pa.table({id_col: ids, "shingles": pa.array(blobs, pa.binary())})

    shingles = ds.map_batches(shingle_rows, batch_format="pyarrow")
    if isinstance(candidate_pairs, pd.DataFrame):
        pairs_ds = ray.data.from_pandas(candidate_pairs[["id_a", "id_b"]])
    else:
        pairs_ds = candidate_pairs.select_columns(["id_a", "id_b"])

    sh_a = shingles.map_batches(
        lambda b: b.rename_columns(["id_a", "sh_a"]), batch_format="pyarrow")
    j1 = bucketed_hash_join(pairs_ds, sh_a, key="id_a", B=B,
                            scratch_dir=scratch_dir)
    sh_b = shingles.map_batches(
        lambda b: b.rename_columns(["id_b", "sh_b"]), batch_format="pyarrow")
    j2 = bucketed_hash_join(j1, sh_b, key="id_b", B=B, scratch_dir=scratch_dir)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "id_a" not in df.columns:  # empty join buckets
            return _empty_verify()
        rows = []
        for a_id, b_id, sa, sb in zip(df["id_a"], df["id_b"], df["sh_a"], df["sh_b"]):
            a = np.frombuffer(sa, dtype=np.uint64)
            b = np.frombuffer(sb, dtype=np.uint64)
            inter = int(np.intersect1d(a, b, assume_unique=True).size)
            union = max(1, a.size + b.size - inter)
            jac = inter / union
            if jac >= threshold:
                rows.append({"id_a": a_id, "id_b": b_id, "n_inter": inter,
                             "n_union": int(union), "jaccard": jac})
        out = pd.DataFrame(rows, columns=_VERIFY_COLS)
        return out if len(out) else _empty_verify()

    out = j2.map_batches(verify, batch_format="pandas").to_pandas()
    if out.empty:
        return _empty_verify()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def ngram_jaccard_verify_auto(ds, candidate_pairs, id_col: str = "doc_id",
                              text_col: str = "text", n: int = 5,
                              threshold: float = 0.8,
                              driver_collect_max: int = 20_000,
                              scratch_dir: str | None = None) -> pd.DataFrame:
    """ONE entry point for exact n-gram verification that routes on the
    candidate-set size: small sets (≤ *driver_collect_max* pairs) take the
    broadcast/collect path (faster — no Parquet exchange), larger sets take
    the fully-distributed bucketed-join path where the driver never holds
    texts.  The two paths are parity-tested (tests/test_round2.py)."""
    if not isinstance(candidate_pairs, pd.DataFrame):
        # Dataset candidates: the count decides the route; counting is a
        # metadata/aggregate pass, not a materialization
        n_cand = candidate_pairs.count()
        if n_cand > driver_collect_max:
            return ngram_jaccard_verify_distributed(
                ds, candidate_pairs, id_col=id_col, text_col=text_col, n=n,
                threshold=threshold, scratch_dir=scratch_dir)
        candidate_pairs = candidate_pairs.to_pandas()
    if len(candidate_pairs) > driver_collect_max:
        return ngram_jaccard_verify_distributed(
            ds, candidate_pairs, id_col=id_col, text_col=text_col, n=n,
            threshold=threshold, scratch_dir=scratch_dir)
    return ngram_jaccard_verify(ds, candidate_pairs, id_col=id_col,
                                text_col=text_col, n=n, threshold=threshold)


def connected_min_ids(pairs: pd.DataFrame) -> dict:
    """Union-find over a near-dup pair list (output-sized, driver-side):
    returns {doc_id: canonical_min_id_of_its_cluster} for every id that
    appears in a pair."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:  # union by min id so the canonical id is the smallest
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components_distributed(pairs_ds, max_iters: int = 50):
    """Connected components over a (id_a, id_b) pair Dataset WITHOUT driver
    materialization: min-label propagation expressed purely as Ray-native
    ``groupby`` shuffles — each iteration unions the (symmetric + self-loop)
    edge rows with the current label rows, propagates every node's label to
    its neighbors inside one ``map_groups`` pass, and takes the per-node
    min.  Labels only decrease, so the label SUM is a monotone convergence
    witness (one tiny aggregate per iteration); iterations = cluster
    diameter, which is small for near-dup graphs.  Returns a Dataset of
    ``(node, label)`` where ``label`` is the component's min id.

    Partitioning assumption (custom-operator contract): one node's edge
    list fits in a worker's heap — salt super-nodes if a single document
    pairs with millions of others."""
    import ray
    from ray.data.aggregate import Min

    def to_edges(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False)
        c = b["id_b"].to_numpy(zero_copy_only=False)
        src = np.concatenate([a, c, a, c])
        dst = np.concatenate([c, a, a, c])  # both directions + self loops
        return pa.table({"key": pa.array(src), "dst": pa.array(dst),
                         "label": pa.array(np.zeros(len(src), np.int64)),
                         "kind": pa.array(np.zeros(len(src), np.int8))})

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow").materialize()
    # iteration 0 for free: label(x) = min(N(x) ∪ {x})
    labels = edges.groupby("key").aggregate(Min("dst", alias_name="label")) \
        .map_batches(lambda b: b.rename_columns(["node", "label"]),
                     batch_format="pyarrow").materialize()
    prev_sum = labels.sum("label")

    def prop(g: pd.DataFrame) -> pd.DataFrame:
        lbl = g.loc[g["kind"] == 1, "label"].min()
        dsts = g.loc[g["kind"] == 0, "dst"].to_numpy()
        nodes = np.concatenate([dsts, [g["key"].iloc[0]]])
        return pd.DataFrame({"node": nodes,
                             "label": np.full(len(nodes), lbl, dtype=np.int64)})

    for _ in range(max_iters):
        label_rows = labels.map_batches(
            lambda b: pa.table({"key": b["node"],
                                "dst": b["node"],
                                "label": b["label"],
                                "kind": pa.array(np.ones(len(b), np.int8))}),
            batch_format="pyarrow")
        labels = (
            edges.union(label_rows)
            .groupby("key").map_groups(prop, batch_format="pandas")
            .groupby("node").aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        s = labels.sum("label")
        if s == prev_sum:
            return labels
        prev_sum = s
    # non-convergence must be loud: returning partial labels would make
    # apply_near_dedup keep multiple "survivors" per cluster silently
    raise RuntimeError(
        f"connected components did not converge in {max_iters} iterations "
        "(cluster diameter exceeds max_iters — raise max_iters)")


def apply_near_dedup(ds, pairs, id_col: str = "doc_id",
                     max_driver_pairs: int = 2_000_000):
    """The APPLY step of near-dedup: drop every document that belongs to a
    near-dup cluster except the cluster's min-id survivor.

    Routing (round 2 silently assumed the pair list was driver-sized):
    * pair list ≤ *max_driver_pairs* → union-find on the driver, drop-id
      set broadcast via ``ray.put``, corpus streams through a vectorized
      anti-filter;
    * larger (or already a Dataset over the cap) →
      :func:`connected_components_distributed` + a bucketed anti-join, so
      neither the pair list nor the drop set ever materializes on the
      driver — the high-dup-rate 100 TB case.
    """
    import pyarrow.compute as pc
    import ray

    pairs_ds = None
    if not isinstance(pairs, pd.DataFrame):
        n_pairs = pairs.count()
        if n_pairs <= max_driver_pairs:
            pairs = pairs.to_pandas()
        else:
            pairs_ds = pairs
    if pairs_ds is None and len(pairs) <= max_driver_pairs:
        if len(pairs) == 0:
            return ds
        canon = connected_min_ids(pairs)
        drop = pa.array([k for k, v in canon.items() if k != v])
        drop_ref = ray.put(drop)

        def keep(b: pa.Table) -> pa.Table:
            return b.filter(pc.invert(pc.is_in(b[id_col], value_set=ray.get(drop_ref))))

        return ds.map_batches(keep, batch_format="pyarrow")

    if pairs_ds is None:
        pairs_ds = ray.data.from_pandas(pairs[["id_a", "id_b"]])
    labels = connected_components_distributed(pairs_ds)

    def mark_drop(b: pa.Table) -> pa.Table:
        f = b.filter(pc.not_equal(b["node"], b["label"]))
        # float64 marker: pandas left-merge upcasts misses to NaN/float64,
        # so a uniform dtype keeps every bucket's schema identical
        return pa.table({id_col: f["node"],
                         "_drop": pa.array(np.ones(len(f), np.float64))})

    drop = labels.map_batches(mark_drop, batch_format="pyarrow")
    from .joins import bucketed_hash_join

    joined = bucketed_hash_join(ds, drop, key=id_col, how="left")
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b["_drop"])).drop_columns(["_drop"]),
        batch_format="pyarrow",
    )


# ------------------------------------------------------- embedding near-dup


def embedding_near_dup_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                             threshold: float = 0.95, bands: int = 4,
                             bits_per_band: int | None = None, seed: int = 5,
                             target_bucket: int = 128,
                             n_partitions: int | None = None):
    """Cosine near-dup via BANDED random-hyperplane buckets + within-bucket
    matmul.  ``bands`` independent bit-groups give MinHash-style recall
    amplification (a pair missed by one band is caught by another), and
    ``bits_per_band`` grows with log2(N / target_bucket) so bucket sizes —
    and the within-bucket O(|bucket|²) matmul — stay bounded as the dataset
    grows (round 1 used 8 fixed global buckets: O((N/256)²) at scale)."""
    P = _n_partitions(n_partitions)
    n_rows = ds.count()  # parquet-metadata count — no data scan
    if bits_per_band is None:
        bits_per_band = int(max(8, np.ceil(np.log2(max(n_rows, 2) / max(target_bucket, 1)))))
    bits_per_band = min(bits_per_band, 30)
    first = ds.take(1)[0][vec_col]
    planes = np.random.default_rng(seed).standard_normal(
        (bands * bits_per_band, len(first)))
    weights = (np.uint64(1) << np.arange(bits_per_band, dtype=np.uint64))

    def to_buckets(batch: pa.Table) -> pa.Table:
        M = np.stack(batch[vec_col].to_numpy(zero_copy_only=False))
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        signs = (M @ planes.T) > 0  # (n, bands*bits)
        n = len(M)
        keys = np.empty(bands * n, dtype=np.int64)
        for b in range(bands):
            seg = signs[:, b * bits_per_band:(b + 1) * bits_per_band]
            h = (seg.astype(np.uint64) * weights).sum(axis=1)
            keys[b * n:(b + 1) * n] = ((np.uint64(b) << np.uint64(bits_per_band)) | h).astype(np.int64)
        ids = np.tile(batch[id_col].to_numpy(zero_copy_only=False), bands)
        nvecs = list(M.astype(np.float32)) * bands
        pbucket = (splitmix64(keys.view(np.uint64)) % np.uint64(P)).astype(np.int32)
        return pa.table(
            {
                id_col: pa.array(ids),
                "bucket_key": pa.array(keys),
                "pbucket": pa.array(pbucket),
                "nvec": pa.array(nvecs),
            }
        )

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_pairs("cosine")
        g = g.sort_values(["bucket_key", id_col], kind="stable")
        starts, ends = _run_bounds(g["bucket_key"].to_numpy())
        all_ids = g[id_col].to_numpy()
        vec_col_np = g["nvec"].to_numpy()
        frames = []
        for s0, s1 in zip(starts, ends):
            if s1 - s0 < 2:
                continue
            M = np.stack(vec_col_np[s0:s1])
            sims = M @ M.T
            ids = all_ids[s0:s1]
            iu = np.triu_indices(s1 - s0, k=1)
            hit = sims[iu] >= threshold
            if hit.any():
                frames.append(pd.DataFrame(
                    {
                        "id_a": ids[iu[0][hit]],
                        "id_b": ids[iu[1][hit]],
                        "cosine": sims[iu][hit].astype(np.float64),
                    }
                ))
        if not frames:
            return _empty_pairs("cosine")
        return pd.concat(frames, ignore_index=True)

    buckets = ds.map_batches(to_buckets, batch_format="pyarrow")
    pairs = buckets.groupby("pbucket").map_groups(pairs_in_partition, batch_format="pandas")
    pdf = pairs.to_pandas()
    if pdf.empty or "id_a" not in pdf.columns:
        return _empty_pairs("cosine")
    pdf = pdf.drop_duplicates(subset=["id_a", "id_b"])
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
