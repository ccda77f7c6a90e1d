"""Unit tests for sketches, partitioning, checkpointing, and LSH internals."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from approximate_anomaly_detection_in_data_streams_ray.functions.sketches import (
    HyperLogLog,
    MinHasher,
    char_shingle_hashes,
    hll_merge_bytes,
    simhash64,
    hamming64,
)
from approximate_anomaly_detection_in_data_streams_ray.functions.hashing import (
    sha256_hex,
    stable_hash64,
)


def test_hll_estimate_accuracy():
    vals = [f"item-{i}" for i in range(100_000)]
    est = HyperLogLog(p=12).add(vals).estimate()
    assert abs(est - 100_000) / 100_000 < 0.05


def test_hll_merge_associative_and_commutative():
    a = HyperLogLog().add([f"a{i}" for i in range(500)]).to_bytes()
    b = HyperLogLog().add([f"b{i}" for i in range(500)]).to_bytes()
    c = HyperLogLog().add([f"c{i}" for i in range(500)]).to_bytes()
    ab_c = hll_merge_bytes([hll_merge_bytes([a, b]), c])
    a_bc = hll_merge_bytes([a, hll_merge_bytes([b, c])])
    cba = hll_merge_bytes([c, b, a])
    assert ab_c == a_bc == cba


def test_hll_merge_equals_union():
    xs = [f"x{i}" for i in range(2000)]
    merged = HyperLogLog().add(xs[:1500]).merge(HyperLogLog().add(xs[500:]))
    assert merged.to_bytes() == HyperLogLog().add(xs).to_bytes()


def test_minhash_jaccard_estimate():
    mh = MinHasher(num_perm=256)
    s1 = char_shingle_hashes("the quick brown fox jumps over the lazy dog " * 30)
    s2 = char_shingle_hashes("the quick brown fox jumps over the lazy cat " * 30)
    true_j = len(np.intersect1d(np.unique(s1), np.unique(s2))) / len(
        np.union1d(s1, s2)
    )
    est = MinHasher.est_jaccard(mh.signature(s1), mh.signature(s2))
    assert abs(est - true_j) < 0.12


def test_minhash_identical_docs_match_every_band():
    mh = MinHasher(num_perm=64)
    sig = mh.signature(char_shingle_hashes("hello world " * 50))
    sig2 = mh.signature(char_shingle_hashes("hello world " * 50))
    assert (sig == sig2).all()
    assert mh.band_keys(sig, 16) == mh.band_keys(sig2, 16)


def test_simhash_orders_by_similarity():
    from approximate_anomaly_detection_in_data_streams_ray.functions.text import (
        token_hashes,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    near = base.replace("theta", "iota")
    far = "completely different words about maritime navigation systems " * 8
    f0 = simhash64(token_hashes(base))
    d_near = hamming64(np.array([simhash64(token_hashes(near))], np.uint64), f0)[0]
    d_far = hamming64(np.array([simhash64(token_hashes(far))], np.uint64), f0)[0]
    assert d_near < d_far


def test_stable_hash_is_process_stable():
    import subprocess
    import sys

    got = subprocess.run(
        [sys.executable, "-c",
         "from approximate_anomaly_detection_in_data_streams_ray.functions.hashing "
         "import stable_hash64; print(stable_hash64(['a','b']).tolist())"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    ).stdout.strip()
    assert got == str(stable_hash64(["a", "b"]).tolist())


def test_sha256_matches_hashlib():
    import hashlib

    vals = ["hello", "", "unicode ✓ content"]
    assert sha256_hex(vals) == [hashlib.sha256(v.encode()).hexdigest() for v in vals]


def test_work_item_planning_splits_at_row_groups(tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.partitioning import (
        plan_work_items,
    )

    t = pa.table({"x": pa.array(range(10_000))})
    p = str(tmp_path / "f.parquet")
    pq.write_table(t, p, row_group_size=1000)
    items = plan_work_items([p], target_rows=2500)
    assert sum(i.n_rows for i in items) == 10_000
    assert all(i.n_rows <= 3000 for i in items)
    assert len(items) == 4
    # deterministic ids, contiguous non-overlapping ranges
    spans = [(i.rg_start, i.rg_end) for i in items]
    assert spans == sorted(spans)
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))


def test_manifest_atomicity(tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.checkpoint import (
        Manifest,
        atomic_write_parquet,
    )

    m = Manifest(str(tmp_path))
    assert not m.is_done("features/x")
    m.mark_done("features/x", n_rows=5)
    assert m.is_done("features/x")
    assert m.completed_units() == ["features/x"]
    # atomic write leaves no tmp files behind
    atomic_write_parquet(pa.table({"a": [1]}), str(tmp_path / "out" / "f.parquet"))
    assert os.listdir(tmp_path / "out") == ["f.parquet"]


def test_lsh_bucket_eviction_bounds_size():
    from approximate_anomaly_detection_in_data_streams_ray.state.lsh import LSHIndex

    rng = np.random.default_rng(0)

    class E:
        def __init__(self, i, vec, safe):
            self.id = i
            self.vec = vec
            self.count_after = 10 if safe else 0

    idx = LSHIndex(num_hashes=2, num_tables=1, w=1000.0, dims=2, k=3, rng=rng)
    # same vector → same bucket; safe entries are evictable
    v = np.array([0.1, 0.1])
    for i in range(20):
        idx.insert(E(i, v, safe=True))
    bucket = next(iter(idx.tables[0].values()))
    assert len(bucket.entries) <= 5  # k + in-flight slack, bounded


def test_ivf_recall_vs_bruteforce(ray_session):
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.ann import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.default_rng(4)
    M = rng.standard_normal((1000, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(1000), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in M], pa.list_(pa.float32()))})
    q = rng.standard_normal((1, 16))
    exact = set(brute_force_topk(ray.data.from_arrow(t), q, k=10)["vec_id"])
    approx = set(ivf_topk(ray.data.from_arrow(t), q, k=10, nlist=8, nprobe=4)["vec_id"])
    assert len(exact & approx) / 10 >= 0.6


def test_bucketed_hash_join_matches_pandas(ray_session, tmp_path):
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.joins import (
        bucketed_hash_join,
    )

    rng = np.random.default_rng(6)
    left = pa.table({"k": pa.array(rng.integers(0, 50, 500)),
                     "lv": pa.array(range(500))})
    right = pa.table({"k": pa.array(rng.integers(0, 50, 80)),
                      "rv": pa.array(range(80))})
    got = bucketed_hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), key="k", B=8,
        scratch_dir=str(tmp_path),
    ).to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    want = (left.to_pandas().merge(right.to_pandas(), on="k", how="inner",
                                   suffixes=("_l", "_r"))
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    assert len(got) == len(want)
    assert (got[["k", "lv", "rv"]].to_numpy() == want[["k", "lv", "rv"]].to_numpy()).all()
