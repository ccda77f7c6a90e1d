"""Seeded locality-sensitive hashing index for the LSH-family detectors.

Re-derived from the observable semantics of the reference's LSH machinery
(`/root/reference/src/core/lsh/HashFunction.java:13-40` — scalar hash
``floor((v·a + b)/w)`` with ``a ~ N(0,1)^d``, ``b ~ U[0,w)``;
`HashTable.java:92-101` — combined key is the tuple of ``numHashes`` ints;
`HashTable.java:22-35` — per-bucket size bound ``k`` enforced by evicting
uniformly-random *safe inliers*; `LSHIndex.java:33-44` — query = union of
the matching bucket of every table, no distance filter at index level).

Differences by design (documented, not accidental):
  * all randomness is seeded (the reference uses unseeded ``java.util.Random``
    → nondeterministic output, SURVEY.md §2.7);
  * hashing is vectorized: one ``(tables × hashes, d)`` matrix-vector product
    per point instead of nested Java loops;
  * query results are returned sorted by id so downstream processing is
    deterministic (the reference returns ``HashSet`` iteration order).
"""

from __future__ import annotations

import numpy as np


class _Bucket:
    __slots__ = ("entries", "safe")

    def __init__(self) -> None:
        self.entries: list = []   # insertion order, like the reference's ArrayList
        self.safe: list = []


class LSHIndex:
    """``num_tables`` hash tables, each keyed by ``num_hashes`` scalar hashes."""

    def __init__(
        self,
        num_hashes: int,
        num_tables: int,
        w: float,
        dims: int,
        k: int,
        rng: np.random.Generator,
    ) -> None:
        if w < 1:
            raise ValueError("LSH bucket width w must be >= 1 (reference HashFunction bound)")
        self.num_hashes = num_hashes
        self.num_tables = num_tables
        self.k = k
        self.rng = rng
        n = num_hashes * num_tables
        self.A = rng.standard_normal((n, dims))      # random projection vectors
        self.b = rng.uniform(0.0, w, size=n)          # random biases
        self.w = float(w)
        self.tables: list[dict[tuple, _Bucket]] = [dict() for _ in range(num_tables)]

    def _keys(self, vec: np.ndarray) -> list[tuple]:
        h = np.floor((self.A @ vec + self.b) / self.w).astype(np.int64)
        H = self.num_hashes
        return [tuple(h[t * H : (t + 1) * H]) for t in range(self.num_tables)]

    def insert(self, entry) -> None:
        for t, key in enumerate(self._keys(entry.vec)):
            bucket = self.tables[t].get(key)
            if bucket is None:
                bucket = _Bucket()
                self.tables[t][key] = bucket
            # per-bucket size bound: evict random safe inliers while too big
            while len(bucket.entries) > self.k and bucket.safe:
                idx = int(self.rng.integers(len(bucket.safe)))
                victim = bucket.safe.pop(idx)
                try:
                    bucket.entries.remove(victim)
                except ValueError:
                    pass
            if entry.count_after >= self.k:
                bucket.safe.append(entry)
            bucket.entries.append(entry)

    def remove(self, entry) -> None:
        for t, key in enumerate(self._keys(entry.vec)):
            bucket = self.tables[t].get(key)
            if bucket is None:
                continue
            try:
                bucket.safe.remove(entry)
            except ValueError:
                pass
            try:
                bucket.entries.remove(entry)
            except ValueError:
                pass

    def query(self, entry) -> list:
        """Union (dedup by id) of matching buckets across tables, id-sorted."""
        seen: dict[int, object] = {}
        for t, key in enumerate(self._keys(entry.vec)):
            bucket = self.tables[t].get(key)
            if bucket is None:
                continue
            for e in bucket.entries:
                seen[e.id] = e
        return [seen[i] for i in sorted(seen)]

    def get_all_entries(self) -> list:
        seen: dict[int, object] = {}
        for table in self.tables:
            for bucket in table.values():
                for e in bucket.entries:
                    seen[e.id] = e
        return [seen[i] for i in sorted(seen)]
