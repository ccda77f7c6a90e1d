"""Sliding-window distance-based outlier detectors (MCOD family).

From-scratch Python/numpy re-implementations of the semantics documented in
SURVEY.md §2.3-2.7 from the reference's Java:

  * ``MCOD``          — exact micro-cluster algorithm
                        (`/root/reference/src/algorithms/MCOD.java`)
  * ``ApproxMCOD``    — bounded PD index + approximation radius
                        (`src/algorithms/ApproxMCOD.java`)
  * ``LSHOD``         — neighbor search via LSH buckets, no distance filter
                        (`src/algorithms/LSHOD.java`)
  * ``ApproxMCLSHOD`` — MCOD whose PD index is LSH, distance-filtered
                        (`src/algorithms/ApproxMCLSHOD.java`)

Core semantics (citations to the reference for parity checking):
  * a point is an outlier at a window state iff it has < k neighbors within
    Euclidean radius R among the in-window points; count-based window of
    size W sliding by ``slide`` (`src/core/OutlierDetector.java:13-41`);
  * ids are 1-based arrival order; the window fills to W before the first
    slide (`src/algorithms/MCOD.java:302-308`); both window bounds are
    inclusive ids (`OutlierDetector.java:35-41`);
  * neighbor accounting is asymmetric by slide index
    ``((id-1)//slide)+1``: same-or-later slide → ``count_after`` (never
    decays), earlier slide → id-sorted ``nn_before``
    (`MCODBase.java:144-152`, `MCOD.java:50-80`);
  * an inlier with ``count_after >= k`` is *safe* (`MCODBase.java:159-161`);
    unsafe inliers are re-checked by an event queue keyed by the expiry time
    ``id + W + 1`` of their oldest in-window preceding neighbor
    (`MCODBase.java:133-142`, `MCOD.java:228-261`);
  * a point is reported as a **pure outlier** iff it was classified outlier
    at least once and never inlier during its lifetime
    (`OutlierDetector.java:49-54`), evaluated at expiry and at end-of-stream
    (`Executor.java:118-126`).

Not a port: neighbor range queries are vectorized numpy over a slotted
coordinate matrix instead of the reference's M-tree (~670 LoC,
`src/core/mtree/MTree.java`) — brute-force SIMD over a ≤W-point window beats
a pointer-chasing metric tree in Python by a wide margin.  PD range-search
results are id-ordered (deterministic) where the reference exposes M-tree
traversal order; all approximate variants take a seeded RNG (the reference
is unseeded, SURVEY.md §2.7), so our fixtures are reproducible.
"""

from __future__ import annotations

import heapq
from bisect import bisect_left, insort

import numpy as np

from .lsh import LSHIndex

OUTLIER, INLIER_MC, INLIER_PD = 0, 1, 2
FIRST_OBJ_ID = 1  # src/core/OutlierDetector.java:10


def _euclidean(M: np.ndarray, v: np.ndarray) -> np.ndarray:
    d = M - v
    return np.sqrt(np.einsum("ij,ij->i", d, d))


def _manhattan(M: np.ndarray, v: np.ndarray) -> np.ndarray:
    return np.abs(M - v).sum(axis=1)


def _cosine(M: np.ndarray, v: np.ndarray) -> np.ndarray:
    denom = np.maximum(np.linalg.norm(M, axis=1) * np.linalg.norm(v), 1e-12)
    return 1.0 - (M @ v) / denom


#: Pluggable detector distance functions — parity with the reference's
#: ``DistanceFunction`` generics (`src/core/mtree/MTree.java:293-344`,
#: `src/core/mtree/DistanceFunctions.java:123-145`).  Each is a vectorized
#: kernel ``(M: (n, d), v: (d,)) -> (n,) distances``.
METRICS = {"euclidean": _euclidean, "manhattan": _manhattan, "cosine": _cosine}

#: Scalar pair fast paths: `_dist` runs ~100k times per work item — going
#: through the batched kernels costs a numpy-dispatch per call.
_PAIR_METRICS = {
    "euclidean": lambda a, b: float(np.sqrt((d := a - b) @ d)),
    "manhattan": lambda a, b: float(np.abs(a - b).sum()),
    "cosine": lambda a, b: float(
        1.0 - (a @ b) / max(np.sqrt((a @ a) * (b @ b)), 1e-12)),
}


def resolve_metric(metric):
    """Accept a metric name or a vectorized ``(M, v) -> distances`` callable."""
    if callable(metric):
        return metric
    try:
        return METRICS[metric]
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; options: {sorted(METRICS)}")


def resolve_pair_metric(metric):
    """Scalar (a, b) -> float companion of :func:`resolve_metric`."""
    if callable(metric):
        return lambda a, b: float(metric(a[None, :], b)[0])
    try:
        return _PAIR_METRICS[metric]
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; options: {sorted(METRICS)}")


class Entry:
    """Windowed point: `src/core/DataObj.java:9-49` + ISB/LSH entry fields."""

    __slots__ = (
        "id", "vec", "count_after", "nn_before", "n_outlier", "n_inlier",
        "etype", "mc", "rmc",
    )

    def __init__(self, id_: int, vec: np.ndarray) -> None:
        self.id = id_
        self.vec = vec
        self.n_outlier = 0
        self.n_inlier = 0
        self.init_entry()

    def init_entry(self) -> None:
        """`ISBIndex.ISBEntry.initEntry` — resets everything except the
        lifetime counters (`src/core/mcodbase/ISBIndex.java:53-59`)."""
        self.mc = None
        self.rmc: set = set()
        self.count_after = 0
        self.etype = INLIER_PD
        self.nn_before: list[int] = []  # id-sorted preceding neighbors

    # nn_before bookkeeping (`ISBIndex.java:70-126`)
    def add_prec_neigh(self, qid: int) -> None:
        pos = bisect_left(self.nn_before, qid)
        if pos >= len(self.nn_before) or self.nn_before[pos] != qid:
            self.nn_before.insert(pos, qid)

    def remove_prec_neigh(self, qid: int) -> None:
        pos = bisect_left(self.nn_before, qid)
        if pos < len(self.nn_before) and self.nn_before[pos] == qid:
            self.nn_before.pop(pos)

    def min_prec_neigh(self, since_id: int) -> int | None:
        pos = bisect_left(self.nn_before, since_id)
        return self.nn_before[pos] if pos < len(self.nn_before) else None

    def count_prec_neighs(self, since_id: int) -> int:
        return len(self.nn_before) - bisect_left(self.nn_before, since_id)


class MicroCluster:
    """Center + members in insertion order (`src/core/mcodbase/MicroCluster.java`).
    Never recenters; the center entry is also a member.  ``uid`` is a
    process-unique serial used for Rmc membership (the reference compares
    clusters by center coordinates, `MicroCluster.java:63-103`)."""

    __slots__ = ("center", "entries", "uid", "_mat")

    _next_uid = 0

    def __init__(self, center: Entry) -> None:
        self.center = center
        self.entries: list[Entry] = [center]
        self._mat: np.ndarray | None = None  # cached member-vector matrix
        MicroCluster._next_uid += 1
        self.uid = MicroCluster._next_uid

    def add(self, e: Entry) -> None:
        self.entries.append(e)
        self._mat = None

    def remove(self, e: Entry) -> None:
        self.entries.remove(e)
        self._mat = None

    def matrix(self) -> np.ndarray:
        """Member vectors, row i == entries[i] — rebuilt lazily so the
        member-scan distance check is ONE vectorized kernel instead of a
        Python loop (the per-item hot spot at ~90k scalar calls)."""
        if self._mat is None:
            self._mat = np.stack([e.vec for e in self.entries])
        return self._mat


class _SlotIndex:
    """Slotted coordinate matrix supporting vectorized range search.

    Replaces the reference's M-tree-backed ISB (`src/core/mcodbase/
    ISBIndex.java:133-268`): insert/remove O(1) via swap-remove, range
    query one numpy distance computation over the live slots.
    """

    def __init__(self, dims: int, cap: int = 256, dist_fn=_euclidean) -> None:
        self.ids = np.empty(cap, dtype=np.int64)
        self.vecs = np.empty((cap, dims), dtype=np.float64)
        self.n = 0
        self.slot_of: dict[int, int] = {}
        self.entry_of: dict[int, Entry] = {}
        self.dist_fn = dist_fn

    def insert(self, e: Entry) -> None:
        if self.n == len(self.ids):
            self.ids = np.concatenate([self.ids, np.empty_like(self.ids)])
            self.vecs = np.concatenate([self.vecs, np.empty_like(self.vecs)])
        s = self.n
        self.ids[s] = e.id
        self.vecs[s] = e.vec
        self.slot_of[e.id] = s
        self.entry_of[e.id] = e
        self.n += 1

    def remove(self, e: Entry) -> None:
        s = self.slot_of.pop(e.id, None)
        if s is None:
            return
        del self.entry_of[e.id]
        last = self.n - 1
        if s != last:
            self.ids[s] = self.ids[last]
            self.vecs[s] = self.vecs[last]
            self.slot_of[int(self.ids[s])] = s
        self.n -= 1

    def range_search(self, vec: np.ndarray, radius: float):
        """(entries, distances) within *radius*, sorted ascending by id."""
        if self.n == 0:
            return [], np.empty(0)
        dist = self.dist_fn(self.vecs[: self.n], vec)
        hit = np.nonzero(dist <= radius)[0]
        if hit.size == 0:
            return [], np.empty(0)
        ids_hit = self.ids[hit]
        order = np.argsort(ids_hit, kind="stable")
        return [self.entry_of[int(i)] for i in ids_hit[order]], dist[hit][order]

    def all_entries(self) -> list[Entry]:
        return [self.entry_of[int(i)] for i in np.sort(self.ids[: self.n])]

    @property
    def size(self) -> int:
        return self.n


class _DetectorBase:
    """Window bookkeeping shared by all four algorithms
    (`src/core/OutlierDetector.java` + `src/algorithms/MCODBase.java`)."""

    def __init__(self, window_size: int, slide_size: int, radius: float, k: int,
                 metric="euclidean") -> None:
        self.batch_dist = resolve_metric(metric)
        self.pair_dist = resolve_pair_metric(metric)
        self.window_size = window_size
        self.slide_size = slide_size
        self.radius = float(radius)
        self.k = int(k)
        self.theta = 1.0  # MCODBase.java:95
        self.window_start = FIRST_OBJ_ID
        self.window_end = window_size  # inclusive
        self.window: list[Entry] = []  # insertion order == id order
        self.obj_id = FIRST_OBJ_ID
        self.outliers_found: set[int] = set()
        self.event_heap: list[tuple[int, int]] = []  # (exp_time, id)
        self.event_members: set[tuple[int, int]] = set()  # TreeSet dedup semantics
        self.entry_by_id: dict[int, Entry] = {}
        self.n_range_queries = 0
        self.n_both = 0
        self.n_only_inlier = 0
        self.n_only_outlier = 0
        # engine-level event counters (not in the reference): total
        # classification events, for per-slide drift-rate metrics
        self.total_outlier_classifications = 0
        self.total_inlier_classifications = 0
        # new entries whose initial classification was OUTLIER (per insert)
        self.n_insert_outliers = 0

    # --- tiny helpers, MCODBase.java:140-161 / OutlierDetector.java:35-41
    def in_window(self, id_: int) -> bool:
        return self.window_start <= id_ <= self.window_end

    def expiration_time(self, id_: int) -> int:
        return id_ + self.window_size + 1

    def slide_of(self, id_: int) -> int:
        return (id_ - 1) // self.slide_size + 1

    def is_safe_inlier(self, e: Entry) -> bool:
        return e.count_after >= self.k

    def do_slide(self) -> None:
        self.window_start += self.slide_size
        self.window_end += self.slide_size

    def set_entry_type(self, e: Entry, etype: int) -> None:
        e.etype = etype
        if etype == OUTLIER:
            e.n_outlier += 1
            self.total_outlier_classifications += 1
        else:
            e.n_inlier += 1
            self.total_inlier_classifications += 1

    def add_to_event_queue(self, x: Entry, min_prec_id: int | None) -> None:
        if min_prec_id is not None:
            item = (self.expiration_time(min_prec_id), x.id)
            if item not in self.event_members:
                self.event_members.add(item)
                heapq.heappush(self.event_heap, item)

    def _pop_due_event(self):
        while self.event_heap and self.event_heap[0][0] <= self.window_end:
            item = heapq.heappop(self.event_heap)
            self.event_members.discard(item)
            return item
        return None

    # --- lifecycle, MCODBase.java:163-227
    def add_entry(self, e: Entry) -> None:
        self.window.append(e)
        self.entry_by_id[e.id] = e

    def remove_entry(self, e: Entry) -> None:
        del self.entry_by_id[e.id]
        if (e.n_inlier > 0) and (e.n_outlier > 0):
            self.n_both += 1
        elif e.n_inlier > 0:
            self.n_only_inlier += 1
        else:
            self.n_only_outlier += 1
        self.evaluate_as_outlier(e)

    def evaluate_as_outlier(self, e: Entry) -> None:
        if e.n_outlier > 0 and e.n_inlier == 0:
            self.outliers_found.add(e.id)

    def evaluate_remaining_elems_in_win(self) -> None:
        for e in self.window:
            self.evaluate_as_outlier(e)

    def get_results(self) -> dict:
        n_both, n_in, n_out = self.n_both, self.n_only_inlier, self.n_only_outlier
        for e in self.window:
            if (e.n_inlier > 0) and (e.n_outlier > 0):
                n_both += 1
            elif e.n_inlier > 0:
                n_in += 1
            else:
                n_out += 1
        return {
            "nBothInlierOutlier": n_both,
            "nOnlyInlier": n_in,
            "nOnlyOutlier": n_out,
            "nRangeQueriesExecuted": self.n_range_queries,
        }

    def _get_expired_entries(self) -> list[Entry]:
        out = []
        for e in self.window:  # stops at first non-expired: MCOD.java:335-346
            if e.id < self.window_start:
                out.append(e)
            else:
                break
        return out

    def _drop_expired_from_window(self, n_expired: int) -> None:
        if n_expired:
            del self.window[:n_expired]

    # count used by every classification site
    def _count(self, e: Entry) -> int:
        return e.count_after + e.count_prec_neighs(self.window_start)


class _MCODCore(_DetectorBase):
    """Shared MCOD machinery: micro-clusters, Rmc, event queue, expiry.

    The PD index is abstract: `_pd_*` hooks are implemented by the exact
    (slotted-matrix) and LSH subclasses.
    """

    def __init__(self, window_size, slide_size, radius, k, dims,
                 metric="euclidean") -> None:
        super().__init__(window_size, slide_size, radius, k, metric=metric)
        self.dims = dims
        self.mcs: list[MicroCluster] = []
        self._mc_centers = np.empty((0, dims))
        self.entries_reinsert: set[int] = set()

    # --- micro-cluster registry (MCODBase.java:176-194, 241-251)
    def _rebuild_mc_centers(self) -> None:
        if self.mcs:
            self._mc_centers = np.stack([m.center.vec for m in self.mcs])
        else:
            self._mc_centers = np.empty((0, self.dims))

    def add_micro_cluster(self, mc: MicroCluster) -> None:
        self.mcs.append(mc)
        self._rebuild_mc_centers()

    def remove_micro_cluster(self, mc: MicroCluster) -> None:
        self.mcs.remove(mc)
        self._rebuild_mc_centers()

    def range_search_mc(self, vec: np.ndarray, radius: float):
        """Micro-clusters within *radius* of vec, ascending by distance
        (`MCODBase.RangeSearchMC`, MCODBase.java:241-251)."""
        if not self.mcs:
            return []
        dist = self.batch_dist(self._mc_centers, vec)
        hit = np.nonzero(dist <= radius)[0]
        order = hit[np.argsort(dist[hit], kind="stable")]
        return [(self.mcs[i], dist[i]) for i in order]

    # --- PD index hooks
    def _pd_insert(self, e: Entry) -> None: ...
    def _pd_remove(self, e: Entry) -> None: ...
    def _pd_all_entries(self) -> list[Entry]: ...
    def _pd_size(self) -> int: ...

    def _dist(self, a: Entry, b: Entry) -> float:
        return self.pair_dist(a.vec, b.vec)

    def _mc_members_in_range(self, mc: MicroCluster, vec: np.ndarray):
        """Members of *mc* with dist(member, vec) <= R, in entries order —
        one batched distance kernel (identical set/order to the scalar scan
        `for q in mc.entries: if dist <= R`)."""
        ents = mc.entries
        if len(ents) <= 4:
            pd_ = self.pair_dist
            return [q for q in ents if pd_(q.vec, vec) <= self.radius]
        d = self.batch_dist(mc.matrix(), vec)
        return [ents[i] for i in np.nonzero(d <= self.radius)[0]]

    # --- addNeighbor (MCOD.java:50-80; identical in all variants)
    def add_neighbor(self, entry: Entry, q: Entry, update_state: bool) -> None:
        if not self.in_window(q.id):
            return
        if self.slide_of(q.id) >= self.slide_of(entry.id):
            entry.count_after += 1
        else:
            entry.add_prec_neigh(q.id)
        if update_state:
            if entry.etype == OUTLIER and self._count(entry) >= self.k:
                self.set_entry_type(entry, INLIER_PD)
                if not self.is_safe_inlier(entry):
                    self.add_to_event_queue(entry, entry.min_prec_neigh(self.window_start))

    def _maybe_update(self, q: Entry, new_entry: Entry, is_new: bool) -> None:
        """The isNewEntry/entriesReinsert gate around neighbor updates
        (MCOD.java:117-124, 144-153)."""
        if is_new:
            self.add_neighbor(q, new_entry, True)
        elif q.id in self.entries_reinsert:
            self.add_neighbor(q, new_entry, True)

    # --- event queue drain (MCOD.java:228-261)
    def process_event_queue(self, expired: Entry) -> None:
        item = self._pop_due_event()
        while item is not None:
            x = self.entry_by_id.get(item[1])
            if x is not None and self.in_window(x.id) and x.mc is None:
                x.remove_prec_neigh(expired.id)
                if self._count(x) < self.k:
                    self.set_entry_type(x, OUTLIER)
                else:
                    if not self.is_safe_inlier(x):
                        self.add_to_event_queue(x, x.min_prec_neigh(self.window_start))
            item = self._pop_due_event()

    # --- expiry (MCOD.java:263-300)
    def process_expired_entries(self, expired_entries: list[Entry]) -> None:
        for exp in expired_entries:
            mc = exp.mc
            if mc is not None:
                mc.remove(exp)
                if len(mc.entries) < self.k + 1:  # dissolve below k+1 members
                    self.remove_micro_cluster(mc)
                    self.entries_reinsert = {q.id for q in mc.entries}
                    for q in mc.entries:  # insertion order, incl. center first
                        q.init_entry()
                        self.process_new_entry(q, False)
            else:
                self._pd_remove(exp)
            self.remove_entry(exp)
            self.process_event_queue(exp)

    # --- per-slide driver (MCOD.java:302-333)
    def process_new_stream_objects(self, pts: np.ndarray) -> None:
        if len(self.window) >= self.window_size:
            self.do_slide()
            expired = self._get_expired_entries()
            self.process_expired_entries(expired)
            self._drop_expired_from_window(len(expired))
        for row in np.asarray(pts, dtype=np.float64):
            e = Entry(self.obj_id, row)
            self.add_entry(e)
            self.process_new_entry(e, True)
            if e.etype == OUTLIER:
                self.n_insert_outliers += 1
            self.obj_id += 1

    # --- classification of a (re)inserted PD entry (MCOD.java:204-218)
    def _classify_pd_entry(self, e: Entry) -> None:
        if self._count(e) >= self.k:
            self.set_entry_type(e, INLIER_PD)
            if not self.is_safe_inlier(e):
                self.add_to_event_queue(e, e.min_prec_neigh(self.window_start))
        else:
            self.set_entry_type(e, OUTLIER)

    def process_new_entry(self, new_entry: Entry, is_new: bool) -> None:
        raise NotImplementedError


class MCOD(_MCODCore):
    """Exact micro-cluster outlier detection (`src/algorithms/MCOD.java`)."""

    def __init__(self, window_size: int, slide_size: int, radius: float, k: int,
                 dims: int, metric="euclidean"):
        super().__init__(window_size, slide_size, radius, k, dims, metric=metric)
        self.pd = _SlotIndex(dims, dist_fn=self.batch_dist)

    def _pd_insert(self, e): self.pd.insert(e)
    def _pd_remove(self, e): self.pd.remove(e)
    def _pd_all_entries(self): return self.pd.all_entries()
    def _pd_size(self): return self.pd.size

    # MCOD.java:82-226
    def process_new_entry(self, new_entry: Entry, is_new: bool) -> None:
        results_mc = self.range_search_mc(new_entry.vec, 1.5 * self.radius)
        mc_closest = results_mc[0][0] if results_mc else None

        found_mc = False
        if mc_closest is not None:
            if self._dist(new_entry, mc_closest.center) <= self.radius / 2:
                found_mc = True

        if found_mc:
            new_entry.mc = mc_closest
            self.set_entry_type(new_entry, INLIER_MC)
            mc_closest.add(new_entry)
            # update PD entries whose Rmc contains the target cluster:
            # ONE vectorized range search (ascending id, like the scalar
            # _pd_all_entries scan) then the rmc filter
            entries, _ = self.pd.range_search(new_entry.vec, self.radius)
            for q in entries:
                if mc_closest.uid in q.rmc:
                    self._maybe_update(q, new_entry, is_new)
        else:
            self.n_range_queries += 1
            set_nc: list[Entry] = []
            set_nnc: list[Entry] = []
            entries, dists = self.pd.range_search(new_entry.vec, 1.5 * self.radius)
            for q, dist in zip(entries, dists):
                if dist <= self.radius:
                    self.add_neighbor(new_entry, q, False)
                    self._maybe_update(q, new_entry, is_new)
                if dist <= self.radius / 2.0:
                    set_nc.append(q)
                else:
                    set_nnc.append(q)

            if len(set_nc) >= self.theta * self.k:
                # spawn a new micro-cluster centered at new_entry
                mc_new = MicroCluster(new_entry)
                self.add_micro_cluster(mc_new)
                new_entry.mc = mc_new
                self.set_entry_type(new_entry, INLIER_MC)
                for q in set_nc:
                    q.mc = mc_new
                    mc_new.add(q)
                    self.set_entry_type(q, INLIER_MC)
                    self._pd_remove(q)
                for q in set_nnc:
                    q.rmc.add(mc_new.uid)
            else:
                # neighbors from nearby micro-clusters' members
                for mc, _ in results_mc:
                    for q in self._mc_members_in_range(mc, new_entry.vec):
                        self.add_neighbor(new_entry, q, False)
                self._pd_insert(new_entry)
                self._classify_pd_entry(new_entry)
                for mc, _ in results_mc:
                    new_entry.rmc.add(mc.uid)


class ApproxMCOD(_MCODCore):
    """MCOD with a bounded PD index and approximation radius
    (`src/algorithms/ApproxMCOD.java:46-307`).

    Deltas vs exact MCOD, mirrored faithfully:
      * while ``|PD| > pd_limit`` evict uniformly-random *safe* inliers
        from PD (ApproxMCOD.java:159-173);
      * if an eviction happened this insert, candidates with
        ``R/2 < dist <= ar`` (``ar = R/2 + ar_factor*R``) also count toward
        and join a newly spawned cluster (setANC, ApproxMCOD.java:205-259);
      * a safe inlier is added to PD only while below ``pd_limit``
        (ApproxMCOD.java:293-304);
      * PD safe-inlier pool updated wherever neighbors are added.
    RNG is seeded (reference uses unseeded `new Random()`, ApproxMCOD.java:49).
    """

    def __init__(self, window_size, slide_size, radius, k, dims,
                 pd_limit: int, ar_factor: float, seed: int = 0,
                 metric="euclidean"):
        super().__init__(window_size, slide_size, radius, k, dims, metric=metric)
        self.pd = _SlotIndex(dims, dist_fn=self.batch_dist)
        self.pd_limit = int(pd_limit)
        self.ar = (self.radius / 2.0) + ar_factor * self.radius
        self.rng = np.random.default_rng(seed)
        self._safe_list: list[Entry] = []   # insertion-ordered safe-inlier pool
        self._safe_ids: set[int] = set()

    def _pd_insert(self, e): self.pd.insert(e)
    def _pd_remove(self, e): self.pd.remove(e)
    def _pd_all_entries(self): return self.pd.all_entries()
    def _pd_size(self): return self.pd.size

    def _safe_add(self, q: Entry) -> None:
        if q.id not in self._safe_ids:
            self._safe_ids.add(q.id)
            self._safe_list.append(q)

    def _safe_discard(self, q: Entry) -> None:
        if q.id in self._safe_ids:
            self._safe_ids.discard(q.id)
            self._safe_list.remove(q)

    def _maybe_update_safe(self, q: Entry, new_entry: Entry, is_new: bool) -> None:
        if is_new:
            self.add_neighbor(q, new_entry, True)
            if self.is_safe_inlier(q):
                self._safe_add(q)
        elif q.id in self.entries_reinsert:
            self.add_neighbor(q, new_entry, True)
            if self.is_safe_inlier(q):
                self._safe_add(q)

    def process_new_entry(self, new_entry: Entry, is_new: bool) -> None:
        results_mc = self.range_search_mc(new_entry.vec, 1.5 * self.radius)
        mc_closest = results_mc[0][0] if results_mc else None

        found_mc = False
        if mc_closest is not None:
            if self._dist(new_entry, mc_closest.center) <= self.radius / 2:
                found_mc = True

        if found_mc:
            new_entry.mc = mc_closest
            self.set_entry_type(new_entry, INLIER_MC)
            mc_closest.add(new_entry)
            entries, _ = self.pd.range_search(new_entry.vec, self.radius)
            for q in entries:
                if mc_closest.uid in q.rmc:
                    self._maybe_update_safe(q, new_entry, is_new)
        else:
            # bounded-PD eviction (ApproxMCOD.java:159-173)
            safe_inlier_deleted = False
            while self._pd_size() > self.pd_limit and self._safe_list:
                idx = int(self.rng.integers(len(self._safe_list)))
                victim = self._safe_list[idx]
                self._pd_remove(victim)
                self._safe_discard(victim)
                safe_inlier_deleted = True

            self.n_range_queries += 1
            set_nc: list[Entry] = []
            set_nnc: list[Entry] = []
            set_anc: list[Entry] = []
            entries, dists = self.pd.range_search(new_entry.vec, 1.5 * self.radius)
            for q, dist in zip(entries, dists):
                if dist <= self.radius:
                    self.add_neighbor(new_entry, q, False)
                    self._maybe_update_safe(q, new_entry, is_new)
                if dist <= self.radius / 2.0:
                    set_nc.append(q)
                else:
                    set_nnc.append(q)
                    if safe_inlier_deleted and dist <= self.ar:
                        set_anc.append(q)

            n_collected = len(set_nc) + (len(set_anc) if safe_inlier_deleted else 0)
            if n_collected >= self.theta * self.k:
                mc_new = MicroCluster(new_entry)
                self.add_micro_cluster(mc_new)
                new_entry.mc = mc_new
                self.set_entry_type(new_entry, INLIER_MC)
                for group in (set_nc, set_anc):
                    for q in group:
                        q.mc = mc_new
                        mc_new.add(q)
                        self.set_entry_type(q, INLIER_MC)
                        self._pd_remove(q)
                        if self.is_safe_inlier(q):
                            self._safe_discard(q)
                for q in set_nnc:
                    q.rmc.add(mc_new.uid)
            else:
                for mc, _ in results_mc:
                    for q in self._mc_members_in_range(mc, new_entry.vec):
                        self.add_neighbor(new_entry, q, False)
                self._classify_pd_entry(new_entry)
                # conditional PD insert (ApproxMCOD.java:293-304)
                if (not self.is_safe_inlier(new_entry)) or self._pd_size() < self.pd_limit:
                    self._pd_insert(new_entry)
                    for mc, _ in results_mc:
                        new_entry.rmc.add(mc.uid)


class LSHOD(_DetectorBase):
    """Outlier detection with LSH neighbor search, no micro-clusters
    (`src/algorithms/LSHOD.java`).  Neighbor candidates are the union of
    matching LSH buckets with **no** exact distance filter
    (LSHOD.java:223-237) — that is the approximation."""

    def __init__(self, window_size, slide_size, radius, k, dims,
                 num_hashes: int = 4, num_tables: int = 10, w: int | None = None,
                 seed: int = 0):
        super().__init__(window_size, slide_size, radius, k)
        # Executor defaults: 4 hashes, 10 tables, w = floor(R) (Executor.java:102-104).
        # Deviation: clamp to >=1 — the Java reference runs degenerately with
        # w=0 (every hash collides); LSHIndex rejects w<1, so R<1 would crash
        # the CLI instead of running.
        if w is None:
            w = max(1, int(radius))
        self.rng = np.random.default_rng(seed)
        self.index = LSHIndex(num_hashes, num_tables, w, dims, k, self.rng)

    def add_neighbor(self, entry: Entry, q: Entry, update_state: bool) -> None:
        if not self.in_window(q.id):
            return
        if self.slide_of(q.id) >= self.slide_of(entry.id):
            entry.count_after += 1
        else:
            entry.add_prec_neigh(q.id)
        if update_state:
            if entry.etype == OUTLIER and self._count(entry) >= self.k:
                self.set_entry_type(entry, INLIER_PD)  # "INLIER" in LSHOD
                if not self.is_safe_inlier(entry):
                    self.add_to_event_queue(entry, entry.min_prec_neigh(self.window_start))

    # LSHOD.java:223-253
    def process_new_entry(self, e: Entry) -> None:
        results = self.index.query(e)
        self.n_range_queries += 1
        for q in results:
            self.add_neighbor(e, q, False)
            self.add_neighbor(q, e, True)
        self.index.insert(e)
        if self._count(e) >= self.k:
            self.set_entry_type(e, INLIER_PD)
            if not self.is_safe_inlier(e):
                self.add_to_event_queue(e, e.min_prec_neigh(self.window_start))
        else:
            self.set_entry_type(e, OUTLIER)

    # LSHOD.java:255-282 (no micro-cluster validity condition)
    def process_event_queue(self, expired: Entry) -> None:
        item = self._pop_due_event()
        while item is not None:
            x = self.entry_by_id.get(item[1])
            if x is not None and self.in_window(x.id):
                x.remove_prec_neigh(expired.id)
                if self._count(x) < self.k:
                    self.set_entry_type(x, OUTLIER)
                else:
                    if not self.is_safe_inlier(x):
                        self.add_to_event_queue(x, x.min_prec_neigh(self.window_start))
            item = self._pop_due_event()

    def process_expired_entries(self, expired_entries: list[Entry]) -> None:
        for exp in expired_entries:
            self.index.remove(exp)
            self.remove_entry(exp)
            self.process_event_queue(exp)

    def process_new_stream_objects(self, pts: np.ndarray) -> None:
        if len(self.window) >= self.window_size:
            self.do_slide()
            expired = self._get_expired_entries()
            self.process_expired_entries(expired)
            self._drop_expired_from_window(len(expired))
        for row in np.asarray(pts, dtype=np.float64):
            e = Entry(self.obj_id, row)
            e.etype = OUTLIER  # LSH Entry inits to OUTLIER (core/lsh/Entry.java:9-28)
            self.add_entry(e)
            self.process_new_entry(e)
            if e.etype == OUTLIER:
                self.n_insert_outliers += 1
            self.obj_id += 1


class ApproxMCLSHOD(_MCODCore):
    """MCOD whose PD index is LSH (`src/algorithms/ApproxMCLSHOD.java`).

    Unlike LSHOD, bucket query results **are** distance-filtered against R
    for neighbor updates (ApproxMCLSHOD.java:144-165); every query result is
    still routed to setNC/setNNC by distance (no 1.5R cutoff — mirrored).
    Executor defaults: 5 hashes, 10 tables, w = floor(3R/2)
    (Executor.java:106-109).
    """

    def __init__(self, window_size, slide_size, radius, k, dims,
                 num_hashes: int = 5, num_tables: int = 10, w: int | None = None,
                 seed: int = 0):
        super().__init__(window_size, slide_size, radius, k, dims)
        if w is None:
            w = int(3 * radius / 2)
        self.rng = np.random.default_rng(seed)
        self.index = LSHIndex(num_hashes, num_tables, w, dims, k, self.rng)

    def _pd_insert(self, e): self.index.insert(e)
    def _pd_remove(self, e): self.index.remove(e)
    def _pd_all_entries(self): return self.index.get_all_entries()
    def _pd_size(self): return len(self.index.get_all_entries())

    def process_new_entry(self, new_entry: Entry, is_new: bool) -> None:
        results_mc = self.range_search_mc(new_entry.vec, 1.5 * self.radius)
        mc_closest = results_mc[0][0] if results_mc else None

        found_mc = False
        if mc_closest is not None:
            if self._dist(new_entry, mc_closest.center) <= self.radius / 2:
                found_mc = True

        if found_mc:
            new_entry.mc = mc_closest
            self.set_entry_type(new_entry, INLIER_MC)
            mc_closest.add(new_entry)
            for q in self._pd_all_entries():
                if mc_closest.uid in q.rmc:
                    if self._dist(q, new_entry) <= self.radius:
                        self._maybe_update(q, new_entry, is_new)
        else:
            self.n_range_queries += 1
            set_nc: list[Entry] = []
            set_nnc: list[Entry] = []
            for q in self.index.query(new_entry):
                dist = self._dist(new_entry, q)
                if dist <= self.radius:
                    self.add_neighbor(new_entry, q, False)
                    self._maybe_update(q, new_entry, is_new)
                if dist <= self.radius / 2.0:
                    set_nc.append(q)
                else:
                    set_nnc.append(q)

            if len(set_nc) >= self.theta * self.k:
                mc_new = MicroCluster(new_entry)
                self.add_micro_cluster(mc_new)
                new_entry.mc = mc_new
                self.set_entry_type(new_entry, INLIER_MC)
                for q in set_nc:
                    q.mc = mc_new
                    mc_new.add(q)
                    self.set_entry_type(q, INLIER_MC)
                    self._pd_remove(q)
                for q in set_nnc:
                    q.rmc.add(mc_new.uid)
            else:
                for mc, _ in results_mc:
                    for q in self._mc_members_in_range(mc, new_entry.vec):
                        self.add_neighbor(new_entry, q, False)
                self._pd_insert(new_entry)
                self._classify_pd_entry(new_entry)
                for mc, _ in results_mc:
                    new_entry.rmc.add(mc.uid)


def run_detector(det, points: np.ndarray):
    """Drive a detector over a full stream in ``slide``-sized micro-batches,
    mirroring `Executor.performOutlierDetection` (`src/Executor.java:94-137`):
    loop ``ProcessNewStreamObjects(slide batch)`` then flush the final window.

    Returns (sorted pure-outlier ids, counters dict).
    """
    points = np.asarray(points, dtype=np.float64)
    s = det.slide_size
    for start in range(0, len(points), s):
        det.process_new_stream_objects(points[start : start + s])
    det.evaluate_remaining_elems_in_win()
    return sorted(det.outliers_found), det.get_results()
