"""Independent brute-force oracle for the exact sliding-window semantics.

This is NOT the production detector — it is a deliberately-simple O(n·W)
second implementation used only by tests, derived from the *definition*
rather than the reference's incremental structure, so that agreement with
:class:`..state.detectors.MCOD` is a meaningful two-implementation check.

Definition being checked (SURVEY.md §2.4, §2.7):
  * ids 1..n in arrival order; count-based window of size W sliding by
    ``slide``; window = ids in ``[start, end]`` inclusive; the window fills
    to W before the first slide; final partial window flushed at stream end.
  * neighbors: Euclidean distance <= R.
  * a point's neighbor count at a moment = permanent count of
    same-or-later-slide neighbors (they can never expire before the point)
    + preceding-slide neighbors whose id >= current window start.
  * **pure outlier** = a point whose neighbor count never reached k at any
    moment of its lifetime.  (Equivalent to the reference's "flagged
    outlier at least once and never inlier", `OutlierDetector.java:49-54`:
    MCOD promotes to inlier exactly when the count reaches k, demotes via
    the event queue exactly when expiries drop it below k, and micro-cluster
    membership implies count >= k — see the proof sketch in tests.)

Counter parity: ``nOnlyOutlier`` equals the pure-outlier total exactly.
``nOnlyInlier``/``nBothInlierOutlier`` can legitimately differ from MCOD by
the transient outlier classifications MCOD emits while re-inserting members
of a dissolved micro-cluster (order-dependent in the reference itself via
M-tree traversal order); the oracle reports the transient-free values.

Alignment caveat (reference quirk): when ``W % slide != 0`` (or during the
initial fill when ``W`` is not a whole number of slides), arrivals can have
ids beyond the not-yet-slid ``windowEnd`` — "ghosts".  The reference's
``addNeighbor`` in-window guard (`MCOD.java:50-54`) skips every update in
which a ghost is the counted side (replicated here), BUT its micro-cluster
spawn/join branches carry no such guard (`MCOD.java:94-129,163-189`): a
ghost arrival can still absorb in-window points into a new cluster and mark
them inlier without their neighbor counts ever reflecting it.  That side
effect cannot be reproduced without simulating the full MCOD structure, so:
for aligned configs (``W % slide == 0``, the reference's canonical usage)
the oracle's pure-outlier set equals MCOD's exactly; for unaligned configs
MCOD's pure set is a subset of the oracle's (ghost-created clusters only
ever ADD inlier classifications).
"""

from __future__ import annotations

import numpy as np


def brute_force_detect(
    points: np.ndarray, window_size: int, slide_size: int, radius: float, k: int,
    metric="euclidean",
) -> tuple[list[int], dict]:
    """Return (sorted pure-outlier ids, counters) for the exact semantics.
    ``metric`` accepts the same names/callables as the detectors
    (:data:`..state.detectors.METRICS`)."""
    from .detectors import resolve_metric

    batch_dist = resolve_metric(metric)
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    W, S, R = window_size, slide_size, float(radius)

    # state per point (1-based ids; index id-1)
    count_after = np.zeros(n + 1, dtype=np.int64)
    prec: list[list[int]] = [[] for _ in range(n + 1)]  # ids, ascending
    ever_inlier = np.zeros(n + 1, dtype=bool)
    ever_outlier = np.zeros(n + 1, dtype=bool)
    is_inlier_now = np.zeros(n + 1, dtype=bool)

    window: list[int] = []  # ids, ascending
    start, end = 1, W

    def slide_of(i: int) -> int:
        return (i - 1) // S + 1

    def cnt(i: int) -> int:
        p = prec[i]
        # number of preceding neighbors still in window (ids >= start)
        lo, hi = 0, len(p)
        while lo < hi:
            mid = (lo + hi) // 2
            if p[mid] < start:
                lo = mid + 1
            else:
                hi = mid
        return int(count_after[i]) + (len(p) - lo)

    next_id = 1
    while next_id <= n:
        batch = list(range(next_id, min(next_id + S, n + 1)))
        next_id = batch[-1] + 1

        if len(window) >= W:
            start += S
            end += S
            # expire
            while window and window[0] < start:
                window.pop(0)
            # demotion moments: any current inlier whose count dropped < k
            for i in window:
                if is_inlier_now[i] and cnt(i) < k:
                    is_inlier_now[i] = False
                    ever_outlier[i] = True

        for i in batch:
            vi = pts[i - 1]
            if window:
                warr = np.array(window)
                dist = batch_dist(pts[warr - 1], vi)
                neigh = warr[dist <= R]
            else:
                neigh = np.empty(0, dtype=np.int64)
            si = slide_of(i)
            i_in_window = i <= end  # fill-phase overshoot: ids beyond the
            # (not yet slid) windowEnd are "ghosts" — the reference's
            # addNeighbor in-window guard (`MCOD.java:50-54`) skips every
            # update involving them as the q side, so ghost pairs never
            # count each other and earlier points never count a ghost.
            for j in neigh.tolist():
                if j <= end:  # addNeighbor(i, j): checks j in-window
                    # i is the newest point: every neighbor j has slide <= si
                    if slide_of(j) == si:
                        count_after[i] += 1
                    else:
                        prec[i].append(j)  # appended in ascending id order
                if i_in_window:  # addNeighbor(j, i): checks i in-window
                    # j's view of i: same-or-later slide → count_after
                    count_after[j] += 1
                    if not is_inlier_now[j] and cnt(j) >= k:
                        is_inlier_now[j] = True
                        ever_inlier[j] = True
            prec[i].sort()
            if cnt(i) >= k:
                is_inlier_now[i] = True
                ever_inlier[i] = True
            else:
                is_inlier_now[i] = False
                ever_outlier[i] = True
            window.append(i)

    ids = np.arange(1, n + 1)
    pure = ids[ever_outlier[1:] & ~ever_inlier[1:]]
    n_only_out = int((ever_outlier[1:] & ~ever_inlier[1:]).sum())
    n_only_in = int((ever_inlier[1:] & ~ever_outlier[1:]).sum())
    n_both = int((ever_inlier[1:] & ever_outlier[1:]).sum())
    return pure.tolist(), {
        "nBothInlierOutlier": n_both,
        "nOnlyInlier": n_only_in,
        "nOnlyOutlier": n_only_out,
    }
