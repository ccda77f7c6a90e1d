"""Detector conformance: two-implementation agreement + reference semantics.

The exact MCOD implementation (micro-clusters + event queue + PD index,
mirroring `/root/reference/src/algorithms/MCOD.java`) must produce the same
pure-outlier set as the definition-level brute-force oracle on every
configuration — including window fill, tumbling windows, slide not dividing
the stream length, and high dimensions.  Approximate variants are checked
for seeded determinism and recall against exact MCOD (the reference's own
accuracy methodology, `src/AccuracyComparator.java:20-37`).
"""

from __future__ import annotations

import numpy as np
import pytest

from approximate_anomaly_detection_in_data_streams_ray.state import (
    MCOD,
    ApproxMCOD,
    LSHOD,
    ApproxMCLSHOD,
    run_detector,
    brute_force_detect,
)
from approximate_anomaly_detection_in_data_streams_ray.synth import generate_stream_points

CONFIGS = [
    # n, d, W, slide, R, k, seed
    (2000, 2, 200, 50, 2.5, 10, 7),
    (3000, 3, 500, 250, 3.0, 20, 11),
    (1500, 2, 400, 400, 2.0, 8, 3),    # tumbling (slide == W)
    (800, 9, 300, 77, 8.0, 5, 5),      # slide ∤ n, higher dim
    (150, 2, 200, 50, 2.5, 10, 1),     # stream shorter than the window
]


@pytest.mark.parametrize("n,d,W,S,R,k,seed", CONFIGS)
def test_mcod_matches_bruteforce_oracle(n, d, W, S, R, k, seed):
    pts = generate_stream_points(n, d, seed=seed)
    got, res = run_detector(MCOD(W, S, R, k, d), pts)
    want, oracle_res = brute_force_detect(pts, W, S, R, k)
    assert got == want
    # pure-outlier total == nOnlyOutlier on both sides (identical condition:
    # `OutlierDetector.evaluateAsOutlier` vs `MCODBase.updateStatistics`)
    assert res["nOnlyOutlier"] == len(got)
    assert oracle_res["nOnlyOutlier"] == len(want)
    # classification tallies cover every point exactly once
    total = res["nBothInlierOutlier"] + res["nOnlyInlier"] + res["nOnlyOutlier"]
    assert total == n


def test_window_fills_before_first_slide():
    """The first slide happens only once W elements arrived
    (`src/algorithms/MCOD.java:302-308`): with n == W every point stays in
    the window until the end-of-stream flush."""
    pts = generate_stream_points(300, 2, seed=9)
    det = MCOD(300, 100, 2.5, 5, 2)
    out, _ = run_detector(det, pts)
    assert det.window_start == 1 and det.window_end == 300
    assert len(det.window) == 300


def test_pure_outlier_requires_never_inlier():
    """A point inlier at any moment of its lifetime is never reported
    (`src/core/OutlierDetector.java:49-54`)."""
    # one dense cluster then isolated points: cluster members are inliers
    rng = np.random.default_rng(0)
    dense = rng.normal(0, 0.1, size=(100, 2))
    far = rng.uniform(50, 60, size=(10, 2))
    pts = np.concatenate([dense, far])
    out, _ = run_detector(MCOD(110, 10, 1.0, 5, 2), pts)
    assert all(o > 100 for o in out)       # only the isolated tail reported
    assert set(out) == set(range(101, 111))


def test_detector_ids_are_one_based():
    pts = generate_stream_points(50, 2, seed=2, outlier_frac=1.0, box=1e6)
    out, _ = run_detector(MCOD(50, 10, 0.001, 3, 2), pts)
    assert out[0] == 1 and out[-1] == 50   # every isolated point reported


@pytest.mark.parametrize("seed", [1, 2])
def test_approx_variants_deterministic_and_accurate(seed):
    n, d, W, S, R, k = 2500, 3, 500, 250, 3.0, 20
    pts = generate_stream_points(n, d, seed=11)
    base, _ = run_detector(MCOD(W, S, R, k, d), pts)

    def recall(test):
        return len(set(base) & set(test)) / max(1, len(base))

    a1, _ = run_detector(ApproxMCOD(W, S, R, k, d, pd_limit=W // 10, ar_factor=0.5, seed=seed), pts)
    a2, _ = run_detector(ApproxMCOD(W, S, R, k, d, pd_limit=W // 10, ar_factor=0.5, seed=seed), pts)
    assert a1 == a2, "seeded ApproxMCOD must be reproducible"
    assert recall(a1) >= 0.7  # reference's own example pair shows 70% recall

    l1, _ = run_detector(LSHOD(W, S, R, k, d, seed=seed), pts)
    l2, _ = run_detector(LSHOD(W, S, R, k, d, seed=seed), pts)
    assert l1 == l2
    assert recall(l1) >= 0.7

    m1, _ = run_detector(ApproxMCLSHOD(W, S, R, k, d, seed=seed), pts)
    m2, _ = run_detector(ApproxMCLSHOD(W, S, R, k, d, seed=seed), pts)
    assert m1 == m2
    assert recall(m1) >= 0.7


def test_accuracy_comparator_semantics():
    """Recall = |baseline ∩ test| / |baseline|
    (`src/AccuracyComparator.java:20-37`), reproduced on the reference's own
    in-repo fixture pair (`src/mcodFile.txt` vs `src/approxmcodFile.txt`)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.accuracy import recall_of

    baseline = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    test = [1, 2, 3, 6, 7, 8, 10]
    assert recall_of(baseline, test) == pytest.approx(0.7)
