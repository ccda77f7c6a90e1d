"""Conformance on the reference's own benchmark inputs + property tests.

The reference ships three classic outlier CSVs (`/root/reference/datasets/`,
SURVEY.md §5).  The Java cannot run here (no JVM), so the parity bar is:
our exact MCOD must agree with the independent brute-force oracle on the
reference's real data — two implementations of the documented semantics,
fed through the same CSV reader path the reference uses.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from approximate_anomaly_detection_in_data_streams_ray.state import (
    MCOD,
    run_detector,
    brute_force_detect,
)

ARRHYTHMIA = "/root/reference/datasets/arrhythmia.csv"


@pytest.mark.skipif(not os.path.exists(ARRHYTHMIA), reason="reference data absent")
def test_mcod_on_reference_arrhythmia_matches_oracle():
    # Stream.loadFile semantics: headerless comma-separated doubles
    # (`src/core/Stream.java:39-68`); arrhythmia is 452 rows x 274 dims.
    pts = np.loadtxt(ARRHYTHMIA, delimiter=",")
    assert pts.shape == (452, 274)
    W, S, k = 200, 50, 10
    # radius in the data's own scale: median pairwise distance of a prefix
    d = pts[:100, None, :] - pts[None, :100, :]
    R = float(np.median(np.sqrt(np.einsum("ijk,ijk->ij", d, d)))) * 0.5
    got, res = run_detector(MCOD(W, S, R, k, pts.shape[1]), pts)
    want, _ = brute_force_detect(pts, W, S, R, k)
    assert got == want
    assert res["nOnlyOutlier"] == len(got)
    assert 0 < len(got) < len(pts)  # the config actually discriminates


@pytest.mark.skipif(not os.path.exists(ARRHYTHMIA), reason="reference data absent")
def test_stream_csv_reader_on_reference_data(ray_session):
    from approximate_anomaly_detection_in_data_streams_ray.sources.readers import (
        read_stream_csv,
    )

    ds = read_stream_csv(ARRHYTHMIA)
    assert ds.count() == 452
    assert len(ds.schema().names) == 274
    # containsClass drops the trailing column (`src/core/Stream.java:46-51`)
    ds2 = read_stream_csv(ARRHYTHMIA, contains_class=True)
    assert len(ds2.schema().names) == 273


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=30, max_value=220),
    slide=st.integers(min_value=3, max_value=40),
    mult=st.integers(min_value=1, max_value=6),
    k=st.integers(min_value=2, max_value=8),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_mcod_equals_oracle_on_random_streams(n, slide, mult, k, seed):
    """Property: for ANY aligned window configuration (W a multiple of the
    slide — the reference's canonical usage) and random stream, the
    micro-cluster implementation and the brute-force oracle agree exactly
    on the pure-outlier set (SURVEY.md §7 hard-part 1)."""
    rng = np.random.default_rng(seed)
    w = slide * mult
    pts = np.concatenate(
        [rng.normal(0, 1, size=(n // 2, 2)), rng.uniform(-8, 8, size=(n - n // 2, 2))]
    )
    rng.shuffle(pts)
    R = 1.5
    got, res = run_detector(MCOD(w, slide, R, k, 2), pts)
    want, _ = brute_force_detect(pts, w, slide, R, k)
    assert got == want
    assert res["nOnlyOutlier"] == len(got)


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(min_value=30, max_value=150),
    w=st.integers(min_value=10, max_value=60),
    slide=st.integers(min_value=3, max_value=40),
    k=st.integers(min_value=2, max_value=6),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_mcod_subset_of_oracle_on_unaligned_windows(n, w, slide, k, seed):
    """When W % slide != 0 the reference's ghost-arrival micro-cluster
    quirk can only ADD inlier classifications (see state/oracle.py), so
    MCOD's pure-outlier set must be a subset of the oracle's."""
    rng = np.random.default_rng(seed)
    slide = min(slide, w)
    pts = rng.normal(0, 2, size=(n, 2))
    got, _ = run_detector(MCOD(w, slide, 1.5, k, 2), pts)
    want, _ = brute_force_detect(pts, w, slide, 1.5, k)
    assert set(got) <= set(want)


SATIMAGE = "/root/reference/datasets/satimage-2.csv"
SHUTTLE = "/root/reference/datasets/shuttle.csv"


@pytest.mark.skipif(not os.path.exists(SATIMAGE), reason="reference data absent")
def test_mcod_on_reference_satimage_matches_oracle():
    """Second real reference dataset (5803 x 36): exact oracle agreement at
    a window configuration that actually discriminates."""
    pts = np.loadtxt(SATIMAGE, delimiter=",")
    assert pts.shape == (5803, 36)
    W, S, k = 500, 100, 15
    d = pts[:200, None, :] - pts[None, :200, :]
    R = float(np.median(np.sqrt(np.einsum("ijk,ijk->ij", d, d)))) * 0.6
    got, res = run_detector(MCOD(W, S, R, k, pts.shape[1]), pts)
    want, _ = brute_force_detect(pts, W, S, R, k)
    assert got == want
    assert res["nOnlyOutlier"] == len(got)
    assert 0 < len(got) < len(pts)


@pytest.mark.skipif(not os.path.exists(SHUTTLE), reason="reference data absent")
def test_mcod_on_reference_shuttle_prefix_matches_oracle():
    """Shuttle (49097 x 9), first 15k rows to keep the O(n*W) oracle fast:
    exact agreement under a larger window than the other datasets."""
    pts = np.loadtxt(SHUTTLE, delimiter=",")[:15_000]
    assert pts.shape == (15_000, 9)
    W, S, k = 1000, 250, 20
    d = pts[:300, None, :] - pts[None, :300, :]
    R = float(np.median(np.sqrt(np.einsum("ijk,ijk->ij", d, d)))) * 0.5
    got, res = run_detector(MCOD(W, S, R, k, pts.shape[1]), pts)
    want, _ = brute_force_detect(pts, W, S, R, k)
    assert got == want
    assert res["nOnlyOutlier"] == len(got)
    assert 0 < len(got) < len(pts)
