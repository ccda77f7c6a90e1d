"""CLI parity: detect/compare subcommands reproduce the library results."""

from __future__ import annotations

import numpy as np

from approximate_anomaly_detection_in_data_streams_ray.__main__ import main
from approximate_anomaly_detection_in_data_streams_ray.sources.readers import (
    read_outlier_ids,
)
from approximate_anomaly_detection_in_data_streams_ray.state import MCOD, run_detector
from approximate_anomaly_detection_in_data_streams_ray.synth import generate_stream_points


def test_detect_cli_matches_library(tmp_path, capsys):
    pts = generate_stream_points(1200, 2, seed=3)
    csv = tmp_path / "stream.csv"
    np.savetxt(csv, pts, delimiter=",", fmt="%.9f")
    out = tmp_path / "outliers.txt"
    rc = main(["detect", "--algorithm", "MCOD", "--W", "200", "--slide", "50",
               "--R", "2.5", "--k", "10", "--datafile", str(csv),
               "--outliersFile", str(out)])
    assert rc == 0
    got = read_outlier_ids(str(out))
    want, _ = run_detector(MCOD(200, 50, 2.5, 10, 2), pts)
    assert got == want
    printed = capsys.readouterr().out
    assert "Total range queries" in printed


def test_detect_cli_contains_class_drops_label(tmp_path):
    pts = generate_stream_points(400, 2, seed=4)
    labeled = np.column_stack([pts, np.zeros(len(pts))])
    csv = tmp_path / "labeled.csv"
    np.savetxt(csv, labeled, delimiter=",", fmt="%.9f")
    out = tmp_path / "o.txt"
    rc = main(["detect", "--W", "200", "--slide", "50", "--R", "2.5", "--k", "10",
               "--datafile", str(csv), "--containsClass", "true",
               "--outliersFile", str(out)])
    assert rc == 0
    want, _ = run_detector(MCOD(200, 50, 2.5, 10, 2), pts)
    assert read_outlier_ids(str(out)) == want


def test_compare_cli_reference_fixture(tmp_path, capsys):
    """The reference's own in-repo example pair: recall 70%
    (`src/mcodFile.txt` vs `src/approxmcodFile.txt`)."""
    b = tmp_path / "baseline.txt"
    t = tmp_path / "test.txt"
    b.write_text("".join(f"{i}\n" for i in range(1, 11)))
    t.write_text("".join(f"{i}\n" for i in [1, 2, 3, 6, 7, 8, 10]))
    rc = main(["compare", "--baseline", str(b), "--test", str(t)])
    assert rc == 0
    assert "Recall: 70.0%" in capsys.readouterr().out
