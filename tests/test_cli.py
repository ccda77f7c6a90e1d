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


def test_detect_cli_partitioned_mode(tmp_path, capsys, ray_session):
    """--partitionCol: one detector window per partition via Ray groupby."""
    import json

    import pandas as pd

    pts_a = generate_stream_points(400, 2, seed=11)
    pts_b = generate_stream_points(400, 2, seed=12)
    df = pd.DataFrame(
        {
            "part": ["a"] * 400 + ["b"] * 400,
            "f0": np.concatenate([pts_a[:, 0], pts_b[:, 0]]),
            "f1": np.concatenate([pts_a[:, 1], pts_b[:, 1]]),
        }
    )
    csv = tmp_path / "p.csv"
    df.to_csv(csv, index=False)
    out = tmp_path / "res.jsonl"
    rc = main(["detect", "--W", "200", "--slide", "50", "--R", "2.5", "--k", "10",
               "--datafile", str(csv), "--partitionCol", "part",
               "--outliersFile", str(out)])
    assert rc == 0
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    got = {r["partition"]: json.loads(r["outliers"]) for r in rows}
    want_a, _ = run_detector(MCOD(200, 50, 2.5, 10, 2), pts_a)
    want_b, _ = run_detector(MCOD(200, 50, 2.5, 10, 2), pts_b)
    assert got["a"] == want_a and got["b"] == want_b
