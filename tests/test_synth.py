"""The deterministic generator and its ground-truth manifest."""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow.parquet as pq

from approximate_anomaly_detection_in_data_streams_ray.synth import (
    generate_code_files,
    generate_stream_points,
    load_manifest,
)


def test_generator_is_deterministic(tmp_path):
    a = generate_code_files(str(tmp_path / "a"), n_rows=1500, n_repos=12, seed=7)
    b = generate_code_files(str(tmp_path / "b"), n_rows=1500, n_repos=12, seed=7)
    assert a.to_json() == b.to_json()
    ta = pq.read_table(sorted(glob.glob(str(tmp_path / "a/code_files/*.parquet")))[0])
    tb = pq.read_table(sorted(glob.glob(str(tmp_path / "b/code_files/*.parquet")))[0])
    assert ta.equals(tb)


def test_manifest_reflects_injections(synth_dir):
    out, man = synth_dir
    assert man.n_rows > 0
    assert len(man.null_lang) >= 2
    assert len(man.dup_keys) >= 2
    assert len(man.drift_repos) >= 1
    assert len(man.orphan_repo) == 2
    files = glob.glob(os.path.join(out, "code_files", "*.parquet"))
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == man.n_rows
    assert load_manifest(out)["n_rows"] == man.n_rows


def test_recorded_sha256_matches_content(synth_dir):
    out, man = synth_dir
    f = sorted(glob.glob(os.path.join(out, "code_files", "*.parquet")))[0]
    t = pq.read_table(f)
    for i in range(min(50, t.num_rows)):
        repo = t["repo"][i].as_py()
        path = t["path"][i].as_py() or ""
        commit = t["commit"][i].as_py() or ""
        ref = f"{repo}/{path}@{commit}"
        digest = hashlib.sha256(t["content"][i].as_py().encode()).hexdigest()
        assert man.sha256[ref] == digest


def test_stream_points_deterministic():
    a = generate_stream_points(500, 3, seed=5)
    b = generate_stream_points(500, 3, seed=5)
    assert (a == b).all()
    assert a.shape == (500, 3)
