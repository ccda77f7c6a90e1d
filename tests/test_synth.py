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


def test_corpus_identity_pinned(tmp_path):
    """The corpus is a pure function of the generator arguments: this pin
    was taken from the ORIGINAL in-memory builder before the streaming
    rewrite (verified byte-identical at two parameter sets), so any future
    edit that silently changes row values, row order, row-group layout or
    the manifest breaks this hash and, with it, cross-round record
    comparability."""
    import glob
    import hashlib

    import pyarrow.parquet as pq

    from approximate_anomaly_detection_in_data_streams_ray.synth import (
        generate_code_files,
    )

    out = str(tmp_path / "pin")
    generate_code_files(out, n_rows=3000, n_repos=20, seed=42, n_shards=4,
                        record_sha=True)
    h = hashlib.sha256()
    for f in sorted(glob.glob(f"{out}/code_files/*.parquet")):
        t = pq.read_table(f)
        for col in t.column_names:
            for v in t[col].to_pylist():
                h.update(repr(v).encode())
        h.update(str(pq.ParquetFile(f).metadata.num_row_groups).encode())
    h.update(open(f"{out}/manifest.json", "rb").read())
    assert h.hexdigest() == (
        "128463f9f49b0acf4b51ee43d4aea109daf9aedf9d15f914f175f2c9b910a162")
