"""End-to-end validation pipeline: checks fire on injected violations,
sha256 invariant holds, runs resume from checkpoint."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from approximate_anomaly_detection_in_data_streams_ray.checks.base import ValidationConfig
from approximate_anomaly_detection_in_data_streams_ray.synth import generate_code_files


@pytest.fixture(scope="module")
def validated(ray_session, tmp_path_factory):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.runner import (
        run_validation,
    )

    base = tmp_path_factory.mktemp("val")
    src, out = str(base / "src"), str(base / "out")
    man = generate_code_files(src, n_rows=20_000, n_repos=16, seed=42, n_shards=4)
    cfg = ValidationConfig(target_rows_per_item=4000, extract_concurrency=2,
                           drift_concurrency=2)
    summary = run_validation(src, out, cfg)
    return src, out, man, cfg, summary


def _verdicts(out):
    return pq.read_table(os.path.join(out, "verdicts", "verdicts.parquet")).to_pandas()


def _violations(out, check):
    files = glob.glob(os.path.join(out, "violations", check, "**", "*.parquet"),
                      recursive=True)
    import pyarrow as pa

    tables = [pq.read_table(f) for f in files]
    return pa.concat_tables(tables).to_pandas() if tables else None


def test_null_and_length_violations_match_manifest(validated):
    src, out, man, cfg, _ = validated
    v = _violations(out, "stats")
    got_null_lang = sorted(v[v["check"] == "null_lang"]["row_ref"])
    assert got_null_lang == sorted(set(man.null_lang))
    got_len = sorted(set(v[v["check"] == "content_len_range"]["row_ref"]))
    assert got_len == sorted(set(man.len_violations))


def test_uniqueness_finds_injected_duplicates(validated):
    src, out, man, cfg, _ = validated
    v = _violations(out, "uniqueness")
    got = set(v["row_ref"])
    # every injected duplicate key appears (both copies are violations)
    assert set(man.dup_keys) <= got


def test_referential_finds_orphans(validated):
    src, out, man, cfg, _ = validated
    v = _violations(out, "referential")
    bad_repos = set(v[v["check"] == "referential_repo"]["partition_key"])
    assert bad_repos == set(man.orphan_repo)
    bad_commit_refs = set(v[v["check"] == "referential_commit"]["row_ref"])
    assert set(man.orphan_commit) <= bad_commit_refs


def test_drift_flags_exactly_drifted_repos(validated):
    src, out, man, cfg, _ = validated
    d = _verdicts(out).query("check == 'drift'")
    failed = set(d[~d["passed"]]["partition_key"])
    scoreable = {
        r["partition_key"]
        for _, r in d.iterrows()
        if json.loads(r["metrics"]).get("note") != "insufficient_rows"
    }
    expected = set(man.drift_repos) & scoreable
    assert expected, "fixture must produce at least one scoreable drift repo"
    assert failed == expected


def test_sha256_invariant_end_to_end(validated):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.runner import (
        verify_sha_invariant,
    )

    src, out, man, cfg, _ = validated
    assert verify_sha_invariant(src, out, sample=300)


def test_resume_skips_completed_items(validated):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.runner import (
        run_validation,
    )

    src, out, man, cfg, first = validated
    second = run_validation(src, out, cfg)
    assert second["n_items_skipped_resume"] == second["n_items"]
    assert second["n_rows_extracted"] == 0  # nothing re-extracted
    # verdicts unchanged
    assert second["n_verdicts"] == first["n_verdicts"]


def test_partial_run_then_resume(ray_session, tmp_path_factory):
    """Kill-and-resume: delete some item outputs + manifest markers, rerun,
    and the run completes only the missing items."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.runner import (
        run_validation,
    )

    base = tmp_path_factory.mktemp("resume")
    src, out = str(base / "src"), str(base / "out")
    generate_code_files(src, n_rows=6000, n_repos=8, seed=7, n_shards=2)
    cfg = ValidationConfig(target_rows_per_item=1500, extract_concurrency=2,
                           drift_concurrency=2)
    run_validation(src, out, cfg, checks=["stats"])

    # simulate a crash that lost one extraction item
    markers = sorted(glob.glob(os.path.join(out, "_manifest", "features__*.json")))
    lost = markers[0]
    item_id = json.load(open(lost))["unit"].split("/", 1)[1]
    os.remove(lost)
    shutil.rmtree(os.path.join(out, "features", f"item={item_id}"))

    summary = run_validation(src, out, cfg, checks=["stats"])
    assert summary["n_items_skipped_resume"] == summary["n_items"] - 1
    assert os.path.exists(
        os.path.join(out, "features", f"item={item_id}", "part.parquet")
    )


def test_drift_with_approx_algorithm(ray_session, tmp_path_factory):
    """The drift check runs with every detector variant behind config."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.runner import (
        run_validation,
    )

    base = tmp_path_factory.mktemp("approx")
    src = str(base / "src")
    generate_code_files(src, n_rows=8000, n_repos=6, seed=13, n_shards=2)
    for algo in ("approx_mcod", "lshod", "approx_mclshod"):
        out = str(base / f"out_{algo}")
        cfg = ValidationConfig(drift_algorithm=algo, target_rows_per_item=2000,
                               extract_concurrency=2, drift_concurrency=2)
        s = run_validation(src, out, cfg, checks=["drift"])
        assert s["n_verdicts"] > 0, algo


def test_schema_check_flags_bad_file(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.runner import (
        run_validation,
    )

    base = tmp_path_factory.mktemp("schema")
    src = str(base / "src")
    generate_code_files(src, n_rows=1500, n_repos=4, seed=3, n_shards=2)
    # corrupt one shard: drop a column and add a stray one
    bad = os.path.join(src, "code_files", "shard-0000.parquet")
    t = pq_.read_table(bad).drop_columns(["lang"])
    t = t.append_column("stray", pa.array(["x"] * len(t)))
    pq_.write_table(t, bad)

    out = str(base / "out")
    cfg = ValidationConfig(target_rows_per_item=1000, extract_concurrency=2)
    s = run_validation(src, out, cfg, checks=["schema"])
    v = _verdicts(out).query("check == 'schema'")
    assert len(v) == 2
    failed = v[~v["passed"]]
    assert list(failed["partition_key"]) == ["shard-0000.parquet"]
    probs = json.loads(failed.iloc[0]["metrics"])["problems"]
    assert any("missing column lang" in p for p in probs)
    assert any("unexpected column stray" in p for p in probs)


def test_constraint_violations_match_manifest(validated):
    """The constraints check catches exactly the planted malformed
    commits, traversal paths, and unknown langs — and nothing else."""
    src, out, man, cfg, _ = validated
    v = _violations(out, "constraints")
    got_commit = set(v[v["check"] == "constraint_commit"]["row_ref"])
    assert got_commit == set(man.bad_commit_format)
    got_path = set(v[v["check"] == "constraint_path"]["row_ref"])
    assert got_path == set(man.bad_path_shape)
    got_lang = set(v[v["check"] == "constraint_lang"]["row_ref"])
    assert got_lang == set(man.bad_lang_value)
    # verdicts: every flagged partition failed with the right counts
    d = _verdicts(out)
    c = d[d["check"].str.startswith("constraint_")]
    assert not c["passed"].any()
    assert int(c["n_violations"].sum()) == len(v)


def test_resume_adds_newly_enabled_check(ray_session, tmp_path_factory):
    """An out_dir from a run WITHOUT constraints, re-validated with the
    default check set, gains exactly the manifest's constraint
    violations — features are not re-extracted, only the new per-item
    products are produced."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.runner import (
        run_validation,
    )

    base = tmp_path_factory.mktemp("resume_newcheck")
    src, out = str(base / "src"), str(base / "out")
    man = generate_code_files(src, n_rows=6000, n_repos=8, seed=7, n_shards=2)
    cfg = ValidationConfig(target_rows_per_item=2000, extract_concurrency=2,
                           drift_concurrency=2)
    first = run_validation(src, out, cfg,
                           checks=["schema", "stats", "uniqueness"])
    assert _violations(out, "constraints") is None

    second = run_validation(src, out, cfg)   # defaults incl. constraints
    assert second["n_rows_extracted"] == 0   # features reused
    v = _violations(out, "constraints")
    got = set(v[v["check"] == "constraint_commit"]["row_ref"])
    assert got == set(man.bad_commit_format)
