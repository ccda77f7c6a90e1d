"""Shared fixtures.  Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    """Small deterministic code_files corpus + manifest, generated once."""
    from approximate_anomaly_detection_in_data_streams_ray.synth import generate_code_files

    out = str(tmp_path_factory.mktemp("synth"))
    man = generate_code_files(out, n_rows=4000, n_repos=30, seed=42, n_shards=4,
                              record_sha=True)
    return out, man
