"""Check protocol + run configuration.

A check is ``fn(features_ds, cfg, ctx) -> (violations, verdict_rows)`` where
``violations`` follows ``schema.VIOLATIONS`` and ``verdict_rows`` is a list
of dicts following ``schema.VERDICTS``.  ``ctx`` carries run-scoped handles
(output dir, manifest, broadcast refs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass
class ValidationConfig:
    # stats / nulls / length bounds
    max_null_rate: float = 0.05
    min_content_len: int = 1
    max_content_len: int = 60_000

    # drift detector (reference CLI surface: --algorithm --W --slide --R --k
    # --pdLimit --arFactor, `src/Executor.java:52-92`)
    drift_algorithm: str = "mcod"  # mcod | approx_mcod | lshod | approx_mclshod
    # euclidean | manhattan | cosine (MCOD family; the LSH variants are
    # Euclidean-only — their hash family is p-stable for L2)
    drift_metric: str = "euclidean"
    # window parameters are in detector points = distribution chunks
    drift_window: int = 64
    drift_slide: int = 16
    drift_radius: float = 1.0
    drift_k: int = 8
    drift_pd_limit: int = 24
    drift_ar_factor: float = 0.5
    drift_seed: int = 1234
    # rows per distribution chunk: the detector scores the stream of
    # per-chunk moment vectors (mean/std of the row features), not raw rows
    # — CLT-tight baseline, so a sustained shift separates sharply; set to 1
    # for reference-style raw-row detection
    drift_chunk_rows: int = 16
    # auto-calibrate R per sub-stream: median k-NN distance of the first
    # window × factor (the reference instead hand-tunes --R per dataset)
    drift_auto_radius: bool = True
    drift_radius_factor: float = 3.0
    # sub-streams with fewer detector points (chunks) than this get an
    # "insufficient rows" pass
    drift_min_points: int = 24
    # verdict thresholds: overall fraction of points ever classified
    # outlier, and the per-slide outlier-classification rate spike that
    # signals a sustained distribution shift
    drift_max_outlier_event_frac: float = 0.20
    drift_max_slide_outlier_rate: float = 0.30
    feature_scales: dict = field(
        default_factory=lambda: {"log_len": 1.0, "n_lines_log": 0.5, "lang_code": 0.15}
    )

    # execution knobs
    extract_concurrency: int = 8
    drift_concurrency: int = 8
    batch_size: int = 8192
    # small enough that a hot repo's item never becomes a straggler: the
    # Zipf head repo is ~14% of rows, so coarse items serialize the tail
    target_rows_per_item: int = 65_536
    # run independent checks concurrently (their fixed startup/shuffle
    # overheads overlap; each is a separate streaming execution)
    concurrent_checks: bool = True
    # merge per-item violation files into one sorted parquet per check
    compact_violations: bool = True
    # run drift inside the extract pass (feature table already in memory)
    drift_inline: bool = True
    # cross-item window continuation: repos that straddle work-item
    # boundaries are excluded from the per-item drift pass and scored by
    # one sequential chain task each (exact single-window parity instead of
    # the default salted subset semantics; costs a plan-time boundary read)
    drift_chain_repos: bool = False
    # hash buckets for the uniqueness dup scan (low-cardinality groupby)
    uniqueness_buckets: int = 64
    # referential route: dimensions with at most this many keys broadcast
    # (ray.put once, pc.is_in per batch); above it the check switches to
    # the bucketed anti-semi join exchange (stages/joins.py) so the dim
    # never materializes on the driver.  ~4e6 string keys ≈ a few hundred
    # MB broadcast object — comfortably under a worker heap
    referential_broadcast_max_keys: int = 4_000_000
    # buckets per key-file row group AND per exchange scan task: the key
    # writer aligns row-group boundaries to multiples of this, so a scan
    # task reading an aligned bucket range decodes exactly its own rows
    uniqueness_scan_block: int = 4


CHECK_REGISTRY: dict[str, Callable] = {}


def register_check(name: str):
    def deco(fn):
        CHECK_REGISTRY[name] = fn
        return fn

    return deco
