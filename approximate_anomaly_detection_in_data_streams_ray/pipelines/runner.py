"""The validation runner: config → Dataset pipeline → verdicts/violations.

Rebuilds `Executor.performOutlierDetection` (`src/Executor.java:94-137`) as
a streaming, resumable, multi-check pipeline:

  plan work items (row-group ranges, salt-aware)
    → actor-pool feature extraction (wide content → narrow features,
      sha256 invariant recorded; checkpointed per item)
    → checks over the features Dataset / work items:
        stats (partial+final agg, HLL), uniqueness (hash-shuffle + count),
        referential (broadcast anti-join), drift (per-partition detector
        windows, checkpointed per item)
    → verdicts + violations + metrics written as partitioned Parquet.

Run via any Ray entry point; never calls ``ray.init`` itself.
"""

from __future__ import annotations

import glob
import json
import os
import time
from dataclasses import asdict

import pyarrow as pa
import ray

from ..checks.base import ValidationConfig
from ..checks.drift import run_drift_check
from ..checks.referential import run_referential_check
from ..checks.stats import run_stats_check
from ..checks.uniqueness import run_uniqueness_check
from ..stages.features import FeatureExtractor
from .checkpoint import Manifest, atomic_write_parquet
from .partitioning import plan_work_items


def _items_dataset(items):
    return ray.data.from_items(
        [
            {
                "item_id": it.item_id,
                "path": it.path,
                "rg_start": it.rg_start,
                "rg_end": it.rg_end,
                "n_rows": it.n_rows,
            }
            for it in items
        ]
    )


def run_validation(
    source_dir: str,
    out_dir: str,
    cfg: ValidationConfig | None = None,
    checks: list[str] | None = None,
) -> dict:
    """Validate ``source_dir/code_files/*.parquet`` against
    ``source_dir/{repos,commits}.parquet``.  Returns a summary dict and
    writes verdicts/violations/metrics under *out_dir*.  Re-running with
    the same *out_dir* resumes: completed extraction/drift items are
    skipped via the manifest."""
    cfg = cfg or ValidationConfig()
    checks = checks or ["stats", "uniqueness", "referential", "drift"]
    t_start = time.time()
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)

    paths = sorted(glob.glob(os.path.join(source_dir, "code_files", "*.parquet")))
    if not paths:
        raise FileNotFoundError(f"no parquet under {source_dir}/code_files")
    items = plan_work_items(paths, target_rows=cfg.target_rows_per_item)
    items_ds = _items_dataset(items)

    # --- Phase 1: feature extraction (actor pool, checkpoint per item)
    extract_summary = items_ds.map_batches(
        FeatureExtractor,
        fn_constructor_args=(out_dir,),
        batch_format="pyarrow",
        batch_size=1,
        # autoscaling pool (min=1): a fixed pool larger than the CPUs the
        # session actually has would wait for its minimum size forever
        concurrency=(1, cfg.extract_concurrency),
    ).to_pandas()
    n_extracted = int(extract_summary.loc[~extract_summary["skipped"], "n_rows"].sum())
    n_skipped = int(extract_summary["skipped"].sum())

    features_path = os.path.join(out_dir, "features")
    ctx = {
        "out_dir": out_dir,
        "features_path": features_path,
        "repos_path": os.path.join(source_dir, "repos.parquet"),
        "commits_path": os.path.join(source_dir, "commits.parquet"),
    }

    verdict_rows: list[dict] = []
    timings: dict[str, float] = {"extract": time.time() - t_start}

    for name in checks:
        t0 = time.time()
        if name == "drift":
            vio, rows = run_drift_check(items_ds, cfg, ctx)
        elif name == "stats":
            vio, rows = run_stats_check(None, cfg, ctx)
        elif name == "uniqueness":
            vio, rows = run_uniqueness_check(None, cfg, ctx)
        elif name == "referential":
            vio, rows = run_referential_check(None, cfg, ctx)
        else:
            raise ValueError(f"unknown check {name!r}")
        if name != "drift":  # drift writes its violations per item already
            vio_dir = os.path.join(out_dir, "violations", name)
            vio.write_parquet(vio_dir)
        verdict_rows.extend(rows)
        timings[name] = time.time() - t0
        manifest.mark_done(f"check/{name}", seconds=timings[name])

    # --- verdicts table
    if verdict_rows:
        vt = pa.Table.from_pylist(verdict_rows)
    else:
        vt = pa.table({"partition_key": pa.array([], pa.string())})
    atomic_write_parquet(vt, os.path.join(out_dir, "verdicts", "verdicts.parquet"))

    summary = {
        "n_items": len(items),
        "n_rows_extracted": n_extracted,
        "n_items_skipped_resume": n_skipped,
        "n_verdicts": len(verdict_rows),
        "n_failed_verdicts": sum(1 for r in verdict_rows if not r["passed"]),
        "checks": checks,
        "timings_sec": {k: round(v, 3) for k, v in timings.items()},
        "config": asdict(cfg),
        "total_sec": round(time.time() - t_start, 3),
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def verify_sha_invariant(source_dir: str, out_dir: str, sample: int = 200) -> bool:
    """End-to-end content sha256 invariant (BASELINE.json input_hint): the
    digests recorded in the features tables must equal digests recomputed
    from the source content."""
    import hashlib

    import pyarrow.parquet as pq

    feats = sorted(glob.glob(os.path.join(out_dir, "features", "item=*", "part.parquet")))
    srcs = sorted(glob.glob(os.path.join(source_dir, "code_files", "*.parquet")))
    by_ref: dict[str, str] = {}
    for f in feats:
        t = pq.read_table(f, columns=["row_ref", "sha256"])
        for r, s in zip(t["row_ref"].to_pylist(), t["sha256"].to_pylist()):
            by_ref[r] = s
    checked = 0
    for f in srcs:
        t = pq.read_table(f)
        for i in range(t.num_rows):
            if checked >= sample:
                return True
            ref = (
                f"{t['repo'][i].as_py() or ''}/{t['path'][i].as_py() or ''}"
                f"@{t['commit'][i].as_py() or ''}"
            )
            want = hashlib.sha256((t["content"][i].as_py() or "").encode()).hexdigest()
            if by_ref.get(ref) != want:
                return False
            checked += 1
    return True
