"""The validation runner: config → Dataset pipeline → verdicts/violations.

Rebuilds `Executor.performOutlierDetection` (`src/Executor.java:94-137`) as
a streaming, resumable, multi-check pipeline:

  plan work items (row-group ranges, salt-aware)
    → plain-task fused feature extraction (wide content → narrow features,
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
from ..checks.schema_check import run_schema_check
from ..checks.constraints import run_constraints_check
from ..checks.referential import run_referential_check
from ..checks.stats import run_stats_check
from ..checks.uniqueness import run_uniqueness_check
from .checkpoint import Manifest, atomic_write_parquet
from .partitioning import plan_work_items


def _items_dataset(items):
    # longest-processing-time-first dispatch: with one task per item,
    # scheduling the biggest items first minimizes the straggler tail (a
    # hot-repo item scheduled last would run alone at the end)
    ordered = sorted(items, key=lambda it: -it.n_rows)
    return ray.data.from_items(
        [
            {
                "item_id": it.item_id,
                "path": it.path,
                "rg_start": it.rg_start,
                "rg_end": it.rg_end,
                "n_rows": it.n_rows,
            }
            for it in ordered
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
    checks = list(checks or ["schema", "stats", "uniqueness", "referential",
                             "constraints", "drift"])
    requested_checks = list(checks)
    t_start = time.time()
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)

    paths = sorted(glob.glob(os.path.join(source_dir, "code_files", "*.parquet")))
    if not paths:
        raise FileNotFoundError(f"no parquet under {source_dir}/code_files")

    verdict_rows: list[dict] = []
    timings: dict[str, float] = {}

    # --- Phase 0: schema gate (footer-only, before any data moves) —
    # files that fail the schema contract get failed verdicts and are
    # excluded from extraction; everything downstream sees clean schemas
    if "schema" in checks:
        t0 = time.time()
        _, schema_rows = run_schema_check(
            None, cfg, {"source_glob": os.path.join(source_dir, "code_files", "*.parquet")}
        )
        verdict_rows.extend(schema_rows)
        bad_files = {r["partition_key"] for r in schema_rows if not r["passed"]}
        paths = [p for p in paths if os.path.basename(p) not in bad_files]
        timings["schema"] = time.time() - t0
        manifest.mark_done("check/schema", seconds=timings["schema"])
        checks = [c for c in checks if c != "schema"]
        if not paths:
            atomic_write_parquet(
                pa.Table.from_pylist(verdict_rows),
                os.path.join(out_dir, "verdicts", "verdicts.parquet"),
            )
            return {
                "n_items": 0, "n_rows_extracted": 0, "n_items_skipped_resume": 0,
                "n_verdicts": len(verdict_rows),
                "n_failed_verdicts": sum(1 for r in verdict_rows if not r["passed"]),
                "checks": ["schema"], "timings_sec": timings,
                "config": asdict(cfg),
                "total_sec": round(time.time() - t_start, 3),
            }

    items = plan_work_items(paths, target_rows=cfg.target_rows_per_item)
    # optional exact cross-item window continuation: repos straddling item
    # boundaries (detected from boundary row groups at plan time) are pulled
    # out of the per-item drift pass and chained sequentially per repo
    chain_repos: dict[str, list[str]] = {}
    if cfg.drift_chain_repos and "drift" in checks:
        from .partitioning import find_straddling_repos

        chain_repos = find_straddling_repos(items)
    items_ds = _items_dataset(items)

    # --- Phase 1: fused extraction (plain tasks, checkpoint per item) —
    # computes features + every enabled check's per-row products in ONE
    # pass over the wide input.  Plain tasks, not an actor pool: one task
    # per work item uses every schedulable CPU with no pool-startup tax or
    # per-actor task stacking (round 1's ActorPoolStrategy paid 1-5 s of
    # actor churn per run); the extractor state (dims tables, manifest) is
    # rebuilt once per reused worker process via a module-level cache
    fused_checks = [c for c in checks if cfg.drift_inline or c != "drift"]
    from ..stages.features import make_extract_fn

    # driver-side resume fast-path: an item whose features file AND every
    # enabled check's per-item product are already checkpointed never
    # round-trips through a Ray task.  (Round 4 measured the all-done
    # skip pass at ~5 s of a ~9.5 s resume — pure task scheduling +
    # no-op dispatch; the same manifest stats cost microseconds here.)
    from ..checks.drift import drift_unit

    chain_key = frozenset(chain_repos)

    def _item_all_done(it) -> bool:
        iid = it.item_id
        if not (manifest.is_done(f"features/{iid}") and os.path.exists(
                os.path.join(out_dir, "features", f"item={iid}", "part.parquet"))):
            return False
        if "drift" in fused_checks and not (
                manifest.is_done(drift_unit(iid, chain_key)) and os.path.exists(
                    os.path.join(out_dir, "drift_summaries", f"item={iid}.parquet"))):
            return False
        if "stats" in fused_checks and not (
                manifest.is_done(f"stats_partials/{iid}") and os.path.exists(
                    os.path.join(out_dir, "stats_partials", f"item={iid}.parquet"))):
            return False
        if "referential" in fused_checks and not (
                manifest.is_done(f"referential/{iid}") and os.path.exists(
                    os.path.join(out_dir, "violations", "referential",
                                 f"item={iid}", "part.parquet"))):
            return False
        if "constraints" in fused_checks and not (
                manifest.is_done(f"constraints/{iid}") and os.path.exists(
                    os.path.join(out_dir, "violations", "constraints",
                                 f"item={iid}", "part.parquet"))):
            return False
        if "uniqueness" in fused_checks and not (
                manifest.is_done(f"keys/{iid}") and os.path.exists(
                    os.path.join(out_dir, "keys", f"item={iid}.parquet"))):
            return False
        return True

    done_items = [it for it in items if _item_all_done(it)]
    done_ids = {it.item_id for it in done_items}
    pending_items = [it for it in items if it.item_id not in done_ids]

    extract_ds = _items_dataset(pending_items).map_batches(
        make_extract_fn(out_dir, cfg, fused_checks,
                        os.path.join(source_dir, "repos.parquet"),
                        os.path.join(source_dir, "commits.parquet"),
                        chain_repos=chain_key),
        batch_format="pyarrow",
        batch_size=1,
    ) if pending_items else None
    # consume the extract STREAM and overlap the checks' input loading with
    # the extract tail: as each item completes, a background thread loads
    # its per-item check products (stats partials, drift summaries,
    # referential violations) into memory, so the post-extract check phase
    # starts with its inputs already resident instead of re-reading
    # hundreds of files — a flat serial tail that eats scaling efficiency
    from concurrent.futures import ThreadPoolExecutor

    import pandas as pd
    import pyarrow.parquet as pq_mod

    preload = {"stats": [], "drift": [], "referential": [], "constraints": []}
    preload_specs = {
        "stats": lambda i: os.path.join(out_dir, "stats_partials", f"item={i}.parquet"),
        "drift": lambda i: os.path.join(out_dir, "drift_summaries", f"item={i}.parquet"),
        "referential": lambda i: os.path.join(out_dir, "violations", "referential",
                                              f"item={i}", "part.parquet"),
        "constraints": lambda i: os.path.join(out_dir, "violations", "constraints",
                                              f"item={i}", "part.parquet"),
    }
    wanted_preloads = [c for c in ("stats", "drift", "referential", "constraints")
                       if c in fused_checks]

    # cap the preload: a pathological corpus (every row violating) could
    # make the referential violation tables exceed driver memory — past the
    # cap the checks fall back to their file-path reads
    PRELOAD_CAP_BYTES = 1 << 30
    preload_bytes = [0]

    def _load_item(item_id: str):
        if preload_bytes[0] > PRELOAD_CAP_BYTES:
            return {}
        out = {}
        for c in wanted_preloads:
            p = preload_specs[c](item_id)
            if os.path.exists(p):
                t = pq_mod.read_table(p)
                preload_bytes[0] += t.nbytes
                out[c] = t
        return out

    summary_batches = []
    with ThreadPoolExecutor(max_workers=4) as loader:
        # driver-skipped items' products are already on disk: preload now
        futures = [loader.submit(_load_item, it.item_id) for it in done_items]
        if extract_ds is not None:
            for batch in extract_ds.iter_batches(batch_size=None,
                                                 batch_format="pyarrow"):
                summary_batches.append(batch)
                for item_id in batch["item_id"].to_pylist():
                    futures.append(loader.submit(_load_item, item_id))
        for fut in futures:
            loaded = fut.result()
            for c, t in loaded.items():
                preload[c].append(t)
    streamed = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
         for b in summary_batches]
    ).to_pandas() if summary_batches else pd.DataFrame(
        {"item_id": [], "n_rows": [], "skipped": []})
    extract_summary = pd.concat([
        streamed,
        pd.DataFrame({"item_id": [it.item_id for it in done_items],
                      "n_rows": [-1] * len(done_items),
                      "skipped": [True] * len(done_items)}),
    ], ignore_index=True) if done_items else streamed
    if extract_ds is not None:
        try:  # persist Ray's per-stage wall/cpu/memory breakdown for tuning
            with open(os.path.join(out_dir, "extract_stage_stats.txt"), "w") as f:
                f.write(extract_ds.stats())
        except Exception:
            pass
    n_extracted = int(extract_summary.loc[~extract_summary["skipped"].astype(bool),
                                          "n_rows"].sum()) if len(extract_summary) else 0
    n_skipped = int(extract_summary["skipped"].astype(bool).sum()) if len(extract_summary) else 0

    features_path = os.path.join(out_dir, "features")
    ctx = {
        "out_dir": out_dir,
        "features_path": features_path,
        "source_glob": os.path.join(source_dir, "code_files", "*.parquet"),
        "repos_path": os.path.join(source_dir, "repos.parquet"),
        "commits_path": os.path.join(source_dir, "commits.parquet"),
        "item_ids": [it.item_id for it in items],
        # preloaded per-item check products (trusted only when every item
        # contributed a file; otherwise checks fall back to the file paths)
        "preloaded": {
            c: pa.concat_tables(ts, promote_options="default")
            for c, ts in preload.items() if ts and len(ts) == len(items)
        },
    }

    timings["extract"] = time.time() - t_start - timings.get("schema", 0.0)

    if chain_repos:
        t0 = time.time()
        from ..checks.drift import run_chained_repos

        ctx["drift_chain_exclude"] = frozenset(chain_repos)
        ctx["drift_chain_summaries"] = run_chained_repos(chain_repos, out_dir, cfg)
        timings["drift_chain"] = time.time() - t0

    runners = {
        "drift": lambda: run_drift_check(items_ds, cfg, ctx),
        "stats": lambda: run_stats_check(None, cfg, ctx),
        "uniqueness": lambda: run_uniqueness_check(None, cfg, ctx),
        "referential": lambda: run_referential_check(None, cfg, ctx),
        "constraints": lambda: run_constraints_check(None, cfg, ctx),
    }
    for name in checks:
        if name not in runners:
            raise ValueError(f"unknown check {name!r}")

    def run_one(name: str):
        t0 = time.time()
        for attempt in range(3):
            try:
                vio, rows = runners[name]()
                break
            except ImportError as ex:
                # fsspec's optional-HTTP import is not thread-safe: under
                # concurrent first imports a sibling thread can observe the
                # partially-imported module and raise ImportError where a
                # single-threaded run gets a (caught) ModuleNotFoundError.
                if "HTTPFileSystem" in str(ex) and attempt < 2:
                    time.sleep(0.2)
                    continue
                raise
        # fused checks return vio=None: their violations were already
        # written per item by the extract pass
        if vio is not None and name != "drift":
            import shutil

            dst = os.path.join(out_dir, "violations", name)
            # standalone checks recompute in full, so a resumed run must
            # REPLACE their violation files — write_parquet otherwise
            # appends a second copy alongside the first run's
            shutil.rmtree(dst, ignore_errors=True)
            vio.write_parquet(dst)
        sec = time.time() - t0
        manifest.mark_done(f"check/{name}", seconds=sec)
        return rows, sec

    if cfg.concurrent_checks and len(checks) > 1:
        # checks are independent Dataset executions sharing the CPU pool:
        # running them concurrently overlaps their fixed shuffle/startup
        # costs, which otherwise serialize into a scaling floor
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(checks)) as pool:
            futures = {name: pool.submit(run_one, name) for name in checks}
            for name, fut in futures.items():
                rows, sec = fut.result()
                verdict_rows.extend(rows)
                timings[name] = sec
    else:
        for name in checks:
            rows, sec = run_one(name)
            verdict_rows.extend(rows)
            timings[name] = sec

    # --- violations compaction: the per-item violation files are the
    # resume units and stay untouched; this writes one merged, sorted
    # parquet per check for consumers (at 10^12-row scale this step would
    # compact per partition-key range instead of one file per check)
    if getattr(cfg, "compact_violations", True):
        t0 = time.time()
        compact_violations(out_dir)
        timings["compact"] = time.time() - t0

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
        "checks": requested_checks,
        "timings_sec": {k: round(v, 3) for k, v in timings.items()},
        "config": asdict(cfg),
        "total_sec": round(time.time() - t_start, 3),
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def _compact_one_check(out_dir: str, check: str) -> int:
    import pyarrow.dataset as pads

    files = sorted(glob.glob(os.path.join(out_dir, "violations", check,
                                          "**", "*.parquet"), recursive=True))
    if not files:
        return 0
    t = pads.dataset(files).to_table()
    if t.num_rows:
        t = t.sort_by([("partition_key", "ascending"), ("row_ref", "ascending")])
    atomic_write_parquet(t, os.path.join(out_dir, "violations_compacted",
                                         f"{check}.parquet"))
    return t.num_rows


def compact_violations(out_dir: str) -> dict[str, int]:
    """Merge each check's per-item violation files into one sorted parquet
    under ``violations_compacted/`` (read side of the small-files problem);
    the per-item files remain the checkpoint/resume units.  One Ray task
    per check — serial driver-side compaction would be a fixed tail that
    eats scaling efficiency at high parallelism."""
    vdir = os.path.join(out_dir, "violations")
    if not os.path.isdir(vdir):
        return {}
    checks = sorted(os.listdir(vdir))
    if ray.is_initialized():
        task = ray.remote(num_cpus=1)(_compact_one_check)
        counts = ray.get([task.remote(out_dir, c) for c in checks])
    else:
        counts = [_compact_one_check(out_dir, c) for c in checks]
    return dict(zip(checks, counts))


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
