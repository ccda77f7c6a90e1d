"""CLI — the reference's user surface, rebuilt.

``detect`` mirrors `Executor.main` (`/root/reference/src/Executor.java:43-92,
271-275`): same flags (``--algorithm --W --slide --R --k --pdLimit
--arFactor --datafile --containsClass --outliersFile``), reads a headerless
CSV of doubles, runs the chosen sliding-window detector, writes the
ascending pure-outlier ids one per line, prints the summary counters
(`Executor.printResults`, `:239-260`).  ``--partitionCol`` extends it to
partitioned parallel detection via Ray Data (one window per partition).

``compare`` mirrors `AccuracyComparator.main`
(`src/AccuracyComparator.java:79-84`): recall of the baseline outlier set.

``validate`` runs the validation engine over a code_files directory.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _build_detector(args, dims: int):
    from .state.detectors import MCOD, ApproxMCOD, LSHOD, ApproxMCLSHOD

    algo = args.algorithm
    metric = getattr(args, "metric", "euclidean")
    if algo == "MCOD":
        return MCOD(args.W, args.slide, args.R, args.k, dims, metric=metric)
    if algo == "ApproxMCOD":
        return ApproxMCOD(args.W, args.slide, args.R, args.k, dims,
                          args.pdLimit, args.arFactor, seed=args.seed,
                          metric=metric)
    if metric != "euclidean":
        raise SystemExit(f"--metric {metric!r} requires MCOD/ApproxMCOD "
                         "(the LSH variants' hash family is L2-specific)")
    if algo == "LSHOD":
        # Executor defaults: 4 hashes, 10 tables, w=floor(R) (Executor.java:102-104)
        return LSHOD(args.W, args.slide, args.R, args.k, dims, seed=args.seed)
    if algo == "ApproxMCLSHOD":
        # 5 hashes, 10 tables, w=floor(3R/2) (Executor.java:106-109)
        return ApproxMCLSHOD(args.W, args.slide, args.R, args.k, dims, seed=args.seed)
    raise SystemExit(f"unknown --algorithm {algo!r}")


def cmd_detect(args) -> int:
    import numpy as np

    from .sources.readers import write_outlier_ids
    from .state.detectors import run_detector

    t0 = time.time()
    if args.partitionCol:
        import ray

        if not ray.is_initialized():
            ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
        import pandas as pd

        ds = ray.data.read_csv(args.datafile)

        def detect_group(g: pd.DataFrame) -> pd.DataFrame:
            cols = [c for c in g.columns if c != args.partitionCol]
            pts = g[cols].to_numpy(dtype=float)
            det = _build_detector(args, pts.shape[1])
            out, res = run_detector(det, pts)
            return pd.DataFrame({"partition": [g[args.partitionCol].iloc[0]],
                                 "outliers": [json.dumps(out)],
                                 **{k: [v] for k, v in res.items()}})

        res = ds.groupby(args.partitionCol).map_groups(
            detect_group, batch_format="pandas").to_pandas()
        print(res.to_string())
        if args.outliersFile:
            res.to_json(args.outliersFile, orient="records", lines=True)
        return 0

    # single-stream mode, exact Executor semantics (whole-file stream)
    rows = []
    with open(args.datafile) as f:
        for line in f:
            parts = line.strip().split(",")
            if not parts or parts == [""]:
                continue
            if args.containsClass:
                parts = parts[:-1]
            rows.append([float(x) for x in parts])
    pts = np.asarray(rows)
    det = _build_detector(args, pts.shape[1])
    outliers, results = run_detector(det, pts)
    if args.outliersFile:
        write_outlier_ids(outliers, args.outliersFile)

    # printResults (`Executor.java:239-260`)
    n_both = results["nBothInlierOutlier"]
    n_in = results["nOnlyInlier"]
    n_out = results["nOnlyOutlier"]
    total = n_both + n_in + n_out
    print("Statistics:\n")
    if total > 0:
        print(f"  Nodes always inlier: {n_in} ({100 * n_in / total:.1f}%)")
        print(f"  Nodes always outlier: {n_out} ({100 * n_out / total:.1f}%)")
        print(f"  Nodes both inlier and outlier: {n_both} ({100 * n_both / total:.1f}%)")
        print(f"  (Sum: {total})")
    print(f"\n  Total range queries: {results['nRangeQueriesExecuted']}")
    print(f"  Total process time: {time.time() - t0:.2f} s")
    print(f"  Pure outliers found: {len(outliers)}")
    return 0


def cmd_compare(args) -> int:
    from .pipelines.accuracy import recall_of
    from .sources.readers import read_outlier_ids

    base = read_outlier_ids(args.baseline)
    test = read_outlier_ids(args.test)
    r = recall_of(base, test)
    # AccuracyComparator output shape (`src/AccuracyComparator.java:25-37`)
    print(f"Baseline outliers: {len(base)}")
    print(f"Test outliers: {len(test)}")
    print(f"Common outliers: {len(set(base) & set(test))}")
    print(f"Recall: {100 * r:.1f}%")
    return 0


def cmd_validate(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from .checks.base import ValidationConfig
    from .pipelines.runner import run_validation

    cfg = ValidationConfig(drift_algorithm=args.driftAlgorithm,
                           drift_chain_repos=args.driftChainRepos)
    summary = run_validation(args.source, args.out, cfg,
                             checks=args.checks.split(",") if args.checks else None)
    print(json.dumps(summary, indent=1))
    return 0


def cmd_query(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from .pipelines.queries import QUERIES

    if args.name == "list" or args.name not in QUERIES:
        for name in QUERIES:
            print(name)
        return 0 if args.name == "list" else 2
    res = QUERIES[args.name](args.sfDir)
    ds_handle = res if hasattr(res, "stats") else None
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    if getattr(args, "stats", False) and ds_handle is not None:
        # only queries returning a live Dataset carry Ray stats; stats()
        # is empty until execution, so print AFTER to_pandas() ran it
        print(ds_handle.stats())
    if args.out:
        res.to_parquet(args.out) if hasattr(res, "to_parquet") else None
        print(f"wrote {len(res)} rows to {args.out}")
    else:
        print(res.to_string())
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="aads-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("detect", help="sliding-window outlier detection (Executor parity)")
    d.add_argument("--algorithm", default="MCOD",
                   choices=["MCOD", "ApproxMCOD", "LSHOD", "ApproxMCLSHOD"])
    d.add_argument("--W", type=int, default=1000)
    d.add_argument("--slide", type=int, default=500)
    d.add_argument("--R", type=float, required=True)
    d.add_argument("--k", type=int, default=50)
    d.add_argument("--pdLimit", type=int, default=100)
    d.add_argument("--arFactor", type=float, default=0.5)
    d.add_argument("--datafile", required=True)
    d.add_argument("--containsClass", type=lambda v: v.lower() == "true", default=False)
    d.add_argument("--outliersFile", default=None)
    d.add_argument("--partitionCol", default=None,
                   help="CSV column holding the partition key → one window per partition via Ray")
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--metric", default="euclidean",
                   choices=["euclidean", "manhattan", "cosine"],
                   help="distance function (MCOD/ApproxMCOD; engine "
                        "extension mirroring the reference's "
                        "DistanceFunctions generics)")
    d.set_defaults(fn=cmd_detect)

    c = sub.add_parser("compare", help="recall of baseline outlier ids (AccuracyComparator parity)")
    c.add_argument("--baseline", required=True)
    c.add_argument("--test", required=True)
    c.set_defaults(fn=cmd_compare)

    v = sub.add_parser("validate", help="run the validation engine")
    v.add_argument("--source", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--checks", default=None)
    v.add_argument("--driftAlgorithm", default="mcod")
    v.add_argument("--driftChainRepos", action="store_true",
                   help="exact cross-item window continuation for repos "
                        "that straddle work-item boundaries")
    v.set_defaults(fn=cmd_validate)

    q = sub.add_parser("query", help="run a named pipeline ('list' to enumerate)")
    q.add_argument("name")
    q.add_argument("--sfDir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None, help="write result parquet here")
    q.add_argument("--stats", action="store_true",
                   help="print Ray Data per-operator stats (Dataset results)")
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
