"""Readers mapping the reference's ingestion surface to Ray Data.

* S1 CSV stream reader (`src/core/Stream.java:39-68`): headerless
  comma-separated doubles, optional trailing class label dropped →
  :func:`read_stream_csv` (ray.data.read_csv with explicit schema probing).
* S4 outlier-id reader (`src/AccuracyComparator.java:39-59`): one id per
  line → :func:`read_outlier_ids`.
* Subject-table reader with column pruning → :func:`read_code_files`.
"""

from __future__ import annotations

import glob
import os

import ray


def read_code_files(source_dir: str, columns: list[str] | None = None):
    """Column-pruned read of the subject table (prune at the read —
    a 2-column transform must not lift the wide ``content`` column)."""
    paths = sorted(glob.glob(os.path.join(source_dir, "code_files", "*.parquet")))
    return ray.data.read_parquet(paths, columns=columns)


def read_stream_csv(path: str, contains_class: bool = False):
    """Headerless CSV of doubles → Dataset with columns f0..f{d-1}.

    Mirrors `Stream.loadFile`: dimensionality probed from the first row;
    the trailing class column is dropped when *contains_class*
    (`src/core/Stream.java:46-51`) — but as a streaming read, never a full
    preload."""
    with open(path) as f:
        first = f.readline().strip().split(",")
    d = len(first) - (1 if contains_class else 0)
    names = [f"f{i}" for i in range(d)] + (["_class"] if contains_class else [])
    from pyarrow import csv as pacsv

    ds = ray.data.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=names),
    )
    if contains_class:
        ds = ds.select_columns([f"f{i}" for i in range(d)])
    return ds


def read_table_auto(path: str, columns: list[str] | None = None):
    """Format-dispatched table read: Parquet / CSV (with header) / JSONL by
    extension, so every query pipeline can consume any of the three.
    Column pruning is a real pushdown for Parquet; for CSV/JSONL the
    columns are selected after the (row-based) read."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".parquet", ".pq"):
        return ray.data.read_parquet(path, columns=columns)
    if ext == ".csv":
        ds = ray.data.read_csv(path)
    elif ext in (".jsonl", ".json", ".ndjson"):
        ds = ray.data.read_json(path)
    else:
        raise ValueError(f"unsupported table format {ext!r} "
                         "(parquet/csv/jsonl supported)")
    return ds.select_columns(columns) if columns else ds


def read_outlier_ids(path: str) -> list[int]:
    """Id-per-line file (the reference's export format,
    `src/Executor.java:209-222`)."""
    with open(path) as f:
        return [int(line) for line in f if line.strip()]


def write_outlier_ids(ids, path: str) -> None:
    """S3 outlier-id writer: ascending ids, one per line."""
    with open(path, "w") as f:
        for i in sorted(ids):
            f.write(f"{i}\n")
