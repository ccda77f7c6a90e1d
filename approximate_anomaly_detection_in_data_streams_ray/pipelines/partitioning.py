"""Work-item planning: row-group-aligned splits + hot-partition salting.

The validation engine's unit of work (and of checkpointing) is a *work
item*: a contiguous row-group range of one Parquet file.  Small files are
one item; files whose row count exceeds ``target_rows`` are split at
row-group boundaries.  Because the generator keeps a repo's rows contiguous,
a split lands a hot repo in multiple items — each item runs its own drift
window over its sub-stream (a *salted* sub-partition, SURVEY.md §4 skew
row) and verdicts re-merge per repo in the final groupby-aggregate.

At cluster scale this is exactly the planning a 100 TB run needs: items are
independent, ordered, resumable, and bounded in memory; no item ever spans
files, so within-item row order is the Parquet row order the window
semantics rely on (`src/algorithms/MCOD.java:335-346` expiry-scan order).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow.parquet as pq


@dataclass(frozen=True)
class WorkItem:
    item_id: str       # stable id, e.g. "shard-0003.rg0-7"
    path: str
    rg_start: int      # first row group (inclusive)
    rg_end: int        # last row group (exclusive)
    n_rows: int


def _boundary_repos(path: str, rg_start: int, rg_end: int) -> tuple[str, str]:
    """(first row's repo, last row's repo) of a row-group range, reading
    only the two boundary row groups' ``repo`` column (column projection —
    no content bytes move)."""
    pf = pq.ParquetFile(path)
    first_col = pf.read_row_group(rg_start, columns=["repo"])["repo"]
    last_col = (first_col if rg_end - 1 == rg_start
                else pf.read_row_group(rg_end - 1, columns=["repo"])["repo"])
    return (str(first_col[0].as_py() or ""),
            str(last_col[len(last_col) - 1].as_py() or ""))


def find_straddling_repos(items: list[WorkItem]) -> dict[str, list[str]]:
    """repo → ordered item_ids, for every repo whose contiguous run crosses
    a work-item boundary (the salted splits).  Used by the optional
    cross-item window continuation (``cfg.drift_chain_repos``): these repos
    are excluded from the per-item drift pass and scored by one sequential
    chain each instead.  Boundary detection reads only each item's first and
    last row group's ``repo`` column; parallelized as Ray tasks when a
    session exists (plan-time metadata pass, not a data scan)."""
    import ray

    if len(items) < 2:
        return {}
    args = [(it.path, it.rg_start, it.rg_end) for it in items]
    if ray.is_initialized() and len(items) > 4:
        task = ray.remote(num_cpus=0.5)(_boundary_repos)
        bounds = ray.get([task.remote(*a) for a in args])
    else:
        bounds = [_boundary_repos(*a) for a in args]
    # a straddling repo is excluded from the per-item pass EVERYWHERE, so
    # its chain must cover every item that holds any of its rows — not just
    # one boundary-adjacent pair.  The module contract is per-repo
    # CONTIGUITY (not sortedness), so the run is recovered from adjacency
    # alone: any item strictly inside repo X's run is entirely X, which
    # makes both of its boundaries straddles of X — the union of X's
    # straddle-pair indices is therefore the complete run, with no
    # lexicographic assumption on repo ids within a file.
    idx_runs: dict[str, set[int]] = {}
    for i in range(len(items) - 1):
        x = bounds[i][1]
        if x and x == bounds[i + 1][0]:
            idx_runs.setdefault(x, set()).update((i, i + 1))
    return {x: [items[i].item_id for i in sorted(idxs)]
            for x, idxs in idx_runs.items()}


def plan_work_items(paths: list[str], target_rows: int = 250_000) -> list[WorkItem]:
    items: list[WorkItem] = []
    for path in sorted(paths):
        md = pq.read_metadata(path)
        n_rg = md.num_row_groups
        rg_rows = [md.row_group(i).num_rows for i in range(n_rg)]
        base = os.path.basename(path).rsplit(".", 1)[0]
        start, acc = 0, 0
        for i in range(n_rg):
            acc += rg_rows[i]
            last = i == n_rg - 1
            if acc >= target_rows or last:
                items.append(
                    WorkItem(
                        item_id=f"{base}.rg{start}-{i + 1}",
                        path=path,
                        rg_start=start,
                        rg_end=i + 1,
                        n_rows=acc,
                    )
                )
                start, acc = i + 1, 0
    return items
