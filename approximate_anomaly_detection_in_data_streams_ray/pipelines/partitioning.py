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
