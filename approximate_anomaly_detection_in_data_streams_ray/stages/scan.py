"""Ordered-scan operators: distributed exclusive prefix sum.

The building block for sequence packing, global running totals and rank
assignment — semantics no plain ``groupby`` can express because the result
of row *i* depends on every row before it in a global key order.

Ray-Data-first decomposition (two passes, one narrow shuffle):

1. bucket every row by a RANGE of the order key (min/max from a cheap
   aggregate pass; at warehouse scale these come free from parquet
   column statistics);
2. per-batch partial sums per bucket → a tiny driver-side exclusive scan
   over the ~B bucket totals (B ≈ 2 × CPUs — driver work is O(B), not
   O(rows));
3. ``groupby(bucket).map_groups``: each bucket sorts its own rows by the
   key and adds its bucket offset — an exact global exclusive cumsum
   without ever materializing a totally-ordered dataset.

Partitioning assumption (documented per the custom-operator contract):
the order key is numeric and roughly uniform over its range, so range
buckets are balanced.  A skewed key needs quantile-based bounds instead
(same structure, different bucket map).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Max, Min


def exclusive_prefix_sum(ds, key_col: str, val_col: str,
                         out_col: str = "cum_excl", n_buckets: int | None = None):
    """Add ``out_col`` = sum of ``val_col`` over all rows with a strictly
    smaller ``key_col`` (ties are impossible: key must be unique — it is a
    row id/order column).  Returns a Dataset; nothing row-sized touches the
    driver."""
    from .common import cluster_cpus

    if n_buckets is None:
        n_buckets = max(4, 2 * int(cluster_cpus()))
    bounds = ds.aggregate(Min(key_col), Max(key_col))
    lo, hi = bounds[f"min({key_col})"], bounds[f"max({key_col})"]
    width = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        return ((keys - lo) // width).astype(np.int64)

    # pass 1: per-batch per-bucket partial sums (B×blocks tiny rows)
    def partials(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        v = b[val_col].to_numpy(zero_copy_only=False)
        bk = bucket_of(k)
        u, inv = np.unique(bk, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, v)
        return pa.table({"bucket": pa.array(u), "s": pa.array(s)})

    part = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    totals = np.zeros(n_buckets + 1, dtype=np.int64)
    agg = part.groupby("bucket")["s"].sum()
    totals[agg.index.to_numpy() + 1] = agg.to_numpy()
    offsets = np.cumsum(totals)[:-1]  # exclusive bucket offsets
    off_ref = ray.put(offsets)

    # pass 2: exact local cumsum per bucket + broadcast bucket offset
    def add_bucket(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        return b.append_column("__psum_bucket", pa.array(bucket_of(k)))

    def scan_group(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(key_col, kind="mergesort")
        v = g[val_col].to_numpy()
        base = int(offs[int(g["__psum_bucket"].iloc[0])])
        g = g.drop(columns="__psum_bucket")
        g[out_col] = base + np.concatenate(([0], np.cumsum(v[:-1])))
        return g

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__psum_bucket")
            .map_groups(scan_group, batch_format="pandas"))


def pack_bins(ds, key_col: str, tokens_col: str, cap: int,
              bin_col: str = "bin_id"):
    """Deterministic contiguous sequence packing: documents in ``key_col``
    order fill bins of ``cap`` tokens; a document belongs to the bin its
    EXCLUSIVE running total falls in (equivalently: a greedy packer that
    starts a new bin when the previous one has no room is approximated by
    fixed-boundary binning — deterministic, order-stable, and exactly
    expressible as a SQL window, which is what makes it oracle-checkable).
    """
    out = exclusive_prefix_sum(ds, key_col, tokens_col, out_col="__cum")

    def assign(b: pa.Table) -> pa.Table:
        c = b["__cum"].to_numpy(zero_copy_only=False)
        t = b.drop_columns("__cum")
        return t.append_column(bin_col, pa.array((c // cap).astype(np.int64)))

    return out.map_batches(assign, batch_format="pyarrow")
