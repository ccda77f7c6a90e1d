"""Uniqueness check on (repo, path, commit).

Engine analogue of the reference's id-dedup TreeSets (SURVEY.md §2.6 O4),
lifted to a distributed key-uniqueness constraint:

1. shuffle only the 8-byte ``key_hash`` column through a
   ``groupby().aggregate(Count)`` — Ray pre-combines per block, so the
   exchange carries one row per distinct key per block, not one per row;
2. the surviving duplicate hash set is tiny by contract → capture it in a
   plain-task filter over a column-pruned second read (`pc.is_in`);
3. exact-key confirmation driver-side removes hash collisions.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray

from .base import ValidationConfig, register_check

_DATASET_CACHE: dict = {}  # per-worker-process parquet dataset handles


def _dup_rows_from_key_files(key_dir: str, P: int, blk: int = 4) -> pa.Table:
    """Explicit bucket exchange over the per-item key files written by the
    fused extract pass: each of P tasks reads only its bucket's row groups
    (files are bucket-sorted, so parquet row-group stats prune the rest),
    finds duplicate hashes vectorized, then LATE-MATERIALIZES the few
    duplicate rows' (repo, row_ref) strings from the same pruned row
    groups — the whole check is ONE pass over 8-byte hashes plus an
    output-sized string read; the features table is never re-scanned.
    This is a hash-partition shuffle expressed through the checkpointed
    file layout — near-zero constant cost and resumable, unlike a generic
    sort shuffle."""
    import glob

    import numpy as np
    import pyarrow.dataset as pads

    files = sorted(glob.glob(os.path.join(key_dir, "item=*.parquet")))
    cache_key = (key_dir, len(files))

    _EMPTY = pa.table({"key_hash": pa.array([], pa.int64()),
                       "repo": pa.array([], pa.string()),
                       "row_ref": pa.array([], pa.string())})

    def scan_buckets(b: pa.Table) -> pa.Table:
        # dataset handle cached per worker process: re-instantiating it per
        # task re-parses every key file's footer (hundreds of files)
        dataset = _DATASET_CACHE.get(cache_key)
        if dataset is None:
            dataset = pads.dataset(files)
            _DATASET_CACHE[cache_key] = dataset
        # ONE range scan for the whole batch of buckets (per-bucket scans
        # evaluate row-group stats for every fragment each time — at
        # hundreds of files × 64 row groups that dominates the check).
        # The isin term makes the filter exact even if Ray hands this task
        # a non-contiguous bucket batch (block splitting is an
        # implementation detail) — without it, a gap in the batch would be
        # scanned here AND by the task that owns it, duplicating violations.
        bs = b["bucket"].to_pylist()
        lo, hi = min(bs), max(bs)
        in_range = ((pads.field("bucket") >= lo) & (pads.field("bucket") <= hi)
                    & pads.field("bucket").isin(bs))
        # use_threads=False: this runs inside a 1-CPU Ray worker — Arrow's
        # default per-scan thread pool (one thread per hardware core, times
        # one pool per concurrent task) only adds contention here
        t = dataset.scanner(filter=in_range, columns=["bucket", "key_hash"],
                            use_threads=False).to_table()
        kh = t["key_hash"].to_numpy(zero_copy_only=False)
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((kh, bk))
        khs, bks = kh[order], bk[order]
        same = (khs[1:] == khs[:-1]) & (bks[1:] == bks[:-1])
        if not same.any():
            return _EMPTY
        dup_mask = np.concatenate([[False], same]) | np.concatenate([same, [False]])
        dups = np.unique(khs[dup_mask])
        # late materialization: re-scan the range for just the dup rows'
        # strings (output-sized)
        return dataset.scanner(
            filter=in_range & pads.field("key_hash").isin(pa.array(dups, pa.int64())),
            columns=["key_hash", "repo", "row_ref"], use_threads=False,
        ).to_table()

    # one scan task per key-file row-group block (the writer aligned row
    # groups to blk-bucket multiples, so each task decodes exactly its own
    # rows — no neighbour-bucket amplification); P/blk tasks is plenty of
    # parallelism for an 8-byte-per-row exchange
    bsz = max(1, int(blk))
    buckets = ray.data.from_items([{"bucket": i} for i in range(P)])
    res = buckets.map_batches(scan_buckets, batch_format="pyarrow", batch_size=bsz)
    tables = [t for t in res.iter_batches(batch_size=None, batch_format="pyarrow")
              if t.num_rows]
    if not tables:
        return pa.table({"key_hash": pa.array([], pa.int64()),
                         "repo": pa.array([], pa.string()),
                         "row_ref": pa.array([], pa.string())})
    return pa.concat_tables(tables)


@register_check("uniqueness")
def run_uniqueness_check(features_ds, cfg: ValidationConfig, ctx=None):
    import pandas as pd

    P = cfg.uniqueness_buckets
    key_dir = os.path.join(ctx["out_dir"], "keys") if ctx else ""
    if key_dir and os.path.isdir(key_dir):
        # fused path: the bucket exchange returns the candidate rows with
        # their (repo, row_ref) directly — go straight to confirmation
        cand = _dup_rows_from_key_files(
            key_dir, P, getattr(cfg, "uniqueness_scan_block", 4)).to_pandas()
        return _confirm_and_report(cand)
    else:
        # standalone path: bucket groupby + vectorized per-bucket dup scan
        import numpy as np
        import pandas as pd

        if features_ds is None:
            key_ds = ray.data.read_parquet(ctx["features_path"], columns=["key_hash"])
        else:
            key_ds = features_ds.select_columns(["key_hash"])

        def bucketize(b: pa.Table) -> pa.Table:
            kh = b["key_hash"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"bucket": pa.array((kh % P).astype(np.int32)), "key_hash": b["key_hash"]}
            )

        def dups_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
            vals, cnt = np.unique(g["key_hash"].to_numpy(), return_counts=True)
            return pd.DataFrame({"key_hash": vals[cnt > 1]})

        dup_keys = key_ds.map_batches(bucketize, batch_format="pyarrow").groupby(
            "bucket"
        ).map_groups(dups_in_bucket, batch_format="pandas")
        dup_hashes = [r["key_hash"] for r in dup_keys.take_all()]  # small by contract

    if not dup_hashes:
        return _empty_violations(), []

    value_set = pa.array(dup_hashes, pa.int64())
    # only 3 columns leave the scan: row_ref IS the exact key string
    # ("repo/path@commit", same fields the hash was computed over), so the
    # exact-key collision confirmation doesn't need path/commit re-read
    if features_ds is None:
        # push the is_in filter into the parquet scan: the reader decodes
        # key_hash, then late-materializes the string columns only for
        # matching rows — ~30% faster than filter-after-read
        import pyarrow.dataset as pads

        candidates = ray.data.read_parquet(
            ctx["features_path"],
            columns=["repo", "row_ref", "key_hash"],
            filter=pads.field("key_hash").isin(value_set),
        )
    else:
        candidates = features_ds.select_columns(
            ["repo", "row_ref", "key_hash"]
        ).map_batches(
            lambda b: b.filter(pc.is_in(b["key_hash"], value_set=value_set)),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )

    # exact confirmation (hash collisions) — candidate set is tiny
    return _confirm_and_report(candidates.to_pandas())


def _confirm_and_report(cand):
    """Confirmation pass → (violations Dataset, verdict rows).

    Groups on (key_hash, row_ref): key_hash is the \\x1f-separator tuple
    hash, so distinct (repo, path, commit) tuples whose display strings
    concatenate identically ('org/app'+'lib/x' vs 'org'+'app/lib/x') get
    different hashes and are separated here, while a pure 64-bit hash
    collision between tuples with different display strings is separated
    by the row_ref term.  A false confirm would need both failure modes
    in the same pair simultaneously."""
    if len(cand) == 0:
        return _empty_violations(), []
    sizes = cand.groupby(["key_hash", "row_ref"])["row_ref"].transform("size")
    dups = cand[sizes > 1]
    if len(dups) == 0:
        return _empty_violations(), []

    out = pa.table(
        {
            "check": pa.array(["uniqueness"] * len(dups), pa.string()),
            "partition_key": pa.array(dups["repo"].tolist(), pa.string()),
            "row_ref": pa.array(dups["row_ref"].tolist(), pa.string()),
            "detail": pa.array(
                [f"duplicate key {r}" for r in dups["row_ref"]], pa.string(),
            ),
        }
    )
    per_repo = dups.groupby("repo").size()
    verdict_rows = [
        {
            "partition_key": repo,
            "check": "uniqueness",
            "passed": False,
            "n_violations": int(cnt),
            "n_rows": -1,
            "metrics": "{}",
        }
        for repo, cnt in per_repo.items()
    ]
    return ray.data.from_arrow(out), verdict_rows


def _empty_violations():
    return ray.data.from_arrow(
        pa.table(
            {
                "check": pa.array([], pa.string()),
                "partition_key": pa.array([], pa.string()),
                "row_ref": pa.array([], pa.string()),
                "detail": pa.array([], pa.string()),
            }
        )
    )
