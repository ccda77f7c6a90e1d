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


def _dup_hashes_from_key_files(key_dir: str, P: int) -> list[int]:
    """Explicit bucket exchange over the per-item key files written by the
    fused extract pass: each of P tasks reads only its bucket's row groups
    (files are bucket-sorted, so parquet row-group stats prune the rest)
    and finds duplicate hashes vectorized.  This is a hash-partition
    shuffle expressed through the checkpointed file layout — near-zero
    constant cost and resumable, unlike a generic sort shuffle."""
    import glob

    import numpy as np
    import pyarrow.dataset as pads

    files = sorted(glob.glob(os.path.join(key_dir, "item=*.parquet")))
    cache_key = (key_dir, len(files))

    def scan_bucket(b: pa.Table) -> pa.Table:
        # dataset handle cached per worker process: re-instantiating it per
        # task re-parses every key file's footer (hundreds of files)
        dataset = _DATASET_CACHE.get(cache_key)
        if dataset is None:
            dataset = pads.dataset(files)
            _DATASET_CACHE[cache_key] = dataset
        out: list[np.ndarray] = []
        for bucket in b["bucket"].to_pylist():
            t = dataset.to_table(filter=pads.field("bucket") == bucket,
                                 columns=["key_hash"])
            vals, cnt = np.unique(t["key_hash"].to_numpy(zero_copy_only=False),
                                  return_counts=True)
            out.append(vals[cnt > 1])
        flat = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return pa.table({"key_hash": pa.array(flat, pa.int64())})

    buckets = ray.data.from_items([{"bucket": i} for i in range(P)])
    res = buckets.map_batches(scan_bucket, batch_format="pyarrow", batch_size=4)
    return [r["key_hash"] for r in res.take_all()]


@register_check("uniqueness")
def run_uniqueness_check(features_ds, cfg: ValidationConfig, ctx=None):
    P = cfg.uniqueness_buckets
    key_dir = os.path.join(ctx["out_dir"], "keys") if ctx else ""
    if key_dir and os.path.isdir(key_dir):
        dup_hashes = _dup_hashes_from_key_files(key_dir, P)
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
    cand = candidates.to_pandas()
    sizes = cand.groupby("row_ref")["row_ref"].transform("size")
    dups = cand[sizes > 1]

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
