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

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count

from .base import ValidationConfig, register_check


@register_check("uniqueness")
def run_uniqueness_check(features_ds, cfg: ValidationConfig, ctx=None):
    if features_ds is None:
        key_ds = ray.data.read_parquet(ctx["features_path"], columns=["key_hash"])
    else:
        key_ds = features_ds.select_columns(["key_hash"])
    counts = key_ds.groupby("key_hash").aggregate(Count(alias_name="cnt"))
    dup_keys = counts.filter(expr="cnt > 1")
    dup_hashes = [r["key_hash"] for r in dup_keys.take_all()]  # small by contract

    if not dup_hashes:
        return _empty_violations(), []

    value_set = pa.array(dup_hashes, pa.int64())
    if features_ds is None:
        cand_ds = ray.data.read_parquet(
            ctx["features_path"],
            columns=["repo", "path", "commit", "row_ref", "key_hash"],
        )
    else:
        cand_ds = features_ds.select_columns(
            ["repo", "path", "commit", "row_ref", "key_hash"]
        )
    candidates = cand_ds.map_batches(
        lambda b: b.filter(pc.is_in(b["key_hash"], value_set=value_set)),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )

    # exact confirmation (hash collisions) — candidate set is tiny
    cand = candidates.to_pandas()
    sizes = cand.groupby(["repo", "path", "commit"])["row_ref"].transform("size")
    dups = cand[sizes > 1]

    out = pa.table(
        {
            "check": pa.array(["uniqueness"] * len(dups), pa.string()),
            "partition_key": pa.array(dups["repo"].tolist(), pa.string()),
            "row_ref": pa.array(dups["row_ref"].tolist(), pa.string()),
            "detail": pa.array(
                [f"duplicate ({r}, {p}, {c})" for r, p, c in
                 zip(dups["repo"], dups["path"], dups["commit"])],
                pa.string(),
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
