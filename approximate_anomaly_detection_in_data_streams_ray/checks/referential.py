"""Referential-integrity check: repo/commit keys vs the dimension tables.

The broadcast-semi-join pattern (SURVEY.md §2.6 J2): the dimension key sets
are ``ray.put`` once on the driver and materialized per actor in
``__init__`` — never re-shipped per batch — then membership is a vectorized
``pc.is_in`` per batch.  For dimension tables too large to broadcast the
fallback is the bucketed hash join in ``stages/joins.py``.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .base import ValidationConfig, register_check


def referential_violations(batch: pa.Table, repo_set, commit_set) -> pa.Table:
    """Vectorized anti-join of one batch against the dimension key sets."""
    bad_repo = pc.invert(pc.is_in(batch["repo"], value_set=repo_set))
    bad_commit = pc.invert(pc.is_in(batch["commit"], value_set=commit_set))
    out = {"check": [], "partition_key": [], "row_ref": [], "detail": []}
    for check, mask, col in (
        ("referential_repo", bad_repo, "repo"),
        ("referential_commit", bad_commit, "commit"),
    ):
        sub = batch.filter(pc.fill_null(mask, True))
        out["check"].extend([check] * len(sub))
        out["partition_key"].extend(sub["repo"].to_pylist())
        out["row_ref"].extend(sub["row_ref"].to_pylist())
        out["detail"].extend(str(v) for v in sub[col].to_pylist())
    return pa.table(
        {
            "check": pa.array(out["check"], pa.string()),
            "partition_key": pa.array(out["partition_key"], pa.string()),
            "row_ref": pa.array(out["row_ref"], pa.string()),
            "detail": pa.array(out["detail"], pa.string()),
        }
    )


_DIMS_CACHE: dict = {}  # per-worker-process materialized dimension key sets


def make_ref_lookup(dims_ref):
    """Plain-task lookup closure over the broadcast dimension key sets
    (standalone path).  The sets are ``ray.get`` + Arrow-materialized once
    per worker process (keyed by the ObjectRef), so tasks pay no per-batch
    deserialization and the stage needs no actor pool — Ray schedules it as
    wide as the cluster allows (round 2 capped it at ``concurrency=(1, 8)``,
    the bug class round 1 flagged)."""

    def lookup(batch: pa.Table) -> pa.Table:
        sets = _DIMS_CACHE.get(dims_ref)
        if sets is None:
            repo_keys, commit_keys = ray.get(dims_ref)
            sets = (pa.array(repo_keys, pa.string()),
                    pa.array(commit_keys, pa.string()))
            _DIMS_CACHE[dims_ref] = sets
        return referential_violations(batch, *sets)

    return lookup


def referential_violations_bucketed(features_ds, repos_path, commits_path,
                                    buckets: int = 32,
                                    scratch_dir: str | None = None):
    """Both-sides-large referential path: two bucketed anti-semi joins
    through ``stages.joins.bucketed_anti_semi_join`` instead of a driver
    broadcast — for dimension tables whose key sets exceed
    ``ValidationConfig.referential_broadcast_max_keys``.  The dimension
    never touches the driver: only its key column streams into the
    B-bucket exchange.  Emits the same violations schema (and null-key
    semantics) as the broadcast path, so the two routes are
    interchangeable row-for-row."""
    from ..stages.joins import bucketed_anti_semi_join

    def to_viol(check: str, col: str):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "row_ref" not in b.column_names:
                return pa.table({
                    "check": pa.array([], pa.string()),
                    "partition_key": pa.array([], pa.string()),
                    "row_ref": pa.array([], pa.string()),
                    "detail": pa.array([], pa.string())})
            return pa.table({
                "check": pa.array([check] * b.num_rows, pa.string()),
                "partition_key": b["repo"].cast(pa.string()),
                "row_ref": b["row_ref"].cast(pa.string()),
                "detail": pa.array(
                    [str(v) for v in b[col].to_pylist()], pa.string())})
        return fn

    bad_repo = bucketed_anti_semi_join(
        features_ds, ray.data.read_parquet(repos_path, columns=["repo"]),
        key="repo", B=buckets, scratch_dir=scratch_dir,
    ).map_batches(to_viol("referential_repo", "repo"),
                  batch_format="pyarrow")
    bad_commit = bucketed_anti_semi_join(
        features_ds, ray.data.read_parquet(commits_path, columns=["commit"]),
        key="commit", B=buckets, scratch_dir=scratch_dir,
    ).map_batches(to_viol("referential_commit", "commit"),
                  batch_format="pyarrow")
    return bad_repo.union(bad_commit)


@register_check("referential")
def run_referential_check(features_ds, cfg: ValidationConfig, ctx):
    import glob
    import os

    fused = sorted(glob.glob(os.path.join(
        ctx["out_dir"], "violations", "referential", "item=*", "part.parquet"))) if ctx else []
    pre = (ctx or {}).get("preloaded", {}).get("referential")
    violations = None
    if pre is not None:
        fused = fused or [None]  # preload implies the fused layout
        vdf = pre.to_pandas()
    elif fused:
        # fused extract pass already produced per-item violation files;
        # one parallel C++ dataset read, not a per-file Python loop (192
        # serial pq.read_table calls on a GIL-contended driver cost ~1.5 s)
        import pyarrow.dataset as pads

        vdf = pads.dataset(fused).to_table().to_pandas()
    else:
        if features_ds is None:
            features_ds = ray.data.read_parquet(
                ctx["features_path"], columns=["repo", "commit", "row_ref"]
            )
        # route on dimension size from the parquet FOOTERS (the decision
        # must not itself read an unbroadcastable dim onto the driver)
        n_dim_keys = max(
            pq.ParquetFile(ctx["repos_path"]).metadata.num_rows,
            pq.ParquetFile(ctx["commits_path"]).metadata.num_rows,
        )
        if n_dim_keys > cfg.referential_broadcast_max_keys:
            violations = referential_violations_bucketed(
                features_ds, ctx["repos_path"], ctx["commits_path"],
                buckets=cfg.uniqueness_buckets,
                scratch_dir=ctx.get("scratch_dir"),
            )
        else:
            repos = pq.read_table(ctx["repos_path"], columns=["repo"])
            commits = pq.read_table(ctx["commits_path"], columns=["commit"])
            dims_ref = ray.put(
                (repos["repo"].to_pylist(), commits["commit"].to_pylist())
            )
            violations = features_ds.map_batches(
                make_ref_lookup(dims_ref),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
            )
        vdf = violations.to_pandas()
    verdict_rows = []
    for (repo, check), g in vdf.groupby(["partition_key", "check"]):
        verdict_rows.append(
            {
                "partition_key": repo,
                "check": check,
                "passed": False,
                "n_violations": int(len(g)),
                "n_rows": -1,
                "metrics": json.dumps({"example": g["detail"].iloc[0]}),
            }
        )
    if fused:
        return None, verdict_rows  # violations already written per item
    return (ray.data.from_pandas(vdf) if len(vdf) else violations), verdict_rows
