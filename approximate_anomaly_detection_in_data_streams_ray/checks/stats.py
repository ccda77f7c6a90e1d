"""Column-stats check: null rates, length min/max/moments, HLL cardinality.

Classic partial+final aggregation (the scalable shape of the reference's
counter HashMap, `src/algorithms/MCODBase.java:196-227`): one partial row
per (repo, batch) computed vectorized inside ``map_batches`` — including a
serialized HyperLogLog register block per repo for path/commit cardinality —
then a tiny ``groupby("repo").map_groups`` merge.  Raw rows are never
shuffled.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import HyperLogLog, hll_merge_bytes
from ..functions.hashing import stable_hash64
from .base import ValidationConfig, register_check


def stats_partials(batch: pa.Table, min_len: int | None = None,
                   max_len: int | None = None) -> pa.Table:
    """One partial-aggregate row per repo present in this batch.  When the
    length bounds are given, the per-repo length-violation count rides along
    so the final verdict's n_violations agrees with the violations table."""
    lens = batch["content_len"].to_numpy(zero_copy_only=False).astype(np.float64)
    if min_len is not None and max_len is not None:
        len_bad = (lens < min_len) | (lens >= max_len)
    else:
        len_bad = np.zeros(len(lens), dtype=bool)
    df_cols = {
        "repo": batch["repo"].to_numpy(zero_copy_only=False),
        "len": lens,
        "len_bad": len_bad,
        "null_lang": pc.is_null(batch["lang"]).to_numpy(zero_copy_only=False),
        "null_path": pc.is_null(batch["path"]).to_numpy(zero_copy_only=False),
        "path_h": stable_hash64(batch["path"]),
        "commit_h": stable_hash64(batch["commit"]),
    }
    df = pd.DataFrame(df_cols)
    rows = {k: [] for k in (
        "repo", "n", "n_null_lang", "n_null_path", "n_len_bad", "len_sum",
        "len_sum2", "len_min", "len_max", "hll_path", "hll_commit")}
    for repo, g in df.groupby("repo", sort=True):
        rows["repo"].append(repo)
        rows["n"].append(len(g))
        rows["n_null_lang"].append(int(g["null_lang"].sum()))
        rows["n_null_path"].append(int(g["null_path"].sum()))
        rows["n_len_bad"].append(int(g["len_bad"].sum()))
        rows["len_sum"].append(float(g["len"].sum()))
        rows["len_sum2"].append(float((g["len"] ** 2).sum()))
        rows["len_min"].append(float(g["len"].min()))
        rows["len_max"].append(float(g["len"].max()))
        rows["hll_path"].append(HyperLogLog(p=10).add_hashes(g["path_h"].to_numpy()).to_bytes())
        rows["hll_commit"].append(HyperLogLog(p=10).add_hashes(g["commit_h"].to_numpy()).to_bytes())
    return pa.table(
        {
            "repo": pa.array(rows["repo"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null_lang": pa.array(rows["n_null_lang"], pa.int64()),
            "n_null_path": pa.array(rows["n_null_path"], pa.int64()),
            "n_len_bad": pa.array(rows["n_len_bad"], pa.int64()),
            "len_sum": pa.array(rows["len_sum"], pa.float64()),
            "len_sum2": pa.array(rows["len_sum2"], pa.float64()),
            "len_min": pa.array(rows["len_min"], pa.float64()),
            "len_max": pa.array(rows["len_max"], pa.float64()),
            "hll_path": pa.array(rows["hll_path"], pa.binary()),
            "hll_commit": pa.array(rows["hll_commit"], pa.binary()),
        }
    )


def _merge_estimate_hlls(pdf: pd.DataFrame, col: str) -> list[float]:
    """Per-repo HLL merge+estimate, vectorized: all register blocks land in
    ONE (n_partials, m) uint8 matrix (single frombuffer of the concatenated
    blobs), per-repo union is a ``maximum.reduceat`` — no per-blob Python."""
    pdf = pdf.sort_values("repo", kind="stable")
    blobs = list(pdf[col])
    sizes = {len(b) for b in blobs}
    if len(sizes) != 1:  # mixed precisions (shouldn't happen) — slow path
        return [HyperLogLog.from_bytes(hll_merge_bytes(list(g[col]))).estimate()
                for _, g in pdf.groupby("repo", sort=True)]
    m = sizes.pop() - 1
    M = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(len(blobs), m + 1)[:, 1:]
    repos = pdf["repo"].to_numpy()
    starts = np.nonzero(np.concatenate([[True], repos[1:] != repos[:-1]]))[0]
    merged = np.maximum.reduceat(M, starts, axis=0)
    p = blobs[0][0]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.ldexp(1.0, -merged.astype(np.int32))
    est = alpha * m * m / inv.sum(axis=1)
    zeros = (merged == 0).sum(axis=1)
    lc = np.where(zeros > 0, m * np.log(m / np.maximum(zeros, 1)), est)
    out = np.where((est <= 2.5 * m) & (zeros > 0), lc, est)
    assert p == blobs[0][0]
    return out.tolist()


def merge_stats_partials(g: pd.DataFrame) -> pd.DataFrame:
    """Merge one repo's partial rows (kept for the standalone map_groups
    path and tests)."""
    return merge_all_stats_partials(g)


def merge_all_stats_partials(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized merge of ALL partial rows → one row per repo.  Numeric
    merges are a single pandas groupby-agg; only the HLL register merges
    loop (one numpy max-reduce per repo)."""
    if "n_len_bad" not in pdf.columns:  # partials from an older run layout
        pdf = pdf.assign(n_len_bad=0)
    agg = pdf.groupby("repo", sort=True).agg(
        n=("n", "sum"),
        n_null_lang=("n_null_lang", "sum"),
        n_null_path=("n_null_path", "sum"),
        n_len_bad=("n_len_bad", "sum"),
        len_sum=("len_sum", "sum"),
        len_sum2=("len_sum2", "sum"),
        len_min=("len_min", "min"),
        len_max=("len_max", "max"),
    )
    n = agg["n"].clip(lower=1)
    mean = agg["len_sum"] / n
    var = (agg["len_sum2"] / n - mean * mean).clip(lower=0.0)
    hll_paths = _merge_estimate_hlls(pdf, "hll_path")
    hll_commits = _merge_estimate_hlls(pdf, "hll_commit")
    out = pd.DataFrame(
        {
            "repo": agg.index,
            "n": agg["n"].astype(int),
            "n_null_lang": agg["n_null_lang"].astype(int),
            "n_null_path": agg["n_null_path"].astype(int),
            "n_len_bad": agg["n_len_bad"].astype(int),
            "len_min": agg["len_min"].astype(float),
            "len_max": agg["len_max"].astype(float),
            "len_mean": mean.to_numpy(),
            "len_std": (var**0.5).to_numpy(),
            "approx_distinct_paths": hll_paths,
            "approx_distinct_commits": hll_commits,
        }
    )
    return out.reset_index(drop=True)


def null_and_length_violations(batch: pa.Table, min_len: int, max_len: int) -> pa.Table:
    """Row-level violations, fully vectorized (one boolean kernel pass)."""
    null_lang = pc.is_null(batch["lang"])
    null_path = pc.is_null(batch["path"])
    clen = batch["content_len"]
    bad_len = pc.or_(pc.less(clen, min_len), pc.greater_equal(clen, max_len))
    out = {"check": [], "partition_key": [], "row_ref": [], "detail": []}
    for check, mask in (
        ("null_lang", null_lang),
        ("null_path", null_path),
        ("content_len_range", bad_len),
    ):
        sub = batch.filter(pc.fill_null(mask, False))
        out["check"].extend([check] * len(sub))
        out["partition_key"].extend(sub["repo"].to_pylist())
        out["row_ref"].extend(sub["row_ref"].to_pylist())
        if check == "content_len_range":
            out["detail"].extend(str(v) for v in sub["content_len"].to_pylist())
        else:
            out["detail"].extend([""] * len(sub))
    return pa.table(
        {
            "check": pa.array(out["check"], pa.string()),
            "partition_key": pa.array(out["partition_key"], pa.string()),
            "row_ref": pa.array(out["row_ref"], pa.string()),
            "detail": pa.array(out["detail"], pa.string()),
        }
    )


@register_check("stats")
def run_stats_check(features_ds, cfg: ValidationConfig, ctx=None):
    import glob
    import os

    import pyarrow.parquet as pq
    import ray

    pre = (ctx or {}).get("preloaded", {}).get("stats")
    fused = sorted(glob.glob(os.path.join(
        ctx["out_dir"], "stats_partials", "item=*.parquet"))) if ctx else []
    violations = None
    if pre is not None or fused:
        # fused extract pass already produced per-item partial files (and
        # the runner usually preloaded them during the extract tail); the
        # merge is driver-side pandas over a #repos-bounded table — no Ray
        # shuffle at all
        if pre is not None:
            pdf = pre.to_pandas()
        else:
            import pyarrow.dataset as pads

            pdf = pads.dataset(fused).to_table().to_pandas()
        stats_df = merge_all_stats_partials(pdf)
    else:
        # prune at the read: the partial-agg pass never touches row_ref/sha256
        if features_ds is None:
            features_ds = ray.data.read_parquet(
                ctx["features_path"],
                columns=["repo", "lang", "path", "commit", "content_len"],
            )
        partials = features_ds.map_batches(
            lambda b: stats_partials(b, cfg.min_content_len, cfg.max_content_len),
            batch_format="pyarrow", batch_size=cfg.batch_size,
        )
        pdf = partials.to_pandas()  # one row per (item-batch, repo) — small
        stats_df = merge_all_stats_partials(pdf)
        vio_ds = ray.data.read_parquet(
            ctx["features_path"],
            columns=["repo", "row_ref", "lang", "path", "content_len"],
        ) if ctx else features_ds
        violations = vio_ds.map_batches(
            lambda b: null_and_length_violations(b, cfg.min_content_len, cfg.max_content_len),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )

    # vectorized verdict build: iterrows costs ~0.5 ms/row — real time at
    # thousands of repos; compute columns with numpy, loop only to emit
    if "n_len_bad" not in stats_df.columns:
        stats_df = stats_df.assign(n_len_bad=0)
    n = stats_df["n"].to_numpy()
    n_null = (stats_df["n_null_lang"] + stats_df["n_null_path"]).to_numpy()
    null_rate = n_null / np.maximum(1, n)
    len_min = stats_df["len_min"].to_numpy()
    len_max = stats_df["len_max"].to_numpy()
    passed = ((null_rate <= cfg.max_null_rate)
              & (len_min >= cfg.min_content_len)
              & (len_max < cfg.max_content_len))
    n_vio = n_null + stats_df["n_len_bad"].to_numpy()
    verdict_rows = [
        {
            "partition_key": repo,
            "check": "stats",
            "passed": bool(p),
            "n_violations": int(v),
            "n_rows": int(nn),
            "metrics": json.dumps(
                {
                    "null_rate": float(nr),
                    "len_min": float(lmin),
                    "len_max": float(lmax),
                    "len_mean": float(lmean),
                    "len_std": float(lstd),
                    "approx_distinct_paths": float(dp),
                    "approx_distinct_commits": float(dc),
                }
            ),
        }
        for repo, p, v, nn, nr, lmin, lmax, lmean, lstd, dp, dc in zip(
            stats_df["repo"], passed, n_vio, n, null_rate, len_min, len_max,
            stats_df["len_mean"], stats_df["len_std"],
            stats_df["approx_distinct_paths"], stats_df["approx_distinct_commits"],
        )
    ]
    return violations, verdict_rows  # violations is None on the fused path
