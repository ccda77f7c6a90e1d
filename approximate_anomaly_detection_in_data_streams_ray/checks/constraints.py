"""Row-level CONSTRAINT check: declarative column-shape predicates.

The north-star's "constraint validation" family member beyond
stats/uniqueness/referential: per-row predicates any schema contract
carries (the reference's analogue is the per-record inlier/outlier
predicate, ``src/algorithms/MCODBase.java`` M6 in SURVEY.md §2.2,
generalised from distance counts to column shapes).

Violation classes — all vectorized RE2 / set-membership kernels over the
NARROW features table (repo, path, commit, lang, row_ref); ``content``
is never re-read:

* ``constraint_commit`` — commit must match ``^[0-9a-f]{40}$`` (null
  included: a missing commit cannot satisfy the shape).
* ``constraint_path`` — a non-null path must be relative, non-empty and
  free of ``..`` traversal segments (null paths belong to the stats
  check's null-rate budget, not here).
* ``constraint_lang`` — a non-null lang must be a known language.

100-TB shape: one column-pruned pass over the features parquet, no
exchange at all (every predicate is decided row-locally); verdicts are
per-(partition, class) counts folded from the violation rows, which are
rare by construction.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..synth import LANGS
from .base import ValidationConfig, register_check

_COMMIT_RE = r"^[0-9a-f]{40}$"
# an absolute path, or a `..` segment anywhere (leading, inner, trailing)
_PATH_BAD_RE = r"^/|(^|/)\.\.(/|$)"
_LANG_ARR = pa.array(list(LANGS), pa.string())


def constraint_violations(batch: pa.Table) -> pa.Table:
    """Vectorized predicate evaluation of one features batch."""
    commit_ok = pc.fill_null(
        pc.match_substring_regex(batch["commit"], _COMMIT_RE), False)
    bad_commit = pc.invert(commit_ok)

    p = batch["path"]
    bad_shape = pc.or_(
        pc.fill_null(pc.match_substring_regex(p, _PATH_BAD_RE), False),
        pc.fill_null(pc.equal(p, ""), False))
    bad_path = pc.and_(pc.is_valid(p), bad_shape)

    lang = batch["lang"]
    known = pc.is_in(lang, value_set=_LANG_ARR)   # false for null
    bad_lang = pc.and_(pc.is_valid(lang), pc.invert(known))

    out = {"check": [], "partition_key": [], "row_ref": [], "detail": []}
    for check, mask, col in (
        ("constraint_commit", bad_commit, "commit"),
        ("constraint_path", bad_path, "path"),
        ("constraint_lang", bad_lang, "lang"),
    ):
        sub = batch.filter(mask)
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


@register_check("constraints")
def run_constraints_check(features_ds, cfg: ValidationConfig, ctx):
    """Fused-first like referential: the extract pass writes per-item
    constraint violation files (stages/features.py ``_fused_products``)
    while the features table is already in memory, so this phase is a
    tiny merge.  The standalone fallback (direct ``validate --checks
    constraints`` on an out_dir with features but no fused files) is one
    column-pruned pass with block-sized batches — the predicates are
    pure RE2 / set-membership kernels, so per-task fixed cost dominates
    at small batch sizes."""
    import glob
    import os

    fused = sorted(glob.glob(os.path.join(
        ctx["out_dir"], "violations", "constraints",
        "item=*", "part.parquet"))) if ctx else []
    pre = (ctx or {}).get("preloaded", {}).get("constraints")
    violations = None
    if pre is not None:
        fused = fused or [None]  # preload implies the fused layout
        vdf = pre.to_pandas()
    elif fused:
        import pyarrow.dataset as pads

        vdf = pads.dataset(fused).to_table().to_pandas()
    else:
        if features_ds is None:
            features_ds = ray.data.read_parquet(
                ctx["features_path"],
                columns=["repo", "path", "commit", "lang", "row_ref"],
            )
        violations = features_ds.map_batches(
            constraint_violations,
            batch_format="pyarrow",
            batch_size=None,
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
