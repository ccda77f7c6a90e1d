"""Feature extraction over the wide subject table → narrow feature rows.

The reference derives a fixed-dimension double vector per record at ingest
(`src/core/StreamObj.java`, `src/core/Stream.java:39-68`).  Here the
per-row feature vector for the drift check — plus everything the other
checks need — is computed in ONE pass over zero-copy Arrow batches, after
which the wide ``content`` column is dropped so every downstream shuffle
moves only narrow columns (SURVEY.md §7 hard-part 4).

Feature schema (all per row):
  repo, path, commit, lang, row_ref, sha256,
  content_len (int64), log_len (f64), n_lines (int64), lang_code (f64)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import sha256_hex_arrow, stable_hash64
from ..synth import LANGS

_LANG_CODE = {lang: float(i) for i, lang in enumerate(LANGS)}

# Feature columns fed to the drift detector, in order (the analogue of the
# reference's CSV attribute vector).
DRIFT_FEATURES = ["log_len", "n_lines_log", "lang_code"]


def extract_features(batch: pa.Table) -> pa.Table:
    """Stateless, fully vectorized; safe for plain-task ``map_batches``."""
    content = batch["content"]
    n_chars = pc.fill_null(pc.cast(pc.binary_length(content), pa.int64()), 0)
    n_lines = pc.add(pc.fill_null(pc.count_substring(content, "\n"), 0), 1)
    batch = sha256_hex_arrow(batch, "content", out="sha256")

    lang = batch["lang"].to_pylist()
    lang_code = np.array([_LANG_CODE.get(v, -1.0) for v in lang], dtype=np.float64)

    repo = pc.fill_null(batch["repo"], "")
    path = pc.fill_null(batch["path"], "")
    commit = pc.fill_null(batch["commit"], "")
    row_ref = pc.binary_join_element_wise(
        pc.binary_join_element_wise(repo, path, "/"), commit, "@"
    )

    n_chars_np = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    n_lines_np = n_lines.to_numpy(zero_copy_only=False).astype(np.float64)
    key_src = pc.binary_join_element_wise(
        pc.binary_join_element_wise(repo, path, "\x1f"), commit, "\x1f"
    )

    return pa.table(
        {
            "repo": batch["repo"],
            "path": batch["path"],
            "commit": batch["commit"],
            "lang": batch["lang"],
            "row_ref": row_ref,
            "sha256": batch["sha256"],
            "key_hash": pa.array(stable_hash64(key_src).astype(np.int64)),
            "content_len": n_chars,
            "log_len": pa.array(np.log1p(n_chars_np)),
            "n_lines": pc.cast(n_lines, pa.int64()),
            "n_lines_log": pa.array(np.log1p(n_lines_np)),
            "lang_code": pa.array(lang_code),
        }
    )


class FeatureExtractor:
    """Work-item actor: read a row-group range, extract features, write the
    item's feature file atomically, return one summary row.

    Used as ``items_ds.map_batches(FeatureExtractor, concurrency=N)`` over a
    Dataset of work items — the resumable-ETL pattern: each item is skipped
    instantly on resume if its manifest marker exists.
    """

    def __init__(self, out_dir: str) -> None:
        import os

        from ..pipelines.checkpoint import Manifest

        self.out_dir = out_dir
        self.manifest = Manifest(out_dir)
        self.features_dir = os.path.join(out_dir, "features")

    def __call__(self, items: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        from ..pipelines.checkpoint import atomic_write_parquet

        out_rows = {"item_id": [], "n_rows": [], "skipped": []}
        for i in range(len(items)):
            item_id = items["item_id"][i].as_py()
            unit = f"features/{item_id}"
            dest = os.path.join(self.features_dir, f"item={item_id}", "part.parquet")
            if self.manifest.is_done(unit) and os.path.exists(dest):
                out_rows["item_id"].append(item_id)
                out_rows["n_rows"].append(-1)
                out_rows["skipped"].append(True)
                continue
            pf = pq.ParquetFile(items["path"][i].as_py())
            rgs = list(range(items["rg_start"][i].as_py(), items["rg_end"][i].as_py()))
            feats = []
            for rg_batch in pf.iter_batches(batch_size=8192, row_groups=rgs):
                feats.append(extract_features(pa.Table.from_batches([rg_batch])))
            table = pa.concat_tables(feats) if feats else None
            if table is not None:
                atomic_write_parquet(table, dest)
                self.manifest.mark_done(unit, n_rows=len(table))
            out_rows["item_id"].append(item_id)
            out_rows["n_rows"].append(len(table) if table is not None else 0)
            out_rows["skipped"].append(False)
        return pa.table(
            {
                "item_id": pa.array(out_rows["item_id"], pa.string()),
                "n_rows": pa.array(out_rows["n_rows"], pa.int64()),
                "skipped": pa.array(out_rows["skipped"], pa.bool_()),
            }
        )
