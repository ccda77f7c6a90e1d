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
_LANG_ARR = pa.array(list(LANGS), pa.string())

# Feature columns fed to the drift detector, in order (the analogue of the
# reference's CSV attribute vector).
DRIFT_FEATURES = ["log_len", "n_lines_log", "lang_code"]


def extract_features(batch: pa.Table) -> pa.Table:
    """Stateless, fully vectorized; safe for plain-task ``map_batches``."""
    content = batch["content"]
    n_chars = pc.fill_null(pc.cast(pc.binary_length(content), pa.int64()), 0)
    n_lines = pc.add(pc.fill_null(pc.count_substring(content, "\n"), 0), 1)
    batch = sha256_hex_arrow(batch, "content", out="sha256")

    # vectorized lang -> code: position in the known-language list, -1 for
    # unknown/null (same mapping as _LANG_CODE, no per-row Python)
    lang_idx = pc.index_in(batch["lang"], value_set=_LANG_ARR)
    lang_code = pc.cast(pc.fill_null(lang_idx, -1), pa.float64())

    repo = pc.fill_null(batch["repo"], "")
    path = pc.fill_null(batch["path"], "")
    commit = pc.fill_null(batch["commit"], "")
    row_ref = pc.binary_join_element_wise(
        pc.binary_join_element_wise(repo, path, "/"), commit, "@"
    )

    n_chars_np = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    n_lines_np = n_lines.to_numpy(zero_copy_only=False).astype(np.float64)

    # NOTE: no regex kernels here on purpose.  Round 1 also emitted token /
    # punctuation / digit profiles (three full RE2 passes over every byte of
    # content), but no check consumes them — at 100 TB that is three wasted
    # scans of the corpus.  The text-profile queries compute them on their
    # own (column-pruned) reads instead.
    return pa.table(
        {
            "repo": batch["repo"],
            "path": batch["path"],
            "commit": batch["commit"],
            "lang": batch["lang"],
            "row_ref": row_ref,
            "sha256": batch["sha256"],
            # the uniqueness key hashes the \x1f-SEPARATED tuple, NOT
            # row_ref: "org/app"+"lib/x.py" and "org"+"app/lib/x.py"
            # concatenate to the same display string but are different
            # keys; \x1f cannot appear in the columns, so the join is
            # unambiguous (costs two short-string kernels per batch)
            "key_hash": pa.array(stable_hash64(
                pc.binary_join_element_wise(
                    pc.binary_join_element_wise(repo, path, "\x1f"),
                    commit, "\x1f")).astype(np.int64)),
            "content_len": n_chars,
            "log_len": pa.array(np.log1p(n_chars_np)),
            "n_lines": pc.cast(n_lines, pa.int64()),
            "n_lines_log": pa.array(np.log1p(n_lines_np)),
            "lang_code": lang_code,
        }
    )


_EXTRACTOR_CACHE: dict = {}


def make_extract_fn(out_dir: str, cfg, checks, repos_path: str, commits_path: str,
                    chain_repos: frozenset = frozenset()):
    """Plain-task wrapper around :class:`FeatureExtractor`: the extractor
    (dims tables + manifest handle) is built once per reused worker process
    and cached, so tasks pay no per-item setup and the run pays no
    actor-pool startup."""
    key = (out_dir, tuple(sorted(checks or [])), chain_repos)

    def extract_item(batch):
        ex = _EXTRACTOR_CACHE.get(key)
        if ex is None:
            ex = FeatureExtractor(out_dir, cfg, checks, repos_path, commits_path,
                                  chain_repos=chain_repos)
            _EXTRACTOR_CACHE[key] = ex
        return ex(batch)

    return extract_item


class FeatureExtractor:
    """Work-item processor: read a row-group range, extract features, write
    the item's feature file atomically, return one summary row.

    Runs as plain tasks over a Dataset of work items (one task per item via
    ``batch_size=1``, cached per worker process by :func:`make_extract_fn`)
    — the resumable-ETL pattern: each item is skipped instantly on resume if
    its manifest marker exists.
    """

    def __init__(self, out_dir: str, cfg=None, checks: list[str] | None = None,
                 repos_path: str | None = None, commits_path: str | None = None,
                 chain_repos: frozenset = frozenset()) -> None:
        import os

        from ..pipelines.checkpoint import Manifest

        self.chain_repos = chain_repos
        self.out_dir = out_dir
        self.manifest = Manifest(out_dir)
        self.features_dir = os.path.join(out_dir, "features")
        # fused single full-data pass: with the feature table already in
        # memory, every per-row check product — drift windows, stats
        # partials, null/length violations, referential anti-join rows, and
        # the uniqueness key-bucket files — is emitted here.  Downstream
        # checks become tiny merges + one explicit bucket exchange, so the
        # whole pipeline reads the wide input exactly once.
        self.cfg = cfg
        self.checks = set(checks or [])
        self.dims = None
        if cfg is not None and "referential" in self.checks and repos_path:
            import pyarrow.parquet as pq

            self.dims = (
                pq.read_table(repos_path, columns=["repo"])["repo"].combine_chunks(),
                pq.read_table(commits_path, columns=["commit"])["commit"].combine_chunks(),
            )

    def _unit_done(self, kind: str, item_id: str, path: str) -> bool:
        import os

        return self.manifest.is_done(f"{kind}/{item_id}") and os.path.exists(path)

    def _fused_products(self, item_id: str, table: pa.Table | None) -> None:
        """Per-item products for each enabled check; each has its own
        manifest unit so resumes are correct check-by-check."""
        import os

        import pyarrow.parquet as pq

        from ..pipelines.checkpoint import atomic_write_parquet

        cfg = self.cfg
        if cfg is None:
            return

        def load(columns):
            nonlocal table
            if table is None:
                table = pq.read_table(
                    os.path.join(self.features_dir, f"item={item_id}", "part.parquet")
                )
            return table

        if "drift" in self.checks:
            from ..checks.drift import run_drift_item

            from ..checks.drift import drift_unit

            sp = os.path.join(self.out_dir, "drift_summaries", f"item={item_id}.parquet")
            # unit name encodes the chain-exclusion set: toggling
            # drift_chain_repos on a resumed out_dir re-scores items
            if not (self.manifest.is_done(drift_unit(item_id, self.chain_repos))
                    and os.path.exists(sp)):
                run_drift_item(load(None), item_id, self.out_dir, cfg, self.manifest,
                               exclude_repos=self.chain_repos)

        if "stats" in self.checks:
            from ..checks.stats import null_and_length_violations, stats_partials

            pp = os.path.join(self.out_dir, "stats_partials", f"item={item_id}.parquet")
            if not self._unit_done("stats_partials", item_id, pp):
                t = load(None)
                atomic_write_parquet(
                    stats_partials(t, cfg.min_content_len, cfg.max_content_len), pp)
                atomic_write_parquet(
                    null_and_length_violations(t, cfg.min_content_len, cfg.max_content_len),
                    os.path.join(self.out_dir, "violations", "stats",
                                 f"item={item_id}", "part.parquet"),
                )
                self.manifest.mark_done(f"stats_partials/{item_id}")

        if "referential" in self.checks and self.dims is not None:
            from ..checks.referential import referential_violations

            rp = os.path.join(self.out_dir, "violations", "referential",
                              f"item={item_id}", "part.parquet")
            if not self._unit_done("referential", item_id, rp):
                atomic_write_parquet(
                    referential_violations(load(None), self.dims[0], self.dims[1]), rp
                )
                self.manifest.mark_done(f"referential/{item_id}")

        if "constraints" in self.checks:
            from ..checks.constraints import constraint_violations

            cp = os.path.join(self.out_dir, "violations", "constraints",
                              f"item={item_id}", "part.parquet")
            if not self._unit_done("constraints", item_id, cp):
                atomic_write_parquet(constraint_violations(load(None)), cp)
                self.manifest.mark_done(f"constraints/{item_id}")

        if "uniqueness" in self.checks:
            import numpy as np

            kp = os.path.join(self.out_dir, "keys", f"item={item_id}.parquet")
            if not self._unit_done("keys", item_id, kp):
                t = load(None)
                kh = t["key_hash"].to_numpy(zero_copy_only=False)
                P = cfg.uniqueness_buckets
                bucket = (kh % P).astype(np.int32)
                order = np.argsort(bucket, kind="stable")
                idx = pa.array(order)
                # repo/row_ref ride along so the bucket exchange can emit
                # violation rows directly — no second scan of the features
                # (late materialization: the dup scan reads key_hash only,
                # then takes the strings for the few duplicate rows)
                keys = pa.table(
                    {
                        "bucket": pa.array(bucket[order]),
                        "key_hash": pa.array(kh[order]),
                        "repo": pc.take(t["repo"], idx),
                        "row_ref": pc.take(t["row_ref"], idx),
                    }
                )
                # bucket-sorted with row-group boundaries ALIGNED to
                # uniqueness_scan_block-bucket multiples: an exchange task
                # scanning an aligned bucket range reads exactly one row
                # group per file and decodes none of its neighbours' rows
                os.makedirs(os.path.dirname(kp), exist_ok=True)
                blk = max(1, int(getattr(cfg, "uniqueness_scan_block", 4)))
                bounds = np.searchsorted(
                    bucket[order], np.arange(0, P + blk, blk, dtype=np.int64))
                with pq.ParquetWriter(kp + ".tmp", keys.schema) as w:
                    for s, e in zip(bounds[:-1], bounds[1:]):
                        if e > s:
                            w.write_table(keys.slice(s, e - s))
                os.replace(kp + ".tmp", kp)
                self.manifest.mark_done(f"keys/{item_id}")

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
                self._fused_products(item_id, None)
                out_rows["item_id"].append(item_id)
                out_rows["n_rows"].append(-1)
                out_rows["skipped"].append(True)
                continue
            pf = pq.ParquetFile(items["path"][i].as_py())
            rgs = list(range(items["rg_start"][i].as_py(), items["rg_end"][i].as_py()))
            # one vectorized pass over the whole item (items are
            # target_rows-bounded, so this is the intended memory unit —
            # per-8k-batch calls just multiply fixed kernel overheads)
            raw = pf.read_row_groups(rgs) if rgs else None
            if raw is not None and raw.num_rows:
                table = extract_features(raw)
            else:
                # empty item: write an empty features file + manifest marker
                # so resume skips it instead of re-reading it every run
                table = extract_features(
                    pa.table({"repo": pa.array([], pa.string()),
                              "path": pa.array([], pa.string()),
                              "commit": pa.array([], pa.string()),
                              "lang": pa.array([], pa.string()),
                              "content": pa.array([], pa.string())})
                )
            atomic_write_parquet(table, dest)
            self.manifest.mark_done(unit, n_rows=len(table))
            self._fused_products(item_id, table)
            out_rows["item_id"].append(item_id)
            out_rows["n_rows"].append(len(table))
            out_rows["skipped"].append(False)
        return pa.table(
            {
                "item_id": pa.array(out_rows["item_id"], pa.string()),
                "n_rows": pa.array(out_rows["n_rows"], pa.int64()),
                "skipped": pa.array(out_rows["skipped"], pa.bool_()),
            }
        )
