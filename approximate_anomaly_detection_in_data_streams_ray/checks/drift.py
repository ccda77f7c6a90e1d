"""Distribution-drift check: the reference's detectors as a Ray Data stage.

Per BASELINE.json north_star, the reference's sliding-window outlier
detection (`src/algorithms/MCOD.java` et al.) is rebuilt as the engine's
drift check: each repo partition's file stream — ordered features
(log length, log line count, scaled lang code) — is fed through a
per-partition detector window inside an actor pool.  Violations are the
pure-outlier rows (the reference's report, `src/Executor.java:209-222`);
the per-repo verdict compares the fraction of points *ever* classified
outlier against a threshold (sustained distribution shifts surface as a
burst of outlier classifications while the window still holds the old
regime).

Scale/salting: work items are row-group ranges (``pipelines/
partitioning.py``); a hot repo split across items runs one window per
sub-stream (salted sub-partition) and the final ``groupby(repo)`` sums the
counters — the explicit skew handling the north_rule demands.  Output is
written per item (atomic + manifest) so a killed run resumes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.detectors import MCOD, ApproxMCOD, LSHOD, ApproxMCLSHOD
from .base import ValidationConfig, register_check

DRIFT_FEATURES = ["log_len", "n_lines_log", "lang_code"]


def make_detector(cfg: ValidationConfig, dims: int, partition_seed: int,
                  radius: float | None = None):
    algo = cfg.drift_algorithm
    W, S, k = cfg.drift_window, cfg.drift_slide, cfg.drift_k
    R = cfg.drift_radius if radius is None else radius
    metric = getattr(cfg, "drift_metric", "euclidean")
    if algo == "mcod":
        return MCOD(W, S, R, k, dims, metric=metric)
    if algo == "approx_mcod":
        return ApproxMCOD(W, S, R, k, dims, cfg.drift_pd_limit, cfg.drift_ar_factor,
                          seed=partition_seed, metric=metric)
    if algo == "lshod":
        return LSHOD(W, S, R, k, dims, w=max(1, int(R)), seed=partition_seed)
    if algo == "approx_mclshod":
        return ApproxMCLSHOD(W, S, R, k, dims, w=max(1, int(3 * R / 2)), seed=partition_seed)
    raise ValueError(f"unknown drift algorithm {algo!r}")


def calibrate_radius(vectors: np.ndarray, k: int, window: int, factor: float) -> float:
    """R = median k-NN distance of the first *window*-sized sample × factor.

    The reference leaves R as a per-dataset CLI knob (``--R``,
    `src/Executor.java:68-70`); an unsupervised multi-partition engine must
    instead adapt R to each partition's local density so the outlier rate
    is comparable across partitions of very different scale.  The sample
    MUST be window-sized: the detector asks for k neighbors among ≤W
    in-window points, so calibrating on a denser sample yields an R too
    small for the window's density and floods the check with outliers.
    0.9-quantile, not median: dense duplicate-feature cores would collapse
    the median to ~0 and flag every moderately-spread point."""
    sample = vectors[: min(len(vectors), window)]
    if len(sample) <= k + 1:
        return 1.0
    d = sample[:, None, :] - sample[None, :, :]
    dist = np.sqrt(np.einsum("ijk,ijk->ij", d, d))
    kth = np.partition(dist, k, axis=1)[:, k]  # k-th neighbor (self at 0)
    # median (not a high quantile): for short sub-streams the calibration
    # sample can contain the drifted tail itself — the median is robust to
    # ≤50% contamination, a 0.9-quantile is exactly the contaminated region
    r = float(np.quantile(kth, 0.5)) * factor
    return max(r, 1e-6)


class StreamDetector:
    """Incremental form of the per-sub-stream detection loop: ``feed`` chunk
    arrays in any batch sizes, ``finish`` flushes and returns the results.
    Exactly equivalent to running the whole stream at once — chunks are
    re-batched internally into slide-sized micro-batches from position 0,
    and radius calibration waits for the first window-sized sample (the
    same ``vectors[:W]`` the one-shot path uses) — so a repo chained across
    work items scores identically to an unsplit run.  Memory is O(window),
    independent of stream length."""

    def __init__(self, cfg: ValidationConfig, partition_seed: int) -> None:
        self.cfg = cfg
        self.seed = partition_seed
        self.det = None
        self.radius = cfg.drift_radius
        self._calib: list[np.ndarray] = []
        self._calib_n = 0
        self._buf: np.ndarray | None = None  # pending partial slide
        self.max_rate = 0.0
        self._prev_events = 0
        self.scored_events = 0
        self.scored_points = 0
        self.warmup = max(2 * cfg.drift_k, cfg.drift_window // 4)

    def _ensure_det(self) -> None:
        vec = (np.concatenate(self._calib, axis=0) if self._calib
               else np.empty((0, 1)))
        self._calib = []
        if self.cfg.drift_auto_radius:
            self.radius = calibrate_radius(vec, self.cfg.drift_k,
                                           self.cfg.drift_window,
                                           self.cfg.drift_radius_factor)
        self.det = make_detector(self.cfg, vec.shape[1], self.seed, self.radius)
        self._advance(vec)

    def _slide(self, batch: np.ndarray) -> None:
        # don't score while the window is too sparse to host k neighbors
        window_filled = len(self.det.window) >= self.warmup
        self.det.process_new_stream_objects(batch)
        events = self.det.n_insert_outliers
        delta = events - self._prev_events
        self._prev_events = events
        if window_filled:
            self.max_rate = max(self.max_rate, delta / max(1, len(batch)))
            self.scored_events += delta
            self.scored_points += len(batch)

    def _advance(self, chunks: np.ndarray) -> None:
        data = (chunks if self._buf is None or not len(self._buf)
                else np.concatenate([self._buf, chunks], axis=0))
        S = self.cfg.drift_slide
        n_full = len(data) // S
        for i in range(n_full):
            self._slide(data[i * S : (i + 1) * S])
        self._buf = data[n_full * S :]

    def feed(self, chunks: np.ndarray) -> None:
        if not len(chunks):
            return
        if self.det is None:
            self._calib.append(chunks)
            self._calib_n += len(chunks)
            if self._calib_n >= self.cfg.drift_window:
                self._ensure_det()
        else:
            self._advance(chunks)

    def finish(self):
        if self.det is None:
            self._ensure_det()
        if self._buf is not None and len(self._buf):
            self._slide(self._buf)
            self._buf = None
        self.det.evaluate_remaining_elems_in_win()
        res = self.det.get_results()
        # ids are 1-based
        idx = np.array(sorted(self.det.outliers_found), dtype=np.int64) - 1
        metrics = {
            "radius": self.radius,
            "max_slide_outlier_rate": self.max_rate,
            "scored_events": self.scored_events,
            "scored_points": self.scored_points,
        }
        return idx, res, metrics


def detect_partition(vectors: np.ndarray, cfg: ValidationConfig, partition_seed: int):
    """Run one sub-stream through a detector; return (outlier 0-based
    indices, counters, drift metrics).  Mirrors
    `Executor.performOutlierDetection` (`src/Executor.java:94-137`):
    slide-sized micro-batches then final window flush.  Additionally tracks
    the per-slide outlier-classification rate — a sustained distribution
    shift shows up as a burst of outlier classifications while the window
    still holds the previous regime."""
    sd = StreamDetector(cfg, partition_seed)
    sd.feed(vectors)
    return sd.finish()


def chunk_vectors(vecs: np.ndarray, chunk_rows: int) -> tuple[np.ndarray, np.ndarray]:
    """Aggregate a (n, d) row-feature stream into per-chunk distribution
    vectors: [means of each feature, std of feature 0] — the
    "content-length/lang distribution" points the drift detector scores.

    Returns (chunk_matrix, chunk_start_row_indices).  A trailing partial
    chunk is kept if it has at least half a chunk of rows."""
    n = len(vecs)
    C = chunk_rows
    if C <= 1:
        return vecs, np.arange(n)
    n_full = n // C
    starts = np.arange(n_full) * C
    if n_full == 0:
        # same d+1 feature space as the full-chunk path (means + std of
        # feature 0) so sub-chunk streams aren't scored in a different space
        return (np.concatenate([vecs.mean(axis=0), [vecs[:, 0].std()]])[None, :],
                np.array([0]))
    body = vecs[: n_full * C].reshape(n_full, C, vecs.shape[1])
    means = body.mean(axis=1)
    stds = body[:, :, 0].std(axis=1, keepdims=True)
    chunks = np.concatenate([means, stds], axis=1)
    tail = n - n_full * C
    if tail >= C // 2:
        tmean = vecs[n_full * C :].mean(axis=0)
        tstd = vecs[n_full * C :, 0].std()
        chunks = np.vstack([chunks, np.concatenate([tmean, [tstd]])])
        starts = np.concatenate([starts, [n_full * C]])
    return chunks, starts


class ChunkAccumulator:
    """Incremental :func:`chunk_vectors` over a stream fed in arbitrary
    pieces (item slices of a chained repo): carries the <chunk_rows leftover
    rows (and their row_refs) across feeds so chunk boundaries land exactly
    where a one-shot call over the concatenated stream would put them.
    ``feed`` returns the newly completed chunks; ``finish`` applies the tail
    rules (single-chunk stream when total < C, else keep the tail iff
    ≥ C//2).  Memory is O(C) rows regardless of stream length."""

    def __init__(self, chunk_rows: int) -> None:
        self.C = chunk_rows
        self._left_v: np.ndarray | None = None
        self._left_r: list = []
        self.n_rows = 0
        self._n_full = 0

    @staticmethod
    def _moments(body: np.ndarray) -> np.ndarray:
        # same d+1 feature space as chunk_vectors: per-chunk means + std of
        # feature 0
        if body.ndim == 2:
            return np.concatenate([body.mean(axis=0), [body[:, 0].std()]])
        means = body.mean(axis=1)
        stds = body[:, :, 0].std(axis=1, keepdims=True)
        return np.concatenate([means, stds], axis=1)

    def feed(self, vecs: np.ndarray, refs: list):
        """Returns (chunks, global_row_starts, start_row_refs) for the
        chunks completed by this feed."""
        C = self.C
        if C <= 1:
            starts = np.arange(self.n_rows, self.n_rows + len(vecs))
            self.n_rows += len(vecs)
            self._n_full += len(vecs)
            return vecs, starts, list(refs)
        if self._left_v is not None and len(self._left_v):
            data = np.concatenate([self._left_v, vecs], axis=0)
            drefs = self._left_r + list(refs)
        else:
            data, drefs = vecs, list(refs)
        base = self.n_rows - len(self._left_r)
        self.n_rows += len(vecs)
        n_full = len(data) // C
        self._left_v = data[n_full * C :]
        self._left_r = drefs[n_full * C :]
        if n_full == 0:
            return (np.empty((0, data.shape[1] + 1)), np.empty(0, np.int64), [])
        body = data[: n_full * C].reshape(n_full, C, data.shape[1])
        chunks = self._moments(body)
        starts = base + np.arange(n_full) * C
        self._n_full += n_full
        return chunks, starts, [drefs[i * C] for i in range(n_full)]

    def finish(self):
        C = self.C
        n_left = 0 if self._left_v is None else len(self._left_v)
        if C <= 1 or n_left == 0:
            return (np.empty((0, 1)), np.empty(0, np.int64), [])
        # total stream < C → single chunk (chunk_vectors' n_full == 0 path);
        # otherwise keep the tail only when it is at least half a chunk
        if self._n_full > 0 and n_left < C // 2:
            return (np.empty((0, 1)), np.empty(0, np.int64), [])
        chunk = self._moments(self._left_v)[None, :]
        start = np.array([self.n_rows - n_left], np.int64)
        return chunk, start, [self._left_r[0]]


def drift_unit(item_id: str, exclude_repos: frozenset = frozenset()) -> str:
    """Manifest unit for one item's drift pass.  The chain-exclusion set is
    part of the unit name: resuming an out_dir with a toggled/changed
    ``drift_chain_repos`` config must re-score affected items rather than
    reuse summaries computed under the other exclusion set (stale reuse
    double-counts chained repos, or silently never scores them)."""
    if not exclude_repos:
        return f"drift/{item_id}"
    import hashlib

    sig = hashlib.sha1("\x1f".join(sorted(exclude_repos)).encode()).hexdigest()[:10]
    return f"drift@{sig}/{item_id}"


def run_drift_item(t: pa.Table, item_id: str, out_dir: str,
                   cfg: ValidationConfig, manifest,
                   exclude_repos: frozenset = frozenset()) -> pa.Table:
    """Run the drift detectors over one work item's feature table: one
    window per contiguous repo run, violations + summary written atomically.
    Called with the in-memory table by the fused extract stage
    (``stages/features.py``) and with a re-read table by the standalone
    :class:`DriftRunner`.  *exclude_repos* names the item-straddling repos
    handled by the sequential chain pass (:func:`run_repo_chain`) instead."""
    from ..functions.hashing import stable_hash64
    from ..pipelines.checkpoint import atomic_write_parquet

    summary_path = os.path.join(out_dir, "drift_summaries", f"item={item_id}.parquet")
    unit = drift_unit(item_id, exclude_repos)
    if manifest.is_done(unit) and os.path.exists(summary_path):
        import pyarrow.parquet as pq

        return pq.read_table(summary_path)

    scales = np.array([cfg.feature_scales.get(f, 1.0) for f in DRIFT_FEATURES])
    repos = np.asarray(t["repo"].to_pylist())
    vecs = np.stack(
        [t[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in DRIFT_FEATURES],
        axis=1,
    ) * scales

    # contiguous repo runs = sub-streams (rows are repo-contiguous by
    # construction; a repo restarted in a later item is a salted split)
    change = np.nonzero(repos[1:] != repos[:-1])[0] + 1
    bounds = [0, *change.tolist(), len(repos)]

    v_rows = {"check": [], "partition_key": [], "row_ref": [], "detail": []}
    s_rows = {"repo": [], "item_id": [], "n": [], "n_pure_outliers": [],
              "n_outlier_events": [], "n_range_queries": [],
              "max_slide_outlier_rate": [], "radius": [], "insufficient": [],
              "scored_events": [], "scored_points": []}
    C = max(1, cfg.drift_chunk_rows)
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        repo = str(repos[b0])
        if repo in exclude_repos:
            continue
        n_sub = b1 - b0
        seed = int(stable_hash64([repo])[0] % (2**31)) ^ cfg.drift_seed
        chunks, starts = chunk_vectors(vecs[b0:b1], C)
        if len(chunks) < cfg.drift_min_points:
            idx = np.empty(0, dtype=np.int64)
            res = {"nOnlyOutlier": 0, "nBothInlierOutlier": 0,
                   "nRangeQueriesExecuted": 0}
            met = {"radius": 0.0, "max_slide_outlier_rate": 0.0,
                   "scored_events": 0, "scored_points": 0}
            n_points = 0
            insufficient = True
        else:
            idx, res, met = detect_partition(chunks, cfg, seed)
            n_points = len(chunks)
            insufficient = False
        refs = t["row_ref"].slice(b0, n_sub).to_pylist()
        for i in idx.tolist():
            r0 = int(starts[i])
            r1 = int(starts[i + 1]) if i + 1 < len(starts) else n_sub
            v_rows["check"].append("drift")
            v_rows["partition_key"].append(repo)
            v_rows["row_ref"].append(refs[r0])
            v_rows["detail"].append(f"pure_outlier_chunk rows {r0}-{r1 - 1}")
        s_rows["repo"].append(repo)
        s_rows["item_id"].append(item_id)
        s_rows["n"].append(n_points if not insufficient else n_sub)
        s_rows["n_pure_outliers"].append(len(idx))
        s_rows["n_outlier_events"].append(
            res["nOnlyOutlier"] + res["nBothInlierOutlier"]
        )
        s_rows["n_range_queries"].append(res["nRangeQueriesExecuted"])
        s_rows["max_slide_outlier_rate"].append(met["max_slide_outlier_rate"])
        s_rows["radius"].append(met["radius"])
        s_rows["insufficient"].append(insufficient)
        s_rows["scored_events"].append(met["scored_events"])
        s_rows["scored_points"].append(met["scored_points"])

    violations = pa.table(
        {k: pa.array(v, pa.string()) for k, v in v_rows.items()}
    )
    atomic_write_parquet(
        violations, os.path.join(out_dir, "violations", "drift",
                                 f"item={item_id}", "part.parquet")
    )
    summary = pa.table(
        {
            "repo": pa.array(s_rows["repo"], pa.string()),
            "item_id": pa.array(s_rows["item_id"], pa.string()),
            "n": pa.array(s_rows["n"], pa.int64()),
            "n_pure_outliers": pa.array(s_rows["n_pure_outliers"], pa.int64()),
            "n_outlier_events": pa.array(s_rows["n_outlier_events"], pa.int64()),
            "n_range_queries": pa.array(s_rows["n_range_queries"], pa.int64()),
            "max_slide_outlier_rate": pa.array(
                s_rows["max_slide_outlier_rate"], pa.float64()
            ),
            "radius": pa.array(s_rows["radius"], pa.float64()),
            "insufficient": pa.array(s_rows["insufficient"], pa.bool_()),
            "scored_events": pa.array(s_rows["scored_events"], pa.int64()),
            "scored_points": pa.array(s_rows["scored_points"], pa.int64()),
        }
    )
    atomic_write_parquet(summary, summary_path)
    manifest.mark_done(unit)
    return summary


def _chain_id(repo: str) -> str:
    import hashlib

    return hashlib.sha1(repo.encode()).hexdigest()[:12]


def _summary_table(s_rows: dict) -> pa.Table:
    return pa.table(
        {
            "repo": pa.array(s_rows["repo"], pa.string()),
            "item_id": pa.array(s_rows["item_id"], pa.string()),
            "n": pa.array(s_rows["n"], pa.int64()),
            "n_pure_outliers": pa.array(s_rows["n_pure_outliers"], pa.int64()),
            "n_outlier_events": pa.array(s_rows["n_outlier_events"], pa.int64()),
            "n_range_queries": pa.array(s_rows["n_range_queries"], pa.int64()),
            "max_slide_outlier_rate": pa.array(
                s_rows["max_slide_outlier_rate"], pa.float64()
            ),
            "radius": pa.array(s_rows["radius"], pa.float64()),
            "insufficient": pa.array(s_rows["insufficient"], pa.bool_()),
            "scored_events": pa.array(s_rows["scored_events"], pa.int64()),
            "scored_points": pa.array(s_rows["scored_points"], pa.int64()),
        }
    )


def run_repo_chain(repo: str, item_ids: list[str], out_dir: str,
                   cfg: ValidationConfig, manifest=None) -> pa.Table:
    """Sequential cross-item window continuation for one straddling repo:
    stream its feature slices item by item (plan order) through ONE
    :class:`ChunkAccumulator` + :class:`StreamDetector`, so the repo scores
    exactly as if it had never been split — the exact-parity alternative to
    the default per-sub-stream subset semantics.  One Ray task per chained
    repo is the maximum available parallelism: the window is inherently
    sequential, but chains for different repos run concurrently and the
    detector holds only O(window) state (rows compress C-fold into chunks
    before the detector ever sees them).  Violations and the summary land in
    the same layout as per-item drift output; the manifest unit
    ``drift-chain/<id>`` makes chains resumable."""
    from ..functions.hashing import stable_hash64
    from ..pipelines.checkpoint import Manifest, atomic_write_parquet

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    manifest = manifest or Manifest(out_dir)
    cid = _chain_id(repo)
    unit = f"drift-chain/{cid}"
    spath = os.path.join(out_dir, "drift_summaries", f"chain={cid}.parquet")
    if manifest.is_done(unit) and os.path.exists(spath):
        return pq.read_table(spath)

    scales = np.array([cfg.feature_scales.get(f, 1.0) for f in DRIFT_FEATURES])
    seed = int(stable_hash64([repo])[0] % (2**31)) ^ cfg.drift_seed
    C = max(1, cfg.drift_chunk_rows)
    acc = ChunkAccumulator(C)
    sd = StreamDetector(cfg, seed)
    chunk_starts: list[int] = []
    chunk_refs: list[str] = []
    for iid in item_ids:
        t = pq.read_table(
            os.path.join(out_dir, "features", f"item={iid}", "part.parquet"),
            columns=["repo", "row_ref"] + DRIFT_FEATURES,
        )
        t = t.filter(pc.equal(t["repo"], repo))
        if not t.num_rows:
            continue
        vecs = np.stack(
            [t[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in DRIFT_FEATURES], axis=1,
        ) * scales
        chunks, starts, refs = acc.feed(vecs, t["row_ref"].to_pylist())
        sd.feed(chunks)
        chunk_starts.extend(starts.tolist())
        chunk_refs.extend(refs)
    chunks, starts, refs = acc.finish()
    sd.feed(chunks)
    chunk_starts.extend(starts.tolist())
    chunk_refs.extend(refs)

    n_sub = acc.n_rows
    if len(chunk_starts) < cfg.drift_min_points:
        idx = np.empty(0, dtype=np.int64)
        res = {"nOnlyOutlier": 0, "nBothInlierOutlier": 0,
               "nRangeQueriesExecuted": 0}
        met = {"radius": 0.0, "max_slide_outlier_rate": 0.0,
               "scored_events": 0, "scored_points": 0}
        n_points, insufficient = n_sub, True
    else:
        idx, res, met = sd.finish()
        n_points, insufficient = len(chunk_starts), False

    v_rows = {"check": [], "partition_key": [], "row_ref": [], "detail": []}
    for i in idx.tolist():
        r0 = chunk_starts[i]
        r1 = (chunk_starts[i + 1] if i + 1 < len(chunk_starts) else n_sub)
        v_rows["check"].append("drift")
        v_rows["partition_key"].append(repo)
        v_rows["row_ref"].append(chunk_refs[i])
        v_rows["detail"].append(f"pure_outlier_chunk rows {r0}-{r1 - 1}")
    atomic_write_parquet(
        pa.table({k: pa.array(v, pa.string()) for k, v in v_rows.items()}),
        os.path.join(out_dir, "violations", "drift", f"chain={cid}",
                     "part.parquet"),
    )
    summary = _summary_table({
        "repo": [repo], "item_id": [f"chain[{len(item_ids)}]"],
        "n": [n_points], "n_pure_outliers": [len(idx)],
        "n_outlier_events": [res["nOnlyOutlier"] + res["nBothInlierOutlier"]],
        "n_range_queries": [res["nRangeQueriesExecuted"]],
        "max_slide_outlier_rate": [met["max_slide_outlier_rate"]],
        "radius": [met["radius"]], "insufficient": [insufficient],
        "scored_events": [met["scored_events"]],
        "scored_points": [met["scored_points"]],
    })
    atomic_write_parquet(summary, spath)
    manifest.mark_done(unit)
    return summary


def run_chained_repos(chains: dict[str, list[str]], out_dir: str,
                      cfg: ValidationConfig) -> pa.Table | None:
    """One Ray task per straddling repo (sequential within, parallel
    across); serial fallback without a Ray session."""
    import ray

    if not chains:
        return None
    items = sorted(chains.items())
    if ray.is_initialized():
        task = ray.remote(num_cpus=1)(run_repo_chain)
        tables = ray.get([task.remote(r, ids, out_dir, cfg) for r, ids in items])
    else:
        tables = [run_repo_chain(r, ids, out_dir, cfg) for r, ids in items]
    return pa.concat_tables(tables)


class DriftRunner:
    """Actor over work items for the standalone drift phase (used when the
    fused extract+drift pass is disabled or summaries are missing)."""

    def __init__(self, out_dir: str, cfg: ValidationConfig,
                 exclude_repos: frozenset = frozenset()) -> None:
        from ..pipelines.checkpoint import Manifest

        self.out_dir = out_dir
        self.cfg = cfg
        self.exclude_repos = exclude_repos
        self.manifest = Manifest(out_dir)

    def _run_item(self, item_id: str) -> pa.Table:
        import pyarrow.parquet as pq

        summary_path = os.path.join(self.out_dir, "drift_summaries",
                                    f"item={item_id}.parquet")
        if (self.manifest.is_done(drift_unit(item_id, self.exclude_repos))
                and os.path.exists(summary_path)):
            return pq.read_table(summary_path)
        feat_path = os.path.join(self.out_dir, "features", f"item={item_id}",
                                 "part.parquet")
        t = pq.read_table(feat_path, columns=["repo", "row_ref"] + DRIFT_FEATURES)
        return run_drift_item(t, item_id, self.out_dir, self.cfg, self.manifest,
                              exclude_repos=self.exclude_repos)

    def __call__(self, items: pa.Table) -> pa.Table:
        outs = [self._run_item(items["item_id"][i].as_py()) for i in range(len(items))]
        return pa.concat_tables(outs)


def merge_drift_summaries(g: pd.DataFrame, cfg: ValidationConfig) -> pd.DataFrame:
    """Per-repo verdict from salted sub-stream counters: sums merge across
    sub-streams; the slide-rate spike merges by max (it is a local signal)."""
    scored = g[~g["insufficient"]]
    n = int(scored["n"].sum())
    events = int(scored["scored_events"].sum())
    n_scored_pts = int(scored["scored_points"].sum())
    frac = events / max(1, n_scored_pts)
    max_rate = float(scored["max_slide_outlier_rate"].max()) if len(scored) else 0.0
    if n == 0:  # nothing scoreable: insufficient data, pass with a note
        passed, reason = True, "insufficient_rows"
    else:
        passed = (
            frac <= cfg.drift_max_outlier_event_frac
            and max_rate <= cfg.drift_max_slide_outlier_rate
        )
        reason = ""
    return pd.DataFrame(
        {
            "partition_key": [g["repo"].iloc[0]],
            "check": ["drift"],
            "passed": [passed],
            "n_violations": [int(scored["n_pure_outliers"].sum())],
            "n_rows": [int(g["n"].sum())],
            "metrics": [json.dumps(
                {
                    "outlier_event_frac": frac,
                    "max_slide_outlier_rate": max_rate,
                    "scored_events": events,
                    "scored_points": n_scored_pts,
                    "n_outlier_events": int(scored["n_outlier_events"].sum()),
                    "n_range_queries": int(scored["n_range_queries"].sum()),
                    "n_substreams": int(len(g)),
                    "note": reason,
                }
            )],
        }
    )


def merge_all_drift_summaries(sdf: pd.DataFrame, cfg: ValidationConfig) -> list[dict]:
    """Vectorized per-repo verdicts from all sub-stream counters at once."""
    if sdf.empty:
        return []
    scored = sdf[~sdf["insufficient"]]
    agg = scored.groupby("repo").agg(
        n=("n", "sum"),
        scored_events=("scored_events", "sum"),
        scored_points=("scored_points", "sum"),
        n_pure=("n_pure_outliers", "sum"),
        n_rq=("n_range_queries", "sum"),
        max_rate=("max_slide_outlier_rate", "max"),
    )
    all_rows = sdf.groupby("repo").agg(n_all=("n", "sum"), subs=("item_id", "count"))
    # vectorized verdict build (per-repo .loc lookups cost real time at
    # thousands of repos): left-join the scored aggregates, compute the
    # pass/fail columns with numpy, loop only to emit rows
    m = all_rows.join(agg, how="left")
    has = m["n"].fillna(0).to_numpy() > 0
    ev = m["scored_events"].fillna(0).to_numpy().astype(np.int64)
    pts = m["scored_points"].fillna(0).to_numpy().astype(np.int64)
    frac = np.where(has, ev / np.maximum(1, pts), 0.0)
    max_rate = np.where(has, m["max_rate"].fillna(0).to_numpy(), 0.0)
    n_pure = np.where(has, m["n_pure"].fillna(0).to_numpy(), 0).astype(np.int64)
    n_rq = np.where(has, m["n_rq"].fillna(0).to_numpy(), 0).astype(np.int64)
    passed = np.where(
        has,
        (frac <= cfg.drift_max_outlier_event_frac)
        & (max_rate <= cfg.drift_max_slide_outlier_rate),
        True,
    )
    rows = [
        {
            "partition_key": repo,
            "check": "drift",
            "passed": bool(p),
            "n_violations": int(npu),
            "n_rows": int(na),
            "metrics": json.dumps({
                "outlier_event_frac": float(f),
                "max_slide_outlier_rate": float(mr),
                "scored_events": int(e),
                "scored_points": int(pt),
                "n_range_queries": int(rq),
                "n_substreams": int(sub),
                "note": "" if h else "insufficient_rows",
            }),
        }
        for repo, p, npu, na, f, mr, e, pt, rq, sub, h in zip(
            m.index, passed, n_pure, m["n_all"], frac, max_rate, ev, pts,
            n_rq, m["subs"], has,
        )
    ]
    return rows


@register_check("drift")
def run_drift_check(items_ds, cfg: ValidationConfig, ctx):
    """items_ds: Dataset of work items (must run after feature extraction).
    When the fused extract+drift pass already produced every item summary
    (the default), this is a pure merge with no actor pool."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    sum_dir = os.path.join(ctx["out_dir"], "drift_summaries")
    have = {os.path.basename(f)[5:-8] for f in glob.glob(os.path.join(sum_dir, "item=*.parquet"))}
    # prefer the plain id list from the runner (free) over a Ray job on the
    # items dataset just to enumerate ids
    if ctx.get("item_ids") is not None:
        want = set(ctx["item_ids"])
    else:
        want = set(items_ds.to_pandas()["item_id"]) if hasattr(items_ds, "to_pandas") else set()
    pre = ctx.get("preloaded", {}).get("drift")
    if pre is not None:
        sdf = pre.to_pandas()
    elif want and want <= have:
        import pyarrow.dataset as pads

        files = [os.path.join(sum_dir, f"item={i}.parquet") for i in sorted(want)]
        sdf = pads.dataset(files).to_table().to_pandas()
    else:
        summaries = items_ds.map_batches(
            DriftRunner,
            fn_constructor_args=(ctx["out_dir"], cfg,
                                 ctx.get("drift_chain_exclude", frozenset())),
            batch_format="pyarrow",
            batch_size=1,
            concurrency=(1, cfg.drift_concurrency),
        )
        sdf = summaries.to_pandas()
    extra = ctx.get("drift_chain_summaries")
    if extra is not None:
        sdf = pd.concat([sdf, extra.to_pandas()], ignore_index=True)
    verdict_rows = merge_all_drift_summaries(sdf, cfg)
    import ray

    vio = ray.data.read_parquet(os.path.join(ctx["out_dir"], "violations", "drift"))
    return vio, verdict_rows
