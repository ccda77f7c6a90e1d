"""Deterministic synthetic data: the ``code_files`` subject table + dims.

Replaces the reference's benchmark CSVs (``/root/reference/datasets/*.csv``,
headerless doubles loaded by ``src/core/Stream.java:39-68``) with the
source-code-repo table mandated by ``BASELINE.json`` ``input_hint``.  Every
value derives from a seeded ``numpy`` RNG; the generator also emits a
ground-truth *manifest* of injected violations that tests assert against.

Injected violation classes (see FIXTURES.md §1):
  * null ``lang`` / ``path``            → null-rate check
  * empty / oversized ``content``       → min/max length check
  * duplicate ``(repo, path, commit)``  → uniqueness check
  * ``repo`` / ``commit`` absent from the dimension tables → referential
  * drift repos whose later rows shift the content-length distribution
    → the MCOD-based drift check must flag them
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "java", "go", "rust", "js", "c", "md"]

_WORDS = (
    "load store index batch window slide radius neighbor cluster entry queue "
    "stream object detect outlier inlier merge split hash bucket probe scan "
    "read write flush commit branch vector metric count state check verify "
    "table column schema config worker node block shard salt key value row"
).split()


def _make_corpus(rng: np.random.Generator, lang: str) -> str:
    """A few hundred lines of plausible pseudo-code for one language."""
    if lang == "md":
        tmpl = ["# {0} {1}", "- {0} of {1} with {2}", "see `{0}_{1}`", ""]
    elif lang in ("python",):
        tmpl = ["def {0}_{1}({2}):", "    return {0}.{1}({2})",
                "{0} = {1}({2})", "# {0} {1} {2}"]
    elif lang in ("go", "rust", "c"):
        tmpl = ["func {0}{1}({2}) {{", "    {0} := {1}.{2}()", "}}",
                "// {0} {1} {2}"]
    else:
        tmpl = ["public {0} {1}({2}) {{", "    return this.{0}.{1}({2});",
                "}}", "// {0} {1} {2}"]
    lines = []
    for _ in range(400):
        t = tmpl[int(rng.integers(len(tmpl)))]
        w = rng.choice(_WORDS, size=3, replace=True)
        lines.append(t.format(w[0], w[1], w[2]))
    return "\n".join(lines)


@dataclass
class SynthManifest:
    n_rows: int = 0
    n_repos: int = 0
    seed: int = 0
    max_content_len: int = 0
    null_lang: list = field(default_factory=list)      # row_refs
    null_path: list = field(default_factory=list)
    len_violations: list = field(default_factory=list)
    dup_keys: list = field(default_factory=list)       # duplicated row_refs
    orphan_repo: list = field(default_factory=list)    # repo names
    orphan_commit: list = field(default_factory=list)  # row_refs
    drift_repos: list = field(default_factory=list)    # repo names
    bad_commit_format: list = field(default_factory=list)  # row_refs
    bad_path_shape: list = field(default_factory=list)     # row_refs
    bad_lang_value: list = field(default_factory=list)     # row_refs
    sha256: dict = field(default_factory=dict)         # row_ref -> hex digest

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=1, sort_keys=True)


def row_ref(repo: str, path: str | None, commit: str | None) -> str:
    return f"{repo}/{path or ''}@{commit or ''}"


def generate_code_files(
    out_dir: str,
    n_rows: int = 50_000,
    n_repos: int = 100,
    seed: int = 42,
    n_shards: int = 8,
    mean_len: int = 900,
    max_content_len: int = 60_000,
    record_sha: bool = False,
) -> SynthManifest:
    """Write ``code_files/shard-*.parquet``, ``repos.parquet``,
    ``commits.parquet`` and ``manifest.json`` under *out_dir*.

    Rows are ordered by (repo, commit-ts, path): the drift detector consumes
    each repo partition in this file order, mirroring the reference's
    arrival-order ids (`src/algorithms/MCOD.java:312-316`).  A repo's rows
    never span shard files, so within-partition order survives
    ``read_parquet``.

    STREAMING writer: all RNG draws happen up front in a fixed order (so
    the corpus is a pure function of the arguments — byte-for-byte stable
    across this and the previous in-memory implementation, pinned by
    ``tests/test_synth.py``), but row CONTENT is materialized
    per-repo-chunk and flushed through per-shard ``ParquetWriter``s in
    16384-row groups.  Peak memory is O(shards × row_group + draws),
    not O(corpus): the old builder held every content string (~58 GB RSS
    at 32M rows); this one holds ~a few hundred MB regardless of
    GRAFT_CORPUS_MULT.
    """
    rng = np.random.default_rng(seed)
    man = SynthManifest(seed=seed, max_content_len=max_content_len)

    # ---------------- draw phase (exact order = corpus identity) ----------
    repos = np.array([f"repo-{i:04d}" for i in range(n_repos)])
    weights = 1.0 / np.arange(1, n_repos + 1) ** 1.1
    weights /= weights.sum()
    rows_per_repo = rng.multinomial(n_rows, weights)
    drift_mask = np.zeros(n_repos, dtype=bool)
    drift_idx = rng.choice(n_repos, size=max(2, n_repos // 20), replace=False)
    drift_mask[drift_idx] = True
    man.drift_repos = sorted(repos[drift_mask].tolist())
    repo_lang = rng.choice(len(LANGS), size=n_repos)

    # --- commits dim: 4-16 per repo
    commit_counts = rng.integers(4, 17, size=n_repos)
    all_commits, commit_repo, commit_ts = [], [], []
    base_ts = np.int64(1_600_000_000_000_000)  # fixed epoch, microseconds
    for ri in range(n_repos):
        for ci in range(commit_counts[ri]):
            h = hashlib.sha1(f"{seed}/{repos[ri]}/commit/{ci}".encode()).hexdigest()
            all_commits.append(h + h[:0].ljust(0))
            commit_repo.append(repos[ri])
            commit_ts.append(base_ts + np.int64(ci) * 86_400_000_000 + ri)
    all_commits = [c.ljust(40, "0")[:40] for c in all_commits]

    corpora = {lang: _make_corpus(rng, lang) for lang in LANGS}
    big = {lang: (c + "\n") * 40 for lang, c in corpora.items()}  # long slice base

    commit_by_repo: dict[str, list[str]] = {}
    for c, r in zip(all_commits, commit_repo):
        commit_by_repo.setdefault(r, []).append(c)

    # per-repo value draws, in the loop order the in-memory builder used
    draws: dict[int, tuple] = {}
    for ri in range(n_repos):
        nr = int(rows_per_repo[ri])
        if nr == 0:
            continue
        lens = rng.lognormal(mean=np.log(mean_len), sigma=0.6, size=nr)
        if drift_mask[ri]:
            cut = int(nr * 0.7)
            lens[cut:] *= 6.0
        lens = np.clip(lens.astype(np.int64), 24, max_content_len - 1)
        commit_pick = np.sort(rng.integers(0, len(commit_by_repo[repos[ri]]),
                                           size=nr))
        lang_pick = rng.random(nr)
        word_pick = rng.integers(0, len(_WORDS), size=nr)
        draws[ri] = (lens.tolist(), commit_pick, lang_pick, word_pick)

    n = int(rows_per_repo.sum())  # == n_rows; base rows before dups/orphans
    repo_start = np.concatenate([[0], np.cumsum(rows_per_repo)])

    # ------------- violation plan (indices drawn without overlap) ---------
    avail = rng.permutation(n)
    cursor = 0

    def take(kcount: int) -> np.ndarray:
        nonlocal cursor
        out = avail[cursor : cursor + kcount]
        cursor += kcount
        return out

    def base_row(g: int, ri: int) -> tuple[str, str, str, str, str]:
        """Materialize pristine row *g* (global index) of repo *ri*."""
        j = g - int(repo_start[ri])
        lens, commit_pick, lang_pick, word_pick = draws[ri]
        lang_main = LANGS[repo_lang[ri]]
        lp = lang_pick[j]
        lang = lang_main if lp < 0.8 else LANGS[int(lp * 1e6) % len(LANGS)]
        w1 = _WORDS[word_pick[j]]
        r = repos[ri]
        path = f"src/{w1}/{w1}_{j:05d}.{lang[:2]}"
        commit = commit_by_repo[r][commit_pick[j]]
        content = f"// {r}/{path}@{commit}\n" + big[lang][: lens[j]]
        return r, path, commit, lang, content

    def repo_of(g: int) -> int:
        return int(np.searchsorted(repo_start, g, side="right")) - 1

    mutation: dict[int, str] = {}

    def orph_commit(i: int) -> str:
        return hashlib.sha1(f"orphan/{seed}/{i}".encode()).hexdigest()[:40]

    def badfmt_commit(i: int) -> str:
        return hashlib.sha1(
            f"badfmt/{seed}/{i}".encode()).hexdigest()[:40].upper()

    for i in take(max(2, n // 500)):
        g = int(i); mutation[g] = "null_lang"
        r, path, commit, _, _ = base_row(g, repo_of(g))
        man.null_lang.append(row_ref(r, path, commit))
    for i in take(max(1, n // 1000)):
        g = int(i); mutation[g] = "null_path"
        r, _, commit, _, _ = base_row(g, repo_of(g))
        man.null_path.append(row_ref(r, None, commit))
    for i in take(max(1, n // 1500)):
        g = int(i); mutation[g] = "len_empty"
        r, path, commit, _, _ = base_row(g, repo_of(g))
        man.len_violations.append(row_ref(r, path, commit))
    for i in take(max(1, n // 1500)):
        g = int(i); mutation[g] = "len_over"
        r, path, commit, _, _ = base_row(g, repo_of(g))
        man.len_violations.append(row_ref(r, path, commit))
    for i in take(max(1, n // 1500)):
        g = int(i); mutation[g] = "orphan_commit"
        r, path, _, _, _ = base_row(g, repo_of(g))
        man.orphan_commit.append(row_ref(r, path, orph_commit(g)))

    # constraint-shape violations (checks/constraints.py): malformed commit
    # (uppercase hex — by construction also a true referential orphan, so
    # it is recorded in BOTH manifests), path traversal, unknown language
    for i in take(max(1, n // 1500)):
        g = int(i); mutation[g] = "bad_fmt"
        r, path, _, _, _ = base_row(g, repo_of(g))
        ref = row_ref(r, path, badfmt_commit(g))
        man.bad_commit_format.append(ref)
        man.orphan_commit.append(ref)
    for i in take(max(1, n // 1500)):
        g = int(i); mutation[g] = "bad_path"
        r, path, commit, _, _ = base_row(g, repo_of(g))
        man.bad_path_shape.append(row_ref(r, "../" + (path or "x.py"), commit))
    for i in take(max(1, n // 1500)):
        g = int(i); mutation[g] = "bad_lang"
        r, path, commit, _, _ = base_row(g, repo_of(g))
        man.bad_lang_value.append(row_ref(r, path, commit))

    # duplicates: append copies of existing rows (sources never overlap a
    # mutated index, so each copies a pristine row)
    dup_srcs = [int(i) for i in take(max(2, n // 800))]
    for g in dup_srcs:
        r, path, commit, _, _ = base_row(g, repo_of(g))
        man.dup_keys.append(row_ref(r, path, commit))

    def apply_mutation(g: int, row: tuple) -> tuple:
        kind = mutation.get(g)
        if kind is None:
            return row
        r, path, commit, lang, content = row
        if kind == "null_lang":
            lang = None
        elif kind == "null_path":
            path = None
        elif kind == "len_empty":
            content = ""
        elif kind == "len_over":
            content = content + "x" * max_content_len
        elif kind == "orphan_commit":
            commit = orph_commit(g)
        elif kind == "bad_fmt":
            commit = badfmt_commit(g)
        elif kind == "bad_path":
            path = "../" + (path or "x.py")
        elif kind == "bad_lang":
            lang = "klingon"
        return r, path, commit, lang, content

    # ---------------- streaming write phase --------------------------------
    SCHEMA = pa.schema([
        ("repo", pa.string()), ("path", pa.string()),
        ("commit", pa.string()), ("lang", pa.string()),
        ("content", pa.large_string()),
    ])
    ROW_GROUP = 16384
    os.makedirs(os.path.join(out_dir, "code_files"), exist_ok=True)

    class _ShardWriter:
        def __init__(self, path: str):
            self.writer = pq.ParquetWriter(path, SCHEMA)
            self.buf = [[], [], [], [], []]
            self.n_buf = 0
            self.n_total = 0

        def add_many(self, rows: list[tuple]):
            for row in rows:
                for col, v in zip(self.buf, row):
                    col.append(v)
            self.n_buf += len(rows)
            self.n_total += len(rows)
            while self.n_buf >= ROW_GROUP:
                self._flush(ROW_GROUP)

        def _flush(self, k: int):
            cols = [c[:k] for c in self.buf]
            self.buf = [c[k:] for c in self.buf]
            self.n_buf -= k
            self.writer.write_table(pa.table(
                {f.name: pa.array(c, f.type)
                 for f, c in zip(SCHEMA, cols)}))

        def close(self):
            if self.n_buf:
                self._flush(self.n_buf)
            self.writer.close()

    writers = [_ShardWriter(os.path.join(out_dir, "code_files",
                                         f"shard-{s:04d}.parquet"))
               for s in range(n_shards)]

    def shard_of_repo(r: str) -> int:
        return int(hashlib.md5(r.encode()).hexdigest()[:8], 16) % n_shards

    def emit(rows: list[tuple], shard: int):
        if record_sha:
            for r, path, commit, _, content in rows:
                man.sha256[row_ref(r, path, commit)] = hashlib.sha256(
                    content.encode()).hexdigest()
        writers[shard].add_many(rows)

    # base rows, repo by repo, materialized in bounded chunks
    for ri in range(n_repos):
        nr = int(rows_per_repo[ri])
        if nr == 0:
            continue
        shard = shard_of_repo(str(repos[ri]))
        g0 = int(repo_start[ri])
        for c0 in range(0, nr, ROW_GROUP):
            chunk = [apply_mutation(g0 + j, base_row(g0 + j, ri))
                     for j in range(c0, min(c0 + ROW_GROUP, nr))]
            emit(chunk, shard)

    # appended duplicate rows (pristine copies of their sources)
    for g in dup_srcs:
        ri = repo_of(g)
        emit([base_row(g, ri)], shard_of_repo(str(repos[ri])))

    # orphan repos: small repos absent from the dim
    n_written = n + len(dup_srcs)
    for oi in range(2):
        orepo = f"repo-orphan-{oi}"
        man.orphan_repo.append(orepo)
        shard = shard_of_repo(orepo)
        rows = []
        for j in range(5):
            rows.append((orepo, f"src/x/orphan_{j}.py",
                         commit_by_repo[repos[0]][0], "python",
                         f"// {orepo} {j}\n" + corpora["python"][:400]))
        emit(rows, shard)
        n_written += 5

    for w in writers:
        w.close()

    man.n_rows = n_written
    man.n_repos = n_repos
    man.null_lang.sort(); man.null_path.sort(); man.len_violations.sort()
    man.dup_keys.sort(); man.orphan_commit.sort()
    man.bad_commit_format.sort(); man.bad_path_shape.sort()
    man.bad_lang_value.sort()

    pq.write_table(
        pa.table(
            {
                "repo": pa.array(repos.tolist(), pa.string()),
                "default_lang": pa.array([LANGS[i] for i in repo_lang], pa.string()),
            }
        ),
        os.path.join(out_dir, "repos.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "commit": pa.array(all_commits, pa.string()),
                "repo": pa.array(commit_repo, pa.string()),
                "ts": pa.array(np.array(commit_ts, dtype="int64"), pa.timestamp("us")),
            }
        ),
        os.path.join(out_dir, "commits.parquet"),
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        f.write(man.to_json())
    return man


def load_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "manifest.json")) as f:
        return json.load(f)


def generate_stream_points(
    n: int, dims: int, seed: int = 7, outlier_frac: float = 0.02,
    n_clusters: int = 3, spread: float = 1.0, box: float = 40.0,
) -> np.ndarray:
    """Detector-conformance stream: Gaussian-mixture inliers + uniform
    background outliers, shaped like the reference's CSV datasets
    (`/root/reference/datasets/`, headerless doubles)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-box / 2, box / 2, size=(n_clusters, dims))
    which = rng.integers(0, n_clusters, size=n)
    pts = centers[which] + rng.normal(0.0, spread, size=(n, dims))
    is_out = rng.random(n) < outlier_frac
    pts[is_out] = rng.uniform(-box, box, size=(int(is_out.sum()), dims))
    return pts
