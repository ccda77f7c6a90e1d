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
    """
    rng = np.random.default_rng(seed)
    man = SynthManifest(seed=seed, max_content_len=max_content_len)

    # --- repos, Zipf-skewed row counts; ~5% marked as drift repos
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

    # --- per-row columns
    repo_col, path_col, commit_col, lang_col, content_col = [], [], [], [], []
    commit_by_repo: dict[str, list[str]] = {}
    for c, r in zip(all_commits, commit_repo):
        commit_by_repo.setdefault(r, []).append(c)

    for ri in range(n_repos):
        r = repos[ri]
        nr = int(rows_per_repo[ri])
        if nr == 0:
            continue
        commits_r = commit_by_repo[r]
        lang_main = LANGS[repo_lang[ri]]
        # lengths: log-normal; drift repos shift the tail of the partition x6
        lens = rng.lognormal(mean=np.log(mean_len), sigma=0.6, size=nr)
        if drift_mask[ri]:
            cut = int(nr * 0.7)
            lens[cut:] *= 6.0
        lens = np.clip(lens.astype(np.int64), 24, max_content_len - 1)
        commit_pick = np.sort(rng.integers(0, len(commits_r), size=nr))
        lang_pick = rng.random(nr)
        word_pick = rng.integers(0, len(_WORDS), size=nr)  # drawn in bulk
        lens_list = lens.tolist()
        for j in range(nr):
            lang = lang_main if lang_pick[j] < 0.8 else LANGS[int(lang_pick[j] * 1e6) % len(LANGS)]
            w1 = _WORDS[word_pick[j]]
            path = f"src/{w1}/{w1}_{j:05d}.{lang[:2]}"
            commit = commits_r[commit_pick[j]]
            content = f"// {r}/{path}@{commit}\n" + big[lang][: lens_list[j]]
            repo_col.append(r); path_col.append(path); commit_col.append(commit)
            lang_col.append(lang); content_col.append(content)

    n = len(repo_col)

    def ref(i: int) -> str:
        return row_ref(repo_col[i], path_col[i], commit_col[i])

    # --- injected violations (indices drawn without overlap)
    avail = rng.permutation(n)
    cursor = 0

    def take(kcount: int) -> np.ndarray:
        nonlocal cursor
        out = avail[cursor : cursor + kcount]
        cursor += kcount
        return out

    for i in take(max(2, n // 500)):
        lang_col[i] = None
        man.null_lang.append(ref(i))
    for i in take(max(1, n // 1000)):
        path_col[i] = None
        man.null_path.append(row_ref(repo_col[i], None, commit_col[i]))
    for i in take(max(1, n // 1500)):
        content_col[i] = content_col[i][:0]  # empty → below min length
        man.len_violations.append(ref(i))
    for i in take(max(1, n // 1500)):
        content_col[i] = content_col[i] + "x" * max_content_len  # above max
        man.len_violations.append(ref(i))
    for i in take(max(1, n // 1500)):
        commit_col[i] = hashlib.sha1(f"orphan/{seed}/{i}".encode()).hexdigest()[:40]
        man.orphan_commit.append(ref(i))

    # constraint-shape violations (checks/constraints.py): malformed commit
    # (uppercase hex — by construction also a true referential orphan, so
    # it is recorded in BOTH manifests), path traversal, unknown language
    for i in take(max(1, n // 1500)):
        commit_col[i] = hashlib.sha1(
            f"badfmt/{seed}/{i}".encode()).hexdigest()[:40].upper()
        man.bad_commit_format.append(ref(i))
        man.orphan_commit.append(ref(i))
    for i in take(max(1, n // 1500)):
        path_col[i] = "../" + (path_col[i] or "x.py")
        man.bad_path_shape.append(ref(i))
    for i in take(max(1, n // 1500)):
        lang_col[i] = "klingon"
        man.bad_lang_value.append(ref(i))

    # duplicates: append copies of existing rows
    for i in take(max(2, n // 800)):
        repo_col.append(repo_col[i]); path_col.append(path_col[i])
        commit_col.append(commit_col[i]); lang_col.append(lang_col[i])
        content_col.append(content_col[i])
        man.dup_keys.append(ref(i))

    # orphan repos: small repos absent from the dim
    for oi in range(2):
        orepo = f"repo-orphan-{oi}"
        man.orphan_repo.append(orepo)
        for j in range(5):
            repo_col.append(orepo)
            path_col.append(f"src/x/orphan_{j}.py")
            commit_col.append(commit_by_repo[repos[0]][0])
            lang_col.append("python")
            content_col.append(f"// {orepo} {j}\n" + corpora["python"][:400])

    man.n_rows = len(repo_col)
    man.n_repos = n_repos
    man.null_lang.sort(); man.null_path.sort(); man.len_violations.sort()
    man.dup_keys.sort(); man.orphan_commit.sort()
    man.bad_commit_format.sort(); man.bad_path_shape.sort()
    man.bad_lang_value.sort()

    if record_sha:
        for i in range(man.n_rows):
            man.sha256[row_ref(repo_col[i], path_col[i], commit_col[i])] = (
                hashlib.sha256(content_col[i].encode()).hexdigest()
            )

    table = pa.table(
        {
            "repo": pa.array(repo_col, pa.string()),
            "path": pa.array(path_col, pa.string()),
            "commit": pa.array(commit_col, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
            "content": pa.array(content_col, pa.large_string()),
        }
    )

    # --- write: repo-hash sharding, each repo wholly inside one shard
    os.makedirs(os.path.join(out_dir, "code_files"), exist_ok=True)
    repo_arr = np.asarray(repo_col)
    shard_of = np.array(
        [int(hashlib.md5(r.encode()).hexdigest()[:8], 16) % n_shards for r in repo_arr]
    )
    for s in range(n_shards):
        idx = np.nonzero(shard_of == s)[0]
        sub = table.take(pa.array(idx))
        # small row groups so work-item planning can split hot shards at
        # row-group boundaries (pipelines/partitioning.py)
        pq.write_table(sub, os.path.join(out_dir, "code_files", f"shard-{s:04d}.parquet"),
                       row_group_size=16384)

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
