"""Round-5 additions: large-dimension referential fallback (bucketed
anti-semi join) must match the broadcast route row-for-row, and the
threshold in ``ValidationConfig`` must route between them."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _planted_features(n: int = 5000, seed: int = 7):
    """Features-shaped frame (repo, commit, row_ref) with known orphans:
    orphan repos, orphan commits, and one NULL in each key column."""
    rng = np.random.default_rng(seed)
    repos = [f"org/repo{i}" for i in range(40)]
    commits = [f"c{i:08x}" for i in range(300)]
    repo = rng.choice(repos, n).astype(object)
    commit = rng.choice(commits, n).astype(object)
    row_ref = np.array([f"r{i}" for i in range(n)], dtype=object)
    # plant orphans: repos / commits absent from the dimension tables
    repo[10] = "org/orphan-a"
    repo[11] = "org/orphan-b"
    commit[20] = "deadbeef"
    commit[21] = "cafef00d"
    repo[30] = None
    commit[31] = None
    feats = pd.DataFrame({"repo": repo, "commit": commit, "row_ref": row_ref})
    dims = {"repos": pd.DataFrame({"repo": repos}),
            "commits": pd.DataFrame({"commit": commits})}
    expected_bad_refs = {"r10", "r11", "r30"}, {"r20", "r21", "r31"}
    return feats, dims, expected_bad_refs


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def ref_corpus(tmp_path_factory):
    base = tmp_path_factory.mktemp("ref5")
    feats, dims, expected = _planted_features()
    fpath = str(base / "features.parquet")
    pq.write_table(pa.Table.from_pandas(feats, preserve_index=False), fpath)
    rpath, cpath = str(base / "repos.parquet"), str(base / "commits.parquet")
    pq.write_table(pa.Table.from_pandas(dims["repos"], preserve_index=False), rpath)
    pq.write_table(pa.Table.from_pandas(dims["commits"], preserve_index=False), cpath)
    return fpath, rpath, cpath, expected


def _broadcast_route(fpath, rpath, cpath):
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.checks.referential import (
        make_ref_lookup,
    )

    feats = ray.data.read_parquet(fpath, columns=["repo", "commit", "row_ref"])
    repos = pq.read_table(rpath, columns=["repo"])
    commits = pq.read_table(cpath, columns=["commit"])
    dims_ref = ray.put((repos["repo"].to_pylist(), commits["commit"].to_pylist()))
    return feats.map_batches(make_ref_lookup(dims_ref),
                             batch_format="pyarrow").to_pandas()


def _bucketed_route(fpath, rpath, cpath, tmpdir):
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.checks.referential import (
        referential_violations_bucketed,
    )

    feats = ray.data.read_parquet(fpath, columns=["repo", "commit", "row_ref"])
    return referential_violations_bucketed(
        feats, rpath, cpath, buckets=8, scratch_dir=tmpdir).to_pandas()


def test_bucketed_referential_matches_broadcast(ray_session, ref_corpus, tmp_path):
    fpath, rpath, cpath, (bad_repo_refs, bad_commit_refs) = ref_corpus
    bc = _broadcast_route(fpath, rpath, cpath)
    bk = _bucketed_route(fpath, rpath, cpath, str(tmp_path))
    # both routes find exactly the planted orphans (incl. the null keys)…
    assert set(bc[bc["check"] == "referential_repo"]["row_ref"]) == bad_repo_refs
    assert set(bc[bc["check"] == "referential_commit"]["row_ref"]) == bad_commit_refs
    # …and are row-for-row identical
    pd.testing.assert_frame_equal(_canon(bc), _canon(bk))


def test_referential_threshold_routes_to_bucketed(ray_session, ref_corpus, tmp_path):
    """run_referential_check with the threshold forced low must produce
    the same verdicts + violations as the default broadcast route."""
    from approximate_anomaly_detection_in_data_streams_ray.checks.base import (
        ValidationConfig,
    )
    from approximate_anomaly_detection_in_data_streams_ray.checks.referential import (
        run_referential_check,
    )

    fpath, rpath, cpath, _ = ref_corpus
    outs = []
    for max_keys in (4_000_000, 0):  # broadcast route, then bucketed route
        cfg = ValidationConfig(referential_broadcast_max_keys=max_keys,
                               uniqueness_buckets=8)
        ctx = {"features_path": fpath, "repos_path": rpath,
               "commits_path": cpath, "out_dir": str(tmp_path / f"o{max_keys}"),
               "scratch_dir": str(tmp_path / f"s{max_keys}")}
        violations, verdict_rows = run_referential_check(None, cfg, ctx)
        vdf = violations.to_pandas() if hasattr(violations, "to_pandas") else violations
        outs.append((vdf, pd.DataFrame(verdict_rows)))
    pd.testing.assert_frame_equal(_canon(outs[0][0]), _canon(outs[1][0]))
    pd.testing.assert_frame_equal(_canon(outs[0][1]), _canon(outs[1][1]))


def test_drift_events_approx_recall_contract(ray_session):
    """Seeded ApproxMCOD on the exact twin's sub-streams; the query's own
    contract raises below 0.7 recall, so a clean run + column check is
    the assertion (reference methodology: AccuracyComparator.java:20-37)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        drift_events_approx,
    )

    out = drift_events_approx("/root/testdata/sf0.001")
    assert {"event_type", "n_events", "n_exact_outliers",
            "n_approx_outliers", "n_common_outliers",
            "recall"} <= set(out.columns)
    assert len(out) > 0
    has_exact = out["n_exact_outliers"] > 0
    assert (out.loc[has_exact, "recall"] >= 0.7).all()


def test_dedup_resume_skips_done_items_zero_loss(ray_session, tmp_path):
    """Kill-and-resume for the dedup family: a resumed run must skip
    completed work items, recompute only unmarked ones, and produce a
    byte-identical verified-pairs + clusters result (0 row loss)."""
    import pyarrow.dataset as pads

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.dedup_resume import (
        run_near_dup_dedup,
    )

    doc = "/root/testdata/sf0.001/documents.parquet"
    cold_dir, kill_dir = str(tmp_path / "cold"), str(tmp_path / "kill")
    cold = run_near_dup_dedup(doc, cold_dir, n_items=8)
    assert cold["n_items_skipped_resume"] == 0 and not cold["sigs_skipped_resume"]
    assert cold["n_pairs"] > 0  # sf0.001 documents contain near-dups

    # build the "killed" state: full run, then erase 3 item markers +
    # their outputs and the final clusters (as if SIGKILLed mid-stage-2)
    run_near_dup_dedup(doc, kill_dir, n_items=8)
    import os
    import shutil

    for p in (1, 4, 6):
        os.remove(os.path.join(kill_dir, "_manifest", f"pairs__{p}.json"))
        shutil.rmtree(os.path.join(kill_dir, "pairs", f"item={p}"))
    os.remove(os.path.join(kill_dir, "_manifest", "final.json"))
    shutil.rmtree(os.path.join(kill_dir, "clusters"))

    resumed = run_near_dup_dedup(doc, kill_dir, n_items=8)
    assert resumed["sigs_skipped_resume"]          # stage 1 not redone
    assert resumed["n_items_skipped_resume"] == 5  # only 3 items redone

    def read_sorted(d, sub, cols):
        files = sorted(
            str(f) for f in __import__("glob").glob(
                os.path.join(d, sub), recursive=True))
        return (pads.dataset(files).to_table(columns=cols).to_pandas()
                .sort_values(cols).reset_index(drop=True))

    cold_pairs = read_sorted(cold_dir, "pairs/item=*/part.parquet",
                             ["id_a", "id_b", "n_inter", "n_union"])
    res_pairs = read_sorted(kill_dir, "pairs/item=*/part.parquet",
                            ["id_a", "id_b", "n_inter", "n_union"])
    pd.testing.assert_frame_equal(cold_pairs, res_pairs)
    cold_cl = read_sorted(cold_dir, "clusters/clusters.parquet",
                          ["doc_id", "cluster"])
    res_cl = read_sorted(kill_dir, "clusters/clusters.parquet",
                         ["doc_id", "cluster"])
    pd.testing.assert_frame_equal(cold_cl, res_cl)


def test_dedup_resume_rebuilds_unmarked_sigs(ray_session, tmp_path):
    """Stage 1 killed mid-write (partial partition dirs, NO marker) must
    be wiped and rebuilt — file existence never gates correctness."""
    import os

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.dedup_resume import (
        run_near_dup_dedup,
    )

    doc = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "o")
    first = run_near_dup_dedup(doc, out, n_items=4)
    # simulate kill during stage 1: marker gone, stale partial files remain
    os.remove(os.path.join(out, "_manifest", "sigs.json"))
    for p in range(4):
        os.remove(os.path.join(out, "_manifest", f"pairs__{p}.json"))
    second = run_near_dup_dedup(doc, out, n_items=4)
    assert not second["sigs_skipped_resume"]
    assert second["n_pairs"] == first["n_pairs"]


def test_brand_basket_triples_planted(ray_session, tmp_path):
    """Plant a corpus where exactly one brand triple dominates."""
    import pyarrow.parquet as pq

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        brand_basket_triples,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    # parts: brand Bk owns part k
    part = pa.table({"p_partkey": pa.array(range(1, 7), pa.int64()),
                     "p_brand": pa.array([f"B{k}" for k in range(1, 7)])})
    pq.write_table(part, str(sf / "part.parquet"))
    # orders 1..4 contain {1,2,3}; order 5 contains {4,5,6}; order 6 a pair
    rows = []
    for ok in (1, 2, 3, 4):
        rows += [(ok, pk) for pk in (1, 2, 3)]
    rows += [(5, 4), (5, 5), (5, 6), (6, 1), (6, 2)]
    li = pa.table({"l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                   "l_partkey": pa.array([r[1] for r in rows], pa.int64())})
    pq.write_table(li, str(sf / "lineitem.parquet"))
    out = brand_basket_triples(str(sf))
    assert tuple(out.iloc[0][["b1", "b2", "b3"]]) == ("B1", "B2", "B3")
    assert int(out.iloc[0]["n_orders"]) == 4
    assert int(out[out["b1"] == "B4"]["n_orders"].iloc[0]) == 1
    assert len(out) == 2  # the pair-only order contributes no triple


def test_audience_overlap_matrix_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        audience_overlap_matrix,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    # users 1-3 do 'a'; users 2-4 do 'b' → overlap {2,3}, union {1..4}
    rows = [("a", u) for u in (1, 2, 3)] + [("b", u) for u in (2, 3, 4)]
    rows += [("a", 1), ("b", 4)]  # duplicates must not inflate counts
    t = pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
    })
    pq.write_table(t, str(sf / "events.parquet"))
    out = audience_overlap_matrix(str(sf))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert (r["n_a"], r["n_b"], r["n_common"]) == (3, 3, 2)
    assert r["jaccard_micro"] == 2 * 1_000_000 // 4


def test_customer_priority_transitions_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        customer_priority_transitions,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    # customer 1: P1 -> P2 -> P2 ; customer 2: P3 -> P1
    rows = [(1, "2024-01-01", 10, "P1"), (1, "2024-01-02", 11, "P2"),
            (1, "2024-01-03", 12, "P2"), (2, "2024-01-01", 13, "P3"),
            (2, "2024-01-05", 14, "P1")]
    t = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp(r[1]) for r in rows]),
        "o_orderkey": pa.array([r[2] for r in rows], pa.int64()),
        "o_orderpriority": pa.array([r[3] for r in rows]),
    })
    pq.write_table(t, str(sf / "orders.parquet"))
    out = customer_priority_transitions(str(sf))
    got = {(r["from_priority"], r["to_priority"]): r["n"]
           for _, r in out.iterrows()}
    assert got == {("P1", "P2"): 1, ("P2", "P2"): 1, ("P3", "P1"): 1}
