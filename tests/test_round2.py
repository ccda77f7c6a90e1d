"""Round-2 additions: pluggable detector metrics, batched text kernels,
distributed SimHash, incremental appended-shard validation, IVF recall."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from approximate_anomaly_detection_in_data_streams_ray.state.detectors import (
    MCOD,
    METRICS,
    run_detector,
)
from approximate_anomaly_detection_in_data_streams_ray.state.oracle import (
    brute_force_detect,
)
from approximate_anomaly_detection_in_data_streams_ray.synth import (
    generate_code_files,
    generate_stream_points,
)


# ------------------------------------------------------- pluggable distance


@pytest.mark.parametrize("metric", ["manhattan", "cosine"])
def test_mcod_matches_oracle_under_nondefault_metric(metric):
    pts = generate_stream_points(1200, 3, seed=13)
    if metric == "cosine":
        R, k = 0.15, 8  # cosine distances live in [0, 2]
    else:
        R, k = 4.0, 10
    got, res = run_detector(MCOD(300, 100, R, k, 3, metric=metric), pts)
    want, _ = brute_force_detect(pts, 300, 100, R, k, metric=metric)
    assert got == want
    assert res["nOnlyOutlier"] == len(got)


def test_metric_kernels_match_scipy_definitions():
    rng = np.random.default_rng(0)
    M, v = rng.standard_normal((50, 4)), rng.standard_normal(4)
    np.testing.assert_allclose(
        METRICS["euclidean"](M, v), np.linalg.norm(M - v, axis=1))
    np.testing.assert_allclose(
        METRICS["manhattan"](M, v), np.abs(M - v).sum(axis=1))
    cos = 1 - (M @ v) / (np.linalg.norm(M, axis=1) * np.linalg.norm(v))
    np.testing.assert_allclose(METRICS["cosine"](M, v), cos)


def test_unknown_metric_raises():
    with pytest.raises(ValueError):
        MCOD(100, 50, 1.0, 5, 2, metric="chebyshev")


# --------------------------------------------------- batched kernel parity


def test_batched_simhash_and_fingerprints_match_scalar():
    from approximate_anomaly_detection_in_data_streams_ray.functions.sketches import (
        simhash64,
        simhash64_batch,
    )
    from approximate_anomaly_detection_in_data_streams_ray.functions.text import (
        doc_fingerprint,
        doc_fingerprints,
        token_hashes,
    )

    texts = ["hello world code", "", "x", "a b " * 500, "únîco∂e ✓", None]
    fp_scalar = [np.int64(np.uint64(doc_fingerprint(t or ""))) for t in texts]
    assert doc_fingerprints(texts).tolist() == fp_scalar
    sh_scalar = [simhash64(token_hashes(t or "")) for t in texts]
    assert simhash64_batch(texts).tolist() == sh_scalar


# ----------------------------------------------------- distributed SimHash


def test_simhash_dedup_finds_planted_near_dups(ray_session):
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.dedup import (
        simhash_near_dup_pairs,
    )

    unit = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep dark forest where nobody ever goes at all ")
    base = unit * 4
    # near-dup = ONE word changed in ONE of the four repetitions (a
    # 1-of-~116-token perturbation; replacing all four occurrences puts the
    # expected SimHash distance right AT the t=6 bucket threshold, where
    # the pass/fail flips with the token-hash function)
    texts = [base, unit * 3 + unit.replace("forest", "jungle"),
             "completely unrelated text about maritime navigation " * 12,
             "yet another unrelated piece of writing entirely " * 12]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pairs = simhash_near_dup_pairs(ray.data.from_arrow(t), max_hamming=6)
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got
    assert all(2 not in p and 3 not in p for p in got)


# ---------------------------------------------------------- IVF recall bar


def test_ivf_recall_at_10_is_high(ray_session):
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.ann import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.default_rng(21)
    M = rng.standard_normal((2000, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(2000), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in M], pa.list_(pa.float32()))})
    q = rng.standard_normal((1, 16))
    exact = set(brute_force_topk(ray.data.from_arrow(t), q, k=10)["vec_id"])
    approx = set(ivf_topk(ray.data.from_arrow(t), q, k=10, nlist=8, nprobe=6)["vec_id"])
    assert len(exact & approx) / 10 >= 0.9


# -------------------------------------------- incremental appended shards


def test_appended_shard_extracts_only_new_item(ray_session, tmp_path_factory):
    """Append a shard to a validated source; re-running the same out_dir
    extracts ONLY the new item and the merged verdicts pick up its rows."""
    import shutil

    import pyarrow.parquet as pq

    from approximate_anomaly_detection_in_data_streams_ray.checks.base import (
        ValidationConfig,
    )
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.runner import (
        run_validation,
    )

    base = tmp_path_factory.mktemp("append")
    src, out = str(base / "src"), str(base / "out")
    generate_code_files(src, n_rows=4000, n_repos=6, seed=3, n_shards=2)
    cfg = ValidationConfig(target_rows_per_item=4000, extract_concurrency=2,
                           drift_concurrency=2)
    first = run_validation(src, out, cfg, checks=["stats"])
    v0 = pq.read_table(os.path.join(out, "verdicts", "verdicts.parquet")).to_pandas()
    n_first = int(v0[v0["check"] == "stats"]["n_rows"].sum())

    shards = sorted(glob.glob(os.path.join(src, "code_files", "shard-*.parquet")))
    new_shard = os.path.join(src, "code_files", "shard-append.parquet")
    shutil.copy(shards[0], new_shard)
    n_new = pq.read_metadata(new_shard).num_rows

    second = run_validation(src, out, cfg, checks=["stats"])
    assert second["n_items"] == first["n_items"] + 1
    assert second["n_items_skipped_resume"] == first["n_items"]
    assert second["n_rows_extracted"] == n_new

    # merged verdict rows now include the appended shard's rows
    v1 = pq.read_table(os.path.join(out, "verdicts", "verdicts.parquet")).to_pandas()
    stats1 = v1[v1["check"] == "stats"]
    assert int(stats1["n_rows"].sum()) == n_first + n_new


def test_stats_verdict_counts_length_violations(ray_session, tmp_path_factory):
    """n_violations in the stats verdict equals the violations-table row
    count per repo (null + length violations, ADVICE round 1)."""
    import pyarrow.dataset as pads

    from approximate_anomaly_detection_in_data_streams_ray.checks.base import (
        ValidationConfig,
    )
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.runner import (
        run_validation,
    )
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("lenviol")
    src, out = str(base / "src"), str(base / "out")
    generate_code_files(src, n_rows=4000, n_repos=6, seed=5, n_shards=2)
    cfg = ValidationConfig(target_rows_per_item=2000, extract_concurrency=2)
    run_validation(src, out, cfg, checks=["stats"])

    vio = pads.dataset(
        glob.glob(os.path.join(out, "violations", "stats", "item=*", "part.parquet"))
    ).to_table().to_pandas()
    per_repo_vio = vio.groupby("partition_key").size()
    v = pq.read_table(os.path.join(out, "verdicts", "verdicts.parquet")).to_pandas()
    stats_v = v[v["check"] == "stats"].set_index("partition_key")
    assert per_repo_vio.sum() > 0  # generator injects violations
    for repo, n in per_repo_vio.items():
        assert int(stats_v.loc[repo, "n_violations"]) == int(n), repo


def test_violations_compaction_matches_item_files(ray_session, tmp_path_factory):
    """violations_compacted/<check>.parquet holds exactly the union of the
    per-item violation files (which remain, as the resume units)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from approximate_anomaly_detection_in_data_streams_ray.checks.base import (
        ValidationConfig,
    )
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.runner import (
        run_validation,
    )

    base = tmp_path_factory.mktemp("compact")
    src, out = str(base / "src"), str(base / "out")
    generate_code_files(src, n_rows=4000, n_repos=6, seed=9, n_shards=2)
    cfg = ValidationConfig(target_rows_per_item=2000, extract_concurrency=2)
    run_validation(src, out, cfg, checks=["stats"])

    items = pads.dataset(
        glob.glob(os.path.join(out, "violations", "stats", "**", "*.parquet"),
                  recursive=True)
    ).to_table()
    compacted = pq.read_table(os.path.join(out, "violations_compacted", "stats.parquet"))
    assert compacted.num_rows == items.num_rows > 0
    assert sorted(compacted["row_ref"].to_pylist()) == sorted(items["row_ref"].to_pylist())


def test_real_media_decoders_roundtrip():
    """PPM and BMP decode are real format decoders: roundtrip equality,
    comment handling, row padding, top-down BMP."""
    from approximate_anomaly_detection_in_data_streams_ray.stages.multimodal import (
        decode_bmp,
        decode_payload,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(3)
    for w, h in [(5, 7), (8, 8), (13, 3), (1, 1)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        assert (decode_bmp(encode_bmp(img)) == img).all()
        assert (decode_payload(encode_ppm(img)) == img).all()
        assert (decode_payload(encode_bmp(img)) == img).all()
    # PPM with comments in the header
    img = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    ppm = b"P6\n# a comment\n3 2\n# another\n255\n" + img.tobytes()
    assert (decode_ppm(ppm) == img).all()
    # top-down BMP (negative height)
    bmp = bytearray(encode_bmp(img))
    import struct

    h_neg = struct.pack("<i", -2)
    bmp[22:26] = h_neg
    # rows must be re-ordered to top-down for the flag to mean the same image
    stride = (3 * 3 + 3) & ~3
    rows = np.zeros((2, stride), dtype=np.uint8)
    rows[:, : 3 * 3] = img[:, :, ::-1].reshape(2, 9)
    assert (decode_bmp(bytes(bmp[:54]) + rows.tobytes()) == img).all()
    with pytest.raises(ValueError):
        decode_payload(b"\x89PNG\r\n")


def test_media_pipeline_mixed_formats(ray_session):
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.multimodal import (
        media_pipeline,
        synth_media_table,
    )

    t = synth_media_table(48, seed=5)
    kinds = set(t["kind"].to_pylist())
    assert kinds == {"syn1", "ppm", "bmp", "png"}
    decoded, feats = media_pipeline(ray.data.from_arrow([t.slice(i * 8, 8) for i in range(6)]))
    d = decoded.to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(d) == 48
    # decoded shape matches the metadata regardless of the encoding format
    for shape, w, h in zip(d["decoded_shape"], t["width"].to_pylist(),
                           t["height"].to_pylist()):
        assert list(shape) == [h, w, 3]


def test_distributed_ngram_verify_matches_driver_path(ray_session, tmp_path):
    """The scale-path verify (pairs joined with both sides' shingles via
    bucketed hash joins) returns the same verified pairs as the
    collect-to-driver path."""
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_verify,
        ngram_jaccard_verify_distributed,
    )

    base = ("a quick brown fox jumps over the lazy dog and then runs away "
            "into the woods where nothing else ever happens at all ") * 5
    texts = [base, base.replace("dog", "cat"), "unrelated text " * 30,
             base + " tail", "different content entirely " * 20, base]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)
    cand = minhash_near_dup_pairs(ds, threshold=0.4)
    assert len(cand) > 0
    want = ngram_jaccard_verify(ds, cand, threshold=0.6)
    got = ngram_jaccard_verify_distributed(ds, cand, threshold=0.6,
                                           scratch_dir=str(tmp_path))
    w = want.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    g = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert list(map(tuple, g[["id_a", "id_b"]].to_numpy())) == \
        list(map(tuple, w[["id_a", "id_b"]].to_numpy()))
    np.testing.assert_allclose(g["jaccard"].to_numpy(), w["jaccard"].to_numpy())


def test_query_cli_runs_named_pipeline(ray_session):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "approximate_anomaly_detection_in_data_streams_ray",
         "query", "doc_stats", "--sfDir", "/root/testdata/sf0.001"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-500:]
    assert "n_docs" in r.stdout
    r2 = subprocess.run(
        [sys.executable, "-m", "approximate_anomaly_detection_in_data_streams_ray",
         "query", "list"], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert "minhash_dedup_documents" in r2.stdout


def test_chunk_vectors_constant_feature_dim():
    """Sub-chunk streams are scored in the same d+1 feature space as full
    chunks (round-1 ADVICE)."""
    from approximate_anomaly_detection_in_data_streams_ray.checks.drift import (
        chunk_vectors,
    )

    rng = np.random.default_rng(0)
    full, _ = chunk_vectors(rng.normal(size=(100, 3)), 16)
    short, starts = chunk_vectors(rng.normal(size=(5, 3)), 16)
    assert full.shape[1] == short.shape[1] == 4  # d means + std of feature 0
    assert starts.tolist() == [0]


def test_apply_near_dedup_keeps_cluster_minima(ray_session):
    """Union-find apply: transitively-linked near-dups collapse to the
    min-id survivor; untouched docs pass through."""
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.dedup import (
        apply_near_dedup,
        connected_min_ids,
    )

    pairs = __import__("pandas").DataFrame(
        {"id_a": [1, 2, 7], "id_b": [2, 5, 9]})  # clusters {1,2,5}, {7,9}
    canon = connected_min_ids(pairs)
    assert canon[5] == 1 and canon[2] == 1 and canon[9] == 7 and canon[1] == 1
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3, 5, 7, 9], pa.int64()),
                  "text": pa.array(list("abcdefg"), pa.string())})
    kept = apply_near_dedup(ray.data.from_arrow(t), pairs).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 3, 7]


def test_hll_query_within_epsilon_of_exact(ray_session):
    """hll_users_per_event_type (rows-only in CORRECTNESS) is within HLL
    error bounds of DuckDB's exact count(DISTINCT)."""
    import duckdb

    import __ray_entry__ as e

    SF = "/root/testdata/sf0.01"
    got = e.queries()["hll_users_per_event_type"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).set_index("event_type")
    con = duckdb.connect()
    want = con.execute(
        f"SELECT event_type, count(DISTINCT user_id) AS n FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY event_type"
    ).df().set_index("event_type")
    for et in want.index:
        exact = int(want.loc[et, "n"])
        approx = float(got.loc[et, "approx_users"])
        assert abs(approx - exact) / max(1, exact) < 0.05, (et, approx, exact)


def test_value_quantiles_within_one_percent(ray_session):
    """value_quantiles' mergeable stride-sample sketch is within 1% (of the
    value range) of DuckDB's exact quantile_cont per event_type."""
    import duckdb

    import __ray_entry__ as e

    SF = "/root/testdata/sf0.01"
    got = e.queries()["value_quantiles"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).set_index("event_type")
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT event_type,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90,
                   max(value) - min(value) AS rng
            FROM read_parquet('{SF}/events.parquet')
            WHERE value IS NOT NULL GROUP BY event_type"""
    ).df().set_index("event_type")
    for et in want.index:
        rng = float(want.loc[et, "rng"])
        for q in ("p50", "p90"):
            err = abs(float(got.loc[et, q]) - float(want.loc[et, q]))
            assert err / max(rng, 1e-9) < 0.01, (et, q, err, rng)


def test_read_table_auto_three_formats(ray_session, tmp_path):
    """The auto reader returns identical rows for parquet, csv and jsonl."""
    import json as jsonlib

    import pyarrow.parquet as pq

    from approximate_anomaly_detection_in_data_streams_ray.sources.readers import (
        read_table_auto,
    )

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "b": pa.array(["x", "y", "z"], pa.string())})
    pq.write_table(t, str(tmp_path / "t.parquet"))
    (tmp_path / "t.csv").write_text("a,b\n1,x\n2,y\n3,z\n")
    with open(tmp_path / "t.jsonl", "w") as f:
        for r in t.to_pylist():
            f.write(jsonlib.dumps(r) + "\n")
    frames = []
    for name in ("t.parquet", "t.csv", "t.jsonl"):
        df = read_table_auto(str(tmp_path / name), columns=["a", "b"]).to_pandas()
        frames.append(df.sort_values("a").reset_index(drop=True))
    assert frames[0].equals(frames[1]) and frames[1].equals(frames[2])
    with pytest.raises(ValueError):
        read_table_auto(str(tmp_path / "t.xml"))
