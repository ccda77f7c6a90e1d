"""Round-4 regression tests: ADVICE r3 findings + VERDICT r3 follow-ups."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# -------------------------- straddling chains under unsorted-but-contiguous


def test_straddling_chain_contiguous_but_unsorted_repos(tmp_path):
    """ADVICE r3 (medium): chain membership must rely on per-repo
    CONTIGUITY only, never on lexicographic sortedness of repos within a
    file.  With file order zzz -> midrepo -> aaa, the old range test
    (first_i <= x <= last_i) dropped the run's two boundary items; the
    adjacency-pair union must include every item of the straddling run."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.partitioning import (
        find_straddling_repos,
        plan_work_items,
    )

    rows_per = [("zzz", 400), ("midrepo", 2000), ("aaa", 400)]
    repos = [r for r, n in rows_per for _ in range(n)]
    n = len(repos)
    t = pa.table({
        "repo": pa.array(repos),
        "path": pa.array([f"f{i}.py" for i in range(n)]),
        "commit": pa.array([f"c{i:06d}" for i in range(n)]),
        "lang": pa.array(["py"] * n),
        "content": pa.array(["x" * 50] * n),
    })
    os.makedirs(tmp_path / "code_files", exist_ok=True)
    pq.write_table(t, str(tmp_path / "code_files" / "shard-0000.parquet"),
                   row_group_size=256)
    items = plan_work_items(
        sorted(glob.glob(str(tmp_path / "code_files" / "*.parquet"))),
        target_rows=600)
    assert len(items) >= 4
    chains = find_straddling_repos(items)
    assert set(chains) == {"midrepo"}

    # oracle: every item whose row span intersects midrepo's contiguous run
    lo, hi = 400, 2400
    expected, off = [], 0
    for it in items:
        if off < hi and off + it.n_rows > lo:
            expected.append(it.item_id)
        off += it.n_rows
    assert chains["midrepo"] == expected


# ------------------------------------- heavy hitters with user_id == -1


def test_heavy_hitters_count_negative_user_ids(ray_session, tmp_path):
    """ADVICE r3: user_id = -1 used to be an in-band sentinel; a dataset
    that really contains it must count it like any other key."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        heavy_hitter_users,
    )

    rng = np.random.default_rng(7)
    uid = rng.integers(0, 2000, size=20_000).astype(np.int64)
    uid[: 5_000] = -1  # -1 is the true heaviest key
    ts = np.arange(len(uid), dtype=np.int64)
    t = pa.table({
        "event_id": pa.array(np.arange(len(uid), dtype=np.int64)),
        "user_id": pa.array(uid),
        "event_type": pa.array(["click"] * len(uid)),
        "ts": pa.array(ts),
        "value": pa.array(np.ones(len(uid))),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"), row_group_size=2048)

    top = heavy_hitter_users(str(tmp_path), k=5, m=64)
    assert int(top["user_id"].iloc[0]) == -1
    assert int(top["n_events"].iloc[0]) == 5_000

    ser = pd.Series(uid).value_counts()
    want = (ser.rename_axis("user_id").reset_index(name="n")
            .sort_values(["n", "user_id"], ascending=[False, True]).head(5))
    assert list(top["user_id"]) == list(want["user_id"])
    assert list(top["n_events"]) == list(want["n"])


# -------------------------------- label_embedding_stats ragged-input guard


def test_label_embedding_stats_rejects_ragged_and_null(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        label_embedding_stats,
    )

    def write(emb_lists, sub):
        d = tmp_path / sub
        d.mkdir()
        t = pa.table({
            "id": pa.array(np.arange(len(emb_lists), dtype=np.int64)),
            "label": pa.array(np.zeros(len(emb_lists), dtype=np.int64)),
            "embedding": pa.array(emb_lists, pa.list_(pa.float32())),
        })
        pq.write_table(t, str(d / "embeddings.parquet"))
        return str(d)

    ragged = write([[1.0, 2.0], [1.0, 2.0, 3.0], [1.0]], "ragged")
    with pytest.raises(Exception, match="ragged"):
        label_embedding_stats(ragged)

    nulled = write([[1.0, 2.0], None, [3.0, 4.0]], "nulled")
    with pytest.raises(Exception, match="null"):
        label_embedding_stats(nulled)


# ---------------------------------------- fused media decode (one per row)


def test_fused_media_stage_decodes_each_payload_once():
    """VERDICT r3 #3: the media pipeline must pay decode ONCE per payload
    while producing both the intensity stats and the resize feature."""
    from approximate_anomaly_detection_in_data_streams_ray.stages.multimodal import (
        MediaDecode,
        MediaDecodeFeatures,
        MediaResize,
        synth_media_table,
    )

    t = synth_media_table(48, seed=5)
    fused = MediaDecodeFeatures()
    out = fused(t)
    assert fused.n_decodes == t.num_rows == out.num_rows

    # parity with the two standalone stages
    d = MediaDecode()(t)
    r = MediaResize()(t)
    assert out["mean_intensity"].to_pylist() == d["mean_intensity"].to_pylist()
    assert out["decoded_shape"].to_pylist() == d["decoded_shape"].to_pylist()
    assert out["feature"].to_pylist() == r["feature"].to_pylist()


def test_media_pipeline_views_share_one_decode_pass(ray_session, tmp_path):
    """Consuming BOTH returned views must not re-execute the decode chain:
    the fused output is materialized once and the views are projections.
    An upstream marker stage (touches a file per task) proves it — before
    the fusion, each consumed view lazily re-ran the whole chain."""
    import uuid

    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.multimodal import (
        media_pipeline,
        synth_media_table,
    )

    marker_dir = str(tmp_path / "marks")
    os.makedirs(marker_dir)

    def mark(b: pa.Table) -> pa.Table:
        open(os.path.join(marker_dir, uuid.uuid4().hex), "w").close()
        return b

    t = synth_media_table(64, seed=9)
    ds = ray.data.from_arrow([t.slice(i * 16, 16) for i in range(4)]
                             ).map_batches(mark, batch_format="pyarrow")
    decoded, feats = media_pipeline(ds, batch_size=16)
    n_marks_after_build = len(os.listdir(marker_dir))
    assert n_marks_after_build >= 1  # the fused pass executed at build time

    d = decoded.to_pandas().sort_values("media_id").reset_index(drop=True)
    f = feats.to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(d) == len(f) == 64
    assert list(d.columns) == ["media_id", "decoded_shape", "mean_intensity"]
    assert list(f.columns) == ["media_id", "feature"]
    # neither consumption re-ran the chain
    assert len(os.listdir(marker_dir)) == n_marks_after_build


def test_jpeg_dispatch_optional_pil():
    """VERDICT r3 #9: JPEG decodes through PIL when importable, raises a
    clear installation hint otherwise."""
    from approximate_anomaly_detection_in_data_streams_ray.stages.multimodal import (
        decode_payload,
    )

    try:
        import io

        from PIL import Image
    except ImportError:
        with pytest.raises(ValueError, match="PIL"):
            decode_payload(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
        return

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :, 0] = 200
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    out = decode_payload(buf.getvalue())
    assert out.shape == (8, 8, 3)
    assert abs(float(out[:, :, 0].mean()) - 200.0) < 10.0


# ------------------------- validation slice vs independent DuckDB verdicts


def test_validate_code_files_sql_matches_duckdb(ray_session):
    """VERDICT r3 #2: the flagship's uniqueness + referential verdicts,
    hash-comparable against a DuckDB recomputation from the RAW corpus
    (dup-group counts + anti-joins) — not a readback of engine output."""
    import duckdb

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        validate_code_files_sql,
    )

    v = validate_code_files_sql("/root/testdata/sf0.01")
    assert len(v) > 0
    assert set(v["check"]).issubset(
        {"uniqueness", "referential_repo", "referential_commit"})
    o = duckdb.connect().execute(ORACLE_SQL["validate_code_files_sql"]).df()
    o = o.sort_values(["check", "partition_key"]).reset_index(drop=True)
    v = v.sort_values(["check", "partition_key"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(v, o, check_dtype=True)


def test_drift_events_mcod_oracle_checks_all_substreams(ray_session):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        drift_events_mcod,
    )

    d = drift_events_mcod("/root/testdata/sf0.001")
    # every sub-stream is small at this sf: all must have been verified
    # against the brute-force oracle in-query
    assert (d["n_substreams_oracle_checked"] > 0).all()


def test_queries_cover_previously_uncovered_first():
    """The driver's correctness budget records the FIRST 50 dict entries;
    every slot must land on a name no prior round's CORRECTNESS record
    has seen (the per-round rotation invariant — round 4 fronted the
    rows-only six, round 5 fronts 50 never-recorded names)."""
    import glob
    import json
    import os

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        QUERIES,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recorded: set = set()
    # records that existed when the CURRENT rotation was made (r01-r04):
    # the round-5 driver record will legitimately contain today's front
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r0[1-4].json")):
        with open(path) as fh:
            recorded |= set(json.load(fh))
    front = list(QUERIES)[:50]
    already = [n for n in front if n in recorded]
    assert not already, f"budget slots wasted on recorded names: {already}"
    assert "validate_code_files_sql" in ORACLE_SQL


def test_video_container_roundtrip_all_frame_formats():
    """SYNV container: every frame decodes bit-exact through the seek
    index, for each supported frame encoding."""
    from approximate_anomaly_detection_in_data_streams_ray.stages.multimodal import (
        decode_video_frame,
        encode_video,
        video_fps,
        video_frame_count,
    )

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
              for _ in range(5)]
    for fmt in ("png", "ppm", "bmp", "syn1"):
        payload = encode_video(frames, fps=24, frame_format=fmt)
        assert video_frame_count(payload) == 5
        assert video_fps(payload) == 24
        for i, f in enumerate(frames):
            np.testing.assert_array_equal(decode_video_frame(payload, i), f)


def test_video_sampling_decodes_only_sampled_frames():
    """The scale contract: sampling k of N frames costs exactly k frame
    decodes (seekable index — no sequential decode of the skipped ones)."""
    from approximate_anomaly_detection_in_data_streams_ray.stages.multimodal import (
        VideoFrameSample,
        sample_video_frames,
        synth_video_table,
    )

    t = synth_video_table(32, seed=7)
    stage = VideoFrameSample(n_samples=3)
    out = stage(t)
    # one decode per OUTPUT row, never per input frame
    assert stage.n_frame_decodes == out.num_rows
    total_frames = sum(t["n_frames"].to_pylist())
    assert out.num_rows < total_frames
    # sampled means match a direct per-frame decode
    payload0 = t["payload"][0].as_py()
    direct = sample_video_frames(payload0, n_samples=3)
    got0 = out.filter(pa.compute.equal(out["media_id"], 0))
    assert got0["frame_idx"].to_pylist() == [i for i, _ in direct]
    for mean, (_, img) in zip(got0["mean_intensity"].to_pylist(), direct):
        assert mean == pytest.approx(float(img.mean()))


def test_video_pipeline_distributed(ray_session):
    """Actor-pool frame sampling over a Dataset: one row per sampled
    frame, every clip covered, stride-sampling variant included."""
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.multimodal import (
        synth_video_table,
        video_pipeline,
    )

    t = synth_video_table(64, seed=11)
    ds = ray.data.from_arrow([t.slice(i * 16, 16) for i in range(4)])
    out = video_pipeline(ds, n_samples=4).to_pandas()
    assert set(out["media_id"]) == set(range(64))
    per_clip = out.groupby("media_id").size()
    n_frames = dict(zip(t["media_id"].to_pylist(), t["n_frames"].to_pylist()))
    assert all(per_clip[m] == min(4, n_frames[m]) for m in per_clip.index)
    assert (out["feature"].map(len) == 64).all()

    every = video_pipeline(ds, every=2, n_samples=0).to_pandas()
    assert (every.groupby("media_id")["frame_idx"].apply(
        lambda s: (sorted(s) == list(range(0, max(s) + 1, 2)))).all())
