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
