"""Ground-truth tests for the round-4 query batch's novel internals.

The DuckDB parity test (tests/test_queries.py) already proves row equality
on the driver testdata; these tests exercise the edge paths that testdata
does not reach: z-score boundary values that float64 alone cannot decide,
decile ties, and inner-join semantics with dangling keys on both sides.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, table):
    p = tmp_path / f"{name}.parquet"
    pq.write_table(table, p)
    return str(tmp_path)


# ------------------------------------------------ z-score exact boundary


def test_zscore_boundary_rows_decided_exactly(ray_session, tmp_path):
    """Small-spread random integer values maximize the chance of rows
    landing near the |z| == 2 boundary; a brute-force Python-bigint oracle
    pins the exact answer and the engine must match it row-for-row."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        value_zscore_outliers,
    )

    rng = np.random.default_rng(7)
    rows = []
    for t_i in range(4):
        # small-spread integers make exact boundary collisions plausible
        xs = rng.integers(-3, 4, size=50)
        rows += [(f"t{t_i}", float(x) / 100.0) for x in xs]
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
    })
    sf = _write(tmp_path, "events", tbl)

    got = value_zscore_outliers(sf)

    # brute-force exact oracle in Python bigints
    df = pd.DataFrame(rows, columns=["event_type", "value"])
    expect = []
    for t_name, g in df.groupby("event_type"):
        x = [int(round(v * 100)) for v in g["value"]]
        n, sx, sxx = len(x), sum(x), sum(v * v for v in x)
        rhs = 4 * (n * sxx - sx * sx)
        n_out = sum(1 for v in x if (n * v - sx) ** 2 > rhs)
        expect.append((t_name, n, n_out))
    want = pd.DataFrame(expect, columns=["event_type", "n_total",
                                         "n_outliers"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.sort_values("event_type").reset_index(drop=True),
        check_dtype=False)


def test_zscore_exact_recheck_branch_fires(ray_session, tmp_path):
    """Rows sitting EXACTLY on the |z| == 2 boundary — the case the
    float64 guard band + bigint recheck exist for.  xs = [0,0,0,0,5]:
    n=5, Σx=5, Σx²=25 → rhs = 4(5·25 − 25) = 400 and
    lhs(5) = (5·5 − 5)² = 400, so the strict > predicate must classify
    the 5 as an INLIER; a bigint oracle covers a scale sweep besides."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        value_zscore_outliers,
    )

    # per-c sweep xs = [-c, 0, c, 2c] (moments scale with c²) plus the
    # engineered exact-boundary type above
    rows = []
    for c in range(1, 41):
        for x in (-c, 0, c, 2 * c):
            rows.append((f"sweep{c:02d}", x / 100.0))
    for x in (0, 0, 0, 0, 5):
        rows.append(("boundary", x / 100.0))
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
    })
    sf = _write(tmp_path, "events", tbl)
    got = value_zscore_outliers(sf)

    b = got[got["event_type"] == "boundary"]
    # lhs == rhs exactly → strict > excludes it: 0 outliers
    assert int(b["n_outliers"].iloc[0]) == 0
    assert int(b["n_total"].iloc[0]) == 5

    # bigint oracle over the sweep
    df = pd.DataFrame(rows, columns=["event_type", "value"])
    for t_name, g in df.groupby("event_type"):
        x = [int(round(v * 100)) for v in g["value"]]
        n, sx, sxx = len(x), sum(x), sum(v * v for v in x)
        rhs = 4 * (n * sxx - sx * sx)
        n_out = sum(1 for v in x if (n * v - sx) ** 2 > rhs)
        row = got[got["event_type"] == t_name]
        assert int(row["n_outliers"].iloc[0]) == n_out, t_name


# ------------------------------------------------------------ decile ties


def test_deciles_with_massive_ties_match_duckdb(ray_session, tmp_path):
    """80% of customers share one exact total — the strict ``q < total``
    membership rule must put every tied customer in the SAME decile on
    both sides (ntile would split them arbitrarily)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        customer_spend_deciles,
    )

    rng = np.random.default_rng(11)
    custs, prices = [], []
    ck = 0
    for _ in range(160):  # tied block: two orders of 50.00 each
        ck += 1
        custs += [ck, ck]
        prices += [50.0, 50.0]
    for _ in range(40):  # distinct tails
        ck += 1
        custs.append(ck)
        prices.append(float(rng.integers(1, 30000)) / 100.0)
    tbl = pa.table({
        "o_custkey": pa.array(custs, pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64()),
    })
    sf = _write(tmp_path, "orders", tbl)
    got = customer_spend_deciles(sf)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf}/orders.parquet')")
    want = con.execute(ORACLE_SQL["customer_spend_deciles"]).df()
    got = got.sort_values("decile").reset_index(drop=True)
    want = want.sort_values("decile").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the tied block must land whole in one decile
    tied = got[got["n_customers"] >= 160]
    assert len(tied) == 1


# ----------------------------------------------- join with dangling keys


def test_shuffle_join_drops_dangling_keys_both_sides(ray_session, tmp_path):
    """Inner-join semantics: lineitems whose order is missing and orders
    with no lineitems must both vanish; counts are per-lineitem even when
    one order's items span multiple pre-agg batches."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        order_priority_revenue,
    )

    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 99], pa.int64()),  # 99 dangles
        "l_extendedprice": pa.array([100.0, 200.0, 50.0, 7.0]),
        "l_discount": pa.array([0.1, 0.0, 0.5, 0.0]),
    })
    od = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),  # 3 has no items
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "1-URGENT"]),
    })
    pq.write_table(li, tmp_path / "lineitem.parquet")
    pq.write_table(od, tmp_path / "orders.parquet")

    got = order_priority_revenue(str(tmp_path))
    want = pd.DataFrame({
        "o_orderpriority": ["1-URGENT", "2-HIGH"],
        "n_items": [2, 1],
        "revenue": [100.0 * 0.9 + 200.0, 25.0],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------- rollup self-consistency


def test_rollup_margins_fold_from_finest(ray_session):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        events_rollup,
    )

    out = events_rollup("/root/testdata/sf0.001")
    fine = out[(out["event_type"] != "ALL") & (out["hour"] >= 0)]
    lvl1 = out[(out["event_type"] != "ALL") & (out["hour"] == -1)]
    total = out[out["event_type"] == "ALL"]
    assert len(total) == 1
    assert int(total["n_events"].iloc[0]) == int(fine["n_events"].sum())
    per_type = fine.groupby("event_type")["n_events"].sum()
    for r in lvl1.itertuples(index=False):
        assert per_type[r.event_type] == r.n_events


# ------------------------------------------------ anti-join with real gaps


def test_anti_join_counts_planted_orderless_customers(ray_session, tmp_path):
    """30% of customers have no orders; the native left_anti exchange must
    count exactly those, per segment, with zero-filled segments intact."""
    import duckdb

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        customers_without_orders,
    )

    rng = np.random.default_rng(3)
    n = 500
    segs = np.array(["AUTO", "HOUSE", "MACH"])
    cust = pa.table({
        "c_custkey": pa.array(np.arange(1, n + 1), pa.int64()),
        "c_mktsegment": pa.array(segs[rng.integers(0, 3, n)], pa.string()),
    })
    with_orders = np.arange(1, n + 1)[rng.random(n) > 0.3]
    orders = pa.table({
        "o_custkey": pa.array(np.repeat(with_orders, 2), pa.int64()),
    })
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")

    got = customers_without_orders(str(tmp_path))
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    want = con.execute(ORACLE_SQL["customers_without_orders"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)
    assert got["n_customers"].sum() == n - len(with_orders) > 100


def test_full_outer_reconcile_with_both_side_exclusives(ray_session,
                                                        tmp_path):
    """Keys exclusive to EITHER side must be classified correctly (the
    driver testdata never has lineitem-only keys)."""
    import duckdb

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        orders_lineitem_reconcile,
    )

    li = pa.table({"l_orderkey": pa.array([1, 1, 2, 7, 8], pa.int64())})
    od = pa.table({"o_orderkey": pa.array([1, 2, 3, 4], pa.int64())})
    pq.write_table(li, tmp_path / "lineitem.parquet")
    pq.write_table(od, tmp_path / "orders.parquet")

    got = orders_lineitem_reconcile(str(tmp_path))
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    want = con.execute(ORACLE_SQL["orders_lineitem_reconcile"]).df()
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"), check_dtype=False)
    assert got.iloc[0].to_dict() == {
        "n_both": 2, "n_lineitem_only": 2, "n_orders_only": 2}


# ------------------------------------------- sharded-directory table input


def test_queries_read_sharded_table_directories(ray_session, tmp_path):
    """At 100 TB every table is a DIRECTORY of parquet shards, not one
    file.  Shard events/orders/lineitem/customer/nation 4-ways and assert
    a scan query, a native join, a keyed window query and an anti-join
    return byte-identical results to the single-file layout."""
    import pyarrow.parquet as pqt

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        customers_without_orders,
        latest_event_per_user,
        order_priority_revenue,
        value_histogram,
    )

    src = "/root/testdata/sf0.001"
    for t in ("events", "orders", "lineitem", "customer", "nation"):
        tbl = pqt.read_table(f"{src}/{t}.parquet")
        d = tmp_path / f"{t}.parquet"
        d.mkdir()
        n = tbl.num_rows
        cuts = [0, n // 4, n // 2, 3 * n // 4, n]
        for i in range(4):
            pqt.write_table(tbl.slice(cuts[i], cuts[i + 1] - cuts[i]),
                            d / f"shard-{i:02d}.parquet")

    for fn in (value_histogram, order_priority_revenue,
               latest_event_per_user, customers_without_orders):
        got = fn(str(tmp_path))
        want = fn(src)
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      obj=fn.__name__)


# --------------------------------------------- null-key robustness (r4 review)


def test_events_rollup_null_ts_dropped(ray_session, tmp_path):
    """A shard with a NULL ts must not crash the rollup's int64 hour cast;
    null-ts rows are excluded on both the engine and oracle sides."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        events_rollup,
    )

    ts = pa.array([pd.Timestamp("2024-01-01 03:00"), None,
                   pd.Timestamp("2024-01-01 05:30"),
                   pd.Timestamp("2024-01-02 03:59")],
                  pa.timestamp("us"))
    tbl = pa.table({"event_type": pa.array(["a", "a", "b", "a"]),
                    "ts": ts})
    sf = _write(tmp_path, "events", tbl)

    got = events_rollup(sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["events_rollup"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_hll_partial_tolerates_null_event_type(ray_session, tmp_path):
    """Null group keys must be dropped by the vectorized HLL partial (a
    null dictionary index would otherwise read as INT64_MIN and corrupt
    the register fold) — and the exact twin must drop them identically so
    the in-query bound check still passes."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        hll_users_per_event_type,
    )

    tbl = pa.table({
        "event_type": pa.array(["a", None, "b", "a", None], pa.string()),
        "user_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    sf = _write(tmp_path, "events", tbl)

    out = hll_users_per_event_type(sf)
    assert sorted(out["event_type"]) == ["a", "b"]
    assert out.set_index("event_type")["exact_users"].to_dict() == {
        "a": 2, "b": 1}
    assert bool(out["within_bound"].all())


def test_user_event_gaps_gap_free_input_matches_oracle(ray_session, tmp_path):
    """Every user appears exactly once → no gaps anywhere; both sides
    must agree on (0, 0, 0, 0) rather than engine-0 vs oracle-NULL."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        user_event_gaps,
    )

    tbl = pa.table({
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01"),
                        pd.Timestamp("2024-01-02"),
                        pd.Timestamp("2024-01-03")], pa.timestamp("us")),
    })
    sf = _write(tmp_path, "events", tbl)

    got = user_event_gaps(sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["user_event_gaps"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


# ------------------------------------------ round-4b breadth: index + vocab


def test_inverted_index_posting_lists_exact(ray_session, tmp_path):
    """Posting lists must be ascending-doc_id joined strings with exact
    document frequencies — duplicate tokens inside one doc count once."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        inverted_index_tokens,
    )

    tbl = pa.table({
        "doc_id": pa.array([10, 2, 7], pa.int64()),
        "text": pa.array(["alpha beta alpha", "beta gamma", "alpha beta"],
                         pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)
    out = inverted_index_tokens(sf).set_index("token")
    assert out.loc["alpha", "postings"] == "7,10"
    assert out.loc["beta", "postings"] == "2,7,10"
    assert out.loc["gamma", "postings"] == "2"
    assert out["df_docs"].to_dict() == {"beta": 3, "alpha": 2, "gamma": 1}


def test_vocab_coverage_planted_oov(ray_session, tmp_path):
    """With vocab_size=2, the two most frequent tokens form the vocabulary
    and every other occurrence is OOV; per-lang rates must be exact."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        vocab_coverage,
    )

    tbl = pa.table({
        "lang": pa.array(["en", "en", "de"], pa.string()),
        "text": pa.array(["aa aa bb rare1", "aa bb", "aa rare2 rare2"],
                         pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)
    out = vocab_coverage(sf, vocab_size=2).set_index("lang")
    # counts: aa=4, bb=2, rare2=2, rare1=1 -> vocab = {aa, bb} (ties: bb < rare2)
    assert out.loc["en", "n_tokens"] == 6 and out.loc["en", "n_oov"] == 1
    assert out.loc["de", "n_tokens"] == 3 and out.loc["de", "n_oov"] == 2
    assert out.loc["de", "oov_rate"] == round(2 / 3, 6)


def test_snapshot_diff_all_classes_nonzero(ray_session):
    """The derived snapshot plants all four diff classes; each count must
    be non-zero at sf0.001 and the classes must partition the key union."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        snapshot_diff_orders,
    )

    out = snapshot_diff_orders("/root/testdata/sf0.001").iloc[0]
    assert out["n_added"] > 0 and out["n_removed"] > 0
    assert out["n_changed"] > 0 and out["n_identical"] > 0


def test_top_suppliers_rank_keeps_ties(ray_session, tmp_path):
    """rank() semantics: a two-way tie at rank 1 keeps BOTH rows and the
    next row ranks 3 (excluded by <= 2 only if a full tie class fits)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        top_suppliers_per_nation,
    )

    tbl = pa.table({
        "s_nationkey": pa.array([1, 1, 1, 1], pa.int64()),
        "s_name": pa.array(["a", "b", "c", "d"], pa.string()),
        "s_acctbal": pa.array([50.0, 50.0, 40.0, 30.0], pa.float64()),
    })
    sf = _write(tmp_path, "supplier", tbl)
    out = top_suppliers_per_nation(sf)
    assert list(out["s_name"]) == ["a", "b"]
    assert list(out["rnk"]) == [1, 1]


def test_benford_digits_partition_and_zero_filter(ray_session, tmp_path):
    """Leading digits must come from exact cents (boundary value 10.00 ->
    digit 1, 0.09 -> 9), zero/negative totals excluded, shares sum to 1."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        benford_totalprice,
    )

    tbl = pa.table({"o_totalprice": pa.array(
        [10.00, 0.09, 99.99, 0.0, 923.11, 10.00], pa.float64())})
    sf = _write(tmp_path, "orders", tbl)
    out = benford_totalprice(sf).set_index("digit")
    assert out.loc["1", "n_orders"] == 2   # 1000, 1000 cents
    assert out.loc["9", "n_orders"] == 3   # 9, 9999, 92311 cents
    assert abs(out["share"].sum() - 1.0) < 1e-9


def test_user_event_inversions_planted(ray_session, tmp_path):
    """One user with a backwards timestamp between consecutive event_ids
    must count exactly one inversion of two pairs."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        user_event_inversions,
    )

    tbl = pa.table({
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01 00:02"),
                        pd.Timestamp("2024-01-01 00:01"),
                        pd.Timestamp("2024-01-01 00:03")],
                       pa.timestamp("us")),
    })
    sf = _write(tmp_path, "events", tbl)
    out = user_event_inversions(sf).iloc[0]
    assert out["n_pairs"] == 2 and out["n_inversions"] == 1
    assert out["inversion_rate"] == 0.5


# ------------------------------------------ round-4c: sessions, mode, deltas


def test_user_sessions_boundary_exactly_30min_is_same_session(ray_session,
                                                              tmp_path):
    """Gap == 30 min exactly stays in-session (strict >); 30 min + 1 µs
    splits.  Also plants timestamp TIES inside one session — boundaries
    must depend only on the sorted multiset."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        user_sessions,
    )

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    gap = pd.Timedelta(minutes=30)
    us = pd.Timedelta(microseconds=1)
    rows = [
        (1, t0), (1, t0), (1, t0 + gap),           # tie + exact-30min: one session
        (1, t0 + gap + gap + us),                   # 30min+1µs after: new session
        (2, t0), (2, t0 + gap + us),                # user 2: immediate split
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    sf = _write(tmp_path, "events", tbl)

    got = user_sessions(sf)
    assert got.set_index("user_id")["n_sessions"].to_dict() == {1: 2, 2: 2}
    assert int(got.set_index("user_id").loc[1, "max_session_events"]) == 3

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["user_sessions"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_top_event_type_tie_breaks_lexicographically(ray_session, tmp_path):
    """Two types with equal counts → the lexicographically smaller type
    wins on both the engine and the oracle side."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        top_event_type_per_user,
    )

    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2], pa.int64()),
        "event_type": pa.array(
            ["view", "view", "click", "click",       # tie → "click" wins
             "purchase", "view", "purchase"],        # purchase 2 > view 1
            pa.string()),
    })
    sf = _write(tmp_path, "events", tbl)

    got = top_event_type_per_user(sf)
    assert got.set_index("user_id")["event_type"].to_dict() == {
        1: "click", 2: "purchase"}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["top_event_type_per_user"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_monthly_mom_first_month_dropped_and_exact_deltas(ray_session,
                                                          tmp_path):
    """The predecessor-less first month is dropped on both sides (the
    output stays NULL-free); deltas come from exact integer cents
    (0.01-granular inputs that would round differently through naive
    float sums)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        monthly_revenue_mom,
    )

    dates = [pd.Timestamp("2024-01-15"), pd.Timestamp("2024-01-20"),
             pd.Timestamp("2024-02-10"), pd.Timestamp("2024-03-05")]
    tbl = pa.table({
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_totalprice": pa.array([10.02, 20.02, 45.06, 22.53], pa.float64()),
    })
    sf = _write(tmp_path, "orders", tbl)

    got = monthly_revenue_mom(sf)
    assert list(got["month"]) == ["2024-02", "2024-03"]
    assert got.loc[0, "mom_pct"] == 50.0        # 30.04 → 45.06
    assert got.loc[1, "mom_pct"] == -50.0       # 45.06 → 22.53

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    want = con.execute(ORACLE_SQL["monthly_revenue_mom"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_levenshtein_batch_matches_reference_dp():
    """Batched-DP distances equal the classic per-pair DP on a mix of
    empties, transpositions, prefixes, and unequal lengths."""
    import itertools

    from approximate_anomaly_detection_in_data_streams_ray.functions.text import (
        levenshtein_batch,
    )

    def lev(a, b):
        a, b = a.encode(), b.encode()
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            nd = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                nd[j] = min(dp[j] + 1, nd[j - 1] + 1,
                            dp[j - 1] + (a[i - 1] != b[j - 1]))
            dp = nd
        return dp[-1]

    words = ["", "x", "ab", "ba", "abc", "acb", "cold bolt", "old bolt",
             "widget", "widgett", "hot gear"]
    pairs = list(itertools.product(words, repeat=2))
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    assert got.tolist() == [lev(*p) for p in pairs]


def test_deletion_blocking_is_complete_for_lev_le_2():
    """Every pair within edit distance 2 must share a variant hash —
    the SymSpell completeness property the fuzzy query relies on."""
    import random
    from collections import defaultdict

    from approximate_anomaly_detection_in_data_streams_ray.functions.text import (
        deletion_variant_hashes,
        levenshtein_batch,
    )

    random.seed(11)
    ws = sorted({"".join(random.choice("abcd") for _ in
                         range(random.randint(1, 8))) for _ in range(150)})
    h, ix = deletion_variant_hashes(ws, 2)
    buckets = defaultdict(set)
    for hh, ii in zip(h.tolist(), ix.tolist()):
        buckets[hh].add(ii)
    cand = {(a, b) for s in buckets.values() for a in s for b in s if a < b}
    import itertools

    all_pairs = list(itertools.combinations(range(len(ws)), 2))
    d = levenshtein_batch([ws[a] for a, _ in all_pairs],
                          [ws[b] for _, b in all_pairs])
    missed = [p for p, dd in zip(all_pairs, d) if dd <= 2 and p not in cand]
    assert not missed, missed[:5]


def test_part_name_fuzzy_pairs_planted(ray_session, tmp_path):
    """Planted near-names must pair up; far names must not; result
    matches the quadratic DuckDB oracle exactly."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        part_name_fuzzy_pairs,
    )

    names = ["cold bolt", "old bolt", "cold bolts", "anvil", "anvvil",
             "completely different", "zzz"] * 3  # duplicates across rows
    tbl = pa.table({"p_name": pa.array(names, pa.string())})
    sf = _write(tmp_path, "part", tbl)

    got = part_name_fuzzy_pairs(sf)
    pairs = set(zip(got["name_a"], got["name_b"]))
    assert ("cold bolt", "old bolt") in pairs
    assert ("anvil", "anvvil") in pairs
    assert all("completely different" not in p for p in pairs)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'")
    want = con.execute(ORACLE_SQL["part_name_fuzzy_pairs"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


# --------------------------------- round-4d: profiling-primitive edge paths


def test_embedding_position_stats_ragged_lists(ray_session, tmp_path):
    """Ragged lists exercise the argsort+reduceat path (positions beyond
    a short vector simply have smaller counts); matches the UNNEST
    oracle exactly."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        embedding_position_stats,
    )

    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.5, -2.0, 0.25], [0.5], [-1.0, 4.0]],
                              pa.list_(pa.float32())),
    })
    sf = _write(tmp_path, "embeddings", tbl)

    got = embedding_position_stats(sf)
    assert got["n"].tolist() == [3, 2, 1]
    assert got.loc[0, "vmin"] == -1.0 and got.loc[0, "vmax"] == 1.5

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    want = con.execute(ORACLE_SQL["embedding_position_stats"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_user_event_entropy_known_values(ray_session, tmp_path):
    """Single-type user → entropy exactly 0; uniform 4-type user →
    exactly 2 bits; oracle parity on both."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        user_event_entropy,
    )

    tbl = pa.table({
        "user_id": pa.array([1] * 5 + [2, 2, 2, 2], pa.int64()),
        "event_type": pa.array(["view"] * 5 + ["a", "b", "c", "d"],
                               pa.string()),
    })
    sf = _write(tmp_path, "events", tbl)

    got = user_event_entropy(sf)
    ent = got.set_index("user_id")["entropy"].to_dict()
    assert ent == {1: 0.0, 2: 2.0}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["user_event_entropy"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_daily_new_users_counts_first_touch_only(ray_session, tmp_path):
    """A user returning on a later day is counted on their FIRST day
    only; cum_users is the running sum; oracle parity."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        daily_new_users,
    )

    ts = [pd.Timestamp("2024-01-01 10:00"), pd.Timestamp("2024-01-02 09:00"),
          pd.Timestamp("2024-01-02 11:00"), pd.Timestamp("2024-01-03 08:00"),
          pd.Timestamp("2024-01-03 09:00")]
    tbl = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    sf = _write(tmp_path, "events", tbl)

    got = daily_new_users(sf)
    assert got["new_users"].tolist() == [1, 1, 1]
    assert got["cum_users"].tolist() == [1, 2, 3]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["daily_new_users"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_fd_audit_counts_planted_violations(ray_session, tmp_path):
    """Keys 1 (two flags) and 3 (three flags) violate the FD; key 2 does
    not, including when its single flag repeats across rows."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        fd_orderkey_returnflag,
    )

    tbl = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 2, 3, 3, 3], pa.int64()),
        "l_returnflag": pa.array(["A", "R", "N", "N", "N", "A", "R", "N"],
                                 pa.string()),
    })
    sf = _write(tmp_path, "lineitem", tbl)

    got = fd_orderkey_returnflag(sf)
    assert got.loc[0, "n_keys"] == 3
    assert got.loc[0, "n_violating_keys"] == 2
    assert got.loc[0, "max_distinct_flags"] == 3

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.execute(ORACLE_SQL["fd_orderkey_returnflag"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_skew_profile_counts_of_counts(ray_session, tmp_path):
    """Histogram of rows-per-key: two 1-row keys, one 3-row key."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        orderkey_skew_profile,
    )

    tbl = pa.table({"l_orderkey": pa.array([7, 8, 9, 9, 9], pa.int64())})
    sf = _write(tmp_path, "lineitem", tbl)

    got = orderkey_skew_profile(sf)
    assert got.set_index("rows_per_key")["n_keys"].to_dict() == {1: 2, 3: 1}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.execute(ORACLE_SQL["orderkey_skew_profile"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


# ------------------------------- round-4e: statistical-validation primitives


def test_chisq_zero_when_type_matches_global(ray_session, tmp_path):
    """A type whose hourly profile is proportional to the global one
    contributes χ² = 0 exactly; a concentrated type scores > 0."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        event_hourly_chisq,
    )

    ts, types = [], []
    # "flat": 2 events in each of hours 1 and 2 → proportional to global
    # iff the OTHER type is also 50/50 across those hours
    for h in (1, 1, 2, 2):
        ts.append(pd.Timestamp(f"2024-01-01 {h:02d}:00"))
        types.append("flat")
    for h in (1, 1, 2, 2):
        ts.append(pd.Timestamp(f"2024-01-01 {h:02d}:30"))
        types.append("also_flat")
    tbl = pa.table({
        "event_type": pa.array(types, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    sf = _write(tmp_path, "events", tbl)
    got = event_hourly_chisq(sf)
    assert got["chisq"].tolist() == [0.0, 0.0]
    assert got["dof"].tolist() == [1, 1]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["event_hourly_chisq"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_chisq_detects_concentrated_type(ray_session, tmp_path):
    """All of type B in hour 0 while A spreads out → B's χ² is the
    textbook value (computed by hand through the marginals)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        event_hourly_chisq,
    )

    rows = [("A", 0)] * 5 + [("A", 1)] * 5 + [("B", 0)] * 10
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([pd.Timestamp(f"2024-01-01 {r[1]:02d}:00")
                        for r in rows], pa.timestamp("us")),
    })
    sf = _write(tmp_path, "events", tbl)
    got = event_hourly_chisq(sf)
    # marginals: nh = (15, 5), N = 20; B: e = (7.5, 2.5),
    # χ²_B = (10-7.5)²/7.5 + (0-2.5)²/2.5 = 0.8333... + 2.5
    b = got[got["event_type"] == "B"].iloc[0]
    assert abs(b["chisq"] - (2.5 ** 2 / 7.5 + 2.5)) < 1e-6

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["event_hourly_chisq"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_retention_counts_next_day_overlap_only(ray_session, tmp_path):
    """User 1 active d1+d2 (retained), user 2 active d1+d3 (a GAP — not
    retained), user 3 active d2 only; multiple same-day events dedup."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        daily_user_retention,
    )

    rows = [
        (1, "2024-01-01 08:00"), (1, "2024-01-01 09:00"),  # dedup to one
        (1, "2024-01-02 10:00"),
        (2, "2024-01-01 11:00"), (2, "2024-01-03 12:00"),  # gap: no credit
        (3, "2024-01-02 13:00"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([pd.Timestamp(r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    sf = _write(tmp_path, "events", tbl)
    got = daily_user_retention(sf)
    by_day = got.set_index("day")
    assert by_day.loc["2024-01-01", "n_users"] == 2
    assert by_day.loc["2024-01-01", "n_retained"] == 1     # only user 1
    assert by_day.loc["2024-01-02", "n_retained"] == 0
    assert by_day.loc["2024-01-01", "retention_rate"] == 0.5

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["daily_user_retention"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_mad_is_outlier_resistant_and_discrete(ray_session, tmp_path):
    """One wild balance barely moves the MAD; median/MAD are actual data
    values (discrete quantile), matching quantile_disc exactly."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        nation_acctbal_mad,
    )

    bal = [100.0, 110.0, 120.0, 130.0, 99999.0]   # outlier at the end
    tbl = pa.table({
        "s_suppkey": pa.array(range(1, 6), pa.int64()),
        "s_nationkey": pa.array([7] * 5, pa.int32()),
        "s_acctbal": pa.array(bal, pa.float64()),
    })
    sf = _write(tmp_path, "supplier", tbl)
    got = nation_acctbal_mad(sf)
    assert got.loc[0, "median_acctbal"] == 120.0   # a real data value
    # deviations: 20, 10, 0, 10, 99879 → MAD = 10 (discrete p50)
    assert got.loc[0, "mad_acctbal"] == 10.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW supplier AS SELECT * FROM '{sf}/supplier.parquet'")
    want = con.execute(ORACLE_SQL["nation_acctbal_mad"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_benchmark_contamination_planted(ray_session, tmp_path):
    """Doc 97·k sources a snippet; a doc embedding that snippet
    mid-text is flagged, the source itself is NOT (self-match excluded),
    and an unrelated doc is clean.  Duplicate snippets count once per
    source instance, matching the oracle's join cardinality."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        benchmark_contamination,
    )

    snip_src = "The quick brown fox jumps over the lazy dog tail."
    rows = [
        (0, snip_src),                                   # source (0 % 97 == 0)
        (97, snip_src),                                  # duplicate source
        (5, "prefix " + snip_src[:40] + " suffix"),      # contaminated: hits 2
        (6, "completely unrelated text that is long enough here"),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)

    got = benchmark_contamination(sf)
    by_id = got.set_index("doc_id")["n_snippets_hit"].to_dict()
    # doc 5 contains the shared snippet → one hit per SOURCE instance;
    # sources 0 and 97 contain each other's (identical) snippet too
    assert by_id[5] == 2
    assert by_id[0] == 1 and by_id[97] == 1   # cross-hits, not self-hits
    assert 6 not in by_id

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.execute(ORACLE_SQL["benchmark_contamination"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_split_leakage_flags_cross_split_near_dup(ray_session, tmp_path):
    """Two near-identical docs with ids hash-assigned to different
    splits must surface as a leaked pair; a same-split near-dup pair and
    an unrelated doc must not."""
    import hashlib

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        split_leakage_audit,
    )

    def split_of(i):
        c = hashlib.md5(str(i).encode()).hexdigest()[0]
        return "train" if c <= "b" else ("val" if c <= "d" else "test")

    ids = list(range(200))
    train = [i for i in ids if split_of(i) == "train"]
    test = [i for i in ids if split_of(i) == "test"]
    base = ("the quick brown fox jumps over the lazy dog and then "
            "naps in the warm afternoon sun by the riverbank") * 3
    rows = [
        (train[0], base), (test[0], base + " x"),        # cross-split leak
        (train[1], base.upper()), (train[2], base.upper() + " y"),  # same split
        (test[1], "completely different text " * 12),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)

    got = split_leakage_audit(sf)
    pairs = set(zip(got["id_a"], got["id_b"]))
    a, b = sorted((train[0], test[0]))
    assert (a, b) in pairs
    s, t = sorted((train[1], train[2]))
    assert (s, t) not in pairs                # same-split pair not leakage
    assert set(got["split_a"]) | set(got["split_b"]) <= {
        "train", "val", "test"}

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.execute(ORACLE_SQL["split_leakage_audit"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_embedding_position_stats_skips_null_lists_only(ray_session,
                                                        tmp_path):
    """A null embedding LIST is skipped (UNNEST semantics) while the
    other rows in the same batch still count."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        embedding_position_stats,
    )

    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], None, [3.0]],
                              pa.list_(pa.float32())),
    })
    sf = _write(tmp_path, "embeddings", tbl)

    got = embedding_position_stats(sf)
    assert got["n"].tolist() == [2, 1]
    assert got.loc[0, "vmax"] == 3.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    want = con.execute(ORACLE_SQL["embedding_position_stats"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_weekly_active_users_trailing_window(ray_session, tmp_path):
    """WAU counts a user active 4 days earlier (inside the trailing 7)
    but not one 10 days earlier; unobserved days are not reported; a
    user with several events in one day counts once."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        weekly_active_users,
    )

    rows = [
        (1, "2024-01-01 09:00"), (1, "2024-01-01 10:00"),  # dedup same day
        (2, "2024-01-05 09:00"),                           # 1 still in window
        (3, "2024-01-20 09:00"),                           # far later, alone
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([pd.Timestamp(r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    sf = _write(tmp_path, "events", tbl)

    got = weekly_active_users(sf)
    by_day = got.set_index("day")["wau"].to_dict()
    assert by_day == {"2024-01-01": 1, "2024-01-05": 2, "2024-01-20": 1}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(ORACLE_SQL["weekly_active_users"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


# ------------------------------------------------ broadcast range join


def test_range_join_matches_bruteforce_with_overlaps(ray_session):
    """Random values stabbed into random overlapping intervals must equal
    the O(n*K) brute-force join, including values matching 0 intervals."""
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.joins import (
        broadcast_range_join,
    )

    rng = np.random.default_rng(11)
    starts = rng.integers(0, 1000, size=40)
    lens = rng.integers(1, 120, size=40)
    iv = pa.table({
        "iv_id": pa.array(np.arange(40), pa.int64()),
        "start": pa.array(starts.astype(np.int64)),
        "end": pa.array((starts + lens).astype(np.int64)),
    })
    vals = rng.integers(-50, 1150, size=500).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "row_id": pa.array(np.arange(500), pa.int64()),
        "v": pa.array(vals),
    }))

    got = broadcast_range_join(ds, iv, on="v").to_pandas()
    got = got.sort_values(["row_id", "iv_id"]).reset_index(drop=True)

    exp_rows = []
    for r, v in enumerate(vals):
        for i in range(40):
            if starts[i] <= v < starts[i] + lens[i]:
                exp_rows.append((r, int(v), i, int(starts[i]),
                                 int(starts[i] + lens[i])))
    want = pd.DataFrame(exp_rows, columns=["row_id", "v", "iv_id",
                                           "start", "end"])
    want = want.sort_values(["row_id", "iv_id"]).reset_index(drop=True)
    assert len(got) == len(want) > 500  # overlaps guarantee blowup > n
    pd.testing.assert_frame_equal(
        got[["row_id", "v", "iv_id", "start", "end"]], want,
        check_dtype=False)


def test_range_join_empty_interval_side_keeps_schema(ray_session):
    import ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.joins import (
        broadcast_range_join,
    )

    iv = pa.table({"iv_id": pa.array([], pa.int64()),
                   "start": pa.array([], pa.int64()),
                   "end": pa.array([], pa.int64())})
    ds = ray.data.from_arrow(pa.table({"v": pa.array([1, 2, 3], pa.int64())}))
    out = broadcast_range_join(ds, iv, on="v")
    # Ray's to_pandas() drops columns for fully-empty datasets; the
    # schema contract is what downstream stages consume.
    assert set(out.schema().names) == {"v", "iv_id", "start", "end"}
    assert out.count() == 0


def test_campaign_event_stats_matches_duckdb(ray_session):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        campaign_event_stats,
    )

    sf = "/root/testdata/sf0.001"
    got = campaign_event_stats(sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    want = con.execute(ORACLE_SQL["campaign_event_stats"]).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_weighted_sample_overrepresents_heavy_rows(ray_session, tmp_path):
    """Efraimidis-Spirakis property: with weights 10000 vs 1 split evenly
    over 4000 rows and k=100, nearly all sampled rows must come from the
    heavy class (P[a light row out-keys a heavy row] ≈ P[u_h < u_l^10000]
    — tiny), and the result must be identical across block layouts
    (cluster-size independence)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        weighted_sample_orders,
    )

    n = 4000
    keys = np.arange(1, n + 1, dtype=np.int64)
    weights = np.where(keys % 2 == 0, 10000.0, 1.0)
    tbl = pa.table({"o_orderkey": pa.array(keys),
                    "o_totalprice": pa.array(weights)})
    (tmp_path / "one").mkdir()
    sf_one = _write(tmp_path / "one", "orders", tbl)

    # same rows, 4 shards — a different block layout must not change the set
    d = tmp_path / "many" / "orders.parquet"
    d.mkdir(parents=True)
    for i in range(4):
        pq.write_table(tbl.slice(i * 1000, 1000), d / f"part-{i}.parquet")

    got_one = weighted_sample_orders(sf_one)
    got_many = weighted_sample_orders(str(tmp_path / "many"))
    pd.testing.assert_frame_equal(got_one, got_many)

    heavy_frac = (got_one["o_orderkey"] % 2 == 0).mean()
    assert heavy_frac >= 0.95, heavy_frac


def test_left_join_preserves_orderless_customers(ray_session, tmp_path):
    """The driver testdata has no orderless customers, so the LEFT-preserved
    zero-fill path is proven here with planted ones, against DuckDB."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ORACLE_SQL,
        customer_order_summary_left,
    )

    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["a", "b", "c_orderless", "d_orderless"]),
    })
    orders = pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_totalprice": pa.array([10.0, 5.5, 7.25]),
    })
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")

    got = customer_order_summary_left(str(tmp_path))
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    want = con.execute(ORACLE_SQL["customer_order_summary_left"]).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_orders"] == 0).sum() == 2
    assert got.loc[got["c_name"] == "c_orderless", "sum_total"].iloc[0] == 0.0


def test_drawdown_planted_sequence_and_ties(ray_session, tmp_path):
    """Hand-computable drawdown: user 1 rides 10→30→5 (dd 25.00) with a
    same-timestamp tie broken by event_id; user 2 is monotone rising
    (dd 0); user 3 has one event (dd 0)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        user_value_drawdown,
    )

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(1, "m")
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        # events 2 and 3 share a timestamp: event_id must order 30 before 5
        "ts": pa.array([t0, t0 + m, t0 + m, t0 + 2 * m,
                        t0, t0 + m, t0], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "value": pa.array([10.0, 30.0, 5.0, 12.0, 1.0, 2.0, 9.99]),
    })
    sf = _write(tmp_path, "events", tbl)
    got = user_value_drawdown(sf)
    want = pd.DataFrame({
        "user_id": [1, 2, 3],
        "n_events": [4, 2, 1],
        "max_drawdown": [25.0, 0.0, 0.0],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_chunking_boundaries_planted(ray_session, tmp_path):
    """Exact boundary arithmetic: 48 tokens → one full-stride chunk;
    49 → a 1-token tail chunk; 64 → window-sized chunk plus 16-token
    overlap tail; empty/no-token docs emit nothing."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        chunk_documents,
    )

    def words(k):
        return " ".join(f"w{i}" for i in range(k))

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([words(48), words(49), words(64), "", "!!! ???"]),
    })
    sf = _write(tmp_path, "documents", tbl)
    got = chunk_documents(sf)
    want = pd.DataFrame({
        "doc_id": [1, 2, 2, 3, 3],
        "chunk_id": [0, 0, 1, 0, 1],
        "chunk_tokens": [48, 49, 1, 64, 16],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_funnel_ordered_condition_planted(ray_session, tmp_path):
    """Testdata converts 100%, so the ordering logic is proven here:
    purchase-before-view and purchase-at-exactly-first-view must NOT
    convert (strict >); purchase-only users are not even 'viewed'."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        view_purchase_funnel,
    )

    t0 = np.datetime64("2024-01-05T12:00:00", "us")
    h = np.timedelta64(1, "h")
    rows = [  # (user, ts, type)
        (1, t0, "view"), (1, t0 + h, "purchase"),        # converts
        (2, t0, "purchase"), (2, t0 + h, "view"),        # wrong order
        (3, t0, "view"),                                 # never purchased
        (4, t0, "purchase"),                             # never viewed
        (5, t0, "view"), (5, t0, "purchase"),            # tie: strict >
        (6, t0 + h, "view"), (6, t0, "view"),
        (6, t0 + 2 * h, "purchase"),                     # converts (min view)
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    })
    sf = _write(tmp_path, "events", tbl)
    got = view_purchase_funnel(sf)
    want = pd.DataFrame({"n_viewed": [5], "n_converted": [2]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_contamination_clean_corpus_returns_typed_empty(ray_session,
                                                        tmp_path):
    """A corpus with no snippet hits (no doc_id % 97 == 0 rows at all)
    must return a typed empty frame, not a column-less one."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        benchmark_contamination,
    )

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta", "gamma delta", "epsilon zeta"]),
    })
    sf = _write(tmp_path, "documents", tbl)
    got = benchmark_contamination(sf)
    assert list(got.columns) == ["doc_id", "n_snippets_hit"]
    assert len(got) == 0


def test_cohort_matrix_planted(ray_session, tmp_path):
    """Hand-checkable 3-type matrix: diagonal = per-type user counts,
    off-diagonal = both-type users; repeat events must not inflate."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        event_type_cohort_matrix,
    )

    rows = [(1, "a"), (1, "a"), (1, "b"),      # u1: a,b (repeat a)
            (2, "b"), (2, "c"),                # u2: b,c
            (3, "a")]                          # u3: a
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
    })
    sf = _write(tmp_path, "events", tbl)
    got = event_type_cohort_matrix(sf)
    # the (a, c) pair has no common user and must be ABSENT (inner-join
    # semantics, matching the SQL oracle), not present with 0
    want = pd.DataFrame({
        "type_a": ["a", "a", "b", "b", "c"],
        "type_b": ["a", "b", "b", "c", "c"],
        "n_users": [2, 1, 2, 1, 1],
    })
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_small_quantity_revenue_planted(ray_session, tmp_path):
    """Two parts with hand-computed averages: part 1 qties (1, 10, 10)
    avg 7 → only qty 1 < 1.4 qualifies; part 2 qties (5, 5) avg 5 →
    nothing < 1.0 qualifies."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        small_quantity_revenue,
    )

    tbl = pa.table({
        "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_quantity": pa.array([1.0, 10.0, 10.0, 5.0, 5.0]),
        "l_extendedprice": pa.array([70.0, 1.0, 1.0, 1.0, 1.0]),
    })
    sf = _write(tmp_path, "lineitem", tbl)
    got = small_quantity_revenue(sf)
    want = pd.DataFrame({"n_items": [1], "avg_yearly": [10.0]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_event_transition_counts_planted(ray_session, tmp_path):
    """u1's a→b→a chain and u2's single b→b; timestamp tie inside u1
    broken by event_id, and no cross-user pair may appear."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        event_transition_counts,
    )

    t0 = np.datetime64("2026-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [  # (user, event_id, ts, type)
        (1, 1, t0, "a"), (1, 2, t0 + s, "b"),
        (1, 3, t0 + 2 * s, "a"),
        # tie at t0+2s: event_id 4 sorts after 3 → a→c then c→a? No:
        # (3:"a", 4:"c") adjacent, so a→c
        (1, 4, t0 + 2 * s, "c"),
        (2, 5, t0, "b"), (2, 6, t0 + s, "b"),
        (3, 7, t0, "a"),                       # lone event: no pair
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
    })
    sf = _write(tmp_path, "events", tbl)
    got = event_transition_counts(sf)
    want = pd.DataFrame({
        "prev_type": ["a", "a", "b", "b"],
        "next_type": ["b", "c", "a", "b"],
        "n_transitions": [1, 1, 1, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_copurchase_pairs_planted(ray_session, tmp_path):
    """Baskets {1,2,3}, {1,2}, {2,3} (with a duplicated (order, part)
    line that must not double-count) → pair counts (1,2):2, (2,3):2,
    (1,3):1; top ordering breaks the count tie by (p1, p2)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        copurchase_part_pairs,
    )

    rows = [(10, 1), (10, 2), (10, 3), (10, 2),   # dup line in order 10
            (20, 1), (20, 2),
            (30, 2), (30, 3),
            (40, 9)]                              # singleton: no pair
    tbl = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    sf = _write(tmp_path, "lineitem", tbl)
    got = copurchase_part_pairs(sf)
    want = pd.DataFrame({
        "p1": [1, 2, 1], "p2": [2, 3, 3], "n_orders": [2, 2, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ohlc_tie_and_merge_planted(ray_session, tmp_path):
    """Timestamp tie at the open broken by event_id; null value dropped;
    one bar per (type, day) with hand-computed endpoints."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        events_ohlc_daily,
    )

    t0 = np.datetime64("2026-03-01T09:00:00", "us")
    m = np.timedelta64(1, "m")
    rows = [  # (eid, ts, type, value)
        (2, t0, "a", 5.0),          # ts tie with eid 1 → NOT the open
        (1, t0, "a", 3.0),          # open = 3.0 (same ts, lower eid)
        (3, t0 + m, "a", 9.5),      # high
        (4, t0 + 2 * m, "a", None), # null: excluded everywhere
        (5, t0 + 3 * m, "a", 1.25), # low + close
        (6, t0, "b", 2.0),          # singleton bar: o=h=l=c
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    sf = _write(tmp_path, "events", tbl)
    got = events_ohlc_daily(sf)
    want = pd.DataFrame({
        "event_type": ["a", "b"], "day": ["2026-03-01", "2026-03-01"],
        "open": [3.0, 2.0], "high": [9.5, 2.0], "low": [1.25, 2.0],
        "close": [1.25, 2.0], "n": [4, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_value_streak_planted(ray_session, tmp_path):
    """u1: 1,2,3 then drop then 5,6 → best 3; equal values break (u2:
    2,2 → 1); nulls are invisible (u3: 1,null,2 → 2); ts tie broken by
    event_id (u4: values 7 then 3 at the same ts → streak 1)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        value_streak_histogram,
    )

    t0 = np.datetime64("2026-04-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [  # (user, eid, ts, value)
        (1, 1, t0, 1.0), (1, 2, t0 + s, 2.0), (1, 3, t0 + 2 * s, 3.0),
        (1, 4, t0 + 3 * s, 0.5), (1, 5, t0 + 4 * s, 5.0),
        (1, 6, t0 + 5 * s, 6.0),
        (2, 7, t0, 2.0), (2, 8, t0 + s, 2.0),
        (3, 9, t0, 1.0), (3, 10, t0 + s, None), (3, 11, t0 + 2 * s, 2.0),
        (4, 12, t0, 7.0), (4, 13, t0, 3.0),     # same ts: eid orders them
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    sf = _write(tmp_path, "events", tbl)
    got = value_streak_histogram(sf)
    want = pd.DataFrame({"streak": [1, 2, 3], "n_users": [2, 1, 1]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------- rolling z-score anomaly flags


def test_rolling_zscore_matches_bigint_bruteforce(ray_session, tmp_path):
    """Random small-spread integer cents (boundary collisions plausible)
    checked row-for-row against a Python-bigint brute force of the exact
    integer test, including the n >= 8 history gate, the 20-row window
    cap, and the zero-variance window (any deviation flags)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        rolling_zscore_events,
    )

    rng = np.random.default_rng(11)
    t0 = np.datetime64("2026-05-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = []
    eid = 0
    for u in range(1, 6):
        n_ev = int(rng.integers(5, 40))
        for i in range(n_ev):
            eid += 1
            rows.append((u, eid, t0 + i * s,
                         float(rng.integers(995, 1006)) / 100.0))
    # u6: 20 constant values then a 1-cent deviation → zero-variance flag
    for i in range(21):
        eid += 1
        rows.append((6, eid, t0 + i * s, 10.0 if i < 20 else 10.01))
    # null-ts rows are invisible on both sides (NULLS LAST vs NaT-first)
    eid += 1
    rows.append((6, eid, None, 999.0))
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    sf = _write(tmp_path, "events", tbl)
    got = rolling_zscore_events(sf)

    expect = []
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    df = df[df["ts"].notna()]
    for u, g in df.sort_values(["user_id", "ts", "event_id"]).groupby(
            "user_id"):
        cents = [int(round(v * 100)) for v in g["value"]]
        eids = g["event_id"].tolist()
        for i in range(len(cents)):
            w = cents[max(0, i - 20):i]
            n, c = len(w), cents[i]
            if n < 8:
                continue
            S, SS = sum(w), sum(v * v for v in w)
            if (n * c - S) ** 2 * (n - 1) > 9 * n * (n * SS - S * S):
                expect.append((u, eids[i], n))
    want = pd.DataFrame(expect, columns=["user_id", "event_id", "n_window"])
    assert len(want) > 0  # the planted u6 spike at minimum
    assert (6, eid - 1, 20) in expect  # zero-variance window flags 1 cent
    assert not any(e[1] == eid for e in expect)  # null-ts row invisible
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ----------------------------------------------- incremental exact dedup


def test_incremental_dedup_planted_duplicates(ray_session, tmp_path):
    """Delta docs (doc_id % 5 == 4) anti-joined against the base: an
    exact copy of a base text is dropped, a delta-only duplicate pair is
    NOT dropped (both rows return — the historical index, not the shard,
    is the dedup authority), and unique delta docs return."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        incremental_exact_dedup,
    )

    docs = [
        (1, "en", "base text one"), (2, "en", "base text two"),
        (3, "de", "base text three"), (5, "en", "more base"),
        (4, "en", "base text one"),      # delta, dup of base doc 1 → drop
        (9, "de", "fresh delta nine"),   # delta, unique → keep
        (14, "fr", "delta twin"),        # delta dup of delta → BOTH keep
        (19, "fr", "delta twin"),
        (6, "en", None),                 # base null text blocks nothing
        (24, "zh", None),                # delta null text is always new
    ]
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "lang": pa.array([d[1] for d in docs], pa.string()),
        "text": pa.array([d[2] for d in docs], pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)
    got = incremental_exact_dedup(sf)
    want = pd.DataFrame({"doc_id": [9, 14, 19, 24],
                         "lang": ["de", "fr", "fr", "zh"]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --------------------------------------------------- trimmed mean (5%)


def test_trimmed_mean_histogram_equals_rank_trim(ray_session, tmp_path):
    """Heavy-tie random prices: the histogram trim must equal a
    rank-based trim (sort, drop n//20 per tail) computed in Python
    bigints, nation by nation, including the exact floor-division mean."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        nation_trimmed_mean,
    )

    rng = np.random.default_rng(23)
    nations = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["NA", "NB"], pa.string()),
    })
    cust = pa.table({
        "c_custkey": pa.array(list(range(1, 21)), pa.int64()),
        "c_nationkey": pa.array([i % 2 for i in range(1, 21)], pa.int64()),
    })
    n_orders = 300
    ok = list(range(1, n_orders + 1))
    ck = [int(rng.integers(1, 21)) for _ in ok]
    # few distinct cents → massive ties across the trim boundary
    cents = [int(rng.integers(1, 8)) * 25 for _ in ok]
    orders = pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_custkey": pa.array(ck, pa.int64()),
        "o_totalprice": pa.array([c / 100.0 for c in cents], pa.float64()),
    })
    sf = str(tmp_path)
    pq.write_table(nations, tmp_path / "nation.parquet")
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")

    got = nation_trimmed_mean(sf)

    # c_custkey k has c_nationkey k % 2 per the table above → even = NA
    nat_of = {k: ("NA" if k % 2 == 0 else "NB") for k in range(1, 21)}
    by_nation = {}
    for k, c in zip(ck, cents):
        by_nation.setdefault(nat_of[k], []).append(c)
    expect = []
    for name in sorted(by_nation):
        vals = sorted(by_nation[name])
        n = len(vals)
        k = n // 20
        kept = vals[k:n - k]
        micro = (sum(kept) * 10000) // len(kept)
        expect.append((name, n, len(kept), micro / 1000000.0))
    want = pd.DataFrame(expect, columns=["n_name", "n_orders", "n_kept",
                                         "trimmed_mean"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --------------------------------------------------------- token PMI


def test_token_pmi_planted_collocation(ray_session, tmp_path):
    """A planted always-together pair must rank above a frequent but
    independent pair, with exact integer counts and the exact ratio."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        token_pmi_top20,
    )

    texts = (["qq zz"] * 6                      # rare pair, always together
             + ["the cat"] * 5 + ["the dog"] * 3   # frequent, split targets
             + ["filler words here"] * 3)
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "text": pa.array(texts, pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)
    got = token_pmi_top20(sf)

    n_total = sum(len(t.split()) for t in texts)
    top = got.iloc[0]
    assert top["bigram"] == "qq zz"
    assert top["n_xy"] == 6 and top["n_x"] == 6 and top["n_y"] == 6
    assert top["pmi_ratio"] == round(n_total * 6 / 36, 6)
    # 'the cat' survives min-support with correct marginals, ranked below
    # the collocation; 'the dog' (n_xy = 3) is filtered by min-support
    row = got[got["bigram"] == "the cat"].iloc[0]
    assert row["n_xy"] == 5 and row["n_x"] == 8 and row["n_y"] == 5
    assert row["pmi_ratio"] < top["pmi_ratio"]
    assert (got["bigram"] == "the dog").sum() == 0


# -------------------------------------------- near-dup representatives


def test_near_dup_representatives_planted(ray_session, tmp_path):
    """A 3-doc near-identical cluster plus a 2-doc cluster plus uniques:
    component labels are the min doc_id, the representative is the
    engine's own quality_score argmax (tie → lowest doc_id), and unique
    docs never appear."""
    from approximate_anomaly_detection_in_data_streams_ray.functions.text import (
        quality_score,
    )
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        near_dup_representatives,
    )

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet forest until the morning light "
            "arrives over the hills ") * 4
    docs = [
        (1, base),                       # cluster {1,2,3}
        (2, base + "extra tail words here"),
        (3, base + "another small difference added"),
        (10, "completely different unique text about database engines "
             "and distributed query processing at large scale " * 6),
        (20, ("pack my box with five dozen liquor jugs while the band "
              "plays on and the crowd cheers loudly tonight ") * 5),
        (21, ("pack my box with five dozen liquor jugs while the band "
              "plays on and the crowd cheers loudly tonight ") * 5 + "!!"),
    ]
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)
    got = near_dup_representatives(sf)

    q = {d[0]: round(float(quality_score(pa.array([d[1]]))[0].as_py()), 4)
         for d in docs}
    rep1 = max([1, 2, 3], key=lambda i: (q[i], -i))
    rep2 = max([20, 21], key=lambda i: (q[i], -i))
    want = pd.DataFrame({
        "cluster": [1, 20],
        "rep_doc_id": [rep1, rep2],
        "quality": [q[rep1], q[rep2]],
        "n_members": [3, 2],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert 10 not in set(got["rep_doc_id"])


# ------------------------------------------------- gap-filled dense series


def test_events_hourly_dense_fills_gaps(ray_session, tmp_path):
    """A 3-hour corpus with a silent middle hour and a type active only
    at the edges: every (type, hour) cell exists, zeros where silent."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        events_hourly_dense,
    )

    h = np.datetime64("2026-06-01T00:00:00", "us")
    hr = np.timedelta64(1, "h")
    rows = [("a", h), ("a", h), ("a", h + 2 * hr),      # a silent in hour 1
            ("b", h + 2 * hr)]                          # b only in hour 2
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    sf = _write(tmp_path, "events", tbl)
    got = events_hourly_dense(sf)
    want = pd.DataFrame({
        "event_type": ["a"] * 3 + ["b"] * 3,
        "hour": list(pd.DatetimeIndex([h, h + hr, h + 2 * hr])) * 2,
        "n": [2, 0, 1, 0, 0, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --------------------------------------------------------- Count-Min sketch


def test_cms_linearity_and_bound():
    """Partial CMS matrices merged by addition equal the one-shot sketch;
    estimates never under-count and respect the e/w additive bound."""
    import collections

    from approximate_anomaly_detection_in_data_streams_ray.functions.sketches import (
        CountMinSketch,
    )

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 3000, 80000)
    whole = CountMinSketch().add(keys)
    merged = CountMinSketch().add(keys[:17000]).merge(
        CountMinSketch().add(keys[17000:]))
    assert (whole.table == merged.table).all() and whole.n == merged.n

    exact = collections.Counter(keys.tolist())
    probe = np.array(sorted(exact)[:500])
    est = whole.estimate(probe)
    ex = np.array([exact[k] for k in probe])
    assert (est >= ex).all()
    assert (est <= ex + whole.error_bound()).all()
    # round-trip through bytes (the map_batches partial format)
    rt = CountMinSketch.from_bytes(whole.to_bytes(), n=whole.n)
    assert (rt.estimate(probe) == est).all()


def test_cms_query_self_verifies(ray_session):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        cms_user_event_counts,
    )

    out = cms_user_event_counts("/root/testdata/sf0.001")
    assert list(out.columns) == ["user_id", "exact_n", "cms_n",
                                 "err_bound", "within_bound"]
    assert len(out) == 10 and bool(out["within_bound"].all())
    assert (out["cms_n"] >= out["exact_n"]).all()


# ----------------------------------------------------- langid confusion


def test_langid_confusion_kappa_planted(ray_session, tmp_path):
    """A corpus with known detections: 2 en docs detected en, 1 de doc
    detected en (miss), 1 de detected de → matrix and kappa computed by
    hand match."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        langid_confusion,
    )

    docs = [
        ("en", "the cat and the dog is in the house for fun"),
        ("en", "this is the best of all, to be sure, with luck"),
        ("de", "the train is late and the driver is angry with us"),  # miss
        ("de", "der zug ist spaet und der fahrer ist nicht froh"),
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "lang": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)
    got = langid_confusion(sf)

    # matrix: (en,en)=2, (de,en)=1, (de,de)=1; N=4, diag=3
    # rows: en=2, de=2; cols: en=3, de=1; pe=(2*3+2*1)/16=0.5; po=0.75
    kappa = round((0.75 - 0.5) / (1 - 0.5), 6)
    want = pd.DataFrame({
        "lang": ["de", "de", "en"],
        "detected": ["de", "en", "en"],
        "n": [1, 1, 2],
        "kappa": [kappa] * 3,
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --------------------------------------------------- SCD2 interval build


def test_user_value_intervals_planted(ray_session, tmp_path):
    """Intervals chain per user in (ts, event_id) order; the last row per
    user stays open (NaT); non-purchase rows are invisible; a ts tie is
    broken by event_id."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        user_value_intervals,
    )

    t0 = np.datetime64("2026-07-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [  # (user, eid, ts, type, value)
        (1, 1, t0, "purchase", 5.0),
        (1, 2, t0 + s, "view", 0.0),          # invisible
        (1, 3, t0 + 2 * s, "purchase", 7.0),
        (2, 4, t0, "purchase", 1.0),          # ts tie with eid 5
        (2, 5, t0, "purchase", 2.0),
        (2, 6, None, "purchase", 9.0),        # null ts: invisible
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    sf = _write(tmp_path, "events", tbl)
    got = user_value_intervals(sf)
    want = pd.DataFrame({
        "user_id": [1, 1, 2, 2],
        "event_id": [1, 3, 4, 5],
        "valid_from": pd.Series([t0, t0 + 2 * s, t0, t0],
                                dtype="datetime64[us]"),
        "valid_to": pd.Series([t0 + 2 * s, np.datetime64("NaT"), t0,
                               np.datetime64("NaT")],
                              dtype="datetime64[us]"),
        "value": [5.0, 7.0, 1.0, 2.0],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------- grouped top-k / sample


def test_top_tokens_per_lang_planted(ray_session, tmp_path):
    """Known counts with a count tie broken by token text; per-lang
    top-5 cut respected."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        top_tokens_per_lang,
    )

    docs = [
        ("en", "aa aa aa bb bb cc dd ee ff gg"),   # 7 distinct, top-5 cut
        ("de", "xx yy xx yy zz"),                  # tie xx=yy=2 → token order
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "lang": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)
    got = top_tokens_per_lang(sf)
    want = pd.DataFrame({
        "lang": ["de", "de", "de", "en", "en", "en", "en", "en"],
        "token": ["xx", "yy", "zz", "aa", "bb", "cc", "dd", "ee"],
        "n": [2, 2, 1, 3, 2, 1, 1, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hash_sample_events_matches_bruteforce_md5(ray_session, tmp_path):
    """The admitted set is exactly the rows whose md5(event_id) first two
    hex chars are <= '0c' — checked against hashlib directly."""
    import hashlib

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        hash_sample_events,
    )

    n = 4000
    ts = np.datetime64("2026-08-01T00:00:00", "us")
    tbl = pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array([ts] * n, pa.timestamp("us")),
        "event_type": pa.array(["a" if i % 2 else "b"
                                for i in range(1, n + 1)], pa.string()),
        "value": pa.array([round(i * 0.07, 2) for i in range(1, n + 1)],
                          pa.float64()),
    })
    sf = _write(tmp_path, "events", tbl)
    got = hash_sample_events(sf)

    rows = {}
    for i in range(1, n + 1):
        if hashlib.md5(str(i).encode()).hexdigest()[:2] <= "0c":
            et = "a" if i % 2 else "b"
            c = int(round(round(i * 0.07, 2) * 100))
            cur = rows.setdefault(et, [0, 0])
            cur[0] += 1
            cur[1] += c
    want = pd.DataFrame(
        [(et, v[0], v[1] / 100.0) for et, v in sorted(rows.items())],
        columns=["event_type", "n_sampled", "sum_value"])
    assert want["n_sampled"].sum() > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------- distributed k-means


def test_kmeans_recovers_planted_blobs(ray_session, tmp_path):
    """Three well-separated blobs, k=3: recovered cluster sizes equal the
    blob sizes and inertia is non-increasing across iterations."""
    import ray as _ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.ann import (
        kmeans_fit,
    )

    rng = np.random.default_rng(13)
    centers = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    sizes = [40, 25, 35]
    vecs, ids = [], []
    vid = 0
    for c, sz in zip(centers, sizes):
        for _ in range(sz):
            vid += 1
            vecs.append((c + rng.normal(0, 0.3, 3)).astype(np.float32))
            ids.append(vid)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    sf = _write(tmp_path, "embeddings", tbl)
    ds = _ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))
    C, counts, hist = kmeans_fit(ds, k=3, iters=6)

    assert sorted(counts.tolist()) == sorted(sizes)
    assert all(b <= a * (1 + 1e-9) + 1e-9 for a, b in zip(hist, hist[1:]))
    # every centroid sits on one planted center (within blob noise)
    d = np.linalg.norm(C[:, None, :] - centers[None, :, :], axis=2).min(1)
    assert (d < 1.0).all()


def test_kmeans_rejects_ragged_embeddings(ray_session, tmp_path):
    import ray as _ray

    from approximate_anomaly_detection_in_data_streams_ray.stages.ann import (
        kmeans_fit,
    )

    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [3.0], [4.0, 5.0]],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    ds = _ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))
    with pytest.raises(Exception, match="ragged"):
        kmeans_fit(ds, k=2, iters=1)


# ------------------------------------------------------- lexical search


def test_search_tfidf_ranks_planted_relevant_doc(ray_session, tmp_path):
    """A doc stuffed with all four query tokens outranks single-token
    docs; an unrelated doc never appears; rarer tokens weigh more."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        search_documents_tfidf,
    )

    docs = [
        (1, "data stream processing window data stream"),  # all 4 → top
        (2, "data data data only here"),
        (3, "window seat on the train"),
        (4, "completely unrelated text about gardening"),
        (5, "stream processing notes"),
    ]
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)
    got = search_documents_tfidf(sf)
    assert got["doc_id"].iloc[0] == 1
    assert 4 not in set(got["doc_id"])
    assert set(got["doc_id"]) == {1, 2, 3, 5}


# ------------------------------------------------ property-based kernels


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 20),
                          st.integers(0, 10**6)),
                min_size=1, max_size=200))
def test_user_sorted_segments_property(rows):
    """For random (user, ts, eid) triples: the scaffold's order equals the
    lexicographic sort, and seg_start[i] is the first sorted index of
    row i's user."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        _user_sorted_segments,
    )

    users = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    eid = np.array([r[2] for r in rows], dtype=np.int64)
    order, seg_start = _user_sorted_segments(users, ts, eid)

    triples = sorted(range(len(rows)),
                     key=lambda i: (users[i], ts[i], eid[i]))
    u_sorted = users[order]
    assert (u_sorted == users[np.array(triples)]).all()
    first_of = {}
    for i, u in enumerate(u_sorted):
        first_of.setdefault(int(u), i)
    assert all(seg_start[i] == first_of[int(u_sorted[i])]
               for i in range(len(u_sorted)))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=500),
       st.integers(0, 500))
def test_cms_properties(keys, split):
    """For any key multiset and any split point: partial-merge equals
    one-shot, estimates never under-count, and the additive bound holds."""
    import collections

    from approximate_anomaly_detection_in_data_streams_ray.functions.sketches import (
        CountMinSketch,
    )

    keys = np.array(keys, dtype=np.int64)
    split = min(split, len(keys))
    whole = CountMinSketch(depth=3, width=256).add(keys)
    merged = CountMinSketch(depth=3, width=256).add(keys[:split]).merge(
        CountMinSketch(depth=3, width=256).add(keys[split:]))
    assert (whole.table == merged.table).all() and whole.n == merged.n

    exact = collections.Counter(keys.tolist())
    probe = np.array(sorted(exact))
    est = whole.estimate(probe)
    ex = np.array([exact[k] for k in probe])
    assert (est >= ex).all()
    assert (est <= ex + whole.error_bound()).all()


# -------------------------------------------- sharded-directory table input


def test_sharded_table_dir_equals_single_file(ray_session, tmp_path):
    """A table given as a DIRECTORY of shards (the 100-TB input layout
    `_table_paths` documents) produces byte-identical query results to
    the same rows in one file."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        doc_stats,
        exact_dedup_documents,
    )

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    single = tmp_path / "single"
    sharded = tmp_path / "sharded"
    single.mkdir(), sharded.mkdir()
    pq.write_table(src, single / "documents.parquet")
    shard_dir = sharded / "documents.parquet"
    shard_dir.mkdir()
    n = src.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3),
                                  (2 * n // 3, n)]):
        pq.write_table(src.slice(lo, hi - lo),
                       shard_dir / f"part-{i:03d}.parquet")

    for q in (doc_stats, exact_dedup_documents):
        a = q(str(single))
        b = q(str(sharded))
        a = a.to_pandas() if hasattr(a, "to_pandas") else a
        b = b.to_pandas() if hasattr(b, "to_pandas") else b
        pd.testing.assert_frame_equal(pd.DataFrame(a), pd.DataFrame(b),
                                      check_dtype=False)


# ------------------------------------------------- triangle counting


def _planted_lineitem(tmp_path):
    """Baskets whose co-purchase graph has a hand-countable triangle set:
    K4 over parts {1,2,3,4} (4 triangles) from basket A∪B, one extra
    triangle {5,6,7}, and a dangling path 7–8–9 (no triangle).  Edges are
    planted via 2-item baskets so edge multiplicity ≠ 1 too (dup pair
    1–2)."""
    baskets = [
        (100, [1, 2, 3]), (101, [1, 4, 2]), (102, [3, 4]),
        (103, [1, 3]),                       # dup edges inside K4
        (104, [2, 4]), (105, [5, 6, 7]), (106, [7, 8]), (107, [8, 9]),
        (108, [1, 2]),                       # duplicate of edge 1-2
    ]
    ok, pk = [], []
    for o, parts in baskets:
        for p in parts:
            ok.append(o), pk.append(p)
    tbl = pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    return str(tmp_path)


def test_triangle_count_planted_both_routes(ray_session, tmp_path):
    """K4 (4 triangles) + one separate triangle = 5; the broadcast route
    and the bucketed-exchange route must agree with the hand count and
    with each other."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        triangle_count_copurchase,
    )

    sf = _planted_lineitem(tmp_path)
    a = triangle_count_copurchase(sf).iloc[0]
    b = triangle_count_copurchase(sf, broadcast_max_edges=1).iloc[0]
    for got in (a, b):
        assert int(got["n_triangles"]) == 5
        assert int(got["n_nodes"]) == 9
        # K4 (6) + triangle 5-6-7 (3) + path edges 7-8, 8-9
        assert int(got["n_edges"]) == 11


def test_triangle_count_matches_bruteforce_on_random_graph(ray_session,
                                                           tmp_path):
    """Random baskets vs an O(n^3)-ish numpy adjacency-matrix-cube oracle:
    trace(A³)/6 counts each triangle exactly once."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        triangle_count_copurchase,
    )

    rng = np.random.default_rng(11)
    ok, pk = [], []
    for o in range(120):
        parts = rng.choice(30, size=rng.integers(2, 6), replace=False)
        for p in parts:
            ok.append(1000 + o), pk.append(int(p) + 1)
    tbl = pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                    "l_partkey": pa.array(pk, pa.int64())})
    pq.write_table(tbl, tmp_path / "lineitem.parquet")

    got = triangle_count_copurchase(str(tmp_path)).iloc[0]

    nodes = sorted(set(pk))
    idx = {p: i for i, p in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), np.int64)
    basket = {}
    for o, p in zip(ok, pk):
        basket.setdefault(o, set()).add(p)
    for parts in basket.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                A[idx[ps[i]], idx[ps[j]]] = A[idx[ps[j]], idx[ps[i]]] = 1
    want = int(np.trace(A @ A @ A)) // 6
    assert int(got["n_triangles"]) == want
    assert int(got["n_edges"]) == int(A.sum()) // 2
    assert int(got["n_nodes"]) == int((A.sum(axis=0) > 0).sum())


# ------------------------------------------------- time-weighted average


def test_user_value_twap_planted(ray_session, tmp_path):
    """Hand-computed TWAP: user 1 holds 1.00 for 10 s then 3.00 for 30 s
    → (100·10 + 300·30)/40 = 250 cents = 2.5 → twap_micro 2_500_000.
    User 2 has one event (no weight) and user 3's events share one
    timestamp (den = 0): both excluded.  A tie at user 1's second ts
    checks the (ts, event_id) ordering: the tie row gets zero gap either
    way, so the answer is order-independent — but its value must not leak
    into a wrong slot."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        user_value_twap,
    )

    t0 = np.datetime64("2026-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")
    rows = [
        (1, 1, t0, 1.00),
        (2, 1, t0 + 10 * s, 3.00),
        (3, 1, t0 + 10 * s, 9.99),   # ts tie → zero-weight by event_id order
        (4, 1, t0 + 40 * s, 7.00),   # final observation: carries no weight
        (5, 2, t0, 5.00),
        (6, 3, t0 + 5 * s, 1.00),
        (7, 3, t0 + 5 * s, 2.00),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = user_value_twap(str(tmp_path)).to_pandas()
    got = got.sort_values("user_id").reset_index(drop=True)
    assert len(got) == 1
    r = got.iloc[0]
    # 100c·10s + 300c·0s (tie) + 999c·30s over 40 s = (1000+29970)/40
    want_micro = (100 * 10_000_000 + 999 * 30_000_000) * 10000 // 40_000_000
    assert int(r["user_id"]) == 1
    assert int(r["n_events"]) == 4
    assert int(r["span_us"]) == 40_000_000
    assert int(r["twap_micro"]) == want_micro


def test_user_value_twap_rejects_negative_values(ray_session, tmp_path):
    """Negative values void the floor-vs-truncate division parity and must
    raise loudly instead of silently diverging from the SQL oracle."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        user_value_twap,
    )

    t0 = np.datetime64("2026-01-01T00:00:00", "us")
    tbl = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([t0, t0 + np.timedelta64(1, "s")], pa.timestamp("us")),
        "value": pa.array([-1.0, 2.0], pa.float64()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    with pytest.raises(Exception, match="negative"):
        user_value_twap(str(tmp_path)).to_pandas()


# ------------------------------------------------- fixed-point PageRank


def test_pagerank_matches_pure_python_fixed_point(ray_session, tmp_path):
    """Random basket graph vs an independent dict-and-loop Python-bigint
    implementation of the same fixed-point recurrence — proves the
    distributed scatter-add + driver fold computes the recurrence exactly
    (not approximately)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        _PAGERANK_SCALE,
        pagerank_copurchase,
    )

    rng = np.random.default_rng(23)
    ok, pk = [], []
    for o in range(80):
        parts = rng.choice(25, size=rng.integers(2, 5), replace=False)
        for p in parts:
            ok.append(2000 + o), pk.append(int(p) + 1)
    tbl = pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                    "l_partkey": pa.array(pk, pa.int64())})
    pq.write_table(tbl, tmp_path / "lineitem.parquet")

    got = pagerank_copurchase(str(tmp_path), top=1000)

    # independent oracle: adjacency dicts, Python ints, no numpy
    adj = {}
    baskets = {}
    for o, p in zip(ok, pk):
        baskets.setdefault(o, set()).add(p)
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                adj.setdefault(ps[i], set()).add(ps[j])
                adj.setdefault(ps[j], set()).add(ps[i])
    n = len(adj)
    r = {v: _PAGERANK_SCALE // n for v in adj}
    for _ in range(5):
        c = {v: r[v] // len(adj[v]) for v in adj}
        r = {v: (15 * _PAGERANK_SCALE) // (100 * n)
                + (85 * sum(c[u] for u in adj[v])) // 100
             for v in adj}
    want = pd.DataFrame(sorted(r.items()),
                        columns=["node", "rank_fp"]).astype("int64")
    got = got.sort_values("node").reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_pagerank_star_center_wins(ray_session, tmp_path):
    """On a star (hub in every basket, leaves never co-occur without it),
    the hub must rank first and all leaves must tie exactly — integer
    arithmetic makes 'tie' a hard equality, not an approximation."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        pagerank_copurchase,
    )

    ok, pk = [], []
    for i, leaf in enumerate(range(2, 10)):
        ok += [3000 + i, 3000 + i]
        pk += [1, leaf]
    tbl = pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                    "l_partkey": pa.array(pk, pa.int64())})
    pq.write_table(tbl, tmp_path / "lineitem.parquet")

    got = pagerank_copurchase(str(tmp_path), top=100)
    assert int(got.iloc[0]["node"]) == 1
    leaf_ranks = got[got["node"] != 1]["rank_fp"].to_numpy()
    assert len(leaf_ranks) == 8
    assert (leaf_ranks == leaf_ranks[0]).all()
    assert int(got.iloc[0]["rank_fp"]) > int(leaf_ranks[0])


# ------------------------------------------------- skew-aware hybrid join


def test_skew_hybrid_join_routings_agree_on_planted_skew(ray_session,
                                                         tmp_path):
    """One part carries 60% of all lineitems (the hot key), the tail is
    uniform: pure-shuffle (hot_k=0), hybrid (hot_k=1 — exactly the hot
    key bypasses), and pure-broadcast (hot_k=10^9) must all equal the
    pandas join oracle row-for-row."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        skew_hybrid_join_brand_revenue,
    )

    rng = np.random.default_rng(31)
    n_tail, n_hot = 400, 600
    pk = np.r_[rng.integers(2, 40, size=n_tail), np.full(n_hot, 1)]
    price = np.round(rng.uniform(10, 99, size=n_tail + n_hot), 2)
    disc = np.round(rng.choice([0.0, 0.05, 0.1], size=n_tail + n_hot), 2)
    pq.write_table(pa.table({
        "l_partkey": pa.array(pk, pa.int64()),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array(disc, pa.float64()),
    }), tmp_path / "lineitem.parquet")
    parts = np.arange(1, 40)
    pq.write_table(pa.table({
        "p_partkey": pa.array(parts, pa.int64()),
        "p_brand": pa.array([f"Brand#{1 + p % 5}" for p in parts],
                            pa.string()),
    }), tmp_path / "part.parquet")

    brand = np.array([f"Brand#{1 + p % 5}" for p in pk])
    myr = np.round(price * (1 - disc) * 10000).astype(np.int64)
    want = (pd.DataFrame({"p_brand": brand, "myr": myr})
            .groupby("p_brand", as_index=False)
            .agg(n_items=("myr", "size"), rev_myriad=("myr", "sum")))
    want = pd.DataFrame({
        "p_brand": want["p_brand"],
        "n_items": want["n_items"].astype("int64"),
        "revenue": (want["rev_myriad"] / 10000.0).round(4),
    }).sort_values("p_brand").reset_index(drop=True)

    for hot_k in (0, 1, 10 ** 9):
        got = skew_hybrid_join_brand_revenue(str(tmp_path), hot_k=hot_k)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------- exact KS + LOCF imputation


def test_ks_statistic_matches_scipy_style_bruteforce(ray_session, tmp_path):
    """Planted two-sample data vs a direct rational-arithmetic sup over
    the pooled support — including a shifted distribution where the KS
    statistic is large and known."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        value_ks_between_types,
    )

    rng = np.random.default_rng(41)
    a = np.round(rng.uniform(1, 10, 300), 2)          # click ~ U(1,10)
    b = np.round(rng.uniform(5, 14, 200), 2)          # purchase shifted +4
    et = ["click"] * 300 + ["purchase"] * 200
    vals = np.r_[a, b]
    t0 = np.datetime64("2026-01-01", "us")
    tbl = pa.table({
        "event_id": pa.array(np.arange(500), pa.int64()),
        "ts": pa.array([t0] * 500, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(500), pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(vals, pa.float64()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = value_ks_between_types(str(tmp_path)).iloc[0]

    ac = np.sort(np.round(a * 100).astype(np.int64))
    bc = np.sort(np.round(b * 100).astype(np.int64))
    support = np.unique(np.r_[ac, bc])
    ca = np.searchsorted(ac, support, side="right")
    cb = np.searchsorted(bc, support, side="right")
    want_num = int(np.abs(ca * len(bc) - cb * len(ac)).max())
    assert int(got["ks_num"]) == want_num
    assert int(got["n_a"]) == 300 and int(got["n_b"]) == 200
    assert int(got["ks_micro"]) == want_num * 1_000_000 // (300 * 200)
    # the shift makes the distributions very different: KS > 0.3
    assert int(got["ks_micro"]) > 300_000


def test_hourly_locf_forward_fills_and_flags(ray_session, tmp_path):
    """Three observed hours with a two-hour gap: the gap hours carry the
    last observation and are flagged imputed; hours before the first
    observation stay NULL and unflagged; a same-hour tie resolves to the
    larger (ts, event_id)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        hourly_locf_value,
    )

    h = np.timedelta64(3600, "s")
    t0 = np.datetime64("2026-03-01T00:00:00", "us")
    rows = [
        # (event_id, ts, type, value)
        (1, t0 + 2 * h, "click", 1.00),
        (2, t0 + 2 * h, "click", 2.00),     # same hour+ts → larger id wins
        (3, t0 + 5 * h, "click", 9.00),
        (4, t0 + 0 * h, "view", 4.00),      # fixes the global spine start
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([0] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = hourly_locf_value(str(tmp_path))
    click = got[got["event_type"] == "click"].set_index("hour")
    base = int(np.datetime64("2026-03-01T00:00:00").astype(
        "datetime64[h]").astype(np.int64))
    # hours 0-1: before first click observation → NULL, not imputed
    assert np.isnan(click.loc[base + 0, "cents"])
    assert not bool(click.loc[base + 0, "is_imputed"])
    # hour 2: tie resolved to event_id 2 → 200 cents, observed
    assert click.loc[base + 2, "cents"] == 200.0
    assert not bool(click.loc[base + 2, "is_imputed"])
    # hours 3-4: carried forward + flagged
    assert click.loc[base + 3, "cents"] == 200.0
    assert bool(click.loc[base + 3, "is_imputed"])
    assert click.loc[base + 4, "cents"] == 200.0
    # hour 5: new observation
    assert click.loc[base + 5, "cents"] == 900.0
    assert not bool(click.loc[base + 5, "is_imputed"])


# ------------------------------------------- signup → purchase latency


def test_signup_purchase_latency_keeps_qualifying_later_purchase(
        ray_session, tmp_path):
    """The trap the raw-purchase exchange exists for: user 1 purchases
    BEFORE signing up and again after — a per-batch min-purchase partial
    would keep only the pre-signup purchase and silently drop the user.
    User 2 has no post-signup purchase; user 3 is the plain case."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        signup_purchase_latency,
    )

    day = 86_400_000_000
    base = pd.Timestamp("2024-01-01").value // 1000
    rows = [
        # user 1: purchase(d0) < signup(d1) < purchase(d4) → lag 3
        (1, base + 0 * day, "purchase"),
        (1, base + 1 * day, "signup"),
        (1, base + 4 * day, "purchase"),
        # user 2: purchase strictly before signup only → excluded
        (2, base + 0 * day, "purchase"),
        (2, base + 2 * day, "signup"),
        # user 3: signup(d0) then purchase same µs (lag 0) and later
        (3, base + 0 * day, "signup"),
        (3, base + 0 * day, "purchase"),
        (3, base + 9 * day, "purchase"),
        # user 4: purchases only → excluded
        (4, base + 1 * day, "purchase"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    sf = _write(tmp_path, "events", tbl)

    got = signup_purchase_latency(sf).reset_index(drop=True)
    want = pd.DataFrame({"lag_days": [0, 3], "n_users": [1, 1]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------- source vocab jaccard


def test_source_vocab_jaccard_planted_overlap(ray_session, tmp_path):
    """Three sources with hand-countable vocabularies: A={x,y,z},
    B={y,z,w}, C={q}.  Repeated tokens inside a source must not inflate
    set sizes; the disjoint pair must report n_inter=0 with the right
    union."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        source_vocab_jaccard,
    )

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["x y z y", "y z w", "q q q", "z"], pa.string()),
        "source": pa.array(["A", "B", "C", "A"], pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)

    got = source_vocab_jaccard(sf).reset_index(drop=True)
    want = pd.DataFrame({
        "src_a": ["A", "A", "B"],
        "src_b": ["B", "C", "C"],
        "n_inter": [2, 0, 0],
        "n_union": [4, 4, 4],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_source_vocab_jaccard_rejects_too_many_sources(ray_session,
                                                       tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        source_vocab_jaccard,
    )

    n = 70
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["tok"] * n, pa.string()),
        "source": pa.array([f"s{i:03d}" for i in range(n)], pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)
    with pytest.raises(ValueError, match="63 sources"):
        source_vocab_jaccard(sf)


# -------------------------------------------- duplicate transactions


def test_duplicate_transactions_window_and_dollar_buckets(ray_session,
                                                          tmp_path):
    """Chains inside/outside the 7-day window and cents that round into
    the same dollar: 10.99 and 10.01 share dollar bucket 10."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        duplicate_transactions,
    )

    day = 86_400_000_000
    base = pd.Timestamp("2024-01-01").value // 1000
    rows = [
        # user 1: three same-dollar purchases, consecutive gaps 6d and 8d
        # → first gap dups, second does not
        (1, base + 0 * day, "purchase", 10.99),
        (1, base + 6 * day, "purchase", 10.01),
        (1, base + 14 * day, "purchase", 10.50),
        # user 1, different dollar in between — must not break the chain
        (1, base + 1 * day, "purchase", 99.00),
        # user 2: same dollar, exactly 7d apart (inclusive) → dup
        (2, base + 0 * day, "purchase", 5.00),
        (2, base + 7 * day, "purchase", 5.75),
        # user 2: views with matching value never count
        (2, base + 7 * day, "view", 5.75),
        (2, base + 7 * day + 1, "view", 5.75),
    ]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    sf = _write(tmp_path, "events", tbl)

    got = duplicate_transactions(sf)
    assert int(got["n_dup_events"].iloc[0]) == 2
    assert int(got["n_users_with_dups"].iloc[0]) == 2
    assert int(got["max_dups_per_user"].iloc[0]) == 1


# ------------------------------------------------------ IQR outliers


def test_value_iqr_outliers_quantile_convention_and_fences(ray_session,
                                                           tmp_path):
    """Pins the inverted-CDF quantile convention (1-indexed ceil(q·n))
    and the doubled-unit Tukey fences against a Python-bigint oracle on
    small-n groups where conventions diverge the most."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        value_iqr_outliers,
    )
    import math

    rng = np.random.default_rng(11)
    rows = []
    for t_i, n in enumerate([1, 2, 3, 4, 5, 7, 12, 40]):
        xs = rng.integers(-200, 201, size=n)
        rows += [(f"t{t_i}", float(x) / 100.0) for x in xs]
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
    })
    sf = _write(tmp_path, "events", tbl)

    got = value_iqr_outliers(sf).reset_index(drop=True)

    expect = []
    df = pd.DataFrame(rows, columns=["event_type", "value"])
    for t_name, g in df.groupby("event_type"):
        c = sorted(int(round(v * 100)) for v in g["value"])
        n = len(c)
        q1 = c[max(math.ceil(0.25 * n), 1) - 1]
        q3 = c[max(math.ceil(0.75 * n), 1) - 1]
        lo2, hi2 = 2 * q1 - 3 * (q3 - q1), 2 * q3 + 3 * (q3 - q1)
        n_out = sum(1 for v in c if 2 * v < lo2 or 2 * v > hi2)
        expect.append((t_name, n, q1, q3, n_out))
    want = pd.DataFrame(expect, columns=[
        "event_type", "n", "q1_cents", "q3_cents", "n_outliers"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --------------------------------------------------------- cohort LTV


def test_cohort_ltv_planted_matrix(ray_session, tmp_path):
    """Two cohorts with hand-countable cells; a customer ordering twice
    in one month must count ONCE in that cell's n_customers."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        cohort_ltv,
    )

    def ts(y, m, d):
        return pd.Timestamp(f"{y:04d}-{m:02d}-{d:02d}").value // 1000

    rows = [
        # cust 1: cohort 2024-01, active months 0 and 2
        (1, ts(2024, 1, 5), 10.00),
        (1, ts(2024, 1, 20), 5.00),     # same month — one active customer
        (1, ts(2024, 3, 1), 7.00),
        # cust 2: cohort 2024-01, active month 0 only
        (2, ts(2024, 1, 31), 1.00),
        # cust 3: cohort 2024-02, active months 0 and 1
        (3, ts(2024, 2, 10), 2.00),
        (3, ts(2024, 3, 10), 3.00),
    ]
    mi_jan = 2024 * 12 + 0
    tbl = pa.table({
        "o_orderkey": pa.array(range(len(rows)), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    })
    sf = _write(tmp_path, "orders", tbl)

    got = cohort_ltv(sf).reset_index(drop=True)
    want = pd.DataFrame({
        "cohort_mi": [mi_jan, mi_jan, mi_jan + 1, mi_jan + 1],
        "month_offset": [0, 2, 0, 1],
        "revenue_cents": [1600, 700, 200, 300],
        "n_customers": [2, 1, 1, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------- session type pairs


def test_session_type_pairs_boundary(ray_session, tmp_path):
    """One user, two sessions split by a >30-min gap: types {A,B} then
    {B,C}; pair (A,C) must NOT co-occur."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        session_type_pairs,
    )

    mn = 60 * 1_000_000
    base = pd.Timestamp("2024-01-01").value // 1000
    rows = [
        (1, base + 0 * mn, "A"),
        (1, base + 10 * mn, "B"),
        (1, base + 20 * mn, "B"),
        (1, base + 20 * mn + 31 * mn, "B"),   # 31-min gap → new session
        (1, base + 52 * mn, "C"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    sf = _write(tmp_path, "events", tbl)

    got = session_type_pairs(sf).reset_index(drop=True)
    want = pd.DataFrame({
        "type_a": ["A", "A", "B"],
        "type_b": ["B", "C", "C"],
        "n_sessions": [1, 0, 1],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -------------------------------------------- trailing spend features


def test_trailing_spend_window_bounds(ray_session, tmp_path):
    """Pins the [d−90, d−1] frame: same-day orders excluded, day d−90
    included, day d−91 excluded; cross-customer isolation."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        trailing_spend_features,
    )

    def ts(day):
        return (pd.Timestamp("2024-01-01")
                + pd.Timedelta(days=day)).value // 1000

    rows = [
        # cust 1, priority P1: probe order at day 100
        (1, ts(9), 1.00, "P1"),     # day 100−91 → OUTSIDE
        (1, ts(10), 2.00, "P1"),    # day 100−90 → inside
        (1, ts(99), 4.00, "P1"),    # day 100−1  → inside
        (1, ts(100), 8.00, "P1"),   # same day   → excluded
        (1, ts(100), 16.00, "P1"),  # same day   → excluded
        # cust 2 same days must not leak into cust 1
        (2, ts(50), 100.00, "P2"),
        (2, ts(100), 1.00, "P2"),
    ]
    tbl = pa.table({
        "o_orderkey": pa.array(range(len(rows)), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
        "o_orderpriority": pa.array([r[3] for r in rows], pa.string()),
    })
    sf = _write(tmp_path, "orders", tbl)

    got = trailing_spend_features(sf).set_index("o_orderpriority")
    # P1 trailing sums per order (by day): d9→0, d10→100(d9? no: d9 is
    # 91 days before d100 but for the d10 order the window is
    # [−80, 9] → includes d9=100c) … compute explicitly:
    # d9: window [−81,8] → 0
    # d10: window [−80,9] → 100 (the d9 order)
    # d99: window [9,98] → d9(100)+d10(200) = 300
    # d100 ×2: window [10,99] → d10(200)+d99(400) = 600 each
    assert int(got.loc["P1", "sum_trailing_cents"]) == 0 + 100 + 300 + 1200
    assert int(got.loc["P1", "n_orders"]) == 5
    # P2: d50→0; d100: window [10,99] → d50(10000)
    assert int(got.loc["P2", "sum_trailing_cents"]) == 10000
    assert int(got.loc["P2", "n_orders"]) == 2


# --------------------------------------------------------- pareto


def test_revenue_pareto_tie_and_partial_group(ray_session, tmp_path):
    """Four customers with totals [40, 30, 30, 0]: 50% of 100 needs the
    40 + part of a 30 → k=2; 80% needs 40+30+30 exactly → k=3; 99% needs
    99 < 100 but the zero customer adds nothing → k=3."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        revenue_pareto,
    )

    rows = [(1, 0.40), (2, 0.30), (3, 0.30), (4, 0.00)]
    tbl = pa.table({
        "o_orderkey": pa.array(range(len(rows)), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    sf = _write(tmp_path, "orders", tbl)

    got = revenue_pareto(sf).set_index("pct_revenue")
    assert int(got.loc[50, "k_customers"]) == 2
    assert int(got.loc[80, "k_customers"]) == 3
    assert int(got.loc[90, "k_customers"]) == 3
    assert int(got.loc[99, "k_customers"]) == 3
    assert int(got.loc[50, "n_customers"]) == 4


# ----------------------------------------- packed-vector join centroids


def test_lang_embedding_centroids_planted(ray_session, tmp_path):
    """Hand-computable 2-dim centroid sums across two langs; negative
    components exercise the floor (not truncate) micro conversion."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        lang_embedding_centroids,
    )

    emb = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.5, -0.25], [0.5, 0.75], [2.0, -1.5]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32()),
    })
    doc = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a", "b", "c"], pa.string()),
        "lang": pa.array(["en", "fr", "en"], pa.string()),
    })
    pq.write_table(emb, tmp_path / "embeddings.parquet")
    pq.write_table(doc, tmp_path / "documents.parquet")

    got = lang_embedding_centroids(str(tmp_path)).reset_index(drop=True)
    want = pd.DataFrame({
        "lang": ["en", "en", "fr", "fr"],
        "pos": [1, 2, 1, 2],
        "n_vectors": [2, 2, 1, 1],
        # floor semantics: −0.25 → −250000, −1.5 → −1500000
        "sum_micro": [1500000 + 2000000, -250000 - 1500000,
                      500000, 750000],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------- three-step funnel


def test_threestep_funnel_order_matters(ray_session, tmp_path):
    """User 1 completes; user 2 has all three types but the purchase
    precedes the click (chain broken at step 3); user 3 clicks before
    viewing (chain broken at step 2, later click recovers it)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        threestep_funnel,
    )

    mn = 60 * 1_000_000
    base = pd.Timestamp("2024-01-01").value // 1000
    rows = [
        (1, base + 0 * mn, "view"), (1, base + 1 * mn, "click"),
        (1, base + 2 * mn, "purchase"),
        (2, base + 0 * mn, "view"), (2, base + 2 * mn, "click"),
        (2, base + 1 * mn, "purchase"),
        (3, base + 0 * mn, "click"), (3, base + 1 * mn, "view"),
        (3, base + 2 * mn, "click"), (3, base + 3 * mn, "purchase"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    sf = _write(tmp_path, "events", tbl)

    got = threestep_funnel(sf)
    assert int(got["n_view"].iloc[0]) == 3
    assert int(got["n_view_click"].iloc[0]) == 3
    assert int(got["n_full_chain"].iloc[0]) == 2   # users 1 and 3


# --------------------------------------------- nearest view to purchase


def test_nearest_view_picks_closest_side(ray_session, tmp_path):
    """Purchase between two views must pick the closer one; a purchase
    before any view matches forward; a user with no views is unmatched
    but still counted."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        nearest_view_to_purchase,
    )

    mn = 60 * 1_000_000
    base = pd.Timestamp("2024-01-01").value // 1000
    rows = [
        # user 1: views at 0 and 10; purchase at 7 → nearest is 10 (3 min)
        (1, base + 0 * mn, "view"), (1, base + 10 * mn, "view"),
        (1, base + 7 * mn, "purchase"),
        # user 2: purchase BEFORE its only view → forward match (5 min)
        (2, base + 5 * mn, "view"), (2, base + 0 * mn, "purchase"),
        # user 3: purchase, no views → unmatched
        (3, base + 1 * mn, "purchase"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    sf = _write(tmp_path, "events", tbl)

    got = nearest_view_to_purchase(sf)
    assert int(got["n_purchases"].iloc[0]) == 3
    assert int(got["n_matched"].iloc[0]) == 2
    assert int(got["sum_abs_lag_us"].iloc[0]) == (3 + 5) * mn
    assert int(got["max_abs_lag_us"].iloc[0]) == 5 * mn


# ------------------------------------------ embedding quantization error


def test_embedding_quantization_clip_and_halfway(ray_session, tmp_path):
    """Values engineered on the int8 grid: 2.5/256 sits exactly between
    two codes (half-away → 3), 1.0 clips (256 → 127), 0.5/256 is a
    positive half-tie (→ 1)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        embedding_quantization_error,
    )

    v1 = [2.5 / 256, -2.5 / 256]   # half-ties → ±3 (half-away)
    v2 = [1.0, 8.0 / 256]          # 1.0 clips to 127; 8/256 exact
    emb = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([v1, v2], pa.list_(pa.float32())),
        "label": pa.array([0, 1], pa.int32()),
    })
    pq.write_table(emb, tmp_path / "embeddings.parquet")

    got = embedding_quantization_error(str(tmp_path)).set_index("label")
    # label 0: err = |2.5/256 − 3/256| = 0.5/256 each → floor-micro 1953
    assert int(got.loc[0, "n_values"]) == 2
    assert int(got.loc[0, "sum_err_micro"]) == 2 * int(0.5 / 256 * 1e6)
    assert int(got.loc[0, "n_clipped"]) == 0
    # label 1: 1.0 → clipped to 127/256, err = 1 − 127/256 = 129/256
    assert int(got.loc[1, "n_clipped"]) == 1
    assert int(got.loc[1, "sum_err_micro"]) == int(129 / 256 * 1e6)


# ------------------------------------------------------ BPE top merges


def test_bpe_top_merges_counts_overlapping_pairs(ray_session, tmp_path):
    """'aaa' contributes the pair 'aa' twice (overlapping offsets);
    1-char tokens contribute nothing."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        bpe_top_merges,
    )

    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["aaa b ab", "ab aaa"], pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)

    got = bpe_top_merges(sf).set_index("pair")
    assert int(got.loc["aa", "n"]) == 4   # two per 'aaa'
    assert int(got.loc["ab", "n"]) == 2
    assert "b" not in got.index


# ------------------------------------------------- backlog sweep-line


def test_order_backlog_excludes_inverted_intervals(ray_session, tmp_path):
    """An order whose max ship day precedes its order day is never open
    and must not SUBTRACT from the curve between end and start."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        order_backlog_timeseries,
    )

    def ts(s):
        return pd.Timestamp(s).value // 1000

    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([ts("1995-01-01"), ts("1995-03-01")],
                                pa.timestamp("us")),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        # order 1 open [1995-01-01, 1995-06-01); order 2 inverted
        "l_shipdate": pa.array([ts("1995-06-01"), ts("1995-01-15")],
                               pa.timestamp("us")),
    })
    pq.write_table(orders, tmp_path / "orders.parquet")
    pq.write_table(lineitem, tmp_path / "lineitem.parquet")

    got = order_backlog_timeseries(str(tmp_path)).set_index("day")
    assert int(got.loc["1995-01-29", "n_open"]) == 1
    assert int(got.loc["1995-03-26", "n_open"]) == 1   # order 2 never opens
    assert int(got.loc["1995-06-18", "n_open"]) == 0
    assert (got["n_open"] >= 0).all()


# --------------------------------------------------- bisection median


def test_median_bisect_matches_quantile_disc_small_n(ray_session,
                                                     tmp_path, duck=None):
    """Small-n and heavy-tie cases where selection conventions diverge:
    even n picks the LOWER middle (rank ceil(n/2)), duplicates at the
    median must not confuse the bucket recursion."""
    import duckdb
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        median_totalprice_bisect,
    )

    rng = np.random.default_rng(5)
    for case, vals in enumerate([
        [10.0, 20.0],                       # even n → lower middle
        [7.0, 7.0, 7.0, 7.0],               # all ties
        [1.0, 2.0, 2.0, 2.0, 9.0, 9.0],     # ties straddling the rank
        list(rng.integers(1, 500, 37) / 1.0),
    ]):
        d = tmp_path / f"c{case}"
        d.mkdir()
        tbl = pa.table({
            "o_orderkey": pa.array(range(len(vals)), pa.int64()),
            "o_totalprice": pa.array(vals, pa.float64()),
        })
        pq.write_table(tbl, d / "orders.parquet")
        got = median_totalprice_bisect(str(d))
        want = duckdb.connect().execute(
            "SELECT quantile_disc(CAST(round(o_totalprice*100) AS "
            f"BIGINT), 0.5) FROM read_parquet('{d}/orders.parquet')"
        ).fetchone()[0]
        assert int(got["median_cents"].iloc[0]) == int(want), vals
        assert int(got["n"].iloc[0]) == len(vals)


# ----------------------------------------------- vocab coverage curve


def test_vocab_coverage_curve_k_beyond_vocab(ray_session, tmp_path):
    """K larger than the vocabulary must report full coverage, and the
    curve must follow the (count desc, token asc) deterministic order."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        vocab_coverage_curve,
    )

    tbl = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a a a b b c"], pa.string()),
    })
    sf = _write(tmp_path, "documents", tbl)

    got = vocab_coverage_curve(sf).set_index("vocab_k")
    assert int(got.loc[10, "covered_occurrences"]) == 6
    assert int(got.loc[10, "coverage_micro"]) == 1_000_000
    assert int(got.loc[10, "total_occurrences"]) == 6


# ------------------------------------------- islands boundary stitching


def test_islands_run_spanning_three_buckets(ray_session, tmp_path):
    """A consecutive run that crosses TWO bucket boundaries must be
    stitched back into one island with its full length, and non-urgent
    keys must not leak into the key set."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        urgent_orderkey_islands,
    )

    urgent = list(range(2, 11)) + [13, 17, 18]   # runs: 2..10, 13, 17..18
    other = [11, 12, 30]                          # must be filtered out
    tbl = pa.table({
        "o_orderkey": pa.array(urgent + other, pa.int64()),
        "o_orderpriority": pa.array(
            ["1-URGENT"] * len(urgent) + ["5-LOW"] * len(other),
            pa.string()),
    })
    sf = _write(tmp_path, "orders", tbl)

    # span=4 puts the 2..10 run across buckets 0, 1 and 2
    out = urgent_orderkey_islands(sf, span=4).iloc[0]
    assert out["n_keys"] == 12
    assert out["n_islands"] == 3
    assert out["longest_island"] == 9
    assert out["n_missing"] == (18 - 2 + 1) - 12


def test_islands_single_key_and_adjacent_bucket_edges(ray_session,
                                                      tmp_path):
    """Keys exactly at bucket edges (7|8 with span=4 → buckets 1|2) must
    merge; an isolated max key must close its own island."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        urgent_orderkey_islands,
    )

    urgent = [7, 8, 20]
    tbl = pa.table({
        "o_orderkey": pa.array(urgent, pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT"] * 3, pa.string()),
    })
    sf = _write(tmp_path, "orders", tbl)
    out = urgent_orderkey_islands(sf, span=4).iloc[0]
    assert out["n_keys"] == 3
    assert out["n_islands"] == 2
    assert out["longest_island"] == 2
    assert out["n_missing"] == (20 - 7 + 1) - 3


# ----------------------------------------------------- gini known value


def test_gini_known_value_and_all_equal(ray_session, tmp_path):
    """Totals {1, 1, 2} cents → gini = (2·9 − 4·4)/(3·4) = 1/6 exactly;
    all-equal totals → gini 0."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        customer_spend_gini,
    )

    tbl = pa.table({
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([0.01, 0.01, 0.02], pa.float64()),
    })
    out = customer_spend_gini(_write(tmp_path, "orders", tbl)).iloc[0]
    assert out["n_customers"] == 3
    assert out["total_cents"] == 4
    assert out["gini"] == (2 * 9 - 4 * 4) / (3 * 4)

    eq = pa.table({
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([0.05, 0.05], pa.float64()),
    })
    d2 = tmp_path / "eq"
    d2.mkdir()
    pq.write_table(eq, d2 / "orders.parquet")
    out2 = customer_spend_gini(str(d2)).iloc[0]
    assert out2["gini"] == 0.0


# ----------------------------------------------- gram matrix exactness


def test_gram_matrix_half_ties_and_bruteforce(ray_session, tmp_path):
    """Values sitting exactly on the ·4096 half-tie (±2.5/4096) must
    quantize half-AWAY (to ±3) like DuckDB round(); the gram must equal
    the brute-force integer product matrix."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        embedding_gram_matrix,
    )

    v = 2.5 / 4096.0   # exactly representable in float32 (5 · 2^-13)
    rows = [[v, -v, 1.0], [0.5, v, -1.0]]
    tbl = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array(rows, pa.list_(pa.float32())),
    })
    out = embedding_gram_matrix(_write(tmp_path, "embeddings", tbl))

    q = np.array([[3, -3, 4096], [2048, 3, -4096]], np.int64)
    want = q.T @ q
    got = {(r.i, r.j): r.gram for r in out.itertuples(index=False)}
    for i in range(3):
        for j in range(i, 3):
            assert got[(i, j)] == want[i, j], (i, j)


# ------------------------------------------------------- BFS hop levels


def test_bfs_path_graph_caps_at_eight_hops(ray_session, tmp_path):
    """A 12-node path from the min node: dists 0..8 reached (one node
    each), nodes beyond the hop cap and a disconnected pair excluded."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        copurchase_bfs_dist,
    )

    edges = [(i, i + 1) for i in range(11)] + [(100, 101)]
    ok, pk = [], []
    for o, (a, b) in enumerate(edges):
        ok += [o, o]
        pk += [a, b]
    tbl = pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
    })
    out = copurchase_bfs_dist(_write(tmp_path, "lineitem", tbl))
    assert list(out["dist"]) == list(range(9))
    assert (out["n_nodes"] == 1).all()


# ------------------------------------------- replica bucket checksums


def test_replica_checksums_order_independent_and_localizing(ray_session,
                                                            tmp_path):
    """Row order must not change any bucket checksum; a one-cent change
    must flip exactly its own bucket's checksum and no counts."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        orders_replica_checksums,
    )

    base = {
        "o_orderkey": [1, 2, 3000, 3001, 9000],
        "o_custkey": [10, 20, 30, 40, 50],
        "o_totalprice": [1.00, 2.00, 3.00, 4.00, 5.00],
        "o_orderdate": pd.to_datetime(
            ["1995-01-01", "1995-02-01", "1996-01-01", "1996-02-01",
             "1997-01-01"]),
    }
    a = pa.Table.from_pandas(pd.DataFrame(base), preserve_index=False)
    shuffled = pa.Table.from_pandas(
        pd.DataFrame(base).iloc[[4, 2, 0, 3, 1]], preserve_index=False)
    d1, d2, d3 = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    for d in (d1, d2, d3):
        d.mkdir()
    pq.write_table(a, d1 / "orders.parquet")
    pq.write_table(shuffled, d2 / "orders.parquet")
    perturbed = dict(base)
    perturbed["o_totalprice"] = [1.00, 2.00, 3.01, 4.00, 5.00]
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(perturbed),
                                        preserve_index=False),
                   d3 / "orders.parquet")

    r1 = orders_replica_checksums(str(d1))
    r2 = orders_replica_checksums(str(d2))
    r3 = orders_replica_checksums(str(d3))
    pd.testing.assert_frame_equal(r1, r2)
    assert (r1["n_rows"] == r3["n_rows"]).all()
    diff = r1["checksum"] != r3["checksum"]
    assert diff.sum() == 1
    assert int(r1.loc[diff, "bucket"].iloc[0]) == 3000 // 2048


# ------------------------------------------- linear interpolation fill


def test_linear_interp_exact_points_and_truncation(ray_session, tmp_path):
    """Gap hours must land exactly on the line (micro units), trailing
    hours stay NULL, and a negative numerator must TRUNCATE (DuckDB //)
    rather than floor."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        hourly_linear_interp,
    )

    h = 3_600_000_000
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([0, 3 * h, 0, 3 * h], pa.timestamp("us")),
        "event_type": pa.array(["a", "a", "b", "b"], pa.string()),
        "value": pa.array([1.00, 4.00, -1.00, 0.00], pa.float64()),
    })
    out = hourly_linear_interp(_write(tmp_path, "events", tbl))
    a = out[out["event_type"] == "a"].set_index("hour")["value_micro"]
    assert a.loc[0] == 1_000_000 and a.loc[3] == 4_000_000
    assert a.loc[1] == 2_000_000 and a.loc[2] == 3_000_000
    b = out[out["event_type"] == "b"].set_index("hour")["value_micro"]
    # hour 1: (−100·2 + 0·1)·10000 / 3 = −666666.67 → truncates to −666666
    assert b.loc[1] == -666_666
    assert b.loc[2] == -333_333
    imput = out[out["event_type"] == "a"].set_index("hour")["is_imputed"]
    assert not imput.loc[0] and imput.loc[1] and imput.loc[2]


# --------------------------------------------------- feature hashing


def test_feature_hash_bucket_matches_md5_convention(ray_session,
                                                    tmp_path):
    """Bucket assignment must equal md5(token)[8:16] little-endian % 64
    (the md5_number_lower convention), with occurrence and distinct
    counts folding per bucket."""
    import hashlib

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        feature_hash_tokens,
    )

    tbl = pa.table({
        "text": pa.array(["abc abc xyz", "abc qq"], pa.string()),
    })
    out = feature_hash_tokens(_write(tmp_path, "documents", tbl))

    def bkt(t):
        return int.from_bytes(hashlib.md5(t.encode()).digest()[8:16],
                              "little") % 64

    want = {}
    for tok, c in {"abc": 3, "xyz": 1, "qq": 1}.items():
        b = bkt(tok)
        d, o = want.get(b, (0, 0))
        want[b] = (d + 1, o + c)
    got = {int(r.bucket): (int(r.n_distinct), int(r.n_occ))
           for r in out.itertuples(index=False)}
    assert got == want


# ------------------------------------------------ grouped trend slope


def test_trend_slope_recovers_planted_line(ray_session, tmp_path):
    """Orders whose monthly totals follow y = 100·x + 50 cents exactly
    must yield slope exactly 100.0 for that nation."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        nation_revenue_trend,
    )

    months = ["1995-01-15", "1995-02-15", "1995-03-15", "1995-04-15"]
    prices = [(100 * x + 50) / 100.0 for x in range(4)]
    orders = pa.table({
        "o_custkey": pa.array([1] * 4, pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array(pd.to_datetime(months),
                                pa.timestamp("us")),
    })
    customer = pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_nationkey": pa.array([7], pa.int32()),
    })
    sf = _write(tmp_path, "orders", orders)
    pq.write_table(customer, tmp_path / "customer.parquet")
    out = nation_revenue_trend(sf)
    assert len(out) == 1
    assert int(out["nation"].iloc[0]) == 7
    assert int(out["n_months"].iloc[0]) == 4
    assert out["slope_cents_per_month"].iloc[0] == 100.0


# ---------------------------------------------- schema numeric profile


def test_schema_profile_counts_nulls_and_negatives(ray_session, tmp_path):
    """Null values must count into n_null and drop out of min/max/sum;
    negative values must survive the cents rounding."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        schema_profile_numeric,
    )

    pq.write_table(pa.table({
        "o_totalprice": pa.array([1.25, None, -2.50], pa.float64())}),
        tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_quantity": pa.array([3.0], pa.float64()),
        "l_extendedprice": pa.array([10.0], pa.float64()),
        "l_discount": pa.array([0.05], pa.float64()),
        "l_tax": pa.array([0.02], pa.float64())}),
        tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "value": pa.array([None, None], pa.float64())}),
        tmp_path / "events.parquet")
    pq.write_table(pa.table({
        "c_acctbal": pa.array([0.0], pa.float64())}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "p_retailprice": pa.array([9.99], pa.float64()),
        "p_size": pa.array([7], pa.int32())}),
        tmp_path / "part.parquet")

    out = schema_profile_numeric(str(tmp_path)).set_index(["tbl", "col"])
    o = out.loc[("orders", "o_totalprice")]
    assert o["n"] == 3 and o["n_null"] == 1
    assert o["min_cents"] == -250 and o["max_cents"] == 125
    assert o["sum_cents"] == -125
    ev = out.loc[("events", "value")]
    assert ev["n"] == 2 and ev["n_null"] == 2 and ev["sum_cents"] == 0
    assert pd.isna(ev["min_cents"]) and pd.isna(ev["max_cents"])
    p = out.loc[("part", "p_size")]
    assert p["min_cents"] == 700 and p["max_cents"] == 700


# --------------------------------------------- cross-series correlation


def test_series_correlation_perfect_and_inverse(ray_session, tmp_path):
    """A purchase series equal to the view series gives corr ≈ 1; its
    negation gives corr ≈ −1; hours present in only one series must be
    excluded (inner-join alignment)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        hourly_series_correlation,
    )

    h = 3_600_000_000
    ts, et, val = [], [], []
    for i, v in enumerate([1.0, 2.0, 5.0, 3.0]):
        ts += [i * h, i * h]
        et += ["view", "purchase"]
        val += [v, v]
    ts.append(10 * h)         # view-only hour: must not enter
    et.append("view")
    val.append(99.0)
    tbl = pa.table({
        "event_type": pa.array(et, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array(val, pa.float64()),
    })
    out = hourly_series_correlation(_write(tmp_path, "events", tbl)).iloc[0]
    assert out["n_hours"] == 4
    assert abs(out["corr"] - 1.0) < 1e-12

    val2 = [v if e == "view" else -v for e, v in zip(et, val)]
    tbl2 = pa.table({
        "event_type": pa.array(et, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array(val2, pa.float64()),
    })
    d2 = tmp_path / "neg"
    d2.mkdir()
    pq.write_table(tbl2, d2 / "events.parquet")
    out2 = hourly_series_correlation(str(d2)).iloc[0]
    assert abs(out2["corr"] + 1.0) < 1e-12


# ----------------------------------------------------- mode tie-break


def test_modal_value_tie_takes_smallest(ray_session, tmp_path):
    """Two values with the same top count: the smaller cents value must
    win on both engines."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        modal_value_per_type,
    )

    tbl = pa.table({
        "event_type": pa.array(["a"] * 4 + ["b"], pa.string()),
        "value": pa.array([2.0, 2.0, 1.0, 1.0, 7.0], pa.float64()),
    })
    out = modal_value_per_type(_write(tmp_path, "events", tbl))
    a = out[out["event_type"] == "a"].iloc[0]
    assert a["modal_cents"] == 100 and a["n_modal"] == 2
    b = out[out["event_type"] == "b"].iloc[0]
    assert b["modal_cents"] == 700 and b["n_modal"] == 1


# ------------------------------------------------- dead-letter routing


def test_quarantine_routes_malformed_rows(ray_session, tmp_path):
    """Malformed props must be counted invalid AND land (exactly those
    rows) in the quarantine sink; valid rows must not."""
    import glob

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        quarantine_bad_props,
    )

    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b"], pa.string()),
        "props": pa.array(['{"k": 5}', 'oops', None, '{"k": -3}'],
                          pa.string()),
    })
    sf = _write(tmp_path, "events", tbl)
    out = quarantine_bad_props(sf).set_index(["event_type", "is_valid"])
    assert out.loc[("a", True), "n"] == 1
    assert out.loc[("a", False), "n"] == 1
    assert out.loc[("b", False), "n"] == 1
    assert out.loc[("b", True), "n"] == 1

    import os as _os
    qbase = "/tmp/aads_quarantine"
    shards = glob.glob(_os.path.join(
        qbase, f"{_os.path.basename(str(tmp_path))}_{_os.getpid()}",
        "*.parquet"))
    got = pa.concat_tables([pq.read_table(s) for s in shards])
    assert sorted(got["event_id"].to_pylist()) == [2, 3]


# -------------------------------------------------- watermark lateness


def test_watermark_lateness_cross_bucket_stitch(ray_session, tmp_path):
    """Out-of-order events must measure lateness against the GLOBAL
    running-max watermark; a tiny bucket span must stitch identically
    to the default (incoming-watermark handoff)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        events_watermark_lateness,
    )

    S = 1_000_000
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([100 * S, 200 * S, 50 * S, 210 * S, 205 * S],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "a", "b", "a", "b"], pa.string()),
    })
    sf = _write(tmp_path, "events", tbl)
    out = events_watermark_lateness(sf).set_index("event_type")
    # only eid 3 is late: wm=200s, ts=50s → 150s > 60s allowed
    assert out.loc["b", "n_late"] == 1
    assert out.loc["b", "max_lateness_us"] == 150 * S
    assert out.loc["a", "n_late"] == 0

    tiny = events_watermark_lateness(sf, span=2).set_index("event_type")
    pd.testing.assert_frame_equal(out, tiny)


# ------------------------------------------------------ skyline query


def test_skyline_duplicates_kept_dominated_dropped(ray_session,
                                                   tmp_path):
    """Duplicate (price, size) points both survive; equal-price
    larger-size and equal-size pricier points are dominated."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        part_price_size_skyline,
    )

    tbl = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "p_retailprice": pa.array([1.00, 1.00, 0.50, 1.50, 0.50, 2.00,
                                   0.50], pa.float64()),
        "p_size": pa.array([5, 5, 10, 5, 10, 1, 12], pa.int32()),
    })
    out = part_price_size_skyline(_write(tmp_path, "part", tbl))
    assert sorted(out["p_partkey"]) == [1, 2, 3, 5, 6]


# --------------------------------------------------- top-2 margin


def test_top2_gap_single_supplier_and_tie(ray_session, tmp_path):
    """A tie on balance resolves to the smaller suppkey as top; a
    single-supplier nation reports NaN runner-up columns."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        nation_top2_acctbal_gap,
    )

    tbl = pa.table({
        "s_suppkey": pa.array([11, 7, 20, 30], pa.int64()),
        "s_nationkey": pa.array([0, 0, 0, 1], pa.int32()),
        "s_acctbal": pa.array([5.00, 5.00, 1.00, 9.99], pa.float64()),
    })
    out = nation_top2_acctbal_gap(_write(tmp_path, "supplier", tbl)
                                  ).set_index("nation")
    assert out.loc[0, "top_suppkey"] == 7
    assert out.loc[0, "second_suppkey"] == 11.0
    assert out.loc[0, "gap_cents"] == 0.0
    assert out.loc[1, "top_suppkey"] == 30
    assert pd.isna(out.loc[1, "second_suppkey"])
    assert pd.isna(out.loc[1, "gap_cents"])


# ----------------------------------------------- degree assortativity


def test_assortativity_star_graph_is_minus_one(ray_session, tmp_path):
    """A star K1,3 is perfectly disassortative: r must be exactly −1.0
    (all integer moments, sqrt(36) exact)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        copurchase_assortativity,
    )

    edges = [(0, 1), (0, 2), (0, 3)]
    ok, pk = [], []
    for o, (a, b) in enumerate(edges):
        ok += [o, o]
        pk += [a, b]
    tbl = pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
    })
    out = copurchase_assortativity(_write(tmp_path, "lineitem", tbl))
    assert out["n_edge_ends"].iloc[0] == 6
    assert out["assortativity"].iloc[0] == -1.0


# ------------------------------------------------------ trending tokens


def test_trending_tokens_split_and_ranking(ray_session, tmp_path):
    """Tokens must split at the doc_id midpoint from footer stats; the
    raise ranking ties must break token-ascending."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        trending_tokens,
    )

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        # split = (0 + 3 + 1)//2 = 2 → docs 0,1 are window A; 2,3 are B
        "text": pa.array(["old old", "old", "new new new", "new riser"],
                         pa.string()),
    })
    out = trending_tokens(_write(tmp_path, "documents", tbl))
    top = out.iloc[0]
    assert top["token"] == "new" and top["n_a"] == 0 and top["n_b"] == 4
    assert top["raise_n"] == 4
    old = out[out["token"] == "old"].iloc[0]
    assert old["n_a"] == 3 and old["n_b"] == 0 and old["raise_n"] == -3


# ------------------------------------------------- canonical dedup


def test_canonical_dedup_collapses_trivial_variants(ray_session,
                                                    tmp_path):
    """Case, punctuation and whitespace variants must land in one
    canonical group; genuinely different text must not."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        canonical_dedup_documents,
    )

    tbl = pa.table({
        "text": pa.array(["Hello,   World!", "hello world",
                          "HELLO--world", "different text"], pa.string()),
    })
    out = canonical_dedup_documents(_write(tmp_path, "documents", tbl)
                                    ).iloc[0]
    assert out["n_docs"] == 4
    assert out["n_groups"] == 2
    assert out["n_redundant"] == 2
    assert out["largest_group"] == 3


# ------------------------------------------------- labeler agreement


def test_kappa_perfect_and_independent(ray_session, tmp_path):
    """Rules that always agree → kappa 1.0; the 2×2 counts must match
    the planted construction."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        labeler_agreement_kappa,
    )

    long_many = " ".join(["tok"] * 60)   # 239 chars AND 60 tokens
    short_few = "tiny text"
    tbl = pa.table({
        "n_chars": pa.array([len(long_many), len(long_many),
                             len(short_few)], pa.int64()),
        "text": pa.array([long_many, long_many, short_few], pa.string()),
    })
    out = labeler_agreement_kappa(_write(tmp_path, "documents", tbl)
                                  ).iloc[0]
    assert out["n"] == 3 and out["n_both"] == 2 and out["n_neither"] == 1
    assert out["n_only_a"] == 0 and out["n_only_b"] == 0
    assert out["kappa"] == 1.0


# --------------------------------------------- compression quality


def test_compression_bands_separate_repetitive_from_random(ray_session,
                                                           tmp_path):
    """Highly repetitive text must land in a LOW ratio band and
    high-entropy text in a HIGH band; empty docs get band −1."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        compression_quality_documents,
    )

    import hashlib
    rand = "".join(hashlib.sha256(str(i).encode()).hexdigest()
                   for i in range(64))
    tbl = pa.table({
        "lang": pa.array(["en", "en", "en"], pa.string()),
        "text": pa.array(["ab" * 2000, rand, ""], pa.string()),
    })
    out = compression_quality_documents(_write(tmp_path, "documents",
                                               tbl))
    bands = dict(zip(out["band"], out["n"]))
    low = [b for b in bands if 0 <= b <= 2]
    high = [b for b in bands if b >= 5]
    assert low and high and -1 in bands


# ----------------------------------------------- clamped running ledger


def test_ledger_clamp_identity_known_sequence(ray_session, tmp_path):
    """Deltas [5,−8,4,−2,−9,3] must clamp to balances [5,0,4,2,0,3]:
    final 3, unclamped min −10, two zero steps — plus a second user to
    exercise the per-segment offset trick."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        user_ledger_clamped,
    )

    S = 1_000_000
    deltas = [5, -8, 4, -2, -9, 3]
    types = ["purchase" if d > 0 else "error" for d in deltas]
    vals = [abs(d) / 100.0 for d in deltas]
    tbl = pa.table({
        "event_id": pa.array(list(range(1, 7)) + [10, 11], pa.int64()),
        "ts": pa.array([i * S for i in range(6)] + [0, S],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * 6 + [2, 2], pa.int64()),
        "event_type": pa.array(types + ["error", "purchase"],
                               pa.string()),
        "value": pa.array(vals + [0.07, 0.03], pa.float64()),
    })
    out = user_ledger_clamped(_write(tmp_path, "events", tbl)
                              ).set_index("user_id")
    assert out.loc[1, "final_balance"] == 3
    assert out.loc[1, "min_unclamped"] == -10
    assert out.loc[1, "n_zero_steps"] == 2
    # user 2: −7 then +3 → balances [0, 3]; min unclamped −7
    assert out.loc[2, "final_balance"] == 3
    assert out.loc[2, "min_unclamped"] == -7
    assert out.loc[2, "n_zero_steps"] == 1


# --------------------------------------------- join cardinality audit


def test_join_cardinality_sum_of_squares(ray_session, tmp_path):
    """Multiplicities {3, 1} → predicted self-join rows 3² + 1² = 10."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        join_cardinality_audit,
    )

    tbl = pa.table({"l_partkey": pa.array([7, 7, 7, 9], pa.int64())})
    out = join_cardinality_audit(_write(tmp_path, "lineitem", tbl)
                                 ).iloc[0]
    assert out["n_keys"] == 2
    assert out["predicted_rows"] == 10
    assert out["max_multiplicity"] == 3


# ------------------------------------------------ n-gram repetition


def test_ngram_repetition_bands_exact(ray_session, tmp_path):
    """'a b c' ×3 has 7 trigrams, 3 distinct → dup fraction 4/7 →
    band 5; a no-repeat doc lands in band 0; docs under 3 tokens are
    excluded."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        doc_ngram_repetition,
    )

    tbl = pa.table({
        "lang": pa.array(["en", "en", "en"], pa.string()),
        "text": pa.array(["a b c a b c a b c", "x y z w", "hi"],
                         pa.string()),
    })
    out = doc_ngram_repetition(_write(tmp_path, "documents", tbl))
    bands = dict(zip(out["band"], out["n_docs"]))
    assert bands == {0: 1, 5: 1}


# ------------------------------------------------ min-max tail audit


def test_minmax_tail_strict_boundary(ray_session, tmp_path):
    """scaled == 0.9 exactly must NOT count as top decile (strict >);
    the max row counts in both tails."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        minmax_scale_tail_counts,
    )

    tbl = pa.table({
        "event_type": pa.array(["t"] * 4, pa.string()),
        "value": pa.array([0.00, 1.00, 0.90, 0.95], pa.float64()),
    })
    out = minmax_scale_tail_counts(_write(tmp_path, "events", tbl)
                                   ).iloc[0]
    assert out["min_cents"] == 0 and out["max_cents"] == 100
    assert out["n"] == 4
    assert out["n_top_decile"] == 2      # 0.95 and 1.00; 0.90 excluded
    assert out["n_at_max"] == 1


# -------------------------------------------------- CDC last-write-wins


def test_cdc_tombstone_and_upsert_semantics(ray_session, tmp_path):
    """The LAST event per user decides: an error tombstone deletes the
    key even after earlier purchases; a later upsert resurrects
    nothing retroactively."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        cdc_last_write_wins,
    )

    S = 1_000_000
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([0, S, 0, S, 2 * S], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "event_type": pa.array(
            ["purchase", "error", "error", "purchase", "view"],
            pa.string()),
        "value": pa.array([10.0, 1.0, 1.0, 3.0, 2.5], pa.float64()),
    })
    out = cdc_last_write_wins(_write(tmp_path, "events", tbl)).iloc[0]
    # user 1 ends on error → tombstoned; user 2 ends on view 2.50 → live
    assert out["n_live"] == 1
    assert out["n_tombstoned"] == 1
    assert out["live_cents"] == 250


# ---------------------------------------------- transition dwell times


def test_transition_dwell_gaps_exact(ray_session, tmp_path):
    """Per-user consecutive pairs only: cross-user boundaries must not
    produce transitions; gaps are exact microseconds."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        transition_dwell_times,
    )

    S = 1_000_000
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([0, 5 * S, 100 * S, 107 * S], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["view", "click", "view", "click"],
                               pa.string()),
    })
    out = transition_dwell_times(_write(tmp_path, "events", tbl))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["prev_type"], r["event_type"]) == ("view", "click")
    assert r["n"] == 2
    assert r["sum_gap_us"] == 12 * S
    assert r["max_gap_us"] == 7 * S


# ------------------------------------------------------- Fano factor


def test_fano_constant_rate_is_zero_poissonish(ray_session, tmp_path):
    """A perfectly constant arrival count per hour has variance 0 →
    Fano 0; packing every event into one hour of a long spine drives
    Fano toward the event count."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        event_type_fano,
    )

    H = 3_600_000_000
    ts = [i * H for i in range(4)] + [0, 0, 0, 3 * H]
    et = ["flat"] * 4 + ["burst"] * 4
    tbl = pa.table({
        "event_type": pa.array(et, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    out = event_type_fano(_write(tmp_path, "events", tbl)
                          ).set_index("event_type")
    assert out.loc["flat", "fano"] == 0.0
    # burst: counts over 4-hour spine = [3,0,0,1]: mean 1, var 1.5
    assert out.loc["burst", "fano"] == 1.5


# ------------------------------------------------- diversified top-k


def test_diversified_topk_caps_per_brand(ray_session, tmp_path):
    """A brand with the three priciest parts may place only two, and
    rank-1 rows of every brand precede any rank-2 row."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        diversified_top_parts,
    )

    tbl = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "p_brand": pa.array(["A", "A", "A", "B", "B"], pa.string()),
        "p_retailprice": pa.array([9.0, 8.0, 7.0, 1.0, 2.0],
                                  pa.float64()),
    })
    out = diversified_top_parts(_write(tmp_path, "part", tbl))
    assert 3 not in set(out["p_partkey"])          # brand A capped at 2
    ranks = out["brand_rank"].to_numpy()
    assert (np.diff(ranks) >= 0).all()             # rank-major order
    assert list(out[out["brand_rank"] == 1]["p_partkey"]) == [1, 5]


# -------------------------------------------- largest-remainder quota


def test_quota_largest_remainder_tie_breaks_lexically(ray_session,
                                                      tmp_path):
    """Three equal strata, budget 1000: floors 333, one leftover seat,
    equal remainders — the lexicographically first lang gets it."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        stratified_quota_allocation,
    )

    tbl = pa.table({"lang": pa.array(["a", "b", "c"], pa.string())})
    out = stratified_quota_allocation(_write(tmp_path, "documents", tbl)
                                      ).set_index("lang")
    assert out.loc["a", "quota"] == 334
    assert out.loc["b", "quota"] == 333
    assert out.loc["c", "quota"] == 333
    assert int(out["quota"].sum()) == 1000


# ------------------------------------------------ encoding advisor


def test_encoding_advisor_byte_math(ray_session, tmp_path):
    """dict_bytes = Σ distinct lengths + 4n; raw = Σ value lengths."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        encoding_advisor_strings,
    )

    pq.write_table(pa.table({
        "o_orderpriority": pa.array(["HIGH", "HIGH", "LO"], pa.string()),
        "o_orderstatus": pa.array(["F", "F", "F"], pa.string())}),
        tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "p_brand": pa.array(["B1"], pa.string()),
        "p_type": pa.array(["t"], pa.string())}),
        tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "event_type": pa.array(["x"], pa.string())}),
        tmp_path / "events.parquet")
    pq.write_table(pa.table({
        "c_mktsegment": pa.array(["SEG"], pa.string())}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "lang": pa.array(["en"], pa.string()),
        "source": pa.array(["s"], pa.string())}),
        tmp_path / "documents.parquet")

    out = encoding_advisor_strings(str(tmp_path)).set_index(
        ["tbl", "col"])
    r = out.loc[("orders", "o_orderpriority")]
    assert r["n"] == 3 and r["n_distinct"] == 2
    assert r["raw_bytes"] == 4 + 4 + 2
    assert r["dict_bytes"] == (4 + 2) + 4 * 3


# ------------------------------------------------ mixture weights


def test_mixture_weights_equalize_uniform_target(ray_session, tmp_path):
    """Sources with 1 and 3 tokens: weights 4e6//2 and 4e6//6 exactly."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        source_mixture_weights,
    )

    tbl = pa.table({
        "source": pa.array(["s1", "s2"], pa.string()),
        "text": pa.array(["one", "a b c"], pa.string()),
    })
    out = source_mixture_weights(_write(tmp_path, "documents", tbl)
                                 ).set_index("source")
    assert out.loc["s1", "n_tokens"] == 1
    assert out.loc["s2", "n_tokens"] == 3
    assert out.loc["s1", "weight_micro"] == 2_000_000
    assert out.loc["s2", "weight_micro"] == 666_666


# ------------------------------------------------ name-key audit


def test_name_key_audit_counts_violations(ray_session, tmp_path):
    """A mismatched id and an unparseable name must each count once."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        name_key_consistency_audit,
    )

    pq.write_table(pa.table({
        "c_name": pa.array(["Customer#000000007", "Customer#000000009",
                            "garbled"], pa.string()),
        "c_custkey": pa.array([7, 8, 9], pa.int64())}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "s_name": pa.array(["Supplier#000000001"], pa.string()),
        "s_suppkey": pa.array([1], pa.int64())}),
        tmp_path / "supplier.parquet")
    out = name_key_consistency_audit(str(tmp_path)).set_index("tbl")
    assert out.loc["customer", "n"] == 3
    assert out.loc["customer", "n_unparseable"] == 1
    assert out.loc["customer", "n_key_mismatch"] == 1
    assert out.loc["supplier", "n_key_mismatch"] == 0


# ---------------------------------------------- format roundtrips


def test_jsonl_roundtrip_preserves_negative_cents(ray_session, tmp_path):
    """Negative values must survive the JSONL leg exactly (ints through
    text, converted before the sink)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        jsonl_roundtrip_events,
    )

    tbl = pa.table({
        "event_type": pa.array(["a", "a", "b"], pa.string()),
        "value": pa.array([-1.23, 2.00, None], pa.float64()),
    })
    out = jsonl_roundtrip_events(_write(tmp_path, "events", tbl)
                                 ).set_index("event_type")
    assert out.loc["a", "sum_cents"] == 77    # −123 + 200
    assert out.loc["a", "n"] == 2
    assert "b" not in out.index               # null value dropped


def test_orc_custom_source_accounts_for_all_rows(ray_session, tmp_path):
    """The hand-built ORC source must read back every row the sink
    wrote (shard manifest totals == input rows)."""
    import glob

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        orc_custom_source_parts,
    )

    tbl = pa.table({
        "p_brand": pa.array(["X"] * 7 + ["Y"] * 5, pa.string()),
        "p_retailprice": pa.array([1.0] * 7 + [2.0] * 5, pa.float64()),
    })
    out = orc_custom_source_parts(_write(tmp_path, "part", tbl)
                                  ).set_index("p_brand")
    assert out.loc["X", "n"] == 7 and out.loc["X", "sum_cents"] == 700
    assert out.loc["Y", "n"] == 5 and out.loc["Y", "sum_cents"] == 1000
    shards = glob.glob(os.path.join(
        "/tmp", "aads_orc",
        f"{os.path.basename(str(tmp_path))}_{os.getpid()}", "*.orc"))
    assert len(shards) >= 1


def test_page_slice_tie_straddles_boundary_deterministically(
        ray_session, tmp_path):
    """60 equal-price orders: the page (rows 51-60) must pick keys 51-60
    in orderkey order — tie-break stability across the offset edge."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        orders_page_slice,
    )

    tbl = pa.table({
        "o_orderkey": pa.array(list(range(1, 71)), pa.int64()),
        "o_totalprice": pa.array([5.0] * 60 + [1.0] * 10, pa.float64()),
    })
    out = orders_page_slice(_write(tmp_path, "orders", tbl))
    assert list(out["o_orderkey"]) == list(range(51, 61))
    assert list(out["page_rank"]) == list(range(51, 61))


# --------------------------------------------- content-addressed cache


def test_cached_query_hits_without_recompute(ray_session, tmp_path):
    """Two calls on identical input: one compute, identical results;
    changing the input rows changes the key and recomputes."""
    import glob
    import shutil

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        cached_pricing_summary,
    )

    # the cache is persistent scratch by design — a PREVIOUS pytest
    # session's entry for this same planted input (same basename + row
    # count → same key) would turn call 1 into a hit and break the
    # miss-counting below, so start from a clean cache dir
    shutil.rmtree("/tmp/aads_result_cache", ignore_errors=True)

    li = pa.table({
        "l_returnflag": pa.array(["A", "A", "R"], pa.string()),
        "l_linestatus": pa.array(["F", "F", "O"], pa.string()),
        "l_quantity": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.1, 0.2], pa.float64()),
        "l_tax": pa.array([0.0, 0.0, 0.0], pa.float64()),
        "l_shipdate": pa.array(pd.to_datetime(["1998-01-01"] * 3),
                               pa.timestamp("us")),
    })
    sf = _write(tmp_path, "lineitem", li)

    def n_computes():
        total = 0
        for f in glob.glob("/tmp/aads_result_cache/*.computes"):
            total += sum(1 for _ in open(f))
        return total

    before = n_computes()
    r1 = cached_pricing_summary(sf)
    mid = n_computes()
    r2 = cached_pricing_summary(sf)
    after = n_computes()
    assert mid == before + 1          # first call computed
    assert after == mid               # second call was a pure hit
    pd.testing.assert_frame_equal(r1, r2)

    # grow the input → new key → recompute
    li2 = pa.concat_tables([li, li.slice(0, 1)])
    pq.write_table(li2, tmp_path / "lineitem.parquet")
    cached_pricing_summary(sf)
    assert n_computes() == after + 1


# --------------------------------------------- schema evolution


def test_schema_evolution_fills_missing_column_with_nulls(ray_session,
                                                          tmp_path):
    """Legacy shards (even keys) must read back with NULL priority and
    still contribute cents."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        schema_evolution_union,
    )

    tbl = pa.table({
        "o_orderkey": pa.array([2, 4, 5], pa.int64()),
        "o_totalprice": pa.array([1.00, 2.00, 4.00], pa.float64()),
        "o_orderpriority": pa.array(["P", "P", "P"], pa.string()),
    })
    out = schema_evolution_union(_write(tmp_path, "orders", tbl)).iloc[0]
    assert out["n_legacy"] == 2
    assert out["n_evolved"] == 1
    assert out["sum_cents"] == 700


# --------------------------------------------- clustered write


def test_clustered_write_files_are_range_disjoint(ray_session,
                                                  tmp_path):
    """A small span must produce several files with pairwise-disjoint
    key ranges and full row accounting."""
    import glob

    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        clustered_write_orders,
    )

    tbl = pa.table({
        "o_orderkey": pa.array(list(range(0, 40)), pa.int64()),
        "o_totalprice": pa.array([1.0] * 40, pa.float64()),
    })
    out = clustered_write_orders(_write(tmp_path, "orders", tbl),
                                 span=8).iloc[0]
    assert out["n_rows"] == 40
    assert out["n_overlapping_files"] == 0
    shards = glob.glob(os.path.join(
        "/tmp", "aads_clustered",
        f"{os.path.basename(str(tmp_path))}_{os.getpid()}", "*.parquet"))
    assert len(shards) == 5


# --------------------------------------- new vs returning revenue


def test_new_vs_returning_split_by_first_month(ray_session, tmp_path):
    """A customer's first month is 'new'; every later month is
    'returning' — even if revenue is larger later."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        monthly_new_vs_returning_revenue,
    )

    tbl = pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderdate": pa.array(pd.to_datetime(
            ["1995-01-10", "1995-02-10", "1995-02-20"]),
            pa.timestamp("us")),
        "o_totalprice": pa.array([1.00, 5.00, 2.00], pa.float64()),
    })
    out = monthly_new_vs_returning_revenue(
        _write(tmp_path, "orders", tbl)).set_index("month")
    assert out.loc[0, "new_cents"] == 100
    assert out.loc[0, "returning_cents"] == 0
    assert out.loc[1, "new_cents"] == 200        # cust 2's first month
    assert out.loc[1, "returning_cents"] == 500  # cust 1 returning
    assert out.loc[1, "n_new_customers"] == 1
    assert out.loc[1, "n_returning_customers"] == 1


# ----------------------------------------------- rule-based scoring


def test_rule_scores_weighted_sum_and_order(ray_session, tmp_path):
    """score = 3p + 2c + v − 5e; negative scores rank below, ties break
    user-ascending."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        rule_based_user_scores,
    )

    et, uid = [], []
    for u, types in [(1, ["purchase", "click"]),       # 3+2 = 5
                     (2, ["view"] * 5),                # 5
                     (3, ["error"])]:                  # −5
        for t in types:
            uid.append(u)
            et.append(t)
    tbl = pa.table({"user_id": pa.array(uid, pa.int64()),
                    "event_type": pa.array(et, pa.string())})
    out = rule_based_user_scores(_write(tmp_path, "events", tbl))
    assert list(out["user_id"]) == [1, 2, 3]     # tie 5 → smaller user
    assert list(out["score"]) == [5, 5, -5]


# ----------------------------------------------- generator source


def test_generated_source_counts_sum_to_n(ray_session):
    """Buckets must partition all n generated rows; LCG determinism
    makes repeated runs identical."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        generated_source_parity,
    )

    a = generated_source_parity("unused", n=10_000)
    b = generated_source_parity("unused", n=10_000)
    pd.testing.assert_frame_equal(a, b)
    assert int(a["n"].sum()) == 10_000


# ----------------------------------------------- token positions


def test_token_positions_with_leading_empty_doc(ray_session, tmp_path):
    """An empty first document must not shift positions in later docs
    (base-offset edge); positions are 1-based among real tokens."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        token_position_stats,
    )

    tbl = pa.table({
        "lang": pa.array(["en", "en", "de"], pa.string()),
        "text": pa.array(["", "the cat the", "dog the"], pa.string()),
    })
    out = token_position_stats(_write(tmp_path, "documents", tbl)
                               ).set_index("lang")
    assert out.loc["en", "token"] == "the"
    assert out.loc["en", "n_occ"] == 2
    # positions 1 and 3 → mean 2.0
    assert out.loc["en", "mean_pos_micro"] == 2_000_000
    assert out.loc["en", "max_pos"] == 3
    assert out.loc["de", "n_occ"] == 1 and out.loc["de", "max_pos"] == 2


# ------------------------------------------------------- 3-way venn


def test_venn3_all_regions(ray_session, tmp_path):
    """Keys planted into every one of the 7 membership regions."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        key_venn3,
    )

    # regions: E=4 O=2 C=1  → keys: 7→EOC, 6→EO, 5→EC, 4→E, 3→OC, 2→O, 1→C
    pq.write_table(pa.table({
        "user_id": pa.array([7, 6, 5, 4], pa.int64())}),
        tmp_path / "events.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([7, 6, 3, 2], pa.int64())}),
        tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([7, 5, 3, 1], pa.int64())}),
        tmp_path / "customer.parquet")
    out = key_venn3(str(tmp_path))
    assert len(out) == 7
    assert (out["n_keys"] == 1).all()


# ------------------------------------------------------ proration


def test_proration_remainder_first_month_and_inversion(ray_session,
                                                       tmp_path):
    """cents=1000 over 3 months → 334/333/333 (remainder to the FIRST
    month); an inverted ship<order span must normalize, not vanish."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        revenue_proration_monthly,
    )

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_extendedprice": pa.array([10.00, 2.00], pa.float64()),
        "l_shipdate": pa.array(pd.to_datetime(
            ["1995-03-15", "1995-01-10"]), pa.timestamp("us"))}),
        tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array(pd.to_datetime(
            ["1995-01-05", "1995-02-20"]), pa.timestamp("us"))}),
        tmp_path / "orders.parquet")
    out = revenue_proration_monthly(str(tmp_path)).set_index("month")
    # item 1: 1000 cents over months 0..2 → 334, 333, 333
    # item 2 (inverted): 200 cents over months 0..1 → 100, 100
    assert out.loc[0, "cents"] == 334 + 100
    assert out.loc[1, "cents"] == 333 + 100
    assert out.loc[2, "cents"] == 333
    assert int(out["cents"].sum()) == 1200


# ---------------------------------------------------- SNM blocking


def test_snm_straddles_one_row_middle_bucket(ray_session, tmp_path):
    """A window-2 pair that jumps over a single-row bucket must still be
    produced by the boundary halo; the close pair is found."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        snm_adjacent_pairs,
    )

    tbl = pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": pa.array(["apple1", "bzz", "capple1"], pa.string()),
    })
    out = snm_adjacent_pairs(_write(tmp_path, "part", tbl)).iloc[0]
    # sorted: apple1, bzz, capple1 → pairs (a,b),(a,c),(b,c)
    assert out["n_pairs"] == 3
    assert out["n_match_lev1"] == 1     # levenshtein(apple1, capple1)=1


# ---------------------------------------------------- FIFO matching


def test_fifo_lot_classes_from_cumulative_curves(ray_session, tmp_path):
    """Buys [5,3,2] vs sells 6: one full, one partial, one open lot;
    matched = 6.  A sells-only user adds nothing."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        fifo_lot_matching,
    )

    S = 1_000_000
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array([0, S, 2 * S, 3 * S, 4 * S, 0],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["purchase", "purchase", "purchase",
                                "click", "click", "click"], pa.string()),
        "value": pa.array([0.05, 0.03, 0.02, 0.04, 0.02, 9.99],
                          pa.float64()),
    })
    out = fifo_lot_matching(_write(tmp_path, "events", tbl)).iloc[0]
    assert out["full_lots"] == 1
    assert out["partial_lots"] == 1
    assert out["open_lots"] == 1
    assert out["matched_cents"] == 6


# ----------------------------------------------------- global NTILE


def test_ntile_all_tied_splits_by_custkey(ray_session, tmp_path):
    """7 customers with IDENTICAL acctbal: every boundary falls inside
    one tie group, so the split is purely the custkey tie-resolution
    path — NTILE(4) sizes must be [2, 2, 2, 1] (remainder to the FIRST
    tiles)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        acctbal_ntile_quartiles,
    )

    tbl = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "c_acctbal": pa.array([5.0] * 7, pa.float64()),
    })
    out = acctbal_ntile_quartiles(_write(tmp_path, "customer", tbl))
    assert list(out["quartile"]) == [1, 2, 3, 4]
    assert list(out["n_customers"]) == [2, 2, 2, 1]
    assert list(out["sum_cents"]) == [1000, 1000, 1000, 500]


# ------------------------------------------------------- Theil–Sen


def test_theilsen_resists_outlier_month(ray_session, tmp_path):
    """y = 100 + 10·month for months 0..3 plus a wild outlier at month
    4: the median pairwise slope stays exactly 10 cents/month (OLS
    would be in the thousands)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        theilsen_nation_trend,
    )

    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_nationkey": pa.array([0], pa.int32())}),
        tmp_path / "customer.parquet")
    months = pd.to_datetime(["1995-01-15", "1995-02-15", "1995-03-15",
                             "1995-04-15", "1995-05-15"])
    pq.write_table(pa.table({
        "o_custkey": pa.array([1] * 5, pa.int64()),
        "o_totalprice": pa.array([1.00, 1.10, 1.20, 1.30, 100.00],
                                 pa.float64()),
        "o_orderdate": pa.array(months, pa.timestamp("us"))}),
        tmp_path / "orders.parquet")
    out = theilsen_nation_trend(str(tmp_path)).iloc[0]
    assert out["n_nationkey"] == 0
    assert out["n_pairs"] == 10
    assert out["slope_cents_per_month"] == 10.0


# --------------------------------------------- interval overlaps


def test_interval_overlap_ties_and_zero_duration(ray_session, tmp_path):
    """Equal-start intervals overlap; zero-duration (cents rounds to 0)
    and null-value rows are not intervals at all."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        interval_overlap_pairs,
    )

    S = 1_000_000
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array([0, 0, 5 * S, 100 * S, 0, 0], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2, 3], pa.int64()),
        # durations (s): A=10, D=1, B=10, C=1; user2 null; user3 → 0
        "value": pa.array([0.10, 0.01, 0.10, 0.01, None, 0.004],
                          pa.float64()),
    })
    out = interval_overlap_pairs(_write(tmp_path, "events", tbl)).iloc[0]
    # user 1 pairs: (A,B) and (A,D) overlap; (D,B), (·,C) disjoint
    assert out["n_pairs"] == 2
    assert out["n_users_overlap"] == 1
    assert out["max_user_pairs"] == 2


# ----------------------------------------------- correlation matrix


def test_corr_matrix_exact_unit_correlations(ray_session, tmp_path):
    """Perfectly (anti-)correlated integer columns give EXACT ±1.0 —
    the integer-moments path has no float accumulation to drift."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        lineitem_corr_matrix,
    )

    tbl = pa.table({
        "l_quantity": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "l_discount": pa.array([0.02, 0.04, 0.06], pa.float64()),
        "l_tax": pa.array([0.08, 0.04, 0.00], pa.float64()),
    })
    out = lineitem_corr_matrix(_write(tmp_path, "lineitem", tbl))
    got = dict(zip(zip(out["var_x"], out["var_y"]), out["corr"]))
    assert got[("quantity", "discount")] == 1.0
    assert got[("quantity", "tax")] == -1.0
    assert got[("discount", "tax")] == -1.0


# ---------------------------------------------------- zone-map audit


def test_zonemap_prunes_other_month_row_groups(ray_session, tmp_path):
    """Months 11/12/13 with 3/5/2 rows at row_group_rows=2: only month
    12's row groups survive the month_idx=12 predicate; every other
    row group is pruned from the FOOTERS alone."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        zonemap_prune_audit,
    )

    months = [11] * 3 + [12] * 5 + [13] * 2
    dates = pd.to_datetime([f"{1995 + m // 12}-{m % 12 + 1:02d}-10"
                            for m in months])
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, 11), pa.int64()),
        "o_orderdate": pa.array(dates, pa.timestamp("us"))}),
        tmp_path / "orders.parquet")
    out = zonemap_prune_audit(str(tmp_path), row_group_rows=2).iloc[0]
    assert out["n_row_groups"] == 2 + 3 + 1
    assert out["n_pruned"] == 2 + 1
    assert out["rows_scanned"] == 5
    assert out["n_rows_total"] == 10


# -------------------------------------------------------- unpivot


def test_unpivot_per_attr_profiles(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        part_attributes_unpivot,
    )

    tbl = pa.table({
        "p_size": pa.array([3, 10], pa.int32()),
        "p_retailprice": pa.array([1.25, 9.99], pa.float64()),
    })
    out = part_attributes_unpivot(
        _write(tmp_path, "part", tbl)).set_index("attr")
    assert out.loc["size", "sum_val"] == 13
    assert out.loc["size", "min_val"] == 3
    assert out.loc["retail_cents", "sum_val"] == 125 + 999
    assert out.loc["retail_cents", "max_val"] == 999


# ------------------------------------------------- cross-correlation


def test_crosscorr_detects_exact_2h_shift(ray_session, tmp_path):
    """purchases[h] = views[h-2] exactly → corr at lag +2 is EXACTLY
    1.0 and is the argmax (purchases trail views by 2 hours)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        event_crosscorr_lag,
    )

    counts = [1, 2, 1, 3, 1, 2, 1, 4, 1, 2]
    rows = []
    for h, c in enumerate(counts):
        rows += [("view", h)] * c + [("purchase", h + 2)] * c
    H = 3_600_000_000
    tbl = pa.table({
        "ts": pa.array([h * H for _, h in rows], pa.timestamp("us")),
        "event_type": pa.array([t for t, _ in rows], pa.string()),
    })
    out = event_crosscorr_lag(_write(tmp_path, "events", tbl))
    row2 = out.set_index("lag").loc[2]
    assert row2["corr"] == 1.0
    assert row2["n_hours"] == 10  # span 0..11 dense, minus |lag|
    assert out.loc[out["corr"].idxmax(), "lag"] == 2


# --------------------------------------------- co-partitioned join


def test_bucket_join_matches_plain_join(ray_session, tmp_path):
    """Keys land in different buckets; a lineitem with no order is
    dropped by the inner bucket-pair join."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        copartitioned_bucket_join,
    )

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "3-MEDIUM"],
                                    pa.string())}),
        tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 99], pa.int64()),
        "l_extendedprice": pa.array([10.0, 20.0, 5.0, 7.0],
                                    pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.2, 0.0], pa.float64())}),
        tmp_path / "lineitem.parquet")
    out = copartitioned_bucket_join(
        str(tmp_path)).set_index("o_orderpriority")
    assert out.loc["1-URGENT", "revenue_cents"] == 900 + 2000
    assert out.loc["1-URGENT", "n_lineitems"] == 2
    assert out.loc["3-MEDIUM", "revenue_cents"] == 400
    assert 99 not in out.index and len(out) == 2


# ------------------------------------------------------ Z-order


def test_zorder_prunes_both_dimensions(ray_session, tmp_path):
    """A 64-custkey × 4-month grid written z-ordered with 16-row row
    groups must prune row groups for BOTH the custkey band and the
    month predicate — the property a single-column sort cannot give."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        zorder_write_audit,
    )

    # 16×16 Morton grid: every 16 consecutive z values are one aligned
    # 4×4 (custkey × month) tile, so each row group's min/max is tight
    # in BOTH dimensions
    cks, ms = np.meshgrid(np.arange(0, 16), np.arange(0, 16))
    dates = pd.to_datetime([f"{1995 + m // 12}-{m % 12 + 1:02d}-05"
                            for m in ms.ravel()])
    pq.write_table(pa.table({
        "o_custkey": pa.array(cks.ravel(), pa.int64()),
        "o_orderdate": pa.array(dates, pa.timestamp("us"))}),
        tmp_path / "orders.parquet")
    out = zorder_write_audit(str(tmp_path), row_group_rows=16).iloc[0]
    assert out["n_rows_total"] == 256
    assert out["n_row_groups"] == 16
    # custkey band 10..40 hits tiles with custkeys 8..15 → 8 of 16
    assert out["pruned_cust"] == 8
    # month 12 lives in the 12..15 tile row only → 12 of 16 pruned
    assert out["pruned_month"] == 12
    # every matching row is inside a scanned group
    assert out["scanned_cust_rows"] >= 6 * 16     # custkeys 10..15
    assert out["scanned_month_rows"] >= 16        # month 12


# ----------------------------------------------- sequence signatures


def test_signature_orders_by_ts_then_event_id(ray_session, tmp_path):
    """Two users share the signature 'view,purchase' only if the
    (ts, event_id) order is respected — equal timestamps fall back to
    event_id order."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        user_event_signature_top,
    )

    tbl = pa.table({
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([0, 1_000_000, 5, 5], pa.timestamp("us")),
        "event_id": pa.array([10, 11, 21, 20], pa.int64()),
        "event_type": pa.array(["view", "purchase", "purchase", "view"],
                               pa.string()),
    })
    out = user_event_signature_top(_write(tmp_path, "events", tbl))
    got = dict(zip(out["signature"], out["n_users"]))
    assert got == {"view,purchase": 2}


# --------------------------------------------------- postings gaps


def test_postings_gap_profile(ray_session, tmp_path):
    """Token in docs {1,2,3,5} → gaps 1,1,2; a single-doc token is
    excluded (no gaps exist)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        postings_gap_stats,
    )

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["alpha beta", "alpha", "alpha", "solo",
                          "alpha beta"], pa.string()),
    })
    out = postings_gap_stats(
        _write(tmp_path, "documents", tbl)).set_index("token")
    assert out.loc["alpha", "n_docs"] == 4
    assert out.loc["alpha", "min_gap"] == 1
    assert out.loc["alpha", "max_gap"] == 2
    assert out.loc["alpha", "n_gap1"] == 2
    assert out.loc["beta", "n_docs"] == 2
    assert out.loc["beta", "min_gap"] == 4
    assert "solo" not in out.index


# ---------------------------------------------------- rank ≤ k ties


def test_top_with_ties_includes_boundary_tie_group(ray_session,
                                                   tmp_path):
    """Prices 100×3, 90×5, 80×4, 70×1: rank(80)=9 ≤ 10, so ALL four
    80s qualify → 12 rows, not 10; 70 (rank 13) is out."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        top_orders_with_ties,
    )

    prices = [1.00] * 3 + [0.90] * 5 + [0.80] * 4 + [0.70]
    tbl = pa.table({
        "o_orderkey": pa.array(range(1, len(prices) + 1), pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64()),
    })
    out = top_orders_with_ties(_write(tmp_path, "orders", tbl))
    assert len(out) == 12
    assert list(out["rnk"].unique()) == [1, 4, 9]
    assert 70 not in out["cents"].to_numpy()


# ------------------------------------------- sliding 7d count distinct


def test_rolling_7d_interval_union(ray_session, tmp_path):
    """User A active on days 1 and 4 (overlapping windows → union, not
    double count), user B on day 1 only, user C on days 1 and 20 (gap
    longer than the window → two disjoint islands).  Day 4 must count A
    once (via either active day) plus B (day 1 covers days 1-7) plus C."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        rolling_7d_distinct_users,
    )

    def d(day):
        return np.datetime64(f"2024-01-{day:02d}T12:00:00", "us")

    rows = [(1, d(1)), (1, d(4)), (1, d(4)),  # dup event same day
            (2, d(1)), (3, d(1)), (3, d(20))]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    out = rolling_7d_distinct_users(
        _write(tmp_path, "events", tbl)).set_index("day")
    # activity days are 1, 4, 20 only
    assert list(out.index) == ["2024-01-01", "2024-01-04", "2024-01-20"]
    assert out.loc["2024-01-01", "n_users_7d"] == 3
    assert out.loc["2024-01-04", "n_users_7d"] == 3  # A counted ONCE
    assert out.loc["2024-01-20", "n_users_7d"] == 1  # C's second island


# ----------------------------------------------------- TPC-H Q14 / Q18


def test_promo_share_exact_integer_arithmetic(ray_session, tmp_path):
    """Two parts (one PROMO), one month: share must be the exact ratio of
    integer micro-revenues, including the discount basis points."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        promo_revenue_share,
    )

    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO BURNISHED TIN", "STANDARD PLATED BRASS"]),
    })
    li = pa.table({
        "l_partkey": pa.array([1, 2], pa.int64()),
        "l_shipdate": pa.array([np.datetime64("2024-03-05", "us")] * 2),
        "l_extendedprice": pa.array([100.00, 300.00], pa.float64()),
        "l_discount": pa.array([0.05, 0.00], pa.float64()),
    })
    sf = _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li)
    out = promo_revenue_share(sf)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["month"] == "2024-03"
    assert r["promo_rev"] == 10000 * (10000 - 500)      # 95_000_000
    assert r["total_rev"] == r["promo_rev"] + 30000 * 10000
    assert r["promo_share"] == 95_000_000 / 395_000_000


def test_large_volume_having_boundary(ray_session, tmp_path):
    """HAVING sum(qty) > 300 is strict: an order at exactly 300 is out,
    301 is in — partial sums split across batches must still land exact."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        large_volume_customers,
    )

    li = pa.table({
        "l_orderkey": pa.array([1] * 3 + [2] * 3, pa.int64()),
        "l_quantity": pa.array([100.0, 100.0, 100.0,
                                100.0, 100.0, 101.0], pa.float64()),
    })
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 20], pa.int64()),
        "o_totalprice": pa.array([111.11, 222.22], pa.float64()),
    })
    sf = _write(tmp_path, "lineitem", li)
    _write(tmp_path, "orders", orders)
    out = large_volume_customers(sf)
    assert list(out["o_orderkey"]) == [2]
    assert list(out["total_qty"]) == [301]
    assert list(out["cents"]) == [22222]


# --------------------------------------------------- time-travel read


def test_time_travel_delete_is_key_list_not_predicate(ray_session,
                                                      tmp_path):
    """Appended keys are base_key + 2^40, and 2^40 % 10 == 6, so the
    appended copy of key 7 lands on 3 (mod 10) — the delete predicate's
    residue.  Deletes are an explicit KEY LIST snapshot, so the appended
    row must survive in v2; v1 must be byte-identical to the source."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        time_travel_read,
    )

    orders = pa.table({
        "o_orderkey": pa.array([3, 7, 10, 13], pa.int64()),
        "o_orderstatus": pa.array(["F", "O", "O", "P"]),
        "o_totalprice": pa.array([1.00, 2.00, 3.00, 4.00], pa.float64()),
    })
    out = time_travel_read(_write(tmp_path, "orders", orders))
    v1 = out[out["snapshot"] == "v1"].set_index("o_orderstatus")
    v2 = out[out["snapshot"] == "v2"].set_index("o_orderstatus")
    assert v1["n_orders"].sum() == 4 and v1["cents"].sum() == 1000
    # v2: keys 3 (F) and 13 (P) deleted; key 7's 'A' copy appended
    assert "F" not in v2.index and "P" not in v2.index
    assert v2.loc["O", "n_orders"] == 2          # keys 7 and 10 survive
    assert v2.loc["A", "n_orders"] == 1          # the appended copy LIVES
    assert v2.loc["A", "cents"] == 200


# ------------------------------------------ exact PERCENTILE_CONT 2-scan


def test_percentile_cont_bit_equal_on_planted(ray_session, tmp_path):
    """Single-row edge (all percentiles collapse to the value) and an
    all-equal table (degenerate histogram domain, width clamped to 1)
    plus a tiny spread table checked bit-for-bit against DuckDB's
    quantile_cont."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        price_percentile_cont,
    )

    one = pa.table({"o_orderkey": pa.array([1], pa.int64()),
                    "o_totalprice": pa.array([10.00], pa.float64())})
    for sub in ("a", "b", "c"):
        (tmp_path / sub).mkdir()
    out = price_percentile_cont(_write(tmp_path / "a", "orders", one))
    assert list(out["value"]) == [1000.0] * 4

    prices = [1.00, 2.00, 3.00, 4.00, 5.00, 6.00, 7.00]
    tbl = pa.table({
        "o_orderkey": pa.array(range(7), pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64())})
    out = price_percentile_cont(
        _write(tmp_path / "b", "orders", tbl)).set_index("pct")
    con = duckdb.connect()
    for p, lbl in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                   (0.9, "p90")]:
        want = con.execute(
            "SELECT quantile_cont(CAST(round(v*100) AS BIGINT), ?) "
            "FROM (SELECT unnest(?) AS v)", [p, prices]).fetchone()[0]
        assert out.loc[lbl, "value"] == want, lbl

    same = pa.table({"o_orderkey": pa.array(range(5), pa.int64()),
                     "o_totalprice": pa.array([42.42] * 5, pa.float64())})
    out = price_percentile_cont(_write(tmp_path / "c", "orders", same))
    assert list(out["value"]) == [4242.0] * 4


# ----------------------------------------------------- ROLLUP levels


def test_rollup_subtotals_and_grand_total(ray_session, tmp_path):
    """Two regions, three nations; a customer with no orders adds
    nothing; subtotal and grand-total rows must sum the detail."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        region_nation_rollup,
    )

    region = pa.table({"r_regionkey": pa.array([0, 1], pa.int32()),
                       "r_name": pa.array(["EAST", "WEST"])})
    nation = pa.table({"n_nationkey": pa.array([0, 1, 2], pa.int32()),
                       "n_name": pa.array(["AAA", "BBB", "CCC"]),
                       "n_regionkey": pa.array([0, 0, 1], pa.int32())})
    customer = pa.table({
        "c_custkey": pa.array([10, 20, 30, 40], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2, 2], pa.int32())})  # 40: no orders
    orders = pa.table({
        "o_custkey": pa.array([10, 10, 20, 30], pa.int64()),
        "o_totalprice": pa.array([1.00, 2.00, 4.00, 8.00], pa.float64())})
    sf = _write(tmp_path, "region", region)
    _write(tmp_path, "nation", nation)
    _write(tmp_path, "customer", customer)
    _write(tmp_path, "orders", orders)
    out = region_nation_rollup(sf).set_index(["region", "nation"])
    assert out.loc[("EAST", "AAA"), "cents"] == 300
    assert out.loc[("EAST", "BBB"), "cents"] == 400
    assert out.loc[("WEST", "CCC"), "cents"] == 800
    assert out.loc[("EAST", "ALL"), "cents"] == 700
    assert out.loc[("WEST", "ALL"), "cents"] == 800
    assert out.loc[("ALL", "ALL"), "cents"] == 1500
    assert out.loc[("ALL", "ALL"), "n_orders"] == 4
    assert len(out) == 6


# --------------------------------------------- anti-entropy narrowing


def test_antientropy_finds_planted_faults(ray_session, tmp_path):
    """Keys 0..1000, price i cents: the corruption band is [200, 210]
    (+1 cent) and the dropped band is [600, 610]; the diff must name
    exactly those keys with the right classes and values."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        replica_antientropy_repair,
    )

    n = 1001
    tbl = pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_totalprice": pa.array([i / 100.0 for i in range(n)],
                                 pa.float64())})
    out = replica_antientropy_repair(_write(tmp_path, "orders", tbl))
    ch = out[out["kind"] == "changed"]
    ms = out[out["kind"] == "missing_b"]
    assert list(ch["o_orderkey"]) == list(range(200, 211))
    assert (ch["cents_b"] == ch["cents_a"] + 1).all()
    assert list(ms["o_orderkey"]) == list(range(600, 611))
    assert (ms["cents_b"] == -1).all()
    assert (ms["cents_a"] == ms["o_orderkey"]).all()


# ------------------------------------------------- sorted-run compaction


def test_compaction_ordered_checksum_and_disjoint(ray_session, tmp_path):
    """Shuffled keys in, one sorted range-disjoint layout out; the
    order-dependent checksum equals the hand-computed Σ rank·key."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        sorted_run_compaction,
    )

    keys = [5, 3, 9, 14, 1, 7, 12, 0]
    tbl = pa.table({"o_orderkey": pa.array(keys, pa.int64())})
    out = sorted_run_compaction(_write(tmp_path, "orders", tbl))
    s = sorted(keys)
    want_cs = sum(i * k for i, k in enumerate(s)) % (1 << 64)
    assert out["n_rows"].iloc[0] == len(keys)
    assert out["min_key"].iloc[0] == 0 and out["max_key"].iloc[0] == 14
    assert out["n_overlapping_files"].iloc[0] == 0
    assert out["ordered_checksum"].iloc[0] == want_cs


# --------------------------------------------------------- TPC-H Q5


def test_q5_local_supplier_predicate(ray_session, tmp_path):
    """The c_nationkey = s_nationkey cross-dimension predicate: order 1's
    lineitems split between a LOCAL supplier (counted) and a foreign one
    (dropped); order 2 is outside the date window (dropped); customer 30
    is outside the region (dropped)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q5_local_supplier_revenue,
    )

    region = pa.table({"r_regionkey": pa.array([0, 1], pa.int32()),
                       "r_name": pa.array(["ASIA", "EUROPE"])})
    nation = pa.table({"n_nationkey": pa.array([0, 1, 2], pa.int32()),
                       "n_name": pa.array(["JAPAN", "CHINA", "FRANCE"]),
                       "n_regionkey": pa.array([0, 0, 1], pa.int32())})
    supplier = pa.table({"s_suppkey": pa.array([100, 200], pa.int64()),
                         "s_nationkey": pa.array([0, 1], pa.int32())})
    customer = pa.table({"c_custkey": pa.array([10, 30], pa.int64()),
                         "c_nationkey": pa.array([0, 2], pa.int32())})
    d_in = np.datetime64("1996-06-01", "us")
    d_out = np.datetime64("1995-06-01", "us")
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 10, 30], pa.int64()),
        "o_orderdate": pa.array([d_in, d_out, d_in])})
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_suppkey": pa.array([100, 200, 100, 100], pa.int64()),
        "l_extendedprice": pa.array([10.0, 20.0, 40.0, 80.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0])})
    sf = _write(tmp_path, "region", region)
    for n, t in [("nation", nation), ("supplier", supplier),
                 ("customer", customer), ("orders", orders),
                 ("lineitem", li)]:
        _write(tmp_path, n, t)
    out = q5_local_supplier_revenue(sf)
    # only order 1 × supplier 100 (JAPAN local to customer 10) survives
    assert len(out) == 1
    assert out.iloc[0]["n_name"] == "JAPAN"
    assert out.iloc[0]["rev_micros"] == 1000 * 10000


# --------------------------------------------- props contract nulls


def test_props_field_stats_contract_violations(ray_session, tmp_path):
    """Malformed props count as bad; an all-bad type gets the −1
    sentinel for min/max; negative k parses."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        props_field_stats,
    )

    tbl = pa.table({
        "event_type": pa.array(["a", "a", "a", "b", "b"]),
        "props": pa.array(['{"k": 5}', '{"k": -7}', '{"k": oops}',
                           "not json", '{"k": 3.5}']),
    })
    out = props_field_stats(
        _write(tmp_path, "events", tbl)).set_index("event_type")
    assert out.loc["a", "n"] == 3 and out.loc["a", "n_bad"] == 1
    assert out.loc["a", "sum_k"] == -2
    assert out.loc["a", "min_k"] == -7 and out.loc["a", "max_k"] == 5
    assert out.loc["b", "n_bad"] == 2
    assert out.loc["b", "min_k"] == -1 and out.loc["b", "max_k"] == -1


# ------------------------------------------------- basket rules


def test_basket_min_support_and_lift(ray_session, tmp_path):
    """Pair (1,2) co-occurs 3× (kept, boundary), (1,3) only 2×
    (pruned); duplicate lineitems of the same part in one order count
    once.  Lift checked against the exact integer formula."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        basket_association_rules,
    )

    baskets = {1: [1, 2], 2: [1, 2], 3: [1, 2, 2], 4: [1, 3], 5: [1, 3],
               6: [2], 7: [3]}
    ok, pk = [], []
    for o, parts in baskets.items():
        for p in parts:
            ok.append(o)
            pk.append(p)
    li = pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                   "l_partkey": pa.array(pk, pa.int64())})
    out = basket_association_rules(_write(tmp_path, "lineitem", li))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["part_a"], r["part_b"]) == (1, 2)
    assert r["n_ab"] == 3 and r["n_a"] == 5 and r["n_b"] == 4
    N = 7
    assert r["lift"] == (float(N) * 3.0) / (5.0 * 4.0)
    assert r["support"] == 3.0 / N and r["confidence"] == 3.0 / 5.0


# --------------------------------------------- small-file bin packing


def test_small_file_compaction_packs_and_conserves(ray_session,
                                                   tmp_path):
    """A tiny target forces multiple bins; every compacted file stays
    under target (no single input exceeds it), and rows survive."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        small_file_compaction,
    )

    n = 2000
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([i * 7 % 101 for i in range(n)], pa.int64()),
        "event_type": pa.array(["x"] * n),
        "ts": pa.array([np.datetime64("2024-01-01", "us")] * n),
        "value": pa.array([0.0] * n),
        "props": pa.array(["{}"] * n)})
    sf = _write(tmp_path, "events", tbl)
    out_root = str(tmp_path / "compact_out")
    res = small_file_compaction(sf, target_bytes=6000, out_root=out_root)
    assert res["n_rows"].iloc[0] == n
    assert res["n_oversize_bins"].iloc[0] == 0
    out_dir = os.path.join(out_root, "compacted")
    files = os.listdir(out_dir)
    assert len(files) >= 2  # packing actually happened
    sizes = [os.path.getsize(os.path.join(out_dir, f)) for f in files]
    import pyarrow.parquet as _pq
    total = sum(_pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
                for f in files)
    assert total == n


# ------------------------------------------------------ SCD2 build


def test_scd2_runs_versions_and_open_row(ray_session, tmp_path):
    """User 0 (sampled: 0 % 25 == 0): types A,A,B,A → 3 versions with
    chained validity; the last run stays open (−1); same-ts ties order
    by event_id."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        scd2_user_state_history,
    )

    def ts(m):
        return np.datetime64(f"2024-01-01T00:{m:02d}:00", "us")

    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([ts(0), ts(1), ts(2), ts(3), ts(0)]),
        "user_id": pa.array([0, 0, 0, 0, 7], pa.int64()),  # 7: unsampled
        "event_type": pa.array(["A", "A", "B", "A", "X"]),
    })
    out = scd2_user_state_history(_write(tmp_path, "events", tbl))
    assert list(out["user_id"].unique()) == [0]
    assert list(out["version"]) == [1, 2, 3]
    assert list(out["event_type"]) == ["A", "B", "A"]
    e = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    m = 60_000_000
    assert list(out["valid_from_us"]) == [e, e + 2 * m, e + 3 * m]
    assert list(out["valid_to_us"]) == [e + 2 * m, e + 3 * m, -1]


# ------------------------------------------------ bloom sidecar skip


def test_bloom_sidecar_actually_skips_files(ray_session, tmp_path):
    """Probe users 1,2,3 live only in shard 0 (event_id ≡ 0 mod 24);
    the sidecar plan must read strictly fewer files than exist and the
    aggregates must still be exact."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        bloom_sidecar_point_lookup,
    )

    eid, uid, val = [], [], []
    for i in range(3):  # probe users in shard 0 only
        eid.append(i * 24)
        uid.append(i + 1)
        val.append(float(i + 1))
    for j in range(200):  # filler users spread over all shards
        eid.append(j + 1000)
        uid.append(100 + j)
        val.append(0.5)
    tbl = pa.table({"event_id": pa.array(eid, pa.int64()),
                    "user_id": pa.array(uid, pa.int64()),
                    "value": pa.array(val, pa.float64())})
    audit = {}
    out = bloom_sidecar_point_lookup(
        _write(tmp_path, "events", tbl),
        out_root=str(tmp_path / "bloom"), _audit=audit)
    assert audit["n_files_read"] < audit["n_files_total"]
    assert list(out["user_id"]) == [1, 2, 3]
    assert list(out["n_events"]) == [1, 1, 1]
    assert list(out["value_cents"]) == [100, 200, 300]


# -------------------------------------------------- keyset pagination


def test_keyset_cursor_splits_tie_group_exactly(ray_session, tmp_path):
    """A 20-way tie at the page-1/page-2 boundary: the cursor carries
    (cents, orderkey), so page 2 resumes mid-tie with no dup or skip."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        keyset_pagination_orders,
    )

    prices = [9.99] * 5 + [5.55] * 20 + [1.11] * 20
    tbl = pa.table({
        "o_orderkey": pa.array(range(len(prices)), pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64())})
    out = keyset_pagination_orders(_write(tmp_path, "orders", tbl))
    assert len(out) == 45
    assert out["o_orderkey"].is_unique
    p1 = out[out["page"] == 1]
    p2 = out[out["page"] == 2]
    # page 1 = five 999s + first ten 555s (by orderkey); page 2 resumes
    # at the 11th 555
    assert list(p1["cents"]) == [999] * 5 + [555] * 10
    assert list(p2["cents"]) == [555] * 10 + [111] * 5
    assert list(p2["o_orderkey"])[:10] == list(range(15, 25))


# ------------------------------------------------- FK containment


def test_fk_containment_counts_dangling_keys(ray_session, tmp_path):
    """Orders references custkeys {1,2,9}; customer holds {1,2,3} →
    containment 2/3 for that pair."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        fk_containment_audit,
    )

    sf = _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([1, 2, 9, 2], pa.int64())}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([1], pa.int64()),
        "l_suppkey": pa.array([1], pa.int64())}))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1], pa.int64())}))
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1], pa.int64())}))
    _write(tmp_path, "events", pa.table({
        "user_id": pa.array([1, 3], pa.int64())}))
    out = fk_containment_audit(sf).set_index("candidate")
    r = out.loc["orders.o_custkey->customer.c_custkey"]
    assert r["n_child"] == 3 and r["n_contained"] == 2
    assert r["containment"] == 2.0 / 3.0
    assert out.loc["events.user_id->customer.c_custkey",
                   "containment"] == 1.0


# ----------------------------------------------------------- TPC-H Q3


def test_q3_filters_and_tie_order(ray_session, tmp_path):
    """Order 1 qualifies (BUILDING, ordered before / shipped after the
    split); order 2 fails the segment, order 3 the order date; a
    lineitem shipped before the split is excluded from order 1's sum."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q3_shipping_priority,
    )

    before = np.datetime64("1997-06-01", "us")
    after = np.datetime64("1998-06-01", "us")
    customer = pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "MACHINERY"])})
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 20, 10], pa.int64()),
        "o_orderdate": pa.array([before, before, after])})
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_shipdate": pa.array([after, before, after, after]),
        "l_extendedprice": pa.array([10.0, 99.0, 50.0, 70.0]),
        "l_discount": pa.array([0.0] * 4)})
    sf = _write(tmp_path, "customer", customer)
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = q3_shipping_priority(sf)
    assert len(out) == 1
    assert out.iloc[0]["o_orderkey"] == 1
    assert out.iloc[0]["rev_micros"] == 1000 * 10000  # only the late ship
    assert out.iloc[0]["o_orderdate"] == "1997-06-01"


# ---------------------------------------------------------- TPC-H Q10


def test_q10_returns_only_and_inner_join(ray_session, tmp_path):
    """Non-'R' lineitems are excluded; an order whose custkey has no
    customer row drops out of the inner join."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q10_returned_item_revenue,
    )

    customer = pa.table({
        "c_custkey": pa.array([10], pa.int64()),
        "c_name": pa.array(["Customer#10"])})
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 99], pa.int64())})  # 99 dangling
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "R"]),
        "l_extendedprice": pa.array([10.0, 99.0, 50.0]),
        "l_discount": pa.array([0.1, 0.0, 0.0])})
    sf = _write(tmp_path, "customer", customer)
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = q10_returned_item_revenue(sf)
    assert len(out) == 1
    assert out.iloc[0]["c_custkey"] == 10
    assert out.iloc[0]["rev_micros"] == 1000 * (10000 - 1000)


# ------------------------------------- grouped percentile_cont


def test_grouped_percentile_cont_matches_duckdb(ray_session, tmp_path):
    """Per-type interpolated percentiles bit-equal to quantile_cont,
    including a single-row group."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        value_percentile_cont_by_type,
    )

    vals = {"a": [1.00, 2.00, 3.00, 4.00, 100.00], "b": [7.77]}
    et, v = [], []
    for t, vv in vals.items():
        et += [t] * len(vv)
        v += vv
    tbl = pa.table({"event_type": pa.array(et),
                    "value": pa.array(v, pa.float64())})
    out = value_percentile_cont_by_type(
        _write(tmp_path, "events", tbl)).set_index("event_type")
    con = duckdb.connect()
    for t, vv in vals.items():
        for p, col in [(0.5, "p50"), (0.9, "p90")]:
            want = con.execute(
                "SELECT quantile_cont(CAST(round(v*100) AS BIGINT), ?) "
                "FROM (SELECT unnest(?) AS v)", [p, vv]).fetchone()[0]
            assert out.loc[t, col] == want, (t, col)
    assert out.loc["b", "n"] == 1


# ------------------------------------------------ fault injection


def test_retry_preserves_exactly_once_aggregation(ray_session,
                                                  tmp_path):
    """The probe batch's worker dies mid-task; Ray re-runs it and the
    totals come out exactly once — no drop, no double count."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        retry_fault_injection_sum,
    )

    n = 500
    tbl = pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),  # includes key 0
        "o_totalprice": pa.array([1.00] * n, pa.float64())})
    out = retry_fault_injection_sum(_write(tmp_path, "orders", tbl))
    assert out["n_rows"].iloc[0] == n
    assert out["cents"].iloc[0] == 100 * n
    assert out["n_injected_failures"].iloc[0] == 1


# ----------------------------------------------------------- TPC-H Q16


def test_q16_blacklist_and_distinct(ray_session, tmp_path):
    """Supplier 3 (blacklisted: %3==0) never counts; duplicate
    lineitems of the same (part, supplier) count once."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q16_supplier_part_counts,
    )

    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["B1", "B2"]),
        "p_size": pa.array([5, 9], pa.int32())})
    li = pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([4, 4, 5, 3, 4], pa.int64())})
    sf = _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li)
    out = q16_supplier_part_counts(sf).set_index(["p_brand", "p_size"])
    assert out.loc[("B1", 5), "supplier_cnt"] == 2  # 4 and 5, not 3
    assert out.loc[("B2", 9), "supplier_cnt"] == 1


# ----------------------------------------------------------- TPC-H Q22


def test_q22_integer_average_boundary(ray_session, tmp_path):
    """Balances 100, 200, 300 → avg 200: the exactly-average customer
    is EXCLUDED (strict >) with no float wobble; a recent order
    disqualifies, an old one does not."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q22_sales_opportunity,
    )

    customer = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([0, 0, 0, 1], pa.int32()),
        "c_acctbal": pa.array([1.00, 2.00, 3.00, 3.00], pa.float64())})
    old = np.datetime64("1999-06-01", "us")
    recent = np.datetime64("2000-06-01", "us")
    orders = pa.table({
        "o_custkey": pa.array([4, 3], pa.int64()),
        "o_orderdate": pa.array([recent, old])})
    sf = _write(tmp_path, "customer", customer)
    _write(tmp_path, "orders", orders)
    out = q22_sales_opportunity(sf).set_index("nationkey")
    # avg = 200: cust 2 (==avg) out, cust 3 (>avg, old order only) in,
    # cust 4 (>avg but recent order) out
    assert list(out.index) == [0]
    assert out.loc[0, "n_cust"] == 1 and out.loc[0, "cents"] == 300


# ------------------------------------------------ MoR→CoW rewrite


def test_mor_to_cow_applies_deletes_once(ray_session, tmp_path):
    """Keys 3,13 deleted, key 7's 'A' copy appended; the rewritten v3
    summary reflects both with zero delete files left."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        mor_to_cow_rewrite,
    )

    orders = pa.table({
        "o_orderkey": pa.array([3, 7, 10, 13], pa.int64()),
        "o_orderstatus": pa.array(["F", "O", "O", "P"]),
        "o_totalprice": pa.array([1.00, 2.00, 3.00, 4.00], pa.float64())})
    out = mor_to_cow_rewrite(
        _write(tmp_path, "orders", orders)).set_index("o_orderstatus")
    assert "F" not in out.index and "P" not in out.index
    assert out.loc["O", "n_orders"] == 2
    assert out.loc["A", "n_orders"] == 1 and out.loc["A", "cents"] == 200
    assert (out["n_delete_files"] == 0).all()


# ------------------------------------------------ adaptive salting


def test_adaptive_salt_detects_and_medians_hot_user(ray_session,
                                                    tmp_path):
    """User 7 has 4 sampled events (ids ≡ 0 mod 16) → hot; its exact
    lower median must come out of the merged salted histograms.  User 8
    has 3 sampled events → cold, excluded."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        adaptive_salt_hot_keys,
    )

    eid, uid, val = [], [], []
    # user 7: 64 events, ids 0..63 → ids 0,16,32,48 sampled (4 >= 4)
    for i in range(64):
        eid.append(i)
        uid.append(7)
        val.append(float(i + 1))  # cents 100..6400, lower median 3200
    # user 8: ids 100..147 → sampled ids 112,128,144 (3 < 4)
    for i in range(48):
        eid.append(100 + i)
        uid.append(8)
        val.append(1.0)
    tbl = pa.table({"event_id": pa.array(eid, pa.int64()),
                    "user_id": pa.array(uid, pa.int64()),
                    "value": pa.array(val, pa.float64())})
    out = adaptive_salt_hot_keys(_write(tmp_path, "events", tbl))
    assert list(out["user_id"]) == [7]
    assert out.iloc[0]["n_events"] == 64
    assert out.iloc[0]["median_cents"] == 3200  # lower median of 100..6400


# ------------------------------------------------------------ TPC-H Q7


def test_q7_bilateral_pair_and_year(ray_session, tmp_path):
    """Only (3→2) and (2→3) pairs count, split by ship year; local
    (2→2) and out-of-pair nations drop."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q7_volume_shipping,
    )

    supplier = pa.table({"s_suppkey": pa.array([100, 200, 300], pa.int64()),
                         "s_nationkey": pa.array([3, 2, 9], pa.int32())})
    customer = pa.table({"c_custkey": pa.array([10, 20], pa.int64()),
                         "c_nationkey": pa.array([2, 3], pa.int32())})
    orders = pa.table({"o_orderkey": pa.array([1, 2], pa.int64()),
                       "o_custkey": pa.array([10, 20], pa.int64())})
    y96 = np.datetime64("1996-05-01", "us")
    y97 = np.datetime64("1997-05-01", "us")
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([100, 300, 200, 200], pa.int64()),
        "l_shipdate": pa.array([y96, y96, y96, y97]),
        "l_extendedprice": pa.array([10.0, 99.0, 20.0, 40.0]),
        "l_discount": pa.array([0.0] * 4)})
    sf = _write(tmp_path, "supplier", supplier)
    for n, t in [("customer", customer), ("orders", orders),
                 ("lineitem", li)]:
        _write(tmp_path, n, t)
    out = q7_volume_shipping(sf).set_index(
        ["supp_nation", "cust_nation", "l_year"])
    assert out.loc[(3, 2, 1996), "rev_micros"] == 1000 * 10000
    assert out.loc[(2, 3, 1996), "rev_micros"] == 2000 * 10000
    assert out.loc[(2, 3, 1997), "rev_micros"] == 4000 * 10000
    assert len(out) == 3  # nation 9 supplier never appears


# ------------------------------------------- IPC roundtrip bit-exactness


def test_ipc_roundtrip_preserves_float_bits(ray_session, tmp_path):
    """A value chosen so cents-rounding BEFORE and AFTER the roundtrip
    differ iff bits change: 0.145 * 100 = 14.499999... — the roundtrip
    must preserve the exact double so both sides round identically."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ipc_roundtrip_events,
    )

    tbl = pa.table({
        "event_type": pa.array(["x", "x", "y"]),
        "value": pa.array([0.145, 2.675, 1.005], pa.float64())})
    out = ipc_roundtrip_events(
        _write(tmp_path, "events", tbl)).set_index("event_type")
    c = np.array([0.145, 2.675, 1.005]) * 100.0
    want = (np.sign(c) * np.floor(np.abs(c) + 0.5)).astype(np.int64)
    assert out.loc["x", "cents"] == want[0] + want[1]
    assert out.loc["y", "cents"] == want[2]


# ------------------------------------------------- struct / decimal


def test_struct_pack_unpack_cents(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        struct_pack_roundtrip_orders,
    )

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 20, 10], pa.int64()),
        "o_orderstatus": pa.array(["O", "F", "O"]),
        "o_totalprice": pa.array([1.11, 2.22, 4.44], pa.float64())})
    out = struct_pack_roundtrip_orders(
        _write(tmp_path, "orders", orders)).set_index("status")
    assert out.loc["O", "n"] == 2 and out.loc["O", "cents"] == 555
    assert out.loc["F", "cents"] == 222


def test_decimal_sum_exact_including_negative(ray_session, tmp_path):
    """Negative prices exercise the 128-bit sign extension; the string
    sums must carry exact 2-decimal money semantics."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        decimal_exact_sum_roundtrip,
    )

    orders = pa.table({
        "o_orderstatus": pa.array(["O", "O", "F"]),
        "o_totalprice": pa.array([0.10, 0.20, -5.25], pa.float64())})
    out = decimal_exact_sum_roundtrip(
        _write(tmp_path, "orders", orders)).set_index("status")
    assert out.loc["O", "total"] == "0.30"   # no float 0.30000000000004
    assert out.loc["F", "total"] == "-5.25"


# ------------------------------------------------------------ TPC-H Q8


def test_q8_share_is_exact_ratio(ray_session, tmp_path):
    """One ECONOMY lineitem from nation-3's supplier, one from another
    nation, same year: share must be the exact int ratio; non-ECONOMY
    parts and non-ASIA customers drop."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q8_market_share,
    )

    region = pa.table({"r_regionkey": pa.array([0, 1], pa.int32()),
                       "r_name": pa.array(["ASIA", "EUROPE"])})
    nation = pa.table({"n_nationkey": pa.array([0, 9], pa.int32()),
                       "n_name": pa.array(["N0", "N9"]),
                       "n_regionkey": pa.array([0, 1], pa.int32())})
    supplier = pa.table({"s_suppkey": pa.array([1, 2], pa.int64()),
                         "s_nationkey": pa.array([3, 4], pa.int32())})
    part = pa.table({"p_partkey": pa.array([1, 2], pa.int64()),
                     "p_type": pa.array(["ECONOMY BRUSHED TIN",
                                         "STANDARD PLATED TIN"])})
    customer = pa.table({"c_custkey": pa.array([10, 20], pa.int64()),
                         "c_nationkey": pa.array([0, 9], pa.int32())})
    d = np.datetime64("1996-03-01", "us")
    orders = pa.table({"o_orderkey": pa.array([1, 2], pa.int64()),
                       "o_custkey": pa.array([10, 20], pa.int64()),
                       "o_orderdate": pa.array([d, d])})
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_partkey": pa.array([1, 1, 2, 1], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 1], pa.int64()),
        "l_extendedprice": pa.array([10.0, 30.0, 99.0, 55.0]),
        "l_discount": pa.array([0.0] * 4)})
    sf = _write(tmp_path, "region", region)
    for n, t in [("nation", nation), ("supplier", supplier),
                 ("part", part), ("customer", customer),
                 ("orders", orders), ("lineitem", li)]:
        _write(tmp_path, n, t)
    out = q8_market_share(sf)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["o_year"] == 1996
    assert r["total_rev"] == 4000 * 10000      # 10 + 30, ECONOMY+ASIA only
    assert r["nation3_rev"] == 1000 * 10000
    assert r["mkt_share"] == 0.25


# ----------------------------------------------------------- TPC-H Q19


def test_q19_disjunctive_masks(ray_session, tmp_path):
    """Each conjunct admits different rows; a row failing BOTH drops
    even though it passes parts of each."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q19_disjunctive_revenue,
    )

    part = pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#1"]),
        "p_size": pa.array([5, 20, 50], pa.int32())})
    li = pa.table({
        "l_partkey": pa.array([1, 2, 3, 1], pa.int64()),
        "l_quantity": pa.array([10.0, 20.0, 10.0, 40.0]),
        "l_extendedprice": pa.array([1.0, 2.0, 4.0, 8.0]),
        "l_discount": pa.array([0.0] * 4)})
    sf = _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li)
    out = q19_disjunctive_revenue(sf)
    # row1: brand1/size5/qty10 ✓; row2: brand2/size20/qty20 ✓;
    # row3: size 50 ✗ both; row4: qty 40 ✗ brand1 range
    assert out["n_items"].iloc[0] == 2
    assert out["rev_micros"].iloc[0] == (100 + 200) * 10000


# ------------------------------------------------ repair apply


def test_antientropy_apply_converges(ray_session, tmp_path):
    """After the apply step every bucket checksum matches again and the
    rewrite touched only the banded buckets."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        antientropy_apply_repair,
    )

    n = 1001
    tbl = pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_totalprice": pa.array([i / 100.0 for i in range(n)],
                                 pa.float64())})
    out = antientropy_apply_repair(_write(tmp_path, "orders", tbl))
    r = out.iloc[0]
    assert r["n_buckets_matching_after"] == r["n_buckets"]
    assert 0 < r["n_buckets_repaired"] < r["n_buckets"]
    # span=(1001)//64=15: bands [200,210] and [600,610] each straddle
    # ≤2 buckets; rows rewritten = rows in those buckets only
    assert r["n_rows_rewritten"] < n / 10


# ------------------------------------------------------ HHI


def test_hhi_monopoly_and_duopoly(ray_session, tmp_path):
    """A single-supplier brand has HHI 1.0; an equal 50/50 brand 0.5."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        supplier_hhi_by_brand,
    )

    part = pa.table({"p_partkey": pa.array([1, 2], pa.int64()),
                     "p_brand": pa.array(["MONO", "DUO"])})
    li = pa.table({
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8, 9], pa.int64()),
        "l_extendedprice": pa.array([5.0, 3.0, 4.0, 4.0]),
        "l_discount": pa.array([0.0] * 4)})
    sf = _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li)
    out = supplier_hhi_by_brand(sf).set_index("p_brand")
    assert out.loc["MONO", "hhi"] == 1.0
    assert out.loc["DUO", "hhi"] == 0.5
    assert out.loc["DUO", "n_suppliers"] == 2


# --------------------------------------------------- sentence profile


def test_sentence_segmentation_and_word_counts(ray_session, tmp_path):
    """Multi-punctuation runs split once; zero-word fragments drop; the
    10-word threshold splits exactly."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        sentence_length_profile,
    )

    ten = " ".join(["w"] * 10)
    nine = " ".join(["w"] * 9)
    tbl = pa.table({
        "lang": pa.array(["en", "en"]),
        "text": pa.array([f"{ten}! {nine}?? ...", "one two."])})
    out = sentence_length_profile(
        _write(tmp_path, "documents", tbl)).set_index("lang")
    assert out.loc["en", "n_sentences"] == 3
    assert out.loc["en", "sum_words"] == 10 + 9 + 2
    assert out.loc["en", "max_words"] == 10
    assert out.loc["en", "n_long"] == 1


# ----------------------------------------------- seasonal index


def test_seasonal_index_cross_product_exact(ray_session, tmp_path):
    """Two months, one 2× the other's average: indices must be the
    exact ratios 2/1.5 and 1/1.5... computed from int cross-products."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        monthly_seasonal_index,
    )

    jan = np.datetime64("2024-01-15", "us")
    feb = np.datetime64("2024-02-15", "us")
    orders = pa.table({
        "o_orderdate": pa.array([jan, jan, feb, feb]),
        "o_totalprice": pa.array([2.00, 2.00, 1.00, 1.00], pa.float64())})
    out = monthly_seasonal_index(
        _write(tmp_path, "orders", orders)).set_index("month")
    # overall avg 1.50; jan avg 2.00 → 4/3; feb avg 1.00 → 2/3
    assert out.loc["2024-01", "seasonal_index"] == float(400 * 4) / float(2 * 600)
    assert out.loc["2024-02", "seasonal_index"] == float(200 * 4) / float(2 * 600)


# ----------------------------------------------- filtered anti-join


def test_docs_without_label0(ray_session, tmp_path):
    """Doc 1 has a label-0 embedding (excluded), doc 2 only label-3
    (missing), doc 3 no embedding at all (missing)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        docs_without_label0_embedding,
    )

    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "lang": pa.array(["en", "en", "de"])})
    emb = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                    "label": pa.array([0, 3], pa.int32())})
    sf = _write(tmp_path, "documents", docs)
    _write(tmp_path, "embeddings", emb)
    out = docs_without_label0_embedding(sf).set_index("lang")
    assert out.loc["en", "n_missing"] == 1
    assert out.loc["de", "n_missing"] == 1


# --------------------------------------------------- gzip jsonl


def test_jsonl_gz_roundtrip_ints_survive(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        jsonl_gz_roundtrip_events,
    )

    ts = np.datetime64("2024-01-02T03:04:05.000006", "us")
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([7, 7, 9], pa.int64()),
        "ts": pa.array([ts, ts, ts]),
        "value": pa.array([-1.115, 0.0, 2.005], pa.float64())})
    out = jsonl_gz_roundtrip_events(_write(tmp_path, "events", tbl))
    r = out.iloc[0]
    c = np.array([-1.115, 0.0, 2.005]) * 100.0
    want = int((np.sign(c) * np.floor(np.abs(c) + 0.5)).astype(np.int64)
               .sum())
    assert r["n_rows"] == 3 and r["n_users"] == 2
    assert r["cents"] == want
    assert r["max_us"] == ts.astype(np.int64)


# ------------------------------------------------ incremental ingest


def test_incremental_ingest_skips_ledgered_files(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        incremental_file_ingest,
    )

    n = 80
    tbl = pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_totalprice": pa.array([1.00] * n, pa.float64())})
    out = incremental_file_ingest(_write(tmp_path, "orders", tbl))
    r = out.iloc[0]
    assert r["n_rows"] == n and r["cents"] == 100 * n
    assert r["n_files_skipped"] == 4  # run 2 skipped run 1's half


# ------------------------------------------------ null semantics


def test_null_semantics_rule_and_filter(ray_session, tmp_path):
    """event_id 0 and 13 null out; a nulled value above the threshold
    must NOT count in the filter (NULL > x is not true)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        null_semantics_audit,
    )

    tbl = pa.table({
        "event_id": pa.array([0, 1, 13, 14], pa.int64()),
        "event_type": pa.array(["a"] * 4),
        "value": pa.array([99.0, 60.0, 70.0, 10.0], pa.float64())})
    out = null_semantics_audit(
        _write(tmp_path, "events", tbl)).set_index("event_type")
    r = out.loc["a"]
    assert r["n_rows"] == 4 and r["n_nonnull"] == 2
    assert r["cents"] == 6000 + 1000
    assert r["n_gt_50"] == 1  # only the non-null 60.00; nulled 99/70 don't


# ------------------------------------------------ catalog build


def test_observed_catalog_min_folds(ray_session, tmp_path):
    """Duplicate (part,supp) observations fold to min day/price; the
    multi-supplier part counts once."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        observed_catalog_build,
    )

    d1 = np.datetime64("2024-01-02", "us")
    d2 = np.datetime64("2024-01-05", "us")
    li = pa.table({
        "l_partkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8, 7], pa.int64()),
        "l_shipdate": pa.array([d2, d1, d1, d1]),
        "l_extendedprice": pa.array([5.0, 9.0, 3.0, 2.0], pa.float64())})
    out = observed_catalog_build(_write(tmp_path, "lineitem", li))
    r = out.iloc[0]
    assert r["n_pairs"] == 3 and r["n_parts"] == 2
    assert r["n_multi_supplier_parts"] == 1


# ------------------------------------------------------------ TPC-H Q15


def test_q15_argmax_keeps_ties(ray_session, tmp_path):
    """Two suppliers tie at the maximum window revenue; both return.
    Revenue outside the window is excluded."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q15_top_supplier,
    )

    inside = np.datetime64("1996-02-01", "us")
    outside = np.datetime64("1996-06-01", "us")
    li = pa.table({
        "l_suppkey": pa.array([1, 2, 3, 1], pa.int64()),
        "l_shipdate": pa.array([inside, inside, inside, outside]),
        "l_extendedprice": pa.array([5.0, 5.0, 4.0, 99.0]),
        "l_discount": pa.array([0.0] * 4)})
    out = q15_top_supplier(_write(tmp_path, "lineitem", li))
    assert list(out["s_suppkey"]) == [1, 2]
    assert (out["rev_micros"] == 500 * 10000).all()


# ---------------------------------------------- constant columns


def test_constant_column_footer_detection(ray_session, tmp_path):
    """A genuinely constant column flags true from footers alone; a
    varying one flags false."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        constant_column_audit,
    )

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([5, 5, 5], pa.int64()),   # constant
        "o_orderstatus": pa.array(["O", "O", "O"]),     # constant
        "o_totalprice": pa.array([1.0, 2.0, 3.0]),
        "o_orderdate": pa.array(
            [np.datetime64("2024-01-01", "us")] * 3),   # constant
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "1-URGENT"])})
    events = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01", "us")] * 2),
        "user_id": pa.array([9, 9], pa.int64()),
        "event_type": pa.array(["x", "y"]),
        "value": pa.array([0.5, 0.5]),
        "props": pa.array(['{"k": 1}', '{"k": 1}'])})
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "events", events)
    out = constant_column_audit(sf).set_index(["tbl", "col"])
    assert bool(out.loc[("orders", "o_custkey"), "is_constant"])
    assert bool(out.loc[("orders", "o_orderdate"), "is_constant"])
    assert not bool(out.loc[("orders", "o_totalprice"), "is_constant"])
    assert bool(out.loc[("events", "user_id"), "is_constant"])
    assert not bool(out.loc[("events", "event_type"), "is_constant"])


# ---------------------------------------------- partitioner balance


def test_partitioner_balance_detects_mod_pathology(ray_session,
                                                   tmp_path):
    """Keys that are all multiples of 16 send EVERYTHING to mod
    partition 0 (max = n, min = 0) while round-robin stays ±1."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        partitioner_balance_audit,
    )

    n = 64
    tbl = pa.table({"o_orderkey": pa.array(
        [i * 16 for i in range(n)], pa.int64())})
    out = partitioner_balance_audit(
        _write(tmp_path, "orders", tbl)).set_index("strategy")
    assert out.loc["mod", "max_n"] == n and out.loc["mod", "min_n"] == 0
    assert out.loc["rrobin", "max_n"] == n // 16
    assert out.loc["rrobin", "min_n"] == n // 16


# ------------------------------------------------------ provenance


def test_row_provenance_addresses_are_exact(ray_session, tmp_path):
    """The returned (shard, row_in_shard) must address the actual row:
    key 11 → shard 3; within shard 3 (keys 3, 11, 19) it sits at
    offset 1."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        row_provenance_topk,
    )

    keys = list(range(24))
    prices = [1.0] * 24
    prices[11] = 99.0  # top row is key 11
    tbl = pa.table({"o_orderkey": pa.array(keys, pa.int64()),
                    "o_totalprice": pa.array(prices, pa.float64())})
    out = row_provenance_topk(_write(tmp_path, "orders", tbl))
    top = out.iloc[0]
    assert top["o_orderkey"] == 11
    assert top["shard"] == 3 and top["row_in_shard"] == 1


# ------------------------------------------------- csv quoting torture


def test_csv_quoting_survives_hostile_text(ray_session, tmp_path):
    """Text already containing quotes, commas, and newlines must
    round-trip exactly (plus the injected suffix)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        csv_quoting_roundtrip_documents,
    )

    hostile = 'he said "hi, there"\nand left'
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([hostile, "plain"]),
        "lang": pa.array(["en", "en"])})
    out = csv_quoting_roundtrip_documents(
        _write(tmp_path, "documents", tbl))
    r = out.iloc[0]
    suffix = ',"\n' + "en"
    assert r["n_docs"] == 2
    assert r["chars"] == len(hostile + suffix) + len("plain" + suffix)
    assert r["quotes"] == 2 + 1 + 1      # two in text + one per suffix
    assert r["commas"] == 1 + 1 + 1
    assert r["newlines"] == 1 + 1 + 1


# ---------------------------------------------------- tar source


def test_tar_member_source_counts(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        tar_member_source,
    )

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["abc", "de", "fghi"]),
        "lang": pa.array(["en", "en", "de"])})
    out = tar_member_source(
        _write(tmp_path, "documents", tbl)).set_index("lang")
    assert out.loc["en", "n_docs"] == 2 and out.loc["en", "chars"] == 5
    assert out.loc["de", "n_docs"] == 1 and out.loc["de", "chars"] == 4


# ------------------------------------------------ first crossing


def test_first_crossing_exact_event(ray_session, tmp_path):
    """The crossing is the FIRST event reaching the threshold, with
    (ts, event_id) tie order; a never-crossing user is absent."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        first_spend_crossing,
    )

    def ts(m):
        return np.datetime64(f"2024-01-01T00:{m:02d}:00", "us")

    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([ts(0), ts(1), ts(2), ts(0), ts(1)]),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "value": pa.array([60.0, 40.0, 5.0, 10.0, 20.0], pa.float64())})
    out = first_spend_crossing(
        _write(tmp_path, "events", tbl)).set_index("user_id")
    # user 1 crosses at event 2 (60+40=100.00 exactly)
    assert out.loc[1, "crossed_at_us"] == int(ts(1).astype(np.int64))
    assert out.loc[1, "cum_cents"] == 10000
    assert 2 not in out.index  # user 2 tops out at 30.00


# ------------------------------------------------ exact stddev


def test_stddev_from_integer_moments(ray_session, tmp_path):
    """Known variance: values 1,2,3,4 → sample stddev of cents =
    sqrt(5000000/3); a 1-row group yields NULL/NaN."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        value_stddev_by_type,
    )
    import math

    tbl = pa.table({
        "event_type": pa.array(["a"] * 4 + ["b"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 7.0], pa.float64())})
    out = value_stddev_by_type(
        _write(tmp_path, "events", tbl)).set_index("event_type")
    n, s1, s2 = 4, 1000, 300000
    want = math.sqrt(float(n * s2 - s1 * s1) / float(n * (n - 1)))
    assert out.loc["a", "stddev_cents"] == want
    assert pd.isna(out.loc["b", "stddev_cents"])


# ----------------------------------------------------- map column


def test_map_column_empty_vs_present(ray_session, tmp_path):
    """A malformed props row yields an EMPTY map (not a null) and must
    not contribute to n_with_k or sum_k."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        map_column_roundtrip,
    )

    tbl = pa.table({
        "event_type": pa.array(["a", "a", "b"]),
        "props": pa.array(['{"k": 5}', "garbage", '{"k": -2}'])})
    out = map_column_roundtrip(
        _write(tmp_path, "events", tbl)).set_index("event_type")
    assert out.loc["a", "n"] == 2 and out.loc["a", "n_with_k"] == 1
    assert out.loc["a", "sum_k"] == 5
    assert out.loc["b", "sum_k"] == -2


# ------------------------------------------------ regex group subst


def test_backref_stem_and_mask(ray_session, tmp_path):
    """'running 42 times' → 'runn # times': group substitution strips
    the ing, digits mask to one #."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        text_backref_normalize,
    )

    tbl = pa.table({"lang": pa.array(["en"]),
                    "text": pa.array(["running 42 times"])})
    out = text_backref_normalize(
        _write(tmp_path, "documents", tbl)).set_index("lang")
    want = "runn # times"
    assert out.loc["en", "chars"] == len(want)
    assert out.loc["en", "n_masked"] == 1


# ------------------------------------------------ relational division


def test_fully_shipped_universal_quantifier(ray_session, tmp_path):
    """Order 1: all items within 30d → counted; order 2: ONE late item
    poisons it; order 3: no items → excluded (matches inner join)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        orders_fully_shipped_30d,
    )

    od = np.datetime64("2024-01-01", "us")
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([od, od, od])})
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_shipdate": pa.array([
            np.datetime64("2024-01-10", "us"),
            np.datetime64("2024-01-31", "us"),   # exactly +30: in
            np.datetime64("2024-01-05", "us"),
            np.datetime64("2024-02-05", "us")])})  # +35: poisons order 2
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = orders_fully_shipped_30d(sf)
    assert len(out) == 1
    assert out.iloc[0]["month"] == "2024-01"
    assert out.iloc[0]["n_orders"] == 1


# ------------------------------------------------ pct-rank enrich


def test_percent_rank_enrichment_with_ties(ray_session, tmp_path):
    """Tied values share a percent_rank = (count strictly below)/(N−1)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        orders_with_percentile_rank,
    )

    prices = [1.0, 2.0, 2.0, 3.0, 4.0]
    tbl = pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64())})
    out = orders_with_percentile_rank(
        _write(tmp_path, "orders", tbl)).set_index("o_orderkey")
    assert out.loc[4, "pct_rank"] == 1.0          # max: 4/4
    assert out.loc[3, "pct_rank"] == 3.0 / 4.0
    assert out.loc[1, "pct_rank"] == 1.0 / 4.0    # ties share rank
    assert out.loc[2, "pct_rank"] == 1.0 / 4.0
    assert out.loc[0, "pct_rank"] == 0.0


# ------------------------------------------------- federated union


def test_federated_union_covers_all_formats(ray_session, tmp_path):
    """Rows land in all three formats (ids 0,1,2 mod 3) and every one
    must come back through the union."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        federated_trisource_union,
    )

    n = 30
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([i % 7 + 1 for i in range(n)], pa.int64()),
        "value": pa.array([1.0] * n, pa.float64())})
    out = federated_trisource_union(_write(tmp_path, "events", tbl))
    r = out.iloc[0]
    assert r["n_rows"] == n
    assert r["cents"] == 100 * n
    assert r["low3_user_sum"] == 1 + 2 + 3


# ---------------------------------------------- layout tuning audit


def test_layout_tuning_rowgroups_and_dictionary(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        physical_layout_tuning_audit,
    )

    n = 1200
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["en" if i % 2 else "de" for i in range(n)])})
    out = physical_layout_tuning_audit(
        _write(tmp_path, "documents", tbl)).set_index("lang")
    assert out.loc["en", "n_docs"] == n // 2
    assert (out["n_oversize_rowgroups"] == 0).all()
    assert (out["n_nondict_rowgroups"] == 0).all()


# --------------------------------------------------- correlogram


def test_correlogram_perfect_period_two(ray_session, tmp_path):
    """A strict period-2 hourly series has r = −1 at odd lags and
    r = +1 at even lags."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        hourly_value_correlogram,
    )

    ts = [np.datetime64("2024-01-01T00", "us")
          + np.timedelta64(i, "h") for i in range(24)]
    vals = [1.0 if i % 2 == 0 else 3.0 for i in range(24)]
    tbl = pa.table({"ts": pa.array([t for t in ts]),
                    "value": pa.array(vals, pa.float64())})
    out = hourly_value_correlogram(
        _write(tmp_path, "events", tbl)).set_index("lag")
    assert out.loc[1, "r"] == -1.0
    assert out.loc[2, "r"] == 1.0
    assert out.loc[3, "r"] == -1.0


# ---------------------------------------------- activity quantiles


def test_user_activity_quantiles_discrete(ray_session, tmp_path):
    """10 users with counts 1..10: quantile_disc picks the ceil-rank
    element — p25→3, p50→5, p75→8, p90→9."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        user_activity_quantiles,
    )

    uid = []
    for u in range(1, 11):
        uid += [u] * u
    tbl = pa.table({"user_id": pa.array(uid, pa.int64())})
    out = user_activity_quantiles(
        _write(tmp_path, "events", tbl)).set_index("pct")
    assert out.loc["p25", "events_per_user"] == 3
    assert out.loc["p50", "events_per_user"] == 5
    assert out.loc["p75", "events_per_user"] == 8
    assert out.loc["p90", "events_per_user"] == 9


# ------------------------------------------------ hash collisions


def test_hash_audit_counts_keys(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        hash_collision_audit,
    )

    tbl = pa.table({"user_id": pa.array([1, 2, 2, 3, 3, 3], pa.int64())})
    out = hash_collision_audit(_write(tmp_path, "events", tbl))
    assert out["n_keys"].iloc[0] == 3
    assert out["n_collisions"].iloc[0] == 0


# ------------------------------------------------ z-order read path


def test_zorder_rectangle_prunes_and_counts(ray_session, tmp_path):
    """A 64×64 grid: the 8×8 rectangle must count exactly 64 rows AND
    the footer plan must skip row groups."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        zorder_rectangle_count,
    )

    cks, dates = [], []
    for ck in range(64):
        for mo in range(64):
            cks.append(ck + 100)  # custkeys 100..163
            dates.append(np.datetime64(
                f"{1995 + mo // 12}-{mo % 12 + 1:02d}-15", "us"))
    orders = pa.table({"o_custkey": pa.array(cks, pa.int64()),
                       "o_orderdate": pa.array(dates)})
    audit = {}
    out = zorder_rectangle_count(_write(tmp_path, "orders", orders),
                                 _audit=audit)
    # rect: custkey 100..200 covers all 64 cks; month 12..23 covers 12
    # of 64 months → 64 * 12 rows
    assert out["n_match"].iloc[0] == 64 * 12
    assert audit["rg_hit"] < audit["rg_total"]  # pruning happened


# -------------------------------------------------------- OLS


def test_ols_exact_line(ray_session, tmp_path):
    """Points on an exact line y = 200x + 100 give slope 200·100 cents,
    intercept, and R² = 1.0 with no float drift."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        priority_monthly_ols,
    )

    dates, prices = [], []
    for mo in range(6):
        dates.append(np.datetime64(f"1995-{mo + 1:02d}-10", "us"))
        prices.append((100 + 200 * mo) / 1.0)  # dollars
    orders = pa.table({
        "o_orderpriority": pa.array(["1-URGENT"] * 6),
        "o_orderdate": pa.array(dates),
        "o_totalprice": pa.array(prices, pa.float64())})
    out = priority_monthly_ols(_write(tmp_path, "orders", orders))
    r = out.iloc[0]
    assert r["slope"] == 200.0 * 100
    assert r["intercept"] == 100.0 * 100
    assert r["r2"] == 1.0


# ------------------------------------------------ unicode tokens


def test_unicode_tokens_counted_in_chars(ray_session, tmp_path):
    """Accented tokens count as letters; lengths are CHARacters, and
    non-ASCII tokens are tallied."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        unicode_token_profile,
    )

    tbl = pa.table({
        "lang": pa.array(["fr"]),
        "text": pa.array(["café  über12naïve plain"])})
    out = unicode_token_profile(
        _write(tmp_path, "documents", tbl)).set_index("lang")
    # tokens: café, über, naïve, plain (digits split über12naïve)
    assert out.loc["fr", "n_tokens"] == 4
    assert out.loc["fr", "max_len"] == 5  # naïve/plain = 5 CHARS
    assert out.loc["fr", "n_nonascii"] == 3


# ---------------------------------------------------- snapshot GC


def test_snapshot_gc_keeps_live_files(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        snapshot_gc_audit,
    )

    n = 80
    tbl = pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_totalprice": pa.array([1.00] * n, pa.float64())})
    out = snapshot_gc_audit(_write(tmp_path, "orders", tbl))
    r = out.iloc[0]
    assert r["n_files_before_gc"] == 10
    assert r["n_files_removed"] == 2
    assert r["n_files_after_gc"] == 8
    assert r["n_rows"] == n  # GC never touched live data


# ------------------------------------------------- decile lift


def test_decile_lift_top_decile(ray_session, tmp_path):
    """20 users; the 2 highest-scoring users are the only responders →
    decile 1 rate 1.0 and lift 10× of the 10% base rate."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        score_decile_lift,
    )

    eid, uid, et = [], [], []
    i = 0
    for u in range(1, 21):
        # 2u purchases → score 6u; the −5 error penalty below cannot
        # reorder (gap 6 > 5), so users 20 and 19 stay the top decile
        for _ in range(2 * u):
            eid.append(i); uid.append(u); et.append("purchase"); i += 1
    for u in (20, 19):   # the top two also err once
        eid.append(i); uid.append(u); et.append("error"); i += 1
    tbl = pa.table({"user_id": pa.array(uid, pa.int64()),
                    "event_type": pa.array(et)})
    out = score_decile_lift(
        _write(tmp_path, "events", tbl)).set_index("decile")
    assert out.loc[1, "n_users"] == 2
    assert out.loc[1, "n_responders"] == 2
    assert out.loc[1, "rate"] == 1.0
    assert out.loc[1, "lift"] == 10.0
    assert out.loc[2, "n_responders"] == 0


# --------------------------------------------------- ISO weeks


def test_iso_week_boundary_days(ray_session, tmp_path):
    """2024-12-30 lands in 2025-W01; 1995-01-01 in 1994-W52."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        iso_week_revenue,
    )

    orders = pa.table({
        "o_orderdate": pa.array([np.datetime64("2024-12-30", "us"),
                                 np.datetime64("1995-01-01", "us")]),
        "o_totalprice": pa.array([2.00, 1.00], pa.float64())})
    out = iso_week_revenue(
        _write(tmp_path, "orders", orders)).set_index(
            ["iso_year", "iso_week"])
    assert out.loc[(2025, 1), "cents"] == 200
    assert out.loc[(1994, 52), "cents"] == 100


# ------------------------------------------------- winsorized mean


def test_winsorized_mean_clamps_outlier(ray_session, tmp_path):
    """One huge outlier clamps to the p95 order statistic; the robust
    mean moves only as far as the clamp allows."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        winsorized_mean_value,
    )
    import duckdb as _d

    vals = [float(i) for i in range(1, 20)] + [10000.0]
    tbl = pa.table({"event_type": pa.array(["a"] * 20),
                    "value": pa.array(vals, pa.float64())})
    out = winsorized_mean_value(
        _write(tmp_path, "events", tbl)).set_index("event_type")
    want = _d.sql("""
        WITH c AS (SELECT CAST(round(v*100) AS BIGINT) AS v
                   FROM (SELECT unnest(?) AS v)),
        b AS (SELECT quantile_disc(v, 0.05) lo,
                     quantile_disc(v, 0.95) hi FROM c)
        SELECT CAST(sum(greatest(lo, least(hi, v))) AS DOUBLE)/count(*)
        FROM c, b""", params=[vals]).fetchone()[0]
    assert out.loc["a", "winsorized_mean"] == want
    # unclamped mean would be ~50950 cents; clamped stays near the bulk
    assert out.loc["a", "winsorized_mean"] < 2000


# --------------------------------------------- distinct-count ranking


def test_distinct_parts_breadth_not_volume(ray_session, tmp_path):
    """Customer 1 orders part 7 five times (breadth 1); customer 2
    orders three different parts once each (breadth 3) and must rank
    first."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        top_customers_by_distinct_parts,
    )

    orders = pa.table({"o_orderkey": pa.array([1, 2], pa.int64()),
                       "o_custkey": pa.array([1, 2], pa.int64())})
    li = pa.table({
        "l_orderkey": pa.array([1] * 5 + [2] * 3, pa.int64()),
        "l_partkey": pa.array([7] * 5 + [10, 11, 12], pa.int64())})
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = top_customers_by_distinct_parts(sf)
    assert list(out["c_custkey"]) == [2, 1]
    assert list(out["n_parts"]) == [3, 1]


# ------------------------------------------------ price endings


def test_price_ending_bias_detects_99(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        price_ending_bias,
    )

    prices = [1.99, 2.99, 3.99, 4.50, 5.00]
    tbl = pa.table({"o_totalprice": pa.array(prices, pa.float64())})
    out = price_ending_bias(_write(tmp_path, "orders", tbl))
    assert out.iloc[0]["ending"] == 99
    assert out.iloc[0]["n"] == 3
    assert out.iloc[0]["share"] == 3.0 / 5.0


# --------------------------------------------------- five-number


def test_five_number_discrete_order_stats(ray_session, tmp_path):
    """Values 1..8 in one nation: quantile_disc picks ceil-rank
    elements — p25→2, p50→4, p75→6."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        acctbal_five_number_by_nation,
    )

    tbl = pa.table({
        "c_nationkey": pa.array([0] * 8, pa.int32()),
        "c_acctbal": pa.array([float(i) for i in range(1, 9)],
                              pa.float64())})
    out = acctbal_five_number_by_nation(
        _write(tmp_path, "customer", tbl)).set_index("nationkey")
    r = out.loc[0]
    assert (r["vmin"], r["p25"], r["p50"], r["p75"], r["vmax"]) == (
        100, 200, 400, 600, 800)


# ---------------------------------------------------- peak rate


def test_peak_minute_tie_breaks_earliest(ray_session, tmp_path):
    """Two minutes tie at 2 events; the EARLIEST wins on both sides."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        peak_minute_rate_by_type,
    )

    def t(m, s=0):
        return np.datetime64(f"2024-01-01T00:{m:02d}:{s:02d}", "us")

    tbl = pa.table({
        "event_type": pa.array(["x"] * 5),
        "ts": pa.array([t(1), t(1, 30), t(3), t(3, 40), t(2)])})
    out = peak_minute_rate_by_type(_write(tmp_path, "events", tbl))
    r = out.iloc[0]
    assert r["peak_events"] == 2
    want_min = int(t(1).astype("datetime64[m]").astype(np.int64))
    assert r["peak_minute_epoch"] == want_min


# ------------------------------------------------ plan equivalence


def test_plan_equivalence_runs_both_paths(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        plan_equivalence_audit,
    )

    li = pa.table({
        "l_returnflag": pa.array(["A", "R", "A"]),
        "l_extendedprice": pa.array([1.00, 2.00, 4.00], pa.float64())})
    out = plan_equivalence_audit(
        _write(tmp_path, "lineitem", li)).set_index("l_returnflag")
    assert out.loc["A", "cents"] == 500 and out.loc["A", "n"] == 2
    assert out.loc["R", "cents"] == 200


# ------------------------------------------------ idempotent sink


def test_idempotent_rerun_no_duplication(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        idempotent_sink_rerun,
    )

    n = 40
    tbl = pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_totalprice": pa.array([1.00] * n, pa.float64())})
    out = idempotent_sink_rerun(_write(tmp_path, "orders", tbl))
    r = out.iloc[0]
    assert r["n_rows"] == n          # ONE copy despite two runs
    assert r["cents"] == 100 * n
    assert r["n_files"] == 8


# ------------------------------------------------ reorder interval


def test_reorder_interval_median_gaps(ray_session, tmp_path):
    """Part 1 ordered on days 0, 10, 40 → gaps {10, 30}, lower median
    10; a same-day duplicate collapses; a once-ordered part is out."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        part_reorder_interval_median,
    )

    def d(day):
        return np.datetime64("2024-01-01", "us") + np.timedelta64(
            day, "D").astype("timedelta64[us]")

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_orderdate": pa.array([d(0), d(10), d(40), d(0), d(0)])})
    li = pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64())})
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = part_reorder_interval_median(sf)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["p_partkey"] == 1
    assert r["n_intervals"] == 2      # day 0 dup collapsed
    assert r["median_gap_days"] == 10


# ------------------------------------------------ penetration


def test_penetration_is_distinct_order_share(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        part_order_penetration,
    )

    orders = pa.table({"o_orderkey": pa.array(range(4), pa.int64())})
    li = pa.table({
        "l_orderkey": pa.array([0, 0, 1, 2], pa.int64()),
        "l_partkey": pa.array([7, 7, 7, 9], pa.int64())})
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = part_order_penetration(sf).set_index("p_partkey")
    assert out.loc[7, "n_orders"] == 2       # order 0 counted once
    assert out.loc[7, "penetration"] == 0.5  # 2 of 4 orders
    assert out.loc[9, "penetration"] == 0.25


# ------------------------------------------------- source dup rate


def test_source_dup_rate_exact(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        source_dup_rate,
    )

    tbl = pa.table({
        "source": pa.array(["a", "a", "a", "b"]),
        "text": pa.array(["x", "x", "y", "z"])})
    out = source_dup_rate(
        _write(tmp_path, "documents", tbl)).set_index("source")
    assert out.loc["a", "n_docs"] == 3
    assert out.loc["a", "n_distinct"] == 2
    assert out.loc["a", "dup_rate"] == 1.0 - 2.0 / 3.0
    assert out.loc["b", "dup_rate"] == 0.0


# ------------------------------------------------- price bands


def test_price_bands_edges_and_empty_band(ray_session, tmp_path):
    """99.99 is lt_100; 100.00 crosses into the next band; an empty
    band is omitted (GROUP BY semantics)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        revenue_price_bands,
    )

    tbl = pa.table({"o_totalprice": pa.array(
        [99.99, 100.00, 9999.99], pa.float64())})
    out = revenue_price_bands(
        _write(tmp_path, "orders", tbl)).set_index("price_band")
    assert out.loc["lt_100", "n"] == 1
    assert out.loc["100_to_10k", "n"] == 2
    assert "gte_50k" not in out.index  # empty band omitted


# --------------------------------------------- chars per token


def test_chars_per_token_ratio(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        chars_per_token_by_lang,
    )

    tbl = pa.table({"lang": pa.array(["en"]),
                    "text": pa.array(["ab cd ef"])})  # 8 chars, 3 tokens
    out = chars_per_token_by_lang(
        _write(tmp_path, "documents", tbl)).set_index("lang")
    assert out.loc["en", "chars"] == 8
    assert out.loc["en", "tokens"] == 3
    assert out.loc["en", "chars_per_token"] == 8.0 / 3.0


# ------------------------------------------ second-event conversion


def test_second_event_first_touch_attribution(ray_session, tmp_path):
    """The FIRST event (by ts, then event_id on ties) owns the user:
    user 1 (view→purchase) converts under 'view'; user 2 (single
    purchase) does not convert under 'purchase'."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        second_event_conversion,
    )

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    t1 = np.datetime64("2024-01-01T01:00:00", "us")
    tbl = pa.table({
        "event_id": pa.array([2, 1, 3], pa.int64()),
        "ts": pa.array([t0, t0, t1]),   # user 1 tie at t0 → event_id 1
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_type": pa.array(["purchase", "view", "purchase"])})
    out = second_event_conversion(
        _write(tmp_path, "events", tbl)).set_index("first_type")
    assert out.loc["view", "n_users"] == 1
    assert out.loc["view", "n_returned"] == 1
    assert out.loc["purchase", "n_users"] == 1
    assert out.loc["purchase", "n_returned"] == 0


# ------------------------------------------------ q4 EXISTS semantics


def test_q4_exists_counts_order_once(ray_session, tmp_path):
    """An order with TWO late lines counts once (EXISTS, not a join
    fan-out); a line exactly 30 days out is NOT late (strict >); an
    order with no lineitems never appears."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q4_late_ship_priority,
    )

    def d(day):
        return np.datetime64("2024-01-01", "us") + np.timedelta64(
            day, "D").astype("timedelta64[us]")

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([d(0), d(0), d(0)]),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "5-LOW"])})
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([d(31), d(40), d(30)])})
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = q4_late_ship_priority(sf).set_index("o_orderpriority")
    assert out.loc["1-URGENT", "n_late"] == 1   # order 1 once; order 2 not late
    assert "5-LOW" not in out.index             # no lineitems → no EXISTS


# ------------------------------------------------ q9 profit + name filter


def test_q9_profit_filters_parts_at_scan(ray_session, tmp_path):
    """Only 'widget' parts contribute; profit is extprice·(1−disc) −
    retail·qty in exact micro-dollars, grouped by supplier nation and
    order year (ordered year-descending)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q9_profit_nation_year,
    )

    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([
            np.datetime64("2023-06-01T00:00:00", "us"),
            np.datetime64("2024-06-01T00:00:00", "us")])})
    li = pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_partkey": pa.array([10, 11], pa.int64()),
        "l_suppkey": pa.array([5, 5], pa.int64()),
        "l_quantity": pa.array([2.0, 1.0]),
        "l_extendedprice": pa.array([100.00, 50.00]),
        "l_discount": pa.array([0.10, 0.00])})
    part = pa.table({
        "p_partkey": pa.array([10, 11], pa.int64()),
        "p_name": pa.array(["red widget", "red bolt"]),
        "p_retailprice": pa.array([30.00, 1.00])})
    sup = pa.table({"s_suppkey": pa.array([5], pa.int64()),
                    "s_nationkey": pa.array([3], pa.int32())})
    nat = pa.table({"n_nationkey": pa.array([3], pa.int32()),
                    "n_name": pa.array(["NATION_3"])})
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "part", part)
    _write(tmp_path, "supplier", sup)
    _write(tmp_path, "nation", nat)
    out = q9_profit_nation_year(sf)
    # only the widget row: 100·0.9 − 30·2 = 30 dollars = 30_000_000 micro
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_name"] == "NATION_3" and r["o_year"] == 2023
    assert r["profit_micros"] == 30_000_000


# ------------------------------------------------ q11 scalar threshold


def test_q11_threshold_is_1_5x_mean(ray_session, tmp_path):
    """Values 1,1,4 (mean 2): only the 4 clears 1.5× the mean; the
    boundary itself (exactly 1.5×) is excluded by the strict >."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q11_important_parts_value,
    )

    li = pa.table({
        "l_partkey": pa.array([1, 2, 3, 3], pa.int64()),
        "l_extendedprice": pa.array([1.00, 1.00, 2.00, 2.00]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0])})
    sf = _write(tmp_path, "lineitem", li)
    out = q11_important_parts_value(sf)
    assert out["p_partkey"].tolist() == [3]
    assert out["value_micros"].tolist() == [4 * 100 * 10000]


# ------------------------------------------------ q21 sole-late semantics


def test_q21_requires_multi_supplier_and_unique_lateness(ray_session,
                                                         tmp_path):
    """Order 1: suppliers 7 (late) and 8 (on time) → supplier 7
    credited.  Order 2: both late → nobody.  Order 3: single-supplier
    late → nobody (needs a second supplier)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        q21_sole_late_supplier,
    )

    def d(day):
        return np.datetime64("2024-01-01", "us") + np.timedelta64(
            day, "D").astype("timedelta64[us]")

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([d(0), d(0), d(0)])})
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_suppkey": pa.array([7, 8, 7, 8, 7], pa.int64()),
        "l_shipdate": pa.array([d(50), d(10), d(50), d(50), d(50)])})
    sup = pa.table({
        "s_suppkey": pa.array([7, 8], pa.int64()),
        "s_name": pa.array(["Supplier#7", "Supplier#8"])})
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "supplier", sup)
    out = q21_sole_late_supplier(sf)
    assert out["s_name"].tolist() == ["Supplier#7"]
    assert out["numwait"].tolist() == [1]


# ------------------------------------------------ grouping sets


def test_grouping_sets_levels_and_gid(ray_session, tmp_path):
    """All four sets derive from one detail pass: gid matches DuckDB's
    GROUPING(priority, status) bit encoding (status = LSB)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        orders_grouping_sets,
    )

    orders = pa.table({
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "5-LOW"]),
        "o_orderstatus": pa.array(["F", "O", "F"]),
        "o_totalprice": pa.array([1.00, 2.00, 4.00])})
    sf = _write(tmp_path, "orders", orders)
    out = orders_grouping_sets(sf)
    assert len(out) == 3 + 2 + 2 + 1  # detail + prio + status + total
    d = out.set_index(["o_orderpriority", "o_orderstatus", "gid"])
    assert d.loc[("1-URGENT", "F", 0), "cents"] == 100
    assert d.loc[("1-URGENT", "ALL", 1), "cents"] == 300
    assert d.loc[("ALL", "F", 2), "cents"] == 500
    assert d.loc[("ALL", "ALL", 3), "n"] == 3


# ------------------------------------------------ business days


def test_business_day_lag_closed_form(ray_session, tmp_path):
    """2024-01-05 is a Friday: Fri→Mon spans 1 business day (Mon),
    Fri→next Fri spans 5; an early ship (ship < order) clamps to 0."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        business_day_ship_lag,
    )

    def d(s):
        return np.datetime64(s, "us")

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([d("2024-01-05"), d("2024-01-05"),
                                 d("2024-01-05")]),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "5-LOW"])})
    li = pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_shipdate": pa.array([d("2024-01-08"),    # Mon: 1 busday
                                d("2024-01-12"),    # next Fri: 5
                                d("2024-01-01")])}) # early: clamp 0
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = business_day_ship_lag(sf).set_index("o_orderpriority")
    assert out.loc["1-URGENT", "busdays"] == 1
    assert out.loc["2-HIGH", "busdays"] == 5
    assert out.loc["5-LOW", "busdays"] == 0


# ------------------------------------------------ hopping windows


def test_hopping_window_fanout_and_distinct(ray_session, tmp_path):
    """One event lands in exactly 3 windows (size 3 h, hop 1 h); a user
    seen twice in one window counts once in n_users."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        events_hopping_windows,
    )

    t = np.datetime64("2024-01-01T05:30:00", "us")
    tbl = pa.table({
        "ts": pa.array([t, t + np.timedelta64(60, "s")]),
        "user_id": pa.array([9, 9], pa.int64())})
    sf = _write(tmp_path, "events", tbl)
    out = events_hopping_windows(sf)
    assert len(out) == 3  # windows starting 03:00, 04:00, 05:00
    assert out["n_events"].tolist() == [2, 2, 2]
    assert out["n_users"].tolist() == [1, 1, 1]
    assert str(out["wstart"].iloc[0]) == "2024-01-01 03:00:00"


# ------------------------------------------------ partition evolution


def test_partition_evolution_prunes_v2_status_dirs(ray_session, tmp_path):
    """Orders straddle the scheme change (1996-12 under v1, 1997-02
    under v2); only status-F rows in the window survive, and the v2
    month contributes via its pruned o_orderstatus=F leaf only."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        partition_evolution_read,
    )

    def d(s):
        return np.datetime64(s, "us")

    orders = pa.table({
        "o_orderdate": pa.array([d("1996-12-10"), d("1996-12-11"),
                                 d("1997-02-05"), d("1997-02-06"),
                                 d("1995-01-01")]),
        "o_orderstatus": pa.array(["F", "O", "F", "O", "F"]),
        "o_totalprice": pa.array([1.00, 2.00, 4.00, 8.00, 16.00])})
    sf = _write(tmp_path, "orders", orders)
    out = partition_evolution_read(sf).set_index("month")
    # 1995-01 is outside the window; 'O' rows excluded on both schemes
    assert out.index.tolist() == ["1996-12", "1997-02"]
    assert out.loc["1996-12", "cents"] == 100
    assert out.loc["1997-02", "cents"] == 400


# ------------------------------------------------ dominant suppliers


def test_dominant_supplier_strict_majority(ray_session, tmp_path):
    """Exactly-half is NOT dominant (strict 2q > total); shipments
    outside 1996 are excluded before the majority test."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        dominant_part_suppliers,
    )

    def d(s):
        return np.datetime64(s, "us")

    in96, out96 = d("1996-06-01"), d("1997-06-01")
    li = pa.table({
        # part 1: s10 ships 5 of 10 (exactly half -> NOT dominant)
        # part 2: s10 ships 6 of 10 (> half -> dominant)
        # part 3: s20 would dominate only if the 1997 row counted
        "l_partkey": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "l_suppkey": pa.array([10, 11, 10, 11, 20, 21], pa.int64()),
        "l_quantity": pa.array([5.0, 5.0, 6.0, 4.0, 1.0, 1.0]),
        "l_shipdate": pa.array([in96, in96, in96, in96, out96, in96]),
    })
    sf = _write(tmp_path, "lineitem", li)
    out = dominant_part_suppliers(sf)
    # s10 dominates part 2 only; part 3's only counted row is s21 (1 of
    # 1); part 1 has no dominant supplier.  Tie broken by ascending key.
    assert out["s_suppkey"].tolist() == [10, 21]
    assert out["n_parts_dominated"].tolist() == [1, 1]


def test_dominant_supplier_majority_and_window(ray_session, tmp_path):
    """Clean variant: one clear dominant supplier, one exact-half."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        dominant_part_suppliers,
    )

    def d(s):
        return np.datetime64(s, "us")

    in96 = d("1996-06-01")
    li = pa.table({
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([10, 11, 10, 11], pa.int64()),
        "l_quantity": pa.array([5.0, 5.0, 6.0, 4.0]),
        "l_shipdate": pa.array([in96] * 4),
    })
    sf = _write(tmp_path, "lineitem", li)
    out = dominant_part_suppliers(sf)
    assert out["s_suppkey"].tolist() == [10]
    assert out["n_parts_dominated"].tolist() == [1]


# ------------------------------------------------ Simpson diversity


def test_simpson_diversity_closed_form(ray_session, tmp_path):
    """Source 'mono' repeats one token (D = 0); source 'poly' has all
    distinct tokens (D = 1); counts aggregate across documents of the
    same source before the moment fold."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        source_token_simpson,
    )

    docs = pa.table({
        "source": pa.array(["mono", "mono", "poly"]),
        "text": pa.array(["aa aa", "aa", "x y z"]),
    })
    sf = _write(tmp_path, "documents", docs)
    out = source_token_simpson(sf).set_index("source")
    assert out.loc["mono", "n_tokens"] == 3
    assert out.loc["mono", "pair_hits"] == 6  # 3*2 same-token pairs
    assert out.loc["mono", "simpson"] == 0.0
    assert out.loc["poly", "n_tokens"] == 3
    assert out.loc["poly", "pair_hits"] == 0
    assert out.loc["poly", "simpson"] == 1.0


# ------------------------------------------------ contiguity audit


def test_contiguity_moments_catch_gap_dup_and_offset(ray_session, tmp_path):
    """The (min, max, count, sum) moment test flags a gap (1,2,4), a
    min/max-preserving duplicate (1,2,2,4), and an offset run (2,3,4),
    while passing exact 1..n runs in any row order."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        linenumber_contiguity_audit,
    )

    okeys, lns = [], []
    for ok, run in [(1, [3, 1, 2]),        # ok (unordered 1..3)
                    (2, [1, 2, 4]),        # gap -> mx != n
                    (3, [1, 2, 2, 4]),     # dup, mn=1 mx=4 n=4, s=9 != 10
                    (4, [2, 3, 4]),        # offset -> mn != 1
                    (5, [1])]:             # ok (singleton)
        okeys += [ok] * len(run)
        lns += run
    li = pa.table({"l_orderkey": pa.array(okeys, pa.int64()),
                   "l_linenumber": pa.array(lns, pa.int32())})
    sf = _write(tmp_path, "lineitem", li)
    out = linenumber_contiguity_audit(sf)
    assert out["n_orders"].tolist() == [5]
    assert out["n_violating"].tolist() == [3]
    assert abs(out["violation_rate"].iloc[0] - 0.6) < 1e-12


# ------------------------------------------------ join-strategy canary


def test_join_canary_agreement_and_dangling_key_divergence(
        ray_session, tmp_path):
    """On referentially-clean data both strategies agree bit-for-bit;
    a dangling l_suppkey makes the broadcast LUT emit a -1 nation while
    the inner hash join drops the row — the canary must RAISE."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        join_strategy_equivalence_audit,
    )

    sup = pa.table({"s_suppkey": pa.array([1, 2], pa.int64()),
                    "s_nationkey": pa.array([7, 8], pa.int64())})
    li = pa.table({
        "l_suppkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([10.00, 20.00, 5.00]),
        "l_discount": pa.array([0.10, 0.00, 0.05]),
    })
    base = tmp_path / "clean"
    base.mkdir()
    pq.write_table(sup, base / "supplier.parquet")
    pq.write_table(li, base / "lineitem.parquet")
    out = join_strategy_equivalence_audit(str(base)).set_index(
        "s_nationkey")
    # nation 7: 1000*9000 + 2000*10000 = 29_000_000 micros
    assert out.loc[7, "rev_micros"] == 1000 * 9000 + 2000 * 10000
    assert out.loc[8, "rev_micros"] == 500 * 9500

    bad = tmp_path / "dangling"
    bad.mkdir()
    li_bad = pa.table({
        "l_suppkey": pa.array([1, 99], pa.int64()),  # 99 not in supplier
        "l_extendedprice": pa.array([10.00, 10.00]),
        "l_discount": pa.array([0.0, 0.0]),
    })
    pq.write_table(sup, bad / "supplier.parquet")
    pq.write_table(li_bad, bad / "lineitem.parquet")
    with pytest.raises(ValueError, match="join-strategy divergence"):
        join_strategy_equivalence_audit(str(bad))


# ------------------------------------------------ edit-distance pairs


def test_levenshtein_kernel_known_distances():
    """Classic cases plus the byte-level unicode contract DuckDB uses
    ('é' is two UTF-8 bytes, so café→cafe is distance 2)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        _levenshtein_bytes,
    )

    def lev(a, b):
        return _levenshtein_bytes(a.encode(), b.encode())

    assert lev("kitten", "sitting") == 3
    assert lev("", "abc") == 3
    assert lev("abc", "") == 3
    assert lev("same", "same") == 0
    assert lev("flaw", "lawn") == 2
    assert lev("café", "cafe") == 2  # byte-level, not char-level


def test_edit_pairs_blocked_by_prefix_and_length(ray_session, tmp_path):
    """Docs sharing a 24-char prefix pair up with their exact distance;
    a cross-prefix near-identical pair is never considered, and a long
    doc (> 300 chars) is excluded from blocking entirely."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        doc_edit_distance_pairs,
    )

    pfx = "p" * 24
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([pfx + "hello", pfx + "hallo",
                          "q" * 24 + "hello",   # other block
                          pfx + "x" * 400]),    # too long
    })
    sf = _write(tmp_path, "documents", docs)
    out = doc_edit_distance_pairs(sf)
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out["edit_distance"].tolist() == [1]


# ------------------------------------------------ chi-square contingency


def test_chi_square_independent_table_has_zero_contrib(
        ray_session, tmp_path):
    """A perfectly independent 2x2 contingency (row/col products) gives
    expected == observed and contribution exactly 0 in every cell."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        event_dow_chi_square,
    )

    # Mon(=isodow 1) epoch day 4 is 1970-01-05; Tue is day 5
    mon = np.datetime64("1970-01-05T10:00:00", "us")
    tue = np.datetime64("1970-01-06T10:00:00", "us")
    # type a: 2 Mon + 2 Tue; type b: 1 Mon + 1 Tue -> independent
    ts = [mon, mon, tue, tue, mon, tue]
    et = ["a", "a", "a", "a", "b", "b"]
    tbl = pa.table({"ts": pa.array(ts), "event_type": pa.array(et)})
    sf = _write(tmp_path, "events", tbl)
    out = event_dow_chi_square(sf)
    assert out["dow"].tolist() == [1, 2, 1, 2]
    assert (out["n"].to_numpy() == out["expected"].to_numpy()).all()
    assert (out["contrib"].to_numpy() == 0.0).all()


def test_chi_square_dependent_cell_values(ray_session, tmp_path):
    """Fully dependent 2x2 (diagonal mass): expected = 1 in every cell,
    contribution (2-1)^2/1 = 1 on the diagonal and (0-1)^2... absent
    cells don't appear (GROUP BY semantics), so the present cells read
    n=2, expected=1, contrib=1."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        event_dow_chi_square,
    )

    mon = np.datetime64("1970-01-05T10:00:00", "us")
    tue = np.datetime64("1970-01-06T10:00:00", "us")
    tbl = pa.table({"ts": pa.array([mon, mon, tue, tue]),
                    "event_type": pa.array(["a", "a", "b", "b"])})
    sf = _write(tmp_path, "events", tbl)
    out = event_dow_chi_square(sf)
    assert len(out) == 2  # only the populated cells
    assert out["n"].tolist() == [2, 2]
    assert out["expected"].tolist() == [1.0, 1.0]
    assert out["contrib"].tolist() == [1.0, 1.0]


# ------------------------------------------------ day streaks


def test_day_streak_gaps_and_dup_days(ray_session, tmp_path):
    """Repeated events within a day collapse; a gap breaks the run; the
    histogram counts each user once at their MAX streak."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        user_day_streaks,
    )

    def d(day, h=9):
        return (np.datetime64("1970-01-01", "us")
                + np.timedelta64(day * 24 + h, "h"))

    ts, uid = [], []
    # user 1: days 1,2,3 then 10,11 -> max streak 3
    for day in [1, 1, 2, 3, 10, 11]:  # day 1 duplicated
        ts.append(d(day)); uid.append(1)
    # user 2: isolated days -> max streak 1
    for day in [5, 7, 9]:
        ts.append(d(day)); uid.append(2)
    # user 3: days 20..22 -> max streak 3
    for day in [20, 21, 22]:
        ts.append(d(day)); uid.append(3)
    tbl = pa.table({"ts": pa.array(ts), "user_id": pa.array(uid,
                                                            pa.int64())})
    sf = _write(tmp_path, "events", tbl)
    out = user_day_streaks(sf).set_index("max_streak")
    assert out.index.tolist() == [1, 3]
    assert out.loc[1, "n_users"] == 1
    assert out.loc[3, "n_users"] == 2


# ------------------------------------------------ embedding covariance


def test_embedding_covariance_known_matrix(ray_session, tmp_path):
    """2-d vectors with hand-computable sample covariance; upper
    triangle only, 1-based indices."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        embedding_covariance,
    )

    vecs = [[1.0, 2.0], [2.0, 4.0], [3.0, 6.0]]
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32())})
    sf = _write(tmp_path, "embeddings", tbl)
    out = embedding_covariance(sf)
    assert out[["i", "j"]].values.tolist() == [[1, 1], [1, 2], [2, 2]]
    # var(x)=1, cov(x,y)=2, var(y)=4
    assert np.allclose(out["cov"].to_numpy(), [1.0, 2.0, 4.0])


def test_embedding_covariance_rejects_ragged_and_null(
        ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        embedding_covariance,
    )

    ragged = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32())})
    sf = _write(tmp_path, "embeddings", ragged)
    # depending on block splits the raggedness trips either the
    # in-batch width check or the cross-block dim check — both loud
    with pytest.raises(Exception, match="ragged|inconsistent"):
        embedding_covariance(sf)

    nulls = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], None],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32())})
    sf2 = tmp_path / "n"
    sf2.mkdir()
    pq.write_table(nulls, sf2 / "embeddings.parquet")
    with pytest.raises(Exception, match="null"):
        embedding_covariance(str(sf2))


# ------------------------------------------------ clamped month-add


def test_renewal_month_end_clamping(ray_session, tmp_path):
    """Jan 31 renews in February both leap (1996) and non-leap (1995)
    years; Mar 31 clamps into Apr 30 — never rolls into May."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        renewal_month_clamped,
    )

    def d(s):
        return np.datetime64(s, "us")

    orders = pa.table({
        "o_orderdate": pa.array([d("1996-01-31"), d("1995-01-31"),
                                 d("1995-03-31"), d("1995-04-15")]),
        "o_totalprice": pa.array([1.00, 2.00, 4.00, 8.00])})
    sf = _write(tmp_path, "orders", orders)
    out = renewal_month_clamped(sf).set_index("renewal_month")
    assert out.index.tolist() == ["1995-02", "1995-04", "1995-05",
                                  "1996-02"]
    assert out.loc["1995-04", "cents"] == 400   # Mar 31 -> Apr 30
    assert out.loc["1995-05", "cents"] == 800   # Apr 15 -> May 15


# ------------------------------------------------ FD discovery


def test_fd_audit_distinguishes_held_and_violated(ray_session, tmp_path):
    """partkey->suppkey violated by exactly one part; orderkey->shipdate
    violated by one order; the orders PK FD holds."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        functional_dependency_audit,
    )

    def d(s):
        return np.datetime64(s, "us")

    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([10, 10, 20], pa.int64()),
        "l_suppkey": pa.array([5, 6, 7], pa.int64()),   # part 10: 2 sups
        "l_shipdate": pa.array([d("1995-01-01"), d("1995-01-02"),
                                d("1995-01-01")]),       # order 1: 2 dates
    })
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([100, 100], pa.int64())})
    pq.write_table(li, tmp_path / "lineitem.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    out = functional_dependency_audit(str(tmp_path)).set_index("fd")
    assert out.loc["lineitem.l_partkey->l_suppkey",
                   "n_violating"] == 1
    assert out.loc["lineitem.l_partkey->l_suppkey", "n_keys"] == 2
    assert out.loc["lineitem.l_orderkey->l_shipdate",
                   "n_violating"] == 1
    assert bool(out.loc["orders.o_orderkey->o_custkey", "holds"])
    assert not bool(out.loc["lineitem.l_partkey->l_suppkey", "holds"])


# ------------------------------------------------ recursive EWMA


def test_ewma_dyadic_exact_values(ray_session, tmp_path):
    """alpha = 1/2 over exact cents gives dyadic-rational EWMAs the
    float fold computes exactly: 4, 6, 8 for daily sums 4, 8, 10."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        daily_value_ewma,
    )

    def t(day, h):
        return (np.datetime64("1970-01-01", "us")
                + np.timedelta64(day * 24 + h, "h"))

    # day sums: d1 = 0.04, d2 = 0.03 + 0.05, d3 = 0.10 (cents 4, 8, 10)
    tbl = pa.table({
        "ts": pa.array([t(1, 9), t(2, 9), t(2, 10), t(3, 9)]),
        "event_type": pa.array(["a"] * 4),
        "value": pa.array([0.04, 0.03, 0.05, 0.10])})
    sf = _write(tmp_path, "events", tbl)
    out = daily_value_ewma(sf)
    assert out["cents"].tolist() == [4, 8, 10]
    assert out["ewma"].tolist() == [4.0, 6.0, 8.0]
    assert out["day"].tolist() == ["1970-01-02", "1970-01-03",
                                   "1970-01-04"]


# ------------------------------------------------ audience overlap


def test_audience_overlap_jaccard_closed_form(ray_session, tmp_path):
    """Day 1 = {1,2,3}, day 2 = {2,3,4,5}, day 3 = {9}: J(1,2) = 2/5,
    J(2,3) = 0, last day has no next (jaccard 0 with union = own)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        daily_audience_overlap,
    )

    def t(day, uid):
        return (np.datetime64("1970-01-01", "us")
                + np.timedelta64(day * 24 + uid, "h"))

    rows = [(1, u) for u in [1, 2, 3]] + [(2, u) for u in [2, 3, 4, 5]] \
        + [(3, 9), (3, 9)]  # dup event same day collapses
    tbl = pa.table({
        "ts": pa.array([t(d_, u) for d_, u in rows]),
        "user_id": pa.array([u for _, u in rows], pa.int64())})
    sf = _write(tmp_path, "events", tbl)
    out = daily_audience_overlap(sf)
    assert out["n_users"].tolist() == [3, 4, 1]
    assert out["n_inter"].tolist() == [2, 0, 0]
    assert out["n_users_next"].tolist() == [4, 1, 0]
    assert abs(out["jaccard_next"].iloc[0] - 0.4) < 1e-15
    assert out["jaccard_next"].iloc[1] == 0.0
    assert out["jaccard_next"].iloc[2] == 0.0


# ------------------------------------------------ padding-waste curve


def test_padding_waste_exact_small_curve(ray_session, tmp_path):
    """Lengths 1..4: k=1 pads everything to 4 (waste 6); k=2 buckets
    {1,2}->cap 2 and {3,4}->cap 4 (waste 2); k=4 buckets are singletons
    (waste 0)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        padding_waste_curve,
    )

    docs = pa.table({"n_chars": pa.array([1, 2, 3, 4], pa.int64())})
    sf = _write(tmp_path, "documents", docs)
    out = padding_waste_curve(sf).set_index("k")
    assert out.loc[1, "waste_chars"] == 6
    assert out.loc[2, "waste_chars"] == 2
    assert out.loc[4, "waste_chars"] == 0
    assert out.loc[8, "waste_chars"] == 0
    assert abs(out.loc[1, "waste_ratio"] - 6 / 16) < 1e-15


# ------------------------------------------------ Spearman


def test_spearman_perfect_monotone_and_inverse(ray_session, tmp_path):
    """Flag A: price strictly increasing with quantity -> rho = +1;
    flag B: strictly decreasing -> rho = -1 (exactly, from ints)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        spearman_qty_price,
    )

    li = pa.table({
        "l_returnflag": pa.array(["A"] * 4 + ["B"] * 4),
        "l_quantity": pa.array([1, 2, 3, 4, 1, 2, 3, 4], pa.int64()),
        "l_extendedprice": pa.array(
            [1.0, 2.0, 3.0, 7.0, 7.0, 3.0, 2.0, 1.0]),
    })
    sf = _write(tmp_path, "lineitem", li)
    out = spearman_qty_price(sf).set_index("l_returnflag")
    # sqrt(a)*sqrt(b) vs sqrt(ab) leaves +-1 ulp at the extremes; the
    # SQL oracle shares the op order so parity still holds bit-for-bit
    assert abs(out.loc["A", "spearman"] - 1.0) < 1e-14
    assert abs(out.loc["B", "spearman"] + 1.0) < 1e-14
    assert out["n"].tolist() == [4, 4]


def test_spearman_ties_use_average_ranks(ray_session, tmp_path):
    """Two equal quantities share the average rank; scipy-checkable by
    hand: x = [1, 1, 2], y = [10, 20, 30] -> rx = [1.5, 1.5, 3],
    ry = [1, 2, 3], rho = (sum products path) = sqrt(3)/2."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        spearman_qty_price,
    )

    li = pa.table({
        "l_returnflag": pa.array(["A"] * 3),
        "l_quantity": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([0.10, 0.20, 0.30]),
    })
    sf = _write(tmp_path, "lineitem", li)
    out = spearman_qty_price(sf)
    assert abs(out["spearman"].iloc[0] - np.sqrt(3) / 2) < 1e-12


# ------------------------------------------------ Kendall tau-b


def test_kendall_concordant_discordant_and_ties(ray_session, tmp_path):
    """x = [1, 1, 2], y = [100, 200, 300] bp: pair (1,2) is an x-tie,
    the two others concordant -> P = 2, Q = 0, n1 = 1, n2 = 0,
    tau-b = 2 / (sqrt(2) * sqrt(3))."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        kendall_tau_qty_discount,
    )

    li = pa.table({
        "l_quantity": pa.array([1, 1, 2], pa.int64()),
        "l_discount": pa.array([0.01, 0.02, 0.03]),
    })
    sf = _write(tmp_path, "lineitem", li)
    out = kendall_tau_qty_discount(sf)
    assert out["concordant"].tolist() == [2]
    assert out["discordant"].tolist() == [0]
    assert abs(out["tau_b"].iloc[0]
               - 2 / (np.sqrt(2) * np.sqrt(3))) < 1e-12


def test_kendall_perfect_inverse(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        kendall_tau_qty_discount,
    )

    li = pa.table({
        "l_quantity": pa.array([1, 2, 3], pa.int64()),
        "l_discount": pa.array([0.03, 0.02, 0.01]),
    })
    sf = _write(tmp_path, "lineitem", li)
    out = kendall_tau_qty_discount(sf)
    assert abs(out["tau_b"].iloc[0] + 1.0) < 1e-14
    assert out["concordant"].tolist() == [0]
    assert out["discordant"].tolist() == [3]


# ------------------------------------------------ contract scorecard


def test_scorecard_one_violation_per_rule(ray_session, tmp_path):
    """Five rows, each breaking exactly one rule (incl. a NULL, which
    fails its rule under COALESCE-to-FALSE semantics)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        orders_contract_scorecard,
    )

    def d(s):
        return np.datetime64(s, "us")

    orders = pa.table({
        "o_totalprice": pa.array([-1.0, 10.0, 10.0, 10.0, 10.0]),
        "o_orderdate": pa.array([d("1995-01-02"), d("2001-01-03"),
                                 d("1995-01-04"), d("1995-01-05"),
                                 d("1995-01-31")]),
        "o_orderstatus": pa.array(["F", "O", "X", "P", "F"]),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                     "9-BOGUS", "5-LOW"]),
        "o_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    sf = _write(tmp_path, "orders", orders)
    out = orders_contract_scorecard(sf).set_index("rule")
    assert (out["n_checked"] == 5).all()
    assert out.loc["totalprice_positive", "n_failed"] == 1
    assert out.loc["orderdate_before_2000", "n_failed"] == 1
    assert out.loc["status_in_enum", "n_failed"] == 1
    assert out.loc["priority_format", "n_failed"] == 1
    assert out.loc["day_portable_le_28", "n_failed"] == 1


# ------------------------------------------------ fixed-width connector


def test_fixed_width_roundtrip_exact_sums(ray_session, tmp_path):
    """Known rows survive format->write->read_text->slice-parse with
    exact cents and distinct-priority counts."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        fixed_width_roundtrip,
    )

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "O"]),
        "o_totalprice": pa.array([10.01, 0.99, 5.00]),
        "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "5-LOW"]),
    })
    sf = _write(tmp_path, "orders", orders)
    out = fixed_width_roundtrip(sf).set_index("status")
    assert out.loc["F", "n"] == 2
    assert out.loc["F", "sum_cents"] == 1001 + 99
    assert out.loc["F", "n_priorities"] == 2
    assert out.loc["O", "sum_cents"] == 500


# ------------------------------------------------ session timeout sweep


def test_session_sweep_thresholds_split_differently(ray_session,
                                                    tmp_path):
    """Gaps of 45 and 90 minutes: 3 sessions at 30 m, 2 at 60 m, 1 at
    120 m — all from one gap computation."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        session_timeout_sweep,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = [base, base + np.timedelta64(45, "m"),
          base + np.timedelta64(45 + 90, "m")]
    tbl = pa.table({"ts": pa.array(ts),
                    "user_id": pa.array([7, 7, 7], pa.int64()),
                    "event_id": pa.array([1, 2, 3], pa.int64())})
    sf = _write(tmp_path, "events", tbl)
    out = session_timeout_sweep(sf).set_index("timeout_minutes")
    assert out.loc[30, "n_sessions"] == 3
    assert out.loc[60, "n_sessions"] == 2
    assert out.loc[120, "n_sessions"] == 1
    assert (out["n_users"] == 1).all()
    assert abs(out.loc[60, "events_per_session"] - 1.5) < 1e-15


# ------------------------------------------------ repartition migration


def test_migration_matches_reference_formula(ray_session, tmp_path):
    """Engine counts equal a direct numpy recomputation of the same
    Knuth-hash assignments, and mod moves far more than range."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        repartition_migration_audit,
    )

    keys = np.arange(1, 2001, dtype=np.int64)
    cust = pa.table({"c_custkey": pa.array(keys)})
    sf = _write(tmp_path, "customer", cust)
    out = repartition_migration_audit(sf).set_index("scheme")

    h = (keys * np.int64(2654435761)) % (np.int64(1) << 32)
    exp_mod = int(((h % 8) != (h % 9)).sum())
    exp_rng = int(((h * 8 // (np.int64(1) << 32))
                   != (h * 9 // (np.int64(1) << 32))).sum())
    assert out.loc["mod", "n_moved"] == exp_mod
    assert out.loc["range", "n_moved"] == exp_rng
    assert out.loc["mod", "moved_frac"] > 0.8          # ~8/9
    # equal-range re-splitting moves ~1/2 (every boundary shifts) —
    # the non-obvious cost the audit exists to surface
    assert 0.4 < out.loc["range", "moved_frac"] < 0.6
    # rendezvous moves only what the new node wins: ~1/9
    assert out.loc["rendezvous", "moved_frac"] < 0.2


# ------------------------------------------------ min-max deciles


def test_minmax_decile_edges_and_constant_group(ray_session, tmp_path):
    """min lands in decile 0, max clamps into decile 9, midpoint in 5;
    a constant-valued type collapses to decile 0 (span guard)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        value_minmax_deciles,
    )

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    tbl = pa.table({
        "event_type": pa.array(["a", "a", "a", "const", "const"]),
        "value": pa.array([0.00, 1.00, 0.50, 3.00, 3.00]),
        "ts": pa.array([t0] * 5),
    })
    sf = _write(tmp_path, "events", tbl)
    out = value_minmax_deciles(sf)
    a = out[out["event_type"] == "a"].set_index("decile")["n"]
    assert a.index.tolist() == [0, 5, 9]
    assert a.tolist() == [1, 1, 1]
    c = out[out["event_type"] == "const"]
    assert c["decile"].tolist() == [0]
    assert c["n"].tolist() == [2]


# ------------------------------------------------ k-anonymity


def test_k_anonymity_small_group_and_ldiv(ray_session, tmp_path):
    """A 2-person QI group drops the anonymity level to 2 and its rows
    count below k=5; a group whose members share one balance band pins
    min l-diversity to 1."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        k_anonymity_audit,
    )

    cust = pa.table({
        "c_nationkey": pa.array([1] * 6 + [2] * 2, pa.int64()),
        "c_mktsegment": pa.array(["AUTO"] * 6 + ["AUTO"] * 2),
        # nation 1: six customers spread over 3 bands; nation 2: two
        # customers in ONE band (l-diversity 1)
        "c_acctbal": pa.array([100.0, 150.0, 1100.0, 1200.0,
                               2100.0, 2200.0, 500.0, 600.0]),
    })
    sf = _write(tmp_path, "customer", cust)
    out = k_anonymity_audit(sf)
    assert out["n_groups"].tolist() == [2]
    assert out["min_group_size"].tolist() == [2]
    assert out["rows_below_k5"].tolist() == [2]
    assert out["min_l_diversity"].tolist() == [1]


# ------------------------------------------------ price-volume-mix


def test_pvm_hand_computed_effects(ray_session, tmp_path):
    """q: 10 -> 20 at rev 1000 -> 3000 cents: volume effect = +1000,
    price effect = +1000, and they sum exactly to the revenue delta."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        revenue_pvm_decomposition,
    )

    def d(s):
        return np.datetime64(s, "us")

    part = pa.table({"p_partkey": pa.array([1], pa.int64()),
                     "p_brand": pa.array(["B1"])})
    li = pa.table({
        "l_partkey": pa.array([1, 1], pa.int64()),
        "l_quantity": pa.array([10.0, 20.0]),
        "l_extendedprice": pa.array([10.00, 30.00]),
        "l_shipdate": pa.array([d("1995-06-01"), d("1996-06-01")]),
    })
    pq.write_table(part, tmp_path / "part.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")
    out = revenue_pvm_decomposition(str(tmp_path))
    assert out["volume_effect"].tolist() == [1000.0]
    assert out["price_effect"].tolist() == [1000.0]
    assert (out["volume_effect"] + out["price_effect"]).tolist() \
        == [float(out["rev2_cents"].iloc[0] - out["rev1_cents"].iloc[0])]


# ------------------------------------------------ rank movers


def test_rank_movers_swap_and_sign(ray_session, tmp_path):
    """Brands A and C swap ranks 1 and 3 between years: A's delta is
    -2 (fell), C's +2 (climbed), B unchanged at 0."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        brand_rank_movers,
    )

    def d(s):
        return np.datetime64(s, "us")

    part = pa.table({"p_partkey": pa.array([1, 2, 3], pa.int64()),
                     "p_brand": pa.array(["A", "B", "C"])})
    rows = [(1, 30.0, "1995-06-01"), (2, 20.0, "1995-06-02"),
            (3, 10.0, "1995-06-03"),
            (1, 10.0, "1996-06-01"), (2, 20.0, "1996-06-02"),
            (3, 30.0, "1996-06-03")]
    li = pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows]),
        "l_shipdate": pa.array([d(r[2]) for r in rows]),
    })
    pq.write_table(part, tmp_path / "part.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")
    out = brand_rank_movers(str(tmp_path)).set_index("p_brand")
    assert out.loc["A", "rank_delta"] == -2
    assert out.loc["C", "rank_delta"] == 2
    assert out.loc["B", "rank_delta"] == 0
    # |delta| ordering puts B last
    assert out.index.tolist() == ["A", "C", "B"]


# ------------------------------------------------ runs test


def test_runs_test_known_sequence(ray_session, tmp_path):
    """Signs +,+,-,+ in key order: 3 runs, n1=3, n2=1 ->
    mu = 2.5, var = 0.25, z = 1.0 exactly."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        acctbal_runs_test,
    )

    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_acctbal": pa.array([5.0, 6.0, -1.0, 2.0]),
    })
    sf = _write(tmp_path, "customer", cust)
    out = acctbal_runs_test(sf)
    assert out["n_runs"].tolist() == [3]
    assert out["n_pos"].tolist() == [3]
    assert out["n_neg"].tolist() == [1]
    assert out["expected_runs"].tolist() == [2.5]
    assert out["z_score"].tolist() == [1.0]


# ------------------------------------------------ kNN label agreement


def test_knn_mismatch_on_planted_mislabel(ray_session, tmp_path):
    """Three tight points of label 0 plus one point sitting INSIDE the
    label-0 cluster but labeled 1: its NN disagrees (1 mismatch for
    label 1) and it also flips its nearest label-0 neighbor."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        knn_label_agreement,
    )

    vecs = [[0.0, 0.0], [0.1, 0.0], [10.0, 10.0], [0.05, 0.0]]
    lab = [0, 0, 0, 1]
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(lab, pa.int32())})
    sf = _write(tmp_path, "embeddings", tbl)
    out = knn_label_agreement(sf).set_index("label")
    # vec 4 (label 1): NN is vec 1 or 2 (label 0) -> mismatch
    assert out.loc[1, "n_nn_mismatch"] == 1
    # vec 1's NN is vec 4 (0.05 away, label 1) -> mismatch; vec 2's NN
    # is vec 4 too (0.05) -> mismatch; vec 3's NN is label 0's... vec 3
    # is far from all, NN by distance is one of the cluster (label 0
    # for 1/2, label 1 for 4) - nearest to (10,10) among others is
    # whichever: all ~ equal? no: distances to (0.1,0) < (0.05,0) <
    # (0,0) are ordered, nearest is (0.1, 0) label 0 -> agree
    assert out.loc[0, "n_nn_mismatch"] == 2


def test_knn_tie_breaks_to_smallest_vec_id(ray_session, tmp_path):
    """Two equidistant neighbors with different labels: the smaller
    vec_id wins the vote deterministically."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        knn_label_agreement,
    )

    # vec 3 at origin; vec 1 at (+1, 0) label 9, vec 2 at (-1, 0)
    # label 3 -> exact distance tie for vec 3; vec 1 (smaller id,
    # label 9 = vec 3's own) must win, so vec 3 agrees.  vec 1's NN is
    # vec 3 (agree); vec 2's NN is vec 3, label 9 != 3 (mismatch).
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 0.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([9, 3, 9], pa.int32())})
    sf = _write(tmp_path, "embeddings", tbl)
    out = knn_label_agreement(sf).set_index("label")
    assert out.loc[9, "n_nn_mismatch"] == 0
    assert out.loc[3, "n_nn_mismatch"] == 1


# ------------------------------------------------ sliding burst


def test_sliding_window_catches_straddling_burst(ray_session,
                                                 tmp_path):
    """Events at 299 s and 301 s: minute- or 5-minute-bucketed counts
    see one each, the true sliding window sees both (peak 2 at
    299 s)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        peak_sliding_window_rate,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = [base + np.timedelta64(s, "s") for s in (0, 299, 301)]
    tbl = pa.table({"ts": pa.array(ts),
                    "event_type": pa.array(["a"] * 3)})
    sf = _write(tmp_path, "events", tbl)
    out = peak_sliding_window_rate(sf)
    assert out["peak_count"].tolist() == [2]
    assert out["window_start"].tolist() == ["2024-01-01 00:00:00"]
    # window at 0 s covers {0, 299}; window at 299 covers {299, 301}
    # -> tie at 2, earliest start wins


# ------------------------------------------------ top-N + OTHER


def test_top_with_other_conserves_total(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        brand_revenue_top_with_other,
    )

    part = pa.table({
        "p_partkey": pa.array(list(range(1, 8)), pa.int64()),
        "p_brand": pa.array([f"B{i}" for i in range(1, 8)])})
    li = pa.table({
        "l_partkey": pa.array(list(range(1, 8)), pa.int64()),
        "l_extendedprice": pa.array([70.0, 60.0, 50.0, 40.0, 30.0,
                                     20.0, 10.0])})
    pq.write_table(part, tmp_path / "part.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")
    out = brand_revenue_top_with_other(str(tmp_path))
    assert out["p_brand"].tolist() == ["B1", "B2", "B3", "B4", "B5",
                                       "OTHER"]
    assert out["rev_cents"].tolist() == [7000, 6000, 5000, 4000, 3000,
                                         3000]
    assert out["rev_cents"].sum() == 28000  # conserved


# ------------------------------------------------ dedup survivorship


def test_survivorship_longest_then_smallest_id(ray_session, tmp_path):
    """Within a prefix block the longest text survives; equal lengths
    fall back to the smaller doc_id; singleton blocks emit nothing."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        prefix_dedup_survivorship,
    )

    pfx = "z" * 24
    texts = [pfx + "aa", pfx + "aaaa", pfx + "bbbb", "y" * 30]
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    sf = _write(tmp_path, "documents", docs)
    out = prefix_dedup_survivorship(sf)
    # block z*24: docs 2 and 3 tie at 28 chars -> doc 2 survives;
    # replaced: 1 and 3 -> survivor 2. doc 4 is a singleton block.
    assert out["replaced_doc_id"].tolist() == [1, 3]
    assert out["survivor_doc_id"].tolist() == [2, 2]


# ------------------------------------------------ GDPR purge


def test_purge_removes_exactly_three_smallest_users(ray_session,
                                                    tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        user_purge_with_proof,
    )

    # users 1, 2, 3 purged; 20, 21 survive
    eids = list(range(1, 11))
    uids = [1, 2, 3, 1, 2, 20, 20, 21, 21, 21]
    tbl = pa.table({"event_id": pa.array(eids, pa.int64()),
                    "user_id": pa.array(uids, pa.int64())})
    sf = _write(tmp_path, "events", tbl)
    out = user_purge_with_proof(sf)
    surv = [(e, u) for e, u in zip(eids, uids) if u in (20, 21)]
    assert out["n_rows_after"].tolist() == [len(surv)]
    assert out["sum_eid_after"].tolist() == [sum(e for e, _ in surv)]
    exp_mix = sum((e * 1_000_003 + u) % (1 << 61)
                  for e, u in surv) % (1 << 61)
    assert out["mix_after"].tolist() == [exp_mix]
    # users 1,2,3 hash to buckets 1,2,3 -> exactly 3 rewrites
    assert out["n_buckets_rewritten"].tolist() == [3]


# ------------------------------------------------ weighting trap


def test_weighting_trap_diverges_when_correlated(ray_session,
                                                 tmp_path):
    """Big orders get big discounts: qty-weighted mean must exceed the
    unweighted per-line mean by the hand-computed gap."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        discount_weighting_trap,
    )

    sup = pa.table({"s_suppkey": pa.array([1], pa.int64()),
                    "s_nationkey": pa.array([7], pa.int64())})
    li = pa.table({
        "l_suppkey": pa.array([1, 1], pa.int64()),
        "l_quantity": pa.array([1.0, 9.0]),
        "l_discount": pa.array([0.00, 0.10]),
    })
    pq.write_table(sup, tmp_path / "supplier.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")
    out = discount_weighting_trap(str(tmp_path))
    # unweighted: (0 + 1000)/2 = 500 bp; weighted: 9000/10 = 900 bp
    assert out["avg_bp_unweighted"].tolist() == [500.0]
    assert out["avg_bp_qty_weighted"].tolist() == [900.0]
    assert out["divergence_bp"].tolist() == [400.0]


# ------------------------------------------------ adoption order


def test_adoption_order_uses_first_ts_and_tie_type(ray_session,
                                                   tmp_path):
    """Later repeats don't change the signature; a first-ts tie falls
    back to type name order."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        type_adoption_order,
    )

    t0 = np.datetime64("2024-01-01T00:00:00", "us")

    def t(s):
        return t0 + np.timedelta64(s, "s")

    rows = [
        (1, "b", 0), (1, "a", 10), (1, "b", 20),   # u1: b>a
        (2, "a", 0), (2, "b", 0),                   # u2 tie -> a>b
        (3, "b", 5), (3, "a", 50),                  # u3: b>a
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([t(r[2]) for r in rows])})
    sf = _write(tmp_path, "events", tbl)
    out = type_adoption_order(sf)
    assert out["adoption_order"].tolist() == ["b>a", "a>b"]
    assert out["n_users"].tolist() == [2, 1]


# ------------------------------------------------ day boundary


def test_day_boundary_moves_peak(ray_session, tmp_path):
    """Three events at 23:00 + one next noon: UTC peak day is day 1
    (3 events), but at +8 h the 23:00 cluster rolls into day 2."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        day_boundary_sensitivity,
    )

    def t(s):
        return np.datetime64(s, "us")

    ts = [t("2024-01-01T23:00:00")] * 3 + [t("2024-01-02T12:00:00")]
    sf = _write(tmp_path, "events", pa.table({"ts": pa.array(ts)}))
    out = day_boundary_sensitivity(sf).set_index("offset_hours")
    assert out.loc[0, "peak_day"] == "2024-01-01"
    assert out.loc[0, "peak_count"] == 3
    # +8h: the 23:00 events shift to Jan 2 -> all 4 on one day
    assert out.loc[8, "peak_day"] == "2024-01-02"
    assert out.loc[8, "peak_count"] == 4


# ------------------------------------------------ cube distinct


def test_cube_distinct_nonadditive_levels(ray_session, tmp_path):
    """User 7 active on two weekdays: by-type distinct is 1 (NOT the
    sum of cell distincts, which would be 2) — the non-additive trap
    the detail-pair fold avoids."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        events_cube_distinct_users,
    )

    mon = np.datetime64("1970-01-05T10:00:00", "us")
    tue = np.datetime64("1970-01-06T10:00:00", "us")
    tbl = pa.table({
        "ts": pa.array([mon, tue]),
        "event_type": pa.array(["a", "a"]),
        "user_id": pa.array([7, 7], pa.int64())})
    sf = _write(tmp_path, "events", tbl)
    out = events_cube_distinct_users(sf)
    cell = out[(out["event_type"] == "a") & (out["dow"] != 0)]
    assert cell["n_users"].tolist() == [1, 1]
    bytype = out[(out["event_type"] == "a") & (out["dow"] == 0)]
    assert bytype["n_users"].tolist() == [1]  # not 2
    total = out[(out["event_type"] == "(all)") & (out["dow"] == 0)]
    assert total["n_events"].tolist() == [2]
    assert total["n_users"].tolist() == [1]


# ------------------------------------------------ phrase search


def test_phrase_positions_adjacency_only(ray_session, tmp_path):
    """'table hash table hash' has 2 occurrences; 'table x hash' has
    none; punctuation empties don't shift positions."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        phrase_search_positions,
    )

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["table hash table hash",
                          "table x hash table",
                          "...table, hash!"])})
    sf = _write(tmp_path, "documents", docs)
    out = phrase_search_positions(sf)
    assert out["n_docs"].tolist() == [2]       # docs 1 and 3
    assert out["n_occurrences"].tolist() == [3]  # 2 + 0 + 1


# ------------------------------------------------ byte-split reader


def test_byte_split_survives_records_longer_than_splits(ray_session,
                                                        tmp_path):
    """Three long records against 7 byte-splits: several splits land
    INSIDE one record; the realignment protocol still reads each
    exactly once (the in-query canary would raise otherwise)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        byte_split_realigned_read,
    )

    big = 10 ** 17
    tbl = pa.table({
        "event_id": pa.array([big + 1, big + 2, big + 3], pa.int64()),
        "user_id": pa.array([big + 7, big + 8, big + 9], pa.int64())})
    sf = _write(tmp_path, "events", tbl)
    out = byte_split_realigned_read(sf)
    assert out["n"].tolist() == [3]
    assert out["sum_e"].tolist() == [3 * big + 6]
    assert out["sum_u"].tolist() == [3 * big + 24]


# ------------------------------------------------ novelty curve


def test_novelty_duplicate_doc_scores_zero(ray_session, tmp_path):
    """Doc 1 introduces every shingle (novelty 1.0); doc 100, an exact
    textual copy, introduces none (novelty 0.0) — and they land in
    deciles 0 and 9 of the id range."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        doc_ngram_novelty_curve,
    )

    text = "alpha beta gamma delta epsilon zeta eta"
    docs = pa.table({
        "doc_id": pa.array([1, 100], pa.int64()),
        "text": pa.array([text, text])})
    sf = _write(tmp_path, "documents", docs)
    out = doc_ngram_novelty_curve(sf).set_index("decile")
    assert out.loc[0, "novelty_rate"] == 1.0
    assert out.loc[9, "novelty_rate"] == 0.0
    assert out.loc[0, "n_shingles"] == 3  # 7 tokens -> 3 five-grams


# ------------------------------------------------ contamination


def test_contamination_counts_shared_shingles(ray_session, tmp_path):
    """src A and src B share exactly the one 5-gram their texts have
    in common; src C shares nothing."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        source_contamination_matrix,
    )

    shared = "one two three four five"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": pa.array(["A", "B", "C"]),
        "text": pa.array([shared + " tailA",
                          shared + " tailB",
                          "six seven eight nine ten"])})
    sf = _write(tmp_path, "documents", docs)
    out = source_contamination_matrix(sf)
    assert out[["source_a", "source_b"]].values.tolist() == [["A", "B"]]
    assert out["n_shared"].tolist() == [1]


# ------------------------------------------------ prefix containment


def test_containment_classifies_truncation_only(ray_session,
                                                tmp_path):
    """Doc 1 is a truncation of doc 2 (classified); doc 3 shares the
    prefix but diverges after it (excluded)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        prefix_containment_dedup,
    )

    pfx = "c" * 24
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([pfx + "hello", pfx + "hello world",
                          pfx + "goodbye"])})
    sf = _write(tmp_path, "documents", docs)
    out = prefix_containment_dedup(sf)
    assert out[["short_doc_id", "long_doc_id"]].values.tolist() \
        == [[1, 2]]
    assert out["short_chars"].tolist() == [29]
    assert out["long_chars"].tolist() == [35]


# ------------------------------------------------ mutual NN


def test_mutual_nn_requires_reciprocity(ray_session, tmp_path):
    """1<->2 are each other's NN (mutual); 3's NN is 2 but 2's is 1,
    so 3 joins no pair.  The cross-label flag fires on 1<->2."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        mutual_nn_pairs,
    )

    vecs = [[0.0, 0.0], [1.0, 0.0], [3.0, 0.0]]
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 1, 1], pa.int32())})
    sf = _write(tmp_path, "embeddings", tbl)
    out = mutual_nn_pairs(sf)
    assert out[["vec_a", "vec_b"]].values.tolist() == [[1, 2]]
    assert out["d2"].tolist() == [10 ** 12]
    assert out["cross_label"].tolist() == [True]


# ------------------------------------------------ medoids


def test_medoid_is_central_point_not_mean(ray_session, tmp_path):
    """Points at 0, 1, 5 on a line: the mean is 2 (no data point) but
    the medoid is the point 1 — min total squared distance."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        label_medoids,
    )

    vecs = [[0.0], [1.0], [5.0]]
    tbl = pa.table({
        "vec_id": pa.array([10, 11, 12], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([4, 4, 4], pa.int32())})
    sf = _write(tmp_path, "embeddings", tbl)
    out = label_medoids(sf)
    assert out["medoid_vec_id"].tolist() == [11]
    # totals: p0: 1+25=26; p1: 1+16=17; p5: 25+16=41 (in 1e12 units)
    assert out["total_d2"].tolist() == [17 * 10 ** 12]
    assert out["n_members"].tolist() == [3]


# ------------------------------------------------ RRF fusion


def test_rrf_fuses_two_rankings(ray_session, tmp_path):
    """Doc 1 wins ranking-1 (most tokens), doc 2 wins ranking-2 (most
    distinct); doc 3 trails both, so fused order is 1, 2, 3 with the
    hand-computed reciprocal scores."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        rrf_rank_fusion,
    )

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a a a a a b", "a b c d e", "a b"])})
    sf = _write(tmp_path, "documents", docs)
    out = rrf_rank_fusion(sf).set_index("doc_id")
    assert out.loc[1, "rank1"] == 1 and out.loc[1, "rank2"] == 2
    assert out.loc[2, "rank1"] == 2 and out.loc[2, "rank2"] == 1
    assert out.loc[3, "rank1"] == 3 and out.loc[3, "rank2"] == 3
    assert abs(out.loc[1, "rrf_score"] - (1 / 61 + 1 / 62)) < 1e-15
    assert out.index.tolist()[:2] == [1, 2]


# ------------------------------------------------ seasonal naive


def test_seasonal_naive_pairs_same_weekday(ray_session, tmp_path):
    """Counts 5 (day d), 8 (d+7), 2 (d+14): pairs are (8 vs 5) and
    (2 vs 8) -> sum_abs_err = 3 + 6 = 9, bias = 3 - 6 = -3."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        seasonal_naive_backtest,
    )

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    ts = ([t0] * 5
          + [t0 + np.timedelta64(7, "D")] * 8
          + [t0 + np.timedelta64(14, "D")] * 2)
    tbl = pa.table({"ts": pa.array(ts),
                    "event_type": pa.array(["a"] * len(ts))})
    sf = _write(tmp_path, "events", tbl)
    out = seasonal_naive_backtest(sf)
    assert out["n_pairs"].tolist() == [2]
    assert out["sum_abs_err"].tolist() == [9]
    assert out["bias"].tolist() == [-3]
    assert out["mae"].tolist() == [4.5]


# ------------------------------------------------ event study


def test_event_study_baseline_and_lift(ray_session, tmp_path):
    """Pre-window days at 100 and 200 cents (baseline 150); event-day
    revenue 500 -> lift +350; outside-window rows excluded."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        event_study_window,
    )

    def d(s):
        return np.datetime64(s, "us")

    orders = pa.table({
        "o_orderdate": pa.array([d("1996-06-29"), d("1996-06-25"),
                                 d("1996-07-01"), d("1995-01-01")]),
        "o_totalprice": pa.array([1.00, 2.00, 5.00, 99.0])})
    sf = _write(tmp_path, "orders", orders)
    out = event_study_window(sf).set_index("offset_days")
    assert sorted(out.index.tolist()) == [-6, -2, 0]
    assert out.loc[0, "cents"] == 500
    assert out.loc[0, "baseline_cents"] == 150.0
    assert out.loc[0, "lift_cents"] == 350.0


# ------------------------------------------------ freshness SLA


def test_freshness_relative_to_watermark(ray_session, tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        freshness_sla_audit,
    )

    t0 = np.datetime64("2024-01-01T12:00:00", "us")
    tbl = pa.table({
        "ts": pa.array([t0, t0 - np.timedelta64(31, "m"),
                        t0 - np.timedelta64(5, "m")]),
        "event_type": pa.array(["fresh", "stale", "ok"])})
    sf = _write(tmp_path, "events", tbl)
    out = freshness_sla_audit(sf).set_index("event_type")
    assert out.loc["fresh", "staleness_minutes"] == 0
    assert out.loc["stale", "staleness_minutes"] == 31
    assert bool(out.loc["stale", "breaches_30m"])
    assert not bool(out.loc["ok", "breaches_30m"])


# ------------------------------------------------ priority inversion


def test_priority_inversion_even_median_and_flag(ray_session,
                                                 tmp_path):
    """Priority A ships in {1, 3} days (median 2.0 via mean-of-middles)
    vs B's constant 1 day: A is inverted vs B; B (last) is not."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        priority_sla_inversion,
    )

    def d(s):
        return np.datetime64(s, "us")

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([d("1995-01-01")] * 3),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT",
                                     "2-HIGH"])})
    li = pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_shipdate": pa.array([d("1995-01-02"), d("1995-01-04"),
                                d("1995-01-02")])})
    pq.write_table(orders, tmp_path / "orders.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")
    out = priority_sla_inversion(str(tmp_path)).set_index(
        "o_orderpriority")
    assert out.loc["1-URGENT", "median_lag_days"] == 2.0
    assert out.loc["2-HIGH", "median_lag_days"] == 1.0
    assert bool(out.loc["1-URGENT", "inverted_vs_next"])
    assert not bool(out.loc["2-HIGH", "inverted_vs_next"])


# ------------------------------------------------ readability


def test_readability_exact_counts_and_formula(ray_session, tmp_path):
    """'hello world. again!' = 3 words, syllables (2,1,2)=5, 2
    sentences -> flesch = 206.835 - 1.015*1.5 - 84.6*(5/3)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        doc_readability,
    )

    docs = pa.table({
        "lang": pa.array(["en"]),
        "text": pa.array(["hello world. again!"])})
    sf = _write(tmp_path, "documents", docs)
    out = doc_readability(sf)
    assert out["n_words"].tolist() == [3]
    assert out["n_syllables"].tolist() == [5]  # he-llo? vowel groups:
    # hello: e, o -> 2; world: o -> 1; again: a, ai -> 2
    assert out["n_sentences"].tolist() == [2]
    exp = 206.835 - 1.015 * (3 / 2) - 84.6 * (5 / 3)
    assert abs(out["flesch"].iloc[0] - exp) < 1e-12


def test_readability_consonant_word_counts_one_syllable(ray_session,
                                                        tmp_path):
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        doc_readability,
    )

    docs = pa.table({"lang": pa.array(["x"]),
                     "text": pa.array(["tsk tsk"])})
    sf = _write(tmp_path, "documents", docs)
    out = doc_readability(sf)
    assert out["n_words"].tolist() == [2]
    assert out["n_syllables"].tolist() == [2]  # min 1 per word


# ------------------------------------------------ norm clipping


def test_norm_clip_threshold_and_count(ray_session, tmp_path):
    """Ten 1-d vectors with squared norms 1..100 (·1e12): ceil-rank
    p99 of n=10 is the 10th value (threshold = max) -> 0 clipped;
    verifies the ceil-rank convention matches the SQL."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        embedding_norm_clip_audit,
    )

    vecs = [[float(i)] for i in range(1, 11)]
    tbl = pa.table({
        "vec_id": pa.array(list(range(1, 11)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * 10, pa.int32())})
    sf = _write(tmp_path, "embeddings", tbl)
    out = embedding_norm_clip_audit(sf)
    assert out["n_vectors"].tolist() == [10]
    assert out["p99_sq_norm"].tolist() == [100 * 10 ** 12]
    assert out["n_clipped"].tolist() == [0]


# ------------------------------------------------ table diff


def test_table_diff_rule_classes(ray_session, tmp_path):
    """okey 101 is removed, 97 changes cents by +1, 1 and 2 stay
    identical, and five synthetic keys are added."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        table_diff_classification,
    )

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 97, 101], pa.int64()),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0]),
        "o_orderstatus": pa.array(["F", "O", "F", "O"])})
    sf = _write(tmp_path, "orders", orders)
    out = table_diff_classification(sf)
    assert out["added"].tolist() == [5]
    assert out["removed"].tolist() == [1]
    assert out["changed"].tolist() == [1]
    assert out["changed_cents"].tolist() == [1]
    assert out["changed_status"].tolist() == [0]
    assert out["identical"].tolist() == [2]


# ------------------------------------------------ CUPED


def test_cuped_removes_preperiod_variance(ray_session, tmp_path):
    """y = 2x exactly for every user -> theta = 2 and BOTH arms'
    adjusted means collapse to 2 * pooled mean(x), even though the raw
    means differ (the whole point of CUPED)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        ab_cuped_adjusted_lift,
    )

    pre_t = np.datetime64("2024-01-10T00:00:00", "us")
    post_t = np.datetime64("2024-01-20T00:00:00", "us")
    # arm A users (md5 first hex <= '7'): 6, 9, 11; arm B: 1, 2, 3
    users_x = {6: 1.0, 9: 2.0, 11: 3.0, 1: 10.0, 2: 20.0, 3: 30.0}
    ts, uid, val = [], [], []
    for u, x in users_x.items():
        ts += [pre_t, post_t]
        uid += [u, u]
        val += [x, 2 * x]
    tbl = pa.table({"ts": pa.array(ts),
                    "user_id": pa.array(uid, pa.int64()),
                    "value": pa.array(val)})
    sf = _write(tmp_path, "events", tbl)
    out = ab_cuped_adjusted_lift(sf).set_index("arm")
    assert abs(out.loc["A", "theta"] - 2.0) < 1e-12
    pooled_x_cents = (1 + 2 + 3 + 10 + 20 + 30) * 100 / 6
    assert abs(out.loc["A", "mean_y_adjusted"]
               - 2 * pooled_x_cents) < 1e-9
    assert abs(out.loc["B", "mean_y_adjusted"]
               - 2 * pooled_x_cents) < 1e-9
    # raw means differ by construction
    assert out.loc["B", "mean_y_cents"] > out.loc["A", "mean_y_cents"]


# ------------------------------------------------ retention curve


def test_retention_curve_exact_lags(ray_session, tmp_path):
    """User active on days 1, 2, 4: lag-1 retains day-1 (of 3 user-
    days), lag-2 retains days 2 (2->4), lag-3 retains day 1 (1->4)."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        retention_curve_by_lag,
    )

    def t(day):
        return (np.datetime64("1970-01-01", "us")
                + np.timedelta64(day * 24 + 9, "h"))

    tbl = pa.table({
        "ts": pa.array([t(1), t(1), t(2), t(4)]),  # day 1 duplicated
        "user_id": pa.array([5, 5, 5, 5], pa.int64())})
    sf = _write(tmp_path, "events", tbl)
    out = retention_curve_by_lag(sf).set_index("lag_days")
    assert (out["n_user_days"] == 3).all()
    assert out.loc[1, "n_retained"] == 1   # 1->2
    assert out.loc[2, "n_retained"] == 1   # 2->4
    assert out.loc[3, "n_retained"] == 1   # 1->4
    assert out.loc[4, "n_retained"] == 0
    assert abs(out.loc[1, "retention_rate"] - 1 / 3) < 1e-15


# ------------------------------------------------ token dispersion


def test_token_dispersion_separates_clumped_from_even(ray_session,
                                                      tmp_path):
    """'topic' appears 4x in one doc of four (clumped: VMR = 3.0 by
    hand), 'the' once per doc (perfectly even: VMR = 0) — the
    topical/function-word split the statistic exists for."""
    from approximate_anomaly_detection_in_data_streams_ray.pipelines.queries import (
        token_dispersion_topk,
    )

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["the topic topic topic topic",
                          "the x", "the y", "the z"])})
    sf = _write(tmp_path, "documents", docs)
    out = token_dispersion_topk(sf).set_index("token")
    # topic: counts (4,0,0,0), mean 1, var = (16 - 4)/3 = 4 -> VMR 4.0
    assert out.loc["topic", "total"] == 4
    assert out.loc["topic", "docs_present"] == 1
    assert abs(out.loc["topic", "vmr"] - 4.0) < 1e-12
    assert out.loc["the", "total"] == 4
    assert out.loc["the", "vmr"] == 0.0
