"""Named query pipelines over the driver's testdata tables + the synthetic
code_files corpus — the engine's public pipeline surface.

Every entry in :data:`QUERIES` takes ``sf_dir`` and returns a Dataset /
pandas DataFrame / pyarrow Table; entries with a matching key in
:data:`ORACLE_SQL` are verified row-for-row against DuckDB by the driver
(column names are aligned on both sides; float aggregates are rounded
identically).  SQL-inexpressible pipelines (sketches, detectors, LSH dedup,
ANN-IVF, multimodal) are rows-only checked.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Max, Min, Sum

TOKEN_RE = r"[A-Za-z0-9_]+"


def _t(sf_dir: str, name: str, columns=None):
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# --------------------------------------------------------------- SQL-checked


def doc_stats(sf_dir: str):
    """Per-language document stats (partial agg inside Ray's groupby)."""
    ds = _t(sf_dir, "documents", columns=["lang", "n_chars"])
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    )


def token_totals(sf_dir: str):
    """Whitespace-free token counts (RE2 kernel, same regex as the oracle)."""
    ds = _t(sf_dir, "documents", columns=["lang", "text"])

    def add_tokens(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.fill_null(pc.count_substring_regex(b["text"], TOKEN_RE), 0), pa.int64())
        return pa.table({"lang": b["lang"], "n_tokens": n})

    return ds.map_batches(add_tokens, batch_format="pyarrow").groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="sum_tokens")
    )


def text_profile(sf_dir: str):
    """Per-language punctuation/digit profile — integer sums only so the
    comparison with the SQL oracle is exact."""
    ds = _t(sf_dir, "documents", columns=["lang", "text"])

    def prof(b: pa.Table) -> pa.Table:
        def cnt(pat):
            return pc.cast(pc.fill_null(pc.count_substring_regex(b["text"], pat), 0), pa.int64())

        return pa.table(
            {
                "lang": b["lang"],
                "n_punct": cnt(r"[^\w\s]"),
                "n_digit": cnt(r"[0-9]"),
                "n_space": cnt(r"\s"),
            }
        )

    return ds.map_batches(prof, batch_format="pyarrow").groupby("lang").aggregate(
        Sum("n_punct", alias_name="sum_punct"),
        Sum("n_digit", alias_name="sum_digit"),
        Sum("n_space", alias_name="sum_space"),
    )


def exact_dedup_documents(sf_dir: str):
    """Exact dedup, keep-first (min doc_id per distinct text)."""
    from ..stages.dedup import exact_dedup_keep_first

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup_keep_first(ds, id_col="doc_id", text_col="text")


def referential_orders(sf_dir: str):
    """Orphan order count: broadcast semi-join against the customer keys."""
    import pyarrow.parquet as pq

    keys = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey"])["c_custkey"]
    key_set = ray.put(keys.combine_chunks())
    ds = _t(sf_dir, "orders", columns=["o_custkey"])

    class Orphans:
        def __init__(self):
            self.keys = ray.get(key_set)

        def __call__(self, b: pa.Table) -> pa.Table:
            bad = pc.invert(pc.is_in(b["o_custkey"], value_set=self.keys))
            return pa.table({"n": pa.array([int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)], pa.int64())})

    parts = ds.map_batches(Orphans, batch_format="pyarrow", concurrency=2,
                           num_cpus=0.5).to_pandas()
    return pd.DataFrame({"n_orphans": [int(parts["n"].sum())]})


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary (vectorized derived column +
    two-key groupby with partial pre-aggregation)."""
    ds = _t(sf_dir, "lineitem",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount", "l_shipdate"])

    def derive(b: pa.Table) -> pa.Table:
        keep = pc.less_equal(b["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us")))
        b = b.filter(keep)
        disc = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "l_quantity": b["l_quantity"],
                "l_extendedprice": b["l_extendedprice"],
                "disc_price": disc,
            }
        )

    agg = ds.map_batches(derive, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Count(alias_name="count_order"),
    ).to_pandas()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        agg[c] = agg[c].round(2)
    return agg.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def top_orders(sf_dir: str):
    ds = _t(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def events_hourly(sf_dir: str):
    ds = _t(sf_dir, "events", columns=["event_type", "ts", "value"])

    def hour(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "hour": pc.floor_temporal(b["ts"], unit="hour"),
                "value": b["value"],
            }
        )

    agg = ds.map_batches(hour, batch_format="pyarrow").groupby(
        ["event_type", "hour"]
    ).aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value")).to_pandas()
    agg["sum_value"] = agg["sum_value"].round(2)
    return agg.sort_values(["event_type", "hour"]).reset_index(drop=True)


def customer_order_totals(sf_dir: str):
    """Broadcast hash join (small side shipped once via ray.put)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name"])
    lookup_ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(),
                                  cust["c_name"].to_pylist())))
    ds = _t(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    class JoinName:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            names = [self.lookup.get(k) for k in b["o_custkey"].to_pylist()]
            t = pa.table({"c_name": pa.array(names, pa.string()),
                          "o_totalprice": b["o_totalprice"]})
            return t.filter(pc.is_valid(t["c_name"]))

    agg = ds.map_batches(JoinName, batch_format="pyarrow", concurrency=2,
                         num_cpus=0.5).groupby("c_name").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="sum_total")
    ).to_pandas()
    agg["sum_total"] = agg["sum_total"].round(2)
    return agg.sort_values("c_name").reset_index(drop=True)


def null_profile_events(sf_dir: str):
    ds = _t(sf_dir, "events", columns=["event_type", "props", "value"])

    def nulls(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "null_props": pc.cast(pc.is_null(b["props"]), pa.int64()),
                "null_value": pc.cast(pc.is_null(b["value"]), pa.int64()),
            }
        )

    return ds.map_batches(nulls, batch_format="pyarrow").groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("null_props", alias_name="n_null_props"),
        Sum("null_value", alias_name="n_null_value"),
    )


def distinct_users_exact(sf_dir: str):
    """Exact distinct count via groupby (contrast with the HLL sketch)."""
    ds = _t(sf_dir, "events", columns=["user_id"])
    n = ds.groupby("user_id").aggregate(Count(alias_name="c")).count()
    return pd.DataFrame({"n_users": [int(n)]})


def part_brand_stats(sf_dir: str):
    ds = _t(sf_dir, "part", columns=["p_brand", "p_size", "p_retailprice"])
    agg = ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Min("p_size", alias_name="min_size"),
        Max("p_size", alias_name="max_size"),
        Sum("p_retailprice", alias_name="sum_price"),
    ).to_pandas()
    agg["sum_price"] = agg["sum_price"].round(2)
    return agg.sort_values("p_brand").reset_index(drop=True)


def top_orders_per_customer(sf_dir: str):
    """Per-group top-k: per-batch partial top-3 per customer (vectorized
    pandas head-after-sort) → tiny groupby merge.  The partial stage bounds
    the shuffle to ≤3 rows per (customer, batch)."""
    ds = _t(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                               ascending=[True, False, True])
                .groupby("o_custkey", sort=False).head(3))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True]).head(3))

    out = ds.map_batches(partial_topk, batch_format="pandas").groupby(
        "o_custkey").map_groups(final_topk, batch_format="pandas").to_pandas()
    return out.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                           ascending=[True, False, True]).reset_index(drop=True)


def bpeish_token_totals(sf_dir: str):
    """BPE-ish pre-tokenizer counts (words | numbers | single symbols)."""
    from ..functions.text import BPEISH_RE

    ds = _t(sf_dir, "documents", columns=["lang", "text"])

    def add(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.fill_null(pc.count_substring_regex(b["text"], BPEISH_RE), 0),
                    pa.int64())
        return pa.table({"lang": b["lang"], "n_bpeish": n})

    return ds.map_batches(add, batch_format="pyarrow").groupby("lang").aggregate(
        Sum("n_bpeish", alias_name="sum_bpeish")
    )


def session_windows(sf_dir: str):
    """Gap-based sessionization (30-min inactivity gap) per user — the
    streaming-shaped windowed aggregate the reference's count-based windows
    generalize to.  groupby carries only (user_id, ts); windowing is
    vectorized numpy inside each group."""
    ds = _t(sf_dir, "events", columns=["user_id", "ts"])
    GAP_US = 30 * 60 * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        breaks = np.diff(ts) > GAP_US
        n_sessions = 1 + int(breaks.sum())
        bounds = np.concatenate([[0], np.nonzero(breaks)[0] + 1, [len(ts)]])
        sizes = np.diff(bounds)
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": [len(ts)],
                "n_sessions": [n_sessions],
                "max_session_events": [int(sizes.max())],
            }
        )

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def value_quantiles(sf_dir: str):
    """Approximate quantiles of events.value per event_type via a
    deterministic mergeable stride-sample sketch (per-batch partial, driver
    merge) — the KLL-style pattern at small constant size."""
    from ..functions.sketches import stride_sample, weighted_quantiles

    ds = _t(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type"):
            vals, w = stride_sample(g["value"].to_numpy(dtype=np.float64), k=64)
            rows.append({"event_type": et, "vals": vals.tobytes(),
                         "weight": float(w), "n": len(g)})
        return pd.DataFrame(rows)

    pdf = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = []
    for et, g in pdf.groupby("event_type"):
        samples = np.concatenate([np.frombuffer(b, dtype=np.float64) for b in g["vals"]])
        weights = np.concatenate(
            [np.full(len(np.frombuffer(b, dtype=np.float64)), w)
             for b, w in zip(g["vals"], g["weight"])]
        )
        qs = weighted_quantiles(samples, weights, [0.5, 0.9, 0.99])
        out.append({"event_type": et, "n": int(g["n"].sum()),
                    "p50": round(qs[0], 3), "p90": round(qs[1], 3),
                    "p99": round(qs[2], 3)})
    return pd.DataFrame(out).sort_values("event_type").reset_index(drop=True)


def ann_topk(sf_dir: str):
    """Exact cosine top-10: per-batch matmul partial top-k, driver merge.
    Query = the embedding of the smallest vec_id."""
    from ..stages.ann import brute_force_topk

    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = ds.sort("vec_id").limit(1).to_pandas()
    q = np.stack(first["embedding"].to_numpy())
    out = brute_force_topk(ds, q, k=10)
    return out[["vec_id"]].reset_index(drop=True)


ORACLE_SQL: dict[str, str] = {
    "doc_stats": """
        SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents GROUP BY lang
    """,
    "token_totals": r"""
        SELECT lang, count(*)::BIGINT AS n_docs,
               sum(length(regexp_extract_all(text, '[A-Za-z0-9_]+')))::BIGINT AS sum_tokens
        FROM documents GROUP BY lang
    """,
    "text_profile": r"""
        SELECT lang,
               sum(length(regexp_extract_all(text, '[^\w\s]')))::BIGINT AS sum_punct,
               sum(length(regexp_extract_all(text, '[0-9]')))::BIGINT AS sum_digit,
               sum(length(regexp_extract_all(text, '\s')))::BIGINT AS sum_space
        FROM documents GROUP BY lang
    """,
    "exact_dedup_documents": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
    "referential_orders": """
        SELECT count(*)::BIGINT AS n_orphans FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               count(*)::BIGINT AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "top_orders": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "events_hourly": """
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*)::BIGINT AS n_events, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "customer_order_totals": """
        SELECT c.c_name AS c_name, count(*)::BIGINT AS n_orders,
               round(sum(o.o_totalprice), 2) AS sum_total
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_name ORDER BY c.c_name
    """,
    "null_profile_events": """
        SELECT event_type, count(*)::BIGINT AS n,
               sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_props,
               sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_value
        FROM events GROUP BY event_type
    """,
    "distinct_users_exact": """
        SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM events
    """,
    "top_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders) WHERE rn <= 3
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    "bpeish_token_totals": r"""
        SELECT lang, sum(length(regexp_extract_all(
            text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))::BIGINT AS sum_bpeish
        FROM documents GROUP BY lang
    """,
    "session_windows": """
        SELECT user_id, count(*)::BIGINT AS n_events,
               (1 + sum(CASE WHEN gap THEN 1 ELSE 0 END))::BIGINT AS n_sessions,
               max(session_size)::BIGINT AS max_session_events
        FROM (
            SELECT user_id, gap, count(*) OVER (PARTITION BY user_id, session_id) AS session_size
            FROM (
                SELECT user_id, gap,
                       sum(CASE WHEN gap THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
                FROM (
                    SELECT user_id, ts,
                           COALESCE(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                    > INTERVAL 30 MINUTE, FALSE) AS gap
                    FROM events)))
        GROUP BY user_id ORDER BY user_id
    """,
    "part_brand_stats": """
        SELECT p_brand, count(*)::BIGINT AS n_parts, min(p_size) AS min_size,
               max(p_size) AS max_size, round(sum(p_retailprice), 2) AS sum_price
        FROM part GROUP BY p_brand ORDER BY p_brand
    """,
    "ann_topk": """
        WITH q AS (SELECT embedding FROM embeddings
                   WHERE vec_id = (SELECT min(vec_id) FROM embeddings))
        SELECT e.vec_id AS vec_id FROM embeddings e, q
        ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
        LIMIT 10
    """,
}


# ----------------------------------------------------------------- rows-only


def hll_users_per_event_type(sf_dir: str):
    """Approximate distinct user_id per event_type: HLL partial per batch,
    registers merged in a tiny groupby (sketches never shuffle raw rows)."""
    from ..functions.sketches import HyperLogLog, hll_merge_bytes
    from ..functions.hashing import stable_hash64

    ds = _t(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": b["event_type"].to_pylist(),
                           "h": stable_hash64(b["user_id"])})
        rows = {"event_type": [], "hll": []}
        for et, g in df.groupby("event_type"):
            rows["event_type"].append(et)
            rows["hll"].append(HyperLogLog(p=12).add_hashes(g["h"].to_numpy()).to_bytes())
        return pa.table({"event_type": pa.array(rows["event_type"], pa.string()),
                         "hll": pa.array(rows["hll"], pa.binary())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        est = HyperLogLog.from_bytes(hll_merge_bytes(list(g["hll"]))).estimate()
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "approx_users": [round(est)]})

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "event_type").map_groups(merge, batch_format="pandas")


def minhash_dedup_documents(sf_dir: str):
    from ..stages.dedup import minhash_near_dup_pairs

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_near_dup_pairs(ds, threshold=0.7, concurrency=8)


def simhash_dedup_documents(sf_dir: str):
    from ..stages.dedup import simhash_near_dup_pairs

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_dup_pairs(ds, max_hamming=6, concurrency=8)


def ngram_jaccard_dedup_documents(sf_dir: str):
    from ..stages.dedup import minhash_near_dup_pairs, ngram_jaccard_verify

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])
    cand = minhash_near_dup_pairs(ds, threshold=0.5, concurrency=8)
    return ngram_jaccard_verify(ds, cand, threshold=0.6)


def embedding_near_dup(sf_dir: str):
    from ..stages.dedup import embedding_near_dup_pairs

    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dup_pairs(ds, threshold=0.92)


def ivf_ann_topk(sf_dir: str):
    from ..stages.ann import ivf_topk

    ds = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = ds.sort("vec_id").limit(1).to_pandas()
    q = np.stack(first["embedding"].to_numpy())
    return ivf_topk(ds, q, k=10, nlist=16, nprobe=6)


def langid_documents(sf_dir: str):
    from ..functions.text import language_id

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def lid(b: pa.Table) -> pa.Table:
        return pa.table({"detected": language_id(b["text"])})

    return ds.map_batches(lid, batch_format="pyarrow").groupby("detected").aggregate(
        Count(alias_name="n_docs")
    )


def quality_documents(sf_dir: str):
    from ..functions.text import quality_score

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def q(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"],
                         "quality": pc.round(quality_score(b["text"]), 4)})

    return ds.map_batches(q, batch_format="pyarrow")


def fingerprint_documents(sf_dir: str):
    from ..functions.text import doc_fingerprint

    ds = _t(sf_dir, "documents", columns=["doc_id", "text"])

    class FP:
        def __call__(self, b: pa.Table) -> pa.Table:
            fps = [np.int64(np.uint64(doc_fingerprint(t or ""))).item()
                   for t in b["text"].to_pylist()]
            return pa.table({"doc_id": b["doc_id"],
                             "fingerprint": pa.array(fps, pa.int64())})

    return ds.map_batches(FP, batch_format="pyarrow", concurrency=2, num_cpus=1)


def drift_events_mcod(sf_dir: str):
    """The reference's detector over the events stream: one MCOD window per
    event_type, rows ordered by ts within the partition (groupby+map_groups
    carries only (type, ts, value))."""
    from ..state.detectors import MCOD, run_detector

    ds = _t(sf_dir, "events", columns=["event_type", "ts", "value"])

    def detect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        vals = np.log1p(np.abs(g["value"].to_numpy(dtype=np.float64)))[:, None]
        scale = max(np.std(vals), 1e-9)
        out, res = run_detector(MCOD(200, 50, 0.5 * scale, 10, 1), vals)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_events": [len(g)],
                "n_pure_outliers": [len(out)],
                "n_only_inlier": [res["nOnlyInlier"]],
                "n_both": [res["nBothInlierOutlier"]],
            }
        )

    return ds.groupby("event_type").map_groups(detect, batch_format="pandas")


def multimodal_decode(sf_dir: str):
    """Binary media decode/feature plumbing (deterministic fake payloads —
    the real decode kernel is stubbed, see stages/multimodal.py)."""
    from ..stages.multimodal import media_pipeline, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(256, seed=11))
    decoded, feats = media_pipeline(ds)
    d = decoded.to_pandas().sort_values("media_id")
    f = feats.to_pandas().sort_values("media_id")
    d["feature_dim"] = f["feature"].map(len).to_numpy()
    d["mean_intensity"] = d["mean_intensity"].round(4)
    return d[["media_id", "mean_intensity", "feature_dim"]].reset_index(drop=True)


_CODE_CACHE = {}


def _code_files_dir(sf_dir: str) -> str:
    """Deterministic synthetic code_files corpus sized by the sf of the
    testdata dir, cached under /tmp."""
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(base.replace("sf", "") or 0.001)
    except ValueError:
        sf = 0.001  # unrecognized dir name → smallest corpus
    # bench scale (sf >= 0.05) needs a compute-dominated corpus; the
    # correctness scales just need every injected-violation class present
    n_rows = max(2000, int(sf * 40_000_000) if sf >= 0.05 else int(sf * 4_000_000))
    # /dev/shm when available: on a real N-node cluster every node brings
    # its own storage bandwidth, so aggregate I/O scales with N; a single
    # box's fixed disk does not — RAM-backed files model the per-node
    # scaling storage for the two-parallelism-level benchmark
    root = "/dev/shm" if os.access("/dev/shm", os.W_OK) else "/tmp"
    cache = f"{root}/aads_cache/code_files_{base}.v3"
    if cache not in _CODE_CACHE:
        if not os.path.exists(os.path.join(cache, "manifest.json")):
            from ..synth import generate_code_files

            generate_code_files(cache, n_rows=n_rows, n_repos=max(16, int(n_rows / 2500)),
                                seed=42, n_shards=max(8, min(64, n_rows // 40_000)))
        _CODE_CACHE[cache] = True
    return cache


def validate_code_files(sf_dir: str):
    """Flagship: the full validation pipeline (extract → stats/HLL,
    uniqueness, referential, drift) over the synthetic corpus."""
    import shutil
    import tempfile

    from ..checks.base import ValidationConfig
    from .runner import run_validation

    src = _code_files_dir(sf_dir)
    out = tempfile.mkdtemp(prefix="aads_validate_")
    try:
        run_validation(src, out, ValidationConfig())
        import pyarrow.parquet as pq

        v = pq.read_table(os.path.join(out, "verdicts", "verdicts.parquet")).to_pandas()
        return v.sort_values(["check", "partition_key"]).reset_index(drop=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


QUERIES = {
    # SQL-checked
    "doc_stats": doc_stats,
    "token_totals": token_totals,
    "text_profile": text_profile,
    "exact_dedup_documents": exact_dedup_documents,
    "referential_orders": referential_orders,
    "pricing_summary": pricing_summary,
    "top_orders": top_orders,
    "events_hourly": events_hourly,
    "customer_order_totals": customer_order_totals,
    "null_profile_events": null_profile_events,
    "top_orders_per_customer": top_orders_per_customer,
    "bpeish_token_totals": bpeish_token_totals,
    "distinct_users_exact": distinct_users_exact,
    "part_brand_stats": part_brand_stats,
    "ann_topk": ann_topk,
    # rows-only
    "hll_users_per_event_type": hll_users_per_event_type,
    "minhash_dedup_documents": minhash_dedup_documents,
    "simhash_dedup_documents": simhash_dedup_documents,
    "ngram_jaccard_dedup_documents": ngram_jaccard_dedup_documents,
    "embedding_near_dup": embedding_near_dup,
    "ivf_ann_topk": ivf_ann_topk,
    "session_windows": session_windows,
    "value_quantiles": value_quantiles,
    "langid_documents": langid_documents,
    "quality_documents": quality_documents,
    "fingerprint_documents": fingerprint_documents,
    "drift_events_mcod": drift_events_mcod,
    "multimodal_decode": multimodal_decode,
    "validate_code_files": validate_code_files,
}
