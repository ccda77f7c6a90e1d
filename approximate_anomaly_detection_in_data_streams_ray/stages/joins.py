"""Distributed joins: broadcast (small side) and bucketed hash join (both
sides large).

The broadcast pattern lives where it is used (``checks/referential.py``,
``pipelines/queries.py:customer_order_totals``).  This module provides the
both-sides-large fallback: an explicit partitioned hash join through a
bucket-partitioned Parquet exchange — the same checkpointed-file-layout
shuffle the uniqueness check uses (``checks/uniqueness.py``), so it is
resumable and has near-zero constant cost compared to a generic sort
shuffle.

Partitioning assumptions (documented per the custom-operator contract):
  * ``B`` is chosen ~ cluster parallelism; each bucket's two sides must fit
    in one worker's heap — salt hot keys into sub-buckets if one key
    exceeds that;
  * bucket assignment is ``stable_hash64(key) % B`` (process-stable), and
    the in-bucket merge is an exact pandas join, so hash collisions are
    harmless.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_hash64


def _scratch_root(scratch_dir: str | None, prefix: str):
    """Resolve *scratch_dir* — a local path, or any ``pyarrow.fs`` URI such
    as ``s3://bucket/tmp`` or ``file:///mnt/shared`` — to a (filesystem,
    unique run directory) pair.  The exchange's writers and bucket readers
    all go through this filesystem handle, so pointing ``scratch_dir`` at
    object storage removes the shared-POSIX-mount assumption (see
    README "Storage contract")."""
    import uuid

    from pyarrow import fs as pafs

    if scratch_dir is None:
        return pafs.LocalFileSystem(), tempfile.mkdtemp(prefix=prefix)
    if "://" in scratch_dir:
        fsys, base = pafs.FileSystem.from_uri(scratch_dir)
    else:
        fsys, base = pafs.LocalFileSystem(), scratch_dir
    root = f"{base.rstrip('/')}/{prefix}{uuid.uuid4().hex[:12]}"
    fsys.create_dir(root, recursive=True)
    return fsys, root


def _bucket_files(fsys, path: str, bucket: int) -> list[str]:
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(f"{path}/bucket={bucket}", allow_not_found=True)
    return sorted(f.path for f in fsys.get_file_info(sel)
                  if f.is_file and f.path.endswith(".parquet"))


def _write_bucketed(ds, key: str, B: int, path: str, fsys) -> pa.Schema | None:
    def add(b: pa.Table) -> pa.Table:
        h = stable_hash64(b[key])
        return b.append_column("bucket", pa.array((h % B).astype(np.int32)))

    ds.map_batches(add, batch_format="pyarrow").write_parquet(
        path, filesystem=fsys, partition_cols=["bucket"]
    )
    # the side's full schema, from any written file's footer — needed to
    # synthesize schema-complete empty frames for buckets this side missed
    # (a bucket with left rows but no right files must still produce the
    # right value columns, else downstream blocks disagree on schema)
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(path, recursive=True, allow_not_found=True)
    files = [f.path for f in fsys.get_file_info(sel)
             if f.is_file and f.path.endswith(".parquet")]
    if not files:
        return None
    schema = pq.read_schema(files[0], filesystem=fsys)
    return pa.schema([f for f in schema if f.name != "bucket"])


def _empty_frame(schema: pa.Schema | None, fallback_cols: tuple[str, ...],
                 like: pd.DataFrame) -> pd.DataFrame:
    """Schema-complete empty pandas frame for a missing join side."""
    if schema is not None:
        return schema.empty_table().to_pandas()
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in like.dtypes.items()
                         if c in fallback_cols})


def bucketed_hash_join(left, right, key: str, B: int = 32, how: str = "inner",
                       suffixes: tuple[str, str] = ("_l", "_r"),
                       scratch_dir: str | None = None):
    """Join two Datasets on *key* via a B-bucket Parquet exchange.

    Both sides are written bucket-partitioned (one streaming pass each),
    then B independent tasks read their bucket's partitions from both
    sides and merge with pandas.  Returns a Dataset of joined rows.
    """
    import ray

    fsys, root = _scratch_root(scratch_dir, "join_")
    lpath, rpath = f"{root}/l", f"{root}/r"
    _write_bucketed(left, key, B, lpath, fsys)
    right_schema = _write_bucketed(right, key, B, rpath, fsys)

    def join_bucket(b: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        outs = []
        for bucket in b["bucket"].to_pylist():
            lf = _bucket_files(fsys, lpath, bucket)
            rf = _bucket_files(fsys, rpath, bucket)
            if not lf or (not rf and how == "inner"):
                continue
            lg = (pads.dataset(lf, filesystem=fsys).to_table().to_pandas()
                  if lf else pd.DataFrame())
            rg = (pads.dataset(rf, filesystem=fsys).to_table().to_pandas() if rf
                  else _empty_frame(right_schema, (key,), lg))
            joined = lg.merge(rg, on=key, how=how, suffixes=suffixes)
            if len(joined):
                outs.append(pa.Table.from_pandas(joined, preserve_index=False))
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="default")

    buckets = ray.data.from_items([{"bucket": i} for i in range(B)])
    return buckets.map_batches(join_bucket, batch_format="pyarrow", batch_size=2)


def bucketed_asof_join(left, right, on: str, by: str, B: int = 32,
                       direction: str = "backward",
                       suffixes: tuple[str, str] = ("", "_r"),
                       scratch_dir: str | None = None):
    """AS-OF join (most recent *right* row with ``right.on <= left.on``
    per ``by`` key, ``direction='backward'``) — the operator Ray Data
    lacks, composed per the custom-operator contract: hash-partition both
    sides by the ``by`` key through the bucketed Parquet exchange, then a
    vectorized ``pandas.merge_asof`` inside each bucket.

    Partitioning assumptions: a ``by``-key's rows land in one bucket (hash
    partition), and one bucket's two sides fit in a worker's heap — salt by
    time range if a single key exceeds that.  Matches DuckDB
    ``ASOF LEFT JOIN`` semantics (inclusive bound)."""
    import ray

    fsys, root = _scratch_root(scratch_dir, "asof_")
    lpath, rpath = f"{root}/l", f"{root}/r"
    _write_bucketed(left, by, B, lpath, fsys)
    right_schema = _write_bucketed(right, by, B, rpath, fsys)

    def join_bucket(b: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        outs = []
        for bucket in b["bucket"].to_pylist():
            lf = _bucket_files(fsys, lpath, bucket)
            if not lf:
                continue
            rf = _bucket_files(fsys, rpath, bucket)
            lg = pads.dataset(lf, filesystem=fsys).to_table().to_pandas() \
                .sort_values(on, kind="stable")
            if rf:
                rg = pads.dataset(rf, filesystem=fsys).to_table().to_pandas() \
                    .sort_values(on, kind="stable")
            else:
                rg = _empty_frame(right_schema, (on, by), lg)
            joined = pd.merge_asof(lg, rg, on=on, by=by, direction=direction,
                                   allow_exact_matches=True, suffixes=suffixes)
            if len(joined):
                outs.append(pa.Table.from_pandas(joined, preserve_index=False))
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="default")

    buckets = ray.data.from_items([{"bucket": i} for i in range(B)])
    return buckets.map_batches(join_bucket, batch_format="pyarrow", batch_size=2)


def bucketed_anti_semi_join(left, right, key: str, B: int = 32,
                            scratch_dir: str | None = None):
    """ANTI-SEMI join: left rows whose *key* appears NOWHERE in *right* —
    the both-sides-large referential check (``checks/referential.py``
    routes here when the dimension key set is too big to broadcast).

    Same B-bucket Parquet exchange as :func:`bucketed_hash_join`: each
    side streams once into bucket-partitioned files
    (``stable_hash64(key) % B``), then B independent tasks read one
    bucket from both sides and filter with a vectorized ``pc.is_in``.
    Only the *key* column of the right side crosses the exchange.

    Partitioning assumptions: all rows sharing a key land in one bucket,
    and one bucket's right-side KEY SET (not its rows) fits in a worker's
    heap — raise ``B`` if a bucket's distinct-key count exceeds that.
    NULL keys never match anything, so they are anti-join survivors:
    they hash with the empty string's bucket, and the in-bucket mask is
    ``fill_null(True)`` — the same null semantics as the broadcast path.
    """
    import pyarrow.compute as pc
    import ray

    fsys, root = _scratch_root(scratch_dir, "antijoin_")
    lpath, rpath = f"{root}/l", f"{root}/r"
    _write_bucketed(left, key, B, lpath, fsys)
    _write_bucketed(right.select_columns([key]), key, B, rpath, fsys)

    def anti_bucket(b: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        outs = []
        for bucket in b["bucket"].to_pylist():
            lf = _bucket_files(fsys, lpath, bucket)
            if not lf:
                continue
            lt = pads.dataset(lf, filesystem=fsys).to_table()
            lt = lt.drop_columns(["bucket"]) if "bucket" in lt.column_names else lt
            rf = _bucket_files(fsys, rpath, bucket)
            if rf:
                keys = pads.dataset(rf, filesystem=fsys).to_table(
                    columns=[key])[key]
                keys = keys.combine_chunks().drop_null()
                miss = pc.fill_null(
                    pc.invert(pc.is_in(lt[key], value_set=keys)), True)
                lt = lt.filter(miss)
            if lt.num_rows:
                outs.append(lt)
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="default")

    buckets = ray.data.from_items([{"bucket": i} for i in range(B)])
    return buckets.map_batches(anti_bucket, batch_format="pyarrow",
                               batch_size=2)


def broadcast_range_join(ds, intervals: pa.Table, on: str,
                         start: str = "start", end: str = "end"):
    """RANGE (interval) JOIN: match each left row's ``on`` value against
    every interval satisfying ``start <= value < end`` — the non-equi
    join Ray Data lacks (an equality shuffle cannot express containment;
    the reference's windowed neighbor search is the same stabbing shape,
    `/root/reference/src/algorithms/MCODBase.java` range queries).

    Shape: the interval side is dimension-bounded — ``ray.put`` ONCE and
    read per task, never re-shipped per batch — and each batch is joined
    by vectorized interval stabbing: intervals sorted by ``start``;
    candidates for value v are the contiguous run of starts in
    ``(v - max_len, v]`` (two ``searchsorted`` calls), then filtered by
    ``end > v``.  Cost O(n log K + matches) per batch with NO all-to-all
    exchange; overlapping intervals yield one output row per match.

    Partitioning assumptions (custom-operator contract): K intervals fit
    in one broadcast object; if the interval side itself is huge,
    pre-partition both sides by coarse range of ``on`` and apply this
    per partition.  Skew-safe: output size is bounded by
    n × max_overlap, not by a hot key.
    """
    import ray

    order = np.argsort(intervals[start].to_numpy(), kind="stable")
    iv_sorted = intervals.take(order)
    starts = iv_sorted[start].to_numpy()
    ends = iv_sorted[end].to_numpy()
    if len(starts) and np.any(ends < starts):
        raise ValueError("range_join: interval end < start")
    max_len = (ends - starts).max() if len(starts) else None
    iv_ref = ray.put((starts, ends, iv_sorted))

    def stab(b: pa.Table) -> pa.Table:
        starts, ends, iv = ray.get(iv_ref)
        v = b[on].to_numpy(zero_copy_only=False)
        if len(starts) == 0 or len(v) == 0:
            cols = {c: b[c].take(pa.array([], pa.int64())) for c in b.column_names}
            for c in iv.column_names:
                cols[c] = iv[c].take(pa.array([], pa.int64()))
            return pa.table(cols)
        # candidate run per value: start in (v - max_len, v]
        lo = np.searchsorted(starts, v - max_len, side="right")
        hi = np.searchsorted(starts, v, side="right")
        cnt = hi - lo
        row_idx = np.repeat(np.arange(len(v)), cnt)
        run_off = np.repeat((cnt.cumsum() - cnt), cnt)
        cand = np.repeat(lo, cnt) + (np.arange(cnt.sum()) - run_off)
        keep = ends[cand] > v[row_idx]
        row_idx, cand = row_idx[keep], cand[keep]
        left = b.take(pa.array(row_idx, pa.int64()))
        out = left
        for c in iv.column_names:
            out = out.append_column(c, iv[c].take(pa.array(cand, pa.int64())))
        return out

    return ds.map_batches(stab, batch_format="pyarrow")
