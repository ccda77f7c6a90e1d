"""Checkpointed, kill-resumable near-duplicate detection.

The flagship validation run already proves the manifest protocol
(``pipelines/checkpoint.py``, ``bench.py --resume``); this module extends
it to the DEDUP family, whose verified-pairs side tables previously
restarted from zero after a crash.  Same write-then-rename + marker
protocol (SURVEY.md §7 hard-part 6; the reference itself has no fault
tolerance, SURVEY.md §4).

Layout under *out_dir*::

    sigs/pbucket=<p>/*.parquet      stage 1: MinHash band-bucket exchange
    pairs/item=<p>/part.parquet     stage 2: per-item VERIFIED pairs
    clusters/clusters.parquet       stage 3: connected components
    _manifest/{sigs.json, pairs__<p>.json, final.json}

Stage shape and scale notes:
  * stage 1 is the one streaming signature pass of
    ``stages/dedup.py:minhash_near_dup_pairs``, persisted hive-partitioned
    by the coarse ``pbucket`` so stage 2's items are independent files —
    only (id, 8B band hash, signature) rows cross the exchange, never
    text.  The stage is a single manifest unit: killed mid-write, its
    partial partition dirs are wiped and rewritten (markers gate
    correctness, not file existence).
  * stage 2 is one work item per pbucket: signature-agreement candidates
    (``sig_agreement_pairs``) then EXACT n-gram Jaccard verification.
    Texts for the (output-sized) candidate id set are fetched by a
    predicate-pushdown Parquet read — candidate ids are rare, so this is
    an indexed point-fetch, not a table scan.  Each item's verified pairs
    are written atomically and marked; a resumed run skips marked items.
  * stage 3 folds all pair files into connected components driver-side
    (pair list is output-sized; ``connected_components_distributed`` is
    the >2M-pair route) and writes the clusters table.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from .checkpoint import Manifest, atomic_write_parquet


def _doc_files(doc_source: str) -> list[str]:
    if os.path.isdir(doc_source):
        return sorted(glob.glob(os.path.join(doc_source, "**", "*.parquet"),
                                recursive=True))
    return [doc_source]


def run_near_dup_dedup(doc_source: str, out_dir: str, *,
                       id_col: str = "doc_id", text_col: str = "text",
                       sig_threshold: float = 0.6,
                       verify_threshold: float = 0.5,
                       num_perm: int = 64, bands: int = 16,
                       n_items: int = 32, shingle_n: int = 5,
                       concurrency: int | None = None) -> dict:
    """Run (or resume) the checkpointed near-dup pipeline; returns a
    summary dict with per-stage wall times and resume-skip counts."""
    import ray

    from ..stages.dedup import (
        MinHashSignatures,
        connected_min_ids,
        sig_agreement_pairs,
        verify_pairs_with_texts,
    )

    t_start = time.time()
    man = Manifest(out_dir)
    doc_files = _doc_files(doc_source)
    sigs_dir = os.path.join(out_dir, "sigs")
    timings: dict[str, float] = {}

    # ---- stage 1: signature exchange, persisted bucket-partitioned
    t0 = time.time()
    if not man.is_done("sigs"):
        # partial output from a killed run is not trustworthy — wipe it
        # (markers gate correctness, not file existence)
        if os.path.isdir(sigs_dir):
            shutil.rmtree(sigs_dir)
        sig_stage = MinHashSignatures(num_perm=num_perm, bands=bands,
                                      id_col=id_col, text_col=text_col)
        P = int(n_items)

        def bucketize(b: pa.Table) -> pa.Table:
            t = sig_stage(b)
            pb = (t["bucket_key"].to_numpy(zero_copy_only=False)
                  % P).astype(np.int32)
            return t.append_column("pbucket", pa.array(pb))

        import pyarrow.parquet as pq

        # metadata-free read schema: pandas metadata attached by the
        # source files makes Ray's schema-unify hash fail per block
        # ("Failed to hash the schemas" worker spam — same fix as
        # queries._t)
        fschema = pq.read_schema(doc_files[0]).remove_metadata()
        fschema = pa.schema([fschema.field(c) for c in (id_col, text_col)])
        (ray.data.read_parquet(doc_files, columns=[id_col, text_col],
                               schema=fschema)
         .map_batches(bucketize, batch_format="pyarrow", batch_size=512)
         .write_parquet(sigs_dir, partition_cols=["pbucket"]))
        man.mark_done("sigs", n_items=n_items)
        skipped_sigs = False
    else:
        skipped_sigs = True
    timings["sigs"] = round(time.time() - t0, 3)

    # ---- stage 2: per-item candidate + exact verify, atomic + marked
    t0 = time.time()
    remaining = [p for p in range(n_items) if not man.is_done(f"pairs__{p}")]
    n_skipped_items = n_items - len(remaining)
    docs_ref = ray.put(doc_files)

    def process_items(b: pa.Table) -> pa.Table:
        files = ray.get(docs_ref)
        wman = Manifest(out_dir)
        out_rows = []
        for p in b["item"].to_pylist():
            part_dir = os.path.join(sigs_dir, f"pbucket={p}")
            part_files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
            if part_files:
                g = pads.dataset(part_files).to_table().to_pandas()
                cand = sig_agreement_pairs(g, id_col=id_col,
                                           threshold=sig_threshold)
                cand = cand.drop_duplicates(subset=["id_a", "id_b"])
            else:
                cand = pd.DataFrame({"id_a": [], "id_b": []})
            if len(cand):
                wanted = pa.array(sorted(set(cand["id_a"]) | set(cand["id_b"])))
                texts = pads.dataset(files).to_table(
                    columns=[id_col, text_col],
                    filter=pads.field(id_col).isin(wanted),
                ).to_pandas().set_index(id_col)[text_col].to_dict()
                verified = verify_pairs_with_texts(
                    texts, cand, n=shingle_n, threshold=verify_threshold)
            else:
                from ..stages.dedup import _empty_verify

                verified = _empty_verify()
            atomic_write_parquet(
                pa.Table.from_pandas(verified, preserve_index=False),
                os.path.join(out_dir, "pairs", f"item={p}", "part.parquet"))
            wman.mark_done(f"pairs__{p}", n_pairs=int(len(verified)))
            out_rows.append({"item": p, "n_pairs": int(len(verified))})
        return pa.Table.from_pylist(
            out_rows or [{"item": -1, "n_pairs": 0}])

    if remaining:
        (ray.data.from_items([{"item": p} for p in remaining])
         .map_batches(process_items, batch_format="pyarrow", batch_size=1)
         .materialize())
    timings["pairs"] = round(time.time() - t0, 3)

    # ---- stage 3: components + clusters table (pair list is output-sized)
    t0 = time.time()
    pair_files = sorted(glob.glob(
        os.path.join(out_dir, "pairs", "item=*", "part.parquet")))
    pdf = (pads.dataset(pair_files).to_table(columns=["id_a", "id_b"])
           .to_pandas().drop_duplicates() if pair_files else
           pd.DataFrame({"id_a": [], "id_b": []}))
    labels = connected_min_ids(pdf) if len(pdf) else {}
    ct = pa.table({
        id_col: pa.array(sorted(labels), pa.int64()),
        "cluster": pa.array([labels[k] for k in sorted(labels)], pa.int64()),
    })
    atomic_write_parquet(ct, os.path.join(out_dir, "clusters",
                                          "clusters.parquet"))
    man.mark_done("final", n_pairs=int(len(pdf)), n_members=int(len(labels)))
    timings["clusters"] = round(time.time() - t0, 3)

    return {
        "n_items": n_items,
        "n_items_skipped_resume": n_skipped_items,
        "sigs_skipped_resume": skipped_sigs,
        "n_pairs": int(len(pdf)),
        "n_cluster_members": int(len(labels)),
        "timings_sec": timings,
        "total_sec": round(time.time() - t_start, 3),
    }
