"""Arrow schemas for the validation engine.

The subject table shape comes from ``BASELINE.json`` ``input_hint``:
``(repo, path, commit, lang, content)`` — one row per source-file version.
The reference engine's only data type is a ``double[]`` stream record
(``/root/reference/src/core/StreamObj.java:26-38``); here rows are Arrow and
feature vectors are derived per batch (see ``stages/features.py``).
"""

from __future__ import annotations

import pyarrow as pa

# Subject table: Parquet table of source-code repositories.
CODE_FILES = pa.schema(
    [
        ("repo", pa.string()),          # partition / grouping key, Zipf-skewed
        ("path", pa.string()),
        ("commit", pa.string()),        # 40-char hex
        ("lang", pa.string()),          # low-cardinality
        ("content", pa.large_string()), # file body; sha256 invariant end-to-end
    ]
)

# Dimension tables (referential-check targets).
REPOS_DIM = pa.schema(
    [
        ("repo", pa.string()),
        ("default_lang", pa.string()),
    ]
)

COMMITS_DIM = pa.schema(
    [
        ("commit", pa.string()),
        ("repo", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Violation rows emitted by every check.  Mirrors the reference's outlier
# report (one id per line, `src/Executor.java:209-222`) generalised with the
# check name and a free-form detail.
VIOLATIONS = pa.schema(
    [
        ("check", pa.string()),
        ("partition_key", pa.string()),
        ("row_ref", pa.string()),   # e.g. "repo/path@commit" or a stream id
        ("detail", pa.string()),
    ]
)

# Per-(partition, check) verdict — the engine's analogue of the reference's
# summary counter HashMap (`src/algorithms/MCODBase.java:205-227`).
VERDICTS = pa.schema(
    [
        ("partition_key", pa.string()),
        ("check", pa.string()),
        ("passed", pa.bool_()),
        ("n_violations", pa.int64()),
        ("n_rows", pa.int64()),
        ("metrics", pa.string()),   # JSON blob of check-specific metrics
    ]
)

# Detector-conformance stream (reference-shaped: headerless CSV of doubles,
# `src/core/Stream.java:39-68`).  ``seq`` is the 1-based arrival id
# (`src/core/OutlierDetector.java:10` FIRST_OBJ_ID = 1).
def stream_points_schema(dims: int) -> pa.Schema:
    fields = [("partition", pa.string()), ("seq", pa.int64())]
    fields += [(f"f{i}", pa.float64()) for i in range(dims)]
    return pa.schema(fields)
