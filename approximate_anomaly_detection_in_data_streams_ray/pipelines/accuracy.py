"""Accuracy comparison of two violation/outlier id sets.

Rebuilds `src/AccuracyComparator.java` (the reference's only test harness):
recall of the baseline detector's outlier set achieved by a test detector
(`AccuracyComparator.java:20-37` — `retainAll` intersection / baseline size).
The distributed flavor joins two violation Datasets on the row reference.
"""

from __future__ import annotations

from collections.abc import Iterable


def recall_of(baseline: Iterable, test: Iterable) -> float:
    b, t = set(baseline), set(test)
    if not b:
        return 1.0
    return len(b & t) / len(b)


def compare_violation_datasets(baseline_ds, test_ds, on: str = "row_ref") -> dict:
    """Distributed id-set comparison: semi-join of two violation tables.

    Both sides are expected to be small relative to the subject table
    (violations, not rows), so the baseline key set is collected and
    broadcast rather than shuffling both sides.
    """
    base_keys = set(baseline_ds.unique(on))
    test_keys = set(test_ds.unique(on))
    inter = base_keys & test_keys
    return {
        "n_baseline": len(base_keys),
        "n_test": len(test_keys),
        "n_common": len(inter),
        "recall": (len(inter) / len(base_keys)) if base_keys else 1.0,
        "precision": (len(inter) / len(test_keys)) if test_keys else 1.0,
    }
