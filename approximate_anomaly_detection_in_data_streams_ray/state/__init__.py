"""Per-partition mutable state: sliding-window outlier detectors.

The reference holds all of this on a single JVM heap
(`/root/reference/src/Executor.java` — one thread, one detector object).
Here every detector instance is owned by one Ray actor and scoped to one
partition key; see ``stages/drift.py``.
"""

from .detectors import MCOD, ApproxMCOD, LSHOD, ApproxMCLSHOD, run_detector
from .oracle import brute_force_detect

__all__ = [
    "MCOD",
    "ApproxMCOD",
    "LSHOD",
    "ApproxMCLSHOD",
    "run_detector",
    "brute_force_detect",
]
